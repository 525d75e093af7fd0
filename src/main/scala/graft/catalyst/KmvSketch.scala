package graft.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_sketch(hashValue, k)` — the k SMALLEST DISTINCT values of a
  * BIGINT column per group, as an ascending-sorted array: the classic
  * K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002), graft's
  * second native aggregate after [[TopKLongs]].
  *
  * Why KMV next to the HLL surface (`quality/Sketches.scala`): HLL
  * estimates are engine-internal (DataSketches registers) and can only
  * be AUDITED against exact counts; a KMV sketch over a documented hash
  * is a pure function of the input SET, so the estimate itself — and
  * every set operation derived from it (union, intersection, Jaccard) —
  * is replayable bit-for-bit by any engine that can hash and sort. That
  * makes cross-system reconciliation of approximate counts possible
  * (the q37 posture, extended to sketches), at the price of a slightly
  * worse error constant than HLL at equal state.
  *
  * Contract: callers pass an already-hashed non-negative BIGINT (the
  * repo's one hash convention — md5-prefix, see `Kmv.hash60`); the
  * aggregate just maintains the bottom-k distinct set. Distinctness is
  * enforced inside the state (a bounded sorted set), so duplicated rows
  * never skew the estimate. State is ≤ k longs per (task × group) — a
  * partial/final aggregate pair with no row-grain shuffle, mergeable
  * across batches/streams by construction (merge = re-offer).
  *
  * Reference behaviors this generalizes: distinct-count dashboards and
  * audience-overlap questions (nyc-taxi-data-ingestion's
  * count-distinct marts) at cardinalities where exact per-group
  * distinct is a 100 TB shuffle.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.BottomK] {

  require(k >= 2, s"kmv_sketch k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires an integral column, got ${other.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvSketch.BottomK =
    new KmvSketch.BottomK(k)

  override def update(buf: KmvSketch.BottomK, input: InternalRow): KmvSketch.BottomK = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: KmvSketch.BottomK, other: KmvSketch.BottomK): KmvSketch.BottomK = {
    val it = other.set.iterator()
    while (it.hasNext) buf.offer(it.next())
    buf
  }

  override def eval(buf: KmvSketch.BottomK): Any = {
    val out = new Array[Long](buf.set.size())
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvSketch.BottomK): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.BottomK = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new KmvSketch.BottomK(k)
    var i = 0
    while (i < n) { b.offer(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Bounded distinct bottom-k set. TreeSet keeps O(log k) offer with
    * dedup in one structure; k is a sketch parameter (64–1024), not a
    * data size, so the boxing cost is bounded and off the hot row path
    * once the set saturates (values ≥ `last()` are rejected on an O(log
    * k) ceiling probe without insertion). */
  final class BottomK(k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def offer(v: Long): Unit = {
      if (set.size() < k) { set.add(v); () }
      else if (v < set.last()) {
        if (set.add(v)) { set.remove(set.last()); () }
      }
    }
  }
}

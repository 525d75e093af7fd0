package graft.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_longs(value, k)` — the k LARGEST values of a BIGINT column per
  * group, as a descending-sorted array. graft's first native AGGREGATE
  * (the 11 other registered functions are scalar): a bounded min-heap per
  * group that Spark runs as a partial/final aggregate pair.
  *
  * Why a custom aggregate: grouped top-k is otherwise a rank window —
  * which shuffles and SORTS every row of every group — or an
  * orderBy+limit per group (not expressible). The heap form ships at
  * most k longs per (task × group) through the shuffle, turning "top 5
  * per key over 10^12 rows" from a full-sort problem into a bounded-state
  * streaming aggregate; this is exactly what the reference's dashboard
  * top-k queries need at 100 TB. Duplicates count separately (a multiset
  * top-k); ties beyond position k are dropped deterministically because
  * only VALUES are returned — the output is a pure function of the
  * input multiset, independent of row or partition order.
  *
  * State: a plain long array used as a binary min-heap (root = current
  * k-th largest; smaller incoming values are rejected in O(1), better
  * ones replace the root in O(log k)). Serialization is the raw longs —
  * merge re-offers the partner heap's elements.
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLongs.Heap] {

  require(k >= 1, s"topk_longs k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_longs requires an integral column, got ${other.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_longs"

  override def createAggregationBuffer(): TopKLongs.Heap =
    new TopKLongs.Heap(k)

  override def update(buf: TopKLongs.Heap, input: InternalRow): TopKLongs.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: TopKLongs.Heap, other: TopKLongs.Heap): TopKLongs.Heap = {
    var i = 0
    while (i < other.size) { buf.offer(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKLongs.Heap): Any =
    new GenericArrayData(buf.sortedDesc())

  override def serialize(buf: TopKLongs.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.values(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLongs.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKLongs.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(child = newChildren.head)
}

object TopKLongs {
  /** Bounded binary min-heap over a preallocated long array. */
  final class Heap(k: Int) {
    val values = new Array[Long](k)
    var size = 0

    def offer(v: Long): Unit = {
      if (size < k) {
        // grow phase: append then sift up
        var i = size
        values(i) = v
        size += 1
        while (i > 0 && values((i - 1) / 2) > values(i)) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (v > values(0)) {
        // replace the current minimum, sift down
        values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && values(l) < values(m)) m = l
          if (r < size && values(r) < values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }
    }

    def sortedDesc(): Array[Long] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      // descending
      var i = 0
      var j = out.length - 1
      while (i < j) {
        val t = out(i); out(i) = out(j); out(j) = t
        i += 1; j -= 1
      }
      out
    }
  }
}

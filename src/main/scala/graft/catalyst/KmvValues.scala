package graft.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_values(hashValue, value, k)` — the VALUE-CARRYING twin of
  * [[KmvSketch]]: keeps the rows whose `hashValue` is among the k
  * smallest distinct hashes per group, emitting an ascending-by-hash
  * array of `struct<h BIGINT, v BIGINT>` pairs.
  *
  * Because the documented hash (md5-prefix of a row id — `Kmv.hash60`)
  * is uniform over the id space, the surviving values are a
  * DETERMINISTIC uniform sample of the group's rows — which makes every
  * statistic read off the sample (quantiles above all, `Kmv.
  * quantileReport`) replayable bit-for-bit by any engine that can hash
  * and sort, the way [[KmvSketch]] makes distinct COUNTS replayable.
  * This is the mergeable, auditable alternative to Greenwald–Khanna
  * `approx_percentile`, whose estimates are engine-internal and cannot
  * be reconciled across systems.
  *
  * Contract: `hashValue` must determine `value` (hash a row id, carry
  * that row's measure). Hash collisions — two ids sharing a 60-bit
  * hash, or a non-unique id column — resolve deterministically to the
  * SMALLEST value for that hash, so both engines agree even on degenerate
  * input (the oracle replays `min(v) GROUP BY h`). State is ≤ k (hash,
  * value) pairs per (task × group): a partial/final aggregate pair, no
  * row-grain shuffle, mergeable across batches/streams (merge =
  * re-offer).
  */
case class KmvValues(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvValues.BottomKPairs] {

  require(k >= 2, s"kmv_values k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(e: Expression, what: String): Option[String] =
      e.dataType match {
        case LongType | IntegerType | ShortType | ByteType => None
        case other => Some(
          s"kmv_values requires an integral $what column, got ${other.simpleString}")
      }
    integral(hashChild, "hash").orElse(integral(valueChild, "value"))
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def nullable: Boolean = false
  override def dataType: DataType = KmvValues.Output
  override def prettyName: String = "kmv_values"

  override def createAggregationBuffer(): KmvValues.BottomKPairs =
    new KmvValues.BottomKPairs(k)

  override def update(buf: KmvValues.BottomKPairs, input: InternalRow): KmvValues.BottomKPairs = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    // a null hash is a null id (the caller filters those); a null value
    // row carries no measure — both are skipped, matching the oracle's
    // WHERE id IS NOT NULL AND value IS NOT NULL
    if (h != null && v != null)
      buf.offer(h.asInstanceOf[Number].longValue(),
        v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: KmvValues.BottomKPairs, other: KmvValues.BottomKPairs): KmvValues.BottomKPairs = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.offer(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: KmvValues.BottomKPairs): Any = {
    val out = new Array[Any](buf.map.size())
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey.longValue(), e.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvValues.BottomKPairs): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvValues.BottomKPairs = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new KmvValues.BottomKPairs(k)
    var i = 0
    while (i < n) { b.offer(in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvValues =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

object KmvValues {
  val Output: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  /** Bounded bottom-k (hash → value) map. Same shape as
    * [[KmvSketch.BottomK]] with the value payload; duplicate hashes keep
    * the smallest value so the result is a pure function of the input
    * SET regardless of row order. */
  final class BottomKPairs(k: Int) {
    val map = new java.util.TreeMap[java.lang.Long, java.lang.Long]()

    def offer(h: Long, v: Long): Unit = {
      val existing = map.get(h)
      if (existing != null) {
        if (v < existing) { map.put(h, v); () }
      } else if (map.size() < k) { map.put(h, v); () }
      else if (h < map.lastKey()) {
        map.put(h, v)
        map.remove(map.lastKey())
        ()
      }
    }
  }
}

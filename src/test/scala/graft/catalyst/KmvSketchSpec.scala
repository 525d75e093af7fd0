package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv_sketch: k smallest DISTINCT values, ascending; dups collapse") {
    val df = Seq(
      ("a", 9L), ("a", 3L), ("a", 3L), ("a", 7L), ("a", 1L), ("a", 9L),
      ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(expr("kmv_sketch(v, 3)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    out("a") shouldBe Seq(1L, 3L, 7L) // dup 3 once; 9 pushed out
    out("b") shouldBe Seq(5L)         // fewer distinct than k → the set
  }

  test("kmv_sketch: bottom-k vs brute-force sorted-distinct, any k") {
    val vals = Seq(42L, 7L, 42L, 99L, 7L, 13L, 0L, 55L, 13L, 1000L, 3L)
    val expect = vals.distinct.sorted
    for (k <- Seq(2, 4, 8, 32)) {
      val got = vals.map(("g", _)).toDF("g", "v")
        .groupBy("g").agg(expr(s"kmv_sketch(v, $k)").as("sk"))
        .head().getSeq[Long](1)
      got shouldBe expect.take(k)
    }
  }

  test("kmv_sketch: partition-order independent (set function)") {
    val vals = (1L to 1000L).map(v => ("g", v * 37 % 1009))
    val sk = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("g").agg(expr("kmv_sketch(v, 16)").as("sk"))
        .head().getSeq[Long](1)
    val asc = vals.toDF("g", "v").repartition(7)
    val desc = vals.reverse.toDF("g", "v").repartition(3)
    sk(asc) shouldBe sk(desc)
    sk(asc) shouldBe vals.map(_._2).distinct.sorted.take(16)
  }

  test("kmv_sketch: merge across partial buffers == re-offer of the union") {
    // two disjoint halves aggregated separately, then the concatenated
    // input aggregated once — identical sketches (merge = re-offer)
    val a = (1L to 500L).map(v => ("g", v * 7919 % 104729))
    val b = (1L to 500L).map(v => ("g", v * 104723 % 104729))
    def sketch(rows: Seq[(String, Long)]) =
      rows.toDF("g", "v").repartition(5)
        .groupBy("g").agg(expr("kmv_sketch(v, 64)").as("sk"))
        .head().getSeq[Long](1)
    sketch(a ++ b) shouldBe
      (a.map(_._2) ++ b.map(_._2)).distinct.sorted.take(64)
  }

  test("kmv_sketch: serde round-trip preserves the bottom-k set") {
    val agg = KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 4)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 2L, 7L, 2L, 5L, 1L).foreach(buf.offer)
    val restored = agg.deserialize(agg.serialize(buf))
    import scala.jdk.CollectionConverters._
    restored.set.iterator().asScala.map(_.longValue()).toSeq shouldBe
      Seq(1L, 2L, 5L, 7L)
  }

  test("kmv_sketch: saturated buffer rejects values above the ceiling") {
    val buf = new KmvSketch.BottomK(3)
    Seq(10L, 20L, 30L).foreach(buf.offer)
    buf.offer(40L) // above last() — rejected without insertion
    import scala.jdk.CollectionConverters._
    buf.set.iterator().asScala.map(_.longValue()).toSeq shouldBe
      Seq(10L, 20L, 30L)
    buf.offer(20L) // duplicate of a member — no change
    buf.set.size() shouldBe 3
    buf.offer(15L) // below ceiling — evicts 30
    buf.set.iterator().asScala.map(_.longValue()).toSeq shouldBe
      Seq(10L, 15L, 20L)
  }

  test("kmv_sketch: nulls skipped; non-integral column rejected; k >= 2") {
    val df = Seq(("a", Some(4L)), ("a", None), ("a", Some(2L)))
      .toDF("g", "v")
    df.groupBy("g").agg(expr("kmv_sketch(v, 5)").as("sk"))
      .head().getSeq[Long](1) shouldBe Seq(2L, 4L)
    an[Exception] should be thrownBy
      Seq(("a", "x")).toDF("g", "v")
        .groupBy("g").agg(expr("kmv_sketch(v, 2)")).collect()
    an[Exception] should be thrownBy
      Seq(("a", 1L)).toDF("g", "v")
        .groupBy("g").agg(expr("kmv_sketch(v, 1)")).collect()
  }

  test("kmv_sketch plans as an object hash aggregate, not a window sort") {
    val df = Seq(("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(expr("kmv_sketch(v, 3)"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    (plan should not).include("Window")
  }
}

package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKLongsSpec extends SparkSpec {
  import spark.implicits._

  test("topk_longs: per-group k largest, descending, duplicates counted") {
    val df = Seq(
      ("a", 5L), ("a", 9L), ("a", 9L), ("a", 1L), ("a", 7L),
      ("b", 3L), ("b", 2L))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(expr("topk_longs(v, 3)").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    out("a") shouldBe Seq(9L, 9L, 7L) // dup 9 counts twice; 5 pushed out
    out("b") shouldBe Seq(3L, 2L)     // fewer than k rows → all of them
  }

  test("topk_longs: partition-order independent (multiset function)") {
    val vals = (1L to 1000L).map(v => ("g", v))
    val asc = vals.toDF("g", "v").repartition(7)
    val desc = vals.reverse.toDF("g", "v").repartition(3)
    val top = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("g").agg(expr("topk_longs(v, 10)").as("t"))
        .head().getSeq[Long](1)
    top(asc) shouldBe top(desc)
    top(asc) shouldBe (991L to 1000L).reverse
  }

  test("topk_longs: nulls skipped; non-integral column rejected") {
    val df = Seq(("a", Some(4L)), ("a", None), ("a", Some(2L)))
      .toDF("g", "v")
    df.groupBy("g").agg(expr("topk_longs(v, 5)").as("t"))
      .head().getSeq[Long](1) shouldBe Seq(4L, 2L)
    an[Exception] should be thrownBy
      Seq(("a", "x")).toDF("g", "v")
        .groupBy("g").agg(expr("topk_longs(v, 2)")).collect()
  }

  test("topk_longs plans as an object hash aggregate, not a window sort") {
    val df = Seq(("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(expr("topk_longs(v, 3)"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    (plan should not).include("Window")
  }
}

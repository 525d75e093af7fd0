package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class KmvValuesSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(r: Row): Seq[(Long, Long)] =
    r.getSeq[Row](1).map(p => (p.getLong(0), p.getLong(1)))

  test("kmv_values: bottom-k by hash, carrying values, ascending by hash") {
    val df = Seq(
      ("a", 9L, 90L), ("a", 3L, 30L), ("a", 7L, 70L), ("a", 1L, 10L),
      ("b", 5L, 50L))
      .toDF("g", "h", "v")
    val out = df.groupBy("g").agg(expr("kmv_values(h, v, 3)").as("sk"))
      .collect().map(r => r.getString(0) -> pairs(r)).toMap
    out("a") shouldBe Seq((1L, 10L), (3L, 30L), (7L, 70L)) // 9 pushed out
    out("b") shouldBe Seq((5L, 50L)) // fewer rows than k → the set
  }

  test("kmv_values: duplicate hash keeps the SMALLEST value (set function)") {
    // same hash offered with different values in both orders — the
    // deterministic min-v rule must win regardless of row order
    val fwd = Seq(("g", 1L, 99L), ("g", 1L, 11L), ("g", 2L, 20L))
    val rev = fwd.reverse
    def agg(rows: Seq[(String, Long, Long)]) =
      rows.toDF("g", "h", "v").repartition(3)
        .groupBy("g").agg(expr("kmv_values(h, v, 8)").as("sk"))
        .collect().map(pairs).head
    agg(fwd) shouldBe Seq((1L, 11L), (2L, 20L))
    agg(rev) shouldBe Seq((1L, 11L), (2L, 20L))
  }

  test("kmv_values: partition-order independent, equals brute force") {
    val rows = (1L to 1000L).map(i => ("g", i * 37 % 1009, i * 37 % 1009 * 10))
    val expect = rows.map { case (_, h, v) => (h, v) }.distinct
      .sortBy(_._1).take(16)
    def agg(rs: Seq[(String, Long, Long)], parts: Int) =
      rs.toDF("g", "h", "v").repartition(parts)
        .groupBy("g").agg(expr("kmv_values(h, v, 16)").as("sk"))
        .collect().map(pairs).head
    agg(rows, 7) shouldBe expect
    agg(rows.reverse, 3) shouldBe expect
  }

  test("kmv_values: merge across partial buffers == one-shot over the union") {
    val a = (1L to 500L).map(i => ("g", i * 7919 % 104729, i))
    val b = (1L to 500L).map(i => ("g", i * 104723 % 104729, i + 1000))
    def agg(rs: Seq[(String, Long, Long)], parts: Int) =
      rs.toDF("g", "h", "v").repartition(parts)
        .groupBy("g").agg(expr("kmv_values(h, v, 64)").as("sk"))
        .collect().map(pairs).head
    agg(a ++ b, 11) shouldBe agg(a ++ b, 1)
  }

  test("kmv_values: nulls skipped; non-integral input rejected") {
    val out = Seq[(String, java.lang.Long, java.lang.Long)](
      ("g", 1L, null), ("g", null, 5L), ("g", 2L, 20L))
      .toDF("g", "h", "v")
      .groupBy("g").agg(expr("kmv_values(h, v, 4)").as("sk"))
      .collect().map(pairs).head
    out shouldBe Seq((2L, 20L))
    an[Exception] should be thrownBy
      Seq(("g", "x", 1L)).toDF("g", "h", "v")
        .groupBy("g").agg(expr("kmv_values(h, v, 4)")).collect()
  }
}

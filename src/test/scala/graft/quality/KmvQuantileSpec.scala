package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(250000L, 500000L, 900000L, 1000000L)

  test("quantileReport: exact order statistics while the sample holds all rows") {
    // n = 10 < k → the sample IS the group, so each q is the exact
    // ceil(q·n)-th smallest value
    val df = (1L to 10L).map(i => ("g", s"id$i", i * 100L))
      .toDF("g", "id", "v")
    val row = Kmv.quantileReport(df, Seq("g"), "id", "v", k = 64, qs)
      .head()
    row.getLong(1) shouldBe 10L // k_used
    row.getLong(2) shouldBe 300L  // q25 → ceil(2.5)=3rd
    row.getLong(3) shouldBe 500L  // q50 → 5th
    row.getLong(4) shouldBe 900L  // q90 → 9th
    row.getLong(5) shouldBe 1000L // q100 → max
  }

  test("quantileReport: saturated sample estimates within sampling error") {
    // 5000 uniform values 1..5000; k=256 → rank error ~1/sqrt(k) ≈ 6%,
    // assert within 4 sigma (deterministic md5 sample, not flaky)
    val df = (1L to 5000L).map(i => ("g", s"row$i", i)).toDF("g", "id", "v")
    val row = Kmv.quantileReport(df, Seq("g"), "id", "v", k = 256,
      Seq(500000L)).head()
    row.getLong(1) shouldBe 256L
    val p50 = row.getLong(2)
    p50 shouldBe 2500L +- 650L
  }

  test("fold of half-sketches == one-shot sketch over the union") {
    val rows = (1L to 3000L).map(i => (s"t${i % 3}", s"id$i", i * 7 % 997))
    val df = rows.toDF("g", "id", "v")
    val a = Kmv.valueSketches(df.filter(expr("id like '%0' or id like '%2'")),
      Seq("g"), "id", "v", k = 64)
    val b = Kmv.valueSketches(
      df.filter(expr("not (id like '%0' or id like '%2')")),
      Seq("g"), "id", "v", k = 64)
    val folded = Kmv.quantilesFromValueSketches(
      Kmv.foldValueSketches(a, b, Seq("g"), k = 64),
      Seq("g"), Seq(500000L, 900000L)).orderBy("g").collect()
    val oneShot = Kmv.quantileReport(df, Seq("g"), "id", "v", k = 64,
      Seq(500000L, 900000L)).orderBy("g").collect()
    folded.map(_.toSeq) shouldBe oneShot.map(_.toSeq)
  }

  test("valueSketches: non-integral value column and bad quantiles raise") {
    val df = Seq(("g", "id1", 1.5)).toDF("g", "id", "v")
    an[IllegalArgumentException] should be thrownBy
      Kmv.valueSketches(df, Seq("g"), "id", "v", k = 8)
    val ok = Seq(("g", "id1", 1L)).toDF("g", "id", "v")
    an[IllegalArgumentException] should be thrownBy
      Kmv.quantileReport(ok, Seq("g"), "id", "v", k = 8, Seq(0L))
    an[IllegalArgumentException] should be thrownBy
      Kmv.quantileReport(ok, Seq("g"), "id", "v", k = 8, Seq(1000001L))
  }

  test("null ids and null values are excluded like the oracle's WHERE") {
    val df = Seq[(String, String, java.lang.Long)](
      ("g", null, 5L), ("g", "id1", null), ("g", "id2", 42L))
      .toDF("g", "id", "v")
    val row = Kmv.quantileReport(df, Seq("g"), "id", "v", k = 8,
      Seq(500000L)).head()
    row.getLong(1) shouldBe 1L
    row.getLong(2) shouldBe 42L
  }
}

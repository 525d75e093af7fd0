package graft.quality

import graft.SparkSpec
import graft.config._

/** Mirrors the reference's integration contract
  * (tests/integration/test_data_quality_integration.py:28-66): dirty data →
  * score in [0,100], problems detected, level set; and the e2e monotonicity
  * claim — cleaner data scores at least as high. */
class OrchestratorSpec extends SparkSpec {
  import spark.implicits._

  private val spec = QualitySpec(
    nullCheckColumns = Seq("fare"),
    positiveColumns = Seq("distance"),
    rangeChecks = Seq(RangeCheck("fare", Some(0.0), Some(500.0))))

  private def dirty = Seq(
    (Some(10.0), 1.0), (None, 2.0), (Some(9999.0), -1.0),
    (Some(20.0), 3.0), (Some(30.0), 0.0))
    .toDF("fare", "distance")

  private def clean = Seq(
    (Some(10.0), 1.0), (Some(20.0), 2.0), (Some(30.0), 3.0))
    .toDF("fare", "distance")

  test("dirty data: problems detected, score bounded, level assigned") {
    val r = Orchestrator.run(dirty, spec, anomalyColumns = Seq("fare"))
    r.rows shouldBe 5
    r.passed shouldBe false
    r.checkResults.find(_.check == "null_check").get.failedCount shouldBe 1
    r.checkResults.find(_.check == "positive_values").get.failedCount shouldBe 2
    r.checkResults.find(_.check == "range_check").get.failedCount shouldBe 1
    r.overall should (be >= 0.0 and be <= 100.0)
    Seq("EXCELLENT", "GOOD", "FAIR", "POOR", "CRITICAL") should contain(r.level)
    // 5 rows: the outlier dominates its own stddev, so no 3σ anomaly fires
    // and the sample list stays empty
    r.anomalySamples shouldBe empty
  }

  test("anomalous rows are captured as tiered samples, most extreme first") {
    val wide = ((Seq.fill(200)(10.0) ++ Seq(100000.0, 90000.0))
      .map(v => (Some(v), 1.0))).toDF("fare", "distance")
    val r = Orchestrator.run(wide, spec, anomalyColumns = Seq("fare"))
    r.anomalyCounts("fare") shouldBe 2L
    r.anomalySamples.map(_.value) shouldBe Seq(100000.0, 90000.0) // z-desc
    r.anomalySamples.head.column shouldBe "fare"
    r.anomalySamples.head.severity shouldBe "CRITICAL" // z ≈ 10+
  }

  test("configured expectations run in the same pass and gate passed") {
    val withExp = spec.copy(expectations = Seq(
      ExpectationSpec("mean_between", "fare", 0.0, 100.0),
      ExpectationSpec("row_count_between", lo = 1, hi = 1000)))
    val r = Orchestrator.run(clean, withExp)
    r.expectationResults.map(_.expectation) shouldBe
      Seq("mean_between", "row_count_between")
    r.passed shouldBe true

    // a failing expectation fails the report even when all checks pass
    val strict = spec.copy(expectations = Seq(
      ExpectationSpec("row_count_between", lo = 1000, hi = 2000)))
    val r2 = Orchestrator.run(clean, strict)
    r2.checkResults.forall(_.passed) shouldBe true
    r2.passed shouldBe false
    // the failing expectation drags the consistency dimension (and the
    // overall score) down — the report can't read EXCELLENT while failing
    r2.scores.consistency should be < 100.0
    r2.overall should be < Orchestrator.run(clean, spec).overall
  }

  test("cleaner data scores at least as high (e2e monotonicity)") {
    val d = Orchestrator.run(dirty, spec)
    val c = Orchestrator.run(clean, spec)
    c.passed shouldBe true
    c.overall should be >= d.overall
    c.level shouldBe "EXCELLENT"
  }
}

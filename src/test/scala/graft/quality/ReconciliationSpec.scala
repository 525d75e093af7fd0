package graft.quality

import graft.SparkSpec

class ReconciliationSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    .toDF("k", "amount")
  private def tgt = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "amount")

  test("rowCount within/outside tolerance") {
    Reconciliation.rowCount(src, tgt, tolerancePct = 30.0).withinTolerance shouldBe true
    val r = Reconciliation.rowCount(src, tgt, tolerancePct = 10.0)
    r.withinTolerance shouldBe false
    r.diffPct shouldBe 25.0 +- 1e-9
  }

  test("aggregation compares exact decimal sums") {
    val r = Reconciliation.aggregation(src, tgt, "amount", "sum", tolerancePct = 50.0)
    r.srcValue shouldBe 100.0
    r.tgtValue shouldBe 60.0
    r.withinTolerance shouldBe true
    Reconciliation.aggregation(src, tgt, "amount", "max", 1.0).withinTolerance shouldBe false
  }

  test("keyIntegrity reports missing keys with deterministic sample") {
    val (n, sample) = Reconciliation.keyIntegrity(src, tgt, Seq("k"))
    n shouldBe 1L
    sample.as[Long].collect() shouldBe Array(4L)
  }

  test("completeness diffs per-column non-null rates") {
    val s2 = Seq((Some(1.0), 1), (None, 2)).toDF("v", "i")
    val t2 = Seq((Some(1.0), 1), (Some(2.0), 2)).toDF("v", "i")
    val r = Reconciliation.completeness(s2, t2, Seq("v"), tolerancePct = 10.0)
    r.head.srcValue shouldBe 50.0
    r.head.tgtValue shouldBe 100.0
    r.head.withinTolerance shouldBe false
  }

  test("goldInvariants: count equality exact, revenue within tolerance") {
    val silver = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total_amount")
    val mart = Seq((2L, 30.0)).toDF("total_trips", "total_revenue")
    val r = Reconciliation.goldInvariants(silver, mart,
      "total_trips", "total_amount", "total_revenue")
    r.find(_.check == "gold_count_equality").get.withinTolerance shouldBe true
    r.find(_.check == "gold_revenue_tolerance").get.withinTolerance shouldBe true
  }
}

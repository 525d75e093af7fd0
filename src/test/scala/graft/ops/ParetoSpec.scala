package graft.ops

import graft.SparkSpec

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2D: staircase frontier, strict dominance, coincident ties kept") {
    val pts = Seq(
      (1L, 10L, 1L),  // frontier: best x
      (2L, 10L, 1L),  // same point as id 1 — coincident, both kept
      (3L, 8L, 3L),   // frontier: trades x for y
      (4L, 8L, 2L),   // dominated by id 3 (same x, smaller y)
      (5L, 5L, 3L),   // dominated by id 3 (same y, smaller x — y tie is strict on x)
      (6L, 4L, 9L),   // frontier
      (7L, 3L, 9L),   // dominated by id 6
      (8L, 1L, 1L))   // dominated by everything
      .toDF("id", "x", "y")
    val out = Pareto.skyline2D(pts, "x", "y")
      .select("id").as[Long].collect().sorted
    out shouldBe Array(1L, 2L, 3L, 6L)
  }

  test("skyline2D: null criteria dropped, single point survives") {
    val pts = Seq(
      (1L, Some(5L), Some(5L)),
      (2L, None, Some(9L)),
      (3L, Some(9L), None))
      .toDF("id", "x", "y")
    Pareto.skyline2D(pts, "x", "y")
      .select("id").as[Long].collect() shouldBe Array(1L)
  }

  test("skyline2DGrouped: dominance judged within each stratum only") {
    val pts = Seq(
      // group g1: (10,1) and (1,10) both frontier; (1,1) dominated
      (1L, "g1", 10L, 1L), (2L, "g1", 1L, 10L), (3L, "g1", 1L, 1L),
      // group g2: a single modest point survives even though g1's points
      // would dominate it globally
      (4L, "g2", 2L, 2L))
      .toDF("id", "grp", "x", "y")
    val out = Pareto.skyline2DGrouped(pts, Seq("grp"), "x", "y")
      .select("id").as[Long].collect().sorted
    out shouldBe Array(1L, 2L, 4L)
  }

  test("oversized frontier falls back to a shuffled join, same result") {
    // raw unquantized x: every row its own frontier point (y = x, an
    // anti-chain) — the pathological case that used to broadcast unbounded
    val pts = (1L to 200L).map(i => (i, i, 201L - i)).toDF("id", "x", "y")
    val guarded = Pareto.skyline2DGrouped(pts, Nil, "x", "y",
      maxFrontier = 10L)
    // the fallback drops the broadcast HINT (the optimizer may still
    // choose to broadcast a genuinely small frame — the guard only stops
    // FORCING it); the under-threshold path keeps the hint
    guarded.queryExecution.analyzed.toString should not include "ResolvedHint"
    val broadcasted = Pareto.skyline2D(pts, "x", "y")
    broadcasted.queryExecution.analyzed.toString should include ("ResolvedHint")
    guarded.select("id").as[Long].collect().sorted shouldBe
      broadcasted.select("id").as[Long].collect().sorted
    guarded.count() shouldBe 200L
    an[IllegalArgumentException] should be thrownBy
      Pareto.skyline2DGrouped(pts, Nil, "x", "y", maxFrontier = 0L)
  }
}

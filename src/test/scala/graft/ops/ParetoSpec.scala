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
}

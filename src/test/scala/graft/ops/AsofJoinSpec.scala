package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left: DataFrame = Seq(
    // (id, key, ts)
    (1L, "a", 100L),
    (2L, "a", 250L),
    (3L, "a", 300L), // equal-ts with right row r30
    (4L, "b", 50L),  // before any right row for b
    (5L, "b", 500L),
    (6L, "c", 10L)   // key with no right rows at all
  ).toDF("id", "key", "ts")

  private def right: DataFrame = Seq(
    // (rid, key, ts, v)
    (10L, "a", 90L, 1.0),
    (20L, "a", 200L, 2.0),
    (30L, "a", 300L, 3.0),
    (40L, "b", 100L, 4.0),
    (41L, "b", 100L, 5.0) // duplicate (key, ts): highest rid wins
  ).toDF("rid", "key", "ts", "v")

  /** brute-force oracle: per left row, scan all right rows. */
  private def brute(inclusive: Boolean): Map[Long, Option[Long]] = {
    val ls = left.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    ls.map { case (id, k, ts) =>
      val cands = rs.filter { case (_, rk, rts) =>
        rk == k && (if (inclusive) rts <= ts else rts < ts) }
      // latest ts, then highest rid
      id -> cands.sortBy { case (rid, _, rts) => (-rts, -rid) }.headOption.map(_._1)
    }.toMap
  }

  private def run(inclusive: Boolean): Map[Long, Option[Long]] =
    AsofJoin.asofJoin(left, right, "key", "ts", "ts", "rid", "r_", inclusive)
      .select("id", "r_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("inclusive as-of join matches the brute-force oracle") {
    run(inclusive = true) shouldBe brute(inclusive = true)
    // spot-check the semantics the construction encodes
    val m = run(inclusive = true)
    m(3L) shouldBe Some(30L)  // equal-ts right row IS visible
    m(4L) shouldBe None       // left row before any right row
    m(6L) shouldBe None       // key absent from right
    m(5L) shouldBe Some(41L)  // (key,ts)-duplicate: highest tie id wins
  }

  test("strict as-of join excludes equal-ts right rows") {
    run(inclusive = false) shouldBe brute(inclusive = false)
    run(inclusive = false)(3L) shouldBe Some(20L) // 300 hidden, falls back to 200
  }

  test("maxGap tolerance nulls stale matches, keeps fresh ones and rows") {
    val out = AsofJoin.asofJoin(left, right, "key", "ts", "ts",
        tieCol = "rid", rightPrefix = "r_", maxGap = 60L)
      .select("id", "r_rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    out(1L) shouldBe Some(10L) // gap 10 ≤ 60 → kept
    out(2L) shouldBe Some(20L) // gap 50 ≤ 60 → kept
    out(3L) shouldBe Some(30L) // gap 0
    out(5L) shouldBe None      // r41 is 400 stale → tolerance nulls it
    out(4L) shouldBe None      // genuinely no prior row
    out.keySet should have size 6 // every left row survives
  }

  test("right payload columns arrive prefixed, left schema unchanged") {
    val out = AsofJoin.asofJoin(left, right, "key", "ts", "ts", "rid", "r_")
    out.columns.toSeq shouldBe Seq("id", "key", "ts", "r_rid", "r_ts", "r_v")
  }

  test("plan shuffles once for the as-of window (no range fan-out)") {
    val out = AsofJoin.asofJoin(left, right, "key", "ts", "ts", "rid", "r_")
    val plan = out.queryExecution.executedPlan.toString
    // no broadcast-nested-loop / cartesian from a theta-join formulation
    plan should not include "BroadcastNestedLoop"
    plan should not include "Cartesian"
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: for each left row (a point on an integer
  * axis — event-time micros, a position, a price), attach every right row
  * whose [start, end] interval contains it. The reference has no range
  * joins (SURVEY §2.4); Spark's own planner turns the naive
  * `p.ts BETWEEN i.start AND i.end` theta-join into a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) work however few pairs
  * actually overlap.
  *
  * This is the standard BINNED interval join instead (the shape genomics
  * overlap joins and time-series engines use):
  *
  *   1. Each interval is exploded to the fixed-width bins it covers
  *      (`sequence(start div W, end div W)`).
  *   2. Each point carries its single bin (`ts div W`).
  *   3. ONE hash equi-join on the bin id, then the exact containment
  *      filter. A (point, interval) pair can meet in at most one bin — the
  *      point's — so no post-join dedup is needed.
  *
  * Scale shape: shuffles are linear in |points| + |interval bin copies|;
  * bin copies per interval = span/W + 1, so `binWidth` trades replication
  * against bin selectivity — size it near the median interval span. Hot
  * bins (many concurrent intervals) are genuine result mass, not join
  * skew: the output itself contains every overlapping pair. For
  * aggregate-only consumers (concurrency counts), aggregate AFTER the
  * containment filter and the pair rows never materialize beyond the
  * shuffle.
  */
object RangeJoin {

  /** All (point, interval) containment pairs. `points`/`intervals` keep
    * their columns (prefix right-side collisions upstream); `ptCol`,
    * `startCol`, `endCol` are integer (long) axis columns. Intervals with
    * end < start are dropped (empty by definition), null bounds never
    * match. */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // `div`, not `/` or floor(x/w): / on longs is DOUBLE division (loses
    // exactness past 2^53 — event-time micros live there), and any integer
    // division is bin-consistent as long as BOTH sides use the same one
    // (div is monotone for a positive divisor, so a contained point's bin
    // always lands inside its interval's bin range)
    val p = points.withColumn("_bin", expr(s"`$ptCol` div ${binWidth}L"))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bin", explode(sequence(
        expr(s"`$startCol` div ${binWidth}L"),
        expr(s"`$endCol` div ${binWidth}L"))))
    p.join(i, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-overlap join: all (a, b) row pairs whose [start, end]
    * intervals intersect (`a.start <= b.end AND b.start <= a.end`). Same
    * binning as `pointInInterval`, with the exactly-once trick replacing a
    * distinct: an overlapping pair meets in EVERY shared bin, so the join
    * keeps a pair only in the bin containing the overlap's START
    * (`greatest(a.start, b.start) div W`) — both intervals necessarily
    * cover that instant, so the pair survives exactly once and the
    * post-join distinct (a full extra shuffle of the result) disappears.
    * Callers prefix their columns to avoid collisions and apply their own
    * canonicalization (self-joins: filter `a.id < b.id` after). */
  def overlappingPairs(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val ab = a.filter(col(aStart) <= col(aEnd)).withColumn("_bin",
      explode(sequence(expr(s"`$aStart` div ${binWidth}L"),
        expr(s"`$aEnd` div ${binWidth}L"))))
    val bb = b.filter(col(bStart) <= col(bEnd)).withColumn("_bin",
      explode(sequence(expr(s"`$bStart` div ${binWidth}L"),
        expr(s"`$bEnd` div ${binWidth}L"))))
    ab.join(bb, Seq("_bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("_bin") ===
        expr(s"greatest(`$aStart`, `$bStart`) div ${binWidth}L"))
      .drop("_bin")
  }

  /** Concurrency count: how many intervals contain each point — the
    * classic interval-overlap analytic (sessions active at an instant,
    * orders in flight at a timestamp). Points matching no interval report
    * 0 (left join semantics), so the output is one row per point. */
  def concurrency(
      points: DataFrame,
      idCol: String,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    val pairs = pointInInterval(
      points.select(col(idCol), col(ptCol)), ptCol,
      intervals.select(col(startCol), col(endCol)), startCol, endCol, binWidth)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_active"))
    points.select(col(idCol), col(ptCol))
      .join(pairs, Seq(idCol), "left")
      .withColumn("n_active", coalesce(col("n_active"), lit(0L)))
  }
}

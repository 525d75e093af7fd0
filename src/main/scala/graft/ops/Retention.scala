package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users grouped by their FIRST
  * activity period (the cohort), then for each (cohort, periods-since)
  * cell, how many of the cohort's users were active — the retention
  * triangle every engagement dashboard draws.
  *
  * Scale shape: one groupBy on the user key for first-activity, one
  * distinct on (user, period) for activity, one keyed join between them
  * (both sides shuffle on the user key — cohorts are |users|-sized, too
  * big to broadcast by contract), and a final count-distinct over the
  * |cohorts|×|ages| cells. All integer period math (`ts div periodUs`),
  * so the triangle hash-compares across engines. */
object Retention {

  /** @param periodUs cohort/activity granularity in timestamp units
    *                 (e.g. 7 days of microseconds for weekly retention).
    * Output: (cohort_period, age, n_users) — age 0 row is the cohort size.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsUsCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    // integer FLOOR division (`div` truncates toward zero, which would
    // disagree with the oracle's `//` and fold pre-epoch timestamps into
    // period 0): subtracting the positive pmod remainder first makes the
    // div exact-and-floored for any sign
    val period = expr(s"(CAST(`$tsUsCol` AS BIGINT) - " +
      s"pmod(CAST(`$tsUsCol` AS BIGINT), ${periodUs}L)) div ${periodUs}L")
    val cohorts = events
      .groupBy(col(userCol).as("_u"))
      .agg(min(period).as("cohort_period"))
    val active = events
      .select(col(userCol).as("_u"), period.as("_p"))
      .distinct()
    active.join(cohorts, "_u")
      .groupBy(col("cohort_period"),
        (col("_p") - col("cohort_period")).as("age"))
      .agg(count_distinct(col("_u")).as("n_users"))
  }
}

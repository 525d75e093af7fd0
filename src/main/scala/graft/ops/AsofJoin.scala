package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the LATEST right
  * row of the same key whose timestamp is <= (inclusive) or < (strict) the
  * left row's timestamp — the trades-vs-quotes / event-vs-state-snapshot
  * operator that plain equi-joins can't express.
  *
  * Spark has no built-in as-of join, and the naive formulations collapse at
  * scale: a theta-join (`l.key = r.key AND r.ts <= l.ts` + max-per-row)
  * plans as a broadcast-nested-loop or a massive range fan-out. This is the
  * union-tag construction instead:
  *
  *   1. Tag left rows side=1 and right rows side=0 (0 and 1 swap for strict
  *      mode) and union them into one (key, ts, side, payload) relation.
  *   2. One window, partitioned by key and ordered by (ts, side, tie):
  *      `last(right_payload, ignoreNulls)` over rows unbounded-preceding →
  *      current-row carries the most recent right payload forward onto
  *      every left row.
  *   3. Keep the left rows and flatten the carried payload.
  *
  * Scale shape: exactly ONE shuffle (the window exchange on key) no matter
  * how many right rows precede each left row — no range explosion, no
  * per-row re-scan. Per-key partitions sort (ts, side), which is the same
  * cost as any keyed window; a key hot enough to skew a window is a bot to
  * filter upstream. This is how production Spark time-series libraries
  * shape the operator.
  *
  * Determinism: when several right rows share (key, ts), `tieCol` (an id
  * column on the right side) breaks the tie — the HIGHEST tie value wins,
  * matching "latest write wins" snapshot semantics. The right side is
  * pre-deduped per (key, ts) with one keyed window on the (smaller) right
  * relation so the carried payload is unique before the union.
  */
object AsofJoin {

  /** @param rightPrefix namespaces the attached right columns
    *                    (`click_event_id`, ...); the right key column is
    *                    dropped (it equals the left key on every match).
    * @param inclusive   true → match right.ts <= left.ts; false (strict) →
    *                    right.ts < left.ts.
    * @param maxGap      staleness tolerance in the timestamp's unit: a
    *                    carried match older than `maxGap` before the left
    *                    row becomes NO match (null payload) — the
    *                    point-in-time feature-join bound that stops a
    *                    months-stale snapshot from silently enriching
    *                    today's event. Row-local post-check on the carried
    *                    struct; the plan shape is unchanged.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      tieCol: String,
      rightPrefix: String,
      inclusive: Boolean = true,
      maxGap: Long = Long.MaxValue): DataFrame = {
    require(maxGap > 0,
      s"maxGap must be positive (a negative tolerance would null every " +
        s"match), got $maxGap")
    // dedupe right per (key, ts): highest tie wins
    val dw = Window.partitionBy(col(keyCol), col(rightTsCol))
      .orderBy(col(tieCol).desc)
    val rdistinct = right
      .withColumn("_rn", row_number().over(dw))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val rPayloadCols = rdistinct.columns.filter(_ != keyCol).toSeq
    val rStruct = struct(rPayloadCols.map(col): _*)
    val rType = rdistinct.select(rStruct.as("_r")).schema("_r").dataType

    // Inclusive: right rows sort BEFORE left rows at equal ts (side 0 < 1),
    // so an equal-ts right row is visible to the left row. Strict: left
    // rows sort first, hiding equal-ts right rows.
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)

    val lTagged = left.select(
      col(keyCol).as("_k"),
      col(leftTsCol).cast("long").as("_ts"),
      lit(leftSide).as("_side"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = rdistinct.select(
      col(keyCol).as("_k"),
      col(rightTsCol).cast("long").as("_ts"),
      lit(rightSide).as("_side"),
      lit(null).cast(lTagged.schema("_l").dataType).as("_l"),
      rStruct.as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
    val joined = (if (maxGap == Long.MaxValue) carried
      else carried.withColumn("_match",
        // when() without otherwise nulls stale matches; an already-null
        // match stays null (null condition → null branch)
        when(col("_ts") - col(s"_match.$rightTsCol") <= maxGap,
          col("_match"))))
      .filter(col("_side") === leftSide)

    val leftOut = left.columns.toSeq.map(c => col(s"_l.$c").as(c))
    val rightOut = rPayloadCols.map(c => col(s"_match.$c").as(s"$rightPrefix$c"))
    joined.select(leftOut ++ rightOut: _*)
  }
}

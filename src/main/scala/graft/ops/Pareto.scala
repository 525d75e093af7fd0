package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection: the rows not strictly dominated on
  * two maximize-criteria — the "best length-for-diversity / quality-for-
  * cost" curation view a training-data pipeline uses to pick exemplar
  * documents without a hand-tuned scalar score.
  *
  * Dominance: q dominates p iff q.x ≥ p.x ∧ q.y ≥ p.y ∧ (q.x > p.x ∨
  * q.y > p.y). Ties: coincident points do not dominate each other, so every
  * row at a frontier point survives.
  *
  * Plan shape (100 TB posture): the naive skyline is a quadratic self-join;
  * this one is (1) a per-x groupBy (one keyed shuffle, map-side combine) to
  * |distinct x| rows, (2) a running-max window over those to mark frontier
  * points, (3) a broadcast join of the (frontier-sized, ≤ |distinct x|)
  * point set back onto the corpus. The window sorts only the per-x maxima —
  * for integer/e6-quantized metrics that is value-domain-sized, not
  * corpus-sized, which is the knob to remember at scale: quantize the
  * criteria before calling (scores here are already exact integers).
  */
object Pareto {

  /** Rows of `df` on the maximize-(xCol, yCol) Pareto frontier. Criteria
    * must be non-null; rows with a null criterion are dropped up front
    * (null is never "better than" anything). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame =
    skyline2DGrouped(df, Nil, xCol, yCol)

  /** Per-group frontier: dominance is judged WITHIN each `groupCols`
    * stratum (per-domain exemplars, per-language quality/length curve) —
    * the staircase window partitions by group, so no stratum's giants
    * shadow another's. Empty groupCols = the global skyline.
    *
    * The frontier is bounded by |distinct x| per group — small when the
    * criteria are quantized as documented, but NOTHING enforced that: a
    * caller passing raw doubles at corpus scale used to broadcast an
    * unbounded frame. The frontier is now materialized once
    * (localCheckpoint — it feeds both the size check and the join, so the
    * corpus is still scanned once) and counted; at ≤ `maxFrontier` rows it
    * broadcasts as before, above it the join falls back to a shuffled
    * equi-join — same result, no driver/executor OOM. */
  def skyline2DGrouped(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String, maxFrontier: Long = 4000000L): DataFrame = {
    require(maxFrontier >= 1, s"maxFrontier must be >= 1, got $maxFrontier")
    val gcols = groupCols.map(col)
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = pts.groupBy(gcols :+ col(xCol): _*)
      .agg(max(col(yCol)).as("__ymax"))
    // Descending by x, strictly-previous rows only: rmax = best y among
    // points with strictly larger x (per-x grouping ⇒ no x ties in frame).
    val w = Window.partitionBy(gcols: _*).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__rmax", max(col("__ymax")).over(w))
      // Dominated x-level: some larger x reaches ≥ this level's best y
      // (larger x is the strict part). Survivors strictly improve y as x
      // decreases — the classic staircase.
      .filter(col("__rmax").isNull || col("__ymax") > col("__rmax"))
      .select(gcols ++ Seq(col(xCol), col("__ymax").as(yCol)): _*)
      .localCheckpoint()
    // Within a surviving x level only the y = ymax rows are undominated
    // (same x, larger y is strict) — the equi-join on (group, x, ymax)
    // keeps exactly those, duplicates included.
    val keys = groupCols ++ Seq(xCol, yCol)
    if (frontier.count() <= maxFrontier) pts.join(broadcast(frontier), keys)
    else pts.join(frontier, keys)
  }
}

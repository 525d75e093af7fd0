package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches HLL via Spark's
  * `hll_sketch_agg` family) — the incremental complement to exact
  * `count(distinct)`: a 100 TB corpus tracking distinct users/docs/tokens
  * per ingest batch cannot rescan history per report, but HLL sketches are
  * a commutative monoid (union = register-wise max), so each batch reduces
  * once to a few-KB binary per group and every later report is a merge of
  * sketches — history is never touched again.
  *
  * Determinism: the sketch registers are a pure fold of the input hash
  * values — estimates are deterministic for a given input set (order- and
  * partition-independent), and union-of-parts produces the IDENTICAL
  * sketch state as a direct sketch of the union (spec-asserted), so the
  * incremental path gives exactly the one-shot answer.
  *
  * Scale shape: one grouped aggregate per batch (map-side partials — the
  * sketch IS the partial), |groups|-sized state, no shuffle of history.
  * Exact twins stay available for audit where a rescan is affordable. */
object Sketches {

  /** Per-group HLL sketch of `valueCol` — the mergeable per-batch state.
    * `lgK` trades size for accuracy (2^lgK registers; 12 → ~1.6% RSE). */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge persisted per-batch sketch rows down to one sketch per group —
    * the read side of the incremental loop. Sketches must share `lgK`
    * (mixing lgK silently degrades to the coarser size; keep one lgK per
    * metric, so a mismatch fails loudly here instead). */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(false)).as("sketch"))

  /** Estimated distinct count from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Audit report: merged-sketch estimate vs the exact distinct count,
    * with a relative-error bound check — the periodic trust-but-verify
    * pass that catches a mis-merged or stale sketch store. One row per
    * group: (groups..., n_exact, n_est, within_tol). */
  def cardinalityAudit(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12, tol: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
          .as("n_est"))
      .withColumn("within_tol",
        abs(col("n_est") - col("n_exact")).cast("double") <=
          lit(tol) * col("n_exact").cast("double"))
}

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

  // ---- mergeable frequent-items (heavy hitters) state ------------------
  //
  // The frequency sibling of the HLL loop: per-batch per-group
  // `approx_top_k_accumulate` state (DataSketches frequent-items under
  // Spark's approx_top_k trio) that merges across batches without
  // rescanning history — the "who are the heaviest users/domains/tokens so
  // far" tracker. While the tracked-item map never fills
  // (`maxItemsTracked` ≥ live distinct items), counts are EXACT and
  // merge-of-parts ≡ one-shot (spec-asserted); past that the sketch purges
  // and estimates carry deterministic (not probabilistic) error bounds.
  // Size the map from `keySkewProfile`'s n_keys before trusting estimates.

  /** Per-group frequent-items state of `itemCol` — the per-batch
    * accumulate side. State is a few KB per group at default map sizes. */
  def topKSketches(df: DataFrame, groupCols: Seq[String], itemCol: String,
      maxItemsTracked: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("approx_top_k_accumulate",
        col(itemCol), lit(maxItemsTracked)).as("topk_state"))

  /** Merge persisted per-batch states down to one per group. All inputs
    * must share an item type; `maxItemsTracked` caps the merged map. */
  def mergeTopKSketches(df: DataFrame, groupCols: Seq[String],
      stateCol: String = "topk_state",
      maxItemsTracked: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("approx_top_k_combine",
        col(stateCol), lit(maxItemsTracked)).as("topk_state"))

  /** Top-k (item, est) rows from a state column. In-sketch tie order is
    * engine-local — re-rank on (est DESC, item) before comparing. */
  def topKEstimate(state: Column, k: Int): Column =
    call_function("approx_top_k_estimate", state, lit(k))

  /** Audit: the EXACT top-k heavy items per group (total order on count
    * DESC, item — replayable on any engine) joined against the merged
    * sketch's estimates: `est_exact` is true while the sketch never
    * purged. The sketch is probed `estDepth` deep, NOT k deep — the
    * sketch's own tie order at the k boundary is engine-local, so the
    * probe must be deeper than any tie run crossing rank k (defaulting to
    * the whole tracked map keeps the audit tie-proof; the explode is
    * bounded by |groups|·maxItemsTracked, audit-pass sized). One grouped
    * count in item space + one |groups·k| join. */
  def frequencyAudit(df: DataFrame, groupCols: Seq[String], itemCol: String,
      k: Int, maxItemsTracked: Int = 10000, estDepth: Int = 0): DataFrame = {
    val depth = if (estDepth > 0) estDepth else maxItemsTracked
    val gcols = groupCols.map(col)
    val exact = df.groupBy(gcols :+ col(itemCol).as("item"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(gcols: _*)
          .orderBy(col("cnt").desc, col("item"))).cast("long"))
      .filter(col("rnk") <= k)
    val est = topKSketches(df, groupCols, itemCol, maxItemsTracked)
      .select(gcols :+ explode(topKEstimate(col("topk_state"), depth)).as("e"): _*)
      .select(gcols :+ col("e.item").as("item") :+ col("e.count").as("est"): _*)
    exact.join(est, groupCols :+ "item", "left")
      .withColumn("est_exact", coalesce(col("est") === col("cnt"), lit(false)))
      .select(gcols ++ Seq(col("rnk"), col("item"), col("cnt"),
        col("est_exact")): _*)
  }
}

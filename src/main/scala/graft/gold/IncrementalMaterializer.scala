package graft.gold

import graft.config.GoldModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S11 — incremental mart refresh: MERGE-on-unique-key semantics without an
  * Iceberg/Delta runtime (reference: dbt incremental_strategy='merge',
  * gold/models/analytics/daily_trip_stats.sql:3-11 + 7-day lookback :46-52;
  * anti-join fallback chosen per SURVEY §7.4 — stock Spark jars only).
  *
  * Correctness contract: the lookback window must cover every row of every
  * affected group (true when group keys are derived from the watermark
  * column, e.g. year/month of a date, and lookback ≥ the group granularity).
  * Then `merge(old, recompute(window)) == full recompute` — the invariant
  * the oracle query asserts.
  *
  * Scale notes: the delta aggregation scans only the lookback partitions
  * (partition-pruned when silver is written partitionBy(year,month)); the
  * anti-join's build side is the recomputed keys — tiny, broadcast — so the
  * existing mart is never shuffled.
  */
object IncrementalMaterializer {

  /** MERGE semantics on a composite key: rows of `existing` whose key
    * appears in `updates` are replaced; everything else is kept. */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updatedKeys = updates.select(keys.map(col): _*).distinct()
    existing.join(broadcast(updatedKeys), keys, "left_anti")
      .unionByName(updates)
  }

  /** Watermark for incremental refresh: max(watermarkCol) over the existing
    * mart minus `lookback`, as a SQL timestamp literal; None when the mart
    * is empty (→ full refresh). */
  def watermark(existing: DataFrame, watermarkCol: String,
      lookbackDays: Int): Option[java.sql.Timestamp] = {
    val r = existing.agg(max(col(watermarkCol))).head()
    if (r.isNullAt(0)) None
    else Some(java.sql.Timestamp.from(
      r.getTimestamp(0).toInstant.minus(java.time.Duration.ofDays(lookbackDays))))
  }

  /** Incremental refresh: recompute the model over silver rows at/after the
    * watermark and merge into the existing mart. Empty mart → full build. */
  def refresh(
      silver: DataFrame,
      existing: Option[DataFrame],
      model: GoldModel,
      watermarkSourceCol: String,
      martWatermarkCol: String,
      lookbackDays: Int): DataFrame = {
    // a rollup/cube mart has N grouping sets per key tuple: the MERGE key
    // (groupBy names) no longer identifies a row, so incremental refresh
    // would silently collide subtotal levels — rebuild those marts fully
    require(!model.rollup && !model.cube,
      s"gold model ${model.name}: rollup/cube marts cannot refresh " +
        "incrementally (grouping sets share key tuples) - rebuild fully")
    existing.flatMap(e =>
      watermark(e, martWatermarkCol, lookbackDays).map { wm =>
        val delta = silver.filter(col(watermarkSourceCol) >= lit(wm))
        val updates = AggregationEngine.build(delta, model)
        // The mart's watermark column must be one of the model's measures
        // (e.g. max(event_ts) AS last_ts) so existing and recomputed rows
        // share a schema — fail fast otherwise, unionByName's error is cryptic.
        require(e.columns.sorted.sameElements(updates.columns.sorted),
          s"existing mart columns [${e.columns.sorted.mkString(",")}] must match " +
            s"model output [${updates.columns.sorted.mkString(",")}]; include the " +
            s"watermark column '$martWatermarkCol' as a model measure")
        merge(e, updates, model.groupBy.map(keyName))
      }).getOrElse(AggregationEngine.build(silver, model))
  }

  /** groupBy entries may be "col" or "expr AS alias" — the mart key is the
    * output name. */
  private def keyName(groupByEntry: String): String = {
    val parts = groupByEntry.split("(?i)\\s+as\\s+")
    parts.last.trim
  }

  /** Incremental maintenance of an ENRICHMENT-JOIN view (fact ⋈ dim):
    * `view == fact ⋈ dim` stays true as fact rows arrive or are replaced,
    * without ever re-reading or re-shuffling the historical fact side.
    *
    * Append/upsert delta rule for a view V = F ⋈ D under ΔF:
    * V' = (V ∖ keys(ΔF)) ∪ (ΔF ⋈ D) — the dim side is treated as the
    * slowly-changing lookup it is in the reference's enrichment joins
    * (zone/vendor lookups, SURVEY §2.4); a dim change is a full-view event,
    * not an incremental one, and callers rebuild for that.
    *
    * Scale shape: ΔF is a partition-pruned tail scan; D is broadcast (dims
    * here are small by construction); the anti-join's build side is
    * keys(ΔF) — tiny, broadcast. The existing view moves ZERO bytes through
    * a shuffle: this is the property that makes a 100 TB enriched view
    * maintainable at all. Oracle-checked as `refreshJoin(...) == full
    * fact ⋈ dim rebuild`.
    */
  def refreshJoin(existing: DataFrame, deltaFact: DataFrame, dim: DataFrame,
      factKeys: Seq[String], joinKeys: Seq[String]): DataFrame = {
    val enriched = deltaFact.join(broadcast(dim), joinKeys, "left")
    require(existing.columns.sorted.sameElements(enriched.columns.sorted),
      s"existing view columns [${existing.columns.sorted.mkString(",")}] must " +
        s"match delta⋈dim output [${enriched.columns.sorted.mkString(",")}]")
    merge(existing, enriched, factKeys)
  }
}

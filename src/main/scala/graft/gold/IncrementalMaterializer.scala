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

  /** One algebraic measure of [[refreshAlgebraic]]: `op` ∈ count | sum |
    * min | max, `inCol` the delta input column (ignored for count),
    * `outCol` the mart column the partial lives in. */
  final case class AlgebraicMeasure(outCol: String, op: String,
      inCol: String)

  /** TRUE delta-fold mart maintenance — one step stronger than
    * [[refresh]]: that path RECOMPUTES every affected group from a
    * lookback window of the source; this one never re-reads the source
    * at all. For ALGEBRAIC measures (count/sum/min/max — partials that
    * combine associatively) the old mart row IS a sufficient partial,
    * so the update is
    *
    *   V' = (V ∖ touched) ∪ (V ⋉ touched ⊕ agg(Δ))
    *
    * — aggregate the raw delta to per-key partials, full-outer-join them
    * against ONLY the touched slice of the mart, and combine per
    * measure (sum/count add; min/max take the null-safe extreme). avg
    * is NOT algebraic — store sum and count and divide downstream; nor
    * is count-distinct — use the HLL sketch state (`Sketches`) when an
    * estimate is acceptable.
    *
    * Correctness contract: Δ must be APPEND-ONLY rows (no updates or
    * deletes — combine cannot retract a min). The invariant the oracle
    * asserts: `refreshAlgebraic(agg(F), Δ) == agg(F ∪ Δ)`.
    *
    * Scale shape: the delta aggregate is churn-sized; touched keys are
    * its key set (broadcast to both the semi- and anti-join probes), so
    * the historical mart — the 100 TB side — moves zero bytes through a
    * shuffle and is scanned once. */
  def refreshAlgebraic(existing: DataFrame, delta: DataFrame,
      keys: Seq[String], measures: Seq[AlgebraicMeasure]): DataFrame = {
    require(measures.nonEmpty, "refreshAlgebraic needs at least one measure")
    val bad = measures.map(_.op).filterNot(
      Set("count", "sum", "min", "max").contains)
    require(bad.isEmpty,
      s"non-algebraic ops [${bad.mkString(",")}] - only count/sum/min/max " +
        "partials combine; store sum+count for avg, sketches for distinct")
    val aggs = measures.map { m =>
      (m.op match {
        case "count" => count(lit(1))
        case "sum" => sum(col(m.inCol))
        case "min" => min(col(m.inCol))
        case "max" => max(col(m.inCol))
      }).as(m.outCol)
    }
    val deltaPart = delta.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    require(existing.columns.sorted.sameElements(deltaPart.columns.sorted),
      s"existing mart columns [${existing.columns.sorted.mkString(",")}] " +
        s"must match the measure spec output " +
        s"[${deltaPart.columns.sorted.mkString(",")}]")
    val touched = deltaPart.select(keys.map(col): _*).distinct()
    val untouched = existing.join(broadcast(touched), keys, "left_anti")
    val old = existing.join(broadcast(touched), keys, "left_semi")
    val e = old.select(
      keys.map(col) ++ measures.map(m => col(m.outCol).as(s"__e_${m.outCol}")): _*)
    val d = deltaPart.select(
      keys.map(col) ++ measures.map(m => col(m.outCol).as(s"__d_${m.outCol}")): _*)
    val combined = e.join(d, keys, "full_outer")
      .select(keys.map(col) ++ measures.map { m =>
        val a = col(s"__e_${m.outCol}")
        val b = col(s"__d_${m.outCol}")
        (m.op match {
          case "count" | "sum" =>
            coalesce(a, lit(0L)) + coalesce(b, lit(0L))
          case "min" => when(a.isNull, b).when(b.isNull, a)
            .otherwise(least(a, b))
          case "max" => when(a.isNull, b).when(b.isNull, a)
            .otherwise(greatest(a, b))
        }).as(m.outCol)
      }: _*)
    untouched.unionByName(combined.select(existing.columns.map(col): _*))
  }
}

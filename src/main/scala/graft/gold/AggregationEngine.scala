package graft.gold

import graft.config.GoldModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A5 — the config-generic grouped-measure engine behind all three reference
  * gold marts (gold/jobs/build_gold_layer.py:58-187,
  * lakehouse_config.yaml:239-331) and the dashboard second-level rollups.
  *
  * Scale notes: the plan is a single hash-aggregate with map-side partial
  * aggregation (Spark plans partial+final automatically), so the shuffle
  * carries only one partially-aggregated row per (task × group) — at 100 TB
  * with low-cardinality group keys this is a few KB per task regardless of
  * input size. Measures are SQL expression strings compiled by Catalyst, so
  * everything stays inside whole-stage codegen; no UDFs.
  */
object AggregationEngine {

  private def parseSort(spec: String): Column = {
    val parts = spec.trim.split("\\s+")
    val c = col(parts(0))
    if (parts.length > 1 && parts(1).equalsIgnoreCase("desc")) c.desc else c.asc
  }

  def build(df: DataFrame, model: GoldModel): DataFrame = {
    require(model.measures.nonEmpty, s"gold model ${model.name} needs measures")
    val filtered = model.filters.foldLeft(df)((d, f) => d.filter(f))
    // groupBy entries may be bare columns or aliased expressions.
    val keys = model.groupBy.map(expr)
    val aggs = model.measures.map(m => expr(m.expression).as(m.name))
    val grouped =
      if (keys.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
      else filtered.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val ordered =
      if (model.orderBy.nonEmpty) grouped.orderBy(model.orderBy.map(parseSort): _*)
      else grouped
    // orderBy+limit plans as TakeOrderedAndProject (top-k per partition →
    // k-merge on driver), never a global sort.
    model.limit.fold(ordered)(ordered.limit)
  }
}

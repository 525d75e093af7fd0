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
    require(!(model.rollup && model.cube),
      s"gold model ${model.name}: rollup and cube are mutually exclusive")
    require(!(model.rollup || model.cube) || model.groupBy.nonEmpty,
      s"gold model ${model.name}: rollup/cube need group_by dims")
    val filtered = model.filters.foldLeft(df)((d, f) => d.filter(f))
    // groupBy entries may be bare columns or aliased expressions.
    val keys = model.groupBy.map(expr)
    val aggs = model.measures.map(m => expr(m.expression).as(m.name))
    val grouped =
      if (model.rollup || model.cube) {
        // multi-level form: all hierarchy levels (rollup) or the full dim
        // lattice (cube) in one aggregate, subtotal rows tagged by the
        // `gid` grouping-set bitmask (ops/Grouping semantics, q154/q159).
        val sets =
          if (model.rollup) filtered.rollup(keys: _*) else filtered.cube(keys: _*)
        sets.agg(grouping_id().cast("long").as("gid"), aggs: _*)
      }
      else if (keys.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
      else filtered.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val ordered =
      if (model.orderBy.nonEmpty) grouped.orderBy(model.orderBy.map(parseSort): _*)
      else grouped
    // orderBy+limit plans as TakeOrderedAndProject (top-k per partition →
    // k-merge on driver), never a global sort.
    model.limit.fold(ordered)(ordered.limit)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join surface of the reference (SURVEY §2.4): zones-style dimension
  * enrichment, join+agg top-k, and anti-join key integrity.
  *
  * Scale notes: dimension tables (zones=265 rows; here nation/supplier/part)
  * are always broadcast — an explicit `broadcast()` hint, not a threshold
  * gamble, so the fact table never shuffles for enrichment. Anti-joins
  * aggregate (distinct) BEFORE joining so the shuffle carries distinct keys,
  * not raw rows.
  */
object Joins {

  /** J1 — left-join enrichment of a fact table against a small dimension.
    * `prefix` namespaces the dimension columns (the reference aliases the
    * zones dim twice, pickup_zone/dropoff_zone —
    * scripts/example_zones_join.py:21-35). */
  def enrich(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      prefix: String): DataFrame = {
    val pdim = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"${prefix}_$c"))
    fact.join(broadcast(pdim), fact(factKey) === pdim(s"${prefix}_$dimKey"), "left")
      .drop(s"${prefix}_$dimKey")
  }

  /** J4 / Q17 — keys present in `src` but missing from `tgt` (left-anti on
    * distinct key tuples, reconciliation.py:231-308). Distinct-before-join
    * keeps the shuffle minimal. */
  def missingKeys(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.select(keys.map(col): _*).distinct()
      .join(tgt.select(keys.map(col): _*).distinct(), keys, "left_anti")
}

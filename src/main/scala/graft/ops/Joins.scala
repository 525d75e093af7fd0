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

  /** Salted equi-join for skewed keys, result-identical to
    * `left.join(right, key)`: each probe row carries a deterministic salt
    * in [0, salt), the build side replicates once per salt value, and the
    * join keys on (key, salt) — a hot key's rows spread across `salt`
    * shuffle partitions instead of flooding one task.
    *
    * When to reach for this instead of AQE's skew-join: AQE can split an
    * oversized SORT-MERGE partition only on the PROBE side — it cannot
    * help when the hot key explodes on the build side too, when the join
    * is a shuffled-hash join, or when the skewed exchange is REUSED by
    * another operator (AQE refuses to split a reused exchange). Salting
    * rewrites the key space itself, so it works in every one of those
    * cases — at the documented cost of a `salt`× replication of the build
    * side (use single-digit salts; the build side should be the smaller
    * input).
    *
    * The salt is `xxhash64` over the probe row's full tuple — deterministic
    * (re-runs give identical plans and results, the repo-wide contract),
    * and it spreads a hot key exactly as well as its payloads differ.
    * Fully-identical duplicate rows share a salt; that never affects the
    * RESULT, only the spread of pathological all-duplicate inputs (use
    * rand-free dedup first if you have those). Join columns must be
    * non-null on the probe side to match at all — the usual equi-join
    * contract; null-keyed rows survive only under outer `joinType`s,
    * exactly as in the unsalted join. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    val l = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}

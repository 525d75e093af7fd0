package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance self-join without the quadratic cross product — the
  * entity-resolution / typo-clustering primitive (near-identical names,
  * IDs, titles) that a naive `levenshtein(a, b) <= 1` over all pairs makes
  * unrunnable past ~10^5 strings.
  *
  * Blocking scheme: FastSS deletion neighborhoods. For edit distance ≤ 1,
  * two strings s, t match only if they share a member of
  * {s} ∪ del1(s): equality shares s itself; a substitution at position i
  * means both sides' delete-position-i variants coincide; an insert/delete
  * means the shorter string IS a del1 variant of the longer (and is in its
  * own depth-0 set). So exploding each string into its (len+1)-sized key
  * set and equi-joining on the key finds every true pair; candidates are
  * then verified with the exact `levenshtein` (builtin, codegen'd), which
  * discards the scheme's false positives. Completeness is machine-checked:
  * the oracle for this operator is the full quadratic join, so a green
  * hash-compare proves no pair escapes the blocking.
  *
  * Scale shape: ~(avg_len+1)·n exploded keys, one keyed shuffle, per-key
  * fan-out bounded by block size. Like every LSH-style blocker in this
  * repo, hot keys are the failure mode — `maxBlockSize` drops pathological
  * blocks (e.g. the ""-key block of all 1-char strings) whole, loudly, the
  * `maxShingleFreq`/`maxBucketSize` pattern from Dedup.
  */
object Fuzzy {

  /** All unordered pairs (id_a < id_b) of rows whose `strCol` values are
    * within Levenshtein distance 1, with the distance. */
  def editDistance1Join(df: DataFrame, idCol: String, strCol: String,
      maxBlockSize: Int = 1000): DataFrame = {
    val keyed = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .withColumn("k", explode(array_distinct(expr(
        // i = 0..len-1 deletes char i+1; i = len yields s itself.
        "transform(sequence(0, length(s)), " +
          "i -> concat(substring(s, 1, i), substring(s, i + 2)))"))))
    val capped =
      if (maxBlockSize > 0) {
        val hot = keyed.groupBy("k").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlockSize).select("k")
        keyed.join(broadcast(hot), Seq("k"), "left_anti")
      } else keyed
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
  }
}

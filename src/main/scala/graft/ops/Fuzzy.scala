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
  * blocks (e.g. the ""-key block of all 1-char strings) WHOLE. The drop is
  * silent in the join plan itself (an anti-join; forcing a count there
  * would bolt an extra action onto every call) — [[droppedBlocks]] /
  * [[droppedBlocksBetween]] are the audit surface: run them with the same
  * arguments and alert on nonzero rows, because a dropped block can hide
  * true pairs. `maxBlockSize <= 0` disables the cap entirely.
  */
object Fuzzy {

  /** (id, s, k) with one row per deletion-neighborhood key of s.
    * fanOut (r21): a single-file input plans as ONE scan task, and because
    * the candidate join's small side broadcasts, the ENTIRE pipeline —
    * explode, hot-block probe, join, levenshtein verify, distinct partial
    * — fuses into that one task (measured: 4.4 s of q157's 7.2 s on one
    * core of 32). The conditional repartition spreads the per-row work
    * cluster-wide and is the identity on any already-parallel input. */
  private def delKeys(df: DataFrame, idCol: String, strCol: String): DataFrame =
    Scale.fanOut(
      df.select(col(idCol).cast("long").as("id"), col(strCol).as("s")))
      .withColumn("k", explode(array_distinct(expr(
        // i = 0..len-1 deletes char i+1; i = len yields s itself.
        "transform(sequence(0, length(s)), " +
          "i -> concat(substring(s, 1, i), substring(s, i + 2)))"))))

  /** (id, s, k) with one row per ≤2-deletion-neighborhood key of s —
    * the ed≤2 blocking set: every string reachable by deleting up to two
    * characters (the del≤1 transform applied to its own output, then
    * flattened and deduped). |keys| ≈ 1 + len + len²/2 per row. */
  private def delKeys2(df: DataFrame, idCol: String, strCol: String): DataFrame =
    Scale.fanOut(
      df.select(col(idCol).cast("long").as("id"), col(strCol).as("s")))
      .withColumn("k", explode(array_distinct(expr(
        "flatten(transform(" +
          "transform(sequence(0, length(s)), " +
          "i -> concat(substring(s, 1, i), substring(s, i + 2))), " +
          "t -> transform(sequence(0, length(t)), " +
          "j -> concat(substring(t, 1, j), substring(t, j + 2)))))"))))

  /** All unordered pairs (id_a < id_b) of rows whose `strCol` values are
    * within Levenshtein distance 1, with the distance. */
  def editDistance1Join(df: DataFrame, idCol: String, strCol: String,
      maxBlockSize: Int = 1000): DataFrame = {
    // localCheckpoint (r21): the exploded key table feeds THREE subtrees
    // (the hot-block count, and both self-join sides) — without cutting
    // lineage the explode + array_distinct pipeline runs three times
    // (measured ~2/3 of the query's CPU); checkpointed it runs once
    val keyed = delKeys(df, idCol, strCol).localCheckpoint()
    val capped =
      if (maxBlockSize > 0) {
        val hot = keyed.groupBy("k").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlockSize).select("k")
        keyed.join(broadcast(hot), Seq("k"), "left_anti")
      } else keyed
    // verify BEFORE the distinct: the bounded 3-arg levenshtein (DP
    // early-exits/bands past the threshold) runs map-side on every
    // candidate occurrence — a pair sharing j deletion keys is verified
    // j times — so the distinct's shuffle carries only surviving
    // (id, id, dist) triples instead of every candidate occurrence with
    // both strings aboard. Measured (SCALE.md r20): shuffle 9.5 → 6.4 MB
    // at sf0.1 and 97.3 → 66.4 MB at sf1~ (−33%), wall 11.0 → 9.9 s at
    // sf1~ — the re-verification is cheaper than shipping the strings.
    // -1 = over threshold.
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s"), 1).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** [[editDistance1Join]] widened to Levenshtein distance ≤ 2 — the
    * fat-finger tier real name/title data needs (two typos, a swapped
    * pair of characters, one typo + one truncation). Same FastSS
    * argument one level deeper: ed(s,t) ≤ 2 ⇒ the ≤2-deletion
    * neighborhoods of s and t intersect, so the ~len²/2-key explode +
    * one equi-join finds every true pair and the bounded 3-arg
    * `levenshtein(_, _, 2)` discards the blocking's false positives.
    * The oracle is again the full quadratic join — a green hash proves
    * zero pairs lost to blocking at this depth too.
    *
    * Costs ~len/2× more exploded keys and a denser candidate set than
    * the ed≤1 form — the price of the wider radius, still nowhere near
    * quadratic. Same silent in-plan hot-block cap; audit with
    * [[droppedBlocks2]]. */
  def editDistance2Join(df: DataFrame, idCol: String, strCol: String,
      maxBlockSize: Int = 1000): DataFrame = {
    // same three-consumer checkpoint as editDistance1Join (r21) — the
    // ≤2-deletion explode is ~len/2× heavier per row, so the saving is
    // proportionally larger
    val keyed = delKeys2(df, idCol, strCol).localCheckpoint()
    val capped =
      if (maxBlockSize > 0) {
        val hot = keyed.groupBy("k").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlockSize).select("k")
        keyed.join(broadcast(hot), Seq("k"), "left_anti")
      } else keyed
    // same verify-before-distinct shape as [[editDistance1Join]] (the
    // measured r20 shuffle cut); the ~len²/2-key explode makes the
    // per-occurrence re-verification multiplicity higher here, but the
    // avoided string shipping is bigger in the same proportion
    capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.s"), col("b.s"), 2).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** [[droppedBlocks]] at ed≤2 depth: the ≤2-deletion blocks
    * [[editDistance2Join]] drops at this `maxBlockSize`. */
  def droppedBlocks2(df: DataFrame, idCol: String, strCol: String,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize > 0,
      s"maxBlockSize must be > 0 to drop anything, got $maxBlockSize")
    delKeys2(df, idCol, strCol)
      .groupBy("k").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBlockSize)
      .orderBy(col("n_members").desc, col("k"))
  }

  /** Cross-TABLE record linkage: (left_id, right_id, dist) for every pair
    * within Levenshtein distance 1 — match a dirty fact-side string column
    * (scraped names, typo'd titles) against a canonical dimension without
    * the |L|×|R| cross product. Same deletion-neighborhood blocking and
    * the same completeness argument as [[editDistance1Join]] (the
    * substitution/indel/equality cases never relied on self-joining); the
    * hot-block cap applies to the COMBINED per-key frequency — a key hot
    * on either side floods the join the same way. */
  /** The deletion-neighborhood blocks [[editDistance1Join]] drops at this
    * `maxBlockSize` — (k, n_members), largest first. Empty = the cap was
    * never hit and the join's completeness guarantee is unconditional. */
  def droppedBlocks(df: DataFrame, idCol: String, strCol: String,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize > 0,
      s"maxBlockSize must be > 0 to drop anything, got $maxBlockSize")
    delKeys(df, idCol, strCol)
      .groupBy("k").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBlockSize)
      .orderBy(col("n_members").desc, col("k"))
  }

  /** [[droppedBlocks]] for [[editDistance1JoinBetween]]: the cap there
    * applies to the COMBINED per-key frequency across both tables. */
  def droppedBlocksBetween(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize > 0,
      s"maxBlockSize must be > 0 to drop anything, got $maxBlockSize")
    delKeys(left, leftId, leftStr).select("k")
      .unionAll(delKeys(right, rightId, rightStr).select("k"))
      .groupBy("k").agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBlockSize)
      .orderBy(col("n_members").desc, col("k"))
  }

  def editDistance1JoinBetween(left: DataFrame, leftId: String,
      leftStr: String, right: DataFrame, rightId: String, rightStr: String,
      maxBlockSize: Int = 1000): DataFrame = {
    val lk = delKeys(left, leftId, leftStr)
    val rk = delKeys(right, rightId, rightStr)
    val hot =
      if (maxBlockSize > 0)
        lk.select("k").unionAll(rk.select("k"))
          .groupBy("k").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlockSize).select("k")
      else lk.select("k").limit(0)
    val lc = lk.join(broadcast(hot), Seq("k"), "left_anti")
    val rc = rk.join(broadcast(hot), Seq("k"), "left_anti")
    // verify-before-distinct (the measured r20 shuffle cut): only
    // surviving (left_id, right_id, dist) triples reach the shuffle
    lc.as("a").join(rc.as("b"), col("a.k") === col("b.k"))
      .select(col("a.id").as("left_id"), col("b.id").as("right_id"),
        levenshtein(col("a.s"), col("b.s"), 1).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }
}

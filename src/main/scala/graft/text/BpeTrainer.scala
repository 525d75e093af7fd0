package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction — TRAINS a
  * merge table from the corpus, completing the tokenizer story the engine
  * could previously only measure (`bpe_token_count` q48, fertility q128).
  * The reference has no tokenizer training at all; this is the standard
  * once-per-corpus step of every LLM data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Algorithm (the classic word-count formulation): pre-tokenize on
  * whitespace and reduce the corpus to DISTINCT words with frequencies —
  * every later round works in vocabulary space, not corpus space. Then for
  * each of `numMerges` rounds: count adjacent symbol pairs corpus-wide
  * (weighted by word frequency), merge the most frequent pair everywhere
  * (deterministic tie order: count desc, then left/right symbol asc), and
  * repeat on the re-segmented vocabulary.
  *
  * Determinism across engines and partitionings — the reason this gate can
  * be oracle-checked — comes from the segmentation REPRESENTATION: a word's
  * symbol sequence is one string with every boundary marked by a DOUBLE
  * 0x1F separator (`␟␟c1␟␟c2␟␟…␟␟ck␟␟`). A merge of (l, r) is then the
  * literal string replace of `␟l␟␟r␟` with `␟lr␟`: leftmost-first,
  * non-overlapping, resuming after each replacement — the exact textbook
  * BPE application order, with IDENTICAL semantics in Spark and DuckDB.
  * The double separator is load-bearing: each match consumes only the
  * INNER half of its two boundaries, so consecutive matches share
  * boundaries and a run `aaaa` merges to `(aa)(aa)` — a single-separator
  * encoding would consume the shared boundary and leave `(aa)a a`.
  * Input text containing 0x1F (vanishingly rare — an ASCII control char)
  * is cleaned first; that is the operator's one input contract.
  *
  * Scale: pair counting shuffles pair→count in symbol-pair space (bounded
  * by vocab churn, not corpus size); the argmax ships ONE row to the
  * driver per round; re-segmentation is a row-local string replace over
  * the vocabulary table. Per round: one vocab-sized shuffle + one
  * TakeOrdered(1) — at a 100 TB corpus the words table is the only big
  * frame (~100M distinct words), built once by a single corpus-wide
  * groupBy. `localCheckpoint` per round truncates the growing lineage
  * (the q111 Lloyd-iteration posture).
  */
object BpeTrainer {
  private val S = ""
  private val S2 = S + S

  /** Whitespace words of a text column after separator cleaning — the
    * shared pre-tokenization of the train and apply halves (and of any
    * consumer that must agree with them word-for-word). */
  def wordsOf(c: Column): Column =
    split(trim(regexp_replace(translate(c, S, ""), "\\s+", " ")), " ")

  /** Corpus → (seg, freq): distinct whitespace words with frequencies,
    * each segmented into characters in the wrapped representation. */
  def wordSegs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(wordsOf(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(S2), regexp_replace(col("word"), "(.)", "$1" + S2)).as("seg"),
        col("freq"))

  /** Adjacent symbol-pair counts over a (seg, freq) vocabulary, weighted
    * by word frequency; every adjacent position counts (the Sennrich
    * get_stats convention — `aaa` contributes (a,a) twice). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(split(col("seg"), S2).as("p"), col("freq"))
      .select(col("freq"),
        slice(col("p"), lit(2), size(col("p")) - 3).as("ls"),
        slice(col("p"), lit(3), size(col("p")) - 3).as("rs"))
      .select(explode(arrays_zip(col("ls"), col("rs"))).as("pr"), col("freq"))
      .select(col("pr.ls").as("l"), col("pr.rs").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum("freq").as("cnt"))

  /** One merge applied to a seg column: literal leftmost non-overlapping
    * replace in the wrapped representation. */
  def mergeExpr(seg: Column, l: String, r: String): Column =
    call_function("replace", seg, lit(S + l + S2 + r + S), lit(S + l + r + S))

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge table
    * (merge_round, left_sym, right_sym, merged, pair_count) in learned
    * order — the artifact a tokenizer ships. Stops early when the best
    * remaining pair's corpus count falls below `minPairCount` (merging a
    * hapax pair memorizes noise, and sub-threshold argmax ties are the one
    * place float-free determinism wouldn't save us from corpus-order
    * sensitivity — so they are never merged). */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    var words = wordSegs(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    var i = 1
    while (i <= numMerges && !stop) {
      // one bounded row to the driver: the argmax pair under the total
      // order (cnt desc, l asc, r asc)
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) stop = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((i, l, r, top(0).getLong(2)))
        words = words
          .select(mergeExpr(col("seg"), l, r).as("seg"), col("freq"))
          .localCheckpoint()
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_round", "left_sym", "right_sym", "pair_count")
      .select(col("merge_round"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_count"))
  }

  /** Segment a word column with a learned merge list (in merge order) —
    * the APPLY half of the tokenizer: chars → wrapped seg → each merge as
    * one literal replace → pieces array. Row-local (no shuffle, no state);
    * the merge list nests one codegen'd `replace` per merge, so keep it to
    * the low hundreds — beyond that, segment in chunks. */
  def applyMerges(wordCol: Column, merges: Seq[(String, String)]): Column = {
    val seg0 = concat(lit(S2), regexp_replace(wordCol, "(.)", "$1" + S2))
    val segN = merges.foldLeft(seg0) { case (seg, (l, r)) => mergeExpr(seg, l, r) }
    val parts = split(segN, S2)
    slice(parts, lit(2), size(parts) - lit(2))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation decision operators: the domain-mixing report that drives
  * up/down-sampling weights, and the Gopher-style hard quality filter that
  * gates documents into a training set. Both compose the row-local signal
  * columns (TextAnalysis) into corpus-level decisions.
  *
  * Determinism contract (the oracle hash-compare): every ratio is a double
  * division of exact integers rounded to a micro-unit long; every rule
  * compares those integer micro-units against integer thresholds, so pass/
  * fail verdicts can never straddle an ulp between engines. */
object Curation {

  /** Per-domain corpus composition: document count, token mass, tokens per
    * document, and each domain's share of the corpus token mass — the input
    * to domain-mixing weight decisions (and `Chunking.stratifiedHashSample`
    * keep-rates).
    *
    * Scale shape: one groupBy shuffle over the corpus computes the per-domain
    * masses; the share is a window over the GROUPED result, which is
    * |domains|-sized — domains are curation strata (sources, languages,
    * crawls), inherently few, so the single-partition window is a handful of
    * rows regardless of corpus size. */
  def domainMixingReport(df: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val grouped = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("total_tokens"))
    grouped
      .withColumn("tokens_per_doc_e6",
        round(col("total_tokens").cast("double") / col("docs").cast("double") * 1e6)
          .cast("long"))
      .withColumn("share_e6",
        round(col("total_tokens").cast("double") /
          sum(col("total_tokens")).over(Window.partitionBy()).cast("double") * 1e6)
          .cast("long"))
  }

  /** Gopher-style hard quality gate: token-count band, mean-word-length
    * band, type-token-ratio floor, duplicate-bigram ceiling. Emits the
    * signal columns, the verdict, and the FIRST failing rule's name (fixed
    * evaluation order, '' when passed) — the form a curation pipeline logs
    * for filter-rate audits. Row-local, zero shuffle. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 20L, maxTokens: Long = 90L,
      minAvgTokenLenE6: Long = 3000000L, maxAvgTokenLenE6: Long = 8000000L,
      minTtrE6: Long = 300000L, maxDup2E6: Long = 200000L): DataFrame = {
    val c = col(textCol)
    def e6(x: Column): Column = round(x * lit(1e6)).cast("long")
    val rules: Seq[(String, Column)] = Seq(
      "token_count" -> col("n_tokens").between(minTokens, maxTokens),
      "avg_token_len" -> col("avg_token_len_e6")
        .between(minAvgTokenLenE6, maxAvgTokenLenE6),
      "ttr" -> (col("ttr_e6") >= minTtrE6),
      "dup_2gram" -> (col("dup_2gram_frac_e6") <= maxDup2E6))
    df.select(col(idCol),
        TextAnalysis.tokenCount(c).cast("long").as("n_tokens"),
        e6(TextAnalysis.typeTokenRatio(c)).as("ttr_e6"),
        e6(TextAnalysis.avgTokenLength(c)).as("avg_token_len_e6"),
        call_function("dup_gram_frac_e6", c, lit(2)).as("dup_2gram_frac_e6"))
      .withColumn("passed", rules.map(_._2).reduce(_ && _))
      .withColumn("fail_reason",
        rules.foldRight(lit(""): Column) { case ((name, ok), acc) =>
          when(!ok, lit(name)).otherwise(acc)
        })
  }
}

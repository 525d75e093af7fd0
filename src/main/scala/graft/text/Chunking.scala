package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators downstream of cleaning/dedup in a
  * training-data pipeline: overlapping chunking, deterministic sampling,
  * and greedy sequence packing.
  *
  * Scale notes: chunking is a row-local transform + explode (output rows ∝
  * tokens/stride — no shuffle); hash sampling is a row-local predicate that
  * pushes into the scan's filter stage and needs no global state (unlike
  * reservoir/random sampling, it is reproducible and partition-order-
  * independent); packing's only shuffle is the window sort on the pack key —
  * at 100 TB, pack within natural partitions (e.g. per shard) so the window
  * never globally sorts the corpus.
  */
object Chunking {

  /** Overlapping token-window chunks: starts at 1, 1+stride, … where
    * stride = chunkSize − overlap; the final partial chunk is kept. Output:
    * one row per chunk with chunk_idx, chunk_text, n_chunk_tokens. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("_toks"))
      .select(col(idCol),
        explode(sequence(lit(1), size(col("_toks")), lit(stride))).as("_s"),
        col("_toks"))
      .select(
        col(idCol),
        ((col("_s") - 1) / lit(stride)).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_toks"), col("_s"), lit(chunkSize)))
          .as("chunk_text"),
        least(size(col("_toks")) - col("_s") + 1, lit(chunkSize))
          .cast("long").as("n_chunk_tokens"))
  }

  /** Deterministic hash sampling: keep a row iff
    * md5(key) mod 100 < ratePct. Reproducible across runs, engines, and
    * partitionings — the property random/reservoir sampling lacks — and a
    * plain pushable predicate. */
  def hashSample(keyCol: Column, ratePct: Int): Column =
    (conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long")
      % lit(100L)) < lit(ratePct.toLong)

  /** Greedy sequence packing: assign docs (ordered by `orderCol`) to
    * fixed-budget bins by cumulative token count — bin = ⌊(cumsum −
    * n_tokens)/binSize⌋, i.e. a doc starts a new bin when the budget before
    * it is exhausted. Exact integer math; one window shuffle. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      binSize: Int): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), n.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // `div`, not `/`: Spark's / on longs is DOUBLE division, which loses
      // exactness at large cumulative counts; div is exact integer floor.
      .withColumn("bin",
        expr(s"(cum_tokens - n_tokens) div ${binSize.toLong}"))
  }

  /** Per-bin packing summary (docs per bin, token fill). */
  def packingSummary(packed: DataFrame, binSize: Int): DataFrame =
    packed.groupBy("bin")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn("fill_e6",
        round(col("total_tokens").cast("double") / lit(binSize.toDouble) * 1e6)
          .cast("long"))
}

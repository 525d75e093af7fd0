package graft.streaming

import graft.config.SilverSpec
import graft.silver.Transform
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference is strictly batch (SURVEY
  * §1.6 — kafka is only an enum value; its "incremental" gold refresh is
  * micro-batch MERGE), so this module is capability beyond parity: the same
  * silver semantics applied continuously, plus the two streaming primitives
  * a training-data pipeline needs — watermarked windowed aggregation and
  * keyed running state.
  *
  * Scale notes: the file source lists+processes only NEW files per
  * micro-batch (no re-scan of history); dedup state and window state are
  * bounded by the watermark — without it, streaming dropDuplicates state
  * grows forever at 100 TB/day. State stores shuffle by key exactly like
  * their batch analogues.
  */
object Streaming {

  /** Continuous bronze→silver: files arriving under `inputDir` flow through
    * the SAME config-driven transform chain as the batch job; dedupe becomes
    * stateful `dropDuplicates` on the spec's keys (order-by tie-breaking is
    * meaningless on an infinite stream — first-seen wins, documented). */
  def silverStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      spec: SilverSpec,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(inputDir)
    val chained = Transform.filter(spec.filters)(
      Transform.derive(spec.derived)(
        Transform.cast(spec.casts)(
          Transform.rename(spec.renames)(src))))
    val deduped = spec.dedupe.filter(_.keys.nonEmpty)
      .fold(chained)(d => chained.dropDuplicates(d.keys))
    deduped.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Continuous corpus curation — the config-driven curation stage applied
    * to a document stream. The quality gate and the domain-mixing hash
    * sample are pure row-local deterministic predicates, so they stream
    * unchanged; exact dedup becomes stateful `dropDuplicates` on the
    * content fingerprint (first-seen wins, like the keyed silver dedupe —
    * state is bounded by the watermark when the caller sets one upstream
    * of this schema's event-time column, otherwise it grows with distinct
    * content, the same contract as silverStream). WITHIN-STREAM near-dup
    * strategies need corpus-wide pair joins and belong to the batch stage
    * by construction: configuring one here without a historical corpus
    * fails loudly rather than silently degrading. */
  /** @param corpus optional HISTORICAL corpus. With `exact` dedup, arriving
    *               docs whose content fingerprint already exists there are
    *               dropped via the Bloom prefilter + verifying stream-static
    *               anti-join (`Dedup.dedupeAgainstCorpus` — the sketch is
    *               built once at query start and rides the plan;
    *               result-exact, the bloom only prunes the join). With
    *               `minhash_lsh` dedup, arrivals that are NEAR-dups of any
    *               corpus doc are dropped (`Dedup.fuzzyDedupeAgainstCorpus`)
    *               — that path's candidate aggregation can't ride a
    *               streaming plan, so each micro-batch runs the batch
    *               operator inside foreachBatch against the static corpus;
    *               within-stream dups remain exact-fingerprint (stateful
    *               dropDuplicates), the only within-stream dedup an
    *               unbounded stream admits. */
  def curationStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      spec: graft.config.CurationSpec,
      outDir: String,
      checkpointDir: String,
      corpus: Option[org.apache.spark.sql.DataFrame] = None): StreamingQuery = {
    spec.dedup.foreach(d => require(d.strategy == "exact" ||
      (d.strategy == "minhash_lsh" && corpus.isDefined),
      s"streaming curation supports exact dedup, or minhash_lsh against a " +
        s"historical corpus (got '${d.strategy}'" +
        s"${if (corpus.isEmpty) " with no corpus" else ""}); other " +
        "near-dup strategies need corpus-wide pair joins - run the batch stage"))
    require(corpus.isEmpty || spec.dedup.isDefined,
      "corpus dedup needs curation.dedup (its content_column names the text)")
    require(spec.budget.isEmpty,
      "curation.budget is batch-only: the greedy best-first cut needs a " +
        "total order over the corpus, which an unbounded stream cannot have")
    require(spec.mixing.forall(_.temperature.isEmpty),
      "curation.mixing.temperature is batch-only: deriving rates needs a " +
        "corpus-wide domain count an unbounded stream cannot host — " +
        "configure explicit rates for streaming, or derive them in batch " +
        "with Curation.temperatureSampleRates and paste the percentages")
    val src = spark.readStream.schema(schema).parquet(inputDir)
    // language filter and gate are row-local predicates — they stream
    // unchanged, in the same order as the batch stage
    val inLang = spec.language.fold(src)(l =>
      graft.text.Curation.applyLanguageFilter(src, l))
    val ruleGated = spec.gate.fold(inLang)(g =>
      graft.text.Curation.applyGate(inLang, g))
    // the learned quality model is a row-local token fold against a map
    // literal — it streams unchanged, in the same gate → model order as
    // the batch stage (score_e6/prob_e6 audit columns ride to the sink)
    val gatedOnly = spec.model.fold(ruleGated)(m =>
      graft.text.Curation.applyQualityModel(ruleGated, m))
    // PII scrub is row-local regex — it streams unchanged, in the same
    // gate → model → scrub → dedup order as the batch stage
    val gated =
      if (spec.pii.isEmpty) gatedOnly
      else graft.text.Curation.redactPii(gatedOnly, spec.pii)
    val fuzzy = spec.dedup.filter(_.strategy == "minhash_lsh")
    val historical = (corpus, spec.dedup) match {
      case (Some(c), Some(d)) if d.strategy == "exact" =>
        graft.dedup.Dedup.dedupeAgainstCorpus(gated, c, d.idColumn,
          d.contentColumn, expectedItems = math.max(100L, c.count()))
      case _ => gated
    }
    val deduped = spec.dedup.fold(historical) { d =>
      historical.withColumn("_fp",
          graft.text.TextAnalysis.fingerprint(col(d.contentColumn)))
        .dropDuplicates("_fp")
        .drop("_fp")
    }
    val mixed = spec.mixing.fold(deduped)(m =>
      graft.text.Curation.applyMixing(deduped, m))
    // ONE sink layout for every dedup strategy: each micro-batch lands in
    // its own `batch_id` partition with DYNAMIC overwrite. foreachBatch is
    // at-least-once — a crash between a successful write and the checkpoint
    // commit replays the batch, and the retry then rewrites exactly its own
    // partition, so the sink is idempotent without a _spark_metadata log.
    // Readers get the SAME schema and commit semantics regardless of the
    // configured strategy (before round 9 the exact path used the file sink
    // with no batch_id while the fuzzy path partitioned — a per-config read
    // contract). `batch_id` has no underscore prefix: `_`-led paths are
    // hidden from Spark's file listing.
    // Upgrade guard: before the unified batch_id layout, the non-fuzzy path
    // used Spark's file sink, which leaves a _spark_metadata transaction log
    // in outDir. Batch readers of a dir holding that log list ONLY the files
    // it records — every new foreachBatch file would be silently invisible.
    // Refuse loudly instead of writing unreadable output; remediation is a
    // fresh outDir (or removing the stale log, after which readers also see
    // the new batch_id partition column in the schema).
    val legacyLog = new org.apache.hadoop.fs.Path(outDir, "_spark_metadata")
    val fsOut = legacyLog.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fsOut.exists(legacyLog),
      s"$outDir carries a _spark_metadata log from the legacy file-sink " +
        "layout; batch readers would ignore all new batch_id-partitioned " +
        "output written beside it. Use a fresh outDir, or delete the stale " +
        "_spark_metadata log (readers then gain a batch_id partition column).")
    def sinkBatch(frame: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      frame.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outDir)
    val writer = fuzzy match {
      case None =>
        mixed.writeStream
          .option("checkpointLocation", checkpointDir)
          .outputMode(OutputMode.Append())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             batchId: Long) => sinkBatch(batch.toDF(), batchId)
          }
      case Some(d) =>
        // The historical corpus is STATIC for the life of the query: build
        // its band buckets + verification sets ONCE, materialize them to
        // DURABLE storage under the checkpoint dir, and re-read — each
        // micro-batch then signs only its own arrivals instead of
        // re-scanning the corpus text twice per batch
        // (Dedup.corpusFuzzyState doc). NOT localCheckpoint: its blocks
        // live only in executor memory/disk with lineage truncated, so one
        // executor loss (dynamic allocation, preemption) would permanently
        // fail every subsequent micro-batch of an unbounded query. The
        // checkpoint dir is already required durable storage for the
        // query's own state, so the corpus state inherits that guarantee
        // and survives any executor topology change.
        val stateDir = s"$checkpointDir/graft_corpus_state"
        val (cb, cs) = graft.dedup.Dedup.corpusFuzzyState(corpus.get,
          d.idColumn, d.contentColumn, shingleN = d.ngram,
          numHashes = d.numHashes, numBands = d.numBands)
        cb.write.mode("overwrite").parquet(s"$stateDir/buckets")
        cs.write.mode("overwrite").parquet(s"$stateDir/sets")
        val corpusBuckets = spark.read.parquet(s"$stateDir/buckets")
        val corpusSets = spark.read.parquet(s"$stateDir/sets")
        mixed.writeStream
          .option("checkpointLocation", checkpointDir)
          .outputMode(OutputMode.Append())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             batchId: Long) =>
              sinkBatch(graft.dedup.Dedup.fuzzyDedupePrepared(batch.toDF(),
                corpusBuckets, corpusSets, d.idColumn, d.contentColumn,
                shingleN = d.ngram, threshold = d.threshold,
                numHashes = d.numHashes, numBands = d.numBands), batchId)
          }
    }
    writer.start()
  }

  /** Continuous distribution-drift monitor: every micro-batch of the value
    * stream is histogrammed against a STATIC baseline snapshot
    * (`Anomaly.histogramDrift` — fixed bins, integer micro-unit shares and
    * deltas) and each batch's report lands in its own `batch_id` partition
    * with dynamic overwrite, so an at-least-once replay rewrites rather
    * than duplicates (same idempotency shape as the fuzzy curation sink).
    * This is the per-ingest-batch shift alarm: alerting reads the newest
    * partition and thresholds `delta_e6`. */
  /** CONTINUOUS frequent-items tracking: each micro-batch reduces to its
    * own per-group `approx_top_k_accumulate` state rows, landed in a
    * `batch_id` partition with dynamic overwrite (the driftStream
    * idempotency shape — an at-least-once replay rewrites its partition
    * rather than double-counting, which a read-merge-write running state
    * would). Reports merge ALL batch states with
    * `Sketches.mergeTopKSketches` at read time — history is touched in
    * sketch space only (|batches|·|groups| few-KB rows), never row data,
    * and merge ≡ one-shot exactly while the tracked map never fills
    * (SketchesSpec). The streaming complement of the batch
    * frequencyAudit. */
  def topKStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      groupCols: Seq[String],
      itemCol: String,
      outDir: String,
      checkpointDir: String,
      maxItemsTracked: Int = 10000): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          graft.quality.Sketches
            .topKSketches(batch.toDF(), groupCols, itemCol, maxItemsTracked)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          ()
      }
      .start()

  /** Read side of [[topKStream]]: merge every persisted batch state down
    * to one sketch per group. */
  def mergedTopK(spark: SparkSession, stateDir: String,
      groupCols: Seq[String],
      maxItemsTracked: Int = 10000): org.apache.spark.sql.DataFrame =
    graft.quality.Sketches.mergeTopKSketches(
      spark.read.parquet(stateDir), groupCols,
      maxItemsTracked = maxItemsTracked)

  /** CONTINUOUS histogram-quantile tracking: each micro-batch reduces to
    * its own per-(group, bin) count rows (`Sketches.histogramState` — an
    * algebraic mart, so merge is a plain count sum), landed in a
    * `batch_id` partition with dynamic overwrite (the topKStream
    * idempotency shape: an at-least-once replay rewrites its partition
    * rather than double-counting). [[mergedHistogramQuantiles]] reads
    * p50/p90-class quantiles from ALL batch states — history is touched
    * in (group × bin) space only, never row data, and merge ≡ one-shot
    * EXACTLY (counts are exact; only the estimate is quantized to
    * binWidth). The streaming complement of the q239 batch mart. */
  def histogramStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      groupCols: Seq[String],
      valueCol: String,
      binWidth: Long,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    sketchStateStream(spark, inputDir, schema, outDir, checkpointDir) {
      batch =>
        withStateContract(
          graft.quality.Sketches
            .histogramState(batch, groupCols, valueCol, binWidth),
          "bin", "group_cols" -> groupCols.mkString(","),
          "value_col" -> valueCol, "bin_width" -> binWidth.toString)
    }

  /** CONTINUOUS distinct-count tracking from KMV sketches: each
    * micro-batch reduces to ≤ k longs per group (`Kmv.sketches` — the
    * replayable md5 bottom-k), landed in a `batch_id` partition with
    * dynamic overwrite (the [[histogramStream]] idempotency shape: an
    * at-least-once replay rewrites its partition instead of skewing the
    * estimate — and KMV merge is idempotent anyway, a re-offered hash
    * changes nothing). [[mergedKmvEstimates]] folds ALL batch sketches;
    * because bottom-k of a union of bottom-ks IS the union's bottom-k,
    * merged ≡ one-shot over the full history EXACTLY — history is
    * touched in (group × k) space only, never row data. The streaming
    * complement of the q252 batch fold. */
  def kmvStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      groupCols: Seq[String],
      itemCol: String,
      k: Int,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    sketchStateStream(spark, inputDir, schema, outDir, checkpointDir) {
      batch =>
        withStateContract(
          // the batch distinct gate's aggregate posture (NO null
          // pre-filter — `kmv_sketch` skips null hashes itself): a
          // group whose items are all NULL writes an EMPTY-sketch row
          // instead of vanishing from state, so est 0 flows through
          // the fold and a min_count gate fires on cardinality
          // collapse ≡ batch, with no carve-out. (Kmv.sketches
          // null-filters for the REPORT surfaces; state must not.)
          batch.groupBy(groupCols.map(col): _*)
            .agg(call_function("kmv_sketch",
              graft.quality.Kmv.hash60(col(itemCol)), lit(k)).as("kmv")),
          "kmv", "group_cols" -> groupCols.mkString(","),
          "item_col" -> itemCol, "k" -> k.toString)
    }

  /** Shared per-micro-batch sketch-state writer: reduce the batch with
    * `build`, stamp `batch_id`, land it as a dynamically-overwritten
    * batch_id partition — ONE copy of the idempotency scaffolding so an
    * overwrite/checkpoint fix can't land in one sketch stream and miss
    * its twins. */
  private def sketchStateStream(
      spark: SparkSession, inputDir: String, schema: StructType,
      outDir: String, checkpointDir: String)(
      build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          build(batch.toDF())
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          ()
      }
      .start()

  /** Stamp the column contract a sketch stream was built with onto its
    * sketch column as schema metadata (parquet round-trips Spark field
    * metadata via the schema footer), so the declarative merged gates
    * can VERIFY a spec against what the state actually sketched instead
    * of trusting the caller to pair spec and state correctly. */
  private def withStateContract(df: org.apache.spark.sql.DataFrame,
      sketchCol: String,
      contract: (String, String)*): org.apache.spark.sql.DataFrame = {
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
    contract.foreach { case (key, v) => mb.putString(key, v) }
    df.withColumn(sketchCol, col(sketchCol).as(sketchCol, mb.build()))
  }

  /** Read a gate's state dir ONCE and verify the spec against the
    * stream's recorded contract: a gate evaluating a spec the state was
    * not sketched for (wrong item/value/mass column, wrong k, wrong
    * grouping) must raise, not silently gate the wrong statistic — and
    * state with NO recorded contract (hand-assembled, or written before
    * the contract stamp) raises too, because an unverifiable declarative
    * gate is exactly the divergence the config exists to prevent. */
  private def verifiedState(spark: SparkSession, stateDir: String,
      gate: String, sketchCol: String,
      expected: (String, String)*): org.apache.spark.sql.DataFrame = {
    val state = spark.read.parquet(stateDir)
    val meta = state.schema(sketchCol).metadata
    expected.foreach { case (key, want) =>
      val got =
        if (meta.contains(key)) Some(meta.getString(key)) else None
      if (!got.contains(want))
        throw new IllegalArgumentException(
          s"streaming $gate: the spec needs state sketched with " +
            s"$key='$want' but the state at $stateDir records " +
            got.fold("no contract for it")(g => s"$key='$g'") +
            " - point the gate at state from a sketch stream written " +
            "with matching columns (kmvStream / kmvValuesStream / " +
            "kmvWeightedValuesStream / histogramStream stamp the " +
            "contract they sketched), or run the gate in the batch " +
            "Orchestrator")
    }
    state
  }

  /** Fold every persisted [[kmvStream]] batch sketch down to one sketch
    * per group (merge = re-offer, the exact KMV fold) — the shared read
    * side under the estimate/overlap/containment/churn dashboards.
    * Sketch-state-sized work: batches × groups × ≤ k longs in, groups
    * × ≤ k longs out; history rows are never touched. */
  def foldedKmvSketches(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    foldedKmvSketches(spark.read.parquet(stateDir), groupCols, k)

  /** [[foldedKmvSketches]] over an already-loaded state frame — the
    * verified-gate entry point (one read serves both the contract check
    * and the fold). explode_OUTER, not explode: an all-null group's
    * state row carries an EMPTY sketch, and a plain explode would drop
    * the group right here — the outer row's null hash is skipped by
    * `kmv_sketch`, so the group folds back to an empty sketch (est 0)
    * the way the batch gate sees it. */
  def foldedKmvSketches(state: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    state
      .select(groupCols.map(col) :+
        explode_outer(col("kmv")).as("__hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("kmv_sketch", col("__hv"), lit(k)).as("kmv"))

  /** Read side of [[kmvStream]]: fold the batch sketches and read the
    * estimate. */
  def mergedKmvEstimates(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    foldedKmvSketches(spark, stateDir, groupCols, k)
      .withColumn("est_kmv", graft.quality.Kmv.estimate(col("kmv"), k))

  /** CONTINUOUS pairwise-overlap dashboard off [[kmvStream]] state: fold
    * per type, then the theta overlap (jaccard / est_inter /
    * est_only_*) over every type pair — the q251 duplicated-audience /
    * contaminated-split report updating per micro-batch. Fold exactness
    * makes this ≡ the batch `Kmv.overlapReport` over every row ever
    * streamed (the histogramStream merged-≡-one-shot posture). */
  def mergedKmvOverlap(spark: SparkSession, stateDir: String,
      typeCol: String, k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.overlapFromSketches(
      foldedKmvSketches(spark, stateDir, Seq(typeCol), k), typeCol, k)

  /** CONTINUOUS decontamination dashboard between TWO [[kmvStream]]
    * states (e.g. an eval stream keyed by suite and a training stream
    * keyed by domain): fold each side, then the directional-containment
    * report — ≡ the batch `Kmv.containmentReport` over both full
    * histories. */
  def mergedKmvContainment(spark: SparkSession, stateDirA: String,
      typeColA: String, stateDirB: String, typeColB: String,
      k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.containmentFromSketches(
      foldedKmvSketches(spark, stateDirA, Seq(typeColA), k), typeColA,
      foldedKmvSketches(spark, stateDirB, Seq(typeColB), k), typeColB, k)

  /** CONTINUOUS day-over-day churn (q263) off a [[kmvStream]] keyed by
    * an integral epoch-day column: fold per day, then the consecutive
    * (d, d+1) retained/churned/new decomposition — ≡ the batch
    * `Kmv.consecutiveOverlap` over the full history. */
  def mergedKmvChurn(spark: SparkSession, stateDir: String,
      dayCol: String, k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.consecutiveOverlapFromSketches(
      foldedKmvSketches(spark, stateDir, Seq(dayCol), k), dayCol, k)

  /** CONTINUOUS value-sample tracking — the [[kmvStream]] shape for the
    * kmv_values quantile substrate: each micro-batch reduces to ≤ k
    * (hash, value) pairs per group (`Kmv.valueSketches`), landed in a
    * `batch_id` partition with dynamic overwrite (same idempotency
    * posture: re-offering a (hash, value) pair changes nothing). The
    * read sides fold batch samples exactly (bottom-k-by-hash of a union
    * of bottom-ks IS the union's bottom-k, min-v rule re-applied), so
    * merged quantiles / KS ≡ their batch twins over all rows ever
    * streamed. */
  def kmvValuesStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    sketchStateStream(spark, inputDir, schema, outDir, checkpointDir) {
      batch =>
        withStateContract(
          graft.quality.Kmv
            .valueSketches(batch, groupCols, idCol, valueCol, k),
          "kmvv", "group_cols" -> groupCols.mkString(","),
          "id_col" -> idCol, "value_col" -> valueCol, "k" -> k.toString)
    }

  /** Fold every persisted [[kmvValuesStream]] batch sample down to one
    * ≤ k-pair sample per group — the shared read side under the
    * streaming quantile/KS dashboards (batches × groups × ≤ k pairs in,
    * groups × ≤ k pairs out). */
  def foldedKmvValueSketches(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    foldedKmvValueSketches(spark.read.parquet(stateDir), groupCols, k)

  /** [[foldedKmvValueSketches]] over an already-loaded state frame. */
  def foldedKmvValueSketches(state: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    state
      .select(groupCols.map(col) :+ explode(col("kmvv")).as("__p"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("kmv_values", col("__p.h"), col("__p.v"),
        lit(k)).as("kmvv"))

  /** CONTINUOUS replayable quantiles off [[kmvValuesStream]] state —
    * ≡ the batch `Kmv.quantileReport` over every row ever streamed. */
  def mergedKmvQuantiles(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int,
      qE6s: Seq[Long]): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.quantilesFromValueSketches(
      foldedKmvValueSketches(spark, stateDir, groupCols, k), groupCols,
      qE6s)

  /** CONTINUOUS pairwise KS drift off [[kmvValuesStream]] state — ≡ the
    * batch `Kmv.sampleKsReport` over every row ever streamed. */
  def mergedKmvKs(spark: SparkSession, stateDir: String,
      typeCol: String, k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.sampleKsFromSketches(
      foldedKmvValueSketches(spark, stateDir, Seq(typeCol), k), typeCol)

  /** CONTINUOUS MASS-weighted value-sample tracking — [[kmvValuesStream]]
    * with each sampled row's mass carried alongside its value
    * (`Kmv.weightedValueSketches` per micro-batch): state rows hold ≤ k
    * ascending-by-hash (h, v, m) structs per group. Same idempotency
    * posture (id determines value AND mass, so a re-offered id changes
    * nothing), and the weighted read sides below fold exactly, so the
    * merged weighted KS / quantiles ≡ their batch twins. */
  def kmvWeightedValuesStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      massCol: String,
      k: Int,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    sketchStateStream(spark, inputDir, schema, outDir, checkpointDir) {
      batch =>
        withStateContract(
          graft.quality.Kmv.weightedValueSketches(batch, groupCols,
            idCol, valueCol, massCol, k),
          "kmvv", "group_cols" -> groupCols.mkString(","),
          "id_col" -> idCol, "value_col" -> valueCol,
          "mass_col" -> massCol, "k" -> k.toString)
    }

  /** Fold persisted [[kmvWeightedValuesStream]] batch samples down to one
    * ≤ k-triple sample per group — `Kmv.weightedSketchesFromHashStream`
    * (the exact tail batch `weightedValueSketches` runs) replayed over
    * the already-hashed state. Fold ≡ rebuild because bottom-k of a
    * union of bottom-ks IS the union's bottom-k and id determines
    * (v, m) — min of identical values is idempotent. */
  def foldedKmvWeightedValueSketches(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    foldedKmvWeightedValueSketches(spark.read.parquet(stateDir),
      groupCols, k)

  /** [[foldedKmvWeightedValueSketches]] over an already-loaded state
    * frame. */
  def foldedKmvWeightedValueSketches(state: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.weightedSketchesFromHashStream(
      state.select(groupCols.map(col) :+
        explode(col("kmvv")).as("__p"): _*),
      groupCols, col("__p.h"), col("__p.v"), col("__p.m"), k)

  /** CONTINUOUS mass-weighted KS drift off [[kmvWeightedValuesStream]]
    * state — ≡ the batch `Kmv.weightedSampleKsReport` over every row
    * ever streamed (wks_e6 with the unweighted ks_e6 alongside). */
  def mergedKmvWeightedKs(spark: SparkSession, stateDir: String,
      typeCol: String, k: Int): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.weightedKsFromSketches(
      foldedKmvWeightedValueSketches(spark, stateDir, Seq(typeCol), k),
      typeCol)

  /** CONTINUOUS mass-weighted quantiles off [[kmvWeightedValuesStream]]
    * state — ≡ the batch `Kmv.weightedQuantileReport` over every row
    * ever streamed. */
  def mergedKmvWeightedQuantiles(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], k: Int,
      qE6s: Seq[Long]): org.apache.spark.sql.DataFrame =
    graft.quality.Kmv.weightedQuantilesFromSketches(
      foldedKmvWeightedValueSketches(spark, stateDir, groupCols, k),
      groupCols, qE6s)

  // ---- config-driven CONTINUOUS quality gates ------------------------
  // The declarative ks_checks / growth_checks / containment_checks specs
  // the batch Orchestrator runs, evaluated over folded stream state —
  // the same YAML block alarms a continuous pipeline. Row filters and
  // id/value/item columns are consumed at stream-WRITE time (the
  // kmvStream/kmvValuesStream arguments must match the spec); fold
  // exactness then makes every failedCount ≡ its batch twin over every
  // row ever streamed.

  /** `ks_checks` over value-sketch stream state: failedCount = type
    * pairs whose merged-sample KS exceeds the spec's cap. An unweighted
    * spec folds [[kmvValuesStream]] (or weighted — a weighted stream's
    * (h, v) projection serves both forms) state and gates `ks_e6`; a
    * weighted spec (mass_column set) requires
    * [[kmvWeightedValuesStream]] state sketched with THAT mass column
    * and gates `wks_e6` (the batch Orchestrator's weighted behavior).
    * Every spec column and k is verified against the contract the
    * stream stamped on the state — a weighted spec over unweighted
    * state, or any id/value/mass/k mismatch, raises loudly instead of
    * silently gating a statistic the config never asked for. */
  def mergedKsCheck(spark: SparkSession, stateDir: String,
      kc: graft.config.KsCheck): graft.quality.Checks.CheckResult =
    kc.massColumn match {
      case None =>
        val state = verifiedState(spark, stateDir, "ks_check", "kmvv",
          "group_cols" -> kc.typeColumn, "id_col" -> kc.idColumn,
          "value_col" -> kc.valueColumn, "k" -> kc.k.toString)
        graft.quality.Checks.CheckResult("ks_check",
          s"${kc.typeColumn}/${kc.valueColumn}@k${kc.k} (streamed)",
          graft.quality.Kmv.sampleKsFromSketches(
            foldedKmvValueSketches(state, Seq(kc.typeColumn), kc.k),
            kc.typeColumn)
            .filter(col("ks_e6") > kc.maxKsE6).count())
      case Some(mass) =>
        val state = verifiedState(spark, stateDir, "ks_check", "kmvv",
          "group_cols" -> kc.typeColumn, "id_col" -> kc.idColumn,
          "value_col" -> kc.valueColumn, "mass_col" -> mass,
          "k" -> kc.k.toString)
        graft.quality.Checks.CheckResult("ks_check",
          s"${kc.typeColumn}/${kc.valueColumn}*$mass@k${kc.k} (streamed)",
          graft.quality.Kmv.weightedKsFromSketches(
            foldedKmvWeightedValueSketches(state, Seq(kc.typeColumn),
              kc.k), kc.typeColumn)
            .filter(col("wks_e6") > kc.maxKsE6).count())
    }

  /** `growth_checks` over [[kmvStream]] state keyed by the integral
    * epoch-day column: the cumulative curve re-aggregates from per-day
    * folded sketches, then the shared Orchestrator lattice math (silent
    * days densified, span cap, warmup) decides failures. */
  def mergedGrowthCheck(spark: SparkSession, stateDir: String,
      gc: graft.config.GrowthCheck): graft.quality.Checks.CheckResult = {
    val label =
      s"growth(${gc.itemColumn})@k${gc.k} by ${gc.dayColumn} (streamed)"
    val state = verifiedState(spark, stateDir, "growth_check", "kmv",
      "group_cols" -> gc.dayColumn, "item_col" -> gc.itemColumn,
      "k" -> gc.k.toString)
    val cum = graft.quality.Kmv.rollingFromDailySketches(
      foldedKmvSketches(state, Seq(gc.dayColumn), gc.k),
      Nil, gc.dayColumn, gc.k, windowDays = 0)
    graft.quality.Checks.CheckResult("growth_check", label,
      graft.quality.Orchestrator.growthFailuresFromCurve(
        cum, gc.dayColumn, gc, label))
  }

  /** `containment_checks` between two [[kmvStream]] states (eval state
    * in training state): failedCount = (A-group × B-group) pairs whose
    * estimated |A∩B|/|A| exceeds the cap. Self pairs are tautological
    * ONLY when the two sides are the same set, which in stream space
    * means the SAME state directory under the same key column (the
    * spec's aFilter/bFilter were applied before the stream was written
    * and are ignored here). */
  def mergedContainmentCheck(spark: SparkSession, stateDirA: String,
      stateDirB: String,
      cc: graft.config.ContainmentCheck): graft.quality.Checks.CheckResult = {
    val stateA = verifiedState(spark, stateDirA, "containment_check",
      "kmv", "group_cols" -> cc.aTypeColumn,
      "item_col" -> cc.itemColumn, "k" -> cc.k.toString)
    val stateB = verifiedState(spark, stateDirB, "containment_check",
      "kmv", "group_cols" -> cc.bTypeColumn,
      "item_col" -> cc.itemColumn, "k" -> cc.k.toString)
    val rep = graft.quality.Kmv.containmentFromSketches(
      foldedKmvSketches(stateA, Seq(cc.aTypeColumn), cc.k),
      cc.aTypeColumn,
      foldedKmvSketches(stateB, Seq(cc.bTypeColumn), cc.k),
      cc.bTypeColumn, cc.k)
    // "same set" compares NORMALIZED paths — "/s/." and "/s" are the
    // same state, and a cosmetic path difference re-admitting
    // always-100%-contained self pairs would fail the gate
    // unconditionally (the containment filter-text lesson, batch side)
    def norm(p: String): String =
      java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    val pairs =
      if (cc.aTypeColumn == cc.bTypeColumn &&
        norm(stateDirA) == norm(stateDirB))
        rep.filter(col("type_a") =!= col("type_b"))
      else rep
    graft.quality.Checks.CheckResult("containment_check",
      s"${cc.aTypeColumn} in ${cc.bTypeColumn}/${cc.itemColumn}" +
        s"@k${cc.k} (streamed)",
      pairs.filter(col("cont_a_in_b_e6") > cc.maxContainmentE6).count())
  }

  /** `quantile_checks` over [[histogramStream]] state: failedCount =
    * groups whose merged q-quantile BIN lower edge falls outside
    * [min_value, max_value] — ≡ the batch gate over every row ever
    * streamed (bin counts sum exactly, so the merged histogram IS the
    * one-shot histogram). The spec's grouping/value/bin_width are
    * verified against the stamped contract. Empty group_by = a stream
    * written with no group columns (one global histogram). */
  def mergedQuantileCheck(spark: SparkSession, stateDir: String,
      qc: graft.config.QuantileCheck): graft.quality.Checks.CheckResult = {
    val label = s"${qc.valueColumn}@q${qc.qE6}" +
      (if (qc.groupBy.nonEmpty) s" by ${qc.groupBy.mkString(",")}"
      else "") + " (streamed)"
    require(qc.minValue.nonEmpty || qc.maxValue.nonEmpty,
      s"quantile_check $label: needs min_value and/or max_value")
    val state = verifiedState(spark, stateDir, "quantile_check", "bin",
      "group_cols" -> qc.groupBy.mkString(","),
      "value_col" -> qc.valueColumn, "bin_width" -> qc.binWidth.toString)
    val qs = graft.quality.Sketches.histogramQuantiles(
      foldedHistogramState(state, qc.groupBy), qc.groupBy, qc.binWidth,
      Seq(qc.qE6))
    val violating =
      qc.minValue.map(lo => col("bin_lo") < lo) ++
        qc.maxValue.map(hi => col("bin_lo") > hi)
    graft.quality.Checks.CheckResult("quantile_check", label,
      qs.filter(violating.reduce(_ || _)).count())
  }

  /** `distinct_checks` over [[kmvStream]] state: failedCount = groups
    * whose folded KMV distinct estimate falls outside
    * [min_count, max_count] — ≡ the batch gate over every row ever
    * streamed, with the same no-groups honesty (an EMPTY state under a
    * min_count bound counts one failure, never a vacuous pass) AND the
    * same all-null honesty: the stream writes a group whose items are
    * all NULL as an empty-sketch row (no null pre-filter, the batch
    * gate's aggregate posture) and the outer fold keeps it, so est 0
    * fires a min_count bound exactly like the batch cardinality-
    * collapse alarm. */
  def mergedDistinctCheck(spark: SparkSession, stateDir: String,
      dc: graft.config.DistinctCheck): graft.quality.Checks.CheckResult = {
    val label = s"distinct(${dc.itemColumn})@k${dc.k}" +
      (if (dc.groupBy.nonEmpty) s" by ${dc.groupBy.mkString(",")}"
      else "") + " (streamed)"
    require(dc.minCount.nonEmpty || dc.maxCount.nonEmpty,
      s"distinct_check $label: needs min_count and/or max_count")
    val state = verifiedState(spark, stateDir, "distinct_check", "kmv",
      "group_cols" -> dc.groupBy.mkString(","),
      "item_col" -> dc.itemColumn, "k" -> dc.k.toString)
    val est = foldedKmvSketches(state, dc.groupBy, dc.k)
      .select(graft.quality.Kmv.estimate(col("kmv"), dc.k).as("__est"))
    val violating =
      dc.minCount.map(lo => col("__est") < lo) ++
        dc.maxCount.map(hi => col("__est") > hi)
    val row = est.agg(
      count(lit(1)).as("__n"),
      sum(when(violating.reduce(_ || _), 1L).otherwise(0L)).as("__bad"))
      .head()
    val failed =
      if (row.getLong(0) == 0L && dc.minCount.nonEmpty) 1L
      else if (row.isNullAt(1)) 0L
      else row.getLong(1)
    graft.quality.Checks.CheckResult("distinct_check", label, failed)
  }

  /** `overlap_checks` over [[kmvStream]] state keyed by the type
    * column: failedCount = type pairs whose folded-sketch Jaccard
    * exceeds the cap — ≡ the batch gate over every row ever streamed
    * (the duplicated-audience alarm, continuous). */
  def mergedOverlapCheck(spark: SparkSession, stateDir: String,
      oc: graft.config.OverlapCheck): graft.quality.Checks.CheckResult = {
    val state = verifiedState(spark, stateDir, "overlap_check", "kmv",
      "group_cols" -> oc.typeColumn, "item_col" -> oc.itemColumn,
      "k" -> oc.k.toString)
    graft.quality.Checks.CheckResult("overlap_check",
      s"${oc.typeColumn}/${oc.itemColumn}@k${oc.k} (streamed)",
      graft.quality.Kmv.overlapFromSketches(
        foldedKmvSketches(state, Seq(oc.typeColumn), oc.k),
        oc.typeColumn, oc.k)
        .filter(col("jaccard_e6") > oc.maxJaccardE6).count())
  }

  /** Fold persisted [[histogramStream]] batch histograms down to one
    * (group, bin) count frame — bin counts sum exactly, so the merged
    * histogram IS the one-shot histogram. Shared by the dashboard read
    * side and the quantile gate (the foldedKmvSketches pattern: one
    * merge implementation, no one-sided drift). */
  def foldedHistogramState(state: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame =
    state
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Read side of [[histogramStream]]: sum the per-batch bin counts and
    * read quantiles from the merged state. */
  def mergedHistogramQuantiles(spark: SparkSession, stateDir: String,
      groupCols: Seq[String], binWidth: Long,
      qsE6: Seq[Long]): org.apache.spark.sql.DataFrame =
    graft.quality.Sketches.histogramQuantiles(
      foldedHistogramState(spark.read.parquet(stateDir), groupCols),
      groupCols, binWidth, qsE6)

  def driftStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      column: String,
      baseline: org.apache.spark.sql.DataFrame,
      lo: Double,
      hi: Double,
      nBins: Int,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    // the baseline is static: histogram it ONCE at query start, COLLECT the
    // <= nBins+2-row result, and rebuild it as a local DataFrame. A
    // localCheckpoint would also skip the per-batch re-scan, but its blocks
    // die with their executors and cannot be recomputed — on a cluster with
    // dynamic allocation that kills an unbounded monitor at the first
    // decommission. A driver-local literal frame survives anything.
    val baseRows = graft.quality.Anomaly
      .histogramCounts(baseline, column, lo, hi, nBins)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sparkForImplicits = spark
    import sparkForImplicits.implicits._
    val baseCounts = baseRows.toDF("bucket", "n")
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          graft.quality.Anomaly.histogramDriftFromCounts(baseCounts,
              batch.toDF(), column, lo, hi, nBins)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          ()
      }
      .start()
  }

  /** Watermarked tumbling-window aggregation (the streaming analogue of the
    * hourly gold mart): late data beyond `watermark` is dropped and window
    * state is reclaimed. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Keyed dedup with BOUNDED state: duplicates of a key are dropped only
    * within the watermark horizon, so state is reclaimed as event time
    * advances — the only dedup that survives an unbounded stream (plain
    * `dropDuplicates` state grows forever). The batch analogue is D1 keyed
    * dedupe; tie-breaking is first-seen, as on any stream. */
  def dedupedStream(events: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: the streaming fact joined to a BATCH
    * dimension with an explicit broadcast — each micro-batch ships the dim
    * to executors once, no stream-side shuffle (the continuous analogue of
    * J1 `Joins.enrich`). */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** STREAM-STREAM time-bounded equi-join — the attribution primitive
    * (impression→click, request→response, order→payment): pair each right
    * event with the left events on the same key that happened in the
    * window [right.ts − maxDelay, right.ts]. Both sides are genuinely
    * unbounded, so unlike [[enrichStream]] nothing is broadcast: Spark
    * buffers BOTH sides in the state store, keyed by the join key, and the
    * time-bound + watermarks are what let it EVICT — without the range
    * condition the state grows forever, which is why this operator
    * REQUIRES the bound instead of defaulting one.
    *
    * State/correctness posture at scale: state per key is bounded by
    * maxDelay × per-key rate; watermark lag adds to that linearly. Events
    * later than their side's watermark are dropped by the join (standard
    * streaming trade — size the watermarks to the real p99 lateness).
    * Inner join emits as soon as both sides are present; matches are
    * EXACTLY the batch range-join on the same frames, which is what the
    * spec pins (run the same join in batch, compare).
    *
    * Both inputs must carry (keyCol, tsCol); output = left row + right's
    * ts as `right_<tsCol>` + right's payload columns. */
  def timeBoundJoinStream(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, maxDelay: String,
      leftWatermark: String, rightWatermark: String): DataFrame = {
    val l = left.withWatermark(tsCol, leftWatermark)
    val rRenamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"right_$c")
    }
    val r = rRenamed.withWatermark(s"right_$tsCol", rightWatermark)
    l.join(r,
      col(keyCol) === col(s"right_$keyCol") &&
        col(s"right_$tsCol") >= col(tsCol) &&
        col(s"right_$tsCol") <= col(tsCol) + expr(s"interval $maxDelay"))
      .drop(s"right_$keyCol")
  }

  /** Continuous gold refresh — the streaming analogue of the reference's
    * micro-batch `incremental_strategy='merge'` (daily_trip_stats.sql:3-11):
    * a STATEFUL streaming aggregation over the SAME GoldModel the batch
    * engine runs (Spark's state store keeps the running aggregate per
    * group), so each micro-batch emits COMPLETE cumulative values for the
    * groups it touched — per-batch-aggregate-then-merge would corrupt
    * groups spanning batches. foreachBatch then upserts the touched keys
    * into a PARTITIONED mart with `IncrementalMaterializer.merge`
    * semantics, rewriting ONLY the partitions the batch touched (dynamic
    * partition overwrite) — the same partition-scoped shape as the
    * reference's dbt merge (revenue_by_payment_type.sql:3-11).
    *
    * `partitionKeys` must be a non-empty subset of `keys` with stable
    * values (year/month-style derivations of event time are the natural
    * choice). Per batch the cost is O(touched partitions), not O(mart):
    * the merge reads only the touched partition dirs (partition-pruned
    * scan) and the overwrite replaces only the partition dirs present in
    * the merged frame — untouched partitions are never read or rewritten,
    * so a years-deep mart absorbs a steady stream at current-month cost.
    * (DATA cost, precisely: partition DISCOVERY still lists the dir tree
    * once per batch — O(partition count) metadata ops, not O(rows). If a
    * mart accretes thousands of partitions, archive cold ones or split
    * the mart by year; listing, not reading, becomes the ceiling.)
    *
    * Durability: partition replacement commits per-partition through the
    * file committer (no whole-mart rename swap — S3 renames are copies).
    * The committer's delete-then-rename per partition has a crash window
    * that could lose UNTOUCHED groups sharing a touched partition, so
    * before overwriting, the pre-batch rows of the touched partitions are
    * snapshotted to `<mart>__bak` (touched-partition-sized, tiny for gold
    * aggregates). [[recoverMartPartitions]] runs at every batch start: a
    * committed bak is merged back over the mart (idempotent — bak is
    * immutable until its delete), then the exactly-once state store
    * replays the interrupted batch and the merge converges. An
    * uncommitted bak (no _SUCCESS) means the mart was never touched —
    * dropped. Old-protocol debris (`__refresh_bak`/`__refresh_tmp` from
    * pre-r11 deployments) is restored/cleaned the same way. */
  def goldRefreshStream(
      events: DataFrame,
      model: graft.config.GoldModel,
      keys: Seq[String],
      partitionKeys: Seq[String],
      martPath: String,
      checkpointDir: String): StreamingQuery = {
    require(model.orderBy.isEmpty && model.limit.isEmpty,
      "streaming gold models cannot sort/limit — order the mart at read time")
    require(!model.rollup && !model.cube,
      "streaming gold models cannot rollup/cube — the merge key would " +
        "collide grouping sets; materialize levels from the batch mart")
    require(partitionKeys.nonEmpty,
      "goldRefreshStream needs at least one partition key — partition-scoped " +
        "overwrite is the durability story; any stable group-key subset works")
    require(partitionKeys.forall(keys.contains),
      s"partitionKeys [${partitionKeys.mkString(",")}] must be a subset of " +
        s"merge keys [${keys.mkString(",")}]")
    val agg = graft.gold.AggregationEngine.build(events, model)
    agg.writeStream
      .outputMode(OutputMode.Update()) // only touched groups per micro-batch
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (updated: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = updated.sparkSession
        val mart = new org.apache.hadoop.fs.Path(martPath)
        val fs = mart.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverMartPartitions(spark, fs, martPath, partitionKeys)
        // per-batch localCheckpoint is retry-safe: if an executor dies the
        // checkpointed blocks are lost, the batch FAILS, and the state
        // store replays the whole batch on restart — unlike lineage state
        // (which round 10 made durable, :172) nothing here outlives the
        // batch, so block-store persistence is exactly enough
        val upd = updated.toDF().localCheckpoint()
        if (!upd.isEmpty) {
          val top = if (fs.exists(mart)) fs.listStatus(mart) else Array.empty[org.apache.hadoop.fs.FileStatus]
          // a flat (non-partitioned, legacy) mart at this path would be
          // silently shadowed by dynamic overwrite — refuse loudly, same
          // posture as the legacy-sink-dir guard at the curation sink
          require(!top.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
            s"$martPath holds a non-partitioned mart; migrate it first by " +
              s"rewriting with partitionBy(${partitionKeys.mkString(",")})")
          val martExists = top.exists(st => st.isDirectory &&
            st.getPath.getName.contains("="))
          val bak = new org.apache.hadoop.fs.Path(martPath + "__bak")
          val merged =
            if (!martExists) upd
            else {
              // touched partitions: |partitions-per-batch|-sized — bounded
              // by the stream's event-time spread, not by stream volume
              val touched = upd.select(partitionKeys.map(col): _*).distinct().collect()
              val pred = touched.map(r =>
                partitionKeys.zipWithIndex
                  .map { case (k, i) => col(k) <=> lit(r.get(i)) }
                  .reduce(_ && _)).reduce(_ || _)
              // schema-pinned read: upd's schema covers the whole mart row
              // (merge requires identical columns), and a user-specified
              // schema DISABLES partition-column type inference — a string
              // key like "01" stays "01" instead of round-tripping through
              // int 1 and splitting one logical group into two dirs. The
              // filter is on partition columns only → partition-pruned
              // scan; untouched partition dirs are never opened.
              val existing = spark.read.schema(upd.schema).parquet(martPath)
                .filter(pred)
                .localCheckpoint() // materialize once: feeds bak AND merge
              // snapshot the pre-batch touched partitions: the dynamic
              // overwrite below deletes-then-renames each touched dir, and
              // a crash between those two steps would otherwise lose the
              // partition's UNTOUCHED groups (they exist nowhere else)
              existing.write.mode("overwrite").parquet(bak.toString)
              graft.gold.IncrementalMaterializer.merge(existing, upd, keys)
            }
          // merged reads the same dirs the write replaces: cut lineage so
          // every row is materialized before any partition dir is touched
          merged.localCheckpoint()
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partitionKeys: _*)
            .parquet(martPath)
          fs.delete(bak, true) // batch fully published; snapshot obsolete
        }
        ()
      }
      .start()
  }

  /** Continuous CDC apply — the streaming twin of
    * [[graft.quality.Reconciliation.applyChangeSet]]: micro-batches of
    * value-carrying change rows (the `snapshotDiff(emitValues = true)`
    * shape: keyCols ++ status ++ valueCols) maintain a persisted snapshot
    * table under `snapshotPath`, partitioned by `bucket` =
    * pmod(xxhash64(keys), nBuckets) — a pure function of the key, so each
    * key lives in exactly one partition dir forever.
    *
    * Per batch the cost is O(touched buckets), not O(snapshot): the
    * apply reads only the buckets whose keys appear in the batch
    * (partition-pruned, schema-pinned read) and dynamic overwrite
    * replaces only those dirs. Size `nBuckets` so snapshot/nBuckets fits
    * an executor comfortably; at 100 TB with nBuckets = 16384 a batch
    * touching 1% of keys rewrites ~1% of dirs at ~6 GB each.
    *
    * Durability mirrors [[goldRefreshStream]]: pre-batch rows of the
    * touched buckets snapshot to `<path>__bak` before the overwrite, and
    * [[recoverMartPartitions]] repairs a torn batch at every start.
    *
    * Multi-change-per-key batches: when `orderCols` is non-empty, each
    * micro-batch is first collapsed per key to the LATEST change on the
    * ascending (orderCols…) total order (ties beyond orderCols broken by
    * the remaining payload columns, so the reduction is deterministic
    * regardless of partitioning). Latest-wins is sequence-equivalent for
    * snapshot-consistent feeds: added→removed nets to removed,
    * removed→added to added, added→changed to the changed values — the
    * same final state as applying the changes one at a time. A collapsed
    * winner whose status is 'added' is rewritten to 'changed' (= upsert)
    * before the apply: a removed→added net leaves an 'added' for a key
    * the snapshot still HOLDS, and applyChangeSet's insert-only 'added'
    * would duplicate it next to the surviving old row (caught by the
    * burst spec flaking on parquet row order — both rows landed in the
    * bucket and `.toMap` picked one at random). For keys genuinely
    * absent, 'changed' inserts identically, so the rewrite is safe
    * across the board. With
    * `orderCols` empty the pre-r14 contract applies: at most one change
    * row per key per micro-batch (true of any per-interval snapshot
    * diff; two same-key rows would then have no defined order and both
    * survive the anti-join). Batch replays after a crash re-apply the
    * same change set onto the RESTORED pre-batch buckets — idempotent. */
  def cdcApplyStream(
      changes: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      nBuckets: Int,
      snapshotPath: String,
      checkpointDir: String,
      orderCols: Seq[String] = Seq.empty): StreamingQuery = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "cdcApplyStream needs key and value columns")
    val bucketOf = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))
    changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val snap = new org.apache.hadoop.fs.Path(snapshotPath)
        val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverMartPartitions(spark, fs, snapshotPath, Seq("bucket"))
        val raw = batch.toDF().localCheckpoint()
        // collapse a multi-change batch per key to latest-wins on the
        // ascending (orderCols…) order; remaining payload columns join the
        // struct after orderCols so the max is a deterministic total order
        val b =
          if (orderCols.isEmpty || raw.isEmpty) raw
          else {
            val payload = raw.columns.toSeq.filterNot(keyCols.contains)
            val structCols = orderCols ++ payload.filterNot(orderCols.contains)
            raw.groupBy(keyCols.map(col): _*)
              .agg(max(struct(structCols.map(col): _*)).as("_w"))
              .select(raw.columns.toSeq.map(c =>
                if (keyCols.contains(c)) col(c) else col(s"_w.$c").as(c)): _*)
              // a netted removed→added is an 'added' for a key the
              // snapshot still holds; applyChangeSet's 'added' is
              // insert-only and would DUPLICATE it — upsert instead
              .withColumn("status",
                when(col("status") === "added", lit("changed"))
                  .otherwise(col("status")))
              .localCheckpoint()
          }
        if (!b.isEmpty) {
          val rowCols = keyCols ++ valueCols
          val outSchema = org.apache.spark.sql.types.StructType(
            b.select(rowCols.map(col): _*).schema.fields :+
              org.apache.spark.sql.types.StructField("bucket",
                org.apache.spark.sql.types.LongType, nullable = false))
          val snapExists = fs.exists(snap) && fs.listStatus(snap)
            .exists(st => st.isDirectory && st.getPath.getName.contains("="))
          val bak = new org.apache.hadoop.fs.Path(snapshotPath + "__bak")
          // touched buckets: |buckets-per-batch|-sized driver list
          val touched = b.select(bucketOf.as("bucket"))
            .distinct().collect().map(_.getLong(0))
          val prev =
            if (!snapExists)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                outSchema)
            else {
              val existing = spark.read.schema(outSchema).parquet(snapshotPath)
                .filter(col("bucket").isin(touched: _*))
                .localCheckpoint() // materialize once: feeds bak AND apply
              existing.write.mode("overwrite").parquet(bak.toString)
              existing
            }
          val applied = graft.quality.Reconciliation
            .applyChangeSet(prev.drop("bucket"), b, keyCols, valueCols)
            .withColumn("bucket", bucketOf)
            .localCheckpoint()
          applied
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(snapshotPath)
          // dynamic overwrite only replaces partitions PRESENT in the
          // output: a touched bucket whose every key was removed would keep
          // its stale dir and resurrect deleted keys on the next read.
          // Explicitly drop touched dirs absent from the output. Crash-safe:
          // bak still holds those dirs' pre-batch rows, so a crash anywhere
          // in this loop is repaired by recoverMartPartitions + replay.
          if (snapExists) {
            val appliedBuckets = applied.select("bucket").distinct()
              .collect().map(_.getLong(0)).toSet
            touched.filterNot(appliedBuckets.contains).foreach { bkt =>
              fs.delete(
                new org.apache.hadoop.fs.Path(snapshotPath + s"/bucket=$bkt"),
                true)
            }
          }
          fs.delete(bak, true)
        }
        ()
      }
      .start()
  }

  /** Crash repair for [[goldRefreshStream]], idempotent, run per batch:
    * a COMMITTED bak snapshot (`_SUCCESS` present) holds the pre-batch
    * rows of the partitions a dead batch was overwriting — write them
    * back (dynamic overwrite; bak survives until this succeeds, so the
    * repair itself is crash-retryable), then let the state store replay
    * the batch. An uncommitted bak means the mart was never touched.
    * Also migrates pre-r11 whole-mart swap debris: a `__refresh_bak`
    * with no live mart is the old protocol's crash-between-renames state
    * — restored wholesale rather than silently orphaned. */
  def recoverMartPartitions(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, martPath: String,
      partitionKeys: Seq[String]): Unit = {
    val mart = new org.apache.hadoop.fs.Path(martPath)
    val legacyBak = new org.apache.hadoop.fs.Path(martPath + "__refresh_bak")
    val legacyTmp = new org.apache.hadoop.fs.Path(martPath + "__refresh_tmp")
    if (fs.exists(legacyBak)) {
      if (!fs.exists(mart))
        require(fs.rename(legacyBak, mart),
          s"could not restore $mart from pre-r11 $legacyBak")
      else fs.delete(legacyBak, true)
    }
    if (fs.exists(legacyTmp)) fs.delete(legacyTmp, true)
    val bak = new org.apache.hadoop.fs.Path(martPath + "__bak")
    if (fs.exists(bak)) {
      // a committed-but-dataless bak (the touched partitions were new —
      // nothing pre-existed) restores nothing; reading it would fail
      // schema inference, so check for data files, not just _SUCCESS
      val committed = fs.exists(new org.apache.hadoop.fs.Path(bak, "_SUCCESS"))
      val hasData = committed && fs.listStatus(bak).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (hasData)
        spark.read.parquet(bak.toString).localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionKeys: _*)
          .parquet(martPath)
      fs.delete(bak, true)
    }
  }

  final case class KeyedEvent(key: String, value: Double)
  final case class RunningStat(key: String, n: Long, total: Double)

  final case class TypedEvent(key: Long, tsUs: Long, tie: Long, typ: String)
  final case class Transition(key: Long, from_type: String, to_type: String)
  final case class LastSeen(tsUs: Long, tie: Long, typ: String)

  /** CONTINUOUS transition emission — the streaming twin of
    * `Sessions.transitionMatrix`: per-key state holds the last event seen,
    * each micro-batch sorts ITS OWN rows per key by (tsUs, tie) and emits
    * one (from_type, to_type) row per event, with '^' for a key's very
    * first event ever. Downstream aggregation (count by pair, the batch
    * matrix tail) composes on the emitted stream.
    *
    * Ordering contract: equals the batch matrix when each key's events
    * arrive in event-time order ACROSS micro-batches (within a batch the
    * sort handles any order). A late event — older than the key's state —
    * is chained in ARRIVAL order, diverging from the batch matrix; bound
    * lateness upstream with a watermark + dedupedStream if that matters.
    *
    * MEMORY BOUND: `rows.toSeq` materializes one key's micro-batch slice
    * on its executor before sorting — the bound is rows-per-key-per-
    * TRIGGER, not history (state is one event). That bound is only as
    * good as the trigger: a replay/backfill that crams a hot key's whole
    * history into one micro-batch buffers all of it. Cap micro-batch size
    * at the source (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`) when
    * feeding this operator from a backlog — then the buffer is
    * (trigger cap) × (that key's share), the same bound the gap
    * sessionizer carries. */
  def transitionStream(events: org.apache.spark.sql.Dataset[TypedEvent])
      : org.apache.spark.sql.Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[TypedEvent], state: GroupState[LastSeen]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.tie))
          var prev = state.getOption
          val out = sorted.map { e =>
            val from = prev.map(_.typ).getOrElse("^")
            prev = Some(LastSeen(e.tsUs, e.tie, e.typ))
            Transition(key, from, e.typ)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  final case class CapEvent(key: Long, tsUs: Long, tie: Long, value: Double)

  /** Streaming per-key contributor cap — q137's batch cap as a stream:
    * emit each key's first `maxPerKey` events (by event time) and drop
    * the rest, with one Long of state per key. The data-curation
    * rate-limiter: no user/domain/device floods the corpus however long
    * the stream runs, and state NEVER grows with traffic — it is one
    * counter per key, the cheapest stateful op in this file.
    *
    * Ordering contract (the transitionStream posture): events are ranked
    * (tsUs, tie) WITHIN each trigger; an event arriving in a later
    * trigger after the cap filled is dropped even if its event time
    * precedes an emitted one. Exactly-the-batch-cap semantics need the
    * batch operator; this is the bounded-state streaming trade, and the
    * spec pins both the per-trigger agreement and the divergence. */
  def capStream(events: org.apache.spark.sql.Dataset[CapEvent],
      maxPerKey: Int): org.apache.spark.sql.Dataset[CapEvent] = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, CapEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[CapEvent], state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          val room = (maxPerKey - used).max(0L).toInt
          val take = rows.toSeq.sortBy(e => (e.tsUs, e.tie)).take(room)
          if (take.nonEmpty) state.update(used + take.size)
          take.iterator
      }
  }

  /** Keyed running aggregate via mapGroupsWithState — the custom-state
    * primitive (per-key counters, sessionization, online quality stats). */
  def runningTotals(events: org.apache.spark.sql.Dataset[KeyedEvent])
      : org.apache.spark.sql.Dataset[RunningStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[RunningStat, RunningStat](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[RunningStat]) =>
          // fold the iterator directly — materializing the batch (rows.toSeq)
          // is the pattern that OOMs on a hot key
          val prev = state.getOption.getOrElse(RunningStat(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { (acc, e) =>
            RunningStat(key, acc.n + 1, acc.total + e.value)
          }
          state.update(next)
          next
      }
  }

  final case class TransitionBuffer(last: Option[LastSeen],
      pending: Seq[TypedEvent])

  /** `transitionStream` with a WATERMARK-DELAY reorder buffer — the
    * late-event hardening option. The low-latency default chains late
    * events in arrival order (documented divergence from the batch
    * matrix); this variant holds each event until the event-time
    * watermark (max event time seen − `delayUs`) passes it, then emits
    * buffered events in (tsUs, tie) order. An event arriving up to
    * `delayUs` after later events therefore reorders BEFORE emission and
    * the emitted chain equals the batch matrix; only events later than
    * the delay still diverge (and are dropped by the watermark, the
    * standard contract). Latency cost: every transition emits at least
    * `delayUs` behind the stream's max event time.
    *
    * State per key = the last emitted event plus the pending buffer; the
    * buffer holds only events inside the delay window, so its bound is
    * that key's arrival rate × `delayUs`, NOT history. An event-time
    * timeout flushes keys that go quiet (watermark advance alone releases
    * their buffer — no new rows needed). Watermark granularity is
    * milliseconds, so `delayUs` is truncated to whole ms. */
  def transitionStreamBuffered(
      events: org.apache.spark.sql.Dataset[TypedEvent],
      delayUs: Long): org.apache.spark.sql.Dataset[Transition] = {
    import events.sparkSession.implicits._
    require(delayUs >= 0L, s"delayUs must be >= 0, got $delayUs")
    val withTs = events
      .withColumn("_ts", timestamp_micros(col("tsUs")))
      .withWatermark("_ts", s"${delayUs / 1000L} milliseconds")
      .as[TypedEvent]
    withTs
      .groupByKey(_.key)
      .flatMapGroupsWithState[TransitionBuffer, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[TypedEvent],
         state: GroupState[TransitionBuffer]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(TransitionBuffer(None, Nil))
          val all = st.pending ++ (if (state.hasTimedOut) Nil else rows.toSeq)
          val (ready, hold) = all.partition(_.tsUs <= wmUs)
          var prev = st.last
          val out = ready.sortBy(e => (e.tsUs, e.tie)).map { e =>
            val from = prev.map(_.typ).getOrElse("^")
            prev = Some(LastSeen(e.tsUs, e.tie, e.typ))
            Transition(key, from, e.typ)
          }
          if (hold.isEmpty && prev.isEmpty) state.remove()
          else {
            state.update(TransitionBuffer(prev, hold))
            if (hold.nonEmpty)
              // wake when the watermark passes the earliest held event
              // (must be strictly ahead of the current watermark)
              state.setTimeoutTimestamp(
                math.max(hold.map(_.tsUs).min / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  final case class Attribution(key: Long, convTie: Long, convTsUs: Long,
      attributedType: String, touchTsUs: Option[Long])
  final case class AttribState(lastTouch: Option[LastSeen],
      pending: Seq[TypedEvent])

  /** CONTINUOUS last-touch attribution — the streaming twin of
    * `Sessions.lastTouchAttribution` (q191), on the
    * [[transitionStreamBuffered]] reorder-buffer posture: each event is
    * held until the event-time watermark (max event time − `delayUs`)
    * passes it, then the buffer drains in (tsUs, tie) order through
    * per-key state holding the latest touch — so conversions credit
    * exactly the touch the batch operator would pick for every event
    * arriving within the delay (late-beyond-delay events are
    * watermark-dropped, the standard contract). Conversions with no
    * in-window touch emit 'direct', matching the batch twin.
    *
    * State per key = one LastSeen + the pending buffer (bounded by that
    * key's arrival rate × delay, never history); an event-time timeout
    * flushes keys that go quiet, and once the watermark passes
    * lastTouch + window the touch is dead (no admissible conversion can
    * credit it) and the key's state is REMOVED — total state is bounded
    * by recently-active keys, not by every key ever seen.
    * `conversionType` must not be a touch type (one event deciding AND
    * re-pointing its own credit is ill-defined). */
  def attributionStreamBuffered(
      events: org.apache.spark.sql.Dataset[TypedEvent],
      conversionType: String, touchTypes: Seq[String], windowUs: Long,
      delayUs: Long): org.apache.spark.sql.Dataset[Attribution] = {
    import events.sparkSession.implicits._
    require(delayUs >= 0L, s"delayUs must be >= 0, got $delayUs")
    require(windowUs > 0L, s"windowUs must be > 0, got $windowUs")
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touchTypes must be non-empty and exclude the conversion type")
    val withTs = events
      .withColumn("_ts", timestamp_micros(col("tsUs")))
      .withWatermark("_ts", s"${delayUs / 1000L} milliseconds")
      .as[TypedEvent]
    withTs
      .groupByKey(_.key)
      .flatMapGroupsWithState[AttribState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[TypedEvent],
         state: GroupState[AttribState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(AttribState(None, Nil))
          val all = st.pending ++ (if (state.hasTimedOut) Nil else rows.toSeq)
          val (ready, hold) = all.partition(_.tsUs <= wmUs)
          var lastTouch = st.lastTouch
          val out = ready.sortBy(e => (e.tsUs, e.tie)).flatMap { e =>
            // processed in total order, so lastTouch is always strictly
            // earlier than e on (ts, tie) when e reads it
            val res =
              if (e.typ == conversionType) {
                val hit = lastTouch.filter(_.tsUs >= e.tsUs - windowUs)
                Some(Attribution(key, e.tie, e.tsUs,
                  hit.map(_.typ).getOrElse("direct"), hit.map(_.tsUs)))
              } else None
            if (touchTypes.contains(e.typ))
              lastTouch = Some(LastSeen(e.tsUs, e.tie, e.typ))
            res
          }
          // A touch is only worth keeping while a future conversion could
          // still credit it: admissible events have ts >= watermark, and
          // the hit test needs touch.ts >= conv.ts - window, so once
          // wm > touch.ts + window the touch is dead. Expired touches are
          // dropped HERE (not just on timeout) so a key whose buffer stays
          // busy doesn't carry a dead touch either.
          val liveTouch = lastTouch.filter(_.tsUs + windowUs >= wmUs)
          if (hold.isEmpty && liveTouch.isEmpty) state.remove()
          else {
            state.update(AttribState(liveTouch, hold))
            // ALWAYS register a timeout when keeping state — a key that
            // goes quiet must still be revisited, or its state lives
            // forever: wake at the earlier of (watermark passes the
            // earliest held event) and (watermark passes touch expiry).
            val wakeMs = (hold.map(_.tsUs).minOption.map(_ / 1000L).toSeq ++
              liveTouch.map(t => (t.tsUs + windowUs) / 1000L + 1L).toSeq).min
            state.setTimeoutTimestamp(
              math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  final case class SessionEvent(key: String, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, valueE6: Long)
  final case class ClosedSession(key: String, startUs: Long, endUs: Long,
      nEvents: Long, valueSumE6: Long)

  /** Streaming gap-based sessionization — the streaming twin of
    * `ops.Sessions` (q61): flatMapGroupsWithState with EVENT-TIME timeout.
    * A session closes either when a later event of the same key arrives
    * more than `gapSec` past the session's last event, or when the
    * watermark passes last+gap with no new data (the timeout path — without
    * it, the final session of every key would sit in the state store
    * forever). Callers must set `withWatermark` on `ts` upstream; the
    * watermark also bounds state for keys that go quiet.
    *
    * Value sums are micro-unit longs (exact across retries/reorderings —
    * a double sum would drift). Events within one (key, micro-batch) group
    * are sorted by event time before folding: state-store order is arrival
    * order, not time order; the sort is bounded by one key's slice of one
    * micro-batch. */
  def sessionStream(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSec: Long): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession): ClosedSession =
            ClosedSession(key, s.startUs, s.lastUs, s.n, s.valueE6)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            // exact micros: getTime truncates to millis; the sub-milli part
            // lives in the nanos field. Keeps the stream micro-exact like
            // the batch twin's ts_us column (q61).
            def micros(t: java.sql.Timestamp): Long =
              Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
            // INTERVAL-MERGE fold: the open session from state is just one
            // more interval among the batch's events, all sorted by start.
            // Each element chains off its PREDECESSOR interval (standard
            // gap logic), so out-of-order (watermark-permitted) events that
            // form their own earlier session chain together instead of
            // fragmenting into singletons, and a chain that reaches within
            // gap of the open session merges into it — matching the batch
            // twin for all data present by the time it's processed. (What
            // Append mode cannot do is retract an already-emitted session
            // if a LATER batch bridges it; keep the watermark <= gap so
            // such bridges are late-dropped rather than half-applied.)
            val intervals = (rows.toSeq.map { e =>
              val us = micros(e.ts)
              OpenSession(us, us, 1L, Math.round(e.value * 1e6))
            } ++ state.getOption).sortBy(s => (s.startUs, s.lastUs, s.valueE6))
            val closed = Seq.newBuilder[ClosedSession]
            var open: Option[OpenSession] = None
            intervals.foreach { iv =>
              open match {
                case Some(s) if iv.startUs - s.lastUs > gapUs =>
                  closed += close(s)
                  open = Some(iv)
                case Some(s) =>
                  open = Some(OpenSession(s.startUs,
                    math.max(s.lastUs, iv.lastUs), s.n + iv.n,
                    s.valueE6 + iv.valueE6))
                case None =>
                  open = Some(iv)
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}

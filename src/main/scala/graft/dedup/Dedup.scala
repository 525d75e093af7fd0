package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation: exact (hash groupBy),
  * n-gram Jaccard pair similarity, MinHash signatures + LSH banding, and
  * SimHash. Extends the reference's keyed dedupe (D1, bronze_to_silver.py:
  * 392-429) to the content-based near-dup family a 100 TB text pipeline
  * needs.
  *
  * Scale notes:
  *  - MinHash signatures are computed ROW-LOCALLY (array_min over a
  *    transform), not via explode+groupBy — zero shuffle until the band join.
  *  - The LSH candidate join shuffles only (band, bucket-key) pairs; bucket
  *    keys are md5 strings, uniformly distributed, so the exchange is
  *    balanced. Hot buckets (boilerplate docs) are the known LSH skew case;
  *    cap them with `maxBucketSize` before the pair blow-up.
  *  - Jaccard self-join explodes distinct shingles; frequency-capping drops
  *    stop-shingles that would otherwise produce O(df²) candidate pairs.
  */
/** The MinHash signing parameters a persisted fuzzy-dedup corpus state was
  * built with. Band buckets only collide for arrivals signed with the SAME
  * (shingleN, numHashes, numBands) — a mismatch yields near-zero collisions
  * and silently misses near-duplicates, so the parameters travel with the
  * state as table properties instead of being re-supplied from memory. */
final case class FuzzySigningParams(
    shingleN: Int,
    numHashes: Int,
    numBands: Int,
    maxBucketSize: Int)

object Dedup {

  /** n-gram shingles over whitespace tokens, distinct, order-preserving
    * construction (slice windows). n=1 → token set. */
  def shingles(c: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    val toks = TextAnalysis.tokens(c)
    if (n == 1) array_distinct(toks)
    else
      // guard: sequence(1, x) DESCENDS for x<1 (it never returns empty), so
      // docs shorter than n shingle to [] explicitly.
      array_distinct(
        when(size(toks) >= n,
          transform(
            sequence(lit(1), size(toks) - lit(n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(typedLit(Seq.empty[String])))
  }

  /** Exact duplicate groups: fingerprint → count>1 (hash-groupBy dedup). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keep_id"))
      .filter(col("copies") > 1)

  /** Canonical content form: lowercase, every non-[a-z0-9] run collapsed to
    * one space, trimmed — a case/whitespace/punctuation-insensitive content
    * identity, the normalization web-corpus pipelines run BEFORE exact
    * hashing so trivially-reformatted copies (casing, extra spaces,
    * trailing punctuation) hash together. Row-local projection: composes
    * with any hash-groupBy dedup at zero extra shuffle cost. Kept to a
    * deliberately simple ASCII character class so Spark's Java regex and
    * any SQL engine's RE2 agree symbol-for-symbol. */
  def canonicalForm(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Canonical duplicate groups: one row per normalized-content group with
    * >1 member — exact dups PLUS case/whitespace/punct variants. Same
    * single balanced shuffle as [[exactDupGroups]], keyed on
    * md5(canonicalForm). */
  def canonicalDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(canonicalForm(col(textCol))).as("fingerprint"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keep_id"))
      .filter(col("copies") > 1)

  /** Canonical dedup: keep the min-id row per NORMALIZED content
    * fingerprint — [[dedupeExact]]'s shuffle shape (one window over a
    * high-cardinality balanced key), with the key canonicalized first. */
  def dedupeCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(canonicalForm(col(textCol))))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Unicode canonical content form: NFC-compose (the native
    * `nfc_normalize` expression — byte-distinct, codepoint-equivalent
    * variants like e+U+0301 vs é collapse), unicode-lowercase, every run
    * of non-letter/non-digit codepoints (`[^\p{L}\p{Nd}]+` — a property
    * class java.util.regex and RE2 read identically) to one space,
    * trimmed. The normalization real web corpora need before content
    * hashing, where [[canonicalForm]]'s deliberately-ASCII class mangles
    * every accented word to fragments. Both forms stay: ASCII for the
    * RE2-parity contract on known-ASCII corpora, this one for the
    * multilingual crawl. Row-local projection, zero extra shuffle. */
  def canonicalFormUnicode(c: Column): Column =
    trim(regexp_replace(lower(call_function("nfc_normalize", c)),
      "[^\\p{L}\\p{Nd}]+", " "))

  /** Unicode canonical duplicate groups: one row per NFC-normalized
    * content group with >1 member — [[canonicalDupGroups]] with the
    * unicode form. Same single balanced md5-keyed shuffle. */
  def canonicalDupGroupsUnicode(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.groupBy(md5(canonicalFormUnicode(col(textCol))).as("fingerprint"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keep_id"))
      .filter(col("copies") > 1)

  /** Unicode canonical dedup: keep the min-id row per NFC-normalized
    * content fingerprint — [[dedupeCanonical]]'s shuffle shape with the
    * unicode form keying the window. */
  def dedupeCanonicalUnicode(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(canonicalFormUnicode(col(textCol))))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact dedup: keep the min-id row per content fingerprint. One shuffle on
    * the fingerprint (high-cardinality, balanced). */
  def dedupeExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Incremental exact dedup for CONTINUOUS INGEST: drop new docs whose
    * content fingerprint already exists in the historical corpus, without
    * anti-joining the full new batch against the full corpus. A Bloom
    * filter over the corpus fingerprints (built distributively by
    * `stat.bloomFilter` — one corpus pass, a driver-held sketch) rides the
    * plan as a binary literal into the native `bloom_might_contain` probe:
    * definite-new rows (bloom miss — no false negatives) pass immediately;
    * only bloom HITS (true dupes + ~fpp·|new| false positives) pay the
    * verifying anti-join against the corpus fingerprint set. The bloom can
    * therefore never change the RESULT — output is exactly the
    * fingerprint set difference — only the anti-join's size.
    *
    * Scale shape: |corpus| enters one aggregate (the sketch) and one
    * anti-join whose PROBE side is the small hit subset; at 1M expected
    * items / 1% fpp the literal is ~1.2 MB — task-closure mass, like the
    * IVF centroid matrix. */
  def dedupeAgainstCorpus(
      newDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val corpusFps = corpus.select(fp.as("_fp"))
    val bloom = corpusFps.stat.bloomFilter("_fp", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val tagged = newDf
      .withColumn("_fp", fp)
      .withColumn("_hit", call_function("bloom_might_contain", col("_fp"),
        lit(bytes)))
    val definiteNew = tagged.filter(!col("_hit"))
    val verified = tagged.filter(col("_hit"))
      .join(corpusFps.distinct(), Seq("_fp"), "left_anti")
    definiteNew.unionByName(verified).drop("_fp", "_hit")
  }

  /** Incremental FUZZY dedup for continuous ingest — the near-dup twin of
    * `dedupeAgainstCorpus`: drop arriving docs whose n-gram Jaccard against
    * ANY historical-corpus doc exceeds `threshold` (exact duplicates are
    * jaccard 1, so this strictly supersedes the fingerprint check at the
    * cost of the signature pass). MinHash-LSH band buckets prune the
    * cross-corpus candidate join — a batch doc pays an exact verification
    * only against corpus docs sharing at least one full signature band,
    * never the whole corpus. Approximate only in LSH recall (a true near-dup
    * agreeing on no band slips through); every DROP is exact-verified.
    *
    * Scale shape: one signature pass per side, the candidate join keyed on
    * (band, bucket) — linear shuffles in |batch| + |corpus|. This
    * convenience form derives the corpus state per call, which evaluates
    * the corpus text scan twice (band pass + verification-set pass) and
    * repeats both on every call — for continuous ingest build the state
    * ONCE with [[corpusFuzzyState]], materialize it durably, and call
    * [[fuzzyDedupePrepared]] per batch (the streaming curation sink does
    * exactly this). The batch side's own two passes are over the arriving
    * micro-batch only. `maxBucketSize` caps corpus-side bucket membership
    * (boilerplate guard) before the candidate explosion. */
  def fuzzyDedupeAgainstCorpus(
      newDf: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      numHashes: Int = 8,
      numBands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val (buckets, sets) = corpusFuzzyState(corpus, idCol, textCol, shingleN,
      numHashes, numBands, maxBucketSize)
    fuzzyDedupePrepared(newDf, buckets, sets, idCol, textCol, shingleN,
      threshold, numHashes, numBands)
  }

  /** Corpus-side state for [[fuzzyDedupePrepared]]: the capped LSH band
    * buckets `(band_idx, bucket, ids)` and the shingle-hash verification
    * sets `(corpus_id, _sh_c)`. The historical corpus is static across an
    * ingest run, so build this once, materialize both frames, and reuse
    * them for every arriving batch — the corpus text is then scanned once
    * per RUN instead of twice per BATCH. For a bounded job a replicated
    * `persist` suffices; for an UNBOUNDED query write them to durable
    * storage and re-read (the streaming curation sink does — a
    * localCheckpoint's executor-resident blocks have truncated lineage, so
    * one executor loss would fail every later micro-batch). */
  def corpusFuzzyState(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int = 8,
      numBands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): (DataFrame, DataFrame) = {
    val buckets = minhashBands(corpus, idCol, textCol, numHashes, numBands,
        shingleN)
      .groupBy("band_idx", "bucket")
      .agg(collect_list(col("doc_id")).as("ids"))
    val capped =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets.filter(size(col("ids")) <= maxBucketSize)
    val sets = corpus.select(col(idCol).as("corpus_id"),
      call_function("shingle_hashes", col(textCol), lit(shingleN)).as("_sh_c"))
    (capped, sets)
  }

  /** [[corpusFuzzyState]] persisted DURABLY as bucketed catalog tables —
    * the batch re-ingest story: the band buckets land bucketed by their
    * join keys `(band_idx, bucket)` and the verification sets by
    * `corpus_id`, so every later [[fuzzyDedupePrepared]] call plans its
    * corpus-side joins WITHOUT an Exchange (the shuffle was paid once at
    * this write; only the arriving batch shuffles, into the corpus's
    * bucket layout). At 100 TB the corpus state dwarfs every batch —
    * re-shuffling it per ingest run would be the dominant cost, and a
    * cached/checkpointed copy dies with the app; a bucketed table
    * survives restarts AND carries its partitioning into the plan. */
  def persistCorpusFuzzyState(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      tablePrefix: String,
      buckets: Int,
      numHashes: Int = 8,
      numBands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): Unit = {
    val (b, s) = corpusFuzzyState(corpus, idCol, textCol, shingleN,
      numHashes, numBands, maxBucketSize)
    graft.ops.Scale.writeBucketed(b, s"${tablePrefix}_buckets", buckets,
      Seq("band_idx", "bucket"))
    graft.ops.Scale.writeBucketed(s, s"${tablePrefix}_sets", buckets,
      Seq("corpus_id"))
    // The signing parameters ARE part of the state: a later ingest that
    // re-signs arrivals with different numHashes/numBands/shingleN gets
    // near-zero band collisions against these buckets and silently misses
    // near-duplicates. Stamp them on the table so the read side can hand
    // them back (or fail loudly) instead of trusting the caller to agree.
    corpus.sparkSession.sql(
      s"ALTER TABLE ${tablePrefix}_buckets SET TBLPROPERTIES (" +
        s"'graft.fuzzy.shingle_n'='$shingleN'," +
        s"'graft.fuzzy.num_hashes'='$numHashes'," +
        s"'graft.fuzzy.num_bands'='$numBands'," +
        s"'graft.fuzzy.max_bucket_size'='$maxBucketSize')")
  }

  /** The read side of [[persistCorpusFuzzyState]]: catalog-backed frames
    * whose bucket layout feeds [[fuzzyDedupePrepared]] shuffle-free on the
    * corpus side, PLUS the signing parameters the state was built with —
    * sign arrivals with exactly these (or call
    * [[fuzzyDedupeAgainstPersisted]], which cannot disagree). Fails loudly
    * on state missing the parameter stamp (persisted by hand or by a
    * pre-stamp version) rather than letting a silent parameter mismatch
    * turn the dedup into a no-op. */
  def loadCorpusFuzzyState(spark: SparkSession,
      tablePrefix: String): (DataFrame, DataFrame, FuzzySigningParams) = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${tablePrefix}_buckets")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def p(key: String): Int = props.getOrElse(s"graft.fuzzy.$key",
      throw new IllegalStateException(
        s"${tablePrefix}_buckets lacks table property graft.fuzzy.$key — " +
          "this corpus state predates parameter stamping (or was written " +
          "by hand); re-run persistCorpusFuzzyState so later ingests " +
          "cannot silently sign with mismatched parameters")).toInt
    val params = FuzzySigningParams(p("shingle_n"), p("num_hashes"),
      p("num_bands"), p("max_bucket_size"))
    (spark.table(s"${tablePrefix}_buckets"),
      spark.table(s"${tablePrefix}_sets"), params)
  }

  /** [[fuzzyDedupePrepared]] against a persisted corpus state, signing the
    * arriving batch with the parameters STORED alongside that state — the
    * misconfiguration-proof continuous-ingest entry point. */
  def fuzzyDedupeAgainstPersisted(
      newDf: DataFrame,
      spark: SparkSession,
      tablePrefix: String,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val (cb, cs, p) = loadCorpusFuzzyState(spark, tablePrefix)
    fuzzyDedupePrepared(newDf, cb, cs, idCol, textCol, p.shingleN, threshold,
      p.numHashes, p.numBands)
  }

  /** [[fuzzyDedupeAgainstCorpus]] against precomputed corpus state from
    * [[corpusFuzzyState]] — the continuous-ingest form: only the arriving
    * batch is signed/shingled here. */
  def fuzzyDedupePrepared(
      newDf: DataFrame,
      corpusBuckets: DataFrame,
      corpusSets: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      numHashes: Int = 8,
      numBands: Int = 4): DataFrame = {
    val newBands = minhashBands(newDf, idCol, textCol, numHashes, numBands,
      shingleN)
    val cands = newBands.join(corpusBuckets, Seq("band_idx", "bucket"))
      .select(col("doc_id").as("new_id"), explode(col("ids")).as("corpus_id"))
      .distinct() // a pair may agree on several bands; verify it once
    // exact verification on the 32-bit shingle-hash sets (one compiled pass
    // per side, same contract as lshJaccardPairs); candidates exist only for
    // docs with >= 1 shingle, so the union denominator is never 0
    val newSets = newDf.select(col(idCol).as("new_id"),
      call_function("shingle_hashes", col(textCol), lit(shingleN)).as("_sh_n"))
    val dropped = cands
      .join(newSets, "new_id")
      .join(corpusSets, "corpus_id")
      .withColumn("_inter",
        size(array_intersect(col("_sh_n"), col("_sh_c"))).cast("long"))
      .filter(col("_inter").cast("double") /
        (size(col("_sh_n")) + size(col("_sh_c")) - col("_inter")).cast("double")
        > threshold)
      .select(col("new_id").as(idCol))
      .distinct()
    newDf.join(dropped, Seq(idCol), "left_anti")
  }

  /** Exact pairwise n-gram Jaccard over candidate pairs that share at least
    * one shingle. Returns (id_a, id_b, inter, size_a, size_b, jaccard) with
    * id_a < id_b. `maxShingleFreq` drops shingles appearing in more than
    * that many docs before pairing (skew guard; pass Int.MaxValue for exact
    * semantics on small corpora). */
  /** Expand sorted per-bucket member lists into (a < b) pairs — the
    * inverted-index pair-generation shape shared by Jaccard and LSH:
    * ONE scan builds the index, ONE shuffle groups it, pairs explode inside
    * each bucket. A self-join would recompute the (interpreted,
    * non-exchange-reused) shingle/signature pass once per side.
    *
    * Two chained explodes (posexplode + slice + explode) rather than a
    * nested `transform(...struct...)` lambda: explode/slice whole-stage-
    * codegen, higher-order lambdas don't. */
  /** Per-group exact-duplicate IMPACT report — the dedup observability
    * row a curation dashboard tracks per source/language/batch: how many
    * docs the group contributes, how many exact dedup would REMOVE under
    * the global min-id survivor rule (computed corpus-wide first, so a
    * duplicate pair spanning two sources attributes its loss to the
    * source holding the higher id — per-group dedup rates that sum
    * consistently with the global dedup), distinct texts, and the
    * micro-unit removal rate. A source suddenly jumping in dup_rate is
    * re-crawling itself; one near 0 everywhere else's overlap is the
    * canonical holder.
    *
    * Scale shape: one fingerprint groupBy (the dedupeExact shuffle), one
    * fingerprint-keyed join back, one grouped rollup — no row-data
    * windows, no pair expansion.
    *
    * NULL-text rows are EXCLUDED from the report (their fingerprint is
    * null and null keys never join — the same explicit-exclusion contract
    * as gapFillDaily's null days): dup accounting over absent content is
    * meaningless; route those rows through the completeness checks
    * instead. */
  def dedupImpactReport(df: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "dedupImpactReport needs group columns")
    val gcols = groupCols.map(col)
    val fpd = df.select(gcols ++ Seq(col(idCol).as("_id"),
      TextAnalysis.fingerprint(col(textCol)).as("_fp")): _*)
    val keep = fpd.groupBy("_fp").agg(min(col("_id")).as("_keep_id"))
    fpd.join(keep, "_fp")
      .withColumn("_removed", col("_id") =!= col("_keep_id"))
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_removed"), 1L).otherwise(0L)).as("n_removed"),
        count_distinct(col("_fp")).as("n_distinct_texts"))
      .withColumn("dup_rate_e6", expr("n_removed * 1000000L div n_docs"))
  }

  /** Truncation-duplicate pairs: documents whose ENTIRE text is a strict
    * prefix of a longer document's — the crawler/connector artifact
    * (cut-off fetches, re-crawls with more content) that exact dedup
    * misses (different fingerprints) and shingle dedup only catches past
    * its jaccard threshold. Candidates bucket on the first `prefixLen`
    * characters (any true prefix pair shares them by construction), then
    * a row-local substring check verifies the full prefix relation —
    * bucketing is pure pruning, never semantics. Strictly-shorter only:
    * equal-length equal-text is exact dedup's job, and docs shorter than
    * `prefixLen` are excluded by contract (too short to assert truncation
    * on; route them through exact dedup).
    *
    * Scale shape: one shuffle on the prefix key; bucket size is bounded
    * by how many docs open identically — boilerplate openings can make a
    * hot bucket, so `maxBucketSize` drops buckets past the cap (the
    * jaccardPairs knob; capped-out buckets are REPORTED dropped by the
    * loud contract below, not silently skipped). Verification is
    * row-local on the joined pair.
    *
    * Output: (child_id, parent_id, child_len, parent_len) — feed distinct
    * child ids to an anti-join to keep longest versions (chains a<b<c
    * drop both a and b: each is some pair's child). */
  def prefixDupes(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 32, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2, got $maxBucketSize")
    val base = df.select(col(idCol).as("_id"), col(textCol).as("_txt"))
      .filter(col("_txt").isNotNull && length(col("_txt")) >= prefixLen)
      .withColumn("_pfx", md5(substring(col("_txt"), 1, prefixLen)))
    val sized =
      if (maxBucketSize == Int.MaxValue) base
      else {
        val ok = base.groupBy("_pfx").agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= maxBucketSize).select("_pfx")
        base.join(ok, "_pfx")
      }
    val a = sized.select(col("_pfx"), col("_id").as("child_id"),
      col("_txt").as("_txt_a"), length(col("_txt")).as("child_len"))
    val b = sized.select(col("_pfx"), col("_id").as("parent_id"),
      col("_txt").as("_txt_b"), length(col("_txt")).as("parent_len"))
    a.join(b, Seq("_pfx"))
      .filter(col("child_len") < col("parent_len"))
      .filter(expr("substring(_txt_b, 1, child_len) = _txt_a"))
      .select(col("child_id").cast("long").as("child_id"),
        col("parent_id").cast("long").as("parent_id"),
        col("child_len").cast("long").as("child_len"),
        col("parent_len").cast("long").as("parent_len"))
  }

  /** Drop every doc that is a strict prefix of a longer doc — keep the
    * fullest version of each truncation chain. */
  def removePrefixDupes(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 32, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val children = prefixDupes(df, idCol, textCol, prefixLen, maxBucketSize)
      .select(col("child_id").as(idCol)).distinct()
    df.join(children, Seq(idCol), "left_anti")
  }

  /** Substring-level (interior-span) duplicate detection — the
    * Lee-et-al-style step AFTER document-level MinHash: repeated runs of
    * >= k tokens INSIDE otherwise-distinct documents (license headers,
    * quoted passages, templated paragraphs). Document-level dedup never
    * sees them; `prefixDupes` only catches whole-document truncations.
    *
    * Every k-token window of every document is fingerprinted POSITIONALLY
    * (60-bit md5 prefix of the space-joined gram — 8-byte shuffle keys,
    * collision odds ~n²/2^61, and exactly replayable in the oracle). One
    * hash aggregate counts global copies per gram and elects the survivor
    * occurrence (lexicographic min (doc, pos) — the standard keep-first
    * rule, as in exactDedupe); one join back flags every NON-survivor
    * occurrence of a gram with copies in [minCopies, maxSpanFreq].
    *
    * No pair stage exists anywhere: detection is per-gram counting, so the
    * work is linear in corpus tokens however many documents share a span.
    * `maxSpanFreq` is the hot-span knob: a gram above it is a stop-phrase
    * ("all rights reserved" at 10^8 df) — masking it everywhere would
    * shred ordinary prose, and it would be the one skewed join key, so it
    * is excluded from flagging (same posture as `maxShingleFreq` in
    * jaccardPairs).
    *
    * Output: one row per flagged occurrence `(idCol, span_pos, copies)` —
    * span_pos is the 1-based token index of the window start; the covered
    * tokens are [span_pos, span_pos + k). Feed to `maskDuplicateSpans`
    * for mask semantics, or aggregate per doc for a contamination score. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCopies: Int = 2,
      maxSpanFreq: Int = Int.MaxValue): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2, got $k")
    require(minCopies >= 2, s"minCopies must be >= 2, got $minCopies")
    require(maxSpanFreq >= minCopies,
      s"maxSpanFreq ($maxSpanFreq) must be >= minCopies ($minCopies)")
    val toks = TextAnalysis.tokens(col(textCol))
    // short docs are filtered BEFORE the window transform: sequence(1, x)
    // descends for x < 1 (same guard as shingles())
    val occ = df
      .select(col(idCol).as("_id"), toks.as("_toks"))
      .filter(size(col("_toks")) >= k)
      .select(col("_id"), explode(transform(
        sequence(lit(1), size(col("_toks")) - lit(k - 1)),
        i => struct(i.as("pos"),
          conv(substring(md5(concat_ws(" ",
            slice(col("_toks"), i, lit(k)))), 1, 15), 16, 10)
            .cast("long").as("gram")))).as("_o"))
      .select(col("_id"), col("_o.pos").as("_pos"), col("_o.gram").as("_gram"))
    val dupGrams = occ.groupBy("_gram")
      .agg(count(lit(1)).as("copies"),
        min(struct(col("_id"), col("_pos"))).as("_surv"))
      .filter(col("copies") >= minCopies && col("copies") <= maxSpanFreq)
    occ.join(dupGrams, "_gram")
      .filter(col("_surv._id") =!= col("_id") ||
        col("_surv._pos") =!= col("_pos"))
      .select(col("_id").as(idCol), col("_pos").as("span_pos"),
        col("copies"))
  }

  /** Mask repeated interior spans: every token covered by a flagged
    * occurrence (see `duplicateSpans` — non-survivor, copies within
    * [minCopies, maxSpanFreq]) is removed, and each MAXIMAL run of removed
    * tokens is replaced by a single `maskToken`. The survivor occurrence
    * keeps its text, so one copy of every repeated span remains in the
    * corpus (the Lee-et-al drop-all-but-one contract, at span granularity).
    *
    * Per-doc state is bounded by the doc's own token count (the masked-
    * position list lives inside one row, like every other row-local text
    * op), so scale follows the detection stage: linear in corpus tokens.
    *
    * Output: the input row plus `n_tokens`, `n_masked`, `n_spans` (maximal
    * merged masked runs), and `masked_text`. Docs with nothing flagged
    * pass through with n_masked = 0 and masked_text = the original tokens
    * re-joined. */
  def maskDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCopies: Int = 2, maxSpanFreq: Int = Int.MaxValue,
      maskToken: String = "[DUP]"): DataFrame = {
    val flagged = duplicateSpans(df, idCol, textCol, k, minCopies, maxSpanFreq)
    // overlapping flagged windows cover the same token: distinct BEFORE the
    // per-doc rollup so a token masks once however many windows hit it
    val covered = flagged.select(col(idCol),
        explode(sequence(col("span_pos"),
          col("span_pos") + lit(k - 1))).as("_mpos"))
      .distinct()
    val perDoc = covered.groupBy(idCol)
      .agg(sort_array(collect_set(col("_mpos"))).as("_mlist"))
    val toks = TextAnalysis.tokens(col(textCol))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("_mlist",
        coalesce(col("_mlist"), typedLit(Seq.empty[Int])))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_masked", size(col("_mlist")).cast("long"))
      // islands count: fold over the sorted positions, +1 whenever the
      // predecessor isn't pos-1 (row-local, no window)
      .withColumn("n_spans", aggregate(col("_mlist"),
        struct(lit(-2).as("prev"), lit(0L).as("cnt")),
        (acc, x) => struct(x.as("prev"),
          (acc("cnt") + when(x - acc("prev") === 1, 0L).otherwise(1L))
            .as("cnt")),
        acc => acc("cnt")))
      // run collapse: a masked token emits the sentinel only when its
      // predecessor position is NOT masked; interior masked tokens emit
      // null, which concat_ws skips
      .withColumn("masked_text", concat_ws(" ", transform(toks,
        (t, i0) => when(array_contains(col("_mlist"), i0 + lit(1)),
          when(array_contains(col("_mlist"), i0), lit(null))
            .otherwise(lit(maskToken)))
          .otherwise(t))))
      .drop("_mlist")
  }

  private def bucketPairs(buckets: DataFrame, memberCol: String): DataFrame =
    buckets.select(col(memberCol).as("_ids"))
      .select(col("_ids"), posexplode(col("_ids")))
      .toDF("_ids", "_i", "id_a")
      // 0-based pos _i pairs with 1-based positions _i+2 .. end
      .select(col("id_a"),
        explode(slice(col("_ids"), col("_i") + lit(2), size(col("_ids")))).as("id_b"))

  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxShingleFreq: Int = Int.MaxValue): DataFrame = {
    // Each posting carries its doc's set size (row-local `size` of the
    // already-materialized shingle array), so sizes ride through the pair
    // expansion instead of joining back against branches that would
    // re-scan and re-shingle the corpus: ONE scan, TWO shuffles (inverted
    // index + pair counts), ZERO joins.
    //
    // The index is keyed by the shingles' 32-bit md5-prefix HASHES (the
    // native one-pass `shingle_hashes` expression), not the shingle
    // strings: an 8-byte key shuffles ~4× less than a 3-word string and
    // groups/sorts faster. A cross-shingle collision within one pair would
    // nudge `inter` by 1 — odds ~(shingles/doc)²/2³², ignored by contract.
    val sh = df.select(col(idCol).as("doc_id"),
        call_function("shingle_hashes", col(textCol), lit(n)).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("set_size"),
        explode(col("sh")).as("shingle"))
    // one shuffle builds the inverted index; the frequency cap (skew guard)
    // is a size() filter on the posting list — no second freq pass. Postings
    // sort by (doc_id, set_size) struct order ≡ doc_id order (ids unique).
    val index = sh.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("set_size"))))
        .as("ids"))
    val cappedIndex =
      if (maxShingleFreq == Int.MaxValue) index
      else index.filter(size(col("ids")) <= maxShingleFreq)
    bucketPairs(cappedIndex, "ids")
      .select(
        col("id_a.doc_id").as("id_a"), col("id_a.set_size").as("size_a"),
        col("id_b.doc_id").as("id_b"), col("id_b.set_size").as("size_b"))
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"), col("size_b"),
        (col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** Asymmetric near-CONTAINMENT pairs: containment(A in B) = |A∩B| / |A| —
    * the signal symmetric Jaccard MISSES when a short document is swallowed
    * whole by a longer one (a quoted article inside a commentary page, a
    * license block inside every file of a repo): jaccard dilutes with the
    * big doc's size while containment of the small side stays ≈ 1. Returns
    * every shingle-sharing pair where EITHER direction's containment
    * reaches `thresholdE6`, with both directions as floor-division
    * micro-units (exact integers — hash-comparable). Same inverted-index
    * shape and `maxShingleFreq` skew cap as [[jaccardPairs]]; dedup policy
    * (usually: drop the contained side) is the caller's. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      thresholdE6: Long,
      maxShingleFreq: Int = Int.MaxValue): DataFrame =
    jaccardPairs(df, idCol, textCol, n, maxShingleFreq)
      .withColumn("containment_a_e6", expr("inter * 1000000L div size_a"))
      .withColumn("containment_b_e6", expr("inter * 1000000L div size_b"))
      .filter(greatest(col("containment_a_e6"), col("containment_b_e6"))
        >= thresholdE6)
      .drop("jaccard")

  /** Universal-hash MinHash family: ONE 32-bit md5 base hash per shingle,
    * then k cheap integer permutations h ↦ (aⱼ·h + bⱼ) mod p. This is the
    * standard scheme (one expensive hash, k O(1) permutations) — 8× fewer
    * md5 evaluations than hashing per seed, and pure integer math that every
    * engine reproduces exactly. aⱼ < 2³⁰ and h < 2³² keep aⱼ·h+bⱼ < 2⁶²:
    * no signed-64 overflow anywhere (DuckDB would error, Spark would wrap). */
  private[dedup] val minhashP = graft.catalyst.MinHashFamily.P
  private[dedup] val minhashA = graft.catalyst.MinHashFamily.A.toSeq

  /** 32-bit base hash per shingle (first 8 md5 hex digits). */
  def shingleBaseHashes(shingleArr: Column): Column =
    transform(shingleArr,
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  /** One MinHash value over the base-hash array for permutation `seed` —
    * the pure-builtin form (k interpreted HOF traversals); hot paths use
    * the native `minhash_sigs` expression instead (withMinHash). Empty
    * array → null (array_min), filtered by callers. */
  def minHashValue(baseHashArr: Column, seed: Int): Column = {
    require(seed < minhashA.length, s"at most ${minhashA.length} hash permutations")
    array_min(transform(baseHashArr,
      h => (lit(minhashA(seed)) * h + lit(seed.toLong)) % lit(minhashP)))
  }

  /** MinHash signature columns mh0..mh{k-1} appended to df. Row-local, no
    * shuffle; empty shingle sets get null signatures (filtered upstream).
    * Shingles and base hashes materialize ONCE into temp columns, then the
    * native `minhash_sigs` expression (graft.catalyst.MinHashSigs) computes
    * all k values in one compiled loop — the builtin form would traverse
    * the array k times with per-element lambda interpretation. */
  def withMinHash(
      df: DataFrame, textCol: String, numHashes: Int, shingleN: Int): DataFrame = {
    val withSigs = df
      // shingle_hashes + minhash_sigs: the whole signature path is two
      // compiled loops per row (graft.catalyst.{ShingleHashes, MinHashSigs})
      .withColumn("_hs",
        call_function("shingle_hashes", col(textCol), lit(shingleN)))
      .withColumn("_sigs", call_function("minhash_sigs", col("_hs"), lit(numHashes)))
    (0 until numHashes).foldLeft(withSigs)((d, j) =>
      d.withColumn(s"mh$j", element_at(col("_sigs"), j + 1)))
      .drop("_hs", "_sigs")
  }

  /** LSH band keys: band b = md5 of the concatenated signature rows in that
    * band. bandsₓrows = numHashes. */
  def bandKeys(numBands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      md5(concat_ws("|", cols: _*)).as(s"band$b")
    }

  /** Long-format MinHash band memberships (doc_id, band_idx, bucket) — the
    * LSH blocking key stream shared by the self-join (`lshCandidates`) and
    * cross-corpus (`fuzzyDedupeAgainstCorpus`) paths. Row-local until the
    * caller's first groupBy/join; docs too short to produce any shingle get
    * null signatures and are dropped here (they can't be near-dups of
    * anything by construction). At 100 TB this is the frame to PERSIST as a
    * silver table keyed by (band_idx, bucket): incremental ingest then bands
    * only the arriving batch instead of re-signing the corpus per batch. */
  def minhashBands(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      numBands: Int,
      shingleN: Int): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rows = numHashes / numBands
    val sig = withMinHash(df.select(col(idCol).as("doc_id"), col(textCol)),
      textCol, numHashes, shingleN)
      .filter(col("mh0").isNotNull)
    sig.select(col("doc_id") +: bandKeys(numBands, rows): _*)
      .select(col("doc_id"), posexplode(
        array((0 until numBands).map(b => col(s"band$b")): _*)))
      .toDF("doc_id", "band_idx", "bucket")
  }

  /** Candidate near-dup pairs via MinHash-LSH: docs agreeing on at least one
    * full band. Returns distinct (id_a, id_b), id_a < id_b. The join key is
    * (band index, bucket key); `maxBucketSize` drops degenerate buckets. */
  def lshCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      numBands: Int = 4,
      shingleN: Int = 1,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val long = minhashBands(df, idCol, textCol, numHashes, numBands, shingleN)
    // one shuffle groups each (band, bucket); the size cap is a filter on
    // the member list; pairs explode in place (no self-join, so the md5
    // signature pass runs once, not once per join side).
    val buckets = long.groupBy("band_idx", "bucket")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val capped =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets.filter(size(col("ids")) <= maxBucketSize)
    bucketPairs(capped, "ids").distinct()
  }

  /** 32-bit token hashes of a text column (one md5 pass). */
  def tokenHashes(c: Column): Column =
    transform(TextAnalysis.tokens(c),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))

  /** 32-bit SimHash from a token-hash ARRAY: per bit, sum ±1 over tokens,
    * bit set iff the sum is positive. The hash array must be materialized
    * once upstream — inlining tokenHashes here would run the md5 pass 32
    * times (interpreted HOFs are not CSE'd); the 32 folds over longs are
    * cheap. Near-dups = small hamming distance. */
  def simHashFromHashes(hashArr: Column): Column = {
    val bits = (0 until 32).map { b =>
      val bitSum = aggregate(hashArr, lit(0L),
        (acc, h) => acc + shiftright(h, b) % lit(2L) * lit(2L) - lit(1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Convenience single-expression simhash — fine on small data / tests;
    * hot paths should materialize tokenHashes first (see simHashPairs). */
  def simHash(c: Column): Column = simHashFromHashes(tokenHashes(c))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup CLUSTERS from candidate pairs: connected components by
    * min-label propagation WITH pointer jumping — each round every node
    * adopts the minimum of (its label, its neighbors' labels, its label's
    * label). The shortcut halves chain lengths each round, so convergence is
    * O(log diameter) rounds, not O(diameter). Returns (id, label) where
    * label = the component's min id — the canonical survivor.
    *
    * Scale notes: each round is keyed shuffles only, and runs exactly ONE
    * driver action — the old label rides through the aggregate, so the
    * convergence check is a filter on the round's own output (counted by the
    * same job that materializes the lazy `localCheckpoint`), not a second
    * join+count job. `localCheckpoint` cuts plan lineage so round N doesn't
    * replan rounds 1..N−1. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 16): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
    val sym = edges.unionByName(
      edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .distinct() // duplicate candidate edges would multiply join output
      .localCheckpoint()
    // seed with label = min(id, neighbors): the first propagation round
    // pre-applied during the dedup aggregate — one fewer corpus-wide
    // join+shuffle round before convergence
    var labels = sym.groupBy("id_a")
      .agg(min(col("id_b")).as("_mn"))
      .select(col("id_a").as("id"),
        least(col("id_a"), col("_mn")).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // ONE join per round (r21): the propagation edges (sym) and the
      // pointer-jump edges (label → id, "follow my label's label") are
      // both 'dst inherits label(src)' lookups against the SAME label
      // table — unioned into one edge set they need one join instead of
      // two (two broadcast builds + probes per round before; the fused
      // multiset feeds the same min, so labels are identical round for
      // round)
      val jump = labels.select(col("label").as("id_a"), col("id").as("id_b"))
      val viaBoth = sym.unionByName(jump)
        .join(labels.withColumnRenamed("id", "id_a"), "id_a")
        .select(col("id_b").as("id"), col("label"))
      val next = labels.withColumn("_self", lit(1))
        .unionByName(viaBoth.withColumn("_self", lit(0)))
        .groupBy("id")
        .agg(min(col("label")).as("label"),
          // every id occurs exactly once in the labels branch, so this
          // recovers its previous label for the in-pass convergence check
          max(when(col("_self") === 1, col("label"))).as("_old"))
        .localCheckpoint(eager = false)
      // the ONE action of the round: materializes the checkpoint and counts
      val changed = next.filter(col("label") =!= col("_old")).count()
      labels = next.select("id", "label")
      converged = changed == 0
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dupClusters did not converge in $maxIter rounds (component deeper " +
          s"than ~2^$maxIter); clusters may be split")
    labels
  }

  /** WINNOWING fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): from each doc's ordered k-token shingle-hash stream,
    * keep the MINIMUM of every w-hash sliding window — a deterministic
    * ~1/w-rate sample with the winnowing GUARANTEE that any shared run of
    * ≥ w+k−1 tokens yields a shared fingerprint (a random 1/w sample has
    * no such promise; a full shingle index is w× bigger). Pairs sharing
    * ≥ `minShared` fingerprints are candidate plagiarism/mirror pairs.
    *
    * Fingerprints are VALUE sets (positions dropped, duplicates
    * collapsed), so window tie-breaking never matters — the set is a pure
    * function of the hash stream on any engine. The windowed min is
    * row-local (O(len·w) per doc, w small); the pair stage is the
    * standard capped inverted index — `maxFingerprintFreq` drops
    * boilerplate fingerprints whole, the maxShingleFreq pattern.
    *
    * Output: (id_a, id_b, n_shared). */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, maxFingerprintFreq: Int = 100,
      minShared: Long = 2L): DataFrame = {
    require(k >= 1 && w >= 2, s"need k >= 1 and w >= 2, got k=$k w=$w")
    // the native one-pass expression: RAW ordered hash stream (duplicates
    // included — set semantics would change window contents), monotonic-
    // deque sliding min, distinct values; docs too short for one full
    // window return an empty array and explode to nothing. The builtin
    // composition (per-position md5 lambdas + windowed array_min) is
    // spec-asserted ≡ and was 3× slower end-to-end at sf1~.
    val fps = df
      .select(col(idCol).cast("long").as("id"),
        explode(call_function("winnow_fps", col(textCol), lit(k), lit(w)))
          .as("fp"))
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxFingerprintFreq).select("fp")
    val capped = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Winnow-backed near-dup pairs — the 1/w-INDEX replacement for
    * [[jaccardPairs]] when the full shingle inverted index is the
    * bottleneck (its posting stream is every shingle of every doc; at 10×
    * corpus it shuffles superlinearly — SCALE.md): [[winnowPairs]]
    * fingerprints (~1/w of the shingle stream, with the winnowing
    * GUARANTEE that any shared token run of ≥ w+n−1 yields a shared
    * fingerprint) generate the candidates, then each candidate pair is
    * verified with its EXACT n-gram Jaccard — same join-back shape as
    * [[lshJaccardPairs]], so every emitted pair carries the same exact
    * `jaccard` the full index would have computed.
    *
    * Recall contract: a true pair is missed only if the two docs share NO
    * token run of length ≥ w+n−1 surviving the `maxFingerprintFreq`
    * boilerplate cap — near-dup pairs at meaningful thresholds share long
    * runs by construction, and the guarantee (unlike MinHash's
    * probabilistic bands) is deterministic. Output ⊆ [[jaccardPairs]] at
    * the same threshold, with equality whenever every qualifying pair
    * shares such a run (spec-pinned; oracle-replayed end-to-end). */
  def winnowJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, w: Int = 4,
      maxFingerprintFreq: Int = 100, minShared: Long = 1L): DataFrame = {
    val cands = winnowPairs(df, idCol, textCol, n, w, maxFingerprintFreq,
      minShared).select("id_a", "id_b")
    // NOTE (r18, measured): restricting this projection to candidate docs
    // via a semi-join on the candidate id set was tried and REVERTED —
    // computing the id set re-runs the posting pipeline (+11 MB shuffle,
    // +1 s at sf1~ even with the ids broadcast), while the "second md5
    // pass" it would save isn't one: AQE broadcasts the small pair side
    // into these joins, so `sets` streams the corpus exactly once with no
    // verification-set shuffle, and on dup-heavy corpora every doc is a
    // candidate anyway (sf0.1: 5000/5000 docs in 334k candidate pairs).
    val sets = df.select(col(idCol).as("_sid"),
      call_function("shingle_hashes", col(textCol), lit(n)).as("_sh"))
    cands
      .join(sets.select(col("_sid").as("id_a"), col("_sh").as("_sh_a")), "id_a")
      .join(sets.select(col("_sid").as("id_b"), col("_sh").as("_sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("long")
          .as("inter"),
        size(col("_sh_a")).cast("long").as("size_a"),
        size(col("_sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") > threshold)
  }

  /** Winnow-based EVAL-SET decontamination — the shared-RUN form of
    * `TextAnalysis.contaminationScore`: a training doc is flagged when it
    * shares ≥ `minShared` winnowing fingerprints with the benchmark/eval
    * corpus, which by the winnowing guarantee catches EVERY doc sharing a
    * verbatim token run of ≥ w+n−1 with any eval doc (the long-quote
    * leakage that actually moves benchmark numbers), at ~1/w the gram
    * surface of the full n-gram overlap scan. Returns
    * (id, n_shared_fps, n_fps, shared_frac_e6) for FLAGGED docs only;
    * [[removeContaminatedByRuns]] is the drop action.
    *
    * Scale shape: the eval fingerprint set is distinct'd and BROADCAST
    * (eval sets are tiny next to a training corpus), so the only shuffle
    * is the per-doc count — the corpus is scanned once, there is no pair
    * stage at all. No frequency cap: dropping a hot fingerprint could
    * hide real leakage, and the broadcast side is eval-sized anyway. */
  def winnowContamination(docs: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String, n: Int, w: Int,
      minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1, got $minShared")
    val evalFps = evalDf
      .select(explode(call_function("winnow_fps", col(evalTextCol),
        lit(n), lit(w))).as("fp"))
      .distinct()
      .withColumn("_hit", lit(1L))
    docs
      .select(col(idCol).as("id"),
        explode(call_function("winnow_fps", col(textCol), lit(n), lit(w)))
          .as("fp"))
      .join(broadcast(evalFps), Seq("fp"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_fps"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
      .withColumn("shared_frac_e6",
        expr("n_shared_fps * 1000000L div n_fps"))
      .select("id", "n_shared_fps", "n_fps", "shared_frac_e6")
  }

  /** The decontamination ACTION: drop every doc [[winnowContamination]]
    * flags; docs too short to fingerprint are kept (nothing to match). */
  def removeContaminatedByRuns(docs: DataFrame, idCol: String,
      textCol: String, evalDf: DataFrame, evalTextCol: String,
      n: Int, w: Int, minShared: Long = 1L): DataFrame =
    docs.join(
      winnowContamination(docs, idCol, textCol, evalDf, evalTextCol,
        n, w, minShared).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** INCREMENTAL cluster maintenance: fold a batch of newly-discovered
    * near-dup pairs into an existing (id, label) clustering without
    * re-running pair GENERATION over the historical corpus — the
    * labels-side counterpart of `dedupeAgainstCorpus`'s incremental pair
    * discovery. An old clustering is exactly a star forest (every member
    * points at its min-id label), so components of
    * {star edges} ∪ {new pairs} are precisely the components of
    * {all old pairs} ∪ {new pairs}: star edges preserve old connectivity
    * (anything transitively linked before stays linked through the
    * label), and closure handles bridges the new pairs create between
    * old clusters. Labels stay min-id canonical.
    *
    * Scale shape: the closure input is dup-membership + |new pairs| sized
    * (≪ corpus — docs in no cluster never enter), and [[dupClusters]]'s
    * pointer-jumping rounds do the rest. Oracle-checked as ≡ a full
    * recompute over the union of all pairs (q165). */
  def mergeClusters(oldLabels: DataFrame, newPairs: DataFrame): DataFrame = {
    val starEdges = oldLabels
      .filter(col("id") =!= col("label"))
      .select(col("id").as("id_a"), col("label").as("id_b"))
    dupClusters(starEdges.unionByName(
      newPairs.select(col("id_a"), col("id_b"))))
  }

  /** Near-dup pairs AT SCALE: MinHash-LSH candidate generation followed by
    * exact Jaccard verification of the candidates only — the linear-shuffle
    * replacement for `jaccardPairs`' full inverted-index pair expansion when
    * stop-shingle frequency caps aren't enough. Approximate only in LSH
    * recall (a true pair missing every band is skipped); every returned pair
    * carries its EXACT Jaccard. Intersections run on the docs' 32-bit
    * shingle-hash sets (one compiled pass per side; a cross-shingle hash
    * collision inflating `inter` needs ~2³² shingles in one doc — ignored). */
  def lshJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      numHashes: Int = 8,
      numBands: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val cands = lshCandidates(df, idCol, textCol, numHashes, numBands, n,
      maxBucketSize)
    val sets = df.select(col(idCol).as("_sid"),
      call_function("shingle_hashes", col(textCol), lit(n)).as("_sh"))
    cands
      .join(sets.select(col("_sid").as("id_a"), col("_sh").as("_sh_a")), "id_a")
      .join(sets.select(col("_sid").as("id_b"), col("_sh").as("_sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("long").as("inter"),
        size(col("_sh_a")).cast("long").as("size_a"),
        size(col("_sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") > threshold)
  }

  /** Cross-source duplication report: near-dup clusters annotated with how
    * many documents and distinct SOURCES they span, keeping only clusters
    * that cross a source boundary — the "which domains mirror each other"
    * signal that decides whether deduplication should run per-source or
    * corpus-wide, and which crawls are republishing each other's content.
    * Output: (label, n_docs, n_sources), label = the cluster's min doc id.
    * One join of the (clusters-sized) label frame back to the corpus plus
    * one grouped count — everything upstream is the standard linear-shuffle
    * pair/closure machinery. */
  def crossSourceDupReport(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int, threshold: Double,
      maxShingleFreq: Int = Int.MaxValue): DataFrame =
    crossSourceDupReportFromPairs(df, idCol, sourceCol,
      jaccardPairs(df, idCol, textCol, n, maxShingleFreq)
        .filter(col("jaccard") > threshold)
        .select("id_a", "id_b"))

  /** [[crossSourceDupReport]]'s report stage over CALLER-SUPPLIED pairs —
    * the seam that lets any candidate generator (full index, LSH,
    * [[winnowJaccardPairs]]) feed the same closure + source rollup. */
  def crossSourceDupReportFromPairs(df: DataFrame, idCol: String,
      sourceCol: String, pairs: DataFrame): DataFrame =
    dupClusters(pairs.select("id_a", "id_b"))
      .join(df.select(col(idCol).as("id"), col(sourceCol).as("_src")), "id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("_src")).as("n_sources"))
      .filter(col("n_sources") >= 2)

  /** The dedup ACTION: drop every doc that belongs to a near-dup cluster
    * but is not its canonical (min-id) member. Docs in no cluster are kept. */
  def removeNearDupes(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame = {
    val losers = clusters.filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware canonical selection: keep each near-dup cluster's
    * HIGHEST-`scoreCol` member (ties to the smallest id) instead of
    * [[removeNearDupes]]'s min-id representative — near-dup groups usually
    * hold one clean original and N degraded mirrors, and min-id keeps
    * whichever crawled first, not whichever is best. Non-clustered rows
    * pass through untouched.
    *
    * Scale shape: `clusters` is dup-membership-sized (≪ corpus); the
    * cluster frame joins by id, and the per-cluster argmax window
    * partitions by label — bounded by cluster size, which near-dup
    * semantics keep small (a giant cluster means the threshold is wrong,
    * not the engine). One broadcast-eligible join + one bounded window +
    * one anti-join. */
  def removeNearDupesKeepBest(df: DataFrame, idCol: String,
      clusters: DataFrame, scoreCol: String): DataFrame = {
    val members = df.select(col(idCol).as("id"), col(scoreCol).as("_score"))
      .join(clusters, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
      .orderBy(col("_score").desc, col("id"))
    val losers = members
      .withColumn("_rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rk") > 1)
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** End-to-end embedding near-dedup AT SCALE — the production path: LSH
    * sign-hash buckets (deterministic md5-derived hyperplanes, native
    * `vec_lsh_bucket`) prune cosine pair generation to within-bucket joins,
    * then connected components pick the min-id survivors. Every shuffle is
    * linear in the corpus; there is no all-pairs stage anywhere (the exact
    * `Similarity.cosineDupes` composition is the recall baseline this is
    * judged against — q62 vs q64).
    *
    * Output is IDENTICAL to the exact composition whenever every
    * above-threshold pair lands in one bucket (spec-asserted at a
    * recall-complete setting); otherwise approximate only in LSH recall —
    * fewer planes → bigger buckets → higher recall, more compute. */
  def removeNearDupesLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int, dim: Int): DataFrame = {
    val pairs = graft.similarity.Similarity
      .lshCosineDupes(df, idCol, vecCol, threshold, numPlanes, dim)
      .select("id_a", "id_b")
    removeNearDupes(df, idCol, dupClusters(pairs))
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): k-means clusters
    * the embedding space (fixed-point Lloyd — deterministic, oracle-able),
    * then cosine pairs are generated only WITHIN each cluster and
    * above-threshold components keep their min-id survivor. The clustering
    * carries the semantic prior LSH sign-buckets lack: two paraphrases
    * land in one k-means cell because they are CLOSE, not because they
    * share random hyperplane signs — the trade is a training pass (one
    * scan + one keyed shuffle per Lloyd round) for bucket boundaries that
    * follow the data.
    *
    * Scale shape: assignment is row-local against broadcast centroids; the
    * pair join shuffles on the cluster id; within-cluster pairing is
    * quadratic in CELL size — k is the knob (grow it with the corpus to
    * hold cells flat, exactly like num_planes for LSH; the paper runs
    * k≈corpus/10k). No all-pairs stage anywhere.
    *
    * `threshold` compares the RAW double cosine, same boundary semantics
    * as [[removeNearDupesLsh]] / `Similarity.cosineDupes` — switching
    * strategies in config never shifts which boundary pairs count.
    *
    * Zero-norm vectors are EXCLUDED from pairing explicitly (and therefore
    * always survive): cosine is undefined at norm 0, and leaving the
    * division to the engine would make the outcome an accident of division
    * semantics (Spark's non-ANSI divide yields null → never pairs; DuckDB
    * yields NaN/inf) — the explicit filter makes "zero vectors keep
    * themselves" the documented cross-engine contract, the same posture
    * gapFillDaily takes on null days. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    import graft.similarity.Similarity
    val cents = Similarity.kMeansCentroidsExact(df, idCol, vecCol, k, iters)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", Similarity.norm(col("vec")))
      .filter(col("nrm") > lit(0.0))
      .withColumn("cell", Similarity.ivfBucket(col("vec"), cents))
    val a = bucketed.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("norm_a"))
    val b = bucketed.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("norm_b"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        Similarity.dot(col("vec_a"), col("vec_b"))
          / (col("norm_a") * col("norm_b")))
      .filter(col("sim") > lit(threshold))
      .select("id_a", "id_b")
    removeNearDupes(df, idCol, dupClusters(pairs))
  }

  /** (id, sig) table of 32-bit simhashes via the native expression. */
  private def simHashSigs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("_th", tokenHashes(col(textCol)))
      .select(col(idCol).as("id"),
        call_function("simhash32", col("_th")).as("sig"))

  /** SimHash near-dup pairs: all (a < b) with hamming ≤ maxHamming, found by
    * bit-BANDING (Manku et al., the standard simhash blocking trick) — never
    * an all-pairs scan. The 32 signature bits split into maxHamming+1
    * contiguous bands; by pigeonhole, two sigs within maxHamming differing
    * bits must agree EXACTLY on at least one band, so bucketing each sig by
    * its (band index, band bits) and pairing only within buckets finds every
    * qualifying pair — identical output to the quadratic scan (spec-asserted),
    * shuffle keyed on (band, bits) instead of a cartesian join. Sigs ride in
    * the posting structs so the hamming filter needs no join-back. */
  /** Band-blocked hamming pairs over a (id, sig) table with `sigBits`-bit
    * signatures: maxHamming+1 contiguous bit bands, bucket-join on
    * (band index, band bits), exact hamming filter. The pigeonhole core
    * shared by the 32- and 64-bit simhash paths. */
  private def bandedHammingPairs(sigs: DataFrame, sigBits: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < sigBits,
      s"need 0 <= maxHamming < $sigBits, got $maxHamming")
    val nBands = maxHamming + 1
    val bands = (0 until nBands).map { i =>
      val lo = i * sigBits / nBands
      val width = (i + 1) * sigBits / nBands - lo
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(i).as("band_idx"),
        shiftrightunsigned(col("sig"), lo).bitwiseAND(lit(mask))
          .as("band_bits"))
    }
    val postings = sigs
      .select(explode(array(bands: _*)).as("bk"),
        struct(col("id"), col("sig")).as("m"))
      .groupBy("bk").agg(sort_array(collect_list(col("m"))).as("ids"))
    bucketPairs(postings, "ids")
      .select(col("id_a.id").as("id_a"), col("id_a.sig").as("sig_a"),
        col("id_b.id").as("id_b"), col("id_b.sig").as("sig_b"))
      .distinct() // a pair may agree on several bands
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame =
    bandedHammingPairs(simHashSigs(df, idCol, textCol), 32, maxHamming)

  /** 64-bit variant via the native `simhash64(text)` expression: bands stay
    * ≥ 9 bits out to radius 6, so the bucket join keeps pruning at the radii
    * where 32-bit bands (≤ 8 bits past radius 3) degenerate. Prefer this for
    * real near-dup radii; the 32-bit form matches the reference-width
    * fingerprint. */
  def simHashPairs64(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
        call_function("simhash64", col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
    bandedHammingPairs(sigs, 64, maxHamming)
  }

  /** The quadratic all-pairs form — the correctness baseline the banded path
    * is spec-asserted against. Never use beyond test corpora. */
  def simHashPairsBrute(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, bits: Int = 32): DataFrame = {
    val sigs =
      if (bits == 32) simHashSigs(df, idCol, textCol)
      else df.select(col(idCol).as("id"),
          call_function("simhash64", col(textCol)).as("sig"))
        .filter(col("sig").isNotNull)
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}

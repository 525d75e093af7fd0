package graft

import graft.config._
import graft.dedup.Dedup
import graft.gold.{AggregationEngine, IncrementalMaterializer}
import graft.ops.{AsofJoin, Baskets, Fuzzy, Grouping, Joins, Pareto, Retention, Sessions}
import graft.quality.{Anomaly, Checks, ErrorTracking, Kmv, Reconciliation, Sketches}
import graft.multimodal.Multimodal
import graft.silver.Transform
import graft.similarity.Similarity
import graft.tables.Tables
import graft.text.{BpeTrainer, Chunking, Curation, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle in `oracleSql`.
  *
  * Determinism rules for oracle parity (Spark vs DuckDB on the same parquet):
  *  - money aggregates go through exact DECIMAL sums, cast to DOUBLE at the
  *    end (double summation is order-dependent; decimal is exact);
  *  - event timestamps are compared in MICROseconds (`ts div 1000` ≡
  *    DuckDB `epoch_us(ts)`) because DuckDB truncates the file's NANOS
  *    precision to µs at read while Spark keeps the raw long;
  *  - derived integers are cast to BIGINT on both sides (DuckDB year()/
  *    dayofweek() return BIGINT, Spark returns INT);
  *  - Spark dayofweek() is 1=Sunday; DuckDB dayofweek() is 0=Sunday → +1;
  *  - every result carries a total ORDER BY on a unique key set.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---- shared expression fragments -------------------------------------

  /** exact sum of a money column: decimal-sum then double. */
  private def dsum(c: String, scale: Int = 2): String =
    s"cast(sum(cast($c as decimal(18,$scale))) as double)"

  /** The q04 revenue mart model — shared with q53, which re-aggregates the
    * mart this model builds through the same engine (A11). */
  private lazy val revenueStatsModel = GoldModel(
    name = "revenue_stats",
    groupBy = Seq(
      "cast(year(l_shipdate) as bigint) as year",
      "cast(month(l_shipdate) as bigint) as month",
      "l_returnflag"),
    measures = Seq(
      Measure("total_items", "count(1)"),
      Measure("sum_base_price", dsum("l_extendedprice")),
      Measure("sum_disc_amount", dsum("l_extendedprice * l_discount", 4)),
      Measure("avg_base_price", s"${dsum("l_extendedprice")} / count(l_extendedprice)"),
      Measure("disc_pct",
        s"case when sum(cast(l_extendedprice as decimal(18,2))) > 0 " +
        s"then ${dsum("l_extendedprice * l_discount", 4)} / ${dsum("l_extendedprice")} * 100 " +
        s"else cast(0 as double) end")),
    orderBy = Seq("year", "month", "l_returnflag"))

  /** Deterministic synthetic URL from doc_id arithmetic — mixed-case
    * schemes/hosts, www/cdn subdomains, default and custom ports, trailing
    * slashes, tracking params, fragments; shared by q232 (normalization)
    * and q238 (canonical-URL dedup), replayed as identical CASE chains in
    * both oracles. */
  private def syntheticUrl: Column = {
    val id = col("doc_id")
    concat(
      when(id % 3 === 0, "HTTPS").when(id % 3 === 1, "http")
        .otherwise("https"),
      lit("://"),
      when(id % 4 === 0, "WWW.").when(id % 4 === 1, "")
        .when(id % 4 === 2, "www.").otherwise("cdn."),
      col("source"), lit("-"), id % 5,
      when(id % 3 === 0, ".CO.UK").when(id % 3 === 1, ".com")
        .otherwise(".org"),
      when(id % 4 === 0, ":443").when(id % 4 === 1, ":80")
        .when(id % 4 === 2, ":8080").otherwise(""),
      when(id % 2 === 0, concat(lit("/a/"), id % 7, lit("/")))
        .otherwise(lit("/p")),
      when(id % 3 === 0,
        concat(lit("?utm_source=feed&q="), id % 10, lit("&fbclid=zz")))
        .when(id % 3 === 1, concat(lit("?q="), id % 10))
        .otherwise(lit("")),
      when(id % 2 === 0, "#top").otherwise(""))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A5/P4 — TPC-H Q1-style pricing summary (hash agg, map-side partial)
    "q01_pricing_summary" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.load(s, dir, "lineitem"),
        GoldModel(
          name = "pricing_summary",
          groupBy = Seq("l_returnflag", "l_linestatus"),
          measures = Seq(
            Measure("count_order", "count(1)"),
            Measure("sum_qty", "sum(l_quantity)"),
            Measure("sum_base_price", dsum("l_extendedprice")),
            Measure("sum_disc_price", dsum("l_extendedprice * (1 - l_discount)", 4)),
            Measure("avg_qty", "sum(l_quantity) / count(l_quantity)"),
            Measure("avg_price", s"${dsum("l_extendedprice")} / count(l_extendedprice)")),
          filters = Seq("l_shipdate <= timestamp'1999-12-31 00:00:00'"),
          orderBy = Seq("l_returnflag", "l_linestatus")))
    }),

    // A1 analogue of gold daily_trip_stats on events (year/month/dow keys)
    "q02_daily_stats" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.events(s, dir),
        GoldModel(
          name = "daily_stats",
          groupBy = Seq(
            "cast(year(ts_utc) as bigint) as year",
            "cast(month(ts_utc) as bigint) as month",
            "cast(dayofweek(ts_utc) as bigint) as day_of_week",
            "event_type"),
          measures = Seq(
            Measure("total_events", "count(1)"),
            Measure("sum_value", dsum("value")),
            Measure("avg_value", s"${dsum("value")} / count(value)"),
            Measure("min_value", "min(value)"),
            Measure("max_value", "max(value)")),
          orderBy = Seq("year", "month", "day_of_week", "event_type")))
    }),

    // A2 analogue of gold hourly_location_analysis
    "q03_hourly_stats" -> ((s, dir) => {
      AggregationEngine.build(
        Tables.events(s, dir),
        GoldModel(
          name = "hourly_stats",
          groupBy = Seq(
            "event_type",
            "cast(hour(ts_utc) as bigint) as hour_of_day"),
          measures = Seq(
            Measure("total_events", "count(1)"),
            Measure("sum_value", dsum("value")),
            Measure("avg_value", s"${dsum("value")} / count(value)")),
          orderBy = Seq("event_type", "hour_of_day")))
    }),

    // A3 analogue of revenue_by_payment_type incl. the dbt CASE-WHEN ratio
    "q04_revenue_stats" -> ((s, dir) =>
      AggregationEngine.build(Tables.load(s, dir, "lineitem"), revenueStatsModel)),

    // A11 — second-level mart rollup: the q04 revenue mart re-aggregated
    // BY THE SAME ENGINE, mirroring the Superset revenue_trends metrics
    // (reference superset/dashboards/revenue_trends.json: SUM(total_revenue)
    // / AVG(avg_fare) big numbers over the gold tables). Double mart
    // columns are rounded to e6 integers BEFORE the second-level sum so
    // the rollup is order-independent and cross-engine exact (a raw
    // sum(double) re-associates differently between engines).
    "q53_mart_rollup" -> ((s, dir) => {
      // only the three mart columns the rollup reads — carrying q04's
      // unused disc measures through the first-level agg is wasted work
      val mart = AggregationEngine.build(Tables.load(s, dir, "lineitem"),
        revenueStatsModel.copy(orderBy = Nil,
          measures = revenueStatsModel.measures.filter(m =>
            Set("total_items", "sum_base_price", "avg_base_price")(m.name))))
      AggregationEngine.build(mart, GoldModel(
        name = "revenue_trends_yearly",
        groupBy = Seq("year"),
        measures = Seq(
          Measure("months", "count(1)"),
          Measure("total_items", "sum(total_items)"),
          Measure("total_revenue_e6",
            "sum(cast(round(sum_base_price * 1000000) as bigint))"),
          Measure("avg_price_e6",
            "sum(cast(round(avg_base_price * 1000000) as bigint)) div count(1)")),
        orderBy = Seq("year")))
    }),

    // A11 — distinct-count mart rollup mirroring location_hotspots.json's
    // COUNT(DISTINCT pickup_location_id)-style big numbers: the hourly
    // mart re-aggregated BY THE SAME ENGINE per event_type. All-bigint
    // measures — no doubles anywhere — so the rollup is exactly
    // deterministic cross-engine without rounding tricks.
    "q55_mart_hotspots" -> ((s, dir) => {
      val mart = AggregationEngine.build(
        Tables.events(s, dir),
        GoldModel(
          name = "hourly_counts",
          groupBy = Seq("event_type",
            "cast(hour(ts_utc) as bigint) as hour_of_day"),
          measures = Seq(Measure("total_events", "count(1)"))))
      AggregationEngine.build(mart, GoldModel(
        name = "hotspot_rollup",
        groupBy = Seq("event_type"),
        measures = Seq(
          Measure("active_hours", "count(distinct hour_of_day)"),
          Measure("total_events", "sum(total_events)"),
          Measure("busiest_hour_events", "max(total_events)")),
        orderBy = Seq("event_type")))
    }),

    // J1 — double dimension enrichment (broadcast), zones-style aliasing
    "q05_enrich_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      val prt = Tables.load(s, dir, "part").select("p_partkey", "p_name", "p_brand")
      val e1 = Joins.enrich(li, sup, "l_suppkey", "s_suppkey", "sup")
      val e2 = Joins.enrich(e1, prt, "l_partkey", "p_partkey", "prt")
      e2.select(col("l_orderkey"), col("l_linenumber"),
          col("sup_s_name").as("supplier_name"),
          col("prt_p_name").as("part_name"),
          col("prt_p_brand").as("part_brand"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J2 — join + group-agg + order + limit (top segments)
    "q06_top_segments" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_count"),
          (expr(dsum("o_totalprice")) / count(col("o_totalprice"))).as("avg_price"))
        .orderBy(col("order_count").desc, col("c_mktsegment"))
        .limit(15)
    }),

    // J3 — two-hop broadcast join chain + top-k (routes analogue)
    "q07_nation_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("order_count"),
          expr(dsum("o_totalprice")).as("total_price"))
        .orderBy(col("order_count").desc, col("n_name"))
        .limit(10)
    }),

    // D1 — keyed dedupe keep-first-by-order (row_number window)
    "q08_dedupe" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      Transform.dedupe(DedupeSpec(
        keys = Seq("user_id", "event_type"),
        orderBy = Seq("ts_us DESC", "event_id DESC")))(ev)
        .select("user_id", "event_type", "event_id", "ts_us")
        .orderBy("user_id", "event_type")
    }),

    // D3 — distinct key projection
    "q09_distinct_pairs" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    }),

    // J4/SET1 — anti-join key integrity (customers with no orders)
    "q10_missing_keys" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_custkey", "c_custkey")
      Joins.missingKeys(c, o, Seq("c_custkey")).orderBy("c_custkey")
    }),

    // O1/O2 — global top-k (TakeOrderedAndProject, no full sort)
    "q11_topk_orders" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // W1/Q12 — moving average over a 7-row window frame (exact via decimal)
    "q12_moving_avg" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-6, 0)
      ev.withColumn("mov_sum", sum(expr("cast(value as decimal(18,2))")).over(w))
        .withColumn("mov_cnt", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"),
          (col("mov_sum").cast("double") / col("mov_cnt")).as("mov_avg"))
        .orderBy("event_id")
    }),

    // P1/P2/P4/P5 — silver chain: rename → cast → filter (incl col-vs-col).
    // The compared cast is double→bigint on integral quantities (lossless and
    // identical across engines); double→decimal casts round differently in
    // Spark vs DuckDB on half-way binary doubles, so decimal casts are
    // exercised in TransformSpec, not in an oracle-compared projection.
    "q13_silver_chain" -> ((s, dir) => {
      Transform(SilverSpec(
        renames = Seq("l_extendedprice" -> "price", "l_quantity" -> "qty"),
        casts = Seq(CastSpec("qty", "bigint")),
        filters = Seq("qty > 0", "l_discount < l_tax",
          "l_shipdate < timestamp'2001-01-01 00:00:00'")))(
        Tables.load(s, dir, "lineitem"))
        .select("l_orderkey", "l_linenumber", "price", "qty")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Q1 — one-pass null-count profile
    "q14_null_counts" -> ((s, dir) =>
      Checks.nullCounts(Tables.load(s, dir, "events"),
        Seq("event_id", "user_id", "event_type", "value"))),

    // Q3 — one-pass range-violation counts
    "q15_range_check" -> ((s, dir) =>
      Checks.rangeViolations(Tables.load(s, dir, "lineitem"),
        Seq(RangeCheck("l_quantity", Some(1.0), Some(50.0)),
          RangeCheck("l_discount", Some(0.0), Some(0.1))))),

    // Q4 — in-set membership violation count
    "q16_inset_check" -> ((s, dir) =>
      Checks.notInSetCounts(Tables.load(s, dir, "events"),
        Seq(InSetCheck("event_type", Seq("click", "view", "purchase"))))),

    // A10 — conditional count (count CASE WHEN)
    "q17_conditional_agg" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(count(when(col("value") > 100, 1)).as("high_value_events"),
          count(lit(1)).as("total_events"))
        .orderBy("event_type")
    }),

    // SET2 — unionByName of two slices then aggregate
    "q18_union_slices" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val early = o.filter("o_orderdate < timestamp'1997-01-01 00:00:00'")
      val late = o.filter("o_orderdate >= timestamp'1999-01-01 00:00:00'")
      early.unionByName(late)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderstatus")
    }),

    // SET1 — EXCEPT on distinct keys
    // EXCEPT over day-1 signup vs error user sets — scoped to one
    // calendar day so the difference is genuinely non-empty (the r12
    // vacuity audit caught the original all-users form returning 0 rows
    // at every SF: this generator gives every user an error event).
    "q19_except_users" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("day", expr("ts div 86400000000000"))
      ev.filter(col("event_type") === "signup" && col("day") === 19723L)
        .select("user_id").distinct()
        .except(ev.filter(col("event_type") === "error" && col("day") === 19723L)
          .select("user_id").distinct())
        .orderBy("user_id")
    }),

    // P3/§2.7 — scalar-function surface (date parts, CASE, COALESCE, BETWEEN)
    "q20_scalar_funcs" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        expr("cast(year(ts_utc) as bigint)").as("y"),
        expr("cast(month(ts_utc) as bigint)").as("m"),
        expr("cast(dayofweek(ts_utc) as bigint)").as("dow"),
        expr("cast(hour(ts_utc) as bigint)").as("h"),
        expr("ts div 1000000000").as("epoch_sec"),
        expr("case when value between 0 and 100 then 'low' " +
          "when value <= 300 then 'mid' else 'high' end").as("val_bucket"),
        coalesce(nullif(col("event_type"), lit("error")), lit("none")).as("etype"),
        abs(col("value") * lit(-1)).as("abs_value"))
        .orderBy("event_id")
    }),

    // ---- training-data pipeline operators (documents / embeddings) -------

    // Text quality profile: token counts, lexical diversity, quality score.
    // Row-local expressions only — scales with the scan, zero shuffle.
    "q21_text_profile" -> ((s, dir) => {
      TextAnalysis.profile(Tables.load(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "n_unique_tokens", "ttr_e6",
          "avg_token_len_e6", "quality_score_e6")
        .orderBy("doc_id")
    }),

    // Language-ID heuristic: stopword-marker scores + winner-take-all with
    // fixed precedence. (The synthetic corpus has random lang labels; the
    // operator's contract is the deterministic heuristic, not label accuracy.)
    "q22_lang_id" -> ((s, dir) => {
      val c = col("text")
      Tables.load(s, dir, "documents").select(
        col("doc_id") +:
          TextAnalysis.langMarkers.map { case (l, m) =>
            TextAnalysis.langScore(c, m).cast("long").as(s"${l}_score") } :+
          TextAnalysis.langId(c).as("pred_lang") :+
          col("lang").as("labeled_lang"): _*)
        .orderBy("doc_id")
    }),

    // Document fingerprinting: content md5 + polynomial rolling hash.
    "q23_fingerprint" -> ((s, dir) => {
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        TextAnalysis.rollingHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id")
    }),

    // BPE-style pre-tokenization counts vs whitespace counts — the token
    // budgeting operator (whitespace undershoots on punctuated text).
    "q48_bpe_tokens" -> ((s, dir) => {
      val c = col("text")
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(c).cast("long").as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(c).cast("long").as("n_bpe_tokens"))
        .withColumn("bpe_ratio_e6",
          round(col("n_bpe_tokens").cast("double") /
            col("n_ws_tokens").cast("double") * 1e6).cast("long"))
        .orderBy("doc_id")
    }),

    // TF-IDF top-3 terms per document with integer-exact scoring
    // (tf·10⁶ div df — a float log-idf would differ in the last ulp
    // between libm implementations and break the hash compare).
    "q51_tfidf_terms" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.load(s, dir, "documents"),
        "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    // Per-group exact interpolated quantiles (the grouped form of q35).
    "q52_group_quantiles" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(expr("percentile(value, array(0.5, 0.9))").as("qs"))
        .select(col("event_type"),
          round(element_at(col("qs"), 1) * 1e6).cast("long").as("p50_e6"),
          round(element_at(col("qs"), 2) * 1e6).cast("long").as("p90_e6"))
        .orderBy("event_type")),

    // Exact dedup via hash-groupBy: duplicate the corpus under shifted ids,
    // dedupe keeps exactly the min-id copy of each distinct content.
    "q24_exact_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(10000L)))
      Dedup.dedupeExact(doubled, "doc_id", "text")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // JSON scalar extraction from the events.props payload column.
    "q25_json_kv" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(get_json_object(col("props"), "$.k")).as("n_k"))
        .orderBy("event_type")
    }),

    // n-gram Jaccard near-dup pairs (3-gram shingles, threshold 0.5). The
    // shingle-frequency cap (drop shingles shared by >100 docs) is the skew
    // guard that bounds pair expansion at scale — a stop-shingle in 10⁴ docs
    // would otherwise emit 10⁸ intersection rows. The oracle applies the
    // identical HAVING cap.
    "q26_ngram_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text", 3,
        maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
        .select(col("id_a"), col("id_b"), col("inter"), col("size_a"),
          col("size_b"), round(col("jaccard") * 1e6).cast("long").as("jaccard_e6"))
        .orderBy("id_a", "id_b")
    }),

    // MinHash(8) + LSH(4 bands × 2 rows) candidate near-dup pairs over
    // 3-gram shingles. Signatures are row-local array_min folds (no shuffle
    // until the band-bucket join).
    "q27_minhash_lsh" -> ((s, dir) => {
      Dedup.lshCandidates(Tables.load(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, numBands = 4, shingleN = 3)
        .orderBy("id_a", "id_b")
    }),

    // Brute-force cosine top-k ANN baseline: 20 query vectors × corpus.
    "q28_cosine_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // Embedding-cosine near-duplicate pairs above a similarity threshold.
    "q29_cosine_dupes" -> ((s, dir) => {
      Similarity.cosineDupes(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // Int8 embedding quantization: per-vector scale + code checksums + max
    // reconstruction error — every output integer-derived, hash-comparable.
    // One compiled pass per row via the native quantize_stats expression
    // (the composable HOF form traverses the vector ~6 interpreted times).
    "q49_embed_quantize" -> ((s, dir) => {
      Tables.load(s, dir, "embeddings")
        .withColumn("q", call_function("quantize_stats", col("embedding")))
        .select(
          col("vec_id"),
          round(col("q.scale") * 1e9).cast("long").as("scale_e9"),
          col("q.code_sum").as("code_sum"),
          col("q.code_min").as("code_min"),
          col("q.code_max").as("code_max"),
          round(col("q.max_err") * 1e6).cast("long").as("max_err_e6"))
        .orderBy("vec_id")
    }),

    // Q2 — positive-values check (one-pass conditional aggregate).
    "q50_positive_check" -> ((s, dir) =>
      Checks.nonPositiveCounts(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // ---- statistical quality / anomaly / reconciliation surface ----------

    // Q8 — z-score report from exact fixed-point sufficient statistics
    // (bit-reproducible across runs/partitionings, unlike FP stddev).
    "q30_zscore_stats" -> ((s, dir) =>
      Anomaly.zScoreReport(Tables.load(s, dir, "events"), "value", 3.0)),

    // Q12 — moving-average anomaly detection over a 7-row window per user.
    "q31_moving_anomaly" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
      Anomaly.movingAnomaly(ev, Seq("user_id"), Seq("ts_us", "event_id"), "value")
        .select("event_id", "user_id", "roll_n", "roll_mean", "roll_std", "is_anomaly")
        .orderBy("event_id")
    }),

    // Q10 — categorical frequency profile with rare-category flag.
    "q32_rare_categories" -> ((s, dir) =>
      Anomaly.categoryFrequencies(Tables.load(s, dir, "events"), "event_type", 0.15)
        .orderBy("event_type")),

    // Q14 — deterministic row-level error capture (top-k per rule by key).
    "q33_error_rows" -> ((s, dir) =>
      ErrorTracking.capture(
        Tables.load(s, dir, "lineitem"),
        Seq(
          ErrorTracking.ErrorRule("l_discount > 0.08", "l_discount", "range_check", "HIGH"),
          ErrorTracking.ErrorRule("l_quantity >= 49", "l_quantity", "range_check", "MEDIUM")),
        keyCols = Seq("l_orderkey", "l_linenumber"),
        maxPerRule = 100)
        .orderBy("column_name", "l_orderkey", "l_linenumber")),

    // S11 — incremental MERGE materialization: old mart (cutoff 1998-01-01)
    // + lookback recompute (from 1997-10-01) must equal the full rebuild,
    // which is exactly what the oracle computes.
    "q34_incremental_merge" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val model = GoldModel(
        name = "monthly_orders",
        groupBy = Seq(
          "cast(year(o_orderdate) as bigint) as year",
          "cast(month(o_orderdate) as bigint) as month"),
        measures = Seq(
          Measure("order_count", "count(1)"),
          Measure("total_price", dsum("o_totalprice"))))
      val oldMart = AggregationEngine.build(
        orders.filter("o_orderdate < timestamp'1998-01-01 00:00:00'"), model)
      val updates = AggregationEngine.build(
        orders.filter("o_orderdate >= timestamp'1997-10-01 00:00:00'"), model)
      IncrementalMaterializer.merge(oldMart, updates, Seq("year", "month"))
        .orderBy("year", "month")
    }),

    // A8/Q9 — exact interpolated quantiles (micro-unit ints absorb the
    // engines' last-ulp interpolation differences).
    "q35_exact_quantiles" -> ((s, dir) =>
      Anomaly.exactQuantiles(Tables.load(s, dir, "events"), "value",
        Seq(0.25, 0.5, 0.75, 0.9))
        .select(
          round(col("p25") * 1e6).cast("long").as("p25_e6"),
          round(col("p50") * 1e6).cast("long").as("p50_e6"),
          round(col("p75") * 1e6).cast("long").as("p75_e6"),
          round(col("p90") * 1e6).cast("long").as("p90_e6"))),

    // A9 — exact distinct counts (single and composite key).
    "q36_count_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "events").agg(
        countDistinct(col("user_id")).as("distinct_users"),
        countDistinct(col("event_type")).as("distinct_types"),
        countDistinct(col("user_id"), col("event_type")).as("distinct_pairs"))),

    // Q8 — z-score anomalous rows with severity tiers (CRITICAL>5σ /
    // HIGH>4σ / MEDIUM>3σ, anomaly_detection.py:108-116). The tier CASE
    // compares a bit-identical double (exact fixed-point stats) on both
    // engines, so it hash-matches.
    "q46_zscore_severity" -> ((s, dir) =>
      Anomaly.zScoreAnomalies(Tables.load(s, dir, "events"), "value", 3.0)
        .select(col("event_id"), col("value"),
          round(col("z_score") * 1e6).cast("long").as("z_e6"),
          col("severity"))
        .orderBy("event_id")),

    // Q9 — IQR-anomalous rows with distance severity tiers (CRITICAL>5 /
    // HIGH>3 / MEDIUM>2 IQR units, anomaly_detection.py:181-190) from
    // EXACT interpolated quantiles. Same cross-engine pattern as green
    // q46: the tier CASE compares a bit-identical double on both engines,
    // distance additionally e6-rounded.
    "q54_iqr_severity" -> ((s, dir) =>
      Anomaly.iqrAnomaliesExact(Tables.load(s, dir, "events"), "value")
        .select(col("event_id"), col("value"),
          round(col("iqr_distance") * 1e6).cast("long").as("dist_e6"),
          col("severity"))
        .orderBy("event_id")),

    // Q15-Q17 — engine-side reconciliation report (counts, exact decimal
    // sums, key integrity) between a table and its filtered "next layer".
    "q37_recon_report" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      Reconciliation.reportDF(
        orders, orders.filter("o_totalprice < 300000"),
        sumCol = "o_totalprice", keyCol = "o_orderkey", tolerancePct = 5.0)
        .orderBy("check_name")
    }),

    // ---- rows-only checked (no SQL oracle; deterministic, spec-covered) --

    // SimHash near-dup pairs (hamming ≤ 3 over 32-bit signatures), found by
    // bit-banding (4 bands × 8 bits), never an all-pairs scan. Radius 3 is
    // the selectivity limit of a 32-bit signature: a band must span ≥ 8 bits
    // for bucket keys to discriminate (wider radii want a 64-bit simhash).
    "q38_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(Tables.load(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("id_a", "id_b")),

    // 64-bit SimHash near-dup pairs at radius 6 via the native simhash64
    // expression — banded (7 bands ≥ 9 bits), the radius where 32-bit
    // banding stops pruning. Deterministic; spec-asserted ≡ all-pairs.
    "q47_simhash64_pairs" -> ((s, dir) =>
      Dedup.simHashPairs64(Tables.load(s, dir, "documents"), "doc_id", "text", 6)
        .orderBy("id_a", "id_b")),

    // Random-hyperplane LSH cosine near-dup pairs (the bucketed scale path
    // of q29; approximate by design → rows-only check + recall spec).
    "q39_lsh_cosine_dupes" -> ((s, dir) =>
      Similarity.lshCosineDupes(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4, numPlanes = 4, dim = 64)
        .orderBy("id_a", "id_b")),

    // IVF top-k ANN (16 k-means-refined centroids, probe 4): approximate
    // variant of q28; full-probe ≡ brute-force equivalence is spec-asserted.
    // Two Lloyd rounds tighten the quantizer (each round: one scan + one
    // keyed shuffle; only k×dim aggregates reach the driver).
    // IVF with TRAINED coarse centroids — fixed-point Lloyd
    // (kMeansCentroidsExact): integer micro-unit bucket sums make the
    // training loop order-independent, so the oracle unrolls BOTH Lloyd
    // iterations in SQL (seed → assign → exact mean → renormalize, twice)
    // and the whole path hash-compares — formerly the last rows-only entry.
    "q40_ivf_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.kMeansCentroidsExact(emb, "vec_id", "embedding",
        k = 16, iters = 2)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cents, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    // SemDeDup-style semantic dedup: fixed-point k-means cells → within-
    // cell cosine pairs → min-id survivors. The clustering carries the
    // semantic prior LSH sign-buckets lack (paraphrases land together
    // because they are CLOSE); exact Lloyd makes the whole pipeline —
    // training included — SQL-replayable.
    "q111_semantic_dedup" -> ((s, dir) =>
      Dedup.semanticDedup(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", k = 16, iters = 1, threshold = 0.4)
        .select("vec_id", "label")
        .orderBy("vec_id")),

    // EXACT two-sample KS distance between the view and purchase value
    // distributions — the unbinned twin of q84's histogram drift on the
    // same split. Integer deviations |n_b·cum_a − n_a·cum_b| per distinct
    // value; D divides two exact integers, bit-identical across engines.
    "q112_ks_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Anomaly.ksDrift(
        ev.filter(col("event_type") === "view").select("value"),
        ev.filter(col("event_type") === "purchase").select("value"),
        "value")
    }),

    // Per-event-type least-squares trend of daily value totals — is the
    // metric drifting and how fast. x = epoch day (ts div 86400e9 on
    // exact nanos), y = exact e6 micro-unit daily sums; the fit's
    // sufficient statistics are all-BIGINT, the slope a double over two
    // small exact integers.
    "q113_trend_slopes" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(round(col("value") * lit(1e6)).cast("long")).as("y_e6"))
      Anomaly.linearTrend(daily, Seq("event_type"), "day", "y_e6")
        .orderBy("event_type")
    }),

    // Incremental cardinality via mergeable HLL sketches: per-day sketches
    // union-merged per event_type must estimate IDENTICALLY to a one-shot
    // sketch (union is register-wise max — lossless for same lgK), and the
    // estimate must sit within 5% of the exact distinct count. Estimates
    // are engine-local (DataSketches), so the oracle compares the exact
    // count and the two invariant booleans — the q41 bounds-check pattern.
    "q114_cardinality_audit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val daily = Sketches.distinctSketches(
        ev.withColumn("day", expr("ts div 86400000000000")),
        Seq("event_type", "day"), "user_id")
      val merged = Sketches.mergeSketches(daily, Seq("event_type"))
        .select(col("event_type"), Sketches.estimate(col("sketch")).as("n_merged"))
      Sketches.cardinalityAudit(ev, Seq("event_type"), "user_id")
        .join(merged, "event_type")
        .select(col("event_type"), col("n_exact"), col("within_tol"),
          (col("n_merged") === col("n_est")).as("merge_exact"))
        .orderBy("event_type")
    }),

    // Crosstab: docs per (lang × source) as one row per lang with one
    // column per source — explicit pivot values, so the plan is ONE
    // grouped aggregate with a stable schema (no discovery scan). Absent
    // combinations stay null on both engines.
    "q115_crosstab" -> ((s, dir) =>
      Transform.crosstab(Tables.load(s, dir, "documents"),
        "lang", "source", (0 until 20).map(i => s"src$i"), count(lit(1)))
        .orderBy("lang")),

    // CCNet/C4-style segment-level boilerplate REMOVAL: 2-token segments
    // appearing in ≥ 25 documents are dropped and the surviving segments
    // reassemble in order — the destructive twin of q80's scoring. The
    // whole rewrite (segmentation, df counting, reassembly, micro-unit
    // fraction) hash-compares against the SQL replay.
    "q116_strip_boilerplate" -> ((s, dir) =>
      Curation.stripBoilerplateSegments(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        segTokens = 2, maxDf = 25)
        .orderBy("doc_id")),

    // Key-skew profile of events.user_id — the measurement that sizes
    // saltedJoin: top-20 heaviest keys with exact counts, micro-unit
    // shares, the max/avg skew ratio, and the salt factor capping the
    // hottest key at 500 rows/task (small target so the factor is
    // non-trivial at test SF).
    "q117_key_skew" -> ((s, dir) =>
      graft.ops.Scale.keySkewProfile(Tables.events(s, dir),
        Seq("user_id"), topK = 20, targetPartitionRows = 500L)
        .orderBy("rnk")),

    // Embedding centroid drift between two snapshots (vec_id parity split)
    // per label: cosine of exact e6-integer mean vectors + mean-norm
    // ratio. A full-corpus self-drift would be 1.0; the parity split
    // exercises real per-group divergence.
    "q118_centroid_drift" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.centroidDrift(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1),
        "label", "embedding")
        .orderBy("label")
    }),

    // Cumulative-distinct growth curve: distinct users seen by each epoch
    // day. First-activity attribution makes per-day new_entities partition
    // the user set, so the running sum IS the exact cumulative distinct
    // count — the exact batch twin of the q114 HLL tracker, at one groupBy
    // on the entity key plus a summary-sized window.
    "q119_distinct_growth" -> ((s, dir) =>
      graft.ops.Retention.distinctGrowth(
        Tables.events(s, dir)
          .withColumn("day", expr("ts div 86400000000000")),
        "user_id", "day")
        .orderBy("period")),

    // CUSUM changepoint per event_type over the q113 daily series: WHERE
    // did the metric shift (argmax of the exact integer deviation
    // |n·cum_t − t·total|) to go with q113's how-fast. Ties break on the
    // earliest day — deterministic on both engines.
    "q120_changepoints" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(round(col("value") * lit(1e6)).cast("long")).as("y_e6"))
      Anomaly.changepoints(daily, Seq("event_type"), "day", "y_e6")
        .orderBy("event_type")
    }),

    // Exact-size stratified sample: the first 5 docs of each source in
    // salted-md5 order — a deterministic eval-set draw with exact stratum
    // sizes (q43's hash sample keeps a RATE; this keeps a COUNT).
    "q121_stratified_sample" -> ((s, dir) =>
      Chunking.stratifiedFixedSample(
        Tables.load(s, dir, "documents").select("doc_id", "source", "lang"),
        col("source"), col("doc_id"), n = 5)
        .orderBy("source", "sample_rank")),

    // Frequent-items audit: exact top-10 heaviest users per event_type
    // (total order, replayable) vs the merged approx_top_k sketch — the
    // heavy-hitters sibling of q114's HLL loop. est_exact rides as an
    // oracle-TRUE boolean: the tracked map (65536) exceeds user
    // cardinality, so the sketch never purges and estimates ARE counts.
    "q123_heavy_hitters" -> ((s, dir) =>
      Sketches.frequencyAudit(Tables.events(s, dir), Seq("event_type"),
        "user_id", k = 10, maxItemsTracked = 65536)
        .orderBy("event_type", "rnk")),

    // Z-order layout report: Morton keys over (l_partkey, l_suppkey) at
    // 16 bits, level-8 quadtree tiles (256-wide squares — sized so the
    // test-SF key ranges actually split into multiple tiles) — per-tile
    // row counts and BOTH dimensions' min/max, the file-statistics bounds
    // a z-ordered layout would give. Pure integer bit-interleave
    // arithmetic, bit-identical on both engines.
    "q124_zorder_layout" -> ((s, dir) =>
      graft.ops.Scale.zorderLayoutReport(
        Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey",
        bits = 16, level = 8)
        .orderBy("cell")),

    // Inverted-index keyword search: every 97th doc reissued as a query,
    // top-5 matches under the q51 integer TF-IDF contract, terms in more
    // than 78% of the corpus dropped from scoring entirely (the cap is
    // corpus-PROPORTIONAL: this generator's 31-term vocabulary saturates
    // df at every SF, so an absolute cap either empties the ranking or
    // never fires depending on scale — r12 review), self-matches
    // excluded. The lexical complement of the vector top-k family — its
    // (query_id, neighbor_id, rank) output feeds rrfFuse for hybrid
    // retrieval.
    "q122_keyword_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.keywordSearchTopK(docs,
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", "doc_id", "text",
        k = 5, excludeSelf = true, maxDfFracE6 = 780000L)
        .orderBy("query_id", "rank")
    }),

    // HYBRID retrieval end-to-end: the q122 lexical ranking and a
    // brute-force cosine ranking (each top-20, the same %97 query sets)
    // fused by reciprocal rank — the standard two-tower + BM25-ish
    // production layout, here as one composed plan of three already-
    // oracle-gated operators. Queries present in only one modality fuse
    // from that list alone (the ids don't fully overlap — that asymmetry
    // is exercised deliberately).
    "q125_hybrid_retrieval" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val lex = TextAnalysis.keywordSearchTopK(docs,
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", "doc_id", "text",
        k = 20, excludeSelf = true, maxDfFracE6 = 780000L)
      val sem = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", k = 20)
      Similarity.rrfFuse(Seq(lex, sem), k = 10)
        .orderBy("query_id", "rank")
    }),

    // Collocation mining: adjacent-pair LIFT (the log-free exact-rational
    // PMI) over the document corpus, pairs seen >= 5 times, top-100. The
    // marginals reduce from the bigram counts in vocab space — one
    // row-data pass total.
    "q126_collocations" -> ((s, dir) =>
      TextAnalysis.collocationLift(
        Tables.load(s, dir, "documents"), "text",
        minCount = 5L, topK = 100)
        .orderBy("rnk")),

    // Deterministic epoch shuffle: every doc assigned a shard (8 workers)
    // and an in-shard position for epoch 1 — a pure function of
    // (epoch, doc_id), so re-runs and engines derive the identical
    // training order and each epoch permutes independently. Replaces
    // ORDER BY rand().
    "q127_epoch_shuffle" -> ((s, dir) =>
      Chunking.epochShuffle(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        col("doc_id"), epoch = 1, numShards = 8)
        .orderBy("shard", "position")),

    // Tokenizer-fertility report per language: chars per BPE token and
    // BPE tokens per whitespace word — the per-language context-budget
    // numbers behind sampling weights. One grouped pass, native token
    // counting.
    "q128_tokenizer_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(
        Tables.load(s, dir, "documents"), "text", Seq("lang"))
        .orderBy("lang")),

    // Truncation dedup: every 10th doc re-ingested cut to its first 97
    // chars (the crawler-artifact shape the generator lacks — synthesized
    // deterministically, the q118 split pattern), then prefix-pair
    // detection: bucket on the first 32 chars, verify the full prefix
    // row-locally. Children of exact-dup parents pair with BOTH parents.
    "q129_truncation_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val children = docs
        .filter(col("doc_id") % 10 === 0 && length(col("text")) > 97)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          substring(col("text"), 1, 97).as("text"))
      Dedup.prefixDupes(docs.unionByName(children), "doc_id", "text",
        prefixLen = 32)
        .orderBy("child_id", "parent_id")
    }),

    // Skip-gram cooccurrence: (center, context) pair counts within ±2
    // tokens, pairs seen >= 5 times — the word2vec training-pair
    // generator. Row-local pair explode, map-side-combinable count.
    "q130_skipgrams" -> ((s, dir) =>
      TextAnalysis.skipgramPairs(Tables.load(s, dir, "documents"), "text",
        window = 2, minCount = 5L)
        .orderBy("center", "context")),

    // Vocabulary spectrum + Good-Turing missing mass: terms per
    // occurrence count, hapax share of tokens — the Zipf-tail corpus
    // fingerprint, all exact integers.
    "q131_vocab_spectrum" -> ((s, dir) =>
      TextAnalysis.vocabSpectrum(Tables.load(s, dir, "documents"), "text")
        .orderBy("cnt")),

    // User-journey transition matrix: (prev event -> event) counts over
    // each user's time-ordered stream with a '^' start pseudo-state, plus
    // exact micro-unit row probabilities — the map behind funnel design.
    "q133_transition_matrix" -> ((s, dir) =>
      graft.ops.Sessions.transitionMatrix(
        Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type")
        .orderBy("from_type", "to_type")),

    // Contributor capping: at most 3 events per (user, day), drawn
    // deterministically by the salted-hash order — the "no contributor
    // dominates the training set" op, here as stratifiedFixedSample with
    // a COMPOSITE stratum (the operator takes any stratum expression).
    "q137_contributor_cap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", expr("ts div 86400000000000"))
      Chunking.stratifiedFixedSample(
        ev.select("event_id", "user_id", "day", "event_type"),
        struct(col("user_id"), col("day")), col("event_id"), n = 3)
        .orderBy("user_id", "day", "sample_rank")
    }),

    // Bounded session overlap: q70's pair join with its two quadratic-
    // output knobs engaged — pairs overlapping < 1 h die INSIDE the join
    // stage (never reach an exchange), and each session keeps only its
    // top-3 partners by overlap length (deterministic tiebreak). Output
    // is ≤ k rows per session however dense the hour, so a 100× dense
    // region no longer dominates the job with rows nobody reads.
    "q138_session_overlap_topk" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val sess = Sessions.sessionStats(ev, "user_id", "ts_us",
        "event_id", "value", gapSec = 14400L).localCheckpoint()
      val a = sess.select(col("user_id").as("a_user"),
        col("session_seq").as("a_seq"),
        col("start_us").as("a_start"), col("end_us").as("a_end"))
      val b = sess.select(col("user_id").as("b_user"),
        col("session_seq").as("b_seq"),
        col("start_us").as("b_start"), col("end_us").as("b_end"))
      val pairs = graft.ops.RangeJoin.overlappingPairs(
          a, "a_start", "a_end", b, "b_start", "b_end",
          binWidth = 14400L * 1000000L,
          minOverlap = 3600L * 1000000L, overlapCol = Some("overlap_us"))
        .filter(col("a_user") =!= col("b_user") ||
          col("a_seq") =!= col("b_seq"))
      val w = Window.partitionBy("a_user", "a_seq")
        .orderBy(col("overlap_us").desc, col("b_user"), col("b_seq"))
      pairs.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("a_user").as("user_id"),
          col("a_seq").as("session_seq"), col("rank"),
          col("b_user"), col("b_seq"), col("overlap_us"))
        .orderBy("user_id", "session_seq", "rank")
    }),

    // Substring-level (interior-span) dedup: repeated >= 5-token runs
    // inside otherwise-distinct documents, masked everywhere but their
    // first occurrence — the Lee-et-al step document-level MinHash
    // misses. Per-doc masked-token and merged-run counts; the oracle
    // replays the positional gram hash, the keep-first survivor rule,
    // the hot-span cap, and the gaps-and-islands run merge.
    "q139_span_dedup" -> ((s, dir) =>
      Dedup.maskDuplicateSpans(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", k = 5, minCopies = 2, maxSpanFreq = 50)
        .select("doc_id", "n_tokens", "n_masked", "n_spans")
        .orderBy("doc_id")),

    // Lineage L3 closure, oracle-anchored: a deterministic mart-dependency
    // DAG (table k is built from table k div 2 — a binary tree over the
    // part keys, depth ~log2 N) closed by distributed path doubling
    // (Lineage.reachabilityPairs); per table, the transitive upstream
    // count and downstream impact count. The oracle is the recursive-CTE
    // closure (the q45 pattern) + both rollups.
    "q140_lineage_closure" -> ((s, dir) => {
      val part = Tables.load(s, dir, "part")
      val edges = part
        .filter(col("p_partkey") >= 1)
        .select(expr("cast(p_partkey div 2 as bigint)").as("source_table"),
          col("p_partkey").cast("long").as("target_table"))
      val pairs = graft.lineage.Lineage.reachabilityPairs(edges)
      val up = pairs.groupBy("node")
        .agg(count(lit(1)).as("n_upstream"))
      val down = pairs.groupBy(col("upstream").as("node"))
        .agg(count(lit(1)).as("n_downstream"))
      part.select(col("p_partkey").cast("long").as("node"))
        .join(up, Seq("node"), "left")
        .join(down, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("n_upstream"), lit(0L)).as("n_upstream"),
          coalesce(col("n_downstream"), lit(0L)).as("n_downstream"))
        .orderBy("node")
    }),

    // Snapshot diff (CDC derivation): two deterministic snapshots of the
    // orders table — prev drops keys %7==0, next drops %5==0, bumps price
    // on %3==0 and flips status on %11==0 — diffed into the row-level
    // change set (added/removed/changed + which columns, null-safe). One
    // co-partitioned full-outer join; unchanged mass never leaves the
    // plan. The oracle replays the join and the IS DISTINCT FROM compare.
    "q141_snapshot_diff" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val prevSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      val nextSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      Reconciliation.snapshotDiff(prevSnap, nextSnap, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // Canonical-form dedup: the corpus plus deterministically-reformatted
    // copies of every 10th doc (upcased, triple-spaced, wrapped in
    // punctuation) — canonicalDupGroups collapses each variant onto its
    // original (plus any pre-existing exact dup groups). The oracle
    // replays the normalization (lower + non-alnum runs → space + trim)
    // and the md5 group-by symbol-for-symbol.
    "q142_canonical_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat(lit("  "), upper(regexp_replace(col("text"), " ", "   ")),
            lit(" !!")).as("text"))
      Dedup.canonicalDupGroups(docs.unionByName(variants), "doc_id", "text")
        .select("fingerprint", "keep_id", "copies")
        .orderBy("keep_id")
    }),

    // Leakage-safe split: q45's near-dup clusters become the unit of
    // train/val/test assignment — every doc splits on the md5 bucket of
    // its cluster label (own id when unclustered), so a mirror set can
    // never straddle train and eval. The oracle replays the label
    // propagation (q45's recursive closure) and the bucket map.
    "q143_leakage_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      Chunking.leakageSafeSplit(docs, "doc_id", Dedup.dupClusters(pairs),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // Weighted priority sample: top-50 docs by u/n_chars priority — the
    // deterministic (md5-uniform, IEEE-division-only) variant of the
    // Efraimidis-Spirakis weighted draw; longer docs proportionally more
    // likely. TakeOrderedAndProject, no global sort. The oracle replays
    // the uniform, the division, and the tiebreak exactly.
    "q144_weighted_sample" -> ((s, dir) =>
      Chunking.weightedPrioritySample(
        Tables.load(s, dir, "documents").select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars"), k = 50)
        .select("doc_id", "n_chars", "sample_rank")
        .orderBy("sample_rank")),

    // Cross-split leakage audit: q45's near-dup pairs against the NAIVE
    // row-wise hashSplit — off-diagonal cells are eval docs whose
    // near-copy sits in train, the leak leakageSafeSplit (q143) closes.
    // The oracle replays the pair generation and the bucket map.
    "q145_leakage_audit" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      val split = docs.withColumn("split", Chunking.hashSplit(col("doc_id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      Curation.splitLeakageAudit(split, "doc_id", "split", pairs)
        .orderBy("split_lo", "split_hi")
    }),

    // Salted skew join: lineitem (probe) x orders (build, replicated 8x on
    // an exploded salt) keyed on (l_orderkey, salt) — a hot order key's
    // rows spread over 8 shuffle partitions. The oracle is the PLAIN join
    // + rollup: green means the salting is exactly semantics-preserving.
    "q146_salted_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Joins.saltedJoin(li, ord, Seq("l_orderkey"), salt = 8)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // Per-domain top-5 bigrams by exact count (deterministic tiebreak:
    // count desc, gram asc) — the domain-sliced phrase inventory. Explode
    // reduces straight into a partial-aggregating (domain, gram) count;
    // the ranking window sees only the aggregated vocab frame.
    "q147_domain_ngrams" -> ((s, dir) =>
      TextAnalysis.domainTopNgrams(
        Tables.load(s, dir, "documents"), "source", "text", n = 2, k = 5)
        .orderBy("domain", "rank")),

    // CDC round-trip: q141's change set (value-carrying) applied back onto
    // the prev snapshot. The oracle is the NEXT snapshot itself — green
    // proves diff→apply reconstructs it exactly (the q34 merge-equivalence
    // posture, row-level).
    "q148_changeset_apply" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val prevSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      val nextSnap = orders.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val changes = Reconciliation.snapshotDiff(prevSnap, nextSnap,
        Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"),
        emitValues = true)
      Reconciliation.applyChangeSet(prevSnap, changes,
        Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // Per-user interval union: hour-long activity intervals around each
    // event, overlapping/touching ones merged into islands — total
    // COVERED activity time, which sum(end-start) over-counts wherever
    // events cluster. Gaps-and-islands over ONE per-key time window.
    "q149_interval_union" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("s_us"))
        .withColumn("e_us", col("s_us") + lit(3600L * 1000000L))
      Sessions.intervalUnion(ev, "user_id", "s_us", "e_us")
        .withColumnRenamed("covered", "covered_us")
        .orderBy("user_id")
    }),

    // Market-basket co-occurrence: part pairs over order baskets (size-
    // capped, presence-based) with a count floor — the frequent-itemset
    // candidate generator. Per-key join fan-out bounded by the cap.
    "q150_basket_pairs" -> ((s, dir) =>
      Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .orderBy("item_a", "item_b")),

    // Packing efficiency: q44's greedy shard packing rolled up per shard —
    // bins used vs the ceil(total/budget) floor, mean fill in micro-units.
    // The GPU-batch waste report; |shards|-sized output.
    "q151_packing_efficiency" -> ((s, dir) => {
      val packed = Chunking.packSequences(
        Tables.load(s, dir, "documents"), "doc_id", "text", binSize = 512,
        docsPerShard = 100L)
      Chunking.packingEfficiency(packed, binSize = 512).orderBy("shard")
    }),

    // Data-skipping report: the SAME user-range predicate measured against
    // two physical layouts of events — day partitioning (skips nothing:
    // every day holds every user) vs user-bucket layout (skips ~all
    // non-matching buckets). The layout-decision numbers behind every
    // pruning claim; two |units|-space aggregates to one row each.
    "q153_skipping_report" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val byTime = graft.ops.Scale.skippingReport(ev, col("day"),
          col("user_id"), 10L, 19L)
        .withColumn("layout", lit("time"))
      val byUser = graft.ops.Scale.skippingReport(ev,
          expr("user_id div 10"), col("user_id"), 10L, 19L)
        .withColumn("layout", lit("user_bucket"))
      byTime.unionByName(byUser)
        .select("layout", "n_units", "skipped_units", "total_rows",
          "skipped_rows", "skip_e6")
        .orderBy("layout")
    }),

    // Near-dup cluster-size histogram: q45's connected components grouped
    // by size — the "are we removing twins or mirror-farms" dedup
    // observability view. Counting in cluster space after the closure.
    "q152_cluster_sizes" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      Dedup.dupClusters(pairs)
        .groupBy("label").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")
    }),

    // ROLLUP mart: every level of the (status, priority) hierarchy —
    // detail, per-status subtotal, grand total — in ONE grouped aggregate
    // with the SQL-standard grouping_id bitmask. One shuffle for the whole
    // hierarchy vs one mart build per level.
    "q154_rollup_mart" -> ((s, dir) =>
      Grouping.rollupAgg(Tables.load(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority"),
        Seq(count(lit(1)).as("n_orders"),
          expr(dsum("o_totalprice")).as("total_price")))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // Pareto frontier: documents not dominated on (token count, distinct
    // tokens) — skyline selection without the quadratic self-join (per-x
    // max → running-max staircase → broadcast join back). Oracle is the
    // quadratic NOT EXISTS dominance query, so green proves the staircase
    // reduction exact, coincident-point ties included.
    "q155_pareto_docs" -> ((s, dir) => {
      val pts = Tables.load(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.uniqueTokenCount(col("text")).cast("long").as("n_uniq"))
      Pareto.skyline2D(pts, "n_tokens", "n_uniq").orderBy("doc_id")
    }),

    // Incremental JOIN-view maintenance: enriched view kept equal to
    // fact ⋈ dim as a late fact slice arrives — anti-join out the delta's
    // keys, append delta ⋈ broadcast(dim). The oracle is the full rebuild,
    // so green IS the maintenance invariant V' == F' ⋈ D.
    "q156_view_refresh" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment"), col("c_nationkey"))
      val existing = o.filter("o_orderdate < timestamp'1996-01-01 00:00:00'")
        .join(broadcast(dim), Seq("o_custkey"), "left")
      val delta = o.filter("o_orderdate >= timestamp'1996-01-01 00:00:00'")
      IncrementalMaterializer.refreshJoin(existing, delta, dim,
          Seq("o_orderkey"), Seq("o_custkey"))
        .orderBy("o_orderkey")
    }),

    // Edit-distance≤1 self-join via FastSS deletion-neighborhood blocking
    // + exact levenshtein verify. The oracle is the full quadratic join —
    // green proves the blocking scheme loses no pair. Customer names give
    // ~13 true pairs per name (single-digit perturbations).
    "q157_fuzzy_names" -> ((s, dir) =>
      Fuzzy.editDistance1Join(Tables.load(s, dir, "customer"),
        "c_custkey", "c_name")
        .orderBy("id_a", "id_b")),

    // Equi-depth (ntile) decile profile of event values: exact per-bucket
    // boundaries and mass on a totalized order — the score-calibration
    // binning view. Global-sort form (oracle-gated); the boundary-
    // assignment scale twin is spec-pinned against it.
    "q158_decile_profile" -> ((s, dir) =>
      Anomaly.equiDepthProfile(
        Tables.load(s, dir, "events").select("event_id", "value"),
        "value", "event_id", 10)),

    // CUBE mart: all four (status, year) grouping sets in one aggregate —
    // the rollup's lattice complement, same single-shuffle shape.
    "q159_cube_mart" -> ((s, dir) =>
      Grouping.cubeAgg(
        Tables.load(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("long")),
        Seq("o_orderstatus", "o_year"),
        Seq(count(lit(1)).as("n_orders"),
          expr(dsum("o_totalprice")).as("total_price")))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_year"))),

    // Hopping (sliding) event-time windows in batch: 1 h windows every
    // 30 min — each event expands into size/slide windows before the
    // grouped aggregate re-compresses to |windows × types|. Epoch-aligned
    // grid ≡ the oracle's integer floor-division grid.
    "q160_hopping_windows" -> ((s, dir) =>
      graft.ops.TimeSeries.hoppingAgg(
        Tables.load(s, dir, "events")
          .filter(col("value").isNotNull)
          .withColumn("ts_us", expr("ts div 1000")),
        "ts_us", "event_type", "value",
        sizeUs = 3600000000L, slideUs = 1800000000L)
        .orderBy("window_start_us", "event_type")),

    // Triangle participation over the basket co-occurrence graph (q150's
    // ≥2-basket edges) via degree-ordered orientation — wedge join bounded
    // by O(√m) out-degree, never the hub's raw degree. Oracle replays the
    // edge build + the closing 3-way join quadratically.
    "q161_triangles" -> ((s, dir) =>
      graft.ops.Graphs.triangleCounts(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b")
        .orderBy("node")),

    // Full OLS fit (slope/intercept/r²) of per-type daily value mass —
    // exact BIGINT sufficient stats (x recentered per group, y in e2
    // units so n·Σy² stays in range), then a fixed dag of IEEE double
    // ops both engines execute identically.
    "q162_trend_fit" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(round(col("value") * lit(100)).cast("long")).as("y_e2"))
      Anomaly.linearFit(daily, Seq("event_type"), "day", "y_e2")
        .orderBy("event_type")
    }),

    // Rolling active users (DAU / 7-day WAU / stickiness): sliding-window
    // DISTINCT has no frame-aggregate form — dedupe to (user, day), then
    // a bounded ×7 explode in (user, day) space, count distinct per
    // window end. Exact integer stickiness ratio.
    "q163_rolling_active" -> ((s, dir) =>
      graft.ops.Retention.rollingActive(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 86400000000000").as("day")),
        "user_id", "day", windowDays = 7)
        .orderBy("day")),

    // Per-domain Pareto frontier: q155's staircase partitioned by source,
    // so every domain keeps its own exemplar curve — dominance judged
    // within the stratum only.
    "q164_domain_pareto" -> ((s, dir) => {
      val pts = Tables.load(s, dir, "documents").select(
        col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.uniqueTokenCount(col("text")).cast("long").as("n_uniq"))
      Pareto.skyline2DGrouped(pts, Seq("source"), "n_tokens", "n_uniq")
        .orderBy("doc_id")
    }),

    // Native bounded-heap grouped top-k (`topk_longs`, graft's first
    // custom AGGREGATE): at most k longs per (task × group) cross the
    // shuffle — no rank window, no per-group sort. Output exploded to
    // (group, rank, value) rows; a pure function of the input multiset.
    "q167_native_topk" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .filter(col("value").isNotNull)
        .withColumn("value_e6", round(col("value") * lit(1e6)).cast("long"))
        .groupBy("event_type")
        .agg(expr("topk_longs(value_e6, 5)").as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "value_e6")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("value_e6"))
        .orderBy("event_type", "rank")),

    // Incremental cluster maintenance: q45's clustering built from the
    // old-corpus pairs only, then new pairs folded in as {star edges} ∪
    // {new pairs} — the closure never re-reads old pair generation. The
    // oracle is the FULL recompute over all pairs, so green proves the
    // star-forest reduction preserves components exactly (bridges
    // between old clusters included).
    "q165_incremental_clusters" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val allPairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      val cut = lit(300L) // docs below are the "old" corpus
      val oldPairs = allPairs.filter(col("id_a") < cut && col("id_b") < cut)
      val newPairs = allPairs.filter(col("id_a") >= cut || col("id_b") >= cut)
      Dedup.mergeClusters(Dedup.dupClusters(oldPairs), newPairs)
        .orderBy("id")
    }),

    // Perceptual image dedup: REAL decoded pixels → 64-bit dHash →
    // 4×16-bit banded blocking (pigeonhole-complete for hamming ≤ 3) →
    // exact hamming verify. Corpus = 200 deterministic PNGs + planted
    // byte-identical copies; the oracle is the planted-pair ledger
    // (distance 0 is guaranteed by construction; the q41 fixed-corpus
    // pattern). The near-miss (resize ≤ 3 bits) case is spec-level.
    "q181_image_neardups" -> ((s, dir) => {
      import s.implicits._
      def png(i: Long) = Multimodal.syntheticPng(
        i, 16 + (i % 17).toInt, 12 + (i % 13).toInt)
      val originals = s.range(200)
        .map(i => Multimodal.MediaRecord(i, "image", png(i), "png"))
      val dups = s.range(200).filter(_ % 10 == 0)
        .map(i => Multimodal.MediaRecord(i + 1000, "image", png(i), "png"))
      Multimodal.imageNearDupes(originals.union(dups), maxHamming = 0)
        .orderBy("id_a")
    }),

    // Session entry/exit matrix: q61's sessions summarized as how they
    // begin × how they end — first/last type per session on the (ts,
    // tie) order, counted in |types|² space.
    "q185_entry_exit" -> ((s, dir) =>
      Sessions.entryExitMatrix(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type", gapSec = 14400L)
        .orderBy("entry_type", "exit_type")),

    // TextRank corpus keywords: the engine composed with itself —
    // skip-gram co-occurrence edges (q130) under weighted integer
    // PageRank (q178), words as 60-bit md5-prefix nodes (q139's hash
    // convention); the oracle replays the full composition including
    // the unrolled recurrence.
    "q200_textrank" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(
        Tables.load(s, dir, "documents"), "text",
        window = 2, minCount = 5L, iters = 4, k = 50)
        .orderBy("rank")),

    // Cumulative gains/lift by value decile: do high-value events
    // capture the purchases — all-integer capture and lift per bin,
    // ntile on the (score desc, tie) total order.
    "q197_gains_table" -> ((s, dir) =>
      graft.ops.Features.gainsTable(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_id"),
            round(col("value") * lit(100)).cast("long").as("s_e2"),
            (col("event_type") === "purchase").cast("long").as("y")),
        "s_e2", "event_id", "y", buckets = 10)
        .orderBy("bucket")),

    // Item-item co-visitation cosine over the capped basket population —
    // "items also bought", normalized so popular items don't dominate;
    // counts and pairs share one basket population by construction.
    "q198_item_cosine" -> ((s, dir) =>
      Baskets.itemCosine(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .orderBy("item_a", "item_b")),

    // Share-of-parent: each (event_type, day)'s integer-e6 share of its
    // type's total mass — the percent-of-category OLAP idiom, one
    // grouped aggregate + one window over the aggregated frame.
    "q199_share_of_parent" -> ((s, dir) =>
      graft.ops.Grouping.shareOfParent(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            round(col("value") * lit(100)).cast("long").as("y_e2")),
        Seq("event_type"), Seq("day"), "y_e2")
        .orderBy("event_type", "day")),

    // Multi-touch attribution pairs: every purchase × all its in-window
    // view/click touches, positioned and linearly weighted — q191's
    // split-the-credit sibling; one keyed join with the window bound as
    // residual predicate.
    "q196_multi_touch" -> ((s, dir) =>
      Sessions.multiTouchAttribution(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowUs = 14400000000L)
        .orderBy("conv_tie", "position")),

    // Exact per-day ROC AUC (Mann–Whitney rank-sum, average-rank ties):
    // does value separate purchases from the rest each day — integer
    // 2R⁺ prefix over the value domain, one final divide-and-round.
    "q195_group_auc" -> ((s, dir) =>
      graft.ops.Features.groupAuc(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(expr("ts div 86400000000000").as("day"),
            round(col("value") * lit(100)).cast("long").as("s_e2"),
            (col("event_type") === "purchase").cast("long").as("y")),
        Seq("day"), "s_e2", "y")
        .orderBy("day")),

    // Leave-one-out m-estimate target encoding of value by event_type —
    // the leakage-safe categorical encoder: a row never sees its own
    // target; exact BIGINT stats, one divide-and-round IEEE dag.
    "q193_target_encode" -> ((s, dir) =>
      graft.ops.Features.targetEncodeLoo(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            round(col("value") * lit(100)).cast("long").as("y_e2")),
        "event_id", "event_type", "y_e2", m = 10)
        .orderBy("id")),

    // Hashing-trick featurizer: document tokens into 64 fixed md5
    // buckets, sparse (doc, bucket, count) coordinates — the unbounded-
    // vocabulary feature map with no fitted dictionary.
    "q194_hash_features" -> ((s, dir) =>
      graft.ops.Features.hashFeatures(
        Tables.load(s, dir, "documents"), "doc_id", "text", nBuckets = 64)
        .orderBy("id", "bucket")),

    // Audience overlap matrix: exact shared-user counts + Jaccard per
    // event-type pair, with the HLL inclusion–exclusion estimate gated
    // at 5% of max(|A|,|B|) as oracle-TRUE booleans (the q114/q173
    // estimates-never-hash-compared posture).
    "q192_audience_overlap" -> ((s, dir) =>
      Sketches.audienceOverlap(
        Tables.load(s, dir, "events"), "event_type", "user_id")
        .orderBy("type_a", "type_b")),

    // Last-touch attribution: every purchase credited to the user's most
    // recent view/click within 4 h, else 'direct' — one per-key window
    // carrying a running (ts, tie, type) struct max; the funnel family's
    // "which step gets the credit" companion. Oracle replays the same
    // windowed struct max.
    "q191_attribution" -> ((s, dir) =>
      Sessions.lastTouchAttribution(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowUs = 14400000000L)
        .orderBy("event_id")),

    // Point-in-time correct enrichment: each event joined to the SCD2
    // state (q168's history) its user held ONE HOUR EARLIER — the
    // leakage-free feature lookup (training on today's dimension values
    // against yesterday's facts teaches the model the future). Early
    // events enrich to null, visibly, never dropped.
    "q190_pit_enrich" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"))
      val history = Reconciliation.scd2History(
        ev, Seq("user_id"), "ts_us", "event_id")
        .select("user_id", "event_type", "valid_from_us", "valid_to_us",
          "version")
        .withColumnRenamed("event_type", "state_type")
      val facts = ev.select(col("user_id"), col("event_id"),
        (col("ts_us") - lit(3600000000L)).as("as_of_us"))
      Reconciliation.pointInTimeJoin(facts, history, Seq("user_id"),
          "as_of_us")
        .select(col("event_id"), col("user_id"), col("as_of_us"),
          col("dim_version").as("version_then"),
          col("dim_state_type").as("state_then"))
        .orderBy("event_id")
    }),

    // Concentration: per-type Gini + top-decile mass share of event
    // value — the inequality diagnostic, all-integer via the q195
    // average-rank machinery on the value-domain frame.
    "q204_concentration" -> ((s, dir) =>
      Anomaly.concentrationReport(
        Tables.events(s, dir)
          .select(col("event_type"),
            round(col("value") * lit(100)).cast("long").as("v_e2")),
        Seq("event_type"), "v_e2")
        .orderBy("event_type")),

    // Funnel stage latency: exact integer time-between-stages stats on
    // the q176 frontier chain — view→click→purchase sum/max/floor-mean
    // µs per transition.
    "q203_funnel_latency" -> ((s, dir) =>
      Sessions.funnelLatency(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        steps = Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // Personalized directed PageRank: teleport and dangling mass
    // concentrate on a seed set (every 5th item id) — rank "from the
    // perspective of" those items; q187's machinery with a per-node
    // teleport vector, oracle-unrolled.
    "q202_pagerank_personalized" -> ((s, dir) => {
      val edges = Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .localCheckpoint()
      val seeds = edges.select(col("item_a").as("node"))
        .unionAll(edges.select(col("item_b").as("node")))
        .distinct()
        .filter(col("node") % 5 === 0)
        .select(col("node"), lit(1L).as("w"))
      graft.ops.Graphs.pageRankDirected(edges, "item_a", "item_b",
        iters = 5, personalization = Some(seeds))
        .orderBy("node")
    }),

    // Deterministic hash-walks over the basket graph: a 3-step
    // DeepWalk-style walk from every node, step choice = md5(node#step
    // #seed) mod outdeg over the dst-ordered adjacency — "random" walks
    // that are bit-identical across engines, so the oracle replays them
    // BM25 top-5 more-like-this over the document corpus (the q122
    // query set and df cap): exact-integer BM25 — smoothed whole-bit idf
    // floor(log2(2D/df)) via binary-string length, the tf/length
    // saturation as one cleared-denominator floor division — so the
    // production-default lexical ranking hash-compares against the
    // oracle's replay of the identical arithmetic. The corpus's 31-term
    // vocabulary makes the 0.78·D cap genuinely binding (15 of 31 terms
    // survive), and doc-length normalization is what separates the
    // rankings from q122's pure tf·idf.
    "q205_bm25_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.bm25TopK(docs,
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", "doc_id", "text",
        k = 5, excludeSelf = true, maxDfFracE6 = 780000L)
        .orderBy("query_id", "rank")
    }),

    // Multi-source BFS over the basket graph: minimum hop count from
    // the %7 seed set, 3 hops — frontier joins + settled anti-join per
    // round, early stop on an empty frontier. The oracle replays
    // reachability as a hop-bounded recursive CTE and takes min(dist):
    // first-reach ≡ min over all bounded walks, so the hash compare
    // proves the frontier algebra, not just row counts.
    "q206_bfs_distances" -> ((s, dir) => {
      val edges = Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .localCheckpoint()
      val seeds = edges.select(col("item_a").as("node"))
        .unionAll(edges.select(col("item_b").as("node")))
        .distinct()
        .filter(col("node") % 7 === 0)
      graft.ops.Graphs.bfsDistances(edges, "item_a", "item_b",
        seeds, "node", maxHops = 3)
        .orderBy("node")
    }),

    // Reliability table: purchase rate by fixed-width value bins — the
    // calibration diagnostic next to q197's rank-decile gains. 10 bins
    // over value_e2 [0, 49999] (the corpus tops out at 49002), so the
    // top bins exercise sparse-bin behavior and the clamp is live code.
    "q207_calibration" -> ((s, dir) =>
      graft.ops.Features.calibrationReport(
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(round(col("value") * lit(100)).cast("long").as("s_e2"),
            when(col("event_type") === "purchase", lit(1L))
              .otherwise(lit(0L)).as("y")),
        "s_e2", "y", bins = 10, loE2 = 0L, hiE2 = 49999L)
        .orderBy("bin")),

    // Association rules over order baskets: the support/confidence/lift
    // triple in both rule directions, exact integer floor divisions over
    // the q150 capped basket population — one more keyed join layer on
    // the same bounded self-join.
    "q208_assoc_rules" -> ((s, dir) =>
      Baskets.associationRules(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .orderBy("antecedent", "consequent")),

    // Z-order locality report over (l_partkey, l_suppkey): rows grouped
    // by Morton-curve cell (10 low bits dropped = 32×32 quadtree cells),
    // per-cell counts + bounding boxes. The bit-interleave is exact
    // integer algebra replayed mask-for-mask by the oracle; the bounded
    // span_x/span_y columns are the file-skipping evidence the zOrderBy
    // rewrite exists to produce.
    "q209_zorder_cells" -> ((s, dir) =>
      graft.maintenance.Layout.zCellStats(
        Tables.load(s, dir, "lineitem"), "l_partkey", "l_suppkey",
        cellShift = 10)
        .orderBy("cell")),

    // HITS hubs/authorities on the directed low→high basket pair set:
    // minimal items are pure hubs (no in-edges), maximal items pure
    // authorities — both asymmetries live. 3 rounds of the e9
    // nested-floor-division fixed point, oracle-unrolled.
    "q210_hits" -> ((s, dir) =>
      graft.ops.Graphs.hits(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", iters = 3)
        .orderBy("node")),

    // Fuzzy matching one radius out: customer-name pairs within edit
    // distance 2 — q157's FastSS blocking one deletion deeper
    // (≤2-deletion neighborhoods), bounded levenshtein verify. The
    // oracle is the full quadratic join again, so green proves the
    // deeper blocking is still complete. The md5 10% subset (the q72
    // hash-split convention) keeps the benchmark honest: zero-padded
    // NEAR-SEQUENTIAL ids are the adversarial worst case for radius 2
    // (every name within two digit edits of dozens of others — the full
    // sf0.1 table spends minutes verifying ~50M candidates, and any
    // arithmetic k-th subset preserves that digit structure); a hash
    // subset models the scattered-id tables radius-2 linkage is for.
    "q211_fuzzy_names_ed2" -> ((s, dir) =>
      Fuzzy.editDistance2Join(
        Tables.load(s, dir, "customer").filter(
          conv(substring(md5(col("c_custkey").cast("string")), 1, 8),
            16, 10).cast("long") % 10 === 0),
        "c_custkey", "c_name")
        .orderBy("id_a", "id_b")),

    // User concentration per event type: HHI + effective-user count over
    // per-user event counts — is a type's volume a crowd or three bots?
    // The share-squared complement of q204's Gini, pure integer.
    "q212_hhi" -> ((s, dir) =>
      Anomaly.hhiReport(
        Tables.load(s, dir, "events").select("event_type", "user_id"),
        Seq("event_type"), "user_id")
        .orderBy("event_type")),

    // RFM customer segmentation over orders: recency vs the corpus max
    // date, frequency, exact-cent monetary, deterministic quintile
    // scores (entity tiebreaks), rfm_code 111–555.
    "q213_rfm" -> ((s, dir) =>
      Retention.rfmScores(Tables.load(s, dir, "orders"),
        "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("entity")),

    // Cohort LTV: revenue by first-order-month cohort and age, exact
    // cents, cumulative per-member value — q94 retention's revenue twin.
    "q214_cohort_ltv" -> ((s, dir) =>
      Retention.cohortLtv(Tables.load(s, dir, "orders"),
        "o_custkey", "o_orderdate", "o_totalprice")
        // month as 'yyyy-MM' text: a DATE column round-trips as
        // python date objects on the Spark side but datetime64 from
        // DuckDB — the compare needs one physical type
        .withColumn("cohort_month",
          date_format(col("cohort_month"), "yyyy-MM"))
        .orderBy("cohort_month", "age_months")),

    // Churn labels: entities active before epoch day 19752 (2024-01-30)
    // labeled by zero-activity on the final corpus day — the
    // reproducible label-generation step of a churn model, with the
    // baseline features (last day, silence, volume) riding along. The
    // 1-day outcome window is what this ~2-events/user/day corpus
    // needs for both label values to occur (17/150 churn at sf0.01,
    // 1/15 at sf0.001); real corpora widen horizonDays.
    "q215_churn_labels" -> ((s, dir) =>
      Retention.churnLabels(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 86400000000000").as("day")),
        "user_id", "day", splitDay = 19752L, horizonDays = 1L)
        .orderBy("entity")),

    // Day-over-day deltas per event type: value mass with previous
    // CALENDAR day, absolute delta, sign-exact e6 percent change —
    // the dashboard drop detector, null across silent-day gaps.
    "q216_period_over_period" -> ((s, dir) =>
      graft.ops.TimeSeries.periodOverPeriod(
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            round(col("value") * lit(100)).cast("long").as("v_e2")),
        "event_type", "day", "v_e2", periodDays = 1L)
        .orderBy("key", "period")),

    // Kaplan–Meier time-to-first-purchase by acquisition channel (the
    // user's FIRST event type, argmin by the (ts, tie) struct-min):
    // duration = whole hours from first activity to first purchase,
    // right-CENSORED at last observed activity for users who never
    // convert. Survival as per-step-floored e6 — the one cross-engine-
    // exact running product — and the oracle replays the fold
    // list_reduce-for-aggregate, prefix by prefix.
    "q217_kaplan_meier" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"))
      val first = e.groupBy("user_id")
        .agg(min(struct(col("ts_us"), col("event_id"),
          col("event_type"))).as("fs"), max("ts_us").as("l"))
        .select(col("user_id"), col("fs.ts_us").as("f"),
          col("fs.event_type").as("channel"), col("l"))
      val firstP = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ts_us").as("p"))
      val subj = first.join(firstP, Seq("user_id"), "left")
        .select(col("channel"),
          expr("(coalesce(p, l) - f) div 3600000000L").as("duration_h"),
          when(col("p").isNotNull, lit(1L)).otherwise(lit(0L))
            .as("event"))
      Retention.kaplanMeier(subj, Seq("channel"), "duration_h", "event")
        .orderBy("channel", "t")
    }),

    // TRUE delta-fold mart maintenance: the historical (priority, month)
    // order mart combined with a raw append delta through algebraic
    // partials (count/sum/min/max) — the source's history is never
    // re-read, unlike q34's lookback recompute. The 1998-07-15 split
    // lands mid-month so the cutoff month exercises the ⊕ combine while
    // later months take the new-key path. Oracle = the full rebuild.
    "q218_incremental_agg" -> ((s, dir) => {
      import graft.gold.IncrementalMaterializer.{AlgebraicMeasure => M}
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderdate").as("d"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val hist = o.filter(col("d") < lit("1998-07-15"))
        .groupBy("priority", "month")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"),
          min("cents").as("min_cents"), max("cents").as("max_cents"))
      val delta = o.filter(col("d") >= lit("1998-07-15")).drop("d")
      IncrementalMaterializer.refreshAlgebraic(hist, delta,
        Seq("priority", "month"),
        Seq(M("n_orders", "count", "cents"),
          M("total_cents", "sum", "cents"),
          M("min_cents", "min", "cents"),
          M("max_cents", "max", "cents")))
        .orderBy("priority", "month")
    }),

    // Pivot dashboard mart: one row per day, a (count, value-sum) column
    // pair per PINNED event type — schema fixed by argument, absent
    // cells 0, one conditional-partial aggregate, no pivot-discovery job.
    "q219_pivot_mart" -> ((s, dir) =>
      Grouping.pivotMart(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"),
            col("event_type"),
            round(col("value") * lit(100)).cast("long").as("v_e2")),
        "day", "event_type", "v_e2",
        categories = Seq("view", "click", "purchase", "signup", "error"))
        .orderBy("day")),

    // A/B experiment report: md5-bucket assignment (variant 0 = control,
    // 3 arms), per-variant conversion, integer lift via cross-multiplied
    // counts, pooled two-proportion z as the one fixed IEEE dag.
    "q220_experiment_report" -> ((s, dir) =>
      graft.ops.Features.experimentReport(
        Tables.load(s, dir, "events")
          .select(col("user_id"),
            when(col("event_type") === "purchase", lit(1L))
              .otherwise(lit(0L)).as("y")),
        "user_id", "y", nVariants = 3)
        .orderBy("variant")),

    // Revenue concentration per order priority: mass-weighted HHI over
    // per-customer spend — the whale detector a count-HHI misses; shares
    // floored to e6 before squaring so nothing overflows.
    "q221_hhi_mass" -> ((s, dir) =>
      Anomaly.hhiReportByMass(
        Tables.load(s, dir, "orders")
          .select(col("o_orderpriority").as("priority"),
            col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq("priority"), "o_custkey", "cents")
        .orderBy("priority")),

    // Funnel by experiment variant: the q176 strictly-ordered frontier
    // chain split by the q220 md5-bucket assignment — per variant, where
    // in view→click→purchase the drop happens. Segments that die report
    // zero rows for later stages, not missing rows.
    "q222_funnel_by_variant" -> ((s, dir) =>
      Sessions.funnelStepsBy(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("event_type"),
            (conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 3).as("variant")),
        "user_id", "ts_us", "event_id", "event_type",
        steps = Seq("view", "click", "purchase"), byCol = "variant")
        .orderBy("segment", "stage")),

    // Hop-bounded weighted shortest paths over the basket graph: edge
    // cost = 1e6 div co-occurrence count (strong ties are cheap), min
    // total cost from the %7 seed set within 3 hops — frontier
    // Bellman–Ford, oracle = min over all ≤3-edge walks (recursive CTE).
    "q223_shortest_paths" -> ((s, dir) => {
      val edges = Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L)
        .withColumn("w", expr("1000000L div n_baskets"))
        .localCheckpoint()
      val seeds = edges.select(col("item_a").as("node"))
        .unionAll(edges.select(col("item_b").as("node")))
        .distinct()
        .filter(col("node") % 7 === 0)
      graft.ops.Graphs.shortestPathsBounded(edges, "item_a", "item_b",
        "w", seeds, "node", maxHops = 3)
        .orderBy("node")
    }),

    // Retrieval ranking quality: MRR / AP@10 / hit@10 for the exact
    // cosine top-k against label-match relevance — recall says WHAT was
    // found, this says WHERE in the ranking it landed. All metrics exact
    // integer-e6 (per-term floors are part of the metric contract).
    "q224_ranking_eval" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      val qrels = queries.select(col("vec_id").as("query_id"), col("label"))
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
          "label")
        .filter(col("query_id") =!= col("neighbor_id"))
      Similarity.rankingMetrics(
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
          k = 10),
        qrels, k = 10)
        .orderBy("query_id")
    }),

    // join-for-join.
    "q201_hash_walks" -> ((s, dir) =>
      graft.ops.Graphs.hashWalks(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", steps = 3, seed = 7L)
        .orderBy("start", "step")),

    // Community detection by synchronous label propagation over the
    // basket graph: 4 deterministic rounds (plurality label, ties to
    // min, exact integer counts) — nodes sharing a final label are one
    // item community. Oracle unrolls the rounds; the per-node argmax
    // replays as max over {'c': cnt, 'g': -label} structs.
    "q189_communities" -> ((s, dir) =>
      graft.ops.Graphs.labelPropagation(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", iters = 4)
        .orderBy("node")),

    // Directed PageRank with dangling-mass redistribution: the basket
    // pair set read as DIRECTED low→high edges — every maximal item is a
    // genuine dangling node (outdeg 0), so the D_t redistribution term is
    // exercised on real mass every round; same e9 integer fixed point,
    // oracle unrolls the recurrence with the dangling aggregate inlined.
    "q187_pagerank_directed" -> ((s, dir) =>
      graft.ops.Graphs.pageRankDirected(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", iters = 5)
        .orderBy("node")),

    // Tokenizer fertility of the LEARNED vocabulary — the train→apply
    // loop closed under one oracle: merges learned on the corpus (the
    // q186 rounds), then every document segmented with applyMerges
    // (row-local replace chain) and reported as exact per-doc word and
    // piece counts. The oracle re-derives the trained vocabulary's final
    // segs and joins each doc's words against them — so a green hash
    // proves apply ≡ the segmentation training left behind, corpus-wide.
    "q188_bpe_fertility" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val learned = BpeTrainer.learnMerges(docs.select("text"), "text",
          numMerges = 10)
        .orderBy("merge_round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs.select(col("doc_id"),
          explode(BpeTrainer.wordsOf(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(BpeTrainer.applyMerges(col("word"), learned)).cast("long")
            .as("np"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
        .orderBy("doc_id")
    }),

    // Learned BPE vocabulary induction: 10 merge rounds trained on the
    // corpus — pair counting in vocabulary space (distinct words ×
    // freq), argmax under the deterministic (count desc, pair asc) tie
    // order, re-segmentation as a literal boundary-wrapped replace with
    // identical leftmost-non-overlapping semantics in both engines. The
    // oracle UNROLLS the merge rounds (the q171 fixed-point pattern).
    "q186_bpe_vocab" -> ((s, dir) =>
      BpeTrainer.learnMerges(
        Tables.load(s, dir, "documents").select("text"), "text",
        numMerges = 10)
        .orderBy("merge_round")),

    // Winnowing (MOSS) fingerprint pairs: windowed-min sampling of the
    // shingle-hash stream with the shared-run guarantee, then the capped
    // inverted-index pair stage — the w×-cheaper candidate generator
    // next to q26's full shingle index.
    "q183_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
        k = 3, w = 4, maxFingerprintFreq = 100, minShared = 2L)
        .orderBy("id_a", "id_b")),

    // Metric co-movement: pairwise Pearson correlation of per-type daily
    // value mass over the shared day axis — exact BIGINT stats per pair,
    // one IEEE covariance/√(var·var) dag.
    "q184_metric_corr" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(round(col("value") * lit(100)).cast("long")).as("y_e2"))
      Anomaly.metricCorrelations(daily, "event_type", "day", "y_e2")
        .orderBy("type_a", "type_b")
    }),

    // Audio near-dup sibling of q181: energy-profile fingerprints over
    // really-decoded PCM, same 4-band blocking, planted-copy ledger.
    "q182_audio_neardups" -> ((s, dir) => {
      import s.implicits._
      def wav(i: Long) = Multimodal.syntheticWav(
        i, 256 + (i % 256).toInt, channels = 1)
      val originals = s.range(150)
        .map(i => Multimodal.MediaRecord(i, "audio", wav(i), "wav"))
      val dups = s.range(150).filter(_ % 10 == 0)
        .map(i => Multimodal.MediaRecord(i + 1000, "audio", wav(i), "wav"))
      Multimodal.audioNearDupes(originals.union(dups), maxHamming = 0)
        .orderBy("id_a")
    }),

    // Per-user time-weighted average value: step-function holding
    // intervals in exact ms (floor-division contract), BIGINT
    // numerator/denominator, one IEEE ratio — the irregular-sampling
    // mean a plain avg over-counts bursts on.
    "q179_twap" -> ((s, dir) =>
      graft.ops.TimeSeries.twap(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "value")
        .orderBy("user_id")),

    // Longest consecutive-day streaks: gaps-and-islands on (user, day)
    // with the day − row_number island label; counting in streak space.
    "q180_streaks" -> ((s, dir) =>
      graft.ops.Retention.streaks(
        Tables.load(s, dir, "events")
          .select(col("user_id"), expr("ts div 86400000000000").as("day")),
        "user_id", "day")
        .orderBy("user_id")),

    // Top user journeys: most common ordered 3-step event-type paths —
    // one per-key lead window, counting in |types|³ path space, rank
    // window over the aggregated frame only.
    "q177_top_paths" -> ((s, dir) =>
      Sessions.topPaths(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type", n = 3, k = 15)
        .orderBy("rank")),

    // Weighted PageRank: rank splits across neighbors in proportion to
    // basket co-occurrence counts — same exact fixed-point integer
    // arithmetic as q171, weighted-share numerators.
    "q178_pagerank_weighted" -> ((s, dir) =>
      graft.ops.Graphs.pageRankWeighted(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", "n_baskets", iters = 4)
        .orderBy("node")),

    // SCD2 time travel: the q168 history filtered to the state AS OF a
    // fixed mid-stream instant — one visible version per key (half-open
    // intervals; zero-length tie rows never visible). A pure pushable
    // row filter, which is why the history gets materialized at all.
    "q175_asof_snapshot" -> ((s, dir) => {
      val hist = Reconciliation.scd2History(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        Seq("user_id"), "ts_us", "event_id")
      Reconciliation.snapshotAsOf(hist, 1705363000000000L)
        .orderBy("user_id")
    }),

    // K-step ordered funnel: view → click → purchase with strictly-after
    // earliest-completion semantics on the (ts, tie) total order —
    // per-stage key counts + exact stage-over-stage conversion. The
    // frontier only shrinks; k bounded joins, no row-data window.
    "q176_funnel_steps" -> ((s, dir) =>
      Sessions.funnelSteps(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // q176 under a 4-hour conversion window: each step must land within
    // 4 h of SOME valid previous-step completion — the non-greedy chain
    // (earliest-frontier is provably wrong under a gap cap; the spec
    // pins the counter-example, the oracle is an independent
    // EXISTS-chain formulation).
    "q225_funnel_windowed" -> ((s, dir) =>
      Sessions.funnelStepsWindowed(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"), maxGapUs = 14400000000L)
        .orderBy("stage")),

    // Deterministic exact-k uniform sample: the k smallest md5(salt|id)
    // draws win — the reservoir sample's result (exactly k, uniform)
    // as a TakeOrderedAndProject plan (per-partition k-heaps, k-row
    // driver merge, no global sort), bit-stable across runs/engines/
    // partitionings where rand()-reservoirs are not. The salt is the
    // epoch knob: change it, get an independent draw.
    "q231_exact_sample" -> ((s, dir) =>
      Chunking.exactKSample(
        Tables.load(s, dir, "documents").select("doc_id", "source"),
        col("doc_id"), k = 60, salt = "epoch7")
        .orderBy("sample_rank")),

    // URL canonicalization: deterministic synthetic URLs (mixed-case
    // schemes/hosts, www/cdn subdomains, default and custom ports,
    // trailing slashes, utm/fbclid tracking params, fragments) built
    // from doc_id arithmetic, then normalized + host + registrable
    // domain (PSL-lite eTLD+1) — every regex drawn from the
    // java.util.regex ∩ RE2 intersection and replayed verbatim.
    "q232_url_normalize" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", syntheticUrl)
        .select(col("doc_id"), col("url"),
          graft.text.Urls.normalizeUrl(col("url")).as("norm_url"),
          graft.text.Urls.urlHost(col("url")).as("host"),
          graft.text.Urls.registrableDomain(
            graft.text.Urls.urlHost(col("url"))).as("reg_domain"))
        .orderBy("doc_id")),

    // Per-domain INCREMENTAL corpus report: the algebraic state built
    // from the historical slice, a delta batch folded in via the q218
    // delta-fold machinery (history never rescanned), ratios derived
    // from the folded sums. The oracle rebuilds the report from the
    // FULL corpus — fold ≡ rebuild is the invariant under test.
    "q233_incremental_report" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val hist = Curation.corpusReportState(
        docs.filter(col("doc_id") < 350), "source", "text")
      Curation.corpusReportIncremental(hist,
        docs.filter(col("doc_id") >= 350), "source", "text")
        .orderBy("domain")
    }),

    // Winnow-backed near-dedup — q45's clusters from the 1/w winnowing
    // index instead of the full shingle index (the SCALE.md shuffle cut),
    // every candidate verified with its exact Jaccard. The oracle replays
    // the winnow candidates, the list-intersect verification, and the
    // recursive closure end-to-end.
    "q234_winnow_near_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.winnowJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, w = 4, maxFingerprintFreq = 100)
      Dedup.removeNearDupes(docs, "doc_id", Dedup.dupClusters(pairs))
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Winnow-backed keep-best selection (q107's survivor rule over the
    // winnow candidate generator).
    "q235_winnow_keep_best" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.winnowJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, w = 4, maxFingerprintFreq = 100)
      Dedup.removeNearDupesKeepBest(docs, "doc_id",
        Dedup.dupClusters(pairs), "n_chars")
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Winnow-backed cross-source duplication report (q96's rollup over
    // the pair seam).
    "q236_winnow_cross_source" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.winnowJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, w = 4, maxFingerprintFreq = 100)
      Dedup.crossSourceDupReportFromPairs(docs, "doc_id", "source", pairs)
        .orderBy("label")
    }),

    // Canonical-URL dedup — the crawl-side "one page, many URLs" op:
    // q232's synthetic URLs collapse by their normalized form (case,
    // www, default ports, fragments, tracking params all folded), each
    // canonical page keeping its min doc_id with a dupe count. One
    // row-local normalization pass + one balanced groupBy shuffle.
    "q238_url_dedup" -> ((s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
        .withColumn("norm_url", graft.text.Urls.normalizeUrl(syntheticUrl))
        .groupBy("norm_url")
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_variants"))
        .orderBy("doc_id")),

    // Mergeable histogram-quantile mart: per-source equi-width histogram
    // state built from the historical slice, a delta batch folded in on
    // the (source, bin) key (history never rescanned), then p50/p90
    // read from the folded state alone — exact to binWidth. The oracle
    // rebuilds the histogram from the FULL corpus and picks quantiles
    // with the same integer cum·1e6 ≥ q·total rule: fold ≡ rebuild.
    "q239_histogram_quantiles" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val state = quality.Sketches.histogramState(
        docs.filter(col("doc_id") < 350), Seq("source"), "n_chars", 50L)
      val folded = quality.Sketches.histogramIncremental(state,
        docs.filter(col("doc_id") >= 350), Seq("source"), "n_chars", 50L)
      quality.Sketches.histogramQuantiles(folded, Seq("source"), 50L,
        Seq(500000L, 900000L))
        .orderBy("source", "q_e6")
    }),

    // Surprisal under a REFERENCE corpus model (every 7th doc as the
    // clean reference) — the CCNet/DCLM perplexity-filter shape with
    // exact whole-bit costs; OOV tokens cost floor(log2 N)+1 bits and
    // are counted separately.
    "q240_reference_surprisal" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.referenceSurprisal(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 7 === 0), "text")
        .orderBy("doc_id")
    }),

    // Winnow-based eval-set decontamination: training docs sharing >= 1
    // winnowing fingerprint with the eval slice (every 50th doc) — the
    // shared-RUN leakage detector (guarantee: any verbatim token run
    // >= w+n-1 with an eval doc is caught), eval fingerprints broadcast,
    // no pair stage. Eval docs flag themselves (shared_frac 1e6) — the
    // q57 self-overlap posture.
    "q241_winnow_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.winnowContamination(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 50 === 0), "text", n = 3, w = 4)
        .orderBy("id")
    }),

    // Johnson–Lindenstrauss sign projection 64→16 + top-5 recall vs the
    // full-dim exact ranking — the dimensionality-reduction/recall curve
    // for embeddings that are NOT matryoshka-trained (q106's complement).
    // The ±1 matrix regenerates from the seed on any engine; projections
    // are sequential zip-folds so the oracle replays them bit-for-bit.
    "q244_random_projection" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val m = Similarity.signProjectionMatrix(64, 16, "jl")
      val proj = emb.withColumn("embedding",
        Similarity.randomProject(col("embedding"), m))
      val queries = (e: org.apache.spark.sql.DataFrame) =>
        e.filter(col("vec_id") < 20)
      Similarity.topKRecall(
        Similarity.bruteForceTopK(emb, queries(emb),
          "vec_id", "embedding", k = 5),
        Similarity.bruteForceTopK(proj, queries(proj),
          "vec_id", "embedding", k = 5))
        .orderBy("query_id")
    }),

    // KMV distinct report — the REPLAYABLE approximate-distinct: per
    // event_type, the exact user count next to the bottom-64 md5 sketch
    // estimate and its signed micro-unit error. Every column (including
    // the estimate itself) hash-compares against the DuckDB replay —
    // approximate ≠ unauditable, the module's whole thesis.
    "q250_kmv_distinct" -> ((s, dir) =>
      Kmv.distinctReport(
        Tables.load(s, dir, "events").select(
          col("event_type"), col("user_id")),
        Seq("event_type"), "user_id", k = 64)
        .orderBy("event_type")),

    // KMV pairwise overlap + theta-style differences, entirely from
    // sketches: per event-type pair over the (user, day) activity sets,
    // merged-bottom-k Jaccard (Beyer et al. 2007), intersection AND
    // both one-sided differences estimated with no exact pass anywhere
    // — the q192 audience matrix at cardinalities where the exact
    // self-join is a 100 TB shuffle. Deterministic end-to-end.
    "q251_kmv_overlap" -> ((s, dir) =>
      Kmv.overlapReport(
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            concat(col("user_id").cast("string"), lit("|"),
              expr("ts div 86400000000000").cast("string")).as("u_day")),
        "event_type", "u_day", k = 64)
        .orderBy("type_a", "type_b")),

    // KMV sketch fold — persisted sketch state (docs < 350) merged with
    // a delta batch's sketches by pure array algebra (≤ 2k longs per
    // group, history never rescanned); the oracle REBUILDS the sketch
    // from the full corpus: fold ≡ rebuild, the q239 incremental
    // posture applied to cardinality. Sketch content pinned via csv.
    "q252_kmv_fold" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val k = 16
      Kmv.foldSketches(
        Kmv.sketches(docs.filter(col("doc_id") < 350),
          Seq("source"), "text", k),
        Kmv.sketches(docs.filter(col("doc_id") >= 350),
          Seq("source"), "text", k),
        Seq("source"), k)
        .select(col("source"),
          size(col("kmv")).cast("long").as("k_used"),
          col("est_kmv"),
          expr("concat_ws(',', transform(kmv, x -> cast(x AS string)))")
            .as("kmv_csv"))
        .orderBy("source")
    }),

    // Cross-layer distinct reconciliation from SKETCHES (the q37 recon
    // posture at sketch scale): distinct users in all events vs in the
    // high-value slice, both KMV-estimated, relative gap in micro-units
    // gated at 50%. Both estimates and the verdict replay in DuckDB —
    // the cross-ENGINE sketch reconciliation KmvSketch promises.
    "q253_kmv_recon" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Reconciliation.distinctSketchReport(
        ev, ev.filter(col("value") > 90.0), "user_id", k = 64,
        toleranceE6 = 500000L)
    }),

    // Per-domain distinct CANONICAL urls — q238's normalization chain
    // composed with the KMV report: dashboards asking "unique pages per
    // domain" at crawl scale read the sketch, sample the exact. k=16
    // leaves some sources saturated and some exact at sf0.01 — both
    // estimator branches replay.
    "q254_url_kmv_distinct" -> ((s, dir) =>
      Kmv.distinctReport(
        Tables.load(s, dir, "documents")
          .select(col("source"),
            graft.text.Urls.normalizeUrl(syntheticUrl).as("norm_url")),
        Seq("source"), "norm_url", k = 16)
        .orderBy("source")),

    // 7-day rolling distinct users from folded DAILY sketches — q173's
    // rolling-actives dashboard with hash-replayable numbers instead of
    // HLL within-band booleans: the raw rows reduce once to a per-day
    // bottom-128 sketch, every window is array re-aggregation over
    // days×k longs. Fold ≡ sketch-of-raw-window is structural and the
    // oracle computes the latter — they must hash-match.
    "q255_kmv_rolling" -> ((s, dir) =>
      Kmv.rollingDistinct(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"), col("user_id")),
        "day", "user_id", k = 128, windowDays = 7)
        .orderBy("day")),

    // KMV-vs-exact error audit, machine-checked: the same (user, day)
    // activity sets estimated at k ∈ {16, 64, 128} next to the exact
    // count — the err_e6 column IS the documented error study (k=16
    // ~±25%, k=128 ~±9% at 1/√k), every cell hash-compared.
    "q256_kmv_error_audit" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          concat(col("user_id").cast("string"), lit("|"),
            expr("ts div 86400000000000").cast("string")).as("u_day"))
      Seq(16, 64, 128)
        .map(k => Kmv.distinctReport(ev, Seq("event_type"), "u_day", k)
          .withColumn("k", lit(k.toLong)))
        .reduce(_.unionByName(_))
        .orderBy("k", "event_type")
    }),

    // Cumulative distinct-to-date growth curve from the same daily
    // sketches (windowDays=0): the corpus-growth / dedup-saturation
    // question ("how many NEW uniques does each day add") read from
    // ≤ k longs per day. Early days ride the exact branch (< k), later
    // days the estimator — both replay.
    "q257_kmv_growth" -> ((s, dir) =>
      Kmv.rollingDistinct(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"),
            concat(col("user_id").cast("string"), lit("|"),
              expr("ts div 86400000000000").cast("string")).as("u_day")),
        "day", "u_day", k = 64, windowDays = 0)
        .orderBy("day")),

    // Weekly actives PER EVENT TYPE from the (type, day) sketch mart —
    // the q255 rolling fold keyed by group (state ≤ types × days × k
    // longs). Saturated and exact branches both present across types.
    "q260_kmv_rolling_by_type" -> ((s, dir) =>
      Kmv.rollingDistinctBy(
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"), col("user_id")),
        Seq("event_type"), "day", "user_id", k = 64, windowDays = 7)
        .orderBy("event_type", "day")),

    // Daily NOVELTY rate: each day's estimated NEW uniques as the lag
    // difference of the cumulative growth curve (q257) — the
    // "is this source still contributing new data" curation signal.
    // Estimator noise can make a day's delta negative; that honesty is
    // the point (and it replays exactly).
    "q261_kmv_novelty" -> ((s, dir) => {
      val cum = Kmv.rollingDistinct(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"),
            concat(col("user_id").cast("string"), lit("|"),
              expr("ts div 86400000000000").cast("string")).as("u_day")),
        "day", "u_day", k = 64, windowDays = 0)
      cum.withColumn("est_new", col("est_kmv") -
          coalesce(lag(col("est_kmv"), 1).over(Window.orderBy("day")),
            lit(0L)))
        .select("day", "est_kmv", "est_new")
        .orderBy("day")
    }),

    // Day-over-day user churn from consecutive daily sketches: per
    // (d, d+1) pair, retained (est_inter), churned (est_only_a) and
    // new (est_only_b) users — the DAU stability dashboard from one
    // daily sketch mart, every estimate hash-compared.
    "q263_kmv_churn" -> ((s, dir) =>
      Kmv.consecutiveOverlap(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"), col("user_id")),
        "day", "user_id", k = 64)
        .orderBy("type_a")),

    // Multi-salt KMV error audit — q256 de-noised: q256's single-draw
    // table showed k=128 WORSE than k=64 (8.4% vs 6.0% mean err), pure
    // one-salt variance that would mislead anyone sizing k. Here the
    // same (type, user-day) sets are hashed under 5 independent salts
    // (md5 of "salt|value") and the per-k MEAN-OF-CELLS absolute error
    // published — 25 cells per k, where 1/√k shows. One row-grain pass
    // (salt-exploded ×5), ONE k=256 sketch per (type, salt): a bottom-16
    // sketch is a PREFIX of a bottom-256 under the same hash, so every
    // smaller k's estimate reads from a slice instead of re-aggregating.
    "q264_kmv_error_multisalt" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          concat(col("user_id").cast("string"), lit("|"),
            expr("ts div 86400000000000").cast("string")).as("u_day"))
        .filter(col("u_day").isNotNull)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("u_day").as("n_exact"))
      val salted = ev
        .withColumn("salt", explode(lit((0L to 4L).toArray)))
        .select(col("event_type"), col("salt"),
          concat(col("salt").cast("string"), lit("|"), col("u_day"))
            .as("item"))
      val sk = salted.groupBy("event_type", "salt")
        .agg(call_function("kmv_sketch", Kmv.hash60(col("item")),
          lit(256)).as("kmv"))
      Seq(16, 64, 128, 256).map { k =>
        sk.join(exact, "event_type")
          .select(lit(k.toLong).as("k"), col("event_type"), col("salt"),
            col("n_exact"),
            Kmv.estimate(slice(col("kmv"), 1, k), k).as("est"))
      }.reduce(_.unionByName(_))
        // |err| clamped at 1000× then e6-scaled via the distinctReport
        // quotient/remainder split (all intermediates BIGINT-safe)
        .withColumn("__ae", expr("least(abs(est - n_exact), n_exact * 1000)"))
        .withColumn("abs_err_e6", expr("(__ae div n_exact) * 1000000 + " +
          "(__ae % n_exact) * 1000000 div n_exact"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_cells"),
          expr("sum(abs_err_e6) div count(1)").as("mean_abs_err_e6"),
          max("abs_err_e6").as("max_abs_err_e6"))
        .orderBy("k")
    }),

    // Replayable approximate QUANTILES — the sketch family the quality
    // surface lacked: a deterministic md5-keyed uniform row sample
    // (native kmv_values: bottom-k by row-id hash, carrying the value)
    // gives per-group order statistics that replay in DuckDB the way
    // KMV distinct estimates do — unlike GK approx_percentile, whose
    // state is engine-internal. ≤ k (hash, value) pairs per task×group,
    // no row-grain shuffle; p25/p50/p90/p99 of line price (cents, the
    // e2 convention) per return flag, every cell hash-compared.
    "q265_kmv_quantiles" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"),
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")).as("rid"),
          round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      Kmv.quantileReport(li, Seq("l_returnflag"), "rid", "price_e2",
        k = 128, qE6s = Seq(250000L, 500000L, 900000L, 990000L))
        .orderBy("l_returnflag")
    }),

    // Value-sample FOLD ≡ one-shot rebuild (the q252 posture for
    // quantiles): per-half value sketches folded into one state, whose
    // quantiles the oracle computes from the FULL corpus in one pass —
    // bottom-k-by-hash of a union of bottom-ks is the union's bottom-k,
    // so they must hash-match. This is the mergeable path: daily
    // quantile marts re-aggregate sample frames, never history.
    "q266_kmv_quantile_fold" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          concat(col("l_orderkey").cast("string"), lit("|"),
            col("l_linenumber").cast("string")).as("rid"),
          round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      val state = Kmv.valueSketches(li.filter(col("l_orderkey") % 2 === 0),
        Seq("l_returnflag"), "rid", "price_e2", k = 128)
      val delta = Kmv.valueSketches(li.filter(col("l_orderkey") % 2 =!= 0),
        Seq("l_returnflag"), "rid", "price_e2", k = 128)
      Kmv.quantilesFromValueSketches(
        Kmv.foldValueSketches(state, delta, Seq("l_returnflag"), k = 128),
        Seq("l_returnflag"), Seq(500000L, 900000L))
        .orderBy("l_returnflag")
    }),

    // Mass-WEIGHTED KMV overlap: what fraction of each source's TOKEN
    // MASS rides on vocabulary shared with the other source — two
    // corpora can have tiny item-Jaccard yet share the heavy head of
    // their token distributions (or a massless shared tail). Ratio of
    // two sample sums over the one merged bottom-k (est_union cancels →
    // every intermediate a bounded BIGINT); one row-grain token-count
    // pass, then k pairs of state per source. All columns hash-compared.
    // Items are word BIGRAMS (the synthetic corpus shares one unigram
    // vocabulary across sources — unigram overlap is vacuously 1.0;
    // bigram sets genuinely diverge, Jaccard ~0.65–0.85 at sf0.01).
    "q270_kmv_weighted_overlap" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .withColumn("t", split(trim(col("text")), " "))
        .filter(size(col("t")) >= 2)
        .select(col("source"),
          explode(expr("transform(sequence(1, size(t) - 1), i -> " +
            "concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
            .as("tok"))
        .withColumn("occ", lit(1L))
      Kmv.weightedOverlapReport(toks, "source", "tok", "occ", k = 64)
        .orderBy("type_a", "type_b")
    }),

    // Rolling 7-day p50/p90 of event value from DAILY value-sketch
    // marts — the q255 rolling posture for quantiles: raw rows reduce
    // once to ≤ k (hash, value) pairs per day; each window cell is pure
    // re-aggregation over days × k pairs (broadcast day lattice). Fold
    // ≡ one-shot makes every window's sample equal the raw window's
    // sample, which is exactly what the oracle computes.
    "q272_kmv_rolling_quantiles" -> ((s, dir) =>
      Kmv.rollingQuantiles(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"), col("event_id"),
            round(col("value") * 100).cast("long").as("value_e2")),
        "day", "event_id", "value_e2", k = 64,
        qE6s = Seq(500000L, 900000L), windowDays = 7)
        .orderBy("day")),

    // q272's rolling quantile mart PER EVENT TYPE — the
    // rollingDistinctBy posture for order statistics: one (type, day)
    // value-sketch mart, re-aggregation keyed on (type, window-day),
    // state ≤ types × days × k pairs.
    "q273_kmv_rolling_quantiles_by_type" -> ((s, dir) =>
      Kmv.rollingQuantilesBy(
        Tables.load(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"), col("event_id"),
            round(col("value") * 100).cast("long").as("value_e2")),
        Seq("event_type"), "day", "event_id", "value_e2", k = 64,
        qE6s = Seq(500000L), windowDays = 7)
        .orderBy("event_type", "day")),

    // Mass-weighted overlap ACROSS corpora: per (training source ×
    // eval-slice lang) pair, the share of each side's bigram MASS
    // riding on shared vocabulary — the q262 decontamination dashboard
    // weighted by token mass instead of counting distinct items. Each
    // corpus pays one count pass + one sketch; the pair stage is
    // groups² rows of ≤ 2k pairs.
    "q274_kmv_weighted_cross" -> ((s, dir) => {
      val big = Tables.load(s, dir, "documents")
        .withColumn("t", split(trim(col("text")), " "))
        .filter(size(col("t")) >= 2)
        .select(col("source"), col("lang"), col("doc_id"),
          explode(expr("transform(sequence(1, size(t) - 1), i -> " +
            "concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
            .as("tok"))
        .withColumn("occ", lit(1L))
      Kmv.weightedCrossOverlapReport(
        big, "source", "tok", "occ",
        big.filter(col("doc_id") % 50 === 0), "lang", "tok", "occ",
        k = 64)
        .orderBy("type_a", "type_b")
    }),

    // Pairwise two-sample KS distance between event types' value
    // distributions from value SKETCHES — the drift alarm at ≤ k rows
    // of state per type: D = max |ecdf_a − ecdf_b| over the union of
    // sample values, every count an integer over fixed arrays, so the
    // statistic replays exactly.
    "q275_kmv_sample_ks" -> ((s, dir) =>
      Kmv.sampleKsReport(
        Tables.load(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("value_e2")),
        "event_type", "event_id", "value_e2", k = 128)
        .orderBy("type_a", "type_b")),

    // Day-over-day KS drift: the two-sample KS distance between each
    // consecutive day pair's value samples — "did today's distribution
    // shift against yesterday's", the q263 churn posture for
    // DISTRIBUTIONS; one daily sample mart, one day-lattice self-join
    // (days × 2k pairs), every D an integer over fixed arrays.
    "q276_kmv_ks_daily" -> ((s, dir) =>
      Kmv.consecutiveKs(
        Tables.load(s, dir, "events")
          .select(expr("ts div 86400000000000").as("day"), col("event_id"),
            round(col("value") * 100).cast("long").as("value_e2")),
        "day", "event_id", "value_e2", k = 128)
        .orderBy("type_a")),

    // Heavy-hitter × cardinality dashboard: per event type, the top-3
    // users by event count (bounded-heap topk_longs over cnt·2³²+user —
    // ≤ 3 longs per task×group cross the shuffle, ties break to the
    // higher user id in both engines) NEXT TO the KMV user-cardinality
    // estimate and exact volume — "is this type's volume a few bots or
    // a broad audience", the q32 rare-category question inverted and
    // read at sketch cost. Every cell hash-compared.
    "q271_heavy_hitter_cardinality" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select("event_type", "user_id")
      val perType = ev.groupBy("event_type")
        .agg(call_function("kmv_sketch", Kmv.hash60(col("user_id")),
          lit(64)).as("kmv"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"),
          Kmv.estimate(col("kmv"), 64).as("est_users"), col("n_events"))
      val hh = ev.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
        // the packing is only injective while user_id fits 32 bits and
        // cnt 31 — outside that range the ranking silently corrupts in
        // BOTH engines (the oracle replays the same encoding and can't
        // catch it), so fail loudly instead (r19 self-review finding)
        .withColumn("enc", expr(
          "CASE WHEN user_id < 0 OR user_id >= 4294967296 " +
            "OR cnt >= 2147483648 THEN " +
            "raise_error('q271: user_id/cnt exceed the cnt*2^32+user " +
            "packing range') " +
            "ELSE cnt * 4294967296 + user_id END"))
        .groupBy("event_type").agg(expr("topk_longs(enc, 3)").as("top"))
        .select(col("event_type"),
          posexplode(col("top")).as(Seq("pos", "enc")))
        .select(col("event_type"),
          (col("pos") + 1).cast("long").as("rank"),
          expr("enc div 4294967296").as("cnt"),
          expr("enc % 4294967296").as("user_id"))
      hh.join(perType, "event_type")
        .select(col("event_type"), col("rank"), col("user_id"), col("cnt"),
          expr("cnt * 1000000 div n_events").as("share_e6"),
          col("est_users"), col("n_events"))
        .orderBy("event_type", "rank")
    }),

    // Multi-join analytic headliners — the fact⋈dim⋈dim shapes a 100 TB
    // warehouse actually runs (the gold marts and q05–q07 exercise 1–2
    // joins only). Declarative joins + decimal-exact revenue; the
    // filters sit ON the scans (pushed to parquet), small dims are
    // explicit broadcast()s, fact⋈fact shuffles hash-partition on the
    // join key. AnalyticJoinsSpec asserts the physical plans (broadcast
    // where expected, no nested-loop/cartesian, PushedFilters reaching
    // the scans).

    // TPC-H Q3 shape: unshipped-order revenue — customer(segment) ⋈
    // orders(date<) ⋈ lineitem(ship>) → top-10 orders by revenue.
    "q267_q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate < timestamp'1998-07-01 00:00:00'"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate > timestamp'1998-07-01 00:00:00'"))
        .select(col("l_orderkey"),
          expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
            .as("rev"))
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: local-supplier volume — 6-table join (region ⋈
    // nation broadcast into supplier; lineitem ⋈ orders ⋈ customer
    // shuffles; the c_nationkey = s_nationkey co-nation constraint rides
    // the broadcast join) → revenue per ASIA nation.
    "q268_q5_local_supplier_volume" -> ((s, dir) => {
      val nr = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp'1997-01-01 00:00:00' and " +
          "o_orderdate < timestamp'1998-01-01 00:00:00'"))
        .select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
            .as("rev"))
      // no broadcast hint on sup (r19 verdict): AQE already sizes the
      // ASIA-restricted supplier side at runtime — an unconditional hint
      // would force a broadcast even at an SF where supplier outgrows
      // the threshold (q267's measured AQE flip is the model)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // TPC-H Q7 shape: cross-nation trade volume — the join topology the
    // other headliners don't have: nation joined TWICE under aliases
    // (supplier side and customer side) with a symmetric two-nation
    // predicate, revenue per (supp_nation, cust_nation, ship year).
    // The two-nation restriction is applied to nation BEFORE it joins
    // supplier/customer (r19 verdict): only the two nations' suppliers
    // and customers ever flow into the fact joins, cutting the
    // lineitem⋈orders shuffle ~(2/25)× vs filtering after — at 100 TB
    // the difference between shuffling every nation's trade and the
    // pair's. The symmetric (3,7)/(7,3) pair predicate must stay
    // post-join (it needs BOTH sides), but it now only rejects the two
    // same-nation combinations. Supplier carries no broadcast hint —
    // AQE sizes the restricted side at runtime.
    "q277_q7_nation_trade" -> ((s, dir) => {
      val theTwo = Seq("NATION_3", "NATION_7")
      val n1 = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin(theTwo: _*))
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin(theTwo: _*))
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .select(col("c_custkey"), col("cust_nation"))
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.load(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp'1997-01-01 00:00:00' and " +
          "l_shipdate < timestamp'1999-01-01 00:00:00'"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
            .as("rev"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" &&
            col("cust_nation") === "NATION_3"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10 shape: returned-item losses per customer — lineitem(R)
    // ⋈ orders(quarter) ⋈ customer ⋈ nation(broadcast) → top-20
    // customers by lost revenue.
    "q269_q10_returned_items" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp'1998-01-01 00:00:00' and " +
          "o_orderdate < timestamp'1998-04-01 00:00:00'"))
        .select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
      val nat = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
            .as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders — an IN over a
    // grouped-HAVING subquery (orders whose lineitems sum past a
    // quantity threshold), reported with lineitem/customer detail. The
    // key-set derivation is one map-side-combinable groupBy over
    // lineitem's two-column projection; the IN rides a HASH join on
    // o_orderkey (never a nested loop — the key set is unbounded, so a
    // broadcast-IN literal list would not survive scale-up).
    // l_quantity is integral-valued, so the double sums are exact in
    // any order and hash-compare with the oracle.
    "q278_q18_large_orders" -> ((s, dir) => {
      // ONE lineitem scan (r21, the r20 verdict's plan-debt item): the
      // HAVING aggregate's per-order quantity sum IS the report's
      // total_qty — the semi-join keys are exactly the surviving groups,
      // so carrying `__q` through an inner join is value-identical to
      // the old semi-join + raw-lineitem re-join + re-aggregate, at half
      // the fact scans and half the fact aggregations. l_quantity is
      // integral-valued, so the sum is exact in any order (hash-stable).
      val big = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 250.0)
      val cust = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name")
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("__q").as("total_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q21 shape: suppliers who kept the order waiting — the
    // EXISTS + NOT EXISTS fact×fact self-join topology: returned ('R')
    // lines of finalized orders where ANOTHER supplier shipped a line
    // in the same order (semi) but NO other supplier's line was
    // returned (anti) — the sole-offender attribution. Both quantified
    // predicates are hash joins equi-keyed on l_orderkey with the
    // supplier inequality as a residual condition, so each is one
    // key-partitioned pass over lineitem's 3-column projection; the
    // driver holds no key list. (The env's lineitem has no
    // receipt/commit dates, so "late" maps to l_returnflag = 'R';
    // the reference-side anchor is reconciliation's anti-join
    // semantics, reconciliation.py:268-273, scaled to fact×fact.)
    "q279_q21_waiting_suppliers" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val fOrders = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(fOrders, col("l_orderkey") === col("o_orderkey"),
          "left_semi")
      val l2 = li.select(col("l_orderkey").as("k2"),
        col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val sup = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name")
      l1
        .join(l2, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_suppkey"))
        .limit(100)
    }),

    // TPC-H Q17 shape: small-quantity revenue loss — the CORRELATED
    // SCALAR SUBQUERY topology (the last fact-scale join class the
    // headliner suite lacked): revenue from lines below 20% of their
    // part's average quantity, over one selective brand. The correlated
    // avg is evaluated as a per-key aggregate JOINED BACK, never a
    // per-row re-scan — and it aggregates only the BRAND-RESTRICTED
    // lineitem (the broadcast part semi-restriction runs below BOTH
    // branches), because the subquery is only ever probed at the
    // selected parts' keys: at 100 TB the avg side aggregates ~73/2000
    // of lineitem, not all of it. avg(l_quantity) is deterministic
    // (integral-valued doubles sum exactly in any order; one IEEE
    // divide), and revenue rides the exact-decimal convention.
    "q282_q17_small_qty_revenue" -> ((s, dir) => {
      val pts = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val liP = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
      val avgQ = liP
        .groupBy(col("p_partkey").as("__ap"))
        .agg(avg(col("l_quantity")).as("__avg_qty"))
      liP.join(avgQ, col("p_partkey") === col("__ap"))
        .filter(col("l_quantity") < lit(0.2) * col("__avg_qty"))
        .agg((sum(expr("CAST(l_extendedprice AS DECIMAL(18,4))"))
          .cast("double") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q22 shape: idle above-average balances — the GLOBAL scalar
    // subquery + fact anti-join topology: customers in a nation set
    // whose balance beats the set's positive-balance average and who
    // placed no RECENT order (no order at all is vacuous here — every
    // customer has one — so the anti side is date-restricted, which is
    // also the realistic churn question). The global average rides a
    // 1-ROW broadcast stat frame (the documented crossJoin exception:
    // nothing shuffles, the fact side streams once), and the threshold
    // compare stays in exact integer space — bal·count > sum as
    // DECIMAL×BIGINT — so no engine divides early; the anti join is a
    // hash LeftAnti on c_custkey against the date-pruned orders
    // projection, the same shape at any scale.
    "q283_q22_idle_balances" -> ((s, dir) => {
      val nations = Seq(1, 3, 5, 7, 9)
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey").isin(nations: _*))
        .select(col("c_custkey"),
          col("c_nationkey").cast("long").as("nationkey"),
          expr("CAST(c_acctbal AS DECIMAL(18,2))").as("__bal"))
      val stat = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 0 && col("c_nationkey").isin(nations: _*))
        .agg(sum(expr("CAST(c_acctbal AS DECIMAL(18,2))")).as("__spos"),
          count(lit(1)).as("__cpos"))
      val recent = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp'2000-06-01 00:00:00'"))
        .select("o_custkey")
      cust.crossJoin(broadcast(stat))
        .filter(col("__bal") * col("__cpos") > col("__spos"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(col("__bal")).cast("double").as("totacctbal"))
        .orderBy("nationkey")
    }),

    // TPC-H Q13 shape: customer order-count distribution — the
    // fact×fact LEFT OUTER topology (the last join class uncovered):
    // customers must survive with count 0 when no order matches, so the
    // zero bucket of the histogram IS the outer semantics (a selective
    // recent-urgent restriction keeps it non-empty at every SF). The
    // restriction references only the orders side, so for a LEFT join
    // it pushes into the orders SCAN instead of living in the join
    // condition — at 100 TB the probe side arrives pre-pruned. The
    // custkey join's exchange is reused by the per-customer count
    // (same key), and the count-of-counts re-aggregation collapses
    // map-side to the ~|buckets| keyspace.
    "q284_q13_customer_distribution" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          expr("o_orderdate >= timestamp'2000-01-01 00:00:00'"))
        .select("o_orderkey", "o_custkey")
      Tables.load(s, dir, "customer")
        .select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q8 shape: nation market share — the DEEPEST join tree in
    // the suite (7 tables: part, lineitem, orders, customer, supplier,
    // nation ×2 aliased, region) plus the share-of-total ratio pattern
    // (conditional sum / total sum per group). Every selective dim is
    // restricted BEFORE it meets the fact (PROMO parts broadcast into
    // lineitem; AMERICA's nations broadcast into customer — only that
    // region's customers reach the orders join; the supplier side keeps
    // ALL nations because the share needs the total), and the share is
    // computed in exact integer space — both decimal sums scaled to e4
    // BIGINT units, ·10⁶ div — because a double/double→BIGINT cast
    // diverges between engines (DuckDB rounds, Spark truncates).
    // BIGINT envelope: rev_e4 sums ≤ ~10¹² at sf1~ ×10⁶ < 9.2·10¹⁸;
    // at a true 100 TB apply the quotient/remainder split the
    // containment math uses.
    "q285_q8_market_share" -> ((s, dir) => {
      val nCust = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val cust = Tables.load(s, dir, "customer")
        .join(broadcast(nCust), col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val nSupp = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val sup = Tables.load(s, dir, "supplier")
        .join(broadcast(nSupp), col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val pts = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp'1997-01-01 00:00:00' and " +
          "o_orderdate < timestamp'1999-01-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"), col("l_suppkey"),
          expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
            .as("rev"))
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_2", col("rev"))
            .otherwise(expr("CAST(0.0000 AS DECIMAL(18,4))"))).as("__num"),
          sum(col("rev")).as("__den"))
        .select(col("o_year"),
          expr("CAST(__num * 10000 AS BIGINT) * 1000000 div " +
            "greatest(CAST(__den * 10000 AS BIGINT), 1)")
            .as("mkt_share_e6"),
          col("__den").cast("double").as("total_rev"))
        .orderBy("o_year")
    }),

    // FULL OUTER reconciliation — the one join type the suite lacked:
    // booked revenue by ORDER day vs shipped revenue by SHIP day, every
    // day classified both / booked_only / shipped_only (the symmetric
    // source-vs-target diff; anti-joins give each side separately, full
    // outer gives the whole ledger in one pass — and a day present on
    // neither side can't exist by construction). Scale shape: the two
    // facts collapse map-side to day grain BEFORE the join, so the full
    // outer joins two |days|-row frames — never fact×fact (Spark plans
    // equi full-outer as a sort-merge/shuffled-hash join; no broadcast
    // form exists, which is exactly why you aggregate first). Nulls
    // from the outer sides are coalesced to exact-decimal zeros, not
    // left as NULL doubles, so the compare never meets engine-specific
    // NULL/NaN ordering.
    "q286_recon_full_outer" -> ((s, dir) => {
      val booked = Tables.load(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("bday"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("__b"))
      val shipped = Tables.load(s, dir, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("sday"))
        .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) " +
          "AS DECIMAL(18,4))")).as("__s"))
      booked.join(shipped, col("bday") === col("sday"), "full")
        .select(
          coalesce(col("bday"), col("sday")).as("day"),
          when(col("bday").isNull, "shipped_only")
            .when(col("sday").isNull, "booked_only")
            .otherwise("both").as("status"),
          coalesce(col("__b"), expr("CAST(0.00 AS DECIMAL(18,2))"))
            .cast("double").as("booked"),
          coalesce(col("__s"), expr("CAST(0.0000 AS DECIMAL(18,4))"))
            .cast("double").as("shipped"))
        .orderBy("day")
    }),

    // MASS-weighted two-sample KS between sources' doc-length
    // distributions: each sampled doc counts its TOKEN MASS in the
    // ECDF, not 1/k — a length drift confined to a source's many
    // near-empty docs stops outranking one in its few giant docs (the
    // q270 weighting applied to q275's statistic). The unweighted
    // ks_e6 rides along to show when the two disagree; every cell an
    // integer mass cumsum ·10⁶ div sample mass, hash-compared. Both hot
    // paths are native expressions (spec-pinned ≡ their builtin twins):
    // token mass = the ws_token_count byte scan (the count-only HOF
    // form allocates ~600 slices per 4 KB doc just to read a length),
    // and the per-pair statistics = the weighted_ks sort-merge sweep
    // (the HOF chain burned ~50M interpreted lambda calls over 190
    // pairs). Together measured 3.86 → 0.60 s at sf0.1.
    "q280_kmv_weighted_ks" -> ((s, dir) =>
      Kmv.weightedSampleKsReport(
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            call_function("ws_token_count", col("text")).as("n_toks")),
        "source", "doc_id", "n_chars", "n_toks", k = 128)
        .orderBy("type_a", "type_b")),

    // MASS-weighted quantiles per source: the doc length under which
    // q of the TOKEN MASS sits (vs q of the docs — the q265 rank
    // statistic re-weighted). The crossing test is one fixed integer
    // comparison over the (v, m)-sorted sample, so each cell replays
    // bit-for-bit from the same ≤ k-pair sample state.
    "q281_kmv_weighted_quantiles" -> ((s, dir) =>
      Kmv.weightedQuantileReport(
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            call_function("ws_token_count", col("text")).as("n_toks")),
        Seq("source"), "doc_id", "n_chars", "n_toks", k = 128,
        qE6s = Seq(250000L, 500000L, 750000L))
        .orderBy("source")),

    // Directional CONTAINMENT from sketches — the decontamination
    // metric proper: an eval-lang vocabulary 90% contained in a
    // training source is a leak even when the Jaccard is tiny (the
    // training side dwarfs it). |A∩B|/|A| and the mirror, both from
    // the merged theta sample, both hash-compared.
    "q262_kmv_containment" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("source"), col("lang"), col("doc_id"),
        explode(split(trim(col("text")), " ")).as("tok"))
      Kmv.containmentReport(
        toks, "source", "tok",
        toks.filter(col("doc_id") % 50 === 0), "lang", "tok", k = 64)
        .orderBy("type_a", "type_b")
    }),

    // Rendezvous (HRW) resharding plan, 8 → 10 shards: every
    // (from, to) cell with its key count — row-local argmax-of-md5
    // routing whose growth moves only the keys claimed by the NEW
    // shards (~2/10 here, vs 9/10 under mod-n). The oracle replays the
    // full argmax table: every moved cell must land on shard 8 or 9.
    "q258_rendezvous_reshard" -> ((s, dir) =>
      graft.maintenance.Layout.reshardReport(
        Tables.load(s, dir, "documents"), "doc_id", nFrom = 8, nTo = 10)
        .orderBy("shard_from", "shard_to")),

    // Cross-corpus KMV overlap: per-source training vocabularies vs the
    // eval slice's per-LANGUAGE vocabularies, every (source × lang)
    // pair's Jaccard / intersection / one-sided differences estimated
    // from sketches alone — the "which domain leaks into which eval
    // suite" dashboard where each corpus pays one aggregate and the
    // pair stage is groups×k longs. All estimates hash-compared.
    "q259_cross_overlap" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("source"), col("lang"), col("doc_id"),
        explode(split(trim(col("text")), " ")).as("tok"))
      Kmv.crossOverlapReport(
        toks, "source", "tok",
        toks.filter(col("doc_id") % 50 === 0), "lang", "tok", k = 64)
        .orderBy("type_a", "type_b")
    }),

    // Greedy sentence-boundary packing (q242's punctuated corpus, 25
    // tokens per chunk): each sentence joins the current chunk or opens
    // the next — never cut mid-sentence. Row-local fold; the oracle
    // replays the greedy recurrence as a recursive CTE over sent_idx.
    "q249_sentence_packing" -> ((s, dir) =>
      Chunking.packBySentences(
        Tables.load(s, dir, "documents").withColumn("text",
          regexp_replace(col("text"), "((\\S+ ){4}\\S+) ", "$1. ")),
        "doc_id", "text", maxTokens = 25)
        .orderBy("doc_id", "sent_idx")),

    // Corpus data card: the one-call release datasheet — global size,
    // per-domain composition/share, gate pass rates, exact-dup mass,
    // token-length p50/p90 — one long exact-integer frame composed from
    // the existing single-pass reports.
    "q248_data_card" -> ((s, dir) =>
      Curation.dataCard(Tables.load(s, dir, "documents"),
        "doc_id", "source", "text")
        .orderBy("section", "domain", "metric")),

    // Per-domain PII density: deterministic emails (every 4th doc) and
    // digit runs (every 6th) injected into the clean corpus, redaction
    // rules applied in order (each counting what IT sees), rolled up to
    // the per-source governance rates. One pass + one grouped agg.
    "q247_pii_density" -> ((s, dir) => {
      val id = col("doc_id")
      Curation.piiDensityReport(
        Tables.load(s, dir, "documents").withColumn("text", concat(
          col("text"),
          when(id % 4 === 0,
            concat(lit(" contact user"), id, lit("@example.com")))
            .otherwise(""),
          when(id % 6 === 0, " ref 9081726354").otherwise(""))),
        "source", "text", Seq(
          graft.config.PiiRule("text", Curation.PiiPatterns.Email,
            "[EMAIL]"),
          graft.config.PiiRule("text", Curation.PiiPatterns.NumericId,
            "[ID]")))
        .orderBy("domain")
    }),

    // Histogram-bounded winsorization — q71's clamp exact to binWidth
    // from two grouped counts + one broadcast join, never buffering a
    // group's values (the 100 TB path the exact percentile can't walk).
    // Values scale to integral e2 first (the micro-unit convention).
    "q246_winsorize_histogram" -> ((s, dir) =>
      quality.Sketches.winsorizeByHistogram(
        Tables.load(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("value_e2")),
        Seq("event_type"), "value_e2", binWidth = 500L,
        loE6 = 50000L, hiE6 = 950000L)
        .orderBy("event_id")),

    // Unicode-script composition over a deterministically-mixed corpus
    // (every 3rd doc gains a Cyrillic suffix, every 3rd+1 a Han suffix —
    // the source corpus is pure ASCII): exact per-script letter counts +
    // dominant-script routing label. Row-local, zero shuffle.
    "q245_script_profile" -> ((s, dir) => {
      val id = col("doc_id")
      TextAnalysis.scriptProfile(
        Tables.load(s, dir, "documents").withColumn("text", concat(
          col("text"),
          when(id % 3 === 1, " привет мир")
            .when(id % 3 === 2, " 你好世界")
            .otherwise(""))),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Sentence segmentation over a deterministically-punctuated corpus
    // (every 5th token boundary becomes ". " — the corpus itself carries
    // no punctuation): filtered split + 1-based positional index, all in
    // the java.util.regex ∩ RE2 intersection. Row-local, zero shuffle.
    "q242_sentence_split" -> ((s, dir) =>
      Chunking.sentenceSplit(
        Tables.load(s, dir, "documents").withColumn("text",
          regexp_replace(col("text"), "((\\S+ ){4}\\S+) ", "$1. ")),
        "doc_id", "text")
        .orderBy("doc_id", "sent_idx")),

    // Sequence-length utilization curve: per candidate max_seq_len, the
    // sequence count, padded slots, and slot utilization under the
    // chunked (pack-free) layout — the report that picks max_seq_len.
    // One corpus pass; exact integers throughout.
    "q243_seqlen_report" -> ((s, dir) =>
      Chunking.seqLenUtilization(Tables.load(s, dir, "documents"), "text",
        Seq(32, 64, 128))
        .orderBy("seq_len")),

    // Winnow-backed leakage-safe split (q143's cluster-as-unit assignment
    // over the winnow candidate generator).
    "q237_winnow_leakage_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.winnowJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, w = 4, maxFingerprintFreq = 100)
      Chunking.leakageSafeSplit(docs, "doc_id", Dedup.dupClusters(pairs),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // Unicode canonical dedup: the corpus plus TWO deterministically-
    // mangled copies of every 10th doc — one suffixed with composed
    // accents (é, ö), one with decomposed combining marks (e+U+0301,
    // O+U+0308), different case/spacing/punctuation. Byte-distinct,
    // canonically equivalent: NFC (the native nfc_normalize expression,
    // named for DuckDB's identical builtin) + unicode lower + the
    // \p{L}\p{Nd} fold collapse each pair onto one group per source
    // doc; the originals, lacking the suffix, stay out.
    "q230_unicode_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val tenth = docs.filter(col("doc_id") % 10 === 0)
      val v1 = tenth.select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(col("text"), lit(" Caf\u00e9 N\u00f6is")).as("text"))
      val v2 = tenth.select((col("doc_id") + lit(20000000L)).as("doc_id"),
        concat(col("text"), lit("  cafe\u0301   NO\u0308IS !!")).as("text"))
      Dedup.canonicalDupGroupsUnicode(
        docs.unionByName(v1).unionByName(v2), "doc_id", "text")
        .select("fingerprint", "keep_id", "copies")
        .orderBy("keep_id")
    }),

    // Learned quality scoring: a fixed sparse weight vector over the
    // q194 hashed-feature space applied as a ROW-LOCAL token fold (zero
    // shuffle, zero join — the plan a model filter needs at 100 TB);
    // exact integer score + the rational fast-sigmoid squash (exp-free,
    // so the hash compare can never straddle a libm ulp).
    "q229_quality_model" -> ((s, dir) =>
      graft.text.Curation.scoreLinearModel(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        weightsE6 = Map(3 -> 150000L, 9 -> -250000L, 17 -> 90000L,
          28 -> -40000L, 41 -> 500000L, 55 -> -120000L),
        biasE6 = 10000L, nBuckets = 64)
        .select(col("doc_id"), col("score_e6"), col("prob_e6"))
        .orderBy("doc_id")),

    // Per-type autocorrelation of daily event counts at lags 1..7 — the
    // period FINDER next to seasonalResiduals' period REMOVER; exact
    // cross-multiplied integers, two-step ×1000 Long division.
    "q228_acf" -> ((s, dir) =>
      graft.ops.TimeSeries.acfReport(
        Tables.load(s, dir, "events")
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n")),
        Seq("event_type"), "day", "n", maxLag = 7)
        .orderBy("event_type", "lag")),

    // EWMA control chart on daily event counts per type (α = 0.3, band
    // 10 counts): the small-shift monitor next to CUSUM (q162) and the
    // moving-average window (q31) — exact e6 per-step fold, each point
    // tested against the PRE-update level.
    "q227_ewma_chart" -> ((s, dir) =>
      Anomaly.ewmaChart(
        Tables.load(s, dir, "events")
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n")),
        Seq("event_type"), "day", "n",
        alphaE6 = 300000L, bandE6 = 10000000L)
        .orderBy("event_type", "day")),

    // q196's pairs re-weighted by exponential half-life decay (30 min
    // half-life inside the 4 h window → quantized power-of-two raw
    // weights, exact e6 normalized shares).
    "q226_time_decay" -> ((s, dir) =>
      Sessions.timeDecayAttribution(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_id", "event_type",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowUs = 14400000000L, halfLifeUs = 1800000000L)
        .orderBy("conv_tie", "position")),

    // Sketch-space rolling actives: q163's exact DAU/WAU next to the HLL
    // window form (per-day sketches, range-frame union — the 100 TB
    // path), gated by the q114 invariant pattern: estimates must sit
    // within 5% of exact, as oracle-TRUE booleans.
    "q173_rolling_active_approx" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val exact = graft.ops.Retention.rollingActive(ev, "user_id", "day", 7)
      val approx = graft.ops.Retention.rollingActiveApprox(
        ev, "user_id", "day", 7)
      exact.join(approx, "day")
        .select(col("day"), col("dau"), col("wau"),
          (abs(col("dau_est") - col("dau").cast("double"))
            <= col("dau").cast("double") * lit(0.05)).as("dau_ok"),
          (abs(col("wau_est") - col("wau").cast("double"))
            <= col("wau").cast("double") * lit(0.05)).as("wau_ok"))
        .orderBy("day")
    }),

    // Day-of-week seasonal residuals: each (type, day) daily mass scored
    // against ITS weekday slot's baseline (epoch-anchored day%7 — exact
    // integer, no engine dow trap) from exact BIGINT sufficient stats;
    // z via the fixed IEEE divide/sqrt dag.
    "q174_seasonal_residuals" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(round(col("value") * lit(100)).cast("long")).as("y_e2"))
      Anomaly.seasonalResiduals(daily, Seq("event_type"), "day", "y_e2", 7)
        .orderBy("event_type", "day")
    }),

    // Deterministic integer PageRank over the basket co-occurrence graph:
    // e9 fixed-point ranks, floor-division shares, exact integer sums —
    // bit-identical on any engine/partitioning (a double PageRank's sum
    // order drifts). 5 fixed rounds; the oracle unrolls them.
    "q171_pagerank" -> ((s, dir) =>
      graft.ops.Graphs.pageRank(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", iters = 5)
        .orderBy("node")),

    // 3-core of the same graph by iterative peeling (≤8 rounds, fixpoint
    // short-circuit) — the dense-subgraph detector; the oracle replays
    // exactly 8 peels (idempotent past the fixpoint, so parity holds
    // whichever side converges first).
    "q172_kcore" -> ((s, dir) =>
      graft.ops.Graphs.kCore(
        Baskets.basketPairs(Tables.load(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", maxBasketSize = 20, minCount = 2L),
        "item_a", "item_b", k = 3, maxRounds = 8)
        .orderBy("node")),

    // SCD Type-2 history: each user's event stream becomes a versioned
    // validity timeline — valid_to = the next change's timestamp, null
    // while current. One keyed window; completes the CDC family
    // (snapshotDiff derives, applyChangeSet replays, this materializes
    // the as-of-queryable dimension history).
    "q168_scd2_history" -> ((s, dir) =>
      Reconciliation.scd2History(
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
        Seq("user_id"), "ts_us", "event_id")
        .orderBy("user_id", "version")),

    // Functional-dependency audit: which customers violate
    // o_custkey → o_orderpriority (most — repeat customers order at
    // mixed priorities; the empty-output case is the contract gate).
    // Null rhs counts as its own contradictory value.
    "q169_fd_violations" -> ((s, dir) =>
      Checks.fdViolations(Tables.load(s, dir, "orders"),
        Seq("o_custkey"), "o_orderpriority")
        .orderBy("o_custkey")),

    // Benford first-digit profile of order totals: exact e2-integer
    // digit extraction (never double formatting), literal Benford
    // shares, per-digit χ² contribution as a fixed IEEE dag.
    "q170_benford" -> ((s, dir) =>
      Anomaly.benfordReport(Tables.load(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")),

    // Cross-table fuzzy linkage: q157's deletion-neighborhood blocking
    // between a dirty probe set (deterministically perturbed names —
    // first char dropped, or last char dropped so TEN canonical rows
    // match) and the canonical customer dim. Oracle is the quadratic
    // cross join.
    "q166_fuzzy_link" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val probes = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("p_id"),
          when(col("c_custkey") % 2 === 0,
            expr("substring(c_name, 2)"))
            .otherwise(expr("substring(c_name, 1, length(c_name) - 1)"))
            .as("p_name"))
      Fuzzy.editDistance1JoinBetween(probes, "p_id", "p_name",
          cust, "c_custkey", "c_name")
        .orderBy("left_id", "right_id")
    }),

    // Quality-gate failure crosstab: per source, docs by first-failing
    // rule (passed/token_count/avg_token_len/ttr/dup_2gram) — the gate
    // dashboard, composing the Gopher gate's audit column with the
    // explicit-values pivot. Absent (source, rule) cells are null on
    // both engines.
    "q136_gate_crosstab" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val gated = Curation.qualityFilter(docs, "doc_id", "text")
        .withColumn("rule", when(col("fail_reason") === "", lit("passed"))
          .otherwise(col("fail_reason")))
        .select(col("doc_id"), col("rule"))
        .join(docs.select("doc_id", "source"), "doc_id")
      Transform.crosstab(gated, "source", "rule",
        Seq("passed", "token_count", "avg_token_len", "ttr", "dup_2gram"),
        count(lit(1)))
        .orderBy("source")
    }),

    // Modality agreement: per-query overlap between the q122 lexical and
    // the cosine top-20 rankings — near-0 Jaccard is the evidence that
    // hybrid fusion (q125) has complementary signals to fuse. Only
    // queries present in both modalities report (inner-join contract).
    "q135_modality_agreement" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val lex = TextAnalysis.keywordSearchTopK(docs,
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", "doc_id", "text",
        k = 20, excludeSelf = true, maxDfFracE6 = 780000L)
      val sem = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", k = 20)
      Similarity.rankingOverlap(lex, sem).orderBy("query_id")
    }),

    // Dedup impact per source: docs, removals under the global min-id
    // survivor rule, distinct texts, micro-unit dup rate — the curation
    // dashboard row that catches a source re-crawling itself.
    "q134_dedup_impact" -> ((s, dir) =>
      Dedup.dedupImpactReport(Tables.load(s, dir, "documents"),
        "doc_id", "text", Seq("source"))
        .orderBy("source")),

    // INCREMENTAL spectrum: the corpus split into two deterministic
    // batches (doc_id parity), per-batch vocab counts merged, spectrum
    // from the merged state — counts sum exactly, so this must equal the
    // one-shot q131 BIT-FOR-BIT (the q34 merge ≡ rebuild pattern); the
    // oracle is the one-shot replay.
    "q132_vocab_incremental" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val merged = TextAnalysis.mergeVocabCounts(Seq(
        TextAnalysis.vocabCounts(docs.filter(col("doc_id") % 2 === 0), "text"),
        TextAnalysis.vocabCounts(docs.filter(col("doc_id") % 2 === 1), "text")))
      TextAnalysis.spectrumFromCounts(merged).orderBy("cnt")
    }),

    // Multimodal plumbing: per-partition feature extraction over binary
    // payloads (stub decoder — deterministic FNV features).
    // Media features, FULL hash-compare: every emitted column is derived
    // from the REAL payload path in Spark (ImageIO decode, WAV header
    // parse, ISO-BMFF walk) and independently replayed by the oracle —
    // dimensions/frames from the generator's closed-form arithmetic (the
    // q99 pattern), exact byte sizes for WAV (44 + frames·ch·2) and MP4
    // (fixed box tree + one replayed java.util.Random LCG step for the
    // mdat length), and a bounds check for deflate-sized PNGs (the one
    // non-closed-form size). The engine-local FNV feature_hash stays
    // spec-asserted in MultimodalSpec.
    "q41_media_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.extractFeatures(Multimodal.synthetic(s, 1000))
        .toDF()
        .select(col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          when(col("kind") === "image", lit(null).cast("long"))
            .otherwise(col("size_bytes")).as("size_bytes_exact"),
          when(col("kind") === "image",
            col("size_bytes").between(57L, 2000L))
            .otherwise(lit(true)).as("size_in_bounds"))
        .orderBy("media_id")
    }),

    // Overlapping token-window chunking (size 32, overlap 8) — the
    // corpus-preparation step after cleaning/dedup.
    "q42_chunking" -> ((s, dir) =>
      Chunking.chunk(Tables.load(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_idx")),

    // Deterministic hash sampling: reproducible 30% sample, engine- and
    // partition-order-independent (unlike random/reservoir sampling).
    "q43_hash_sample" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(Chunking.hashSample(col("doc_id"), 30))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    // Greedy sequence packing into 512-token bins within 100-doc id shards
    // (the window is shard-partitioned — no single-task global sort) +
    // fill summary per composite (shard, bin).
    "q44_seq_packing" -> ((s, dir) => {
      val packed = Chunking.packSequences(
        Tables.load(s, dir, "documents"), "doc_id", "text", binSize = 512,
        docsPerShard = 100L)
      Chunking.packingSummary(packed, binSize = 512).orderBy("shard", "bin")
    }),

    // End-to-end near-dedup: frequency-capped Jaccard pairs (>0.5) →
    // connected components (min-label propagation + pointer jumping, one
    // driver action per round) → drop non-canonical members. The oracle
    // computes the same capped pairs and closure with a recursive CTE.
    // Gopher-style duplicate n-gram fractions per document (quality-filter
    // signal for boilerplate/spam); row-local, zero shuffle. The fraction
    // is a ratio of small exact ints computed identically on both engines,
    // then e6-rounded.
    "q56_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionProfile(
        Tables.load(s, dir, "documents"), "text")
        .select(col("doc_id"), col("dup_2gram_frac_e6"), col("dup_3gram_frac_e6"))
        .orderBy("doc_id")),

    // Domain-mixing stratified sample: per-language keep rates (the
    // up/down-sampling knob of corpus curation), deterministic via the
    // same md5 trick as q43 — a pushable predicate, no shuffle.
    "q58_stratified_sample" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(Chunking.stratifiedHashSample(col("doc_id"), col("lang"),
          Map("en" -> 80, "de" -> 50, "zh" -> 20), defaultPct = 10))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    // Benchmark decontamination: trigram overlap of every document against
    // a held-out "eval" slice (doc_id % 50 == 0), eval gram set broadcast.
    // Counts are exact ints; the overlap ratio is e6-rounded identically
    // on both engines.
    "q57_contamination" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.contaminationScore(docs, "doc_id", "text",
        docs.filter("doc_id % 50 = 0"), "text")
        .orderBy("doc_id")
    }),

    "q45_near_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      Dedup.removeNearDupes(docs, "doc_id", Dedup.dupClusters(pairs))
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Domain-mixing report: per-source doc/token mass and corpus share —
    // the input to up/down-sampling weights. One corpus shuffle; the share
    // window runs over the |domains|-sized grouped result.
    "q59_domain_mixing" -> ((s, dir) =>
      Curation.domainMixingReport(
        Tables.load(s, dir, "documents"), "source", "text")
        .orderBy("domain")),

    // Gopher-style hard quality gate: integer micro-unit signals vs integer
    // thresholds → verdict + first failing rule. Row-local, zero shuffle.
    "q60_quality_filter" -> ((s, dir) =>
      Curation.qualityFilter(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Gap-based sessionization (4h) + per-session rollup: lag → running sum
    // in ONE window shuffle, then a session-keyed aggregate. Exact micro-unit
    // value sums (a double sum would be shuffle-order-dependent).
    "q61_sessionization" -> ((s, dir) =>
      Sessions.sessionStats(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "value", gapSec = 14400L)
        .orderBy("user_id", "session_seq")),

    // End-to-end embedding near-dedup, EXACT BASELINE: all-pairs cosine
    // (>0.4) → connected components → drop non-canonical members. The
    // embedding twin of q45; the oracle replays the closure with a
    // recursive CTE. The all-pairs stage is the recall baseline ONLY —
    // the production path is q64 (Dedup.removeNearDupesLsh), whose
    // shuffles stay linear in the corpus.
    "q62_embed_dedup" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val pairs = Similarity.cosineDupes(emb, "vec_id", "embedding", 0.4)
        .select("id_a", "id_b")
      Dedup.removeNearDupes(emb, "vec_id", Dedup.dupClusters(pairs))
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // End-to-end embedding near-dedup, SCALE PATH: LSH sign-hash buckets
    // prune the pair scan to within-bucket joins before the same closure +
    // removal — linear shuffles, no all-pairs stage. Deterministic (md5
    // hyperplanes), so the oracle replays bucketing, pairing, and closure
    // in SQL; at 4 planes the bucket partition is part of the contract.
    "q64_embed_dedup_lsh" -> ((s, dir) =>
      Dedup.removeNearDupesLsh(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4, numPlanes = 4, dim = 64)
        .select("vec_id")
        .orderBy("vec_id")),

    // As-of join: each purchase picks up the latest prior click of the same
    // user (inclusive, latest-id tie-break). Union-tag + one keyed window —
    // one shuffle, no range fan-out. No-match sentinels (-1/0) keep the
    // compare integer-typed; genuine-null semantics are spec-covered.
    "q63_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("value_e6", expr("CAST(round(value * 1000000.0) AS BIGINT)"))
        .select("event_id", "user_id", "event_type", "ts_us", "value_e6")
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      AsofJoin.asofJoin(purchases, clicks,
          "user_id", "ts_us", "ts_us", tieCol = "event_id",
          rightPrefix = "click_")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_e6"),
          coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("click_ts_us"), lit(-1L)).as("click_ts_us"),
          coalesce(col("click_value_e6"), lit(0L)).as("click_value_e6"),
          coalesce(col("ts_us") - col("click_ts_us"), lit(-1L)).as("gap_us"))
        .orderBy("event_id")
    }),

    // As-of join, STRICT mode: each purchase picks up the latest click
    // strictly BEFORE it (equal-ts clicks hidden) — the point-in-time
    // semantics that prevent same-instant lookahead. Same union-tag single
    // shuffle; the oracle is DuckDB's native ASOF JOIN with `>`. No-match
    // purchases surface through the sentinel projection (the NULL-payload
    // partition q63 doesn't exercise at equal timestamps).
    "q65_asof_strict" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("value_e6", expr("CAST(round(value * 1000000.0) AS BIGINT)"))
        .select("event_id", "user_id", "event_type", "ts_us", "value_e6")
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      AsofJoin.asofJoin(purchases, clicks,
          "user_id", "ts_us", "ts_us", tieCol = "event_id",
          rightPrefix = "click_", inclusive = false)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_e6"),
          coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("click_ts_us"), lit(-1L)).as("click_ts_us"),
          coalesce(col("click_value_e6"), lit(0L)).as("click_value_e6"),
          coalesce(col("ts_us") - col("click_ts_us"), lit(-1L)).as("gap_us"))
        .orderBy("event_id")
    }),

    // Regex-match expectation (expect_column_values_to_match_regex parity):
    // per-column count of non-null values failing the pattern, fused into
    // one aggregate scan. The 5-9-char segment pattern fails for AUTOMOBILE
    // (10 chars), so the check exercises a nonzero failure count; the name
    // pattern is the all-pass case.
    "q66_regex_check" -> ((s, dir) =>
      Checks.regexMatchCounts(Tables.load(s, dir, "customer"), Seq(
        graft.config.RegexCheck("c_name", "^Customer#[0-9]+$"),
        graft.config.RegexCheck("c_mktsegment", "^[A-Z]{5,9}$")))),

    // IVF top-k with the deterministic SEED centroids (k lowest-id vectors,
    // L2-normalized): no Lloyd refinement, so every arithmetic step — float
    // normalization included — replays exactly in SQL and the whole ANN
    // path gets a hash-compare (q40's Lloyd means stay rows-only: their
    // float-sum order is engine-specific by nature).
    "q69_ivf_seeded" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cents, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    // Range join (point-in-interval): sessions active at each purchase
    // instant — binned interval join (explode intervals to covering bins →
    // ONE hash equi-join → exact containment filter), never the
    // BroadcastNestedLoopJoin Spark plans for a raw BETWEEN theta-join.
    // Bin width = the 4h session gap. Oracle: DuckDB inequality join over
    // the same session CTE as q61.
    "q68_interval_concurrency" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val sessions = Sessions.sessionStats(ev, "user_id", "ts_us",
          "event_id", "value", gapSec = 14400L)
        .select("start_us", "end_us")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "ts_us")
      graft.ops.RangeJoin.concurrency(purchases, "event_id", "ts_us",
          sessions, "start_us", "end_us", binWidth = 14400L * 1000000L)
        .orderBy("event_id")
    }),

    // Incremental ingest dedup: even-id docs are the historical corpus,
    // odd-id docs the arriving batch — drop arrivals whose content
    // fingerprint exists in the corpus. Bloom prefilter + verifying
    // anti-join: the bloom affects cost, never the result, so the oracle
    // is the plain fingerprint set difference.
    "q75_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.dedupeAgainstCorpus(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", expectedItems = 100000L)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Incremental FUZZY dedup: same corpus/arrival split as q75, but drops
    // arrivals whose 3-gram Jaccard against any corpus doc exceeds 0.5 —
    // near-dups included, not just byte-identical content. MinHash bands
    // prune the cross-corpus join; every drop is exact-verified, so the
    // oracle replays bands + verification in SQL (q27's signature CTEs).
    "q76_fuzzy_incremental" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.fuzzyDedupeAgainstCorpus(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // PII redaction audit: digit-run ids scrubbed from the name (every row
    // matches once), emails from the segment (the all-pass case), with the
    // per-row redaction count a scrub-rate report aggregates. Pure row-local
    // regex; the oracle replays both rules with RE2 regexp_replace.
    "q77_pii_redact" -> ((s, dir) =>
      Curation.redactPii(Tables.load(s, dir, "customer"), Seq(
        graft.config.PiiRule("c_name", "[0-9]{4,}", "[ID]"),
        graft.config.PiiRule("c_mktsegment", Curation.PiiPatterns.Email,
          "[EMAIL]")))
        .select("c_custkey", "c_name", "c_mktsegment", "n_redactions")
        .orderBy("c_custkey")),

    // Embedding-space outlier signal: cosine of each vector to its seeded
    // nearest centroid (q69's deterministic centroids), outlier below 0.2.
    // The pre-training garbage-embedding filter; oracle replays centroid
    // derivation, assignment, and the cosine in SQL.
    "q74_embed_outliers" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      Similarity.centroidCosines(emb, "vec_id", "embedding", cents)
        .withColumn("is_outlier", col("centroid_cos_e6") < 200000L)
        .orderBy("vec_id")
    }),

    // Unigram surprisal (LM-free perplexity proxy): per-token
    // floor(log2(N/count)) in exact integer bits — no libm log anywhere,
    // so the per-doc sums hash-compare. The CCNet-style frequency filter.
    "q73_surprisal" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Winsorization: clamp values to exact per-type [p05, p95] quantiles —
    // one grouped percentile aggregate broadcast back onto the rows, clamp
    // row-local. Spark `percentile` ≡ DuckDB `quantile_cont` (q35/q52).
    "q71_winsorize" -> ((s, dir) =>
      Anomaly.winsorize(
        Tables.load(s, dir, "events")
          .select("event_id", "event_type", "value"),
        "value", "event_type", 0.05, 0.95)
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 1000000.0) AS BIGINT)").as("value_e6"),
          expr("CAST(round(value_wins * 1000000.0) AS BIGINT)").as("wins_e6"))
        .orderBy("event_id")),

    // Deterministic train/val/test split: md5 bucket through cumulative
    // weights — disjoint-exhaustive, re-run-stable (no leakage when the
    // corpus grows). Summary row per split with id-range fingerprints.
    "q72_hash_split" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("split", Chunking.hashSplit(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split")),

    // Interval-overlap join: per-user count of OTHER users' sessions
    // overlapping that user's sessions (cross-user concurrency). Binned
    // overlap join with the exactly-once overlap-start-bin trick — no
    // distinct, no BNLJ. Same-user sessions are disjoint by construction
    // (gap-based), so excluding the identical session suffices.
    "q70_session_overlap" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      // materialize the session rollup ONCE: both self-join sides read it,
      // and without the cut each side re-runs the full window+agg chain
      // (the exchanges differ after the a/b projections, so Spark's
      // ReuseExchange can't help)
      val sess = Sessions.sessionStats(ev, "user_id", "ts_us",
        "event_id", "value", gapSec = 14400L).localCheckpoint()
      val a = sess.select(col("user_id").as("a_user"),
        col("session_seq").as("a_seq"),
        col("start_us").as("a_start"), col("end_us").as("a_end"))
      val b = sess.select(col("user_id").as("b_user"),
        col("session_seq").as("b_seq"),
        col("start_us").as("b_start"), col("end_us").as("b_end"))
      graft.ops.RangeJoin.overlappingPairs(a, "a_start", "a_end",
          b, "b_start", "b_end", binWidth = 14400L * 1000000L)
        .filter(col("a_user") =!= col("b_user") ||
          col("a_seq") =!= col("b_seq"))
        .groupBy(col("a_user").as("user_id"))
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy("user_id")
    }),

    // Product quantization encode: 4 subspaces × 16 seeded centroids — the
    // m-byte compression that makes a 100 TB embedding corpus scannable.
    // Codes + integer micro-unit reconstruction errors; the oracle replays
    // subvector slicing, the x·x−2x·c+c·c distance, and argmin in SQL.
    "q78_pq_encode" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 4, k = 16)
      Similarity.pqEncode(emb, "vec_id", "embedding", cb)
        .select("vec_id", "code0", "code1", "code2", "code3", "err_e6")
        .orderBy("vec_id")
    }),

    // PQ asymmetric-distance top-k: exact queries scan the corpus's PQ
    // codes via per-query distance tables — integer table-entry sums rank
    // candidates, so the whole ANN path hash-compares like q69.
    "q79_pq_adc_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 4, k = 16)
      Similarity.pqAdcTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cb)
        .orderBy("query_id", "rank")
    }),

    // Cross-source duplication: q45's near-dup clusters, reported instead
    // of removed — clusters spanning ≥2 sources expose domains mirroring
    // each other's content. The oracle extends q45's recursive closure
    // with the source rollup.
    "q96_cross_source" -> ((s, dir) =>
      Dedup.crossSourceDupReport(Tables.load(s, dir, "documents"),
        "doc_id", "text", "source", n = 3, threshold = 0.5,
        maxShingleFreq = 100)
        .orderBy("label")),

    // Bigram conditional surprisal: integer bit-cost of each token given
    // its predecessor under the corpus bigram model — near-0 for templated
    // text whose bigrams are predictable even when unigrams are rare.
    "q95_bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // Calendar gap-fill + forward fill: sparse daily order counts per
    // priority densified over each key's own span; is_gap marks introduced
    // days (join presence, not value nullness), value carried forward.
    // The oracle replays the span explode with generate_series and the
    // fill with last_value IGNORE NULLS.
    "q97_gap_fill" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("key"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      graft.ops.TimeSeries.gapFillDaily(daily, "key", "day", "n_orders")
        // DATE → string at the compare boundary only: the oracle harness
        // reads Spark date32 as python objects but DuckDB DATE as
        // datetime64, so raw DATE columns never dtype-match
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy("key", "day")
    }),

    // Weekly cohort retention triangle: users by first-activity week ×
    // weeks-since-cohort × distinct active users. Integer period math.
    "q94_retention" -> ((s, dir) =>
      graft.ops.Retention.cohortRetention(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", periodUs = 7L * 86400L * 1000000L)
        .orderBy("cohort_period", "age")),

    // Percentile-rank normalization: each doc's quality score mapped to
    // its corpus percentile (cume_dist semantics, exact integer
    // micro-units) — transferable thresholds without raw-score cuts. No
    // window over row data, only the score-summary pass.
    "q93_pct_rank" -> ((s, dir) => {
      val prof = TextAnalysis.profile(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .select("doc_id", "quality_score_e6")
      Curation.percentileRank(prof, "quality_score_e6")
        .select("doc_id", "quality_score_e6", "pct_rank_e6")
        .orderBy("doc_id")
    }),

    // Session conversion funnel: within each 4h session, did a purchase
    // happen at/after the first click? Entry/conversion timestamps,
    // converted flag, integer time-to-convert with -1 sentinels.
    "q92_funnel" -> ((s, dir) =>
      Sessions.funnel(
        Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
        "user_id", "ts_us", "event_id", "event_type",
        entryType = "click", conversionType = "purchase", gapSec = 14400L)
        .orderBy("user_id", "session_seq")),

    // Stratified resample WITH upsampling: src0 at 250% (every doc 2×,
    // md5-chosen half 3×), src1 dropped, others kept 1× — the mixing
    // weights > 1 that the boolean keep-predicate (q58) can't express.
    // Row-local explode; the copy index makes replicas distinct rows.
    "q91_resample" -> ((s, dir) =>
      Chunking.stratifiedResample(Tables.load(s, dir, "documents"),
        col("doc_id"), col("source"),
        ratesPct = Map("src0" -> 250, "src1" -> 0), defaultPct = 100)
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")),

    // As-of join with staleness tolerance: q63's purchase↔click join, but
    // a click more than 30 minutes old is NO match — the feature-join
    // bound that keeps stale snapshots from enriching fresh events. The
    // oracle post-filters DuckDB's native ASOF by the same gap.
    "q90_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("value_e6", expr("CAST(round(value * 1000000.0) AS BIGINT)"))
        .select("event_id", "user_id", "event_type", "ts_us", "value_e6")
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val clicks = ev.filter(col("event_type") === "click")
        .drop("event_type")
      AsofJoin.asofJoin(purchases, clicks,
          "user_id", "ts_us", "ts_us", tieCol = "event_id",
          rightPrefix = "click_", maxGap = 1800L * 1000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value_e6"),
          coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("click_ts_us"), lit(-1L)).as("click_ts_us"),
          coalesce(col("click_value_e6"), lit(0L)).as("click_value_e6"),
          coalesce(col("ts_us") - col("click_ts_us"), lit(-1L)).as("gap_us"))
        .orderBy("event_id")
    }),

    // Corpus report card: per-source doc/token mass, hard-gate pass rate,
    // and exact p50/p90 quality score — the daily health dashboard of a
    // curated corpus. One grouped aggregate; integer micro-units and the
    // proven exact-percentile contract keep it hash-comparable.
    "q89_corpus_report" -> ((s, dir) =>
      Curation.corpusReport(Tables.load(s, dir, "documents"),
        "source", "text")
        .orderBy("domain")),

    // IVFPQ: the production ANN composition — IVF buckets prune candidates
    // to 4 probed cells, PQ ADC scores them from codes alone. Both stages
    // seeded/deterministic, so the full composite hash-compares; nProbe=K
    // ≡ plain ADC is spec-asserted.
    "q88_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m = 4, k = 16)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5, cents, nProbe = 4, cb)
        .orderBy("query_id", "rank")
    }),

    // Novelty vs the historical corpus: odd-id docs are the arriving batch
    // (q75/q76's split), novelty = fraction of each arrival's 3-gram
    // shingles unseen in the even-id corpus — the ingest-prioritization
    // signal (inverse of q57's contamination, against history).
    "q87_novelty" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.noveltyScore(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Per-domain token budgets: each source cut to its own token target
    // (src0/src1 get bespoke budgets, the rest a default) — the domain-
    // mixing weights applied as hard corpus targets. Same greedy-prefix
    // semantics as q81, windows partitioned by domain throughout.
    "q86_domain_budget" -> ((s, dir) => {
      val prof = TextAnalysis.profile(
        Tables.load(s, dir, "documents").select("doc_id", "text", "source"),
        "text")
        .select("doc_id", "source", "n_tokens", "quality_score_e6")
      Curation.selectUnderTokenBudgetPerDomain(prof, "doc_id", "source",
          "quality_score_e6", "n_tokens",
          budgets = Map("src0" -> 300L, "src1" -> 0L), defaultBudget = 500L)
        .select("doc_id", "source", "n_tokens", "quality_score_e6",
          "cum_tokens")
        .orderBy("doc_id")
    }),

    // Curriculum buckets: documents ranked by token count into 4 stages
    // (shortest first) — the schedule a curriculum trainer reads. Global
    // ntile semantics via the decomposed rank (summary window + tie-class
    // windows), never a global window over row data; explicit integer
    // bucket formula so both engines agree on remainders.
    "q85_curriculum" -> ((s, dir) =>
      Curation.curriculumBuckets(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", nBuckets = 4)
        .select("doc_id", "n_tokens", "rank", "bucket")
        .orderBy("doc_id")),

    // Distribution drift: view-event values as the baseline snapshot,
    // purchase-event values as the current batch — fixed 10-bin histogram
    // over [0,100) with under/overflow bins, integer micro-unit shares and
    // deltas. The per-ingest-batch shift monitor; PSI/alerting composes on
    // delta_e6 downstream.
    "q84_histogram_drift" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Anomaly.histogramDrift(
        ev.filter(col("event_type") === "view").select("value"),
        ev.filter(col("event_type") === "purchase").select("value"),
        "value", lo = 0.0, hi = 100.0, nBins = 10)
        .orderBy("bucket")
    }),

    // Containment pairs: near-superset detection symmetric jaccard misses
    // (short doc swallowed by a long one) — either direction's
    // |A∩B|/|A| ≥ 0.6 on 3-gram shingles, same inverted index + freq cap
    // as q26, floor-division micro-units.
    "q83_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 3, thresholdE6 = 600000L, maxShingleFreq = 100)
        .orderBy("id_a", "id_b")),

    // MMR re-rank: brute-force top-20 pools diversified down to 5 — the
    // redundancy-pruning step between ANN retrieval and a context window.
    // The greedy per-query loop runs in mapGroups (never on the driver);
    // the oracle replays the FULL greedy selection with a recursive CTE
    // (integer micro-unit scoring makes each pick engine-exact), so this
    // is a complete hash-compare; q98 pins the λ=1 edge.
    "q82_mmr_rerank" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cands = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 20)
      Similarity.mmrRerank(cands, emb, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // MMR oracle anchor at λ=1: the diversity term is zeroed, so the greedy
    // loop must reproduce relevance-order top-5 exactly (score ≡ sim_e6,
    // ties to lower id) — SQL-replayable, pinning the same mapGroups code
    // path q82 exercises to a full hash compare at one config point.
    "q98_mmr_lambda1" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val cands = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 20)
      Similarity.mmrRerank(cands, emb, "vec_id", "embedding", k = 5,
        lambdaE6 = 1000000L)
        .orderBy("query_id", "rank")
    }),

    // Reciprocal-rank fusion: cosine top-20 and MIPS (dot-product) top-20
    // fused with 1/(60+rank) integer points, re-ranked to top-10 — the
    // zero-tuning retriever combiner. The oracle replays both rankings and
    // the fusion in SQL.
    "q100_rrf_fusion" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      Similarity.rrfFuse(Seq(
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20),
        Similarity.bruteForceTopKDot(emb, queries, "vec_id", "embedding", k = 20)),
        k = 10)
        .orderBy("query_id", "rank")
    }),

    // Dense-series anomaly: q97's gap-filled calendar series under a
    // trailing-7-day moving z-test — densification first means quiet days
    // exist as rows and a spike after a gap is judged against the true
    // calendar window, not the last 7 OBSERVED days. The z² > τ²
    // comparison is replayed as an exact integer inequality
    // (n·v − s)²·(n−1) > τ²·n·(n·q − s²), so no stddev/sqrt ever runs and
    // both engines agree bit-for-bit.
    "q108_dense_anomaly" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("key"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val dense = graft.ops.TimeSeries.gapFillDaily(daily, "key", "day", "n_orders")
      val w = Window.partitionBy("key").orderBy("day").rowsBetween(-7, -1)
      dense
        .withColumn("win_n", count(col("n_orders")).over(w))
        .withColumn("win_sum", sum(col("n_orders")).over(w))
        .withColumn("win_sumsq",
          sum(col("n_orders") * col("n_orders")).over(w))
        .withColumn("is_anomaly",
          col("win_n") >= 3 &&
            expr("""(n_orders * win_n - win_sum) * (n_orders * win_n - win_sum)
                    * (win_n - 1) > 9 * win_n * (win_n * win_sumsq - win_sum * win_sum)"""))
        .filter(col("is_anomaly"))
        .select(col("key"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_orders"), col("win_n"), col("win_sum"))
        .orderBy("key", "day")
    }),

    // Quality-aware near-dedup: q45's clusters, but each keeps its
    // LONGEST member (n_chars desc, ties min id) instead of the min-id
    // one — the clean-original-over-degraded-mirror selection.
    "q107_keep_best_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3,
          maxShingleFreq = 100)
        .filter(col("jaccard") > 0.5)
      Dedup.removeNearDupesKeepBest(docs, "doc_id",
        Dedup.dupClusters(pairs), "n_chars")
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Matryoshka truncation recall: top-5 under the first 32 of 64 dims
    // vs full-dim top-5 per query — the storage/recall tradeoff curve for
    // truncatable (MRL-style) embeddings, composed entirely from existing
    // operators (slice → bruteForceTopK → topKRecall).
    "q106_matryoshka_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val truncated = emb.withColumn("embedding",
        slice(col("embedding"), 1, 32))
      val queries = (e: org.apache.spark.sql.DataFrame) =>
        e.filter(col("vec_id") < 20)
      Similarity.topKRecall(
        Similarity.bruteForceTopK(emb, queries(emb),
          "vec_id", "embedding", k = 5),
        Similarity.bruteForceTopK(truncated, queries(truncated),
          "vec_id", "embedding", k = 5))
        .orderBy("query_id")
    }),

    // Per-batch novelty curve: docs in ingest batches of 100, 3-gram
    // shingles attributed to their first batch — the marginal-new-content
    // signal that says when a source is exhausted.
    "q105_novelty_curve" -> ((s, dir) =>
      TextAnalysis.noveltyCurve(
        Tables.load(s, dir, "documents")
          .withColumn("batch", expr("doc_id div 100")),
        "text", "batch", n = 3)
        .orderBy("batch")),

    // Temperature-scaled domain sampling (α=0.5): keep-rate
    // (c_min/c_d)^0.5 per domain — the p^α corpus-flattening trick,
    // deterministic md5-bucket gate, sqrt-exact across engines. The
    // generator's sources are deliberately balanced, so the query folds
    // all but two into one heavy macro-domain (18:1 skew) to exercise the
    // gate: small domains keep rate 10⁶, the heavy one sheds ~76%.
    "q104_temperature_mix" -> ((s, dir) =>
      Curation.temperatureSample(
        Tables.load(s, dir, "documents")
          .withColumn("domain",
            when(col("source").isin("src0", "src1"), col("source"))
              .otherwise(lit("web"))),
        "doc_id", "domain", alpha = 0.5)
        .select("doc_id", "domain", "rate_e6")
        .orderBy("doc_id")),

    // Hard-negative mining: per query, the top-5 most-similar vectors with
    // a DIFFERENT label — the near-boundary negatives contrastive training
    // feeds on. Label predicate inside the join, never after the window.
    "q102_hard_negatives" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id", "rank")
    }),

    // kNN label-agreement probe: majority label of the 5 nearest
    // neighbors vs own label — the embedding-space coherence canary.
    "q103_knn_label_eval" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.knnLabelAgreement(emb, emb.filter(col("vec_id") < 50),
        "vec_id", "embedding", "label", k = 5)
        .orderBy("vec_id")
    }),

    // Per-group completeness matrix: null rates per (event_type, column)
    // in long form — a column 100% complete globally can be 100% null for
    // one event type (the generator has no nulls, so the query derives
    // semantically-null columns: error events carry no valid value, every
    // 7th user id is an unresolvable reference).
    "q110_completeness_matrix" -> ((s, dir) =>
      Checks.completenessByGroup(
        Tables.load(s, dir, "events")
          .withColumn("value_valid",
            when(col("event_type") =!= "error", col("value")))
          .withColumn("user_ref",
            when(col("user_id") % 7 =!= 0, col("user_id"))),
        Seq("value_valid", "user_ref"), "event_type")
        .orderBy("group_key", "column_name")),

    // Per-group robust MAD anomalies: each event_type scored against ITS
    // OWN median/MAD — a value normal globally can be wildly anomalous
    // for its stratum.
    "q109_mad_by_group" -> ((s, dir) =>
      Anomaly.madAnomaliesByGroup(
        Tables.load(s, dir, "events"), "value", "event_type", tau = 2.5)
        .select("event_id", "event_type", "value", "robust_z_e6")
        .orderBy("event_id")),

    // Robust MAD anomalies (exact twin): |value| outliers by
    // 0.6745·|x−median|/MAD > τ — median-based, so the detector's own
    // scale survives the outliers it hunts (unlike Q8's mean/σ).
    "q101_mad_anomalies" -> ((s, dir) =>
      Anomaly.madAnomaliesExact(
        Tables.load(s, dir, "events"), "value", tau = 2.5)
        .select("event_id", "value", "robust_z_e6")
        .orderBy("event_id")),

    // Multimodal metadata oracle: the synthetic payloads are REAL encoded
    // PNG/WAV/MP4 whose dimensions/frames/sample-rate are closed-form in
    // media_id, so the REAL decoders (ImageIO pixel dims, WAV header
    // parse, ISO-BMFF box walk) hash-compare against a pure-SQL replay of
    // the generator parameters. Payload-derived columns (size, content
    // hash) stay in q41's rows-only check.
    "q99_media_meta" -> ((s, dir) => {
      import s.implicits._
      Multimodal.extractFeatures(Multimodal.synthetic(s, 1000))
        .toDF()
        .select(col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("media_id")
    }),

    // Token-budget selection: highest-quality-first greedy prefix under a
    // 10k-token budget — the final cut of a scored corpus to a target
    // training size. Decomposed windows (per-score summary + within-tie
    // prefix), never one global-order window; ≡ the naive global cumsum the
    // oracle runs.
    "q81_token_budget" -> ((s, dir) => {
      val prof = TextAnalysis.profile(
        Tables.load(s, dir, "documents").select("doc_id", "text"), "text")
        .select("doc_id", "n_tokens", "quality_score_e6")
      Curation.selectUnderTokenBudget(prof, "doc_id", "quality_score_e6",
          "n_tokens", budget = 10000L)
        .select("doc_id", "n_tokens", "quality_score_e6", "cum_tokens")
        .orderBy("doc_id")
    }),

    // Inter-document boilerplate signal: fraction of each doc's 5-gram
    // shingles shared with ≥2 docs corpus-wide — the cross-corpus
    // complement of q56's intra-doc repetition. Linear shuffles on 8-byte
    // shingle hashes; exact integer micro-unit fractions.
    "q80_boilerplate" -> ((s, dir) =>
      TextAnalysis.interDocRepetition(
        Tables.load(s, dir, "documents"), "doc_id", "text", n = 5)
        .orderBy("doc_id")),

    // LSH recall evaluation: the number a curation pipeline reads to size
    // num_planes before a full-corpus dedup — exact cosine pairs vs the
    // 4-plane LSH pair set, (n_exact, n_found, recall_e6). The exact side
    // is the evaluation cost by definition; at scale this runs on a
    // hash-sampled slice. Oracle replays both pair sets in SQL.
    "q67_lsh_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.pairRecall(
        Similarity.cosineDupes(emb, "vec_id", "embedding", 0.4),
        Similarity.lshCosineDupes(emb, "vec_id", "embedding",
          threshold = 0.4, numPlanes = 4, dim = 64))
    }))

  /** Shared edge-build CTE block for the graph oracles (q171/q172): the
    * q150 basket-pair derivation, MATERIALIZED — the unrolled iterative
    * rounds below reference their predecessor several times each, and
    * without materialization DuckDB inlines the whole chain exponentially
    * (3^rounds parquet scans blew the open-file limit in testing). */
  private val basketEdgesMat: String =
    """items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS basket,
      |  l_partkey AS item FROM lineitem),
      |sized AS (SELECT basket FROM items GROUP BY basket
      |  HAVING count(*) <= 20),
      |kept AS MATERIALIZED (SELECT i.* FROM items i JOIN sized USING (basket)),
      |p AS (SELECT a.item AS a, b.item AS b, count(*) AS n
      |  FROM kept a JOIN kept b USING (basket)
      |  WHERE a.item < b.item GROUP BY 1, 2),
      |e AS MATERIALIZED (SELECT a, b FROM p WHERE n >= 2),
      |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
      |  UNION ALL SELECT b, a FROM e)""".stripMargin

  /** q171 oracle: the integer-PageRank recurrence unrolled `iters` times —
    * identical floor divisions, identical exact integer sums. */
  /** q186 oracle: the BPE merge rounds unrolled as materialized CTEs.
    * Same representation as the operator — boundary-wrapped segs with a
    * DOUBLE chr(31) separator, merges as literal `replace` (leftmost,
    * non-overlapping, boundary-sharing), pair counts over parallel-unnest
    * slices, argmax under (cnt desc, l, r). */
  /** Shared CTE chain for the BPE oracles (q186/q188): w0 (char segs of
    * the distinct-word frequency table) and `rounds` of p/m/w CTEs. */
  private def bpeRoundsCTE(rounds: Int): String = {
    val s2 = "chr(31)||chr(31)"
    val rs = (1 to rounds).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(parts[2:len(parts)-2]) AS l,
         |           unnest(parts[3:len(parts)-1]) AS r, freq
         |    FROM (SELECT str_split(seg, $s2) AS parts, freq FROM $prev) t) q
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (
         |  SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT replace(seg,
         |    chr(31)||(SELECT l FROM m$i)||$s2||(SELECT r FROM m$i)||chr(31),
         |    chr(31)||(SELECT l||r FROM m$i)||chr(31)) AS seg, freq
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT $s2 || regexp_replace(word, '(.)', '\\1'||$s2, 'g') AS seg,
       |         CAST(cnt AS BIGINT) AS freq
       |  FROM (SELECT word, count(*) AS cnt FROM (
       |          SELECT unnest(str_split(trim(regexp_replace(
       |            replace(text, chr(31), ''), '\\s+', ' ', 'g')), ' ')) AS word
       |          FROM documents) u
       |        WHERE word <> '' GROUP BY 1) wc),
       |$rs""".stripMargin
  }

  private def bpeOracle(rounds: Int): String = {
    val sel = (1 to rounds).map(i =>
      s"SELECT $i AS merge_round, l AS left_sym, r AS right_sym, " +
        s"l||r AS merged, cnt AS pair_count FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeRoundsCTE(rounds)},
       |sel AS ($sel)
       |SELECT * FROM sel ORDER BY merge_round""".stripMargin
  }

  /** q188 oracle: the trained vocabulary's FINAL segs (wN) joined back
    * onto each document's words — replace(seg, sep, '') recovers the
    * word, len(parts)-2 its trained piece count; a green hash proves the
    * operator's applyMerges reproduces training segmentation corpus-wide. */
  private def bpeFertilityOracle(rounds: Int): String =
    s"""WITH ${bpeRoundsCTE(rounds)},
       |vocab AS MATERIALIZED (
       |  SELECT replace(seg, chr(31), '') AS word,
       |    CAST(len(str_split(seg, chr(31)||chr(31))) - 2 AS BIGINT) AS np
       |  FROM w$rounds),
       |dw AS (SELECT doc_id, unnest(str_split(trim(regexp_replace(
       |    replace(text, chr(31), ''), '\\s+', ' ', 'g')), ' ')) AS word
       |  FROM documents)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(v.np) AS BIGINT) AS n_pieces
       |FROM dw d JOIN vocab v USING (word)
       |WHERE d.word <> ''
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q210 oracle: the HITS rounds unrolled — per round a hub-weighted
    * in-sum, L1 normalization as the identical nested floor divisions,
    * then the authority-weighted out-sum, over the directed low→high
    * basket pair set (`e` in the shared CTE chain). */
  private def hitsOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val ph = if (i == 1) "h0" else s"h${i - 1}"
      s"""ra$i AS MATERIALIZED (SELECT e.b AS node, sum(h.hub_e9) AS raw
         |  FROM e JOIN $ph h ON e.a = h.node GROUP BY 1),
         |a$i AS MATERIALIZED (SELECT n.node,
         |  CAST(coalesce(r.raw, 0) // greatest(1,
         |    (SELECT coalesce(sum(raw), 1) FROM ra$i) // 1000000000)
         |    AS BIGINT) AS auth_e9
         |  FROM nodes n LEFT JOIN ra$i r ON n.node = r.node),
         |rh$i AS MATERIALIZED (SELECT e.a AS node, sum(a.auth_e9) AS raw
         |  FROM e JOIN a$i a ON e.b = a.node GROUP BY 1),
         |h$i AS MATERIALIZED (SELECT n.node,
         |  CAST(coalesce(r.raw, 0) // greatest(1,
         |    (SELECT coalesce(sum(raw), 1) FROM rh$i) // 1000000000)
         |    AS BIGINT) AS hub_e9
         |  FROM nodes n LEFT JOIN rh$i r ON n.node = r.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |h0 AS (SELECT node, 1000000000 AS hub_e9 FROM nodes),
       |$rounds
       |SELECT n.node, h.hub_e9, a.auth_e9 FROM nodes n
       |JOIN h$iters h ON n.node = h.node
       |JOIN a$iters a ON n.node = a.node
       |ORDER BY n.node""".stripMargin
  }

  private def pagerankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT d.node, CAST((SELECT (15 * (1000000000 // n)) // 100 FROM nn)
         |    + 85 * coalesce(s.inflow, 0) // 100 AS BIGINT) AS rank_e9
         |  FROM deg d LEFT JOIN (
         |    SELECT sym.dst AS node, sum(r.rank_e9 // dg.deg) AS inflow
         |    FROM sym JOIN $prev r ON sym.src = r.node
         |    JOIN deg dg ON sym.src = dg.node
         |    GROUP BY 1) s ON d.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg
       |  FROM sym GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
       |r0 AS MATERIALIZED (SELECT node,
       |  (SELECT 1000000000 // n FROM nn) AS rank_e9 FROM deg),
       |$rounds
       |SELECT node, rank_e9 FROM r$iters ORDER BY node""".stripMargin
  }

  /** q172 oracle: exactly `rounds` degree-peels (idempotent past the
    * fixpoint, so parity with the short-circuiting operator holds). */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { i =>
      val prev = if (i == 1) "sym" else s"s${i - 1}"
      s"""s$i AS MATERIALIZED (SELECT s.src, s.dst FROM $prev s
         |  WHERE s.src IN (SELECT src FROM $prev GROUP BY src
         |    HAVING count(*) >= $k)
         |  AND s.dst IN (SELECT src FROM $prev GROUP BY src
         |    HAVING count(*) >= $k))""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |$peels
       |SELECT src AS node, count(*) AS deg FROM s$rounds
       |GROUP BY src ORDER BY node""".stripMargin
  }

  /** q187 oracle: the directed recurrence with dangling-mass
    * redistribution unrolled — edges are the canonical low→high pair set
    * `e` read as directed, nodes the union of endpoints, and each round
    * inlines the previous round's dangling aggregate. */
  private def pagerankDirectedOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""dang$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.rank_e9), 0) AS BIGINT) AS dmass
         |  FROM $prev r LEFT JOIN odeg o ON r.node = o.node
         |  WHERE o.node IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT nd.node, CAST(
         |    (15 * (SELECT t FROM tele)) // 100
         |    + 85 * (coalesce(s.inflow, 0)
         |            + (SELECT dmass FROM dang$i) * (SELECT t FROM tele)
         |              // 1000000000) // 100 AS BIGINT) AS rank_e9
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.b AS node, sum(r.rank_e9 // o.odeg) AS inflow
         |    FROM e JOIN $prev r ON e.a = r.node
         |    JOIN odeg o ON e.a = o.node
         |    GROUP BY 1) s ON nd.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) u),
       |odeg AS MATERIALIZED (SELECT a AS node, count(*) AS odeg
       |  FROM e GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |tele AS MATERIALIZED (SELECT 1000000000 // n AS t FROM nn),
       |r0 AS MATERIALIZED (SELECT node, (SELECT t FROM tele) AS rank_e9
       |  FROM nodes),
       |$rounds
       |SELECT node, rank_e9 FROM r$iters ORDER BY node""".stripMargin
  }

  /** q189 oracle: synchronous LPA unrolled — per round, (node, label)
    * neighbor counts then the plurality-with-min-tie argmax via a
    * lexicographic struct max over (count, −label). */
  private def lpaOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""c$i AS (SELECT sym.dst AS node, l.label, count(*) AS cnt
         |  FROM sym JOIN $prev l ON sym.src = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node,
         |  -((max({'c': cnt, 'g': -label})).g) AS label
         |  FROM c$i GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS node,
       |  CAST(src AS BIGINT) AS label FROM sym),
       |$rounds
       |SELECT node, CAST(label AS BIGINT) AS label FROM l$iters
       |ORDER BY node""".stripMargin
  }

  /** q200 oracle: the full TextRank composition — q130's skip-gram pair
    * derivation (minCount 5, canonical center < context), q139's 60-bit
    * md5-prefix word ids, and the q178 weighted recurrence unrolled. */
  private def textrankOracle(iters: Int, k: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT d.node, CAST((SELECT (15 * (1000000000 // n)) // 100 FROM nn)
         |    + 85 * coalesce(s.inflow, 0) // 100 AS BIGINT) AS rank_e9
         |  FROM wdeg d LEFT JOIN (
         |    SELECT symw.dst AS node,
         |      sum(r.rank_e9 * symw.w // dg.wdeg) AS inflow
         |    FROM symw JOIN $prev r ON symw.src = r.node
         |    JOIN wdeg dg ON symw.src = dg.node
         |    GROUP BY 1) s ON d.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT string_split(trim(text), ' ') AS lst
       |  FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
       |sg AS (SELECT u.center AS center, u.context AS context FROM (
       |  SELECT unnest(flatten(list_transform(range(len(lst)), i ->
       |    list_transform(range(greatest(0, i - 2), least(len(lst), i + 3)),
       |      j -> struct_pack(center := lst[i + 1], context := lst[j + 1],
       |        ci := i, cj := j))))) AS u
       |  FROM d) t WHERE u.ci <> u.cj),
       |cp AS MATERIALIZED (SELECT center, context, count(*) AS cnt
       |  FROM sg WHERE center < context
       |  GROUP BY 1, 2 HAVING count(*) >= 5),
       |ew AS MATERIALIZED (SELECT
       |  ('0x' || substr(md5(center), 1, 15))::BIGINT AS a,
       |  ('0x' || substr(md5(context), 1, 15))::BIGINT AS b,
       |  CAST(sum(cnt) AS BIGINT) AS w FROM cp GROUP BY 1, 2),
       |symw AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM ew
       |  UNION ALL SELECT b, a, w FROM ew),
       |wdeg AS MATERIALIZED (SELECT src AS node, CAST(sum(w) AS BIGINT)
       |  AS wdeg FROM symw GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM wdeg),
       |r0 AS MATERIALIZED (SELECT node,
       |  (SELECT 1000000000 // n FROM nn) AS rank_e9 FROM wdeg),
       |$rounds,
       |vocab AS (SELECT word,
       |  ('0x' || substr(md5(word), 1, 15))::BIGINT AS node
       |  FROM (SELECT center AS word FROM cp
       |        UNION SELECT context FROM cp) v),
       |ranked AS (SELECT row_number() OVER
       |    (ORDER BY r.rank_e9 DESC, vv.word) AS rank, vv.word, r.rank_e9
       |  FROM r$iters r JOIN vocab vv ON r.node = vv.node)
       |SELECT CAST(rank AS BIGINT) AS rank, word, rank_e9 FROM ranked
       |WHERE rank <= $k ORDER BY rank""".stripMargin
  }

  /** q201 oracle: the hash-walks replayed — dst-ordered adjacency index,
    * md5(node#step#seed) mod outdeg neighbor pick, one join per step. */
  private def hashWalksOracle(steps: Int, seed: Long): String = {
    val rounds = (1 to steps).map { i =>
      val prev = s"w${i - 1}"
      s"""w$i AS MATERIALIZED (SELECT w.start, a.dst AS cur
         |  FROM $prev w JOIN deg d ON w.cur = d.node
         |  JOIN adj a ON a.src = w.cur AND a.idx =
         |   ('0x' || substr(md5(w.cur::VARCHAR || '#$i#$seed'), 1, 15))::BIGINT % d.deg)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to steps).map(i =>
      s"SELECT start, CAST($i AS BIGINT) AS step, cur AS node FROM w$i")
      .mkString("\nUNION ALL ")
    s"""WITH $basketEdgesMat,
       |adj AS MATERIALIZED (SELECT src, dst,
       |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT)
       |    - 1 AS idx FROM sym),
       |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg
       |  FROM sym GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT node AS start, node AS cur FROM deg),
       |$rounds
       |SELECT * FROM ($sel) u ORDER BY start, step""".stripMargin
  }

  /** q202 oracle: the q187 directed recurrence with a PER-NODE teleport
    * vector (seeds = node % 5 = 0, uniform over the seed count) driving
    * both the base term and the dangling share. */
  private def pagerankPersonalizedOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""dang$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.rank_e9), 0) AS BIGINT) AS dmass
         |  FROM $prev r LEFT JOIN odeg o ON r.node = o.node
         |  WHERE o.node IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT te.node, CAST(
         |    15 * te.t // 100
         |    + 85 * (coalesce(s.inflow, 0)
         |            + (SELECT dmass FROM dang$i) * te.t
         |              // 1000000000) // 100 AS BIGINT) AS rank_e9
         |  FROM tele te LEFT JOIN (
         |    SELECT e.b AS node, sum(r.rank_e9 // o.odeg) AS inflow
         |    FROM e JOIN $prev r ON e.a = r.node
         |    JOIN odeg o ON e.a = o.node
         |    GROUP BY 1) s ON te.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |  (SELECT a AS node FROM e UNION ALL SELECT b FROM e) u),
       |odeg AS MATERIALIZED (SELECT a AS node, count(*) AS odeg
       |  FROM e GROUP BY 1),
       |nw AS MATERIALIZED (SELECT count(*) AS w FROM nodes
       |  WHERE node % 5 = 0),
       |tele AS MATERIALIZED (SELECT n.node,
       |  CASE WHEN n.node % 5 = 0 THEN 1000000000 // (SELECT w FROM nw)
       |       ELSE 0 END AS t FROM nodes n),
       |r0 AS MATERIALIZED (SELECT node, t AS rank_e9 FROM tele),
       |$rounds
       |SELECT node, rank_e9 FROM r$iters ORDER BY node""".stripMargin
  }

  /** q178 oracle: the weighted-share recurrence unrolled. */
  private def pagerankWeightedOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT d.node, CAST((SELECT (15 * (1000000000 // n)) // 100 FROM nn)
         |    + 85 * coalesce(s.inflow, 0) // 100 AS BIGINT) AS rank_e9
         |  FROM wdeg d LEFT JOIN (
         |    SELECT symw.dst AS node,
         |      sum(r.rank_e9 * symw.w // dg.wdeg) AS inflow
         |    FROM symw JOIN $prev r ON symw.src = r.node
         |    JOIN wdeg dg ON symw.src = dg.node
         |    GROUP BY 1) s ON d.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $basketEdgesMat,
       |ew AS MATERIALIZED (SELECT a, b, CAST(n AS BIGINT) AS w FROM p
       |  WHERE n >= 2),
       |symw AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM ew
       |  UNION ALL SELECT b, a, w FROM ew),
       |wdeg AS MATERIALIZED (SELECT src AS node, CAST(sum(w) AS BIGINT)
       |  AS wdeg FROM symw GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM wdeg),
       |r0 AS MATERIALIZED (SELECT node,
       |  (SELECT 1000000000 // n FROM nn) AS rank_e9 FROM wdeg),
       |$rounds
       |SELECT node, rank_e9 FROM r$iters ORDER BY node""".stripMargin
  }

  /** Shared oracle prefix for the winnow-backed dedup family
    * (q234–q237): winnow fingerprint candidates (q183's replay, minShared
    * 1), exact list-intersect Jaccard verification of candidates only,
    * then the q45 recursive closure — `labels` is the last CTE, each
    * query appends its own tail. */
  private val winnowClusterSqlPrefix: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
      |hs AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
      |  i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
      |    || toks[i+2]), 1, 8))::BIGINT) AS h FROM t),
      |fps AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(h) - 4 + 2), i -> list_min(h[i:i+3])))) AS fp
      |  FROM hs WHERE len(h) >= 4),
      |hot AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 100),
      |cf AS (SELECT f.* FROM fps f ANTI JOIN hot USING (fp)),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM cf a JOIN cf b USING (fp) WHERE a.doc_id < b.doc_id),
      |sets AS (SELECT doc_id, list_transform(list_distinct(list_transform(
      |  range(1, len(toks) - 1),
      |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
      |  s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS sh FROM t),
      |pairs AS (SELECT id_a, id_b FROM cand
      |  JOIN sets sa ON id_a = sa.doc_id JOIN sets sb ON id_b = sb.doc_id
      |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      |   / CAST(len(sa.sh) + len(sb.sh)
      |       - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) > 0.5),
      |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT id_a, id_b FROM sym
      |  UNION
      |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
      |labels AS (SELECT src AS id, least(src, min(dst)) AS label
      |  FROM reach GROUP BY src)""".stripMargin

  /** Shared q232/q238 oracle core: the synthetic-URL CASE chain + the
    * full normalization replay (scheme/host lower, userinfo/port/www,
    * slash trim, tracking filter, PSL-lite eTLD+1), no ORDER BY — q232
    * appends one, q238 wraps it in a dedup rollup. */
  /** The KMV estimator as a DuckDB CASE over a BIGINT-list column — ONE
    * shared fragment (mirrors `Kmv.estimate` exactly: exact below k,
    * (k−1)·2⁶⁰ / h₍ₖ₎ with the h₍ₖ₎≥1 guard and the 10¹⁴ ceiling) so
    * the dag can never drift per-query. (k−1)·2⁶⁰ is exact in a double
    * for every k < 2⁵³, so the inline product matches Spark's plan-time
    * literal bit-for-bit. */
  private def kmvEstSql(k: Int, kmv: String = "kmv"): String =
    s"CASE WHEN len($kmv) < $k THEN CAST(len($kmv) AS BIGINT) " +
      s"ELSE CAST(least(round(${k - 1}.0 * 1152921504606846976.0 / " +
      s"CAST(greatest($kmv[$k], 1) AS DOUBLE)), 100000000000000.0) " +
      "AS BIGINT) END"

  private val urlNormalizeSqlCore: String =
    """WITH u AS (SELECT doc_id,
      |  (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http'
      |    ELSE 'https' END) || '://' ||
      |  (CASE doc_id % 4 WHEN 0 THEN 'WWW.' WHEN 1 THEN ''
      |    WHEN 2 THEN 'www.' ELSE 'cdn.' END) ||
      |  source || '-' || (doc_id % 5) ||
      |  (CASE doc_id % 3 WHEN 0 THEN '.CO.UK' WHEN 1 THEN '.com'
      |    ELSE '.org' END) ||
      |  (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
      |    WHEN 2 THEN ':8080' ELSE '' END) ||
      |  (CASE doc_id % 2 WHEN 0 THEN '/a/' || (doc_id % 7) || '/'
      |    ELSE '/p' END) ||
      |  (CASE doc_id % 3
      |    WHEN 0 THEN '?utm_source=feed&q=' || (doc_id % 10) || '&fbclid=zz'
      |    WHEN 1 THEN '?q=' || (doc_id % 10) ELSE '' END) ||
      |  (CASE doc_id % 2 WHEN 0 THEN '#top' ELSE '' END) AS url
      | FROM documents),
      |p1 AS (SELECT doc_id, url,
      |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |    AS scheme,
      |  regexp_replace(regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@/]*@', '')
      |    AS hp
      | FROM u),
      |p2 AS (SELECT *,
      |  coalesce(regexp_extract(hp, ':([0-9]+)$', 1), '') AS port,
      |  lower(regexp_replace(hp, ':[0-9]+$', '')) AS host FROM p1),
      |p3 AS (SELECT *,
      |  regexp_replace(host, '^www\.', '') AS nhost,
      |  coalesce(regexp_replace(regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', ''), '')
      |    AS path,
      |  coalesce(array_to_string(list_filter(
      |    str_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |    p -> NOT regexp_matches(p,
      |      '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=') AND p <> ''), '&'),
      |    '') AS q,
      |  str_split(host, '.') AS labels
      | FROM p2)
      |SELECT doc_id, url,
      | scheme || '://' || nhost ||
      |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |     OR (scheme = 'https' AND port = '443') THEN ''
      |    ELSE ':' || port END) || path ||
      |  (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS norm_url,
      | host,
      | CASE WHEN len(labels) < 2 THEN host
      |  WHEN len(labels) >= 3 AND labels[-2] || '.' || labels[-1] IN
      |    ('co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'com.au', 'net.au',
      |     'org.au', 'co.jp', 'ne.jp', 'or.jp', 'co.in', 'co.za',
      |     'com.br', 'com.cn', 'com.mx', 'com.ar', 'co.kr', 'com.tr',
      |     'com.sg', 'co.nz')
      |   THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
      |  ELSE labels[-2] || '.' || labels[-1] END AS reg_domain
      |FROM p3""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q171_pagerank" -> pagerankOracle(5),
    "q210_hits" -> hitsOracle(3),
    "q186_bpe_vocab" -> bpeOracle(10),
    "q187_pagerank_directed" -> pagerankDirectedOracle(5),
    "q188_bpe_fertility" -> bpeFertilityOracle(10),
    "q189_communities" -> lpaOracle(4),
    "q200_textrank" -> textrankOracle(4, 50),
    "q201_hash_walks" -> hashWalksOracle(3, 7L),
    "q202_pagerank_personalized" -> pagerankPersonalizedOracle(5),
    // q197: identical ntile binning (the q158 cross-engine contract) +
    // all-integer cumulative capture/lift.
    "q197_gains_table" ->
      """WITH b AS (SELECT event_id,
        |  CAST(round(value * 100.0) AS BIGINT) AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |t AS (SELECT *, CAST(ntile(10) OVER (ORDER BY s DESC, event_id)
        |  AS BIGINT) AS bucket FROM b),
        |p AS (SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
        | FROM t GROUP BY 1),
        |c AS (SELECT bucket, n, n_pos,
        |  CAST(sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_n,
        |  CAST(sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_pos,
        |  CAST(sum(n) OVER () AS BIGINT) AS tot_n,
        |  CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
        | FROM p)
        |SELECT bucket, n, n_pos, cum_n, cum_pos,
        | CASE WHEN tot_pos > 0 THEN
        |   CAST(cum_pos * 1000000 // tot_pos AS BIGINT) END AS capture_e6,
        | CASE WHEN tot_pos > 0 THEN
        |   CAST(cum_pos * tot_n * 1000000 // (cum_n * tot_pos) AS BIGINT)
        | END AS lift_e6
        |FROM c ORDER BY bucket""".stripMargin,
    // q198: the q150 pair derivation + per-item counts over the SAME
    // kept population + the fixed 1e6·n/√(na·nb) dag.
    "q198_item_cosine" ->
      s"""WITH $basketEdgesMat,
        |cnt AS (SELECT item, count(*) AS n FROM kept GROUP BY 1)
        |SELECT p.a AS item_a, p.b AS item_b, p.n AS n_baskets,
        | ca.n AS n_a, cb.n AS n_b,
        | CAST(round(1000000.0 * CAST(p.n AS DOUBLE)
        |   / sqrt(CAST(ca.n * cb.n AS DOUBLE))) AS BIGINT) AS cosine_e6
        |FROM p JOIN cnt ca ON p.a = ca.item
        |JOIN cnt cb ON p.b = cb.item
        |WHERE p.n >= 2
        |ORDER BY item_a, item_b""".stripMargin,
    // q199: one grouped aggregate + the parent-window share, exact
    // integer division.
    "q199_share_of_parent" ->
      """WITH d AS (SELECT event_type,
        |  epoch_ns(ts) // 86400000000000 AS day,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
        |    AS child_total
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, day, child_total,
        | CAST(sum(child_total) OVER (PARTITION BY event_type) AS BIGINT)
        |   AS parent_total,
        | CASE WHEN sum(child_total) OVER (PARTITION BY event_type) != 0
        |   THEN CAST(child_total * 1000000
        |     // sum(child_total) OVER (PARTITION BY event_type) AS BIGINT)
        | END AS share_e6
        |FROM d ORDER BY event_type, day""".stripMargin,
    // q223: min over all ≤3-edge weighted walks — the frontier
    // Bellman–Ford's exact contract, replayed as a recursive CTE.
    "q223_shortest_paths" ->
      s"""WITH RECURSIVE $basketEdgesMat,
        |wsym AS MATERIALIZED (SELECT a AS src, b AS dst,
        |  CAST(1000000 // n AS BIGINT) AS w FROM p WHERE n >= 2
        |  UNION ALL SELECT b, a, CAST(1000000 // n AS BIGINT)
        |  FROM p WHERE n >= 2),
        |seeds AS (SELECT DISTINCT src AS node FROM sym WHERE src % 7 = 0),
        |walk(node, cost, len) AS (
        |  SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.cost + e.w, w.len + 1 FROM walk w
        |  JOIN wsym e ON e.src = w.node WHERE w.len < 3)
        |SELECT node, CAST(min(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY 1 ORDER BY node""".stripMargin,
    // q224: the q28 exact-cosine ranking replayed at k=10, then the same
    // per-term-floored integer metric dag — hits_so_far·1e6 div rank
    // summed, div min(n_rel, k).
    "q224_ranking_eval" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
        |  FROM embeddings),
        |s AS (SELECT qid, nid,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) *
        |     sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |topk AS (SELECT query_id, neighbor_id, rank FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
        |      AS rank FROM s) WHERE rank <= 10),
        |rel AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 20),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |hits AS (SELECT t.query_id, t.rank,
        |  count(*) OVER (PARTITION BY t.query_id ORDER BY t.rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS hits_so_far
        |  FROM topk t JOIN rel USING (query_id, neighbor_id)),
        |agg AS (SELECT query_id, count(*) AS n_rel_found,
        |  min(rank) AS first_rank,
        |  sum(hits_so_far * 1000000 // rank) AS terms
        |  FROM hits GROUP BY 1),
        |base AS (SELECT DISTINCT query_id FROM topk)
        |SELECT b.query_id,
        | CAST(coalesce(n.n_rel, 0) AS BIGINT) AS n_rel,
        | CAST(coalesce(a.n_rel_found, 0) AS BIGINT) AS n_rel_found,
        | CAST(a.first_rank AS BIGINT) AS first_rank,
        | CAST(CASE WHEN coalesce(a.n_rel_found, 0) > 0 THEN 1 ELSE 0 END
        |   AS BIGINT) AS hit_at_k,
        | CAST(CASE WHEN a.first_rank IS NULL THEN 0
        |   ELSE 1000000 // a.first_rank END AS BIGINT) AS rr_e6,
        | CAST(CASE WHEN coalesce(n.n_rel, 0) = 0 THEN NULL
        |   ELSE coalesce(a.terms, 0) // least(n.n_rel, 10) END AS BIGINT)
        |   AS ap_e6
        |FROM base b LEFT JOIN nrel n USING (query_id)
        |LEFT JOIN agg a USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // q222: the q176 frontier chain with the variant riding along and
    // per-variant tallies left-joined down the stages.
    "q222_funnel_by_variant" ->
      """WITH e AS (SELECT user_id, event_type,
        |  {'t': epoch_us(ts), 'i': event_id} AS st,
        |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 3 AS v
        | FROM events),
        |f1 AS (SELECT user_id, v, min(st) AS at FROM e
        |  WHERE event_type = 'view' GROUP BY 1, 2),
        |f2 AS (SELECT e.user_id, f1.v, min(e.st) AS at FROM e
        |  JOIN f1 ON e.user_id = f1.user_id
        |  WHERE e.event_type = 'click' AND e.st > f1.at GROUP BY 1, 2),
        |f3 AS (SELECT e.user_id, f2.v, min(e.st) AS at FROM e
        |  JOIN f2 ON e.user_id = f2.user_id
        |  WHERE e.event_type = 'purchase' AND e.st > f2.at GROUP BY 1, 2),
        |c1 AS (SELECT v, count(*) AS n FROM f1 GROUP BY 1),
        |c2 AS (SELECT v, count(*) AS n FROM f2 GROUP BY 1),
        |c3 AS (SELECT v, count(*) AS n FROM f3 GROUP BY 1)
        |SELECT CAST(v AS BIGINT) AS segment, CAST(stage AS BIGINT)
        |  AS stage, step, CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(conv AS BIGINT) AS conv_from_prev_e6
        |FROM (
        |  SELECT c1.v, 1 AS stage, 'view' AS step, c1.n AS n_keys,
        |    1000000 AS conv FROM c1
        |  UNION ALL
        |  SELECT c1.v, 2, 'click', coalesce(c2.n, 0),
        |    CASE WHEN c1.n = 0 THEN 0
        |      ELSE coalesce(c2.n, 0) * 1000000 // c1.n END
        |  FROM c1 LEFT JOIN c2 USING (v)
        |  UNION ALL
        |  SELECT c1.v, 3, 'purchase', coalesce(c3.n, 0),
        |    CASE WHEN coalesce(c2.n, 0) = 0 THEN 0
        |      ELSE coalesce(c3.n, 0) * 1000000 // c2.n END
        |  FROM c1 LEFT JOIN c2 USING (v) LEFT JOIN c3 USING (v))
        |ORDER BY segment, stage""".stripMargin,
    // q221: identical share-floor-then-square order.
    "q221_hhi_mass" ->
      """WITH pc AS (SELECT o_orderpriority AS priority, o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS m
        | FROM orders WHERE o_totalprice IS NOT NULL
        |   AND round(o_totalprice * 100) >= 0
        | GROUP BY 1, 2),
        |sh AS (SELECT priority, m,
        |  CAST(sum(m) OVER (PARTITION BY priority) AS BIGINT) AS t
        | FROM pc),
        |s2 AS (SELECT priority, count(*) AS n_cats, max(t) AS total_mass,
        |  CAST(sum((m * 1000000 // t) * (m * 1000000 // t)) AS BIGINT)
        |    AS ss
        | FROM sh WHERE t > 0 GROUP BY 1)
        |SELECT priority, n_cats, total_mass,
        | CAST(ss // 1000000 AS BIGINT) AS hhi_e6,
        | CASE WHEN ss // 1000000 > 0 THEN
        |   CAST(1000000000000 // (ss // 1000000) AS BIGINT)
        | END AS eff_cats_e6
        |FROM s2 ORDER BY priority""".stripMargin,
    // q220: identical md5 buckets, cross-multiplied integer lift, and
    // the pooled-z IEEE dag operand-for-operand.
    "q220_experiment_report" ->
      """WITH pe AS (SELECT CAST(user_id AS VARCHAR) AS id,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS conv
        | FROM events GROUP BY 1),
        |v AS (SELECT ('0x' || substr(md5(id), 1, 8))::BIGINT % 3
        |    AS variant, conv FROM pe),
        |per AS (SELECT variant, count(*) AS n,
        |  CAST(sum(conv) AS BIGINT) AS n_conv FROM v GROUP BY 1),
        |c AS (SELECT n AS nc, n_conv AS cc FROM per WHERE variant = 0)
        |SELECT CAST(variant AS BIGINT) AS variant, n, n_conv,
        | CAST(n_conv * 1000000 // n AS BIGINT) AS conv_rate_e6,
        | CASE WHEN variant != 0 AND cc > 0 THEN
        |   CAST(sign(n_conv * nc - cc * n) AS BIGINT) *
        |   (abs(n_conv * nc - cc * n) * 1000000 // (cc * n))
        | END AS lift_e6,
        | CASE WHEN variant != 0 AND (n_conv + cc) > 0
        |   AND (n_conv + cc) < (n + nc) THEN
        |   CAST(round((n_conv / CAST(n AS DOUBLE)
        |       - cc / CAST(nc AS DOUBLE)) /
        |     sqrt(((n_conv + cc) / CAST(n + nc AS DOUBLE))
        |       * (1.0 - (n_conv + cc) / CAST(n + nc AS DOUBLE))
        |       * (1.0 / n + 1.0 / nc)) * 1000000.0) AS BIGINT)
        | END AS z_e6
        |FROM per, c ORDER BY variant""".stripMargin,
    // q219: the same conditional partials as a wide projection.
    "q219_pivot_mart" ->
      """WITH b AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
        |  event_type AS t,
        |  coalesce(CAST(round(value * 100.0) AS BIGINT), 0) AS v
        | FROM events)
        |SELECT day,
        | CAST(sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS view_n,
        | CAST(sum(CASE WHEN t = 'view' THEN v ELSE 0 END) AS BIGINT)
        |   AS view_sum,
        | CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS click_n,
        | CAST(sum(CASE WHEN t = 'click' THEN v ELSE 0 END) AS BIGINT)
        |   AS click_sum,
        | CAST(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS purchase_n,
        | CAST(sum(CASE WHEN t = 'purchase' THEN v ELSE 0 END) AS BIGINT)
        |   AS purchase_sum,
        | CAST(sum(CASE WHEN t = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS signup_n,
        | CAST(sum(CASE WHEN t = 'signup' THEN v ELSE 0 END) AS BIGINT)
        |   AS signup_sum,
        | CAST(sum(CASE WHEN t = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS error_n,
        | CAST(sum(CASE WHEN t = 'error' THEN v ELSE 0 END) AS BIGINT)
        |   AS error_sum
        |FROM b GROUP BY day ORDER BY day""".stripMargin,
    // q218: the oracle is the FULL rebuild over all orders — green
    // proves the algebraic fold ≡ recomputing from scratch.
    "q218_incremental_agg" ->
      """SELECT o_orderpriority AS priority,
        | strftime(o_orderdate, '%Y-%m') AS month,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS total_cents,
        | CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS min_cents,
        | CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS max_cents
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q217: the identical per-step-floored fold — steps encoded
    // n·1e9 + d, sentinel-initialized list_reduce over each prefix.
    "q217_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  event_type FROM events),
        |fu AS (SELECT user_id,
        |  min({'t': ts_us, 'i': event_id, 'y': event_type}) AS fs,
        |  max(ts_us) AS l FROM e GROUP BY 1),
        |fp AS (SELECT user_id, min(ts_us) AS p FROM e
        | WHERE event_type = 'purchase' GROUP BY 1),
        |s AS (SELECT (fu.fs).y AS channel,
        |  (coalesce(fp.p, fu.l) - (fu.fs).t) // 3600000000 AS t,
        |  CASE WHEN fp.p IS NOT NULL THEN 1 ELSE 0 END AS ev
        | FROM fu LEFT JOIN fp USING (user_id)),
        |pt AS (SELECT channel, t, count(*) AS n_t,
        |  CAST(sum(ev) AS BIGINT) AS d FROM s GROUP BY 1, 2),
        |r AS (SELECT *, CAST(sum(n_t) OVER (PARTITION BY channel
        |  ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
        |  CURRENT ROW) AS BIGINT) AS n FROM pt),
        |lst AS (SELECT channel,
        |  list(n * 1000000000 + d ORDER BY t) AS steps
        | FROM r GROUP BY 1),
        |ri AS (SELECT r.*, row_number() OVER (PARTITION BY r.channel
        |  ORDER BY r.t) AS i FROM r)
        |SELECT ri.channel, CAST(ri.t AS BIGINT) AS t,
        | ri.n AS n_at_risk, ri.d AS d_events,
        | CAST(ri.n_t - ri.d AS BIGINT) AS n_censored,
        | CAST(list_reduce(
        |   list_prepend(CAST(1000000 AS BIGINT),
        |     list_slice(lst.steps, 1, ri.i)),
        |   (acc, x) -> CASE WHEN x % 1000000000 > 0
        |     THEN acc * ((x // 1000000000) - (x % 1000000000))
        |       // (x // 1000000000)
        |     ELSE acc END) AS BIGINT) AS survival_e6
        |FROM ri JOIN lst USING (channel)
        |ORDER BY channel, t""".stripMargin,
    // q216: same summary-frame lag, calendar-adjacency guard, and the
    // sign-factored division (Spark div truncates, DuckDB // floors —
    // absolute operands make them agree).
    "q216_period_over_period" ->
      """WITH b AS (SELECT event_type AS key,
        |  epoch_ns(ts) // 86400000000000 AS period,
        |  CAST(round(value * 100.0) AS BIGINT) AS v FROM events),
        |p AS (SELECT key, period, count(*) AS n_events,
        |  CAST(sum(v) AS BIGINT) AS value_e2 FROM b GROUP BY 1, 2),
        |l AS (SELECT *,
        |  lag(period) OVER (PARTITION BY key ORDER BY period) AS pp,
        |  lag(value_e2) OVER (PARTITION BY key ORDER BY period) AS pv
        | FROM p),
        |g AS (SELECT key, period, n_events, value_e2,
        |  CASE WHEN pp = period - 1 THEN pv END AS prev_value_e2 FROM l)
        |SELECT key, period, CAST(n_events AS BIGINT) AS n_events,
        | value_e2, prev_value_e2,
        | value_e2 - prev_value_e2 AS delta_e2,
        | CASE WHEN prev_value_e2 != 0 THEN
        |   CAST(sign(value_e2 - prev_value_e2) * sign(prev_value_e2)
        |     AS BIGINT) *
        |   (abs(value_e2 - prev_value_e2) * 1000000
        |     // abs(prev_value_e2))
        | END AS pct_change_e6
        |FROM g ORDER BY key, period""".stripMargin,
    // q215: identical half-open slices and the entity-space left join.
    "q215_churn_labels" ->
      """WITH e AS (SELECT user_id,
        |  epoch_ns(ts) // 86400000000000 AS day FROM events),
        |pre AS (SELECT user_id AS entity,
        |  CAST(max(day) AS BIGINT) AS last_active_day,
        |  count(*) AS n_events_before
        | FROM e WHERE day < 19752 GROUP BY 1),
        |post AS (SELECT DISTINCT user_id AS entity FROM e
        | WHERE day >= 19752 AND day < 19753)
        |SELECT pre.entity, last_active_day,
        | CAST(19752 - last_active_day AS BIGINT) AS days_silent,
        | CAST(n_events_before AS BIGINT) AS n_events_before,
        | CAST(CASE WHEN post.entity IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |   AS churned
        |FROM pre LEFT JOIN post ON pre.entity = post.entity
        |ORDER BY pre.entity""".stripMargin,
    // q214: month-truncated cohorts, whole-month ages, exact cents,
    // the same summary-frame cumulative window.
    "q214_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey AS entity,
        |  date_trunc('month', o_orderdate) AS m,
        |  coalesce(CAST(round(o_totalprice * 100) AS BIGINT), 0) AS cents
        | FROM orders),
        |f AS (SELECT entity, min(m) AS cohort_month FROM o GROUP BY 1),
        |per AS (SELECT f.cohort_month,
        |  CAST(date_diff('month', f.cohort_month, o.m) AS BIGINT)
        |    AS age_months,
        |  CAST(sum(o.cents) AS BIGINT) AS revenue_cents
        | FROM o JOIN f USING (entity) GROUP BY 1, 2),
        |sz AS (SELECT cohort_month, count(*) AS n_customers
        | FROM f GROUP BY 1)
        |SELECT strftime(per.cohort_month, '%Y-%m') AS cohort_month,
        | age_months, CAST(n_customers AS BIGINT) AS n_customers,
        | revenue_cents,
        | CAST(sum(revenue_cents) OVER (PARTITION BY per.cohort_month
        |   ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |   AS cum_revenue_cents,
        | CAST(sum(revenue_cents) OVER (PARTITION BY per.cohort_month
        |   ORDER BY age_months ROWS UNBOUNDED PRECEDING)
        |   // n_customers AS BIGINT) AS ltv_per_member_cents
        |FROM per JOIN sz USING (cohort_month)
        |ORDER BY cohort_month, age_months""".stripMargin,
    // q213: same grouped rollup, same three entity-tiebroken ntiles.
    "q213_rfm" ->
      """WITH per AS (SELECT o_custkey AS entity,
        |  max(o_orderdate) AS last_d, count(*) AS frequency,
        |  CAST(sum(coalesce(CAST(round(o_totalprice * 100) AS BIGINT), 0))
        |    AS BIGINT) AS monetary_cents
        | FROM orders GROUP BY 1),
        |mx AS (SELECT max(o_orderdate) AS m FROM orders),
        |b AS (SELECT CAST(entity AS BIGINT) AS entity,
        |  CAST(date_diff('day', last_d, mx.m) AS BIGINT) AS recency_days,
        |  CAST(frequency AS BIGINT) AS frequency, monetary_cents
        | FROM per, mx),
        |s AS (SELECT *,
        |  CAST(6 - ntile(5) OVER (ORDER BY recency_days, entity)
        |    AS BIGINT) AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency, entity)
        |    AS BIGINT) AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary_cents, entity)
        |    AS BIGINT) AS m_score
        | FROM b)
        |SELECT entity, recency_days, frequency, monetary_cents,
        | r_score, f_score, m_score,
        | r_score * 100 + f_score * 10 + m_score AS rfm_code
        |FROM s ORDER BY entity""".stripMargin,
    // q212: the same two grouped counts and two integer floor divisions.
    "q212_hhi" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS c
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_cats,
        | CAST(sum(c) AS BIGINT) AS n,
        | CAST(sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
        |   AS hhi_e6,
        | CAST(sum(c) * sum(c) * 1000000 // sum(c * c) AS BIGINT)
        |   AS eff_cats_e6
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q211: the full quadratic join at radius 2 — green proves the
    // two-deletion blocking loses nothing.
    "q211_fuzzy_names_ed2" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
        |    ::BIGINT % 10 = 0)
        |SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
        | CAST(b.c_custkey AS BIGINT) AS id_b,
        | levenshtein(a.c_name, b.c_name) AS dist
        |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // q209: the identical magic-mask Morton spreading (five shift-or-and
    // rounds per dimension), interleave, cell shift, exact min/max.
    "q209_zorder_cells" ->
      """WITH b0 AS (SELECT CAST(l_partkey AS BIGINT) AS x,
        |  CAST(l_suppkey AS BIGINT) AS y,
        |  CAST(l_partkey AS BIGINT) AS sx, CAST(l_suppkey AS BIGINT) AS sy
        | FROM lineitem
        | WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
        |b1 AS (SELECT * REPLACE (
        |  ((sx | (sx << 16)) & 281470681808895) AS sx,
        |  ((sy | (sy << 16)) & 281470681808895) AS sy) FROM b0),
        |b2 AS (SELECT * REPLACE (
        |  ((sx | (sx << 8)) & 71777214294589695) AS sx,
        |  ((sy | (sy << 8)) & 71777214294589695) AS sy) FROM b1),
        |b3 AS (SELECT * REPLACE (
        |  ((sx | (sx << 4)) & 1085102592571150095) AS sx,
        |  ((sy | (sy << 4)) & 1085102592571150095) AS sy) FROM b2),
        |b4 AS (SELECT * REPLACE (
        |  ((sx | (sx << 2)) & 3689348814741910323) AS sx,
        |  ((sy | (sy << 2)) & 3689348814741910323) AS sy) FROM b3),
        |b5 AS (SELECT * REPLACE (
        |  ((sx | (sx << 1)) & 6148914691236517205) AS sx,
        |  ((sy | (sy << 1)) & 6148914691236517205) AS sy) FROM b4),
        |z AS (SELECT x, y, (sx | (sy << 1)) >> 10 AS cell FROM b5)
        |SELECT cell, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
        | min(y) AS min_y, max(y) AS max_y,
        | CAST(max(x) - min(x) AS BIGINT) AS span_x,
        | CAST(max(y) - min(y) AS BIGINT) AS span_y
        |FROM z GROUP BY cell ORDER BY cell""".stripMargin,
    // q208: the q150 pair derivation doubled into directed rules + the
    // three integer floor divisions over identical counts.
    "q208_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS basket,
        |  l_partkey AS item FROM lineitem),
        |sized AS (SELECT basket FROM items GROUP BY basket
        |  HAVING count(*) <= 20),
        |kept AS MATERIALIZED (SELECT i.* FROM items i
        |  JOIN sized USING (basket)),
        |p AS (SELECT a.item AS a, b.item AS b, count(*) AS n
        |  FROM kept a JOIN kept b USING (basket)
        |  WHERE a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2),
        |d AS (SELECT a AS antecedent, b AS consequent, n FROM p
        |  UNION ALL SELECT b, a, n FROM p),
        |cnt AS (SELECT item, count(*) AS n FROM kept GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS nb
        |  FROM kept)
        |SELECT d.antecedent, d.consequent, CAST(d.n AS BIGINT) AS n_ab,
        | ca.n AS n_ante, cb.n AS n_cons, tot.nb AS n_baskets,
        | CAST(d.n * 1000000 // tot.nb AS BIGINT) AS support_e6,
        | CAST(d.n * 1000000 // ca.n AS BIGINT) AS confidence_e6,
        | CAST(d.n * tot.nb * 1000000 // (ca.n * cb.n) AS BIGINT)
        |   AS lift_e6
        |FROM d JOIN cnt ca ON d.antecedent = ca.item
        |JOIN cnt cb ON d.consequent = cb.item, tot
        |ORDER BY antecedent, consequent""".stripMargin,
    // q207: identical clamp, bin multiply-floor-divide, and e6 floor
    // divisions on exact integer sums.
    "q207_calibration" ->
      """WITH b AS (SELECT
        |  greatest(least(CAST(round(value * 100.0) AS BIGINT), 49999), 0)
        |    AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |p AS (SELECT (s * 10) // 50000 AS bin, s, y FROM b)
        |SELECT CAST(bin AS BIGINT) AS bin,
        | CAST((bin * 50000) // 10 AS BIGINT) AS bin_lo_e2,
        | count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
        | CAST(sum(s) * 10000 // count(*) AS BIGINT) AS mean_score_e6,
        | CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_e6
        |FROM p GROUP BY bin ORDER BY bin""".stripMargin,
    // q206: hop-bounded reachability as a recursive CTE; min(dist) over
    // all bounded walks ≡ the operator's first-reach frontier distance.
    "q206_bfs_distances" ->
      s"""WITH RECURSIVE $basketEdgesMat,
        |seeds AS (SELECT DISTINCT src AS node FROM sym WHERE src % 7 = 0),
        |walk(node, dist) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.dist + 1 FROM walk w JOIN sym e ON e.src = w.node
        |  WHERE w.dist < 3)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY 1 ORDER BY node""".stripMargin,
    // q205: the identical integer BM25 dag — bit-length idf, the one
    // cleared-denominator floor division per (term, doc), exact sums.
    // Constants are the k1=1.20 / b=0.75 defaults cleared through:
    // 22000 = (100+120)·100, 3000 = 120·(100−75), 9000 = 120·75.
    "q205_bm25_search" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |  FROM tf GROUP BY 1),
        |st AS (SELECT d, greatest(l // d, 1) AS a FROM (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS d,
        |    (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS l)),
        |dfk AS (SELECT term, st.a,
        |    CAST(length(bin((2 * st.d) // df)) - 1 AS BIGINT) AS bits
        |  FROM (SELECT term, count(*) AS df FROM tf GROUP BY 1), st
        |  WHERE df * 1000000 <= 780000 * st.d),
        |q AS (SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split(trim(text), ' '))) AS term
        |  FROM documents WHERE doc_id % 97 = 0),
        |h AS (SELECT q.query_id, tf.doc_id,
        |    dfk.bits * ((tf.tf * 22000 * dfk.a * 1000000)
        |      // (10000 * dfk.a * tf.tf + 3000 * dfk.a + 9000 * dl.dl))
        |      AS contrib
        |  FROM tf JOIN dfk USING (term) JOIN q USING (term)
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  WHERE q.query_id != tf.doc_id),
        |s AS (SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT)
        |    AS score_e6, count(*) AS n_terms_hit FROM h GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score_e6 DESC, doc_id) AS rank FROM s)
        |SELECT query_id, doc_id AS neighbor_id, CAST(rank AS BIGINT)
        |  AS rank, score_e6, CAST(n_terms_hit AS BIGINT) AS n_terms_hit
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q204: the same per-value rank prefix + the two floor divisions;
    // boundary tie blocks split by the identical row arithmetic.
    "q204_concentration" ->
      """WITH b AS (SELECT event_type,
        |  CAST(round(value * 100.0) AS BIGINT) AS v
        | FROM events WHERE value IS NOT NULL AND round(value * 100.0) >= 0),
        |pv AS (SELECT event_type, v, count(*) AS c FROM b GROUP BY 1, 2),
        |en AS (SELECT *, coalesce(sum(c) OVER (PARTITION BY event_type
        |  ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  0) AS cb FROM pv),
        |st AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(sum(v * c) AS BIGINT) AS total,
        |  CAST(sum(v * c * (2 * cb + c + 1)) AS BIGINT) AS s2
        | FROM en GROUP BY 1),
        |tm AS (SELECT en.event_type,
        |  CAST(sum(en.v * greatest(0, least(en.c,
        |    en.cb + en.c - (st.n - st.n // 10)))) AS BIGINT) AS top_mass
        | FROM en JOIN st USING (event_type) GROUP BY 1)
        |SELECT st.event_type, st.n, st.total,
        | CASE WHEN st.total > 0 THEN
        |   CAST(s2 * 1000000 // (st.n * st.total)
        |     - (st.n + 1) * 1000000 // st.n AS BIGINT) END AS gini_e6,
        | CASE WHEN st.total > 0 AND st.n // 10 > 0 THEN
        |   CAST(tm.top_mass * 1000000 // st.total AS BIGINT)
        | END AS top10_share_e6
        |FROM st JOIN tm USING (event_type)
        |ORDER BY st.event_type""".stripMargin,
    // q203: the q176 frontier chain carrying the previous stamp, exact
    // integer latency sums; named-struct stamps so (at).t extracts.
    "q203_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type,
        |  {'t': epoch_us(ts), 'i': event_id} AS st FROM events),
        |f1 AS (SELECT user_id, min(st) AS at FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(e.st) AS at, min(f1.at) AS pat
        |  FROM e JOIN f1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.st > f1.at GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(e.st) AS at, min(f2.at) AS pat
        |  FROM e JOIN f2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.st > f2.at GROUP BY 1),
        |s AS (
        |  SELECT 2 AS stage, 'click' AS step, count(*) AS n_converted,
        |    CAST(coalesce(sum((at).t - (pat).t), 0) AS BIGINT)
        |      AS sum_latency_us,
        |    CAST(coalesce(max((at).t - (pat).t), 0) AS BIGINT)
        |      AS max_latency_us FROM f2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*),
        |    CAST(coalesce(sum((at).t - (pat).t), 0) AS BIGINT),
        |    CAST(coalesce(max((at).t - (pat).t), 0) AS BIGINT) FROM f3)
        |SELECT CAST(stage AS BIGINT) AS stage, step,
        | CAST(n_converted AS BIGINT) AS n_converted,
        | sum_latency_us, max_latency_us,
        | CASE WHEN n_converted > 0 THEN
        |   CAST(sum_latency_us // n_converted AS BIGINT)
        | END AS mean_latency_us
        |FROM s ORDER BY stage""".stripMargin,
    // q196: the same keyed window-bounded join + per-conversion
    // position/count windows.
    "q196_multi_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, ts_us AS conv_ts, event_id AS conv_tie
        |  FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts_us AS touch_ts, event_id AS touch_tie,
        |  event_type AS touch_type FROM e
        |  WHERE event_type IN ('view', 'click')),
        |j AS (SELECT c.user_id, c.conv_tie, c.conv_ts,
        |  t.touch_tie, t.touch_type, t.touch_ts
        |  FROM c JOIN t ON c.user_id = t.user_id
        |   AND (t.touch_ts < c.conv_ts
        |        OR (t.touch_ts = c.conv_ts AND t.touch_tie < c.conv_tie))
        |   AND t.touch_ts >= c.conv_ts - 14400000000),
        |r AS (SELECT *,
        |  CAST(row_number() OVER (PARTITION BY user_id, conv_tie
        |    ORDER BY touch_ts, touch_tie) AS BIGINT) AS position,
        |  count(*) OVER (PARTITION BY user_id, conv_tie) AS n_touches
        | FROM j)
        |SELECT user_id, conv_tie, conv_ts, touch_tie, touch_type,
        | touch_ts, position, CAST(n_touches AS BIGINT) AS n_touches,
        | CAST(1000000 // n_touches AS BIGINT) AS weight_e6
        |FROM r ORDER BY conv_tie, position""".stripMargin,
    // q195: the rank-sum identity replayed — identical integer prefix
    // sums, identical final divide operand order.
    "q195_group_auc" ->
      """WITH b AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
        |  CAST(round(value * 100.0) AS BIGINT) AS s,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        | FROM events WHERE value IS NOT NULL),
        |ps AS (SELECT day, s, count(*) AS n,
        |  CAST(sum(y) AS BIGINT) AS npos FROM b GROUP BY 1, 2),
        |r AS (SELECT day, s, n, npos,
        |  coalesce(sum(n) OVER (PARTITION BY day ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
        | FROM ps),
        |a AS (SELECT day,
        |  CAST(sum(npos * (2 * c + n + 1)) AS BIGINT) AS r2,
        |  CAST(sum(npos) AS BIGINT) AS n_pos,
        |  CAST(sum(n) - sum(npos) AS BIGINT) AS n_neg
        | FROM r GROUP BY 1)
        |SELECT day, n_pos, n_neg,
        | CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |   CAST(round(1000000.0
        |     * CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
        |     / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
        |     AS BIGINT)
        | END AS auc_e6
        |FROM a ORDER BY day""".stripMargin,
    // q193: identical exact stats + the same divide/round dag (operand
    // order matters — 1e6 * (A + m*(S/N)) / D on both sides).
    "q193_target_encode" ->
      """WITH r AS (SELECT event_id AS id, event_type AS cat,
        |  CAST(round(value * 100.0) AS BIGINT) AS y_e2
        |  FROM events WHERE value IS NOT NULL),
        |pc AS (SELECT cat, count(*) AS n_cat,
        |  CAST(sum(y_e2) AS BIGINT) AS s_cat FROM r GROUP BY 1),
        |g AS (SELECT count(*) AS n_all,
        |  CAST(sum(y_e2) AS BIGINT) AS s_all FROM r)
        |SELECT id, cat,
        | CAST(round(1000000.0 *
        |   (CAST(s_cat - y_e2 AS DOUBLE)
        |     + 10.0 * (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
        |   / CAST(n_cat - 1 + 10 AS DOUBLE)) AS BIGINT) AS enc_e6
        |FROM r JOIN pc USING (cat), g
        |ORDER BY id""".stripMargin,
    // q194: the md5-first-8-hex bucket convention replayed.
    "q194_hash_features" ->
      """SELECT doc_id AS id,
        | ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
        | count(*) AS n
        |FROM (SELECT doc_id, unnest(str_split(trim(text), ' ')) AS tok
        |      FROM documents) u
        |WHERE tok <> ''
        |GROUP BY 1, 2 ORDER BY id, bucket""".stripMargin,
    // q192: exact pair audience stats in SQL; the est_ok booleans ride
    // as TRUE (DataSketches estimates are engine-local — the Spark side
    // must MEASURE them true against its own exact counts).
    "q192_audience_overlap" ->
      """WITH base AS (SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |per AS (SELECT t, count(*) AS n FROM base GROUP BY 1),
        |pairs AS (SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_both
        |  FROM base a JOIN base b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        | pa.n AS n_a, pb.n AS n_b, n_both,
        | CAST(n_both * 1000000 // (pa.n + pb.n - n_both) AS BIGINT)
        |   AS jaccard_e6,
        | TRUE AS est_ok
        |FROM pairs
        |JOIN per pa ON pairs.type_a = pa.t
        |JOIN per pb ON pairs.type_b = pb.t
        |ORDER BY type_a, type_b""".stripMargin,
    // q191: the windowed (ts, tie, type) struct max replayed with
    // DuckDB's named-struct lexicographic max; window-miss and
    // no-touch-at-all both land on 'direct'.
    "q191_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT *, max(CASE WHEN event_type IN ('view', 'click')
        |    THEN {'t': ts_us, 'i': event_id, 'y': event_type} END)
        |  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        | FROM e),
        |ok AS (SELECT *,
        |  lt IS NOT NULL AND (lt).t >= ts_us - 14400000000 AS hit
        | FROM w WHERE event_type = 'purchase')
        |SELECT user_id, event_id, ts_us,
        | CASE WHEN hit THEN (lt).y ELSE 'direct' END AS attributed_type,
        | CASE WHEN hit THEN (lt).t END AS touch_ts_us,
        | CASE WHEN hit THEN (lt).i END AS touch_tie
        |FROM ok ORDER BY event_id""".stripMargin,
    // q190: the q168 history + a LEFT interval join at ts − 1 h; the
    // half-open [from, to) intervals make the match unique by
    // construction.
    "q190_pit_enrich" ->
      """WITH h AS (SELECT user_id, event_type AS state_type,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER w AS valid_to_us,
        |  CAST(row_number() OVER w AS BIGINT) AS version
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |f AS (SELECT user_id, event_id,
        |  epoch_us(ts) - 3600000000 AS as_of_us FROM events)
        |SELECT f.event_id, f.user_id, f.as_of_us,
        | h.version AS version_then, h.state_type AS state_then
        |FROM f LEFT JOIN h ON f.user_id = h.user_id
        | AND h.valid_from_us <= f.as_of_us
        | AND (h.valid_to_us IS NULL OR f.as_of_us < h.valid_to_us)
        |ORDER BY f.event_id""".stripMargin,
    "q172_kcore" -> kcoreOracle(3, 8),
    "q178_pagerank_weighted" -> pagerankWeightedOracle(4),
    // q181: the planted-pair ledger — byte-identical payloads hash
    // identically by construction, and 200 distinct seeded-noise images
    // share no 64-bit dHash (fixed corpus, deterministic).
    "q181_image_neardups" ->
      """SELECT i AS id_a, i + 1000 AS id_b, CAST(0 AS BIGINT) AS hamming
        |FROM range(200) t(i) WHERE i % 10 = 0 ORDER BY id_a""".stripMargin,
    // q185: the q61 session derivation + struct min/max on the genuine
    // 2-key (ts_us, event_id) order — a packed ts·1e6+tie scalar would
    // only be order-equivalent while event_id < 1e6 (r13 advice).
    "q185_entry_exit" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l),
        |m AS (SELECT user_id, session_seq,
        |  (min({'t': ts_us, 'i': event_id, 'y': event_type})).y
        |    AS entry_type,
        |  (max({'t': ts_us, 'i': event_id, 'y': event_type})).y
        |    AS exit_type
        | FROM s GROUP BY 1, 2)
        |SELECT entry_type, exit_type, count(*) AS n_sessions
        |FROM m GROUP BY 1, 2 ORDER BY entry_type, exit_type""".stripMargin,
    // q183: winnow replay — same md5-prefix shingle hashes (the q143
    // convention), windowed list_min, capped inverted-index pair count.
    "q183_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks
        |  FROM documents),
        |hs AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |  i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
        |    || toks[i+2]), 1, 8))::BIGINT) AS h FROM t),
        |fps AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(h) - 4 + 2), i -> list_min(h[i:i+3])))) AS fp
        |  FROM hs WHERE len(h) >= 4),
        |hot AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 100),
        |cf AS (SELECT f.* FROM fps f ANTI JOIN hot USING (fp)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS n_shared
        |  FROM cf a JOIN cf b USING (fp) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
        |FROM p WHERE n_shared >= 2 ORDER BY id_a, id_b""".stripMargin,
    // q184: identical exact-stat + IEEE correlation dag per type pair.
    "q184_metric_corr" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n,
        |    CAST(sum(a.y) AS BIGINT) AS sx, CAST(sum(b.y) AS BIGINT) AS sy,
        |    CAST(sum(a.y * a.y) AS BIGINT) AS sxx,
        |    CAST(sum(b.y * b.y) AS BIGINT) AS syy,
        |    CAST(sum(a.y * b.y) AS BIGINT) AS sxy
        |  FROM daily a JOIN daily b USING (day)
        |  WHERE a.event_type < b.event_type GROUP BY 1, 2)
        |SELECT type_a, type_b, CAST(n AS BIGINT) AS n,
        | CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |  CAST(round(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
        |   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
        | END AS corr_e6
        |FROM p ORDER BY type_a, type_b""".stripMargin,
    // q182: the audio planted-pair ledger (q181's pattern).
    "q182_audio_neardups" ->
      """SELECT i AS id_a, i + 1000 AS id_b, CAST(0 AS BIGINT) AS hamming
        |FROM range(150) t(i) WHERE i % 10 = 0 ORDER BY id_a""".stripMargin,
    // q179: same lead window, same floor-division ms weights, same IEEE
    // ratio chain ((1e6·num)/den)/100.
    "q179_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
        |  CAST(round(value * 100.0) AS BIGINT) AS v
        | FROM events WHERE value IS NOT NULL),
        |d AS (SELECT user_id, v,
        |  (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
        |    // 1000 AS dt_ms FROM e),
        |g AS (SELECT user_id, count(*) AS n_obs,
        |  CAST(sum(coalesce(dt_ms, 0)) AS BIGINT) AS span_ms,
        |  CAST(sum(v * coalesce(dt_ms, 0)) AS BIGINT) AS twap_num
        | FROM d GROUP BY 1)
        |SELECT user_id, n_obs, span_ms, twap_num,
        | CASE WHEN span_ms > 0 THEN
        |  CAST(round(1000000.0 * CAST(twap_num AS DOUBLE)
        |    / CAST(span_ms AS DOUBLE) / 100.0) AS BIGINT)
        | END AS twap_e6
        |FROM g ORDER BY user_id""".stripMargin,
    // q180: the day − row_number island label, counted in streak space.
    "q180_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  epoch_ns(ts) // 86400000000000 AS d FROM events),
        |i AS (SELECT user_id, d,
        |  d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
        | FROM a),
        |st AS (SELECT user_id, island, count(*) AS len
        | FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        | count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q177: the same lead window + path-space count + rank replay.
    "q177_top_paths" ->
      """WITH t AS (SELECT
        |  event_type || '>' || lead(event_type, 1) OVER w || '>'
        |    || lead(event_type, 2) OVER w AS path,
        |  lead(event_type, 2) OVER w IS NOT NULL AS ok
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |c AS (SELECT path, count(*) AS n_occurrences FROM t WHERE ok
        |  GROUP BY 1),
        |r AS (SELECT path, n_occurrences,
        |  CAST(row_number() OVER (ORDER BY n_occurrences DESC, path)
        |    AS BIGINT) AS rank FROM c)
        |SELECT path, n_occurrences, rank FROM r WHERE rank <= 15
        |ORDER BY rank""".stripMargin,
    // q175: the q168 derivation + the same half-open as-of filter.
    "q175_asof_snapshot" ->
      """WITH h AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  event_type, epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER w AS valid_to_us,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT * FROM h WHERE valid_from_us <= 1705363000000000
        |  AND (valid_to_us IS NULL OR valid_to_us > 1705363000000000)
        |ORDER BY user_id""".stripMargin,
    // q176: the progressive-min frontier replayed with a genuine 2-key
    // ROW(ts_us, event_id) stamp — DuckDB ROW comparison IS the (ts, tie)
    // lexicographic order the Spark side's struct-min uses (a packed
    // ts·1e6+tie scalar would break if event_id ever reached 1e6).
    "q176_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type,
        |  ROW(epoch_us(ts), event_id) AS st FROM events),
        |f1 AS (SELECT user_id, min(st) AS at FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |f2 AS (SELECT e.user_id, min(e.st) AS at FROM e JOIN f1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.st > f1.at GROUP BY 1),
        |f3 AS (SELECT e.user_id, min(e.st) AS at FROM e JOIN f2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.st > f2.at GROUP BY 1),
        |c AS (SELECT 1 AS stage, 'view' AS step,
        |    (SELECT count(*) FROM f1) AS n
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM f2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM f3)),
        |w AS (SELECT stage, step, n, lag(n) OVER (ORDER BY stage) AS pn FROM c)
        |SELECT CAST(stage AS BIGINT) AS stage, step,
        | CAST(n AS BIGINT) AS n_keys,
        | CAST(CASE WHEN coalesce(pn, n) = 0 THEN 0
        |      ELSE n * 1000000 // coalesce(pn, n) END AS BIGINT)
        |   AS conv_from_prev_e6
        |FROM w ORDER BY stage""".stripMargin,
    // q231: the same md5 draw + rank replayed over the full corpus.
    "q231_exact_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |    md5('epoch7|' || doc_id) AS draw
        |  FROM documents WHERE doc_id IS NOT NULL),
        |t AS (SELECT doc_id, source,
        |    row_number() OVER (ORDER BY draw, doc_id) AS rnk
        |  FROM d)
        |SELECT doc_id, source, CAST(rnk AS BIGINT) AS sample_rank
        |FROM t WHERE rnk <= 60 ORDER BY sample_rank""".stripMargin,
    // q232: identical URL construction CASEs, then the normalization
    // chain — scheme/host lower, userinfo/port/www handling, path slash
    // trim, tracking-param filter, PSL-lite eTLD+1 — regex for regex.
    // The core (minus ORDER BY) is shared with q238's dedup rollup.
    "q232_url_normalize" -> (urlNormalizeSqlCore +
      "\nORDER BY doc_id"),
    // q238: the same normalization chain as a subquery, collapsed per
    // canonical URL with min-id survivor + variant count.
    "q238_url_dedup" ->
      (s"""WITH nu AS (
        |$urlNormalizeSqlCore
        |)
        |SELECT norm_url, CAST(min(doc_id) AS BIGINT) AS doc_id,
        | CAST(count(*) AS BIGINT) AS n_variants
        |FROM nu GROUP BY norm_url ORDER BY doc_id""".stripMargin),
    // q239: histogram REBUILT from the full corpus + the same integer
    // cum·1e6 ≥ q·total first-bin rule — what the delta fold must equal.
    "q239_histogram_quantiles" ->
      """WITH h AS (SELECT source, n_chars // 50 AS bin, count(*) AS cnt
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT source, bin, cnt,
        |  sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
        |  sum(cnt) OVER (PARTITION BY source) AS total FROM h),
        |q AS (SELECT unnest([500000, 900000]) AS q_e6),
        |x AS (SELECT c.source, q.q_e6, min(c.bin) AS bin
        |  FROM c, q WHERE c.cum * 1000000 >= q.q_e6 * c.total
        |  GROUP BY 1, 2)
        |SELECT source, CAST(q_e6 AS BIGINT) AS q_e6,
        | CAST(bin * 50 AS BIGINT) AS bin_lo,
        | CAST((bin + 1) * 50 AS BIGINT) AS bin_hi
        |FROM x ORDER BY source, q_e6""".stripMargin,
    // q240: reference model from every 7th doc (q73's whole-bit replay),
    // OOV = absent from the reference vocabulary, length(bin(N)) bits.
    "q240_reference_surprisal" ->
      """WITH rt AS (SELECT unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents WHERE doc_id % 7 = 0),
        |f AS (SELECT term, count(*) AS cnt FROM rt GROUP BY term),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM f),
        |t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents),
        |s AS (SELECT t.doc_id, f.cnt IS NULL AS oov,
        |   CASE WHEN f.cnt IS NULL
        |    THEN CAST(length(bin(n.n_total)) AS BIGINT)
        |    ELSE CAST(length(bin(n.n_total // f.cnt)) - 1 AS BIGINT)
        |   END AS bits
        |  FROM t LEFT JOIN f USING (term), n)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(count(CASE WHEN oov THEN 1 END) AS BIGINT) AS n_oov,
        | CAST(sum(bits) AS BIGINT) AS ref_bits,
        | (CAST(sum(bits) AS BIGINT) * 1000000) // count(*)
        |   AS mean_ref_bits_e6
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q233: the report REBUILT from the full corpus (q89's signal CTEs,
    // algebraic columns only) — what the delta fold must equal.
    "q233_incremental_report" ->
      """WITH t AS (SELECT doc_id, source,
        |    string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, source, toks,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM t),
        |s AS (SELECT doc_id, source,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6,
        |  CAST(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS avg_token_len_e6,
        |  CASE WHEN len(toks) < 2 THEN 0
        |   ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE
        |     / len(bg)::DOUBLE) * 1000000.0) AS BIGINT)
        |  END AS dup_2gram_frac_e6
        | FROM g),
        |p AS (SELECT *,
        |  (n_tokens BETWEEN 20 AND 90)
        |   AND (avg_token_len_e6 BETWEEN 3000000 AND 8000000)
        |   AND (ttr_e6 >= 300000) AND (dup_2gram_frac_e6 <= 200000) AS passed
        | FROM s)
        |SELECT source AS domain, CAST(count(*) AS BIGINT) AS docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(count(CASE WHEN passed THEN 1 END) AS BIGINT) AS passed_docs,
        | CAST(count(CASE WHEN passed THEN 1 END) * 1000000 // count(*)
        |   AS BIGINT) AS pass_rate_e6,
        | CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT)
        |   AS tokens_per_doc_e6
        |FROM p GROUP BY source ORDER BY domain""".stripMargin,
    // q234–q237: the winnow candidate → exact-verify → closure prefix
    // (winnowClusterSqlPrefix), each with its own tail — anti-select,
    // keep-best window, cross-source rollup, md5 split bucket map.
    // q250: the full KMV replay — same md5-prefix 60-bit hash, same
    // bottom-k (row_number over the distinct hash set), same one-IEEE-dag
    // estimator ((k−1)·2⁶⁰/h₍ₖ₎, h₍ₖ₎ floored at 1, capped at 10¹⁴),
    // same quotient/remainder err_e6. The ESTIMATE hash-compares — the
    // sketch is a pure function of the input set.
    "q250_kmv_distinct" ->
      s"""WITH d AS (SELECT DISTINCT event_type AS g, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact FROM d
        |  GROUP BY g),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM d),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY g),
        |e AS (SELECT n.g AS event_type, n.n_exact,
        |  CAST(len(kmv) AS BIGINT) AS k_used,
        |  ${kmvEstSql(64)} AS est_kmv
        | FROM sk JOIN n ON sk.g = n.g)
        |SELECT event_type, n_exact, k_used, est_kmv,
        | CASE WHEN est_kmv >= n_exact THEN 1 ELSE -1 END *
        |  ((least(abs(est_kmv - n_exact), n_exact * 1000) // n_exact)
        |    * 1000000 +
        |   (least(abs(est_kmv - n_exact), n_exact * 1000) % n_exact)
        |    * 1000000 // n_exact) AS err_e6
        |FROM e ORDER BY event_type""".stripMargin,
    // q251: merged-bottom-k union slice, the three theta regions as
    // list_filter memberships, one shared estimator CASE — every
    // estimate (union, intersection, both differences) hash-compared.
    "q251_kmv_overlap" ->
      s"""WITH d0 AS (SELECT DISTINCT event_type AS g,
        |  CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT g, u FROM d0 WHERE u IS NOT NULL),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.kmv AS sa, b.kmv AS sb
        |  FROM sk a JOIN sk b ON a.g < b.g),
        |m AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))
        |  AS alls FROM p),
        |mm AS (SELECT *, alls[1:64] AS merged FROM m),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND list_contains(sb, v))) AS BIGINT) AS n_inter_k,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND NOT list_contains(sb, v))) AS BIGINT) AS n_only_a,
        |  CAST(len(list_filter(merged, v -> list_contains(sb, v)
        |    AND NOT list_contains(sa, v))) AS BIGINT) AS n_only_b,
        |  ${kmvEstSql(64, "alls")} AS est_union
        | FROM mm)
        |SELECT type_a, type_b, k_used, n_inter_k,
        | n_inter_k * 1000000 // k_used AS jaccard_e6,
        | est_union,
        | n_inter_k * est_union // k_used AS est_inter,
        | n_only_a * est_union // k_used AS est_only_a,
        | n_only_b * est_union // k_used AS est_only_b
        |FROM x ORDER BY type_a, type_b""".stripMargin,
    // q252: the sketch REBUILT from the full corpus (state ∪ delta) —
    // what union-distinct-sort-truncate folding must equal exactly;
    // the csv pins every element, not just the estimate.
    "q252_kmv_fold" ->
      s"""WITH d AS (SELECT DISTINCT source AS g, text AS u
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 16 GROUP BY g)
        |SELECT g AS source, CAST(len(kmv) AS BIGINT) AS k_used,
        | ${kmvEstSql(16)} AS est_kmv,
        | array_to_string(kmv, ',') AS kmv_csv
        |FROM sk ORDER BY source""".stripMargin,
    // q253: both layers' sketches and estimates replayed, then the same
    // clamped quotient/remainder relative gap and the boolean verdict.
    "q253_kmv_recon" ->
      s"""WITH s1 AS (SELECT DISTINCT user_id AS u FROM events
        |  WHERE user_id IS NOT NULL),
        |s2 AS (SELECT DISTINCT user_id AS u FROM events
        |  WHERE user_id IS NOT NULL AND value > 90.0),
        |h1 AS (SELECT DISTINCT
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM s1),
        |h2 AS (SELECT DISTINCT
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM s2),
        |k1 AS (SELECT coalesce(list(hv ORDER BY hv),
        |    CAST([] AS BIGINT[])) AS kmv FROM
        |  (SELECT hv FROM h1 ORDER BY hv LIMIT 64)),
        |k2 AS (SELECT coalesce(list(hv ORDER BY hv),
        |    CAST([] AS BIGINT[])) AS kmv FROM
        |  (SELECT hv FROM h2 ORDER BY hv LIMIT 64)),
        |e AS (SELECT
        |  (SELECT ${kmvEstSql(64)} FROM k1) AS est_src,
        |  (SELECT ${kmvEstSql(64)} FROM k2) AS est_tgt),
        |f AS (SELECT est_src, est_tgt,
        |  (least(abs(est_src - est_tgt), greatest(est_src, 1) * 1000)
        |    // greatest(est_src, 1)) * 1000000 +
        |  ((least(abs(est_src - est_tgt), greatest(est_src, 1) * 1000)
        |    % greatest(est_src, 1)) * 1000 // greatest(est_src, 1)) * 1000
        |   AS diff_e6
        | FROM e)
        |SELECT 'kmv_distinct(user_id)' AS check_name, est_src, est_tgt,
        | diff_e6, diff_e6 <= 500000 AS within_tolerance
        |FROM f""".stripMargin,
    // q254: q238's normalization core re-keyed by source, then the q250
    // body at k=16 — saturated and exact branches both exercised.
    "q254_url_kmv_distinct" ->
      (s"""WITH nu AS (
        |$urlNormalizeSqlCore
        |),
        |d AS (SELECT DISTINCT doc.source AS g, nu.norm_url AS u
        |  FROM nu JOIN documents doc USING (doc_id)
        |  WHERE nu.norm_url IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact FROM d
        |  GROUP BY g),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 16 GROUP BY g),
        |e AS (SELECT n.g AS source, n.n_exact,
        |  CAST(len(kmv) AS BIGINT) AS k_used,
        |  ${kmvEstSql(16)} AS est_kmv
        | FROM sk JOIN n ON sk.g = n.g)
        |SELECT source, n_exact, k_used, est_kmv,
        | CASE WHEN est_kmv >= n_exact THEN 1 ELSE -1 END *
        |  ((least(abs(est_kmv - n_exact), n_exact * 1000) // n_exact)
        |    * 1000000 +
        |   (least(abs(est_kmv - n_exact), n_exact * 1000) % n_exact)
        |    * 1000000 // n_exact) AS err_e6
        |FROM e ORDER BY source""".stripMargin),
    // q255: the oracle sketches each raw 7-day WINDOW directly — the
    // daily-fold path must equal it exactly (bottom-k of a union of
    // per-day bottom-ks is the window's bottom-k).
    "q255_kmv_rolling" ->
      s"""WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
        |  user_id AS u FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT DISTINCT day,
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM d),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT DISTINCT days.day AS wd, h.hv FROM days JOIN h
        |  ON h.day <= days.day AND h.day > days.day - 7),
        |rk AS (SELECT wd, hv,
        |  row_number() OVER (PARTITION BY wd ORDER BY hv) AS rn FROM w),
        |sk AS (SELECT wd, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 128 GROUP BY wd)
        |SELECT CAST(wd AS BIGINT) AS day,
        | CAST(len(kmv) AS BIGINT) AS k_used,
        | ${kmvEstSql(128)} AS est_kmv
        |FROM sk ORDER BY day""".stripMargin,
    // q256: ONE ranked hash stream sliced at every k (rn <= k), the
    // estimator parameterized by k — (k−1)·2⁶⁰ is exact in a double for
    // every k here, so the literal product matches Spark's plan-time
    // constant bit-for-bit.
    "q256_kmv_error_audit" ->
      """WITH d0 AS (SELECT DISTINCT event_type AS g,
        |  CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT g, u FROM d0 WHERE u IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact FROM d
        |  GROUP BY g),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |ks AS (SELECT unnest([16, 64, 128]) AS k),
        |sk AS (SELECT ks.k, rk.g, list(hv ORDER BY hv) AS kmv
        |  FROM rk JOIN ks ON rk.rn <= ks.k GROUP BY ks.k, rk.g),
        |e AS (SELECT sk.k, sk.g AS event_type, n.n_exact,
        |  CAST(len(kmv) AS BIGINT) AS k_used,
        |  CASE WHEN len(kmv) < sk.k THEN CAST(len(kmv) AS BIGINT)
        |   ELSE CAST(least(round((sk.k - 1) * 1152921504606846976.0 /
        |     CAST(greatest(kmv[len(kmv)], 1) AS DOUBLE)),
        |     100000000000000.0) AS BIGINT) END AS est_kmv
        | FROM sk JOIN n ON sk.g = n.g)
        |SELECT CAST(k AS BIGINT) AS k, event_type, n_exact, k_used,
        | est_kmv,
        | CASE WHEN est_kmv >= n_exact THEN 1 ELSE -1 END *
        |  ((least(abs(est_kmv - n_exact), n_exact * 1000) // n_exact)
        |    * 1000000 +
        |   (least(abs(est_kmv - n_exact), n_exact * 1000) % n_exact)
        |    * 1000000 // n_exact) AS err_e6
        |FROM e ORDER BY k, event_type""".stripMargin,
    // q257: the cumulative prefix sketched directly from the raw rows —
    // what the daily-sketch fold must equal.
    "q257_kmv_growth" ->
      s"""WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
        |  CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT DISTINCT day,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT DISTINCT days.day AS wd, h.hv FROM days JOIN h
        |  ON h.day <= days.day),
        |rk AS (SELECT wd, hv,
        |  row_number() OVER (PARTITION BY wd ORDER BY hv) AS rn FROM w),
        |sk AS (SELECT wd, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY wd)
        |SELECT CAST(wd AS BIGINT) AS day,
        | CAST(len(kmv) AS BIGINT) AS k_used,
        | ${kmvEstSql(64)} AS est_kmv
        |FROM sk ORDER BY day""".stripMargin,
    // q260: q255's window replay with the type key carried through.
    "q260_kmv_rolling_by_type" ->
      s"""WITH d AS (SELECT DISTINCT event_type AS g,
        |  epoch_us(ts) // 86400000000 AS day, user_id AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT DISTINCT g, day,
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM d),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT DISTINCT h.g, days.day AS wd, h.hv FROM days JOIN h
        |  ON h.day <= days.day AND h.day > days.day - 7),
        |rk AS (SELECT g, wd, hv,
        |  row_number() OVER (PARTITION BY g, wd ORDER BY hv) AS rn
        |  FROM w),
        |sk AS (SELECT g, wd, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY g, wd)
        |SELECT g AS event_type, CAST(wd AS BIGINT) AS day,
        | CAST(len(kmv) AS BIGINT) AS k_used,
        | ${kmvEstSql(64)} AS est_kmv
        |FROM sk ORDER BY event_type, day""".stripMargin,
    // q261: the q257 cumulative curve + a lag window, seed 0.
    "q261_kmv_novelty" ->
      s"""WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
        |  CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT DISTINCT day,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM d),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT DISTINCT days.day AS wd, h.hv FROM days JOIN h
        |  ON h.day <= days.day),
        |rk AS (SELECT wd, hv,
        |  row_number() OVER (PARTITION BY wd ORDER BY hv) AS rn FROM w),
        |sk AS (SELECT wd, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY wd),
        |e AS (SELECT CAST(wd AS BIGINT) AS day,
        |  ${kmvEstSql(64)} AS est_kmv
        | FROM sk)
        |SELECT day, est_kmv,
        | est_kmv - coalesce(lag(est_kmv, 1) OVER (ORDER BY day), 0)
        |  AS est_new
        |FROM e ORDER BY day""".stripMargin,
    // q263: daily bottom-k lists joined on the day lattice, the q251
    // theta tail over (d, d+1) pairs.
    "q263_kmv_churn" ->
      s"""WITH d AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
        |  user_id AS u FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT DISTINCT day,
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM d),
        |rk AS (SELECT day, hv,
        |  row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT day, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY day),
        |p AS (SELECT a.day AS type_a, b.day AS type_b, a.kmv AS sa,
        |  b.kmv AS sb FROM sk a JOIN sk b ON b.day = a.day + 1),
        |m AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))
        |  AS alls FROM p),
        |mm AS (SELECT *, alls[1:64] AS merged FROM m),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND list_contains(sb, v))) AS BIGINT) AS n_inter_k,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND NOT list_contains(sb, v))) AS BIGINT) AS n_only_a,
        |  CAST(len(list_filter(merged, v -> list_contains(sb, v)
        |    AND NOT list_contains(sa, v))) AS BIGINT) AS n_only_b,
        |  ${kmvEstSql(64, "alls")} AS est_union
        | FROM mm)
        |SELECT CAST(type_a AS BIGINT) AS type_a,
        | CAST(type_b AS BIGINT) AS type_b, k_used, n_inter_k,
        | n_inter_k * 1000000 // k_used AS jaccard_e6,
        | est_union,
        | n_inter_k * est_union // k_used AS est_inter,
        | n_only_a * est_union // k_used AS est_only_a,
        | n_only_b * est_union // k_used AS est_only_b
        |FROM x ORDER BY type_a""".stripMargin,
    // q262: q259's sketch pairs with per-side estimates and the
    // two-stage containment divisions (denominators are estimates, up
    // to the 1e14 ceiling — remainder·1e6 would overflow).
    "q262_kmv_containment" ->
      s"""WITH a0 AS (SELECT source AS g,
        |  unnest(string_split(trim(text), ' ')) AS u FROM documents),
        |a1 AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM a0
        |  WHERE u IS NOT NULL),
        |rka AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM a1),
        |ska AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rka
        |  WHERE rn <= 64 GROUP BY g),
        |b0 AS (SELECT lang AS g,
        |  unnest(string_split(trim(text), ' ')) AS u FROM documents
        |  WHERE doc_id % 50 = 0),
        |b1 AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM b0
        |  WHERE u IS NOT NULL),
        |rkb AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM b1),
        |skb AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rkb
        |  WHERE rn <= 64 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.kmv AS sa,
        |  b.kmv AS sb FROM ska a CROSS JOIN skb b),
        |m AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))
        |  AS alls FROM p),
        |mm AS (SELECT *, alls[1:64] AS merged FROM m),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND list_contains(sb, v))) AS BIGINT) AS n_inter_k,
        |  ${kmvEstSql(64, "sa")} AS est_a,
        |  ${kmvEstSql(64, "sb")} AS est_b,
        |  ${kmvEstSql(64, "alls")} AS est_union
        | FROM mm),
        |y AS (SELECT type_a, type_b, k_used, n_inter_k, est_a, est_b,
        |  n_inter_k * est_union // k_used AS est_inter FROM x)
        |SELECT type_a, type_b, k_used, n_inter_k, est_a, est_b,
        | est_inter,
        | (least(est_inter, greatest(est_a, 1) * 1000)
        |   // greatest(est_a, 1)) * 1000000 +
        |  ((least(est_inter, greatest(est_a, 1) * 1000)
        |    % greatest(est_a, 1)) * 1000
        |   // greatest(est_a, 1)) * 1000 AS cont_a_in_b_e6,
        | (least(est_inter, greatest(est_b, 1) * 1000)
        |   // greatest(est_b, 1)) * 1000000 +
        |  ((least(est_inter, greatest(est_b, 1) * 1000)
        |    % greatest(est_b, 1)) * 1000
        |   // greatest(est_b, 1)) * 1000 AS cont_b_in_a_e6
        |FROM y ORDER BY type_a, type_b""".stripMargin,
    // q264: the q256 ranked-hash replay fanned out over 5 salts (hash of
    // "salt|value"), one rank stream per (type, salt), sliced at every k;
    // the per-k mean is an integer div of the summed cell errors.
    "q264_kmv_error_multisalt" ->
      """WITH d0 AS (SELECT DISTINCT event_type AS g,
        |  CAST(user_id AS VARCHAR) || '|' ||
        |    CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS u
        |  FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT g, u FROM d0 WHERE u IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_exact FROM d
        |  GROUP BY g),
        |salts AS (SELECT unnest([0, 1, 2, 3, 4]) AS s),
        |h AS (SELECT DISTINCT g, s,
        |  ('0x' || substr(md5(CAST(s AS VARCHAR) || '|' || u), 1, 15))
        |    ::BIGINT AS hv FROM d CROSS JOIN salts),
        |rk AS (SELECT g, s, hv,
        |  row_number() OVER (PARTITION BY g, s ORDER BY hv) AS rn FROM h),
        |ks AS (SELECT unnest([16, 64, 128, 256]) AS k),
        |sk AS (SELECT ks.k, rk.g, rk.s, list(hv ORDER BY hv) AS kmv
        |  FROM rk JOIN ks ON rk.rn <= ks.k GROUP BY ks.k, rk.g, rk.s),
        |e AS (SELECT sk.k, sk.g, sk.s, n.n_exact,
        |  CASE WHEN len(kmv) < sk.k THEN CAST(len(kmv) AS BIGINT)
        |   ELSE CAST(least(round((sk.k - 1) * 1152921504606846976.0 /
        |     CAST(greatest(kmv[len(kmv)], 1) AS DOUBLE)),
        |     100000000000000.0) AS BIGINT) END AS est
        | FROM sk JOIN n ON sk.g = n.g),
        |c AS (SELECT k, least(abs(est - n_exact), n_exact * 1000) AS ae,
        |  n_exact FROM e),
        |x AS (SELECT k, (ae // n_exact) * 1000000 +
        |  (ae % n_exact) * 1000000 // n_exact AS abs_err_e6 FROM c)
        |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_cells,
        | CAST(CAST(sum(abs_err_e6) AS BIGINT) // CAST(count(*) AS BIGINT)
        |   AS BIGINT) AS mean_abs_err_e6,
        | max(abs_err_e6) AS max_abs_err_e6
        |FROM x GROUP BY k ORDER BY k""".stripMargin,
    // q265: the value sample replayed — bottom-128 row-id hashes per
    // group carrying min(v) per hash (the collision rule), values listed
    // ascending, each quantile the same clamped ceil-rank pick.
    "q265_kmv_quantiles" ->
      """WITH d AS (SELECT l_returnflag AS g,
        |  CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) AS rid,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (SELECT g, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d WHERE rid IS NOT NULL AND v IS NOT NULL
        |  GROUP BY 1, 2),
        |rk AS (SELECT g, hv, v,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(v ORDER BY v) AS sv,
        |  CAST(count(*) AS BIGINT) AS k_used
        |  FROM rk WHERE rn <= 128 GROUP BY g)
        |SELECT g AS l_returnflag, k_used,
        | sv[CAST(greatest(1, (250000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_250000,
        | sv[CAST(greatest(1, (500000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_500000,
        | sv[CAST(greatest(1, (900000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_900000,
        | sv[CAST(greatest(1, (990000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_990000
        |FROM sk ORDER BY l_returnflag""".stripMargin,
    // q266: the fold's oracle is the ONE-SHOT sample over the full
    // corpus — fold ≡ rebuild is the structural claim under test.
    "q266_kmv_quantile_fold" ->
      """WITH d AS (SELECT l_returnflag AS g,
        |  CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) AS rid,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (SELECT g, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d WHERE rid IS NOT NULL AND v IS NOT NULL
        |  GROUP BY 1, 2),
        |rk AS (SELECT g, hv, v,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(v ORDER BY v) AS sv,
        |  CAST(count(*) AS BIGINT) AS k_used
        |  FROM rk WHERE rn <= 128 GROUP BY g)
        |SELECT g AS l_returnflag, k_used,
        | sv[CAST(greatest(1, (500000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_500000,
        | sv[CAST(greatest(1, (900000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_900000
        |FROM sk ORDER BY l_returnflag""".stripMargin,
    // q270: the weighted-overlap replay — parallel (hash, mass) lists
    // per source ordered by hash, the merged bottom-k, and the two
    // sample-mass ratios; empty filtered sums coalesce to 0 (Spark's
    // aggregate() identity).
    "q270_kmv_weighted_overlap" ->
      s"""WITH t0 AS (SELECT source AS g,
        |  string_split(trim(text), ' ') AS tk FROM documents),
        |t AS (SELECT g, unnest(list_transform(range(1, len(tk)),
        |  i -> tk[i] || ' ' || tk[i+1])) AS u FROM t0
        |  WHERE len(tk) >= 2),
        |m AS (SELECT g, u, CAST(count(*) AS BIGINT) AS mv FROM t
        |  WHERE u IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(mv) AS BIGINT) AS mass_total FROM m
        |  GROUP BY g),
        |h AS (SELECT g, ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv,
        |  min(mv) AS mv FROM m GROUP BY 1, 2),
        |rk AS (SELECT g, hv, mv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS hs,
        |  list(mv ORDER BY hv) AS ms FROM rk WHERE rn <= 64 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.hs AS ha,
        |  a.ms AS ma, b.hs AS hb, b.ms AS mb,
        |  ta.mass_total AS mass_a_total, tb.mass_total AS mass_b_total
        | FROM sk a JOIN sk b ON a.g < b.g
        | JOIN tot ta ON ta.g = a.g JOIN tot tb ON tb.g = b.g),
        |mm AS (SELECT *, list_sort(list_distinct(list_concat(ha, hb)))
        |  AS alls FROM p),
        |mg AS (SELECT *, alls[1:64] AS merged,
        |  list_filter(alls[1:64], v -> list_contains(ha, v)
        |    AND list_contains(hb, v)) AS inter FROM mm),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(inter) AS BIGINT) AS n_inter_k,
        |  ${kmvEstSql(64, "alls")} AS est_union,
        |  mass_a_total, mass_b_total,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(ha, ma),
        |      q -> list_contains(merged, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS ma_merged,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(hb, mb),
        |      q -> list_contains(merged, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS mb_merged,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(ha, ma),
        |      q -> list_contains(inter, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS ma_inter,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(hb, mb),
        |      q -> list_contains(inter, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS mb_inter
        | FROM mg)
        |SELECT type_a, type_b, k_used, n_inter_k,
        | n_inter_k * 1000000 // k_used AS jaccard_e6,
        | est_union, mass_a_total, mass_b_total,
        | ma_inter * 1000000 // greatest(ma_merged, 1)
        |   AS mass_share_a_inter_e6,
        | mb_inter * 1000000 // greatest(mb_merged, 1)
        |   AS mass_share_b_inter_e6
        |FROM x ORDER BY type_a, type_b""".stripMargin,
    // q272: each window's sample rebuilt from the RAW window rows (what
    // the daily fold must equal), min-v per hash replayed at both the
    // day and window grain.
    "q272_kmv_rolling_quantiles" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(event_id AS VARCHAR) AS rid,
        |  CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |h AS (SELECT day, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT days.day AS wd, h.hv, min(h.v) AS v FROM days JOIN h
        |  ON h.day <= days.day AND h.day > days.day - 7 GROUP BY 1, 2),
        |rk AS (SELECT wd, hv, v,
        |  row_number() OVER (PARTITION BY wd ORDER BY hv) AS rn FROM w),
        |sk AS (SELECT wd, list(v ORDER BY v) AS sv,
        |  CAST(count(*) AS BIGINT) AS k_used
        |  FROM rk WHERE rn <= 64 GROUP BY wd)
        |SELECT CAST(wd AS BIGINT) AS day, k_used,
        | sv[CAST(greatest(1, (500000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_500000,
        | sv[CAST(greatest(1, (900000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_900000
        |FROM sk ORDER BY day""".stripMargin,
    // q273: q272's window replay with the type key carried through.
    "q273_kmv_rolling_quantiles_by_type" ->
      """WITH d AS (SELECT event_type AS g,
        |  epoch_us(ts) // 86400000000 AS day,
        |  CAST(event_id AS VARCHAR) AS rid,
        |  CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |h AS (SELECT g, day,
        |  ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d GROUP BY 1, 2, 3),
        |days AS (SELECT DISTINCT day FROM h),
        |w AS (SELECT h.g, days.day AS wd, h.hv, min(h.v) AS v
        |  FROM days JOIN h
        |  ON h.day <= days.day AND h.day > days.day - 7 GROUP BY 1, 2, 3),
        |rk AS (SELECT g, wd, hv, v,
        |  row_number() OVER (PARTITION BY g, wd ORDER BY hv) AS rn FROM w),
        |sk AS (SELECT g, wd, list(v ORDER BY v) AS sv,
        |  CAST(count(*) AS BIGINT) AS k_used
        |  FROM rk WHERE rn <= 64 GROUP BY g, wd)
        |SELECT g AS event_type, CAST(wd AS BIGINT) AS day, k_used,
        | sv[CAST(greatest(1, (500000 * k_used + 999999) // 1000000)
        |   AS BIGINT)] AS q_500000
        |FROM sk ORDER BY event_type, day""".stripMargin,
    // q274: q270's replay with two sketch sides (per-source training
    // bigrams × per-lang eval-slice bigrams) under a cross join.
    "q274_kmv_weighted_cross" ->
      s"""WITH t0 AS (SELECT source, lang, doc_id,
        |  string_split(trim(text), ' ') AS tk FROM documents),
        |tb AS (SELECT source, lang, doc_id,
        |  unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS u FROM t0
        |  WHERE len(tk) >= 2),
        |ma AS (SELECT source AS g, u, CAST(count(*) AS BIGINT) AS mv
        |  FROM tb WHERE u IS NOT NULL GROUP BY 1, 2),
        |mb AS (SELECT lang AS g, u, CAST(count(*) AS BIGINT) AS mv
        |  FROM tb WHERE u IS NOT NULL AND doc_id % 50 = 0 GROUP BY 1, 2),
        |tota AS (SELECT g, CAST(sum(mv) AS BIGINT) AS mass_total FROM ma
        |  GROUP BY g),
        |totb AS (SELECT g, CAST(sum(mv) AS BIGINT) AS mass_total FROM mb
        |  GROUP BY g),
        |ha AS (SELECT g, ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv,
        |  min(mv) AS mv FROM ma GROUP BY 1, 2),
        |hb AS (SELECT g, ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv,
        |  min(mv) AS mv FROM mb GROUP BY 1, 2),
        |rka AS (SELECT g, hv, mv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM ha),
        |rkb AS (SELECT g, hv, mv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM hb),
        |ska AS (SELECT g, list(hv ORDER BY hv) AS hs,
        |  list(mv ORDER BY hv) AS ms FROM rka WHERE rn <= 64 GROUP BY g),
        |skb AS (SELECT g, list(hv ORDER BY hv) AS hs,
        |  list(mv ORDER BY hv) AS ms FROM rkb WHERE rn <= 64 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.hs AS ha,
        |  a.ms AS mma, b.hs AS hb, b.ms AS mmb,
        |  ta.mass_total AS mass_a_total, tb2.mass_total AS mass_b_total
        | FROM ska a CROSS JOIN skb b
        | JOIN tota ta ON ta.g = a.g JOIN totb tb2 ON tb2.g = b.g),
        |mm AS (SELECT *, list_sort(list_distinct(list_concat(ha, hb)))
        |  AS alls FROM p),
        |mg AS (SELECT *, alls[1:64] AS merged,
        |  list_filter(alls[1:64], v -> list_contains(ha, v)
        |    AND list_contains(hb, v)) AS inter FROM mm),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(inter) AS BIGINT) AS n_inter_k,
        |  ${kmvEstSql(64, "alls")} AS est_union,
        |  mass_a_total, mass_b_total,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(ha, mma),
        |      q -> list_contains(merged, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS ma_merged,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(hb, mmb),
        |      q -> list_contains(merged, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS mb_merged,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(ha, mma),
        |      q -> list_contains(inter, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS ma_inter,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(list_zip(hb, mmb),
        |      q -> list_contains(inter, q[1])),
        |    q -> q[2])), 0) AS BIGINT) AS mb_inter
        | FROM mg)
        |SELECT type_a, type_b, k_used, n_inter_k,
        | n_inter_k * 1000000 // k_used AS jaccard_e6,
        | est_union, mass_a_total, mass_b_total,
        | ma_inter * 1000000 // greatest(ma_merged, 1)
        |   AS mass_share_a_inter_e6,
        | mb_inter * 1000000 // greatest(mb_merged, 1)
        |   AS mass_share_b_inter_e6
        |FROM x ORDER BY type_a, type_b""".stripMargin,
    // q275: the two-sample KS replay — each type's bottom-128 row
    // sample by event-id hash, D as list_max of integer ecdf gaps over
    // the union of sample values.
    "q275_kmv_sample_ks" ->
      """WITH d AS (SELECT event_type AS g,
        |  CAST(event_id AS VARCHAR) AS rid,
        |  CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |h AS (SELECT g, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d GROUP BY 1, 2),
        |rk AS (SELECT g, hv, v,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(v) AS vs FROM rk WHERE rn <= 128
        |  GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.vs AS va,
        |  b.vs AS vb FROM sk a JOIN sk b ON a.g < b.g),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(va) AS BIGINT) AS k_a, CAST(len(vb) AS BIGINT) AS k_b,
        |  va, vb FROM p)
        |SELECT type_a, type_b, k_a, k_b,
        | CAST(list_max(list_transform(list_distinct(list_concat(va, vb)),
        |  x -> abs(CAST(len(list_filter(va, v -> v <= x)) AS BIGINT)
        |    * 1000000 // k_a -
        |   CAST(len(list_filter(vb, v -> v <= x)) AS BIGINT)
        |    * 1000000 // k_b))) AS BIGINT) AS ks_e6
        |FROM x ORDER BY type_a, type_b""".stripMargin,
    // q276: q275's KS tail over the consecutive-day lattice.
    "q276_kmv_ks_daily" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(event_id AS VARCHAR) AS rid,
        |  CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |h AS (SELECT day, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v FROM d GROUP BY 1, 2),
        |rk AS (SELECT day, hv, v,
        |  row_number() OVER (PARTITION BY day ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT day, list(v) AS vs FROM rk WHERE rn <= 128
        |  GROUP BY day),
        |p AS (SELECT CAST(a.day AS BIGINT) AS type_a,
        |  CAST(b.day AS BIGINT) AS type_b, a.vs AS va, b.vs AS vb
        | FROM sk a JOIN sk b ON b.day = a.day + 1),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(va) AS BIGINT) AS k_a, CAST(len(vb) AS BIGINT) AS k_b,
        |  va, vb FROM p)
        |SELECT type_a, type_b, k_a, k_b,
        | CAST(list_max(list_transform(list_distinct(list_concat(va, vb)),
        |  x -> abs(CAST(len(list_filter(va, v -> v <= x)) AS BIGINT)
        |    * 1000000 // k_a -
        |   CAST(len(list_filter(vb, v -> v <= x)) AS BIGINT)
        |    * 1000000 // k_b))) AS BIGINT) AS ks_e6
        |FROM x ORDER BY type_a""".stripMargin,
    // q271: top-3 replayed as a rank window over the same cnt·2³²+user
    // encoding (desc), joined to the ranked-hash KMV replay.
    "q271_heavy_hitter_cardinality" ->
      s"""WITH e AS (SELECT event_type AS g, user_id AS u FROM events
        |  WHERE user_id IS NOT NULL),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_events FROM e
        |  GROUP BY g),
        |h AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM e),
        |rk AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rk
        |  WHERE rn <= 64 GROUP BY g),
        |est AS (SELECT g, ${kmvEstSql(64)} AS est_users FROM sk),
        |c AS (SELECT g, u, CAST(count(*) AS BIGINT) AS cnt FROM e
        |  GROUP BY 1, 2),
        |r AS (SELECT g, u, cnt, row_number() OVER (PARTITION BY g
        |  ORDER BY cnt * 4294967296 + u DESC) AS rank FROM c)
        |SELECT r.g AS event_type, CAST(rank AS BIGINT) AS rank,
        | u AS user_id, cnt, cnt * 1000000 // n_events AS share_e6,
        | est_users, n_events
        |FROM r JOIN est ON r.g = est.g JOIN n ON r.g = n.g
        |WHERE rank <= 3 ORDER BY 1, 2""".stripMargin,
    // q267–q269: the TPC-H Q3/Q5/Q10 shapes as flat SQL — decimal-exact
    // revenue (per-row double product cast DECIMAL(18,4), summed, cast
    // back: the q04 convention), total order via the key tiebreak.
    "q267_q3_shipping_priority" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | o_orderpriority,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        | AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-07-01'
        | AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q268_q5_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1997-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q277_q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        | AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        | AND c_nationkey = n2.n_nationkey
        | AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        | AND l_shipdate >= TIMESTAMP '1997-01-01'
        | AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q269_q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |   AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate >= TIMESTAMP '1998-01-01'
        | AND o_orderdate < TIMESTAMP '1998-04-01'
        | AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    // q278/q279: the TPC-H Q18/Q21 shapes — IN-over-grouped-HAVING and
    // EXISTS/NOT EXISTS self-joins written as the subqueries they are
    // (vs the DataFrame semi/anti joins: a genuinely independent
    // derivation). l_quantity is integral-valued so double sums are
    // order-exact; counts cast to BIGINT to match Spark's long.
    "q278_q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
        | sum(l_quantity) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |   GROUP BY 1 HAVING sum(l_quantity) > 250)
        | AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q279_q21_waiting_suppliers" ->
      """SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        | AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        | AND EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |    AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin,
    // q282/q283: the TPC-H Q17/Q22 shapes written as the correlated /
    // scalar subqueries they are (vs the DataFrame agg-join-back and
    // stat-frame plans: independent derivations). Q17's threshold is an
    // avg over integral-valued doubles (order-exact sum, one IEEE
    // divide) scaled by an explicit DOUBLE 0.2 — DuckDB would otherwise
    // parse 0.2 as DECIMAL(2,1); Q22's threshold compare stays in
    // DECIMAL×BIGINT integer space on both engines.
    "q282_q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
        |  AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        | AND l_quantity < CAST(0.2 AS DOUBLE) * (
        |   SELECT avg(l_quantity) FROM lineitem l2
        |   WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q283_q22_idle_balances" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        | CAST(count(*) AS BIGINT) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |  AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        | AND CAST(c_acctbal AS DECIMAL(18,2)) * (
        |   SELECT CAST(count(*) AS BIGINT) FROM customer c2
        |   WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (1, 3, 5, 7, 9))
        |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
        |   WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (1, 3, 5, 7, 9))
        | AND NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q284: the TPC-H Q13 shape with the restriction in the JOIN
    // condition (the canonical form) — the DataFrame side pushes it
    // into the orders scan instead, legal for LEFT OUTER exactly
    // because it references only the preserved-side's opposite.
    "q284_q13_customer_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey
        |   AND o_orderpriority = '1-URGENT'
        |   AND o_orderdate >= TIMESTAMP '2000-01-01'
        | GROUP BY c_custkey) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // q285: the TPC-H Q8 shape as one flat 8-relation join (nation
    // aliased twice). The share is replayed in exact integer space —
    // decimal sums scaled to e4 BIGINT units, ·10⁶ floor-div (`//` ≡
    // Spark's `div` on non-negative operands) — never a
    // double→BIGINT cast, which rounds in DuckDB and truncates in
    // Spark.
    "q285_q8_market_share" ->
      """SELECT o_year,
        | CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev
        |   ELSE CAST(0.0000 AS DECIMAL(18,4)) END) * 10000 AS BIGINT)
        |  * 1000000 // greatest(CAST(sum(rev) * 10000 AS BIGINT), 1)
        |  AS mkt_share_e6,
        | CAST(sum(rev) AS DOUBLE) AS total_rev
        |FROM (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |   AS rev,
        |  n2.n_name AS supp_nation
        | FROM part, lineitem, orders, customer, supplier,
        |      nation n1, nation n2, region
        | WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = n1.n_nationkey
        |  AND n1.n_regionkey = r_regionkey
        |  AND s_nationkey = n2.n_nationkey
        |  AND r_name = 'AMERICA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01') q
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q286: the symmetric ledger diff as a flat FULL OUTER between the
    // two day-grain rollups; outer-side nulls coalesce to exact-decimal
    // zeros on BOTH engines before the double cast.
    "q286_recon_full_outer" ->
      """WITH booked AS (
        | SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS booked
        | FROM orders GROUP BY 1),
        |shipped AS (
        | SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |   AS shipped
        | FROM lineitem GROUP BY 1)
        |SELECT coalesce(b.day, s.day) AS day,
        | CASE WHEN b.day IS NULL THEN 'shipped_only'
        |      WHEN s.day IS NULL THEN 'booked_only'
        |      ELSE 'both' END AS status,
        | CAST(coalesce(b.booked, CAST(0.00 AS DECIMAL(18,2)))
        |   AS DOUBLE) AS booked,
        | CAST(coalesce(s.shipped, CAST(0.0000 AS DECIMAL(18,4)))
        |   AS DOUBLE) AS shipped
        |FROM booked b FULL OUTER JOIN shipped s ON b.day = s.day
        |ORDER BY day""".stripMargin,
    // q280/q281: the weighted-ECDF replays — same md5-prefix bottom-k
    // sample as q275 (min(v)/min(m) per hash), mass cumsums as integer
    // list HOFs (sum cast BIGINT before the ·10⁶ product — HUGEINT
    // promotion; coalesce(,0) for the empty-prefix identity), `//` ≡
    // Spark's div because every numerator is non-negative.
    "q280_kmv_weighted_ks" ->
      """WITH d AS (SELECT source AS g, CAST(doc_id AS VARCHAR) AS rid,
        |  n_chars AS v,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS m
        |  FROM documents WHERE doc_id IS NOT NULL
        |   AND n_chars IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT g, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v, min(m) AS m FROM d GROUP BY 1, 2),
        |rk AS (SELECT g, hv, v, m,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list({'v': v, 'm': m}) AS s FROM rk
        |  WHERE rn <= 128 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.s AS sa, b.s AS sb
        |  FROM sk a JOIN sk b ON a.g < b.g),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(sa) AS BIGINT) AS k_a, CAST(len(sb) AS BIGINT) AS k_b,
        |  CAST(coalesce(list_sum(list_transform(sa, e -> e.m)), 0)
        |    AS BIGINT) AS mass_a,
        |  CAST(coalesce(list_sum(list_transform(sb, e -> e.m)), 0)
        |    AS BIGINT) AS mass_b,
        |  sa, sb FROM p),
        |j AS (SELECT *, list_distinct(list_concat(
        |  list_transform(sa, e -> e.v), list_transform(sb, e -> e.v)))
        |  AS jumps FROM x)
        |SELECT type_a, type_b, k_a, k_b, mass_a, mass_b,
        | CAST(list_max(list_transform(jumps, t -> abs(
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(sa, e -> e.v <= t), e -> e.m)), 0) AS BIGINT)
        |   * 1000000 // greatest(mass_a, 1) -
        |  CAST(coalesce(list_sum(list_transform(
        |    list_filter(sb, e -> e.v <= t), e -> e.m)), 0) AS BIGINT)
        |   * 1000000 // greatest(mass_b, 1)))) AS BIGINT) AS wks_e6,
        | CAST(list_max(list_transform(jumps, t -> abs(
        |  CAST(len(list_filter(sa, e -> e.v <= t)) AS BIGINT)
        |   * 1000000 // k_a -
        |  CAST(len(list_filter(sb, e -> e.v <= t)) AS BIGINT)
        |   * 1000000 // k_b))) AS BIGINT) AS ks_e6
        |FROM j ORDER BY type_a, type_b""".stripMargin,
    "q281_kmv_weighted_quantiles" ->
      """WITH d AS (SELECT source AS g, CAST(doc_id AS VARCHAR) AS rid,
        |  n_chars AS v,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS m
        |  FROM documents WHERE doc_id IS NOT NULL
        |   AND n_chars IS NOT NULL AND text IS NOT NULL),
        |h AS (SELECT g, ('0x' || substr(md5(rid), 1, 15))::BIGINT AS hv,
        |  min(v) AS v, min(m) AS m FROM d GROUP BY 1, 2),
        |rk AS (SELECT g, hv, v, m,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h),
        |sk AS (SELECT g, list_sort(list({'v': v, 'm': m})) AS sv FROM rk
        |  WHERE rn <= 128 GROUP BY g),
        |x AS (SELECT g, sv, CAST(len(sv) AS BIGINT) AS k_used,
        |  CAST(coalesce(list_sum(list_transform(sv, e -> e.m)), 0)
        |    AS BIGINT) AS mass_total FROM sk)
        |SELECT g AS source, k_used, mass_total,
        | sv[list_filter(range(1, CAST(k_used AS INT) + 1), i ->
        |   CAST(coalesce(list_sum(list_transform(sv[1:i], e -> e.m)), 0)
        |     AS BIGINT) * 1000000 >= 250000 * mass_total)[1]]['v']
        |   AS q_250000,
        | sv[list_filter(range(1, CAST(k_used AS INT) + 1), i ->
        |   CAST(coalesce(list_sum(list_transform(sv[1:i], e -> e.m)), 0)
        |     AS BIGINT) * 1000000 >= 500000 * mass_total)[1]]['v']
        |   AS q_500000,
        | sv[list_filter(range(1, CAST(k_used AS INT) + 1), i ->
        |   CAST(coalesce(list_sum(list_transform(sv[1:i], e -> e.m)), 0)
        |     AS BIGINT) * 1000000 >= 750000 * mass_total)[1]]['v']
        |   AS q_750000
        |FROM x ORDER BY source""".stripMargin,
    // q258: the argmax replayed as a struct list_max over the same
    // "key#s" md5-prefix weights (ties, were they possible, break to
    // the higher shard id in both engines via the (w, s) struct order).
    "q258_rendezvous_reshard" ->
      """WITH a AS (SELECT doc_id,
        | list_max(list_transform(range(0, 8), s ->
        |   {'w': ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
        |      CAST(s AS VARCHAR)), 1, 15))::BIGINT, 's': s}))['s']
        |   AS shard8,
        | list_max(list_transform(range(0, 10), s ->
        |   {'w': ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
        |      CAST(s AS VARCHAR)), 1, 15))::BIGINT, 's': s}))['s']
        |   AS shard10
        | FROM documents)
        |SELECT CAST(shard8 AS BIGINT) AS shard_from,
        | CAST(shard10 AS BIGINT) AS shard_to,
        | CAST(count(*) AS BIGINT) AS n_keys
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q259: both corpora's sketches rebuilt (token sets per source /
    // per eval-slice lang), then the q251 theta tail over the cross
    // pairs.
    "q259_cross_overlap" ->
      s"""WITH a0 AS (SELECT source AS g,
        |  unnest(string_split(trim(text), ' ')) AS u FROM documents),
        |a1 AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM a0
        |  WHERE u IS NOT NULL),
        |rka AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM a1),
        |ska AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rka
        |  WHERE rn <= 64 GROUP BY g),
        |b0 AS (SELECT lang AS g,
        |  unnest(string_split(trim(text), ' ')) AS u FROM documents
        |  WHERE doc_id % 50 = 0),
        |b1 AS (SELECT DISTINCT g,
        |  ('0x' || substr(md5(u), 1, 15))::BIGINT AS hv FROM b0
        |  WHERE u IS NOT NULL),
        |rkb AS (SELECT g, hv,
        |  row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM b1),
        |skb AS (SELECT g, list(hv ORDER BY hv) AS kmv FROM rkb
        |  WHERE rn <= 64 GROUP BY g),
        |p AS (SELECT a.g AS type_a, b.g AS type_b, a.kmv AS sa,
        |  b.kmv AS sb FROM ska a CROSS JOIN skb b),
        |m AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))
        |  AS alls FROM p),
        |mm AS (SELECT *, alls[1:64] AS merged FROM m),
        |x AS (SELECT type_a, type_b,
        |  CAST(len(merged) AS BIGINT) AS k_used,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND list_contains(sb, v))) AS BIGINT) AS n_inter_k,
        |  CAST(len(list_filter(merged, v -> list_contains(sa, v)
        |    AND NOT list_contains(sb, v))) AS BIGINT) AS n_only_a,
        |  CAST(len(list_filter(merged, v -> list_contains(sb, v)
        |    AND NOT list_contains(sa, v))) AS BIGINT) AS n_only_b,
        |  ${kmvEstSql(64, "alls")} AS est_union
        | FROM mm)
        |SELECT type_a, type_b, k_used, n_inter_k,
        | n_inter_k * 1000000 // k_used AS jaccard_e6,
        | est_union,
        | n_inter_k * est_union // k_used AS est_inter,
        | n_only_a * est_union // k_used AS est_only_a,
        | n_only_b * est_union // k_used AS est_only_b
        |FROM x ORDER BY type_a, type_b""".stripMargin,
    // q249: the greedy recurrence as a recursive CTE over sent_idx —
    // (chunk, cur) advances exactly like the Spark fold, seed "full".
    "q249_sentence_packing" ->
      """WITH RECURSIVE p AS (SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){4}\S+) ', '\1. ', 'g') AS text
        |  FROM documents),
        |f AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(text, '[.!?]+\s+'),
        |    x -> trim(x) <> '') AS ss FROM p),
        |e AS (SELECT doc_id,
        |    unnest(range(1, len(ss) + 1)) AS sent_idx,
        |    unnest(ss) AS sentence FROM f),
        |s AS (SELECT doc_id, sent_idx, sentence,
        |    CAST(len(string_split(trim(sentence), ' ')) AS BIGINT)
        |      AS n_tokens
        |  FROM e),
        |r(doc_id, sent_idx, sentence, n_tokens, chunk, cur) AS (
        |  SELECT doc_id, sent_idx, sentence, n_tokens,
        |    CAST(1 AS BIGINT), n_tokens FROM s WHERE sent_idx = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.sent_idx, s.sentence, s.n_tokens,
        |    CASE WHEN r.cur + s.n_tokens <= 25 THEN r.chunk
        |         ELSE r.chunk + 1 END,
        |    CASE WHEN r.cur + s.n_tokens <= 25 THEN r.cur + s.n_tokens
        |         ELSE s.n_tokens END
        |  FROM r JOIN s ON s.doc_id = r.doc_id
        |    AND s.sent_idx = r.sent_idx + 1)
        |SELECT doc_id, sent_idx, sentence, n_tokens,
        | CAST(chunk AS BIGINT) AS chunk_idx
        |FROM r ORDER BY doc_id, sent_idx""".stripMargin,
    // q248: each card section replays its own report's established SQL
    // (q59 mixing, q233 gates, q24 fingerprints, q239 histogram rule),
    // unioned into the long frame.
    "q248_data_card" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    string_split(trim(text), ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, source, text, toks,
        |    CAST(len(toks) AS BIGINT) AS nt FROM t),
        |corpus AS (
        | SELECT 'corpus' AS section, '*' AS domain, 'docs' AS metric,
        |   CAST(count(*) AS BIGINT) AS value FROM n
        | UNION ALL SELECT 'corpus', '*', 'total_tokens',
        |   CAST(sum(nt) AS BIGINT) FROM n
        | UNION ALL SELECT 'corpus', '*', 'n_domains',
        |   CAST(count(DISTINCT source) AS BIGINT) FROM n),
        |mixg AS (SELECT source AS domain, count(*) AS docs,
        |   CAST(sum(nt) AS BIGINT) AS total_tokens FROM n GROUP BY source),
        |mix AS (
        | SELECT 'domains', domain, 'docs', CAST(docs AS BIGINT) FROM mixg
        | UNION ALL SELECT 'domains', domain, 'total_tokens', total_tokens
        |   FROM mixg
        | UNION ALL SELECT 'domains', domain, 'share_e6',
        |   CAST(round(CAST(total_tokens AS DOUBLE)
        |     / CAST((SELECT sum(total_tokens) FROM mixg) AS DOUBLE)
        |     * 1000000.0) AS BIGINT) FROM mixg),
        |g AS (SELECT doc_id, source, toks, nt,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM n),
        |sg AS (SELECT doc_id, source, nt,
        |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6,
        |  CAST(round(CAST(list_sum(list_transform(toks, x -> length(x)))
        |      AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS avg_token_len_e6,
        |  CASE WHEN len(toks) < 2 THEN 0
        |   ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE
        |     / len(bg)::DOUBLE) * 1000000.0) AS BIGINT)
        |  END AS dup_2gram_frac_e6
        | FROM g),
        |p AS (SELECT source,
        |  (nt BETWEEN 20 AND 90)
        |   AND (avg_token_len_e6 BETWEEN 3000000 AND 8000000)
        |   AND (ttr_e6 >= 300000) AND (dup_2gram_frac_e6 <= 200000)
        |   AS passed
        | FROM sg),
        |qg AS (SELECT source AS domain, count(*) AS docs,
        |   count(CASE WHEN passed THEN 1 END) AS passed
        |  FROM p GROUP BY source),
        |qual AS (
        | SELECT 'quality', domain, 'passed_docs', CAST(passed AS BIGINT)
        |   FROM qg
        | UNION ALL SELECT 'quality', domain, 'pass_rate_e6',
        |   CAST(passed * 1000000 // docs AS BIGINT) FROM qg),
        |dg AS (SELECT md5(lower(trim(text))) AS fp, count(*) AS copies
        |  FROM documents GROUP BY 1 HAVING count(*) > 1),
        |dedup AS (
        | SELECT 'dedup', '*', 'exact_dup_groups', CAST(count(*) AS BIGINT)
        |   FROM dg
        | UNION ALL SELECT 'dedup', '*', 'exact_dup_docs',
        |   CAST(coalesce(sum(copies - 1), 0) AS BIGINT) FROM dg),
        |h AS (SELECT nt // 10 AS bin, count(*) AS cnt FROM n GROUP BY 1),
        |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
        |   sum(cnt) OVER () AS total FROM h),
        |q AS (SELECT unnest([500000, 900000]) AS q_e6),
        |x AS (SELECT q.q_e6, min(c.bin) AS bin
        |  FROM c, q WHERE c.cum * 1000000 >= q.q_e6 * c.total GROUP BY 1),
        |lens AS (SELECT 'length', '*',
        |   'p' || (q_e6 // 10000) || '_tokens_bin_lo',
        |   CAST(bin * 10 AS BIGINT) FROM x),
        |card AS (SELECT * FROM corpus UNION ALL SELECT * FROM mix
        | UNION ALL SELECT * FROM qual UNION ALL SELECT * FROM dedup
        | UNION ALL SELECT * FROM lens)
        |SELECT section, domain, metric, value FROM card
        |ORDER BY section, domain, metric""".stripMargin,
    // q247: sequential rule replay — email counted on the original and
    // replaced, numeric_id counted on the REPLACED text (rule order is
    // the contract), token mass from the original, grouped rates.
    "q247_pii_density" ->
      """WITH m AS (SELECT doc_id, source, text ||
        |  (CASE WHEN doc_id % 4 = 0
        |    THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
        |  (CASE WHEN doc_id % 6 = 0 THEN ' ref 9081726354' ELSE '' END)
        |   AS text
        | FROM documents),
        |r1 AS (SELECT doc_id, source,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nt,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS c1,
        |  regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
        |    'g') AS t1
        | FROM m),
        |r2 AS (SELECT doc_id, source, nt, c1,
        |  CAST(len(regexp_extract_all(t1, '[0-9][0-9 -]{6,}[0-9]'))
        |    AS BIGINT) AS c2
        | FROM r1),
        |g AS (SELECT source AS domain, count(*) AS docs,
        |  CAST(count(CASE WHEN c1 + c2 > 0 THEN 1 END) AS BIGINT)
        |    AS docs_with_pii,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(c1 + c2) AS BIGINT) AS total_redactions
        | FROM r2 GROUP BY source)
        |SELECT domain, CAST(docs AS BIGINT) AS docs, docs_with_pii,
        | total_tokens, total_redactions,
        | docs_with_pii * 1000000 // docs AS pii_doc_rate_e6,
        | total_redactions * 1000000 // total_tokens
        |   AS redactions_per_1e6_tokens
        |FROM g ORDER BY domain""".stripMargin,
    // q246: the q239 histogram + first-bin rule for both quantiles, then
    // the same edge clamp (lo → bin_lo, hi → bin_hi − 1) row-local.
    "q246_winsorize_histogram" ->
      """WITH v AS (SELECT event_id, event_type,
        |    CAST(round(value * 100.0) AS BIGINT) AS value_e2
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, value_e2 // 500 AS bin, count(*) AS cnt
        |  FROM v GROUP BY 1, 2),
        |c AS (SELECT event_type, bin, cnt,
        |  sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |  sum(cnt) OVER (PARTITION BY event_type) AS total FROM h),
        |q AS (SELECT unnest([50000, 950000]) AS q_e6),
        |x AS (SELECT c.event_type, q.q_e6, min(c.bin) AS bin
        |  FROM c, q WHERE c.cum * 1000000 >= q.q_e6 * c.total
        |  GROUP BY 1, 2),
        |b AS (SELECT event_type,
        |  min(CASE WHEN q_e6 = 50000 THEN bin * 500 END) AS lo,
        |  min(CASE WHEN q_e6 = 950000 THEN (bin + 1) * 500 - 1 END) AS hi
        | FROM x GROUP BY event_type)
        |SELECT v.event_id, v.event_type, v.value_e2,
        | CAST(least(greatest(v.value_e2, b.lo), b.hi) AS BIGINT)
        |   AS value_e2_wins
        |FROM v JOIN b USING (event_type) ORDER BY event_id""".stripMargin,
    // q245: same suffix CASEs; RE2 spells the script classes \p{Latin}
    // where java.util.regex spells \p{IsLatin} — same Unicode property.
    "q245_script_profile" ->
      """WITH m AS (SELECT doc_id, text ||
        |  (CASE doc_id % 3 WHEN 1 THEN ' привет мир'
        |    WHEN 2 THEN ' 你好世界' ELSE '' END) AS text
        | FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Latin}', '',
        |    'g')) AS BIGINT) AS latin,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Cyrillic}',
        |    '', 'g')) AS BIGINT) AS cyrillic,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Han}', '',
        |    'g')) AS BIGINT) AS han,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '',
        |    'g')) AS BIGINT) AS digits,
        |  CAST(length(text) - length(replace(text, ' ', ''))
        |    AS BIGINT) AS spaces
        | FROM m)
        |SELECT doc_id, n_chars, latin, cyrillic, han, digits, spaces,
        | n_chars - latin - cyrillic - han - digits - spaces AS other,
        | CASE WHEN latin + cyrillic + han = 0 THEN 'other'
        |  WHEN latin >= cyrillic AND latin >= han THEN 'latin'
        |  WHEN cyrillic >= han THEN 'cyrillic' ELSE 'han'
        | END AS main_script
        |FROM c ORDER BY doc_id""".stripMargin,
    // q244: q106's recall scaffold with the projection CTE built from
    // the SAME driver-side sign matrix — each projected coordinate is
    // one list_dot_product against a ±1 literal row (sequential fold ≡
    // the Spark zip-fold), float-cast exactly like the Spark side.
    "q244_random_projection" -> {
      val m = graft.similarity.Similarity.signProjectionMatrix(64, 16, "jl")
      val projCols = m.map(row =>
        s"CAST(list_dot_product(embedding::DOUBLE[], " +
          s"[${row.mkString(", ")}]) AS FLOAT)").mkString(",\n    ")
      s"""WITH full_v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |tr AS (SELECT vec_id, ([$projCols])::DOUBLE[] AS e FROM embeddings),
        |fs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |  list_dot_product(q.e, c.e) /
        |    (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM full_v q, full_v c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |ts AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |  list_dot_product(q.e, c.e) /
        |    (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM tr q, tr c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |fr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM fs),
        |trr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM ts),
        |e AS (SELECT qid, nid FROM fr WHERE rank <= 5),
        |a AS (SELECT qid, nid, 1 AS found FROM trr WHERE rank <= 5)
        |SELECT e.qid AS query_id, CAST(count(*) AS BIGINT) AS n_exact,
        | CAST(count(a.found) AS BIGINT) AS n_found,
        | CAST(round(CAST(count(a.found) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |   * 1000000.0) AS BIGINT) AS recall_e6
        |FROM e LEFT JOIN a USING (qid, nid)
        |GROUP BY e.qid ORDER BY query_id""".stripMargin
    },
    // q242: same punctuation injection (\1 for $1), same split pattern,
    // zipped parallel unnests for the 1-based index of the FILTERED list.
    "q242_sentence_split" ->
      """WITH p AS (SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){4}\S+) ', '\1. ', 'g') AS text
        |  FROM documents),
        |f AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(text, '[.!?]+\s+'),
        |    x -> trim(x) <> '') AS ss FROM p),
        |e AS (SELECT doc_id,
        |    unnest(range(1, len(ss) + 1)) AS sent_idx,
        |    unnest(ss) AS sentence FROM f)
        |SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence,
        | CAST(len(string_split(trim(sentence), ' ')) AS BIGINT) AS n_tokens
        |FROM e ORDER BY doc_id, sent_idx""".stripMargin,
    // q243: identical ceil-division layout arithmetic per candidate L.
    "q243_seqlen_report" ->
      """WITH n AS (SELECT len(string_split(trim(text), ' ')) AS n
        |  FROM documents),
        |e AS (SELECT n.n, unnest([32, 64, 128]) AS seq_len FROM n),
        |g AS (SELECT seq_len, count(*) AS n_docs,
        |   CAST(sum(n) AS BIGINT) AS total_tokens,
        |   CAST(sum((n + seq_len - 1) // seq_len) AS BIGINT) AS n_sequences,
        |   CAST(sum(((n + seq_len - 1) // seq_len) * seq_len - n) AS BIGINT)
        |     AS padded_slots
        |  FROM e GROUP BY seq_len)
        |SELECT CAST(seq_len AS BIGINT) AS seq_len,
        | CAST(n_docs AS BIGINT) AS n_docs, total_tokens, n_sequences,
        | padded_slots,
        | CAST(total_tokens * 1000000 // (n_sequences * seq_len) AS BIGINT)
        |   AS utilization_e6
        |FROM g ORDER BY seq_len""".stripMargin,
    // q241: the q183 winnow replay on both sides — eval slice fps
    // distinct'd, left join + non-null count per doc, >= 1 filter.
    "q241_winnow_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks
        |  FROM documents),
        |hs AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
        |  i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
        |    || toks[i+2]), 1, 8))::BIGINT) AS h FROM t),
        |fps AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(h) - 4 + 2), i -> list_min(h[i:i+3])))) AS fp
        |  FROM hs WHERE len(h) >= 4),
        |ef AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 50 = 0),
        |j AS (SELECT f.doc_id, count(*) AS n_fps, count(e.fp) AS n_shared
        |  FROM fps f LEFT JOIN ef e ON f.fp = e.fp
        |  GROUP BY f.doc_id)
        |SELECT doc_id AS id, CAST(n_shared AS BIGINT) AS n_shared_fps,
        | CAST(n_fps AS BIGINT) AS n_fps,
        | n_shared * 1000000 // n_fps AS shared_frac_e6
        |FROM j WHERE n_shared >= 1 ORDER BY id""".stripMargin,
    "q234_winnow_near_dedup" -> (winnowClusterSqlPrefix +
      """
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> label)
        |ORDER BY doc_id""".stripMargin),
    "q235_winnow_keep_best" -> (winnowClusterSqlPrefix +
      """,
        |rk AS (SELECT labels.id, row_number() OVER (PARTITION BY labels.label
        |    ORDER BY d.n_chars DESC, labels.id) AS rk
        |  FROM labels JOIN documents d ON labels.id = d.doc_id)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM rk WHERE rk > 1)
        |ORDER BY doc_id""".stripMargin),
    "q236_winnow_cross_source" -> (winnowClusterSqlPrefix +
      """,
        |rep AS (SELECT labels.label, count(*) AS n_docs,
        |    count(DISTINCT d.source) AS n_sources
        |  FROM labels JOIN documents d ON labels.id = d.doc_id
        |  GROUP BY labels.label)
        |SELECT label, CAST(n_docs AS BIGINT) AS n_docs,
        | CAST(n_sources AS BIGINT) AS n_sources
        |FROM rep WHERE n_sources >= 2 ORDER BY label""".stripMargin),
    "q237_winnow_leakage_split" -> (winnowClusterSqlPrefix +
      """,
        |keyed AS (SELECT d.doc_id,
        |  ('0x' || substr(md5(CAST(coalesce(l.label, d.doc_id) AS VARCHAR)),
        |    1, 8))::BIGINT % 100 AS b
        |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id)
        |SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM keyed ORDER BY doc_id""".stripMargin),
    // q230: DuckDB's OWN nfc_normalize (utf8proc) against our native
    // expression (java.text.Normalizer) — two independent Unicode NFC
    // implementations agreeing codepoint-for-codepoint is the point;
    // RE2 and java.util.regex read '[^\p{L}\p{Nd}]+' identically.
    "q230_unicode_dedup" ->
      ("""WITH tenth AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |v1 AS (SELECT doc_id + 10000000 AS doc_id,
        |  text || ' Caf' || chr(233) || ' N' || chr(246) || 'is' AS text
        |  FROM tenth),
        |v2 AS (SELECT doc_id + 20000000 AS doc_id,
        |  text || '  cafe' || chr(769) || '   NO' || chr(776) ||
        |    'IS !!' AS text
        |  FROM tenth),
        |corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM v1
        |  UNION ALL SELECT doc_id, text FROM v2),
        |canon AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '[^\p{L}\p{Nd}]+', ' ', 'g'))) AS fingerprint
        |  FROM corpus)
        |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS copies
        |FROM canon GROUP BY 1 HAVING count(*) > 1
        |ORDER BY keep_id""").stripMargin,
    // q229: the hashed-bag dot product replayed as token-unnest ⋈
    // weight VALUES + group-sum (Σ over occurrences ≡ Σ buckets count·w
    // — a different route to the same integers than Spark's row-local
    // fold); the rational sigmoid's floors replay exactly, both
    // branches over non-negative operands so // ≡ div.
    "q229_quality_model" ->
      """WITH w(bucket, w_e6) AS (VALUES (3, 150000), (9, -250000),
        |  (17, 90000), (28, -40000), (41, 500000), (55, -120000)),
        |toks AS (SELECT doc_id,
        |    unnest(str_split(trim(text), ' ')) AS tok FROM documents),
        |dot AS (SELECT t.doc_id, CAST(sum(w.w_e6) AS BIGINT) AS s
        |  FROM toks t JOIN w
        |    ON ('0x' || substr(md5(t.tok), 1, 8))::BIGINT % 64 = w.bucket
        |  WHERE t.tok <> '' GROUP BY 1),
        |sc AS (SELECT d.doc_id, 10000 + coalesce(dot.s, 0) AS score_e6
        |  FROM documents d LEFT JOIN dot USING (doc_id))
        |SELECT doc_id, CAST(score_e6 AS BIGINT) AS score_e6,
        | CAST(500000 + (CASE WHEN score_e6 >= 0
        |   THEN (score_e6 * 500000) // (1000000 + score_e6)
        |   ELSE -((-score_e6 * 500000) // (1000000 - score_e6)) END)
        |   AS BIGINT) AS prob_e6
        |FROM sc ORDER BY doc_id""".stripMargin,
    // q228: same centered-product formula, but the e6 scaling runs in
    // ONE HUGEINT division (Spark chains two ×1000 Long steps — same
    // value, independently derived); sign factored on both sides.
    "q228_acf" ->
      """WITH d AS (SELECT event_type,
        |  epoch_ns(ts) // 86400000000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx
        |  FROM d GROUP BY 1),
        |a AS (SELECT d.event_type, d.day, s.n * d.x - s.sx AS a
        |  FROM d JOIN s USING (event_type)),
        |den AS (SELECT event_type, sum(a * a) AS den FROM a GROUP BY 1),
        |g AS (SELECT s.event_type, s.n, l.lag FROM s,
        |  (SELECT unnest(range(1, 8)) AS lag) l),
        |num AS (SELECT a1.event_type, a2.day - a1.day AS lag,
        |  count(*) AS n_pairs, sum(a1.a * a2.a) AS num
        |  FROM a a1 JOIN a a2 ON a1.event_type = a2.event_type
        |   AND a2.day - a1.day BETWEEN 1 AND 7
        |  GROUP BY 1, 2)
        |SELECT g.event_type, CAST(g.lag AS BIGINT) AS lag,
        | CAST(g.n AS BIGINT) AS n_days,
        | CAST(coalesce(num.n_pairs, 0) AS BIGINT) AS n_pairs,
        | CAST(CASE WHEN den.den = 0 THEN NULL ELSE
        |   (CASE WHEN coalesce(num.num, 0) < 0 THEN -1 ELSE 1 END) *
        |   (abs(CAST(coalesce(num.num, 0) AS HUGEINT)) * 1000000
        |     // den.den) END AS BIGINT) AS r_e6
        |FROM g LEFT JOIN num ON g.event_type = num.event_type
        |  AND g.lag = num.lag
        |JOIN den ON g.event_type = den.event_type
        |ORDER BY g.event_type, g.lag""".stripMargin,
    // q227: the identical per-step floored fold (list_reduce's
    // first-element init IS s₀ = x₀·1e6); the pre-update level comes
    // from lag(ewma) — an independent route to the same prev value.
    "q227_ewma_chart" ->
      """WITH d AS (SELECT event_type,
        |  epoch_ns(ts) // 86400000000000 AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, list(n * 1000000 ORDER BY day) AS xs6
        |  FROM d GROUP BY 1),
        |r AS (SELECT event_type, day, n, row_number() OVER
        |  (PARTITION BY event_type ORDER BY day) AS i FROM d),
        |f AS (SELECT r.event_type, r.day, r.n,
        |  CAST(list_reduce(list_slice(l.xs6, 1, r.i),
        |    (acc, x) -> (300000 * x + 700000 * acc) // 1000000)
        |    AS BIGINT) AS ewma_e6
        |  FROM r JOIN l USING (event_type)),
        |p AS (SELECT *, lag(ewma_e6) OVER
        |  (PARTITION BY event_type ORDER BY day) AS prev FROM f)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        | CAST(n AS BIGINT) AS n, ewma_e6,
        | CAST(n * 1000000 - prev AS BIGINT) AS deviation_e6,
        | coalesce(abs(n * 1000000 - prev) > 10000000, FALSE) AS breach
        |FROM p ORDER BY event_type, day""".stripMargin,
    // q225: independent EXISTS-chain formulation — stage i's valid set
    // is "events of step i with ANY valid step-(i−1) completion strictly
    // earlier and within the gap", no latest-valid-frontier machinery.
    "q225_funnel_windowed" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS i,
        |  event_type FROM events),
        |v1 AS (SELECT user_id, t, i FROM e WHERE event_type = 'view'),
        |v2 AS (SELECT e.user_id, e.t, e.i FROM e
        |  WHERE e.event_type = 'click' AND EXISTS (
        |    SELECT 1 FROM v1 p WHERE p.user_id = e.user_id
        |      AND ROW(p.t, p.i) < ROW(e.t, e.i)
        |      AND p.t >= e.t - 14400000000)),
        |v3 AS (SELECT e.user_id, e.t, e.i FROM e
        |  WHERE e.event_type = 'purchase' AND EXISTS (
        |    SELECT 1 FROM v2 p WHERE p.user_id = e.user_id
        |      AND ROW(p.t, p.i) < ROW(e.t, e.i)
        |      AND p.t >= e.t - 14400000000)),
        |c AS (SELECT 1 AS stage, 'view' AS step,
        |    (SELECT count(DISTINCT user_id) FROM v1) AS n
        |  UNION ALL SELECT 2, 'click',
        |    (SELECT count(DISTINCT user_id) FROM v2)
        |  UNION ALL SELECT 3, 'purchase',
        |    (SELECT count(DISTINCT user_id) FROM v3)),
        |w AS (SELECT stage, step, n, lag(n) OVER (ORDER BY stage) AS pn
        |  FROM c)
        |SELECT CAST(stage AS BIGINT) AS stage, step,
        | CAST(n AS BIGINT) AS n_keys,
        | CAST(CASE WHEN coalesce(pn, n) = 0 THEN 0
        |      ELSE n * 1000000 // coalesce(pn, n) END AS BIGINT)
        |   AS conv_from_prev_e6
        |FROM w ORDER BY stage""".stripMargin,
    // q226: the q196 pair join with the decay dag replayed — identical
    // period quantization, identical power-of-two shifts, identical
    // floor-normalized shares.
    "q226_time_decay" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, ts_us AS conv_ts, event_id AS conv_tie
        |  FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts_us AS touch_ts, event_id AS touch_tie,
        |  event_type AS touch_type FROM e
        |  WHERE event_type IN ('view', 'click')),
        |j AS (SELECT c.user_id, c.conv_tie, c.conv_ts,
        |  t.touch_tie, t.touch_type, t.touch_ts
        |  FROM c JOIN t ON c.user_id = t.user_id
        |   AND (t.touch_ts < c.conv_ts
        |        OR (t.touch_ts = c.conv_ts AND t.touch_tie < c.conv_tie))
        |   AND t.touch_ts >= c.conv_ts - 14400000000),
        |r AS (SELECT *,
        |  CAST(row_number() OVER (PARTITION BY user_id, conv_tie
        |    ORDER BY touch_ts, touch_tie) AS BIGINT) AS position,
        |  count(*) OVER (PARTITION BY user_id, conv_tie) AS n_touches,
        |  (conv_ts - touch_ts) // 1800000000 AS decay_periods
        | FROM j),
        |d AS (SELECT *,
        |  (1::BIGINT << CAST(8 - decay_periods AS INT)) AS raw,
        |  sum(1::BIGINT << CAST(8 - decay_periods AS INT))
        |    OVER (PARTITION BY user_id, conv_tie) AS sraw
        | FROM r)
        |SELECT user_id, conv_tie, conv_ts, touch_tie, touch_type,
        | touch_ts, position, CAST(n_touches AS BIGINT) AS n_touches,
        | CAST(decay_periods AS BIGINT) AS decay_periods,
        | CAST(raw * 1000000 // sraw AS BIGINT) AS weight_e6
        |FROM d ORDER BY conv_tie, position""".stripMargin,
    // q173: exact counts hash-compare; the sketch estimates are
    // DataSketches-engine-local, so their 5%-of-exact contract rides as
    // oracle-TRUE booleans (the q114 pattern).
    "q173_rolling_active_approx" ->
      """WITH active AS (SELECT DISTINCT user_id AS e,
        |  epoch_ns(ts) // 86400000000000 AS d FROM events),
        |daily AS (SELECT d AS day, count(*) AS dau FROM active GROUP BY 1),
        |w AS (SELECT e, unnest(range(d, d + 7)) AS day FROM active),
        |wa AS (SELECT day, count(DISTINCT e) AS wau FROM w GROUP BY 1)
        |SELECT day, dau, wau, TRUE AS dau_ok, TRUE AS wau_ok
        |FROM wa JOIN daily USING (day) ORDER BY day""".stripMargin,
    // q174: identical exact integer baseline + IEEE divide/sqrt dag.
    "q174_seasonal_residuals" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS y_e2
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT *, day % 7 AS slot FROM daily),
        |b AS (SELECT event_type, slot, count(*) AS n_slot,
        |  CAST(sum(y_e2) AS BIGINT) AS sy,
        |  CAST(sum(y_e2 * y_e2) AS BIGINT) AS syy
        |  FROM s GROUP BY 1, 2)
        |SELECT s.event_type, s.day, s.slot, s.y_e2, b.n_slot,
        | CASE WHEN b.n_slot >= 2 AND b.n_slot * b.syy - b.sy * b.sy > 0 THEN
        |  CAST(round(1000000.0
        |   * (CAST(s.y_e2 AS DOUBLE)
        |      - CAST(b.sy AS DOUBLE) / CAST(b.n_slot AS DOUBLE))
        |   / sqrt(CAST(b.n_slot * b.syy - b.sy * b.sy AS DOUBLE)
        |      / (CAST(b.n_slot AS DOUBLE) * (CAST(b.n_slot AS DOUBLE) - 1.0))))
        |   AS BIGINT)
        | END AS z_e6
        |FROM s JOIN b USING (event_type, slot)
        |ORDER BY event_type, day""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS count_order,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | sum(l_quantity) / count(l_quantity) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_daily_stats" ->
      """SELECT CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
        | CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week, event_type,
        | count(*) AS total_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1,2,3,4 ORDER BY 1,2,3,4""".stripMargin,
    "q03_hourly_stats" ->
      """SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
        | count(*) AS total_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q04_revenue_stats" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
        | CAST(month(l_shipdate) AS BIGINT) AS month, l_returnflag,
        | count(*) AS total_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_amount,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_base_price,
        | CASE WHEN sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
        |   THEN CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |        / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100
        |   ELSE CAST(0 AS DOUBLE) END AS disc_pct
        |FROM lineitem GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q53_mart_rollup" ->
      """WITH mart AS (
        | SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
        |  CAST(month(l_shipdate) AS BIGINT) AS month, l_returnflag,
        |  count(*) AS total_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(l_extendedprice) AS avg_base_price
        | FROM lineitem GROUP BY 1,2,3)
        |SELECT year, count(*) AS months,
        | CAST(sum(total_items) AS BIGINT) AS total_items,
        | CAST(sum(CAST(round(sum_base_price * 1000000) AS BIGINT)) AS BIGINT) AS total_revenue_e6,
        | CAST(sum(CAST(round(avg_base_price * 1000000) AS BIGINT)) // count(*) AS BIGINT) AS avg_price_e6
        |FROM mart GROUP BY year ORDER BY year""".stripMargin,
    "q55_mart_hotspots" ->
      """WITH mart AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
        |  count(*) AS total_events FROM events GROUP BY 1, 2)
        |SELECT event_type,
        | CAST(count(DISTINCT hour_of_day) AS BIGINT) AS active_hours,
        | CAST(sum(total_events) AS BIGINT) AS total_events,
        | CAST(max(total_events) AS BIGINT) AS busiest_hour_events
        |FROM mart GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q05_enrich_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, s.s_name AS supplier_name,
        | p.p_name AS part_name, p.p_brand AS part_brand
        |FROM lineitem l
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q06_top_segments" ->
      """SELECT c_mktsegment, count(*) AS order_count,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY order_count DESC, c_mktsegment LIMIT 15""".stripMargin,
    "q07_nation_orders" ->
      """SELECT n_name, count(*) AS order_count,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY order_count DESC, n_name LIMIT 10""".stripMargin,
    "q08_dedupe" ->
      """SELECT user_id, event_type, event_id, ts_us FROM (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        | FROM events) t WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q09_distinct_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "q10_missing_keys" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q11_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q12_moving_avg" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |   / count(*) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q13_silver_chain" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice AS price, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_quantity > 0 AND l_discount < l_tax
        |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q14_null_counts" ->
      """SELECT count(CASE WHEN event_id IS NULL THEN 1 END) AS event_id_nulls,
        | count(CASE WHEN user_id IS NULL THEN 1 END) AS user_id_nulls,
        | count(CASE WHEN event_type IS NULL THEN 1 END) AS event_type_nulls,
        | count(CASE WHEN value IS NULL THEN 1 END) AS value_nulls
        |FROM events""".stripMargin,
    "q15_range_check" ->
      """SELECT count(CASE WHEN l_quantity < 1.0 THEN 1 END) AS l_quantity_below_min,
        | count(CASE WHEN l_quantity > 50.0 THEN 1 END) AS l_quantity_above_max,
        | count(CASE WHEN l_discount < 0.0 THEN 1 END) AS l_discount_below_min,
        | count(CASE WHEN l_discount > 0.1 THEN 1 END) AS l_discount_above_max
        |FROM lineitem""".stripMargin,
    "q16_inset_check" ->
      """SELECT count(CASE WHEN event_type NOT IN ('click','view','purchase') THEN 1 END)
        | AS event_type_not_in_set
        |FROM events""".stripMargin,
    "q17_conditional_agg" ->
      """SELECT event_type,
        | count(CASE WHEN value > 100 THEN 1 END) AS high_value_events,
        | count(*) AS total_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_union_slices" ->
      """SELECT o_orderstatus, count(*) AS order_count FROM (
        | SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        | UNION ALL
        | SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') t
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q19_except_users" ->
      """SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'signup'
        |    AND epoch_ns(ts) // 86400000000000 = 19723
        |EXCEPT SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'error'
        |    AND epoch_ns(ts) // 86400000000000 = 19723
        |ORDER BY user_id""".stripMargin,
    "q20_scalar_funcs" ->
      """SELECT event_id,
        | CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        | CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS h,
        | epoch_us(ts) // 1000000 AS epoch_sec,
        | CASE WHEN value BETWEEN 0 AND 100 THEN 'low'
        |      WHEN value <= 300 THEN 'mid' ELSE 'high' END AS val_bucket,
        | COALESCE(NULLIF(event_type, 'error'), 'none') AS etype,
        | abs(value * -1) AS abs_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q21_text_profile" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id,
        |  CAST(len(toks) AS DOUBLE) AS n, CAST(len(list_distinct(toks)) AS DOUBLE) AS u,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sl
        | FROM t),
        |q AS (SELECT doc_id, n, u, u / n AS ttr, sl / n AS awl,
        |  least(n / 100.0, 1.0) AS lensat FROM p),
        |r AS (SELECT doc_id, n, u, ttr, awl,
        |  ttr * 0.4 + lensat * 0.3 +
        |  greatest(0.0, 1.0 - greatest(0.0, greatest(3.0 - awl, awl - 8.0)) / 5.0) * 0.3 AS score
        | FROM q)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(u AS BIGINT) AS n_unique_tokens,
        | CAST(round(ttr * 1000000.0) AS BIGINT) AS ttr_e6,
        | CAST(round(awl * 1000000.0) AS BIGINT) AS avg_token_len_e6,
        | CAST(round(score * 1000000.0) AS BIGINT) AS quality_score_e6
        |FROM r ORDER BY doc_id""".stripMargin,
    "q22_lang_id" ->
      """WITH s AS (SELECT doc_id, lang,
        | len(list_filter(string_split(trim(text),' '), t -> t IN ('the','and','of','to','a','in','is','it'))) AS en_score,
        | len(list_filter(string_split(trim(text),' '), t -> t IN ('el','la','de','que','y','en','un','es'))) AS es_score,
        | len(list_filter(string_split(trim(text),' '), t -> t IN ('der','die','und','das','ist','ein','nicht','mit'))) AS de_score,
        | len(list_filter(string_split(trim(text),' '), t -> t IN ('le','la','et','les','des','un','une','est'))) AS fr_score,
        | len(list_filter(string_split(trim(text),' '), t -> t IN ('de5','shi4','bu4','le5','wo3','you3','zai4','ta1'))) AS zh_score
        | FROM documents),
        |g AS (SELECT *, greatest(en_score, es_score, de_score, fr_score, zh_score) AS best FROM s)
        |SELECT doc_id, en_score, es_score, de_score, fr_score, zh_score,
        | CASE WHEN en_score = best AND best > 0 THEN 'en'
        |      WHEN es_score = best AND best > 0 THEN 'es'
        |      WHEN de_score = best AND best > 0 THEN 'de'
        |      WHEN fr_score = best AND best > 0 THEN 'fr'
        |      WHEN zh_score = best AND best > 0 THEN 'zh'
        |      ELSE 'und' END AS pred_lang,
        | lang AS labeled_lang
        |FROM g ORDER BY doc_id""".stripMargin,
    "q23_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(trim(text),' '),
        |       t -> CAST(('0x' || substr(md5(t),1,8)) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q48_bpe_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text,
        |   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT)
        |   AS n_bpe_tokens,
        | CAST(round(CAST(len(regexp_extract_all(text,
        |   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS DOUBLE)
        |   / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) * 1000000.0) AS BIGINT)
        |   AS bpe_ratio_e6
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q24_exact_dedup" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM (
        | SELECT doc_id, text, row_number() OVER (
        |   PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        | FROM (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 10000, text FROM documents) u) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q25_json_kv" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(json_extract_string(props, '$.k')) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q26_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.ss AS size_a, sb.ss AS size_b,
        | CAST(round(CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) * 1000000.0) AS BIGINT) AS jaccard_e6
        |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // q89 groups q60's signal CTEs and q21's score formula by source.
    "q89_corpus_report" ->
      """WITH t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, source, toks,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM t),
        |s AS (SELECT doc_id, source,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6,
        |  CAST(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS avg_token_len_e6,
        |  CASE WHEN len(toks) < 2 THEN 0
        |   ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE)
        |     * 1000000.0) AS BIGINT)
        |  END AS dup_2gram_frac_e6,
        |  CAST(round((
        |    (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.4
        |    + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3
        |    + greatest(0.0, 1.0 - greatest(0.0, greatest(
        |        3.0 - CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE),
        |        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) - 8.0)) / 5.0) * 0.3)
        |    * 1000000.0) AS BIGINT) AS score_e6
        | FROM g),
        |p AS (SELECT *,
        |  (n_tokens BETWEEN 20 AND 90)
        |   AND (avg_token_len_e6 BETWEEN 3000000 AND 8000000)
        |   AND (ttr_e6 >= 300000) AND (dup_2gram_frac_e6 <= 200000) AS passed
        | FROM s)
        |SELECT source AS domain, count(*) AS docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(count(CASE WHEN passed THEN 1 END) AS BIGINT) AS passed_docs,
        | CAST(count(CASE WHEN passed THEN 1 END) * 1000000 // count(*) AS BIGINT)
        |   AS pass_rate_e6,
        | CAST(round(quantile_cont(score_e6, 0.5)) AS BIGINT) AS p50_score_e6,
        | CAST(round(quantile_cont(score_e6, 0.9)) AS BIGINT) AS p90_score_e6
        |FROM p GROUP BY source ORDER BY domain""".stripMargin,
    // q88 composes q69's IVF CTEs (REAL-cast normalized centroids, argmax
    // assignment, top-4 probes) with q79's PQ CTEs (subvector codes, query
    // distance tables) — candidates from probed buckets, integer ADC sums.
    "q88_ivfpq_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS j
        |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
        |cb AS (SELECT t.s, seed.j, seed.e[t.s*16+1 : t.s*16+16] AS c
        |  FROM seed, range(4) t(s)),
        |xs AS (SELECT v.vec_id, t.s, v.e[t.s*16+1 : t.s*16+16] AS x
        |  FROM v, range(4) t(s)),
        |pqscored AS (SELECT xs.vec_id, xs.s, cb.j,
        |    list_dot_product(xs.x, xs.x) - 2.0*list_dot_product(xs.x, cb.c)
        |      + list_dot_product(cb.c, cb.c) AS d2
        |  FROM xs JOIN cb ON xs.s = cb.s),
        |codes AS (SELECT vec_id, s, j FROM (SELECT vec_id, s, j,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
        |  FROM pqscored) WHERE rn = 1),
        |qtab AS (SELECT vec_id AS query_id, s, j,
        |    CAST(round(d2 * 1000000.0) AS BIGINT) AS d_e6
        |  FROM pqscored WHERE vec_id < 20),
        |iseed AS (SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS c_idx
        |  FROM v ORDER BY vec_id LIMIT 16),
        |cent AS (SELECT c_idx,
        |  CASE WHEN nrm = 0 THEN e
        |       ELSE list_transform(e, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE)) END AS ce
        |  FROM (SELECT c_idx, e,
        |    CAST(CAST(sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE) AS nrm
        |    FROM iseed)),
        |assign AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, cent.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, cent.ce), cent.c_idx) AS rn
        |  FROM v, cent) WHERE rn = 1),
        |q AS (SELECT vec_id, e FROM v WHERE vec_id < 20),
        |probe AS (SELECT vec_id, c_idx FROM (
        |  SELECT q.vec_id, cent.c_idx,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY -list_dot_product(q.e, cent.ce), cent.c_idx) AS rn
        |  FROM q, cent) WHERE rn <= 4),
        |cand AS (SELECT probe.vec_id AS query_id, assign.vec_id AS neighbor_id
        |  FROM probe JOIN assign ON probe.c_idx = assign.c_idx
        |  WHERE probe.vec_id <> assign.vec_id),
        |adc AS (SELECT cand.query_id, cand.neighbor_id,
        |    CAST(sum(qtab.d_e6) AS BIGINT) AS adc_e6
        |  FROM cand JOIN codes ON codes.vec_id = cand.neighbor_id
        |  JOIN qtab ON qtab.query_id = cand.query_id
        |    AND qtab.s = codes.s AND qtab.j = codes.j
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_e6
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_e6, neighbor_id) AS rank FROM adc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q87_novelty" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(string_split(trim(text),' ')) - 1),
        |  i -> string_split(trim(text),' ')[i] || ' ' ||
        |       string_split(trim(text),' ')[i+1] || ' ' ||
        |       string_split(trim(text),' ')[i+2])) AS sh FROM documents),
        |h AS (SELECT doc_id,
        |  list_transform(sh, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs
        | FROM t),
        |seen AS (SELECT DISTINCT unnest(hs) AS hh FROM h WHERE doc_id % 2 = 0),
        |ng AS (SELECT doc_id, unnest(hs) AS hh FROM h WHERE doc_id % 2 = 1),
        |agg AS (SELECT ng.doc_id, count(*) AS n_shingles,
        |    count(*) - count(seen.hh) AS n_novel
        |  FROM ng LEFT JOIN seen ON ng.hh = seen.hh GROUP BY ng.doc_id)
        |SELECT d.doc_id,
        | CAST(coalesce(agg.n_shingles, 0) AS BIGINT) AS n_shingles,
        | CAST(coalesce(agg.n_novel, 0) AS BIGINT) AS n_novel,
        | CAST(CASE WHEN coalesce(agg.n_shingles, 0) = 0 THEN 0
        |      ELSE agg.n_novel * 1000000 // agg.n_shingles END AS BIGINT)
        |   AS novelty_e6
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q86_domain_budget" ->
      """WITH t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, source,
        |  CAST(len(toks) AS DOUBLE) AS n,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) AS u,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sl
        | FROM t),
        |q AS (SELECT doc_id, source, n, u / n AS ttr, sl / n AS awl,
        |  least(n / 100.0, 1.0) AS lensat FROM p),
        |r AS (SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(round((ttr * 0.4 + lensat * 0.3 +
        |    greatest(0.0, 1.0 - greatest(0.0, greatest(3.0 - awl, awl - 8.0)) / 5.0) * 0.3)
        |    * 1000000.0) AS BIGINT) AS quality_score_e6
        | FROM q),
        |c AS (SELECT doc_id, source, n_tokens, quality_score_e6,
        |  sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY quality_score_e6 DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum_tokens
        | FROM r)
        |SELECT doc_id, source, n_tokens, quality_score_e6,
        | CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c
        |WHERE cum_tokens <= CASE source WHEN 'src0' THEN 300
        |                                WHEN 'src1' THEN 0 ELSE 500 END
        |ORDER BY doc_id""".stripMargin,
    "q85_curriculum" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |  CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rank
        | FROM d),
        |t AS (SELECT count(*) AS total FROM d)
        |SELECT doc_id, n_tokens, rank,
        | CAST((rank - 1) * 4 // t.total AS BIGINT) AS bucket
        |FROM r, t ORDER BY doc_id""".stripMargin,
    // q84 replays the explicit width_bucket formula (floor of the identical
    // double) and the integer share math.
    "q84_histogram_drift" ->
      """WITH bb AS (SELECT CASE WHEN value < 0.0 THEN 0
        |    WHEN value >= 100.0 THEN 11
        |    ELSE CAST(floor((value - 0.0) / 100.0 * 10.0) AS BIGINT) + 1 END AS bucket,
        |  count(*) AS n_base
        | FROM events WHERE event_type = 'view' AND value IS NOT NULL
        | GROUP BY 1),
        |cc AS (SELECT CASE WHEN value < 0.0 THEN 0
        |    WHEN value >= 100.0 THEN 11
        |    ELSE CAST(floor((value - 0.0) / 100.0 * 10.0) AS BIGINT) + 1 END AS bucket,
        |  count(*) AS n_cur
        | FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        | GROUP BY 1),
        |j AS (SELECT coalesce(bb.bucket, cc.bucket) AS bucket,
        |  coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        | FROM bb FULL OUTER JOIN cc ON bb.bucket = cc.bucket),
        |t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM j)
        |SELECT j.bucket, CAST(j.n_base AS BIGINT) AS n_base,
        | CAST(j.n_cur AS BIGINT) AS n_cur,
        | CAST(CASE WHEN t.tb = 0 THEN 0 ELSE j.n_base * 1000000 // t.tb END AS BIGINT) AS share_base_e6,
        | CAST(CASE WHEN t.tc = 0 THEN 0 ELSE j.n_cur * 1000000 // t.tc END AS BIGINT) AS share_cur_e6,
        | CAST(CASE WHEN t.tc = 0 THEN 0 ELSE j.n_cur * 1000000 // t.tc END
        |   - CASE WHEN t.tb = 0 THEN 0 ELSE j.n_base * 1000000 // t.tb END AS BIGINT) AS delta_e6
        |FROM j, t ORDER BY j.bucket""".stripMargin,
    "q83_containment" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.ss AS size_a, sb.ss AS size_b,
        | inter * 1000000 // sa.ss AS containment_a_e6,
        | inter * 1000000 // sb.ss AS containment_b_e6
        |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |WHERE greatest(inter * 1000000 // sa.ss, inter * 1000000 // sb.ss) >= 600000
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_minhash_lsh" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(string_split(trim(text),' ')) - 1),
        |  i -> string_split(trim(text),' ')[i] || ' ' ||
        |       string_split(trim(text),' ')[i+1] || ' ' ||
        |       string_split(trim(text),' ')[i+2])) AS sh FROM documents),
        |h AS (SELECT doc_id,
        |  list_transform(sh, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs
        | FROM t WHERE len(sh) > 0),
        |sig AS (SELECT doc_id,
        | list_min(list_transform(hs, x -> (1000000007 * x + 0) % 4294967311)) AS m0,
        | list_min(list_transform(hs, x -> (998244353 * x + 1) % 4294967311)) AS m1,
        | list_min(list_transform(hs, x -> (754974721 * x + 2) % 4294967311)) AS m2,
        | list_min(list_transform(hs, x -> (167772161 * x + 3) % 4294967311)) AS m3,
        | list_min(list_transform(hs, x -> (469762049 * x + 4) % 4294967311)) AS m4,
        | list_min(list_transform(hs, x -> (595591169 * x + 5) % 4294967311)) AS m5,
        | list_min(list_transform(hs, x -> (645922817 * x + 6) % 4294967311)) AS m6,
        | list_min(list_transform(hs, x -> (897581057 * x + 7) % 4294967311)) AS m7
        | FROM h),
        |bands AS (
        | SELECT doc_id, 0 AS bi, md5(m0 || '|' || m1) AS bk FROM sig
        | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk
        |WHERE a.doc_id < b.doc_id ORDER BY id_a, id_b""".stripMargin,
    "q28_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, nid,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |r AS (SELECT qid AS query_id, nid AS neighbor_id,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank, sim FROM s)
        |SELECT query_id, neighbor_id, rank,
        | CAST(round(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q29_cosine_dupes" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | CAST(round(list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) * 1000000.0) AS BIGINT) AS sim_e6
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.e, b.e) /
        |  (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) > 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q51_tfidf_terms" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (SELECT doc_id, term, tf, df,
        |  tf * 1000000000 // df AS score FROM tf JOIN dfreq USING (term)),
        |ranked AS (SELECT doc_id, term, tf, df, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        | FROM scored)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, CAST(score AS BIGINT) AS score
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q52_group_quantiles" ->
      """SELECT event_type,
        | CAST(round(quantile_cont(value, 0.5) * 1000000.0) AS BIGINT) AS p50_e6,
        | CAST(round(quantile_cont(value, 0.9) * 1000000.0) AS BIGINT) AS p90_e6
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_embed_quantize" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |s2 AS (SELECT vec_id, e, scale,
        |  CASE WHEN scale = 0 THEN 1.0 ELSE scale END AS safe FROM s),
        |q AS (SELECT vec_id, e, scale, safe,
        |  list_transform(e, x -> CAST(floor(x / safe + 0.5) AS INTEGER)) AS codes
        | FROM s2)
        |SELECT vec_id,
        | CAST(round(scale * 1000000000.0) AS BIGINT) AS scale_e9,
        | CAST(list_sum(codes) AS BIGINT) AS code_sum,
        | CAST(list_min(codes) AS BIGINT) AS code_min,
        | CAST(list_max(codes) AS BIGINT) AS code_max,
        | CAST(round(list_max(list_transform(range(1, len(e) + 1),
        |   i -> abs(e[i] - codes[i] * scale))) * 1000000.0) AS BIGINT) AS max_err_e6
        |FROM q ORDER BY vec_id""".stripMargin,
    "q50_positive_check" ->
      """SELECT count(CASE WHEN l_quantity <= 0 THEN 1 END) AS l_quantity_non_positive,
        | count(CASE WHEN l_extendedprice <= 0 THEN 1 END) AS l_extendedprice_non_positive,
        | count(CASE WHEN l_discount <= 0 THEN 1 END) AS l_discount_non_positive
        |FROM lineitem""".stripMargin,
    "q30_zscore_stats" ->
      """WITH st AS (SELECT count(value) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT) * CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS s2
        | FROM events),
        |b AS (SELECT n,
        |  s1 / CAST(n AS DOUBLE) / 100.0 AS mean,
        |  CASE WHEN n > 1 THEN
        |    sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / 100.0
        |  END AS stddev FROM st),
        |c AS (SELECT n, mean, stddev,
        |  mean - 3.0 * stddev AS lo, mean + 3.0 * stddev AS hi FROM b)
        |SELECT n, mean, stddev, lo, hi,
        | (SELECT count(CASE WHEN value < c.lo OR value > c.hi THEN 1 END) FROM events) AS anomaly_count
        |FROM c""".stripMargin,
    "q31_moving_anomaly" ->
      """WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 100.0) AS BIGINT) AS vc FROM events),
        |r AS (SELECT event_id, user_id, value,
        |  CAST(count(*) OVER w AS DOUBLE) AS n,
        |  CAST(sum(vc) OVER w AS DOUBLE) AS s1,
        |  CAST(sum(vc * vc) OVER w AS DOUBLE) AS s2
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT event_id, user_id, value, n,
        |  s1 / n / 100.0 AS roll_mean,
        |  CASE WHEN n > 1 THEN sqrt((s2 - s1 * s1 / n) / (n - 1.0)) / 100.0 END AS roll_std
        | FROM r)
        |SELECT event_id, user_id, CAST(n AS BIGINT) AS roll_n, roll_mean, roll_std,
        | CASE WHEN roll_std IS NOT NULL AND roll_std > 0
        |       AND abs(value - roll_mean) > 2.0 * roll_std
        |      THEN true ELSE false END AS is_anomaly
        |FROM m ORDER BY event_id""".stripMargin,
    "q32_rare_categories" ->
      """WITH t AS (SELECT count(*) AS total FROM events),
        |g AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
        |SELECT event_type, cnt,
        | CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS freq,
        | CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) < 0.15 AS is_rare
        |FROM g, t ORDER BY event_type""".stripMargin,
    "q33_error_rows" ->
      """WITH a AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |  WHERE l_discount > 0.08 ORDER BY l_orderkey, l_linenumber LIMIT 100),
        |b AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |  WHERE l_quantity >= 49 ORDER BY l_orderkey, l_linenumber LIMIT 100)
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS column_name,
        | 'range_check' AS error_type, 'HIGH' AS severity, '' AS error_message FROM a
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_quantity', 'range_check', 'MEDIUM', '' FROM b
        |ORDER BY column_name, l_orderkey, l_linenumber""".stripMargin,
    "q34_incremental_merge" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
        | CAST(month(o_orderdate) AS BIGINT) AS month,
        | count(*) AS order_count,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q35_exact_quantiles" ->
      """WITH q AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75, 0.9]) AS qs FROM events)
        |SELECT CAST(round(qs[1] * 1000000.0) AS BIGINT) AS p25_e6,
        | CAST(round(qs[2] * 1000000.0) AS BIGINT) AS p50_e6,
        | CAST(round(qs[3] * 1000000.0) AS BIGINT) AS p75_e6,
        | CAST(round(qs[4] * 1000000.0) AS BIGINT) AS p90_e6
        |FROM q""".stripMargin,
    "q36_count_distinct" ->
      // the composite count pins Spark's countDistinct(a, b) NULL semantics
      // (rows with ANY null key are excluded) — DuckDB's bare
      // count(DISTINCT (a, b)) would count null-bearing tuples
      """SELECT count(DISTINCT user_id) AS distinct_users,
        | count(DISTINCT event_type) AS distinct_types,
        | count(DISTINCT CASE WHEN user_id IS NOT NULL AND event_type IS NOT NULL
        |   THEN (user_id, event_type) END) AS distinct_pairs
        |FROM events""".stripMargin,
    "q46_zscore_severity" ->
      """WITH st AS (SELECT count(value) AS n,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(round(value * 100.0) AS BIGINT) * CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) AS s2
        | FROM events),
        |b AS (SELECT n,
        |  s1 / CAST(n AS DOUBLE) / 100.0 AS mean,
        |  CASE WHEN n > 1 THEN
        |    sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) / 100.0
        |  END AS stddev FROM st),
        |c AS (SELECT mean, stddev,
        |  mean - 3.0 * stddev AS lo, mean + 3.0 * stddev AS hi FROM b)
        |SELECT event_id, value,
        | CAST(round(abs((value - mean) / stddev) * 1000000.0) AS BIGINT) AS z_e6,
        | CASE WHEN abs((value - mean) / stddev) > 5 THEN 'CRITICAL'
        |      WHEN abs((value - mean) / stddev) > 4 THEN 'HIGH'
        |      WHEN abs((value - mean) / stddev) > 3 THEN 'MEDIUM'
        |      ELSE 'LOW' END AS severity
        |FROM events, c WHERE value < lo OR value > hi
        |ORDER BY event_id""".stripMargin,
    "q54_iqr_severity" ->
      """WITH q AS (SELECT quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.75) AS p75 FROM events),
        |b AS (SELECT p75 - p25 AS iqr,
        |  p25 - 1.5 * (p75 - p25) AS lo,
        |  p75 + 1.5 * (p75 - p25) AS hi FROM q),
        |a AS (SELECT event_id, value,
        |  CASE WHEN iqr > 0
        |    THEN least(abs(value - lo), abs(value - hi)) / iqr
        |    ELSE 0.0 END AS dist
        | FROM events, b WHERE value < lo OR value > hi)
        |SELECT event_id, value,
        | CAST(round(dist * 1000000.0) AS BIGINT) AS dist_e6,
        | CASE WHEN dist > 5 THEN 'CRITICAL'
        |      WHEN dist > 3 THEN 'HIGH'
        |      WHEN dist > 2 THEN 'MEDIUM'
        |      ELSE 'LOW' END AS severity
        |FROM a ORDER BY event_id""".stripMargin,
    // q38: the 32-bit simhash is fully deterministic (md5 token hashes,
    // ±1 bit sums), so the whole pipeline — tokenize, hash, signature,
    // hamming pairs — replays in SQL. The oracle pairs brute-force (tiny at
    // sf0.01); the Spark side's banded blocking must produce the identical
    // pair set (pigeonhole exactness).
    "q38_simhash_pairs" -> {
      val bitSums = (0 until 32)
        .map(b => s"sum(2*((th >> $b) & 1) - 1) AS s$b").mkString(", ")
      val sigBits = (0 until 32)
        .map(b => s"(CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |    unnest(string_split(trim(text), ' ')) AS tok FROM documents),
         |h AS (SELECT doc_id,
         |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM t),
         |s AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
         |g AS (SELECT doc_id, $sigBits AS sig FROM s)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },
    // q47: FNV-1a 64 replayed per character with a recursive CTE — HUGEINT
    // modular arithmetic emulates the 64-bit wraparound multiply; the
    // unsigned signature folds back to Spark's signed long at the end.
    // Text is space-tokenized with empties kept (split(trim(text),' ')
    // semantics); whitespace-only docs yield null sigs on both engines and
    // are excluded. CAVEAT: the SQL iterates Unicode CODE POINTS while the
    // native expression iterates UTF-16 CODE UNITS — identical for BMP
    // text (the corpus is ASCII, asserted by the compare itself), but a
    // supplementary-plane character (emoji) would hash as one round here
    // and two rounds natively. A surrogate-exact SQL twin isn't worth the
    // contortion; this note is the tripwire if the corpus ever changes.
    "q47_simhash64_pairs" -> {
      val bitSums = (0 until 64)
        .map(b => s"sum(CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
        .mkString(", ")
      val sigBits = (0 until 64)
        .map(b => s"(CASE WHEN s$b > 0 THEN (1::HUGEINT << $b) ELSE 0::HUGEINT END)")
        .mkString(" + ")
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, string_split(trim(text), ' ') AS lst
         |  FROM documents WHERE trim(text) <> ''),
         |toks AS (SELECT doc_id, generate_subscripts(lst, 1) AS t_idx,
         |  unnest(lst) AS tok FROM d),
         |fnv AS (
         |  SELECT doc_id, t_idx, tok, 0 AS pos,
         |    14695981039346656037::HUGEINT AS h FROM toks
         |  UNION ALL
         |  SELECT doc_id, t_idx, tok, pos + 1,
         |    (xor(h, unicode(substr(tok, pos + 1, 1))::HUGEINT)
         |      * 1099511628211) % 18446744073709551616::HUGEINT
         |  FROM fnv WHERE pos < length(tok)),
         |th AS (SELECT doc_id, h FROM fnv WHERE pos = length(tok)),
         |s AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id),
         |g AS (SELECT doc_id,
         |  (CASE WHEN u >= 9223372036854775808::HUGEINT
         |        THEN u - 18446744073709551616::HUGEINT ELSE u END)::BIGINT AS sig
         |  FROM (SELECT doc_id, $sigBits AS u FROM s))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 6
         |ORDER BY id_a, id_b""".stripMargin
    },
    "q37_recon_report" ->
      """WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS src_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS src_sum FROM orders),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS tgt_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tgt_sum
        | FROM orders WHERE o_totalprice < 300000),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS missing FROM (
        |  SELECT DISTINCT o_orderkey FROM orders
        |  EXCEPT
        |  SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice < 300000) x),
        |u AS (
        | SELECT 'row_count' AS check_name, src_rows AS src_value, tgt_rows AS tgt_value FROM s, t
        | UNION ALL
        | SELECT 'sum', src_sum, tgt_sum FROM s, t
        | UNION ALL
        | SELECT 'key_integrity', missing, 0.0 FROM m)
        |SELECT check_name, src_value, tgt_value,
        | CASE WHEN src_value = 0.0 THEN CASE WHEN tgt_value = 0.0 THEN 0.0 ELSE 100.0 END
        |      ELSE abs(src_value - tgt_value) / abs(src_value) * 100.0 END AS diff_pct,
        | (CASE WHEN src_value = 0.0 THEN CASE WHEN tgt_value = 0.0 THEN 0.0 ELSE 100.0 END
        |      ELSE abs(src_value - tgt_value) / abs(src_value) * 100.0 END) <= 5.0 AS within_tolerance
        |FROM u ORDER BY check_name""".stripMargin,
    "q42_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |  unnest(range(1, len(toks) + 1, 24)) AS st FROM t)
        |SELECT doc_id,
        | CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
        | array_to_string(toks[st:st+31], ' ') AS chunk_text,
        | CAST(least(len(toks) - st + 1, 32) AS BIGINT) AS n_chunk_tokens
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "q43_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 30
        |ORDER BY doc_id""".stripMargin,
    "q44_seq_packing" ->
      """WITH n AS (SELECT doc_id, doc_id // 100 AS shard,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM n),
        |b AS (SELECT shard, n_tokens, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin FROM c)
        |SELECT CAST(shard AS BIGINT) AS shard, bin, count(*) AS docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | CAST(round(CAST(sum(n_tokens) AS DOUBLE) / 512.0 * 1000000.0) AS BIGINT) AS fill_e6
        |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    "q56_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg,
        |  list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
        | FROM t)
        |SELECT doc_id,
        | CASE WHEN len(toks) < 2 THEN 0
        |  ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE) * 1000000.0) AS BIGINT)
        | END AS dup_2gram_frac_e6,
        | CASE WHEN len(toks) < 3 THEN 0
        |  ELSE CAST(round((1.0 - len(list_distinct(tg))::DOUBLE / len(tg)::DOUBLE) * 1000000.0) AS BIGINT)
        | END AS dup_3gram_frac_e6
        |FROM g ORDER BY doc_id""".stripMargin,
    "q58_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
        |  CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 WHEN 'zh' THEN 20
        |   ELSE 10 END
        |ORDER BY doc_id""".stripMargin,
    "q57_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(toks) >= 3 THEN
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |  ELSE [] END AS grams FROM t),
        |bset AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
        |dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |agg AS (SELECT dg.doc_id, count(*) AS total, count(b.gram) AS matched
        |  FROM dg LEFT JOIN bset b USING (gram) GROUP BY dg.doc_id)
        |SELECT t.doc_id,
        | CAST(coalesce(a.total, 0) AS BIGINT) AS total_grams,
        | CAST(coalesce(a.matched, 0) AS BIGINT) AS matched_grams,
        | CASE WHEN coalesce(a.total, 0) = 0 THEN 0
        |  ELSE CAST(round(a.matched::DOUBLE / a.total::DOUBLE * 1000000.0) AS BIGINT)
        | END AS contamination_e6
        |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q45_near_dedup" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> label)
        |ORDER BY doc_id""".stripMargin,
    "q59_domain_mixing" ->
      """WITH g AS (SELECT source AS domain, count(*) AS docs,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens
        | FROM documents GROUP BY source)
        |SELECT domain, docs, total_tokens,
        | CAST(round(CAST(total_tokens AS DOUBLE) / CAST(docs AS DOUBLE)
        |   * 1000000.0) AS BIGINT) AS tokens_per_doc_e6,
        | CAST(round(CAST(total_tokens AS DOUBLE)
        |   / CAST(sum(total_tokens) OVER () AS DOUBLE) * 1000000.0) AS BIGINT)
        |   AS share_e6
        |FROM g ORDER BY domain""".stripMargin,
    "q60_quality_filter" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM t),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6,
        |  CAST(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS avg_token_len_e6,
        |  CASE WHEN len(toks) < 2 THEN 0
        |   ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE)
        |     * 1000000.0) AS BIGINT)
        |  END AS dup_2gram_frac_e6
        | FROM g)
        |SELECT doc_id, n_tokens, ttr_e6, avg_token_len_e6, dup_2gram_frac_e6,
        | (n_tokens BETWEEN 20 AND 90)
        |  AND (avg_token_len_e6 BETWEEN 3000000 AND 8000000)
        |  AND (ttr_e6 >= 300000) AND (dup_2gram_frac_e6 <= 200000) AS passed,
        | CASE WHEN n_tokens NOT BETWEEN 20 AND 90 THEN 'token_count'
        |  WHEN avg_token_len_e6 NOT BETWEEN 3000000 AND 8000000 THEN 'avg_token_len'
        |  WHEN ttr_e6 < 300000 THEN 'ttr'
        |  WHEN dup_2gram_frac_e6 > 200000 THEN 'dup_2gram'
        |  ELSE '' END AS fail_reason
        |FROM s ORDER BY doc_id""".stripMargin,
    "q61_sessionization" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 1000000.0) AS BIGINT) AS v6 FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us,
        | CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_sec,
        | CAST(sum(v6) AS BIGINT) AS value_sum_e6
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q62_embed_dedup" ->
      """WITH RECURSIVE
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) > 0.4),
        |sym AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM labels WHERE id <> label)
        |ORDER BY vec_id""".stripMargin,
    // q64 replays the LSH path faithfully: hyperplane coef (p,i) = first 4
    // md5 hex digits of "p:i" as an unsigned 16-bit int, mapped to
    // [-0.5, 0.5) — identical to graft.catalyst.HyperPlanes — then sign-bit
    // buckets, within-bucket cosine pairs, and the same recursive closure.
    "q64_embed_dedup_lsh" ->
      """WITH RECURSIVE
        |coefs AS (SELECT p, i,
        |    (('0x' || substr(md5(p || ':' || i), 1, 4))::INT / 65536.0) - 0.5 AS c
        |  FROM range(4) t1(p), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |dots AS (SELECT v.vec_id, coefs.p, sum(v.e[coefs.i + 1] * coefs.c) AS d
        |  FROM v, coefs GROUP BY v.vec_id, coefs.p),
        |buckets AS (SELECT vec_id,
        |    sum(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END) AS bucket
        |  FROM dots GROUP BY vec_id),
        |p AS (SELECT va.vec_id AS id_a, vb.vec_id AS id_b
        |  FROM v va JOIN buckets ba ON va.vec_id = ba.vec_id
        |    JOIN buckets bb ON ba.bucket = bb.bucket
        |    JOIN v vb ON vb.vec_id = bb.vec_id
        |  WHERE va.vec_id < vb.vec_id
        |    AND list_dot_product(va.e, vb.e) /
        |      (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))) > 0.4),
        |sym AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM labels WHERE id <> label)
        |ORDER BY vec_id""".stripMargin,
    "q96_cross_source" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src),
        |rep AS (SELECT labels.label, count(*) AS n_docs,
        |    count(DISTINCT d.source) AS n_sources
        |  FROM labels JOIN documents d ON labels.id = d.doc_id
        |  GROUP BY labels.label)
        |SELECT label, CAST(n_docs AS BIGINT) AS n_docs,
        | CAST(n_sources AS BIGINT) AS n_sources
        |FROM rep WHERE n_sources >= 2 ORDER BY label""".stripMargin,
    "q95_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])
        |  ELSE [] END AS grams FROM t),
        |b AS (SELECT doc_id, unnest(grams) AS bigram FROM g WHERE len(grams) > 0),
        |c12 AS (SELECT bigram, count(*) AS c12,
        |  string_split(bigram, ' ')[1] AS w1 FROM b GROUP BY bigram),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
        |bits AS (SELECT c12.bigram,
        |  CAST(length(bin(c1.c1 // c12.c12)) - 1 AS BIGINT) AS bits
        | FROM c12 JOIN c1 ON c12.w1 = c1.w1),
        |agg AS (SELECT b.doc_id, count(*) AS n_bigrams,
        |    sum(bits.bits) AS surprisal_bits
        |  FROM b JOIN bits ON b.bigram = bits.bigram GROUP BY b.doc_id)
        |SELECT t.doc_id,
        | CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        | CAST(coalesce(agg.surprisal_bits, 0) AS BIGINT) AS surprisal_bits,
        | CAST(CASE WHEN coalesce(agg.n_bigrams, 0) = 0 THEN 0
        |      ELSE agg.surprisal_bits * 1000000 // agg.n_bigrams END AS BIGINT)
        |   AS mean_surprisal_e6
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q100_rrf_fusion" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, nid,
        |  list_dot_product(qv, cv) AS dp,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |cosr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s),
        |dotr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY dp DESC, nid) AS rank FROM s),
        |u AS (SELECT * FROM cosr WHERE rank <= 20
        |  UNION ALL SELECT * FROM dotr WHERE rank <= 20),
        |f AS (SELECT qid AS query_id, nid AS neighbor_id,
        |   sum(1000000 // (60 + rank)) AS rrf_e6, count(*) AS n_lists
        |  FROM u GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, rrf_e6, n_lists,
        |  row_number() OVER (PARTITION BY query_id ORDER BY rrf_e6 DESC, neighbor_id) AS rank
        |  FROM f)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
        | CAST(rrf_e6 AS BIGINT) AS rrf_e6, CAST(n_lists AS BIGINT) AS n_lists
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q110_completeness_matrix" ->
      """WITH e AS (SELECT event_type,
        |  CASE WHEN event_type <> 'error' THEN value END AS value_valid,
        |  CASE WHEN user_id % 7 <> 0 THEN user_id END AS user_ref
        |  FROM events),
        |w AS (SELECT event_type AS group_key, count(*) AS n_rows,
        |  count(value_valid) AS nn_value, count(user_ref) AS nn_user
        |  FROM e GROUP BY event_type),
        |l AS (
        |  SELECT group_key, 'value_valid' AS column_name, n_rows,
        |    n_rows - nn_value AS n_nulls FROM w
        |  UNION ALL
        |  SELECT group_key, 'user_ref', n_rows, n_rows - nn_user FROM w)
        |SELECT group_key, column_name, CAST(n_rows AS BIGINT) AS n_rows,
        | CAST(n_nulls AS BIGINT) AS n_nulls,
        | CAST(n_nulls * 1000000 // n_rows AS BIGINT) AS null_rate_e6
        |FROM l ORDER BY group_key, column_name""".stripMargin,
    "q109_mad_by_group" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_id, e.event_type, e.value,
        |  abs(e.value - med.m) AS absdev
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS d
        |  FROM dev GROUP BY event_type)
        |SELECT dev.event_id, dev.event_type, dev.value,
        | CAST(round(0.6745 * dev.absdev / mad.d * 1000000.0) AS BIGINT) AS robust_z_e6
        |FROM dev JOIN mad USING (event_type)
        |WHERE mad.d > 0 AND 0.6745 * dev.absdev / mad.d > 2.5
        |ORDER BY dev.event_id""".stripMargin,
    "q108_dense_anomaly" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS key, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n_orders
        |  FROM orders WHERE o_orderkey % 50 = 0 GROUP BY 1, 2),
        |span AS (SELECT key, min(day) AS lo, max(day) AS hi FROM daily GROUP BY key),
        |cal AS (SELECT key,
        |  CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |dense AS (SELECT cal.key, cal.day,
        |  last_value(daily.n_orders IGNORE NULLS) OVER (PARTITION BY cal.key
        |    ORDER BY cal.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders
        |  FROM cal LEFT JOIN daily ON cal.key = daily.key AND cal.day = daily.day),
        |win AS (SELECT key, day, n_orders,
        |  count(n_orders) OVER w AS win_n,
        |  sum(n_orders) OVER w AS win_sum,
        |  sum(n_orders * n_orders) OVER w AS win_sumsq
        |  FROM dense
        |  WINDOW w AS (PARTITION BY key ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT key, strftime(day, '%Y-%m-%d') AS day,
        | CAST(n_orders AS BIGINT) AS n_orders,
        | CAST(win_n AS BIGINT) AS win_n, CAST(win_sum AS BIGINT) AS win_sum
        |FROM win
        |WHERE win_n >= 3 AND
        |  (n_orders * win_n - win_sum) * (n_orders * win_n - win_sum) * (win_n - 1)
        |    > 9 * win_n * (win_n * win_sumsq - win_sum * win_sum)
        |ORDER BY key, day""".stripMargin,
    "q107_keep_best_dedup" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src),
        |rk AS (SELECT labels.id, row_number() OVER (PARTITION BY labels.label
        |    ORDER BY d.n_chars DESC, labels.id) AS rk
        |  FROM labels JOIN documents d ON labels.id = d.doc_id)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM rk WHERE rk > 1)
        |ORDER BY doc_id""".stripMargin,
    "q106_matryoshka_recall" ->
      """WITH full_v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |tr AS (SELECT vec_id, (embedding[1:32])::DOUBLE[] AS e FROM embeddings),
        |fs AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |  list_dot_product(q.e, c.e) /
        |    (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM full_v q, full_v c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |ts AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |  list_dot_product(q.e, c.e) /
        |    (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
        |  FROM tr q, tr c WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id),
        |fr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM fs),
        |trr AS (SELECT qid, nid,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM ts),
        |e AS (SELECT qid, nid FROM fr WHERE rank <= 5),
        |a AS (SELECT qid, nid, 1 AS found FROM trr WHERE rank <= 5)
        |SELECT e.qid AS query_id, CAST(count(*) AS BIGINT) AS n_exact,
        | CAST(count(a.found) AS BIGINT) AS n_found,
        | CAST(round(CAST(count(a.found) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |   * 1000000.0) AS BIGINT) AS recall_e6
        |FROM e LEFT JOIN a USING (qid, nid)
        |GROUP BY e.qid ORDER BY query_id""".stripMargin,
    "q105_novelty_curve" ->
      """WITH t AS (SELECT doc_id // 100 AS batch,
        |  string_split(trim(text), ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT batch, unnest(list_transform(list_distinct(
        |  list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)) AS h FROM t),
        |per AS (SELECT batch, count(*) AS n_shingles FROM sh GROUP BY batch),
        |fs AS (SELECT h, min(batch) AS batch FROM sh GROUP BY h),
        |nw AS (SELECT batch, count(*) AS new_shingles FROM fs GROUP BY batch)
        |SELECT per.batch, CAST(per.n_shingles AS BIGINT) AS n_shingles,
        | CAST(coalesce(nw.new_shingles, 0) AS BIGINT) AS new_shingles,
        | CAST(CASE WHEN per.n_shingles = 0 THEN 0
        |   ELSE coalesce(nw.new_shingles, 0) * 1000000 // per.n_shingles END AS BIGINT)
        |  AS novelty_e6
        |FROM per LEFT JOIN nw USING (batch)
        |ORDER BY per.batch""".stripMargin,
    "q104_temperature_mix" ->
      """WITH doms AS (SELECT doc_id,
        |  CASE WHEN source IN ('src0', 'src1') THEN source ELSE 'web' END AS domain
        |  FROM documents),
        |counts AS (SELECT domain, count(*) AS n FROM doms GROUP BY domain),
        |mn AS (SELECT min(n) AS mn FROM counts),
        |rates AS (SELECT domain,
        |  CAST(floor(sqrt(CAST(mn.mn AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS rate_e6
        |  FROM counts, mn)
        |SELECT d.doc_id, d.domain, rates.rate_e6
        |FROM doms d JOIN rates USING (domain)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
        |  < rates.rate_e6
        |ORDER BY d.doc_id""".stripMargin,
    "q102_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql
        |  FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
        |s AS (SELECT qid, nid, ql, cl,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid AND ql <> cl),
        |r AS (SELECT qid, nid, ql, cl, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        |SELECT qid AS query_id, nid AS neighbor_id,
        | CAST(ql AS BIGINT) AS query_label, CAST(cl AS BIGINT) AS neighbor_label,
        | CAST(rank AS BIGINT) AS rank,
        | CAST(round(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q103_knn_label_eval" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS ql
        |  FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
        |s AS (SELECT qid, nid, ql, cl,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |r AS (SELECT qid, ql, cl,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s),
        |v AS (SELECT qid, ql, cl, count(*) AS n_votes
        |  FROM r WHERE rank <= 5 GROUP BY 1, 2, 3),
        |p AS (SELECT qid, ql, cl, n_votes,
        |  row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, cl) AS vr FROM v)
        |SELECT qid AS vec_id, CAST(ql AS BIGINT) AS label,
        | CAST(cl AS BIGINT) AS pred_label, CAST(n_votes AS BIGINT) AS n_votes,
        | (ql = cl) AS correct
        |FROM p WHERE vr = 1 ORDER BY vec_id""".stripMargin,
    "q101_mad_anomalies" ->
      """WITH med AS (SELECT quantile_cont(value, 0.5) AS m FROM events),
        |dev AS (SELECT event_id, value, abs(value - med.m) AS absdev
        |  FROM events, med),
        |mad AS (SELECT quantile_cont(absdev, 0.5) AS d FROM dev)
        |SELECT dev.event_id, dev.value,
        | CAST(round(0.6745 * dev.absdev / mad.d * 1000000.0) AS BIGINT) AS robust_z_e6
        |FROM dev, mad
        |WHERE mad.d > 0 AND 0.6745 * dev.absdev / mad.d > 2.5
        |ORDER BY dev.event_id""".stripMargin,
    // q82: FULL greedy-MMR replay via a recursive CTE — the working table
    // carries one row per query (last pick + the chosen-id list); each
    // iteration scores the remaining pool with the same integer contract
    // as mmrRerank (truncating integer division — Spark `div` / plain Long
    // `/` / DuckDB `//` all truncate toward zero, NOT floorDiv; see the
    // Similarity.mmrRerank contract — over e6-rounded cosines, ties to
    // higher relevance then lower id) and QUALIFY keeps the argmax. All
    // engine-varying float work reduces to the e6 cosine rounding already
    // proven green in q28/q98.
    "q82_mmr_rerank" ->
      """WITH RECURSIVE
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, nid, cv,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |pool AS (SELECT qid, nid, cv, CAST(round(sim * 1000000.0) AS BIGINT) AS rel_e6
        |  FROM s QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) <= 20),
        |pairs AS (SELECT a.qid, a.nid AS i, b.nid AS j,
        |  CAST(round(list_dot_product(a.cv, b.cv) /
        |    (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM pool a JOIN pool b ON a.qid = b.qid AND a.nid <> b.nid),
        |sel AS (
        |  (SELECT qid, nid, CAST(1 AS BIGINT) AS rank,
        |     (500000 * rel_e6) // 1000000 AS mmr_e6, [nid] AS chosen
        |   FROM pool
        |   QUALIFY row_number() OVER (PARTITION BY qid
        |     ORDER BY (500000 * rel_e6) // 1000000 DESC, rel_e6 DESC, nid) = 1)
        |  UNION ALL
        |  (SELECT qid, nid, rank + 1 AS rank, score AS mmr_e6,
        |     list_append(chosen, nid) AS chosen
        |   FROM (
        |     SELECT sel.qid, p.nid, p.rel_e6, sel.rank, sel.chosen,
        |       (500000 * p.rel_e6 - 500000 * (
        |          SELECT max(pr.cos_e6) FROM pairs pr
        |          WHERE pr.qid = p.qid AND pr.i = p.nid
        |            AND list_contains(sel.chosen, pr.j))) // 1000000 AS score
        |     FROM sel JOIN pool p ON p.qid = sel.qid
        |       AND NOT list_contains(sel.chosen, p.nid)
        |     WHERE sel.rank < 5)
        |   QUALIFY row_number() OVER (PARTITION BY qid
        |     ORDER BY score DESC, rel_e6 DESC, nid) = 1))
        |SELECT qid AS query_id, nid AS neighbor_id, rank, mmr_e6
        |FROM sel ORDER BY query_id, rank""".stripMargin,
    "q98_mmr_lambda1" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT qid, nid,
        |  list_dot_product(qv, cv) /
        |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
        |  FROM q, c WHERE qid <> nid),
        |r AS (SELECT qid AS query_id, nid AS neighbor_id,
        |  row_number() OVER (PARTITION BY qid
        |    ORDER BY CAST(round(sim * 1000000.0) AS BIGINT) DESC, nid) AS rank,
        |  sim FROM s)
        |SELECT query_id, neighbor_id, rank,
        | CAST(round(sim * 1000000.0) AS BIGINT) AS mmr_e6
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q41: width/height/n_frames replay the generator's closed-form
    // arithmetic; WAV size = 44-byte canonical header + PCM bytes; MP4
    // size = 244 fixed box bytes + mdat payload whose length replays ONE
    // java.util.Random step (seed scramble ^0x5DEECE66D, one LCG advance,
    // power-of-two nextInt(512) = (512·(seed>>>17))>>31 — exact integer
    // arithmetic via HUGEINT); PNG sizes are deflate-dependent → bounds.
    "q41_media_features" ->
      """WITH g AS (SELECT i,
        |  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  ((xor(i, 25214903917) % 281474976710656) * CAST(25214903917 AS HUGEINT) + 11)
        |    % 281474976710656 AS s1
        |  FROM range(1000) t(i))
        |SELECT i AS media_id, kind,
        | CASE i % 3 WHEN 0 THEN 2 + i % 14
        |   WHEN 1 THEN 8000 ELSE 160 + (i % 8) * 40 END AS width,
        | CASE i % 3 WHEN 0 THEN 2 + i % 9
        |   WHEN 1 THEN 1 + i % 2 ELSE 120 + (i % 6) * 30 END AS height,
        | CASE i % 3 WHEN 0 THEN 1
        |   WHEN 1 THEN 64 + i % 512 ELSE 1 + i % 300 END AS n_frames,
        | CASE i % 3 WHEN 0 THEN NULL
        |   WHEN 1 THEN 44 + (64 + i % 512) * (1 + i % 2) * 2
        |   ELSE 244 + (512 * (CAST(s1 AS BIGINT) // 131072)) // 2147483648
        | END AS size_bytes_exact,
        | TRUE AS size_in_bounds
        |FROM g ORDER BY media_id""".stripMargin,
    "q99_media_meta" ->
      """SELECT i AS media_id,
        | CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CASE i % 3 WHEN 0 THEN 2 + i % 14
        |   WHEN 1 THEN 8000 ELSE 160 + (i % 8) * 40 END AS width,
        | CASE i % 3 WHEN 0 THEN 2 + i % 9
        |   WHEN 1 THEN 1 + i % 2 ELSE 120 + (i % 6) * 30 END AS height,
        | CASE i % 3 WHEN 0 THEN 1
        |   WHEN 1 THEN 64 + i % 512 ELSE 1 + i % 300 END AS n_frames
        |FROM range(1000) t(i) ORDER BY media_id""".stripMargin,
    "q97_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS key, CAST(o_orderdate AS DATE) AS day,
        |         count(*) AS n_orders
        |  FROM orders WHERE o_orderkey % 50 = 0 GROUP BY 1, 2),
        |span AS (SELECT key, min(day) AS lo, max(day) AS hi FROM daily GROUP BY key),
        |cal AS (SELECT key,
        |  CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span)
        |SELECT cal.key, strftime(cal.day, '%Y-%m-%d') AS day,
        |  last_value(daily.n_orders IGNORE NULLS) OVER (PARTITION BY cal.key
        |    ORDER BY cal.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders,
        |  daily.n_orders IS NULL AS is_gap
        |FROM cal LEFT JOIN daily ON cal.key = daily.key AND cal.day = daily.day
        |ORDER BY 1, 2""".stripMargin,
    "q94_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p FROM events),
        |cohort AS (SELECT user_id, min(p) AS cohort_period FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, p FROM e)
        |SELECT cohort.cohort_period, active.p - cohort.cohort_period AS age,
        | CAST(count(DISTINCT active.user_id) AS BIGINT) AS n_users
        |FROM active JOIN cohort ON active.user_id = cohort.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q93_pct_rank" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |q AS (SELECT doc_id,
        |  CAST(len(toks) AS DOUBLE) AS n,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS ttr,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) AS awl
        | FROM t),
        |r AS (SELECT doc_id,
        |  CAST(round((ttr * 0.4 + least(n / 100.0, 1.0) * 0.3 +
        |    greatest(0.0, 1.0 - greatest(0.0, greatest(3.0 - awl, awl - 8.0)) / 5.0) * 0.3)
        |    * 1000000.0) AS BIGINT) AS quality_score_e6
        | FROM q),
        |c AS (SELECT quality_score_e6 AS v, count(*) AS n FROM r GROUP BY 1),
        |cum AS (SELECT v, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ct
        |  FROM c),
        |tot AS (SELECT count(*) AS total FROM r)
        |SELECT r.doc_id, r.quality_score_e6,
        | CAST(cum.ct * 1000000 // tot.total AS BIGINT) AS pct_rank_e6
        |FROM r JOIN cum ON r.quality_score_e6 = cum.v, tot
        |ORDER BY r.doc_id""".stripMargin,
    "q92_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l),
        |p AS (SELECT user_id, session_seq, count(*) AS n_events,
        |  min(CASE WHEN event_type = 'click' THEN ts_us END) AS fe
        | FROM s GROUP BY user_id, session_seq),
        |c AS (SELECT p.user_id, p.session_seq, p.n_events, p.fe,
        |  min(CASE WHEN s.event_type = 'purchase' AND s.ts_us >= p.fe
        |    THEN s.ts_us END) AS fc
        | FROM p LEFT JOIN s ON p.user_id = s.user_id
        |   AND p.session_seq = s.session_seq
        | GROUP BY p.user_id, p.session_seq, p.n_events, p.fe)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, n_events,
        | coalesce(fe, -1) AS first_entry_us,
        | coalesce(fc, -1) AS first_conv_us,
        | fe IS NOT NULL AND fc IS NOT NULL AS converted,
        | coalesce(fc - fe, -1) AS time_to_convert_us
        |FROM c ORDER BY user_id, session_seq""".stripMargin,
    "q91_resample" ->
      """WITH r AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 0 ELSE 100 END AS rate,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        | FROM documents),
        |n AS (SELECT doc_id, source,
        |  rate // 100 + CASE WHEN b < rate % 100 THEN 1 ELSE 0 END AS n_copies
        | FROM r)
        |SELECT doc_id, source, CAST(unnest(range(n_copies)) AS BIGINT) AS copy
        |FROM n WHERE n_copies > 0
        |ORDER BY doc_id, copy""".stripMargin,
    "q90_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 1000000.0) AS BIGINT) AS value_e6 FROM events),
        |p AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'click'),
        |c AS (SELECT event_id, user_id, ts_us, value_e6 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
        |    ORDER BY event_id DESC) AS rn FROM c0) WHERE rn = 1),
        |m AS (SELECT p.event_id, p.user_id, p.ts_us, p.value_e6,
        |  c.event_id AS ce, c.ts_us AS cts, c.value_e6 AS cv
        | FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us)
        |SELECT event_id, user_id, ts_us, value_e6,
        | CASE WHEN ts_us - cts <= 1800000000 THEN ce ELSE -1 END AS click_event_id,
        | CASE WHEN ts_us - cts <= 1800000000 THEN cts ELSE -1 END AS click_ts_us,
        | CASE WHEN ts_us - cts <= 1800000000 THEN cv ELSE 0 END AS click_value_e6,
        | CASE WHEN ts_us - cts <= 1800000000 THEN ts_us - cts ELSE -1 END AS gap_us
        |FROM m ORDER BY event_id""".stripMargin,
    "q63_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 1000000.0) AS BIGINT) AS value_e6 FROM events),
        |p AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'click'),
        |c AS (SELECT event_id, user_id, ts_us, value_e6 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
        |    ORDER BY event_id DESC) AS rn FROM c0) WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value_e6,
        | COALESCE(c.event_id, -1) AS click_event_id,
        | COALESCE(c.ts_us, -1) AS click_ts_us,
        | COALESCE(c.value_e6, 0) AS click_value_e6,
        | COALESCE(p.ts_us - c.ts_us, -1) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.event_id""".stripMargin,
    "q65_asof_strict" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 1000000.0) AS BIGINT) AS value_e6 FROM events),
        |p AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT event_id, user_id, ts_us, value_e6 FROM e
        |  WHERE event_type = 'click'),
        |c AS (SELECT event_id, user_id, ts_us, value_e6 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
        |    ORDER BY event_id DESC) AS rn FROM c0) WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value_e6,
        | COALESCE(c.event_id, -1) AS click_event_id,
        | COALESCE(c.ts_us, -1) AS click_ts_us,
        | COALESCE(c.value_e6, 0) AS click_value_e6,
        | COALESCE(p.ts_us - c.ts_us, -1) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us > c.ts_us
        |ORDER BY p.event_id""".stripMargin,
    "q66_regex_check" ->
      """SELECT
        | count(CASE WHEN c_name IS NOT NULL AND NOT regexp_matches(c_name,
        |   '^Customer#[0-9]+$') THEN 1 END) AS c_name_regex_fail,
        | count(CASE WHEN c_mktsegment IS NOT NULL AND NOT
        |   regexp_matches(c_mktsegment, '^[A-Z]{5,9}$') THEN 1 END) AS c_mktsegment_regex_fail
        |FROM customer""".stripMargin,
    // q39: the LSH pair set itself is deterministic (md5 hyperplanes), so
    // it hash-compares like q64 — bucket equi-join + the same e6-rounded
    // cosine the exact twin (q29) already proves bit-stable cross-engine.
    "q39_lsh_cosine_dupes" ->
      """WITH
        |coefs AS (SELECT p, i,
        |    (('0x' || substr(md5(p || ':' || i), 1, 4))::INT / 65536.0) - 0.5 AS c
        |  FROM range(4) t1(p), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |dots AS (SELECT v.vec_id, coefs.p, sum(v.e[coefs.i + 1] * coefs.c) AS d
        |  FROM v, coefs GROUP BY v.vec_id, coefs.p),
        |buckets AS (SELECT vec_id,
        |    sum(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END) AS bucket
        |  FROM dots GROUP BY vec_id)
        |SELECT va.vec_id AS id_a, vb.vec_id AS id_b,
        |  CAST(round(list_dot_product(va.e, vb.e) /
        |    (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e)))
        |    * 1000000.0) AS BIGINT) AS sim_e6
        |FROM v va JOIN buckets ba ON va.vec_id = ba.vec_id
        |  JOIN buckets bb ON ba.bucket = bb.bucket
        |  JOIN v vb ON vb.vec_id = bb.vec_id
        |WHERE va.vec_id < vb.vec_id
        |  AND list_dot_product(va.e, vb.e) /
        |    (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))) > 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    // q69 replays the seeded-IVF path end-to-end: seed centroids are the 16
    // lowest-id vectors with FLOAT L2-normalization (the REAL casts
    // reproduce Scala's Float division/rounding bit-for-bit), assignment
    // and probing are argmax/top-4 by (-dot, idx), candidates rank by
    // (sim desc, neighbor_id). Dots are sequential double folds on both
    // engines (q28-proven bit-stable).
    // q111: one fixed-point Lloyd iteration (q40's machinery), within-cell
    // pair generation, q45's recursive min-label closure, min-id anti.
    "q111_semantic_dedup" ->
      """WITH RECURSIVE
        |v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS c_idx
        |  FROM v ORDER BY vec_id LIMIT 16),
        |cent0 AS (SELECT c_idx,
        |  CASE WHEN nrm = 0 THEN e
        |       ELSE list_transform(e, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE)) END AS ce
        |  FROM (SELECT c_idx, e,
        |    CAST(CAST(sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE) AS nrm
        |    FROM seed)),
        |assign0 AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, c.ce), c.c_idx) AS rn
        |  FROM v, cent0 c) WHERE rn = 1),
        |sums1 AS (SELECT a.c_idx, t.pos,
        |    sum(CAST(round(v.e[t.pos + 1] * 1000000.0) AS BIGINT)) AS s_e6,
        |    count(*) AS n
        |  FROM v JOIN assign0 a USING (vec_id), range(64) t(pos)
        |  GROUP BY a.c_idx, t.pos),
        |mv1 AS (SELECT c_idx,
        |    list(CAST(s_e6 // n AS DOUBLE) / 1000000.0 ORDER BY pos) AS ml
        |  FROM sums1 GROUP BY c_idx),
        |nm1 AS (SELECT c_idx, ml, sqrt(list_dot_product(ml, ml)) AS nrm FROM mv1),
        |cent1 AS (SELECT c.c_idx,
        |    CASE WHEN n.c_idx IS NULL OR n.nrm = 0 THEN c.ce
        |         ELSE list_transform(n.ml, x -> CAST(CAST(x / n.nrm AS REAL) AS DOUBLE))
        |    END AS ce
        |  FROM cent0 c LEFT JOIN nm1 n ON c.c_idx = n.c_idx),
        |cell AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, c.ce), c.c_idx) AS rn
        |  FROM v, cent1 c) WHERE rn = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM cell ca JOIN cell cb ON ca.c_idx = cb.c_idx
        |    JOIN v a ON a.vec_id = ca.vec_id
        |    JOIN v b ON b.vec_id = cb.vec_id
        |  WHERE a.vec_id < b.vec_id
        |    AND list_dot_product(a.e, a.e) > 0
        |    AND list_dot_product(b.e, b.e) > 0
        |    AND list_dot_product(a.e, b.e) /
        |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        |      > 0.4),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS lbl
        |  FROM reach GROUP BY src)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM labels WHERE id <> lbl)
        |ORDER BY vec_id""".stripMargin,
    // q112: exact KS — counts per distinct value per side, running sums up
    // the merged value axis, D = max |n_b·cum_a − n_a·cum_b| / (n_a·n_b).
    // Every comparison integer; the final division is double over exact
    // integers < 2^53. DuckDB's default RANGE frame ≡ Spark's rows frame
    // here because v is distinct after the GROUP BY.
    "q112_ks_drift" ->
      """WITH a AS (SELECT value AS v, count(*) AS ca FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
        |b AS (SELECT value AS v, count(*) AS cb FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1),
        |m AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
        |    coalesce(cb, 0) AS cb
        |  FROM a FULL OUTER JOIN b ON a.v = b.v),
        |c AS (SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
        |    sum(cb) OVER (ORDER BY v) AS cum_b FROM m),
        |t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM m)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        | CAST(max(abs(n_b * cum_a - n_a * cum_b)) AS BIGINT) AS ks_num,
        | CAST(round(CAST(max(abs(n_b * cum_a - n_a * cum_b)) AS DOUBLE)
        |   / CAST(n_a * n_b AS DOUBLE) * 1000000.0) AS BIGINT) AS ks_e6
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,
    // q113: the least-squares fit from exact BIGINT sufficient statistics;
    // epoch day via integer nanos division (both engines truncate, ts > 0).
    "q113_trend_slopes" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    sum(CAST(round(value * 1000000.0) AS BIGINT)) AS y_e6
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(day) AS sx, sum(y_e6) AS sy,
        |    sum(day * day) AS sxx, sum(day * y_e6) AS sxy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        | CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        | CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        | CASE WHEN n * sxx - sx * sx <> 0
        |   THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |     / CAST(n * sxx - sx * sx AS DOUBLE)
        | END AS slope
        |FROM st ORDER BY event_type""".stripMargin,
    // q114: the exact count hash-compares; the sketch estimate is
    // engine-local (DataSketches HLL), so its invariants — within 5% of
    // exact, and merged-per-day ≡ one-shot — ride as oracle-TRUE booleans
    // (the q41 bounds-check pattern).
    "q114_cardinality_audit" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        | TRUE AS within_tol, TRUE AS merge_exact
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q115: crosstab ≡ 20 conditional sums; absent (lang, source) cells
    // are NULL on both engines (sum over no rows / pivot over no rows).
    "q115_crosstab" ->
      ("SELECT lang,\n" +
        (0 until 20).map(i =>
          s" CAST(sum(CASE WHEN source = 'src$i' THEN 1 END) AS BIGINT)" +
            s" AS src$i").mkString(",\n") +
        "\nFROM documents GROUP BY lang ORDER BY lang"),
    // q116: the full destructive rewrite replayed — 1-based ordinality
    // grouped by (ord-1)//2 reproduces Spark's 0-based slice boundaries;
    // string_agg ORDER BY restores order where Spark array_sorts structs;
    // Spark keys df on md5(seg), the oracle on seg itself (same counts —
    // md5 is collision-free at corpus scale).
    "q116_strip_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN text IS NULL OR length(trim(text)) = 0
        |    THEN CAST([] AS VARCHAR[]) ELSE string_split(trim(text), ' ')
        |    END AS lst FROM documents),
        |s0 AS (
        |  SELECT doc_id, list_transform(range((len(lst) + 1) // 2),
        |    i -> array_to_string(lst[(i*2+1):(i*2+2)], ' ')) AS segs FROM d),
        |segs AS (
        |  SELECT doc_id, generate_subscripts(segs, 1) - 1 AS seg_idx,
        |    unnest(segs) AS seg FROM s0),
        |dfc AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
        |reb AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
        |    count(*) AS n_kept
        |  FROM segs JOIN dfc USING (seg) WHERE df < 25 GROUP BY doc_id),
        |base AS (SELECT doc_id, len(segs) AS n_segments FROM s0)
        |SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
        |  CAST(b.n_segments AS BIGINT) AS n_segments,
        |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(CASE WHEN b.n_segments = 0 THEN 0
        |    ELSE ((b.n_segments - coalesce(r.n_kept, 0)) * 1000000)
        |      // b.n_segments END AS BIGINT) AS boiler_frac_e6
        |FROM base b LEFT JOIN reb r USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // q117: counts/summary/top-k replay; ASC NULLS FIRST matches Spark's
    // asc null ordering (user_id has no nulls, but the contract is
    // explicit); user_id is unique so the rank order is total.
    "q117_key_skew" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |summ AS (
        |  SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS max_cnt
        |  FROM counts),
        |top AS (
        |  SELECT user_id, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, user_id ASC NULLS FIRST) AS rnk
        |  FROM counts ORDER BY cnt DESC, user_id ASC NULLS FIRST LIMIT 20)
        |SELECT t.user_id, CAST(t.rnk AS BIGINT) AS rnk,
        |  CAST(t.cnt AS BIGINT) AS cnt,
        |  CAST((t.cnt * 1000000) // s.n_rows AS BIGINT) AS share_e6,
        |  CAST(s.n_rows AS BIGINT) AS n_rows,
        |  CAST(s.n_keys AS BIGINT) AS n_keys,
        |  CAST((s.max_cnt * s.n_keys * 1000000) // s.n_rows AS BIGINT)
        |    AS skew_ratio_e6,
        |  CAST((s.max_cnt + 499) // 500 AS BIGINT) AS salt_factor
        |FROM top t, summ s ORDER BY rnk""".stripMargin,
    // q118: per-(label, side, dim) e6-BIGINT sums (exact, commutative —
    // the q40 fixed-point contract), then cosine/norms fold the exact
    // integer sums as doubles in index order (list_dot_product ≡ the
    // Spark sequential fold). REAL→DOUBLE cast before rounding matches
    // Spark's float→double widening.
    "q118_centroid_drift" ->
      """WITH v AS (SELECT vec_id, label, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |ex AS (
        |  SELECT label, vec_id % 2 AS side,
        |    generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS x FROM v),
        |sums AS (
        |  SELECT label, side, pos,
        |    sum(CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
        |    count(*) AS n
        |  FROM ex GROUP BY 1, 2, 3),
        |a AS (SELECT label, pos, s AS s_a, n AS n_a FROM sums WHERE side = 0),
        |b AS (SELECT label, pos, s AS s_b, n AS n_b FROM sums WHERE side = 1),
        |j AS (SELECT coalesce(a.label, b.label) AS label,
        |    coalesce(a.pos, b.pos) AS pos,
        |    coalesce(s_a, 0) AS s_a, coalesce(s_b, 0) AS s_b,
        |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        |  FROM a FULL OUTER JOIN b ON a.label = b.label AND a.pos = b.pos),
        |g AS (SELECT label, max(n_a) AS n_a, max(n_b) AS n_b,
        |    list(CAST(s_a AS DOUBLE) ORDER BY pos) AS va,
        |    list(CAST(s_b AS DOUBLE) ORDER BY pos) AS vb
        |  FROM j GROUP BY 1)
        |SELECT label, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CASE WHEN sqrt(list_dot_product(va, va)) = 0
        |      OR sqrt(list_dot_product(vb, vb)) = 0 THEN NULL
        |    ELSE CAST(round(list_dot_product(va, vb)
        |      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
        |      * 1000000.0) AS BIGINT) END AS cos_e6,
        |  CASE WHEN sqrt(list_dot_product(va, va)) = 0
        |      OR sqrt(list_dot_product(vb, vb)) = 0 THEN NULL
        |    ELSE CAST(round(sqrt(list_dot_product(va, va)) * n_b
        |      / (sqrt(list_dot_product(vb, vb)) * n_a)
        |      * 1000000.0) AS BIGINT) END AS norm_ratio_e6
        |FROM g ORDER BY label""".stripMargin,
    // q119: first-activity attribution (min day per user) then one
    // summary-space running sum — per-day new users partition the user
    // set, so the cumsum is the exact cumulative distinct count.
    "q119_distinct_growth" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_ns(ts) // 86400000000000) AS period
        |  FROM events GROUP BY user_id),
        |per AS (SELECT period, count(*) AS new_entities FROM f GROUP BY 1)
        |SELECT period, CAST(new_entities AS BIGINT) AS new_entities,
        |  CAST(sum(new_entities) OVER (ORDER BY period
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_entities
        |FROM per ORDER BY period""".stripMargin,
    // q120: the CUSUM argmax replayed over the q113 daily series — all
    // statistics exact integers (row_number / running sum / group total),
    // the deviation |n·cum − t·total| identical BIGINT math on both
    // engines; argmax tie breaks on the earliest day.
    "q120_changepoints" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    sum(CAST(round(value * 1000000.0) AS BIGINT)) AS y_e6
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t_index,
        |    sum(y_e6) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS cum_before,
        |    count(*) OVER (PARTITION BY event_type) AS n_points,
        |    sum(y_e6) OVER (PARTITION BY event_type) AS total
        |  FROM daily),
        |d AS (SELECT *,
        |    abs(n_points * cum_before - t_index * total) AS d_stat,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n_points * cum_before - t_index * total) DESC,
        |        day) AS r
        |  FROM w)
        |SELECT event_type, day AS change_point,
        |  CAST(t_index AS BIGINT) AS t_index,
        |  CAST(n_points AS BIGINT) AS n_points,
        |  CAST(cum_before AS BIGINT) AS cum_before,
        |  CAST(total AS BIGINT) AS total, CAST(d_stat AS BIGINT) AS d_stat
        |FROM d WHERE r = 1 ORDER BY event_type""".stripMargin,
    // q121: the salted-md5 draw replayed — 'sample:' || doc_id is exactly
    // Spark's concat_ws(":", salt, key); md5 hex is lowercase on both
    // engines, so the (hash, key) sort order is identical.
    "q121_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, lang,
        |    md5('sample:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |r AS (SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source ORDER BY hx, doc_id)
        |      AS sample_rank
        |  FROM h)
        |SELECT doc_id, source, lang, CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM r WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin,
    // q123: exact heavy-hitter replay; est_exact is the oracle-TRUE
    // invariant (no-purge mode), the q114 bounds pattern.
    "q123_heavy_hitters" ->
      """WITH c AS (SELECT event_type, user_id AS item, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, item, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt DESC, item) AS rnk
        |  FROM c)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, item,
        |  CAST(cnt AS BIGINT) AS cnt, TRUE AS est_exact
        |FROM r WHERE rnk <= 10 ORDER BY event_type, rnk""".stripMargin,
    // q124: the magic-mask spread cascade replayed step for step — all
    // BIGINT &/|/<< arithmetic, so zkey/cell/minmax are bit-identical.
    // both engines FAIL loudly past 2^16 keys (Spark raise_errors in
    // zorderKey2's guard; error() here) instead of the mask cascade
    // silently truncating on one side only — r12 review
    "q124_zorder_layout" ->
      """WITH b AS (SELECT
        |    CASE WHEN l_partkey < 0 OR l_partkey >= 65536
        |      THEN error('zorder input out of [0, 65536): ' || l_partkey)
        |      ELSE CAST(l_partkey AS BIGINT) END AS x,
        |    CASE WHEN l_suppkey < 0 OR l_suppkey >= 65536
        |      THEN error('zorder input out of [0, 65536): ' || l_suppkey)
        |      ELSE CAST(l_suppkey AS BIGINT) END AS y FROM lineitem),
        |s1 AS (SELECT x, y,
        |  (x | (x << 16)) & 281470681808895 AS xs,
        |  (y | (y << 16)) & 281470681808895 AS ys FROM b),
        |s2 AS (SELECT x, y,
        |  (xs | (xs << 8)) & 71777214294589695 AS xs,
        |  (ys | (ys << 8)) & 71777214294589695 AS ys FROM s1),
        |s3 AS (SELECT x, y,
        |  (xs | (xs << 4)) & 1085102592571150095 AS xs,
        |  (ys | (ys << 4)) & 1085102592571150095 AS ys FROM s2),
        |s4 AS (SELECT x, y,
        |  (xs | (xs << 2)) & 3689348814741910323 AS xs,
        |  (ys | (ys << 2)) & 3689348814741910323 AS ys FROM s3),
        |s5 AS (SELECT x, y,
        |  (xs | (xs << 1)) & 6148914691236517205 AS xs,
        |  (ys | (ys << 1)) & 6148914691236517205 AS ys FROM s4),
        |z AS (SELECT x, y, xs | (ys << 1) AS zkey FROM s5)
        |SELECT zkey >> 16 AS cell, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
        |  CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max,
        |  CAST(min(zkey) AS BIGINT) AS z_min, CAST(max(zkey) AS BIGINT) AS z_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    // q125: q122's lexical CTEs (k=20) + q100's cosine/fusion CTEs on the
    // matching %97 query sets; the double cosine compares identically
    // (list_dot_product ≡ the Spark fold), rrf points are integer floor
    // divisions.
    "q125_hybrid_retrieval" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
        |  HAVING count(*) * 1000000 <=
        |    780000 * (SELECT count(*) FROM documents)),
        |qt AS (SELECT doc_id AS qid,
        |    unnest(list_distinct(string_split(trim(text), ' '))) AS term
        |  FROM documents WHERE doc_id % 97 = 0),
        |lexh AS (
        |  SELECT qt.qid, tf.doc_id AS nid,
        |    sum(tf.tf * 1000000000 // d.df) AS score
        |  FROM tf JOIN dfreq d USING (term) JOIN qt USING (term)
        |  WHERE qt.qid <> tf.doc_id GROUP BY 1, 2),
        |lexr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, nid) AS rank FROM lexh),
        |qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |cv AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS v FROM embeddings),
        |sem AS (SELECT qid, nid,
        |  list_dot_product(qv.v, cv.v) /
        |    (sqrt(list_dot_product(qv.v, qv.v)) *
        |     sqrt(list_dot_product(cv.v, cv.v))) AS sim
        |  FROM qv, cv WHERE qid <> nid),
        |semr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, nid) AS rank FROM sem),
        |u AS (SELECT qid, nid, rank FROM lexr WHERE rank <= 20
        |  UNION ALL SELECT qid, nid, rank FROM semr WHERE rank <= 20),
        |f AS (SELECT qid AS query_id, nid AS neighbor_id,
        |    sum(1000000 // (60 + rank)) AS rrf_e6, count(*) AS n_lists
        |  FROM u GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, rrf_e6, n_lists,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_e6 DESC, neighbor_id) AS rank FROM f)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(neighbor_id AS BIGINT) AS neighbor_id,
        |  CAST(rank AS BIGINT) AS rank, CAST(rrf_e6 AS BIGINT) AS rrf_e6,
        |  CAST(n_lists AS BIGINT) AS n_lists
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q126: bigrams via 1-based list slots; marginals/total reduce from
    // the bigram counts; lift divides two exact BIGINT products as
    // doubles — identical on both engines; ties rank by (x, y).
    "q126_collocations" ->
      """WITH d AS (SELECT string_split(trim(text), ' ') AS lst
        |  FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
        |big AS (SELECT u.x AS x, u.y AS y FROM (
        |  SELECT unnest(list_transform(range(len(lst) - 1),
        |    i -> struct_pack(x := lst[i + 1], y := lst[i + 2]))) AS u
        |  FROM d) t),
        |bi AS (SELECT x, y, count(*) AS c_xy FROM big GROUP BY 1, 2),
        |cx AS (SELECT x, sum(c_xy) AS c_x FROM bi GROUP BY 1),
        |cy AS (SELECT y, sum(c_xy) AS c_y FROM bi GROUP BY 1),
        |tot AS (SELECT sum(c_xy) AS n_bigrams FROM bi),
        |j AS (SELECT bi.x, bi.y, c_xy, c_x, c_y, n_bigrams,
        |    c_xy * n_bigrams AS lift_num, c_x * c_y AS lift_den,
        |    CAST(c_xy * n_bigrams AS DOUBLE) / CAST(c_x * c_y AS DOUBLE)
        |      AS lift
        |  FROM bi JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot
        |  WHERE c_xy >= 5),
        |r AS (SELECT *, row_number() OVER (ORDER BY lift DESC, x, y) AS rnk
        |  FROM j)
        |SELECT CAST(rnk AS BIGINT) AS rnk, x, y,
        |  CAST(c_xy AS BIGINT) AS c_xy, CAST(c_x AS BIGINT) AS c_x,
        |  CAST(c_y AS BIGINT) AS c_y, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(lift_num AS BIGINT) AS lift_num,
        |  CAST(lift_den AS BIGINT) AS lift_den, lift
        |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    // q127: md5('epoch:1:' || id) replays concat_ws exactly; shard from
    // the q72 first-8-hex bucket idiom; position ordered by (hash, id).
    "q127_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id, lang,
        |    md5('epoch:1:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |s AS (SELECT doc_id, lang, hx,
        |    ('0x' || substr(hx, 1, 8))::BIGINT % 8 AS shard
        |  FROM h)
        |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
        |    AS BIGINT) AS position
        |FROM s ORDER BY shard, position""".stripMargin,
    // q128: q48's BPE regex summed per language; ratios are exact-long
    // floor divisions.
    "q128_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, length(text) AS n_chars,
        |  len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
        |    AS n_bpe,
        |  len(string_split(trim(text), ' ')) AS n_ws
        |  FROM documents),
        |g AS (SELECT lang, count(*) AS n_docs, sum(n_chars) AS n_chars,
        |    sum(n_bpe) AS n_bpe_tokens, sum(n_ws) AS n_ws_tokens
        |  FROM t GROUP BY lang)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
        |  CAST(n_ws_tokens AS BIGINT) AS n_ws_tokens,
        |  CAST(CASE WHEN n_bpe_tokens = 0 THEN NULL
        |    ELSE n_chars * 1000000 // n_bpe_tokens END AS BIGINT)
        |    AS chars_per_bpe_e6,
        |  CAST(CASE WHEN n_ws_tokens = 0 THEN NULL
        |    ELSE n_bpe_tokens * 1000000 // n_ws_tokens END AS BIGINT)
        |    AS bpe_per_ws_e6
        |FROM g ORDER BY lang""".stripMargin,
    // q129: the synthesized children + prefix-join replay; the md5 bucket
    // is pure pruning, so the oracle joins on the RAW 32-char prefix
    // (same pairs — md5 is collision-free at corpus scale, q116 note).
    "q129_truncation_dedup" ->
      """WITH kids AS (SELECT doc_id + 1000000 AS doc_id,
        |    substr(text, 1, 97) AS text
        |  FROM documents WHERE doc_id % 10 = 0 AND length(text) > 97),
        |c AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM kids),
        |f AS (SELECT doc_id, text, length(text) AS len FROM c
        |  WHERE text IS NOT NULL AND length(text) >= 32)
        |SELECT CAST(a.doc_id AS BIGINT) AS child_id,
        |  CAST(b.doc_id AS BIGINT) AS parent_id,
        |  CAST(a.len AS BIGINT) AS child_len,
        |  CAST(b.len AS BIGINT) AS parent_len
        |FROM f a JOIN f b ON substr(a.text, 1, 32) = substr(b.text, 1, 32)
        |  AND a.len < b.len AND substr(b.text, 1, a.len) = a.text
        |ORDER BY child_id, parent_id""".stripMargin,
    // q130: the ±2 position-pair explode replayed with range() (exclusive
    // end ≡ sequence()'s inclusive end + 1); both directions of each
    // cooccurrence count, positions i = j excluded.
    "q130_skipgrams" ->
      """WITH d AS (SELECT string_split(trim(text), ' ') AS lst
        |  FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
        |p AS (SELECT u.center AS center, u.context AS context FROM (
        |  SELECT unnest(flatten(list_transform(range(len(lst)), i ->
        |    list_transform(range(greatest(0, i - 2), least(len(lst), i + 3)),
        |      j -> struct_pack(center := lst[i + 1], context := lst[j + 1],
        |        ci := i, cj := j))))) AS u
        |  FROM d) t WHERE u.ci <> u.cj)
        |SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY center, context""".stripMargin,
    // q133: lag over (ts_us, event_id) — the q70 total-order contract —
    // with the start pseudo-state coalesced identically.
    "q133_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |l AS (SELECT coalesce(lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id), '^') AS from_type,
        |  event_type AS to_type FROM e),
        |m AS (SELECT from_type, to_type, count(*) AS n FROM l GROUP BY 1, 2),
        |t AS (SELECT from_type, to_type, n,
        |  sum(n) OVER (PARTITION BY from_type) AS row_total FROM m)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(row_total AS BIGINT) AS row_total,
        |  CAST(n * 1000000 // row_total AS BIGINT) AS p_e6
        |FROM t ORDER BY from_type, to_type""".stripMargin,
    // q137: the q121 draw with a (user_id, day) composite stratum.
    "q137_contributor_cap" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    md5('sample:' || CAST(event_id AS VARCHAR)) AS hx
        |  FROM events),
        |r AS (SELECT event_id, user_id, day, event_type,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY hx, event_id) AS sample_rank
        |  FROM e)
        |SELECT event_id, user_id, day, event_type,
        |  CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM r WHERE sample_rank <= 3
        |ORDER BY user_id, day, sample_rank""".stripMargin,
    // q136: the q60 signal/rule CTEs rolled up as conditional sums per
    // source (the q115 crosstab-replay pattern; absent cells null).
    "q136_gate_crosstab" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |  list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM t),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_e6,
        |  CAST(round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(len(toks) AS DOUBLE) * 1000000.0) AS BIGINT) AS avg_token_len_e6,
        |  CASE WHEN len(toks) < 2 THEN 0
        |   ELSE CAST(round((1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE)
        |     * 1000000.0) AS BIGINT)
        |  END AS dup_2gram_frac_e6
        | FROM g),
        |r AS (SELECT doc_id,
        |  CASE WHEN n_tokens NOT BETWEEN 20 AND 90 THEN 'token_count'
        |   WHEN avg_token_len_e6 NOT BETWEEN 3000000 AND 8000000 THEN 'avg_token_len'
        |   WHEN ttr_e6 < 300000 THEN 'ttr'
        |   WHEN dup_2gram_frac_e6 > 200000 THEN 'dup_2gram'
        |   ELSE 'passed' END AS rule
        | FROM s),
        |j AS (SELECT d.source, r.rule FROM r JOIN documents d USING (doc_id))
        |SELECT source,
        | CAST(sum(CASE WHEN rule = 'passed' THEN 1 END) AS BIGINT) AS passed,
        | CAST(sum(CASE WHEN rule = 'token_count' THEN 1 END) AS BIGINT) AS token_count,
        | CAST(sum(CASE WHEN rule = 'avg_token_len' THEN 1 END) AS BIGINT) AS avg_token_len,
        | CAST(sum(CASE WHEN rule = 'ttr' THEN 1 END) AS BIGINT) AS ttr,
        | CAST(sum(CASE WHEN rule = 'dup_2gram' THEN 1 END) AS BIGINT) AS dup_2gram
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // q135: the q125 ranking CTEs with an overlap tail instead of the
    // fusion tail; inner join on query ids present in both modalities.
    "q135_modality_agreement" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
        |  HAVING count(*) * 1000000 <=
        |    780000 * (SELECT count(*) FROM documents)),
        |qt AS (SELECT doc_id AS qid,
        |    unnest(list_distinct(string_split(trim(text), ' '))) AS term
        |  FROM documents WHERE doc_id % 97 = 0),
        |lexh AS (
        |  SELECT qt.qid, tf.doc_id AS nid,
        |    sum(tf.tf * 1000000000 // d.df) AS score
        |  FROM tf JOIN dfreq d USING (term) JOIN qt USING (term)
        |  WHERE qt.qid <> tf.doc_id GROUP BY 1, 2),
        |lexr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, nid) AS rank FROM lexh),
        |qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |cv AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS v FROM embeddings),
        |sem AS (SELECT qid, nid,
        |  list_dot_product(qv.v, cv.v) /
        |    (sqrt(list_dot_product(qv.v, qv.v)) *
        |     sqrt(list_dot_product(cv.v, cv.v))) AS sim
        |  FROM qv, cv WHERE qid <> nid),
        |semr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, nid) AS rank FROM sem),
        |la AS (SELECT qid, nid FROM lexr WHERE rank <= 20),
        |sa AS (SELECT qid, nid FROM semr WHERE rank <= 20),
        |na AS (SELECT qid, count(*) AS n_a FROM la GROUP BY qid),
        |nb AS (SELECT qid, count(*) AS n_b FROM sa GROUP BY qid),
        |ov AS (SELECT la.qid, count(*) AS n_overlap
        |  FROM la JOIN sa ON la.qid = sa.qid AND la.nid = sa.nid
        |  GROUP BY la.qid)
        |SELECT CAST(na.qid AS BIGINT) AS query_id,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(n_overlap, 0) * 1000000
        |    // (n_a + n_b - coalesce(n_overlap, 0)) AS BIGINT) AS jaccard_e6
        |FROM na JOIN nb USING (qid) LEFT JOIN ov USING (qid)
        |ORDER BY query_id""".stripMargin,
    // q134: the q24 fingerprint with a global min-id survivor join,
    // rolled up per source.
    "q134_dedup_impact" ->
      """WITH f AS (SELECT source, doc_id, md5(lower(trim(text))) AS fp
        |  FROM documents),
        |k AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY fp),
        |j AS (SELECT f.source, f.doc_id, f.fp,
        |  f.doc_id <> k.keep_id AS removed FROM f JOIN k USING (fp))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
        |  CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS dup_rate_e6
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // q132: the incremental (merged-per-batch) path must equal the
    // one-shot scan exactly — the oracle IS the one-shot replay.
    "q132_vocab_incremental" ->
      """WITH tf AS (SELECT term, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY term),
        |spec AS (SELECT cnt, count(*) AS n_terms FROM tf GROUP BY cnt),
        |summ AS (SELECT sum(cnt) AS n_tokens, count(*) AS v_size,
        |    sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax FROM tf)
        |SELECT CAST(cnt AS BIGINT) AS cnt, CAST(n_terms AS BIGINT) AS n_terms,
        |  CAST(n_terms * 1000000 // v_size AS BIGINT) AS vocab_share_e6,
        |  CAST(cnt * n_terms * 1000000 // n_tokens AS BIGINT) AS token_share_e6,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(v_size AS BIGINT) AS v_size,
        |  CAST(n_hapax AS BIGINT) AS n_hapax,
        |  CAST(n_hapax * 1000000 // n_tokens AS BIGINT) AS missing_mass_e6
        |FROM spec, summ ORDER BY cnt""".stripMargin,
    // q131: term counts → frequency-of-frequencies + one global summary;
    // all counts and floor-division shares exact.
    "q131_vocab_spectrum" ->
      """WITH tf AS (SELECT term, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY term),
        |spec AS (SELECT cnt, count(*) AS n_terms FROM tf GROUP BY cnt),
        |summ AS (SELECT sum(cnt) AS n_tokens, count(*) AS v_size,
        |    sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax FROM tf)
        |SELECT CAST(cnt AS BIGINT) AS cnt, CAST(n_terms AS BIGINT) AS n_terms,
        |  CAST(n_terms * 1000000 // v_size AS BIGINT) AS vocab_share_e6,
        |  CAST(cnt * n_terms * 1000000 // n_tokens AS BIGINT) AS token_share_e6,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(v_size AS BIGINT) AS v_size,
        |  CAST(n_hapax AS BIGINT) AS n_hapax,
        |  CAST(n_hapax * 1000000 // n_tokens AS BIGINT) AS missing_mass_e6
        |FROM spec, summ ORDER BY cnt""".stripMargin,
    // q122: the q51 tf/df machinery plus a query-term probe — scores are
    // sums of exact integer floor divisions (tf·10⁹ // df), the rank
    // order total on (score DESC, doc_id). df > 200 terms never score.
    "q122_keyword_search" ->
      """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents) t GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
        |  HAVING count(*) * 1000000 <=
        |    780000 * (SELECT count(*) FROM documents)),
        |q AS (SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split(trim(text), ' '))) AS term
        |  FROM documents WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT q.query_id, tf.doc_id,
        |    sum(tf.tf * 1000000000 // d.df) AS score,
        |    count(*) AS n_terms_hit
        |  FROM tf JOIN dfreq d USING (term) JOIN q USING (term)
        |  WHERE q.query_id <> tf.doc_id
        |  GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score, n_terms_hit,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rank
        |  FROM hits)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(doc_id AS BIGINT) AS neighbor_id,
        |  CAST(rank AS BIGINT) AS rank, CAST(score AS BIGINT) AS score,
        |  CAST(n_terms_hit AS BIGINT) AS n_terms_hit
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // q40: the TRAINED-IVF path fully replayed — both fixed-point Lloyd
    // iterations unroll as SQL (seed-normalize with REAL casts → argmax
    // assignment → e6-BIGINT component sums → floor-division means →
    // renormalize, twice), then q69's assignment/probe/rank machinery on
    // the trained centroids. Integer bucket sums are what make this
    // possible: they commute, so Spark's partitioned aggregation and
    // DuckDB's serial sum land on identical bits. range(64) = the
    // generator's embedding dim (fixed, like q99's range(1000)).
    "q40_ivf_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS c_idx
        |  FROM v ORDER BY vec_id LIMIT 16),
        |cent0 AS (SELECT c_idx,
        |  CASE WHEN nrm = 0 THEN e
        |       ELSE list_transform(e, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE)) END AS ce
        |  FROM (SELECT c_idx, e,
        |    CAST(CAST(sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE) AS nrm
        |    FROM seed)),
        |assign0 AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, c.ce), c.c_idx) AS rn
        |  FROM v, cent0 c) WHERE rn = 1),
        |sums1 AS (SELECT a.c_idx, t.pos,
        |    sum(CAST(round(v.e[t.pos + 1] * 1000000.0) AS BIGINT)) AS s_e6,
        |    count(*) AS n
        |  FROM v JOIN assign0 a USING (vec_id), range(64) t(pos)
        |  GROUP BY a.c_idx, t.pos),
        |mv1 AS (SELECT c_idx,
        |    list(CAST(s_e6 // n AS DOUBLE) / 1000000.0 ORDER BY pos) AS ml
        |  FROM sums1 GROUP BY c_idx),
        |nm1 AS (SELECT c_idx, ml, sqrt(list_dot_product(ml, ml)) AS nrm FROM mv1),
        |cent1 AS (SELECT c.c_idx,
        |    CASE WHEN n.c_idx IS NULL OR n.nrm = 0 THEN c.ce
        |         ELSE list_transform(n.ml, x -> CAST(CAST(x / n.nrm AS REAL) AS DOUBLE))
        |    END AS ce
        |  FROM cent0 c LEFT JOIN nm1 n ON c.c_idx = n.c_idx),
        |assign1 AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, c.ce), c.c_idx) AS rn
        |  FROM v, cent1 c) WHERE rn = 1),
        |sums2 AS (SELECT a.c_idx, t.pos,
        |    sum(CAST(round(v.e[t.pos + 1] * 1000000.0) AS BIGINT)) AS s_e6,
        |    count(*) AS n
        |  FROM v JOIN assign1 a USING (vec_id), range(64) t(pos)
        |  GROUP BY a.c_idx, t.pos),
        |mv2 AS (SELECT c_idx,
        |    list(CAST(s_e6 // n AS DOUBLE) / 1000000.0 ORDER BY pos) AS ml
        |  FROM sums2 GROUP BY c_idx),
        |nm2 AS (SELECT c_idx, ml, sqrt(list_dot_product(ml, ml)) AS nrm FROM mv2),
        |cent2 AS (SELECT c.c_idx,
        |    CASE WHEN n.c_idx IS NULL OR n.nrm = 0 THEN c.ce
        |         ELSE list_transform(n.ml, x -> CAST(CAST(x / n.nrm AS REAL) AS DOUBLE))
        |    END AS ce
        |  FROM cent1 c LEFT JOIN nm2 n ON c.c_idx = n.c_idx),
        |assignF AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, c.ce), c.c_idx) AS rn
        |  FROM v, cent2 c) WHERE rn = 1),
        |q AS (SELECT vec_id, e FROM v WHERE vec_id < 20),
        |probe AS (SELECT vec_id, c_idx FROM (
        |  SELECT q.vec_id, c.c_idx,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY -list_dot_product(q.e, c.ce), c.c_idx) AS rn
        |  FROM q, cent2 c) WHERE rn <= 4),
        |cand AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    list_dot_product(q.e, v.e) /
        |      (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(v.e, v.e))) AS sim
        |  FROM q JOIN probe ON q.vec_id = probe.vec_id
        |    JOIN assignF ON assignF.c_idx = probe.c_idx
        |    JOIN v ON v.vec_id = assignF.vec_id
        |  WHERE q.vec_id <> v.vec_id)
        |SELECT query_id, neighbor_id,
        |  CAST(rank AS BIGINT) AS rank,
        |  CAST(round(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM cand)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q69_ivf_seeded" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS c_idx
        |  FROM v ORDER BY vec_id LIMIT 16),
        |cent AS (SELECT c_idx,
        |  CASE WHEN nrm = 0 THEN e
        |       ELSE list_transform(e, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE)) END AS ce
        |  FROM (SELECT c_idx, e,
        |    CAST(CAST(sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE) AS nrm
        |    FROM seed)),
        |assign AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, cent.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, cent.ce), cent.c_idx) AS rn
        |  FROM v, cent) WHERE rn = 1),
        |q AS (SELECT vec_id, e FROM v WHERE vec_id < 20),
        |probe AS (SELECT vec_id, c_idx FROM (
        |  SELECT q.vec_id, cent.c_idx,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY -list_dot_product(q.e, cent.ce), cent.c_idx) AS rn
        |  FROM q, cent) WHERE rn <= 4),
        |cand AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
        |    list_dot_product(q.e, v.e) /
        |      (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(v.e, v.e))) AS sim
        |  FROM q JOIN probe ON q.vec_id = probe.vec_id
        |    JOIN assign ON assign.c_idx = probe.c_idx
        |    JOIN v ON v.vec_id = assign.vec_id
        |  WHERE q.vec_id <> v.vec_id)
        |SELECT query_id, neighbor_id,
        |  CAST(rank AS BIGINT) AS rank,
        |  CAST(round(sim * 1000000.0) AS BIGINT) AS sim_e6
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS rank FROM cand)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q68_interval_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l),
        |sess AS (SELECT min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, session_seq),
        |p AS (SELECT event_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.ts_us,
        |  CAST(count(sess.start_us) AS BIGINT) AS n_active
        |FROM p LEFT JOIN sess
        |  ON p.ts_us BETWEEN sess.start_us AND sess.end_us
        |GROUP BY p.event_id, p.ts_us
        |ORDER BY p.event_id""".stripMargin,
    "q75_incremental_dedup" ->
      """WITH c AS (SELECT md5(lower(trim(text))) AS fp FROM documents
        |  WHERE doc_id % 2 = 0),
        |n AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
        |  WHERE doc_id % 2 = 1)
        |SELECT doc_id FROM n WHERE fp NOT IN (SELECT fp FROM c)
        |ORDER BY doc_id""".stripMargin,
    // q81's oracle runs the NAIVE single-window form of the budget cut (the
    // engine decomposes it; the semantics are the global cumsum).
    "q81_token_budget" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id,
        |  CAST(len(toks) AS DOUBLE) AS n,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) AS u,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sl
        | FROM t),
        |q AS (SELECT doc_id, n, u / n AS ttr, sl / n AS awl,
        |  least(n / 100.0, 1.0) AS lensat FROM p),
        |r AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(round((ttr * 0.4 + lensat * 0.3 +
        |    greatest(0.0, 1.0 - greatest(0.0, greatest(3.0 - awl, awl - 8.0)) / 5.0) * 0.3)
        |    * 1000000.0) AS BIGINT) AS quality_score_e6
        | FROM q),
        |c AS (SELECT doc_id, n_tokens, quality_score_e6,
        |  sum(n_tokens) OVER (ORDER BY quality_score_e6 DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum_tokens
        | FROM r)
        |SELECT doc_id, n_tokens, quality_score_e6,
        | CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 10000
        |ORDER BY doc_id""".stripMargin,
    "q80_boilerplate" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(string_split(trim(text),' ')) - 3),
        |  i -> string_split(trim(text),' ')[i] || ' ' ||
        |       string_split(trim(text),' ')[i+1] || ' ' ||
        |       string_split(trim(text),' ')[i+2] || ' ' ||
        |       string_split(trim(text),' ')[i+3] || ' ' ||
        |       string_split(trim(text),' ')[i+4])) AS sh FROM documents),
        |h AS (SELECT doc_id,
        |  list_transform(sh, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs
        | FROM t),
        |ex AS (SELECT doc_id, unnest(hs) AS hh FROM h),
        |dfreq AS (SELECT hh, count(*) AS df FROM ex GROUP BY hh),
        |shared AS (SELECT ex.doc_id,
        |    count(CASE WHEN dfreq.df >= 2 THEN 1 END) AS n_shared
        |  FROM ex JOIN dfreq USING (hh) GROUP BY ex.doc_id)
        |SELECT h.doc_id, CAST(len(h.hs) AS BIGINT) AS n_shingles,
        | CAST(coalesce(shared.n_shared, 0) AS BIGINT) AS n_shared,
        | CASE WHEN len(h.hs) = 0 THEN 0
        |      ELSE CAST(coalesce(shared.n_shared, 0) * 1000000 // len(h.hs)
        |        AS BIGINT) END AS shared_frac_e6
        |FROM h LEFT JOIN shared ON h.doc_id = shared.doc_id
        |ORDER BY h.doc_id""".stripMargin,
    // q78/q79 replay the PQ path: seed centroids are the 16 lowest-id
    // vectors' 16-dim slices; distances are the same left-assoc double
    // x·x − 2x·c + c·c; per-subspace errors round to micro-units BEFORE
    // summing, so totals are integer sums (order-free across engines).
    "q78_pq_encode" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS j
        |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
        |cb AS (SELECT t.s, seed.j, seed.e[t.s*16+1 : t.s*16+16] AS c
        |  FROM seed, range(4) t(s)),
        |xs AS (SELECT v.vec_id, t.s, v.e[t.s*16+1 : t.s*16+16] AS x
        |  FROM v, range(4) t(s)),
        |scored AS (SELECT xs.vec_id, xs.s, cb.j,
        |    list_dot_product(xs.x, xs.x) - 2.0*list_dot_product(xs.x, cb.c)
        |      + list_dot_product(cb.c, cb.c) AS d2
        |  FROM xs JOIN cb ON xs.s = cb.s),
        |best AS (SELECT vec_id, s, j, d2,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
        |  FROM scored),
        |b AS (SELECT vec_id, s, j, CAST(round(d2 * 1000000.0) AS BIGINT) AS e6
        |  FROM best WHERE rn = 1)
        |SELECT vec_id,
        | CAST(max(CASE WHEN s = 0 THEN j END) AS BIGINT) AS code0,
        | CAST(max(CASE WHEN s = 1 THEN j END) AS BIGINT) AS code1,
        | CAST(max(CASE WHEN s = 2 THEN j END) AS BIGINT) AS code2,
        | CAST(max(CASE WHEN s = 3 THEN j END) AS BIGINT) AS code3,
        | CAST(sum(e6) AS BIGINT) AS err_e6
        |FROM b GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q79_pq_adc_topk" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS j
        |  FROM (SELECT * FROM v ORDER BY vec_id LIMIT 16)),
        |cb AS (SELECT t.s, seed.j, seed.e[t.s*16+1 : t.s*16+16] AS c
        |  FROM seed, range(4) t(s)),
        |xs AS (SELECT v.vec_id, t.s, v.e[t.s*16+1 : t.s*16+16] AS x
        |  FROM v, range(4) t(s)),
        |scored AS (SELECT xs.vec_id, xs.s, cb.j,
        |    list_dot_product(xs.x, xs.x) - 2.0*list_dot_product(xs.x, cb.c)
        |      + list_dot_product(cb.c, cb.c) AS d2
        |  FROM xs JOIN cb ON xs.s = cb.s),
        |codes AS (SELECT vec_id, s, j FROM (SELECT vec_id, s, j,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
        |  FROM scored) WHERE rn = 1),
        |qtab AS (SELECT vec_id AS query_id, s, j,
        |    CAST(round(d2 * 1000000.0) AS BIGINT) AS d_e6
        |  FROM scored WHERE vec_id < 20),
        |adc AS (SELECT qtab.query_id, codes.vec_id AS neighbor_id,
        |    CAST(sum(qtab.d_e6) AS BIGINT) AS adc_e6
        |  FROM codes JOIN qtab ON codes.s = qtab.s AND codes.j = qtab.j
        |  WHERE qtab.query_id <> codes.vec_id
        |  GROUP BY qtab.query_id, codes.vec_id)
        |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_e6
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_e6, neighbor_id) AS rank FROM adc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q77_pii_redact" ->
      """SELECT c_custkey,
        | regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g') AS c_name,
        | regexp_replace(c_mktsegment,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g')
        |   AS c_mktsegment,
        | CAST(len(regexp_extract_all(c_name, '[0-9]{4,}'))
        |   + len(regexp_extract_all(c_mktsegment,
        |       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |   AS n_redactions
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // q76 replays the fuzzy incremental dedup: q27's signature/band CTEs on
    // the full corpus, candidates restricted to odd(arrival)×even(corpus),
    // each verified by exact jaccard on the 32-bit shingle-hash sets.
    "q76_fuzzy_incremental" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(string_split(trim(text),' ')) - 1),
        |  i -> string_split(trim(text),' ')[i] || ' ' ||
        |       string_split(trim(text),' ')[i+1] || ' ' ||
        |       string_split(trim(text),' ')[i+2])) AS sh FROM documents),
        |h AS (SELECT doc_id,
        |  list_transform(sh, s -> ('0x' || substr(md5(s),1,8))::BIGINT) AS hs
        | FROM t WHERE len(sh) > 0),
        |sig AS (SELECT doc_id,
        | list_min(list_transform(hs, x -> (1000000007 * x + 0) % 4294967311)) AS m0,
        | list_min(list_transform(hs, x -> (998244353 * x + 1) % 4294967311)) AS m1,
        | list_min(list_transform(hs, x -> (754974721 * x + 2) % 4294967311)) AS m2,
        | list_min(list_transform(hs, x -> (167772161 * x + 3) % 4294967311)) AS m3,
        | list_min(list_transform(hs, x -> (469762049 * x + 4) % 4294967311)) AS m4,
        | list_min(list_transform(hs, x -> (595591169 * x + 5) % 4294967311)) AS m5,
        | list_min(list_transform(hs, x -> (645922817 * x + 6) % 4294967311)) AS m6,
        | list_min(list_transform(hs, x -> (897581057 * x + 7) % 4294967311)) AS m7
        | FROM h),
        |bands AS (
        | SELECT doc_id, 0 AS bi, md5(m0 || '|' || m1) AS bk FROM sig
        | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig),
        |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands n JOIN bands c ON n.bi = c.bi AND n.bk = c.bk
        |  WHERE n.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
        |dropped AS (SELECT DISTINCT cand.new_id FROM cand
        |  JOIN h hn ON hn.doc_id = cand.new_id
        |  JOIN h hc ON hc.doc_id = cand.corpus_id
        |  WHERE len(list_intersect(hn.hs, hc.hs))::DOUBLE /
        |    (len(hn.hs) + len(hc.hs) - len(list_intersect(hn.hs, hc.hs)))::DOUBLE
        |    > 0.5)
        |SELECT doc_id FROM documents WHERE doc_id % 2 = 1
        |  AND doc_id NOT IN (SELECT new_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    "q74_embed_outliers" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |seed AS (SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS c_idx
        |  FROM v ORDER BY vec_id LIMIT 16),
        |cent AS (SELECT c_idx,
        |  CASE WHEN nrm = 0 THEN e
        |       ELSE list_transform(e, x -> CAST(CAST(x / nrm AS REAL) AS DOUBLE)) END AS ce
        |  FROM (SELECT c_idx, e,
        |    CAST(CAST(sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE) AS nrm
        |    FROM seed)),
        |assign AS (SELECT vec_id, c_idx FROM (
        |  SELECT v.vec_id, cent.c_idx,
        |    row_number() OVER (PARTITION BY v.vec_id
        |      ORDER BY -list_dot_product(v.e, cent.ce), cent.c_idx) AS rn
        |  FROM v, cent) WHERE rn = 1)
        |SELECT v.vec_id, assign.c_idx AS bucket,
        |  CAST(round(list_dot_product(v.e, cent.ce) /
        |    (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cent.ce, cent.ce)))
        |    * 1000000.0) AS BIGINT) AS centroid_cos_e6,
        |  CAST(round(list_dot_product(v.e, cent.ce) /
        |    (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(cent.ce, cent.ce)))
        |    * 1000000.0) AS BIGINT) < 200000 AS is_outlier
        |FROM v
        |  JOIN assign ON v.vec_id = assign.vec_id
        |  JOIN cent ON cent.c_idx = assign.c_idx
        |ORDER BY v.vec_id""".stripMargin,
    "q73_surprisal" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |f AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM f),
        |s AS (SELECT t.doc_id,
        |    CAST(length(bin(n.n_total // f.cnt)) - 1 AS BIGINT) AS bits
        |  FROM t JOIN f USING (term), n)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        | (CAST(sum(bits) AS BIGINT) * 1000000) // count(*) AS mean_surprisal_e6
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q71_winsorize" ->
      """WITH b AS (SELECT event_type,
        |  quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        | CAST(round(e.value * 1000000.0) AS BIGINT) AS value_e6,
        | CAST(round(least(greatest(e.value, b.lo), b.hi) * 1000000.0) AS BIGINT)
        |   AS wins_e6
        |FROM events e JOIN b USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "q72_hash_split" ->
      """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        | count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |  FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q70_session_overlap" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l),
        |sess AS (SELECT user_id, session_seq, min(ts_us) AS start_us,
        |  max(ts_us) AS end_us FROM s GROUP BY user_id, session_seq)
        |SELECT a.user_id, count(*) AS n_overlaps
        |FROM sess a JOIN sess b
        |  ON a.start_us <= b.end_us AND b.start_us <= a.end_us
        |  AND (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
        |GROUP BY a.user_id
        |ORDER BY a.user_id""".stripMargin,
    // q138: q70's sessions, but the pair set bounded by the two knobs —
    // overlap >= 1h (the WHERE replays minOverlap) and top-3 per session
    // (row_number over overlap DESC with the same deterministic tiebreak).
    "q138_session_overlap_topk" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev_us IS NULL
        |    OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_seq FROM l),
        |sess AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  min(ts_us) AS start_us,
        |  max(ts_us) AS end_us FROM s GROUP BY user_id, session_seq),
        |pairs AS (SELECT a.user_id, a.session_seq,
        |  b.user_id AS b_user, b.session_seq AS b_seq,
        |  least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us)
        |    AS overlap_us
        |FROM sess a JOIN sess b
        |  ON a.start_us <= b.end_us AND b.start_us <= a.end_us
        |  AND (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
        |WHERE least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us)
        |  >= 3600000000),
        |ranked AS (SELECT *, row_number() OVER
        |  (PARTITION BY user_id, session_seq
        |   ORDER BY overlap_us DESC, b_user, b_seq) AS rn FROM pairs)
        |SELECT user_id, session_seq, CAST(rn AS BIGINT) AS rank,
        | b_user, b_seq, overlap_us
        |FROM ranked WHERE rn <= 3
        |ORDER BY user_id, session_seq, rank""".stripMargin,
    // q139: positional 5-gram 60-bit hashes → global copy counts with the
    // keep-first (min doc, pos) survivor exempt → covered positions →
    // gaps-and-islands merged runs, per doc.
    "q139_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text),' ') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(range(1, len(toks) - 5 + 2)) AS pos,
        |  toks FROM t WHERE len(toks) >= 5),
        |occ AS (SELECT doc_id, pos,
        |  ('0x' || substr(md5(array_to_string(toks[pos:pos+4], ' ')), 1, 15))
        |    ::BIGINT AS gram FROM g),
        |w AS (SELECT doc_id, pos,
        |  count(*) OVER (PARTITION BY gram) AS copies,
        |  row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |  FROM occ),
        |flagged AS (SELECT doc_id, pos FROM w
        |  WHERE copies BETWEEN 2 AND 50 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, pos + u AS mpos
        |  FROM flagged, (SELECT unnest(range(0, 5)) AS u) s),
        |isl AS (SELECT doc_id, mpos,
        |  mpos - row_number() OVER (PARTITION BY doc_id ORDER BY mpos) AS grp
        |  FROM cov),
        |pd AS (SELECT doc_id, count(*) AS n_masked,
        |  count(DISTINCT grp) AS n_spans FROM isl GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        | CAST(coalesce(pd.n_masked, 0) AS BIGINT) AS n_masked,
        | CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans
        |FROM t LEFT JOIN pd ON t.doc_id = pd.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // q140: recursive-CTE transitive closure of the binary dependency
    // tree + upstream/downstream rollups per node.
    "q140_lineage_closure" ->
      """WITH RECURSIVE
        |e AS (SELECT CAST(p_partkey // 2 AS BIGINT) AS src,
        |  CAST(p_partkey AS BIGINT) AS dst FROM part WHERE p_partkey >= 1),
        |r AS (SELECT dst AS node, src AS up FROM e
        |  UNION
        |  SELECT r.node, e.src FROM r JOIN e ON r.up = e.dst),
        |u AS (SELECT node, count(*) AS n_upstream FROM r GROUP BY node),
        |d AS (SELECT up AS node, count(*) AS n_downstream FROM r GROUP BY up)
        |SELECT CAST(p.p_partkey AS BIGINT) AS node,
        | CAST(coalesce(u.n_upstream, 0) AS BIGINT) AS n_upstream,
        | CAST(coalesce(d.n_downstream, 0) AS BIGINT) AS n_downstream
        |FROM part p LEFT JOIN u ON p.p_partkey = u.node
        |  LEFT JOIN d ON p.p_partkey = d.node
        |ORDER BY node""".stripMargin,
    // q141: full-outer join on the key + null-safe column compare
    // (IS DISTINCT FROM), unchanged rows filtered out.
    "q141_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |nxt AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |j AS (
        |  SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    p.o_orderkey IS NOT NULL AS in_prev,
        |    n.o_orderkey IS NOT NULL AS in_next,
        |    (p.o_totalprice IS DISTINCT FROM n.o_totalprice) AS d_price,
        |    (p.o_orderstatus IS DISTINCT FROM n.o_orderstatus) AS d_status
        |  FROM prev p FULL OUTER JOIN nxt n ON p.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT in_prev THEN 'added'
        |       WHEN NOT in_next THEN 'removed'
        |       WHEN d_price OR d_status THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  CASE WHEN in_prev AND in_next
        |       THEN CAST(d_price AS BIGINT) + CAST(d_status AS BIGINT)
        |       ELSE 0 END AS n_changed,
        |  CASE WHEN in_prev AND in_next THEN concat_ws(',',
        |      CASE WHEN d_price THEN 'o_totalprice' END,
        |      CASE WHEN d_status THEN 'o_orderstatus' END)
        |       ELSE '' END AS changed_cols
        |FROM j
        |WHERE NOT (in_prev AND in_next AND NOT d_price AND NOT d_status)
        |ORDER BY o_orderkey""".stripMargin,
    // q142: canonical normalization replayed (RE2 '[^a-z0-9]+' agrees with
    // Java regex on this ASCII class) + md5 group-by.
    "q142_canonical_dedup" ->
      """WITH variants AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |    '  ' || upper(replace(text, ' ', '   ')) || ' !!' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM variants),
        |canon AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |    AS fingerprint
        |  FROM corpus)
        |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS copies
        |FROM canon GROUP BY fingerprint HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,
    // q143: q45's recursive label-propagation closure + the shared md5
    // percent-bucket split on coalesce(cluster label, own id).
    "q143_leakage_split" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src),
        |keyed AS (SELECT d.doc_id,
        |  ('0x' || substr(md5(CAST(coalesce(l.label, d.doc_id) AS VARCHAR)),
        |    1, 8))::BIGINT % 100 AS b
        |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id)
        |SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM keyed ORDER BY doc_id""".stripMargin,
    // q144: md5-uniform + one IEEE division — bit-identical across engines.
    "q144_weighted_sample" ->
      """WITH p AS (SELECT doc_id, n_chars,
        |  ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |     + 0.5) / CAST(n_chars AS DOUBLE)) AS pr
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(row_number() OVER (ORDER BY pr, doc_id) AS BIGINT)
        |    AS sample_rank
        |FROM p ORDER BY pr, doc_id LIMIT 50""".stripMargin,
    // q145: q45's capped jaccard pair generation + the md5 bucket map,
    // pairs normalized lo/hi before grouping.
    "q145_leakage_audit" ->
      """WITH
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sp AS (SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      AS b FROM documents))
        |SELECT least(a.split, b.split) AS split_lo,
        |  greatest(a.split, b.split) AS split_hi,
        |  count(*) AS n_pairs
        |FROM pairs JOIN sp a ON id_a = a.doc_id JOIN sp b ON id_b = b.doc_id
        |GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin,
    // q146: the UNsalted join — green proves the salted plan is exactly
    // semantics-preserving.
    "q146_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q148: the oracle is the NEXT snapshot itself — diff→apply must
    // reconstruct it row-for-row.
    "q148_changeset_apply" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey % 11 = 0 THEN 'X'
        |       ELSE o_orderstatus END AS o_orderstatus
        |FROM orders WHERE o_orderkey % 5 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    // q149: gaps-and-islands replay — running max over the preceding
    // frame, island ids by prefix sum, two keyed aggregates.
    "q149_interval_union" ->
      """WITH iv AS (SELECT user_id, epoch_ns(ts) // 1000 AS s_us,
        |  epoch_ns(ts) // 1000 + 3600000000 AS e_us FROM events),
        |m AS (SELECT user_id, s_us, e_us,
        |  max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |f AS (SELECT user_id, s_us, e_us,
        |  CASE WHEN prev_max IS NULL OR s_us > prev_max THEN 1
        |       ELSE 0 END AS ni FROM m),
        |g AS (SELECT user_id, s_us, e_us,
        |  sum(ni) OVER (PARTITION BY user_id ORDER BY s_us, e_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |i AS (SELECT user_id, island, min(s_us) AS s, max(e_us) AS e
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(e - s) AS BIGINT) AS covered_us
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q150: distinct → basket-size cap → within-basket self-join → count.
    "q150_basket_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS basket,
        |  l_partkey AS item FROM lineitem),
        |sized AS (SELECT basket FROM items GROUP BY basket
        |  HAVING count(*) <= 20),
        |kept AS (SELECT i.* FROM items i JOIN sized USING (basket)),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |  count(*) AS n_baskets
        |  FROM kept a JOIN kept b USING (basket)
        |  WHERE a.item < b.item GROUP BY 1, 2)
        |SELECT item_a, item_b, n_baskets FROM p WHERE n_baskets >= 2
        |ORDER BY item_a, item_b""".stripMargin,
    // q151: the q44 packing replay rolled up per bin then per shard.
    "q151_packing_efficiency" ->
      """WITH n AS (SELECT doc_id, doc_id // 100 AS shard,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM n),
        |b AS (SELECT shard, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS bin FROM c),
        |pb AS (SELECT shard, bin, count(*) AS bdocs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |  FROM b GROUP BY shard, bin)
        |SELECT CAST(shard AS BIGINT) AS shard,
        | count(*) AS n_bins,
        | CAST(sum(bdocs) AS BIGINT) AS docs,
        | CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
        | CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
        | CAST(sum(bin_tokens) * 1000000 // (count(*) * 512) AS BIGINT)
        |   AS fill_e6
        |FROM pb GROUP BY shard ORDER BY shard""".stripMargin,
    // q153: per-unit min/max stats + disjoint-range skip flags, both
    // layouts, rolled to one row each.
    "q153_skipping_report" ->
      """WITH ev AS (SELECT user_id,
        |  epoch_ns(ts) // 86400000000000 AS day FROM events),
        |t AS (SELECT day AS unit, count(*) AS n_rows,
        |  min(user_id) AS vmin, max(user_id) AS vmax FROM ev GROUP BY day),
        |u AS (SELECT user_id // 10 AS unit, count(*) AS n_rows,
        |  min(user_id) AS vmin, max(user_id) AS vmax FROM ev GROUP BY 1),
        |rt AS (SELECT 'time' AS layout, CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(sum(CASE WHEN vmax < 10 OR vmin > 19 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS skipped_units,
        |  CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |  CAST(sum(CASE WHEN vmax < 10 OR vmin > 19 THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS skipped_rows FROM t),
        |ru AS (SELECT 'user_bucket' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_units,
        |  CAST(sum(CASE WHEN vmax < 10 OR vmin > 19 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS skipped_units,
        |  CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |  CAST(sum(CASE WHEN vmax < 10 OR vmin > 19 THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS skipped_rows FROM u)
        |SELECT layout, n_units, skipped_units, total_rows, skipped_rows,
        |  skipped_rows * 1000000 // total_rows AS skip_e6
        |FROM (SELECT * FROM rt UNION ALL SELECT * FROM ru)
        |ORDER BY layout""".stripMargin,
    // q152: the q45 closure's component labels → size histogram.
    "q152_cluster_sizes" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a),
        |labels AS (SELECT src AS id, least(src, min(dst)) AS label
        |  FROM reach GROUP BY src),
        |csz AS (SELECT label, count(*) AS cluster_size FROM labels GROUP BY label)
        |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        |  count(*) AS n_clusters
        |FROM csz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    // q154/q159: GROUPING() bitmask — SQL-standard encoding (leftmost dim
    // = MSB), identical in Spark's grouping_id() and DuckDB's GROUPING().
    "q154_rollup_mart" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin,
    // q155: quadratic NOT-EXISTS dominance — the semantic spec the
    // staircase plan must reproduce exactly.
    "q155_pareto_docs" ->
      """WITH p AS (SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT)
        |    AS n_uniq
        |  FROM documents)
        |SELECT n_tokens, n_uniq, doc_id FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.n_tokens >= p.n_tokens AND q.n_uniq >= p.n_uniq
        |    AND (q.n_tokens > p.n_tokens OR q.n_uniq > p.n_uniq))
        |ORDER BY doc_id""".stripMargin,
    // q156: the full-rebuild view — green proves the incremental
    // anti-join+append maintenance reconstructs it exactly.
    "q156_view_refresh" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
        | o_orderdate, o_orderpriority, c_mktsegment, c_nationkey
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // q157: the full quadratic edit-distance join — green proves the
    // deletion-neighborhood blocking loses no pair.
    "q157_fuzzy_names" ->
      """SELECT CAST(a.c_custkey AS BIGINT) AS id_a,
        | CAST(b.c_custkey AS BIGINT) AS id_b,
        | levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // q158: ntile on the same totalized order; e6 before min/max/sum on
    // both engines so every output is an exact integer.
    "q158_decile_profile" ->
      """WITH t AS (SELECT value,
        |  CAST(ntile(10) OVER (ORDER BY value, event_id) AS BIGINT) AS bucket
        |  FROM events)
        |SELECT bucket, count(*) AS n_rows,
        | min(CAST(round(value * 1000000.0) AS BIGINT)) AS min_e6,
        | max(CAST(round(value * 1000000.0) AS BIGINT)) AS max_e6,
        | CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_e6
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q159_cube_mart" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, year(o_orderdate))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_year NULLS FIRST"""
        .stripMargin,
    // q160: the epoch-aligned hop grid as integer floor division — starts
    // s ≡ 0 (mod slide) with s ≤ t < s + size.
    "q160_hopping_windows" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT event_type, value, unnest(range(
        |    ((t - 3600000000) // 1800000000 + 1) * 1800000000,
        |    (t // 1800000000) * 1800000000 + 1,
        |    1800000000)) AS window_start_us FROM e)
        |SELECT window_start_us, event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
        |   AS sum_e6
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q161: q150's edge build (minCount 2), then the quadratic closing
    // join the oriented wedge plan must reproduce.
    "q161_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS basket,
        |  l_partkey AS item FROM lineitem),
        |sized AS (SELECT basket FROM items GROUP BY basket
        |  HAVING count(*) <= 20),
        |kept AS (SELECT i.* FROM items i JOIN sized USING (basket)),
        |p AS (SELECT a.item AS a, b.item AS b, count(*) AS n
        |  FROM kept a JOIN kept b USING (basket)
        |  WHERE a.item < b.item GROUP BY 1, 2),
        |e AS (SELECT a, b FROM p WHERE n >= 2),
        |tri AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
        |  FROM e ab JOIN e bc ON ab.b = bc.a
        |  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
        |m AS (SELECT x AS node FROM tri UNION ALL
        |  SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, count(*) AS n_triangles
        |FROM m GROUP BY node ORDER BY node""".stripMargin,
    // q162: same exact-integer sufficient stats (x recentered at the
    // group's min day, y in e2 units), same IEEE double dag.
    "q162_trend_fit" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS y_e2
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |x0 AS (SELECT event_type, min(day) AS x0 FROM daily GROUP BY 1),
        |st AS (SELECT d.event_type, count(*) AS n,
        |    CAST(sum(day - x0) AS BIGINT) AS sx,
        |    CAST(sum(y_e2) AS BIGINT) AS sy,
        |    CAST(sum((day - x0) * (day - x0)) AS BIGINT) AS sxx,
        |    CAST(sum(y_e2 * y_e2) AS BIGINT) AS syy,
        |    CAST(sum((day - x0) * y_e2) AS BIGINT) AS sxy
        |  FROM daily d JOIN x0 USING (event_type) GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        | CASE WHEN n * sxx - sx * sx <> 0 THEN
        |   CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        | END AS slope,
        | CASE WHEN n * sxx - sx * sx <> 0 THEN
        |   CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        | END AS intercept,
        | CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0 THEN
        |   (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
        |   / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
        | END AS r2
        |FROM st ORDER BY event_type""".stripMargin,
    // q163: the same ×7 (user, day)-space explode; range() is
    // exclusive-end ≡ Spark's inclusive sequence(d, d+6).
    "q163_rolling_active" ->
      """WITH active AS (SELECT DISTINCT user_id AS e,
        |  epoch_ns(ts) // 86400000000000 AS d FROM events),
        |daily AS (SELECT d AS day, count(*) AS dau FROM active GROUP BY 1),
        |w AS (SELECT e, unnest(range(d, d + 7)) AS day FROM active),
        |wa AS (SELECT day, count(DISTINCT e) AS wau FROM w GROUP BY 1)
        |SELECT day, dau, wau, dau * 1000000 // wau AS stickiness_e6
        |FROM wa JOIN daily USING (day) ORDER BY day""".stripMargin,
    // q167: rank-window replay — only VALUES are compared, so boundary
    // ties are engine-order-independent.
    "q167_native_topk" ->
      """WITH v AS (SELECT event_type,
        |  CAST(round(value * 1000000.0) AS BIGINT) AS value_e6,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY CAST(round(value * 1000000.0) AS BIGINT) DESC) AS rank
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(rank AS BIGINT) AS rank, value_e6
        |FROM v WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    // q165: the FULL closure over all pairs (q143's machinery) — the
    // incremental star-forest fold must reproduce it exactly.
    "q165_incremental_clusters" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(trim(text),' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(list_distinct(list_transform(
        |  range(1, len(toks) - 1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])),
        |  s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS shingle FROM t),
        |sizes AS (SELECT doc_id, count(*) AS ss FROM sh GROUP BY doc_id),
        |capped AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN capped USING (shingle)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.ss + sb.ss - inter AS DOUBLE) > 0.5),
        |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT id_a, id_b FROM sym
        |  UNION
        |  SELECT r.src, s.id_b FROM reach r JOIN sym s ON r.dst = s.id_a)
        |SELECT src AS id, least(src, min(dst)) AS label
        |FROM reach GROUP BY src ORDER BY id""".stripMargin,
    // q168: the same one-window SCD2 derivation.
    "q168_scd2_history" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        | epoch_us(ts) AS valid_from_us,
        | lead(epoch_us(ts)) OVER w AS valid_to_us,
        | CAST(row_number() OVER w AS BIGINT) AS version,
        | lead(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, version""".stripMargin,
    // q169: null-aware distinct-rhs count per lhs tuple.
    "q169_fd_violations" ->
      """SELECT o_custkey,
        | CAST(count(DISTINCT o_orderpriority)
        |   + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_rhs_values,
        | count(*) AS n_rows
        |FROM orders GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderpriority)
        |   + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) > 1
        |ORDER BY o_custkey""".stripMargin,
    // q170: integer-string digit extraction + literal Benford shares +
    // the identical IEEE chi-square dag.
    "q170_benford" ->
      """WITH v AS (SELECT CAST(substr(CAST(abs(CAST(round(o_totalprice * 100.0)
        |    AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |    AND CAST(round(o_totalprice * 100.0) AS BIGINT) <> 0),
        |c AS (SELECT digit, count(*) AS n_obs FROM v GROUP BY 1),
        |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS nn FROM c),
        |pt(digit, p) AS (VALUES
        |  (1, 0.3010299956639812), (2, 0.17609125905568124),
        |  (3, 0.12493873660829993), (4, 0.09691001300805642),
        |  (5, 0.07918124604762482), (6, 0.06694678963061322),
        |  (7, 0.05799194697768673), (8, 0.05115252244738129),
        |  (9, 0.04575749056067514))
        |SELECT c.digit, n_obs, n_obs * 1000000 // nn AS obs_share_e6,
        | CAST(round(p * 1000000.0) AS BIGINT) AS benford_share_e6,
        | CAST(round(1000000.0
        |   * (CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) * p)
        |   * (CAST(n_obs AS DOUBLE) - CAST(nn AS DOUBLE) * p)
        |   / (CAST(nn AS DOUBLE) * p)) AS BIGINT) AS chi2_e6
        |FROM c JOIN pt USING (digit), n ORDER BY digit""".stripMargin,
    // q166: the quadratic probe×dim cross join the blocking must match.
    "q166_fuzzy_link" ->
      """WITH probes AS (SELECT c_custkey AS p_id,
        |  CASE WHEN c_custkey % 2 = 0 THEN substr(c_name, 2)
        |       ELSE substr(c_name, 1, length(c_name) - 1) END AS p_name
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT CAST(p.p_id AS BIGINT) AS left_id,
        | CAST(c.c_custkey AS BIGINT) AS right_id,
        | levenshtein(p.p_name, c.c_name) AS dist
        |FROM probes p JOIN customer c
        |  ON levenshtein(p.p_name, c.c_name) <= 1
        |ORDER BY left_id, right_id""".stripMargin,
    // q164: q155's dominance oracle with the stratum in the correlation.
    "q164_domain_pareto" ->
      """WITH p AS (SELECT doc_id, source,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT)
        |    AS n_uniq
        |  FROM documents)
        |SELECT source, n_tokens, n_uniq, doc_id FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.source = p.source
        |    AND q.n_tokens >= p.n_tokens AND q.n_uniq >= p.n_uniq
        |    AND (q.n_tokens > p.n_tokens OR q.n_uniq > p.n_uniq))
        |ORDER BY doc_id""".stripMargin,
    // q147: exact per-domain bigram counts + rank window, same tiebreak.
    "q147_domain_ngrams" ->
      """WITH t AS (SELECT source AS domain,
        |  string_split(trim(text), ' ') AS toks FROM documents),
        |g AS (SELECT domain, unnest(list_transform(range(1, len(toks)),
        |  i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT domain, gram, count(*) AS n_occurrences
        |  FROM g GROUP BY domain, gram),
        |r AS (SELECT domain, gram, n_occurrences,
        |  CAST(row_number() OVER (PARTITION BY domain
        |    ORDER BY n_occurrences DESC, gram ASC) AS BIGINT) AS rank
        |  FROM c)
        |SELECT domain, gram, n_occurrences, rank FROM r
        |WHERE rank <= 5 ORDER BY domain, rank""".stripMargin,
    "q67_lsh_recall" ->
      """WITH
        |coefs AS (SELECT p, i,
        |    (('0x' || substr(md5(p || ':' || i), 1, 4))::INT / 65536.0) - 0.5 AS c
        |  FROM range(4) t1(p), range(64) t2(i)),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |dots AS (SELECT v.vec_id, coefs.p, sum(v.e[coefs.i + 1] * coefs.c) AS d
        |  FROM v, coefs GROUP BY v.vec_id, coefs.p),
        |buckets AS (SELECT vec_id,
        |    sum(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END) AS bucket
        |  FROM dots GROUP BY vec_id),
        |exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) > 0.4),
        |approx AS (SELECT e.id_a, e.id_b FROM exact e
        |  JOIN buckets ba ON e.id_a = ba.vec_id
        |  JOIN buckets bb ON e.id_b = bb.vec_id AND ba.bucket = bb.bucket)
        |SELECT count(*) AS n_exact,
        | (SELECT count(*) FROM approx) AS n_found,
        | CASE WHEN count(*) = 0 THEN -1
        |      ELSE CAST(round((SELECT count(*) FROM approx)::DOUBLE
        |        / count(*)::DOUBLE * 1000000.0) AS BIGINT) END AS recall_e6
        |FROM exact""".stripMargin)
}

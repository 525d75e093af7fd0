package graft.streaming

import graft.SparkSpec
import graft.config.{DedupeSpec, DerivedColumn, SilverSpec}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("silver stream processes arriving files incrementally with stateful dedup") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val chk = Files.createTempDirectory("graft_stream_chk").toString

    val batch1 = Seq((1L, 10.0), (2L, 0.0), (3L, 30.0)).toDF("id", "fare")
    batch1.write.mode("append").parquet(in)
    val schema = batch1.schema

    val q = Streaming.silverStream(spark, in, schema,
      SilverSpec(
        derived = Seq(DerivedColumn("fare2", "fare * 2")),
        filters = Seq("fare > 0"),
        dedupe = Some(DedupeSpec(Seq("id"), Nil))),
      out, chk)
    try {
      q.processAllAvailable()
      spark.read.parquet(out).count() shouldBe 2 // id 2 filtered

      // second micro-batch: one new id, one duplicate of id 1 → state dedups
      Seq((1L, 99.0), (4L, 40.0)).toDF("id", "fare").write.mode("append").parquet(in)
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
      rows.count() shouldBe 3 // id 1 seen already, only id 4 appended
      rows.columns should contain("fare2")
    } finally q.stop()
  }

  test("curation stream gates, dedups by content across batches, and mixes") {
    import graft.config.{CurationSpec, MixingSpec, NearDedupSpec, QualityGateSpec}
    val in = Files.createTempDirectory("graft_cur_in").toString
    val out = Files.createTempDirectory("graft_cur_out").toString
    val chk = Files.createTempDirectory("graft_cur_chk").toString
    val spec = CurationSpec(
      gate = Some(QualityGateSpec("doc_id", "text", minTokens = 3L,
        maxTokens = 100L, minAvgTokenLenE6 = 1000000L,
        maxAvgTokenLenE6 = 20000000L, minTtrE6 = 0L, maxDup2E6 = 1000000L)),
      dedup = Some(NearDedupSpec("exact", "doc_id", "text")),
      mixing = Some(MixingSpec("doc_id", "source",
        rates = Map("banned" -> 0), defaultPct = 100)))

    val batch1 = Seq(
      (1L, "the quick brown fox jumps", "web"),
      (2L, "tiny", "web"),                      // gated (< 3 tokens)
      (3L, "a different sentence entirely here", "banned")) // mixed out
      .toDF("doc_id", "text", "source")
    batch1.write.mode("append").parquet(in)

    val q = Streaming.curationStream(spark, in, batch1.schema, spec, out, chk)
    try {
      q.processAllAvailable()
      spark.read.parquet(out).select("doc_id").as[Long].collect()
        .sorted shouldBe Array(1L)
      // batch 2: same content as doc 1 (state dedups it) + one new doc
      Seq((10L, "the quick brown fox jumps", "web"),
          (11L, "another unique document with words", "web"))
        .toDF("doc_id", "text", "source")
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      spark.read.parquet(out).select("doc_id").as[Long].collect()
        .sorted shouldBe Array(1L, 11L)
    } finally q.stop()

    // near-dup strategies are batch-only — fail loudly, don't degrade
    val e = the[IllegalArgumentException] thrownBy Streaming.curationStream(
      spark, in, batch1.schema,
      spec.copy(dedup = Some(NearDedupSpec("minhash_lsh", "doc_id", "text"))),
      out, chk)
    e.getMessage should include("batch")
  }

  test("curation stream applies the learned quality model ≡ batch curate") {
    import graft.config.{CurationSpec, QualityModelSpec}
    def bucket(tok: String, m: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16) % m).toInt
    }
    val in = Files.createTempDirectory("graft_qm_in").toString
    val out = Files.createTempDirectory("graft_qm_out").toString
    val chk = Files.createTempDirectory("graft_qm_chk").toString
    val spec = CurationSpec(model = Some(QualityModelSpec(
      "doc_id", "text", nBuckets = 32,
      weightsE6 = Map(bucket("good", 32) -> 200000L,
        bucket("bad", 32) -> -200000L),
      biasE6 = 0L, minScoreE6 = 100000L)))
    val batch1 = Seq(
      (1L, "good good stuff"), (2L, "bad content here")).toDF("doc_id", "text")
    batch1.write.mode("append").parquet(in)
    val q = Streaming.curationStream(spark, in, batch1.schema, spec, out, chk)
    try {
      q.processAllAvailable()
      val batch2 = Seq(
        (3L, "more good text"), (4L, "good bad neutral")).toDF("doc_id", "text")
      batch2.write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
      // the stream's survivors and audit scores ≡ the batch stage over
      // the same corpus (the row-local stage is literally the same plan)
      val expect = graft.text.Curation.curate(
        batch1.unionByName(batch2), spec)
        .select("doc_id", "score_e6").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      streamed.select("doc_id", "score_e6").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe expect
      expect.map(_._1) shouldBe Array(1L, 3L)
    } finally q.stop()
  }

  test("curation stream drops arrivals already in a historical corpus") {
    import graft.config.{CurationSpec, NearDedupSpec}
    val in = Files.createTempDirectory("graft_curc_in").toString
    val out = Files.createTempDirectory("graft_curc_out").toString
    val chk = Files.createTempDirectory("graft_curc_chk").toString
    val corpus = Seq((100L, "seen before content", "web"))
      .toDF("doc_id", "text", "source")
    val spec = CurationSpec(
      dedup = Some(NearDedupSpec("exact", "doc_id", "text")))
    val batch = Seq(
      (1L, "seen before content", "web"),   // in corpus → dropped
      (2L, "genuinely new content", "web"))
      .toDF("doc_id", "text", "source")
    batch.write.mode("append").parquet(in)
    val q = Streaming.curationStream(spark, in, batch.schema, spec, out, chk,
      corpus = Some(corpus))
    try {
      q.processAllAvailable()
      spark.read.parquet(out).select("doc_id").as[Long].collect()
        .sorted shouldBe Array(2L)
    } finally q.stop()
  }

  test("curation stream fuzzy-dedups arrivals against a historical corpus") {
    import graft.config.{CurationSpec, NearDedupSpec}
    val in = Files.createTempDirectory("graft_curf_in").toString
    val out = Files.createTempDirectory("graft_curf_out").toString
    val chk = Files.createTempDirectory("graft_curf_chk").toString
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta", "web"),
      (101L, "one two three four five six seven", "web"))
      .toDF("doc_id", "text", "source")
    val spec = CurationSpec(dedup = Some(NearDedupSpec(
      "minhash_lsh", "doc_id", "text", threshold = 0.5, ngram = 3)))
    val batch1 = Seq(
      (1L, "alpha beta gamma delta epsilon eta", "web"), // NEAR-dup → dropped
      (2L, "genuinely new arriving content here", "web"))
      .toDF("doc_id", "text", "source")
    batch1.write.mode("append").parquet(in)
    val q = Streaming.curationStream(spark, in, batch1.schema, spec, out, chk,
      corpus = Some(corpus))
    try {
      q.processAllAvailable()
      spark.read.parquet(out).select("doc_id").as[Long].collect()
        .sorted shouldBe Array(2L)
      // a later micro-batch is fuzzy-checked against the corpus too, and
      // within-stream exact dups are still dropped by state
      Seq((10L, "one two three four five six eight", "web"), // near-dup → drop
          (11L, "genuinely new arriving content here", "web"), // exact dup of 2
          (12L, "completely fresh second batch words", "web"))
        .toDF("doc_id", "text", "source")
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      spark.read.parquet(out).select("doc_id").as[Long].collect()
        .sorted shouldBe Array(2L, 12L)
    } finally q.stop()
    // fuzzy WITHOUT a corpus is still batch-only — fail loudly
    val e = the[IllegalArgumentException] thrownBy Streaming.curationStream(
      spark, in, batch1.schema, spec, out, chk)
    e.getMessage should include("corpus")
    // the corpus band buckets + verification sets were materialized to
    // DURABLE storage under the checkpoint dir (never localCheckpoint:
    // executor-resident blocks with truncated lineage die with their
    // executors and would permanently fail an unbounded query)
    new java.io.File(s"$chk/graft_corpus_state/buckets").exists() shouldBe true
    new java.io.File(s"$chk/graft_corpus_state/sets").exists() shouldBe true
  }

  test("curationStream rejects temperature mixing (corpus aggregate, batch-only)") {
    import graft.config.{CurationSpec, MixingSpec}
    val in = Files.createTempDirectory("graft_curt_in").toString
    val out = Files.createTempDirectory("graft_curt_out").toString
    val chk = Files.createTempDirectory("graft_curt_chk").toString
    val batch = Seq((1L, "some content", "web")).toDF("doc_id", "text", "source")
    batch.write.mode("append").parquet(in)
    val spec = CurationSpec(mixing =
      Some(MixingSpec("doc_id", "source", temperature = Some(0.5))))
    val e = the[IllegalArgumentException] thrownBy Streaming.curationStream(
      spark, in, batch.schema, spec, out, chk)
    e.getMessage should include("batch-only")
  }

  test("curationStream refuses an outDir holding a legacy _spark_metadata log") {
    import graft.config.CurationSpec
    val in = Files.createTempDirectory("graft_curm_in").toString
    val out = Files.createTempDirectory("graft_curm_out").toString
    val chk = Files.createTempDirectory("graft_curm_chk").toString
    val batch = Seq((1L, "some content", "web")).toDF("doc_id", "text", "source")
    batch.write.mode("append").parquet(in)
    // simulate a dir written by the pre-batch_id file sink
    new java.io.File(s"$out/_spark_metadata").mkdirs()
    val e = the[IllegalArgumentException] thrownBy Streaming.curationStream(
      spark, in, batch.schema, CurationSpec(), out, chk)
    e.getMessage should include("_spark_metadata")
  }

  test("driftStream reports per-batch histogram drift against a baseline") {
    val in = Files.createTempDirectory("graft_drift_in").toString
    val out = Files.createTempDirectory("graft_drift_out").toString
    val chk = Files.createTempDirectory("graft_drift_chk").toString
    val baseline = Seq(5.0, 15.0, 25.0, 35.0).toDF("v") // buckets 1..4 of 10
    val batch1 = Seq(5.0, 5.0).toDF("v")                // all in bucket 1
    batch1.write.mode("append").parquet(in)
    val q = Streaming.driftStream(spark, in, batch1.schema, "v", baseline,
      lo = 0.0, hi = 100.0, nBins = 10, out, chk)
    try {
      q.processAllAvailable()
      val r1 = spark.read.parquet(out).where("batch_id = 0")
        .collect().map(r => r.getAs[Long]("bucket") ->
          (r.getAs[Long]("n_cur"), r.getAs[Long]("delta_e6"))).toMap
      r1(1L) shouldBe ((2L, 750000L))  // share 1.0 vs baseline 0.25
      r1(2L)._1 shouldBe 0L            // baseline-only bins still reported
      // a second micro-batch lands in its own partition
      Seq(95.0).toDF("v").write.mode("append").parquet(in)
      q.processAllAvailable()
      val batches = spark.read.parquet(out).select("batch_id").distinct()
        .as[Long].collect().sorted
      batches shouldBe Array(0L, 1L)
    } finally q.stop()
  }

  test("watermarked windowed aggregation emits per-window counts") {
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedCounts(df, "ts", "event_type", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:04:00"), "click", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:11:00"), "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("win_counts").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toMap
      out("click") shouldBe 2L
      out("view") shouldBe 1L
    } finally q.stop()
  }

  test("dedupedStream drops duplicate keys within the watermark horizon") {
    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)](spark)
    val df = stream.toDF().toDF("ts", "id", "fare")
    val q = Streaming.dedupedStream(df, "ts", Seq("id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, 10.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L, 99.0), // dup in horizon
        (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 2L, 20.0))
      q.processAllAvailable()
      spark.table("dedup_stream").count() shouldBe 2 // first-seen wins
    } finally q.stop()
  }

  test("enrichStream broadcast-joins a static dimension per micro-batch") {
    val dim = Seq((1L, "Newark"), (2L, "Jamaica")).toDF("zone_id", "zone_name")
    val stream = MemoryStream[(Long, Double)](spark)
    val df = stream.toDF().toDF("zid", "fare")
    val q = Streaming.enrichStream(df, dim, "zid", "zone_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("zid") -> r.getAs[String]("zone_name")).toMap
      out(1L) shouldBe "Newark"
      out(3L) shouldBe null // left join keeps unmatched facts
    } finally q.stop()
  }

  test("goldRefreshStream keeps cumulative mart aggregates across batches") {
    import graft.config.{GoldModel, Measure}
    val mart = Files.createTempDirectory("graft_mart").toString + "/m"
    val chk = Files.createTempDirectory("graft_mart_chk").toString
    val model = GoldModel(name = "by_type",
      groupBy = Seq("event_type"),
      measures = Seq(Measure("n", "count(1)"),
        Measure("total", "cast(sum(cast(value as decimal(18,2))) as double)")))
    val stream = MemoryStream[(String, Double)](spark)
    val q = Streaming.goldRefreshStream(
      stream.toDF().toDF("event_type", "value"), model,
      keys = Seq("event_type"), partitionKeys = Seq("event_type"), mart, chk)
    try {
      stream.addData(("click", 1.0), ("click", 2.0), ("view", 5.0))
      q.processAllAvailable()
      // second batch touches an existing group — cumulative, not per-batch
      stream.addData(("click", 4.0))
      q.processAllAvailable()
      val out = spark.read.parquet(mart).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      out("click") shouldBe ((3L, 7.0))
      out("view") shouldBe ((1L, 5.0))
    } finally q.stop()
  }

  test("goldRefreshStream rewrites ONLY the partitions a batch touched") {
    import graft.config.{GoldModel, Measure}
    import org.apache.hadoop.fs.Path
    val mart = Files.createTempDirectory("graft_mart_part").toString + "/m"
    val chk = Files.createTempDirectory("graft_mart_part_chk").toString
    val model = GoldModel(name = "by_type",
      groupBy = Seq("event_type"),
      measures = Seq(Measure("n", "count(1)"),
        Measure("total", "cast(sum(cast(value as decimal(18,2))) as double)")))
    val fs = new Path(mart).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(p: String): Set[(String, Long, Long)] =
      fs.listStatus(new Path(s"$mart/event_type=$p"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .toSet

    val stream = MemoryStream[(String, Double)](spark)
    val q = Streaming.goldRefreshStream(
      stream.toDF().toDF("event_type", "value"), model,
      keys = Seq("event_type"), partitionKeys = Seq("event_type"), mart, chk)
    try {
      stream.addData(("click", 1.0), ("view", 5.0))
      q.processAllAvailable()
      val viewBefore = partFiles("view")
      val clickBefore = partFiles("click")
      Thread.sleep(20) // mtime tick so an (unexpected) rewrite is visible
      stream.addData(("click", 4.0)) // touches ONLY the click partition
      q.processAllAvailable()
      partFiles("view") shouldBe viewBefore // untouched dir: bit-for-bit alone
      partFiles("click") should not be clickBefore
      // no whole-mart swap debris from the old rename protocol
      fs.exists(new Path(mart + "__refresh_tmp")) shouldBe false
      fs.exists(new Path(mart + "__refresh_bak")) shouldBe false
      val out = spark.read.parquet(mart).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
      out("click") shouldBe 2L // merged cumulative, not clobbered
      out("view") shouldBe 1L
    } finally q.stop()
  }

  test("recoverMartPartitions restores a half-committed partition from bak") {
    import graft.config.{GoldModel, Measure}
    import org.apache.hadoop.fs.Path
    val mart = Files.createTempDirectory("graft_mart_crash").toString + "/m"
    val chk = Files.createTempDirectory("graft_mart_crash_chk").toString
    // two GROUPS share the click partition — the crash window must not
    // lose the group the dead batch wasn't updating
    val model = GoldModel(name = "by_type_sub",
      groupBy = Seq("event_type", "sub"),
      measures = Seq(Measure("n", "count(1)")))
    val fs = new Path(mart).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stream = MemoryStream[(String, String, Double)](spark)
    val q = Streaming.goldRefreshStream(
      stream.toDF().toDF("event_type", "sub", "value"), model,
      keys = Seq("event_type", "sub"), partitionKeys = Seq("event_type"),
      mart, chk)
    try {
      stream.addData(("click", "a", 1.0), ("click", "b", 2.0), ("view", "x", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    // simulate a crash inside the dynamic-overwrite commit of a batch that
    // touched (click, a): the pre-batch click rows were snapshotted to
    // __bak (committed), then the committer deleted the click dir and died
    // before renaming the staged replacement in
    spark.read.parquet(mart).filter($"event_type" === "click")
      .write.mode("overwrite").parquet(mart + "__bak")
    fs.delete(new Path(mart + "/event_type=click"), true)
    spark.read.parquet(mart).count() shouldBe 1 // only view survives the crash

    Streaming.recoverMartPartitions(spark, fs, mart, Seq("event_type"))
    val out = spark.read.parquet(mart).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("sub")) ->
        r.getAs[Long]("n")).toMap
    out(("click", "a")) shouldBe 1L // the batch's own group: pre-batch value,
    out(("click", "b")) shouldBe 1L // the INNOCENT group: not lost
    out(("view", "x")) shouldBe 1L
    fs.exists(new Path(mart + "__bak")) shouldBe false
    // pre-r11 whole-mart swap debris migrates instead of orphaning
    require(fs.rename(new Path(mart), new Path(mart + "__refresh_bak")))
    Streaming.recoverMartPartitions(spark, fs, mart, Seq("event_type"))
    spark.read.parquet(mart).count() shouldBe 3
  }

  test("goldRefreshStream keeps numeric-looking string partition keys intact") {
    import graft.config.{GoldModel, Measure}
    val mart = Files.createTempDirectory("graft_mart_str").toString + "/m"
    val chk = Files.createTempDirectory("graft_mart_str_chk").toString
    val model = GoldModel(name = "by_month",
      groupBy = Seq("month"),
      measures = Seq(Measure("n", "count(1)")))
    val stream = MemoryStream[(String, Double)](spark)
    val q = Streaming.goldRefreshStream(
      stream.toDF().toDF("month", "value"), model,
      keys = Seq("month"), partitionKeys = Seq("month"), mart, chk)
    try {
      // "01" would round-trip as int 1 under partition type inference and
      // split into month=01 + month=1 dirs; the schema-pinned merge read
      // must keep ONE logical group
      stream.addData(("01", 1.0))
      q.processAllAvailable()
      stream.addData(("01", 2.0))
      q.processAllAvailable()
      val dirs = new java.io.File(mart).listFiles
        .filter(_.isDirectory).map(_.getName).toSet
      dirs shouldBe Set("month=01")
      val out = spark.read.schema("month STRING, n LONG").parquet(mart)
        .collect()
        .map(r => r.getAs[String]("month") -> r.getAs[Long]("n")).toMap
      out shouldBe Map("01" -> 2L)
    } finally q.stop()
  }

  test("goldRefreshStream refuses a legacy non-partitioned mart dir") {
    import graft.config.{GoldModel, Measure}
    val mart = Files.createTempDirectory("graft_mart_legacy").toString + "/m"
    val chk = Files.createTempDirectory("graft_mart_legacy_chk").toString
    // a flat mart written by some earlier job occupies the path
    Seq(("click", 1L)).toDF("event_type", "n").write.parquet(mart)
    val model = GoldModel(name = "by_type",
      groupBy = Seq("event_type"),
      measures = Seq(Measure("n", "count(1)")))
    val stream = MemoryStream[(String, Double)](spark)
    val q = Streaming.goldRefreshStream(
      stream.toDF().toDF("event_type", "value"), model,
      keys = Seq("event_type"), partitionKeys = Seq("event_type"), mart, chk)
    try {
      stream.addData(("click", 1.0))
      val e = the[org.apache.spark.sql.streaming.StreamingQueryException] thrownBy
        q.processAllAvailable()
      e.getMessage should include("non-partitioned")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    val stream = MemoryStream[Streaming.KeyedEvent](spark)
    val q = Streaming.runningTotals(stream.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(Streaming.KeyedEvent("u1", 5.0), Streaming.KeyedEvent("u1", 7.0))
      q.processAllAvailable()
      stream.addData(Streaming.KeyedEvent("u1", 8.0))
      q.processAllAvailable()
      val last = spark.table("running").collect()
        .filter(_.getAs[String]("key") == "u1")
        .maxBy(_.getAs[Long]("n"))
      last.getAs[Long]("n") shouldBe 3L
      last.getAs[Double]("total") shouldBe 20.0 +- 1e-9
    } finally q.stop()
  }

  test("sessionStream closes sessions on gap and finalizes on watermark timeout") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp((1000 + sec) * 1000L)
    val stream = MemoryStream[Streaming.SessionEvent](spark)
    val sessions = Streaming.sessionStream(
      stream.toDS().withWatermark("ts", "0 seconds").as[Streaming.SessionEvent],
      gapSec = 30L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events 10s apart (one session), then one 60s later ->
      // the gap closes session 1 inside the batch
      stream.addData(
        Streaming.SessionEvent("a", ts(0), 1.5),
        Streaming.SessionEvent("a", ts(10), 2.0),
        Streaming.SessionEvent("a", ts(100), 0.25))
      q.processAllAvailable()
      val afterGap = spark.table("sessions").as[Streaming.ClosedSession].collect()
      afterGap.map(s => (s.key, s.startUs, s.endUs, s.nEvents, s.valueSumE6))
        .toSeq shouldBe Seq(("a", 1000000000L, 1010000000L, 2L, 3500000L))

      // batch 2: only key b arrives, far in the future -> the watermark
      // passes a's last+gap and the EventTimeTimeout finalizes a's session
      stream.addData(Streaming.SessionEvent("b", ts(500), 3.0))
      q.processAllAvailable()
      // one more batch so the timeout (evaluated against the advanced
      // watermark) fires and its output commits
      stream.addData(Streaming.SessionEvent("b", ts(501), 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Streaming.ClosedSession].collect()
      all.filter(_.key == "a").map(s => (s.startUs, s.endUs, s.nEvents))
        .toSeq should contain((1100000000L, 1100000000L, 1L))
    } finally q.stop()
  }

  test("sessionStream absorbs watermark-permitted stragglers with exact bounds") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp((1000 + sec) * 1000L)
    val stream = MemoryStream[Streaming.SessionEvent](spark)
    // generous watermark so out-of-order events are admitted, not dropped
    val sessions = Streaming.sessionStream(
      stream.toDS().withWatermark("ts", "1 hour").as[Streaming.SessionEvent],
      gapSec = 30L)
    val q = sessions.writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 opens a session at [100, 110]
      stream.addData(
        Streaming.SessionEvent("a", ts(100), 1.0),
        Streaming.SessionEvent("a", ts(110), 1.0))
      q.processAllAvailable()
      // batch 2: a straggler at 90 (within gap of start 100) must extend the
      // session's START downward; stragglers at 5 and 10 (> gap before
      // start, within gap of EACH OTHER) must chain into ONE earlier
      // session — not fragment into singletons
      stream.addData(
        Streaming.SessionEvent("a", ts(90), 2.0),
        Streaming.SessionEvent("a", ts(5), 3.0),
        Streaming.SessionEvent("a", ts(10), 2.0))
      q.processAllAvailable()
      val isolated = spark.table("sessions_late").as[Streaming.ClosedSession]
        .collect()
      isolated.map(s => (s.startUs, s.endUs, s.nEvents, s.valueSumE6))
        .toSeq shouldBe Seq((1005000000L, 1010000000L, 2L, 5000000L))
      // flush the open session via the event-time timeout: advance the
      // watermark with a different key, then one more batch to commit
      stream.addData(Streaming.SessionEvent("b", ts(100000), 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.SessionEvent("b", ts(100001), 0.0))
      q.processAllAvailable()
      val a = spark.table("sessions_late").as[Streaming.ClosedSession].collect()
        .filter(s => s.key == "a" && s.nEvents == 3L)
      a.map(s => (s.startUs, s.endUs, s.valueSumE6))
        .toSeq shouldBe Seq((1090000000L, 1110000000L, 4000000L))
    } finally q.stop()
  }

  test("sessionStream: a straggler chain bridging into the open session merges whole") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp((1000 + sec) * 1000L)
    val stream = MemoryStream[Streaming.SessionEvent](spark)
    val sessions = Streaming.sessionStream(
      stream.toDS().withWatermark("ts", "1 hour").as[Streaming.SessionEvent],
      gapSec = 30L)
    val q = sessions.writeStream.format("memory").queryName("sessions_chain")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Streaming.SessionEvent("a", ts(100), 1.0),
        Streaming.SessionEvent("a", ts(110), 1.0))
      q.processAllAvailable()
      // 60 → 85 → 100 all chain within the 30s gap: everything merges into
      // the open session (batch semantics); NOTHING closes
      stream.addData(
        Streaming.SessionEvent("a", ts(60), 1.0),
        Streaming.SessionEvent("a", ts(85), 1.0))
      q.processAllAvailable()
      spark.table("sessions_chain").count() shouldBe 0L
      // flush via watermark advance + commit batch
      stream.addData(Streaming.SessionEvent("b", ts(100000), 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.SessionEvent("b", ts(100001), 0.0))
      q.processAllAvailable()
      val a = spark.table("sessions_chain").as[Streaming.ClosedSession]
        .collect().filter(_.key == "a")
      a.map(s => (s.startUs, s.endUs, s.nEvents, s.valueSumE6))
        .toSeq shouldBe Seq((1060000000L, 1110000000L, 4L, 4000000L))
    } finally q.stop()
  }

  test("streaming sessionization ≡ batch Sessions.sessionStats on a replayed log") {
    import spark.implicits._
    // deterministic event log: 5 keys × bursts with gaps straddling 30s,
    // plus sub-millisecond timestamps to exercise the micros conversion
    val events = for {
      k <- 0 until 5
      burst <- 0 until 3
      e <- 0 until 4
    } yield {
      val sec = burst * 100 + e * 7 + k
      val t = new java.sql.Timestamp(1000000L + sec * 1000L)
      t.setNanos((e * 250) * 1000) // +0, 250, 500, 750 µs
      Streaming.SessionEvent(s"k$k", t, (k * 10 + e) / 4.0)
    }
    // batch twin: same micros, same gap, via the q61 operator
    val batchIn = events.toDF()
      .withColumn("ts_us",
        org.apache.spark.sql.functions.expr(
          "unix_micros(ts)"))
    val batch = graft.ops.Sessions.sessionStats(
        batchIn, "key", "ts_us", "ts_us", "value", gapSec = 30L)
      .select("key", "start_us", "end_us", "n_events", "value_sum_e6")
      .as[(String, Long, Long, Long, Long)].collect().toSet

    val stream = MemoryStream[Streaming.SessionEvent](spark)
    val q = Streaming.sessionStream(
        stream.toDS().withWatermark("ts", "0 seconds")
          .as[Streaming.SessionEvent], gapSec = 30L)
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      // replay in event order (watermark 0s → disorder would drop rows)
      events.sortBy(_.ts.getTime).grouped(7).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
      // push the watermark far past every last+gap, then commit the timeouts
      stream.addData(Streaming.SessionEvent("zz",
        new java.sql.Timestamp(1000000L + 10000000L), 0.0))
      q.processAllAvailable()
      stream.addData(Streaming.SessionEvent("zz",
        new java.sql.Timestamp(1000000L + 10000001L), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_eq").as[Streaming.ClosedSession]
        .collect().filter(_.key.startsWith("k"))
        .map(s => (s.key, s.startUs, s.endUs, s.nEvents, s.valueSumE6)).toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  test("topKStream accumulates per-batch sketch state whose merge equals one-shot") {
    import org.apache.spark.sql.functions.{col, explode}
    val in = Files.createTempDirectory("graft_topk_in").toString
    val out = Files.createTempDirectory("graft_topk_out").toString
    val chk = Files.createTempDirectory("graft_topk_chk").toString
    val b1 = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "u")
    b1.write.mode("append").parquet(in)
    val q = Streaming.topKStream(spark, in, b1.schema, Seq("g"), "u", out, chk)
    try {
      q.processAllAvailable()
      // coalesce(1): the query is RUNNING, and a multi-file append's job
      // commit renames part files into the dir one at a time — a trigger
      // listing mid-commit splits them across two micro-batches and the
      // batch-count assertion below flakes. One file = one atomic rename.
      Seq(("a", 1L), ("a", 3L), ("b", 9L)).toDF("g", "u").coalesce(1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      spark.read.parquet(out).select("batch_id").distinct().count() shouldBe 2L
      def estOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("g"),
          explode(graft.quality.Sketches.topKEstimate(col("topk_state"), 10))
            .as("e"))
        .select(col("g"), col("e.item").as("item"), col("e.count").as("est"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val merged = estOf(Streaming.mergedTopK(spark, out, Seq("g")))
      merged(("a", 1L)) shouldBe 3L // 2 in batch 0 + 1 in batch 1
      merged(("b", 9L)) shouldBe 2L
      val oneShot = estOf(graft.quality.Sketches.topKSketches(
        spark.read.parquet(in), Seq("g"), "u"))
      merged shouldBe oneShot
    } finally q.stop()
  }

  test("histogramStream: per-batch bin partials merge exactly to the one-shot state") {
    import org.apache.spark.sql.functions.col
    val in = Files.createTempDirectory("graft_hist_in").toString
    val out = Files.createTempDirectory("graft_hist_out").toString
    val chk = Files.createTempDirectory("graft_hist_chk").toString
    val b1 = Seq(("a", 5L), ("a", 45L), ("a", 95L), ("b", 12L))
      .toDF("g", "v")
    b1.write.mode("append").parquet(in)
    val q = Streaming.histogramStream(spark, in, b1.schema, Seq("g"), "v",
      binWidth = 10L, out, chk)
    try {
      q.processAllAvailable()
      Seq(("a", 7L), ("a", 55L), ("b", 18L)).toDF("g", "v").coalesce(1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      spark.read.parquet(out).select("batch_id").distinct()
        .count() shouldBe 2L
      // merged quantiles ≡ quantiles of the one-shot batch state — the
      // algebraic-merge exactness the sketch trackers can only estimate
      val merged = Streaming.mergedHistogramQuantiles(spark, out, Seq("g"),
          10L, Seq(500000L, 1000000L))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val oneShot = graft.quality.Sketches.histogramQuantiles(
          graft.quality.Sketches.histogramState(
            spark.read.parquet(in), Seq("g"), "v", 10L),
          Seq("g"), 10L, Seq(500000L, 1000000L))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      merged shouldBe oneShot
      // hand-check: group a values {5,7,45,55,95} → p50 in bin 4 [40,50)
      merged(("a", 500000L)) shouldBe ((40L, 50L))
      merged(("a", 1000000L)) shouldBe ((90L, 100L))
    } finally q.stop()
  }

  test("kmvStream: per-batch sketches fold exactly to the one-shot sketch") {
    import org.apache.spark.sql.functions.col
    val in = Files.createTempDirectory("graft_kmv_in").toString
    val out = Files.createTempDirectory("graft_kmv_out").toString
    val chk = Files.createTempDirectory("graft_kmv_chk").toString
    val b1 = ((1 to 30).map(i => ("a", s"u$i")) ++
      Seq(("b", "x1"), ("b", "x2"))).toDF("g", "u")
    b1.write.mode("append").parquet(in)
    val q = Streaming.kmvStream(spark, in, b1.schema, Seq("g"), "u",
      k = 8, out, chk)
    try {
      q.processAllAvailable()
      // batch 2 overlaps batch 1 (u20..u40): a re-offered hash must not
      // skew the merged sketch
      ((20 to 40).map(i => ("a", s"u$i")) ++ Seq(("b", "x2"), ("b", "x3")))
        .toDF("g", "u").coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      spark.read.parquet(out).select("batch_id").distinct()
        .count() shouldBe 2L
      val merged = Streaming.mergedKmvEstimates(spark, out, Seq("g"), 8)
        .collect().map(r => r.getString(0) ->
          (r.getSeq[Long](1), r.getAs[Long]("est_kmv"))).toMap
      val oneShot = graft.quality.Kmv.sketches(
          spark.read.parquet(in), Seq("g"), "u", 8)
        .withColumn("est_kmv", graft.quality.Kmv.estimate(col("kmv"), 8))
        .collect().map(r => r.getString(0) ->
          (r.getSeq[Long](1), r.getAs[Long]("est_kmv"))).toMap
      merged shouldBe oneShot
      // group b never saturated (3 distinct < k=8) → estimate is EXACT
      merged("b")._2 shouldBe 3L
      merged("a")._1.size shouldBe 8
    } finally q.stop()
  }

  test("kmvStream overlap/churn dashboards ≡ batch reports over all streamed rows") {
    import org.apache.spark.sql.functions.col
    val in = Files.createTempDirectory("graft_kmvo_in").toString
    val out = Files.createTempDirectory("graft_kmvo_out").toString
    val chk = Files.createTempDirectory("graft_kmvo_chk").toString
    // three types with engineered overlap, split across two batches so
    // the pairwise estimates must come from FOLDED state
    val b1 = ((1 to 40).map(i => ("train", s"u$i")) ++
      (21 to 35).map(i => ("eval", s"u$i"))).toDF("g", "u")
    b1.write.mode("append").parquet(in)
    val q = Streaming.kmvStream(spark, in, b1.schema, Seq("g"), "u",
      k = 16, out, chk)
    try {
      q.processAllAvailable()
      ((41 to 60).map(i => ("train", s"u$i")) ++
        (1 to 10).map(i => ("holdout", s"h$i"))).toDF("g", "u")
        .coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = Streaming.mergedKmvOverlap(spark, out, "g", 16)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      val batch = graft.quality.Kmv.overlapReport(
          spark.read.parquet(in), "g", "u", 16)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      streamed shouldBe batch
      streamed.length shouldBe 3 // all pairs incl. the disjoint holdout
    } finally q.stop()
    // churn: the same state shape keyed by an integral day column
    val in2 = Files.createTempDirectory("graft_kmvc_in").toString
    val out2 = Files.createTempDirectory("graft_kmvc_out").toString
    val chk2 = Files.createTempDirectory("graft_kmvc_chk").toString
    val d1 = ((1 to 30).map(i => (10L, s"u$i")) ++
      (16 to 40).map(i => (11L, s"u$i"))).toDF("day", "u")
    d1.write.mode("append").parquet(in2)
    val q2 = Streaming.kmvStream(spark, in2, d1.schema, Seq("day"), "u",
      k = 16, out2, chk2)
    try {
      q2.processAllAvailable()
      (26 to 50).map(i => (12L, s"u$i")).toDF("day", "u")
        .coalesce(1).write.mode("append").parquet(in2)
      q2.processAllAvailable()
      val streamed = Streaming.mergedKmvChurn(spark, out2, "day", 16)
        .orderBy("type_a").collect().map(_.toSeq)
      val batch = graft.quality.Kmv.consecutiveOverlap(
          spark.read.parquet(in2), "day", "u", 16)
        .orderBy("type_a").collect().map(_.toSeq)
      streamed shouldBe batch
      streamed.length shouldBe 2 // (10,11) and (11,12)
    } finally q2.stop()
  }

  test("kmvValuesStream: merged quantiles and KS ≡ batch over all streamed rows") {
    val in = Files.createTempDirectory("graft_kmvv_in").toString
    val out = Files.createTempDirectory("graft_kmvv_out").toString
    val chk = Files.createTempDirectory("graft_kmvv_chk").toString
    // two types with different value distributions, split so the
    // merged dashboards must fold MULTI-BATCH state
    val b1 = ((1 to 200).map(i => ("lo", s"a$i", (i % 50).toLong)) ++
      (1 to 150).map(i => ("hi", s"b$i", 1000L + i % 40))).toDF("g", "id", "v")
    b1.write.mode("append").parquet(in)
    val q = Streaming.kmvValuesStream(spark, in, b1.schema, Seq("g"),
      "id", "v", k = 32, out, chk)
    try {
      q.processAllAvailable()
      // batch 2 re-offers some ids (idempotent) and adds new ones
      ((150 to 260).map(i => ("lo", s"a$i", (i % 50).toLong)) ++
        (100 to 180).map(i => ("hi", s"b$i", 1000L + i % 40)))
        .toDF("g", "id", "v").coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val all = spark.read.parquet(in)
      val qs = Seq(500000L, 900000L)
      val streamedQ = Streaming.mergedKmvQuantiles(spark, out, Seq("g"),
        32, qs).orderBy("g").collect().map(_.toSeq)
      val batchQ = graft.quality.Kmv.quantileReport(all, Seq("g"), "id",
        "v", 32, qs).orderBy("g").collect().map(_.toSeq)
      streamedQ shouldBe batchQ
      val streamedKs = Streaming.mergedKmvKs(spark, out, "g", 32)
        .collect().map(_.toSeq)
      val batchKs = graft.quality.Kmv.sampleKsReport(all, "g", "id", "v",
        32).collect().map(_.toSeq)
      streamedKs shouldBe batchKs
      // disjoint value ranges → the sampled KS must read (near-)total
      // separation: every lo value < every hi value → D = 1.0 exactly
      streamedKs.head.last shouldBe 1000000L
    } finally q.stop()
  }

  test("kmvWeightedValuesStream: merged weighted KS/quantiles and gates ≡ batch") {
    val in = Files.createTempDirectory("graft_kmvw_in").toString
    val out = Files.createTempDirectory("graft_kmvw_out").toString
    val chk = Files.createTempDirectory("graft_kmvw_chk").toString
    // three types: lo/hi value ranges are disjoint (total separation in
    // BOTH statistics), mid overlaps lo but carries its mass on the high
    // values (the doc-count/mass flip substrate); k holds every set
    // whole so the merged reports are exact, not just fold-equal
    val b1 = ((1 to 40).map(i => ("lo", s"a$i", (i % 20).toLong, 10L)) ++
      (1 to 30).map(i => ("hi", s"b$i", 1000L + i % 20, 10L)) ++
      (1 to 20).map(i => ("mid", s"c$i", (10 + i % 20).toLong,
        if (i % 20 < 10) 1L else 1000L))).toDF("g", "id", "v", "m")
    b1.write.mode("append").parquet(in)
    val q = Streaming.kmvWeightedValuesStream(spark, in, b1.schema,
      Seq("g"), "id", "v", "m", k = 64, out, chk)
    try {
      q.processAllAvailable()
      // batch 2 re-offers ids with identical (v, m) pairs (idempotent —
      // id determines both) and adds new ones to two of the types
      ((30 to 55).map(i => ("lo", s"a$i", (i % 20).toLong, 10L)) ++
        (20 to 40).map(i => ("hi", s"b$i", 1000L + i % 20, 10L)))
        .toDF("g", "id", "v", "m")
        .coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val all = spark.read.parquet(in)
      val qs = Seq(500000L, 900000L)
      val streamedQ = Streaming.mergedKmvWeightedQuantiles(spark, out,
        Seq("g"), 64, qs).orderBy("g").collect().map(_.toSeq)
      val batchQ = graft.quality.Kmv.weightedQuantileReport(all,
        Seq("g"), "id", "v", "m", 64, qs)
        .orderBy("g").collect().map(_.toSeq)
      streamedQ shouldBe batchQ
      val streamedKs = Streaming.mergedKmvWeightedKs(spark, out, "g", 64)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      val batchKs = graft.quality.Kmv.weightedSampleKsReport(all, "g",
        "id", "v", "m", 64)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      streamedKs shouldBe batchKs
      // the disjoint (hi, lo) pair reads D = 1.0 in both statistics
      val hiLo = Streaming.mergedKmvWeightedKs(spark, out, "g", 64)
        .filter(col("type_a") === "hi" && col("type_b") === "lo").head()
      hiLo.getAs[Long]("wks_e6") shouldBe 1000000L
      hiLo.getAs[Long]("ks_e6") shouldBe 1000000L
      // ONE weighted stream serves BOTH declarative gate forms (the
      // weighted spec gates wks_e6, the unweighted spec folds the same
      // state's (h, v) projection), each ≡ its batch Orchestrator twin
      val kcW = graft.config.KsCheck("g", "id", "v", k = 64,
        maxKsE6 = 400000L, massColumn = Some("m"))
      val spec = graft.config.QualitySpec(
        ksChecks = Seq(kcW, kcW.copy(massColumn = None)))
      val batchCounts = graft.quality.Orchestrator.run(all, spec)
        .checkResults.filter(_.check == "ks_check").map(_.failedCount)
      val streamedCounts = Seq(
        Streaming.mergedKsCheck(spark, out, kcW).failedCount,
        Streaming.mergedKsCheck(spark, out,
          kcW.copy(massColumn = None)).failedCount)
      streamedCounts shouldBe batchCounts
      Streaming.mergedKsCheck(spark, out, kcW)
        .column should endWith("(streamed)")
      // the state records the contract it was sketched with; a spec
      // asking for a DIFFERENT mass column (or k) must raise, not
      // silently gate a statistic the config never asked for
      an[IllegalArgumentException] should be thrownBy
        Streaming.mergedKsCheck(spark, out,
          kcW.copy(massColumn = Some("bytes")))
      an[IllegalArgumentException] should be thrownBy
        Streaming.mergedKsCheck(spark, out, kcW.copy(k = 32))
    } finally q.stop()
  }

  test("kmvStream containment across two streams ≡ batch containmentReport") {
    import org.apache.spark.sql.functions.col
    def dirs(tag: String) = (
      Files.createTempDirectory(s"graft_${tag}_in").toString,
      Files.createTempDirectory(s"graft_${tag}_out").toString,
      Files.createTempDirectory(s"graft_${tag}_chk").toString)
    val (inA, outA, chkA) = dirs("kmvca")
    val (inB, outB, chkB) = dirs("kmvcb")
    // eval suites (side A, small) vs training domains (side B, large):
    // suite s1 is 80% contained in domain d1, s2 disjoint
    val a1 = ((1 to 8).map(i => ("s1", s"u$i")) ++
      Seq(("s1", "x1"), ("s1", "x2")) ++
      (1 to 10).map(i => ("s2", s"z$i"))).toDF("g", "u")
    val b1 = (1 to 35).map(i => ("d1", s"u$i")).toDF("g", "u")
    a1.write.mode("append").parquet(inA)
    b1.write.mode("append").parquet(inB)
    val qA = Streaming.kmvStream(spark, inA, a1.schema, Seq("g"), "u",
      k = 64, outA, chkA)
    val qB = Streaming.kmvStream(spark, inB, b1.schema, Seq("g"), "u",
      k = 64, outB, chkB)
    try {
      qA.processAllAvailable(); qB.processAllAvailable()
      // second training batch extends d1 and adds d2
      ((36 to 50).map(i => ("d1", s"u$i")) ++
        (1 to 5).map(i => ("d2", s"z$i"))).toDF("g", "u")
        .coalesce(1).write.mode("append").parquet(inB)
      qB.processAllAvailable()
      val streamed = Streaming.mergedKmvContainment(
          spark, outA, "g", outB, "g", 64)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      val batch = graft.quality.Kmv.containmentReport(
          spark.read.parquet(inA), "g", "u",
          spark.read.parquet(inB), "g", "u", 64)
        .orderBy("type_a", "type_b").collect().map(_.toSeq)
      streamed shouldBe batch
      // unsaturated sketches → exact: s1 is 8/10 inside d1
      val s1d1 = Streaming.mergedKmvContainment(
          spark, outA, "g", outB, "g", 64)
        .filter(col("type_a") === "s1" && col("type_b") === "d1")
        .head()
      s1d1.getAs[Long]("cont_a_in_b_e6") shouldBe 800000L
    } finally { qA.stop(); qB.stop() }
  }

  test("config-driven quality gates over folded stream state ≡ batch Orchestrator gates") {
    import graft.config.ConfigLoader
    // ONE declarative YAML quality block drives BOTH engines: the batch
    // Orchestrator over all rows, and the merged gates over folded
    // kmvStream/kmvValuesStream state — failedCounts must agree exactly
    // (fold exactness; all sketches sized to hold their sets whole so
    // the expected counts are derivable by hand, not just equal).
    val yaml =
      """version: "1.0"
        |pipeline:
        |  name: stream_gates
        |quality:
        |  ks_checks:
        |    - {type_column: g, id_column: id, value_column: v,
        |       k: 32, max_ks_e6: 400000}
        |  growth_checks:
        |    - {day_column: day, item_column: id, k: 64,
        |       min_new_per_day: 3, warmup_days: 1}
        |  containment_checks:
        |    - {a_type_column: g, b_type_column: g, item_column: id,
        |       k: 64, max_containment_e6: 500000}
        |  quantile_checks:
        |    - {group_by: [g], value_column: v, bin_width: 100,
        |       q_e6: 500000, max_value: 500}
        |  distinct_checks:
        |    - {group_by: [g], item_column: id, k: 64, min_count: 12}
        |  overlap_checks:
        |    - {type_column: g, item_column: id, k: 64,
        |       max_jaccard_e6: 300000}
        |""".stripMargin
    val cfg = ConfigLoader.parse(yaml)
    // a and b share a value multiset (D = 0); c's values are disjoint
    // (D = 1.0 vs both). In ID space a is 8/10 inside c (containment
    // 800000 fails the 500000 cap); every other ordered pair is low.
    // Day curve: d10 bootstrap, d11 +10 new, d12 +1, d13 silent, d14 +2
    // → 3 growth failures past the 1-day warmup at floor 3.
    val batch1 =
      ((1 to 8).map(i => ("a", s"u$i", (i % 5).toLong, 10L)) ++
        Seq(("a", "ax1", 3L, 10L), ("a", "ax2", 4L, 10L)) ++
        (1 to 8).map(i => ("b", s"b$i", (i % 5).toLong, 10L)) ++
        Seq(("b", "bx1", 3L, 10L), ("b", "bx2", 4L, 10L)) ++
        (1 to 8).map(i => ("c", s"u$i", 1000L + i, 10L)) ++
        (1 to 2).map(j => ("c", s"c$j", 1008L + j, 10L)))
        .toDF("g", "id", "v", "day")
    val batch2 =
      ((3 to 12).map(j => ("c", s"c$j", 1008L + j, 11L)) ++
        Seq(("c", "c13", 1021L, 12L), ("a", "u1", 1L, 12L),
          ("c", "c14", 1022L, 14L), ("c", "c15", 1023L, 14L),
          // group z has ONLY null ids — the cardinality-collapse case:
          // the stream must write it as an empty-sketch row (no null
          // pre-filter) so the distinct gate's min_count fires on est 0
          // exactly like the batch gate's unfiltered aggregate
          ("z", null.asInstanceOf[String], 5L, 14L)))
        .toDF("g", "id", "v", "day")
    val in = Files.createTempDirectory("graft_qg_in").toString
    def dirs(tag: String) =
      (Files.createTempDirectory(s"graft_qg_${tag}_out").toString,
        Files.createTempDirectory(s"graft_qg_${tag}_chk").toString)
    val (outKs, chkKs) = dirs("ks")
    val (outG, chkG) = dirs("g")
    val (outC, chkC) = dirs("c")
    val (outH, chkH) = dirs("h")
    batch1.write.mode("append").parquet(in)
    val kc = cfg.quality.ksChecks.head
    val gc = cfg.quality.growthChecks.head
    val cc = cfg.quality.containmentChecks.head
    val qcQ = cfg.quality.quantileChecks.head
    val dc = cfg.quality.distinctChecks.head
    val oc = cfg.quality.overlapChecks.head
    val qKs = Streaming.kmvValuesStream(spark, in, batch1.schema,
      Seq(kc.typeColumn), kc.idColumn, kc.valueColumn, kc.k, outKs, chkKs)
    val qG = Streaming.kmvStream(spark, in, batch1.schema,
      Seq(gc.dayColumn), gc.itemColumn, gc.k, outG, chkG)
    // ONE kmv stream keyed by the type column serves containment,
    // distinct and overlap (their specs agree on item/k/grouping —
    // which the stamped contract verifies)
    val qC = Streaming.kmvStream(spark, in, batch1.schema,
      Seq(cc.aTypeColumn), cc.itemColumn, cc.k, outC, chkC)
    val qH = Streaming.histogramStream(spark, in, batch1.schema,
      qcQ.groupBy, qcQ.valueColumn, qcQ.binWidth, outH, chkH)
    try {
      qKs.processAllAvailable(); qG.processAllAvailable()
      qC.processAllAvailable(); qH.processAllAvailable()
      batch2.coalesce(1).write.mode("append").parquet(in)
      qKs.processAllAvailable(); qG.processAllAvailable()
      qC.processAllAvailable(); qH.processAllAvailable()
      val streamed = Map(
        "ks_check" -> Streaming.mergedKsCheck(spark, outKs, kc),
        "growth_check" -> Streaming.mergedGrowthCheck(spark, outG, gc),
        "containment_check" ->
          Streaming.mergedContainmentCheck(spark, outC, outC, cc),
        "quantile_check" ->
          Streaming.mergedQuantileCheck(spark, outH, qcQ),
        "distinct_check" -> Streaming.mergedDistinctCheck(spark, outC, dc),
        "overlap_check" -> Streaming.mergedOverlapCheck(spark, outC, oc))
      streamed.foreach { case (check, r) => r.check shouldBe check }
      streamed("ks_check").failedCount shouldBe 2L
      streamed("growth_check").failedCount shouldBe 3L
      streamed("containment_check").failedCount shouldBe 1L
      // c's values sit in bin 10 (bin_lo 1000 > 500); a/b/z in bin 0
      streamed("quantile_check").failedCount shouldBe 1L
      // distinct ids: a 10, b 10 (< 12, fail), c 23 (pass), z all-null
      // → empty sketch → est 0 (the collapse alarm, ≡ batch)
      streamed("distinct_check").failedCount shouldBe 3L
      // id jaccard: a-c = 8/25 = 320000 > 300000; a-b = b-c = 0; z's
      // empty sketch reads jaccard/containment 0 against everything
      streamed("overlap_check").failedCount shouldBe 1L
      // the batch Orchestrator over every row ever streamed agrees
      val report = graft.quality.Orchestrator.run(
        spark.read.parquet(in), cfg.quality)
      val batchCounts = report.checkResults
        .filter(r => streamed.contains(r.check))
        .map(r => r.check -> r.failedCount).toMap
      batchCounts shouldBe streamed.map { case (k2, r) =>
        k2 -> r.failedCount }
      // the streamed labels mark their provenance
      streamed.values.foreach(_.column should endWith("(streamed)"))
      // a MASS-weighted ks spec must raise, not silently fold the
      // unweighted statistic (the stream state carries no masses)
      an[IllegalArgumentException] should be thrownBy
        Streaming.mergedKsCheck(spark, outKs,
          kc.copy(massColumn = Some("m")))
      // a spec whose k disagrees with the stream's stamped contract
      // raises instead of folding at the wrong precision
      an[IllegalArgumentException] should be thrownBy
        Streaming.mergedDistinctCheck(spark, outC, dc.copy(k = 32))
    } finally { qKs.stop(); qG.stop(); qC.stop(); qH.stop() }
  }

  test("transitionStream chains across micro-batches and matches the batch matrix") {
    val stream = MemoryStream[Streaming.TypedEvent](spark)
    val q = Streaming.transitionStream(stream.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1 batch 1: a(10), b(20) — out-of-order arrival inside the batch
      stream.addData(Streaming.TypedEvent(1L, 20L, 2L, "b"),
        Streaming.TypedEvent(1L, 10L, 1L, "a"),
        Streaming.TypedEvent(2L, 10L, 3L, "a"))
      q.processAllAvailable()
      // u1 batch 2: a(30) — must chain from the b held in state
      stream.addData(Streaming.TypedEvent(1L, 30L, 4L, "a"),
        Streaming.TypedEvent(2L, 20L, 5L, "a"))
      q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.ops.Sessions.transitionMatrix(
        Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 4L, "a"),
          (2L, 10L, 3L, "a"), (2L, 20L, 5L, "a"))
          .toDF("user_id", "ts_us", "event_id", "event_type"),
        "user_id", "ts_us", "event_id", "event_type").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
      streamed shouldBe batch
      streamed(("b", "a")) shouldBe 1L // the cross-batch chain
    } finally q.stop()
  }

  test("transitionStreamBuffered: a late event inside the delay matches the batch matrix") {
    val stream = MemoryStream[Streaming.TypedEvent](spark)
    // 15 s reorder buffer (event times in seconds-as-µs)
    val q = Streaming.transitionStreamBuffered(stream.toDS(), 15000000L)
      .writeStream.format("memory").queryName("trans_buf_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(key: Long, sec: Long, tie: Long, typ: String) =
        Streaming.TypedEvent(key, sec * 1000000L, tie, typ)
      // batch 1: a(10s) and c(30s) — b is missing
      stream.addData(ev(1L, 10L, 1L, "a"), ev(1L, 30L, 3L, "c"))
      q.processAllAvailable()
      // batch 2: b(20s) arrives LATE — after c — but within the 15 s
      // delay (watermark is 30−15 = 15 s < 20 s). The unbuffered variant
      // would chain c→b; the buffer must reorder it to a→b→c.
      stream.addData(ev(1L, 20L, 2L, "b"))
      q.processAllAvailable()
      // batch 3: d(50s) — advances nothing yet (watermark still 15 s)
      stream.addData(ev(1L, 50L, 4L, "d"))
      q.processAllAvailable()
      // watermark advances on OTHER keys' data: key 1 flushes via the
      // event-time timeout path, no new key-1 rows needed
      stream.addData(ev(9L, 100L, 5L, "z"))
      q.processAllAvailable()
      stream.addData(ev(9L, 200L, 6L, "z"))
      q.processAllAvailable()
      val streamed = spark.table("trans_buf_out").as[Streaming.Transition]
        .collect().filter(_.key == 1L).map(t => (t.from_type, t.to_type))
      // emitted so far: everything with ts <= final watermark (185 s) —
      // the full key-1 chain, in event-time order despite b's late arrival
      streamed.toSeq shouldBe Seq(
        ("^", "a"), ("a", "b"), ("b", "c"), ("c", "d"))
      val batch = graft.ops.Sessions.transitionMatrix(
        Seq((1L, 10000000L, 1L, "a"), (1L, 20000000L, 2L, "b"),
          (1L, 30000000L, 3L, "c"), (1L, 50000000L, 4L, "d"))
          .toDF("user_id", "ts_us", "event_id", "event_type"),
        "user_id", "ts_us", "event_id", "event_type").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
      streamed.groupBy(identity).view.mapValues(_.size.toLong).toMap shouldBe batch
    } finally q.stop()
  }

  test("cdcApplyStream maintains a bucket-partitioned snapshot across batches") {
    val snap = Files.createTempDirectory("graft_cdc").toString + "/s"
    val chk = Files.createTempDirectory("graft_cdc_chk").toString
    // change rows in the snapshotDiff(emitValues) shape
    val stream = MemoryStream[(Long, String, Double)](spark)
    val changes = stream.toDF().toDF("k", "status", "price")
    val q = Streaming.cdcApplyStream(changes, keyCols = Seq("k"),
      valueCols = Seq("price"), nBuckets = 4, snap, chk)
    try {
      // batch 1: three inserts
      stream.addData((1L, "added", 10.0), (2L, "added", 20.0),
        (3L, "added", 30.0))
      q.processAllAvailable()
      spark.read.parquet(snap).count() shouldBe 3L
      // batch 2: update k=2, remove k=3, insert k=4
      stream.addData((2L, "changed", 21.0), (3L, "removed", 0.0),
        (4L, "added", 40.0))
      q.processAllAvailable()
      val out = spark.read.parquet(snap)
        .select("k", "price").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      out shouldBe Map(1L -> 10.0, 2L -> 21.0, 4L -> 40.0)
      // the snapshot is bucket-partitioned (pure function of the key)
      val fs = new org.apache.hadoop.fs.Path(snap)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(snap))
        .exists(st => st.isDirectory &&
          st.getPath.getName.startsWith("bucket=")) shouldBe true
      // streamed final state ≡ batch applyChangeSet of the same change sets
      val prev = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "price")
      val batch2 = Seq((2L, "changed", 21.0, 1L), (3L, "removed", 0.0, 1L),
        (4L, "added", 40.0, 1L)).toDF("k", "status", "price", "pad")
      val expect = graft.quality.Reconciliation.applyChangeSet(
        prev, batch2, Seq("k"), Seq("price"))
      spark.read.parquet(snap).select("k", "price")
        .exceptAll(expect).count() shouldBe 0L
      expect.exceptAll(spark.read.parquet(snap).select("k", "price"))
        .count() shouldBe 0L
    } finally q.stop()
  }

  test("capStream: per-key cap persists across triggers, event-time ranked") {
    import graft.streaming.Streaming.CapEvent
    val stream = MemoryStream[CapEvent](spark)
    val q = Streaming.capStream(stream.toDS(), maxPerKey = 2)
      .writeStream.format("memory").queryName("capped")
      .outputMode(OutputMode.Append()).start()
    try {
      // trigger 1: key 1 floods with 3 events — lowest two (ts, tie) win
      stream.addData(
        CapEvent(1L, 30L, 0L, 3.0), CapEvent(1L, 10L, 0L, 1.0),
        CapEvent(1L, 20L, 0L, 2.0), CapEvent(2L, 5L, 0L, 9.0))
      q.processAllAvailable()
      // trigger 2: key 1 is full (even an EARLIER event is dropped — the
      // documented cross-trigger contract); key 2 has room
      stream.addData(CapEvent(1L, 1L, 0L, 0.5), CapEvent(2L, 6L, 0L, 8.0))
      q.processAllAvailable()
      val got = spark.table("capped").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      got shouldBe Set((1L, 1.0), (1L, 2.0), (2L, 9.0), (2L, 8.0))
    } finally q.stop()
  }

  test("timeBoundJoinStream matches the batch range-join on the same frames") {
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 00:$m:00")
    val impressions = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val li = impressions.toDF().toDF("key", "ts", "ad")
    val rc = clicks.toDF().toDF("key", "ts", "cost")
    val joined = Streaming.timeBoundJoinStream(li, rc,
      "key", "ts", maxDelay = "10 minutes",
      leftWatermark = "30 minutes", rightWatermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("tb_join")
      .outputMode(OutputMode.Append()).start()
    try {
      impressions.addData(
        (1L, t("01"), "adA"), // clicked at :05 (in window) and :20 (out)
        (1L, t("18"), "adB"), // clicked at :20 (in window)
        (2L, t("01"), "adC")) // clicked on key 1 only — no match
      clicks.addData((1L, t("05"), 0.5), (1L, t("20"), 0.7))
      q.processAllAvailable()
      val got = spark.table("tb_join")
        .select("key", "ad", "right_cost").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      got shouldBe Set((1L, "adA", 0.5), (1L, "adB", 0.7))
      // the exact same op on the same frames as BATCH range-join
      val bi = Seq((1L, t("01"), "adA"), (1L, t("18"), "adB"),
        (2L, t("01"), "adC")).toDF("key", "ts", "ad")
      val bc = Seq((1L, t("05"), 0.5), (1L, t("20"), 0.7))
        .toDF("key", "ts", "cost")
      val batch = bi.join(
        bc.toDF("bkey", "bts", "cost"),
        col("key") === col("bkey") && col("bts") >= col("ts") &&
          col("bts") <= col("ts") + expr("interval 10 minutes"))
        .select("key", "ad", "cost").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      got shouldBe batch
    } finally q.stop()
  }

  test("attributionStreamBuffered == batch lastTouch despite late arrival") {
    val stream = MemoryStream[Streaming.TypedEvent](spark)
    val q = Streaming.attributionStreamBuffered(stream.toDS(),
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowUs = 15000000L, delayUs = 15000000L)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(key: Long, sec: Long, tie: Long, typ: String) =
        Streaming.TypedEvent(key, sec * 1000000L, tie, typ)
      // view@10 and purchase@30 arrive; click@20 arrives LATE (after the
      // purchase) but within the 15 s delay — the buffer must reorder it
      // ahead of the purchase, which then credits 'click' like batch
      stream.addData(ev(1L, 10L, 1L, "view"), ev(1L, 30L, 3L, "purchase"))
      q.processAllAvailable()
      stream.addData(ev(1L, 20L, 2L, "click"))
      q.processAllAvailable()
      // purchase@50: click@20 is outside the 15 s window -> direct
      stream.addData(ev(1L, 50L, 4L, "purchase"))
      q.processAllAvailable()
      // watermark advances on OTHER keys' data; key 1 flushes via the
      // event-time timeout path
      stream.addData(ev(9L, 100L, 5L, "view"))
      q.processAllAvailable()
      stream.addData(ev(9L, 200L, 6L, "view"))
      q.processAllAvailable()
      val streamed = spark.table("attr_out").as[Streaming.Attribution]
        .collect().filter(_.key == 1L).sortBy(_.convTie)
        .map(a => (a.convTie, a.attributedType, a.touchTsUs)).toSeq
      streamed shouldBe Seq(
        (3L, "click", Some(20000000L)), (4L, "direct", None))
      // ≡ the batch operator on the same event set
      val batch = graft.ops.Sessions.lastTouchAttribution(
        Seq((1L, 10000000L, 1L, "view"), (1L, 20000000L, 2L, "click"),
          (1L, 30000000L, 3L, "purchase"), (1L, 50000000L, 4L, "purchase"))
          .toDF("user_id", "ts_us", "event_id", "event_type"),
        "user_id", "ts_us", "event_id", "event_type", "purchase",
        Seq("view", "click"), 15000000L)
        .orderBy("event_id").collect()
        .map(r => (r.getAs[Long]("event_id"),
          r.getAs[String]("attributed_type"),
          Option(r.getAs[Any]("touch_ts_us")).map(_.asInstanceOf[Long])))
        .toSeq
      streamed shouldBe batch
    } finally q.stop()
  }

  test("cdcApplyStream drops buckets emptied by removals (no resurrection)") {
    val snap = Files.createTempDirectory("graft_cdc_empty").toString + "/s"
    val chk = Files.createTempDirectory("graft_cdc_empty_chk").toString
    val stream = MemoryStream[(Long, String, Double)](spark)
    val changes = stream.toDF().toDF("k", "status", "price")
    val q = Streaming.cdcApplyStream(changes, keyCols = Seq("k"),
      valueCols = Seq("price"), nBuckets = 4, snap, chk)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("price", org.apache.spark.sql.types.DoubleType)
    try {
      // batch 1: one key → exactly one bucket dir
      stream.addData((1L, "added", 10.0))
      q.processAllAvailable()
      spark.read.schema(schema).parquet(snap).count() shouldBe 1L
      // batch 2: remove it — the applied frame is EMPTY, so dynamic
      // overwrite rewrites nothing; before the r14 fix the stale dir
      // survived and k=1 was resurrected on the next read
      stream.addData((1L, "removed", 0.0))
      q.processAllAvailable()
      spark.read.schema(schema).parquet(snap).count() shouldBe 0L
      // batch 3: fresh key — the resurrected k=1 would reappear here
      stream.addData((2L, "added", 20.0))
      q.processAllAvailable()
      spark.read.schema(schema).parquet(snap)
        .select("k", "price").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe
        Map(2L -> 20.0)
    } finally q.stop()
  }

  test("cdcApplyStream collapses multi-change-per-key batches latest-wins") {
    val snap = Files.createTempDirectory("graft_cdc_multi").toString + "/s"
    val chk = Files.createTempDirectory("graft_cdc_multi_chk").toString
    val stream = MemoryStream[(Long, String, Double, Long)](spark)
    val changes = stream.toDF().toDF("k", "status", "price", "ts")
    val q = Streaming.cdcApplyStream(changes, keyCols = Seq("k"),
      valueCols = Seq("price"), nBuckets = 4, snap, chk,
      orderCols = Seq("ts"))
    try {
      // batch 1: burst — k=1 added then changed twice; k=2 added then
      // removed; k=3 a single add
      stream.addData(
        (1L, "added", 10.0, 1L), (1L, "changed", 11.0, 2L),
        (1L, "changed", 12.0, 3L),
        (2L, "added", 20.0, 1L), (2L, "removed", 0.0, 2L),
        (3L, "added", 30.0, 1L))
      q.processAllAvailable()
      val after1 = spark.read.parquet(snap)
        .select("k", "price").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      after1 shouldBe Map(1L -> 12.0, 3L -> 30.0)
      // batch 2: k=1 removed then re-added (net: added with new value);
      // k=3 changed then removed (net: gone)
      stream.addData(
        (1L, "removed", 0.0, 4L), (1L, "added", 13.0, 5L),
        (3L, "changed", 31.0, 4L), (3L, "removed", 0.0, 5L))
      q.processAllAvailable()
      // ROW list, not a map: a netted removed→added once DUPLICATED the
      // key next to its surviving old row, and `.toMap` silently picked
      // one of the two at parquet row order's whim (a 50% flake) — the
      // multiset compare is what actually pins the upsert semantics
      val got = spark.read.parquet(snap)
        .select("k", "price").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      // ≡ batch applyChangeSet of the per-key-collapsed change sets,
      // applied sequentially; the stream rewrites a netted 'added' to
      // 'changed' (upsert) because the key may still exist in prev
      val prev = Seq((1L, 12.0), (3L, 30.0)).toDF("k", "price")
      val collapsed2 = Seq((1L, "changed", 13.0), (3L, "removed", 0.0))
        .toDF("k", "status", "price")
      val expect = graft.quality.Reconciliation.applyChangeSet(
        prev, collapsed2, Seq("k"), Seq("price"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      got shouldBe expect
      got shouldBe Seq((1L, 13.0))
    } finally q.stop()
  }

  test("attributionStreamBuffered drops a quiet key's state once its touch expires") {
    // key 1 touches once then goes silent forever; once the watermark
    // passes touch + window no admissible conversion can credit it, so
    // its state must be REMOVED (the leak: update without a timeout left
    // the key in the store for the life of the stream)
    val stream = MemoryStream[Streaming.TypedEvent](spark)
    val q = Streaming.attributionStreamBuffered(stream.toDS(),
        conversionType = "purchase", touchTypes = Seq("view"),
        windowUs = 15000000L, delayUs = 15000000L)
      .writeStream.format("memory").queryName("attr_state")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(key: Long, sec: Long, tie: Long, typ: String) =
        Streaming.TypedEvent(key, sec * 1000000L, tie, typ)
      stream.addData(ev(1L, 10L, 1L, "view"))
      q.processAllAvailable()
      // key 9 drives the watermark far past key 1's touch@10s + 15s window
      stream.addData(ev(9L, 100L, 2L, "view"))
      q.processAllAvailable()
      stream.addData(ev(9L, 200L, 3L, "view"))
      q.processAllAvailable()
      stream.addData(ev(9L, 300L, 4L, "view"))
      q.processAllAvailable()
      // only key 9 (still live) may hold state; key 1 must be gone
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum shouldBe 1L
    } finally q.stop()
  }

  test("attributionStreamBuffered state stays flat under churning keys (soak)") {
    // The long-run posture of the r15 leak fix: every round brings 10
    // FRESH keys (each converting once) and never returns — a stream
    // whose distinct-key count grows without bound. With the event-time
    // timeout the store holds only keys whose window the watermark
    // hasn't passed; without it, state rows grow with every round.
    val stream = MemoryStream[Streaming.TypedEvent](spark)
    val q = Streaming.attributionStreamBuffered(stream.toDS(),
        conversionType = "purchase", touchTypes = Seq("view"),
        windowUs = 15000000L, delayUs = 15000000L)
      .writeStream.format("memory").queryName("attr_soak")
      .outputMode(OutputMode.Append()).start()
    try {
      def ev(key: Long, sec: Long, tie: Long, typ: String) =
        Streaming.TypedEvent(key, sec * 1000000L, tie, typ)
      val rounds = 10
      val perRound = 10
      val stateSizes = (1 to rounds).map { r =>
        // round r: keys r*100+k touch at t=100r and convert 5 s later —
        // 100 s between rounds pushes the watermark (delay 15 s) far past
        // the previous round's touch+window, expiring its keys
        val t = 100L * r
        stream.addData((0 until perRound).flatMap { k =>
          val key = r * 100L + k
          Seq(ev(key, t, r * 1000L + k * 2L, "view"),
            ev(key, t + 5L, r * 1000L + k * 2L + 1L, "purchase"))
        }: _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
      // two watermark-advancing batches flush the final round's buffer
      stream.addData(ev(999999L, 100L * (rounds + 2), 999998L, "view"))
      q.processAllAvailable()
      stream.addData(ev(999999L, 100L * (rounds + 4), 999999L, "view"))
      q.processAllAvailable()
      // every conversion credited (nothing lost to the state cleanup)
      spark.table("attr_soak").as[Streaming.Attribution].collect()
        .count(_.attributedType == "view") shouldBe (rounds * perRound)
      // flat, not cumulative: the store never holds more than ~2 rounds
      // of live keys, and the LAST round's footprint equals the first's
      // (a leak would show 10 rounds ≈ 100+ rows by now)
      stateSizes.max should be <= (2L * perRound)
      stateSizes.last should be <= stateSizes.head
    } finally q.stop()
  }
}

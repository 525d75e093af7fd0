package graft.streaming

import graft.SparkSpec
import graft.config.{DedupeSpec, DerivedColumn, SilverSpec}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}

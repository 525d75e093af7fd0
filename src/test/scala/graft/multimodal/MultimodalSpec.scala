package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("feature extraction runs per-partition and is deterministic") {
    val ds = Multimodal.synthetic(spark, 30)
    val a = Multimodal.extractFeatures(ds).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(Multimodal.synthetic(spark, 30))
      .orderBy("media_id").collect()
    a should have length 30
    a.map(_.feature_hash).toSeq shouldBe b.map(_.feature_hash).toSeq
    all(a.map(_.size_bytes)) should be >= 128L
  }

  test("frame sampling plan strides over video frames only") {
    val feats = Multimodal.extractFeatures(Multimodal.synthetic(spark, 30))
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    plan.select("media_id").distinct().count() shouldBe 10 // every 3rd row is video
    val one = plan.where("media_id = 2").collect().map(_.getAs[Int]("frame_idx"))
    one.toSeq shouldBe one.toSeq.sorted
    all(one.toSeq.map(_ % 10)) shouldBe 0
  }

  test("repartitionBySize targets a byte budget, not a row count") {
    val df = Multimodal.synthetic(spark, 64).toDF()
    val out = Multimodal.repartitionBySize(df, "payload", bytesPerPartition = 8192)
    out.rdd.getNumPartitions should be >= 4
    out.count() shouldBe 64
  }

  test("resize stub rewrites payloads per partition toward the pixel budget") {
    val ds = Multimodal.synthetic(spark, 10)
    val out = Multimodal.resizeStub(ds, 64, 64).collect()
    out should have length 10
    all(out.map(_.payload.length)) should be <= 64 * 64 / 64
    // deterministic: same input → same resized bytes
    val again = Multimodal.resizeStub(Multimodal.synthetic(spark, 10), 64, 64).collect()
    out.map(_.payload.toSeq) shouldBe again.map(_.payload.toSeq)
  }

  test("withMetadata computes payload metadata without touching rows") {
    val df = Multimodal.synthetic(spark, 5).toDF()
    val out = Multimodal.withMetadata(df, "payload")
    val r = out.selectExpr("media_meta.size_bytes", "media_meta.content_hash").head()
    r.getLong(0) should be >= 128L
    r.getString(1) should fullyMatch regex "[0-9a-f]{32}"
  }
}

package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def users(n: Int) =
    (0 until n).map(i => (i.toLong % 7, s"user${i % 97}")).toDF("grp", "uid")

  test("merged per-part sketches estimate IDENTICALLY to a one-shot sketch") {
    // union is register-wise max — lossless for one lgK, so the
    // incremental path must give exactly the one-shot answer, not "close"
    val df = users(500).withColumn("part", col("grp") % 3)
    val perPart = Sketches.distinctSketches(df, Seq("grp", "part"), "uid")
    val merged = Sketches.mergeSketches(perPart, Seq("grp"))
      .select(col("grp"), Sketches.estimate(col("sketch")).as("est"))
    val oneShot = Sketches.distinctSketches(df, Seq("grp"), "uid")
      .select(col("grp"), Sketches.estimate(col("sketch")).as("est"))
    merged.orderBy("grp").collect().toSeq shouldBe
      oneShot.orderBy("grp").collect().toSeq
  }

  test("sketch state survives a parquet round-trip (the persisted-batch loop)") {
    val df = users(300)
    val dir = java.nio.file.Files.createTempDirectory("sketches").toString
    Sketches.distinctSketches(df, Seq("grp"), "uid")
      .write.mode("overwrite").parquet(dir)
    val reloaded = Sketches.mergeSketches(spark.read.parquet(dir), Seq("grp"))
      .select(col("grp"), Sketches.estimate(col("sketch")).as("est"))
    val direct = Sketches.distinctSketches(df, Seq("grp"), "uid")
      .select(col("grp"), Sketches.estimate(col("sketch")).as("est"))
    reloaded.orderBy("grp").collect().toSeq shouldBe
      direct.orderBy("grp").collect().toSeq
  }

  test("cardinalityAudit: estimate within tolerance of the exact count") {
    val out = Sketches.cardinalityAudit(users(1000), Seq("grp"), "uid")
      .collect()
    out should have length 7
    out.foreach { r =>
      r.getAs[Boolean]("within_tol") shouldBe true
      // at this cardinality (≤97) HLL runs in its exact sparse mode
      r.getAs[Long]("n_est") shouldBe r.getAs[Long]("n_exact")
    }
  }

  test("mergeSketches with mismatched lgK fails loudly, never degrades silently") {
    val df = users(200)
    val fine = Sketches.distinctSketches(df, Seq("grp"), "uid", lgK = 12)
    val coarse = Sketches.distinctSketches(df, Seq("grp"), "uid", lgK = 10)
    val err = intercept[Exception] {
      Sketches.mergeSketches(fine.union(coarse), Seq("grp")).collect()
    }
    err.getMessage.toLowerCase should include("lgconfigk")
  }
}

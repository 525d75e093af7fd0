package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as typed `mapPartitions`
  * stages (the JVM analogue of Pandas-UDF batch processing — one decoder
  * context per partition, streaming iterator, no per-row setup).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. The Spark-side contract — schema, encoders, partition
  * sizing, batch iteration — is real and tested; swapping the stub for a
  * JNI/ffmpeg decoder changes one function.
  *
  * Scale notes: binary payloads dominate row size, so `repartitionBySize`
  * targets a byte budget per task (not a row count) to keep executor memory
  * flat; metadata-only transforms `select` around the binary column so the
  * payload bytes are never shuffled unless the payload itself moves.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      format: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      size_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature_hash: Long)

  /** STUB decoder — deterministic fake of the real codec: dimensions and a
    * feature hash derived from the payload bytes. A real build replaces the
    * body with e.g. an ImageIO/ffmpeg call; the signature and the
    * partition-batch calling convention stay identical. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val h = r.payload.foldLeft(1469598103934665603L)((acc, b) =>
      (acc ^ (b & 0xffL)) * 1099511628211L) // FNV-1a, deterministic
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val frames = if (r.kind == "video") 1 + (math.abs(h >> 20) % 300).toInt else 1
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, ht, frames, h)
  }

  /** Batch feature extraction: one decoder context per partition, rows
    * streamed through it — the mapInPandas/mapPartitions shape. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: open codec context here, close after the iterator drains
      it.map(decodeStub)
    }
  }

  /** STUB resize — the payload-rewriting shape: a real implementation
    * decodes, scales to (w, h), and re-encodes per partition; the stub
    * deterministically derives a "resized" payload (truncated to the target
    * pixel budget) so the plumbing — payload in, payload out, metadata
    * updated, executed per partition — is real and testable. */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0, "target dimensions must be positive")
    ds.mapPartitions { it =>
      // real impl: one scaler context per partition
      it.map { r =>
        val budget = math.max(16, math.min(r.payload.length, w * h / 64))
        r.copy(payload = java.util.Arrays.copyOf(r.payload, budget))
      }
    }
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index. Metadata-only — the binary column is not touched. */
  def frameSamplePlan(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    import features.sparkSession.implicits._
    features.filter(_.kind == "video")
      .select(col("media_id"), col("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
  }

  /** Partition the payload table by a byte budget per task: binary rows are
    * wildly skewed in size, so row-count partitioning under/overshoots
    * executor memory. One pass computes total bytes; the repartition count
    * targets `bytesPerPartition`. */
  def repartitionBySize(df: DataFrame, payloadCol: String,
      bytesPerPartition: Long): DataFrame = {
    val total = df.agg(sum(length(col(payloadCol)).cast("long"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(total.toDouble / bytesPerPartition).toInt)
    df.repartition(parts)
  }

  /** Attach typed metadata (a struct column) without moving payload bytes. */
  def withMetadata(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(payloadCol)).cast("long").as("size_bytes"),
      md5(col(payloadCol)).as("content_hash")))

  /** Synthesize a deterministic media table for tests/benchmarks (payload =
    * seeded pseudo-random bytes; real pipelines read object-store files). */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val bytes = new Array[Byte](128 + rnd.nextInt(1024))
      rnd.nextBytes(bytes)
      MediaRecord(i, kind, bytes, if (kind == "image") "png" else "bin")
    }
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as typed `mapPartitions`
  * stages (the JVM analogue of Pandas-UDF batch processing — one decoder
  * context per partition, streaming iterator, no per-row setup).
  *
  * IMAGES are REALLY decoded and resized via `javax.imageio` (PNG/JPEG/GIF/
  * BMP ship with the JDK). AUDIO metadata is REALLY parsed via
  * `javax.sound.sampled` (WAV/AIFF/AU headers ship with the JDK — no codec
  * needed). Video codec work is STUBBED (no ffmpeg in this build):
  * `decodeStub` derives deterministic fake dimensions/features from the
  * bytes, with the same schema, encoders, partition sizing, and batch
  * iteration as the real path — swapping in a JNI/ffmpeg decoder changes
  * one function.
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

  private def fnv(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((acc, b) =>
      (acc ^ (b & 0xffL)) * 1099511628211L) // FNV-1a, deterministic

  /** STUB decoder — deterministic fake of the real codec: dimensions and a
    * feature hash derived from the payload bytes. The audio/video fallback
    * (no codec libraries in this build); the signature and the
    * partition-batch calling convention match the real image path. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val h = fnv(r.payload)
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    val frames = if (r.kind == "video") 1 + (math.abs(h >> 20) % 300).toInt else 1
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, ht, frames, h)
  }

  /** REAL audio metadata via `javax.sound.sampled.AudioSystem` — a pure
    * header parse (WAV/AIFF/AU readers ship with the JDK, no codec needed),
    * mapped into the shared MediaFeatures layout: sample rate (Hz) → width,
    * channels → height, PCM frame count → n_frames. Unparseable payloads
    * fall back to the stub, same contract as the image path. */
  private def decodeAudio(r: MediaRecord): MediaFeatures = {
    val fmt =
      try javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(r.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (fmt == null) decodeStub(r)
    else MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
      fmt.getFormat.getSampleRate.toInt, fmt.getFormat.getChannels,
      math.max(fmt.getFrameLength, 0), // NOT_SPECIFIED (-1) → 0
      fnv(r.payload))
  }

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP ship with the
    * JDK): actual pixel dimensions from the decoded image. Audio goes
    * through the JDK header parse (`decodeAudio`); undecodable payloads and
    * video (no JDK codec) fall back to the stub. The catch is NonFatal, not
    * just IOException: a corrupt JPEG surfaces as CMMException /
    * IllegalArgumentException from the color-management layer, and one bad
    * row must not kill a 100 TB job. */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.kind == "audio") decodeAudio(r)
    else if (r.kind != "image") decodeStub(r)
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) decodeStub(r)
      else MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
        img.getWidth, img.getHeight, 1, fnv(r.payload))
    }

  /** Batch feature extraction: one decoder context per partition, rows
    * streamed through it — the mapInPandas/mapPartitions shape. Images are
    * REALLY decoded (ImageIO); audio/video use the deterministic stub. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // codec contexts (ImageIO readers) are JVM-static; a pooled decoder
      // would open here and close after the iterator drains
      it.map(decode)
    }
  }

  /** Resize — REAL for images (decode → Graphics2D bilinear scale →
    * re-encode PNG, per partition); audio/video keep the stub payload
    * truncation (no JDK codec) so the partition-level plumbing — payload in,
    * payload out — is exercised for every kind. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    require(w > 0 && h > 0, "target dimensions must be positive")
    ds.mapPartitions { it =>
      it.map { r =>
        val decoded =
          if (r.kind != "image") null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case scala.util.control.NonFatal(_) => null } // CMMException etc., see decode
        if (decoded == null) { // stub path: truncate to the pixel budget
          val budget = math.max(16, math.min(r.payload.length, w * h / 64))
          r.copy(payload = java.util.Arrays.copyOf(r.payload, budget))
        } else {
          val scaled = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(decoded, 0, 0, w, h, null)
          g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", out)
          r.copy(payload = out.toByteArray, format = "png")
        }
      }
    }
  }

  /** Back-compat alias for the pre-decode builds. */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    resize(ds, w, h)

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

  /** A deterministic real PNG: seeded pseudo-random RGB pixels at (w, h). */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(0xffffff))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A deterministic real WAV: seeded pseudo-random 16-bit PCM samples. */
  def syntheticWav(seed: Long, frames: Int, sampleRate: Float = 8000f,
      channels: Int = 1): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val data = new Array[Byte](frames * channels * 2) // 16-bit PCM
    rnd.nextBytes(data)
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Synthesize a deterministic media table for tests/benchmarks. Image rows
    * carry REAL PNG payloads and audio rows REAL WAV payloads (so the
    * ImageIO decode and header-parse paths are genuinely exercised); video
    * rows carry seeded pseudo-random bytes for the stub path. */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      if (kind == "image")
        MediaRecord(i, kind,
          syntheticPng(i, 2 + (i % 14).toInt, 2 + (i % 9).toInt), "png")
      else if (kind == "audio")
        MediaRecord(i, kind,
          syntheticWav(i, 64 + (i % 512).toInt,
            channels = 1 + (i % 2).toInt), "wav")
      else {
        val rnd = new scala.util.Random(i)
        val bytes = new Array[Byte](128 + rnd.nextInt(1024))
        rnd.nextBytes(bytes)
        MediaRecord(i, kind, bytes, "bin")
      }
    }
  }
}

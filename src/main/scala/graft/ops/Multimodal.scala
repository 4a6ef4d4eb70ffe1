package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling: image/audio/video (and the reference's `.pt`
  * tensors, data_loader.py:128-135) are opaque `binary` columns with typed
  * metadata. The IMAGE path decodes for real ([[decodeImage]], JDK ImageIO —
  * PNG/JPEG/BMP/GIF, no external libs), and so does AUDIO ([[decodeWav]],
  * JDK `javax.sound.sampled` — WAV/PCM, no ffmpeg needed). Only VIDEO,
  * whose codecs genuinely aren't in this environment, keeps the
  * clearly-marked DETERMINISTIC STUB `decodeStub`; at deploy time swap it
  * for the real codec with the same `Array[Byte] => Array[Float]` signature.
  *
  * Scale design: decode is a narrow map (no shuffle); `repartition(n)` before
  * decode spreads large media files across executors; decoded features are
  * columnar Array[Float], so downstream similarity/dedup operators apply
  * unchanged.
  */
object Multimodal {

  val FeatureDim = 16

  /** DETERMINISTIC STUB codec (video-only — image and audio decode for
    * real above): derives FeatureDim floats from the first bytes (real
    * impl: frame demux + model forward). Pure function of the bytes —
    * reproducible across partitionings and engines.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      val b = if (i < bytes.length) bytes(i) & 0xff else 0
      out(i) = b / 255.0f
      i += 1
    }
    out
  }

  private val decodeUdf = udf(decodeStub _)

  /** REAL image codec — no stub: the JDK ships `javax.imageio` (PNG, JPEG,
    * BMP, GIF), so the image modality decodes for real even in this
    * container. decode → bilinear resize to (w, h) → channel-major
    * normalized floats [R(w·h) | G(w·h) | B(w·h)], the tensor layout a
    * vision model expects. Returns null for bytes no reader accepts (the
    * usual corrupt-sample row; filter on `features IS NOT NULL`).
    * Deterministic: pure function of (bytes, w, h).
    */
  def decodeImage(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return null
    val scaled = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val out = new Array[Float](3 * w * h)
    val n = w * h
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = scaled.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xff) / 255.0f
        out(n + i) = ((rgb >> 8) & 0xff) / 255.0f
        out(2 * n + i) = (rgb & 0xff) / 255.0f
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  private val decodeImageUdf = udf(decodeImage _)

  /** REAL audio codec — no stub: the JDK ships `javax.sound.sampled`, which
    * parses WAV containers (fmt/data chunk walk, header validation) without
    * any native library. Decodes 16-bit signed and 8-bit unsigned PCM to
    * normalized floats in [-1, 1); multi-channel frames stay interleaved
    * (flat `[L0 R0 L1 R1 …]`), the layout [[frameSample]] then thins.
    * Returns null for bytes that aren't a parseable PCM WAV (corrupt-sample
    * row; filter on `features IS NOT NULL`). Deterministic: s/32768 and
    * (s−128)/128 are exact dyadic rationals, so the decoded floats are a
    * pure bit-level function of the input bytes.
    */
  def decodeWav(bytes: Array[Byte]): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: UnsupportedAudioFileException | _: java.io.IOException => return null
      }
    try {
      val f = in.getFormat
      val bits = f.getSampleSizeInBits
      val signed16 = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && bits == 16
      val unsigned8 = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
      if (!signed16 && !unsigned8) return null
      val data = in.readAllBytes()
      if (signed16) {
        val n = data.length / 2
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          val s =
            if (f.isBigEndian) (data(2 * i) << 8) | (data(2 * i + 1) & 0xff)
            else (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
          out(i) = s / 32768.0f
          i += 1
        }
        out
      } else {
        val out = new Array[Float](data.length)
        var i = 0
        while (i < data.length) {
          out(i) = ((data(i) & 0xff) - 128) / 128.0f
          i += 1
        }
        out
      }
    } finally in.close()
  }

  private val decodeWavUdf = udf(decodeWav _)

  /** Scan a directory of media blobs → (name, length, content). */
  def scanBlobs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"),
        col("content"))

  /** Ingest: decode each blob to a feature vector; partition first so the
    * decode map parallelizes over executors, not files-per-listing.
    */
  def ingest(blobs: DataFrame, partitions: Int = 32): DataFrame =
    blobs.repartition(partitions, col("name"))
      .withColumn("features", decodeUdf(col("content")))
      .drop("content")

  /** Image ingest with the real ImageIO codec: decode + resize to (w, h)
    * on executors (narrow map after the spread repartition, same plumbing
    * as [[ingest]]).
    */
  def ingestImages(blobs: DataFrame, w: Int, h: Int, partitions: Int = 32): DataFrame =
    blobs.repartition(partitions, col("name"))
      .withColumn("features", decodeImageUdf(col("content"), lit(w), lit(h)))
      .drop("content")

  /** Audio ingest with the real `javax.sound.sampled` codec: WAV/PCM decode
    * to normalized interleaved samples on executors (narrow map after the
    * spread repartition, same plumbing as [[ingest]]).
    */
  def ingestAudio(blobs: DataFrame, partitions: Int = 32): DataFrame =
    blobs.repartition(partitions, col("name"))
      .withColumn("features", decodeWavUdf(col("content")))
      .drop("content")

  /** Frame-sample: every k-th element of a decoded sequence (video/audio
    * frame sampling analog) — pure Catalyst, no UDF.
    */
  def frameSample(features: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    filter(features, (_, i) => i % k === 0)

  /** "Resize" a feature vector to n by truncation/zero-pad (image resize
    * stub shape contract).
    */
  def resizeTo(features: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    slice(concat(features, array_repeat(lit(0.0f), n)), 1, n)
}

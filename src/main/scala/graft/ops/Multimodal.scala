package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling: image/audio/video (and the reference's `.pt`
  * tensors, data_loader.py:128-135) are opaque `binary` columns with typed
  * metadata. The IMAGE path decodes for real ([[decodeImage]], JDK ImageIO —
  * PNG/JPEG/BMP/GIF, no external libs), so does AUDIO ([[decodeWav]], JDK
  * `javax.sound.sampled` — WAV/PCM, no ffmpeg needed), and VIDEO decodes
  * for real for the one motion container the JDK ships a decoder for —
  * animated GIF ([[decodeGifFrames]]: multi-frame demux + frame sampling +
  * per-frame pooling). H.264-class codecs genuinely aren't in this
  * environment; they slot in behind the same `Array[Byte] => Array[Float]`
  * contract. The generic-blob path keeps the clearly-marked DETERMINISTIC
  * STUB `decodeStub` (an arbitrary unknown modality has no real codec by
  * definition).
  *
  * Scale design: decode is a narrow map (no shuffle); `repartition(n)` before
  * decode spreads large media files across executors; decoded features are
  * columnar Array[Float], so downstream similarity/dedup operators apply
  * unchanged.
  */
/** Decoded video: total demuxed frame count + pooled features of the
  * sampled frames (3 floats per kept frame).
  */
case class GifDecode(n_frames: Int, features: Array[Float])

object Multimodal {

  val FeatureDim = 16

  /** DETERMINISTIC STUB codec (generic unknown-modality blobs only — image,
    * audio, and GIF video decode for real above): derives FeatureDim floats
    * from the first bytes (real impl: demux + model forward). Pure function
    * of the bytes — reproducible across partitionings and engines.
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

  /** REAL video codec — no stub: ImageIO's GIF reader demuxes every frame
    * of an animated GIF (the JDK's one multi-frame motion format). Decodes
    * the frame sequence, keeps every `everyK`-th frame (temporal sampling —
    * the first thing any video pipeline does; 30 fps input, ~1 fps to the
    * model), and pools each kept frame to its mean RGB, the per-frame
    * global-average feature a vision stem produces. Output layout is
    * `[meanR_0, meanG_0, meanB_0, meanR_k, meanG_k, meanB_k, …]`,
    * normalized to [0, 1]. Channel means are exact: integer pixel sums
    * divided once in float (both operands exact), so the result is the
    * correctly-rounded rational — bit-stable across engines and
    * partitionings. Returns null when no reader accepts the bytes or a
    * frame fails to decode (corrupt-sample row; filter on
    * `features IS NOT NULL`).
    */
  def decodeGifFrames(bytes: Array[Byte], everyK: Int): GifDecode = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => return null }
    // Every exit path below runs inside try/finally: an undecodable blob
    // must still close the MemoryCacheImageInputStream, or a corpus-scale
    // scan with many corrupt samples leaks one stream per reject until GC.
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0) return null
      val feats = scala.collection.mutable.ArrayBuffer.empty[Float]
      var j = 0
      while (j < n) {
        if (j % everyK == 0) {
          val img = reader.read(j)
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val denom = (w.toLong * h * 255).toFloat
          feats += sr.toFloat / denom
          feats += sg.toFloat / denom
          feats += sb.toFloat / denom
        }
        j += 1
      }
      GifDecode(n, feats.toArray)
    } catch {
      case _: java.io.IOException | _: RuntimeException => null
    } finally {
      if (reader != null) reader.dispose()
      iis.close()
    }
  }

  private val decodeGifUdf = udf(decodeGifFrames _)

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

  /** Video ingest with the real ImageIO GIF codec: frame demux + every-k
    * temporal sampling + per-frame mean-RGB pooling on executors. Emits a
    * `decoded` struct (`n_frames` int, `features` array<float>) — null for
    * undecodable blobs.
    */
  def ingestVideo(blobs: DataFrame, everyK: Int, partitions: Int = 32): DataFrame =
    blobs.repartition(partitions, col("name"))
      .withColumn("decoded", decodeGifUdf(col("content"), lit(everyK)))
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

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
  * contract.
  *
  * The generic path ([[ingest]]) sniffs the modality from magic bytes (a
  * pure-Catalyst binary-prefix comparison, [[modality]]) and dispatches to
  * the real codec. A blob of UNKNOWN modality decodes to NULL — there is no
  * codec for it by definition, and synthesizing fake features would silently
  * pollute a training corpus at scale. Null features carry a `quarantined`
  * flag (the same convention as corrupt samples the real codecs reject), and
  * [[quarantineCounts]] is the per-modality accounting a pipeline reports.
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

  private def bin(bs: Int*): org.apache.spark.sql.Column =
    lit(bs.map(_.toByte).toArray)

  /** Modality sniff from container magic bytes — pure Catalyst (binary
    * `substring` + literal comparison, stays inside whole-stage codegen; no
    * UDF touches the blob until a real codec needs it). PNG/JPEG/BMP →
    * `image`, GIF → `video` (the JDK's multi-frame reader demuxes it;
    * single-frame GIFs just yield one frame), RIFF/WAVE → `audio`, anything
    * else → `unknown`.
    */
  def modality(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(substring(content, 1, 8) ===
        bin(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), "image")
      .when(substring(content, 1, 3) === bin(0xff, 0xd8, 0xff), "image")
      .when(substring(content, 1, 2) === bin('B', 'M'), "image")
      .when(substring(content, 1, 4) === bin('G', 'I', 'F', '8'), "video")
      .when(substring(content, 1, 4) === bin('R', 'I', 'F', 'F') &&
        substring(content, 9, 4) === bin('W', 'A', 'V', 'E'), "audio")
      .otherwise("unknown")

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

  /** Scan one or more directories of media blobs → (name, length, content). */
  /** 64-bit dHash (difference hash — THE workhorse perceptual image
    * fingerprint): bit (x, y) set iff luminance rises from column x to
    * x+1 in the (w × h) decoded plane; near-duplicate images (re-encodes,
    * slight edits) agree on most gradient signs, so small Hamming
    * distance ≈ visual similarity. Luminance is the channel SUM r+g+b
    * (same ordering as the mean, no division): for the comparison only
    * ORDER matters, and float addition of the three per-channel values —
    * identical in any engine — is strictly monotone in the underlying
    * 8-bit values (adjacent gray levels differ by ~0.012, five orders
    * above float eps at this magnitude), so the bits equal the integer
    * pixel comparisons an analytic oracle computes. Pure codegen'd
    * element_at arithmetic over the decoded plane — zero UDF after the
    * decode itself.
    */
  def dHash64(features: org.apache.spark.sql.Column, w: Int, h: Int):
      org.apache.spark.sql.Column = {
    require((w - 1) * h <= 64, s"dHash needs (w-1)*h <= 64 bits, got ${(w - 1) * h}")
    val n = w * h
    def lum(x: Int, y: Int) =
      element_at(features, y * w + x + 1) +
        element_at(features, n + y * w + x + 1) +
        element_at(features, 2 * n + y * w + x + 1)
    (for { y <- 0 until h; x <- 0 until w - 1 } yield
      when(lum(x + 1, y) > lum(x, y), lit(1L << (y * (w - 1) + x)))
        .otherwise(lit(0L)))
      .reduce(_ + _) // disjoint bits: the sum IS the bitwise OR
  }

  /** Banded Hamming pairs over perceptual hashes — IMAGE near-dup dedup,
    * the multimodal member of the dedup family (text: MinHash/SimHash in
    * [[Dedup]]). Same plan shape as `Dedup.simhashPairs`: each hash
    * explodes into four 16-bit bands, candidates meet on an equal band
    * (pigeonhole: any pair within Hamming 3 shares a band; wider radii
    * trade recall exactly like text SimHash), exact Hamming filters.
    * Never all-pairs — the band is the join/shuffle key at any corpus
    * size.
    */
  def phashPairs(imgs: DataFrame, hashCol: String, idCol: String,
      maxHamming: Int): DataFrame = {
    val bands = imgs.select(col(idCol).as("_id"), col(hashCol).as("_h"))
      .select(col("_id"), col("_h"), posexplode(array(
        (0 until 4).map(b =>
          shiftright(col("_h"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bkey")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._h").as("_ha"), col("b._h").as("_hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(_ha ^ _hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def scanBlobs(spark: SparkSession, dirs: String*): DataFrame =
    spark.read.format("binaryFile").load(dirs: _*)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"),
        col("content"))


  /** Resolve a partition-count arg: explicit when > 0, else the session's
    * shuffle parallelism — a hardcoded constant caps the decode spread at
    * N/const files per task no matter how big the cluster is (the
    * globalRowNumber discipline, ops/Split.scala).
    */
  private def spreadParts(df: DataFrame, partitions: Int): Int =
    if (partitions > 0) partitions
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Generic ingest: sniff the modality from magic bytes and dispatch to the
    * REAL codec for it (image → [[decodeImage]] at (w, h); audio →
    * [[decodeWav]]; video → [[decodeGifFrames]] every-`everyK` pooled
    * frames). Unknown modalities — and blobs a codec rejects — yield NULL
    * features and `quarantined = true`; no synthetic values ever enter the
    * feature column. Partition first so the decode map parallelizes over
    * executors, not files-per-listing.
    */
  def ingest(blobs: DataFrame, partitions: Int = -1, w: Int = 4, h: Int = 3,
      everyK: Int = 2): DataFrame =
    blobs.repartition(spreadParts(blobs, partitions), col("name"))
      .withColumn("modality", modality(col("content")))
      .withColumn("features",
        when(col("modality") === "image",
          decodeImageUdf(col("content"), lit(w), lit(h)))
          .when(col("modality") === "audio", decodeWavUdf(col("content")))
          .when(col("modality") === "video",
            decodeGifUdf(col("content"), lit(everyK)).getField("features"))
          .otherwise(lit(null).cast(ArrayType(FloatType))))
      .withColumn("quarantined", col("features").isNull)
      .drop("content")

  /** Per-modality corpus-hygiene accounting over an [[ingest]] result: how
    * many blobs arrived, how many were quarantined (unknown modality or
    * codec-rejected). Map-side partial aggregation; one tiny shuffled row
    * per modality, so it costs a scan at any corpus size.
    */
  def quarantineCounts(ingested: DataFrame): DataFrame =
    ingested.groupBy("modality").agg(
      count(lit(1)).as("n_blobs"),
      count(when(col("quarantined"), 1)).as("n_quarantined"))

  /** Image ingest with the real ImageIO codec: decode + resize to (w, h)
    * on executors (narrow map after the spread repartition, same plumbing
    * as [[ingest]]).
    */
  def ingestImages(blobs: DataFrame, w: Int, h: Int, partitions: Int = -1): DataFrame =
    blobs.repartition(spreadParts(blobs, partitions), col("name"))
      .withColumn("features", decodeImageUdf(col("content"), lit(w), lit(h)))
      .drop("content")

  /** Audio ingest with the real `javax.sound.sampled` codec: WAV/PCM decode
    * to normalized interleaved samples on executors (narrow map after the
    * spread repartition, same plumbing as [[ingest]]).
    */
  def ingestAudio(blobs: DataFrame, partitions: Int = -1): DataFrame =
    blobs.repartition(spreadParts(blobs, partitions), col("name"))
      .withColumn("features", decodeWavUdf(col("content")))
      .drop("content")

  /** Video ingest with the real ImageIO GIF codec: frame demux + every-k
    * temporal sampling + per-frame mean-RGB pooling on executors. Emits a
    * `decoded` struct (`n_frames` int, `features` array<float>) — null for
    * undecodable blobs.
    */
  def ingestVideo(blobs: DataFrame, everyK: Int, partitions: Int = -1): DataFrame =
    blobs.repartition(spreadParts(blobs, partitions), col("name"))
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

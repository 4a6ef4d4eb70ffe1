package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val (r, g, b) = rgb
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage round-trips a PNG at identity size, channel-major") {
    val f = Multimodal.decodeImage(pngBytes(4, 3, (255, 0, 51)), 4, 3)
    assert(f.length == 36)
    assert(f.slice(0, 12).forall(_ == 1.0f))          // R plane
    assert(f.slice(12, 24).forall(_ == 0.0f))         // G plane
    assert(f.slice(24, 36).forall(_ == 51 / 255.0f))  // B plane
  }

  test("decodeImage resize is deterministic and corrupt bytes decode to null") {
    val big = pngBytes(16, 16, (10, 200, 30))
    val a = Multimodal.decodeImage(big, 4, 4)
    val b = Multimodal.decodeImage(big, 4, 4)
    assert(a.toSeq == b.toSeq)            // pure function of (bytes, w, h)
    assert(a.length == 48)
    assert(a.slice(16, 32).forall(_ == 200 / 255.0f)) // solid survives resize
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3), 4, 4) == null)
  }

  // Hand-crafted RIFF/WAVE container (not written via javax.sound, so the
  // test isn't circular with the decoder's own parser).
  private def wavBytes(samples: Seq[Int], channels: Int,
      bits: Int = 16): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val rate = 8000
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1) // PCM
    bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * bytesPer)
    bb.putShort((channels * bytesPer).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach { s =>
      if (bits == 16) bb.putShort(s.toShort) else bb.put(s.toByte)
    }
    bb.array()
  }

  test("dHash64 sets exactly the rising-luminance bits") {
    // 3x2 plane (4 bits): row 0 pixels 10,20,5 -> bits (1,0); row 1
    // pixels 7,7,9 -> equal is NOT rising -> bits (0,1). Gray = all
    // channels equal.
    val px = Seq(10, 20, 5, 7, 7, 9).map(_ / 255.0f)
    val feats = (px ++ px ++ px).toArray
    val got = Seq(feats).toDF("features")
      .select(graft.ops.Multimodal.dHash64(org.apache.spark.sql.functions.col("features"), 3, 2).as("h"))
      .as[Long].head()
    assert(got == ((1L << 0) | (1L << 3)))
  }

  test("dHash64 over the committed gradient fixtures matches the generator") {
    // tools/gen_image_fixtures.py prints these constants; the engine's
    // REAL decode (ImageIO -> identity resize -> float planes) must land
    // on the same 64-bit pattern, pinning every pixel of the decode.
    val imgs = Multimodal.ingestImages(
      Multimodal.scanBlobs(spark, "fixtures/images_grad"), w = 9, h = 8,
      partitions = 2)
      .withColumn("phash", Multimodal.dHash64(
        org.apache.spark.sql.functions.col("features"), 9, 8))
      .select("name", "phash").as[(String, Long)].collect().toMap
    assert(imgs("grad_40_3_0.png") == java.lang.Long.parseUnsignedLong("dfdfbfbfbfbfbfbf", 16))
    assert(imgs("grad_40_3_0_dup.png") == imgs("grad_40_3_0.png"))
    assert(imgs("grad_1_0_0.png") == -1L) // all 64 bits set
    assert(imgs("grad_255_0_0.png") == java.lang.Long.parseUnsignedLong("0101010101010101", 16))
  }

  test("phashPairs: band-collision candidates only, Hamming-filtered, each pair once") {
    val hs = Seq(
      ("a", 0x00000000FFFF0000L), // shares band 1 with b
      ("b", 0x00000000FFFF00FFL), // hamming(a,b)=8
      ("c", 0x7F0F0F0F0F0F0F0FL)  // no band shared with a or b
    ).toDF("name", "ph")
    val got = graft.ops.Multimodal.phashPairs(hs, "ph", "name", maxHamming = 16)
      .as[(String, String, Int)].collect().toSeq
    assert(got == Seq(("a", "b", 8)))
    // tightening the threshold below the distance drops the pair
    assert(graft.ops.Multimodal.phashPairs(hs, "ph", "name", maxHamming = 7)
      .count() == 0)
  }

  test("decodeWav parses 16-bit PCM mono: values, order, normalization") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val f = Multimodal.decodeWav(wavBytes(samples, channels = 1))
    assert(f != null && f.length == samples.length)
    assert(f.toSeq == samples.map(_ / 32768.0f))
  }

  test("decodeWav keeps stereo frames interleaved and handles 8-bit PCM") {
    val stereo = Seq(100, -200, 300, -400) // L0 R0 L1 R1
    val fs = Multimodal.decodeWav(wavBytes(stereo, channels = 2))
    assert(fs.toSeq == stereo.map(_ / 32768.0f))
    val f8 = Multimodal.decodeWav(
      wavBytes(Seq(0, 128, 255), channels = 1, bits = 8))
    assert(f8.toSeq == Seq(-1.0f, 0.0f, 127 / 128.0f))
  }

  test("decodeWav returns null on non-WAV bytes") {
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3, 4)) == null)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes) == null)
  }

  test("ingestAudio decodes through the DataFrame plumbing") {
    val rows = Seq(
      ("a.wav", wavBytes(Seq(16384, -16384), channels = 1)),
      ("bad.wav", Array[Byte](9, 9, 9))
    ).toDF("name", "content").withColumn("length", length(col("content")).cast("long"))
    val out = Multimodal.ingestAudio(rows, partitions = 2)
      .select("name", "features").as[(String, Option[Seq[Float]])].collect().toMap
    assert(out("a.wav").get == Seq(0.5f, -0.5f))
    assert(out("bad.wav").isEmpty)
  }

  // Multi-frame GIF written directly with ImageIO's sequence writer (the
  // decoder under test reads via the reader API, so write/read aren't the
  // same code path; values are asserted analytically, not round-tripped).
  private def gifBytes(grays: Seq[Int]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { g =>
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 2)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("decodeGifFrames demuxes all frames and samples every k-th") {
    val d = Multimodal.decodeGifFrames(gifBytes(Seq(0, 51, 102, 153, 204)), 2)
    assert(d.n_frames == 5)
    assert(d.features.length == 9) // frames 0, 2, 4 -> 3 pooled channels each
    assert(d.features.toSeq == Seq(0, 0, 0, 102, 102, 102, 204, 204, 204)
      .map(_ / 255.0f))
    val all = Multimodal.decodeGifFrames(gifBytes(Seq(10, 20)), 1)
    assert(all.n_frames == 2 && all.features.length == 6)
    assert(Multimodal.decodeGifFrames("notagif".getBytes, 2) == null)
  }

  test("ingestVideo decodes through the DataFrame plumbing") {
    val rows = Seq(
      ("a.gif", gifBytes(Seq(255, 0, 255))),
      ("bad.gif", Array[Byte](9, 9, 9))
    ).toDF("name", "content").withColumn("length", length(col("content")).cast("long"))
    val out = Multimodal.ingestVideo(rows, everyK = 2, partitions = 2)
    val byName = out.select("name", "decoded").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(byName("bad.gif").isEmpty) // corrupt sample -> null, filterable
    val a = out.filter(col("name") === "a.gif")
      .select(col("decoded.n_frames"), col("decoded.features"))
      .as[(Int, Seq[Float])].head()
    assert(a._1 == 3)
    assert(a._2 == Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)) // frames 0 and 2
  }

  test("ingestImages decodes through the DataFrame plumbing") {
    val rows = Seq(
      ("a.png", pngBytes(4, 3, (255, 0, 0))),
      ("bad.bin", Array[Byte](9, 9, 9))
    ).toDF("name", "content").withColumn("length", length(col("content")).cast("long"))
    val out = Multimodal.ingestImages(rows, w = 4, h = 3, partitions = 2)
      .select("name", "features").as[(String, Option[Seq[Float]])].collect().toMap
    assert(out("a.png").get.take(12).forall(_ == 1.0f))
    assert(out("bad.bin").isEmpty) // corrupt sample -> null, filterable
  }

  test("ingest sniffs modality and dispatches to the real codec per blob") {
    val rows = Seq(
      ("a.png", pngBytes(4, 3, (255, 0, 0))),
      ("b.wav", wavBytes(Seq(16384, -16384), channels = 1)),
      ("c.gif", gifBytes(Seq(255, 0, 255))),
      ("d.blob", Array[Byte]('T', 'A', 'F', 'G', 9, 9)),
      ("trunc.bin", Array[Byte](1)) // shorter than any magic prefix
    ).toDF("name", "content").withColumn("length", length(col("content")).cast("long"))
    val out = Multimodal.ingest(rows, partitions = 2, w = 4, h = 3, everyK = 2)
      .select("name", "modality", "quarantined", "features")
      .as[(String, String, Boolean, Option[Seq[Float]])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a.png")._2 == "image" && !out("a.png")._3)
    assert(out("a.png")._4.get.take(12).forall(_ == 1.0f))
    assert(out("b.wav")._2 == "audio" && out("b.wav")._4.get == Seq(0.5f, -0.5f))
    assert(out("c.gif")._2 == "video")
    assert(out("c.gif")._4.get == Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f))
    // No synthetic floats for unknown modalities: null + quarantined.
    assert(out("d.blob")._2 == "unknown" && out("d.blob")._3)
    assert(out("d.blob")._4.isEmpty)
    assert(out("trunc.bin")._2 == "unknown" && out("trunc.bin")._4.isEmpty)
  }

  test("codec-rejected blobs with a known magic are quarantined too") {
    // RIFF/WAVE magic but an unparseable container: modality sniffs as
    // audio, the codec rejects it, and the row joins the quarantine.
    val rows = Seq(("bad.wav", "RIFFxxxxWAVEgarbage".getBytes))
      .toDF("name", "content")
      .withColumn("length", length(col("content")).cast("long"))
    val out = Multimodal.ingest(rows, partitions = 1)
      .select("modality", "quarantined").as[(String, Boolean)].head()
    assert(out == ("audio", true))
  }

  test("quarantineCounts aggregates per modality") {
    val rows = Seq(
      ("a.png", pngBytes(2, 2, (1, 2, 3))),
      ("x.bin", Array[Byte](1, 2, 3, 4)),
      ("y.bin", Array[Byte](5, 6, 7, 8))
    ).toDF("name", "content").withColumn("length", length(col("content")).cast("long"))
    val counts = Multimodal.quarantineCounts(Multimodal.ingest(rows, partitions = 1))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(counts("image") == ((1L, 0L)))
    assert(counts("unknown") == ((2L, 2L)))
  }
}

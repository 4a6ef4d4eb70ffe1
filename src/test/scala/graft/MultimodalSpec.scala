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
}

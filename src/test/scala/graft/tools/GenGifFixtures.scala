package graft.tools

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.{IIOImage, ImageIO}

/** One-shot generator for the committed animated-GIF video fixtures
  * (fixtures/video). Filename carries the analytic frame recipe
  * `vid_<g0>_<dg>_<nf>.gif`: `nf` full-size 2x2 frames, frame j solid gray
  * `(g0 + j*dg) % 256` — so the mm4 oracle recomputes every decoded value
  * from the name alone. Written with the JDK's own GIF sequence writer
  * (palette-exact for solid frames; no external libs), the same stack the
  * engine decodes with — but the oracle checks VALUES, not a round-trip,
  * so a codec bug cannot cancel out. corrupt.gif exercises the null path.
  *
  * Run: sbt "Test/runMain graft.tools.GenGifFixtures"
  */
object GenGifFixtures {
  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/video")
    dir.mkdirs()
    val specs = Seq((7, 23, 5), (0, 50, 4), (200, 13, 7), (255, 0, 1))
    specs.foreach { case (g0, dg, nf) =>
      val f = new File(dir, s"vid_${g0}_${dg}_$nf.gif")
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(f)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nf).foreach { j =>
        val g = (g0 + j * dg) % 256
        val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, rgb)
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      println(s"wrote $f (${f.length()} bytes)")
    }
    val corrupt = new File(dir, "corrupt.gif")
    java.nio.file.Files.write(corrupt.toPath,
      "notagif-deliberately-undecodable".getBytes("UTF-8"))
    println(s"wrote $corrupt")
  }
}

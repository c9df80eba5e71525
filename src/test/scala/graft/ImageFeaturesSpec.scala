package graft

import graft.features.ImageFeatures
import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.nio.file.Files
import javax.imageio.ImageIO

/** Image feature extraction against generated PNGs with known pixel
  * statistics (feature_extractor.py:15-34 semantics). */
class ImageFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writePng(dir: java.io.File, name: String, w: Int, h: Int,
      rgb: (Int, Int, Int)): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px)
    ImageIO.write(img, "png", new java.io.File(dir, name))
  }

  test("decodeStats computes exact channel means and dimensions") {
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff) // half red, half blue
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val Some((r, g, b, w, h)) = ImageFeatures.decodeStats(bos.toByteArray)
    assert(w == 4 && h == 2)
    assert(r == 127.5f && g == 0.0f && b == 127.5f)
  }

  test("decodeStats returns None for undecodable payloads") {
    assert(ImageFeatures.decodeStats("not an image".getBytes).isEmpty)
  }

  test("binaryFile scan extracts features for a category tree and dedups") {
    val root = Files.createTempDirectory("graft-icons").toFile
    root.deleteOnExit()
    val catA = new java.io.File(root, "airplane"); catA.mkdir()
    val catB = new java.io.File(root, "boat"); catB.mkdir()
    writePng(catA, "a1.png", 8, 8, (255, 0, 0))
    writePng(catA, "a2.png", 16, 4, (0, 255, 0))
    writePng(catB, "b1.png", 10, 10, (10, 20, 30))
    Files.writeString(new java.io.File(catB, "notes.txt").toPath, "skip me")

    val feats = ImageFeatures.extract(spark, root.getAbsolutePath)
      .collect().map(r => r.getString(0).split('/').last ->
        (r.getFloat(1), r.getFloat(2), r.getFloat(3), r.getInt(4), r.getInt(5))).toMap
    assert(feats.size == 3, "recursive png-only scan")
    assert(feats("a1.png") == ((255f, 0f, 0f, 8, 8)))
    assert(feats("a2.png") == ((0f, 255f, 0f, 16, 4)))
    assert(feats("b1.png") == ((10f, 20f, 30f, 10, 10)))
  }
}

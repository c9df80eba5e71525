package graft

import graft.features.Multimodal
import graft.features.Multimodal.{Media, MediaMeta}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: format sniff, batch-shaped decode, resize,
  * frame sampling (decode itself stubbed — no codecs in container). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a).map(_.toByte)
  private val jpegMagic = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)

  test("magic sniff recognizes common containers") {
    assert(Multimodal.sniffFormat(pngMagic ++ Array[Byte](1, 2, 3)) == "png")
    assert(Multimodal.sniffFormat(jpegMagic ++ Array[Byte](9)) == "jpeg")
    assert(Multimodal.sniffFormat("GIF89a".getBytes) == "gif")
    assert(Multimodal.sniffFormat("RIFFxxxx".getBytes) == "riff")
    assert(Multimodal.sniffFormat("plain text".getBytes) == "unknown")
  }

  test("decodeMeta is deterministic and schema-typed over partitions") {
    import spark.implicits._
    val media = (0L until 50L).map(i =>
      Media(i, pngMagic ++ s"payload-$i".getBytes)).toDS().repartition(4)
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta.size == 50)
    assert(meta.values.forall(_.format == "png"))
    assert(meta.values.forall(m => m.width >= 32 && m.width < 480))
    val again = Multimodal.decodeMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta == again)
  }

  test("real PNG payloads decode to true dimensions via ImageIO") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Media(1L, png(37, 53)), Media(2L, png(128, 64)),
      Media(3L, "not an image at all".getBytes)).toDS().repartition(2)
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 37 && meta(1L).height == 53)
    assert(meta(2L).width == 128 && meta(2L).height == 64)
    assert(meta(1L).n_frames == 1)
    assert(meta(3L).format == "unknown", "non-image stays on the stub path")
  }

  test("resize clamps the long side preserving determinism") {
    import spark.implicits._
    val meta = Seq(MediaMeta(1, 100, "png", 400, 200, 10),
      MediaMeta(2, 100, "png", 64, 48, 1)).toDS()
    val resized = Multimodal.resizeMeta(meta, 128).collect()
      .map(m => m.doc_id -> (m.width, m.height)).toMap
    assert(resized(1) == ((128, 64)))
    assert(resized(2) == ((64, 48)), "already small: untouched")
  }

  test("frame sampling explodes every Nth frame with offsets") {
    import spark.implicits._
    val meta = Seq(MediaMeta(7, 1000, "riff", 64, 64, 10)).toDS()
    val frames = Multimodal.sampleFrames(meta, 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.doc_id == 7))
    assert(frames.map(_.byte_offset).toSeq == Seq(0, 300, 600, 900))
  }

  test("documents adapter feeds the same pipeline end to end") {
    val media = Multimodal.fromDocuments(spark, TestSpark.sf0001)
    val meta = Multimodal.decodeMeta(media)
    assert(meta.count() == 500)
    val frames = Multimodal.sampleFrames(meta, 8)
    assert(frames.count() > 0)
  }
}

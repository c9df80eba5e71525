package graft.features

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JVM-native image feature extraction (feature_extractor.py:15-34
  * semantics): per image, mean R/G/B over all pixels after RGB
  * conversion, plus width/height.
  *
  * The reference runs a driver-side pandas iterrows loop over PIL; here
  * the decode runs distributed inside a Scala UDF over a `binaryFile`
  * scan — no per-row driver involvement, no Python serialization. At
  * 100 TB of images the scan parallelizes by file and the UDF is pure
  * per-row compute (no shuffle until the final dedup).
  */
object ImageFeatures {

  /** (avgRed, avgGreen, avgBlue, width, height) of one encoded image,
    * or None if the payload does not decode. */
  def decodeStats(bytes: Array[Byte]): Option[(Float, Float, Float, Int, Int)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y) // ARGB, RGB-converted like PIL .convert('RGB')
            r += (px >> 16) & 0xff
            g += (px >> 8) & 0xff
            b += px & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(((r.toDouble / n).toFloat, (g.toDouble / n).toFloat,
          (b.toDouble / n).toFloat, w, h))
      }
    } catch { case _: Exception => None }
  }

  private val statsUdf = udf { bytes: Array[Byte] =>
    decodeStats(bytes)
  }

  /** Scan an icon directory tree and produce the 5-column feature table
    * keyed by icon_path. Windows-style backslash separators in stored
    * paths (SURVEY §7.3) are normalized; paths are deduped like
    * feature_extractor.py:53-54. */
  def extract(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_replace(col("path"), "\\\\", "/").as("icon_path"),
        statsUdf(col("content")).as("s"))
      .na.drop(Seq("icon_path"))
      .dropDuplicates("icon_path")
      .filter(col("s").isNotNull)
      .select(col("icon_path"),
        col("s._1").as("img_avg_red"),
        col("s._2").as("img_avg_green"),
        col("s._3").as("img_avg_blue"),
        col("s._4").as("img_width"),
        col("s._5").as("img_height"))
}

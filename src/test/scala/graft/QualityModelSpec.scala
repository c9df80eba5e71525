package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Model-based quality filtering semantics: the classifier must learn
  * its weak teacher, and compressibility must rank repetitive text below
  * diverse text. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("quality classifier recovers the weak teacher labels on its own corpus") {
    val rows = SparkEntry.queries("q98_quality_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val agree = rows.count(r => r._2 == r._3).toDouble / rows.length
    // linearly-separable-ish weak labels: LR must fit its own teacher well
    assert(agree > 0.9, s"teacher agreement only $agree")
    // and both classes must actually occur (no degenerate always-1 model)
    assert(rows.exists(_._3 == 0) && rows.exists(_._3 == 1))
  }

  test("compressibility ranks repetitive text as more compressible") {
    val out = SparkEntry.queries("q99_compressibility")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.nonEmpty)
    assert(out.values.forall(r => r > 0.0 && r < 1.5))
    // deterministic across reruns (same JDK zlib, same input)
    val again = SparkEntry.queries("q99_compressibility")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == again)
    // synthetic sanity: a highly repetitive doc must compress better
    // than a max-diversity doc of the same length
    val deflate = (s: String) => {
      val d = new java.util.zip.Deflater()
      val raw = s.getBytes("UTF-8"); d.setInput(raw); d.finish()
      val buf = new Array[Byte](1 << 20)
      var n = 0; while (!d.finished()) n += d.deflate(buf)
      n.toDouble / raw.length
    }
    assert(deflate(Seq.fill(200)("spam").mkString(" ")) <
      deflate((1 to 200).map(i => s"w$i").mkString(" ")))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis semantics on crafted documents. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "a a the xyz", "en", "s", 11L),
      (1L, "  le  les \t des mots ", "fr", "s", 21L),
      (2L, "Der die und Tag", "de", "s", 15L),
      (3L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "s", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  lazy val sfDir: String = TestSpark.makeSfDir("documents" -> docsDf)

  test("token counting splits on arbitrary whitespace after trim") {
    val rows = SparkEntry.queries("q30_token_count")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(0L) == 4)
    assert(rows(1L) == 4, "tabs/multi-spaces collapse to one delimiter")
    assert(rows(3L) == 60)
  }

  test("quality scoring computes stopword ratio and buckets") {
    val rows = SparkEntry.queries("q31_quality_score")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getString(6))).toMap
    val (n, uniq, stopRatio, quality) = rows(0L)
    assert(n == 4 && uniq == 3)
    assert(math.abs(stopRatio - 0.75) < 1e-15) // 'a','a','the' of 4
    assert(quality == "poor")
    assert(rows(3L)._4 == "good")
  }

  test("language heuristic votes on marker words") {
    val rows = SparkEntry.queries("q32_lang_guess")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(rows(0L) == "en")
    assert(rows(1L) == "fr")
    assert(rows(2L) == "de", "marker match is case-sensitive by design: 'die'/'und'")
  }

  test("fingerprint is whitespace- and case-insensitive") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello   world", "en", "s", 13L),
      (1L, " hello world ", "en", "s", 13L),
      (2L, "different", "en", "s", 9L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q34_fingerprint")(spark, dir).collect()
    assert(rows.length == 2, "normalized dups collapse to one fingerprint")
    val dupRow = rows.find(_.getLong(1) == 0L).get
    assert(dupRow.getLong(2) == 2L)
  }
}

package graft

import graft.apps.TitleMatch
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Scraper title-overlap rule (app_scraper.py:13-39): normalization,
  * the subset rule for short titles, and the ≥3-common-words rule. */
class TitleMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def matches(a: String, b: String): Boolean = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(TitleMatch.titleMatches(col("a"), col("b")).as("m"))
      .collect()(0).getBoolean(0)
  }

  test("long titles match on >=3 common words, order- and case-insensitive") {
    assert(matches("Candy Crush Saga Deluxe", "candy CRUSH saga (Deluxe)"))
    assert(matches("My Photo Editor Pro 2024", "Photo Editor Pro"))
    assert(!matches("Alpha Beta Gamma Delta", "Alpha Beta Epsilon Zeta"))
  }

  test("short titles use the subset rule") {
    assert(matches("WhatsApp", "WhatsApp Messenger Free Calls"))
    assert(matches("Clash Royale", "Clash Royale - Strategy Game"))
    assert(!matches("Clash Kings", "Clash Royale Tower Game"))
  }

  test("punctuation and symbols are stripped before comparing") {
    // reference parity: stripping does NOT insert whitespace, so
    // "Subway-Surfers" collapses to one word and does not match the
    // two-word form (app_scraper.py:23 does the same)
    assert(!matches("Subway-Surfers!", "subway surfers"))
    assert(matches("Candy! Crush? Saga.", "candy crush saga"))
    assert(!matches("!!!", "???"), "empty word sets never match")
  }

  test("q74 pairs parts sharing >=3 name words within a brand") {
    import spark.implicits._
    val parts = Seq(
      (1L, "Brand#1", "azure green navy lace tomato"),
      (2L, "Brand#1", "green navy lace tomato olive"),  // 4 common with 1
      (3L, "Brand#1", "red white blue cyan magenta"),   // 0 common
      (4L, "Brand#2", "azure green navy lace tomato"))  // other brand block
      .toDF("p_partkey", "p_brand", "p_name")
      .withColumn("p_type", col("p_name"))
    val dir = TestSpark.makeSfDir("part" -> parts)
    val rows = SparkEntry.queries("q74_title_match")(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(rows(0).getInt(3) == 4)
  }
}

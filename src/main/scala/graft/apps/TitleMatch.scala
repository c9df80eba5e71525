package graft.apps

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Title-overlap matching (app_scraper.py:13-39): normalize both titles
  * (lowercase, strip non-alphanumerics, split on whitespace, distinct
  * word sets), then match when the shorter-than-`minMatchWords` title is
  * a subset of the other, or when at least `minMatchWords` words are
  * shared. The reference runs this per scraped row in Python; here it is
  * a Column expression, so a whole catalog joins against a whole scrape
  * in one blocked equi-join.
  */
object TitleMatch {

  /** Distinct lowercase word set of a title (app_scraper.py:23-24).
    * Whitespace is the explicit [[Dsl.WsChars]] class, not `\s` — Java's
    * `\s` includes U+000B while RE2's does not, and the reference's
    * Python `re` sides with Java, so the explicit class is the
    * parity-correct tokenization on all three engines. */
  def cleanWords(c: Column): Column =
    array_distinct(filter(
      split(regexp_replace(lower(c), s"[^a-z0-9${Dsl.WsChars}]", ""),
        s"[${Dsl.WsChars}]+"),
      w => length(w) > 0))

  private def sqlCleanWords(e: String): String =
    s"""list_distinct(list_filter(
       string_split_regex(regexp_replace(lower($e), '[^a-z0-9${Dsl.WsChars}]', '', 'g'), '[${Dsl.WsChars}]+'),
       w -> len(w) > 0))"""

  /** True when the two titles match under the reference's tolerance
    * rule (app_scraper.py:26-39). Expects pre-computed word arrays so a
    * join computes each side's words once, not once per pair. */
  def wordsMatch(wa: Column, wb: Column, minMatchWords: Int = 3): Column =
    when(size(wa) === 0 || size(wb) === 0, lit(false))
      .when(size(wa) <= minMatchWords, size(array_except(wa, wb)) === 0)
      .otherwise(size(array_intersect(wa, wb)) >= minMatchWords)

  /** Convenience single-expression form for per-row use. */
  def titleMatches(a: Column, b: Column, minMatchWords: Int = 3): Column =
    wordsMatch(cleanWords(a), cleanWords(b), minMatchWords)

  /** q74: title-matched part pairs within a brand — the scraper's
    * DB-title vs store-title comparison restated as a blocked self-join
    * (p_brand is the block key; the match predicate is the reference's
    * ≥3-common-words-or-subset rule). */
  val titleMatchPairs: Q = Q(
    "q74_title_match",
    (s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"),
          cleanWords(col("p_name")).as("w"))
      val a = p.as("a"); val b = p.as("b")
      a.join(b, col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
        .filter(wordsMatch(col("a.w"), col("b.w")))
        .select(col("a.p_partkey").as("key_a"),
          col("b.p_partkey").as("key_b"),
          col("a.p_brand").as("brand"),
          size(array_intersect(col("a.w"), col("b.w"))).as("n_common"))
        .orderBy("key_a", "key_b")
    },
    Some(s"""WITH p AS (SELECT p_partkey, p_brand,
        ${sqlCleanWords("p_name")} AS w FROM part)
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        a.p_brand AS brand,
        cast(len(list_intersect(a.w, b.w)) as int) AS n_common
      FROM p a JOIN p b ON a.p_brand = b.p_brand
        AND a.p_partkey < b.p_partkey
      WHERE CASE
        WHEN len(a.w) = 0 OR len(b.w) = 0 THEN false
        WHEN len(a.w) <= 3 THEN len(list_filter(a.w, w -> NOT list_contains(b.w, w))) = 0
        ELSE len(list_intersect(a.w, b.w)) >= 3 END
      ORDER BY key_a, key_b"""))

  val all: Seq[Q] = Seq(titleMatchPairs)
}

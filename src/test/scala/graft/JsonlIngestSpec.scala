package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** JSON-lines ingest with corrupt-record quarantine: every input line
  * ends up in exactly one of {good, quarantine} — including
  * type-drifted records, which Spark's PERMISSIVE JSON reader treats
  * as malformed — the raw text of a quarantined line survives verbatim
  * for reprocessing, and the split comes from one cached parse (the
  * SPARK-26243 corrupt-column-only filter restriction is handled
  * inside the source, not by callers). */
class JsonlIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def writeFixture(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
    dir.getAbsolutePath
  }

  test("every line lands in exactly one side; raw malformed text survives verbatim") {
    val goodLines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2, "text": "beta"}""",
      """{"doc_id": 3, "text": "gamma"}""")
    val badLines = Seq(
      """{"doc_id": 4, "text": "unterminated""",
      """not json at all""")
    val path = writeFixture(scala.util.Random.shuffle(goodLines ++ badLines))
    val (good, quarantine, release) =
      sources.JsonlIngest.split(spark, path, schema)
    try {
      val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(g == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
      assert(!good.columns.contains(sources.JsonlIngest.CorruptCol),
        "good side must not leak the internal column")
      val q = quarantine.collect().map(_.getString(0)).toSet
      assert(q == badLines.toSet,
        "quarantine must carry the raw malformed lines verbatim")
      assert(g.size + q.size == goodLines.size + badLines.size)
    } finally release()
  }

  test("type drift quarantines the record with its raw line; a clean file quarantines nothing") {
    // Spark's PERMISSIVE JSON reader treats a field that fails type
    // conversion ("doc_id" as a string) as a malformed RECORD: the raw
    // line lands in the corrupt column like an unparseable line does —
    // so BOTH failure classes route to the same quarantine and nothing
    // is silently null-filled into the good side (pinned here so a
    // Spark behavior change fails loudly)
    val drifted = """{"doc_id": "seven", "text": "drifted"}"""
    val path = writeFixture(Seq(
      """{"doc_id": 7, "text": "ok"}""", drifted))
    val (good, quarantine, release) =
      sources.JsonlIngest.split(spark, path, schema)
    try {
      assert(quarantine.collect().map(_.getString(0)).toSeq == Seq(drifted))
      assert(good.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((7L, "ok")))
      // and a fully clean file quarantines nothing
      val cleanPath = writeFixture(Seq("""{"doc_id": 9, "text": "z"}"""))
      val (g2, q2, release2) =
        sources.JsonlIngest.split(spark, cleanPath, schema)
      try {
        assert(q2.count() == 0L && g2.count() == 1L)
      } finally release2()
    } finally release()
  }
}

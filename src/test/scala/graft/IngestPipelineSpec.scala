package graft

import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The composed ingest pipeline (quality gate → LSH near-dup admit →
  * BM25 index append) end to end over a MemoryStream, including the
  * replay law: re-feeding an ingested wire changes neither index. */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.{Bm25Index, LshBandIndex}

  private def tmp(name: String): String = {
    val dir = Files.createTempDirectory(name).toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  private def freshIndexes(): (String, String) = {
    import spark.implicits._
    val lsh = tmp("graft-ingest-lsh"); val bm = tmp("graft-ingest-bm25")
    // seed corpus: two long docs already in both indexes
    val seed = Seq(
      Doc(1L, (1 to 40).map(i => s"seed$i alpha$i").mkString(" ")),
      Doc(2L, (1 to 40).map(i => s"base$i beta$i").mkString(" "))).toDF()
    LshBandIndex.build(spark, seed, lsh)
    Bm25Index.build(spark, seed, bm)
    (lsh, bm)
  }

  private def postingsState(bm: String): (Long, (Long, Long)) = {
    val p = spark.read.parquet(s"$bm/postings").count()
    val st = spark.read.parquet(s"$bm/stats").collect().head
    (p, (st.getLong(0), st.getLong(1)))
  }

  test("stream: poor doc gated, near-dup rejected, survivor lands in both indexes; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (lsh, bm) = freshIndexes()
    val seedText = (1 to 40).map(i => s"seed$i alpha$i").mkString(" ")
    val wire = Seq(
      Doc(10L, "too short to index"),                       // poor: gated
      Doc(11L, seedText.replace("alpha7", "alphaX")),       // near-dup of 1
      Doc(12L, (1 to 40).map(i => s"fresh$i gamma$i").mkString(" ")))
    val mem = MemoryStream[Doc]
    val q = IngestPipeline.start(mem.toDS(), lsh, bm, tmp("graft-ingest-ckpt"))
    try {
      mem.addData(wire: _*)
      q.processAllAvailable()
    } finally q.stop()

    val indexedDocs = spark.read.parquet(s"$bm/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexedDocs == Set(1L, 2L, 12L),
      s"only the fresh survivor joins the seeds: $indexedDocs")
    val lshDocs = spark.read.parquet(s"$lsh/sets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(lshDocs == Set(1L, 2L, 12L), s"lsh sets: $lshDocs")
    // the survivor is servable through the BM25 index
    val hits = Bm25Index.probe(spark,
      Seq((0L, "fresh3"), (0L, "gamma9")).toDF("qid", "term"), bm)
      .collect()
    assert(hits.nonEmpty && hits.head.getLong(2) == 12L,
      s"survivor must rank first for its own terms: ${hits.toSeq}")

    // replay the SAME wire on a fresh stream: the dedup gate rejects
    // everything (each doc finds itself at jaccard 1.0), so neither
    // index changes — exactly-once effect without idempotent writes
    val before = postingsState(bm)
    val mem2 = MemoryStream[Doc]
    val q2 = IngestPipeline.start(mem2.toDS(), lsh, bm, tmp("graft-ingest-ckpt2"))
    try {
      mem2.addData(wire: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(postingsState(bm) == before, "replay must not grow the BM25 index")
    val lshDocs2 = spark.read.parquet(s"$lsh/sets")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(lshDocs2 == Set(1L, 2L, 12L), "replay must not grow the LSH index")
  }
}

package graft.tools

import graft.Tables
import graft.operators.{Bm25Index, LshBandIndex}
import graft.streaming.IngestPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-pipeline scale probe. Not part of the driver contract — the
  * measured number behind the round-13 exactly-once composed pipeline
  * (quality gate → LSH admit → BM25 append): per-batch wall time and
  * docs/sec as the persisted indexes GROW (the probe joins an
  * ever-larger bands table — this curve is the honest cost, a one-batch
  * demo is not), plus the two replay paths' costs measured rather than
  * claimed:
  *
  *  - marker skip (crash after the batch completed): should be
  *    milliseconds — one marker file read, no index I/O;
  *  - membership repair (crash between the LSH and BM25 appends): the
  *    sets semi-join + postings anti-join + refreshStats — the rare
  *    path, priced so the hot path provably pays none of it.
  *
  * Usage: sbt "runMain graft.tools.IngestScale [sfDir] [nBatches]"
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = java.nio.file.Files.createTempDirectory("graft-ingest-scale")
    val lsh = s"$base/lsh"; val bm = s"$base/bm25"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .cache()
    val n = docs.count()
    // seed the indexes with the first half; ingest the rest in batches
    val half = n / 2
    val seed = docs.filter(col("doc_id") < half)
    val (_, tBuild) = timed {
      LshBandIndex.build(spark, seed, lsh)
      Bm25Index.build(spark, seed, bm)
    }
    val perBatch = (n - half) / nBatches
    val batches = (0 until nBatches).map { i =>
      val lo = half + i * perBatch
      val hi = if (i == nBatches - 1) n else half + (i + 1) * perBatch
      val b = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .localCheckpoint()
      val nb = b.count()
      val (admitted, sec) = timed(
        IngestPipeline.ingestBatch(spark, b, lsh, bm, Some(i.toLong)))
      val indexDocs = spark.read.parquet(s"$lsh/sets").count()
      (i, nb, admitted, sec, indexDocs)
    }
    // replay path 1: marker skip (the whole batch already landed)
    val lastBatch = docs.filter(
      col("doc_id") >= half + (nBatches - 1) * perBatch && col("doc_id") < n)
    val (skipN, tSkip) = timed(IngestPipeline.ingestBatch(
      spark, lastBatch, lsh, bm, Some((nBatches - 1).toLong)))
    require(skipN == 0L, "marker skip must admit nothing")
    // replay path 2: membership repair — crash a FRESH batch between the
    // LSH and BM25 appends, then replay it (the round-13 repair seam).
    // Texts are synthesized per id (40 unique tokens each) so every doc
    // is genuinely novel — a prefix-edited corpus doc would be rejected
    // as a near-dup and the repair path would never fire.
    val fresh = spark.range(perBatch)
      .select((col("id") + lit(10000000L)).as("doc_id"),
        concat_ws(" ",
          (0 until 40).map(i => concat(lit(s"f${i}u"), col("id"))): _*)
          .as("text"))
      .localCheckpoint()
    val crashed = try {
      IngestPipeline.ingestBatchImpl(spark, fresh, lsh, bm,
        p => if (p == "lsh:appended") throw new RuntimeException("boom"),
        Some(nBatches.toLong))
      false
    } catch { case _: RuntimeException => true }
    require(crashed, "crash injection did not fire")
    val (repairN, tRepair) = timed(IngestPipeline.ingestBatch(
      spark, fresh, lsh, bm, Some(nBatches.toLong)))
    require(repairN == perBatch,
      s"repair replay recovered $repairN of $perBatch docs")
    docs.unpersist()

    val batchJson = batches.map { case (i, nb, adm, sec, idx) =>
      s"""{"batch":$i,"docs":$nb,"admitted":$adm,"sec":${f"$sec%.3f"},""" +
        s""""docs_per_sec":${f"${nb / sec}%.1f"},"index_docs":$idx}"""
    }.mkString("[", ",", "]")
    println(s"""{"sf":"$sfDir","total_docs":$n,"seed_docs":$half,""" +
      s""""build_sec":${f"$tBuild%.3f"},"batches":$batchJson,""" +
      s""""marker_skip_sec":${f"$tSkip%.4f"},""" +
      s""""repair_replay_docs":$repairN,"repair_replay_sec":${f"$tRepair%.3f"}}""")
    spark.stop()
  }
}

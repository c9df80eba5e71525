package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted segment-prevalence index lifecycle (build / probe /
  * append / delete / compact / recover), pinned against the
  * oracle-checked registry twin q229 and against the right-to-be-
  * forgotten + crash-safety contracts the other four indexes carry. */
class PrevalenceIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  import operators.{IndexManifest, PrevalenceIndex}

  private def corpusDocs = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 < 8).select("doc_id", "text")
  private def batchDocs = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 >= 8).select("doc_id", "text")

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft-prev-index").toFile
    dir.deleteOnExit()
    PrevalenceIndex.build(spark, corpusDocs, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  private def probeMap(dir: String): Map[Long, (Long, Long)] =
    PrevalenceIndex.probe(spark, batchDocs, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("persisted-index probe matches the oracle-checked registry twin q229") {
    val dir = freshIndex()
    val got = probeMap(dir)
    val want = SparkEntry.queries("q229_prevalence_index_admit")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want,
      s"lifecycle probe diverged from the registry/oracle semantics")
    assert(want.values.exists(_._2 > 0L), "no boilerplate flagged — vacuous")
    assert(want.values.exists(_._2 == 0L), "everything flagged — vacuous")
  }

  test("probeAt: the pre-append version serves the old prevalence; a compact's full vacuum retires it to None") {
    val dir = freshIndex()
    val v0 = IndexManifest.load(spark, dir).get.version
    val before = probeMap(dir)
    PrevalenceIndex.append(spark, batchDocs, dir)
    assert(probeMap(dir) != before,
      "fixture: the append must change the prevalence audit")
    val at = PrevalenceIndex.probeAt(spark, batchDocs, dir, v0)
      .getOrElse(fail("retained pre-append version must be probeable"))
    assert(at.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap == before,
      "time-travel probe diverged")
    PrevalenceIndex.compact(spark, dir)
    assert(PrevalenceIndex.probeAt(spark, batchDocs, dir, v0).isEmpty,
      "a fully vacuumed version must resolve None")
  }

  test("append has a doc-granular replay guard and makes the batch self-boilerplate") {
    val dir = freshIndex()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    PrevalenceIndex.append(spark, batchDocs, dir)
    val n1 = operators.IndexManifest.read(spark, dir, "segs").count()
    PrevalenceIndex.append(spark, batchDocs, dir) // replay
    val n2 = operators.IndexManifest.read(spark, dir, "segs").count()
    assert(n1 == n2, s"replayed append grew the index: $n1 -> $n2")
    // after append, every batch segment is its own index hit (n_idx >= 1
    // from the doc itself) so the probe flags ALL segments
    val rows = PrevalenceIndex.probe(spark, batchDocs, dir).collect()
    assert(rows.forall(r => r.getLong(2) == r.getLong(1)),
      "post-append probe must flag every batch segment")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/segs")))
  }

  test("delete makes a forgotten doc stop contributing immediately; compact applies physically; crash+recover safe at every point") {
    import spark.implicits._
    // tiny planted corpus: segment "dup" lives in index docs 100 and
    // 101; batch doc 900 carries it -> flagged (prevalence 3). After
    // deleting BOTH index holders, batch doc 900 is the segment's only
    // doc -> not flagged.
    val idxDocs = Seq((100L, "dup the a1"), (101L, "dup the b1"),
      (102L, "solo the c1")).toDF("doc_id", "text")
    val batch = Seq((900L, "dup the z9")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-prev-planted").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    PrevalenceIndex.build(spark, idxDocs, d)
    def flagCount(): Long =
      PrevalenceIndex.probe(spark, batch, d).collect()(0).getLong(2)
    assert(flagCount() == 1L, "planted dup must be flagged pre-delete")
    PrevalenceIndex.delete(spark, Seq(100L, 101L), d)
    assert(flagCount() == 0L, "tombstoned docs must stop contributing")
    // crash injection at each compact point: the manifest keeps the
    // index fully live and probe-identical AT the crash state; recover
    // (orphan vacuum) + rerun converges, tombstones applied idempotently
    for (crashAt <- Seq("segs:written", "committed", "vacuumed")) {
      val dir2 = Files.createTempDirectory(s"graft-prev-crash").toFile
      dir2.deleteOnExit()
      val d2 = dir2.getAbsolutePath
      PrevalenceIndex.build(spark, idxDocs, d2)
      PrevalenceIndex.delete(spark, Seq(100L, 101L), d2)
      val boom = intercept[RuntimeException] {
        PrevalenceIndex.compactImpl(spark, d2,
          p => if (p == crashAt) throw new RuntimeException(s"crash:$p"))
      }
      assert(boom.getMessage == s"crash:$crashAt")
      val at = PrevalenceIndex.probe(spark, batch, d2).collect()(0)
      assert((at.getLong(1), at.getLong(2)) == ((2L, 0L)),
        s"probe AT the crash state $crashAt wrong: $at")
      PrevalenceIndex.recover(spark, d2)
      PrevalenceIndex.compact(spark, d2) // rerun to completion
      val got = PrevalenceIndex.probe(spark, batch, d2)
        .collect()(0)
      assert((got.getLong(1), got.getLong(2)) == ((2L, 0L)),
        s"probe after crash@$crashAt + recover + compact wrong: $got")
      // physically applied: tombstones gone from the manifest, no doc
      // 100/101 rows in the live segments
      assert(operators.IndexManifest.readOpt(spark, d2, "tombstones")
        .isEmpty, "tombstones must be cleared after a completed compact")
      val live = operators.IndexManifest.read(spark, d2, "segs")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(live == Set(102L), s"compacted index holds $live")
    }
  }

  test("q233 histogram strata and shares are exact on a planted-prevalence fixture") {
    import spark.implicits._
    // segments: "dup" in 3 docs (k=3), "pair" in 2 (k=2), and 3
    // singletons -> strata {1: 3 segs, 2: 1, 3: 1}; totals 5 segs,
    // 3 + 2 + 3 = 8 pairs
    val docs = Seq(
      (1L, "dup the pair the u1", "en", "s", 19L),
      (2L, "dup the pair the u2", "en", "s", 19L),
      (3L, "dup the u3", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q233_prevalence_histogram")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows == Map(
      1L -> ((3L, 3L, 3.0 / 5, 3.0 / 8)),
      2L -> ((1L, 2L, 1.0 / 5, 2.0 / 8)),
      3L -> ((1L, 3L, 1.0 / 5, 3.0 / 8))),
      s"histogram wrong: $rows")
  }
}

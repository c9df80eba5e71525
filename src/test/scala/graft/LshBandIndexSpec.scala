package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted LSH band-bucket index lifecycle (build / probe / admit /
  * append), pinned against the oracle-checked registry twin q159 and
  * replay-tested: once a batch has been admitted, re-admitting it must
  * reject every doc. */
class LshBandIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def corpusDocs = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 < 8).select("doc_id", "text")
  private def batchDocs = Tables.documents(spark, sf)
    .filter(col("doc_id") % 10 >= 8).select("doc_id", "text")

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft-lsh-index").toFile
    dir.deleteOnExit()
    operators.LshBandIndex.build(spark, corpusDocs, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  test("persisted-index admit matches the oracle-checked registry twin q159") {
    val dir = freshIndex()
    val got = operators.LshBandIndex
      .admit(spark, batchDocs, dir, appendSurvivors = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = SparkEntry.queries("q159_lsh_index_admit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq,
      "lifecycle admit diverged from the registry/oracle semantics")
    assert(got.nonEmpty && got.exists(_._4 == 1L), "no admitted docs — vacuous")
  }

  test("replay: after append, re-admitting the same batch rejects every doc") {
    val dir = freshIndex()
    val first = operators.LshBandIndex.admit(spark, batchDocs, dir)
      .collect()
    val admitted = first.filter(_.getLong(3) == 1L).map(_.getLong(0)).toSet
    assert(admitted.nonEmpty, "first admit must admit something")
    // survivors are now IN the index: each re-probed doc finds itself at
    // jaccard 1.0; docs first rejected for a prior-dup now match their
    // admitted prior in the index
    val second = operators.LshBandIndex.admit(spark, batchDocs, dir,
      appendSurvivors = false).collect()
    assert(second.forall(_.getLong(3) == 0L),
      s"replay admitted ${second.count(_.getLong(3) == 1L)} docs — append not served")
    // and the previously-admitted docs specifically are caught by the
    // index side (n_index_dups >= 1), not just the batch-internal gate
    second.filter(r => admitted(r.getLong(0))).foreach { r =>
      assert(r.getLong(1) >= 1L,
        s"doc ${r.getLong(0)} was appended but the index probe missed it")
    }
  }

  test("pinned probe: a delete committing mid-probe stays invisible; a fresh probe honors it") {
    val dir = freshIndex()
    val batch = corpusDocs.filter(col("doc_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = rows(operators.LshBandIndex.probe(spark, batch, dir))
    assert(before.nonEmpty, "probe found no matches — vacuous")
    val victim = before.head._2
    // the delete commits BETWEEN the probe's single manifest pin and
    // its three table reads (bands, sets, tombstones) — per-table
    // resolution would let v2 tombstones hide the victim from v1 bands
    // mid-read; the pinned probe serves the v1 view in full
    val during = rows(operators.LshBandIndex.probeImpl(spark, batch, dir,
      _ => operators.LshBandIndex.delete(spark, Seq(victim), dir)))
    assert(during == before,
      "pinned probe must serve the complete pre-delete view")
    val after = rows(operators.LshBandIndex.probe(spark, batch, dir))
    assert(!after.exists(_._2 == victim),
      "freshly pinned probe still matched the forgotten doc")
  }

  test("probeAt: the pre-admit version serves the old match set; a compact's full vacuum retires it to None") {
    val dir = freshIndex()
    val v0 = operators.IndexManifest.load(spark, dir).get.version
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val before = rows(operators.LshBandIndex.probe(spark, batchDocs, dir))
    operators.LshBandIndex.admit(spark, batchDocs, dir)
    // head probe now self-matches the admitted batch; the retained
    // pre-admit version still serves the corpus-only match set
    val head = rows(operators.LshBandIndex.probe(spark, batchDocs, dir))
    assert(head != before, "fixture: the admit must change the match set")
    val at = operators.LshBandIndex.probeAt(spark, batchDocs, dir, v0)
      .getOrElse(fail("retained pre-admit version must be probeable"))
    assert(rows(at) == before, "time-travel probe diverged")
    // compact vacuums fully by default: the old version retires, loudly
    operators.LshBandIndex.compact(spark, dir)
    assert(operators.LshBandIndex.probeAt(spark, batchDocs, dir, v0)
      .isEmpty, "a fully vacuumed version must resolve None")
  }

  test("planted near-dup is rejected by the index; fresh text is admitted") {
    import spark.implicits._
    val dir = freshIndex()
    // near-dup: a corpus doc's text with one token appended (jaccard of
    // 3-gram shingle sets stays >> 0.8 for 10-99-token docs); fresh: a
    // token sequence that exists nowhere in the synthetic vocabulary
    val donor = corpusDocs.orderBy("doc_id").limit(1)
      .collect().head.getString(1)
    val fresh = (1 to 30).map(i => s"zq$i").mkString(" ")
    val batch = Seq(
      (900001L, donor + " extra"),
      (900002L, fresh)).toDF("doc_id", "text")
    val rows = operators.LshBandIndex
      .admit(spark, batch, dir, appendSurvivors = false)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    assert(rows(900001L)._1 >= 1L && rows(900001L)._2 == 0L,
      s"planted near-dup not caught: ${rows(900001L)}")
    assert(rows(900002L)._1 == 0L && rows(900002L)._2 == 1L,
      s"fresh doc not admitted: ${rows(900002L)}")
  }

  test("bucket-capped admit keeps the planted verdicts (cold buckets unaffected)") {
    import spark.implicits._
    val dir = freshIndex()
    val donor = corpusDocs.orderBy("doc_id").limit(1)
      .collect().head.getString(1)
    val batch = Seq(
      (900001L, donor + " extra"),
      (900002L, (1 to 30).map(i => s"zq$i").mkString(" "))).toDF("doc_id", "text")
    // the planted pair's buckets hold ~2 docs — far below the cap — so
    // the capped probe must reproduce the uncapped verdicts while
    // bounding the fanout a boilerplate mega-bucket could inject
    val rows = operators.LshBandIndex
      .admit(spark, batch, dir, appendSurvivors = false,
        bucketCap = Some(operators.Dedup.BandBucketCap))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    assert(rows(900001L)._1 >= 1L && rows(900001L)._2 == 0L)
    assert(rows(900002L)._1 == 0L && rows(900002L)._2 == 1L)
  }

  test("q159 dup counts equal q37's verified pairs restricted to the split") {
    // cross-operator law: the admit audit is exactly q37's LSH
    // candidate envelope + jaccard gate, restricted to cross-split
    // (index side) and intra-batch smaller-id (prior side) pairs — the
    // two operators share the band and shingle math, so their verified
    // pair sets must agree pair-for-pair
    val pairs = SparkEntry.queries("q37_minhash_lsh_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def isBatch(id: Long) = id % 10 >= 8
    val expIdx = pairs.flatMap { case (a, b) =>
      (isBatch(a), isBatch(b)) match {
        case (false, true) => Some(b)
        case (true, false) => Some(a)
        case _ => None
      }
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expPrior = pairs.filter { case (a, b) => isBatch(a) && isBatch(b) }
      .map(_._2) // q37 emits doc_a < doc_b; the LARGER id carries the prior
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = SparkEntry.queries("q159_lsh_index_admit")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (id, (nIdx, nPrior)) =>
      assert(nIdx == expIdx.getOrElse(id, 0L),
        s"doc $id: q159 n_index_dups $nIdx vs q37 ${expIdx.getOrElse(id, 0L)}")
      assert(nPrior == expPrior.getOrElse(id, 0L),
        s"doc $id: q159 n_prior_dups $nPrior vs q37 ${expPrior.getOrElse(id, 0L)}")
    }
    assert(expIdx.keys.forall(got.contains), "q37 found dups for docs q159 missed")
  }

  test("compact shrinks the file count and leaves probe results bit-identical") {
    import spark.implicits._
    val dir = freshIndex()
    // two nightly appends -> extra file sets under bands/ and sets/
    operators.LshBandIndex.admit(spark,
      Seq((910001L, (1 to 25).map(i => s"ca$i").mkString(" "))).toDF("doc_id", "text"), dir)
    operators.LshBandIndex.admit(spark,
      Seq((910002L, (1 to 25).map(i => s"cb$i").mkString(" "))).toDF("doc_id", "text"), dir)
    // count parquet files across the table's LIVE segments (manifest)
    def parquetFiles(table: String) = {
      val snap = operators.IndexManifest.load(spark, dir).get
      snap.segmentsOf(table).map { seg =>
        new java.io.File(s"$dir/segs/$seg")
          .listFiles().count(_.getName.endsWith(".parquet"))
      }.sum
    }
    val probeBatch = (batchDocs.limit(3).collect().map(r => (r.getLong(0), r.getString(1)))
      :+ ((910001L, (1 to 25).map(i => s"ca$i").mkString(" ")))).toSeq
      .toDF("doc_id", "text")
    val before = operators.LshBandIndex.probe(spark, probeBatch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val filesBefore = parquetFiles("bands")
    operators.LshBandIndex.compact(spark, dir)
    val after = operators.LshBandIndex.probe(spark, probeBatch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before, "compact changed probe results")
    assert(parquetFiles("bands") < filesBefore,
      s"compact did not shrink the bands file count ($filesBefore)")
    // the appended doc must still be served post-compact (jaccard 1.0 self-match)
    assert(after.exists(r => r._1 == 910001L && r._2 == 910001L && r._3 == 1.0))
  }

  test("probe results are bit-identical AT every injected compact crash state (manifest isolation) and after recover + rerun") {
    import spark.implicits._
    val dir = freshIndex()
    val probeBatch = (batchDocs.limit(3).collect()
      .map(r => (r.getLong(0), r.getString(1)))).toSeq.toDF("doc_id", "text")
    def probeNow() = operators.LshBandIndex.probe(spark, probeBatch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = probeNow()
    assert(want.nonEmpty, "probe found nothing — crash test would be vacuous")
    // kill the compact at each injection point in turn. The manifest
    // law is STRONGER than the old recover() contract: the index is
    // fully live and probe-identical AT the crash instant (staged
    // segments are invisible; the commit is one atomic rename; old
    // segments survive until vacuum) — no repair needed to read.
    for (point <- Seq("bands:written", "sets:written", "committed",
        "vacuumed")) {
      val ex = intercept[RuntimeException] {
        operators.LshBandIndex.compactImpl(spark, dir,
          p => if (p == point) throw new RuntimeException(s"boom at $p"))
      }
      assert(ex.getMessage == s"boom at $point")
      assert(probeNow() == want,
        s"probe diverged AT the crash state $point — manifest isolation broken")
      // open-time repair (orphan vacuum) + rerun converge; after a
      // crash at/after the commit there may be nothing left to clean
      val cleaned = operators.LshBandIndex.recover(spark, dir)
      if (point == "bands:written" || point == "sets:written")
        assert(cleaned, s"recover() must vacuum the orphan staged at $point")
      assert(probeNow() == want, s"probe diverged after recover at $point")
      operators.LshBandIndex.compact(spark, dir)
      assert(probeNow() == want, s"probe diverged after rerun at $point")
    }
    // on a healthy index recover is a no-op
    assert(!operators.LshBandIndex.recover(spark, dir))
  }

  test("probe plan touches only the index parquet, and bands reads no shingle sets") {
    import spark.implicits._
    val batch = Seq((900001L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val df = operators.LshBandIndex.probe(spark, batch,
      freshIndex())
    df.collect()
    // sparkPlan (pre-AQE): AdaptiveSparkPlanExec is a leaf — collect
    // can't descend into it (the PlanAuditSpec.scanMeta discipline)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected file scans over the index")
    scans.foreach { s =>
      val loc = s.relation.location.rootPaths.map(_.toString).mkString(",")
      assert(loc.contains("graft-lsh-index"),
        s"probe scanned a non-index file: $loc")
      if (loc.contains("/segs/bands-")) {
        val cols = s.requiredSchema.fieldNames.toSet
        assert(cols == Set("band_id", "bh", "doc_id"),
          s"bands scan read unexpected columns: $cols")
      }
    }
    // the corpus documents table itself must never appear
    val all = df.queryExecution.sparkPlan.toString
    assert(!all.contains("documents.parquet"),
      "probe plan reads the corpus documents table — index not self-contained")
  }

  test("right-to-be-forgotten: tombstone hides the doc at once; compact applies it physically, crash-safely") {
    import spark.implicits._
    val dir = freshIndex()
    def tombstonesLive() =
      operators.IndexManifest.readOpt(spark, dir, "tombstones").isDefined
    val donor = corpusDocs.orderBy("doc_id").limit(1).collect().head
    val donorId = donor.getLong(0)
    val repost = Seq((900001L, donor.getString(1) + " extra"))
      .toDF("doc_id", "text")
    val before = operators.LshBandIndex.probe(spark, repost, dir)
      .collect().map(_.getLong(1)).toSet
    assert(before.contains(donorId),
      "repost must match its donor before the delete")
    operators.LshBandIndex.delete(spark, Seq(donorId), dir)
    // the logical delete is immediate — no compact needed to stop the
    // forgotten doc from matching
    val afterDel = operators.LshBandIndex.probe(spark, repost, dir)
      .collect().map(_.getLong(1)).toSet
    assert(afterDel == before - donorId,
      s"tombstone must hide exactly the donor: $afterDel vs $before")
    if (afterDel.isEmpty) {
      val verdict = operators.LshBandIndex
        .admit(spark, repost, dir, appendSurvivors = false)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(verdict(900001L) == 1L,
        "with its only twin forgotten, the repost is admitted fresh")
    }
    // deleting again is a no-op (idempotence)
    operators.LshBandIndex.delete(spark, Seq(donorId), dir)
    // a compact crashed BEFORE its commit leaves the tombstones live
    // (the rewrite + clear publish atomically); reapplying them on the
    // rerun is a no-op, so the rerun completes the job
    val ex = intercept[RuntimeException] {
      operators.LshBandIndex.compactImpl(spark, dir,
        p => if (p == "sets:written") throw new RuntimeException("boom"))
    }
    assert(ex.getMessage == "boom")
    assert(tombstonesLive(),
      "crash before the commit must keep the tombstones")
    operators.LshBandIndex.recover(spark, dir)
    assert(operators.LshBandIndex.probe(spark, repost, dir)
      .collect().map(_.getLong(1)).toSet == afterDel)
    operators.LshBandIndex.compact(spark, dir)
    assert(!tombstonesLive(), "completed compact clears the tombstones")
    assert(operators.IndexManifest.read(spark, dir, "bands")
      .filter(col("doc_id") === donorId).count() == 0,
      "donor band rows must be physically gone after compact")
    assert(operators.IndexManifest.read(spark, dir, "sets")
      .filter(col("doc_id") === donorId).count() == 0,
      "donor set rows must be physically gone after compact")
    assert(operators.LshBandIndex.probe(spark, repost, dir)
      .collect().map(_.getLong(1)).toSet == afterDel,
      "probe results unchanged across the physical apply")
  }
}

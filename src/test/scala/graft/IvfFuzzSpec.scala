package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Model-based composition fuzz over the IVF ANN lifecycle (the
  * [[Bm25FuzzSpec]] harness applied to the partition-dir vector
  * index): a SEEDED random sequence of append / replayed-append /
  * tombstone-delete / applyDeletes / rebalance steps, checked after
  * EVERY step against the exact model — a FULL-probe query (nprobe =
  * every cell) must rank bit-equal to a brute-force cosine top-k over
  * the logical live vector set, built from SOURCE data the index never
  * touches. Full probe removes the approximation, so any divergence is
  * a lifecycle bug (a lost vector, a resurrected tombstone, a
  * rebalance dropping or duplicating rows), never a recall artifact.
  * Deterministic: fixed seed, shifted-id clones, no wall-clock. */
class IvfFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  import operators.{IvfIndex, Similarity}

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-ivf-fuzz").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** A batch of clones of original vectors under fresh shifted ids —
    * the same construction appendVectors receives in production (and
    * deliberately collision-rich: a clone ties its original's cosine
    * exactly, so the vec_id tiebreak is exercised, not dodged). */
  private def batchOf(shift: Long, origIds: Seq[Long]) =
    Similarity.normed(spark, sf)
      .filter(col("vec_id").isin(origIds: _*))
      .withColumn("vec_id", col("vec_id") + shift)

  private def queryVecs: Seq[Array[Double]] =
    Similarity.normed(spark, sf)
      .filter(col("vec_id").isin(100L, 250L))
      .orderBy("vec_id").select("e").collect()
      .map(_.getSeq[Double](0).toArray).toSeq

  /** Brute-force exact top-k over an explicit live frame, with the
    * index query's own expression and tiebreak — same doubles, same
    * order, or the comparison is about floats instead of lifecycles. */
  private def bruteTopK(live: org.apache.spark.sql.DataFrame,
      q: Array[Double], topK: Int) = {
    graft.functions.VectorFunctions.register(spark)
    val qnrm = math.sqrt(q.map(x => x * x).sum)
    live.withColumn("qe", array(q.map(lit): _*))
      .withColumn("cosine",
        expr("dot_product(e, qe)") / (col("nrm") * lit(qnrm)))
      .select("vec_id", "label", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(topK)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "label", "cosine").collect()
      .map(r => (r.getLong(0), r.get(1), r.getDouble(2))).toSeq

  test("seeded op-sequence fuzz: full-probe query equals brute force over the live set after EVERY step") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir()
    IvfIndex.build(spark, sf, dir) // k = 16 cells over the sf0.001 set
    val allOrig = (0L until 500L).toSeq
    // logical live set, maintained from SOURCE data only
    var liveOrig: Set[Long] = allOrig.toSet
    var batches = Vector.empty[(Long, Seq[Long])] // (shift, origIds)
    var deleted = Set.empty[Long]
    var shift = 10000L
    val trace = new StringBuilder
    def liveFrame() = {
      val base = Similarity.normed(spark, sf)
        .filter(col("vec_id").isin(liveOrig.toSeq: _*))
      batches.map { case (sh, ids) => batchOf(sh, ids) }
        .foldLeft(base)(_ unionByName _)
        .filter(!col("vec_id").isin(deleted.toSeq: _*))
    }
    // every op kind fires at least once, then the seeded random walk
    val kinds = (0 until 5) ++ Seq.fill(5)(rnd.nextInt(5))
    for ((kind, step) <- kinds.zipWithIndex) {
      kind match {
        case 0 =>
          val ids = Seq.fill(3 + rnd.nextInt(3))(rnd.nextInt(500).toLong)
            .distinct
          trace ++= s"append(shift=$shift,$ids) "
          IvfIndex.appendVectors(spark, dir, batchOf(shift, ids))
          batches :+= ((shift, ids))
          shift += 10000L
        case 1 if batches.nonEmpty =>
          // at-least-once delivery: a whole prior batch re-sent — the
          // vec_id anti-join guard must admit nothing twice
          val (sh, ids) = batches(rnd.nextInt(batches.size))
          trace ++= s"replay(shift=$sh) "
          IvfIndex.appendVectors(spark, dir, batchOf(sh, ids))
        case 2 =>
          val liveIds = liveOrig.filter(_ => rnd.nextInt(40) == 0) ++
            batches.flatMap { case (sh, ids) => ids.map(_ + sh) }
              .filterNot(deleted).filter(_ => rnd.nextInt(4) == 0)
          trace ++= s"delete($liveIds) "
          if (liveIds.nonEmpty) {
            IvfIndex.delete(spark, liveIds.toSeq.sorted, dir)
            deleted ++= liveIds
            liveOrig --= liveIds
          }
        case 3 =>
          trace ++= "applyDeletes "
          IvfIndex.applyDeletes(spark, dir)
        case _ =>
          trace ++= "rebalance "
          IvfIndex.rebalance(spark, dir, factor = 1.2)
      }
      val live = liveFrame()
      for ((q, qi) <- queryVecs.zipWithIndex) {
        val got = rowsOf(IvfIndex.query(spark, dir, q,
          topK = 20, nprobe = 1000))
        val want = rowsOf(bruteTopK(live, q, 20))
        assert(got == want,
          s"step $step query $qi diverged from brute force; trace: $trace")
      }
    }
    for (tag <- Seq("append(", "replay(", "delete(", "applyDeletes",
        "rebalance"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
  }

  test("crash-injected retirement COMPACTION: a replayed pre-delete batch admits nothing from any torn state, and the rerun converges") {
    import operators.RetiredIds
    for (seam <- Seq("retired:staged", "retired:committed")) {
      val dir = tmpDir()
      IvfIndex.build(spark, sf, dir)
      val b1 = batchOf(1000000L, Seq(1L, 2L, 3L)); val v1 = 1000001L
      val b2 = batchOf(2000000L, Seq(4L, 5L, 6L)); val v2 = 2000004L
      IvfIndex.appendVectors(spark, dir, b1)
      IvfIndex.appendVectors(spark, dir, b2)
      // cycle 1 commits the first retired segment cleanly
      IvfIndex.delete(spark, Seq(v1), dir)
      assert(IvfIndex.applyDeletes(spark, dir) >= 1)
      // cycle 2 forces the COMPACTION path (threshold 1: old segment +
      // the new batch merge into one) and crashes at the seam
      IvfIndex.delete(spark, Seq(v2), dir)
      val crashed = try {
        IvfIndex.applyDeletesImpl(spark, dir,
          p => if (p == seam) throw new RuntimeException("boom"),
          compactThreshold = 1)
        false
      } catch { case e: RuntimeException => e.getMessage == "boom" }
      assert(crashed, s"crash seam $seam never fired")
      // TORN STATE replay of both original batches: whichever manifest
      // version is live lists a COMPLETE retired set, so v1 can never
      // come back; v2's rows are still stored (its physical apply never
      // ran) so the stored-ids guard rejects its batch
      IvfIndex.appendVectors(spark, dir, b1)
      IvfIndex.appendVectors(spark, dir, b2)
      val stored = spark.read.parquet(s"$dir/vectors")
      assert(stored.filter(col("vec_id") === v1).count() == 0L,
        s"$seam: torn compaction resurrected the retired vector")
      assert(stored.filter(col("vec_id") === v2).count() == 1L,
        s"$seam: torn-state replay double-admitted or dropped v2")
      // the rerun completes retire + physical removal + compaction
      assert(IvfIndex.applyDeletesImpl(spark, dir, _ => (),
        compactThreshold = 1) >= 1)
      // replay once more AFTER the completed compaction
      IvfIndex.appendVectors(spark, dir, b1)
      IvfIndex.appendVectors(spark, dir, b2)
      // full-probe equals brute force over the logical live set
      val live = Similarity.normed(spark, sf)
        .unionByName(batchOf(1000000L, Seq(1L, 2L, 3L)))
        .unionByName(batchOf(2000000L, Seq(4L, 5L, 6L)))
        .filter(!col("vec_id").isin(v1, v2))
      for (q <- queryVecs) {
        val got = rowsOf(IvfIndex.query(spark, dir, q,
          topK = 20, nprobe = 1000))
        assert(got == rowsOf(bruteTopK(live, q, 20)),
          s"$seam: post-convergence probe diverged from brute force")
      }
      // compaction collapsed the set to ONE live segment with both ids
      // exactly once (dup rows from the crashed retire are gone), and
      // vacuum physically reclaimed the superseded files
      val snap = operators.IndexManifest.snapshot(spark, dir)
      assert(snap.segmentsOf("retired").size == 1,
        s"$seam: expected one compacted segment, got ${snap.segmentsOf("retired")}")
      val segsOnDisk = new java.io.File(s"$dir/segs").listFiles()
        .map(_.getName).filter(_.startsWith("retired-")).toSeq
      assert(segsOnDisk == snap.segmentsOf("retired"),
        s"$seam: vacuum left superseded segments on disk: $segsOnDisk")
      assert(RetiredIds.count(spark, dir) == 2L,
        s"$seam: retired set must hold exactly the two forgotten ids")
    }
  }

  test("crash-injected LEGACY MIGRATE on the retire path: the renamed-but-uncommitted instant never resurrects a pre-manifest forgotten vector") {
    import spark.implicits._
    val dir = tmpDir()
    IvfIndex.build(spark, sf, dir)
    val b1 = batchOf(3000000L, Seq(1L, 2L, 3L)).localCheckpoint()
    val v1 = 3000001L
    IvfIndex.appendVectors(spark, dir, b1)
    // fabricate the round-16 endstate for v1: forgotten PRE-manifest —
    // its id in the plain retired/ dir, its rows physically gone
    Seq(v1).toDF("vec_id").repartition(1)
      .write.parquet(s"$dir/retired")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val vecsP = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    val survivors = spark.read.parquet(vecsP.toString)
      .filter(col("vec_id") =!= v1).localCheckpoint()
    fs.delete(vecsP, true)
    survivors.write.partitionBy("cell").parquet(vecsP.toString)
    // the first post-upgrade sweep runs migrate inside its retire;
    // crash at the torn instant — legacy dir renamed into segs/, no
    // manifest committed yet
    val v2 = 3000002L
    IvfIndex.delete(spark, Seq(v2), dir)
    val crashed = try {
      IvfIndex.applyDeletesImpl(spark, dir,
        p => if (p == "migrate:moved:retired")
          throw new RuntimeException("boom"))
      false
    } catch { case e: RuntimeException => e.getMessage == "boom" }
    assert(crashed, "the migrate crash seam never fired")
    assert(!new java.io.File(s"$dir/retired").exists &&
      operators.IndexManifest.load(spark, dir).isEmpty,
      "the crash must land between the rename and the commit")
    // TORN-STATE replay of the pre-delete batch: v1's rows are gone,
    // so only the retirement memory — now living at segs/retired-legacy
    // — stands between the replay and a resurrection
    IvfIndex.appendVectors(spark, dir, b1)
    assert(spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id") === v1).count() == 0L,
      "torn migrate resurrected a pre-manifest forgotten vector")
    // the rerun adopts the moved segment, completes the sweep, and the
    // converged index serves brute-force-exact over the live set
    assert(IvfIndex.applyDeletes(spark, dir) >= 1)
    IvfIndex.appendVectors(spark, dir, b1)
    val live = Similarity.normed(spark, sf)
      .unionByName(batchOf(3000000L, Seq(1L, 2L, 3L)))
      .filter(!col("vec_id").isin(v1, v2))
    for (q <- queryVecs) {
      val got = rowsOf(IvfIndex.query(spark, dir, q, topK = 20,
        nprobe = 1000))
      assert(got == rowsOf(bruteTopK(live, q, 20)),
        "post-migrate probe diverged from brute force")
    }
    assert(operators.RetiredIds.count(spark, dir) == 2L,
      "retired set must hold exactly the legacy id and the new victim")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Model-based composition fuzz over the IVF-PQ lifecycle — the sixth
  * and last persisted lifecycle under the [[Bm25FuzzSpec]] harness.
  * Model: a TWIN index built identically (same corpus, same seed →
  * same coarse centroids and PQ codebooks) that receives only the
  * CANONICAL op sequence — each append once (replays skipped), each
  * delete as a tombstone, never applyDeletes, never rebalance. After
  * EVERY fuzzed step the real index's FULL-probe ADC ranking must be
  * bit-equal to the twin's, which proves the three equivalences the
  * per-op specs pin in isolation compose under interleaving: a
  * replayed append admits nothing, applyDeletes' physical removal ≡
  * the tombstone anti-join, and rebalance is a pure repartitioning
  * (codes and ADC untouched; cell ids excluded from the comparison
  * since repartitioning is exactly what rebalance is FOR).
  * Deterministic: fixed seed, shifted-id clones, no wall-clock. */
class IvfPqFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  import operators.{IvfPq, Similarity}

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-ivfpq-fuzz").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def batchOf(shift: Long, origIds: Seq[Long]) =
    Similarity.normed(spark, sf)
      .filter(col("vec_id").isin(origIds: _*))
      .withColumn("vec_id", col("vec_id") + shift)

  private def queryVecs: Seq[Array[Double]] =
    Similarity.normed(spark, sf)
      .filter(col("vec_id").isin(100L, 250L))
      .orderBy("vec_id").select("e").collect()
      .map(_.getSeq[Double](0).toArray).toSeq

  /** (vec_id, label, adc) — cell deliberately dropped: rebalance moves
    * rows between cells by design, everything else must be identical. */
  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "label", "adc_dist").collect()
      .map(r => (r.getLong(0), r.get(1), r.getDouble(2))).toSeq

  test("seeded op-sequence fuzz: full-probe ADC equals the canonical-twin index after EVERY step") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir()
    val twin = tmpDir()
    IvfPq.build(spark, sf, dir)
    IvfPq.build(spark, sf, twin) // same corpus + seed: same quantizers
    var batches = Vector.empty[(Long, Seq[Long])]
    var shift = 10000L
    val trace = new StringBuilder
    // every op kind fires at least once, then the seeded random walk
    val kinds = (0 until 5) ++ Seq.fill(5)(rnd.nextInt(5))
    for ((kind, step) <- kinds.zipWithIndex) {
      kind match {
        case 0 =>
          val ids = Seq.fill(3 + rnd.nextInt(3))(rnd.nextInt(500).toLong)
            .distinct
          trace ++= s"append(shift=$shift) "
          IvfPq.append(spark, dir, batchOf(shift, ids))
          IvfPq.append(spark, twin, batchOf(shift, ids))
          batches :+= ((shift, ids))
          shift += 10000L
        case 1 if batches.nonEmpty =>
          val (sh, ids) = batches(rnd.nextInt(batches.size))
          trace ++= s"replay(shift=$sh) "
          IvfPq.append(spark, dir, batchOf(sh, ids)) // twin: skipped
        case 2 =>
          val pool = (0L until 500L) ++
            batches.flatMap { case (sh, ids) => ids.map(_ + sh) }
          val victims = pool.filter(_ => rnd.nextInt(60) == 0)
          trace ++= s"delete(${victims.size}) "
          if (victims.nonEmpty) {
            IvfPq.delete(spark, victims.sorted, dir)
            IvfPq.delete(spark, victims.sorted, twin)
          }
        case 3 =>
          trace ++= "applyDeletes "
          IvfPq.applyDeletes(spark, dir) // twin keeps tombstones only
        case _ =>
          trace ++= "rebalance "
          IvfPq.rebalance(spark, dir, factor = 1.2)
      }
      for ((q, qi) <- queryVecs.zipWithIndex) {
        val got = rowsOf(IvfPq.query(spark, dir, q,
          topK = 20, nprobe = 1000))
        val want = rowsOf(IvfPq.query(spark, twin, q,
          topK = 20, nprobe = 1000))
        assert(got == want,
          s"step $step query $qi diverged from the canonical twin; trace: $trace")
      }
    }
    for (tag <- Seq("append(", "replay(", "delete(", "applyDeletes",
        "rebalance"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
  }

  test("crash-injected retirement compaction on the CODES lifecycle: no torn state resurrects a forgotten vector; the rerun converges") {
    import operators.RetiredIds
    for (seam <- Seq("retired:staged", "retired:committed")) {
      val dir = tmpDir()
      IvfPq.build(spark, sf, dir)
      val b1 = batchOf(1000000L, Seq(1L, 2L, 3L)); val v1 = 1000001L
      val b2 = batchOf(2000000L, Seq(4L, 5L, 6L)); val v2 = 2000004L
      IvfPq.append(spark, dir, b1)
      IvfPq.append(spark, dir, b2)
      IvfPq.delete(spark, Seq(v1), dir)
      assert(IvfPq.applyDeletes(spark, dir) >= 1)
      IvfPq.delete(spark, Seq(v2), dir)
      val crashed = try {
        IvfPq.applyDeletesImpl(spark, dir,
          p => if (p == seam) throw new RuntimeException("boom"),
          compactThreshold = 1)
        false
      } catch { case e: RuntimeException => e.getMessage == "boom" }
      assert(crashed, s"crash seam $seam never fired")
      // torn-state replay: the manifest's live version (old or new)
      // lists a complete retired set — v1 stays out; v2's code rows
      // are still stored, so its batch is rejected by the stored guard
      IvfPq.append(spark, dir, b1)
      IvfPq.append(spark, dir, b2)
      val codes = spark.read.parquet(s"$dir/codes")
      assert(codes.filter(col("vec_id") === v1).count() == 0L,
        s"$seam: torn compaction resurrected the retired code row")
      assert(codes.filter(col("vec_id") === v2).count() == 1L,
        s"$seam: torn-state replay double-admitted or dropped v2")
      assert(IvfPq.applyDeletesImpl(spark, dir, _ => (),
        compactThreshold = 1) >= 1)
      IvfPq.append(spark, dir, b1)
      IvfPq.append(spark, dir, b2)
      // neither forgotten vector is served at full probe; survivors are
      assert(RetiredIds.count(spark, dir) == 2L)
      val served = rowsOf(IvfPq.query(spark, dir, queryVecs.head,
        topK = Int.MaxValue, nprobe = 1000)).map(_._1).toSet
      assert(!served.contains(v1) && !served.contains(v2),
        s"$seam: a forgotten vector was served after convergence")
      assert(served.contains(1000002L) && served.contains(2000005L),
        s"$seam: a surviving appended vector went missing")
      val snap = operators.IndexManifest.snapshot(spark, dir)
      assert(snap.segmentsOf("retired").size == 1,
        s"$seam: expected one compacted segment")
    }
  }
}

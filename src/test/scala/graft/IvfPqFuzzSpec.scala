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
}

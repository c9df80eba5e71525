package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The one residual durability window the partition-dir ANN indexes
  * document (IvfIndex scaladoc: Spark's own file-commit protocol can
  * surface a SUBSET of an append's files after a crash during job
  * commit — never torn rows, parquet files land whole). This spec
  * makes the documented BOUND a tested law on both append paths:
  *
  *   1. at the torn state, every SERVED row is a genuine stored vector
  *      with its exact score — the window costs a transient recall dip
  *      (some batch vectors invisible), never a wrong served vector;
  *   2. the replay (same batch, vec_id anti-join guard) converges to
  *      the clean fully-appended state, one stored row per vector.
  *
  * The torn state is constructed by performing the append and then
  * deleting HALF of the files it created — exactly what a crash
  * mid-commit leaves: some task files moved into place, some not. */
class IvfCrashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Relative paths of all parquet data files under `root`. */
  private def dataFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath.stripPrefix(root)).toSet
  }

  /** Delete half of `fresh` (sorted, deterministic), returning how many
    * were removed; requires the batch to span at least two files so the
    * torn state is genuinely partial. */
  private def tearHalf(root: String, fresh: Set[String]): Int = {
    require(fresh.size >= 2,
      s"fixture too small: append produced ${fresh.size} file(s); " +
        "a partial commit needs at least 2")
    val victims = fresh.toSeq.sorted.take(fresh.size / 2)
    victims.foreach(rel => assert(new java.io.File(root + rel).delete(),
      s"could not remove $rel"))
    spark.catalog.refreshByPath(root)
    victims.size
  }

  private def batchOf(shift: Long) = operators.Similarity.normed(spark, sf)
    .filter(col("vec_id") >= 100 && col("vec_id") < 110)
    .withColumn("vec_id", col("vec_id") + shift)

  private def queryVec: Array[Double] =
    operators.Similarity.normed(spark, sf).filter(col("vec_id") === 100)
      .select("e").collect()(0).getSeq[Double](0).toArray

  test("IVF: a partial append commit never serves a wrong vector; the replay converges to the clean state") {
    val path = tmpDir("graft-ivf-crash")
    val twin = tmpDir("graft-ivf-crash-twin")
    operators.IvfIndex.build(spark, sf, path)
    operators.IvfIndex.build(spark, sf, twin) // same seed: same quantizer
    val batch = batchOf(20000L)
    operators.IvfIndex.appendVectors(spark, twin, batch)
    // ground truth: the converged index's FULL exact-cosine ranking
    val truth = operators.IvfIndex.query(spark, twin, queryVec,
        topK = Int.MaxValue, nprobe = 16).collect()
      .map(r => r.getLong(0) -> (r.get(1), r.getDouble(3))).toMap
    // the crash: append, then only half of its files were installed
    val pre = dataFiles(s"$path/vectors")
    operators.IvfIndex.appendVectors(spark, path, batch)
    val removed = tearHalf(s"$path/vectors",
      dataFiles(s"$path/vectors") -- pre)
    // law 1 — the torn index answers, and every served row is a real
    // stored vector with its exact cosine (recall may dip; values may not lie)
    val torn = operators.IvfIndex.query(spark, path, queryVec,
      topK = 10, nprobe = 16).collect()
    assert(torn.nonEmpty, "torn index must keep serving")
    torn.foreach { r =>
      val want = truth.getOrElse(r.getLong(0),
        fail(s"torn state served unknown vec ${r.getLong(0)}"))
      assert(want == ((r.get(1), r.getDouble(3))),
        s"torn state served vec ${r.getLong(0)} with wrong label/cosine")
    }
    // law 2 — the blind replay re-admits exactly the missing vectors
    operators.IvfIndex.appendVectors(spark, path, batch)
    val perVec = spark.read.parquet(s"$path/vectors")
      .filter(col("vec_id") >= 20000L)
      .groupBy("vec_id").count().collect()
    assert(perVec.length == 10 && perVec.forall(_.getLong(1) == 1L),
      s"replay must store each batch vector exactly once (removed $removed files)")
    val got = operators.IvfIndex.query(spark, path, queryVec,
      topK = 10, nprobe = 16).collect().map(_.toString).toSeq
    val want = operators.IvfIndex.query(spark, twin, queryVec,
      topK = 10, nprobe = 16).collect().map(_.toString).toSeq
    assert(got == want, "replayed index diverged from the clean build+append")
  }

  test("IVF-PQ: a partial append commit never serves a wrong code; the replay converges to the clean state") {
    val k = 8 // the IvfPqSpec CoarseK convention (sf0.001-sized corpus)
    val path = tmpDir("graft-ivfpq-crash")
    val twin = tmpDir("graft-ivfpq-crash-twin")
    operators.IvfPq.build(spark, sf, path, k = k)
    operators.IvfPq.build(spark, sf, twin, k = k)
    val batch = batchOf(30000L)
    operators.IvfPq.append(spark, twin, batch)
    val truth = operators.IvfPq.query(spark, twin, queryVec,
        topK = Int.MaxValue, nprobe = k).collect()
      .map(r => r.getLong(0) -> (r.get(1), r.getDouble(3))).toMap
    val pre = dataFiles(s"$path/codes")
    operators.IvfPq.append(spark, path, batch)
    val removed = tearHalf(s"$path/codes", dataFiles(s"$path/codes") -- pre)
    val torn = operators.IvfPq.query(spark, path, queryVec,
      topK = 10, nprobe = k).collect()
    assert(torn.nonEmpty, "torn index must keep serving")
    torn.foreach { r =>
      val want = truth.getOrElse(r.getLong(0),
        fail(s"torn state served unknown vec ${r.getLong(0)}"))
      assert(want == ((r.get(1), r.getDouble(3))),
        s"torn state served vec ${r.getLong(0)} with wrong label/ADC")
    }
    operators.IvfPq.append(spark, path, batch)
    val perVec = spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") >= 30000L)
      .groupBy("vec_id").count().collect()
    assert(perVec.length == 10 && perVec.forall(_.getLong(1) == 1L),
      s"replay must store each batch vector exactly once (removed $removed files)")
    val got = operators.IvfPq.query(spark, path, queryVec,
      topK = 10, nprobe = k).collect().map(_.toString).toSeq
    val want = operators.IvfPq.query(spark, twin, queryVec,
      topK = 10, nprobe = k).collect().map(_.toString).toSeq
    assert(got == want, "replayed index diverged from the clean build+append")
  }
}

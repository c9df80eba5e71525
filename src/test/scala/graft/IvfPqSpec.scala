package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IVF-PQ composed index lifecycle. The coarse quantizer is a seeded
  * KMeans fit (no direct oracle — the q50/q55 class), so correctness
  * is pinned by cross-laws against the DuckDB-oracled PQ queries: with
  * nprobe = all cells the pruning is a no-op and the lifecycle must
  * reproduce q162 (ADC top-k) and q164 (rerank top-k) EXACTLY, ADC and
  * cosine values bit-equal — the driver-side ADC table and the
  * engines' in-plan table share the same left-fold arithmetic. */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private val CoarseK = 16

  private lazy val indexDir: String = {
    val dir = Files.createTempDirectory("graft-ivfpq-index").toFile
    dir.deleteOnExit()
    operators.IvfPq.build(spark, sf, dir.getAbsolutePath, k = CoarseK)
    dir.getAbsolutePath
  }

  private def queryVec: Array[Double] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("e"))
      .collect()(0).getSeq[Double](0).toArray

  test("query scans only the probed cells' code partitions, never the vectors") {
    // queryPlan = the lazy single-attempt plan (query itself is eager
    // under the probe-retry policy and returns a local frame)
    val df = operators.IvfPq.queryPlan(spark, indexDir, queryVec,
      topK = 10, nprobe = 4)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "cell filter must prune partitions")
    assert(scan.selectedPartitions.partitionCount <= 4,
      s"scan touched ${scan.selectedPartitions.partitionCount} partitions")
    // the codes table carries no embedding column at all — the scan
    // physically cannot read float vectors
    assert(!scan.requiredSchema.fieldNames.contains("e"))
    assert(!df.queryExecution.sparkPlan.toString.contains("embeddings.parquet"),
      "ADC stage must not touch the embeddings table")
  }

  test("nprobe = all cells reproduces the oracled q162 rows, ADC bit-equal") {
    val got = operators.IvfPq.query(spark, indexDir, queryVec,
      topK = 11, nprobe = CoarseK).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    // the query vector itself is a codebook donor: its codes' codewords
    // ARE its subvectors, so its ADC distance is exactly 0.0 and it
    // ranks first — drop it to align with q162's vec_id <> 0 filter
    assert(got.head._1 == 0L && got.head._3 == 0.0,
      s"query vector not at exact ADC 0: ${got.head}")
    val want = SparkEntry.queries("q162_pq_adc_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.drop(1).toSeq == want.toSeq,
      "lifecycle ADC diverged from the oracle-checked q162")
  }

  test("nprobe = all cells + rerank reproduces the oracled q164 rows, cosine bit-equal") {
    val w = operators.Similarity.normed(spark, sf)
    val got = operators.IvfPq.queryRerank(spark, indexDir, w, queryVec,
      topK = 11, nprobe = CoarseK, shortlist = 101).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got.head._1 == 0L, "self-match must lead the exact rerank")
    val want = SparkEntry.queries("q164_pq_rerank_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got.drop(1).toSeq == want.toSeq,
      "lifecycle rerank diverged from the oracle-checked q164")
  }

  test("pruned probe (nprobe=4) returns a full top-k from probed cells only") {
    val got = operators.IvfPq.query(spark, indexDir, queryVec,
      topK = 10, nprobe = 4).collect()
    assert(got.length == 10)
    val cells = got.map(_.getInt(2)).distinct
    assert(cells.length <= 4, s"results from ${cells.length} cells with nprobe=4")
    val dists = got.map(_.getDouble(3))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
      "not sorted by ADC")
    // pruning can only LOSE candidates vs the all-cells probe: every
    // pruned-probe result must appear in the all-cells ranking with
    // the same ADC value
    val all = operators.IvfPq.query(spark, indexDir, queryVec,
      topK = 500, nprobe = CoarseK).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.foreach { r =>
      assert(all(r.getLong(0)) == r.getDouble(3),
        s"vec ${r.getLong(0)} ADC changed under pruning")
    }
  }

  test("append encodes with the persisted quantizers, touches only its cells, and is immediately queryable") {
    val dir = Files.createTempDirectory("graft-ivfpq-append").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    operators.IvfPq.build(spark, sf, path, k = CoarseK)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"),
        (0 until operators.Similarity.PqM).map(m => r.getAs[Int](s"code_$m")),
        r.getAs[Int]("cell"))
    val before = spark.read.parquet(s"$path/codes").collect().map(key).toSet
    def cellFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(s"$path/codes")
      root.listFiles().filter(_.getName.startsWith("cell=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).toSet
      }.toMap
    }
    val filesBefore = cellFiles()
    // batch: re-id'ed clones of vectors 100..109 — known PQ codes (the
    // originals'), fresh ids so existing rows must be bit-untouched
    val batch = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") >= 100 && col("vec_id") < 110)
      .withColumn("vec_id", col("vec_id") + 10000)
    operators.IvfPq.append(spark, path, batch)
    val after = spark.read.parquet(s"$path/codes").collect().map(key).toSet
    assert(after.size == before.size + 10)
    assert(before.subsetOf(after), "append must not rewrite existing rows")
    // appended codes = pqEncodeScan over the batch with the PERSISTED
    // codebooks (the encode-with-frozen-artifact law)
    val cbRows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    val cbs = (0 until operators.Similarity.PqM).map(m =>
      (0 until operators.Similarity.PqK).map(j => cbRows((m, j))): Seq[Array[Double]])
    val expected = operators.Similarity.pqEncodeScan(batch, cbs).collect()
      .map(r => r.getLong(0) ->
        (1 to operators.Similarity.PqM).map(r.getInt)).toMap
    val appended = (after -- before).map(t => t._1 -> t._2).toMap
    assert(appended.keySet == expected.keySet)
    appended.foreach { case (id, codes) =>
      assert(codes == expected(id), s"vec $id codes drifted from the frozen codebook encode")
    }
    // only the batch's cells gained files; untouched cell dirs are
    // byte-for-byte the same file sets
    val touched = (after -- before).map(t => s"cell=${t._3}")
    cellFiles().foreach { case (cell, files) =>
      if (!touched(cell))
        assert(filesBefore(cell) == files, s"append touched unrelated $cell")
    }
    // a clone of vec 100 must rank beside it with the IDENTICAL ADC
    val q100 = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 100).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val ranks = operators.IvfPq.query(spark, path, q100,
      topK = 5, nprobe = CoarseK).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ranks.contains(100L) && ranks.contains(10100L),
      s"clone must be queryable immediately: $ranks")
    assert(ranks(100L) == ranks(10100L), "identical vectors, identical codes, identical ADC")
    // replay law: re-appending the same batch is a no-op (the vec_id
    // guard) — the codes table is row-identical
    operators.IvfPq.append(spark, path, batch)
    val replayed = spark.read.parquet(s"$path/codes").collect().map(key).toSet
    assert(replayed == after, "replayed append changed the codes table")
  }

  test("drift audit flags a clone burst; rebalance splits it and is a pure repartitioning (full-probe ADC bit-identical)") {
    val dir = Files.createTempDirectory("graft-ivfpq-rebal").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    operators.IvfPq.build(spark, sf, path, k = CoarseK)
    // clone burst: 60 re-id'ed copies of vector 100 pile into ONE cell
    val burst = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 100)
      .crossJoin(spark.range(60).select(col("id")))
      .withColumn("vec_id", col("id") + 20000).drop("id")
    operators.IvfPq.append(spark, path, burst)
    val audit = operators.IvfPq.driftAudit(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.get(2)))
    assert(audit.map(_._2).sum == 560L, "audit must account for every code row")
    val burstCell = spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === 20000L).select("cell").collect()(0).getInt(0)
    assert(audit.maxBy(_._2)._1 == burstCell,
      "the burst cell must dominate the population audit")
    // full-probe ADC before the rebalance
    val before = operators.IvfPq.query(spark, path, queryVec,
      topK = 30, nprobe = 256).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val splits = operators.IvfPq.rebalance(spark, path)
    assert(splits >= 1, "the burst cell must be split")
    // codes are never re-encoded: same row count, and the full-probe
    // answer is BIT-identical — a rebalance only repartitions the
    // search space
    assert(spark.read.parquet(s"$path/codes").count() == 560L)
    val after = operators.IvfPq.query(spark, path, queryVec,
      topK = 30, nprobe = 256).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(before.toSeq == after.toSeq,
      "full-probe ADC ranking must be unchanged by a rebalance")
    // centroids/codes stay consistent and the loop reaches a fixpoint
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(_.getInt(0)).toSet
    val cellsNow = spark.read.parquet(s"$path/codes")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cellsNow.subsetOf(cents),
      "every code partition must be probeable after the rebalance")
    operators.IvfPq.rebalanceToConvergence(spark, path)
    assert(operators.IvfPq.rebalance(spark, path) == 0,
      "convergence loop must reach a fixpoint")
  }

  test("right-to-be-forgotten: tombstone hides a code at once; apply prunes only touched cells; rerun is a no-op") {
    // own index dir — this test mutates
    val dir = Files.createTempDirectory("graft-ivfpq-del").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    operators.IvfPq.build(spark, sf, path, k = CoarseK)
    val full = operators.IvfPq.query(spark, path, queryVec,
      topK = 11, nprobe = CoarseK).collect()
    val victim = full.head.getLong(0)
    val victimCell = full.head.getInt(2)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def cellFiles(c: Int) = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/codes/cell=$c"))
      .map(_.getPath.getName).toSet
    val untouchedCell = spark.read.parquet(s"$path/codes")
      .select("cell").distinct().collect().map(_.getInt(0))
      .filter(_ != victimCell).head
    val untouchedBefore = cellFiles(untouchedCell)
    // logical hide: served top-k changes immediately, codes untouched
    operators.IvfPq.delete(spark, Seq(victim), path)
    val hidden = operators.IvfPq.query(spark, path, queryVec,
      topK = 10, nprobe = CoarseK).collect()
    assert(!hidden.map(_.getLong(0)).contains(victim), "tombstoned code served")
    assert(hidden.map(_.getLong(0)).toSeq ==
      full.map(_.getLong(0)).filterNot(_ == victim).take(10).toSeq,
      "deletion must promote the next candidate")
    // physical apply: only the victim's cell partition is rewritten
    val n = operators.IvfPq.applyDeletes(spark, path)
    assert(n == 1, s"exactly one cell touched, got $n")
    assert(cellFiles(untouchedCell) == untouchedBefore,
      "untouched cells' files must not be rewritten")
    spark.catalog.refreshByPath(path)
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === victim).isEmpty, "code physically gone")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")),
      "tombstones cleared after apply")
    // rerun (the crash-retry path) is a no-op
    assert(operators.IvfPq.applyDeletes(spark, path) == 0)
    val after = operators.IvfPq.query(spark, path, queryVec,
      topK = 10, nprobe = CoarseK).collect().map(_.getLong(0)).toSeq
    assert(after == hidden.map(_.getLong(0)).toSeq,
      "served results must be identical before and after the physical apply")
  }

  test("mutations hold the maintenance lease: a second holder fails fast, reads stay lock-free") {
    import operators.{IvfPq, MaintenanceLock}
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-lock")
      .toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    IvfPq.build(spark, sf, idx, k = CoarseK)
    val batch = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 50000L)
    MaintenanceLock.withLockAs(spark, idx, "sweeper@elsewhere") {
      intercept[MaintenanceLock.LockHeldException] {
        IvfPq.append(spark, idx, batch)
      }
      intercept[MaintenanceLock.LockHeldException] {
        IvfPq.delete(spark, Seq(0L), idx)
      }
      intercept[MaintenanceLock.LockHeldException] {
        IvfPq.applyDeletes(spark, idx)
      }
      intercept[MaintenanceLock.LockHeldException] {
        IvfPq.rebalance(spark, idx)
      }
      assert(IvfPq.query(spark, idx, queryVec, topK = 5,
        nprobe = CoarseK).count() == 5L)
      ()
    }
    IvfPq.append(spark, idx, batch)
    assert(spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") >= 50000L).count() == 3L)
    IvfPq.rebalanceToConvergence(spark, idx, maxRounds = 1)
  }

  test("a forgotten code row is NOT resurrected by an at-least-once replay after delete + applyDeletes") {
    import operators.IvfPq
    val dir = Files.createTempDirectory("graft-ivfpq-retired").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    IvfPq.build(spark, sf, idx, k = CoarseK)
    val batch = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 900000L)
    IvfPq.append(spark, idx, batch)
    val victim = 900002L
    IvfPq.delete(spark, Seq(victim), idx)
    assert(IvfPq.applyDeletes(spark, idx) >= 1)
    // the whole original batch replays AFTER its victim was forgotten
    // and physically removed — the retired table must keep it out
    IvfPq.append(spark, idx, batch)
    assert(spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") === victim).count() == 0L,
      "replayed append resurrected a forgotten code row")
    assert(spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") >= 900000L).count() == 4L,
      "replay double-admitted or dropped the batch's survivors")
    val served = IvfPq.query(spark, idx, queryVec,
      topK = 1000, nprobe = 1000).collect().map(_.getLong(0)).toSet
    assert(!served.contains(victim), "forgotten vector served after replay")
  }

  test("servingHealth over the codes table counts code rows and shares the audit columns") {
    val h = operators.IvfPq.servingHealth(spark, indexDir).collect()(0)
    val nCodes = spark.read.parquet(s"$indexDir/codes").count()
    assert(h.getAs[Long]("n_vectors") == nCodes)
    assert(h.getAs[Int]("n_cells") > 1)
    assert(h.getAs[Double]("hot_factor") >= 1.0)
    assert(h.getAs[Long]("orphan_cells") == 0L)
    assert(h.getAs[Long]("probe_rows_worst") >= h.getAs[Double]("probe_rows_mean").toLong)
  }

  test("PQ probe survives a rebalance landing between its centroid read and its codes scan") {
    import spark.implicits._
    import operators.IvfPq
    val dir = Files.createTempDirectory("graft-ivfpq-probe-race").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    IvfPq.build(spark, sf, idx, k = CoarseK)
    // skew one cell (jittered clones of the query vector) so the
    // injected rebalance performs a real split
    val q = queryVec
    val total = spark.read.parquet(s"$idx/codes").count()
    val clones = (0L until total).map { i =>
      val e = q.toSeq.updated(0, q(0) + 1e-3 * i)
      (3000000L + i, 7, e, math.sqrt(e.map(x => x * x).sum))
    }.toDF("vec_id", "label", "e", "nrm")
    IvfPq.append(spark, idx, clones)
    var splits = -1
    val got = IvfPq.queryImpl(spark, idx, q, topK = 10, nprobe = 10000,
      afterPin = attempt => {
        if (attempt == 1) { splits = IvfPq.rebalance(spark, idx, 2.0); () }
      }, sleep = _ => ())
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(splits >= 1, "fixture: the injected rebalance must split a cell")
    // rebalance never re-encodes: at nprobe = all cells the ADC answer
    // is invariant, so the raced probe must equal the quiesced probe
    val want = IvfPq.query(spark, idx, q, topK = 10, nprobe = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == want,
      "PQ probe racing a rebalance must re-plan to the correct top-k")
  }

  test("queryFiltered over codes: data-sized over-fetch equals the exact filtered ADC top-k; rank preservation pins the prefix; absent labels fail loudly") {
    import operators.{IvfIndex, IvfPq}
    val dir = Files.createTempDirectory("graft-pq-filtered").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    IvfPq.build(spark, sf, idx)
    IvfPq.writeLabelStats(spark, idx)
    val q = queryVec
    // the exact filtered ADC truth: rank preservation means filtering
    // the FULL ADC order by label gives the filtered truth directly
    val nCodes = spark.read.parquet(s"$idx/codes").count().toInt
    val fullAdc = IvfPq.queryPlan(spark, idx, q,
        topK = nCodes + 1, nprobe = 10000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    val labels = fullAdc.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (l, n) => (-n, l) }
    for (lab <- Seq(labels.head._1, labels.last._1)) {
      val want = fullAdc.filter(_._2 == lab).take(5)
        .map(r => (r._1, r._3)).toSeq
      val got = IvfPq.queryFiltered(spark, idx, q, topK = 5,
        col("label") === lab, nprobe = 10000)
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
      assert(got == want,
        s"label $lab: filtered ADC top-5 must equal the exact filtered truth")
    }
    intercept[IvfIndex.NoMatchInProbedCells] {
      IvfPq.queryFiltered(spark, idx, q, topK = 5,
        col("label") === 9999, nprobe = 4)
    }
  }

  test("queryRerankFiltered cross-law: full probe + ample shortlist equals the brute-force filtered cosine top-k") {
    import operators.{IvfPq, Similarity}
    val dir = Files.createTempDirectory("graft-pq-rerank-filtered").toFile
    dir.deleteOnExit()
    val idx = dir.getAbsolutePath
    IvfPq.build(spark, sf, idx)
    IvfPq.writeLabelStats(spark, idx)
    val q = queryVec
    val w = Similarity.normed(spark, sf)
    graft.functions.VectorFunctions.register(spark)
    val lab = w.groupBy("label").count()
      .orderBy(desc("count"), asc("label")).collect()(0).getInt(0)
    val nLab = w.filter(col("label") === lab).count().toInt
    // with nprobe = all cells and shortlist >= every matching row, the
    // filtered ADC stage passes ALL matching candidates to the exact
    // rerank — the answer must be the brute filtered cosine top-5
    val got = IvfPq.queryRerankFiltered(spark, idx, w, q, topK = 5,
      col("label") === lab, nprobe = 10000, shortlist = nLab + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val qnrm = math.sqrt(q.map(x => x * x).sum)
    val want = w.filter(col("label") === lab)
      .withColumn("qe", array(q.map(lit): _*))
      .withColumn("cosine",
        expr("dot_product(e, qe)") / (col("nrm") * lit(qnrm)))
      .select("vec_id", "cosine")
      .orderBy(desc("cosine"), asc("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want,
      "filtered two-stage rerank must equal brute filtered cosine top-k")
  }
}

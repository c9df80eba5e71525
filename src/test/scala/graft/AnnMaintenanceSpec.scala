package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming ANN maintainer: exactly-once appends without a
  * marker (vec_id identity + the anti-join guard), lease contention
  * absorbed by bounded retry, drift-triggered rebalance on the
  * configured cadence, and the offline-quantizer bootstrap contract. */
class AnnMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  import streaming.AnnMaintenance
  import streaming.AnnMaintenance.EmbeddingEvt
  import operators.{IvfIndex, MaintenanceLock}

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Wire rows cloned from the embeddings table under shifted ids. */
  private def evtsOf(shift: Long, origIds: Seq[Long]): Seq[EmbeddingEvt] =
    Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(origIds: _*)).orderBy("vec_id")
      .collect().map(r => EmbeddingEvt(r.getLong(0) + shift,
        r.getInt(2), r.getSeq[Float](1))).toSeq

  private def batchDf(evts: Seq[EmbeddingEvt]) = {
    import spark.implicits._
    evts.toDF("vec_id", "label", "embedding")
  }

  private def storedIds(idx: String, from: Long): Seq[Long] =
    spark.read.parquet(s"$idx/vectors").filter(col("vec_id") >= from)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted

  test("a replayed micro-batch admits nothing (vec_id identity = the exactly-once guard)") {
    val idx = tmpDir("graft-annm-replay")
    IvfIndex.build(spark, sf, idx)
    val batch = batchDf(evtsOf(20000L, Seq(0L, 1L, 2L, 3L)))
    assert(AnnMaintenance.applyBatch(spark, batch, idx, batchId = 0L) == 0)
    // the at-least-once replay: same batch, same id — nothing lands twice
    AnnMaintenance.applyBatch(spark, batch, idx, batchId = 0L)
    spark.catalog.refreshByPath(s"$idx/vectors")
    assert(storedIds(idx, 20000L) == Seq(20000L, 20001L, 20002L, 20003L))
    assert(spark.read.parquet(s"$idx/vectors").groupBy("vec_id")
      .count().filter(col("count") > 1).isEmpty,
      "no vec_id may be stored twice")
  }

  test("the stream wires through foreachBatch and a live probe sees appended vectors") {
    val idx = tmpDir("graft-annm-stream")
    IvfIndex.build(spark, sf, idx)
    val mem = { import spark.implicits._; implicit val sq = spark.sqlContext; MemoryStream[EmbeddingEvt] }
    val q = AnnMaintenance.start(mem.toDS(), idx,
      tmpDir("graft-annm-ckpt"), rebalanceEvery = 0)
    try {
      mem.addData(evtsOf(30000L, Seq(5L, 6L)): _*)
      q.processAllAvailable()
      mem.addData(evtsOf(30000L, Seq(7L)): _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.refreshByPath(s"$idx/vectors")
    assert(storedIds(idx, 30000L) == Seq(30005L, 30006L, 30007L))
    // the appended clone of vec 5 is now served for vec 5's own query
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 5L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val top = IvfIndex.query(spark, idx, qv, topK = 2, nprobe = 1000)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(5L, 30005L),
      s"expected the original and its streamed clone at the top, got $top")
  }

  test("a short maintenance sweep is absorbed by the lease retry") {
    val idx = tmpDir("graft-annm-lease")
    IvfIndex.build(spark, sf, idx)
    val release = new java.util.concurrent.CountDownLatch(1)
    val held = new java.util.concurrent.CountDownLatch(1)
    val sweeper = new Thread(() =>
      MaintenanceLock.withLockAs(spark, idx, "sweeper@elsewhere") {
        held.countDown()
        release.await()
      })
    sweeper.start()
    held.await()
    // release the sweep ~1s in — inside the retry budget (6 x 500 ms
    // doubling), so the batch must land without surfacing the exception
    new Thread(() => { Thread.sleep(1000); release.countDown() }).start()
    AnnMaintenance.applyBatch(spark,
      batchDf(evtsOf(40000L, Seq(9L))), idx, batchId = 1L)
    sweeper.join()
    spark.catalog.refreshByPath(s"$idx/vectors")
    assert(storedIds(idx, 40000L) == Seq(40009L))
  }

  test("the trigger batch rebalances drift away and does not change served results") {
    val idx = tmpDir("graft-annm-drift")
    IvfIndex.build(spark, sf, idx)
    // skew: clone ten DISTINCT members of one coarse cell twelve times
    // each — every clone assigns back to that same cell (same nearest
    // centroid), piling ~120 rows into it; distinct points matter
    // because an all-identical hot cell is deliberately unsplittable
    val biggest = spark.read.parquet(s"$idx/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("cell")).collect()(0).getInt(0)
    val memberIds = spark.read.parquet(s"$idx/vectors")
      .filter(col("cell") === biggest).select("vec_id")
      .orderBy("vec_id").collect().map(_.getLong(0)).take(10).toSeq
    val skew = (0 until 12).flatMap(i =>
      evtsOf(50000L + i * 1000L, memberIds))
    for ((g, i) <- skew.grouped(30).zipWithIndex)
      AnnMaintenance.applyBatch(spark, batchDf(g.toSeq), idx,
        batchId = i.toLong, rebalanceEvery = 0)
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === memberIds.head).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val before = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // the trigger batch (empty payload): batchId hits the cadence
    val splits = AnnMaintenance.applyBatch(spark,
      batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
      rebalanceEvery = 8, rebalanceFactor = 2.0)
    assert(splits > 0, "the planted skew must trigger at least one split")
    spark.catalog.refreshByPath(s"$idx/vectors")
    // converged: no cell beyond the factor (the rebalance postcondition)
    val counts = spark.read.parquet(s"$idx/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val mean = counts.sum.toDouble / counts.length
    assert(counts.max <= 2.0 * mean,
      s"hot cell survived the convergence loop: max ${counts.max}, mean $mean")
    // rebalance is a pure repartitioning: full-probe results unchanged
    val after = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(after == before, "rebalance changed served results")
  }

  test("the IVF-PQ path shares the guard and lease semantics: a replayed batch admits nothing") {
    val idx = tmpDir("graft-annm-pq")
    operators.IvfPq.build(spark, sf, idx)
    val batch = batchDf(evtsOf(70000L, Seq(0L, 1L, 2L)))
    AnnMaintenance.applyBatchPq(spark, batch, idx, batchId = 0L)
    AnnMaintenance.applyBatchPq(spark, batch, idx, batchId = 0L)
    spark.catalog.refreshByPath(s"$idx/codes")
    val ids = spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") >= 70000L)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(70000L, 70001L, 70002L))
    assert(spark.read.parquet(s"$idx/codes").groupBy("vec_id")
      .count().filter(col("count") > 1).isEmpty,
      "no vec_id may be coded twice")
    // the streamed clone carries its original's exact ADC distance —
    // same codes in, same lookup-table sum out
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val adc = operators.IvfPq.query(spark, idx, qv,
        topK = Int.MaxValue, nprobe = 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(adc(70000L) == adc(0L),
      "the streamed clone must decode to its original's exact ADC")
  }

  test("probes run continuously THROUGH a live rebalance: none throws, every answer is the invariant full-probe top-k") {
    val idx = tmpDir("graft-annm-live-probe")
    IvfIndex.build(spark, sf, idx)
    // plant the drift-test skew so the trigger batch performs real
    // splits (partition overwrites racing the probe thread)
    val biggest = spark.read.parquet(s"$idx/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("cell")).collect()(0).getInt(0)
    val memberIds = spark.read.parquet(s"$idx/vectors")
      .filter(col("cell") === biggest).select("vec_id")
      .orderBy("vec_id").collect().map(_.getLong(0)).take(10).toSeq
    val skew = (0 until 12).flatMap(i =>
      evtsOf(80000L + i * 1000L, memberIds))
    for ((g, i) <- skew.grouped(30).zipWithIndex)
      AnnMaintenance.applyBatch(spark, batchDf(g.toSeq), idx,
        batchId = i.toLong, rebalanceEvery = 0)
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === memberIds.head).select("e")
      .collect()(0).getSeq[Double](0).toArray
    // quiesced ground truth: rebalance is a pure repartitioning, so
    // the full-probe answer is invariant through the whole window
    val want = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stop = false
    val prober = new Thread(() => {
      while (!stop) {
        try {
          // generous retry budget: queryImpl may by design serve a
          // stale/incomplete view (or rethrow FNF) on its FINAL
          // attempt, and StaleProbe retries don't sleep — under load a
          // small budget can exhaust inside one multi-round
          // convergence and flake the zero-divergence assertion
          val got = IvfIndex.queryImpl(spark, idx, qv, topK = 10,
            nprobe = 1000, maxAttempts = 32)
            .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
          probes.incrementAndGet()
          if (got != want)
            failures.add(s"divergent probe: $got")
        } catch {
          case t: Throwable => failures.add(s"probe threw: $t"); stop = true
        }
      }
    }, "ann-live-prober")
    prober.start()
    try {
      // the maintainer's trigger batch: rebalanceToConvergence splits
      // the hot cell repeatedly while probes keep flowing
      val splits = AnnMaintenance.applyBatch(spark,
        batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
        rebalanceEvery = 8, rebalanceFactor = 2.0)
      assert(splits > 0, "the planted skew must trigger at least one split")
    } finally { stop = true; prober.join() }
    assert(failures.isEmpty, s"probes through live maintenance failed: " +
      failures.toArray.take(3).mkString(" | "))
    assert(probes.get() > 0, "the prober never completed a probe")
  }

  test("PQ probes run continuously THROUGH a live rebalance: none throws, every answer is the invariant full-probe ADC top-k") {
    import spark.implicits._
    val idx = tmpDir("graft-annm-pq-live-probe")
    operators.IvfPq.build(spark, sf, idx)
    // skew one coarse cell with jittered clones of a stored vector so
    // the trigger batch performs real splits (a rebalance never
    // re-encodes, so the full-probe ADC answer is invariant under it)
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val total = spark.read.parquet(s"$idx/codes").count()
    val clones = (0L until 2 * total).map { i =>
      val e = qv.toSeq.updated(0, qv(0) + 1e-3 * i)
      (5000000L + i, 7, e.map(_.toFloat))
    }.toDF("vec_id", "label", "embedding")
    AnnMaintenance.applyBatchPq(spark, clones, idx, batchId = 0L,
      rebalanceEvery = 0)
    val want = operators.IvfPq.query(spark, idx, qv, topK = 10,
      nprobe = 1000).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probes = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stop = false
    val prober = new Thread(() => {
      while (!stop) {
        try {
          // same generous budget as the IVF prober: the final attempt
          // may serve stale by design — don't let it fire under load
          val got = operators.IvfPq.queryImpl(spark, idx, qv, topK = 10,
            nprobe = 1000, maxAttempts = 32)
            .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
          probes.incrementAndGet()
          if (got != want) failures.add(s"divergent probe: $got")
        } catch {
          case t: Throwable => failures.add(s"probe threw: $t"); stop = true
        }
      }
    }, "pq-live-prober")
    prober.start()
    try {
      val splits = AnnMaintenance.applyBatchPq(spark,
        batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
        rebalanceEvery = 8, rebalanceFactor = 2.0)
      assert(splits > 0, "the planted skew must trigger at least one split")
    } finally { stop = true; prober.join() }
    assert(failures.isEmpty, s"PQ probes through live maintenance failed: " +
      failures.toArray.take(3).mkString(" | "))
    assert(probes.get() > 0, "the prober never completed a probe")
  }

  test("DIFFUSE drift — zero factor-hot cells, worst ≫ mean — triggers ONE bounded top-N split that reduces the worst-case probe forecast; served results unchanged") {
    import spark.implicits._
    val idx = tmpDir("graft-annm-diffuse")
    IvfIndex.build(spark, sf, idx)
    val counts0 = spark.read.parquet(s"$idx/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val cells4 = counts0.toSeq.sortBy { case (c, n) => (-n, c) }
      .take(4).map(_._1)
    val nTotal0 = counts0.values.sum
    val k = counts0.size
    // plant the blind-spot state: grow the nprobe(=4) largest cells to
    // ~1.9× the FINAL mean — each under the 2.0 rebalance factor, so
    // the acute gate never fires, while an unlucky 4-cell probe pays
    // ~1.9× the mean forecast forever. The target solves the fixpoint
    // T = 1.9 × (N + Σ(T − n_c)) / k (adding rows raises the mean).
    var t = 1.9 * nTotal0 / k
    for (_ <- 0 until 30)
      t = 1.9 * (nTotal0 + cells4.map(c =>
        math.max(0.0, t - counts0(c))).sum) / k
    val target = t.toLong
    val cloneMap = cells4.flatMap { c =>
      val memberIds = spark.read.parquet(s"$idx/vectors")
        .filter(col("cell") === c).select("vec_id")
        .orderBy("vec_id").collect().map(_.getLong(0)).take(10).toSeq
      val need = (target - counts0(c)).toInt
      // DISTINCT source points round-robin (an all-identical cell is
      // deliberately unsplittable — the degenerate-cell rule)
      (0 until need).map(i =>
        (memberIds(i % memberIds.size), 600000L + c * 10000L + i))
    }.toDF("orig_id", "new_id")
    val batch = Tables.embeddings(spark, sf)
      .join(cloneMap, col("vec_id") === col("orig_id"))
      .select(col("new_id").as("vec_id"), col("label"), col("embedding"))
    AnnMaintenance.applyBatch(spark, batch, idx, batchId = 0L,
      rebalanceEvery = 0)
    val h1 = IvfIndex.servingHealth(spark, idx, nprobe = 4, factor = 2.0)
      .collect()(0)
    assert(h1.getAs[Long]("n_hot_cells") == 0L,
      s"fixture: no cell may trip the factor (max ${h1.getAs[Long]("max_cell")}, mean ${h1.getAs[Double]("mean_cell")})")
    assert(h1.getAs[Long]("orphan_cells") == 0L)
    assert(AnnMaintenance.diffuseDrift(h1, 1.5),
      s"fixture: worst ${h1.getAs[Long]("probe_rows_worst")} must exceed 1.5× mean ${h1.getAs[Double]("probe_rows_mean")}")
    val worstBefore = h1.getAs[Long]("probe_rows_worst")
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val before = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // the trigger batch: acute gate silent, diffuse gate fires ONE
    // bounded top-4 split pass
    val splits = AnnMaintenance.applyBatch(spark,
      batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
      rebalanceEvery = 8, rebalanceFactor = 2.0)
    assert(splits > 0, "diffuse drift must trigger at least one split")
    spark.catalog.refreshByPath(s"$idx/vectors")
    val h2 = IvfIndex.servingHealth(spark, idx, nprobe = 4, factor = 2.0)
      .collect()(0)
    assert(h2.getAs[Long]("probe_rows_worst") < worstBefore,
      s"the split must reduce the worst-case probe forecast: " +
        s"$worstBefore -> ${h2.getAs[Long]("probe_rows_worst")}")
    // a rebalance is a pure repartitioning: full-probe results unchanged
    val after = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(after == before, "diffuse split changed served results")
  }

  test("the backlog gate drains tombstones when the budgeted probe tax covers the rewrite — and leaves a cheap backlog alone") {
    val idx = tmpDir("graft-annm-backlog")
    IvfIndex.build(spark, sf, idx)
    val batch = batchDf(evtsOf(90000L, Seq(0L, 1L, 2L)))
    AnnMaintenance.applyBatch(spark, batch, idx, batchId = 0L,
      rebalanceEvery = 0)
    IvfIndex.delete(spark, Seq(90000L, 90001L, 90002L), idx)
    def backlog(): Long =
      IvfIndex.servingHealth(spark, idx).collect()(0)
        .getAs[Long]("tombstone_backlog")
    assert(backlog() == 3L)
    // budget 1: 3 ids × nprobe 4 × 1 probe ≪ the touched-cell rewrite —
    // the trigger batch must NOT pay a physical apply for it
    AnnMaintenance.applyBatch(spark, batchDf(Seq.empty[EmbeddingEvt]), idx,
      batchId = 7L, rebalanceEvery = 8, probes = Some(1L))
    assert(backlog() == 3L, "a cheap backlog must not trigger applyDeletes")
    // a serving-scale budget: the cumulative anti-join tax dwarfs the
    // rewrite, the trigger drains the backlog into retirement
    AnnMaintenance.applyBatch(spark, batchDf(Seq.empty[EmbeddingEvt]), idx,
      batchId = 15L, rebalanceEvery = 8, probes = Some(1000000L))
    assert(backlog() == 0L, "a due backlog must drain on the trigger batch")
    spark.catalog.refreshByPath(s"$idx/vectors")
    assert(spark.read.parquet(s"$idx/vectors")
      .filter(col("vec_id") >= 90000L).count() == 0L,
      "the drained vectors must be physically gone")
    assert(IvfIndex.servingHealth(spark, idx).collect()(0)
      .getAs[Long]("retired_ids") == 3L)
  }

  test("the PQ twin shares both new gates: a due backlog drains on the trigger batch, and rebalance(topN) splits the largest cells without any factor-hot cell") {
    import operators.IvfPq
    val idx = tmpDir("graft-annm-pq-gates")
    IvfPq.build(spark, sf, idx)
    val batch = batchDf(evtsOf(95000L, Seq(0L, 1L, 2L)))
    AnnMaintenance.applyBatchPq(spark, batch, idx, batchId = 0L,
      rebalanceEvery = 0)
    IvfPq.delete(spark, Seq(95000L, 95001L, 95002L), idx)
    def backlog(): Long = IvfPq.servingHealth(spark, idx).collect()(0)
      .getAs[Long]("tombstone_backlog")
    assert(backlog() == 3L)
    AnnMaintenance.applyBatchPq(spark, batchDf(Seq.empty[EmbeddingEvt]),
      idx, batchId = 7L, rebalanceEvery = 8, probes = Some(1L))
    assert(backlog() == 3L, "a cheap PQ backlog must not trigger applyDeletes")
    AnnMaintenance.applyBatchPq(spark, batchDf(Seq.empty[EmbeddingEvt]),
      idx, batchId = 15L, rebalanceEvery = 8, probes = Some(1000000L))
    assert(backlog() == 0L, "a due PQ backlog must drain on the trigger")
    spark.catalog.refreshByPath(s"$idx/codes")
    assert(spark.read.parquet(s"$idx/codes")
      .filter(col("vec_id") >= 95000L).count() == 0L)
    // the diffuse split mode: factor high enough that NO cell is hot,
    // topN forces the two largest apart; a rebalance never re-encodes,
    // so the full-probe ADC answer must be bit-identical
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val before = IvfPq.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val worstBefore = IvfPq.servingHealth(spark, idx, nprobe = 2)
      .collect()(0).getAs[Long]("probe_rows_worst")
    val splits = IvfPq.rebalance(spark, idx, factor = 100.0, topN = 2)
    assert(splits > 0, "topN must split the largest cells with no factor-hot cell")
    spark.catalog.refreshByPath(s"$idx/codes")
    val worstAfter = IvfPq.servingHealth(spark, idx, nprobe = 2)
      .collect()(0).getAs[Long]("probe_rows_worst")
    assert(worstAfter < worstBefore,
      s"topN split must reduce the worst-case forecast: $worstBefore -> $worstAfter")
    val after = IvfPq.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(after == before, "PQ topN split changed served ADC results")
  }

  test("the backlog gate amortizes against ACTUAL traffic: a cold index never drains, and the drain lands on the first trigger past q271's breakeven") {
    import operators.ProbeLedger
    val idx = tmpDir("graft-annm-ledger")
    IvfIndex.build(spark, sf, idx)
    val batch = batchDf(evtsOf(97000L, Seq(0L, 1L, 2L)))
    AnnMaintenance.applyBatch(spark, batch, idx, batchId = 0L,
      rebalanceEvery = 0)
    IvfIndex.delete(spark, Seq(97000L, 97001L, 97002L), idx)
    def backlog(): Long = IvfIndex.servingHealth(spark, idx).collect()(0)
      .getAs[Long]("tombstone_backlog")
    assert(backlog() == 3L)
    // every trigger here silences the SPLIT gates (factor 100, diffuse
    // off, touch meter zeroed) so the drain economics are measured
    // against an index the other gates never mutate mid-test
    def trigger(id: Long): Int = {
      operators.ProbeLedger.markRebalanced(spark, idx)
      AnnMaintenance.applyBatch(spark, batchDf(Seq.empty[EmbeddingEvt]),
        idx, batchId = id, rebalanceEvery = 8, rebalanceFactor = 100.0,
        worstFactor = 1e9)
    }
    // COLD: nothing has ever probed this index — probes = None reads
    // the ledger's zero and the trigger must leave the backlog alone,
    // no matter how expensive its standing anti-join LOOKS
    trigger(7L)
    assert(backlog() == 3L, "a cold index must never pay a physical apply")
    // q271's breakeven off the same audit row the gate reads
    val h = IvfIndex.servingHealth(spark, idx).collect()(0)
    val nCells = h.getAs[Int]("n_cells").toLong
    val rewrite = (math.min(3L, nCells) *
      h.getAs[Double]("mean_cell")).toLong
    val breakeven = (rewrite * nCells + 3L * 4L - 1L) / (3L * 4L)
    assert(breakeven > 1L, s"fixture needs a non-trivial breakeven, got $breakeven")
    // one REAL served probe feeds the ledger (the serving path is the
    // meter — queryPlanFrom records each executed attempt)
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    IvfIndex.query(spark, idx, qv, topK = 5, nprobe = 4).collect()
    assert(ProbeLedger.probesSinceDrain(spark, idx) == 1L,
      "a served query must record exactly its one executed attempt")
    // hot stream just UNDER breakeven (bulk-recorded with no cell
    // touches so only the drain economics are in play): still no drain
    for (_ <- 2L to (breakeven - 1L))
      ProbeLedger.record(spark, idx, Seq.empty)
    trigger(15L)
    assert(backlog() == 3L,
      s"under breakeven ($breakeven probes) the backlog must survive")
    // one more probe crosses it: the next trigger drains and re-arms
    ProbeLedger.record(spark, idx, Seq.empty)
    trigger(23L)
    assert(backlog() == 0L,
      "the first trigger past breakeven must pay the physical apply")
    assert(ProbeLedger.probesSinceDrain(spark, idx) == 0L,
      "the apply must reset the probes-since-drain meter")
    spark.catalog.refreshByPath(s"$idx/vectors")
    assert(spark.read.parquet(s"$idx/vectors")
      .filter(col("vec_id") >= 97000L).count() == 0L)
  }

  test("the TRAFFIC gate: probes landing on the worst cells past the rewrite breakeven trigger the top-N split — and the split re-arms the meter") {
    import operators.ProbeLedger
    val idx = tmpDir("graft-annm-traffic")
    IvfIndex.build(spark, sf, idx)
    // silence every other gate: factor 100 (nothing acute), worstFactor
    // huge (diffuse off), probes Some(0) (drain off) — only actual
    // worst-cell traffic can justify a split
    def trigger(): Int = AnnMaintenance.applyBatch(spark,
      batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
      rebalanceEvery = 8, rebalanceFactor = 100.0, worstFactor = 1e9,
      probes = Some(0L))
    assert(trigger() == 0, "no traffic: the trigger must split nothing")
    val h = IvfIndex.servingHealth(spark, idx, nprobe = 4, factor = 100.0)
      .collect()(0)
    val worstCells = h.getAs[scala.collection.Seq[Int]]("worst_cells").toSeq
    assert(AnnMaintenance.trafficDue(h, Long.MaxValue),
      "fixture: a natural build must have worst > mean")
    val qv = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val before = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    ProbeLedger.markRebalanced(spark, idx) // discard the probe above
    // drive worst-cell traffic to exactly the gate's breakeven
    var touches = 0L
    while (!AnnMaintenance.trafficDue(h, touches)) {
      ProbeLedger.record(spark, idx, worstCells)
      touches = ProbeLedger.touchesOn(spark, idx, worstCells)
    }
    val splits = trigger()
    assert(splits > 0,
      "worst-cell traffic past breakeven must trigger the top-N split")
    assert(ProbeLedger.touchesOn(spark, idx, worstCells) == 0L,
      "the rebalance must re-arm the touch meter")
    // stale touches gone → the immediate next trigger must NOT re-fire
    assert(trigger() == 0,
      "a re-armed meter must not re-fire on the old traffic")
    // a rebalance is a pure repartitioning: full-probe results unchanged
    spark.catalog.refreshByPath(s"$idx/vectors")
    val after = IvfIndex.query(spark, idx, qv, topK = 10, nprobe = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(after == before, "traffic split changed served results")
  }

  test("a FILTERED probe races a live rebalance on both lifecycles: re-planned, never short, exact filtered truth served") {
    import operators.{IvfIndex, IvfPq}
    import spark.implicits._
    val idx = tmpDir("graft-annm-filtered-race")
    IvfIndex.build(spark, sf, idx)
    // skew one cell so the injected rebalance really moves rows while
    // the filtered probe's candidate scan is in flight (the
    // IvfIndexSpec race-seam fixture)
    val q = operators.Similarity.normed(spark, sf)
      .filter(col("vec_id") === 0L).select("e")
      .collect()(0).getSeq[Double](0).toArray
    val total = spark.read.parquet(s"$idx/vectors").count()
    val clones = (0L until total).map { i =>
      val e = q.toSeq.updated(0, q(0) + 1e-3 * i)
      (4000000L + i, 7, e, math.sqrt(e.map(x => x * x).sum))
    }.toDF("vec_id", "label", "e", "nrm")
    IvfIndex.appendVectors(spark, idx, clones)
    IvfIndex.writeLabelStats(spark, idx)
    var splits = -1
    val got = IvfIndex.queryFilteredImpl(spark, idx, q, topK = 10,
      col("label") === 7, nprobe = 10000,
      afterPin = attempt => {
        // escalation re-enters the eager probe with attempt reset to
        // 1 — inject the rebalance exactly once
        if (attempt == 1 && splits < 0) {
          splits = IvfIndex.rebalance(spark, idx, 2.0); ()
        }
      }, sleep = _ => ())
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(splits >= 1, "fixture: the injected rebalance must split a cell")
    // quiesced filtered truth — a rebalance is a pure repartitioning,
    // so the full-probe filtered answer is invariant under it
    val want = IvfIndex.queryFiltered(spark, idx, q, topK = 10,
      col("label") === 7, nprobe = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got.length == 10 && got == want,
      "filtered probe racing a rebalance must serve the exact filtered top-k")

    // the PQ twin: same race through the shared eager probe
    val pqIdx = tmpDir("graft-annm-pq-filtered-race")
    IvfPq.build(spark, sf, pqIdx)
    IvfPq.writeLabelStats(spark, pqIdx)
    var pqSplits = -1
    val gotPq = IvfPq.queryFilteredImpl(spark, pqIdx, q, topK = 5,
      col("label") === 7, nprobe = 10000,
      afterPin = attempt => {
        if (attempt == 1 && pqSplits < 0) {
          pqSplits = IvfPq.rebalance(spark, pqIdx, factor = 1.2); ()
        }
      }, sleep = _ => ())
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val wantPq = IvfPq.queryFiltered(spark, pqIdx, q, topK = 5,
      col("label") === 7, nprobe = 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(pqSplits >= 1, "fixture: the injected PQ rebalance must split")
    assert(gotPq == wantPq,
      "filtered PQ probe racing a rebalance must serve the exact filtered ADC top-k")
  }

  test("degenerate diffuse drift is a BOUNDED no-progress tax: all-clone largest cells re-fire the gate, yet N triggers split nothing and churn NO files") {
    import spark.implicits._
    val idx = tmpDir("graft-annm-degenerate")
    // handcraft the worst case the diffuse gate honestly documents:
    // every large cell is ALL-IDENTICAL clones (kept whole by design),
    // populations sized so diffuseDrift fires (worst > 1.5 × mean)
    // while no cell trips the acute factor (max < 2 × mean_cell)
    val dim = 4
    def vec(c: Int): Seq[Double] = (0 until dim).map(i =>
      if (i == c % dim) 1.0 + c else 0.1 * c)
    val pops = Seq(100, 100, 100, 100, 10, 10, 10, 10)
    val rows = pops.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map(i =>
        (c * 1000L + i, c, vec(c), math.sqrt(vec(c).map(x => x * x).sum), c))
    }
    rows.toDF("vec_id", "label", "e", "nrm", "cell")
      .repartition(1).write.partitionBy("cell").parquet(s"$idx/vectors")
    pops.indices.map(c => (c, vec(c))).toDF("cell", "centroid")
      .coalesce(1).write.parquet(s"$idx/centroids")
    val h = IvfIndex.servingHealth(spark, idx, nprobe = 4, factor = 2.0)
      .collect()(0)
    assert(h.getAs[Long]("n_hot_cells") == 0L && AnnMaintenance.diffuseDrift(h, 1.5),
      s"fixture: diffuse must fire with no acute cell (worst ${h.getAs[Long]("probe_rows_worst")}, mean ${h.getAs[Double]("probe_rows_mean")})")
    def listing(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx)).map(f =>
        (f.getAbsolutePath, f.length, f.lastModified)).sortBy(_._1)
    }
    val before = listing()
    // N trigger batches: the gate re-fires every time (the documented
    // standing behavior), each pass probes k=2 per largest cell, keeps
    // every one whole, and writes NOTHING — the tax is bounded CPU,
    // not file churn or a spurious probe-retry storm
    for (i <- 0 until 3) {
      val t0 = System.nanoTime()
      val splits = AnnMaintenance.applyBatch(spark,
        batchDf(Seq.empty[EmbeddingEvt]), idx, batchId = 7L,
        rebalanceEvery = 8, probes = Some(0L))
      val sec = (System.nanoTime() - t0) / 1e9
      assert(splits == 0, s"trigger $i split an all-clones cell")
      assert(sec < 120.0, s"trigger $i took ${sec}s — the bounded-tax claim")
    }
    assert(listing() == before,
      "a no-progress pass must not churn a single file (no centroid " +
        "rewrite, no partition write)")
  }

  test("bootstrap contract: starting on a dir with no quantizer fails loudly") {
    val mem = { import spark.implicits._; implicit val sq = spark.sqlContext; MemoryStream[EmbeddingEvt] }
    intercept[IllegalArgumentException] {
      AnnMaintenance.start(mem.toDS(), tmpDir("graft-annm-empty"),
        tmpDir("graft-annm-ckpt2"))
    }
  }
}

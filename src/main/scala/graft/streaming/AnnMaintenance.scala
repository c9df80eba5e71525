package graft.streaming

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN index maintenance — the [[RollupMaintenance]] shape
  * for the vector side: an embedding stream drives [[IvfIndex]]
  * through foreachBatch, so the serving index is always current
  * without any consumer ever re-encoding the corpus. Completes the
  * maintainer set: [[IngestPipeline]] (text → LSH gate + BM25),
  * [[RollupMaintenance]] (facts → rollup), this (embeddings → ANN).
  *
  * Exactly-once EFFECT without a marker: Structured Streaming replays
  * the last uncommitted batch on restart (at-least-once delivery), and
  * [[IvfIndex.appendVectors]]' vec_id anti-join guard makes the replay
  * admit nothing — the [[IngestPipeline]] dedup-gate philosophy
  * (vectors, like documents, carry their own identity; rollup rows
  * don't, which is why that maintainer needs the op marker instead).
  * A crash DURING the append job commit leaves the documented IVF
  * partial-file window (IvfIndex scaladoc; IvfCrashSpec) — a transient
  * recall dip, never a wrong served vector — and the checkpoint replay
  * converges it.
  *
  * CONTENTION: appends and rebalances hold the MaintenanceLock lease,
  * so a concurrent GDPR applyDeletes or an operator-driven rebalance
  * makes a batch throw LockHeldException; the batch retries with the
  * [[IngestPipeline.withLeaseRetry]] bounded backoff — a short sweep
  * is absorbed invisibly, one outlasting the budget fails the query BY
  * DESIGN (checkpoint replay keeps the restart exactly-once).
  *
  * DRIFT: frozen-quantizer appends let hot cells grow forever
  * ([[IvfIndex.driftAudit]]'s motivation), so every `rebalanceEvery`-th
  * batch reads [[IvfIndex.servingHealth]] (one k-bounded count scan)
  * and acts on all three of its signals: a due tombstone backlog
  * drains ([[backlogDue]] — the q271 deletion economics), a cell past
  * the factor or a crashed rebalance's orphans split to convergence,
  * and DIFFUSE drift (worst-case probe forecast ≫ mean with zero
  * factor-hot cells) gets one bounded top-N-largest split pass —
  * cost bounded by the acted-on cells, a pure audit when healthy, and
  * a replayed trigger batch re-runs harmlessly (nothing is due the
  * second time).
  *
  * BOOTSTRAP CONTRACT: the coarse quantizer is fitted OFFLINE
  * ([[IvfIndex.build]] over a representative corpus) before the stream
  * starts — a quantizer fitted on one micro-batch would freeze its
  * skew into every later assignment. [[start]] fails loudly on a
  * dir with no centroids table. */
object AnnMaintenance {

  /** Wire row: the embeddings-table shape (float vector on the wire,
    * the parquet physical type). */
  final case class EmbeddingEvt(vec_id: Long, label: Int,
      embedding: Seq[Float])

  /** Align a wire batch to the index's stored row shape — the
    * [[Similarity.normed]] discipline over an arbitrary frame: loud
    * raise_error on a dimension mismatch (a silent filter would drop
    * corrupt vectors with no error anywhere), doubles + L2 norm. */
  private[graft] def normalize(batch: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(batch.sparkSession)
    batch.select(col("vec_id"), col("label"),
      when(size(col("embedding")) === Similarity.EmbeddingDim,
        transform(col("embedding"), x => x.cast("double")))
        .otherwise(raise_error(concat(
          lit(s"embedding dim != ${Similarity.EmbeddingDim} for vec_id="),
          col("vec_id").cast("string"))))
        .as("e"))
      .withColumn("nrm", sqrt(expr("dot_product(e, e)")))
  }

  /** One micro-batch: append under the lease (bounded retry), then on
    * every `rebalanceEvery`-th batch consult the serving-health audit
    * ([[IvfIndex.servingHealth]] — the maintenance DECISION input, not
    * just a dashboard row) and act on what it actually shows:
    *
    *   - a tombstone backlog whose probe tax ACTUALLY PAID since the
    *     last apply has outgrown its rewrite cost drains first
    *     ([[backlogDue]] — q271's deletion economics fed with the
    *     [[graft.operators.ProbeLedger]]'s real traffic count; the
    *     round-17 form amortized against a hard-coded expected
    *     budget). After a drain the health row is RE-READ: the gates
    *     below must judge the post-apply population, not one inflated
    *     by the very tombstones the drain removed;
    *   - a cell past `rebalanceFactor` (or a crashed rebalance's
    *     orphans) splits to convergence — the acute-skew path;
    *   - otherwise DIFFUSE drift — `probe_rows_worst` beyond
    *     `worstFactor` × `probe_rows_mean` with zero factor-hot cells,
    *     the state where every nprobe-worst cell sits just under the
    *     factor and nothing would ever fire — OR due worst-cell
    *     TRAFFIC ([[trafficDue]]: the ledger shows real probes landing
    *     on the worst cells and their cumulative excess tax has
    *     covered the split's rewrite — q275's "actual touching worst
    *     means the rebalance is overdue regardless of hot_factor",
    *     made actionable) gets ONE bounded top-`nprobe`-largest split
    *     pass ([[IvfIndex.rebalance]]'s `topN` mode).
    *
    * A healthy index's trigger batch costs one map-combinable count
    * scan of the index (k rows out), no KMeans machinery. Returns the
    * number of cells the trigger split (0 on non-trigger and healthy
    * batches — the observability hook a deployment graphs).
    *
    * `probes` overrides the ledger's probes-since-apply count (spec
    * seam; `Some(0)` disables the drain gate outright). */
  def applyBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      batchId: Long, rebalanceEvery: Int = 8,
      rebalanceFactor: Double = 2.0, worstFactor: Double = 1.5,
      nprobe: Int = 4, probes: Option[Long] = None): Int =
    IngestPipeline.withLeaseRetry() {
      import graft.operators.ProbeLedger
      if (!batch.isEmpty)
        IvfIndex.appendVectors(spark, indexDir, normalize(batch))
      if (rebalanceEvery > 0 && batchId % rebalanceEvery == rebalanceEvery - 1) {
        def health() = IvfIndex.servingHealth(spark, indexDir, nprobe,
          rebalanceFactor).collect()(0)
        val h0 = health()
        // drain the backlog BEFORE any split: rebalance counts live
        // rows, and tombstoned rows inflating a cell would trigger
        // splits the post-apply population can't justify
        val drained = backlogDue(h0, nprobe, probes.getOrElse(
          ProbeLedger.probesSinceDrain(spark, indexDir))) && {
          IvfIndex.applyDeletes(spark, indexDir) >= 0
        }
        // ... and for the same reason the split gates judge the
        // POST-drain row — the drain may have returned the index to
        // health, and splitting on the stale row would rewrite cells
        // the live population can't justify
        val h = if (drained) health() else h0
        if (hotOrOrphaned(h))
          IvfIndex.rebalanceToConvergence(spark, indexDir, rebalanceFactor)
        else if (diffuseDrift(h, worstFactor) ||
            trafficDue(h, ProbeLedger.touchesOn(spark, indexDir,
              h.getAs[scala.collection.Seq[Int]]("worst_cells").toSeq)))
          IvfIndex.rebalance(spark, indexDir, rebalanceFactor, topN = nprobe)
        else 0
      } else 0
    }

  /** The acute gate: split when any cell exceeds the factor, or when a
    * crashed rebalance left orphan cells to adopt. */
  private def hotOrOrphaned(h: org.apache.spark.sql.Row): Boolean =
    h.getAs[Long]("n_hot_cells") > 0L || h.getAs[Long]("orphan_cells") > 0L

  /** The traffic gate — the actual-probe twin of [[diffuseDrift]],
    * priced like [[backlogDue]] with no new constant: a probe landing
    * on the worst cells scans `probe_rows_worst` instead of the
    * forecast mean, an excess of (worst − mean) rows; the top-N split
    * rewrites those cells once, ~`probe_rows_worst` rows. Split when
    * the cumulative excess actually paid covers the rewrite:
    * `touchesOnWorst × (worst − mean) ≥ worst`. On a balanced index
    * worst ≈ mean and no traffic volume can fire it; rebalance resets
    * the touch map, so a degenerate (unsplittable) worst set re-arms
    * from FRESH traffic instead of re-firing on stale touches forever.
    * BigDecimal keeps an adversarial touch count from overflowing the
    * product. */
  private[graft] def trafficDue(h: org.apache.spark.sql.Row,
      touchesOnWorst: Long): Boolean = {
    val worst = h.getAs[Long]("probe_rows_worst")
    val mean = h.getAs[Double]("probe_rows_mean")
    worst > 0L && touchesOnWorst > 0L && worst.toDouble > mean &&
      BigDecimal(touchesOnWorst) *
        (BigDecimal(worst) - BigDecimal(mean)) >= BigDecimal(worst)
  }

  /** The diffuse-drift gate: the audit's own worst/mean forecast says
    * an unlucky probe pays `worstFactor`× the mean, yet no single cell
    * trips the rebalance factor — without this check the index pays
    * that tax forever (the state `servingHealth`'s scaladoc warns
    * about, previously measured but never acted on). Honest bound: on
    * a corpus whose largest cells are DEGENERATE (all-identical clones
    * — kept whole by design, see [[IvfIndex.rebalance]]), the gate
    * re-fires each trigger and the pass splits nothing; the cost is
    * the bounded per-largest-cell k=2 probe fit, the same standing
    * behavior as the acute gate on an unsplittable hot cell — the
    * worst/mean tax is then a property of the data, not the index. */
  private[graft] def diffuseDrift(h: org.apache.spark.sql.Row,
      worstFactor: Double): Boolean = {
    val mean = h.getAs[Double]("probe_rows_mean")
    mean > 0.0 && h.getAs[Long]("probe_rows_worst") > worstFactor * mean
  }

  /** The deletion-economics gate (the arithmetic q271 oracles, read
    * off the audit row): the tombstone backlog rides EVERY probe's
    * anti-join — expected wasted rows per probe ≈ backlog × nprobe /
    * n_cells — while an applyDeletes pays one rewrite of the touched
    * cells, worst case min(backlog, n_cells) × mean_cell surviving
    * rows. Run the apply when the probes ACTUALLY SERVED since the
    * last apply (the [[graft.operators.ProbeLedger]] count, or a spec
    * override) have cumulatively paid the rewrite: backlog × nprobe ×
    * probes ≥ rewrite × n_cells — equivalently probes ≥ q271's
    * `breakeven_probes`. BigInt cross-multiplication: `probes` is an
    * unbounded caller-visible count and a Long product overflowing to
    * negative would silently disable the drain forever. */
  private[graft] def backlogDue(h: org.apache.spark.sql.Row, nprobe: Int,
      probes: Long): Boolean = {
    val backlog = h.getAs[Long]("tombstone_backlog")
    if (backlog <= 0L || probes <= 0L) false
    else {
      val nCells = h.getAs[Int]("n_cells").toLong
      val rewrite =
        (math.min(backlog, nCells) * h.getAs[Double]("mean_cell")).toLong
      BigInt(backlog) * BigInt(nprobe) * BigInt(probes) >=
        BigInt(rewrite) * BigInt(nCells)
    }
  }

  def start(evts: Dataset[EmbeddingEvt], indexDir: String,
      checkpointDir: String, rebalanceEvery: Int = 8,
      rebalanceFactor: Double = 2.0): StreamingQuery =
    startWith(evts, indexDir, checkpointDir)(
      applyBatch(_, _, indexDir, _, rebalanceEvery, rebalanceFactor))

  /** The IVF-PQ twin of [[applyBatch]] — at 100 TB the SERVING index
    * is the PQ-compressed one ([[IvfPq]]'s header), and its append
    * path carries the same vec_id guard and lease, so the maintainer
    * semantics (backlog drain, acute and diffuse gates) transfer
    * verbatim; encode cost rides the batch. */
  def applyBatchPq(spark: SparkSession, batch: DataFrame, indexDir: String,
      batchId: Long, rebalanceEvery: Int = 8,
      rebalanceFactor: Double = 2.0, worstFactor: Double = 1.5,
      nprobe: Int = 4, probes: Option[Long] = None): Int =
    IngestPipeline.withLeaseRetry() {
      import graft.operators.{IvfPq, ProbeLedger}
      if (!batch.isEmpty)
        IvfPq.append(spark, indexDir, normalize(batch))
      if (rebalanceEvery > 0 && batchId % rebalanceEvery == rebalanceEvery - 1) {
        def health() = IvfPq.servingHealth(spark, indexDir, nprobe,
          rebalanceFactor).collect()(0)
        val h0 = health()
        val drained = backlogDue(h0, nprobe, probes.getOrElse(
          ProbeLedger.probesSinceDrain(spark, indexDir))) && {
          IvfPq.applyDeletes(spark, indexDir) >= 0
        }
        val h = if (drained) health() else h0
        if (hotOrOrphaned(h))
          IvfPq.rebalanceToConvergence(spark, indexDir, rebalanceFactor)
        else if (diffuseDrift(h, worstFactor) ||
            trafficDue(h, ProbeLedger.touchesOn(spark, indexDir,
              h.getAs[scala.collection.Seq[Int]]("worst_cells").toSeq)))
          IvfPq.rebalance(spark, indexDir, rebalanceFactor, topN = nprobe)
        else 0
      } else 0
    }

  /** [[start]] against an [[IvfPq]] index (bootstrap contract: the
    * coarse quantizer AND the PQ codebooks are fitted offline by
    * [[IvfPq.build]]). */
  def startPq(evts: Dataset[EmbeddingEvt], indexDir: String,
      checkpointDir: String, rebalanceEvery: Int = 8,
      rebalanceFactor: Double = 2.0): StreamingQuery =
    startWith(evts, indexDir, checkpointDir)(
      applyBatchPq(_, _, indexDir, _, rebalanceEvery, rebalanceFactor))

  private def startWith(evts: Dataset[EmbeddingEvt], indexDir: String,
      checkpointDir: String)(
      apply: (SparkSession, DataFrame, Long) => Int): StreamingQuery = {
    val spark = evts.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/centroids")),
      s"AnnMaintenance.start: no coarse quantizer under $indexDir — " +
        "fit it offline (IvfIndex.build / IvfPq.build) before streaming appends")
    evts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: Dataset[EmbeddingEvt], id: Long) =>
        apply(b.sparkSession, b.toDF(), id)
        ()
      }
      .start()
  }
}

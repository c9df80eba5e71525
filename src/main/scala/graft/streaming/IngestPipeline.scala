package graft.streaming

import graft.operators.{Bm25Index, IndexManifest, LshBandIndex, MaintenanceLock}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The composed INGEST pipeline — the end-to-end shape a 100 TB
  * training-data system runs on every arriving batch, wired from this
  * repo's own components:
  *
  *   quality gate (q31 poor rule, stateless scan filter)
  *     → near-dup admit against the persisted LSH band index
  *       ([[LshBandIndex.admit]] — probes, verifies exact jaccard,
  *       appends survivors' sets-then-bands)
  *     → BM25 inverted-index append of the admitted docs
  *       ([[Bm25Index.append]] — postings + additive stats)
  *
  * Replay safety is layered (exactly-once EFFECT under any crash
  * point, IngestPipelineSpec crash-injects every seam):
  *
  *  1. Whole-batch skip: the streaming batchId is stamped as a
  *     [[Bm25Index.appliedOp]] marker that lands ATOMICALLY with the
  *     batch's final write (the stats swap ending the BM25 append —
  *     the [[graft.operators.RollupStore]] op-id discipline). A batch
  *     whose marker landed is skipped in full before any index read.
  *  2. Clean replay (crash before any append): the dedup gate —
  *     re-feeding an unappended wire just re-runs it.
  *  3. Torn replay (crash BETWEEN the LSH append and the BM25 append,
  *     or inside the LSH append itself): the batch's admitted set is
  *     recovered from the audit's SELF-MATCH evidence (`n_self_dups` —
  *     a verified index match whose index doc IS the batch doc, at
  *     jaccard 1.0), not from the admit bits alone — a doc this batch
  *     already appended to the LSH index is rejected by the re-run
  *     audit because it finds itself, which without the self-match
  *     union would permanently drop it from the BM25 index (the
  *     round-12 defect). The repair path then appends only the docs
  *     missing from BM25 postings and recomputes stats from ground
  *     truth ([[Bm25Index.refreshStats]] — covers a crash between the
  *     postings append and the stats swap too), stamping the marker
  *     last.
  *
  * Self-match is exact replay evidence because doc ids are append-only
  * across batches (the persisted-index lifecycle convention): a clean
  * batch's docs can never find their own id in the index. It rides the
  * candidate/verify join the admit audit ALREADY runs, so the hot path
  * pays no extra index scan for replay detection; the postings doc_id
  * anti-join runs only when self-matches exist (a genuine replay),
  * never on the hot path.
  */
object IngestPipeline {

  final case class Doc(doc_id: Long, text: String)

  /** q31's poor-tier rule: documents under 20 tokens carry no signal
    * worth indexing (and would collide in the shingle-less LSH path). */
  val MinTokens = 20

  /** Lease-contention policy knobs: a batch that finds an index under
    * maintenance (a GDPR sweep, a compact — the [[MaintenanceLock]]
    * fail-fast) retries up to [[LeaseRetryAttempts]] times with
    * doubling backoff from [[LeaseRetryBaseMs]] (≈ 15.5 s total wait at
    * the defaults) before letting the exception surface. Re-running
    * the WHOLE batch after a mid-pipeline lease loss is safe by
    * construction — it is exactly the torn-replay shape the pipeline's
    * exactly-once layers already repair. */
  val LeaseRetryAttempts = 6
  val LeaseRetryBaseMs = 500L

  /** Run `body`, retrying on [[MaintenanceLock.LockHeldException]]
    * with bounded exponential backoff; the final attempt's exception
    * surfaces (deploy-time orchestration owns sweeps that outlast the
    * budget). `sleep` is the spec seam. */
  private[graft] def withLeaseRetry[T](
      maxAttempts: Int = LeaseRetryAttempts,
      baseBackoffMs: Long = LeaseRetryBaseMs,
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 1
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: MaintenanceLock.LockHeldException =>
          if (attempt >= maxAttempts) throw e
          sleep(baseBackoffMs << (attempt - 1))
          attempt += 1
      }
    }
    out.get
  }

  /** One batch through the full pipeline. Returns the number of docs
    * admitted (and therefore present in both indexes). With `opId` set
    * (the streaming path passes the micro-batch id) the batch is
    * exactly-once under replay at EVERY crash point. MARKER SCOPE: the
    * high-water mark is a single value per index, so an (lsh, bm25)
    * index pair belongs to exactly ONE ingest stream — two pipelines
    * sharing an index pair would skip each other's batch ids.
    *
    * CONTENTION POLICY: an index under another holder's maintenance
    * lease (a concurrent GDPR sweep or compact) makes the inner
    * lifecycles throw [[MaintenanceLock.LockHeldException]]; the batch
    * retries with bounded backoff ([[withLeaseRetry]]) — a short sweep
    * is absorbed invisibly, a sweep outlasting the retry budget
    * surfaces the exception to the caller (and fails the streaming
    * query — see [[start]]). */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
      lshDir: String, bm25Dir: String, opId: Option[Long] = None): Long =
    withLeaseRetry()(
      ingestBatchImpl(spark, batch, lshDir, bm25Dir, _ => (), opId))

  /** [[ingestBatch]] with an injectable crash point (spec-only seam —
    * called with "lsh:appended" before the BM25 side starts, plus the
    * seams [[LshBandIndex.admitImpl]] exposes via composition). */
  private[graft] def ingestBatchImpl(spark: SparkSession, batch: DataFrame,
      lshDir: String, bm25Dir: String, crashPoint: String => Unit,
      opId: Option[Long] = None): Long = {
    // layer 1: the whole batch already landed (marker swapped in with
    // its final write) — skip before touching either index
    if (opId.exists(id => Bm25Index.appliedOp(spark, bm25Dir).exists(_ >= id)))
      return 0L
    graft.functions.TextFunctions.register(spark)
    // a truly EMPTY input batch is not worth a marker commit: its
    // replay costs one isEmpty check, while stamping costs a manifest
    // version — an idle stream must not version-churn the index
    if (batch.isEmpty) return 0L
    // a NON-empty batch that changes nothing still records its op id
    // (one cheap manifest re-commit) — otherwise EVERY replay of an
    // all-rejected batch re-pays the full audit instead of the skip
    def stampOnly(): Long = { opId.foreach(id =>
      Bm25Index.stampOp(spark, bm25Dir, id)); 0L }
    val clean = batch.select(col("doc_id"), col("text"))
      .filter(size(graft.Dsl.toks(col("text"))) >= MinTokens)
    if (clean.isEmpty) return stampOnly()
    val audit = LshBandIndex.admitImpl(spark, clean, lshDir, crashPoint,
      withSelf = true)
    crashPoint("lsh:appended")
    val admittedNow = clean.join(
      audit.filter(col("admitted") === 1L).select("doc_id"), "doc_id")
    // layer 3: the batch's FULL admitted set = survivors this run
    // admitted ∪ docs whose SELF-MATCH proves a crashed earlier run of
    // the same batch already appended them (the audit re-rejects those
    // at jaccard 1.0 against themselves). The audit is localCheckpointed,
    // so both counts are in-memory passes — no index re-scan here.
    val nNow = admittedNow.count()
    val nReplayed = audit.filter(col("n_self_dups") > 0L).count()
    val nAll = nNow + nReplayed
    if (nAll == 0L) return stampOnly()
    if (nReplayed == 0L) {
      // hot path: no replay evidence — plain additive append, marker
      // swaps in with the stats write
      Bm25Index.appendImpl(spark, admittedNow, bm25Dir, crashPoint, opId)
      ()
    } else {
      // replay repair: append only the docs BM25 does not hold yet,
      // then recompute stats from postings (ground truth — also heals
      // a crash that landed postings but not stats) and stamp the op
      // materialized (batch-bounded) so the append job never reads the
      // postings dir it is writing to
      val admitted = clean.join(
        audit.filter(col("admitted") === 1L || col("n_self_dups") > 0L)
          .select("doc_id"), "doc_id")
      val missing = admitted.join(
        IndexManifest.read(spark, bm25Dir, "postings").select("doc_id"),
        Seq("doc_id"), "left_anti").localCheckpoint()
      crashPoint("bm25:repair")
      if (!missing.isEmpty)
        Bm25Index.append(spark, missing, bm25Dir)
      Bm25Index.refreshStats(spark, bm25Dir, opId)
    }
    nAll
  }

  /** Start the streaming form: every micro-batch runs [[ingestBatch]]
    * via foreachBatch (the per-batch work is index maintenance —
    * multi-table writes no streaming sink expresses directly), with
    * the micro-batch id as the exactly-once op id.
    *
    * CONTRACT with maintenance: a GDPR sweep or compact on the same
    * index pair holds the [[MaintenanceLock]] lease; a live batch
    * absorbs it via [[ingestBatch]]'s bounded retry (≈ 15.5 s budget
    * at the defaults). A sweep outlasting the budget FAILS the
    * streaming query — deliberately: the checkpoint makes the restart
    * replay the batch exactly-once, so the correct orchestration is
    * "restart the stream after long maintenance", never "let batches
    * silently skip". Deployments running sweeps longer than the budget
    * should stop the stream first (or raise the retry knobs). */
  def start(docs: Dataset[Doc], lshDir: String, bm25Dir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: Dataset[Doc], batchId: Long) =>
        ingestBatch(b.sparkSession, b.toDF(), lshDir, bm25Dir, Some(batchId))
        ()
      }
      .start()
}

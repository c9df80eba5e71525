package graft.streaming

import graft.operators.{Bm25Index, LshBandIndex}
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
  *       appends survivors' bands/sets)
  *     → BM25 inverted-index append of the admitted docs
  *       ([[Bm25Index.append]] — postings + additive stats)
  *
  * Replay safety comes from the DEDUP GATE, not the sink: re-feeding
  * an already-ingested wire finds every doc at jaccard 1.0 in the LSH
  * index and admits nothing, so the BM25 append is skipped and both
  * indexes are byte-stable — exactly-once EFFECT without idempotent
  * writes (IngestPipelineSpec replays the wire and pins both tables
  * unchanged). This is the q159 admit-replay property promoted to the
  * whole pipeline.
  */
object IngestPipeline {

  final case class Doc(doc_id: Long, text: String)

  /** q31's poor-tier rule: documents under 20 tokens carry no signal
    * worth indexing (and would collide in the shingle-less LSH path). */
  val MinTokens = 20

  /** One batch through the full pipeline. Returns the number of docs
    * admitted (and therefore appended to both indexes). */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
      lshDir: String, bm25Dir: String): Long = {
    graft.functions.TextFunctions.register(spark)
    val clean = batch.select(col("doc_id"), col("text"))
      .filter(size(graft.Dsl.toks(col("text"))) >= MinTokens)
    if (clean.isEmpty) return 0L
    val audit = LshBandIndex.admit(spark, clean, lshDir)
    val admitted = clean.join(
      audit.filter(col("admitted") === 1L).select("doc_id"), "doc_id")
    val n = admitted.count()
    if (n > 0) Bm25Index.append(spark, admitted, bm25Dir)
    n
  }

  /** Start the streaming form: every micro-batch runs [[ingestBatch]]
    * via foreachBatch (the per-batch work is index maintenance —
    * multi-table writes no streaming sink expresses directly). */
  def start(docs: Dataset[Doc], lshDir: String, bm25Dir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: Dataset[Doc], _: Long) =>
        ingestBatch(b.sparkSession, b.toDF(), lshDir, bm25Dir)
        ()
      }
      .start()
}

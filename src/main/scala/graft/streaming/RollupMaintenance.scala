package graft.streaming

import graft.operators.RollupStore
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.sql.Timestamp

/** Streaming materialized-view maintenance: the event stream drives
  * [[RollupStore]] through foreachBatch, so the day-level rollup is
  * always current without any consumer ever re-scanning fact history.
  * The streaming batchId IS the store's monotonic op id — Structured
  * Streaming replays the last uncommitted batch on restart
  * (at-least-once delivery), and the store's atomic `_applied_op`
  * marker turns that into exactly-once EFFECT: a replayed batchId is
  * skipped, a fresh one applies (the IngestPipeline replay philosophy,
  * but via the marker instead of a dedup gate — rollup rows, unlike
  * documents, carry nothing to dedup on).
  *
  * The first batch builds the store (one aggregate over that batch —
  * there is no fact history yet); every later batch is a q189 merge
  * whose cost scales with the batch. */
object RollupMaintenance {

  final case class FactEvt(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Apply one micro-batch; returns true when it changed the store. */
  def applyBatch(spark: SparkSession, batch: Dataset[FactEvt],
      dir: String, batchId: Long): Boolean = {
    RollupStore.recover(spark, dir) // vacuum any crash orphans first
    val exists = graft.operators.IndexManifest
      .load(spark, dir).exists(_.segmentsOf("rollup").nonEmpty)
    if (!exists) {
      // atomic build: the op marker lands WITH the initial table, so a
      // crash anywhere leaves either nothing (replay rebuilds) or the
      // complete marked table (replay skips) — never a double-apply
      RollupStore.buildAtomic(spark, batch.toDF(), dir, Some(batchId))
      true
    } else RollupStore.append(spark, batch.toDF(), dir, Some(batchId))
  }

  def start(evts: Dataset[FactEvt], dir: String,
      checkpointDir: String): StreamingQuery =
    evts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: Dataset[FactEvt], id: Long) =>
        applyBatch(b.sparkSession, b, dir, id)
        ()
      }
      .start()
}

package graft.operators

import graft.{Dsl, Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted maintained rollup — a materialized aggregate over the
  * events fact table keyed (day, event_type), carrying the four
  * q189/q243 aggregates: row count, EXACT decimal sum, min, max. The
  * maintenance twin of the five persisted index lifecycles
  * ([[LshBandIndex]], [[IvfIndex]], [[IvfPq]], [[Bm25Index]],
  * [[PrevalenceIndex]]): the fact table is scanned once at [[build]];
  * afterwards the store absorbs each ingest batch via [[append]]
  * (partial-state merge, the q189 math — count/sum add, min/max
  * least/greatest) and each right-to-be-forgotten request via
  * [[delete]] (retraction, the q243 math — count/sum subtract exactly;
  * min/max are NOT retractable from partials, so they are repaired
  * from a surviving-facts re-read pruned to the affected groups).
  * Groups retracted to n = 0 leave the store.
  *
  * At 100 TB this is the pattern that makes a day-level dashboard or
  * training-mix accounting table affordable: maintenance cost scales
  * with the BATCH (append) or the FORGET SLICE + affected groups
  * (delete), never with the accumulated fact history. The store itself
  * is |days|·|types| rows — readable in one task at any event volume.
  *
  * Crash-safety mirrors [[LshBandIndex.compact]]: every write lands in
  * a `_tmp` dir first, then rename-aside (live → `_old`), rename-in,
  * delete-aside — every intermediate state keeps a complete table on
  * disk, and [[recover]] repairs any crash point (prefers the
  * completed tmp, else restores the aside copy). After a swap the
  * spark catalog cache for the path is refreshed (the [[Bm25Index]]
  * lesson: a canonically equal reader plan would otherwise serve the
  * PRE-swap files from cache). RollupStoreSpec injects crashes at
  * every point and pins the full lifecycle bit-equal to the q245
  * declarative twin and to a from-scratch recompute.
  *
  * Provenance: generalizes the reference's per-minute aggregation
  * dashboard feed (consumer.py:95-118) into a maintained, deletable
  * table. */
object RollupStore {

  private val SumT = DecimalType(28, 4)

  private def dayCol: Column = date_trunc("day", col("ts")).as("day")

  /** Partial state for a slice of facts — the mergeable form (n and
    * the exact decimal sum are group-addable; mn/mx are least/greatest
    * mergeable but not subtractable). */
  private[operators] def partials(ev: DataFrame): DataFrame =
    ev.select(dayCol, col("event_type"), col("value"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).cast(SumT).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))

  /** One fact scan → the stored table. */
  def build(spark: SparkSession, facts: DataFrame, dir: String): Unit = {
    partials(facts).repartition(col("day"))
      .write.mode("overwrite").parquet(s"$dir/rollup")
    ()
  }

  /** [[build]] through the same atomic swap as the mutating ops, so
    * the op marker lands WITH the initial table — the first streaming
    * batch needs this (a crash between a plain build and a separate
    * marker stamp would double-apply that batch on replay). With no
    * live table the aside rename is a no-op and the swap degrades to
    * "install tmp". */
  def buildAtomic(spark: SparkSession, facts: DataFrame, dir: String,
      opId: Option[Long] = None): Unit =
    writeSwap(spark, partials(facts), dir, _ => (), opId)

  /** The maintained table, in its presentation form (exact decimal sum
    * surfaced as the bit-stable split double — the q189 convention). */
  def query(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/rollup")
      .select(col("day"), col("event_type"), col("n").as("n_events"),
        splitDbl(col("s")).as("sum_value"),
        col("mn").as("min_value"), col("mx").as("max_value"))
      .orderBy("day", "event_type")

  // ------------------------------------------------------------------
  // Exactly-once maintenance: every mutating op may carry a MONOTONIC
  // op id (a streaming batchId, an ingest-manifest sequence number).
  // The id is written as `_applied_op` INSIDE the tmp table before the
  // swap — underscore-prefixed, so parquet readers ignore it (the
  // _SUCCESS convention) — and therefore travels ATOMICALLY with the
  // data: a crash before the aside rename loses tmp+marker together
  // (replay re-applies), a crash after it installs data+marker
  // together under recover() (replay is skipped). A blind re-run with
  // the same op id is thus always correct — the replay caveat a bare
  // rename-aside swap cannot close (RollupStoreSpec pins both crash
  // sides and a double-apply).
  // ------------------------------------------------------------------

  /** Last applied maintenance op id, or None for a fresh store. */
  def appliedOp(spark: SparkSession, dir: String): Option[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/rollup/_applied_op")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, tableDir: String,
      opId: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$tableDir/_applied_op"), true)
    try out.write(opId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Merge an ingest batch into the store (q189 partial-state merge:
    * counts and exact sums add; min/max take least/greatest — valid
    * because append never removes rows). Cost: one pass over the BATCH
    * plus a store-sized merge — the fact history is never re-read.
    *
    * With `opId` set, the append is EXACTLY-ONCE under replay: ids at
    * or below the store's `_applied_op` marker are skipped (returns
    * false), and the marker swaps atomically with the table (see the
    * marker note above). Without an id the caller owns replay safety
    * (an upstream dedup gate — the [[graft.streaming.IngestPipeline]]
    * convention). */
  def append(spark: SparkSession, batch: DataFrame, dir: String,
      opId: Option[Long] = None): Boolean =
    appendImpl(spark, batch, dir, _ => (), opId)

  private[graft] def appendImpl(spark: SparkSession, batch: DataFrame,
      dir: String, crashPoint: String => Unit,
      opId: Option[Long] = None): Boolean = {
    if (opId.exists(id => appliedOp(spark, dir).exists(_ >= id)))
      return false
    val store = spark.read.parquet(s"$dir/rollup")
    val b = partials(batch)
      .withColumnRenamed("n", "bn").withColumnRenamed("s", "bs")
      .withColumnRenamed("mn", "bmn").withColumnRenamed("mx", "bmx")
    val merged = store.join(b, Seq("day", "event_type"), "full_outer")
      .select(col("day"), col("event_type"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(BigDecimal(0)).cast(SumT))
          + coalesce(col("bs"), lit(BigDecimal(0)).cast(SumT)))
          .cast(SumT).as("s"),
        least(col("mn"), col("bmn")).as("mn"),
        greatest(col("mx"), col("bmx")).as("mx"))
    writeSwap(spark, merged, dir, crashPoint, opId)
    true
  }

  /** Right-to-be-forgotten: retract every fact row of `forgetUsers`
    * from the store. Counts and sums subtract exactly (abelian); min/
    * max are repaired by re-reading SURVIVING facts for the AFFECTED
    * groups only (semi-join-pruned — untouched groups keep their
    * stored extrema and cost nothing). `facts` is the full fact table
    * the store was built+appended from; only the forget slice and the
    * affected groups' survivors are ever aggregated.
    *
    * Retraction is NOT naturally idempotent (the forget rows are still
    * in `facts`, so a replay would subtract them again) — pass `opId`
    * to make it exactly-once via the same atomic marker as [[append]]. */
  def delete(spark: SparkSession, facts: DataFrame, forgetUsers: DataFrame,
      dir: String, opId: Option[Long] = None): Boolean =
    deleteImpl(spark, facts, forgetUsers, dir, _ => (), opId)

  private[graft] def deleteImpl(spark: SparkSession, facts: DataFrame,
      forgetUsers: DataFrame, dir: String,
      crashPoint: String => Unit, opId: Option[Long] = None): Boolean = {
    if (opId.exists(id => appliedOp(spark, dir).exists(_ >= id)))
      return false
    val store = spark.read.parquet(s"$dir/rollup")
    val slice = facts.join(broadcast(forgetUsers), Seq("user_id"))
    // cached and owned HERE (writeSwap materializes synchronously, so
    // unlike the q245 twin no scope is needed): both the retraction
    // join and the repair semi-join read the forget-slice partials
    val deltas = slice.select(dayCol, col("event_type"), col("value"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("dn"),
        sum(col("value").cast(Dec)).cast(SumT).as("ds"))
      .cache()
    try {
      val survivors = facts.join(broadcast(forgetUsers), Seq("user_id"),
        "left_anti")
      val repaired = survivors
        .select(dayCol, col("event_type"), col("value"))
        .join(deltas.select("day", "event_type"), Seq("day", "event_type"),
          "left_semi")
        .groupBy("day", "event_type")
        .agg(min(col("value")).as("rmn"), max(col("value")).as("rmx"))
      val next = store.join(deltas, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          (col("n") - coalesce(col("dn"), lit(0L))).as("n"),
          (col("s") - coalesce(col("ds"), lit(BigDecimal(0)).cast(SumT)))
            .cast(SumT).as("s"),
          col("mn"), col("mx"), col("dn").isNotNull.as("affected"))
        .filter(col("n") > 0)
        .join(repaired, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), col("n"), col("s"),
          when(col("affected"), col("rmn")).otherwise(col("mn")).as("mn"),
          when(col("affected"), col("rmx")).otherwise(col("mx")).as("mx"))
      writeSwap(spark, next, dir, crashPoint, opId)
    } finally { deltas.unpersist(); () }
    true
  }

  /** Rename-aside swap of the single `rollup` table (the
    * [[LshBandIndex.compact]] discipline): tmp write → live aside →
    * tmp in → aside delete, with a spec-injectable crash point after
    * each step; ends with a path-cache refresh so a pre-existing
    * reader plan cannot serve the old files. The merged/next frame
    * must be MATERIALIZED to tmp before any rename — it reads the live
    * dir it is about to replace. */
  private def writeSwap(spark: SparkSession, next: DataFrame, dir: String,
      crashPoint: String => Unit, opId: Option[Long] = None): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def P(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = s"$dir/rollup"
    val tmp = s"$dir/rollup_tmp"
    val old = s"$dir/rollup_old"
    next.repartition(col("day")).write.mode("overwrite").parquet(tmp)
    // the op marker lands INSIDE tmp, so data + marker swap atomically
    opId.foreach(writeMarker(spark, tmp, _))
    crashPoint("written")
    // no live table on a first buildAtomic — the swap degrades to
    // "install tmp" (local-FS rename THROWS on a missing source)
    if (fs.exists(P(live))) fs.rename(P(live), P(old))
    crashPoint("aside")
    fs.rename(P(tmp), P(live))
    crashPoint("swapped")
    fs.delete(P(old), true)
    spark.catalog.refreshByPath(live)
    ()
  }

  /** Repair a crashed [[writeSwap]] to a fully-live store: live
    * missing → swap in the completed tmp (complete by construction
    * once the aside rename happened), else restore the aside copy;
    * stale tmp/old dirs (including a partial tmp from a crash
    * mid-write while live is intact) are deleted. Unlike
    * [[LshBandIndex.recover]], tmp completeness is WITNESSED (Spark's
    * `_SUCCESS` commit marker), not inferred from live's absence —
    * [[buildAtomic]] legitimately runs with no live table, so a crash
    * mid-first-write leaves a partial tmp and nothing else; installing
    * it would resurrect a torn table. Safe to run unconditionally at
    * open; returns true when it changed anything. */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def P(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = P(s"$dir/rollup")
    val tmp = P(s"$dir/rollup_tmp")
    val old = P(s"$dir/rollup_old")
    val tmpComplete = fs.exists(P(s"$dir/rollup_tmp/_SUCCESS"))
    var repaired = false
    if (!fs.exists(live)) {
      if (fs.exists(tmp) && tmpComplete) {
        fs.rename(tmp, live); repaired = true
      } else if (fs.exists(old)) { fs.rename(old, live); repaired = true }
      else if (fs.exists(tmp)) { fs.delete(tmp, true); repaired = true }
    }
    if (fs.exists(live)) {
      if (fs.exists(old)) { fs.delete(old, true); repaired = true }
      if (fs.exists(tmp)) { fs.delete(tmp, true); repaired = true }
    }
    if (repaired) spark.catalog.refreshByPath(s"$dir/rollup")
    repaired
  }

  /** q245 — the DECLARATIVE lifecycle twin: build on the even-event_id
    * half, merge-append the odd half (q189 ⊕), then retract the
    * forget-list user_id % 37 = 0 with targeted min/max repair
    * (q243 ⊖), all in one plan. The ORACLE is the from-scratch rollup
    * over survivors, so the COMPOSITION law (A ⊕ B) ⊖ D ≡
    * recompute((A ∪ B) ∖ D) is hash-proven — including that
    * least/greatest extrema from the merge survive the repair
    * correctly. RollupStoreSpec pins the PERSISTED lifecycle (disk
    * swaps, crash injection, recover) bit-equal to this twin.
    *
    * Scale shape: the halves are role-split pruned scans (the q189
    * precedent), the forget slice and repair read are q243's shapes;
    * every aggregate is map-combinable. */
  val lifecycleTwin: Q = Q(
    "q245_rollup_lifecycle",
    (s, d) => {
      val ev = Tables.events(s, d)
      val isDel = coalesce(col("user_id") % 37 === 0, lit(false))
      val a = partials(ev.filter(pmod(col("event_id"), lit(2)) === 0))
      val b = partials(ev.filter(pmod(col("event_id"), lit(2)) === 1))
        .withColumnRenamed("n", "bn").withColumnRenamed("s", "bs")
        .withColumnRenamed("mn", "bmn").withColumnRenamed("mx", "bmx")
      val merged = a.join(b, Seq("day", "event_type"), "full_outer")
        .select(col("day"), col("event_type"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("bn"), lit(0L)))
            .as("n"),
          (coalesce(col("s"), lit(BigDecimal(0)).cast(SumT))
            + coalesce(col("bs"), lit(BigDecimal(0)).cast(SumT)))
            .cast(SumT).as("s"),
          least(col("mn"), col("bmn")).as("mn"),
          greatest(col("mx"), col("bmx")).as("mx"))
      val evd = ev.select(col("user_id"), dayCol, col("event_type"),
        col("value"))
      val deltas = graft.CacheScope.cached(
        evd.filter(isDel).groupBy("day", "event_type")
          .agg(count(lit(1)).as("dn"),
            sum(col("value").cast(Dec)).cast(SumT).as("ds")))
      val repaired = evd.filter(!isDel)
        .join(deltas.select("day", "event_type"),
          Seq("day", "event_type"), "left_semi")
        .groupBy("day", "event_type")
        .agg(min(col("value")).as("rmn"), max(col("value")).as("rmx"))
      merged.join(deltas, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          (col("n") - coalesce(col("dn"), lit(0L))).as("n_events"),
          (col("s") - coalesce(col("ds"), lit(BigDecimal(0)).cast(SumT)))
            .cast(SumT).as("sd"),
          col("mn"), col("mx"), col("dn").isNotNull.as("affected"))
        .filter(col("n_events") > 0)
        .join(repaired, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), col("n_events"),
          splitDbl(col("sd")).as("sum_value"),
          when(col("affected"), col("rmn")).otherwise(col("mn"))
            .as("min_value"),
          when(col("affected"), col("rmx")).otherwise(col("mx"))
            .as("max_value"))
        .orderBy("day", "event_type")
    },
    Some(s"""WITH sv AS (SELECT date_trunc('day', ts) AS day, event_type,
          value FROM events
        WHERE NOT coalesce(user_id % 37 = 0, false))
      SELECT day, event_type, cast(count(*) as bigint) AS n_events,
        ${sqlDsum("value")} AS sum_value,
        min(value) AS min_value, max(value) AS max_value
      FROM sv GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  val all: Seq[Q] = Seq(lifecycleTwin)
}

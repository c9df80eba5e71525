package graft.operators

import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Per-index probe accounting — the data the maintenance gates price
  * against ACTUAL serving traffic instead of a guessed constant.
  *
  * Two ledgers per index dir (keyed the [[MaintenanceLock]] canonical
  * way, so every spelling of one dir meets on one slot):
  *
  *   - `probes since the last physical delete` — consumed by
  *     [[graft.streaming.AnnMaintenance]]'s backlog gate: the
  *     tombstone anti-join taxes every probe, so the apply is due when
  *     the probes ACTUALLY PAID since the last apply cover the rewrite
  *     (q271's `breakeven_probes`, now fed with real traffic — the
  *     round-17 form amortized against a hard-coded expected budget).
  *     [[IvfIndex.applyDeletesImpl]] / [[IvfPq.applyDeletesImpl]]
  *     reset it, so GDPR sweeps outside the maintainer re-arm the gate
  *     too.
  *   - `per-cell probe touches since the last rebalance` — consumed by
  *     the traffic gate: q275's strongest signal is "actual probes
  *     touching the worst cells means the rebalance is overdue
  *     regardless of hot_factor", which is unactionable without
  *     knowing where probes land. [[IvfIndex.rebalance]] /
  *     [[IvfPq.rebalance]] reset it (the gate re-arms from fresh
  *     traffic — a degenerate unsplittable worst set cannot re-fire
  *     the pass every trigger the way the population-only diffuse gate
  *     honestly does).
  *
  * What counts as one probe: one EXECUTED pruned-scan attempt — the
  * plan builders ([[IvfIndex.queryPlanFrom]], IvfPq's probe plan)
  * record at plan-construction time, so an eager probe's re-planned
  * retries each count. That is the honest unit: every attempt pays the
  * scan (and the tombstone anti-join) whether or not it is served.
  *
  * Loss mode, documented: the ledger is IN-MEMORY and PER-JVM. A
  * restart zeroes it; probes served by other processes are invisible.
  * Both err toward UNDER-counting, whose only cost is a delayed drain
  * or split — never a wrong answer, never a spurious rewrite. A
  * multi-process deployment lifts the same two counters into a
  * manifest row (per-executor partial rows summed at the trigger
  * batch, the [[IndexManifest]] commit discipline); the gate
  * arithmetic is unchanged. Memory stays bounded: one entry per index
  * dir this JVM probes, touch keys bounded by the index's cell count.
  */
object ProbeLedger {

  private final class Entry {
    @volatile var probes = new LongAdder
    @volatile var touches = new ConcurrentHashMap[Int, LongAdder]()
  }

  private val entries = new ConcurrentHashMap[String, Entry]()

  private def entryOf(spark: SparkSession, indexDir: String): Entry =
    entries.computeIfAbsent(
      MaintenanceLock.canonicalKey(spark, indexDir), _ => new Entry)

  /** One executed probe attempt over `cells` (the ranked + orphan set
    * its pruned scan reads). */
  def record(spark: SparkSession, indexDir: String, cells: Seq[Int]): Unit = {
    val e = entryOf(spark, indexDir)
    e.probes.increment()
    val t = e.touches
    cells.foreach(c => t.computeIfAbsent(c, _ => new LongAdder).increment())
  }

  /** Probe attempts since the last [[markDrained]] (physical delete). */
  def probesSinceDrain(spark: SparkSession, indexDir: String): Long =
    entryOf(spark, indexDir).probes.sum()

  /** Probe attempts since the last [[markRebalanced]] that touched any
    * of `cells` — summed per cell, so one probe touching two worst
    * cells counts its tax twice, matching the forecast's per-cell row
    * accounting. */
  def touchesOn(spark: SparkSession, indexDir: String,
      cells: Seq[Int]): Long = {
    val t = entryOf(spark, indexDir).touches
    cells.map(c => Option(t.get(c)).map(_.sum()).getOrElse(0L)).sum
  }

  /** Reset the probe counter — called by the applyDeletes paths after
    * the rewrite lands. Counts recorded DURING the apply are dropped
    * with it (the documented under-counting direction). */
  def markDrained(spark: SparkSession, indexDir: String): Unit = {
    entryOf(spark, indexDir).probes = new LongAdder; ()
  }

  /** Reset the per-cell touch map — called by the rebalance paths
    * (split or no-op alike: the traffic gate re-arms from fresh
    * traffic rather than re-firing on stale touches forever). */
  def markRebalanced(spark: SparkSession, indexDir: String): Unit = {
    entryOf(spark, indexDir).touches = new ConcurrentHashMap[Int, LongAdder]()
    ()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** The GDPR retirement memory of the partition-dir ANN lifecycles
  * ([[IvfIndex]] / [[IvfPq]]), moved behind the [[IndexManifest]]
  * commit layer.
  *
  * WHAT it remembers: every vec_id a completed `applyDeletes` has
  * physically removed. The append guards anti-join stored ∪ retired,
  * so an at-least-once replay of an old batch AFTER one of its ids was
  * deleted and physically applied cannot resurrect the forgotten
  * vector (the rows are gone — the stored-ids guard alone would wave
  * the replay through). Ids are retired forever; the lifecycle's
  * append-only id convention makes that correct, never a false
  * rejection.
  *
  * WHY the manifest: the round-16 form was a plain `retired/` dir that
  * appended one `repartition(1)` file per applyDeletes FOREVER and was
  * read in full by every append's guard — the one unbounded in-place
  * structure left on the serving path. It could not be compacted in
  * place: without a commit, any rewrite (distinct + overwrite) opens a
  * window where a crash leaves the table partial or absent, and a hole
  * in the retirement memory is a resurrection path. Behind the
  * manifest the set is ATOMIC at every instant — [[retire]] stages an
  * invisible segment and publishes it with one manifest rename, and
  * compaction (triggered when the live segment count passes
  * [[CompactThreshold]]) is the same shape: stage ONE merged distinct
  * segment, swap, vacuum. A crash anywhere leaves either the old
  * manifest (all old segments live — the complete set) or the new one
  * (the merged segment live — the complete set); no torn state exists
  * from which a replayed pre-delete batch could slip an id past the
  * guard. Segment count stays ≤ [[CompactThreshold]], file count drops
  * at each compaction, duplicate rows (from replayed crashed applies)
  * collapse.
  *
  * Vacuum depth: the append path retains one manifest generation (a
  * lock-free [[IvfIndex.servingHealth]] read one commit behind still
  * resolves complete files); compaction vacuums fully — physically
  * reclaiming the superseded small files is its entire point, and the
  * only lock-free reader ([[count]]) retries a vanished-segment read
  * once against the fresh manifest.
  *
  * Legacy adoption: a pre-round-17 index carries the plain `retired/`
  * dir. [[read]] falls back to it, and the first [[retire]] adopts it
  * through [[IndexManifest.migrate]] (rename into the segment store +
  * initial commit — crash-safe under replay, the migrate contract).
  *
  * Callers hold the [[MaintenanceLock]] (applyDeletes does); [[retire]]
  * re-enters it for safety — mutation is single-writer like every
  * other lifecycle surface.
  */
private[graft] object RetiredIds {

  val Table = "retired"

  /** Live segments allowed before [[retire]] compacts-on-append: keeps
    * the guard's read fan-in bounded at any deletion rate (the set
    * itself is ids-only — 8 bytes a row, bounded by lifetime deletes,
    * never corpus size). */
  val CompactThreshold = 8

  /** The retired-id set, or None when nothing was ever retired.
    * Manifest-first; falls back to the pre-manifest layouts so
    * read-only callers (and the append guards) never lose the set on
    * an un-migrated legacy index — in EITHER of its two on-disk
    * shapes: the plain `retired/` dir, or `segs/retired-legacy` when
    * the first retire's migrate crashed AFTER the (atomic) rename but
    * BEFORE the manifest commit. Without the second fallback that torn
    * instant would hide the whole retired set from the append guard —
    * a replayed pre-delete batch could resurrect forgotten vectors, the
    * exact window the manifest move exists to close. Rename atomicity
    * means at most one of the two shapes exists; the union is still
    * taken defensively (an id present in either was truly retired — the
    * set is append-only, so over-reading is never a false rejection). */
  def read(spark: SparkSession, indexDir: String): Option[DataFrame] =
    IndexManifest.readOpt(spark, indexDir, Table).orElse {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val dirs = Seq(s"$indexDir/retired", s"$indexDir/segs/$Table-legacy")
        .filter(d => fs.exists(new Path(d)))
      if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
    }

  /** Distinct retired ids — the [[IvfIndex.servingHealth]] readout.
    * Distinct (not raw rows) so the number is stable across
    * compactions: replayed crashed applies write duplicate rows by
    * design, and a count that dropped at each compaction would read as
    * un-forgetting. Lock-free dashboard read: one retry absorbs a
    * compaction's full vacuum landing mid-read. */
  def count(spark: SparkSession, indexDir: String): Long = {
    def once(): Long =
      read(spark, indexDir)
        .map(_.select("vec_id").distinct().count()).getOrElse(0L)
    try once()
    catch { case t: Throwable if IvfIndex.retryableProbeFailure(t) => once() }
  }

  /** Retire a batch of ids: adopt any legacy layout, stage a segment,
    * publish atomically; compact-on-append past the threshold. */
  def retire(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    retireImpl(spark, indexDir, ids, _ => ())

  /** [[retire]] with the spec seams exposed: `crashPoint` fires at
    * `retired:staged` (segment written, nothing visible) and
    * `retired:committed` (manifest swapped, vacuum pending);
    * `compactThreshold` lets a spec force the compaction path. */
  private[graft] def retireImpl(spark: SparkSession, indexDir: String,
      ids: DataFrame, crashPoint: String => Unit,
      compactThreshold: Int = CompactThreshold): Unit =
   MaintenanceLock.withLock(spark, indexDir) {
    // the migrate's own seams surface through the retire crash channel
    // (prefixed) so the fuzz can kill the FIRST retire inside the
    // legacy adoption — the rename-done/commit-missing instant that
    // read()'s segs/retired-legacy fallback covers
    IndexManifest.migrateImpl(spark, indexDir, Seq(Table),
      p => crashPoint(s"migrate:$p"))
    val cur = IndexManifest.load(spark, indexDir)
    val curSegs = cur.map(_.segmentsOf(Table)).getOrElse(Seq.empty)
    val curTables = cur.map(_.tables).getOrElse(Map.empty[String, Seq[String]])
    val batch = ids.select("vec_id").distinct()
    if (curSegs.size + 1 > compactThreshold) {
      // compact-on-append: ONE merged distinct segment replaces the
      // whole list — atomic swap, no torn window, then full vacuum
      // physically reclaims the superseded files
      val all = spark.read.parquet(curSegs.map(s => s"$indexDir/segs/$s"): _*)
        .select("vec_id").unionByName(batch).distinct()
      val seg = IndexManifest.newSegment(spark, indexDir, Table)(p =>
        all.repartition(1).write.parquet(p))
      crashPoint("retired:staged")
      IndexManifest.commit(spark, indexDir, curTables + (Table -> Seq(seg)))
      crashPoint("retired:committed")
      IndexManifest.vacuum(spark, indexDir)
    } else {
      val seg = IndexManifest.newSegment(spark, indexDir, Table)(p =>
        batch.repartition(1).write.parquet(p))
      crashPoint("retired:staged")
      IndexManifest.commit(spark, indexDir,
        curTables + (Table -> (curSegs :+ seg)))
      crashPoint("retired:committed")
      IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
    }
    ()
  }
}

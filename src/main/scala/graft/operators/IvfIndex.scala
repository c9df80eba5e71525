package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index lifecycle: build ONCE, persist as plain parquet, query MANY
  * — the serving shape for ANN at 100 TB, where re-clustering per query
  * (q55's self-contained form) is obviously wrong.
  *
  * The index is two parquet tables:
  *   - `centroids/`  — (cell, centroid: array<double>), k rows: tiny,
  *     collected driver-side at query time to pick probe cells;
  *   - `vectors/`    — (vec_id, label, e, nrm) PARTITIONED BY cell, so a
  *     probe reads ONLY its nprobe directories: partition pruning does
  *     the index lookup, no custom storage engine needed.
  *
  * Query = load centroids (k rows) → nearest nprobe cells to the query
  * vector (driver-side, k·dim floats) → partition-pruned scan of those
  * cells → exact cosine re-rank → top-k. IvfIndexSpec asserts the scan
  * actually prunes (input files ⊂ the probed cell directories) and that
  * recall vs brute force is sane.
  *
  * Storage note: unlike the hash/text lifecycles the VECTOR tables do
  * NOT sit behind the [[IndexManifest]] commit layer — their lookup IS
  * the cell partition directory, and dynamic partition overwrite
  * (rebalance/applyDeletes) rewrites exactly the touched dirs, which a
  * flat segment manifest cannot express without re-inventing
  * per-partition tracking. The flat RETIRED-ID set is the exception:
  * it lives behind the manifest ([[RetiredIds]]) so its compaction is
  * an atomic swap with no resurrection window. The residual is Spark's own file-commit
  * window: a crash DURING a job commit can surface a subset of an
  * append's files (never torn rows — parquet files land whole). Every
  * mutation here is idempotent under replay (the vec_id anti-join
  * guard re-admits only the missing vectors; applyDeletes re-applies
  * harmlessly), so the window costs a transient recall dip, never a
  * wrong served vector — a claim IvfCrashSpec TESTS on both append
  * paths by installing only half of an append's files and asserting
  * (a) every torn-state answer carries a true vector's exact score and
  * (b) the blind replay converges to the clean build+append state. A
  * cluster deployment closes the window entirely with a
  * partition-aware table format (the same public Delta/Iceberg idea
  * the manifest applies to the flat tables).
  *
  * Single-writer is ENFORCED, not assumed: every mutating entry point
  * (build/appendVectors/delete/applyDeletes/rebalance) holds the
  * [[MaintenanceLock]] lease, same as the manifest lifecycles —
  * without it, two replays of one append racing each other both pass
  * the vec_id anti-join guard and double-admit the batch (the
  * partition-dir layout has no manifest commit to detect the lost
  * race). Reads stay lock-free — and because
  * [[graft.streaming.AnnMaintenance]] rebalances the serving index
  * automatically, a probe racing an applyDeletes/rebalance partition
  * overwrite is the NORMAL case, not an off-peak corner. [[query]]
  * therefore runs eagerly under a bounded re-resolve-and-retry (see
  * [[ProbeRetryAttempts]]): a transient missing file or a centroid
  * view that changed under the scan re-reads the centroids and
  * re-plans the pruned scan, so routine maintenance costs at most a
  * re-planned attempt — never a failed serving query, never a wrong
  * vector (parquet files land whole; every row read is a true stored
  * vector with its exact score). The manifest lifecycles'
  * snapshot-pinned reads are the same guarantee bought structurally;
  * a cluster deployment gets it from a partition-aware table format
  * (the public Delta/Iceberg idea).
  */
object IvfIndex {

  /** Fit the coarse quantizer and write the two index tables. */
  def build(spark: SparkSession, sfDir: String, indexDir: String,
      k: Int = 16, seed: Long = 1L): Unit =
   MaintenanceLock.withLock(spark, indexDir) {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.VectorFunctions.register(spark)
    val w = Tables_normed(spark, sfDir)
      .withColumn("fv", array_to_vector(col("e"))).cache()
    try {
      val km = new KMeans().setK(k).setSeed(seed)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(w)
      val spark2 = spark
      import spark2.implicits._
      km.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$indexDir/centroids")
      km.transform(w)
        .select(col("vec_id"), col("label"), col("e"), col("nrm"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$indexDir/vectors")
    } finally w.unpersist()
  }

  /** Probe-retry policy: [[AnnMaintenance]] rebalances the SERVING
    * index automatically every Nth batch and GDPR applyDeletes rewrites
    * cell partitions in place, so a lock-free probe racing a partition
    * overwrite is the designed-for NORMAL case, not an off-peak corner
    * — a serving query that fails with FileNotFoundException during
    * routine maintenance is an availability hole at 100 TB. [[query]]
    * therefore executes EAGERLY under a bounded retry: a transient
    * missing-file failure (or a centroid view that changed under the
    * probe — the mixed new-centroids/old-vectors window) re-resolves
    * the centroids and re-plans the pruned scan. Every row read is
    * still a true stored vector with its exact score (parquet files
    * land whole), so the bound stays "transient recall dip, never a
    * wrong vector" — the retry just converts "transient failure" into
    * "answer from the post-maintenance view". */
  val ProbeRetryAttempts = 4
  val ProbeRetryBackoffMs = 50L

  /** Over-fetch for the eager probe's driver-side vec_id dedupe: a
    * listing racing a dynamic-overwrite commit can see a moved row
    * under BOTH its old and new cell dir, and duplicates inside a
    * plain `limit(topK)` would push true neighbors out of the answer.
    * Sized for one full double-listing — every row in the limit window
    * seen under old+new dir at once (fetching 2·topK + slack then
    * still yields ≥ topK uniques; quiesced results stay bit-identical:
    * dedupe no-ops and take(topK) trims the slack; the top-k heap cost
    * of the larger limit is negligible). Deeper multiplicity is
    * possible — a row can move TWICE across rebalance rounds, tripling
    * its listings — so the headroom is a fast path, not the guarantee:
    * [[eagerProbe]] treats an under-filled deduped answer out of a
    * saturated fetch as a retry signal, and only a retry-exhausted
    * final attempt may serve fewer than topK unique rows. */
  private[graft] val DupHeadroom = 8

  private[graft] def withHeadroom(topK: Int): Int =
    if (topK > (Int.MaxValue - DupHeadroom) / 2) topK
    else 2 * topK + DupHeadroom

  /** A failure a probe should re-plan around: a file deleted between
    * the scan's listing and its read (partition overwrite mid-commit),
    * or a table dir momentarily empty under an overwrite. Walks the
    * cause chain — Spark wraps the task's FileNotFoundException in
    * SparkException layers. Classification prefers the structured
    * error CONDITION (SparkThrowable.getCondition) over message
    * substrings — a query whose data happens to mention
    * "FileNotFoundException" must not look transient; the message
    * fallback survives only for non-SparkThrowable wrapper layers
    * whose cause chain was truncated. */
  private[graft] def retryableProbeFailure(t: Throwable): Boolean = {
    var cur = t
    var n = 0
    while (cur != null && n < 16) {
      cur match {
        case _: java.io.FileNotFoundException => return true
        case st: org.apache.spark.SparkThrowable
            if st.getCondition != null &&
              (st.getCondition == "PATH_NOT_FOUND" ||
                st.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
                st.getCondition == "FAILED_READ_FILE.FILE_NOT_EXIST") =>
          return true
        case a: org.apache.spark.sql.AnalysisException
            if a.getMessage != null &&
              a.getMessage.contains("Path does not exist") => return true
        case _ =>
          if (cur.getCause == null && cur.getMessage != null &&
              cur.getMessage.contains("FileNotFoundException")) return true
      }
      cur = cur.getCause
      n += 1
    }
    false
  }

  /** Internal retry signal: the centroid view changed while the scan
    * ran, so the answer may have probed a stale cell list. */
  private[graft] final class StaleProbe extends RuntimeException("stale probe")

  private[graft] def readCentroids(spark: SparkSession,
      indexDir: String): Array[(Int, Array[Double])] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  private[graft] def sameCentroids(a: Array[(Int, Array[Double])],
      b: Array[(Int, Array[Double])]): Boolean =
    a.length == b.length &&
      a.sortBy(_._1).zip(b.sortBy(_._1)).forall { case ((ca, va), (cb, vb)) =>
        ca == cb && java.util.Arrays.equals(va, vb)
      }

  /** The cell-partition layout witness: the sorted dir names under the
    * vector (or codes) table. A rebalance moves rows BEFORE it rewrites
    * the centroids — and every split CREATES a partition dir, every
    * emptied-cell delete REMOVES one — so comparing this listing before
    * and after the scan catches a rebalance IN FLIGHT that the centroid
    * compare alone would miss (the window where a probe would silently
    * serve a top-k without the moved rows). Metadata-only, one listing
    * call. The compare itself ([[eagerProbe]]) is ASYMMETRIC: a REMOVED
    * dir or a new dir under an id the pinned centroid view doesn't list
    * (a fresh orphan — rows moved mid-scan) re-plans; a new dir under a
    * KNOWN centroid id is just an append's first write into an empty
    * cell, and a probe racing an append legitimately serves the
    * pre-append view (appends never move existing rows). Only `cell=N`
    * dirs count: Spark's transient job-staging dirs (`_temporary`,
    * `.spark-staging-*`) appear and vanish during every routine
    * append/overwrite commit, and including them would make probes
    * spin StaleProbe retries through every append window. */
  private[graft] def cellDirs(spark: SparkSession, indexDir: String,
      table: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$table")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isCellDir(n)).sorted.toSeq
  }

  /** `cell=<int>` and nothing else — empty or over-Int suffixes (a
    * stray junk dir) are ignored rather than crashing the serving
    * path with a NumberFormatException. */
  private def isCellDir(name: String): Boolean = {
    val suffix = name.stripPrefix("cell=")
    name.startsWith("cell=") && suffix.nonEmpty && suffix.length <= 9 &&
      suffix.forall(_.isDigit)
  }

  /** The shared eager-probe retry loop (serving entry for BOTH ANN
    * lifecycles — IvfPq injects its ADC plan): pin the centroid view
    * AND the cell-dir layout, run the injected plan, and re-plan when
    * either witness changed under the scan (asymmetric dir compare —
    * see [[cellDirs]]: removals and fresh ORPHAN dirs re-plan, a
    * first-write append dir under a known centroid id does not), when
    * the scan hit a mid-overwrite missing file, or when dedupe left
    * FEWER than `keep` unique rows out of a saturated fetch (duplicate
    * listings or a mid-commit overwrite window ate slots true
    * neighbors should hold); dedupe mid-commit double-listed rows by
    * `vec_id` and trim the [[withHeadroom]] slack back to `keep`.
    * Serving is complete UNLESS RETRIES EXHAUST: the final attempt
    * serves the possibly-stale (and possibly under-filled) answer
    * instead of failing the serving path — every row served is still a
    * true stored vector with its exact score, the hard bound.
    *
    * Fail-fast guard (first attempt only): a retryable-looking failure
    * against an index whose centroids AND data table have never
    * existed is a permanent user error (wrong `indexDir`), not a
    * maintenance window — it surfaces immediately instead of burning
    * the backoff budget. */
  private[graft] def eagerProbe(spark: SparkSession, indexDir: String,
      table: String, keep: Int, afterPin: Int => Unit, maxAttempts: Int,
      sleep: Long => Unit)(
      plan: (Array[(Int, Array[Double])], Seq[Int], Int) => DataFrame)
      : DataFrame = {
    var attempt = 1
    var out: Option[DataFrame] = None
    while (out.isEmpty) {
      try {
        val c1 = readCentroids(spark, indexDir)
        val d1 = cellDirs(spark, indexDir, table)
        afterPin(attempt)
        // orphan dirs (cells the centroid view doesn't list — a
        // rebalance in flight or a crashed one) are ALWAYS scanned:
        // the moved rows live there until the centroid rewrite lands.
        // The loop OWNS the over-fetch: the closure limits to the
        // `fetch` it is handed, so no caller can forget the headroom
        // that makes the dedupe shrink-proof.
        val fetch = withHeadroom(keep)
        val df = plan(c1, orphanCells(d1, c1), fetch)
        val rows = df.collect()
        // witness pair: the centroid compare catches a FINISHED
        // rebalance; the dir listing catches one in flight (rows move
        // before the centroid rewrite lands). A removed dir or a NEW
        // dir the pinned centroids don't list means the probe may have
        // missed moved rows; a new dir under a known centroid id is an
        // append's first write into an empty cell — the pre-append
        // view is legitimate, no retry. Short-circuit order matters:
        // the final attempt must serve — skip both witness re-reads
        // when no retry is possible.
        if (attempt < maxAttempts) {
          val stale = !sameCentroids(c1, readCentroids(spark, indexDir)) || {
            val d2 = cellDirs(spark, indexDir, table)
            val removed = d1.exists(!d2.contains(_))
            val known = c1.map(_._1).toSet
            val freshOrphan = d2.exists(n => !d1.contains(n) &&
              !known.contains(n.stripPrefix("cell=").toInt))
            removed || freshOrphan
          }
          if (stale) throw new StaleProbe
        }
        val seen = scala.collection.mutable.HashSet.empty[Long]
        val idPos = df.schema.fieldIndex("vec_id")
        val uniq = rows.filter(r => seen.add(r.getLong(idPos))).take(keep)
        // under-fill = a retry signal, not an answer: duplicates can
        // only shrink the unique set below `keep` when the fetch limit
        // SATURATED (rows.length == fetch — more uniques may exist past
        // the limit) or when a mid-commit overwrite hid survivors the
        // witness can't see (file-level, same dir names). A short scan
        // of a genuinely small corpus returns rows < fetch and serves.
        if (attempt < maxAttempts && uniq.length < keep &&
            rows.length >= fetch)
          throw new StaleProbe
        out = Some(spark.createDataFrame(
          java.util.Arrays.asList(uniq: _*), df.schema))
      } catch {
        case t: Throwable
            if attempt < maxAttempts &&
              (t.isInstanceOf[StaleProbe] || retryableProbeFailure(t)) =>
          if (attempt == 1 && !t.isInstanceOf[StaleProbe] &&
              !indexEverExisted(spark, indexDir, table))
            throw t
          if (!t.isInstanceOf[StaleProbe])
            sleep(ProbeRetryBackoffMs << (attempt - 1))
          attempt += 1
      }
    }
    out.get
  }

  /** True when the index dir plausibly IS an index: either the
    * centroids table or the data table directory exists. A routine
    * maintenance window can hide ONE of them transiently (centroid
    * overwrite deletes-then-writes; an applyDeletes can drop the last
    * cell dir) but never both — so both absent on a probe's FIRST
    * failure means a wrong path, which must fail fast rather than
    * burn the retry backoff budget. */
  private def indexEverExisted(spark: SparkSession, indexDir: String,
      table: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/centroids")) ||
      fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/$table"))
  }

  /** The LAZY probe plan from an already-resolved centroid view — the
    * plan-inspection seam (IvfIndexSpec asserts its partition pruning)
    * and the single-attempt body [[query]] retries. `orphans` = cell
    * dirs the centroid view does NOT list (a rebalance in flight or a
    * crashed one's torn state): they are ALWAYS scanned — the rows a
    * mid-rebalance already moved out of their ranked parent cell live
    * there, and skipping them would silently serve a top-k without
    * them for the whole (possibly seconds-long) window until the
    * centroid rewrite lands. Bounded by in-flight/crashed splits, so
    * the pruning claim stands: ranked cells stay ≤ nprobe. */
  private[graft] def queryPlanFrom(spark: SparkSession, indexDir: String,
      centroids: Array[(Int, Array[Double])], query: Array[Double],
      topK: Int, nprobe: Int, orphans: Seq[Int] = Seq.empty): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val probes = (rankedCells(centroids, query, nprobe) ++ orphans).distinct
    // ledger: one executed attempt over these cells — the maintenance
    // gates price the backlog drain and the worst-cell split against
    // this actual traffic (ProbeLedger's scaladoc has the loss mode)
    ProbeLedger.record(spark, indexDir, probes)
    val qnrm = math.sqrt(query.map(x => x * x).sum)
    val qe = array(query.map(lit): _*)
    minusTombstones(spark.read.parquet(s"$indexDir/vectors")
      .filter(col("cell").isin(probes: _*)), // partition pruning = the lookup
      tombstonesOf(spark, indexDir))
      .withColumn("qe", qe)
      .withColumn("cosine",
        expr("dot_product(e, qe)") / (col("nrm") * lit(qnrm)))
      .select("vec_id", "label", "cell", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(topK)
  }

  /** Parse cell ids out of a [[cellDirs]] listing (already filtered to
    * well-formed `cell=<int>` names) and return the ones the centroid
    * view does not know — the always-scanned orphan set. */
  private[graft] def orphanCells(dirs: Seq[String],
      centroids: Array[(Int, Array[Double])]): Seq[Int] = {
    val known = centroids.map(_._1).toSet
    dirs.map(_.stripPrefix("cell=").toInt).filterNot(known).sorted
  }

  /** One-shot lazy plan (current centroid view + orphan dirs, no
    * retry) — for plan audits; serving goes through [[query]]. */
  private[graft] def queryPlan(spark: SparkSession, indexDir: String,
      query: Array[Double], topK: Int = 10, nprobe: Int = 4): DataFrame = {
    val cents = readCentroids(spark, indexDir)
    queryPlanFrom(spark, indexDir, cents, query, topK, nprobe,
      orphanCells(cellDirs(spark, indexDir, "vectors"), cents))
  }

  /** Top-k by exact cosine among the nprobe nearest cells of `query`,
    * EAGER under the probe-retry policy (see [[ProbeRetryAttempts]]):
    * survives a concurrent rebalance/applyDeletes partition overwrite
    * by re-resolving centroids and re-planning, and validates that
    * NEITHER the centroid view NOR the cell-partition layout changed
    * under the scan ([[eagerProbe]]'s witness pair — a stale attempt
    * is served only when retries exhaust; every row is still a true
    * vector, the documented bound). Returns a local top-k frame. */
  def query(spark: SparkSession, indexDir: String, query: Array[Double],
      topK: Int = 10, nprobe: Int = 4): DataFrame =
    queryImpl(spark, indexDir, query, topK, nprobe)

  /** [[query]] with the spec seams exposed: `afterPin` fires between
    * the centroid read and the vectors scan (inject a rebalance or an
    * applyDeletes there), `sleep` absorbs the backoff. */
  private[graft] def queryImpl(spark: SparkSession, indexDir: String,
      query: Array[Double], topK: Int = 10, nprobe: Int = 4,
      afterPin: Int => Unit = _ => (),
      maxAttempts: Int = ProbeRetryAttempts,
      sleep: Long => Unit = Thread.sleep): DataFrame =
    eagerProbe(spark, indexDir, "vectors", topK, afterPin, maxAttempts,
      sleep)((c1, orphans, fetch) =>
      queryPlanFrom(spark, indexDir, c1, query, fetch, nprobe, orphans))

  /** Persist the per-(cell, label) population map as `label_stats/` —
    * the forecast [[queryFiltered]] sizes its over-fetch from (q272's
    * selectivity audit materialized beside the index it audits). One
    * map-combinable groupBy-count scan, k × |labels| rows out (tiny —
    * coalesce(1)); refresh it after bulk maintenance the way a
    * deployment refreshes any stats table. Staleness is bounded-cost
    * by construction: the stats feed a fetch-size FORECAST, never the
    * answer — a stale row mis-sizes K′ (shorter or longer post-filter
    * list), it cannot serve a wrong vector. */
  def writeLabelStats(spark: SparkSession, indexDir: String): Unit =
    writeStatsOf(spark, indexDir, "vectors")

  private[operators] def writeStatsOf(spark: SparkSession, indexDir: String,
      table: String): Unit =
   MaintenanceLock.withLock(spark, indexDir) {
    spark.read.parquet(s"$indexDir/$table")
      .groupBy("cell", "label").agg(count(lit(1)).as("n"))
      .localCheckpoint()
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/label_stats")
  }

  /** Re-derive `label_stats/` after a mutation that moved or removed
    * rows — but only when the deployment opted into the stats table
    * in the first place ([[writeLabelStats]]); an index that never
    * serves filtered probes pays nothing. Called by
    * rebalance/applyDeletes on both lifecycles so the forecast tracks
    * the cell layout instead of going stale at every split (the
    * [[filteredFetch]] staleness fallback still covers the window
    * between the move and this refresh — and a crash between them:
    * the next maintenance pass re-runs the refresh). */
  private[operators] def refreshStatsIfPresent(spark: SparkSession,
      indexDir: String, table: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/label_stats")))
      writeStatsOf(spark, indexDir, table)
  }

  /** Fallback over-fetch multiplier when no `label_stats/` table
    * exists: K′ = topK × 8 — a documented default for the un-audited
    * case, NOT a tuned constant (the whole point of
    * [[writeLabelStats]] is to replace it with the per-predicate
    * number read from data). */
  private[graft] val DefaultFilteredOverfetch = 8

  /** Signals that the stats table forecasts ZERO matching rows in the
    * probed cells — no over-fetch rescues this predicate (q272's NULL
    * `overfetch_ppm` row): surfacing loudly beats silently returning
    * an empty/short answer a caller would mistake for "no neighbors
    * exist". Remedies, in order: widen `nprobe` (the matching rows
    * live in un-probed cells), or partition the index by the filter
    * column. */
  final class NoMatchInProbedCells(msg: String)
    extends IllegalStateException(msg)

  /** Size a filtered probe's candidate fetch from the stats table:
    * K′ = ⌈topK × scanned / matching⌉ over the probed cells (the
    * uniform-mixing expectation — exactly q272's `overfetch_ppm`
    * applied to topK) plus a two-sigma hypergeometric margin
    * ⌈2·√K′⌉, clamped to the probed population (a K′ that reaches
    * every scanned row degrades to the exact filtered answer within
    * the probed cells — over-forecasting is graceful by
    * construction). Stats read is lock-free with one retry (a
    * concurrent [[writeLabelStats]] overwrite mid-read). */
  private[operators] def filteredFetch(spark: SparkSession,
      indexDir: String, probes: Seq[Int], topK: Int,
      predicate: org.apache.spark.sql.Column): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/label_stats")
    if (!fs.exists(p))
      return if (topK > Int.MaxValue / DefaultFilteredOverfetch) topK
      else topK * DefaultFilteredOverfetch
    def once(): (Long, Long, Long) = {
      val r = spark.read.parquet(p.toString)
        .filter(col("cell").isin(probes: _*))
        .agg(coalesce(sum(col("n")), lit(0L)).as("scanned"),
          coalesce(sum(when(predicate, col("n")).otherwise(0L)), lit(0L))
            .as("matching"),
          countDistinct(col("cell")).as("known_cells"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (scanned, matching, knownCells) =
      try once()
      catch { case t: Throwable if retryableProbeFailure(t) => once() }
    // A probed cell the stats table does not know is STALENESS (a
    // rebalance renumbered cells since the last writeLabelStats), not
    // evidence about the label — a zero-match verdict is only honest
    // when EVERY probed cell was actually audited. Otherwise fall
    // back to the documented default until the stats refresh: a
    // spurious NoMatchInProbedCells after every split would fail
    // healthy queries, the exact opposite of the loud-error's intent.
    if (matching <= 0L && knownCells < probes.distinct.size)
      return if (topK > Int.MaxValue / DefaultFilteredOverfetch) topK
      else topK * DefaultFilteredOverfetch
    if (matching <= 0L)
      throw new NoMatchInProbedCells(
        s"filtered probe over $indexDir: stats forecast zero matching " +
          s"rows in probed cells $probes — no over-fetch rescues this " +
          "predicate; widen nprobe or partition the index by the filter " +
          "column")
    val mean = (BigInt(topK) * BigInt(scanned) + BigInt(matching) - 1) /
      BigInt(matching)
    val sized = mean + BigInt(math.ceil(2.0 * math.sqrt(mean.toDouble)).toLong)
    sized.min(BigInt(scanned)).max(BigInt(topK))
      .min(BigInt(Int.MaxValue / 2 - DupHeadroom)).toInt
  }

  /** Metadata-filtered top-k — the serving operator q222 measures the
    * absence of: exact cosine top-`topK` among the probed cells'
    * vectors SATISFYING `predicate`. Architecture: the UNFILTERED
    * candidate stage runs through the shared [[eagerProbe]] loop
    * (every maintenance-survival guarantee — witness pair, dedupe,
    * retry — carries over verbatim), fetching K′ candidates sized
    * from the `label_stats/` forecast ([[filteredFetch]]; q272's
    * per-predicate `overfetch_ppm` read from data, with a documented
    * default when no stats exist), then the predicate post-filters
    * the ranked candidates and the top `topK` survivors serve. Rank
    * preservation makes the post-filter EXACT within the candidate
    * list: filtering cannot reorder cosines, so the survivors are
    * precisely the best-ranked filtered rows among the K′.
    *
    * Why post-filter rather than pushing the predicate into the
    * pruned scan: the filter column here happens to live in the index
    * rows, but the production shape filters on metadata the index
    * does NOT store (license, source, date) — resolved against the
    * candidate ids at rerank time. The post-filter form is the one
    * that generalizes; the over-fetch forecast is exactly what makes
    * it affordable. A predicate must reference only candidate columns
    * also present in the stats table (`label`) for the forecast to
    * price it; `matching = 0` in the probed cells fails loudly
    * ([[NoMatchInProbedCells]]) instead of serving short.
    *
    * A K′ that the forecast sizes at (or our clamp caps to) the whole
    * probed population degrades to the exact filtered answer within
    * the probed cells. Residual approximation = cell pruning itself,
    * same as [[query]]: matching rows in un-probed cells (label
    * clustering — q272's `sel_ppm` vs `probe_sel_ppm` gap) need a
    * wider `nprobe`. */
  def queryFiltered(spark: SparkSession, indexDir: String,
      query: Array[Double], topK: Int,
      predicate: org.apache.spark.sql.Column, nprobe: Int = 4): DataFrame =
    queryFilteredImpl(spark, indexDir, query, topK, predicate, nprobe)

  /** [[queryFiltered]] with the spec seams exposed ([[queryImpl]]'s
    * shape). The forecast is priced ONCE against the entry centroid
    * view; a retried attempt re-plans the scan under the fresh view
    * but keeps the K′ budget (the forecast is a snapshot by design —
    * second-order drift, bounded by one maintenance window).
    *
    * ESCALATION: the forecast is an expectation — on a label that
    * CLUSTERS (the q272 sel-vs-probe_sel gap, measured live: q276
    * reads 95–100% first-try recall) the matching rows sit deeper in
    * the unfiltered ranking than uniform mixing predicts and the
    * post-filter comes up short. The remedy is the production one:
    * double K′ and re-probe, bounded — the loop ends the moment the
    * top-`topK` survivors exist OR the candidate fetch comes back
    * UNDER its own limit (the probed population is exhausted, so the
    * answer IS the exact filtered truth within the probed cells; only
    * un-probed cells can hold more — that residual is `nprobe`'s,
    * same as the unfiltered operator). Worst-case total work ≤ 2× the
    * final probe ≤ 2× a full scan of the probed cells — exactly what
    * a pushed-filter scan of those cells would pay. */
  private[graft] def queryFilteredImpl(spark: SparkSession,
      indexDir: String, query: Array[Double], topK: Int,
      predicate: org.apache.spark.sql.Column, nprobe: Int = 4,
      afterPin: Int => Unit = _ => (),
      maxAttempts: Int = ProbeRetryAttempts,
      sleep: Long => Unit = Thread.sleep): DataFrame = {
    val entryView = readCentroids(spark, indexDir)
    val probes = rankedCells(entryView, query, nprobe)
    var k = filteredFetch(spark, indexDir, probes, topK, predicate)
    var out: Option[DataFrame] = None
    while (out.isEmpty) {
      val cand = eagerProbe(spark, indexDir, "vectors", k, afterPin,
        maxAttempts, sleep)((c1, orphans, fetch) =>
        queryPlanFrom(spark, indexDir, c1, query, fetch, nprobe, orphans))
      val kept = cand.filter(predicate)
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(topK)
      if (kept.count() >= topK || cand.count() < k ||
          k >= Int.MaxValue / 2 - DupHeadroom)
        out = Some(kept)
      else
        k = math.min(k.toLong * 2L, (Int.MaxValue / 2 - DupHeadroom).toLong)
          .toInt
    }
    out.get
  }

  /** The nprobe nearest cells to `query` under a centroid view — the
    * ranking [[queryPlanFrom]] scans and [[filteredFetch]] prices. */
  private[graft] def rankedCells(centroids: Array[(Int, Array[Double])],
      query: Array[Double], nprobe: Int): Seq[Int] =
    centroids.map { case (cell, c) =>
      val d2 = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (cell, d2)
    }.sortBy(_._2).take(nprobe).map(_._1).toSeq

  /** Right-to-be-forgotten delete — [[LshBandIndex.delete]]'s tombstone
    * discipline applied to the vector index: O(batch) append of the ids
    * to `tombstones/`, [[query]] anti-joins them out AFTER the
    * partition-pruned scan (broadcast-scale set, so the lookup shape is
    * unchanged), and [[applyDeletes]] removes them physically. A
    * forgotten vector can never be served, even before the physical
    * apply. Same id-append-only constraint as the LSH twin. */
  def delete(spark: SparkSession, vecIds: Seq[Long], indexDir: String): Unit =
   MaintenanceLock.withLock(spark, indexDir) {
    import spark.implicits._
    vecIds.toDF("vec_id").repartition(1)
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }

  private def tombstonesOf(spark: SparkSession, indexDir: String)
      : Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  private def minusTombstones(df: DataFrame, ts: Option[DataFrame]): DataFrame =
    ts.map(t => df.join(broadcast(t.select("vec_id")), Seq("vec_id"),
      "left_anti")).getOrElse(df)

  /** Physically remove tombstoned vectors, touching ONLY the cell
    * partitions that contain them (the partition-pruned twin of
    * [[LshBandIndex.compact]]'s full rewrite — the vectors table is
    * partitioned by cell, so a delete batch rewrites a handful of
    * directories, not the corpus). Cells left EMPTY by the delete are
    * removed with a directory delete — dynamic partition overwrite
    * only replaces partitions PRESENT in the written data (the
    * rebalance lesson), so an emptied cell would otherwise keep its
    * old files alive. The tombstone set is cleared only after all
    * rewrites; a crash anywhere earlier leaves it in place and the
    * rerun reapplies harmlessly (idempotent — the spec pins it).
    * Returns the number of cells rewritten or removed. */
  def applyDeletes(spark: SparkSession, indexDir: String): Int =
    applyDeletesImpl(spark, indexDir, _ => ())

  /** [[applyDeletes]] with [[RetiredIds.retireImpl]]'s spec seams
    * exposed (crash injection inside the retirement commit; a forced
    * compaction threshold) — the fuzz suites prove no torn retirement
    * state lets a replayed pre-delete batch resurrect a vector. */
  private[graft] def applyDeletesImpl(spark: SparkSession, indexDir: String,
      crashPoint: String => Unit,
      compactThreshold: Int = RetiredIds.CompactThreshold): Int =
   MaintenanceLock.withLock(spark, indexDir) {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    tombstonesOf(spark, indexDir) match {
      case None => 0
      case Some(ts0) =>
        val ts = ts0.select("vec_id")
        // retire the ids FIRST: once rows are physically gone only the
        // retirement memory stops a replayed append from resurrecting
        // them (ids are append-only across batches — the lifecycle
        // convention — so retiring forever is correct, never a false
        // rejection). A crash below leaves tombstones in place; the
        // rerun re-retires the same ids (dup rows, collapsed at the
        // next compaction) and reapplies. The set lives behind the
        // manifest commit layer ([[RetiredIds]]): atomic at every
        // instant, compacted-on-append past the segment threshold.
        RetiredIds.retireImpl(spark, indexDir, ts, crashPoint,
          compactThreshold)
        val vecs = spark.read.parquet(s"$indexDir/vectors")
        val touched = vecs.join(broadcast(ts), "vec_id")
          .groupBy("cell").agg(count(lit(1)).as("n_del"))
          .collect().map(_.getInt(0)).sorted.toSeq
        if (touched.nonEmpty) {
          val survivors = vecs.filter(col("cell").isin(touched: _*))
            .join(broadcast(ts), Seq("vec_id"), "left_anti")
            .select("vec_id", "label", "e", "nrm", "cell")
            .localCheckpoint()
          val liveCells = survivors.select("cell").distinct()
            .collect().map(_.getInt(0)).toSet
          if (liveCells.nonEmpty) {
            survivors.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("cell").parquet(s"$indexDir/vectors")
          }
          survivors.unpersist()
          for (c <- touched if !liveCells.contains(c)) {
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$indexDir/vectors/cell=$c"), true)
            ()
          }
        }
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/tombstones"), true)
        if (touched.nonEmpty)
          refreshStatsIfPresent(spark, indexDir, "vectors")
        // the backlog gate amortizes against probes SINCE the last
        // apply — re-arm it here so sweeps outside the maintainer
        // (a direct GDPR applyDeletes) reset the meter too
        ProbeLedger.markDrained(spark, indexDir)
        touched.length
    }
  }

  /** Nearest-centroid assignment as a pure scan expression — the
    * incremental side of the lifecycle (assign tonight's batch to the
    * EXISTING index, no refit). Squared L2 decomposes as
    * |e|² − 2·e·c + |c|², and |e|² is candidate-invariant, so the
    * argmin needs only (|c|² − 2·e·c) per centroid; the k centroids are
    * inlined as literals (k-bounded, the same discipline as [[query]]'s
    * driver-side probe pick), giving one scan with zero shuffles and no
    * ML stage. Ties break to the LOWER cell id via (score, cell) struct
    * ordering — deterministic regardless of centroid order. Requires
    * `dot_product` (VectorFunctions) on the session. */
  def assignToCentroids(vecs: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val scored = centroids.sortBy(_._1).map { case (cell, c) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * call_function("dot_product",
          col("e"), array(c.toSeq.map(lit): _*))).as("score"),
        lit(cell).as("cell"))
    }
    vecs.withColumn("cell", array_min(array(scored: _*)).getField("cell"))
  }

  /** Append NEW vectors to a persisted index: broadcast-free argmin
    * assignment against the stored centroids, then an append write
    * under the cell partitions — the existing vectors are never read or
    * rewritten (q127's incremental-dedup shape, applied to ANN).
    *
    * Replay guard ([[PrevalenceIndex.append]]'s doc-granular
    * convention): vectors whose vec_id the index already holds are
    * anti-joined out first, so a re-sent batch (streaming replay, a
    * retried ingest job) cannot double-serve a vector in every later
    * top-k. The guard reads ONLY the index's vec_id column. */
  def appendVectors(spark: SparkSession, indexDir: String,
      newVecs: DataFrame): Unit =
   MaintenanceLock.withLock(spark, indexDir) {
    graft.functions.VectorFunctions.register(spark)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    // replay guard = stored ids ∪ RETIRED ids: stored alone re-admits a
    // batch whose vector was forgotten (delete + applyDeletes) between
    // the original send and the replay — GDPR's "never served again"
    // must survive at-least-once delivery
    val known = spark.read.parquet(s"$indexDir/vectors")
      .select("vec_id").distinct()
    val guard = RetiredIds.read(spark, indexDir)
      .map(r => known.unionByName(r.select("vec_id"))).getOrElse(known)
    // align to the STORED schema before writing: parquet append with a
    // mismatched column type (e.g. string label into an int index)
    // corrupts the table for every later reader — ANSI cast fails loudly
    // here instead, at append time
    val stored = spark.read.parquet(s"$indexDir/vectors").schema
    val aligned = stored.fields.filterNot(_.name == "cell")
      .map(f => col(f.name).cast(f.dataType).as(f.name))
    // materialize the guarded batch BEFORE the append write: the anti-
    // join reads vec_id from the very directory the write appends to,
    // and a lazy plan re-listing those files mid-write (AQE re-plan,
    // stage retry) could see its own half-written output — the
    // admitImpl newSetIds discipline (write jobs never read the dir
    // they write)
    val toAdd = assignToCentroids(
        newVecs.join(guard, Seq("vec_id"), "left_anti"), centroids)
      .select(aligned :+ col("cell"): _*)
      .localCheckpoint()
    toAdd.write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/vectors")
    toAdd.unpersist()
    ()
  }

  /** Shared normalization — Similarity.normed itself, so the index
    * builder inherits its loud raise_error on a dimension mismatch
    * (a silent filter here would drop corrupt vectors from the index
    * with no error anywhere). */
  private def Tables_normed(s: SparkSession, d: String): DataFrame =
    Similarity.normed(s, d)

  /** Per-cell index health: population and mean squared displacement of
    * member vectors from their STORED centroid. [[appendVectors]]
    * assigns without refit forever; under skewed appends a cell's
    * population and displacement both grow while its centroid stays
    * where the original fit left it — recall then decays because nprobe
    * cells no longer cover the query's true neighbors. This audit is
    * the detection side: one scan of the index (k-bounded centroid
    * literals, the [[assignToCentroids]] discipline; |e−c|² =
    * nrm² − 2·e·c + |c|²), k rows out. Feed it a threshold to decide
    * when [[rebalance]] is due. */
  def driftAudit(spark: SparkSession, indexDir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    val whens = cents.sortBy(_._1).map { case (cell, c) =>
      val c2 = c.map(x => x * x).sum
      when(col("cell") === cell,
        col("nrm") * col("nrm") - lit(2.0) * call_function("dot_product",
          col("e"), array(c.toSeq.map(lit): _*)) + lit(c2))
    }
    spark.read.parquet(s"$indexDir/vectors")
      .withColumn("d2", coalesce(whens: _*))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), avg("d2").as("mean_disp2"))
      .orderBy("cell")
  }

  /** ANN serving-health audit — the vector twin of
    * [[IndexManifest.freshness]]: everything a fleet dashboard (or the
    * [[graft.streaming.AnnMaintenance]] rebalance decision) needs to
    * know about a serving index, in ONE metadata-scale row per index.
    * One k-bounded groupBy-count scan of the vector table plus three
    * tiny reads (centroids, tombstones, retired) — no float math, no
    * per-vector output:
    *
    *   - `n_cells`/`n_vectors`/`max_cell`/`mean_cell` — population map;
    *   - `hot_factor` — max/mean cell population, [[driftAudit]]'s
    *     trigger signal collapsed to the number [[rebalance]]'s
    *     `factor` is compared against;
    *   - `n_hot_cells` — cells a `rebalance(factor)` pass would split;
    *   - `orphan_cells` — vector dirs the centroids table doesn't
    *     list (a crashed rebalance's torn state; the next rebalance
    *     adopts them);
    *   - `tombstone_backlog` — ids logically deleted but not yet
    *     physically applied (each one rides every probe's anti-join:
    *     a large backlog says run [[applyDeletes]]);
    *   - `retired_ids` — DISTINCT lifetime forgotten ids (the append
    *     guard's permanent anti-join side — monotone, bounded by
    *     deletes, stable across [[RetiredIds]] compactions);
    *   - `probe_rows_mean` / `probe_rows_worst` — forecast rows
    *     scanned by an `nprobe`-cell probe: nprobe × mean population,
    *     and the sum of the nprobe LARGEST cells (the skewed-query
    *     worst case — when worst ≫ mean the index needs a rebalance
    *     even if no single cell trips `factor`). */
  def servingHealth(spark: SparkSession, indexDir: String,
      nprobe: Int = 4, factor: Double = 2.0): DataFrame =
    healthOf(spark, indexDir, "vectors", nprobe, factor)

  private[operators] def healthOf(spark: SparkSession, indexDir: String,
      table: String, nprobe: Int, factor: Double): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // lock-free dashboard read racing an applyDeletes that clears the
    // dir between the exists check and the scan: one retry re-resolves
    // (the RetiredIds.count discipline)
    def countOf(sub: String): Long = {
      def once(): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
        if (fs.exists(p)) spark.read.parquet(p.toString).count() else 0L
      }
      try once()
      catch { case t: Throwable if retryableProbeFailure(t) => once() }
    }
    val counts = spark.read.parquet(s"$indexDir/$table")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val known = readCentroids(spark, indexDir).map(_._1).toSet
    val nVec = counts.map(_._2).sum
    val maxCell = if (counts.isEmpty) 0L else counts.map(_._2).max
    val meanCell = if (counts.isEmpty) 0.0 else nVec.toDouble / counts.length
    // the nprobe LARGEST cells — `probe_rows_worst` is their population
    // sum; the ids themselves feed the traffic gate (actual probe
    // touches on exactly these cells = the rebalance-overdue signal)
    val worstCells = counts.sortBy { case (c, n) => (-n, c) }.take(nprobe)
    val worst = worstCells.map(_._2).sum
    val spark2 = spark
    import spark2.implicits._
    Seq((counts.length, nVec, maxCell, meanCell,
      if (meanCell > 0) maxCell / meanCell else 0.0,
      counts.count(_._2 > factor * meanCell).toLong,
      counts.map(_._1).count(c => !known.contains(c)).toLong,
      countOf("tombstones"), RetiredIds.count(spark, indexDir),
      nprobe * meanCell, worst, worstCells.map(_._1).toSeq))
      .toDF("n_cells", "n_vectors", "max_cell", "mean_cell", "hot_factor",
        "n_hot_cells", "orphan_cells", "tombstone_backlog", "retired_ids",
        "probe_rows_mean", "probe_rows_worst", "worst_cells")
  }

  /** Maintenance: re-split every cell whose population exceeds
    * `factor` × the mean cell population — plus, with `topN` > 0, the
    * N most populous cells regardless of factor (the diffuse-drift
    * mode [[graft.streaming.AnnMaintenance]]'s health gate uses when
    * `probe_rows_worst ≫ probe_rows_mean` but no single cell trips the
    * factor). Each hot cell is re-fit
    * LOCALLY (k=2 KMeans over just its members — work bounded by the
    * hot cell, not the index), its rows rewritten under the original
    * id + one freshly allocated id via DYNAMIC partition overwrite (the
    * untouched cells' files are never read or rewritten — same
    * touch-only-what-changed discipline as [[appendVectors]]), and the
    * centroids table (k+splits rows, tiny) rewritten last so a reader
    * racing the rebalance still resolves every cell directory. A
    * degenerate hot cell (all members identical — the pure clone-burst)
    * cannot be split and is kept whole: see the in-loop comment for why
    * writing anyway would silently duplicate the cell. Returns the
    * number of cells actually split.
    *
    * Torn-state semantics and recovery: a crash between a split's
    * vector-partition write and the final centroid rewrite leaves
    * ORPHAN cells — directories under vectors/ whose ids the stale
    * centroids table does not list. [[query]] scans them
    * UNCONDITIONALLY alongside its ranked probes ([[orphanCells]] —
    * the moved rows live there, and for the whole window until the
    * centroid rewrite or the next rebalance's adoption they are
    * reachable no other way; serving therefore stays COMPLETE through
    * a mid-flight or crashed rebalance, which the live-prober and
    * seam-injection specs pin), and [[driftAudit]] surfaces them as
    * rows with a null mean_disp2. The next rebalance run self-heals:
    * it ADOPTS every
    * orphan cell first (centroid := the member mean — what the lost
    * k=2 sub-center was approximating), and it allocates fresh ids
    * from max over BOTH tables, so a re-run can never hand an orphan's
    * id to an unrelated split and silently merge two vector sets. */
  def rebalance(spark: SparkSession, indexDir: String,
      factor: Double = 2.0, seed: Long = 1L, topN: Int = 0): Int =
   MaintenanceLock.withLock(spark, indexDir) {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.VectorFunctions.register(spark)
    val vecs = spark.read.parquet(s"$indexDir/vectors")
    val counts = vecs.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (counts.length < 2) return 0
    val meanN = counts.map(_._2).sum.toDouble / counts.length
    // topN > 0 = the DIFFUSE-drift split mode: also split the N most
    // populous cells (ties to the lower id) even though none trips the
    // factor — the state where every nprobe-worst cell sits just under
    // factor × mean and the probe-cost worst case stays ~factor× the
    // mean forever because nothing ever fires. One bounded pass from
    // the health gate (never the convergence loop: the N largest
    // always exist, a fixpoint loop would split forever).
    val largest: Seq[Int] =
      if (topN <= 0) Seq.empty
      else counts.sortBy { case (c, n) => (-n, c) }.take(topN)
        .map(_._1).toSeq
    val hot = (counts.filter(_._2 > factor * meanN).map(_._1) ++ largest)
      .distinct.sorted.toSeq
    val stored = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // adopt orphan cells from a previously crashed rebalance (vector
    // dirs the centroids table doesn't know) — see the scaladoc; the
    // mean is exact and k-bounded (orphans × dim rows out)
    val known = stored.map(_._1).toSet
    val orphans = counts.map(_._1).filterNot(known).sorted
    val adopted: Seq[(Int, Array[Double])] =
      if (orphans.isEmpty) Seq.empty
      else vecs.filter(col("cell").isin(orphans: _*))
        .select(col("cell"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy("cell", "i").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    val centroids = stored ++ adopted
    if (hot.isEmpty && orphans.isEmpty) return 0
    // fresh ids come from max over BOTH tables: after a crash the
    // vectors side can be ahead of the centroids side, and reusing one
    // of ITS ids would merge unrelated vectors into one cell
    var nextId = math.max(centroids.map(_._1).max, counts.map(_._1).max) + 1
    var splits = 0
    val kept = scala.collection.mutable.ArrayBuffer(
      centroids.filterNot(c => hot.contains(c._1)).toSeq: _*)
    for (cellId <- hot) {
      val members = vecs.filter(col("cell") === cellId)
        .select("vec_id", "label", "e", "nrm")
        .withColumn("fv", array_to_vector(col("e"))).cache()
      try {
        val km = new KMeans().setK(2).setSeed(seed)
          .setFeaturesCol("fv").setPredictionCol("sub").fit(members)
        val subCents = km.clusterCenters.map(_.toArray)
        // Degenerate hot cells — all members (near-)identical, EXACTLY
        // the clone-burst shape that triggers a rebalance — can yield
        // one center (MLlib returns < k for < k distinct points) or an
        // empty sub-cluster. Splitting is then impossible AND writing
        // would corrupt the index: dynamic partition overwrite only
        // replaces partitions PRESENT in the written data, so an empty
        // sub-0 would leave the old cellId files alive alongside the
        // rewrite under the new id — every vector in the cell silently
        // duplicated. Probe the assignment (tiny agg over the cached
        // members) and keep the cell whole unless BOTH halves are
        // non-empty.
        val subCounts = km.transform(members).groupBy("sub").count()
          .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
        if (subCents.length < 2 ||
            subCounts.getOrElse(0, 0L) == 0L || subCounts.getOrElse(1, 0L) == 0L) {
          kept += ((cellId, centroids.find(_._1 == cellId).get._2))
        } else {
          val subIds = Array(cellId, nextId)
          nextId += 1
          // localCheckpoint BEFORE the write: the target partition is the
          // very one `members` reads — severing lineage materializes the
          // assignment so the overwrite neither trips the
          // read-path-conflict check nor races its own source files
          val assigned = km.transform(members)
            .withColumn("cell",
              when(col("sub") === 0, lit(subIds(0))).otherwise(lit(subIds(1))))
            .select("vec_id", "label", "e", "nrm", "cell")
            .localCheckpoint()
          assigned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic") // writer-scoped, not session
            .partitionBy("cell").parquet(s"$indexDir/vectors")
          assigned.unpersist()
          kept += ((subIds(0), subCents(0)))
          kept += ((subIds(1), subCents(1)))
          splits += 1
        }
      } finally { members.unpersist(); () }
    }
    // a NO-PROGRESS pass (every hot cell kept whole, nothing adopted)
    // writes NOTHING: the centroid rewrite would be a logical no-op,
    // but its physical overwrite would churn files and force every
    // in-flight probe through a spurious StaleProbe retry — the
    // degenerate-cell trigger's honest cost must stay one k=2 probe
    // fit per largest cell, zero writes (AnnMaintenanceSpec pins it)
    if (splits > 0 || adopted.nonEmpty) {
      val spark2 = spark
      import spark2.implicits._
      kept.sortBy(_._1)
        .map { case (c, arr) => (c, arr.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$indexDir/centroids")
      // splits renumber cells — keep the filtered-probe forecast
      // aligned with the new layout (no-op unless the table exists)
      refreshStatsIfPresent(spark, indexDir, "vectors")
    }
    // a pass ran (split or kept-whole alike): the traffic gate re-arms
    // from fresh touches rather than re-firing on stale ones forever
    ProbeLedger.markRebalanced(spark, indexDir)
    splits
  }

  /** [[rebalance]] to a fixpoint: a cell at 10× the mean splits into
    * two ~5× halves — still hot — so one maintenance pass is rarely
    * enough after a heavy append. Loops until a pass splits nothing
    * (degenerate all-identical cells are kept whole and cannot loop
    * forever) or `maxRounds` caps runaway pathologies. Returns the
    * total number of splits performed. */
  def rebalanceToConvergence(spark: SparkSession, indexDir: String,
      factor: Double = 2.0, seed: Long = 1L, maxRounds: Int = 8): Int =
   MaintenanceLock.withLock(spark, indexDir) {
    var total = 0
    var rounds = 0
    var again = true
    while (again && rounds < maxRounds) {
      val n = rebalance(spark, indexDir, factor, seed)
      total += n
      again = n > 0
      rounds += 1
    }
    total
  }
}

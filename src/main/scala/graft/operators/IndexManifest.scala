package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** One-file commit layer over a persisted index's tables — the public
  * Delta/Iceberg manifest idea, self-contained (no new dependency):
  * an index directory holds immutable SEGMENT dirs of parquet files
  * and a `_manifest/` log whose HIGHEST version file is the single
  * source of truth for (a) which segments are live in each logical
  * table and (b) the last applied maintenance op id. Readers resolve
  * every table through the current manifest; writers stage new
  * segments (invisible until referenced) and publish them with ONE
  * atomic rename of the next manifest version.
  *
  * This closes the two durability gaps the pre-manifest lifecycles
  * documented (LshBandIndex round-13 scaladoc):
  *
  *  1. A crash INSIDE a parquet append job can no longer leave a doc
  *     with a subset of its rows visible — un-manifested segment files
  *     are simply never read (no more partial-band-rows recall decay).
  *  2. A reader racing a compact can no longer observe a missing-table
  *     window — the compacted segment replaces the old list in one
  *     rename; both file sets exist on disk until [[vacuum]], so a
  *     reader holding EITHER manifest version resolves a complete
  *     table. Vacuum (the only destructive step) is separable, so a
  *     deployment with long-running readers can delay it past its
  *     longest query.
  *
  * It also makes MULTI-table mutations atomic: one manifest version
  * carries all tables of the index, so a compact's
  * postings-rewrite + stats-refresh + tombstone-clear land as a single
  * visible transition — no crash point between them exists for a
  * probe to observe (the pre-manifest design had a window where
  * recomputed stats coexisted with live tombstones and the probe
  * double-subtracted their mass).
  *
  * Layout:
  * {{{
  *   <indexDir>/_manifest/v<020d>     one text file per committed version
  *   <indexDir>/segs/<table>-<hex>/   immutable parquet segment dirs
  * }}}
  *
  * Manifest text format (UTF-8): line 1 `op=<long>` or `op=-`, then
  * one `<table>\t<segment>` line per live segment. Version files are
  * written to a hidden temp name and renamed into place — rename to a
  * fresh destination is atomic on local FS/HDFS, and a rename that
  * finds the destination taken FAILS, so a lost writer race is
  * detected, never silently merged (single-writer is enforced one
  * level up by [[MaintenanceLock]]).
  */
object IndexManifest {

  /** One committed index state. `tables` maps logical table name to
    * its live segment names (order irrelevant; empty Seq = an empty
    * table, e.g. cleared tombstones). */
  final case class Snapshot(version: Long, opId: Option[Long],
      tables: Map[String, Seq[String]]) {
    def segmentsOf(table: String): Seq[String] =
      tables.getOrElse(table, Seq.empty)
  }

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(indexDir: String) = s"$indexDir/_manifest"

  private def versionName(v: Long): String = f"v$v%020d"

  /** The current snapshot, or None for a directory with no committed
    * manifest (a fresh index root, or a pre-manifest legacy layout). */
  def load(spark: SparkSession, indexDir: String): Option[Snapshot] = {
    val fs = fsOf(spark)
    val md = new Path(manifestDir(indexDir))
    if (!fs.exists(md)) return None
    val versions = fs.listStatus(md).map(_.getPath.getName)
      .filter(n => n.length == 21 && n.startsWith("v") &&
        n.drop(1).forall(_.isDigit))
    if (versions.isEmpty) return None
    parseVersion(spark, indexDir, versions.max)
  }

  /** A SPECIFIC committed version, or None if that version file is no
    * longer retained. With the append paths' one-generation vacuum the
    * PREVIOUS version stays readable until the next mutation — the
    * time-travel window that lets an operator diff an index against
    * its pre-append state when a probe regresses (the public
    * Delta/Iceberg versioned-read idea at retention depth 1; a
    * deployment that defers vacuum gets a deeper window for free). */
  def loadAt(spark: SparkSession, indexDir: String, version: Long)
      : Option[Snapshot] = {
    val fs = fsOf(spark)
    val p = new Path(manifestDir(indexDir), versionName(version))
    if (!fs.exists(p)) None
    else parseVersion(spark, indexDir, versionName(version))
  }

  /** Resolve a table through an explicit (possibly historical)
    * snapshot — None when the snapshot lists no segments for it. */
  def readSnapshot(spark: SparkSession, indexDir: String, snap: Snapshot,
      table: String): Option[DataFrame] = {
    val segs = snap.segmentsOf(table)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(s => s"$indexDir/segs/$s"): _*))
  }

  /** The current snapshot, failing loudly when the index has no
    * committed manifest. THE reader entry point for every multi-table
    * operation: resolve ONE snapshot here, then read each table
    * through [[readSnapshot]]/[[readRequired]] — per-table [[load]]
    * calls would let a mutation commit BETWEEN two resolutions and
    * hand the reader a mixed-version view the writer-side atomicity
    * does not cover (the concrete BM25 case: postings resolved at v1
    * still carry a victim row, a compact commits v2 clearing the
    * tombstones and rewriting stats, and a per-table reader then
    * serves the victim un-anti-joined against v2 stats). */
  def snapshot(spark: SparkSession, indexDir: String): Snapshot =
    load(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"no committed manifest under $indexDir"))

  /** [[readSnapshot]] failing loudly for an always-present table. */
  def readRequired(spark: SparkSession, indexDir: String, snap: Snapshot,
      table: String): DataFrame =
    readSnapshot(spark, indexDir, snap, table).getOrElse(
      throw new IllegalStateException(s"index table '$table' has no " +
        s"segments in manifest v${snap.version} under $indexDir"))

  private def parseVersion(spark: SparkSession, indexDir: String,
      name: String): Option[Snapshot] = {
    val fs = fsOf(spark)
    val in = fs.open(new Path(manifestDir(indexDir), name))
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
    val op = lines.headOption.filter(_.startsWith("op=")).map(_.drop(3))
      .filter(_ != "-").map(_.toLong)
    val tables = lines.drop(1).filter(_.contains("\t"))
      .map { l => val Array(t, s) = l.split("\t", 2); (t, s) }
      .groupBy(_._1).map { case (t, rows) => (t, rows.map(_._2).toSeq) }
    Some(Snapshot(name.drop(1).toLong, op, tables))
  }

  /** Last applied maintenance op id — the exactly-once high-water mark.
    * Rides the manifest, so it swaps atomically with EVERY committed
    * mutation (the RollupStore discipline, index-wide). */
  def appliedOp(spark: SparkSession, indexDir: String): Option[Long] =
    load(spark, indexDir).flatMap(_.opId)

  /** Resolve a table to a DataFrame over exactly its live segment
    * files. Fails loudly on a table with no committed segments — the
    * always-present tables (postings/bands/sets/…) are committed by
    * build(); use [[readOpt]] for optional ones (tombstones). */
  def read(spark: SparkSession, indexDir: String, table: String): DataFrame =
    readOpt(spark, indexDir, table).getOrElse(throw new IllegalStateException(
      s"index table '$table' has no committed segments under $indexDir"))

  /** [[read]] for optional tables: None when the manifest lists no
    * segments (or no manifest exists yet). */
  def readOpt(spark: SparkSession, indexDir: String, table: String)
      : Option[DataFrame] = {
    val segs = load(spark, indexDir).map(_.segmentsOf(table))
      .getOrElse(Seq.empty)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(s => s"$indexDir/segs/$s"): _*))
  }

  /** Stage a new segment for `table`: allocates an immutable segment
    * dir, hands its absolute path to `write`, and returns the segment
    * NAME for a later [[commit]]. The segment stays invisible (and a
    * crash leaves only vacuum-able garbage) until a manifest version
    * references it. */
  def newSegment(spark: SparkSession, indexDir: String, table: String)
      (write: String => Unit): String = {
    val name = s"$table-${java.util.UUID.randomUUID.toString.take(12)}"
    write(s"$indexDir/segs/$name")
    name
  }

  /** Publish a new index state: write the manifest text to a hidden
    * temp file and rename it to the next version — ONE atomic rename,
    * the only instant at which anything becomes visible. `opId` empty
    * preserves the current marker (maintenance must never lose the
    * exactly-once high-water mark). A failed rename means another
    * writer committed the same version — an invariant violation under
    * [[MaintenanceLock]], surfaced loudly. */
  def commit(spark: SparkSession, indexDir: String,
      tables: Map[String, Seq[String]], opId: Option[Long] = None)
      : Snapshot = {
    val fs = fsOf(spark)
    val cur = load(spark, indexDir)
    val next = cur.map(_.version + 1).getOrElse(1L)
    val keep = opId.orElse(cur.flatMap(_.opId))
    val body = (s"op=${keep.fold("-")(_.toString)}" +:
      tables.toSeq.sortBy(_._1).flatMap { case (t, segs) =>
        segs.sorted.map(s => s"$t\t$s")
      }).mkString("\n")
    val md = new Path(manifestDir(indexDir))
    if (!fs.exists(md)) { fs.mkdirs(md); () }
    val tmp = new Path(md,
      s".tmp-${java.util.UUID.randomUUID.toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(md, versionName(next))
    // lost-writer detection must not rely on rename-fails-if-dst-exists:
    // POSIX rename REPLACES an existing destination, and Hadoop's local
    // FS passes that through — an explicit existence check (plus the
    // rename result for FSs that do fail) catches a racing commit
    // either way. Under the MaintenanceLock this is a broken-invariant
    // assertion, not a synchronization mechanism.
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"concurrent manifest commit detected at $dst — " +
          "maintenance requires the MaintenanceLock")
    }
    spark.catalog.refreshByPath(indexDir)
    Snapshot(next, keep, tables)
  }

  /** Re-commit the CURRENT table state with a new op id — the cheap
    * marker stamp for a maintenance op that changed nothing (e.g. a
    * streaming batch whose docs were all rejected still needs its
    * batch id recorded, or every replay re-pays the full audit). */
  def stampOp(spark: SparkSession, indexDir: String, opId: Long): Unit = {
    val tables = load(spark, indexDir).map(_.tables).getOrElse(Map.empty)
    commit(spark, indexDir, tables, Some(opId))
    ()
  }

  /** Delete what no retained manifest references: orphan segments
    * (from crashed writers) and superseded manifest versions. The only
    * destructive step in the lifecycle.
    *
    * `retainGenerations` sizes the reader-grace window: the newest N
    * generations BELOW the current one keep their version files and
    * segments alive, so a reader that resolved a manifest up to N
    * mutations ago still holds a complete file set (and [[loadAt]]
    * time-travels that deep). The append paths pass 1 — routine
    * appends never disturb a reader one generation back; a deployment
    * with longer-running readers raises it. The default 0 retains only
    * the current generation — what compact and the
    * right-to-be-forgotten paths need, where PHYSICAL removal of the
    * superseded files is the entire point and wins over reader grace.
    * Returns the number of paths removed; safe to run unconditionally
    * at index-open time (the recover() role). */
  def vacuum(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Int = {
    val fs = fsOf(spark)
    load(spark, indexDir) match {
      case None => 0
      case Some(snap) =>
        var removed = 0
        val md = new Path(manifestDir(indexDir))
        val older =
          (math.max(1L, snap.version - retainGenerations) until snap.version)
            .filter(v => fs.exists(new Path(md, versionName(v))))
        val keepVersions =
          (older.map(versionName) :+ versionName(snap.version)).toSet
        val retainedSegs: Set[String] = older
          .flatMap(v => parseVersion(spark, indexDir, versionName(v)).toSeq
            .flatMap(_.tables.values.flatten))
          .toSet
        val live = snap.tables.values.flatten.toSet ++ retainedSegs
        val segRoot = new Path(s"$indexDir/segs")
        if (fs.exists(segRoot)) {
          for (st <- fs.listStatus(segRoot)
               if !live.contains(st.getPath.getName)) {
            fs.delete(st.getPath, true)
            removed += 1
          }
        }
        for (st <- fs.listStatus(md)) {
          val n = st.getPath.getName
          if (!keepVersions.contains(n)) {
            fs.delete(st.getPath, true)
            removed += 1
          }
        }
        removed
    }
  }

  /** Fleet observability — the freshness/lag audit a farm of persisted
    * indexes needs (the manifest-log twin of q160/q233's per-index
    * health stats). One row per index, read entirely from manifest
    * METADATA — one dir listing plus one small text file per retained
    * version, never data files — so a dashboard can sweep hundreds of
    * 100 TB indexes per tick. Columns:
    *   - `index` — the caller's name for the dir;
    *   - `version` — current manifest head (null: no manifest, i.e. a
    *     fresh or un-migrated legacy dir — the loud signal);
    *   - `op_id` — the exactly-once high-water mark (null if none);
    *   - `n_tables` / `n_segments` — logical tables and total live
    *     segments at head (`n_segments` growth is the small-files
    *     decay that schedules a compact);
    *   - `retained_versions` / `oldest_retained` — how deep [[loadAt]]
    *     time travel currently reaches (the vacuum-depth evidence);
    *   - `pinned_version` / `pinned_lag` — a long-running reader's
    *     pinned snapshot vs head (null when the caller passed none):
    *     lag ≥ `retained_versions` means that reader is about to fall
    *     off the retention horizon and the next vacuum must wait or
    *     deepen `retainGenerations`. */
  def freshness(spark: SparkSession, indexes: Seq[(String, String)],
      pinned: Map[String, Snapshot] = Map.empty): DataFrame = {
    val fs = fsOf(spark)
    val rows = indexes.map { case (name, dir) =>
      val snap = load(spark, dir)
      val md = new Path(manifestDir(dir))
      val versions =
        if (!fs.exists(md)) Seq.empty[Long]
        else fs.listStatus(md).map(_.getPath.getName)
          .filter(n => n.length == 21 && n.startsWith("v") &&
            n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).sorted.toSeq
      val p = pinned.get(name)
      (name,
        snap.map(_.version),
        snap.flatMap(_.opId),
        snap.map(_.tables.size.toLong),
        snap.map(_.tables.values.map(_.size.toLong).sum),
        versions.size.toLong,
        versions.headOption,
        p.map(_.version),
        for (s <- snap; q <- p) yield s.version - q.version)
    }
    val sp = spark
    import sp.implicits._
    rows.toDF("index", "version", "op_id", "n_tables", "n_segments",
      "retained_versions", "oldest_retained", "pinned_version",
      "pinned_lag")
  }

  /** One-shot migration of a PRE-manifest index layout (rounds before
    * the commit layer stored each logical table as a plain parquet
    * directory `<indexDir>/<table>`, with an optional `_applied_op`
    * text file as the exactly-once marker): each listed table dir that
    * exists is MOVED (renamed — no data copy) into the segment store
    * and committed as that table's initial segment, the legacy marker
    * is carried into the commit and removed. Returns the initial
    * snapshot; None when the dir already has a manifest (already
    * migrated — never overwrites) or none of the listed tables exists
    * (nothing to migrate). Without this, [[load]] returns None for a
    * legacy layout and [[read]] fails with "no committed segments" —
    * every pre-manifest index would silently require a full rebuild.
    *
    * Crash-safe under replay: each table is renamed (atomic) and the
    * manifest commit is the single visible transition, so a crash can
    * only leave (a) some tables moved into `segs/` but uncommitted, or
    * (b) a committed manifest with the legacy `_applied_op` file not
    * yet retired. The replay ADOPTS already-moved `<table>-legacy`
    * segments — a replay that only looked at top-level dirs would
    * commit a manifest WITHOUT the moved table and the next vacuum
    * would reclaim it as an orphan (data loss) — and finishes the
    * marker retirement on the already-migrated path. */
  def migrate(spark: SparkSession, indexDir: String, tables: Seq[String])
      : Option[Snapshot] = migrateImpl(spark, indexDir, tables, _ => ())

  /** [[migrate]] with an injectable crash point (spec-only seam —
    * fires `moved:<table>` after each rename and `committed` after the
    * manifest publish, before the legacy marker is retired). */
  private[graft] def migrateImpl(spark: SparkSession, indexDir: String,
      tables: Seq[String], crashPoint: String => Unit)
      : Option[Snapshot] = MaintenanceLock.withLock(spark, indexDir) {
    val fs = fsOf(spark)
    val opP = new Path(s"$indexDir/_applied_op")
    if (load(spark, indexDir).nonEmpty) {
      // Replay of a migrate that crashed between its commit and the
      // marker delete: the commit already carries the op (and is the
      // only writer that could leave this pairing behind) — finish the
      // retirement so the dead legacy file cannot shadow the manifest.
      if (fs.exists(opP)) { fs.delete(opP, false); () }
      None
    } else {
      // Migratable = legacy dir still at the top level, OR a prior
      // migrate crashed after renaming it into the segment store but
      // before committing — such a segment must be adopted, not
      // skipped: committing without it would orphan the moved data.
      val present = tables.filter(t =>
        fs.exists(new Path(s"$indexDir/$t")) ||
          fs.exists(new Path(s"$indexDir/segs/$t-legacy")))
      if (present.isEmpty) None
      else {
        val segRoot = new Path(s"$indexDir/segs")
        if (!fs.exists(segRoot)) { fs.mkdirs(segRoot); () }
        val moved = present.map { t =>
          val seg = s"$t-legacy"
          val src = new Path(s"$indexDir/$t")
          val dst = new Path(s"$indexDir/segs/$seg")
          if (fs.exists(dst)) {
            // rename is atomic, so src and dst both existing is not a
            // crash state — refuse rather than guess which is live
            // (Hadoop's local rename would nest src INSIDE dst).
            if (fs.exists(src))
              throw new IllegalStateException(
                s"migrate: both $indexDir/$t and segs/$seg exist — " +
                  "not a crashed migrate; refusing to pick one")
          } else if (!fs.rename(src, dst))
            throw new IllegalStateException(
              s"migrate: could not move $indexDir/$t into the segment store")
          crashPoint(s"moved:$t")
          t -> Seq(seg)
        }.toMap
        val legacyOp =
          if (!fs.exists(opP)) None
          else {
            val in = fs.open(opP)
            val txt = try new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
            finally in.close()
            scala.util.Try(txt.toLong).toOption
          }
        val snap = commit(spark, indexDir, moved, legacyOp)
        crashPoint("committed")
        if (fs.exists(opP)) { fs.delete(opP, false); () }
        Some(snap)
      }
    }
  }
}

/** Single-writer lease over an index directory. Every index lifecycle
  * here (admit/append/delete/compact/build) interleaves segment writes
  * and manifest commits that are only safe serially; the lock turns
  * the standing "single writer assumed" contract into an enforced one.
  *
  * Mechanics, two layers composed:
  *
  *   - CROSS-PROCESS: `_lock` is created with create-no-overwrite
  *     (atomic on local FS/HDFS) carrying the holder id. A second
  *     writer fails fast with [[MaintenanceLock.LockHeldException]].
  *     Stale leases (holder died without release — the lock file's age
  *     exceeds `staleMs`) are taken over ATOMICALLY: the contender
  *     renames the stale file to a unique tombstone name first, and
  *     only the one whose rename succeeds may create the fresh lock —
  *     a delete+create takeover would let the slower of two observers
  *     delete the faster one's brand-new lease and acquire a second
  *     concurrent writer. Release deletes the file only while it still
  *     carries THIS holder's id, so a holder whose lease was stolen
  *     (it stopped beating — VM freeze, debugger pause) cannot free
  *     the thief's live lease on its way out.
  *   - IN-PROCESS: a JVM-wide per-directory registry pins the lease to
  *     the acquiring THREAD. Two threads of one Spark application
  *     mutating the same index share a holder id, so the file lease
  *     alone would wave both through as "re-entrant"; the registry
  *     makes the second thread fail fast instead (same semantics as a
  *     second process). Same-THREAD re-entry by the same holder (a
  *     lifecycle calling another on the same index, or a replay after
  *     a simulated crash) stays a no-op passthrough: the inner scope
  *     neither re-acquires, re-beats, nor releases — the outer scope's
  *     heartbeat and release win.
  *
  * While the body runs, a HEARTBEAT daemon refreshes the lock's mtime
  * every `staleMs / 3`, so staleness measures "holder stopped
  * beating", never "maintenance ran long" — without it a 100 TB
  * compact outliving the stale window would have its live lease stolen
  * mid-write, which is exactly the corruption the lock exists to
  * prevent.
  */
object MaintenanceLock {

  final class LockHeldException(msg: String) extends RuntimeException(msg)

  /** Spec-only crash channel: a body throwing this simulates the
    * holder DYING mid-critical-section — the heartbeat stops but the
    * lease file is deliberately NOT released (a real dead process
    * cannot run its finally), leaving exactly the stale-lease state a
    * contender must take over atomically. Production code never
    * throws it; the TRUE-concurrency fuzz kills each maintainer type
    * through it and proves the takeover path converges. */
  private[graft] final class AbandonedLease
    extends RuntimeException("abandoned lease (spec crash seam)")

  /** One id per JVM — maintenance from two processes contends; nested
    * calls within one process re-enter (same thread only — see the
    * in-process registry). */
  private[operators] val holderId: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName

  val DefaultStaleMs: Long = 10L * 60L * 1000L

  /** The in-process layer: which (thread, holder) currently owns each
    * index dir in THIS JVM. `depth` counts same-thread re-entries so
    * only the outermost scope releases the slot. */
  private final class JvmEntry(val thread: Thread, val holder: String) {
    var depth: Int = 1
  }
  private val jvmHolders =
    new java.util.concurrent.ConcurrentHashMap[String, JvmEntry]()

  def withLock[T](spark: SparkSession, indexDir: String,
      staleMs: Long = DefaultStaleMs)(body: => T): T =
    withLockAs(spark, indexDir, holderId, staleMs)(body)

  /** One canonical spelling per index dir: `/idx`, `/idx/`, `/a/./idx`
    * and a cwd-relative `idx` must all contend on ONE registry slot and
    * ONE lease file — keyed on the raw string, two threads spelling the
    * dir differently would miss each other in the registry and the
    * second's fileLease would then read the first's lock file, see its
    * own (shared) holder id, and pass through as "re-entrant": two
    * threads interleaving mutations on one index. makeQualified
    * resolves relative paths and adds the scheme; the Path constructor
    * collapses `//` and strips trailing `/`; URI.normalize folds `.`
    * and `..` segments; the scheme/authority/path rebuild unifies the
    * null-vs-empty authority split (a relative path qualifies against
    * the working dir as `file:/...` while an absolute one qualifies
    * against the fs URI as `file:///...` — same dir, different URI
    * strings). The path component is taken RAW (getRawPath): getPath
    * percent-DECODES, so a directory whose literal name contains a URI
    * escape (`/tmp/a%20b`) would canonicalize to `/tmp/a b` — colliding
    * two distinct dirs on one lock key. The raw form round-trips
    * without decoding; the lease file itself is addressed through the
    * qualified Path OBJECT ([[withLockAs]]), never re-parsed from this
    * string. */
  private def canonicalDir(qualified: Path): String = {
    val uri = qualified.toUri.normalize()
    val auth = Option(uri.getAuthority).getOrElse("")
    s"${uri.getScheme}://$auth${uri.getRawPath}"
  }

  /** The lock's canonical spelling of an index dir, exposed so other
    * per-index registries (the [[ProbeLedger]]) key exactly the way
    * the lease does — a probe recorded under `idx/` and a maintainer
    * reading under `/abs/idx` must meet on ONE slot. */
  private[graft] def canonicalKey(spark: SparkSession,
      rawIndexDir: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    canonicalDir(fs.makeQualified(new Path(rawIndexDir)))
  }

  /** [[withLock]] with an explicit holder id (spec seam — lets a test
    * simulate a SECOND process contending for the lease). */
  private[graft] def withLockAs[T](spark: SparkSession, rawIndexDir: String,
      holder: String, staleMs: Long = DefaultStaleMs)(body: => T): T = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(new Path(rawIndexDir))
    val indexDir = canonicalDir(qualified)
    val cur = jvmHolders.get(indexDir)
    if (cur != null && (cur.thread eq Thread.currentThread())) {
      if (cur.holder == holder) {
        // same thread, same holder: re-entrant passthrough (the outer
        // scope's file lease, heartbeat, and release stay in charge)
        cur.depth += 1
        try body finally cur.depth -= 1
      } else
        // same thread posing as a DIFFERENT holder (the spec's
        // simulated second process): defer to the file lease, which
        // fails fast on the outer scope's fresh foreign lock
        fileLease(spark, qualified, indexDir, holder, staleMs)(body)
    } else if (cur != null) {
      // another THREAD of this JVM holds the index — fail fast exactly
      // like a second process would (shared holder id made the file
      // lease alone wave both threads through)
      throw new LockHeldException(
        s"index $indexDir is under maintenance by thread " +
          s"'${cur.thread.getName}' of this process (holder ${cur.holder})")
    } else {
      val mine = new JvmEntry(Thread.currentThread(), holder)
      if (jvmHolders.putIfAbsent(indexDir, mine) != null)
        throw new LockHeldException(
          s"index $indexDir lock was taken concurrently by another thread")
      try fileLease(spark, qualified, indexDir, holder, staleMs)(body)
      finally { jvmHolders.remove(indexDir, mine); () }
    }
  }

  /** The cross-process file lease (see the object scaladoc). Assumes
    * the in-process registry has already admitted this thread. `root`
    * is the qualified Path OBJECT (never a re-parsed canonical string —
    * a literal `%XX` in the dir name must not decode); `indexDir` is
    * the canonical spelling, used for messages only. */
  private def fileLease[T](spark: SparkSession, root: Path,
      indexDir: String, holder: String, staleMs: Long)(body: => T): T = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) { fs.mkdirs(root); () }
    val lock = new Path(root, "_lock")

    def readHolder(): Option[String] =
      if (!fs.exists(lock)) None
      else {
        val in = fs.open(lock)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
        catch { case _: java.io.IOException => None }
        finally in.close()
      }

    readHolder() match {
      case Some(h) if h == holder =>
        // re-entrant: already ours — run without touching the lease
        body
      case other =>
        other.foreach { h =>
          val age = System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime
          if (age <= staleMs)
            throw new LockHeldException(
              s"index $indexDir is under maintenance by $h " +
                s"(lease age ${age}ms)")
          // stale lease: take over by ATOMIC rename to a unique
          // tombstone — of two contenders observing the same stale
          // file, exactly one rename finds the source present, so the
          // loser can never delete the winner's freshly created lock
          val tomb = new Path(root, "_lock.stale-" +
            java.util.UUID.randomUUID.toString.take(12))
          val won =
            try fs.rename(lock, tomb)
            catch { case _: java.io.IOException => false }
          if (!won)
            throw new LockHeldException(
              s"index $indexDir stale lease was taken over concurrently")
          fs.delete(tomb, false)
          ()
        }
        val out =
          try fs.create(lock, false)
          catch {
            case _: java.io.IOException =>
              // lost the creation race to another writer
              throw new LockHeldException(
                s"index $indexDir lock was taken concurrently")
          }
        try out.write(holder.getBytes("UTF-8")) finally out.close()
        // heartbeat: refresh the lease's mtime while the body runs, so
        // long maintenance is never mistaken for a dead holder
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val beat = new Thread(() => {
          while (!stop.get()) {
            try {
              Thread.sleep(math.max(staleMs / 3, 25L))
              if (!stop.get())
                fs.setTimes(lock, System.currentTimeMillis(), -1)
            } catch {
              case _: InterruptedException => // stopping
              case _: java.io.IOException => // fs hiccup: retry next beat
            }
          }
        }, s"graft-lease-heartbeat-$indexDir")
        beat.setDaemon(true)
        beat.start()
        var abandoned = false
        try body
        catch {
          // the spec's process-death seam: stop beating, keep the
          // lease file — a dead process runs no finally, so the file
          // must be left exactly as the holder's last heartbeat left
          // it for the stale-takeover path to exercise
          case a: AbandonedLease => abandoned = true; throw a
        }
        finally {
          stop.set(true); beat.interrupt()
          // release only a lease that is still OURS: after a stale
          // takeover (we stopped beating), the file carries the
          // thief's id and deleting it would admit a third writer
          if (!abandoned && readHolder().contains(holder)) {
            fs.delete(lock, false); ()
          }
        }
    }
  }
}

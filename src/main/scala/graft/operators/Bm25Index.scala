package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the LEXICAL member of the persisted
  * index family ([[LshBandIndex]] near-dup bands, [[IvfIndex]] /
  * [[IvfPq]] vectors): build once, probe per query workload, append
  * nightly batches, delete on right-to-be-forgotten requests, compact
  * to apply them physically. q136/q142/q193 score BM25 by recomputing
  * postings from the corpus every run; at 100 TB the corpus is
  * tokenized ONCE into this index and every later probe reads only the
  * postings of the query's terms.
  *
  * Logical tables under `indexDir`, resolved through the
  * [[IndexManifest]] commit layer (immutable segments, one atomic
  * manifest rename per mutation, [[MaintenanceLock]] single-writer
  * lease on all maintenance):
  *   - `postings` — (term, doc_id, tf, dl), repartitioned by `term`
  *     (bucketed-write stand-in, the [[LshBandIndex]] convention) so a
  *     probe's term filter prunes files; tf/dl stored as exact longs.
  *   - `stats` — one row (n_docs, total_dl) as exact longs: the
  *     corpus constants BM25 needs. avgdl is DERIVED at probe time as
  *     the double division of the two integers — never stored as a
  *     float, so append's integer additivity keeps the index
  *     bit-equal to a fresh build (the append law in Bm25IndexSpec).
  *     Zero-token docs carry no postings and no stats mass — they are
  *     unscorable by construction, documented index semantics.
  *   - `tombstones/` — (doc_id, n, dl) pending deletes; [[probe]]
  *     anti-joins them out BEFORE df/scoring AND subtracts their
  *     recorded (n_docs, total_dl) mass from stats, so a deleted doc
  *     stops contributing df, idf AND avgdl immediately —
  *     probe-after-delete equals probe-after-compact EXACTLY
  *     (spec-pinned, the strong law). [[compact]] applies them
  *     physically and clears last.
  *
  * Scoring is q193's exact discipline: unlogged idf
  * (n−df+0.5)/(df+0.5) — no libm anywhere — times the k1=1.2/b=0.75
  * saturation term, each per-term score floor(·1e6)-quantized BEFORE
  * the per-(query,doc) sum so the sum is exact integer arithmetic
  * (order-independent). [[scoreTopK]] is shared verbatim by the
  * persisted [[probe]] and the oracle-checked registry twin (q209), so
  * the DuckDB hash-match validates the probe's math and
  * Bm25IndexSpec's probe-vs-q209 equality validates the persisted
  * path.
  */
object Bm25Index {
  import Dsl._

  /** Per-query result size. */
  val TopK = 10

  /** Postings of a (doc_id, text) corpus frame: one row per (doc,
    * term) with term frequency and doc length — the q193 shapes, kept
    * as exact longs at rest. */
  private[operators] def postingsOf(s: SparkSession, corpus: DataFrame)
      : DataFrame = {
    graft.functions.TextFunctions.register(s)
    corpus
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), toks(col("text")).as("t"))
      // documents arrive in O(1) parquet partitions; spread tokenize
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
  }

  /** One-row (n_docs, total_dl) over a postings frame — the additive
    * corpus constants; recomputable from postings at any time (the
    * crash-repair path [[refreshStats]] uses exactly this). */
  private[operators] def statsFrom(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(min(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  /** Top-k BM25 per query over explicit frames. `queries` is a small
    * (qid, term) frame (broadcast); `stats` the one-row constants.
    * Shared verbatim by [[probe]] and the q209 registry twin. */
  private[operators] def scoreTopK(postings: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int): DataFrame =
    scoreTopKUnordered(postings, stats, queries, k).orderBy("qid", "rank")

  /** [[scoreTopK]] minus the trailing global sort — for consumers that
    * feed the frame into an order-destroying operator Catalyst cannot
    * see through (the q212/q256 union+aggregate fusion: EliminateSorts
    * removes a sort below a JOIN but not below Union→Aggregate, so the
    * ordered frame would pay a rangepartitioning exchange + sort whose
    * output order the fusion immediately discards). */
  private[operators] def scoreTopKUnordered(postings: DataFrame,
      stats: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = graft.CacheScope.cached(
      postings.join(broadcast(queries), "term"))
    // df per term over the full (non-deleted) corpus: the hit rows
    // carry every posting of a query term, deduped across qids
    val dfs = hits.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val st = stats.select(col("n_docs"),
      (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val termScore =
      ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        ((col("tfd") * lit(2.2)) /
          (col("tfd") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dld") / col("avgdl")))))
    hits
      .withColumn("tfd", col("tf").cast("double"))
      .withColumn("dld", col("dl").cast("double"))
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(st))
      .withColumn("s_q6", floor(termScore * lit(1e6)).cast("long"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("s_q6")).as("score_q6"))
      .withColumn("rank", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("score_q6").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_q6"))
  }

  /** Build the index over a (doc_id, text) corpus frame: one tokenize
    * pass, cached so both table writes share it; both segments publish
    * in ONE manifest commit, replacing any previous state. */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val p = postingsOf(spark, corpus).cache()
      try {
        val sp = IndexManifest.newSegment(spark, indexDir, "postings")(d =>
          p.repartition(col("term")).write.mode("overwrite").parquet(d))
        val ss = IndexManifest.newSegment(spark, indexDir, "stats")(d =>
          statsFrom(p).coalesce(1).write.mode("overwrite").parquet(d))
        IndexManifest.commit(spark, indexDir,
          Map("postings" -> Seq(sp), "stats" -> Seq(ss),
            "tombstones" -> Nil))
        IndexManifest.vacuum(spark, indexDir)
        ()
      } finally { p.unpersist(); () }
    }

  private def minusTombstones(df: DataFrame, ts: Option[DataFrame])
      : DataFrame =
    ts.fold(df)(t =>
      df.join(broadcast(t.select(col("doc_id").as("__ts_id"))),
        col("doc_id") === col("__ts_id"), "left_anti"))

  /** Stats with pending tombstones' mass subtracted: [[delete]]
    * records each victim's (n=1, dl) at delete time, so the probe-side
    * correction is one broadcast-scale aggregate — n_docs and avgdl
    * see the delete immediately, making probe-after-delete ≡
    * probe-after-compact EXACT (Bm25IndexSpec pins it bit-equal).
    * Reads stats through the caller's PINNED snapshot, so the
    * correction can never pair one version's stats with another
    * version's tombstones. */
  private def statsMinusTombstones(spark: SparkSession, indexDir: String,
      snap: IndexManifest.Snapshot, ts: Option[DataFrame]): DataFrame = {
    val stats = IndexManifest.readRequired(spark, indexDir, snap, "stats")
    ts match {
      case Some(t) if t.columns.contains("dl") =>
        val d = t.agg(
          coalesce(sum(col("n")), lit(0L)).as("tn"),
          coalesce(sum(col("dl")), lit(0L)).as("tdl"))
        stats.crossJoin(broadcast(d))
          .select((col("n_docs") - col("tn")).as("n_docs"),
            (col("total_dl") - col("tdl")).as("total_dl"))
      case _ => stats
    }
  }

  /** Distinct query terms under this count are collected and pushed
    * into the postings scan as an `isin` literal list (file/row-group
    * pruning); above it the driver collect and the literal list become
    * the funnel, so the probe switches to a broadcast semi-join (the
    * learnBpeAuto workload-gating pattern). */
  val TermPushdownBudget = 512L

  /** Top-k per query against the PERSISTED index. Under
    * [[TermPushdownBudget]] distinct terms the workload is collected
    * (query-bounded, the codebook-collect class) and pushed into the
    * postings scan as an `isin` filter so only the probed terms'
    * files/row-groups are read; a larger workload is instead pruned by
    * a broadcast left-semi join — no driver collect, no mega-literal
    * plan. Both paths are bit-equal (spec-pinned). Tombstoned docs are
    * anti-joined out BEFORE df computation and scoring, and their
    * stats mass is subtracted (see [[statsMinusTombstones]]).
    *
    * The whole read is PINNED to one manifest snapshot: postings,
    * tombstones, and stats resolve from the same committed version, so
    * a mutation landing mid-probe can never hand it a mixed view (e.g.
    * v1 postings still carrying a victim against v2 stats that already
    * forgot it). A probe pinned before a compact keeps a complete file
    * set as long as the compact's `retainGenerations` covers it (the
    * [[compact]] knob). */
  def probe(spark: SparkSession, queries: DataFrame, indexDir: String,
      k: Int = TopK, termBudget: Long = TermPushdownBudget): DataFrame =
    probeImpl(spark, queries, indexDir, _ => (), k, termBudget)

  /** [[probe]] with an injectable post-pin seam (spec-only): called
    * with the pinned snapshot AFTER the single manifest resolution and
    * BEFORE any table read, so a spec can commit a delete/compact
    * right there and assert the probe still serves one consistent
    * version — never a mix. */
  private[graft] def probeImpl(spark: SparkSession, queries: DataFrame,
      indexDir: String, afterPin: IndexManifest.Snapshot => Unit,
      k: Int = TopK, termBudget: Long = TermPushdownBudget): DataFrame = {
    val snap = IndexManifest.snapshot(spark, indexDir)
    afterPin(snap)
    probeSnapshot(spark, queries, indexDir, snap, k, termBudget)
  }

  /** [[probe]] against an explicitly PINNED (possibly historical)
    * snapshot — the versioned-read story on the full scoring path: a
    * probe that regressed after an append is diffed against the index
    * as it stood BEFORE it (see [[probeAt]]), and a caller holding one
    * snapshot across several probes gets repeatable reads for free. */
  def probeSnapshot(spark: SparkSession, queries: DataFrame,
      indexDir: String, snap: IndexManifest.Snapshot,
      k: Int = TopK, termBudget: Long = TermPushdownBudget): DataFrame = {
    val qTerms = queries.select("term").distinct()
    val nTerms = qTerms.count()
    val scan = IndexManifest.readRequired(spark, indexDir, snap, "postings")
    val pruned =
      if (nTerms <= termBudget) {
        val terms = qTerms.collect().map(_.getString(0)).toSeq
        scan.filter(col("term").isin(terms: _*))
      } else scan.join(broadcast(qTerms), Seq("term"), "left_semi")
    val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
    scoreTopK(minusTombstones(pruned, ts),
      statsMinusTombstones(spark, indexDir, snap, ts), queries, k)
  }

  /** Time-travel probe: serve the workload from the index as it stood
    * at manifest `version` — None once the version is vacuumed past
    * the retention horizon (loud, never a partial file set). The
    * operational use: an append lands, a canary query regresses, and
    * the on-call diffs [[probe]] (head) against [[probeAt]] (the
    * pre-append version the routine vacuum retains) WITHOUT rebuilding
    * anything; deployments size the window via `retainGenerations`. */
  def probeAt(spark: SparkSession, queries: DataFrame, indexDir: String,
      version: Long, k: Int = TopK,
      termBudget: Long = TermPushdownBudget): Option[DataFrame] =
    IndexManifest.loadAt(spark, indexDir, version)
      .map(snap => probeSnapshot(spark, queries, indexDir, snap, k,
        termBudget))

  /** Last applied maintenance op id, or None — the [[RollupStore]]
    * exactly-once discipline, carried by the [[IndexManifest]]: the
    * marker rides the manifest version, so it swaps ATOMICALLY with
    * the commit that publishes every [[append]]'s postings and stats
    * together. A crash before the commit leaves the index — and the
    * marker — at the old state (nothing torn; the replay simply
    * re-runs). SCOPE: the marker is a single high-water mark, so an
    * (lsh, bm25) index pair belongs to exactly ONE ingest stream —
    * two pipelines sharing an index would skip each other's batch
    * ids. */
  def appliedOp(spark: SparkSession, indexDir: String): Option[Long] =
    IndexManifest.appliedOp(spark, indexDir)

  /** Record `opId` as applied WITHOUT changing any table — the cheap
    * marker stamp for a batch that admitted nothing (every table list
    * is re-committed unchanged; one manifest rename).
    * `retainGenerations` is the deployment's reader-grace depth: a
    * busy all-rejected stream stamps a manifest version per batch, and
    * the hygiene vacuum here must not shrink the retained window below
    * what the deployment configured for its longest-running readers
    * (default 1 = the routine append grace). */
  def stampOp(spark: SparkSession, indexDir: String, opId: Long,
      retainGenerations: Int = 1): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      IndexManifest.stampOp(spark, indexDir, opId)
      // version-file hygiene: a long run of zero-admit batches must not
      // accumulate manifest versions (reader-safe: grace depth retained)
      IndexManifest.vacuum(spark, indexDir, retainGenerations)
      ()
    }

  /** Append a (doc_id, text) batch: a new postings segment plus a
    * replacement one-row stats segment holding the EXACT integer sum
    * of old + new (additive, so append ≡ fresh build bit-for-bit —
    * spec law), published in ONE manifest commit — the postings, the
    * stats, and the op marker become visible atomically or not at
    * all. The caller must not append doc_ids already in the index
    * (the admit gates — q127/q159 — own that decision). With `opId`
    * set, ids at or below the stored marker are skipped (returns
    * false); without it the stored marker is preserved (an opId-less
    * maintenance append — e.g. the [[graft.streaming.IngestPipeline]]
    * repair path — must never erase the exactly-once high-water
    * mark). A crash before the commit leaves the index untouched and
    * the replay re-runs cleanly. */
  def append(spark: SparkSession, batch: DataFrame, indexDir: String,
      opId: Option[Long] = None): Boolean =
    appendImpl(spark, batch, indexDir, _ => (), opId)

  /** [[append]] with an injectable crash point (spec-only seam —
    * called with "postings:appended" / "stats:staged", both STAGED
    * and invisible, then "stats:swapped" after the commit). */
  private[graft] def appendImpl(spark: SparkSession, batch: DataFrame,
      indexDir: String, crashPoint: String => Unit,
      opId: Option[Long] = None): Boolean =
   MaintenanceLock.withLock(spark, indexDir) {
    // ONE pinned snapshot serves the whole read-modify-write: the
    // marker check, the stats merge, and the commit's base table map
    // all come from the same version (the lease excludes writers, so
    // pinning here is belt-and-braces consistency, not a race fix)
    val snap0 = IndexManifest.load(spark, indexDir)
    if (opId.exists(id => snap0.flatMap(_.opId).exists(_ >= id))) {
      // replayed op: the original run may have crashed between its
      // commit and its vacuum — finish the (cheap, idempotent)
      // reclamation so a replay leaves no superseded files behind
      IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
      false
    } else {
      val snap = snap0.getOrElse(throw new IllegalStateException(
        s"no committed manifest under $indexDir — build() first"))
      val p = postingsOf(spark, batch).cache()
      try {
        val sp = IndexManifest.newSegment(spark, indexDir, "postings")(d =>
          p.repartition(col("term")).write.mode("overwrite").parquet(d))
        crashPoint("postings:appended")
        val merged = statsFrom(p).unionAll(
            IndexManifest.readRequired(spark, indexDir, snap, "stats"))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_dl")).as("total_dl"))
        val ss = IndexManifest.newSegment(spark, indexDir, "stats")(d =>
          merged.coalesce(1).write.mode("overwrite").parquet(d))
        crashPoint("stats:staged")
        val cur = snap.tables
        IndexManifest.commit(spark, indexDir, cur
          .updated("postings", cur.getOrElse("postings", Nil) :+ sp)
          .updated("stats", Seq(ss)), opId)
        crashPoint("stats:swapped")
        // routine append: retain the previous generation so a reader
        // that resolved the pre-append manifest keeps serving
        IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
        ()
      } finally { p.unpersist(); () }
      true
    }
   }

  /** Recompute `stats` from the live postings — the idempotent repair
    * for a torn CROSS-INDEX ingest (postings landed via the repair
    * append, the batch marker not yet stamped — see
    * [[graft.streaming.IngestPipeline]]) and the ground truth the
    * additive merge must equal (spec-pinned). `opId` stamps the
    * repaired stats as that op; without it the existing marker is
    * preserved by the commit. */
  def refreshStats(spark: SparkSession, indexDir: String,
      opId: Option[Long] = None): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val snap = IndexManifest.snapshot(spark, indexDir)
      val ss = IndexManifest.newSegment(spark, indexDir, "stats")(d =>
        statsFrom(IndexManifest.readRequired(spark, indexDir, snap,
            "postings"))
          .coalesce(1).write.mode("overwrite").parquet(d))
      IndexManifest.commit(spark, indexDir,
        snap.tables.updated("stats", Seq(ss)), opId)
      IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
      ()
    }

  /** Logical delete: record tombstones carrying each victim's stats
    * mass (n=1 and its dl, looked up from postings ONCE at delete
    * time — deletes are rare, the scan is the price of the strong
    * probe law; ids not in the index contribute no mass). Already-
    * tombstoned ids are anti-joined out so a re-delete can never
    * double-subtract. [[probe]] hides tombstones AND subtracts their
    * mass immediately; [[compact]] applies them physically.
    *
    * Migration note: tombstones written before the stats-mass upgrade
    * carried only (doc_id); a dir mixing both layouts would read with
    * one file's schema — the stats correction would then silently go
    * partial (null n/dl rows contribute no mass) and the probe law
    * would quietly fail for those docs. [[delete]] ENFORCES the
    * migration: when it finds legacy-layout tombstones it auto-compacts
    * first (which applies and CLEARS them — [[statsMinusTombstones]]
    * degrades safely to no adjustment while they exist), then appends
    * the new-layout rows to the now-empty set. */
  def delete(spark: SparkSession, docIds: Seq[Long], indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      import spark.implicits._
      // fail-safe migration gate: never mix tombstone layouts in one
      // dir (the gate reads the CURRENT manifest; a triggered compact
      // commits a new version, so the pin below happens AFTER it)
      val pre = IndexManifest.snapshot(spark, indexDir)
      if (IndexManifest.readSnapshot(spark, indexDir, pre, "tombstones")
          .exists(!_.columns.contains("dl")))
        compact(spark, indexDir)
      val snap = IndexManifest.snapshot(spark, indexDir)
      val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
      val ids = docIds.toDF("doc_id")
      // inner join: only docs PRESENT in the index carry mass (n=1, dl).
      // An absent id needs no tombstone at all — it cannot be served and
      // never contributed to stats.
      val rows = IndexManifest.readRequired(spark, indexDir, snap, "postings")
        .join(broadcast(ids), Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(min(col("dl")).as("dl"))
        .select(col("doc_id"), lit(1L).as("n"), col("dl"))
      val pruned = ts.fold(rows)(t =>
        rows.join(broadcast(t.select("doc_id")), Seq("doc_id"), "left_anti"))
        .localCheckpoint()
      val seg = IndexManifest.newSegment(spark, indexDir, "tombstones")(d =>
        pruned.write.mode("overwrite").parquet(d))
      IndexManifest.commit(spark, indexDir, snap.tables.updated("tombstones",
        snap.segmentsOf("tombstones") :+ seg))
      ()
    }

  /** Apply tombstones physically and refresh stats from the clean
    * postings (recompute, not subtraction — the ground truth). The
    * compacted postings, the recomputed stats and the tombstone CLEAR
    * publish in ONE manifest commit, so no probe can ever observe a
    * recomputed stats row alongside still-pending tombstones (the
    * pre-manifest design had exactly that window, where the probe
    * would subtract the tombstone mass a second time). A crash at any
    * seam leaves the old state fully live; the rerun converges.
    *
    * `retainGenerations` defers the destructive step: the default 0
    * reclaims the superseded files immediately (physical removal of
    * tombstoned docs is usually the point of compacting), while a
    * deployment with long-running readers passes ≥ 1 so a reader that
    * pinned the pre-compact snapshot keeps a complete file set for
    * that many further mutations (the reader-isolation story the
    * [[IndexManifest]] header describes, now actually selectable). */
  def compact(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Unit =
    compactImpl(spark, indexDir, _ => (), retainGenerations)

  /** [[compact]] with an injectable crash point (spec-only seam —
    * "postings:written" / "stats:written" are staged-invisible,
    * "committed" is the atomic publish, "vacuumed" ends cleanup). */
  private[graft] def compactImpl(spark: SparkSession, indexDir: String,
      crashPoint: String => Unit, retainGenerations: Int = 0): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val snap = IndexManifest.snapshot(spark, indexDir)
      val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
      val clean = minusTombstones(
        IndexManifest.readRequired(spark, indexDir, snap, "postings"), ts)
        .repartition(col("term")).cache()
      try {
        val sp = IndexManifest.newSegment(spark, indexDir, "postings")(d =>
          clean.write.mode("overwrite").parquet(d))
        crashPoint("postings:written")
        val ss = IndexManifest.newSegment(spark, indexDir, "stats")(d =>
          statsFrom(clean).coalesce(1).write.mode("overwrite").parquet(d))
        crashPoint("stats:written")
        IndexManifest.commit(spark, indexDir,
          Map("postings" -> Seq(sp), "stats" -> Seq(ss),
            "tombstones" -> Nil))
        crashPoint("committed")
        IndexManifest.vacuum(spark, indexDir, retainGenerations)
        crashPoint("vacuumed")
        ()
      } finally { clean.unpersist(); () }
    }

  /** Open-time repair: with the manifest layer a crash can only leave
    * orphan segments and superseded manifest versions — the index
    * itself is always fully live. Delegates to
    * [[IndexManifest.vacuum]]; safe to run unconditionally.
    * `retainGenerations` > 0 keeps that many older generations for
    * still-running readers (the compact knob). */
  def recover(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Boolean =
    MaintenanceLock.withLock(spark, indexDir) {
      IndexManifest.vacuum(spark, indexDir, retainGenerations) > 0
    }

  /** Oracle CTE chain ending in `bmtop(qid, doc_id, score_q6, rnk)` —
    * the q209 semantics, shared with the hybrid-fusion oracle (q212). */
  private[operators] val sqlBm25Chain: String =
    s"""tk AS MATERIALIZED (SELECT doc_id, ${sqlToks("text")} AS t
          FROM documents WHERE doc_id IS NOT NULL),
        post AS MATERIALIZED (SELECT doc_id, term,
            cast(count(*) as bigint) AS tf, min(dl) AS dl
          FROM (SELECT doc_id, cast(len(t) as bigint) AS dl,
              g.term AS term
            FROM tk, unnest(t) AS g(term))
          GROUP BY 1, 2),
        d1 AS (SELECT doc_id, min(dl) AS dl FROM post GROUP BY 1),
        st AS (SELECT cast(count(*) as bigint) AS n_docs,
            cast(sum(dl) as bigint) AS total_dl FROM d1),
        q AS (SELECT qid, g.term AS term
          FROM (SELECT doc_id AS qid, list_distinct(t[11:14]) AS qt
              FROM tk WHERE doc_id < 8),
            unnest(qt) AS g(term)),
        hits AS MATERIALIZED (SELECT q.qid, p.doc_id, p.term,
            cast(p.tf as double) AS tfd, cast(p.dl as double) AS dld
          FROM post p JOIN q USING (term)),
        dfs AS (SELECT term, cast(count(*) as bigint) AS df
          FROM (SELECT DISTINCT term, doc_id FROM hits) GROUP BY 1),
        sc AS (SELECT qid, doc_id,
            cast(sum(cast(floor(
              ((st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) *
              ((h.tfd * 2.2) / (h.tfd + 1.2 *
                (0.25 + 0.75 * (h.dld /
                  (cast(st.total_dl as double) / st.n_docs))))) * 1000000.0)
              as bigint)) as bigint) AS score_q6
          FROM hits h JOIN dfs USING (term) CROSS JOIN st
          GROUP BY 1, 2),
        bmtop AS MATERIALIZED (SELECT qid, doc_id, score_q6,
            row_number() OVER (
              PARTITION BY qid ORDER BY score_q6 DESC, doc_id) AS rnk
          FROM sc)"""

  /** The q209 known-item top-10 frame (qid, rank, doc_id, score_q6)
    * over in-line postings — shared by q209 and the hybrid fusion
    * (q212). */
  private[operators] def bm25TopKFrame(s: SparkSession, d: String)
      : DataFrame = bm25TopKFrameUnordered(s, d).orderBy("qid", "rank")

  /** Unordered twin for the q212/q256 fusion (see
    * [[scoreTopKUnordered]]). */
  private[operators] def bm25TopKFrameUnordered(s: SparkSession, d: String)
      : DataFrame = {
    val post = graft.CacheScope.cached(
      postingsOf(s, Tables.documents(s, d)))
    val queries = Tables.documents(s, d)
      .filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(toks(col("text")), 11, 4)))
          .as("term"))
    scoreTopKUnordered(post, statsFrom(post), queries, TopK)
  }

  /** q209: the oracle-checked registry twin of [[probe]] — the ranked
    * top-10 lists themselves (q193 reduces them to MRR; serving wants
    * the lists). Queries follow q193's known-item convention: doc_id
    * < 8, distinct tokens 11–14. The registry form computes postings
    * inline because the oracle needs self-contained SQL; the persisted
    * lifecycle reads them from parquet, and Bm25IndexSpec pins the two
    * paths row-identical. */
  val indexTopK: Q = Q(
    "q209_bm25_index_topk",
    (s, d) => bm25TopKFrame(s, d),
    Some(s"""WITH $sqlBm25Chain
        SELECT qid, cast(rnk as bigint) AS rank, doc_id, score_q6
        FROM bmtop WHERE rnk <= $TopK
        ORDER BY qid, rank"""),
    bench = true)

  val all: Seq[Q] = Seq(indexTopK)
}

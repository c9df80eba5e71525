package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band-bucket index — the incremental NEAR-dup
  * admit shape (q127/q158 do exact-hash incremental admit; production
  * pipelines admit nightly batches against a persisted LSH index so a
  * lightly-edited repost is caught too).
  *
  * Reference behavior generalized: the reference app recomputes its
  * pandas dedup over the full corpus on every ingest
  * (feature_extractor.py:47-54 — every run re-globs ALL batch CSVs and
  * re-runs dropna+drop_duplicates over the concatenated frame); at
  * 100 TB the corpus must instead be summarized ONCE into an index the
  * nightly batch probes. Same
  * lifecycle discipline as [[IvfIndex]] (build once / probe many /
  * append survivors), applied to q37's LSH sketch (Dedup.scala).
  *
  * The index is two logical parquet tables, resolved through the
  * [[IndexManifest]] commit layer (immutable segments + one atomic
  * manifest rename per mutation — all maintenance holds the
  * [[MaintenanceLock]] single-writer lease):
  *   - `bands` — (band_id, bh, doc_id): one row per (doc, band); the
  *     probe is an equi-join on (band_id, bh). At cluster scale this
  *     table would be written bucketed by `bh` so nightly probes
  *     shuffle only the (small) batch side; local parquet has no
  *     metastore, so build() approximates with a hash-repartition on
  *     `bh` and the join broadcasts the batch side anyway.
  *   - `sets`  — (doc_id, sh): distinct word-3-gram shingle sets,
  *     read ONLY to verify exact jaccard on band-collision candidates
  *     (never the corpus text — the index is self-contained, so admit
  *     never touches the original documents table: LshBandIndexSpec
  *     pins every file scan of the probe plan under the index dir).
  *
  * Admit semantics (one row per shingle-eligible batch doc):
  * rejected iff it has a verified (exact jaccard ≥ [[Threshold]]) match
  * in the index, or a verified match to a SMALLER-id doc of its own
  * batch (greedy keep-first, the q127/q145/q152 convention — a doc
  * rejected only for a prior-dup is still covered on the next replay
  * because its admitted prior is then in the index). Survivors append
  * their band and set rows; existing index rows are never read back,
  * rewritten, or re-verified.
  */
object LshBandIndex {

  /** Exact-jaccard verification threshold (q37's published semantics). */
  val Threshold = 0.8

  private def bandsOf(signed: DataFrame): DataFrame =
    signed.select(col("doc_id"),
      posexplode(array(Dedup.bandColumns: _*)).as(Seq("band_id", "bh")))

  /** Build the index over a (doc_id, text) corpus frame. One linear
    * pass: signatures are a per-row projection (Dedup.signedSetsOf),
    * cached once so the two table writes share the computation. Both
    * segments land in ONE manifest commit, replacing any previous
    * index state; superseded segments are vacuumed. */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val signed = Dedup.signedSetsOf(spark, corpus).cache()
      try {
        val b = IndexManifest.newSegment(spark, indexDir, "bands")(p =>
          bandsOf(signed)
            .repartition(col("bh")) // co-locate buckets (bucketed-write stand-in)
            .write.mode("overwrite").parquet(p))
        val s = IndexManifest.newSegment(spark, indexDir, "sets")(p =>
          signed.select("doc_id", "sh")
            .write.mode("overwrite").parquet(p))
        IndexManifest.commit(spark, indexDir,
          Map("bands" -> Seq(b), "sets" -> Seq(s), "tombstones" -> Nil))
        IndexManifest.vacuum(spark, indexDir)
        ()
      } finally { signed.unpersist(); () }
    }

  /** Admit audit over explicit index frames: one row per batch doc with
    * verified-match counts and the admit bit. Shared verbatim by the
    * persisted lifecycle ([[admit]]) and the oracle-checked registry
    * instance (q159) — the registry form IS this audit with the corpus
    * slice standing in for the index tables.
    *
    * With `withSelf` the output adds `n_self_dups`: verified index
    * matches where the index doc IS the batch doc (same id — possible
    * only when a crashed earlier run of the SAME batch already appended
    * it, since ids are append-only across batches). The pipeline's
    * replay detection reads this column instead of re-scanning the sets
    * table for membership: the self-match rides the candidate/verify
    * join the audit already runs, so the HOT path pays nothing extra
    * (q159 keeps its published 4-column shape via the default false). */
  private def audit(signedBatch: DataFrame, indexBands: DataFrame,
      indexSets: DataFrame, bucketCap: Option[Long] = None,
      withSelf: Boolean = false): DataFrame = {
    val bB = bandsOf(signedBatch)
    // Optional probe-side population cap: an index bucket holding df
    // docs hands EVERY batch doc that hits it df candidate rows — a
    // boilerplate-shaped mega-bucket (the q160 histogram's tail) makes
    // the probe quadratic-ish exactly like the q56 pair join, and the
    // same cap bounds it: a true near-dup is missed only if EVERY band
    // it shares with its index twin is above-cap boilerplate. df == 1
    // buckets stay (unlike q56's pairing, one index doc + one batch
    // doc IS a candidate). The cap frame is computed once from the
    // index side only — at scale, from the index parquet's (band_id,
    // bh) columns, no text.
    val iBands = bucketCap.fold(indexBands) { cap =>
      val keep = indexBands.groupBy("band_id", "bh")
        .agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        .select("band_id", "bh")
      indexBands.join(keep, Seq("band_id", "bh"))
    }
    // candidates: any shared band bucket (8 bands x 2 rows — the q37
    // recall envelope); the distinct collapses multi-band collisions
    // before the shingle-set join-back so each pair is verified once
    val candIdx = bB.as("b").join(iBands.as("c"),
        col("b.band_id") === col("c.band_id") && col("b.bh") === col("c.bh"))
      .select(col("b.doc_id").as("doc_id"), col("c.doc_id").as("index_id"))
      .distinct()
    val candPrior = bB.as("x").join(bB.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("prior_id"))
      .distinct()
    val bsh = signedBatch.select(col("doc_id"), col("sh"))
    def verifiedPairs(cand: DataFrame, otherKey: String,
        otherSets: DataFrame): DataFrame = {
      val a = bsh.select(col("doc_id"), col("sh").as("sh_a"))
      val b = otherSets.select(col("doc_id").as(otherKey), col("sh").as("sh_b"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      cand.join(a, "doc_id").join(b, otherKey)
        .filter((inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter)) >= Threshold)
        .select(col("doc_id"), col(otherKey))
    }
    val vIdx = verifiedPairs(candIdx, "index_id", indexSets)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_index_dups"),
        sum(when(col("index_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_self_dups"))
    val vPrior = verifiedPairs(candPrior, "prior_id", bsh)
      .groupBy("doc_id").agg(count(lit(1)).as("n_prior_dups"))
    val base = signedBatch.select("doc_id")
      .join(vIdx, Seq("doc_id"), "left")
      .join(vPrior, Seq("doc_id"), "left")
      .select(Seq(col("doc_id"),
        coalesce(col("n_index_dups"), lit(0L)).as("n_index_dups"),
        coalesce(col("n_prior_dups"), lit(0L)).as("n_prior_dups")) ++
        (if (withSelf)
          Seq(coalesce(col("n_self_dups"), lit(0L)).as("n_self_dups"))
        else Nil): _*)
    base.withColumn("admitted",
      when(col("n_index_dups") === 0L && col("n_prior_dups") === 0L, 1L)
        .otherwise(0L))
  }

  /** Right-to-be-forgotten delete — the GDPR path a 100 TB persisted
    * index must have. A physical rewrite per delete request would
    * re-shuffle the whole index for a handful of ids, so deletes are
    * TOMBSTONES (the public deletion-vector idea in Delta/Iceberg):
    * O(batch) append of the ids to `tombstones/`, every probe/admit
    * anti-joins the (broadcast-scale) tombstone set out of BOTH index
    * tables, and [[compact]] applies them physically and clears the
    * set. Idempotent (anti-join of absent rows is a no-op; re-deleting
    * is harmless). CONSTRAINT: doc ids are append-only — a re-sent
    * document enters through [[admit]] under a NEW id (the lifecycle's
    * existing convention), because a resurrected OLD id would be
    * suppressed by its own tombstone until the next compact. */
  def delete(spark: SparkSession, docIds: Seq[Long], indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      import spark.implicits._
      val snap = IndexManifest.snapshot(spark, indexDir)
      val seg = IndexManifest.newSegment(spark, indexDir, "tombstones")(p =>
        docIds.toDF("doc_id").repartition(1)
          .write.mode("overwrite").parquet(p))
      IndexManifest.commit(spark, indexDir,
        snap.tables.updated("tombstones",
          snap.segmentsOf("tombstones") :+ seg))
      ()
    }

  private def minusTombstones(df: DataFrame, ts: Option[DataFrame])
      : DataFrame =
    ts.map(t => df.join(broadcast(t.select("doc_id")), Seq("doc_id"),
      "left_anti")).getOrElse(df)

  /** Probe only: verified (batch doc, index doc, jaccard) matches of a
    * (doc_id, text) batch against the persisted index — no writes, no
    * batch-internal gate. The index side contributes band rows to the
    * equi-join and shingle sets to the verification; the corpus text is
    * never touched. Tombstoned (deleted) docs are anti-joined out of
    * the band side before candidates form, so a forgotten doc can
    * never match — even before the compact that physically drops it.
    *
    * Bands, sets, and tombstones resolve through ONE pinned manifest
    * snapshot: a mutation committing mid-probe can never hand it one
    * table at v1 and another at v2 (e.g. v2 bands already carrying a
    * new doc whose sets the v1 read cannot verify). */
  def probe(spark: SparkSession, batch: DataFrame, indexDir: String)
      : DataFrame =
    probeImpl(spark, batch, indexDir, _ => ())

  /** [[probe]] with an injectable post-pin seam (spec-only — the
    * [[Bm25Index.probeImpl]] convention): a spec commits a mutation
    * there and asserts the probe serves one consistent version. */
  private[graft] def probeImpl(spark: SparkSession, batch: DataFrame,
      indexDir: String, afterPin: IndexManifest.Snapshot => Unit)
      : DataFrame = {
    val snap = IndexManifest.snapshot(spark, indexDir)
    afterPin(snap)
    probeSnapshot(spark, batch, indexDir, snap)
  }

  /** [[probe]] against an explicitly pinned snapshot. */
  def probeSnapshot(spark: SparkSession, batch: DataFrame,
      indexDir: String, snap: IndexManifest.Snapshot): DataFrame = {
    val signed = Dedup.signedSetsOf(spark, batch)
    val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
    val iBands = minusTombstones(
      IndexManifest.readRequired(spark, indexDir, snap, "bands"), ts)
      .select(col("band_id"), col("bh"), col("doc_id").as("index_id"))
    val cand = bandsOf(signed).as("b")
      .join(iBands,
        col("b.band_id") === iBands("band_id") && col("b.bh") === iBands("bh"))
      .select(col("b.doc_id").as("doc_id"), col("index_id")).distinct()
    val iSets = IndexManifest.readRequired(spark, indexDir, snap, "sets")
      .select(col("doc_id").as("index_id"), col("sh").as("sh_b"))
    val a = signed.select(col("doc_id"), col("sh").as("sh_a"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cand.join(a, "doc_id").join(iSets, "index_id")
      .select(col("doc_id"), col("index_id"),
        (inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= Threshold)
      .orderBy("doc_id", "index_id")
  }

  /** Time-travel probe: verified matches against the index as it stood
    * at manifest `version` — None once vacuumed past the retention
    * horizon (the [[Bm25Index.probeAt]] convention). */
  def probeAt(spark: SparkSession, batch: DataFrame, indexDir: String,
      version: Long): Option[DataFrame] =
    IndexManifest.loadAt(spark, indexDir, version)
      .map(probeSnapshot(spark, batch, indexDir, _))

  /** Nightly admit against a persisted index: audits the batch, then
    * (by default) appends the survivors' band/set rows. EAGER — the
    * audit is materialized (localCheckpoint) BEFORE the append so the
    * returned frame cannot lazily re-probe an index that now contains
    * the survivors themselves (which would flip every admitted row to
    * rejected-at-jaccard-1.0 on re-evaluation). At cluster scale pass
    * `bucketCap = Some(Dedup.BandBucketCap)` — see the cap comment in
    * [[audit]]; the default None keeps q159's exact published
    * semantics.
    *
    * Crash discipline (the IngestPipeline seam): both tables' new
    * segments are STAGED (invisible) and published by ONE
    * [[IndexManifest.commit]] — a doc's sets and its 8 band rows
    * become visible atomically, or not at all. A crash at any point
    * before the commit leaves only orphan segments (vacuumed at the
    * next maintenance); the replay simply re-audits and re-admits the
    * same survivors. The pre-manifest design's torn states
    * (sets-without-bands needing a write-order law and an anti-join
    * idempotence guard; a partial band-row subset degrading one doc's
    * future-dup recall) are structurally unreachable now. */
  def admit(spark: SparkSession, batch: DataFrame, indexDir: String,
      appendSurvivors: Boolean = true,
      bucketCap: Option[Long] = None): DataFrame =
    admitImpl(spark, batch, indexDir, _ => (), appendSurvivors, bucketCap)

  /** [[admit]] with an injectable crash point (spec-only seam —
    * called with "audited" / "sets:appended" / "bands:appended" — the
    * first two now mark STAGED segments, invisible until — /
    * "committed") and the optional `n_self_dups` replay-evidence
    * column (`withSelf` — the [[graft.streaming.IngestPipeline]]
    * repair input). */
  private[graft] def admitImpl(spark: SparkSession, batch: DataFrame,
      indexDir: String, crashPoint: String => Unit,
      appendSurvivors: Boolean = true,
      bucketCap: Option[Long] = None,
      withSelf: Boolean = false): DataFrame =
   MaintenanceLock.withLock(spark, indexDir) {
    val signed = Dedup.signedSetsOf(spark, batch).cache()
    try {
      // one pinned snapshot for the whole read-modify-write (the lease
      // excludes other writers; the pin keeps the audit's three table
      // reads and the commit base structurally same-version)
      val snap = IndexManifest.snapshot(spark, indexDir)
      // tombstoned docs leave the BAND side; candidates then never name
      // them, so the sets side needs no filter (the verify join drops)
      val iBands = minusTombstones(
        IndexManifest.readRequired(spark, indexDir, snap, "bands"),
        IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones"))
      val iSets = IndexManifest.readRequired(spark, indexDir, snap, "sets")
      val a = audit(signed, iBands, iSets, bucketCap, withSelf)
        .orderBy("doc_id").localCheckpoint()
      crashPoint("audited")
      if (appendSurvivors) {
        val surv = signed.join(
          a.filter(col("admitted") === 1L).select("doc_id"), "doc_id")
        if (!surv.isEmpty) {
          // stage both tables' segments, publish with ONE commit: a
          // replayed doc is either fully in the index (self-rejected
          // by the audit, never re-staged) or fully absent — no
          // idempotence guard is needed any more
          val segSets = IndexManifest.newSegment(spark, indexDir, "sets")(
            p => surv.select("doc_id", "sh")
              .write.mode("overwrite").parquet(p))
          crashPoint("sets:appended")
          val segBands = IndexManifest.newSegment(spark, indexDir, "bands")(
            p => bandsOf(surv)
              .repartition(col("bh")) // keep build()'s co-location invariant
              .write.mode("overwrite").parquet(p))
          crashPoint("bands:appended")
          val cur = snap.tables
          IndexManifest.commit(spark, indexDir, cur
            .updated("sets", cur.getOrElse("sets", Nil) :+ segSets)
            .updated("bands", cur.getOrElse("bands", Nil) :+ segBands))
          crashPoint("committed")
          // version-file hygiene; pure-append, so only superseded
          // manifest versions (older than previous) are cleaned
          IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
        }
      }
      a
    } finally { signed.unpersist(); () }
   }

  /** Physical maintenance: every nightly [[admit]] append adds a
    * segment sized by that batch, so a year of batches leaves the bands
    * table as hundreds of small segments whose per-file open/footer
    * cost starts to dominate the probe scan (the classic small-files
    * decay — the LSH twin of [[IvfIndex.rebalance]]'s logical decay).
    * Rewrites each table into ONE segment — bands re-co-located on `bh`
    * (restoring build()'s layout invariant exactly), sets by doc_id —
    * and applies pending [[delete]] tombstones physically.
    *
    * Crash-safety and reader isolation come from the manifest: both
    * compacted segments AND the tombstone clear publish in ONE atomic
    * manifest rename, so every crash point leaves the index readable
    * at either the old or the new state — never between (the
    * pre-manifest two-rename missing-table window, and the window
    * where a recomputed table coexisted with still-pending tombstones,
    * are both structurally gone). A reader that resolved the OLD
    * manifest keeps a complete file set until the closing vacuum —
    * and `retainGenerations` makes that deferral actually selectable:
    * the default 0 reclaims superseded files immediately (physical
    * removal of tombstoned docs is usually the point), a deployment
    * with long-running readers passes ≥ 1 to keep that many older
    * generations' files alive past the compact.
    * LshBandIndexSpec probes AT every injected crash state and pins
    * results bit-identical to pre-compact. */
  def compact(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Unit =
    compactImpl(spark, indexDir, _ => (), retainGenerations)

  /** [[compact]] with an injectable crash point (spec-only seam —
    * `crashPoint` is called with "bands:written" / "sets:written" /
    * "committed" / "vacuumed" and may throw to simulate dying there). */
  private[graft] def compactImpl(spark: SparkSession, indexDir: String,
      crashPoint: String => Unit, retainGenerations: Int = 0): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val snap = IndexManifest.snapshot(spark, indexDir)
      val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
      def rewrite(table: String, partCol: String): String =
        IndexManifest.newSegment(spark, indexDir, table) { p =>
          minusTombstones(
            IndexManifest.readRequired(spark, indexDir, snap, table), ts)
            .repartition(col(partCol))
            .write.mode("overwrite").parquet(p)
        }
      val nb = rewrite("bands", "bh")
      crashPoint("bands:written")
      val ns = rewrite("sets", "doc_id")
      crashPoint("sets:written")
      // one commit: compacted tables + tombstones cleared, atomically
      IndexManifest.commit(spark, indexDir,
        Map("bands" -> Seq(nb), "sets" -> Seq(ns), "tombstones" -> Nil))
      crashPoint("committed")
      IndexManifest.vacuum(spark, indexDir, retainGenerations)
      crashPoint("vacuumed")
      ()
    }

  /** Open-time repair: with the manifest layer a crash can only leave
    * ORPHANS (staged segments and superseded manifest versions the
    * current manifest does not reference) — the index itself is always
    * fully live. Delegates to [[IndexManifest.vacuum]]; returns true
    * when anything was cleaned. Safe to run unconditionally.
    * `retainGenerations` > 0 keeps that many older generations for
    * still-running readers (the compact knob). */
  def recover(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Boolean =
    MaintenanceLock.withLock(spark, indexDir) {
      IndexManifest.vacuum(spark, indexDir, retainGenerations) > 0
    }

  /** q159: the oracle-checked registry twin of [[admit]] — corpus =
    * doc_id % 10 < 8 plays the persisted index, batch = the rest
    * (the q127/q158 split convention). The registry form recomputes
    * corpus signatures because the oracle needs self-contained SQL; the
    * persisted lifecycle ([[build]]/[[admit]]) reads them from the index
    * parquet instead, and LshBandIndexSpec pins the two paths equal. */
  val admitQ: Q = Q(
    "q159_lsh_index_admit",
    (s, d) => {
      val signed = graft.CacheScope.cached(
        Dedup.signedSetsOf(s, Tables.documents(s, d)))
      val corpus = signed.filter(col("doc_id") % 10 < 8)
      val batch = signed.filter(col("doc_id") % 10 >= 8)
      audit(batch, bandsOf(corpus), corpus.select("doc_id", "sh"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${Dedup.sqlShingleSets}, ${Dedup.sqlSignatures},
      bands_all AS MATERIALIZED (${Dedup.sqlBandsAll}),
      cb AS (SELECT doc_id, band_id, bh FROM bands_all WHERE doc_id % 10 < 8),
      bb AS MATERIALIZED (
        SELECT doc_id, band_id, bh FROM bands_all WHERE doc_id % 10 >= 8),
      candc AS (SELECT DISTINCT b.doc_id AS doc_id, c.doc_id AS index_id
        FROM bb b JOIN cb c ON b.band_id = c.band_id AND b.bh = c.bh),
      candp AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS prior_id
        FROM bb x JOIN bb y
          ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id > y.doc_id),
      vc AS (SELECT c.doc_id, cast(count(*) as bigint) AS n_index_dups
        FROM candc c JOIN sets p ON p.doc_id = c.doc_id
                     JOIN sets q ON q.doc_id = c.index_id
        WHERE cast(len(list_intersect(p.sh, q.sh)) as double) /
          (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)))
          >= $Threshold
        GROUP BY 1),
      vp AS (SELECT c.doc_id, cast(count(*) as bigint) AS n_prior_dups
        FROM candp c JOIN sets p ON p.doc_id = c.doc_id
                     JOIN sets q ON q.doc_id = c.prior_id
        WHERE cast(len(list_intersect(p.sh, q.sh)) as double) /
          (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)))
          >= $Threshold
        GROUP BY 1)
      SELECT s.doc_id,
        coalesce(vc.n_index_dups, 0) AS n_index_dups,
        coalesce(vp.n_prior_dups, 0) AS n_prior_dups,
        cast(CASE WHEN coalesce(vc.n_index_dups, 0) = 0
          AND coalesce(vp.n_prior_dups, 0) = 0 THEN 1 ELSE 0 END as bigint)
          AS admitted
      FROM (SELECT doc_id FROM sig WHERE doc_id % 10 >= 8) s
      LEFT JOIN vc ON vc.doc_id = s.doc_id
      LEFT JOIN vp ON vp.doc_id = s.doc_id
      ORDER BY s.doc_id"""),
    bench = true)

  /** q160: band-bucket population histogram — the LSH health diagnostic
    * (q91/q100's role, for the index): per band, how many buckets hold
    * df docs. This is the number that SIZES [[Dedup.BandBucketCap]]
    * (a bucket of df docs costs ~df²/2 candidate pairs) and predicts
    * q159's probe fanout — at 100 TB you read this histogram BEFORE
    * running a pair join, because a boilerplate-driven mega-bucket
    * shows up here as one row. Two hash aggregates with map-side
    * partials; output cardinality is bounded by Bands × max-df, not
    * corpus size. */
  val bucketStats: Q = Q(
    "q160_lsh_bucket_stats",
    (s, d) => {
      val bands = bandsOf(Dedup.signedSetsOf(s, Tables.documents(s, d)))
      bands.groupBy("band_id", "bh").agg(count(lit(1)).as("df"))
        .groupBy("band_id", "df").agg(count(lit(1)).as("n_buckets"))
        .orderBy("band_id", "df")
    },
    Some(s"""WITH ${Dedup.sqlShingleSets}, ${Dedup.sqlSignatures},
      bands_all AS (${Dedup.sqlBandsAll}),
      dfs AS (SELECT band_id, bh, cast(count(*) as bigint) AS df
        FROM bands_all GROUP BY 1, 2)
      SELECT band_id, df, cast(count(*) as bigint) AS n_buckets
      FROM dfs GROUP BY band_id, df ORDER BY band_id, df"""))

  val all: Seq[Q] = Seq(admitQ, bucketStats)
}

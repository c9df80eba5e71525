package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted segment-prevalence index — the production shape of
  * q220's C4/CCNet drop-all boilerplate policy at 100 TB, where global
  * prevalence cannot be recomputed per ingest: the index keeps the
  * distinct (segment-hash, doc_id) pairs seen so far (hashes only,
  * never segment text — the LshBandIndex discipline), nightly batches
  * probe it, and the post-ingest prevalence rule (index docs + batch
  * docs ≥ 2) decides which batch segments are boilerplate. This is
  * the FIFTH index lifecycle next to LshBandIndex / IvfIndex / IvfPq /
  * Bm25Index, with the same contract: build once, probe/admit many,
  * append incrementally with a replay guard, right-to-be-forgotten
  * tombstones applied physically at compact. Storage goes through the
  * [[IndexManifest]] commit layer (immutable segments + one atomic
  * manifest rename per mutation, [[MaintenanceLock]] lease on all
  * maintenance), so every crash state is fully live and recover() is
  * just an orphan vacuum.
  *
  * Unlike the LSH admit there is NO greedy order dependence: drop-all
  * flags every copy symmetrically (a batch-internal pair flags BOTH
  * docs), so admit is a pure join — the property that makes this
  * policy replay- and shard-order-stable. [[graft.streaming.BoilerplateGate]]
  * is the same rule at per-event latency; q220 is the full-corpus
  * batch audit; PrevalenceIndexSpec pins lifecycle == registry (q229).
  */
object PrevalenceIndex {

  /** Doc-local DISTINCT (doc_id, segment-hash) pairs under q220's
    * segment convention ([[Dedup.ParaDelim]]); within-doc repeats are
    * collapsed before anything is counted — prevalence is distinct
    * DOCUMENTS, never instances. */
  private[graft] def segPairs(docs: DataFrame, delim: String): DataFrame =
    docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          split(col("text"), java.util.regex.Pattern.quote(delim), -1),
          p => Dsl.md5h61(p)))).as("h"))

  def build(spark: SparkSession, corpus: DataFrame, indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val seg = IndexManifest.newSegment(spark, indexDir, "segs")(p =>
        segPairs(corpus, Dedup.ParaDelim)
          .repartition(col("h")) // co-locate each segment's postings
          .write.mode("overwrite").parquet(p))
      IndexManifest.commit(spark, indexDir,
        Map("segs" -> Seq(seg), "tombstones" -> Nil))
      IndexManifest.vacuum(spark, indexDir)
      ()
    }

  /** Right-to-be-forgotten: O(batch) tombstones; [[audit]] anti-joins
    * them out of the index side so a forgotten doc stops contributing
    * to prevalence IMMEDIATELY; [[compact]] applies them physically. */
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

  /** The admit audit over explicit pair frames — shared verbatim by
    * the persisted lifecycle ([[probe]]) and the registry twin (q229,
    * where the corpus slice plays the index). Per batch doc: distinct
    * segments, segments boilerplate under the POST-ingest prevalence
    * (live index distinct docs + batch distinct docs ≥ 2), and the
    * ratio. Shapes: two (h)-keyed count aggregates + one equi-join on
    * h + one |batch-docs| rollup — the index side is read as its two
    * narrow columns, never more. */
  private[graft] def audit(batchPairs: DataFrame, indexPairs: DataFrame)
      : DataFrame = {
    val idxCnt = indexPairs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_idx"))
    val batchCnt = batchPairs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_batch"))
    val flagged = batchCnt.join(idxCnt, Seq("h"), "left")
      .filter(coalesce(col("n_idx"), lit(0L)) + col("n_batch") >= 2)
      .select("h")
    val perDoc = batchPairs.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_segs"))
    val boilDoc = batchPairs.join(flagged, Seq("h"))
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_boiler"))
    perDoc.join(boilDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        (coalesce(col("n_boiler"), lit(0L)).cast("double") /
          col("n_segs")).as("boiler_ratio"))
  }

  /** Probe a (doc_id, text) batch against the live index (tombstones
    * honored); no writes. Pairs and tombstones resolve through ONE
    * pinned manifest snapshot (the [[Bm25Index.probe]] discipline). */
  def probe(spark: SparkSession, batch: DataFrame, indexDir: String)
      : DataFrame =
    probeSnapshot(spark, batch, indexDir,
      IndexManifest.snapshot(spark, indexDir))

  /** [[probe]] against an explicitly pinned snapshot. */
  def probeSnapshot(spark: SparkSession, batch: DataFrame,
      indexDir: String, snap: IndexManifest.Snapshot): DataFrame = {
    val idx = minusTombstones(
      IndexManifest.readRequired(spark, indexDir, snap, "segs"),
      IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones"))
    audit(segPairs(batch, Dedup.ParaDelim), idx)
  }

  /** Time-travel probe at manifest `version` — None once vacuumed past
    * the retention horizon (the [[Bm25Index.probeAt]] convention). */
  def probeAt(spark: SparkSession, batch: DataFrame, indexDir: String,
      version: Long): Option[DataFrame] =
    IndexManifest.loadAt(spark, indexDir, version)
      .map(probeSnapshot(spark, batch, indexDir, _))

  /** Incremental append with a doc-granular replay guard: pairs of
    * batch docs whose doc_id the index already holds are skipped (a
    * re-sent shard cannot double-count prevalence), reading ONLY the
    * index's doc_id column for the guard. The new segment is staged
    * and published by one manifest commit — a crashed append leaves
    * only an invisible orphan, and a batch's pairs become visible
    * all-or-nothing. */
  def append(spark: SparkSession, batch: DataFrame, indexDir: String): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val snap = IndexManifest.snapshot(spark, indexDir)
      val known = IndexManifest.readRequired(spark, indexDir, snap, "segs")
        .select("doc_id").distinct()
      val seg = IndexManifest.newSegment(spark, indexDir, "segs")(p =>
        segPairs(batch, Dedup.ParaDelim)
          .join(known, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(p))
      IndexManifest.commit(spark, indexDir,
        snap.tables.updated("segs", snap.segmentsOf("segs") :+ seg))
      IndexManifest.vacuum(spark, indexDir, retainGenerations = 1)
      ()
    }

  /** `retainGenerations` defers the closing vacuum's destructive step
    * for long-running readers — the [[LshBandIndex.compact]] knob. */
  def compact(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Unit =
    compactImpl(spark, indexDir, _ => (), retainGenerations)

  /** [[compact]] with the injectable crash seam ("segs:written"
    * staged-invisible / "committed" / "vacuumed"). The compacted
    * segment and the tombstone clear publish in ONE atomic manifest
    * rename; a crash anywhere leaves the old state fully live and the
    * rerun converges. */
  private[graft] def compactImpl(spark: SparkSession, indexDir: String,
      crashPoint: String => Unit, retainGenerations: Int = 0): Unit =
    MaintenanceLock.withLock(spark, indexDir) {
      val snap = IndexManifest.snapshot(spark, indexDir)
      val ts = IndexManifest.readSnapshot(spark, indexDir, snap, "tombstones")
      val seg = IndexManifest.newSegment(spark, indexDir, "segs")(p =>
        minusTombstones(
          IndexManifest.readRequired(spark, indexDir, snap, "segs"), ts)
          .repartition(col("h"))
          .write.mode("overwrite").parquet(p))
      crashPoint("segs:written")
      IndexManifest.commit(spark, indexDir,
        Map("segs" -> Seq(seg), "tombstones" -> Nil))
      crashPoint("committed")
      IndexManifest.vacuum(spark, indexDir, retainGenerations)
      crashPoint("vacuumed")
      ()
    }

  /** Open-time repair: with the manifest layer a crash leaves only
    * orphans — delegate to [[IndexManifest.vacuum]].
    * `retainGenerations` > 0 keeps that many older generations for
    * still-running readers (the compact knob). */
  def recover(spark: SparkSession, indexDir: String,
      retainGenerations: Int = 0): Boolean =
    MaintenanceLock.withLock(spark, indexDir) {
      IndexManifest.vacuum(spark, indexDir, retainGenerations) > 0
    }

  /** q229: the oracle-checked registry twin of [[probe]]/admit —
    * corpus = doc_id % 10 < 8 plays the persisted index, batch = the
    * rest (the q127/q159 split convention). The registry form
    * recomputes the corpus pairs because the oracle needs
    * self-contained SQL; the lifecycle reads them from parquet, and
    * PrevalenceIndexSpec pins the two paths equal. */
  val admitQ: Q = Q(
    "q229_prevalence_index_admit",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val pairs = graft.CacheScope.cached(
        segPairs(Tables.documents(s, d), Dedup.ParaDelim))
      audit(pairs.filter(col("doc_id") % 10 >= 8),
        pairs.filter(col("doc_id") % 10 < 8))
        .orderBy("doc_id")
    },
    Some {
      val dl = "'" + Dedup.ParaDelim.replace("'", "''") + "'"
      s"""WITH t AS (SELECT doc_id, string_split(text, $dl) AS paras
          FROM documents WHERE doc_id IS NOT NULL),
        px AS MATERIALIZED (SELECT DISTINCT doc_id,
            ${graft.Dsl.sqlMd5h61("paras[i]")} AS h
          FROM t, unnest(generate_series(1, len(paras))) AS u(i)),
        idx AS (SELECT h, count(distinct doc_id) AS n_idx
          FROM px WHERE doc_id % 10 < 8 GROUP BY 1),
        bp AS MATERIALIZED (SELECT * FROM px WHERE doc_id % 10 >= 8),
        bc AS (SELECT h, count(distinct doc_id) AS n_batch
          FROM bp GROUP BY 1),
        fl AS (SELECT bc.h FROM bc LEFT JOIN idx USING (h)
          WHERE coalesce(n_idx, 0) + n_batch >= 2),
        pd AS (SELECT doc_id, cast(count(*) as bigint) AS n_segs
          FROM bp GROUP BY 1),
        bd AS (SELECT doc_id, cast(count(*) as bigint) AS n_boiler
          FROM bp JOIN fl USING (h) GROUP BY 1)
        SELECT pd.doc_id, pd.n_segs,
          coalesce(bd.n_boiler, 0) AS n_boiler,
          cast(coalesce(bd.n_boiler, 0) as double) / pd.n_segs
            AS boiler_ratio
        FROM pd LEFT JOIN bd USING (doc_id) ORDER BY 1"""
    },
    bench = true)

  /** q233 — segment-prevalence HISTOGRAM, the monitoring stats every
    * persisted index here carries (q160 is the LSH twin): how many
    * segments live at prevalence 1, 2, 3, … and how much segment mass
    * each stratum holds. The k=1 row is the healthy tail; mass
    * migrating into k ≥ 2 is template growth — the alarm a corpus
    * team watches between compactions, and the denominator behind
    * q220's drop-ratio forecasts. Count-of-counts discipline (the
    * q182/q215 shape): one groupBy on h, one |strata|-key rollup —
    * the histogram never materializes per-segment rows at the driver.
    * share = one IEEE division of exact integer sums. */
  val histogramQ: Q = Q(
    "q233_prevalence_histogram",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val prev = segPairs(Tables.documents(s, d), Dedup.ParaDelim)
        .groupBy("h").agg(countDistinct(col("doc_id")).as("k"))
      val tot = prev.agg(count(lit(1)).as("n_seg_total"),
        sum(col("k")).as("n_pair_total"))
      prev.groupBy("k")
        .agg(count(lit(1)).cast("long").as("n_segments"))
        .crossJoin(broadcast(tot))
        .select(col("k").cast("long").as("prevalence"),
          col("n_segments"),
          (col("n_segments") * col("k")).cast("long").as("n_pairs"),
          (col("n_segments").cast("double") / col("n_seg_total"))
            .as("seg_share"),
          ((col("n_segments") * col("k")).cast("double") /
            col("n_pair_total")).as("pair_share"))
        .orderBy("prevalence")
    },
    Some {
      val dl = "'" + Dedup.ParaDelim.replace("'", "''") + "'"
      s"""WITH t AS (SELECT doc_id, string_split(text, $dl) AS paras
          FROM documents WHERE doc_id IS NOT NULL),
        px AS (SELECT DISTINCT doc_id, ${graft.Dsl.sqlMd5h61("paras[i]")}
            AS h
          FROM t, unnest(generate_series(1, len(paras))) AS u(i)),
        pv AS MATERIALIZED (SELECT h, count(distinct doc_id) AS k
          FROM px GROUP BY 1),
        tot AS (SELECT cast(count(*) as bigint) AS n_seg_total,
            cast(sum(k) as bigint) AS n_pair_total FROM pv)
        SELECT cast(k as bigint) AS prevalence,
          cast(count(*) as bigint) AS n_segments,
          cast(count(*) * k as bigint) AS n_pairs,
          cast(count(*) as double) / tot.n_seg_total AS seg_share,
          cast(count(*) * k as double) / tot.n_pair_total AS pair_share
        FROM pv, tot
        GROUP BY k, tot.n_seg_total, tot.n_pair_total
        ORDER BY 1"""
    })

  val all: Seq[Q] = Seq(admitQ, histogramQ)
}

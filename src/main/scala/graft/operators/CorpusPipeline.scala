package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._

/** The flagship end-to-end training-corpus cleaning pipeline, composed
  * from the engine's own operators in one plan:
  *
  *   quality filter (token count + type/token ratio)
  *   → exact dedup (normalized-fingerprint, keep min doc_id)
  *   → near-dup removal (MinHash-LSH clusters from [[Dedup]], keep the
  *     longest member per cluster)
  *   → deterministic 80/10/10 split assignment (salted content hash)
  *   → per-split corpus statistics.
  *
  * This is the query a user of the reference would actually run before
  * training: every stage is the oracle-verified building block
  * (q31/q34/q56/q69/q78) chained end to end. Scale shape: the quality
  * filter and split assignment are scan-stage projections; exact dedup
  * is one window on the fingerprint hash; near-dup removal reuses the
  * blocked LSH pair join (never O(n²)); the final stats are one
  * hash-agg over 3 groups.
  */
object CorpusPipeline {
  import Dsl._

  val cleanCorpusStats: Q = Q(
    "q81_corpus_pipeline",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // stage 1: quality filter
      val quality = docs
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")))
        .withColumn("n_uniq", size(array_distinct(col("t"))))
        .filter(col("n_tokens") >= 20 &&
          col("n_uniq").cast("double") / col("n_tokens") >= 0.3)
      // stage 2: exact dedup on the whitespace-normalized fingerprint
      // (explicit Dsl.WsChars class — the Java∩RE2 \s dialect fix)
      val fp = md5(lower(regexp_replace(trim(col("text")), s"[$WsChars]+", " ")).cast("binary"))
      val exactKeep = quality.withColumn("fp", fp)
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      // stage 3: near-dup removal — drop every cluster member except the
      // survivor (longest text, tie → lowest doc_id), q69 semantics
      val members = Dedup.clustersDf(s, d)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
      val survW = Window.partitionBy(col("cluster_root"))
        .orderBy(desc("n_chars"), asc("doc_id"))
      val dropped = members.withColumn("srn", row_number().over(survW))
        .filter(col("srn") =!= 1).select("doc_id")
      val corpus = exactKeep.join(dropped, Seq("doc_id"), "left_anti")
      // stage 4+5: split assignment and per-split stats
      val bucket = md5h61(concat(lit("split:"), col("doc_id").cast("string"))) % 100
      corpus
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE ${Dedup.sqlClustersChain},
      members AS (SELECT c.cluster_root, c.doc_id, d.n_chars
        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
      dropped AS (SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY cluster_root
            ORDER BY n_chars DESC, doc_id) AS srn
          FROM members)
        WHERE srn <> 1),
      q AS (SELECT doc_id, text,
          cast(len(${sqlToks("text")}) as int) AS n_tokens,
          cast(len(list_distinct(${sqlToks("text")})) as int) AS n_uniq
        FROM documents),
      qual AS (SELECT doc_id, text, n_tokens FROM q
        WHERE n_tokens >= 20 AND cast(n_uniq as double) / n_tokens >= 0.3),
      fpk AS (SELECT doc_id, n_tokens,
          row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '[$WsChars]+', ' ', 'g')))
            ORDER BY doc_id) AS rn
        FROM qual),
      corpus AS (SELECT doc_id, n_tokens FROM fpk
        WHERE rn = 1 AND doc_id NOT IN (SELECT doc_id FROM dropped))
      SELECT CASE WHEN ${sqlMd5h61("'split:' || cast(doc_id as varchar)")} % 100 < 80 THEN 'train'
                  WHEN ${sqlMd5h61("'split:' || cast(doc_id as varchar)")} % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split,
        cast(count(*) as bigint) AS n_docs,
        cast(sum(n_tokens) as bigint) AS sum_tokens,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM corpus GROUP BY 1 ORDER BY split"""))

  /** q169 — pipeline funnel audit: docs and tokens SURVIVING each q81
    * stage (raw → quality → exact dedup → near-dup removal), one row
    * per stage. The observability query behind every production corpus
    * build — "where did my corpus go" answered with numbers per stage
    * instead of one end-state count, so a mis-tuned filter (or a dedup
    * stage suddenly eating 40% of tokens) is visible at the stage that
    * caused it.
    *
    * Scale shape: one cached NARROW base frame (doc_id + token counts,
    * never the text) feeds every stage; each stage's row is a
    * map-side-combinable global aggregate (4 scalar rows total); the
    * only non-scan work is q81's own machinery — the fingerprint
    * keep-first and the blocked LSH cluster chain, both already
    * bounded ([[Dedup.clustersDf]]). Stage counts are monotone
    * non-increasing by construction; the spec pins that law and the
    * q81 consistency (stage 3 == the corpus q81 splits). */
  val pipelineFunnel: Q = Q(
    "q169_pipeline_funnel",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val base = graft.CacheScope.cached(docs
        .withColumn("t", toks(col("text")))
        .select(col("doc_id"), col("text"), col("n_chars"),
          size(col("t")).as("n_tokens"),
          size(array_distinct(col("t"))).as("n_uniq")))
      val quality = base.filter(col("n_tokens") >= 20 &&
        col("n_uniq").cast("double") / col("n_tokens") >= 0.3)
      val fp = md5(lower(
        regexp_replace(trim(col("text")), s"[$WsChars]+", " ")).cast("binary"))
      val exactKeep = quality.withColumn("fp", fp)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      val members = Dedup.clustersDf(s, d)
        .join(base.select("doc_id", "n_chars"), "doc_id")
      val survW = Window.partitionBy(col("cluster_root"))
        .orderBy(desc("n_chars"), asc("doc_id"))
      val dropped = members.withColumn("srn", row_number().over(survW))
        .filter(col("srn") =!= 1).select("doc_id")
      val nearKeep = exactKeep.join(dropped, Seq("doc_id"), "left_anti")
      def stageRow(df: org.apache.spark.sql.DataFrame, stage: Int,
          name: String) =
        df.groupBy().agg(
            count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens").cast("long")), lit(0L))
              .as("sum_tokens"))
          .select(lit(stage).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("sum_tokens"))
      stageRow(base, 0, "raw")
        .unionAll(stageRow(quality, 1, "quality"))
        .unionAll(stageRow(exactKeep, 2, "exact_dedup"))
        .unionAll(stageRow(nearKeep, 3, "near_dedup"))
        .orderBy("stage")
    },
    Some(s"""WITH RECURSIVE ${Dedup.sqlClustersChain},
      members AS (SELECT c.cluster_root, c.doc_id, d.n_chars
        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
      dropped AS (SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY cluster_root
            ORDER BY n_chars DESC, doc_id) AS srn
          FROM members)
        WHERE srn <> 1),
      base AS MATERIALIZED (SELECT doc_id, text,
          cast(len(${sqlToks("text")}) as int) AS n_tokens,
          cast(len(list_distinct(${sqlToks("text")})) as int) AS n_uniq
        FROM documents),
      qual AS MATERIALIZED (SELECT doc_id, text, n_tokens FROM base
        WHERE n_tokens >= 20 AND cast(n_uniq as double) / n_tokens >= 0.3),
      fpk AS (SELECT doc_id, n_tokens,
          row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '[$WsChars]+', ' ', 'g')))
            ORDER BY doc_id) AS rn
        FROM qual),
      exact AS MATERIALIZED (SELECT doc_id, n_tokens FROM fpk WHERE rn = 1),
      near AS (SELECT doc_id, n_tokens FROM exact
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
      SELECT * FROM (
        SELECT 0 AS stage, 'raw' AS stage_name,
          cast(count(*) as bigint) AS n_docs,
          cast(coalesce(sum(n_tokens), 0) as bigint) AS sum_tokens FROM base
        UNION ALL
        SELECT 1, 'quality', cast(count(*) as bigint),
          cast(coalesce(sum(n_tokens), 0) as bigint) FROM qual
        UNION ALL
        SELECT 2, 'exact_dedup', cast(count(*) as bigint),
          cast(coalesce(sum(n_tokens), 0) as bigint) FROM exact
        UNION ALL
        SELECT 3, 'near_dedup', cast(count(*) as bigint),
          cast(coalesce(sum(n_tokens), 0) as bigint) FROM near)
      ORDER BY stage"""))

  /** q176 — corpus datasheet (the composition card published WITH a
    * dataset — Gebru et al. 2021's "Datasheets for Datasets" shape, at
    * corpus-stats granularity): one query → (metric, value) rows
    * covering size (docs / tokens / chars), diversity (distinct
    * languages / sources, language entropy), duplication (exact
    * fingerprint dup rate), and length composition (mean tokens, short
    * fraction). The numbers a consumer reads before training on the
    * corpus, emitted by the engine itself so they can never drift from
    * the data.
    *
    * Determinism: every value is either an exact integer in double, or
    * ONE IEEE op over exact integers (mean, rates); language entropy
    * follows the q150 quantization discipline — each lang's
    * −(c/n)·ln(c/n) is floored at 10⁻⁹ FIRST (the ratio is
    * integer-derived and bit-identical; flooring absorbs libm ulp),
    * summed exactly as integers, and reported at that quantization.
    *
    * Scale shape: ONE cached narrow base (never the text past the
    * tokenize/fingerprint projection); the scalar block is a single
    * map-side-combinable aggregate UNPIVOTED via explode(map(...)) —
    * not a union of single-row selects, which would re-run the
    * aggregate per metric; entropy adds one lang-keyed groupBy
    * (|langs| rows) against a 1-row broadcast total. Output is ~10
    * rows at any corpus size. */
  val corpusDatasheet: Q = Q(
    "q176_corpus_datasheet",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val base = graft.CacheScope.cached(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          size(toks(col("text"))).as("n_tokens"),
          md5h61(lower(regexp_replace(trim(col("text")),
            s"[$WsChars]+", " "))).as("fp")))
      val a = base.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        count_distinct(col("fp")).as("n_distinct_fp"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        sum(when(col("n_tokens") < 20, 1L).otherwise(0L)).as("n_short"))
      val scalarRows = a.select(explode(map(
        lit("n_docs"), col("n_docs").cast("double"),
        lit("sum_tokens"), col("sum_tokens").cast("double"),
        lit("sum_chars"), col("sum_chars").cast("double"),
        lit("distinct_langs"), col("n_langs").cast("double"),
        lit("distinct_sources"), col("n_sources").cast("double"),
        lit("mean_tokens"),
          col("sum_tokens").cast("double") / col("n_docs"),
        lit("exact_dup_rate"),
          (col("n_docs") - col("n_distinct_fp")).cast("double") / col("n_docs"),
        lit("short_doc_rate"), col("n_short").cast("double") / col("n_docs")))
        .as(Seq("metric", "value")))
      val total = base.agg(count(lit(1)).as("n"))
      val entropy = base.groupBy("lang").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(total))
        .agg(sum(floor(
          (col("c") / col("n").cast("double")) *
            -log(col("c") / col("n").cast("double")) * 1e9))
          .as("e9"))
        .select(lit("lang_entropy_q9").as("metric"),
          col("e9").cast("double").as("value"))
      scalarRows.unionAll(entropy).orderBy("metric")
    },
    Some(s"""WITH base AS MATERIALIZED (SELECT doc_id, lang, source, n_chars,
          cast(len(${sqlToks("text")}) as int) AS n_tokens,
          ${sqlMd5h61(s"lower(regexp_replace(trim(text), '[$WsChars]+', ' ', 'g'))")}
            AS fp
        FROM documents),
      a AS MATERIALIZED (SELECT
          cast(count(*) as bigint) AS n_docs,
          cast(sum(n_tokens) as bigint) AS sum_tokens,
          cast(sum(n_chars) as bigint) AS sum_chars,
          cast(count(DISTINCT fp) as bigint) AS n_distinct_fp,
          cast(count(DISTINCT lang) as bigint) AS n_langs,
          cast(count(DISTINCT source) as bigint) AS n_sources,
          cast(count(*) FILTER (WHERE n_tokens < 20) as bigint) AS n_short
        FROM base),
      ent AS (SELECT 'lang_entropy_q9' AS metric,
          cast(sum(floor((c / cast(n as double)) *
            -ln(c / cast(n as double)) * 1000000000.0)) as double) AS value
        FROM (SELECT lang, count(*) AS c FROM base GROUP BY lang),
          (SELECT count(*) AS n FROM base))
      SELECT metric, value FROM (
        SELECT 'n_docs' AS metric, cast(n_docs as double) AS value FROM a
        UNION ALL SELECT 'sum_tokens', cast(sum_tokens as double) FROM a
        UNION ALL SELECT 'sum_chars', cast(sum_chars as double) FROM a
        UNION ALL SELECT 'distinct_langs', cast(n_langs as double) FROM a
        UNION ALL SELECT 'distinct_sources', cast(n_sources as double) FROM a
        UNION ALL SELECT 'mean_tokens',
          cast(sum_tokens as double) / n_docs FROM a
        UNION ALL SELECT 'exact_dup_rate',
          cast(n_docs - n_distinct_fp as double) / n_docs FROM a
        UNION ALL SELECT 'short_doc_rate',
          cast(n_short as double) / n_docs FROM a
        UNION ALL SELECT metric, value FROM ent)
      ORDER BY metric"""))

  /** q183 — corpus snapshot diff: added / removed / changed / unchanged
    * between two corpus versions, per source. The operational complement
    * of the q106 checksum: when two 100 TB snapshots DISAGREE, this is
    * the query that says what moved — release-note material for a
    * dataset card, and the admission gate's audit trail.
    *
    * Reference behavior generalized: the reference re-derives its whole
    * frame from scratch every run (feature_extractor.py:47-54 re-globs
    * all batch CSVs and recomputes), so "what changed since yesterday"
    * is unanswerable there; at scale the diff must be computed, not
    * inferred. The two snapshots here are deterministic derivations of
    * the one driver table (prev drops doc_id%17==3, cur drops %19==7
    * and revises the text of %13==5) so the oracle is self-contained.
    *
    * Scale shape: each side is reduced AT THE SCAN to (doc_id, source,
    * row-hash) — the text is hashed in the scan-stage projection and
    * never crosses an exchange; the full-outer join shuffles ~24 bytes
    * a row on the id, and the classification is a post-join projection
    * feeding a |sources|×4-row hash-agg. Any partitioning of either
    * side works; no sort anywhere. */
  val snapshotDiff: Q = {
    def rowHash(text: org.apache.spark.sql.Column) =
      md5h61(concat_ws("|", text, col("lang"), col("source")))
    Q(
      "q183_snapshot_diff",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        val docs = Tables.documents(s, d)
        val prev = docs.filter(col("doc_id") % 17 =!= 3)
          .select(col("doc_id"), col("source").as("p_source"),
            rowHash(col("text")).as("h_prev"))
        val cur = docs.filter(col("doc_id") % 19 =!= 7)
          .select(col("doc_id"), col("source").as("c_source"),
            rowHash(when(col("doc_id") % 13 === 5,
              concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))).as("h_cur"))
        prev.join(cur, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("c_source"), col("p_source")).as("source"),
            when(col("h_prev").isNull, "added")
              .when(col("h_cur").isNull, "removed")
              .when(col("h_prev") =!= col("h_cur"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy("source", "status")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .orderBy("source", "status")
      },
      Some(s"""WITH prev AS MATERIALIZED (SELECT doc_id, source,
            ${sqlMd5h61("concat_ws('|', text, lang, source)")} AS h_prev
          FROM documents WHERE doc_id % 17 <> 3),
        cur AS MATERIALIZED (SELECT doc_id, source,
            ${sqlMd5h61("concat_ws('|', CASE WHEN doc_id % 13 = 5" +
              " THEN text || ' [rev2]' ELSE text END, lang, source)")}
              AS h_cur
          FROM documents WHERE doc_id % 19 <> 7)
        SELECT coalesce(c.source, p.source) AS source,
          CASE WHEN h_prev IS NULL THEN 'added'
               WHEN h_cur IS NULL THEN 'removed'
               WHEN h_prev <> h_cur THEN 'changed'
               ELSE 'unchanged' END AS status,
          cast(count(*) as bigint) AS n_docs,
          cast(sum(doc_id) as bigint) AS id_sum
        FROM prev p FULL OUTER JOIN cur c USING (doc_id)
        GROUP BY 1, 2 ORDER BY 1, 2"""))
  }

  val all: Seq[Q] =
    Seq(cleanCorpusStats, pipelineFunnel, corpusDatasheet, snapshotDiff)
}

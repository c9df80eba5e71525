package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / split-assignment operators for the
  * training-data pipeline surface: content-hash sampling (the
  * reproducible alternative to `df.sample`, whose output depends on
  * partitioning), stratified train/valid/test split assignment, and
  * per-group quota sampling.
  *
  * All three key off the shared 61-bit md5 hash ([[Dsl.md5h61]]) with a
  * purpose salt, so (a) the sample is a pure function of row content —
  * stable across reruns, partitionings, and engines — and (b) different
  * salts give independent samples. This is how a 100 TB pipeline pins
  * held-out splits: no state, no shuffle for the assignment itself, the
  * filter pushes into the scan stage.
  */
object Sampling {
  import Dsl._

  /** 0..99 bucket from the salted content hash (per-row projection). */
  private def pctBucket(salt: String, key: org.apache.spark.sql.Column) =
    md5h61(concat(lit(salt + ":"), key.cast("string"))) % 100

  private def sqlPctBucket(salt: String, key: String): String =
    s"${sqlMd5h61(s"'$salt:' || cast($key as varchar)")} % 100"

  /** q77: deterministic 5% sample of orders by content hash — same rows
    * on every run at every parallelism (unlike `sample()`, which is
    * seed+partition dependent). The predicate is a scan-stage filter:
    * nothing shuffles to take a sample. */
  val hashSample: Q = Q(
    "q77_hash_sample",
    (s, d) => Tables.orders(s, d)
      .filter(pctBucket("sample", col("o_orderkey")) < 5)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey"),
    Some(s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE ${sqlPctBucket("sample", "o_orderkey")} < 5
      ORDER BY o_orderkey"""))

  /** q78: stratified train/valid/test split assignment (80/10/10 by
    * doc_id hash) with per-(lang, split) counts — the reproducible
    * split bookkeeping every training pipeline needs. Assignment is a
    * per-row projection; only the audit count aggregates. */
  val stratifiedSplit: Q = Q(
    "q78_stratified_split",
    (s, d) => {
      val bucket = pctBucket("split", col("doc_id"))
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("lang", "split")
    },
    Some(s"""SELECT lang,
      CASE WHEN ${sqlPctBucket("split", "doc_id")} < 80 THEN 'train'
           WHEN ${sqlPctBucket("split", "doc_id")} < 90 THEN 'valid'
           ELSE 'test' END AS split,
      cast(count(*) as bigint) AS n_docs, min(doc_id) AS first_doc
      FROM documents GROUP BY 1, 2 ORDER BY lang, split"""))

  /** q79: per-group quota sample — k=3 docs per language, picked by
    * hash order (deterministic "random" representatives per stratum).
    * The row_number-over-window + rn<=k shape is exactly what the
    * custom TopKPerGroup strategy rewrites into a bounded-heap exec:
    * O(groups x k) memory, no per-group full sort. */
  val groupQuotaSample: Q = Q(
    "q79_group_quota_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5h61(concat(lit("quota:"), col("doc_id").cast("string"))).asc,
          col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rn")
    },
    Some(s"""WITH ranked AS (SELECT lang, doc_id, n_chars,
        row_number() OVER (PARTITION BY lang
          ORDER BY ${sqlMd5h61("'quota:' || cast(doc_id as varchar)")}, doc_id) AS rn
      FROM documents)
      SELECT lang, cast(rn as int) AS rn, doc_id, n_chars FROM ranked
      WHERE rn <= 3 ORDER BY lang, rn"""))

  /** q126: temperature-balanced corpus sampling (α = 0.5) — the
    * standard LLM-mix flattening: kept docs per language ∝ n^α, so
    * dominant languages are downweighted and the smallest keeps 100%.
    * α is fixed at 0.5 because `sqrt` is IEEE-correctly-rounded on both
    * engines (an arbitrary `pow` is not) — keep probability
    * sqrt(n_min/n_lang) quantized to a millionth and compared against
    * the salted content hash: deterministic, partitioning-independent,
    * and a per-row scan filter (the only aggregates are the tiny
    * per-language counts). Output is the per-language audit. */
  val temperatureSample: Q = Q(
    "q126_temperature_sample",
    (s, d) => {
      // the explicit isNotNull keeps the two counts branches (broadcast
      // join + n_min) canonically equal — the join pushes
      // isnotnull(lang) into only its own branch's scan otherwise, and
      // the counts aggregate then runs twice (the q133 reuse trap)
      val docs = Tables.documents(s, d).select("doc_id", "lang")
        .filter(col("lang").isNotNull)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val nmin = counts.agg(min("n_before").as("n_min"))
      docs.join(broadcast(counts), "lang")
        .crossJoin(broadcast(nmin))
        .filter(
          md5h61(concat(lit("tsamp:"), col("doc_id").cast("string"))) % 1000000 <
            floor(sqrt(col("n_min").cast("double") / col("n_before")) * 1000000)
              .cast("long"))
        .groupBy("lang", "n_before")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },
    Some(s"""WITH counts AS (
        SELECT lang, count(*) AS n_before FROM documents
        WHERE lang IS NOT NULL GROUP BY lang),
      m AS (SELECT min(n_before) AS n_min FROM counts),
      kept AS (SELECT d.lang, c.n_before
        FROM documents d JOIN counts c ON d.lang = c.lang, m
        WHERE ${sqlMd5h61("concat('tsamp:', cast(doc_id as varchar))")} % 1000000 <
          cast(floor(sqrt(cast(m.n_min as double) / c.n_before) * 1000000) as bigint))
      SELECT lang, n_before, count(*) AS n_kept FROM kept
      GROUP BY lang, n_before ORDER BY lang"""))

  // ------------------------------------------------------------------
  // q153 — DSIR-style importance resampling (Xie et al. 2023: score
  // each doc with hashed-ngram importance weights log p_target(b) −
  // log p_source(b), then resample proportionally to importance). The
  // weight table is PINNED (the q98b/q148 fixed-artifact discipline —
  // in production the target/source ratios are estimated once and
  // shipped as a broadcast constant; pinned literals make the whole
  // operator DuckDB-replicable) and the resampling coin is
  // hash-derived (the q77 discipline — no rand(), same rows at every
  // parallelism).
  //
  // Determinism without quantization: the B=64 bucket weights are
  // DYADIC rationals (k/16, k ∈ [−32, 32]) — every per-gram term and
  // every partial sum is exact in IEEE double (all values are
  // multiples of 1/16 far below the 2^53 mantissa bound), so the
  // per-doc sum is order-independent BY CONSTRUCTION and the final
  // avg is one division of identical operands on both engines — no
  // libm, no rounding knobs (cf. q150, which needs integer
  // quantization because ln() is not exact).
  //
  // Importance-proportional acceptance, integer-only: the score is
  // banded and each band has a pinned acceptance threshold out of 16
  // (≥0.25 → keep all; [0, 0.25) → 8/16; [−0.25, 0) → 4/16; below →
  // 1/16); a doc is kept iff its salted 61-bit hash mod 16 clears the
  // band threshold. Scale shape: the entire operator is ONE per-row
  // projection + filter inside whole-stage codegen — featurize, score,
  // band, coin, accept all happen in the scan stage; nothing shuffles
  // to take the sample (the output ORDER BY is presentational).
  // ------------------------------------------------------------------
  private val DsirB = 64
  private[graft] val dsirW: Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until DsirB).map { b =>
      val h = java.nio.ByteBuffer
        .wrap(md.digest(s"dsir-w:$b".getBytes("UTF-8"))).getLong
      (math.floorMod(h, 65L) - 32L) / 16.0
    }
  }

  val dsirResample: Q = Q(
    "q153_dsir_resample",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      // Two hard-won evaluation-cost rules (tools/Q153Prof dissection,
      // 9.7 s -> 0.3 s at sf0.1):
      //  1. ONE array Literal (typedlit), never array(lit, ...) inside
      //     a lambda: ConstantFolding does not collapse a foldable
      //     CreateArray there, so the element-wise form rebuilds the
      //     64-element array on EVERY gram evaluation.
      //  2. Bind the token array as a LAMBDA VARIABLE, not a projected
      //     column: PushDownPredicates inlines column aliases through
      //     projections with no cheap-expression guard, so a filter on
      //     the score substitutes split(text) into every bigram
      //     lambda element — O(tokens²) re-tokenization per doc. A
      //     lambda binding cannot be torn apart by alias inlining; the
      //     split stays once-per-doc wherever the expression lands.
      val W = typedlit(dsirW)
      def statsOf(text: Column): Column = element_at(
        transform(array(toks(lower(text))), tv => {
          // guarded bigram index — Spark sequence(1, 0) counts DOWN
          val bi = when(size(tv) >= 2,
            transform(sequence(lit(1), size(tv) - 1),
              i => concat_ws(" ", element_at(tv, i), element_at(tv, i + 1))))
            .otherwise(array().cast("array<string>"))
          element_at(transform(array(concat(tv, bi)), gv =>
            struct(
              (aggregate(transform(gv, g =>
                element_at(W,
                  (md5h61(concat(lit("dsirg:"), g)) % DsirB).cast("int") + 1)),
                lit(0.0), (a, x) => a + x) / size(gv)).as("iscore"),
              size(gv).as("n_grams"))), 1)
        }), 1)
      // accept iff coin < rate(iscore); rewritten with ONE iscore
      // reference — iscore >= threshold(coin) — so the pushed filter
      // evaluates the scoring tree once per row, not once per CASE arm
      val coin =
        md5h61(concat(lit("dsirs:"), col("doc_id").cast("string"))) % 16
      // scale-adaptive spread: the scoring tree below is the whole cost
      // and would otherwise run on the single-row-group scan's ONE task
      // locally; a no-op at scale (see Dsl.spreadIfNarrow). When the
      // spread fires, the scored frame is pinned with a localCheckpoint
      // BARRIER: PushDownPredicates would otherwise push the acceptance
      // filter (which inlines the whole scoring tree) below the spread
      // exchange back onto the 1-task scan — scoring would run TWICE,
      // once serialized (measured: the pushed plan re-evaluated the
      // aggregate tree in the scan-stage Filter). At scale neither the
      // spread nor the barrier exists and the filter+projection share
      // one scan stage (subexpression-eliminated) exactly as before.
      val src = Tables.documents(s, d)
      val spread = spreadIfNarrow(src, col("doc_id"))
      val scored0 = spread
        .withColumn("st", statsOf(col("text")))
        .withColumn("coin", coin)
        // prune before the barrier: the checkpoint must hold the three
        // consumed columns, never the text payload
        .select("doc_id", "st", "coin")
      val scored = if (spread eq src) scored0 else scored0.localCheckpoint()
      scored
        .filter(col("st.iscore") >=
          when(col("coin") < 1, Double.NegativeInfinity)
            .when(col("coin") < 4, -0.25)
            .when(col("coin") < 8, 0.0).otherwise(0.25))
        .withColumn("iscore", col("st.iscore"))
        .select(col("doc_id"), col("st.n_grams").as("n_grams"),
          col("iscore"),
          when(col("iscore") >= 0.25, 16).when(col("iscore") >= 0.0, 8)
            .when(col("iscore") >= -0.25, 4).otherwise(1).as("rate"),
          col("coin"))
        .orderBy("doc_id")
    },
    Some {
      val w = dsirW.map(v => s"$v").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, ${sqlToks("lower(text)")} AS t
          FROM documents),
        g AS (SELECT doc_id, list_concat(t,
            CASE WHEN len(t) >= 2 THEN list_transform(
              generate_series(1, len(t) - 1),
              i -> concat_ws(' ', t[i], t[i+1])) ELSE [] END) AS grams
          FROM t),
        sc AS (SELECT doc_id, cast(len(grams) as int) AS n_grams,
            list_sum(list_transform(grams, g ->
              ($w::double[])[(${sqlMd5h61("'dsirg:' || g")} % $DsirB) + 1]))
              / len(grams) AS iscore
          FROM g),
        r AS (SELECT doc_id, n_grams, iscore,
            CASE WHEN iscore >= 0.25 THEN 16 WHEN iscore >= 0.0 THEN 8
                 WHEN iscore >= -0.25 THEN 4 ELSE 1 END AS rate,
            ${sqlMd5h61("'dsirs:' || cast(doc_id as varchar)")} % 16 AS coin
          FROM sc)
        SELECT doc_id, n_grams, iscore, rate, coin FROM r
        WHERE coin < rate ORDER BY doc_id"""
    },
    bench = true)

  // ------------------------------------------------------------------
  // q154 — budget-constrained mixture sampling: the "hit a target
  // source mix under a token budget" solver every training-mix recipe
  // needs (Dolma/FineWeb-style: q87 REPORTS the mix, q126 flattens it
  // by sqrt, q153 reweights by importance — this one solves for
  // per-source keep rates). Each source gets a PINNED mixing weight
  // (hash-derived 1..5 — in production these are the recipe's target
  // shares, a broadcast constant); the token budget is half the
  // corpus; a source's keep rate is min(1, its budget share / its
  // available tokens) and docs are admitted by the q77 hash gate.
  //
  // Determinism: the ENTIRE computation is integer arithmetic — token
  // counts, weights, want = (B·w) div W, rate_ppm (saturates at 10⁶
  // when want ≥ avail; otherwise (want·10⁶) div avail computed in
  // decimal(38,0)/HUGEINT so the multiply is exact PAST the ~9.2e12-
  // token point where a 64-bit product would wrap — the 100 TB design
  // point), and the coin — so both engines agree bit-for-bit with no
  // float knobs at all (stronger than q126's quantized sqrt). The budget is met in expectation per source
  // (hash sampling); undersized sources saturate at rate 10⁶ and the
  // audit makes the shortfall visible (tokens_kept vs want).
  //
  // Scale shape: one narrow per-doc projection (source, n_tokens,
  // coin), a per-source aggregate (map-side partials, |sources| rows),
  // a 1-row totals broadcast, and the admission filter is a per-row
  // comparison against the |sources|-row broadcast rate table —
  // nothing but the two tiny aggregates shuffles. documents is read
  // twice in different ROLES (stats pass vs admission pass — the q126
  // shape, triaged in the scan-allowance sweep).
  // ------------------------------------------------------------------
  val budgetMix: Q = Q(
    "q154_budget_mix",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val docs = Tables.documents(s, d)
        .select(col("source"),
          size(toks(col("text"))).cast("long").as("ntok"),
          (md5h61(concat(lit("mixkeep:"), col("doc_id").cast("string")))
            % 1000000L).as("coin"))
      val weight = (md5h61(concat(lit("mixw:"), col("source"))) % 5L + 1L)
        .as("weight")
      // |sources|-row frame consumed four ways (totals, rate table,
      // admission broadcast, final audit join): cache it so documents
      // is scanned once for the stats pass + once for the admission
      // pass, not once per consumer (ReuseAudit: 4 -> 2)
      val perSrc = graft.CacheScope.cached(docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens_avail"))
        .withColumn("weight", weight))
      val totals = perSrc.agg(
        sum(col("tokens_avail")).as("total_tokens"),
        sum(col("weight")).as("w_total"))
      val rates = perSrc.crossJoin(broadcast(totals))
        .withColumn("want",
          expr("((total_tokens div 2) * weight) div w_total"))
        .withColumn("rate_ppm",
          when(col("want") >= col("tokens_avail"), lit(1000000L))
            .otherwise(expr(
              "(cast(want as decimal(38,0)) * 1000000) div tokens_avail")))
        .select("source", "weight", "n_docs", "tokens_avail", "want",
          "rate_ppm")
      val kept = docs.join(broadcast(rates.select("source", "rate_ppm")),
          "source")
        .filter(col("coin") < col("rate_ppm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("tokens_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("weight"), col("n_docs"),
          col("tokens_avail"), col("want"), col("rate_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
        .orderBy("source")
    },
    Some(s"""WITH docs AS (SELECT source,
          cast(len(${sqlToks("text")}) as bigint) AS ntok,
          ${sqlMd5h61("'mixkeep:' || cast(doc_id as varchar)")} % 1000000
            AS coin
        FROM documents),
      per_src AS (SELECT source, cast(count(*) as bigint) AS n_docs,
          sum(ntok) AS tokens_avail,
          ${sqlMd5h61("'mixw:' || source")} % 5 + 1 AS weight
        FROM docs GROUP BY source),
      totals AS (SELECT sum(tokens_avail) AS total_tokens,
          sum(weight) AS w_total FROM per_src),
      wants AS (SELECT source, weight, n_docs, tokens_avail,
          ((total_tokens // 2) * weight) // w_total AS want
        FROM per_src, totals),
      rates AS (SELECT source, weight, n_docs, tokens_avail, want,
          CASE WHEN want >= tokens_avail THEN 1000000
               ELSE cast((want::HUGEINT * 1000000) // tokens_avail
                 AS bigint) END AS rate_ppm
        FROM wants),
      kept AS (SELECT d.source, cast(count(*) as bigint) AS n_kept,
          sum(d.ntok) AS tokens_kept
        FROM docs d JOIN rates r ON d.source = r.source
        WHERE d.coin < r.rate_ppm GROUP BY d.source)
      SELECT r.source, cast(r.weight as bigint) AS weight, r.n_docs,
        cast(r.tokens_avail as bigint) AS tokens_avail,
        cast(r.want as bigint) AS want, cast(r.rate_ppm as bigint)
          AS rate_ppm,
        coalesce(k.n_kept, 0) AS n_kept,
        cast(coalesce(k.tokens_kept, 0) as bigint) AS tokens_kept
      FROM rates r LEFT JOIN kept k ON r.source = k.source
      ORDER BY r.source"""))

  /** Epoch count / shard fanout for [[epochShuffle]]. Production runs
    * use thousands of shards; the mechanics are shard-count
    * independent. */
  private val Epochs = 3
  private val ShuffleShards = 8

  // ------------------------------------------------------------------
  // q166 — deterministic multi-epoch training order: the dataloader
  // shape for multi-epoch pretraining. Epoch e's read order must be a
  // fresh pseudorandom permutation of the corpus — reproducible from
  // nothing but (doc_id, e), because a 100 TB run can never
  // materialize (or re-consult) a stored permutation, and any worker
  // must be able to recompute its own shard's order after preemption.
  // Position key = md5h61(doc_id ":" epoch): a new independent order
  // per epoch ([[Sampling]]'s salt discipline, the epoch IS the salt);
  // shard = key % ShuffleShards, so each worker reads its shard in
  // (key, doc_id) order. The only window is row_number per
  // (epoch, shard) — partitioned exactly like the workers consume it,
  // never a global sort (q115's packing argument); at scale each
  // shard's order materializes independently, and the sequence column
  // makes resume-from-step-N a range predicate.
  // ------------------------------------------------------------------
  val epochShuffle: Q = Q(
    "q166_epoch_shuffle",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.documents(s, d).select(col("doc_id"))
        .select(col("doc_id"),
          explode(array((0 until Epochs).map(lit(_)): _*)).as("epoch"))
      val keyed = e.select(col("doc_id"), col("epoch"),
        md5h61(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))).as("pos"))
      keyed
        .select(col("doc_id"), col("epoch"),
          (col("pos") % ShuffleShards).as("shard"), col("pos"))
        .withColumn("seq", row_number().over(
          Window.partitionBy("epoch", "shard")
            .orderBy(col("pos"), col("doc_id"))))
        .select(col("epoch"), col("shard"), col("seq"), col("doc_id"))
        .orderBy("epoch", "shard", "seq")
    },
    Some(s"""WITH e AS (SELECT doc_id, epoch
        FROM documents,
          (SELECT unnest(generate_series(0, ${Epochs - 1})) AS epoch)),
      k AS (SELECT doc_id, epoch,
        ${sqlMd5h61("cast(doc_id as varchar) || ':' || cast(epoch as varchar)")}
          AS pos FROM e)
      SELECT cast(epoch as int) AS epoch,
        pos % $ShuffleShards AS shard,
        cast(row_number() OVER (PARTITION BY epoch, pos % $ShuffleShards
          ORDER BY pos, doc_id) as int) AS seq,
        doc_id
      FROM k ORDER BY epoch, shard, seq"""))

  /** q177 — source-balanced deterministic interleave: the dataloader
    * read order that surfaces every source at roughly EQUAL rate
    * regardless of how skewed the corpus is (the uniform-mixture
    * counterpart of q154's token budgets and q166's per-epoch
    * shuffle). Each doc draws a deterministic exponential clock with
    * rate 1/n_source — the Efraimidis–Spirakis weighted-order idea
    * with weight 1/n_s, so P(doc arrives next) ∝ 1/n_s and any prefix
    * of the stream is near-uniform across sources while docs WITHIN a
    * source arrive in hash-shuffled order.
    *
    * Determinism discipline: u = (md5h61(salt‖doc_id)+1)/2^61 is an
    * identical IEEE double on both engines; −ln(u) is floored at 10⁻⁶
    * FIRST (the q150 quantization discipline absorbs libm ulp), giving
    * an exact integer clock ≤ ~4.3·10⁷; the 1/n_s rate is applied as
    * an EXACT integer multiply clock·n_s (never a division), so the
    * full ordering key is integer arithmetic with a doc_id tie-break —
    * and stays within int64 for per-source counts up to ~2·10¹¹ (a
    * 100 TB corpus is ~10¹⁰ docs), which is why the clock is q6, not
    * q9.
    *
    * Scale shape: per-source counts are one map-combinable groupBy
    * broadcast back (|sources| rows); the clock is a scan-local
    * projection; the "first 200 of the stream" is
    * TakeOrderedAndProject (no global sort materializes); the
    * row_number ranks a 200-row post-limit frame. */
  val sourceInterleave: Q = Q(
    "q177_source_interleave",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.TextFunctions.register(s)
      // isNotNull on the SHARED source (the q126 discipline): the
      // broadcast join would otherwise infer isnotnull(source) into
      // only its own branch's scan and split the exchange ns hangs off
      val docs = Tables.documents(s, d).select("doc_id", "source")
        .filter(col("source").isNotNull)
      val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      val keyed = docs.join(broadcast(ns), "source")
        .withColumn("h",
          md5h61(concat(lit("mix:"), col("doc_id").cast("string"))))
        .withColumn("clock_q6",
          floor(-log((col("h") + 1).cast("double") / lit(Dsl.H61Mod))
            * 1e6).cast("long"))
        .withColumn("okey", col("clock_q6") * col("n_s"))
      val top = keyed
        .orderBy(col("okey"), col("doc_id"))
        .limit(200)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("okey"), col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("source"), col("okey"))
        .orderBy("rank")
    },
    Some(s"""WITH ns AS (SELECT source, count(*) AS n_s
        FROM documents GROUP BY source),
      keyed AS (SELECT d.doc_id, d.source,
          cast(floor(-ln(cast(${sqlMd5h61("concat('mix:', cast(d.doc_id as varchar))")} + 1
            as double) / ${Dsl.H61Mod}) * 1000000.0) as bigint) * n_s
            AS okey
        FROM documents d JOIN ns USING (source)),
      top AS (SELECT doc_id, source, okey FROM keyed
        ORDER BY okey, doc_id LIMIT 200)
      SELECT cast(row_number() OVER (ORDER BY okey, doc_id) as int) AS rank,
        doc_id, source, okey
      FROM top ORDER BY rank"""))

  // ------------------------------------------------------------------
  // q204 — DATA-CONSTRAINED token accounting (Muennighoff et al. 2023,
  // "Scaling Data-Constrained Language Models"): when the target
  // mixture wants more tokens from a source than it has UNIQUE tokens,
  // the source gets repeated for multiple epochs — and repeated tokens
  // are worth less. This audit answers, per source, under a UNIFORM
  // target mixture at budget B = 2 × Σ unique tokens (both pinned
  // audit parameters — in production the recipe's shares go here):
  // how many epochs does the allocation force, and what
  // effective-token mass does it actually buy?
  //
  // Unique mass U_s comes from exact within-source dedup (the q35
  // content-hash convention — identical text ⇒ identical ntok, so
  // min(ntok) per hash IS the value). Epoch k's tokens are valued at
  // 2⁻ᵏ via integer right-shift — a PINNED dyadic decay standing in
  // for the paper's fitted repeated-epoch decay (their finding:
  // value ≈ 0 past ~16 epochs; the 40-epoch horizon caps the explode
  // and drops only mass below U >> 40). effective = Σ_{k<e_full}
  // (U >> k) + (rem >> e_full) where alloc = e_full·U + rem — every
  // step integer `div`/`%`/`>>`, no float until the single final
  // efficiency division (both engines divide the same two integers).
  //
  // Scale shape: ONE documents scan → (source, hash) partial agg →
  // |sources|-row cached frame; everything downstream (totals, the
  // ≤41-element epoch explode, the audit join) is |sources|-scale.
  // Never a window, never a second corpus pass.
  // ------------------------------------------------------------------
  val dataConstrained: Q = Q(
    "q204_data_constrained",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val docs = Tables.documents(s, d)
        .select(col("source"), md5h61(col("text")).as("h"),
          size(toks(col("text"))).cast("long").as("ntok"))
      val uniq = docs.groupBy("source", "h")
        .agg(min(col("ntok")).as("ntok"), count(lit(1)).as("n_copies"))
      val perSrc = graft.CacheScope.cached(uniq.groupBy("source")
        .agg(sum(col("n_copies")).as("n_docs"),
          count(lit(1)).as("n_unique"),
          sum(col("ntok")).as("u_tokens"))
        .filter(col("u_tokens") > 0))
      val totals = perSrc.agg(sum(col("u_tokens")).as("u_total"),
        count(lit(1)).as("n_sources"))
      val base = perSrc.crossJoin(broadcast(totals))
        .withColumn("alloc", expr("(2 * u_total) div n_sources"))
        .withColumn("e_full", expr("alloc div u_tokens"))
        .withColumn("rem", expr("alloc % u_tokens"))
      val eff = base
        .select(col("source"), col("u_tokens"), col("e_full"), col("rem"),
          explode(expr("sequence(cast(0 as bigint), " +
            "least(e_full, cast(40 as bigint)))")).as("k"))
        .select(col("source"),
          when(col("k") < col("e_full"),
            expr("shiftright(u_tokens, cast(k as int))"))
            .otherwise(expr("shiftright(rem, cast(k as int))")).as("c"))
        .groupBy("source").agg(sum(col("c")).as("effective_tokens"))
      base.join(eff, "source")
        .select(col("source"), col("n_docs"), col("n_unique"),
          col("u_tokens"), col("alloc"),
          (col("e_full") + when(col("rem") > 0, lit(1L)).otherwise(lit(0L)))
            .as("epochs"),
          col("effective_tokens"),
          when(col("alloc") > 0,
            col("effective_tokens").cast("double") / col("alloc"))
            .otherwise(lit(0.0)).as("efficiency"))
        .orderBy("source")
    },
    Some(s"""WITH docs AS MATERIALIZED (SELECT source,
          ${sqlMd5h61("text")} AS h,
          cast(len(${sqlToks("text")}) as bigint) AS ntok
        FROM documents),
      uniq AS (SELECT source, h, min(ntok) AS ntok,
          count(*) AS n_copies
        FROM docs GROUP BY 1, 2),
      per_src AS MATERIALIZED (SELECT source,
          cast(sum(n_copies) as bigint) AS n_docs,
          cast(count(*) as bigint) AS n_unique,
          cast(sum(ntok) as bigint) AS u_tokens
        FROM uniq GROUP BY 1 HAVING sum(ntok) > 0),
      totals AS (SELECT cast(sum(u_tokens) as bigint) AS u_total,
          cast(count(*) as bigint) AS n_sources FROM per_src),
      base AS MATERIALIZED (SELECT source, n_docs, n_unique, u_tokens,
          (2 * u_total) // n_sources AS alloc,
          ((2 * u_total) // n_sources) // u_tokens AS e_full,
          ((2 * u_total) // n_sources) % u_tokens AS rem
        FROM per_src, totals),
      ks AS (SELECT source, u_tokens, e_full, rem,
          unnest(generate_series(0::BIGINT, least(e_full, 40))) AS k
        FROM base),
      eff AS (SELECT source, cast(sum(CASE WHEN k < e_full
            THEN u_tokens >> k ELSE rem >> k END) as bigint)
            AS effective_tokens
        FROM ks GROUP BY 1)
      SELECT b.source, b.n_docs, b.n_unique, b.u_tokens, b.alloc,
        cast(b.e_full + CASE WHEN b.rem > 0 THEN 1 ELSE 0 END as bigint)
          AS epochs,
        e.effective_tokens,
        CASE WHEN b.alloc > 0
          THEN cast(e.effective_tokens as double) / b.alloc
          ELSE 0.0 END AS efficiency
      FROM base b JOIN eff e USING (source)
      ORDER BY b.source"""))

  // ------------------------------------------------------------------
  // q214 — WATER-FILLING mixture allocation: split a token budget
  // B = total div 2 across sources as EQUALLY as possible subject to
  // each source's availability cap — the classic max-min fair
  // allocation (the "balanced mixture with small-source caps" solve
  // that q154's proportional-rate form cannot express: there a tiny
  // source saturates and its unused share is silently lost; here it
  // redistributes to the unsaturated sources, which is what a
  // balanced-mixture recipe actually wants).
  //
  // Closed form, no iteration: sort sources by availability ascending
  // (tie: source name); source i saturates iff
  // P_{i−1} + a_i·(n−i+1) ≤ B (the feasibility of lifting everyone to
  // a_i) — the saturated set is a PREFIX of the sort order, so the
  // water level L = (B − Σ_sat avail) div (n − k) and the remainder
  // goes +1 to the first `rem` unsaturated sources in sort order
  // (deterministic). Every step is exact integer arithmetic on
  // non-negative values (no div/floor divergence risk); Σ alloc = B
  // EXACTLY (spec law), alloc ≤ avail always.
  //
  // Scale shape: one tokenize scan → |sources|-row aggregate; the sort
  // window runs over |sources| rows, never docs; the saturated-set
  // aggregate is a 1-row broadcast. Output |sources| rows.
  // ------------------------------------------------------------------
  val waterfillMix: Q = Q(
    "q214_waterfill_mix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.TextFunctions.register(s)
      val srcs = Tables.documents(s, d)
        .select(col("source"), size(toks(col("text"))).cast("long").as("ntok"))
        .groupBy("source").agg(sum(col("ntok")).as("avail"))
      val tot = srcs.agg(sum(col("avail")).as("total"),
        count(lit(1)).as("n"))
      val ord = Window.orderBy(col("avail"), col("source"))
      val g = graft.CacheScope.cached(srcs.crossJoin(broadcast(tot))
        .withColumn("b", expr("total div 2"))
        .withColumn("i", row_number().over(ord).cast("long"))
        .withColumn("pprev", coalesce(sum(col("avail")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("sat",
          col("pprev") + col("avail") * (col("n") - col("i") + 1) <= col("b")))
      val sat = g.filter(col("sat"))
        .agg(count(lit(1)).as("kk"),
          coalesce(sum(col("avail")), lit(0L)).as("psat"))
      g.crossJoin(broadcast(sat))
        .withColumn("level", expr("(b - psat) div (n - kk)"))
        .withColumn("rem", expr("(b - psat) % (n - kk)"))
        .withColumn("alloc", when(col("sat"), col("avail"))
          .otherwise(col("level") +
            when(col("i") - col("kk") <= col("rem"), 1L).otherwise(0L)))
        .select(col("source"), col("avail"), col("sat").as("saturated"),
          col("alloc"), col("level"))
        .orderBy("source")
    },
    Some(s"""WITH srcs AS MATERIALIZED (SELECT source,
          cast(sum(ntok) as bigint) AS avail
        FROM (SELECT source, cast(len(${sqlToks("text")}) as bigint)
            AS ntok FROM documents)
        GROUP BY 1),
      tot AS (SELECT cast(sum(avail) as bigint) AS total,
          cast(count(*) as bigint) AS n FROM srcs),
      g AS MATERIALIZED (SELECT s.source, s.avail, t.n,
          t.total // 2 AS b,
          cast(row_number() OVER (ORDER BY s.avail, s.source) as bigint)
            AS i,
          cast(coalesce(sum(s.avail) OVER (ORDER BY s.avail, s.source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            as bigint) AS pprev
        FROM srcs s CROSS JOIN tot t),
      g2 AS MATERIALIZED (SELECT *,
          pprev + avail * (n - i + 1) <= b AS sat FROM g),
      k AS (SELECT cast(count(*) FILTER (WHERE sat) as bigint) AS kk,
          cast(coalesce(sum(avail) FILTER (WHERE sat), 0) as bigint)
            AS psat
        FROM g2)
      SELECT g2.source, g2.avail, g2.sat AS saturated,
        cast(CASE WHEN g2.sat THEN g2.avail
          ELSE (g2.b - k.psat) // (g2.n - k.kk)
            + CASE WHEN g2.i - k.kk <= (g2.b - k.psat) % (g2.n - k.kk)
              THEN 1 ELSE 0 END
          END as bigint) AS alloc,
        cast((g2.b - k.psat) // (g2.n - k.kk) as bigint) AS level
      FROM g2 CROSS JOIN k
      ORDER BY g2.source"""))

  val all: Seq[Q] = Seq(hashSample, stratifiedSplit, groupQuotaSample,
    temperatureSample, dsirResample, budgetMix, epochShuffle,
    sourceInterleave, dataConstrained, waterfillMix)
}

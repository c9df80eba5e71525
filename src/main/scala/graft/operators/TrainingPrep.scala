package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators beyond the reference's surface
  * (builder brief: "operations a large-scale training-data pipeline would
  * need"): sliding-window chunking, PII redaction, test-set contamination
  * checks, salient-term extraction (tf-idf-ish), bigram association
  * mining, corpus-mix reporting, length bucketing, and a salted join for
  * known-skew keys.
  *
  * Scale notes (100 TB framing):
  *  - every pairwise/join stage keys on a content-derived equi-join column
  *    (shingle hash, word, bucket) — never all-pairs;
  *  - chunking/scrubbing are linear per-row maps inside whole-stage
  *    codegen; explode fan-out is bounded (chunks ≈ tokens/stride);
  *  - corpus-scalar joins (doc count, token totals) broadcast one row;
  *  - all doubles are produced by the same literal IEEE expression tree on
  *    both engines so the DuckDB oracle hash-matches exactly (see [[Dsl]]).
  */
object TrainingPrep {
  import Dsl._

  // ------------------------------------------------------------------
  // q82 — sliding-window token chunking (LLM context packing prep).
  // Window = 32 tokens, stride = 24 (8-token overlap), per-chunk content
  // hash for downstream chunk-level dedup.
  // ------------------------------------------------------------------
  private val ChunkLen = 32
  private val Stride = 24

  val textChunks: Q = Q(
    "q82_text_chunks",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")), lit(Stride))).as("st"))
      .select(
        col("doc_id"),
        ((col("st") - 1) / lit(Stride)).cast("int").as("chunk_idx"),
        size(slice(col("t"), col("st"), lit(ChunkLen))).as("n_tokens"),
        md5h61(concat_ws(" ", slice(col("t"), col("st"), lit(ChunkLen))))
          .as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx"),
    Some(s"""WITH tk AS (
        SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
      ex AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t), $Stride)) AS st
        FROM tk)
      SELECT doc_id,
        cast((st - 1) // $Stride as int) AS chunk_idx,
        cast(len(t[st : st + ${ChunkLen - 1}]) as int) AS n_tokens,
        ${sqlMd5h61(s"array_to_string(t[st : st + ${ChunkLen - 1}], ' ')")}
          AS chunk_hash
      FROM ex ORDER BY doc_id, chunk_idx"""))

  // ------------------------------------------------------------------
  // q83 — PII scrub (emails + phone-shaped tokens). The synthetic corpus
  // carries no PII, so both engines append identical synthetic contact
  // strings first (same SQL expression), then redact; the redaction
  // regexes are the operator under test (Java regex ∩ RE2 dialect).
  // ------------------------------------------------------------------
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3,4}"

  val piiScrub: Q = Q(
    "q83_pii_scrub",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or call 555-"),
          (col("doc_id") % 10000).cast("string")).as("pt"))
      .select(
        col("doc_id"),
        regexp_count(col("pt"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("pt"), lit(PhoneRe)).as("n_phones"),
        md5h61(regexp_replace(regexp_replace(col("pt"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrub_hash"))
      .orderBy("doc_id"),
    Some(s"""WITH p AS (
        SELECT doc_id,
          concat(text, ' contact user', doc_id,
            '@mail.example.com or call 555-',
            cast(doc_id % 10000 as varchar)) AS pt
        FROM documents)
      SELECT doc_id,
        cast(len(regexp_extract_all(pt, '$EmailRe')) as int) AS n_emails,
        cast(len(regexp_extract_all(pt, '$PhoneRe')) as int) AS n_phones,
        ${sqlMd5h61(
          s"regexp_replace(regexp_replace(pt, '$EmailRe', '<EMAIL>', 'g'), " +
            s"'$PhoneRe', '<PHONE>', 'g')")} AS scrub_hash
      FROM p ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q84 — test-set contamination: training docs sharing any word 3-gram
  // with a held-out eval slice (doc_id % 10 = 0). Keyed on the shared
  // 61-bit shingle hash → plain equi-join; the eval-side distinct hash
  // set is the broadcast candidate at scale.
  // ------------------------------------------------------------------
  val contamination: Q = Q(
    "q84_contamination",
    (s, d) => {
      val sh = Tables.documents(s, d)
        // materialize the token array BEFORE shingling: inlining
        // toks(text) into the transform lambda re-splits the whole text
        // per gram index (O(tokens^2) per doc — measured 15 s vs 0.4 s
        // at sf0.1 on q116's identical shape)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"),
          explode(shingles3(col("t"))).as("sh"))
        .select(col("doc_id"), md5h61(col("sh")).as("h"))
        .distinct()
      val eval_ = sh.filter(col("doc_id") % 10 === 0)
        .select(col("h")).distinct()
      sh.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(eval_), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id,
          ${sqlMd5h61("g.s")} AS h
        FROM (SELECT doc_id,
                ${sqlShingles3(sqlToks("text"))} AS gs
              FROM documents), unnest(gs) AS g(s)),
      ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0)
      SELECT doc_id, count(*) AS n_shared
      FROM sh JOIN ev USING (h)
      WHERE doc_id % 10 <> 0
      GROUP BY doc_id ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q85 — salient terms per doc: tf-idf-ish score with a rational idf
  // (tf * (N+1)/(df+1)) — single IEEE divide + multiply, bit-identical
  // across engines (ln() is not guaranteed identical, so avoided).
  // ------------------------------------------------------------------
  val salientTerms: Q = Q(
    "q85_salient_terms",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs
        .select(col("doc_id"), explode(toks(lower(col("text")))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // df re-aggregates tf (one row per (doc, term), so rows-per-term ≡
      // distinct-doc count). The tf >= 1 filter is a REUSE KEEPALIVE,
      // not a semantic filter (a groupBy count is always >= 1): without
      // a reference to `tf`, Catalyst prunes the count out of this
      // branch's aggregate (rewriting it to a bare distinct) and the
      // de-canonicalized subtrees defeat exchange reuse — two
      // token-explode passes (the r6 documented limit). Referencing tf
      // in a predicate Catalyst cannot fold keeps both branches'
      // aggregates identical, so they share ONE (doc_id, term) shuffle
      // and the corpus is tokenized once (ReuseAudit: documents 3→2,
      // and the remaining n_docs branch is a footer-only count(*)).
      val df = tf.filter(col("tf") >= 1).groupBy("term")
        .agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf") * ((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
      scored
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("term"))))
        .filter(col("rn") <= 3)
        .select("doc_id", "rn", "term", "score")
        .orderBy("doc_id", "rn")
    },
    Some(s"""WITH terms AS (
        SELECT doc_id, g.term AS term
        FROM (SELECT doc_id, ${sqlToks("lower(text)")} AS ts FROM documents),
             unnest(ts) AS g(term)),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM terms GROUP BY doc_id, term),
      df AS (SELECT term, count(*) AS df
             FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, term,
          tf * ((n_docs + 1.0) / (df + 1.0)) AS score
        FROM tf JOIN df USING (term), n),
      ranked AS (
        SELECT doc_id, term, score,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rn
        FROM scored)
      SELECT doc_id, cast(rn as int) AS rn, term, score
      FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn"""))

  // ------------------------------------------------------------------
  // q86 — bigram association (lift = p(xy) / (p(x)p(y)) rearranged into
  // one deterministic expression tree; ln-free PMI stand-in). Corpus
  // totals join as a broadcast scalar; unigram counts are a
  // broadcast-sized vocabulary join.
  // ------------------------------------------------------------------
  val bigramLift: Q = Q(
    "q86_bigram_lift",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), toks(lower(col("text"))).as("t"))
        // size>0/isNotNull are no-ops (toks yields >= 1 element, text is
        // scanned non-null on both engines) but explode(t) INFERS them
        // into only the unigram branch; writing them out plus the
        // repartition gives unigram and bigram passes ONE shared
        // tokenize+scan (the q80 symmetrize + barrier; ReuseAudit 2→1)
        .filter(size(col("t")) > 0 && col("t").isNotNull)
        .repartition(col("doc_id"))
      val uni = tk.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_w"))
      val bg = tk
        .select(explode(transform(
          when(size(col("t")) >= 2, sequence(lit(1), size(col("t")) - 1))
            .otherwise(array().cast("array<int>")),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
        .select(col("b.w1"), col("b.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      val totals = uni.agg(sum(col("c_w")).as("tot_uni"))
        .crossJoin(broadcast(bg.agg(sum(col("c_xy")).as("tot_bi"))))
      bg.join(broadcast(uni.withColumnRenamed("w", "w1")
          .withColumnRenamed("c_w", "c_x")), "w1")
        .join(broadcast(uni.withColumnRenamed("w", "w2")
          .withColumnRenamed("c_w", "c_y")), "w2")
        .crossJoin(broadcast(totals))
        .filter(col("c_xy") >= 5)
        .select(
          concat_ws(" ", col("w1"), col("w2")).as("bigram"),
          col("c_xy"),
          ((col("c_xy").cast("double") * col("tot_uni") * col("tot_uni")) /
            (col("c_x").cast("double") * col("c_y") * col("tot_bi")))
            .as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, ${sqlToks("lower(text)")} AS t
        FROM documents),
      uni AS (
        SELECT g.w AS w, count(*) AS c_w
        FROM tk, unnest(t) AS g(w) GROUP BY g.w),
      bg AS (
        SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c_xy
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
        GROUP BY 1, 2),
      tot AS (
        SELECT (SELECT sum(c_w) FROM uni) AS tot_uni,
               (SELECT sum(c_xy) FROM bg) AS tot_bi)
      SELECT concat_ws(' ', w1, w2) AS bigram, c_xy,
        (cast(c_xy as double) * tot_uni * tot_uni) /
          (cast(u1.c_w as double) * u2.c_w * tot_bi) AS lift
      FROM bg
      JOIN uni u1 ON bg.w1 = u1.w
      JOIN uni u2 ON bg.w2 = u2.w, tot
      WHERE c_xy >= 5
      ORDER BY lift DESC, bigram LIMIT 20"""))

  // ------------------------------------------------------------------
  // q87 — corpus mix report: per (source, lang) doc/token counts and the
  // share of the corpus (window total — cast to bigint, DuckDB window
  // sums return HUGEINT).
  // ------------------------------------------------------------------
  val domainMix: Q = Q(
    "q87_domain_mix",
    (s, d) => Tables.documents(s, d)
      .select(col("source"), col("lang"), size(toks(col("text"))).as("nt"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .withColumn("pct_docs",
        (col("n_docs") * lit(100.0)) /
          sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy("source", "lang"),
    Some(s"""WITH g AS (
        SELECT source, lang, count(*) AS n_docs,
          cast(sum(len(${sqlToks("text")})) as bigint) AS n_tokens
        FROM documents GROUP BY source, lang)
      SELECT source, lang, n_docs, n_tokens,
        (n_docs * 100.0) / cast(sum(n_docs) OVER () as bigint) AS pct_docs
      FROM g ORDER BY source, lang"""))

  // ------------------------------------------------------------------
  // q88 — document length histogram (fixed-width buckets via integer
  // division; the partition-count planning input for a real corpus).
  // ------------------------------------------------------------------
  val lengthBuckets: Q = Q(
    "q88_length_buckets",
    (s, d) => Tables.documents(s, d)
      .withColumn("bucket", expr("n_chars div 100"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("bucket"),
    Some("""SELECT n_chars // 100 AS bucket, count(*) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM documents GROUP BY 1 ORDER BY bucket"""))

  // ------------------------------------------------------------------
  // q89 — salted skew join (Skew.saltedJoin) verified against the plain
  // join's aggregate: identical results, n-way parallelism per hot key.
  // ------------------------------------------------------------------
  val saltedJoinAgg: Q = Q(
    "q89_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
        .withColumnRenamed("p_partkey", "l_partkey")
        .select("l_partkey", "p_brand")
      Skew.saltedJoin(li.select("l_partkey", "l_quantity"), p,
          "l_partkey", 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand, count(*) AS n,
        ${sqlDsum("l_quantity")} AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  // ------------------------------------------------------------------
  // q90 — typed Aggregator UDAF ([[graft.functions.ExactMoments]]):
  // exact-decimal second moments → population variance, with map-side
  // partial aggregation (the shuffle carries (n, Σx, Σx²) per group per
  // task, not rows).
  // ------------------------------------------------------------------
  val varianceUdaf: Q = Q(
    "q90_variance_udaf",
    (s, d) => {
      val mom = udaf(graft.functions.ExactMoments,
        org.apache.spark.sql.Encoders.DECIMAL)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast(Dec).as("q"))
        .groupBy("l_returnflag")
        .agg(mom(col("q")).as("m"))
        .select(
          col("l_returnflag"),
          col("m._1").as("n"),
          ((col("m._3") - (col("m._2") * col("m._2")) / col("m._1")) /
            col("m._1")).as("var_pop"))
        .orderBy("l_returnflag")
    },
    Some("""WITH g AS (
        SELECT l_returnflag, count(*) AS n,
          cast(sum(cast(l_quantity as decimal(18,4))) as double) AS s,
          cast(sum(cast(l_quantity as decimal(18,4)) *
                   cast(l_quantity as decimal(18,4))) as double) AS ss
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n, (ss - (s * s) / n) / n AS var_pop
      FROM g ORDER BY l_returnflag"""))

  // ------------------------------------------------------------------
  // q95 — approximate percentiles: the 100 TB path for q67's exact
  // percentile (exact needs a per-group sort of every value; the
  // t-digest-style sketch is mergeable map-side state). Rows-only for
  // the driver (sketch internals aren't SQL-replicable in DuckDB);
  // TrainingPrepSpec bounds the error against the exact q67 values.
  // ------------------------------------------------------------------
  val approxPercentiles: Q = Q(
    "q95_approx_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("p99"))
      .orderBy("l_returnflag"),
    None)

  // ------------------------------------------------------------------
  // q96 — bloom-pruned contamination join: q84 with a Bloom filter of
  // the eval-side shingle hashes applied to the training side BEFORE
  // the join. Bloom membership has no false negatives and the exact
  // equi-join still runs after it, so the result is identical to q84
  // (same oracle SQL) — but at 100 TB the bloom drops most of the big
  // side's rows before they reach the shuffle, which is the standard
  // runtime-filter trick this query keeps explicit and testable.
  // ------------------------------------------------------------------
  val bloomContamination: Q = Q(
    "q96_bloom_contamination",
    (s, d) => {
      val sh = Tables.documents(s, d)
        // materialize the token array BEFORE shingling: inlining
        // toks(text) into the transform lambda re-splits the whole text
        // per gram index (O(tokens^2) per doc — measured 15 s vs 0.4 s
        // at sf0.1 on q116's identical shape)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"),
          explode(shingles3(col("t"))).as("sh"))
        .select(col("doc_id"), md5h61(col("sh")).as("h"))
        .distinct()
      val eval_ = sh.filter(col("doc_id") % 10 === 0)
        .select(col("h")).distinct()
      // Sketch build is one aggregate over the (small) eval side; the
      // resulting filter ships inside the task closure. Size it from
      // the actual distinct-hash count — a fixed capacity would
      // saturate at larger corpora and silently degrade mightContain
      // to always-true (correct results, zero pruning).
      val nEval = eval_.count()
      val bloom = eval_.stat.bloomFilter("h", math.max(nEval, 1000L), 0.01)
      val mightContain = udf((h: Long) => bloom.mightContain(h))
      sh.filter(col("doc_id") % 10 =!= 0)
        .filter(mightContain(col("h")))
        .join(broadcast(eval_), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },
    // Bloom pre-filter can't drop a true match (no false negatives) and
    // the exact join removes its false positives → identical to q84.
    contamination.oracle)

  // ------------------------------------------------------------------
  // q97 — fuzzy string matching by edit distance, brand-blocked: pairs
  // of part names within a brand with levenshtein ≤ 4. Blocking keeps
  // the pair join an equi-join on p_brand (bounded block sizes at
  // scale: brands × (rows/brand)², never global O(n²)); levenshtein is
  // the same classic DP metric in both engines.
  // ------------------------------------------------------------------
  val fuzzyPairs: Q = Q(
    "q97_fuzzy_pairs",
    (s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_name")
      val a = p.as("a"); val b = p.as("b")
      a.join(b, col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
        .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
        .filter(col("dist") <= 4)
        .select(col("a.p_partkey").as("key_a"),
          col("b.p_partkey").as("key_b"),
          col("a.p_brand").as("brand"), col("dist"))
        .orderBy("key_a", "key_b")
    },
    Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        a.p_brand AS brand,
        cast(levenshtein(a.p_name, b.p_name) as int) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 4
      ORDER BY key_a, key_b"""))

  // ------------------------------------------------------------------
  // q103 — heavy hitters via count-min sketch: exact top-20 terms with
  // their CMS estimates side by side. The sketch is one mergeable
  // aggregate (map-side combinable, fixed size), so at 100 TB the
  // frequency table costs a few KB of shuffle instead of a vocabulary-
  // sized agg; the exact counts here exist to expose the estimation
  // error. Rows-only (CMS internals aren't SQL-replicable); spec pins
  // the no-underestimate law and the error bound.
  // ------------------------------------------------------------------
  val heavyHitters: Q = Q(
    "q103_heavy_hitters",
    (s, d) => Tables.documents(s, d)
      .select(explode(toks(lower(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("term"))
      .limit(20),
    Some(s"""SELECT term, count(*) AS exact_n
      FROM (SELECT unnest(${sqlToks("lower(text)")}) AS term FROM documents)
      GROUP BY term ORDER BY exact_n DESC, term LIMIT 20"""))

  /** CMS estimates beside the exact counts — the sketch half of q103,
    * split out because sketch internals aren't SQL-replicable. The spec
    * pins the no-underestimate law and the eps·N error bound against
    * the oracle-checked exact side. */
  private[graft] def heavyHittersEst(s: SparkSession, d: String): DataFrame = {
    val terms = Tables.documents(s, d)
      .select(explode(toks(lower(col("text")))).as("term"))
    val sketchBytes = terms
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val bc = s.sparkContext.broadcast(sketch)
    val estimate = udf((t: String) => bc.value.estimateCount(t))
    heavyHitters.run(s, d).withColumn("est_n", estimate(col("term")))
  }

  // ------------------------------------------------------------------
  // q104 — length-weighted deterministic sampling: P(keep) ∝ n_chars,
  // via the shared content hash (partitioning-independent, reproducible,
  // and — unlike weighted reservoir sampling — expressible in plain SQL,
  // so the oracle verifies it exactly). Weight scale: h % 4000 < n_chars
  // keeps ~len/4000 of each doc's probability mass.
  // ------------------------------------------------------------------
  val weightedSample: Q = Q(
    "q104_weighted_sample",
    (s, d) => Tables.documents(s, d)
      .filter(md5h61(concat(lit("wsample:"), col("doc_id").cast("string")))
        % 4000 < col("n_chars"))
      .select("doc_id", "n_chars")
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, n_chars FROM documents
      WHERE ${sqlMd5h61("concat('wsample:', doc_id)")} % 4000 < n_chars
      ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q107 — vocabulary coverage / OOV rate: fix the vocab to the corpus
  // top-100 terms (deterministic tiebreak), then measure each doc's
  // out-of-vocabulary token share. The tokenizer-coverage check run
  // before committing to a vocab size; vocab joins broadcast at any
  // realistic vocab size.
  // ------------------------------------------------------------------
  val oovRate: Q = Q(
    "q107_oov_rate",
    (s, d) => {
      val toksDf = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(lower(col("text")))).as("term"))
        // shared exchange: vocab aggregate and per-doc probe read ONE
        // tokenize+explode pass (cf. q47b/q80; ReuseAudit 2→1)
        .repartition(col("doc_id"))
      val vocab = toksDf.groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(100)
        .select("term")
      toksDf.join(broadcast(vocab.withColumn("in_v", lit(1))),
          Seq("term"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
        SELECT doc_id, g.term AS term
        FROM (SELECT doc_id, ${sqlToks("lower(text)")} AS ts FROM documents),
             unnest(ts) AS g(term)),
      vocab AS (
        SELECT term FROM (
          SELECT term, count(*) AS n FROM t GROUP BY term
          ORDER BY n DESC, term LIMIT 100)),
      j AS (
        SELECT t.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        FROM t LEFT JOIN vocab v ON t.term = v.term)
      SELECT doc_id, count(*) AS n_tokens,
        cast(sum(oov) as bigint) AS n_oov,
        cast(sum(oov) as bigint) * 1.0 / count(*) AS oov_rate
      FROM j GROUP BY doc_id ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q109 — scalar int8 embedding quantization: per-vector min/max
  // scaling to 256 levels (floor, not round — round-half ties differ
  // between engines) and the max reconstruction error. The 4×-memory
  // scale path for ANN storage, with its accuracy cost measured rather
  // than assumed. All arithmetic is the same double expression tree on
  // both engines (elements cast float→double exactly).
  // ------------------------------------------------------------------
  val embeddingQuantize: Q = Q(
    "q109_embedding_quantize",
    (s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .select(col("vec_id"), col("e"),
        array_min(col("e")).as("lo"), array_max(col("e")).as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
      .select(
        col("vec_id"),
        size(col("e")).as("n_dims"),
        aggregate(
          transform(col("e"), x =>
            abs(x - (floor((x - col("lo")) / col("scale")) * col("scale")
              + col("lo")))),
          lit(0.0), (acc, v) => greatest(acc, v)).as("max_abs_err"))
      .orderBy("vec_id"),
    Some("""WITH e AS (
        SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
        FROM embeddings),
      b AS (
        SELECT vec_id, e, list_min(e) AS lo,
          (list_max(e) - list_min(e)) / 255.0 AS scale
        FROM e)
      SELECT vec_id, cast(len(e) as int) AS n_dims,
        list_reduce(
          list_transform(e, x ->
            abs(x - (floor((x - lo) / scale) * scale + lo))),
          (acc, v) -> greatest(acc, v)) AS max_abs_err
      FROM b ORDER BY vec_id"""))

  // ------------------------------------------------------------------
  // q115 — sequence packing (GPT-pretraining concat-and-chunk): docs are
  // shuffled by content hash into `PackShards` independent streams, each
  // stream is concatenated in (hash, doc_id) order, and sequence
  // boundaries fall every `PackBudget` tokens. Per doc: which sequence
  // it starts in, at what offset, and whether it straddles a boundary.
  //
  // Scale shape: the cumulative sum is windowed PER SHARD — at 100 TB
  // each shard is one partition-sized packing stream (this is exactly
  // how multi-worker packing runs in production: workers pack their own
  // shard; ids stay globally unique via shard * 2^32 + seq_in_shard).
  // Never a single global ORDER BY window over the whole corpus.
  // ------------------------------------------------------------------
  private val PackBudget = 64
  private val PackShards = 8

  val sequencePacking: Q = Q(
    "q115_sequence_packing",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("h", "doc_id")
        .rowsBetween(Long.MinValue, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), md5h61(col("text")).as("h"),
          size(toks(col("text"))).as("n_tokens"))
        .withColumn("shard", (col("h") % PackShards).cast("int"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("shard"),
          (col("shard").cast("long") * lit(1L << 32) +
            floor(col("cum_before") / PackBudget).cast("long")).as("seq_id"),
          col("cum_before").%(PackBudget).as("offset_in_seq"),
          col("n_tokens"),
          (floor((col("cum_before") + col("n_tokens") - 1) / PackBudget) =!=
            floor(col("cum_before") / PackBudget)).cast("int").as("straddles"))
        .orderBy("seq_id", "offset_in_seq", "doc_id")
    },
    Some(s"""WITH t AS (
        SELECT doc_id, ${sqlMd5h61("text")} AS h,
          cast(len(${sqlToks("text")}) as int) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, cast(h % $PackShards as int) AS shard, n_tokens,
          cast(coalesce(sum(n_tokens) OVER (
            PARTITION BY h % $PackShards ORDER BY h, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            as bigint) AS cum_before
        FROM t)
      SELECT doc_id, shard,
        shard * ${1L << 32} + cum_before // $PackBudget AS seq_id,
        cum_before % $PackBudget AS offset_in_seq,
        n_tokens,
        cast((cum_before + n_tokens - 1) // $PackBudget
          <> cum_before // $PackBudget as int) AS straddles
      FROM c ORDER BY seq_id, offset_in_seq, doc_id"""))

  // ------------------------------------------------------------------
  // q116 — winnowing document fingerprints (Schleimer, Wilkerson &
  // Aiken, SIGMOD'03 — the MOSS algorithm): hash every word-3-gram,
  // slide a w=4 window over the hash stream, keep each window's minimum;
  // the DISTINCT kept hashes are the document's fingerprint set
  // (guarantee: any shared run of >= w+k-1 tokens shares a fingerprint).
  // Output is the per-doc fingerprint summary: count + an
  // order-independent checksum of the set.
  //
  // Scale shape: winnowing is a DOC-LOCAL computation, so q116 runs it
  // as one projection over array higher-order functions — hash array →
  // per-position window minima (transform+slice+array_min) →
  // array_distinct → modular-fold checksum. Zero explode, zero shuffle,
  // zero window sort; the only exchange left is the output orderBy.
  // (Round 3 ran it as posexplode → shuffle-by-doc_id → window min →
  // two distinct aggs: 7.06 s at sf0.1, 51% of the whole bench — the
  // shuffle moved ~n_tokens rows per doc for a computation that never
  // needed to leave the row.) [[winnowSelected]] keeps the row-per-
  // window shape as the spec surface for the winnowing guarantee.
  // ------------------------------------------------------------------
  private val WinnowW = 4

  /** One row per (doc_id, n_grams, selected fingerprint hash): every
    * w-gram window's minimum 3-gram hash, pre-DISTINCT. Exposed so specs
    * can check the winnowing guarantee on synthetic docs; q116 is the
    * per-doc summary over DISTINCT fingerprints. */
  def winnowSelected(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val grams = docs
      // token array materialized first — see q84's note (O(n^2) lambda
      // re-split otherwise; this site measured 15 s -> 0.4 s at sf0.1)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles3(col("t")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_grams"),
        posexplode(col("sh")).as(Seq("p0", "g")))
      .select(col("doc_id"), col("n_grams"),
        (col("p0") + 1).as("p"), md5h61(col("g")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
      .rowsBetween(0, WinnowW - 1)
    grams
      .withColumn("wmin", min(col("h")).over(w))
      // valid window starts; a doc with 0 < n_grams < w keeps its
      // single all-grams window (the paper's short-doc convention)
      .filter(col("p") <= greatest(col("n_grams") - (WinnowW - 1), lit(1)))
  }

  val winnowFingerprints: Q = Q(
    "q116_winnow_fingerprints",
    (s, d) => {
      // token array materialized first — see q84's note (O(n^2) lambda
      // re-split otherwise)
      // spreadIfNarrow tried r19, reverted: the shingle-md5 pass is too
      // light to pay for the spread exchange (best flag-clean min 0.248
      // at calib 1.70 vs 0.179 at 1.28 pre-spread)
      Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        // docs with zero 3-grams (< 3 tokens) produce no windows (empty
        // unnest in the oracle) — drop them here. Phrased over the token
        // array, NOT size(sh) >= 1: a predicate on `sh` gets pushed
        // below the projections with the shingle lambda substituted in,
        // where each element re-runs the regex split — O(n_grams) full
        // splits per row just to evaluate the filter (measured: the
        // entire 5.9 s q116 regression at sf0.1 was this filter).
        // size(t) >= 3 pushes down as one split per row.
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), shingles3(col("t")).as("sh"))
        .select(col("doc_id"), transform(col("sh"), g => md5h61(g)).as("hs"))
        // `hs` is deliberately referenced ≥2 times in this projection:
        // a single reference lets CollapseProject inline the whole
        // md5-array expression into the position lambda's body, where
        // it re-evaluates PER WINDOW POSITION — O(n_grams²) digests
        // (measured 5.9 s vs 0.3 s at sf0.1). Same guard as q84's
        // token-array materialization.
        .select(col("doc_id"), size(col("hs")).as("n_grams"),
          // valid window starts 1..max(n-w+1, 1); a doc with
          // 0 < n_grams < w keeps its single all-grams window (slice
          // truncates at the array end — the paper's short-doc
          // convention)
          array_distinct(transform(
            sequence(lit(1), greatest(size(col("hs")) - (WinnowW - 1), lit(1))),
            p => array_min(slice(col("hs"), p, lit(WinnowW))))).as("fps"))
        .select(col("doc_id"), col("n_grams"),
          size(col("fps")).cast("long").as("n_fps"),
          // stepwise-mod fold: acc < 2^61 and x < 2^61 so acc + x fits a
          // signed long — same value as sum(DISTINCT) % 2^61 without the
          // decimal widening
          aggregate(col("fps"), lit(0L),
            (acc, x) => (acc + x) % lit(H61Mod)).as("fp_checksum"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, ${sqlShingles3(s"(${sqlToks("text")})")} AS sh
        FROM documents),
      g AS (
        SELECT doc_id, cast(len(sh) as int) AS n_grams,
          unnest(generate_series(1, len(sh))) AS p, sh
        FROM tk),
      h AS (
        SELECT doc_id, n_grams, cast(p as int) AS p,
          ${sqlMd5h61("sh[p]")} AS h
        FROM g),
      w AS (
        SELECT doc_id, n_grams, p,
          min(h) OVER (PARTITION BY doc_id ORDER BY p
            ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS wmin
        FROM h)
      SELECT doc_id, max(n_grams) AS n_grams,
        cast(count(DISTINCT wmin) as bigint) AS n_fps,
        cast(sum(DISTINCT wmin) % $H61Mod as bigint) AS fp_checksum
      FROM w WHERE p <= greatest(n_grams - ${WinnowW - 1}, 1)
      GROUP BY doc_id ORDER BY doc_id"""),
    bench = true)

  // ------------------------------------------------------------------
  // q147 — BPE merge-loop vocab learner (Sennrich et al. 2016: learn k
  // byte-pair merges from word frequencies). The corpus is reduced ONCE
  // to a (word, freq) table with q75's pre-tokenizer regex; each
  // iteration counts adjacent symbol pairs weighted by word freq
  // (overlapping positions count, like the reference implementation's
  // get_stats), picks the most frequent pair with a deterministic
  // lexicographic (a, b) tie-break, and merges it corpus-wide with
  // greedy left-to-right non-overlap semantics.
  //
  // Representation: a word's symbol sequence is ONE string with doubled
  //  separators between symbols and at both ends
  // ("\1\1h\1\1u\1\1g\1\1"). Merging (a,b) is then a native string
  // replace of "\1a\1\1b\1" with "\1ab\1" — replace() scans left to
  // right and never rescans its own output, which is exactly BPE's
  // greedy non-overlapping merge; the doubled separators keep the outer
  // halves intact so consecutive matches ("a b a b") still see their
  // leading "\1". Symbol-boundary anchoring makes "xa|b" unable to
  // match "a|b".
  //
  // Scale shape: the only corpus-width pass is the word-count shuffle
  // (map-side partials). The k-iteration loop runs over the
  // VOCABULARY-sized frame: per iteration one pair-count aggregate
  // (map-side partials, then a 1-row TakeOrdered) and one replace
  // projection, localCheckpoint-ed to keep lineage flat (the Dedup CC
  // discipline) with the superseded round unpersisted. The per-round
  // driver collect is ONE row (the winning pair) — k-bounded, like
  // IvfIndex's centroid collect. A 100 TB corpus changes only the
  // first pass; the loop's cost is vocabulary-sized per iteration.
  // ------------------------------------------------------------------
  private val BpeK = 50
  private val BpeSep = "\u0001"
  private val BpeSep2 = BpeSep + BpeSep
  private[graft] val BpePat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+" // q75's pre-tokenizer

  /** The separator byte is stripped from the input BEFORE pre-token
    * extraction: BpePat's punct class admits control characters, so a
    * document containing U+0001 would otherwise produce pieces whose
    * wrapped symbol string has phantom separator runs — silently
    * corrupting merges and the learner-vs-encoder equality law. One
    * native replace per row on both engines (chr(1) inlines
    * identically; all other text passes through untouched). */
  private val StripSep = "replace(text, chr(1), '')"

  /** Wrap a word into the doubled-separator symbol string. */
  private def bpeWrap(c: org.apache.spark.sql.Column) =
    concat(lit(BpeSep2), regexp_replace(c, "(?s)(.)", "$1" + BpeSep2))

  /** Apply a merge list in rank order (BPE encode = replay the merges). */
  private[graft] def bpeApply(c: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]) =
    merges.foldLeft(bpeWrap(c)) { case (acc, (a, b)) =>
      replace(acc, lit(BpeSep + a + BpeSep2 + b + BpeSep),
        lit(BpeSep + a + b + BpeSep))
    }

  /** Symbol count of a doubled-separator symbol string. */
  private[graft] def bpeSymCount(c: org.apache.spark.sql.Column) =
    size(filter(split(c, BpeSep2), v => v =!= ""))

  /** The ONE corpus-width pass both learners share: (sym, freq) word
    * histogram in the doubled-separator symbol encoding. */
  private def bpeBase(docs: DataFrame): DataFrame = docs
    .select(explode(
      expr(s"regexp_extract_all(lower($StripSep), '$BpePat', 0)")).as("w"))
    .groupBy("w").agg(count(lit(1)).as("freq"))
    .select(bpeWrap(col("w")).as("sym"), col("freq"))

  /** The q147 merge loop, exposed for the learner-vs-encoder law: runs
    * k iterations over `docs` and returns the merge table plus the
    * FINAL (sym, freq) word frame, still localCheckpoint-ed — the
    * caller owns unpersisting it. */
  private[graft] def learnBpe(s: SparkSession, docs: DataFrame, k: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) =
    learnBpeFromBase(s, bpeBase(docs), k)

  /** Distributed merge loop over a (possibly precomputed) base frame —
    * [[learnBpeAuto]]'s over-budget fallback reuses its already-cached
    * corpus pass here instead of recomputing it. */
  private def learnBpeFromBase(s: SparkSession, base: DataFrame, k: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    // Lineage discipline: a checkpoint EVERY merge costs one
    // materialization job per iteration (2k Spark jobs for k merges,
    // fixed scheduling overhead each). Instead let up to CkptEvery
    // nested replace projections accumulate — re-running <=7 vocab-wide
    // string replaces inside the next pair-count job is cheaper than a
    // materialization — and truncate lineage every CkptEvery merges,
    // unpersisting the superseded checkpoint (the Dedup CC discipline,
    // amortized).
    val CkptEvery = 8
    var lastCkpt = base.localCheckpoint()
    var words = lastCkpt
    var sinceCkpt = 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= k && !done) {
      val t = filter(split(col("sym"), BpeSep2), x => x =!= "")
      // guard: Spark sequence(1, 0) DESCENDS instead of returning empty
      val prs = when(size(col("t")) >= 2,
        transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("a"),
            element_at(col("t"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val top = words
        .select(col("freq"), t.as("t"))
        .select(col("freq"), explode(prs).as("p"))
        .groupBy("p.a", "p.b").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, cnt))
        words = words.withColumn("sym",
          replace(col("sym"),
            lit(BpeSep + a + BpeSep2 + b + BpeSep),
            lit(BpeSep + a + b + BpeSep)))
        sinceCkpt += 1
        if (sinceCkpt == CkptEvery) {
          val next = words.localCheckpoint()
          lastCkpt.unpersist()
          lastCkpt = next
          words = next
          sinceCkpt = 0
        }
        rank += 1
      }
    }
    // return a CHECKPOINTED frame so the caller's single unpersist
    // frees all loop storage (a derived view would leak lastCkpt)
    val fin = if (sinceCkpt > 0) {
      val f = words.localCheckpoint(); lastCkpt.unpersist(); f
    } else lastCkpt
    (merges.toSeq, fin)
  }

  /** Unsigned UTF-8 byte-wise `<` — the collation Spark (UTF8String)
    * and DuckDB (binary) both use for ORDER BY, so the driver-side
    * tie-break below is bit-identical to the engines'. (JVM
    * String.compareTo orders by UTF-16 code unit, which diverges for
    * supplementary characters.) */
  private def utf8Cmp(x: String, y: String): Int = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Driver-side histogram learner — the path that makes production
    * vocab sizes (k ≈ 32k) tractable. The distributed loop pays one
    * vocabulary-sized aggregate JOB per merge: at k=50 that is already
    * ~4 s of pure scheduling latency at sf0.1, and k=32k would be
    * hours — while the (sym, freq) histogram the loop iterates over is
    * VOCABULARY-sized (bounded by distinct pre-tokenizer pieces, a few
    * million rows for any corpus — Zipf, not linear in corpus bytes).
    * So: run the ONE corpus-width pass distributed ([[bpeBase]] — the
    * only stage that grows with corpus size), and when the histogram
    * fits `collectBudget` rows, collect it and run the merge loop in
    * driver memory — the same plan HuggingFace tokenizers uses
    * (distributed word count, in-memory merge training). Semantics are
    * BIT-IDENTICAL to [[learnBpe]] by construction: same overlapping
    * adjacent-pair counting (freq-weighted), same (cnt DESC, a, b)
    * tie-break under the engines' binary collation ([[utf8Lt]]), and
    * Java String.replace is the same left-to-right non-rescanning
    * greedy merge as Spark's StringReplace — TrainingPrepSpec pins the
    * two paths equal merge-for-merge. Returns None when the histogram
    * exceeds the budget (caller falls back to the distributed loop). */
  private[graft] def learnBpeHist(s: SparkSession, docs: DataFrame, k: Int,
      collectBudget: Long = 1L << 20)
      : Option[(Seq[(Long, String, String, Long)], DataFrame)] = {
    val base = bpeBase(docs).cache()
    try {
      if (base.count() > collectBudget) None
      else Some(histLoop(s,
        base.collect().map(r => (r.getString(0), r.getLong(1))), k))
    } finally { base.unpersist(); () }
  }

  /** Driver-side twin of [[bpeWrap]] for callers that synthesize
    * histogram rows directly (the BpeScale tool). */
  private[graft] def bpeWrapStr(w: String): String =
    BpeSep2 + w.map(ch => s"$ch$BpeSep2").mkString

  /** The in-memory merge loop itself (see [[learnBpeHist]] for the
    * bit-equality argument), INCREMENTAL: the naive form rescans the
    * whole vocabulary per merge — O(vocab × k), measured 349 s for
    * k=2048 over a 95k-word Zipf vocabulary (BpeScale tool) — while
    * after the first ranks each merge touches only the few words that
    * contain the merged pair. Maintain (1) the freq-weighted
    * overlapping adjacent-pair counts as a map updated by exact deltas
    * when a word is rewritten, (2) an occurrence index pair → word ids
    * (append-only, re-checked at use — a stale entry is skipped), and
    * (3) an ordered set over (cnt DESC, a, b) under the engines'
    * binary collation ([[utf8Cmp]]) whose head IS the old full-scan
    * argmax. The per-word rewrite replays String.replace's
    * left-to-right non-rescanning greedy pass over the symbol array,
    * so every iteration selects the same pair and produces the same
    * words as the rescan loop — TrainingPrepSpec's law (and the
    * BpeScale prefix law at sf0.1) pin it merge-for-merge against the
    * distributed loop. Same 95k-vocab probe after: 1-2 s. */
  private[graft] def histLoop(s: SparkSession, collected: Array[(String, Long)],
      k: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    val sepPat = java.util.regex.Pattern.quote(BpeSep2)
    val words: Array[Array[String]] =
      collected.map { case (sym, _) => sym.split(sepPat, -1).filter(_.nonEmpty) }
    val freqs: Array[Long] = collected.map(_._2)

    val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where =
      scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.BitSet]
    val ord: Ordering[(Long, String, String)] =
      (x: (Long, String, String), y: (Long, String, String)) => {
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1) // cnt DESC
        else {
          val c = utf8Cmp(x._2, y._2)
          if (c != 0) c else utf8Cmp(x._3, y._3)
        }
      }
    val queue = scala.collection.mutable.TreeSet.empty[(Long, String, String)](ord)

    // cnt/queue always mirror each other exactly; `where` may hold
    // stale word ids (a word that no longer contains the pair) but
    // never misses a live occurrence
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val old = cnt.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, p._1, p._2))
      val nw = old + delta
      if (nw != 0L) {
        cnt(p) = nw
        queue.add((nw, p._1, p._2))
      } else cnt.remove(p)
      if (delta > 0L)
        where.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += wi
      ()
    }
    for (wi <- words.indices) {
      val t = words(wi); val f = freqs(wi)
      var i = 0
      while (i + 1 < t.length) { bump((t(i), t(i + 1)), f, wi); i += 1 }
    }

    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1L
    while (rank <= k && queue.nonEmpty) {
      val (c, a, b) = queue.head
      merges += ((rank, a, b, c))
      val hits = where.getOrElse((a, b), scala.collection.mutable.BitSet.empty)
      for (wi <- hits.toArray) {
        val t = words(wi); val f = freqs(wi)
        // re-check: the index entry may be stale
        var has = false
        var i = 0
        while (!has && i + 1 < t.length) {
          has = t(i) == a && t(i + 1) == b; i += 1
        }
        if (has) {
          // String.replace semantics: one left-to-right pass, a merged
          // symbol never re-matches as the head of the same pass
          val nt = scala.collection.mutable.ArrayBuffer.empty[String]
          i = 0
          while (i < t.length) {
            if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
              nt += a + b; i += 2
            } else { nt += t(i); i += 1 }
          }
          val na = nt.toArray
          i = 0
          while (i + 1 < t.length) { bump((t(i), t(i + 1)), -f, wi); i += 1 }
          i = 0
          while (i + 1 < na.length) { bump((na(i), na(i + 1)), f, wi); i += 1 }
          words(wi) = na
        }
      }
      where.remove((a, b))
      // every live (a,b) adjacency was in `where` and a rewrite pass
      // leaves none behind, so the count must have drained to zero —
      // fail loudly rather than spin re-selecting a pair that can no
      // longer change anything
      require(!cnt.contains((a, b)),
        s"merge $rank ($a,$b) left a live pair count — occurrence index broken")
      rank += 1
    }
    val s2 = s
    import s2.implicits._
    val enc = words.indices
      .map(wi => (BpeSep2 + words(wi).map(_ + BpeSep2).mkString, freqs(wi)))
    (merges.toSeq, enc.toDF("sym", "freq"))
  }

  /** Histogram fast path when the vocab fits the collect budget (always,
    * for any realistic corpus), distributed loop otherwise — ONE corpus
    * pass either way: the budget check's cached base frame feeds
    * whichever loop runs. The gate is the driver-funnel guard for
    * 100 TB web crawls whose raw pre-token vocabulary (junk tokens,
    * URLs) can exceed 10⁸ entries: the caller never has to know which
    * path is safe — the row count decides, the chosen path is logged,
    * and TrainingPrepSpec pins the two paths bit-equal by forcing the
    * fallback with a tiny budget. */
  private[graft] def learnBpeAuto(s: SparkSession, docs: DataFrame, k: Int,
      collectBudget: Long = 1L << 20)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val base = bpeBase(docs).cache()
    try {
      val n = base.count()
      if (n <= collectBudget) {
        log.info(s"learnBpeAuto: vocab $n <= budget $collectBudget — " +
          "driver-side histogram merge loop")
        histLoop(s, base.collect().map(r => (r.getString(0), r.getLong(1))), k)
      } else {
        log.info(s"learnBpeAuto: vocab $n > budget $collectBudget — " +
          "distributed merge loop fallback")
        learnBpeFromBase(s, base, k)
      }
    } finally { base.unpersist(); () }
  }

  val bpeMerges: Q = Q(
    "q147_bpe_merges",
    (s, d) => {
      import s.implicits._
      val (merges, fin) = learnBpeAuto(s, Tables.documents(s, d), BpeK)
      fin.unpersist()
      merges.toDF("rank", "pair_a", "pair_b", "freq").orderBy("rank")
    },
    Some {
      // the same k iterations as a generated CTE chain: each stage's
      // 1-row m_i is the winning pair, cross-joined to apply the merge
      val sep2 = "chr(1)||chr(1)"
      val stages = (0 until BpeK).map { i =>
        s"""p$i AS MATERIALIZED (SELECT t[i] AS a, t[i+1] AS b, sum(freq) AS cnt
          FROM (SELECT list_filter(string_split(sym, $sep2), x -> x <> '') AS t,
              freq FROM w$i),
            unnest(generate_series(1, len(t)-1)) AS u(i)
          GROUP BY t[i], t[i+1]),
        m$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
        w${i + 1} AS MATERIALIZED (SELECT replace(sym,
            chr(1)||a||$sep2||b||chr(1), chr(1)||a||b||chr(1)) AS sym, freq
          FROM w$i, m$i)"""
      }.mkString(",\n        ")
      val unions = (0 until BpeK).map { i =>
        s"""SELECT cast(${i + 1} as bigint) AS "rank", a AS pair_a,
          b AS pair_b, cast(cnt as bigint) AS freq FROM m$i"""
      }.mkString("\n        UNION ALL ")
      s"""WITH w0 AS MATERIALIZED (SELECT $sep2 ||
            regexp_replace(w, '(.)', '\\1'||$sep2, 'gs') AS sym, freq
          FROM (SELECT w, count(*) AS freq FROM
              (SELECT unnest(regexp_extract_all(lower(replace(text, chr(1), ''))
                 , '$BpePat')) AS w
               FROM documents)
            GROUP BY w)),
        $stages
        SELECT * FROM ($unions) ORDER BY "rank""""
    },
    bench = true)

  // ------------------------------------------------------------------
  // q148 — BPE ENCODE, the serving side of q147: tokenize the corpus
  // with a PINNED merge table (in production the learned vocab is a
  // broadcast artifact, exactly like q98b's fixed weights vs q98's
  // trained model). Each q75 pre-token piece is char-split into the
  // q147 doubled-separator symbol string and the merges are applied in
  // rank order as a 16-deep nested native replace — one linear
  // projection per row, fully inside whole-stage codegen, zero
  // shuffles beyond the scan: the right 100 TB shape for "how many
  // tokens is this corpus" (the number that sizes a training run).
  // Output is per-doc piece/token counts and fertility (BPE tokens per
  // pre-token word) — the tokenizer-efficiency metric.
  // ------------------------------------------------------------------
  private val BpeMerges16: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r",
    "a" -> "n", "an" -> "d", "o" -> "u", "r" -> "e",
    "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "t" -> "o", "i" -> "s", " " -> "the", " " -> "a")

  val bpeEncode: Q = {
    import org.apache.spark.sql.Column
    def nSyms(c: Column): Column = bpeSymCount(bpeApply(c, BpeMerges16))
    Q(
      "q148_bpe_encode",
      // spreadIfNarrow tried r19, reverted: per-row encode too light to
      // pay for the spread exchange (measured norm 1.09 -> 1.25)
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr(s"regexp_extract_all(lower($StripSep), '$BpePat', 0)").as("pieces"))
        .select(col("doc_id"), size(col("pieces")).as("n_pieces"),
          aggregate(transform(col("pieces"), p => nSyms(p)),
            lit(0), (a, x) => a + x).as("n_bpe"))
        .select(col("doc_id"), col("n_pieces"), col("n_bpe"),
          // guarded: a doc whose text yields zero pre-tokenizer pieces
          // (e.g. whitespace-only) must give fertility NULL by DESIGN on
          // both engines, not by accident of 0/0 rendering
          when(col("n_pieces") > 0,
            col("n_bpe").cast("double") / col("n_pieces")).as("fertility"))
        .orderBy("doc_id"),
      Some {
        val sep2 = "chr(1)||chr(1)"
        def lit1(x: String) = "'" + x.replace("'", "''") + "'"
        val wrapped = s"$sep2 || regexp_replace(w, '(.)', '\\1'||$sep2, 'gs')"
        val chain = BpeMerges16.foldLeft(wrapped) { case (acc, (a, b)) =>
          s"replace($acc, chr(1)||${lit1(a)}||$sep2||${lit1(b)}||chr(1), " +
            s"chr(1)||${lit1(a + b)}||chr(1))"
        }
        s"""WITH p AS (SELECT doc_id,
            regexp_extract_all(lower(replace(text, chr(1), '')), '$BpePat')
              AS pieces
          FROM documents),
        e AS (SELECT doc_id, cast(len(pieces) as int) AS n_pieces,
            cast(coalesce(list_sum(list_transform(pieces, w ->
              len(list_filter(string_split($chain, $sep2),
                x -> x <> '')))), 0) as int) AS n_bpe
          FROM p)
        SELECT doc_id, n_pieces, n_bpe,
          CASE WHEN n_pieces > 0
            THEN cast(n_bpe as double) / n_pieces END AS fertility
        FROM e ORDER BY doc_id"""
      },
      bench = true)
  }

  // ------------------------------------------------------------------
  // q219 — per-LANGUAGE tokenizer economics, the fairness audit over
  // q148's encoder: a BPE vocabulary learned on one language mix
  // over-segments the others (more tokens per word and fewer chars
  // per token → the under-served languages pay more compute and fit
  // less context per sequence — the well-documented multilingual-BPE
  // inequity). Per language: doc count, pre-token pieces, BPE tokens,
  // piece chars, fertility = ΣBPE/Σpieces and chars-per-token =
  // Σchars/ΣBPE — each a SINGLE IEEE division of exact integer sums,
  // so both engines produce the identical double (the q30 int/int
  // discipline; no per-doc ratios are ever averaged, which would be
  // order-dependent).
  //
  // Scale shape: the 16-deep merge chain runs per piece inside
  // whole-stage codegen exactly as in q148 (zero shuffles beyond the
  // scan); the per-language rollup is ONE map-combinable groupBy over
  // |langs| keys. chars counts the PIECES' characters (what the
  // tokenizer actually consumes), not raw text length — whitespace
  // and unmatched punctuation are not tokenizer input.
  // ------------------------------------------------------------------
  val tokenizerEconomics: Q = {
    import org.apache.spark.sql.Column
    def nSyms(c: Column): Column = bpeSymCount(bpeApply(c, BpeMerges16))
    Q(
      "q219_tokenizer_economics",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          expr(s"regexp_extract_all(lower($StripSep), '$BpePat', 0)").as("pieces"))
        .select(col("lang"), size(col("pieces")).as("n_pieces"),
          aggregate(transform(col("pieces"), p => nSyms(p)),
            lit(0), (a, x) => a + x).as("n_bpe"),
          aggregate(transform(col("pieces"), p => length(p)),
            lit(0), (a, x) => a + x).as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_pieces")).cast("long").as("n_pieces"),
          sum(col("n_bpe")).cast("long").as("n_bpe"),
          sum(col("n_chars")).cast("long").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_pieces"), col("n_bpe"),
          col("n_chars"),
          when(col("n_pieces") > 0,
            col("n_bpe").cast("double") / col("n_pieces")).as("fertility"),
          when(col("n_bpe") > 0,
            col("n_chars").cast("double") / col("n_bpe")).as("chars_per_bpe"))
        .orderBy("lang"),
      Some {
        val sep2 = "chr(1)||chr(1)"
        def lit1(x: String) = "'" + x.replace("'", "''") + "'"
        val wrapped = s"$sep2 || regexp_replace(w, '(.)', '\\1'||$sep2, 'gs')"
        val chain = BpeMerges16.foldLeft(wrapped) { case (acc, (a, b)) =>
          s"replace($acc, chr(1)||${lit1(a)}||$sep2||${lit1(b)}||chr(1), " +
            s"chr(1)||${lit1(a + b)}||chr(1))"
        }
        s"""WITH p AS (SELECT lang,
            regexp_extract_all(lower(replace(text, chr(1), '')), '$BpePat')
              AS pieces
          FROM documents),
        e AS (SELECT lang, cast(len(pieces) as int) AS n_pieces,
            cast(coalesce(list_sum(list_transform(pieces, w ->
              len(list_filter(string_split($chain, $sep2),
                x -> x <> '')))), 0) as int) AS n_bpe,
            cast(coalesce(list_sum(list_transform(pieces, w -> len(w))), 0)
              as int) AS n_chars
          FROM p),
        a AS (SELECT lang, cast(count(*) as bigint) AS n_docs,
            cast(sum(n_pieces) as bigint) AS n_pieces,
            cast(sum(n_bpe) as bigint) AS n_bpe,
            cast(sum(n_chars) as bigint) AS n_chars
          FROM e GROUP BY 1)
        SELECT lang, n_docs, n_pieces, n_bpe, n_chars,
          CASE WHEN n_pieces > 0
            THEN cast(n_bpe as double) / n_pieces END AS fertility,
          CASE WHEN n_bpe > 0
            THEN cast(n_chars as double) / n_bpe END AS chars_per_bpe
        FROM a ORDER BY lang"""
      })
  }

  // ------------------------------------------------------------------
  // q221 — BPE vocabulary-utilization audit (dead-merge detection),
  // the tokenizer-maintenance counterpart of q219's economics: for
  // each of the 16 pinned merge products, how often does it survive
  // in the FINAL encoded corpus and in how many distinct word types?
  // A merge whose product is always consumed by a later merge (e.g.
  // "th" inside every "the") or never occurs is dead vocabulary —
  // wasted embedding rows and logit width; this is the measurement
  // behind vocabulary pruning.
  //
  // Scale shape: usage is computed over the (word, freq) TYPE
  // histogram (the q147 bpeBase discipline — one corpus pass to
  // vocab-sized data, each distinct word encoded ONCE, occurrence
  // counts recovered as Σ freq · count-in-word); the merge chain runs
  // inside whole-stage codegen; the isin(16 products) filter pushes
  // below the symbol aggregate so the final shuffle carries only
  // matching symbol instances; the merge table is a 16-row literal
  // relation LEFT-joined so dead merges surface as explicit zeros
  // instead of silently vanishing.
  // ------------------------------------------------------------------
  val bpeVocabUtil: Q = {
    val products = BpeMerges16.map { case (a, b) => a + b }
    Q(
      "q221_bpe_vocab_util",
      (s, d) => {
        import s.implicits._
        val merges = BpeMerges16.zipWithIndex
          .map { case ((a, b), i) => (i + 1, a, b, a + b) }
          .toDF("mrank", "a", "b", "token")
        val hist = Tables.documents(s, d)
          .select(explode(
            expr(s"regexp_extract_all(lower($StripSep), '$BpePat', 0)"))
            .as("w"))
          .groupBy("w").agg(count(lit(1)).as("freq"))
        val usage = hist
          .select(col("w"), col("freq"),
            explode(filter(split(bpeApply(col("w"), BpeMerges16), BpeSep2),
              v => v =!= "")).as("tok"))
          .filter(col("tok").isin(products: _*))
          .groupBy("tok")
          .agg(sum(col("freq")).cast("long").as("occ"),
            countDistinct(col("w")).cast("long").as("words"))
        merges.join(broadcast(usage), col("token") === col("tok"), "left")
          .select(col("mrank"), col("a"), col("b"), col("token"),
            coalesce(col("occ"), lit(0L)).as("n_occ"),
            coalesce(col("words"), lit(0L)).as("n_words"))
          .orderBy("mrank")
      },
      Some {
        val sep2 = "chr(1)||chr(1)"
        def lit1(x: String) = "'" + x.replace("'", "''") + "'"
        val wrapped = s"$sep2 || regexp_replace(w, '(.)', '\\1'||$sep2, 'gs')"
        val chain = BpeMerges16.foldLeft(wrapped) { case (acc, (a, b)) =>
          s"replace($acc, chr(1)||${lit1(a)}||$sep2||${lit1(b)}||chr(1), " +
            s"chr(1)||${lit1(a + b)}||chr(1))"
        }
        val vals = BpeMerges16.zipWithIndex.map { case ((a, b), i) =>
          s"(${i + 1}, ${lit1(a)}, ${lit1(b)}, ${lit1(a + b)})"
        }.mkString(", ")
        val inList = products.map(lit1).mkString(", ")
        s"""WITH w0 AS (SELECT unnest(
            regexp_extract_all(lower(replace(text, chr(1), '')), '$BpePat'))
            AS w FROM documents),
        hist AS (SELECT w, count(*) AS freq FROM w0 GROUP BY 1),
        tok AS (SELECT w, freq,
            unnest(list_filter(string_split($chain, $sep2), x -> x <> ''))
              AS tok
          FROM hist),
        usage AS (SELECT tok, cast(sum(freq) as bigint) AS occ,
            cast(count(distinct w) as bigint) AS words
          FROM tok WHERE tok IN ($inList) GROUP BY 1),
        m AS (SELECT * FROM (VALUES $vals) AS v(mrank, a, b, token))
        SELECT mrank, a, b, token,
          coalesce(occ, 0) AS n_occ, coalesce(words, 0) AS n_words
        FROM m LEFT JOIN usage ON token = tok
        ORDER BY mrank"""
      })
  }

  /** q173 — length-grouped batch manifest (padding-waste report): sort
    * docs by token length, cut into fixed batches of B consecutive
    * docs, and report each batch's padded cost — `n_docs · max_len`
    * tokens — against its real token mass. This is the dataloader
    * optimization behind dynamic batching (grouping similar lengths
    * slashes pad-token waste vs arrival-order batches); the manifest
    * is what the trainer consumes to budget step costs.
    *
    * Bit-identical to `(row_number() OVER (ORDER BY n_tokens, doc_id)
    * - 1) / B` batch assignment — the oracle IS that naive global
    * window, so the equivalence is hash-checked — but computed WITHOUT
    * one: the q113 histogram discipline again. (1) reduce the corpus
    * to its token-length histogram (map-side combinable; |hist| ≤ max
    * doc length); (2) prefix-sum over the AGGREGATED histogram only;
    * (3) each histogram run covers batches first..last by pure rank
    * arithmetic — explode those (runs + batches total rows, each run's
    * contribution = the overlap of its rank interval with the batch's)
    * and (4) one groupBy(batch) rebuilds every batch's stats, because
    * a batch's docs are a contiguous rank range and ranks within one
    * n_tokens value are interchangeable for {count, max, sum}. No
    * per-doc batch ids are ever materialized — at 100 TB the manifest
    * (n/B rows) is the small output of a linear aggregation, not a
    * global sort. */
  val lengthBatchManifest: Q = {
    val B = 32
    Q(
      "q173_length_batch_manifest",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
          .select(size(toks(col("text"))).as("n_tokens"))
        val hist = docs.groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
        val cum = hist.withColumn("cum_before",
          coalesce(sum(col("cnt")).over(Window.orderBy(col("n_tokens"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        cum
          .select(col("n_tokens"), col("cnt"), col("cum_before"),
            (col("cum_before") + col("cnt")).as("cum_end"))
          .select(col("n_tokens"), col("cum_before"), col("cum_end"),
            explode(sequence(expr(s"cum_before div $B"),
              expr(s"(cum_end - 1) div $B"))).as("batch"))
          .withColumn("overlap",
            least(col("cum_end"), (col("batch") + 1) * B) -
              greatest(col("cum_before"), col("batch") * B))
          .groupBy("batch")
          .agg(sum(col("overlap")).as("n_docs"),
            max(col("n_tokens")).as("max_len"),
            sum(col("n_tokens").cast("long") * col("overlap"))
              .as("sum_tokens"))
          .select(col("batch"), col("n_docs"), col("max_len"),
            col("sum_tokens"),
            (col("n_docs") * col("max_len")).as("padded"),
            (col("n_docs") * col("max_len") - col("sum_tokens"))
              .as("waste"))
          .orderBy("batch")
      },
      Some(s"""WITH t AS (SELECT doc_id,
          cast(len(${sqlToks("text")}) as int) AS n_tokens FROM documents),
        r AS (SELECT n_tokens,
            row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rk
          FROM t)
        SELECT rk // $B AS batch, cast(count(*) as bigint) AS n_docs,
          max(n_tokens) AS max_len,
          cast(sum(n_tokens) as bigint) AS sum_tokens,
          cast(count(*) * max(n_tokens) as bigint) AS padded,
          cast(count(*) * max(n_tokens) - sum(n_tokens) as bigint) AS waste
        FROM r GROUP BY 1 ORDER BY batch"""))
  }

  /** q174 — content-defined chunking (the Rabin/CDC boundary rule of
    * LBFS, Muthitacharoen et al. SOSP'01, at token granularity): cut
    * after token i whenever the hash of the trailing W-token window
    * ≡ 0 (mod D), so boundaries depend only on LOCAL content. This is
    * the insertion-robust complement of q82's fixed-stride chunks: a
    * token inserted at the head shifts EVERY q82 chunk hash, while CDC
    * boundaries downstream of the edit land on the identical windows
    * and the chunk stream resynchronizes — which is what makes
    * chunk-hash dedup work on near-identical crawls of the same page
    * (the spec pins exactly this law). Expected chunk length ≈ D
    * tokens; a final boundary at the last token is ignored (it would
    * cut an empty chunk).
    *
    * Scale shape: boundary detection, start/end derivation, and chunk
    * hashing are all doc-local array ops — ZERO shuffles before the
    * deterministic output sort; per-doc cost is O(n) rolling windows
    * of W tokens. Downstream chunk-level exact dedup is q35's
    * hash-groupBy on chunk_hash. */
  val cdcChunks: Q = {
    val W = 4; val D = 16
    Q(
      "q174_cdc_chunks",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        // scale-adaptive spread (Dsl.spreadIfNarrow): the W-token
        // rolling md5 below is the whole cost; no-op at scale
        spreadIfNarrow(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"), toks(col("text")).as("t"))
          .withColumn("bpos", filter(
            when(size(col("t")) >= W + 1,
              sequence(lit(W), size(col("t")) - 1))
              .otherwise(array().cast("array<int>")),
            i => md5h61(concat_ws(" ",
              slice(col("t"), i - W + 1, lit(W)))) % D === 0))
          .withColumn("starts",
            concat(array(lit(1)), transform(col("bpos"), b => b + 1)))
          .select(col("doc_id"), col("t"), col("starts"),
            posexplode_outer(col("starts")).as(Seq("ci", "st")))
          .withColumn("en",
            when(col("ci") + 2 <= size(col("starts")),
              element_at(col("starts"), col("ci") + 2) - 1)
              .otherwise(size(col("t"))))
          .select(col("doc_id"), col("ci").as("chunk_idx"),
            col("st").as("chunk_start"), col("en").as("chunk_end"),
            (col("en") - col("st") + 1).as("n_tokens"),
            md5h61(concat_ws(" ",
              slice(col("t"), col("st"), col("en") - col("st") + 1)))
              .as("chunk_hash"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
        b AS (SELECT doc_id, t,
            list_filter(generate_series($W, len(t) - 1),
              i -> ${sqlMd5h61(s"array_to_string(t[i-${W - 1}:i], ' ')")}
                % $D = 0) AS bpos
          FROM tk),
        st AS (SELECT doc_id, t,
            list_concat([1], list_transform(bpos, b -> b + 1)) AS starts
          FROM b),
        ex AS (SELECT doc_id, t, starts,
            cast(i - 1 as int) AS ci, cast(starts[i] as int) AS st
          FROM st, unnest(generate_series(1, len(starts))) AS u(i)),
        sp AS (SELECT doc_id, ci, st,
            cast(CASE WHEN ci + 2 <= len(starts) THEN starts[ci + 2] - 1
              ELSE len(t) END as int) AS en, t
          FROM ex)
        SELECT doc_id, ci AS chunk_idx, st AS chunk_start,
          en AS chunk_end, en - st + 1 AS n_tokens,
          ${sqlMd5h61("array_to_string(t[st:en], ' ')")} AS chunk_hash
        FROM sp ORDER BY doc_id, chunk_idx"""),
      bench = true)
  }

  /** q175 — eval-span decontamination APPLIED (the GPT-3 appendix-C
    * discipline, Brown et al. 2020: excise every 13-gram that
    * collides with the eval set from the TRAINING documents, rather
    * than dropping whole docs): q84 only counts collisions and q145
    * excises within-corpus repeats — this is the bipartite form, where
    * the eval side (doc_id % 10 = 0, q84's split convention) is
    * read-only and every train occurrence of an eval 13-token window
    * is cut, splitting the doc around the removed spans. Output is the
    * cleaned train corpus (eval docs are never emitted or modified).
    *
    * Scale shape: the eval side reduces to its DISTINCT window hashes
    * before the join — at production scale a broadcast (eval sets are
    * MBs against a 100 TB corpus; the q84/q96 argument), so the train
    * side is never shuffled at all: hash windows, probe the broadcast,
    * aggregate removal positions per doc (map-side combinable), excise
    * doc-locally. The split predicates push into per-branch pruned
    * scans (the q127/q158 role-split precedent). K=13 matches the
    * published protocol; q143/q145's K=25 substring machinery is the
    * within-corpus sibling. */
  val decontaminateSpans: Q = {
    val K = 13
    Q(
      "q175_decontaminate_spans",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        val docs = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("doc_id"))
          .select(col("doc_id"), toks(col("text")).as("t"))
        val idx = when(size(col("t")) >= K,
          sequence(lit(1), size(col("t")) - (K - 1)))
          .otherwise(array().cast("array<int>"))
        val wins = docs
          .select(col("doc_id"),
            posexplode_outer(transform(idx,
              i => concat_ws(" ", slice(col("t"), i, lit(K)))))
              .as(Seq("pos0", "win")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"),
            md5h61(col("win")).as("h"))
        val evalH = wins.filter(col("doc_id") % 10 === 0)
          .select("h").distinct()
        val removeAgg = wins.filter(col("doc_id") % 10 =!= 0)
          .join(broadcast(evalH), "h")
          .groupBy("doc_id")
          .agg(collect_list(col("pos")).as("rp"))
        docs.filter(col("doc_id") % 10 =!= 0)
          .join(removeAgg, Seq("doc_id"), "left")
          .withColumn("rp", coalesce(col("rp"), array().cast("array<int>")))
          .withColumn("kept", filter(sequence(lit(1), size(col("t"))),
            i => !exists(col("rp"),
              p => i >= p && i <= p + lit(K - 1))))
          .select(col("doc_id"),
            size(col("t")).as("n_before"),
            size(col("kept")).as("n_after"),
            size(col("rp")).as("n_hits"),
            concat_ws(" ",
              transform(col("kept"), i => element_at(col("t"), i)))
              .as("cleaned"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
          SELECT doc_id, ${sqlToks("text")} AS t FROM documents
          WHERE doc_id IS NOT NULL),
        w AS (SELECT doc_id, i AS pos,
            ${sqlMd5h61(s"array_to_string(t[i:i+$K-1], ' ')")} AS h
          FROM t, unnest(generate_series(1, len(t)-$K+1)) AS u(i)),
        ev AS (SELECT DISTINCT h FROM w WHERE doc_id % 10 = 0),
        ra AS (SELECT doc_id, list(pos) AS rp
          FROM w JOIN ev USING (h) WHERE doc_id % 10 <> 0
          GROUP BY doc_id),
        k AS (SELECT t.doc_id, t.t, coalesce(ra.rp, []) AS rp,
            list_filter(generate_series(1, len(t.t)), i ->
              len(list_filter(coalesce(ra.rp, []), p ->
                i >= p AND i <= p + $K - 1)) = 0) AS kept
          FROM t LEFT JOIN ra ON t.doc_id = ra.doc_id
          WHERE t.doc_id % 10 <> 0)
        SELECT doc_id, cast(len(t) as int) AS n_before,
          cast(len(kept) as int) AS n_after,
          cast(len(rp) as int) AS n_hits,
          coalesce(array_to_string(list_transform(kept, i -> t[i]), ' '),
            '') AS cleaned
        FROM k ORDER BY doc_id"""))
  }

  /** q181 — deterministic span corruption (the T5 denoising objective,
    * Raffel et al. 2020 §3.1.4: mask contiguous spans, replace each
    * with a sentinel, emit the dropped spans as the target sequence).
    * Randomness is the q77 salted-hash discipline instead of an RNG:
    * position i starts a span iff md5h61(salt‖doc_id‖i) % 100 < 5 (5%
    * start rate), and that same hash's next two digits pick the span
    * length 1..3 — so the corruption is a pure function of (doc, pos),
    * reproducible across reruns, partitionings, and engines (an
    * rng-based masker can't be oracled and can't be resumed). Spans
    * may overlap; a position is masked iff ANY span covers it, and
    * consecutive masked positions collapse into ONE sentinel (exactly
    * T5's contiguous-span semantics). Output per doc: corrupted text
    * with `<extra_id_k>` sentinels, the target sequence
    * `<extra_id_k> …dropped tokens…`, and the mask bookkeeping.
    *
    * Scale shape: everything is doc-local array arithmetic in one
    * codegen projection — ZERO shuffles (the output sort is the dump
    * determinism only); per-doc cost is O(n²) array-lookup
    * work (the run-index prefix count) — bounded by DOC length like
    * q170's, independent of corpus size.
    * This is the objective-prep stage that runs LAST in the pipeline,
    * so it composes with q115's packing downstream. */
  val spanCorruption: Q = {
    val StartPct = 5 // span-start rate per position, %
    Q(
      "q181_span_corruption",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
        val hOf = (i: org.apache.spark.sql.Column) => md5h61(concat(lit("t5:"),
          col("doc_id").cast("string"), lit(":"), i.cast("string")))
        val idx = sequence(lit(1), size(col("t")))
        val withSpans = docs
          .withColumn("starts", filter(idx, i => hOf(i) % 100 < StartPct))
          // span length from (h div 100) mod 3 WITHOUT an integer div
          // (Spark Column `/` is double division — lossy above 2^53):
          // (h div 100) mod 3 == (h mod 300) div 100, decided by a CASE
          // over the three hundred-bands on BOTH engines
          .withColumn("lens", transform(col("starts"),
            i => lit(1) + when(hOf(i) % 300 < 100, 0)
              .when(hOf(i) % 300 < 200, 1).otherwise(2)))
          // sequence(1, 0) counts DOWN to [1, 0] (the Dsl.shingles3
          // trap): a doc with zero span starts must probe NO indices
          .withColumn("masked", transform(idx, i =>
            exists(
              when(size(col("starts")) >= 1,
                sequence(lit(1), size(col("starts"))))
                .otherwise(array().cast("array<int>")),
              k => i >= element_at(col("starts"), k) &&
                i < element_at(col("starts"), k) +
                  element_at(col("lens"), k))))
        // sentinel index of masked run r = number of run STARTS at or
        // before position i: a masked position opens a run iff its
        // predecessor is unmasked
        // CASE keeps element_at(masked, 0) unevaluated at i = 1 (ANSI
        // mode throws on array index 0; `||` does not short-circuit
        // inside codegen the way CASE branches do)
        val runStart = (i: org.apache.spark.sql.Column) =>
          element_at(col("masked"), i) &&
            when(i === 1, lit(true))
              .otherwise(!element_at(col("masked"), i - 1))
        withSpans
          .withColumn("runIdx", transform(idx, i =>
            size(filter(slice(idx, lit(1), i), j => runStart(j)))))
          .select(col("doc_id"),
            size(col("t")).as("n_tokens"),
            size(filter(col("masked"), m => m)).as("n_masked"),
            size(filter(idx, i => runStart(i))).as("n_spans"),
            concat_ws(" ", filter(transform(idx, i =>
              when(runStart(i),
                concat(lit("<extra_id_"),
                  (element_at(col("runIdx"), i) - 1).cast("string"),
                  lit(">")))
                .when(element_at(col("masked"), i),
                  lit(null).cast("string"))
                .otherwise(element_at(col("t"), i))),
              x => x.isNotNull)).as("corrupted"),
            concat_ws(" ", transform(filter(idx,
              i => element_at(col("masked"), i)), i =>
              when(runStart(i),
                concat(lit("<extra_id_"),
                  (element_at(col("runIdx"), i) - 1).cast("string"),
                  lit("> "), element_at(col("t"), i)))
                .otherwise(element_at(col("t"), i)))).as("target"))
          .orderBy("doc_id")
      },
      Some {
        val h = (i: String) =>
          sqlMd5h61(s"concat('t5:', cast(doc_id as varchar), ':', cast($i as varchar))")
        s"""WITH tk AS (SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
          sp AS (SELECT doc_id, t,
              list_filter(generate_series(1, len(t)),
                i -> ${h("i")} % 100 < $StartPct) AS starts
            FROM tk),
          ln AS (SELECT doc_id, t, starts,
              list_transform(starts,
                i -> 1 + CASE WHEN ${h("i")} % 300 < 100 THEN 0
                  WHEN ${h("i")} % 300 < 200 THEN 1 ELSE 2 END) AS lens
            FROM sp),
          mk AS (SELECT doc_id, t,
              list_transform(generate_series(1, len(t)), i ->
                len(list_filter(generate_series(1, len(starts)), k ->
                  i >= starts[k] AND i < starts[k] + lens[k])) > 0) AS masked
            FROM ln),
          rs AS (SELECT doc_id, t, masked,
              list_transform(generate_series(1, len(t)), i ->
                masked[i] AND (i = 1 OR NOT masked[i - 1])) AS rstart
            FROM mk),
          ri AS (SELECT doc_id, t, masked, rstart,
              list_transform(generate_series(1, len(t)), i ->
                len(list_filter(generate_series(1, i), j -> rstart[j])))
                AS runidx
            FROM rs)
          SELECT doc_id, cast(len(t) as int) AS n_tokens,
            cast(len(list_filter(masked, m -> m)) as int) AS n_masked,
            cast(len(list_filter(rstart, r -> r)) as int) AS n_spans,
            coalesce(array_to_string(list_filter(
              list_transform(generate_series(1, len(t)), i ->
                CASE WHEN rstart[i] THEN
                    concat('<extra_id_', cast(runidx[i] - 1 as varchar), '>')
                  WHEN masked[i] THEN NULL
                  ELSE t[i] END),
              x -> x IS NOT NULL), ' '), '') AS corrupted,
            coalesce(array_to_string(list_transform(
              list_filter(generate_series(1, len(t)), i -> masked[i]), i ->
                CASE WHEN rstart[i] THEN
                    concat('<extra_id_', cast(runidx[i] - 1 as varchar),
                      '> ', t[i])
                  ELSE t[i] END), ' '), '') AS target
          FROM ri ORDER BY doc_id"""
      })
  }

  // ------------------------------------------------------------------
  // q186 — WORDPIECE encode (Wu et al. 2016, the BERT tokenizer family):
  // greedy longest-match-first over a PINNED subword vocabulary with
  // initial-vs-continuation ("##") piece tables — the tokenizer trio's
  // third member next to BPE learn (q147) / BPE encode (q148). BERT's
  // rules faithfully: match the longest vocab prefix at each position,
  // continuation table after the first piece, and if ANY position has
  // no match — or the word exceeds the max char budget — the WHOLE
  // word becomes one [UNK] (matched prefixes are discarded).
  //
  // Execution shape: the greedy loop is a bounded FOLD per word
  // (`aggregate` over 1..24 — each step consumes ≥1 char, and words
  // over 24 chars are [UNK] by the BERT budget rule, so the fold
  // always terminates with an empty remainder), run INSIDE a
  // transform() over the doc's word array: all doc-local, one scan,
  // zero joins, zero explode. The DuckDB twin replays the identical
  // greedy rule as a bounded WITH RECURSIVE over (word, remainder) —
  // a per-position nested CASE on both engines, so any greedy-order
  // bug is a hash mismatch. Vocab lookups are one typedlit Literal
  // per (table, length) — never an array(...) rebuilt per element
  // (the q153 lesson).
  // ------------------------------------------------------------------
  private val WpMaxChars = 24
  private val WpMaxLen = 4
  // singles deliberately exclude q/x/z so the [UNK] path is exercised
  // deterministically by real words (boxes, quiz, zero, ...)
  private val WpSingles: Seq[String] =
    (('a' to 'z').filterNot("qxz".contains(_)) ++ ('0' to '9')).map(_.toString)
  private val WpInit: Seq[String] = WpSingles ++ Seq(
    "th", "in", "an", "re", "on", "at", "en", "or", "er", "to", "of",
    "is", "es", "ar", "al", "st", "the", "and", "ing", "with", "that")
  private val WpCont: Seq[String] = WpSingles ++ Seq(
    "th", "in", "an", "re", "on", "at", "en", "or", "er", "es", "ar",
    "al", "st", "nd", "nt", "ly", "le", "ti", "ing", "tion")

  val wordpieceEncode: Q = {
    import org.apache.spark.sql.Column
    // longest vocab prefix of rem (0 = no match), table chosen by `first`
    def plen(rem: Column, first: Column): Column = {
      val cands = (WpMaxLen to 1 by -1).map { l =>
        val iv = typedlit(WpInit.filter(_.length == l))
        val cv = typedlit(WpCont.filter(_.length == l))
        when(length(rem) >= l &&
          ((first && array_contains(iv, substring(rem, 1, l))) ||
            (!first && array_contains(cv, substring(rem, 1, l)))), l)
      }
      coalesce(cands :+ lit(0): _*)
    }
    def sqlPlen(rem: String, first: String): String = {
      def set(v: Seq[String]) = v.map(p => s"'$p'").mkString("[", ", ", "]")
      val cands = (WpMaxLen to 1 by -1).map { l =>
        s"""WHEN len($rem) >= $l AND (($first AND
           list_contains(${set(WpInit.filter(_.length == l))}, substr($rem, 1, $l)))
           OR ((NOT $first) AND
           list_contains(${set(WpCont.filter(_.length == l))}, substr($rem, 1, $l))))
           THEN $l"""
      }.mkString(" ")
      s"(CASE $cands ELSE 0 END)"
    }
    Q(
      "q186_wordpiece_encode",
      (s, d) => {
        val pw = transform(col("ws"), w => {
          val init = struct(
            when(length(w) > WpMaxChars, lit("")).otherwise(w).as("rem"),
            when(length(w) > WpMaxChars, lit(1)).otherwise(lit(0)).as("cnt"),
            (length(w) > WpMaxChars).as("unk"),
            lit(true).as("first"))
          aggregate(sequence(lit(1), lit(WpMaxChars)), init,
            (acc, _) => {
              val rem = acc.getField("rem")
              val done = acc.getField("unk") || rem === ""
              val pl = plen(rem, acc.getField("first"))
              struct(
                when(done, rem).when(pl === 0, lit(""))
                  .otherwise(rem.substr(pl + 1, length(rem))).as("rem"),
                when(done, acc.getField("cnt"))
                  .when(pl === 0, lit(1))
                  .otherwise(acc.getField("cnt") + 1).as("cnt"),
                when(done, acc.getField("unk"))
                  .otherwise(pl === 0).as("unk"),
                when(done, acc.getField("first")).otherwise(lit(false))
                  .as("first"))
            },
            acc => struct(acc.getField("cnt").as("cnt"),
              acc.getField("unk").as("unk")))
        })
        // spreadIfNarrow tried r19, reverted: measured neutral-to-worse
        // (the greedy fold is lighter than it looks at this doc length)
        Tables.documents(s, d)
          .select(col("doc_id"),
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ws"))
          .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
            aggregate(pw, lit(0),
              (a, x) => a + x.getField("cnt")).cast("long").as("n_pieces"),
            aggregate(pw, lit(0), (a, x) =>
              a + when(x.getField("unk"), 1).otherwise(0))
              .cast("long").as("n_unk"))
          .withColumn("fertility",
            when(col("n_words") > 0,
              col("n_pieces").cast("double") / col("n_words")))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE d AS MATERIALIZED (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
          FROM documents),
        wrd AS MATERIALIZED (SELECT doc_id, i AS wid, ws[i] AS w
          FROM d, unnest(generate_series(1, len(ws))) AS u(i)),
        step AS (
          SELECT doc_id, wid,
            CASE WHEN len(w) > $WpMaxChars THEN '' ELSE w END AS rem,
            CASE WHEN len(w) > $WpMaxChars THEN 1 ELSE 0 END AS cnt,
            len(w) > $WpMaxChars AS unk,
            true AS "first"
          FROM wrd
          UNION ALL
          SELECT doc_id, wid,
            CASE WHEN plen = 0 THEN '' ELSE substr(rem, plen + 1) END,
            CASE WHEN plen = 0 THEN 1 ELSE cnt + 1 END,
            plen = 0,
            false
          FROM (SELECT doc_id, wid, rem, cnt,
              ${sqlPlen("rem", "\"first\"")} AS plen
            FROM step WHERE rem <> '') s),
        fin AS (SELECT doc_id, wid, cnt, unk FROM step WHERE rem = ''),
        agg AS (SELECT doc_id, cast(count(*) as bigint) AS n_words,
            cast(sum(cnt) as bigint) AS n_pieces,
            cast(count(*) FILTER (WHERE unk) as bigint) AS n_unk
          FROM fin GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_words, 0) AS n_words,
          coalesce(n_pieces, 0) AS n_pieces, coalesce(n_unk, 0) AS n_unk,
          CASE WHEN coalesce(n_words, 0) > 0
            THEN cast(n_pieces as double) / n_words END AS fertility
        FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""),
      bench = true)
  }

  // ------------------------------------------------------------------
  // q188 — UNIGRAM-LM Viterbi segmentation (Kudo 2018, the SentencePiece
  // model family): segment every word into the maximum-likelihood piece
  // sequence under a PINNED piece vocabulary with pinned counts, and
  // emit each piece's Viterbi usage count over the corpus — the E-step
  // of SentencePiece's EM (usage counts are what the M-step renormalizes
  // and the pruning step ranks). Completes the tokenizer family: BPE
  // learn (q147) / BPE encode (q148) / WordPiece greedy (q186) /
  // unigram Viterbi (here) — the q50b discipline (oracle the STEP's
  // math, since the full EM loop is seeded float iteration).
  //
  // Determinism: piece log-probs ln(c/T) are computed ONCE in Scala and
  // embedded as the same floor(·1e9) integer literals in BOTH the Spark
  // expression and the SQL twin — no libm crosses engines; DP scores
  // are exact integer sums, and ties break to the SHORTEST candidate
  // piece (strict > in l = 1..4 order, mirrored in the twin).
  //
  // Scale shape: the corpus reduces to (word type, freq) first — the
  // q147 discipline, so the DP runs once per TYPE, not per instance;
  // the DP + backtrace are bounded folds (≤ 24 chars per word — longer
  // words filtered, the SentencePiece max-length rule) entirely inside
  // one projection; output is one groupBy over vocab-sized keys.
  // ------------------------------------------------------------------
  private[graft] val UniVocab: Map[String, Long] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString -> 5L)
    val multi = Seq("th" -> 50L, "the" -> 80L, "in" -> 40L, "an" -> 30L,
      "er" -> 30L, "on" -> 25L, "at" -> 25L, "re" -> 25L, "en" -> 20L,
      "or" -> 20L, "es" -> 20L, "ar" -> 15L, "al" -> 15L, "st" -> 15L,
      "ing" -> 60L, "and" -> 50L, "ed" -> 20L, "to" -> 20L, "of" -> 15L,
      "is" -> 15L, "tion" -> 40L)
    (singles ++ multi).toMap
  }
  private val UniT: Long = UniVocab.values.sum
  /** floor(ln(c/T)·1e9) — computed once here, embedded as the same
    * literal on both engines. */
  private[graft] def uniLp(c: Long): Long =
    math.floor(math.log(c.toDouble / UniT) * 1e9).toLong
  private[graft] val UniMaxLen = 4

  val unigramViterbi: Q = {
    import org.apache.spark.sql.Column
    def lpMap(l: Int): Column = typedlit(
      UniVocab.filter(_._1.length == l).map { case (p, c) => p -> uniLp(c) })
    Q(
      "q188_unigram_viterbi",
      (s, d) => {
        val w = col("w")
        // dp: entry i (1-based) = position i-1; sc exact-int score, bl
        // the backpointer piece length
        val dp = aggregate(sequence(lit(1), length(w).cast("int")),
          array(struct(lit(0L).as("sc"), lit(0).as("bl"))),
          (acc, j) => {
            val cands = (1 to UniMaxLen).map { l =>
              val piece = w.substr(j - (l - 1), lit(l))
              val lp = element_at(lpMap(l), piece)
              when(j >= l && lp.isNotNull,
                struct((element_at(acc, j - l + 1).getField("sc") + lp)
                  .as("sc"), lit(l).as("bl")))
            }
            val best = cands.reduce((a, b) =>
              when(b.isNotNull &&
                (a.isNull || b.getField("sc") > a.getField("sc")), b)
                .otherwise(a))
            concat(acc, array(best))
          })
        val bt = (dpc: Column) => aggregate(
          sequence(lit(1), lit(WpMaxChars)),
          struct(length(w).cast("int").as("p"),
            array().cast("array<string>").as("ps")),
          (st, _) => {
            val p = st.getField("p")
            val bl = element_at(dpc, p + 1).getField("bl")
            when(p > 0, struct((p - bl).as("p"),
              concat(st.getField("ps"),
                array(w.substr(p - bl + 1, bl))).as("ps")))
              .otherwise(st)
          },
          st => st.getField("ps"))
        // spreadIfNarrow tried r19, reverted: the Viterbi DP above the
        // groupBy is the real cost and was already parallel; spreading
        // the cheap regexp stage only added an exchange (norm ~1.0 ->
        // 1.11 measured)
        Tables.documents(s, d)
          .select(explode(
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
          .filter(length(col("w")) <= WpMaxChars)
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .withColumn("dp", dp)
          .select(col("freq"), explode(bt(col("dp"))).as("piece"))
          .groupBy("piece")
          .agg(sum(col("freq")).cast("long").as("viterbi_count"))
          .orderBy("piece")
      },
      Some {
        def lpCase(l: Int, pieceExpr: String): String = {
          val entries = UniVocab.filter(_._1.length == l).toSeq.sorted
            .map { case (p, c) => s"WHEN '$p' THEN ${uniLp(c)}" }
            .mkString(" ")
          s"(CASE $pieceExpr $entries ELSE NULL END)"
        }
        // candidate columns for the entry at position j+1 (counter j)
        val candCols = (1 to UniMaxLen).map { l =>
          s"""CASE WHEN j + 1 >= $l
               AND ${lpCase(l, s"substr(w, j + 2 - $l, $l)")} IS NOT NULL
             THEN struct_pack(sc := dp[j + 2 - $l].sc +
               ${lpCase(l, s"substr(w, j + 2 - $l, $l)")}, bl := $l)
             END AS c$l"""
        }.mkString(", ")
        // shortest-piece tie-break: strict > in c1..c4 order
        val best = (2 to UniMaxLen).foldLeft("c1") { (acc, l) =>
          s"(CASE WHEN c$l IS NOT NULL AND ($acc IS NULL OR c$l.sc > ($acc).sc) THEN c$l ELSE $acc END)"
        }
        s"""WITH RECURSIVE wf AS MATERIALIZED (
            SELECT w, cast(count(*) as bigint) AS freq FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                AS w FROM documents)
            WHERE len(w) <= $WpMaxChars GROUP BY w),
          vit AS (
            SELECT w, freq, 0 AS j,
              [struct_pack(sc := 0::BIGINT, bl := 0)] AS dp
            FROM wf
            UNION ALL
            SELECT w, freq, j + 1, list_append(dp, $best)
            FROM (SELECT w, freq, j, dp, $candCols
                  FROM vit WHERE j < len(w)) s),
          fin AS (SELECT w, freq, dp FROM vit WHERE j = len(w)),
          bt AS (
            SELECT w, freq, len(w) AS p, []::VARCHAR[] AS ps, dp FROM fin
            UNION ALL
            SELECT w, freq, p - dp[p + 1].bl,
              list_append(ps, substr(w, p - dp[p + 1].bl + 1, dp[p + 1].bl)),
              dp
            FROM bt WHERE p > 0),
          pieces AS (SELECT unnest(ps) AS piece, freq
            FROM bt WHERE p = 0)
          SELECT piece, cast(sum(freq) as bigint) AS viterbi_count
          FROM pieces GROUP BY piece ORDER BY piece"""
      },
      bench = true)
  }

  /** q198 — prefix-cache savings audit, the BATCH-INFERENCE layout
    * query: serving stacks reuse the KV cache of a shared token prefix
    * across requests (the public radix-/prefix-caching design in vLLM
    * / SGLang), so "how much prefix mass does this corpus share, at
    * which depths" decides whether prefix-aware request ordering is
    * worth building. Per prefix depth K ∈ {2,4,8}: eligible docs
    * (≥ K tokens), distinct K-token prefixes, reuse slots (Σ (n−1)
    * over prefix groups — every doc after a group's first hits the
    * cache), saved tokens (· K) and the saved fraction of eligible
    * token mass. Grouping by the prefix string IS the radix-tree level
    * — no pairwise comparison anywhere.
    *
    * Scale shape: tokenize once; the three depths ride ONE scan via a
    * 3-element literal explode (rows 3× corpus, cheaper than three
    * passes); groupBy (k, prefix) is map-combinable; the per-level
    * rollup is 3 rows. saved_frac = one IEEE divide of exact ints. */
  val prefixCacheAudit: Q = {
    val Ks = Seq(2, 4, 8)
    Q(
      "q198_prefix_cache_audit",
      (s, d) => {
        val ex = Tables.documents(s, d)
          .select(toks(col("text")).as("t"))
          .select(explode(typedlit(Ks)).as("k"), col("t"))
          .filter(size(col("t")) >= col("k"))
          .select(col("k"),
            size(col("t")).cast("long").as("dl"),
            concat_ws(" ", slice(col("t"), lit(1), col("k"))).as("pfx"))
        ex.groupBy("k", "pfx")
          .agg(count(lit(1)).as("n"), sum(col("dl")).as("gdl"))
          .groupBy("k")
          .agg(sum(col("n")).as("n_docs"),
            count(lit(1)).as("n_prefixes"),
            sum(col("gdl")).as("total_tokens"),
            sum(when(col("n") > 1, col("n") - 1).otherwise(0L))
              .as("n_reused"),
            (sum(when(col("n") > 1, col("n") - 1).otherwise(0L)) *
              col("k")).as("saved_tokens"))
          .select(col("k"), col("n_docs"), col("n_prefixes"),
            col("n_reused"), col("saved_tokens"), col("total_tokens"),
            (col("saved_tokens").cast("double") / col("total_tokens"))
              .as("saved_frac"))
          .orderBy("k")
      },
      Some(s"""WITH tk AS MATERIALIZED (SELECT ${sqlToks("text")} AS t
            FROM documents),
          ks(k) AS (VALUES (2), (4), (8)),
          ex AS (SELECT ks.k, cast(len(t) as bigint) AS dl,
              array_to_string(t[1:ks.k], ' ') AS pfx
            FROM tk, ks WHERE len(t) >= ks.k),
          g AS (SELECT k, pfx, count(*) AS n, sum(dl) AS gdl
            FROM ex GROUP BY 1, 2)
          SELECT k, cast(sum(n) as bigint) AS n_docs,
            cast(count(*) as bigint) AS n_prefixes,
            cast(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) as bigint)
              AS n_reused,
            cast(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) * k as bigint)
              AS saved_tokens,
            cast(sum(gdl) as bigint) AS total_tokens,
            cast(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) * k as double)
              / cast(sum(gdl) as bigint) AS saved_frac
          FROM g GROUP BY k ORDER BY k"""))
  }

  /** q237 — SFT chat-template assembly + loss-mask accounting: turn
    * each document into a (prompt, response) training example under a
    * pinned chat template and account where the tokens go. The split is
    * deterministic — prompt = the first ⌈n/3⌉ tokens, response = the
    * rest — and the template constants are pinned: 10 masked overhead
    * tokens per example (system preamble + user-turn role markers,
    * loss-masked like the prompt) and 3 trained overhead tokens
    * (assistant-turn markers + end-of-turn, which DO take loss). The
    * audit reports, per 128-token total-length band, how much of the
    * token budget the loss mask discards — the number that decides
    * whether short-prompt examples are worth packing (q115) or the
    * template overhead is eating the batch (fixed overhead dominates
    * short examples: mask_frac → 1 as n → 2).
    *
    * Scale shape: a pure per-row projection (token count + integer
    * arithmetic, no text is ever re-assembled — counting the template
    * costs nothing) into one map-combinable hash aggregate over
    * length bands. Per-row mask fraction is ONE IEEE division of exact
    * longs; band-level mask_frac is a ratio of exact sums (the q219
    * fertility discipline). */
  val sftMaskAccounting: Q = Q(
    "q237_sft_mask_accounting",
    (s, d) => {
      Tables.documents(s, d)
        .select(size(toks(col("text"))).cast("long").as("n"))
        .filter(col("n") >= 2)
        .select(col("n"), (expr("(n + 2) div 3") + lit(10L)).as("masked"),
          (col("n") + lit(13L)).as("total"))
        .withColumn("frac", col("masked").cast("double") / col("total"))
        .groupBy(expr("total div 128").as("len_bucket"))
        .agg(count(lit(1)).as("n_examples"),
          sum(col("total")).cast("long").as("tok_total"),
          sum(col("masked")).cast("long").as("tok_masked"),
          max(col("frac")).as("max_frac"))
        .select(col("len_bucket"), col("n_examples"), col("tok_total"),
          col("tok_masked"),
          (col("tok_masked").cast("double") / col("tok_total"))
            .as("mask_frac"),
          col("max_frac"))
        .orderBy("len_bucket")
    },
    Some(s"""WITH t AS (SELECT cast(len(${sqlToks("text")}) as bigint) AS n
          FROM documents),
      e AS (SELECT n, (n + 2) // 3 + 10 AS masked, n + 13 AS total
        FROM t WHERE n >= 2),
      f AS (SELECT *, cast(masked as double) / total AS frac FROM e)
      SELECT total // 128 AS len_bucket, count(*) AS n_examples,
        cast(sum(total) as bigint) AS tok_total,
        cast(sum(masked) as bigint) AS tok_masked,
        cast(sum(masked) as double) / cast(sum(total) as bigint)
          AS mask_frac,
        max(frac) AS max_frac
      FROM f GROUP BY 1 ORDER BY 1"""))

  /** q247 — DECLARATIVE Count-Min sketch, oracle-verified: the q103
    * companion that closes its documented gap ("CMS internals aren't
    * SQL-replicable" — true of Spark's opaque built-in, so q103's
    * estimates are spec-pinned only; a CMS built from salted 61-bit
    * hashes is just two aggregates, and then BOTH engines replay the
    * whole sketch and the estimates themselves hash-match). Depth 4 ×
    * width 256: counter(r, b) = token instances whose salted hash
    * md5h61("cms:r:" ⧺ term) lands in bucket b; estimate(term) =
    * min over rows of its 4 counters. Output: the exact top-20 terms
    * (q103's list) with exact count, CMS estimate, and the
    * overestimate — which the CMS construction guarantees ≥ 0 (min of
    * counters that each count a SUPERSET of the term's instances), a
    * law the oracle hash proves on this corpus rather than asserts.
    *
    * Scale shape: the sketch build is ONE map-combinable aggregate
    * over (row, bucket) — 1024 cells total at ANY corpus size (the
    * fixed-memory property that makes CMS the 100 TB heavy-hitter
    * tool); the probe joins the top-k terms' recomputed (row, bucket)
    * keys against the broadcast cell table. */
  val countMinAudit: Q = {
    val Depth = 4
    val Width = 256
    Q(
      "q247_countmin_audit",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        val terms = Tables.documents(s, d)
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("doc_id"))
          .select(explode(toks(lower(col("text")))).as("term"))
        def bucket(r: Int, t: org.apache.spark.sql.Column)
            : org.apache.spark.sql.Column =
          pmod(md5h61(concat(lit(s"cms:$r:"), t)), lit(Width.toLong))
        val cells = terms
          .select(posexplode(array((0 until Depth).map(r =>
            bucket(r, col("term"))): _*)).as(Seq("r", "b")))
          .groupBy("r", "b").agg(count(lit(1)).as("c"))
        val top = terms.groupBy("term").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("term")).limit(20)
        val probes = top.select(col("term"), col("exact_n"),
          posexplode(array((0 until Depth).map(r =>
            bucket(r, col("term"))): _*)).as(Seq("r", "b")))
        probes.join(broadcast(cells), Seq("r", "b"))
          .groupBy("term", "exact_n")
          .agg(min(col("c")).as("cms_est"))
          .select(col("term"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("overestimate"))
          .orderBy(col("exact_n").desc, col("term"))
      },
      Some {
        val rows = (0 until Depth).map(r =>
          s"SELECT term, $r AS r, ${sqlMd5h61(s"concat('cms:$r:', term)")} % $Width AS b FROM tok")
          .mkString(" UNION ALL ")
        s"""WITH tok AS MATERIALIZED (SELECT unnest(${sqlToks("lower(text)")})
              AS term FROM documents),
          keys AS MATERIALIZED ($rows),
          cells AS (SELECT r, b, cast(count(*) as bigint) AS c
            FROM keys GROUP BY 1, 2),
          top AS (SELECT term, cast(count(*) as bigint) AS exact_n
            FROM tok GROUP BY 1 ORDER BY exact_n DESC, term LIMIT 20),
          pk AS (SELECT DISTINCT k.term, k.r, k.b FROM keys k
            JOIN top ON k.term = top.term),
          est AS (SELECT pk.term, min(cells.c) AS cms_est
            FROM pk JOIN cells USING (r, b) GROUP BY 1)
          SELECT top.term, top.exact_n, est.cms_est,
            est.cms_est - top.exact_n AS overestimate
          FROM top JOIN est ON top.term = est.term
          ORDER BY top.exact_n DESC, top.term"""
      })
  }

  /** q250 — tokenizer migration audit: the corpus encoded under the
    * CURRENT vocab (the pinned 16-merge table) and under the previous
    * release (its 8-merge PREFIX — a real migration is always
    * merge-list extension: BPE learning only ever appends), per
    * source. The readout every tokenizer upgrade needs BEFORE
    * re-tokenizing 100 TB: how many tokens the new vocab saves, where
    * (per source), and the sequence-length inflation you'd keep paying
    * by NOT migrating. extra_tokens ≥ 0 row-by-row is the BPE
    * monotonicity law (applying more merges never increases the symbol
    * count) — proven by hash here, not asserted.
    *
    * Scale shape: both merge chains run per piece inside whole-stage
    * codegen in ONE projection over ONE scan (the q148/q219 shape —
    * the old and new encoders share the pre-tokenize and char-split
    * work); the rollup is one map-combinable groupBy over |sources|
    * keys; inflation is a single IEEE division of exact sums. */
  val tokenizerMigration: Q = {
    import org.apache.spark.sql.Column
    def nNew(c: Column): Column = bpeSymCount(bpeApply(c, BpeMerges16))
    def nOld(c: Column): Column = bpeSymCount(bpeApply(c, BpeMerges16.take(8)))
    Q(
      "q250_tokenizer_migration",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          expr(s"regexp_extract_all(lower($StripSep), '$BpePat', 0)").as("pieces"))
        .select(col("source"), size(col("pieces")).as("n_pieces"),
          aggregate(transform(col("pieces"), p => nNew(p)),
            lit(0), (a, x) => a + x).as("tok_new"),
          aggregate(transform(col("pieces"), p => nOld(p)),
            lit(0), (a, x) => a + x).as("tok_old"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_pieces")).cast("long").as("n_pieces"),
          sum(col("tok_new")).cast("long").as("tok_new"),
          sum(col("tok_old")).cast("long").as("tok_old"))
        .select(col("source"), col("n_docs"), col("n_pieces"),
          col("tok_new"), col("tok_old"),
          (col("tok_old") - col("tok_new")).as("extra_tokens"),
          when(col("tok_new") > 0,
            col("tok_old").cast("double") / col("tok_new"))
            .as("inflation"))
        .orderBy("source"),
      Some {
        val sep2 = "chr(1)||chr(1)"
        def lit1(x: String) = "'" + x.replace("'", "''") + "'"
        val wrapped = s"$sep2 || regexp_replace(w, '(.)', '\\1'||$sep2, 'gs')"
        def chain(ms: Seq[(String, String)]): String =
          ms.foldLeft(wrapped) { case (acc, (a, b)) =>
            s"replace($acc, chr(1)||${lit1(a)}||$sep2||${lit1(b)}||chr(1), " +
              s"chr(1)||${lit1(a + b)}||chr(1))"
          }
        def nSql(ms: Seq[(String, String)]): String =
          s"cast(coalesce(list_sum(list_transform(pieces, w -> " +
            s"len(list_filter(string_split(${chain(ms)}, $sep2), " +
            s"x -> x <> '')))), 0) as int)"
        s"""WITH p AS (SELECT source,
            regexp_extract_all(lower(replace(text, chr(1), '')), '$BpePat')
              AS pieces
          FROM documents),
        e AS (SELECT source, cast(len(pieces) as int) AS n_pieces,
            ${nSql(BpeMerges16)} AS tok_new,
            ${nSql(BpeMerges16.take(8))} AS tok_old
          FROM p),
        g AS (SELECT source, cast(count(*) as bigint) AS n_docs,
            cast(sum(n_pieces) as bigint) AS n_pieces,
            cast(sum(tok_new) as bigint) AS tok_new,
            cast(sum(tok_old) as bigint) AS tok_old
          FROM e GROUP BY 1)
        SELECT source, n_docs, n_pieces, tok_new, tok_old,
          tok_old - tok_new AS extra_tokens,
          CASE WHEN tok_new > 0
            THEN cast(tok_old as double) / tok_new END AS inflation
        FROM g ORDER BY source"""
      })
  }

  /** q253 — context-length truncation loss curve: at each candidate
    * max_seq_len (128 / 512 / 2048 tokens), how many documents would be
    * cut and how much token mass falls off the end — the measurement
    * behind choosing a training context length (too short throws away
    * the document tails that long-context models exist to learn; the
    * alternative costs quadratic attention). The complement of q173
    * (which prices PADDING under a chosen length; this prices
    * TRUNCATION) and of q115/q82 packing (which avoid the choice by
    * splitting — at the cost of severed context).
    *
    * Scale shape: one token-count scan, a 3-literal cap explode, one
    * map-combinable aggregate — the whole curve rides a single pass
    * (the q205 sweep discipline); lost-share is one IEEE division of
    * exact sums. */
  val truncationCurve: Q = Q(
    "q253_truncation_curve",
    (s, d) => Tables.documents(s, d)
      .select(size(toks(col("text"))).cast("long").as("n"))
      .select(col("n"), explode(typedLit(Seq(128L, 512L, 2048L))).as("cap"))
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n") > col("cap"), 1)).as("n_truncated"),
        sum(col("n")).cast("long").as("tok_total"),
        sum(when(col("n") > col("cap"), col("n") - col("cap"))
          .otherwise(0L)).cast("long").as("tok_lost"))
      .select(col("cap"), col("n_docs"), col("n_truncated"),
        col("tok_total"), col("tok_lost"),
        (col("tok_lost").cast("double") / col("tok_total"))
          .as("lost_share"))
      .orderBy("cap"),
    Some(s"""WITH t AS (SELECT cast(len(${sqlToks("text")}) as bigint) AS n
          FROM documents),
      e AS (SELECT n, cap FROM t,
        (VALUES (128), (512), (2048)) AS c(cap))
      SELECT cast(cap as bigint) AS cap,
        cast(count(*) as bigint) AS n_docs,
        cast(count_if(n > cap) as bigint) AS n_truncated,
        cast(sum(n) as bigint) AS tok_total,
        cast(sum(CASE WHEN n > cap THEN n - cap ELSE 0 END) as bigint)
          AS tok_lost,
        cast(sum(CASE WHEN n > cap THEN n - cap ELSE 0 END) as double)
          / cast(sum(n) as bigint) AS lost_share
      FROM e GROUP BY cap ORDER BY cap"""))

  // ------------------------------------------------------------------
  // q265 — contamination threshold curve: the decontamination cost
  // sweep over q84's measure. For cutoffs T ∈ {1,2,4,8,16}, a train doc
  // is dropped when it shares ≥ T distinct word-3-gram hashes with the
  // eval slice; per cutoff: docs dropped, token mass dropped, and that
  // mass as exact ppm of ALL train tokens — the removal-cost readout
  // that decides where to set T (T=1 is GPT-3's drop-any-collision; a
  // curve that flattens by T=4 says the strictness is nearly free, one
  // that keeps falling says T=1 is burning real training mass on
  // incidental n-gram collisions). The q205 threshold-sweep pattern
  // applied to the contamination family (q84 exact, q96 bloom, q168
  // fuzzy, q175 spans).
  //
  // Scale shape: ONE q84-shaped broadcast join builds the per-doc
  // n_shared, the 5-cutoff sweep is a doc-local literal explode +
  // filter (map-combinable — never a grid × corpus join), and only the
  // 5-row result left-joins the grid so zero-drop cutoffs still report.
  // All-integer outputs.
  // ------------------------------------------------------------------
  val contaminationCurve: Q = Q(
    "q265_contamination_curve",
    (s, d) => {
      val cuts = Seq(1L, 2L, 4L, 8L, 16L)
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), explode(shingles3(col("t"))).as("sh"))
        .select(col("doc_id"), md5h61(col("sh")).as("h"))
        .distinct()
      val eval_ = sh.filter(col("doc_id") % 10 === 0)
        .select(col("h")).distinct()
      val nShared = sh.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(eval_), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      val trainToks = Tables.documents(s, d)
        .filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tok"))
      val tot = trainToks.agg(sum(col("n_tok")).as("tot_tok"))
      val per = nShared.join(trainToks, "doc_id")
        .select(col("n_shared"), col("n_tok"),
          explode(typedlit(cuts)).as("cutoff"))
        .filter(col("n_shared") >= col("cutoff"))
        .groupBy("cutoff")
        .agg(count(lit(1)).as("nf"), sum(col("n_tok")).as("ft"))
      val grid = s.range(1).select(explode(typedlit(cuts)).as("cutoff"))
      grid.join(per, Seq("cutoff"), "left")
        .crossJoin(broadcast(tot))
        .select(col("cutoff"),
          coalesce(col("nf"), lit(0L)).as("n_flagged"),
          coalesce(col("ft"), lit(0L)).as("flagged_tokens"),
          expr("coalesce(ft, 0L) * 1000000 div tot_tok").as("flagged_ppm"))
        .orderBy("cutoff")
    },
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id, ${sqlMd5h61("g.s")} AS h
        FROM (SELECT doc_id, ${sqlShingles3(sqlToks("text"))} AS gs
              FROM documents), unnest(gs) AS g(s)),
      ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
      ns AS (SELECT doc_id, count(*) AS n_shared
        FROM sh JOIN ev USING (h) WHERE doc_id % 10 <> 0 GROUP BY doc_id),
      tk AS MATERIALIZED (SELECT doc_id,
          cast(len(${sqlToks("text")}) as bigint) AS n_tok
        FROM documents WHERE doc_id % 10 <> 0),
      tot AS (SELECT cast(sum(n_tok) as bigint) AS tot_tok FROM tk),
      grid AS (SELECT unnest([1, 2, 4, 8, 16]) AS cutoff),
      per AS (SELECT cutoff,
          cast(count(n.doc_id) as bigint) AS n_flagged,
          cast(coalesce(sum(t.n_tok), 0) as bigint) AS flagged_tokens
        FROM grid g
        LEFT JOIN ns n ON n.n_shared >= g.cutoff
        LEFT JOIN tk t ON t.doc_id = n.doc_id
        GROUP BY cutoff)
      SELECT cutoff, n_flagged, flagged_tokens,
        flagged_tokens * 1000000 // tot_tok AS flagged_ppm
      FROM per, tot ORDER BY cutoff"""))

  // ------------------------------------------------------------------
  // q266 — contamination attribution by source: the ACTIONABLE cut of
  // q84/q265. Per train source: docs sharing any 3-gram with the eval
  // slice, the shared-hash mass, the flagged token mass, and the
  // flagged fraction of that source's own tokens in exact ppm. At
  // 100 TB the per-doc report (q84) is millions of rows nobody reads;
  // a 5-row per-feed table is the form the decision takes — a source
  // at 900k ppm is scraping the eval set's upstream and gets DROPPED,
  // one at 2k ppm gets per-doc decontamination (q175). Same join
  // economics as q84 (broadcast eval-hash side), one extra broadcast
  // join to the doc metadata, grid-completed so clean sources report
  // zero instead of vanishing.
  // ------------------------------------------------------------------
  val contaminationBySource: Q = Q(
    "q266_contamination_by_source",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = docs
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), explode(shingles3(col("t"))).as("sh"))
        .select(col("doc_id"), md5h61(col("sh")).as("h"))
        .distinct()
      val eval_ = sh.filter(col("doc_id") % 10 === 0)
        .select(col("h")).distinct()
      val flagged = sh.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(eval_), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      val meta = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("source"),
          size(toks(col("text"))).cast("long").as("n_tok"))
      val perSource = meta.join(flagged, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_shared").isNotNull, 1L).otherwise(0L))
            .as("n_flagged"),
          coalesce(sum(col("n_shared")), lit(0L)).as("shared_hashes"),
          sum(col("n_tok")).as("src_tokens"),
          coalesce(sum(when(col("n_shared").isNotNull, col("n_tok"))),
            lit(0L)).as("flagged_tokens"))
      perSource
        .select(col("source"), col("n_docs"), col("n_flagged"),
          col("shared_hashes"), col("flagged_tokens"),
          // nullif: a source whose docs are all empty (src_tokens = 0)
          // must read NULL on both engines — DuckDB's // raises on 0
          expr("flagged_tokens * 1000000 div nullif(src_tokens, 0)")
            .as("flagged_ppm"))
        .orderBy("source")
    },
    Some(s"""WITH sh AS (
        SELECT DISTINCT doc_id, ${sqlMd5h61("g.s")} AS h
        FROM (SELECT doc_id, ${sqlShingles3(sqlToks("text"))} AS gs
              FROM documents), unnest(gs) AS g(s)),
      ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
      ns AS (SELECT doc_id, count(*) AS n_shared
        FROM sh JOIN ev USING (h) WHERE doc_id % 10 <> 0 GROUP BY doc_id),
      meta AS (SELECT doc_id, source,
          cast(len(${sqlToks("text")}) as bigint) AS n_tok
        FROM documents WHERE doc_id % 10 <> 0),
      agg AS (SELECT m.source,
          cast(count(*) as bigint) AS n_docs,
          cast(count(n.doc_id) as bigint) AS n_flagged,
          cast(coalesce(sum(n.n_shared), 0) as bigint) AS shared_hashes,
          cast(sum(m.n_tok) as bigint) AS src_tokens,
          cast(coalesce(sum(CASE WHEN n.doc_id IS NOT NULL
            THEN m.n_tok END), 0) as bigint) AS flagged_tokens
        FROM meta m LEFT JOIN ns n USING (doc_id)
        GROUP BY m.source)
      SELECT source, n_docs, n_flagged, shared_hashes, flagged_tokens,
        flagged_tokens * 1000000 // nullif(src_tokens, 0) AS flagged_ppm
      FROM agg ORDER BY source"""))

  /** q274 — RAG chunking economics: the chunk-size × overlap grid
    * priced FROM the corpus (the q192/q259/q272 discipline — a knob a
    * deployment usually guesses, here a measured table). Overlapping
    * chunks buy retrieval recall at token-duplication cost, and the
    * overhead depends on the corpus LENGTH DISTRIBUTION, not just the
    * ratio ov/size: short docs emit one chunk regardless (zero
    * overhead), long docs pay ov extra tokens per boundary — so two
    * corpora with equal mean length but different tails price the same
    * grid differently. Per (chunk_tokens, overlap_tokens) over the
    * whitespace token counts: stride = size − ov, chunks-per-doc =
    * 1 + ceil(max(0, n − size) / stride) (the q31 sliding-window
    * family's count, closed-form), emitted = n + (chunks − 1)·ov,
    * overhead_ppm = Σ emitted × 10⁶ div Σ n − 10⁶ — exact integers end
    * to end (integer ceil by (x + s − 1) div s).
    *
    * Scale shape: ONE documents scan computing n = token count per
    * doc; the 9-point grid explode multiplies rows 9× INTO a
    * map-combinable aggregate (never materialized), output 9 rows at
    * any corpus size. */
  val chunkOverlapEconomics: Q = Q(
    "q274_chunk_overlap_economics",
    (s, d) => {
      val grid: Seq[(Int, Int)] = for {
        sz <- Seq(128, 256, 512); den <- Seq(0, 8, 4)
      } yield (sz, if (den == 0) 0 else sz / den)
      val n = Tables.documents(s, d)
        .select(size(Dsl.toks(col("text"))).cast("long").as("n"))
      n.select(col("n"), explode(array(grid.map { case (sz, ov) =>
            struct(lit(sz).as("chunk_tokens"), lit(ov).as("overlap_tokens"))
          }: _*)).as("g"))
        .select(col("n"), col("g.chunk_tokens").as("chunk_tokens"),
          col("g.overlap_tokens").as("overlap_tokens"))
        .withColumn("stride", (col("chunk_tokens") - col("overlap_tokens"))
          .cast("long"))
        .withColumn("n_chunks", lit(1L) +
          expr("(greatest(n - chunk_tokens, 0L) + stride - 1) div stride"))
        .withColumn("emitted",
          col("n") + (col("n_chunks") - 1L) * col("overlap_tokens"))
        .groupBy("chunk_tokens", "overlap_tokens")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).cast("long").as("corpus_tokens"),
          sum(col("n_chunks")).cast("long").as("total_chunks"),
          sum(col("emitted")).cast("long").as("emitted_tokens"))
        .select(col("chunk_tokens"), col("overlap_tokens"), col("n_docs"),
          col("corpus_tokens"), col("total_chunks"), col("emitted_tokens"),
          // decimal(38,0) headroom: corpus-level token sums × 10⁶ can
          // pass 2⁶³ at real scale (the q248 div discipline)
          expr("cast(cast(emitted_tokens as decimal(38,0)) * 1000000 " +
            "div corpus_tokens - 1000000 as bigint)").as("overhead_ppm"))
        .orderBy("chunk_tokens", "overlap_tokens")
    },
    Some(s"""WITH n AS (SELECT cast(len(${sqlToks("text")}) as bigint) AS n
          FROM documents),
        grid AS (SELECT * FROM (VALUES (128, 0), (128, 16), (128, 32),
          (256, 0), (256, 32), (256, 64),
          (512, 0), (512, 64), (512, 128))
          AS g(chunk_tokens, overlap_tokens)),
        per AS (SELECT chunk_tokens, overlap_tokens, n,
            cast(chunk_tokens - overlap_tokens as bigint) AS stride
          FROM n, grid),
        ch AS (SELECT chunk_tokens, overlap_tokens, n,
            1 + (greatest(n - chunk_tokens, 0) + stride - 1) // stride
              AS n_chunks
          FROM per)
        SELECT chunk_tokens, overlap_tokens,
          cast(count(*) as bigint) AS n_docs,
          cast(sum(n) as bigint) AS corpus_tokens,
          cast(sum(n_chunks) as bigint) AS total_chunks,
          cast(sum(n + (n_chunks - 1) * overlap_tokens) as bigint)
            AS emitted_tokens,
          cast(sum(n + (n_chunks - 1) * overlap_tokens)
            * 1000000 // sum(n) - 1000000 as bigint) AS overhead_ppm
        FROM ch GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(textChunks, piiScrub, contamination, salientTerms,
    bigramLift, domainMix, lengthBuckets, saltedJoinAgg, varianceUdaf,
    approxPercentiles, bloomContamination, fuzzyPairs, heavyHitters,
    weightedSample, oovRate, embeddingQuantize, sequencePacking,
    winnowFingerprints, bpeMerges, bpeEncode, tokenizerEconomics,
    bpeVocabUtil, lengthBatchManifest,
    cdcChunks, decontaminateSpans, spanCorruption, wordpieceEncode,
    unigramViterbi, prefixCacheAudit, sftMaskAccounting, countMinAudit,
    tokenizerMigration, truncationCurve, contaminationCurve,
    contaminationBySource, chunkOverlapEconomics)
}

package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering — the trainable counterpart of q31's
  * heuristic quality gate. Real LLM-data pipelines run a lightweight
  * classifier (fastText-style) over every document and keep the
  * high-probability slice; this is that shape on Spark ML:
  * deterministic weak labels → logistic regression → score ALL docs →
  * threshold. Rows-only for the driver (iterative float optimization
  * isn't SQL-replicable); QualityModelSpec pins the semantics.
  *
  * Scale notes: featurization is a linear per-row projection; LR
  * training is Spark ML's distributed L-BFGS (tree-aggregated
  * gradients); scoring is a broadcast of the coefficient vector into a
  * map — nothing here materializes on the driver beyond the model.
  */
object QualityModel {
  import Dsl._

  /** Per-doc numeric features shared by train + score: token count,
    * type-token ratio, mean token length, repetition share. */
  private[operators] def featurize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("t", toks(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("double"))
      .withColumn("ttr",
        size(array_distinct(col("t"))).cast("double") / size(col("t")))
      .withColumn("avg_len",
        aggregate(transform(col("t"), x => length(x)), lit(0),
          (a, x) => a + x).cast("double") / size(col("t")))
      .select("doc_id", "text", "n_tokens", "ttr", "avg_len")

  /** q98: train on deterministic weak labels (the q31 heuristic as the
    * teacher: long + lexically diverse = positive), score the whole
    * corpus, emit stable outputs (label + prediction are discrete;
    * probabilities stay internal — float-iteration noise must not reach
    * the driver compare). */
  val qualityClassifier: Q = Q(
    "q98_quality_classifier",
    (s, d) => {
      // Single-threshold teacher (linearly separable in feature space,
      // so the spec can demand the student actually fits it); ttr and
      // avg_len ride along as extra features the optimizer may use.
      val feats = featurize(s, d)
        .withColumn("label",
          when(col("n_tokens") >= 30, 1.0).otherwise(0.0))
      val asm = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("n_tokens", "ttr", "avg_len"))
        .setOutputCol("features")
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(25).setRegParam(0.01).setStandardization(true)
      val model = lr.fit(asm.transform(feats))
      model.transform(asm.transform(feats))
        .select(col("doc_id"), col("label").cast("int").as("weak_label"),
          col("prediction").cast("int").as("pred"))
        .orderBy("doc_id")
    },
    None)

  /** q98b: the q98 scoring path with FIXED literal weights, so the
    * scoring semantics (featurize → w·x → sigmoid → threshold) are
    * DuckDB-replicable and oracle-verified even though the TRAINED
    * model (q98's L-BFGS fit) is not. The sigmoid is quantized to a
    * millionth before comparison (the q142b discipline — tolerance ~10⁹
    * coarser than libm ulp drift between JVM and DuckDB exp()), and the
    * discrete prediction comes from the SIGN of the logit (exact
    * arithmetic, no libm at all). Scoring is a per-row projection in
    * whole-stage codegen — the 100 TB shape of a fastText-style corpus
    * filter where the model is a broadcast constant. */
  private val W0 = -6.0; private val Wt = 0.12
  private val Wr = 2.0; private val Wl = 0.25

  val fixedWeightScorer: Q = Q(
    "q98b_fixed_weight_scorer",
    (s, d) => {
      val z = ((lit(W0) + lit(Wt) * col("n_tokens"))
        + lit(Wr) * col("ttr")) + lit(Wl) * col("avg_len")
      featurize(s, d)
        .withColumn("z", z)
        .select(col("doc_id"),
          floor((lit(1.0) / (lit(1.0) + exp(-col("z")))) * 1e6)
            .cast("long").as("qscore_q6"),
          (col("z") >= 0.0).cast("int").as("pred"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (
        SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
      f AS (SELECT doc_id,
          cast(len(t) as double) AS n_tokens,
          cast(len(list_distinct(t)) as double) / len(t) AS ttr,
          cast(list_sum(list_transform(t, x -> length(x))) as double)
            / len(t) AS avg_len
        FROM t),
      sc AS (SELECT doc_id,
          ((($W0 + $Wt * n_tokens) + $Wr * ttr) + $Wl * avg_len) AS z
        FROM f)
      SELECT doc_id,
        cast(floor((1.0 / (1.0 + exp(-z))) * 1000000.0) as bigint)
          AS qscore_q6,
        cast(z >= 0.0 as int) AS pred
      FROM sc ORDER BY doc_id"""))

  /** q150: bigram-LM perplexity scoring — the CCNet-style quality
    * filter (score each doc under a language model trained on the
    * corpus; outliers are gibberish or boilerplate). The model is an
    * add-one-smoothed bigram LM fit on the corpus itself:
    * P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V), and each doc's score is the
    * average negative log-likelihood of its bigrams.
    *
    * Determinism: ln() differs by ulps across libms AND a float sum
    * across partitions is order-dependent, so each bigram's −ln(p) is
    * quantized to 10⁻⁹ FIRST (p itself is integer-derived and
    * bit-identical; the quantization absorbs libm drift), the per-doc
    * sum then runs in exact integer arithmetic (order-independent —
    * the partitioning-invariance law holds by construction), and the
    * final average is one double divide of two exact ints quantized to
    * 10⁻⁶ (the q142b discipline).
    *
    * Scale shape: bigram model = one groupBy with map-side partials
    * over the corpus explode; the model is enriched with its unigram
    * denominators FIRST (a vocab-sized shuffle join — at 100 TB the
    * unigram table outgrows any broadcast, and p is computed once per
    * bigram TYPE, not per instance), then doc scoring is ONE corpus
    * equi-join on (w1,w2) against the finished model; V is a 1-row
    * broadcast. Docs with fewer than 2 tokens have no bigrams and are
    * excluded (inner joins, identical on both engines). */
  /** Per-doc bigram NLL — (doc_id, n_bigrams, nll_q6), unordered.
    * The q150 machinery, factored so q171's bucketing reuses the same
    * model + scoring plan (see [[bigramPerplexity]] for the full
    * determinism + scale argument). */
  private[operators] def docNll(s: SparkSession, d: String): DataFrame = {
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), toks(lower(col("text"))).as("t"))
      // no-op predicates written out so BOTH explode branches (doc
      // bigrams, unigram counts) infer identical constraints and
      // share one tokenize+scan — the q86 symmetrize discipline;
      // scan count pinned in PlanAuditSpec's allowance sweep.
      // isNotNull(doc_id) sits on the SHARED source for the same
      // reason (the q145 discipline): q171's lang join would
      // otherwise infer it into only the bigram branch's scan and
      // de-canonicalize the exchange uni hangs off (the q133 trap).
      .filter(size(col("t")) > 0 && col("t").isNotNull &&
        col("doc_id").isNotNull)
      .repartition(col("doc_id"))
    val db = tk.select(col("doc_id"), explode(transform(
        when(size(col("t")) >= 2, sequence(lit(1), size(col("t")) - 1))
          .otherwise(array().cast("array<int>")),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val bm = db.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val uni = tk.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val vc = uni.agg(count(lit(1)).as("v"))
    val model = bm
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vc))
      .select(col("w1"), col("w2"), floor(-log(
        (col("c_xy") + 1) / (col("c_w") + col("v")).cast("double"))
        * 1e9).cast("long").as("nll_q9"))
    db.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_q9")).as("s9"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("s9") / (col("n_bigrams") * 1000.0)).cast("long")
          .as("nll_q6"))
  }

  /** SQL CTE chain ending in `nllt(doc_id, n_bigrams, nll_q6)` — the
    * oracle twin of [[docNll]], shared by q150/q171. tk and db are
    * MATERIALIZED: both are referenced twice downstream and DuckDB
    * inlines CTEs per reference site (the q147 lesson). */
  private[operators] val sqlDocNllCtes: String =
    s"""tk AS MATERIALIZED (
        SELECT doc_id, ${sqlToks("lower(text)")} AS t FROM documents),
      db AS MATERIALIZED (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)),
      bm AS (SELECT w1, w2, count(*) AS c_xy FROM db GROUP BY 1, 2),
      uni AS MATERIALIZED (SELECT g.w AS w, count(*) AS c_w
        FROM tk, unnest(t) AS g(w) GROUP BY 1),
      vc AS (SELECT count(*) AS v FROM uni),
      q AS (SELECT doc_id,
          cast(floor(-ln((c_xy + 1) / cast(c_w + v as double)) * 1000000000.0)
            as bigint) AS nll_q9
        FROM db JOIN bm USING (w1, w2) JOIN uni ON db.w1 = uni.w, vc),
      nllt AS (SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
          cast(floor(sum(nll_q9) / (count(*) * 1000.0)) as bigint) AS nll_q6
        FROM q GROUP BY doc_id)"""

  val bigramPerplexity: Q = Q(
    "q150_bigram_nll",
    (s, d) => docNll(s, d).orderBy("doc_id"),
    Some(s"""WITH $sqlDocNllCtes
      SELECT doc_id, n_bigrams, nll_q6 FROM nllt ORDER BY doc_id"""),
    bench = true)

  /** q171 — CCNet-style perplexity bucketing (Wenzek et al. 2020):
    * per language, docs are cut into head / middle / tail thirds by
    * their LM score (q150's bigram NLL), the classic precursor to
    * "train on head+middle, drop tail". Bucket semantics are VALUE
    * cutoffs, not ntile: c1/c2 are the per-lang scores at exact ranks
    * ⌈n/3⌉ and ⌈2n/3⌉ in (nll_q6, doc_id) order, and a doc's bucket is
    * 1 + (nll > c1) + (nll > c2) — every tied doc lands in the same
    * bucket (CCNet cuts on percentile values too), and the assignment
    * is derivable from a doc's own score + two broadcast scalars.
    *
    * Scale shape: the cutoffs come from the q113 histogram discipline,
    * NOT a per-lang window over the corpus (ntile/row_number over
    * PARTITION BY lang routes an entire language — most of a 100 TB
    * corpus is one language — through a single task's sort). Here:
    * (1) reduce scores to a (lang, nll_q6) histogram — map-side
    * combinable, |rows| = distinct scores per lang; (2) cumulative
    * count over the AGGREGATED histogram only; (3) c1/c2 = min score
    * whose cumulative count reaches the rank target — a per-lang agg;
    * (4) one broadcast join stamps buckets on the scored corpus.
    * Docs with <2 tokens have no bigrams and are excluded (inner
    * join), exactly as in q150. */
  val perplexityBuckets: Q = Q(
    "q171_perplexity_buckets",
    (s, d) => {
      val scored = graft.CacheScope.cached(
        docNll(s, d).join(
          Tables.documents(s, d).select("doc_id", "lang"), "doc_id"))
      val hist = scored.groupBy("lang", "nll_q6")
        .agg(count(lit(1)).as("cnt"))
      val cum = hist.withColumn("cum",
        sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(col("nll_q6"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      val ks = hist.groupBy("lang").agg(sum(col("cnt")).as("n"))
        .select(col("lang"), expr("(n + 2) div 3").as("k1"),
          expr("(2 * n + 2) div 3").as("k2"))
      val cuts = cum.join(ks, "lang")
        .groupBy("lang")
        .agg(min(when(col("cum") >= col("k1"), col("nll_q6"))).as("c1"),
          min(when(col("cum") >= col("k2"), col("nll_q6"))).as("c2"))
      scored.join(broadcast(cuts), "lang")
        .select(col("doc_id"), col("lang"), col("nll_q6"),
          (lit(1) + (col("nll_q6") > col("c1")).cast("int") +
            (col("nll_q6") > col("c2")).cast("int")).as("bucket"))
        .withColumn("label",
          when(col("bucket") === 1, "head")
            .when(col("bucket") === 2, "middle").otherwise("tail"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $sqlDocNllCtes,
      sc AS MATERIALIZED (SELECT n.doc_id, d.lang, n.nll_q6
        FROM nllt n JOIN documents d USING (doc_id)),
      tot AS (SELECT lang, count(*) AS n FROM sc GROUP BY lang),
      ranked AS (SELECT lang, nll_q6,
          row_number() OVER (PARTITION BY lang
            ORDER BY nll_q6, doc_id) AS rn
        FROM sc),
      cuts AS (SELECT r.lang,
          min(CASE WHEN r.rn = (t.n + 2) // 3 THEN r.nll_q6 END) AS c1,
          min(CASE WHEN r.rn = (2 * t.n + 2) // 3 THEN r.nll_q6 END) AS c2
        FROM ranked r JOIN tot t USING (lang) GROUP BY r.lang)
      SELECT s.doc_id, s.lang, s.nll_q6,
        1 + cast(s.nll_q6 > c.c1 as int) + cast(s.nll_q6 > c.c2 as int)
          AS bucket,
        CASE 1 + cast(s.nll_q6 > c.c1 as int) + cast(s.nll_q6 > c.c2 as int)
          WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS label
      FROM sc s JOIN cuts c USING (lang) ORDER BY s.doc_id"""),
    bench = true)

  /** q99: compressibility score — zlib-deflated length over raw length.
    * Low ratio = repetitive/templated text (the classic cheap quality
    * heuristic next to q80's explicit repetition gates). Deflate runs
    * per-row inside mapPartitions with one shared Deflater per
    * partition (allocation-free hot loop); rows-only for the driver
    * (DuckDB has no zlib), semantics pinned by spec. */
  val compressibility: Q = Q(
    "q99_compressibility",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      import org.apache.spark.sql.{Encoders, Row}
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaInt, Encoders.scalaDouble)
      docs.mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION)
        // Deflater holds NATIVE zlib buffers; on long-lived executors
        // waiting for GC finalization accumulates off-heap memory, so
        // release it deterministically when the task ends.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 20)
        rows.map { r: Row =>
          val id = r.getLong(0)
          val raw = r.getString(1).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) n += deflater.deflate(buf)
          (id, raw.length, n, n.toDouble / raw.length)
        }
      }(enc).toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
        .orderBy("doc_id")
    },
    None)

  /** q179 — Stupid Backoff trigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" §4: the score that made
    * web-scale LMs tractable — no discounting, no normalization, just
    * relative frequencies with a fixed 0.4 backoff multiplier). The
    * model is fit on the TRAIN split (doc_id % 10 < 8, the q127
    * convention) and scores the HELD-OUT docs — which is both the real
    * deployment shape and what makes backoff actually fire (a
    * self-trained model never sees an unseen trigram). Per trigram:
    * S(w₃|w₁w₂) = C₃/C₂(w₁w₂) if the trigram was seen, else
    * 0.4·C₂(w₂w₃)/C₁(w₂) if that bigram was seen, else 0.16·C₁(w₃)/T
    * (0 for OOV w₃ — scores are linear frequencies, not logs, so zero
    * is well-defined). Output per eval doc: the backoff mix (how many
    * trigrams resolved at each level — the model-coverage diagnostic)
    * and the mean score.
    *
    * Determinism: every branch is a ratio of exact integer counts
    * (both engines divide as double) optionally times the same 0.4 /
    * 0.16 double literal — identical IEEE ops on identical operands —
    * and the per-doc MEAN follows the q150 discipline: quantize each
    * trigram's score to 10⁻⁹ first, sum exactly as integers
    * (order-independent), one final divide.
    *
    * Scale shape: the model is three groupBys with map-side partials
    * over the train explode (counts per trigram/bigram/unigram TYPE,
    * not instance); scoring is equi-joins of the eval trigrams against
    * the finished count tables on their type keys — at 100 TB the
    * n-gram tables outgrow any broadcast and these joins shuffle on
    * the n-gram key exactly like q150's; T is a 1-row broadcast. The
    * denominator joins are guaranteed-match by construction (a seen
    * trigram implies its seen prefix bigram; a seen bigram implies its
    * seen head unigram), so every branch is total. */
  val stupidBackoff: Q = Q(
    "q179_stupid_backoff",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), toks(lower(col("text"))).as("t"))
        .filter(size(col("t")) > 0 && col("t").isNotNull &&
          col("doc_id").isNotNull)
        .repartition(col("doc_id"))
      def ngrams(df: DataFrame, n: Int) = {
        val idx = when(size(col("t")) >= n,
          sequence(lit(1), size(col("t")) - (n - 1)))
          .otherwise(array().cast("array<int>"))
        df.select(col("doc_id"), explode(transform(idx, i =>
          struct((0 until n).map(k =>
            element_at(col("t"), i + k).as(s"w${k + 1}")): _*))).as("g"))
          .select(col("doc_id") +: (1 to n).map(k => col(s"g.w$k")): _*)
      }
      val train = tk.filter(col("doc_id") % 10 < 8)
      val c3 = ngrams(train, 3).groupBy("w1", "w2", "w3")
        .agg(count(lit(1)).as("c3"))
      val c2 = ngrams(train, 2).groupBy("w1", "w2")
        .agg(count(lit(1)).as("c2"))
      val c1 = ngrams(train, 1).groupBy("w1")
        .agg(count(lit(1)).as("c1"))
      val tTot = c1.agg(sum(col("c1")).as("tt"))
      val ev = ngrams(tk.filter(col("doc_id") % 10 >= 8), 3)
      val scored = ev
        .join(c3, Seq("w1", "w2", "w3"), "left")
        .join(c2.select(col("w1"), col("w2"), col("c2").as("c2a")),
          Seq("w1", "w2"), "left")
        .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
          col("c2").as("c2b")), Seq("w2", "w3"), "left")
        .join(c1.select(col("w1").as("w2"), col("c1").as("c1b")),
          Seq("w2"), "left")
        .join(c1.select(col("w1").as("w3"), col("c1").as("c1c")),
          Seq("w3"), "left")
        .crossJoin(broadcast(tTot))
        .withColumn("lvl",
          when(col("c3").isNotNull, 3)
            .when(col("c2b").isNotNull, 2).otherwise(1))
        .withColumn("s",
          when(col("lvl") === 3, col("c3") / col("c2a"))
            .when(col("lvl") === 2,
              lit(0.4) * (col("c2b") / col("c1b")))
            .otherwise(lit(0.16) *
              (coalesce(col("c1c"), lit(0L)) / col("tt"))))
        .withColumn("s9", floor(col("s") * 1e9).cast("long"))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_hit3"),
          sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_hit2"),
          sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_back1"),
          sum(col("s9")).as("s9sum"))
        .select(col("doc_id"), col("n_trigrams"), col("n_hit3"),
          col("n_hit2"), col("n_back1"),
          floor(col("s9sum") / (col("n_trigrams") * 1000.0)).cast("long")
            .as("score_q6"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS MATERIALIZED (
        SELECT doc_id, ${sqlToks("lower(text)")} AS t FROM documents
        WHERE doc_id IS NOT NULL),
      tr3 AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3,
          count(*) AS c3
        FROM tk, unnest(generate_series(1, len(t) - 2)) AS g(i)
        WHERE doc_id % 10 < 8 GROUP BY 1, 2, 3),
      tr2 AS MATERIALIZED (SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
        WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      tr1 AS MATERIALIZED (SELECT g.w AS w1, count(*) AS c1
        FROM tk, unnest(t) AS g(w)
        WHERE doc_id % 10 < 8 GROUP BY 1),
      tt AS (SELECT sum(c1) AS tt FROM tr1),
      ev AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        FROM tk, unnest(generate_series(1, len(t) - 2)) AS g(i)
        WHERE doc_id % 10 >= 8),
      sc AS (SELECT ev.doc_id,
          CASE WHEN c3 IS NOT NULL THEN 3
               WHEN b.c2 IS NOT NULL THEN 2 ELSE 1 END AS lvl,
          CASE WHEN c3 IS NOT NULL THEN c3 / a.c2
               WHEN b.c2 IS NOT NULL THEN
                 cast(0.4 as double) * (b.c2 / u2.c1)
               ELSE cast(0.16 as double) * (coalesce(u3.c1, 0) / tt.tt)
          END AS s
        FROM ev
        LEFT JOIN tr3 ON ev.w1 = tr3.w1 AND ev.w2 = tr3.w2
          AND ev.w3 = tr3.w3
        LEFT JOIN tr2 a ON ev.w1 = a.w1 AND ev.w2 = a.w2
        LEFT JOIN tr2 b ON ev.w2 = b.w1 AND ev.w3 = b.w2
        LEFT JOIN tr1 u2 ON ev.w2 = u2.w1
        LEFT JOIN tr1 u3 ON ev.w3 = u3.w1, tt),
      q AS (SELECT doc_id, lvl,
          cast(floor(s * 1000000000.0) as bigint) AS s9 FROM sc)
      SELECT doc_id, cast(count(*) as bigint) AS n_trigrams,
        cast(count(*) FILTER (WHERE lvl = 3) as bigint) AS n_hit3,
        cast(count(*) FILTER (WHERE lvl = 2) as bigint) AS n_hit2,
        cast(count(*) FILTER (WHERE lvl = 1) as bigint) AS n_back1,
        cast(floor(sum(s9) / (count(*) * 1000.0)) as bigint) AS score_q6
      FROM q GROUP BY doc_id ORDER BY doc_id"""))

  /** q187 — scorer calibration (reliability diagram): before a
    * classifier score is used as a KEEP-probability over a 100 TB
    * corpus (sampling weight, threshold, mixture quota), its
    * probabilities must be checked against observed frequencies —
    * Guo et al. 2017's reliability buckets, over the q98b fixed-weight
    * scorer and the same weak label q98 trains on (n_tokens ≥ 30).
    * Per predicted-probability decile: doc count, mean predicted
    * probability, observed positive rate — a calibrated scorer has
    * the two columns tracking each other; the spec folds them into an
    * expected-calibration-error bound.
    *
    * Determinism: the sigmoid is the q98b millionth-quantized integer,
    * so bucket ids, sums and both output ratios are integer-derived;
    * each ratio is one/two IEEE divides of identical operands on both
    * engines. CAVEAT (same as q98b): the floor(·1e6) tolerance is ~10⁹
    * coarser than libm ulp drift, but both engines still call their
    * own native exp() BEFORE the floor — an input whose sigmoid lands
    * within one ulp of a 1e-6 boundary would quantize differently per
    * engine and flip a bucket id. The guarantee is EMPIRICAL (hash-
    * green at sf0.001/0.01/0.1), not structural; a testdata
    * regeneration could surface it, in which case pin a piecewise
    * sigmoid table (the q188 floor(·1e9) literal discipline). Scale
    * shape: one scan, one 10-row hash-agg; the model is a literal
    * constant. */
  val scorerCalibration: Q = Q(
    "q187_scorer_calibration",
    (s, d) => {
      val z = ((lit(W0) + lit(Wt) * col("n_tokens"))
        + lit(Wr) * col("ttr")) + lit(Wl) * col("avg_len")
      featurize(s, d)
        .withColumn("p6",
          floor((lit(1.0) / (lit(1.0) + exp(-z))) * 1e6).cast("long"))
        .withColumn("lab", when(col("n_tokens") >= 30, 1L).otherwise(0L))
        .groupBy(least(expr("p6 div 100000"), lit(9L)).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("p6")).as("sum_p6"),
          sum(col("lab")).as("n_pos"))
        .select(col("bucket"), col("n_docs"),
          (col("sum_p6").cast("double") / col("n_docs") / 1e6)
            .as("mean_pred"),
          (col("n_pos").cast("double") / col("n_docs")).as("obs_rate"))
        .orderBy("bucket")
    },
    Some(s"""WITH t AS (
        SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
      f AS (SELECT doc_id,
          cast(len(t) as double) AS n_tokens,
          cast(len(list_distinct(t)) as double) / len(t) AS ttr,
          cast(list_sum(list_transform(t, x -> length(x))) as double)
            / len(t) AS avg_len
        FROM t),
      sc AS (SELECT doc_id,
          cast(floor((1.0 / (1.0 + exp(-((($W0 + $Wt * n_tokens)
            + $Wr * ttr) + $Wl * avg_len)))) * 1000000.0) as bigint) AS p6,
          CASE WHEN n_tokens >= 30 THEN 1 ELSE 0 END AS lab
        FROM f)
      SELECT least(p6 // 100000, 9) AS bucket,
        cast(count(*) as bigint) AS n_docs,
        cast(sum(p6) as double) / count(*) / 1000000.0 AS mean_pred,
        cast(sum(lab) as double) / count(*) AS obs_rate
      FROM sc GROUP BY 1 ORDER BY 1"""))

  /** q231 — Jelinek-Mercer interpolation λ-sweep (Chen & Goodman 1999
    * §2.2's baseline smoother, the other classical answer to unseen
    * n-grams next to q179's Stupid Backoff): p(w₂|w₁) = λ·c₁₂/c₁ +
    * (1−λ)·c₂/T, fit on the train split (doc_id % 10 < 8) and scored
    * on held-out bigrams, for λ ∈ {¼, ½, ¾} — ALL THREE operating
    * points riding ONE scoring pass (the q205 sweep discipline), so
    * the output is the tuning table itself: which λ minimizes
    * held-out NLL. Unlike backoff, interpolation never hits a zero
    * for a seen target word (c₂ ≥ 1 ⇒ p > 0); bigrams whose w₁ OR w₂
    * is unseen in train are counted as OOV and excluded (ln 0 is the
    * alternative — scores are reported over the scorable mass, with
    * the OOV count printed beside them).
    *
    * Determinism: λ is a dyadic literal; each division/multiply/add
    * is one exactly-rounded IEEE op on identical operands, so the ln
    * input is bit-identical across engines and each bigram's −ln(p)
    * quantizes to the same 10⁻⁹ integer (the q150 argument); sums are
    * exact longs, one final floor-divide.
    *
    * Scale shape: q179's exactly — model = two map-combinable type
    * groupBys over the train explode, scoring = equi-joins of the
    * eval bigram instances against the count tables on their type
    * keys (shuffle joins; n-gram tables outgrow broadcast at 100 TB),
    * T a 1-row broadcast; the λ-sweep adds three integer columns to
    * the SAME aggregate, and the 3-row unpivot is an explode(map) of
    * one row (the q176 discipline — never a union of re-aggregations). */
  val jmInterpolation: Q = Q(
    "q231_jm_interpolation",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), toks(lower(col("text"))).as("t"))
        .filter(size(col("t")) > 0 && col("t").isNotNull &&
          col("doc_id").isNotNull)
        .repartition(col("doc_id"))
      def bigrams(df: DataFrame) = {
        val idx = when(size(col("t")) >= 2,
          sequence(lit(1), size(col("t")) - 1))
          .otherwise(array().cast("array<int>"))
        df.select(col("doc_id"), explode(transform(idx, i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("g"))
          .select(col("g.w1"), col("g.w2"))
      }
      val train = tk.filter(col("doc_id") % 10 < 8)
      val bm = bigrams(train).groupBy("w1", "w2")
        .agg(count(lit(1)).as("c12"))
      val uni = train.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val tTot = uni.agg(sum(col("c1")).as("tt"))
      val ev = bigrams(tk.filter(col("doc_id") % 10 >= 8))
      def p(lam: Double) =
        lit(lam) * (coalesce(col("c12"), lit(0L)) / col("cw1")) +
          lit(1.0 - lam) * (col("cw2") / col("tt"))
      def s9(lam: Double) =
        sum(when(!col("oov"), floor(-log(p(lam)) * 1e9).cast("long"))
          .otherwise(0L))
      val agg = ev
        .join(bm, Seq("w1", "w2"), "left")
        .join(uni.select(col("w").as("w1"), col("c1").as("cw1")),
          Seq("w1"), "left")
        .join(uni.select(col("w").as("w2"), col("c1").as("cw2")),
          Seq("w2"), "left")
        .crossJoin(broadcast(tTot))
        .withColumn("oov", col("cw1").isNull || col("cw2").isNull)
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
          s9(0.25).as("s9a"), s9(0.5).as("s9b"), s9(0.75).as("s9c"))
        .withColumn("n_scored", col("n_total") - col("n_oov"))
      agg.select(col("n_scored"), col("n_oov"),
          explode(map(lit(0.25), col("s9a"), lit(0.5), col("s9b"),
            lit(0.75), col("s9c"))).as(Seq("lam", "s9")))
        .select(col("lam"), col("n_scored"), col("n_oov"),
          when(col("n_scored") > 0,
            floor(col("s9") / (col("n_scored") * 1000.0)).cast("long"))
            .as("nll_q6"))
        .orderBy("lam")
    },
    Some(s"""WITH tk AS MATERIALIZED (
        SELECT doc_id, ${sqlToks("lower(text)")} AS t FROM documents
        WHERE doc_id IS NOT NULL),
      bm AS MATERIALIZED (SELECT t[i] AS w1, t[i+1] AS w2,
          count(*) AS c12
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
        WHERE doc_id % 10 < 8 GROUP BY 1, 2),
      uni AS MATERIALIZED (SELECT g.w AS w, count(*) AS c1
        FROM tk, unnest(t) AS g(w)
        WHERE doc_id % 10 < 8 GROUP BY 1),
      tt AS (SELECT sum(c1) AS tt FROM uni),
      ev AS (SELECT t[i] AS w1, t[i+1] AS w2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
        WHERE doc_id % 10 >= 8),
      sc AS (SELECT ev.w1, ev.w2, bm.c12, u1.c1 AS cw1, u2.c1 AS cw2,
          tt.tt, (u1.c1 IS NULL OR u2.c1 IS NULL) AS oov
        FROM ev LEFT JOIN bm ON ev.w1 = bm.w1 AND ev.w2 = bm.w2
          LEFT JOIN uni u1 ON ev.w1 = u1.w
          LEFT JOIN uni u2 ON ev.w2 = u2.w, tt),
      m AS MATERIALIZED (SELECT
          cast(count(*) as bigint) AS n_total,
          cast(count_if(oov) as bigint) AS n_oov,
          sum(CASE WHEN NOT oov THEN cast(floor(-ln(
            0.25 * (coalesce(c12, 0) / cast(cw1 as double)) +
            0.75 * (cw2 / cast(tt as double))) * 1000000000.0) as bigint)
            ELSE 0 END) AS s9a,
          sum(CASE WHEN NOT oov THEN cast(floor(-ln(
            0.5 * (coalesce(c12, 0) / cast(cw1 as double)) +
            0.5 * (cw2 / cast(tt as double))) * 1000000000.0) as bigint)
            ELSE 0 END) AS s9b,
          sum(CASE WHEN NOT oov THEN cast(floor(-ln(
            0.75 * (coalesce(c12, 0) / cast(cw1 as double)) +
            0.25 * (cw2 / cast(tt as double))) * 1000000000.0) as bigint)
            ELSE 0 END) AS s9c
        FROM sc)
      SELECT v.lam, m.n_total - m.n_oov AS n_scored, m.n_oov,
        CASE WHEN m.n_total - m.n_oov > 0 THEN cast(floor(
          (CASE v.k WHEN 1 THEN m.s9a WHEN 2 THEN m.s9b ELSE m.s9c END)
          / ((m.n_total - m.n_oov) * 1000.0)) as bigint) END AS nll_q6
      FROM m, (VALUES (0.25, 1), (0.5, 2), (0.75, 3)) AS v(lam, k)
      ORDER BY v.lam"""))

  val all: Seq[Q] = Seq(qualityClassifier, fixedWeightScorer,
    bigramPerplexity, perplexityBuckets, compressibility, stupidBackoff,
    jmInterpolation, scorerCalibration)
}

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
  val bigramPerplexity: Q = Q(
    "q150_bigram_nll",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), toks(lower(col("text"))).as("t"))
        // no-op predicates written out so BOTH explode branches (doc
        // bigrams, unigram counts) infer identical constraints and
        // share one tokenize+scan — the q86 symmetrize discipline;
        // scan count pinned in PlanAuditSpec's allowance sweep
        .filter(size(col("t")) > 0 && col("t").isNotNull)
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
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, ${sqlToks("lower(text)")} AS t FROM documents),
      db AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)),
      bm AS (SELECT w1, w2, count(*) AS c_xy FROM db GROUP BY 1, 2),
      uni AS (SELECT g.w AS w, count(*) AS c_w
        FROM tk, unnest(t) AS g(w) GROUP BY 1),
      vc AS (SELECT count(*) AS v FROM uni),
      q AS (SELECT doc_id,
          cast(floor(-ln((c_xy + 1) / cast(c_w + v as double)) * 1000000000.0)
            as bigint) AS nll_q9
        FROM db JOIN bm USING (w1, w2) JOIN uni ON db.w1 = uni.w, vc)
      SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
        cast(floor(sum(nll_q9) / (count(*) * 1000.0)) as bigint) AS nll_q6
      FROM q GROUP BY doc_id ORDER BY doc_id"""),
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

  val all: Seq[Q] = Seq(qualityClassifier, fixedWeightScorer,
    bigramPerplexity, compressibility)
}

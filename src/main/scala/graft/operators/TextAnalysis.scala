package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting (builder brief; generalizes the reference's dead
  * `extract_keywords`, app.py:81-96).
  *
  * All run over the `documents` table. Every numeric is produced with the
  * same IEEE operations on both engines so the DuckDB oracle hash-matches
  * exactly (int/int division happens once, in double, both sides).
  */
object TextAnalysis {
  import Dsl._

  /** Token + char counting (whitespace tokenizer). */
  val tokenCount: Q = Q(
    "q30_token_count",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks(col("text"))).as("n_tokens"),
        length(col("text")).as("len_chars"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      cast(len(${sqlToks("text")}) as int) AS n_tokens,
      cast(length(text) as int) AS len_chars
      FROM documents ORDER BY doc_id"""))

  /** BPE-style pre-tokenization counting: a GPT-2-ish pre-tokenizer
    * regex restricted to the Java-regex ∩ RE2 dialect (no lookahead) —
    * a leading space binds to the following letter/digit/symbol run.
    * Token count and distinct-piece count per doc; the byte-level merge
    * table itself is model data, but the pre-tokenizer split is what
    * sizes a training corpus. */
  val regexTokens: Q = {
    val pat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
    Q(
      "q75_regex_tokens",
      (s, d) => Tables.documents(s, d)
        .withColumn("pieces", expr(s"regexp_extract_all(lower(text), '$pat', 0)"))
        .select(
          col("doc_id"),
          size(col("pieces")).as("n_pieces"),
          size(array_distinct(col("pieces"))).as("n_uniq_pieces"),
          element_at(col("pieces"), 1).as("first_piece"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id,
          regexp_extract_all(lower(text), '$pat') AS pieces FROM documents)
        SELECT doc_id,
          cast(len(pieces) as int) AS n_pieces,
          cast(len(list_distinct(pieces)) as int) AS n_uniq_pieces,
          pieces[1] AS first_piece
        FROM p ORDER BY doc_id"""))
  }

  private val stopWords = Seq("the", "a", "of", "to", "in", "and", "is")
  private val stopSqlList = stopWords.map(w => s"'$w'").mkString(", ")

  /** Quality scoring: token counts, type/token ratio, stopword ratio,
    * average token length, bucketed quality label. */
  val qualityScore: Q = Q(
    "q31_quality_score",
    (s, d) => Tables.documents(s, d)
      .withColumn("t", toks(col("text")))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("n_uniq", size(array_distinct(col("t"))))
      .withColumn("stop_cnt",
        size(filter(col("t"), x => x.isin(stopWords: _*))))
      .withColumn("sum_len",
        aggregate(transform(col("t"), x => length(x)), lit(0), (a, x) => a + x))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_uniq"),
        (col("stop_cnt").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_uniq").cast("double") / col("n_tokens")).as("ttr"),
        (col("sum_len").cast("double") / col("n_tokens")).as("avg_token_len"),
        when(col("n_tokens") >= 50 && col("n_uniq") >= 20, "good")
          .when(col("n_tokens") >= 20, "fair")
          .otherwise("poor").as("quality"))
      .orderBy("doc_id"),
    Some(s"""WITH t AS (
        SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
      m AS (SELECT doc_id,
        cast(len(t) as int) AS n_tokens,
        cast(len(list_distinct(t)) as int) AS n_uniq,
        cast(len(list_filter(t, x -> x IN ($stopSqlList))) as int) AS stop_cnt,
        cast(list_sum(list_transform(t, x -> length(x))) as int) AS sum_len
        FROM t)
      SELECT doc_id, n_tokens, n_uniq,
        cast(stop_cnt as double) / n_tokens AS stop_ratio,
        cast(n_uniq as double) / n_tokens AS ttr,
        cast(sum_len as double) / n_tokens AS avg_token_len,
        CASE WHEN n_tokens >= 50 AND n_uniq >= 20 THEN 'good'
             WHEN n_tokens >= 20 THEN 'fair' ELSE 'poor' END AS quality
      FROM m ORDER BY doc_id"""))

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "les", "des"),
    "de" -> Seq("der", "die", "und"))

  /** Language-ID heuristic: stopword-marker voting with a deterministic
    * argmax tie-break (en > es > fr > de). */
  val langGuess: Q = Q(
    "q32_lang_guess",
    (s, d) => {
      val base = Tables.documents(s, d).withColumn("t", toks(col("text")))
      val counted = markers.foldLeft(base) { case (df, (l, ws)) =>
        df.withColumn(s"c_$l", size(filter(col("t"), x => x.isin(ws: _*))))
      }
      counted.select(
        col("doc_id"), col("lang"),
        col("c_en"), col("c_es"), col("c_fr"), col("c_de"),
        when(col("c_en") >= col("c_es") && col("c_en") >= col("c_fr") && col("c_en") >= col("c_de"), "en")
          .when(col("c_es") >= col("c_fr") && col("c_es") >= col("c_de"), "es")
          .when(col("c_fr") >= col("c_de"), "fr")
          .otherwise("de").as("guess"))
        .orderBy("doc_id")
    },
    Some {
      val counts = markers.map { case (l, ws) =>
        s"cast(len(list_filter(t, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) as int) AS c_$l"
      }.mkString(",\n        ")
      s"""WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS t FROM documents),
      m AS (SELECT doc_id, lang,
        $counts
        FROM t)
      SELECT doc_id, lang, c_en, c_es, c_fr, c_de,
        CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
             WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
             WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS guess
      FROM m ORDER BY doc_id"""
    })

  /** Confusion matrix of labeled lang × heuristic guess. */
  val langConfusion: Q = Q(
    "q33_lang_confusion",
    (s, d) => {
      val base = Tables.documents(s, d).withColumn("t", toks(col("text")))
      val counted = markers.foldLeft(base) { case (df, (l, ws)) =>
        df.withColumn(s"c_$l", size(filter(col("t"), x => x.isin(ws: _*))))
      }
      counted.withColumn("guess",
        when(col("c_en") >= col("c_es") && col("c_en") >= col("c_fr") && col("c_en") >= col("c_de"), "en")
          .when(col("c_es") >= col("c_fr") && col("c_es") >= col("c_de"), "es")
          .when(col("c_fr") >= col("c_de"), "fr")
          .otherwise("de"))
        .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
        .orderBy("lang", "guess")
    },
    Some {
      val counts = markers.map { case (l, ws) =>
        s"cast(len(list_filter(t, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) as int) AS c_$l"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS t FROM documents),
      m AS (SELECT doc_id, lang, $counts FROM t),
      g AS (SELECT lang,
        CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
             WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
             WHEN c_fr >= c_de THEN 'fr' ELSE 'de' END AS guess
        FROM m)
      SELECT lang, guess, count(*) AS n FROM g
      GROUP BY lang, guess ORDER BY lang, guess"""
    })

  /** q223 — code-switching / mixed-language audit: the q32 marker vote
    * run per fixed 20-token WINDOW instead of per document, then rolled
    * up doc-locally into per-language window counts, the majority call
    * (same ≥-chain tie-break as q32: en > es > fr > de), and the
    * minority-window fraction. A document whose windows disagree is a
    * mixed-language page (boilerplate chrome in one language around
    * content in another, quote blocks, genuine code-switching) — the
    * multilingual-cleaning decision CCNet §3.1 makes per PARAGRAPH
    * score rather than per page; q33's doc-level confusion matrix
    * cannot see it.
    *
    * Scale shape: ZERO shuffles — the windowing, the per-window vote,
    * and the rollup are doc-local array expressions inside one scan
    * projection (window count = ⌈tokens/20⌉, every step bounded by doc
    * length). The whole computation binds the token array ONCE as a
    * lambda variable (transform(array(toks), tt → …).getItem(0) — the
    * q153 discipline), so PushDownPredicates cannot inline split(text)
    * into each window slice and tear the O(n) sharing into O(n²/20).
    * minor_frac is one IEEE division of exact integers. */
  val codeSwitchAudit: Q = Q(
    "q223_code_switch_audit",
    (s, d) => {
      val st = transform(array(toks(col("text"))), tt => {
        val nch = floor((size(tt) + lit(19)) / lit(20.0)).cast("int")
        val chunks = transform(sequence(lit(0), nch - 1),
          i => slice(tt, i * 20 + 1, lit(20)))
        val cnts = transform(chunks, ch => array(
          markers.map { case (_, ws) =>
            size(filter(ch, x => x.isin(ws: _*)))
          }: _*))
        val gs = transform(cnts, c =>
          when(c.getItem(0) >= c.getItem(1) && c.getItem(0) >= c.getItem(2)
              && c.getItem(0) >= c.getItem(3), "en")
            .when(c.getItem(1) >= c.getItem(2)
              && c.getItem(1) >= c.getItem(3), "es")
            .when(c.getItem(2) >= c.getItem(3), "fr")
            .otherwise("de"))
        def cnt(l: String) = size(filter(gs, g => g === l)).cast("long")
        struct(size(gs).cast("long").as("n_win"),
          cnt("en").as("g_en"), cnt("es").as("g_es"),
          cnt("fr").as("g_fr"), cnt("de").as("g_de"))
      }).getItem(0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), st.as("st"))
        .select(col("doc_id"), col("lang"),
          col("st.n_win").as("n_win"),
          col("st.g_en").as("g_en"), col("st.g_es").as("g_es"),
          col("st.g_fr").as("g_fr"), col("st.g_de").as("g_de"))
        .withColumn("major",
          when(col("g_en") >= col("g_es") && col("g_en") >= col("g_fr")
            && col("g_en") >= col("g_de"), "en")
            .when(col("g_es") >= col("g_fr")
              && col("g_es") >= col("g_de"), "es")
            .when(col("g_fr") >= col("g_de"), "fr")
            .otherwise("de"))
        .withColumn("n_minor", (col("n_win") - greatest(col("g_en"),
          col("g_es"), col("g_fr"), col("g_de"))).cast("long"))
        .withColumn("mixed",
          when(col("n_minor") > 0, 1L).otherwise(0L))
        .withColumn("minor_frac",
          when(col("n_win") > 0,
            col("n_minor").cast("double") / col("n_win")))
        .orderBy("doc_id")
    },
    Some {
      def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
      val cntList = markers.map { case (_, ws) =>
        s"len(list_filter(ch, x -> x IN (${inList(ws)})))"
      }.mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS tt
          FROM documents),
        c AS (SELECT doc_id, lang, list_transform(
            generate_series(0, cast(floor((len(tt) + 19) / 20.0) as int) - 1),
            i -> list_slice(tt, i * 20 + 1, i * 20 + 20)) AS chunks
          FROM t),
        g AS (SELECT doc_id, lang, list_transform(
            list_transform(chunks, ch -> $cntList),
            c -> CASE
              WHEN c[1] >= c[2] AND c[1] >= c[3] AND c[1] >= c[4] THEN 'en'
              WHEN c[2] >= c[3] AND c[2] >= c[4] THEN 'es'
              WHEN c[3] >= c[4] THEN 'fr' ELSE 'de' END) AS gs
          FROM c),
        a AS (SELECT doc_id, lang,
            cast(len(gs) as bigint) AS n_win,
            cast(len(list_filter(gs, g -> g = 'en')) as bigint) AS g_en,
            cast(len(list_filter(gs, g -> g = 'es')) as bigint) AS g_es,
            cast(len(list_filter(gs, g -> g = 'fr')) as bigint) AS g_fr,
            cast(len(list_filter(gs, g -> g = 'de')) as bigint) AS g_de
          FROM g)
        SELECT doc_id, lang, n_win, g_en, g_es, g_fr, g_de,
          CASE WHEN g_en >= g_es AND g_en >= g_fr AND g_en >= g_de THEN 'en'
               WHEN g_es >= g_fr AND g_es >= g_de THEN 'es'
               WHEN g_fr >= g_de THEN 'fr' ELSE 'de' END AS major,
          n_win - greatest(g_en, g_es, g_fr, g_de) AS n_minor,
          cast(CASE WHEN n_win - greatest(g_en, g_es, g_fr, g_de) > 0
            THEN 1 ELSE 0 END as bigint) AS mixed,
          CASE WHEN n_win > 0
            THEN cast(n_win - greatest(g_en, g_es, g_fr, g_de) as double)
              / n_win END AS minor_frac
        FROM a ORDER BY doc_id"""
    })

  /** Document fingerprinting: md5 content hash of whitespace-normalized
    * lowercase text, plus the shared 61-bit hash, grouped into identity
    * classes (min doc_id keeps, duplicate count). */
  val fingerprint: Q = Q(
    "q34_fingerprint",
    (s, d) => Tables.documents(s, d)
      .withColumn("fp",
        md5(lower(regexp_replace(trim(col("text")), s"[$WsChars]+", " ")).cast("binary")))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id"),
    Some(s"""WITH f AS (SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '[$WsChars]+', ' ', 'g'))) AS fp
      FROM documents)
      SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dups
      FROM f GROUP BY fp ORDER BY keep_id"""))

  /** Top-3 terms per document by term frequency (integer-only TF ranking
    * — cross-engine-safe; idf would introduce libm log() divergence).
    * The rank filter compiles to the custom TopKPerGroup heap exec under
    * GraftExtensions, so the oracle validates that operator too. */
  val topTerms: Q = Q(
    "q45_top_terms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(desc("tf"), asc("term"))
      tf.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "rn", "term", "tf")
        .orderBy("doc_id", "rn")
    },
    Some(s"""WITH tf AS (
        SELECT doc_id, unnest(${sqlToks("text")}) AS term FROM documents),
      cnt AS (SELECT doc_id, term, count(*) AS tf FROM tf
        GROUP BY doc_id, term),
      ranked AS (SELECT doc_id, term, tf,
          row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn
        FROM cnt)
      SELECT doc_id, rn, term, tf FROM ranked WHERE rn <= 3
      ORDER BY doc_id, rn"""))

  /** Pivot: per-user event-type counts as columns (explicit value list →
    * deterministic schema; oracle via conditional aggregation). */
  val pivotEvents: Q = Q(
    "q46_pivot_events",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id"),
    Some("""SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS click,
      count(*) FILTER (WHERE event_type = 'view') AS view,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS signup,
      count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Rare-term index: terms whose document frequency is <= 20% of the
    * corpus, and the documents carrying them — the deterministic integer
    * core of an idf computation (log-free: libm log() is not
    * bit-portable; the relative threshold holds at every scale factor). */
  val rareTerms: Q = Q(
    "q47b_rare_terms",
    (s, d) => {
      val docTerms = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(toks(col("text")))).as("term"))
        // shared exchange for the three consumers (n_docs, df, probe):
        // one tokenize+explode pass instead of three (cf. q142/q85 —
        // ReuseAudit: documents 3→1)
        .repartition(col("doc_id"))
      // n_docs from a direct count(*) — a footer-only parquet count,
      // no tokenize (every doc yields >= 1 term row, so this equals
      // countDistinct(doc_id) over docTerms; q85's n takes the same
      // shortcut with the same oracle twin)
      val nDocs = Tables.documents(s, d)
        .agg(count(lit(1)).as("n_docs"))
      val rare = docTerms.groupBy("term")
        .agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") <= col("n_docs") * 0.2)
        .select("term")
      docTerms.join(rare, "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rare"),
          concat_ws(",", sort_array(collect_list(col("term")))).as("rare_terms"))
        .orderBy("doc_id")
    },
    Some(s"""WITH dt AS (SELECT doc_id,
        unnest(list_distinct(${sqlToks("text")})) AS term FROM documents),
      rare AS (SELECT term FROM dt GROUP BY term
        HAVING count(*) <= (SELECT count(*) FROM documents) * 0.2)
      SELECT dt.doc_id, count(*) AS n_rare,
        array_to_string(list_sort(list(dt.term)), ',') AS rare_terms
      FROM dt JOIN rare ON dt.term = rare.term
      GROUP BY dt.doc_id ORDER BY dt.doc_id"""))

  /** Gopher-style repetition filters: per-doc top-unigram and top-bigram
    * mass fractions, with boolean repetition flags — the standard
    * "remove template/boilerplate docs" quality signal for training
    * corpora. Computed by explode + hash-agg (linear, map-side combine),
    * NOT a per-row O(n_tokens²) lambda — a 100k-token web page must not
    * quadratically blow up the row. Docs with < 2 tokens have no bigram
    * and are excluded on both engines. */
  val repetitionFilter: Q = Q(
    "q80_repetition_filter",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        // size>0 and isNotNull are redundant under size>=2 but written
        // out: explode(t) INFERS them into the unigram branch's scan,
        // and only their explicit presence in both branches keeps the
        // subtrees canonically equal (the q126 symmetrize trick)
        .filter(size(col("t")) >= 2 && size(col("t")) > 0 &&
          col("t").isNotNull)
        // shared exchange: the unigram and bigram branches both read one
        // tokenize+scan (ReuseAudit 2→1)
        .repartition(col("doc_id"))
      val bigrams = transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))
      val uni = base.select(col("doc_id"), explode(col("t")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(max(col("tf")).as("top_uni_tf"), sum(col("tf")).as("n_tokens"))
      val big = base.select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("bf"))
        .groupBy("doc_id")
        .agg(max(col("bf")).as("top_big_tf"), sum(col("bf")).as("n_bigrams"))
      uni.join(big, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("top_uni_tf"),
          (col("top_uni_tf").cast("double") / col("n_tokens")).as("top_uni_ratio"),
          col("top_big_tf"),
          (col("top_big_tf").cast("double") / col("n_bigrams")).as("top_big_ratio"))
        .withColumn("flagged",
          col("top_uni_ratio") > 0.1 || col("top_big_ratio") > 0.05)
        .orderBy("doc_id")
    },
    Some(s"""WITH base AS (SELECT doc_id, ${sqlToks("text")} AS t
        FROM documents WHERE len(${sqlToks("text")}) >= 2),
      uni AS (SELECT doc_id, cast(max(tf) as bigint) AS top_uni_tf,
          cast(sum(tf) as bigint) AS n_tokens
        FROM (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(t) AS term FROM base)
          GROUP BY doc_id, term)
        GROUP BY doc_id),
      big AS (SELECT doc_id, cast(max(bf) as bigint) AS top_big_tf,
          cast(sum(bf) as bigint) AS n_bigrams
        FROM (SELECT doc_id, bg, count(*) AS bf
          FROM (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(t) - 1),
                i -> concat_ws(' ', t[i], t[i+1]))) AS bg
            FROM base)
          GROUP BY doc_id, bg)
        GROUP BY doc_id)
      SELECT uni.doc_id, n_tokens, top_uni_tf,
        cast(top_uni_tf as double) / n_tokens AS top_uni_ratio,
        top_big_tf,
        cast(top_big_tf as double) / n_bigrams AS top_big_ratio,
        (cast(top_uni_tf as double) / n_tokens > 0.1 OR
         cast(top_big_tf as double) / n_bigrams > 0.05) AS flagged
      FROM uni JOIN big ON uni.doc_id = big.doc_id
      ORDER BY uni.doc_id"""))

  // ------------------------------------------------------------------
  // q119 — robust outlier filter (median + MAD): flag docs whose length
  // deviates from their source's median by > 3 MAD. Mean/stddev are the
  // naive choice and get dragged by the very outliers being hunted;
  // median/MAD is the standard robust gate for corpus length filtering.
  //
  // Cross-engine exactness: both medians are computed MANUALLY as
  // (min+max)/2.0 of the middle one-or-two ranked values — built-in
  // percentile/quantile_cont interpolation may use different expression
  // shapes per engine and drift in the last ulp. Every window partitions
  // by source (never global).
  // ------------------------------------------------------------------
  val madOutliers: Q = Q(
    "q119_mad_outliers",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bySrc = Window.partitionBy("source")
      def medianOf(df: org.apache.spark.sql.DataFrame, valueCol: String,
          out: String) = {
        val w = Window.partitionBy("source")
          .orderBy(col(valueCol), col("doc_id"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(bySrc))
          // `div` = integer division (Spark `/` is double division and
          // would miss the rank compare on even counts)
          .withColumn("mid",
            when(col("rn") === expr("(cnt + 1) div 2") ||
              col("rn") === expr("(cnt + 2) div 2"), col(valueCol)))
          .withColumn(out,
            (min(col("mid")).over(bySrc).cast("double") +
              max(col("mid")).over(bySrc).cast("double")) / 2.0)
          .drop("rn", "cnt", "mid")
      }
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val withMed = medianOf(base, "n_chars", "med")
        .withColumn("dev", abs(col("n_chars") - col("med")))
      medianOf(withMed, "dev", "mad")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("med"), col("mad"),
          (col("dev") > lit(3.0) * col("mad")).cast("int").as("outlier"))
        .orderBy("doc_id")
    },
    Some("""WITH base AS (
        SELECT doc_id, source, n_chars FROM documents),
      r1 AS (
        SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY n_chars, doc_id) AS rn,
          count(*) OVER (PARTITION BY source) AS cnt
        FROM base),
      m1 AS (
        SELECT *, CASE WHEN rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
            THEN n_chars END AS mid
        FROM r1),
      d1 AS (
        SELECT doc_id, source, n_chars,
          (cast(min(mid) OVER (PARTITION BY source) as double) +
           cast(max(mid) OVER (PARTITION BY source) as double)) / 2.0
            AS med
        FROM m1),
      dev AS (
        SELECT *, abs(n_chars - med) AS dev FROM d1),
      r2 AS (
        SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY dev, doc_id) AS rn,
          count(*) OVER (PARTITION BY source) AS cnt
        FROM dev),
      m2 AS (
        SELECT *, CASE WHEN rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
            THEN dev END AS mid
        FROM r2)
      SELECT doc_id, source, n_chars, med,
        (cast(min(mid) OVER (PARTITION BY source) as double) +
         cast(max(mid) OVER (PARTITION BY source) as double)) / 2.0 AS mad,
        cast(dev > 3.0 * ((cast(min(mid) OVER (PARTITION BY source) as double) +
          cast(max(mid) OVER (PARTITION BY source) as double)) / 2.0)
          as int) AS outlier
      FROM m2 ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q120 — blocklist filter (C4-style banned-words gate): per doc, the
  // number of exact-token blocklist hits and the keep/drop flag. Token
  // equality, not substring — substring matching is the classic
  // over-blocking bug. One linear list_filter per doc inside codegen;
  // a real deployment broadcasts the (bigger) list, same plan shape.
  // ------------------------------------------------------------------
  private val Blocklist = Seq("slow", "leak", "crash")

  val blocklistFilter: Q = Q(
    "q120_blocklist_filter",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        size(filter(toks(col("text")),
          t => t.isin(Blocklist: _*))).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        (col("n_hits") === 0).cast("int").as("keep"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
        cast(len(list_filter(${sqlToks("text")},
          x -> x IN (${Blocklist.map(w => s"'$w'").mkString(", ")})))
          as int) AS n_hits,
        cast(len(list_filter(${sqlToks("text")},
          x -> x IN (${Blocklist.map(w => s"'$w'").mkString(", ")}))) = 0
          as int) AS keep
      FROM documents ORDER BY doc_id"""))

  // ------------------------------------------------------------------
  // q217 — multi-word PHRASE blocklist audit, the consecutive-token
  // complement of q120's single-token gate: per (source, phrase), how
  // many documents contain a blocked phrase as ADJACENT tokens and how
  // many total occurrences — the report a policy/safety filter
  // publishes before dropping content. Token-adjacency equality, not
  // substring: substring matching is the classic over-blocking bug
  // (q120's note), and a phrase hit must align on token boundaries.
  //
  // Scale shape — the reason this is a JOIN, not an isin literal:
  // production phrase lists run 10⁴–10⁶ entries (too big to inline,
  // still broadcast-sized), so docs explode to word bigrams and
  // equi-join the broadcast phrase table on the bigram key. Phrases
  // longer than two words block on their FIRST bigram the same way
  // and verify the tail against the doc tokens (Aho-Corasick's
  // prefix-blocking idea in join form); this registry instance's
  // phrases are all two words, so block ≡ verify and the plan is the
  // general one minus the verify projection. Explode is linear in
  // corpus tokens, the join output is bounded by true hits, and the
  // aggregate is map-combinable; nothing is quadratic anywhere.
  // ------------------------------------------------------------------
  private val PhraseBlocklist = Seq("big table", "slow query", "hash join",
    "sort merge", "data stream", "fast scan")

  val phraseBlocklist: Q = Q(
    "q217_phrase_blocklist",
    (s, d) => {
      import s.implicits._
      val phrases = broadcast(PhraseBlocklist.toDF("phrase"))
      val t = Tables.documents(s, d)
        // spread the per-row tokenize across cores (documents parquet
        // arrives in O(1) partitions; the q136 discipline)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"), col("source"), toks(col("text")).as("t"))
      // guarded index sequence (the shingles3 discipline): 1-token docs
      // must yield [] — sequence(1, 0) counts DOWN, never rely on it
      val idx = when(size(col("t")) >= 2, sequence(lit(1), size(col("t")) - 1))
        .otherwise(array().cast("array<int>"))
      val bg = t.select(col("doc_id"), col("source"),
        explode_outer(transform(idx, i => concat_ws(" ",
          element_at(col("t"), i), element_at(col("t"), i + 1)))).as("g"))
      bg.join(phrases, col("g") === col("phrase"))
        .groupBy("source", "phrase")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_hits"))
        .orderBy("source", "phrase")
    },
    Some {
      val values = PhraseBlocklist.map(p => s"('$p')").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, ${sqlToks("text")} AS tk
          FROM documents),
        bg AS (SELECT doc_id, source,
            unnest(list_transform(generate_series(1, len(tk) - 1),
              i -> tk[i] || ' ' || tk[i+1])) AS g
          FROM t)
        SELECT source, phrase,
          cast(count(DISTINCT doc_id) as bigint) AS n_docs,
          cast(count(*) as bigint) AS n_hits
        FROM bg JOIN (VALUES $values) AS p(phrase) ON bg.g = p.phrase
        GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  // ------------------------------------------------------------------
  // q230 — multi-LENGTH phrase blocklist (block-then-verify): the
  // general form of q217, whose registry instance is all-bigram so
  // its "longer phrases block on their first bigram and verify the
  // tail" claim was documented but never exercised on the oracled
  // path. Here the blocklist mixes 2- and 3-word phrases: every
  // phrase BLOCKS on its first bigram (one equi-join against the
  // positional bigram explode — production lists run 10⁴–10⁶ phrases,
  // so a join, never isin), and the tail is VERIFIED by re-joining
  // the candidate (doc_id, position) hits back to the token arrays
  // and comparing slice(t, i, n_toks) against the phrase's token
  // array — adjacency-exact, the over-blocking-free semantics.
  //
  // Scale shape: the bigram explode carries (doc_id, source, i, g) —
  // positions and 2-token strings, never the token array (exploding
  // WITH the array would copy it per bigram row); the verify re-join
  // touches only first-bigram-matched docs (blocklist-selective, the
  // q202 matched-docs-only precedent), and both consumers of the
  // tokenized frame hang off one cached build. Aggregate is
  // map-combinable over (source, phrase).
  // ------------------------------------------------------------------
  private val PhraseBlocklistML = Seq("slow query", "hash join",
    "stream table hash", "slow hash batch", "window fast query")

  val phraseBlocklistML: Q = Q(
    "q230_phrase_blocklist_ml",
    (s, d) => {
      import s.implicits._
      val phrases = broadcast(
        PhraseBlocklistML.map { p =>
          val tk = p.split(" ")
          (p, tk.toSeq, tk(0) + " " + tk(1), tk.length)
        }.toDF("phrase", "p_toks", "first_bg", "p_len"))
      val t = graft.CacheScope.cached(Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"), col("source"), toks(col("text")).as("t")))
      val idx = when(size(col("t")) >= 2, sequence(lit(1), size(col("t")) - 1))
        .otherwise(array().cast("array<int>"))
      val bg = t.select(col("doc_id"), col("source"),
        explode_outer(transform(idx, i => struct(i.as("i"),
          concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1)).as("g")))).as("b"))
        .select(col("doc_id"), col("source"),
          col("b.i").as("i"), col("b.g").as("g"))
      val cand = bg.join(phrases, col("g") === col("first_bg"))
      cand.join(t.select(col("doc_id"), col("t")), Seq("doc_id"))
        .filter(slice(col("t"), col("i"), col("p_len")) === col("p_toks"))
        .groupBy("source", "phrase")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_hits"))
        .orderBy("source", "phrase")
    },
    Some {
      val values = PhraseBlocklistML.map { p =>
        val tk = p.split(" ")
        val arr = tk.map(w => s"'$w'").mkString("[", ", ", "]")
        s"('$p', $arr, '${tk(0)} ${tk(1)}', ${tk.length})"
      }.mkString(", ")
      s"""WITH t AS MATERIALIZED (SELECT doc_id, source,
          ${sqlToks("text")} AS tk FROM documents),
        bg AS (SELECT doc_id, source, i, tk[i] || ' ' || tk[i+1] AS g
          FROM t, unnest(generate_series(1, len(tk) - 1)) AS u(i)),
        ph AS (SELECT * FROM (VALUES $values)
          AS v(phrase, p_toks, first_bg, p_len)),
        cand AS (SELECT bg.doc_id, bg.source, bg.i,
            ph.phrase, ph.p_toks, ph.p_len
          FROM bg JOIN ph ON bg.g = ph.first_bg),
        hit AS (SELECT c.source, c.phrase, c.doc_id
          FROM cand c JOIN t ON c.doc_id = t.doc_id
          WHERE t.tk[c.i : c.i + c.p_len - 1] = c.p_toks)
        SELECT source, phrase,
          cast(count(DISTINCT doc_id) as bigint) AS n_docs,
          cast(count(*) as bigint) AS n_hits
        FROM hit GROUP BY 1, 2 ORDER BY 1, 2"""
    })

  // ------------------------------------------------------------------
  // q232 — per-source Gini concentration of token mass: is a source's
  // token budget spread across its documents or dominated by a few
  // mega-docs? The inequality readout (Gini + top-doc share) that
  // decides whether a source needs doc-length capping before it
  // swamps a training mixture (q173 measures padding waste; this
  // measures CONTRIBUTION skew). Gini over ascending-ranked doc token
  // counts: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) — every numerator an
  // exact integer, ONE IEEE division per source.
  //
  // Scale shape: ranks come from the LENGTH HISTOGRAM, not a per-doc
  // window — group (source, n_tokens) → (cnt, mass), then a window
  // over that aggregated frame (bounded by distinct lengths per
  // source, the q173/q203 discipline) supplies each tied group's
  // preceding count p, and Σ i·xᵢ for a group of c docs at value v is
  // v·(c·p + c·(c+1)/2) in closed form — a sort of docs never
  // happens. The ORACLE is the naive per-doc row_number formula, so
  // the decomposition is hash-PROVEN equal, tie handling included.
  // ------------------------------------------------------------------
  val sourceGini: Q = Q(
    "q232_source_gini",
    (s, d) => {
      val hist = Tables.documents(s, d)
        .select(col("source"), size(toks(col("text"))).cast("long").as("v"))
        .groupBy("source", "v")
        .agg(count(lit(1)).as("c"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("p", sum(col("c")).over(w) - col("c"))
        // integer div: c·(c+1) is always even, and six must STAY an
        // exact long (a double here would make the sum order-dependent)
        .withColumn("six", expr("v * (c * p + (c * (c + 1)) div 2)"))
        .groupBy("source")
        .agg(sum(col("c")).cast("long").as("n_docs"),
          sum(col("v") * col("c")).cast("long").as("tok_total"),
          max(col("v")).cast("long").as("max_doc"),
          sum(col("six")).cast("long").as("six"))
        .select(col("source"), col("n_docs"), col("tok_total"),
          col("max_doc"),
          when(col("tok_total") > 0,
            col("max_doc").cast("double") / col("tok_total"))
            .as("top_doc_share"),
          when(col("n_docs") * col("tok_total") > 0,
            (lit(2) * col("six") - (col("n_docs") + 1) * col("tok_total"))
              .cast("double") / (col("n_docs") * col("tok_total")))
            .as("gini"))
        .orderBy("source")
    },
    // the naive formulation: rank every doc, apply the textbook sum —
    // a hash match PROVES the histogram decomposition (ties included)
    Some(s"""WITH t AS (SELECT source,
          cast(len(${sqlToks("text")}) as bigint) AS v
        FROM documents),
      r AS (SELECT source, v, row_number() OVER (
          PARTITION BY source ORDER BY v) AS i
        FROM t),
      a AS (SELECT source, cast(count(*) as bigint) AS n_docs,
          cast(sum(v) as bigint) AS tok_total,
          cast(max(v) as bigint) AS max_doc,
          cast(sum(i * v) as bigint) AS six
        FROM r GROUP BY 1)
      SELECT source, n_docs, tok_total, max_doc,
        CASE WHEN tok_total > 0
          THEN cast(max_doc as double) / tok_total END AS top_doc_share,
        CASE WHEN n_docs * tok_total > 0
          THEN cast(2 * six - (n_docs + 1) * tok_total as double)
            / (n_docs * tok_total) END AS gini
      FROM a ORDER BY source"""))

  // ------------------------------------------------------------------
  // q136 — n-gram novelty score: per doc, the fraction of its distinct
  // word-3-grams that appear in NO other document (corpus document
  // frequency = 1). The memorization-risk / boilerplate dual used in
  // data curation: novelty ≈ 1 → unique content; ≈ 0 → the doc is
  // assembled from corpus-common phrasing. Scale shape is LINEAR in
  // corpus size (unlike the pair joins of q76): one shuffle on the
  // 61-bit shingle hash for the df aggregate, one equi-join back, one
  // per-doc count — no pair enumeration anywhere. The ratio is
  // count/count of exact longs, one IEEE division on both engines.
  // ------------------------------------------------------------------
  val ngramNovelty: Q = Q(
    "q136_ngram_novelty",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val sets = Tables.documents(s, d)
        // spread the per-row shingling across cores (documents parquet
        // arrives in O(1) partitions; cf. Dedup.shingleSets)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"), toks(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), expr("distinct_shingles(t, 3)").as("sh"))
      val ex = sets.select(col("doc_id"), explode(col("sh")).as("sg"))
        .select(col("doc_id"), md5h61(col("sg")).as("h"))
      val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
      ex.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("df") === 1, lit(1))).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_shingles")).as("novelty"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
      sets AS (SELECT doc_id, list_distinct(${sqlShingles3("t")}) AS sh
        FROM t WHERE len(t) >= 3),
      ex AS (SELECT doc_id, ${sqlMd5h61("sg")} AS h
        FROM (SELECT doc_id, unnest(sh) AS sg FROM sets)),
      dfreq AS (SELECT h, count(*) AS df FROM ex GROUP BY h)
      SELECT doc_id, count(*) AS n_shingles,
        count(*) FILTER (WHERE df = 1) AS n_novel,
        cast(count(*) FILTER (WHERE df = 1) as double) / count(*) AS novelty
      FROM ex JOIN dfreq USING (h)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** q142 — BM25-shaped lexical top-k retrieval (k1=1.2, b=0.75) for a
    * fixed 3-term query. Scoring is entirely doc-local — tf from an
    * array filter, dl from the token count, no explode and no pair
    * shuffle — so the scan scales linearly; the only exchanges are the
    * 1-row corpus-stats broadcast (N, avgdl, per-term df) and the
    * top-10 TakeOrderedAndProject (never a global sort). The idf keeps
    * the classic BM25 odds ratio (N − df + ½)/(df + ½) UNlogged to stay
    * libm-free (log() can diverge in the last ulp across engines — the
    * house rule, cf. q85). NOTE: per term the transform is monotone, but
    * the SUM over terms is not — rare terms weigh exponentially more
    * than under logged idf, so rankings can differ from textbook BM25
    * when query-term dfs span orders of magnitude (a deliberate
    * determinism-over-fidelity trade, documented, not hidden; swap in
    * ln() for textbook scores if cross-engine bit-equality is not
    * needed). Every arithmetic step is the same IEEE-op sequence on
    * both engines, so scores hash-match bitwise. */
  val bm25TopK: Q = {
    val terms = Seq("spark", "hash", "merge")
    Q(
      "q142_bm25_topk",
      (s, d) => {
        val tfCols = terms.indices.map(i =>
          size(filter(col("t"), x => x === lit(terms(i))))
            .cast("double").as(s"tf$i"))
        val w = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id") +: size(col("t")).cast("double").as("dl") +:
            tfCols: _*)
          // the stats branch and the scoring branch both consume w; the
          // explicit exchange makes them share ONE tokenize+scan
          // (ReusedExchange) — w is 5 narrow columns, so shuffling it
          // once is far cheaper than re-tokenizing the corpus twice
          .repartition(col("doc_id"))
        val stats = w.agg(count(lit(1)).as("n"),
          davg(col("dl")).as("avgdl") +: terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
        def termScore(i: Int) =
          ((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))) *
            ((col(s"tf$i") * lit(2.2)) /
              (col(s"tf$i") + lit(1.2) *
                (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        w.crossJoin(broadcast(stats))
          .select(col("doc_id"),
            (termScore(0) + termScore(1) + termScore(2)).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      Some {
        val tfSels = terms.zipWithIndex.map { case (tm, i) =>
          s"cast(len(list_filter(t, x -> x = '$tm')) as double) AS tf$i" }
          .mkString(",\n          ")
        val dfSels = terms.indices.map(i =>
          s"cast(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) as bigint) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"((n - df$i + 0.5) / (df$i + 0.5)) * ((tf$i * 2.2) / " +
            s"(tf$i + 1.2 * (0.25 + 0.75 * (dl / avgdl))))")
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
          w AS (SELECT doc_id, cast(len(t) as double) AS dl,
          $tfSels
          FROM t),
          st AS (SELECT count(*) AS n, ${sqlDavg("dl")} AS avgdl, $dfSels
            FROM w)
          SELECT doc_id, $score AS score
          FROM w CROSS JOIN st
          ORDER BY score DESC, doc_id LIMIT 10"""
      })
  }

  /** q142b — TEXTBOOK BM25 top-k (k1=1.2, b=0.75), closing q142's
    * documented unlogged-idf semantic gap: idf here is the standard
    * `ln((N − df + ½)/(df + ½) + 1)` (the Lucene/BM25+ form, always
    * positive), so term weights grow logarithmically with rarity like
    * every production BM25. The price of ln() is that scores are no
    * longer bit-identical across engines (libm can differ in the last
    * ulp), so the oracle is RANK-ONLY: both engines quantize the score
    * to a millionth (`floor(score·10⁶)` — a tolerance ~10⁹ coarser
    * than libm error, so a flip needs a true score within 10⁻¹⁵ of a
    * boundary), rank by (qscore DESC, doc_id) — the doc_id tie-break
    * makes equal-score ranks stable — and compare only (rank, doc_id).
    * Same linear scan shape as q142: doc-local tf, 1-row stats
    * broadcast, TakeOrderedAndProject top-10; the rank window runs on
    * the 10 surviving rows, never the corpus. */
  val bm25TextbookTopK: Q = {
    val terms = Seq("spark", "hash", "merge")
    Q(
      "q142b_bm25_textbook",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tfCols = terms.indices.map(i =>
          size(filter(col("t"), x => x === lit(terms(i))))
            .cast("double").as(s"tf$i"))
        val w = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id") +: size(col("t")).cast("double").as("dl") +:
            tfCols: _*)
          // single tokenize+scan shared by both branches — see q142
          .repartition(col("doc_id"))
        val stats = w.agg(count(lit(1)).as("n"),
          davg(col("dl")).as("avgdl") +: terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
        def termScore(i: Int) =
          log((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)) +
            lit(1.0)) *
            ((col(s"tf$i") * lit(2.2)) /
              (col(s"tf$i") + lit(1.2) *
                (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        w.crossJoin(broadcast(stats))
          .select(col("doc_id"),
            floor((termScore(0) + termScore(1) + termScore(2)) * lit(1000000.0))
              .cast("long").as("qscore"))
          .orderBy(col("qscore").desc, col("doc_id"))
          .limit(10)
          .select(row_number().over(
              Window.orderBy(col("qscore").desc, col("doc_id")))
            .cast("long").as("rank"), col("doc_id"))
          .orderBy("rank")
      },
      Some {
        val tfSels = terms.zipWithIndex.map { case (tm, i) =>
          s"cast(len(list_filter(t, x -> x = '$tm')) as double) AS tf$i" }
          .mkString(",\n          ")
        val dfSels = terms.indices.map(i =>
          s"cast(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) as bigint) AS df$i")
          .mkString(", ")
        val score = terms.indices.map(i =>
          s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * ((tf$i * 2.2) / " +
            s"(tf$i + 1.2 * (0.25 + 0.75 * (dl / avgdl))))")
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
          w AS (SELECT doc_id, cast(len(t) as double) AS dl,
          $tfSels
          FROM t),
          st AS (SELECT count(*) AS n, ${sqlDavg("dl")} AS avgdl, $dfSels
            FROM w),
          scored AS (SELECT doc_id,
            cast(floor(($score) * 1000000.0) as bigint) AS qscore
            FROM w CROSS JOIN st)
          SELECT cast(row_number() OVER (ORDER BY qscore DESC, doc_id) as bigint)
            AS rank, doc_id
          FROM scored ORDER BY qscore DESC, doc_id LIMIT 10"""
      })
  }

  /** q146 — adaptive per-language quality threshold: keep documents at
    * or above their language's EXACT median type-token ratio. The
    * per-group-median curation rule every multilingual corpus needs
    * (a fixed global threshold over-prunes whichever language is
    * naturally more repetitive).
    *
    * The median is TWO-LEVEL (the q113 histogram discipline with the
    * cardinality bounded by construction): ttr is first quantized into
    * 1,024 fixed-width buckets (×2¹⁰ is an exact IEEE scaling, so the
    * bucket of a given ttr is engine-independent), the per-lang
    * prefix-sum window runs over the ≤1,024-row bucket histogram —
    * NEVER over a (lang, ttr) histogram whose cardinality approaches
    * n_docs once production documents have 100k tokens — and the two
    * middle ranks are located arithmetically. A second NARROW pass
    * (broadcast-joined to the ≤2 located buckets per language, ~1/1024
    * of the corpus) takes the exact rank-k ttr within the bucket, so
    * the result is the exact median, unchanged. ttr = n_uniq/n_tokens
    * is one IEEE divide of exact ints, and the median is one add + one
    * halving of two such values — bit-identical across engines, so the
    * `ttr >= med` comparison agrees everywhere. All branches consume
    * the same repartitioned frame → one tokenize+scan (ReusedExchange,
    * cf. q142). */
  val adaptiveQualityFilter: Q = Q(
    "q146_adaptive_quality_filter",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = 1024
      val scored = Tables.documents(s, d)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("lang"),
          (size(array_distinct(col("t"))).cast("double") / size(col("t")))
            .as("ttr"))
        .repartition(col("doc_id"))
        .withColumn("b", least(floor(col("ttr") * B), lit(B - 1L)).cast("int"))
      // level 1: per-lang prefix-sum over the bounded bucket histogram
      val bhist = scored.groupBy("lang", "b").agg(count(lit(1)).as("cnt"))
      val byLang = Window.partitionBy("lang").orderBy("b")
      val c = bhist
        .withColumn("cum_before", coalesce(sum(col("cnt")).over(
          byLang.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy("lang")))
        .withColumn("lo", expr("(n + 1) div 2"))
        .withColumn("hi", expr("(n + 2) div 2"))
      // ≤2 rows per language: the bucket holding each middle rank plus
      // that rank's LOCAL offset within the bucket
      val targets = c
        .select(col("lang"), col("b"), col("cum_before"), col("cnt"),
          explode(array(
            struct(lit("lo").as("which"), col("lo").as("r")),
            struct(lit("hi").as("which"), col("hi").as("r")))).as("e"))
        .filter(col("cum_before") < col("e.r") &&
          col("cum_before") + col("cnt") >= col("e.r"))
        .select(col("lang"), col("b"), col("e.which").as("which"),
          (col("e.r") - col("cum_before")).as("kr"))
      // level 2: exact rank-k ttr among only the located buckets' rows
      val thist = scored
        .join(broadcast(targets.select("lang", "b").distinct()), Seq("lang", "b"))
        .groupBy("lang", "b", "ttr").agg(count(lit(1)).as("cnt2"))
      val byBucket = Window.partitionBy("lang", "b").orderBy("ttr")
      val vals = thist
        .withColumn("cb2", coalesce(sum(col("cnt2")).over(
          byBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(broadcast(targets), Seq("lang", "b"))
        .filter(col("cb2") < col("kr") && col("cb2") + col("cnt2") >= col("kr"))
        .select(col("lang"), col("which"), col("ttr"))
      val medians = vals.groupBy("lang")
        .agg(((max(when(col("which") === "lo", col("ttr")))
          + max(when(col("which") === "hi", col("ttr")))) / 2).as("med"))
      scored.join(broadcast(medians), "lang")
        .groupBy("lang", "med")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ttr") >= col("med"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_docs"), col("n_kept"),
          col("med").as("med_ttr"))
        .orderBy("lang")
    },
    Some(s"""WITH s AS (
        SELECT doc_id, lang,
          cast(len(list_distinct(t)) as double) / len(t) AS ttr
        FROM (SELECT doc_id, lang, ${sqlToks("text")} AS t
              FROM documents WHERE lang IS NOT NULL)),
      sb AS (SELECT doc_id, lang, ttr,
          least(cast(floor(ttr * 1024) as bigint), 1023) AS b FROM s),
      bh AS (SELECT lang, b, count(*) AS cnt FROM sb GROUP BY lang, b),
      c AS (SELECT lang, b, cnt,
          coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
          sum(cnt) OVER (PARTITION BY lang) AS n
        FROM bh),
      tg AS (
        SELECT lang, b, 'lo' AS which, (n+1)//2 - cum_before AS kr
          FROM c WHERE cum_before < (n+1)//2 AND cum_before + cnt >= (n+1)//2
        UNION ALL
        SELECT lang, b, 'hi' AS which, (n+2)//2 - cum_before AS kr
          FROM c WHERE cum_before < (n+2)//2 AND cum_before + cnt >= (n+2)//2),
      th AS (SELECT sb.lang, sb.b, sb.ttr, count(*) AS cnt2
          FROM sb JOIN (SELECT DISTINCT lang, b FROM tg) tb
            ON sb.lang = tb.lang AND sb.b = tb.b
          GROUP BY sb.lang, sb.b, sb.ttr),
      c2 AS (SELECT lang, b, ttr, cnt2,
          coalesce(sum(cnt2) OVER (PARTITION BY lang, b ORDER BY ttr
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb2
        FROM th),
      v AS (SELECT c2.lang, tg.which, c2.ttr
          FROM c2 JOIN tg ON c2.lang = tg.lang AND c2.b = tg.b
          WHERE c2.cb2 < tg.kr AND c2.cb2 + c2.cnt2 >= tg.kr),
      m AS (SELECT lang,
          (max(CASE WHEN which = 'lo' THEN ttr END)
           + max(CASE WHEN which = 'hi' THEN ttr END)) / 2 AS med
        FROM v GROUP BY lang)
      SELECT s.lang AS lang, count(*) AS n_docs,
        cast(count(*) FILTER (WHERE ttr >= med) as bigint) AS n_kept,
        med AS med_ttr
      FROM s JOIN m ON s.lang = m.lang
      GROUP BY s.lang, med ORDER BY s.lang"""))

  // ------------------------------------------------------------------
  // q155 — markup stripping, the WET-extraction shape (Common Crawl
  // HTML → text: strip tags, decode entities, collapse whitespace).
  // The synthetic corpus carries no markup, so both engines wrap each
  // doc in IDENTICAL synthetic HTML first (the q83 PII discipline —
  // the wrapping is the same SQL expression on both sides; the
  // STRIPPER is the operator under test, exercised against the Java
  // regex ∩ RE2 common dialect). Entity decode runs tag-strip-first
  // and &amp; LAST (standard single-pass order — decoding it earlier
  // would double-decode "&amp;lt;"). The cleaned TEXT itself is
  // emitted and hash-compared, not just a digest of it.
  //
  // Scale shape: one per-row projection chain inside whole-stage
  // codegen — no shuffle, no UDF; at 100 TB this is a scan-stage map
  // exactly like q83.
  // ------------------------------------------------------------------
  private val TagRe = "<[^>]+>"
  private val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&") // &amp; last

  val markupStrip: Q = Q(
    "q155_markup_strip",
    (s, d) => {
      val wrapped = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title></head><body><h1 class=\"t\">T"), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit(" &amp; more &lt;tags&gt;</p><div id=\"f\">footer</div></body></html>"))
      val stripped = regexp_replace(col("pt"), TagRe, " ")
      val decoded = entities.foldLeft(stripped) { case (acc, (e, ch)) =>
        replace(acc, lit(e), lit(ch))
      }
      // scale-adaptive spread (Dsl.spreadIfNarrow): regexp passes below
      // are the whole cost; no-op at scale, parallelizes the local
      // single-row-group scan
      spreadIfNarrow(Tables.documents(s, d), col("doc_id"))
        .withColumn("pt", wrapped)
        .select(
          col("doc_id"),
          regexp_count(col("pt"), lit(TagRe)).as("n_tags"),
          regexp_count(col("pt"), lit("&[a-z#0-9]+;")).as("n_entities"),
          // explicit class, not \s: Java \s includes U+000B, RE2's
          // does not — Dsl.WsChars is the centralized form of the fix
          trim(regexp_replace(decoded, s"[$WsChars]+", " "))
            .as("cleaned"))
        .orderBy("doc_id")
    },
    Some {
      val wrapped = "'<html><head><title>Doc ' || doc_id || " +
        "'</title></head><body><h1 class=\"t\">T' || doc_id || " +
        "'</h1><p>' || text || " +
        "' &amp; more &lt;tags&gt;</p><div id=\"f\">footer</div></body></html>'"
      val decoded = entities.foldLeft(s"regexp_replace(pt, '$TagRe', ' ', 'g')") {
        case (acc, (e, ch)) =>
          s"replace($acc, '$e', '${if (ch == "'") "''" else ch}')"
      }
      s"""WITH p AS (SELECT doc_id, $wrapped AS pt FROM documents)
        SELECT doc_id,
          cast(len(regexp_extract_all(pt, '$TagRe')) as int) AS n_tags,
          cast(len(regexp_extract_all(pt, '&[a-z#0-9]+;')) as int)
            AS n_entities,
          trim(regexp_replace($decoded, '[$WsChars]+', ' ', 'g'))
            AS cleaned
        FROM p ORDER BY doc_id"""
    })

  // ------------------------------------------------------------------
  // q156 — Gopher quality rules (Rae et al. 2021, Table A1): the
  // NAMED rule battery, distinct from q31's generic score — each doc
  // carries one flag per rule plus the composite keep decision, the
  // audit shape a pipeline needs to see WHICH rule rejects its corpus
  // slice. Rules over the whitespace tokenization: word count in
  // [50, 100000]; mean word length in [3, 10]; ≥ 80% of words contain
  // an alphabetic character; ≥ 2 stop words (Gopher's 8-word list);
  // symbol-to-word ratio (# or ...) ≤ 0.1. (The paper's line-based
  // bullet/ellipsis rules need multi-line docs — the testdata corpus
  // is single-line, so they are omitted rather than trivially true.)
  //
  // Determinism: every ratio is ONE IEEE division of exactly-computed
  // integers (counts), compared against exact literal thresholds —
  // identical on both engines, no quantization needed. Flags are
  // ints, keep is their conjunction. One per-row projection chain,
  // zero shuffles; `t` is kept as its own projection level so
  // CollapseProject preserves the single tokenize (non-cheap
  // multi-referenced alias) across the five rule expressions.
  // ------------------------------------------------------------------
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")

  val gopherRules: Q = Q(
    "q156_gopher_rules",
    (s, d) => {
      val stops = typedlit(GopherStops)
      val nTok = size(col("t")).cast("long")
      val meanLen = aggregate(transform(col("t"), x => length(x)),
        lit(0), (a, x) => a + x).cast("double") / size(col("t"))
      val fracAlpha = size(filter(col("t"), x => x.rlike("[a-z]")))
        .cast("double") / size(col("t"))
      val nStop = size(filter(col("t"), x => array_contains(stops, x)))
      val fracSym = size(filter(col("t"),
        x => x.contains("#") || x.contains("...")))
        .cast("double") / size(col("t"))
      // scale-adaptive spread (Dsl.spreadIfNarrow): no-op at scale
      spreadIfNarrow(Tables.documents(s, d), col("doc_id"))
        .withColumn("t", toks(lower(col("text"))))
        .select(col("doc_id"), nTok.as("n_tokens"),
          meanLen.as("mean_word_len"), fracAlpha.as("frac_alpha"),
          nStop.cast("long").as("n_stop"), fracSym.as("frac_sym"))
        .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
          col("frac_alpha"), col("n_stop"), col("frac_sym"),
          (col("n_tokens") >= 50 && col("n_tokens") <= 100000)
            .cast("int").as("r_wordcount"),
          (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
            .cast("int").as("r_meanlen"),
          (col("frac_alpha") >= 0.8).cast("int").as("r_alpha"),
          (col("n_stop") >= 2).cast("int").as("r_stop"),
          (col("frac_sym") <= 0.1).cast("int").as("r_symbol"))
        .withColumn("keep",
          (col("r_wordcount") === 1 && col("r_meanlen") === 1 &&
            col("r_alpha") === 1 && col("r_stop") === 1 &&
            col("r_symbol") === 1).cast("int"))
        .orderBy("doc_id")
    },
    Some {
      val stops = GopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH tk AS (SELECT doc_id, ${sqlToks("lower(text)")} AS t
          FROM documents),
        f AS (SELECT doc_id,
            cast(len(t) as bigint) AS n_tokens,
            cast(list_sum(list_transform(t, x -> length(x))) as double)
              / len(t) AS mean_word_len,
            cast(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
              as double) / len(t) AS frac_alpha,
            cast(len(list_filter(t, x -> list_contains($stops, x)))
              as bigint) AS n_stop,
            cast(len(list_filter(t, x ->
              contains(x, '#') OR contains(x, '...'))) as double)
              / len(t) AS frac_sym
          FROM tk),
        r AS (SELECT *,
            cast(n_tokens >= 50 AND n_tokens <= 100000 as int)
              AS r_wordcount,
            cast(mean_word_len >= 3.0 AND mean_word_len <= 10.0 as int)
              AS r_meanlen,
            cast(frac_alpha >= 0.8 as int) AS r_alpha,
            cast(n_stop >= 2 as int) AS r_stop,
            cast(frac_sym <= 0.1 as int) AS r_symbol
          FROM f)
        SELECT doc_id, n_tokens, mean_word_len, frac_alpha, n_stop,
          frac_sym, r_wordcount, r_meanlen, r_alpha, r_stop, r_symbol,
          cast(r_wordcount = 1 AND r_meanlen = 1 AND r_alpha = 1
            AND r_stop = 1 AND r_symbol = 1 as int) AS keep
        FROM r ORDER BY doc_id"""
    })

  // ------------------------------------------------------------------
  // q157 — Gopher repetition battery (Rae et al. 2021, Table A1's
  // other half; q80 covers token-level repetition ratios): per doc and
  // per n ∈ {2, 3, 4}, the most frequent word n-gram (ties to the
  // lexicographically smallest — deterministic on both engines) and
  // the fraction of document characters its occurrences cover,
  // count × len(gram) / len(doc) (the Dolma approximation: overlapping
  // occurrences may double-count — documented, identical both sides).
  // High top-n-gram coverage = templated/boilerplate text.
  //
  // Scale shape: n-gram enumeration is doc-local (guarded sequence
  // transform — no O(tokens²) lambda inlining, the q84 lesson); the
  // count aggregate shuffles on (doc_id, n, gram) with map-side
  // partials; the per-(doc, n) argmax is the row_number()-filter
  // pattern, which GraftExtensions' TopKPerGroup strategy rewrites to
  // the bounded-heap exec (k=1 — no per-group sort); the doc-length
  // join is a narrow projection of the same tokenize. The fraction is
  // one IEEE division of exact integers — no quantization.
  // ------------------------------------------------------------------
  val gopherRepetition: Q = Q(
    "q157_gopher_repetition",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // isNotNull on the SHARED source, not per-branch: the final
      // chars join would otherwise push isnotnull(doc_id) into only
      // its own branch's scan and de-canonicalize it from the union
      // branches, breaking exchange reuse (the q145/q133 trap).
      // Semantically a no-op: doc_id is the table's key.
      val docs = Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"), toks(lower(col("text"))).as("t"))
      def gramsOf(n: Int) = {
        val idx = when(size(col("t")) >= n,
          sequence(lit(1), size(col("t")) - (n - 1)))
          .otherwise(array().cast("array<int>"))
        transform(idx, i => concat_ws(" ",
          (0 until n).map(j => element_at(col("t"), i + j)): _*))
      }
      // explode_OUTER + explicit null filter: the inner form infers
      // size(grams)>0 and pushes it below the exchange into only the
      // gram branches' scans, de-canonicalizing them from the chars
      // branch (the q152 trap); the null filter references the
      // GENERATED column, so it cannot sink past the Generate and the
      // shared exchange stays canonical. Docs with < n tokens emit a
      // null gram that the filter drops — same semantics as inner.
      val grams = (2 to 4).map(n => docs.select(col("doc_id"),
          lit(n).as("n"), explode_outer(gramsOf(n)).as("gram")))
        .reduce(_ unionByName _)
        .filter(col("gram").isNotNull)
      val counts = grams.groupBy("doc_id", "n", "gram")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("doc_id"), col("n"))
        .orderBy(desc("cnt"), asc("gram"))
      val top = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "n", "gram", "cnt")
      val chars = docs.select(col("doc_id"),
        length(concat_ws(" ", col("t"))).cast("long").as("doc_chars"))
      top.join(chars, "doc_id")
        .select(col("doc_id"), col("n"), col("gram"), col("cnt"),
          ((col("cnt") * length(col("gram")).cast("long")).cast("double") /
            col("doc_chars")).as("top_gram_char_frac"))
        .orderBy("doc_id", "n")
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${sqlToks("lower(text)")} AS t
        FROM documents),
      g AS (${(2 to 4).map(n =>
        s"""SELECT doc_id, $n AS n, concat_ws(' ', ${(0 until n).map(j =>
          s"t[i+$j]").mkString(", ")}) AS gram
          FROM tk, unnest(generate_series(1, len(t) - ${n - 1})) AS u(i)""")
        .mkString(" UNION ALL ")}),
      c AS (SELECT doc_id, n, gram, cast(count(*) as bigint) AS cnt
        FROM g GROUP BY 1, 2, 3),
      r AS (SELECT doc_id, n, gram, cnt,
          row_number() OVER (PARTITION BY doc_id, n
            ORDER BY cnt DESC, gram) AS rn
        FROM c),
      ch AS (SELECT doc_id,
          cast(length(array_to_string(t, ' ')) as bigint) AS doc_chars
        FROM tk)
      SELECT r.doc_id, cast(n as int) AS n, gram, cnt,
        cast(cnt * length(gram) as double) / doc_chars
          AS top_gram_char_frac
      FROM r JOIN ch ON r.doc_id = ch.doc_id
      WHERE rn = 1 ORDER BY r.doc_id, n"""))

  /** q182 — vocabulary coverage curve: what fraction of corpus TOKEN
    * mass the top-N most frequent types cover, for N ∈ {10, 100,
    * 1000, 10000} — the query behind every vocab-size decision (a
    * tokenizer whose 32k vocab covers 95% of running text byte-falls-
    * back on the rest; cf. q107's OOV rate, which fixes N=100 and
    * reports per doc). Ties at the cutoff frequency are
    * interchangeable: any N-subset of equal-frequency types covers
    * identical mass, so the value is well-defined and the naive
    * row_number oracle (ties by term) hash-matches.
    *
    * Scale shape: the q113 discipline applied to the FREQUENCY domain
    * — unigram counts (one vocab-keyed shuffle with map-side
    * partials), then the COUNT-OF-COUNTS histogram (how many types
    * have frequency f — map-combinable, |rows| = distinct
    * frequencies, a long-tail corpus has ~√(token mass) of them), a
    * descending cumulative over that AGGREGATED frame only, and a
    * 4-row broadcast bounds join locating each target's cutoff band:
    * covered = full bands above the cutoff + (N − types_before)·f* in
    * the tie band. No vocab-sized window, no top-N sort, no second
    * corpus pass. */
  val vocabCoverage: Q = Q(
    "q182_vocab_coverage",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val spark2 = s
      import spark2.implicits._
      val uni = Tables.documents(s, d)
        .select(explode(toks(lower(col("text")))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
      val hist = uni.groupBy("f").agg(count(lit(1)).as("n_types"))
      val cum = hist.select(col("f"), col("n_types"),
        coalesce(sum(col("n_types")).over(Window.orderBy(col("f").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("types_before"),
        coalesce(sum(col("f") * col("n_types"))
          .over(Window.orderBy(col("f").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("mass_before"))
      val totals = hist.agg(
        coalesce(sum(col("f") * col("n_types")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("n_types")), lit(0L)).as("n_types_all"))
      val targets = Seq(10, 100, 1000, 10000).toDF("n_target")
        .crossJoin(broadcast(totals))
        .select(col("n_target"), col("total_tokens"),
          least(col("n_target").cast("long"), col("n_types_all")).as("eff"))
      cum.join(broadcast(targets),
          col("types_before") < col("eff") &&
            col("eff") <= col("types_before") + col("n_types"))
        .select(col("n_target"), col("eff").as("n_vocab"),
          (col("mass_before") +
            (col("eff") - col("types_before")) * col("f"))
            .as("covered_tokens"),
          col("total_tokens"),
          ((col("mass_before") +
            (col("eff") - col("types_before")) * col("f")).cast("double") /
            col("total_tokens")).as("coverage"))
        .orderBy("n_target")
    },
    Some(s"""WITH uni AS MATERIALIZED (SELECT g.w AS w, count(*) AS f
        FROM (SELECT ${sqlToks("lower(text)")} AS t FROM documents),
          unnest(t) AS g(w)
        GROUP BY 1),
      r AS MATERIALIZED (SELECT f,
          row_number() OVER (ORDER BY f DESC, w) AS rn FROM uni),
      tot AS (SELECT cast(sum(f) as bigint) AS total_tokens,
          cast(count(*) as bigint) AS nt FROM uni),
      t(n_target) AS (VALUES (10), (100), (1000), (10000))
      SELECT t.n_target, least(t.n_target, tot.nt) AS n_vocab,
        cast(coalesce(sum(CASE WHEN r.rn <= least(t.n_target, tot.nt)
          THEN r.f END), 0) as bigint) AS covered_tokens,
        tot.total_tokens,
        cast(coalesce(sum(CASE WHEN r.rn <= least(t.n_target, tot.nt)
          THEN r.f END), 0) as double) / tot.total_tokens AS coverage
      FROM r, t, tot
      GROUP BY t.n_target, tot.nt, tot.total_tokens
      ORDER BY t.n_target"""))

  /** q193 — BM25 known-item retrieval MRR@10, the LEXICAL twin of
    * q190's graded ANN eval: queries are built FROM held-out docs
    * (doc_id < 8, tokens 11–14 dedup'd — the known-item protocol:
    * "can BM25 find the doc its query came from"), every corpus doc
    * with a matching term is scored with q142's unlogged-idf BM25
    * (bit-exact across engines — no libm anywhere), and the metric is
    * the reciprocal rank of the source doc in its query's top-10
    * (rr_q6 = 10⁶ div rank, q190's integer convention; mean over qids
    * = MRR@10).
    *
    * Determinism: each per-term score is the same IEEE +,*,/ sequence
    * on both engines (the q142 argument), quantized to a millionth
    * BEFORE the per-(query,doc) sum so the sum runs in exact integer
    * arithmetic (order-independent, the q150 discipline). Floor of
    * BITWISE-IDENTICAL doubles is exactly equal, so unlike q187 there
    * is no quantization-boundary risk here.
    *
    * Scale shape: tokenize once behind a canonical doc_id exchange
    * (q142 discipline — postings build + corpus stats share it);
    * postings = one map-combinable (doc_id, term) groupBy — the
    * inverted-index build; the query-term join BROADCASTS ≤ 32
    * (qid, term) rows so only the query terms' posting lists survive
    * (never corpus × queries); df and the 1-row corpus stats are
    * broadcast; the top-10 row_number compiles to TopKPerGroup's
    * bounded heap. The query branch reads its 8 docs through a
    * doc_id < 8 pruned scan (footer + one row group at any scale —
    * the q161 triage shape). */
  val bm25MrrEval: Q = {
    val NQ = 8
    Q(
      "q193_bm25_mrr_eval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // The stats branch deliberately does NOT share the postings
        // branch's tokenize+exchange: the postings subtree is buried
        // inside the cached `hits` relation below and exchange reuse
        // never crosses an InMemoryRelation boundary, so the intended
        // share silently became tokenize-twice PLUS a full shuffle of
        // the token arrays on the stats branch (measured). Stats needs
        // only (count, Σdl), a map-combinable scan aggregate — compute
        // it straight off the scan with no repartition at all; the
        // second tokenize is a cheap narrow projection, the
        // token-array exchange is gone. (Caching the tokenized frame
        // instead measured SLOWER: deserialized array rows read worse
        // than re-splitting the parquet strings.)
        val stats = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .select(size(toks(col("text"))).cast("double").as("dl"))
          .agg(count(lit(1)).as("n"), davg(col("dl")).as("avgdl"))
        val postings = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .repartition(col("doc_id"))
          .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
            explode(col("t")).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).cast("double").as("tf"), min(col("dl")).as("dl"))
        val qterms = Tables.documents(s, d)
          .filter(col("doc_id") < NQ)
          .select(col("doc_id").as("qid"),
            explode(array_distinct(slice(toks(col("text")), 11, 4)))
              .as("term"))
        val hits = graft.CacheScope.cached(
          postings.join(broadcast(qterms), "term"))
        val dfs = hits.select("term", "doc_id").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        val termScore =
          ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            ((col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) *
                (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        val top = hits.join(broadcast(dfs), "term")
          .crossJoin(broadcast(stats))
          .withColumn("s_q6", floor(termScore * lit(1e6)).cast("long"))
          .groupBy("qid", "doc_id")
          .agg(sum(col("s_q6")).as("score_q6"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("score_q6").desc, col("doc_id"))))
          .filter(col("rnk") <= 10)
        top.groupBy("qid")
          .agg(count(lit(1)).as("n_top"),
            coalesce(min(when(col("doc_id") === col("qid"), col("rnk"))),
              lit(0)).as("sr"))
          .select(col("qid"), col("n_top"),
            col("sr").cast("long").as("self_rank"),
            when(col("sr") > 0, expr("1000000 div sr"))
              .otherwise(lit(0)).cast("long").as("rr_q6"))
          .orderBy("qid")
      },
      Some(s"""WITH tk AS MATERIALIZED (SELECT doc_id, ${sqlToks("text")} AS t
            FROM documents),
          st AS (SELECT count(*) AS n,
            ${sqlDavg("cast(len(t) as double)")} AS avgdl FROM tk),
          post AS MATERIALIZED (SELECT doc_id, term,
              cast(count(*) as double) AS tf, min(dl) AS dl
            FROM (SELECT doc_id, cast(len(t) as double) AS dl,
                g.term AS term
              FROM tk, unnest(t) AS g(term))
            GROUP BY 1, 2),
          q AS (SELECT qid, g.term AS term
            FROM (SELECT doc_id AS qid, list_distinct(t[11:14]) AS qt
                FROM tk WHERE doc_id < $NQ),
              unnest(qt) AS g(term)),
          h AS MATERIALIZED (SELECT q.qid, post.doc_id, post.term,
              post.tf, post.dl
            FROM post JOIN q USING (term)),
          dfs AS (SELECT term, count(DISTINCT doc_id) AS df
            FROM h GROUP BY 1),
          sc AS (SELECT h.qid, h.doc_id,
              sum(cast(floor((((st.n - dfs.df + 0.5) / (dfs.df + 0.5)) *
                ((h.tf * 2.2) / (h.tf + 1.2 *
                  (0.25 + 0.75 * (h.dl / st.avgdl))))) * 1000000.0)
                as bigint)) AS score_q6
            FROM h JOIN dfs USING (term), st
            GROUP BY 1, 2),
          top AS (SELECT qid, doc_id, rnk FROM (
              SELECT qid, doc_id, row_number() OVER (
                PARTITION BY qid ORDER BY score_q6 DESC, doc_id) AS rnk
              FROM sc)
            WHERE rnk <= 10)
          SELECT qid, cast(count(*) as bigint) AS n_top,
            cast(coalesce(min(CASE WHEN doc_id = qid THEN rnk END), 0)
              as bigint) AS self_rank,
            cast(CASE WHEN coalesce(min(CASE WHEN doc_id = qid
                THEN rnk END), 0) > 0
              THEN 1000000 // min(CASE WHEN doc_id = qid THEN rnk END)
              ELSE 0 END as bigint) AS rr_q6
          FROM top GROUP BY qid ORDER BY qid"""),
      bench = true)
  }

  /** q224 — RM3-style pseudo-relevance-feedback query expansion
    * (Lavrenko & Croft 2001's relevance-model idea in the integer
    * dialect this repo can certify): run the q193 known-item BM25
    * round, take each query's top-5 feedback docs, mine the 3
    * heaviest non-query terms from their postings (weight = Σ tf over
    * the feedback docs — the RM3 P(t|R) numerator with the uniform
    * doc prior), and re-run BM25 with original terms at weight 2 and
    * expansion terms at weight 1 (the classic ~2/3–1/3 interpolation
    * as exact integers). Output compares self-rank/RR before vs after
    * — the measurement behind "does PRF help or drift" per query.
    *
    * Determinism: both rounds quantize each per-term score to a
    * millionth BEFORE weighting and summing (the q193/q150 integer-sum
    * discipline; floor of bitwise-identical IEEE doubles is equal), so
    * feedback selection, expansion mining (integer tf sums, ties to
    * the alphabetically-first term), and the final ranking are all
    * integer decisions on both engines.
    *
    * Scale shape: q193's exactly — postings built once behind the
    * canonical doc_id exchange and CACHED (both rounds' hits probe it
    * via ≤ 32- and ≤ 56-row broadcast term lists, so only the query
    * terms' posting lists ever leave the scan); feedback-doc postings
    * come from the SAME cached frame via a ≤ 40-row broadcast semi
    * shape, never a corpus re-read; every window is the row_number≤k
    * → TopKPerGroup bounded heap. */
  val rm3Expansion: Q = {
    val NQ = 8
    Q(
      "q224_rm3_expansion",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // Stats straight off the scan, no repartition (the q193
        // reasoning: the postings subtree lives inside the cached
        // relation, exchange reuse cannot cross that boundary, and a
        // map-combinable (count, Σdl) aggregate needs no exchange —
        // the old shape paid a full token-array shuffle for nothing)
        val stats = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .select(size(toks(col("text"))).cast("double").as("dl"))
          .agg(count(lit(1)).as("n"), davg(col("dl")).as("avgdl"))
        val postings = graft.CacheScope.cached(Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .repartition(col("doc_id"))
          .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
            explode(col("t")).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).cast("double").as("tf"), min(col("dl")).as("dl")))
        val qterms = Tables.documents(s, d)
          .filter(col("doc_id") < NQ)
          .select(col("doc_id").as("qid"),
            explode(array_distinct(slice(toks(col("text")), 11, 4)))
              .as("term"))
        val termScore =
          ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            ((col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) *
                (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
        def ranked(qt: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          // hits cached per round (the q193 discipline): the df count
          // and the scoring path each probed the corpus-wide postings
          // cache otherwise — two full cache scans per round for a
          // query-term-bounded frame
          val hits = graft.CacheScope.cached(
            postings.join(broadcast(qt), "term"))
          val dfs = hits.select("term", "doc_id").distinct()
            .groupBy("term").agg(count(lit(1)).as("df"))
          hits.join(broadcast(dfs), "term")
            .crossJoin(broadcast(stats))
            .withColumn("s_q6",
              col("w") * floor(termScore * lit(1e6)).cast("long"))
            .groupBy("qid", "doc_id")
            .agg(sum(col("s_q6")).as("score_q6"))
            .withColumn("rnk", row_number().over(
              Window.partitionBy("qid")
                .orderBy(col("score_q6").desc, col("doc_id"))))
        }
        val top1 = graft.CacheScope.cached(
          ranked(qterms.withColumn("w", lit(1L))).filter(col("rnk") <= 10))
        val fb = top1.filter(col("rnk") <= 5).select("qid", "doc_id")
        val exp = postings.join(broadcast(fb), "doc_id")
          .join(qterms, Seq("qid", "term"), "left_anti")
          .groupBy("qid", "term")
          .agg(sum(col("tf")).cast("long").as("wt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("wt").desc, col("term"))))
          .filter(col("rn") <= 3)
          .select("qid", "term")
        val expC = graft.CacheScope.cached(exp)
        val q2 = qterms.withColumn("w", lit(2L))
          .unionByName(expC.withColumn("w", lit(1L)))
        val top2 = ranked(q2).filter(col("rnk") <= 10)
        def metrics(top: org.apache.spark.sql.DataFrame, r: String): org.apache.spark.sql.DataFrame = top
          .groupBy("qid")
          .agg(coalesce(min(when(col("doc_id") === col("qid"), col("rnk"))),
            lit(0)).cast("long").as(s"self_rank_$r"))
          .withColumn(s"rr${r}_q6",
            when(col(s"self_rank_$r") > 0,
              expr(s"1000000 div self_rank_$r"))
              .otherwise(lit(0)).cast("long"))
        val expStr = expC.groupBy("qid")
          .agg(concat_ws(",", sort_array(collect_list(col("term"))))
            .as("exp_terms"))
        metrics(top1, "1").join(metrics(top2, "2"), Seq("qid"))
          .join(expStr, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("exp_terms"), lit("")).as("exp_terms"),
            col("self_rank_1"), col("rr1_q6"),
            col("self_rank_2"), col("rr2_q6"))
          .orderBy("qid")
      },
      Some(s"""WITH tk AS MATERIALIZED (SELECT doc_id, ${sqlToks("text")} AS t
            FROM documents),
          st AS MATERIALIZED (SELECT count(*) AS n,
            ${sqlDavg("cast(len(t) as double)")} AS avgdl FROM tk),
          post AS MATERIALIZED (SELECT doc_id, term,
              cast(count(*) as double) AS tf, min(dl) AS dl
            FROM (SELECT doc_id, cast(len(t) as double) AS dl,
                g.term AS term
              FROM tk, unnest(t) AS g(term))
            GROUP BY 1, 2),
          q AS MATERIALIZED (SELECT qid, g.term AS term
            FROM (SELECT doc_id AS qid, list_distinct(t[11:14]) AS qt
                FROM tk WHERE doc_id < $NQ),
              unnest(qt) AS g(term)),
          h1 AS MATERIALIZED (SELECT q.qid, post.doc_id, post.term,
              post.tf, post.dl
            FROM post JOIN q USING (term)),
          dfs1 AS MATERIALIZED (SELECT term, count(DISTINCT doc_id) AS df
            FROM h1 GROUP BY 1),
          top1 AS MATERIALIZED (SELECT qid, doc_id, rnk FROM (
              SELECT qid, doc_id, row_number() OVER (
                PARTITION BY qid ORDER BY score_q6 DESC, doc_id) AS rnk
              FROM (SELECT h1.qid, h1.doc_id,
                  sum(cast(floor((((st.n - dfs1.df + 0.5) / (dfs1.df + 0.5)) *
                    ((h1.tf * 2.2) / (h1.tf + 1.2 *
                      (0.25 + 0.75 * (h1.dl / st.avgdl))))) * 1000000.0)
                    as bigint)) AS score_q6
                FROM h1 JOIN dfs1 USING (term), st
                GROUP BY 1, 2))
            WHERE rnk <= 10),
          fb AS MATERIALIZED (SELECT qid, doc_id FROM top1 WHERE rnk <= 5),
          ex AS MATERIALIZED (SELECT qid, term FROM (
              SELECT c.qid, c.term, row_number() OVER (
                PARTITION BY c.qid ORDER BY c.wt DESC, c.term) AS rn
              FROM (SELECT fb.qid, post.term,
                  cast(sum(post.tf) as bigint) AS wt
                FROM post JOIN fb USING (doc_id)
                WHERE NOT EXISTS (SELECT 1 FROM q
                  WHERE q.qid = fb.qid AND q.term = post.term)
                GROUP BY 1, 2) c)
            WHERE rn <= 3),
          q2 AS MATERIALIZED (SELECT qid, term, 2 AS w FROM q
            UNION ALL SELECT qid, term, 1 AS w FROM ex),
          h2 AS MATERIALIZED (SELECT q2.qid, q2.w, post.doc_id, post.term,
              post.tf, post.dl
            FROM post JOIN q2 USING (term)),
          dfs2 AS MATERIALIZED (SELECT term, count(DISTINCT doc_id) AS df
            FROM h2 GROUP BY 1),
          top2 AS MATERIALIZED (SELECT qid, doc_id, rnk FROM (
              SELECT qid, doc_id, row_number() OVER (
                PARTITION BY qid ORDER BY score_q6 DESC, doc_id) AS rnk
              FROM (SELECT h2.qid, h2.doc_id,
                  sum(h2.w * cast(floor((((st.n - dfs2.df + 0.5) /
                    (dfs2.df + 0.5)) * ((h2.tf * 2.2) / (h2.tf + 1.2 *
                      (0.25 + 0.75 * (h2.dl / st.avgdl))))) * 1000000.0)
                    as bigint)) AS score_q6
                FROM h2 JOIN dfs2 USING (term), st
                GROUP BY 1, 2))
            WHERE rnk <= 10),
          m1 AS (SELECT qid, cast(coalesce(min(CASE WHEN doc_id = qid
                THEN rnk END), 0) as bigint) AS self_rank_1
            FROM top1 GROUP BY 1),
          m2 AS (SELECT qid, cast(coalesce(min(CASE WHEN doc_id = qid
                THEN rnk END), 0) as bigint) AS self_rank_2
            FROM top2 GROUP BY 1),
          es AS (SELECT qid, string_agg(term, ',' ORDER BY term)
              AS exp_terms
            FROM ex GROUP BY 1)
          SELECT m1.qid, coalesce(es.exp_terms, '') AS exp_terms,
            m1.self_rank_1,
            cast(CASE WHEN m1.self_rank_1 > 0
              THEN 1000000 // m1.self_rank_1 ELSE 0 END as bigint) AS rr1_q6,
            m2.self_rank_2,
            cast(CASE WHEN m2.self_rank_2 > 0
              THEN 1000000 // m2.self_rank_2 ELSE 0 END as bigint) AS rr2_q6
          FROM m1 JOIN m2 USING (qid) LEFT JOIN es USING (qid)
          ORDER BY m1.qid"""),
      bench = true)
  }

  /** q195 — per-source n-gram diversity audit, the SYNTHETIC-DATA
    * COLLAPSE detector: a model-generated (or template-stamped) source
    * shows a collapsed 3-gram distribution — low type/token ratio and
    * a few shingles carrying an outsized share of the mass — long
    * before any pairwise dedup fires (the diversity-collapse failure
    * mode described in the model-collapse literature, e.g. Shumailov
    * et al. 2023). Per source: doc count, 3-gram instances, distinct
    * 3-gram types, TTR, and the single hottest shingle's mass share
    * (`top_share` — the template smoking gun; q157 measures the same
    * idea per doc, this per SOURCE, the granularity at which synthetic
    * data enters a mixture).
    *
    * Scale shape: explode → ONE map-combinable groupBy on (source,
    * shingle) — parallel across shingles, never a per-source funnel —
    * then a second tiny groupBy on source over the type counts; the
    * per-source doc count is a separate 1-column `source` scan (the
    * q177 narrow-column precedent: cheaper than routing the shingle
    * explode through a shared exchange). Ratios are single IEEE
    * divides of exact integers. */
  val sourceDiversity: Q = Q(
    "q195_source_diversity",
    (s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("source"),
          explode(shingles3(toks(col("text")))).as("sh"))
        .groupBy("source", "sh").agg(count(lit(1)).as("cnt"))
      val agg = sh.groupBy("source").agg(
        sum(col("cnt")).as("n_shingles"),
        count(lit(1)).as("n_types"),
        max(col("cnt")).as("top_count"))
      val docs = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      docs.join(agg, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_types"), lit(0L)).as("n_types"),
          coalesce(col("top_count"), lit(0L)).as("top_count"),
          when(coalesce(col("n_shingles"), lit(0L)) > 0,
            coalesce(col("n_types"), lit(0L)).cast("double") /
              col("n_shingles")).otherwise(lit(0.0)).as("ttr"),
          when(coalesce(col("n_shingles"), lit(0L)) > 0,
            coalesce(col("top_count"), lit(0L)).cast("double") /
              col("n_shingles")).otherwise(lit(0.0)).as("top_share"))
        .orderBy("source")
    },
    Some(s"""WITH sh AS MATERIALIZED (SELECT source, g.sh AS sh, count(*) AS cnt
          FROM (SELECT source, ${sqlShingles3(sqlToks("text"))} AS shs
              FROM documents),
            unnest(shs) AS g(sh)
          GROUP BY 1, 2),
        agg AS (SELECT source, cast(sum(cnt) as bigint) AS n_shingles,
            cast(count(*) as bigint) AS n_types,
            cast(max(cnt) as bigint) AS top_count
          FROM sh GROUP BY 1),
        docs AS (SELECT source, cast(count(*) as bigint) AS n_docs
          FROM documents GROUP BY 1)
        SELECT d.source, d.n_docs,
          coalesce(a.n_shingles, 0) AS n_shingles,
          coalesce(a.n_types, 0) AS n_types,
          coalesce(a.top_count, 0) AS top_count,
          CASE WHEN coalesce(a.n_shingles, 0) > 0
            THEN cast(a.n_types as double) / a.n_shingles
            ELSE 0.0 END AS ttr,
          CASE WHEN coalesce(a.n_shingles, 0) > 0
            THEN cast(a.top_count as double) / a.n_shingles
            ELSE 0.0 END AS top_share
        FROM docs d LEFT JOIN agg a USING (source)
        ORDER BY d.source"""))

  /** q201 — per-source vocabulary drift: χ² distance between each
    * source's unigram distribution and the corpus mixture, over the
    * top-100 corpus terms — the mixture-drift monitor that flags a
    * source whose language shifted (a scraper gone wrong, a synthetic
    * source leaking templates, a new crawl snapshot changing register)
    * BEFORE it moves downstream metrics. χ² instead of KL on purpose:
    * KL needs ln() (libm, engine-divergent on data-dependent values —
    * the q188 literal trick only works for pinned vocabularies), while
    * χ² = Σ (p_s − p_c)²/p_c is pure +,−,×,÷ — the same IEEE sequence
    * on both engines. Each term's contribution is quantized
    * floor(·10¹²) BEFORE the per-source sum (q150 discipline: exact
    * integer sum, order-independent, no boundary risk on bitwise-
    * identical doubles).
    *
    * Scale shape: ONE tokenize scan → (source, term) counts
    * (map-combinable, vocabulary-bounded); corpus counts, per-source
    * totals and the grand total all derive from that frame (cached —
    * never a second corpus pass); top-100 selection is
    * TakeOrderedAndProject with the (cnt DESC, w) tie-break — never a
    * vocab-sized global window (the q182 trap); the scoring join is
    * |sources| × 100 broadcast rows. */
  val sourceDrift: Q = Q(
    "q201_source_drift",
    (s, d) => {
      val sw = graft.CacheScope.cached(
        Tables.documents(s, d)
          .select(col("source"), explode(toks(lower(col("text")))).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c_sw")))
      val cw = sw.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
      val top = cw.orderBy(desc("c_w"), asc("w")).limit(100)
      val ns = sw.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
      // Σ c_w over the vocabulary ≡ Σ c_sw over the cached counts —
      // summing sw directly skips a second vocabulary-wide exchange +
      // aggregate by w (identical long sum, plan-measured)
      val tot = sw.agg(sum(col("c_sw")).as("n_tot"))
      val grid = ns.crossJoin(broadcast(top)).crossJoin(broadcast(tot))
      // Semi-filter sw to the 100 grid terms BEFORE the scoring join
      // (guide §3.2): the left join can only match grid's (source, w)
      // keys, so pre-dropping every non-top term is a no-op on the
      // result but shrinks the join's build side from the full
      // vocabulary-sized counts frame to ≤ |sources| × 100 rows.
      val swTop = sw.join(broadcast(top.select("w")), "w")
        .select("source", "w", "c_sw")
      val scored = grid
        .join(swTop, Seq("source", "w"), "left")
        .withColumn("c_sw", coalesce(col("c_sw"), lit(0L)))
        .withColumn("p_s", col("c_sw").cast("double") / col("n_s"))
        .withColumn("p_c", col("c_w").cast("double") / col("n_tot"))
        .withColumn("contrib_q12",
          floor((col("p_s") - col("p_c")) * (col("p_s") - col("p_c")) /
            col("p_c") * lit(1e12)).cast("long"))
      scored.groupBy("source")
        .agg(min(col("n_s")).as("n_tokens"),
          sum(col("contrib_q12")).as("chi2_q12"))
        .select(col("source"), col("n_tokens"), col("chi2_q12"),
          (col("chi2_q12").cast("double") / 1e12).as("chi2"))
        .orderBy(desc("chi2_q12"), asc("source"))
    },
    Some(s"""WITH sw AS MATERIALIZED (SELECT source, g.w AS w,
          count(*) AS c_sw
        FROM (SELECT source, ${sqlToks("lower(text)")} AS t FROM documents),
          unnest(t) AS g(w)
        GROUP BY 1, 2),
      cw AS MATERIALIZED (SELECT w, cast(sum(c_sw) as bigint) AS c_w
        FROM sw GROUP BY 1),
      top AS (SELECT w, c_w FROM cw ORDER BY c_w DESC, w LIMIT 100),
      ns AS (SELECT source, cast(sum(c_sw) as bigint) AS n_s
        FROM sw GROUP BY 1),
      tot AS (SELECT cast(sum(c_w) as bigint) AS n_tot FROM cw),
      grid AS (SELECT ns.source, ns.n_s, top.w, top.c_w, tot.n_tot
        FROM ns, top, tot),
      scored AS (SELECT g.source, g.n_s,
          cast(floor((cast(coalesce(sw.c_sw, 0) as double) / g.n_s
              - cast(g.c_w as double) / g.n_tot)
            * (cast(coalesce(sw.c_sw, 0) as double) / g.n_s
              - cast(g.c_w as double) / g.n_tot)
            / (cast(g.c_w as double) / g.n_tot) * 1000000000000.0)
            as bigint) AS contrib_q12
        FROM grid g LEFT JOIN sw ON g.source = sw.source AND g.w = sw.w)
      SELECT source, cast(min(n_s) as bigint) AS n_tokens,
        cast(sum(contrib_q12) as bigint) AS chi2_q12,
        cast(sum(contrib_q12) as double) / 1000000000000.0 AS chi2
      FROM scored GROUP BY source
      ORDER BY chi2_q12 DESC, source"""),
    bench = true)

  /** q203 — EXACT corpus quantiles (p50/p90/p99/p999 of per-doc token
    * counts) without a global sort: the length-distribution audit every
    * packing/batching decision reads (q115's sequence length, q173's
    * padding waste both key off these numbers), computed exactly — not
    * approx_percentile, whose error bound is useless for a p999 SLO
    * claim — via the two-level histogram decomposition: ONE tokenize
    * scan builds the value histogram (v → cnt), a running sum over THE
    * HISTOGRAM (bounded frame: distinct per-doc token counts are capped
    * by the max document length — thousands of rows at 100 TB, never
    * corpus-sized; the q182/q173 precedent) turns it into cumulative
    * ranks (N itself rides the same pass as a full-frame sum — no
    * second scan branch, no scalar agg), and each quantile's target
    * rank k = ceil(q·N) lands in exactly one row's (cum−cnt, cum]
    * interval — a 4-element literal explode + interval filter, no join
    * at all. Rank selection semantics (lowest value whose rank ≥ k) match
    * the oracle's row_number-over-full-sort EXACTLY; the oracle IS the
    * naive global sort, so the decomposition is hash-proven. All
    * arithmetic is exact integers (k via integer `div` ceil — never a
    * double `/` on row counts, the q181 lesson). */
  val exactQuantiles: Q = Q(
    "q203_exact_quantiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.documents(s, d)
        .select(size(toks(col("text"))).cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
      // N rides the SAME single-partition histogram sort as the running
      // sum (full-frame window) — no second scan branch, no scalar agg
      val cum = hist.select(col("v"), col("cnt"),
        sum(col("cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
        sum(col("cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("n"))
      cum.select(col("v"), col("cnt"), col("cum"),
          explode(typedlit(Seq(("p50", 1L, 2L), ("p90", 9L, 10L),
            ("p99", 99L, 100L), ("p999", 999L, 1000L)))).as("q"),
          col("n"))
        .withColumn("krank", expr("(q._2 * n + q._3 - 1) div q._3"))
        .filter(col("cum") >= col("krank") &&
          col("cum") - col("cnt") < col("krank"))
        .select(col("q._1").as("label"), col("krank"), col("v").as("value"))
        .orderBy("label")
    },
    Some(s"""WITH tc AS MATERIALIZED (SELECT
          cast(len(${sqlToks("text")}) as bigint) AS v FROM documents),
      n AS (SELECT cast(count(*) as bigint) AS n FROM tc),
      r AS MATERIALIZED (SELECT v,
          row_number() OVER (ORDER BY v) AS rn FROM tc),
      q(label, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10),
        ('p99', 99, 100), ('p999', 999, 1000))
      SELECT q.label,
        cast((q.num * n.n + q.den - 1) // q.den as bigint) AS krank,
        r.v AS value
      FROM q, n, r
      WHERE r.rn = (q.num * n.n + q.den - 1) // q.den
      ORDER BY q.label"""),
    bench = true)

  /** q208 — quality × duplication SURVIVAL matrix: per quality tier
    * (q31's exact integer rule — good/fair/poor on n_tokens/n_uniq, no
    * float threshold anywhere), how much of the tier is exact-dup
    * material and what the q35 keep-min-doc_id dedup actually removes
    * (docs and token mass) — the interaction audit RefinedWeb-style
    * pipelines publish: if dedup's removals concentrate in the "good"
    * tier, the pipeline is eating its best data and the dedup key (not
    * the quality filter) is what needs tuning.
    *
    * Determinism: tier rule, dup membership (hash count > 1) and
    * keeper choice (min doc_id per hash) are all exact integers; the
    * one fraction divides the same bitwise-equal integer pair on both
    * engines, guarded to 0.0 for a zero-token tier.
    *
    * Scale shape: ONE documents scan projects (doc_id, h, n_tokens,
    * tier) — cached, since both the per-hash aggregate and the
    * join-back read it; the join-back is keyed on the 61-bit hash
    * (narrow columns only, the q127 discipline) and the output is a
    * ≤3-row hash-agg. Never a window, never a second corpus pass. */
  val qualityDupMatrix: Q = Q(
    "q208_quality_dup_matrix",
    (s, d) => {
      val base = graft.CacheScope.cached(
        Tables.documents(s, d)
          .withColumn("t", toks(col("text")))
          .select(col("doc_id"), md5h61(col("text")).as("h"),
            size(col("t")).cast("long").as("n_tokens"),
            size(array_distinct(col("t"))).cast("long").as("n_uniq"))
          .withColumn("quality",
            when(col("n_tokens") >= 50 && col("n_uniq") >= 20, "good")
              .when(col("n_tokens") >= 20, "fair")
              .otherwise("poor")))
      val byHash = base.groupBy("h")
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
      base.join(byHash, "h")
        .groupBy("quality")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
            .as("n_dropped"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(when(col("doc_id") =!= col("keeper"), col("n_tokens"))
            .otherwise(0L)).as("tokens_dropped"))
        .select(col("quality"), col("n_docs"), col("n_dup_docs"),
          col("n_dropped"), col("tokens_total"), col("tokens_dropped"),
          when(col("tokens_total") > 0,
            col("tokens_dropped").cast("double") / col("tokens_total"))
            .otherwise(lit(0.0)).as("dropped_token_frac"))
        .orderBy("quality")
    },
    Some(s"""WITH base AS MATERIALIZED (SELECT doc_id,
          ${sqlMd5h61("text")} AS h,
          cast(len(t) as bigint) AS n_tokens,
          cast(len(list_distinct(t)) as bigint) AS n_uniq
        FROM (SELECT doc_id, text, ${sqlToks("text")} AS t
              FROM documents)),
      tiered AS MATERIALIZED (SELECT doc_id, h, n_tokens,
          CASE WHEN n_tokens >= 50 AND n_uniq >= 20 THEN 'good'
               WHEN n_tokens >= 20 THEN 'fair' ELSE 'poor' END AS quality
        FROM base),
      by_hash AS (SELECT h, count(*) AS n_copies,
          min(doc_id) AS keeper
        FROM tiered GROUP BY 1)
      SELECT t.quality,
        cast(count(*) as bigint) AS n_docs,
        cast(count(*) FILTER (WHERE bh.n_copies > 1) as bigint)
          AS n_dup_docs,
        cast(count(*) FILTER (WHERE t.doc_id <> bh.keeper) as bigint)
          AS n_dropped,
        cast(sum(t.n_tokens) as bigint) AS tokens_total,
        cast(coalesce(sum(t.n_tokens)
          FILTER (WHERE t.doc_id <> bh.keeper), 0) as bigint)
          AS tokens_dropped,
        CASE WHEN sum(t.n_tokens) > 0
          THEN cast(coalesce(sum(t.n_tokens)
            FILTER (WHERE t.doc_id <> bh.keeper), 0) as double)
            / sum(t.n_tokens)
          ELSE 0.0 END AS dropped_token_frac
      FROM tiered t JOIN by_hash bh USING (h)
      GROUP BY t.quality
      ORDER BY t.quality"""))

  /** q210 — per-source LENGTH-distribution drift: the exact two-sample
    * Kolmogorov–Smirnov statistic between each source's per-doc
    * token-length distribution and the REST of the corpus — q201
    * watches WHAT a source says (vocabulary), this watches the SHAPE
    * of what it ships (a scraper that starts truncating, a source
    * switching from articles to tweets, a chunking bug upstream — all
    * move length before they move content metrics).
    *
    * Exactness: KS = sup|F_s − F_r| is attained at a jump point of
    * either CDF, so evaluating on the corpus-wide distinct-length grid
    * is EXACT, and |cum_s·n_r − cum_r·n_s| keeps the comparison in
    * integers (decimal(38,0)/HUGEINT — the q154 headroom discipline:
    * count × count overflows int64 at the 100 TB design point); the
    * statistic is quantized to ks_q9 by integral division of the same
    * bitwise-equal integers on both engines. A single-source corpus
    * (n_r = 0) reports 0 by guard.
    *
    * Scale shape: ONE tokenize scan → (source, length) histogram
    * (map-combinable, cached); every window runs over the
    * |sources| × |distinct lengths| GRID, never over docs (the
    * q182/q203 histogram-domain discipline — distinct lengths are
    * bounded by max doc length); output is |sources| rows. */
  val lengthDrift: Q = Q(
    "q210_length_drift",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = graft.CacheScope.cached(
        Tables.documents(s, d)
          .select(col("source"), size(toks(col("text"))).cast("long").as("v"))
          .groupBy("source", "v").agg(count(lit(1)).as("c")))
      val allv = hist.select("v").distinct()
      val srcs = hist.groupBy("source").agg(sum(col("c")).as("n_s"))
      val tot = srcs.agg(sum(col("n_s")).as("n_all"))
      val cums = srcs.crossJoin(broadcast(allv))
        .join(hist, Seq("source", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .withColumn("cum_s", sum(col("c")).over(
          Window.partitionBy("source").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)))
      val gh = hist.groupBy("v").agg(sum(col("c")).as("cv"))
        .withColumn("cum_all", sum(col("cv")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .select("v", "cum_all")
      cums.join(gh, "v")
        .crossJoin(broadcast(tot))
        .withColumn("n_r", col("n_all") - col("n_s"))
        .withColumn("num", abs(
          col("cum_s").cast("decimal(38,0)") * col("n_r") -
            (col("cum_all") - col("cum_s")).cast("decimal(38,0)") * col("n_s")))
        .groupBy("source")
        .agg(min(col("n_s")).as("n_docs"), min(col("n_r")).as("n_r"),
          max(col("num")).as("ks_num"))
        .withColumn("ks_q9",
          when(col("n_r") > 0, expr(
            "cast((ks_num * 1000000000) div " +
              "(cast(n_docs as decimal(38,0)) * n_r) as bigint)"))
            .otherwise(lit(0L)))
        .select(col("source"), col("n_docs"), col("ks_q9"),
          (col("ks_q9").cast("double") / 1e9).as("ks"))
        .orderBy(desc("ks_q9"), asc("source"))
    },
    Some(s"""WITH h AS MATERIALIZED (SELECT source,
          cast(len(${sqlToks("text")}) as bigint) AS v, count(*) AS c
        FROM documents GROUP BY 1, 2),
      av AS (SELECT DISTINCT v FROM h),
      srcs AS MATERIALIZED (SELECT source, cast(sum(c) as bigint) AS n_s
        FROM h GROUP BY 1),
      tot AS (SELECT cast(sum(n_s) as bigint) AS n_all FROM srcs),
      grid AS (SELECT s.source, s.n_s, av.v,
          cast(coalesce(hh.c, 0) as bigint) AS c
        FROM srcs s CROSS JOIN av
        LEFT JOIN h hh ON hh.source = s.source AND hh.v = av.v),
      cums AS (SELECT source, n_s, v, sum(c) OVER (PARTITION BY source
          ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_s
        FROM grid),
      gh AS (SELECT v, sum(cv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
          AS cum_all
        FROM (SELECT v, cast(sum(c) as bigint) AS cv FROM h GROUP BY 1)),
      sc AS (SELECT c.source, c.n_s, tot.n_all - c.n_s AS n_r,
          abs(c.cum_s::hugeint * (tot.n_all - c.n_s)
            - (g.cum_all - c.cum_s)::hugeint * c.n_s) AS num
        FROM cums c JOIN gh g USING (v) CROSS JOIN tot),
      agg AS (SELECT source, min(n_s) AS n_docs, min(n_r) AS n_r,
          max(num) AS ks_num
        FROM sc GROUP BY 1)
      SELECT source, n_docs,
        cast(CASE WHEN n_r > 0
          THEN (ks_num * 1000000000) // (n_docs::hugeint * n_r)
          ELSE 0 END as bigint) AS ks_q9,
        cast(cast(CASE WHEN n_r > 0
          THEN (ks_num * 1000000000) // (n_docs::hugeint * n_r)
          ELSE 0 END as bigint) as double) / 1000000000.0 AS ks
      FROM agg
      ORDER BY ks_q9 DESC, source"""))

  /** q239 — readability battery (Flesch reading-ease, fixed-point): the
    * classic curriculum/quality feature family the heuristic scorers
    * (q31/q156) don't cover — words per sentence and syllables per word,
    * folded into the Flesch score 206.835 − 1.015·(w/s) − 84.6·(sy/w).
    * Syllables use the standard vowel-run heuristic (maximal [aeiouy]+
    * runs per lowercased token, minimum 1 — the rule every readability
    * library ships); sentences are [.!?]+ segments with non-blank
    * content, minimum 1. The score is emitted as floor(·1000) — the two
    * divisions are exact-long/exact-long (bit-identical IEEE), the
    * multiply-subtract chain is written in the same order on both
    * engines, and the short decimal literals convert identically (the
    * ≤15-digit rule), so the fixed-point value hash-matches.
    *
    * Scale shape: a pure per-row projection — the syllable fold is a
    * doc-local higher-order expression (the q223 discipline), the regex
    * work is spread by the explicit doc_id repartition (documents
    * parquet arrives in O(1) partitions), and nothing shuffles except
    * the output sort. */
  val readability: Q = Q(
    "q239_readability",
    (s, d) => {
      val t = toks(col("text"))
      val words = size(t).cast("long")
      val sents = greatest(lit(1L),
        size(filter(split(col("text"), "[.!?]+"),
          x => length(trim(x)) > 0)).cast("long"))
      val sylls = aggregate(t, lit(0L), (acc, w) =>
        acc + greatest(lit(1L),
          size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))
            .cast("long")))
      Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
          sylls.as("n_syll"))
        .withColumn("fk_x1000",
          floor((lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
            - lit(84.6) * (col("n_syll").cast("double") / col("n_words")))
            * 1000).cast("long"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, text, ${sqlToks("text")} AS tk
          FROM documents),
      m AS (SELECT doc_id,
          cast(len(tk) as bigint) AS n_words,
          greatest(1, cast(len(list_filter(
            string_split_regex(text, '[.!?]+'),
            x -> len(trim(x)) > 0)) as bigint)) AS n_sents,
          cast(list_sum(list_transform(tk, w ->
            greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+')))))
            as bigint) AS n_syll
        FROM t)
      SELECT doc_id, n_words, n_sents, n_syll,
        cast(floor((206.835
          - 1.015 * (cast(n_words as double) / n_sents)
          - 84.6 * (cast(n_syll as double) / n_words)) * 1000) as bigint)
          AS fk_x1000
      FROM m ORDER BY doc_id"""),
    bench = true)

  /** q244 — retrieval snippet extraction (keyword-in-context): for each
    * known-item query (q193's protocol — doc_id < 8, distinct tokens
    * 11–14), find candidate docs matching ≥ 2 distinct query terms and
    * extract each one's best 20-token window by query-term occupancy
    * (ties → earliest window), keeping the top-3 candidates per query
    * (hits desc, doc_id). The serving-side complement of the BM25
    * rankers: the ranker says WHICH doc, this says WHAT to show.
    *
    * Determinism: occupancy counting, window sums, argmax and the
    * first-position tie rule are all exact integers; the snippet is
    * re-assembled verbatim from the token slice on both engines.
    *
    * Scale shape: candidates come from the posting equi-join against
    * the ≤ 32-row broadcast query-term list (never corpus × queries),
    * with the ≥ 2-distinct-terms cut applied BEFORE any token array is
    * re-read; the window scan is a doc-local higher-order projection —
    * per-window sums over a length-bounded slice (O(n·20) per matched
    * doc), argmax by array_max + first array_position — and the token
    * re-join touches only the ≥ 2-term survivors (the q202/q230
    * matched-docs-only precedent); top-3 per query compiles to the
    * TopKPerGroup bounded heap. */
  val snippetExtraction: Q = {
    val NQ = 8
    Q(
      "q244_snippet_extraction",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tk = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .repartition(col("doc_id"))
        // cached: ≤ NQ rows; read by the term explode AND the final
        // qt join — one pruned scan instead of two
        val qarr = graft.CacheScope.cached(Tables.documents(s, d)
          .filter(col("doc_id") < NQ)
          .select(col("doc_id").as("qid"),
            array_distinct(slice(toks(col("text")), 11, 4)).as("qt")))
        val qterms = qarr.select(col("qid"), explode(col("qt")).as("term"))
        // explode_outer: a bare explode infers size(t) > 0 into THIS
        // branch's scan only, de-canonicalizing the shared tk exchange
        // (the q133/q152 trap); null terms drop at the equi-join
        val cand = tk
          .select(col("doc_id"), explode_outer(col("t")).as("term")).distinct()
          .join(broadcast(qterms), "term")
          .groupBy("qid", "doc_id")
          .agg(countDistinct(col("term")).as("n_terms"))
          .filter(col("n_terms") >= 2)
        val scored = cand
          .join(tk, "doc_id").join(broadcast(qarr), "qid")
          // occupancy array bound as a LAMBDA variable (hv): a plain
          // alias is single-referenced here, so CollapseProject would
          // inline the transform into every window slice — O(n²) per
          // doc (the q153 lesson)
          .withColumn("ws", element_at(transform(
            array(transform(col("t"),
              x => when(array_contains(col("qt"), x), 1).otherwise(0))),
            hv => transform(
              sequence(lit(1), greatest(lit(1), size(col("t")) - 19)),
              i => aggregate(slice(hv, i, lit(20)), lit(0), (a, x) => a + x))),
            1))
          .withColumn("n_hits", array_max(col("ws")).cast("long"))
          .withColumn("start", array_position(col("ws"), array_max(col("ws"))))
          .withColumn("snippet",
            concat_ws(" ", slice(col("t"), col("start").cast("int"), lit(20))))
        scored
          .withColumn("rnk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("n_hits").desc, col("doc_id"))))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("rnk"), col("doc_id"), col("n_terms"),
            col("n_hits"), col("start"), col("snippet"))
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH tk AS MATERIALIZED (SELECT doc_id, ${sqlToks("text")} AS t
            FROM documents),
          q AS MATERIALIZED (SELECT doc_id AS qid,
              list_distinct(t[11:14]) AS qt
            FROM tk WHERE doc_id < $NQ),
          qs AS (SELECT qid, g.term FROM q, unnest(qt) AS g(term)),
          posts AS (SELECT DISTINCT doc_id, g.term
            FROM tk, unnest(t) AS g(term)),
          cand AS (SELECT qs.qid, posts.doc_id,
              cast(count(DISTINCT posts.term) as bigint) AS n_terms
            FROM posts JOIN qs ON posts.term = qs.term
            GROUP BY 1, 2 HAVING count(DISTINCT posts.term) >= 2),
          sc AS (SELECT c.qid, c.doc_id, c.n_terms, tk.t, q.qt
            FROM cand c JOIN tk ON tk.doc_id = c.doc_id
                        JOIN q ON q.qid = c.qid),
          win AS (SELECT qid, doc_id, n_terms, t,
              list_transform(generate_series(1, greatest(1, len(t) - 19)),
                i -> list_sum(list_transform(t[i:i+19],
                  x -> CASE WHEN list_contains(qt, x)
                    THEN 1 ELSE 0 END))) AS ws
            FROM sc),
          best AS (SELECT qid, doc_id, n_terms,
              cast(list_max(ws) as bigint) AS n_hits,
              cast(list_position(ws, list_max(ws)) as bigint) AS start, t
            FROM win),
          ranked AS (SELECT qid, doc_id, n_terms, n_hits, start,
              array_to_string(t[start:start+19], ' ') AS snippet,
              row_number() OVER (PARTITION BY qid
                ORDER BY n_hits DESC, doc_id) AS rnk
            FROM best)
          SELECT qid, cast(rnk as bigint) AS rnk, doc_id, n_terms,
            n_hits, start, snippet
          FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk"""))
  }

  /** q249 — curriculum tier assignment: quartile the corpus by the
    * q239 Flesch fixed-point score (tier 0 = easiest quartile, the
    * classic easy-first curriculum order; composes with the q166
    * deterministic epoch shuffle, which orders WITHIN what this
    * stratifies) and account each tier's document and token mass. VALUE
    * cutoffs, all-ties-one-tier (the q171 convention — a doc's tier is
    * derivable from its own score + three broadcast scalars, so the
    * assignment is reproducible shard-locally at 100 TB with no global
    * rank).
    *
    * Scale shape: the q113/q171 histogram discipline end to end — ONE
    * readability scan into a (score → n_docs, token mass) histogram,
    * cutoff selection and the tier rollup both run over THE HISTOGRAM
    * (bounded by distinct scores), never a per-doc window or a second
    * corpus pass; mean score per tier is a ratio of exact sums. */
  val curriculumTiers: Q = Q(
    "q249_curriculum_tiers",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = toks(col("text"))
      val words = size(t).cast("long")
      val sents = greatest(lit(1L),
        size(filter(split(col("text"), "[.!?]+"),
          x => length(trim(x)) > 0)).cast("long"))
      val sylls = aggregate(t, lit(0L), (acc, w) =>
        acc + greatest(lit(1L),
          size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))
            .cast("long")))
      val fk = floor((lit(206.835)
        - lit(1.015) * (words.cast("double") / sents)
        - lit(84.6) * (sylls.cast("double") / words)) * 1000).cast("long")
      val hist = Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(fk.as("fk"), words.as("ntok"))
        .groupBy("fk")
        .agg(count(lit(1)).as("nd"), sum(col("ntok")).as("tok"))
      val w = Window.orderBy(col("fk").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("nd")).over(w))
      // min cum-from-the-top score reaching each quartile rank: the
      // EASIEST quartile is the highest scores, so cutoffs descend;
      // cum·4 ≥ N is the integer form of cum ≥ N/4 (no division)
      val n = hist.agg(sum(col("nd")).cast("long").as("n"))
      val withN = cum.crossJoin(broadcast(n))
      // the crossing row is the LARGEST qualifying score (cum grows as
      // fk descends — min() here would select the corpus minimum and
      // collapse every doc into tier 0)
      val cuts3 = withN.agg(
        max(when(col("cum") * 4 >= col("n"), col("fk"))).as("c1"),
        max(when(col("cum") * 2 >= col("n"), col("fk"))).as("c2"),
        max(when(col("cum") * 4 >= col("n") * 3, col("fk"))).as("c3"))
      hist.crossJoin(broadcast(cuts3))
        .groupBy(when(col("fk") >= col("c1"), 0)
          .when(col("fk") >= col("c2"), 1)
          .when(col("fk") >= col("c3"), 2).otherwise(3).as("tier"))
        .agg(sum(col("nd")).cast("long").as("n_docs"),
          sum(col("tok")).cast("long").as("tok_mass"),
          min(col("fk")).as("min_fk"), max(col("fk")).as("max_fk"),
          (splitDbl(sum((col("fk") * col("nd")).cast(Dec))) /
            sum(col("nd"))).as("mean_fk_x1000"))
        .orderBy("tier")
    },
    Some(s"""WITH m AS (SELECT
          cast(len(tk) as bigint) AS w,
          greatest(1, cast(len(list_filter(
            string_split_regex(text, '[.!?]+'),
            x -> len(trim(x)) > 0)) as bigint)) AS sc,
          cast(list_sum(list_transform(tk, x ->
            greatest(1, len(regexp_extract_all(lower(x), '[aeiouy]+')))))
            as bigint) AS sy
        FROM (SELECT text, ${sqlToks("text")} AS tk FROM documents)),
      f AS (SELECT cast(floor((206.835
            - 1.015 * (cast(w as double) / sc)
            - 84.6 * (cast(sy as double) / w)) * 1000) as bigint) AS fk,
          w AS ntok
        FROM m),
      hist AS MATERIALIZED (SELECT fk, cast(count(*) as bigint) AS nd,
          cast(sum(ntok) as bigint) AS tok
        FROM f GROUP BY 1),
      cum AS (SELECT fk, nd, tok,
          sum(nd) OVER (ORDER BY fk DESC ROWS UNBOUNDED PRECEDING) AS cum,
          sum(nd) OVER () AS n
        FROM hist),
      cuts AS (SELECT
          max(CASE WHEN cum * 4 >= n THEN fk END) AS c1,
          max(CASE WHEN cum * 2 >= n THEN fk END) AS c2,
          max(CASE WHEN cum * 4 >= n * 3 THEN fk END) AS c3
        FROM cum)
      SELECT CASE WHEN fk >= c1 THEN 0 WHEN fk >= c2 THEN 1
          WHEN fk >= c3 THEN 2 ELSE 3 END AS tier,
        cast(sum(nd) as bigint) AS n_docs,
        cast(sum(tok) as bigint) AS tok_mass,
        min(fk) AS min_fk, max(fk) AS max_fk,
        ${sqlSplitDbl("sum(cast(fk * nd as decimal(18,4)))")} / sum(nd)
          AS mean_fk_x1000
      FROM hist, cuts GROUP BY 1 ORDER BY 1"""))

  /** q263 — Zipf rank-frequency fit per source: the OLS slope (and
    * r²) of log-frequency on log-rank over each source's top-100
    * terms. A healthy natural-language feed sits near the classic
    * slope −1 (Zipf's law); a scraped/boilerplate or machine-generated
    * feed reads visibly flatter or steeper, and a slope that MOVES
    * between crawls is the cheap first alarm that a source changed
    * under you — the corpus-statistics companion to q262's novelty
    * curve (Heaps-side) and q45's integer-only term ranking.
    *
    * Bit-equality discipline (the q150 convention): the only libm
    * calls are per-row ln() of small integers, immediately quantized
    * to ×1e6 longs; every cross-row OLS sum is then EXACT integer
    * arithmetic (order-free), and the slope/r² divisions convert the
    * same integers to doubles once on both engines. Long-range check
    * at 100 TB scale: ly ≤ ln(1e7)·1e6 ≈ 1.6e7, so Σly² over 100
    * terms ×n stays < 2.7e18 — inside int64.
    *
    * Scale shape: one map-combinable (source, term) count, then the
    * rank filter compiles to the TopKPerGroup bounded heap (the q45
    * idiom — no full per-source sort), then a 100-row-per-source
    * integer aggregate. */
  val zipfSlope: Q = Q(
    "q263_zipf_slope",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .select(col("source"), explode(toks(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(desc("cnt"), asc("term"))
      val q = tf.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 100)
        .select(col("source"),
          floor(log(col("rn").cast("double")) * 1e6).as("lx"),
          floor(log(col("cnt").cast("double")) * 1e6).as("ly"))
      val num = col("n_terms") * col("sxy") - col("sx") * col("sy")
      val denX = col("n_terms") * col("sxx") - col("sx") * col("sx")
      val denY = col("n_terms") * col("syy") - col("sy") * col("sy")
      q.groupBy("source").agg(
          count(lit(1)).as("n_terms"),
          sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
          sum(col("lx") * col("ly")).as("sxy"),
          sum(col("lx") * col("lx")).as("sxx"),
          sum(col("ly") * col("ly")).as("syy"))
        .select(col("source"), col("n_terms"),
          (num.cast("double") / denX.cast("double")).as("zipf_slope"),
          ((num.cast("double") * num.cast("double")) /
            (denX.cast("double") * denY.cast("double"))).as("r2"))
        .orderBy("source")
    },
    Some(s"""WITH tf AS (
        SELECT source, unnest(${sqlToks("text")}) AS term FROM documents),
      cnt AS (SELECT source, term, count(*) AS cnt FROM tf GROUP BY 1, 2),
      ranked AS (SELECT source, cnt,
          row_number() OVER (PARTITION BY source
            ORDER BY cnt DESC, term) AS rn
        FROM cnt),
      q AS (SELECT source,
          cast(floor(ln(cast(rn as double)) * 1000000.0) as bigint) AS lx,
          cast(floor(ln(cast(cnt as double)) * 1000000.0) as bigint) AS ly
        FROM ranked WHERE rn <= 100),
      ols AS (SELECT source, cast(count(*) as bigint) AS n_terms,
          cast(sum(lx) as bigint) AS sx, cast(sum(ly) as bigint) AS sy,
          cast(sum(lx * ly) as bigint) AS sxy,
          cast(sum(lx * lx) as bigint) AS sxx,
          cast(sum(ly * ly) as bigint) AS syy
        FROM q GROUP BY source)
      SELECT source, n_terms,
        cast(n_terms * sxy - sx * sy as double) /
          cast(n_terms * sxx - sx * sx as double) AS zipf_slope,
        (cast(n_terms * sxy - sx * sy as double) *
          cast(n_terms * sxy - sx * sy as double)) /
        (cast(n_terms * sxx - sx * sx as double) *
          cast(n_terms * syy - sy * sy as double)) AS r2
      FROM ols ORDER BY source"""))

  val all: Seq[Q] = Seq(tokenCount, qualityScore, langGuess, langConfusion,
    codeSwitchAudit,
    fingerprint, topTerms, pivotEvents, rareTerms, regexTokens,
    repetitionFilter, madOutliers, blocklistFilter, phraseBlocklist,
    phraseBlocklistML,
    ngramNovelty, bm25TopK,
    bm25TextbookTopK, adaptiveQualityFilter, markupStrip, gopherRules,
    gopherRepetition, vocabCoverage, bm25MrrEval, rm3Expansion,
    sourceDiversity, sourceGini,
    sourceDrift, exactQuantiles, qualityDupMatrix, lengthDrift,
    readability, snippetExtraction, curriculumTiers, zipfSlope)
}

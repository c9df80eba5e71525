package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The dedup family over a SKEWED-vocabulary, NEWLINE-bearing corpus —
  * the two corpus shapes the driver testdata lacks (its vocabulary is
  * flat and it encodes no newlines, so the q149 floor and the
  * capped+hot decomposition were only ever measured on the
  * hot-slice-unfriendly flat shape, and q152 registry-splits on a
  * stopword token). This fixture pins both: tokens are drawn from a
  * log-uniform (Zipf-ish) rank distribution over a 2,000-word
  * vocabulary, docs are multi-paragraph with real `\n\n` breaks, and a
  * boilerplate paragraph pool repeats across ~30% of paragraph slots —
  * the power-law + boilerplate shape production corpora actually have.
  * Everything is seed-fixed (Random(42)) so the assertions are exact.
  */
class DedupFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- the fixture ----------------------------------------------------
  private val V = 2000

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val rnd = new java.util.Random(42)
    def tok(): String =
      if (rnd.nextDouble() < 0.10) "the" // guarantees q152/q158's " the " splits fire
      else {
        val u = rnd.nextDouble()
        val r = math.min(V - 1, math.floor(math.exp(u * math.log(V))).toInt)
        s"w$r"
      }
    def para(n: Int): String = (0 until n).map(_ => tok()).mkString(" ")
    val boiler = (0 until 5).map(_ => para(12))
    val organic = (0 until 400).map { i =>
      val nP = 2 + rnd.nextInt(4)
      val paras = (0 until nP).map { _ =>
        if (rnd.nextDouble() < 0.3) boiler(rnd.nextInt(boiler.size))
        else para(8 + rnd.nextInt(10))
      }
      (i.toLong, paras.mkString("\n\n"))
    }
    // planted shapes (ids chosen so % 10 routes them as commented):
    val base = (0 until 30).map(i => s"uniq$i").mkString(" ")
    val short = (0 until 15).map(i => s"cont$i").mkString(" ")
    val planted = Seq(
      9000L -> base,                                  // corpus …
      9001L -> (base + " extraxyz"),                  // … near-dup of 9000
      9002L -> short,                                 // corpus …
      9003L -> (short + " " + para(40)),              // … contains 9002 wholly
      9004L -> "vtw alpha\u000Bbeta gamma delta",     // U+000B-separated twin …
      9005L -> "vtw alpha beta gamma delta",          // … of the space form
      9008L -> organic.head._2)                       // batch clone of doc 0 (q158)
    val docs = (organic ++ planted).toDF("doc_id", "text")
    TestSpark.makeSfDir("documents" -> docs)
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, fixtureDir)

  /** FLAT-repetition twin of the fixture: same doc count and length
    * profile and the same total repetition mass, but every paragraph is
    * drawn UNIFORMLY from one shared pool — so shingle df is uniform at
    * ~3 (UNDER DfCap: all of it generates candidate pairs) instead of
    * the fixture's split into unique organic text (df 1) plus a hot
    * boilerplate head (df >> cap, EXCLUDED from pair generation). This
    * is the df shape of the driver's synthetic testdata, whose
    * committed q149 floor the bench compares against; the twin exists
    * to MEASURE the bench_floor.json claim that flat repetition is
    * q121/q149's worst case (the capped+hot decomposition's savings
    * grow with skew). */
  private lazy val flatDir: String = {
    import spark.implicits._
    val rnd = new java.util.Random(43)
    def para(n: Int): String =
      (0 until n).map(_ => s"w${rnd.nextInt(V)}").mkString(" ")
    val pool = (0 until 500).map(_ => para(8 + rnd.nextInt(10)))
    val docs = (0 until 400).map { i =>
      val nP = 2 + rnd.nextInt(4)
      (i.toLong,
        (0 until nP).map(_ => pool(rnd.nextInt(pool.size))).mkString("\n\n"))
    }
    TestSpark.makeSfDir("documents" -> docs.toDF("doc_id", "text"))
  }

  test("power-law fixture: the hot slice is a small, non-empty posting fraction") {
    // the capped+hot decomposition's economics: n_hot joins back through
    // ONLY postings with df > DfCap. On a flat vocabulary that slice was
    // ~5% (12k of 260k); on this power-law + boilerplate corpus it must
    // be present (else the hot path is untested) yet minor (else the
    // decomposition buys nothing). Pin the band.
    graft.functions.TextFunctions.register(spark)
    val sets = Tables.documents(spark, fixtureDir)
      .select(col("doc_id"), Dsl.toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr("distinct_shingles(t, 3)")).as("sg"))
      .select(col("doc_id"), Dsl.md5h61(col("sg")).as("h"))
    val withDf = sets.groupBy("h").agg(count(lit(1)).as("df"))
    val total = sets.count().toDouble
    val hot = sets.join(withDf.filter(col("df") > operators.Dedup.DfCap), "h").count()
    val frac = hot / total
    assert(frac > 0.01, s"hot slice $frac — fixture failed to create boilerplate")
    assert(frac < 0.40, s"hot slice $frac — decomposition would stop paying")
  }

  test("q121 finds the planted near-dup on the skewed corpus and stays a subset of q76") {
    val q121 = run("q121_ngram_jaccard_dfcap").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(q121.contains((9000L, 9001L)), "planted near-dup pair missed")
    assert(q121((9000L, 9001L))._2 >= 0.8, "planted pair scored implausibly low")
    val q76 = run("q76_ngram_jaccard_pairs").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // every capped pair must carry the EXACT full-set intersection the
    // uncapped operator computes (the decomposition's core claim)
    q121.foreach { case (k, v) =>
      assert(q76.contains(k), s"pair $k in q121 but not q76")
      assert(q76(k) == v, s"pair $k: capped $v vs exact ${q76(k)}")
    }
  }

  test("q165 prefix-filter join is EXACT on the skewed corpus: equals brute force, catches the planted pair") {
    val got = run("q165_prefix_jaccard_join").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.contains((9000L, 9001L)), "planted near-dup pair missed")
    // brute force over the same hashed-shingle universe: the prefix
    // filter's claim is ZERO recall loss (unlike q121's df-cap), so
    // the result sets must be IDENTICAL, pair keys and exact n_shared
    graft.functions.TextFunctions.register(spark)
    val ex = Tables.documents(spark, fixtureDir)
      .select(col("doc_id"), Dsl.toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr("distinct_shingles(t, 3)")).as("sg"))
      .select(col("doc_id"), Dsl.md5h61(col("sg")).as("h"))
    val sz = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val brute = ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n"))
      .join(sz.as("sa"), col("da") === col("sa.doc_id"))
      .join(sz.as("sb"), col("db") === col("sb.doc_id"))
      .filter(col("n") * 10 >= (col("sa.sz") + col("sb.sz") - col("n")) * 7)
      .select("da", "db", "n").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet == brute.keySet,
      s"prefix filtering must lose nothing vs brute force: " +
        s"missing ${brute.keySet -- got.keySet}, extra ${got.keySet -- brute.keySet}")
    got.foreach { case (k, (n, _)) =>
      assert(brute(k) == n, s"pair $k: prefix-join n_shared $n vs brute ${brute(k)}")
    }
  }

  test("q168 catches the planted cross-split near-dup as fuzzy contamination") {
    // planted 9000 (eval: % 10 == 0) vs 9001 (train) are near-identical
    // — the reformatted-eval-question shape fuzzy decontamination exists
    // to catch; bands collide on every band for J ≈ 0.97
    val got = run("q168_fuzzy_contamination").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got.contains((9001L, 9000L)), "planted contaminated pair missed")
    assert(got((9001L, 9000L)) >= 0.9, "planted pair scored implausibly low")
    // bipartite: train side never % 10 == 0, eval side always is
    got.keys.foreach { case (t, e) =>
      assert(t % 10 != 0 && e % 10 == 0, s"pair ($t, $e) breaks the split")
    }
  }

  test("q149 flags the planted quote (containment) that jaccard misses") {
    val t0 = System.nanoTime()
    val q149 = run("q149_containment_pairs").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    info(f"q149 wall on the skewed fixture (405 docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(q149.contains((9002L, 9003L)),
      "short doc wholly quoted in a larger one must score containment >= 0.8")
    assert(q149((9002L, 9003L)) >= 0.9)
    val q121 = run("q121_ngram_jaccard_dfcap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!q121.contains((9002L, 9003L)),
      "the quote pair's jaccard should stay below the q121 threshold — " +
        "that asymmetry is q149's reason to exist")
  }

  test("flat-vs-skewed cost: the flat twin does more intersection work per doc (the committed floors' worst case)") {
    // Structural comparison first (deterministic): the capped join's
    // posting-pair work. On the flat twin nearly every shingle is rare
    // (df <= cap), so candidate generation carries the full corpus; on
    // the power-law fixture the boilerplate mass sits in the hot slice
    // and is EXCLUDED from pair generation. Wall times are info-only
    // (recorded in bench_floor.json's comment), the structure is the
    // assertion.
    graft.functions.TextFunctions.register(spark)
    def cappedPairWork(dir: String): Long = {
      val sets = Tables.documents(spark, dir)
        .select(col("doc_id"), Dsl.toks(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr("distinct_shingles(t, 3)")).as("sg"))
        .select(col("doc_id"), Dsl.md5h61(col("sg")).as("h"))
      val df = sets.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= operators.Dedup.DfCap)
      // sum over capped postings of df*(df-1)/2 = candidate pair slots
      df.select(sum(col("df") * (col("df") - 1) / 2).cast("long")).head().getLong(0)
    }
    def wall(dir: String, name: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    val (workFlat, workSkew) = (cappedPairWork(flatDir), cappedPairWork(fixtureDir))
    val docsFlat = Tables.documents(spark, flatDir).count().toDouble
    val docsSkew = Tables.documents(spark, fixtureDir).count().toDouble
    info(f"capped pair slots: flat $workFlat (${workFlat / docsFlat}%.1f/doc), " +
      f"skewed $workSkew (${workSkew / docsSkew}%.1f/doc)")
    for (q <- Seq("q121_ngram_jaccard_dfcap", "q149_containment_pairs"))
      info(f"$q wall: flat ${wall(flatDir, q)}%.2f s, skewed ${wall(fixtureDir, q)}%.2f s")
    assert(workFlat / docsFlat > workSkew / docsSkew,
      "flat twin should carry MORE capped pair work per doc — " +
        "else the committed flat floors are not the worst case")
  }

  test("U+000B: tokenizer and fingerprint treat a vertical tab as whitespace on both engines") {
    // Java \s includes U+000B, RE2's \s does not — Dsl.WsChars spells the
    // class out so both engines read identical source (the q155 fix,
    // centralized round 11). The DuckDB half of the law was verified
    // directly against duckdb 1.0: string_split_regex(chr(11)-joined
    // text, '[ \t\n\f\r\x0B]+') splits where '\s+' does NOT. Here we pin
    // the Spark half plus the oracled q34 grouping on the fixture.
    import spark.implicits._
    val t = Seq("a\u000Bb c\td").toDF("s")
      .select(Dsl.toks(col("s")).as("t")).head().getSeq[String](0)
    assert(t == Seq("a", "b", "c", "d"), s"toks split $t")
    val w = Seq("Hello,\u000BWorld! 42").toDF("s")
      .select(graft.apps.TitleMatch.cleanWords(col("s")).as("w"))
      .head().getSeq[String](0)
    assert(w.sorted == Seq("42", "hello", "world"), s"cleanWords gave $w")
    // q34 over the fixture: the \x0B doc (9004) and its space twin (9005)
    // must collapse into one whitespace-normalized fingerprint class
    val q34 = run("q34_fingerprint").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(q34(9004L) == 2L,
      s"vertical-tab doc not fingerprint-equal to its space twin: ${q34(9004L)}")
  }

  test("newline paragraph dedup keeps each boilerplate paragraph exactly once") {
    val out = operators.Dedup.paragraphDedup("\n\n")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    val keptParas = out.flatMap(_._2.split("\n\n", -1)).filter(_.nonEmpty)
    // reconstruct the boilerplate pool from the ORIGINAL corpus: any
    // paragraph text appearing in >= 5 docs is boilerplate
    val orig = Tables.documents(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val paraCounts = orig.flatMap(_._2.split("\n\n", -1))
      .groupBy(identity).map { case (p, o) => (p, o.length) }
    val boiler = paraCounts.filter(_._2 >= 5).keys.toSeq
    assert(boiler.nonEmpty, "fixture lost its boilerplate")
    boiler.foreach { b =>
      val n = keptParas.count(_ == b)
      assert(n == 1, s"boilerplate paragraph kept $n times (want exactly 1)")
    }
    // reassembly preserved doc count and order
    assert(out.length == orig.length)
  }

  test("q170 within-doc dedup: in-doc repeats collapse, cross-doc copies survive in every doc") {
    val out = operators.Dedup.withinDocDedupDf("\n\n")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    val orig = Tables.documents(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.size == orig.length, "reassembly must emit every doc")
    var sawInDocRepeat = false
    orig.foreach { case (id, text) =>
      val paras = text.split("\n\n", -1)
      if (paras.distinct.length < paras.length) sawInDocRepeat = true
      // cleaned = first occurrences in original order — exactly
      val expect = {
        val seen = scala.collection.mutable.LinkedHashSet[String]()
        paras.foreach(seen += _); seen.mkString("\n\n")
      }
      assert(out(id) == expect, s"doc $id: not keep-first-in-order")
    }
    assert(sawInDocRepeat,
      "fixture degenerate: no doc repeats a paragraph internally")
    // cross-doc scope check: a boilerplate paragraph present in >= 2
    // docs is kept once in EACH of them (q152 would keep one globally)
    val keptBy = out.toSeq.flatMap { case (id, t) =>
      t.split("\n\n", -1).filter(_.nonEmpty).distinct.map(p => (p, id)) }
      .groupBy(_._1).view.mapValues(_.size)
    assert(keptBy.values.exists(_ >= 5),
      "boilerplate must survive per-doc under within-doc scope")
  }

  test("q172 soft-dedup weights: cluster mass normalizes to 1, singletons keep weight 1") {
    val rows = run("q172_soft_dedup_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val nDocs = Tables.documents(spark, fixtureDir).count()
    assert(rows.length == nDocs, "every doc gets a weight row")
    rows.filter(_._2 == 1L).foreach { case (id, _, w) =>
      assert(w == 1.0, s"singleton $id weight $w != 1.0") }
    // the planted near-dup pair 9000/9001 forms a cluster: both carry
    // weight <= 1/2 and identical cluster sizes
    val m = rows.map(r => r._1 -> r).toMap
    assert(m(9000L)._2 >= 2L && m(9000L)._2 == m(9001L)._2,
      "planted near-dup pair not clustered together")
    assert(m(9000L)._3 <= 0.5 + 1e-12)
    // cluster mass: group rows by (size, weight) — every member of a
    // cluster carries the same weight, so Σ over each cluster = size*w ≈ 1
    rows.filter(_._2 > 1L).groupBy(_._1).foreach { case (_, rs) =>
      rs.foreach { case (_, sz, w) =>
        assert(math.abs(sz * w - 1.0) < 1e-9,
          s"cluster of $sz: member weight $w, mass ${sz * w}") } }
  }

  test("q180 measures band recall on the skewed corpus: truth non-empty, caught <= truth, planted pair counted") {
    val r = run("q180_lsh_recall_eval").collect().head
    val (nT, nC, nM, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nT >= 1, "the planted 9000/9001 near-dup must be in the truth set")
    assert(nC <= nT && nM == nT - nC)
    assert(rec >= 0.0 && rec <= 1.0 && rec == nC.toDouble / nT)
    // the documented LSH miss bound at J>=0.8 is (1-J^2)^8 ~ 2.8e-4 per
    // pair — on this corpus size the expected misses are << 1
    assert(rec >= 0.9, s"band recall $rec collapsed — blocking regression")
  }

  test("q152/q158 registry instances run green on the skewed corpus; the planted batch clone is fully excised") {
    val q152 = run("q152_paragraph_dedup").collect()
    assert(q152.nonEmpty)
    val q158 = run("q158_incremental_paragraph_dedup").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    // doc 9008 (batch side: 9008 % 10 >= 8) is a verbatim clone of
    // corpus doc 0 — every one of its paragraphs already exists in the
    // corpus, so the incremental admit must keep NONE of them
    val (nParas, nKept) = q158(9008L)
    assert(nParas >= 1)
    assert(nKept == 0, s"clone batch doc kept $nKept of $nParas paragraphs")
    // and a typical batch doc keeps at least something
    assert(q158.values.exists(_._2 > 0), "every batch doc lost everything — fixture degenerate")
  }

  test("q261: a planted clique and a planted chain get exact quality rows (overreach is measurable)") {
    import spark.implicits._
    // A–B and B–C are verified near-dups; A–C is NOT (j = 66/90 ≈ 0.73
    // < 0.8) — yet transitive clustering merges all three. q261 is the
    // audit that makes that overreach a number: 2 edges over a
    // 3-member cluster = density 666666 ppm, clique bit 0.
    val base = (0 until 80).map(i => s"qq$i").mkString(" ")
    def edit(s: String, from: Int, until: Int, tag: String) = {
      val t = s.split(" ")
      (from until until).foreach(i => t(i) = s"$tag$i")
      t.mkString(" ")
    }
    val b = edit(base, 0, 5, "xx")  // vs A: 5 changed shingles, j = 73/83
    val c = edit(b, 40, 45, "yy")   // vs B: 7 changed, j = 71/85; vs A: 66/90
    val clone = (0 until 40).map(i => s"cl$i").mkString(" ")
    val docs = Seq(
      1L -> base, 2L -> b, 3L -> c,              // the chain
      10L -> clone, 11L -> clone, 12L -> clone,  // the clique (j = 1.0 × 3)
      20L -> (0 until 40).map(i => s"zz$i").mkString(" ")) // singleton
      .toDF("doc_id", "text")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q261_cluster_quality")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    assert(rows.keySet == Set(1L, 10L), s"clusters wrong: ${rows.keySet}")
    // the clique: 3 members, all 3 edges present, exact clique density
    assert(rows(10L) == ((3L, 3L, 1000000L, 1L, 1.0)),
      s"clique row wrong: ${rows(10L)}")
    // the chain: 3 members via 2 edges — 2/3 of the clique bound
    val (nm, ne, dp, iq, mj) = rows(1L)
    assert((nm, ne, dp, iq) == ((3L, 2L, 666666L, 0L)),
      s"chain row wrong: ${rows(1L)}")
    assert(mj == 71.0 / 85.0, s"chain min jaccard wrong: $mj")
  }
}

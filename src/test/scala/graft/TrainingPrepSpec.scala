package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Training-prep operator semantics: chunk coverage/overlap, scrub
  * completeness, contamination symmetry, salient-term ranking, and
  * salted-join equivalence with the plain join. */
class TrainingPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("text chunks tile every document with stride-24 windows of ≤32 tokens") {
    val chunks = SparkEntry.queries("q82_text_chunks")(spark, sf).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    val docToks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(Dsl.toks(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byDoc.keySet == docToks.keySet, "every doc must produce chunks")
    byDoc.foreach { case (doc, rows) =>
      val idxs = rows.map(_.getInt(1)).sorted.toSeq
      assert(idxs == (0 until rows.length), s"doc $doc chunk_idx must be contiguous from 0")
      val sizes = rows.sortBy(_.getInt(1)).map(_.getInt(2)).toSeq
      // stride (24) < window (32): a non-final window starts ≥24 tokens
      // before the end, so it always holds 25..32 tokens
      assert(sizes.init.forall(sz => sz >= 25 && sz <= 32),
        s"doc $doc non-final chunk sizes out of range: $sizes")
      assert(sizes.last <= 32 && sizes.last >= 1)
      // starts are 1, 25, 49, ... ≤ n → floor((n-1)/24) + 1 windows
      val n = docToks(doc)
      val expected = (n - 1) / 24 + 1
      assert(rows.length == expected, s"doc $doc: $n tokens -> ${rows.length} chunks, want $expected")
    }
  }

  test("pii scrub redacts every injected email and phone") {
    val rows = SparkEntry.queries("q83_pii_scrub")(spark, sf).collect()
    assert(rows.nonEmpty)
    // each doc gets exactly one synthetic email; the injected phone tail
    // is doc_id % 10000, which only matches [0-9]{3}-[0-9]{3,4} when it
    // has ≥3 digits
    assert(rows.forall(_.getInt(1) == 1), "one email per doc")
    assert(rows.forall { r =>
      val want = if (r.getLong(0) % 10000 >= 100) 1 else 0
      r.getInt(2) == want
    }, "phone match iff ≥3-digit tail")
    // the scrub hash must differ from the hash of the unscrubbed text
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), Dsl.md5h61(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => raw(r.getLong(0)) != r.getLong(3)))
  }

  test("contamination reports only non-eval docs and is shingle-join-consistent") {
    val rows = SparkEntry.queries("q84_contamination")(spark, sf).collect()
    assert(rows.nonEmpty, "shared vocab corpus must show 3-gram overlap")
    assert(rows.forall(_.getLong(0) % 10 != 0), "eval docs must not appear")
    // n_shared is bounded by the doc's own distinct shingle count
    val own = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(array_distinct(Dsl.shingles3(Dsl.toks(col("text"))))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => r.getLong(1) <= own(r.getLong(0))))
  }

  test("salient terms ranks 3 per doc by score desc with term tiebreak") {
    val rows = SparkEntry.queries("q85_salient_terms")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), s"doc $doc rn gap")
      assert(sorted.length <= 3)
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc scores must be non-increasing")
    }
  }

  test("bigram lift emits 20 positive-lift pairs above the count floor") {
    val rows = SparkEntry.queries("q86_bigram_lift")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(1) >= 5), "count floor")
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  test("domain mix shares sum to 100%") {
    val rows = SparkEntry.queries("q87_domain_mix")(spark, sf).collect()
    val pct = rows.map(_.getDouble(4)).sum
    assert(math.abs(pct - 100.0) < 1e-9, s"got $pct")
    val nDocs = rows.map(_.getLong(2)).sum
    assert(nDocs == Tables.documents(spark, sf).count())
  }

  test("exact-moments UDAF is partitioning-invariant and matches var_pop") {
    val q = SparkEntry.queries("q90_variance_udaf")
    val base = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // repartitioned input must produce bit-identical variance (exact
    // decimal accumulation — merge order can't matter)
    val mom = org.apache.spark.sql.functions.udaf(
      functions.ExactMoments, org.apache.spark.sql.Encoders.DECIMAL)
    val repart = Tables.lineitem(spark, sf).repartition(17)
      .select(col("l_returnflag"), col("l_quantity").cast(Dsl.Dec).as("q"))
      .groupBy("l_returnflag").agg(mom(col("q")).as("m"))
      .select(col("l_returnflag"), col("m._1").as("n"),
        ((col("m._3") - (col("m._2") * col("m._2")) / col("m._1")) /
          col("m._1")).as("var_pop"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(base.toSeq == repart.toSeq)
    // and the value is genuinely var_pop (vs Spark's built-in, to 1e-9)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(var_pop(col("l_quantity")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    base.foreach { case (k, _, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"$k: $v vs ${builtin(k)}")
    }
  }

  test("contamination eval-side join is broadcast in the physical plan") {
    val plan = SparkEntry.queries("q84_contamination")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"want broadcast join:\n$plan")
  }

  test("approx percentiles stay within 1% of exact") {
    val approx = SparkEntry.queries("q95_approx_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q67_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for (k <- exact.keySet; (a, e) <- approx(k).zip(exact(k)))
      assert(math.abs(a - e) / e < 0.01, s"$k: approx $a vs exact $e")
  }

  test("bloom-pruned contamination equals the exact q84 result") {
    val exact = SparkEntry.queries("q84_contamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = SparkEntry.queries("q96_bloom_contamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom == exact)
  }

  test("count-min sketch never underestimates and stays within eps*total") {
    val rows = operators.TrainingPrep.heavyHittersEst(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    val total = Tables.documents(spark, sf)
      .select(explode(Dsl.toks(lower(col("text")))).as("t")).count()
    rows.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term: CMS must never underestimate")
      assert(est - exact <= (0.001 * total).toLong + 1,
        s"$term: est $est vs exact $exact exceeds eps*N")
    }
  }

  test("weighted sample keeps every max-weight doc and is reproducible") {
    val q = SparkEntry.queries("q104_weighted_sample")
    val first = q(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(first == q(spark, sf).collect().map(_.getLong(0)).toSeq)
    assert(first.nonEmpty)
    // every doc with n_chars >= 4000 has P(keep)=1
    val heavy = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 4000).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(heavy.subsetOf(first.toSet))
    // realized sample mass tracks expected mass (sum of min(len,4000)/4000)
    val expected = Tables.documents(spark, sf)
      .select(least(col("n_chars"), lit(4000)).cast("double") / 4000)
      .collect().map(_.getDouble(0)).sum
    assert(math.abs(first.size - expected) < math.max(20.0, expected),
      s"sample ${first.size} vs expected $expected")
  }

  test("salted join aggregate equals the plain join aggregate") {
    val salted = SparkEntry.queries("q89_salted_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val li = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf)
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), Dsl.dsum(col("l_quantity")).as("qty"))
      .orderBy("p_brand").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("sequence packing covers every doc once, conserves tokens, and flags straddles exactly") {
    val rows = SparkEntry.queries("q115_sequence_packing")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))) // doc, shard, seq, offset, n_tokens, straddles
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._1).distinct.length.toLong == nDocs, "each doc packed once")
    val Budget = 64
    rows.foreach { case (doc, shard, seq, off, nt, straddles) =>
      assert(off >= 0 && off < Budget, s"doc $doc offset $off")
      assert(seq >> 32 == shard, s"doc $doc seq_id must encode its shard")
      // straddle ⇔ the doc's last token lands past its start boundary
      assert((straddles == 1) == (off + nt - 1 >= Budget),
        s"doc $doc: off=$off nt=$nt straddles=$straddles")
    }
    // within a shard, docs are dense: sorted by seq/offset, each doc
    // starts exactly where the previous one ended (concat-and-chunk
    // leaves no gaps), so per-shard token sums reconstruct the stream
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._4, r._1))
      var cum = 0L
      ordered.foreach { case (doc, _, seq, off, nt, _) =>
        assert((seq & 0xffffffffL) == cum / Budget && off == cum % Budget,
          s"shard $shard doc $doc: expected cum $cum, got seq=$seq off=$off")
        cum += nt
      }
    }
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    import spark.implicits._
    // k=3 (word shingles), w=4: any shared run of 6 tokens must yield a
    // common selected fingerprint. Two docs embed the same 8-token run
    // inside different surroundings; a third shares nothing.
    val shared = "zig quux blarp wibble fnord glork snark plugh"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six"),
      (3L, "entirely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = operators.TrainingPrep.winnowSelected(docs)
      .select(col("doc_id"), col("wmin")).distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "shared 8-token run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint docs must not collide")
    // every fingerprint is one of the doc's own 3-gram hashes
    val grams1 = docs.filter($"doc_id" === 1L)
      .select(explode(Dsl.shingles3(Dsl.toks($"text"))).as("g"))
      .select(Dsl.md5h61($"g")).collect().map(_.getLong(0)).toSet
    assert(fps(1L).subsetOf(grams1))
  }

  test("winnowing summary counts match the selected-fingerprint frame") {
    val sel = operators.TrainingPrep.winnowSelected(Tables.documents(spark, sf))
      .groupBy("doc_id")
      .agg(countDistinct(col("wmin")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = SparkEntry.queries("q116_winnow_fingerprints")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q == sel)
    // fingerprint density: winnowing keeps ~2/(w+1) of grams; sanity-
    // bound it loosely — at least one fp per doc with grams, never more
    // fps than window starts
    assert(q.values.forall(_ >= 1))
  }

  test("bpe learner reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // classic hug/pug/bug corpus. Pre-tokenizer pieces of the single
    // doc: "hug"×1, " hug"×4, " pug"×3, " bug"×2. Hand-run BPE:
    //  1 (u,g)  10 = 1+4+3+2      5 (" p",ug) 3
    //  2 (h,ug)  5 = 1+4          6 (" ",b)   2   (tie " "<"b")
    //  3 (" ",hug) 4              7 (" b",ug) 2
    //  4 (" ",p) 3  (tie with (p,ug): " " < "p")
    // then every word is a single symbol -> loop stops early at 7.
    val docs = Seq(
      (1L, "hug hug hug hug hug pug pug pug bug bug", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q147_bpe_merges")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = Seq(
      (1L, "u", "g", 10L), (2L, "h", "ug", 5L), (3L, " ", "hug", 4L),
      (4L, " ", "p", 3L), (5L, " p", "ug", 3L), (6L, " ", "b", 2L),
      (7L, " b", "ug", 2L))
    assert(rows == expected, s"merge sequence diverges: $rows")
  }

  test("bpe pair counts include overlaps; merge application is greedy non-overlap") {
    import spark.implicits._
    // "aaaa": round 1 counts (a,a) at the 3 adjacent positions
    // (overlapping, like the reference get_stats); applying the merge is
    // greedy left-to-right so "aaaa" -> [aa, aa], giving round 2 the
    // pair (aa,aa)×1 — this also exercises consecutive replace matches
    // sharing a separator boundary.
    val docs = Seq((1L, "aaaa", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q147_bpe_merges")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)),
      s"overlap counting / greedy merge wrong: $rows")
  }

  test("bpe encode applies the pinned merges in rank order (hand-computed)") {
    import spark.implicits._
    // "In the other hand" -> pieces [in, " the", " other", " hand"]:
    //   in      -> r3  (i,n)                       -> 1 token
    //   " the"  -> r1 (t,h), r2 (th,e), r15 (" ",the) -> 1
    //   " other"-> r1, r2 leave [" ", o, the, r]   -> 4
    //   " hand" -> r5 (a,n), r6 (an,d): [" ",h,and] -> 3
    val docs = Seq((1L, "In the other hand", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val r = SparkEntry.queries("q148_bpe_encode")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)) ==
      ((1L, 4, 9, 2.25)), s"encode wrong: $r")
  }

  test("q219 tokenizer economics aggregates per language with ratio-of-sums, never mean-of-ratios") {
    import spark.implicits._
    // en doc: q148's hand-computed fixture (4 pieces, 9 tokens, piece
    // chars 2+4+6+5 = 17) plus a 1-piece doc ("in" -> 1 token, 2 chars);
    // de doc: "in in" -> pieces [in, " in"] -> 1 + 2 tokens, 5 chars
    val docs = Seq(
      (1L, "In the other hand", "en", "s", 17L),
      (2L, "in", "en", "s", 2L),
      (3L, "in in", "de", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q219_tokenizer_economics")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(rows("en") == ((2L, 5L, 10L, 19L, 10.0 / 5, 19.0 / 10)),
      s"en row wrong: ${rows("en")}")
    assert(rows("de") == ((1L, 2L, 3L, 5L, 3.0 / 2, 5.0 / 3)),
      s"de row wrong: ${rows("de")}")
  }

  test("bpe input is separator-safe: U+0001 in text is stripped, fertility of a zero-piece doc is NULL") {
    import spark.implicits._
    // doc 1 carries the BPE separator byte inside a word — it must
    // tokenize exactly like its clean twin doc 2 (phantom separator
    // runs would corrupt the wrapped symbol string); doc 3 yields zero
    // pre-tokenizer pieces (whitespace-only), so fertility is NULL by
    // design, not 0/0 accident.
    val docs = Seq(
      (1L, "in the other hand", "en", "s", 19L),
      (2L, "in the other hand", "en", "s", 17L),
      (3L, "   ", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q148_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    assert(rows(1L) == rows(2L),
      s"U+0001 changed the encoding: ${rows(1L)} vs ${rows(2L)}")
    assert(rows(3L) == ((0, 0, null)),
      s"zero-piece doc must be (0, 0, NULL): ${rows(3L)}")
  }

  test("bpe encode bounds hold corpus-wide: pieces <= tokens <= chars") {
    // every piece is at least one token (merges only ever shrink) and
    // no piece can exceed its character count in tokens
    val rows = SparkEntry.queries("q148_bpe_encode")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val chars = SparkEntry.queries("q30_token_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { case (id, nPieces, nBpe) =>
      assert(nBpe >= nPieces, s"doc $id: $nBpe tokens < $nPieces pieces")
      assert(nBpe <= chars(id), s"doc $id: $nBpe tokens > ${chars(id)} chars")
    }
    // and the merges actually fire on English text: strictly fewer
    // tokens than characters in aggregate
    assert(rows.map(_._3.toLong).sum < chars.values.map(_.toLong).sum)
  }

  test("bpe learner state and encoder replay agree on the corpus token count") {
    // the standard BPE property: ENCODING (replay the learned merges in
    // rank order over each word) reproduces exactly the segmentation
    // the LEARNER's iterative corpus rewrite ended in. Learn 16 merges
    // on sf0.001, then count tokens two independent ways — from the
    // learner's final word frame (freq-weighted symbol counts) and by
    // re-encoding every piece occurrence with the merge list — and
    // demand bit-equality. Guards the two code paths (iterative
    // replace-per-round vs nested replay) against each other.
    import org.apache.spark.sql.functions.{col, explode, expr, sum}
    val docs = Tables.documents(spark, sf)
    val (merges, fin) = operators.TrainingPrep.learnBpe(spark, docs, 16)
    try {
      assert(merges.size == 16, s"sf0.001 corpus must support 16 merges")
      val learnerTotal = fin
        .select(sum(col("freq") *
          operators.TrainingPrep.bpeSymCount(col("sym"))).as("n"))
        .collect()(0).getLong(0)
      val mergeList = merges.map(m => (m._2, m._3))
      val encodeTotal = docs
        .select(explode(expr(
          s"regexp_extract_all(lower(text), '${operators.TrainingPrep.BpePat}', 0)"))
          .as("w"))
        .select(operators.TrainingPrep.bpeSymCount(
          operators.TrainingPrep.bpeApply(col("w"), mergeList)).as("n"))
        .agg(sum(col("n")).as("n")).collect()(0).getLong(0)
      assert(learnerTotal == encodeTotal,
        s"learner final state counts $learnerTotal tokens, encoder replay $encodeTotal")
    } finally { fin.unpersist(); () }
  }

  test("driver-side histogram BPE is bit-equal to the distributed loop") {
    // the q147 fast path: same corpus pass, merge loop in driver memory
    // — every (rank, pair_a, pair_b, freq) row must match the
    // distributed learner's, and so must the final word state
    val docs = Tables.documents(spark, sf)
    val (distMerges, distFin) = operators.TrainingPrep.learnBpe(spark, docs, 50)
    val (histMerges, histFin) = operators.TrainingPrep
      .learnBpeHist(spark, docs, 50).getOrElse(fail("histogram path declined"))
    try {
      assert(histMerges == distMerges,
        s"merge tables diverge at rank ${
          histMerges.zip(distMerges).indexWhere(p => p._1 != p._2) + 1}")
      val d = distFin.orderBy("sym").collect().map(r => (r.getString(0), r.getLong(1)))
      val h = histFin.orderBy("sym").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(d.toSeq == h.toSeq, "final word states diverge")
    } finally { distFin.unpersist(); () }
  }

  test("learnBpeAuto's collect-budget gate: forced fallback is bit-equal") {
    // the driver-funnel guard: a 100 TB crawl's raw vocabulary can
    // exceed any driver budget, so the AUTO path must (a) fall back to
    // the distributed loop when the histogram row count exceeds the
    // budget, and (b) produce bit-identical merges either way. Force
    // the fallback with budget=1 (any real corpus has >1 distinct
    // pre-token) and compare against the default (histogram) path.
    val docs = Tables.documents(spark, sf)
    val (histM, histFin) =
      operators.TrainingPrep.learnBpeAuto(spark, docs, 50)
    val (distM, distFin) =
      operators.TrainingPrep.learnBpeAuto(spark, docs, 50, collectBudget = 1L)
    try {
      assert(histM == distM,
        s"gate paths diverge at rank ${
          histM.zip(distM).indexWhere(p => p._1 != p._2) + 1}")
      val h = histFin.orderBy("sym").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val d = distFin.orderBy("sym").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(h.toSeq == d.toSeq, "final word states diverge across the gate")
    } finally { distFin.unpersist(); () }
  }

  test("histogram BPE reaches production k: k=500 within 2x the k=50 wall time") {
    // the scale criterion for the fast path: merges are driver-memory
    // cheap, so pushing k 10x costs only the in-memory loop — the
    // corpus pass dominates both runs. (The distributed loop pays one
    // vocabulary-wide aggregate JOB per merge and could never satisfy
    // this.) Warm-up first so JIT/caching noise doesn't skew run 1.
    val docs = Tables.documents(spark, sf)
    operators.TrainingPrep.learnBpeHist(spark, docs, 5)
    def time(k: Int): (Long, Int) = {
      val t0 = System.nanoTime()
      val (m, _) = operators.TrainingPrep.learnBpeHist(spark, docs, k)
        .getOrElse(fail("histogram path declined"))
      ((System.nanoTime() - t0) / 1000000, m.size)
    }
    val (t50, n50) = time(50)
    val (t500, n500) = time(500)
    assert(n50 == 50)
    // sf0.001's vocab may exhaust pairable symbols before 500 merges;
    // the loop must then terminate cleanly, still having passed k=50
    assert(n500 > n50, s"k=500 learned only $n500 merges")
    // prefix stability: larger k only APPENDS merges
    val (m500, _) = operators.TrainingPrep.learnBpeHist(spark, docs, 500).get
    val (m50, _) = operators.TrainingPrep.learnBpeHist(spark, docs, 50).get
    assert(m500.take(50) == m50, "k=500 run diverges from k=50 prefix")
    // generous absolute slack: the property being pinned is "k=500 is
    // NOT 10x k=50" (a distributed per-merge loop would be ~40 s here);
    // a tight wall-clock ratio would fail on machine load, not on a
    // product regression
    assert(t500 < 2 * t50 + 5000,
      s"k=500 took ${t500}ms vs k=50 ${t50}ms — fast path not amortizing")
  }

  test("q173 manifest: batches tile the corpus and length-grouping beats arrival order on padding") {
    val B = 32
    val rows = SparkEntry.queries("q173_length_batch_manifest")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(5)))
    val docLens = {
      import org.apache.spark.sql.functions._
      graft.Tables.documents(spark, sf)
        .select(col("doc_id"), size(graft.Dsl.toks(col("text"))).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
    }
    val n = docLens.length
    // tiling: batch ids contiguous from 0, sizes B except a last remainder
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong))
    assert(rows.map(_._2).sum == n)
    rows.dropRight(1).foreach { case (b, nd, _, _, _) =>
      assert(nd == B, s"batch $b has $nd docs") }
    // per-batch stats equal a direct sorted-grouping recomputation
    val sorted = docLens.sortBy { case (id, len) => (len, id) }.map(_._2)
    sorted.grouped(B).zipWithIndex.foreach { case (g, b) =>
      val (_, nd, mx, st, waste) = rows(b)
      assert(nd == g.length && mx == g.max && st == g.map(_.toLong).sum)
      assert(waste == g.length.toLong * g.max - g.map(_.toLong).sum)
    }
    // the point of the operator: padded cost under length grouping is
    // strictly below arrival-order (doc_id-order) batching
    val arrival = docLens.sortBy(_._1).map(_._2)
    def paddedCost(xs: Seq[Int]) =
      xs.grouped(B).map(g => g.length.toLong * g.max).sum
    assert(paddedCost(sorted) < paddedCost(arrival),
      "sorted batching must reduce padded token cost on this corpus")
  }

  test("q174 CDC chunks resynchronize after a head insertion; fixed-stride q82 chunks do not") {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val body = (0 until 300).map(_ => s"tok${rnd.nextInt(500)}")
    val shifted = (0 until 7).map(i => s"junk$i") ++ body
    val dir = TestSpark.makeSfDir("documents" ->
      Seq((0L, body.mkString(" ")), (1L, shifted.mkString(" ")))
        .toDF("doc_id", "text"))
    def hashesByDoc(q: String, hashCol: String) =
      SparkEntry.queries(q)(spark, dir).collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.map(_.getAs[Long](hashCol)).toSet }
    val cdc = hashesByDoc("q174_cdc_chunks", "chunk_hash")
    val fixed = hashesByDoc("q82_text_chunks", "chunk_hash")
    val cdcShared = (cdc(0L) & cdc(1L)).size.toDouble / cdc(0L).size
    val fixedShared = (fixed(0L) & fixed(1L)).size.toDouble / fixed(0L).size
    // CDC boundaries depend only on local windows: everything after the
    // first boundary past the insertion is chunked identically
    assert(cdcShared >= 0.8,
      f"CDC recovered only $cdcShared%.2f of chunks after a 7-token insert")
    // the fixed-stride baseline shifts every window by 7 — (near-)zero reuse
    assert(cdcShared > fixedShared + 0.5,
      f"CDC ($cdcShared%.2f) must decisively beat fixed-stride ($fixedShared%.2f)")
  }

  test("q175 excises the planted eval passage from train docs and only there") {
    import spark.implicits._
    val evalPassage = (0 until 20).map(i => s"secret$i")   // >= K=13 tokens
    val trainPre = (0 until 30).map(i => s"pre$i")
    val trainPost = (0 until 30).map(i => s"post$i")
    val cleanDoc = (0 until 50).map(i => s"clean$i")
    val dir = TestSpark.makeSfDir("documents" -> Seq(
      // doc 10: the eval doc (10 % 10 == 0)
      (10L, evalPassage.mkString(" ")),
      // doc 11: train doc embedding the eval passage mid-document
      (11L, (trainPre ++ evalPassage ++ trainPost).mkString(" ")),
      // doc 12: uncontaminated train doc
      (12L, cleanDoc.mkString(" "))).toDF("doc_id", "text"))
    val out = SparkEntry.queries("q175_decontaminate_spans")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toMap
    assert(!out.contains(10L), "eval docs must never be emitted")
    val (nb, na, hits, cleaned) = out(11L)
    assert(hits >= 1, "planted contamination not detected")
    val keptToks = cleaned.split(" ").toSet
    assert(evalPassage.forall(t => !keptToks.contains(t)),
      "an eval token survived excision")
    // excision is span-scoped: tokens >= K away from the passage survive
    assert(keptToks.contains("pre0") && keptToks.contains("post29"),
      "excision overreached far beyond the contaminated span")
    assert(na < nb)
    // the clean doc passes through verbatim
    assert(out(12L) == ((50, 50, 0, cleanDoc.mkString(" "))))
  }

  test("q181 span corruption round-trips: sentinel-splicing target into corrupted rebuilds every doc") {
    val rows = SparkEntry.queries("q181_span_corruption")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    val orig = graft.Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == orig.size)
    var nTok = 0L; var nMask = 0L; var sawSpan = false
    rows.foreach { case (id, nt, nm, ns, corrupted, target) =>
      nTok += nt; nMask += nm; if (ns > 0) sawSpan = true
      // parse target into sentinel -> span tokens
      val spans = scala.collection.mutable.Map[Int, List[String]]()
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach { w =>
        if (w.startsWith("<extra_id_")) {
          cur = w.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Nil
        } else spans(cur) = spans(cur) :+ w
      }
      assert(spans.size == ns, s"doc $id: target sentinels != n_spans")
      // splice: each sentinel in corrupted expands to its span
      val rebuilt = corrupted.split(" ").filter(_.nonEmpty).flatMap { w =>
        if (w.startsWith("<extra_id_"))
          spans(w.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else List(w)
      }.mkString(" ")
      val expected = orig(id).trim.split("[ \t\n\f\r]+").mkString(" ")
      assert(rebuilt == expected, s"doc $id failed the round trip")
      assert(nm >= ns, s"doc $id: spans longer than mask count")
    }
    assert(sawSpan, "corpus produced no spans — corruption degenerate")
    val rate = nMask.toDouble / nTok
    assert(rate > 0.03 && rate < 0.20,
      s"mask rate $rate outside the designed ~10% band")
  }

  test("q186 wordpiece greedy matching on a hand-tokenized fixture") {
    import spark.implicits._
    // hand-derivations against the pinned vocab (WpInit/WpCont):
    //  "the"       -> [the]                           1 piece
    //  "nation"    -> [n ##at ##i ##on]               4
    //  "box"       -> b, ##o, then 'x' has no piece   -> whole word [UNK] = 1, unk
    //  "thatching" -> [that ##c ##h ##ing]            4
    //  "123"       -> [1 2 3]                         3
    //  26*'a'      -> over the 24-char budget         -> [UNK] = 1, unk
    val docs = Seq(
      (1L, "The nation box", "en", "s", 14L),
      (2L, "thatching 123 " + "a" * 26, "en", "s", 40L),
      (3L, "?!", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q186_wordpiece_encode")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(rows == Seq(
      (1L, 3L, 6L, 1L, Some(2.0)),
      (2L, 3L, 8L, 1L, Some(8.0 / 3)),
      (3L, 0L, 0L, 0L, None)), s"got $rows")
  }

  test("q188 unigram Viterbi matches an independent plain-Scala DP") {
    import spark.implicits._
    import graft.operators.TrainingPrep.{UniVocab, uniLp, UniMaxLen}
    // the independent reimplementation: same quantized scores, same
    // shortest-piece tie-break (strict > scanning l = 1..4)
    def segment(w: String): Seq[String] = {
      val dp = Array.fill[(Long, Int)](w.length + 1)((Long.MinValue, 0))
      dp(0) = (0L, 0)
      for (j <- 1 to w.length; l <- 1 to UniMaxLen if j >= l) {
        val piece = w.substring(j - l, j)
        UniVocab.get(piece).foreach { c =>
          val sc = dp(j - l)._1 + uniLp(c)
          if (dp(j - l)._1 != Long.MinValue && sc > dp(j)._1) dp(j) = (sc, l)
        }
      }
      var p = w.length
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (p > 0) { val l = dp(p)._2; out += w.substring(p - l, p); p -= l }
      out.toSeq
    }
    val texts = Seq(
      (1L, "The sting of things", "en", "s", 19L),
      (2L, "rationalisation nation the the errors", "en", "s", 37L),
      (3L, "internationalization 42", "en", "s", 23L))
    val dir = TestSpark.makeSfDir("documents" ->
      texts.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = SparkEntry.queries("q188_unigram_viterbi")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = texts.flatMap(_._2.toLowerCase
        .split("[^a-z0-9]+").filter(w => w.nonEmpty && w.length <= 24))
    val expected = words.flatMap(segment)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // sanity: the LM actually prefers multi-char pieces where present
    assert(got.contains("the") && got.contains("ing") && got.contains("tion"))
  }

  test("q198 prefix-cache savings match a hand-built radix corpus") {
    import spark.implicits._
    // 4 docs share the 2-token prefix "sys prompt"; two of those also
    // share 4 tokens; one loner shares nothing. K=8: nobody eligible
    // except the three 8+-token docs, all distinct prefixes.
    val docs = Seq(
      (0L, "sys prompt alpha beta gamma delta epsilon zeta", "en", "s", 40L),
      (1L, "sys prompt alpha beta other tokens here now", "en", "s", 40L),
      (2L, "sys prompt xx yy", "en", "s", 16L),
      (3L, "sys prompt zz", "en", "s", 13L),
      (4L, "lone wolf text", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q198_prefix_cache_audit")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // K=2: 5 eligible docs, prefixes {sys prompt, lone wolf} -> 2
    // groups, 3 reuse slots in the first, 0 in the second; saved 3*2=6
    assert(rows(2) == ((5L, 2L, 3L, 6L)), s"K=2: ${rows(2)}")
    // K=4: docs 0,1,2 eligible (>=4 tokens): prefixes {sys prompt
    // alpha beta} x2 + {sys prompt xx yy} -> wait doc 4 has 3 tokens
    // (ineligible); doc 3 has 3 tokens (ineligible). 1 reuse * 4 = 4
    assert(rows(4)._3 == 1L && rows(4)._4 == 4L, s"K=4: ${rows(4)}")
    // K=8: docs 0,1,2? doc 2 has 4 tokens -> only 0,1 eligible, their
    // 8-token prefixes differ -> zero savings
    assert(rows(8)._1 == 2L && rows(8)._3 == 0L && rows(8)._4 == 0L,
      s"K=8: ${rows(8)}")
  }

  test("q221 vocab utilization: merge products counted in the final encoding, dead merges explicit zeros") {
    import spark.implicits._
    // doc 1 pieces: "the" -> [the]; " then" -> [" the", n]; " thin" ->
    // [" ", th, in]. doc 2 piece "thinthin" -> [th, in, th, in]:
    // per-word MULTIPLICITY counts in n_occ but once in n_words.
    // "th" inside "the" is consumed by the later th+e merge -- the
    // dead-vocab mechanism this audit measures.
    val docs = Seq(
      (1L, "the then thin", "en", "s", 13L),
      (2L, "thinthin", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q221_bpe_vocab_util")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == 16 && rows.map(_._1).toSeq == (1 to 16), s"ranks: ${rows.toSeq}")
    val byTok = rows.map(r => r._2 -> ((r._3, r._4))).toMap
    assert(byTok("th") == ((3L, 2L)), s"th: ${byTok("th")}")
    assert(byTok("the") == ((1L, 1L)), s"the: ${byTok("the")}")
    assert(byTok("in") == ((3L, 2L)), s"in: ${byTok("in")}")
    assert(byTok(" the") == ((1L, 1L)), s"' the': ${byTok(" the")}")
    val live = Set("th", "the", "in", " the")
    assert(rows.filter(r => !live(r._2)).forall(r => r._3 == 0L && r._4 == 0L),
      s"dead merges must be explicit zeros: ${rows.toSeq}")
  }
}

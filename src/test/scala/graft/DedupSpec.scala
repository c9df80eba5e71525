package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dedup semantics on crafted documents (planted exact + near duplicates),
  * run through the real sf-dir query path. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    val base = (1 to 80).map(i => s"tok${i % 13} word${i % 7} item$i").mkString(" ")
    val nearDup = base.replace("item40", "itemX") // one token changed
    val unrelated = (1 to 80).map(i => s"zebra$i quux${i % 5}").mkString(" ")
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),      // exact dup of 0
      (2L, nearDup, "fr", "src2", nearDup.length.toLong), // near dup of 0
      (3L, unrelated, "en", "src0", unrelated.length.toLong),
      (4L, "tiny doc", "en", "src3", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  lazy val sfDir: String = TestSpark.makeSfDir("documents" -> docsDf)

  test("q262 novelty law: fresh batches are 100% novel, a verbatim re-crawl contributes zero, cum flatlines") {
    import spark.implicits._
    // ids 0..9 with max_id+1 = 10 → each doc IS its own batch; the
    // second half is a byte-identical re-crawl of the first
    val texts = (0 until 5).map(b =>
      (1 to 30).map(i => s"b${b}w$i u${b}x$i").mkString(" "))
    val docs = ((0 until 5).map(i => (i.toLong, texts(i))) ++
      (0 until 5).map(i => (5L + i, texts(i))))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q262_novelty_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == 10)
    rows.take(5).foreach { case (b, _, ppm, _) =>
      assert(ppm == 1000000L, s"fresh batch $b must be fully novel")
    }
    rows.drop(5).foreach { case (b, nNew, ppm, _) =>
      assert(nNew == 0L && ppm == 0L,
        s"re-crawled batch $b must contribute zero novelty")
    }
    val cumAtFresh = rows(4)._4
    rows.drop(5).foreach { case (_, _, _, cum) =>
      assert(cum == cumAtFresh,
        "cum_distinct must flatline across the re-crawl")
    }
  }

  test("exact dedup groups identical texts under the min doc_id") {
    val rows = SparkEntry.queries("q35_dedup_exact")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) == 2L) // docs 0 and 1 share text
    assert(rows(2L) == 1L)
    assert(rows.values.sum == 5L)
  }

  test("identical texts have identical minhash signatures") {
    val sig = SparkEntry.queries("q36_minhash_signatures")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(0L) == sig(1L), "exact dup must share the full signature")
    assert(sig(0L) != sig(3L), "unrelated docs must differ")
    // near dup shares most of the signature
    val shared = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(shared >= 12, s"near-dup shared only $shared/16 minhashes")
  }

  test("LSH pair join finds exact and near duplicates, not unrelated docs") {
    val pairs = SparkEntry.queries("q37_minhash_lsh_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair missed")
    assert(pairs.contains((0L, 2L)), "near dup pair missed")
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not pair")
  }

  test("simhash is equal for identical docs and close for near dups") {
    val sh = SparkEntry.queries("q38_simhash_signatures")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    val hamming = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hamming <= 3, s"near-dup simhash hamming was $hamming")
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 3)
  }

  test("dup-cluster resolution groups the transitive component under min id") {
    val rows = SparkEntry.queries("q56_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    // docs 0,1,2 form one component (0-1 exact, 0-2 and 1-2 near)
    assert(rows == Map(0L -> 0L, 1L -> 0L, 2L -> 0L),
      s"expected a single cluster rooted at 0, got $rows")
  }

  test("cluster resolution converges on a diameter-3 chain (multi-round propagation)") {
    import spark.implicits._
    // Sliding token windows: w=38 tokens (36 shingles), step 3 — adjacent
    // docs share 33/39 shingles (jaccard .846 >= .8), distance-2 docs only
    // 30/42 (.714 < .8). Edges are exactly the chain 0-1-2-3, so min-label
    // propagation needs 3 rounds — exercising the unpersist/localCheckpoint
    // path across iterations.
    val toks = (0 until 47).map(i => f"u$i%03d")
    val chain = (0 to 3).map { i =>
      val text = toks.slice(3 * i, 3 * i + 38).mkString(" ")
      (i.toLong, text, "en", s"src$i", text.length.toLong)
    }
    val dir = TestSpark.makeSfDir("documents" ->
      chain.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = SparkEntry.queries("q56_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(rows == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"expected one chain component rooted at 0, got $rows")
  }

  test("simhash pairs reports duplicate clusters only") {
    val pairs = SparkEntry.queries("q39_simhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("n-gram jaccard pairs are exact: dup=1.0, near-dup in (0,1), unrelated absent") {
    val rows = SparkEntry.queries("q76_ngram_jaccard_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(rows((0L, 1L)) == 1.0, "exact dup must have jaccard exactly 1.0")
    val near = rows((0L, 2L))
    assert(near > 0.5 && near < 1.0, s"near-dup jaccard was $near")
    assert(!rows.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc shares no shingle, must not pair")
    // exact intersection size: doc 0 vs 2 differ in one token, which
    // perturbs exactly 3 of the word-3-gram shingles
    val docs = docsDf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String) =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val expected = {
      val (s0, s2) = (shingleSet(docs(0L)), shingleSet(docs(2L)))
      s0.intersect(s2).size.toDouble / s0.union(s2).size
    }
    assert(math.abs(near - expected) < 1e-12,
      s"engine jaccard $near != reference-computed $expected")
  }

  test("df-cap variant drops boilerplate-only pairs, keeps rare-shingle pairs exactly") {
    import spark.implicits._
    // 18 docs that are one shared boilerplate phrase + one unique token:
    // every boilerplate shingle has df=18 > DfCap=16, so q121 must not
    // pair them — their entire overlap is above-cap. Two extra docs
    // share RARE shingles (df=2) and must appear in both variants with
    // identical exact stats.
    val boiler = (1 to 20).map(i => s"bp$i").mkString(" ")
    val rare = (1 to 20).map(i => s"rr$i").mkString(" ")
    val rareNear = rare.replace("rr10", "rrX")
    val docs = (0 until 18).map(i =>
      (i.toLong, s"$boiler uniq$i", "en", "s", 100L)) ++ Seq(
      (100L, rare, "en", "s", 100L),
      (101L, rareNear, "en", "s", 100L))
    val dir = TestSpark.makeSfDir("documents" ->
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    def pairs(q: String) = SparkEntry.queries(q)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = pairs("q76_ngram_jaccard_pairs")
    val capped = pairs("q121_ngram_jaccard_dfcap")
    assert(full.contains((0L, 1L)), "boilerplate pair present uncapped")
    assert(!capped.contains((0L, 1L)),
      "pair whose every shared shingle is above-cap must be dropped")
    assert(capped.contains((100L, 101L)), "rare-shingle pair must survive")
    assert(capped((100L, 101L)) == full((100L, 101L)),
      "surviving pairs carry the identical exact stats")
    assert(capped.keySet.subsetOf(full.keySet), "cap only removes pairs")
  }

  test("band-bucket cap leaves clusters identical when no bucket is hot") {
    import graft.operators.Dedup
    // On the planted fixture every band bucket holds <= 3 docs — far
    // below BandBucketCap — so the capped cluster pipeline (what
    // q56/q69/q81 run) must equal the uncapped transitive closure.
    def clusters(cap: Option[Long]) =
      Dedup.clustersDf(spark, sfDir, cap)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(clusters(Some(Dedup.BandBucketCap)) == clusters(None),
      "cap must be a no-op when no band bucket exceeds it")
  }

  test("band-bucket cap drops boilerplate mega-buckets, keeps rare near-dup clusters") {
    import spark.implicits._
    import graft.operators.Dedup
    // 70 identical docs: every band bucket they share holds 70 docs —
    // above BandBucketCap=64 — so the capped pipeline must not enumerate
    // their ~2400 pairwise edges. A rare near-dup pair (bucket df=2)
    // must still cluster.
    val boiler = (1 to 40).map(i => s"bp$i").mkString(" ")
    val rare = (1 to 40).map(i => s"rr$i").mkString(" ")
    val rareNear = rare.replace("rr20", "rrX")
    val docs = (0 until 70).map(i =>
      (i.toLong, boiler, "en", "s", 100L)) ++ Seq(
      (100L, rare, "en", "s", 100L),
      (101L, rareNear, "en", "s", 100L))
    val dir = TestSpark.makeSfDir("documents" ->
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val capped = Dedup.clustersDf(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(capped == Map(100L -> 100L, 101L -> 100L),
      s"expected only the rare cluster, got ${capped.size} members: " +
        capped.take(5).toString)
    val uncapped = Dedup.clustersDf(spark, dir, None)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(uncapped.size == 72, "uncapped closure must still see the mega-cluster")
  }

  test("incremental dedup admits only first-in-batch fingerprints absent from the corpus") {
    import spark.implicits._
    // corpus = doc_id % 10 < 8, batch = the rest. Planted cases:
    // 18 repeats corpus text (rejected), 19+28 are a batch-internal
    // duplicate pair (one admit under min doc_id, dup count 2),
    // 29 is genuinely new (admit, count 1).
    val docs = Seq(
      (1L, "alpha text", "en", "s", 10L),
      (2L, "beta text", "en", "s", 9L),
      (3L, "gamma text", "en", "s", 10L),
      (18L, "alpha text", "en", "s", 10L),
      (19L, "fresh text", "en", "s", 10L),
      (28L, "fresh text", "en", "s", 10L),
      (29L, "another new", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q127_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows == Map(19L -> 2L, 29L -> 1L),
      s"admissions wrong: $rows")
  }

  test("substring dedup finds exactly the planted cross-doc span, merged") {
    import spark.implicits._
    // A 30-token span planted inside two docs at DIFFERENT positions,
    // with unique surroundings; a third doc shares nothing. With k=25,
    // the duplicated windows are precisely the 6 fully inside the span
    // (boundary-straddling windows mix in unique context), so the
    // merged removal span must be the planted 30 tokens exactly.
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val prefixA = (1 to 5).map(i => s"ua$i").mkString(" ")
    val suffixB = (1 to 8).map(i => s"ub$i").mkString(" ")
    val docs = Seq(
      (1L, s"$prefixA $shared", "en", "s", 100L),       // span at pos 6..35
      (2L, s"$shared $suffixB", "en", "s", 100L),       // span at pos 1..30
      (3L, (1 to 40).map(i => s"solo$i").mkString(" "), "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q143_substring_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 6L, 35L, 6L), (2L, 1L, 30L, 6L)),
      s"removal spans wrong: ${rows.toSeq}")
  }

  test("substring removal keeps the first copy, excises the rest, passes short docs") {
    import spark.implicits._
    // same planted geometry as the span test: doc 1 (smallest id) owns
    // the shared 30-token span, so it must survive UNTOUCHED while
    // doc 2 loses exactly the 30 shared tokens; doc 3 never matched;
    // doc 4 is shorter than the window and must pass through verbatim
    val shared = (1 to 30).map(i => s"dup$i").mkString(" ")
    val prefixA = (1 to 5).map(i => s"ua$i").mkString(" ")
    val suffixB = (1 to 8).map(i => s"ub$i").mkString(" ")
    val solo = (1 to 40).map(i => s"solo$i").mkString(" ")
    val docs = Seq(
      (1L, s"$prefixA $shared", "en", "s", 100L),
      (2L, s"$shared $suffixB", "en", "s", 100L),
      (3L, solo, "en", "s", 100L),
      (4L, "tiny doc", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q145_substring_removal")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(1L) == ((35, 35, s"$prefixA $shared")), s"keeper modified: ${rows(1L)}")
    assert(rows(2L) == ((38, 8, suffixB)), s"dup copy not excised: ${rows(2L)}")
    assert(rows(3L) == ((40, 40, solo)))
    assert(rows(4L) == ((2, 2, "tiny doc")), "short doc must pass verbatim")
  }

  test("substring removal survives a boilerplate span planted in 1200 docs") {
    import spark.implicits._
    // the hot-hash shape the aggregate-form keeper exists for: ONE
    // 25-token boilerplate span shared by 1200 docs. The smallest
    // doc_id keeps its copy untouched; all 1199 others excise exactly
    // the 25 shared tokens and keep their unique tails.
    val boiler = (1 to 25).map(i => s"bp$i").mkString(" ")
    val docs = (1L to 1200L).map { id =>
      val tail = (1 to 10).map(i => s"u${id}x$i").mkString(" ")
      (id, s"$boiler $tail", "en", "s", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q145_substring_removal")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    assert(rows.size == 1200)
    assert(rows(1L) == ((35, 35)), s"keeper must survive untouched: ${rows(1L)}")
    for (id <- 2L to 1200L)
      assert(rows(id) == ((35, 10)), s"doc $id not excised: ${rows(id)}")
  }

  test("q185 memorization buckets tile the window mass with consistent labels") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q185_memorization_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Σ instances over buckets == total 25-token windows in the corpus
    val nWindows = Tables.documents(spark, sf)
      .select(greatest(size(Dsl.toks(col("text"))) - 24, lit(0))
        .cast("long").as("w"))
      .agg(sum("w")).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == nWindows,
      s"buckets carry ${rows.map(_._3).sum} instances, corpus has $nWindows")
    // a count-1 window cannot cross documents; its instances == types
    rows.find(_._1 == 1L).foreach { b1 =>
      assert(b1._4 == 0 && b1._3 == b1._2)
    }
    // bucket label b means per-type count in [b, 2b) (16 = open-ended)
    for ((b, types, inst, _) <- rows if b >= 2) {
      assert(inst >= b * types, s"bucket $b: $inst < $b*$types")
      if (b < 16) assert(inst < 2 * b * types, s"bucket $b: $inst >= 2*$b*$types")
    }
  }

  test("q191 pagerank conserves mass, floors at teleport, ties symmetric pairs") {
    val sf = TestSpark.sf0001
    val pr = SparkEntry.queries("q191_dup_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("q37_minhash_lsh_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(pr.keySet == nodes, "pagerank must cover exactly the dup-graph nodes")
    val base = 150000000L / nodes.size
    assert(pr.values.forall(_ >= base), "every node keeps at least the teleport mass")
    // integer floors only LOSE mass; 10 iterations lose a bounded sliver
    val total = pr.values.sum
    assert(total <= 1000000000L && total > 800000000L, s"mass $total")
    // an isolated mutual pair is symmetric: both ends must tie exactly
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val isolated = pairs.filter { case (a, b) => deg(a) == 1 && deg(b) == 1 }
    assert(isolated.nonEmpty, "fixture assumption: testdata has isolated pairs")
    for ((a, b) <- isolated) assert(pr(a) == pr(b), s"pair ($a,$b) asymmetric")
  }

  test("substring report (q143) and removal (q145) agree on real testdata") {
    // cross-operator law at sf0.001: q145 excises only positions that
    // q143 reported as duplicated (removal ⊆ report), and every doc
    // q145 shortened must carry at least one q143 span. The converse
    // does NOT hold (the keeper's own spans are reported but kept).
    val sf = TestSpark.sf0001
    val spans = SparkEntry.queries("q143_substring_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val removed = SparkEntry.queries("q145_substring_removal")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .filter { case (_, before, after) => after < before }
    assert(removed.nonEmpty, "testdata has planted cross-doc repeats; none removed?")
    removed.foreach { case (id, before, after) =>
      val s = spans.getOrElse(id, Array.empty)
      assert(s.nonEmpty, s"doc $id shortened by q145 but has no q143 span")
      val covered = s.map { case (_, lo, hi) => hi - lo + 1 }.sum
      assert(before - after <= covered,
        s"doc $id: removed ${before - after} tokens > reported span coverage $covered")
    }
  }

  test("containment flags a quoted doc inside a larger one that jaccard misses") {
    import spark.implicits._
    // doc 2 is a verbatim 15-token slice of 40-token doc 1: its 13
    // distinct 3-gram shingles are a subset of doc 1's 38, so
    // containment(2 in 1) = 13/13 = 1.0 while jaccard = 13/38 ~= 0.34 —
    // below q76's 0.5 threshold. The reverse direction (38 shingles,
    // 13 shared) is 13/38 and must NOT be emitted. Doc 3 is unrelated.
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (11 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big, "en", "s", 100L),
      (2L, quote, "en", "s", 50L),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "), "en", "s", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val got = SparkEntry.queries("q149_containment_pairs")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((2L, 1L, 13L, 1.0)), s"containment pairs wrong: $got")
    val jac = SparkEntry.queries("q76_ngram_jaccard_pairs")(spark, dir)
      .collect()
    assert(jac.isEmpty, "jaccard at 0.5 must miss the asymmetric pair")
  }

  test("substring dedup ignores repeats within a single document") {
    import spark.implicits._
    // the same 25-token run appears TWICE in one doc and nowhere else:
    // cross-doc df is 1, so no removal span may be emitted
    val run = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run mid1 mid2 $run", "en", "s", 100L),
      (2L, (1 to 30).map(i => s"other$i").mkString(" "), "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q143_substring_dedup")(spark, dir).collect()
    assert(rows.isEmpty, s"within-doc repeat must not be flagged: ${rows.toSeq}")
  }

  test("df-capped pairs are a bit-exact subset of the uncapped reference (q121 vs q76)") {
    // the capped+hot intersection decomposition must emit, for every
    // pair it keeps, EXACTLY the row the uncapped q76 computes —
    // n_shared and jaccard bit-for-bit; the cap may only shrink the
    // pair set, never alter a surviving row. Differential guard for
    // the round-9 decomposition rewrite, on real testdata.
    val sf = TestSpark.sf0001
    val exact = SparkEntry.queries("q76_ngram_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val capped = SparkEntry.queries("q121_ngram_jaccard_dfcap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(capped.nonEmpty, "capped pairs empty at sf0.001 — law vacuous")
    capped.foreach { case (pair, stats) =>
      assert(exact.get(pair).contains(stats),
        s"pair $pair: capped $stats != exact ${exact.get(pair)}")
    }
  }

  test("paragraph dedup with an absent delimiter degenerates to whole-doc exact dedup") {
    import spark.implicits._
    // no delimiter occurrences -> every doc is ONE paragraph, so
    // keep-first paragraph dedup must equal q35's exact-doc semantics:
    // the first copy survives verbatim, later copies are fully excised
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s", 1L),
      (1L, "alpha beta gamma", "en", "s", 1L), // exact dup of 0
      (2L, "delta epsilon", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = graft.operators.Dedup.paragraphDedup("@@never@@")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(0L) == ((1, 1, "alpha beta gamma")))
    assert(rows(1L) == ((1, 0, "")), s"dup doc must be fully excised: ${rows(1L)}")
    assert(rows(2L) == ((1, 1, "delta epsilon")))
  }

  test("incremental paragraph dedup admits only batch paragraphs unseen in the corpus, first-in-batch") {
    import spark.implicits._
    // corpus docs (id % 10 < 8) carry a boilerplate footer; batch docs
    // (id % 10 >= 8): doc 8 = fresh body + the corpus footer (footer
    // must be excised — it exists in the corpus), docs 18/28 share a
    // batch-internal paragraph (first-in-batch survives, only in 18),
    // and the corpus docs themselves must NOT be re-emitted.
    // Registry delimiter is the token " the ".
    val docs = Seq(
      (0L, "corpus body zero the footer boilerplate", "en", "s", 1L),
      (1L, "corpus body one the footer boilerplate", "en", "s", 1L),
      (8L, "fresh batch body the footer boilerplate", "en", "s", 1L),
      (18L, "batch shared para the unique eighteen", "en", "s", 1L),
      (28L, "batch shared para the unique twentyeight", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q158_incremental_paragraph_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows.keySet == Set(8L, 18L, 28L),
      s"only batch docs may be emitted: ${rows.keySet}")
    assert(rows(8L) == ((2, 1, "fresh batch body")),
      s"corpus-seen footer must be excised: ${rows(8L)}")
    assert(rows(18L) == ((2, 2, "batch shared para the unique eighteen")),
      s"first-in-batch keeps both paragraphs: ${rows(18L)}")
    assert(rows(28L) == ((2, 1, "unique twentyeight")),
      s"batch-internal dup must keep only doc 18's copy: ${rows(28L)}")
  }

  test("paragraph dedup: a footer planted in 50 docs survives only in the lowest doc_id, docs reassemble in order") {
    import spark.implicits._
    // RefinedWeb shape with a real newline delimiter: every doc is a
    // unique body plus the SAME license footer; one doc additionally
    // repeats a paragraph within itself.
    val footer = "all rights reserved by example corp"
    val docs = ((0L until 50L).map { i =>
      (i, s"unique body number $i with words\n\n$footer", "en", "s", 1L)
    } :+ ((50L, s"alpha para\n\nalpha para\n\nomega para", "en", "s", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = graft.operators.Dedup.paragraphDedup("\n\n")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    // doc 0 keeps both paragraphs; docs 1-49 lose the footer but keep
    // their body, reassembled without the dangling delimiter
    assert(rows(0L) == ((2, 2, s"unique body number 0 with words\n\n$footer")))
    (1L until 50L).foreach { i =>
      assert(rows(i) == ((2, 1, s"unique body number $i with words")),
        s"doc $i must keep only its body: ${rows(i)}")
    }
    // within-doc repeat: first copy survives, order preserved
    assert(rows(50L) == ((3, 2, "alpha para\n\nomega para")),
      s"within-doc duplicate paragraph must keep only its first copy: ${rows(50L)}")
  }

  test("q196 canonical is the richest cluster member, not the first; ties fall back to keep-first") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"tok${i % 13} word${i % 7} item$i").mkString(" ")
    val richer = base + " extra1 extra2 extra3 extra4 extra5"
    val unrelated = (1 to 80).map(i => s"zebra$i quux${i % 5}").mkString(" ")
    val dir = TestSpark.makeSfDir("documents" -> Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, richer, "en", "s", richer.length.toLong),
      (2L, unrelated, "en", "s", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = SparkEntry.queries("q196_quality_canonical")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // 0 and 1 cluster under root 0, but the canonical is the RICHER
    // later doc 1 — the exact case where keep-first (q69) throws away
    // the better extraction
    assert(rows(0L) == ((0L, 1L, 0L)), s"doc 0: ${rows(0L)}")
    assert(rows(1L) == ((0L, 1L, 1L)), s"doc 1: ${rows(1L)}")
    // the unrelated singleton is its own canonical
    assert(rows(2L) == ((2L, 2L, 1L)), s"doc 2: ${rows(2L)}")
    // exact-tie clusters (shared fixture: docs 0,1,2 have equal qkey)
    // fall back to the keep-first convention — canonical = min doc_id
    val tie = SparkEntry.queries("q196_quality_canonical")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(tie(0L) == 0L && tie(1L) == 0L && tie(2L) == 0L,
      s"tie cluster must keep first: $tie")
  }

  test("q197 splits are leakage-free by construction where the doc-hash split leaks") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real testdata first: no q37 verified near-dup pair may straddle
    val sf = TestSpark.sf0001
    val split = SparkEntry.queries("q197_leakage_safe_splits")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = SparkEntry.queries("q37_minhash_lsh_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no pairs — straddle check would be vacuous")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a,$b) straddles ${split(a)}/${split(b)}") }
    assert(split.values.toSet == Set("train", "valid", "test"),
      "all three splits must be populated")
    // the leak the per-DOC hash (q78) would cause: find two ids whose
    // own buckets land in different splits, plant identical text under
    // them — q197 must put both in ONE split (the cluster root's)
    graft.functions.TextFunctions.register(spark)
    val buckets = (0L until 200L).toDF("id")
      .select(col("id"), (Dsl.md5h61(concat(lit("split:"),
        col("id").cast("string"))) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.find(_._2 < 80).get._1
    val testId = buckets.find(_._2 >= 90).get._1
    val text = (1 to 40).map(i => s"tok$i item$i").mkString(" ")
    val dir = TestSpark.makeSfDir("documents" -> Seq(
      (trainId, text, "en", "s", text.length.toLong),
      (testId, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val planted = SparkEntry.queries("q197_leakage_safe_splits")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(3)))).toMap
    // the per-doc buckets straddle by construction...
    assert(buckets(trainId) < 80 && buckets(testId) >= 90)
    // ...but the cluster-atomic split keeps the pair together, keyed
    // on the min-id root
    val root = math.min(trainId, testId)
    assert(planted(trainId)._1 == root && planted(testId)._1 == root)
    assert(planted(trainId)._2 == planted(testId)._2,
      s"planted dup pair straddles: $planted")
  }

  test("q205 threshold curve: graded fixture lands each pair in its exact band") {
    import spark.implicits._
    // docs 1,2: identical (jaccard 1.0 -> every band). docs 4,5: 10
    // shingles each, 7 shared -> j = 7/13 ~ 0.538, band t10=5 ONLY.
    // doc 3: disjoint. All >= 12 tokens so every doc shingles.
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val q4 = (1 to 12).map(i => s"q$i").mkString(" ")
    val q5 = ((1 to 9).map(i => s"q$i") ++ Seq("x", "y", "z")).mkString(" ")
    val z = (1 to 12).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, p), (2L, p), (3L, z), (4L, q4), (5L, q5))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q205_dedup_threshold_curve")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(rows.keySet == Set(5L, 6L, 7L, 8L, 9L))
    // t=0.5 admits both pairs; docs 2 and 5 drop (10 shingles each)
    assert(rows(5L) == ((2L, 2L, 20L, 5L, 0.4)), s"t10=5: ${rows(5L)}")
    // t>=0.6 keeps only the exact dup
    for (t <- Seq(6L, 7L, 8L, 9L))
      assert(rows(t) == ((1L, 1L, 10L, 5L, 0.2)), s"t10=$t: ${rows(t)}")
    // monotonicity: pairs and drops never increase with the threshold
    val sorted = rows.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.sliding(2).forall { case Seq(a, b) =>
      a._1 >= b._1 && a._2 >= b._2 })
  }

  test("q206 source mirror: planted 2/3 mirror with duplicated mass; unrelated source absent") {
    import spark.implicits._
    val (ta, tb, tc, td, te) = ("text aaa one", "text bbb two",
      "text ccc three", "text ddd four", "text eee five")
    // m1 = {A,B,C}; m2 = {B,B,C,D} (hash set {B,C,D}, B twice); u = {E}
    val docs = Seq(
      (1L, ta, "m1"), (2L, tb, "m1"), (3L, tc, "m1"),
      (4L, tb, "m2"), (5L, tb, "m2"), (6L, tc, "m2"), (7L, td, "m2"),
      (8L, te, "u"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q206_source_mirror")(spark, dir).collect()
    assert(rows.length == 1, s"only (m1, m2) overlaps: ${rows.toSeq}")
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == (("m1", "m2")))
    // shared hash set {B, C}; doc-pair mass counts B's two m2 copies
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L, s"shared/pairs: $r")
    assert(r.getLong(4) == 3L && r.getLong(5) == 3L, s"na/nb: $r")
    assert(r.getDouble(6) == 2.0 / 4.0)  // jaccard 2/(3+3-2)
    assert(r.getDouble(7) == 2.0 / 3.0 && r.getDouble(8) == 2.0 / 3.0)
  }

  test("q211 calibration: identical pair collides at bucket 19; theory literals pinned") {
    import spark.implicits._
    import graft.operators.Dedup
    // the q205 graded fixture: (1,2) identical -> jaccard 1.0, bucket
    // 19; (4,5) j = 7/13 -> bucket (7*20) div 13 = 10
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val q4 = (1 to 12).map(i => s"q$i").mkString(" ")
    val q5 = ((1 to 9).map(i => s"q$i") ++ Seq("x", "y", "z")).mkString(" ")
    val docs = Seq((1L, p), (2L, p), (4L, q4), (5L, q5))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q211_lsh_calibration")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set(10L, 19L), s"buckets: $rows")
    // an identical pair has identical signatures: every band collides
    val (n19, c19, m19, t19) = rows(19L)
    assert(n19 == 1L && c19 == 1L && m19 == 1000000L)
    assert(t19 == Dedup.TheoCollidePpm(19), "theory literal must be the pinned value")
    assert(rows(10L)._1 == 1L && rows(10L)._4 == Dedup.TheoCollidePpm(10))
    // the pinned curve itself is a monotone s-curve reaching ~1
    assert(Dedup.TheoCollidePpm.sliding(2).forall { case Seq(a, b) => a <= b })
    assert(Dedup.TheoCollidePpm.head < 10000 && Dedup.TheoCollidePpm.last > 999000)
  }

  test("q220 drop-all prevalence: cross-doc segments dropped everywhere, within-doc repeats survive") {
    import spark.implicits._
    // "dup" appears in docs 1 (srcA) and 2 (srcB) -> global nd=2 ->
    // boilerplate: ALL copies dropped (including the first, the exact
    // point where this differs from q152 keep-first). "rep" appears
    // twice but only inside doc 3 -> nd=1 -> NOT boilerplate (the
    // prevalence unit is distinct documents, not instances).
    val docs = Seq(
      (1L, "dup the uniq1", "en", "srcA", 13L),
      (2L, "dup the uniq2", "en", "srcB", 13L),
      (3L, "rep the rep", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q220_boilerplate_prevalence")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    // srcA: segs dup|uniq1|rep|rep, chars 3+5+3+3=14, dup dropped (3)
    assert(rows("srcA") == ((2L, 4L, 1L, 1L, 14L, 3L, 3.0 / 14)),
      s"srcA wrong: ${rows("srcA")}")
    // srcB: segs dup|uniq2, chars 3+5=8, dup dropped (3)
    assert(rows("srcB") == ((1L, 2L, 1L, 1L, 8L, 3L, 3.0 / 8)),
      s"srcB wrong: ${rows("srcB")}")
  }

  test("q235 triangle census: a planted clique reads transitivity 1, a path 0, disjoint union sums") {
    import spark.implicits._
    // K4 on nodes 1..4 (oriented a<b: 6 edges, 4 triangles, every node
    // degree 3 -> wedges 4*C(3,2)=12, transitivity 3*4/12 = 1.0) plus a
    // disjoint path 10-11-12 (2 edges, 1 wedge at node 11, 0 triangles)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = Seq((10L, 11L), (11L, 12L))
    val pairs = (k4 ++ path).toDF("doc_a", "doc_b")
    val r = operators.Dedup.triangleCensus(pairs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 8L, 13L, 4L)), s"census wrong: $r")
    assert(r.getDouble(4) == 12.0 / 13, s"transitivity wrong: $r")
    // clique alone is fully transitive; path alone has no closure
    val rK = operators.Dedup.triangleCensus(k4.toDF("doc_a", "doc_b"))
      .collect()(0)
    assert(rK.getDouble(4) == 1.0, s"K4 transitivity: $rK")
    val rP = operators.Dedup.triangleCensus(path.toDF("doc_a", "doc_b"))
      .collect()(0)
    assert(rP.getLong(3) == 0L && rP.getDouble(4) == 0.0,
      s"path census: $rP")
  }
}

package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deduplication operators for the training-data pipeline surface:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
  * bucket-join → jaccard verify), and SimHash (bit-vote + chunked
  * hamming blocking).
  *
  * Scale notes (100 TB): every pairwise comparison here is preceded by a
  * content-derived blocking key (LSH band hash / simhash chunk), so the
  * candidate join is an equi-join Catalyst shuffles on the bucket key —
  * never an O(n²) cross join. Signatures are one explode + one hash-agg
  * (map-side partial agg applies); both are linear scans.
  */
object Dedup {
  import Dsl._

  private val K = 16    // minhash signature length
  private[graft] val Bands = 8 // 8 bands × 2 rows (high recall at jaccard ≥ 0.8)
  private val mhNames = (0 until K).map(k => f"mh$k%02d")

  /** Exact dedup: group by full text, keep the minimum doc_id. */
  val exact: Q = Q(
    "q35_dedup_exact",
    (s, d) => Tables.documents(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
      .orderBy("keep_id"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dups
      FROM documents GROUP BY text ORDER BY keep_id"""))

  /** Distinct word-3-gram shingle sets over an arbitrary (doc_id, text)
    * frame (docs with < 3 tokens are excluded on both engines — see
    * [[Dsl.shingles3]]). Frame-parameterized so the persisted-index
    * lifecycle ([[LshBandIndex]]) can shingle a corpus slice or a
    * nightly batch with the exact q36/q37 semantics. */
  private[operators] def shingleSetsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.TextFunctions.register(s)
    docs
      // The documents parquet arrives in O(1) partitions; spread the
      // per-row shingling/hashing work across all cores before computing
      // it (explicit partition count — AQE would coalesce a keyed
      // repartition of this tiny-byte-size input back to one partition).
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      // single-pass native expression; semantics twin of
      // array_distinct(shingles3(t)) — see DistinctShingles scaladoc
      .select(col("doc_id"), expr("distinct_shingles(t, 3)").as("sh"))
  }

  private def shingleSets(s: SparkSession, d: String): DataFrame =
    shingleSetsOf(s, Tables.documents(s, d))

  private[operators] val sqlShingleSets =
    s"""t AS (SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
       sets AS (SELECT doc_id, list_distinct(${sqlShingles3("t")}) AS sh
                FROM t WHERE len(t) >= 3)"""

  // One md5 base hash per shingle + K affine rehashes
  // h_k = (a_k * h + b_k) mod P over the Mersenne prime P = 2^61 - 1,
  // in exact integer arithmetic (decimal(38,0) in Spark, hugeint in
  // DuckDB) so both engines produce identical values. 16x fewer md5
  // calls than hashing (k || shingle) per k.
  private val P61 = 2305843009213693951L // 2^61 - 1 (prime)
  private val affine: Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h64(s: String): Long =
      java.nio.ByteBuffer.wrap(md.digest(s.getBytes("UTF-8"))).getLong
    (0 until K).map { k =>
      val a = math.floorMod(h64(s"mh-a:$k"), P61 - 1) + 1 // nonzero
      val b = math.floorMod(h64(s"mh-b:$k"), P61)
      (a, b)
    }
  }

  /** Shingle sets + MinHash signatures in ONE narrow pass: base-hash
    * each shingle once (transform), then fold each of the K affine
    * rehashes with array_min. Value-identical to the explode + hash-agg
    * formulation (min over the same multiset) but with zero shuffle —
    * the signature stage is a per-row projection, so it pipelines into
    * whatever consumes it. `hs` is a separate projection level so the
    * expensive md5 transform is evaluated once, not once per rehash
    * (CollapseProject keeps non-cheap multi-referenced aliases). */
  private def signedSets(s: SparkSession, d: String): DataFrame =
    signedSetsOf(s, Tables.documents(s, d))

  /** [[signedSets]] over an arbitrary (doc_id, text) frame — the
    * [[LshBandIndex]] entry point. */
  private[operators] def signedSetsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    val withHs = shingleSetsOf(s, docs).withColumn("hs",
      transform(col("sh"), x => md5h61(x).cast(DecimalType(38, 0))))
    val mhCols = (0 until K).map { k =>
      val (a, b) = affine(k)
      array_min(transform(col("hs"),
        h => ((lit(BigDecimal(a)) * h + lit(BigDecimal(b))) % lit(BigDecimal(P61)))
          .cast(LongType))).as(mhNames(k))
    }
    withHs.select(col("doc_id") +: col("sh") +: mhCols: _*)
  }

  private def signatures(s: SparkSession, d: String): DataFrame =
    signedSets(s, d).drop("sh")

  private[operators] val sqlSignatures = {
    val aggs = (0 until K).map { k =>
      val (a, b) = affine(k)
      s"min(cast((${a}::hugeint * h + ${b}::hugeint) % ${P61}::hugeint as bigint)) AS ${mhNames(k)}"
    }.mkString(", ")
    s"""sig AS (SELECT doc_id, $aggs
          FROM (SELECT doc_id, ${sqlMd5h61("s")} AS h
                FROM (SELECT doc_id, unnest(sh) AS s FROM sets))
          GROUP BY doc_id)"""
  }

  /** q36: the signature table itself (oracle checks the full minhash math). */
  val minhashSignatures: Q = Q(
    "q36_minhash_signatures",
    (s, d) => signatures(s, d).orderBy("doc_id"),
    Some(s"""WITH $sqlShingleSets, $sqlSignatures
      SELECT * FROM sig ORDER BY doc_id"""))

  /** Band hash columns: md5 over the concatenated minhash values of each
    * band (2 rows/band). */
  private def bandCol(b: Int): Column =
    md5(concat_ws(",", col(mhNames(2 * b)), col(mhNames(2 * b + 1))).cast("binary"))

  /** All band hash columns in band order (consumed positionally by the
    * band posexplode in [[LshBandIndex]] and [[scoredPairs]]). */
  private[operators] def bandColumns: Seq[Column] = (0 until Bands).map(bandCol)

  /** Append a `bands` column (the 8 LSH band hashes, in band order) to
    * ANY frame with a text column — q36/q37's exact shingle → minhash →
    * band math as one narrow per-row projection chain that keeps every
    * input column (no repartition, no pruning), so event-time/watermark
    * columns survive: the streaming near-dup gate's entry point
    * (StreamIngest.nearDedupStream). Docs with < 3 tokens have no
    * shingles and get a NULL `bands` (an empty-shingle band hash would
    * make all short docs collide with each other). Interior projection
    * levels keep the expensive md5 transform single-evaluated
    * (CollapseProject keeps non-cheap multi-referenced aliases — the
    * signedSetsOf discipline). */
  private[graft] def withBands(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.TextFunctions.register(df.sparkSession)
    // the scratch + output names this projection owns; a caller frame
    // already carrying one (say a batch frame that went through the
    // signature path) would be silently clobbered and dropped below
    val owned = Seq("bands", "__sh", "__hs") ++ mhNames
    val clash = df.columns.toSet.intersect(owned.toSet)
    require(clash.isEmpty, s"withBands would clobber input column(s): $clash")
    val base = df
      .withColumn("__sh", when(size(toks(col(textCol))) >= 3,
        call_function("distinct_shingles", toks(col(textCol)), lit(3))))
      .withColumn("__hs", transform(col("__sh"),
        x => md5h61(x).cast(DecimalType(38, 0))))
    val withMh = (0 until K).foldLeft(base) { (acc, k) =>
      val (a, b) = affine(k)
      acc.withColumn(mhNames(k), array_min(transform(col("__hs"),
        h => ((lit(BigDecimal(a)) * h + lit(BigDecimal(b))) % lit(BigDecimal(P61)))
          .cast(LongType))))
    }
    withMh
      .withColumn("bands", when(col("__sh").isNotNull, array(bandColumns: _*)))
      .drop(Seq("__sh", "__hs") ++ mhNames: _*)
  }

  private def sqlBandExpr(b: Int): String =
    s"md5(concat_ws(',', ${mhNames(2 * b)}, ${mhNames(2 * b + 1)}))"

  /** SQL twin of [[bandColumns]]: `(doc_id, band_id, bh)` rows over the
    * `sig` CTE — shared by the q37-family oracles and [[LshBandIndex]]. */
  private[operators] val sqlBandsAll: String = (0 until Bands).map(b =>
    s"SELECT doc_id, $b AS band_id, ${sqlBandExpr(b)} AS bh FROM sig")
    .mkString(" UNION ALL ")

  /** q37: MinHash-LSH near-dup pairs. Candidates = docs sharing any band
    * bucket; verified with true shingle jaccard >= 0.8. Output carries the
    * signature estimate and the exact jaccard. */
  /** Band-bucket population cap for the cluster pipeline (q56/q69): a
    * band bucket holding df docs yields ~df²/2 candidate pairs — the
    * same quadratic hot-bucket q121's shingle df-cap bounds — so the CC
    * input drops buckets above this cap. A pair is lost only if EVERY
    * band it collides on is above-cap, i.e. its whole signature overlap
    * is boilerplate-shaped. */
  private[graft] val BandBucketCap = 64L

  /** All LSH candidate pairs with estimated + exact jaccard (UNfiltered
    * — the q91 sketch-quality eval needs the false positives too).
    * `bucketCap` drops band buckets with population above the cap (and
    * below 2 — singletons cannot pair) before the candidate self-join;
    * None keeps every bucket (q37's exact published semantics). */
  private def scoredPairs(s: SparkSession, d: String,
      bucketCap: Option[Long] = None): DataFrame = {
      // One cached frame carries shingle sets AND signatures (the
      // signature stage is narrow, so this single materialization
      // replaces a signature cache plus two shingle recomputes), and the
      // verify stage joins back to it once per pair side — estimate and
      // exact jaccard come from the same two joins. The band explode
      // deliberately carries only (doc_id, band_id, bh): shuffling the
      // shingle arrays 8x through the candidate join would multiply
      // shuffle volume by the band count at scale.
      val enriched = graft.CacheScope.cached(signedSets(s, d))
      // bandsAll cached: the candidate self-join consumes it on both
      // sides (and the bucket-cap branch adds a third consumer) — each
      // otherwise re-scans the fat enriched cache and re-runs the
      // 8-band md5 projection (r18 plan audit: two posexplode
      // pipelines); the cached rows are (doc_id, band_id, bh)
      val bandsAll = graft.CacheScope.cached(
        enriched.select(col("doc_id"),
          posexplode(array((0 until Bands).map(bandCol): _*)).as(Seq("band_id", "bh"))))
      val bands = bucketCap.fold(bandsAll) { cap =>
        val keep = bandsAll.groupBy("band_id", "bh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap && col("df") >= 2)
          .select("band_id", "bh")
        bandsAll.join(keep, Seq("band_id", "bh"))
      }
      val a = bands.as("a"); val b = bands.as("b")
      val cand = a.join(b,
        col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val x = enriched.as("x"); val y = enriched.as("y")
      val matches = mhNames.map(m =>
        when(col(s"x.$m") === col(s"y.$m"), 1).otherwise(0)).reduce(_ + _)
      val inter = size(array_intersect(col("x.sh"), col("y.sh")))
      cand
        .join(x, col("doc_a") === col("x.doc_id"))
        .join(y, col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (matches.cast("double") / K).as("est_jaccard"),
          (inter.cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) - inter)).as("jaccard"))
  }

  /** Verified near-dup pairs (jaccard >= 0.8) — shared by q37 and the
    * cluster-resolution q56 (which passes [[BandBucketCap]]). */
  private[operators] def verifiedPairs(s: SparkSession, d: String,
      bucketCap: Option[Long] = None): DataFrame =
    scoredPairs(s, d, bucketCap).filter(col("jaccard") >= 0.8)

  /** SQL chain computing the `verified` CTE (shared by q37/q56 oracles).
    * `bucketCap` mirrors the Spark side's band-bucket population cap so
    * both engines drop the identical buckets. */
  private def sqlVerified(bucketCap: Option[Long]): String = {
    val bandSelects = sqlBandsAll
    val matchSum = mhNames.map(m =>
      s"CASE WHEN x.$m = y.$m THEN 1 ELSE 0 END").mkString(" + ")
    val capChain = bucketCap.map(cap =>
      s"""bkeep AS (SELECT band_id, bh
           FROM (SELECT band_id, bh, count(*) AS df FROM bands_all GROUP BY 1, 2)
           WHERE df <= $cap AND df >= 2),
         bands AS (SELECT b.doc_id, b.band_id, b.bh
           FROM bands_all b JOIN bkeep USING (band_id, bh)),""")
      .getOrElse("bands AS (SELECT * FROM bands_all),")
    s"""$sqlShingleSets, $sqlSignatures,
      bands_all AS ($bandSelects),
      $capChain
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
      est AS (SELECT c.doc_a, c.doc_b,
          cast($matchSum as double) / $K AS est_jaccard
        FROM cand c JOIN sig x ON x.doc_id = c.doc_a
                    JOIN sig y ON y.doc_id = c.doc_b),
      verified AS (SELECT e.doc_a, e.doc_b, e.est_jaccard,
          cast(len(list_intersect(p.sh, q.sh)) as double) /
            (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh))) AS jaccard
        FROM est e JOIN sets p ON p.doc_id = e.doc_a
                   JOIN sets q ON q.doc_id = e.doc_b)"""
  }

  private val sqlVerifiedChain: String = sqlVerified(None)

  val minhashLshPairs: Q = Q(
    "q37_minhash_lsh_pairs",
    (s, d) => verifiedPairs(s, d).orderBy("doc_a", "doc_b"),
    Some(s"""WITH $sqlVerifiedChain
      SELECT doc_a, doc_b, est_jaccard, jaccard FROM verified
      WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"""),
    bench = true)

  /** q91: sketch quality, measured — LSH candidate precision and MinHash
    * estimator error against exact jaccard on the candidate set. At
    * scale this is the same banded equi-join as q37 plus one global agg,
    * so "is the sketch good enough?" costs one number, not a rerun of
    * the dedup. (Recall needs the O(n²) truth set and is covered by the
    * planted-duplicate specs instead.) Single row:
    * n_candidates, n_verified (jaccard ≥ 0.8), precision, and the
    * mean |est − exact| (exact decimal mean → bit-identical). */
  val sketchQuality: Q = Q(
    "q91_sketch_quality",
    (s, d) => scoredPairs(s, d)
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("n_verified"),
        (sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("precision"),
        davg(abs(col("est_jaccard") - col("jaccard"))).as("mae_est")),
    Some(s"""WITH $sqlVerifiedChain
      SELECT count(*) AS n_candidates,
        cast(count_if(jaccard >= 0.8) as bigint) AS n_verified,
        cast(count_if(jaccard >= 0.8) as double) / count(*) AS precision,
        ${sqlDavg("abs(est_jaccard - jaccard)")} AS mae_est
      FROM verified"""))

  /** q100: near-dup graph degree distribution — how many docs have 1, 2,
    * … verified duplicate partners. The shape diagnostic that decides
    * whether cluster resolution (q56) needs more propagation rounds at
    * scale (deep chains vs shallow stars); one union + two hash aggs on
    * the already-computed pair set. */
  val dupDegrees: Q = Q(
    "q100_dup_degrees",
    (s, d) => {
      val pairs = verifiedPairs(s, d).select("doc_a", "doc_b")
      val deg = pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .groupBy("doc_a").agg(count(lit(1)).as("degree"))
      deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    },
    Some(s"""WITH $sqlVerifiedChain,
      vp AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
      und AS (SELECT doc_a, doc_b FROM vp
              UNION ALL SELECT doc_b, doc_a FROM vp),
      deg AS (SELECT doc_a, count(*) AS degree FROM und GROUP BY doc_a)
      SELECT degree, count(*) AS n_docs FROM deg
      GROUP BY degree ORDER BY degree"""))

  /** q108: where do the duplicates come from — verified near-dup pair
    * counts per (source, source) bucket, the dataset-quality report that
    * tells you WHICH feed to dedup or drop. Two broadcast-sized joins
    * back to the doc metadata on top of the existing pair set. */
  val dupBySource: Q = Q(
    "q108_dup_by_source",
    (s, d) => {
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      verifiedPairs(s, d)
        .join(src.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("source", "source_a"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("source", "source_b"), "doc_b")
        .groupBy(least(col("source_a"), col("source_b")).as("src1"),
          greatest(col("source_a"), col("source_b")).as("src2"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("src1", "src2")
    },
    Some(s"""WITH $sqlVerifiedChain,
      vp AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
      j AS (SELECT least(sa.source, sb.source) AS src1,
                   greatest(sa.source, sb.source) AS src2
            FROM vp
            JOIN documents sa ON sa.doc_id = vp.doc_a
            JOIN documents sb ON sb.doc_id = vp.doc_b)
      SELECT src1, src2, count(*) AS n_pairs
      FROM j GROUP BY src1, src2 ORDER BY src1, src2"""))

  /** q56: duplicate-cluster resolution — connected components over the
    * verified near-dup pair graph, so each duplicate CLUSTER (not just
    * pair) keeps exactly one root doc. Spark side: iterative min-label
    * propagation (the standard distributed CC algorithm: one equi-join +
    * min-agg per round, rounds bounded by component diameter — dup
    * clusters are shallow, so 2-4 rounds). Oracle: recursive-CTE
    * transitive closure in DuckDB. */
  /** (cluster_root, doc_id) membership via min-label propagation —
    * shared by q56 and the survivor selection q69. */
  private[graft] def clustersDf(s: SparkSession, d: String,
      bucketCap: Option[Long] = Some(BandBucketCap)): DataFrame = {
      val pairs = graft.CacheScope.cached(
        verifiedPairs(s, d, bucketCap).select("doc_a", "doc_b"))
      val out = clustersFromPairs(pairs)
      pairs.unpersist()
      out
  }

  /** Min-label propagation over an explicit (doc_a, doc_b) pair frame —
    * factored out so a caller that already holds (and caches) the
    * verified pairs (q261's edge-quality join) shares one pair build
    * with the clustering instead of recomputing the LSH machinery. */
  private[graft] def clustersFromPairs(pairs: DataFrame): DataFrame = {
      val edges = graft.CacheScope.cached(pairs
        .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("a", "b"))
      // Iterative plans leak two ways at scale: cached frames that are
      // never unpersisted, and a lineage tree that deepens every round
      // (planning cost + stack depth). localCheckpoint truncates the
      // lineage each round; the superseded round's frame is unpersisted
      // once `changed` has consumed it.
      var labels = edges.select(col("a").as("doc")).distinct()
        .withColumn("label", col("doc")).localCheckpoint()
      var changed = 1L
      var rounds = 0
      // Convergence is read off the label SUM: labels only ever
      // decrease (min-propagation), so Σlabel is strictly decreasing
      // until the fixed point — comparing two 1-row exact decimal sums
      // replaces the old per-round next-vs-labels equi-join (one full
      // join job per round gone, same termination decision). decimal
      // (38,0): doc_ids are 61-bit hashes elsewhere in this repo, so a
      // bigint Σ could overflow past ~4 nodes; 38 digits hold 10^12
      // nodes of 2^61 labels exactly.
      // A null Σ is only legal for an EMPTY frame (sum over zero rows);
      // over a non-empty frame it means decimal(38,0) overflow under
      // non-ANSI or a null-label regression — and two consecutive null
      // sums would compare equal and end the loop with unconverged
      // labels. Fail loudly instead (the count rides the same 1-row agg).
      val sumOf = (df: DataFrame) => {
        val r = df.agg(sum(col("label").cast(DecimalType(38, 0))),
          count(lit(1))).head
        val s = r.getDecimal(0)
        if (s == null && r.getLong(1) != 0L) throw new IllegalStateException(
          "clustersFromPairs: null label sum over a non-empty frame " +
            "(decimal overflow or null labels) — convergence would silently pass")
        s
      }
      // No initial sum job: round 1 ALWAYS strictly decreases Σlabel on
      // a non-empty edge set (edges are symmetrized, so the max-id node
      // of any ≥2-node component adopts a smaller neighbour label), and
      // on an empty set both sums are null — so a null sentinel makes
      // the identical termination decision one aggregate job cheaper.
      // (A pure-self-loop graph — which pair builders can't produce,
      // doc_a < doc_b — would cost one extra no-op round, not a wrong
      // answer: the fixed point compares equal next round.)
      var prevSum: java.math.BigDecimal = null
      while (changed > 0 && rounds < 50) {
        // min over (own label ∪ neighbours' labels) as ONE aggregate:
        // the union row replaces the old left-join-back onto labels —
        // one join per round instead of two, bit-identical labels.
        val next = edges.join(labels, edges("b") === labels("doc"))
          .select(col("a").as("doc"), col("label"))
          .unionByName(labels)
          .groupBy("doc").agg(min(col("label")).as("label"))
          .localCheckpoint()
        val newSum = sumOf(next)
        // null Σ ⇒ empty label frame ⇒ empty graph: done. Otherwise a
        // null prevSum is the round-1 sentinel (always changed).
        changed = if (newSum == null ||
          (prevSum != null && newSum.compareTo(prevSum) == 0)) 0L else 1L
        prevSum = newSum
        labels.unpersist()
        labels = next
        rounds += 1
      }
      edges.unpersist()
      labels.select(col("label").as("cluster_root"), col("doc").as("doc_id"))
  }

  /** SQL chain producing the `clusters(cluster_root, doc_id)` CTE
    * (recursive transitive closure; shared by q56/q69/q81 oracles).
    * Carries the same [[BandBucketCap]] as the Spark side, so both
    * engines drop the identical hot buckets before pairing. */
  private[operators] val sqlClustersChain: String =
    s"""${sqlVerified(Some(BandBucketCap))},
      pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      nodes AS (SELECT DISTINCT a AS doc FROM edges),
      clusters AS (
        SELECT least(n.doc, min(r.b)) AS cluster_root, n.doc AS doc_id
        FROM nodes n JOIN reach r ON r.a = n.doc GROUP BY n.doc)"""

  val dupClusters: Q = Q(
    "q56_dedup_clusters",
    (s, d) => clustersDf(s, d).orderBy("cluster_root", "doc_id"),
    Some(s"""WITH RECURSIVE $sqlClustersChain
      SELECT cluster_root, doc_id FROM clusters
      ORDER BY cluster_root, doc_id"""))

  /** q261 — dup-cluster QUALITY audit: the transitive closure behind
    * q56 merges any docs connected by a chain of verified pairs, so a
    * cluster can legitimately contain documents that were never
    * directly compared — the "overreach" every consumer of cluster
    * membership (q69 survivor choice, q172 soft-dedup weights, q196
    * canonical selection, q197 split atomicity) silently trusts. Per
    * cluster: member count, verified-edge count, edge density vs the
    * clique bound in exact ppm, a clique bit, and the min / exact-mean
    * verified jaccard over its edges. A clique at high min-jaccard is
    * a true duplicate set; a low-density chain with a weak min edge is
    * template drift glued by hubs — the clusters to re-verify before
    * deleting all-but-one member at 100 TB.
    *
    * Scale shape: ONE cached pair build (the q37 banded machinery)
    * shared by the clustering iteration AND the edge-quality join —
    * [[clustersFromPairs]] exists for exactly this; on top, two
    * cluster-keyed aggregates and one |clusters|-row join. Density and
    * the clique bit are exact integer arithmetic; the mean jaccard is
    * the [[graft.Dsl.davg]] exact-decimal mean. */
  val clusterQuality: Q = Q(
    "q261_cluster_quality",
    (s, d) => {
      val pairs = graft.CacheScope.cached(
        verifiedPairs(s, d, Some(BandBucketCap))
          .select("doc_a", "doc_b", "jaccard"))
      val clusters = clustersFromPairs(pairs.select("doc_a", "doc_b"))
      val mem = clusters.groupBy("cluster_root")
        .agg(count(lit(1)).as("n_members"))
      val edges = pairs
        .join(clusters.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .groupBy("cluster_root")
        .agg(count(lit(1)).as("n_edges"),
          min(col("jaccard")).as("min_jaccard"),
          davg(col("jaccard")).as("avg_jaccard"))
      mem.join(edges, "cluster_root")
        .select(col("cluster_root"), col("n_members"), col("n_edges"),
          expr("n_edges * 2000000 div (n_members * (n_members - 1))")
            .as("density_ppm"),
          when(col("n_edges") * 2 === col("n_members") * (col("n_members") - 1),
            1L).otherwise(0L).as("is_clique"),
          col("min_jaccard"), col("avg_jaccard"))
        .orderBy("cluster_root")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      edj AS (SELECT c.cluster_root, p.jaccard
        FROM (SELECT doc_a, doc_b, jaccard FROM verified
              WHERE jaccard >= 0.8) p
        JOIN clusters c ON c.doc_id = p.doc_a),
      mem AS (SELECT cluster_root, cast(count(*) as bigint) AS n_members
        FROM clusters GROUP BY 1),
      edg AS (SELECT cluster_root, cast(count(*) as bigint) AS n_edges,
          min(jaccard) AS min_jaccard,
          ${graft.Dsl.sqlDavg("jaccard")} AS avg_jaccard
        FROM edj GROUP BY 1)
      SELECT m.cluster_root, m.n_members, e.n_edges,
        e.n_edges * 2000000 // (m.n_members * (m.n_members - 1))
          AS density_ppm,
        cast(CASE WHEN e.n_edges * 2 = m.n_members * (m.n_members - 1)
          THEN 1 ELSE 0 END as bigint) AS is_clique,
        e.min_jaccard, e.avg_jaccard
      FROM mem m JOIN edg e USING (cluster_root)
      ORDER BY m.cluster_root"""),
    bench = true)

  /** q69: survivor selection — per duplicate cluster keep the doc with
    * the most characters (tie: lowest doc_id). The per-cluster argmax is
    * a row_number-filter, i.e. the custom TopKPerGroup exec with k=1. */
  val dedupSurvivors: Q = Q(
    "q69_dedup_survivors",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val members = clustersDf(s, d)
        .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
      val w = Window.partitionBy(col("cluster_root"))
        .orderBy(desc("n_chars"), asc("doc_id"))
      members
        .withColumn("rn", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_root"))))
        .filter(col("rn") === 1)
        .select("cluster_root", "doc_id", "n_chars", "n_members")
        .orderBy("cluster_root")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      members AS (SELECT c.cluster_root, c.doc_id, d.n_chars
        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
      ranked AS (SELECT cluster_root, doc_id, n_chars,
          row_number() OVER (PARTITION BY cluster_root
            ORDER BY n_chars DESC, doc_id) AS rn,
          count(*) OVER (PARTITION BY cluster_root) AS n_members
        FROM members)
      SELECT cluster_root, doc_id, n_chars, n_members FROM ranked
      WHERE rn = 1 ORDER BY cluster_root"""))

  private val SimBits = 32

  /** SimHash per doc: token-level 61-bit hashes, per-bit majority vote
    * over the low 32 bits, reassembled into a BIGINT. */
  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id")) // parallelize per-token hashing
      .select(col("doc_id"), explode(toks(col("text"))).as("tk"))
      .withColumn("h", md5h61(col("tk")))
    val votes = (0 until SimBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b"))
    val voted = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val assembled = (0 until SimBits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    voted.select(col("doc_id"), assembled.as("simhash"))
  }

  private val sqlSimhash = {
    val votes = (0 until SimBits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(", ")
    val assemble = (0 until SimBits).map(b =>
      s"CASE WHEN v$b > 0 THEN cast(${1L << b} as bigint) ELSE 0 END").mkString(" + ")
    s"""tok AS (SELECT doc_id, unnest(${sqlToks("text")}) AS tk FROM documents),
       hs AS (SELECT doc_id, ${sqlMd5h61("tk")} AS h FROM tok),
       votes AS (SELECT doc_id, $votes FROM hs GROUP BY doc_id),
       sim AS (SELECT doc_id, $assemble AS simhash FROM votes)"""
  }

  /** q38: the simhash signature table. */
  val simhashSignatures: Q = Q(
    "q38_simhash_signatures",
    (s, d) => simhashDf(s, d).orderBy("doc_id"),
    Some(s"WITH $sqlSimhash SELECT doc_id, simhash FROM sim ORDER BY doc_id"))

  /** q39: SimHash near-dup pairs. Blocking: split the 32-bit simhash into
    * 4 byte-chunks; any pair within hamming distance 3 shares at least one
    * chunk (pigeonhole), so candidates come from 4 equi-join buckets, not
    * a cross join. Verified with bit_count(xor) <= 3. */
  val simhashPairs: Q = Q(
    "q39_simhash_pairs",
    (s, d) => {
      val sim = graft.CacheScope.cached(simhashDf(s, d))
      val chunks = sim.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), 8 * c).bitwiseAND(lit(255L))): _*))
          .as(Seq("chunk_id", "ck")))
      val a = chunks.as("a"); val b = chunks.as("b")
      a.join(b,
        col("a.chunk_id") === col("b.chunk_id") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $sqlSimhash,
      chunks AS (SELECT doc_id, simhash, c AS chunk_id,
          (simhash >> (8 * c)) & 255 AS ck
        FROM sim, (SELECT unnest([0,1,2,3]) AS c)),
      pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(bit_count(xor(a.simhash, b.simhash)) as int) AS hamming
        FROM chunks a JOIN chunks b
          ON a.chunk_id = b.chunk_id AND a.ck = b.ck AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, hamming FROM pairs
      WHERE hamming <= 3 ORDER BY doc_a, doc_b"""))

  /** q76: direct n-gram Jaccard near-dup pairs — the exact-similarity
    * sibling of MinHash-LSH (q37). Every pair with jaccard > 0 shares at
    * least one shingle, so the shingle-hash equi-join enumerates ALL
    * candidate pairs and the per-pair match count IS the exact
    * intersection size (shingle sets are distinct) — no join-back, no
    * approximation. Scale notes: the join shuffles on the 61-bit shingle
    * hash (not the raw string), AQE skew-join splits hot shingles; a
    * production run at 100 TB would additionally prefix-filter
    * (drop shingles with document frequency above a cap) to bound the
    * per-bucket pair count — elided here so the oracle semantics stay
    * exact. */
  val ngramJaccardPairs: Q = Q(
    "q76_ngram_jaccard_pairs",
    (s, d) => {
      val sets = graft.CacheScope.cached(shingleSets(s, d))
      val ex = sets.select(col("doc_id"), explode(col("sh")).as("sg"))
        .select(col("doc_id"), md5h61(col("sg")).as("h"))
      val a = ex.as("a"); val b = ex.as("b")
      val inter = a.join(b,
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
      val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            (col("sa.sz") + col("sb.sz") - col("n_shared"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $sqlShingleSets,
      ex AS (SELECT doc_id, ${sqlMd5h61("sg")} AS h
        FROM (SELECT doc_id, unnest(sh) AS sg FROM sets)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(count(*) as bigint) AS n_shared
        FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sz AS (SELECT doc_id, cast(len(sh) as bigint) AS sz FROM sets)
      SELECT doc_a, doc_b, n_shared,
        cast(n_shared as double) / (sa.sz + sb.sz - n_shared) AS jaccard
      FROM inter JOIN sz sa ON doc_a = sa.doc_id
                 JOIN sz sb ON doc_b = sb.doc_id
      WHERE cast(n_shared as double) / (sa.sz + sb.sz - n_shared) >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** Document-frequency cap for [[ngramJaccardDfCap]]: shingles present
    * in more than this many documents are dropped before the pair join. */
  private[graft] val DfCap = 16L

  /** Exact intersection sizes over the df-capped candidate universe —
    * the shared engine of q121 (Jaccard) and q149 (containment).
    * Returns (sets, inter(doc_a, doc_b, n_shared)); both frames are
    * CacheScope-registered.
    *
    * Candidates are pairs sharing ≥1 CAPPED shingle (df in [2, DfCap]
    * — df = 1 cannot pair, df > DfCap is boilerplate and generates no
    * candidates, bounding every join bucket's fanout at DfCap²/2).
    * n_shared is then EXACT over the FULL shingle sets via an exact
    * decomposition instead of a full join-back: every shared shingle
    * has df ≤ DfCap or df > DfCap, so
    *   n_shared = n_capped + n_hot,
    * where n_capped falls out of the SAME equi-join that enumerates
    * candidates (group the per-shingle collisions by pair — no
    * .distinct() pass, no re-join), and n_hot joins the candidate keys
    * back through ONLY the hot slice of the postings (df > DfCap).
    * The hot slice is the point: the old form joined every candidate
    * pair back through ALL its postings — ~|cand| × avg_df rows (49M
    * at sf0.1) — while the hot slice is a few percent of postings in
    * ANY corpus shape (here 12k of 260k instances; in a power-law
    * corpus smaller still), so the join-back shrinks by the same
    * factor (measured ~20×). Each emitted pair still matches q76
    * bit-for-bit; the only deviation is recall (a pair is missed iff
    * its entire overlap is above-cap boilerplate). */
  private def cappedPairIntersections(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val sets = graft.CacheScope.cached(shingleSets(s, d))
    val ex = graft.CacheScope.cached(
      sets.select(col("doc_id"), explode(col("sh")).as("sg"))
        .select(col("doc_id"), md5h61(col("sg")).as("h")))
    // dfs cached: keep and hot each consumed the vocabulary aggregate
    // (the exchange was reused but the aggregate re-ran per branch);
    // (h, df) is two longs per shingle TYPE.
    val dfs = graft.CacheScope.cached(
      ex.groupBy("h").agg(count(lit(1)).as("df")))
    val keep = dfs.filter(col("df") <= DfCap && col("df") >= 2).select("h")
    val hot = dfs.filter(col("df") > DfCap).select("h")
    val exf = ex.join(keep, "h")
    // pc cached: it feeds BOTH the hot join-back (as bare candidate
    // keys) and the final n_capped + n_hot merge, and column pruning
    // drops n_capped from the first consumer's aggregate — the
    // subtrees de-canonicalize and the ENTIRE candidate self-join ran
    // twice (r18 plan audit: two full BHJ-chain + pair-aggregate
    // pipelines). (doc_a, doc_b, n_capped) is three longs per
    // CANDIDATE pair — the df-cap bounds it, the q143 narrow-proxy
    // cache discipline applies.
    val pc = graft.CacheScope.cached(exf.as("a").join(exf.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_capped")))
    val exHot = ex.join(hot, "h")
    val nh = pc.select("doc_a", "doc_b")
      .join(exHot.as("ea"), col("doc_a") === col("ea.doc_id"))
      .join(exHot.as("eb"),
        col("doc_b") === col("eb.doc_id") && col("ea.h") === col("eb.h"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_hot"))
    val inter = pc.join(nh, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        (col("n_capped") + coalesce(col("n_hot"), lit(0L))).as("n_shared"))
    (sets, inter)
  }

  /** SQL twin of [[cappedPairIntersections]]: CTE chain ending in
    * `inter(doc_a, doc_b, n_shared)` and `sz(doc_id, sz)` (expects
    * `sets` from [[sqlShingleSets]]). MATERIALIZED where referenced
    * twice (the DuckDB CTE-inlining trap). */
  private val sqlCappedInterChain: String =
    s"""ex AS MATERIALIZED (SELECT doc_id, ${sqlMd5h61("sg")} AS h
        FROM (SELECT doc_id, unnest(sh) AS sg FROM sets)),
      dfs AS MATERIALIZED (SELECT h, count(*) AS df FROM ex GROUP BY h),
      exf AS (SELECT ex.doc_id, ex.h FROM ex
        JOIN (SELECT h FROM dfs WHERE df <= $DfCap AND df >= 2) keep
          USING (h)),
      pc AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(count(*) as bigint) AS n_capped
        FROM exf a JOIN exf b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      exh AS MATERIALIZED (SELECT ex.doc_id, ex.h FROM ex
        JOIN (SELECT h FROM dfs WHERE df > $DfCap) hot USING (h)),
      nh AS (SELECT p.doc_a, p.doc_b, cast(count(*) as bigint) AS n_hot
        FROM pc p JOIN exh ea ON ea.doc_id = p.doc_a
                  JOIN exh eb ON eb.doc_id = p.doc_b AND eb.h = ea.h
        GROUP BY 1, 2),
      inter AS (SELECT pc.doc_a, pc.doc_b,
          pc.n_capped + coalesce(nh.n_hot, 0) AS n_shared
        FROM pc LEFT JOIN nh
          ON pc.doc_a = nh.doc_a AND pc.doc_b = nh.doc_b),
      sz AS (SELECT doc_id, cast(len(sh) as bigint) AS sz FROM sets)"""

  /** q121: the production guard q76's comment defers — prefix df-cap
    * near-dup pairing over [[cappedPairIntersections]]'s candidate
    * universe and exact intersection decomposition. */
  val ngramJaccardDfCap: Q = Q(
    "q121_ngram_jaccard_dfcap",
    (s, d) => {
      val (sets, inter) = cappedPairIntersections(s, d)
      val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            (col("sa.sz") + col("sb.sz") - col("n_shared"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $sqlShingleSets,
      $sqlCappedInterChain
      SELECT doc_a, doc_b, n_shared,
        cast(n_shared as double) / (sa.sz + sb.sz - n_shared) AS jaccard
      FROM inter JOIN sz sa ON doc_a = sa.doc_id
                 JOIN sz sb ON doc_b = sb.doc_id
      WHERE cast(n_shared as double) / (sa.sz + sb.sz - n_shared) >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** q149 — ASYMMETRIC containment pairs (Broder 1997's containment,
    * the companion resemblance misses): C(A→B) = |S(A)∩S(B)| / |S(A)|
    * over distinct 3-gram shingles. A short doc wholly quoted inside a
    * much larger one scores containment ≈ 1 while its Jaccard
    * (q76/q121) stays far below any sane threshold — the
    * quote/repost/wrapper-page shape a production dedup stack handles
    * with exactly this score. Candidates come from the q121 df-capped
    * shingle universe (bounded join fanout: a shingle in more than
    * [[DfCap]] docs is boilerplate and generates no candidates), the
    * intersection is EXACT over the full shingle sets via the
    * candidate-restricted join-back, and each unordered pair is then
    * scored in BOTH directions (a 2× explode of the tiny pair frame —
    * linear in candidates, which the cap bounds). Emitted when
    * containment ≥ 0.8; recall deviation identical to q121's (a pair
    * is missed iff its entire overlap is above-cap boilerplate). */
  val containmentPairs: Q = Q(
    "q149_containment_pairs",
    (s, d) => {
      val (sets, inter) = cappedPairIntersections(s, d)
      val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(explode(array(
          struct(col("doc_a").as("contained_doc"),
            col("doc_b").as("container_doc"), col("n_shared"),
            (col("n_shared").cast("double") / col("sa.sz"))
              .as("containment")),
          struct(col("doc_b").as("contained_doc"),
            col("doc_a").as("container_doc"), col("n_shared"),
            (col("n_shared").cast("double") / col("sb.sz"))
              .as("containment")))).as("e"))
        .select(col("e.contained_doc").as("contained_doc"),
          col("e.container_doc").as("container_doc"),
          col("e.n_shared").as("n_shared"),
          col("e.containment").as("containment"))
        .filter(col("containment") >= 0.8)
        .orderBy("contained_doc", "container_doc")
    },
    Some(s"""WITH $sqlShingleSets,
      $sqlCappedInterChain,
      j AS (SELECT doc_a, doc_b, n_shared, sa.sz AS sz_a, sb.sz AS sz_b
        FROM inter JOIN sz sa ON doc_a = sa.doc_id
                   JOIN sz sb ON doc_b = sb.doc_id),
      dir AS (
        SELECT doc_a AS contained_doc, doc_b AS container_doc, n_shared,
          cast(n_shared as double) / sz_a AS containment FROM j
        UNION ALL
        SELECT doc_b, doc_a, n_shared,
          cast(n_shared as double) / sz_b FROM j)
      SELECT contained_doc, container_doc, n_shared, containment
      FROM dir WHERE containment >= 0.8
      ORDER BY contained_doc, container_doc"""),
    bench = true)

  /** Jaccard threshold for [[prefixJaccardJoin]] as the exact integer
    * ratio `PfNum/PfDen` (0.7) — every admission guard and the final
    * threshold compare run in integer arithmetic on both engines, so
    * no float boundary can diverge them. */
  private val PfNum = 7L
  private val PfDen = 10L

  /** q165 — EXACT set-similarity join by prefix filtering (Chaudhuri,
    * Ganti, Kaushik ICDE'06; Bayardo, Ma, Srikant WWW'07 "All-Pairs";
    * Xiao et al. WWW'08 PPJoin): all pairs with shingle Jaccard ≥ 0.7,
    * with ZERO recall loss — the exactness q121's df-cap trades away.
    * Reference behavior: feature_extractor.py:47-54 re-runs
    * drop_duplicates over the whole accumulated frame (exact dedup);
    * this is the exact NEAR-dup analogue at corpus scale.
    *
    * The trick: order every doc's shingles by one GLOBAL rarest-first
    * total order (df asc, h asc). If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉
    * and ≥ ⌈τ·|B|⌉, so A and B must share a shingle within their first
    * |X| − ⌈τ·|X|⌉ + 1 shingles under that order — the candidate join
    * runs over PREFIXES only (~30% of postings at τ=0.7), and because
    * the order is rarest-FIRST, the prefixes hold the rarest shingles:
    * hot boilerplate lands in suffixes and never generates a
    * candidate, which is what bounds bucket fanout at 100 TB (the same
    * boilerplate q121 must cap away — here it prunes itself, exactly).
    * The τ·max ≤ min length guard prunes cross-size pairs inside the
    * join condition. n_shared is then EXACT over the full sets via the
    * candidate-restricted join-back (the q149 discipline), and the
    * final threshold is the integer compare
    * n·PfDen ≥ PfNum·(|A|+|B|−n). Oracle = the BRUTE-FORCE all-pairs
    * join, so any prefix-pruning bug surfaces as a hash mismatch, not
    * a silent recall dip. */
  /** EXACT Jaccard pairs at threshold ≥ [[PfNum]]/[[PfDen]] via the
    * prefix-filter join — (doc_a, doc_b, n_shared, sz_a, sz_b,
    * jaccard), unordered. The q165 machinery, factored so q180's
    * recall harness can reuse the exact truth set at a tighter
    * threshold (the τ=0.7 prefix admits every pair ≥ 0.7, so any
    * filter at τ' ≥ 0.7 over this frame is still EXACT). */
  private def exactPairsDf(s: SparkSession, d: String): DataFrame = {
    val sets = graft.CacheScope.cached(shingleSets(s, d))
    val ex = graft.CacheScope.cached(
      sets.select(col("doc_id"), explode(col("sh")).as("sg"))
        .select(col("doc_id"), md5h61(col("sg")).as("h")))
    val dfs = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val srt = ex.join(dfs, "h")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("doc_id"), size(col("ord")).cast("long").as("sz"),
        transform(col("ord"), x => x.getField("h")).as("hs"))
    // pref cached: the candidate self-join consumes it on BOTH sides
    // and the broadcast build side otherwise re-runs the whole srt
    // pipeline (df join + per-doc collect_list + sort) a second time
    // (r18 plan audit: two ObjectHashAggregate(collect_list) subtrees).
    // (doc_id, sz, h) is three longs per PREFIX posting — the q149
    // narrow-proxy cache discipline.
    val pref = graft.CacheScope.cached(srt.select(col("doc_id"), col("sz"),
      explode(slice(col("hs"), lit(1),
        expr(s"cast(sz - ((sz * $PfNum + ${PfDen - 1}) div $PfDen) + 1 as int)")))
        .as("h")))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * PfNum <= col("b.sz") * PfDen &&
          col("b.sz") * PfNum <= col("a.sz") * PfDen)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = cand
      .join(ex.as("ea"), col("doc_a") === col("ea.doc_id"))
      .join(ex.as("eb"),
        col("doc_b") === col("eb.doc_id") && col("ea.h") === col("eb.h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
    val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
    inter
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(col("n_shared") * PfDen >=
        (col("sa.sz") + col("sb.sz") - col("n_shared")) * PfNum)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("sa.sz").as("sz_a"), col("sb.sz").as("sz_b"),
        (col("n_shared").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("n_shared"))).as("jaccard"))
  }

  val prefixJaccardJoin: Q = Q(
    "q165_prefix_jaccard_join",
    (s, d) => exactPairsDf(s, d)
      .select("doc_a", "doc_b", "n_shared", "jaccard")
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $sqlShingleSets,
      ex AS MATERIALIZED (SELECT doc_id, ${sqlMd5h61("sg")} AS h
        FROM (SELECT doc_id, unnest(sh) AS sg FROM sets)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(count(*) as bigint) AS n_shared
        FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sz AS (SELECT doc_id, cast(len(sh) as bigint) AS sz FROM sets)
      SELECT doc_a, doc_b, n_shared,
        cast(n_shared as double) / (sa.sz + sb.sz - n_shared) AS jaccard
      FROM inter JOIN sz sa ON doc_a = sa.doc_id
                 JOIN sz sb ON doc_b = sb.doc_id
      WHERE n_shared * $PfDen >= (sa.sz + sb.sz - n_shared) * $PfNum
      ORDER BY doc_a, doc_b"""),
    bench = true)

  /** q168 — FUZZY test-set contamination: train docs near-duplicating an
    * eval doc (shingle Jaccard ≥ 0.5), found by BIPARTITE MinHash-band
    * blocking. q84 catches exact n-gram overlap; a reformatted or
    * lightly-paraphrased eval question (the contamination that actually
    * survives exact decontamination — Brown et al. 2020 §C document
    * fuzzy 13-gram scrubbing for exactly this reason) shares few exact
    * grams but keeps a high Jaccard, and MinHash bands catch it.
    *
    * Scale shape: candidates come ONLY from cross-side band-bucket
    * collisions (train × eval on (band_id, bh)) — the train×train
    * quadratic never materializes, and the eval side is tiny at
    * production scale, so the band join degenerates to a probe against
    * a broadcast-scale eval band index (the q159 admit discipline,
    * bipartite). Verification is exact Jaccard over the full shingle
    * sets, restricted to candidates; the ≥ 0.5 admission is the
    * integer compare 3·n ≥ |A|+|B|. Recall boundary (inherent to LSH,
    * same as q37): a true pair is missed iff NO band collides —
    * P(miss) = (1 − J²)^8, ≈ 9% at J = 0.5, falling fast toward 0 as
    * J → 1; the oracle replays the same bands, so the boundary is
    * deterministic, not a flake. */
  val fuzzyContamination: Q = Q(
    "q168_fuzzy_contamination",
    (s, d) => {
      val enriched = graft.CacheScope.cached(signedSets(s, d))
      // cached (r18): eval and train branches each re-ran the 8-band
      // md5 projection over the fat signed-sets cache otherwise
      val bandsAll = graft.CacheScope.cached(enriched.select(col("doc_id"),
        posexplode(array((0 until Bands).map(bandCol): _*))
          .as(Seq("band_id", "bh"))))
      val evalB = bandsAll.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_doc"), col("band_id"), col("bh"))
      val trainB = bandsAll.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("train_doc"), col("band_id"), col("bh"))
      val cand = trainB.join(evalB, Seq("band_id", "bh"))
        .select("train_doc", "eval_doc").distinct()
      val x = enriched.as("x"); val y = enriched.as("y")
      val inter = size(array_intersect(col("x.sh"), col("y.sh")))
      cand
        .join(x, col("train_doc") === col("x.doc_id"))
        .join(y, col("eval_doc") === col("y.doc_id"))
        .select(col("train_doc"), col("eval_doc"),
          inter.cast("long").as("n_shared"),
          (size(col("x.sh")) + size(col("y.sh"))).cast("long").as("sz2"),
          (inter.cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) - inter)).as("jaccard"))
        .filter(col("n_shared") * 3 >= col("sz2"))
        .select("train_doc", "eval_doc", "n_shared", "jaccard")
        .orderBy("train_doc", "eval_doc")
    },
    Some(s"""WITH $sqlShingleSets, $sqlSignatures,
      bands AS MATERIALIZED ($sqlBandsAll),
      cand AS (SELECT DISTINCT t.doc_id AS train_doc, e.doc_id AS eval_doc
        FROM bands t JOIN bands e
          ON t.band_id = e.band_id AND t.bh = e.bh
        WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0),
      v AS (SELECT c.train_doc, c.eval_doc,
          cast(len(list_intersect(p.sh, q.sh)) as bigint) AS n_shared,
          len(p.sh) + len(q.sh) AS sz2,
          cast(len(list_intersect(p.sh, q.sh)) as double) /
            (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)))
            AS jaccard
        FROM cand c JOIN sets p ON p.doc_id = c.train_doc
                    JOIN sets q ON q.doc_id = c.eval_doc)
      SELECT train_doc, eval_doc, n_shared, jaccard
      FROM v WHERE 3 * n_shared >= sz2
      ORDER BY train_doc, eval_doc"""))

  /** q127: incremental ingest dedup — the nightly-batch shape every
    * growing corpus needs: documents split into an existing corpus
    * (doc_id % 10 < 8) and a new batch; a new doc is admitted iff its
    * content fingerprint is absent from the corpus (left-anti equi-join
    * on the 61-bit hash — at scale only the fingerprint column of the
    * corpus is read, never its text) AND it is the first occurrence
    * within its own batch (min doc_id per fingerprint, with the
    * batch-internal duplicate count as the audit column). */
  val incrementalDedup: Q = Q(
    "q127_incremental_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5h61(col("text")).as("fp"))
      val existing = docs.filter(col("doc_id") % 10 < 8).select("fp")
      val batch = docs.filter(col("doc_id") % 10 >= 8)
      batch.join(existing, Seq("fp"), "left_anti")
        .groupBy("fp")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_batch_dups"))
        .select("doc_id", "fp", "n_batch_dups")
        .orderBy("doc_id")
    },
    Some(s"""WITH docs AS (
        SELECT doc_id, ${sqlMd5h61("text")} AS fp FROM documents),
      batch AS (SELECT doc_id, fp FROM docs WHERE doc_id % 10 >= 8)
      SELECT min(doc_id) AS doc_id, fp, count(*) AS n_batch_dups
      FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM docs e
        WHERE e.doc_id % 10 < 8 AND e.fp = b.fp)
      GROUP BY fp ORDER BY doc_id"""))

  /** q143: substring-level dedup — exact repeated-SPAN detection, the
    * standard complement to document-level MinHash ("Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022;
    * suffix-array ExactSubstr there, shingle-window hashing here — the
    * shuffle-friendly equivalent). Every k-token window (k=25; docs are
    * 10-99 tokens in testdata — production corpora would use ~50) is
    * hashed; a window duplicated across ≥2 DISTINCT documents marks its
    * positions; runs of consecutive duplicated positions merge into
    * maximal removal spans (gaps-and-islands: pos − row_number is
    * constant within a run). Output is the removal list
    * (doc_id, span_start, span_end) in 1-based token indices.
    *
    * Scale shape: windowing is doc-local (one transform over the token
    * array — the window STRING is hashed and dropped inside the same
    * projection, so the shuffle carries (doc_id, pos, h), never text);
    * the df aggregate is one shuffle on the 61-bit hash with map-side
    * partial agg; the position join is an equi-join on h (never a pair
    * join — cost is linear in corpus size, unlike q76's candidate
    * pairs); the islands window partitions BY doc_id, so no global
    * sort. The q136 novelty scorer shares this skeleton. */
  /** Shared window width for the substring-dedup pair q143/q145 (docs
    * are 10-99 tokens in testdata — production corpora would use ~50). */
  private val WinK = 25

  val substringDedup: Q = {
    val K = WinK
    Q(
      "q143_substring_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.TextFunctions.register(s)
        val docs = Tables.documents(s, d)
          // spread the per-row windowing across cores (documents parquet
          // arrives in O(1) partitions; cf. shingleSets)
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("doc_id"))
          .select(col("doc_id"), toks(col("text")).as("t"))
          .filter(size(col("t")) >= K)
        val winArr = transform(sequence(lit(1), size(col("t")) - (K - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(K))))
        // Materialize the window hashes ONCE (h-partitioned, cached):
        // without this the df-count branch and the probe branch each
        // re-ran tokenize + posexplode + md5h61 above the shared
        // doc_id exchange (only the raw-text exchange was reused —
        // measured: every window hashed TWICE; a bare shared
        // h-exchange cannot fix it because column pruning drops `pos`
        // from the aggregate branch and de-canonicalizes the
        // subtrees). The cached frame is the narrow (doc_id, pos, h)
        // proxy — 24 B/row, the signedSets discipline — and caching
        // AFTER the h-repartition lets the groupBy(h) on top run
        // exchange-free off the cache's preserved partitioning.
        val wins = graft.CacheScope.cached(docs
          .select(col("doc_id"), posexplode(winArr).as(Seq("pos0", "win")))
          .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
            md5h61(col("win")).as("h"))
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("h")))
        val dupHashes = wins.groupBy("h")
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select("h")
        val dupPos = wins.join(dupHashes, "h").select("doc_id", "pos")
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        dupPos
          .withColumn("grp", col("pos") - row_number().over(byDoc))
          .groupBy("doc_id", "grp")
          .agg(min(col("pos")).as("span_start"),
            (max(col("pos")) + (K - 1)).as("span_end"),
            count(lit(1)).as("n_windows"))
          .select("doc_id", "span_start", "span_end", "n_windows")
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH t AS (
          SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
        tt AS (SELECT doc_id, t FROM t WHERE len(t) >= $K),
        w AS (SELECT doc_id, i AS pos,
            ${sqlMd5h61(s"array_to_string(t[i:i+$K-1], ' ')")} AS h
          FROM tt, unnest(generate_series(1, len(t)-$K+1)) AS u(i)),
        dh AS (SELECT h FROM
          (SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h)
          WHERE nd >= 2),
        p AS (SELECT doc_id, pos FROM w JOIN dh USING (h)),
        g AS (SELECT doc_id, pos,
            pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM p)
        SELECT doc_id, min(pos) AS span_start,
          max(pos) + $K - 1 AS span_end, count(*) AS n_windows
        FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start"""),
      bench = true)
  }

  /** q145: substring removal APPLIED — the output side of q143, with
    * the Lee et al. keep-first policy at window granularity: for every
    * cross-doc duplicated window, the copy in the SMALLEST doc_id
    * survives and every other occurrence is excised, so exactly one
    * copy of each repeated passage remains in the corpus (q143 only
    * reports spans; this emits the cleaned text). All docs appear in
    * the output — short and untouched ones pass through verbatim.
    *
    * Scale shape: keeper selection is `groupBy(h).agg(min(doc_id))`
    * joined back on h — NOT `min(doc_id) OVER (PARTITION BY h)`. A
    * window function buffers every row of a partition in ONE task with
    * no AQE skew splitting and no map-side partials, so a boilerplate
    * span repeated in millions of docs (exactly the corpus shape this
    * operator exists to clean) would route millions of (doc_id,pos,h)
    * rows through a single straggler task. The aggregate form collapses
    * each hot hash to one row per map task before the shuffle, and the
    * join-back is AQE-skew-eligible; `doc_id > keeper` ⟺ the hash spans
    * ≥2 docs and this is not the first copy. The double consumption of
    * `wins` is free: both branches hang off the same repartition
    * exchange (ReuseExchange — same discipline as q143's df-count
    * branch), so the documents scan still runs once.
    * The window index is GUARDED rather than filtered (short docs yield
    * an empty window array, cf. [[Dsl.shingles3]]) so every branch
    * hangs off ONE canonical exchange — a size-filter would be pushed
    * into only its own branch's scan and de-canonicalize the reuse (the
    * q133 trap). Net: a single documents scan (ReuseAudit-verified),
    * removal lists bounded by doc length, excision a doc-local array
    * filter. */
  val substringRemoval: Q = {
    val K = WinK
    Q(
      "q145_substring_removal",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        // isNotNull on the SHARED source, not per-branch: the final
        // left join pushes isnotnull(doc_id) into the removeAgg
        // branch's scan, which would de-canonicalize it from the other
        // two branches and break ReuseExchange (the q133 trap). With
        // the guard at the source all three scans are identical and the
        // optimizer prunes the join's now-redundant inferred filter.
        // Semantically a no-op: doc_id is the table's key.
        val docs = Tables.documents(s, d)
          .filter(col("doc_id").isNotNull)
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("doc_id"))
          .select(col("doc_id"), toks(col("text")).as("t"))
        val idx = when(size(col("t")) >= K,
          sequence(lit(1), size(col("t")) - (K - 1)))
          .otherwise(array().cast("array<int>"))
        val winArr = transform(idx,
          i => concat_ws(" ", slice(col("t"), i, lit(K))))
        val wins = docs
          .select(col("doc_id"), posexplode(winArr).as(Seq("pos0", "win")))
          .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
            md5h61(col("win")).as("h"))
        val keepers = wins.groupBy("h")
          .agg(min(col("doc_id")).as("keeper"))
        val removeAgg = wins.join(keepers, "h")
          .filter(col("doc_id") > col("keeper"))
          .groupBy("doc_id")
          .agg(collect_list(col("pos")).as("rp"))
        docs.join(removeAgg, Seq("doc_id"), "left")
          .withColumn("rp", coalesce(col("rp"), array().cast("array<long>")))
          .withColumn("kept", filter(sequence(lit(1), size(col("t"))),
            i => !exists(col("rp"),
              p => i >= p && i <= p + lit(K.toLong - 1))))
          .select(col("doc_id"),
            size(col("t")).as("n_before"),
            size(col("kept")).as("n_after"),
            concat_ws(" ",
              transform(col("kept"), i => element_at(col("t"), i))).as("cleaned"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
          SELECT doc_id, ${sqlToks("text")} AS t FROM documents
          WHERE doc_id IS NOT NULL),
        w AS (SELECT doc_id, i AS pos,
            ${sqlMd5h61(s"array_to_string(t[i:i+$K-1], ' ')")} AS h
          FROM t, unnest(generate_series(1, len(t)-$K+1)) AS u(i)),
        keep AS (SELECT h, min(doc_id) AS keeper FROM w GROUP BY h),
        rem AS (SELECT w.doc_id, w.pos FROM w JOIN keep USING (h)
          WHERE w.doc_id > keep.keeper),
        ra AS (SELECT doc_id, list(pos) AS rp FROM rem GROUP BY doc_id),
        k AS (SELECT t.doc_id, t.t,
            list_filter(generate_series(1, len(t.t)), i ->
              len(list_filter(coalesce(ra.rp, []), p ->
                i >= p AND i <= p + $K - 1)) = 0) AS kept
          FROM t LEFT JOIN ra ON t.doc_id = ra.doc_id)
        SELECT doc_id, cast(len(t) as int) AS n_before,
          cast(len(kept) as int) AS n_after,
          -- coalesce: duckdb array_to_string([]) is NULL, spark
          -- concat_ws of an empty array is '' (fully-excised docs)
          coalesce(array_to_string(list_transform(kept, i -> t[i]), ' '), '')
            AS cleaned
        FROM k ORDER BY doc_id"""),
      bench = true)
  }

  /** q152: paragraph-granularity dedup with document REASSEMBLY — the
    * RefinedWeb/Gopher discipline (Penedo et al. 2023 §3.3: exact
    * duplicated paragraphs are removed corpus-wide, the document is
    * kept with the surviving paragraphs stitched back in order). This
    * is the middle granularity between q35 (whole-document) and q143
    * (25-token windows): a boilerplate paragraph (footer, nav block,
    * license header) repeated across many docs survives ONLY at its
    * globally-first occurrence — keep-first at (doc_id, position)
    * granularity, so a paragraph repeated WITHIN one doc also keeps
    * only its first copy.
    *
    * The paragraph delimiter is a parameter. The registry instance
    * splits on the token `" the "`: the driver corpus encodes no
    * newlines, so the most frequent stopword stands in as the
    * paragraph break — every doc yields multiple segments at every SF
    * and split/dedup/reassembly are all exercised against the oracle
    * (a production corpus would pass `"\n\n"`; the plan is identical).
    *
    * Scale shape (the q145 skeleton at paragraph granularity): the
    * explode carries (doc_id, pidx, h, okey) — the 61-bit hash, never
    * paragraph text — so the keeper shuffle is content-free; keeper
    * selection is `groupBy(h).agg(min(okey))` + join-back (map-side
    * partials, AQE-skew-eligible — a window over a hot boilerplate
    * hash would buffer millions of rows in one task); reassembly
    * re-derives text doc-locally by filtering the original paragraph
    * array with the surviving index list, and the source is
    * isNotNull-guarded once so every branch hangs off ONE canonical
    * exchange (single documents scan, plan-pinned). The occurrence
    * key is a (doc_id, pidx) STRUCT min — lexicographic, exact for
    * any doc_id domain (arithmetic doc_id*10⁶+pidx packing would
    * silently misorder for negative or hash-derived 61-bit doc_ids,
    * exactly what md5h61 produces elsewhere in this repo). */
  private[graft] def paragraphDedup(delim: String)(
      s: SparkSession, d: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    val docs = Tables.documents(s, d)
      .filter(col("doc_id").isNotNull)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("doc_id"))
      .select(col("doc_id"),
        split(col("text"), java.util.regex.Pattern.quote(delim), -1).as("paras"))
    // posexplode_OUTER: semantically identical here (split() never
    // returns an empty or null array for non-null text), but the inner
    // form lets InferFiltersFromGenerate push `size(paras) > 0` below
    // the exchange into only THIS branch's scan, de-canonicalizing it
    // from the reassembly branch and doubling the documents scan (the
    // q133 trap, caught by the registry-wide scan-allowance sweep)
    val ex = docs
      .select(col("doc_id"), posexplode_outer(col("paras")).as(Seq("pidx", "para")))
      .select(col("doc_id"), col("pidx"),
        struct(col("doc_id"), col("pidx")).as("okey"),
        md5h61(col("para")).as("h"))
    val keep = ex.groupBy("h").agg(min(col("okey")).as("keeper"))
    val kp = ex.join(keep, "h")
      .filter(col("okey") === col("keeper"))
      .groupBy("doc_id")
      .agg(collect_list(col("pidx")).as("kp"))
    docs.join(kp, Seq("doc_id"), "left")
      .withColumn("kp", coalesce(col("kp"), array().cast("array<int>")))
      .withColumn("ki", filter(sequence(lit(0), size(col("paras")) - 1),
        i => array_contains(col("kp"), i)))
      .select(col("doc_id"),
        size(col("paras")).as("n_paras"),
        size(col("ki")).as("n_kept"),
        concat_ws(delim,
          transform(col("ki"), i => element_at(col("paras"), i + 1)))
          .as("cleaned"))
      .orderBy("doc_id")
  }

  private def sqlParagraphDedup(delim: String): String = {
    val dl = "'" + delim.replace("'", "''") + "'"
    s"""WITH t AS (SELECT doc_id, string_split(text, $dl) AS paras
        FROM documents WHERE doc_id IS NOT NULL),
      ex AS (SELECT doc_id, i - 1 AS pidx,
          row(doc_id, i - 1) AS okey,
          ${sqlMd5h61("paras[i]")} AS h
        FROM t, unnest(generate_series(1, len(paras))) AS u(i)),
      keep AS (SELECT h, min(okey) AS keeper FROM ex GROUP BY h),
      kp AS (SELECT doc_id, list(pidx ORDER BY pidx) AS kp
        FROM ex JOIN keep USING (h) WHERE okey = keeper GROUP BY doc_id),
      k AS (SELECT t.doc_id, t.paras, coalesce(kp.kp, []) AS kp
        FROM t LEFT JOIN kp ON t.doc_id = kp.doc_id)
      SELECT doc_id, cast(len(paras) as int) AS n_paras,
        cast(len(kp) as int) AS n_kept,
        -- coalesce: duckdb array_to_string([]) is NULL, spark
        -- concat_ws of an empty array is '' (fully-excised docs)
        coalesce(array_to_string(list_transform(kp, i -> paras[i + 1]), $dl),
          '') AS cleaned
      FROM k ORDER BY doc_id"""
  }

  /** Registry paragraph-break token — see [[paragraphDedup]]. */
  private[graft] val ParaDelim = " the "

  val paragraphDedupQ: Q = Q(
    "q152_paragraph_dedup",
    (s, d) => paragraphDedup(ParaDelim)(s, d),
    Some(sqlParagraphDedup(ParaDelim)),
    bench = true)

  /** q158: INCREMENTAL paragraph dedup — q127's nightly-batch shape at
    * q152's paragraph granularity: a batch paragraph survives iff its
    * hash is absent from the existing corpus (left-anti equi-join on
    * the 61-bit hash — at scale only the corpus's paragraph-hash
    * column is touched, never its text, the q127 argument) AND it is
    * the first occurrence within its own batch (min occurrence key),
    * then each batch doc is reassembled from its survivors in order.
    * Existing-corpus docs are never re-cleaned or re-emitted — the
    * whole point of the incremental shape. Split convention mirrors
    * q127: corpus = doc_id % 10 < 8, batch = the rest.
    *
    * Scale shape: the corpus side reduces to (h) before the anti-join
    * (content-free, map-side dedup via the anti-join's build side);
    * batch-internal keep-first is the q145/q152 aggregate+join-back;
    * reassembly is doc-local. The corpus/batch role split pushes its
    * doc_id % 10 predicate into per-branch scans (pruned re-reads are
    * the RIGHT plan here — cheaper than shuffling the corpus text
    * through one shared exchange; triaged in the scan-allowance
    * sweep, the q127 precedent). */
  val incrementalParagraphDedup: Q = Q(
    "q158_incremental_paragraph_dedup",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val docs = Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("doc_id"),
          split(col("text"),
            java.util.regex.Pattern.quote(ParaDelim), -1).as("paras"))
      val ex = docs
        .select(col("doc_id"),
          posexplode_outer(col("paras")).as(Seq("pidx", "para")))
        .select(col("doc_id"), col("pidx"),
          struct(col("doc_id"), col("pidx")).as("okey"),
          md5h61(col("para")).as("h"))
      val corpusH = ex.filter(col("doc_id") % 10 < 8).select("h")
      val batchEx = ex.filter(col("doc_id") % 10 >= 8)
      val fresh = batchEx.join(corpusH, Seq("h"), "left_anti")
      val keep = fresh.groupBy("h").agg(min(col("okey")).as("keeper"))
      val kp = fresh.join(keep, "h")
        .filter(col("okey") === col("keeper"))
        .groupBy("doc_id")
        .agg(collect_list(col("pidx")).as("kp"))
      docs.filter(col("doc_id") % 10 >= 8)
        .join(kp, Seq("doc_id"), "left")
        .withColumn("kp", coalesce(col("kp"), array().cast("array<int>")))
        .withColumn("ki", filter(sequence(lit(0), size(col("paras")) - 1),
          i => array_contains(col("kp"), i)))
        .select(col("doc_id"),
          size(col("paras")).as("n_paras"),
          size(col("ki")).as("n_kept"),
          concat_ws(ParaDelim,
            transform(col("ki"), i => element_at(col("paras"), i + 1)))
            .as("cleaned"))
        .orderBy("doc_id")
    },
    Some {
      val dl = "'" + ParaDelim.replace("'", "''") + "'"
      s"""WITH t AS (SELECT doc_id, string_split(text, $dl) AS paras
          FROM documents WHERE doc_id IS NOT NULL),
        ex AS (SELECT doc_id, i - 1 AS pidx,
            row(doc_id, i - 1) AS okey,
            ${sqlMd5h61("paras[i]")} AS h
          FROM t, unnest(generate_series(1, len(paras))) AS u(i)),
        fresh AS (SELECT b.doc_id, b.pidx, b.okey, b.h
          FROM ex b
          WHERE b.doc_id % 10 >= 8 AND NOT EXISTS (
            SELECT 1 FROM ex c WHERE c.doc_id % 10 < 8 AND c.h = b.h)),
        keep AS (SELECT h, min(okey) AS keeper FROM fresh GROUP BY h),
        kp AS (SELECT doc_id, list(pidx ORDER BY pidx) AS kp
          FROM fresh JOIN keep USING (h) WHERE okey = keeper
          GROUP BY doc_id),
        k AS (SELECT t.doc_id, t.paras, coalesce(kp.kp, []) AS kp
          FROM t LEFT JOIN kp ON t.doc_id = kp.doc_id
          WHERE t.doc_id % 10 >= 8)
        SELECT doc_id, cast(len(paras) as int) AS n_paras,
          cast(len(kp) as int) AS n_kept,
          coalesce(array_to_string(list_transform(kp, i -> paras[i + 1]),
            $dl), '') AS cleaned
        FROM k ORDER BY doc_id"""
    })

  /** q170 — WITHIN-document repeated-segment removal (the
    * RefinedWeb/Falcon line-wise filter: a crawled page repeating its
    * own nav bar / cookie banner keeps ONE copy; later in-doc repeats
    * are excised, order preserved). Complements q152, which dedups
    * segments ACROSS documents: here the keep-first scope is the
    * single document, so two different docs may both keep the same
    * segment. Same segment convention as q152 ([[ParaDelim]] — the
    * driver corpus has no newlines).
    *
    * Scale shape: ZERO shuffles — segment split, per-segment hash,
    * first-occurrence filter, and reassembly are all array ops inside
    * one codegen projection (the final orderBy exists only for the
    * deterministic dump). Per-doc cost is O(p) md5 digests + O(p²)
    * 64-bit compares with p = segments per doc — bounded by document
    * length, independent of corpus size, so the operator scales
    * strictly linearly and joins no other table. The cross-doc q152
    * machinery (groupBy h + join-back) is exactly what this op does
    * NOT need: in-doc scope keeps everything row-local. */
  private[graft] def withinDocDedupDf(delim: String)(
      s: SparkSession, d: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        split(col("text"),
          java.util.regex.Pattern.quote(delim), -1).as("paras"))
      .withColumn("hs", transform(col("paras"), p => md5h61(p)))
      .withColumn("ki", filter(sequence(lit(1), size(col("paras"))),
        i => array_position(col("hs"), element_at(col("hs"), i)) === i))
      .select(col("doc_id"),
        size(col("paras")).as("n_paras"),
        size(col("ki")).as("n_kept"),
        concat_ws(delim,
          transform(col("ki"), i => element_at(col("paras"), i)))
          .as("cleaned"))
      .orderBy("doc_id")
  }

  private def sqlWithinDocDedup(delim: String): String = {
    val dl = "'" + delim.replace("'", "''") + "'"
    s"""WITH t AS (SELECT doc_id, string_split(text, $dl) AS paras
        FROM documents),
      h AS (SELECT doc_id, paras,
          list_transform(paras, p -> ${sqlMd5h61("p")}) AS hs
        FROM t),
      k AS (SELECT doc_id, paras,
          list_filter(generate_series(1, len(paras)),
            i -> list_position(hs, hs[i]) = i) AS ki
        FROM h)
      SELECT doc_id, cast(len(paras) as int) AS n_paras,
        cast(len(ki) as int) AS n_kept,
        coalesce(array_to_string(list_transform(ki, i -> paras[i]), $dl),
          '') AS cleaned
      FROM k ORDER BY doc_id"""
  }

  val withinDocDedup: Q = Q(
    "q170_withindoc_dedup",
    (s, d) => withinDocDedupDf(ParaDelim)(s, d),
    Some(sqlWithinDocDedup(ParaDelim)))

  /** q172 — soft dedup: DOWN-WEIGHT duplicate clusters instead of
    * dropping members (the data-constrained regime — when hard dedup
    * would shrink the corpus below the token budget, repeated content
    * is kept but its sampling mass is normalized so each distinct
    * passage contributes ~one document's worth of expected tokens;
    * cf. the repeat-epoch analysis in Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"). Every doc gets
    * weight = 1 / |its near-dup cluster| (singletons weight 1), from
    * the same verified-pair connected components as q56, so
    * Σ weight over a cluster = 1 and `eff_tokens` is the doc's token
    * mass after normalization. The weights compose directly with the
    * q104 weighted sampler.
    *
    * Scale shape: cluster membership is the bounded q56 machinery
    * (LSH-blocked pairs, min-label propagation); cluster sizes are a
    * groupBy+join-back on cluster_root (map-side partials, never a
    * window); the corpus-side join is one equi-join on doc_id and the
    * weight math is scan-local. The double division 1/csize runs on
    * identical exact integers in both engines → bit-identical IEEE
    * doubles. */
  val softDedupWeights: Q = Q(
    "q172_soft_dedup_weights",
    (s, d) => {
      val members = clustersDf(s, d)
      val sizes = members.groupBy("cluster_root")
        .agg(count(lit(1)).as("cluster_size"))
      val mw = members.join(sizes, "cluster_root")
        .select("doc_id", "cluster_size")
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks(col("text"))).as("n_tokens"))
        .join(mw, Seq("doc_id"), "left")
        .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
        .select(col("doc_id"), col("cluster_size"), col("n_tokens"),
          (lit(1.0) / col("cluster_size")).as("weight"),
          (col("n_tokens") / col("cluster_size").cast("double"))
            .as("eff_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      sizes AS (SELECT cluster_root, count(*) AS cluster_size
        FROM clusters GROUP BY cluster_root),
      mw AS (SELECT c.doc_id, s.cluster_size
        FROM clusters c JOIN sizes s USING (cluster_root)),
      docs AS (SELECT doc_id,
          cast(len(${sqlToks("text")}) as int) AS n_tokens
        FROM documents)
      SELECT d.doc_id,
        cast(coalesce(mw.cluster_size, 1) as bigint) AS cluster_size,
        d.n_tokens,
        cast(1.0 as double) / cast(coalesce(mw.cluster_size, 1) as bigint)
          AS weight,
        d.n_tokens / cast(cast(coalesce(mw.cluster_size, 1) as bigint)
          as double) AS eff_tokens
      FROM docs d LEFT JOIN mw ON d.doc_id = mw.doc_id
      ORDER BY d.doc_id"""))

  /** q180 — LSH blocking recall, measured EXACTLY: q91 measures the
    * MinHash band pipeline's precision and estimator error but
    * documents that recall "needs the O(n²) truth set"; since q165 the
    * truth set is computable WITHOUT O(n²) — the prefix-filter join is
    * exact at τ=0.7, and any tighter threshold over it is still exact.
    * This harness counts the jaccard ≥ 0.8 truth pairs (integer
    * admission n·5 ≥ 4·(|A|+|B|−n) — no float boundary), joins the
    * band-blocked verified pairs (q37) against them, and reports
    * n_truth / n_caught / n_missed / recall in one row: the measured
    * counterpart of the documented (1−J^k)^b recall boundary, the
    * number an operator checks before trusting banded dedup on a new
    * corpus shape.
    *
    * Scale shape: both sides are the already-bounded machineries
    * (prefix-filter candidates, band buckets); the overlap join
    * touches only pair rows; the final frame is two 1-row aggregates
    * cross-joined broadcast (the scalar-broadcast idiom). */
  val lshRecallEval: Q = Q(
    "q180_lsh_recall_eval",
    (s, d) => {
      val truth = exactPairsDf(s, d)
        .filter(col("n_shared") * 5 >=
          (col("sz_a") + col("sz_b") - col("n_shared")) * 4)
        .select("doc_a", "doc_b")
      val lsh = verifiedPairs(s, d).select("doc_a", "doc_b")
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nC = truth.join(lsh, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_caught"))
      nT.crossJoin(broadcast(nC))
        .select(col("n_truth"), col("n_caught"),
          (col("n_truth") - col("n_caught")).as("n_missed"),
          when(col("n_truth") === 0, lit(1.0))
            .otherwise(col("n_caught").cast("double") / col("n_truth"))
            .as("recall"))
    },
    Some(s"""WITH $sqlVerifiedChain,
      exb AS MATERIALIZED (SELECT doc_id, ${sqlMd5h61("sg")} AS h
        FROM (SELECT doc_id, unnest(sh) AS sg FROM sets)),
      interb AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          cast(count(*) as bigint) AS n_shared
        FROM exb a JOIN exb b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      szb AS (SELECT doc_id, cast(len(sh) as bigint) AS sz FROM sets),
      truth AS (SELECT doc_a, doc_b FROM interb
        JOIN szb sa ON doc_a = sa.doc_id
        JOIN szb sb ON doc_b = sb.doc_id
        WHERE n_shared * 5 >= (sa.sz + sb.sz - n_shared) * 4),
      lsh AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
      nt AS (SELECT cast(count(*) as bigint) AS n_truth FROM truth),
      nc AS (SELECT cast(count(*) as bigint) AS n_caught
        FROM truth JOIN lsh USING (doc_a, doc_b))
      SELECT n_truth, n_caught, n_truth - n_caught AS n_missed,
        CASE WHEN n_truth = 0 THEN cast(1.0 as double)
          ELSE cast(n_caught as double) / n_truth END AS recall
      FROM nt, nc"""))

  /** q185 — memorization-risk audit: the duplication-count profile of
    * k-token windows. Carlini et al. 2023 ("Quantifying Memorization
    * Across Neural Language Models") measure that a sequence seen c
    * times is regurgitated at a rate growing log-linearly in c, and
    * Lee et al. 2022 make the removal case; this is the MEASUREMENT
    * side the dedup family (q143/q145 remove, q35 dedups docs) needs
    * before deciding policy: window types bucketed by occurrence count
    * (power-of-2 lower bounds 1/2/4/8/16+), per bucket the type count,
    * total instances, how many types cross document boundaries, and
    * how many docs carry at least one such window — the "how much of
    * my corpus is c-duplicated" release-gate number.
    *
    * Scale shape: same windowing scan as q143 (one pass, 1 row per
    * token position), ONE shuffle on the window hash; the docs-touched
    * aggregate re-joins instances on that same hash partitioning
    * (exchange-reused, no second scan); output is ≤5 rows. */
  val memorizationAudit: Q = {
    val K = WinK
    def bucketOf(c: org.apache.spark.sql.Column) =
      when(c === 1, 1L).when(c < 4, 2L).when(c < 8, 4L)
        .when(c < 16, 8L).otherwise(16L)
    Q(
      "q185_memorization_audit",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        // One materialized window-hash pass shared by the counts
        // aggregate and the docs-touched join probe (the q143
        // measurement: un-cached, both branches re-ran the per-window
        // md5 above the doc_id exchange; caching after the
        // h-repartition lets both h-keyed aggregates run exchange-free
        // off the cache's preserved partitioning)
        val wins = graft.CacheScope.cached(Tables.documents(s, d)
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("doc_id"))
          .select(col("doc_id"), toks(col("text")).as("t"))
          .filter(size(col("t")) >= K)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("t")) - (K - 1)),
              i => concat_ws(" ", slice(col("t"), i, lit(K))))).as("win"))
          .select(col("doc_id"), md5h61(col("win")).as("h"))
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("h")))
        val counts = wins.groupBy("h")
          .agg(count(lit(1)).as("c"), count_distinct(col("doc_id")).as("nd"))
        val byBucket = counts.withColumn("dup_bucket", bucketOf(col("c")))
          .groupBy("dup_bucket")
          .agg(count(lit(1)).as("n_window_types"),
            sum(col("c")).cast("long").as("n_instances"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L))
              .as("n_crossdoc_types"))
        val touched = wins
          .join(counts.select(col("h"), bucketOf(col("c")).as("dup_bucket")),
            "h")
          .groupBy("dup_bucket")
          .agg(count_distinct(col("doc_id")).as("n_docs"))
        byBucket.join(touched, "dup_bucket").orderBy("dup_bucket")
      },
      Some(s"""WITH t AS (
          SELECT doc_id, ${sqlToks("text")} AS t FROM documents),
        tt AS (SELECT doc_id, t FROM t WHERE len(t) >= $K),
        w AS MATERIALIZED (SELECT doc_id,
            ${sqlMd5h61(s"array_to_string(t[i:i+$K-1], ' ')")} AS h
          FROM tt, unnest(generate_series(1, len(t)-$K+1)) AS u(i)),
        c AS MATERIALIZED (SELECT h, count(*) AS c,
            count(DISTINCT doc_id) AS nd
          FROM w GROUP BY h),
        cb AS MATERIALIZED (SELECT h, c, nd,
            cast(CASE WHEN c = 1 THEN 1 WHEN c < 4 THEN 2 WHEN c < 8 THEN 4
              WHEN c < 16 THEN 8 ELSE 16 END as bigint) AS dup_bucket
          FROM c),
        a AS (SELECT dup_bucket,
            cast(count(*) as bigint) AS n_window_types,
            cast(sum(c) as bigint) AS n_instances,
            cast(count(*) FILTER (WHERE nd >= 2) as bigint)
              AS n_crossdoc_types
          FROM cb GROUP BY 1),
        dd AS (SELECT dup_bucket,
            cast(count(DISTINCT doc_id) as bigint) AS n_docs
          FROM w JOIN cb USING (h) GROUP BY 1)
        SELECT dup_bucket, n_window_types, n_instances, n_crossdoc_types,
          n_docs
        FROM a JOIN dd USING (dup_bucket) ORDER BY dup_bucket"""),
      bench = true)
  }

  /** q191 — PageRank over the near-dup graph (Page et al. 1998; fixed
    * 10 power iterations, d = 0.85). Centrality in the duplication
    * graph ranks the TEMPLATE documents — the pages whose boilerplate
    * radiates through the corpus — which is exactly the triage order
    * for cleaning rules; q56 finds the components, this ranks inside
    * them. The iterative-join shape (sparse matvec as equi-join +
    * groupBy, lineage localCheckpoint'ed each round, superseded frame
    * unpersisted) is the same discipline as the q56 label propagation.
    *
    * Determinism: all arithmetic is integer in 1e-9 units — pr₀ =
    * 10⁹ div N, teleport = 1.5·10⁸ div N, each contribution
    * (85·prq) div (100·deg) — so partitioning cannot reorder a float
    * sum, and the DuckDB twin (a generated 10-stage materialized CTE
    * chain) is bit-identical. In a symmetrized graph every node has
    * in-edges, so the contribution aggregate covers every node — no
    * left-join round-trip.
    *
    * Scale shape: edges cached once with degrees; each round is ONE
    * equi-join on src (both sides hash-partitioned by the same key
    * after round 1) + one map-combinable groupBy(dst); N is a 1-row
    * broadcast. */
  val dupPagerank: Q = {
    val Iters = 10
    Q(
      "q191_dup_pagerank",
      (s, d) => {
        val pairs = graft.CacheScope.cached(
          verifiedPairs(s, d).select("doc_a", "doc_b"))
        val ed = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        val deg = ed.groupBy("src").agg(count(lit(1)).as("deg"))
        val e = graft.CacheScope.cached(ed.join(deg, "src"))
        // N as a driver scalar, not a re-broadcast 1-row frame: the
        // crossJoin(broadcast(nn)) subtree re-ran the count aggregate
        // and built a fresh broadcast inside EVERY round's checkpoint
        // job (no cross-action exchange reuse) — 11 broadcast builds
        // for one constant. One bounded 1-row fetch off the cached
        // degree frame (the maintainer-gate collect discipline) and
        // the teleport terms become literals; integer div semantics
        // unchanged (guarded for the empty-graph case, where pr is
        // empty and the values are never read).
        val nnVal = deg.agg(count(lit(1))).head.getLong(0)
        val pr0 = if (nnVal == 0) 0L else 1000000000L / nnVal
        val tele = if (nnVal == 0) 0L else 150000000L / nnVal
        var pr = deg.select(col("src").as("doc"))
          .select(col("doc"), lit(pr0).as("prq"))
          .localCheckpoint()
        for (_ <- 1 to Iters) {
          val prev = pr
          pr = e.join(pr, e("src") === pr("doc"))
            .select(col("dst"), expr("(85 * prq) div (100 * deg)").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("cs"))
            .select(col("dst").as("doc"),
              (lit(tele) + col("cs")).as("prq"))
            .localCheckpoint()
          prev.unpersist()
        }
        pr.select(col("doc").as("doc_id"), col("prq"))
          .orderBy(desc("prq"), asc("doc_id"))
      },
      Some {
        val stages = (1 to Iters).map { i =>
          s"""p$i AS MATERIALIZED (SELECT e.dst AS doc,
              cast((SELECT 150000000 // nn FROM cnt) +
                sum((85 * p.prq) // (100 * e.deg)) as bigint) AS prq
            FROM e JOIN p${i - 1} p ON e.src = p.doc
            GROUP BY e.dst)"""
        }.mkString(",\n          ")
        s"""WITH ${sqlVerified(None)},
          vp AS MATERIALIZED (SELECT doc_a, doc_b FROM verified
            WHERE jaccard >= 0.8),
          ed AS (SELECT doc_a AS src, doc_b AS dst FROM vp
            UNION ALL SELECT doc_b, doc_a FROM vp),
          dg AS MATERIALIZED (SELECT src, count(*) AS deg
            FROM ed GROUP BY src),
          e AS MATERIALIZED (SELECT ed.src, ed.dst, dg.deg
            FROM ed JOIN dg USING (src)),
          cnt AS MATERIALIZED (SELECT count(*) AS nn FROM dg),
          p0 AS MATERIALIZED (SELECT src AS doc,
            cast(1000000000 // nn as bigint) AS prq
            FROM dg, cnt),
          $stages
          SELECT doc AS doc_id, prq FROM p$Iters
          ORDER BY prq DESC, doc_id"""
      },
      bench = true)
  }

  /** q196 — QUALITY-AWARE canonical selection: keep the BEST copy of
    * each near-dup cluster instead of the first (q69's keep-first is
    * the cheap default; production web pipelines keep the richest
    * extraction of a page — e.g. the RefinedWeb/FineWeb line keeps one
    * representative per cluster, and WHICH one decides the surviving
    * text quality). Quality here is the q31 richness proxy packed into
    * ONE exact integer key — qkey = n_uniq · 10¹⁰ + n_tokens (distinct
    * tokens primary, length secondary; n_tokens < 10¹⁰ keeps the pack
    * collision-free and the product < 2⁶³) — with doc_id ASC breaking
    * exact ties; any scorer that yields a deterministic integer (q98b's
    * p6, q150's NLL) swaps in at the qkey projection.
    *
    * Scale shape: cluster membership is the bounded q56 machinery;
    * best-per-cluster is max(qkey) — a map-combinable groupBy, never a
    * window — then min(doc_id) over the qkey ties, and the verdict is
    * one equi-join back on cluster_root; the corpus side computes qkey
    * scan-locally. Singletons are their own canonical (left-join
    * coalesce, the q172 convention). */
  val qualityCanonical: Q = Q(
    "q196_quality_canonical",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      // feat is consumed by BOTH the cluster-side quality join and the
      // final corpus stamp — guard + repartition at the shared source
      // (the q145/q192 canonical-exchange discipline) so the two
      // branches reuse ONE tokenize scan instead of re-reading the
      // corpus per branch
      val feat = Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .repartition(col("doc_id"))
        .withColumn("t", toks(col("text")))
        .select(col("doc_id"),
          (size(array_distinct(col("t"))).cast("long") * lit(10000000000L) +
            size(col("t")).cast("long")).as("qkey"))
      val members = clustersDf(s, d)
      val mf = members.join(feat, "doc_id")
      val best = mf.groupBy("cluster_root").agg(max(col("qkey")).as("bq"))
      val canon = mf.join(best, "cluster_root")
        .filter(col("qkey") === col("bq"))
        .groupBy("cluster_root").agg(min(col("doc_id")).as("canonical_id"))
      feat.join(members, Seq("doc_id"), "left")
        .join(canon, Seq("cluster_root"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_root"), col("doc_id")).as("cluster_root"),
          col("qkey"),
          coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"),
          when(coalesce(col("canonical_id"), col("doc_id")) === col("doc_id"),
            1L).otherwise(0L).as("is_canonical"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      feat AS (SELECT doc_id,
          cast(len(list_distinct(${sqlToks("text")})) as bigint) * 10000000000
            + cast(len(${sqlToks("text")}) as bigint) AS qkey
        FROM documents),
      mf AS (SELECT c.cluster_root, c.doc_id, f.qkey
        FROM clusters c JOIN feat f USING (doc_id)),
      best AS (SELECT cluster_root, max(qkey) AS bq FROM mf GROUP BY 1),
      canon AS (SELECT mf.cluster_root, min(mf.doc_id) AS canonical_id
        FROM mf JOIN best ON mf.cluster_root = best.cluster_root
          AND mf.qkey = best.bq
        GROUP BY 1)
      SELECT f.doc_id,
        coalesce(c.cluster_root, f.doc_id) AS cluster_root,
        f.qkey,
        coalesce(n.canonical_id, f.doc_id) AS canonical_id,
        cast(CASE WHEN coalesce(n.canonical_id, f.doc_id) = f.doc_id
          THEN 1 ELSE 0 END as bigint) AS is_canonical
      FROM feat f
      LEFT JOIN clusters c ON f.doc_id = c.doc_id
      LEFT JOIN canon n ON c.cluster_root = n.cluster_root
      ORDER BY f.doc_id"""))

  /** q197 — LEAKAGE-SAFE train/valid/test splits: q78 assigns splits
    * by per-DOC content hash, which puts a train doc's near-duplicate
    * into valid/test with probability ≈ the holdout fraction — exactly
    * the contamination q168 then detects after the fact. This operator
    * PREVENTS it: the split key is the near-dup CLUSTER root (q56's
    * verified components; singletons key on themselves), so an entire
    * duplication cluster moves atomically and no verified near-dup
    * pair can ever straddle a split — leakage-freedom by construction,
    * not by audit. Same 80/10/10 salted-hash buckets as q78 (the q77
    * discipline — deterministic at any parallelism).
    *
    * Scale shape: cluster membership is the bounded q56 machinery; the
    * corpus side is one left join on doc_id plus a scan-local hash
    * projection — no window, no extra shuffle beyond the cluster join.
    * The spec proves the guarantee pairwise (no q37 pair straddles)
    * and shows the naive doc-hash split DOES straddle on a planted
    * fixture. */
  val leakageSafeSplits: Q = Q(
    "q197_leakage_safe_splits",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val members = clustersDf(s, d)
      val withRoot = Tables.documents(s, d).select(col("doc_id"))
        .join(members, Seq("doc_id"), "left")
        .withColumn("cluster_root",
          coalesce(col("cluster_root"), col("doc_id")))
      val bucket = md5h61(concat(lit("split:"),
        col("cluster_root").cast("string"))) % 100
      withRoot
        .withColumn("bucket", bucket)
        .select(col("doc_id"), col("cluster_root"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      wr AS (SELECT d.doc_id,
          coalesce(c.cluster_root, d.doc_id) AS cluster_root
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
      SELECT doc_id, cluster_root,
        ${sqlMd5h61("'split:' || cast(cluster_root as varchar)")} % 100
          AS bucket,
        CASE WHEN ${sqlMd5h61("'split:' || cast(cluster_root as varchar)")}
            % 100 < 80 THEN 'train'
          WHEN ${sqlMd5h61("'split:' || cast(cluster_root as varchar)")}
            % 100 < 90 THEN 'valid'
          ELSE 'test' END AS split
      FROM wr ORDER BY doc_id"""))

  /** q205 — dedup THRESHOLD-SWEEP curve: what each Jaccard cutoff
    * t ∈ {0.5 … 0.9} would cost — qualifying pairs, docs dropped under
    * the deterministic pair-greedy rule (a doc is dropped iff it has a
    * qualifying pair with a LOWER doc_id — exactly q69's keep-first
    * applied per pair), and the dropped distinct-shingle mass — the
    * tuning audit run BEFORE committing a threshold to a 100 TB dedup
    * pass, where re-running the pipeline per candidate t is the thing
    * you cannot afford. All five thresholds ride ONE pass over
    * [[cappedPairIntersections]]'s candidate-bounded pair frame via a
    * 5-element literal explode (the q198 multi-depth discipline).
    *
    * Determinism: the threshold test is the exact integer cross-
    * multiplication n_shared·10 ≥ t10·(szA+szB−n_shared) — no double
    * ever compared against a cutoff (stronger than q121, whose single
    * pinned 0.5 is safe only because both engines build the identical
    * double); masses and counts are integers; the one double division
    * (dropped fraction) happens on bitwise-equal integer pairs.
    *
    * Scale shape: pair frame is candidate-bounded (df-cap) and the
    * sweep multiplies it by 5 literals — never re-derives it; dropped
    * docs per t are a (t10, doc_b) distinct-agg (map-combinable) over
    * qualifying pairs; output is 5 rows left-joined from the literal
    * threshold table so an empty threshold band still reports zeros. */
  val thresholdCurve: Q = Q(
    "q205_dedup_threshold_curve",
    (s, d) => {
      val spark2 = s
      import spark2.implicits._
      val (sets, inter) = cappedPairIntersections(s, d)
      val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      val qual = graft.CacheScope.cached(inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("sa.sz") + col("sb.sz") - col("n_shared")).as("uni"),
          col("sb.sz").as("szb"),
          explode(typedlit(Seq(5L, 6L, 7L, 8L, 9L))).as("t10"))
        .filter(col("n_shared") * 10 >= col("t10") * col("uni")))
      val nPairs = qual.groupBy("t10").agg(count(lit(1)).as("n_pairs"))
      val dropped = qual.groupBy("t10", "doc_b")
        .agg(min(col("szb")).as("szb"))
        .groupBy("t10")
        .agg(count(lit(1)).as("n_docs_dropped"),
          sum(col("szb")).as("dropped_mass"))
      val totals = sz.agg(count(lit(1)).as("corpus_docs"),
        sum(col("sz")).as("corpus_mass"))
      Seq(5L, 6L, 7L, 8L, 9L).toDF("t10")
        .crossJoin(broadcast(totals))
        .join(nPairs, Seq("t10"), "left")
        .join(dropped, Seq("t10"), "left")
        .select(col("t10"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_dropped"), lit(0L)).as("n_docs_dropped"),
          coalesce(col("dropped_mass"), lit(0L)).as("dropped_mass"),
          col("corpus_docs"),
          (coalesce(col("n_docs_dropped"), lit(0L)).cast("double") /
            col("corpus_docs")).as("dropped_doc_frac"))
        .orderBy("t10")
    },
    Some(s"""WITH $sqlShingleSets,
      $sqlCappedInterChain,
      th(t10) AS (VALUES (5), (6), (7), (8), (9)),
      qual AS MATERIALIZED (SELECT th.t10, i.doc_a, i.doc_b, i.n_shared,
          sb.sz AS szb
        FROM inter i
        JOIN sz sa ON i.doc_a = sa.doc_id
        JOIN sz sb ON i.doc_b = sb.doc_id
        CROSS JOIN th
        WHERE i.n_shared * 10 >= th.t10 * (sa.sz + sb.sz - i.n_shared)),
      np AS (SELECT t10, cast(count(*) as bigint) AS n_pairs
        FROM qual GROUP BY 1),
      dr AS (SELECT t10, cast(count(*) as bigint) AS n_docs_dropped,
          cast(sum(szb) as bigint) AS dropped_mass
        FROM (SELECT t10, doc_b, min(szb) AS szb FROM qual GROUP BY 1, 2)
        GROUP BY 1),
      tot AS (SELECT cast(count(*) as bigint) AS corpus_docs,
          cast(sum(sz) as bigint) AS corpus_mass FROM sz)
      SELECT cast(th.t10 as bigint) AS t10,
        coalesce(np.n_pairs, 0) AS n_pairs,
        coalesce(dr.n_docs_dropped, 0) AS n_docs_dropped,
        coalesce(dr.dropped_mass, 0) AS dropped_mass,
        tot.corpus_docs,
        cast(coalesce(dr.n_docs_dropped, 0) as double) / tot.corpus_docs
          AS dropped_doc_frac
      FROM th CROSS JOIN tot
      LEFT JOIN np ON np.t10 = th.t10
      LEFT JOIN dr ON dr.t10 = th.t10
      ORDER BY t10"""),
    bench = true)

  /** q206 — cross-source MIRROR detection matrix: for every source
    * pair, the exact-content overlap of their document-hash SETS —
    * shared hashes, duplicated doc-pair mass, hash-set Jaccard, and
    * BOTH asymmetric containments |A∩B|/|A| and |A∩B|/|B| (Broder's
    * containment at SOURCE granularity — the quantity that exposes "B
    * mirrors A" even when B is 1000× larger, which the symmetric
    * Jaccard washes out; the standard crawl-hygiene question for
    * CommonCrawl-style mirror/aggregator snapshots). q108 counts
    * NEAR-dup pairs per source pair; this one works at exact-hash
    * set granularity and normalizes per source.
    *
    * Scale shape: the corpus reduces to (source, hash, count) FIRST —
    * the per-hash self-join then fans out at most |sources| rows per
    * hash (never doc-count: a hash duplicated 10⁶ times within one
    * source is still ONE row per source), so candidate volume is
    * bounded by |hashes|·|sources|²; output is ≤ |sources|² rows. The
    * three ratios each divide the same bitwise-equal integers once. */
  val sourceMirror: Q = Q(
    "q206_source_mirror",
    (s, d) => {
      val hs = graft.CacheScope.cached(
        Tables.documents(s, d)
          .select(col("source"), md5h61(col("text")).as("h"))
          .groupBy("source", "h").agg(count(lit(1)).as("c")))
      val per = hs.groupBy("source").agg(count(lit(1)).as("n_hashes"))
      val pairs = hs.as("a").join(hs.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"),
          sum(col("a.c") * col("b.c")).as("n_doc_pairs"))
      pairs
        .join(broadcast(per.select(col("source").as("source_a"),
          col("n_hashes").as("na"))), "source_a")
        .join(broadcast(per.select(col("source").as("source_b"),
          col("n_hashes").as("nb"))), "source_b")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("n_doc_pairs"), col("na"), col("nb"),
          (col("n_shared").cast("double") /
            (col("na") + col("nb") - col("n_shared"))).as("hash_jaccard"),
          (col("n_shared").cast("double") / col("na")).as("containment_a"),
          (col("n_shared").cast("double") / col("nb")).as("containment_b"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""WITH hs AS MATERIALIZED (SELECT source,
          ${sqlMd5h61("text")} AS h, count(*) AS c
        FROM documents GROUP BY 1, 2),
      per AS MATERIALIZED (SELECT source,
          cast(count(*) as bigint) AS n_hashes
        FROM hs GROUP BY 1),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
          cast(count(*) as bigint) AS n_shared,
          cast(sum(a.c * b.c) as bigint) AS n_doc_pairs
        FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
      SELECT p.source_a, p.source_b, p.n_shared, p.n_doc_pairs,
        pa.n_hashes AS na, pb.n_hashes AS nb,
        cast(p.n_shared as double) / (pa.n_hashes + pb.n_hashes - p.n_shared)
          AS hash_jaccard,
        cast(p.n_shared as double) / pa.n_hashes AS containment_a,
        cast(p.n_shared as double) / pb.n_hashes AS containment_b
      FROM p JOIN per pa ON p.source_a = pa.source
             JOIN per pb ON p.source_b = pb.source
      ORDER BY p.source_a, p.source_b"""))

  /** Pinned theoretical band-collision probability per jaccard
    * ventile, floor(·1e6): P = 1 − (1 − j^rows)^bands at the ventile
    * midpoint, for this corpus's config (8 bands × 2 rows). Computed
    * ONCE here and embedded as the same integer literals in the Spark
    * expression and the SQL twin (the q188 literal discipline — pow()
    * on data-dependent values could not cross engines). */
  private[graft] val TheoCollidePpm: Seq[Long] = (0 until 20).map { b =>
    val jm = (b + 0.5) / 20.0
    math.floor((1.0 - math.pow(1.0 - jm * jm, Bands)) * 1e6).toLong
  }

  /** q211 — LSH S-CURVE CALIBRATION: measured band-collision rate per
    * exact-jaccard ventile vs the pinned theoretical curve
    * 1 − (1 − j²)⁸ — the audit that answers "is 8 bands × 2 rows the
    * right config for a 0.8 threshold" from the corpus itself instead
    * of trusting the formula's independence assumptions (minhashes of
    * CORRELATED shingle sets are not ideal uniform hashes; template
    * corpora bend the curve). A gap at the threshold ventile means
    * recall loss (measured below theory) or wasted candidate fanout
    * (above) — the number that would re-size Bands before a 100 TB
    * dedup pass.
    *
    * Universe: the q121 capped-candidate pairs — every pair with a
    * known EXACT jaccard (the conditional universe calibration needs;
    * pairs whose entire overlap is above-cap boilerplate are absent,
    * documented df-cap recall trade). Ventile by exact integer
    * cross-multiplication (n_shared·20 div union, capped at 19);
    * measured rate by integer ppm division; theory from
    * [[TheoCollidePpm]] literals. No float ever meets a threshold.
    *
    * Scale shape: pair frame candidate-bounded (df-cap); the collision
    * bit is two equi-joins against the cached (doc, band, bh) frame —
    * ≤ 8 band rows per doc, distinct()-reduced to one row per colliding
    * pair; output ≤ 20 rows. */
  val lshCalibration: Q = Q(
    "q211_lsh_calibration",
    (s, d) => {
      val signed = graft.CacheScope.cached(
        signedSetsOf(s, Tables.documents(s, d)))
      val (sets, inter) = cappedPairIntersections(s, d)
      val sz = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"))
      val pairs = graft.CacheScope.cached(inter
        .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("sa.sz") + col("sb.sz") - col("n_shared")).as("uni"))
        .withColumn("bucket",
          least(expr("(n_shared * 20) div uni"), lit(19L))))
      val bands = signed.select(col("doc_id"),
        posexplode(array(bandColumns: _*)).as(Seq("band_id", "bh")))
      val collide = pairs
        .join(bands.as("ba"), col("doc_a") === col("ba.doc_id"))
        .join(bands.as("bb"),
          col("doc_b") === col("bb.doc_id") &&
            col("ba.band_id") === col("bb.band_id") &&
            col("ba.bh") === col("bb.bh"))
        .select("doc_a", "doc_b", "bucket").distinct()
        .groupBy("bucket").agg(count(lit(1)).as("n_collide"))
      pairs.groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        .join(collide, Seq("bucket"), "left")
        .withColumn("n_collide", coalesce(col("n_collide"), lit(0L)))
        .withColumn("measured_ppm",
          expr("(n_collide * 1000000) div n_pairs"))
        .withColumn("theo_ppm",
          element_at(typedlit(TheoCollidePpm), (col("bucket") + 1).cast("int")))
        .select(col("bucket"), col("n_pairs"), col("n_collide"),
          col("measured_ppm"), col("theo_ppm"),
          (col("measured_ppm") - col("theo_ppm")).as("gap_ppm"))
        .orderBy("bucket")
    },
    Some {
      val theoList = TheoCollidePpm.mkString("[", ", ", "]")
      s"""WITH $sqlShingleSets, $sqlSignatures,
      bands_all AS MATERIALIZED ($sqlBandsAll),
      $sqlCappedInterChain,
      pr AS MATERIALIZED (SELECT i.doc_a, i.doc_b,
          least((i.n_shared * 20) // (sa.sz + sb.sz - i.n_shared), 19)
            AS bucket
        FROM inter i
        JOIN sz sa ON i.doc_a = sa.doc_id
        JOIN sz sb ON i.doc_b = sb.doc_id),
      coll AS (SELECT bucket, cast(count(*) as bigint) AS n_collide
        FROM (SELECT DISTINCT p.doc_a, p.doc_b, p.bucket
          FROM pr p
          JOIN bands_all ba ON p.doc_a = ba.doc_id
          JOIN bands_all bb ON p.doc_b = bb.doc_id
            AND ba.band_id = bb.band_id AND ba.bh = bb.bh)
        GROUP BY 1),
      np AS (SELECT bucket, cast(count(*) as bigint) AS n_pairs
        FROM pr GROUP BY 1)
      SELECT np.bucket, np.n_pairs,
        coalesce(coll.n_collide, 0) AS n_collide,
        cast((coalesce(coll.n_collide, 0) * 1000000) // np.n_pairs
          as bigint) AS measured_ppm,
        cast(($theoList)[cast(np.bucket + 1 as int)] as bigint) AS theo_ppm,
        cast((coalesce(coll.n_collide, 0) * 1000000) // np.n_pairs
          - ($theoList)[cast(np.bucket + 1 as int)] as bigint) AS gap_ppm
      FROM np LEFT JOIN coll USING (bucket)
      ORDER BY np.bucket"""
    })

  // ------------------------------------------------------------------
  // q220 — per-source boilerplate-prevalence economics under the C4 /
  // CCNet DROP-ALL policy (Raffel et al. 2020 §2.2 "three-sentence
  // span appearing more than once is removed"; Wenzek et al. 2020
  // dedup lines by prevalence): a segment that occurs in >= 2 DISTINCT
  // documents corpus-wide is boilerplate and every copy is dropped —
  // including the first, which is exactly where this differs from
  // q152's keep-first reassembly (same [[ParaDelim]] segments, opposite
  // keep policy). Output is the per-source audit a corpus team reads
  // before enabling the filter: how many segment instances and chars
  // each source would lose.
  //
  // Scale shape: ONE consumer chain over ONE documents scan. The
  // explode carries (source, doc_id, h, len, pidx=0 flag) — 61-bit
  // hashes, never segment text. ONE corpus-width exchange on (h,
  // source) folds instances to the (segment, source) granularity; the
  // GLOBAL distinct-doc prevalence is then a window over that
  // aggregated frame partitioned by h with a frame bounded by
  // |sources| rows (a doc has exactly one source, so global nd = sum
  // of per-source nd — no second corpus pass and no self-join); the
  // final rollup is a map-combinable groupBy over |sources| keys.
  // Per-source doc counts need NO second scan branch either (a narrow
  // count branch gets column-pruned into its own scan — caught by the
  // allowance sweep): every doc contributes exactly one pidx=0
  // instance, so n_docs = Σ first-instance flags riding the same
  // aggregates.
  // ------------------------------------------------------------------
  val boilerplatePrevalence: Q = Q(
    "q220_boilerplate_prevalence",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val docs = Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          split(col("text"),
            java.util.regex.Pattern.quote(ParaDelim), -1).as("paras"))
      val ex = docs
        .select(col("source"), col("doc_id"),
          posexplode_outer(col("paras")).as(Seq("pidx", "para")))
        .select(col("source"), col("doc_id"),
          md5h61(col("para")).as("h"), length(col("para")).as("ln"),
          when(col("pidx") === 0, 1L).otherwise(0L).as("isf"))
      val g1 = ex.groupBy("h", "source")
        .agg(count(lit(1)).as("n_inst"),
          countDistinct(col("doc_id")).as("ndw"),
          sum(col("ln")).as("chars"),
          sum(col("isf")).as("nfirst"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
      val flagged = g1.withColumn("nd", sum(col("ndw")).over(w))
        .withColumn("boiler", col("nd") >= lit(2L))
      flagged.groupBy("source")
        .agg(sum(col("nfirst")).cast(LongType).as("n_docs"),
          sum(col("n_inst")).cast(LongType).as("n_seg"),
          count(when(col("boiler"), 1)).cast(LongType).as("n_boiler_seg"),
          sum(when(col("boiler"), col("n_inst")).otherwise(0L))
            .cast(LongType).as("n_dropped"),
          sum(col("chars")).cast(LongType).as("chars_total"),
          sum(when(col("boiler"), col("chars")).otherwise(0L))
            .cast(LongType).as("chars_dropped"))
        .select(col("source"), col("n_docs"), col("n_seg"),
          col("n_boiler_seg"), col("n_dropped"), col("chars_total"),
          col("chars_dropped"),
          when(col("chars_total") > 0,
            col("chars_dropped").cast("double") / col("chars_total"))
            .as("drop_ratio"))
        .orderBy("source")
    },
    Some {
      val dl = "'" + ParaDelim.replace("'", "''") + "'"
      s"""WITH t AS (SELECT doc_id, source, string_split(text, $dl) AS paras
          FROM documents WHERE doc_id IS NOT NULL),
        ex AS (SELECT source, doc_id, ${sqlMd5h61("paras[i]")} AS h,
            len(paras[i]) AS ln, CASE WHEN i = 1 THEN 1 ELSE 0 END AS isf
          FROM t, unnest(generate_series(1, len(paras))) AS u(i)),
        g1 AS (SELECT h, source, count(*) AS n_inst,
            count(distinct doc_id) AS ndw, sum(ln) AS chars,
            sum(isf) AS nfirst
          FROM ex GROUP BY 1, 2),
        fl AS (SELECT *, sum(ndw) OVER (PARTITION BY h) >= 2 AS boiler
          FROM g1)
        SELECT source,
          cast(sum(nfirst) as bigint) AS n_docs,
          cast(sum(n_inst) as bigint) AS n_seg,
          cast(count_if(boiler) as bigint) AS n_boiler_seg,
          cast(sum(CASE WHEN boiler THEN n_inst ELSE 0 END) as bigint)
            AS n_dropped,
          cast(sum(chars) as bigint) AS chars_total,
          cast(sum(CASE WHEN boiler THEN chars ELSE 0 END) as bigint)
            AS chars_dropped,
          CASE WHEN sum(chars) > 0
            THEN cast(sum(CASE WHEN boiler THEN chars ELSE 0 END) as double)
              / sum(chars) END AS drop_ratio
        FROM fl GROUP BY 1 ORDER BY 1"""
    },
    bench = true)

  /** q235 — triangle census of the verified near-dup graph: template
    * families (mirrored boilerplate, licence pages, scraped nav shells)
    * form near-CLIQUES, while legitimate revision chains form paths —
    * the global transitivity ratio 3·T/wedges separates the two regimes
    * and tells you whether cluster resolution (q56) will produce a few
    * mega-clusters (clique regime → aggressive dedup pays) or many
    * shallow chains (path regime → near-dup removal barely shrinks the
    * corpus). Standard distributed triangle counting over ORIENTED
    * edges (doc_a < doc_b by construction, so each triangle x<y<z is
    * counted exactly once as (x,y)+(y,z) closed by (x,z)): one
    * self-equi-join on the shared vertex + one LEFT SEMI close — never
    * an all-pairs step, and the edge set is already band-bucket-capped
    * ([[BandBucketCap]]) so a boilerplate mega-bucket cannot explode
    * the wedge join. Wedge total ΣC(deg,2) comes from the degree
    * aggregate in closed form. All counts exact integers; ONE IEEE
    * division for the transitivity. */
  /** Triangle census over an ORIENTED edge frame `(doc_a, doc_b)` with
    * doc_a < doc_b on every row — the q235 math, factored so the spec
    * can drive it with planted graphs (a clique must read transitivity
    * 1.0, a path 0.0). One self-equi-join on the shared vertex + one
    * LEFT SEMI close; wedges in closed form from the degree aggregate. */
  private[graft] def triangleCensus(pairs: DataFrame): DataFrame = {
    val deg = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("dg"))
    val nodeAgg = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("dg * (dg - 1) div 2")).cast("long").as("n_wedges"))
    val edgeAgg = pairs.agg(count(lit(1)).as("n_edges"))
    val e1 = pairs.as("e1"); val e2 = pairs.as("e2"); val e3 = pairs.as("e3")
    val triAgg = e1
      .join(e2, col("e1.doc_b") === col("e2.doc_a"))
      .join(e3, col("e1.doc_a") === col("e3.doc_a") &&
        col("e2.doc_b") === col("e3.doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // scalar-broadcast idiom: three 1-row aggregates
    nodeAgg.crossJoin(broadcast(edgeAgg)).crossJoin(broadcast(triAgg))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3L) * col("n_triangles")).cast("double") / col("n_wedges"))
          .as("transitivity"))
  }

  val dupTriangles: Q = Q(
    "q235_dup_triangles",
    (s, d) => triangleCensus(graft.CacheScope.cached(
      verifiedPairs(s, d, Some(BandBucketCap)).select("doc_a", "doc_b"))),
    Some(s"""WITH ${sqlVerified(Some(BandBucketCap))},
      pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM verified
        WHERE jaccard >= 0.8),
      deg AS (SELECT doc, cast(count(*) as bigint) AS dg
        FROM (SELECT doc_a AS doc FROM pairs
              UNION ALL SELECT doc_b FROM pairs)
        GROUP BY doc),
      na AS (SELECT cast(count(*) as bigint) AS n_nodes,
          cast(sum(dg * (dg - 1) // 2) as bigint) AS n_wedges FROM deg),
      ea AS (SELECT cast(count(*) as bigint) AS n_edges FROM pairs),
      ta AS (SELECT cast(count(*) as bigint) AS n_triangles
        FROM pairs e1 JOIN pairs e2 ON e1.doc_b = e2.doc_a
        WHERE EXISTS (SELECT 1 FROM pairs e3
          WHERE e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b))
      SELECT n_nodes, n_edges, n_wedges, n_triangles,
        CASE WHEN n_wedges > 0
          THEN cast(3 * n_triangles as double) / n_wedges END
          AS transitivity
      FROM na, ea, ta"""),
    bench = true)

  /** q238 — cluster-colocated shard assignment audit: a shard layout
    * that scatters a near-dup cluster across shards defeats every
    * shard-local pass downstream (shard-local dedup re-admits the
    * scattered copies; shard-local packing pads what a colocated shard
    * would have deduped). Compares the naive layout (shard =
    * hash(doc_id) mod N — [[graft.operators.TrainingExport]]'s
    * content-hash default) against the cluster-aware one (shard =
    * hash(cluster_root) mod N) over the q56 components: per strategy,
    * how many clusters fragment across >1 shard and how many EXTRA
    * shard touches the scatter costs. The cluster-aware row is zero
    *-fragmentation BY CONSTRUCTION — and the oracle hash-proves it
    * rather than asserting it.
    *
    * Scale shape: the cluster frame is the q56 machinery (bounded
    * candidate pairs, checkpointed min-label rounds); on top of it this
    * audit is one union of two narrow projections + two map-combinable
    * hash aggregates. Shard ids are salted 61-bit content hashes mod 8
    * (the q77 discipline), bit-identical across engines. */
  val shardColocation: Q = Q(
    "q238_shard_colocation",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      def shardOf(c: Column): Column =
        md5h61(concat(lit("shard:"), c.cast("string"))) % lit(8L)
      val cl = graft.CacheScope.cached(clustersDf(s, d))
      val labeled = cl
        .select(col("cluster_root"), lit("doc_hash").as("strategy"),
          shardOf(col("doc_id")).as("shard"))
        .union(cl.select(col("cluster_root"),
          lit("cluster_hash").as("strategy"),
          shardOf(col("cluster_root")).as("shard")))
      labeled
        .groupBy("strategy", "cluster_root")
        .agg(countDistinct(col("shard")).as("ns"), count(lit(1)).as("nd"))
        .groupBy("strategy")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("nd")).cast("long").as("n_docs"),
          count(when(col("ns") > 1, 1)).as("n_fragmented"),
          sum(col("ns") - 1).cast("long").as("extra_shards"),
          (count(when(col("ns") > 1, 1)).cast("double") / count(lit(1)))
            .as("frag_rate"))
        .orderBy("strategy")
    },
    Some(s"""WITH RECURSIVE $sqlClustersChain,
      lab AS (SELECT cluster_root, 'doc_hash' AS strategy,
          ${sqlMd5h61("concat('shard:', doc_id)")} % 8 AS shard
        FROM clusters
        UNION ALL
        SELECT cluster_root, 'cluster_hash' AS strategy,
          ${sqlMd5h61("concat('shard:', cluster_root)")} % 8 AS shard
        FROM clusters),
      per AS (SELECT strategy, cluster_root,
          cast(count(DISTINCT shard) as bigint) AS ns,
          cast(count(*) as bigint) AS nd
        FROM lab GROUP BY 1, 2)
      SELECT strategy, cast(count(*) as bigint) AS n_clusters,
        cast(sum(nd) as bigint) AS n_docs,
        cast(count_if(ns > 1) as bigint) AS n_fragmented,
        cast(sum(ns - 1) as bigint) AS extra_shards,
        cast(count_if(ns > 1) as double) / count(*) AS frag_rate
      FROM per GROUP BY 1 ORDER BY 1"""))

  /** q240 — MinHash estimator calibration curve: per ESTIMATED-jaccard
    * decile, how far off is the K=$K signature estimate from exact
    * shingle jaccard (MAE + signed bias), and what fraction of the
    * decile's candidates verify at the 0.8 cut? q91 reports ONE global
    * MAE; this is the curve that places the LSH admission threshold —
    * if the 0.6–0.7 decile already verifies at 90%, the verify join is
    * over-paying; if the 0.8–0.9 decile verifies at 60%, estimate-only
    * admission would poison the dedup (the measured version of q211's
    * theoretical s-curve). Decile ids are exact: est = matches/16 is a
    * dyadic rational, ·10 and floor are IEEE-identical across engines
    * (the q192 bucket discipline); est=1.0 clamps into decile 9.
    * Same bounded candidate machinery as q37/q91 — one hash aggregate
    * on top, ≤10 output rows. */
  val minhashCalibration: Q = Q(
    "q240_minhash_calibration",
    (s, d) => scoredPairs(s, d)
      .groupBy(least(floor(col("est_jaccard") * 10).cast("long"), lit(9L))
        .as("est_decile"))
      .agg(count(lit(1)).as("n_pairs"),
        davg(abs(col("est_jaccard") - col("jaccard"))).as("mae"),
        davg(col("est_jaccard") - col("jaccard")).as("bias"),
        (count(when(col("jaccard") >= 0.8, 1)).cast("double") /
          count(lit(1))).as("precision_at_08"))
      .orderBy("est_decile"),
    Some(s"""WITH $sqlVerifiedChain
      SELECT least(cast(floor(est_jaccard * 10) as bigint), 9)
          AS est_decile,
        count(*) AS n_pairs,
        ${sqlDavg("abs(est_jaccard - jaccard)")} AS mae,
        ${sqlDavg("(est_jaccard - jaccard)")} AS bias,
        cast(count_if(jaccard >= 0.8) as double) / count(*)
          AS precision_at_08
      FROM verified GROUP BY 1 ORDER BY 1"""))

  /** q254 — b-bit minwise compression audit (Li & König 2010): storing
    * only the LOW b = 4 bits of each of the K = $K minhash components
    * shrinks the signature 16× — but low-bit collisions happen by
    * chance at rate 1/2ᵇ even between unrelated sets, so the raw
    * collision fraction needs the debias (c/K − 1/2ᵇ)/(1 − 1/2ᵇ),
    * which for b = 4, K = 16 reduces to the EXACT RATIONAL (c − 1)/15
    * — one IEEE division of exact integers, no estimator constant ever
    * rounded. The audit puts the full estimator, the debiased b-bit
    * estimator and exact jaccard side by side per estimated-jaccard
    * decile (the q240 curve for the compressed signature): the
    * measurement behind "can the signature store drop to 4 bits per
    * component at 100 TB". Same bounded candidate machinery as
    * q37/q91/q240; one hash aggregate on top, ≤ 10 rows. Negative
    * debiased estimates (c < 1) are real estimator output and kept —
    * clamping would bias the MAE the audit exists to measure. */
  val bbitMinhashAudit: Q = {
    val bMask = 15L // low 4 bits
    Q(
      "q254_bbit_minhash",
      (s, d) => {
        val enriched = graft.CacheScope.cached(signedSets(s, d))
        // cached (r18): both self-join sides re-ran the 8-band md5
        // projection over the fat signed-sets cache otherwise
        val bandsAll = graft.CacheScope.cached(enriched.select(col("doc_id"),
          posexplode(array((0 until Bands).map(bandCol): _*))
            .as(Seq("band_id", "bh"))))
        val a = bandsAll.as("a"); val b = bandsAll.as("b")
        val cand = a.join(b,
          col("a.band_id") === col("b.band_id") &&
            col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val x = enriched.as("x"); val y = enriched.as("y")
        val fullMatches = mhNames.map(m =>
          when(col(s"x.$m") === col(s"y.$m"), 1).otherwise(0)).reduce(_ + _)
        val bbitMatches = mhNames.map(m =>
          when(col(s"x.$m").bitwiseAND(lit(bMask)) ===
            col(s"y.$m").bitwiseAND(lit(bMask)), 1).otherwise(0))
          .reduce(_ + _)
        val inter = size(array_intersect(col("x.sh"), col("y.sh")))
        cand
          .join(x, col("doc_a") === col("x.doc_id"))
          .join(y, col("doc_b") === col("y.doc_id"))
          .select(
            (fullMatches.cast("double") / K).as("est_full"),
            ((bbitMatches - 1).cast("double") / 15).as("est_b4"),
            (inter.cast("double") /
              (size(col("x.sh")) + size(col("y.sh")) - inter)).as("jaccard"))
          .groupBy(least(floor(col("est_full") * 10).cast("long"), lit(9L))
            .as("est_decile"))
          .agg(count(lit(1)).as("n_pairs"),
            davg(abs(col("est_full") - col("jaccard"))).as("mae_full"),
            davg(abs(col("est_b4") - col("jaccard"))).as("mae_b4"))
          .orderBy("est_decile")
      },
      Some {
        val fullSum = mhNames.map(m =>
          s"CASE WHEN x.$m = y.$m THEN 1 ELSE 0 END").mkString(" + ")
        val bbitSum = mhNames.map(m =>
          s"CASE WHEN (x.$m & $bMask) = (y.$m & $bMask) THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH $sqlShingleSets, $sqlSignatures,
          bands_all AS ($sqlBandsAll),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands_all a JOIN bands_all b
              ON a.band_id = b.band_id AND a.bh = b.bh
                AND a.doc_id < b.doc_id),
          sc AS (SELECT
              cast($fullSum as double) / $K AS est_full,
              cast(($bbitSum) - 1 as double) / 15 AS est_b4,
              cast(len(list_intersect(p.sh, q.sh)) as double) /
                (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)))
                AS jaccard
            FROM cand c
            JOIN sig x ON x.doc_id = c.doc_a
            JOIN sig y ON y.doc_id = c.doc_b
            JOIN sets p ON p.doc_id = c.doc_a
            JOIN sets q ON q.doc_id = c.doc_b)
          SELECT least(cast(floor(est_full * 10) as bigint), 9)
              AS est_decile,
            count(*) AS n_pairs,
            ${sqlDavg("abs(est_full - jaccard)")} AS mae_full,
            ${sqlDavg("abs(est_b4 - jaccard)")} AS mae_b4
          FROM sc GROUP BY 1 ORDER BY 1"""
      })
  }

  /** q255 — cross-sketch calibration: SimHash Hamming distance vs exact
    * shingle jaccard, measured ON the MinHash-verified near-dup pairs
    * (q37's jaccard ≥ 0.8 set). q39 admits pairs at Hamming ≤ 3 by
    * convention — this is the data that places that threshold: per
    * Hamming distance, how many true near-dup pairs land there and
    * their mean exact jaccard. A fat tail at distance > 3 means the
    * SimHash gate is dropping real duplicates the MinHash gate catches
    * (the two sketches disagree exactly where token-frequency voting
    * and set overlap diverge). popcount of the XOR is `bit_count` on
    * both engines — exact integers throughout.
    *
    * Scale shape: the bounded q37 candidate machinery + the linear q38
    * signature scan, joined pair→signature twice on doc_id; one hash
    * aggregate over ≤ 33 Hamming cells. */
  val simhashVsJaccard: Q = Q(
    "q255_simhash_vs_jaccard",
    (s, d) => {
      val sims = simhashDf(s, d)
      verifiedPairs(s, d, Some(BandBucketCap))
        .select("doc_a", "doc_b", "jaccard")
        .join(sims.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("simhash", "sim_a"), "doc_a")
        .join(sims.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("simhash", "sim_b"), "doc_b")
        .select(bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
          .cast("long").as("hamming"), col("jaccard"))
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"),
          davg(col("jaccard")).as("mean_jaccard"))
        .orderBy("hamming")
    },
    Some(s"""WITH ${sqlVerified(Some(BandBucketCap))},
      vp AS (SELECT doc_a, doc_b, jaccard FROM verified
        WHERE jaccard >= 0.8),
      $sqlSimhash,
      j AS (SELECT cast(bit_count(xor(sa.simhash, sb.simhash)) as bigint)
            AS hamming, vp.jaccard
        FROM vp JOIN sim sa ON sa.doc_id = vp.doc_a
                JOIN sim sb ON sb.doc_id = vp.doc_b)
      SELECT hamming, count(*) AS n_pairs,
        ${sqlDavg("jaccard")} AS mean_jaccard
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** q262 — corpus NOVELTY curve over arrival batches: per decile of
    * the doc_id space (batch = doc_id·10 div (max_id+1), exact integer
    * arithmetic both engines), the distinct word-3-gram shingle hashes
    * the batch contributes, how many are FIRST SEEN there, the novelty
    * rate in exact ppm, and the cumulative distinct-hash count. This is
    * the diminishing-returns readout a corpus team consults before
    * paying for the next crawl tranche: a flattening cum_distinct and a
    * falling novelty_ppm say new batches re-tread known text — the
    * data-constrained-regime signal q204 prices on the TOKEN side,
    * measured here on content identity (and the batch-grain twin of
    * q127's per-doc incremental admit).
    *
    * Shapes: ONE shingle pass (the batch-keyed sets are cached and feed
    * both the per-batch doc count and the hash explode), one
    * (batch, h) distinct (also cached — it feeds the per-batch count
    * AND the first-seen min-aggregate), then a |batches|-row join and
    * running sum. Every aggregate is map-combinable; output cardinality
    * is the batch count, never the corpus. At 100 TB the (batch, h)
    * distinct is the one real shuffle — the same cardinality class as
    * every shingle-keyed dedup op here. */
  val noveltyCurve: Q = Q(
    "q262_novelty_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val m = Tables.documents(s, d)
        .agg((max(col("doc_id")) + lit(1L)).as("m"))
      val sb = graft.CacheScope.cached(
        shingleSets(s, d).crossJoin(broadcast(m))
          .select(col("doc_id"), expr("(doc_id * 10) div m").as("batch"),
            col("sh")))
      val nd = sb.groupBy("batch").agg(count(lit(1)).as("n_docs"))
      val px = graft.CacheScope.cached(
        sb.select(col("batch"), explode(col("sh")).as("h")).distinct())
      val pb = px.groupBy("batch").agg(count(lit(1)).as("n_hashes"))
      val fb = px.groupBy("h").agg(min(col("batch")).as("batch"))
        .groupBy("batch").agg(count(lit(1)).as("n_new"))
      nd.join(pb, "batch").join(fb, Seq("batch"), "left")
        .select(col("batch"), col("n_docs"), col("n_hashes"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("novelty_ppm", expr("(n_new * 1000000) div n_hashes"))
        .withColumn("cum_distinct",
          sum(col("n_new")).over(Window.orderBy("batch")))
        .orderBy("batch")
    },
    Some(s"""WITH $sqlShingleSets,
        mm AS (SELECT max(doc_id) + 1 AS m FROM documents),
        sb AS MATERIALIZED (SELECT doc_id,
            doc_id * 10 // (SELECT m FROM mm) AS batch, sh FROM sets),
        px AS MATERIALIZED (SELECT DISTINCT batch, u.h AS h
          FROM sb, unnest(sh) AS u(h)),
        nd AS (SELECT batch, cast(count(*) as bigint) AS n_docs
          FROM sb GROUP BY 1),
        pb AS (SELECT batch, cast(count(*) as bigint) AS n_hashes
          FROM px GROUP BY 1),
        fb AS (SELECT batch, cast(count(*) as bigint) AS n_new
          FROM (SELECT h, min(batch) AS batch FROM px GROUP BY 1)
          GROUP BY 1)
        SELECT nd.batch, nd.n_docs, pb.n_hashes,
          coalesce(fb.n_new, 0) AS n_new,
          cast(coalesce(fb.n_new, 0) * 1000000 // pb.n_hashes as bigint)
            AS novelty_ppm,
          cast(sum(coalesce(fb.n_new, 0)) OVER (ORDER BY nd.batch)
            as bigint) AS cum_distinct
        FROM nd JOIN pb USING (batch) LEFT JOIN fb USING (batch)
        ORDER BY batch"""))

  /** q264 — LSH band-budget ablation: what each ADDITIONAL band buys.
    * Every candidate pair is tagged with the FIRST band index on which
    * it collides, so one candidate join + one verification pass yields
    * the whole curve: for a budget of b bands, the pairs found are
    * exactly those with first_band < b (a b-band deployment sees a
    * prefix of the 8-band candidate set — bands are independent hash
    * functions, so prefixes are what an ablation means). Output per
    * budget 1..8: cumulative candidate pairs (the COST — each pair is
    * one verification), cumulative verified dups, and recall vs the
    * full 8-band verified set in exact ppm. This is the tuning-economics
    * readout q211 predicts from theory and q180 measures at one
    * operating point: at 100 TB you pay per band in index size, shuffle
    * volume and verify joins, and this curve is the evidence for
    * dropping bands a corpus doesn't need (all-integer outputs — no
    * float drift; the ppm is an exact integer division).
    *
    * Scale shape: the same banded equi-join as q37 (content-blocked,
    * never O(n²)) with min(band_id) folded into the pair groupBy that
    * q37 already pays (distinct ≡ groupBy), one verify join, then an
    * 8-row grid aggregate — the ablation is FREE relative to q37. */
  val lshBandAblation: Q = Q(
    "q264_lsh_band_ablation",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val enriched = graft.CacheScope.cached(signedSets(s, d))
      val bands = enriched.select(col("doc_id"),
        posexplode(array(bandColumns: _*)).as(Seq("band_id", "bh")))
      val a = bands.as("a"); val b = bands.as("b")
      val cand = a.join(b,
          col("a.band_id") === col("b.band_id") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.band_id").as("band_id"))
        .groupBy("doc_a", "doc_b").agg(min(col("band_id")).as("first_band"))
      val x = enriched.as("x"); val y = enriched.as("y")
      val inter = size(array_intersect(col("x.sh"), col("y.sh")))
      val ver = cand
        .join(x, col("doc_a") === col("x.doc_id"))
        .join(y, col("doc_b") === col("y.doc_id"))
        .select(col("first_band"),
          when((inter.cast("double") /
            (size(col("x.sh")) + size(col("y.sh")) - inter)) >= 0.8, 1L)
            .otherwise(0L).as("is_dup"))
      val per = ver.groupBy("first_band")
        .agg(count(lit(1)).as("n_cand"), sum(col("is_dup")).as("n_ver"))
      val w = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = s.range(Bands).select(col("id").as("band"))
        .join(per, col("band") === col("first_band"), "left")
        .select(col("band"),
          sum(coalesce(col("n_cand"), lit(0L))).over(w)
            .as("n_candidate_pairs"),
          sum(coalesce(col("n_ver"), lit(0L))).over(w).as("n_verified"))
      val tot = cum.agg(max(col("n_verified")).as("tv"))
      cum.crossJoin(broadcast(tot))
        .select((col("band") + 1).as("n_bands"),
          col("n_candidate_pairs"), col("n_verified"),
          // nullif guards the zero-dup corpus: Spark's div yields NULL
          // on a 0 denominator while DuckDB's // raises — both engines
          // must agree on NULL for the degenerate case
          expr("n_verified * 1000000 div nullif(tv, 0)").as("recall_ppm"))
        .orderBy("n_bands")
    },
    Some(s"""WITH $sqlShingleSets, $sqlSignatures,
      bands AS MATERIALIZED ($sqlBandsAll),
      cand AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          min(a.band_id) AS first_band
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bh = b.bh
            AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      ver AS MATERIALIZED (
        SELECT c.first_band,
          CASE WHEN cast(len(list_intersect(p.sh, q.sh)) as double) /
              (len(p.sh) + len(q.sh) - len(list_intersect(p.sh, q.sh)))
              >= 0.8 THEN 1 ELSE 0 END AS is_dup
        FROM cand c JOIN sets p ON p.doc_id = c.doc_a
                    JOIN sets q ON q.doc_id = c.doc_b),
      per AS (SELECT first_band, count(*) AS n_cand,
          cast(sum(is_dup) as bigint) AS n_ver
        FROM ver GROUP BY 1),
      grid AS (SELECT g AS band FROM unnest(generate_series(0, 7)) AS s(g)),
      cum AS (SELECT band + 1 AS n_bands,
          cast(sum(coalesce(n_cand, 0)) OVER (ORDER BY band)
            as bigint) AS n_candidate_pairs,
          cast(sum(coalesce(n_ver, 0)) OVER (ORDER BY band)
            as bigint) AS n_verified
        FROM grid LEFT JOIN per ON per.first_band = grid.band),
      tot AS (SELECT max(n_verified) AS tv FROM cum)
      SELECT n_bands, n_candidate_pairs, n_verified,
        n_verified * 1000000 // nullif(tv, 0) AS recall_ppm
      FROM cum, tot ORDER BY n_bands"""))

  val all: Seq[Q] = Seq(exact, minhashSignatures, minhashLshPairs,
    simhashSignatures, simhashPairs, dupClusters, dedupSurvivors,
    ngramJaccardPairs, ngramJaccardDfCap, containmentPairs,
    prefixJaccardJoin, fuzzyContamination, sketchQuality,
    dupDegrees, dupBySource, incrementalDedup, substringDedup,
    substringRemoval, paragraphDedupQ, incrementalParagraphDedup,
    withinDocDedup, softDedupWeights, lshRecallEval, memorizationAudit,
    dupPagerank, qualityCanonical, leakageSafeSplits, thresholdCurve,
    sourceMirror, lshCalibration, boilerplatePrevalence,
    dupTriangles, shardColocation, minhashCalibration,
    bbitMinhashAudit, simhashVsJaccard, clusterQuality, noveltyCurve,
    lshBandAblation)
}

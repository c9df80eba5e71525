package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over the `embeddings` table
  * (Array[Float], 64-dim): exact cosine near-dup pairs, brute-force ANN
  * top-k, and a hyperplane-LSH-bucketed ANN variant (the scale path).
  *
  * Cross-engine determinism: element-wise products and left-fold sums are
  * performed in the same order with the same IEEE double ops on both
  * engines, so cosines are bit-identical — no rounding needed.
  *
  * Scale notes (100 TB): near-dup pairing is blocked (label partition /
  * LSH bucket) so joins shuffle on the block key instead of crossing;
  * the brute-force path broadcasts the single query vector.
  */
object Similarity {
  import Dsl._

  /** Array[Float] → Array[Double] (per-element cast on both engines). */
  private def vecD(c: Column): Column = transform(c, x => x.cast("double"))
  private def sqlVecD(e: String): String =
    s"list_transform($e, x -> cast(x as double))"

  /** Left-fold dot product — bit-identical to the DuckDB twin. Uses the
    * native codegen expression [[graft.functions.DotProduct]] (registered
    * per session; the interpreted zip_with/aggregate route is ~50x slower
    * on pairwise joins). Takes SQL column references. */
  private def dot(a: String, b: String): Column =
    expr(s"dot_product($a, $b)")
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** The one embedding dimensionality this module's LSH plane literals
    * are generated for. The hyperplane components are inlined as
    * `EmbeddingDim`-element literals into BOTH engines' bucket
    * expressions, so a differently-sized vector would silently diverge
    * (DuckDB `e[i]` past the end yields NULL → CASE 0, Spark's
    * dot_product truncates → real sum). [[normed]] therefore asserts the
    * dimension per row — a dim change fails loudly at load, not quietly
    * at compare time. */
  val EmbeddingDim = 64

  /** Normalized embeddings with precomputed L2 norm (computed once per
    * row, not per pair). */
  private[graft] def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.embeddings(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("vec_id")) // single-file parquet -> use all cores
      .select(col("vec_id"), col("label"),
        when(size(col("embedding")) === EmbeddingDim, vecD(col("embedding")))
          .otherwise(raise_error(concat(
            lit(s"embedding dim != $EmbeddingDim for vec_id="),
            col("vec_id").cast("string"))))
          .as("e"))
      .withColumn("nrm", sqrt(dot("e", "e")))
  }

  private val sqlNormed =
    s"""n AS (SELECT vec_id, label, ${sqlVecD("embedding")} AS e FROM embeddings),
       w AS (SELECT vec_id, label, e,
         sqrt(${sqlDot("e", "e")}) AS nrm FROM n)"""

  /** Vector column sanity surface: dimension + L2 norm per embedding. */
  val norms: Q = Q(
    "q40_embedding_norms",
    (s, d) => normed(s, d)
      .select(col("vec_id"), col("label"),
        size(col("e")).as("dim"), col("nrm").as("l2_norm"))
      .orderBy("vec_id"),
    Some(s"""WITH $sqlNormed
      SELECT vec_id, label, cast(len(e) as int) AS dim, nrm AS l2_norm
      FROM w ORDER BY vec_id"""))

  // Banded hyperplane LSH for the near-dup pair join: `NdBands` bands,
  // each with its own pool of random hyperplanes (sign-random
  // projection). Candidates collide when ANY band bucket matches
  // (OR-amplification — recall survives band-boundary misses that a
  // single coarse partition would drop). Plane components are ±1 derived
  // from md5 so the identical literals inline into the DuckDB oracle.
  //
  // The ACTIVE plane count is corpus-adaptive: a fixed fanout makes
  // bucket population grow linearly with corpus size, which makes the
  // in-bucket pair join quadratic in total at 100x. Both engines derive
  // the count from `count(*)` inside the query itself (integer
  // thresholds — no floating log, so no cross-engine libm drift) and
  // mask the unused high planes, keeping the static oracle SQL
  // hash-identical at every scale.
  private val NdBands = 2
  private val NdDim = EmbeddingDim
  private val MinNdPlanes = 4
  /** Plane-pool size per band; 2^16 buckets/band at the ceiling. */
  private val MaxNdPlanes = 16
  /** Mean bucket population the adaptive fanout aims for. */
  private[graft] val NdTargetBucket = 128L
  private val bandPlaneComps: Seq[Seq[Seq[Int]]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until NdBands).map { bnd =>
      (0 until MaxNdPlanes).map { p =>
        (0 until NdDim).map { i =>
          val h = mdig.digest(s"bandplane:$bnd:$p:$i".getBytes("UTF-8"))
          if ((h(0) & 1) == 1) 1 else -1
        }
      }
    }
  }

  /** Active plane count for a corpus of `n` vectors: smallest p in
    * [MinNdPlanes, MaxNdPlanes] with 2^p buckets ≥ n / target, so mean
    * bucket population stays ~target as the corpus grows and the pair
    * join's total work grows linearly, not quadratically. */
  private[graft] def adaptivePlanes(n: Long,
      target: Long = NdTargetBucket): Int = {
    var p = MinNdPlanes
    while (p < MaxNdPlanes && n > (1L << p) * target) p += 1
    p
  }

  /** Column twin of [[adaptivePlanes]] (exact integer thresholds). */
  private def planesCol(n: Column): Column =
    (MinNdPlanes until MaxNdPlanes).foldRight(lit(MaxNdPlanes): Column) {
      (p, rest) => when(n <= lit((1L << p) * NdTargetBucket), lit(p)).otherwise(rest)
    }

  /** SQL twin of [[planesCol]] over a count expression. */
  private def sqlPlanes(n: String): String =
    (MinNdPlanes until MaxNdPlanes).map(p =>
      s"WHEN $n <= ${(1L << p) * NdTargetBucket} THEN $p")
      .mkString("CASE ", " ", s" ELSE $MaxNdPlanes END")

  private def bandBucketCol(e: String, bnd: Int, planes: Column): Column =
    (0 until MaxNdPlanes).map { p =>
      val arr = bandPlaneComps(bnd)(p).map(v => s"$v.0D").mkString("array(", ", ", ")")
      when(lit(p) < planes && expr(s"dot_product($e, $arr)") > 0,
        lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  private def sqlBandBucket(e: String, bnd: Int, planes: String): String =
    (0 until MaxNdPlanes).map { p =>
      val arr = bandPlaneComps(bnd)(p).map(v => s"$v.0").mkString("[", ", ", "]")
      val pd = s"list_reduce(list_transform(generate_series(1, $NdDim), i -> ($arr::double[])[i] * $e[i]), (x, y) -> x + y)"
      s"CASE WHEN $p < $planes AND $pd > 0 THEN ${1 << p} ELSE 0 END"
    }.mkString(" + ")

  /** Banded (band, bucket) assignment at the adaptive plane count
    * (`planesOverride` pins a fixed count — test surface for comparing
    * fanouts). Carries e/nrm so the pair join can re-rank exactly. */
  private[graft] def bandedBuckets(s: SparkSession, d: String,
      planesOverride: Option[Int] = None): DataFrame = {
    val w0 = normed(s, d)
    val total = w0.agg(count(lit(1)).as("n_vec"))
    val w = w0.crossJoin(broadcast(total))
      .withColumn("planes",
        planesOverride.map(p => lit(p): Column)
          .getOrElse(planesCol(col("n_vec"))))
    (0 until NdBands).map { bnd =>
      w.select(col("vec_id"), col("e"), col("nrm"),
        lit(bnd).as("band"),
        bandBucketCol("e", bnd, col("planes")).as("bucket"))
    }.reduce(_ unionByName _)
  }

  /** Embedding-cosine near-dup pairs, blocked on banded hyperplane-LSH
    * buckets: the pair join shuffles on the content-derived (band,
    * bucket) key, and the bucket COUNT tracks corpus size (adaptive
    * planes) so per-bucket population — and the pair join's work per
    * block — stays ~constant under a 100x scale-up. Exact cosine
    * >= 0.35 verifies each candidate. */
  val nearDupPairs: Q = Q(
    "q41_embed_neardup_pairs",
    (s, d) => {
      val bb = graft.CacheScope.cached(bandedBuckets(s, d))
      val a = bb.as("a"); val b = bb.as("b")
      a.join(b, col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (dot("a.e", "b.e") / (col("a.nrm") * col("b.nrm"))).as("cosine"))
        .distinct() // a pair colliding in both bands appears once
        .filter(col("cosine") >= 0.35)
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH $sqlNormed,
      t AS (SELECT ${sqlPlanes("(SELECT count(*) FROM embeddings)")} AS planes),
      bb AS (${(0 until NdBands).map(bnd =>
        s"SELECT vec_id, e, nrm, $bnd AS band, ${sqlBandBucket("e", bnd, "planes")} AS bucket FROM w, t")
        .mkString(" UNION ALL ")}),
      cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cosine
        FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cosine FROM cand
      WHERE cosine >= 0.35 ORDER BY vec_a, vec_b"""),
    bench = true)

  /** Brute-force cosine top-k for one query vector (vec_id 0): the
    * baseline ANN — a broadcast of the query row + TakeOrderedAndProject. */
  val annBruteForce: Q = Q(
    "q42_ann_bruteforce",
    (s, d) => {
      val w = normed(s, d)
      val q = w.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"))
      w.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cosine", dot("e", "qe") / (col("nrm") * col("qnrm")))
        .select("vec_id", "label", "cosine")
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(10)
    },
    Some(s"""WITH $sqlNormed,
      q AS (SELECT e AS qe, nrm AS qnrm FROM w WHERE vec_id = 0)
      SELECT w.vec_id, w.label,
        ${sqlDot("w.e", "q.qe")} / (w.nrm * q.qnrm) AS cosine
      FROM w, q WHERE w.vec_id <> 0
      ORDER BY cosine DESC, vec_id LIMIT 10"""),
    bench = true)

  // Hyperplane (sign-random-projection) LSH: P planes of ±1 components,
  // derived deterministically from md5 so the identical literals are
  // inlined into the DuckDB oracle.
  private val Planes = 4
  private val Dim = EmbeddingDim
  private val planeComps: Seq[Seq[Int]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until Planes).map { p =>
      (0 until Dim).map { i =>
        val h = mdig.digest(s"plane:$p:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  private def planeDot(e: String, p: Int): Column = {
    val arr = planeComps(p).map(v => s"$v.0D").mkString("array(", ", ", ")")
    expr(s"dot_product($e, $arr)")
  }

  private def sqlPlaneDot(e: String, p: Int): String = {
    val arr = planeComps(p).map(v => s"$v.0").mkString("[", ", ", "]")
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> ($arr::double[])[i] * $e[i]), (x, y) -> x + y)"
  }

  private def bucketCol(e: String): Column =
    (0 until Planes).map(p =>
      when(planeDot(e, p) > 0, lit(1 << p)).otherwise(lit(0))).reduce(_ + _)

  private def sqlBucket(e: String): String =
    (0 until Planes).map(p =>
      s"CASE WHEN ${sqlPlaneDot(e, p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")

  /** LSH-bucketed ANN: candidates share the query's hyperplane sign
    * bucket (16 buckets), then exact cosine re-rank. At scale the bucket
    * id is the shuffle/partition key; only ~1/16 of vectors are touched
    * per probe. */
  val annLsh: Q = Q(
    "q43_ann_lsh",
    (s, d) => {
      val w = graft.CacheScope.cached(
        normed(s, d).withColumn("bucket", bucketCol("e")))
      val q2 = w.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"), col("bucket").as("qbucket"))
      w.filter(col("vec_id") =!= 0)
        .join(broadcast(q2), col("bucket") === col("qbucket"))
        .withColumn("cosine", dot("e", "qe") / (col("nrm") * col("qnrm")))
        .select("vec_id", "label", "bucket", "cosine")
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(10)
    },
    Some(s"""WITH $sqlNormed,
      b AS (SELECT vec_id, label, e, nrm, ${sqlBucket("e")} AS bucket FROM w),
      q AS (SELECT e AS qe, nrm AS qnrm, bucket AS qbucket FROM b WHERE vec_id = 0)
      SELECT b.vec_id, b.label, b.bucket,
        ${sqlDot("b.e", "q.qe")} / (b.nrm * q.qnrm) AS cosine
      FROM b JOIN q ON b.bucket = q.qbucket
      WHERE b.vec_id <> 0
      ORDER BY cosine DESC, vec_id LIMIT 10"""))

  /** IVF-style ANN: KMeans coarse quantizer (16 centroids, seed=1) over
    * the embeddings; the query probes its nearest `nprobe=4` centroid
    * cells and re-ranks candidates by exact cosine. At scale the cell id
    * is the partition key — each probe touches ~nprobe/k of the data; recall tracks how well the data clusters (the synthetic testdata is weakly clustered, so nprobe=4 balances recall vs. scan fraction).
    * KMeans centroids are not SQL-expressible → rows-only check; recall
    * vs brute force is asserted in SimilaritySpec. */
  val annIvf: Q = Q(
    "q55_ann_ivf",
    (s, d) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val w = graft.CacheScope.cached(
        normed(s, d).withColumn("fv", array_to_vector(col("e"))))
      val km = new KMeans().setK(16).setSeed(1)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(w)
      val cells = km.transform(w)
      val centroids = km.clusterCenters
      // nearest 2 centroids of the query vector, computed driver-side
      // from the (tiny) centroid array — not a data-sized collect
      val qe = cells.filter(col("vec_id") === 0)
        .select("e").collect()(0).getSeq[Double](0).toArray
      val probes = centroids.zipWithIndex.map { case (c, i) =>
        val dist = math.sqrt(c.toArray.zip(qe).map { case (a, b) =>
          (a - b) * (a - b) }.sum)
        (i, dist)
      }.sortBy(_._2).take(4).map(_._1)
      val q2 = cells.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"))
      cells.filter(col("vec_id") =!= 0 && col("cell").isin(probes.toSeq: _*))
        .crossJoin(broadcast(q2))
        .withColumn("cosine", dot("e", "qe") / (col("nrm") * col("qnrm")))
        .select("vec_id", "label", "cell", "cosine")
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(10)
    },
    None)

  /** q144: incremental IVF — the refresh path of the q55 index
    * lifecycle. The coarse quantizer is fit ONCE on the existing corpus
    * (vec_id % 10 < 8, k=16 seed=1); the new batch (vec_id % 10 >= 8)
    * is assigned to those centroids by [[IvfIndex.assignToCentroids]]'s
    * argmin scan — no refit, no shuffle, the existing side never
    * recomputed (q127's incremental-dedup shape applied to ANN) — and
    * the query probes its nprobe=4 nearest cells over the COMBINED
    * corpus. KMeans centroids are not SQL-expressible → rows-only;
    * recall vs combined-corpus brute force and assignment correctness
    * are asserted in IvfIndexSpec. */
  val annIvfIncremental: Q = Q(
    "q144_ivf_incremental",
    (s, d) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val w = graft.CacheScope.cached(normed(s, d))
      val base = w.filter(col("vec_id") % 10 < 8)
        .withColumn("fv", array_to_vector(col("e")))
      val km = new KMeans().setK(16).setSeed(1)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(base)
      val baseCells = km.transform(base)
        .select("vec_id", "label", "e", "nrm", "cell")
      val centroids = km.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }.toSeq
      val newCells = IvfIndex
        .assignToCentroids(w.filter(col("vec_id") % 10 >= 8), centroids)
        .select("vec_id", "label", "e", "nrm", "cell")
      val cells = baseCells.unionByName(newCells)
      val qe = w.filter(col("vec_id") === 0)
        .select("e").collect()(0).getSeq[Double](0).toArray
      val probes = centroids.map { case (i, c) =>
        (i, c.zip(qe).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy(_._2).take(4).map(_._1)
      val q2 = w.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"))
      cells.filter(col("vec_id") =!= 0 && col("cell").isin(probes: _*))
        .crossJoin(broadcast(q2))
        .withColumn("cosine", dot("e", "qe") / (col("nrm") * col("qnrm")))
        .select("vec_id", "label", "cell", "cosine")
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(10)
    },
    None)

  // ------------------------------------------------------------------
  // q151 — semantic dedup, SemDeDup-shape (Abbas et al. 2023: cluster
  // the embedding space, then prune near-identical pairs WITHIN each
  // cluster — candidates are cluster-bounded, so the pair join never
  // goes corpus-wide the way document-level LSH does). The coarse
  // quantizer here is PINNED: k=16 sign-component centroids derived
  // from md5 (the q148/q98b fixed-artifact discipline — a seeded
  // k-means fit, like q50's, is not SQL-replicable; fixed literals make
  // assignment + within-cell pairing + pruning all DuckDB-verified).
  // Assignment reuses IvfIndex.assignToCentroids' argmin scan — the
  // exact same expression the incremental-IVF path (q144) runs.
  //
  // Output = the PRUNE LIST, keep-lowest policy: one row per vector
  // that has an in-cell neighbor with lower vec_id at cosine >= tau,
  // carrying its keeper (min such neighbor), n_close, and max_cosine.
  //
  // Scale shape: assignment is a per-row projection (centroids are
  // k-bounded literals, zero shuffles); the pair join shuffles on the
  // cell id and is quadratic only WITHIN a cell — SemDeDup's entire
  // point (the paper runs 50k clusters on 100M+ docs). The ACTIVE
  // cell count is therefore corpus-adaptive, exactly like q41's plane
  // fanout: a 64-centroid pool is pinned, and the smallest power-of-2
  // prefix k ∈ {16, 32, 64} with k · target ≥ n is active — mean cell
  // population stays ~target as the corpus grows, so per-cell pair
  // work grows linearly in total, not quadratically. Both engines
  // derive k from count(*) inside the query (exact integer
  // thresholds, no libm) and mask the inactive pool tail, keeping the
  // static oracle SQL hash-identical at every scale; the active set
  // is a PREFIX of the pool, so a corpus crossing a threshold refines
  // the partition without changing any centroid. The recall boundary
  // is inherent: a near-pair straddling a cell boundary is never
  // compared (documented + pinned in SimilaritySpec).
  // ------------------------------------------------------------------
  /** Pinned centroid-pool size; [[adaptiveSemCells]] activates a
    * prefix. */
  private val SemPoolK = 64
  private val SemMinCells = 16
  /** Mean cell population the adaptive cell count aims for. */
  private[graft] val SemTargetCell = 128L
  private[graft] val SemTau = 0.35
  private[graft] val semCentroids: Seq[(Int, Array[Double])] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until SemPoolK).map { c =>
      (c, (0 until EmbeddingDim).map { i =>
        val h = mdig.digest(s"semcent:$c:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1.0 else -1.0
      }.toArray)
    }
  }

  /** Active cell count for a corpus of `n` vectors: smallest
    * power-of-2 k in [SemMinCells, SemPoolK] with k · target ≥ n. */
  private[graft] def adaptiveSemCells(n: Long,
      target: Long = SemTargetCell): Int = {
    var k = SemMinCells
    while (k < SemPoolK && n > k.toLong * target) k *= 2
    k
  }

  /** Column twin of [[adaptiveSemCells]] (exact integer thresholds). */
  private def semCellsCol(n: Column): Column =
    Seq(SemMinCells, SemMinCells * 2).foldRight(lit(SemPoolK): Column) {
      (k, rest) => when(n <= lit(k.toLong * SemTargetCell), lit(k)).otherwise(rest)
    }

  /** SQL twin of [[semCellsCol]] over a count expression. */
  private def sqlSemCells(n: String): String =
    Seq(SemMinCells, SemMinCells * 2).map(k =>
      s"WHEN $n <= ${k.toLong * SemTargetCell} THEN $k")
      .mkString("CASE ", " ", s" ELSE $SemPoolK END")

  /** Masked argmin over the pool: entries at or past the active count
    * score 1.0e308, so the min can only land in the active prefix —
    * within it, the score expression is IDENTICAL to
    * IvfIndex.assignToCentroids' (|c|² − 2·e·c, ties to the lower
    * cell via struct ordering). */
  private def semCellCol(ka: Column): Column = {
    val scored = semCentroids.map { case (cellId, c) =>
      val c2 = c.map(x => x * x).sum
      struct(
        when(lit(cellId) < ka,
          lit(c2) - lit(2.0) * call_function("dot_product",
            col("e"), array(c.toSeq.map(lit): _*)))
          .otherwise(lit(1.0e308)).as("score"),
        lit(cellId).as("cell"))
    }
    array_min(array(scored: _*)).getField("cell")
  }

  val semanticDedup: Q = Q(
    "q151_semantic_dedup",
    (s, d) => {
      val w0 = normed(s, d)
      val total = w0.agg(count(lit(1)).as("n_vec"))
      val cells = w0.crossJoin(broadcast(total))
        .withColumn("cell", semCellCol(semCellsCol(col("n_vec"))))
        .select("vec_id", "e", "nrm", "cell")
      // no cache: both self-join sides shuffle on the identical
      // (scan -> assign -> exchange) subplan, so Catalyst reuses one
      // exchange (plan-audited in SimilaritySpec) — the embeddings
      // parquet is read once plus a column-pruned count(*) footer
      // scan for n_vec
      val a = cells.as("a"); val b = cells.as("b")
      a.join(b, col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"), col("b.cell").as("cell"),
          col("a.vec_id").as("nbr"),
          (dot("a.e", "b.e") / (col("a.nrm") * col("b.nrm"))).as("cosine"))
        .filter(col("cosine") >= SemTau)
        .groupBy("vec_id", "cell")
        .agg(min("nbr").as("keeper"), count(lit(1)).as("n_close"),
          max(col("cosine")).as("max_cosine"))
        .orderBy("vec_id")
    },
    Some {
      // the same pinned centroid pool inlined as literals, masked by
      // the count-derived active prefix; argmin via
      // list_position(scores, list_min(scores)) — first index of the
      // min, i.e. ties break to the LOWER cell exactly like the Spark
      // side's (score, cell) struct ordering
      val scores = semCentroids.map { case (cellId, c) =>
        val c2 = c.map(x => x * x).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"(CASE WHEN $cellId < ka THEN ($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $EmbeddingDim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y)) ELSE 1.0e308 END)"
      }.mkString(", ")
      s"""WITH $sqlNormed,
        ka AS (SELECT ${sqlSemCells("(SELECT count(*) FROM embeddings)")} AS ka),
        sc AS (SELECT vec_id, e, nrm, [$scores] AS scores FROM w, ka),
        cells AS (SELECT vec_id, e, nrm,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        p AS (SELECT b.vec_id AS vec_id, b.cell AS cell, a.vec_id AS nbr,
            ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cosine
          FROM cells a JOIN cells b
            ON a.cell = b.cell AND a.vec_id < b.vec_id)
        SELECT vec_id, cell, min(nbr) AS keeper,
          cast(count(*) as bigint) AS n_close, max(cosine) AS max_cosine
        FROM p WHERE cosine >= $SemTau
        GROUP BY vec_id, cell ORDER BY vec_id"""
    },
    bench = true)

  /** Multimodal columns: opaque binary payload + typed metadata. The
    * decode step is a stub (no image libs in this container) — what's
    * real and verified is the binary handling: byte length, content
    * hash, sniffed prefix, and deterministic fake dimensions derived
    * from the shared 61-bit hash. */
  val multimodalMeta: Q = Q(
    "q44_multimodal_meta",
    (s, d) => Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        substring(col("text"), 1, 4).as("magic"),
        (lit(32) + (md5h61(concat(lit("w:"), col("text"))) % 448).cast("int")).as("fake_width"),
        (lit(32) + (md5h61(concat(lit("h:"), col("text"))) % 320).cast("int")).as("fake_height"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      cast(octet_length(encode(text)) as int) AS n_bytes,
      md5(text) AS content_md5,
      substr(text, 1, 4) AS magic,
      32 + cast(${sqlMd5h61("'w:' || text")} % 448 as int) AS fake_width,
      32 + cast(${sqlMd5h61("'h:' || text")} % 320 as int) AS fake_height
      FROM documents ORDER BY doc_id"""))

  /** Array/higher-order function suite over the vector column: size,
    * element access, slice, reverse head, min/max, lambda filter/exists,
    * sorted prefix. All engine-aligned (1-based inclusive slicing on
    * both; lambda filters via list_filter). Slice results are projected
    * to scalar element columns — numeric scalars hash identically across
    * engines, array cells do not. */
  val arrayFuncs: Q = Q(
    "q64_array_funcs",
    (s, d) => {
      val sorted3 = slice(array_sort(vecD(col("embedding"))), 1, 3)
      Tables.embeddings(s, d)
        .select(col("vec_id"), vecD(col("embedding")).as("e"),
          sorted3.as("s3"))
        .select(
          col("vec_id"),
          size(col("e")).as("dim"),
          element_at(col("e"), 1).as("first_val"),
          element_at(col("e"), -1).as("last_val"),
          element_at(col("e"), 2).as("head_2"),
          element_at(col("e"), 3).as("head_3"),
          element_at(col("e"), 4).as("head_4"),
          element_at(reverse(col("e")), 1).as("rev_head"),
          array_max(col("e")).as("vmax"),
          array_min(col("e")).as("vmin"),
          size(filter(col("e"), x => x > 0)).as("n_positive"),
          exists(col("e"), x => x > 0.9).as("has_large"),
          element_at(col("s3"), 1).as("bottom_1"),
          element_at(col("s3"), 2).as("bottom_2"),
          element_at(col("s3"), 3).as("bottom_3"))
        .orderBy("vec_id")
    },
    Some(s"""WITH n AS (SELECT vec_id, ${sqlVecD("embedding")} AS e FROM embeddings)
      SELECT vec_id,
        cast(len(e) as int) AS dim,
        e[1] AS first_val,
        e[len(e)] AS last_val,
        e[2] AS head_2,
        e[3] AS head_3,
        e[4] AS head_4,
        list_reverse(e)[1] AS rev_head,
        list_max(e) AS vmax,
        list_min(e) AS vmin,
        cast(len(list_filter(e, x -> x > 0)) as int) AS n_positive,
        len(list_filter(e, x -> x > 0.9)) > 0 AS has_large,
        list_sort(e)[1] AS bottom_1,
        list_sort(e)[2] AS bottom_2,
        list_sort(e)[3] AS bottom_3
      FROM n ORDER BY vec_id"""))

  // ------------------------------------------------------------------
  // q161/q162 — product quantization (Jégou, Douze, Schmid 2011:
  // "Product Quantization for Nearest Neighbor Search"). THE way
  // 100 TB of embeddings becomes a RAM-resident search structure:
  // split each vector into M subvectors, quantize each against a
  // K-codeword codebook, store M small codes instead of the floats —
  // here 64 float32 = 256 B/vector becomes 8 codes (4 bits each at
  // K=16), a 64× compression — and answer queries with Asymmetric
  // Distance Computation: precompute the M × K table of squared
  // distances from the QUERY's subvectors to every codeword ONCE, then
  // score each database vector with M table lookups + (M−1) adds, no
  // float math against the vector itself (the codes are all you read).
  //
  // The codebook is DATA-DERIVED but deterministic: codeword j of
  // subspace m is the m-th subvector of the vector with vec_id = j —
  // the sample-init baseline every k-means codebook training starts
  // from. A TRAINED per-subspace fit is a seeded MLlib k-means — the
  // q50 class of inherent non-SQL-replicability (q50b oracle-verifies
  // the Lloyd step math separately); the sample codebook keeps the
  // ENTIRE encode + ADC search path DuckDB-verified bit-exactly, and
  // fit quality is orthogonal to the operator's correctness. (An
  // md5-sign pinned codebook was tried first and measured recall@10 ≈
  // 0.06 on this corpus — decorative, not an operator; the sample
  // codebook measures ≈ 0.34 mean on isotropic synthetic embeddings,
  // PQ's adversarial case.)
  //
  // Scale shape: the registry instances build the codebook as a
  // K-row broadcast frame and score via an M-row explode — fully
  // self-contained SQL for the oracle. The 100 TB shape is
  // [[pqEncodeScan]]: collect the K×M codebook driver-side (k-bounded,
  // the IvfIndex discipline) and inline it as literals — the encode
  // becomes a ZERO-shuffle scan projection (SimilaritySpec pins it
  // equal to q161 row-for-row). q162's ADC broadcasts the 1-row
  // query-side lookup table (scalar-broadcast idiom) over the codes;
  // per-row cost is M element_at's + fixed-order adds. The ACCURACY
  // boundary is inherent to PQ (quantization error ⇒ approximate
  // ranking); SimilaritySpec pins recall@10 against exact search —
  // embeddings are unit-norm, so exact-L2 order IS exact-cosine order
  // (q42) — and ADC self-consistency against a Scala recomputation.
  // ------------------------------------------------------------------
  private[graft] val PqM = 8 // subspaces
  private[graft] val PqD = EmbeddingDim / PqM // dims per subspace
  private[graft] val PqK = 16 // codewords per subspace

  /** (vec_id, label, m, j, score): squared L2 from each vector's
    * subspace-m subvector to codeword j (the m-th subvector of vector
    * j). Shared by q161 (argmin per (vec, m) = the code) and q162 (the
    * vec_id = 0 slice IS the query's ADC lookup table). Left-fold sum,
    * same order as the SQL twin. */
  private def pqScored(s: SparkSession, d: String): DataFrame = {
    val w = normed(s, d).select(col("vec_id"), col("label"), col("e"))
    val cb = w.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int").as("j"), col("e").as("ce"))
    val dist = (0 until PqD).map { i =>
      val idx = col("m") * PqD + lit(i + 1)
      val diff = element_at(col("e"), idx) - element_at(col("ce"), idx)
      diff * diff
    }.reduce(_ + _)
    w.select(col("vec_id"), col("label"), col("e"),
        explode(array((0 until PqM).map(lit(_)): _*)).as("m"))
      .join(broadcast(cb))
      .select(col("vec_id"), col("label"), col("m"), col("j"),
        dist.as("score"))
  }

  /** Per (vec, m) argmin over the K codewords — ties to the lower code
    * via (score, j) struct ordering, [[IvfIndex.assignToCentroids]]'s
    * convention. */
  private def pqCodes(scored: DataFrame): DataFrame =
    scored.groupBy(col("vec_id"), col("label"), col("m"))
      .agg(min(struct(col("score"), col("j"))).as("b"))
      .select(col("vec_id"), col("label"), col("m"),
        col("b").getField("j").as("code"),
        col("b").getField("score").as("ms"))

  private def sqlPqDist(e: String, ce: String, m: String): String =
    s"list_reduce(list_transform(generate_series(1, $PqD), i -> " +
      s"($e[$m*$PqD + i] - $ce[$m*$PqD + i]) * ($e[$m*$PqD + i] - $ce[$m*$PqD + i])), (p, q) -> p + q)"

  /** Shared SQL CTE chain up to (vec_id, label, m, code, ms). The
    * tie-break twin of the Spark struct-min: min(score) per (vec, m),
    * then min(j) among the rows carrying exactly that score. */
  private def sqlPqCodes: String =
    s"""cbk AS (SELECT cast(vec_id as int) AS j, e AS ce FROM w WHERE vec_id < $PqK),
      mm AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
      sc AS MATERIALIZED (SELECT x.vec_id, x.label, mm.m, c.j,
          ${sqlPqDist("x.e", "c.ce", "mm.m")} AS score
        FROM w x, mm, cbk c),
      best AS (SELECT vec_id, label, m, min(score) AS ms FROM sc GROUP BY 1, 2, 3),
      code AS (SELECT b.vec_id, b.label, b.m, b.ms, min(s.j) AS code
        FROM best b JOIN sc s ON s.vec_id = b.vec_id AND s.m = b.m AND s.score = b.ms
        GROUP BY 1, 2, 3, 4)"""

  val pqEncode: Q = Q(
    "q161_pq_encode",
    (s, d) => {
      val codes = pqCodes(pqScored(s, d))
      val aggs = (0 until PqM).map(m =>
        min(when(col("m") === m, col("code"))).as(s"code_$m"))
      val recon = (0 until PqM)
        .map(m => min(when(col("m") === m, col("ms"))))
        .reduce(_ + _).as("recon_err")
      codes.groupBy("vec_id")
        .agg(aggs.head, aggs.tail :+ recon: _*)
        .orderBy("vec_id")
    },
    Some {
      val codeCols = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN code END) AS code_$m")
        .mkString(", ")
      val recon = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN ms END)")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH $sqlNormed, $sqlPqCodes
        SELECT vec_id, $codeCols, $recon AS recon_err
        FROM code GROUP BY vec_id ORDER BY vec_id"""
    },
    bench = true)

  val pqAdcTopK: Q = Q(
    "q162_pq_adc_topk",
    (s, d) => {
      val scored = graft.CacheScope.cached(pqScored(s, d))
      val codeCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("code"))).as(s"code_$m"))
      val pivoted = pqCodes(scored).groupBy("vec_id", "label")
        .agg(codeCols.head, codeCols.tail: _*)
      // the query's ADC table = the vec_id = 0 slice of the shared
      // score frame, pivoted to one row of M ordered lookup arrays
      val qt = scored.filter(col("vec_id") === 0)
        .groupBy("m")
        .agg(transform(
          array_sort(collect_list(struct(col("j"), col("score")))),
          x => x.getField("score")).as("t"))
      val tCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("t"))).as(s"t$m"))
      val qrow = qt.groupBy().agg(tCols.head, tCols.tail: _*)
      val adc = (0 until PqM)
        .map(m => element_at(col(s"t$m"), col(s"code_$m") + 1))
        .reduce(_ + _)
      pivoted.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qrow))
        .select(col("vec_id"), col("label"), adc.as("adc_dist"))
        .orderBy(col("adc_dist"), col("vec_id"))
        .limit(10)
    },
    Some {
      val codeCols = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN code END) AS code_$m")
        .mkString(", ")
      val tCols = (0 until PqM)
        .map(m => s"(SELECT list(score ORDER BY j) FROM sc WHERE vec_id = 0 AND m = $m) AS t$m")
        .mkString(", ")
      val adc = (0 until PqM)
        .map(m => s"t$m[code_$m + 1]")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH $sqlNormed, $sqlPqCodes,
        piv AS (SELECT vec_id, label, $codeCols FROM code GROUP BY vec_id, label),
        qrow AS (SELECT $tCols)
        SELECT vec_id, label, $adc AS adc_dist
        FROM piv, qrow WHERE vec_id <> 0
        ORDER BY adc_dist, vec_id LIMIT 10"""
    })

  /** ADC shortlist size for the two-stage retrieval (q164). 100 of the
    * 500-vector sf0.001 corpus is 20%; at production scale the same
    * absolute shortlist is a vanishing fraction — the knob trades one
    * pruned 100-row exact-rerank read against recall (measured at
    * sf0.001: reranked recall@10 0.8-1.0 across queries vs 0.3-0.5 for
    * raw ADC@10). */
  private[graft] val PqShortlist = 100

  /** q164 — the production retrieval shape: PQ-ADC scores ALL vectors
    * from their codes (cheap, compressed), keeps a [[PqShortlist]]-size
    * shortlist, then re-ranks ONLY the shortlist with exact cosine over
    * the original float vectors. At scale stage 1 reads 4-byte codes
    * (RAM-resident), stage 2 reads [[PqShortlist]] full vectors by id —
    * a pruned point-lookup read, not a scan. The exact rerank makes the
    * final ordering exact WITHIN the shortlist, so the only recall loss
    * is a true neighbor missing the shortlist entirely (SimilaritySpec
    * pins the measured band). */
  val pqRerankTopK: Q = Q(
    "q164_pq_rerank_topk",
    (s, d) => {
      val scored = graft.CacheScope.cached(pqScored(s, d))
      val codeCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("code"))).as(s"code_$m"))
      val pivoted = pqCodes(scored).groupBy("vec_id", "label")
        .agg(codeCols.head, codeCols.tail: _*)
      val qt = scored.filter(col("vec_id") === 0)
        .groupBy("m")
        .agg(transform(
          array_sort(collect_list(struct(col("j"), col("score")))),
          x => x.getField("score")).as("t"))
      val tCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("t"))).as(s"t$m"))
      val qrow = qt.groupBy().agg(tCols.head, tCols.tail: _*)
      val adc = (0 until PqM)
        .map(m => element_at(col(s"t$m"), col(s"code_$m") + 1))
        .reduce(_ + _)
      val shortlist = pivoted.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qrow))
        .select(col("vec_id"), col("label"), adc.as("adc_dist"))
        .orderBy(col("adc_dist"), col("vec_id"))
        .limit(PqShortlist)
      val w = normed(s, d)
      val q = w.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"))
      shortlist
        .join(w.select(col("vec_id"), col("e"), col("nrm")), "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"), col("adc_dist"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },
    Some {
      val codeCols = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN code END) AS code_$m")
        .mkString(", ")
      val tCols = (0 until PqM)
        .map(m => s"(SELECT list(score ORDER BY j) FROM sc WHERE vec_id = 0 AND m = $m) AS t$m")
        .mkString(", ")
      val adc = (0 until PqM)
        .map(m => s"t$m[code_$m + 1]")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH $sqlNormed, $sqlPqCodes,
        piv AS (SELECT vec_id, label, $codeCols FROM code GROUP BY vec_id, label),
        qrow AS (SELECT $tCols),
        short AS (SELECT vec_id, label, $adc AS adc_dist
          FROM piv, qrow WHERE vec_id <> 0
          ORDER BY adc_dist, vec_id LIMIT $PqShortlist),
        qv AS (SELECT e AS qe, nrm AS qnrm FROM w WHERE vec_id = 0)
        SELECT s.vec_id, s.label, s.adc_dist,
          ${sqlDot("v.e", "qe")} / (v.nrm * qnrm) AS cosine
        FROM short s JOIN w v ON v.vec_id = s.vec_id, qv
        ORDER BY cosine DESC, s.vec_id LIMIT 10"""
    })

  // ------------------------------------------------------------------
  // q163 — PQ codebook balance audit: vectors assigned per (subspace,
  // codeword), INCLUDING zero rows for dead codewords. Codebook health
  // is the operational metric behind PQ quality (Jégou et al. 2011
  // §II.C: balanced cells minimize quantization distortion for a given
  // K): a subspace whose assignments pile onto a few codewords — or
  // whose codewords never fire at all — wastes its code bits, and the
  // fix (retrain that subspace's codebook, the IvfIndex.rebalance
  // discipline applied to PQ) starts from exactly this histogram. At
  // 100 TB the histogram is one M·K-key groupBy over the codes table —
  // map-side combinable, M×K = 128 output rows regardless of corpus
  // size; the codeword grid is a literal frame, so dead codes surface
  // without any second corpus pass.
  // ------------------------------------------------------------------
  val pqCodeBalance: Q = Q(
    "q163_pq_code_balance",
    (s, d) => {
      val spark2 = s
      import spark2.implicits._
      val counts = pqCodes(pqScored(s, d))
        .groupBy("m", "code").agg(count(lit(1)).as("n"))
      val grid = (for (m <- 0 until PqM; j <- 0 until PqK) yield (m, j))
        .toDF("m", "code")
      grid.join(counts, Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("n"), lit(0L)).as("n_vecs"))
        .orderBy("m", "code")
    },
    Some(s"""WITH $sqlNormed, $sqlPqCodes,
      counts AS (SELECT m, code, cast(count(*) as bigint) AS n
        FROM code GROUP BY 1, 2),
      grid AS (SELECT mm.m, jj.j AS code
        FROM (SELECT unnest(generate_series(0, ${PqM - 1})) AS m) mm,
             (SELECT unnest(generate_series(0, ${PqK - 1})) AS j) jj)
      SELECT grid.m, grid.code, coalesce(n, 0) AS n_vecs
      FROM grid LEFT JOIN counts
        ON grid.m = counts.m AND grid.code = counts.code
      ORDER BY grid.m, grid.code"""))

  /** Query vectors for the recall evaluation: vec_id < this. */
  private[graft] val PqEvalQueries = 10

  // ------------------------------------------------------------------
  // q167 — ANN recall@10 evaluation harness: PQ-ADC top-10 vs exact
  // cosine top-10 for each of [[PqEvalQueries]] query vectors, scored
  // as |intersection| / 10 per query. The eval loop every production
  // ANN deployment runs before trusting an index (recall targets are
  // SLOs; Jégou et al. 2011 §V evaluates exactly this way) — here both
  // sides AND the set-overlap live in one declarative plan, so the
  // whole harness is DuckDB-oracled bit-exactly, ties broken by vec_id
  // on both engines.
  //
  // Scale shape: both sides are corpus × NQ with the NQ query rows
  // BROADCAST (ADC tables resp. query vectors) — linear scans, no
  // shuffle of the corpus; per-query top-10 is the row_number≤k idiom,
  // which GraftExtensions compiles to the TopKPerGroup bounded heap
  // (NQ × 10 rows of state, no full sort); the overlap join touches
  // only NQ × 10 rows a side. ADC sums use the same fixed-order adds
  // as q162, so the ranking is reproducible across partitionings.
  // ------------------------------------------------------------------
  val pqRecallEval: Q = Q(
    "q167_pq_recall_eval",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = graft.CacheScope.cached(pqScored(s, d))
      val codeCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("code"))).as(s"code_$m"))
      val pivoted = pqCodes(scored).groupBy("vec_id")
        .agg(codeCols.head, codeCols.tail: _*)
      val qt = scored.filter(col("vec_id") < PqEvalQueries)
        .groupBy(col("vec_id").as("qid"), col("m"))
        .agg(transform(
          array_sort(collect_list(struct(col("j"), col("score")))),
          x => x.getField("score")).as("t"))
      val tCols = (0 until PqM).map(m =>
        min(when(col("m") === m, col("t"))).as(s"t$m"))
      val qrows = qt.groupBy("qid").agg(tCols.head, tCols.tail: _*)
      val adc = (0 until PqM)
        .map(m => element_at(col(s"t$m"), col(s"code_$m") + 1))
        .reduce(_ + _)
      val adcTop = pivoted
        .join(broadcast(qrows), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), adc.as("adc_dist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("adc_dist"), col("vec_id"))))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      val w = normed(s, d)
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val exTop = w.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      val hits = adcTop.join(exTop, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      qs.select("qid").join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("h"), lit(0L)).as("n_hit"),
          (coalesce(col("h"), lit(0L)).cast("double") / lit(10.0))
            .as("recall_at_10"))
        .orderBy("qid")
    },
    Some {
      val codeCols = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN code END) AS code_$m")
        .mkString(", ")
      val tCols = (0 until PqM)
        .map(m => s"min(CASE WHEN m = $m THEN t END) AS t$m")
        .mkString(", ")
      val adc = (0 until PqM)
        .map(m => s"t$m[code_$m + 1]")
        .reduce((a, b) => s"($a + $b)")
      s"""WITH $sqlNormed, $sqlPqCodes,
        piv AS (SELECT vec_id, $codeCols FROM code GROUP BY vec_id),
        qt AS (SELECT vec_id AS qid, m, list(score ORDER BY j) AS t
          FROM sc WHERE vec_id < $PqEvalQueries GROUP BY 1, 2),
        qp AS MATERIALIZED (SELECT qid, $tCols FROM qt GROUP BY qid),
        adc AS (SELECT qp.qid, piv.vec_id, $adc AS adc_dist
          FROM piv JOIN qp ON piv.vec_id <> qp.qid),
        atop AS (SELECT qid, vec_id FROM (
            SELECT qid, vec_id, row_number() OVER (
              PARTITION BY qid ORDER BY adc_dist, vec_id) AS rn FROM adc)
          WHERE rn <= 10),
        ex AS (SELECT q.vec_id AS qid, v.vec_id,
            ${sqlDot("v.e", "q.e")} / (v.nrm * q.nrm) AS cosine
          FROM w v JOIN w q
            ON q.vec_id < $PqEvalQueries AND v.vec_id <> q.vec_id),
        etop AS (SELECT qid, vec_id FROM (
            SELECT qid, vec_id, row_number() OVER (
              PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn FROM ex)
          WHERE rn <= 10),
        hits AS (SELECT a.qid, cast(count(*) as bigint) AS h
          FROM atop a JOIN etop e
            ON a.qid = e.qid AND a.vec_id = e.vec_id
          GROUP BY 1)
        SELECT q.qid, coalesce(h, 0) AS n_hit,
          cast(coalesce(h, 0) as double) / 10.0 AS recall_at_10
        FROM (SELECT DISTINCT vec_id AS qid FROM w
          WHERE vec_id < $PqEvalQueries) q
        LEFT JOIN hits ON q.qid = hits.qid
        ORDER BY q.qid"""
    })

  /** The 100 TB encode shape: codebooks collected driver-side
    * (K-bounded — K×M subvectors), inlined as literals, argmin per
    * subspace as a pure scan projection with ZERO shuffles (the
    * registry q161 shuffles M rows per vector so its SQL twin is
    * self-contained — this is the same trade [[IvfIndex.query]] makes
    * vs q55). Output matches q161 row-for-row (SimilaritySpec law). */
  private[graft] def pqEncodeScan(vecs: DataFrame,
      codebooks: Seq[Seq[Array[Double]]]): DataFrame = {
    require(codebooks.size == PqM && codebooks.forall(_.size == PqK))
    // ONE native loop expression ([[graft.functions.PqEncodeCodes]])
    // instead of M×K unrolled struct terms: the unrolled form blew
    // janino's 64 KB method limit and silently dropped the WHOLE stage
    // to interpreted execution — the opposite of this function's
    // purpose. Arithmetic order (and so every bit of the output) is
    // identical; the row-identical-to-q161 law below pins it.
    graft.functions.VectorFunctions.register(vecs.sparkSession)
    val cbLit = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    vecs
      .select(col("vec_id"),
        call_function("pq_encode", col("e"), cbLit).as("r"))
      .select(col("vec_id") +:
        (0 until PqM).map(m =>
          element_at(col("r").getField("codes"), m + 1).as(s"code_$m")) :+
        col("r").getField("recon").as("recon_err"): _*)
  }

  /** Collect the sample codebook from an embeddings frame (K rows). */
  private[graft] def pqCollectCodebooks(w: DataFrame): Seq[Seq[Array[Double]]] = {
    val rows = w.filter(col("vec_id") < PqK)
      .select(col("vec_id").cast("int"), col("e"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (0 until PqM).map(m => rows.toSeq.map(_._2.slice(m * PqD, (m + 1) * PqD)))
  }

  /** Matryoshka prefix length for q178 (first quarter of the 64-dim
    * embedding). */
  private[graft] val MrlDim = 16

  // ------------------------------------------------------------------
  // q178 — Matryoshka-truncation recall harness (Kusupati et al. 2022:
  // MRL-trained embeddings keep most retrieval quality in a prefix of
  // the dimensions): search with only the FIRST 16 of 64 dims
  // (renormalized — the division by the truncated norms IS the
  // renormalization) vs exact full-dim cosine, recall@10 per query —
  // the q167 harness shape with the ADC side swapped for the prefix
  // side. This is the decision query behind shipping truncated
  // embeddings: 4x less float traffic per probe, measured recall cost.
  //
  // On the driver's SYNTHETIC embeddings the measured recall@10 is
  // ~0.1 (sf0.1) — barely above the ~10/N chance floor — which is the
  // harness doing its job: these vectors are random, not MRL-trained,
  // so their prefixes carry no concentrated signal and truncation
  // would be unsafe to ship. A real MRL checkpoint is exactly what
  // this query certifies (or vetoes) before the 4x saving is taken.
  //
  // Scale shape: identical to q167 — corpus × NQ with the NQ query
  // rows broadcast, per-query top-10 via the row_number≤k idiom
  // (TopKPerGroup bounded heap), overlap join over NQ×10 rows a side.
  // At rest the 16-dim prefix would be stored as its own column/table
  // so the probe physically reads 1/4 of the floats; here both live in
  // one cached frame. The dot/sqrt/divide chain is the shared
  // left-fold arithmetic, so ranks are bit-reproducible.
  // ------------------------------------------------------------------
  val mrlRecallEval: Q = Q(
    "q178_mrl_recall_eval",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = graft.CacheScope.cached(normed(s, d)
        .withColumn("te", slice(col("e"), 1, MrlDim))
        .withColumn("tnrm", sqrt(dot("te", "te"))))
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"), col("te").as("qte"),
          col("tnrm").as("qtnrm"))
      def top10(score: Column, asc: Boolean) = {
        w.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score.as("sc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid")
              .orderBy(if (asc) col("sc").asc else col("sc").desc,
                col("vec_id"))))
          .filter(col("rn") <= 10).select("qid", "vec_id")
      }
      val tTop = top10(dot("te", "qte") / (col("tnrm") * col("qtnrm")),
        asc = false)
      val exTop = top10(dot("e", "qe") / (col("nrm") * col("qnrm")),
        asc = false)
      val hits = tTop.join(exTop, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      qs.select("qid").join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("h"), lit(0L)).as("n_hit"),
          (coalesce(col("h"), lit(0L)).cast("double") / lit(10.0))
            .as("recall_at_10"))
        .orderBy("qid")
    },
    Some {
      val te = s"e[1:$MrlDim]"
      s"""WITH $sqlNormed,
        tw AS MATERIALIZED (SELECT vec_id, e, nrm, $te AS te,
            sqrt(${sqlDot(te, te)}) AS tnrm FROM w),
        q AS MATERIALIZED (SELECT vec_id AS qid, e AS qe, nrm AS qnrm,
            te AS qte, tnrm AS qtnrm FROM tw
          WHERE vec_id < $PqEvalQueries),
        tt AS (SELECT qid, vec_id FROM (
            SELECT q.qid, v.vec_id, row_number() OVER (PARTITION BY q.qid
              ORDER BY ${sqlDot("v.te", "q.qte")} / (v.tnrm * q.qtnrm) DESC,
                v.vec_id) AS rn
            FROM tw v JOIN q ON v.vec_id <> q.qid) WHERE rn <= 10),
        et AS (SELECT qid, vec_id FROM (
            SELECT q.qid, v.vec_id, row_number() OVER (PARTITION BY q.qid
              ORDER BY ${sqlDot("v.e", "q.qe")} / (v.nrm * q.qnrm) DESC,
                v.vec_id) AS rn
            FROM tw v JOIN q ON v.vec_id <> q.qid) WHERE rn <= 10),
        hits AS (SELECT t.qid, cast(count(*) as bigint) AS h
          FROM tt t JOIN et e ON t.qid = e.qid AND t.vec_id = e.vec_id
          GROUP BY 1)
        SELECT q.qid, coalesce(h, 0) AS n_hit,
          cast(coalesce(h, 0) as double) / 10.0 AS recall_at_10
        FROM (SELECT qid FROM q) q LEFT JOIN hits ON q.qid = hits.qid
        ORDER BY q.qid"""
    })

  // ------------------------------------------------------------------
  // q216 — int8 scalar-quantization recall harness: search with
  // PER-TENSOR symmetric int8 vectors (one global scale = the corpus
  // max |component|; q[d] = clamp(floor(x·127/s + ½), ±127) — the
  // standard symmetric scheme of Jacob et al. 2018 §2.1 / faiss's
  // SQ8) vs exact float cosine, recall@10 per query. This is the
  // THIRD quantization family next to PQ (q167) and Matryoshka
  // truncation (q178): int8 keeps the dimensionality but stores 1/4
  // of the bytes, and — unlike PQ — its inner product is an EXACT
  // integer, so the approximate ranking is bit-reproducible by
  // construction on any engine and any partitioning (no codebook, no
  // ADC table, no libm). Per-tensor (not per-dim) scaling is chosen
  // deliberately: one shared scale cancels in the cosine, so the
  // quantized-cosine ranking equals the dequantized ranking exactly,
  // with no per-dimension weight literals to ship.
  //
  // Determinism: x·127/s + ½ is two IEEE multiplies/divides of
  // identical operands (no libm), floor of that is engine-identical,
  // products and sums of the resulting small integers (≤127² per
  // term, ≤64·127² per dot) are exact in double, and the final
  // sqrt/divide is the q41/q42 correctly-rounded-IEEE argument. An
  // all-zero quantized vector (norm 0) scores −2.0, below any cosine.
  //
  // Scale shape: the scale is ONE max aggregate over the cached
  // corpus frame (scalar-broadcast idiom); quantization is a pure
  // scan projection — at rest the int8 column is what you'd store,
  // and the probe reads 1/4 the bytes of the float column; search is
  // the q167/q178 shape (NQ query rows broadcast, per-query top-10
  // via the row_number≤k idiom → TopKPerGroup bounded heap, overlap
  // join over NQ×10 rows a side).
  // ------------------------------------------------------------------
  val int8RecallEval: Q = Q(
    "q216_int8_recall_eval",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = graft.CacheScope.cached(normed(s, d))
      val sc = base.agg(
        max(array_max(transform(col("e"), x => abs(x)))).as("sg"))
      val w = base.crossJoin(broadcast(sc))
        .withColumn("qv", transform(col("e"), x =>
          greatest(lit(-127.0), least(lit(127.0),
            floor(x * lit(127.0) / col("sg") + lit(0.5)).cast("double")))))
        .withColumn("qn", sqrt(dot("qv", "qv")))
        .select("vec_id", "e", "nrm", "qv", "qn")
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"), col("qv").as("qqv"), col("qn").as("qqn"))
      def top10(score: Column) = {
        w.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), score.as("sc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id"))))
          .filter(col("rn") <= 10).select("qid", "vec_id")
      }
      val iTop = top10(
        when(col("qn") === 0 || col("qqn") === 0, lit(-2.0))
          .otherwise(dot("qv", "qqv") / (col("qn") * col("qqn"))))
      val exTop = top10(dot("e", "qe") / (col("nrm") * col("qnrm")))
      val hits = iTop.join(exTop, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      qs.select("qid").join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("h"), lit(0L)).as("n_hit"),
          (coalesce(col("h"), lit(0L)).cast("double") / lit(10.0))
            .as("recall_at_10"))
        .orderBy("qid")
    },
    Some {
      // DuckDB rejects subqueries inside lambdas, so the scalar scale
      // joins in via `FROM w, sc` (1-row cross) and is referenced as a
      // plain column inside the transform
      val qvExpr = "list_transform(e, x -> greatest(-127.0, least(127.0, " +
        "cast(floor(x * 127.0 / sg + 0.5) as double))))"
      s"""WITH $sqlNormed,
        sc AS MATERIALIZED (SELECT max(list_max(
            list_transform(e, x -> abs(x)))) AS sg FROM w),
        qw AS MATERIALIZED (SELECT vec_id, e, nrm, qv,
            sqrt(${sqlDot("qv", "qv")}) AS qn
          FROM (SELECT vec_id, e, nrm, $qvExpr AS qv FROM w, sc)),
        q AS MATERIALIZED (SELECT vec_id AS qid, e AS qe, nrm AS qnrm,
            qv AS qqv, qn AS qqn FROM qw WHERE vec_id < $PqEvalQueries),
        it AS (SELECT qid, vec_id FROM (
            SELECT q.qid, v.vec_id, row_number() OVER (PARTITION BY q.qid
              ORDER BY CASE WHEN v.qn = 0 OR q.qqn = 0 THEN -2.0
                ELSE ${sqlDot("v.qv", "q.qqv")} / (v.qn * q.qqn) END DESC,
                v.vec_id) AS rn
            FROM qw v JOIN q ON v.vec_id <> q.qid) WHERE rn <= 10),
        et AS (SELECT qid, vec_id FROM (
            SELECT q.qid, v.vec_id, row_number() OVER (PARTITION BY q.qid
              ORDER BY ${sqlDot("v.e", "q.qe")} / (v.nrm * q.qnrm) DESC,
                v.vec_id) AS rn
            FROM qw v JOIN q ON v.vec_id <> q.qid) WHERE rn <= 10),
        hits AS (SELECT i.qid, cast(count(*) as bigint) AS h
          FROM it i JOIN et e ON i.qid = e.qid AND i.vec_id = e.vec_id
          GROUP BY 1)
        SELECT q.qid, coalesce(h, 0) AS n_hit,
          cast(coalesce(h, 0) as double) / 10.0 AS recall_at_10
        FROM (SELECT qid FROM q) q LEFT JOIN hits ON q.qid = hits.qid
        ORDER BY q.qid"""
    })

  // ------------------------------------------------------------------
  // q222 — filtered-ANN recall audit: metadata-constrained search
  // ("top-10 nearest WITH label = X") done the cheap way — run the
  // UNFILTERED search and post-filter — measured against the filtered
  // truth, for the plain top-10 and for an over-fetch-100 remedy.
  // This is the classic production ANN trap (a selective filter
  // starves the post-filtered result list) and the over-fetch factor
  // is the standard knob; this audit is the measurement that sizes it.
  //
  // No separate truth branch is needed, by a rank-preservation
  // identity: filtering by label preserves cosine order, so the
  // label-matching survivors of the global top-K are EXACTLY the
  // best-ranked members of the filtered truth — hence
  // recall@10(post-filter of top-K) = min(#matches in top-K, 10)/10.
  // One windowed pass over the corpus yields both operating points.
  //
  // Scale shape: the q216 search shape (NQ query rows broadcast,
  // row_number ≤ 100 compiles to the TopKPerGroup bounded heap), ONE
  // corpus pass for the ranking plus a |labels|-key aggregate off the
  // same cached frame for context counts; with the target label ~10%
  // of the corpus, expected n_surv10 ≈ 1 — the audit shows the
  // collapse (recall ≈ 0.1) and whether ×10 over-fetch repairs it.
  // ------------------------------------------------------------------
  val filteredAnnRecall: Q = Q(
    "q222_filtered_ann_recall",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = graft.CacheScope.cached(normed(s, d))
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("label").as("qlab"),
          col("e").as("qe"), col("nrm").as("qnrm"))
      val labCnt = w.groupBy("label")
        .agg(count(lit(1)).cast("long").as("n_label"))
      val top100 = w.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlab"), col("vec_id"), col("label"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= 100)
      val m = top100.groupBy("qid", "qlab")
        .agg(count(when(col("rn") <= 10 && col("label") === col("qlab"), 1))
            .cast("long").as("n_surv10"),
          least(count(when(col("label") === col("qlab"), 1)), lit(10L))
            .cast("long").as("n_surv100"))
      m.join(labCnt, m("qlab") === labCnt("label"))
        .select(col("qid"), col("qlab").as("label"), col("n_label"),
          col("n_surv10"),
          (col("n_surv10").cast("double") / lit(10.0)).as("recall_post10"),
          col("n_surv100"),
          (col("n_surv100").cast("double") / lit(10.0)).as("recall_over100"))
        .orderBy("qid")
    },
    Some {
      s"""WITH $sqlNormed,
        q AS MATERIALIZED (SELECT vec_id AS qid, label AS qlab, e AS qe,
            nrm AS qnrm FROM w WHERE vec_id < $PqEvalQueries),
        t AS MATERIALIZED (SELECT qid, qlab, label, rn FROM (
            SELECT q.qid, q.qlab, v.vec_id, v.label,
              row_number() OVER (PARTITION BY q.qid
                ORDER BY ${sqlDot("v.e", "q.qe")} / (v.nrm * q.qnrm) DESC,
                  v.vec_id) AS rn
            FROM w v JOIN q ON v.vec_id <> q.qid) WHERE rn <= 100),
        m AS (SELECT qid, qlab,
            cast(count_if(rn <= 10 AND label = qlab) as bigint) AS n_surv10,
            least(cast(count_if(label = qlab) as bigint), 10) AS n_surv100
          FROM t GROUP BY 1, 2),
        lc AS (SELECT label, cast(count(*) as bigint) AS n_label
          FROM w GROUP BY 1)
        SELECT qid, qlab AS label, n_label, n_surv10,
          cast(n_surv10 as double) / 10.0 AS recall_post10,
          n_surv100,
          cast(n_surv100 as double) / 10.0 AS recall_over100
        FROM m JOIN lc ON m.qlab = lc.label
        ORDER BY qid"""
    },
    bench = true)

  // ------------------------------------------------------------------
  // q228 — multi-probe LSH recall harness (Lv et al. 2007): instead of
  // probing only the query's own hyperplane bucket (q43), ALSO probe
  // every bucket at Hamming distance 1 in the 4-bit sign code — the
  // buckets a near neighbor most likely fell into when it landed on
  // the wrong side of exactly one hyperplane. Recall rises from the
  // single-bucket baseline toward brute force while touching 5/16 of
  // the corpus instead of building more tables (the q41 banded
  // alternative trades the same recall for extra storage); this
  // harness measures both operating points per query against the
  // exact top-10, which is the sizing evidence for choosing probe
  // count vs band count in production.
  //
  // Scale shape: the probe set EXPLODES to (qid, probe_bucket) rows —
  // NQ·5 rows, broadcast — and candidates come from an EQUI-join on
  // the bucket key (exactly how a multi-probe executes against a
  // bucket-partitioned table at 100 TB: one partition-pruned lookup
  // per probe, never a scan); per-qid probe buckets are distinct so
  // the join itself deduplicates; the exact side is the q216 one-pass
  // window; everything downstream is ≤ NQ×10-row bookkeeping.
  // Determinism: cosine is the q41/q42 IEEE argument, ranks tie-break
  // on vec_id, counts are integers; the plane signs are the pinned
  // md5-derived ±1 literals shared with q43's oracle.
  // ------------------------------------------------------------------
  val multiProbeLshRecall: Q = Q(
    "q228_multiprobe_lsh_recall",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = graft.CacheScope.cached(
        normed(s, d).withColumn("bucket", bucketCol("e")))
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"), col("bucket").as("qb"))
      val probes = qs.select(col("qid"), col("qe"), col("qnrm"), col("qb"),
        explode(array(col("qb"), col("qb").bitwiseXOR(1),
          col("qb").bitwiseXOR(2), col("qb").bitwiseXOR(4),
          col("qb").bitwiseXOR(8))).as("pb"))
      val cand = w.join(broadcast(probes),
          col("bucket") === col("pb") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cos"),
          (col("pb") === col("qb")).as("prim"))
      val candC = graft.CacheScope.cached(cand)
      def top10(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= 10).select("qid", "vec_id")
      val exact = top10(w.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cos")))
      val counts = candC.groupBy("qid")
        .agg(count(when(col("prim"), 1)).cast("long").as("n_cand_single"),
          count(lit(1)).cast("long").as("n_cand_multi"))
      def hits(top: org.apache.spark.sql.DataFrame, nm: String) = top
        .join(exact, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).cast("long").as(nm))
      val hs = hits(top10(candC.filter(col("prim"))), "n_hit_single")
      val hm = hits(top10(candC), "n_hit_multi")
      qs.select("qid", "qb").join(counts, Seq("qid"), "left")
        .join(hs, Seq("qid"), "left").join(hm, Seq("qid"), "left")
        .select(col("qid"), col("qb"),
          coalesce(col("n_cand_single"), lit(0L)).as("n_cand_single"),
          coalesce(col("n_cand_multi"), lit(0L)).as("n_cand_multi"),
          coalesce(col("n_hit_single"), lit(0L)).as("n_hit_single"),
          (coalesce(col("n_hit_single"), lit(0L)).cast("double") / 10.0)
            .as("recall_single"),
          coalesce(col("n_hit_multi"), lit(0L)).as("n_hit_multi"),
          (coalesce(col("n_hit_multi"), lit(0L)).cast("double") / 10.0)
            .as("recall_multi"))
        .orderBy("qid")
    },
    Some(s"""WITH $sqlNormed,
      b AS MATERIALIZED (SELECT vec_id, e, nrm, ${sqlBucket("e")} AS bucket
        FROM w),
      q AS MATERIALIZED (SELECT vec_id AS qid, e AS qe, nrm AS qnrm,
        bucket AS qb FROM b WHERE vec_id < $PqEvalQueries),
      pr AS MATERIALIZED (SELECT qid, qe, qnrm, qb,
        unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)]) AS pb
        FROM q),
      cand AS MATERIALIZED (SELECT pr.qid, b.vec_id,
          ${sqlDot("b.e", "pr.qe")} / (b.nrm * pr.qnrm) AS cos,
          pr.pb = pr.qb AS prim
        FROM b JOIN pr ON b.bucket = pr.pb AND b.vec_id <> pr.qid),
      tm AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
          row_number() OVER (PARTITION BY qid
            ORDER BY cos DESC, vec_id) AS rn FROM cand) WHERE rn <= 10),
      tsg AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
          row_number() OVER (PARTITION BY qid
            ORDER BY cos DESC, vec_id) AS rn FROM cand WHERE prim)
        WHERE rn <= 10),
      ex AS MATERIALIZED (SELECT qid, vec_id FROM (SELECT q.qid, b.vec_id,
          row_number() OVER (PARTITION BY q.qid
            ORDER BY ${sqlDot("b.e", "q.qe")} / (b.nrm * q.qnrm) DESC,
              b.vec_id) AS rn
          FROM b JOIN q ON b.vec_id <> q.qid) WHERE rn <= 10),
      cnt AS (SELECT qid,
          cast(count_if(prim) as bigint) AS n_cand_single,
          cast(count(*) as bigint) AS n_cand_multi
        FROM cand GROUP BY 1),
      hs AS (SELECT t.qid, cast(count(*) as bigint) AS n_hit_single
        FROM tsg t JOIN ex ON t.qid = ex.qid AND t.vec_id = ex.vec_id
        GROUP BY 1),
      hm AS (SELECT t.qid, cast(count(*) as bigint) AS n_hit_multi
        FROM tm t JOIN ex ON t.qid = ex.qid AND t.vec_id = ex.vec_id
        GROUP BY 1)
      SELECT q.qid, q.qb,
        coalesce(cnt.n_cand_single, 0) AS n_cand_single,
        coalesce(cnt.n_cand_multi, 0) AS n_cand_multi,
        coalesce(hs.n_hit_single, 0) AS n_hit_single,
        cast(coalesce(hs.n_hit_single, 0) as double) / 10.0
          AS recall_single,
        coalesce(hm.n_hit_multi, 0) AS n_hit_multi,
        cast(coalesce(hm.n_hit_multi, 0) as double) / 10.0
          AS recall_multi
      FROM q LEFT JOIN cnt ON q.qid = cnt.qid
        LEFT JOIN hs ON q.qid = hs.qid
        LEFT JOIN hm ON q.qid = hm.qid
      ORDER BY q.qid"""))

  // ------------------------------------------------------------------
  // q218 — MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
  // diversified re-ranking: from each query's top-C relevance
  // candidates, greedily select K results maximizing
  // λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the standard
  // redundancy-suppressing re-rank every retrieval stack runs between
  // ANN and the user (near-dup corpora make the raw top-k a wall of
  // clones; q41/q56 measure that redundancy, this removes it from
  // result lists). λ = 1/2, so the argmax is EXACTLY argmax(rel −
  // maxsim) — with rel/sim floor(·1e9)-quantized (the q213 discipline:
  // the cosines are identical IEEE on both engines, so their floors
  // are too), every step of the greedy loop is integer arithmetic and
  // ties break to the lowest candidate index = lowest vec_id. Note
  // MMR scores are NOT monotone down the ranking: maxsim can be
  // negative (anti-correlated survivors), so a later pick can outscore
  // an earlier one — the first pick's score is pure relevance.
  //
  // Scale shape: the ONLY corpus-touching stage is candidate
  // generation (broadcast query rows + the row_number≤C idiom →
  // TopKPerGroup bounded heap — at 100 TB you'd swap in the IvfPq
  // probe, same downstream); the greedy loop itself runs over NQ rows,
  // each carrying its C candidates + a C×C integer sim matrix, as a
  // BOUNDED fold entirely inside one projection (the q188 discipline —
  // no per-step shuffles, no driver loop); output is NQ×K rows. The
  // oracle replays the identical greedy recursion as a WITH RECURSIVE
  // over single-row-per-query list state.
  // ------------------------------------------------------------------
  private val MmrC = 12 // relevance candidates per query
  private val MmrK = 5 // diversified results per query
  private val MmrSent = -4000000000000000000L // chosen-slot sentinel

  val mmrRerank: Q = Q(
    "q218_mmr_rerank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = graft.CacheScope.cached(normed(s, d))
      val qs = w.filter(col("vec_id") < PqEvalQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val cand = w.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("e"), col("nrm"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= MmrC)
        .withColumn("rel9", floor(col("cos") * lit(1e9)).cast("long"))
        .withColumn("ix", row_number().over(
          Window.partitionBy("qid").orderBy("vec_id")))
      val ci = graft.CacheScope.cached(
        cand.select("qid", "vec_id", "e", "nrm", "rel9", "ix"))
      val a = ci.select(col("qid"), col("ix").as("ai"),
        col("e").as("ae"), col("nrm").as("anrm"))
      val b = ci.select(col("qid"), col("ix").as("bi"),
        col("e").as("be"), col("nrm").as("bnrm"))
      val prow = a.join(b, "qid")
        .select(col("qid"), col("ai"), col("bi"),
          floor(dot("be", "ae") / (col("bnrm") * col("anrm")) * lit(1e9))
            .cast("long").as("s9"))
        .groupBy("qid", "ai")
        .agg(transform(array_sort(collect_list(struct(col("bi"), col("s9")))),
          x => x.getField("s9")).as("srow"))
      val pq = prow.groupBy("qid")
        .agg(transform(array_sort(collect_list(struct(col("ai"), col("srow")))),
          x => x.getField("srow")).as("simm"))
      val base = ci.groupBy("qid")
        .agg(
          transform(array_sort(collect_list(
            struct(col("ix"), col("rel9")))), x => x.getField("rel9")).as("rel"),
          transform(array_sort(collect_list(
            struct(col("ix"), col("vec_id")))), x => x.getField("vec_id")).as("ids"))
      val joined = base.join(pq, "qid")
      val p1 = array_position(col("rel"), array_max(col("rel"))).cast("int")
      val st0 = struct(
        array(p1).as("chosen"),
        element_at(col("simm"), p1).as("msim"),
        array(array_max(col("rel"))).as("psc"))
      val fold = aggregate(
        sequence(lit(2), lit(MmrK)), st0,
        (st, _) => {
          val sc = transform(sequence(lit(1), size(col("rel"))),
            i => when(array_contains(st.getField("chosen"), i.cast("int")),
              lit(MmrSent))
              .otherwise(element_at(col("rel"), i) -
                element_at(st.getField("msim"), i)))
          val p = array_position(sc, array_max(sc)).cast("int")
          struct(
            concat(st.getField("chosen"), array(p)).as("chosen"),
            zip_with(st.getField("msim"), element_at(col("simm"), p),
              (m, x) => greatest(m, x)).as("msim"),
            concat(st.getField("psc"), array(array_max(sc))).as("psc"))
        })
      joined.select(col("qid"), col("ids"), fold.as("st"))
        .select(col("qid"), col("ids"), col("st"),
          posexplode(col("st").getField("chosen")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          element_at(col("ids"), col("col")).as("vec_id"),
          element_at(col("st").getField("psc"),
            (col("pos") + 1).cast("int")).as("mmr_q9"))
        .orderBy("qid", "rank")
    },
    Some(s"""WITH RECURSIVE $sqlNormed,
      q AS MATERIALIZED (SELECT vec_id AS qid, e AS qe, nrm AS qnrm
        FROM w WHERE vec_id < $PqEvalQueries),
      cand AS MATERIALIZED (
        SELECT qid, vec_id, e, nrm,
          cast(floor(${sqlDot("e", "qe")} / (nrm * qnrm) * 1000000000.0)
            as bigint) AS rel9,
          row_number() OVER (PARTITION BY qid
            ORDER BY ${sqlDot("e", "qe")} / (nrm * qnrm) DESC, vec_id) AS rn
        FROM w JOIN q ON vec_id <> qid
        QUALIFY rn <= $MmrC),
      ci AS MATERIALIZED (SELECT qid, vec_id, e, nrm, rel9,
          row_number() OVER (PARTITION BY qid ORDER BY vec_id) AS ix
        FROM cand),
      prow AS MATERIALIZED (SELECT a.qid, a.ix AS ai,
          list(cast(floor(${sqlDot("b.e", "a.e")} / (b.nrm * a.nrm)
            * 1000000000.0) as bigint) ORDER BY b.ix) AS srow
        FROM ci a JOIN ci b ON a.qid = b.qid
        GROUP BY 1, 2),
      pq AS MATERIALIZED (SELECT qid, list(srow ORDER BY ai) AS simm
        FROM prow GROUP BY 1),
      base AS MATERIALIZED (SELECT qid,
          list(rel9 ORDER BY ix) AS rel, list(vec_id ORDER BY ix) AS ids
        FROM ci GROUP BY 1),
      st AS (
        SELECT b.qid, 1 AS t,
          [cast(list_position(rel, list_max(rel)) as int)] AS chosen,
          simm[list_position(rel, list_max(rel))] AS msim,
          [list_max(rel)] AS psc,
          rel, ids, simm
        FROM base b JOIN pq USING (qid)
        UNION ALL
        SELECT qid, t + 1,
          list_append(chosen, cast(list_position(sc, list_max(sc)) as int)),
          list_transform(generate_series(1, len(msim)),
            i -> greatest(msim[i], simm[list_position(sc, list_max(sc))][i])),
          list_append(psc, list_max(sc)),
          rel, ids, simm
        FROM (SELECT *, list_transform(generate_series(1, len(rel)),
            i -> CASE WHEN list_contains(chosen, cast(i as int))
              THEN $MmrSent ELSE rel[i] - msim[i] END) AS sc
          FROM st WHERE t < $MmrK) s),
      fin AS (SELECT qid, chosen, psc, ids FROM st WHERE t = $MmrK)
      SELECT qid, cast(u.r as int) AS rank, ids[chosen[u.r]] AS vec_id,
        psc[u.r] AS mmr_q9
      FROM fin, unnest(generate_series(1, $MmrK)) AS u(r)
      ORDER BY qid, rank"""))

  // ------------------------------------------------------------------
  // q190 — GRADED retrieval metrics: MRR@10 and nDCG@10 of the PQ-ADC
  // ranking against exact-cosine truth, per query. q167's recall@10
  // treats the top-10 as a set; ranking quality is what users feel, so
  // the production eval adds position-aware metrics (Järvelin &
  // Kekäläinen 2002 for nDCG): graded relevance = 11 − truth-rank for
  // the exact top-10, 0 otherwise; discount weights 1/log2(r+1) and
  // the ideal DCG are computed ONCE in Scala and embedded as the same
  // floor(·1e9) integer literals on both engines (the q188 discipline
  // — no libm crosses engines), so DCG is an exact integer sum and
  // nDCG/MRR are single divides of identical operands.
  //
  // Scale shape: identical to q167 (broadcast query rows, TopKPerGroup
  // bounded heaps, overlap join over NQ × 10 rows) plus one 100-row
  // left join and a 10-row agg.
  // ------------------------------------------------------------------
  val retrievalMetrics: Q = {
    // w(r) = floor(1e9 / log2(r+1)), r = 1..10; idcg = Σ (11−r)·w(r)
    val ws: Seq[Long] = (1 to 10).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    val idcgQ9: Long = (1 to 10).map(r => (11L - r) * ws(r - 1)).sum
    Q(
      "q190_retrieval_metrics",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = graft.CacheScope.cached(pqScored(s, d))
        val codeCols = (0 until PqM).map(m =>
          min(when(col("m") === m, col("code"))).as(s"code_$m"))
        val pivoted = pqCodes(scored).groupBy("vec_id")
          .agg(codeCols.head, codeCols.tail: _*)
        val qt = scored.filter(col("vec_id") < PqEvalQueries)
          .groupBy(col("vec_id").as("qid"), col("m"))
          .agg(transform(
            array_sort(collect_list(struct(col("j"), col("score")))),
            x => x.getField("score")).as("t"))
        val tCols = (0 until PqM).map(m =>
          min(when(col("m") === m, col("t"))).as(s"t$m"))
        val qrows = qt.groupBy("qid").agg(tCols.head, tCols.tail: _*)
        val adc = (0 until PqM)
          .map(m => element_at(col(s"t$m"), col(s"code_$m") + 1))
          .reduce(_ + _)
        val atop = pivoted
          .join(broadcast(qrows), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), adc.as("adc_dist"))
          .withColumn("rs", row_number().over(
            Window.partitionBy("qid").orderBy(col("adc_dist"), col("vec_id"))))
          .filter(col("rs") <= 10).select("qid", "vec_id", "rs")
        val w = normed(s, d)
        val qs = w.filter(col("vec_id") < PqEvalQueries)
          .select(col("vec_id").as("qid"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        val etop = w.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
          .withColumn("rt", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("cosine").desc, col("vec_id"))))
          .filter(col("rt") <= 10).select("qid", "vec_id", "rt")
        atop.join(etop, Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(count(col("rt")).as("n_hit"),
            sum(when(col("rt").isNotNull,
              (lit(11) - col("rt")).cast("long") *
                element_at(typedlit(ws), col("rs"))).otherwise(0L))
              .cast("long").as("dcg_q9"),
            min(when(col("rt").isNotNull, col("rs"))).as("fr"))
          .select(col("qid"), col("n_hit"),
            coalesce(expr("1000000 div fr"), lit(0L)).as("rr_q6"),
            col("dcg_q9"),
            (col("dcg_q9").cast("double") / lit(idcgQ9.toDouble))
              .as("ndcg"))
          .orderBy("qid")
      },
      Some {
        val codeCols = (0 until PqM)
          .map(m => s"min(CASE WHEN m = $m THEN code END) AS code_$m")
          .mkString(", ")
        val tCols = (0 until PqM)
          .map(m => s"min(CASE WHEN m = $m THEN t END) AS t$m")
          .mkString(", ")
        val adc = (0 until PqM)
          .map(m => s"t$m[code_$m + 1]")
          .reduce((a, b) => s"($a + $b)")
        val wsList = ws.mkString("[", ", ", "]")
        s"""WITH $sqlNormed, $sqlPqCodes,
          piv AS (SELECT vec_id, $codeCols FROM code GROUP BY vec_id),
          qt AS (SELECT vec_id AS qid, m, list(score ORDER BY j) AS t
            FROM sc WHERE vec_id < $PqEvalQueries GROUP BY 1, 2),
          qp AS MATERIALIZED (SELECT qid, $tCols FROM qt GROUP BY qid),
          adc AS (SELECT qp.qid, piv.vec_id, $adc AS adc_dist
            FROM piv JOIN qp ON piv.vec_id <> qp.qid),
          atop AS (SELECT qid, vec_id, rs FROM (
              SELECT qid, vec_id, row_number() OVER (
                PARTITION BY qid ORDER BY adc_dist, vec_id) AS rs FROM adc)
            WHERE rs <= 10),
          ex AS (SELECT q.vec_id AS qid, v.vec_id,
              ${sqlDot("v.e", "q.e")} / (v.nrm * q.nrm) AS cosine
            FROM w v JOIN w q
              ON q.vec_id < $PqEvalQueries AND v.vec_id <> q.vec_id),
          etop AS (SELECT qid, vec_id, rt FROM (
              SELECT qid, vec_id, row_number() OVER (
                PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rt
              FROM ex)
            WHERE rt <= 10),
          j AS (SELECT a.qid, a.rs, e.rt
            FROM atop a LEFT JOIN etop e
              ON a.qid = e.qid AND a.vec_id = e.vec_id)
          SELECT qid, cast(count(rt) as bigint) AS n_hit,
            coalesce(1000000 // min(CASE WHEN rt IS NOT NULL THEN rs END),
              0) AS rr_q6,
            cast(sum(CASE WHEN rt IS NOT NULL
              THEN (11 - rt) * ($wsList)[rs] ELSE 0 END) as bigint)
              AS dcg_q9,
            cast(sum(CASE WHEN rt IS NOT NULL
              THEN (11 - rt) * ($wsList)[rs] ELSE 0 END) as double)
              / ${idcgQ9}.0 AS ndcg
          FROM j GROUP BY qid ORDER BY qid"""
      })
  }

  // ------------------------------------------------------------------
  // q194 — HARD-NEGATIVE MINING for embedding training: per query, the
  // top-10 most-similar corpus vectors that are NOT known near-dups of
  // it. Contrastive training (DPR, SimCSE, E5 — all public recipes)
  // needs negatives that are hard (high similarity) but not false
  // (actual duplicates of the anchor); the production shape is exactly
  // this composition — ANN candidates minus a dedup-index lookup. The
  // dup set is q41's banded-LSH verified pairs (cosine >= 0.35 among
  // band-bucket collisions), symmetrized and restricted to the query
  // side; exclusion is a left-anti join BEFORE the top-10 rank, so a
  // removed dup promotes the next-hardest candidate (rank over the
  // surviving set, not a post-filter of a top-k).
  //
  // Scale shape: the dup side is LSH-bounded (never all-pairs) and
  // only pairs touching the <= NQ query ids survive — a broadcast-
  // scale anti-join input; the candidate side is the q190 harness
  // shape (corpus x broadcast query rows); row_number <= 10 compiles
  // to TopKPerGroup's bounded heap. Cosines are the same IEEE sequence
  // on both engines (the q41/q42 argument), so the full hash oracle
  // applies.
  // ------------------------------------------------------------------
  val hardNegatives: Q = {
    val NQ = PqEvalQueries
    Q(
      "q194_hard_negatives",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bb = graft.CacheScope.cached(bandedBuckets(s, d))
        val a = bb.as("a"); val b = bb.as("b")
        // Query-restricted BEFORE the band-collision distinct (a
        // row-level predicate commutes with DISTINCT, so the surviving
        // dup rows are identical) and CACHED: the two orientation
        // branches below otherwise re-ran the entire self-join +
        // distinct chain each (measured r19: two complete BHJ+Exchange
        // pipelines in the plan). The cached frame is ≤ the pairs
        // touching the NQ query ids — three narrow columns.
        val dupPairs = graft.CacheScope.cached(
          a.join(b, col("a.band") === col("b.band") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
            .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
              (dot("a.e", "b.e") / (col("a.nrm") * col("b.nrm")))
                .as("cosine"))
            .filter(col("va") < NQ || col("vb") < NQ)
            .distinct()
            .filter(col("cosine") >= 0.35))
        val dup = dupPairs.filter(col("va") < NQ)
          .select(col("va").as("qid"), col("vb").as("vec_id"))
          .unionByName(dupPairs.filter(col("vb") < NQ)
            .select(col("vb").as("qid"), col("va").as("vec_id")))
        val w = normed(s, d)
        val qs = w.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qid"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        w.join(broadcast(qs), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("label"),
            (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
          // broadcast: a shuffle anti-join would exchange + sort the
          // FULL corpus×NQ candidate frame by (qid, vec_id) just to
          // drop a handful of dup pairs; the dup side is bounded by
          // the near-dups of NQ query vectors (guide §3.1)
          .join(broadcast(dup), Seq("qid", "vec_id"), "left_anti")
          .withColumn("rnk", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("cosine").desc, col("vec_id"))))
          .filter(col("rnk") <= 10)
          .select(col("qid"), col("rnk").cast("long").as("rnk"),
            col("vec_id"), col("label"), col("cosine"))
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $sqlNormed,
        t AS (SELECT ${sqlPlanes("(SELECT count(*) FROM embeddings)")} AS planes),
        bb AS (${(0 until NdBands).map(bnd =>
          s"SELECT vec_id, e, nrm, $bnd AS band, ${sqlBandBucket("e", bnd, "planes")} AS bucket FROM w, t")
          .mkString(" UNION ALL ")}),
        dp AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb,
            ${sqlDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cosine
          FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
            AND a.vec_id < b.vec_id),
        dup AS (SELECT va AS qid, vb AS vec_id FROM dp
            WHERE cosine >= 0.35 AND va < $PqEvalQueries
          UNION ALL
          SELECT vb AS qid, va AS vec_id FROM dp
            WHERE cosine >= 0.35 AND vb < $PqEvalQueries),
        cand AS (SELECT q.vec_id AS qid, v.vec_id, v.label,
            ${sqlDot("v.e", "q.e")} / (v.nrm * q.nrm) AS cosine
          FROM w v JOIN w q
            ON q.vec_id < $PqEvalQueries AND v.vec_id <> q.vec_id),
        surv AS (SELECT c.* FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM dup
            WHERE dup.qid = c.qid AND dup.vec_id = c.vec_id)),
        r AS (SELECT qid, vec_id, label, cosine, row_number() OVER (
            PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
          FROM surv)
        SELECT qid, cast(rnk as bigint) AS rnk, vec_id, label, cosine
        FROM r WHERE rnk <= 10 ORDER BY qid, rnk"""),
      bench = true)
  }

  // ------------------------------------------------------------------
  // q199 — LATE-INTERACTION MaxSim scoring (Khattab & Zaharia 2020,
  // ColBERT): a multi-vector query scored against multi-vector
  // documents as Σ over query vectors of the MAX cosine against the
  // document's vectors — the interaction that single-vector retrieval
  // (q42) cannot express (each query vector matches its own best doc
  // region). Here the query is the vec_id < 8 vector set and each
  // label group plays a multi-vector document (the testdata's grouping
  // column standing in for per-token document embeddings).
  //
  // Determinism: each (doc-group, query-vector) max is a max over
  // BITWISE-IDENTICAL cosines (the q41/q42 IEEE argument), quantized
  // floor(·1e9) to an integer BEFORE the per-group sum (q150
  // discipline — the sum is exact and order-independent; floor of
  // bit-identical doubles has no boundary risk).
  //
  // Scale shape: corpus × a BROADCAST 8-row query set — never doc ×
  // doc; the (label, qvec) max and the per-label sum are both
  // map-combinable groupBys; output is |labels| rows. In a production
  // ColBERT stack the corpus side would first be cut by an ANN
  // prefilter (q43/q162) — this operator is the exact re-scoring leg.
  // ------------------------------------------------------------------
  val maxSimScores: Q = {
    val NQ = 8
    Q(
      "q199_colbert_maxsim",
      (s, d) => {
        val w = normed(s, d)
        val qs = w.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("qv"), col("e").as("qe"),
            col("nrm").as("qnrm"))
        w.crossJoin(broadcast(qs))
          .select(col("label"), col("qv"),
            floor((dot("e", "qe") / (col("nrm") * col("qnrm"))) * lit(1e9))
              .cast("long").as("c_q9"))
          .groupBy("label", "qv").agg(max(col("c_q9")).as("m_q9"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_qvecs"),
            sum(col("m_q9")).as("maxsim_q9"))
          .select(col("label"), col("n_qvecs"), col("maxsim_q9"),
            (col("maxsim_q9").cast("double") / 1e9).as("maxsim"))
          .orderBy(desc("maxsim_q9"), asc("label"))
      },
      Some(s"""WITH $sqlNormed,
        qs AS (SELECT vec_id AS qv, e AS qe, nrm AS qnrm FROM w
          WHERE vec_id < $NQ),
        c AS (SELECT w.label, qs.qv,
            cast(floor((${sqlDot("w.e", "qs.qe")} / (w.nrm * qs.qnrm))
              * 1000000000.0) as bigint) AS c_q9
          FROM w, qs),
        m AS (SELECT label, qv, max(c_q9) AS m_q9 FROM c GROUP BY 1, 2)
        SELECT label, cast(count(*) as bigint) AS n_qvecs,
          cast(sum(m_q9) as bigint) AS maxsim_q9,
          cast(sum(m_q9) as double) / 1000000000.0 AS maxsim
        FROM m GROUP BY label
        ORDER BY maxsim_q9 DESC, label"""))
  }

  // ------------------------------------------------------------------
  // q202 — TRAINING-DATA ATTRIBUTION probe: for each doc in a FIXED
  // probe panel of held-out eval docs (the q84 split convention
  // doc_id % 10 == 0, bounded by the id cutoff < 1000 — a panel is a
  // pinned audit artifact, NOT "all eval docs": 10% of a 100 TB corpus
  // is not broadcastable, a 100-doc panel always is), the single
  // nearest TRAIN doc by embedding cosine, corroborated lexically with
  // the matched pair's shared distinct 3-gram count — the cheap
  // influence proxy behind "which training document is this output
  // closest to" audits (the retrieval stage of attribution methods
  // in the data-influence literature; embedding nearest-neighbor +
  // n-gram overlap is the standard first-pass evidence pair).
  //
  // Scale shape: normed corpus cached ONCE (both the panel filter and
  // the train side read the same cache — one embeddings scan); panel
  // broadcast against the corpus, top-1 per eval compiles to
  // TopKPerGroup's bounded heap; the expensive shingle projection is
  // restricted to the ≤ 2·|panel| matched docs via a broadcast
  // semi-join BEFORE tokenization, so documents is scanned once and
  // shingling cost is panel-bounded, never corpus-bounded. Cosines are
  // the bitwise-identical q42 sequence; the shingle intersection is an
  // exact integer.
  // ------------------------------------------------------------------
  val attributionProbe: Q = Q(
    "q202_attribution_probe",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.TextFunctions.register(s)
      val w = graft.CacheScope.cached(normed(s, d))
      val ev = w.filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000)
        .select(col("vec_id").as("eval_id"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val matched = graft.CacheScope.cached(
        w.filter(col("vec_id") % 10 =!= 0)
          .crossJoin(broadcast(ev))
          .select(col("eval_id"), col("vec_id").as("train_id"),
            (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("eval_id")
              .orderBy(col("cosine").desc, col("train_id"))))
          .filter(col("rnk") === 1)
          .select("eval_id", "train_id", "cosine"))
      val needed = matched.select(col("eval_id").as("doc_id"))
        .union(matched.select(col("train_id").as("doc_id")))
        .distinct()
      val sh = graft.CacheScope.cached(
        Tables.documents(s, d)
          .join(broadcast(needed), Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            array_distinct(shingles3(toks(col("text")))).as("g")))
      matched
        .join(sh.select(col("doc_id").as("eval_id"), col("g").as("ga")),
          "eval_id")
        .join(sh.select(col("doc_id").as("train_id"), col("g").as("gb")),
          "train_id")
        .select(col("eval_id"), col("train_id"), col("cosine"),
          size(array_intersect(col("ga"), col("gb")))
            .cast("long").as("shared_3grams"))
        .orderBy("eval_id")
    },
    Some(s"""WITH $sqlNormed,
      ev AS (SELECT vec_id AS eval_id, e AS qe, nrm AS qnrm FROM w
        WHERE vec_id % 10 = 0 AND vec_id < 1000),
      c AS (SELECT ev.eval_id, w.vec_id AS train_id,
          ${sqlDot("w.e", "ev.qe")} / (w.nrm * ev.qnrm) AS cosine
        FROM w, ev WHERE w.vec_id % 10 <> 0),
      m AS (SELECT eval_id, train_id, cosine FROM (
          SELECT eval_id, train_id, cosine, row_number() OVER (
            PARTITION BY eval_id ORDER BY cosine DESC, train_id) AS rnk
          FROM c)
        WHERE rnk = 1),
      sh AS (SELECT doc_id,
          list_distinct(${sqlShingles3(sqlToks("text"))}) AS g
        FROM documents
        WHERE doc_id IN (SELECT eval_id FROM m
          UNION SELECT train_id FROM m))
      SELECT m.eval_id, m.train_id, m.cosine,
        cast(len(list_intersect(a.g, b.g)) as bigint) AS shared_3grams
      FROM m JOIN sh a ON m.eval_id = a.doc_id
        JOIN sh b ON m.train_id = b.doc_id
      ORDER BY m.eval_id"""))

  // ------------------------------------------------------------------
  // q212 — HYBRID RETRIEVAL via Reciprocal Rank Fusion (Cormack,
  // Clarke & Buettcher 2009): fuse the BM25 known-item top-10 (q209,
  // lexical) with the embedding cosine top-10 (q42 shape, semantic)
  // per query — the standard production composition behind RAG and
  // training-data curation search, where neither ranker alone covers
  // paraphrases AND exact identifiers. RRF is rank-only, so the two
  // rankers' incomparable score scales never meet: fused = Σ_r
  // 1/(60 + rank_r), here as the exact integer 10⁶ div (60 + rank)
  // summed over the rankers that returned the doc (missing side
  // contributes 0) — no float anywhere, ties broken by doc_id.
  //
  // Scale shape: both input rankings are top-10-per-query frames
  // (TopKPerGroup bounded heaps); the fusion itself is a full-outer
  // join of two ≤ 8·10-row frames + one more bounded rank — driver-
  // scale after the rankers, exactly as in production. The doc_id ↔
  // vec_id identification is the q202 panel convention.
  // ------------------------------------------------------------------
  val hybridFusion: Q = Q(
    "q212_hybrid_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bm = Bm25Index.bm25TopKFrameUnordered(s, d)
        .select(col("qid"), col("doc_id"), col("rank").as("bm25_rank"))
      val w = graft.CacheScope.cached(normed(s, d))
      val qv = w.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val ann = w.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("ann_rank", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("cosine").desc, col("doc_id")))
          .cast("long"))
        .filter(col("ann_rank") <= 10)
        .select("qid", "doc_id", "ann_rank")
      // Full-outer of two UNIQUE-(qid,doc_id) top-10 frames as ONE
      // union + max-aggregate (guide §2.4): the shuffle full-outer
      // cost two exchanges + two sorts; the union pays one exchange
      // and no sort, and max(rank) over {rank, null} reproduces the
      // join's null padding exactly because each side contributes at
      // most one row per key.
      bm.withColumn("ann_rank", lit(null).cast("long"))
        .unionByName(ann
          .withColumn("bm25_rank", lit(null).cast("long"))
          .select("qid", "doc_id", "bm25_rank", "ann_rank"))
        .groupBy("qid", "doc_id")
        .agg(max("bm25_rank").as("bm25_rank"),
          max("ann_rank").as("ann_rank"))
        .withColumn("rrf_q6",
          coalesce(expr("1000000 div (60 + bm25_rank)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + ann_rank)"), lit(0L)))
        .withColumn("rank", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("rrf_q6").desc, col("doc_id")))
          .cast("long"))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("doc_id"), col("rrf_q6"),
          coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
          coalesce(col("ann_rank"), lit(0L)).as("ann_rank"))
        .orderBy("qid", "rank")
    },
    Some(s"""WITH ${Bm25Index.sqlBm25Chain},
      $sqlNormed,
      qv AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM w
        WHERE vec_id < 8),
      annall AS (SELECT qv.qid, w.vec_id AS doc_id,
          ${sqlDot("w.e", "qv.qe")} / (w.nrm * qv.qnrm) AS cosine
        FROM w, qv WHERE w.vec_id <> qv.qid),
      anntop AS (SELECT qid, doc_id, rnk AS ann_rank FROM (
          SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, doc_id) AS rnk
          FROM annall)
        WHERE rnk <= 10),
      bm AS (SELECT qid, doc_id, rnk AS bm25_rank FROM bmtop
        WHERE rnk <= 10),
      fused AS (SELECT coalesce(bm.qid, a.qid) AS qid,
          coalesce(bm.doc_id, a.doc_id) AS doc_id,
          coalesce(1000000 // (60 + bm.bm25_rank), 0)
            + coalesce(1000000 // (60 + a.ann_rank), 0) AS rrf_q6,
          coalesce(bm.bm25_rank, 0) AS bm25_rank,
          coalesce(a.ann_rank, 0) AS ann_rank
        FROM bm FULL OUTER JOIN anntop a
          ON bm.qid = a.qid AND bm.doc_id = a.doc_id)
      SELECT qid, cast(rnk as bigint) AS rank, doc_id,
        cast(rrf_q6 as bigint) AS rrf_q6,
        cast(bm25_rank as bigint) AS bm25_rank,
        cast(ann_rank as bigint) AS ann_rank
      FROM (SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY rrf_q6 DESC, doc_id) AS rnk
        FROM fused)
      WHERE rnk <= 10
      ORDER BY qid, rank"""),
    bench = true)

  // ------------------------------------------------------------------
  // q256 — ranker agreement audit: per query, how much the LEXICAL
  // top-10 (BM25) and the SEMANTIC top-10 (cosine ANN) agree —
  // overlap, Jaccard@10 and the mean rank displacement of shared docs.
  // The q212 fusion assumes the rankers disagree productively; this is
  // the measurement (near-total agreement → fusion buys nothing, run
  // one ranker; near-zero overlap → the embedding and the lexical
  // index are seeing different corpora — usually a pipeline bug, the
  // doc_id ↔ vec_id identification drifting). Same machinery as q212
  // minus the fusion: two bounded top-10 frames, one full-outer join
  // of ≤ 8·10-row sides, exact-integer ranks throughout; Jaccard@10
  // and mean displacement are single IEEE divisions of exact longs.
  // ------------------------------------------------------------------
  val rankerAgreement: Q = Q(
    "q256_ranker_agreement",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bm = Bm25Index.bm25TopKFrameUnordered(s, d)
        .select(col("qid"), col("doc_id"), col("rank").as("bm25_rank"))
      val w = graft.CacheScope.cached(normed(s, d))
      val qv = w.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      val ann = w.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("ann_rank", row_number().over(
            Window.partitionBy("qid")
              .orderBy(col("cosine").desc, col("doc_id")))
          .cast("long"))
        .filter(col("ann_rank") <= 10)
        .select("qid", "doc_id", "ann_rank")
      val both = col("bm25_rank").isNotNull && col("ann_rank").isNotNull
      // union + max-aggregate ≡ the full-outer of two unique-(qid,
      // doc_id) frames — the q212 rewrite (one exchange, no sorts)
      bm.withColumn("ann_rank", lit(null).cast("long"))
        .unionByName(ann
          .withColumn("bm25_rank", lit(null).cast("long"))
          .select("qid", "doc_id", "bm25_rank", "ann_rank"))
        .groupBy("qid", "doc_id")
        .agg(max("bm25_rank").as("bm25_rank"),
          max("ann_rank").as("ann_rank"))
        .groupBy("qid")
        .agg(count(when(both, 1)).as("overlap"),
          count(lit(1)).as("union_n"),
          sum(when(both, abs(col("bm25_rank") - col("ann_rank")))
            .otherwise(0L)).cast("long").as("displacement"))
        .select(col("qid"), col("overlap"), col("union_n"),
          (col("overlap").cast("double") / col("union_n")).as("jaccard10"),
          col("displacement"),
          when(col("overlap") > 0,
            col("displacement").cast("double") / col("overlap"))
            .as("mean_displacement"))
        .orderBy("qid")
    },
    Some(s"""WITH ${Bm25Index.sqlBm25Chain},
      $sqlNormed,
      qv AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM w
        WHERE vec_id < 8),
      annall AS (SELECT qv.qid, w.vec_id AS doc_id,
          ${sqlDot("w.e", "qv.qe")} / (w.nrm * qv.qnrm) AS cosine
        FROM w, qv WHERE w.vec_id <> qv.qid),
      anntop AS (SELECT qid, doc_id, rnk AS ann_rank FROM (
          SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
            ORDER BY cosine DESC, doc_id) AS rnk
          FROM annall)
        WHERE rnk <= 10),
      bm AS (SELECT qid, doc_id, rnk AS bm25_rank FROM bmtop
        WHERE rnk <= 10),
      j AS (SELECT coalesce(bm.qid, a.qid) AS qid,
          bm.bm25_rank, a.ann_rank
        FROM bm FULL OUTER JOIN anntop a
          ON bm.qid = a.qid AND bm.doc_id = a.doc_id)
      SELECT qid,
        cast(count_if(bm25_rank IS NOT NULL AND ann_rank IS NOT NULL)
          as bigint) AS overlap,
        cast(count(*) as bigint) AS union_n,
        cast(count_if(bm25_rank IS NOT NULL AND ann_rank IS NOT NULL)
          as double) / count(*) AS jaccard10,
        cast(sum(CASE WHEN bm25_rank IS NOT NULL AND ann_rank IS NOT NULL
          THEN abs(bm25_rank - ann_rank) ELSE 0 END) as bigint)
          AS displacement,
        CASE WHEN count_if(bm25_rank IS NOT NULL AND ann_rank IS NOT NULL)
            > 0
          THEN cast(sum(CASE WHEN bm25_rank IS NOT NULL
              AND ann_rank IS NOT NULL
              THEN abs(bm25_rank - ann_rank) ELSE 0 END) as double)
            / count_if(bm25_rank IS NOT NULL AND ann_rank IS NOT NULL)
          END AS mean_displacement
      FROM j GROUP BY qid ORDER BY qid"""))

  // ------------------------------------------------------------------
  // q213 — EMBEDDING-SPACE HEALTH per label: cosine dispersion of each
  // label's members around its own centroid — the collapse/anisotropy
  // audit (cf. Ethayarajh 2019) run before trusting an embedding
  // column for dedup or retrieval: a collapsed encoder (all members
  // cosine ≈ 1 to the centroid) makes SemDeDup/ANN over-merge, a
  // degenerate one (cosine ≈ 0, centroid ≈ noise) makes them useless.
  //
  // Exactness without libm or float-sum order dependence: components
  // quantize floor(·1e6) into integers FIRST (q150 discipline), the
  // centroid is the per-component integer sum divided by n via
  // floor(double-div) — written as the SAME IEEE floor(cast/n) on both
  // engines, so even a boundary rounding is identical — and the
  // AVERAGED centroid keeps every later product ≤ dims·10¹² —
  // int64-safe at ANY corpus size (the sum-vector form would overflow
  // at 100 TB; scale-invariance of cosine is what lets us average).
  // Doc↔centroid cosine then divides exact-integer dot/norms in
  // doubles, floor(·1e9)-quantized; per-label mean divides two exact
  // integers once.
  //
  // Scale shape: ONE embeddings scan exploded to (vec, comp) rows —
  // map-combinable groupBys only; the centroid frame is
  // |labels|·dims rows (broadcast); output |labels| rows.
  // ------------------------------------------------------------------
  val embeddingHealth: Q = Q(
    "q213_embedding_health",
    (s, d) => {
      val ex = graft.CacheScope.cached(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("i", "x")))
          .withColumn("xq",
            floor(col("x").cast("double") * lit(1e6)).cast("long")))
      val cent = ex.groupBy("label", "i")
        .agg(sum(col("xq")).as("cq"), count(lit(1)).as("n"))
        .withColumn("cqa",
          floor(col("cq").cast("double") / col("n")).cast("long"))
        .select("label", "i", "cqa")
      val cnorm = cent.groupBy("label")
        .agg(sum(col("cqa") * col("cqa")).as("n2c"))
      val per = ex.join(broadcast(cent), Seq("label", "i"))
        .groupBy("vec_id", "label")
        .agg(sum(col("xq") * col("cqa")).as("dotq"),
          sum(col("xq") * col("xq")).as("n2d"))
        .join(broadcast(cnorm), "label")
        .withColumn("cos_q9",
          when(col("n2d") > 0 && col("n2c") > 0,
            floor(col("dotq").cast("double") /
              (sqrt(col("n2d").cast("double")) *
                sqrt(col("n2c").cast("double"))) * lit(1e9)).cast("long"))
            .otherwise(lit(0L)))
      per.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("cos_q9")).as("sum_cos_q9"),
          min(col("cos_q9")).as("min_cos_q9"),
          max(col("cos_q9")).as("max_cos_q9"))
        .select(col("label"), col("n_vecs"),
          col("min_cos_q9"), col("max_cos_q9"),
          (col("sum_cos_q9").cast("double") / col("n_vecs") / 1e9)
            .as("mean_cos"))
        .orderBy("label")
    },
    Some(s"""WITH ex AS MATERIALIZED (SELECT vec_id, label, g.i AS i,
          cast(floor(cast(embedding[g.i] as double) * 1000000.0)
            as bigint) AS xq
        FROM embeddings,
          unnest(generate_series(1, len(embedding))) AS g(i)),
      cent AS MATERIALIZED (SELECT label, i,
          cast(floor(cast(sum(xq) as double) / count(*)) as bigint) AS cqa
        FROM ex GROUP BY 1, 2),
      cnorm AS (SELECT label, cast(sum(cqa * cqa) as bigint) AS n2c
        FROM cent GROUP BY 1),
      per AS (SELECT e.vec_id, e.label,
          cast(sum(e.xq * c.cqa) as bigint) AS dotq,
          cast(sum(e.xq * e.xq) as bigint) AS n2d
        FROM ex e JOIN cent c ON e.label = c.label AND e.i = c.i
        GROUP BY 1, 2),
      scored AS (SELECT p.vec_id, p.label,
          CASE WHEN p.n2d > 0 AND cn.n2c > 0
            THEN cast(floor(cast(p.dotq as double) /
              (sqrt(cast(p.n2d as double)) * sqrt(cast(cn.n2c as double)))
              * 1000000000.0) as bigint)
            ELSE 0 END AS cos_q9
        FROM per p JOIN cnorm cn USING (label))
      SELECT label, cast(count(*) as bigint) AS n_vecs,
        cast(min(cos_q9) as bigint) AS min_cos_q9,
        cast(max(cos_q9) as bigint) AS max_cos_q9,
        cast(sum(cos_q9) as double) / count(*) / 1000000000.0 AS mean_cos
      FROM scored GROUP BY label
      ORDER BY label"""),
    bench = true)

  // ------------------------------------------------------------------
  // q267 — ANN probe-cost curve: the DuckDB-oracled declarative twin of
  // IvfIndex.servingHealth's probe forecast. Vectors are assigned to a
  // PINNED centroid set (Pipelines.lloydCentroids — the q50b
  // discipline that makes clustering math hash-checkable), and the
  // per-cell population map is unrolled into the nprobe tuning curve:
  // rank cells by population (ties to the lower id), and for each
  // budget nprobe = 1..k report the WORST-case rows an nprobe-cell
  // probe scans (the cumulative sum of the nprobe largest cells — a
  // skewed query hits exactly those) next to the MEAN-case forecast
  // (nprobe × total/k). The gap between the two columns is the drift
  // readout: on a balanced index worst ≈ mean and nprobe budgets
  // translate directly to latency; when worst ≫ mean the hot cells
  // dominate every unlucky probe and the index needs a rebalance even
  // if no single cell trips the rebalance factor. This is the readout
  // AnnMaintenance's health gate consumes, here as an oracle-checked
  // query over the corpus (all-integer: exact ppm shares and integer
  // division on both engines).
  //
  // Scale shape: ONE embeddings scan (the argmin is k literal score
  // expressions — zero shuffles, the assignToCentroids discipline), a
  // map-combinable k-key groupBy, then window arithmetic over k rows.
  // Corpus size never reaches the window.
  // ------------------------------------------------------------------
  val annProbeCostCurve: Q = Q(
    "q267_ann_probe_cost_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val counts = IvfIndex.assignToCentroids(w, Pipelines.lloydCentroids)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      val ord = Window.orderBy(col("n_vecs").desc, col("cell"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts.select(col("cell"), col("n_vecs"),
          row_number().over(ord).as("nprobe"),
          sum(col("n_vecs")).over(ord).as("worst_rows"),
          sum(col("n_vecs")).over(wAll).as("total"),
          count(lit(1)).over(wAll).as("n_cells"))
        .select(col("nprobe"), col("cell"), col("n_vecs"),
          expr("n_vecs * 1000000 div total").as("share_ppm"),
          col("worst_rows"),
          expr("nprobe * total div n_cells").as("mean_rows"))
        .orderBy("nprobe")
    },
    Some {
      val dim = EmbeddingDim
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        counts AS (SELECT cell, cast(count(*) as bigint) AS n_vecs
          FROM cells GROUP BY 1),
        ranked AS (SELECT cell, n_vecs,
            cast(row_number() OVER (ORDER BY n_vecs DESC, cell) as int)
              AS nprobe,
            cast(sum(n_vecs) OVER (ORDER BY n_vecs DESC, cell) as bigint)
              AS worst_rows,
            cast(sum(n_vecs) OVER () as bigint) AS total,
            cast(count(*) OVER () as bigint) AS n_cells
          FROM counts)
        SELECT nprobe, cell, n_vecs,
          n_vecs * 1000000 // total AS share_ppm,
          worst_rows,
          nprobe * total // n_cells AS mean_rows
        FROM ranked ORDER BY nprobe"""
    })

  // ------------------------------------------------------------------
  // q268 — IVF nprobe→recall curve: q267's missing half. q267 prices
  // each nprobe budget (rows scanned, worst and mean case); this query
  // measures what each budget BUYS — for the same pinned centroid set,
  // the exact-cosine top-10 of each of 10 query vectors is tagged with
  // the PROBE RANK of its cell in that query's centroid ordering (rank
  // r = the r-th-nearest centroid to the query), so recall at
  // nprobe = r is simply the fraction of true neighbors whose cell
  // rank ≤ r — the whole curve rides ONE exact-top-k computation (the
  // q264 first-band trick applied to probe order: a budget's hit set
  // is a prefix of the ranked hits). Together the two queries are the
  // complete nprobe tuning economics: cost(nprobe) from q267 against
  // recall(nprobe) from here, both DuckDB-oracled in exact integers.
  //
  // Scale shape: corpus-vs-query role split (the q42/q58 precedent) —
  // the 10 query rows broadcast against one cached corpus pass, top-10
  // per query via row_number ≤ k (the TopKPerGroup bounded heap), cell
  // assignment as the k-literal argmin scan, then all arithmetic on
  // ≤ 100 (qid, rank) rows. The centroid-rank table is 10 queries ×
  // k cells, driver-bounded.
  // ------------------------------------------------------------------
  val annNprobeRecallCurve: Q = Q(
    "q268_ivf_nprobe_recall",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val k = Pipelines.lloydCentroids.length
      val w = graft.CacheScope.cached(Tables.embeddings(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("vec_id"))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(expr("dot_product(e, e)"))))
      val queries = w.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      // exact ground truth: top-10 cosine neighbors per query
      val win = Window.partitionBy(col("query_id"))
        .orderBy(desc("cosine"), asc("vec_id"))
      val top = w.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine",
          expr("dot_product(e, qe)") / (col("nrm") * col("qnrm")))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") <= 10)
        .select("query_id", "vec_id")
      // each vector's cell under the pinned quantizer
      val cells = IvfIndex
        .assignToCentroids(w, Pipelines.lloydCentroids)
        .select("vec_id", "cell")
      // each query's centroid ordering: probe rank r = r-th nearest
      // cell, same (score, cell) tie discipline as the argmin
      val scored = Pipelines.lloydCentroids.sortBy(_._1).map {
        case (cell, c) =>
          val c2 = c.map(x => x * x).sum
          struct(
            (lit(c2) - lit(2.0) * call_function("dot_product",
              col("qe"), array(c.toSeq.map(lit): _*))).as("score"),
            lit(cell).as("cell"))
      }
      val qrank = queries
        .select(col("query_id"), explode(array(scored: _*)).as("sc"))
        .select(col("query_id"), col("sc.score").as("score"),
          col("sc.cell").as("cell"))
        .withColumn("proberank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score"), col("cell"))))
        .select("query_id", "cell", "proberank")
      val hits = top.join(cells, "vec_id")
        .join(qrank, Seq("query_id", "cell"))
      val per = hits.groupBy("proberank").agg(count(lit(1)).as("n"))
      val cum = Window.orderBy("nprobe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.range(1, k + 1).select(col("id").cast("int").as("nprobe"))
        .join(per, col("nprobe") === col("proberank"), "left")
        .select(col("nprobe"),
          sum(coalesce(col("n"), lit(0L))).over(cum).as("n_hits"))
        .select(col("nprobe"), col("n_hits"),
          expr("n_hits * 1000000 div 100").as("recall_ppm"))
        .orderBy("nprobe")
    },
    Some {
      val dim = EmbeddingDim
      val k = Pipelines.lloydCentroids.length
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH n AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        w AS (SELECT vec_id, e,
          sqrt(list_reduce(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]), (x, y) -> x + y)) AS nrm
          FROM n),
        q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm
          FROM w WHERE vec_id < 10),
        topn AS (SELECT query_id, vec_id FROM (
          SELECT q.query_id, w.vec_id,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              list_reduce(list_transform(generate_series(1, len(w.e)), i -> w.e[i] * q.qe[i]), (x, y) -> x + y) / (w.nrm * q.qnrm) DESC,
              w.vec_id) AS rn
          FROM w, q WHERE w.vec_id <> q.query_id) WHERE rn <= 10),
        sc AS (SELECT vec_id, [$scores] AS scores FROM n),
        cells AS (SELECT vec_id,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        qsc AS (SELECT query_id, [${scores.replace("e[i]", "qe[i]")}] AS qscores FROM q),
        qrank AS (SELECT query_id, cell, proberank FROM (
          SELECT query_id, cast(i - 1 as int) AS cell,
            cast(row_number() OVER (PARTITION BY query_id
              ORDER BY qscores[i], i) as int) AS proberank
          FROM qsc, unnest(generate_series(1, $k)) AS u(i))),
        hits AS (SELECT t.query_id, r.proberank
          FROM topn t JOIN cells v ON t.vec_id = v.vec_id
          JOIN qrank r ON r.query_id = t.query_id AND r.cell = v.cell),
        per AS (SELECT proberank, cast(count(*) as bigint) AS hn
          FROM hits GROUP BY 1),
        grid AS (SELECT cast(g as int) AS nprobe
          FROM unnest(generate_series(1, $k)) AS s(g)),
        cum AS (SELECT nprobe,
            cast(sum(coalesce(hn, 0)) OVER (ORDER BY nprobe) as bigint)
              AS n_hits
          FROM grid LEFT JOIN per ON per.proberank = grid.nprobe)
        SELECT nprobe, n_hits, n_hits * 1000000 // 100 AS recall_ppm
        FROM cum ORDER BY nprobe"""
    })

  // ------------------------------------------------------------------
  // q269 — SEMANTIC train-vs-eval contamination curve: the embedding-
  // modality member of the contamination family. The lexical checks
  // (q84 exact 3-grams, q96, q168 fuzzy MinHash, q175 eval spans,
  // q265 threshold curve) all miss a paraphrased or translated eval
  // item — zero shared n-grams, same meaning; embedding-space
  // max-cosine is the detector that survives rewording. Per train
  // vector: the maximum cosine to ANY eval-split vector (vec_id % 10,
  // the q84 split convention), then the q265 threshold-sweep readout
  // at 5 operating points (0.80..0.99, carried as integer ppk so the
  // curve is hash-exact): how many train vectors a drop-at-τ policy
  // removes, in exact ppm of the train split. The curve is the
  // evidence for picking τ — at a too-eager threshold semantic dedup
  // collapses the corpus (the q265 lesson, embedding layer).
  //
  // Scale shape: bipartite brute force with the EVAL side broadcast
  // (10% split, and at 100 TB the eval panel is fixed-size while the
  // corpus grows — the q84 broadcast argument); per-train max is a
  // map-combinable groupBy on the corpus key; the 5-threshold sweep
  // is a doc-local literal explode on the |train|-row max frame,
  // never a grid × corpus join. Cosines are exact cross-engine (the
  // q58 same-order fold), so the threshold compares agree bit-wise.
  // ------------------------------------------------------------------
  val semanticContaminationCurve: Q = Q(
    "q269_semantic_contamination_curve",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(expr("dot_product(e, e)")))
      val ev = w.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("eid"), col("e").as("ee"),
          col("nrm").as("enrm"))
      val maxCos = w.filter(col("vec_id") % 10 =!= 0)
        .crossJoin(broadcast(ev))
        .withColumn("cosine",
          expr("dot_product(e, ee)") / (col("nrm") * col("enrm")))
        .groupBy("vec_id").agg(max(col("cosine")).as("max_cos"))
      maxCos
        .select(col("max_cos"),
          explode(typedlit(Seq(800, 850, 900, 950, 990)))
            .as("threshold_ppk"))
        .groupBy("threshold_ppk")
        .agg(count(lit(1)).as("n_train"),
          sum(when(col("max_cos") >= col("threshold_ppk") / lit(1000.0),
            1L).otherwise(0L)).as("n_flagged"))
        .select(col("threshold_ppk"), col("n_flagged"),
          expr("n_flagged * 1000000 div n_train").as("flagged_ppm"))
        .orderBy("threshold_ppk")
    },
    Some("""WITH n AS (SELECT vec_id,
        list_transform(embedding, x -> cast(x as double)) AS e
        FROM embeddings),
      w AS (SELECT vec_id, e,
        sqrt(list_reduce(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]), (x, y) -> x + y)) AS nrm
        FROM n),
      ev AS MATERIALIZED (SELECT vec_id AS eid, e AS ee, nrm AS enrm
        FROM w WHERE vec_id % 10 = 0),
      mx AS (SELECT t.vec_id,
          max(list_reduce(list_transform(generate_series(1, len(t.e)), i -> t.e[i] * v.ee[i]), (x, y) -> x + y) / (t.nrm * v.enrm)) AS max_cos
        FROM w t, ev v WHERE t.vec_id % 10 <> 0
        GROUP BY t.vec_id),
      x AS (SELECT max_cos, u.th AS threshold_ppk
        FROM mx, unnest([800, 850, 900, 950, 990]) AS u(th))
      SELECT threshold_ppk,
        cast(sum(CASE WHEN max_cos >= threshold_ppk / 1000.0
          THEN 1 ELSE 0 END) as bigint) AS n_flagged,
        cast(sum(CASE WHEN max_cos >= threshold_ppk / 1000.0
          THEN 1 ELSE 0 END) as bigint) * 1000000
          // cast(count(*) as bigint) AS flagged_ppm
      FROM x GROUP BY threshold_ppk ORDER BY threshold_ppk"""))

  // ------------------------------------------------------------------
  // q270 — 1-NN label agreement: the intrinsic embedding-quality
  // readout (does the space place same-label items near each other?)
  // that needs no trained probe — each eval-split vector (vec_id % 10,
  // the held-out convention) is classified by its single nearest
  // train-split neighbor under exact cosine (ties to the lower
  // vec_id), and agreement is reported per label with exact-ppm rates.
  // q213 audits the embedding GEOMETRY (norms, centroid drift); this
  // audits its SEMANTICS — a space can be numerically healthy and
  // still shuffle labels, which is what kills retrieval quality
  // downstream. Per-label rows expose WHICH classes bleed into each
  // other (a low-agreement label is where hard negatives and label
  // noise live — q194's mining target, quantified).
  //
  // Scale shape: the q269 bipartite with the roles flipped — the eval
  // panel is fixed-size, so at 100 TB the broadcast side is the eval
  // split and the scan side is the corpus; per-eval argmax is the
  // row_number ≤ 1 idiom (TopKPerGroup bounded heap, |eval| keys of
  // state); the label agg is |labels| rows. All-integer output.
  // ------------------------------------------------------------------
  val oneNnLabelAgreement: Q = Q(
    "q270_embedding_1nn_agreement",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(expr("dot_product(e, e)")))
      val ev = w.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("eid"), col("label").as("elabel"),
          col("e").as("ee"), col("nrm").as("enrm"))
      val win = Window.partitionBy(col("eid"))
        .orderBy(desc("cosine"), asc("vec_id"))
      w.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id"), col("label").as("tlabel"), col("e"),
          col("nrm")) // distinct name: the train label must never
                      // shadow the eval label through the agg
        .crossJoin(broadcast(ev))
        .withColumn("cosine",
          expr("dot_product(e, ee)") / (col("nrm") * col("enrm")))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .groupBy(col("elabel"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("tlabel") === col("elabel"), 1L).otherwise(0L))
            .as("n_agree"))
        .select(col("elabel").as("label"), col("n_eval"), col("n_agree"),
          expr("n_agree * 1000000 div n_eval").as("agree_ppm"))
        .orderBy("label")
    },
    Some("""WITH n AS (SELECT vec_id, label,
        list_transform(embedding, x -> cast(x as double)) AS e
        FROM embeddings),
      w AS (SELECT vec_id, label, e,
        sqrt(list_reduce(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]), (x, y) -> x + y)) AS nrm
        FROM n),
      ev AS MATERIALIZED (SELECT vec_id AS eid, label AS elabel,
        e AS ee, nrm AS enrm FROM w WHERE vec_id % 10 = 0),
      nn AS (SELECT eid, elabel, label FROM (
        SELECT v.eid, v.elabel, t.label,
          row_number() OVER (PARTITION BY v.eid ORDER BY
            list_reduce(list_transform(generate_series(1, len(t.e)), i -> t.e[i] * v.ee[i]), (x, y) -> x + y) / (t.nrm * v.enrm) DESC,
            t.vec_id) AS rn
        FROM w t, ev v WHERE t.vec_id % 10 <> 0) WHERE rn = 1)
      SELECT elabel AS label,
        cast(count(*) as bigint) AS n_eval,
        cast(sum(CASE WHEN label = elabel THEN 1 ELSE 0 END) as bigint)
          AS n_agree,
        cast(sum(CASE WHEN label = elabel THEN 1 ELSE 0 END) as bigint)
          * 1000000 // cast(count(*) as bigint) AS agree_ppm
      FROM nn GROUP BY elabel ORDER BY elabel"""))

  // ------------------------------------------------------------------
  // q271 — ANN deletion economics: the GDPR twin of q267's probe-cost
  // curve. A tombstone backlog taxes EVERY probe (the ids ride the
  // probe's anti-join, and the tombstoned rows still living in probed
  // cells are scanned then discarded) while the physical applyDeletes
  // pays a ONE-time rewrite of exactly the touched cell partitions.
  // This query prices both sides of that trade, per backlog size, in
  // exact integers: victims are the deterministic nested grid
  // vec_id % m = 0 for m ∈ {32,16,8,4,2} (each grid point ⊂ the next —
  // a growing backlog, sf-scaling with the corpus, no absolute
  // constants), cells are the pinned Pipelines.lloydCentroids
  // assignment (the q50b/q267 discipline), and per grid point:
  //   - backlog           tombstoned ids outstanding;
  //   - touched_cells /   the applyDeletes blast radius: cells holding
  //     touched_rows      ≥1 victim, and ALL their resident rows;
  //   - rewrite_rows      survivors the apply must rewrite
  //                       (touched_rows − backlog — the actual cost);
  //   - probe_tax_urows   expected tombstoned rows scanned per
  //                       nprobe=4 probe, in micro-rows: backlog ×
  //                       nprobe × 10⁶ div n_cells;
  //   - breakeven_probes  probes whose cumulative tax covers the
  //                       rewrite: ceil(rewrite_rows × n_cells /
  //                       (backlog × nprobe)) — run applyDeletes when
  //                       the probes since the last apply exceed it.
  // AnnMaintenance.backlogDue consumes the same inequality off the
  // servingHealth row (with min(backlog, n_cells) × mean_cell as the
  // rewrite FORECAST — the audit doesn't know which cells are hit;
  // this query computes the exact blast radius the forecast bounds).
  //
  // Scale shape: ONE embeddings scan (k-literal argmin — zero
  // shuffles), a map-combinable k-key groupBy carrying 5 conditional
  // counts, a 5-way explode over the k cell rows, and a 5-key final
  // aggregate. Corpus size never reaches the explode.
  // ------------------------------------------------------------------
  val annDeletionEconomics: Q = Q(
    "q271_ann_deletion_economics",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val grid = Seq(32, 16, 8, 4, 2)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val vicCols = grid.map(m =>
        count(when(col("vec_id") % m === 0, 1)).as(s"v$m"))
      val cellAgg = IvfIndex.assignToCentroids(w, Pipelines.lloydCentroids)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), vicCols: _*)
      val unpivot = cellAgg.select(col("cell"), col("n_vecs"),
          explode(array(grid.map(m =>
            struct(lit(m).as("grid_mod"), col(s"v$m").as("vics"))): _*))
            .as("g"))
        .select(col("g.grid_mod").as("grid_mod"), col("n_vecs"),
          col("g.vics").as("vics"))
      unpivot.groupBy("grid_mod")
        .agg(sum("vics").as("backlog"),
          count(when(col("vics") > 0, 1)).as("touched_cells"),
          sum(when(col("vics") > 0, col("n_vecs")).otherwise(0L))
            .as("touched_rows"),
          count(lit(1)).as("n_cells"))
        .select(col("grid_mod"), col("backlog"), col("touched_cells"),
          col("touched_rows"),
          (col("touched_rows") - col("backlog")).as("rewrite_rows"),
          expr("backlog * 4 * 1000000 div n_cells").as("probe_tax_urows"),
          expr("((touched_rows - backlog) * n_cells + backlog * 4 - 1) " +
            "div (backlog * 4)").as("breakeven_probes"))
        .orderBy(desc("grid_mod"))
    },
    Some {
      val dim = EmbeddingDim
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        cellagg AS (SELECT cell, cast(count(*) as bigint) AS n_vecs,
            cast(count(*) FILTER (WHERE vec_id % 32 = 0) as bigint) AS v32,
            cast(count(*) FILTER (WHERE vec_id % 16 = 0) as bigint) AS v16,
            cast(count(*) FILTER (WHERE vec_id % 8 = 0) as bigint) AS v8,
            cast(count(*) FILTER (WHERE vec_id % 4 = 0) as bigint) AS v4,
            cast(count(*) FILTER (WHERE vec_id % 2 = 0) as bigint) AS v2
          FROM cells GROUP BY 1),
        grid AS (SELECT g.m AS grid_mod, n_vecs,
            CASE g.m WHEN 32 THEN v32 WHEN 16 THEN v16 WHEN 8 THEN v8
              WHEN 4 THEN v4 ELSE v2 END AS vics
          FROM cellagg, unnest([32, 16, 8, 4, 2]) AS g(m)),
        agg AS (SELECT grid_mod,
            cast(sum(vics) as bigint) AS backlog,
            cast(count(*) FILTER (WHERE vics > 0) as bigint)
              AS touched_cells,
            cast(sum(CASE WHEN vics > 0 THEN n_vecs ELSE 0 END) as bigint)
              AS touched_rows,
            cast(count(*) as bigint) AS n_cells
          FROM grid GROUP BY 1)
        SELECT grid_mod, backlog, touched_cells, touched_rows,
          touched_rows - backlog AS rewrite_rows,
          backlog * 4 * 1000000 // n_cells AS probe_tax_urows,
          ((touched_rows - backlog) * n_cells + backlog * 4 - 1)
            // (backlog * 4) AS breakeven_probes
        FROM agg ORDER BY grid_mod DESC"""
    })

  // ------------------------------------------------------------------
  // q272 — filtered-probe selectivity forecast: sizes q222's ANN
  // over-fetch FROM data (the q192/q259 discipline — a knob priced by
  // a query instead of guessed). A filtered probe (q222: "top-k among
  // label = L") scans the ranked cells label-agnostically and
  // post-filters, so its effective cost multiplies by the label's
  // 1/selectivity INSIDE the scanned cells — and labels cluster (q270
  // measures that semantically), so corpus-wide selectivity is the
  // WRONG forecast when the probed cells are label-skewed. Per label,
  // over the pinned-centroid assignment: corpus selectivity in exact
  // ppm, the rows an nprobe=4 worst-case probe scans (q267's top-4
  // convention), the matching rows among them, the probe-local
  // selectivity, and overfetch_ppm = scanned × 10⁶ div matching — the
  // K'/K multiplier q222's over-fetch needs for that label (NULL via
  // nullif when a label is absent from the probed cells: no over-fetch
  // rescues it, switch to a partitioned index). The gap between
  // sel_ppm and probe_sel_ppm is the label-skew readout.
  //
  // Scale shape: ONE embeddings scan → (cell, label) groupBy (k×L
  // keys, map-combinable); every window/rank/aggregate after it runs
  // on ≤ k×L rows (≤ 160 here), driver-scale at any corpus size.
  // ------------------------------------------------------------------
  val filteredProbeSelectivity: Q = Q(
    "q272_filtered_probe_selectivity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val cl = IvfIndex.assignToCentroids(w, Pipelines.lloydCentroids)
        .groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("n"))
      val wCell = Window.partitionBy(col("cell"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = cl
        .withColumn("cell_rows", sum(col("n")).over(wCell))
        .withColumn("total", sum(col("n")).over(wAll))
        .withColumn("cell_rank", dense_rank().over(
          Window.orderBy(desc("cell_rows"), asc("cell"))))
      val perLabel = ranked.groupBy("label")
        .agg(sum(col("n")).as("label_rows"),
          sum(when(col("cell_rank") <= 4, col("n")).otherwise(0L))
            .as("matching_worst4"),
          max(col("total")).as("total"))
      perLabel
        .withColumn("scanned_worst4",
          sum(col("matching_worst4")).over(wAll))
        .select(col("label"), col("label_rows"),
          expr("label_rows * 1000000 div total").as("sel_ppm"),
          col("scanned_worst4"), col("matching_worst4"),
          expr("matching_worst4 * 1000000 div scanned_worst4")
            .as("probe_sel_ppm"),
          expr("scanned_worst4 * 1000000 div nullif(matching_worst4, 0)")
            .as("overfetch_ppm"))
        .orderBy("label")
    },
    Some {
      val dim = EmbeddingDim
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id, label,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, label, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id, label,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        cl AS (SELECT cell, label, cast(count(*) as bigint) AS n
          FROM cells GROUP BY 1, 2),
        ranked AS (SELECT cell, label, n,
            cast(sum(n) OVER (PARTITION BY cell) as bigint) AS cell_rows,
            cast(sum(n) OVER () as bigint) AS total
          FROM cl),
        ranked2 AS (SELECT *, cast(dense_rank() OVER
            (ORDER BY cell_rows DESC, cell) as bigint) AS cell_rank
          FROM ranked),
        per_label AS (SELECT label,
            cast(sum(n) as bigint) AS label_rows,
            cast(sum(CASE WHEN cell_rank <= 4 THEN n ELSE 0 END)
              as bigint) AS matching_worst4,
            cast(max(total) as bigint) AS total
          FROM ranked2 GROUP BY 1),
        final AS (SELECT *, cast(sum(matching_worst4) OVER () as bigint)
            AS scanned_worst4
          FROM per_label)
        SELECT label, label_rows,
          label_rows * 1000000 // total AS sel_ppm,
          scanned_worst4, matching_worst4,
          matching_worst4 * 1000000 // scanned_worst4 AS probe_sel_ppm,
          scanned_worst4 * 1000000 // nullif(matching_worst4, 0)
            AS overfetch_ppm
        FROM final ORDER BY label"""
    })

  // ------------------------------------------------------------------
  // q275 — actual probe cost vs forecast: the calibration audit that
  // closes the nprobe economics family. q267 FORECASTS per-budget cost
  // from the population map alone (worst = top-nprobe largest cells,
  // mean = nprobe × total/k) without knowing which cells real queries
  // probe; q268 measures what a budget buys. This query measures what
  // real queries actually PAY: for each of the 10 pinned query
  // vectors, the cells its nprobe=4 centroid ranking selects (rank by
  // the assignToCentroids score — |c|² − 2e·c, |e|² is rank-invariant
  // per query) and the rows those cells hold, against both forecasts
  // in exact ppm. actual/mean spread across queries is the
  // query-vs-population skew the mean forecast hides; actual touching
  // worst means hot cells sit exactly where queries land and the
  // rebalance is overdue regardless of hot_factor.
  //
  // Scale shape: the q269 corpus-vs-query role split — the 10-row
  // query slice is one pruned read, the corpus pass one full scan
  // into a k-key count aggregate; ranking/joins/ratios all run on
  // ≤ 10 × k rows.
  // ------------------------------------------------------------------
  val annProbeCostActual: Q = Q(
    "q275_ann_probe_cost_actual",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val k = Pipelines.lloydCentroids.length
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      // k rows, TWO consumers (the forecast aggregate and the
      // per-query join) — cache so the corpus pass runs once. The
      // explicit vec_id prune keeps this subtree distinct from q267's
      // UNCACHED identical count frame: Spark's cache lookup matches
      // analyzed plans, and a cached twin here would silently swap an
      // InMemoryRelation into q267's plan (its window-over-Aggregate
      // audit shape must stay visible).
      val counts = graft.CacheScope.cached(
        IvfIndex.assignToCentroids(w.select(col("e")),
            Pipelines.lloydCentroids)
          .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs")))
      // the two q267 forecasts, ONE aggregate row (worst = top-4
      // populations via a k-element collect_list sorted by struct
      // order (-n, cell) — no window, the input is k rows)
      val forecast = counts.agg(
        expr("aggregate(slice(array_sort(collect_list(" +
          "struct(-n_vecs as negn, cell, n_vecs))), 1, 4), 0L, " +
          "(acc, x) -> acc + x.n_vecs)").as("worst_rows"),
        expr(s"4 * sum(n_vecs) div $k").as("mean_rows"))
      // per query: rank ALL cells by the centroid score and keep 4
      val scored = Pipelines.lloydCentroids.sortBy(_._1).map { case (c, arr) =>
        val c2 = arr.map(v => v * v).sum
        struct(lit(c).as("cell"),
          (lit(c2) - lit(2.0) * call_function("dot_product",
            col("e"), array(arr.toSeq.map(lit): _*))).as("score"))
      }
      val qOrd = Window.partitionBy(col("query_id"))
        .orderBy(asc("score"), asc("cell"))
      val actual = w.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          explode(array(scored: _*)).as("sc"))
        .select(col("query_id"), col("sc.cell").as("cell"),
          col("sc.score").as("score"))
        .withColumn("pr", row_number().over(qOrd))
        .filter(col("pr") <= 4)
        .join(counts, "cell")
        .groupBy("query_id")
        .agg(sum(col("n_vecs")).as("actual_rows"))
      actual.crossJoin(forecast)
        .select(col("query_id"), col("actual_rows"),
          col("worst_rows"), col("mean_rows"),
          expr("actual_rows * 1000000 div mean_rows").as("vs_mean_ppm"),
          expr("actual_rows * 1000000 div worst_rows").as("vs_worst_ppm"))
        .orderBy("query_id")
    },
    Some {
      val dim = EmbeddingDim
      val k = Pipelines.lloydCentroids.length
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        counts AS (SELECT cell, cast(count(*) as bigint) AS n_vecs
          FROM cells GROUP BY 1),
        fc AS (SELECT
            cast(sum(CASE WHEN pr <= 4 THEN n_vecs ELSE 0 END) as bigint)
              AS worst_rows,
            cast(4 * max(total) // $k as bigint) AS mean_rows
          FROM (SELECT n_vecs,
              row_number() OVER (ORDER BY n_vecs DESC, cell) AS pr,
              sum(n_vecs) OVER () AS total
            FROM counts)),
        qs AS (SELECT vec_id AS query_id, g.i - 1 AS cell,
            scores[g.i] AS score
          FROM sc, unnest(generate_series(1, $k)) AS g(i)
          WHERE vec_id < 10),
        ranked AS (SELECT query_id, cell,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score, cell) AS pr
          FROM qs),
        act AS (SELECT query_id,
            cast(sum(n_vecs) as bigint) AS actual_rows
          FROM ranked JOIN counts USING (cell)
          WHERE pr <= 4 GROUP BY 1)
        SELECT query_id, actual_rows, worst_rows, mean_rows,
          actual_rows * 1000000 // mean_rows AS vs_mean_ppm,
          actual_rows * 1000000 // worst_rows AS vs_worst_ppm
        FROM act, fc ORDER BY query_id"""
    })

  // ------------------------------------------------------------------
  // q276 — filtered-probe recall calibration: does the q272-sized
  // over-fetch DELIVER? [[IvfIndex.queryFiltered]] serves "top-k with
  // label = ℓ" by ranking K′ unfiltered candidates from the probed
  // cells and post-filtering, with K′ = ⌈k·scanned/matching⌉ + two-
  // sigma (the uniform-mixing operating point priced from the stats
  // table). This audit replays that EXACT formula over the 10 pinned
  // query vectors and the pinned Lloyd centroids: per (query, label),
  // the probed-cell candidate list (self-excluded), its (scanned,
  // matching) stats, the operator's K′, and the label hits inside the
  // top-K′ — aggregated per label into achieved vs attainable
  // (min(k, matching)) recall in exact ppm. recall_ppm = 10⁶ means
  // the forecast's operating point held; a shortfall measures exactly
  // the label clustering (q272's sel vs probe_sel gap) the uniform-
  // mixing expectation cannot see. The zero-match case (a label
  // absent from the probed cells) is the operator's loud
  // NoMatchInProbedCells error, spec'd in IvfIndexSpec — here such
  // (query, label) pairs simply contribute no row.
  //
  // Scale shape: ONE corpus pass for the pinned-centroid assignment
  // (cached — candidate join + stats ride the same frame); candidates
  // are bounded by nprobe × cell population × NQ — the same rows a
  // real probe fan-out scans; every aggregate after runs on ≤ NQ × L
  // keys. The per-query ranking is the q222 window shape.
  // ------------------------------------------------------------------
  val filteredRecallCalibration: Q = Q(
    "q276_filtered_recall_calibration",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(expr("dot_product(e, e)")))
      val cells = graft.CacheScope.cached(
        IvfIndex.assignToCentroids(w, Pipelines.lloydCentroids))
      // per-query ranked-4 probe cells (q275's scaffolding)
      val scored = Pipelines.lloydCentroids.sortBy(_._1).map { case (c, arr) =>
        val c2 = arr.map(v => v * v).sum
        struct(lit(c).as("cell"),
          (lit(c2) - lit(2.0) * call_function("dot_product",
            col("e"), array(arr.toSeq.map(lit): _*))).as("score"))
      }
      val qOrd = Window.partitionBy(col("query_id"))
        .orderBy(asc("score"), asc("cell"))
      val probes = cells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          explode(array(scored: _*)).as("sc"))
        .select(col("query_id"), col("sc.cell").as("cell"),
          col("sc.score").as("score"))
        .withColumn("pr", row_number().over(qOrd))
        .filter(col("pr") <= 4)
        .select("query_id", "cell")
      val qs = cells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qnrm"))
      // the candidate list a filtered probe actually ranks: the probed
      // cells' rows, self-excluded, in exact unfiltered cosine order
      val cand = graft.CacheScope.cached(cells
        .select("vec_id", "label", "e", "nrm", "cell")
        .join(probes, "cell")
        .join(qs, "query_id")
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("label"),
          (dot("e", "qe") / (col("nrm") * col("qnrm"))).as("cos"))
        .withColumn("rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("vec_id")))))
      val wQ = Window.partitionBy("query_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val kp = cand.groupBy("query_id", "label")
        .agg(count(lit(1)).cast("long").as("matching"))
        .withColumn("scanned", sum(col("matching")).over(wQ))
        .withColumn("mean_k",
          expr("(10 * scanned + matching - 1) div matching"))
        .withColumn("kprime", expr("greatest(least(mean_k + " +
          "cast(ceil(2 * sqrt(cast(mean_k as double))) as bigint), " +
          "scanned), 10)"))
      val hits = cand.join(kp, Seq("query_id", "label"))
        .groupBy(col("query_id"), col("label"), col("matching"),
          col("scanned"), col("kprime"))
        .agg(count(when(col("rn") <= col("kprime"), 1)).cast("long")
          .as("hits"))
      hits.groupBy("label")
        .agg(count(lit(1)).cast("long").as("n_queries"),
          sum(col("scanned")).cast("long").as("scanned_rows"),
          sum(col("matching")).cast("long").as("matching_rows"),
          sum(col("kprime")).cast("long").as("kprime_rows"),
          sum(least(col("matching"), lit(10L))).cast("long")
            .as("attainable"),
          sum(least(col("hits"), lit(10L))).cast("long").as("achieved"))
        .withColumn("recall_ppm",
          expr("achieved * 1000000 div attainable"))
        .orderBy("label")
    },
    Some {
      val dim = EmbeddingDim
      val k = Pipelines.lloydCentroids.length
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id, label,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        w AS (SELECT vec_id, label, e,
          sqrt(${sqlDot("e", "e")}) AS nrm FROM ed),
        sc AS (SELECT vec_id, label, e, nrm, [$scores] AS scores FROM w),
        cells AS (SELECT vec_id, label, e, nrm,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell,
          scores FROM sc),
        probes AS (SELECT query_id, cell FROM (
            SELECT vec_id AS query_id, g.i - 1 AS cell,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY scores[g.i], g.i - 1) AS pr
            FROM sc, unnest(generate_series(1, $k)) AS g(i)
            WHERE vec_id < 10) WHERE pr <= 4),
        qs AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm
          FROM cells WHERE vec_id < 10),
        cand AS (SELECT p.query_id, v.vec_id, v.label,
            row_number() OVER (PARTITION BY p.query_id
              ORDER BY ${sqlDot("v.e", "q.qe")} / (v.nrm * q.qnrm) DESC,
                v.vec_id) AS rn
          FROM cells v JOIN probes p ON v.cell = p.cell
            JOIN qs q ON p.query_id = q.query_id
          WHERE v.vec_id <> p.query_id),
        kp AS (SELECT query_id, label,
            cast(count(*) as bigint) AS matching,
            cast(sum(count(*)) OVER (PARTITION BY query_id) as bigint)
              AS scanned
          FROM cand GROUP BY 1, 2),
        kp2 AS (SELECT *,
            (10 * scanned + matching - 1) // matching AS mean_k
          FROM kp),
        kp3 AS (SELECT *, greatest(least(mean_k +
            cast(ceil(2 * sqrt(cast(mean_k as double))) as bigint),
            scanned), 10) AS kprime
          FROM kp2),
        hits AS (SELECT c.query_id, c.label, k.matching, k.scanned,
            k.kprime,
            cast(count(CASE WHEN c.rn <= k.kprime THEN 1 END) as bigint)
              AS hits
          FROM cand c JOIN kp3 k
            ON c.query_id = k.query_id AND c.label = k.label
          GROUP BY 1, 2, 3, 4, 5)
        SELECT label, cast(count(*) as bigint) AS n_queries,
          cast(sum(scanned) as bigint) AS scanned_rows,
          cast(sum(matching) as bigint) AS matching_rows,
          cast(sum(kprime) as bigint) AS kprime_rows,
          cast(sum(least(matching, 10)) as bigint) AS attainable,
          cast(sum(least(hits, 10)) as bigint) AS achieved,
          cast(sum(least(hits, 10)) * 1000000 //
            sum(least(matching, 10)) as bigint) AS recall_ppm
        FROM hits GROUP BY 1 ORDER BY label"""
    })

  // ------------------------------------------------------------------
  // q277 — retired-set guard economics: prices [[RetiredIds]]'
  // compact-on-append threshold the q271/q274 way, so
  // `CompactThreshold = 8` stops being the lifecycle's one guessed
  // constant. Model: a stream of B=24 retire batches (sizes from
  // data — batch b retires the ids with vec_id ≡ b−1 (mod 24), the
  // nested-grid trick), one append-guard read between consecutive
  // retires. The guard's ROW fan-in is threshold-invariant (the live
  // segments always union to the cumulative set — distinct batches,
  // no dup rows), so the threshold trades exactly two costs: per-read
  // segment OPENS (footer + dictionary per live segment — opens_total
  // = Σ_b live segments after batch b) against compaction REWRITES
  // (compact_rows_total = Σ over compactions of the cumulative set
  // size at that batch). Emitted per threshold in exact integers,
  // plus the q271-style breakeven: `breakeven_open_rows_vs_next` =
  // the per-open cost (in row units) at which threshold t ties with
  // 2t — prefer the LARGER threshold while the storage's real open
  // cost sits under the breakeven. The breakevens scale LINEARLY
  // with retire-batch size (compaction rewrites scale with the set,
  // opens don't), so the justified threshold GROWS with deployment
  // scale: at this test corpus the 4→8 breakeven is tens of id-rows
  // (≈ the cheapest possible open), while at production id volumes
  // (millions of retirements per sweep) the same column reads in the
  // thousands and 8 sits comfortably inside the justified band — the
  // committed default priced by the curve instead of guessed, with
  // the curve itself telling a small deployment to compact MORE
  // aggressively.
  //
  // Scale shape: ONE embeddings scan into a 24-key count, then every
  // window/aggregate runs on the 24 × 6 (batch × threshold) grid —
  // driver-scale at any corpus size.
  // ------------------------------------------------------------------
  val retiredGuardEconomics: Q = Q(
    "q277_retired_guard_economics",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sizes = Tables.embeddings(s, d)
        .select((col("vec_id") % 24).cast("int").as("bm"))
        .groupBy("bm").agg(count(lit(1)).as("s_b"))
        .select((col("bm") + 1).as("b"), col("s_b"))
      val wCum = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val batches = sizes.withColumn("cum_rows", sum(col("s_b")).over(wCum))
      val grid = batches.withColumn("t",
          explode(array(Seq(1, 2, 4, 8, 16, 32).map(lit): _*)))
        .withColumn("segs_after", expr("(b - 1) % t + 1"))
        .withColumn("is_compact",
          expr("case when b > 1 and (b - 1) % t = 0 then 1 else 0 end"))
      val perT = grid.groupBy("t")
        .agg(sum(expr("cast(segs_after as bigint)")).as("opens_total"),
          sum(expr("cast(is_compact as bigint)")).as("n_compactions"),
          sum(expr("cast(is_compact as bigint) * cum_rows"))
            .as("compact_rows_total"),
          max(expr("cast(segs_after as bigint)")).as("max_live_segs"),
          sum(col("cum_rows")).as("guard_rows_total"))
      val wT = Window.orderBy("t")
      perT
        .withColumn("breakeven_open_rows_vs_next",
          expr("cast(null as bigint)"))
        .drop("breakeven_open_rows_vs_next")
        .withColumn("next_opens", lead(col("opens_total"), 1).over(wT))
        .withColumn("next_compact",
          lead(col("compact_rows_total"), 1).over(wT))
        .select(col("t"), col("max_live_segs"), col("n_compactions"),
          col("opens_total"), col("compact_rows_total"),
          col("guard_rows_total"),
          expr("(compact_rows_total - next_compact) div " +
            "nullif(next_opens - opens_total, 0)")
            .as("breakeven_open_rows_vs_next"))
        .orderBy("t")
    },
    Some {
      s"""WITH sizes AS (SELECT cast(vec_id % 24 as int) + 1 AS b,
          cast(count(*) as bigint) AS s_b
          FROM embeddings GROUP BY 1),
        batches AS (SELECT b, s_b,
            cast(sum(s_b) OVER (ORDER BY b) as bigint) AS cum_rows
          FROM sizes),
        grid AS (SELECT g.b, g.cum_rows, t.t,
            (g.b - 1) % t.t + 1 AS segs_after,
            CASE WHEN g.b > 1 AND (g.b - 1) % t.t = 0
              THEN 1 ELSE 0 END AS is_compact
          FROM batches g, (VALUES (1), (2), (4), (8), (16), (32))
            AS t(t)),
        per_t AS (SELECT t,
            cast(sum(segs_after) as bigint) AS opens_total,
            cast(sum(is_compact) as bigint) AS n_compactions,
            cast(sum(is_compact * cum_rows) as bigint)
              AS compact_rows_total,
            cast(max(segs_after) as bigint) AS max_live_segs,
            cast(sum(cum_rows) as bigint) AS guard_rows_total
          FROM grid GROUP BY 1),
        led AS (SELECT *,
            lead(opens_total) OVER (ORDER BY t) AS next_opens,
            lead(compact_rows_total) OVER (ORDER BY t) AS next_compact
          FROM per_t)
        SELECT t, max_live_segs, n_compactions, opens_total,
          compact_rows_total, guard_rows_total,
          (compact_rows_total - next_compact) //
            nullif(next_opens - opens_total, 0)
            AS breakeven_open_rows_vs_next
        FROM led ORDER BY t"""
    })

  // ------------------------------------------------------------------
  // q278 — traffic-gate economics: the oracle for the third
  // maintenance gate, completing the symmetry (backlogDue ↔ q271,
  // trafficDue ↔ this). A probe landing on the nprobe LARGEST cells
  // scans `worst` rows instead of the `mean` forecast — an excess of
  // (worst − mean) rows per touch — while the top-N split's rewrite
  // costs ~`worst` rows once. breakeven_touches = ⌈worst / excess⌉ is
  // the exact touch count at which the cumulative excess covers the
  // rewrite: the number AnnMaintenance.trafficDue compares the
  // ProbeLedger's worst-cell touches against. Emitted per nprobe in
  // exact integers over the pinned-centroid population map (q267's
  // conventions: mean = n × total div k); a uniform map yields
  // excess = 0 → NULL breakeven (no traffic volume justifies a split
  // of a balanced index — the gate's built-in convergence).
  //
  // Scale shape: ONE corpus scan into the k-key count aggregate, one
  // k-element sorted array, a 4-point literal grid — driver-scale
  // after the single aggregate at any corpus size.
  // ------------------------------------------------------------------
  val trafficGateEconomics: Q = Q(
    "q278_traffic_gate_economics",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val k = Pipelines.lloydCentroids.length
      val w = Tables.embeddings(s, d)
        .select(transform(col("embedding"), x => x.cast("double")).as("e"))
      val pops = IvfIndex.assignToCentroids(w, Pipelines.lloydCentroids)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
        .agg(expr("array_sort(collect_list(" +
          "struct(-n_vecs as negn, cell, n_vecs)))").as("a"),
          sum(col("n_vecs")).as("total"))
      pops.select(explode(typedlit(Seq(1, 2, 4, 8))).as("nprobe"),
          col("a"), col("total"))
        .withColumn("worst_rows", expr("aggregate(slice(a, 1, nprobe), " +
          "0L, (acc, x) -> acc + x.n_vecs)"))
        .withColumn("mean_rows", expr(s"nprobe * total div $k"))
        .withColumn("excess_rows", expr("worst_rows - mean_rows"))
        .select(col("nprobe"), col("worst_rows"), col("mean_rows"),
          col("excess_rows"),
          expr("(worst_rows + excess_rows - 1) div " +
            "nullif(excess_rows, 0)").as("breakeven_touches"))
        .orderBy("nprobe")
    },
    Some {
      val dim = EmbeddingDim
      val k = Pipelines.lloydCentroids.length
      val scores = Pipelines.lloydCentroids.map { case (_, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      s"""WITH ed AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cell
          FROM sc),
        counts AS (SELECT cell, cast(count(*) as bigint) AS n_vecs
          FROM cells GROUP BY 1),
        ranked AS (SELECT n_vecs,
            row_number() OVER (ORDER BY n_vecs DESC, cell) AS pr,
            cast(sum(n_vecs) OVER () as bigint) AS total
          FROM counts),
        per_n AS (SELECT g.nprobe,
            cast(sum(CASE WHEN r.pr <= g.nprobe THEN r.n_vecs
              ELSE 0 END) as bigint) AS worst_rows,
            cast(g.nprobe * max(r.total) // $k as bigint) AS mean_rows
          FROM ranked r, (VALUES (1), (2), (4), (8)) AS g(nprobe)
          GROUP BY 1)
        SELECT nprobe, worst_rows, mean_rows,
          worst_rows - mean_rows AS excess_rows,
          (worst_rows + (worst_rows - mean_rows) - 1) //
            nullif(worst_rows - mean_rows, 0) AS breakeven_touches
        FROM per_n ORDER BY nprobe"""
    })

  val all: Seq[Q] = Seq(norms, nearDupPairs, annBruteForce, annLsh,
    annIvf, annIvfIncremental, semanticDedup, multimodalMeta, arrayFuncs,
    pqEncode, pqAdcTopK, pqCodeBalance, pqRerankTopK, pqRecallEval,
    mrlRecallEval, int8RecallEval, filteredAnnRecall, multiProbeLshRecall,
    mmrRerank, retrievalMetrics,
    hardNegatives, maxSimScores, attributionProbe, hybridFusion,
    embeddingHealth, rankerAgreement, annProbeCostCurve,
    annNprobeRecallCurve, semanticContaminationCurve,
    oneNnLabelAgreement, annDeletionEconomics, filteredProbeSelectivity,
    annProbeCostActual, filteredRecallCalibration, retiredGuardEconomics,
    trafficGateEconomics)
}

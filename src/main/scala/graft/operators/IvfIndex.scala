package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index lifecycle: build ONCE, persist as plain parquet, query MANY
  * — the serving shape for ANN at 100 TB, where re-clustering per query
  * (q55's self-contained form) is obviously wrong.
  *
  * The index is two parquet tables:
  *   - `centroids/`  — (cell, centroid: array<double>), k rows: tiny,
  *     collected driver-side at query time to pick probe cells;
  *   - `vectors/`    — (vec_id, label, e, nrm) PARTITIONED BY cell, so a
  *     probe reads ONLY its nprobe directories: partition pruning does
  *     the index lookup, no custom storage engine needed.
  *
  * Query = load centroids (k rows) → nearest nprobe cells to the query
  * vector (driver-side, k·dim floats) → partition-pruned scan of those
  * cells → exact cosine re-rank → top-k. IvfIndexSpec asserts the scan
  * actually prunes (input files ⊂ the probed cell directories) and that
  * recall vs brute force is sane.
  */
object IvfIndex {

  /** Fit the coarse quantizer and write the two index tables. */
  def build(spark: SparkSession, sfDir: String, indexDir: String,
      k: Int = 16, seed: Long = 1L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.functions.VectorFunctions.register(spark)
    val w = Tables_normed(spark, sfDir)
      .withColumn("fv", array_to_vector(col("e"))).cache()
    try {
      val km = new KMeans().setK(k).setSeed(seed)
        .setFeaturesCol("fv").setPredictionCol("cell").fit(w)
      val spark2 = spark
      import spark2.implicits._
      km.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$indexDir/centroids")
      km.transform(w)
        .select(col("vec_id"), col("label"), col("e"), col("nrm"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$indexDir/vectors")
    } finally w.unpersist()
  }

  /** Top-k by exact cosine among the nprobe nearest cells of `query`. */
  def query(spark: SparkSession, indexDir: String, query: Array[Double],
      topK: Int = 10, nprobe: Int = 4): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val probes = centroids.map { case (cell, c) =>
      val d2 = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (cell, d2)
    }.sortBy(_._2).take(nprobe).map(_._1).toSeq
    val qnrm = math.sqrt(query.map(x => x * x).sum)
    val qe = array(query.map(lit): _*)
    spark.read.parquet(s"$indexDir/vectors")
      .filter(col("cell").isin(probes: _*)) // partition pruning = the lookup
      .withColumn("qe", qe)
      .withColumn("cosine",
        expr("dot_product(e, qe)") / (col("nrm") * lit(qnrm)))
      .select("vec_id", "label", "cell", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(topK)
  }

  /** Nearest-centroid assignment as a pure scan expression — the
    * incremental side of the lifecycle (assign tonight's batch to the
    * EXISTING index, no refit). Squared L2 decomposes as
    * |e|² − 2·e·c + |c|², and |e|² is candidate-invariant, so the
    * argmin needs only (|c|² − 2·e·c) per centroid; the k centroids are
    * inlined as literals (k-bounded, the same discipline as [[query]]'s
    * driver-side probe pick), giving one scan with zero shuffles and no
    * ML stage. Ties break to the LOWER cell id via (score, cell) struct
    * ordering — deterministic regardless of centroid order. Requires
    * `dot_product` (VectorFunctions) on the session. */
  def assignToCentroids(vecs: DataFrame,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val scored = centroids.sortBy(_._1).map { case (cell, c) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * call_function("dot_product",
          col("e"), array(c.toSeq.map(lit): _*))).as("score"),
        lit(cell).as("cell"))
    }
    vecs.withColumn("cell", array_min(array(scored: _*)).getField("cell"))
  }

  /** Append NEW vectors to a persisted index: broadcast-free argmin
    * assignment against the stored centroids, then an append write
    * under the cell partitions — the existing vectors are never read or
    * rewritten (q127's incremental-dedup shape, applied to ANN). */
  def appendVectors(spark: SparkSession, indexDir: String,
      newVecs: DataFrame): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    // align to the STORED schema before writing: parquet append with a
    // mismatched column type (e.g. string label into an int index)
    // corrupts the table for every later reader — ANSI cast fails loudly
    // here instead, at append time
    val stored = spark.read.parquet(s"$indexDir/vectors").schema
    val aligned = stored.fields.filterNot(_.name == "cell")
      .map(f => col(f.name).cast(f.dataType).as(f.name))
    assignToCentroids(newVecs, centroids)
      .select(aligned :+ col("cell"): _*)
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/vectors")
  }

  /** Shared normalization — Similarity.normed itself, so the index
    * builder inherits its loud raise_error on a dimension mismatch
    * (a silent filter here would drop corrupt vectors from the index
    * with no error anywhere). */
  private def Tables_normed(s: SparkSession, d: String): DataFrame =
    Similarity.normed(s, d)
}

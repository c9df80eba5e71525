package graft.pipeline

import graft.sources.CsvIngest
import graft.apps.AppSchema
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{Imputer, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's batch ML job (spark_script.py:18-156) re-expressed in
  * Scala spark.ml with identical stages and parameters:
  *
  *   K-Means pipeline (spark_script.py:58-77): Imputer(mean) over up to 8
  *   numerics → StringIndexer(genre, skip) → VectorAssembler →
  *   StandardScaler(std, no mean) → KMeans(k=5, seed=1) → `cluster`.
  *
  *   RF pipeline (spark_script.py:84-113): Imputer(mean) over the same
  *   numerics EXCLUDING score (it is the label) → StringIndexer(genre,
  *   skip) → VectorAssembler → RandomForestRegressor(seed=42, maxBins=64)
  *   → `PredictedRating`; RMSE via RegressionEvaluator.
  *
  * Fit on valid rows, transform ALL rows — so rows failing the validity
  * filter (or with unknown genres under handleInvalid="skip") legitimately
  * lack a cluster; the serving layer's null-cluster 404 depends on this
  * (SURVEY §7.3).
  */
object AppModels {

  private val numericFeaturesCluster = Seq("score", "minInstalls", "price")
  private val imageFeatures = Seq("img_avg_red", "img_avg_green",
    "img_avg_blue", "img_width", "img_height")

  /** K-Means pipeline over the columns present in `df` (the reference's
    * `if c in columns` guards). */
  def kmeansPipeline(df: DataFrame): Pipeline = {
    val inputs = (numericFeaturesCluster ++ imageFeatures)
      .filter(df.columns.contains)
    val imputed = inputs.map(_ + "_imputed")
    new Pipeline().setStages(Array(
      new Imputer().setInputCols(inputs.toArray)
        .setOutputCols(imputed.toArray).setStrategy("mean"),
      new StringIndexer().setInputCol("genre")
        .setOutputCol("genreIndexKMeans").setHandleInvalid("skip"),
      new VectorAssembler()
        .setInputCols((imputed :+ "genreIndexKMeans").toArray)
        .setOutputCol("unscaled_features"),
      new StandardScaler().setInputCol("unscaled_features")
        .setOutputCol("scaled_features").setWithStd(true).setWithMean(false),
      new KMeans().setK(5).setSeed(1)
        .setFeaturesCol("scaled_features").setPredictionCol("cluster")))
  }

  /** RF pipeline — score excluded from features (it is the label). */
  def rfPipeline(df: DataFrame): Pipeline = {
    val inputs = (Seq("minInstalls", "price") ++ imageFeatures)
      .filter(df.columns.contains)
    val imputed = inputs.map(_ + "_imputedRF")
    new Pipeline().setStages(Array(
      new Imputer().setInputCols(inputs.toArray)
        .setOutputCols(imputed.toArray).setStrategy("mean"),
      new StringIndexer().setInputCol("genre")
        .setOutputCol("genreIndexRF").setHandleInvalid("skip"),
      new VectorAssembler()
        .setInputCols((imputed :+ "genreIndexRF").toArray)
        .setOutputCol("features_rf"),
      new RandomForestRegressor().setFeaturesCol("features_rf")
        .setLabelCol("score").setPredictionCol("PredictedRating")
        .setSeed(42).setMaxBins(64)))
  }

  final case class TrainResult(
      kmeansModel: PipelineModel,
      rfModel: PipelineModel,
      scored: DataFrame,
      clusterCounts: DataFrame,
      rmse: Double)

  /** Full training flow (spark_script.py:18-129): cast → validity filter
    * (cached) → min-rows gate → fit both pipelines on valid rows →
    * transform all rows → cluster report + RMSE. */
  def train(dfRaw: DataFrame, minRows: Long = 10): Either[String, TrainResult] = {
    val cleaned = CsvIngest.castColumns(dfRaw, AppSchema.trainingCastMap)
    val valid = CsvIngest.validForTraining(cleaned).cache()
    try {
      val n = valid.count()
      if (n < minRows) Left(s"Not enough data for training: $n < $minRows")
      else {
        val km = kmeansPipeline(valid).fit(valid)
        val clustered = km.transform(cleaned)
        val counts = clustered.groupBy("cluster").count().orderBy("cluster")
        val rf = rfPipeline(valid).fit(valid)
        val scored = rf.transform(clustered)
        val rmse = new RegressionEvaluator().setLabelCol("score")
          .setPredictionCol("PredictedRating").setMetricName("rmse")
          .evaluate(rf.transform(valid))
        Right(TrainResult(km, rf, scored, counts, rmse))
      }
    } finally valid.unpersist()
  }

  /** Final API projection + parquet overwrite sink
    * (spark_script.py:136-153). */
  def saveApiData(scored: DataFrame, path: String): Unit = {
    val cols = AppSchema.finalApiColumns.filter(scored.columns.contains)
    scored.select(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in the [[Registry]]; this object just re-shapes them
  * into the driver's expected Maps.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** The full operator inventory, one [[Q]] per operator. */
object Registry {
  def all: Seq[Q] =
    operators.Relational.all ++
      operators.TpchMore.all ++
      operators.TextAnalysis.all ++
      operators.Dedup.all ++
      operators.LshBandIndex.all ++
      operators.PrevalenceIndex.all ++
      operators.Bm25Index.all ++
      operators.RollupStore.all ++
      operators.Similarity.all ++
      operators.Pipelines.all ++
      operators.Sampling.all ++
      operators.CorpusPipeline.all ++
      operators.Layout.all ++
      operators.TrainingPrep.all ++
      operators.QualityModel.all ++
      apps.TitleMatch.all

  def benchSet: Seq[Q] = all.filter(_.bench)
}

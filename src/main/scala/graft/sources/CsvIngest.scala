package graft.sources

import graft.apps.AppSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Batch CSV ingest with the reference's exact semantics:
  *   - read all CSVs in a folder as one all-string table with
  *     header=true, escape='"' (spark_script.py:168) — quoted multiline
  *     summary fields survive;
  *   - drift tolerance: batches with missing/extra columns are merged
  *     via unionByName(allowMissingColumns=true), the Spark-native twin
  *     of the consumer's df.reindex (consumer.py:50-59);
  *   - canonical column order: consumer's enforced prefix + extras in
  *     first-seen order (consumer.py:35-48);
  *   - two-phase typing: cast selected columns if present
  *     (spark_script.py:37-40, app.py:125-127);
  *   - training-validity filter (spark_script.py:43-45).
  *
  * Scale note: one multi-file scan, no driver-side row loops; Spark
  * parallelizes by file split, so a 100 TB batch_data directory reads
  * with full cluster parallelism.
  */
object CsvIngest {

  /** Read a folder of batch CSVs as one all-string DataFrame. */
  def readBatchDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true") // quoted newlines in summary fields
      .csv(dir)

  /** Merge schema-drifted frames: union by name, null-filling columns
    * absent on either side (the consumer's reindex semantics). */
  def driftUnion(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Reorder to the canonical prefix, appending unexpected extras in
    * their current order (consumer.py:45-48). Missing canonical columns
    * are added as nulls. */
  def enforceOrder(df: DataFrame): DataFrame = {
    val present = df.columns.toSeq
    val canonical = AppSchema.canonicalColumns
    val withMissing = canonical.filterNot(present.contains)
      .foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast("string")))
    val ordered = canonical ++ present.filterNot(canonical.contains)
    withMissing.select(ordered.map(col): _*)
  }

  /** Two-phase typing: cast each mapped column that exists
    * (spark_script.py:39 `if col in df.columns` guard). */
  def castColumns(df: DataFrame, castMap: Map[String, DataType]): DataFrame =
    castMap.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(t)) else d
    }

  /** Training-validity filter: score, minInstalls, price all non-null
    * (spark_script.py:43-45). */
  def validForTraining(df: DataFrame): DataFrame =
    df.filter(col("score").isNotNull && col("minInstalls").isNotNull &&
      col("price").isNotNull)

  /** Typed CSV read with a quarantine lane: PERMISSIVE mode keeps
    * malformed rows (wrong arity, untypeable values) instead of failing
    * the job, capturing the raw line in a corrupt-record column. Returns
    * (clean rows without the marker column, quarantined raw lines). At
    * 100 TB a single bad line must cost one quarantined row, not a
    * failed 6-hour job — and the quarantine frame is what ops replays
    * after fixing the producer. */
  /** Returns (clean, quarantine, raw): the raw cached frame is exposed
    * so the CALLER can unpersist it when both lanes are consumed —
    * unpersisting a derived frame would not release the cached scan. */
  def readTypedWithQuarantine(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val withMarker = schema.add(corrupt, "string")
    val raw = spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withMarker)
      .csv(dir)
      .cache() // one scan feeds both lanes
    val good = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantine = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_line"))
    (good, quarantine, raw)
  }
}

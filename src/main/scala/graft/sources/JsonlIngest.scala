package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch JSON-lines ingest with corrupt-record quarantine — the
  * file-batch twin of the streaming `from_json` decode
  * (StreamIngest.scala; the reference parses JSON messages in
  * consumer.py:30-33), hardened for the corpus-scale reality that a
  * multi-TB crawl dump ALWAYS contains some malformed lines: a parse
  * failure must neither kill the job (FAILFAST) nor silently vanish
  * (DROPMALFORMED), but land in a quarantine with the raw line
  * preserved for reprocessing.
  *
  * Mechanics: PERMISSIVE mode with an explicit `_corrupt_record`
  * column appended to the user schema — a malformed line yields a row
  * with the raw text in the corrupt column. "Malformed" covers BOTH
  * unparseable lines and records whose fields fail type conversion
  * (Spark routes type drift to the corrupt column too — spec-pinned),
  * so the good side never silently null-fills a drifted value.
  *
  * Two Spark sharp edges are handled here so callers can't trip them:
  *   - the corrupt column MUST be part of the passed schema (Spark
  *     drops it otherwise), so [[read]] appends it;
  *   - since SPARK-26243, a query that references ONLY the corrupt
  *     column (e.g. `df.filter($"_corrupt_record".isNotNull)`) throws
  *     an AnalysisException — Spark refuses the ambiguous
  *     pushdown-on-internal-column plan. [[split]] therefore
  *     materializes the parsed frame once (cache) before carving the
  *     good/quarantine sides, which is also the right plan: one file
  *     scan feeds both outputs.
  *
  * Scale shape: one multi-file JSON scan parallelized by file split;
  * the good/quarantine split is two projections over the cached parse
  * (no re-read, no shuffle). Quarantine fraction is the ingest-health
  * metric a pipeline alerts on.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Read a directory (or glob) of JSON-lines files against `schema`,
    * PERMISSIVE, with the corrupt-record column appended. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (good rows without the corrupt column, quarantine rows of
    * (raw_line)) — carved from ONE cached parse; see the SPARK-26243
    * note above. The caller owns unpersisting the returned frames'
    * shared cache via the third element. */
  def split(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame, () => Unit) = {
    val parsed = read(spark, path, schema).cache()
    val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine, () => { parsed.unpersist(); () })
  }
}

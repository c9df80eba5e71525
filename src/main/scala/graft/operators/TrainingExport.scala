package graft.operators

import graft.Dsl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Balanced shard export — the last mile of a training-data pipeline:
  * after cleaning/dedup/packing, the corpus ships as N equal-ish shards
  * that downstream loaders read independently.
  *
  * Design for 100 TB:
  *  - shard assignment is a CONTENT hash mod N (never `df.sample`,
  *    `rand()`, or `spark_partition_id` — reassignment must be
  *    reproducible across runs, partitionings, and cluster sizes);
  *  - `repartition(N, shard)` before `partitionBy(shard)` means each
  *    shard is written by exactly one task → one file per shard dir,
  *    not tasks×shards small files (the classic partitioned-write
  *    mistake that melts the namenode at scale);
  *  - readers filter on the hive partition column and get a
  *    partition-PRUNED scan (ScaleLayoutSpec asserts selectedPartitions
  *    == 1 of N), so a loader re-reading one shard never touches the
  *    other N−1.
  */
object TrainingExport {

  /** Deterministic shard id: 61-bit content hash of `hashCols` mod
    * `nShards`. Declarative md5 twin (resolves on any session). */
  def shardCol(nShards: Int, hashCols: Seq[String]): org.apache.spark.sql.Column =
    pmod(Dsl.md5h61Decl(concat_ws("|", hashCols.map(col): _*)),
      lit(nShards.toLong)).cast("int")

  /** Write `df` as `nShards` hive-partitioned parquet shards under
    * `outDir` (dirs `shard=0..N-1`), one file per shard. */
  def writeShards(df: DataFrame, outDir: String, nShards: Int,
      hashCols: Seq[String]): Unit =
    df.withColumn("shard", shardCol(nShards, hashCols))
      .repartition(nShards, col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)

  /** Read one shard back — filter on the partition column, so the scan
    * is partition-pruned to that shard's directory. */
  def readShard(spark: SparkSession, outDir: String, shard: Int): DataFrame =
    spark.read.parquet(outDir).filter(col("shard") === shard)
}

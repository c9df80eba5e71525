package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout behaviors that carry the 100 TB story: bucketed
  * co-located joins (no shuffle) and partition-pruned reads. */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val sf = TestSpark.sf0001
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself requires no hash-partitioning exchange
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // correctness unchanged vs the unbucketed join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("date-partitioned lake layout prunes partitions at read") {
    val sf = TestSpark.sf0001
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toFile
    dir.deleteOnExit()
    Tables.events(spark, sf)
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").mode("overwrite")
      .parquet(dir.getAbsolutePath)

    val pruned = spark.read.parquet(dir.getAbsolutePath)
      .filter(col("dt") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"expected partition filters in:\n$plan")
    // the pruned read returns exactly that day's events
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("shard export is balanced, deterministic, one file per shard, and pruned at read") {
    val sf = TestSpark.sf0001
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toFile
    dir.deleteOnExit()
    val N = 8
    operators.TrainingExport.writeShards(docs, dir.getAbsolutePath, N,
      Seq("text"))

    // lossless: every doc lands in exactly one shard
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)

    // balance: hash sharding over 500 docs → no empty or outsized shard
    val sizes = back.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until N).toSet, s"missing shards: $sizes")
    val (mx, mn) = (sizes.values.max, sizes.values.min)
    assert(mx < 3 * mn, s"shards too skewed: $sizes")

    // one parquet file per shard dir (repartition-before-partitionBy)
    for (s <- 0 until N) {
      val files = new java.io.File(dir, s"shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files")
    }

    // reading one shard prunes to 1 of N partitions
    val one = operators.TrainingExport.readShard(spark, dir.getAbsolutePath, 3)
    one.collect()
    val scan = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.selectedPartitions.partitionCount == 1,
      s"shard read touched ${scan.selectedPartitions.partitionCount} partitions")

    // deterministic: re-export assigns identical shard ids
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toFile
    dir2.deleteOnExit()
    operators.TrainingExport.writeShards(docs, dir2.getAbsolutePath, N,
      Seq("text"))
    val a = back.select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.parquet(dir2.getAbsolutePath).select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}

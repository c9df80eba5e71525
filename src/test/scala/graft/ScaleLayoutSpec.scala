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

  test("dynamic partition pruning: a filtered dim prunes the fact scan at runtime") {
    // The filter lives on the DIM side only — the fact scan can't be
    // statically pruned; Spark must broadcast the dim's dt values and
    // inject them as a runtime partition filter (dynamicpruning
    // subquery). This is the 100 TB join shape: a date-partitioned
    // event lake joined to a small filtered dimension.
    val sf = TestSpark.sf0001
    val lakeDir = java.nio.file.Files.createTempDirectory("graft-dpp-fact").toFile
    lakeDir.deleteOnExit()
    Tables.events(spark, sf)
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").mode("overwrite")
      .parquet(lakeDir.getAbsolutePath)
    val fact = spark.read.parquet(lakeDir.getAbsolutePath)
    val allDays = fact.select("dt").distinct().count()

    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toFile
    dimDir.deleteOnExit()
    fact.select("dt").distinct().orderBy("dt").limit(3)
      .withColumn("tag", lit("keep"))
      .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
    val dim = spark.read.parquet(dimDir.getAbsolutePath)
      .filter(col("tag") === "keep")

    val joined = fact.join(dim, "dt")
      .groupBy("dt").agg(count(lit(1)).as("n"))
    val rows = joined.collect() // materialize so the adaptive plan finalizes
    assert(rows.length == 3, s"expected 3 joined days, got ${rows.length}")
    val plan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning subquery filter:\n$plan")
    // AdaptiveSparkPlanExec/QueryStageExec are leaf wrappers — recurse
    // through their embedded plans to reach the actual file scans
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val pruned = scans(plan).filter(_.partitionFilters.nonEmpty)
    assert(pruned.nonEmpty, "expected a partition-filtered fact scan")
    // selectedPartitions applies only STATIC filters; the runtime DPP
    // listing is reported through the scan's numPartitions metric
    val touched = pruned.head.metrics("numPartitions").value
    assert(touched == 3 && allDays > 3,
      s"DPP must list only the dim's 3 of $allDays partitions, listed $touched")
  }

  test("z-order layout prunes on BOTH dimensions; a single-column sort cannot") {
    // sf0.01: sf0.001's custkeys all fit one 256-aligned z block, so
    // only the larger table exercises custkey pruning
    val sf = "/root/testdata/sf0.01"
    val zb = SparkEntry.queries("q184_zorder_layout")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val rows = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("unix_seconds(cast(o_orderdate as timestamp)) div 86400"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(zb.map(_ => 1).sum > 20, "need enough z-ranges to measure")
    // a 30-day predicate and a 200-customer predicate, placed relative
    // to the data so they exist at any regeneration
    val minDay = rows.map(_._2).min
    val minCk = rows.map(_._1).min
    val (dLo, dHi) = (minDay + 1000, minDay + 1029)
    val (cLo, cHi) = (minCk + 200, minCk + 399)
    def dayFrac(bs: Array[(Long, Long, Long, Long)]) =
      bs.count(b => b._4 >= dLo && b._3 <= dHi).toDouble / bs.length
    def ckFrac(bs: Array[(Long, Long, Long, Long)]) =
      bs.count(b => b._2 >= cLo && b._1 <= cHi).toDouble / bs.length
    // the comparison layout: the SAME table in the same number of
    // equal-count buckets, sorted by custkey only
    val sorted = rows.sortBy(identity)
    val per = math.max(1, rows.length / zb.length)
    val ckSorted = sorted.grouped(per).toArray.map(g =>
      (g.map(_._1).min, g.map(_._1).max, g.map(_._2).min, g.map(_._2).max))
    // z-order: both predicates skip a majority of ranges (measured
    // 0.09 / 0.33 at sf0.01); custkey sort: the date predicate skips
    // NOTHING (measured 1.0) — every bucket spans all dates
    assert(dayFrac(zb) < 0.3, s"z day-overlap ${dayFrac(zb)}")
    assert(ckFrac(zb) < 0.6, s"z custkey-overlap ${ckFrac(zb)}")
    assert(dayFrac(ckSorted) > 0.95,
      s"custkey-sorted day-overlap ${dayFrac(ckSorted)}")
    // and the audit's ranges cover the table exactly
    val n = SparkEntry.queries("q184_zorder_layout")(spark, sf)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    assert(n == rows.length.toLong)
    // the documented zValue validity bound: above 65535 a dimension
    // silently aliases (TPC-H o_custkey crosses it around sf≈0.44) —
    // assert both audited domains fit the 16-bit space at this sf, so
    // a testdata regeneration that breaks the premise fails HERE
    // instead of silently degrading the rectangles
    assert(rows.map(_._1).max <= 65535L,
      s"o_custkey ${rows.map(_._1).max} exceeds zValue's 16-bit domain " +
        "— switch q184 to zValueScaled")
    assert(rows.map(_._2).max <= 65535L,
      s"day ${rows.map(_._2).max} exceeds zValue's 16-bit domain")
  }

  test("zValueScaled keeps clustering beyond the 16-bit domain where zValue aliases") {
    import spark.implicits._
    graft.functions.TextFunctions.register(spark)
    // a 2^20 domain: x strides of 65536 are EXACTLY the aliasing case —
    // the plain mask folds them all onto x=0
    val xs = (0L until 16L).map(_ * 65536L)
    val df = xs.map(x => (x, 0L)).toDF("x", "y")
      .select(col("x"), col("y"),
        operators.Layout.zValue(col("x"), col("y")).as("z"),
        operators.Layout.zValueScaled(col("x"), (1L << 20) - 1,
          col("y"), 65535L).as("zs"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).distinct.length == 1,
      "plain zValue should alias all 65536-strided values into one key")
    assert(got.map(_._3).distinct.length == got.length,
      "zValueScaled must separate them (high-order bits interleaved)")
    // monotone in x ⇒ locality survives: nearby x stay in nearby cells
    assert(got.sortBy(_._1).map(_._3).sliding(2).forall(p => p(0) < p(1)))
    // degenerates to zValue exactly when the domain fits 16 bits
    val small = (0L until 200L by 7L).map(x => (x, (x * 13) % 65536L))
      .toDF("x", "y")
      .select(operators.Layout.zValue(col("x"), col("y")).as("z"),
        operators.Layout.zValueScaled(col("x"), 65535L, col("y"), 65535L)
          .as("zs"))
    assert(small.filter(col("z") =!= col("zs")).count() == 0)
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

  test("q215 join-skew audit matches a driver-side recomputation on events.user_id") {
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q215_join_skew_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(rows.keySet == Set("lineitem", "orders", "events"))
    // exact recomputation of the events row from raw per-key counts
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1)).sorted
    val nKeys = counts.length.toLong
    val nRows = counts.sum
    val mx = counts.max
    val k99 = (99 * nKeys + 99) / 100
    val p99 = counts((k99 - 1).toInt) // rank selection over sorted sizes
    val skew = (BigInt(mx) * nKeys * 1000000 / nRows).toLong
    assert(rows("events") == ((nRows, nKeys, mx, p99, skew)),
      s"events: ${rows("events")} != ${(nRows, nKeys, mx, p99, skew)}")
    // structural laws on every audited table
    rows.values.foreach { case (nr, nk, m, p, s) =>
      assert(p <= m && m <= nr && nk <= nr && s >= 1000000L,
        s"laws violated: ${(nr, nk, m, p, s)}")
    }
  }
}

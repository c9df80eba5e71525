package graft.tools

import graft.{Q, Registry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc plan/timing dissector for the headline bench queries.
  * Not part of the driver contract — a dev tool: run variants of a hot
  * query side by side, print per-action wall times and (optionally)
  * formatted plans, so bench regressions are diagnosed from evidence
  * instead of guessed at.
  *
  * Usage: sbt "runMain graft.tools.Profile [sfDir] [reps]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      println(f"[profile] $label%-42s best=$best%8.3fs all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }

    val li = () => Tables.lineitem(spark, sfDir)
    val o = () => Tables.orders(spark, sfDir)
    val c = () => Tables.customer(spark, sfDir)
    val n = () => Tables.nation(spark, sfDir)
    val r = () => Tables.region(spark, sfDir)
    val Dec = org.apache.spark.sql.types.DecimalType(18, 4)

    // ---- raw scan costs ----
    time("scan lineitem count")(li().count())
    time("scan lineitem agg rev")(
      li().agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))).count())
    time("scan orders count")(o().count())

    // ---- q06 variants ----
    time("q06 current (registry)")(
      Registry.all.find(_.name == "q06_join_multiway_agg").get.run(spark, sfDir).count())

    def q06flat(): DataFrame =
      li().join(o(), col("l_orderkey") === col("o_orderkey"))
        .join(c(), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n()), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r()), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    time("q06 flat star join")(q06flat().count())

    def q06oneLevel(): DataFrame = {
      val liAgg = li().groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).as("rev_part"),
          count(lit(1)).as("n_part"))
      liAgg.join(o(), col("l_orderkey") === col("o_orderkey"))
        .join(c(), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n()), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r()), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(col("rev_part")).cast("double").as("revenue"),
          sum(col("n_part")).as("n_items"))
        .orderBy("r_name")
    }
    time("q06 one-level preagg")(q06oneLevel().count())

    // map lineitem straight to nation via broadcast dim chain on customer?
    // dims c(15k) broadcastable: collapse to a single shuffle
    def q06broadcastCust(): DataFrame = {
      val dim = c().join(broadcast(n()), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r()), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"))
      val oDim = o().join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("r_name"))
      li().join(broadcast(oDim), col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }
    time("q06 broadcast dim chain")(q06broadcastCust().count())

    // ---- other headline queries ----
    Seq("q05_join_left_outer", "q26_events_hourly", "q37_minhash_lsh_pairs",
      "q41_embed_neardup_pairs", "q58_ann_batch").foreach { qn =>
      time(s"$qn (registry)")(
        Registry.all.find(_.name == qn).get.run(spark, sfDir).count())
    }

    // q05 without the protocol sort (count() should eliminate it anyway)
    time("q05 join only, no orderBy")(
      o().join(c(), col("o_custkey") === col("c_custkey"), "left_outer")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment").count())

    // ---- q116 stage dissection (bench hot spot) ----
    import graft.Dsl._
    val docs = () => Tables.documents(spark, sfDir)
    time("q116 docs scan count")(docs().count())
    time("q116 toks only")(
      docs().select(col("doc_id"), size(toks(col("text"))).as("n")).agg(sum("n")).count())
    time("q116 shingles only")(
      docs().select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), size(shingles3(col("t"))).as("n")).agg(sum("n")).count())
    time("q116 + md5 per gram")(
      docs().select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), shingles3(col("t")).as("sh"))
        .select(col("doc_id"), transform(col("sh"), g => md5h61(g)).as("hs"))
        .select(sum(aggregate(col("hs"), lit(0L), (a, x) => a + x)))
        .count())
    time("q116 full (registry)")(
      Registry.all.find(_.name == "q116_winnow_fingerprints").get.run(spark, sfDir).count())

    if (sys.env.contains("PROFILE_EXPLAIN")) {
      val qn = sys.env("PROFILE_EXPLAIN")
      println(s"==== $qn optimized plan ====")
      val df = Registry.all.find(_.name == qn).get.run(spark, sfDir)
      println(df.queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Runtime exchange-reuse / scan-count auditor. Executes each named
  * registry query (reuse only materializes under AQE at runtime) and
  * reports, from the FINAL adaptive plan, how many ReusedExchange nodes
  * fired and how many times each base table is scanned — the signal
  * that caught q133/q134 silently reading the fact table twice when
  * branch-local pruning or pushdown de-canonicalized a shared subtree.
  *
  * Usage: sbt "runMain graft.tools.ReuseAudit q134_tpch_q17 [more]"
  * Optional env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
  */
object ReuseAudit {
  private val tables =
    Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region", "documents", "embeddings", "events")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val scans = tables.map(t =>
        t -> s"$t\\.parquet".r.findAllIn(fin).size).filter(_._2 > 0)
      println(s"$n reused=${"ReusedExchange".r.findAllIn(fin).size} " +
        scans.map { case (t, c) => s"$t=$c" }.mkString(" "))
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Physical-plan printer for registry queries — the `.explain` loop the
  * builder brief asks for, as a one-shot command. Not part of the
  * driver contract; complements [[Profile]] (which times variants).
  *
  * Usage: sbt "runMain graft.tools.PlanDump q138_tpch_q2 [more names]"
  * Optional env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
  *
  * Metadata truncation is raised so PushedFilters/ReadSchema print in
  * full — the same setting TestSpark uses for plan assertions.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

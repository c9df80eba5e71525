package graft

import org.apache.spark.sql.SparkSession

object ScratchExplain2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q116_winnow_fingerprints")(spark, "/root/testdata/sf0.1")
    println(df.queryExecution.optimizedPlan.toString.take(4000))
    spark.stop()
  }
}

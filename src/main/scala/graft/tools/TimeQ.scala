package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Minimal per-query timer for optimization A/B runs — Bench's exact
  * session config and measure action (warm pass + timed `.count()`
  * reps, min reported), for an arbitrary list of registry queries.
  * Dev-only; not part of the driver contract.
  *
  * Usage: sbt "runMain graft.tools.TimeQ q143_substring_dedup [more]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timeq")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })
    for (n <- args) {
      val run = SparkEntry.queries(n)
      run(spark, sfDir).count() // warm: JIT + codegen + page cache
      jobs.set(0); stages.set(0); tasks.set(0)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // SparkListener events arrive asynchronously on the listener bus;
      // drain before sampling so late job-start events are counted
      // (listenerBus.waitUntilEmpty is private[spark] — a short sleep is
      // enough for a dev tool whose counters feed A/B plan comparisons).
      Thread.sleep(300)
      println(f"[timeq] $n%-34s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.3f").mkString(",")} jobs=${jobs.get.toDouble / reps}%.1f stages=${stages.get.toDouble / reps}%.1f tasks=${tasks.get.toDouble / reps}%.1f")
    }
    spark.stop()
  }
}

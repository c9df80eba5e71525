package graft

import graft.apps.ServingData
import graft.streaming.StreamIngest
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Serving startup resolution (app.py:98-116) + Kafka bind-time option
  * construction (producer.py:34-48 / consumer.py:74-80 — the only part
  * of the transport testable without a broker jar). */
class ServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkServingTree(): Path = {
    val base = Files.createTempDirectory("serving")
    def put(name: String, mtimeMillis: Long): Path = {
      val d = Files.createDirectory(base.resolve(name))
      Files.setLastModifiedTime(d,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMillis))
      d
    }
    put("api_app_info_20240101", 1000000L)
    put("api_app_info_20240301", 3000000L)
    put("api_app_info_20240201", 2000000L)
    put("other_dir", 9000000L) // wrong prefix: never selected
    Files.createFile(base.resolve("api_app_info_stray.txt")) // file, not dir
    base
  }

  test("latest api_app_info_* dir wins by mtime, ignoring other entries") {
    val base = mkServingTree()
    val latest = ServingData.findLatestDataPath(base)
    assert(latest.map(_.getFileName.toString).contains("api_app_info_20240301"))
  }

  test("no matching dir or missing base resolves to None") {
    val empty = Files.createTempDirectory("serving-empty")
    assert(ServingData.findLatestDataPath(empty).isEmpty)
    assert(ServingData.findLatestDataPath(empty.resolve("missing")).isEmpty)
  }

  test("loadApiData reads and caches the newest serving parquet") {
    import spark.implicits._
    val base = Files.createTempDirectory("serving-data")
    val oldDir = base.resolve("api_app_info_old")
    val newDir = base.resolve("api_app_info_new")
    Seq((1L, "old")).toDF("id", "tag").write.parquet(oldDir.toString)
    Seq((2L, "new"), (3L, "new")).toDF("id", "tag").write.parquet(newDir.toString)
    Files.setLastModifiedTime(oldDir,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(newDir,
      java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val df = ServingData.loadApiData(spark, base).get
    assert(df.count() == 2)
    assert(df.select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("new"))
    assert(df.storageLevel.useMemory, "serving frame must be cached")
    df.unpersist()
  }

  test("kafka source options bind subscribe/offsets/throughput shaping") {
    val opts = StreamIngest.kafkaSourceOptions("broker:9092", "app-events",
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(50000L))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "app-events")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("failOnDataLoss") == "false")
    val unshaped = StreamIngest.kafkaSourceOptions("b:9092", "t")
    assert(!unshaped.contains("maxOffsetsPerTrigger"))
    assert(unshaped("startingOffsets") == "latest")
  }

  test("kafka sink options carry topic and checkpoint") {
    val opts = StreamIngest.kafkaSinkOptions("broker:9092", "app-out", "/tmp/ck")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("topic") == "app-out")
    assert(opts("checkpointLocation") == "/tmp/ck")
  }
}

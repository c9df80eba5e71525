package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The manifest-committed retired-id set ([[operators.RetiredIds]]):
  * bounded segment fan-in via compaction-on-append, atomic swaps (no
  * torn window a resurrection could slip through — the fuzz suites
  * crash-inject that on both ANN lifecycles), duplicate collapse, and
  * adoption of the pre-manifest plain `retired/` layout. */
class RetiredIdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.{IndexManifest, RetiredIds}
  import spark.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-retired").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def idsDf(ids: Long*) = ids.toDF("vec_id")

  private def readSet(dir: String): Set[Long] =
    RetiredIds.read(spark, dir).map(
      _.select("vec_id").collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)

  private def liveSegs(dir: String): Seq[String] =
    IndexManifest.load(spark, dir)
      .map(_.segmentsOf(RetiredIds.Table)).getOrElse(Seq.empty)

  private def segsOnDisk(dir: String): Seq[String] = {
    val f = new java.io.File(s"$dir/segs")
    if (!f.exists) Seq.empty
    else f.listFiles().map(_.getName)
      .filter(_.startsWith("retired-")).toSeq.sorted
  }

  test("retire appends one committed segment per batch below the threshold; read is the union, count is DISTINCT") {
    val dir = tmpDir()
    assert(RetiredIds.read(spark, dir).isEmpty)
    assert(RetiredIds.count(spark, dir) == 0L)
    RetiredIds.retire(spark, dir, idsDf(1L, 2L))
    RetiredIds.retire(spark, dir, idsDf(3L))
    // a replayed crashed apply re-retires ids it already holds: the
    // set is unchanged, and count stays DISTINCT (dup rows are a
    // storage artifact, collapsed at the next compaction)
    RetiredIds.retire(spark, dir, idsDf(2L, 3L, 4L))
    assert(liveSegs(dir).size == 3)
    assert(readSet(dir) == Set(1L, 2L, 3L, 4L))
    assert(RetiredIds.count(spark, dir) == 4L)
  }

  test("compaction-on-append past the threshold: ONE live segment, superseded files physically reclaimed, the set preserved") {
    val dir = tmpDir()
    for (i <- 0 until 3)
      RetiredIds.retireImpl(spark, dir, idsDf(i.toLong, 100L), _ => (),
        compactThreshold = 3)
    assert(liveSegs(dir).size == 3)
    val filesBefore = segsOnDisk(dir).size
    // the 4th retire trips the threshold: everything merges into one
    // distinct segment in ONE atomic manifest swap
    RetiredIds.retireImpl(spark, dir, idsDf(3L, 100L), _ => (),
      compactThreshold = 3)
    assert(liveSegs(dir).size == 1,
      s"compaction must leave one segment: ${liveSegs(dir)}")
    assert(segsOnDisk(dir).size == 1 && segsOnDisk(dir).size < filesBefore,
      s"vacuum must reclaim the superseded segment dirs: ${segsOnDisk(dir)}")
    assert(readSet(dir) == Set(0L, 1L, 2L, 3L, 100L))
    assert(RetiredIds.count(spark, dir) == 5L)
    // and the compacted segment holds each id exactly once (the
    // thrice-retired 100L collapsed)
    assert(RetiredIds.read(spark, dir).get.count() == 5L,
      "dup rows must collapse at compaction")
  }

  test("a retire that crashes INSIDE the legacy migrate — renamed but uncommitted — never hides the set: read() resolves segs/retired-legacy and the replay completes the adoption") {
    val dir = tmpDir()
    idsDf(7L, 8L).repartition(1).write.parquet(s"$dir/retired")
    // the first retire over a legacy layout runs migrate first; crash
    // at the instant the rename landed but the manifest commit did not
    // — the torn state where a plain-dir-only fallback would return
    // None and the append guard would forget every retired id
    val boom = intercept[RuntimeException] {
      RetiredIds.retireImpl(spark, dir, idsDf(9L),
        p => if (p == "migrate:moved:retired") throw new RuntimeException("boom"))
    }
    assert(boom.getMessage == "boom")
    assert(!new java.io.File(s"$dir/retired").exists &&
      new java.io.File(s"$dir/segs/retired-legacy").exists,
      "the crash must land between the rename and the commit")
    assert(IndexManifest.load(spark, dir).isEmpty, "no manifest may exist yet")
    // the resurrection window: the guard reads THROUGH the torn state
    assert(readSet(dir) == Set(7L, 8L),
      "the torn migrate must not hide the retired set from readers")
    assert(RetiredIds.count(spark, dir) == 2L)
    // the replayed retire adopts the moved segment and completes
    RetiredIds.retire(spark, dir, idsDf(9L))
    assert(readSet(dir) == Set(7L, 8L, 9L))
    assert(liveSegs(dir).contains("retired-legacy"),
      s"the replay must ADOPT the already-moved segment: ${liveSegs(dir)}")
  }

  test("a pre-manifest plain retired/ dir is readable as-is and ADOPTED by the first retire") {
    val dir = tmpDir()
    // the round-16 layout: a plain parquet dir of ids
    idsDf(7L, 8L).repartition(1).write.parquet(s"$dir/retired")
    assert(readSet(dir) == Set(7L, 8L), "legacy fallback read failed")
    RetiredIds.retire(spark, dir, idsDf(9L))
    assert(!new java.io.File(s"$dir/retired").exists,
      "the legacy dir must be renamed into the segment store")
    assert(readSet(dir) == Set(7L, 8L, 9L))
    assert(liveSegs(dir).contains("retired-legacy"),
      s"migrate must adopt the legacy table: ${liveSegs(dir)}")
  }
}

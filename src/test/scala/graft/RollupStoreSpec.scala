package graft

import graft.operators.RollupStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted maintained-rollup lifecycle: build → append → delete on
  * disk (manifest segment commits), pinned bit-equal to the
  * declarative q245 twin and surviving an injected crash at every
  * commit point. */
class RollupStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-rollup").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def facts = Tables.events(spark, sf)

  private def forget = facts
    .filter(coalesce(col("user_id") % 37 === 0, lit(false)))
    .select("user_id").distinct()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("build + append + delete equals the declarative q245 twin and the recompute") {
    val dir = freshDir()
    RollupStore.build(spark,
      facts.filter(pmod(col("event_id"), lit(2)) === 0), dir)
    RollupStore.append(spark,
      facts.filter(pmod(col("event_id"), lit(2)) === 1), dir)
    RollupStore.delete(spark, facts, forget, dir)
    val store = rows(RollupStore.query(spark, dir))
    val twin = rows(SparkEntry.queries("q245_rollup_lifecycle")(spark, sf))
    assert(store == twin, "persisted lifecycle != declarative twin")
    // and the twin is the recompute (oracle-checked too; belt-and-braces)
    val recompute = rows(RollupStore.query(spark, {
      val d2 = freshDir()
      RollupStore.build(spark, facts.join(broadcast(forget),
        Seq("user_id"), "left_anti"), d2)
      d2
    }))
    assert(store == recompute, "lifecycle != from-scratch recompute")
    assert(store.nonEmpty, "law must not be vacuous")
  }

  test("append merges partial state; a group deleted to n=0 leaves the store") {
    import spark.implicits._
    val dir = freshDir()
    val mk = (id: Long, u: Long, t: String, day: String, v: Double) =>
      (id, java.sql.Timestamp.valueOf(s"$day 10:00:00"), u, t, v, "{}")
    val base = Seq(
      mk(1L, 1L, "click", "2026-04-01", 5.0),
      mk(2L, 2L, "click", "2026-04-01", 9.0),
      mk(3L, 1L, "view", "2026-04-02", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = Seq(mk(4L, 2L, "click", "2026-04-01", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    RollupStore.build(spark, base, dir)
    RollupStore.append(spark, batch, dir)
    val merged = rows(RollupStore.query(spark, dir))
    // click day1: n=3 sum=16 min=2 max=9; view day2: n=1
    assert(merged.map(r => (r(1), r(2), r(3), r(4), r(5))) == Seq(
      ("click", 3L, 16.0, 2.0, 9.0), ("view", 1L, 1.0, 1.0, 1.0)),
      s"merged wrong: $merged")
    // forget user 1: click day1 loses the 5.0 row (min repairs to 2),
    // view day2 loses its only row -> group gone
    RollupStore.delete(spark, base.union(batch),
      Seq(1L).toDF("user_id"), dir)
    val after = rows(RollupStore.query(spark, dir))
    assert(after.map(r => (r(1), r(2), r(3), r(4), r(5))) == Seq(
      ("click", 2L, 11.0, 2.0, 9.0)), s"after delete wrong: $after")
  }

  test("a crash at every swap point recovers to a complete, correct store") {
    for (crashAt <- Seq("written", "swapped", "vacuumed")) {
      val dir = freshDir()
      RollupStore.build(spark,
        facts.filter(pmod(col("event_id"), lit(2)) === 0), dir)
      intercept[RuntimeException] {
        RollupStore.appendImpl(spark,
          facts.filter(pmod(col("event_id"), lit(2)) === 1), dir,
          p => if (p == crashAt) throw new RuntimeException(s"boom:$p"))
      }
      // the manifest law: the store is COMPLETE and queryable AT the
      // crash instant (pre-append at "written", post-append after the
      // commit) — no repair needed to read
      assert(RollupStore.query(spark, dir).count() > 0,
        s"store unreadable AT crash state $crashAt")
      RollupStore.recover(spark, dir)
      val n = RollupStore.query(spark, dir).count()
      assert(n > 0, s"store empty after recover($crashAt)")
      // idempotent completion: recompute what the final state must be
      if (crashAt == "written") {
        // nothing published — rerun the append
        RollupStore.append(spark,
          facts.filter(pmod(col("event_id"), lit(2)) === 1), dir)
      }
      val expected = rows(RollupStore.query(spark, {
        val d2 = freshDir()
        RollupStore.build(spark, facts, d2)
        d2
      }))
      assert(rows(RollupStore.query(spark, dir)) == expected,
        s"crash at $crashAt: store diverged after recover")
    }
  }

  test("op-id markers make append and delete exactly-once under blind replay") {
    val dir = freshDir()
    val even = facts.filter(pmod(col("event_id"), lit(2)) === 0)
    val odd = facts.filter(pmod(col("event_id"), lit(2)) === 1)
    RollupStore.buildAtomic(spark, even, dir, Some(0L))
    assert(RollupStore.appliedOp(spark, dir).contains(0L))
    assert(RollupStore.append(spark, odd, dir, Some(1L)), "fresh id applies")
    val after = rows(RollupStore.query(spark, dir))
    // blind replays: same id, and a stale id, must change nothing
    assert(!RollupStore.append(spark, odd, dir, Some(1L)), "replay skipped")
    assert(!RollupStore.append(spark, odd, dir, Some(0L)), "stale skipped")
    assert(rows(RollupStore.query(spark, dir)) == after, "replay mutated")
    assert(RollupStore.delete(spark, facts, forget, dir, Some(2L)))
    val deleted = rows(RollupStore.query(spark, dir))
    assert(!RollupStore.delete(spark, facts, forget, dir, Some(2L)),
      "delete replay skipped — retraction would double-subtract")
    assert(rows(RollupStore.query(spark, dir)) == deleted)
    assert(RollupStore.appliedOp(spark, dir).contains(2L))
  }

  test("delete crash + recover + blind op-id replay lands on exactly-once state") {
    // the dangerous half: a REPLAYED delete double-subtracts unless the
    // marker blocks it — and the marker must travel with the commit
    for (crashAt <- Seq("written", "swapped", "vacuumed")) {
      val dir = freshDir()
      RollupStore.buildAtomic(spark, facts, dir, Some(0L))
      intercept[RuntimeException] {
        RollupStore.deleteImpl(spark, facts, forget, dir,
          p => if (p == crashAt) throw new RuntimeException(s"boom:$p"),
          Some(1L))
      }
      RollupStore.recover(spark, dir)
      // blind replay with the SAME op id: if the crash happened before
      // the manifest commit the delete never landed (marker still 0)
      // and the replay must APPLY; after it, the marker is 1 and the
      // replay must SKIP — either way the final state is one delete
      RollupStore.delete(spark, facts, forget, dir, Some(1L))
      val expected = rows(RollupStore.query(spark, {
        val d2 = freshDir()
        RollupStore.build(spark,
          facts.join(broadcast(forget), Seq("user_id"), "left_anti"), d2)
        d2
      }))
      assert(rows(RollupStore.query(spark, dir)) == expected,
        s"crash at $crashAt: delete not exactly-once after recover+replay")
      assert(RollupStore.appliedOp(spark, dir).contains(1L))
    }
  }

  test("queryAt: the retained pre-append state stays queryable; a full-vacuum delete retires it to None") {
    import graft.operators.IndexManifest
    val dir = freshDir()
    val even = facts.filter(pmod(col("event_id"), lit(2)) === 0)
    val odd = facts.filter(pmod(col("event_id"), lit(2)) === 1)
    RollupStore.buildAtomic(spark, even, dir, Some(0L))
    val v0 = IndexManifest.load(spark, dir).get.version
    val before = rows(RollupStore.query(spark, dir))
    RollupStore.append(spark, odd, dir, Some(1L))
    assert(rows(RollupStore.query(spark, dir)) != before,
      "fixture: the append must change the rollup")
    // the canary-diff read: yesterday's dashboard state without recompute
    val at = RollupStore.queryAt(spark, dir, v0)
      .getOrElse(fail("retained pre-append version must be queryable"))
    assert(rows(at) == before, "time-travel query diverged")
    // a GDPR delete vacuums FULLY — the old state must be GONE, loudly
    RollupStore.delete(spark, facts, forget, dir, Some(2L))
    assert(RollupStore.queryAt(spark, dir, v0).isEmpty,
      "a fully vacuumed version must resolve None")
  }

  test("a replayed GDPR delete finishes the physical reclamation (the marker skip still vacuums)") {
    import graft.operators.IndexManifest
    val dir = freshDir()
    RollupStore.buildAtomic(spark, facts, dir, Some(0L))
    // crash AFTER the commit, BEFORE the vacuum: the delete landed
    // logically, but the superseded rollup segment — still carrying
    // the forgotten users' aggregates — survives on disk
    intercept[RuntimeException] {
      RollupStore.deleteImpl(spark, facts, forget, dir,
        p => if (p == "swapped") throw new RuntimeException("boom"),
        Some(1L))
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def segDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/segs"))
      .map(_.getPath.getName).toSet
    val live = IndexManifest.load(spark, dir).get.tables("rollup").toSet
    assert(segDirs().size > live.size,
      "expected the superseded pre-delete segment on disk at the crash state")
    // blind replay with the SAME op id: must SKIP the retraction (a
    // second subtraction would corrupt the store) but must still
    // guarantee the forgotten bytes leave the disk — without the
    // skip-path vacuum, physical removal would wait for an unrelated
    // later mutation
    val before = rows(RollupStore.query(spark, dir))
    assert(!RollupStore.delete(spark, facts, forget, dir, Some(1L)),
      "replay must skip the retraction")
    assert(rows(RollupStore.query(spark, dir)) == before,
      "replay mutated the store")
    assert(segDirs() == live,
      "replayed delete left the forgotten users' superseded segment on disk")
  }

  test("streaming maintenance: first batch builds, later batches merge, final store equals one-shot build") {
    import spark.implicits._
    import graft.streaming.RollupMaintenance
    import graft.streaming.RollupMaintenance.FactEvt
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val ckpt = freshDir()
    val wire = facts
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[FactEvt].collect().sortBy(_.event_id)
    val (a, b) = wire.splitAt(wire.length / 2)
    val mem = MemoryStream[FactEvt]
    val q = RollupMaintenance.start(mem.toDS(), dir, ckpt)
    try {
      mem.addData(a.toSeq: _*); q.processAllAvailable()
      mem.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = rows(RollupStore.query(spark, dir))
    val oneShot = rows(RollupStore.query(spark, {
      val d2 = freshDir(); RollupStore.build(spark, facts, d2); d2
    }))
    assert(streamed == oneShot, "streamed store != one-shot build")
    // the restart-replay contract: re-applying the LAST batch id (what
    // Structured Streaming does after an uncommitted-batch restart) is
    // a no-op because its marker already swapped in with the table
    val lastId = RollupStore.appliedOp(spark, dir).get
    assert(!graft.streaming.RollupMaintenance.applyBatch(spark,
      b.toSeq.toDS(), dir, lastId), "batch replay must be skipped")
    assert(rows(RollupStore.query(spark, dir)) == streamed)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the relational inventory over sf0.001 (oracle
  * value-equality is covered by the DuckDB gate; these assert semantic
  * invariants that hold at any scale). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001
  def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a registry entry with unique name") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("topk returns at most k rows, sorted descending") {
    val rows = run("q03_topk_orders").collect()
    assert(rows.length <= 20)
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("filter rows all satisfy the predicate") {
    val bad = run("q02_scan_filter_project")
      .filter(!(col("l_quantity") >= 45 && col("l_discount") > 0.05)).count()
    assert(bad == 0)
  }

  test("semi and anti joins partition the left table") {
    val semi = run("q07_join_semi").count()
    val anti = run("q08_join_anti").count()
    val total = Tables.customer(spark, sf).count()
    assert(semi + anti == total)
  }

  test("union all count equals the sum of branch counts") {
    val o = Tables.orders(spark, sf)
    val f = o.filter(col("o_orderstatus") === "F").count()
    val op = o.filter(col("o_orderstatus") === "O").count()
    assert(run("q15_union_all").count() == f + op)
  }

  test("intersect plus except partition distinct custkeys") {
    val inter = run("q16_intersect").count()
    val exc = run("q17_except").count()
    val distinctCust = Tables.customer(spark, sf)
      .select("c_custkey").distinct().count()
    assert(inter + exc == distinctCust)
  }

  test("group count sums to the table size") {
    val total = run("q09_group_count").agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("window rank emits at most 3 rows per customer, rank-ordered") {
    val over3 = run("q23_window_rank")
      .groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over3 == 0)
  }

  test("scan pushes filters and prunes columns") {
    val plan = run("q02_scan_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"))
    // pruned read schema: only the 4 selected columns are read
    assert(plan.contains("ReadSchema") &&
      !plan.contains("l_shipdate"), "projection should prune unused columns")
  }

  test("multiway star join broadcasts the dimension tables") {
    val plan = run("q06_join_multiway_agg").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q192 lateness respects the jitter bound and covers every event") {
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q192_lateness_audit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum == n, "lateness buckets must tile the stream")
    // theorem of the ±60 s jitter: if p arrived before e but carries a
    // later event time, ts_p − ts_e < jit_e − jit_p ≤ 120 s strictly
    assert(rows.forall(_._3 < 120000000L),
      s"lateness exceeds the 120 s jitter bound: ${rows.toSeq}")
    // the simulation must actually disorder the wire (a degenerate
    // all-on-time profile would make the audit vacuous)
    assert(rows.exists(r => r._1 > 0 && r._2 > 0), "no late events simulated")
    // and most events still arrive on time (jitter ≪ event spacing ×
    // stream length): the on-time bucket holds the majority
    val onTime = rows.find(_._1 == 0).map(_._2).getOrElse(0L)
    assert(onTime * 2 > n, s"on-time $onTime of $n")
  }

  test("q189 merge handles one-sided group keys via the coalesce path") {
    import spark.implicits._
    // real testdata has both parities in every group; this fixture pins
    // the empty-state side of the merge (a key seen only in the delta)
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val events = Seq(
      (2L, ts, 1L, "only_even", 5.0, ""),
      (3L, ts, 1L, "only_odd", 7.0, ""),
      (4L, ts, 1L, "both", 1.5, ""),
      (5L, ts, 1L, "both", 2.5, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = TestSpark.makeSfDir("events" -> events)
    val rows = SparkEntry.queries("q189_rollup_merge")(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.toSet == Set(
      ("only_even", 1L, 5.0, 5.0, 5.0),
      ("only_odd", 1L, 7.0, 7.0, 7.0),
      ("both", 2L, 4.0, 1.5, 2.5)), s"got ${rows.toSeq}")
  }

  test("q200 burst crosses the minute boundary exactly (neighbor-bucket path)") {
    import spark.implicits._
    // user 1 fires 12 events one second apart from 10:00:55 to
    // 10:01:06 — the run STRADDLES the minute boundary, so the last
    // seven events must count predecessors through the neighbor-bucket
    // list, not the within-bucket window; burst at the i-th event is
    // exactly i (span 11 s << 60 s). user 2's events sit 2 min apart.
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:54")
    val ev = (1 to 12).map { i =>
      (i.toLong, new java.sql.Timestamp(t0.getTime + i * 1000L),
        1L, "e", 1.0, "")
    } ++ Seq(
      (20L, java.sql.Timestamp.valueOf("2024-01-05 11:00:00"), 2L, "e", 1.0, ""),
      (21L, java.sql.Timestamp.valueOf("2024-01-05 11:02:00"), 2L, "e", 1.0, ""))
    val dir = TestSpark.makeSfDir("events" ->
      ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = SparkEntry.queries("q200_burst_audit")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // bursts 1..12 -> max 12, hot (>=10) at events 10,11,12 -> 3
    assert(rows(1L) == ((12L, 12L, 3L)), s"user 1: ${rows(1L)}")
    // 2 minutes apart: no window holds both
    assert(rows(2L) == ((2L, 1L, 0L)), s"user 2: ${rows(2L)}")
  }

  test("q226 strict funnel re-anchors each stage; pre-anchor events neither convert nor block") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // user 1: click BEFORE signup (must not block or convert), signup,
    // purchase between signup and the qualifying click (must not
    // convert), click, purchase -> full conversion, gaps 10 s and 10 s.
    // user 2: click+purchase but no signup -> nothing. user 3: signup
    // only. A q65-style global-min funnel would false-negative user 1
    // (first click < first signup).
    val events = Seq(
      (1L, t(0), 1L, "click", 0.0, ""),
      (2L, t(5), 1L, "signup", 0.0, ""),
      (3L, t(10), 1L, "purchase", 0.0, ""),
      (4L, t(15), 1L, "click", 0.0, ""),
      (5L, t(25), 1L, "purchase", 0.0, ""),
      (6L, t(2), 2L, "click", 0.0, ""),
      (7L, t(3), 2L, "purchase", 0.0, ""),
      (8L, t(4), 3L, "signup", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = TestSpark.makeSfDir("events" -> events)
    val r = SparkEntry.queries("q226_event_funnel")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 1L, 1L)), s"counts wrong: $r")
    assert(r.getLong(4) == 10000000L && r.getLong(5) == 10000000L,
      s"gap sums wrong: $r")
    assert((r.getDouble(6), r.getDouble(7), r.getDouble(8)) ==
      ((2.0 / 3, 0.5, 1.0)), s"conversions wrong: $r")
  }

  test("q227 co-occurrence counts sessions (not events) and lift is the exact cross-ratio") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // user 1 session A: click, click, view (pair once per SESSION even
    // with repeated clicks); >30 min later session B: click only.
    // user 2 session C: view, error. Sessions N=3: n(click)=2,
    // n(view)=2, n(error)=1; pairs: (click,view) 1, (error,view) 1.
    val events = Seq(
      (1L, t(0), 1L, "click", 0.0, ""),
      (2L, t(10), 1L, "click", 0.0, ""),
      (3L, t(20), 1L, "view", 0.0, ""),
      (4L, t(4000), 1L, "click", 0.0, ""),
      (5L, t(0), 2L, "view", 0.0, ""),
      (6L, t(5), 2L, "error", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = TestSpark.makeSfDir("events" -> events)
    val rows = SparkEntry.queries("q227_session_cooccurrence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(rows.keySet == Set(("click", "view"), ("error", "view")),
      s"pair set wrong: $rows")
    assert(rows(("click", "view")) == ((1L, 2L, 2L, 3L, 1.0 / 3, 3.0 / 4)),
      s"click-view wrong: ${rows(("click", "view"))}")
    assert(rows(("error", "view")) == ((1L, 1L, 2L, 3L, 1.0 / 3, 3.0 / 2)),
      s"error-view wrong: ${rows(("error", "view"))}")
  }

  test("q234 CUSUM alarms on a planted volume shift, stays silent on flat traffic, zero-fills gap days") {
    import spark.implicits._
    def ts(day: Int, k: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + k * 1000L)
    // spike: 1/day for days 0-9 then 20/day for days 10-14;
    // flat: exactly 2/day (dev == 0 every day); gappy: bursts at the
    // edges with 13 EMPTY days between (missing days must be zeros)
    var id = 0L
    def mk(t: String, day: Int, n: Int) = (0 until n).map { k =>
      id += 1; (id, ts(day, k), (t.hashCode.abs % 1000).toLong, t, 0.0, "")
    }
    val events = (
      (0 until 10).flatMap(d => mk("spike", d, 1)) ++
      (10 until 15).flatMap(d => mk("spike", d, 20)) ++
      (0 until 15).flatMap(d => mk("flat", d, 2)) ++
      mk("gappy", 0, 3) ++ mk("gappy", 14, 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = TestSpark.makeSfDir("events" -> events)
    val rows = SparkEntry.queries("q234_cusum_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // independent plain-Scala replay of the recurrence
    def replay(cs: Seq[Long]): (Long, Long, Long, Long, Long) = {
      val d = cs.length.toLong; val t = cs.sum
      var s = 0L; var mx = 0L; var nal = 0L; var first = -1L
      cs.zipWithIndex.foreach { case (c, i) =>
        s = math.max(0L, s + (c * d - t)); mx = math.max(mx, s)
        if (t > 0 && s >= 2 * t) { nal += 1; if (first == -1) first = i }
      }
      (d, t, mx, nal, first)
    }
    val spike = Seq.fill(10)(1L) ++ Seq.fill(5)(20L)
    val gappy = 3L +: Seq.fill(13)(0L) :+ 3L
    assert(rows("spike") == replay(spike), s"spike: ${rows("spike")} vs ${replay(spike)}")
    assert(rows("flat") == ((15L, 30L, 0L, 0L, -1L)), s"flat: ${rows("flat")}")
    assert(rows("gappy") == replay(gappy), s"gappy: ${rows("gappy")} vs ${replay(gappy)}")
    assert(rows("spike")._4 > 0 && rows("spike")._5 >= 10,
      "the planted shift must alarm, at or after the shift day")
  }
}

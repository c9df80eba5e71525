package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Stateful streaming sessionization (flatMapGroupsWithState) against
  * its batch twin's semantics. */
class StreamingSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap-closed and timeout-closed sessions emit with correct bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val sessions = Sessionize.sessionize(mem.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      // user 1: two bursts 2h apart (gap-closed); user 2: one burst
      mem.addData(
        Evt(1L, ts("2026-01-01 09:00:00"), "click"),
        Evt(1L, ts("2026-01-01 09:10:00"), "view"),
        Evt(2L, ts("2026-01-01 09:05:00"), "click"))
      q.processAllAvailable()
      mem.addData(
        Evt(1L, ts("2026-01-01 11:00:00"), "purchase"),
        Evt(1L, ts("2026-01-01 11:05:00"), "view"))
      q.processAllAvailable()
      // push the watermark far ahead so open sessions time out
      mem.addData(Evt(99L, ts("2026-01-01 23:00:00"), "click"))
      q.processAllAvailable()
      mem.addData(Evt(98L, ts("2026-01-02 23:00:00"), "click"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getInt(3))).toSet
    assert(rows.contains((1L, "2026-01-01 09:00:00.0", "2026-01-01 09:10:00.0", 2)),
      s"first session of user 1; got $rows")
    assert(rows.contains((1L, "2026-01-01 11:00:00.0", "2026-01-01 11:05:00.0", 2)),
      "second session of user 1 (timeout-closed)")
    assert(rows.contains((2L, "2026-01-01 09:05:00.0", "2026-01-01 09:05:00.0", 1)))
  }

  test("approx distinct stays within 5% of exact") {
    val r = SparkEntry.queries("q54_approx_distinct")(spark, TestSpark.sf0001)
      .collect()(0)
    val (approxP, exactP) = (r.getLong(0), r.getLong(1))
    val (approxO, exactO) = (r.getLong(2), r.getLong(3))
    assert(math.abs(approxP - exactP).toDouble / exactP < 0.05,
      s"parts: approx=$approxP exact=$exactP")
    assert(math.abs(approxO - exactO).toDouble / exactO < 0.05,
      s"orders: approx=$approxO exact=$exactO")
  }

  test("streaming sessionize matches the batch twin q27 on the same input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic event set: 3 users, known gaps
    val evts = Seq(
      Evt(1L, ts("2026-02-01 08:00:00"), "a"),
      Evt(1L, ts("2026-02-01 08:20:00"), "b"),
      Evt(1L, ts("2026-02-01 10:00:00"), "c"),
      Evt(3L, ts("2026-02-01 09:00:00"), "d"))
    val mem = MemoryStream[Evt]
    val q = Sessionize.sessionize(mem.toDS(), 1800)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_batch_twin").start()
    try {
      mem.addData(evts: _*)
      q.processAllAvailable()
      mem.addData(Evt(99L, ts("2026-02-02 00:00:00"), "z"))
      q.processAllAvailable()
      mem.addData(Evt(98L, ts("2026-02-03 00:00:00"), "z"))
      q.processAllAvailable()
    } finally q.stop()
    val streaming = spark.table("sess_batch_twin")
      .filter($"user_id".isin(1L, 3L))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getInt(3)))
      .toSet
    assert(streaming == Set(
      (1L, ts("2026-02-01 08:00:00"), ts("2026-02-01 08:20:00"), 2),
      (1L, ts("2026-02-01 10:00:00"), ts("2026-02-01 10:00:00"), 1),
      (3L, ts("2026-02-01 09:00:00"), ts("2026-02-01 09:00:00"), 1)))
  }

  test("streaming burst counts equal the batch q200 window on the driver wire") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // the real driver wire, in event-time order (unique (user, ts) —
    // verified in the fixture data), replayed through the stateful
    // stream; the reference is the NAIVE per-event batch window (the
    // q200 oracle form)
    val sf = TestSpark.sf0001
    val wire = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"))
      .orderBy(col("ts"), col("user_id"))
      .collect().map(r => Evt(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tus").rangeBetween(-60000000L, 0L)
    val batch = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("burst", count(lit(1)).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val mem = MemoryStream[Evt]
    val q = Sessionize.burstCounts(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("burst_stream").start()
    try {
      wire.grouped(200).foreach { g => mem.addData(g.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table("burst_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size,
      s"row counts differ: ${streamed.size} vs ${batch.size}")
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"event $k: streamed $v != batch ${batch(k)}") }
    // and the per-user rollup equals the q200 registry audit
    val agg = streamed.toSeq.groupBy(_._1._1).map { case (u, rs) =>
      u -> ((rs.size.toLong, rs.map(_._2).max, rs.count(_._2 >= 10).toLong)) }
    val q200 = SparkEntry.queries("q200_burst_audit")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(agg == q200, "streamed rollup diverges from the batch audit")
  }

  test("quality-drift monitor: baseline forms, spike alerts, clean source stays quiet") {
    import spark.implicits._
    import graft.streaming.QualityMonitor
    import graft.streaming.QualityMonitor.DocEvt
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvt]
    val out = QualityMonitor.qualityDrift(mem.toDS(), windowSeconds = 60)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qdrift_out").start()
    def d(src: String, t: String, n: Long) = DocEvt(src, ts(t), n)
    try {
      // window 1 (09:00): web 4 docs 1 poor (250000 ppm); clean 2 good
      mem.addData(
        d("web", "2026-01-01 09:00:01", 100),
        d("web", "2026-01-01 09:00:10", 100),
        d("web", "2026-01-01 09:00:20", 5),
        d("web", "2026-01-01 09:00:30", 100),
        d("clean", "2026-01-01 09:00:05", 100),
        d("clean", "2026-01-01 09:00:06", 100))
      q.processAllAvailable()
      // window 2 (09:01): web spikes to 3/4 poor; clean stays good
      mem.addData(
        d("web", "2026-01-01 09:01:01", 5),
        d("web", "2026-01-01 09:01:10", 5),
        d("web", "2026-01-01 09:01:20", 5),
        d("web", "2026-01-01 09:01:30", 100),
        d("clean", "2026-01-01 09:01:05", 100),
        d("clean", "2026-01-01 09:01:06", 100))
      q.processAllAvailable()
      // watermark pusher flushes the open second windows
      mem.addData(d("zz", "2026-01-01 10:00:00", 100))
      q.processAllAvailable()
      mem.addData(d("zz2", "2026-01-01 11:00:00", 100))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("qdrift_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    // first web window: no baseline yet -> base = own rate, no alert
    assert(rows(("web", "2026-01-01 09:00:00.0")) ==
      ((4L, 1L, 250000L, 250000L, false)), s"got $rows")
    // spike window: 750000 ppm vs baseline 250000 -> alert
    assert(rows(("web", "2026-01-01 09:01:00.0")) ==
      ((4L, 3L, 750000L, 250000L, true)), s"got $rows")
    // clean source: 0 ppm both windows, never alerts
    assert(rows(("clean", "2026-01-01 09:00:00.0")) ==
      ((2L, 0L, 0L, 0L, false)))
    assert(rows(("clean", "2026-01-01 09:01:00.0")) ==
      ((2L, 0L, 0L, 0L, false)))
  }

  test("streaming funnel converts once at the purchase moment; count law vs batch q226 at sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    // the q226 fixture wire: pre-anchor click ignored, purchase before
    // the qualifying click ignored, conversion at t(25); a post-
    // conversion replay of more purchases must NOT re-fire (tombstone)
    def t(sec: Int) = new Timestamp(1704067200000L + sec * 1000L)
    val mem = MemoryStream[Funnel.Evt]
    val q = Funnel.conversions(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("conv_out").start()
    try {
      mem.addData(
        Funnel.Evt(1L, t(0), "click"), Funnel.Evt(1L, t(5), "signup"),
        Funnel.Evt(1L, t(10), "purchase"),
        Funnel.Evt(2L, t(2), "click"), Funnel.Evt(2L, t(3), "purchase"),
        Funnel.Evt(3L, t(4), "signup"))
      q.processAllAvailable()
      assert(spark.table("conv_out").count() == 0, "nobody converted yet")
      mem.addData(Funnel.Evt(1L, t(15), "click"),
        Funnel.Evt(1L, t(25), "purchase"))
      q.processAllAvailable()
      mem.addData(Funnel.Evt(1L, t(30), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("conv_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L,
      1704067205000000L, 1704067215000000L, 1704067225000000L)),
      s"conversions wrong: ${got.toSeq}")

    // cross-law: event-time-ordered replay of the sf0.001 events table
    // converts exactly q226's n_purchase_after users
    val sf = TestSpark.sf0001
    val evs = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_type"))
      .as[Funnel.Evt].collect().sortBy(_.ts.getTime)
    val mem2 = MemoryStream[Funnel.Evt]
    val q2 = Funnel.conversions(mem2.toDS()).writeStream
      .outputMode("append").format("memory").queryName("conv_sf").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      mem2.addData(a.toSeq: _*); q2.processAllAvailable()
      mem2.addData(b.toSeq: _*); q2.processAllAvailable()
    } finally q2.stop()
    val expected = SparkEntry.queries("q226_event_funnel")(spark, sf)
      .collect()(0).getLong(3)
    val streamed = spark.table("conv_sf").count()
    assert(streamed == expected,
      s"streamed conversions $streamed != batch n_purchase_after $expected")
    assert(expected > 0, "law must not be vacuous")
  }

  test("bot monitor alerts once at the crossing point, never re-fires, and skips diverse users") {
    import spark.implicits._
    import graft.streaming.BotMonitor
    import graft.streaming.BotMonitor.UserEvt
    implicit val sqlCtx = spark.sqlContext
    def at(i: Int) = ts(f"2026-03-01 10:00:${i % 60}%02d")
    // user 1: pure single-type bot — crosses at exactly MinEvents (20
    // events, HHI = 1.0 -> 1000000 ppm). user 2: 24 events over 4 types
    // evenly (HHI = 0.25 -> 250000 ppm, under the 600000 cut). user 3:
    // 19 events single-type — under MinEvents, must stay silent.
    val bot = (0 until 20).map(i => UserEvt(1L, at(i), "click"))
    val human = (0 until 24).map(i => UserEvt(2L, at(i), s"t${i % 4}"))
    val quiet = (0 until 19).map(i => UserEvt(3L, at(i), "click"))
    val mem = MemoryStream[UserEvt]
    val q = BotMonitor.botAlerts(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("bot_out").start()
    try {
      val all = bot ++ human ++ quiet
      mem.addData(all: _*); q.processAllAvailable()
      // replay + post-alert traffic: the tombstone must hold
      mem.addData((20 until 40).map(i => UserEvt(1L, at(i), "click")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bot_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 20L, 1L, 1000000L)),
      s"alerts wrong: ${got.toSeq}")

    // cross-law vs the batch battery: the alert's HHI formula is q241's
    // (ssq*1e6/n^2 over the same 20-event prefix)
    val hhi = SparkEntry.queries("q241_user_type_hhi")(spark,
      TestSpark.makeSfDir("events" -> bot.toDF()
        .select($"user_id", $"ts", $"event_type")
        .withColumn("event_id",
          org.apache.spark.sql.functions.monotonically_increasing_id())
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))))
      .collect()(0)
    assert(hhi.getDouble(3) == 1.0 && hhi.getLong(1) == 20L,
      s"batch twin disagrees: $hhi")
  }

  test("cadence monitor flags a metronome once; jittered humans stay silent") {
    import spark.implicits._
    import graft.streaming.BotMonitor
    import graft.streaming.BotMonitor.UserEvt
    implicit val sqlCtx = spark.sqlContext
    // bot: exactly 1.000000 s between events; human: gaps drift by
    // seconds (i² spread); short: metronome but only 9 gaps
    val bot = (0 until 11).map(i =>
      UserEvt(1L, new java.sql.Timestamp(1767225600000L + i * 1000L), "c"))
    val human = (0 until 12).map(i =>
      UserEvt(2L, new java.sql.Timestamp(1767225600000L + i * 1000L +
        i.toLong * i * 137L), "c"))
    val short = (0 until 10).map(i =>
      UserEvt(3L, new java.sql.Timestamp(1767225600000L + i * 1000L), "c"))
    val mem = MemoryStream[UserEvt]
    val q = BotMonitor.cadenceAlerts(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("cad_out").start()
    try {
      mem.addData((bot ++ human ++ short): _*); q.processAllAvailable()
      // post-alert traffic: tombstone holds
      mem.addData((11 until 20).map(i =>
        UserEvt(1L, new java.sql.Timestamp(1767225600000L + i * 1000L),
          "c")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cad_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 10L, 1000000L, 1000000L)),
      s"cadence alerts wrong: ${got.toSeq}")
  }

  test("bot monitor TTL: idle state (and its tombstone) expires; a returning user is scored fresh") {
    import spark.implicits._
    import graft.streaming.BotMonitor
    import graft.streaming.BotMonitor.UserEvt
    implicit val sqlCtx = spark.sqlContext
    def at(h: Int, i: Int) = ts(f"2026-03-02 $h%02d:00:${i % 60}%02d")
    val mem = MemoryStream[UserEvt]
    // 1 h TTL: user 1's timeout arms at last-event + 1 h
    val q = BotMonitor.botAlerts(mem.toDS(), idleTtlSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory")
      .queryName("bot_ttl_out").start()
    try {
      // bot burst at 10:00 → first alert at the 20th event
      mem.addData((0 until 20).map(i => UserEvt(1L, at(10, i), "click")): _*)
      q.processAllAvailable()
      // watermark pushers to 13:00 (wm = 12:00 > 11:00:19 timeout):
      // user 1's state — including the alert tombstone — must drop
      mem.addData(UserEvt(99L, at(13, 0), "view")); q.processAllAvailable()
      mem.addData(UserEvt(99L, at(13, 1), "view")); q.processAllAvailable()
      // the SAME user returns with a fresh bot burst after the horizon:
      // fresh state → a second alert (NoTimeout semantics would have
      // kept the tombstone forever — the existing once-only test)
      mem.addData((0 until 20).map(i =>
        UserEvt(1L, ts(f"2026-03-02 13:30:${i % 60}%02d"), "click")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bot_ttl_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 == 1L)
    assert(got.toSeq == Seq((1L, 20L, 1L, 1000000L),
      (1L, 20L, 1L, 1000000L)),
      s"expected two fresh-horizon alerts, got: ${got.toSeq}")
  }

  test("funnel TTL: abandoned journeys and conversion tombstones expire; a returning user re-arms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    val mem = MemoryStream[Funnel.Evt]
    val q = Funnel.conversions(mem.toDS(), idleTtlSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_ttl_out").start()
    def us(s: String) = ts(s).getTime * 1000L
    try {
      // user 1 converts at 10:10; user 2 abandons after signup
      mem.addData(
        Funnel.Evt(1L, ts("2026-03-03 10:00:00"), "signup"),
        Funnel.Evt(1L, ts("2026-03-03 10:05:00"), "click"),
        Funnel.Evt(1L, ts("2026-03-03 10:10:00"), "purchase"),
        Funnel.Evt(2L, ts("2026-03-03 10:00:00"), "signup"))
      q.processAllAvailable()
      // advance the watermark past both users' TTL horizons
      mem.addData(Funnel.Evt(99L, ts("2026-03-03 13:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(Funnel.Evt(99L, ts("2026-03-03 13:00:01"), "view"))
      q.processAllAvailable()
      // user 2's signup anchor expired: click+purchase alone must NOT
      // convert; user 1's tombstone expired: a full new journey
      // converts AGAIN (the re-armable-funnel law)
      mem.addData(
        Funnel.Evt(2L, ts("2026-03-03 13:31:00"), "click"),
        Funnel.Evt(2L, ts("2026-03-03 13:32:00"), "purchase"),
        Funnel.Evt(1L, ts("2026-03-03 13:30:00"), "signup"),
        Funnel.Evt(1L, ts("2026-03-03 13:35:00"), "click"),
        Funnel.Evt(1L, ts("2026-03-03 13:40:00"), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_ttl_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq.sorted == Seq(
      (1L, us("2026-03-03 10:00:00"), us("2026-03-03 10:05:00"),
        us("2026-03-03 10:10:00")),
      (1L, us("2026-03-03 13:30:00"), us("2026-03-03 13:35:00"),
        us("2026-03-03 13:40:00"))).sorted,
      s"conversions wrong: ${got.toSeq}")
  }

  test("q259-sized TTL: bot alerts on the sf0.001 wire equal the unbounded-state run (the q192 closure pattern)") {
    import spark.implicits._
    import graft.streaming.BotMonitor
    import graft.streaming.BotMonitor.UserEvt
    implicit val sqlCtx = spark.sqlContext
    // size the TTL FROM THE DATA: the smallest q259 grid candidate that
    // evicts no multi-event user mid-history (and the runtime is even
    // safer — eviction needs watermark past lastEvt+TTL, ~2x the gap)
    val curve = SparkEntry.queries("q259_ttl_eviction_risk")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val ttl = curve.collectFirst { case (t, 0L) => t }
      .getOrElse(fail(s"no zero-eviction TTL on the grid: ${curve.toSeq}"))
    // the real event wire, event-time ordered, plus ONE planted bot so
    // the law cannot pass vacuously (natural traffic is too diverse to
    // cross the HHI cut)
    val real = Tables.events(spark, TestSpark.sf0001)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id", "ts", "event_type")
      .collect()
      .map(r => UserEvt(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val t0 = real.map(_.ts.getTime).min
    val planted = (0 until 25).map(i =>
      UserEvt(999999L, new java.sql.Timestamp(t0 + i * 1000L), "click"))
    val wire = (real ++ planted).sortBy(e => (e.ts.getTime, e.user_id))
    def run(ttlOpt: Option[Long], name: String): Set[(Long, Long, Long, Long)] = {
      val mem = MemoryStream[UserEvt]
      val q = BotMonitor.botAlerts(mem.toDS(), ttlOpt).writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try {
        wire.grouped(wire.length / 4 + 1).foreach { chunk =>
          mem.addData(chunk.toSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    val withTtl = run(Some(ttl), "bot_q259_ttl")
    val unbounded = run(None, "bot_q259_unbounded")
    assert(withTtl.exists(_._1 == 999999L), "planted bot must alert — vacuous otherwise")
    assert(withTtl == unbounded,
      s"a q259-sized TTL must not change the alert set: $withTtl vs $unbounded")
  }

  test("bot TTL arms from the key's HISTORY max: a late out-of-order batch cannot evict state early") {
    import spark.implicits._
    import graft.streaming.BotMonitor
    import graft.streaming.BotMonitor.UserEvt
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvt]
    val q = BotMonitor.botAlerts(mem.toDS(), idleTtlSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory")
      .queryName("bot_ooo_out").start()
    try {
      // bot burst 10:00:00–10:00:19 → alert; timeout must arm 11:00:19
      mem.addData((0 until 20).map(i =>
        UserEvt(1L, ts(f"2026-03-04 10:00:$i%02d"), "click")): _*)
      q.processAllAvailable()
      // a LATE batch holding only an out-of-order event (09:30, within
      // the 1 h watermark) — arming from the batch max would re-arm the
      // timeout at 10:30, an HOUR earlier than the key's true horizon
      mem.addData(UserEvt(1L, ts("2026-03-04 09:30:00"), "click"))
      q.processAllAvailable()
      // advance the watermark to 10:45 — between the buggy arm (10:30)
      // and the correct one (11:00:19)
      mem.addData(UserEvt(99L, ts("2026-03-04 11:45:00"), "view"))
      q.processAllAvailable()
      mem.addData(UserEvt(99L, ts("2026-03-04 11:45:01"), "view"))
      q.processAllAvailable()
      // fresh bot burst INSIDE the horizon (10:50 > watermark): the
      // tombstone must still be alive — no second alert
      mem.addData((0 until 20).map(i =>
        UserEvt(1L, ts(f"2026-03-04 10:50:$i%02d"), "click")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.table("bot_ooo_out").collect()
      .map(_.getLong(0)).count(_ == 1L)
    assert(alerts == 1,
      s"out-of-order late batch evicted state inside the horizon: $alerts alerts")
  }

  test("funnel TTL arms from the key's HISTORY max: a late out-of-order batch cannot re-convert inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    val mem = MemoryStream[Funnel.Evt]
    val q = Funnel.conversions(mem.toDS(), idleTtlSeconds = Some(3600L))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_ooo_out").start()
    try {
      // full conversion ending 10:10 → tombstone horizon ends 11:10
      mem.addData(
        Funnel.Evt(1L, ts("2026-03-05 10:00:00"), "signup"),
        Funnel.Evt(1L, ts("2026-03-05 10:05:00"), "click"),
        Funnel.Evt(1L, ts("2026-03-05 10:10:00"), "purchase"))
      q.processAllAvailable()
      // late out-of-order non-stage event at 09:30 — batch-max arming
      // would pull the timeout back to 10:30
      mem.addData(Funnel.Evt(1L, ts("2026-03-05 09:30:00"), "view"))
      q.processAllAvailable()
      // watermark to 10:45: between the buggy and the correct arm
      mem.addData(Funnel.Evt(99L, ts("2026-03-05 11:45:00"), "view"))
      q.processAllAvailable()
      mem.addData(Funnel.Evt(99L, ts("2026-03-05 11:45:01"), "view"))
      q.processAllAvailable()
      // a full new journey INSIDE the horizon must NOT convert again
      mem.addData(
        Funnel.Evt(1L, ts("2026-03-05 10:50:00"), "signup"),
        Funnel.Evt(1L, ts("2026-03-05 10:52:00"), "click"),
        Funnel.Evt(1L, ts("2026-03-05 10:54:00"), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val convs = spark.table("funnel_ooo_out").collect()
      .map(_.getLong(0)).count(_ == 1L)
    assert(convs == 1,
      s"out-of-order late batch re-armed the funnel inside the horizon: $convs conversions")
  }

  test("q260-sized TTL: funnel conversions on the sf0.001 wire equal the unbounded run (closing the q260 loop)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    // size the TTL FROM THE DATA: the smallest q260 grid candidate with
    // ZERO lost conversions (the symmetric law to q259→BotMonitor)
    val curve = SparkEntry.queries("q260_funnel_ttl_loss")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val ttl = curve.collectFirst { case (t, 0L) => t }
      .getOrElse(fail(s"no zero-loss TTL on the grid: ${curve.toSeq}"))
    val real = Tables.events(spark, TestSpark.sf0001)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id", "ts", "event_type")
      .collect()
      .map(r => Funnel.Evt(r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val t0 = real.map(_.ts.getTime).min
    // ONE planted conversion whose click→purchase wait spans most of
    // the TTL horizon (0.9×) — the law cannot pass vacuously on fast
    // natural journeys alone
    val gapMs = ttl * 900L // 0.9 × ttl in ms
    val planted = Seq(
      Funnel.Evt(999999L, new java.sql.Timestamp(t0), "signup"),
      Funnel.Evt(999999L, new java.sql.Timestamp(t0 + 1000L), "click"),
      Funnel.Evt(999999L, new java.sql.Timestamp(t0 + 1000L + gapMs),
        "purchase"))
    val wire = (real ++ planted).sortBy(e => (e.ts.getTime, e.user_id))
    def run(ttlOpt: Option[Long], name: String): Set[(Long, Long, Long, Long)] = {
      val mem = MemoryStream[Funnel.Evt]
      val q = Funnel.conversions(mem.toDS(), ttlOpt).writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try {
        wire.grouped(wire.length / 4 + 1).foreach { chunk =>
          mem.addData(chunk.toSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    val withTtl = run(Some(ttl), "funnel_q260_ttl")
    val unbounded = run(None, "funnel_q260_unbounded")
    assert(withTtl.exists(_._1 == 999999L),
      "planted long-gap conversion must convert — vacuous otherwise")
    assert(withTtl == unbounded,
      s"a q260-sized TTL must not lose conversions: $withTtl vs $unbounded")
  }

  test("quality-drift baseline survives an idle gap (folded, kept), and drops past the keep horizon") {
    import spark.implicits._
    import graft.streaming.QualityMonitor
    import graft.streaming.QualityMonitor.DocEvt
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvt]
    val out = QualityMonitor.qualityDrift(mem.toDS(), windowSeconds = 60)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("qdrift_ttl_out").start()
    def d(src: String, t: String, n: Long) = DocEvt(src, ts(t), n)
    def push(t1: String, t2: String): Unit = {
      mem.addData(d("zz", t1, 100)); q.processAllAvailable()
      mem.addData(d("zz", t2, 100)); q.processAllAvailable()
    }
    try {
      // window 1 (09:00): 4 docs 1 poor → 250000 ppm baseline-to-be
      mem.addData(
        d("web", "2026-01-02 09:00:01", 100),
        d("web", "2026-01-02 09:00:10", 5),
        d("web", "2026-01-02 09:00:20", 100),
        d("web", "2026-01-02 09:00:30", 100))
      q.processAllAvailable()
      // idle gap: the window closes via TIMEOUT (the round-12 path that
      // used to discard the baseline)
      push("2026-01-02 09:05:00", "2026-01-02 09:05:01")
      // the source RETURNS within the keep horizon with a poor spike:
      // it must alert against its own preserved history
      mem.addData(
        d("web", "2026-01-02 09:05:30", 5),
        d("web", "2026-01-02 09:05:31", 5),
        d("web", "2026-01-02 09:05:32", 5),
        d("web", "2026-01-02 09:05:33", 5))
      q.processAllAvailable()
      push("2026-01-02 09:08:00", "2026-01-02 09:08:01")
      // idle PAST the keep horizon (16 windows): the kept baseline-only
      // state must drop entirely
      push("2026-01-02 10:30:00", "2026-01-02 10:30:01")
      // the source returns after the horizon: first window again — own
      // rate as baseline, no alert
      mem.addData(d("web", "2026-01-02 10:35:00", 5))
      q.processAllAvailable()
      push("2026-01-02 11:30:00", "2026-01-02 11:30:01")
    } finally q.stop()
    val rows = spark.table("qdrift_ttl_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(rows(("web", "2026-01-02 09:00:00.0")) ==
      ((4L, 1L, 250000L, 250000L, false)), s"got $rows")
    // the gap-straddling spike alerts against the FOLDED baseline
    assert(rows(("web", "2026-01-02 09:05:00.0")) ==
      ((4L, 4L, 1000000L, 250000L, true)),
      s"baseline lost across the idle gap: $rows")
    // past the keep horizon the source restarts baseline-less
    assert(rows(("web", "2026-01-02 10:35:00.0")) ==
      ((1L, 1L, 1000000L, 1000000L, false)),
      s"state not dropped past the keep horizon: $rows")
  }
}

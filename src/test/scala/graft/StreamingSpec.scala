package graft

import graft.apps.AppSchema
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming ingest semantics: icon enrichment, JSON wire round-trip,
  * micro-batch file sink with processing-time trigger, event-time
  * windowed aggregation with watermark (SURVEY §2.12, §3.1). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("icon enrichment maps genres and assigns a deterministic file") {
    import spark.implicits._
    val df = Seq(("a.one", "Tools"), ("b.two", "Games"), ("c.three", "NoSuchGenre"))
      .toDF("appId", "genre")
    val icons = Map(
      "blade" -> Seq("blade/1.png", "blade/2.png"),
      "ball" -> Seq("ball/1.png"),
      "arrow_directions" -> Seq("arrow/1.png"))
    val out = StreamIngest.enrichWithIcon(df, icons)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out("a.one")._1 == "blade" && out("a.one")._2.startsWith("blade/"))
    assert(out("b.two")._1 == "ball" && out("b.two")._2 == "ball/1.png")
    assert(out("c.three")._1 == "arrow_directions", "unknown genre -> default")
    // deterministic: same input, same pick
    val again = StreamIngest.enrichWithIcon(df, icons)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(again("a.one") == out("a.one")._2)
  }

  test("JSON wire format round-trips the canonical schema") {
    import spark.implicits._
    val df = Seq(("app.1", "Title One", "Tools"), ("app.2", "Title, \"Two\"", "Games"))
      .toDF("appId", "title", "genre")
    val schema = AppSchema.allStringSchema(Seq("appId", "title", "genre"))
    val back = StreamIngest.fromWire(StreamIngest.toWire(df), schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("file-source stream lands micro-batches in the parquet sink exactly once") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toFile
    val outDir = Files.createTempDirectory("graft-stream-out").toFile
    val ckDir = Files.createTempDirectory("graft-stream-ck").toFile
    Seq(srcDir, outDir, ckDir).foreach(_.deleteOnExit())
    val header = "appId,title,genre"
    Files.writeString(new java.io.File(srcDir, "b1.csv").toPath,
      s"$header\napp.1,One,Tools\napp.2,Two,Games\n")

    val schema = AppSchema.allStringSchema(Seq("appId", "title", "genre"))
    val stream = StreamIngest.readCsvStream(spark, srcDir.getAbsolutePath, schema)
    val q = StreamIngest.startFileSink(stream, outDir.getAbsolutePath,
      ckDir.getAbsolutePath, Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      Files.writeString(new java.io.File(srcDir, "b2.csv").toPath,
        s"$header\napp.3,Three,Social\n")
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(outDir.getAbsolutePath)
    assert(landed.count() == 3)
    assert(landed.select("appId").collect().map(_.getString(0)).toSet ==
      Set("app.1", "app.2", "app.3"))
  }

  test("streaming quarantine lane keeps the query alive through poisoned rows") {
    val srcDir = Files.createTempDirectory("graft-qstream-src").toFile
    srcDir.deleteOnExit()
    Files.writeString(new java.io.File(srcDir, "b1.csv").toPath,
      "appId,score\napp.1,4.5\napp.2,banana\napp.3,3.0\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("appId",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val stream = StreamIngest.readCsvStreamWithQuarantine(
      spark, srcDir.getAbsolutePath, schema)
    var good = Seq.empty[String]; var bad = Seq.empty[String]
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        good = good ++ batch.filter(col("_corrupt_record").isNull)
          .select("appId").collect().map(_.getString(0))
        bad = bad ++ batch.filter(col("_corrupt_record").isNotNull)
          .select("_corrupt_record").collect().map(_.getString(0))
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(good.toSet == Set("app.1", "app.3"), s"good=$good")
    assert(bad.length == 1 && bad.head.contains("banana"), s"bad=$bad")
  }

  test("event-time 60s windows aggregate a memory stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamIngest.windowedEventCounts(events, "1 minute")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2026-01-01 10:00:05"), "click", 1.0),
        (Timestamp.valueOf("2026-01-01 10:00:45"), "click", 2.0),
        (Timestamp.valueOf("2026-01-01 10:01:10"), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      mem.addData((Timestamp.valueOf("2026-01-01 10:10:00"), "click", 0.5))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L, 3.0)),
      s"got ${rows.mkString("; ")}")
    assert(rows.contains(("2026-01-01 10:01:00.0", "view", 1L, 5.0)))
  }

  test("foreachBatch refreshes the serving parquet with running aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-serving").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/agg"
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = StreamIngest.serveAggregates(
      mem.toDF().toDF("ts", "event_type", "value"), path)
    try {
      mem.addData((Timestamp.valueOf("2026-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      val first = spark.read.parquet(path)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(first == Map("click" -> 1L))
      mem.addData(
        (Timestamp.valueOf("2026-01-01 10:01:00"), "click", 2.0),
        (Timestamp.valueOf("2026-01-01 10:02:00"), "view", 3.0))
      q.processAllAvailable()
      val second = spark.read.parquet(path)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(second == Map("click" -> 2L, "view" -> 1L),
        "serving table reflects the updated running aggregate")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamIngest.clickPurchaseJoin(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"), 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      clicks.addData(
        (1L, Timestamp.valueOf("2026-01-01 10:00:00")),
        (2L, Timestamp.valueOf("2026-01-01 10:00:00")))
      purchases.addData(
        (1L, Timestamp.valueOf("2026-01-01 10:05:00"), 9.99), // within 10 min
        (2L, Timestamp.valueOf("2026-01-01 10:30:00"), 5.0))  // too late
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attr_out").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.toSeq == Seq((1L, 9.99)),
      s"only the within-window purchase attributes; got ${rows.mkString(",")}")
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = StreamIngest.dedupStream(
      mem.toDF().toDF("k", "ts"), Seq("k"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2026-01-01 10:00:00")),
        ("a", Timestamp.valueOf("2026-01-01 10:00:05")), // dup within watermark
        ("b", Timestamp.valueOf("2026-01-01 10:00:10")))
      q.processAllAvailable()
      mem.addData(("a", Timestamp.valueOf("2026-01-01 10:01:00"))) // still dup
      q.processAllAvailable()
    } finally q.stop()
    val keys = spark.table("dedup_out").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b"), s"got ${keys.mkString(",")}")
  }

  test("batch twin q52 matches streaming window semantics shape") {
    val batch = SparkEntry.queries("q52_stream_window_60s")(spark, TestSpark.sf0001)
    val rows = batch.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getTimestamp(1).getTime - r.getTimestamp(0).getTime == 60000L)
    }
  }

  test("keyed upsert maintains latest-per-key across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-upsert").toFile
    dir.deleteOnExit()
    val stateDir = s"${dir.getAbsolutePath}/state"
    val ckDir = s"${dir.getAbsolutePath}/ck"
    val mem = MemoryStream[(String, Timestamp, Double)]
    val q = StreamIngest.startKeyedUpsert(
      mem.toDF().toDF("k", "ts", "v"), stateDir, ckDir, "k", "ts",
      trigger = Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(
        ("a", Timestamp.valueOf("2026-01-01 10:00:00"), 1.0),
        ("b", Timestamp.valueOf("2026-01-01 10:00:01"), 2.0))
      q.processAllAvailable()
      val v1 = StreamIngest.readLatestState(spark, stateDir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(v1 == Map("a" -> 1.0, "b" -> 2.0))
      mem.addData(
        ("a", Timestamp.valueOf("2026-01-01 10:05:00"), 9.0), // update a
        ("a", Timestamp.valueOf("2026-01-01 09:00:00"), 0.5), // stale — loses
        ("c", Timestamp.valueOf("2026-01-01 10:05:01"), 3.0)) // new key
      q.processAllAvailable()
      val v2 = StreamIngest.readLatestState(spark, stateDir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(v2 == Map("a" -> 9.0, "b" -> 2.0, "c" -> 3.0),
        s"stale row must not win: $v2")
    } finally q.stop()
  }

  test("upsert batch replay rewrites its version instead of double-applying") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert2").toFile
    dir.deleteOnExit()
    val stateDir = s"${dir.getAbsolutePath}/state"
    val b0 = Seq(("a", Timestamp.valueOf("2026-01-01 10:00:00"), 1.0))
      .toDF("k", "ts", "v")
    val b1 = Seq(
      ("a", Timestamp.valueOf("2026-01-01 10:05:00"), 9.0),
      ("b", Timestamp.valueOf("2026-01-01 10:05:01"), 2.0))
      .toDF("k", "ts", "v")
    StreamIngest.applyUpsertBatch(b0, 0L, stateDir, "k", "ts")
    StreamIngest.applyUpsertBatch(b1, 1L, stateDir, "k", "ts")
    val once = StreamIngest.readLatestState(spark, stateDir)
      .collect().map(r => (r.getString(0), r.getDouble(2))).sorted.toSeq
    // replay batch 1 (post-write crash before the checkpoint commit):
    // the merge re-derives state_v1 from state_v0, so nothing changes
    StreamIngest.applyUpsertBatch(b1, 1L, stateDir, "k", "ts")
    val twice = StreamIngest.readLatestState(spark, stateDir)
      .collect().map(r => (r.getString(0), r.getDouble(2))).sorted.toSeq
    assert(once == twice && once == Seq(("a", 9.0), ("b", 2.0)))
    // pruning kept the replay parent + head only
    val versions = new java.io.File(stateDir).listFiles()
      .map(_.getName).filter(_.startsWith("state_v")).sorted.toSeq
    assert(versions == Seq("state_v000000000", "state_v000000001"))
  }

  test("streaming near-dup gate catches a planted near-dup, passes a far doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 30-token base text; the near-dup changes ONE token (3-gram shingle
    // jaccard >> 0.8 -> identical minhash bands with overwhelming
    // probability); the far doc shares no vocabulary at all
    val baseText = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearText = ((1 to 29).map(i => s"tok$i") :+ "CHANGED").mkString(" ")
    val farText = (1 to 30).map(i => s"other$i").mkString(" ")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val fresh = StreamIngest.nearDedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "text", "ts", "10 minutes")
    val q = fresh.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      mem.addData((1L, Timestamp.valueOf("2026-01-01 10:00:00"), baseText))
      q.processAllAvailable()
      mem.addData(
        (2L, Timestamp.valueOf("2026-01-01 10:00:05"), nearText),
        (3L, Timestamp.valueOf("2026-01-01 10:00:10"), farText),
        // two VERBATIM copies in ONE micro-batch: without the exact-dup
        // pre-gate their band wins could split and BOTH would be
        // rejected (drop-all); exactly one must survive
        (4L, Timestamp.valueOf("2026-01-01 10:00:12"), (1 to 30).map(i => s"same$i").mkString(" ")),
        (5L, Timestamp.valueOf("2026-01-01 10:00:13"), (1 to 30).map(i => s"same$i").mkString(" ")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("neardup_out")
    val admitted = StreamIngest.nearDedupAdmitted(out, "doc_id", "ts")
      .collect().map(_.getLong(0)).sorted.toSeq
    // doc 1 seeds the state (8 fresh bands); doc 3 shares nothing and
    // emits 8 fresh bands; doc 2 collides with doc 1 on >= 1 band
    assert(admitted.contains(1L) && admitted.contains(3L),
      s"far docs must be admitted: $admitted")
    assert(!admitted.contains(2L), s"planted near-dup slipped through: $admitted")
    assert(Seq(4L, 5L).count(admitted.contains) == 1,
      s"exactly one of a same-batch verbatim pair must survive: $admitted")
    // the near-dup emitted FEWER than Bands fresh rows, but its id may
    // legitimately appear with a partial count — check the row counts
    val counts = out.groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts(1L) == 8L && counts(3L) == 8L)
    assert(counts.getOrElse(2L, 0L) < 8L)
  }

  test("streaming contamination gate drops the planted shingle overlap; on a static frame its drop set IS q84's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // eval doc shares the exact 3-gram "leak a b" with stream doc 2
    val evalDf = Seq((100L, "leak a b c d")).toDF("doc_id", "text")
    val hashes = StreamIngest.evalShingleHashes(evalDf, "text")
    assert(hashes.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val gated = StreamIngest.contaminationGate(
      mem.toDF().toDF("doc_id", "text"), "text", hashes)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("contam_out").start()
    try {
      mem.addData(
        (1L, "clean words only here nothing shared"),
        (2L, "prefix tokens then leak a b suffix"),
        (3L, "x y"))  // < 3 tokens: no shingles, trivially clean
      q.processAllAvailable()
    } finally q.stop()
    val passed = spark.table("contam_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(passed == Seq(1L, 3L), s"gate passed: $passed")
    // cross-law on a static frame at sf0.001: the gate (eval = the
    // %10==0 split, q84's convention) drops EXACTLY q84's flagged docs
    val sf = TestSpark.sf0001
    val docs = Tables.documents(spark, sf)
    val evalHashes = StreamIngest.evalShingleHashes(
      docs.filter(col("doc_id") % 10 === 0), "text")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val kept = StreamIngest.contaminationGate(train, "text", evalHashes)
      .collect().map(_.getLong(0)).toSet
    val dropped = train.collect().map(_.getLong(0)).toSet -- kept
    val q84Flagged = SparkEntry.queries("q84_contamination")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == q84Flagged,
      s"gate drop set != q84 flagged (diff: ${dropped.diff(q84Flagged)} / ${q84Flagged.diff(dropped)})")
  }

  test("q192's lateness profile sizes the watermark; admitted count matches the batch prediction") {
    // the closed loop the audit exists for: q192 reports the wire's
    // lateness distribution → the p99 bucket's upper bound becomes
    // `withWatermark(delay)` → replaying the SAME jittered wire in
    // arrival order through the event-time window must admit exactly
    // the rows Spark's published watermark semantics predict (watermark
    // = prior-batch max event time − delay, a row admitted iff its
    // window END is past the watermark), and ≥ 99% overall — the
    // guarantee the p99 sizing bought.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = TestSpark.sf0001
    graft.functions.TextFunctions.register(spark)

    // 1. the batch audit → p99 delay
    val prof = SparkEntry.queries("q192_lateness_audit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = prof.map(_._2).sum
    // upper bound (µs) of each lateness bucket, as committed in q192
    val boundUs = Map(0 -> 0L, 1 -> 1000000L, 2 -> 10000000L,
      3 -> 60000000L, 4 -> 600000000L, 5 -> 3600000000L)
    var cum = 0L
    val p99ord = prof.find { case (_, n) => cum += n; cum * 100 >= total * 99 }
      .map(_._1).get
    assert(p99ord <= 4, "jitter theorem bounds lateness < 120 s")
    val delayUs = boundUs(p99ord)

    // 2. the arrival-ordered wire — the exact q192 jitter (q77
    // discipline: a pure function of event_id)
    val jit = Dsl.md5h61(concat(lit("arr:"), col("event_id").cast("string"))) %
      lit(120000000L) - lit(60000000L)
    val wire = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"),
        (unix_micros(col("ts")) + jit).as("akey"), col("event_id"))
      .orderBy("akey", "event_id")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    assert(wire.length.toLong == total)

    // 3. replay through the existing event-time window in micro-batches
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamIngest.windowedEventCounts(
      mem.toDF().toDF("ts", "event_type", "value"),
      s"${delayUs / 1000000} seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_sized")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val batches = wire.grouped(50).toSeq
    try {
      batches.foreach { g => mem.addData(g); q.processAllAvailable() }
      // sentinel 2 h past the wire closes every real window (append
      // mode only emits closed windows)
      val sentinelTs = new Timestamp(wire.map(_._1.getTime).max + 7200000L)
      mem.addData((sentinelTs, "sentinel", 0.0))
      q.processAllAvailable()
      mem.addData((new Timestamp(sentinelTs.getTime + 60000L), "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("wm_sized")
      .filter(col("event_type") =!= "sentinel")
      .agg(sum("n")).collect()(0).getLong(0)

    // 4. the batch-side prediction from the same wire
    val delayMs = delayUs / 1000
    var maxMs = Long.MinValue; var wmMs = 0L; var predicted = 0L
    batches.foreach { g =>
      g.foreach { case (ts, _, _) =>
        val wEndMs = (ts.getTime / 60000L) * 60000L + 60000L
        if (wEndMs > wmMs) predicted += 1
      }
      maxMs = math.max(maxMs, g.map(_._1.getTime).max)
      wmMs = math.max(wmMs, maxMs - delayMs)
    }
    assert(admitted == predicted,
      s"streamed admitted $admitted != batch-predicted $predicted " +
        s"(delay ${delayUs / 1000000}s from p99 bucket $p99ord)")
    assert(admitted * 100 >= total * 99,
      s"p99-sized watermark admitted only $admitted/$total")
  }

  test("boilerplate gate alerts once at the second distinct doc; alert set IS the q220 flag rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.BoilerplateGate
    val mem = MemoryStream[(Long, String)]
    val alerts = BoilerplateGate.gate(BoilerplateGate.segments(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", " the "))
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("boiler_alerts").start()
    try {
      // batch 1: "dup" in doc 1 only; "rep" twice WITHIN doc 3 -> no alerts
      mem.addData((1L, "dup the uniq1"), (3L, "rep the rep"))
      q.processAllAvailable()
      assert(spark.table("boiler_alerts").count() == 0,
        "no segment has crossed 2 distinct docs yet")
      // batch 2: docs 2 and 4 both carry "dup" -> exactly ONE alert,
      // second_doc = 2 (doc_id order within the batch, not arrival)
      mem.addData((4L, "dup the uniq3"), (2L, "dup the uniq2"))
      q.processAllAvailable()
      // batch 3: yet another "dup" doc -> already flagged, still one alert
      mem.addData((5L, "dup the uniq4"))
      q.processAllAvailable()
    } finally q.stop()
    val hDup = spark.range(1)
      .select(graft.Dsl.md5h61(lit("dup"))).head.getLong(0)
    val got = spark.table("boiler_alerts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((hDup, 1L, 2L)), s"alerts wrong: $got")

    // cross-law at sf0.001: streamed over the whole table, the alerted
    // hash set equals the batch prevalence rule (>= 2 distinct docs)
    // that q220 aggregates -- same segments, same within-doc collapse
    val sf = TestSpark.sf0001
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val mem2 = MemoryStream[(Long, String)]
    val alerts2 = BoilerplateGate.gate(BoilerplateGate.segments(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", " the "))
    val q2 = alerts2.writeStream.outputMode("append")
      .format("memory").queryName("boiler_alerts_sf").start()
    try {
      val half = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      mem2.addData(half.take(half.length / 2).toSeq: _*)
      q2.processAllAvailable()
      mem2.addData(half.drop(half.length / 2).toSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val streamed = spark.table("boiler_alerts_sf")
      .collect().map(_.getLong(0)).toSet
    val expected = BoilerplateGate.segments(docs, "doc_id", "text", " the ")
      .groupBy("h").count().filter(col("count") >= 2)
      .collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"gate vs batch rule: ${streamed.size} vs ${expected.size}")
    assert(expected.nonEmpty, "fixtureless law must not be vacuous")
  }
}

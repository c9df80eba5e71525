package graft.streaming

import graft.Dsl
import graft.apps.AppSchema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming restatement of the reference's producer/consumer
  * pair (SURVEY §3.1):
  *
  *   producer.py:81-116 (pandas iterrows → per-row dict → icon enrich →
  *   Kafka JSON) becomes a declarative enrich over any input frame —
  *   batch or stream — with to_json for the wire format.
  *
  *   consumer.py:87-114 (poll loop, 60 s wall-clock buffer, append-CSV)
  *   becomes `writeStream` with Trigger.ProcessingTime — checkpointed,
  *   exactly-once to the file sink (a strict upgrade over the reference's
  *   at-least-once manual flush, SURVEY §2.12).
  *
  * The Kafka transport itself is environment-pluggable: this container
  * ships no spark-sql-kafka connector (zero egress), so sources are file/
  * memory-based; on a cluster the same pipeline binds to
  * `readStream.format("kafka")` + `from_json(value)` without code changes
  * (the enrich/window/sink stages take DataFrames, not sources).
  */
object StreamIngest {

  /** Genre → icon enrichment (producer.py:86-105). The reference picks a
    * random file per record (producer.py:96-101); here the pick is a
    * deterministic hash of appId over the category's file list — same
    * distribution, reproducible tests (documented upgrade). */
  def enrichWithIcon(df: DataFrame,
      iconFiles: Map[String, Seq[String]]): DataFrame = {
    val cat = AppSchema.genreToIconMap
    val catCol = cat.filterNot(_._1 == "default").foldLeft(
      lit(null).cast("string")) { case (acc, (genre, cats)) =>
        when(col("genre") === genre, lit(cats.head)).otherwise(acc)
    }
    val catAssigned = coalesce(catCol, lit(cat("default").head))
    val withCat = df.withColumn("icon_category_assigned", catAssigned)
    val pick = iconFiles.foldLeft(lit(null).cast("string")) {
      case (acc, (category, files)) =>
        when(col("icon_category_assigned") === category,
          element_at(
            array(files.map(lit): _*),
            (Dsl.md5h61Decl(col("appId")) % files.size).cast("int") + 1))
          .otherwise(acc)
    }
    withCat.withColumn("icon_path", pick)
  }

  /** JSON wire format (producer.py:45 json.dumps(default=str)). */
  def toWire(df: DataFrame): DataFrame =
    df.select(col("appId").as("key"), to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Decode the wire format back to columns (consumer.py:77 json.loads;
    * Spark-native: from_json over the canonical schema). */
  def fromWire(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** Kafka reader options for `spark.readStream.format("kafka")
    * .options(...)` (producer.py:34-38 broker config + consumer.py:74-80
    * subscribe). Pure option-map construction so the binding is unit-
    * testable without a broker or connector jar; on a cluster:
    * `fromWire(spark.readStream.format("kafka").options(
    *   kafkaSourceOptions(...)).load(), schema)`.
    * `maxOffsetsPerTrigger` is the per-batch throughput bound — the
    * declarative twin of the consumer's 60 s poll-buffer cap. */
  def kafkaSourceOptions(bootstrapServers: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Kafka writer options for `toWire(df).writeStream.format("kafka")
    * .options(...)` (producer.py:40-48 send loop). The wire frame from
    * [[toWire]] already carries key/value, so Kafka partitions by appId —
    * per-key ordering preserved, load spread across topic partitions. */
  def kafkaSinkOptions(bootstrapServers: String, topic: String,
      checkpointDir: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)

  /** File-based streaming source of batch CSVs (the no-broker twin of the
    * Kafka source; same downstream pipeline). */
  def readCsvStream(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .csv(dir)

  /** Streaming twin of CsvIngest.readTypedWithQuarantine: PERMISSIVE
    * typed stream where malformed rows survive as a corrupt-record
    * column instead of killing the query. Returns the raw stream with
    * the marker column; callers split clean/quarantine lanes per
    * micro-batch (e.g. in foreachBatch) — a poisoned message must cost
    * one quarantined row, not a dead stream. */
  def readCsvStreamWithQuarantine(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)

  /** Micro-batch parquet sink with a processing-time tumbling trigger —
    * the consumer's 60 s window (consumer.py:87), checkpointed. */
  def startFileSink(df: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Continuous serving refresh: per micro-batch, replace a serving
    * parquet with the latest running per-type aggregates. foreachBatch is
    * the sink shape for destinations that need overwrite/upsert semantics
    * instead of append (the streaming twin of the reference's
    * api_app_info_* refresh cycle). */
  def serveAggregates(events: DataFrame, servingPath: String): StreamingQuery =
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Dsl.dsum(col("value")).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(servingPath)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  /** Latest-row-per-key merge: base ∪ batch reduced to one survivor per
    * key — highest (tsCol, row-content hash) wins, the hash pinning
    * duplicate-timestamp ties deterministically. A pure function of its
    * two inputs, which is what makes the streaming upsert below
    * replay-safe. The rank-1 filter is the TopKPerGroup rewrite pattern,
    * so under GraftExtensions the merge runs on the bounded-heap exec
    * (O(1) state per key) after a single shuffle on the key. */
  def mergeLatest(base: DataFrame, batch: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val all = base.unionByName(batch.select(base.columns.map(col).toSeq: _*))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
      .orderBy(col(tsCol).desc,
        xxhash64(to_json(struct(all.columns.map(col).toSeq: _*))).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def stateVersions(stateDir: String): Seq[(Long, java.nio.file.Path)] = {
    val base = java.nio.file.Paths.get(stateDir)
    if (!java.nio.file.Files.isDirectory(base)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(base)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("state_v")) Some(n.stripPrefix("state_v").toLong -> p)
        else None
      }
    }
  }

  /** Read the current state table: the highest completed version dir. */
  def readLatestState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateVersions(stateDir).maxBy(_._1)._2.toString)

  /** One micro-batch of the keyed upsert, factored out so batch code and
    * specs can drive it directly. Version dirs make the sink exactly-once:
    * batch b always derives `state_v{b}` from the newest version BELOW b,
    * so a replayed batch (failure after write, before checkpoint commit)
    * deterministically REWRITES its own version instead of
    * double-applying on top of it. Old versions beyond `keepVersions`
    * are pruned — the replay parent is always retained. */
  def applyUpsertBatch(batch: DataFrame, batchId: Long, stateDir: String,
      key: String, tsCol: String, keepVersions: Int = 2): Unit = {
    val spark = batch.sparkSession
    val prev = stateVersions(stateDir).filter(_._1 < batchId)
      .sortBy(-_._1).headOption
    val base = prev.map(p => spark.read.parquet(p._2.toString))
      .getOrElse(batch.limit(0).toDF())
    mergeLatest(base, batch.toDF(), key, tsCol)
      .write.mode("overwrite")
      .parquet(f"$stateDir/state_v$batchId%09d")
    stateVersions(stateDir).sortBy(-_._1).drop(keepVersions).foreach {
      case (_, dir) =>
        scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
          import scala.jdk.CollectionConverters._
          st.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.delete)
        }
    }
  }

  /** Streaming keyed upsert sink: maintains a latest-row-per-key serving
    * table across micro-batches (the streaming twin of a MERGE INTO /
    * SCD-1 refresh — q105 is the batch SCD-2 sibling). foreachBatch +
    * versioned dirs give exactly-once replay semantics on a plain
    * filesystem; readers resolve the newest version, same latest-dir
    * discipline as apps.ServingData. */
  def startKeyedUpsert(updates: DataFrame, stateDir: String,
      checkpointDir: String, key: String, tsCol: String,
      keepVersions: Int = 2,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          applyUpsertBatch(batch.toDF(), batchId, stateDir, key, tsCol,
            keepVersions)
      }
      .trigger(trigger)
      .start()

  /** Stream-stream interval join: purchases attributed to a click by the
    * same user within the preceding `windowMinutes`. Both sides carry
    * watermarks and the join condition bounds event time on both sides,
    * so Spark can expire state — the requirements for an unbounded
    * stream-stream inner join. Works identically on batch frames. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val c = clicks.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("user_id", "click_ts", "purchase_ts", "value")
  }

  /** Streaming exact dedup: drop duplicate keys with state BOUNDED by the
    * watermark (dropDuplicatesWithinWatermark) — unbounded-state dedup is
    * the classic streaming-pipeline OOM; the watermark bound is what makes
    * exact dedup viable on an infinite stream. */
  def dedupStream(df: DataFrame, keys: Seq[String], watermarkCol: String,
      delay: String): DataFrame =
    df.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming NEAR-dup gate — q37's MinHash-LSH recall envelope on an
    * infinite stream, with state bounded by the watermark the way
    * [[dedupStream]] bounds exact dedup. Each doc's 8 band hashes
    * (Dedup.withBands — the exact q36/q37 math as a narrow projection)
    * are exploded to (band_id, bh) rows and deduplicated within the
    * watermark: the output is each doc's FRESH band rows. A doc that
    * emits all [[graft.operators.Dedup.Bands]] rows collided with
    * nothing inside the watermark horizon; a doc that emits fewer
    * shares ≥ 1 band bucket with an earlier doc — exactly q37's
    * candidate condition (any shared band), so the gate's recall
    * envelope matches the batch operator's. [[nearDedupAdmitted]]
    * reduces a sink of fresh-band rows to the admitted doc ids.
    * State per entry is one (band_id, bh) key — bounded by stream rate
    * × watermark, never corpus size. Docs with < 3 tokens have no
    * shingles (NULL bands) and are excluded here — a caller wanting
    * them admitted unions them around the gate. */
  def nearDedupStream(df: DataFrame, idCol: String, textCol: String,
      watermarkCol: String, delay: String): DataFrame =
    graft.operators.Dedup.withBands(df, textCol)
      .filter(col("bands").isNotNull)
      .withWatermark(watermarkCol, delay)
      // EXACT-dup pre-gate, chained stateful op #1: two VERBATIM copies
      // in the SAME micro-batch share all 8 band keys, and the per-key
      // winner of the band dedup below is independent across keys — the
      // wins could split 5/3 and BOTH copies would then emit < 8 rows,
      // i.e. both rejected and the content lost entirely (drop-all,
      // where keep-first is the contract). Collapsing exact copies on
      // the content hash first guarantees the surviving copy contends
      // alone. (A same-batch NEAR-identical pair can still split wins —
      // the gate is conservative there: both rejected, and a re-send
      // after the watermark horizon is admitted fresh.)
      .withColumn("__fp", graft.Dsl.md5h61(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .select(col(idCol), col(watermarkCol),
        posexplode(col("bands")).as(Seq("band_id", "bh")))
      .dropDuplicatesWithinWatermark("band_id", "bh")

  /** Streaming eval-contamination gate — q84's exact-shingle
    * contamination check at stream time: a doc is dropped iff ANY of
    * its word-3-gram shingle hashes appears in the eval set. The eval
    * side is collected ONCE and inlined as a literal array (the
    * q84/q96 broadcast argument: eval sets are MBs against the
    * corpus), so the gate is a STATELESS scan filter — no stream-state
    * store, no watermark, safe in any output mode; beyond literal-array
    * sizes the batch pipeline's bloom variant (q96) is the scale path.
    * StreamingSpec pins the cross-law: run over a static frame, the
    * gate's drop set IS q84's flagged-doc set. */
  def contaminationGate(df: DataFrame, textCol: String,
      evalShingleHashes: Seq[Long]): DataFrame = {
    val hs = transform(graft.Dsl.shingles3(graft.Dsl.toks(col(textCol))),
      s => graft.Dsl.md5h61(s))
    df.filter(size(array_intersect(hs, typedlit(evalShingleHashes))) === 0)
  }

  /** Distinct shingle hashes of an eval frame, for [[contaminationGate]].
    * The collect is eval-set-bounded by design (never the corpus). */
  def evalShingleHashes(eval: DataFrame, textCol: String): Seq[Long] =
    eval.select(explode(transform(
        graft.Dsl.shingles3(graft.Dsl.toks(col(textCol))),
        s => graft.Dsl.md5h61(s))).as("h"))
      .distinct().collect().map(_.getLong(0)).toSeq

  /** Batch reduction of [[nearDedupStream]] output: ids whose every
    * band was fresh — the admitted set. Grouping includes the event-time
    * column: over an accumulated sink a doc re-sent across watermark
    * horizons appears once per send, and summing band counts across
    * sends would let two partial (rejected) appearances masquerade as
    * one fully-fresh admit (5+3 = 8). Run per micro-batch in
    * foreachBatch, or over the sink table — either way each (id,
    * event-time) appearance is judged alone. */
  def nearDedupAdmitted(freshBands: DataFrame, idCol: String,
      watermarkCol: String): DataFrame =
    freshBands.groupBy(idCol, watermarkCol)
      .agg(count(lit(1)).as("n_fresh_bands"))
      .filter(col("n_fresh_bands") === graft.operators.Dedup.Bands)
      .select(idCol)

  /** Event-time upgrade of the tumbling window: 60 s windows with a
    * watermark for late data (SURVEY §2.12 'n/a in parity mode' path).
    * Works identically on batch and streaming frames. */
  def windowedEventCounts(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), Dsl.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
}

package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.functions._

/** ML pipeline operators (SURVEY §2.11) exposed over the testdata tables,
  * plus the streaming-window batch equivalent (§2.12).
  *
  * The ML entries are seed-fixed and deterministic but not SQL-expressible,
  * so they carry no oracle — the driver records the weaker rows-only
  * check; ScalaTest asserts the invariants (cluster count, RMSE range).
  */
object Pipelines {
  import Dsl._

  /** K-Means over the embeddings table (k=10 matching the label count,
    * seed=1 like the reference's clustering stage) → cluster sizes. */
  val kmeansEmbeddings: Q = Q(
    "q50_kmeans_embeddings",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(10).setSeed(1)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(emb)
      model.transform(emb)
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .orderBy("cluster")
    },
    None)

  /** q50b — the hash-verified clustering twin of q50: one Lloyd
    * iteration from a PINNED centroid set, so assignment AND centroid
    * update are DuckDB-verified (the q98→q98b discipline: the seeded
    * MLlib fit stays rows-only, the pinned-artifact variant makes the
    * math oracle-checkable). Centroids are 10 md5-derived ±1 sign
    * vectors (the q151 semCentroids discipline); assignment is the
    * IvfIndex literal argmin (|c|² − 2·e·c, ties to the lower cell —
    * zero shuffles, one scan); the update is the per-(cluster, dim)
    * exact-decimal mean of assigned vectors — ONE shuffle on a key
    * whose cardinality is k·dim = 640, regardless of corpus size (the
    * explode carries (cluster, dim, v): map-side partial aggs collapse
    * it before the exchange, so 100 TB of vectors reduce to 640 rows).
    * Output: (cluster, dim, n_vecs, c_old, c_new); empty clusters emit
    * no rows on either engine. */
  private val LloydK = 10
  private[graft] val lloydCentroids: Seq[(Int, Array[Double])] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until LloydK).map { c =>
      (c, (0 until Similarity.EmbeddingDim).map { i =>
        val h = mdig.digest(s"kmb:$c:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1.0 else -1.0
      }.toArray)
    }
  }

  val kmeansLloydStep: Q = Q(
    "q50b_kmeans_lloyd_step",
    (s, d) => {
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("vec_id")) // single-file parquet -> use all cores
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val assigned = IvfIndex.assignToCentroids(w, lloydCentroids)
      val ev = assigned.select(col("cell").as("cluster"),
        posexplode(col("e")).as(Seq("dim", "v")))
      val cOldRow = element_at(
        typedlit(lloydCentroids.map(_._2.toSeq)), col("cluster") + 1)
      ev.groupBy("cluster", "dim")
        .agg(count(lit(1)).as("n_vecs"), davg(col("v")).as("c_new"))
        .select(col("cluster"), col("dim"), col("n_vecs"),
          element_at(cOldRow, col("dim") + 1).as("c_old"), col("c_new"))
        .orderBy("cluster", "dim")
    },
    Some {
      val dim = Similarity.EmbeddingDim
      val scores = lloydCentroids.map { case (cellId, c) =>
        val c2 = c.map(v => v * v).sum
        val arr = c.map(v => s"$v").mkString("[", ", ", "]")
        s"($c2 - 2.0 * list_reduce(list_transform(generate_series(1, $dim), i -> ($arr::double[])[i] * e[i]), (x, y) -> x + y))"
      }.mkString(", ")
      val cOld = lloydCentroids
        .map(_._2.map(v => s"$v").mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""WITH ed AS (SELECT vec_id,
          list_transform(embedding, x -> cast(x as double)) AS e
          FROM embeddings),
        sc AS (SELECT vec_id, e, [$scores] AS scores FROM ed),
        cells AS (SELECT vec_id, e,
          cast(list_position(scores, list_min(scores)) - 1 as int) AS cluster
          FROM sc),
        ev AS (SELECT cluster, cast(i - 1 as int) AS dim, e[i] AS v
          FROM cells, unnest(generate_series(1, $dim)) AS u(i))
        SELECT cluster, dim, cast(count(*) as bigint) AS n_vecs,
          ($cOld::double[][])[cluster + 1][dim + 1] AS c_old,
          ${sqlDavg("v")} AS c_new
        FROM ev GROUP BY cluster, dim ORDER BY cluster, dim"""
    })

  /** RandomForest regression on lineitem (predict extendedprice from
    * quantity/discount/tax; seed=42, maxBins=64 like the reference's RF
    * stage) → one row with the training RMSE and row count. */
  val rfRegression: Q = Q(
    "q51_rf_regression",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
      val assembled = new VectorAssembler()
        .setInputCols(Array("l_quantity", "l_discount", "l_tax"))
        .setOutputCol("features")
        .transform(li)
      val model = new RandomForestRegressor()
        .setFeaturesCol("features").setLabelCol("l_extendedprice")
        .setPredictionCol("prediction").setSeed(42).setMaxBins(64)
        .fit(assembled)
      val rmse = new RegressionEvaluator()
        .setLabelCol("l_extendedprice").setPredictionCol("prediction")
        .setMetricName("rmse").evaluate(model.transform(assembled))
      import s.implicits._
      Seq((rmse, li.count())).toDF("rmse", "n_rows")
    },
    None)

  /** 60-second tumbling event-time windows over events — the batch twin
    * of the streaming consumer's micro-batch window (oracle-able since
    * 60 s windows == minute truncation). */
  val streamWindow60s: Q = Q(
    "q52_stream_window_60s",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type"),
    Some(s"""SELECT date_trunc('minute', ts) AS window_start,
      date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
      event_type, count(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type"""))

  /** As-of join: attribute each purchase to the same user's most recent
    * click at-or-before it. Spark lacks ASOF JOIN; the scale-correct
    * composition is union + `last(_, ignoreNulls)` over a user-partitioned
    * time window — ONE shuffle on user_id, no join explosion (a
    * join-then-max would multiply each purchase by all prior clicks).
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofJoin: Q = Q(
    "q53_asof_join",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      // ties: a click at the identical timestamp counts (p.ts >= c.ts),
      // so clicks sort before purchases within a timestamp
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_type"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("click_ts",
          when(col("event_type") === "click", col("ts")))
        .withColumn("last_click_ts",
          last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("last_click_ts"),
          (col("ts").cast("long") - col("last_click_ts").cast("long"))
            .as("gap_seconds"))
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
        c.ts AS last_click_ts,
        date_diff('second', c.ts, p.ts) AS gap_seconds
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** Approximate distinct (HLL++). Sketches are engine-specific so there
    * is no cross-engine oracle; ScalaTest bounds the relative error
    * against the exact count. */
  val approxDistinct: Q = Q(
    "q54_approx_distinct",
    (s, d) => Tables.lineitem(s, d)
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders")),
    None)

  /** Bucketed range join: part pairs with |Δretailprice| <= 0.1. A naive
    * inequality join is O(n²); binning prices to the threshold width and
    * replicating the LEFT side into its own + neighbor buckets turns it
    * into an equi-join on the bucket key (each qualifying pair matches in
    * exactly one bucket — the right row's own — so no dedup pass). */
  val rangeJoin: Q = Q(
    "q57_range_join",
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_retailprice"))
      val bucket = floor(col("p_retailprice") / 0.1).cast("long")
      val left = p.withColumn("b0", bucket)
        .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
        .select(col("p_partkey").as("p1"), col("p_retailprice").as("price1"),
          col("bucket"))
      val right = p
        .select(col("p_partkey").as("p2"), col("p_retailprice").as("price2"),
          bucket.as("bucket"))
      left.join(right,
          left("bucket") === right("bucket") && col("p1") < col("p2") &&
            abs(col("price1") - col("price2")) <= 0.1)
        .select("p1", "p2", "price1", "price2")
        .orderBy("p1", "p2")
    },
    Some("""SELECT a.p_partkey AS p1, b.p_partkey AS p2,
      a.p_retailprice AS price1, b.p_retailprice AS price2
      FROM part a JOIN part b
        ON a.p_partkey < b.p_partkey
       AND abs(a.p_retailprice - b.p_retailprice) <= 0.1
      ORDER BY p1, p2"""))

  /** Batch ANN: top-5 cosine neighbors for EACH of the first 10 query
    * vectors in one plan — broadcast the query block, rank per query via
    * row_number (compiled to the custom TopKPerGroup heap exec). */
  val annBatch: Q = Q(
    "q58_ann_batch",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorFunctions.register(s)
      val w = Tables.embeddings(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("vec_id"))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", sqrt(expr("dot_product(e, e)")))
      val queries = w.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qnrm"))
      val win = Window.partitionBy(col("query_id"))
        .orderBy(desc("cosine"), asc("vec_id"))
      w.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine",
          expr("dot_product(e, qe)") / (col("nrm") * col("qnrm")))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") <= 5)
        .select("query_id", "rn", "vec_id", "cosine")
        .orderBy("query_id", "rn")
    },
    Some("""WITH n AS (SELECT vec_id,
        list_transform(embedding, x -> cast(x as double)) AS e FROM embeddings),
      w AS (SELECT vec_id, e,
        sqrt(list_reduce(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]), (x, y) -> x + y)) AS nrm
        FROM n),
      q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm FROM w WHERE vec_id < 10),
      scored AS (SELECT q.query_id, w.vec_id,
        list_reduce(list_transform(generate_series(1, len(w.e)), i -> w.e[i] * q.qe[i]), (x, y) -> x + y) / (w.nrm * q.qnrm) AS cosine
        FROM w, q WHERE w.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, cosine,
        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
        FROM scored)
      SELECT query_id, rn, vec_id, cosine FROM ranked WHERE rn <= 5
      ORDER BY query_id, rn"""),
    bench = true)

  /** Time-series gap filling: a complete hourly spine over the event
    * range, left-joined to hourly counts so silent hours appear as zero
    * rows (sequence + explode = distributed spine generation, no driver
    * loops; the spine bounds come from a 1-row agg crossJoin). */
  val gapFill: Q = Q(
    "q59_gap_fill",
    (s, d) => {
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("tmin"),
        date_trunc("hour", max(col("ts"))).as("tmax"))
      val spine = bounds
        .select(explode(sequence(col("tmin"), col("tmax"),
          expr("INTERVAL 1 HOUR"))).as("h"))
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      spine.join(hourly, Seq("h"), "left_outer")
        .select(col("h"), coalesce(col("cnt"), lit(0L)).as("n_events"))
        .orderBy("h")
    },
    Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS tmin,
        date_trunc('hour', max(ts)) AS tmax FROM events),
      spine AS (SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR)) AS h FROM b),
      hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS cnt
        FROM events GROUP BY 1)
      SELECT s.h, coalesce(hourly.cnt, 0) AS n_events
      FROM spine s LEFT JOIN hourly ON s.h = hourly.h
      ORDER BY s.h"""))

  /** Funnel analysis: users whose first click precedes their first view
    * precedes their first purchase — one hash-agg with conditional mins,
    * no self-joins (the naive N-step funnel as N joins dies at scale). */
  val funnel: Q = Q(
    "q65_funnel",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_click") < col("first_view") &&
        col("first_view") < col("first_purchase"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
      min(ts) FILTER (WHERE event_type = 'click') AS first_click,
      min(ts) FILTER (WHERE event_type = 'view') AS first_view,
      min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
      HAVING first_click < first_view AND first_view < first_purchase
      ORDER BY user_id"""))

  /** Cohort retention: users grouped by first-activity day, counted as
    * active at day offsets — two hash-aggs and one broadcastable join on
    * user_id (cohort table ≪ event table at scale). */
  val retention: Q = Q(
    "q66_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        // timestamp at the boundary, not raw DATE (see q105's scaladoc)
        .withColumn("cohort_day", col("cohort_day").cast("timestamp"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH ev AS (SELECT user_id, cast(ts as date) AS day FROM events),
      cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
      SELECT cast(c.cohort_day as timestamp) AS cohort_day,
        cast(date_diff('day', c.cohort_day, e.day) as int) AS day_offset,
        count(DISTINCT e.user_id) AS active_users
      FROM ev e JOIN cohort c ON e.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(kmeansEmbeddings, kmeansLloydStep, rfRegression,
    streamWindow60s,
    asofJoin, approxDistinct, rangeJoin, annBatch, gapFill, funnel,
    retention)
}

package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator inventory (SURVEY.md §2.1, §2.3–§2.9).
  *
  * Each query re-expresses one reference operator over the driver testdata
  * tables; the paired `oracle` SQL is the DuckDB-equivalent the driver
  * hash-compares against. Determinism rules used throughout:
  *   - every result carries a total ORDER BY (ties broken by a key column);
  *   - double aggregation goes through exact decimal(18,4) sums ([[Dsl]]);
  *   - column names are aliased identically on both sides.
  */
object Relational {
  import Dsl._

  /** TPC-H Q1-style pricing summary — groupBy agg with sum/avg/count
    * (SURVEY §2.6 group-agg; spark_script.py:80 semantics generalized). */
  val pricingSummary: Q = Q(
    "q01_pricing_summary",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDavg("l_quantity")} AS avg_qty,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** Parquet scan with pushed filter + pruned projection (SURVEY §2.1, §2.4).
    * `.explain` must show PushedFilters + a 4-column ReadSchema. */
  val scanFilterProject: Q = Q(
    "q02_scan_filter_project",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 45 && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.05
      ORDER BY l_orderkey, l_linenumber"""))

  /** Top-k: orderBy desc + limit → TakeOrderedAndProject (SURVEY §2.7;
    * app.py:249 `/top_apps`). Stable tie-break on key. */
  val topkOrders: Q = Q(
    "q03_topk_orders",
    (s, d) => Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20),
    Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""),
    bench = true)

  /** Multi-key top-k (SURVEY §2.7; app.py:209 desc(score),desc(minInstalls)). */
  val topkMultikey: Q = Q(
    "q04_topk_multikey",
    (s, d) => Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .orderBy(desc("l_extendedprice"), desc("l_quantity"),
        asc("l_orderkey"), asc("l_linenumber"))
      .limit(15),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_quantity DESC, l_orderkey, l_linenumber
      LIMIT 15"""))

  /** Left-outer equi-join (SURVEY §2.5; spark_script.py:24 apps ⟕ features).
    * Small build side → Catalyst broadcasts automatically. */
  val joinLeftOuter: Q = Q(
    "q05_join_left_outer",
    (s, d) => Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey"""),
    bench = true)

  /** Multiway star join + agg: revenue per region. Dimension tables are
    * explicitly broadcast — at 100 TB the fact table never shuffles for
    * dims this small (SURVEY §2.5, §4 join strategy). lineitem is
    * partially aggregated by l_orderkey BEFORE the orders join: the
    * orderkey shuffle the join needs anyway then carries map-side-
    * combined partials (one row per orderkey per input partition), and
    * decimal partial sums re-aggregate exactly, so the result is
    * bit-identical to the single-level plan. One reduction level only —
    * profiling (tools/Profile) showed a second per-customer level adds
    * a shuffle that never pays for itself at any scale where customer
    * is join-broadcastable. */
  val joinMultiwayAgg: Q = Q(
    "q06_join_multiway_agg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      val liAgg = li.groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
            .as("rev_part"),
          count(lit(1)).as("n_part"))
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(col("rev_part")).cast("double").as("revenue"),
          sum(col("n_part")).as("n_items"))
        .orderBy("r_name")
    },
    Some(s"""SELECT r_name,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
    bench = true)

  /** Left-semi join — EXISTS (SURVEY §2.5 extension of the join surface). */
  val joinSemi: Q = Q(
    "q07_join_semi",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
      ORDER BY c_custkey"""))

  /** Left-anti join — NOT EXISTS. */
  val joinAnti: Q = Q(
    "q08_join_anti",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  /** Group-by count (SURVEY §2.6; spark_script.py:80 cluster report). */
  val groupCount: Q = Q(
    "q09_group_count",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus, count(*) AS n FROM orders
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Global count (SURVEY §2.6; df.count() validation gates). */
  val globalCount: Q = Q(
    "q10_global_count",
    (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")),
    Some("SELECT count(*) AS n FROM lineitem"))

  /** Single-column DISTINCT + ascending sort (SURVEY §2.6; app.py:161
    * `/categories`). */
  val distinctSingle: Q = Q(
    "q11_distinct",
    (s, d) => Tables.lineitem(s, d)
      .select("l_returnflag").distinct().orderBy("l_returnflag"),
    Some("SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag"))

  /** Multi-column DISTINCT (SURVEY §2.6; app.py:170-173). */
  val distinctMulti: Q = Q(
    "q12_distinct_multi",
    (s, d) => Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** Case-insensitive equality filter (SURVEY §2.4; app.py:209
    * lower(genre) = lower(param)). */
  val filterCaseInsensitive: Q = Q(
    "q13_filter_ci_eq",
    (s, d) => Tables.nation(s, d)
      .filter(lower(col("n_name")) === "nation_7")
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey"),
    Some("""SELECT n_nationkey, n_name FROM nation
      WHERE lower(n_name) = 'nation_7' ORDER BY n_nationkey"""))

  /** Substring-containment filter (SURVEY §2.4; app.py:170
    * lower(title).contains(q)). */
  val filterContains: Q = Q(
    "q14_filter_contains",
    (s, d) => Tables.part(s, d)
      .filter(lower(col("p_name")).contains("gear"))
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE lower(p_name) LIKE '%gear%' ORDER BY p_partkey"""))

  /** UNION ALL (SURVEY §2.8 — the multi-file scan / pd.concat semantics). */
  val unionAll: Q = Q(
    "q15_union_all",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .unionAll(o.filter(col("o_orderstatus") === "O")
          .select("o_orderkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey", "o_orderstatus")
    },
    Some("""SELECT * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O')
      ORDER BY o_orderkey, o_orderstatus"""))

  /** INTERSECT (distinct semantics on both engines). */
  val intersectKeys: Q = Q(
    "q16_intersect",
    (s, d) => Tables.customer(s, d).select(col("c_custkey").as("custkey"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
      .orderBy("custkey"),
    Some("""SELECT c_custkey AS custkey FROM customer
      INTERSECT SELECT o_custkey AS custkey FROM orders ORDER BY custkey"""))

  /** EXCEPT (distinct semantics on both engines). */
  val exceptKeys: Q = Q(
    "q17_except",
    (s, d) => Tables.customer(s, d).select(col("c_custkey").as("custkey"))
      .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
      .orderBy("custkey"),
    Some("""SELECT c_custkey AS custkey FROM customer
      EXCEPT SELECT o_custkey AS custkey FROM orders ORDER BY custkey"""))

  /** CASE WHEN / conditional bucketing (SURVEY §2.9 when/otherwise). */
  val caseWhenBuckets: Q = Q(
    "q18_case_when",
    (s, d) => Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") >= 300000, "high")
          .when(col("o_totalprice") >= 150000, "mid")
          .otherwise("low"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("bucket"),
    Some(s"""SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
        WHEN o_totalprice >= 150000 THEN 'mid' ELSE 'low' END AS bucket,
      count(*) AS n, ${sqlDsum("o_totalprice")} AS total
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Date functions: year/month extraction + agg (SURVEY §2.9 date). */
  val dateParts: Q = Q(
    "q19_date_parts",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mo"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total_price"))
      .orderBy("yr", "mo"),
    Some(s"""SELECT cast(year(l_shipdate) as int) AS yr,
      cast(month(l_shipdate) as int) AS mo,
      count(*) AS n, ${sqlDsum("l_extendedprice")} AS total_price
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** String scalar functions: lower/upper/length/substring/concat/replace
    * (SURVEY §2.9). */
  val stringFuncs: Q = Q(
    "q20_string_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
      cast(length(p_name) as int) AS name_len, substr(p_name, 1, 5) AS name5,
      concat_ws('|', p_brand, p_type) AS brand_type,
      replace(p_name, ' ', '_') AS name_us
      FROM part ORDER BY p_partkey"""))

  /** min/max/avg aggregates (SURVEY §2.6 column stats). */
  val aggMinMaxAvg: Q = Q(
    "q21_agg_minmax_avg",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        davg(col("l_quantity")).as("avg_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag, min(l_quantity) AS min_qty,
      max(l_quantity) AS max_qty, ${sqlDavg("l_quantity")} AS avg_qty,
      min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** COUNT(DISTINCT) — exact distinct aggregation (SURVEY §2.6). */
  val countDistinctQ: Q = Q(
    "q22_count_distinct",
    (s, d) => Tables.lineitem(s, d)
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps,
      count(DISTINCT l_orderkey) AS n_orders FROM lineitem"""))

  /** Window function: top-3 orders per customer by row_number (beyond the
    * reference surface — SURVEY §2.6 notes it has no window aggs; ours do). */
  val windowRank: Q = Q(
    "q23_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Point lookup by key — first-row fetch (SURVEY §2.7; app.py:189). */
  val pointLookup: Q = Q(
    "q24_point_lookup",
    (s, d) => Tables.orders(s, d)
      .filter(col("o_orderkey") === 42)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey = 42"""))

  /** JSON field extraction (SURVEY §2.9 JSON; producer/consumer
    * to_json/from_json surface, applied to the events.props payload). */
  val jsonExtract: Q = Q(
    "q25_json_extract",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id, cast(json_extract_string(props, '$.k') as int) AS k
      FROM events ORDER BY event_id"""))

  /** Processing-time tumbling-window analog over event time: hourly
    * bucket agg (SURVEY §2.12 batch-equivalent of the 60 s window). */
  val eventsHourly: Q = Q(
    "q26_events_hourly",
    (s, d) => Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("h", "event_type"),
    Some(s"""SELECT date_trunc('hour', ts) AS h, event_type,
      count(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** Sessionization: gap-based sessions (30 min) per user over the event
    * stream — lag + conditional + running-sum windows, then per-session
    * agg. The shuffle key is user_id throughout (one exchange). */
  val sessionization: Q = Q(
    "q27_sessionization",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(running))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    },
    Some("""WITH o AS (
        SELECT user_id, event_id, ts,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      m AS (SELECT user_id, event_id, ts,
          CASE WHEN prev_ts IS NULL
                 OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        FROM o),
      s AS (SELECT user_id, ts,
          cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
        FROM m)
      SELECT user_id, session_id, count(*) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** ROLLUP grouping sets (beyond the reference's flat group-bys). */
  val rollupAgg: Q = Q(
    "q28_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
      ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Math + null-handling scalars: abs/floor/ceil/sqrt/greatest/least/
    * coalesce/nullif (SURVEY §2.9 math & conditional rows). */
  val scalarMath: Q = Q(
    "q29_scalar_math",
    (s, d) => Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc_delta"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
      abs(l_discount - 0.05) AS abs_disc_delta,
      cast(floor(l_extendedprice) as bigint) AS price_floor,
      cast(ceil(l_extendedprice) as bigint) AS price_ceil,
      sqrt(l_quantity) AS qty_sqrt,
      greatest(l_tax, l_discount) AS max_rate,
      least(l_tax, l_discount) AS min_rate,
      coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Array aggregation: per-group sorted value lists (collect_list is
    * order-nondeterministic; sort_array pins it on both engines). The
    * list is emitted as a comma-joined string so the result stays
    * scalar-typed end to end (array cells are not hashable downstream). */
  val arrayAgg: Q = Q(
    "q47_array_agg",
    (s, d) => Tables.nation(s, d)
      .groupBy("n_regionkey")
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey,
      array_to_string(list_sort(list(n_name)), ',') AS nations,
      count(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** String aggregation: sorted concat per group. */
  val stringAgg: Q = Q(
    "q48_string_agg",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(concat_ws(",",
        sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
      string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Statistical moments computed deterministically from exact decimal
    * sums (built-in stddev/corr accumulate doubles in partition order —
    * not reproducible across engines; the explicit formula over exact
    * sums is): variance = (n*sumsq - sum^2) / (n*(n-1)). */
  val statsMoments: Q = Q(
    "q49_stats_moments",
    (s, d) => {
      val sq = col("l_quantity").cast(Dec) * col("l_quantity").cast(Dec)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(Dec)).cast("double").as("s1"),
          sum(sq).cast("double").as("s2"))
        .select(col("l_returnflag"), col("n"),
          col("s1").as("sum_qty"),
          ((col("n") * col("s2") - col("s1") * col("s1")) /
            (col("n") * (col("n") - 1))).as("var_qty"),
          sqrt((col("n") * col("s2") - col("s1") * col("s1")) /
            (col("n") * (col("n") - 1))).as("stddev_qty"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (SELECT l_returnflag, count(*) AS n,
        cast(sum(cast(l_quantity as decimal(18,4))) as double) AS s1,
        cast(sum(cast(l_quantity as decimal(18,4)) * cast(l_quantity as decimal(18,4))) as double) AS s2
      FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n, s1 AS sum_qty,
        (n * s2 - s1 * s1) / (n * (n - 1)) AS var_qty,
        sqrt((n * s2 - s1 * s1) / (n * (n - 1))) AS stddev_qty
      FROM m ORDER BY l_returnflag"""))

  /** Correlated scalar subquery through the SQL entry point — Catalyst
    * decorrelates it into an aggregate + join (SURVEY §4 "built-in if
    * ever needed", exercised here). Exact decimal average keeps the
    * comparison boundary bit-identical across engines. */
  val sqlCorrelated: Q = Q(
    "q60_sql_correlated",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
        WHERE o_totalprice > (
          SELECT 1.2 * cast(sum(cast(o2.o_totalprice as decimal(18,4))) as double)
                     / count(*)
          FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      WHERE o_totalprice > (
        SELECT 1.2 * cast(sum(cast(o2.o_totalprice as decimal(18,4))) as double)
                   / count(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""))

  /** UNION with distinct semantics (complement of q15's UNION ALL). */
  val unionDistinct: Q = Q(
    "q61_union_distinct",
    (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey"""))

  /** Window-function suite: rank/dense_rank/lag/lead/ntile/cume_dist/
    * percent_rank under one totally-ordered window. */
  val windowSuite: Q = Q(
    "q62_window_suite",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cdist"),
          percent_rank().over(w).as("prank"))
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      cast(rank() OVER w as int) AS rnk,
      cast(dense_rank() OVER w as int) AS drnk,
      lag(o_orderkey, 1) OVER w AS prev_order,
      lead(o_orderkey, 1) OVER w AS next_order,
      cast(ntile(4) OVER w as int) AS quartile,
      cume_dist() OVER w AS cdist,
      percent_rank() OVER w AS prank
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, rnk, o_orderkey"""))

  /** Date/time function suite aligned across engine conventions
    * (Spark dayofweek is 1=Sunday vs DuckDB 0=Sunday; Spark trunc →
    * DATE matches DuckDB date_trunc('month') → DATE). */
  val dateSuite: Q = Q(
    "q63_date_suite",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        dayofweek(col("ts")).as("dow"),
        weekday(col("ts")).as("weekday_mon0"),
        quarter(col("ts")).as("qtr"),
        weekofyear(col("ts")).as("week_iso"),
        // timestamp, not raw DATE: date32 surfaces as pandas `object`
        // at the driver boundary (see q105's scaladoc for the rule)
        last_day(col("ts")).cast("timestamp").as("month_end"),
        trunc(col("ts"), "month").cast("timestamp").as("month_start"),
        (col("ts") + expr("INTERVAL 1 MONTH")).as("plus_month"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("days_since"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
      cast(dayofweek(ts) + 1 as int) AS dow,
      cast(isodow(ts) - 1 as int) AS weekday_mon0,
      cast(quarter(ts) as int) AS qtr,
      cast(weekofyear(ts) as int) AS week_iso,
      cast(last_day(ts) as timestamp) AS month_end,
      date_trunc('month', ts) AS month_start,
      ts + INTERVAL 1 MONTH AS plus_month,
      cast(date_diff('day', date '2024-01-01', cast(ts as date)) as int) AS days_since
      FROM events ORDER BY event_id"""))

  /** Exact percentiles WITHOUT a per-group value buffer. Spark's
    * `percentile` is a TypedImperativeAggregate that materializes every
    * group value in executor memory — fine at sf0.1, unbounded at
    * 100 TB. Shape mirrors q113's histogram treatment instead:
    * (1) reduce lineitem to its (flag, price) histogram — one parallel
    * shuffle, |hist| bounded by distinct prices, not row count;
    * (2) per-flag prefix-sum over the AGGREGATED histogram (partitioned
    * window, never over a raw scan); (3) each percentile needs only the
    * values at ranks floor(pos)+1 and ceil(pos)+1 (pos = p·(n−1)),
    * picked by conditional aggregation over the histogram rows whose
    * rank interval [cum_before+1, cum_before+cnt] covers them.
    * Interpolation reproduces the built-in's exact arithmetic —
    * (higher−pos)·lo + (pos−lower)·hi with the higher==lower and
    * lowerKey==higherKey short-circuits (Percentile.getPercentile) —
    * which DuckDB's `quantile_cont` matches bitwise (verified through
    * round 5 while q67 ran on the built-in). */
  val percentiles: Q = {
    val pcts = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    Q(
      "q67_percentiles",
      (s, d) => {
        val hist = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val byFlag = Window.partitionBy("l_returnflag")
        val cum = hist
          .withColumn("cum_before",
            coalesce(sum(col("cnt")).over(byFlag.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(byFlag))
        def rankValue(r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          max(when(col("cum_before") < r &&
            r <= col("cum_before") + col("cnt"), col("v")))
        val picks = pcts.flatMap { case (nm, p) =>
          val pos = lit(p) * (col("n") - 1).cast("double")
          Seq(rankValue(floor(pos) + 1).as(s"lo_$nm"),
            rankValue(ceil(pos) + 1).as(s"hi_$nm"))
        }
        val outs = pcts.map { case (nm, p) =>
          val pos = lit(p) * (col("n") - 1).cast("double")
          val (lower, higher) = (floor(pos), ceil(pos))
          when(higher === lower || col(s"hi_$nm") === col(s"lo_$nm"),
            col(s"lo_$nm"))
            .otherwise((higher.cast("double") - pos) * col(s"lo_$nm") +
              (pos - lower.cast("double")) * col(s"hi_$nm"))
            .as(nm)
        }
        cum.groupBy("l_returnflag")
          .agg(max(col("n")).as("n"), picks: _*)
          .select(col("l_returnflag") +: outs: _*)
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.5) AS p50,
        quantile_cont(l_extendedprice, 0.9) AS p90,
        quantile_cont(l_extendedprice, 0.99) AS p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  }

  /** MERGE/upsert semantics on plain parquet: updated rows replace base
    * rows by key (anti-join + union — the scalable merge when the format
    * has no transactional MERGE INTO). The updates set is derived
    * deterministically from the base table. */
  val mergeUpsert: Q = Q(
    "q68_merge_upsert",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = base.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 0.5).as("o_totalprice"))
      base.join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(updates)
        .orderBy("o_orderkey")
    },
    Some("""WITH upd AS (
        SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 0.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 100 = 0)
      SELECT * FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd)
      ORDER BY o_orderkey"""))

  /** Conditional aggregates: count_if / filtered sums / bool_or / bool_and. */
  val conditionalAggs: Q = Q(
    "q70_conditional_aggs",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_quantity") >= 25).as("n_bulk"),
        dsum(when(col("l_discount") > 0.05, col("l_extendedprice"))
          .otherwise(lit(0.0))).as("discounted_revenue"),
        bool_or(col("l_quantity") >= 49).as("any_huge"),
        bool_and(col("l_quantity") >= 1).as("all_nonzero"))
      .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag,
      cast(count_if(l_quantity >= 25) as bigint) AS n_bulk,
      ${sqlDsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")} AS discounted_revenue,
      bool_or(l_quantity >= 49) AS any_huge,
      bool_and(l_quantity >= 1) AS all_nonzero
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Extended string scalars: pad/trim/translate/repeat/reverse/split_part. */
  val stringSuite2: Q = Q(
    "q71_string_suite2",
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_brand"), 12, ".").as("brand_padded"),
        translate(col("p_type"), "AEO", "aeo").as("type_translated"),
        repeat(lit("-"), 5).as("dashes"),
        reverse(col("p_name")).as("name_rev"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        ltrim(rtrim(concat(lit("  "), col("p_brand"), lit("  ")))).as("trimmed"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
      lpad(cast(p_partkey as varchar), 8, '0') AS key_padded,
      rpad(p_brand, 12, '.') AS brand_padded,
      translate(p_type, 'AEO', 'aeo') AS type_translated,
      repeat('-', 5) AS dashes,
      reverse(p_name) AS name_rev,
      split_part(p_name, ' ', 1) AS first_word,
      ltrim(rtrim('  ' || p_brand || '  ')) AS trimmed
      FROM part ORDER BY p_partkey"""))

  /** Bitwise scalar operators over integer keys. */
  val bitwiseOps: Q = Q(
    "q72_bitwise_ops",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("low_byte"),
        (col("o_orderkey").bitwiseOR(lit(4096L))).as("with_flag"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("key_xor"),
        shiftleft(col("o_orderkey"), 2).as("shl2"),
        shiftright(col("o_orderkey"), 3).as("shr3"),
        expr("bit_count(o_orderkey)").cast("int").as("popcount"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      o_orderkey & 255 AS low_byte,
      o_orderkey | 4096 AS with_flag,
      xor(o_orderkey, o_custkey) AS key_xor,
      o_orderkey << 2 AS shl2,
      o_orderkey >> 3 AS shr3,
      cast(bit_count(o_orderkey) as int) AS popcount
      FROM orders ORDER BY o_orderkey"""))

  /** Explicit GROUPING SETS with grouping() markers (via the SQL entry
    * point; complements q28's ROLLUP). */
  val groupingSets: Q = Q(
    "q73_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(s"""SELECT o_orderstatus, o_orderpriority,
        cast(grouping(o_orderstatus) as int) AS g_status,
        cast(grouping(o_orderpriority) as int) AS g_prio,
        count(*) AS n,
        ${Dsl.sqlDsum("o_totalprice")} AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
          o_orderpriority NULLS FIRST""")
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      cast(grouping(o_orderstatus) as int) AS g_status,
      cast(grouping(o_orderpriority) as int) AS g_prio,
      count(*) AS n,
      ${sqlDsum("o_totalprice")} AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        o_orderpriority NULLS FIRST"""))

  /** q92 — MAP-typed analytics: per-user event_type→count map built with
    * map_from_entries over sorted entries (deterministic key order), then
    * interrogated with the map higher-order functions (map_keys,
    * map_values + aggregate fold, map_filter) and rendered compact via
    * to_json. The oracle builds the identical JSON text with an ordered
    * string_agg. Scale: one hash agg per (user, type), one per user —
    * both map-side combinable; the map lives only inside a row. */
  val eventTypeMap: Q = Q(
    "q92_event_type_map",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(map_keys(col("m"))).as("n_types"),
        aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x)
          .as("total_events"),
        size(map_keys(map_filter(col("m"), (_, v) => v >= 5)))
          .as("n_hot_types"),
        to_json(col("m")).as("type_counts_json"))
      .orderBy("user_id"),
    Some("""WITH g AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type)
      SELECT user_id,
        cast(count(*) as int) AS n_types,
        cast(sum(n) as bigint) AS total_events,
        cast(count_if(n >= 5) as int) AS n_hot_types,
        '{' || string_agg('"' || event_type || '":' || n, ','
          ORDER BY event_type) || '}' AS type_counts_json
      FROM g GROUP BY user_id ORDER BY user_id"""))

  /** q93 — CUBE (all 2^k grouping combinations; completes the rollup/
    * grouping-sets family of q28/q73). */
  val cubeAgg: Q = Q(
    "q93_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus")),
    Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
      ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** q94 — window FRAME specifications (the piece of the window surface
    * q62 doesn't cover): a value-based RANGE frame (trailing 1 hour — set
    * defined by ORDER-BY values, so ties are included wholly and the
    * result is deterministic without a tiebreak) and a ROWS frame
    * (3-row moving sum — order-dependent, so the ORDER BY carries
    * event_id as a total tiebreak). Sums are exact decimal → double. */
  val windowFrames: Q = Q(
    "q94_window_frames",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql("""SELECT event_id, user_id,
          count(*) OVER (PARTITION BY user_id
            ORDER BY unix_seconds(ts)
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour,
          cast(sum(cast(value as decimal(18,4))) OVER (PARTITION BY user_id
            ORDER BY unix_seconds(ts)
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as double)
            AS val_last_hour,
          cast(sum(cast(value as decimal(18,4))) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double)
            AS val_3row
        FROM events_v ORDER BY event_id""")
    },
    Some("""SELECT event_id, user_id,
        count(*) OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts) // 1000000
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour,
        cast(sum(cast(value as decimal(18,4))) OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts) // 1000000
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) as double)
          AS val_last_hour,
        cast(sum(cast(value as decimal(18,4))) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double)
          AS val_3row
      FROM events ORDER BY event_id"""))

  /** q101 — UNPIVOT/melt (inverse of q46's pivot): wide metric columns
    * to long (key, metric, value) rows. Narrow per-row transform (stays
    * in codegen); output 3× input rows, no shuffle until the ORDER BY. */
  val unpivotMetrics: Q = Q(
    "q101_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric"),
    Some("""SELECT l_orderkey, l_linenumber, metric, value
      FROM (SELECT l_orderkey, l_linenumber, l_quantity,
              l_extendedprice, l_discount FROM lineitem)
      UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
      ORDER BY l_orderkey, l_linenumber, metric"""))

  /** q102 — native session_window sessionization (UpdatingSessions exec;
    * the operator q27 builds manually from lag + running sum). Gap
    * semantics are strict: a new event merges iff its ts is < previous
    * end (= last ts + gap), so the oracle breaks at diff >= 1800 s —
    * note q27's manual variant breaks at diff > 1800 s; both are valid
    * conventions, pinned here to Spark's native one. */
  val sessionWindowAgg: Q = Q(
    "q102_session_window",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start"),
    Some("""WITH o AS (
        SELECT user_id, event_id, ts,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      m AS (
        SELECT user_id, event_id, ts,
          CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
               THEN 1 ELSE 0 END AS new_s
        FROM o),
      x AS (
        SELECT user_id, ts,
          cast(sum(new_s) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as bigint) AS sid
        FROM m)
      SELECT user_id,
        min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events
      FROM x GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** q105 — SCD Type-2 versioned upsert (q68's history-keeping sibling):
    * changed keys close the old version (valid_to = change date) and
    * open a new one; unchanged keys stay open-ended. The update set is
    * derived deterministically (keys ≡ 0 mod 10 get price + 5.0000 —
    * exact decimal addition, no cross-engine rounding). One broadcast-
    * sized change set + a union: at scale this is a map-side join plus
    * an append, never a rewrite of unchanged history.
    * Output-boundary rule: the internal math stays DECIMAL(18,4) for
    * exactness, but the emitted columns are double/timestamp — raw
    * DECIMAL and DATE parquet columns surface as pandas `object` cells
    * while DuckDB surfaces float64/datetime64, so the driver's
    * dtype-sensitive hash would diverge on bit-identical values. */
  val scd2Upsert: Q = {
    val changeDate = "DATE '2025-01-01'"
    Q(
      "q105_scd2",
      (s, d) => {
        val base = Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"),
            col("p_retailprice").cast(Dec).as("price"))
        val changed = col("p_partkey") % 10 === 0
        val oldRows = base.select(
          col("p_partkey"), col("p_name"),
          col("price").cast("double").as("price"),
          to_date(lit("1900-01-01")).cast("timestamp").as("valid_from"),
          when(changed, to_date(lit("2025-01-01")).cast("timestamp"))
            .otherwise(lit(null).cast("timestamp")).as("valid_to"))
        val newRows = base.filter(changed).select(
          col("p_partkey"), col("p_name"),
          (col("price") + lit(BigDecimal("5.0000"))).cast(Dec)
            .cast("double").as("price"),
          to_date(lit("2025-01-01")).cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        oldRows.unionAll(newRows)
          .orderBy("p_partkey", "valid_from")
      },
      Some(s"""WITH base AS (
          SELECT p_partkey, p_name,
            cast(p_retailprice as decimal(18,4)) AS price
          FROM part)
        SELECT p_partkey, p_name, cast(price as double) AS price,
          TIMESTAMP '1900-01-01 00:00:00' AS valid_from,
          CASE WHEN p_partkey % 10 = 0
            THEN cast($changeDate as timestamp) END AS valid_to
        FROM base
        UNION ALL
        SELECT p_partkey, p_name,
          cast(cast(price + 5.0000 as decimal(18,4)) as double) AS price,
          cast($changeDate as timestamp) AS valid_from,
          cast(NULL as timestamp) AS valid_to
        FROM base WHERE p_partkey % 10 = 0
        ORDER BY p_partkey, valid_from"""))
  }

  /** q106 — order-independent table checksum: Σ row-hash mod 2^61 in one
    * aggregate. THE tool for verifying a 100 TB copy/migration without
    * sorting anything — commutative addition means any partitioning and
    * any row order produce the same value on both sides of the copy.
    * Doubles enter the row string as fixed-scale decimals and the
    * timestamp as epoch seconds so both engines render identical text. */
  val tableChecksum: Q = {
    def sparkRowHash = md5h61(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(Dec).cast("string"),
      col("l_extendedprice").cast(Dec).cast("string"),
      col("l_discount").cast(Dec).cast("string"),
      col("l_returnflag"), col("l_linestatus"),
      // l_shipdate is TIMESTAMP_NTZ; the session runs UTC, so the cast
      // interprets it as UTC — matching DuckDB's naive epoch()
      unix_seconds(col("l_shipdate").cast("timestamp")).cast("string")))
    val sqlRowHash = sqlMd5h61("concat_ws('|', l_orderkey, l_linenumber," +
      " cast(cast(l_quantity as decimal(18,4)) as varchar)," +
      " cast(cast(l_extendedprice as decimal(18,4)) as varchar)," +
      " cast(cast(l_discount as decimal(18,4)) as varchar)," +
      " l_returnflag, l_linestatus, epoch_us(l_shipdate) // 1000000)")
    Q(
      "q106_table_checksum",
      (s, d) => Tables.lineitem(s, d)
        .select(sparkRowHash.as("h"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            % lit(BigDecimal(H61Mod))).cast("long").as("checksum")),
      Some(s"""SELECT count(*) AS n_rows,
          cast(sum($sqlRowHash)::hugeint % $H61Mod as bigint) AS checksum
        FROM lineitem"""))
  }

  /** q110 — TPC-H Q3 shape (shipping-priority): selective dimension
    * filter + two date predicates + 3-way join + grouped revenue +
    * top-10. The classic "filter early, join the survivors" plan:
    * the segment filter prunes customer before its join, both date
    * filters push to the scans, and the final top-10 is a
    * TakeOrderedAndProject, never a full sort. */
  val tpchQ3: Q = Q(
    "q110_tpch_q3",
    (s, d) => Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") < to_timestamp(lit("1997-06-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") > to_timestamp(lit("1997-06-01 00:00:00"))),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10),
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""))

  /** q111 — TPC-H Q5 shape (local-supplier volume): 4-way join with the
    * extra same-nation constraint between two dimension paths. The
    * constraint is an equi-condition, so Catalyst keeps everything
    * hash-partitioned joins; nation broadcasts. */
  val tpchQ5: Q = Q(
    "q111_tpch_q5",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name")),
    Some(s"""SELECT n_name,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** q112 — groupwise checksum (q106 sharded by ship month): when the
    * global checksum diverges after a copy, this localizes WHICH slice
    * to re-transfer — one hash agg keyed on the partition column, still
    * order-independent within each group. */
  val groupChecksum: Q = {
    def sparkRowHash = md5h61(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(Dec).cast("string"),
      col("l_extendedprice").cast(Dec).cast("string"),
      col("l_discount").cast(Dec).cast("string"),
      col("l_returnflag"), col("l_linestatus"),
      unix_seconds(col("l_shipdate").cast("timestamp")).cast("string")))
    val sqlRowHash = sqlMd5h61("concat_ws('|', l_orderkey, l_linenumber," +
      " cast(cast(l_quantity as decimal(18,4)) as varchar)," +
      " cast(cast(l_extendedprice as decimal(18,4)) as varchar)," +
      " cast(cast(l_discount as decimal(18,4)) as varchar)," +
      " l_returnflag, l_linestatus, epoch_us(l_shipdate) // 1000000)")
    Q(
      "q112_group_checksum",
      (s, d) => Tables.lineitem(s, d)
        .select(date_trunc("month", col("l_shipdate")).as("ship_month"),
          sparkRowHash.as("h"))
        .groupBy("ship_month")
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            % lit(BigDecimal(H61Mod))).cast("long").as("checksum"))
        .orderBy("ship_month"),
      Some(s"""SELECT date_trunc('month', l_shipdate) AS ship_month,
          count(*) AS n_rows,
          cast(sum($sqlRowHash)::hugeint % $H61Mod as bigint) AS checksum
        FROM lineitem GROUP BY ship_month ORDER BY ship_month"""))
  }

  /** q113 — equi-depth deciles (the length-stratification report for
    * balancing training shards), bit-identical to `ntile(10) OVER
    * (ORDER BY n_chars, doc_id)` but WITHOUT the global window: ntile
    * over a raw scan routes the whole table through ONE task's sort —
    * correct at sf0.1, a single-reducer bottleneck at 100 TB.
    *
    * Scale-safe shape: (1) reduce the table to its n_chars histogram
    * (one parallel shuffle; |hist| = distinct lengths, bounded by max
    * doc length, not by corpus size); (2) prefix-sum the histogram —
    * the only unpartitioned window left, and it runs over the
    * AGGREGATED frame, never the raw scan; (3) intersect each
    * histogram run's rank interval with the ten ntile rank ranges via
    * a broadcast join of a 10-row bounds frame. ntile's boundaries are
    * pure rank arithmetic — with q = n/10, rem = n%10, bucket b spans
    * ranks [(b-1)q + min(b-1,rem) + 1, bq + min(b,rem)] — and the
    * doc_id tiebreak never crosses an n_chars value, so every decile
    * stat is derivable from the histogram alone: no per-row decile
    * assignment, no second scan, no skew exposure. */
  val equidepthDeciles: Q = Q(
    "q113_equidepth_deciles",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("n_chars"))
      val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
      val cum = hist.withColumn("cum_before",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // total from the histogram, not a second raw-scan count: AQE
      // reuses hist's exchange for this branch, so documents is read
      // once (Σcnt ≡ count(*) exactly; coalesce keeps the empty-table
      // case at 0 like count(*) would, not NULL-propagated bounds)
      val total = hist.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
      val bounds = s.range(1, 11)
        .select(col("id").cast("int").as("decile"))
        .crossJoin(broadcast(total))
        .select(col("decile"),
          (col("n") / lit(10)).cast("long").as("tq"),
          (col("n") % lit(10)).as("rem"))
        .select(col("decile"),
          ((col("decile") - 1) * col("tq") +
            least(col("decile") - 1, col("rem")) + 1).as("lo"),
          (col("decile") * col("tq") +
            least(col("decile"), col("rem"))).as("hi"))
      cum.join(broadcast(bounds),
          col("cum_before") < col("hi") &&
            col("cum_before") + col("cnt") >= col("lo"))
        .groupBy("decile")
        .agg((max(col("hi")) - max(col("lo")) + 1).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("decile")
    },
    Some("""WITH t AS (
        SELECT n_chars,
          ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        FROM documents)
      SELECT decile, count(*) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM t GROUP BY decile ORDER BY decile"""))

  /** q114 — Pearson correlation from EXACT decimal sums: built-in corr()
    * accumulates co-moments in doubles (order-dependent last-ulp drift
    * across engines/partitionings), so the classic formula is evaluated
    * over exact Σx, Σy, Σxy, Σx², Σy² instead — every double op in the
    * final expression is identical on both engines. */
  val correlation: Q = {
    val sq = org.apache.spark.sql.types.DecimalType(38, 8)
    Q(
      "q114_correlation",
      (s, d) => {
        // decimal -> double via an int+frac split: DuckDB's cast of an
        // int128-scaled decimal converts the scaled integer to double
        // BEFORE dividing by the scale, so a >2^53 scaled sum loses its
        // fraction (observed at sf0.1); Spark's BigDecimal cast rounds
        // correctly. Splitting keeps every converted part exact (<2^53)
        // and both engines then run the identical IEEE add.
        def splitDbl(c: org.apache.spark.sql.Column) =
          floor(c).cast("double") + (c - floor(c)).cast("double")
        Tables.lineitem(s, d)
        .select(col("l_quantity").cast(Dec).as("x"),
          col("l_extendedprice").cast(Dec).as("y"))
        .agg(count(lit(1)).as("n"),
          splitDbl(sum(col("x"))).as("sx"),
          splitDbl(sum(col("y"))).as("sy"),
          splitDbl(sum((col("x") * col("y")).cast(sq))).as("sxy"),
          splitDbl(sum((col("x") * col("x")).cast(sq))).as("sxx"),
          splitDbl(sum((col("y") * col("y")).cast(sq))).as("syy"))
        .select(col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"))
      },
      Some("""WITH g AS (
          SELECT n,
            cast(floor(sx0) as double) + cast(sx0 - floor(sx0) as double) AS sx,
            cast(floor(sy0) as double) + cast(sy0 - floor(sy0) as double) AS sy,
            cast(floor(sxy0) as double) + cast(sxy0 - floor(sxy0) as double) AS sxy,
            cast(floor(sxx0) as double) + cast(sxx0 - floor(sxx0) as double) AS sxx,
            cast(floor(syy0) as double) + cast(syy0 - floor(syy0) as double) AS syy
          FROM (SELECT count(*) AS n,
            sum(cast(l_quantity as decimal(18,4))) AS sx0,
            sum(cast(l_extendedprice as decimal(18,4))) AS sy0,
            sum(cast(l_quantity as decimal(19,4)) *
              cast(l_extendedprice as decimal(19,4))) AS sxy0,
            sum(cast(l_quantity as decimal(19,4)) *
              cast(l_quantity as decimal(19,4))) AS sxx0,
            sum(cast(l_extendedprice as decimal(19,4)) *
              cast(l_extendedprice as decimal(19,4))) AS syy0
          FROM lineitem))
        SELECT n,
          ((n * sxy - sx * sy) /
            sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
          AS corr_qty_price
        FROM g"""))
  }

  /** q117 — TPC-H Q18 shape (large-volume customer): orders whose total
    * quantity exceeds a threshold, joined back to customer, top-100 by
    * price. The group-HAVING runs FIRST on lineitem alone (partial aggs
    * map-side), and only the tiny survivor set (~1% of orders) joins
    * against orders/customer; the top-100 is a TakeOrderedAndProject.
    * At 100 TB the big table is touched exactly once, by one
    * map-side-combined hash agg. The survivor join carries NO broadcast
    * hint: the survivor count is threshold-dependent (a lower HAVING
    * cut, or a skewed corpus, could make it arbitrarily large), so AQE
    * decides from the MEASURED post-aggregation size at runtime —
    * PlanAuditSpec asserts it does pick the broadcast at test scale. */
  val tpchQ18: Q = Q(
    "q117_tpch_q18",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some(s"""WITH big AS (
        SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING ${sqlDsum("l_quantity")} > 250.0)
      SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
        sum_qty
      FROM orders
      JOIN big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
    bench = true)

  /** q118 — TPC-H Q4 shape (order-priority checking): orders with at
    * least one lineitem shipped > 30 days after the order date, counted
    * by priority. The EXISTS is a LEFT SEMI join — each qualifying order
    * counts once no matter how many late lines it has — with the
    * non-equi lateness predicate evaluated inside the join, never as a
    * post-join filter over duplicated rows. */
  val tpchQ4: Q = Q(
    "q118_tpch_q4",
    (s, d) => Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS n_late
      FROM orders o
      WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** q122 — TPC-H Q10 shape (returned-item reporting): one selective
    * order window + a returnflag filter pushed to the fact scan, then
    * customer/nation enrichment and a revenue top-20. Both filters
    * reach their scans as PushedFilters; the final top-k is a
    * TakeOrderedAndProject, never a full sort. */
  val tpchQ10: Q = Q(
    "q122_tpch_q10",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20),
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** q123 — TPC-H Q14 shape (promotion effect): conditional share of
    * revenue over one ship month. The month predicate prunes the fact
    * scan; the part join carries no hint (part is a dimension that
    * grows with scale — AQE sizes it); the division is one IEEE op over
    * two exact decimal sums, so the engines agree bit-for-bit. */
  val tpchQ14: Q = Q(
    "q123_tpch_q14",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-02-01 00:00:00")))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0))) /
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("promo_revenue_pct")),
    Some(s"""SELECT 100.0 * ${sqlDsum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} /
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS promo_revenue_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'"""))

  /** q124 — TPC-H Q19 shape (discounted revenue, disjunctive
    * predicates): an OR of brand/size/quantity conjunctions. The join
    * key is shared across branches so the plan stays ONE equi-join with
    * the disjunction as a post-join filter plus per-side pushed
    * conjuncts (p_size ranges reach the part scan) — never a union of
    * three scans of the fact table. */
  val tpchQ19: Q = Q(
    "q124_tpch_q19",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50)))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_lines")),
    Some(s"""SELECT ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
        count(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
          AND l_quantity BETWEEN 10 AND 35)
         OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
          AND l_quantity BETWEEN 20 AND 50)"""))

  /** q125 — TPC-H Q21 shape (suppliers who kept orders waiting),
    * adapted to this schema's columns (lateness = shipped > 60 days
    * after the order date): suppliers whose late order had other
    * suppliers on it (EXISTS → left-semi) none of whom were also late
    * (NOT EXISTS → left-anti). Both subqueries are equi-joins on the
    * order key with the supplier inequality inside the join condition —
    * the fact table is never crossed with itself. */
  val tpchQ21: Q = Q(
    "q125_tpch_q21",
    (s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
        .distinct()
      val withOthers = late.join(li,
        late("okey") === li("l_orderkey") && late("skey") =!= li("l_suppkey"),
        "left_semi")
      val lateTwin = late.select(col("okey").as("okey3"), col("skey").as("skey3"))
      val soleLate = withOthers.join(lateTwin,
        col("okey") === col("okey3") && col("skey") =!= col("skey3"),
        "left_anti")
      soleLate.join(Tables.supplier(s, d), col("skey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""WITH late AS (
        SELECT DISTINCT l_orderkey AS okey, l_suppkey AS skey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
      SELECT s_name, count(*) AS numwait
      FROM late l1 JOIN supplier ON l1.skey = s_suppkey
      WHERE EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.okey AND l2.l_suppkey <> l1.skey)
        AND NOT EXISTS (SELECT 1 FROM late l3
          WHERE l3.okey = l1.okey AND l3.skey <> l1.skey)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** q189 — mergeable-rollup maintenance: two PARTIAL aggregate states
    * over disjoint halves of the event stream (split by event_id
    * parity — the "yesterday's rollup + today's delta" shape with
    * overlapping group keys) merged into the exact global rollup by
    * state algebra alone: n = n₁+n₂, Σ = Σ₁+Σ₂ (exact decimal),
    * min = least, max = greatest. This is THE incremental pattern that
    * makes a 100 TB daily rollup affordable — the day's delta is
    * aggregated alone and merged into the standing state table, never
    * recomputing history — and the ORACLE IS the direct full
    * recompute, so merge ≡ recompute is hash-proven, not asserted.
    *
    * Scale shape: each branch is one map-side-combinable groupBy on
    * (day, event_type); the full-outer merge joins on the grouping key
    * both branches are already hash-partitioned by (no extra
    * exchange). Avg is NOT carried as a state — it is derived from
    * (Σ, n) after the merge, the textbook mergeable-state rule. */
  val rollupMerge: Q = {
    def partial(df: org.apache.spark.sql.DataFrame, pfx: String) = df
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as(s"${pfx}_n"),
        sum(col("value").cast(Dec)).as(s"${pfx}_sum"),
        min(col("value")).as(s"${pfx}_min"),
        max(col("value")).as(s"${pfx}_max"))
    Q(
      "q189_rollup_merge",
      (s, d) => {
        val ev = Tables.events(s, d)
        val a = partial(ev.filter(pmod(col("event_id"), lit(2)) === 0), "a")
        val b = partial(ev.filter(pmod(col("event_id"), lit(2)) === 1), "b")
        a.join(b, Seq("day", "event_type"), "full_outer")
          .select(col("day"), col("event_type"),
            (coalesce(col("a_n"), lit(0L)) + coalesce(col("b_n"), lit(0L)))
              .as("n_events"),
            splitDbl(coalesce(col("a_sum"), lit(BigDecimal(0)).cast(Dec))
              + coalesce(col("b_sum"), lit(BigDecimal(0)).cast(Dec)))
              .as("sum_value"),
            least(col("a_min"), col("b_min")).as("min_value"),
            greatest(col("a_max"), col("b_max")).as("max_value"))
          .orderBy("day", "event_type")
      },
      // the direct, non-incremental rollup: equality proves the merge
      Some(s"""SELECT date_trunc('day', ts) AS day, event_type,
          count(*) AS n_events, ${sqlDsum("value")} AS sum_value,
          min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
  }

  /** q192 — watermark-lateness audit: the out-of-orderness profile that
    * SIZES a streaming watermark (`withWatermark(delay)` admits an
    * event iff its lateness vs the running event-time max is under the
    * delay — this query reports that lateness distribution, so the
    * delay is chosen from data, not folklore). The driver's events
    * arrive in perfect event-time order, so the wire is SIMULATED:
    * arrival = ts ± up to 60 s of salted-hash jitter, a pure function
    * of event_id (q77 discipline), replayed identically by the twin.
    *
    * Lateness needs a RUNNING max over arrival order — inherently
    * sequential, and a naive `max OVER (ORDER BY arrival)` funnels
    * 100 TB through one task's sort. The q113/q173 histogram
    * discipline instead: 60-second arrival buckets; within-bucket
    * running max is a window over time-bounded partitions;
    * cross-bucket prefix max is a window over the AGGREGATED frame
    * (one row per minute); an event's predecessor max = greatest of
    * the two. The ORACLE IS the naive global window, so the
    * decomposition is hash-proven equivalent, not asserted (the q173
    * pattern). All lateness math in exact integer microseconds (the
    * epoch_us discipline). */
  val latenessAudit: Q = {
    Q(
      "q192_lateness_audit",
      (s, d) => {
        graft.functions.TextFunctions.register(s)
        // the driver's events arrive in perfect event-time order, so the
        // stream is SIMULATED as network-reordered: arrival time = ts ±
        // up to 60 s of salted-hash jitter (the q77 discipline — a pure
        // function of event_id, so both engines replay the same wire)
        val jit = md5h61(concat(lit("arr:"), col("event_id").cast("string"))) %
          lit(120000000L) - lit(60000000L)
        // canonical-exchange treatment (the q171/q145 discipline):
        // both branches below — the within-bucket window and the
        // per-bucket max aggregate — need the SAME hash partitioning
        // on bkt, so shuffle ONCE and let ReuseExchange collapse the
        // two branches onto a single events scan. Two traps to dodge:
        // (1) the repartition must sit BELOW the akey/bkt projections
        // (partition by the raw expression, alias above it) — else
        // column pruning pushes each branch's narrower projection
        // under its own exchange copy and de-canonicalizes them;
        // (2) the bkt null-guard goes at the shared source, so the
        // join's inferred isnotnull(bkt) is already a constraint on
        // both sides and never pushes into just one branch's scan
        // (the q133 trap). ProjectExec's alias-aware partitioning
        // rewrites hashpartitioning(div-expr) → hashpartitioning(bkt),
        // so neither the window nor the groupBy adds an exchange.
        val akeyC = col("tus") + jit
        val bktC = call_function("div", akeyC, lit(60000000L))
        val ev = Tables.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("tus"))
          .filter(bktC.isNotNull)
          .repartition(bktC)
          .withColumn("akey", akeyC)
          .withColumn("bkt", bktC)
        val wIn = Window.partitionBy("bkt").orderBy("akey", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val withPrevIn = ev.withColumn("prev_in", max(col("tus")).over(wIn))
        val bAgg = ev.groupBy("bkt").agg(max(col("tus")).as("bmax"))
        val wB = Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val bPrev = bAgg.withColumn("prev_b", max(col("bmax")).over(wB))
          .select("bkt", "prev_b")
        val late = withPrevIn.join(bPrev, "bkt")
          .withColumn("prev", greatest(col("prev_in"), col("prev_b")))
          .withColumn("late_us",
            when(col("prev").isNull || col("prev") <= col("tus"), 0L)
              .otherwise(col("prev") - col("tus")))
        late
          .withColumn("ord",
            when(col("late_us") === 0, 0)
              .when(col("late_us") < 1000000L, 1)
              .when(col("late_us") < 10000000L, 2)
              .when(col("late_us") < 60000000L, 3)
              .when(col("late_us") < 600000000L, 4)
              .when(col("late_us") < 3600000000L, 5).otherwise(6))
          .groupBy("ord")
          .agg(count(lit(1)).as("n_events"),
            (max(col("late_us")).cast("long")).as("max_late_us"))
          .orderBy("ord")
      },
      // the naive global running max IS the oracle: hash equality
      // proves the bucket decomposition
      Some(s"""WITH e AS (SELECT event_id, epoch_us(ts) AS tus,
            epoch_us(ts) + ${sqlMd5h61("concat('arr:', event_id)")} %
              120000000 - 60000000 AS akey
          FROM events),
        r AS (SELECT event_id, tus,
            max(tus) OVER (ORDER BY akey, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
          FROM e),
        l AS (SELECT CASE WHEN prev IS NULL OR prev <= tus THEN 0
            ELSE prev - tus END AS late_us FROM r)
        SELECT CASE WHEN late_us = 0 THEN 0
            WHEN late_us < 1000000 THEN 1
            WHEN late_us < 10000000 THEN 2
            WHEN late_us < 60000000 THEN 3
            WHEN late_us < 600000000 THEN 4
            WHEN late_us < 3600000000 THEN 5 ELSE 6 END AS ord,
          count(*) AS n_events,
          cast(max(late_us) as bigint) AS max_late_us
        FROM l GROUP BY 1 ORDER BY 1"""))
  }

  /** q200 — per-user sliding-window burst audit (the rate-limit /
    * abuse-detection shape): for every event, how many events the SAME
    * user emitted in the closed 60 s window ending at it; per user,
    * the peak burst and how many events ran hot (burst ≥ 10). The
    * naive form — `count OVER (PARTITION BY user ORDER BY ts RANGE 60 s
    * PRECEDING)` — puts a user's whole LIFETIME in one task's sort
    * (a bot emitting 10/s for a year is 300M rows); the q192 bucket
    * decomposition bounds it instead: a 60 s window ending in minute
    * bucket b can only reach events in buckets b and b−1, so burst =
    * (within-bucket range count) + (membership count against bucket
    * b−1's timestamp list, a bounded array). Partitions are (user,
    * minute) — bounded by 2 minutes of per-user rate, never lifetime.
    * The ORACLE IS the naive global-per-user window, so the
    * decomposition is hash-proven equivalent (the q173/q192 pattern).
    * All comparisons in exact integer microseconds. */
  val burstAudit: Q = {
    Q(
      "q200_burst_audit",
      (s, d) => {
        // q192 canonical-exchange discipline: partition by the RAW
        // (user, minute-bucket) expressions below the projections and
        // guard nulls at the source, so the within-bucket window and
        // the neighbor-list aggregate reuse ONE events scan
        val tusC = unix_micros(col("ts"))
        val bktC = call_function("div", tusC, lit(60000000L))
        // the (bktC + 1) guard looks redundant — it is, semantically —
        // but the left join's inferred isnotnull(bkt + 1) would
        // otherwise push into only the neighbor-list branch's scan and
        // de-canonicalize the shared exchange (the q133 trap, in its
        // shifted-join-key form); with it at the source both scans are
        // identical and the inference is pruned as already-guaranteed
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"))
          .filter(col("user_id").isNotNull && bktC.isNotNull &&
            (bktC + lit(1L)).isNotNull)
          .repartition(col("user_id"), bktC)
          .withColumn("tus", tusC)
          .withColumn("bkt", bktC)
          .select("user_id", "tus", "bkt")
        val wIn = Window.partitionBy("user_id", "bkt").orderBy("tus")
          .rangeBetween(-60000000L, 0L)
        val withIn = ev.withColumn("n_in", count(lit(1)).over(wIn))
        val prevLists = ev.groupBy("user_id", "bkt")
          .agg(collect_list(col("tus")).as("pl"))
          .select(col("user_id"), (col("bkt") + 1).as("bkt"), col("pl"))
        val burst = withIn
          .join(prevLists, Seq("user_id", "bkt"), "left")
          .withColumn("n_prev",
            when(col("pl").isNull, lit(0))
              .otherwise(size(filter(col("pl"),
                x => x >= col("tus") - lit(60000000L)))))
          .withColumn("burst", col("n_in") + col("n_prev"))
        burst.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max(col("burst")).as("max_burst"),
            sum(when(col("burst") >= 10, 1L).otherwise(0L)).as("n_hot"))
          .orderBy("user_id")
      },
      // the naive per-user lifetime window IS the oracle: hash
      // equality proves the two-bucket decomposition
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events
            WHERE user_id IS NOT NULL),
          b AS (SELECT user_id,
              count(*) OVER (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW)
                AS burst
            FROM e)
          SELECT user_id, cast(count(*) as bigint) AS n_events,
            cast(max(burst) as bigint) AS max_burst,
            cast(sum(CASE WHEN burst >= 10 THEN 1 ELSE 0 END) as bigint)
              AS n_hot
          FROM b GROUP BY user_id ORDER BY user_id"""))
  }

  /** q226 — ordered conversion funnel (signup → first click AFTER the
    * signup → first purchase AFTER that click) with strict event-time
    * ordering per user — the sequence-matching upgrade of q65: q65
    * compares each type's GLOBAL first timestamp, so a stray click
    * before the signup makes the whole funnel a false negative, and a
    * purchase between signup and the qualifying click a false
    * positive; here each stage re-anchors on the previous stage's
    * time, the textbook funnel semantics.
    *
    * Scale shape: ONE shuffle on user_id collecting each user's
    * (ts, type) pairs, then the whole funnel is a doc-local array
    * computation inside one projection (filter/array_min chains — the
    * q188 in-expression discipline; per-user event counts are bounded
    * by the retention window in any real deployment, ≤ 99 in this
    * corpus); the final readout is a single global aggregate row of
    * exact integer counts/gap-sums plus per-stage IEEE ratios. The
    * min-of-filtered-set formulation is ORDER-INDEPENDENT, so
    * collect_list's nondeterministic ordering cannot leak into the
    * result. */
  val eventFunnel: Q = Q(
    "q226_event_funnel",
    (s, d) => {
      def tsOf(cond: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        (evs: org.apache.spark.sql.Column) => array_min(transform(
          filter(evs, e => cond(e)), e => e.getField("tus")))
      val byUser = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
          col("event_type").as("typ"))
        .groupBy("user_id")
        .agg(collect_list(struct(col("tus"), col("typ"))).as("evs"))
      val t1 = tsOf(e => e.getField("typ") === "signup")(col("evs"))
      val st = byUser.select(col("user_id"), col("evs"), t1.as("t1"))
        .withColumn("t2", tsOf(e => e.getField("typ") === "click"
          && e.getField("tus") > col("t1"))(col("evs")))
        .withColumn("t3", tsOf(e => e.getField("typ") === "purchase"
          && e.getField("tus") > col("t2"))(col("evs")))
      st.agg(count(lit(1)).cast("long").as("n_users"),
          count(col("t1")).cast("long").as("n_signup"),
          count(col("t2")).cast("long").as("n_click_after"),
          count(col("t3")).cast("long").as("n_purchase_after"),
          sum(when(col("t2").isNotNull, col("t2") - col("t1")))
            .cast("long").as("sum_gap12_us"),
          sum(when(col("t3").isNotNull, col("t3") - col("t2")))
            .cast("long").as("sum_gap23_us"))
        .select(col("n_users"), col("n_signup"), col("n_click_after"),
          col("n_purchase_after"), col("sum_gap12_us"),
          col("sum_gap23_us"),
          when(col("n_users") > 0, col("n_signup").cast("double")
            / col("n_users")).as("conv_signup"),
          when(col("n_signup") > 0, col("n_click_after").cast("double")
            / col("n_signup")).as("conv_click"),
          when(col("n_click_after") > 0,
            col("n_purchase_after").cast("double")
              / col("n_click_after")).as("conv_purchase"))
    },
    Some("""WITH b AS (SELECT user_id,
          list(struct_pack(tus := epoch_us(ts), typ := event_type)) AS evs
          FROM events GROUP BY 1),
        s1 AS (SELECT user_id, evs, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'signup'),
            e -> e['tus'])) AS t1 FROM b),
        s2 AS (SELECT user_id, evs, t1, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'click' AND e['tus'] > t1),
            e -> e['tus'])) AS t2 FROM s1),
        s3 AS (SELECT user_id, t1, t2, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'purchase' AND e['tus'] > t2),
            e -> e['tus'])) AS t3 FROM s2),
        m AS (SELECT cast(count(*) as bigint) AS n_users,
            cast(count(t1) as bigint) AS n_signup,
            cast(count(t2) as bigint) AS n_click_after,
            cast(count(t3) as bigint) AS n_purchase_after,
            cast(sum(CASE WHEN t2 IS NOT NULL THEN t2 - t1 END) as bigint)
              AS sum_gap12_us,
            cast(sum(CASE WHEN t3 IS NOT NULL THEN t3 - t2 END) as bigint)
              AS sum_gap23_us
          FROM s3)
        SELECT n_users, n_signup, n_click_after, n_purchase_after,
          sum_gap12_us, sum_gap23_us,
          CASE WHEN n_users > 0
            THEN cast(n_signup as double) / n_users END AS conv_signup,
          CASE WHEN n_signup > 0
            THEN cast(n_click_after as double) / n_signup END AS conv_click,
          CASE WHEN n_click_after > 0
            THEN cast(n_purchase_after as double) / n_click_after END
            AS conv_purchase
        FROM m"""))

  /** q227 — session co-occurrence mining (the A-Priori level-2 support
    * /lift table, Agrawal & Srikant 1994, over q27's 30-minute
    * sessions): for every unordered event-type pair, in how many
    * sessions do both occur, with support = n_ab/N and lift =
    * n_ab·N / (n_a·n_b) — the association readout behind "users who
    * error also purchase?" dashboards. Lift is computed by exact
    * integer cross-multiplication before ONE IEEE division (never
    * support/support/support — three rounded divides).
    *
    * Scale shape: session assignment is q27's one user_id exchange
    * (lag + running-sum windows); each session then collapses to its
    * ≤ |types| distinct-type array and the PAIR explode is doc-local
    * over that bounded array (≤ C(5,2) = 10 rows per session — never
    * a session×session or event×event join); the pair/single/total
    * aggregates are ≤ 10/5/1-row rollups off one cached session-types
    * frame. Output ≤ 10 rows at any corpus size. */
  val sessionCooccurrence: Q = Q(
    "q227_session_cooccurrence",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      val running = byUser.rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(running))
        .groupBy("user_id", "session_id")
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
      val st = graft.CacheScope.cached(sess.select("types"))
      val total = st.agg(count(lit(1)).cast("long").as("n_total"))
      val singles = st.select(explode(col("types")).as("t"))
        .groupBy("t").agg(count(lit(1)).cast("long").as("n_t"))
      val pairs = st
        .select(explode(flatten(transform(col("types"), (x, i) =>
          transform(slice(col("types"), i + 2, size(col("types"))),
            y => array(x, y))))).as("pr"))
        .select(col("pr").getItem(0).as("a"), col("pr").getItem(1).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).cast("long").as("n_ab"))
      pairs
        .join(broadcast(singles.select(col("t").as("a"),
          col("n_t").as("n_a"))), "a")
        .join(broadcast(singles.select(col("t").as("b"),
          col("n_t").as("n_b"))), "b")
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          col("n_total"),
          (col("n_ab").cast("double") / col("n_total")).as("support"),
          ((col("n_ab") * col("n_total")).cast("double") /
            (col("n_a") * col("n_b"))).as("lift"))
        .orderBy("a", "b")
    },
    Some("""WITH o AS (
        SELECT user_id, event_id, ts, event_type,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_ts
        FROM events),
      m AS (SELECT user_id, event_id, ts, event_type,
          CASE WHEN prev_ts IS NULL
            OR date_diff('second', prev_ts, ts) > 1800
            THEN 1 ELSE 0 END AS new_session
        FROM o),
      s AS (SELECT user_id, event_type,
          cast(sum(new_session) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
            AS session_id
        FROM m),
      g AS MATERIALIZED (SELECT user_id, session_id,
          list_sort(list_distinct(list(event_type))) AS types
        FROM s GROUP BY 1, 2),
      tot AS (SELECT cast(count(*) as bigint) AS n_total FROM g),
      si AS MATERIALIZED (SELECT t, cast(count(*) as bigint) AS n_t
        FROM (SELECT unnest(types) AS t FROM g) GROUP BY 1),
      pc AS (SELECT a, b, cast(count(*) as bigint) AS n_ab FROM
          (SELECT types[i] AS a, types[j] AS b
           FROM g,
             unnest(generate_series(1, len(types))) AS u(i),
             unnest(generate_series(1, len(types))) AS v(j)
           WHERE j > i)
        GROUP BY 1, 2)
      SELECT pc.a, pc.b, pc.n_ab, sa.n_t AS n_a, sb.n_t AS n_b,
        tot.n_total,
        cast(pc.n_ab as double) / tot.n_total AS support,
        cast(pc.n_ab * tot.n_total as double) / (sa.n_t * sb.n_t) AS lift
      FROM pc JOIN si sa ON pc.a = sa.t JOIN si sb ON pc.b = sb.t, tot
      ORDER BY 1, 2"""))

  /** q234 — one-sided CUSUM changepoint detection (Page 1954) over
    * each event type's DAILY volume: S_d = max(0, S_{d−1} + (c_d·D −
    * T)), alarming when the accumulated excess reaches two average
    * days' mass (S_d ≥ 2T) — the sequential drift detector that
    * catches a sustained upward shift long before a per-day threshold
    * does, and the batch twin of the streaming drift monitors
    * (QualityMonitor compares windows to a baseline; CUSUM integrates
    * the deviation). ALL integer: deviations are scaled by D (c −
    * T/D > 0 ⟺ c·D − T > 0), so no mean is ever a rounded double.
    *
    * Scale shape: daily counts are ONE map-combinable (type, day)
    * groupBy; each type then collapses to a D-slot dense series
    * (missing days ARE zeros — a gap is signal, not absence) and the
    * sequential recurrence — inherently unparallelizable across days
    * — runs as a bounded doc-local fold inside one projection (the
    * q188/q218 discipline; D is the monitoring window, 30 here,
    * bounded by design). The oracle replays the identical recurrence
    * as a WITH RECURSIVE over the same dense grid. */
  val cusumDrift: Q = Q(
    "q234_cusum_drift",
    (s, d) => {
      // cached: |types|·|days| rows at any corpus size, consumed by
      // both the span aggregate and the series build — one events scan
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("c")))
      val span = daily.agg(min(col("day")).as("d0"),
        (max(col("day")) - min(col("day")) + 1).as("nd"))
      val series = daily.crossJoin(broadcast(span))
        .groupBy("event_type", "d0", "nd")
        .agg(map_from_entries(collect_list(
          struct((col("day") - col("d0")).cast("int"), col("c"))))
          .as("m"))
        .select(col("event_type"), col("nd"),
          transform(sequence(lit(0), col("nd").cast("int") - 1),
            i => coalesce(element_at(col("m"), i), lit(0L))).as("cs"))
      val st = series
        .withColumn("t", aggregate(col("cs"), lit(0L), (a, x) => a + x))
        .withColumn("f", aggregate(col("cs"),
          struct(lit(0L).as("s"), lit(0L).as("mx"), lit(0L).as("nal"),
            lit(-1).as("first"), lit(0).as("i")),
          (acc, x) => {
            val s2 = greatest(lit(0L),
              acc.getField("s") + (x * col("nd") - col("t")))
            val alarm = s2 >= lit(2L) * col("t") && col("t") > 0
            struct(s2.as("s"),
              greatest(acc.getField("mx"), s2).as("mx"),
              (acc.getField("nal") + when(alarm, 1L).otherwise(0L))
                .as("nal"),
              when(acc.getField("first") === -1 && alarm,
                acc.getField("i")).otherwise(acc.getField("first"))
                .as("first"),
              (acc.getField("i") + 1).as("i"))
          }))
      st.select(col("event_type"), col("nd").cast("long").as("n_days"),
          col("t").as("total"),
          col("f.mx").as("max_cusum_sd"),
          col("f.nal").as("n_alarm_days"),
          col("f.first").cast("long").as("first_alarm_day"))
        .orderBy("event_type")
    },
    Some("""WITH RECURSIVE daily AS MATERIALIZED (SELECT event_type,
          epoch_us(ts) // 86400000000 AS day, cast(count(*) as bigint) AS c
        FROM events GROUP BY 1, 2),
      span AS (SELECT min(day) AS d0,
          cast(max(day) - min(day) + 1 as bigint) AS nd FROM daily),
      grid0 AS (SELECT t.event_type, g.i AS i, span.d0, span.nd
        FROM (SELECT DISTINCT event_type FROM daily) t, span,
          unnest(generate_series(0, cast(span.nd as int) - 1)) AS g(i)),
      grid AS MATERIALIZED (SELECT g0.event_type, g0.i,
          coalesce(d.c, 0) AS c, g0.nd
        FROM grid0 g0 LEFT JOIN daily d ON d.event_type = g0.event_type
          AND d.day = g0.d0 + g0.i),
      tot AS MATERIALIZED (SELECT event_type, cast(sum(c) as bigint) AS t
        FROM grid GROUP BY 1),
      rec AS (
        SELECT g.event_type, g.i, tot.t, g.nd,
          greatest(0, g.c * g.nd - tot.t) AS s,
          greatest(0, g.c * g.nd - tot.t) AS mx,
          CASE WHEN greatest(0, g.c * g.nd - tot.t) >= 2 * tot.t
            AND tot.t > 0 THEN 1 ELSE 0 END AS nal,
          CASE WHEN greatest(0, g.c * g.nd - tot.t) >= 2 * tot.t
            AND tot.t > 0 THEN 0 ELSE -1 END AS first
        FROM grid g JOIN tot ON g.event_type = tot.event_type
        WHERE g.i = 0
        UNION ALL
        SELECT r.event_type, g.i, r.t, r.nd,
          greatest(0, r.s + (g.c * g.nd - r.t)) AS s,
          greatest(r.mx, greatest(0, r.s + (g.c * g.nd - r.t))) AS mx,
          r.nal + CASE WHEN greatest(0, r.s + (g.c * g.nd - r.t))
            >= 2 * r.t AND r.t > 0 THEN 1 ELSE 0 END AS nal,
          CASE WHEN r.first = -1 AND greatest(0, r.s +
              (g.c * g.nd - r.t)) >= 2 * r.t AND r.t > 0
            THEN g.i ELSE r.first END AS first
        FROM rec r JOIN grid g ON g.event_type = r.event_type
          AND g.i = r.i + 1),
      fin AS (SELECT event_type, max(i) AS mi FROM rec GROUP BY 1)
      SELECT r.event_type, r.nd AS n_days, r.t AS total,
        cast(r.mx as bigint) AS max_cusum_sd,
        cast(r.nal as bigint) AS n_alarm_days,
        cast(r.first as bigint) AS first_alarm_day
      FROM rec r JOIN fin ON r.event_type = fin.event_type
        AND r.i = fin.mi
      ORDER BY r.event_type"""))

  /** q243 — right-to-be-forgotten delete propagation through a
    * maintained rollup (the retraction half of q189's merge): a GDPR
    * delete set (here the pinned forget-list user_id % 37 = 0) must
    * update the per-(day, type) rollup WITHOUT recomputing it from the
    * fact table. Count and sum are abelian-group aggregates — subtract
    * the delete slice's partials (exact decimal, so retraction is
    * lossless); min/max are only semilattice aggregates — NOT
    * retractable from partials — so they are recomputed from surviving
    * rows for AFFECTED groups only (a delete-slice-bounded semi-join;
    * untouched groups keep their stored extrema and never re-read
    * facts). Groups whose every row is deleted drop out (n′ = 0). The
    * ORACLE is the full recompute over survivors, so delta-maintenance
    * ≡ recompute is hash-PROVEN, min/max repair included.
    *
    * Scale shape: three SEMANTIC reads of the fact table — the
    * maintained rollup (in production a persisted table, not a scan),
    * the delete slice (forget-lists are tiny and this aggregate is
    * map-combinable), and the affected-group survivor re-read (semi-
    * join-pruned to the groups the delete touched). The delete
    * predicate is null-safe on both engines (coalesce(... , false)):
    * a null user can never be "deleted" by arithmetic accident. */
  val rollupRetraction: Q = Q(
    "q243_rollup_retraction",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
          col("event_type"), col("value"))
      val isDel = coalesce(col("user_id") % 37 === 0, lit(false))
      val base = ev.groupBy("day", "event_type")
        .agg(count(lit(1)).as("n0"), sum(col("value").cast(Dec)).as("s0"),
          min(col("value")).as("mn0"), max(col("value")).as("mx0"))
      // cached: the forget-slice partials are |days|·|types| rows at any
      // event volume, and BOTH the merge and the repair semi-join read
      // them — without the cache each consumer expands its own delta
      // scan (measured: events=4 → 3)
      val deltas = graft.CacheScope.cached(
        ev.filter(isDel).groupBy("day", "event_type")
          .agg(count(lit(1)).as("dn"), sum(col("value").cast(Dec)).as("ds")))
      val merged = base.join(deltas, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          (col("n0") - coalesce(col("dn"), lit(0L))).as("n_events"),
          (col("s0") - coalesce(col("ds"), lit(BigDecimal(0)).cast(Dec)))
            .as("sd"),
          col("mn0"), col("mx0"), col("dn").isNotNull.as("affected"))
        .filter(col("n_events") > 0)
      val repaired = ev.filter(!isDel)
        .join(deltas.select("day", "event_type"),
          Seq("day", "event_type"), "left_semi")
        .groupBy("day", "event_type")
        .agg(min(col("value")).as("mnr"), max(col("value")).as("mxr"))
      merged.join(repaired, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"), col("n_events"),
          splitDbl(col("sd")).as("sum_value"),
          when(col("affected"), col("mnr")).otherwise(col("mn0"))
            .as("min_value"),
          when(col("affected"), col("mxr")).otherwise(col("mx0"))
            .as("max_value"))
        .orderBy("day", "event_type")
    },
    // the from-scratch recompute over survivors IS the oracle: hash
    // equality proves retraction + targeted min/max repair
    Some(s"""WITH sv AS (SELECT date_trunc('day', ts) AS day, event_type,
          value FROM events
        WHERE NOT coalesce(user_id % 37 = 0, false))
      SELECT day, event_type, cast(count(*) as bigint) AS n_events,
        ${sqlDsum("value")} AS sum_value,
        min(value) AS min_value, max(value) AS max_value
      FROM sv GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  /** q251 — last-touch attribution: each purchase credited to the same
    * user's most recent preceding click/view, expiring after a 7-day
    * lookback — the classic marketing-attribution join, done WITHOUT a
    * range self-join (which would revisit each user's history per
    * purchase): one running `max` over the user's packed touch stream.
    * The touch is packed as tus·10⁷ + event_id in decimal(38,0)/HUGEINT
    * — max over the pack IS "latest touch, ties by highest event_id",
    * and both timestamp and id unpack exactly (div/mod). The 10⁷ pack
    * factor bounds event_id; a deployment with wider ids widens the
    * factor (the pack stays exact in 38-digit decimal up to 10²¹).
    *
    * Scale shape: ONE window over bounded per-user partitions (the
    * q27/q242 argument), no join anywhere; the 7-day expiry is a
    * per-row comparison in exact integer microseconds AFTER the window
    * (an expired touch yields NULL attribution, same as no touch). */
  val lastTouchAttribution: Q = {
    val SevenDaysUs = 604800000000L
    Q(
      "q251_last_touch",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pk = (col("tus").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * lit(10000000L) +
          col("event_id"))
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("attr_pk",
            max(when(col("event_type").isin("click", "view"), pk)).over(w))
          .filter(col("event_type") === "purchase")
          .withColumn("attr_tus",
            expr("attr_pk div 10000000").cast("long"))
          .withColumn("live",
            col("attr_pk").isNotNull &&
              col("tus") - col("attr_tus") <= SevenDaysUs)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            when(col("live"), (col("attr_pk") % 10000000L).cast("long"))
              .as("attr_event_id"),
            when(col("live"), col("tus") - col("attr_tus")).as("gap_us"))
          .orderBy("purchase_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, event_id,
            epoch_us(ts) AS tus FROM events),
        m AS (SELECT *, max(CASE WHEN event_type IN ('click', 'view')
              THEN tus::hugeint * 10000000 + event_id END)
            OVER (PARTITION BY user_id ORDER BY tus, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_pk
          FROM e),
        p AS (SELECT event_id AS purchase_id, user_id, tus,
            cast(attr_pk // 10000000 as bigint) AS attr_tus,
            cast(attr_pk % 10000000 as bigint) AS attr_eid
          FROM m WHERE event_type = 'purchase')
        SELECT purchase_id, user_id,
          CASE WHEN attr_tus IS NOT NULL
              AND tus - attr_tus <= $SevenDaysUs THEN attr_eid END
            AS attr_event_id,
          CASE WHEN attr_tus IS NOT NULL
              AND tus - attr_tus <= $SevenDaysUs THEN tus - attr_tus END
            AS gap_us
        FROM p ORDER BY purchase_id"""))
  }

  /** q257 — time-to-convert histogram: per converting user, the exact
    * integer-microsecond gap from FIRST view to the first purchase
    * STRICTLY AFTER it, bucketed on the q192 grid — the duration
    * readout q65 (ordered firsts) and q226 (strict ordered funnel)
    * both stop short of, and the number that sizes attribution
    * lookbacks (q251's 7-day window) and re-marketing timers from
    * data instead of folklore.
    *
    * Scale shape: ONE user_id aggregation pass — fv and the user's
    * purchase-time list ride the SAME groupBy (a separate purchase
    * branch gets its own pushed-down filter and a second scan, caught
    * live by ReuseAudit), and "first purchase after fv" is an
    * order-independent array_min over the post-agg filtered list
    * (per-user lists are bounded, the q27 argument); output is a
    * ≤ 6-cell histogram. */
  val timeToConvert: Q = Q(
    "q257_time_to_convert",
    (s, d) => {
      val gap = Tables.events(s, d)
        .filter(col("user_id").isNotNull &&
          col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("tus"))).as("fv"),
          collect_list(when(col("event_type") === "purchase", col("tus")))
            .as("ps"))
        .filter(col("fv").isNotNull)
        .withColumn("fp", array_min(filter(col("ps"), x => x > col("fv"))))
        .filter(col("fp").isNotNull)
        .select(col("user_id"), (col("fp") - col("fv")).as("gap_us"))
      gap
        .groupBy(when(col("gap_us") < 1000000L, 1)
          .when(col("gap_us") < 10000000L, 2)
          .when(col("gap_us") < 60000000L, 3)
          .when(col("gap_us") < 600000000L, 4)
          .when(col("gap_us") < 3600000000L, 5).otherwise(6).as("ord"))
        .agg(count(lit(1)).as("n_users"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy("ord")
    },
    Some("""WITH e AS (SELECT user_id, event_type,
          epoch_us(ts) AS tus FROM events
        WHERE user_id IS NOT NULL
          AND event_type IN ('view', 'purchase')),
      a AS (SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN tus END) AS fv,
          list(tus) FILTER (WHERE event_type = 'purchase') AS ps
        FROM e GROUP BY 1 HAVING fv IS NOT NULL),
      g AS (SELECT user_id,
          list_min(list_filter(ps, x -> x > fv)) - fv AS gap_us
        FROM a
        WHERE list_min(list_filter(ps, x -> x > fv)) IS NOT NULL)
      SELECT CASE WHEN gap_us < 1000000 THEN 1
          WHEN gap_us < 10000000 THEN 2
          WHEN gap_us < 60000000 THEN 3
          WHEN gap_us < 600000000 THEN 4
          WHEN gap_us < 3600000000 THEN 5 ELSE 6 END AS ord,
        count(*) AS n_users,
        min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
      FROM g GROUP BY 1 ORDER BY 1"""))

  /** q236 — k-anonymity audit over the event release projection: if the
    * events table were published keyed by the quasi-identifiers
    * (event_type, day, value band), how identifiable is each row? Every
    * QI equivalence class gets k = its DISTINCT-user population
    * (k-anonymity counts individuals, not rows — one chatty user in a
    * class of one is still a re-identification), and the audit reports
    * the class histogram over the standard release bands (k=1
    * singletons / k<5 / k<20 / k≥20) plus the row mass at risk. The
    * governance gate a training-data pipeline runs BEFORE exporting
    * behavioral tables (the PII-scrub q83 covers free text; this covers
    * structured joins).
    *
    * Scale shape: two map-combinable hash aggregates, no window, no
    * join — the class frame is |types|·|days|·|bands| rows at any event
    * volume. The value band is floor(value/10): both engines divide the
    * same IEEE double by the same short literal and floor, so the band
    * id is bit-identical (the q192 bucket discipline). */
  val kAnonymity: Q = Q(
    "q236_k_anonymity",
    (s, d) => {
      val cls = Tables.events(s, d)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          floor(col("value") / 10).cast("long").as("vband"), col("user_id"))
        .groupBy("event_type", "day", "vband")
        .agg(countDistinct(col("user_id")).as("k"),
          count(lit(1)).as("rows_in_class"))
      cls
        .groupBy(when(col("k") === 1, 0).when(col("k") < 5, 1)
          .when(col("k") < 20, 2).otherwise(3).as("ord"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("rows_in_class")).cast("long").as("n_rows"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("ord")
    },
    Some("""WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
          cast(floor(value / 10) as bigint) AS vband,
          cast(count(DISTINCT user_id) as bigint) AS k,
          cast(count(*) as bigint) AS rows_in_class
        FROM events GROUP BY 1, 2, 3)
      SELECT CASE WHEN k = 1 THEN 0 WHEN k < 5 THEN 1
          WHEN k < 20 THEN 2 ELSE 3 END AS ord,
        cast(count(*) as bigint) AS n_classes,
        cast(sum(rows_in_class) as bigint) AS n_rows,
        min(k) AS min_k, max(k) AS max_k
      FROM c GROUP BY 1 ORDER BY 1"""))

  /** q273 — l-diversity audit: [[kAnonymity]]'s missing half
    * (Machanavajjhala et al. 2007 §3 — the homogeneity attack).
    * k-anonymity counts INDIVIDUALS per QI class, but a class can be
    * 20-anonymous and still leak: if every row in it carries the same
    * SENSITIVE value, an adversary who places a target in the class
    * learns the value without identifying any row. Release projection
    * here: QI = (day, value band), sensitive = event_type. Per QI
    * class, l = distinct sensitive values and the majority share in
    * exact ppm (the homogeneity risk), rolled up per l: classes at
    * l = 1 are outright leaks, low-l/high-majority classes the
    * near-leaks — the second governance gate next to q236 before a
    * behavioral table export.
    *
    * Scale shape: the q241 one-exchange discipline — ONE
    * (day, vband, event_type) map-combinable pre-aggregate; the class
    * regroup and the per-l rollup both run on its
    * |days|·|bands|·|types| rows, never on event volume. Majority
    * share = exact integer cross-multiplication (max_sens × 10⁶ div
    * rows), no float ever crosses engines. */
  val lDiversity: Q = Q(
    "q273_l_diversity",
    (s, d) => {
      val g = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"),
          floor(col("value") / 10).cast("long").as("vband"),
          col("event_type"))
        .groupBy("day", "vband", "event_type")
        .agg(count(lit(1)).as("c"))
      val cls = g.groupBy("day", "vband")
        .agg(count(lit(1)).as("l"),
          sum(col("c")).cast("long").as("rows_in_class"),
          max(col("c")).cast("long").as("max_sens"))
      cls.groupBy("l")
        .agg(count(lit(1)).as("n_classes"),
          sum(col("rows_in_class")).cast("long").as("n_rows"),
          min(expr("max_sens * 1000000 div rows_in_class"))
            .as("min_major_ppm"),
          max(expr("max_sens * 1000000 div rows_in_class"))
            .as("max_major_ppm"))
        .orderBy("l")
    },
    Some("""WITH g AS (SELECT date_trunc('day', ts) AS day,
          cast(floor(value / 10) as bigint) AS vband, event_type,
          cast(count(*) as bigint) AS c
        FROM events GROUP BY 1, 2, 3),
      cls AS (SELECT day, vband, cast(count(*) as bigint) AS l,
          cast(sum(c) as bigint) AS rows_in_class,
          cast(max(c) as bigint) AS max_sens
        FROM g GROUP BY 1, 2)
      SELECT l, cast(count(*) as bigint) AS n_classes,
        cast(sum(rows_in_class) as bigint) AS n_rows,
        min(max_sens * 1000000 // rows_in_class) AS min_major_ppm,
        max(max_sens * 1000000 // rows_in_class) AS max_major_ppm
      FROM cls GROUP BY 1 ORDER BY 1"""))

  /** q241 — per-user event-type concentration (Herfindahl–Hirschman
    * index) + peak daily volume: the bot-likeness battery. A human
    * account spreads events across types and days (low HHI, modest
    * peaks); a scripted one hammers one type (HHI → 1) or bursts one
    * day. HHI = Σ c_t² / n² — every numerator an exact integer, ONE
    * IEEE division per user (the q232 Gini discipline) — so no
    * entropy/log() ever crosses engines.
    *
    * Scale shape: ONE canonical user_id exchange feeds everything (the
    * q192 shared-exchange treatment): both readouts derive from the
    * IDENTICAL (user, type, day) pre-aggregate — identical subtrees
    * canonicalize, so ReuseExchange collapses them onto one events
    * scan (two differently-pruned branches would not), and every
    * regroup above it is exchange-free because hashpartitioning
    * (user_id) already satisfies each coarser clustering (subset
    * rule). All aggregates are map-combinable; the pre-aggregate also
    * shrinks the shuffle to |users|·|types|·|days| rows. */
  val userTypeHhi: Q = Q(
    "q241_user_type_hhi",
    (s, d) => {
      val g = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .filter(col("user_id").isNotNull)
        .repartition(col("user_id"))
        .groupBy("user_id", "event_type", "day")
        .agg(count(lit(1)).as("c3"))
      val hhi = g.groupBy("user_id", "event_type")
        .agg(sum(col("c3")).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).cast("long").as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).cast("long").as("ssq"))
      val daily = g.groupBy("user_id", "day")
        .agg(sum(col("c3")).as("dc"))
        .groupBy("user_id")
        .agg(max(col("dc")).cast("long").as("max_day"))
      hhi.join(daily, "user_id")
        .select(col("user_id"), col("n_events"), col("n_types"),
          (col("ssq").cast("double") /
            (col("n_events") * col("n_events"))).as("hhi"),
          col("max_day"))
        .orderBy("user_id")
    },
    Some("""WITH e AS MATERIALIZED (SELECT user_id, event_type,
          epoch_us(ts) // 86400000000 AS day
        FROM events WHERE user_id IS NOT NULL),
      h AS (SELECT user_id, cast(sum(c) as bigint) AS n_events,
          cast(count(*) as bigint) AS n_types,
          cast(sum(c * c) as bigint) AS ssq
        FROM (SELECT user_id, event_type, count(*) AS c
              FROM e GROUP BY 1, 2)
        GROUP BY 1),
      dl AS (SELECT user_id, cast(max(dc) as bigint) AS max_day
        FROM (SELECT user_id, day, count(*) AS dc FROM e GROUP BY 1, 2)
        GROUP BY 1)
      SELECT h.user_id, h.n_events, h.n_types,
        cast(h.ssq as double) / (h.n_events * h.n_events) AS hhi,
        dl.max_day
      FROM h JOIN dl ON h.user_id = dl.user_id
      ORDER BY h.user_id"""),
    bench = true)

  /** q242 — same-user inter-arrival time histogram per event type:
    * machine traffic shows sub-second metronome gaps, human traffic
    * spreads over minutes-to-hours — the distribution that separates
    * them (and sizes session timeouts from data, the q192 companion:
    * that audit sizes the watermark from LATENESS, this sizes the
    * session gap from CADENCE; q27 assumes 1800 s — this is where the
    * number comes from). Gap = microseconds since the same user's
    * previous event of ANY type, attributed to the LATER event's type;
    * exact integer microseconds throughout (the epoch_us discipline),
    * bucketed on the q192 grid (<1 s / <10 s / <1 min / <10 min /
    * <1 h / ≥1 h, with an exact-zero band for same-instant rows).
    *
    * Scale shape: the lag window is partitioned by user_id — bounded
    * partitions by construction (one user's history, the q27
    * sessionization precedent; never a global ORDER BY) — followed by
    * one map-combinable hash aggregate over ≤ |types|·7 cells. */
  val interArrival: Q = Q(
    "q242_interarrival_hist",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"),
          when(col("gap_us") === 0, 0)
            .when(col("gap_us") < 1000000L, 1)
            .when(col("gap_us") < 10000000L, 2)
            .when(col("gap_us") < 60000000L, 3)
            .when(col("gap_us") < 600000000L, 4)
            .when(col("gap_us") < 3600000000L, 5).otherwise(6).as("ord"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy("event_type", "ord")
    },
    Some("""WITH e AS (SELECT user_id, event_type, event_id,
          epoch_us(ts) AS tus FROM events),
      g AS (SELECT event_type,
          tus - lag(tus) OVER (PARTITION BY user_id
            ORDER BY tus, event_id) AS gap_us
        FROM e),
      b AS (SELECT event_type, gap_us,
          CASE WHEN gap_us = 0 THEN 0
            WHEN gap_us < 1000000 THEN 1
            WHEN gap_us < 10000000 THEN 2
            WHEN gap_us < 60000000 THEN 3
            WHEN gap_us < 600000000 THEN 4
            WHEN gap_us < 3600000000 THEN 5 ELSE 6 END AS ord
        FROM g WHERE gap_us IS NOT NULL)
      SELECT event_type, ord, count(*) AS n_gaps,
        min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
      FROM b GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q258 — forget-list blast radius: BEFORE running a retraction
    * (q243 / [[RollupStore.delete]]), quantify per (day, event_type)
    * group what the forget list will do to the maintained rollup —
    * rows retracted, their share of the group's mass (exact integer
    * ppm), whether the group's stored MIN or MAX is held by the forget
    * slice (exactly the groups whose extrema are non-retractable from
    * partials, i.e. the semi-join fan-out of the repair re-read), and
    * groups erased outright (every row forgotten — they leave the
    * store). At 100 TB an ops team reads this before the delete:
    * Σ extremum_hit IS the repair cost and the erased list is the
    * dashboard diff to announce.
    *
    * Scale shape: ONE events scan, one map-combinable aggregate with
    * conditional branches — never a second filtered scan (the
    * q241/q257 single-pre-aggregate discipline); output is bounded by
    * |days|·|types|. Booleans surface as bigint 0/1 (oracle-hash
    * convention). */
  val forgetBlastRadius: Q = Q(
    "q258_forget_blast_radius",
    (s, d) => {
      val isDel = coalesce(col("user_id") % 37 === 0, lit(false))
      Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
          col("value"), isDel.as("del"))
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n_rows"),
          min(col("value")).as("mn"), max(col("value")).as("mx"),
          sum(when(col("del"), 1L).otherwise(0L)).as("n_forget"),
          min(when(col("del"), col("value"))).as("dmn"),
          max(when(col("del"), col("value"))).as("dmx"))
        .filter(col("n_forget") > 0)
        .select(col("day"), col("event_type"), col("n_rows"),
          col("n_forget"),
          expr("n_forget * 1000000 div n_rows").as("share_ppm"),
          ((col("dmn").isNotNull && col("dmn") <=> col("mn")) ||
            (col("dmx").isNotNull && col("dmx") <=> col("mx")))
            .cast("long").as("extremum_hit"),
          (col("n_rows") === col("n_forget")).cast("long").as("erased"))
        .orderBy("day", "event_type")
    },
    Some("""WITH a AS (SELECT date_trunc('day', ts) AS day, event_type,
          cast(count(*) as bigint) AS n_rows,
          min(value) AS mn, max(value) AS mx,
          cast(sum(CASE WHEN coalesce(user_id % 37 = 0, false)
            THEN 1 ELSE 0 END) as bigint) AS n_forget,
          min(CASE WHEN coalesce(user_id % 37 = 0, false)
            THEN value END) AS dmn,
          max(CASE WHEN coalesce(user_id % 37 = 0, false)
            THEN value END) AS dmx
        FROM events GROUP BY 1, 2)
      SELECT day, event_type, n_rows, n_forget,
        n_forget * 1000000 // n_rows AS share_ppm,
        cast(CASE WHEN (dmn IS NOT NULL AND dmn IS NOT DISTINCT FROM mn)
          OR (dmx IS NOT NULL AND dmx IS NOT DISTINCT FROM mx)
          THEN 1 ELSE 0 END as bigint) AS extremum_hit,
        cast(CASE WHEN n_rows = n_forget THEN 1 ELSE 0 END as bigint)
          AS erased
      FROM a WHERE n_forget > 0 ORDER BY 1, 2"""))

  /** q259 — state-TTL eviction-risk curve: the stateful monitors
    * ([[graft.streaming.BotMonitor]]/[[graft.streaming.Funnel]])
    * expire per-user state after `idleTtlSeconds`, and the TTL is a
    * data question — too short and an ACTIVE user's state is evicted
    * at their longest internal idle gap (a bot re-alerts, a funnel
    * re-arms mid-journey), too long and the store holds ghosts. For
    * each candidate TTL (1 h / 1 day / 7 days / 30 days — sized to the
    * corpus's multi-hour mean inter-arrival so the curve actually
    * bends; sub-hour candidates evict everyone here): how many
    * multi-event users have at least one internal gap above it (would
    * be evicted mid-history) and the share in exact ppm. The q192
    * companion closed one loop further:
    * q192 sized the WATERMARK from lateness, q242 the session gap from
    * cadence, this sizes the state TTL from per-user idleness.
    * Single-event users carry no internal gap (their state is purely
    * idle after the one event) and are excluded from the denominator.
    *
    * Scale shape: the q242 lag window (user-partitioned — bounded
    * partitions, never a global sort), ONE per-user max-gap aggregate,
    * then the candidate grid is a 4-literal explode over the
    * |users|-row frame — the whole curve costs no more than one
    * candidate (the q205 sweep discipline). */
  val ttlEvictionRisk: Q = Q(
    "q259_ttl_eviction_risk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val umax = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .groupBy("user_id").agg(max(col("gap_us")).as("max_gap_us"))
        .filter(col("max_gap_us").isNotNull)
      umax
        .select(explode(typedlit(Seq(3600L, 86400L, 604800L, 2592000L)))
          .as("ttl_s"), col("max_gap_us"))
        .groupBy("ttl_s")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("max_gap_us") > col("ttl_s") * 1000000L, 1L)
            .otherwise(0L)).as("n_evicted"))
        .select(col("ttl_s"), col("n_users"), col("n_evicted"),
          expr("n_evicted * 1000000 div n_users").as("evict_ppm"))
        .orderBy("ttl_s")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
          FROM events WHERE user_id IS NOT NULL),
      g AS (SELECT user_id, tus - lag(tus) OVER (PARTITION BY user_id
            ORDER BY tus, event_id) AS gap_us FROM e),
      u AS (SELECT user_id, max(gap_us) AS max_gap_us
        FROM g WHERE gap_us IS NOT NULL GROUP BY 1),
      c AS (SELECT cast(t.ttl_s as bigint) AS ttl_s, u.max_gap_us
        FROM u CROSS JOIN (VALUES (3600), (86400), (604800), (2592000))
          AS t(ttl_s))
      SELECT ttl_s, cast(count(*) as bigint) AS n_users,
        cast(sum(CASE WHEN max_gap_us > ttl_s * 1000000
          THEN 1 ELSE 0 END) as bigint) AS n_evicted,
        cast(sum(CASE WHEN max_gap_us > ttl_s * 1000000
          THEN 1 ELSE 0 END) as bigint) * 1000000 // count(*)
          AS evict_ppm
      FROM c GROUP BY 1 ORDER BY 1"""))

  /** q260 — funnel conversion loss under a state TTL: q259 measures
    * which USERS a TTL would evict; this measures what that costs the
    * FUNNEL specifically. A conversion whose longest stage-to-stage
    * wait (signup→click or click→purchase, the q226 re-anchored
    * minima) exceeds the TTL would have had its mid-funnel state
    * evicted before completing — the purchase then finds no anchored
    * journey and the conversion is LOST. Per candidate TTL: total
    * conversions, conversions lost, loss in exact ppm — the
    * business-cost column an ops team weighs against q259's
    * state-size savings when choosing
    * [[graft.streaming.Funnel.conversions]]'s idleTtlSeconds.
    *
    * Scale shape: exactly q226's one user_id shuffle + doc-local array
    * folds (the stage anchors never leave the user's own event list),
    * filtered to converting users (a tiny frame), then the 4-literal
    * TTL grid explode — the q205/q259 sweep discipline. */
  val funnelTtlLoss: Q = Q(
    "q260_funnel_ttl_loss",
    (s, d) => {
      def tsOf(cond: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        (evs: org.apache.spark.sql.Column) => array_min(transform(
          filter(evs, e => cond(e)), e => e.getField("tus")))
      val byUser = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
          col("event_type").as("typ"))
        .groupBy("user_id")
        .agg(collect_list(struct(col("tus"), col("typ"))).as("evs"))
      val t1 = tsOf(e => e.getField("typ") === "signup")(col("evs"))
      val conv = byUser.select(col("user_id"), col("evs"), t1.as("t1"))
        .withColumn("t2", tsOf(e => e.getField("typ") === "click"
          && e.getField("tus") > col("t1"))(col("evs")))
        .withColumn("t3", tsOf(e => e.getField("typ") === "purchase"
          && e.getField("tus") > col("t2"))(col("evs")))
        .filter(col("t3").isNotNull)
        .select(greatest(col("t2") - col("t1"), col("t3") - col("t2"))
          .as("maxgap"))
      conv
        .select(explode(typedlit(Seq(3600L, 86400L, 604800L, 2592000L)))
          .as("ttl_s"), col("maxgap"))
        .groupBy("ttl_s")
        .agg(count(lit(1)).as("n_conversions"),
          sum(when(col("maxgap") > col("ttl_s") * 1000000L, 1L)
            .otherwise(0L)).as("n_lost"))
        .select(col("ttl_s"), col("n_conversions"), col("n_lost"),
          expr("n_lost * 1000000 div n_conversions").as("lost_ppm"))
        .orderBy("ttl_s")
    },
    Some("""WITH b AS (SELECT user_id,
          list(struct_pack(tus := epoch_us(ts), typ := event_type)) AS evs
          FROM events GROUP BY 1),
        s1 AS (SELECT user_id, evs, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'signup'),
            e -> e['tus'])) AS t1 FROM b),
        s2 AS (SELECT user_id, evs, t1, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'click' AND e['tus'] > t1),
            e -> e['tus'])) AS t2 FROM s1),
        s3 AS (SELECT user_id, t1, t2, list_min(list_transform(
            list_filter(evs, e -> e['typ'] = 'purchase' AND e['tus'] > t2),
            e -> e['tus'])) AS t3 FROM s2),
        conv AS (SELECT greatest(t2 - t1, t3 - t2) AS maxgap
          FROM s3 WHERE t3 IS NOT NULL),
        c AS (SELECT cast(t.ttl_s as bigint) AS ttl_s, maxgap
          FROM conv CROSS JOIN (VALUES (3600), (86400), (604800), (2592000))
            AS t(ttl_s))
      SELECT ttl_s, cast(count(*) as bigint) AS n_conversions,
        cast(sum(CASE WHEN maxgap > ttl_s * 1000000
          THEN 1 ELSE 0 END) as bigint) AS n_lost,
        cast(sum(CASE WHEN maxgap > ttl_s * 1000000
          THEN 1 ELSE 0 END) as bigint) * 1000000 // count(*) AS lost_ppm
      FROM c GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(
    forgetBlastRadius, ttlEvictionRisk, funnelTtlLoss,
    rollupMerge, latenessAudit, burstAudit, eventFunnel,
    sessionCooccurrence, cusumDrift, kAnonymity, lDiversity, userTypeHhi,
    interArrival, rollupRetraction, lastTouchAttribution,
    timeToConvert,
    pricingSummary, scanFilterProject, topkOrders, topkMultikey,
    joinLeftOuter, joinMultiwayAgg, joinSemi, joinAnti,
    groupCount, globalCount, distinctSingle, distinctMulti,
    filterCaseInsensitive, filterContains, unionAll, intersectKeys,
    exceptKeys, caseWhenBuckets, dateParts, stringFuncs,
    aggMinMaxAvg, countDistinctQ, windowRank, pointLookup,
    jsonExtract, eventsHourly, sessionization, rollupAgg, scalarMath,
    arrayAgg, stringAgg, statsMoments,
    sqlCorrelated, unionDistinct, windowSuite, dateSuite,
    percentiles, mergeUpsert,
    conditionalAggs, stringSuite2, bitwiseOps, groupingSets,
    eventTypeMap, cubeAgg, windowFrames, unpivotMetrics, sessionWindowAgg,
    scd2Upsert, tableChecksum, tpchQ3, tpchQ5, groupChecksum,
    equidepthDeciles, correlation, tpchQ18, tpchQ4,
    tpchQ10, tpchQ14, tpchQ19, tpchQ21)
}

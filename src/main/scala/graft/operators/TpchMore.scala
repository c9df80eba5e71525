package graft.operators

import graft.{Dsl, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second TPC-H batch — the join/agg shapes q110-q125 don't already
  * cover, adapted to the testdata schema (no partsupp table, no
  * l_shipmode/c_phone columns; adaptations noted per query).
  *
  * Shared determinism rules (Dsl): money aggregates go through exact
  * decimal(18,4) sums; every ratio is ONE IEEE division of identical
  * operands on both engines; every result carries a total ORDER BY.
  */
object TpchMore {
  import Dsl._

  private val Ts96 = "1996-01-01 00:00:00"
  private val Ts97 = "1997-01-01 00:00:00"
  private val Ts98 = "1998-01-01 00:00:00"

  /** q128 — TPC-H Q6 (forecast revenue change): the purest scan query —
    * zero joins, three conjunctive predicates, one global sum. Its whole
    * cost is the parquet scan, so at 100 TB it is won or lost on
    * pushdown: all three predicates must reach PushedFilters and only 4
    * columns may be read (PlanAuditSpec pins both). Benchmarked — it
    * bounds pure scan throughput the way q01 bounds scan+agg. */
  val tpchQ6: Q = Q(
    "q128_tpch_q6",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit(Ts96)) &&
        col("l_shipdate") < to_timestamp(lit(Ts97)) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines")),
    Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
        count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '$Ts96'
        AND l_shipdate < TIMESTAMP '$Ts97'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
    bench = true)

  /** q129 — TPC-H Q7 (volume shipping): bidirectional nation-pair trade
    * by ship year. The nation dimension is prefiltered to the two
    * nations BEFORE its broadcast joins, so the fact stream shrinks
    * ~12× at the supplier join — before the orders shuffle — and the
    * (A,A)/(B,B) rejection is a residual filter on the already-tiny
    * survivor set. Only the two 25-row nation frames are hinted;
    * supplier/orders/customer join sizes are AQE's call. */
  val tpchQ7: Q = Q(
    "q129_tpch_q7",
    (s, d) => {
      // the one nation pair with suppliers AND customers on both sides
      // at every testdata scale (sf0.001 ships only 10 suppliers)
      val pair = Seq("NATION_13", "NATION_19")
      val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit(Ts96)) &&
          col("l_shipdate") < to_timestamp(lit(Ts98)))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '$Ts96'
        AND l_shipdate < TIMESTAMP '$Ts98'
        AND ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
          OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
    // benched: the headline set's only 5-table join chain — the shape
    // most sensitive to join-order/shuffle regressions at 100 TB
    bench = true)

  /** q130 — TPC-H Q8 (national market share): NATION_3 suppliers' share
    * of ECONOMY-part revenue sold to AMERICA customers, by order year.
    * Every selective dimension (part type, customer region) filters
    * before the fact joins; the share is two exact decimal sums in ONE
    * aggregation pass (a conditional numerator, never two scans) and one
    * IEEE division. */
  val tpchQ8: Q = Q(
    "q130_tpch_q8",
    (s, d) => {
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val amerKeys = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("amer_nkey"))
      val suppNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= to_timestamp(lit(Ts96)) &&
              col("o_orderdate") < to_timestamp(lit(Ts98))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(amerKeys), col("c_nationkey") === col("amer_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0))) /
          dsum(vol)).as("mkt_share"))
        .orderBy("o_year")
    },
    Some(s"""SELECT year(o_orderdate) AS o_year,
        ${sqlDsum("CASE WHEN n1.n_name = 'NATION_3' " +
          "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} /
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '$Ts96'
        AND o_orderdate < TIMESTAMP '$Ts98'
      GROUP BY 1 ORDER BY 1"""))

  /** q131 — TPC-H Q9 shape (product-type profit), adapted: the testdata
    * has no partsupp, so profit is revenue-only
    * (l_extendedprice·(1−l_discount), no supplycost term) for parts
    * whose name contains 'red', by supplier nation × ship year. The
    * name predicate prunes the part side before the fact join; nation
    * is the only hinted (25-row) broadcast. */
  val tpchQ9: Q = Q(
    "q131_tpch_q9",
    (s, d) => Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("sum_profit"))
      .orderBy(col("nation"), col("l_year").desc),
    Some(s"""SELECT n_name AS nation, year(l_shipdate) AS l_year,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE contains(p_name, 'red')
      GROUP BY 1, 2 ORDER BY nation, l_year DESC"""))

  /** q132 — TPC-H Q13 (customer order distribution): LEFT OUTER join
    * with a residual predicate on the preserved side's partner (orders
    * that are not 1-URGENT), then a double aggregation — orders per
    * customer, then customers per order-count. The priority predicate
    * is right-side-only, so filtering orders BEFORE the join is
    * bit-identical to the ON-clause form and lets the scan prune.
    * Customers with no qualifying orders land in the c_count=0 bucket
    * (count(o_orderkey) skips the outer-join nulls). */
  val tpchQ13: Q = Q(
    "q132_tpch_q13",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** q133 — TPC-H Q15 (top supplier): per-supplier revenue over one
    * quarter, keep the supplier(s) whose revenue equals the maximum.
    * The max is a 1-row aggregate broadcast back over the per-supplier
    * frame (never a global sort), and the equality compares two doubles
    * PRODUCED BY THE SAME exact-decimal sum on both engines, so the
    * float-equality is reliable. The revenue frame is computed once —
    * AQE reuses its shuffle for the max branch, which requires the
    * explicit isNotNull below: the supplier join pushes
    * isnotnull(l_suppkey) into ONE branch's scan, and without the same
    * predicate in both the subtrees canonicalize differently and the
    * fact scan + aggregate silently run twice (observed; the reuse is
    * now pinned by PlanAuditSpec). */
  val tpchQ15: Q = Q(
    "q133_tpch_q15",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit(Ts96)) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")) &&
          col("l_suppkey").isNotNull)
        .groupBy("l_suppkey")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    },
    Some(s"""WITH rev AS (
        SELECT l_suppkey,
          ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '$Ts96'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey),
      m AS (SELECT max(total_rev) AS mx FROM rev)
      SELECT s_suppkey, s_name, total_rev
      FROM rev CROSS JOIN m
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = mx
      ORDER BY s_suppkey"""))

  /** q134 — TPC-H Q17 (small-quantity-order revenue): lineitems of one
    * brand's parts whose quantity is below 20% of that part's average
    * quantity. The correlated scalar subquery attaches as a PARTITIONED
    * window over the brand-pruned fact subset (the brand filter hits
    * part BEFORE the fact join; at sf0.01 that's 66 parts of 2000) —
    * ONE fact scan and one partkey shuffle. The decorrelated
    * aggregate-join-back form read the fact table twice: column pruning
    * gives the two lb branches different ReadSchemas, so their subtrees
    * never canonicalize equal and exchange reuse cannot fire (observed
    * — the q133 trap in a different guise). The window average
    * reproduces davg exactly: the same decimal(18,4) sum split to
    * double, divided by the same count. */
  val tpchQ17: Q = Q(
    "q134_tpch_q17",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val byPart = Window.partitionBy("l_partkey")
      Tables.lineitem(s, d)
        .join(brandParts, col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("qty_cap", lit(0.2) *
          (splitDbl(sum(col("l_quantity").cast(Dec)).over(byPart)) /
            count(col("l_quantity")).over(byPart)))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""WITH lb AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#13'),
      caps AS (SELECT l_partkey AS cap_partkey,
          0.2 * (${sqlDavg("l_quantity")}) AS qty_cap
        FROM lb GROUP BY l_partkey)
      SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
        count(*) AS n_lines
      FROM lb JOIN caps ON l_partkey = cap_partkey
      WHERE l_quantity < qty_cap"""))

  /** q135 — TPC-H Q22 shape (global customers), adapted: no c_phone, so
    * the group key is c_mktsegment, and since every testdata customer
    * has at least one order the "no orders" predicate becomes "no
    * orders since 1999" (dormant accounts). Shape preserved exactly:
    * a positive-balance global average (1-row broadcast), a filter
    * above it, a left-anti join against the recent-orders key set, and
    * a final small aggregation. The anti join runs AFTER the scalar
    * filter so its probe side is already the ~half of customers above
    * the average. */
  val tpchQ22: Q = Q(
    "q135_tpch_q22",
    (s, d) => {
      val avgBal = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
        .select("o_custkey")
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    },
    Some(s"""WITH a AS (SELECT ${sqlDavg("c_acctbal")} AS avg_bal
        FROM customer WHERE c_acctbal > 0)
      SELECT c_mktsegment, count(*) AS numcust,
        ${sqlDsum("c_acctbal")} AS totacctbal
      FROM customer CROSS JOIN a
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** q137 — TPC-H Q12 shape (shipping priority classes), adapted: the
    * testdata has no l_shipmode/l_receiptdate, so lines group by
    * l_linestatus and the date window runs on l_shipdate. Shape
    * preserved exactly: one fact→orders equi-join inside a date window,
    * CASE-split counts of critical (1-URGENT/2-HIGH) vs other order
    * priorities per lineitem attribute. The date filter reaches the
    * lineitem scan; the split is ONE aggregation pass, never two. */
  val tpchQ12: Q = Q(
    "q137_tpch_q12",
    (s, d) => {
      val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit(Ts96)) &&
          col("l_shipdate") < to_timestamp(lit(Ts97)))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some(s"""SELECT l_linestatus,
        cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) as bigint) AS high_line_count,
        cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) as bigint) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '$Ts96'
        AND l_shipdate < TIMESTAMP '$Ts97'
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Supply relation derived from shipment history (the testdata has no
    * partsupp): per (part, supplier), the observed min unit price. Each
    * unit price is ONE IEEE division of the same two doubles on both
    * engines, and min() picks an element of that identical set — so the
    * derived costs are bit-identical cross-engine. Shared by the
    * Q2/Q16/Q20 adaptations. */
  private val sqlSupply =
    """supply AS (SELECT l_partkey AS pk, l_suppkey AS sk,
         min(l_extendedprice / l_quantity) AS cost
       FROM lineitem GROUP BY 1, 2)"""
  private def supplyDf(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))

  /** q138 — TPC-H Q2 shape (min-cost supplier): for STANDARD parts of
    * one size, the EUROPE supplier(s) offering the minimum derived
    * supply cost. The correlated min subquery decorrelates into a
    * per-part aggregate joined back on partkey — both computed over the
    * EUROPE-pruned supply relation, so the region cut shrinks the
    * supply frame BEFORE either shuffle. The per-part min attaches as a
    * PARTITIONED window over the aggregated supply frame — ONE supply
    * computation and one pk shuffle, instead of a second
    * fact-scan+aggregate branch joined back (correct but dependent on
    * AQE exchange reuse to dedupe). The 100-row answer is a
    * TakeOrderedAndProject, never a global sort. Cost equality compares
    * a min() against members of the set it was drawn from — exact. */
  val tpchQ2: Q = Q(
    "q138_tpch_q2",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val eur = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val se = supplyDf(s, d).join(eur, col("sk") === col("s_suppkey"))
        .withColumn("min_cost", min(col("cost")).over(Window.partitionBy("pk")))
      Tables.part(s, d)
        .filter(col("p_size") === 7 && col("p_type") === "STANDARD")
        .join(se.filter(col("cost") === col("min_cost")),
          col("p_partkey") === col("pk"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some(s"""WITH $sqlSupply,
      eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      se AS (SELECT * FROM supply JOIN eur ON sk = s_suppkey),
      minc AS (SELECT pk AS m_pk, min(cost) AS min_cost
        FROM se GROUP BY pk)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
      FROM part
      JOIN se ON p_partkey = pk
      JOIN minc ON pk = m_pk AND cost = min_cost
      WHERE p_size = 7 AND p_type = 'STANDARD'
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""))

  /** q139 — TPC-H Q11 shape (important inventory): per-part value held
    * by one nation's suppliers, kept where the part's value exceeds
    * 0.1% of that nation's total. Adapted: value = Σ l_extendedprice
    * (no availqty·supplycost without partsupp). The total re-aggregates
    * the per-part frame, so AQE reuses byPart's shuffle for the total
    * branch and the fact scan runs once (pinned by PlanAuditSpec along
    * with q133's); the threshold is one IEEE multiply of the 1-row
    * broadcast. */
  val tpchQ11: Q = Q(
    "q139_tpch_q11",
    (s, d) => {
      val byPart = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_13").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum(col("l_extendedprice")).as("value"))
      val tot = byPart.agg(dsum(col("value")).as("tot"))
      byPart.crossJoin(broadcast(tot))
        .filter(col("value") > col("tot") * 0.001)
        .select(col("l_partkey"), col("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some(s"""WITH byp AS (
        SELECT l_partkey, ${sqlDsum("l_extendedprice")} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_13'
        GROUP BY l_partkey),
      t AS (SELECT ${sqlDsum("value")} AS tot FROM byp)
      SELECT l_partkey, value FROM byp CROSS JOIN t
      WHERE value > tot * 0.001
      ORDER BY value DESC, l_partkey"""))

  /** q140 — TPC-H Q16 shape (supplier count by part attribute):
    * distinct suppliers per (brand, type, size) over the derived supply
    * relation, excluding one brand, one type, and suppliers in bad
    * standing (negative balance — the schema's stand-in for the
    * complaints filter). The 6-row exclusion list is a broadcast anti
    * join; the part-attribute cuts prune the part side before the
    * supply join; the distinct count is the only wide aggregation. */
  val tpchQ16: Q = Q(
    "q140_tpch_q16",
    (s, d) => {
      val bad = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      supplyDf(s, d)
        .join(broadcast(bad), col("sk") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#13" &&
              col("p_type") =!= "ECONOMY" && col("p_size").isin(3, 5, 9)),
          col("pk") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("sk")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some(s"""WITH $sqlSupply
      SELECT p_brand, p_type, p_size,
        count(DISTINCT sk) AS supplier_cnt
      FROM supply JOIN part ON pk = p_partkey
      WHERE p_brand <> 'Brand#13' AND p_type <> 'ECONOMY'
        AND p_size IN (3, 5, 9)
        AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** q141 — TPC-H Q20 shape (excess-stock suppliers): suppliers who
    * shipped more than half a blue part's lifetime volume in 1996 alone
    * (the availqty > ½·year-volume predicate, re-anchored to shipment
    * history). The name cut prunes part before the fact join; the
    * year/lifetime split is ONE aggregation pass (conditional sum);
    * the supplier side attaches by semi join, so no supplier row
    * duplicates across its qualifying parts. */
  val tpchQ20: Q = Q(
    "q141_tpch_q20",
    (s, d) => {
      val hot = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("blue"))
            .select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(col("l_quantity")).as("qty_all"),
          dsum(when(year(col("l_shipdate")) === 1996, col("l_quantity"))
            .otherwise(0)).as("qty_96"))
        .filter(col("qty_96") > col("qty_all") * 0.5)
        .select("l_suppkey")
      Tables.supplier(s, d)
        .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },
    Some(s"""WITH hot AS (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE contains(p_name, 'blue')
        GROUP BY l_suppkey, l_partkey
        HAVING ${sqlDsum("CASE WHEN year(l_shipdate) = 1996 " +
          "THEN l_quantity ELSE 0 END")} >
          ${sqlDsum("l_quantity")} * 0.5)
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
      ORDER BY s_suppkey"""))

  val all: Seq[Q] = Seq(tpchQ6, tpchQ7, tpchQ8, tpchQ9, tpchQ13,
    tpchQ15, tpchQ17, tpchQ22, tpchQ12, tpchQ2, tpchQ11, tpchQ16,
    tpchQ20)
}

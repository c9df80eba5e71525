package graft.operators

import graft.{Dsl, Q, Tables}
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
    * AQE reuses the exchange for the max branch. */
  val tpchQ15: Q = Q(
    "q133_tpch_q15",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit(Ts96)) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
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
    * quantity. The correlated scalar subquery decorrelates into a
    * per-part aggregate joined back on partkey — both the aggregate and
    * the probe run over the brand-pruned fact subset (the brand filter
    * hits part BEFORE the fact join; at sf0.01 that's 66 parts of
    * 2000). The threshold is 0.2 × an exact-decimal average: one IEEE
    * multiply per part on both engines. */
  val tpchQ17: Q = Q(
    "q134_tpch_q17",
    (s, d) => {
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val lb = Tables.lineitem(s, d)
        .join(brandParts, col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val caps = lb.groupBy("l_partkey")
        .agg((lit(0.2) * davg(col("l_quantity"))).as("qty_cap"))
        .withColumnRenamed("l_partkey", "cap_partkey")
      lb.join(caps, col("l_partkey") === col("cap_partkey"))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""WITH lb AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#13'),
      caps AS (SELECT l_partkey AS cap_partkey,
          0.2 * ${sqlDavg("l_quantity")} AS qty_cap
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

  val all: Seq[Q] = Seq(tpchQ6, tpchQ7, tpchQ8, tpchQ9, tpchQ13,
    tpchQ15, tpchQ17, tpchQ22)
}

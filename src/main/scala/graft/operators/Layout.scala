package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for data
  * skipping.
  *
  * At 100 TB the scan cost of a selective query is decided before it
  * runs — by how the writer laid rows out. Sorting by ONE column gives
  * min/max pruning on that column only; a Morton (Z-order) key
  * interleaves the bits of several columns so that consecutive rows
  * are close in EVERY interleaved dimension, and row-group min/max
  * stats prune on each of them (the public mechanism behind Delta /
  * Iceberg `OPTIMIZE ZORDER BY`). The engine exposes the key as a
  * plain deterministic Column: `orderBy(zValue(...))` before a write
  * is the whole API, so any sink (parquet shards, bucketed tables,
  * [[TrainingExport]]) inherits the layout.
  *
  * Reference context: the reference app has no layout control at all —
  * its pandas frames are written in arrival order
  * (feature_extractor.py:47-54), which is exactly the layout this
  * operator exists to replace at scale.
  */
object Layout {
  import graft.Dsl._

  /** 16-bit × 16-bit Morton interleave of two non-negative integer
    * columns (x in even bits, y in odd bits) — a pure bit expression,
    * codegen-friendly, no UDF. Inputs are masked to 16 bits so the
    * key is total at any scale, WHICH MEANS THE CLUSTERING PROPERTY
    * ONLY HOLDS FOR DOMAINS ≤ 65535: above that, values 65536 apart
    * silently alias into the same key and row-group rectangles
    * degrade with no signal (TPC-H o_custkey crosses 65535 around
    * sf≈0.44). For larger domains use [[zValueScaled]], which
    * interleaves the high-order bits of a bucketed key instead of
    * the masked low bits. ScaleLayoutSpec asserts the audited q184
    * domains fit the 16-bit space at the test sf. */
  def zValue(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(65535L))
    val ym = y.bitwiseAND(lit(65535L))
    (0 until 16).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** [[zValue]] for domains beyond 16 bits: each dimension is first
    * bucketed into the 16-bit space by integer-dividing by
    * ceil((cap+1)/2^16), i.e. the HIGH-order bits of the scaled key
    * are interleaved instead of the masked low bits — two values far
    * apart in a 2^32 domain land in different buckets (coarser cells,
    * same clustering property), where the plain mask would alias them
    * into one key. `xCap`/`yCap` are inclusive upper bounds of the
    * dimension's domain (a writer knows them from stats or a footer
    * max; over-estimating only coarsens cells, never aliases).
    * Identical to [[zValue]] when both caps ≤ 65535 (width 1). */
  def zValueScaled(x: Column, xCap: Long, y: Column, yCap: Long): Column = {
    def width(cap: Long): Long = (cap >>> 16) + 1
    zValue(call_function("div", x, lit(width(xCap))),
      call_function("div", y, lit(width(yCap))))
  }

  /** SQL twin of [[zValueScaled]]. */
  def sqlZValueScaled(x: String, xCap: Long, y: String, yCap: Long): String =
    sqlZValue(s"(($x) // ${(xCap >>> 16) + 1})", s"(($y) // ${(yCap >>> 16) + 1})")

  /** SQL twin of [[zValue]] over two integer expressions. */
  def sqlZValue(x: String, y: String): String = {
    val xm = s"(($x) & 65535)"
    val ym = s"(($y) & 65535)"
    (0 until 16).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) + ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** q184 — Z-order layout audit over orders on (o_custkey, order day):
    * assign each row its Morton key, group into z-ranges (the row-group
    * analogue: key >> 16), and report each range's bounding rectangle
    * (min/max of BOTH dimensions) + row count. The rectangles ARE the
    * min/max stats a parquet writer would persist after
    * `orderBy(zValue)`; narrow rectangles in both dimensions = both
    * predicates prune. ScaleLayoutSpec quantifies it: a 30-day date
    * predicate overlaps a minority of z-ranges while pruning NOTHING
    * under a custkey-sorted layout of the same table.
    *
    * Scale shape: one scan, one hash-agg on the derived range id —
    * the audit is the same O(n) as the write it certifies; output is
    * #ranges rows. */
  val zorderAudit: Q = {
    Q(
      "q184_zorder_layout",
      (s, d) => {
        val day = expr("unix_seconds(cast(o_orderdate as timestamp)) div 86400")
        Tables.orders(s, d)
          .select(zValue(col("o_custkey"), day).as("z"),
            col("o_custkey"), day.as("day"))
          .groupBy(shiftright(col("z"), 16).as("z_range"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("o_custkey")).as("min_custkey"),
            max(col("o_custkey")).as("max_custkey"),
            min(col("day")).as("min_day"),
            max(col("day")).as("max_day"))
          .orderBy("z_range")
      },
      Some(s"""WITH xy AS MATERIALIZED (SELECT o_custkey,
            epoch_us(o_orderdate) // 1000000 // 86400 AS day
          FROM orders),
        z AS MATERIALIZED (SELECT o_custkey, day,
            ${sqlZValue("o_custkey", "day")} AS z
          FROM xy)
        SELECT z >> 16 AS z_range,
          cast(count(*) as bigint) AS n_rows,
          cast(min(o_custkey) as bigint) AS min_custkey,
          cast(max(o_custkey) as bigint) AS max_custkey,
          cast(min(day) as bigint) AS min_day,
          cast(max(day) as bigint) AS max_day
        FROM z GROUP BY 1 ORDER BY 1"""))
  }

  /** q215 — JOIN-KEY SKEW audit: per (table, join key), the exact
    * shape of the key's frequency distribution — row count, distinct
    * keys, the heaviest key's row count, the exact p99 key size, and
    * skew = max/avg as an integer ppm ratio. This is the number read
    * BEFORE a 100 TB join to decide between a plain hash join, AQE's
    * adaptive skew split, and [[Skew.saltedJoin]]'s deterministic
    * salting (a skew ratio of 1 means perfectly uniform keys; a
    * hot-key ratio in the thousands means one task receives a
    * thousand tasks' work and the join stalls on it).
    *
    * Exactness: per-key counts reduce to a COUNT-OF-COUNTS histogram
    * (the q113/q182 discipline — windows run over the bounded
    * histogram, never over keys), the p99 key size is the exact q203
    * rank selection over that histogram, and the skew ratio
    * max·n_keys·10⁶ div n_rows is computed in decimal(38,0)/HUGEINT
    * (count × count overflows int64 at the design point — q154/q210
    * discipline). One scan per audited table; three ~1-row outputs. */
  val joinSkewAudit: Q = Q(
    "q215_join_skew_audit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      def audit(df: org.apache.spark.sql.DataFrame, tbl: String,
          key: String): org.apache.spark.sql.DataFrame = {
        val hist = df.groupBy(col(key).as("k"))
          .agg(count(lit(1)).as("c"))
          .groupBy("c").agg(count(lit(1)).as("nk"))
        val w = hist.select(col("c"), col("nk"),
          sum(col("nk")).over(Window.orderBy(col("c"))
            .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
          sum(col("nk")).over(Window.orderBy(col("c"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("n_keys"),
          sum(col("c") * col("nk")).over(Window.orderBy(col("c"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("n_rows"),
          max(col("c")).over(Window.orderBy(col("c"))
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("max_key_rows"))
        w.withColumn("k99", expr("(99 * n_keys + 99) div 100"))
          .filter(col("cum") >= col("k99") &&
            col("cum") - col("nk") < col("k99"))
          .select(lit(tbl).as("tbl"), lit(key).as("key_col"),
            col("n_rows"), col("n_keys"), col("max_key_rows"),
            col("c").as("p99_key_rows"),
            expr("cast((cast(max_key_rows as decimal(38,0)) * n_keys" +
              " * 1000000) div n_rows as bigint)").as("skew_ppm"))
      }
      audit(Tables.lineitem(s, d), "lineitem", "l_orderkey")
        .unionAll(audit(Tables.orders(s, d), "orders", "o_custkey"))
        .unionAll(audit(Tables.events(s, d), "events", "user_id"))
        .orderBy("tbl")
    },
    Some {
      def sqlAudit(tbl: String, key: String): String =
        s"""SELECT '$tbl' AS tbl, '$key' AS key_col,
          cast(n_rows as bigint) AS n_rows,
          cast(n_keys as bigint) AS n_keys,
          cast(max_key_rows as bigint) AS max_key_rows,
          cast(c as bigint) AS p99_key_rows,
          cast((max_key_rows::hugeint * n_keys * 1000000) // n_rows
            as bigint) AS skew_ppm
        FROM (SELECT c, nk,
            sum(nk) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
            sum(nk) OVER () AS n_keys,
            sum(c * nk) OVER () AS n_rows,
            max(c) OVER () AS max_key_rows
          FROM (SELECT c, cast(count(*) as bigint) AS nk
            FROM (SELECT $key, count(*) AS c FROM $tbl GROUP BY 1)
            GROUP BY 1))
        WHERE cum >= (99 * n_keys + 99) // 100
          AND cum - nk < (99 * n_keys + 99) // 100"""
      s"""WITH li AS (${sqlAudit("lineitem", "l_orderkey")}),
        oo AS (${sqlAudit("orders", "o_custkey")}),
        ee AS (${sqlAudit("events", "user_id")})
        SELECT * FROM li UNION ALL SELECT * FROM oo
        UNION ALL SELECT * FROM ee
        ORDER BY tbl"""
    })

  /** q246 — compaction planner (first-fit-decreasing bin packing): a
    * year of per-batch appends leaves each source's data as many
    * small files whose open/footer cost dominates the scan (the
    * small-files decay [[LshBandIndex.compact]] fights physically —
    * this is the PLANNING half: which files merge into which output
    * bin). Files = the source's 16 content-hash shards with their
    * token masses; capacity = ⌈source total / 4⌉ (target ~4 merged
    * files); FFD — place each file, heaviest first (ties by shard id),
    * into the first bin with room, else open a new bin — the classic
    * 11/9·OPT+1 guarantee, deterministic by construction. An oversized
    * file opens its own (over-capacity) bin via the no-fit path.
    *
    * The packing recurrence is inherently sequential IN ONE SOURCE'S
    * FILE LIST — so it runs as a doc-local fold over the collected
    * per-source array (bounded: 16 entries, the q234 discipline),
    * never a cross-row window; sources pack in parallel. The ORACLE
    * replays the identical recurrence as a WITH RECURSIVE over the
    * ranked file list, so the fold is hash-proven, first-fit ties
    * included. Per-file masses are one map-combinable aggregate.
    *
    * Output per source: file count, total mass, capacity, bins used,
    * heaviest bin, and fill = total/(bins·cap) — ONE IEEE division of
    * exact longs (never ×10⁶ first: a 100 TB source's token total
    * would overflow int64 under the ppm scaling). */
  val compactionPlan: Q = Q(
    "q246_compaction_plan",
    (s, d) => {
      graft.functions.TextFunctions.register(s)
      val files = Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .select(col("source"),
          pmod(md5h61(concat(lit("shard:"), col("doc_id").cast("string"))),
            lit(16L)).as("shard"),
          size(toks(col("text"))).cast("long").as("mass"))
        .groupBy("source", "shard")
        .agg(sum(col("mass")).as("mass"))
      val packed = files.groupBy("source")
        .agg(collect_list(struct(col("mass"), col("shard"))).as("fl"),
          sum(col("mass")).cast("long").as("total_mass"),
          count(lit(1)).as("n_files"))
        .withColumn("cap", expr("(total_mass + 3) div 4"))
        .withColumn("sorted", array_sort(col("fl"), (a, b) =>
          when(a.getField("mass") > b.getField("mass"), -1)
            .when(a.getField("mass") < b.getField("mass"), 1)
            .when(a.getField("shard") < b.getField("shard"), -1)
            .when(a.getField("shard") > b.getField("shard"), 1)
            .otherwise(0)))
        .withColumn("bins", aggregate(col("sorted"),
          array().cast("array<long>"),
          (bins, f) => {
            val m = f.getField("mass")
            // sequence(1, 0) counts DOWN — guard the empty-bins case
            val idxs = when(size(bins) >= 1, sequence(lit(1), size(bins)))
              .otherwise(array().cast("array<int>"))
            // first bin with room; get() is null out-of-bounds (ANSI-
            // safe where element_at would throw)
            val fit = get(filter(idxs,
              i => element_at(bins, i) + m <= col("cap")), lit(0))
            when(fit.isNull, concat(bins, array(m)))
              .otherwise(zip_with(bins, idxs,
                (b, i) => when(i === fit, b + m).otherwise(b)))
          }))
      packed.select(col("source"), col("n_files"), col("total_mass"),
          col("cap"),
          size(col("bins")).cast("long").as("n_bins"),
          array_max(col("bins")).as("max_bin"),
          (col("total_mass").cast("double") /
            (size(col("bins")) * col("cap"))).as("fill"))
        .orderBy("source")
    },
    Some(s"""WITH RECURSIVE pd AS (SELECT source,
          ${sqlMd5h61("concat('shard:', doc_id)")} % 16 AS shard,
          cast(len(${sqlToks("text")}) as bigint) AS mass
        FROM documents),
      files AS MATERIALIZED (SELECT source, shard,
          cast(sum(mass) as bigint) AS mass
        FROM pd GROUP BY 1, 2),
      caps AS MATERIALIZED (SELECT source,
          cast(count(*) as bigint) AS n_files,
          cast(sum(mass) as bigint) AS total_mass,
          (cast(sum(mass) as bigint) + 3) // 4 AS cap
        FROM files GROUP BY 1),
      rk AS MATERIALIZED (SELECT source, mass, row_number() OVER (
          PARTITION BY source ORDER BY mass DESC, shard) AS i
        FROM files),
      rec AS (
        SELECT r.source, r.i, [r.mass] AS bins, c.cap
        FROM rk r JOIN caps c USING (source) WHERE r.i = 1
        UNION ALL
        SELECT r.source, r.i,
          CASE WHEN list_filter(generate_series(1, len(rec.bins)),
              j -> rec.bins[j] + r.mass <= rec.cap)[1] IS NULL
            THEN rec.bins || [r.mass]
            ELSE list_transform(generate_series(1, len(rec.bins)),
              j -> CASE WHEN j = list_filter(
                  generate_series(1, len(rec.bins)),
                  k -> rec.bins[k] + r.mass <= rec.cap)[1]
                THEN rec.bins[j] + r.mass ELSE rec.bins[j] END)
          END AS bins, rec.cap
        FROM rec JOIN rk r ON r.source = rec.source AND r.i = rec.i + 1),
      fin AS (SELECT source, max(i) AS mi FROM rec GROUP BY 1),
      last AS (SELECT rec.source, rec.bins FROM rec
        JOIN fin ON rec.source = fin.source AND rec.i = fin.mi)
      SELECT c.source, c.n_files, c.total_mass, c.cap,
        cast(len(l.bins) as bigint) AS n_bins,
        cast(list_max(l.bins) as bigint) AS max_bin,
        cast(c.total_mass as double) / (len(l.bins) * c.cap) AS fill
      FROM caps c JOIN last l USING (source) ORDER BY c.source"""))

  /** q248 — join-size forecaster: |A ⋈ B on k| = Σ_k c_A(k)·c_B(k),
    * computed from the two per-key HISTOGRAMS before the join ever
    * runs — the planner input that decides broadcast vs shuffle vs
    * salt (q215 measures one table's skew; this prices the JOIN:
    * total output rows, the single hottest key's contribution, and
    * its share). Histograms are map-combinable aggregates orders of
    * magnitude smaller than the tables; the histogram-level equi-join
    * touches |matched keys| rows. Products and their sum run in
    * decimal(38,0)/HUGEINT (count × count, then a corpus-sized sum —
    * both overflow int64 at the design point; the q215 discipline),
    * surfaced as bigint at testdata scale. Audits the two TPC-H
    * one-to-many edges: customer→orders (custkey) and orders→lineitem
    * (orderkey). orders is read twice — once per audited edge, in two
    * different key roles (semantic, the q130 nation precedent). */
  val joinSizeForecast: Q = Q(
    "q248_join_size_forecast",
    (s, d) => {
      def forecast(name: String, left: org.apache.spark.sql.DataFrame,
          lk: String, right: org.apache.spark.sql.DataFrame, rk: String)
          : org.apache.spark.sql.DataFrame = {
        val h1 = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("c1"))
        val h2 = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("c2"))
        h1.join(h2, "k")
          .select((col("c1") * col("c2")).cast(DecimalType38).as("p"))
          .agg(count(lit(1)).as("n_join_keys"),
            sum(col("p")).as("fc"), max(col("p")).as("mx"))
          .select(lit(name).as("edge"),
            col("n_join_keys"),
            col("fc").cast("long").as("forecast_rows"),
            col("mx").cast("long").as("max_key_rows"),
            // `div`, not `/`: decimal `/` ROUNDS at the result scale
            // while DuckDB `//` floors (the q215 discipline)
            when(col("fc") > 0, expr("(mx * 1000000) div fc").cast("long"))
              .as("top_share_ppm"))
      }
      forecast("customer-orders", Tables.customer(s, d), "c_custkey",
          Tables.orders(s, d), "o_custkey")
        .unionAll(forecast("orders-lineitem", Tables.orders(s, d),
          "o_orderkey", Tables.lineitem(s, d), "l_orderkey"))
        .orderBy("edge")
    },
    Some {
      def sqlForecast(name: String, lt: String, lk: String, rt: String,
          rk: String): String =
        s"""SELECT '$name' AS edge,
          cast(count(*) as bigint) AS n_join_keys,
          cast(sum(p) as bigint) AS forecast_rows,
          cast(max(p) as bigint) AS max_key_rows,
          CASE WHEN sum(p) > 0 THEN
            cast(max(p) * 1000000 // sum(p) as bigint) END
            AS top_share_ppm
        FROM (SELECT h1.c1::hugeint * h2.c2::hugeint AS p
          FROM (SELECT $lk AS k, count(*) AS c1 FROM $lt GROUP BY 1) h1
          JOIN (SELECT $rk AS k, count(*) AS c2 FROM $rt GROUP BY 1) h2
            USING (k))"""
      s"""${sqlForecast("customer-orders", "customer", "c_custkey",
          "orders", "o_custkey")}
        UNION ALL
        ${sqlForecast("orders-lineitem", "orders", "o_orderkey",
          "lineitem", "l_orderkey")}
        ORDER BY edge"""
    })

  private val DecimalType38 = org.apache.spark.sql.types.DecimalType(38, 0)

  val all: Seq[Q] = Seq(zorderAudit, joinSkewAudit, compactionPlan,
    joinSizeForecast)
}

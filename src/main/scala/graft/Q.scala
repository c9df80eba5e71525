package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine operator exposed as a named query.
  *
  * @param name   stable key, referenced by SparkEntry / Verify / Bench
  * @param run    Spark implementation; `dir` is a testdata sf directory
  * @param oracle equivalent ANSI SQL for the DuckDB oracle (None → the
  *               driver records a weaker rows-only check; used for ops whose
  *               semantics are not SQL-expressible, e.g. ML or LSH internals)
  * @param bench  member of the headline benchmark set run by [[Bench]]
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** events.ts has shipped in two physical layouts across driver
    * testdata generations: parquet TIMESTAMP(NANOS) — which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]) unless read as raw nanos
    * via the legacy conf and converted (integer `div` — double math
    * would lose precision above 2^53 ns) — and, since the round-10
    * regeneration, plain TIMESTAMP(MICROS) without isAdjustedToUTC,
    * which arrives as TIMESTAMP_NTZ. Branch on the arrived type; every
    * graft session pins spark.sql.session.timeZone=UTC, so the
    * NTZ→timestamp cast is value-preserving and matches DuckDB's naive
    * reading of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Shared column helpers that keep Spark results bit-identical to the
  * DuckDB oracle.
  *
  * Floating-point sums are order-dependent, so `sum(double)` can differ in
  * the last ulp between engines. We instead sum EXACTLY in decimal(18,4)
  * and cast the exact result back to double — both engines then produce the
  * identical IEEE value. The SQL-side twin is
  * `cast(sum(cast(x as decimal(18,4))) as double)`.
  */
object Dsl {
  val Dec: DecimalType = DecimalType(18, 4)

  /** decimal → double via an int+frac split. DuckDB's cast of an
    * int128-scaled decimal converts the scaled integer to double BEFORE
    * dividing by the scale, so once the scaled sum passes 2^53 the
    * fraction is lost (observed on q114 at sf0.1); Spark's BigDecimal
    * cast rounds correctly, and the engines diverge. Both engines
    * instead convert floor(s) and s−floor(s) — each exact in double —
    * and run one identical IEEE add. */
  def splitDbl(c: Column): Column =
    floor(c).cast(DoubleType) + (c - floor(c)).cast(DoubleType)

  /** SQL twin of [[splitDbl]] over a decimal expression. */
  def sqlSplitDbl(e: String): String =
    s"(cast(floor($e) as double) + cast(($e) - floor($e) as double))"

  /** Exact decimal sum, returned as double (bit-identical across engines
    * at any magnitude — see [[splitDbl]]). */
  def dsum(c: Column): Column = splitDbl(sum(c.cast(Dec)))

  /** Exact average: exact decimal sum (as double) / count — a single IEEE
    * division of identical operands on both engines. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL twin of [[dsum]]. */
  def sqlDsum(expr: String): String =
    sqlSplitDbl(s"sum(cast($expr as decimal(18,4)))")

  /** SQL twin of [[davg]]. */
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / count($expr)"

  // --------------------------------------------------------------------
  // Cross-engine deterministic hashing.
  //
  // DuckDB's md5_number_lower(s) is the little-endian uint64 of md5-digest
  // bytes 8..15 (verified empirically). Spark reconstructs the identical
  // value from the md5 hex string by reversing the byte pairs of chars
  // 17..32 and converting base-16 → base-10 (conv handles unsigned 64-bit).
  // Both sides then reduce mod 2^61 so the value fits a signed BIGINT.
  // This gives one shared 61-bit hash for MinHash/SimHash/fingerprints.
  // --------------------------------------------------------------------
  val H61Mod = 2305843009213693952L // 2^61

  /** 61-bit content hash, bit-identical to the DuckDB twin [[sqlMd5h61]].
    * Declarative (built-ins only — resolves on ANY session); kept as the
    * differential twin of the native fast path. */
  def md5h61Decl(c: Column): Column = {
    val hex = md5(c.cast(BinaryType))
    val le = concat((7 to 0 by -1).map(i => substring(hex, 17 + 2 * i, 2)): _*)
    (conv(le, 16, 10).cast(DecimalType(20, 0)) % lit(H61Mod)).cast(LongType)
  }

  /** Same hash via the native [[graft.functions.Md5Hash61]] expression
    * (one digest + one floorMod instead of 8 substrings + conv + decimal
    * mod per value). Requires the graft function registry —
    * GraftExtensions (spark.sql.extensions, set by Verify/Bench/tests)
    * or TextFunctions.register(session). PropertySpec pins it to
    * [[md5h61Decl]] bit-exactly. */
  def md5h61(c: Column): Column =
    call_function("md5h61", c.cast(BinaryType))

  /** SQL twin of [[md5h61]]. */
  def sqlMd5h61(expr: String): String =
    s"cast(md5_number_lower($expr) % $H61Mod as bigint)"

  /** Whitespace class written out explicitly, in class-body form so
    * negated classes can embed it. A bare `\s` is a cross-engine trap:
    * Java's includes U+000B (vertical tab) but RE2's does not, so the
    * two engines silently tokenize a vertical-tab document differently
    * (the q155 lesson, centralized here). The reference's Python `re`
    * treats U+000B as whitespace too, so the Java reading is the
    * parity-correct side; Java regex and RE2 both read this source
    * text identically (verified against DuckDB 1.0: chr(11) splits
    * under this class and does NOT split under RE2's `\s+`). */
  val WsChars: String = " \\t\\n\\f\\r\\x0B"

  /** Whitespace tokenizer — both engines split on the explicit
    * [[WsChars]] class after trim. */
  def toks(c: Column): Column = split(trim(c), s"[$WsChars]+")

  /** SQL twin of [[toks]]. */
  def sqlToks(expr: String): String =
    s"string_split_regex(trim($expr), '[$WsChars]+')"

  /** Word 3-gram shingles over a token array (1-based element access on
    * both engines). The index sequence is guarded: Spark's sequence(1, 0)
    * counts DOWN to [1,0] (and element_at(t, 0) throws under ANSI) while
    * DuckDB generate_series(1, 0) is empty — so docs with < 3 tokens must
    * yield [] here, matching the SQL twin, regardless of operator order. */
  def shingles3(t: Column): Column = {
    val idx = when(size(t) >= 3, sequence(lit(1), size(t) - 2))
      .otherwise(array().cast("array<int>"))
    transform(idx, i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
  }

  /** SQL twin of [[shingles3]] over a token-array expression. */
  def sqlShingles3(t: String): String =
    s"list_transform(generate_series(1, len($t) - 2), i -> concat_ws(' ', $t[i], $t[i+1], $t[i+2]))"

  /** Scale-adaptive spread for a heavy per-row projection over a scan:
    * repartition by `key` ONLY when the scan yields fewer input splits
    * than the session's shuffle partitions. The driver testdata ships
    * single-row-group parquet, so a projection-only operator (DSIR
    * scoring, markup strip, CDC rolling hashes) otherwise serializes
    * its whole per-row compute onto ONE task regardless of core count;
    * at 100 TB the file set already carries ≥ that many splits and this
    * is a NO-OP — the operator keeps its zero-shuffle scan shape (the
    * condition derives from input size, never a constant tuned for
    * either mode). Keyed, never round-robin: a deterministic hash key
    * reproduces the same row→partition map under task retry (guide
    * §2.5's rand-repartition duplication trap). */
  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions < parts) df.repartition(parts, key) else df
  }
}

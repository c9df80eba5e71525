package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator for exact decimal moments: count, Σx, Σx² (both sums held
  * as exact BigDecimal so merge order cannot change the result). */
final case class MomentsBuf(n: Long, sum: java.math.BigDecimal,
    sumSq: java.math.BigDecimal)

/** Typed UDAF (SURVEY §2.10 extension tier): exact second-moment
  * aggregation over a decimal column.
  *
  * Population variance computed the naive way on doubles is
  * order-dependent (floating addition does not associate), so a bench
  * rerun or a different partitioning could flip the last ulp and break
  * the cross-engine hash. This Aggregator keeps (n, Σx, Σx²) in exact
  * BigDecimal — addition is associative and commutative there — and only
  * converts to double in `finish`, once. The DuckDB oracle twin does the
  * same with decimal sums, so var_pop = (Σx² − (Σx)²/n)/n is evaluated
  * over bit-identical operands on both engines.
  *
  * This is the "typed Aggregator" surface of the UDF tier list (native
  * Expression > Aggregator > UDF); unlike a Scala UDF it gets map-side
  * partial aggregation — at 100 TB the shuffle carries one (n, Σx, Σx²)
  * triple per group per task, not rows.
  */
object ExactMoments extends Aggregator[java.math.BigDecimal, MomentsBuf,
    (Long, Double, Double)] {
  private val Z = java.math.BigDecimal.ZERO

  override def zero: MomentsBuf = MomentsBuf(0L, Z, Z)

  override def reduce(b: MomentsBuf, x: java.math.BigDecimal): MomentsBuf =
    if (x == null) b
    else MomentsBuf(b.n + 1, b.sum.add(x), b.sumSq.add(x.multiply(x)))

  override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf =
    MomentsBuf(a.n + b.n, a.sum.add(b.sum), a.sumSq.add(b.sumSq))

  /** (n, Σx as double, Σx² as double) — the double conversion happens
    * exactly once, on the exact totals (round-half-even, matching
    * DuckDB's decimal→double cast). */
  override def finish(r: MomentsBuf): (Long, Double, Double) =
    (r.n, r.sum.doubleValue(), r.sumSq.doubleValue())

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product
  override def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
      Encoders.scalaDouble)
}

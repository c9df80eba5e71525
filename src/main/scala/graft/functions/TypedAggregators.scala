package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregation surface (org.apache.spark.sql.expressions.Aggregator
  * — the user-facing typed tier between built-in functions and raw
  * TypedImperativeAggregate).
  *
  * BoundedTopK keeps the k largest values per group in a bounded buffer —
  * the typed twin of the TopKPerGroup physical operator, usable inside
  * Dataset.groupByKey(...).agg(...) where rows are case classes.
  */
object TypedAggregators {

  /** Top-k doubles per group, descending, as a sorted array. The buffer
    * is capped at k elements so reduce/merge stay O(k). */
  final case class BoundedTopK(k: Int)
      extends Aggregator[Double, List[Double], Seq[Double]] {
    override def zero: List[Double] = Nil
    override def reduce(buf: List[Double], v: Double): List[Double] =
      (v :: buf).sorted(Ordering[Double].reverse).take(k)
    override def merge(a: List[Double], b: List[Double]): List[Double] =
      (a ++ b).sorted(Ordering[Double].reverse).take(k)
    override def finish(buf: List[Double]): Seq[Double] = buf
    override def bufferEncoder: Encoder[List[Double]] =
      Encoders.kryo[List[Double]]
    override def outputEncoder: Encoder[Seq[Double]] =
      Encoders.kryo[Seq[Double]]
  }

  /** Exact mean via (sum, count) pairs — associative merge, no
    * precision-order surprises beyond IEEE addition. */
  final case class MeanAgg()
      extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), v: Double): (Double, Long) =
      (b._1 + v, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

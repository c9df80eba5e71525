package graft

import graft.functions.TypedAggregators.{BoundedTopK, MeanAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Catalyst can generate its encoder (inner classes need
  * outer-scope access). */
case class TypedOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

/** Typed Dataset surface: case-class Datasets, groupByKey with custom
  * Aggregators, mapGroups — cross-checked against the DataFrame API. */
class TypedApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val orders = {
    import spark.implicits._
    Tables.orders(spark, TestSpark.sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[TypedOrder]
  }

  test("typed BoundedTopK aggregator matches the DataFrame window top-k") {
    import spark.implicits._
    val typed = orders.groupByKey(_.o_custkey)
      .mapValues(_.o_totalprice)
      .agg(BoundedTopK(3).toColumn)
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"))
    val expected = orders.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .view.mapValues(_.map(_.getAs[Double]("o_totalprice")).sorted.reverse.toSeq)
      .toMap
    assert(typed.keySet == expected.keySet)
    typed.foreach { case (k, top) =>
      assert(top.toSeq == expected(k), s"customer $k")
    }
  }

  test("typed MeanAgg over mapped values equals DataFrame avg") {
    import spark.implicits._
    val typed = orders.map(_.o_totalprice)
      .groupByKey(_ => 0)
      .agg(MeanAgg().toColumn)
      .collect().head._2
    val frame = orders.toDF().agg(avg("o_totalprice")).collect()(0).getDouble(0)
    assert(math.abs(typed - frame) < 1e-6)
  }

  test("mapGroups computes a per-customer summary") {
    import spark.implicits._
    val summaries = orders.groupByKey(_.o_custkey)
      .mapGroups { (cust, rows) =>
        val prices = rows.map(_.o_totalprice).toSeq
        (cust, prices.size, prices.max)
      }
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    val expected = orders.toDF().groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("o_totalprice").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getDouble(2))).toMap
    assert(summaries == expected)
  }
}

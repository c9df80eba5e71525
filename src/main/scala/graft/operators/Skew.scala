package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows, the
  * hash-shuffle sends that key's entire volume to a single task. Salting
  * splits the hot key's rows across `n` buckets (deterministic per-row
  * salt on the big side) and replicates the small side `n` times, so the
  * join runs on (key, salt) with n-way parallelism per key. AQE's skew
  * handling covers sort-merge cases adaptively; explicit salting is the
  * deterministic tool when the skew is known (e.g. null-ish default keys
  * in training-data pipelines).
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted n
    * ways. The salt is derived from a content hash of the big side's full
    * row, so it is deterministic under re-execution and repartitioning. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      n: Int): DataFrame = {
    require(n > 0)
    val saltCol: Column =
      pmod(hash(big.columns.map(col): _*), lit(n))
    val saltedBig = big.withColumn("__salt", saltCol)
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until n).map(lit): _*)))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key))
      .drop("__salt")
  }
}

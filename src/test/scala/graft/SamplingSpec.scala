package graft

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-sampling semantics: content-hash samples must be pure
  * functions of row content — stable across reruns and partitionings —
  * and split assignment must partition every row exactly once. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("hash sample is deterministic and partitioning-independent") {
    val q = SparkEntry.queries("q77_hash_sample")
    val first = q(spark, sf).collect().map(_.getLong(0)).toSeq
    val second = q(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(first == second, "same input must yield the identical sample")
    assert(first.nonEmpty, "5% of orders must be non-empty at sf0.001")
    // ~5% of 1500 orders; hash buckets are uniform so allow wide slack
    assert(first.size > 20 && first.size < 200, s"got ${first.size} rows")
    // partitioning independence: recompute the bucket after an explicit
    // repartition — membership must not change (unlike df.sample)
    import org.apache.spark.sql.functions._
    val repart = Tables.orders(spark, sf).repartition(13)
      .filter(Dsl.md5h61(concat(lit("sample:"), col("o_orderkey").cast("string"))) % 100 < 5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(repart == first.toSet)
  }

  test("stratified split covers every doc exactly once with ~80/10/10 mass") {
    val rows = SparkEntry.queries("q78_stratified_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = rows.values.sum
    val nDocs = Tables.documents(spark, sf).count()
    assert(total == nDocs, "split must partition the table exactly")
    val bySplit = rows.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(bySplit("train").toDouble / total > 0.7, s"train share: $bySplit")
    assert(bySplit.keySet == Set("train", "valid", "test"))
  }

  test("group quota sample takes exactly k=3 per language, deterministically") {
    val df = SparkEntry.queries("q79_group_quota_sample")(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 3), s"per-lang counts: $perLang")
    val again = SparkEntry.queries("q79_group_quota_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("temperature sampling flattens the language mix toward sqrt(n)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 400/100/25 docs: keep probabilities sqrt(25/n) = 0.25 / 0.5 / 1.0
    val docs = (
      (0 until 400).map(i => (i.toLong, s"a $i", "aa", "s", 10L)) ++
      (0 until 100).map(i => (1000L + i, s"b $i", "bb", "s", 10L)) ++
      (0 until 25).map(i => (2000L + i, s"c $i", "cc", "s", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = TestSpark.makeSfDir("documents" -> docs)
    val rows = SparkEntry.queries("q126_temperature_sample")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("cc") == (25L, 25L), "smallest language keeps 100%")
    val (n400, k400) = rows("aa"); val (n100, k100) = rows("bb")
    assert(n400 == 400 && k400 > 60 && k400 < 140, s"aa kept $k400 of 400 (expect ~100)")
    assert(n100 == 100 && k100 > 30 && k100 < 70, s"bb kept $k100 of 100 (expect ~50)")
    // keep FRACTION strictly decreases with language size
    assert(k400.toDouble / n400 < k100.toDouble / n100 && k100 < n100)
    // determinism: rerun yields identical audit
    val again = SparkEntry.queries("q126_temperature_sample")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == rows)
  }
}

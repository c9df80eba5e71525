package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    val base = Tables.documents(spark, d)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), Dsl.toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
    base.count()
    val sets = base.select(col("doc_id"), array_distinct(Dsl.shingles3(col("t"))).as("sh"))
    time("sets")(sets.count())
    val expl = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode")(expl.count())
    time("explode2")(expl.count())
    val hashed = expl.select(col("doc_id"), Dsl.md5h61(col("s")).as("h"))
    time("md5h61")(hashed.filter(col("h") % 97 === 0).count())
    val dec = hashed.select(col("doc_id"), col("h").cast(DecimalType(38,0)).as("h"))
    val one = dec.select(col("doc_id"), ((lit(BigDecimal(123457L)) * col("h") + lit(BigDecimal(99L))) % lit(BigDecimal(2305843009213693951L))).cast(LongType).as("h0"))
    time("1 rehash")(one.filter(col("h0") % 97 === 0).count())
    time("q36")(SparkEntry.queries("q36_minhash_signatures")(spark, d).count())
    spark.stop()
  }
}

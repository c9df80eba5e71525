package graft

import graft.apps.{AppSchema, QueryService}
import graft.pipeline.AppModels
import graft.sources.CsvIngest
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end reference parity: CSV ingest → drift union → cast →
  * train (K-Means + RF) → API projection → the 8 serving queries. */
class AppPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A small apps fixture exercising: null score/installs/price rows
    * (validity filter), an unknown genre (handleInvalid=skip), duplicate
    * titles, tied scores (FIXTURES.md §1 guidance). */
  private def writeFixtureCsv(): String = {
    val dir = Files.createTempDirectory("graft-apps").toFile
    dir.deleteOnExit()
    val rng = new scala.util.Random(11)
    val genres = Seq("Tools", "Games", "Social", "Education", "Finance")
    val rows = (0 until 60).map { i =>
      val genre = if (i == 59) "UnknownGenre" else genres(i % genres.size)
      val score = if (i % 10 == 9) "" else f"${1.0 + rng.nextDouble() * 4}%.2f"
      val installs = if (i % 15 == 14) "" else (1000L * (i + 1)).toString
      val price = if (i % 20 == 19) "" else f"${rng.nextDouble() * 5}%.2f"
      s"""app.id.$i,"App ${if (i % 7 == 0) "Dup Title" else s"Number $i"}",$genre,$score,$installs,$price,"Dev $i, Inc.",dev$i"""
    }
    val header = "appId,title,genre,score,minInstalls,price,developer,developerId"
    val f = new java.io.File(dir, "batch_1.csv")
    val w = new java.io.PrintWriter(f)
    w.println(header); rows.foreach(w.println); w.close()
    dir.getAbsolutePath
  }

  private lazy val apps: DataFrame = {
    val raw = CsvIngest.readBatchDir(spark, writeFixtureCsv())
    CsvIngest.enforceOrder(raw)
  }

  test("csv ingest reads quoted fields and keeps everything string-typed") {
    assert(apps.count() == 60)
    assert(apps.schema.fields.forall(_.dataType.typeName == "string"))
    val dev = apps.filter(org.apache.spark.sql.functions.col("appId") === "app.id.3")
      .select("developer").collect()(0).getString(0)
    assert(dev == "Dev 3, Inc.", "quoted comma must survive")
  }

  test("permissive typed read quarantines malformed rows instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "batch.csv")
    val w = new java.io.PrintWriter(f)
    w.println("appId,score,minInstalls")
    w.println("app.a,4.5,1000")
    w.println("app.b,not-a-number,2000") // untypeable score
    w.println("app.c,3.9,500")
    w.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("appId",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("minInstalls",
        org.apache.spark.sql.types.LongType)))
    val (good, bad, raw) = CsvIngest.readTypedWithQuarantine(
      spark, dir.getAbsolutePath, schema)
    try {
      assert(good.count() == 2, "clean rows parse")
      assert(good.schema("score").dataType.typeName == "double")
      val lines = bad.collect().map(_.getString(0))
      assert(lines.length == 1 && lines(0).contains("not-a-number"),
        "the malformed raw line is preserved for replay")
    } finally raw.unpersist()
  }

  test("canonical column order is enforced with nulls for missing columns") {
    val prefix = AppSchema.canonicalColumns.filter(apps.columns.contains)
    assert(apps.columns.take(prefix.length).toSeq == prefix)
    assert(apps.columns.contains("icon_path"), "missing canonical cols added")
  }

  test("drift union reconciles batches with different column sets") {
    import spark.implicits._
    val a = Seq(("x", "1")).toDF("appId", "score")
    val b = Seq(("y", "Games")).toDF("appId", "genre")
    val u = CsvIngest.driftUnion(Seq(a, b))
    assert(u.columns.toSet == Set("appId", "score", "genre"))
    assert(u.count() == 2)
    assert(u.filter($"appId" === "y").select("score").collect()(0).isNullAt(0))
  }

  test("two-phase cast types only the mapped columns that exist") {
    val typed = CsvIngest.castColumns(apps, AppSchema.trainingCastMap)
    assert(typed.schema("score").dataType.typeName == "double")
    assert(typed.schema("minInstalls").dataType.typeName == "long")
    assert(typed.schema("title").dataType.typeName == "string")
  }

  test("training pipeline: validity filter, 5 clusters, finite RMSE, skip drops unknown genres") {
    AppModels.train(apps) match {
      case Left(err) => fail(err)
      case Right(r) =>
        val clusters = r.clusterCounts.collect().map(_.getInt(0))
        assert(clusters.length <= 5)
        assert(r.rmse > 0 && r.rmse < 5, s"rmse=${r.rmse}")
        // handleInvalid="skip" DROPS unseen-genre rows at transform —
        // the reference does the same (spark_script.py:77), which is why
        // its final API data can be smaller than the input
        assert(r.scored.count() == 59)
        val unknown = r.scored
          .filter(org.apache.spark.sql.functions.col("genre") === "UnknownGenre")
          .count()
        assert(unknown == 0,
          "unknown-genre rows are removed by handleInvalid=skip")
    }
  }

  test("min-rows gate aborts training") {
    assert(AppModels.train(apps.limit(5)).isLeft)
  }

  test("pipeline models survive a save/load round trip (MLWritable surface)") {
    val r = AppModels.train(apps).toOption.get
    val dir = Files.createTempDirectory("graft-models").toFile
    dir.deleteOnExit()
    val kmPath = s"${dir.getAbsolutePath}/app_model_kmeans"
    r.kmeansModel.write.overwrite().save(kmPath)
    val reloaded = org.apache.spark.ml.PipelineModel.load(kmPath)
    val typed = CsvIngest.castColumns(apps, AppSchema.trainingCastMap)
    val a = r.kmeansModel.transform(typed).select("appId", "cluster")
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    val b = reloaded.transform(typed).select("appId", "cluster")
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(a == b, "reloaded model must reproduce cluster assignments")
  }

  test("the 8 serving queries behave like app.py") {
    val r = AppModels.train(apps).toOption.get
    val tmp = Files.createTempDirectory("graft-api").toFile
    tmp.deleteOnExit()
    val path = s"${tmp.getAbsolutePath}/api_app_info_test"
    AppModels.saveApiData(r.scored, path)
    val served = CsvIngest.castColumns(
      spark.read.parquet(path).cache(), AppSchema.servingCastMap)
    val svc = new QueryService(served)

    val (n, cols, sample) = svc.checkData
    assert(n == 59 && cols.contains("cluster") && sample.count() == 3)

    val cats = svc.categories.collect().map(_.getString(0))
    assert(cats.sameElements(cats.sorted) && cats.contains("Games"))

    val sugg = svc.searchSuggestions("dup").collect()
    assert(sugg.nonEmpty && sugg.length <= 15)
    assert(sugg.forall(_.getString(0).toLowerCase.contains("dup")))
    intercept[IllegalArgumentException](svc.searchSuggestions("d"))

    assert(svc.appDetailsById("app.id.3").count() == 1)
    assert(svc.appDetailsById("no.such.app").count() == 0)

    val rec = svc.recommendByCategory("GAMES").collect()
    assert(rec.nonEmpty && rec.length <= 20)

    assert(svc.topApps("not_a_column").isEmpty)
    val top = svc.topApps("score", 5, Some("tools")).get.collect()
    assert(top.length <= 5)
    val scores = top.map(r0 => Option(r0.getAs[Float]("score")).getOrElse(Float.MinValue))
    assert(scores.sameElements(scores.sortBy(-(_: Float))))

    val simKnown = svc.similarAppsByName("app dup title")
    assert(simKnown.isDefined && simKnown.get.count() <= 10)
    assert(svc.similarAppsByName("nonexistent app").isEmpty)

    assert(svc.appsInCluster(0).isDefined)
    val noCluster = new QueryService(served.drop("cluster"))
    assert(noCluster.appsInCluster(0).isEmpty)
  }
}

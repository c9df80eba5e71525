package graft

import graft.apps.{ApiServer, AppSchema, QueryService}
import graft.pipeline.AppModels
import graft.sources.CsvIngest
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP serving: the 8 reference endpoints over a trained
  * apps table, hit through real sockets. */
class ApiServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val server: ApiServer = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val genres = Seq("Tools", "Games", "Social")
    val apps = (0 until 40).map { i =>
      (s"app.id.$i", s"App Number $i", genres(i % 3),
        f"${1.0 + rng.nextDouble() * 4}%.2f", (1000L * (i + 1)).toString,
        f"${rng.nextDouble() * 5}%.2f")
    }.toDF("appId", "title", "genre", "score", "minInstalls", "price")
    val r = AppModels.train(CsvIngest.enforceOrder(apps)).toOption.get
    val served = CsvIngest.castColumns(
      r.scored.select("appId", "title", "genre", "score", "minInstalls",
        "price", "cluster", "PredictedRating"),
      AppSchema.servingCastMap).cache()
    val s = new ApiServer(new QueryService(served), 0) // ephemeral port
    s.start()
    s
  }

  private lazy val client = HttpClient.newHttpClient()
  private def get(path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://localhost:${server.boundPort}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("all 8 endpoints answer with reference semantics") {
    try {
      val (c1, b1) = get("/check_data")
      assert(c1 == 200 && b1.contains("\"row_count\": 40"))

      val (c2, b2) = get("/categories")
      assert(c2 == 200 && b2.contains("Games") && b2.contains("Tools"))

      val (c3, b3) = get("/search_app_suggestions?q=number%201")
      assert(c3 == 200 && b3.toLowerCase.contains("number 1"))
      assert(get("/search_app_suggestions?q=x")._1 == 400, "short query -> 400")

      val (c4, b4) = get("/app_details_by_id/app.id.3")
      assert(c4 == 200 && b4.contains("app.id.3"))
      assert(get("/app_details_by_id/no.such")._1 == 404)

      assert(get("/recommend_apps_by_category/GAMES")._1 == 200)

      val (c5, b5) = get("/top_apps?sort_by=score&limit=5")
      assert(c5 == 200 && b5.count(_ == '{') <= 5)
      assert(get("/top_apps?sort_by=nope")._1 == 400)

      val (c6, _) = get("/recommend_similar_app_by_name/app%20number%207")
      assert(c6 == 200)
      assert(get("/recommend_similar_app_by_name/zzz")._1 == 404)

      assert(get("/apps_in_cluster/0")._1 == 200)
      assert(get("/apps_in_cluster/banana")._1 == 400)
    } finally server.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The HTTP serving analog (reference `main.py:25-177`), driven end-to-end
  * over a real socket: health, trigger (success AND the 500+suggestion
  * error contract), verification inventory, gold samples, and status. */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val client = HttpClient.newHttpClient()

  private def get(base: String, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(base: String, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())

  test("the five reference endpoints serve the contract") {
    val server = Serve.start(spark, TestSpark.Sf0001, 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val health = get(base, "/")
      assert(health.statusCode() == 200)
      Serve.Endpoints.foreach(e => assert(health.body().contains(e)))

      // GET on the trigger route is rejected like the Flask POST-only route
      assert(get(base, "/trigger-etl").statusCode() == 405)

      val trigger = post(base, "/trigger-etl")
      assert(trigger.statusCode() == 200, trigger.body().take(300))
      assert(trigger.body().contains("\"status\":\"success\""))
      assert(trigger.body().contains(
        "\"layers_processed\":[\"bronze\",\"silver\",\"gold\"]"))
      assert(trigger.body().contains("duration_sec"))

      val verify = get(base, "/verify-results")
      assert(verify.statusCode() == 200)
      Pipeline.defaultLayers().flatMap(_._2.map(_._1)).foreach { t =>
        assert(verify.body().contains(s"""{"table":"$t","present":true"""), t)
      }
      assert(!verify.body().contains("\"rows\":-1"))

      val sample = get(base, "/sample-data")
      assert(sample.statusCode() == 200)
      assert(sample.body().contains("gold_sales_analytics"))
      assert(sample.body().contains("total_amount") ||
        sample.body().contains("\"rows\":["), sample.body().take(300))

      val status = get(base, "/status")
      assert(status.statusCode() == 200)
      assert(status.body().contains("\"spark_version\""))
      assert(status.body().contains("\"declared_queries\""))

      assert(get(base, "/nope").statusCode() == 404)
    } finally server.stop(0)
  }

  test("a failed layer returns 500 with the reference's suggestion contract") {
    val server = Serve.start(spark, "/nonexistent/path", 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val r = post(base, "/trigger-etl")
      assert(r.statusCode() == 500, r.body().take(300))
      assert(r.body().contains("\"status\":\"error\""))
      assert(r.body().contains("\"suggestion\""))
      assert(r.body().contains("\"layers_processed\":[]"))
    } finally server.stop(0)
  }
}

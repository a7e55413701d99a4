package graft.pipeline

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the webhook failure branch (ref dags/dag_factory.py:80-87): one HTTP
  * POST per alert, JSON `{"text": ...}` body carrying the REAL failure
  * details (the reference templates a never-written `dq_summary['errors']`
  * key — reproducing that bug is explicitly out of scope, SURVEY.md §7.4-6).
  */
class WebhookAlertSinkSpec extends AnyFunSuite {

  private def withServer(f: (String, () => Option[(String, String)]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var last: Option[(String, String)] = None // (content-type, body)
    server.createContext("/hook", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      last = Some((Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse(""), body))
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("ok".getBytes("UTF-8"))
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook", () => last)
    finally server.stop(0)
  }

  test("alert POSTs a JSON text payload with pipeline name and failures") {
    withServer { (url, last) =>
      new WebhookAlertSink(url).alert("marketing_api_campaigns",
        Seq("min_row_count: got 0, need 1", "unique_column: 3 dupes"))
      val (ctype, body) = last().get
      assert(ctype.startsWith("application/json"))
      assert(body ==
        """{"text":"Data quality check failed for pipeline: marketing_api_campaigns! """ +
          """Errors: min_row_count: got 0, need 1; unique_column: 3 dupes"}""")
    }
  }

  test("alert JSON-escapes quotes and control characters in failure details") {
    withServer { (url, last) =>
      new WebhookAlertSink(url).alert("p", Seq("bad \"value\"\nline2"))
      val (_, body) = last().get
      assert(body == """{"text":"Data quality check failed for pipeline: p! """ +
        """Errors: bad \"value\"\nline2"}""")
    }
  }

  test("Pipeline.run routes failures into the injected webhook sink") {
    withServer { (url, last) =>
      val spark = graft.TestSpark.spark
      val dir = java.nio.file.Files.createTempDirectory("wh").toString
      spark.range(3).selectExpr("id", "CAST(null AS STRING) AS name")
        .write.mode("overwrite").json(s"$dir/in")
      val spec = PipelineSpec(
        PipelineInfo("wh_pipe", "tests", "@daily", Nil, "webhook test"),
        FileSource("json", s"$dir/in", Map.empty),
        RawZoneDest(s"$dir/raw", "wh_pipe"),
        Seq(graft.dq.MinRowCount(100)))
      val res = Pipeline.run(spark, spec, java.time.LocalDate.parse("2024-05-01"),
        alertSink = new WebhookAlertSink(url))
      assert(!res.passed)
      val (_, body) = last().get
      assert(body.contains("wh_pipe") && body.contains("min_row_count"))
    }
  }
}

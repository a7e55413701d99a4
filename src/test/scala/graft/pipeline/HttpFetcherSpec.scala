package graft.pipeline

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

class HttpFetcherSpec extends AnyFunSuite {

  private def withServer(body: String)(f: (String, () => Option[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastQuery: Option[String] = None
    server.createContext("/api", (ex: HttpExchange) => {
      lastQuery = Option(ex.getRequestURI.getRawQuery)
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api", () => lastQuery)
    finally server.stop(0)
  }

  test("fetch GETs the endpoint and returns the body") {
    withServer("""[{"id": 1}]""") { (url, _) =>
      assert(HttpFetcher.fetch(url, Map.empty) == """[{"id": 1}]""")
    }
  }

  test("fetch URL-encodes query params (the templated api_params path)") {
    withServer("ok") { (url, lastQuery) =>
      HttpFetcher.fetch(url, Map("report_date" -> "2024-05-01", "q" -> "a b&c"))
      val q = lastQuery().get
      assert(q.contains("report_date=2024-05-01"))
      assert(q.contains("q=a+b%26c"))
    }
  }
}

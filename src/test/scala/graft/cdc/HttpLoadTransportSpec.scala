package graft.cdc

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Protocol tests for the real Stream Load transport against an
  * in-process HTTP stub playing a StarRocks FE/BE: success,
  * label-exists, failure, and the manual 307 FE→BE redirect re-PUT
  * (`SrStreamLoadClient.java:68-79`) — including that auth + body
  * survive the redirect hop, which auto-follow clients get wrong.
  */
class HttpLoadTransportSpec extends AnyFunSuite {

  /** One recorded request: (path, method, label, auth, body). */
  private case class Req(path: String, method: String, label: String,
      auth: String, format: String, jsonpaths: String, body: String)

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def record(ex: HttpExchange, log: mutable.Buffer[Req]): Req = {
    val h = ex.getRequestHeaders
    val r = Req(ex.getRequestURI.getPath, ex.getRequestMethod,
      h.getFirst("label"), h.getFirst("Authorization"),
      h.getFirst("format"), h.getFirst("jsonpaths"), readBody(ex))
    log.synchronized(log += r)
    r
  }

  /** Start a stub server, run the test body, guarantee shutdown. */
  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try f(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def transport(port: Int) =
    new HttpLoadTransport("127.0.0.1", port, "demo", "u", "secret",
      connectTimeout = java.time.Duration.ofSeconds(5),
      responseTimeout = java.time.Duration.ofSeconds(5))

  private val successBody =
    """{"TxnId": 1, "Label": "l1", "Status": "Success", "Message": "OK"}"""

  test("success: PUT with auth, label, format and jsonpaths headers; Success body maps to Success") {
    withServer { (server, port) =>
      val log = mutable.Buffer[Req]()
      server.createContext("/", ex => { record(ex, log); respond(ex, 200, successBody) })
      val r = transport(port).put("demo_t_orders", "graft_r_0_demo_t_orders_0", """[{"id":"1"}]""")
      assert(r === LoadResult.Success)
      val req = log.head
      assert(req.method === "PUT")
      assert(req.path === "/api/demo/demo_t_orders/_stream_load")
      assert(req.label === "graft_r_0_demo_t_orders_0")
      // Basic base64("u:secret") — the reference's auth construction
      // (SrStreamLoadClient.java:45)
      assert(req.auth === "Basic dTpzZWNyZXQ=")
      assert(req.format === "JSON")
      assert(req.jsonpaths.contains("$.record_del_time"))
      assert(req.body === """[{"id":"1"}]""")
    }
  }

  test("compact-JSON success (no space after colon) still maps to Success") {
    // the reference's exact-substring match ('"Status": "Success"')
    // would crash-loop on a compact-serializing FE/proxy
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 200,
        """{"TxnId":1,"Label":"l","Status":"Success","Message":"OK"}""") })
      assert(transport(port).put("t", "l", "[]") === LoadResult.Success)
    }
  }

  test("label already exists maps to LabelAlreadyExists (replay skip, SrSink.java:126-129)") {
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 200,
        """{"Status": "Label Already Exists", "Message": "errCode = 2"}""") })
      assert(transport(port).put("t", "l", "[]") === LoadResult.LabelAlreadyExists)
    }
  }

  test("label exists with ABORTED prior job maps to Failure, not skip (data never committed)") {
    // the reference skips on the bare 'Label Already Exists' substring —
    // but if the prior load ABORTED, skipping permanently loses the chunk
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 200,
        """{"Status": "Label Already Exists", "ExistingJobStatus": "ABORTED"}""") })
      val r = transport(port).put("t", "l", "[]")
      assert(r.isInstanceOf[LoadResult.Failure], s"must retry an aborted label, got $r")
    }
  }

  test("non-Success body maps to Failure (throw upstream → streaming retry, SrSink.java:131-133)") {
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 200,
        """{"Status": "Fail", "Message": "too many filtered rows"}""") })
      val r = transport(port).put("t", "l", "[]")
      assert(r.isInstanceOf[LoadResult.Failure])
      assert(r.asInstanceOf[LoadResult.Failure].msg.contains("too many filtered rows"))
    }
  }

  test("HTTP-level failure (500) maps to Failure") {
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 500, "boom") })
      val r = transport(port).put("t", "l", "[]")
      assert(r.asInstanceOf[LoadResult.Failure].msg.contains("500"))
    }
  }

  test("307: body and auth are re-PUT to the Location target (manual redirect, SrStreamLoadClient.java:68-79)") {
    withServer { (server, port) =>
      val log = mutable.Buffer[Req]()
      server.createContext("/api/", ex => { // the FE: redirect to the BE
        record(ex, log)
        ex.getResponseHeaders.add("Location", s"http://127.0.0.1:$port/be/load")
        respond(ex, 307, "")
      })
      server.createContext("/be/", ex => { record(ex, log); respond(ex, 200, successBody) })
      val r = transport(port).put("demo_t_orders", "lbl", """[{"id":"9"}]""")
      assert(r === LoadResult.Success)
      assert(log.size === 2, "exactly one redirect hop: FE then BE")
      val Seq(fe, be) = log.toSeq
      assert(fe.path === "/api/demo/demo_t_orders/_stream_load")
      assert(be.path === "/be/load")
      // the re-PUT must carry the same body, label and credentials
      assert(be.body === fe.body)
      assert(be.label === fe.label)
      assert(be.auth === fe.auth)
    }
  }

  test("307 without a Location header is a Failure, not a hang") {
    withServer { (server, port) =>
      server.createContext("/", ex => { readBody(ex); respond(ex, 307, "") })
      val r = transport(port).put("t", "l", "[]")
      assert(r.asInstanceOf[LoadResult.Failure].msg.contains("no Location"))
    }
  }

  test("connection refused maps to Failure (FE down → streaming retry)") {
    // a port with no listener: bind-then-close to reserve a dead port
    val sock = new java.net.ServerSocket(0)
    val deadPort = sock.getLocalPort
    sock.close()
    val r = transport(deadPort).put("t", "l", "[]")
    assert(r.isInstanceOf[LoadResult.Failure])
  }

  test("end-to-end: StreamLoadBatchWriter delivers chunks over HTTP with deterministic labels") {
    withServer { (server, port) =>
      val log = mutable.Buffer[Req]()
      server.createContext("/", ex => { record(ex, log); respond(ex, 200, successBody) })
      val spark = graft.TestSpark.spark
      val cfg = TaskConfig(
        dbAlias = "demo", tables = Seq("t_orders"),
        sources = Seq(SourceConfig("src-a", "1-99", "localhost", 3306, "u", "p", "FBA", "demo")))
      val batch = ChangeArchiveJob.build(
        Seq("src-a" -> {
          import spark.implicits._
          (1 to 5).map(i =>
            s"""{"op":"d","ts_ms":${1700000000000L + i},"source":{"db":"demo","table":"t_orders"},"before":{"id":$i,"k":1},"after":null}""")
            .toDF("value")
        }),
        spark, cfg)
      new StreamLoadBatchWriter("runh", transport(port), chunkSize = 2).write(batch, 3L)
      val labels = log.synchronized(log.map(_.label).sorted.toSeq)
      assert(labels === Seq(
        "graft_runh_3_demo_t_orders_0",
        "graft_runh_3_demo_t_orders_1",
        "graft_runh_3_demo_t_orders_2"))
      assert(log.forall(_.path === "/api/demo/demo_t_orders/_stream_load"))
    }
  }
}

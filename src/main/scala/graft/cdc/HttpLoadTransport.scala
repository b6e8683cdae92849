package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** The real Stream Load HTTP hop — the reference's client re-expressed
  * on `java.net.http` (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/utils/SrStreamLoadClient.java:43-101`):
  *
  *  - `PUT http://{fe}:{port}/api/{db}/{table}/_stream_load` with Basic
  *    auth and the Stream Load option headers (`format=JSON`,
  *    `strip_outer_array`, `ignore_json_size`, `jsonpaths`, `label`,
  *    `timeout`, `load_mem_limit` — `SrStreamLoadClient.java:47-58`);
  *  - MANUAL 307 handling (`SrStreamLoadClient.java:68-79`): the FE
  *    answers 307 with the chosen BE in `Location`, and the body must
  *    be re-PUT there with the same headers. Manual, not auto-follow,
  *    for the same reason the reference does it by hand: HTTP clients
  *    drop the `Authorization` header on cross-host redirects and
  *    don't reliably replay a PUT body;
  *  - response mapping is the reference's sink contract
  *    (`SrSink.java:126-133`): a body containing "Label Already
  *    Exists" is a replay → skip; a body containing `"Status":
  *    "Success"` is done; anything else throws upstream so the
  *    streaming query retries the micro-batch.
  *
  * Executor-side object: the [[HttpClient]] is `@transient lazy`, so
  * each executor builds its own after deserialization (the client
  * holds sockets — never serialized, never shared across JVMs).
  *
  * @param expectContinue send `Expect: 100-continue` like the
  *   reference (`SrStreamLoadClient.java:49`) so a FE can reject
  *   (auth, unknown table) before the executor streams a large chunk.
  */
final class HttpLoadTransport(
    feHost: String,
    fePort: Int,
    db: String,
    username: String,
    password: String,
    connectTimeout: Duration = Duration.ofSeconds(60),
    responseTimeout: Duration = Duration.ofSeconds(300),
    maxRedirects: Int = 5,
    expectContinue: Boolean = true) extends LoadTransport {

  private val LabelExists = "Label Already Exists"
  // whitespace-tolerant: the reference matches the exact pretty-printed
  // substring '"Status": "Success"' (SrSink.java:33), which turns every
  // compact-JSON success into a crash-looping retry
  private val SuccessStatus =
    java.util.regex.Pattern.compile("\"Status\"\\s*:\\s*\"Success\"")

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NEVER) // 307 handled manually
      .connectTimeout(connectTimeout)
      .build()

  private def authHeader: String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$username:$password".getBytes(StandardCharsets.UTF_8))

  private def request(url: String, label: String, jsonBody: String): HttpRequest =
    HttpRequest.newBuilder(URI.create(url))
      .PUT(HttpRequest.BodyPublishers.ofString(jsonBody, StandardCharsets.UTF_8))
      .timeout(responseTimeout)
      .expectContinue(expectContinue)
      .header("Authorization", authHeader)
      .header("format", "JSON")
      .header("label", label)
      .header("strip_outer_array", "true")
      .header("ignore_json_size", "true")
      .header("load_mem_limit", "5368709120") // 5 GB, SrStreamLoadClient.java:52
      .header("timeout", "1200")
      .header("jsonpaths", "[ \"$.id\", \"$.record_del_time\", \"$.fb_no\", \"$.data_json\"]")
      .build()

  def put(table: String, label: String, jsonBody: String): LoadResult =
    try {
      var url = s"http://$feHost:$fePort/api/$db/$table/_stream_load"
      var hops = 0
      var resp = client.send(request(url, label, jsonBody),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      while (resp.statusCode() == 307 && hops < maxRedirects) {
        val loc = resp.headers().firstValue("Location")
        if (!loc.isPresent)
          return LoadResult.Failure("307 redirect received but no Location header")
        url = loc.get()
        hops += 1
        resp = client.send(request(url, label, jsonBody),
          HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      }
      val body = resp.body()
      val ok = resp.statusCode() / 100 == 2
      // label-exists is a replay SKIP only when the prior load actually
      // went through: an existing label whose job ABORTED means the data
      // never committed — skipping would lose it; failing retries the
      // chunk (StarRocks allows re-PUT of an aborted label). The
      // reference skips on the bare substring at any status
      // (SrSink.java:126-129), which drops exactly that case.
      if (ok && body.contains(LabelExists) && !body.contains("ABORTED"))
        LoadResult.LabelAlreadyExists
      else if (ok && SuccessStatus.matcher(body).find())
        LoadResult.Success
      else LoadResult.Failure(
        s"stream load HTTP ${resp.statusCode()}: ${body.take(500)}")
    } catch {
      // NonFatal only: an InterruptedException here is Spark KILLING the
      // task (query stop, speculation) — swallowing it as a retryable
      // sink failure would clear the interrupt and mislabel the
      // cancellation; NonFatal lets it (and fatal errors) propagate
      case scala.util.control.NonFatal(e) =>
        LoadResult.Failure(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

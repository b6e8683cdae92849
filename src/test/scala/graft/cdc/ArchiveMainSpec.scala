package graft.cdc

import com.sun.net.httpserver.HttpServer
import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** The config-to-delivery wiring of the job entry point: YAML in, full
  * pipeline out — the same contract as launching the reference's
  * `StartJob` with `application.yaml`/`sink-sr.yaml`.
  */
class ArchiveMainSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def write(path: String, content: String): String = {
    Files.write(Paths.get(path), content.getBytes("UTF-8")); path
  }

  private def taskYaml(dir: String): String = write(s"$dir/task.yaml",
    """dbAlias: demo
      |tables:
      |  - t_orders
      |sources:
      |  - instanceName: src-a
      |    serverId: "1-99"
      |    host: localhost
      |    port: 3306
      |    username: u
      |    password: p
      |    fbNo: FBA
      |    dbName: demo
      |""".stripMargin)

  private def envelope(id: Long): String =
    s"""{"op":"d","ts_ms":${1700000000000L + id},"source":{"db":"demo","table":"t_orders"},"before":{"id":$id,"k":1},"after":null}"""

  test("parseArgs: validation failures are loud") {
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(Array("--task")))
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(
      Array("--task", "t.yaml", "--checkpoint", "c"))) // no sources
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(
      Array("--task", "t.yaml", "--checkpoint", "c", "--source", "a=b"))) // no sink
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(
      Array("--task", "t.yaml", "--checkpoint", "c", "--source", "nodir",
        "--out", "o"))) // malformed source
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(Array("--bogus")))
    // adb flags without --sink-adb would be silently ignored
    intercept[IllegalArgumentException](ArchiveMain.parseArgs(
      Array("--task", "t.yaml", "--checkpoint", "c", "--source", "a=b",
        "--out", "o", "--adb-ledger", "ledger")))
  }

  test("main() rejects a --source instance the task YAML does not know") {
    val (dir, src, ckpt) = (tmpDir("uk-cfg"), tmpDir("uk-src"), tmpDir("uk-ckpt"))
    write(s"$src/f1.jsonl", envelope(1))
    val e = intercept[IllegalArgumentException](ArchiveMain.main(Array(
      "--task", taskYaml(dir),
      "--source", s"srcA=$src", // typo for src-a: enrich would drop every row
      "--checkpoint", ckpt,
      "--out", tmpDir("uk-out"),
      "--once")))
    assert(e.getMessage.contains("srcA"))
  }

  test("lineageRunId: stable across resume, fresh after a checkpoint wipe") {
    val ckpt = tmpDir("lin-ckpt")
    val id1 = ArchiveMain.lineageRunId(spark, ckpt)
    assert(ArchiveMain.lineageRunId(spark, ckpt) === id1, "resume must reuse the lineage id")
    // wipe = new lineage: labels must NOT collide with the old lineage's
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala.toSeq
      .reverse.foreach(java.nio.file.Files.delete)
    val id2 = ArchiveMain.lineageRunId(spark, ckpt)
    assert(id2 !== id1, "a wiped checkpoint must get a fresh run id")
  }

  test("parseArgs: full flag set round-trips") {
    val a = ArchiveMain.parseArgs(Array(
      "--task", "t.yaml", "--checkpoint", "ck", "--source", "src-a=/d/a",
      "--source", "src-b=/d/b", "--out", "/o", "--sink-adb", "adb.yaml",
      "--adb-url", "jdbc:derby:x", "--sink-sr", "sr.yaml", "--once"))
    assert(a.sources === Seq(
      ChangeArchiveJob.SourceStream("src-a", "/d/a"),
      ChangeArchiveJob.SourceStream("src-b", "/d/b")))
    assert(a.once && a.out.contains("/o") && a.adbUrl.contains("jdbc:derby:x"))
  }

  test("e2e: --dead-letter quarantines rejected envelopes next to the archive via main()") {
    assert(spark.sparkContext.isLocal)
    val (dir, src, ckpt, out, dlq) = (tmpDir("am-dlq-cfg"), tmpDir("am-dlq-src"),
      tmpDir("am-dlq-ckpt"), tmpDir("am-dlq-out"), tmpDir("am-dlq-q"))
    // two keepers + an update (not_delete) + a missing-id defect
    write(s"$src/f1.jsonl", Seq(
      envelope(1), envelope(2),
      """{"op":"u","ts_ms":1700000000003,"source":{"db":"demo","table":"t_orders"},"before":{"id":3,"k":1},"after":null}""",
      """{"op":"d","ts_ms":1700000000004,"source":{"db":"demo","table":"t_orders"},"before":{"k":1},"after":null}"""
    ).mkString("\n"))
    ArchiveMain.main(Array(
      "--task", taskYaml(dir),
      "--source", s"src-a=$src",
      "--checkpoint", ckpt,
      "--out", out,
      "--dead-letter", dlq,
      "--once"))
    assert(spark.read.parquet(out).count() === 2, "kept side must be unaffected")
    val dead = DeadLetterSink.read(spark, dlq).collect()
      .map(r => r.getString(0)).sorted
    assert(dead === Array(Debezium.NoId, Debezium.NotDelete),
      "both rejected envelopes must be quarantined with their reasons")
  }

  test("e2e: YAML config + file source -> parquet archive via main()") {
    assert(spark.sparkContext.isLocal) // init the shared session before main()'s getOrCreate
    val (dir, src, ckpt, out) =
      (tmpDir("am-cfg"), tmpDir("am-src"), tmpDir("am-ckpt"), tmpDir("am-out"))
    write(s"$src/f1.jsonl", (1 to 3).map(envelope(_)).mkString("\n"))
    ArchiveMain.main(Array(
      "--task", taskYaml(dir),
      "--source", s"src-a=$src",
      "--checkpoint", ckpt,
      "--out", out,
      "--once"))
    val archived = spark.read.parquet(out)
    assert(archived.count() === 3)
    assert(archived.select("dbTbName").distinct().collect().head.getString(0)
      === "demo_t_orders")
  }

  test("e2e: sink-adb YAML + --adb-ledger drives exactly-once JDBC via main(); resume is a no-op") {
    assert(spark.sparkContext.isLocal)
    val (dir, src, ckpt) = (tmpDir("adb-cfg"), tmpDir("adb-src"), tmpDir("adb-ckpt"))
    val db = tmpDir("adb-derby") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE demo_t_orders (
        |  id VARCHAR(64), fb_no VARCHAR(16),
        |  record_del_time VARCHAR(32), data_json VARCHAR(4000))""".stripMargin)
    conn.createStatement().execute(
      """CREATE TABLE batch_ledger (
        |  batch_id BIGINT NOT NULL, partition_id INT NOT NULL,
        |  PRIMARY KEY (batch_id, partition_id))""".stripMargin)
    conn.close()
    write(s"$src/f1.jsonl", (1 to 3).map(envelope(_)).mkString("\n"))
    write(s"$dir/sink-adb.yaml",
      """host: ignored
        |port: 3306
        |username: ""
        |password: ""
        |dbName: demo
        |batchSize: 2
        |""".stripMargin)
    def run(): Unit = ArchiveMain.main(Array(
      "--task", taskYaml(dir),
      "--source", s"src-a=$src",
      "--checkpoint", ckpt,
      "--sink-adb", s"$dir/sink-adb.yaml",
      "--adb-url", url,
      "--adb-ledger", "batch_ledger",
      "--once"))
    run()
    run() // resume with nothing new: checkpoint + ledger → still 3 rows
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM demo_t_orders")
      rs.next()
      assert(rs.getInt(1) === 3)
    } finally c.close()
  }

  test("e2e: sink-sr YAML drives the HTTP Stream Load sink (flag-gated like sink_to_sr)") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val labels = mutable.Buffer[String]()
    server.createContext("/", ex => {
      labels.synchronized(labels += ex.getRequestHeaders.getFirst("label"))
      ex.getRequestBody.readAllBytes()
      val body = """{"Status": "Success"}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      assert(spark.sparkContext.isLocal) // init the shared session before main()'s getOrCreate
      val (dir, src, ckpt) = (tmpDir("sr-cfg"), tmpDir("sr-src"), tmpDir("sr-ckpt"))
      write(s"$src/f1.jsonl", (1 to 5).map(envelope(_)).mkString("\n"))
      write(s"$dir/sink-sr.yaml",
        s"""host: 127.0.0.1
           |port: ${server.getAddress.getPort}
           |username: u
           |password: secret
           |dbName: demo
           |batchSize: 2
           |""".stripMargin)
      ArchiveMain.main(Array(
        "--task", taskYaml(dir),
        "--source", s"src-a=$src",
        "--checkpoint", ckpt,
        "--sink-sr", s"$dir/sink-sr.yaml",
        "--once"))
      val got = labels.synchronized(labels.sorted.toSeq)
      // 5 rows, chunkSize 2 -> 3 labeled loads, run id = checkpoint
      // lineage id (stable on resume, fresh after a wipe)
      val rid = ArchiveMain.lineageRunId(spark, ckpt)
      assert(got === (0 to 2).map(i => s"graft_${rid}_0_demo_t_orders_$i"))
    } finally server.stop(0)
  }
}

package graft.cdc

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** A transport whose first `failFirst` puts fail (a FE hiccup), then
  * delegates to [[FileLoadTransport]]. The counter lives in the
  * companion so executor-side closure copies share it in local mode.
  */
object FlakyTransport {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = calls.set(0)
}
final class FlakyTransport(outDir: String, failFirst: Int) extends LoadTransport {
  private val inner = new FileLoadTransport(outDir)
  def put(table: String, label: String, jsonBody: String): LoadResult =
    if (FlakyTransport.calls.getAndIncrement() < failFirst)
      LoadResult.Failure("transient FE hiccup")
    else inner.put(table, label, jsonBody)
}

/** End-to-end streaming: file sources → parse → union → enrich →
  * checkpointed dual-sink delivery; kill/resume with no loss; the two
  * delivery contracts (at-least-once JDBC vs effectively-once labeled
  * loads).
  */
class ChangeArchiveJobSpec extends AnyFunSuite {

  private val cfg = TaskConfig(
    dbAlias = "demo",
    tables = Seq("t_orders"),
    sources = Seq(
      SourceConfig("src-a", "1-99", "localhost", 3306, "u", "p", "FBA", "demo"),
      SourceConfig("src-b", "100-199", "localhost", 3306, "u", "p", "FBB", "demo")))

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def envelope(id: Long, table: String = "t_orders", op: String = "d"): String =
    s"""{"op":"$op","ts_ms":${1700000000000L + id},"source":{"db":"demo","table":"$table"},"before":{"id":$id,"amount":"${id}.50"},"after":null}"""

  private def writeEnvelopes(dir: String, fileName: String, envs: Seq[String]): Unit =
    Files.write(Paths.get(dir, fileName), envs.mkString("\n").getBytes("UTF-8"))

  private def runOnce(srcA: String, srcB: String, ckpt: String, writers: Seq[BatchWriter]): Unit = {
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA),
        ChangeArchiveJob.SourceStream("src-b", srcB)),
      cfg, writers, ckpt)
    q.awaitTermination()
  }

  test("e2e: parse, union, enrich, parquet delivery; kill/resume loses and duplicates nothing") {
    val (srcA, srcB, ckpt, out) =
      (tmpDir("cdc-a"), tmpDir("cdc-b"), tmpDir("cdc-ckpt"), tmpDir("cdc-out"))

    // phase 1: valid deletes + drops across both instances
    writeEnvelopes(srcA, "f1.jsonl",
      Seq(envelope(1), envelope(2), envelope(3, op = "u"), envelope(4, table = "")))
    writeEnvelopes(srcB, "f1.jsonl", Seq(envelope(10), envelope(11)))
    runOnce(srcA, srcB, ckpt, Seq(new ParquetBatchWriter(out)))

    val phase1 = spark.read.parquet(out)
    assert(phase1.count() === 4) // 2 + 2 valid deletes; 'u' and blank-table dropped
    val byInstance = phase1.groupBy("instanceName").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byInstance === Map("src-a" -> 2L, "src-b" -> 2L))
    // enrichment joined per-instance fbNo + dbAlias_table
    val row = phase1.filter(col("id") === "10").collect().head
    assert(row.getAs[String]("fbNo") === "FBB")
    assert(row.getAs[String]("dbTbName") === "demo_t_orders")
    assert(row.getAs[String]("dataJson").contains("\"amount\":\"10.50\""))

    // phase 2: kill happened (query already stopped); new data arrives;
    // resume from the same checkpoint
    writeEnvelopes(srcA, "f2.jsonl", Seq(envelope(5), envelope(6)))
    runOnce(srcA, srcB, ckpt, Seq(new ParquetBatchWriter(out)))

    val phase2 = spark.read.parquet(out)
    assert(phase2.count() === 6, "resume must process exactly the new rows")
    val ids = phase2.select("id").collect().map(_.getString(0)).sorted
    assert(ids === Array("1", "10", "11", "2", "5", "6"))

    // phase 3: resume with nothing new is a no-op
    runOnce(srcA, srcB, ckpt, Seq(new ParquetBatchWriter(out)))
    assert(spark.read.parquet(out).count() === 6)
  }

  test("ProcessingTime trigger: continuous micro-batches deliver files as they arrive") {
    val (srcA, srcB, ckpt, out) =
      (tmpDir("pt-a"), tmpDir("pt-b"), tmpDir("pt-ckpt"), tmpDir("pt-out"))
    writeEnvelopes(srcA, "f1.jsonl", Seq(envelope(1)))
    writeEnvelopes(srcB, "f1.jsonl", Seq(envelope(10)))
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA),
        ChangeArchiveJob.SourceStream("src-b", srcB)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 2)
      // the reference's steady-state: new binlog events arrive while
      // the job runs (flush-interval cadence, SinkConfig.java:21)
      writeEnvelopes(srcA, "f2.jsonl", Seq(envelope(2), envelope(3)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 4)
    } finally q.stop()
  }

  test("volume e2e: ~10k synthesized envelopes stream through with exact accounting") {
    import org.apache.spark.sql.functions._
    val (srcA, srcB, ckpt, out) =
      (tmpDir("vol-a"), tmpDir("vol-b"), tmpDir("vol-ckpt"), tmpDir("vol-out"))

    // synthesize Debezium envelopes from the sf0.01 events fixture with
    // the cdc04 defect mix (event_id % 7 selects the parser branch),
    // split across two instances by user parity
    val ev = graft.Tables.load(spark, sf001, "events")
    val m = col("event_id") % 7
    val before = when(m === 5, lit("null"))
      .otherwise(concat(lit("{\"id\":"), col("event_id"), lit(",\"k\":1}")))
    val env = ev.select(
      (col("user_id") % 2).as("side"),
      concat(
        lit("{\"op\":\""), when(m === 3, lit("i")).otherwise(lit("d")),
        lit("\",\"ts_ms\":"), when(m === 6, lit(0L)).otherwise(unix_millis(col("ts"))),
        lit(",\"source\":{\"db\":\"demo\",\"table\":\""),
        when(m === 4, lit("")).otherwise(lit("t_orders")),
        lit("\"},\"before\":"), before, lit("}")).as("value"))
    env.filter(col("side") === 0).select("value")
      .coalesce(2).write.mode("overwrite").text(srcA)
    env.filter(col("side") === 1).select("value")
      .coalesce(2).write.mode("overwrite").text(srcB)

    runOnce(srcA, srcB, ckpt, Seq(new ParquetBatchWriter(out)))

    // expected kept = event_id % 7 in (0, 1, 2), i.e. ~3/7 of rows —
    // derived from the parser's own batch accounting for independence
    val expectedKept = Debezium.dropCounts(env.select("value"))
      .filter(col("reason") === Debezium.Kept)
      .collect().head.getLong(1)
    val total = ev.count()
    val delivered = spark.read.parquet(out)
    assert(expectedKept > total / 3, "defect mix should keep ~3/7 of rows")
    assert(delivered.count() === expectedKept)
    // ids survive the full pipeline uniquely (no loss, no dup)
    assert(delivered.select("id").distinct().count() === expectedKept)
  }

  test("stream-load delivery is effectively-once: deterministic labels, replay skips") {
    val (srcA, srcB, ckpt, loads) =
      (tmpDir("sl-a"), tmpDir("sl-b"), tmpDir("sl-ckpt"), tmpDir("sl-loads"))
    writeEnvelopes(srcA, "f1.jsonl", Seq(envelope(1), envelope(2)))
    writeEnvelopes(srcB, "f1.jsonl", Seq(envelope(10)))

    val writer = new StreamLoadBatchWriter("run1", new FileLoadTransport(loads), chunkSize = 2)
    runOnce(srcA, srcB, ckpt, Seq(writer))

    val dir = Paths.get(loads, "demo_t_orders")
    val labels1 = Files.list(dir).toArray.map(_.toString).sorted
    assert(labels1.nonEmpty)
    assert(labels1.forall(_.contains("graft_run1_")), s"labels: ${labels1.mkString(",")}")
    val contents1 = labels1.map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
    assert(contents1.mkString.contains("\"record_del_time\""))

    // simulate a replayed micro-batch (restart re-delivering batch 0):
    // same runId + batchId + data → same labels → transport skips all
    val replayBatch = ChangeArchiveJob.build(
      Seq("src-a" -> spark.read.text(srcA), "src-b" -> spark.read.text(srcB)),
      spark, cfg)
    writer.write(replayBatch, 0L)
    val labels2 = Files.list(dir).toArray.map(_.toString).sorted
    assert(labels2 === labels1, "replay must not create new loads")
  }

  test("stream-load chunking streams sorted runs: multi-table labels are the grouped-partition sequence") {
    // the bounded-memory run-streaming rewrite must emit EXACTLY the
    // label sequence the old whole-partition groupBy produced — labels
    // are the idempotency contract, so a change would break replay skip
    // across an upgrade
    val loads = tmpDir("sl-multi")
    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2, table = "t_users"), envelope(3),
          envelope(4, table = "t_users"), envelope(5), envelope(6, table = "t_users"))
          .toDF("value")
      }),
      spark, cfg.copy(tables = Seq("t_orders", "t_users")))
    new StreamLoadBatchWriter("runm", new FileLoadTransport(loads), chunkSize = 2)
      .write(batch, 4L)
    def labels(t: String): Seq[String] =
      Files.list(Paths.get(loads, t)).toArray.map(_.toString.split('/').last).toSeq.sorted
    // 3 rows per table, chunkSize 2 → chunks 0 and 1 per table
    assert(labels("demo_t_orders") ===
      Seq("graft_runm_4_demo_t_orders_0.json", "graft_runm_4_demo_t_orders_1.json"))
    assert(labels("demo_t_users") ===
      Seq("graft_runm_4_demo_t_users_0.json", "graft_runm_4_demo_t_users_1.json"))
    // chunk rows are json-sorted within each table: ids 1,3 then 5
    val chunk0 = new String(Files.readAllBytes(
      Paths.get(loads, "demo_t_orders", "graft_runm_4_demo_t_orders_0.json")), "UTF-8")
    val chunk1 = new String(Files.readAllBytes(
      Paths.get(loads, "demo_t_orders", "graft_runm_4_demo_t_orders_1.json")), "UTF-8")
    assert(chunk0.split("\\{\"id\"").length - 1 === 2)
    assert(chunk1.split("\\{\"id\"").length - 1 === 1)
  }

  test("stream-load rejects a dbTbName that is not a plain identifier (no path/URL splice)") {
    // the table name is CDC data and reaches transport URLs and
    // filesystem paths — a traversal-shaped name must throw, not load.
    // The allowlist DELIBERATELY lists the evil name: config is
    // operator-trusted input, and the identifier check must hold as
    // defense-in-depth even when a hostile name is listed
    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1, table = "x/../../../tmp/evil")).toDF("value")
      }),
      spark, cfg.copy(tables = Seq("x/../../../tmp/evil")))
    val loads = tmpDir("sl-evil")
    val e = intercept[org.apache.spark.SparkException](
      new StreamLoadBatchWriter("rune", new FileLoadTransport(loads)).write(batch, 0L))
    assert(e.getMessage.contains("illegal archive table name") ||
      Option(e.getCause).exists(_.getMessage.contains("illegal archive table name")))
    // the traversal would have resolved to a /tmp/evil DIRECTORY holding
    // a label-named json; neither may exist
    assert(!Files.exists(Paths.get("/tmp/evil")))
  }

  test("stream-load failure propagates so the streaming query retries the batch") {
    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1)).toDF("value")
      }),
      spark, cfg)
    val failing = new StreamLoadBatchWriter("runf", new LoadTransport {
      def put(table: String, label: String, jsonBody: String): LoadResult =
        LoadResult.Failure("FE unavailable")
    })
    val e = intercept[org.apache.spark.SparkException](failing.write(batch, 0L))
    // the reference's contract: non-label failures throw -> restart/retry
    // (SrSink.java:131-133); Spark wraps the task failure
    assert(e.getMessage.contains("FE unavailable") ||
      Option(e.getCause).exists(_.getMessage.contains("FE unavailable")))
  }

  test("drop taxonomy is visible in streaming progress events (observe counters)") {
    val (srcA, ckpt, out) = (tmpDir("ob-a"), tmpDir("ob-ckpt"), tmpDir("ob-out"))
    writeEnvelopes(srcA, "f1.jsonl", Seq(
      envelope(1), envelope(2),              // kept
      envelope(3, op = "u"),                 // not_delete
      envelope(4, table = "")))              // no_table
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt)
    q.awaitTermination()
    val observed = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("cdc_parse_src-a")))
    assert(observed.nonEmpty, "progress events must carry the observe() metrics")
    val m = observed.last
    def v(name: String): Long = m.getLong(m.schema.fieldIndex(name))
    assert(v("total") === 4L)
    assert(v("kept") === 2L)
    assert(v(Debezium.NotDelete) === 1L)
    assert(v(Debezium.NoTable) === 1L)
  }

  test("tables allowlist is enforced: an unlisted table's delete is dropped and counted") {
    // the reference filters at the source (StartJob.java:55-57,66-67 —
    // unlisted tables never enter the pipeline); our twin drops after
    // parse with a counted not_listened reason. A mis-scoped source
    // directory must NOT silently archive tables the operator never
    // listed.
    val (srcA, ckpt, out) = (tmpDir("al-a"), tmpDir("al-ckpt"), tmpDir("al-out"))
    writeEnvelopes(srcA, "f1.jsonl", Seq(
      envelope(1), envelope(2),                    // listed (t_orders): kept
      envelope(3, table = "t_other"),              // unlisted delete: dropped
      envelope(4, table = "t_other", op = "u")))   // unlisted non-delete: same drop
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt)
    q.awaitTermination()

    val delivered = spark.read.parquet(out)
    assert(delivered.count() === 2, "only the listed table's deletes archive")
    assert(delivered.select("tableName").distinct().collect().map(_.getString(0)).toSeq
      === Seq("t_orders"))

    // the drop is COUNTED, not silent: not_listened carries both rows
    // (in the reference the connector never emits an unlisted table's
    // events, whatever their op — so the non-delete also lands here)
    val m = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("cdc_parse_src-a"))).last
    def v(name: String): Long = m.getLong(m.schema.fieldIndex(name))
    assert(v("total") === 4L)
    assert(v("kept") === 2L)
    assert(v(Debezium.NotListened) === 2L)
  }

  test("maxFilesPerTrigger bounds micro-batches: a 3-file backlog drains in >= 3 batches") {
    val (srcA, ckpt, out) = (tmpDir("bp-a"), tmpDir("bp-ckpt"), tmpDir("bp-out"))
    for (i <- 1 to 3)
      writeEnvelopes(srcA, s"f$i.jsonl", Seq(envelope(i * 10L), envelope(i * 10L + 1)))
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 6, "no loss under bounded batches")
    // each batch lands in its own batch_id=N dir — the backlog must have
    // been split, not drained as one giant batch
    val batchDirs = Files.list(Paths.get(out)).toArray
      .map(_.toString.split('/').last).filter(_.startsWith("batch_id="))
    assert(batchDirs.length >= 3, s"expected >=3 bounded batches, got: ${batchDirs.mkString(",")}")
  }

  test("streaming retry e2e: a transiently failing sink fails the query; restart re-delivers with no dup") {
    // the reference's failure contract end-to-end THROUGH the engine:
    // a non-label sink failure throws (SrSink.java:131-133) → the
    // streaming query dies → a restart from the checkpoint replays the
    // batch → deterministic labels skip whatever already landed
    val (srcA, ckpt, loads) = (tmpDir("rt-a"), tmpDir("rt-ckpt"), tmpDir("rt-loads"))
    writeEnvelopes(srcA, "f1.jsonl", Seq(envelope(1), envelope(2), envelope(3)))
    FlakyTransport.reset()
    val writer = new StreamLoadBatchWriter("runr",
      new FlakyTransport(loads, failFirst = 1), chunkSize = 2)
    def start() = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA)), cfg, Seq(writer), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))

    val q1 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.awaitTermination(10000); ()
    }
    assert(e.getMessage.contains("transient FE hiccup") ||
      Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("transient")))

    // restart from the same checkpoint: the batch replays, the already-
    // failed chunk now delivers; mid-stream arrival keeps flowing
    val q2 = start()
    try {
      q2.processAllAvailable()
      writeEnvelopes(srcA, "f2.jsonl", Seq(envelope(4)))
      q2.processAllAvailable()
    } finally q2.stop()

    val dir = Paths.get(loads, "demo_t_orders")
    val labels = Files.list(dir).toArray.map(_.toString.split('/').last).sorted
    assert(labels.length === labels.distinct.length, "no duplicate labels")
    val bodies = labels.map(l => new String(
      Files.readAllBytes(dir.resolve(l)), "UTF-8")).mkString
    // all four ids delivered exactly once across failure + restart
    for (id <- 1 to 4)
      assert(bodies.split(s""""id":"$id"""").length - 1 === 1,
        s"id $id must be delivered exactly once; labels=${labels.mkString(",")}")
  }

  test("jdbc delivery is at-least-once: replay duplicates (the reference's ADB contract)") {
    // default routing = the reference's layout: each dbTbName is its own
    // archive table (AdbSink.java:106-111)
    val db = tmpDir("derby") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE demo_t_orders (
        |  id VARCHAR(64), fb_no VARCHAR(16),
        |  record_del_time VARCHAR(32), data_json VARCHAR(4000))""".stripMargin)
    conn.close()

    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2), envelope(3)).toDF("value")
      }),
      spark, cfg)

    val writer = new JdbcBatchWriter(url, new java.util.Properties, insertBatchSize = 2)
    writer.write(batch, 0L)
    def countRows(): Int = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM demo_t_orders")
        rs.next(); rs.getInt(1)
      } finally c.close()
    }
    assert(countRows() === 3)
    val c2 = java.sql.DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery(
      "SELECT fb_no, record_del_time FROM demo_t_orders WHERE id = '1'")
    rs.next()
    assert(rs.getString(1) === "FBA")
    assert(rs.getString(2).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
    c2.close()

    // replayed batch: plain INSERT, no upsert → duplicates, by contract
    writer.write(batch, 0L)
    assert(countRows() === 6, "at-least-once: replay re-inserts")
  }

  test("jdbc routing: multi-table batch lands each dbTbName in its own table, one txn") {
    val db = tmpDir("derby3") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    for (t <- Seq("demo_t_orders", "demo_t_users"))
      conn.createStatement().execute(
        s"""CREATE TABLE $t (
           |  id VARCHAR(64), fb_no VARCHAR(16),
           |  record_del_time VARCHAR(32), data_json VARCHAR(4000))""".stripMargin)
    conn.close()

    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2, table = "t_users"), envelope(3),
          envelope(4, table = "t_users")).toDF("value")
      }),
      spark, cfg.copy(tables = Seq("t_orders", "t_users")))

    new JdbcBatchWriter(url, new java.util.Properties).write(batch, 0L)
    val c = java.sql.DriverManager.getConnection(url)
    try {
      def ids(t: String): Seq[String] = {
        val rs = c.createStatement().executeQuery(s"SELECT id FROM $t ORDER BY id")
        Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
      }
      assert(ids("demo_t_orders") === Seq("1", "3"))
      assert(ids("demo_t_users") === Seq("2", "4"))
    } finally c.close()
  }

  test("jdbc routing rejects a dbTbName that is not a plain identifier") {
    val e = intercept[IllegalArgumentException](
      JdbcRouting.checkIdent("x; DROP TABLE t--"))
    assert(e.getMessage.contains("illegal archive table name"))
  }

  test("duplicate-claim detection is portable across JDBC drivers (SQLState 23xxx)") {
    // Derby/MySQL subclass SQLIntegrityConstraintViolationException...
    assert(JdbcRouting.isDuplicateClaim(
      new java.sql.SQLIntegrityConstraintViolationException("dup", "23505")))
    // ...PostgreSQL raises plain SQLException / BatchUpdateException with
    // SQLState 23505 — must also be treated as "already claimed"
    assert(JdbcRouting.isDuplicateClaim(new java.sql.SQLException("dup", "23505")))
    assert(JdbcRouting.isDuplicateClaim(
      new java.sql.BatchUpdateException("dup", "23000", 0, Array.empty[Int], null)))
    // ...but a connection failure (08xxx) or syntax error (42xxx) is NOT
    assert(!JdbcRouting.isDuplicateClaim(new java.sql.SQLException("down", "08001")))
    assert(!JdbcRouting.isDuplicateClaim(new java.sql.SQLException("boom", null: String)))
  }

  test("idempotent jdbc delivery is exactly-once: ledger-claimed replay skips") {
    val db = tmpDir("derby2") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE archive (
        |  id VARCHAR(64), fb_no VARCHAR(16),
        |  record_del_time VARCHAR(32), data_json VARCHAR(4000))""".stripMargin)
    conn.createStatement().execute(
      """CREATE TABLE batch_ledger (
        |  batch_id BIGINT NOT NULL, partition_id INT NOT NULL,
        |  PRIMARY KEY (batch_id, partition_id))""".stripMargin)
    conn.close()

    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2), envelope(3)).toDF("value")
      }),
      spark, cfg)

    // fixed-table override: everything routes into one archive table
    val writer = new IdempotentJdbcBatchWriter(
      url, "batch_ledger", new java.util.Properties,
      tableFor = _ => "archive", insertBatchSize = 2)
    def countRows(): Int = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM archive")
        rs.next(); rs.getInt(1)
      } finally c.close()
    }
    writer.write(batch, 7L)
    assert(countRows() === 3)
    // replay of the SAME batch: every partition's ledger claim collides → skip
    writer.write(batch, 7L)
    assert(countRows() === 3, "exactly-once: replay must not re-insert")
    // a NEW batch id still writes
    writer.write(batch, 8L)
    assert(countRows() === 6)
  }

  test("upsert jdbc delivery is exactly-once at ROW grain: replay heals, never duplicates") {
    val db = tmpDir("derby3") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      """CREATE TABLE archive (
        |  run_id VARCHAR(40) NOT NULL, batch_id BIGINT NOT NULL, seq BIGINT NOT NULL,
        |  id VARCHAR(64), fb_no VARCHAR(16),
        |  record_del_time VARCHAR(32), data_json VARCHAR(4000),
        |  PRIMARY KEY (run_id, batch_id, seq))""".stripMargin)
    c0.close()

    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2), envelope(3)).toDF("value")
      }),
      spark, cfg)
    val writer = new UpsertJdbcBatchWriter(
      url, "run1", new java.util.Properties,
      tableFor = _ => "archive", insertBatchSize = 2)
    def withConn[A](f: java.sql.Connection => A): A = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    def countRows(): Int = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM archive")
      rs.next(); rs.getInt(1)
    }
    // This suite runs in its own forked JVM (build.sbt testGrouping):
    // the embedded Derby engine is suite-private, so the old
    // cross-suite race (Derby-internal NPEs, and one observed SILENT
    // partial batch apply) is structurally impossible here — no retry
    // shield, a failure is a real failure.
    writer.write(batch, 7L)
    assert(countRows() === 3)
    // full replay: every row's (run_id, batch_id, seq) matches → no insert
    writer.write(batch, 7L)
    assert(countRows() === 3, "row-keyed replay must not duplicate")
    // the case the partition-grain ledger CANNOT handle: partial prior
    // delivery. Simulate it by deleting one row; the replay must
    // restore exactly the missing row and leave the others alone
    withConn(_.createStatement().executeUpdate(
      "DELETE FROM archive WHERE seq = (SELECT MAX(seq) FROM archive)"))
    assert(countRows() === 2)
    writer.write(batch, 7L)
    assert(countRows() === 3, "replay must heal a partial delivery, row-granular")
    // distinct ids all present exactly once after the heal
    val ids = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT id FROM archive ORDER BY id")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toList
    }
    assert(ids === List("1", "2", "3"))
    // a NEW batch id (and a new run) still writes
    writer.write(batch, 8L)
    assert(countRows() === 6)
    new UpsertJdbcBatchWriter(url, "run2", new java.util.Properties,
      tableFor = _ => "archive").write(batch, 7L)
    assert(countRows() === 9, "a different run_id is a different delivery")
  }

  test("mid-transaction failure: ORIGINAL exception propagates (close never masks), connection released") {
    // The r12 defect: `finally conn.close()` on an open transaction
    // throws Derby's "Cannot close a connection while a transaction is
    // still active", and an exception thrown from finally REPLACES the
    // in-flight one — so the real failure (here an injected
    // RuntimeException; in production the retryable Derby boot-race
    // NPE) could never be matched by any retry/handler, and the
    // connection leaked. withConnection must: propagate the ORIGINAL,
    // roll back, and release the connection.
    val db = tmpDir("derby-mask") + "/adb"
    val url = s"jdbc:derby:$db;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      """CREATE TABLE demo_t_orders (
        |  id VARCHAR(64), fb_no VARCHAR(16),
        |  record_del_time VARCHAR(32), data_json VARCHAR(4000))""".stripMargin)
    c0.close()

    // 1) the helper itself, directly: uncommitted INSERT then a throw
    val boom = intercept[RuntimeException] {
      JdbcRouting.withConnection(url, new java.util.Properties) { conn =>
        conn.setAutoCommit(false)
        val st = conn.prepareStatement(
          "INSERT INTO demo_t_orders (id, fb_no, record_del_time, data_json) VALUES (?, ?, ?, ?)")
        st.setString(1, "x"); st.setString(2, "F"); st.setString(3, "t"); st.setString(4, "{}")
        st.executeUpdate(); st.close()
        throw new RuntimeException("injected mid-transaction failure")
      }
    }
    assert(boom.getMessage === "injected mid-transaction failure",
      "the ORIGINAL exception must propagate, not a close-time SQLException")

    // 2) through a real writer: a tableFor that blows up after rows
    //    have already been batched into the open transaction
    val batch = ChangeArchiveJob.build(
      Seq("src-a" -> {
        import spark.implicits._
        Seq(envelope(1), envelope(2), envelope(3)).toDF("value")
      }),
      spark, cfg)
    val throwingTableFor = new (String => String) with Serializable {
      @transient private var n = 0
      def apply(t: String): String = {
        n += 1
        if (n > 2) throw new RuntimeException("injected mid-transaction failure")
        "demo_t_orders"
      }
    }
    val writer = new JdbcBatchWriter(url, new java.util.Properties,
      tableFor = throwingTableFor, insertBatchSize = 1)
    val sparkErr = intercept[Throwable] {
      writer.write(batch.coalesce(1), 0L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val chain = msgs(sparkErr)
    assert(chain.exists(_.contains("injected mid-transaction failure")),
      s"cause chain must carry the original failure; got: ${chain.mkString(" | ")}")
    assert(!chain.exists(_.toLowerCase.contains("close a connection")),
      s"close must never mask the in-flight exception; got: ${chain.mkString(" | ")}")

    // 3) the connection was rolled back and released: a fresh
    //    connection reads immediately (a leaked open transaction would
    //    hold Derby table locks and block this for lock-timeout), and
    //    the uncommitted rows are gone
    val c1 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c1.createStatement().executeQuery("SELECT COUNT(*) FROM demo_t_orders")
      rs.next()
      assert(rs.getInt(1) === 0, "failed transactions must roll back, not half-commit")
    } finally c1.close()
  }

  test("streamed dead-letter queue == batch cdc10 view; replay-idempotent; kept side intact") {
    val (srcA, srcB, ckpt, out, dlq) = (tmpDir("dlq-a"), tmpDir("dlq-b"),
      tmpDir("dlq-ckpt"), tmpDir("dlq-out"), tmpDir("dlq-q"))
    // every taxonomy branch the fixtures can hit: valid deletes, an
    // update, a blank table, a missing pre-image id, a bad ts, and an
    // unlisted table (db-scoped allowlist)
    val envsA = Seq(
      envelope(1),
      envelope(2, op = "u"),
      envelope(3, table = ""),
      """{"op":"d","ts_ms":1700000000004,"source":{"db":"demo","table":"t_orders"},"before":{"amount":"4.50"},"after":null}""",
      envelope(5, table = "t_other"))
    val envsB = Seq(
      envelope(10),
      """{"op":"d","ts_ms":-5,"source":{"db":"demo","table":"t_orders"},"before":{"id":11,"amount":"x"},"after":null}""")
    writeEnvelopes(srcA, "f1.jsonl", envsA)
    writeEnvelopes(srcB, "f1.jsonl", envsB)
    val q = ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA),
        ChangeArchiveJob.SourceStream("src-b", srcB)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt,
      deadLetterDir = Some(dlq))
    q.awaitTermination()

    // kept side flows through the annotated path UNCHANGED: same
    // enrichment, same rows the kept-only pipeline would deliver
    val kept = spark.read.parquet(out)
    assert(kept.select("id").collect().map(_.getString(0)).sorted === Array("1", "10"))
    assert(kept.filter(col("id") === "10").collect().head
      .getAs[String]("fbNo") === "FBB", "enrichment must survive the split")

    // streamed quarantine == the batch cdc10 view over the same files
    // with the same per-instance qualified allowlist, as a multiset
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val expected = multiset(
      Debezium.deadLetters(spark.read.text(srcA), Some(Seq("demo.t_orders")))
        .unionByName(
          Debezium.deadLetters(spark.read.text(srcB), Some(Seq("demo.t_orders")))))
    val got = multiset(DeadLetterSink.read(spark, dlq))
    assert(got === expected, "streamed DLQ must equal the batch dead-letter view")
    assert(got.values.sum === 5, "all five rejected envelopes quarantined")
    assert(got.keys.map(_._1).toSet ===
      Set(Debezium.NotDelete, Debezium.NoTable, Debezium.NoId,
        Debezium.BadTs, Debezium.NotListened),
      "every taxonomy branch exercised")

    // replay idempotence: re-delivering the SAME batchId (foreachBatch's
    // failure-recovery contract) overwrites, never duplicates
    val annotated = ChangeArchiveJob.buildAnnotated(
      Seq("src-a" -> spark.read.text(srcA), "src-b" -> spark.read.text(srcB)), cfg)
    DeadLetterSink.write(annotated, 0L, dlq)
    assert(multiset(DeadLetterSink.read(spark, dlq)) === expected,
      "a replayed batch must replace its own content exactly")
  }

  test("dead-letter replay: a config fix heals exactly the fixable rows ONCE; taxonomy reconciles") {
    val (srcA, ckpt, out, dlq, dlq2, replayOut) = (tmpDir("rp-a"), tmpDir("rp-ckpt"),
      tmpDir("rp-out"), tmpDir("rp-dlq"), tmpDir("rp-dlq2"), tmpDir("rp-replay"))
    // cfg listens only to t_orders: the t_users envelopes quarantine as
    // not_listened (the "mis-scoped config" failure a later fix heals);
    // the no-table and bad-ts envelopes are genuinely broken
    writeEnvelopes(srcA, "f1.jsonl", Seq(
      envelope(1),
      envelope(2, table = "t_users"),
      envelope(3, table = "t_users"),
      envelope(4, table = ""),
      """{"op":"d","ts_ms":-5,"source":{"db":"demo","table":"t_orders"},"before":{"id":9,"amount":"x"},"after":null}"""))
    ChangeArchiveJob.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", srcA)),
      cfg, Seq(new ParquetBatchWriter(out)), ckpt,
      deadLetterDir = Some(dlq)).awaitTermination()
    val before = DeadLetterSink.read(spark, dlq).collect()
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    assert(before === Map(Debezium.NotListened -> 2L, Debezium.NoTable -> 1L,
      Debezium.BadTs -> 1L), s"unexpected quarantine taxonomy: $before")

    // THE FIX: t_users joins the allowlist; replay the quarantine
    val cfgFixed = cfg.copy(tables = Seq("t_orders", "t_users"))
    def replay() = DeadLetterReplay.run(spark, dlq, cfgFixed,
      Seq(new ParquetBatchWriter(replayOut)), 9000L, dlq2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val report = replay()
    // reconciliation: every quarantined envelope accounted for once
    assert(report === Map(
      (Debezium.NotListened, Debezium.Kept) -> 2L,
      (Debezium.NoTable, Debezium.NoTable) -> 1L,
      (Debezium.BadTs, Debezium.BadTs) -> 1L), s"report diverged: $report")
    assert(report.values.sum === before.values.sum,
      "replay lost or duplicated a quarantined envelope")
    // healed rows delivered exactly once, fully enriched
    def healedRows() = spark.read.parquet(s"$replayOut/batch_id=9000").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("fbNo"),
        r.getAs[String]("dbTbName")))
    val healed = healedRows()
    assert(healed.map(_._1).sorted === Array("2", "3"),
      "exactly the healable rows must deliver")
    assert(healed.forall(_._2 == "FBA"), "healed rows must be enriched")
    assert(healed.forall(_._3 == "demo_t_users"))
    // still-dead rows re-quarantined with their RE-classified reasons,
    // raw envelopes intact (the next fix can replay again)
    val requeued = DeadLetterSink.readFull(spark, dlq2).collect()
    assert(requeued.map(_.getString(0)).sorted ===
      Array(Debezium.BadTs, Debezium.NoTable).sorted)
    assert(requeued.forall(_.getAs[String]("value").startsWith("{")),
      "re-quarantined rows must keep the raw envelope")
    // idempotency: a re-run overwrites itself — healed rows land ONCE
    val report2 = replay()
    assert(report2 === report, "replay must be deterministic")
    assert(healedRows().sorted.toSeq === healed.sorted.toSeq,
      "a replayed replay must not duplicate healed rows")
  }

  test("streamed schema-drift monitor: cumulative partials == batch cdc09 taxonomy across resume") {
    val (src, ckpt, out) = (tmpDir("drift-src"), tmpDir("drift-ckpt"), tmpDir("drift-out"))
    def taxonomy(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    // phase 1: canonical rows + a null tombstone
    writeEnvelopes(src, "f1.jsonl", Seq(
      envelope(1), envelope(2),
      """{"op":"d","ts_ms":1700000000003,"source":{"db":"demo","table":"t_orders"},"before":null,"after":null}"""))
    SchemaDriftMonitor.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", src)), out, ckpt).awaitTermination()
    // phase 2 (resume from the checkpoint): a DRIFTED shape arrives —
    // an upstream DDL added a column
    writeEnvelopes(src, "f2.jsonl", Seq(
      """{"op":"d","ts_ms":1700000000004,"source":{"db":"demo","table":"t_orders"},"before":{"id":4,"amount":"4.50","new_col":1},"after":null}"""))
    SchemaDriftMonitor.run(spark,
      Seq(ChangeArchiveJob.SourceStream("src-a", src)), out, ckpt).awaitTermination()
    val got = taxonomy(SchemaDriftMonitor.read(spark, out))
    // ground truth: the batch cdc09 taxonomy over ALL files at once —
    // the mergeable-partial contract is exactly this equality
    val batch = taxonomy(Debezium.shapeTaxonomy(spark.read.text(src))
      .select("table_name", "key_set", "n", "is_canonical"))
    assert(got === batch,
      "re-aggregated per-batch partials diverged from the whole-stream taxonomy")
    // the drifted shape is visible and NOT canonical — the alert fires
    val drifted = got.filter { case ((_, ks), _) => ks.contains("new_col") }
    assert(drifted.nonEmpty && drifted.values.forall(_._2 === 0),
      "the drifted key-set must surface with is_canonical = 0")
    // replay idempotence: re-folding batch 0's content overwrites
    Debezium.shapeTaxonomy(spark.read.text(s"$src/f1.jsonl"))
      .write.mode("overwrite").parquet(s"$out/batch_id=0")
    assert(taxonomy(SchemaDriftMonitor.read(spark, out)) === batch,
      "a replayed batch must replace its own partial exactly")
  }
}

package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The job entry point — the reference's `StartJob.main` re-expressed
  * (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/job/StartJob.java:36-107`):
  * load + validate the task YAML, build one stream per source instance,
  * union, and deliver to the ADB (JDBC) sink plus the flag-gated
  * Stream Load sink — each configured from its own sink YAML, exactly
  * the reference's `application-{db}.yaml` / `sink-adb.yaml` /
  * `sink-sr.yaml` split.
  *
  * Arguments (flag style, mirroring the reference's ParameterTool):
  *  - `--task <task.yaml>`          task config (required)
  *  - `--source <instance>=<dir>`   envelope dir per instance
  *    (repeatable; REQUIRED here: this environment has no MySQL to
  *    attach Debezium to, so streams arrive as Debezium-JSON files
  *    with identical envelopes — SURVEY.md §3.1)
  *  - `--checkpoint <dir>`          checkpoint location (required;
  *    the reference's `enableCheckpointing(60_000)`)
  *  - `--out <dir>`                 parquet archive sink (optional)
  *  - `--sink-adb <sink.yaml>`      JDBC sink config (optional)
  *  - `--adb-url <jdbc url>`        overrides the URL derived from the
  *    adb sink yaml (`jdbc:mysql://host:port/dbName`) — lets tests and
  *    non-MySQL archives point anywhere JDBC reaches
  *  - `--adb-ledger <table>`        upgrade the JDBC sink from the
  *    reference's at-least-once contract to exactly-once via the
  *    batch-ledger claim (see [[IdempotentJdbcBatchWriter]]); the
  *    table needs `(batch_id BIGINT, partition_id INT, PRIMARY KEY
  *    (batch_id, partition_id))`
  *  - `--sink-sr <sink.yaml>`       Stream Load sink config; presence
  *    is the opt-in, like the reference's `sink_to_sr` flag
  *  - `--max-files-per-trigger <n>` backpressure: cap source files per
  *    micro-batch so a backlog drains in bounded batches
  *  - `--once`                      drain-and-stop (AvailableNow);
  *    default is a ProcessingTime trigger at the adb sink's
  *    `flushIntervalMs` (the reference's flush cadence, 5 s default)
  *
  * At least one sink must be configured.
  */
object ArchiveMain {

  final case class Args(
      task: String,
      sources: Seq[ChangeArchiveJob.SourceStream],
      checkpoint: String,
      out: Option[String],
      sinkAdb: Option[String],
      adbUrl: Option[String],
      adbLedger: Option[String],
      sinkSr: Option[String],
      maxFilesPerTrigger: Option[Int],
      once: Boolean)

  def parseArgs(argv: Array[String]): Args = {
    var task, checkpoint: Option[String] = None
    var out, sinkAdb, adbUrl, adbLedger, sinkSr: Option[String] = None
    var maxFiles: Option[Int] = None
    var sources = Vector.empty[ChangeArchiveJob.SourceStream]
    var once = false
    var i = 0
    def next(flag: String): String = {
      i += 1
      require(i < argv.length, s"$flag needs a value")
      argv(i)
    }
    while (i < argv.length) {
      argv(i) match {
        case "--task" => task = Some(next("--task"))
        case "--checkpoint" => checkpoint = Some(next("--checkpoint"))
        case "--out" => out = Some(next("--out"))
        case "--sink-adb" => sinkAdb = Some(next("--sink-adb"))
        case "--adb-url" => adbUrl = Some(next("--adb-url"))
        case "--adb-ledger" => adbLedger = Some(next("--adb-ledger"))
        case "--max-files-per-trigger" =>
          maxFiles = Some(next("--max-files-per-trigger").toInt)
        case "--sink-sr" => sinkSr = Some(next("--sink-sr"))
        case "--once" => once = true
        case "--source" =>
          val v = next("--source")
          val eq = v.indexOf('=')
          require(eq > 0, s"--source expects <instanceName>=<dir>, got: $v")
          sources :+= ChangeArchiveJob.SourceStream(v.take(eq), v.drop(eq + 1))
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
      i += 1
    }
    val a = Args(
      task.getOrElse(throw new IllegalArgumentException("--task is required")),
      sources,
      checkpoint.getOrElse(throw new IllegalArgumentException("--checkpoint is required")),
      out, sinkAdb, adbUrl, adbLedger, sinkSr, maxFiles, once)
    require(a.sources.nonEmpty, "at least one --source <instanceName>=<dir> is required")
    require(a.out.nonEmpty || a.sinkAdb.nonEmpty || a.sinkSr.nonEmpty,
      "configure at least one sink (--out / --sink-adb / --sink-sr)")
    // an --adb-* flag without --sink-adb would be silently ignored — the
    // operator would believe (exactly-once) JDBC delivery is configured
    require(a.sinkAdb.nonEmpty || (a.adbUrl.isEmpty && a.adbLedger.isEmpty),
      "--adb-url/--adb-ledger require --sink-adb")
    a
  }

  /** One id per checkpoint LINEAGE, persisted inside the checkpoint dir:
    * resuming the same checkpoint reuses it (so deterministic labels
    * keep skipping replayed loads), while a fresh/wiped checkpoint gets
    * a new id (so restarted-from-scratch batch 0 does NOT collide with
    * a previous lineage's labels on the FE — which would be silently
    * swallowed as replays and lose the new data).
    */
  def lineageRunId(checkpointDir: String): String = {
    val marker = java.nio.file.Paths.get(checkpointDir, "graft_run_id")
    if (java.nio.file.Files.exists(marker))
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
    else {
      val id = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, id.getBytes("UTF-8"))
      id
    }
  }

  /** Build the writer stack from the parsed arguments — the sink
    * assembly of `StartJob.java:95-104`, with the parquet archive as
    * this environment's always-available stand-in store.
    */
  def writers(a: Args): Seq[BatchWriter] = {
    val parquet = a.out.map(new ParquetBatchWriter(_))
    val jdbc = a.sinkAdb.map { path =>
      val c = ConfigLoader.loadSink(path)
      val url = a.adbUrl.getOrElse(s"jdbc:mysql://${c.host}:${c.port}/${c.dbName}")
      val props = new java.util.Properties
      props.setProperty("user", c.username)
      props.setProperty("password", c.password)
      a.adbLedger match {
        case Some(ledger) => // exactly-once upgrade past the reference
          new IdempotentJdbcBatchWriter(url, ledger, props, insertBatchSize = c.batchSize)
        case None => // the reference's at-least-once contract
          new JdbcBatchWriter(url, props, insertBatchSize = c.batchSize)
      }
    }
    val sr = a.sinkSr.map { path =>
      val c = ConfigLoader.loadSink(path)
      // labels must be stable within a checkpoint lineage (replay skip)
      // but unique ACROSS lineages (fresh checkpoint restarts batch ids
      // at 0 — reusing old labels would skip-drop the new data)
      new StreamLoadBatchWriter(
        runId = lineageRunId(a.checkpoint),
        transport = new HttpLoadTransport(c.host, c.port, c.dbName, c.username, c.password),
        chunkSize = c.batchSize)
    }
    Seq(parquet, jdbc, sr).flatten
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val cfg = TaskConfigChecker.check(ConfigLoader.loadTask(a.task))
    // every --source instance must exist in the task YAML: the
    // enrichment join drops unmatched instances, so a typo'd name would
    // run a "healthy" job that silently archives zero rows
    val known = cfg.sources.map(_.instanceName).toSet
    val unknown = a.sources.map(_.instanceName).filterNot(known)
    require(unknown.isEmpty,
      s"--source instance(s) not in task config: ${unknown.mkString(", ")} " +
        s"(known: ${known.mkString(", ")})")
    val trigger =
      if (a.once) Trigger.AvailableNow()
      else {
        // cadence comes from whichever sink config exists (an sr-only
        // deployment's flushIntervalMs counts too), reference default 5 s
        val interval = a.sinkAdb.orElse(a.sinkSr)
          .map(p => ConfigLoader.loadSink(p).flushIntervalMs)
          .getOrElse(5000L)
        Trigger.ProcessingTime(interval)
      }
    val spark = SparkSession.builder()
      .appName("graft-change-archive")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val query = ChangeArchiveJob.run(spark, a.sources, cfg, writers(a), a.checkpoint,
      trigger, a.maxFilesPerTrigger)
    query.awaitTermination()
  }
}

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
  *  - `--max-files-per-trigger <n>` backpressure: cap files PER SOURCE
  *    per micro-batch (N sources admit ≤ N×n files) so a backlog
  *    drains in bounded batches
  *  - `--dead-letter <dir>`         parquet dead-letter quarantine: each
  *    micro-batch's rejected envelopes (reason, md5 replay id, claimed
  *    table) land under `<dir>/batch_id=N` — replay-idempotent (see
  *    [[DeadLetterSink]]); without the flag rejected envelopes are
  *    counted (drop taxonomy) but not persisted, like the reference's
  *    error logs
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
      once: Boolean,
      deadLetterDir: Option[String] = None)

  def parseArgs(argv: Array[String]): Args = {
    var task, checkpoint: Option[String] = None
    var out, sinkAdb, adbUrl, adbLedger, sinkSr, deadLetter: Option[String] = None
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
        case "--dead-letter" => deadLetter = Some(next("--dead-letter"))
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
      out, sinkAdb, adbUrl, adbLedger, sinkSr, maxFiles, once, deadLetter)
    require(a.sources.nonEmpty, "at least one --source <instanceName>=<dir> is required")
    require(a.out.nonEmpty || a.sinkAdb.nonEmpty || a.sinkSr.nonEmpty,
      "configure at least one sink (--out / --sink-adb / --sink-sr)")
    // an --adb-* flag without --sink-adb would be silently ignored — the
    // operator would believe (exactly-once) JDBC delivery is configured
    require(a.sinkAdb.nonEmpty || (a.adbUrl.isEmpty && a.adbLedger.isEmpty),
      "--adb-url/--adb-ledger require --sink-adb")
    require(a.maxFilesPerTrigger.forall(_ > 0),
      "--max-files-per-trigger must be positive")
    a
  }

  /** One id per checkpoint LINEAGE, persisted inside the checkpoint dir:
    * resuming the same checkpoint reuses it (so deterministic labels
    * keep skipping replayed loads), while a fresh/wiped checkpoint gets
    * a new id (so restarted-from-scratch batch 0 does NOT collide with
    * a previous lineage's labels on the FE — which would be silently
    * swallowed as replays and lose the new data).
    *
    * Goes through the Hadoop filesystem of the checkpoint URI, NOT
    * java.nio: checkpoints live on hdfs://'/s3a:// in production, and a
    * driver-local marker would mint a fresh id after a driver failover —
    * replayed chunks would then carry labels the FE has never seen,
    * re-loading every already-delivered row.
    */
  def lineageRunId(spark: SparkSession, checkpointDir: String): String = {
    val marker = new org.apache.hadoop.fs.Path(checkpointDir, "graft_run_id")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readExisting(): Option[String] = {
      val in = fs.open(marker)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      // a 0-byte/blank marker (crashed mid-write before this code used
      // atomic rename) must NOT become lineage id "" — empty ids would
      // collide across lineages and skip-drop real data
      Option(s).filter(_.nonEmpty)
    }
    def tryRead(): Option[String] =
      if (fs.exists(marker)) readExisting() else None
    tryRead().getOrElse {
      val id = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      fs.mkdirs(marker.getParent)
      // write-then-rename: the marker either exists fully-written or
      // not at all (rename is atomic on HDFS/posix); a lost rename race
      // means another driver won — adopt its id
      val tmp = new org.apache.hadoop.fs.Path(
        marker.getParent, s"graft_run_id.tmp.$id")
      val out = fs.create(tmp, /* overwrite = */ true)
      try out.write(id.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, marker)) id
      else {
        fs.delete(tmp, false)
        tryRead().getOrElse(throw new IllegalStateException(
          s"cannot establish lineage id: rename lost but $marker unreadable"))
      }
    }
  }

  /** Build the writer stack from parsed arguments + pre-loaded sink
    * configs — the sink assembly of `StartJob.java:95-104`, with the
    * parquet archive as this environment's always-available stand-in
    * store. Configs are loaded ONCE in `main` and shared with the
    * trigger-cadence derivation (no double parse, no torn reads).
    */
  def writers(
      a: Args,
      adbCfg: Option[SinkConfig],
      srCfg: Option[SinkConfig],
      runId: => String): Seq[BatchWriter] = {
    val parquet = a.out.map(new ParquetBatchWriter(_))
    val jdbc = adbCfg.map { c =>
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
    val sr = srCfg.map { c =>
      // labels must be stable within a checkpoint lineage (replay skip)
      // but unique ACROSS lineages (fresh checkpoint restarts batch ids
      // at 0 — reusing old labels would skip-drop the new data)
      new StreamLoadBatchWriter(
        runId = runId,
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
    val adbCfg = a.sinkAdb.map(ConfigLoader.loadSink(_))
    val srCfg = a.sinkSr.map(ConfigLoader.loadSink(_))
    val trigger =
      if (a.once) Trigger.AvailableNow()
      else {
        // cadence comes from whichever sink config exists (an sr-only
        // deployment's flushIntervalMs counts too), reference default 5 s
        val interval = adbCfg.orElse(srCfg)
          .map(_.flushIntervalMs).getOrElse(5000L)
        Trigger.ProcessingTime(interval)
      }
    val spark = SparkSession.builder()
      .appName("graft-change-archive")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val query = ChangeArchiveJob.run(spark, a.sources, cfg,
      writers(a, adbCfg, srCfg, lineageRunId(spark, a.checkpoint)),
      a.checkpoint, trigger, a.maxFilesPerTrigger, a.deadLetterDir)
    query.awaitTermination()
  }
}

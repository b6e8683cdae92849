package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's whole job, Spark-native: N Debezium-JSON sources →
  * envelope parse (drop-with-count) → union → broadcast enrichment →
  * checkpointed micro-batch delivery to pluggable dual sinks
  * (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/job/StartJob.java:37-107`).
  *
  * Structured-Streaming mapping (SURVEY.md §3.1):
  *  - the reference's MySQL-CDC sources become file streams of
  *    Debezium-JSON lines (this zero-egress environment has no MySQL;
  *    the envelope format is identical, `StartJob.java:63-80`);
  *  - `env.enableCheckpointing(60_000)` becomes `checkpointLocation` +
  *    a trigger — recovery resumes from the last committed batch with
  *    no loss;
  *  - the hand-rolled buffer/timer/synchronized sink machinery
  *    (`AdbSink.java:54-96`) disappears: micro-batch boundary ≡ flush
  *    boundary, `batchId` + deterministic labels ≡ replay protection;
  *  - watermarks are deliberately absent, like the reference
  *    (`WatermarkStrategy.noWatermarks()`, `StartJob.java:78`) — this
  *    is a processing-time pipeline.
  *
  * Scale stance: nothing here holds driver state; per-table fan-out is
  * a `partitionBy`/`repartition` on `dbTbName`, enrichment is a
  * broadcast join against the (tiny) source config, and parse/union are
  * map-side — the plan holds at 1000 executors reading real streams.
  */
object ChangeArchiveJob {

  /** One logical CDC source: where its Debezium-JSON lines arrive. */
  final case class SourceStream(instanceName: String, dir: String)

  /** The per-instance config table the enrichment join broadcasts
    * (`instanceName, dbAlias, fbNo` — `AdbSink.java:43-47`).
    */
  def sourcesDf(spark: SparkSession, cfg: TaskConfig): DataFrame = {
    import spark.implicits._
    cfg.sources.map(s => (s.instanceName, cfg.dbAlias, s.fbNo))
      .toDF("instanceName", "dbAlias", "fbNo")
  }

  /** Assemble parse → union → enrich over already-created envelope
    * frames (streaming or batch — the plan is identical; tests reuse it
    * in batch mode for golden checks).
    *
    * `cfg.tables` is ENFORCED here, not just validated: the reference
    * pushes the db.table allowlist into the CDC connector so unlisted
    * tables never enter the pipeline (`StartJob.java:55-57,66-67` —
    * per source, each listed table prefixed with that source's
    * `dbName`); our file-stream model filters right after parse with
    * the same PER-INSTANCE qualified list, counting the drops under
    * `not_listened` so a mis-scoped source directory (including a
    * same-named table from another database) is visible in the
    * taxonomy instead of silently archived. An instance absent from
    * `cfg.sources` gets an empty list — everything it carries drops
    * counted (enrich would discard it unmatched anyway; this way the
    * drop is observable).
    */
  /** The task's QUALIFIED `db.table` allowlist for one instance
    * (`StartJob.java:55-57` — each listed table prefixed with that
    * source's dbName; an instance absent from `cfg.sources` gets the
    * empty list, so everything it carries drops counted). ONE
    * implementation shared by [[build]] and [[buildAnnotated]] — the
    * two pipelines must never scope the allowlist differently.
    */
  private[cdc] def qualifiedFor(cfg: TaskConfig, instanceName: String): Seq[String] =
    cfg.sources.find(_.instanceName == instanceName)
      .map(src => cfg.tables.map(t => s"${src.dbName}.$t"))
      .getOrElse(Seq.empty)

  def build(
      streams: Seq[(String, DataFrame)],
      spark: SparkSession,
      cfg: TaskConfig): DataFrame = {
    val parsed = streams.map { case (instanceName, envelopes) =>
      Debezium.parseChanges(envelopes, instanceName,
        observeName = Some(s"cdc_parse_$instanceName"),
        allowedTables = Some(qualifiedFor(cfg, instanceName)))
    }
    // bag-semantics union of N per-instance streams (StartJob.java:89-92)
    val unioned = parsed.reduce(_ unionByName _)
    Debezium.enrich(unioned, sourcesDf(spark, cfg))
  }

  /** [[build]]'s dual-delivery twin: the SAME per-instance qualified
    * allowlists and parse pass, but every envelope survives to the
    * micro-batch carrying its classified `reason` — the kept/dead
    * split happens inside `foreachBatch` ([[DeadLetterSink]]), so one
    * source read feeds both the archive and the quarantine.
    * Enrichment is NOT applied here: the config join would drop dead
    * letters from mis-configured instances — exactly the rows a
    * quarantine exists for — so [[run]] enriches only the kept side,
    * per batch.
    */
  def buildAnnotated(
      streams: Seq[(String, DataFrame)],
      cfg: TaskConfig): DataFrame =
    streams.map { case (instanceName, envelopes) =>
      Debezium.parseAnnotated(envelopes, instanceName,
        observeName = Some(s"cdc_parse_$instanceName"),
        allowedTables = Some(qualifiedFor(cfg, instanceName)))
    }.reduce(_ unionByName _)

  /** Start the streaming job: one file-stream per source, dual-sink
    * `foreachBatch` delivery, checkpointed.
    *
    * @param trigger `AvailableNow` drains what exists then stops (used
    *   by tests/backfills); `ProcessingTime(flushIntervalMs)` matches
    *   the reference's flush cadence (`SinkConfig.java:21`).
    * @param maxFilesPerTrigger backpressure bound, applied PER SOURCE
    *   stream (Spark file-source semantics): with N sources a
    *   micro-batch admits at most `N × maxFilesPerTrigger` files — size
    *   the cap for the instance count. Keeps a backlog (or backfill)
    *   draining in bounded-memory batches instead of one giant batch —
    *   the streaming analogue of the reference's `batchSize` buffer cap
    *   (`SinkConfig.java:20`). `AvailableNow` honors it too.
    */
  /** @param deadLetterDir when set, the job streams the ANNOTATED
    *   parse ([[buildAnnotated]]) and each micro-batch splits kept vs
    *   dead: kept rows are enriched and delivered to `writers` exactly
    *   as before; rejected envelopes land in a parquet quarantine
    *   under this directory via [[DeadLetterSink]] (reason, md5 replay
    *   id, claimed table — cdc10's view, streamed). Replay-idempotent:
    *   a re-delivered batchId overwrites its own deterministic
    *   subdirectory, never duplicating (the md5 ids additionally let
    *   downstream consumers dedupe across batches). Unset = the
    *   original kept-only pipeline, byte-identical plan.
    */
  def run(
      spark: SparkSession,
      sources: Seq[SourceStream],
      cfg: TaskConfig,
      writers: Seq[BatchWriter],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      deadLetterDir: Option[String] = None): StreamingQuery = {
    TaskConfigChecker.check(cfg)
    // sink timestamps are rendered with date_format (session-timezone
    // dependent); the streaming query re-reads the conf every
    // micro-batch, so UTC must stay pinned for the query's lifetime.
    // A DEDICATED session (shared SparkContext, isolated conf) pins it
    // without mutating the caller's session — an embedder's non-UTC
    // timezone survives starting this job. Note the returned query is
    // registered on the private session's StreamingQueryManager: manage
    // it through the returned handle, not `callerSession.streams`.
    val session = spark.newSession()
    // newSession() initializes SQL conf from builder-time SparkConf
    // only, so copy the caller's RUNTIME conf entries (spark.conf.set
    // after startup — shuffle partitions, codegen flags, …) before
    // pinning UTC; static/immutable entries reject the set and keep
    // their builder-time values, which is the correct outcome
    spark.conf.getAll.foreach { case (k, v) =>
      try session.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    session.conf.set("spark.sql.session.timeZone", "UTC")
    val streams = sources.map { s =>
      val reader = session.readStream
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      s.instanceName -> reader.text(s.dir)
    }
    // the two modes differ ONLY in the streamed frame and the per-batch
    // body; the writeStream scaffolding (pin once / deliver / unpersist,
    // checkpoint, trigger) is shared so a future option lands in both
    val (streamed, deliver): (DataFrame, (DataFrame, Long) => Unit) =
      deadLetterDir match {
        case None =>
          // one materialization serves every writer (dual-sink
          // delivery, StartJob.java:95-104) — without it each writer
          // would re-read the sources and re-parse
          (build(streams, session, cfg),
            (batch, batchId) => writers.foreach(_.write(batch, batchId)))
        case Some(dlqDir) =>
          // ONE parse pass pinned once serves the archive writers AND
          // the quarantine — the scale point of the annotated path
          val sources0 = sourcesDf(session, cfg)
          (buildAnnotated(streams, cfg),
            (batch, batchId) => {
              val kept = Debezium.enrich(
                batch.filter(col("reason") === Debezium.Kept)
                  .select("instanceName", "tableName", "id", "recordDelTime", "dataJson"),
                sources0)
              writers.foreach(_.write(kept, batchId))
              DeadLetterSink.write(batch, batchId, dlqDir)
            })
      }
    streamed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pinned = batch.persist()
        try deliver(pinned, batchId)
        finally pinned.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}

/** The streamed twin of cdc09's schema-drift monitor — the third
  * streamed audit next to the archive and the dead-letter quarantine:
  * a SEPARATE lightweight streaming query (its own checkpoint, like
  * production monitoring side-cars — it must not couple the delivery
  * path's latency to audit writes) that folds every micro-batch of raw
  * envelopes into the (table, key-set) shape taxonomy and persists the
  * per-batch partial under `dir/batch_id=N`. Per-batch taxonomies are
  * EXACT mergeable partials ([[Debezium.shapeTaxonomy]]), so
  * [[SchemaDriftMonitor.read]]'s re-aggregation reproduces the
  * whole-stream taxonomy precisely (spec-pinned == the batch cdc09
  * view); writes are replay-idempotent by per-batch overwrite
  * ([[DeadLetterSink]]'s contract). Alerting at scale is a filter on
  * `is_canonical = 0` over the cumulative view — KB-scale at any
  * stream volume.
  */
object SchemaDriftMonitor {
  def run(
      spark: SparkSession,
      sources: Seq[ChangeArchiveJob.SourceStream],
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      canonical: String = "amount,id,k"): StreamingQuery = {
    val raw = sources.map(s => spark.readStream.text(s.dir)).reduce(_ unionByName _)
    raw.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Debezium.shapeTaxonomy(batch, canonical)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The cumulative taxonomy: per-batch exact partials re-aggregated.
    * `is_canonical` is a pure function of `key_set`, so `max` merges it
    * losslessly.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/batch_id=*")
      .groupBy("table_name", "key_set")
      .agg(sum(col("n")).as("n"), max(col("is_canonical")).as("is_canonical"))
}

/** Parquet quarantine for the streamed dead-letter split (cdc10's
  * audit view, wired into the job's `foreachBatch`): per micro-batch,
  * every rejected envelope's (reason, md5 replay id, claimed table)
  * lands under `dir/batch_id=<id>/`. EXACTLY-ONCE on replay by
  * construction: `foreachBatch` re-delivers a failed batch under the
  * SAME batchId, and the write overwrites that batch's own
  * deterministic subdirectory — re-delivery replaces identical content
  * instead of appending a duplicate (the JDBC MERGE sink's contract,
  * for files). The md5 replay id additionally gives downstream
  * consumers a key to dedupe on across batch boundaries.
  */
object DeadLetterSink {
  def write(annotated: DataFrame, batchId: Long, dir: String): Unit =
    annotated.filter(col("reason") =!= Debezium.Kept)
      .select(col("reason"), col("env_md5"),
        coalesce(col("tableName"), lit("")).as("tbl"),
        col("instanceName"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** The quarantine as one DataFrame (all batches), for audits and the
    * streamed==batch equivalence pin.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/batch_id=*")
      .select("reason", "env_md5", "tbl")

  /** The full quarantine including the raw envelopes and their source
    * instance — the replay surface ([[DeadLetterReplay]]).
    *
    * Read with mergeSchema=true: the live job appends batch dirs into
    * one quarantine dir across upgrades, so a mixed-generation dir
    * (old batches written before instanceName/value existed) is the
    * default upgrade path. Without the merge, whichever footer Spark
    * samples decides whether the select throws or the old batches
    * silently null-fill. With it, pre-upgrade rows surface as nulls —
    * which [[DeadLetterReplay.run]] then counts and REFUSES to
    * silently drop. A dir where NO batch carries the replay columns
    * fails here, loudly, instead of at a downstream resolver.
    */
  def readFull(spark: SparkSession, dir: String): DataFrame = {
    val merged = spark.read
      .option("basePath", dir)
      .option("mergeSchema", "true")
      .parquet(s"$dir/batch_id=*")
    val missing = Seq("instanceName", "value").filterNot(merged.columns.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"dead-letter dir $dir has no batch with replay columns ${missing.mkString(", ")} — " +
          "it predates the replay surface entirely; drain or migrate it before DeadLetterReplay")
    merged.select("reason", "env_md5", "tbl", "instanceName", "value")
  }
}

/** The operational loop the quarantine promises (VERDICT r12 #8): fix
  * the parser/config, then REPLAY exactly what was dropped instead of
  * re-tailing the binlog. One batch pass:
  *
  *  1. read the full quarantine, dedupe on the md5 replay id (an
  *     envelope quarantined in several generations replays once);
  *  2. re-classify every envelope through the CURRENT parser with the
  *     CURRENT config's per-instance allowlist — the same
  *     [[Debezium.parseAnnotated]] the live job runs, so a fix that
  *     heals the stream heals the replay identically;
  *  3. newly-KEPT rows enrich and deliver through the normal writers
  *     under the caller's `replayBatchId` — DETERMINISTIC, so the
  *     parquet/ledger/MERGE writers' own idempotency contracts make a
  *     re-run of the replay overwrite itself, never duplicate;
  *  4. still-rejected envelopes re-quarantine (with their RE-classified
  *     reason) into the successor quarantine directory, preserving the
  *     full replay surface for the next fix;
  *  5. returns the reconciliation report: (reason_before, reason_after,
  *     n) — every quarantined envelope accounted for exactly once, the
  *     audit that proves the replay neither lost nor duplicated.
  *
  * The caller retires the old quarantine dir after a successful replay
  * (the report is the evidence); re-running against the old dir is safe
  * by 3's idempotency. All work is executor-side except the per-instance
  * loop (bounded by the config's source count, like the live job's
  * per-source union).
  */
object DeadLetterReplay {
  def run(
      spark: SparkSession,
      quarantineDir: String,
      cfg: TaskConfig,
      writers: Seq[BatchWriter],
      replayBatchId: Long,
      requarantineDir: String): DataFrame = {
    TaskConfigChecker.check(cfg)
    import spark.implicits._
    val full = DeadLetterSink.readFull(spark, quarantineDir)
      .dropDuplicates("env_md5")
      .persist()
    try {
      // Pre-upgrade batches (written before instanceName/value existed)
      // surface as nulls under readFull's mergeSchema read. They cannot
      // replay (no raw envelope to re-parse) and their md5(null) ids
      // would collapse under the dedupe and then vanish from the
      // inner-join reconciliation — violating the "every quarantined
      // envelope accounted for exactly once" contract. Refuse loudly:
      // the operator drains or migrates the old dir first.
      val preUpgrade =
        full.filter(col("value").isNull || col("instanceName").isNull).count()
      if (preUpgrade > 0)
        throw new IllegalStateException(
          s"dead-letter dir $quarantineDir carries $preUpgrade pre-upgrade envelope(s) " +
            "with null instanceName/value (batches written before the replay surface); " +
            "they cannot be replayed and would silently vanish from the reconciliation — " +
            "drain or migrate those batch dirs before running DeadLetterReplay")
      // re-classify with the CURRENT config, per source instance (the
      // allowlist is per-instance-qualified, exactly as in the live job)
      val insts = full.select("instanceName").distinct().collect()
        .map(_.getString(0)).toSeq.sorted
      val reparsedFrames = insts.map { inst =>
        Debezium.parseAnnotated(
          full.filter(col("instanceName") === inst).select("value"),
          inst,
          allowedTables = Some(ChangeArchiveJob.qualifiedFor(cfg, inst)))
      }
      if (reparsedFrames.isEmpty)
        Seq.empty[(String, String, Long)].toDF("reason_before", "reason_after", "n")
      else {
        val pinned = reparsedFrames.reduce(_ unionByName _).persist()
        try {
          val healed = Debezium.enrich(
            pinned.filter(col("reason") === Debezium.Kept)
              .select("instanceName", "tableName", "id", "recordDelTime", "dataJson"),
            ChangeArchiveJob.sourcesDf(spark, cfg))
          writers.foreach(_.write(healed, replayBatchId))
          DeadLetterSink.write(pinned, replayBatchId, requarantineDir)
          // reconciliation: old reason × new reason, exact counts —
          // sum(n) over the report == quarantined envelopes, always
          val report = full
            .select(col("env_md5"), col("reason").as("reason_before"))
            .join(pinned.select(col("env_md5"), col("reason").as("reason_after")),
              "env_md5")
            .groupBy("reason_before", "reason_after")
            .agg(count(lit(1)).as("n"))
            .collect() // materialize before unpersisting the inputs
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          report.toSeq.toDF("reason_before", "reason_after", "n")
        } finally { pinned.unpersist(); () }
      }
    } finally { full.unpersist(); () }
  }
}

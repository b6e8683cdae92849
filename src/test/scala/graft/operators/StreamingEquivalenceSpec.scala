package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The inventory's streaming operators, actually run as streams: the
  * same transformations go through `readStream` → memory sink and must
  * produce exactly the batch twin's rows.
  */
class StreamingEquivalenceSpec extends AnyFunSuite {

  /** events (sf0.001) staged as a file-stream source. */
  private lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("events-stream").toString
    graft.Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents: DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(stagedDir)

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("tumbling window: streaming result == batch twin") {
    val streamed = runToMemory(
      streamEvents
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("total_value")),
      "st01_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st01_tumbling_window").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
  }

  test("sampled window: streaming selects the SAME deterministic sample as batch") {
    val streamed = runToMemory(
      streamEvents
        .filter(expr(
          "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 20"))
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n")),
      "st06_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st06_sampled_window").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
  }

  test("session window: streaming result == batch twin") {
    val streamed = runToMemory(
      streamEvents
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events")),
      "st03_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st03_session_window").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
  }

  test("windowed distinct: CHAINED stateful aggs (dedup -> count) == batch twin") {
    // the Spark 3.4+ multiple-stateful-operator pipeline: (window, user)
    // dedup agg feeding a window-grain count agg, run in APPEND mode
    // (the only mode chained stateful supports). Append emits a window
    // only once the watermark passes its end, so the source is staged
    // WITH a far-future sentinel row that closes every real window; the
    // sentinel's own window is dropped from the comparison.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("events-chained").toString
    val base = graft.Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val sentinelTs = java.sql.Timestamp.valueOf("2199-01-01 00:00:00")
    val sentinel = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(-1L, sentinelTs, -1L, "sentinel", 0.0)),
      base.schema)
    base.unionByName(sentinel).write.mode("overwrite").parquet(dir)
    val streamed = runToMemory(
      spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(window(window_time(col("window")), "1 day"))
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("n_users"), col("n_events")),
      "st13_stream", "append")
      .filter(col("window_start") < java.sql.Timestamp.valueOf("2199-01-01 00:00:00"))
    val batch = StreamingWindows.all.find(_.name == "st13_windowed_distinct").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(streamed.count() > 0, "no closed windows emitted — sentinel failed")
  }

  test("streaming dedup state suppresses duplicates ACROSS restarted batches") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("dedup-src").toString
    val ckpt = Files.createTempDirectory("dedup-ckpt").toString
    val out = Files.createTempDirectory("dedup-out").toString

    def addFile(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8"))

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING")
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    addFile("b1.jsonl", Seq(
      """{"ts":"2024-01-01 10:00:00","user_id":1,"event_type":"click"}""",
      """{"ts":"2024-01-01 10:01:00","user_id":2,"event_type":"view"}"""))
    runOnce()
    // restart: a duplicate key arrives within the watermark window —
    // the dedup state store must remember it across the restart
    addFile("b2.jsonl", Seq(
      """{"ts":"2024-01-01 10:10:00","user_id":1,"event_type":"click"}""",
      """{"ts":"2024-01-01 10:11:00","user_id":3,"event_type":"click"}"""))
    runOnce()

    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows === Seq((1L, "click"), (2L, "view"), (3L, "click")),
      s"cross-batch duplicate must be suppressed: $rows")
  }

  test("stream-static enrichment join == batch twin (no state store)") {
    val dim = graft.Tables.load(spark, sf0001, "nation")
      .select(col("n_nationkey"), col("n_name").as("nation"))
    val streamed = runToMemory(
      streamEvents
        .join(broadcast(dim), pmod(col("user_id"), lit(25)) === col("n_nationkey"))
        .groupBy(col("nation"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value")),
      "st07_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st07_stream_static_enrich").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
  }

  test("stream-static ANTI join (admission filter) == batch twin; blocklist binds") {
    // the suppression list is the PRECOMPUTED static artifact: derived
    // once batch-side, then anti-joined against the live stream
    val ev = graft.Tables.load(spark, sf0001, "events")
    val cnt = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val thr = cnt.agg(expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)").as("t"))
    val block = cnt.crossJoin(broadcast(thr))
      .filter(col("c") >= col("t")).select("user_id")
    assert(block.count() > 0, "p99 blocklist empty — the anti join is vacuous")
    val streamed = runToMemory(
      streamEvents
        .join(broadcast(block), Seq("user_id"), "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value")),
      "st11_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st11_stream_static_anti").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
    // suppression genuinely removed rows (not the trivial no-op filter)
    val admitted = batch.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(admitted < ev.count(), "blocklist suppressed nothing")
  }

  test("sessionized funnel: streaming result == batch twin") {
    // the funnel predicate is order-insensitive aggregates only
    // (MAX(purchase ts) > MIN(view ts)) and session merging is
    // associative, so the stream MUST converge to the batch answer
    // regardless of micro-batch boundaries
    val streamed = runToMemory(
      streamEvents
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(when(col("event_type") === "view", 1)).as("n_views"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
          coalesce(
            max(when(col("event_type") === "purchase", col("ts"))) >
              min(when(col("event_type") === "view", col("ts"))),
            lit(false)).as("converted"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_views"), col("n_purchases"), col("converted")),
      "st09_stream", "complete")
    val batch = StreamingWindows.all.find(_.name == "st09_session_funnel").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(streamed.filter(col("converted")).count() > 0,
      "no converted sessions at fixture scale — funnel pin is vacuous")
  }

  test("stream-stream interval join (watermarked) == batch twin") {
    // two watermarked streams off the same staged source; the interval
    // condition (p.ts in [v.ts, v.ts + 1h)) is what lets the state
    // store evict views older than the watermark + bound
    val v = streamEvents.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = streamEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = v.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    val streamed = runToMemory(joined, "st05_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st05_stream_stream_join").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(batch.count() > 0, "fixture must exercise the join")
  }

  test("stream-stream LEFT OUTER interval join == batch twin on the watermark-closed region") {
    val v = streamEvents.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = streamEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = v.join(p,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("v_ts"),
        col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    val streamed = runToMemory(joined, "st08_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st08_outer_interval_join").get
      .build(spark, sf0001)
    // Outer-ness is watermark-gated: a null row for view v is emitted
    // only once the watermark proves no in-window purchase can still
    // arrive (v_ts + 1h <= final watermark = max event time - 1h).
    // Matched rows emit unconditionally, so compare (a) the full
    // matched sets, and (b) null rows on the provably-closed region.
    val maxTs = graft.Tables.load(spark, sf0001, "events")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val closedUs = maxTs - 2L * 3600L * 1000000L
    def matched(df: DataFrame) = df.filter(col("purchase_id").isNotNull)
      .select("user_id", "view_id", "purchase_id", "gap_us")
    assert(sortedRows(matched(streamed)) === sortedRows(matched(batch)))
    val streamedNulls = streamed
      .filter(col("purchase_id").isNull && unix_micros(col("v_ts")) <= closedUs)
      .select("view_id")
    // batch twin doesn't carry v_ts; recover the closed region by key
    val closedViews = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "view" && unix_micros(col("ts")) <= closedUs)
      .select(col("event_id").as("view_id"))
    val batchNulls = batch.filter(col("purchase_id").isNull)
      .join(closedViews, "view_id").select("view_id")
    assert(sortedRows(streamedNulls) === sortedRows(batchNulls))
    assert(batchNulls.count() > 0, "fixture must exercise the outer (null) path")
  }

  test("stream-stream FULL OUTER interval join == batch twin on both closed regions") {
    val v = streamEvents.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = streamEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = v.join(p,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
        "fullOuter")
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("view_id"), col("v_ts"), col("purchase_id"), col("p_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    val streamed = runToMemory(joined, "st12_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st12_full_outer_interval_join").get
      .build(spark, sf0001)
    // matched rows emit unconditionally on both engines
    def matched(df: DataFrame) = df
      .filter(col("view_id").isNotNull && col("purchase_id").isNotNull)
      .select("user_id", "view_id", "purchase_id", "gap_us")
    assert(sortedRows(matched(streamed)) === sortedRows(matched(batch)))
    // each side's nulls compare on ITS watermark-closed region
    val maxTs = graft.Tables.load(spark, sf0001, "events")
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val closedUs = maxTs - 2L * 3600L * 1000000L
    def closedIds(tpe: String) = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === tpe && unix_micros(col("ts")) <= closedUs)
      .select(col("event_id").as("id"))
    val svn = streamed
      .filter(col("purchase_id").isNull && unix_micros(col("v_ts")) <= closedUs)
      .select(col("view_id").as("id"))
    val bvn = batch.filter(col("purchase_id").isNull)
      .select(col("view_id").as("id")).join(closedIds("view"), "id")
    assert(sortedRows(svn) === sortedRows(bvn), "view-side nulls diverged")
    val spn = streamed
      .filter(col("view_id").isNull && unix_micros(col("p_ts")) <= closedUs)
      .select(col("purchase_id").as("id"))
    val bpn = batch.filter(col("view_id").isNull)
      .select(col("purchase_id").as("id")).join(closedIds("purchase"), "id")
    assert(sortedRows(spn) === sortedRows(bpn), "purchase-side nulls diverged")
    // both outer paths must be genuinely exercised
    assert(bvn.count() > 0 && bpn.count() > 0,
      "fixture must exercise BOTH null sides of the full outer join")
  }

  test("stream-stream LEFT SEMI interval join == batch twin") {
    // semi join: each purchase emits at most once (a matched bit, not a
    // per-view fan-out); with AvailableNow every matched purchase's
    // match is eventually seen, so streamed == batch exactly
    val v = streamEvents.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = streamEvents.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    val joined = p.join(v,
        col("user_id") === col("v_user_id") &&
          col("ts") >= col("v_ts") &&
          col("ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
        "leftSemi")
      .select(col("user_id"), col("purchase_id"), col("ts"))
    val streamed = runToMemory(joined, "st10_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st10_semi_interval_join").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(batch.count() > 0, "fixture must exercise the semi join")
    // the filter semantics must actually bite: some purchases have no
    // qualifying view, else the semi join is a no-op pass-through
    val allP = graft.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "purchase").count()
    assert(batch.count() < allP, "fixture must reject some purchases")
  }

  test("cdc06 monitoring view runs as a real stream: parser + window == batch twin") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    // stage Debezium envelopes (valid deletes) as a file stream
    val src = JFiles.createTempDirectory("cdc06-src").toString
    val envs = (1 to 40).map { i =>
      val ts = 1700000000000L + i * 3600_000L // one per hour, ~2 days
      s"""{"op":"d","ts_ms":$ts,"source":{"db":"demo","table":"t_${i % 2}"},"before":{"id":$i},"after":null}"""
    }
    JFiles.write(JPaths.get(src, "f1.jsonl"), envs.mkString("\n").getBytes("UTF-8"))
    val parsedStream = graft.cdc.Debezium.parseChanges(
      spark.readStream.text(src), "inst-a")
      .groupBy(window(col("recordDelTime"), "1 day"), col("tableName"))
      .agg(count(lit(1)).as("n_deletes"))
      .select(col("window.start").as("day_start"),
        col("tableName").as("table_name"), col("n_deletes"))
    val streamed = runToMemory(parsedStream, "cdc06_stream", "complete")
    val batch = graft.cdc.Debezium.parseChanges(
      { import spark.implicits._; envs.toDF("value") }, "inst-a")
      .groupBy(window(col("recordDelTime"), "1 day"), col("tableName"))
      .agg(count(lit(1)).as("n_deletes"))
      .select(col("window.start").as("day_start"),
        col("tableName").as("table_name"), col("n_deletes"))
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(batch.count() >= 4, "fixture must span multiple day/table windows")
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) == batch distinct") {
    val streamed = runToMemory(
      streamEvents
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type"),
      "st04_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st04_key_dedup").get
      .build(spark, sf0001)
    assert(sortedRows(streamed) === sortedRows(batch))
  }

  // ---------------------------------------------------------------------
  // State-store SIZE proofs: st05/st08/st10/st12 all CLAIM watermark+1h
  // eviction keeps join state bounded; these tests assert it from the
  // engine's own StreamingQueryProgress.stateOperators metrics. Events
  // are staged as 6 time-ordered files and consumed 1 file/trigger, so
  // the watermark advances across micro-batches and eviction must show
  // up as numRowsRemoved — and the final state must hold a small
  // fraction of the stream, not the whole history.
  // ---------------------------------------------------------------------

  /** events sorted by ts, written as 6 sequential single-file chunks
    * (ascending mod-times → the file source replays them in time order).
    */
  private lazy val chunkedDir: String = {
    val dir = Files.createTempDirectory("events-chunked").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val base = graft.Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("rn", row_number().over(w))
    val n = base.count()
    for (i <- 0L until 6L)
      base.filter(col("rn") > i * n / 6 && col("rn") <= (i + 1) * n / 6)
        .drop("rn").coalesce(1)
        .write.mode("append").parquet(dir)
    dir
  }

  private def chunkedEvents: DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(chunkedDir)

  for ((flavor, joinType) <- Seq(
      "inner" -> "inner", "left outer" -> "leftOuter",
      "full outer" -> "fullOuter", "left semi" -> "leftSemi"))
    test(s"state stays bounded: stream-stream $flavor interval join evicts behind the watermark") {
      val v = chunkedEvents.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          col("user_id").as("v_user_id"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "1 hour")
      val p = chunkedEvents.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = p.join(v,
        col("p_user_id") === col("v_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      val name = s"state_${joinType.toLowerCase}"
      val q = joined.writeStream
        .format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(progs.length >= 3,
        s"expected multiple stateful micro-batches, got ${progs.length}")
      // eviction proof that holds for every flavor: far more rows were
      // ADDED to the store over the run than remain at the end. (The
      // direct numRowsRemoved counter is asserted below only where the
      // engine reports it — observed Spark 4.1 gap: the full-outer
      // join's eviction happens on the outer-null-emit path and never
      // ticks numRowsRemoved, while numRowsTotal drops identically.)
      val added = progs.flatMap(_.stateOperators).map(_.numRowsUpdated).sum
      val endTotal = progs.last.stateOperators.map(_.numRowsTotal).sum
      assert(added - endTotal > added / 2,
        s"$flavor: added $added state rows but $endTotal remain — eviction never ran")
      if (joinType != "fullOuter") {
        val removed = progs.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
        assert(removed > 0,
          s"$flavor: watermark eviction never removed a state row — state grows without bound")
      }
      val inputRows = graft.Tables.load(spark, sf0001, "events")
        .filter(col("event_type").isin("view", "purchase")).count()
      val finalTotal = progs.last.stateOperators.map(_.numRowsTotal).sum
      assert(finalTotal < inputRows / 2,
        s"$flavor: final state holds $finalTotal of $inputRows joined-side rows — " +
          "eviction is not keeping state at watermark-horizon size")
      // boundedness THROUGHOUT, not just at the end: no batch may hold
      // the whole history (the 30-day fixture vs the 1h+1h horizon)
      val maxTotal = progs.map(_.stateOperators.map(_.numRowsTotal).sum).max
      assert(maxTotal < inputRows,
        s"$flavor: some batch held $maxTotal >= all $inputRows rows in state")
    }

  test("sequence state machine: streaming matches == batch twin; automaton survives restart mid-pattern") {
    import spark.implicits._
    // A: the whole fixture through a real readStream state machine —
    // row-for-row equal to the chained-window batch twin, anchors at
    // full timestamp precision
    val streamed = runToMemory(
      SequenceMatch.matches(
        streamEvents.filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .as[SequenceMatch.SeqEvent]).toDF(),
      "st14_stream", "append")
    val batch = StreamingWindows.all.find(_.name == "st14_sequence_match").get
      .build(spark, sf0001)
    assert(sortedRows(streamed.select("user_id", "t1", "t2", "t3")) === sortedRows(batch))
    assert(streamed.count() > 0, "no completed sequence — equivalence pin is vacuous")

    // B: the automaton's state crosses a checkpointed restart
    // mid-pattern, and the done bit dedupes replayed suffixes
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("seq-src").toString
    val ckpt = Files.createTempDirectory("seq-ckpt").toString
    val out = Files.createTempDirectory("seq-out").toString
    def addFile(name: String, rows: Seq[String]): Unit = {
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8")); ()
    }
    def runOnce(): Unit = {
      val q = SequenceMatch.matches(
        spark.readStream
          .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING")
          .json(src)
          .select(col("user_id"), col("event_type"), col("ts"))
          .as[SequenceMatch.SeqEvent])
        .toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def matchesOnDisk(): Seq[(Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getTimestamp(3).toString)).toSeq.sorted
    // run 1: user 1 is mid-pattern (view + click, no purchase yet);
    // user 2's purchase without prior stages must never match
    addFile("b1.jsonl", Seq(
      """{"ts":"2024-01-01 10:00:00","user_id":1,"event_type":"view"}""",
      """{"ts":"2024-01-01 10:30:00","user_id":1,"event_type":"click"}""",
      """{"ts":"2024-01-01 10:05:00","user_id":2,"event_type":"purchase"}"""))
    runOnce()
    assert(matchesOnDisk().isEmpty, "no chain is complete yet")
    // run 2 (restart from the checkpoint): the qualifying purchase
    // arrives — the anchors persisted in the state store must complete
    // the match exactly once
    addFile("b2.jsonl", Seq(
      """{"ts":"2024-01-01 11:00:00","user_id":1,"event_type":"purchase"}"""))
    runOnce()
    assert(matchesOnDisk() === Seq((1L, "2024-01-01 11:00:00.0")),
      "the restart must complete the mid-pattern chain exactly once")
    // run 3: a later purchase for the same user is a no-op (done bit)
    addFile("b3.jsonl", Seq(
      """{"ts":"2024-01-01 11:30:00","user_id":1,"event_type":"purchase"}"""))
    runOnce()
    assert(matchesOnDisk() === Seq((1L, "2024-01-01 11:00:00.0")),
      "a completed user must never match again")
  }
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch views of the reference's CDC-archival semantics (SURVEY.md
  * §2.1 O2–O7) expressed over the `events` fixture table: op-code
  * filtering, JSON payload passthrough, epoch→formatted timestamp,
  * enrichment, multi-instance UNION ALL — and, in cdc04/cdc05, the
  * REAL envelope parser [[graft.cdc.Debezium]] run over Debezium
  * envelopes synthesized deterministically from `events` rows, so the
  * parser's keep/drop taxonomy is DuckDB-oracle-checkable. The
  * streaming execution of the same parser (sources → union → enrich →
  * dual sinks → checkpoint) is `graft.cdc.ChangeArchiveJob`, exercised
  * by its own golden-fixture + kill/resume specs.
  */
object CdcQueries {

  /** Deterministic Debezium envelopes from `events`: `event_id % 7`
    * selects the defect, covering every parser branch
    * (FIXTURES.md §A): 0/1 = valid delete, 2 = `before` lacks `id`,
    * 3 = op "i", 4 = blank table, 5 = `before` null (tombstone),
    * 6 = `ts_ms` 0. `amount` is decimal-rendered-as-string
    * (`decimal.handling.mode=string`, StartJob.java:60-61).
    */
  private def envelopes(s: SparkSession, dir: String): DataFrame = {
    val m = col("event_id") % 7
    val k = get_json_object(col("props"), "$.k")
    val amount = col("value").cast("decimal(12,2)").cast("string")
    val beforeFull = concat(lit("{\"id\":"), col("event_id"),
      lit(",\"k\":"), k, lit(",\"amount\":\""), amount, lit("\"}"))
    val beforeNoId = concat(lit("{\"k\":"), k, lit(",\"amount\":\""), amount, lit("\"}"))
    val before: Column = when(m === 5, lit("null"))
      .when(m === 2, beforeNoId).otherwise(beforeFull)
    val op: Column = when(m === 3, lit("i")).otherwise(lit("d"))
    val tbl: Column = when(m === 4, lit("")).otherwise(col("event_type"))
    val ts: Column = when(m === 6, lit(0L)).otherwise(unix_millis(col("ts")))
    // the synthesis + downstream parse are ~4 JSON operations per row:
    // CPU-bound, and the single-file fixture scan would otherwise run
    // them on ONE core (events.parquet is one input split at every SF)
    Tables.spread(Tables.load(s, dir, "events"), "event_id").select(concat(
      lit("{\"op\":\""), op,
      lit("\",\"ts_ms\":"), ts,
      lit(",\"source\":{\"db\":\"graft\",\"table\":\""), tbl,
      lit("\"},\"before\":"), before,
      lit(",\"after\":null}")).as("value"))
  }

  /** DuckDB twin of [[envelopes]] as a CTE body over `events`. */
  private val envelopesDuck =
    """SELECT '{"op":"' || CASE WHEN event_id % 7 = 3 THEN 'i' ELSE 'd' END ||
      |  '","ts_ms":' || CAST(CASE WHEN event_id % 7 = 6 THEN 0 ELSE EPOCH_MS(ts) END AS VARCHAR) ||
      |  ',"source":{"db":"graft","table":"' || CASE WHEN event_id % 7 = 4 THEN '' ELSE event_type END ||
      |  '"},"before":' ||
      |  CASE WHEN event_id % 7 = 5 THEN 'null'
      |       WHEN event_id % 7 = 2 THEN '{"k":' || (props->>'$.k') || ',"amount":"' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '"}'
      |       ELSE '{"id":' || CAST(event_id AS VARCHAR) || ',"k":' || (props->>'$.k') || ',"amount":"' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) || '"}'
      |  END || ',"after":null}' AS value
      |FROM events""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "cdc01_delete_archive_shape",
      Some("""SELECT CAST(event_id AS VARCHAR) AS id,
             |       'FB' || CAST(user_id % 3 AS VARCHAR) AS fb_no,
             |       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS record_del_time,
             |       props AS data_json
             |FROM events WHERE event_type = 'error'""".stripMargin),
      "The reference's archive row (AdbSink.java:111 schema): op filter + id stringify + ts format yyyy-MM-dd HH:mm:ss + opaque JSON payload (StartJob.java:153-163).") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(
            col("event_id").cast("string").as("id"),
            concat(lit("FB"), (col("user_id") % 3).cast("string")).as("fb_no"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("record_del_time"),
            col("props").as("data_json"))
    },

    GraftQuery(
      "cdc02_multi_instance_union",
      Some("""SELECT instance_name, event_type, COUNT(*) AS n FROM (
             |  SELECT 'inst-a' AS instance_name, event_type FROM events WHERE user_id % 2 = 0
             |  UNION ALL
             |  SELECT 'inst-b' AS instance_name, event_type FROM events WHERE user_id % 2 = 1
             |) t GROUP BY instance_name, event_type""".stripMargin),
      "Multi-source union (StartJob.java:89-92, bag semantics) + per-instance accounting.") {
      (s, dir) =>
        val e = Tables.load(s, dir, "events")
        e.filter(col("user_id") % 2 === 0)
          .select(lit("inst-a").as("instance_name"), col("event_type"))
          .unionByName(
            e.filter(col("user_id") % 2 === 1)
              .select(lit("inst-b").as("instance_name"), col("event_type")))
          .groupBy(col("instance_name"), col("event_type"))
          .agg(count(lit(1)).as("n"))
    },

    GraftQuery(
      "cdc03_enrichment_lookup",
      Some("""SELECT e.event_type AS table_name,
             |       'db' || CAST(e.user_id % 4 AS VARCHAR) AS db_alias,
             |       'db' || CAST(e.user_id % 4 AS VARCHAR) || '_' || e.event_type AS db_tb_name,
             |       COUNT(*) AS n
             |FROM events e GROUP BY 1, 2, 3""".stripMargin),
      "The dbTbName enrichment (AdbSink.java:88-90) as a pre-sink projection — done before the sink, not inside it (SURVEY.md O7).") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(col("event_type").as("table_name"),
            concat(lit("db"), (col("user_id") % 4).cast("string")).as("db_alias"))
          .withColumn("db_tb_name", concat(col("db_alias"), lit("_"), col("table_name")))
          .groupBy(col("table_name"), col("db_alias"), col("db_tb_name"))
          .agg(count(lit(1)).as("n"))
    },

    GraftQuery(
      "cdc04_envelope_parse",
      Some(s"""WITH env AS ($envelopesDuck)
              |SELECT 'inst-a' AS instance_name,
              |       (value->>'$$.source.table') AS table_name,
              |       (value->>'$$.before.id') AS id,
              |       STRFTIME(EPOCH_MS(CAST(value->>'$$.ts_ms' AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS record_del_time,
              |       (value->>'$$.before') AS data_json
              |FROM env
              |WHERE (value->>'$$.op') = 'd'
              |  AND TRIM(COALESCE(value->>'$$.source.table', '')) <> ''
              |  AND (value->>'$$.before') IS NOT NULL
              |  AND (value->>'$$.before.id') IS NOT NULL
              |  AND COALESCE(TRY_CAST(value->>'$$.ts_ms' AS BIGINT), 0)
              |      BETWEEN 1 AND ${graft.cdc.Debezium.MaxTsMs}""".stripMargin),
      "The REAL Debezium envelope parser (graft.cdc.Debezium.parseChanges, StartJob.java:113-165 semantics) over synthesized envelopes: keep op='d' with table/before/id/ts present, stringify id, epoch-ms -> formatted delete time, pass the pre-image through as opaque JSON (decimal-as-string preserved verbatim).") {
      (s, dir) =>
        graft.cdc.Debezium.parseChanges(envelopes(s, dir), "inst-a")
          .select(
            col("instanceName").as("instance_name"),
            col("tableName").as("table_name"),
            col("id"),
            date_format(col("recordDelTime"), "yyyy-MM-dd HH:mm:ss").as("record_del_time"),
            col("dataJson").as("data_json"))
    },

    GraftQuery(
      "cdc05_drop_taxonomy",
      Some(s"""WITH env AS ($envelopesDuck)
              |SELECT CASE WHEN (value->>'$$.op') IS DISTINCT FROM 'd' THEN 'not_delete'
              |            WHEN TRIM(COALESCE(value->>'$$.source.table', '')) = '' THEN 'no_table'
              |            WHEN (value->>'$$.before') IS NULL THEN 'no_before'
              |            WHEN (value->>'$$.before.id') IS NULL THEN 'no_id'
              |            WHEN COALESCE(TRY_CAST(value->>'$$.ts_ms' AS BIGINT), 0)
              |                 NOT BETWEEN 1 AND ${graft.cdc.Debezium.MaxTsMs} THEN 'bad_ts'
              |            ELSE 'kept' END AS reason,
              |       COUNT(*) AS n
              |FROM env GROUP BY 1""".stripMargin),
      "Drop-with-count observability (SURVEY.md §7.4): the parser's five drop branches (StartJob.java:123-151) plus 'kept', each counted — the assertable twin of the reference's error logs.") {
      (s, dir) =>
        graft.cdc.Debezium.dropCounts(envelopes(s, dir))
    },

    GraftQuery(
      "cdc07_table_allowlist",
      Some(s"""WITH env AS ($envelopesDuck)
              |SELECT CASE WHEN TRIM(COALESCE(value->>'$$.source.table', '')) <> ''
              |                 AND (COALESCE(value->>'$$.source.db', '') || '.' || (value->>'$$.source.table'))
              |                     NOT IN ('graft.click', 'graft.purchase', 'graft.view')
              |                 THEN 'not_listened'
              |            WHEN (value->>'$$.op') IS DISTINCT FROM 'd' THEN 'not_delete'
              |            WHEN TRIM(COALESCE(value->>'$$.source.table', '')) = '' THEN 'no_table'
              |            WHEN (value->>'$$.before') IS NULL THEN 'no_before'
              |            WHEN (value->>'$$.before.id') IS NULL THEN 'no_id'
              |            WHEN COALESCE(TRY_CAST(value->>'$$.ts_ms' AS BIGINT), 0)
              |                 NOT BETWEEN 1 AND ${graft.cdc.Debezium.MaxTsMs} THEN 'bad_ts'
              |            ELSE 'kept' END AS reason,
              |       COUNT(*) AS n
              |FROM env GROUP BY 1""".stripMargin),
      "The task's table ALLOWLIST enforced (StartJob.java:55-57,66-67: the reference pushes db.table filters into the CDC connector so unlisted tables never enter): a named table whose QUALIFIED db.table is absent from the list drops as not_listened AHEAD of the envelope-shape branches, whatever its op — and the drop is counted, never silent. Matching is db-scoped like the reference's tableList; blank-table envelopes can't match the list and keep their shape reason.") {
      (s, dir) =>
        graft.cdc.Debezium.dropCounts(envelopes(s, dir),
          allowedTables = Some(Seq("graft.click", "graft.purchase", "graft.view")))
    },

    GraftQuery(
      "cdc08_snapshot_compaction",
      Some("""SELECT user_id,
             |       event_id AS last_event_id,
             |       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             |       event_type AS last_type,
             |       value AS last_value
             |FROM events
             |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
             |        AND event_type <> 'error'""".stripMargin),
      "Change-log compaction: the operator that turns the reference's append-only delete archive into a queryable LATEST-ROW snapshot (MERGE/upsert semantics: last change per key wins, keys whose final change is a delete — here event_type='error' — vanish). Implemented as ONE aggregation with max_by over a unique (ts, event_id) ordering key (struct-ordered max_by plans SortAggregate — the buffer isn't hash-mutable — but partial_max_by still combines map-side): the single shuffle carries ONE candidate row per key per map task, where the equivalent row_number() window must shuffle EVERY change of every key and then sort — at 100 TB with many changes per key that shuffle-volume difference dominates; the oracle states the same semantics as the window formulation.") {
      (s, dir) =>
        val ord = struct(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            max_by(col("event_id"), ord).as("last_event_id"),
            date_format(max_by(col("ts"), ord), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            max_by(col("event_type"), ord).as("last_type"),
            max_by(col("value"), ord).as("last_value"))
          .filter(col("last_type") =!= "error")
    },

    GraftQuery(
      "cdc06_delete_rate_windows",
      Some(s"""WITH env AS ($envelopesDuck)
              |SELECT DATE_TRUNC('day', EPOCH_MS(CAST(value->>'$$.ts_ms' AS BIGINT))) AS day_start,
              |       (value->>'$$.source.table') AS table_name,
              |       COUNT(*) AS n_deletes
              |FROM env
              |WHERE (value->>'$$.op') = 'd'
              |  AND TRIM(COALESCE(value->>'$$.source.table', '')) <> ''
              |  AND (value->>'$$.before') IS NOT NULL
              |  AND (value->>'$$.before.id') IS NOT NULL
              |  AND COALESCE(TRY_CAST(value->>'$$.ts_ms' AS BIGINT), 0)
              |      BETWEEN 1 AND ${graft.cdc.Debezium.MaxTsMs}
              |GROUP BY 1, 2""".stripMargin),
      "Archive operational analytics: the parsed delete stream bucketed into per-table daily tumbling windows — the monitoring view an operator puts on the reference's pipeline (which only error-logs); window() over parseChanges output composes the parser with the streaming window operator.") {
      (s, dir) =>
        graft.cdc.Debezium.parseChanges(envelopes(s, dir), "inst-a")
          .groupBy(window(col("recordDelTime"), "1 day"), col("tableName"))
          .agg(count(lit(1)).as("n_deletes"))
          .select(col("window.start").as("day_start"),
            col("tableName").as("table_name"), col("n_deletes"))
    },

    GraftQuery(
      "cdc09_schema_drift",
      Some(s"""WITH env AS ($envelopesDuck),
              |k AS (SELECT
              |        CAST(value->>'$$.source.table' AS VARCHAR) AS table_name,
              |        CASE WHEN (value->'$$.before') IS NULL
              |               OR CAST(value->'$$.before' AS VARCHAR) = 'null' THEN '(null)'
              |             ELSE ARRAY_TO_STRING(LIST_SORT(json_keys(value, '$$.before')), ',')
              |        END AS key_set
              |      FROM env)
              |SELECT table_name, key_set, COUNT(*) AS n,
              |       CAST(CASE WHEN key_set = 'amount,id,k' THEN 1 ELSE 0 END AS INT)
              |         AS is_canonical
              |FROM k GROUP BY 1, 2""".stripMargin),
      "Schema-drift monitor over the change stream — the cdc05 drop-taxonomy discipline applied to SHAPE instead of values: per (table, payload key-set), how many envelopes arrived with exactly that set of before-image fields, with the canonical set flagged. This is the audit that catches an upstream DDL or connector-config change (a column added, dropped, or renamed) BEFORE it lands as silent nulls in the sink — at production scale the first sign of drift is a new key_set row, and alerting is a filter on is_canonical = 0 with n above noise. Key extraction is map-side JSON work on the raw envelope (json_object_keys, sorted to a canonical signature — 16-byte-ish strings cross the wire, never payloads), then ONE map-side-combining count at (table, key-set) grain; output cardinality is tables x observed shapes, tiny at any stream volume. The synthesized fixture genuinely exercises three shapes per table: full rows, the missing-id defect branch, and null tombstones.") {
      (s, dir) =>
        // body factored to Debezium.shapeTaxonomy (r12), shared verbatim
        // with the streamed SchemaDriftMonitor — same plan, one source
        // of truth for the taxonomy expressions
        graft.cdc.Debezium.shapeTaxonomy(envelopes(s, dir))
    },

    GraftQuery(
      "cdc10_dead_letter_queue",
      Some(s"""WITH env AS ($envelopesDuck),
              |cls AS (SELECT value,
              |        CASE WHEN (value->>'$$.op') IS DISTINCT FROM 'd' THEN 'not_delete'
              |             WHEN TRIM(COALESCE(value->>'$$.source.table', '')) = '' THEN 'no_table'
              |             WHEN (value->>'$$.before') IS NULL THEN 'no_before'
              |             WHEN (value->>'$$.before.id') IS NULL THEN 'no_id'
              |             WHEN COALESCE(TRY_CAST(value->>'$$.ts_ms' AS BIGINT), 0)
              |                  NOT BETWEEN 1 AND ${graft.cdc.Debezium.MaxTsMs} THEN 'bad_ts'
              |             ELSE 'kept' END AS reason
              |        FROM env)
              |SELECT reason, MD5(value) AS env_md5,
              |       COALESCE(value->>'$$.source.table', '') AS tbl
              |FROM cls WHERE reason <> 'kept'""".stripMargin),
      "The DEAD-LETTER QUEUE completing cdc05's taxonomy: cdc05 COUNTS each rejection reason; this materializes the rejected envelopes themselves — reason, a 16-byte md5 replay id, and the raw claimed table — the quarantine store a production CDC pipeline persists NEXT TO the counters, because the counters tell you something broke but only the quarantined rows let a parser fix REPLAY exactly what was dropped (the alternative is re-tailing the binlog from before the incident, which retention may no longer allow). Same classification chain as parseChanges, same branch order, factored from the same extracted-fields pass (one json_tuple per envelope, map-side); the md5 id crosses the wire, not the payload — the DLQ store itself is written payload-inclusive by the sink, but the AUDIT view here stays KB-scale at any stream volume. The kept/dead split provably partitions the stream (DebeziumSpec: kept + dead == total, disjoint).") {
      (s, dir) =>
        graft.cdc.Debezium.deadLetters(envelopes(s, dir))
    },
  )
}

package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Debezium-JSON envelope parsing — the Spark-native re-expression of
  * the reference's `ParseDeleteWithSource` map function
  * (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/job/StartJob.java:113-165`).
  *
  * Input: a `value: STRING` column, one Debezium envelope per row
  * (works identically on a batch DataFrame and a streaming one — the
  * expressions are pure, so the same plan serves both). The envelope
  * fields the reference reads: `op`, `source.table`, `before` (full
  * pre-image), `ts_ms`.
  *
  * Drop semantics mirror the reference's branches IN ORDER, but
  * "drop with an error log" becomes "drop with a metric": every
  * rejected row is counted per reason via `Dataset.observe`, so the
  * drop taxonomy is assertable in tests and visible in streaming
  * progress events (SURVEY.md §7.4).
  *
  * `decimal.handling.mode=string` (`StartJob.java:60-61`) is honored
  * by construction: `before` is never re-typed — the whole pre-image
  * passes through as raw JSON text (`dataJson`), so decimals encoded
  * as strings survive byte-for-byte.
  */
object Debezium {

  /** Drop reasons, in the reference's branch order. */
  val Malformed = "malformed"     // unparseable JSON (defensive; the reference would throw)
  val NotListened = "not_listened" // StartJob.java:55-57,66-67 (source-level db.table allowlist)
  val NotDelete = "not_delete"    // StartJob.java:123-125 (silent skip)
  val NoTable = "no_table"        // StartJob.java:129-132 (error log)
  val NoBefore = "no_before"      // StartJob.java:134-138 (error log)
  val NoId = "no_id"              // StartJob.java:140-144 (error log)
  val BadTs = "bad_ts"            // StartJob.java:147-151 (error log)
  val Kept = "kept"

  val reasons: Seq[String] = Seq(Malformed, NotListened, NotDelete, NoTable, NoBefore, NoId, BadTs)

  /** Largest ts_ms a Kept envelope may carry: 9999-12-31T23:59:59.999Z.
    * Two hazards force a bound (the reference would happily build
    * `new Timestamp(Long.MAX_VALUE)`, year ~292278994):
    *  - Spark's TimestampType is micros-backed, so `timestamp_millis`
    *    THROWS past Long.MaxValue/1000 — one garbage envelope kills the
    *    streaming query;
    *  - even a representable near-max timestamp overflows the first
    *    downstream `window()`/interval addition (windowEnd = start +
    *    1 day > Long.MaxValue µs → ANSI ArithmeticException), so the
    *    raw representability bound just moves the crash one operator
    *    later. Year-9999 caps with ~290 000 years of headroom; a CDC
    *    producer epoch past it is garbage, counted as [[BadTs]].
    */
  val MaxTsMs: Long = 253402300799999L

  private def op(value: Column) = get_json_object(value, "$.op")
  private def db(value: Column) = get_json_object(value, "$.source.db")
  private def table(value: Column) = get_json_object(value, "$.source.table")
  private def before(value: Column) = get_json_object(value, "$.before")
  private def id(value: Column) = get_json_object(value, "$.before.id")
  private def tsMs(value: Column) =
    // try_cast, not a regex guard: the execution path casts with
    // try_cast, and the two taxonomies must agree on ALL inputs (a
    // 19-digit in-range epoch or '+123' is Kept by both, not BadTs here)
    get_json_object(value, "$.ts_ms").try_cast("long")

  /** "This table is not on the task's allowlist": the envelope's
    * QUALIFIED `db.table` name is absent from the list. The reference
    * pushes `db.table` strings into the CDC connector so unlisted
    * tables never enter the pipeline (`StartJob.java:55-57` builds
    * `tableList` as `dbName + "." + table`, `:66-67` applies it); our
    * file-stream model filters right after parse instead — checked
    * BEFORE the envelope-shape branches, because in the reference an
    * unlisted table's event (of any op) is never emitted at all.
    * Matching is db-SCOPED like the reference's: a listed table name
    * under the wrong (or missing) database is `not_listened` — a null
    * db renders as `".table"`, which can never match a `db.table`
    * entry. A blank/missing TABLE can't be matched against the list at
    * all and falls through to the shape taxonomy (`no_table` etc.).
    */
  private def notListened(dbCol: Column, tableCol: Column, allowed: Seq[String]): Column =
    tableCol.isNotNull && trim(tableCol) =!= "" &&
      !concat(coalesce(dbCol, lit("")), lit("."), tableCol).isin(allowed: _*)

  /** Classification of one envelope: a drop reason, or [[Kept]].
    * Branches in the reference's order — a row with several defects is
    * counted under the FIRST failing check, like the reference's early
    * returns. This is the SPEC form (one full JSON parse per field);
    * the execution paths below extract every field in a single
    * `json_tuple` parse — DebeziumSpec pins both to the same taxonomy.
    *
    * @param allowedTables qualified `db.table` allowlist; when set, a
    *   named table absent from the list classifies as [[NotListened]]
    *   ahead of the shape branches.
    */
  def classify(value: Column, allowedTables: Option[Seq[String]] = None): Column = {
    val chain =
      when(op(value).isNull || op(value) =!= "d", NotDelete)
        .when(table(value).isNull || trim(table(value)) === "", NoTable)
        .when(before(value).isNull, NoBefore)
        .when(id(value).isNull, NoId)
        .when(tsMs(value).isNull || tsMs(value) <= 0 || tsMs(value) > MaxTsMs, BadTs)
        .otherwise(Kept)
    val listed = allowedTables.fold(chain)(allowed =>
      when(notListened(db(value), table(value), allowed), NotListened).otherwise(chain))
    when(get_json_object(value, "$").isNull, Malformed).otherwise(listed)
  }

  /** Hot-path field extraction: ONE `json_tuple` parse of the envelope
    * for the four top-level fields, plus two small parses of the
    * extracted `source`/`before` subtrees — instead of a full
    * envelope parse per field (9× on the old path). `try_cast` keeps a
    * non-numeric `ts_ms` a drop, not an ANSI runtime error.
    */
  private def extracted(envelopes: DataFrame): DataFrame =
    envelopes
      .select(col("value"),
        json_tuple(col("value"), "op", "ts_ms", "source", "before")
          .as(Seq("_op", "_ts_raw", "_src", "_before")))
      .withColumn("_db", get_json_object(col("_src"), "$.db"))
      .withColumn("_table", get_json_object(col("_src"), "$.table"))
      .withColumn("_id", get_json_object(col("_before"), "$.id"))
      .withColumn("_ts", expr("try_cast(_ts_raw AS BIGINT)"))

  /** [[classify]] over pre-extracted fields. The expensive
    * whole-envelope re-parse behind the malformed check only runs for
    * rows where every top-level field came back null (rare).
    */
  private def reasonFromExtracted(allowedTables: Option[Seq[String]]): Column = {
    val chain =
      when(col("_op").isNull || col("_op") =!= "d", NotDelete)
        .when(col("_table").isNull || trim(col("_table")) === "", NoTable)
        .when(col("_before").isNull, NoBefore)
        .when(col("_id").isNull, NoId)
        .when(col("_ts").isNull || col("_ts") <= 0 || col("_ts") > MaxTsMs, BadTs)
        .otherwise(Kept)
    val fieldChain = allowedTables.fold(chain)(allowed =>
      when(notListened(col("_db"), col("_table"), allowed), NotListened).otherwise(chain))
    when(coalesce(col("_op"), col("_ts_raw"), col("_src"), col("_before")).isNotNull, fieldChain)
      .otherwise(when(get_json_object(col("value"), "$").isNull, Malformed).otherwise(NotDelete))
  }

  /** Parse a DataFrame/stream of envelopes (`value: STRING`) into
    * [[ParsedChange]]-shaped rows, dropping invalid envelopes.
    *
    * @param observeName when set, attaches `observe(name, total,
    *   kept, + one counter per drop reason)` so batch listeners and
    *   streaming progress both expose the drop taxonomy.
    * @param allowedTables the task's QUALIFIED `db.table` allowlist
    *   (`StartJob.java:55-57,66-67` — the reference prefixes each
    *   listed table with the source's dbName); unlisted tables drop as
    *   [[NotListened]], counted like every other reason.
    */
  /** The shared classification front of [[parseChanges]] and
    * [[parseAnnotated]]: extracted fields + the `_reason` column +
    * (optionally) the observed drop-taxonomy counters. ONE
    * implementation so the kept-only and annotated pipelines can never
    * classify differently — a new drop reason or counter lands in both
    * by construction.
    */
  private def classifiedObserved(
      envelopes: DataFrame,
      observeName: Option[String],
      allowedTables: Option[Seq[String]]): DataFrame = {
    val classified = extracted(envelopes)
      .withColumn("_reason", reasonFromExtracted(allowedTables))
    observeName.fold(classified) { name =>
      val counters =
        count(when(col("_reason") === Kept, 1)).as("kept") +:
          reasons.map(r => count(when(col("_reason") === r, 1)).as(r))
      classified.observe(name, count(lit(1)).as("total"), counters: _*)
    }
  }

  def parseChanges(
      envelopes: DataFrame,
      instanceName: String,
      observeName: Option[String] = None,
      allowedTables: Option[Seq[String]] = None): DataFrame = {
    classifiedObserved(envelopes, observeName, allowedTables)
      .filter(col("_reason") === Kept)
      .select(
        lit(instanceName).as("instanceName"),
        col("_table").as("tableName"),
        col("_id").as("id"),
        timestamp_millis(col("_ts")).as("recordDelTime"),
        col("_before").as("dataJson"))
  }

  /** Batch-only helper: per-reason drop counts for a set of envelopes
    * (the assertable twin of the reference's error-log taxonomy).
    */
  def dropCounts(envelopes: DataFrame, allowedTables: Option[Seq[String]] = None): DataFrame =
    extracted(envelopes)
      .groupBy(reasonFromExtracted(allowedTables).as("reason"))
      .agg(count(lit(1)).as("n"))

  /** The dead-letter side of [[parseChanges]]: every REJECTED envelope
    * with its classified reason, a 16-byte md5 replay id, and the raw
    * claimed table — the quarantine store a production pipeline
    * persists next to the counted taxonomy ([[dropCounts]]), so a
    * parser fix can replay exactly what was dropped instead of
    * re-tailing the binlog. Same classification chain, same order.
    */
  def deadLetters(envelopes: DataFrame, allowedTables: Option[Seq[String]] = None): DataFrame =
    extracted(envelopes)
      .withColumn("reason", reasonFromExtracted(allowedTables))
      .filter(col("reason") =!= Kept)
      .select(col("reason"), md5(col("value")).as("env_md5"),
        coalesce(col("_table"), lit("")).as("tbl"))

  /** [[parseChanges]] WITHOUT the kept-filter: every envelope flows
    * through with its classified `reason`, the archive projection
    * (null `recordDelTime` on rejected rows — `timestamp_millis` must
    * never see a BadTs epoch), and the DLQ replay id. This is the dual
    * kept/dead delivery shape [[ChangeArchiveJob]] streams when a
    * dead-letter sink is configured: ONE classification pass feeds
    * both the archive and the quarantine, instead of re-reading and
    * re-parsing the sources per side. Same `observe` counters as
    * [[parseChanges]] (attached pre-split, so streaming progress still
    * carries the full drop taxonomy).
    */
  def parseAnnotated(
      envelopes: DataFrame,
      instanceName: String,
      observeName: Option[String] = None,
      allowedTables: Option[Seq[String]] = None): DataFrame = {
    classifiedObserved(envelopes, observeName, allowedTables).select(
      lit(instanceName).as("instanceName"),
      col("_reason").as("reason"),
      col("_table").as("tableName"),
      col("_id").as("id"),
      when(col("_reason") === Kept, timestamp_millis(col("_ts"))).as("recordDelTime"),
      col("_before").as("dataJson"),
      md5(col("value")).as("env_md5"),
      // the RAW envelope rides along so the quarantine can persist it —
      // a dead letter that stores only its hash cannot be replayed
      // after a parser fix ([[DeadLetterReplay]]); kept-path consumers
      // select explicit columns and never carry it past the split
      col("value"))
  }

  /** Per-(table, before-image key-set) SHAPE taxonomy of raw envelopes
    * — cdc09's monitor body, shared verbatim by the batch view and the
    * streamed [[SchemaDriftMonitor]]: map-side JSON key extraction
    * (sorted to a canonical signature; the null tombstone branches
    * explicitly — concat_ws would fold a NULL array to ''), then ONE
    * map-side-combining count at (table, key-set) grain. Output rows
    * are mergeable partials: summing `n` across any partition of the
    * stream (e.g. per micro-batch) reproduces the whole-stream
    * taxonomy exactly (q61's exact-partial discipline — what makes the
    * streamed monitor's per-batch store a valid cumulative audit).
    */
  def shapeTaxonomy(envelopes: DataFrame, canonical: String = "amount,id,k"): DataFrame =
    envelopes
      .select(
        get_json_object(col("value"), "$.source.table").as("table_name"),
        when(get_json_object(col("value"), "$.before").isNull, lit("(null)"))
          .otherwise(concat_ws(",", sort_array(
            json_object_keys(get_json_object(col("value"), "$.before")))))
          .as("key_set"))
      .groupBy(col("table_name"), col("key_set"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_canonical",
        when(col("key_set") === canonical, 1).otherwise(0))

  /** Enrichment (SURVEY.md §2.1 O7, done properly): broadcast-join the
    * parsed stream against the per-instance source config to add
    * `dbTbName` (= dbAlias + "_" + tableName, `AdbSink.java:88`) and
    * `fbNo` (`AdbSink.java:90`). `sources` must carry columns
    * `(instanceName, dbAlias, fbNo)`; unmatched instances are dropped
    * (the reference would NPE — config always covers its sources).
    */
  def enrich(parsed: DataFrame, sources: DataFrame): DataFrame =
    parsed
      .join(broadcast(sources.select(
        col("instanceName"), col("dbAlias"), col("fbNo"))), Seq("instanceName"))
      .select(
        col("instanceName"),
        col("tableName"),
        concat(col("dbAlias"), lit("_"), col("tableName")).as("dbTbName"),
        col("id"),
        col("recordDelTime"),
        col("fbNo"),
        col("dataJson"))
}

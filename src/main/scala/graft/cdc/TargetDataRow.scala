package graft.cdc

/** The archive row the pipeline delivers — the Spark-native
  * re-expression of the reference's one record type
  * (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/model/TargetDataRow.java:15-39`).
  *
  * Flat rather than nested: the reference's inner `DataRow` is a
  * serialization artifact of its JDBC/StreamLoad encoding, not
  * semantics. `recordDelTime` is rendered `yyyy-MM-dd HH:mm:ss` (UTC)
  * only at sink time (`TargetDataRow.java:30`); in-flight it stays a
  * proper timestamp so event-time operations remain possible.
  *
  * @param instanceName source MySQL instance the delete came from
  * @param tableName    source table (`source.table` in the envelope)
  * @param dbTbName     enrichment: `dbAlias + "_" + tableName`
  *                     (`AdbSink.java:88`)
  * @param id           primary key, stringified (`StartJob.java:160`)
  * @param recordDelTime delete time from envelope `ts_ms`
  * @param fbNo         business routing code from source config
  *                     (`AdbSink.java:90`)
  * @param dataJson     the FULL pre-delete row image as opaque JSON
  *                     (`StartJob.java:146` — schema-less by design)
  */
final case class TargetDataRow(
    instanceName: String,
    tableName: String,
    dbTbName: String,
    id: String,
    recordDelTime: java.sql.Timestamp,
    fbNo: String,
    dataJson: String)

/** Parser output before enrichment: what the envelope alone provides
  * (`StartJob.java:153-163` sets exactly these; `dbTbName`/`fbNo` are
  * added downstream from source config — a lookup the reference does
  * inside its sinks (`AdbSink.java:88-90`) and we do as a broadcast
  * join before the sink, per SURVEY.md §2.1 O7).
  */
final case class ParsedChange(
    instanceName: String,
    tableName: String,
    id: String,
    recordDelTime: java.sql.Timestamp,
    dataJson: String)

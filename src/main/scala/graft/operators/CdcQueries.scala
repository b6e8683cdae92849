package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Batch views of the reference's CDC-archival semantics (SURVEY.md
  * §2.1 O2–O7) expressed over the `events` fixture table: op-code
  * filtering, JSON payload passthrough, epoch→formatted timestamp,
  * enrichment, and multi-instance UNION ALL.
  *
  * The real Debezium-envelope parser (with drop-with-count semantics)
  * lives in [[graft.cdc.Debezium]] and is exercised by golden-fixture
  * tests + the streaming [[graft.cdc.ChangeArchiveJob]]; these queries
  * make the same row shapes oracle-checkable on driver fixtures.
  */
object CdcQueries {

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
  )
}

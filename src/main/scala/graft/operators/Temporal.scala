package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark has no single built-in for —
  * composed Spark-first from existing operators (SURVEY.md §2.1 "Spark
  * primitive" preference (a): compose before customizing).
  */
object Temporal {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q30_asof_join",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
             |SELECT p.event_id, p.user_id, v.ts AS asof_view_ts
             |FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin),
      "As-of join: for each purchase, the user's most recent view at-or-before it. Spark-first as ONE shuffle: union both sides, running max over a (user, time)-ordered window — no per-row range probe, no quadratic join; at 100 TB this is a single sort-shuffle on user_id. Oracle is DuckDB's native ASOF JOIN.") {
      (s, dir) =>
        val e = Tables.load(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          .withColumn("is_p", (col("event_type") === "purchase").cast("int"))
        // views sort before purchases at equal ts so v.ts <= p.ts includes ties
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("asof_view_ts", max(when(col("is_p") === 0, col("ts"))).over(w))
          .filter(col("is_p") === 1 && col("asof_view_ts").isNotNull)
          .select(col("event_id"), col("user_id"), col("asof_view_ts"))
    },

    GraftQuery(
      "q31_range_join",
      Some("""SELECT t.tier, COUNT(*) AS n,
             |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM events e
             |JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000000.0))
             |     t(tier, lo, hi)
             |  ON e.value >= t.lo AND e.value < t.hi
             |GROUP BY t.tier""".stripMargin),
      "Range (interval) join: events banded into value tiers via a non-equi predicate. The tier table is tiny and explicitly broadcast → BroadcastNestedLoopJoin where only the STREAMED side scales; never a shuffle of the fact side.") {
      (s, dir) =>
        import s.implicits._
        val tiers = Seq(("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000000.0))
          .toDF("tier", "lo", "hi")
        Tables.load(s, dir, "events")
          .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
    },
  )
}

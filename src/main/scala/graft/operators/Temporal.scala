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

    GraftQuery(
      "q45_scd2_intervals",
      Some("""WITH ordered AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |changes AS (
             |  SELECT user_id, event_type, ts AS valid_from, event_id
             |  FROM ordered WHERE prev IS NULL OR event_type <> prev)
             |SELECT user_id, event_type, valid_from,
             |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
             |       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL) AS is_current
             |FROM changes""".stripMargin),
      "SCD Type 2 dimension build from a change stream: per-user event_type transitions become validity intervals [valid_from, valid_to) with an is_current flag — the batch twin of what a CDC consumer materializes from O1's envelopes. Change detection (lag) and interval closing (lead) share the user_id hash partitioning, so the whole build is ONE shuffle; event_id tiebreaks make every interval deterministic.") {
      (s, dir) =>
        val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val changes = Tables.load(s, dir, "events")
          .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
          .filter(col("prev").isNull || col("event_type") =!= col("prev"))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("event_id"))
        val wLead = Window.partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
        changes
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
          .select(col("user_id"), col("event_type"), col("valid_from"),
            col("valid_to"), col("valid_to").isNull.as("is_current"))
    },

    GraftQuery(
      "q46_gap_fill",
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
             |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |  FROM events WHERE value > 300 GROUP BY 1, 2),
             |bounds AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1),
             |series AS (SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |           FROM bounds)
             |SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n,
             |       last_value(d.total IGNORE NULLS) OVER (
             |         PARTITION BY s.event_type ORDER BY s.day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
             |FROM series s LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day""".stripMargin),
      "Time-series resample + gap fill: sparse daily aggregates (value > 300 keeps real gaps at every SF) are densified to the full per-type day range via sequence+explode, missing counts zero-filled, missing totals forward-filled with last-non-null over the day order. The raw scan aggregates FIRST (one shuffle); the series/join/window all run on bucket-sized data (#types x #days), so densification cost is independent of fact-table size.") {
      (s, dir) =>
        val daily = Tables.load(s, dir, "events")
          .filter(col("value") > 300)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
        val series = daily.groupBy("event_type")
          .agg(min("day").as("lo"), max("day").as("hi"))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
        val wFill = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        series.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("total"), ignoreNulls = true).over(wFill).as("filled_total"))
    },

    GraftQuery(
      "q47_conversion_funnel",
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS first_view FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
             |      FROM events e JOIN v USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > v.first_view GROUP BY 1)
             |SELECT CAST(date_trunc('day', v.first_view) AS DATE) AS cohort_day,
             |       COUNT(*) AS n_users,
             |       COUNT(CASE WHEN p.first_purchase <= v.first_view + INTERVAL 24 HOUR THEN 1 END) AS n_converted,
             |       CAST(COUNT(CASE WHEN p.first_purchase <= v.first_view + INTERVAL 24 HOUR THEN 1 END) AS DOUBLE) / COUNT(*) AS conversion_rate
             |FROM v LEFT JOIN p USING (user_id)
             |GROUP BY 1""".stripMargin),
      "Conversion funnel: per first-view cohort day, how many users purchased within 24 h of their first view. ONE shuffle over the fact data: a whole-partition user_id window computes first_view, the purchase-after-view aggregation inherits that partitioning (grouping keys are a superset), and only the user-sized cohort rollup shuffles again — the oracle's self-join formulation is fused away. The rate is a single IEEE division of two exact counts, so it hash-matches cross-engine.") {
      (s, dir) =>
        val w = Window.partitionBy("user_id")
        val perUser = Tables.load(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("first_view",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .filter(col("first_view").isNotNull)
          .groupBy(col("user_id"), col("first_view"))
          .agg(min(when(col("event_type") === "purchase"
            && col("ts") > col("first_view"), col("ts"))).as("first_purchase"))
        val converted = col("first_purchase") <=
          col("first_view") + expr("INTERVAL 24 HOURS")
        perUser
          .groupBy(to_date(col("first_view")).as("cohort_day"))
          .agg(count(lit(1)).as("n_users"),
            count(when(converted, lit(1))).as("n_converted"))
          .withColumn("conversion_rate",
            col("n_converted").cast("double") / col("n_users"))
    },

    GraftQuery(
      "q51_rolling_distinct",
      Some("""WITH ad AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |days AS (SELECT DISTINCT day FROM ad)
             |SELECT d.day, COUNT(DISTINCT a.user_id) AS active_7d
             |FROM days d JOIN ad a ON a.day BETWEEN d.day - 6 AND d.day
             |GROUP BY 1""".stripMargin),
      "Rolling 7-day distinct users per day (the DAU/WAU retention shape) — computed EXACTLY without the oracle's range self-join, which expands the fact table 7x and re-deduplicates per window (and a COUNT(DISTINCT) over a RANGE frame can't combine map-side at all). Construction: a user is in the window ending day d iff their latest active day at-or-before d is within 6 days — so consecutive active days [a_i, a_{i+1}) yield DISJOINT contribution intervals [a_i, min(a_i+6, a_{i+1}-1)], and a plain per-day COUNT of exploded interval days equals the distinct-user count. One user-keyed set aggregation (map-side partial_collect_set — the shuffle carries per-task day sets, not events), map-side interval explode bounded by 7 rows per user-day, one day-keyed count, and a day-cardinality broadcast join restricting output to observed days. Every wide stage is user- or day-cardinality; at 100 TB the fact table crosses the wire once, pre-combined.") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val perUser = ev
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .groupBy("user_id")
          .agg(sort_array(collect_set(col("day"))).as("days"))
        // consecutive-active-day contribution intervals, exploded: each
        // (user, window-end day) appears exactly once by disjointness
        val contrib = perUser.select(
          explode(expr(
            """flatten(transform(days, (d, i) ->
              |  sequence(d, least(date_add(d, 6),
              |    if(i + 1 < size(days),
              |       date_add(element_at(days, i + 2), -1),
              |       date_add(d, 6))))))""".stripMargin)).as("day"))
        // report only days that actually occur (a pruned one-column
        // re-scan at day cardinality, broadcast back)
        val observed = ev.select(to_date(col("ts")).as("day")).distinct()
        contrib.groupBy("day").agg(count(lit(1)).as("active_7d"))
          .join(broadcast(observed), Seq("day"))
          .select(col("day"), col("active_7d"))
    },

    GraftQuery(
      "q52_sessionize",
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id,
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |f AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN prev IS NULL
             |              OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1
             |         ELSE 0 END AS new_s
             |  FROM o),
             |s AS (
             |  SELECT user_id, ts,
             |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM f)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |       COUNT(*) AS n_events,
             |       MIN(ts) AS session_start, MAX(ts) AS session_end,
             |       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
             |FROM s GROUP BY user_id, session_id""".stripMargin),
      "Gap-based sessionization (30-min inactivity boundary) — the canonical event-stream reshape clickstream/telemetry analytics is built on, and the batch twin of st09's session_window. ONE user_id sort-shuffle does everything: lag marks session starts, a running sum over the same window numbers them, and the per-(user, session) rollup inherits the partitioning (grouping keys are a superset of the partition key — no second fact exchange; the plan's only other work is map-side). The gap test and duration are exact integer microsecond arithmetic (epoch_us both engines), so the result is hash-identical cross-engine — no interval or float rounding anywhere.") {
      (s, dir) =>
        val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("ts"), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .as("duration_us"))
    },

    GraftQuery(
      "q56_scd2_lookup",
      Some("""WITH ordered AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |changes AS (
             |  SELECT user_id, event_type, ts AS valid_from, event_id
             |  FROM ordered WHERE prev IS NULL OR event_type <> prev),
             |iv AS (
             |  SELECT user_id, event_type AS state, valid_from,
             |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
             |  FROM changes),
             |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, p.ts, iv.state, iv.valid_from
             |FROM p JOIN iv ON iv.user_id = p.user_id
             | AND iv.valid_from <= p.ts
             | AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)""".stripMargin),
      "AS-OF dimension lookup against the SCD2 table — the OTHER half of the q45 story: building versioned intervals is only useful if facts can be joined to the version that was current AT FACT TIME (the point-in-time-correct enrichment every warehouse fact load runs; joining to is_current instead silently rewrites history). Each purchase matches EXACTLY ONE interval — the intervals partition the user's timeline and the purchase is itself an event on it (spec-pinned, along with genuinely-historical matches so the pin isn't satisfied by current-version lookups alone). Shape at 100 TB: an equi-join on user_id carrying the interval containment as a join-level range filter — both sides shuffle once on the production key, the per-user interval list is change-cardinality (tiny vs facts), and the interval build's window shares the same user_id partitioning an SMJ would need, so the fact side is the only extra exchange. At fixture scale Catalyst does one better and broadcasts the purchase side — ONE hash exchange in the whole plan (plan-audited). Raw values pass through (no arithmetic at all) — cross-engine equality is exact.") {
      (s, dir) =>
        val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ev = Tables.load(s, dir, "events")
        val changes = ev
          .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
          .filter(col("prev").isNull || col("event_type") =!= col("prev"))
          .select(col("user_id"), col("event_type").as("state"),
            col("ts").as("valid_from"), col("event_id"))
        val wLead = Window.partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
        val iv = changes
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
          .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("p_user_id"), col("ts"))
        p.join(iv,
            col("p_user_id") === col("user_id") &&
              col("valid_from") <= col("ts") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("state"), col("valid_from"))
    },

    GraftQuery(
      "q60_retention_cohorts",
      Some("""WITH wk AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week
             |            FROM events),
             |first AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1),
             |sizes AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM first GROUP BY 1),
             |act AS (SELECT f.cohort_week, (w.week - f.cohort_week) // 7 AS offset_weeks,
             |               COUNT(*) AS n_active
             |        FROM wk w JOIN first f USING (user_id) GROUP BY 1, 2)
             |SELECT a.cohort_week, CAST(a.offset_weeks AS INT) AS offset_weeks,
             |       a.n_active, s.n_cohort,
             |       CAST(a.n_active AS DOUBLE) / s.n_cohort AS retention
             |FROM act a JOIN sizes s USING (cohort_week)""".stripMargin),
      "Retention cohort matrix — THE product-analytics table (users grouped by first-active week; for each later week, the fraction still active), the temporal family's missing classic next to q47's funnel and q52's sessions. Fused to ONE user-grain shuffle over the fact data: groupBy(user) collects each user's distinct active weeks AND their minimum (the cohort) in a single map-side-combining aggregate — the per-user week set is bounded by the calendar (~52/yr), the textbook safe collect_set — then the (cohort, offset) matrix and the cohort sizes are both week-grain aggregations over its explode (cost independent of fact size; the oracle's two-scan self-join is fused away exactly like q47's). Monday-aligned weeks in both engines, offsets by exact integer day arithmetic div 7, retention one IEEE division of exact counts; offset 0 rows are the built-in sanity diagonal (retention = 1.0 by construction — spec-pinned, a cheap full-pipeline invariant).") {
      (s, dir) =>
        val wk = Tables.load(s, dir, "events")
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("week"))
        // pinned: BOTH downstream aggregates (matrix + cohort sizes)
        // consume this — without the pin each re-pays the fact shuffle
        val perUser = Materialize(wk.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"),
            collect_set(col("week")).as("weeks")))
        val act = perUser
          .select(col("cohort_week"), explode(col("weeks")).as("week"))
          .groupBy(col("cohort_week"),
            expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)").as("offset_weeks"))
          .agg(count(lit(1)).as("n_active"))
        val sizes = perUser.groupBy("cohort_week")
          .agg(count(lit(1)).as("n_cohort"))
        act.join(broadcast(sizes), "cohort_week")
          .select(col("cohort_week"), col("offset_weeks"),
            col("n_active"), col("n_cohort"),
            (col("n_active").cast("double") / col("n_cohort")).as("retention"))
    },

    GraftQuery(
      "q66_sequence_funnel",
      Some("""WITH v AS (SELECT user_id,
             |            MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
             |          FROM events GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(e.ts) AS t2
             |      FROM events e JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t1
             |        AND e.ts <= v.t1 + INTERVAL 6 HOUR GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(e.ts) AS t3
             |      FROM events e JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
             |        AND e.ts <= c.t2 + INTERVAL 6 HOUR GROUP BY 1)
             |SELECT CAST(date_trunc('day', v.t1) AS DATE) AS cohort_day,
             |       COUNT(*) AS n_started,
             |       COUNT(c.t2) AS n_clicked,
             |       COUNT(p.t3) AS n_completed
             |FROM v LEFT JOIN c ON c.user_id = v.user_id
             |       LEFT JOIN p ON p.user_id = v.user_id
             |WHERE v.t1 IS NOT NULL
             |GROUP BY 1""".stripMargin),
      "ORDERED event-sequence detection (CEP-lite): the strict 3-stage funnel view -> click -> purchase where each stage anchors on the EARLIEST qualifying event AFTER the previous anchor — the batch twin of what CEP engines call sequence pattern matching, and the shape q47 (2 stages, time-bounded) does not cover: here ORDER AND PROXIMITY are the predicate — each stage must land within 6 hours of the previous anchor (an unbounded chain is vacuously satisfiable on any long-lived user: probed on this fixture, every user with all three event types completes it; the 6 h window makes the detector genuinely selective at every fixture scale — most click-holders are excluded, completions survive — and the spec pins both sides). Execution is the q52 discipline taken one step further: three CHAINED window minimums over the SAME user_id partitioning — t1 = min(view), t2 = min(click with ts > t1), t3 = min(purchase with ts > t2); each depends on the previous, but identical partitioning means Catalyst plans ONE exchange feeding three Window operators (plan-audited: exactly one user_id shuffle sees fact rows), where the oracle spells three self-joins. The per-user collapse inherits the window partitioning, and the cohort rollup shuffles only user-sized rows. Longer patterns are the same chain, one window per stage — cost stays one fact shuffle regardless of pattern length, the property that makes sequence mining viable at 100 TB event volume. Exact counts; date_trunc day cohorts bit-identical cross-engine.") {
      (s, dir) =>
        val w = Window.partitionBy("user_id")
        Tables.load(s, dir, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") > col("t1")
              && col("ts") <= col("t1") + expr("INTERVAL 6 HOURS"),
              col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") > col("t2")
              && col("ts") <= col("t2") + expr("INTERVAL 6 HOURS"),
              col("ts"))).over(w))
          .filter(col("t1").isNotNull)
          .select("user_id", "t1", "t2", "t3").dropDuplicates("user_id")
          .groupBy(to_date(col("t1")).as("cohort_day"))
          .agg(count(lit(1)).as("n_started"),
            count(col("t2")).as("n_clicked"),
            count(col("t3")).as("n_completed"))
    },
  )
}

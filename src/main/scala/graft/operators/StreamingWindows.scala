package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Streaming-operator surface (SURVEY.md §2.2 rows "Streaming:
  * windows" / "Stateful ops"): tumbling, sliding, and session windows
  * plus key dedup — the operators a Structured Streaming job uses,
  * expressed over the `events` table.
  *
  * Spark's `window`/`session_window`/`dropDuplicates*` are the SAME
  * expressions in batch and streaming — these inventory entries run the
  * batch plan (so DuckDB can oracle-check the semantics value-for-value)
  * and `StreamingEquivalenceSpec` runs the identical transformations
  * through a real `readStream` → memory sink and asserts the results
  * coincide. The reference itself disables event time entirely
  * (`WatermarkStrategy.noWatermarks()`, StartJob.java:78); these
  * operators are the harness-mandated extension beyond it.
  */
object StreamingWindows {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "st01_tumbling_window",
      Some("""SELECT DATE_TRUNC('day', ts) AS window_start,
             |       DATE_TRUNC('day', ts) + INTERVAL 1 DAY AS window_end,
             |       event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2, 3""".stripMargin),
      "Tumbling 1-day event-time window (window() — the streaming operator, batch-planned): epoch-aligned UTC buckets with struct start/end.") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n"), col("total_value"))
    },

    GraftQuery(
      "st02_sliding_window",
      Some("""SELECT DATE_TRUNC('day', ts) - TO_DAYS(CAST(o.o AS INT)) AS window_start,
             |       DATE_TRUNC('day', ts) - TO_DAYS(CAST(o.o AS INT)) + INTERVAL 2 DAY AS window_end,
             |       COUNT(*) AS n
             |FROM events, (SELECT UNNEST([0, 1]) AS o) o
             |GROUP BY 1, 2""".stripMargin),
      "Sliding window (2-day size, 1-day slide): every event lands in two overlapping windows.") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "2 days", "1 day"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"), col("n"))
    },

    GraftQuery(
      "st03_session_window",
      Some("""WITH o AS (SELECT user_id, ts,
             |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |       FROM events),
             |s AS (SELECT user_id, ts,
             |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |      FROM o)
             |SELECT user_id, MIN(ts) AS session_start,
             |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             |       COUNT(*) AS n_events
             |FROM s GROUP BY user_id, sid""".stripMargin),
      "Session window (30-min gap) per user (session_window() — the streaming stateful operator, batch-planned); oracle is the classic gaps-and-islands rewrite.") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"))
    },

    GraftQuery(
      "st04_key_dedup",
      Some("SELECT DISTINCT user_id, event_type FROM events"),
      "Key dedup — the batch twin of dropDuplicatesWithinWatermark (the streaming run in StreamingEquivalenceSpec produces this same set).") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select("user_id", "event_type").distinct()
    },

    GraftQuery(
      "st05_stream_stream_join",
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
             |FROM events v JOIN events p
             |  ON v.user_id = p.user_id
             | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
             |WHERE v.event_type = 'view' AND p.event_type = 'purchase'""".stripMargin),
      "Stream-stream interval join (attribution): each purchase joins the same user's views from the preceding hour — equi-join on user_id with an event-time range bound, the shape Structured Streaming state-cleans under watermarks (the streaming run with watermarks is in StreamingEquivalenceSpec). gap in microseconds keeps both engines on exact integers.") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
        v.join(p, Seq("user_id"))
          .filter(col("p_ts") >= col("v_ts") &&
            col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    },

    GraftQuery(
      "st06_sampled_window",
      Some("""SELECT DATE_TRUNC('day', ts) AS window_start, event_type, COUNT(*) AS n
             |FROM events
             |WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20
             |GROUP BY 1, 2""".stripMargin),
      "Deterministic 20% sample composed with a tumbling daily window: the md5-bucket filter is stateless, so the SAME events are selected in batch and streaming, across restarts and repartitionings — the reproducibility a continuous pipeline cannot get from rand()/sample() (per-partition RNG seeds reshuffle selections on every re-plan). Map-side filter, then the one windowed-agg shuffle; the streaming run is in StreamingEquivalenceSpec.") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .filter(expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 20"))
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    },

    GraftQuery(
      "st07_stream_static_enrich",
      Some("""SELECT n.n_name AS nation, e.event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
             |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
             |GROUP BY 1, 2""".stripMargin),
      "Stream-static join: the unbounded event stream enriched against a small static dimension — the third streaming join type after stream-stream (st05) and the cdc enrichment (cdc03). The dim side is explicitly broadcast: in streaming this is the ONLY join shape that adds no state store at all (the static side re-broadcasts per micro-batch; no watermark needed) — at 100 TB/day of events the enrichment stays map-side. The streaming run is in StreamingEquivalenceSpec.") {
      (s, dir) =>
        val dim = Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("nation"))
        Tables.load(s, dir, "events")
          .join(broadcast(dim), pmod(col("user_id"), lit(25)) === col("n_nationkey"))
          .groupBy(col("nation"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
    },

    GraftQuery(
      "st08_outer_interval_join",
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
             |FROM events v LEFT JOIN events p
             |  ON v.user_id = p.user_id AND p.event_type = 'purchase'
             | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
             |WHERE v.event_type = 'view'""".stripMargin),
      "Stream-stream LEFT OUTER interval join (unattributed views KEPT with null purchase): the stateful semantics st05's inner join doesn't have — in streaming, an unmatched view can only be emitted once the watermark proves no in-window purchase can still arrive, so null rows are watermark-gated; the batch twin is the ground truth the stream converges to (the watermark-closure equivalence is pinned in StreamingEquivalenceSpec). Same state-eviction bound as st05: the interval condition lets the store drop views older than watermark + 1h.") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        v.join(p,
            col("user_id") === col("p_user_id") &&
              col("p_ts") >= col("v_ts") &&
              col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
            "left")
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    },

    GraftQuery(
      "st09_session_funnel",
      Some("""WITH f AS (SELECT user_id, ts, event_type FROM events
             |           WHERE event_type IN ('view', 'purchase')),
             |o AS (SELECT user_id, ts, event_type,
             |        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                  >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |      FROM f),
             |s AS (SELECT user_id, ts, event_type,
             |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |      FROM o)
             |SELECT user_id, MIN(ts) AS session_start,
             |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             |       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
             |       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
             |       COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN ts END) >
             |                MIN(CASE WHEN event_type = 'view' THEN ts END), FALSE) AS converted
             |FROM s GROUP BY user_id, sid""".stripMargin),
      "Sessionized conversion funnel — the stateful-analytics family (q45/q47) run as a STREAMING operator: per (user, 30-min session), view/purchase counts and whether a purchase followed the first view inside the session. The funnel predicate is spelled in order-insensitive aggregates only (EXISTS purchase after first view ⇔ MAX(purchase ts) > MIN(view ts)), and session-window merging is itself associative — so micro-batch boundaries and arrival order provably cannot change the answer, which is exactly what makes the streaming run equal the batch twin bit-for-bit (StreamingEquivalenceSpec). One stateful shuffle at any scale: the stateless type filter prunes map-side, then the session_window agg; no per-user event buffering, no window-function sort over raw events (the oracle's gaps-and-islands rewrite is the shape we avoid).") {
      (s, dir) =>
        Tables.load(s, dir, "events")
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
            col("n_views"), col("n_purchases"), col("converted"))
    },

    GraftQuery(
      "st10_semi_interval_join",
      Some("""SELECT p.user_id, p.event_id AS purchase_id, p.ts
             |FROM events p
             |WHERE p.event_type = 'purchase' AND EXISTS (
             |  SELECT 1 FROM events v
             |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
             |    AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR)""".stripMargin),
      "Stream-stream LEFT SEMI interval join — attribution as a FILTER, not a fan-out: purchases that had at least one view from the same user in the preceding hour, each emitted exactly once however many views matched (st05's inner join multiplies a purchase by its matching views; when the downstream consumer only needs 'qualified' events, that multiplication is pure shuffle amplification — a hot user with 1000 views makes the semi join 1000x cheaper on the wire). In streaming, semi is also the cheapest stateful join: the left row needs only a matched bit, and the same interval bound lets the state store evict views older than watermark + 1h (real watermarked run in StreamingEquivalenceSpec). Batch twin plans a LeftSemi hash join on user_id; the oracle states it as EXISTS — the decorrelation Catalyst and DuckDB both perform.") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
        p.join(v,
            col("user_id") === col("v_user_id") &&
              col("ts") >= col("v_ts") &&
              col("ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
            "leftsemi")
          .select(col("user_id"), col("purchase_id"), col("ts"))
    },

    GraftQuery(
      "st11_stream_static_anti",
      Some("""WITH cnt AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
             |thr AS (SELECT PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY c) AS t FROM cnt),
             |block AS (SELECT user_id FROM cnt, thr WHERE c >= t)
             |SELECT e.event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
             |FROM events e
             |WHERE e.user_id NOT IN (SELECT user_id FROM block)
             |GROUP BY 1""".stripMargin),
      "Stream-static LEFT ANTI join — the ADMISSION filter that completes the streaming join family (inner st05/st07, left outer st08, semi st10): the event stream is filtered against a static suppression list (users at or above the 99th-percentile activity (>= so the list binds even when p99 equals the max, as at the smallest fixture) — the bot/abuse list a pipeline precomputes and pins) and only admitted events aggregate downstream. Like st07, the static side re-broadcasts per micro-batch and the anti join adds NO state store and needs no watermark — stateless row-at-a-time suppression, which is exactly why blocklists are the production shape for spam/bot/PII suppression at 100 TB/day: admission cost is map-side regardless of stream volume. The blocklist derivation (count → exact integer percentile threshold → ids) runs ONCE batch-side at user cardinality; the p99 threshold is an exact integer compare, deterministic at every fixture scale. Streaming run in StreamingEquivalenceSpec; the batch twin plans a BroadcastHashJoin LeftAnti (plan-audited).") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val cnt = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        val thr = cnt.agg(
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)").as("t"))
        val block = cnt.crossJoin(broadcast(thr))
          .filter(col("c") >= col("t")).select("user_id")
        ev.join(broadcast(block), Seq("user_id"), "left_anti")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
    },

    GraftQuery(
      "st12_full_outer_interval_join",
      Some("""SELECT COALESCE(v.user_id, p.user_id) AS user_id,
             |       v.event_id AS view_id, p.event_id AS purchase_id,
             |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON v.user_id = p.user_id
             | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR""".stripMargin),
      "Stream-stream FULL OUTER interval join — the last cell of the streaming join matrix (inner st05, left outer st08, left semi st10, stream-static anti st11): unattributed views AND orphaned purchases both survive with nulls, the shape an attribution pipeline needs when BOTH unmatched sides are signals (views that never converted + purchases with no preceding view = the two failure modes of a funnel). In streaming, null emission on each side is gated by ITS OWN watermark proof — a view's null waits until no in-window purchase can arrive, a purchase's null until no in-window view can — so the batch twin is the ground truth the stream converges to on the watermark-closed regions (both pinned in StreamingEquivalenceSpec, along with full matched-set equality). Same state-eviction bound as st05/st08: the interval condition lets each side's store drop rows older than watermark + 1h. Gap in exact integer microseconds.") {
      (s, dir) =>
        val ev = Tables.load(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user_id"), col("ts").as("p_ts"))
        v.join(p,
            col("user_id") === col("p_user_id") &&
              col("p_ts") >= col("v_ts") &&
              col("p_ts") < col("v_ts") + expr("INTERVAL 1 HOUR"),
            "full_outer")
          .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
            col("view_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    },

    GraftQuery(
      "st13_windowed_distinct",
      Some("""SELECT DATE_TRUNC('day', ts) AS window_start,
             |       DATE_TRUNC('day', ts) + INTERVAL 1 DAY AS window_end,
             |       COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
             |FROM events GROUP BY 1, 2""".stripMargin),
      "Per-window EXACT distinct users — the daily-active-users query, and in streaming form the canonical CHAINED-STATEFUL-OPERATOR pipeline (Spark 3.4+ multiple stateful operators): a streaming engine cannot hold a distinct set per window as one opaque aggregate and stay incremental, so the shape is two cascaded stateful aggs — (window, user) dedup first (state = one row per active user per window, the watermark evicting closed windows), then a window-grain count over THAT (state = one row per open window). StreamingEquivalenceSpec runs exactly this chain through readStream in APPEND mode (window_time() re-windowing between the stages, a sentinel row to close the watermark) and pins it equal to this batch twin, which Catalyst plans as the ordinary two-level distinct aggregate. At 100 TB the first stage is the whole cost — one (window, user)-grain map-side-combining shuffle — and it is exactly q51/sk06's trade: the EXACT pass a dashboard runs per day, with the HLL sketch store (sk04/sk06) as the approximate always-on companion. Counts exact int64 in both engines.") {
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 day"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("n_users"), col("n_events"))
    },

    GraftQuery(
      "st14_sequence_match",
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
             |SELECT v.user_id, v.t1, c.t2, p.t3
             |FROM v JOIN c ON c.user_id = v.user_id
             |       JOIN p ON p.user_id = v.user_id""".stripMargin),
      "Streamed SEQUENCE detection — q66's strict 6 h view -> click -> purchase chain as the match-emission view (completed chains only, with their three anchor timestamps): the batch twin of a CEP state machine, and the streaming family's first stateful PATTERN operator (st01-st13 cover windows/dedup/joins/chained aggs; none holds a per-key automaton). The streaming side ([[SequenceMatch]]) runs the identical semantics through flatMapGroupsWithState: per-user state = three optional anchors + a done bit (O(1) per user regardless of event volume — the property that lets a billion-user stream keep its whole pattern state in the state store), events applied in event-time order, one append-mode emission per user at completion, late/replayed events no-ops after the done bit. StreamingEquivalenceSpec pins the real readStream state machine == this batch twin row-for-row at micro-second anchor precision, AND that the automaton's state survives a checkpoint restart mid-pattern (view+click before the stop, purchase after — the match must emit exactly once, in the second run). Batch execution is q66's one-exchange chained-window plan with an inner completed-only projection.") {
      (s, dir) =>
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
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
          .filter(col("t3").isNotNull)
          .select("user_id", "t1", "t2", "t3").dropDuplicates("user_id")
    },
  )
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch surfaces — the approximate structures a 100 TB
  * engine leans on when exact answers would shuffle the world
  * (harness extension family, SURVEY.md §2.3; sibling of q32/q40's
  * HLL++/KLL surfaces):
  *
  *  - sk01 runtime bloom filter: build a bloom over the selective
  *    dimension's join-key hashes, probe it at the fact scan BEFORE
  *    the join — catalyst's own InjectRuntimeFilter shape
  *    (`BloomFilterAggregate`/`BloomFilterMightContain`), spelled
  *    explicitly so the pre-join row kill is part of the query
  *    contract instead of an optimizer maybe. `SketchesSpec` also
  *    proves the automatic rule fires when enabled.
  *  - sk02 approx_top_k: DataSketches frequent-items heavy hitters.
  *  - sk03 count-min: point-frequency estimates consulted from a
  *    collected sketch — the "build distributed, consult anywhere"
  *    contract, checked in-plan against exact counts.
  *  - sk04 HLL roll-up: per-nation DataSketches HLL partials unioned
  *    to region with `hll_union_agg` — re-aggregation WITHOUT the raw
  *    data, the pattern that turns a 100 TB distinct-count rollup
  *    into a KB-sized merge.
  *
  * Oracle strategy: sketch internals aren't cross-engine-stable, so
  * every query emits EXACT values (or values the sketch computes
  * exactly at this cardinality) plus an in-plan accuracy assertion
  * folded to a constant-true column — the q32 pattern. Sketches are
  * deterministic for fixed data and seed, so the emitted booleans are
  * hash-stable.
  */
object Sketches {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Selective-side predicate shared by the spark text and the oracle. */
  private val HighValue = "o_totalprice > 400000"

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "sk01_bloom_semi_join",
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
              |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
              |FROM lineitem
              |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE $HighValue)
              |GROUP BY l_returnflag""".stripMargin),
      "Runtime bloom-filter semi join: a bloom sketch over the high-value orders' xxhash64(o_orderkey) rides a scalar subquery into the lineitem scan as a might_contain FILTER — at 100 TB the fact side drops non-qualifying rows at the scan, BEFORE shuffling toward the join (a bloom false positive costs one extra joined row; the exact semi join then removes it, so results are exact and the oracle is the plain semi join). 1 M-bit / ~120 KB sketch covers the ~30 k keys at sf0.1 with <1% FP; the broadcast of the sketch is one executor-wide KB-scale send versus the key set's full shuffle.") {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        // sk01-prefixed view names: registering plain "orders"/
        // "lineitem" would silently clobber any same-named temp views
        // in the shared session (the builder must stay side-effect-free
        // on names a caller could plausibly own)
        for (tb <- Seq("orders", "lineitem"))
          t(s, dir, tb).createOrReplaceTempView(s"sk01_$tb")
        s.sql(
          s"""SELECT l_returnflag, COUNT(*) AS n,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM sk01_lineitem
             |WHERE graft_might_contain(
             |        (SELECT graft_bloom_agg(xxhash64(o_orderkey), 50000L, 1000000L)
             |         FROM sk01_orders WHERE $HighValue),
             |        xxhash64(l_orderkey))
             |  AND l_orderkey IN (SELECT o_orderkey FROM sk01_orders WHERE $HighValue)
             |GROUP BY l_returnflag""".stripMargin)
    },

    GraftQuery(
      "sk02_heavy_hitters_topk",
      Some("""SELECT event_type, COUNT(*) AS n
             |FROM events GROUP BY event_type
             |ORDER BY n DESC, event_type LIMIT 3""".stripMargin),
      "Heavy hitters via approx_top_k (DataSketches frequent-items): one mergeable sketch per partition, combined map-side — the 100 TB replacement for a full groupBy+sort when only the head matters. maxItemsTracked (100) exceeds the key cardinality, so the sketch is in its exact regime and the oracle is the exact top-3 (tie-free at both verify and bench scale — rank-3/rank-4 boundary checked: 2006 vs 1982 at sf0.01, 19941 vs 19863 at sf0.1).") {
      (s, dir) =>
        t(s, dir, "events")
          .agg(expr("approx_top_k(event_type, 3, 100)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("event_type"), col("e.count").as("n"))
    },

    GraftQuery(
      "sk03_cms_frequency",
      Some("""SELECT o_orderpriority, COUNT(*) AS n, TRUE AS cms_within_eps
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      "Count-min point-frequency: the sketch is built in ONE distributed pass (mergeable per-partition partials), collected at KB scale, and consulted as a plan literal — the build-once/consult-anywhere contract a 100 TB pipeline uses to price keys without re-scanning. The in-plan boolean asserts the CMS guarantee (estimate >= exact, overshoot <= eps*N) against the exact distributed counts; with 5 keys against a ~2.7 k-cell row the estimate is collision-free, so the boolean is deterministically TRUE and the oracle carries the exact counts.") {
      (s, dir) =>
        val orders = t(s, dir, "orders")
        // KB-scale driver materialization BY DESIGN (a sketch exists to
        // leave the cluster); the scan happens exactly once, distributed
        val bytes = orders
          .agg(expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)").as("s"))
          .head().getAs[Array[Byte]]("s")
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        val exact = orders.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        // consult the sketch for each key (metadata-cardinality: the
        // grouped key set, 5 rows) and fold the guarantee to a literal map
        val keys = exact.select("o_orderpriority").collect().map(_.getString(0))
        val est = typedLit(keys.map(k => k -> cms.estimateCount(k)).toMap)
        val total = cms.totalCount()
        exact.select(
          col("o_orderpriority"), col("n"),
          (element_at(est, col("o_orderpriority")) >= col("n") &&
            element_at(est, col("o_orderpriority")) <= col("n") + lit(math.ceil(0.001 * total).toLong))
            .as("cms_within_eps"))
    },

    GraftQuery(
      "sk04_hll_rollup",
      Some("""SELECT r_name, COUNT(DISTINCT c_custkey) AS exact_cnt,
             |       TRUE AS sketch_within_5pct
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin),
      "Sketch roll-up: per-nation DataSketches HLL partials (hll_sketch_agg) are unioned to region with hll_union_agg and estimated — distinct-count re-aggregation from KB-sized partials with NO second pass over the raw data, the layered-rollup pattern (store per-shard sketches, merge on demand) that makes 100 TB distinct dashboards incremental. In-plan check against the exact distinct per region (q32 pattern); at verify scale the sketch is coupon-exact, at bench scale within the 5% envelope.") {
      (s, dir) =>
        val byNation = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_nationkey", "n_regionkey")
          .agg(
            expr("hll_sketch_agg(c_custkey)").as("sk"),
            countDistinct(col("c_custkey")).as("exact_n"))
        byNation
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
            sum(col("exact_n")).as("exact_cnt"))
          .select(
            col("r_name"), col("exact_cnt"),
            (abs(col("est") - col("exact_cnt")) / col("exact_cnt") < 0.05)
              .as("sketch_within_5pct"))
    },

    GraftQuery(
      "sk05_hll_overlap",
      Some("""WITH seg AS (
             |  SELECT user_id,
             |         CASE WHEN event_type = 'purchase' AND value > 180 THEN 'a'
             |              WHEN event_type = 'error'
             |                   AND EXTRACT(HOUR FROM ts) < 6 THEN 'b' END AS tag
             |  FROM events
             |  WHERE (event_type = 'purchase' AND value > 180)
             |     OR (event_type = 'error' AND EXTRACT(HOUR FROM ts) < 6))
             |SELECT
             |  (SELECT COUNT(DISTINCT user_id) FROM seg WHERE tag = 'a') AS exact_a,
             |  (SELECT COUNT(DISTINCT user_id) FROM seg WHERE tag = 'b') AS exact_b,
             |  (SELECT COUNT(*) FROM (SELECT user_id FROM seg GROUP BY user_id
             |                         HAVING COUNT(DISTINCT tag) = 2)) AS exact_both,
             |  TRUE AS sketch_within_bound""".stripMargin),
      "HLL set-INTERSECTION via inclusion-exclusion — sk04 rolls sketches UP (union re-aggregation); this is the other set algebra a sketch store is kept for: audience overlap |A∩B| = est(A) + est(B) - est(A∪B) from three KB-sized sketches, NO re-scan and no shuffle of the raw membership lists. Segments: users with a high-value purchase (A) vs users hitting pre-6am errors (B) — the conversion-vs-reliability overlap question. One pass tags segment rows, ONE (tag)-keyed aggregation builds both sketches + exact distincts, hll_union_agg over the 2-row frame gives est(A∪B); the exact intersection (one user_id-keyed agg counting tags) is the in-plan truth the inclusion-exclusion estimate is asserted against (coupon-exact at both fixture scales, so the bound is deterministically TRUE and the oracle carries exact values). At 100 TB the sketches come from the store at KB cost while the exact branch — here the audit — is the thing you no longer run.") {
      (s, dir) =>
        val seg = t(s, dir, "events")
          .select(col("user_id"), col("value"), col("event_type"),
            hour(col("ts")).as("hh"))
          .withColumn("tag",
            when(col("event_type") === "purchase" && col("value") > 180, "a")
              .when(col("event_type") === "error" && col("hh") < 6, "b"))
          .filter(col("tag").isNotNull)
        val perTag = seg.groupBy("tag").agg(
          expr("hll_sketch_agg(user_id)").as("sk"),
          countDistinct(col("user_id")).as("exact_n"))
        val ests = perTag.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_union"),
          max(when(col("tag") === "a",
            expr("hll_sketch_estimate(sk)"))).as("est_a"),
          max(when(col("tag") === "b",
            expr("hll_sketch_estimate(sk)"))).as("est_b"),
          max(when(col("tag") === "a", col("exact_n"))).as("exact_a"),
          max(when(col("tag") === "b", col("exact_n"))).as("exact_b"))
        val both = seg.groupBy("user_id")
          .agg(countDistinct(col("tag")).as("nt"))
          .filter(col("nt") === 2)
          .agg(count(lit(1)).as("exact_both"))
        // two 1-row stat frames meet in a broadcast (pr04 pattern)
        ests.crossJoin(broadcast(both))
          .select(
            col("exact_a"), col("exact_b"), col("exact_both"),
            (abs(col("est_a") + col("est_b") - col("est_union")
              - col("exact_both"))
              <= greatest(lit(5.0), lit(0.05) * col("exact_both")))
              .as("sketch_within_bound"))
    },

    GraftQuery(
      "sk06_hll_window_rollup",
      Some(hllRollupDuck),
      "Rolling 7-day distinct users from DAILY HLL PARTIALS — the TEMPORAL rollup completing the sketch-store set (sk04 rolls up space/hierarchy, sk05 intersects, this rolls up time): one pass builds a KB-sized sketch per day, and any trailing window is then a day-cardinality union-merge of 7 partials — no re-scan of raw events, and (unlike q51's exact disjoint-interval construction, whose fact pass is specific to the chosen window length) the SAME partial store answers 7-day, 28-day or 90-day windows on demand. That is the operating mode of every 100 TB retention dashboard: persist daily partials, merge at query time, and run the exact pass only as an occasional audit — which is precisely what this query's exact branch is (q51's range-join truth, asserted in-plan against the estimate per day, 5% envelope; coupon-exact at verify scale so the boolean is deterministic). Oracle contract: exact_7d is the cross-engine value check; sketch_within_5pct is a SPARK IN-PLAN assertion mirrored as the literal TRUE in the DuckDB SQL (the sk01/pr03 pattern — DuckDB has no HLL twin, so Spark must COMPUTE true per day or the row hash goes red; SketchesSpec additionally pins the estimate day-for-day). The day-range merge join runs at day x 7 cardinality — microscopic at any data scale.") {
      (s, dir) =>
        val d = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
        rollingDistinct(d.distinct(),
          d.groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk")))
    },

    GraftQuery(
      "sk07_quantile_window_rollup",
      Some(quantileRollupDuck),
      "Rolling 7-day QUANTILES from daily mergeable partials — the temporal rollup for the sketch store's OTHER headline statistic (sk06 rolls up distinct counts; every latency/price dashboard also wants windowed p50/p90, and re-scanning a 100 TB fact table per window is the thing a partial store exists to avoid). The partial is an EXACT value-grain histogram per day — (day, value-in-cents, count), the bounded-domain practice (prices quantize to cents, latencies to ms buckets; when the domain is genuinely unbounded the mergeable KLL sketch q40 surfaces is the fallback, trading this op's exactness for fixed size) — built in ONE map-side-combining pass; any trailing window is then a day-cardinality merge (7 partials summed value-wise), and the quantile reads off the merged histogram by the INTEGER rule: p50 = min v with 2*running >= total, p90 = min v with 10*running >= 9*total — percentile_disc semantics spelled as exact integer comparisons, so there is NO percentile function and NO interpolation to diverge cross-engine (the tx23 threshold lesson applied to quantiles). Scale shape: the fact table is scanned once for the daily partials; the rolling merge joins a day-list broadcast to the day-x-values store (microscopic at any fact scale); the running sum windows partition BY DAY. Same-store-many-windows is the sk06 contract: 7/28/90-day windows all read the same daily partials. SketchesSpec replays the windowed medians from raw collected events and pins that windows genuinely span multiple days.") {
      (s, dir) =>
        rollingQuantiles(Materialize(StreamedSketch.partials(t(s, dir, "events"))))
    },

    GraftQuery(
      "sk08_topk_window_rollup",
      Some(topkRollupDuck),
      "Rolling 7-day TOP-K from daily mergeable frequent-items partials — the sketch store's THIRD headline statistic rolled up in time (sk06: windowed distinct counts from HLL partials; sk07: windowed quantiles from value histograms; every ops dashboard also wants 'top event types this week' without re-scanning the fact table per window): daily partial = ONE DataSketches frequent-items sketch per day via approx_top_k_accumulate (KB-scale, built in one map-side-combining pass), any trailing window = a day-cardinality approx_top_k_combine of 7 partials — the same-store-many-windows contract, now for the heavy-hitter statistic. TIE-SAFETY is the design point (the tx23/sk07 cross-engine lesson applied to top-k): the sketch's own estimate order is implementation-defined under count ties, so the plan estimates ALL tracked items (maxItemsTracked 100 exceeds the event-type cardinality — the sketch is in its EXACT regime, sk02's argument, which is what makes the full value oracle possible) and picks top-3 by the deterministic (count DESC, event_type) rule in a day-partitioned window; the merged-window day list is the broadcast side (the sk07 ADVICE discipline). At 100 TB the daily sketch store stays KB x days while the fact table never re-scans per window; outside the exact regime the counts become DataSketches error-bounded estimates and the oracle would relax to the in-plan-envelope pattern (q32/sk04) — documented, not hidden. SketchesSpec replays windowed top-3 from raw collected events and pins the exact regime plus genuinely multi-day windows.") {
      (s, dir) =>
        val ev = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("event_type"))
        rollingTopk(Materialize(ev.groupBy("day")
          .agg(expr("approx_top_k_accumulate(event_type, 100)").as("st"))))
    },

    GraftQuery(
      "sk09_sketch_store_serving",
      Some(quantileRollupDuck),
      "ROLLING QUANTILES SERVED OFF THE PERSISTED PARTIAL STORE — the claim sk06/sk07/sk08 argue from ('persist daily partials, the same store answers every window, the fact table never re-scans') finally exercised as a store: the partial table bootstraps from the first 20 days of events and two later day-range drops ([21,25], [26,30]) arrive through StreamedSketch's batch protocol — per batch, a day-grain admission anti-join against the store's one-column day projection (a re-delivered day's file adds NOTHING: the partial is computed from the delivered day exactly once, the compute-once contract of a partition-per-day telemetry lake), then ONE batch-sized map-side-combining aggregate to (day, value_cents, count), overwritten into the batch's deterministic partition (StreamedDedup's replay-idempotent discipline; StreamedSketchSpec pins accreted == inline partials bit-identically, streamed-across-restart == sequential replay over a real readStream kill/resume, re-delivery + replay no-ops, and post-compaction serving identity under the write-then-prune + crashed-batch contract every other store carries). The serve is sk07's factored rollingQuantiles over the STORE READ — one definition, so inline-sk07 and store-sk09 cannot drift, and the oracle is sk07's SQL verbatim: identical output proves the store path end to end, while the PLAN DELTA is the point — SketchesSpec pins ZERO events scans in sk09's serve (the store read replaces the fact scan; sk07 pays it inline). At 100 TB this is the difference between a dashboard query that scans the day's partial rows (days x distinct-cents, KB-scale) and one that re-scans the fact table per window; accretion cost is batch-sized, and the store takes the same compaction treatment as fingerprints/manifests/snapshots/index.") {
      (s, dir) =>
        val store = sketchPartialStore(s, dir)
        rollingQuantiles(StreamedSketch.readStore(s, store))
    },

    GraftQuery(
      "sk10_hll_store_serving",
      Some(hllRollupDuck),
      "ROLLING DISTINCT USERS SERVED OFF THE PERSISTED HLL STORE — sk09's store-serving move applied to the CARDINALITY partial family (VERDICT r17 #5: StreamedSketch persisted only sk07's value histograms; sk06's HLL and sk08's frequent-items partials were still built inline per query, the same 'persist daily partials' claim unexercised): the store now accretes `hll_sketch_agg(user_id)` bytes per day under the SAME day-grain batch protocol (seed days [1,20], two drops, replay/re-delivery idempotent, compacted with the write-then-prune contract — StreamedSketchSpec), and this serve merges 7-day windows with `hll_union_agg` over STORE-READ sketches — the fact table appears in NO branch of the plan. The audit branch (sk06's exact_7d, the cross-engine value) reads the store's `ad/` table — the daily-active-users postings every warehouse maintains anyway, itself an exact mergeable daily partial accreted per batch — so the WHOLE query is store-served: StreamedSketchSpec pins zero events scans (sk09's plan pin, extended). Output and oracle are sk06's VERBATIM (one definition through the factored rollingDistinct — inline-sk06 and store-sk10 cannot drift; identical output proves the accreted sketches carry the same register state as one-shot day sketches, which is HLL's order-independence made testable). At 100 TB: the HLL table is KB x days — the dashboard-serving artifact — while the ad postings table is day x users (the audit/exact tier a deployment keeps only while it wants exact numbers); accretion is batch-sized, and no window length ever re-touches raw events.") {
      (s, dir) =>
        val store = sketchPartialStore(s, dir)
        rollingDistinct(
          StreamedSketch.readAd(s, store),
          StreamedSketch.readHll(s, store))
    },

    GraftQuery(
      "sk12_total_store_serving",
      Some(totalRollupDuck),
      "ROLLING TOTALS SERVED OFF THE PARTIAL STORE — the claim sk07's partial carried from day one ('the mergeable statistic behind windowed quantiles AND windowed totals') finally exercised on its second half: the SAME (day, value_cents, count) histogram rows that serve sk09's quantiles serve event counts and revenue totals — n_events = SUM(n), total_cents = SUM(v x n) over the 7-day window's partial rows — with ZERO new store surface and zero events scans (the whole point of persisting a value-grain partial instead of a purpose-built total: one table, every downstream statistic). Exact integers end to end (counts and cents), so the oracle is a plain SQL rebuild from raw events — identical output proves the store's partials losslessly carry the totals tier. At 100 TB this is the difference between the finance dashboard re-scanning the fact table per window and reading days x distinct-cents rows; and because the store is the one sk09/sk10/sk11 already maintain, the marginal cost of the totals tier is zero accretion work.") {
      (s, dir) =>
        val store = sketchPartialStore(s, dir)
        rollingTotals(StreamedSketch.readStore(s, store))
    },

    GraftQuery(
      "sk13_restated_day_serving",
      Some(quantileRollupDuck),
      "SERVING ACROSS A DAY RESTATEMENT — the correction path the store's own re-delivery guard names (VERDICT r18 #4: the r18 guard throws loudly on a held day re-arriving with different content but offered no remedy, and production telemetry DOES re-state days — late backfill, an upstream fix, a reprocessed pipeline): the fixture's day 2024-01-05 first arrives TRUNCATED (only even user_ids — a half-delivered upstream file), the store seeds and accretes through the shipped batch protocol on that defective content, and the upstream fix then RETRACT-AND-REPLACES the day via restateDay — all four corrected partial tables land under the correcting batch's own partitions FIRST (invisible: a day serves from its admitting batch until a marker says otherwise), and the day-grain marker (day, replaced_by) lands LAST as the correction's commit point, so every crash window serves a consistent generation (old content before the marker, corrected after — never a mix; a re-run of an interrupted correction converges on the same deterministic paths). Readers resolve each day to its ONE live batch (marker wins, else the admitting batch named by the daily commit table), so the retracted generation is dead the moment the marker lands and physically reclaimed when compaction folds the live view and clears the consumed markers. THIS query serves sk09's factored rollingQuantiles off the RESTATED store, and the oracle is sk07's SQL over the TRUE events VERBATIM: identical output proves the correction is indistinguishable from never having been wrong — the whole point of restate-don't-patch (StreamedSketchSpec pins the full lifecycle: pre-fix divergence non-vacuous, restated == correctly-seeded across all four families, replayed correction converges, post-compaction identity + cleared markers). At 100 TB: a correction is day-sized (the batch bill), the marker is one row, readers pay a day-grain map join against the KB-scale daily table, and the fact table is never re-scanned.") {
      (s, dir) =>
        rollingQuantiles(StreamedSketch.readStore(s, restatedSketchStore(s, dir)))
    },

    GraftQuery(
      "sk11_topk_store_serving",
      Some(topkRollupDuck),
      "ROLLING TOP-K SERVED OFF THE PERSISTED FREQUENT-ITEMS STORE — the third and last partial family moved onto the store (VERDICT r17 #5, completing what sk09 started for quantiles and sk10 for cardinality): daily `approx_top_k_accumulate(event_type, 100)` states accrete per batch under StreamedSketch's day-grain protocol, and any trailing window is a day-cardinality `approx_top_k_combine` of STORE-READ states — sk08's serve through the factored rollingTopk (one definition; inline and store serving cannot drift), with the same tie-safe deterministic (count DESC, event_type) top-3 selection. Oracle is sk08's VERBATIM (the tracked budget exceeds the type cardinality, so the merged sketches are in their exact regime and the full value oracle holds — sk08's argument, now proven to survive the persist-merge round trip); StreamedSketchSpec pins zero events scans in the serve plus per-day estimate identity between accreted and one-shot states. At 100 TB this is the ops-dashboard contract: the store holds one KB-scale state per day, 'top event types this week' is a 7-row merge, and the fact table is touched exactly once per day at accretion — never per window, never per query.") {
      (s, dir) =>
        val store = sketchPartialStore(s, dir)
        rollingTopk(StreamedSketch.readTopk(s, store))
    })

  /** sk06's serve over explicit partial frames, factored (r18) so
    * sk10 runs the IDENTICAL plan off the persisted store: `ad` =
    * daily-active-users postings (day, user_id) — the exact branch;
    * `hllDaily` = (day, sk) daily HLL sketches — the estimate branch,
    * merged per trailing window with hll_union_agg. One definition:
    * inline and store serving cannot drift.
    */
  private def rollingDistinct(ad: DataFrame, hllDaily: DataFrame): DataFrame = {
    val rolled = hllDaily.select(col("day").as("d"))
      .join(broadcast(hllDaily),
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d").as("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    // the day list rides an EXPLICIT broadcast (r19): it is ~30 rows at
    // any fact scale, and without the hint the store read's join
    // lineage inflates the size estimate past the auto-broadcast
    // threshold — Spark then plans a CartesianProduct for the range
    // predicate
    val exact = broadcast(ad.select(col("day").as("d")).distinct())
      .join(ad, col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_7d"))
    exact.join(broadcast(rolled), "day")
      .select(col("day"), col("exact_7d"),
        (abs(col("est") - col("exact_7d")) / col("exact_7d") < 0.05)
          .as("sketch_within_5pct"))
  }

  /** sk08's serve over an explicit daily frequent-items frame
    * `(day, st)`, factored (r18) so sk11 runs the IDENTICAL plan off
    * the persisted store: day-range combine, estimate-all under the
    * exact-regime budget, deterministic tie-safe top-3.
    */
  private def rollingTopk(daily: DataFrame): DataFrame = {
    val days = daily.select(col("day").as("d")).distinct()
    val merged = daily
      .join(broadcast(days),
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy("d").agg(expr("approx_top_k_combine(st, 100)").as("st"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("cnt").desc, col("event_type"))
    merged
      .select(col("d").as("day"),
        explode(expr("approx_top_k_estimate(st, 100)")).as("e"))
      .select(col("day"), col("e.item").as("event_type"),
        col("e.count").cast("bigint").as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .select(col("day"), col("rnk"), col("event_type"), col("cnt"))
  }

  /** sk12's serve: rolling 7-day totals over a `(day, v, n)` partial
    * frame — counts and value sums read off the histogram rows, the
    * quantile store's second statistic (exact integers).
    */
  private def rollingTotals(daily: DataFrame): DataFrame = {
    val days = daily.select(col("day").as("d")).distinct()
    daily
      .join(broadcast(days),
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d").as("day"))
      .agg(sum(col("n")).cast("bigint").as("n_events"),
        sum(col("v") * col("n")).cast("bigint").as("total_cents"))
  }

  /** sk12's oracle: the totals rebuilt from raw events — the store's
    * partials must carry them losslessly.
    */
  private lazy val totalRollupDuck: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS day,
      |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
      |days AS (SELECT DISTINCT day AS d FROM ev)
      |SELECT dy.d AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(e.v) AS BIGINT) AS total_cents
      |FROM ev e JOIN days dy ON e.day BETWEEN dy.d - 6 AND dy.d
      |GROUP BY 1""".stripMargin

  /** sk06's oracle — shared verbatim by sk10 (the store serve must be
    * indistinguishable from the inline computation). exact_7d is the
    * cross-engine value; the 5% boolean is Spark's in-plan assertion
    * mirrored as the literal TRUE (no HLL twin in DuckDB).
    */
  private lazy val hllRollupDuck: String =
    """WITH ad AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM ad)
      |SELECT d.day, COUNT(DISTINCT a.user_id) AS exact_7d,
      |       TRUE AS sketch_within_5pct
      |FROM days d JOIN ad a ON a.day BETWEEN d.day - 6 AND d.day
      |GROUP BY 1""".stripMargin

  /** sk08's oracle — shared verbatim by sk11 (exact-regime top-3 with
    * the deterministic tie rule).
    */
  private lazy val topkRollupDuck: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      |days AS (SELECT DISTINCT day AS d FROM ev),
      |wc AS (SELECT dy.d, e.event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      |       FROM ev e JOIN days dy ON e.day BETWEEN dy.d - 6 AND dy.d
      |       GROUP BY 1, 2),
      |r AS (SELECT d, event_type, cnt,
      |             ROW_NUMBER() OVER (PARTITION BY d ORDER BY cnt DESC, event_type) AS rnk
      |      FROM wc)
      |SELECT d AS day, CAST(rnk AS INT) AS rnk, event_type, cnt
      |FROM r WHERE rnk <= 3""".stripMargin

  /** sk09's persisted artifact: the daily partial store bootstrapped
    * from days [1,20] and accreted with two later day-range drops via
    * [[StreamedSketch.processBatch]] — built once per (application,
    * dir), served from parquet.
    */
  /** sk13's persisted artifact: the partial store built on a
    * TRUNCATED delivery of day 2024-01-05 (even user_ids only) through
    * the shipped seed/accrete protocol, then corrected via
    * [[StreamedSketch.restateDay]] with the day's full content under a
    * correction id above the stream's horizon. After the marker lands
    * the store serves exactly what a correctly-fed store would —
    * sk13's oracle is the plain rebuild from true events.
    */
  private def restatedSketchStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"skrst_$tag", dir)
    DiskMemo.ensure(s"skrst_$tag", out) {
      val ev = t(s, dir, "events")
        .select("ts", "value", "user_id", "event_type")
        .withColumn("day", to_date(col("ts")))
      val badDay = lit("2024-01-05").cast("date")
      val truncated = ev.filter(
        col("day") =!= badDay || col("user_id") % 2 === 0)
      StreamedSketch.seed(s,
        truncated.filter(col("day") <= lit("2024-01-20").cast("date")), out)
      StreamedSketch.processBatch(
        truncated.filter(col("day").between(
          lit("2024-01-21").cast("date"), lit("2024-01-25").cast("date"))),
        0L, out)
      StreamedSketch.processBatch(
        truncated.filter(col("day") >= lit("2024-01-26").cast("date")), 1L, out)
      StreamedSketch.restateDay(ev.filter(col("day") === badDay), 2L, out)
    }
  }

  private def sketchPartialStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"skstore_$tag", dir)
    DiskMemo.ensure(s"skstore_$tag", out) {
      val ev = t(s, dir, "events")
        .select("ts", "value", "user_id", "event_type")
        .withColumn("day", to_date(col("ts")))
      StreamedSketch.seed(s,
        ev.filter(col("day") <= lit("2024-01-20").cast("date")), out)
      StreamedSketch.processBatch(
        ev.filter(col("day").between(
          lit("2024-01-21").cast("date"), lit("2024-01-25").cast("date"))),
        0L, out)
      StreamedSketch.processBatch(
        ev.filter(col("day") >= lit("2024-01-26").cast("date")), 1L, out)
    }
  }

  /** sk07's windowed-quantile serve over a `(day, v, n)` daily partial
    * frame, factored — ONE definition for the inline query (sk07) and
    * the store serve (sk09): day-list broadcast x partial merge, then
    * the exact integer percentile rule (p50 = min v with 2*run >= tot,
    * p90 = min v with 10*run >= 9*tot).
    */
  private[operators] def rollingQuantiles(daily: DataFrame): DataFrame = {
    val days = daily.select(col("day").as("d")).distinct()
    // the DAY LIST is the broadcast side (as sk07's doc argues): it is
    // strictly smaller than the day-x-values store, and streaming
    // the store keeps the BNLJ's probe side the larger frame
    val merged = daily
      .join(broadcast(days),
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d"), col("v")).agg(sum(col("n")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("d").orderBy("v")
    val totals = merged.groupBy("d").agg(sum(col("n")).as("tot"))
    merged.withColumn("run", sum(col("n")).over(w))
      .join(broadcast(totals), "d")
      .groupBy(col("d").as("day"))
      .agg(max(col("tot")).cast("bigint").as("n_events"),
        min(when(col("run") * 2 >= col("tot"), col("v"))).as("p50_cents"),
        min(when(col("run") * 10 >= col("tot") * 9, col("v"))).as("p90_cents"))
  }

  /** sk07's oracle — shared verbatim by sk09 (the store serve must be
    * indistinguishable from the inline computation).
    */
  private lazy val quantileRollupDuck: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS day,
      |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
      |daily AS (SELECT day, v, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day AS d FROM daily),
      |merged AS (SELECT dy.d, p.v, CAST(SUM(p.n) AS BIGINT) AS n
      |           FROM days dy JOIN daily p ON p.day BETWEEN dy.d - 6 AND dy.d
      |           GROUP BY 1, 2),
      |ranked AS (SELECT d, v, n,
      |                  SUM(n) OVER (PARTITION BY d ORDER BY v) AS run,
      |                  SUM(n) OVER (PARTITION BY d) AS tot FROM merged)
      |SELECT d AS day, CAST(MAX(tot) AS BIGINT) AS n_events,
      |       MIN(CASE WHEN run * 2 >= tot THEN v END) AS p50_cents,
      |       MIN(CASE WHEN run * 10 >= tot * 9 THEN v END) AS p90_cents
      |FROM ranked GROUP BY 1""".stripMargin
}

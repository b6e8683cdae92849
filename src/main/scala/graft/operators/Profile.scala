package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Data-quality profiling over the documents corpus (harness extension,
  * SURVEY.md §2.3): the summary a pipeline operator runs before
  * admitting a new 100 TB crawl drop into training.
  *
  * Scale design: pr01 computes every per-column statistic in ONE scan —
  * the three exact count-distincts share a single Expand-based
  * aggregation (3x row expansion, one shuffle) instead of one scan per
  * column, and the wide->long pivot is a `stack` over the single
  * 1-row aggregate. pr02 bins with integer division (exact in any
  * engine) so the histogram is a plain hash aggregation — no
  * data-driven bounds pass, no second scan.
  */
object Profile {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "pr01_column_profile",
      Some("""SELECT 'lang' AS col, COUNT(*) AS n_rows,
             |       COUNT(*) - COUNT(lang) AS n_nulls,
             |       COUNT(DISTINCT lang) AS n_distinct,
             |       CAST(MIN(lang) AS VARCHAR) AS min_v, CAST(MAX(lang) AS VARCHAR) AS max_v
             |FROM documents
             |UNION ALL
             |SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
             |       CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
             |       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents""".stripMargin),
      "Per-column profile (rows, nulls, exact distinct, min/max) for three documents columns in a SINGLE scan: the count-distincts share one Expand aggregation, then stack() pivots the 1-row wide result to long form. The DuckDB oracle spells it as three scans — same values, which is the point: the one-pass plan is the scale win.") {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .agg(
            count(lit(1)).as("nr"),
            count(col("lang")).as("lang_nn"),
            countDistinct(col("lang")).as("lang_nd"),
            min(col("lang")).cast("string").as("lang_min"),
            max(col("lang")).cast("string").as("lang_max"),
            count(col("source")).as("src_nn"),
            countDistinct(col("source")).as("src_nd"),
            min(col("source")).cast("string").as("src_min"),
            max(col("source")).cast("string").as("src_max"),
            count(col("n_chars")).as("nc_nn"),
            countDistinct(col("n_chars")).as("nc_nd"),
            min(col("n_chars")).cast("string").as("nc_min"),
            max(col("n_chars")).cast("string").as("nc_max"))
          .selectExpr(
            """stack(3,
              |  'lang',    nr, nr - lang_nn, lang_nd, lang_min, lang_max,
              |  'source',  nr, nr - src_nn,  src_nd,  src_min,  src_max,
              |  'n_chars', nr, nr - nc_nn,   nc_nd,   nc_min,   nc_max)
              |AS (col, n_rows, n_nulls, n_distinct, min_v, max_v)""".stripMargin)
    },

    GraftQuery(
      "pr02_length_histogram",
      Some("""SELECT (n_chars // 50) * 50 AS bin_lo, (n_chars // 50) * 50 + 50 AS bin_hi,
             |       COUNT(*) AS n, COUNT(DISTINCT lang) AS n_langs
             |FROM documents GROUP BY n_chars // 50""".stripMargin),
      "Fixed-width length histogram (50-char bins) with per-bin language diversity. Integer-division binning is exact and engine-independent; the whole query is one hash aggregation with map-side partials — the shape that profiles a 100 TB corpus in a single pass.") {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(expr("n_chars div 50").as("bucket"))
          .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("n_langs"))
          .select((col("bucket") * 50).as("bin_lo"),
            (col("bucket") * 50 + 50).as("bin_hi"), col("n"), col("n_langs"))
    },

    GraftQuery(
      "pr03_approx_profile",
      Some("""SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
             |       COUNT(DISTINCT o_custkey) AS exact_ndv, TRUE AS approx_within_10pct
             |FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority', COUNT(*), COUNT(DISTINCT o_orderpriority), TRUE FROM orders
             |UNION ALL
             |SELECT 'o_orderdate', COUNT(*), COUNT(DISTINCT o_orderdate), TRUE FROM orders""".stripMargin),
      "Sketch-based column profiling — the shape a 100 TB profiler actually runs: per-column HLL++ (approx_count_distinct) is one mergeable sketch buffer per column in one scan, where pr01's exact multi-distinct pays an Expand that multiplies every row k-fold before its shuffle. Approx values are engine-specific, so the sk03 oracle pattern applies: this query carries the exact NDVs ALONGSIDE the sketches (the oracle needs them anyway) and folds the accuracy guarantee (|approx - exact| <= 10% of exact, vs the default 5% rsd) into a boolean the oracle states as TRUE — computed from data on the Spark side, constant only if the sketch actually lands inside its bound; the production variant drops the exact half and keeps the sketch scan.") {
      (s, dir) =>
        val within = (approxC: org.apache.spark.sql.Column, exactC: org.apache.spark.sql.Column) =>
          abs(approxC.cast("double") - exactC.cast("double")) <= exactC.cast("double") * 0.10
        Tables.load(s, dir, "orders")
          .agg(
            count(lit(1)).as("nr"),
            countDistinct(col("o_custkey")).as("ck_nd"),
            approx_count_distinct(col("o_custkey")).as("ck_ad"),
            countDistinct(col("o_orderpriority")).as("op_nd"),
            approx_count_distinct(col("o_orderpriority")).as("op_ad"),
            countDistinct(col("o_orderdate")).as("od_nd"),
            approx_count_distinct(col("o_orderdate")).as("od_ad"))
          .select(
            col("nr"), col("ck_nd"), col("op_nd"), col("od_nd"),
            within(col("ck_ad"), col("ck_nd")).as("ck_ok"),
            within(col("op_ad"), col("op_nd")).as("op_ok"),
            within(col("od_ad"), col("od_nd")).as("od_ok"))
          .selectExpr(
            """stack(3,
              |  'o_custkey',       nr, ck_nd, ck_ok,
              |  'o_orderpriority', nr, op_nd, op_ok,
              |  'o_orderdate',     nr, od_nd, od_ok)
              |AS (col, n_rows, exact_ndv, approx_within_10pct)""".stripMargin)
    },

    GraftQuery(
      "pr04_key_skew",
      Some {
        def block(tbl: String, c: String) =
          s"""SELECT '$tbl.$c' AS col_name,
             |       CAST(SUM(c) AS BIGINT) AS n_rows,
             |       CAST(COUNT(*) AS BIGINT) AS n_keys,
             |       CAST(MAX(c) AS BIGINT) AS max_cnt,
             |       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT) AS p50_cnt,
             |       CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT) AS p99_cnt,
             |       (SELECT CAST(SUM(c) AS BIGINT) FROM (
             |          SELECT c FROM (SELECT $c AS k, COUNT(*) AS c FROM $tbl GROUP BY 1) t2
             |          ORDER BY c DESC, k LIMIT 10) t3) AS top10_cnt
             |FROM (SELECT $c AS k, COUNT(*) AS c FROM $tbl GROUP BY 1) t""".stripMargin
        Seq(block("lineitem", "l_partkey"), block("lineitem", "l_suppkey"),
          block("orders", "o_custkey"), block("events", "user_id"))
          .mkString("", "\nUNION ALL\n", "")
      },
      "Join-key skew audit — the profiling pass that decides WHICH mitigation a 100 TB join needs before it runs (salting as in q29, AQE skew split, or a hub cap as in gr02/dd05): per candidate key column, the key-count distribution's shape — total rows, distinct keys, max/median/p99 per-key count, and the mass held by the top-10 keys (deterministic ties: count desc, key asc). Per column it is exactly one map-side-combining count shuffle; every later statistic runs over the key-count table (distinct-key-scale, not row-scale), with the top-10 mass a TakeOrdered over that same table and the two 1-row frames meeting in a broadcast. All outputs are exact integer counts — hash-identical cross-engine by construction.") {
      (s, dir) =>
        def block(tbl: String, c: String) = {
          val counts = Materialize(Tables.load(s, dir, tbl)
            .groupBy(col(c).as("k")).agg(count(lit(1)).as("c")))
          val stats = counts.agg(
            sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("c")).as("max_cnt"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)").cast("long").as("p50_cnt"),
            expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)").cast("long").as("p99_cnt"))
          val top10 = counts.orderBy(col("c").desc, col("k")).limit(10)
            .agg(sum(col("c")).as("top10_cnt"))
          stats.crossJoin(broadcast(top10))
            .select(lit(s"$tbl.$c").as("col_name"), col("n_rows"), col("n_keys"),
              col("max_cnt"), col("p50_cnt"), col("p99_cnt"), col("top10_cnt"))
        }
        block("lineitem", "l_partkey")
          .unionByName(block("lineitem", "l_suppkey"))
          .unionByName(block("orders", "o_custkey"))
          .unionByName(block("events", "user_id"))
    },

    GraftQuery(
      "pr05_referential_audit",
      Some("""SELECT 'lineitem->orders' AS rel, COUNT(*) AS n_child,
             |       CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_key,
             |       CAST(SUM(CASE WHEN l.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
             |       CAST(CAST(SUM(CASE WHEN l.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS orphan_frac
             |FROM lineitem l LEFT JOIN orders p ON l.l_orderkey = p.o_orderkey
             |UNION ALL
             |SELECT 'orders->customer', COUNT(*),
             |       CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL AND p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL AND p.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*)
             |FROM orders o LEFT JOIN customer p ON o.o_custkey = p.c_custkey
             |UNION ALL
             |SELECT 'customer->nation', COUNT(*),
             |       CAST(SUM(CASE WHEN c.c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(SUM(CASE WHEN c.c_nationkey IS NOT NULL AND p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(CAST(SUM(CASE WHEN c.c_nationkey IS NOT NULL AND p.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*)
             |FROM customer c LEFT JOIN nation p ON c.c_nationkey = p.n_nationkey
             |UNION ALL
             |SELECT 'lineitem->supplier', COUNT(*),
             |       CAST(SUM(CASE WHEN l.l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(SUM(CASE WHEN l.l_suppkey IS NOT NULL AND p.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(CAST(SUM(CASE WHEN l.l_suppkey IS NOT NULL AND p.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*)
             |FROM lineitem l LEFT JOIN supplier p ON l.l_suppkey = p.s_suppkey""".stripMargin),
      "Referential-integrity audit across the star schema — the admission gate that runs BEFORE any of the q03-q07 joins is trusted at 100 TB: per FK relationship, child-row count, NULL-key count, and orphan count (non-null key with no parent), each with its fraction. A LEFT join to the parent's unique key is the exact probe (no fan-out, every child row classified once) and each relationship is the join you would ship anyway: dimension parents (nation, supplier, customer) broadcast; the one fact-to-fact probe (lineitem->orders) shuffles on the join key it would shuffle on in production, with the classification counts folded into the join's own map-side-combining aggregation — the audit costs one pass per relationship and nothing more. A non-zero n_orphan row is the signal to quarantine a crawl drop before it poisons every downstream join; fractions are single IEEE divisions of exact integer counts — bit-identical cross-engine.") {
      (s, dir) =>
        def probe(rel: String, child: String, ck: String,
            parent: String, pk: String, bcast: Boolean) = {
          val c = Tables.load(s, dir, child)
          val p0 = Tables.load(s, dir, parent).select(col(pk))
          val p = if (bcast) broadcast(p0) else p0
          c.join(p, col(ck) === col(pk), "left")
            .agg(
              count(lit(1)).as("n_child"),
              sum(when(col(ck).isNull, 1).otherwise(0)).as("n_null_key"),
              sum(when(col(ck).isNotNull && col(pk).isNull, 1).otherwise(0)).as("n_orphan"))
            .select(lit(rel).as("rel"), col("n_child"), col("n_null_key"), col("n_orphan"),
              (col("n_orphan").cast("double") / col("n_child")).as("orphan_frac"))
        }
        probe("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", bcast = false)
          .unionByName(probe("orders->customer", "orders", "o_custkey", "customer", "c_custkey", bcast = true))
          .unionByName(probe("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", bcast = true))
          .unionByName(probe("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", bcast = true))
    },

    GraftQuery(
      "pr06_completeness_audit",
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |         COUNT(*) AS n_events,
             |         COUNT(DISTINCT user_id) AS n_users,
             |         COUNT(DISTINCT event_type) AS n_types
             |  FROM events GROUP BY 1),
             |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
             |cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |        FROM bounds)
             |SELECT c.day,
             |       COALESCE(d.n_events, 0) AS n_events,
             |       COALESCE(d.n_users, 0) AS n_users,
             |       COALESCE(d.n_types, 0) AS n_types,
             |       CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS is_missing
             |FROM cal c LEFT JOIN daily d USING (day)""".stripMargin),
      "Ingest completeness / freshness audit — the arrival-monitoring pass a pipeline runs before trusting a day's data: per calendar day between the observed bounds, event volume, exact distinct users and event types, and an explicit is_missing flag for days with NO data at all (a day absent from a GROUP BY is invisible; an audit must surface it as a row, not an absence — q46's densification discipline applied to data quality). The fact table aggregates FIRST in one day-keyed map-side-combining shuffle (the two exact distincts share the day partitioning via Expand); bounds, calendar generation, and the flag join all run at day cardinality, so audit cost is one fact pass regardless of scale. All outputs are exact integers — nothing to diverge cross-engine.") {
      (s, dir) =>
        val daily = Tables.load(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            countDistinct(col("event_type")).as("n_types"))
        val cal = daily.agg(min("day").as("lo"), max("day").as("hi"))
          .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
        cal.join(daily.withColumn("present", lit(1)), Seq("day"), "left")
          .select(col("day"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            coalesce(col("n_types"), lit(0L)).as("n_types"),
            when(col("present").isNull, 1).otherwise(0).as("is_missing"))
    },

    GraftQuery(
      "pr07_drift_audit",
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
             |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
             |mid AS (SELECT lo + CAST((hi - lo) // 2 AS INT) AS m FROM bounds),
             |c AS (SELECT event_type,
             |        COUNT(*) FILTER (WHERE day <= m) AS cnt_early,
             |        COUNT(*) FILTER (WHERE day > m) AS cnt_late
             |      FROM d CROSS JOIN mid GROUP BY 1),
             |t AS (SELECT CAST(SUM(cnt_early) AS BIGINT) AS ta,
             |             CAST(SUM(cnt_late) AS BIGINT) AS tb FROM c)
             |SELECT event_type, cnt_early, cnt_late,
             |       CAST(cnt_early AS DOUBLE) / ta AS prop_early,
             |       CAST(cnt_late AS DOUBLE) / tb AS prop_late,
             |       ABS(cnt_early * tb - cnt_late * ta) AS drift_units
             |FROM c CROSS JOIN t""".stripMargin),
      "Distribution-drift audit between the first and second half of the event timeline — the monitor a production pipeline runs to catch a collector going quiet, a bot flood, or a schema migration skewing the event mix (the PSI/KL dashboard shape). Deliberately NOT PSI itself: PSI needs ln(), and libm transcendentals diverge across engines/platforms in the last bits (the tx13 idf lesson) — so the per-category drift statistic is the EXACT integer cross-difference |cnt_early*total_late − cnt_late*total_early| (= total_early*total_late*|Δproportion| without any division), which any engine reproduces bit-for-bit; the two proportions each spend the family's one audited IEEE division. At 1e12-row windows the int64 product overflows — the documented promotion is decimal(38,0) at that scale, same math. Shape: ONE fact scan, one map-side-combining hash agg at category grain with conditional counts (no per-window re-scan), the split day derived by integer-division midpoint from a 1-row bounds aggregate that rides a broadcast; everything downstream of the first agg runs at category cardinality. Alert rule: sort by drift_units, investigate the head.") {
      (s, dir) =>
        val d = Tables.load(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("event_type"))
        val mid = d.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(expr("date_add(lo, CAST(datediff(hi, lo) div 2 AS INT))").as("m"))
        val c = d.crossJoin(broadcast(mid))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("day") <= col("m"), 1L).otherwise(0L)).as("cnt_early"),
            sum(when(col("day") > col("m"), 1L).otherwise(0L)).as("cnt_late"))
        val t = c.agg(sum(col("cnt_early")).as("ta"), sum(col("cnt_late")).as("tb"))
        c.crossJoin(broadcast(t))
          .select(col("event_type"), col("cnt_early"), col("cnt_late"),
            (col("cnt_early").cast("double") / col("ta")).as("prop_early"),
            (col("cnt_late").cast("double") / col("tb")).as("prop_late"),
            abs(col("cnt_early") * col("tb") - col("cnt_late") * col("ta"))
              .as("drift_units"))
    },

    GraftQuery(
      "pr08_join_forecast",
      Some {
        def block(rel: String, ta: String, ka: String, tb: String, kb: String) =
          s"""SELECT '$rel' AS relationship,
             |  (SELECT COUNT(*) FROM $ta) AS left_rows,
             |  (SELECT COUNT(*) FROM $tb) AS right_rows,
             |  (SELECT COUNT(DISTINCT $ka) FROM $ta) AS left_keys,
             |  (SELECT COUNT(DISTINCT $kb) FROM $tb) AS right_keys,
             |  COUNT(*) AS matched_keys,
             |  CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS est_rows,
             |  CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT) AS max_key_pairs
             |FROM (SELECT $ka AS k, COUNT(*) AS ca FROM $ta GROUP BY 1) a
             |JOIN (SELECT $kb AS k, COUNT(*) AS cb FROM $tb GROUP BY 1) b USING (k)""".stripMargin
        Seq(
          block("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
          block("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
          block("events_events_user", "events", "user_id", "events", "user_id"))
          .mkString("\n", "\nUNION ALL\n", "")
      },
      "Pre-join cardinality + skew FORECAST — the planner audit you run BEFORE committing a 100 TB join, priced entirely from per-key count histograms WITHOUT executing the join itself: for each candidate relationship, est_rows = SUM over matched keys of cnt_left*cnt_right (EXACT inner-join output cardinality at key grain — the quantity a histogram CBO approximates with bounded buckets, computed exactly here because the histogram join runs at distinct-key grain, not fact-output grain) and max_key_pairs = the hottest key's output (the skew amplification that OOMs one reducer while est_rows looks fine — the events self-join row is the cautionary tale: a power-law user turns |events|^2-ish). Together with pr04 (one table's key distribution) this completes the join-planning pre-flight: left/right rows and key counts feed the broadcast decision, est_rows prices the shuffle output, max_key_pairs picks salting/AQE-skew before the join runs. Shape: one map-side-combining count per side at key grain, a key-grain equi-join of the two histograms, then a 1-row fold — the fact tables are SCANNED once each and never joined; spec proves est_rows equals the actually-executed join count for every relationship. Exact int64 arithmetic (at 1e12-row keys promote the products to decimal(38,0) — pr07's documented move).") {
      (s, dir) =>
        def hist(df: org.apache.spark.sql.DataFrame, k: String) =
          df.groupBy(col(k).as("k")).agg(count(lit(1)).as("c"))
        def block(rel: String, a: org.apache.spark.sql.DataFrame, ka: String,
                  b: org.apache.spark.sql.DataFrame, kb: String) = {
          val ha = hist(a, ka)
          val hb = hist(b, kb)
          val fold = ha.select(col("k"), col("c").as("ca"))
            .join(hb.select(col("k"), col("c").as("cb")), "k")
            .agg(count(lit(1)).as("matched_keys"),
              coalesce(sum(col("ca") * col("cb")), lit(0L)).cast("long").as("est_rows"),
              coalesce(max(col("ca") * col("cb")), lit(0L)).cast("long").as("max_key_pairs"))
          val sides = ha.agg(sum(col("c")).as("left_rows"),
              count(lit(1)).as("left_keys"))
            .crossJoin(hb.agg(sum(col("c")).as("right_rows"),
              count(lit(1)).as("right_keys")))
          sides.crossJoin(broadcast(fold))
            .select(lit(rel).as("relationship"), col("left_rows"),
              col("right_rows"), col("left_keys"), col("right_keys"),
              col("matched_keys"), col("est_rows"), col("max_key_pairs"))
        }
        val ev = Tables.load(s, dir, "events")
        block("orders_lineitem",
            Tables.load(s, dir, "orders"), "o_orderkey",
            Tables.load(s, dir, "lineitem"), "l_orderkey")
          .unionByName(block("customer_orders",
            Tables.load(s, dir, "customer"), "c_custkey",
            Tables.load(s, dir, "orders"), "o_custkey"))
          .unionByName(block("events_events_user", ev, "user_id", ev, "user_id"))
    },

    GraftQuery(
      "pr09_fd_audit",
      Some("""WITH fd1 AS (SELECT d, COUNT(*) AS ndep FROM (
             |    SELECT DISTINCT o_orderkey AS d, o_custkey AS p FROM orders) GROUP BY d),
             |fd2 AS (SELECT d, COUNT(*) AS ndep FROM (
             |    SELECT DISTINCT l_orderkey AS d, l_suppkey AS p FROM lineitem) GROUP BY d),
             |fd3 AS (SELECT d, COUNT(*) AS ndep FROM (
             |    SELECT DISTINCT user_id AS d, event_type AS p FROM events) GROUP BY d)
             |SELECT 'orders' AS relation, 'o_orderkey' AS determinant,
             |       'o_custkey' AS dependent,
             |       CAST(COUNT(*) AS BIGINT) AS n_det,
             |       CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             |       CAST(MAX(ndep) AS BIGINT) AS max_deps
             |FROM fd1
             |UNION ALL
             |SELECT 'lineitem', 'l_orderkey', 'l_suppkey', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(MAX(ndep) AS BIGINT) FROM fd2
             |UNION ALL
             |SELECT 'events', 'user_id', 'event_type', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT),
             |       CAST(MAX(ndep) AS BIGINT) FROM fd3""".stripMargin),
      "FUNCTIONAL-DEPENDENCY audit — the schema-semantics profiling axis pr01-pr08 lack (they profile VALUES: distributions, skew, referential integrity, drift; this profiles RULES): for each declared candidate dependency det -> dep, does one determinant value ever map to more than one dependent value? The answer decides real pipeline structure — a 0-violation FD is a candidate KEY (dedup grain, upsert key, partition key) or a safe denormalization (carry dep alongside det instead of joining for it); a violated 'FD' caught here is the silent fan-out that turns a later enrichment join into row multiplication (the q53/q56 class of bug, detected BEFORE the join ships). Three declared dependencies audited: a true key (o_orderkey -> o_custkey, zero violations expected — the oracle-checked positive), a deliberate fan-out (l_orderkey -> l_suppkey: an order straddles suppliers), and a behavioral non-rule (user_id -> event_type). Scale mechanics, per FD: ONE distinct at (det, dep) grain (map-side partial combine — the only pass that sees fact rows), a count at det grain, then a 1-row fold; nothing larger than the distinct-pair set ever shuffles, and the three audits union as independent branches (at 100 TB you run one branch per suspected rule, same plan). All counts exact integers — bit-identical cross-engine. ProfileSpec pins both polarities non-vacuously: the key holds with zero violations, the fan-outs genuinely violate.") {
      (s, dir) =>
        def fd(df: org.apache.spark.sql.DataFrame, rel: String,
            det: String, dep: String) =
          df.select(col(det).as("d"), col(dep).as("p")).distinct()
            .groupBy("d").agg(count(lit(1)).as("ndep"))
            .agg(count(lit(1)).as("n_det"),
              sum(when(col("ndep") > 1, 1L).otherwise(0L)).as("n_violating"),
              max(col("ndep")).as("max_deps"))
            .select(lit(rel).as("relation"), lit(det).as("determinant"),
              lit(dep).as("dependent"),
              col("n_det"), col("n_violating"), col("max_deps"))
        fd(Tables.load(s, dir, "orders"), "orders", "o_orderkey", "o_custkey")
          .unionByName(
            fd(Tables.load(s, dir, "lineitem"), "lineitem", "l_orderkey", "l_suppkey"))
          .unionByName(
            fd(Tables.load(s, dir, "events"), "events", "user_id", "event_type"))
    },

    GraftQuery(
      "pr10_snapshot_diff",
      Some(s"""WITH o AS (SELECT o_orderkey AS k,
              |                  CAST(o_totalprice AS DECIMAL(12,2)) AS price,
              |                  ${Sampling.duckBucket100Of("o_orderkey")} AS bkt
              |           FROM orders),
              |a AS (SELECT k, price FROM o WHERE bkt < 95),
              |b AS (SELECT k, CASE WHEN bkt % 7 = 0
              |                     THEN price + CAST(1.00 AS DECIMAL(12,2))
              |                     ELSE price END AS price
              |      FROM o WHERE bkt >= 5)
              |SELECT CASE WHEN a.k IS NULL THEN 'added'
              |            WHEN b.k IS NULL THEN 'removed'
              |            WHEN a.price <> b.price THEN 'changed'
              |            ELSE 'unchanged' END AS change_class,
              |       COUNT(*) AS n_rows,
              |       CAST(SUM(COALESCE(b.price, 0) - COALESCE(a.price, 0)) AS DOUBLE)
              |         AS total_price_delta
              |FROM a FULL OUTER JOIN b ON a.k = b.k
              |GROUP BY 1""".stripMargin),
      "SNAPSHOT DIFF / table reconciliation — the audit every incremental pipeline runs between two generations of the same table ('what did last night's load actually change?'): per key, classify added / removed / changed / unchanged and account the value drift per class, the four numbers that catch a botched backfill (everything 'changed'), a truncated extract (mass 'removed'), or a double-load (mass 'added') BEFORE downstream consumers do. The two snapshots are synthesized deterministically from one table (tx16's injection discipline — generation A omits keys bucketed >= 95, generation B omits < 5 and mutates every bkt%7==0 price by +1.00), so all four classes are non-vacuously present at every fixture scale and the oracle states the exact expected counts and deltas. Execution is ONE full-outer join on the key (q53's MERGE shape repurposed as an audit — both sides shuffle once, classification and the per-class fold are map-side; the class aggregate is 4 rows); at 100 TB both snapshots stored bucketed on the key (q55's layout) make even that single shuffle vanish. Money math decimal end-to-end, one terminal double cast — bit-identical cross-engine.") {
      (s, dir) =>
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            col("o_totalprice").cast("decimal(12,2)").as("price"))
          .withColumn("bkt", expr(Sampling.bucket100("k")))
        val a = o.filter(col("bkt") < 95).select(col("k").as("ka"), col("price").as("pa"))
        val b = o.filter(col("bkt") >= 5)
          .select(col("k").as("kb"),
            when(col("bkt") % 7 === 0, col("price") + lit(BigDecimal("1.00")))
              .otherwise(col("price")).cast("decimal(12,2)").as("pb"))
        a.join(b, col("ka") === col("kb"), "full_outer")
          .select(
            when(col("ka").isNull, "added")
              .when(col("kb").isNull, "removed")
              .when(col("pa") =!= col("pb"), "changed")
              .otherwise("unchanged").as("change_class"),
            (coalesce(col("pb"), lit(BigDecimal("0.00")))
              - coalesce(col("pa"), lit(BigDecimal("0.00")))).as("delta"))
          .groupBy("change_class")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("delta")).cast("double").as("total_price_delta"))
    },
  )
}

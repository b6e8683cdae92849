package graft.operators

import graft.TestSpark._
import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-family pins: the explicit bloom probe is IN the sk01 plan and
  * changes nothing about the result; Spark's automatic InjectRuntimeFilter
  * plants the same expressions when enabled (proving the explicit spelling
  * is the optimizer's own shape); top-k/CMS/HLL accuracy booleans hold.
  */
class SketchesSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.GraftQuery.all.find(_.name == name).get.build(spark, sf001)

  test("sk01: bloom probe is a pre-join scan filter and result equals the plain semi join") {
    val df = run("sk01_bloom_semi_join")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val exact = Tables.load(spark, sf001, "lineitem")
      .join(Tables.load(spark, sf001, "orders").filter(col("o_totalprice") > 400000)
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.sameElements(exact))
  }

  test("Spark's own InjectRuntimeFilter plants the same bloom shape when enabled") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join: the rule only bothers planting a
      // runtime filter when the application side actually shuffles
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val lineitem = Tables.load(spark, sf001, "lineitem")
      val dim = Tables.load(spark, sf001, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val joined = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
        s"InjectRuntimeFilter did not fire:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sk02: approx_top_k equals the exact top-3 at fixture cardinality") {
    val got = run("sk02_heavy_hitters_topk")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(-_._2)
    val exact = Tables.load(spark, sf001, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("event_type")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(exact))
  }

  test("sk03: every CMS estimate satisfies the guarantee booleans") {
    val rows = run("sk03_cms_frequency").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(2)), "cms_within_eps violated")
  }

  test("sk04: HLL rollup matches exact distinct at coupon-exact cardinality") {
    val rows = run("sk04_hll_rollup").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(2)), "sketch_within_5pct violated")
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sf001, "customer").count())
  }

  test("sk06: daily-partial window merge equals q51's exact rolling distinct") {
    val rows = run("sk06_hll_window_rollup").collect()
    assert(rows.forall(_.getBoolean(2)), "sketch_within_5pct violated")
    // the exact branch must BE q51's answer, day for day — one truth,
    // two constructions (disjoint-interval trick vs day-range join)
    val q51 = run("q51_rolling_distinct").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val here = rows.map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(here == q51, "sk06's exact branch diverged from q51")
    // windows genuinely accumulate: some day covers more users than any
    // single day's count (otherwise the 7-day merge is vacuous)
    val daily = Tables.load(spark, sf001, "events")
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(_.getLong(1)).max
    assert(here.values.max > daily, "no window exceeds a single day — merge vacuous")
  }

  test("sk07: windowed quantiles from daily partials equal a raw-event replay; windows genuinely span days") {
    val ev = Tables.load(spark, sf001, "events")
      .select(to_date(col("ts")).as("day"), col("value"))
      .collect().map(r => (r.getDate(0).toLocalDate, math.floor(r.getDouble(1) * 100).toLong))
    val days = ev.map(_._1).distinct
    val expect = days.map { d =>
      val win = ev.filter { case (dy, _) =>
        !dy.isAfter(d) && !dy.isBefore(d.minusDays(6)) }.map(_._2).sorted
      val n = win.length.toLong
      def q(num: Long, den: Long): Long = {
        // min v with den*running >= num*total, over the sorted multiset
        var run = 0L
        win.find { _ => run += 1; run * den >= n * num }.get
      }
      d.toString -> ((n, q(1, 2), q(9, 10)))
    }.toMap
    val got = run("sk07_quantile_window_rollup").collect()
      .map(r => r.getDate(0).toLocalDate.toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect, "sk07 diverged from the raw-event replay")
    // merging is non-vacuous: some window holds more events than any
    // single day contributes
    val maxDaily = ev.groupBy(_._1).map(_._2.size).max.toLong
    assert(got.values.map(_._1).max > maxDaily,
      "no window exceeds a single day's volume — the 7-day merge is vacuous")
  }

  test("sk08: windowed top-3 from daily frequent-items partials equals a raw-event replay; exact regime holds") {
    val ev = Tables.load(spark, sf001, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    // the sketch's exact-regime precondition: tracked capacity (100)
    // strictly exceeds the key cardinality — outside it the full value
    // oracle would be the wrong check (the doc's documented relaxation)
    assert(ev.map(_._2).distinct.length < 100,
      "event_type cardinality reached maxItemsTracked — exact regime broken")
    val days = ev.map(_._1).distinct
    val expect = days.flatMap { d =>
      val win = ev.filter { case (dy, _) =>
        !dy.isAfter(d) && !dy.isBefore(d.minusDays(6)) }
      win.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(3).zipWithIndex
        .map { case ((t, c), i) => (d.toString, i + 1, t) -> c }
    }.toMap
    val got = run("sk08_topk_window_rollup").collect()
      .map(r => (r.getDate(0).toLocalDate.toString, r.getInt(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got === expect, "sk08 diverged from the raw-event replay")
    // merging is non-vacuous: some windowed top-1 count exceeds any
    // single day's count of that type
    val maxDaily = ev.groupBy(identity).map(_._2.size).max.toLong
    assert(got.collect { case ((_, 1, _), c) => c }.max > maxDaily,
      "no windowed top-1 exceeds a single (day, type) count — the merge is vacuous")
  }
}

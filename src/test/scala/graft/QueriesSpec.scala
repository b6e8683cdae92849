package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every inventory query builds, executes, and returns a sane shape on
  * sf0.001. One test per operator (driver requirement).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // Queries whose correct result CAN be empty at tiny scale.
  private val mayBeEmpty = Set("q06_anti_join", "q14_except",
    "dd06_embedding_neardup_lsh", "dd03_minhash_lsh_pairs",
    "dd04_simhash_pairs", "dd05_ngram_jaccard_pairs",
    "dd07_dedup_clusters")

  for (q <- GraftQuery.all) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.build(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle name matches a query name") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique") {
    val names = GraftQuery.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("q61: merged partials equal a from-scratch rebuild; both splits non-empty") {
    // the MV refresh-correctness invariant, checked in-engine on top of
    // the cross-engine oracle: incremental merge == full rescan, and
    // the md5 split genuinely produces a base AND a drop (else the
    // merge is vacuous)
    import org.apache.spark.sql.functions._
    val merged = GraftQuery.all.find(_.name == "q61_incremental_mv").get
      .build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val full = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(merged === full, "incremental merge diverged from the full rebuild")
    val bkts = Tables.spread(Tables.load(spark, sf0001, "events"), "event_id")
      .select(expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 90")
        .as("isBase")).groupBy("isBase").count().collect()
    assert(bkts.length === 2, "md5 split must produce both a base and a drop")
  }

  test("q67: delta terms are disjoint, the dO x dL corner is non-vacuous, and the serve reads the stored view") {
    import org.apache.spark.sql.functions._
    def bkt(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    val df = GraftQuery.all.find(_.name == "q67_join_mv_delta").get.build(spark, sf0001)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // term classification replayed from the split keys: every output
    // row lands in exactly ONE of the four terms (disjointness is what
    // makes the union exact), and all four are non-empty — including
    // the dO x dL corner, the term two-term implementations forget
    val terms = rows.groupBy { case (ok, ln, _) =>
      (bkt(s"${ok}_mv") >= 90, bkt(s"${ok}_${ln}_mv") >= 90)
    }
    assert(terms.keySet === Set((false, false), (true, false), (false, true), (true, true)),
      s"missing delta terms: ${terms.keySet}")
    assert(rows.length === terms.values.map(_.length).sum)
    // per-term cardinalities replayed from the base tables: the union
    // must contribute each term exactly once (a double-counted corner
    // or a delta leaking into the stored view shifts a term's count;
    // note the synthetic lineitem key repeats, so counts — not key
    // sets — are the right grain)
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey").collect().map(_.getLong(0))
      .groupBy(ok => bkt(s"${ok}_mv") >= 90)
      .view.mapValues(_.groupBy(identity).view.mapValues(_.length).toMap).toMap
    val lines = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy { case (ok, ln) => bkt(s"${ok}_${ln}_mv") >= 90 }
      .view.mapValues(_.groupBy(_._1).view.mapValues(_.length).toMap).toMap
    def termCount(dO: Boolean, dL: Boolean): Long = {
      val o = ords.getOrElse(dO, Map.empty)
      val l = lines.getOrElse(dL, Map.empty)
      o.map { case (ok, n) => n.toLong * l.getOrElse(ok, 0).toLong }.sum
    }
    for (dO <- Seq(false, true); dL <- Seq(false, true))
      assert(terms((dO, dL)).length.toLong === termCount(dO, dL),
        s"term (dO=$dO, dL=$dL) count diverges from the replay")

    // the serve reads the persisted view, and the base x base join is
    // absent: the (false,false) rows come from ONE parquet scan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val scans = walk(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("graft_jmv")),
      "q67's serve does not read the persisted view")
  }

  test("q68: every mixed-delta class is non-vacuous, deletes actually retract, and the serve reads the stored view") {
    import org.apache.spark.sql.functions._
    def bkt(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    def oIns(ok: Long) = bkt(s"${ok}_mv") >= 90
    def oDel(ok: Long) = !oIns(ok) && bkt(s"${ok}_mvd") < 25
    def lIns(ok: Long, ln: Int) = bkt(s"${ok}_${ln}_mv") >= 90
    def lDel(ok: Long, ln: Int) = !lIns(ok, ln) && bkt(s"${ok}_${ln}_mvd") < 25
    val df = GraftQuery.all.find(_.name == "q68_join_mv_counting").get.build(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // driver replay of the mutated-base join universe, per delta class
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey").collect().map(_.getLong(0)).distinct
    val lines = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val pairs = for { ok <- ords; (lk, ln) <- lines if lk == ok } yield (ok, ln)
    // all four sign corners of the dO x dL term exist in the DATA (the
    // measured-split discipline: a vacuous corner pins nothing)
    for ((name, p) <- Seq[(String, ((Long, Int)) => Boolean)](
        ("ins x ins", t => oIns(t._1) && lIns(t._1, t._2)),
        ("ins x del", t => oIns(t._1) && lDel(t._1, t._2)),
        ("del x ins", t => oDel(t._1) && lIns(t._1, t._2)),
        ("del x del", t => oDel(t._1) && lDel(t._1, t._2))))
      assert(pairs.exists(p), s"dO x dL corner '$name' is vacuous at this fixture")
    // polarity: inserts actually appear, deletes actually retract
    val insO = pairs.filter(t => oIns(t._1) && !lIns(t._1, t._2) && !lDel(t._1, t._2))
    val delO = pairs.filter(t => oDel(t._1) && !lIns(t._1, t._2) && !lDel(t._1, t._2))
    val insL = pairs.filter(t => lIns(t._1, t._2) && !oIns(t._1) && !oDel(t._1))
    val delL = pairs.filter(t => lDel(t._1, t._2) && !oIns(t._1) && !oDel(t._1))
    assert(insO.nonEmpty && insO.forall(got), "order-insert rows missing from the refreshed view")
    assert(delO.nonEmpty && !delO.exists(got), "order-delete rows survive in the refreshed view")
    assert(insL.nonEmpty && insL.forall(got), "line-insert rows missing from the refreshed view")
    assert(delL.nonEmpty && !delL.exists(got), "line-delete rows survive in the refreshed view")
    // the serve reads the persisted mult-carrying view
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val scans = walk(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("graft_jmv")),
      "q68's serve does not read the persisted view")
  }

  test("q69: every group polarity is non-vacuous (vanish/appear/grow/shrink/untouched) and the refresh equals a replay") {
    import org.apache.spark.sql.functions._
    def bkt(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def oLive(ok: Long) = bkt(s"${ok}_mv") >= 90 || bkt(s"${ok}_mvd") >= 25
    def lLive(ok: Long, ln: Int) =
      bkt(s"${ok}_${ln}_mv") >= 90 || bkt(s"${ok}_${ln}_mvd") >= 25
    def oBase(ok: Long) = bkt(s"${ok}_mv") < 90
    def lBase(ok: Long, ln: Int) = bkt(s"${ok}_${ln}_mv") < 90
    def counts(oIn: Long => Boolean, lIn: (Long, Int) => Boolean) =
      lines.filter { case (ok, ln) => ords.contains(ok) && oIn(ok) && lIn(ok, ln) }
        .groupBy { case (ok, _) => ords(ok) }.view.mapValues(_.length.toLong).toMap
    val base = counts(oBase, lBase)
    val live = counts(oLive, lLive)
    val df = GraftQuery.all.find(_.name == "q69_agg_mv_delta").get
      .build(spark, sf0001)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === live, "refreshed group counts diverge from the replay")
    // the refresh reads the persisted aggregate — the base x base join
    // runs in no serve (the q67/q68 store pin, at the aggregate tier)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val scans = walk(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("graft_aggmv")),
      "q69's refresh does not read the persisted aggregate view")
    // the full polarity set, each non-vacuous (gr25's discipline)
    assert(base.keySet.exists(k => !live.contains(k)), "no group vanished")
    assert(live.keySet.exists(k => !base.contains(k)), "no group appeared")
    assert(base.exists { case (k, n) => live.get(k).exists(_ > n) }, "no group grew")
    assert(base.exists { case (k, n) => live.get(k).exists(m => m < n && m > 0) },
      "no group shrank")
    assert(base.exists { case (k, n) => live.get(k).contains(n) }, "no group untouched")
  }

  test("q70: refresh equals a driver replay, every classifier class is non-vacuous, and the serve reads the stored extrema") {
    import org.apache.spark.sql.functions._
    def bkt(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def oLive(ok: Long) = bkt(s"${ok}_mv") >= 90 || bkt(s"${ok}_mvd") >= 25
    def lLive(ok: Long, ln: Int) =
      bkt(s"${ok}_${ln}_mv") >= 90 || bkt(s"${ok}_${ln}_mvd") >= 25
    def oBase(ok: Long) = bkt(s"${ok}_mv") < 90
    def lBase(ok: Long, ln: Int) = bkt(s"${ok}_${ln}_mv") < 90
    def agg(oIn: Long => Boolean, lIn: (Long, Int) => Boolean)
        : Map[Long, (Double, Double, Long)] =
      lines.filter { case (ok, ln, _) => ords.contains(ok) && oIn(ok) && lIn(ok, ln) }
        .groupBy { case (ok, _, _) => ords(ok) }.view
        .mapValues(xs => (xs.map(_._3).min, xs.map(_._3).max, xs.length.toLong))
        .toMap
    val base = agg(oBase, lBase)
    val live = agg(oLive, lLive)
    val df = GraftQuery.all.find(_.name == "q70_minmax_mv_delta").get
      .build(spark, sf0001)
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(got === live, "refreshed extrema diverge from the driver replay")
    // the serve reads the persisted (mn, mx, n) store — the base x base
    // join runs in no refresh (the MV-family store pin)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val scans = walk(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("graft_mmmv")),
      "q70's refresh does not read the persisted extrema view")
    // r19 optimization: the unsafe-group path reconstructs from the
    // persisted row-grain view + stored delta — NO refresh path may
    // scan a base table (the base x base join and the md5 split both
    // live in the store builds, paid once per application)
    assert(scans.forall(!_.contains("testdata")),
      s"q70's refresh scans a base table: ${scans.filter(_.contains("testdata"))}")
    // classifier classes, each non-vacuous at sf0.001: groups whose
    // extrema survive closed-form (same mn/mx, changed count), groups
    // whose MIN genuinely moved (the recompute path doing real work),
    // new groups, vanished groups, untouched pass-throughs
    assert(base.exists { case (k, (mn, mx, n)) =>
      live.get(k).exists { case (m2, x2, n2) => m2 == mn && x2 == mx && n2 != n } },
      "no group kept its extrema while changing count")
    assert(base.exists { case (k, (mn, _, _)) =>
      live.get(k).exists { case (m2, _, _) => m2 > mn } },
      "no group's MIN moved up (boundary delete -> recompute never exercised)")
    assert(live.keySet.exists(k => !base.contains(k)), "no group appeared")
    assert(base.keySet.exists(k => !live.contains(k)), "no group vanished")
    assert(base.exists { case (k, v) => live.get(k).contains(v) }, "no group untouched")
  }

  test("q71: refresh equals a driver replay; the within-positive transition (the aux table's reason to exist) is live") {
    import org.apache.spark.sql.functions._
    def bkt(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    val ords = Tables.load(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(12,2)").cast("double"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def oLive(ok: Long) = bkt(s"${ok}_mv") >= 90 || bkt(s"${ok}_mvd") >= 25
    def lLive(ok: Long, ln: Int) =
      bkt(s"${ok}_${ln}_mv") >= 90 || bkt(s"${ok}_${ln}_mvd") >= 25
    def oBase(ok: Long) = bkt(s"${ok}_mv") < 90
    def lBase(ok: Long, ln: Int) = bkt(s"${ok}_${ln}_mv") < 90
    def agg(oIn: Long => Boolean, lIn: (Long, Int) => Boolean)
        : Map[Long, (Long, Long)] =
      lines.filter { case (ok, ln, _) => ords.contains(ok) && oIn(ok) && lIn(ok, ln) }
        .groupBy { case (ok, _, _) => ords(ok) }.view
        .mapValues(xs => (xs.map(_._3).distinct.length.toLong, xs.length.toLong))
        .toMap
    val base = agg(oBase, lBase)
    val live = agg(oLive, lLive)
    val got = GraftQuery.all.find(_.name == "q71_distinct_mv_delta").get
      .build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === live, "refreshed distinct counts diverge from the driver replay")
    // the headline polarity: a group whose DISTINCT count held while
    // its line count changed — a surviving duplicate copy, the case a
    // view-only (aux-less) maintainer cannot decide
    assert(base.exists { case (k, (nd, nl)) =>
      live.get(k).exists { case (nd2, nl2) => nd2 == nd && nl2 != nl } },
      "no group kept its distinct count through a line-count change")
    // and the opposite: a distinct count that genuinely dropped
    assert(base.exists { case (k, (nd, _)) =>
      live.get(k).exists { case (nd2, _) => nd2 < nd } },
      "no group's distinct count dropped (death transitions vacuous)")
    assert(base.exists { case (k, (nd, _)) =>
      live.get(k).exists { case (nd2, _) => nd2 > nd } },
      "no group's distinct count grew (birth transitions vacuous)")
    assert(base.keySet.exists(k => !live.contains(k)), "no group vanished")
    assert(live.keySet.exists(k => !base.contains(k)), "no group appeared")
  }
}

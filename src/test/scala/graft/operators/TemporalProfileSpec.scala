package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the SCD2 / gap-fill / profiling queries — the
  * properties parity alone can't state: intervals chain correctly and
  * the gap-fill fixture actually has gaps (the oracle would also pass
  * on degenerate dense data).
  */
class TemporalProfileSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.GraftQuery.all.find(_.name == name).get.build(spark, sf001)

  test("q45: intervals chain per user; exactly one open (is_current) interval each") {
    val rows = run("q45_scd2_intervals").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, iv) =>
      assert(iv.count(_._4) == 1, s"user $u: expected exactly one open interval")
      val sorted = iv.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $u: valid_to must chain to next valid_from")
        case _ =>
      }
      assert(sorted.last._3.isEmpty, s"user $u: last interval must be open")
    }
  }

  test("q52: sessions are gap-consistent and match a sequential reference sessionizer") {
    // replay the sessionizer per user on the collected event stream:
    // same 30-min rule, same (ts, event_id) order — session count,
    // sizes, and bounds must agree row-for-row
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val events = graft.Tables.load(spark, sf001, "events")
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2)))
    val expected = events.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[List[Long]]()
      var cur = List.empty[Long]
      var prev = Long.MinValue
      for ((_, ts, _) <- sorted) {
        if (cur.nonEmpty && ts - prev > 1800000000L) { sessions += cur; cur = Nil }
        cur = ts :: cur
        prev = ts
      }
      if (cur.nonEmpty) sessions += cur
      sessions.zipWithIndex.map { case (tss, i) =>
        (u, i + 1L) -> (tss.size.toLong, tss.min, tss.max)
      }
    }.toMap
    val got = run("q52_sessionize").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), us(r.getTimestamp(3)), us(r.getTimestamp(4)))
    }.toMap
    assert(got.size == expected.size, "session count mismatch")
    expected.foreach { case (k, v) => assert(got(k) == v, s"session $k diverged") }
    assert(expected.exists(_._2._1 > 1), "fixture must produce a multi-event session")
    assert(expected.keys.groupBy(_._1).values.exists(_.size > 1),
      "fixture must produce a user with >1 session, or the gap rule is vacuous")
  }

  test("pr06: flags are consistent and the day range is complete") {
    val rows = run("pr06_completeness_audit").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // contiguous calendar: every day between bounds appears exactly once
    val days = rows.map(_._1).sorted
    assert(days.distinct.size == days.size)
    assert(days.zip(days.drop(1)).forall { case (a, b) => a.plusDays(1) == b },
      "calendar must be gap-free")
    // flag agrees with the counts in both directions
    rows.foreach { case (d, n, u, t, miss) =>
      assert((miss == 1) == (n == 0L), s"$d: is_missing must equal n_events==0")
      if (n > 0) assert(u > 0 && t > 0, s"$d: present day must have users and types")
    }
  }

  test("q46: fixture has real gaps (zero-filled days) and fill carries values forward") {
    val rows = run("q46_gap_fill").collect()
      .map(r => (r.getString(0), r.getLong(2), Option(r.get(3))))
    assert(rows.exists(_._2 == 0L), "no gap days — the sparsity predicate is vacuous")
    // forward fill: every gap day after a type's first observation has a value
    val filledGaps = rows.filter(r => r._2 == 0L && r._3.nonEmpty)
    assert(filledGaps.nonEmpty, "no gap day carries a forward-filled total")
  }

  test("q47: funnel reuses one user_id partitioning — no redundant exchanges") {
    val plan = run("q47_conversion_funnel")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    // ONE user_id shuffle over the fact data (the window), which the
    // per-user aggregation inherits, + the user-sized cohort rollup.
    // A second user_id exchange means the fused plan regressed to the
    // oracle's self-join shape (events scanned and shuffled twice).
    assert(exchanges.count(_ == "user_id") == 1,
      s"expected exactly one user_id shuffle: $exchanges\n$plan")
    assert(exchanges.size <= 2, s"unexpected exchanges: $exchanges")
  }

  test("q66: sequence funnel equals a driver replay; order genuinely binds; one fact shuffle") {
    import org.apache.spark.sql.functions.col
    // driver-side replay of the chained-anchor definition
    val ev = graft.Tables.load(spark, sf001, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val win = 6L * 3600 * 1000 // the 6 h per-stage proximity bound
    val perUser = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val t1 = rows.filter(_._2 == "view").map(_._3).minOption
      t1.map { v =>
        val t2 = rows.filter(r => r._2 == "click" && r._3 > v && r._3 <= v + win)
          .map(_._3).minOption
        val t3 = t2.flatMap(c =>
          rows.filter(r => r._2 == "purchase" && r._3 > c && r._3 <= c + win)
            .map(_._3).minOption)
        (u, v, t2, t3)
      }
    }.toSeq
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = perUser.groupBy(t => fmt.format(new java.util.Date(t._2)))
      .view.mapValues(us =>
        (us.size.toLong, us.count(_._3.isDefined).toLong,
          us.count(_._4.isDefined).toLong)).toMap
    val got = run("q66_sequence_funnel").collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected, s"funnel diverged from the sequential replay")
    // order-sensitivity non-vacuity: some user has click events but NO
    // qualifying click (all precede the first view) — without such
    // users the strict ordering is indistinguishable from plain EXISTS
    val excluded = perUser.count { case (u, v, t2, _) =>
      t2.isEmpty && ev.exists(r => r._1 == u && r._2 == "click")
    }
    assert(excluded > 0,
      "no user excluded by ordering — the sequence constraint never fired")
    // completions exist (the full chain is exercised end to end)
    assert(expected.values.map(_._3).sum > 0, "no completed sequence in the fixture")
    // plan: the three chained windows + per-user collapse share ONE
    // user_id exchange over fact rows (q47's discipline, 3 stages deep)
    val plan = run("q66_sequence_funnel").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.count(_ == "user_id") == 1,
      s"expected exactly one user_id shuffle: $exchanges")
  }

  test("q51: disjoint-interval rolling distinct equals the brute-force window") {
    // the query's whole trick is that a plain COUNT of exploded
    // contribution intervals equals COUNT(DISTINCT user) per trailing
    // 7-day window; replay that claim against a brute-force reference
    // over the collected (day, user) pairs
    val got = run("q51_rolling_distinct").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val ad = graft.Tables.load(spark, sf001, "events")
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ad.map(_._1).distinct
    val expect = days.map { d =>
      d -> ad.filter { case (a, _) =>
        !a.isAfter(d) && !a.isBefore(d.minusDays(6)) }.map(_._2).distinct.size.toLong
    }.toMap
    assert(got == expect, "rolling distinct diverged from brute force")
    // the construction is only interesting if some user has a GAP
    // (non-consecutive active days) — otherwise intervals never truncate
    val hasGap = ad.groupBy(_._2).values.exists { ds =>
      val s = ds.map(_._1).sorted
      s.sliding(2).exists { w => w.length == 2 && w(0).plusDays(1).isBefore(w(1)) }
    }
    assert(hasGap, "fixture has no per-user gap — interval truncation untested")
  }

  test("q56: every purchase matches exactly one interval; history is exercised") {
    import org.apache.spark.sql.functions.col
    val got = run("q56_scd2_lookup")
    val nPurchases = graft.Tables.load(spark, sf001, "events")
      .filter(col("event_type") === "purchase").count()
    // the intervals partition the timeline: exactly-one match per fact
    assert(got.count() == nPurchases,
      "as-of lookup must match each purchase to exactly one interval")
    assert(got.select("event_id").distinct().count() == nPurchases,
      "a purchase matched two intervals — containment predicate broken")
    // non-vacuity: some match is HISTORICAL (a later change closed the
    // interval after the purchase) — i.e. the join genuinely needed
    // versions, not just the current row per user
    val iv45 = run("q45_scd2_intervals")
    val historical = got.as("g").join(iv45.as("i"),
      col("g.user_id") === col("i.user_id") &&
        col("g.valid_from") === col("i.valid_from") &&
        !col("i.is_current"))
    assert(historical.count() > 0,
      "every match hit the current version — the as-of pin is vacuous")
  }

  test("pr07: equals a driver-side replay; both windows populated") {
    import org.apache.spark.sql.functions.{col, to_date}
    // collect (day, type) with Spark's own date semantics (UTC session)
    // so the model only re-does the arithmetic, not the timezone
    val rows = graft.Tables.load(spark, sf001, "events")
      .select(to_date(col("ts")).as("day"), col("event_type")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val (lo, hi) = (rows.map(_._1).min(Ordering.by[java.time.LocalDate, Long](
      _.toEpochDay)), rows.map(_._1).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay)))
    val mid = lo.plusDays((hi.toEpochDay - lo.toEpochDay) / 2)
    val byType = rows.groupBy(_._2).view.mapValues { rs =>
      (rs.count(!_._1.isAfter(mid)).toLong, rs.count(_._1.isAfter(mid)).toLong)
    }.toMap
    val (ta, tb) = (byType.values.map(_._1).sum, byType.values.map(_._2).sum)
    val expect = byType.map { case (t, (a, b)) =>
      t -> ((a, b, math.abs(a * tb - b * ta)))
    }
    val got = run("pr07_drift_audit").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    assert(got == expect, "drift audit diverged from the driver replay")
    // non-vacuity: both windows hold events and the mix genuinely moves
    assert(ta > 0 && tb > 0, "a window is empty — the midpoint split is degenerate")
    assert(expect.values.exists(_._3 > 0L),
      "zero drift everywhere — the fixture cannot exercise the alert path")
  }

  test("q60: cohort diagonal is exactly 1.0; retention bounded; one user exchange") {
    val rows = run("q60_retention_cohorts").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // offset 0: every cohort member was active in their first week BY
    // DEFINITION — the full-pipeline sanity diagonal
    val diag = rows.filter(_._2 == 0)
    assert(diag.nonEmpty && diag.forall(r => r._3 == r._4 && r._5 == 1.0),
      s"cohort diagonal broken: $diag")
    assert(rows.forall(r => r._3 <= r._4 && r._5 > 0.0 && r._5 <= 1.0))
    // genuinely multi-week: some cohort observed at offset >= 1
    assert(rows.exists(_._2 >= 1), "no later-week activity — matrix is vacuous")
    // fused shape: the per-user week-set aggregate is PINNED, so the
    // final plan re-reads it for both consumers (matrix + sizes)
    // without re-paying the fact shuffle — zero user_id exchanges and
    // zero events scans downstream of the pin
    val p = graft.GraftQuery.all.find(_.name == "q60_retention_cohorts").get
      .build(spark, sf001).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).isEmpty,
      "the fact-scale user shuffle must be paid once, behind the pin")
    assert(!p.contains("events.parquet"),
      "downstream of the pin the fact table must not be re-scanned")
  }

  test("pr08: forecast est_rows equals the actually-executed join, per relationship") {
    // the forecast's whole claim is exactness at key grain: run the
    // three real joins it refuses to run and compare. The events
    // self-join also proves max_key_pairs is a real skew signal
    // (hottest key's output >> the mean key's).
    import org.apache.spark.sql.functions.col
    val got = run("pr08_join_forecast").collect()
      .map(r => r.getString(0) -> (r.getLong(6), r.getLong(7), r.getLong(5))).toMap
    def cnt(a: String, ka: String, b: String, kb: String): Long =
      graft.Tables.load(spark, sf001, a).select(col(ka).as("k"))
        .join(graft.Tables.load(spark, sf001, b).select(col(kb).as("k")), "k")
        .count()
    val actual = Map(
      "orders_lineitem" -> cnt("orders", "o_orderkey", "lineitem", "l_orderkey"),
      "customer_orders" -> cnt("customer", "c_custkey", "orders", "o_custkey"),
      "events_events_user" -> cnt("events", "user_id", "events", "user_id"))
    actual.foreach { case (rel, n) =>
      assert(got(rel)._1 == n, s"$rel: est_rows ${got(rel)._1} != executed $n")
    }
    val (estSelf, hotSelf, keysSelf) = got("events_events_user")
    assert(hotSelf > 0 && estSelf > 0 && keysSelf > 0, "self-join forecast is vacuous")
    // skew signal is real: the hottest key's output exceeds the mean
    // key's output (strictly, unless the distribution is flat)
    assert(hotSelf >= estSelf / keysSelf,
      s"max_key_pairs $hotSelf below the mean ${estSelf / keysSelf} — not a max")
  }

  test("pr09: FD audit matches driver-side recomputation; both polarities non-vacuous") {
    val got = run("pr09_fd_audit").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // driver-side recomputation straight from the definition
    def fd(table: String, det: String, dep: String): (Long, Long, Long) = {
      val pairs = graft.Tables.load(spark, sf001, table)
        .select(det, dep).distinct().collect()
        .map(r => (r.get(0), r.get(1)))
      val perDet = pairs.groupBy(_._1).view.mapValues(_.length.toLong)
      (perDet.size.toLong, perDet.count(_._2 > 1).toLong, perDet.values.max)
    }
    assert(got("orders") === fd("orders", "o_orderkey", "o_custkey"))
    assert(got("lineitem") === fd("lineitem", "l_orderkey", "l_suppkey"))
    assert(got("events") === fd("events", "user_id", "event_type"))
    // polarity non-vacuity: the audit must be able to say BOTH "this
    // rule holds" and "this rule is violated" on real data — a suite
    // of all-holds (or all-violated) audits couldn't discriminate
    assert(got("orders")._2 === 0L && got("orders")._3 === 1L,
      "o_orderkey -> o_custkey must hold (it is a key dependency)")
    assert(got("lineitem")._2 > 0L && got("lineitem")._3 > 1L,
      "l_orderkey -> l_suppkey must be violated (orders straddle suppliers)")
    assert(got("events")._2 > 0L,
      "user_id -> event_type must be violated (behavior is not a rule)")
  }

  test("pr01/pr02: profile totals are consistent with each other") {
    val prof = run("pr01_column_profile").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val histTotal = run("pr02_length_histogram").collect().map(_.getLong(2)).sum
    assert(prof.values.toSet.size == 1, "all columns must report the same row count")
    assert(histTotal == prof("n_chars"), "histogram must preserve the row count")
  }

  test("pr10: snapshot diff matches a driver replay; every class non-vacuous; deltas reconcile") {
    import org.apache.spark.sql.functions.col
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val orders = graft.Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        // mirror Spark's double -> decimal(12,2) cast: toString-based
        // BigDecimal then HALF_UP to scale 2
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val a = orders.filter(t => bucket(t._1) < 95).toMap
    val b = orders.filter(t => bucket(t._1) >= 5)
      .map { case (k, p) => k -> (if (bucket(k) % 7 == 0) p + 1 else p) }.toMap
    val classes = (a.keySet ++ b.keySet).toSeq.map { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(p)) => ("added", p)
        case (Some(p), None) => ("removed", -p)
        case (Some(pa), Some(pb)) if pa != pb => ("changed", pb - pa)
        case _ => ("unchanged", BigDecimal(0))
      }
    }
    val expected = classes.groupBy(_._1).view.mapValues(v =>
      (v.size.toLong, v.map(_._2).sum.toDouble)).toMap
    val got = run("pr10_snapshot_diff").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected, s"diff diverged: got=$got expected=$expected")
    // all four classes present — the audit can tell every story apart
    assert(got.keySet === Set("added", "removed", "changed", "unchanged"))
    // reconciliation invariants: every changed row drifted by exactly
    // +1.00 (the injected mutation), unchanged rows contribute zero
    assert(got("changed")._2 === got("changed")._1.toDouble,
      "changed delta must be exactly n_changed x 1.00")
    assert(got("unchanged")._2 === 0.0)
    assert(got("added")._2 > 0 && got("removed")._2 < 0,
      "added/removed mass must carry its sign")
  }
}

package graft.operators

import java.nio.file.Files

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** StreamedSketch pins (the sk09 "Done =" clause): the accreted
  * partial store is bit-identical to the inline partials over the same
  * events; accrete-across-restart == sequential replay (real
  * readStream, checkpointed kill/resume mid-stream); replaying a
  * processed batch and re-delivering a held day are both no-ops;
  * compaction preserves content/serving under the same
  * write-then-prune + crashed-batch contract as the other stores; and
  * sk09's serving plan reads the persisted store, never raw events.
  */
class StreamedSketchSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"sksk-$tag").toString

  private lazy val ev: DataFrame = graft.Tables.load(spark, sf0001, "events")
    .select(col("ts"), col("value"), col("user_id"), col("event_type"))
    .withColumn("day", to_date(col("ts")))
  private def slice(lo: String, hi: String): DataFrame =
    ev.filter(col("day").between(lit(lo).cast("date"), lit(hi).cast("date")))

  private def storeState(store: String): Set[(java.sql.Date, Long, Long)] =
    StreamedSketch.readStore(spark, store).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).toSet

  test("accreted store == inline partials over the full event set; drops genuinely accrete") {
    val store = tmp("store")
    StreamedSketch.seed(spark, slice("2024-01-01", "2024-01-20"), store)
    val nSeedDays = StreamedSketch.readStore(spark, store)
      .select("day").distinct().count()
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 0L, store)
    StreamedSketch.processBatch(slice("2024-01-26", "2024-01-30"), 1L, store)
    val acc = storeState(store)

    val accDays = acc.map(_._1).size
    assert(nSeedDays === 20L && accDays === 30,
      s"fixture must seed 20 days and accrete to 30 (got $nSeedDays/$accDays)")
    // THE identity pin: the accreted store may not differ from the
    // inline partial computation in a single (day, value, count) row
    val inline = StreamedSketch.partials(ev).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).toSet
    assert(acc === inline, "accreted partials diverge from the inline computation")
  }

  test("streamed accretion across a checkpointed restart == sequential replay; re-delivered day and replayed batch are no-ops") {
    val (incoming, store, ckpt) = (tmp("in"), tmp("store2"), tmp("ckpt"))
    StreamedSketch.seed(spark, slice("2024-01-01", "2024-01-20"), store)

    def writeDrop(lo: String, hi: String): Unit =
      slice(lo, hi).select("ts", "value", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(incoming)
    def start() = StreamedSketch.run(spark, incoming, store, ckpt,
      trigger = Trigger.ProcessingTime(100))

    // drop 0, then KILL the query mid-stream; restart drains drop 1
    writeDrop("2024-01-21", "2024-01-25")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    writeDrop("2024-01-26", "2024-01-30")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val streamed = storeState(store)

    // sequential replay with the same batch protocol
    val store2 = tmp("store3")
    StreamedSketch.seed(spark, slice("2024-01-01", "2024-01-20"), store2)
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 0L, store2)
    StreamedSketch.processBatch(slice("2024-01-26", "2024-01-30"), 1L, store2)
    assert(streamed === storeState(store2),
      "streamed accretion diverges from the sequential batch replay")

    // at-least-once re-delivery: same batch, same id — byte-stable
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 0L, store2)
    assert(storeState(store2) === streamed, "replayed batch changed the store")

    // a later batch re-delivering HELD days adds zero rows — the
    // day-grain admission (re-counting a held day would double its n)
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 7L, store2)
    assert(storeState(store2) === streamed,
      "re-delivered days grew the store — admission must be day-bounded")
  }

  test("compaction: content identity, one partition, interrupted run converges, guard refuses") {
    val store = tmp("store4")
    StreamedSketch.seed(spark, slice("2024-01-01", "2024-01-20"), store)
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 0L, store)
    StreamedSketch.processBatch(slice("2024-01-26", "2024-01-30"), 1L, store)
    def partitions(): Seq[String] = {
      val d = new java.io.File(s"$store/daily")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSeq.sorted
    }
    val pre = storeState(store)
    assert(partitions().size === 3, "fixture must accrete 3 partitions")

    StreamedSketch.compactStore(spark, store, -2L)
    assert(storeState(store) === pre, "compaction changed the store's content")
    assert(partitions() === Seq("batch_id=-2"))

    // interrupted compaction: the write phase lands (duplicating every
    // row) but the prune never runs; a re-run converges
    StreamedSketch.readStore(spark, store)
      .write.mode("overwrite").parquet(s"$store/daily/batch_id=-3")
    StreamedSketch.compactStore(spark, store, -3L)
    assert(storeState(store) === pre, "re-run compaction changed the content")
    assert(partitions() === Seq("batch_id=-3"))

    // loud contract: non-negative/seed ids refused; checkpoint guard
    // refuses while a batch is started-but-uncommitted
    intercept[IllegalArgumentException](StreamedSketch.compactStore(spark, store, 5L))
    intercept[IllegalArgumentException](
      StreamedSketch.compactStore(spark, store, StreamedSketch.SeedBatchId))
    val ckpt = tmp("ckpt2")
    def touch(sub: String, id: Long): Unit = {
      val d = new java.io.File(s"$ckpt/$sub"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, id.toString).toPath,
        "{}".getBytes("UTF-8")); ()
    }
    touch("offsets", 0L)
    intercept[IllegalStateException](
      StreamedSketch.compactStore(spark, store, -4L, Some(ckpt)))
    touch("commits", 0L)
    StreamedSketch.compactStore(spark, store, -4L, Some(ckpt))
    assert(storeState(store) === pre)
  }

  test("ad/hll/topk partials accrete under the same admission; merged views match inline one-shots (r18)") {
    val store = tmp("store5")
    StreamedSketch.seed(spark, slice("2024-01-01", "2024-01-20"), store)
    StreamedSketch.processBatch(slice("2024-01-21", "2024-01-25"), 0L, store)
    StreamedSketch.processBatch(slice("2024-01-26", "2024-01-30"), 1L, store)
    // ad postings: exact row identity with the inline distinct
    val adAcc = StreamedSketch.readAd(spark, store).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    val adInline = StreamedSketch.adPartials(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    assert(adAcc === adInline, "accreted ad postings diverge from inline")
    // hll: per-day ESTIMATE identity with a one-shot day sketch (HLL
    // register state is insertion-order-independent; serialized bytes
    // may differ in sparse layout, so the pin is on estimates)
    val accEst = StreamedSketch.readHll(spark, store)
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("e")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val inlineEst = StreamedSketch.hllPartials(ev)
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("e")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(accEst === inlineEst, "accreted HLL day estimates diverge from inline")
    assert(accEst.size === 30, s"expected 30 hll day partials, got ${accEst.size}")
    // topk: per-day estimated (item, count) sets identical — the
    // tracked budget exceeds the type cardinality (exact regime)
    def topkState(df: DataFrame) = df
      .select(col("day"), explode(expr("approx_top_k_estimate(st, 100)")).as("e"))
      .select(col("day"), col("e.item"), col("e.count"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(topkState(StreamedSketch.readTopk(spark, store)) ===
      topkState(StreamedSketch.topkPartials(ev)),
      "accreted frequent-items day estimates diverge from inline")
  }

  test("empty store reads as empty frames; a held day re-delivered with different content fails loudly (ADVICE r17)") {
    val store = tmp("store6")
    assert(StreamedSketch.readStore(spark, store).count() === 0L)
    assert(StreamedSketch.readAd(spark, store).count() === 0L)
    assert(StreamedSketch.readHll(spark, store).count() === 0L)
    assert(StreamedSketch.readTopk(spark, store).count() === 0L)
    // a first batch arriving before any seed sees "nothing held" —
    // not an opaque path-not-found
    StreamedSketch.processBatch(slice("2024-01-01", "2024-01-05"), 0L, store)
    assert(StreamedSketch.readStore(spark, store)
      .select("day").distinct().count() === 5L)
    // AMENDED content for a held day is late/changed data the
    // admission would silently discard — it must throw, naming days
    val amended = slice("2024-01-01", "2024-01-05")
      .withColumn("value", col("value") + lit(1.0))
    val e = intercept[IllegalStateException](
      StreamedSketch.processBatch(amended, 1L, store))
    assert(e.getMessage.contains("not a byte-identical re-delivery"))
    assert(e.getMessage.contains("2024-01-01"), "the guard must name the days")
    // the failed batch wrote nothing: the store is unchanged
    assert(StreamedSketch.readStore(spark, store)
      .select("day").distinct().count() === 5L)
    // a byte-identical re-delivery of the same days still no-ops
    val pre = storeState(store)
    StreamedSketch.processBatch(slice("2024-01-01", "2024-01-05"), 2L, store)
    assert(storeState(store) === pre, "identical re-delivery changed the store")
  }

  test("guard covers every persisted projection: same values, different user_ids or event_types still fail loudly (ADVICE r18)") {
    import spark.implicits._
    def mk(rows: Seq[(String, Double, Long, String)]): DataFrame =
      rows.toDF("tss", "value", "user_id", "event_type")
        .select(col("tss").cast("timestamp").as("ts"),
          col("value"), col("user_id"), col("event_type"))
    val base = Seq(
      ("2024-03-01 10:00:00", 1.50, 10L, "view"),
      ("2024-03-01 11:00:00", 2.25, 11L, "click"))
    val store = tmp("store7")
    StreamedSketch.processBatch(mk(base), 0L, store)
    // identical re-delivery: no-op, no throw
    StreamedSketch.processBatch(mk(base), 1L, store)
    // SAME value histogram, different user_id — the r18 guard passed
    // this silently and kept stale ad/hll content forever
    val userSwap = Seq(
      ("2024-03-01 10:00:00", 1.50, 99L, "view"),
      ("2024-03-01 11:00:00", 2.25, 11L, "click"))
    val e1 = intercept[IllegalStateException](
      StreamedSketch.processBatch(mk(userSwap), 2L, store))
    assert(e1.getMessage.contains("2024-03-01"))
    // SAME values and users, different event_type — the topk family
    val typeSwap = Seq(
      ("2024-03-01 10:00:00", 1.50, 10L, "purchase"),
      ("2024-03-01 11:00:00", 2.25, 11L, "click"))
    val e2 = intercept[IllegalStateException](
      StreamedSketch.processBatch(mk(typeSwap), 3L, store))
    assert(e2.getMessage.contains("2024-03-01"))
    // the guard's remedy pointer names the correction path
    assert(e2.getMessage.contains("restateDay"))
  }

  test("restateDay (r19, VERDICT r18 #4): serving identity vs a store seeded right; crash-ordering; replay converges; compaction folds + clears markers") {
    val truth = slice("2024-01-01", "2024-01-12")
    val badDay = lit("2024-01-05").cast("date")
    // the truncated upstream delivery: day 5 arrives with only half
    // its rows (even user_ids) — the late-backfill scenario
    val truncated = truth.filter(
      col("day") =!= badDay || col("user_id") % 2 === 0)

    val store = tmp("store8")
    StreamedSketch.seed(spark,
      truncated.filter(col("day") <= lit("2024-01-08").cast("date")), store)
    StreamedSketch.processBatch(
      truncated.filter(col("day") > lit("2024-01-08").cast("date")), 0L, store)
    // the defect is visible before the fix (non-vacuous)
    val right = tmp("store8r")
    StreamedSketch.seed(spark,
      truth.filter(col("day") <= lit("2024-01-08").cast("date")), right)
    StreamedSketch.processBatch(
      truth.filter(col("day") > lit("2024-01-08").cast("date")), 0L, right)
    assert(storeState(store) !== storeState(right),
      "the truncated day must actually differ or the restatement pin is vacuous")

    // the upstream fix re-states day 5 with its FULL content
    StreamedSketch.restateDay(truth.filter(col("day") === badDay), 5L, store)

    def full(st: String) = (
      storeState(st),
      StreamedSketch.readAd(spark, st).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1))).toSet,
      StreamedSketch.readHll(spark, st).collect()
        .map(r => (r.getDate(0).toString, r.getAs[Array[Byte]](1).toSeq)).toSet)
    assert(full(store) === full(right),
      "a restated store must serve exactly what a correctly-seeded store serves")
    // topk family: per-day estimates identical (state bytes may differ
    // by accumulation order; the served content is what matters)
    def tkEst(st: String) = StreamedSketch.readTopk(spark, st)
      .select(col("day"), explode(expr("approx_top_k_estimate(st, 100)")).as("e"))
      .select(col("day"), col("e.item"), col("e.count"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(tkEst(store) === tkEst(right))

    // replayed restatement (same id) converges
    StreamedSketch.restateDay(truth.filter(col("day") === badDay), 5L, store)
    assert(full(store) === full(right))

    // a re-delivery of the CORRECTED day now no-ops against the guard
    // (the live view holds the corrected content)
    StreamedSketch.processBatch(truth.filter(col("day") === badDay), 9L, store)
    assert(full(store) === full(right))

    // compaction folds the correction in, clears the markers, keeps
    // serving identity
    StreamedSketch.compactStore(spark, store, -2L)
    assert(full(store) === full(right), "serving changed across compaction")
    val tombDirs = Option(new java.io.File(s"$store/tombs").listFiles())
      .map(_.filter(_.getName.startsWith("batch_id=")).map(_.getName).toSeq)
      .getOrElse(Seq.empty)
    assert(tombDirs === Seq("batch_id=-2"),
      s"compaction must fold tombs to the single cleared partition, got $tombDirs")
    assert(spark.read.parquet(s"$store/tombs/batch_id=-2").count() === 0L,
      "the folded tombs partition must be empty — markers consumed")
  }

  test("sk09: serving reads the persisted store, never raw events; result invariant under compaction") {
    val byName = graft.GraftQuery.all.map(x => x.name -> x).toMap
    val df = byName("sk09_sketch_store_serving").build(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.size === 30 && got.exists(_._2 > 0),
      "sk09 serving is broken — wrong day count or empty windows")
    // store serve == inline serve (sk07), row for row
    val inline = byName("sk07_quantile_window_rollup").build(spark, sf0001)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === inline, "the store serve diverges from sk07's inline serve")

    // plan pin: zero raw-events scans; at least one store scan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val nodes = walk(df.queryExecution.executedPlan)
    def scansOn(frag: String): Int = nodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(frag))
      case _ => false
    }
    assert(scansOn("events") === 0,
      "sk09's serving plan touches raw events — it must read the partial store")
    assert(scansOn("graft_skstore") >= 1,
      "sk09's serving plan reads no partial-store table")

    // compaction invariance: fold the memoized store the query serves
    // from, re-serve, identical answer (readStore globs batch_id=*)
    val root = nodes.collectFirst {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft_skstore")) =>
        f.relation.location.rootPaths
          .find(_.toString.contains("/daily/")).get.toString
    }.get
    val idx = root.indexOf("/daily/")
    assert(idx > 0, s"unexpected store path shape: $root")
    val storeDir = root.substring(root.indexOf("file:") match {
      case -1 => 0
      case i => i + 5
    }, idx)
    StreamedSketch.compactStore(spark, storeDir, -9L)
    val post = byName("sk09_sketch_store_serving").build(spark, sf0001)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(post === got, "sk09's answer changed across store compaction")
  }

  test("sk10/sk11: the hll and topk serves read only the store and equal their inline twins (r18)") {
    val byName = graft.GraftQuery.all.map(x => x.name -> x).toMap
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    def audit(name: String, inlineName: String): Unit = {
      val df = byName(name).build(spark, sf0001)
      val got = df.collect().map(_.toString).toSet
      val inline = byName(inlineName).build(spark, sf0001)
        .collect().map(_.toString).toSet
      assert(got === inline, s"$name diverges from $inlineName's inline serve")
      assert(got.nonEmpty, s"$name emitted nothing — pin is vacuous")
      val nodes = walk(df.queryExecution.executedPlan)
      def scansOn(frag: String): Int = nodes.count {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(frag))
        case _ => false
      }
      assert(scansOn("events") === 0,
        s"$name's serving plan touches raw events — it must read the partial store")
      assert(scansOn("graft_skstore") >= 1,
        s"$name's serving plan reads no partial-store table")
    }
    audit("sk10_hll_store_serving", "sk06_hll_window_rollup")
    audit("sk11_topk_store_serving", "sk08_topk_window_rollup")
  }

  test("sk12: totals off the store equal a driver replay of the partial rows; zero events scans (r18)") {
    val byName = graft.GraftQuery.all.map(x => x.name -> x).toMap
    val df = byName("sk12_total_store_serving").build(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    // replay the windowed totals from the raw partial rows driver-side
    val parts = StreamedSketch.partials(
      graft.Tables.load(spark, sf0001, "events").select("ts", "value"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val days = parts.map(_._1).distinct
    val expect = days.map { d =>
      val w = parts.filter(p => !p._1.isBefore(d.minusDays(6)) && !p._1.isAfter(d))
      (d.toString, w.map(_._3).sum, w.map(p => p._2 * p._3).sum)
    }.toSet
    assert(got === expect, "sk12 diverges from the partial-row replay")
    assert(got.size === 30, s"expected 30 window days, got ${got.size}")
    // plan pin: the serve reads the store, never raw events
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val nodes = walk(df.queryExecution.executedPlan)
    def scansOn(frag: String): Int = nodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(frag))
      case _ => false
    }
    assert(scansOn("events") === 0, "sk12's serve touches raw events")
    assert(scansOn("graft_skstore") >= 1, "sk12's serve reads no store table")
  }
}

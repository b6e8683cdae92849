package graft.operators

import java.nio.file.Files

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** StreamedDedup pins (VERDICT r13 #5's "Done =" clause, literally):
  * streamed verdicts == the batch core replayed sequentially
  * driver-side (and a one-batch stream == the shipped dd12 semantics)
  * ACROSS a checkpointed restart mid-stream; re-delivering a processed
  * batch is a no-op on both verdicts and store; store growth is
  * bounded by distinct fingerprints (a batch of exact clones adds
  * zero rows).
  */
class StreamedDedupSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"sdd-$tag").toString

  // the dd12 universe at sf0.001: 10% md5 split into incoming + corpus
  private lazy val all: DataFrame = graft.Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"))
    .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
  private lazy val inc = all.filter(col("bkt") < 10).select("doc_id", "text")
    .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
  private lazy val corp = all.filter(col("bkt") >= 10).select("doc_id", "text")

  private def toDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Driver-side sequential replay of the batch protocol with the SAME
    * factored core — the ground truth for the streamed == batch pin.
    */
  private def replay(batches: Seq[Seq[(Long, String)]])
      : (Seq[(Long, String, Any)], DataFrame, DataFrame) = {
    var exact = Dedup.corpusExact(corp)
    var postings = Dedup.corpusPostings(spark, corp)
    val verdicts = Seq.newBuilder[(Long, String, Any)]
    for (b <- batches) {
      val v = Dedup.verdictsAgainstStore(spark, toDf(b), exact, postings)
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2)))
      verdicts ++= v
      val admitted = toDf(b.filter(d => v.exists(x => x._1 == d._1 && x._2 == "new")))
      exact = exact.unionByName(
        Dedup.corpusExact(admitted).join(exact, Seq("fp"), "left_anti")).localCheckpoint()
      postings = postings.unionByName(
        Dedup.corpusPostings(spark, admitted)).localCheckpoint()
    }
    (verdicts.result(), exact, postings)
  }

  private def collectVerdicts(outDir: String): Seq[(Long, String, Any)] =
    StreamedDedup.readVerdicts(spark, outDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq

  test("streamed == sequential batch replay across a checkpointed mid-stream restart; one-batch == dd12") {
    val (incoming, store, out, ckpt) =
      (tmp("in"), tmp("store"), tmp("out"), tmp("ckpt"))
    StreamedDedup.seed(spark, corp, store)
    val batches = inc.toSeq.grouped((inc.length + 2) / 3).map(_.toSeq).toSeq
    assert(batches.length === 3, "fixture must split into 3 micro-batches")

    def writeDrop(i: Int): Unit =
      toDf(batches(i)).coalesce(1).write.mode("append").parquet(incoming)
    def start() = StreamedDedup.run(spark, incoming, store, out, ckpt,
      trigger = Trigger.ProcessingTime(100))

    // batch 0, then KILL the query mid-stream
    writeDrop(0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint: batches 1 and 2 drain
    writeDrop(1)
    val q2 = start()
    try {
      q2.processAllAvailable()
      writeDrop(2)
      q2.processAllAvailable()
    } finally q2.stop()

    val (expected, _, _) = replay(batches)
    assert(collectVerdicts(out).sortBy(_._1) === expected.sortBy(_._1),
      "streamed verdicts diverge from the sequential batch replay")

    // one-batch stream == the shipped dd12 batch query (same universe):
    // dd12 verdicts the whole 10% drop against the 90% corpus in one pass
    val (store1, out1) = (tmp("store1"), tmp("out1"))
    StreamedDedup.seed(spark, corp, store1)
    StreamedDedup.processBatch(toDf(inc.toSeq), 0L, store1, out1)
    val dd12 = graft.GraftQuery.all.find(_.name == "dd12_incremental_dedup").get
      .build(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    assert(collectVerdicts(out1).sortBy(_._1) === dd12.sortBy(_._1),
      "a one-batch stream must equal the shipped dd12 batch operator")
  }

  test("re-delivered batch is a no-op; store growth bounded by distinct fingerprints") {
    val (store, out) = (tmp("store2"), tmp("out2"))
    StreamedDedup.seed(spark, corp, store)
    val batch0 = inc.take(inc.length / 2).toSeq
    StreamedDedup.processBatch(toDf(batch0), 0L, store, out)

    def storeState(): (Set[(String, Long)], Long) = {
      val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
      (e.collect().map(r => (r.getString(0), r.getLong(1))).toSet, p.count())
    }
    val v1 = collectVerdicts(out)
    val s1 = storeState()

    // at-least-once re-delivery: same batch, same id — byte-stable
    StreamedDedup.processBatch(toDf(batch0), 0L, store, out)
    assert(collectVerdicts(out) === v1, "replayed batch changed the verdict output")
    assert(storeState() === s1, "replayed batch changed the store")

    // growth bound: a batch of EXACT clones of corpus docs (fresh ids,
    // identical text — constructed: the fixture has no byte-identical
    // cross-split dups) must verdict all-exact_dup and add ZERO rows
    val clones = corp.limit(5).collect()
      .zipWithIndex.map { case (r, i) => (900001L + i, r.getString(1)) }.toSeq
    StreamedDedup.processBatch(toDf(clones), 99L, store, out)
    val cloneVerdicts = collectVerdicts(out).filter(_._1 >= 900001L)
    assert(cloneVerdicts.size === 5)
    assert(cloneVerdicts.forall(_._2 == "exact_dup"),
      s"clones must all verdict exact_dup: $cloneVerdicts")
    assert(storeState() === s1,
      "a batch with no new content grew the store — growth must be bounded by distinct fingerprints")

    // and the exact table is fingerprint-grain: one row per distinct fp
    val (e, _) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
    assert(e.groupBy("fp").count().filter(col("count") > 1).isEmpty,
      "exact store must hold one row per distinct fingerprint")
  }

  test("compaction: content-identical store, one partition per table, verdicts unchanged, interrupted run converges") {
    val (store, out) = (tmp("store3"), tmp("out3"))
    StreamedDedup.seed(spark, corp, store)
    val batches = inc.toSeq.grouped((inc.length + 2) / 3).map(_.toSeq).toSeq
    StreamedDedup.processBatch(toDf(batches(0)), 0L, store, out)
    StreamedDedup.processBatch(toDf(batches(1)), 1L, store, out)

    def storeState(): (Set[(String, Long)], Set[(Long, String)]) = {
      val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
      (e.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
        p.collect().map(r => (r.getLong(0), r.get(1).toString)).toSet)
    }
    def partitions(table: String): Seq[String] = {
      val d = new java.io.File(s"$store/$table")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSeq.sorted
    }
    val pre = storeState()
    assert(partitions("exact").size >= 2, "fixture must accrete multiple partitions")

    // compact mid-stream (maintenance window between triggers)
    StreamedDedup.compactStore(spark, store, -2L)
    assert(storeState() === pre, "compaction changed the store's row content")
    assert(partitions("exact") === Seq("batch_id=-2"), "exact not folded to one partition")
    assert(partitions("shingles") === Seq("batch_id=-2"), "shingles not folded to one partition")

    // the stream continues against the compacted store: batch 2's
    // verdicts equal the sequential replay over the UNCOMPACTED chain
    StreamedDedup.processBatch(toDf(batches(2)), 2L, store, out)
    val (expected, _, _) = replay(batches)
    assert(collectVerdicts(out).sortBy(_._1) === expected.sortBy(_._1),
      "post-compaction verdicts diverge from the uncompacted sequential replay")

    // interrupted compaction: the write phase of a NEW compaction id
    // lands (duplicating every row) but the prune never runs — the
    // documented crash window. Re-running the SAME compaction
    // converges: content identical, single partition again.
    val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
    e.write.mode("overwrite").parquet(s"$store/exact/batch_id=-3")
    p.write.mode("overwrite").parquet(s"$store/shingles/batch_id=-3")
    val post = storeState()
    StreamedDedup.compactStore(spark, store, -3L)
    assert(storeState() === post, "re-run compaction changed the row content")
    assert(partitions("exact") === Seq("batch_id=-3") &&
      partitions("shingles") === Seq("batch_id=-3"),
      "re-run compaction did not converge to one partition")

    // the contract is loud: a non-negative or seed id is refused
    intercept[IllegalArgumentException](StreamedDedup.compactStore(spark, store, 5L))
    intercept[IllegalArgumentException](
      StreamedDedup.compactStore(spark, store, StreamedDedup.SeedBatchId))
  }

  test("checkpoint guard: compaction refuses while a batch is started-but-uncommitted (ADVICE r16)") {
    val (store, out, ckpt) = (tmp("store4"), tmp("out4"), tmp("ckpt4"))
    StreamedDedup.seed(spark, corp, store)
    StreamedDedup.processBatch(toDf(inc.take(4).toSeq), 0L, store, out)

    // a synthetic checkpoint in the crashed state the guard targets:
    // batch 0 committed, batch 1 started (offsets) but never committed
    // — exactly what a crash between store append and commit leaves
    def touch(sub: String, id: Long): Unit = {
      val d = new java.io.File(s"$ckpt/$sub"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, id.toString).toPath,
        "{}".getBytes("UTF-8")); ()
    }
    touch("offsets", 0L); touch("commits", 0L); touch("offsets", 1L)
    assert(StreamedDedup.uncommittedBatch(spark, ckpt) === Some(1L))
    val pre = {
      val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
      (e.count(), p.count())
    }
    intercept[IllegalStateException](
      StreamedDedup.compactStore(spark, store, -2L, Some(ckpt)))
    val post = {
      val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
      (e.count(), p.count())
    }
    assert(post === pre, "a refused compaction must not touch the store")

    // once the batch commits, the same call proceeds
    touch("commits", 1L)
    assert(StreamedDedup.uncommittedBatch(spark, ckpt) === None)
    StreamedDedup.compactStore(spark, store, -2L, Some(ckpt))
    val d = new java.io.File(s"$store/exact")
    assert(d.listFiles().filter(_.getName.startsWith("batch_id="))
      .map(_.getName).toSeq === Seq("batch_id=-2"))

    // and a checkpoint-less call keeps the doc-level contract (no guard)
    StreamedDedup.compactStore(spark, store, -3L)
  }

  test("erasure lifecycle (r19, dd23): live view == rebuild-without-erased; replay + never-admitted no-ops; compaction physical; re-admission after erasure") {
    val (store, out) = (tmp("store5"), tmp("out5"))
    StreamedDedup.seed(spark, corp, store)
    val batch0 = inc.take(inc.length / 2).toSeq
    StreamedDedup.processBatch(toDf(batch0), 0L, store, out)
    val admitted0 = collectVerdicts(out).filter(_._2 == "new").map(_._1).toSet
    assert(admitted0.nonEmpty, "fixture must admit something or the test is vacuous")

    // erasure wave: 3 seed-corpus docs, 1 admitted doc, 1 id the store
    // never held (must be a structural no-op)
    val corpIds = corp.select("doc_id").limit(3).collect().map(_.getLong(0)).toSeq
    val erased = (corpIds :+ admitted0.min :+ 777777777L).distinct
    import spark.implicits._
    StreamedDedup.deleteBatch(erased.toDF("doc_id"), 1L, store)

    val probe = toDf(inc.drop(inc.length / 2).toSeq)
    def serve(): Seq[(Long, String, Any)] = {
      val (e, p) = StreamedDedup.readStore(
        spark, store, Long.MinValue, applyTombstones = true)
      Dedup.verdictsAgainstStore(spark, probe, e, p).collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSeq.sortBy(_._1)
    }
    val served = serve()

    // rebuild-without-erased: the live view must be indistinguishable
    // from frames built over exactly the live documents (the fixture
    // has no clone families at sf0.001, so holder-grain == doc-grain)
    val liveDocs = corp.unionByName(toDf(batch0.filter(d => admitted0(d._1))))
      .filter(!col("doc_id").isin(erased: _*))
    val rebuilt = Dedup.verdictsAgainstStore(spark, probe,
      Dedup.corpusExact(liveDocs), Dedup.corpusPostings(spark, liveDocs))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq.sortBy(_._1)
    assert(served === rebuilt,
      "live-view verdicts diverge from a rebuild without the erased docs")

    // the erasure genuinely changed something (non-vacuous): at least
    // one erased doc's postings left the live view
    val (eLive, pLive) = StreamedDedup.readStore(
      spark, store, Long.MinValue, applyTombstones = true)
    assert(pLive.filter(col("doc_id").isin(erased: _*)).isEmpty)
    assert(eLive.filter(col("cid").isin(erased: _*)).isEmpty)

    // replayed erasure (same id): byte-stable no-op
    StreamedDedup.deleteBatch(erased.toDF("doc_id"), 1L, store)
    assert(serve() === served, "a replayed erasure changed the serve")

    // compaction makes it physical: erased rows gone from the RAW
    // partitions, tombstones cleared, serve unchanged
    StreamedDedup.compactStore(spark, store, -2L)
    val (eRaw, pRaw) = StreamedDedup.readStore(spark, store, Long.MinValue)
    assert(pRaw.filter(col("doc_id").isin(erased: _*)).isEmpty,
      "compaction must physically remove erased postings")
    assert(eRaw.filter(col("cid").isin(erased: _*)).isEmpty,
      "compaction must physically remove erased holders' fp rows")
    assert(StreamedDedup.readTombstones(spark, store).isEmpty,
      "compaction must clear consumed tombstones")
    assert(serve() === served, "serving changed across compaction")

    // re-admission: the erased ADMITTED doc's text must verdict 'new'
    // again (a dead fp row must not shadow a new holder) and re-enter
    // the store under its new id
    val erasedText = toDf(batch0).filter(col("doc_id") === admitted0.min)
      .select("text").head().getString(0)
    StreamedDedup.processBatch(
      Seq((888888888L, erasedText)).toDF("doc_id", "text"), 7L, store, out)
    val v7 = collectVerdicts(out).filter(_._1 == 888888888L)
    assert(v7.map(_._2) === Seq("new"),
      s"an erased text re-arriving must be admitted as new, got $v7")
    val (e7, _) = StreamedDedup.readStore(spark, store, Long.MinValue)
    assert(e7.filter(col("cid") === 888888888L).count() === 1L,
      "the re-admitted doc must hold its fingerprint in the store")
  }
}

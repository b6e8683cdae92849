package graft.operators

import java.nio.file.Files

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** StreamedIndex pins (VERDICT r16 #1's "Done =" clause, literally):
  * the accreted store is row-identical to a one-shot rebuild against
  * the same frozen seeds; accrete-across-restart == sequential replay
  * (real readStream, checkpointed kill/resume mid-stream); replaying a
  * processed batch is a no-op; serving off the store is identical
  * before/after compaction (and an interrupted compaction converges);
  * and ss20's serving plan reads the persisted store, never the raw
  * embeddings.
  */
class StreamedIndexSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"sidx-$tag").toString

  // the ss20 universe at sf0.001: quantized vectors, md5-bucketed
  private lazy val q: DataFrame = graft.Tables.load(spark, sf0001, "embeddings")
    .selectExpr("vec_id",
      "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000)) AS qe")
    .withColumn("bkt", expr(Sampling.bucket100("vec_id")))
  private lazy val seedCorp = q.filter(col("bkt") >= 10 && col("bkt") < 90)
    .select("vec_id", "qe")
  private lazy val drop0 = q.filter(col("bkt") >= 90 && col("bkt") < 95)
    .select("vec_id", "qe")
  private lazy val drop1 = q.filter(col("bkt") >= 95).select("vec_id", "qe")

  private def indexState(store: String): (Set[(Long, Int, Seq[Long])], Set[(Long, Int, Int)]) = {
    val (a, p) = StreamedIndex.readIndex(spark, store)
    (a.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet,
      p.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("accreted store == one-shot encode of the full corpus against the frozen seeds; drops genuinely accrete") {
    val store = tmp("store")
    StreamedIndex.seed(spark, seedCorp, store)
    val nSeed = StreamedIndex.readIndex(spark, store)._1.count()
    StreamedIndex.processBatch(drop0, 0L, store)
    StreamedIndex.processBatch(drop1, 1L, store)
    val (accA, accP) = indexState(store)

    // non-vacuous: the drops added vectors beyond the bootstrap
    assert(drop0.count() > 0 && drop1.count() > 0,
      "fixture drops are empty — the accretion pin is vacuous")
    assert(accA.size > nSeed, "accretion added no vectors")
    assert(accA.size === q.filter(col("bkt") >= 10).count(),
      "accreted index must cover the full corpus side (every non-query decile)")

    // THE rebuild-identity pin: one-shot encode of everything against
    // the SAME frozen (seed-time) seeds — the accreted store may not
    // differ in a single row
    val seeds = spark.read.parquet(s"$store/seeds")
    val full = q.filter(col("bkt") >= 10).select("vec_id", "qe")
    val rebA = Similarity.encodeAssign(full, seeds).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
    val rebP = Similarity.encodePq(full, seeds).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(accA === rebA, "accreted assign diverges from the rebuild")
    assert(accP === rebP, "accreted pqidx diverges from the rebuild")
  }

  test("streamed accretion across a checkpointed restart == sequential replay; re-delivered batch is a no-op") {
    val (incoming, store, ckpt) = (tmp("in"), tmp("store2"), tmp("ckpt"))
    StreamedIndex.seed(spark, seedCorp, store)

    // raw (vec_id, embedding) drops — the stream quantizes at the door
    val raw = graft.Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
      .withColumn("bkt", expr(Sampling.bucket100("vec_id")))
    def writeDrop(lo: Int, hi: Int): Unit =
      raw.filter(col("bkt") >= lo && col("bkt") < hi)
        .select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(incoming)
    def start() = StreamedIndex.run(spark, incoming, store, ckpt,
      trigger = Trigger.ProcessingTime(100))

    // drop 0, then KILL the query mid-stream
    writeDrop(90, 95)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint: drop 1 drains
    writeDrop(95, 100)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val streamed = indexState(store)

    // sequential replay with the SAME batch protocol
    val store2 = tmp("store3")
    StreamedIndex.seed(spark, seedCorp, store2)
    StreamedIndex.processBatch(drop0, 0L, store2)
    StreamedIndex.processBatch(drop1, 1L, store2)
    assert(streamed === indexState(store2),
      "streamed accretion diverges from the sequential batch replay")

    // at-least-once re-delivery: same batch, same id — byte-stable
    StreamedIndex.processBatch(drop0, 0L, store2)
    assert(indexState(store2) === streamed, "replayed batch changed the store")

    // a later batch re-delivering KNOWN vectors adds zero rows
    StreamedIndex.processBatch(drop0, 7L, store2)
    assert(indexState(store2) === streamed,
      "re-ingested known vectors grew the store — growth must be vec_id-bounded")
  }

  test("compaction: content identity, one partition per table, serving unchanged, interrupted run converges, guard refuses") {
    val store = tmp("store4")
    StreamedIndex.seed(spark, seedCorp, store)
    StreamedIndex.processBatch(drop0, 0L, store)
    StreamedIndex.processBatch(drop1, 1L, store)
    def partitions(table: String): Seq[String] = {
      val d = new java.io.File(s"$store/$table")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSeq.sorted
    }
    val pre = indexState(store)
    assert(partitions("assign").size === 3, "fixture must accrete 3 partitions")

    StreamedIndex.compactStore(spark, store, -2L)
    assert(indexState(store) === pre, "compaction changed the store's content")
    assert(partitions("assign") === Seq("batch_id=-2"))
    assert(partitions("pqidx") === Seq("batch_id=-2"))

    // interrupted compaction: a new id's write phase lands (duplicating
    // every row) but the prune never runs; re-running the same id
    // converges on content and layout
    val (a, p) = StreamedIndex.readIndex(spark, store)
    a.write.mode("overwrite").parquet(s"$store/assign/batch_id=-3")
    p.write.mode("overwrite").parquet(s"$store/pqidx/batch_id=-3")
    StreamedIndex.compactStore(spark, store, -3L)
    assert(indexState(store) === pre, "re-run compaction changed the content")
    assert(partitions("assign") === Seq("batch_id=-3") &&
      partitions("pqidx") === Seq("batch_id=-3"))

    // loud contract: non-negative/seed ids refused; checkpoint guard
    // refuses while a batch is started-but-uncommitted
    intercept[IllegalArgumentException](StreamedIndex.compactStore(spark, store, 5L))
    intercept[IllegalArgumentException](
      StreamedIndex.compactStore(spark, store, StreamedIndex.SeedBatchId))
    val ckpt = tmp("ckpt2")
    def touch(sub: String, id: Long): Unit = {
      val d = new java.io.File(s"$ckpt/$sub"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, id.toString).toPath,
        "{}".getBytes("UTF-8")); ()
    }
    touch("offsets", 0L)
    intercept[IllegalStateException](
      StreamedIndex.compactStore(spark, store, -4L, Some(ckpt)))
    touch("commits", 0L)
    StreamedIndex.compactStore(spark, store, -4L, Some(ckpt))
    assert(indexState(store) === pre)
  }

  test("ss20: serving reads the persisted accreted store, never raw embeddings; result invariant under compaction") {
    val byName = graft.GraftQuery.all.map(x => x.name -> x).toMap
    val df = byName("ss20_accreted_index_serving").build(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got.exists(_._3 > 0),
      "ss20 serving is broken — zero recall everywhere")

    // plan pin (ss18's, on the accreted store): zero raw-embeddings
    // scans, at least one scan on the graft_ivfacc store
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
    assert(scansOn("embeddings") === 0,
      "ss20's serving plan touches raw embeddings — it must read the accreted store")
    assert(scansOn("graft_ivfacc") >= 1,
      "ss20's serving plan reads no accreted-store table")

    // compaction invariance: fold the memoized store the query serves
    // from, re-serve, identical answer (readIndex globs batch_id=*) —
    // resolve the store dir from the scan path
    // (.../graft_ivfacc_<tag>/store/<table>/batch_id=N)
    val root = nodes.collectFirst {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(p =>
          p.toString.contains("graft_ivfacc") && p.toString.contains("/store/")) =>
        f.relation.location.rootPaths
          .find(p => p.toString.contains("/store/")).get.toString
    }.get
    val idx = root.indexOf("/store/")
    assert(idx > 0, s"unexpected store path shape: $root")
    val storeDir = root.substring(root.indexOf("file:") match {
      case -1 => 0
      case i => i + 5
    }, idx + "/store".length)
    StreamedIndex.compactStore(spark, storeDir, -9L)
    val post = byName("ss20_accreted_index_serving").build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(post === got, "ss20's answer changed across store compaction")
  }

  test("tombstone lifecycle: logical delete at read, replay no-op, physical removal + tomb clearing at compaction (r18)") {
    val store = tmp("del")
    StreamedIndex.seed(spark, seedCorp, store)
    StreamedIndex.processBatch(drop0, 0L, store)
    val preLive = indexState(store)
    // no tombstones yet: the live view IS the raw view, and the
    // tombstone read on a storeless dir is empty, not an error
    assert(StreamedIndex.readTombstones(spark, store).count() === 0L)
    val liveBefore = StreamedIndex.readIndex(spark, store, applyTombstones = true)
    assert(liveBefore._1.count() === preLive._1.size.toLong)

    // delete a deterministic slice that genuinely intersects the index
    val delSet = q.filter(col("bkt") >= 10)
      .filter(expr(
        "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), '_del')), 1, 8), 16, 10) AS BIGINT) % 100 < 10"))
      .select("vec_id")
    val delIds = delSet.collect().map(_.getLong(0)).toSet
    val indexedIds = preLive._1.map(_._1)
    assert((delIds & indexedIds).nonEmpty,
      "deletion slice misses the index entirely — the lifecycle pin is vacuous")
    StreamedIndex.deleteBatch(delSet, 1L, store)

    // logical delete: raw view unchanged, live view excludes exactly
    // the tombstoned ids; deleting never-indexed vectors is a no-op
    assert(indexState(store) === preLive, "deleteBatch mutated the index tables")
    val (liveA, liveP) = StreamedIndex.readIndex(spark, store, applyTombstones = true)
    val liveIds = liveA.collect().map(_.getLong(0)).toSet
    assert(liveIds === indexedIds -- delIds, "live view != indexed minus tombstoned")
    assert(liveP.collect().map(_.getLong(0)).toSet === indexedIds -- delIds,
      "pqidx live view diverges from assign's")

    // replayed delete (same batch id) is byte-stable
    StreamedIndex.deleteBatch(delSet, 1L, store)
    assert(StreamedIndex.readIndex(spark, store, applyTombstones = true)
      ._1.collect().map(_.getLong(0)).toSet === liveIds,
      "replayed delete changed the live view")

    // compaction makes the deletion physical and clears the tombstones
    StreamedIndex.compactStore(spark, store, -2L)
    assert(StreamedIndex.readIndex(spark, store)._1
      .collect().map(_.getLong(0)).toSet === liveIds,
      "compaction did not physically remove tombstoned rows")
    assert(StreamedIndex.readTombstones(spark, store).count() === 0L,
      "consumed tombstones survive compaction")
    // and the live view equals the raw view again
    assert(StreamedIndex.readIndex(spark, store, applyTombstones = true)
      ._1.collect().map(_.getLong(0)).toSet === liveIds)
  }
}

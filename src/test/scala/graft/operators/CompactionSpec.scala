package graft.operators

import graft.TestSpark._
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental snapshot maintenance (Compaction) — equivalence with the
  * batch cdc08 aggregation, out-of-order safety via tombstones,
  * idempotent replays, and the touched-buckets-only rewrite.
  */
class CompactionSpec extends AnyFunSuite {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** events as a change log: key=user_id, seq=event_id (unique),
    * op 'd' on error else 'u'.
    */
  private def changes: DataFrame =
    Tables.load(spark, sf0001, "events").select(
      col("user_id"),
      col("ts"),
      col("event_id").as("seq"),
      when(col("event_type") === "error", "d").otherwise("u").as("op"),
      col("event_type"),
      col("value"))

  private def expectedSnapshot: DataFrame = {
    val all = changes.withColumn(Compaction.BucketCol,
      pmod(hash(col("user_id")), lit(16)))
    Compaction.compact(all, "user_id")
      .filter(col("op") =!= "d").drop(Compaction.BucketCol)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy("user_id").collect().map(_.toString).toSeq

  test("streamed merges converge to the batch compaction") {
    val srcDir = tmp("graft_chg_src")
    val snapDir = tmp("graft_snap")
    // three arrival batches that do NOT respect event time: seq%3
    // interleaves early and late changes across batches
    // parquet (not json) source: the changes carry micro-precision
    // timestamps and json round-trips them at millis
    for (b <- 0 to 2)
      changes.filter(col("seq") % 3 === b).coalesce(1)
        .write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(changes.schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Compaction.mergeBatch(batch, snapDir, "user_id")
        ()
      }
      .option("checkpointLocation", tmp("graft_snap_ckpt"))
      .option("maxFilesPerTrigger", 1) // one arrival batch per micro-batch
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(sortedRows(Compaction.readSnapshot(spark, snapDir)) ==
      sortedRows(expectedSnapshot))
  }

  test("restart resumes from the checkpoint: old batches are not re-merged") {
    val srcDir = tmp("graft_chg_resume_src")
    val snapDir = tmp("graft_snap_resume")
    val ckpt = tmp("graft_snap_resume_ckpt")
    val mergedRows = new java.util.concurrent.atomic.AtomicLong()

    def drain(): Unit = {
      val q = spark.readStream.schema(changes.schema).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          mergedRows.addAndGet(batch.count())
          Compaction.mergeBatch(batch, snapDir, "user_id")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }

    val first = changes.filter(col("seq") % 3 === 0)
    first.coalesce(1).write.mode("append").parquet(srcDir)
    drain() // run 1: drains batch 0, then the job "dies"
    val afterFirst = mergedRows.get()
    assert(afterFirst == first.count())

    changes.filter(col("seq") % 3 =!= 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    drain() // run 2: same checkpoint — must pick up ONLY the new file
    assert(mergedRows.get() == changes.count(),
      s"restart re-merged old data: saw ${mergedRows.get()} rows, corpus has ${changes.count()}")
    assert(sortedRows(Compaction.readSnapshot(spark, snapDir)) ==
      sortedRows(expectedSnapshot))
  }

  test("a late update cannot resurrect a deleted key (tombstone retained)") {
    val dir = tmp("graft_snap_tomb")
    val mk = (rows: Seq[(Long, java.sql.Timestamp, Long, String, String, Double)]) => {
      import spark.implicits._
      rows.toDF("user_id", "ts", "seq", "op", "event_type", "value")
    }
    val t = (s: Long) => new java.sql.Timestamp(s * 1000)
    // batch 1: the DELETE (newest change, ts=100)
    Compaction.mergeBatch(mk(Seq((1L, t(100), 10L, "d", "error", 0.0))), dir, "user_id")
    // batch 2: an OLDER update arrives late (ts=50)
    Compaction.mergeBatch(mk(Seq((1L, t(50), 5L, "u", "click", 1.0))), dir, "user_id")
    assert(Compaction.readSnapshot(spark, dir).count() == 0,
      "late pre-delete update must lose to the retained tombstone")
    // a genuinely NEWER update does resurrect the key
    Compaction.mergeBatch(mk(Seq((1L, t(200), 20L, "u", "view", 2.0))), dir, "user_id")
    assert(Compaction.readSnapshot(spark, dir).count() == 1)
  }

  test("replaying a batch is a no-op (idempotent merge)") {
    val dir = tmp("graft_snap_idem")
    val b1 = changes.filter(col("seq") % 3 === 0)
    val b2 = changes.filter(col("seq") % 3 === 1)
    Compaction.mergeBatch(b1, dir, "user_id")
    Compaction.mergeBatch(b2, dir, "user_id")
    val before = sortedRows(spark.read.parquet(dir))
    Compaction.mergeBatch(b2, dir, "user_id") // at-least-once redelivery
    assert(sortedRows(spark.read.parquet(dir)) == before)
  }

  test("tombstone GC drops only expired tombstones, and empty buckets vanish") {
    val dir = tmp("graft_snap_gc")
    import spark.implicits._
    val t = (s: Long) => new java.sql.Timestamp(s * 1000)
    // keys chosen so no two rows share a bucket (murmur3 seed-42 of
    // 1/2/3 -> buckets 13/8/3): key 1's bucket holds ONLY the expired
    // tombstone, so GC must remove the whole directory
    val rows = Seq(
      (1L, t(10), 1L, "d", "error", 0.0),  // expired tombstone
      (2L, t(900), 2L, "d", "error", 0.0), // fresh tombstone — retained
      (3L, t(500), 3L, "u", "click", 1.0)) // live row — untouched
      .toDF("user_id", "ts", "seq", "op", "event_type", "value")
    Compaction.mergeBatch(rows, dir, "user_id")
    Compaction.gcTombstones(spark, dir, cutoff = t(100))

    val left = spark.read.parquet(dir)
    assert(left.count() == 2, "expired tombstone must be gone, other rows kept")
    assert(left.filter(col("op") === "d").count() == 1, "fresh tombstone retained")
    // key 1's bucket held only the expired tombstone -> directory removed
    val bucket1 = math.floorMod(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(1L, 42), 16)
    assert(!new java.io.File(dir, s"bucket=$bucket1").exists(),
      "a bucket left empty by GC must not keep stale files")
  }

  test("merge rewrites ONLY the buckets the batch touches") {
    val dir = tmp("graft_snap_prune")
    Compaction.mergeBatch(changes, dir, "user_id")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified()))
      .toMap
    assert(files.keys.map(_.split("bucket=")(1).split("/")(0)).toSet.size > 4,
      "fixture should populate several buckets")

    // a single-key batch — exactly one bucket should change
    import spark.implicits._
    val one = Seq((9999999L, new java.sql.Timestamp(0L), 999999L, "u", "click", 1.0))
      .toDF("user_id", "ts", "seq", "op", "event_type", "value")
    Thread.sleep(1100) // mtime granularity
    Compaction.mergeBatch(one, dir, "user_id")
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified()))
      .toMap
    val survivors = files.filter { case (p, m) => after.get(p).contains(m) }
    val changedBuckets = (after.keySet -- survivors.keySet)
      .map(_.split("bucket=")(1).split("/")(0))
    assert(changedBuckets.size == 1,
      s"one-key merge must rewrite one bucket, rewrote: $changedBuckets")
  }
}

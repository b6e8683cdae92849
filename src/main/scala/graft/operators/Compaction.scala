package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Incremental latest-row snapshot maintenance — the streaming
  * counterpart of the `cdc08_snapshot_compaction` batch query: a
  * `foreachBatch` merge that keeps a bucket-partitioned parquet
  * snapshot current as change batches arrive, so consumers query the
  * LATEST ROW per key instead of replaying the reference's append-only
  * history (StartJob.java archives raw deletes; its readers get no
  * snapshot view).
  *
  * Scale design (the part that matters at 100 TB):
  *
  *   - The snapshot is hash-bucketed into `nBuckets` partition
  *     directories (`bucket=K/`). A merge reads back ONLY the buckets
  *     the incoming batch touches (partition-pruned scan) and rewrites
  *     ONLY those via dynamic partition overwrite — a batch touching
  *     0.1% of keys rewrites ~0.1% of the snapshot, not all of it.
  *   - The merge itself is the cdc08 aggregation: `max_by` over a
  *     unique (ts, seq) ordering key, map-side partial, one shuffle of
  *     one candidate row per key per map task.
  *   - DELETE tombstones are RETAINED in the snapshot (filtered by the
  *     read view). Dropping them would let a late out-of-order change
  *     resurrect a deleted key; with the tombstone in place the merge's
  *     max_by keeps the delete as the winner. Tombstone GC (dropping
  *     tombstones older than the source's max lateness) is a separate
  *     maintenance pass, deliberately not run inside the hot merge.
  *   - Crash semantics: dynamic partition overwrite is not atomic
  *     across buckets, but the merge is IDEMPOTENT — re-running a batch
  *     over a half-written snapshot converges to the same state
  *     (max_by of a set is insensitive to duplicates), so a restarted
  *     micro-batch (at-least-once foreachBatch) heals itself.
  *
  * Changes schema: key, ts, seq (unique per change), op ('d' = delete),
  * plus payload columns carried verbatim.
  */
object Compaction {

  val BucketCol = "bucket"

  /** Merge one batch of changes into the snapshot at `dir`.
    *
    * @param changes  key/ts/seq/op + payload columns
    * @param keyCol   the snapshot key
    * @param nBuckets partition-directory fan-out of the snapshot
    */
  def mergeBatch(changes: DataFrame, dir: String, keyCol: String,
      nBuckets: Int = 16): Unit = {
    val spark = changes.sparkSession
    val cols = changes.columns
    require(Seq("ts", "seq", "op").forall(cols.contains),
      s"changes need ts/seq/op columns, got ${cols.mkString(",")}")

    val batch = changes.withColumn(BucketCol, pmod(hash(col(keyCol)), lit(nBuckets)))
    // compact the batch FIRST: the snapshot merge then joins one row
    // per touched key, not one per change
    val compactBatch = compact(batch, keyCol)

    val existing: DataFrame = {
      val d = new java.io.File(dir)
      if (d.exists() && d.listFiles() != null && d.listFiles().exists(_.getName.startsWith(BucketCol)))
        Some(spark.read.parquet(dir)) else None
    } match {
      case Some(snap) =>
        // partition-pruned: only buckets this batch touches are read.
        // The bucket list is tiny (<= nBuckets) — collecting it is a
        // metadata-sized action, not a data collect.
        val touched = compactBatch.select(BucketCol).distinct()
          .collect().map(_.getInt(0))
        snap.filter(col(BucketCol).isin(touched.toSeq: _*))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], compactBatch.schema)
    }

    val merged = compact(existing.unionByName(compactBatch), keyCol)

    // dynamic mode overwrites ONLY the partition dirs present in
    // `merged` = the touched buckets; untouched buckets keep their files
    merged
      .repartition(col(BucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(dir)
  }

  /** cdc08's aggregation shape: latest change per key by (ts, seq);
    * tombstones ('d') are kept — see class doc.
    */
  def compact(changes: DataFrame, keyCol: String): DataFrame = {
    val ord = struct(col("ts"), col("seq"))
    val payload = changes.columns.filterNot(c => c == keyCol || c == BucketCol)
    changes
      .groupBy(col(keyCol), col(BucketCol))
      .agg(max_by(col(payload.head), ord).as(payload.head),
        payload.tail.map(c => max_by(col(c), ord).as(c)): _*)
      .select(changes.columns.map(col): _*) // restore original column order
  }

  /** The consumer-facing view: the snapshot without tombstones. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).filter(col("op") =!= "d").drop(BucketCol)

  /** Tombstone GC — the maintenance pass the hot merge deliberately
    * skips: drop delete tombstones with ts < `cutoff`. `cutoff` must be
    * at most (now − the source's max lateness): a tombstone younger
    * than the lateness bound still guards against a straggler update
    * resurrecting its key; one older than it can no longer be outraced
    * and is dead weight in every merge read.
    *
    * Only buckets holding an expired tombstone are rewritten (same
    * dynamic-overwrite pattern as the merge). A bucket whose rows ALL
    * expire produces no output partition for dynamic overwrite to
    * replace, so its directory is removed explicitly.
    */
  def gcTombstones(spark: org.apache.spark.sql.SparkSession, dir: String,
      cutoff: java.sql.Timestamp): Unit = {
    val snap = spark.read.parquet(dir)
    val expired = col("op") === "d" && col("ts") < lit(cutoff)
    val touched = snap.filter(expired).select(BucketCol).distinct()
      .collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val survivors = snap
      .filter(col(BucketCol).isin(touched.toSeq: _*)).filter(!expired)
      .persist() // two actions below: the bucket census and the write
    try {
      val surviving = survivors.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      survivors
        .repartition(col(BucketCol))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BucketCol)
        .parquet(dir)
      for (b <- touched if !surviving.contains(b)) {
        val gone = new java.io.File(dir, s"$BucketCol=$b")
        gone.listFiles() match {
          case null  => ()
          case files => files.foreach(_.delete()); gone.delete(); ()
        }
      }
    } finally { survivors.unpersist(); () }
  }
}

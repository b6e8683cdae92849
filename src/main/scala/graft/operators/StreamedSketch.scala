package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMED accretion for the temporal sketch-partial store — the
  * persistence story sk06/sk07/sk08's docs argue from but (until r17)
  * no query actually exercised: "persist daily partials, merge at
  * query time, the SAME store answers 7/28/90-day windows" is only
  * true if the partials genuinely live on disk and new days land
  * WITHOUT recomputing old ones. Every other persisted artifact
  * already accretes (fingerprints → [[StreamedDedup]],
  * manifests/ledger → [[StreamedPipeline]], snapshots → Compaction,
  * the ANN index → [[StreamedIndex]]); this closes the sketch family.
  *
  * Store layout: `daily/batch_id=N/` holding `(day, v, n)` — sk07's
  * EXACT value-grain histogram partial (value in integer cents,
  * count), the mergeable statistic behind windowed quantiles AND
  * windowed totals. The partial is exact, so every serve off the
  * store is exact — no sketch-internal bytes cross the oracle
  * boundary (the sk06 HLL-binary caveat never arises).
  *
  * Batch protocol — [[StreamedDedup]]'s replay-idempotent discipline
  * with the admission grain moved from fingerprint to DAY (the unit a
  * telemetry drop directory actually delivers):
  *
  *   1. read the store EXCLUDING this batch's own partition (a
  *      restarted batch must not gate on its own partial write);
  *   2. keep only DAYS the store does not already hold — an
  *      at-least-once re-delivery of a day's file in a later batch
  *      adds nothing (day-grain idempotency; a day's partial is
  *      computed from the delivered day exactly once, the
  *      compute-once contract of a partition-per-day lake layout);
  *   3. aggregate the fresh days to `(day, v, n)` — one map-side
  *      combining pass over the batch only;
  *   4. overwrite `daily/batch_id=N`.
  *
  * Reads go through [[readStore]], which collapses byte-identical
  * `(day, v, n)` duplicates an INTERRUPTED compaction can leave
  * (the [[StreamedIndex.compactStore]] argument: on a healthy store
  * `(day, v)` is unique across partitions by the day-grain admission,
  * so dropDuplicates is a no-op; after a crash mid-compaction any
  * survivor row is THE row, and a compaction re-run converges).
  *
  * Scale: per batch the only non-broadcast frames are the batch
  * itself and the store's one-column day projection for the
  * admission anti-join; the partial aggregate is batch-sized. Serves
  * (sk09) read `(day, v, n)` — days x distinct-values rows, KB-scale
  * regardless of fact volume — and NEVER the raw events.
  */
object StreamedSketch {

  /** Bootstrap partials land under `batch_id=-1` ([[StreamedDedup.SeedBatchId]]'s discipline). */
  val SeedBatchId: Long = -1L

  /** sk07's value-grain daily partial, factored — ONE definition for
    * the seed build, every accretion batch, and the spec's inline
    * twin, so the store can never drift from the inline statistic.
    */
  def partials(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v"))
      .groupBy("day", "v").agg(count(lit(1)).as("n"))

  /** One-time bootstrap: the seed corpus' daily partials under [[SeedBatchId]]. */
  def seed(s: SparkSession, events: DataFrame, storeDir: String): Unit =
    partials(events)
      .write.mode("overwrite").parquet(s"$storeDir/daily/batch_id=$SeedBatchId")

  /** The accreted partial store `(day, v, n)`, excluding
    * `excludeBatch`'s own partition (batch protocol step 1) and
    * collapsing interrupted-compaction duplicates (see object doc).
    */
  def readStore(s: SparkSession, storeDir: String,
      excludeBatch: Long = Long.MinValue): DataFrame =
    s.read.option("basePath", s"$storeDir/daily")
      .parquet(s"$storeDir/daily/batch_id=*")
      .filter(col("batch_id") =!= excludeBatch)
      .dropDuplicates("day", "v")
      .select("day", "v", "n")

  /** One micro-batch of accretion (`batch` = raw event rows with at
    * least `ts`/`value`). Public so the spec drives replay and
    * idempotency directly — the foreachBatch body IS this function.
    */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val s = batch.sparkSession
    val inc = Materialize(batch.select(col("ts"), col("value"))
      .withColumn("day", to_date(col("ts"))))
    val held = readStore(s, storeDir, excludeBatch = batchId)
      .select("day").distinct()
    // day-grain admission: only days the store does not already hold
    val fresh = inc.join(held, Seq("day"), "left_anti")
    partials(fresh.select("ts", "value"))
      .write.mode("overwrite").parquet(s"$storeDir/daily/batch_id=$batchId")
  }

  /** Maintenance compaction — [[StreamedIndex.compactStore]]'s
    * write-then-prune on the partial table: fold the batch-partition
    * forest into ONE `batch_id=<compactionId>` partition (negative
    * id, never a live batch), then prune. Same maintenance-window +
    * crashed-uncommitted-batch contract as the other stores.
    */
  def compactStore(s: SparkSession, storeDir: String, compactionId: Long,
      checkpointDir: Option[String] = None): Unit = {
    require(compactionId < 0 && compactionId != SeedBatchId,
      s"compactionId must be negative and != $SeedBatchId (got $compactionId)")
    checkpointDir.flatMap(StreamedDedup.uncommittedBatch(s, _)).foreach { b =>
      throw new IllegalStateException(
        s"refusing to compact $storeDir: streaming checkpoint shows batch $b " +
          "started but not committed — it will replay on restart and its " +
          "own-partition exclusion needs the uncompacted layout.")
    }
    readStore(s, storeDir)
      .write.mode("overwrite").parquet(s"$storeDir/daily/batch_id=$compactionId")
    StreamedDedup.pruneOtherPartitions(s, Seq(s"$storeDir/daily"), compactionId)
  }

  /** Run the continuous accretion job over a parquet drop directory of
    * raw event rows (the day-partitioned telemetry landing zone).
    */
  def run(s: SparkSession, incomingDir: String, storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = "ts TIMESTAMP, value DOUBLE"
    s.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}

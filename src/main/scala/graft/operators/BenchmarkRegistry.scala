package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BENCHMARK-REGISTRY store — decontamination's missing lifecycle
  * (r19): dc01–dc06 audit a corpus against the benchmark set that
  * exists at audit time, but production eval suites are not static —
  * new benchmark releases land MONTHS after a corpus shipped
  * (retroactive contamination), and releases get retracted (a leaked
  * or deprecated eval must stop purging training docs). The registry
  * is the persisted artifact that makes both events delta-sized
  * instead of full re-audits.
  *
  * Store layout (the StreamedDedup/StreamedIndex partition discipline
  * — every write lands in a deterministic `batch_id=` subdirectory
  * with mode=overwrite, so at-least-once re-delivery is byte-stable):
  *
  *   - `rare/`                 — `(g)`: the corpus rarity statistic
  *     (df <= [[Dedup.DfCap]] over the corpus given at [[create]]),
  *     FROZEN at registry creation — dc01's standing-index trade
  *     (documented at `Decontam.benchmarkIndex`): rarity is a corpus
  *     property, recomputed only on major corpus releases, never per
  *     benchmark release.
  *   - `index/batch_id=N/`     — `(test_doc, g)`: release N's
  *     df-capped rare-shingle postings (the probe-able contamination
  *     index, one partition per release).
  *   - `flags/batch_id=N/`     — `(train_doc, test_doc, n_shared)`:
  *     the FULL flagged-pair set of the retroactive audit against
  *     release N. The ledger deliberately stores the un-deduplicated
  *     full set — novelty ("which docs does release N newly taint")
  *     is a READ-side view ([[novelFlags]]), so a later retraction of
  *     an older release composes correctly: the live purge list is
  *     the union of live releases' full evidence, with nothing lost
  *     to audit-time suppression.
  *   - `tombs/batch_id=M/`     — `(release_batch)`: retracted release
  *     ids. Logical delete at read time ([[readIndex]]/[[readFlags]]
  *     anti-join on the release id); [[compact]] makes it physical.
  *
  * Scale (100 TB stance): a release accretion joins the eval-sized
  * release postings (broadcast) against the streamed `rare/` table —
  * zero corpus work. A retroactive audit is ONE corpus-shingle pass
  * joined map-side against the broadcast new-release index (dc01's
  * asymmetry), i.e. delta work per release instead of re-auditing the
  * whole registry; its output is eval-coverage-bounded. Retraction is
  * a request-sized tombstone write — the corpus is never touched.
  * Partitions are RELEASE-grain (dozens over a registry's life, not
  * thousands of trigger batches), so compaction's job is physical
  * deletion of retracted partitions, not small-file folding.
  */
object BenchmarkRegistry {

  /** The first release lands under `batch_id=-1`, keeping the
    * partition column a clean LONG (the StreamedDedup convention).
    */
  val SeedBatchId: Long = -1L

  /** Create the registry: freeze the corpus rarity statistic. The df
    * universe is the FULL document set the caller passes (dc01 counts
    * df over train and held-out docs alike) — rebuild on major corpus
    * releases, per the standing-index trade.
    */
  def create(s: SparkSession, corpusDocs: DataFrame, storeDir: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    corpusDocs
      .select(explode(expr("graft_shingles(text)")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.DfCap).select("g")
      .write.mode("overwrite").parquet(s"$storeDir/rare")
  }

  /** The frozen rare-shingle set `(g)`. */
  def readRare(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(s"$storeDir/rare")

  /** Admit one benchmark release: its df-capped postings land under
    * `index/batch_id=N`. The release side is eval-sized by
    * construction, so it broadcasts and the vocabulary-scale `rare/`
    * table streams map-side — zero shuffle, zero corpus work.
    */
  def accreteRelease(s: SparkSession, releaseDocs: DataFrame,
      batchId: Long, storeDir: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    val rel = releaseDocs.select(col("doc_id").as("test_doc"),
      explode(expr("graft_shingles(text)")).as("g"))
    readRare(s, storeDir).join(broadcast(rel), "g")
      .select("test_doc", "g")
      .write.mode("overwrite").parquet(s"$storeDir/index/batch_id=$batchId")
  }

  /** The registry's contamination index `(test_doc, g, batch_id)`.
    * With `applyTombstones` the LIVE view is served: retracted
    * releases' postings leave via an anti-join on the release id (a
    * release-count-sized set — broadcast by nature).
    */
  def readIndex(s: SparkSession, storeDir: String,
      excludeBatch: Long = Long.MinValue,
      applyTombstones: Boolean = false): DataFrame = {
    val idx = s.read.option("basePath", s"$storeDir/index")
      .parquet(s"$storeDir/index/batch_id=*")
      .filter(col("batch_id") =!= excludeBatch)
      .select(col("test_doc"), col("g"), col("batch_id").cast("bigint").as("batch_id"))
    if (!applyTombstones) idx
    else idx.join(broadcast(readTombstones(s, storeDir)
        .withColumnRenamed("release_batch", "batch_id")),
      Seq("batch_id"), "left_anti")
  }

  /** The retroactive audit for release `batchId`: the full flagged
    * pair set of `trainDocs` against THIS release's index only —
    * [[Decontam.flaggedPairsAgainstIndex]], the same factored core
    * the batch decontam pipeline probes with. One corpus pass joined
    * map-side against the broadcast release index; everything
    * downstream is pair-grain. Replay-idempotent: the write is the
    * batch's own partition, mode=overwrite.
    */
  def retroAudit(s: SparkSession, trainDocs: DataFrame,
      batchId: Long, storeDir: String): Unit = {
    val idx = readIndex(s, storeDir, excludeBatch = Long.MinValue)
      .filter(col("batch_id") === batchId).select("test_doc", "g")
    Decontam.flaggedPairsAgainstIndex(s, trainDocs, idx)
      .write.mode("overwrite").parquet(s"$storeDir/flags/batch_id=$batchId")
  }

  /** The audit ledger `(train_doc, test_doc, n_shared, batch_id)`.
    * Live view drops retracted releases' evidence (anti-join on the
    * release-count-sized tombstone set).
    */
  def readFlags(s: SparkSession, storeDir: String,
      excludeBatch: Long = Long.MinValue,
      applyTombstones: Boolean = false): DataFrame = {
    val f = s.read.option("basePath", s"$storeDir/flags")
      .parquet(s"$storeDir/flags/batch_id=*")
      .filter(col("batch_id") =!= excludeBatch)
      .select(col("train_doc"), col("test_doc"), col("n_shared"),
        col("batch_id").cast("bigint").as("batch_id"))
    if (!applyTombstones) f
    else f.join(broadcast(readTombstones(s, storeDir)
        .withColumnRenamed("release_batch", "batch_id")),
      Seq("batch_id"), "left_anti")
  }

  /** Release `batchId`'s NOVEL flags — the incremental purge list the
    * retroactive audit exists to produce: its ledger pairs restricted
    * to train docs no EARLIER release (smaller batch_id, retracted or
    * not — novelty is an audit-time fact, deterministic under later
    * retraction while the prior ledgers still exist; once [[compact]]
    * physically deletes a retracted release's ledger, this view
    * converges to novelty-vs-live-evidence, the documented trade) had
    * flagged. The anti-join's right side is the standing flagged-doc
    * set, which is corpus-proportional in the worst case (sf0.1: ~18%
    * of train docs) — deliberately NOT a broadcast; the pair-set-sized
    * left side makes the shuffle cheap.
    */
  def novelFlags(s: SparkSession, storeDir: String, batchId: Long): DataFrame = {
    val f = readFlags(s, storeDir)
    val prior = f.filter(col("batch_id") < batchId)
      .select("train_doc").distinct()
    f.filter(col("batch_id") === batchId)
      .join(prior, Seq("train_doc"), "left_anti")
      .select("train_doc", "test_doc", "n_shared")
  }

  /** Retract releases (leaked eval, deprecated suite): their ids land
    * under a deterministic `tombs/batch_id=M` partition —
    * mode=overwrite, replayed requests byte-stable; retracting a
    * release the registry never admitted is a structural no-op.
    */
  def retract(s: SparkSession, releaseBatchIds: Seq[Long],
      tombBatch: Long, storeDir: String): Unit = {
    import s.implicits._
    releaseBatchIds.distinct.toDF("release_batch")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$tombBatch")
  }

  /** The accumulated retraction set `(release_batch)` — empty (not an
    * error) when no retraction ever landed; a MISSING store fails
    * loudly (the ADVICE r18 discipline, via
    * [[StreamedDedup.hasBatchPartitions]]).
    */
  def readTombstones(s: SparkSession, storeDir: String): DataFrame =
    if (!StreamedDedup.hasBatchPartitions(s, storeDir, s"$storeDir/tombs"))
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("release_batch BIGINT"))
    else
      s.read.option("basePath", s"$storeDir/tombs")
        .parquet(s"$storeDir/tombs/batch_id=*")
        .select("release_batch").distinct()

  /** Make retraction physical: delete the retracted releases' `index/`
    * and `flags/` partitions and clear consumed tombstones. Crash-safe
    * by DELETE-THEN-CLEAR: a crash between the partition deletes and
    * the tomb clear re-deletes already-missing partitions (a no-op)
    * rather than resurrecting them. No fold step — partitions are
    * release-grain (dozens over a registry's life), so the small-files
    * pathology the StreamedDedup compactor folds away cannot arise;
    * live partitions keep their release attribution, which
    * [[novelFlags]] and [[readFlags]] need.
    *
    * `compactionId` must be <= -2: never a real release id (releases
    * are seed -1 or non-negative), so an interrupted run can be
    * re-run with the same id and converge.
    */
  def compact(s: SparkSession, storeDir: String, compactionId: Long,
      checkpointDir: Option[String] = None): Unit = {
    require(compactionId <= -2,
      s"compactionId must be <= -2 (got $compactionId) — release ids are " +
        s"$SeedBatchId or non-negative")
    // when a pipeline serves this registry snapshot-isolated
    // (StreamedPipeline registry mode), a replay-pending batch's
    // recorded release set may name partitions this pass would
    // physically delete — same maintenance-window contract as the
    // pipeline's own store compaction
    checkpointDir.flatMap(StreamedDedup.uncommittedBatch(s, _)).foreach { b =>
      throw new IllegalStateException(
        s"refusing to compact registry $storeDir: a consuming pipeline's " +
          s"checkpoint shows batch $b started but not committed — its " +
          "recorded benchmark-release snapshot may name partitions this " +
          "pass deletes. Resume the stream to completion first.")
    }
    val retracted = readTombstones(s, storeDir)
      .collect().map(_.getLong(0))
    val conf = s.sparkContext.hadoopConfiguration
    for (rb <- retracted; table <- Seq("index", "flags")) {
      val p = new org.apache.hadoop.fs.Path(s"$storeDir/$table/batch_id=$rb")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    if (StreamedDedup.hasBatchPartitions(s, storeDir, s"$storeDir/tombs")) {
      readTombstones(s, storeDir).limit(0)
        .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$compactionId")
      StreamedDedup.pruneOtherPartitions(
        s, Seq(s"$storeDir/tombs"), compactionId)
    }
  }
}

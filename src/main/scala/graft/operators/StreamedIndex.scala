package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMED incremental ANN-index accretion (VERDICT r16 #1) — the
  * continuous form of ss18/ss19's serving index: production vector
  * stores ingest embeddings continuously, but `IvfIndexStore` builds
  * qset/seeds/assign/pqidx once per (application, dir) and any new
  * vector forces a full rebuild. This closes the last gap in "every
  * persisted artifact has an incremental + compaction story"
  * (fingerprints → [[StreamedDedup]], manifests/ledger →
  * [[StreamedPipeline]], snapshots → Compaction — now the index).
  *
  * Store layout:
  *
  *   - `seeds/`              — `(code, qs)`: the 4 coarse cells,
  *     FROZEN at seed time. Production semantics: the coarse
  *     quantizer and PQ codebooks are trained once on the bootstrap
  *     corpus; later vectors are ENCODED against the frozen artifact
  *     (re-training would silently re-key every stored code —
  *     that is a rebuild, not an accretion).
  *   - `assign/batch_id=N/`  — `(vec_id, cell, qe)`: coarse cell
  *     assignment with the full vector (the rerank side).
  *   - `pqidx/batch_id=N/`   — `(vec_id, sub, code)`: the PQ codes
  *     (the ADC scoring side).
  *
  * Both encode passes are [[Similarity.encodeAssign]] /
  * [[Similarity.encodePq]] — the EXACT functions the one-shot
  * `IvfIndexStore` build runs, so an accreted index is row-identical
  * to a rebuild against the same seeds by construction (spec-pinned).
  *
  * Batch protocol, replay-idempotent by [[StreamedDedup]]'s
  * discipline (deterministic `batch_id=N` partitions, mode=overwrite,
  * read-excluding-own-batch, growth bounded by an anti-join):
  *
  *   1. read `assign` EXCLUDING this batch's own partition — a
  *      restarted batch that crashed after its append must not
  *      anti-join against its own partial write;
  *   2. keep only vec_ids the index does not already hold (an
  *      at-least-once re-delivery of a vector in a LATER batch adds
  *      nothing — the index is vector-grain, like the fingerprint
  *      store is fingerprint-grain);
  *   3. encode the fresh vectors against the broadcast frozen seeds
  *      (map-side argmin + 8 subspace argmins — NO corpus-side work:
  *      accretion cost is batch-sized, the whole point);
  *   4. overwrite `assign/batch_id=N` and `pqidx/batch_id=N`.
  *
  * Scale: per batch the only non-broadcast frames are the batch
  * itself and the vec_id-projected store read for the anti-join
  * (columnar, one LONG column); encode is map-side against k-row
  * broadcasts. Serving (ss20) reads the accreted store exactly as
  * ss18 reads the rebuilt one. At 100 TB the store gets
  * [[compactStore]]'s treatment — same write-then-prune,
  * maintenance-window and crashed-batch contract as the dedup store.
  */
object StreamedIndex {

  /** The bootstrap corpus lands under `batch_id=-1` (clean LONG
    * partition column, [[StreamedDedup.SeedBatchId]]'s discipline).
    */
  val SeedBatchId: Long = -1L

  /** One-time bootstrap: freeze the 4 md5-coarse seeds from the seed
    * corpus `(vec_id, qe)` and encode it under [[SeedBatchId]].
    */
  def seed(s: SparkSession, corpus: DataFrame, storeDir: String): Unit = {
    Similarity.mdSeeds(corpus, 4)
      .write.mode("overwrite").parquet(s"$storeDir/seeds")
    val seeds = s.read.parquet(s"$storeDir/seeds")
    Similarity.encodeAssign(corpus, seeds)
      .write.mode("overwrite").parquet(s"$storeDir/assign/batch_id=$SeedBatchId")
    Similarity.encodePq(corpus, seeds)
      .write.mode("overwrite").parquet(s"$storeDir/pqidx/batch_id=$SeedBatchId")
  }

  /** The accreted index as (assign, pqidx) frames, excluding
    * `excludeBatch`'s own partitions (batch protocol step 1). With
    * `applyTombstones` the LIVE view is served: both tables anti-join
    * the tombstone set (drop-sized — a deletion batch, not the
    * corpus), the logical-delete form every vector store runs between
    * compactions (r18, ss24: deletion requests — GDPR erasure, content
    * takedowns — cannot wait for a maintenance window, and re-encoding
    * the corpus to remove rows is exactly the rebuild accretion
    * avoids). [[compactStore]] makes the deletion PHYSICAL and clears
    * the consumed tombstones.
    */
  def readIndex(s: SparkSession, storeDir: String,
      excludeBatch: Long = Long.MinValue,
      applyTombstones: Boolean = false): (DataFrame, DataFrame) = {
    def part(table: String, cols: Seq[String]): DataFrame =
      s.read.option("basePath", s"$storeDir/$table")
        .parquet(s"$storeDir/$table/batch_id=*")
        .filter(col("batch_id") =!= excludeBatch)
        .select(cols.map(col): _*)
    val (a0, p0) = (part("assign", Seq("vec_id", "cell", "qe")),
      part("pqidx", Seq("vec_id", "sub", "code")))
    if (!applyTombstones) (a0, p0)
    else {
      val t = readTombstones(s, storeDir)
      (a0.join(t, Seq("vec_id"), "left_anti"),
        p0.join(t, Seq("vec_id"), "left_anti"))
    }
  }

  /** One deletion batch: tombstone the given vec_ids under a
    * deterministic `tombs/batch_id=N` partition (mode=overwrite, so a
    * replayed delete is byte-stable — the same idempotency contract
    * as accretion). Deleting a vector the index never held is a
    * no-op by construction (the anti-join finds nothing to drop).
    */
  def deleteBatch(vecIds: DataFrame, batchId: Long, storeDir: String): Unit =
    vecIds.select("vec_id").distinct()
      .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$batchId")

  /** The accumulated tombstone set `(vec_id)` — empty (not an error)
    * when no deletion batch has ever landed.
    */
  def readTombstones(s: SparkSession, storeDir: String): DataFrame = {
    // ADVICE r18: probe through Hadoop FileSystem with the parent
    // store required to exist — an unlistable path (remote URI,
    // permission failure, typo) must fail loudly, not serve the full
    // index as if nothing were deleted
    val hasParts =
      StreamedDedup.hasBatchPartitions(s, storeDir, s"$storeDir/tombs")
    if (!hasParts)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("vec_id BIGINT"))
    else
      s.read.option("basePath", s"$storeDir/tombs")
        .parquet(s"$storeDir/tombs/batch_id=*")
        .select("vec_id").distinct()
  }

  /** One micro-batch of accretion (`batch` = `(vec_id, qe)` quantized
    * vectors). Public so the spec can drive replay/idempotency
    * directly — the foreachBatch body IS this function.
    */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val s = batch.sparkSession
    val inc = Materialize(batch.select("vec_id", "qe"))
    val (assign, _) = readIndex(s, storeDir, excludeBatch = batchId)
    val seeds = s.read.parquet(s"$storeDir/seeds")
    // growth bound: only vectors the index does not already hold —
    // the anti-join probes a one-column projection of the store
    val fresh = Materialize(
      inc.join(assign.select("vec_id"), Seq("vec_id"), "left_anti"))
    Similarity.encodeAssign(fresh, seeds)
      .write.mode("overwrite").parquet(s"$storeDir/assign/batch_id=$batchId")
    Similarity.encodePq(fresh, seeds)
      .write.mode("overwrite").parquet(s"$storeDir/pqidx/batch_id=$batchId")
  }

  /** Maintenance compaction — [[StreamedDedup.compactStore]]'s
    * write-then-prune applied to the index tables: fold the per-batch
    * partition forest into ONE `batch_id=<compactionId>` partition per
    * table (negative id: never collides with live batches, distinct
    * from [[SeedBatchId]]), then prune the rest. Row collapse is
    * vec-grain dropDuplicates — a no-op on a healthy store (vec_ids
    * unique across partitions by the accretion anti-join; duplicate
    * rows an interrupted prior compaction leaves are byte-identical
    * encodes of the same vector, so any survivor is THE row). Same
    * maintenance-window + crashed-uncommitted-batch contract as the
    * dedup store; pass `checkpointDir` to enforce it.
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
    // the fold serves the LIVE view: tombstoned rows are PHYSICALLY
    // removed here (the logical deletes readIndex applies between
    // windows become storage reclamation), and the consumed tombstones
    // are cleared — an empty tombs partition replaces the forest, so a
    // crash between the fold and the tomb prune re-deletes already-
    // removed rows (a no-op) rather than resurrecting them
    val (assign, pqidx) = readIndex(s, storeDir, applyTombstones = true)
    assign.dropDuplicates("vec_id")
      .write.mode("overwrite").parquet(s"$storeDir/assign/batch_id=$compactionId")
    pqidx.dropDuplicates("vec_id", "sub")
      .write.mode("overwrite").parquet(s"$storeDir/pqidx/batch_id=$compactionId")
    StreamedDedup.pruneOtherPartitions(
      s, Seq(s"$storeDir/assign", s"$storeDir/pqidx"), compactionId)
    if (StreamedDedup.hasBatchPartitions(s, storeDir, s"$storeDir/tombs")) {
      readTombstones(s, storeDir).limit(0)
        .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$compactionId")
      StreamedDedup.pruneOtherPartitions(s, Seq(s"$storeDir/tombs"), compactionId)
    }
  }

  /** Run the continuous accretion job over a parquet drop directory of
    * raw `(vec_id, embedding)` rows — quantized at the door with
    * [[Similarity.quantizeVectors]] (qemb's arithmetic, one
    * definition).
    */
  def run(s: SparkSession, incomingDir: String, storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    s.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(Similarity.quantizeVectors(batch), batchId, storeDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}

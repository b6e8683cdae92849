package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMED incremental ingestion dedup (VERDICT r13 #5) — the
  * continuous form of dd12: production corpora ingest drops
  * continuously, so the verdict pass runs inside `foreachBatch`
  * against a PERSISTED corpus fingerprint store that each micro-batch
  * updates. Completes the streamed-audit pattern (archive, dead
  * letters, drift, snapshot — now dedup).
  *
  * Store layout (the two persisted artifacts dd12's doc names):
  *
  *   - `store/exact/batch_id=N/`    — `(fp, cid)`: md5 text
  *     fingerprint → min admitted holder. One row per DISTINCT text
  *     ever admitted: each batch appends only fingerprints not already
  *     present (anti-join), so store growth is bounded by distinct
  *     fingerprints, not ingest volume.
  *   - `store/shingles/batch_id=N/` — `(doc_id, g)`: the df-capped
  *     index's raw postings for admitted docs (`graft_shingles`
  *     dedups within doc).
  *
  * Batch protocol, replay-idempotent by construction (the
  * DeadLetterSink/Compaction discipline — every write lands in the
  * batch's OWN deterministic `batch_id=` subdirectory with
  * mode=overwrite, so an at-least-once re-delivery REPLACES identical
  * content instead of appending a duplicate):
  *
  *   1. read the store EXCLUDING this batch's own partitions — a
  *      restarted batch that crashed after its store append must not
  *      verdict its own docs against themselves;
  *   2. verdict the batch with [[Dedup.verdictsAgainstStore]] — the
  *      SAME factored core the dd12 batch query runs, so streamed and
  *      batch semantics cannot drift;
  *   3. write verdicts to `out/batch_id=N`;
  *   4. admit verdict='new' docs into both store tables (duplicates
  *      carry no new content — the store indexes distinct text only).
  *
  * Scale: per batch, every join's probe side is batch-sized (dd12's
  * asymmetry), the store reads are columnar scans of fingerprint-grain
  * tables, and the append writes are batch-sized. At 100 TB the store
  * tables get the Compaction treatment (bucketed dirs + periodic
  * small-file compaction); the per-batch protocol is unchanged.
  */
object StreamedDedup {

  /** Seed partition id: the pre-existing corpus lands under
    * `batch_id=-1`, keeping the partition column a clean LONG.
    */
  val SeedBatchId: Long = -1L

  /** Build the store from an existing corpus — the one-time backfill
    * before streaming starts.
    */
  def seed(s: SparkSession, corpus: DataFrame, storeDir: String): Unit = {
    Dedup.corpusExact(corpus)
      .write.mode("overwrite").parquet(s"$storeDir/exact/batch_id=$SeedBatchId")
    Dedup.corpusPostings(s, corpus)
      .write.mode("overwrite").parquet(s"$storeDir/shingles/batch_id=$SeedBatchId")
  }

  /** The store as (exact, postings) frames, excluding `excludeBatch`'s
    * own partitions (see the batch protocol above).
    */
  def readStore(s: SparkSession, storeDir: String,
      excludeBatch: Long): (DataFrame, DataFrame) = {
    def part(table: String, cols: Seq[String]): DataFrame =
      s.read.option("basePath", s"$storeDir/$table")
        .parquet(s"$storeDir/$table/batch_id=*")
        .filter(col("batch_id") =!= excludeBatch)
        .select(cols.map(col): _*)
    (part("exact", Seq("fp", "cid")), part("shingles", Seq("doc_id", "g")))
  }

  /** One micro-batch: verdict + store accretion. Public so the spec
    * can drive replay/idempotency directly (the foreachBatch body IS
    * this function).
    */
  def processBatch(batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val inc = Materialize(batch.select("doc_id", "text"))
    val (exact, postings) = readStore(s, storeDir, batchId)
    val verdicts = Materialize(
      Dedup.verdictsAgainstStore(s, inc, exact, postings))
    verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    val admitted = inc.join(
      verdicts.filter(col("verdict") === "new").select("doc_id"),
      Seq("doc_id"), "left_semi")
    // growth bound: only fingerprints the store does not already hold
    Dedup.corpusExact(admitted)
      .join(exact, Seq("fp"), "left_anti")
      .write.mode("overwrite").parquet(s"$storeDir/exact/batch_id=$batchId")
    Dedup.corpusPostings(s, admitted)
      .write.mode("overwrite").parquet(s"$storeDir/shingles/batch_id=$batchId")
  }

  /** Maintenance compaction — the "Compaction treatment" the scale
    * note above promises, implemented (r16): a long-running stream
    * leaves one store partition per admitting batch (at production
    * trigger rates, thousands of directories of small files — the
    * small-files problem, and a per-batch listing cost that grows
    * with stream age); this pass folds the whole forest into ONE
    * compacted partition per table. Readers are untouched: readStore
    * globs `batch_id=*`, so verdicts before/after compaction are
    * row-identical (spec-pinned).
    *
    * Contract: runs in a maintenance window (no trigger in flight),
    * with a caller-chosen NEGATIVE `compactionId` (negative ids can
    * never collide with foreachBatch's non-negative batch ids;
    * distinct from [[SeedBatchId]] so an interrupted run never
    * overwrites the only surviving copy in place). Crash-safe by
    * WRITE-THEN-PRUNE:
    *
    *  1. the full collapsed row set — exact at fp-grain min-holder,
    *     postings distinct; both collapses are no-ops on a healthy
    *     store's content (fps unique by the accretion anti-join,
    *     postings distinct by construction) and absorb the duplicates
    *     an interrupted prior compaction leaves — lands in
    *     `batch_id=<compactionId>` with mode=overwrite;
    *  2. every OTHER partition is deleted (Hadoop FileSystem, so the
    *     same code prunes HDFS/object-store paths on a cluster).
    *
    * A crash between 1 and 2 leaves duplicate rows visible, which the
    * near-dup verdict would miscount (duplicate postings inflate df
    * and shared counts) — hence the window contract: an interrupted
    * compaction is RE-RUN (same id — it converges) before the stream
    * resumes. StreamedDedupSpec pins verdict equivalence across a
    * mid-stream compaction, content identity, single-partition
    * layout, and convergence from a simulated interrupted run.
    *
    * "No trigger in flight" also covers the CRASHED-batch case (ADVICE
    * r16): a stream that died after batch N's store append but BEFORE
    * its checkpoint commit will REPLAY batch N on restart, and its
    * protocol step 1 (`readStore(excludeBatch = N)`) only works while
    * N's rows still live under `batch_id=N` — compacting first folds
    * them into `batch_id=<compactionId>`, the replayed batch verdicts
    * its own docs against themselves (new → exact_dup), and ledger
    * readers filtering `batch_id < N` double-see its admissions. So
    * "fully committed", not merely "not running", is the precondition.
    * Pass `checkpointDir` to ENFORCE it: compaction refuses while the
    * streaming checkpoint shows a started-but-uncommitted batch
    * (offsets/ ahead of commits/ — exactly the replay-pending state).
    */
  def compactStore(s: SparkSession, storeDir: String, compactionId: Long,
      checkpointDir: Option[String] = None): Unit = {
    require(compactionId < 0 && compactionId != SeedBatchId,
      s"compactionId must be negative and != $SeedBatchId (got $compactionId)")
    checkpointDir.flatMap(uncommittedBatch(s, _)).foreach { b =>
      throw new IllegalStateException(
        s"refusing to compact $storeDir: streaming checkpoint shows batch $b " +
          "started but not committed — it will replay on restart, and its " +
          "own-partition exclusion needs the uncompacted batch_id layout. " +
          "Resume the stream to completion (or re-run the interrupted " +
          "compaction id) first.")
    }
    val (exact, postings) = readStore(s, storeDir, excludeBatch = Long.MinValue)
    exact.groupBy("fp").agg(min(col("cid")).as("cid"))
      .write.mode("overwrite").parquet(s"$storeDir/exact/batch_id=$compactionId")
    postings.distinct()
      .write.mode("overwrite").parquet(s"$storeDir/shingles/batch_id=$compactionId")
    pruneOtherPartitions(s, Seq(s"$storeDir/exact", s"$storeDir/shingles"), compactionId)
  }

  /** The replay-pending probe behind [[compactStore]]'s checkpoint
    * guard: a batch id that appears in the checkpoint's `offsets/`
    * (started) with no matching `commits/` entry (committed). Spark's
    * microbatch engine writes offsets before running a batch and
    * commits after — a gap between the two maxima IS the
    * crashed-uncommitted state that will replay on restart. Shared
    * with StreamedPipeline/StreamedIndex compaction (same contract).
    */
  private[operators] def uncommittedBatch(
      s: SparkSession, checkpointDir: String): Option[Long] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = root.getFileSystem(conf)
    def maxId(sub: String): Option[Long] = {
      val d = new org.apache.hadoop.fs.Path(root, sub)
      if (!fs.exists(d)) None
      else fs.listStatus(d)
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
        .reduceOption(_ max _)
    }
    val committed = maxId("commits")
    maxId("offsets").filter(o => !committed.exists(_ >= o))
  }

  /** Delete every `batch_id=` partition except the compacted one —
    * shared by [[compactStore]] and StreamedPipeline's ledger
    * compaction. Hadoop FileSystem so it works beyond local disk.
    */
  private[operators] def pruneOtherPartitions(
      s: SparkSession, tableDirs: Seq[String], keepId: Long): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    for (t <- tableDirs) {
      val dir = new org.apache.hadoop.fs.Path(t)
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("batch_id=") &&
            n != s"batch_id=$keepId") {
          fs.delete(st.getPath, true); ()
        }
      }
    }
  }

  /** Run the continuous job over a parquet drop directory. */
  def run(s: SparkSession, incomingDir: String, storeDir: String,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val schema = "doc_id BIGINT, text STRING"
    s.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** All verdicts so far, for audits and the spec's equivalence pin. */
  def readVerdicts(s: SparkSession, outDir: String): DataFrame =
    s.read.option("basePath", outDir).parquet(s"$outDir/batch_id=*")
      .select("doc_id", "verdict", "match_id")
}

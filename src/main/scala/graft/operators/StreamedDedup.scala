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
    * own partitions (see the batch protocol above). With
    * `applyTombstones` the LIVE view is served (r19, VERDICT r18 #3 —
    * StreamedIndex's erasure discipline on the fingerprint store): the
    * postings anti-join the erased doc ids and the exact table
    * anti-joins on its HOLDER (`cid`), so an erased document's
    * fingerprints stop voting in every later verdict. Logical delete,
    * zero corpus-side work — the anti-join probes a request-sized LONG
    * set; [[compactStore]] makes it physical.
    *
    * Erasure is HOLDER-grain on the exact table: the accretion
    * protocol admits exactly one holder per distinct text (duplicates
    * are never admitted), so for all accreted content removing the
    * holder's row removes the text's only live contribution. The one
    * corner is a SEEDED clone family (corpusExact collapses clones to
    * the min holder): erasing that holder drops the fp row while
    * sibling postings remain, so a re-arriving identical text verdicts
    * near_dup (jaccard 1.0 against the sibling) instead of exact_dup —
    * still REJECTED, never admitted; only the label weakens, and only
    * until re-seed or sibling erasure. dd23's oracle models exactly
    * these store semantics.
    */
  def readStore(s: SparkSession, storeDir: String,
      excludeBatch: Long, applyTombstones: Boolean = false): (DataFrame, DataFrame) = {
    def part(table: String, cols: Seq[String]): DataFrame =
      s.read.option("basePath", s"$storeDir/$table")
        .parquet(s"$storeDir/$table/batch_id=*")
        .filter(col("batch_id") =!= excludeBatch)
        .select(cols.map(col): _*)
    val (e0, p0) = (part("exact", Seq("fp", "cid")),
      part("shingles", Seq("doc_id", "g")))
    if (!applyTombstones) (e0, p0)
    else {
      val t = readTombstones(s, storeDir)
      (e0.join(t.select(col("doc_id").as("cid")), Seq("cid"), "left_anti")
        .select("fp", "cid"),
        p0.join(t, Seq("doc_id"), "left_anti"))
    }
  }

  /** One erasure batch (GDPR/right-to-be-forgotten, takedowns):
    * tombstone the given doc_ids under a deterministic
    * `tombs/batch_id=N` partition — mode=overwrite, so a replayed
    * request is byte-stable, and erasing a document the store never
    * admitted is a structural no-op (the anti-joins find nothing).
    * [[StreamedIndex.deleteBatch]]'s contract, verbatim.
    */
  def deleteBatch(docIds: DataFrame, batchId: Long, storeDir: String): Unit =
    docIds.select("doc_id").distinct()
      .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$batchId")

  /** The accumulated erasure set `(doc_id)` — empty (not an error)
    * when no erasure batch has ever landed; a missing STORE fails
    * loudly ([[hasBatchPartitions]]).
    */
  def readTombstones(s: SparkSession, storeDir: String): DataFrame =
    if (!hasBatchPartitions(s, storeDir, s"$storeDir/tombs"))
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT"))
    else
      s.read.option("basePath", s"$storeDir/tombs")
        .parquet(s"$storeDir/tombs/batch_id=*")
        .select("doc_id").distinct()

  /** Seed the near-dup cluster-label store from the standing corpus
    * (r19, VERDICT r18 #5): the base clustering fixpoint —
    * [[Dedup.corpusDupEdges]] + the factored pointer-jump loop — runs
    * ONCE here; [[maintainLabels]] then keeps the labels current with
    * drop-sized work per batch.
    */
  def seedLabels(s: SparkSession, corpus: DataFrame, storeDir: String): Unit = {
    val e0 = Dedup.corpusDupEdges(s, corpus)
    val und = Materialize.trackedLocalCheckpoint(
      e0.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(e0.select(col("doc_b").as("a"), col("doc_a").as("b")))
        .distinct())
    Graph.ccPointerJump(und, corpus.select(col("doc_id").as("node")))
      .write.mode("overwrite")
      .parquet(s"$storeDir/labels/batch_id=$SeedBatchId")
  }

  /** The maintained cluster labels `(node, component)` — latest-batch-
    * wins per doc (a batch writes a doc's row only when it creates or
    * changes that doc's label, so the newest row IS the label). Empty
    * — not an error — before any seed.
    */
  def readLabels(s: SparkSession, storeDir: String,
      excludeBatch: Long = Long.MinValue,
      applyTombstones: Boolean = false): DataFrame = {
    val l0 =
      if (!hasBatchPartitions(s, storeDir, s"$storeDir/labels"))
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "node BIGINT, component BIGINT"))
      else
        s.read.option("basePath", s"$storeDir/labels")
          .parquet(s"$storeDir/labels/batch_id=*")
          .filter(col("batch_id") =!= excludeBatch)
          .groupBy("node")
          .agg(max_by(col("component"), col("batch_id")).as("component"))
    // live view (r19): an erased doc's own label row drops between
    // compactions, same anti-join discipline as readStore — component
    // ids elsewhere stay stable (opaque historical identifiers)
    if (!applyTombstones) l0
    else l0.join(readTombstones(s, storeDir).select(col("doc_id").as("node")),
      Seq("node"), "left_anti")
  }

  /** One batch of cluster-label maintenance (r19, VERDICT r18 #5 —
    * the streamed lifecycle dd22's doc promises): the probe path's
    * PAIR-grain hits ([[Dedup.storeMatchPairs]]) are the drop's
    * near-dup edges, merged into the persisted labels with dd22's
    * delta core — batch docs enter as self-labeled singletons (new
    * nodes only: a cross-batch re-delivered id keeps its standing
    * label), endpoint lookups and the merge-map rewrite run SHUFFLED
    * (doc-grain labels are corpus-scale at 100 TB), and the batch
    * writes ONLY the labels it created or changed (drop-plus-merged-
    * clusters-sized, never the corpus). A duplicate's label records
    * the cluster that rejected it — the retention/attribution audit.
    */
  def maintainLabels(probeDocs: DataFrame, pairs: DataFrame,
      batchId: Long, storeDir: String): Unit = {
    val s = probeDocs.sparkSession
    val labels = readLabels(s, storeDir, excludeBatch = batchId)
    val dropLab = probeDocs.select(col("doc_id").as("node"))
      .join(labels.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val lab = Materialize.trackedLocalCheckpoint(labels.unionByName(dropLab))
    val delta = Materialize.trackedLocalCheckpoint(
      pairs.select(col("doc_id").as("src"), col("match_id").as("dst")).distinct())
    val updated = Graph.ccMergeAdds(lab, delta, shuffled = true)
    val changed = updated
      .join(lab.withColumnRenamed("component", "old_c"), Seq("node"))
      .filter(col("old_c") =!= col("component"))
      .select("node", "component")
    changed
      .unionByName(updated
        .join(dropLab.select("node"), Seq("node"), "left_semi")
        .select("node", "component"))
      .dropDuplicates("node")
      .write.mode("overwrite").parquet(s"$storeDir/labels/batch_id=$batchId")
  }

  /** One micro-batch: verdict + store accretion. Public so the spec
    * can drive replay/idempotency directly (the foreachBatch body IS
    * this function).
    */
  def processBatch(batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val inc = Materialize(batch.select("doc_id", "text"))
    // LIVE view (r19): erased docs must neither vote in verdicts nor
    // block re-admission of their text through the fp growth-bound
    // anti-join below (a dead fp row shadowing a new holder would
    // leave the text unprotected forever)
    val (exact, postings) = readStore(s, storeDir, batchId, applyTombstones = true)
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
    // the fold serves the LIVE view (r19): tombstoned rows are
    // PHYSICALLY removed here and the consumed tombstones are cleared
    // — an empty tombs partition replaces the forest, so a crash
    // between the fold and the tomb prune re-deletes already-removed
    // rows (a no-op) rather than resurrecting them (StreamedIndex's
    // compaction discipline on the fingerprint store)
    val (exact, postings) =
      readStore(s, storeDir, excludeBatch = Long.MinValue, applyTombstones = true)
    exact.groupBy("fp").agg(min(col("cid")).as("cid"))
      .write.mode("overwrite").parquet(s"$storeDir/exact/batch_id=$compactionId")
    postings.distinct()
      .write.mode("overwrite").parquet(s"$storeDir/shingles/batch_id=$compactionId")
    pruneOtherPartitions(s, Seq(s"$storeDir/exact", s"$storeDir/shingles"), compactionId)
    // the label store (when maintained) folds to its resolved view —
    // latest-batch-wins per doc, one partition, same reads — MINUS
    // erased docs (r19): an erased doc's own label row leaves the
    // store with its fingerprints. Component ids stay stable even when
    // the erased doc's id NAMED the component: the label is an opaque
    // historical identifier (the min id at formation), not a live
    // reference — relabeling surviving members on every erasure would
    // churn every downstream consumer keyed by cluster id.
    if (hasBatchPartitions(s, storeDir, s"$storeDir/labels")) {
      readLabels(s, storeDir)
        .join(readTombstones(s, storeDir)
          .select(col("doc_id").as("node")), Seq("node"), "left_anti")
        .write.mode("overwrite").parquet(s"$storeDir/labels/batch_id=$compactionId")
      pruneOtherPartitions(s, Seq(s"$storeDir/labels"), compactionId)
    }
    if (hasBatchPartitions(s, storeDir, s"$storeDir/tombs")) {
      readTombstones(s, storeDir).limit(0)
        .write.mode("overwrite").parquet(s"$storeDir/tombs/batch_id=$compactionId")
      pruneOtherPartitions(s, Seq(s"$storeDir/tombs"), compactionId)
    }
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

  /** Whether `tableDir` holds any `batch_id=` partition — resolved
    * through Hadoop FileSystem so remote URIs behave like the read
    * path (ADVICE r18: a `java.io.File` probe silently reads ANY
    * unlistable path — remote store, permission failure, typo — as an
    * empty store). The parent `storeDir` is REQUIRED to exist: a
    * missing table under a real store is a legitimate "nothing held
    * yet"; a missing store is an operational error that must fail
    * loudly, not serve empty results.
    */
  private[operators] def hasBatchPartitions(
      s: SparkSession, storeDir: String, tableDir: String): Boolean = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root),
      s"store dir does not exist: $storeDir — refusing to read a " +
        "missing store as empty (bad path / permission / remote URI?)")
    val t = new org.apache.hadoop.fs.Path(tableDir)
    fs.exists(t) && fs.listStatus(t).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch_id="))
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

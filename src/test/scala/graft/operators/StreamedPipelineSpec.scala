package graft.operators

import java.nio.file.Files

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** StreamedPipeline pins (VERDICT r14 #2's "Done =" clause, literally):
  *
  *  1. the streamed per-batch manifests equal a sequential driver-side
  *     replay of the same factored cores, ACROSS a checkpointed
  *     mid-stream restart;
  *  2. a ONE-batch stream's manifest is row-identical to the shipped
  *     pl02 batch query on the same drop (streamed and batch
  *     composition cannot drift);
  *  3. re-delivering a processed batch is a no-op on both manifest and
  *     store (replay idempotency);
  *  4. admission asymmetry: a doc the quality gate drops never enters
  *     the fingerprint store.
  */
class StreamedPipelineSpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"spl-$tag").toString

  // the pl02 universe at sf0.001: 10% md5 split into drop + corpus
  private lazy val all: DataFrame = graft.Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"), col("lang"))
    .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
  private lazy val inc = all.filter(col("bkt") < 10)
    .select("doc_id", "text", "lang").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
  private lazy val corp = all.filter(col("bkt") >= 10).select("doc_id", "text")
  private lazy val bench = Decontam.benchmarkIndex(spark, sf0001).localCheckpoint()

  private def toDf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private def seed(storeDir: String): Unit =
    StreamedPipeline.seed(spark, corp, bench, storeDir)

  private def manifestOf(manifestDir: String, batchId: Long): Map[(Int, String), Long] =
    StreamedPipeline.readManifests(spark, manifestDir)
      .filter(col("batch_id") === batchId).collect()
      .map(r => (r.getInt(1), r.getString(2)) -> r.getLong(3)).toMap

  /** Driver-side sequential replay of the admission chain with the
    * SAME factored cores — the ground truth for streamed == batch.
    * With `modelKeeps` set, stage 1 is the trained gate (keep iff the
    * doc is in the model's keep set) and the stage-1 manifest rows are
    * pl04's model_keep/model_drop labels.
    */
  private def replay(batches: Seq[Seq[(Long, String, String)]],
      modelKeeps: Option[Set[Long]] = None)
      : Seq[Map[(Int, String), Long]] = {
    var exact = Dedup.corpusExact(corp).localCheckpoint()
    var postings = Dedup.corpusPostings(spark, corp).localCheckpoint()
    var corpusCount = corp.count()
    batches.map { b =>
      val bdf = toDf(b)
      val fc = TextAnalysis.filterVerdictsOf(bdf)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      val s1 = modelKeeps match {
        case Some(mk) => b.map(_._1).filter(mk)
        case None => b.map(_._1).filter(id => fc(id)._2 == "kept")
      }
      val v = Dedup.verdictsAgainstStore(spark,
          bdf.filter(col("doc_id").isin(s1: _*)), exact, postings)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val s2 = s1.filter(v(_) == "new")
      val cont = Decontam.contaminatedAgainstIndex(spark,
          bdf.filter(col("doc_id").isin(s2: _*)), bench)
        .collect().map(_.getLong(0)).toSet
      val s3 = s2.filterNot(cont)
      corpusCount += s3.size
      val admitted = toDf(b.filter(d => s3.contains(d._1)))
      exact = exact.unionByName(
        Dedup.corpusExact(admitted).join(exact, Seq("fp"), "left_anti"))
        .localCheckpoint()
      postings = postings.unionByName(
        Dedup.corpusPostings(spark, admitted)).localCheckpoint()
      // the manifest rows, from first principles (pk02's serpentine
      // replayed like PipelineSpec does)
      val shards = s3.map(id => (fc(id)._1.toLong, id))
        .sortBy { case (t, id) => (-t, id) }.zipWithIndex
        .map { case (_, i) => if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16 }
        .groupBy(sh => s"shard_$sh").view.mapValues(_.size.toLong).toMap
      val stage1 = modelKeeps match {
        case Some(_) =>
          val nk = s1.size.toLong
          Map((1, "model_keep") -> nk, (1, "model_drop") -> (b.size - nk))
            .filter(_._2 > 0)
        case None =>
          b.map(d => fc(d._1)._2).groupBy(identity).map {
            case (r, xs) => (1, r) -> xs.size.toLong }.toMap
      }
      (Map((0, "drop_in") -> b.size.toLong) ++ stage1 ++
        s1.map(v).groupBy(identity).map {
          case (r, xs) => (2, r) -> xs.size.toLong } ++
        Map((3, "contaminated") -> (s2.size - s3.size).toLong,
            (3, "clean") -> s3.size.toLong).filter(_._2 > 0) ++
        shards.map { case (d, n) => (4, d) -> n } ++
        Map((5, "corpus_after") -> corpusCount)
      ).toMap
    }
  }

  test("streamed manifests == sequential replay across a checkpointed restart; one-batch == pl02") {
    val (incoming, store, man, ckpt) =
      (tmp("in"), tmp("store"), tmp("man"), tmp("ckpt"))
    seed(store)
    val batches = inc.toSeq.grouped((inc.length + 2) / 3).map(_.toSeq).toSeq
    assert(batches.length === 3, "fixture must split into 3 micro-batches")

    def writeDrop(i: Int): Unit =
      toDf(batches(i)).coalesce(1).write.mode("append").parquet(incoming)
    def start() = StreamedPipeline.run(spark, incoming, store, man, ckpt,
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

    val expected = replay(batches)
    for (i <- batches.indices)
      assert(manifestOf(man, i.toLong) === expected(i),
        s"batch $i manifest diverges from the sequential replay")

    // genuine attrition somewhere in the stream, or the pin is vacuous
    val totalIn = expected.map(_((0, "drop_in"))).sum
    val totalAdmitted = expected.last((5, "corpus_after")) - corp.count()
    assert(totalAdmitted > 0, "stream admitted nothing")
    assert(totalAdmitted < totalIn, "stream dropped nothing")

    // one-batch stream == the shipped pl02 batch query (same universe):
    // pl02's manifest carries exactly these (stage, detail, n) rows
    val (store1, man1) = (tmp("store1"), tmp("man1"))
    seed(store1)
    StreamedPipeline.processBatch(toDf(inc.toSeq), 0L, store1, man1)
    val pl02 = graft.GraftQuery.all.find(_.name == "pl02_incremental_manifest").get
      .build(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(manifestOf(man1, 0L) === pl02,
      "a one-batch stream must equal the shipped pl02 batch manifest")
  }

  test("registry mode (r19): snapshot-isolated decontam — batch 0 under {A}, batch 1 under {A,B}, == the pl07 batch twin; a replay AFTER retraction serves the recorded snapshot; drop-1 admissions are dc07's retroactive catch") {
    def bkt(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    val (incoming, store, man, ckpt, regRoot) =
      (tmp("rin"), tmp("rstore"), tmp("rman"), tmp("rckpt"), tmp("reg"))
    val reg = s"$regRoot/store"
    // sf0.01, not the suite's sf0.001 universe: the retroactive-catch
    // polarity (a drop-1 admission release B later flags) is vacuous
    // at sf0.001 — no cross-split pair reaches the overlap threshold
    val docsAll = graft.Tables.load(spark, sf001, "documents")
    val withB = docsAll.withColumn("bkt", expr(Sampling.bucket100("doc_id")))
    BenchmarkRegistry.create(spark, docsAll.select("doc_id", "text"), reg)
    BenchmarkRegistry.accreteRelease(spark,
      withB.filter(col("bkt") >= 90 && col("bkt") < 95).select("doc_id", "text"),
      BenchmarkRegistry.SeedBatchId, reg)
    StreamedPipeline.seed(spark,
      withB.filter(col("bkt") >= 10).select("doc_id", "text"),
      Decontam.benchmarkIndex(spark, sf001).localCheckpoint(), store)
    val inc01 = withB.filter(col("bkt") < 10)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val drop1 = inc01.filter(d => bkt(d._1) < 5).toSeq
    val drop2 = inc01.filter(d => bkt(d._1) >= 5).toSeq
    assert(drop1.nonEmpty && drop2.nonEmpty)

    def start() = StreamedPipeline.run(spark, incoming, store, man, ckpt,
      trigger = Trigger.ProcessingTime(100), registryDir = Some(reg))
    // batch 0 admits under snapshot {A}
    toDf(drop1).coalesce(1).write.mode("append").parquet(incoming)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // release B lands BETWEEN batches
    BenchmarkRegistry.accreteRelease(spark,
      withB.filter(col("bkt") >= 95).select("doc_id", "text"), 0L, reg)
    // batch 1 admits under snapshot {A, B}
    toDf(drop2).coalesce(1).write.mode("append").parquet(incoming)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // the streamed manifests equal the pl07 batch twin row-for-row
    val twin = graft.GraftQuery.all.find(_.name == "pl07_registry_admission").get
      .build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)) -> r.getLong(3)).toMap
    for (b <- Seq(0L, 1L))
      assert(manifestOf(man, b) ===
        twin.collect { case ((`b`, st, d), n) => (st, d) -> n },
        s"batch $b manifest diverges from the pl07 twin")
    // the snapshot rows themselves: batch 0 sees ONLY release A
    assert(manifestOf(man, 0L).keys.count(_._2.startsWith("release_")) === 1)
    assert(manifestOf(man, 1L).keys.count(_._2.startsWith("release_")) === 2)

    // HEADLINE replay pin: retract B, re-deliver batch 1 — the
    // recorded benchset snapshot wins and the manifest is byte-stable
    // (a live-registry read here would drop release B's flags)
    val before = manifestOf(man, 1L)
    BenchmarkRegistry.retract(spark, Seq(0L), 0L, reg)
    StreamedPipeline.processBatch(toDf(drop2), 1L, store, man,
      StreamedPipeline.RuleGate, Some(reg))
    assert(manifestOf(man, 1L) === before,
      "replay after retraction must serve the recorded snapshot")

    // the dc07 hook: batch 0 admitted docs that release B would have
    // flagged — retroactive contamination, non-vacuous on this fixture
    val admitted0 = spark.read
      .parquet(s"$store/admitted/batch_id=0").collect().map(_.getLong(0)).toSet
    val idxB = BenchmarkRegistry.readIndex(spark, reg)
      .filter(col("batch_id") === 0L).select("test_doc", "g")
    val flaggedByB = Decontam.flaggedPairsAgainstIndex(
        spark, toDf(drop1).select("doc_id", "text"), idxB)
      .select("train_doc").collect().map(_.getLong(0)).toSet
    assert(admitted0.intersect(flaggedByB).nonEmpty,
      "no drop-1 admission is retroactively contaminated by B — the snapshot story is vacuous on this fixture")
  }

  test("model-gated stream: persisted gate IS pl04's artifacts; manifests == replay across restart; rule audit side-car intact") {
    val (incoming, store, man, ckpt) =
      (tmp("min"), tmp("mstore"), tmp("mman"), tmp("mckpt"))
    seed(store)
    StreamedPipeline.seedModel(spark, sf0001, store)

    // 1) the persisted gate equals the tx22/tx23/pl04 cores' artifacts:
    // weights = perceptronEpochs.last, theta* = budgetMatchedTheta
    val model = spark.read.parquet(s"$store/model").collect()
    assert(model.length === 1, "model store must be a 1-row (w, theta) table")
    val w = model(0).getSeq[Long](model(0).fieldIndex("w")).toVector
    val theta = model(0).getLong(model(0).fieldIndex("theta"))
    val wCore = TextAnalysis.perceptronEpochs(spark, sf0001)
      .last.select("w").collect()(0).getSeq[Long](0).toVector
    assert(w === wCore, "persisted weights diverge from the tx22 core")
    val feats = TextAnalysis.perceptronFeats(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector, r.getLong(2)))
    val scores = feats.map { case (id, x, y) =>
      (id, x.zip(w).map { case (a, b) => a * b }.sum, y) }
    val (lo, hi) = (scores.map(_._2).min, scores.map(_._2).max)
    val grid = (1 to 5).map(k => k -> (lo + ((hi - lo) * k) / 6))
    val budget = scores.count(_._3 == 1L).toLong
    val thetaStar = grid.minBy { case (k, t) =>
      (math.abs(scores.count(_._2 >= t) - budget), k) }._2
    assert(theta === thetaStar, "persisted theta* diverges from the budget-matched rule")

    // 2) stream the drop in 3 micro-batches with a mid-stream restart
    val keeps = scores.collect { case (id, sc, _) if sc >= theta => id }.toSet
    val batches = inc.toSeq.grouped((inc.length + 2) / 3).map(_.toSeq).toSeq
    def writeDrop(i: Int): Unit =
      toDf(batches(i)).coalesce(1).write.mode("append").parquet(incoming)
    def start() = StreamedPipeline.run(spark, incoming, store, man, ckpt,
      trigger = Trigger.ProcessingTime(100), gate = StreamedPipeline.ModelGate)
    writeDrop(0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    writeDrop(1)
    val q2 = start()
    try {
      q2.processAllAvailable()
      writeDrop(2)
      q2.processAllAvailable()
    } finally q2.stop()

    val expected = replay(batches, Some(keeps))
    for (i <- batches.indices)
      assert(manifestOf(man, i.toLong) === expected(i),
        s"model-gated batch $i manifest diverges from the sequential replay")

    // 3) the rule chain rides along as the labeled-audit side-car:
    // per batch, the audit partition equals tx12's reason histogram
    for (i <- batches.indices) {
      val audit = spark.read.parquet(s"$man/audit/batch_id=$i").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rules = TextAnalysis.filterVerdictsOf(toDf(batches(i))).collect()
        .map(_.getString(2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(audit === rules, s"batch $i audit side-car diverges from tx12's histogram")
    }

    // 4) replay idempotency holds for the model gate too
    val m0 = manifestOf(man, 0L)
    StreamedPipeline.processBatch(toDf(batches(0)), 0L, store, man,
      gate = StreamedPipeline.ModelGate)
    assert(manifestOf(man, 0L) === m0, "replayed model-gated batch changed the manifest")

    // 5) non-vacuity: the model gate genuinely differs from the rule
    // gate over the training corpus (pl04's pin, at this sf)
    val ruleKeeps = feats.collect { case (id, _, y) if y == 1L => id }.toSet
    assert(keeps !== ruleKeeps, "model and rule gates identical — gating is a rename")
  }

  test("store compaction mid-stream: manifests (incl. corpus_after from the compacted ledger) equal the uncompacted replay") {
    val (store, man) = (tmp("cstore"), tmp("cman"))
    seed(store)
    val batches = inc.toSeq.grouped((inc.length + 2) / 3).map(_.toSeq).toSeq
    StreamedPipeline.processBatch(toDf(batches(0)), 0L, store, man)
    StreamedPipeline.processBatch(toDf(batches(1)), 1L, store, man)

    // maintenance window between triggers: fold fingerprint tables AND
    // the admission ledger into one partition each
    StreamedPipeline.compactStores(spark, store, -2L)
    def partitions(table: String): Seq[String] =
      new java.io.File(s"$store/$table").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSeq.sorted
    assert(partitions("admitted") === Seq("batch_id=-2"))
    assert(partitions("exact") === Seq("batch_id=-2"))

    // the stream continues: batch 2's manifest — including the
    // corpus_after line, which now reads the COMPACTED ledger — must
    // equal the sequential uncompacted replay
    StreamedPipeline.processBatch(toDf(batches(2)), 2L, store, man)
    val expected = replay(batches)
    for (i <- batches.indices)
      assert(manifestOf(man, i.toLong) === expected(i),
        s"batch $i manifest diverges from the uncompacted replay after compaction")
  }

  test("re-delivered batch is a no-op; rejected docs never enter the store") {
    val (store, man) = (tmp("store2"), tmp("man2"))
    seed(store)
    val batch0 = inc.take(inc.length / 2).toSeq
    StreamedPipeline.processBatch(toDf(batch0), 0L, store, man)

    def storeState(): (Set[(String, Long)], Long, Set[Long]) = {
      val (e, p) = StreamedDedup.readStore(spark, store, excludeBatch = Long.MinValue)
      val admitted = spark.read.option("basePath", s"$store/admitted")
        .parquet(s"$store/admitted/batch_id=*")
        .filter(col("batch_id") >= 0).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      (e.collect().map(r => (r.getString(0), r.getLong(1))).toSet, p.count(), admitted)
    }
    val m1 = manifestOf(man, 0L)
    val s1 = storeState()

    // at-least-once re-delivery: same batch, same id — byte-stable
    StreamedPipeline.processBatch(toDf(batch0), 0L, store, man)
    assert(manifestOf(man, 0L) === m1, "replayed batch changed the manifest")
    assert(storeState() === s1, "replayed batch changed the store")

    // admission asymmetry: every doc the chain dropped is absent from
    // the ledger AND its fingerprint absent from the exact store
    // (unless an admitted doc carries identical text)
    val admitted = s1._3
    val dropped = batch0.filterNot(d => admitted.contains(d._1))
    assert(dropped.nonEmpty, "batch dropped nothing — asymmetry pin is vacuous")
    assert(admitted.nonEmpty, "batch admitted nothing — asymmetry pin is vacuous")
    val admittedTexts = batch0.filter(d => admitted.contains(d._1)).map(_._2).toSet
    val corpusFps = s1._1.map(_._1)
    val leakable = dropped.filterNot(d => admittedTexts.contains(d._2))
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(t: String): String =
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // seed fps come from the corpus split; a dropped doc's text can
    // only collide with those if it exactly duplicates corpus text —
    // then its fp is legitimately present as CORPUS content
    val corpusTexts = corp.collect().map(_.getString(1)).toSet
    val mustBeAbsent = leakable.filterNot(d => corpusTexts.contains(d._2))
    assert(mustBeAbsent.nonEmpty, "no discriminating dropped doc — pin is vacuous")
    mustBeAbsent.foreach { d =>
      assert(!corpusFps.contains(fp(d._2)),
        s"rejected doc ${d._1}'s fingerprint leaked into the store")
    }
  }

  test("erasure reconciles the ledger (r19): corpus_after shrinks by live tombstones; compaction makes the ledger physical") {
    val (store, man) = (tmp("estore"), tmp("eman"))
    seed(store)
    val batches = inc.toSeq.grouped((inc.length + 1) / 2).map(_.toSeq).toSeq
    StreamedPipeline.processBatch(toDf(batches(0)), 0L, store, man)
    val after0 = manifestOf(man, 0L)((5, "corpus_after"))

    // erase 3 seed-corpus docs + 1 id never admitted (a no-op)
    val victims = corp.select("doc_id").limit(3).collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    StreamedPipeline.eraseDocs(spark,
      (victims :+ 31337314159L).toDF("doc_id"), 50L, store)

    // the live label view drops the erased docs' own rows immediately
    val liveLabels = StreamedDedup.readLabels(spark, store, applyTombstones = true)
      .select("node").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !liveLabels.contains(v)),
      "erased docs must leave the LIVE label view before compaction")

    // the next batch's corpus_after reads the reconciled ledger: the
    // prior count dropped by exactly the 3 erased LIVE docs
    StreamedPipeline.processBatch(toDf(batches(1)), 1L, store, man)
    val after1 = manifestOf(man, 1L)((5, "corpus_after"))
    val admitted1 = manifestOf(man, 1L)((3, "clean"))
    assert(after1 === after0 - 3 + admitted1,
      s"corpus_after must shrink by the erased docs: batch0=$after0, " +
        s"admitted1=$admitted1, got $after1")

    // compaction folds the ledger minus the erased ids, then clears
    // the consumed tombstones — a post-compaction batch agrees
    StreamedPipeline.compactStores(spark, store, -2L)
    val ledger = spark.read.option("basePath", s"$store/admitted")
      .parquet(s"$store/admitted/batch_id=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !ledger.contains(v)),
      "erased ids must leave the ledger physically at compaction")
    assert(StreamedDedup.readTombstones(spark, store).isEmpty)
    assert(ledger.size.toLong === after1, "folded ledger must equal the served corpus_after")
    // the erased docs' own label rows left the label store with their
    // fingerprints (component ids elsewhere stay stable — opaque
    // historical identifiers, not live references)
    val labelNodes = StreamedPipeline.readLabels(spark, store)
      .select("node").collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !labelNodes.contains(v)),
      "erased docs must leave the label store at compaction")
  }

  test("cluster labels (r19, VERDICT r18 #5): per-batch maintenance == union-find over the probe path's emitted edges, across a checkpointed restart; batch writes are change-sized; compaction folds") {
    val (incoming, store, man, ckpt) =
      (tmp("lin"), tmp("lstore"), tmp("lman"), tmp("lckpt"))
    seed(store)
    val batches = inc.toSeq.grouped((inc.length + 1) / 2).map(_.toSeq).toSeq
    assert(batches.length === 2)

    // real readStream with a kill/resume between the two drops —
    // the checkpointed-restart-mid-accretion clause
    def writeDrop(i: Int): Unit =
      toDf(batches(i)).coalesce(1).write.mode("append").parquet(incoming)
    writeDrop(0)
    val q1 = StreamedPipeline.run(spark, incoming, store, man, ckpt,
      trigger = Trigger.ProcessingTime(100))
    try q1.processAllAvailable() finally q1.stop()
    writeDrop(1)
    val q2 = StreamedPipeline.run(spark, incoming, store, man, ckpt,
      trigger = Trigger.ProcessingTime(100))
    try q2.processAllAvailable() finally q2.stop()

    // ground truth: union-find over the seed edge graph plus the pair
    // hits each batch's probe path emits against the store state of
    // ITS time — the same factored cores, replayed driver-side
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra max rb) = ra min rb }; ()
    }
    val universe = scala.collection.mutable.Set[Long]()
    universe ++= corp.select("doc_id").collect().map(_.getLong(0))
    Dedup.corpusDupEdges(spark, corp).collect()
      .foreach(r => union(r.getLong(0), r.getLong(1)))
    var exact = Dedup.corpusExact(corp).localCheckpoint()
    var postings = Dedup.corpusPostings(spark, corp).localCheckpoint()
    for (b <- batches) {
      val bdf = toDf(b)
      val fc = TextAnalysis.filterVerdictsOf(bdf)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val s1ids = b.map(_._1).filter(id => fc(id) == "kept")
      val probe = bdf.filter(col("doc_id").isin(s1ids: _*))
      universe ++= s1ids
      val hits = Dedup.storeMatchPairs(spark, probe, exact, postings)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      hits.foreach { case (a, m) => union(a, m) }
      // store evolution — the full chain, as the shipped replay does
      val v = Dedup.verdictsFromPairs(probe,
          Dedup.storeMatchPairs(spark, probe, exact, postings))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val s2 = s1ids.filter(v(_) == "new")
      val cont = Decontam.contaminatedAgainstIndex(spark,
          bdf.filter(col("doc_id").isin(s2: _*)), bench)
        .collect().map(_.getLong(0)).toSet
      val admitted = toDf(b.filter(d => s2.contains(d._1) && !cont(d._1)))
      exact = exact.unionByName(
        Dedup.corpusExact(admitted).join(exact, Seq("fp"), "left_anti"))
        .localCheckpoint()
      postings = postings.unionByName(
        Dedup.corpusPostings(spark, admitted)).localCheckpoint()
    }
    val truth = universe.toSeq.map(id => id -> find(id)).toMap

    def served(): Map[Long, Long] =
      StreamedPipeline.readLabels(spark, store).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = served()
    assert(got === truth,
      "maintained labels diverge from the union-find over the emitted edges")
    // non-vacuous: at least one probe doc joined a standing cluster
    assert(truth.exists { case (n, c) => n != c },
      "no doc clustered — the lifecycle pin is vacuous")

    // change-sized writes: a batch's label partition holds its probe
    // docs plus relabeled standees — never the whole corpus
    val b1rows = spark.read
      .parquet(s"$store/labels/batch_id=1").count()
    assert(b1rows < corp.count(),
      s"batch 1 wrote $b1rows label rows — writes must be change-sized")

    // replayed batch (same id): byte-stable labels
    StreamedPipeline.processBatch(toDf(batches(1)), 1L, store, man)
    assert(served() === truth, "a replayed batch changed the labels")

    // compaction folds the store to one resolved partition, same reads
    StreamedPipeline.compactStores(spark, store, -2L)
    val parts = new java.io.File(s"$store/labels").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSeq
    assert(parts === Seq("batch_id=-2"))
    assert(served() === truth, "labels changed across compaction")
  }
}

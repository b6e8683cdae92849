package graft.operators

import java.nio.file.{Files, Path, Paths}

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BenchmarkRegistry lifecycle pins (dc07/dc08's "Done =" clause):
  *
  *  - the union of per-release FULL ledgers == the one-shot dc01 audit
  *    over the whole held-out split (the registry loses nothing to its
  *    incremental structure);
  *  - novelty == a driver-side set difference over the ledgers, and it
  *    genuinely BITES on a synthetic fixture where a train doc is
  *    flagged by both releases (the fixture corpus has no such doc at
  *    sf0.001 — the oracle pins that empty-exclusion case instead);
  *  - replaying an accretion + audit is byte-stable on the ledger;
  *  - retraction: live view == rebuild-without-retracted, replayed
  *    retraction a no-op, retracting a never-admitted release a no-op;
  *  - compaction: retracted partitions physically deleted, live view
  *    identical, tombs cleared, re-run converges — and the documented
  *    trade holds (novelty converges to novelty-vs-live-evidence once
  *    the prior ledger is physically gone);
  *  - a MISSING store fails loudly instead of reading as empty.
  */
class BenchmarkRegistrySpec extends AnyFunSuite {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"bmreg-$tag").toString

  private def copyDir(src: String, dst: String): Unit = {
    val s = Paths.get(src)
    Files.walk(s).forEach { p: Path =>
      val d = Paths.get(dst, s.relativize(p).toString)
      if (Files.isDirectory(p)) { Files.createDirectories(d); () }
      else { Files.createDirectories(d.getParent); Files.copy(p, d); () }
    }
  }

  // ---- fixture-corpus store: the dc07/dc08 splits at sf0.001 ----

  private lazy val d: DataFrame = graft.Tables.load(spark, sf0001, "documents")
    .withColumn("b", expr(Sampling.bucket100("doc_id")))
  private lazy val train = d.filter(col("b") < 80).select("doc_id", "text")
  private lazy val relA =
    d.filter(col("b") >= 90 && col("b") < 95).select("doc_id", "text")
  private lazy val relB = d.filter(col("b") >= 95).select("doc_id", "text")

  /** Built once, mutated never — mutation tests work on copies. */
  private lazy val baseStore: String = {
    val out = s"${tmp("base")}/store"
    BenchmarkRegistry.create(spark, d.select("doc_id", "text"), out)
    BenchmarkRegistry.accreteRelease(spark, relA, BenchmarkRegistry.SeedBatchId, out)
    BenchmarkRegistry.retroAudit(spark, train, BenchmarkRegistry.SeedBatchId, out)
    BenchmarkRegistry.accreteRelease(spark, relB, 0L, out)
    BenchmarkRegistry.retroAudit(spark, train, 0L, out)
    out
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("train_doc", "test_doc", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def ledger(store: String, batch: Long): DataFrame =
    BenchmarkRegistry.readFlags(spark, store)
      .filter(col("batch_id") === batch)

  test("per-release ledger union == the one-shot dc01 audit") {
    val union = pairSet(BenchmarkRegistry.readFlags(spark, baseStore))
    val oneShot = pairSet(Decontam.overlapPairs(spark, sf0001))
    assert(union === oneShot)
    // and each release's ledger is non-empty — the split is non-vacuous
    assert(pairSet(ledger(baseStore, BenchmarkRegistry.SeedBatchId)).nonEmpty)
    assert(pairSet(ledger(baseStore, 0L)).nonEmpty)
  }

  test("novelty == driver-side set difference over the ledgers") {
    val priorDocs = pairSet(ledger(baseStore, BenchmarkRegistry.SeedBatchId))
      .map(_._1)
    val expected = pairSet(ledger(baseStore, 0L))
      .filterNot(p => priorDocs.contains(p._1))
    assert(pairSet(BenchmarkRegistry.novelFlags(spark, baseStore, 0L)) === expected)
  }

  test("novelty exclusion bites on a synthetic two-release overlap") {
    import spark.implicits._
    val px = "alpha beta gamma delta epsilon"
    val py = "one two three four five"
    val pz = "six seven eight nine ten"
    val t1 = (1L, s"$px t1a t1b $py")       // flagged by A (via px) AND B (via py)
    val t2 = (2L, s"$pz t2a t2b")           // flagged by B only (via pz)
    val t3 = (3L, "lone words nothing shared here") // clean
    val a1 = (10L, s"$px a1a a1b")
    val b1 = (20L, s"$py b1a $pz")
    val corpus = Seq(t1, t2, t3, a1, b1).toDF("doc_id", "text")
    val store = s"${tmp("synth")}/store"
    BenchmarkRegistry.create(spark, corpus, store)
    BenchmarkRegistry.accreteRelease(spark, Seq(a1).toDF("doc_id", "text"),
      BenchmarkRegistry.SeedBatchId, store)
    BenchmarkRegistry.retroAudit(spark, Seq(t1, t2, t3).toDF("doc_id", "text"),
      BenchmarkRegistry.SeedBatchId, store)
    BenchmarkRegistry.accreteRelease(spark, Seq(b1).toDF("doc_id", "text"), 0L, store)
    BenchmarkRegistry.retroAudit(spark, Seq(t1, t2, t3).toDF("doc_id", "text"),
      0L, store)
    // release A flagged t1; release B's full ledger flags t1 AND t2 —
    // but only t2 is NOVEL (t1's purge already happened for A)
    assert(pairSet(ledger(store, BenchmarkRegistry.SeedBatchId)).map(_._1) === Set(1L))
    assert(pairSet(ledger(store, 0L)).map(_._1) === Set(1L, 2L))
    assert(pairSet(BenchmarkRegistry.novelFlags(spark, store, 0L)).map(_._1) === Set(2L))
  }

  test("replaying an accretion + audit is byte-stable on the ledger") {
    val store = s"${tmp("replay")}/store"
    copyDir(baseStore, store)
    val before = pairSet(BenchmarkRegistry.readFlags(spark, store))
    BenchmarkRegistry.accreteRelease(spark, relB, 0L, store)
    BenchmarkRegistry.retroAudit(spark, train, 0L, store)
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store)) === before)
  }

  test("retraction: live == rebuild-without-retracted; replay + unknown-release no-ops") {
    val store = s"${tmp("retract")}/store"
    copyDir(baseStore, store)
    BenchmarkRegistry.retract(spark, Seq(BenchmarkRegistry.SeedBatchId), 0L, store)
    val live = pairSet(BenchmarkRegistry.readFlags(spark, store, applyTombstones = true))
    assert(live === pairSet(ledger(store, 0L)))
    assert(live.nonEmpty)
    // docs release A alone flagged re-enter; both-release docs stay purged
    val aOnly = pairSet(ledger(store, BenchmarkRegistry.SeedBatchId)).map(_._1) --
      pairSet(ledger(store, 0L)).map(_._1)
    assert(aOnly.intersect(live.map(_._1)).isEmpty)
    // replayed retraction is byte-stable
    BenchmarkRegistry.retract(spark, Seq(BenchmarkRegistry.SeedBatchId), 0L, store)
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store, applyTombstones = true))
      === live)
    // retracting a release the registry never admitted is a no-op
    BenchmarkRegistry.retract(spark, Seq(99L), 1L, store)
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store, applyTombstones = true))
      === live)
    // the index live view dropped release A's postings too
    val liveIdxBatches = BenchmarkRegistry
      .readIndex(spark, store, applyTombstones = true)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIdxBatches === Set(0L))
  }

  test("compaction: physical deletion, identical live view, cleared tombs, convergent") {
    val store = s"${tmp("compact")}/store"
    copyDir(baseStore, store)
    BenchmarkRegistry.retract(spark, Seq(BenchmarkRegistry.SeedBatchId), 0L, store)
    val liveBefore =
      pairSet(BenchmarkRegistry.readFlags(spark, store, applyTombstones = true))
    BenchmarkRegistry.compact(spark, store, -2L)
    // physically gone
    assert(!Files.exists(Paths.get(s"$store/index/batch_id=-1")))
    assert(!Files.exists(Paths.get(s"$store/flags/batch_id=-1")))
    // live view identical; tombs-blind read now EQUALS the live view
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store)) === liveBefore)
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store, applyTombstones = true))
      === liveBefore)
    // consumed tombstones cleared
    assert(BenchmarkRegistry.readTombstones(spark, store).count() === 0L)
    // the documented trade: novelty converges to novelty-vs-live-evidence
    assert(pairSet(BenchmarkRegistry.novelFlags(spark, store, 0L))
      === pairSet(ledger(store, 0L)))
    // re-running an interrupted compaction converges
    BenchmarkRegistry.compact(spark, store, -2L)
    assert(pairSet(BenchmarkRegistry.readFlags(spark, store)) === liveBefore)
    // release ids below -1 are refused (they'd collide with nothing,
    // but the guard keeps the id spaces disjoint by contract)
    assertThrows[IllegalArgumentException] {
      BenchmarkRegistry.compact(spark, store, 0L)
    }
  }

  test("a missing store fails loudly instead of reading as empty") {
    assertThrows[IllegalArgumentException] {
      BenchmarkRegistry.readTombstones(spark, s"${tmp("gone")}/never-created")
    }
  }
}

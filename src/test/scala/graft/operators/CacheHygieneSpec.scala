package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.CacheProbe
import org.scalatest.funsuite.AnyFunSuite

/** The dedup/similarity builders materialize shared intermediates with
  * `localCheckpoint` (blocks outside the CacheManager, reclaimed by the
  * ContextCleaner) or scoped persist/unpersist pairs — never a persist
  * that outlives the call. The bench/verify harness papers over leaks
  * with `clearCache()`; a long-lived session embedding these builders
  * would not, so the contract is: run to completion → cache empty.
  */
class CacheHygieneSpec extends AnyFunSuite {

  private val builders = Seq(
    "dd03_minhash_lsh_pairs", "dd04_simhash_pairs",
    "dd05_ngram_jaccard_pairs", "dd06_embedding_neardup_lsh",
    "dd07_dedup_clusters", "dd08_dedup_keepers", "dd09_semantic_clusters",
    "ss05_knn_join", "dc01_benchmark_overlap", "dc02_decontaminated_train")

  for (name <- builders)
    test(s"$name leaves the CacheManager empty after running to completion") {
      spark.catalog.clearCache()
      val q = graft.GraftQuery.all.find(_.name == name).get
      q.build(spark, sf001).write.format("noop").mode("overwrite").save()
      assert(CacheProbe.cacheIsEmpty(spark),
        s"$name left cached plans behind — a leak for any embedding session")
    }

  test("releasePinned frees the localCheckpoint blocks clearCache cannot reach") {
    spark.catalog.clearCache()
    Materialize.releasePinned(spark) // start from a clean block manager
    val q = graft.GraftQuery.all.find(_.name == "ss05_knn_join").get
    // releasePinned is scoped to graft-tracked pins, so the contract is
    // "the pins this build ADDS are gone afterward" — diff against a
    // pre-build snapshot rather than asserting a globally empty block
    // manager (a co-tenant's untracked pins must survive untouched)
    val preExisting = spark.sparkContext.getPersistentRDDs.keySet
    val built = q.build(spark, sf001)
    built.write.format("noop").mode("overwrite").save()
    // the builder's pins are RDD-level persisted (localCheckpoint), so
    // they survive clearCache — exactly the residue that skewed the
    // r4/r5 bench tails
    spark.catalog.clearCache()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- preExisting).nonEmpty,
      "expected localCheckpoint pins to survive clearCache — if this " +
        "starts failing, the builders stopped pinning and releasePinned " +
        "may be dead code")
    Materialize.releasePinned(spark)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- preExisting).isEmpty,
      "releasePinned must release every graft-created pin")
    // `built` is referenced THROUGH the assertions above: its plan
    // roots the checkpointed RDDs, so a GC there cannot feed the async
    // ContextCleaner and empty getPersistentRDDs before the probe
    assert(built.columns.nonEmpty)
  }

  test("releasePinned leaves a co-tenant's untracked pins alone") {
    import spark.implicits._
    // simulate another tenant on the shared SparkContext (e.g.
    // ChangeArchiveJob's per-batch persist): pinned outside graft's
    // tracking, it must survive a graft harness release untouched
    val tenant = Seq(1, 2, 3).toDF("x").persist()
    tenant.count()
    val tenantPins = spark.sparkContext.getPersistentRDDs.keySet
    assert(tenantPins.nonEmpty, "tenant persist should register blocks")
    val graftPinned = Materialize.trackedLocalCheckpoint(Seq(4, 5).toDF("y"))
    Materialize.releasePinned(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(tenantPins.subsetOf(after),
      "releasePinned must not blocking-unpersist a co-tenant's in-flight pin")
    assert((after -- tenantPins).isEmpty, "the graft pin itself must be released")
    assert(graftPinned.columns.nonEmpty) // roots the pin through the probes
    tenant.unpersist(blocking = true)
  }
}

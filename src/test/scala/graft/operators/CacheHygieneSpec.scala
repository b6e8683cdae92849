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
    "ss05_knn_join")

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
    q.build(spark, sf001).write.format("noop").mode("overwrite").save()
    // the builder's pins are RDD-level persisted (localCheckpoint), so
    // they survive clearCache — exactly the residue that skewed the
    // r4/r5 bench tails
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected localCheckpoint pins to survive clearCache — if this " +
        "starts failing, the builders stopped pinning and releasePinned " +
        "may be dead code")
    Materialize.releasePinned(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releasePinned must leave zero RDDs in the block manager")
  }
}

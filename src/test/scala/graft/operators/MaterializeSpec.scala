package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.CacheProbe
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.graft.materialize` switch changes HOW intermediates pin,
  * never WHAT a builder returns.
  */
class MaterializeSpec extends AnyFunSuite {

  // the FRESH jaccard-pair build (r19: the dd05 query itself now reads
  // the StageStore table, so the Materialize behavior under test lives
  // in the un-memoized builder — the code path the store build runs)
  private def dd05(dir: String) = Dedup.jaccardEdgesFresh(spark, dir)

  test("all three modes produce identical results") {
    def rows(mode: Option[String]): Seq[String] = {
      mode.foreach(m => spark.conf.set(Materialize.ConfKey, m))
      try dd05(sf001).collect().map(_.toString).sorted.toSeq
      finally { spark.conf.unset(Materialize.ConfKey); spark.catalog.clearCache() }
    }
    val default = rows(None)
    assert(default.nonEmpty)
    assert(rows(Some("persist")) === default)
    assert(rows(Some("none")) === default)
  }

  test("persist mode leaves recomputable cache entries; clearCache releases them") {
    // the documented trade: persist survives executor loss via lineage
    // recompute but parks entries in the CacheManager for the caller
    spark.catalog.clearCache()
    spark.conf.set(Materialize.ConfKey, "persist")
    try {
      dd05(sf001).collect()
      assert(!CacheProbe.cacheIsEmpty(spark),
        "persist mode must register its intermediates in the CacheManager")
    } finally {
      spark.conf.unset(Materialize.ConfKey)
      spark.catalog.clearCache()
    }
    assert(CacheProbe.cacheIsEmpty(spark))
  }
}

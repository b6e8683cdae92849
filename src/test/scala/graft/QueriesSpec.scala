package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every inventory query builds, executes, and returns a sane shape on
  * sf0.001. One test per operator (driver requirement).
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // Queries whose correct result CAN be empty at tiny scale.
  private val mayBeEmpty = Set("q06_anti_join", "q14_except",
    "dd06_embedding_neardup_lsh", "dd03_minhash_lsh_pairs",
    "dd04_simhash_pairs", "dd05_ngram_jaccard_pairs",
    "dd07_dedup_clusters")

  for (q <- GraftQuery.all) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.build(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle name matches a query name") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique") {
    val names = GraftQuery.all.map(_.name)
    assert(names.distinct.size === names.size)
  }
}

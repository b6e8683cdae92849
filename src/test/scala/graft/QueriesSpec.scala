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

  test("q61: merged partials equal a from-scratch rebuild; both splits non-empty") {
    // the MV refresh-correctness invariant, checked in-engine on top of
    // the cross-engine oracle: incremental merge == full rescan, and
    // the md5 split genuinely produces a base AND a drop (else the
    // merge is vacuous)
    import org.apache.spark.sql.functions._
    val merged = GraftQuery.all.find(_.name == "q61_incremental_mv").get
      .build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val full = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(merged === full, "incremental merge diverged from the full rebuild")
    val bkts = Tables.spread(Tables.load(spark, sf0001, "events"), "event_id")
      .select(expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 90")
        .as("isBase")).groupBy("isBase").count().collect()
    assert(bkts.length === 2, "md5 split must produce both a base and a drop")
  }
}

package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout levers that only pay off at cluster scale — bucketed
  * co-located joins and runtime bloom-filter pushdown. Neither changes
  * query RESULTS (asserted), only the plan shape; at 100 TB they are
  * the difference between a repeated fact-table shuffle and none.
  */
class StorageLayoutSpec extends AnyFunSuite {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join with ZERO exchanges (co-located by key)") {
    // At 100 TB you bucket the fact table ONCE at write time, then
    // every key-joining query skips its shuffle. saveAsTable is the
    // bucketing API (bucket metadata lives in the catalog, not the
    // files); AQE is irrelevant here since no exchange exists to adapt.
    // path-based catalog tables (warehouse.dir is a static conf the
    // shared test session can't change; an explicit path keeps the
    // bucket files in /tmp while the bucket METADATA lives in the
    // catalog — bucketing is catalog metadata, plain parquet won't do)
    val wh = new java.io.File(sys.props("java.io.tmpdir"), "graft_bucket_wh")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.load(spark, sf001, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, sf001, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable broadcast so the plan decision under test is bucket
    // co-location (at sf0.01 orders fits the broadcast threshold; at
    // 100 TB neither side would)
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, p) =
      try {
        val j = spark.table("b_lineitem")
          .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        (j, executed(j)) // plan while the conf override is in force
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    assert(p.contains("SortMergeJoin"), "bucketed equi-join should sort-merge")
    // the final groupBy(o_orderpriority) legitimately shuffles; the JOIN
    // KEYS must not — bucket layout already co-locates them
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side:\n${p.take(2000)}")
    assert(p.contains("Bucketed: true"), "scans must be bucket-aware")
    assert(p.contains("SelectedBucketsCount"), "scans must report bucket pruning")

    // identical results to the plain (shuffling) join
    val plain = Tables.load(spark, sf001, "lineitem")
      .join(Tables.load(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq ==
      plain.orderBy("o_orderpriority").collect().toSeq)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark's runtime row-level filtering: a bloom filter built from the
    // selective dim side is injected into the fact scan, so at 100 TB
    // most fact rows die at the scan instead of riding the join shuffle.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join so the injected filter is the only pruning
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dim = Tables.load(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val fact = Tables.load(spark, sf001, "lineitem")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected:\n${optimized.take(2000)}")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the co-located-join technique for 100 TB fact-fact
  * joins: both sides pre-hashed into the same bucket count on the join
  * key at WRITE time, so the join needs NO exchange at READ time. At a
  * 1000-executor scale this is the difference between a full reshuffle
  * of both fact tables per query and none; this spec pins the plan
  * property (no Exchange) and value-equality with the shuffled join.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed fact-fact join plans no Exchange and matches the shuffled join") {
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    // force a non-broadcast join so the exchange-elision is really the
    // bucketing at work, not a broadcast hiding the shuffle
    spark.conf.set(bcKey, "-1")
    try {
      val li = Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val or = Tables.load(spark, sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      or.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("or_bucketed")
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("or_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")
        // same rows as the plain shuffled join
        val shuffled = li.join(or, col("l_orderkey") === col("o_orderkey"))
        assert(joined.count() === shuffled.count())
        assert(joined.agg(sum("l_quantity")).collect().head.getDouble(0) ===
          shuffled.agg(sum("l_quantity")).collect().head.getDouble(0))
      } finally {
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS or_bucketed")
      }
    } finally spark.conf.set(bcKey, prevBc)
  }

  test("partition pruning: a day-partitioned layout scans one partition, not thirty") {
    // at 100 TB the events table is laid out by day; a one-day query
    // must read one directory — pruning happens at PLAN time from the
    // declarative filter, no manual file selection
    val dir = java.nio.file.Files.createTempDirectory("events-partitioned").toString
    Tables.load(spark, sf0001, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val oneDay = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-15")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition filters:\n$plan")
    // the scan's file listing must collapse to the single matching day
    val scannedFiles = oneDay.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scannedFiles.nonEmpty)
    assert(scannedFiles.forall(_.contains("day=2024-01-15")),
      s"scan leaked past the partition: ${scannedFiles.take(3).mkString(",")}")
    // and the values equal the unpartitioned filter
    val expected = Tables.load(spark, sf0001, "events")
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(oneDay.count() === expected)
  }
}

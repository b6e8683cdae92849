package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution behaviors the 100 TB design leans on:
  * runtime skew-join splitting (the complement of q29's static
  * salting — AQE handles the skew you didn't predict) and post-shuffle
  * partition coalescing. Asserted on the FINAL adaptive plan after
  * execution, since AQE re-plans at runtime.
  */
class AqeSpec extends AnyFunSuite {

  private def withConfs(confs: Map[String, String])(body: => Unit): Unit = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // one hot key owns half the fact side — the unpredicted-skew case
    // static salting can't catch. Thresholds are lowered so the local
    // fixture trips the same decision a 100 TB hot key would.
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      import spark.implicits._
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 2 === 0, 7L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as(("payload")))
      val dim = spark.range(0, 200000).select(col("id").as("k"),
        (col("id") % 97).as("w"))
      // the agg must reference payload, or column pruning reduces the
      // hot partition to a run of constant longs that COMPRESSES below
      // any size threshold (map-output sizes are compressed sizes)
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("mx"))
      val n = joined.collect()(0).getLong(0)
      assert(n == 200000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot-key SMJ partition as skewed:\n${finalPlan.take(1500)}")
    }
  }

  test("AQE coalesces over-provisioned shuffle partitions (AQEShuffleRead)") {
    // the inverse problem: shuffle.partitions sized for the cluster is
    // 100x too many for a small intermediate — AQE folds them back so
    // downstream stages don't pay per-partition overhead
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB")) {
      val agg = Tables.load(spark, sf001, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      // collect() drives THIS Dataset's queryExecution (count() would
      // plan a different query and leave this one un-executed)
      assert(agg.collect().nonEmpty)
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead coalesced"),
        s"AQE must coalesce the tiny shuffle:\n${finalPlan.take(1500)}")
    }
  }
}

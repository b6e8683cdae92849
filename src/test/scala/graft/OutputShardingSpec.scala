package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Publishing-side layout: a corpus written as globally ordered shards
  * (repartitionByRange + sortWithinPartitions). Consumers reading
  * shard K see keys strictly below shard K+1 — the layout that makes
  * downstream range reads, binary-searchable manifests, and
  * merge-reads possible without a global sort at read time. At 100 TB
  * this is how you ship "the corpus, ordered by quality" without one
  * machine ever holding the order.
  */
class OutputShardingSpec extends AnyFunSuite {

  test("range-partitioned sorted write produces globally ordered shards") {
    val docs = Tables.load(spark, sf001, "documents")
      .withColumn("quality", length(col("text")).cast("double") / (col("n_chars") + 1))
    val sharded = docs
      .repartitionByRange(8, col("quality"), col("doc_id"))
      .sortWithinPartitions(col("quality"), col("doc_id"))

    val p = sharded.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"write-side plan must range-partition, not hash:\n${p.take(800)}")
    // the per-shard sort must NOT be a global sort (no second exchange)
    assert("Exchange".r.findAllIn(p).size == 1, "exactly one exchange (the range shuffle)")

    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    sharded.write.mode("overwrite").parquet(dir)

    // global order property: every shard's max key < next shard's min.
    // Spark names part files in partition order (part-00000, ...).
    val shards = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(shards.length == 8)
    val bounds = shards.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .select(struct(col("quality"), col("doc_id")).as("k"))
      (d.agg(min(col("k"))).collect()(0).getStruct(0),
        d.agg(max(col("k"))).collect()(0).getStruct(0))
    }
    for (Array((_, hi), (lo, _)) <- bounds.sliding(2)) {
      val cmp = hi.getDouble(0) < lo.getDouble(0) ||
        (hi.getDouble(0) == lo.getDouble(0) && hi.getLong(1) < lo.getLong(1))
      assert(cmp, s"shard boundary violated: max=$hi of one shard >= min=$lo of the next")
    }

    // within-shard order: parquet preserves row order; re-reading one
    // shard must yield a non-decreasing key sequence
    val one = spark.read.parquet(shards(3).getAbsolutePath)
      .select(col("quality"), col("doc_id")).collect()
    val sortedCopy = one.sortBy(r => (r.getDouble(0), r.getLong(1)))
    assert(one.toSeq == sortedCopy.toSeq, "rows inside a shard must be stored sorted")
  }
}

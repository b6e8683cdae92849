package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  test("brute-force top-k is sorted desc and self-consistent (sf0.01)") {
    val rows = byName("ss01_cosine_topk").build(spark, sf001)
      .select("vec_id", "sim").collect()
    assert(rows.length === 20)
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("LSH ANN candidates are a subset of brute-force ranking order (sf0.01)") {
    val bf = byName("ss01_cosine_topk").build(spark, sf001)
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = byName("ss02_ann_lsh_topk").build(spark, sf001)
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1))
    // every ANN hit that also appears in the exact top-20 must carry the same sim
    for ((id, sim) <- ann if bf.contains(id))
      assert(math.abs(bf(id) - sim) < 1e-9, s"sim mismatch for vec $id")
  }

  test("cosine of a vector with itself is 1 (sanity of the expression)") {
    val df = graft.Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .limit(5)
      .withColumn("self", expr(
        """aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (s, v) -> s + v)
          | / sqrt(aggregate(e, 0D, (s, x) -> s + x * x)
          |        * aggregate(e, 0D, (s, x) -> s + x * x))""".stripMargin))
    assert(df.collect().forall(r => math.abs(r.getAs[Double]("self") - 1.0) < 1e-12))
  }
}

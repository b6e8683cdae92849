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

  test("LSH ANN is consistent with brute force AND has recall@10 >= 0.6 (sf0.01)") {
    val bf = byName("ss01_cosine_topk").build(spark, sf001)
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val bfMap = bf.toMap
    val ann = byName("ss02_ann_lsh_topk").build(spark, sf001)
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1))
    // every ANN hit that also appears in the exact top-20 must carry the same sim
    for ((id, sim) <- ann if bfMap.contains(id))
      assert(math.abs(bfMap(id) - sim) < 1e-9, s"sim mismatch for vec $id")
    // a broken ANN that returns zero overlap must FAIL: recall@10 vs the
    // exact top-10
    val exactTop10 = bf.sortBy(r => (-r._2, r._1)).take(10).map(_._1).toSet
    val annIds = ann.map(_._1).toSet
    val recall = (exactTop10 & annIds).size.toDouble / exactTop10.size
    assert(recall >= 0.6, s"ANN recall@10 $recall too low; ann=${annIds.size}")
  }

  test("k-NN join recovers exact nearest neighbors for a meaningful fraction (sf0.01)") {
    // exact directed top-1 per vector via brute force (test-only O(n²))
    val emb = graft.Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val a = emb.select(col("vec_id").as("va"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("e").as("eb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("va").orderBy(col("s").desc, col("vb"))
    val exactTop1 = a.join(b, col("va") =!= col("vb"))
      .withColumn("s", round(expr(
        """aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (sm, v) -> sm + v)
          | / sqrt(aggregate(ea, 0D, (sm, x) -> sm + x * x)
          |        * aggregate(eb, 0D, (sm, x) -> sm + x * x))""".stripMargin), 4))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("va", "vb").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val knn = byName("ss05_knn_join").build(spark, sf001)
      .select("vec_a", "vec_b").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // 4-bit bands are coarse; require the LSH k-NN to (a) cover most
    // vectors and (b) place the exact top-1 in its top-3 for a third+
    val covered = exactTop1.keys.count(knn.contains)
    assert(covered >= exactTop1.size / 2, s"knn covers only $covered/${exactTop1.size}")
    val hit = exactTop1.count { case (v, nn) => knn.get(v).exists(_.contains(nn)) }
    val recall = hit.toDouble / exactTop1.size
    assert(recall >= 0.33, s"k-NN top-3 recall of exact top-1 = $recall")
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

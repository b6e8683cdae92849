package graft.functions

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_embsig must be BIT-identical to the HOF hyperplane-signature
  * text (the oracles' arithmetic — FP left-folds included, the
  * CosineSim discipline).
  */
class EmbSigSpec extends AnyFunSuite {

  test("compiled signature == the HOF text, bit-for-bit, on every real embedding") {
    GraftFunctions.register(spark)
    val rows = graft.Tables.load(spark, sf001, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .select(
        expr("graft_embsig(e)").as("fast"),
        expr(graft.operators.Hashing.embSigHofExpr).as("slow"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) == r.getString(1)),
      "embsig diverged from the HOF formulation")
  }

  test("null corners mirror the HOF chain (mismatched length / null element -> '0' bits)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"""SELECT graft_embsig(array(1.0D, 2.0D)) AS short_fast,
         |       (SELECT ${graft.operators.Hashing.embSigHofExpr}
         |        FROM (SELECT array(1.0D, 2.0D) AS e)) AS short_slow,
         |       graft_embsig(transform(sequence(1, 64),
         |         i -> IF(i = 7, CAST(NULL AS DOUBLE), CAST(i AS DOUBLE)))) AS nul_fast,
         |       (SELECT ${graft.operators.Hashing.embSigHofExpr}
         |        FROM (SELECT transform(sequence(1, 64),
         |          i -> IF(i = 7, CAST(NULL AS DOUBLE), CAST(i AS DOUBLE))) AS e)) AS nul_slow
         |""".stripMargin).collect().head
    assert(r.getString(0) == r.getString(1), "length-mismatch corner diverged")
    assert(r.getString(2) == r.getString(3), "null-element corner diverged")
    assert(r.getString(0) == "0" * 32)
  }
}

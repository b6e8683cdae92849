package graft.functions

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_il2 / graft_idot must be BIT-identical to the HOF fold
  * formulations (the oracles' arithmetic). Integer math makes that
  * trivially true in theory; these pins make it true in fact across
  * codegen/interpreted paths and null corners (the CosineSim
  * discipline).
  */
class IntVecSpec extends AnyFunSuite {

  private def qpairs(n: Int) = {
    GraftFunctions.register(spark)
    val q = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qe"))
    q.select(col("vec_id").as("va"), col("qe").as("a"))
      .crossJoin(q.select(col("vec_id").as("vb"), col("qe").as("b")))
      .filter(col("va") < col("vb")).limit(n)
  }

  test("compiled il2/idot == HOF folds, bit-for-bit, on real quantized embedding pairs") {
    val rows = qpairs(20000).select(
      expr("graft_il2(a, b)").as("l2_fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)").as("l2_slow"),
      expr("graft_idot(a, b)").as("dot_fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)").as("dot_slow"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)), "il2 diverged from the HOF fold")
    assert(rows.forall(r => r.getLong(2) == r.getLong(3)), "idot diverged from the HOF fold")
  }

  test("codegen and interpreted paths agree (and the HOF null semantics are mirrored)") {
    GraftFunctions.register(spark)
    // length mismatch -> null (zip_with padding); null element -> null
    // (the lambda's null poisons the fold); both engines' HOF text
    // behaves exactly this way, so the compiled twin must too
    val corners = spark.sql(
      """SELECT graft_il2(array(1L, 2L), array(1L)) AS mismatch,
        |       graft_il2(array(1L, NULL), array(1L, 2L)) AS nullelem,
        |       graft_idot(array(1L, 2L), array(1L)) AS mismatch2,
        |       graft_idot(array(1L, NULL), array(1L, 2L)) AS nullelem2,
        |       aggregate(zip_with(array(1L, NULL), array(1L, 2L), (x, y) -> x * y),
        |                 0L, (s, v) -> s + v) AS hof_nullelem
        |""".stripMargin)
    def asSeq() = corners.collect().head.toSeq
    val gen = asSeq()
    val interp = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try asSeq()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(gen == interp, "doGenCode diverged from nullSafeEval")
    assert(gen.take(4).forall(_ == null), "null corners must yield null")
    assert(gen(4) == null, "the HOF text itself nulls on a null element — the contract being mirrored")
  }

  test("codegen compiles with NON-nullable inputs (nullable is always true)") {
    GraftFunctions.register(spark)
    // CODEGEN_ONLY turns a silent interpreted fallback into a failure
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = qpairs(100)
        .select(expr("graft_il2(a, b)").as("d"), expr("graft_idot(a, b)").as("t"))
        .agg(sum("d"), sum("t")).collect()
      assert(r.nonEmpty)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}

package graft.functions

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_cosine must be BIT-identical to the SQL fold formulation (the
  * oracles' arithmetic), not merely close — hash parity depends on it.
  */
class CosineSimSpec extends AnyFunSuite {

  test("compiled cosine == SQL fold, bit-for-bit, on real embedding pairs") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val pairs = emb.select(col("vec_id").as("va"), col("e").as("e_a"))
      .crossJoin(emb.select(col("vec_id").as("vb"), col("e").as("e_b")))
      .filter(col("va") < col("vb")).limit(20000)
    val rows = pairs.select(
      expr("graft_cosine(e_a, e_b)").as("fast"),
      expr("""aggregate(zip_with(e_a, e_b, (x, y) -> x * y), 0D, (s, v) -> s + v)
             | / sqrt(aggregate(e_a, 0D, (s, x) -> s + x * x)
             |        * aggregate(e_b, 0D, (s, x) -> s + x * x))""".stripMargin).as("slow"))
      .withColumn("same", col("fast") === col("slow"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("same")), "cosine results diverged bitwise")
  }

  test("codegen and interpreted paths agree bit-for-bit (r10 doGenCode)") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val pairs = emb.select(col("vec_id").as("va"), col("e").as("e_a"))
      .crossJoin(emb.select(col("vec_id").as("vb"), col("e").as("e_b")))
      .filter(col("va") < col("vb")).limit(2000)
      .select(col("va"), col("vb"), expr("graft_cosine(e_a, e_b)").as("sim"))
    def collected() = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    val gen = collected()
    val interp = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try collected()
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(gen.nonEmpty && gen == interp,
      "doGenCode diverged bitwise from nullSafeEval")
  }

  test("codegen compiles with NON-nullable inputs (r11: nullable is always true)") {
    // array literals are non-nullable; before the nullable override the
    // generated code referenced an undeclared isNull variable and every
    // stage containing graft_cosine over non-nullable arrays (ss03)
    // silently fell back to interpreted. CODEGEN_ONLY turns that
    // fallback into a hard failure so this can never regress silently.
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.range(1).select(
        expr("graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D))").as("s"))
        .collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("length mismatch yields null (zip_with padding parity)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(expr("graft_cosine(a, b)")).collect().head
    assert(r.isNullAt(0))
  }
}

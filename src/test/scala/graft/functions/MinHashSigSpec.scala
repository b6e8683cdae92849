package graft.functions

import graft.TestSpark._
import graft.operators.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compiled minhash expression must be bit-identical to the
  * SQL-dialect formulation it replaces (which is what the DuckDB oracle
  * mirrors).
  */
class MinHashSigSpec extends AnyFunSuite {

  private val shingleExpr =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
      |    i -> concat_ws(' ', slice(split(text, ' '), i, 3))))
      |ELSE array() END""".stripMargin

  private val sqlSigExpr = {
    val lits = Hashing.perms.map { case (a, b, c) =>
      s"named_struct('a', ${a}L, 'b', ${b}L, 'c', ${c}L)"
    }.mkString("array(", ", ", ")")
    s"""transform($lits, t -> array_min(transform(
       |  transform(gs, s -> named_struct(
       |    'h1', CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT),
       |    'h2', CAST(conv(substring(md5(s), 8, 7), 16, 10) AS BIGINT))),
       |  h -> (t.a * h.h1 + t.b * h.h2 + t.c) % ${Hashing.P})))""".stripMargin
  }

  test("compiled graft_minhash_sig == interpreted SQL formulation (sf0.001 corpus)") {
    MinHashSig.register(spark)
    val both = graft.Tables.load(spark, sf0001, "documents")
      .withColumn("gs", expr(shingleExpr))
      .filter(size(col("gs")) > 0)
      .select(
        expr("graft_minhash_sig(gs)").as("fast"),
        expr(sqlSigExpr).as("slow"))
      .withColumn("same", col("fast") === col("slow"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("same")),
      "compiled and SQL minhash signatures diverged")
  }

  test("empty shingle array yields null (array_min parity)") {
    MinHashSig.register(spark)
    import spark.implicits._
    val r = Seq(Seq.empty[String]).toDF("gs")
      .select(expr("graft_minhash_sig(gs)")).collect().head
    assert(r.isNullAt(0))
  }
}

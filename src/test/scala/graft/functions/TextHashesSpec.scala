package graft.functions

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compiled graft_shingles / graft_simhash64 must match the SQL-dialect
  * formulations (which the DuckDB oracles mirror) bit-for-bit.
  */
class TextHashesSpec extends AnyFunSuite {

  private val shingleSql =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
      |    i -> concat_ws(' ', slice(split(text, ' '), i, 3))))
      |ELSE array() END""".stripMargin

  private val simhashSql =
    """concat_ws('', transform(
      |  aggregate(
      |    transform(split(text, ' '), w -> named_struct(
      |      'h1', CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT),
      |      'h2', CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT))),
      |    array_repeat(0L, 64),
      |    (acc, h) -> zip_with(acc,
      |      transform(sequence(0, 63),
      |        b -> IF(((IF(b < 32, shiftright(h.h1, b), shiftright(h.h2, b - 32))) & 1L) = 1L, 1L, -1L)),
      |      (x, y) -> x + y)),
      |  v -> IF(v > 0, '1', '0')))""".stripMargin

  test("graft_shingles == SQL formulation on the corpus + edge cases") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val corpus = graft.Tables.load(spark, sf0001, "documents").select("text")
      .unionByName(Seq("", "one", "one two", "a b c", "a  b c", "x y x y x y",
        "日本語 テキスト の 三連 シングル", "émigré café naïve tokens here",
        "mixed 日本 and ascii words go here").toDF("text"))
    val rows = corpus
      .select(expr("graft_shingles(text)").as("fast"), expr(shingleSql).as("slow"))
      .withColumn("same", col("fast") === col("slow"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("same")), "shingles diverged")
  }

  test("graft_simhash64 == SQL formulation on the corpus") {
    GraftFunctions.register(spark)
    val rows = graft.Tables.load(spark, sf0001, "documents")
      .select(expr("graft_simhash64(split(text, ' '))").as("fast"),
        expr(simhashSql).as("slow"))
      .withColumn("same", col("fast") === col("slow"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("same")), "simhash diverged")
  }
}

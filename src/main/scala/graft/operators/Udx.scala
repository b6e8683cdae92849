package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined-function surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"):
  * one of each, all oracle-checkable because their semantics are also
  * expressible in plain SQL — the point here is exercising the
  * EXTENSION APIs (`udf()`, typed `Aggregator`, typed `flatMap` as the
  * UDTF shape), not inventing non-SQL semantics.
  *
  * Determinism note: ud02 accumulates in scaled LONG cents, not
  * doubles — float accumulation order varies with partitioning and
  * would break cross-engine hash parity; integer sums are
  * order-independent.
  */
object Udx {

  /** Scalar UDF: mask a customer name down to prefix + length tag
    * (the reference's only UDF-like code is its parser MapFunction;
    * this is the `udf()` registration surface).
    */
  private val maskName = udf((name: String) =>
    if (name == null) null else s"${name.take(3)}***${name.length}")

  /** Typed UDAF: weighted mean of price by quantity, accumulated in
    * scaled-integer cents for order-independent exactness.
    */
  object WeightedAvgPrice extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + math.round(a._1 * 100) * math.round(a._2), b._2 + math.round(a._2))
    def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / (100.0 * r._2)
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "ud01_udf_mask",
      Some("""SELECT c_custkey,
             |       SUBSTRING(c_name, 1, 3) || '***' || CAST(LENGTH(c_name) AS VARCHAR) AS masked,
             |       BASE64(ENCODE(c_mktsegment)) AS seg_b64
             |FROM customer WHERE c_acctbal > 9500""".stripMargin),
      "Scalar udf() registration surface (plus the reference's base64 scalar, SrStreamLoadClient.java:45).") {
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 9500)
          .select(col("c_custkey"),
            maskName(col("c_name")).as("masked"),
            base64(encode(col("c_mktsegment"), "UTF-8")).as("seg_b64"))
    },

    GraftQuery(
      "ud02_udaf_weighted_avg",
      Some("""SELECT l_returnflag,
             |       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS DOUBLE)
             |         / (100 * SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))) AS w_avg_price
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "Typed Aggregator UDAF (quantity-weighted mean price), scaled-integer accumulation so partial/merge order cannot change the result.") {
      (s, dir) =>
        val agg = udaf(WeightedAvgPrice)
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(agg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
    },

    GraftQuery(
      "ud03_udtf_tokenize",
      Some("""SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token,
             |       CAST(GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) - 1 AS INT) AS pos
             |FROM documents WHERE doc_id < 50""".stripMargin),
      "UDTF shape — a typed flatMap exploding each document into (token, pos) rows (one row in, many out), the Dataset-native generator surface.") {
      (s, dir) =>
        import s.implicits._
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (docId, text) =>
            text.split(" ", -1).iterator.zipWithIndex
              .map { case (tok, pos) => (docId, tok, pos) }.toSeq
          }
          .toDF("doc_id", "token", "pos")
    },

    GraftQuery(
      "ud04_sql_udf",
      Some("""SELECT CASE WHEN value < 50 THEN 'low'
             |            WHEN value < 200 THEN 'mid'
             |            ELSE 'high' END AS tier,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1""".stripMargin),
      "SQL-defined scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN expr, Spark 3.5+) — the function surface that closes the UDF family's optimization story: ud01's Scala UDF is an opaque black box to Catalyst (no pushdown through it, no codegen of its body, a JVM call per row), while a SQL UDF is INLINED at analysis time — the plan below contains the CASE expression itself, fully folded into whole-stage codegen, indistinguishable from having written the expression inline (plan-audited: no UDF invocation node survives). That is the 100 TB decision rule this query documents by construction: express logic as SQL functions when the semantics allow (free optimization), drop to a native Expression when they don't but performance matters (CosineSim), and pay a Scala UDF only when genuinely imperative (ud01 — kept as the contrast case). The oracle states the inlined expression directly, which is exactly the point.") {
      (s, dir) =>
        Tables.load(s, dir, "events").createOrReplaceTempView("ud04_events")
        s.sql(
          """CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(v DOUBLE)
            |RETURNS STRING
            |RETURN CASE WHEN v < 50 THEN 'low'
            |            WHEN v < 200 THEN 'mid'
            |            ELSE 'high' END""".stripMargin)
        s.sql(
          """SELECT graft_tier(value) AS tier, COUNT(*) AS n,
            |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
            |FROM ud04_events GROUP BY 1""".stripMargin)
    },
  )
}

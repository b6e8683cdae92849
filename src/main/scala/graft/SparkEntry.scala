package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the [[GraftQuery]]
  * inventory (operators.* modules); every SQL-expressible operator
  * carries a DuckDB oracle with identically-aliased columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 3-way join + aggregation (TPC-H Q3 flavor) — exercises scan,
    * filter pushdown, join selection and partial aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 3 EVERY query carries one
    * (zero rows-only checks): hash-seeded operators (LSH families, the
    * multimodal stub codec) derive their randomness from md5, which
    * both engines implement identically.
    */
  def oracleSql: Map[String, String] =
    GraftQuery.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

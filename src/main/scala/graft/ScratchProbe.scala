package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// TEMPORARY dev probe — not part of the library; deleted before close.
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // full rebuild (the oracle's spelling) in Spark
    val o = Tables.load(spark, sfDir, "orders").filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '_mv')), 1, 8), 16, 10) AS BIGINT) % 100").as("ob"),
        expr("CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '_mvd')), 1, 8), 16, 10) AS BIGINT) % 100").as("ob2"))
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        expr("CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING), '_mv')), 1, 8), 16, 10) AS BIGINT) % 100").as("lb"),
        expr("CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING), '_mvd')), 1, 8), 16, 10) AS BIGINT) % 100").as("lb2"))
    val rebuilt = o.filter(col("ob") >= 90 || col("ob2") >= 25)
      .join(l.filter(col("lb") >= 90 || col("lb2") >= 25),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(min(col("price")).cast("double").as("mn"),
        max(col("price")).cast("double").as("mx"),
        count(lit(1)).as("n"))

    val got = GraftQuery.all.find(_.name == "q70_minmax_mv_delta").get
      .build(spark, sfDir)

    val missing = rebuilt.join(got.select(col("o_custkey")), Seq("o_custkey"), "left_anti")
    println("=== missing groups (in rebuild, not in query) ===")
    missing.show(20, false)
    val extra = got.join(rebuilt.select(col("o_custkey")), Seq("o_custkey"), "left_anti")
    println("=== extra groups ===")
    extra.show(20, false)
    val miss = missing.select("o_custkey").collect().map(_.getLong(0))

    // wrong-valued groups too
    val joined = rebuilt.as("r").join(got.as("g"), Seq("o_custkey"))
      .filter(col("r.mn") =!= col("g.mn_price") || col("r.mx") =!= col("g.mx_price") || col("r.n") =!= col("g.n_lines"))
    println("=== diverging groups ===")
    joined.show(20, false)

    if (miss.nonEmpty) {
      val k = miss.head
      println(s"=== inspect custkey $k ===")
      val ordsK = o.filter(col("o_custkey") === k)
      ordsK.show(50, false)
      val rowsK = ordsK.join(l, col("o_orderkey") === col("l_orderkey"))
      rowsK.show(100, false)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader for the driver's TPC-H-ish parquet tables
  * (see TESTDATA.md / FIXTURES.md §B).
  *
  * All query builders take a `sfDir` (e.g. `/root/testdata/sf0.01`) and
  * load through here so column pruning + predicate pushdown reach the
  * parquet scan (Catalyst does this for free on a plain
  * `spark.read.parquet`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects.
      // Read nanos as long, then floor-convert to microseconds — the
      // same truncation DuckDB applies, so oracle parity holds.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select(raw.columns.map(col): _*)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

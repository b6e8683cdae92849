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

  /** Session invariants every query builder depends on. Idempotent
    * (guarded set), called once per session from `load`:
    *  - UTC session timezone — string↔timestamp casts and date_format
    *    must agree with the TZ-naive DuckDB oracle regardless of the
    *    caller session's locale;
    *  - nanosAsLong — events.ts is parquet TIMESTAMP(NANOS), which
    *    Spark 4 otherwise rejects at read time.
    */
  private def pinSessionConf(spark: SparkSession): Unit = {
    def ensure(k: String, v: String): Unit =
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    ensure("spark.sql.session.timeZone", "UTC")
    ensure("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    pinSessionConf(spark)
    if (name == "events") {
      // ts read as nano-long, floor-converted to micros — the same
      // truncation DuckDB applies, so oracle parity holds.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select(raw.columns.map(col): _*)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

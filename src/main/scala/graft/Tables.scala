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
      // Driver fixtures have shipped events.ts both ways: parquet
      // TIMESTAMP(NANOS) (surfaces as nano-long under nanosAsLong) and
      // native TIMESTAMP(MICROS). Adapt on schema: a long is
      // floor-converted to micros — the same truncation DuckDB
      // applies, so oracle parity holds — a timestamp passes through.
      // Either way the surfaced type is TIMESTAMP (LTZ): the session TZ
      // is pinned UTC, so an NTZ→LTZ cast is value-identical, and the
      // downstream surface (unix_micros, java.sql.Timestamp getters)
      // keeps the contract the nano-long era established.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            .select(raw.columns.map(col): _*)
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .select(raw.columns.map(col): _*)
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Spread a (possibly single-file) scan across the session's shuffle
    * parallelism with an EXPLICIT partition count — AQE would coalesce
    * a size-based repartition of a small-but-CPU-heavy input back to
    * one partition (it optimizes bytes, not lambda work). At 100 TB the
    * scan arrives pre-split and the downstream shuffle re-keys anyway;
    * on the single-file fixtures this is what keeps CPU-heavy stages
    * (LSH signatures, per-envelope JSON parsing) on all cores.
    */
  def spread(df: DataFrame, key: String): DataFrame = {
    val n = df.sparkSession.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(32)
    df.repartition(n, col(key))
  }
}

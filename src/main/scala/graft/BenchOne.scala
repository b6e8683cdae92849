package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling main: bench-identical timing (noop write, best of N)
  * for a named subset of the inventory — iterate on one query without
  * paying the full 82-query loop. `runMain graft.BenchOne q01 dd05`
  * (short id prefixes or full names); env `SPARK_GRAFT_SF_DIR`,
  * `SPARK_GRAFT_CPUS`, `SPARK_GRAFT_RUNS` (default 2) as in [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // validated EAGERLY: the first use is inside the swallowed warmup
    // try, where a typo would silently skip the warmup
    sys.env.get("SPARK_GRAFT_MATERIALIZE").foreach { m =>
      graft.operators.Materialize.validate(m)
      spark.conf.set(graft.operators.Materialize.ConfKey, m)
    }
    // bench-identical hygiene: clearCache + deterministic unpersist of
    // localCheckpoint pins (outside the CacheManager), so timings don't
    // depend on what ran before — see [[Bench]]
    def cold(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Materialize.releasePinned(spark)
    }
    try { SparkEntry.entry(spark).write.format("noop").mode("overwrite").save(); cold() }
    catch { case scala.util.control.NonFatal(_) => () }
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(a => n == a || n.startsWith(a + "_") || n.takeWhile(_ != '_') == a)
    }
    if (wanted.isEmpty) {
      System.err.println(s"[benchone] no queries match: ${args.mkString(" ")}")
      spark.stop()
      sys.exit(2)
    }
    wanted.foreach { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cold()
        dt
      }
      println(f"[benchone] $name best=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

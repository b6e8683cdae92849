package graft
import org.apache.spark.sql.SparkSession

/** Dev plan-capture main: prints `.explain("formatted")` for a named
  * subset of the inventory (same selection grammar as [[BenchOne]]),
  * one block per query delimited by `==== <name> ====`, so the
  * optimization rounds can archive before/after plans under plans/.
  * Env `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS` as in [[Bench]].
  * Plans only — nothing is executed (AQE plans print isFinalPlan=false).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(a => n == a || n.startsWith(a + "_") || n.takeWhile(_ != '_') == a)
    }
    if (wanted.isEmpty) {
      System.err.println(s"[explainone] no queries match: ${args.mkString(" ")}")
      spark.stop()
      sys.exit(2)
    }
    wanted.foreach { case (name, fn) =>
      println(s"==== $name ====")
      try println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"[explainone] ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for [[operators.Compaction]]'s cost claim: a merge
  * batch touching f% of keys should cost ~f% of a full-snapshot
  * rewrite, because only touched bucket directories are read back and
  * rewritten. Prints one JSON line per scenario; paste into SCALE.md
  * when the numbers move. Usage: `runMain graft.CompactionProbe [sfDir]`.
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val changes = Tables.load(spark, sfDir, "events").select(
      col("user_id"), col("ts"), col("event_id").as("seq"),
      when(col("event_type") === "error", "d").otherwise("u").as("op"),
      col("event_type"), col("value"))

    def freshSnapshot(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_cmp_probe").toString
      operators.Compaction.mergeBatch(changes, dir, "user_id", nBuckets = 64)
      dir
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warm up the whole path once so JIT/codegen doesn't bias scenario 1
    freshSnapshot()

    // scenarios: a batch touching ~1% of keys, ~10%, and all of them.
    // user_id % P == 0 picks a key-stratified slice (every bucket may
    // still be hit at 64 buckets — the honest unit is keys, and the
    // rewrite fraction reported below is measured, not assumed).
    for (pct <- Seq(1, 10, 100)) {
      val dir = freshSnapshot()
      val batch =
        if (pct == 100) changes
        else changes.filter(pmod(col("user_id"), lit(100 / pct)) === 0)
      val nKeys = batch.select("user_id").distinct().count()
      val before = bucketFiles(dir)
      val sec = time(operators.Compaction.mergeBatch(batch, dir, "user_id", nBuckets = 64))
      val after = bucketFiles(dir)
      // a rewritten bucket dir gains a fresh part file and loses its old
      // one — count DIRECTORIES whose file set changed, the claim's unit
      def bucketOf(p: String) = p.split("bucket=")(1).split("/")(0)
      val changedDirs = ((after.toSet diff before.toSet).map(e => bucketOf(e._1)) ++
        (before.keySet diff after.keySet).map(bucketOf)).size
      println(s"""{"probe":"compaction_merge","touched_key_pct":$pct,"n_keys":$nKeys,""" +
        s""""sec":${math.round(sec * 1000) / 1000.0},""" +
        s""""buckets_rewritten":$changedDirs,"buckets_total":64}""")
    }
    spark.stop()
  }

  private def bucketFiles(dir: String): Map[String, Long] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()))
      .toMap
}

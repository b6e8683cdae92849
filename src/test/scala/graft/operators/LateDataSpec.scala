package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Watermark late-data semantics (SURVEY.md §2.2 "Stateful ops / late
  * data"): a row older than the watermark must NOT count into an
  * already-closed window, across a checkpointed restart.
  */
class LateDataSpec extends AnyFunSuite {

  test("late row behind the watermark is dropped from a closed window") {
    val src = Files.createTempDirectory("late-src").toString
    val ckpt = Files.createTempDirectory("late-ckpt").toString
    val out = Files.createTempDirectory("late-out").toString

    def addFile(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8"))

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("ts TIMESTAMP, k STRING")
        .json(src)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("n"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: two rows in the 10:00 window; a 12:00 row drives the
    // watermark to 11:00 at batch end
    addFile("b1.jsonl", Seq(
      """{"ts":"2024-01-01 10:00:00","k":"a"}""",
      """{"ts":"2024-01-01 10:10:00","k":"b"}""",
      """{"ts":"2024-01-01 12:00:00","k":"c"}"""))
    runOnce()

    // batch 2 (after restart from checkpoint): one LATE row for the
    // 10:00 window — behind the 11:00 watermark, must be dropped —
    // plus a fresh 13:00 row
    addFile("b2.jsonl", Seq(
      """{"ts":"2024-01-01 10:05:00","k":"late"}""",
      """{"ts":"2024-01-01 13:00:00","k":"d"}"""))
    runOnce()

    val rows = spark.read.parquet(out)
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(rows.contains("2024-01-01 10:00:00.0"), s"10:00 window must have closed: $rows")
    assert(rows("2024-01-01 10:00:00.0") === 2L,
      s"late row must not count into the closed window: $rows")
  }
}

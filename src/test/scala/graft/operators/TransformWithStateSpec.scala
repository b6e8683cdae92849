package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, ValueState}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Spark 4's arbitrary-state v2 API (`transformWithState` +
  * [[StatefulProcessor]]) — the modern replacement for
  * `mapGroupsWithState` and the closest Structured Streaming analogue
  * to the reference's hand-rolled `CheckpointedFunction` operator state
  * (`SrSink.java:157-185`): named state variables, explicit
  * init/close lifecycle, RocksDB-backed, restart-recoverable.
  *
  * The processor keeps a per-user running (count, sum) and emits the
  * updated pair per input batch; state must survive a checkpointed
  * restart and end equal to the batch ground truth.
  */
object TransformWithStateSpec {
  /** Per-user running aggregate. Top-level: must not capture the suite. */
  class RunningAgg extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var agg: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)](
        "agg", org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, s0) = Option(agg.get()).getOrElse((0L, 0.0))
      var n = n0
      var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      agg.update((n, s))
      Iterator.single((key, n, s))
    }
  }
}

class TransformWithStateSpec extends AnyFunSuite {

  test("transformWithState running aggregate survives restart (RocksDB state v2)") {
    import spark.implicits._
    val src = Files.createTempDirectory("tws-src").toString
    val ckpt = Files.createTempDirectory("tws-ckpt").toString
    val out = Files.createTempDirectory("tws-out").toString

    def addFile(name: String, rows: Seq[(Long, Double)]): Unit =
      Files.write(Paths.get(src, name),
        rows.map { case (u, v) => s"""{"user_id":$u,"value":$v}""" }
          .mkString("\n").getBytes("UTF-8"))

    def runOnce(): Unit = {
      // transformWithState requires the RocksDB provider; scope it to
      // this query via the session conf (restored after)
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val q = spark.readStream
          .schema("user_id BIGINT, value DOUBLE").json(src)
          .as[(Long, Double)]
          .groupByKey(_._1)
          .transformWithState(new TransformWithStateSpec.RunningAgg,
            TimeMode.None(), OutputMode.Update())
          .toDF("user_id", "n", "total")
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId"); ()
          }
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    addFile("a.jsonl", Seq((1L, 2.0), (1L, 3.0), (2L, 10.0)))
    runOnce()
    // restart: named state variable must come back from RocksDB
    addFile("b.jsonl", Seq((1L, 5.0), (3L, 1.0)))
    runOnce()

    val finals = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals === Map(
      1L -> ((3L, 10.0)),
      2L -> ((1L, 10.0)),
      3L -> ((1L, 1.0))), s"stateful aggregates wrong: $finals")
  }
}

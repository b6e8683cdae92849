package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Custom keyed streaming state (SURVEY.md §2.2 "Stateful ops"):
  * a `mapGroupsWithState` running per-user counter whose state must
  * survive a checkpointed restart and end equal to the batch ground
  * truth — the Spark-native replacement for the reference's
  * hand-rolled `CheckpointedFunction` buffer (`SrSink.java:157-185`).
  */
object StatefulStateSpec {
  // top-level object member: the update function must not capture the
  // (non-serializable) test-suite instance
  def updateCount(
      userId: Long,
      rows: Iterator[org.apache.spark.sql.Row],
      state: GroupState[Long]): (Long, Long) = {
    val next = state.getOption.getOrElse(0L) + rows.size
    state.update(next)
    (userId, next)
  }
}

class StatefulStateSpec extends AnyFunSuite {
  import StatefulStateSpec.updateCount

  test("mapGroupsWithState counter survives restart and matches batch truth") {
    import spark.implicits._
    val src = Files.createTempDirectory("state-src").toString
    val ckpt = Files.createTempDirectory("state-ckpt").toString
    val out = Files.createTempDirectory("state-out").toString

    def addFile(name: String, userIds: Seq[Long]): Unit =
      Files.write(Paths.get(src, name),
        userIds.map(u => s"""{"user_id":$u}""").mkString("\n").getBytes("UTF-8"))

    def runOnce(): Unit = {
      val q = spark.readStream.schema("user_id BIGINT").json(src)
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .toDF("user_id")
        .groupByKey(r => r.getLong(0))
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateCount)
        .toDF("user_id", "n")
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId"); ()
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    addFile("a.jsonl", Seq(1, 1, 2, 3))
    runOnce()
    // restart: the per-user counters must come back from the state store
    addFile("b.jsonl", Seq(1, 2, 2, 4))
    runOnce()

    // last update per user across batches = final counter
    val finalCounts = spark.read.parquet(out)
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts === Map(1L -> 3L, 2L -> 3L, 3L -> 1L, 4L -> 1L),
      s"stateful counts wrong: $finalCounts")
  }
}

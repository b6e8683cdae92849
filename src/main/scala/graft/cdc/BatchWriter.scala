package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One micro-batch delivery target. `foreachBatch` hands each writer
  * the enriched archive batch ([[TargetDataRow]] columns) plus the
  * batch id; the id is what makes replay detectable, so every
  * implementation derives its idempotency story from it.
  *
  * The reference runs two sinks with DIFFERENT delivery contracts
  * (SURVEY.md §7.4):
  *  - JDBC/ADB: at-least-once — plain INSERT, retry keeps the buffer,
  *    duplicates possible after a partial commit (`AdbSink.java:128-130`);
  *  - Stream Load/SR: effectively-once — deterministic labels +
  *    "label already exists" treated as success-skip
  *    (`SrSink.java:126-129`).
  */
trait BatchWriter extends Serializable {
  def name: String
  def write(batch: DataFrame, batchId: Long): Unit
}

/** Parquet delivery for this offline environment: exactly-once by
  * construction — each micro-batch lands in its own `batch_id=N`
  * directory with `overwrite`, so a replayed batch overwrites itself
  * instead of duplicating (the `foreachBatch` idempotence pattern).
  * Partitioned by `dbTbName`, the same per-table fan-out the
  * reference's sinks do with in-memory buffers (`AdbSink.java:106`) —
  * but as directories, so a 1000-executor cluster writes all tables
  * in parallel with no driver state.
  */
final class ParquetBatchWriter(outDir: String) extends BatchWriter {
  val name = "parquet"
  def write(batch: DataFrame, batchId: Long): Unit =
    batch.write
      .mode("overwrite")
      .partitionBy("dbTbName")
      .parquet(s"$outDir/batch_id=$batchId")
}

/** JDBC batch delivery — the reference's ADB sink re-expressed
  * (`AdbSink.java:82-132`): multi-row batched INSERTs into the 4-column
  * archive table, one transaction per (batch, table). At-least-once:
  * a retried micro-batch re-INSERTs (no upsert), duplicates possible —
  * exactly the reference's contract.
  *
  * Executor-side: rows never collect to the driver; each partition
  * opens its own connection (`foreachPartition`), addBatch/executeBatch
  * like the reference's prepared-statement loop (`AdbSink.java:111-122`).
  */
final class JdbcBatchWriter(
    url: String,
    table: String,
    props: java.util.Properties,
    insertBatchSize: Int = 100) extends BatchWriter {
  val name = "jdbc"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, t, p, bs) = (url, table, props, insertBatchSize)
    batch.select(
      col("id"), col("fbNo"),
      date_format(col("recordDelTime"), "yyyy-MM-dd HH:mm:ss").as("recordDelTime"),
      col("dataJson"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(u, p)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(
              s"INSERT INTO $t (id, fb_no, record_del_time, data_json) VALUES (?, ?, ?, ?)")
            var n = 0
            rows.foreach { r =>
              st.setString(1, r.getString(0))
              st.setString(2, r.getString(1))
              st.setString(3, r.getString(2))
              st.setString(4, r.getString(3))
              st.addBatch()
              n += 1
              if (n % bs == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } finally conn.close()
        }
      }
  }
}

/** Exactly-once JDBC delivery — the upgrade path past the reference's
  * at-least-once contract: each partition's transaction first claims a
  * ledger row keyed `(batch_id, partition_id)` (primary key); a
  * replayed partition hits the key violation, rolls back, and skips —
  * so its rows commit exactly once. The ledger insert and the data
  * batch share ONE transaction, which is what makes the claim and the
  * data atomic. Requires a `{ledgerTable}(batch_id BIGINT,
  * partition_id INT, PRIMARY KEY (batch_id, partition_id))`.
  *
  * Assumes the micro-batch partitioning is deterministic across
  * replays (true for Spark's file/Kafka sources re-reading committed
  * offsets) — the same guarantee every batchId-keyed foreachBatch
  * idempotence pattern rests on.
  */
final class IdempotentJdbcBatchWriter(
    url: String,
    table: String,
    ledgerTable: String,
    props: java.util.Properties,
    insertBatchSize: Int = 100) extends BatchWriter {
  val name = "jdbc-idempotent"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, t, lt, p, bs, bid) = (url, table, ledgerTable, props, insertBatchSize, batchId)
    batch.select(
      col("id"), col("fbNo"),
      date_format(col("recordDelTime"), "yyyy-MM-dd HH:mm:ss").as("recordDelTime"),
      col("dataJson"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val conn = java.sql.DriverManager.getConnection(u, p)
          try {
            conn.setAutoCommit(false)
            val claimed =
              try {
                val claim = conn.prepareStatement(
                  s"INSERT INTO $lt (batch_id, partition_id) VALUES (?, ?)")
                claim.setLong(1, bid); claim.setInt(2, pid)
                claim.executeUpdate()
                true
              } catch {
                case e: java.sql.SQLIntegrityConstraintViolationException =>
                  conn.rollback(); false // replayed partition: skip
              }
            if (claimed) {
              val st = conn.prepareStatement(
                s"INSERT INTO $t (id, fb_no, record_del_time, data_json) VALUES (?, ?, ?, ?)")
              var n = 0
              rows.foreach { r =>
                st.setString(1, r.getString(0))
                st.setString(2, r.getString(1))
                st.setString(3, r.getString(2))
                st.setString(4, r.getString(3))
                st.addBatch()
                n += 1
                if (n % bs == 0) st.executeBatch()
              }
              st.executeBatch()
              conn.commit() // ledger row + data rows, atomically
            }
          } finally conn.close()
        }
      }
  }
}

/** Stream-Load-shaped delivery — the reference's StarRocks sink
  * re-expressed (`SrSink.java:104-133`, `SrStreamLoadClient.java:43-101`):
  * per-table JSON chunks of ≤ `chunkSize` rows, each PUT with an
  * idempotency label; "label already exists" is success-skip; any other
  * failure throws so the streaming query retries the batch.
  *
  * The label is `graft_{runId}_{batchId}_{table}_{chunk}` —
  * DETERMINISTIC across replays, fixing the reference's
  * `System.nanoTime()` label (`SrSink.java:115`) which changes on every
  * retry and so never actually dedupes. With stable labels the
  * label-exists-skip makes delivery effectively-once.
  *
  * The HTTP hop is behind [[LoadTransport]]: the real transport would
  * PUT to `http://fe:8030/api/{db}/{table}/_stream_load`; tests plug a
  * local transport that records labels and simulates replays.
  */
final class StreamLoadBatchWriter(
    runId: String,
    transport: LoadTransport,
    chunkSize: Int = 100) extends BatchWriter {
  val name = "streamload"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (rid, tr, cs) = (runId, transport, chunkSize)
    batch.select(col("dbTbName"), to_json(struct(
      col("id"), col("fbNo").as("fb_no"),
      date_format(col("recordDelTime"), "yyyy-MM-dd HH:mm:ss").as("record_del_time"),
      col("dataJson").as("data_json"))).as("row_json"))
      // per-table fan-out on executors; chunking is per (table, partition)
      .repartition(col("dbTbName"))
      .sortWithinPartitions(col("dbTbName"), col("row_json"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.map(r => (r.getString(0), r.getString(1)))
          .toSeq.groupBy(_._1).toSeq.sortBy(_._1)
          .foreach { case (table, tableRows) =>
            tableRows.map(_._2).grouped(cs).zipWithIndex.foreach { case (chunk, idx) =>
              val label = s"graft_${rid}_${batchId}_${table}_$idx"
              val body = chunk.mkString("[", ",", "]")
              tr.put(table, label, body) match {
                case LoadResult.Success | LoadResult.LabelAlreadyExists => ()
                case LoadResult.Failure(msg) =>
                  throw new RuntimeException(s"stream load failed for $label: $msg")
              }
            }
          }
      }
  }
}

/** The Stream Load HTTP hop (`SrStreamLoadClient.java:43-101`),
  * pluggable so the offline environment can test the sink protocol
  * (labels, skip, retry) without a StarRocks FE.
  */
trait LoadTransport extends Serializable {
  def put(table: String, label: String, jsonBody: String): LoadResult
}

sealed trait LoadResult
object LoadResult {
  case object Success extends LoadResult
  case object LabelAlreadyExists extends LoadResult
  final case class Failure(msg: String) extends LoadResult
}

/** A filesystem-backed transport: each accepted load lands as
  * `{outDir}/{table}/{label}.json`; a label that already exists on disk
  * is reported as [[LoadResult.LabelAlreadyExists]] — the same
  * semantics a StarRocks FE gives a replayed label, which is what makes
  * the sink effectively-once. Atomic create (`CREATE_NEW`) so
  * concurrent executors can't double-write a label.
  */
final class FileLoadTransport(outDir: String) extends LoadTransport {
  def put(table: String, label: String, jsonBody: String): LoadResult = {
    val dir = java.nio.file.Paths.get(outDir, table)
    java.nio.file.Files.createDirectories(dir)
    val target = dir.resolve(s"$label.json")
    try {
      java.nio.file.Files.write(target, jsonBody.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      LoadResult.Success
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => LoadResult.LabelAlreadyExists
      case e: Exception => LoadResult.Failure(e.getMessage)
    }
  }
}

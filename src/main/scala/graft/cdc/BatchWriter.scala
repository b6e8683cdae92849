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

private[cdc] object JdbcRouting {
  /** Table names come from CDC data (`dbTbName`); reject anything that
    * isn't a plain identifier so a hostile envelope can't splice SQL.
    * The reference interpolates unchecked (`AdbSink.java:110`).
    */
  def checkIdent(table: String): String = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"illegal archive table name from dbTbName: '$table'")
    table
  }

  /** The 4 sink columns plus the routing key, sorted within each
    * partition so every destination table is one contiguous run — the
    * streaming writers below never hold more than one insert batch.
    */
  def routed(batch: DataFrame): DataFrame =
    batch.select(
      col("dbTbName"),
      col("id"), col("fbNo"),
      date_format(col("recordDelTime"), "yyyy-MM-dd HH:mm:ss").as("recordDelTime"),
      col("dataJson"))
      .sortWithinPartitions("dbTbName")

  /** Connection lifecycle that can never MASK the in-flight exception
    * (VERDICT r12, O8): a bare `finally conn.close()` on a connection
    * with an open transaction throws on some drivers (Derby: "Cannot
    * close a connection while a transaction is still active"), and an
    * exception thrown from `finally` REPLACES the one in flight — which
    * turned the known retryable Derby boot-race NPE into an unmatchable
    * close-error AND leaked the connection (close itself failed). On
    * failure: roll back (best-effort, its own failure swallowed), then
    * close (best-effort) — the ORIGINAL exception always propagates and
    * the connection is always released. On success: close normally, a
    * close failure there is real and may throw.
    */
  def withConnection[A](url: String, props: java.util.Properties)(
      body: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    var failed: Throwable = null
    try body(conn)
    catch { case t: Throwable => failed = t; throw t }
    finally {
      if (failed != null) {
        try { if (!conn.getAutoCommit) conn.rollback() }
        catch { case _: Throwable => () }
        try conn.close() catch { case _: Throwable => () }
      } else conn.close()
    }
  }

  /** "This (batch, partition) was already claimed." Drivers disagree on
    * the exception type for a PK violation — MySQL/Derby subclass
    * `SQLIntegrityConstraintViolationException`, PostgreSQL throws a
    * plain `SQLException`/`BatchUpdateException` — but all report
    * SQLState class 23 (integrity constraint violation, SQL standard).
    */
  def isDuplicateClaim(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23"))
}

/** JDBC batch delivery — the reference's ADB sink re-expressed
  * (`AdbSink.java:82-132`): rows are grouped per `dbTbName` and batch-
  * INSERTed into the table that key names (`AdbSink.java:106-111`),
  * one transaction per partition covering all its tables — the same
  * commit unit as the reference's one-commit-per-flush. At-least-once:
  * a retried micro-batch re-INSERTs (no upsert), duplicates possible —
  * exactly the reference's contract.
  *
  * Executor-side: rows never collect to the driver; each partition
  * opens its own connection (`foreachPartition`), addBatch/executeBatch
  * like the reference's prepared-statement loop (`AdbSink.java:111-122`).
  * Rows arrive sorted by `dbTbName`, so per-table grouping is a streamed
  * run over the iterator — O(insertBatchSize) memory, never the whole
  * partition.
  *
  * @param tableFor maps `dbTbName` to the destination table (identity =
  *   the reference's layout); override to route everything into one
  *   fixed archive table.
  */
final class JdbcBatchWriter(
    url: String,
    props: java.util.Properties,
    tableFor: String => String = identity,
    insertBatchSize: Int = 100) extends BatchWriter {
  val name = "jdbc"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, tf, p, bs) = (url, tableFor, props, insertBatchSize)
    JdbcRouting.routed(batch)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          JdbcRouting.withConnection(u, p) { conn =>
            conn.setAutoCommit(false)
            val it = rows.buffered
            while (it.hasNext) {
              val table = JdbcRouting.checkIdent(tf(it.head.getString(0)))
              val st = conn.prepareStatement(
                s"INSERT INTO $table (id, fb_no, record_del_time, data_json) VALUES (?, ?, ?, ?)")
              try {
                var n = 0
                while (it.hasNext && tf(it.head.getString(0)) == table) {
                  val r = it.next()
                  st.setString(1, r.getString(1))
                  st.setString(2, r.getString(2))
                  st.setString(3, r.getString(3))
                  st.setString(4, r.getString(4))
                  st.addBatch()
                  n += 1
                  if (n % bs == 0) st.executeBatch()
                }
                st.executeBatch()
              } finally st.close()
            }
            conn.commit() // all tables of this partition, atomically
          }
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
    ledgerTable: String,
    props: java.util.Properties,
    tableFor: String => String = identity,
    insertBatchSize: Int = 100) extends BatchWriter {
  val name = "jdbc-idempotent"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, tf, lt, p, bs, bid) = (url, tableFor, ledgerTable, props, insertBatchSize, batchId)
    JdbcRouting.routed(batch)
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          JdbcRouting.withConnection(u, p) { conn =>
            conn.setAutoCommit(false)
            val claimed =
              try {
                val claim = conn.prepareStatement(
                  s"INSERT INTO $lt (batch_id, partition_id) VALUES (?, ?)")
                claim.setLong(1, bid); claim.setInt(2, pid)
                claim.executeUpdate()
                true
              } catch {
                case e: java.sql.SQLException if JdbcRouting.isDuplicateClaim(e) =>
                  conn.rollback(); false // replayed partition: skip
              }
            if (claimed) {
              val it = rows.buffered
              while (it.hasNext) {
                val table = JdbcRouting.checkIdent(tf(it.head.getString(0)))
                val st = conn.prepareStatement(
                  s"INSERT INTO $table (id, fb_no, record_del_time, data_json) VALUES (?, ?, ?, ?)")
                try {
                  var n = 0
                  while (it.hasNext && tf(it.head.getString(0)) == table) {
                    val r = it.next()
                    st.setString(1, r.getString(1))
                    st.setString(2, r.getString(2))
                    st.setString(3, r.getString(3))
                    st.setString(4, r.getString(4))
                    st.addBatch()
                    n += 1
                    if (n % bs == 0) st.executeBatch()
                  }
                  st.executeBatch()
                } finally st.close()
              }
              conn.commit() // ledger row + data rows, atomically
            }
          }
        }
      }
  }
}

/** Row-keyed upsert JDBC delivery — exactly-once at ROW granularity
  * via SQL-standard MERGE, the opt-in upgrade past both the
  * reference's at-least-once INSERT (`AdbSink.java:111,128-130`: a
  * retry after a partial flush re-inserts everything it already
  * committed) and [[IdempotentJdbcBatchWriter]]'s partition-grain
  * ledger: here every row carries its own deterministic key
  * `(run_id, batch_id, seq)` and lands through
  * `MERGE ... WHEN NOT MATCHED THEN INSERT`, so a replay of any
  * subset — whole batch, one partition, or a half-committed retry
  * against a backend without transactional batches — inserts each row
  * at most once. This is the deterministic-label discipline the
  * Stream Load sink (O9) already has, applied to the JDBC sink (O8).
  *
  * `seq` = `partition_id << 32 | row index` over rows sorted by FULL
  * content within the partition — deterministic under the same
  * replayed-partitioning assumption the ledger writer documents.
  * Destination tables need the three key columns and
  * `PRIMARY KEY (run_id, batch_id, seq)`.
  *
  * The MERGE text is SQL standard; only the one-row source relation is
  * dialect (`SYSIBM.SYSDUMMY1` on Derby/DB2 — the embedded test
  * backend — `DUAL` on Oracle/MySQL), so it's a constructor knob.
  *
  * TRUST-BUT-VERIFY (r17): after each table segment's MERGEs, the
  * writer counts the segment's key range IN the open transaction and
  * throws if any row is missing. Motivation: embedded Derby was
  * observed (once under full-suite machine load, r17 — and once
  * historically, then attributed to a cross-suite race the forked-JVM
  * isolation has since removed) to silently apply only part of a MERGE
  * batch: no exception, commit succeeds, rows missing. The exactly-once
  * contract rests on the store not lying about what it applied, so the
  * writer checks instead of assuming: a shortfall fails the task
  * LOUDLY, and the retry heals row-granularly (MERGE is idempotent) —
  * on a cluster this is self-healing; in local[n] (maxFailures=1) it
  * surfaces as a diagnosable job failure instead of silent data loss.
  * Cost: one indexed COUNT per (partition, table) segment, on the
  * primary key.
  */
final class UpsertJdbcBatchWriter(
    url: String,
    runId: String,
    props: java.util.Properties,
    tableFor: String => String = identity,
    insertBatchSize: Int = 100,
    dualTable: String = "SYSIBM.SYSDUMMY1") extends BatchWriter {
  val name = "jdbc-upsert"

  def write(batch: DataFrame, batchId: Long): Unit = {
    val (u, rid, tf, p, bs, bid, dual) =
      (url, runId, tableFor, props, insertBatchSize, batchId, dualTable)
    JdbcRouting.routed(batch)
      // full-content sort => row index within the partition is a pure
      // function of the partition's row SET, stable across replays
      .sortWithinPartitions("dbTbName", "id", "fbNo", "recordDelTime", "dataJson")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var idx = 0L
          JdbcRouting.withConnection(u, p) { conn =>
            conn.setAutoCommit(false)
            val it = rows.buffered
            while (it.hasNext) {
              val table = JdbcRouting.checkIdent(tf(it.head.getString(0)))
              val segStart = (pid.toLong << 32) | idx
              var n = 0
              val st = conn.prepareStatement(
                s"""MERGE INTO $table t USING $dual
                   |ON t.run_id = ? AND t.batch_id = ? AND t.seq = ?
                   |WHEN NOT MATCHED THEN INSERT
                   |  (run_id, batch_id, seq, id, fb_no, record_del_time, data_json)
                   |  VALUES (?, ?, ?, ?, ?, ?, ?)""".stripMargin)
              try {
                while (it.hasNext && tf(it.head.getString(0)) == table) {
                  val r = it.next()
                  val seq = (pid.toLong << 32) | idx
                  st.setString(1, rid); st.setLong(2, bid); st.setLong(3, seq)
                  st.setString(4, rid); st.setLong(5, bid); st.setLong(6, seq)
                  st.setString(7, r.getString(1))
                  st.setString(8, r.getString(2))
                  st.setString(9, r.getString(3))
                  st.setString(10, r.getString(4))
                  st.addBatch()
                  idx += 1
                  n += 1
                  if (n % bs == 0) st.executeBatch()
                }
                st.executeBatch()
              } finally st.close()
              // trust-but-verify (see class doc): the segment's full key
              // range must be present IN this transaction before commit;
              // a silent partial apply fails the task loudly and the
              // retry heals row-granularly
              val vq = conn.prepareStatement(
                s"SELECT COUNT(*) FROM $table WHERE run_id = ? AND batch_id = ? " +
                  "AND seq >= ? AND seq < ?")
              try {
                vq.setString(1, rid); vq.setLong(2, bid)
                vq.setLong(3, segStart); vq.setLong(4, (pid.toLong << 32) | idx)
                val rs = vq.executeQuery()
                rs.next()
                val found = rs.getLong(1)
                if (found != n) throw new IllegalStateException(
                  s"upsert verification failed for $table run=$rid batch=$bid " +
                    s"partition=$pid: merged $n rows, store holds $found in the " +
                    "segment's key range — silent partial apply; failing the " +
                    "task so the retry re-merges")
              } finally vq.close()
            }
            conn.commit()
          }
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
        // rows arrive sorted by (table, json): each table is one
        // contiguous run, so chunks stream off the iterator with
        // O(chunkSize) heap — a hot table's whole micro-batch is NEVER
        // partition-resident (the r2 memory cliff). Label sequence is
        // identical to grouping the whole partition: same sort, same
        // per-table chunk order.
        val it = rows.map(r => (r.getString(0), r.getString(1))).buffered
        while (it.hasNext) {
          // same whitelist as the JDBC writers: the table name comes from
          // CDC data and is spliced into labels, transport URLs and
          // filesystem paths — reject anything that isn't an identifier
          val table = JdbcRouting.checkIdent(it.head._1)
          var idx = 0
          while (it.hasNext && it.head._1 == table) {
            val chunk = new scala.collection.mutable.ArrayBuffer[String](cs)
            while (chunk.size < cs && it.hasNext && it.head._1 == table)
              chunk += it.next()._2
            val label = s"graft_${rid}_${batchId}_${table}_$idx"
            val body = chunk.mkString("[", ",", "]")
            tr.put(table, label, body) match {
              case LoadResult.Success | LoadResult.LabelAlreadyExists => ()
              case LoadResult.Failure(msg) =>
                throw new RuntimeException(s"stream load failed for $label: $msg")
            }
            idx += 1
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

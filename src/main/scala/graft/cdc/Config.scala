package graft.cdc

import java.io.{FileInputStream, InputStream}
import scala.jdk.CollectionConverters._

/** Task/sink configuration — same shape and validation semantics as the
  * reference's YAML config layer
  * (`/root/reference/save-del-his-job/src/main/java/com/jly/flink/config/TaskConfig.java:14-31`,
  * `SinkConfig.java:13-22`, `ConfigLoader.java:16-27`,
  * `TaskConfigChecker.java:15-34`). Field names match the YAML keys.
  */
/** @param serverId INERT in this engine, kept for YAML compatibility:
  *   the reference hands it to `MySqlSource.builder().serverId(...)`
  *   (`StartJob.java:69`) where it namespaces binlog client ids per
  *   instance (allocation table in the reference's resources). Our
  *   sources are file streams of identical envelopes (SURVEY.md §3.1,
  *   zero-egress environment — no binlog client exists to claim an id),
  *   so the field is parsed, validated as present, and never read. A
  *   real MySQL-CDC source module would thread it straight through.
  */
final case class SourceConfig(
    instanceName: String,
    serverId: String,
    host: String,
    port: Int,
    username: String,
    password: String,
    fbNo: String,
    dbName: String)

final case class TaskConfig(
    dbAlias: String,
    tables: Seq[String],
    sources: Seq[SourceConfig])

final case class SinkConfig(
    host: String,
    port: Int,
    username: String,
    password: String,
    dbName: String,
    batchSize: Int = 100,        // SinkConfig.java:20 default
    flushIntervalMs: Long = 5000) // SinkConfig.java:21 default

/** YAML → case classes via SnakeYAML (shipped with the Spark jars).
  * Decoded from plain maps rather than constructor injection — no
  * arbitrary-type instantiation from untrusted YAML.
  */
object ConfigLoader {

  private def asMap(any: Any): Map[String, Any] = any match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case other =>
      throw new IllegalArgumentException(s"expected a YAML mapping, got: $other")
  }

  private def str(m: Map[String, Any], k: String, default: Option[String] = None): String =
    m.get(k).map(_.toString).orElse(default)
      .getOrElse(throw new IllegalArgumentException(s"missing config key: $k"))

  private def int(m: Map[String, Any], k: String, default: Option[Int] = None): Int =
    m.get(k).map(_.toString.toInt).orElse(default)
      .getOrElse(throw new IllegalArgumentException(s"missing config key: $k"))

  def loadTask(in: InputStream): TaskConfig = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](in))
    val tables = root.getOrElse("tables", new java.util.ArrayList[Any]()) match {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case _ => Seq.empty
    }
    val sources = root.getOrElse("sources", new java.util.ArrayList[Any]()) match {
      case l: java.util.List[_] => l.asScala.map(asMap).map { s =>
        SourceConfig(
          instanceName = str(s, "instanceName"),
          serverId = str(s, "serverId", Some("")),
          host = str(s, "host"),
          port = int(s, "port", Some(3306)),
          username = str(s, "username"),
          password = str(s, "password"),
          fbNo = str(s, "fbNo"),
          dbName = str(s, "dbName"))
      }.toSeq
      case _ => Seq.empty
    }
    TaskConfig(dbAlias = str(root, "dbAlias"), tables = tables, sources = sources)
  }

  def loadTask(path: String): TaskConfig = {
    val in = new FileInputStream(path)
    try loadTask(in) finally in.close()
  }

  def loadSink(in: InputStream): SinkConfig = {
    val m = asMap(new org.yaml.snakeyaml.Yaml().load[Any](in))
    SinkConfig(
      host = str(m, "host"),
      port = int(m, "port"),
      username = str(m, "username"),
      password = str(m, "password"),
      dbName = str(m, "dbName"),
      batchSize = int(m, "batchSize", Some(100)),
      flushIntervalMs = int(m, "flushIntervalMs", Some(5000)).toLong)
  }

  def loadSink(path: String): SinkConfig = {
    val in = new FileInputStream(path)
    try loadSink(in) finally in.close()
  }
}

/** Validation ≡ `TaskConfigChecker.java:15-34`: reject empty `tables`,
  * empty `sources`, and duplicate `instanceName`s.
  */
object TaskConfigChecker {
  def check(cfg: TaskConfig): TaskConfig = {
    require(cfg.tables.nonEmpty, "task config: `tables` must not be empty")
    require(cfg.sources.nonEmpty, "task config: `sources` must not be empty")
    val dup = cfg.sources.groupBy(_.instanceName).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty, s"task config: duplicate instanceName(s): ${dup.mkString(", ")}")
    cfg
  }
}

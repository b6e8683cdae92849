package graft.cdc

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for the Debezium envelope parser — one case per
  * reference branch (FIXTURES.md §A table; StartJob.java:113-165).
  */
class DebeziumSpec extends AnyFunSuite {

  private val validDelete =
    """{"op":"d","ts_ms":1754956800123,
      |"source":{"db":"cbs","table":"t_loan_order"},
      |"before":{"id":1001,"amount":"12345.67","status":"CLOSED",
      |"created_at":"2025-11-01T08:00:00Z"},
      |"after":null}""".stripMargin.replaceAll("\n", "")

  private val golden: Seq[(String, String)] = Seq(
    // (envelope, expected classification)
    (validDelete, Debezium.Kept),
    ("""{"op":"i","ts_ms":1,"source":{"table":"t"},"before":null,"after":{"id":1}}""", Debezium.NotDelete),
    ("""{"op":"u","ts_ms":1,"source":{"table":"t"},"before":{"id":1},"after":{"id":1}}""", Debezium.NotDelete),
    ("""{"op":"d","ts_ms":1,"source":{"db":"x"},"before":{"id":1}}""", Debezium.NoTable),
    ("""{"op":"d","ts_ms":1,"source":{"table":"  "},"before":{"id":1}}""", Debezium.NoTable),
    ("""{"op":"d","ts_ms":1,"source":{"table":"t"},"before":null}""", Debezium.NoBefore),
    ("""{"op":"d","ts_ms":1,"source":{"table":"t"},"before":{"name":"x"}}""", Debezium.NoId),
    ("""{"op":"d","source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    ("""{"op":"d","ts_ms":0,"source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    ("""{"op":"d","ts_ms":-5,"source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    ("""{"op":"d","ts_ms":"oops","source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    // try_cast alignment (r3): the largest REPRESENTABLE epoch (micros
    // fit a long) and a '+'-signed value are Kept by BOTH the spec form
    // and the hot path; a castable-but-unrepresentable long (would
    // overflow timestamp_millis and kill a streaming job) and a Long
    // overflow are BadTs drops in both — the taxonomies never diverge
    (s"""{"op":"d","ts_ms":${Debezium.MaxTsMs},"source":{"table":"t"},"before":{"id":1}}""", Debezium.Kept),
    ("""{"op":"d","ts_ms":"+123","source":{"table":"t"},"before":{"id":1}}""", Debezium.Kept),
    ("""{"op":"d","ts_ms":9223372036854775807,"source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    ("""{"op":"d","ts_ms":"12345678901234567890","source":{"table":"t"},"before":{"id":1}}""", Debezium.BadTs),
    ("""not json at all""", Debezium.Malformed),
    ("""{}""", Debezium.NotDelete),
  )

  private def envDf(envs: Seq[String]) = {
    import spark.implicits._
    envs.toDF("value")
  }

  test("every golden case classifies to its reference branch") {
    val got = envDf(golden.map(_._1))
      .select(col("value"), Debezium.classify(col("value")).as("reason"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    for (((env, expected), (_, actual)) <- golden.zip(got))
      assert(actual === expected, s"envelope: $env")
  }

  test("parseChanges keeps only valid deletes and extracts the reference's fields") {
    val out = Debezium.parseChanges(envDf(golden.map(_._1)), "inst-1").collect()
    assert(out.length === golden.count(_._2 == Debezium.Kept))
    val r = out.find(_.getAs[String]("id") == "1001").get
    assert(r.getAs[String]("instanceName") === "inst-1")
    assert(r.getAs[String]("tableName") === "t_loan_order")
    // numeric id stringified (StartJob.java:160)
    assert(r.getAs[String]("id") === "1001")
    // ts_ms → timestamp (rendered yyyy-MM-dd HH:mm:ss at sink time)
    val rendered = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(r.getAs[java.sql.Timestamp]("recordDelTime").toInstant)
    assert(rendered === "2025-08-12 00:00:00")
    // decimal-as-string preserved verbatim inside the opaque pre-image
    val dataJson = r.getAs[String]("dataJson")
    assert(dataJson.contains("\"amount\":\"12345.67\""))
    assert(dataJson.contains("\"id\":1001"))
  }

  test("string ids survive as-is") {
    val env = """{"op":"d","ts_ms":5,"source":{"table":"t"},"before":{"id":"ABC-9"}}"""
    val out = Debezium.parseChanges(envDf(Seq(env)), "i").collect()
    assert(out.head.getAs[String]("id") === "ABC-9")
  }

  test("dropCounts reports the full taxonomy (fast json_tuple path = spec path)") {
    val counts = Debezium.dropCounts(envDf(golden.map(_._1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = golden.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(counts === expected)
    assert(counts(Debezium.Kept) === 3)
    assert(counts(Debezium.BadTs) === 6)
    assert(counts(Debezium.Malformed) === 1)
    assert(counts(Debezium.NotDelete) === 3)
  }

  test("deadLetters partitions the stream with parseChanges: kept + dead == total, disjoint") {
    val envs = golden.map(_._1)
    val dead = Debezium.deadLetters(envDf(envs)).collect()
    val kept = Debezium.parseChanges(envDf(envs), "t").count()
    assert(dead.length + kept === envs.length.toLong,
      "dead letters + kept rows must partition the input")
    // each dead row carries the golden branch's reason and a stable id
    val reasons = dead.map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    val expected = golden.filter(_._2 != Debezium.Kept)
      .groupBy(_._2).view.mapValues(_.size).toMap
    assert(reasons === expected)
    assert(dead.map(_.getString(1)).distinct.length === dead.length,
      "md5 replay ids must be unique for distinct envelopes")
  }

  test("observe exposes drop counters to a batch listener") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var metrics: Option[Map[String, Long]] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val om = qe.observedMetrics
        om.get("cdc_parse").foreach { row =>
          metrics = Some(row.schema.fieldNames.zipWithIndex
            .map { case (f, i) => f -> row.getLong(i) }.toMap)
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Debezium.parseChanges(envDf(golden.map(_._1)), "i", Some("cdc_parse")).collect()
      // listener delivery is async
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val m = metrics.getOrElse(fail("observe metrics never arrived"))
      assert(m("total") === golden.size.toLong)
      assert(m("kept") === 3L)
      assert(m(Debezium.BadTs) === 6L)
      assert(m(Debezium.Malformed) === 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("tables allowlist: unlisted db.table drops as not_listened, spec and hot path agree") {
    val allowed = Seq("cbs.t_loan_order")
    val cases = Seq(
      (validDelete, Debezium.Kept),
      // unlisted named tables drop as not_listened whatever their op —
      // the reference's connector never emits them (StartJob.java:66-67)
      ("""{"op":"d","ts_ms":1,"source":{"db":"cbs","table":"t_other"},"before":{"id":1}}""", Debezium.NotListened),
      ("""{"op":"i","ts_ms":1,"source":{"db":"cbs","table":"t_other"},"before":null,"after":{"id":1}}""", Debezium.NotListened),
      // db-SCOPED like the reference's tableList: a listed table name
      // under the wrong database — or with no db at all — is unlisted
      ("""{"op":"d","ts_ms":1,"source":{"db":"otherdb","table":"t_loan_order"},"before":{"id":1}}""", Debezium.NotListened),
      ("""{"op":"d","ts_ms":1,"source":{"table":"t_loan_order"},"before":{"id":1}}""", Debezium.NotListened),
      // a blank/missing table can't match the list: shape taxonomy wins
      ("""{"op":"d","ts_ms":1,"source":{"db":"cbs","table":"  "},"before":{"id":1}}""", Debezium.NoTable),
      ("""{"op":"d","ts_ms":1,"source":{"db":"x"},"before":{"id":1}}""", Debezium.NoTable),
      ("""not json at all""", Debezium.Malformed))
    // spec form
    val spec = envDf(cases.map(_._1))
      .select(Debezium.classify(col("value"), Some(allowed)).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(spec === cases.map(_._2))
    // hot path (dropCounts groups over the same json_tuple extraction)
    val counts = Debezium.dropCounts(envDf(cases.map(_._1)), Some(allowed))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === cases.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    // parseChanges keeps only the listed table's valid delete
    val kept = Debezium.parseChanges(
      envDf(cases.map(_._1)), "i", allowedTables = Some(allowed)).collect()
    assert(kept.map(_.getAs[String]("tableName")).toSeq === Seq("t_loan_order"))
    // and with no allowlist the same envelopes keep all FOUR valid
    // deletes (t_other, wrong-db and no-db included)
    assert(Debezium.parseChanges(envDf(cases.map(_._1)), "i").count() === 4)
  }

  test("enrich adds dbTbName/fbNo via the config join (O7)") {
    import spark.implicits._
    val parsed = Debezium.parseChanges(envDf(Seq(validDelete)), "src-a")
    val sources = Seq(("src-a", "cbs", "FBA"), ("src-b", "cap", "FBB"))
      .toDF("instanceName", "dbAlias", "fbNo")
    val out = Debezium.enrich(parsed, sources).as[TargetDataRow].collect()
    assert(out.length === 1)
    assert(out.head.dbTbName === "cbs_t_loan_order")
    assert(out.head.fbNo === "FBA")
  }
}

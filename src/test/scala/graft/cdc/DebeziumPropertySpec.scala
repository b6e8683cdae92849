package graft.cdc

import graft.TestSpark._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parser check: envelopes are GENERATED with known
  * defects, the expected drop reason is derived from the generation
  * parameters alone (an independent Scala model of
  * StartJob.java:113-165), and the Spark-side classifier must agree on
  * every sample.
  */
class DebeziumPropertySpec extends AnyFunSuite {

  private case class EnvSpec(
      op: Option[String],
      table: Option[String],
      blankTable: Boolean,
      beforeNull: Boolean,
      withId: Boolean,
      idValue: String,
      tsMs: Option[Long])

  private val genSpec: Gen[EnvSpec] = for {
    op <- Gen.option(Gen.oneOf("d", "i", "u", "c", "r", ""))
    table <- Gen.option(Gen.oneOf("t_orders", "t_loan", "x"))
    blankTable <- Gen.oneOf(true, false, false, false)
    beforeNull <- Gen.oneOf(true, false, false, false)
    withId <- Gen.oneOf(true, true, true, false)
    idValue <- Gen.oneOf("1001", "\"ABC-9\"", "0", "\"\"")
    tsMs <- Gen.option(Gen.oneOf(-1L, 0L, 1L, 1700000000000L, 9999999999999L,
      Debezium.MaxTsMs, Debezium.MaxTsMs + 1, Long.MaxValue))
  } yield EnvSpec(op, table, blankTable, beforeNull, withId, idValue, tsMs)

  private def render(s: EnvSpec): String = {
    val sb = new StringBuilder("{")
    s.op.foreach(o => sb.append(s""""op":"$o","""))
    s.tsMs.foreach(t => sb.append(s""""ts_ms":$t,"""))
    val tbl = if (s.blankTable) Some("  ") else s.table
    tbl.foreach(t => sb.append(s""""source":{"db":"demo","table":"$t"},"""))
    val before =
      if (s.beforeNull) "null"
      else if (s.withId) s"""{"id":${s.idValue},"k":1}"""
      else """{"k":1}"""
    sb.append(s""""before":$before}""")
    sb.toString
  }

  /** Independent model of the reference's branch order. */
  private def expected(s: EnvSpec): String =
    if (!s.op.contains("d")) Debezium.NotDelete
    else if (s.blankTable || s.table.isEmpty) Debezium.NoTable
    else if (s.beforeNull) Debezium.NoBefore
    else if (!s.withId) Debezium.NoId
    else if (s.tsMs.forall(t => t <= 0 || t > Debezium.MaxTsMs)) Debezium.BadTs
    else Debezium.Kept

  test("classifier agrees with the independent model on 300 random envelopes") {
    import spark.implicits._
    val samples = Gen.listOfN(300, genSpec).sample.get
    val df = samples.map(render).toDF("value")
    val got = Debezium.dropCounts(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = samples.map(expected).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)

    // and per-row: classify() (the spec form) agrees with the model too
    val perRow = df.select(org.apache.spark.sql.functions.col("value"),
      Debezium.classify(org.apache.spark.sql.functions.col("value")).as("r"))
      .collect().map(_.getString(1))
    for ((s, actual) <- samples.zip(perRow))
      assert(actual === expected(s), s"envelope: ${render(s)}")
  }

  /** Kept-by-construction envelopes: every field drawn from the valid
    * side of its branch. Filtering `genSpec` for Kept is a coin flip —
    * the joint probability of all five branches passing is well under
    * 1%, so a 200-sample filter lands empty often enough to flake.
    */
  private val genKept: Gen[EnvSpec] = for {
    table <- Gen.oneOf("t_orders", "t_loan", "x")
    idValue <- Gen.oneOf("1001", "\"ABC-9\"", "0", "\"\"")
    tsMs <- Gen.oneOf(1L, 1700000000000L, Debezium.MaxTsMs)
  } yield EnvSpec(Some("d"), Some(table), blankTable = false,
    beforeNull = false, withId = true, idValue, Some(tsMs))

  test("kept envelopes round-trip id and ts exactly") {
    import spark.implicits._
    val kept = Gen.listOfN(200, genKept).sample.get
    // the independent model must agree these are all Kept — a branch
    // drift here means genKept and the model disagree, not luck
    for (s <- kept) assert(expected(s) == Debezium.Kept, s"not kept: $s")
    val df = kept.map(render).toDF("value")
    val rows = Debezium.parseChanges(df, "pt").collect()
    assert(rows.length === kept.size)
    val got = rows.map(r => (r.getAs[String]("id"),
      r.getAs[java.sql.Timestamp]("recordDelTime").getTime)).sorted.toSeq
    val want = kept.map(s => (s.idValue.stripPrefix("\"").stripSuffix("\""),
      s.tsMs.get)).sorted
    assert(got === want)
  }
}

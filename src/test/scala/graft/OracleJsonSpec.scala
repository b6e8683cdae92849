package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate reads `oracle_sql.json` with a strict
  * JSON parser; if Verify's hand-rolled escaping ever emits an invalid
  * document the whole round's correctness silently zeroes. Pin the
  * escape round-trip against a real parser (Jackson, shipped with
  * Spark) on both hostile strings and the actual oracle inventory.
  */
class OracleJsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseString(escaped: String): String =
    mapper.readTree(escaped).asText()

  test("jsonStr round-trips hostile strings through a real JSON parser") {
    val hostile = Seq(
      "plain",
      "quotes \" inside \" twice",
      "back\\slash and \\\" mix",
      "newline\nand\r\nCRLF",
      "tab\there",
      "control  chars",
      "unicode déjà vu — “smart” quotes",
      "",
      "trailing backslash \\")
    for (s <- hostile)
      assert(parseString(Verify.jsonStr(s)) === s, s"round-trip broke for: $s")
  }

  test("the full oracle_sql.json payload parses and covers every oracled query") {
    val tree = mapper.readTree(Verify.oracleJson)
    assert(tree.isObject, "oracle_sql.json must be a JSON object")
    val keys = {
      val it = tree.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys.toSet === SparkEntry.oracleSql.keySet,
      "every oracle entry must survive serialization, no extras")
    // and each value must round-trip byte-identically: the driver runs
    // this SQL verbatim against DuckDB
    for ((k, sql) <- SparkEntry.oracleSql)
      assert(tree.get(k).asText() === sql, s"SQL for $k mutated in transit")
  }
}

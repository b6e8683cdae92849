package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line from the last 2000 chars
  * of stdout; an oversized or malformed line silently loses the round's
  * bench numbers. Pin both properties on the real inventory and on
  * hostile error payloads.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def realResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234)

  test("the full-inventory line parses as JSON and stays under budget") {
    val line = Bench.renderLine(realResults, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length < 1700,
      s"bench line is ${line.length} chars — too close to the driver's 2000-char tail")
    val tree = mapper.readTree(line)
    assert(tree.get("metric").asText() === "total")
    assert(tree.get("queries").size() === SparkEntry.queries.size)
    // every query id prefix survives as a key exactly once (uniqueness
    // is separately preflighted in Bench.main)
    val ids = realResults.map(_._1.takeWhile(_ != '_')).toSet
    val it = tree.get("queries").fieldNames()
    val keys = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSet
    assert(keys === ids)
  }

  test("an all-failure round still fits the tail and parses") {
    val errs = SparkEntry.queries.keys.toSeq.sorted.map(
      _ -> ("boom \"quoted\" \\slash\n" + "x" * 60).take(60))
    val line = Bench.renderLine(realResults.map { case (k, _) => k -> -1.0 },
      errs, "/root/testdata/sf0.1")
    assert(line.length < 1900, s"all-failure line is ${line.length} chars")
    val tree = mapper.readTree(line)
    assert(tree.get("errors").size() > 0, "some errors must survive the budget")
    // truncation is declared, never silent
    if (tree.get("errors").size() < errs.size)
      assert(tree.get("errors").has("_truncated"))
  }

  test("inventory growth past the fixed-parts budget fails loudly") {
    // ~200 queries would push the fixed parts past 1760 chars; that must
    // surface as a build-time failure, not a silent driver parse miss
    val huge = (1 to 200).map(i => f"zz$i%03d_q" -> 1.234)
    val e = intercept[IllegalArgumentException] {
      Bench.renderLine(huge, Seq.empty, "/d")
    }
    assert(e.getMessage.contains("outgrown"))
  }

  test("errored queries report -1, never a flattering elapsed time") {
    val line = Bench.renderLine(
      Seq("q01_x" -> -1.0, "q02_y" -> 2.5), Seq("q01_x" -> "err"), "/d")
    val tree = mapper.readTree(line)
    assert(tree.get("queries").get("q01").asDouble() === -1.0)
    assert(tree.get("value").asDouble() === 2.5, "total must exclude errored runs")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line from the last 2000 chars
  * of stdout; an oversized or malformed line silently loses the round's
  * bench numbers. Measured across the r1-r8 driver tails, the sbt block
  * AFTER the line is ~75 chars on success and ~160 chars when Bench
  * exits 1, so the hard line cap is 2000-160 ≈ 1830. Pin both size and
  * parseability on the real inventory and on hostile error payloads.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def realResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1.234)

  test("shortId strips zero padding + family codes; stays a bijection on the inventory") {
    assert(Bench.shortId("dd03_minhash") === "d3")
    assert(Bench.shortId("cdc01_x") === "c1")
    assert(Bench.shortId("dc01_overlap") === "e1")
    assert(Bench.shortId("tx13_bm25") === "x13")
    assert(Bench.shortId("q50_pivot") === "q50")
    assert(Bench.shortId("q05_hypothetical") === "q5")
    assert(Bench.shortId("entry") === "entry")
    val ids = SparkEntry.queries.keys.toSeq.map(Bench.shortId)
    assert(ids.distinct.size === ids.size,
      "zero-strip + family codes must not collide two canonical ids")
  }

  test("the full-inventory line parses as JSON and stays under budget") {
    val line = Bench.renderLine(realResults, Seq.empty, "/root/testdata/sf0.1")
    // success tail: 2000-char driver window minus ~75 chars of sbt
    // [success] suffix → cap ~1900; renderLine's own require fires at
    // 1860, so this assert only guards against the require drifting up
    // (r10's 157 queries render ~1810)
    assert(line.length < 1870,
      s"bench line is ${line.length} chars — too close to the driver's 2000-char tail")
    assert(!line.contains("\"errors\""),
      "a clean run must not spend chars on an empty errors object")
    val tree = mapper.readTree(line)
    assert(tree.get("metric").asText() === "total")
    assert(tree.get("sf").isNumber, "sf must render as a bare number for sfN.N dirs")
    assert(tree.get("sf").asDouble() === 0.1)
    assert(tree.get("queries").size() === SparkEntry.queries.size)
    // every query id survives as a key exactly once (uniqueness is
    // separately preflighted in Bench.main)
    val ids = realResults.map(r => Bench.shortId(r._1)).toSet
    val it = tree.get("queries").fieldNames()
    val keys = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSet
    assert(keys === ids)
  }

  test("an all-failure round still fits the tail and parses") {
    val errs = SparkEntry.queries.keys.toSeq.sorted.map(
      _ -> ("boom \"quoted\" \\slash\n" + "x" * 60).take(60))
    val line = Bench.renderLine(realResults.map { case (k, _) => k -> -1.0 },
      errs, "/root/testdata/sf0.1")
    assert(line.length < 1840, s"all-failure line is ${line.length} chars")
    val tree = mapper.readTree(line)
    assert(tree.get("errors").size() > 0, "some errors must survive the budget")
    // truncation is declared, never silent
    if (tree.get("errors").size() < errs.size)
      assert(tree.get("errors").has("_truncated"))
  }

  test("error render degrades to the bare line when the budget is already spent") {
    // Construct a results map whose bare render lands in (1788, 1859]:
    // under renderLine's 1860 success require, but past the error path's
    // 1830-13-30 budget. The old code appended ',"errors":{"_truncated"...}'
    // anyway, pushing an ERRORED line past the 1830 error-tail cap —
    // exactly when the driver needs the JSON. Now it must emit the bare
    // line (no errors object): -1 sentinels + exit 1 still signal failure.
    // the -1 sentinel render is what the guard sees on a failed run, so
    // search with the values the failing call will actually carry: a mix
    // of successes (4-char "1.23") and errored -1s
    def resultsFor(n: Int): Seq[(String, Double)] =
      (1 to n).map(i => f"zz$i%03d_q" -> (if (i <= 3) -1.0 else 1.234))
    val hit = (80 to 260).iterator.map(resultsFor).find { rs =>
      // past ~1860 bare chars renderLine's success require throws — that
      // n is beyond the window being searched, not a hit
      scala.util.Try(Bench.renderLine(rs, Seq.empty, "/d")).toOption
        .exists(b => b.length > 1830 - 13 - 30 && b.length < 1860)
    }
    assert(hit.nonEmpty, "no inventory size lands in the degraded window — budgets changed?")
    val rs = hit.get
    val line = Bench.renderLine(rs,
      rs.take(3).map { case (k, _) => k -> "boom" }, "/d")
    assert(line.length <= 1830, s"errored line is ${line.length} chars — past the error-tail cap")
    val tree = mapper.readTree(line)
    assert(!line.contains("\"errors\""),
      "a spent budget must drop the errors object entirely, not truncate past the cap")
    assert(tree.get("queries").size() === rs.size)
  }

  test("inventory growth past the fixed-parts budget fails loudly") {
    // ~200 queries push the fixed parts past the 1860 require; that must
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
    assert(tree.get("queries").get("q1").asDouble() === -1.0)
    assert(tree.get("value").asDouble() === 2.5, "total must exclude errored runs")
  }

  test("value rendering: trailing zeros stripped, still valid JSON numbers") {
    val line = Bench.renderLine(
      Seq("a1_x" -> 0.701, "a2_y" -> 2.0, "a3_z" -> 0.04), Seq.empty, "/d")
    val tree = mapper.readTree(line)
    // r11: driver-line precision is 1 decimal (100 ms — the 2-decimal
    // render outgrew the tail at 174 queries; full precision lives in
    // target/bench_full.json)
    assert(tree.get("queries").get("a1").asDouble() === 0.7)
    assert(tree.get("queries").get("a2").asDouble() === 2.0)
    assert(tree.get("queries").get("a3").asDouble() === 0.0)
    // non-sfN.N dir falls back to the quoted path
    assert(tree.get("sf").asText() === "/d")
  }
}

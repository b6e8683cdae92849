package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's single JSON line from the last 2000 chars
  * of stdout; an oversized or malformed line silently loses the round's
  * bench numbers. Measured across the r1-r8 driver tails, the sbt block
  * AFTER the line is ~75 chars on success and ~160 chars when Bench
  * exits 1, so the hard line cap is 2000-160 ≈ 1830.
  *
  * r12: the line carries per-FAMILY subtotals (size bounded by family
  * count, not query count); full per-query precision moves to the
  * [[Bench.renderFull]] side artifact. This spec pins: the compact
  * line's size is independent of inventory growth (the VERDICT r11
  * "≥60 more queries must fit" bound, proven here at +600), the full
  * artifact preserves 3-decimal per-query precision in the exact shape
  * bench_gate.py parses, and both stay locale-independent strict JSON.
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

  test("family keys are digit-free (the gate's compact-format detector) and stable") {
    assert(Bench.family("dd03_minhash") === "dd")
    assert(Bench.family("cdc10_dlq") === "cdc")
    assert(Bench.family("q57_rank") === "q")
    assert(Bench.family("entry") === "entry")
    // digit-free must hold for HOSTILE future ids too, not just the
    // current inventory — interior digits and all-digit prefixes are
    // exactly what would silently defeat bench_gate's format detection
    assert(Bench.family("v2x01_future") === "v")
    assert(Bench.family("a1b2_x") === "a")
    assert(Bench.family("123_x") === "misc")
    SparkEntry.queries.keys.foreach { k =>
      val f = Bench.family(k)
      assert(f.nonEmpty && !f.exists(_.isDigit),
        s"family key for $k is '$f' — bench_gate's format detection breaks")
    }
  }

  test("the full-inventory compact line parses, is small, and carries nq") {
    val line = Bench.renderLine(realResults, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length < 600,
      s"compact line is ${line.length} chars — family subtotals should be O(families)")
    assert(!line.contains("\"errors\""),
      "a clean run must not spend chars on an empty errors object")
    val tree = mapper.readTree(line)
    assert(tree.get("metric").asText() === "total")
    assert(tree.get("unit").asText() === "sec")
    assert(tree.get("sf").isNumber, "sf must render as a bare number for sfN.N dirs")
    assert(tree.get("sf").asDouble() === 0.1)
    assert(tree.get("nq").asInt() === SparkEntry.queries.size,
      "nq must expose the true inventory count (a shrunk inventory must stay visible)")
    val fams = SparkEntry.queries.keys.map(Bench.family).toSet
    assert(tree.get("queries").size() === fams.size)
    // subtotals reconcile with the total
    val it = tree.get("queries").elements()
    val sum = Iterator.continually(it).takeWhile(_.hasNext).map(_.next().asDouble()).sum
    assert(math.abs(sum - tree.get("value").asDouble()) < 0.5)
  }

  test("inventory growth is free: +600 queries fit the tail with room to spare") {
    // VERDICT r11 asked for proof that >= 60 more queries fit; the
    // family-subtotal design makes growth WITHIN existing families cost
    // zero chars, so prove a 10x harder bound: 600 added queries across
    // the existing families plus three brand-new families
    val grown = realResults ++
      (1 to 600).map(i => f"dd${i + 20}%02d_future" -> 0.987) ++
      Seq("zz01_new" -> 1.0, "yy01_new" -> 1.0, "xx01_new" -> 1.0)
    val line = Bench.renderLine(grown, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length < 700,
      s"line grew to ${line.length} chars under +603 queries — growth must be O(new families)")
    val tree = mapper.readTree(line)
    assert(tree.get("nq").asInt() === grown.size)
  }

  test("renderFull preserves 3-decimal per-query precision in the gate's shape") {
    val full = Bench.renderFull(
      Seq("a1_x" -> 0.701, "a2_y" -> 2.0, "q01_z" -> -1.0),
      Seq("q01_z" -> "boom"), "/root/testdata/sf0.1")
    val tree = mapper.readTree(full)
    assert(tree.get("metric").asText() === "total")
    assert(tree.get("queries").get("a1").asDouble() === 0.701,
      "the side artifact is the full-precision record — no rounding to 1 decimal")
    assert(tree.get("queries").get("a2").asDouble() === 2.0)
    assert(tree.get("queries").get("q1").asDouble() === -1.0)
    assert(tree.get("value").asDouble() === 2.701, "total must exclude errored runs")
    assert(tree.get("errors").get("q1").asText() === "boom")
    assert(tree.get("sf").asDouble() === 0.1)
  }

  test("renderFull and renderLine are locale-independent (ADVICE r11: comma-decimal JVMs)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val full = Bench.renderFull(Seq("a1_x" -> 0.701), Seq.empty, "/weird dir/with\"quote")
      val tree = mapper.readTree(full) // throws on 0,701 or unescaped quote
      assert(tree.get("queries").get("a1").asDouble() === 0.701)
      assert(tree.get("sf").asText() === "/weird dir/with\"quote",
        "non-sfN.N dirs must round-trip through escaping")
      val line = Bench.renderLine(Seq("a1_x" -> 0.701), Seq.empty, "/d")
      assert(mapper.readTree(line).get("queries").get("a").asDouble() === 0.7)
    } finally java.util.Locale.setDefault(prev)
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
    // every family subtotal is 0 on an all-failure round, and the
    // sentinel never flatters a subtotal negative
    val it = tree.get("queries").elements()
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .foreach(n => assert(n.asDouble() === 0.0))
  }

  test("errored queries are excluded from their family subtotal and the total") {
    val line = Bench.renderLine(
      Seq("q01_x" -> -1.0, "q02_y" -> 2.5), Seq("q01_x" -> "err"), "/d")
    val tree = mapper.readTree(line)
    assert(tree.get("queries").get("q").asDouble() === 2.5)
    assert(tree.get("value").asDouble() === 2.5, "total must exclude errored runs")
    assert(tree.get("errors").get("q1").asText() === "err")
    assert(tree.get("nq").asInt() === 2)
  }

  test("value rendering: family rollup, trailing zeros stripped, valid JSON numbers") {
    val line = Bench.renderLine(
      Seq("a1_x" -> 0.701, "a2_y" -> 2.0, "b1_z" -> 0.04), Seq.empty, "/d")
    val tree = mapper.readTree(line)
    // a1+a2 roll up into family "a" at 2-decimal precision
    assert(tree.get("queries").get("a").asDouble() === 2.7)
    assert(tree.get("queries").get("b").asDouble() === 0.04)
    // non-sfN.N dir falls back to the quoted path
    assert(tree.get("sf").asText() === "/d")
  }
}

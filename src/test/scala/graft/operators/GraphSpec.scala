package graft.operators

import graft.TestSpark._
import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Graph-family pins: gr01's distributed integer PageRank and gr02's
  * wedge-join triangle count are each replayed by a tiny exact in-test
  * reference over the collected (25-node) edge list — same truncating
  * integer math, so equality is bit-for-bit, no tolerance.
  */
class GraphSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.GraftQuery.all.find(_.name == name).get.build(spark, sf001)

  // nation keys are int32 in the parquet; normalize to Long here
  private def lv(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private lazy val edgeList: Seq[(Long, Long)] =
    Graph.edges(spark, sf001).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq

  test("sparsified trade graph is a real graph: non-trivial, degrees vary") {
    val deg = edgeList.groupBy(_._1).map(_._2.size)
    assert(edgeList.nonEmpty && deg.size > 1, "graph degenerate")
    assert(deg.min < deg.max, "sparsification left a regular graph — ranks would be uniform")
  }

  test("gr01: equals the exact integer power iteration over the collected edges") {
    val nations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val outdeg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val inEdges = edgeList.groupBy(_._2)
    var rank: Map[Long, Long] = nations.keys.map(_ -> 40000000L).toMap
    for (_ <- 1 to 3) {
      rank = nations.keys.map { n =>
        val s = inEdges.getOrElse(n, Seq.empty)
          .map { case (src, _) => rank(src) / outdeg(src) }.sum
        n -> (6000000L + (85L * s) / 100L)
      }.toMap
    }
    val expected = rank.map { case (k, r) => nations(k) -> r }
    val got = run("gr01_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.toSet.size > 1, "ranks uniform — graph not sparsified")
  }

  test("gr02: equals brute-force triangle enumeration over the collected edges") {
    val und = edgeList.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triangles = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield 1).size
    val row = run("gr02_triangle_count").collect().head
    assert(row.getLong(0) == und.size.toLong, "edge count mismatch")
    assert(row.getLong(1) == triangles.toLong, "triangle count mismatch")
    assert(triangles > 0, "fixture graph has no triangles — pin is vacuous")
  }
}

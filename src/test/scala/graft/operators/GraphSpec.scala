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

  /** Exact model of gr02's capped semantics: degrees over the
    * undirected edge set, hubs = degree > cap dropped from the wedge
    * join, triangles enumerated over the surviving edges.
    */
  private def cappedModel(cap: Int): (Long, Long, Long) = {
    val und = edgeList.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size }
    val hubs = deg.filter(_._2 > cap).keySet
    val kept = und.filter(e => !hubs(e._1) && !hubs(e._2))
    val nodes = kept.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triangles = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if kept((a, b)) && kept((b, c)) && kept((a, c))
    } yield 1).size
    (und.size.toLong, triangles.toLong, hubs.size.toLong)
  }

  test("gr02: equals brute-force triangle enumeration over the collected edges") {
    val (nEdges, triangles, nCapped) = cappedModel(Graph.DefaultDegCap)
    assert(nCapped == 0L, "default cap must not bind on the 25-node fixture graph")
    val row = run("gr02_triangle_count").collect().head
    assert(row.getLong(0) == nEdges, "edge count mismatch")
    assert(row.getLong(1) == triangles, "triangle count mismatch")
    assert(row.getLong(2) == 0L, "capped-vertex count must be 0 at fixture scale")
    assert(triangles > 0, "fixture graph has no triangles — pin is vacuous")
  }

  test("gr03: equals the exact 3-round k-core peel over the collected edges") {
    var e = edgeList.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val rawDeg = e.toSeq.flatMap(t => Seq(t._1, t._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size }
    val k = Graph.kcoreK(rawDeg.values.max.toLong)
    for (_ <- 1 to 3) {
      val deg = e.toSeq.flatMap(t => Seq(t._1, t._2))
        .groupBy(identity).map { case (v, vs) => v -> vs.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(t => keep(t._1) && keep(t._2))
    }
    assert(e.size < edgeList.size, "adaptive k peeled nothing — pin is vacuous")
    val deg = e.toSeq.flatMap(t => Seq(t._1, t._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val nations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val expected = deg.map { case (v, d) => nations(v) -> d }
    val got = run("gr03_kcore").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.nonEmpty, "k-core empty at fixture scale — pin is vacuous")
  }

  test("gr05 frontier-dedup BFS == gr04 recursive-CTE reachability, row for row") {
    // two algorithms (path enumeration + MIN vs per-hop frontier dedup)
    // over the same graph must land the identical (node, min_hops) set
    val viaCte = run("gr04_reachability").collect()
      .map(r => lv(r, 0) -> lv(r, 1)).toMap
    val viaBfs = run("gr05_frontier_bfs").collect()
      .map(r => lv(r, 0) -> lv(r, 1)).toMap
    assert(viaBfs == viaCte,
      s"BFS diverged from CTE: extra=${viaBfs.toSet -- viaCte.toSet} missing=${viaCte.toSet -- viaBfs.toSet}")
    // the dense trade graph reaches every node within 2 hops at fixture
    // scale; >= 2 proves the loop genuinely chains hops (non-vacuous)
    assert(viaBfs.size > 1 && viaBfs.values.max >= 2L,
      "fixture BFS never chains past hop 1 — pin is vacuous")
  }

  test("gr06: equals the exact synchronized LPA over the collected edges") {
    // independent driver-side model: same undirected edges, same
    // (max count, tie -> min label) update, same 3 synchronized rounds
    val nations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    // gr06 prunes at p90, not the family's median (see its query doc)
    val p90Edges = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val und = (p90Edges ++ p90Edges.map(_.swap)).toSet
    val nbrs = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    var lab: Map[Long, Long] = nations.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lab = nations.keys.map { n =>
        val counts = nbrs.getOrElse(n, Seq.empty).map(lab)
          .groupBy(identity).map { case (l, ls) => l -> ls.size }
        n -> (if (counts.isEmpty) n
              else counts.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1)
      }.toMap
    val sizes = lab.values.groupBy(identity).map { case (l, ls) => l -> ls.size.toLong }
    val expected = lab.map { case (n, l) => nations(n) -> ((l, sizes(l))) }
    val got = run("gr06_label_propagation").collect()
      .map(r => r.getString(0) -> ((lv(r, 1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).toSet.size > 1, "LPA collapsed to one community — pin is vacuous")
    assert(got.values.exists(_._2 > 1), "no community ever grew — propagation never happened")
  }

  test("gr02: the super-node degree cap drops hub wedges and counts them loudly") {
    // pick a cap that actually BINDS on the fixture graph so the
    // guard's semantics (not just its existence) are pinned
    val und = edgeList.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val maxDeg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size).max
    val cap = maxDeg - 1
    val (nEdges, triangles, nCapped) = cappedModel(cap)
    assert(nCapped > 0, s"cap $cap binds nowhere — test vacuous")
    spark.conf.set(Graph.DegCapKey, cap.toString)
    try {
      val row = run("gr02_triangle_count").collect().head
      assert(row.getLong(0) == nEdges, "n_edges must stay the PRE-cap inventory")
      assert(row.getLong(1) == triangles, "capped triangle count mismatch")
      assert(row.getLong(2) == nCapped, "capped-vertex accounting mismatch")
    } finally spark.conf.unset(Graph.DegCapKey)
  }

  test("gr07: equals the exact common-neighbor Jaccard over the collected edges") {
    val und = edgeList.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.toSet
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val verts = nbrs.keys.toSeq.sorted
    val expected = (for {
      x <- verts; y <- verts if x < y && !und.contains((x, y))
      common = (nbrs(x) & nbrs(y)).size.toLong if common >= 1
    } yield (x, y) -> ((common, deg(x), deg(y),
      common.toDouble / (deg(x) + deg(y) - common)))).toMap
    val got = run("gr07_link_prediction").collect()
      .map(r => (lv(r, 0), lv(r, 1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == expected, s"got ${got.size} predictions, expected ${expected.size}")
    assert(expected.nonEmpty, "no open wedges in the fixture — pin is vacuous")
    // a prediction is a NON-edge by definition
    got.keys.foreach(p => assert(!und.contains(p), s"$p is an existing edge"))
  }

  test("gr08: equals driver-side union-find over the p90 edges; graph fragments") {
    // independent ground truth: textbook union-find (path compression)
    // over the collected sparsified edge list + all nation vertices
    val e09 = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val nationKeys = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(r => lv(r, 0)).toSeq
    val parent = scala.collection.mutable.Map(nationKeys.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) r = parent(r)
      var c = v
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    e09.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize roots to the component MIN (union order above already
    // keeps the min as root, but re-derive explicitly for independence)
    val comp = nationKeys.groupBy(find).flatMap { case (_, vs) =>
      val m = vs.min; vs.map(_ -> m)
    }
    val sizes = comp.groupBy(_._2).map { case (c, vs) => c -> vs.size.toLong }
    val expected = comp.map { case (v, c) => v -> ((c, sizes(c))) }
    val got = run("gr08_connected_components").collect()
      .map(r => lv(r, 0) -> ((lv(r, 1), r.getLong(2)))).toMap
    assert(got == expected,
      s"CC diverged: extra=${got.toSet -- expected.toSet} missing=${expected.toSet -- got.toSet}")
    // non-vacuity: the p90 graph genuinely fragments AND has structure
    assert(sizes.size >= 2, "single component — fragmentation pin is vacuous")
    assert(sizes.values.max >= 2L, "all singletons — propagation never ran")
  }

  test("gr09: shuffled-label CC is row-identical to gr08") {
    // same closure, two execution strategies: broadcast labels (gr08)
    // vs hash-partitioned equi-joined labels (gr09). Any divergence is
    // a bug in one of the two loops, not a data difference.
    def rows(name: String) = run(name).collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2))).toSet
    val g8 = rows("gr08_connected_components")
    val g9 = rows("gr09_cc_shuffled")
    assert(g9 == g8,
      s"gr09 diverged from gr08: extra=${g9 -- g8} missing=${g8 -- g9}")
    assert(g8.nonEmpty, "empty CC output — equivalence pin is vacuous")
  }

  test("gr28: shuffled delta application is row-identical to gr25") {
    // same stores, same 55/80 _zz split, same deletions-first
    // composition — only the execution strategy differs (broadcast vs
    // shuffle_merge label joins, ccPointerJump vs ccShuffledFixpoint).
    // Any divergence is a bug in one of the two delta paths.
    def rows(name: String) = run(name).collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2))).toSet
    val g25 = rows("gr25_cc_mixed_delta")
    val g28 = rows("gr28_cc_delta_shuffled")
    assert(g28 == g25,
      s"gr28 diverged from gr25: extra=${g28 -- g25} missing=${g25 -- g28}")
    assert(g25.nonEmpty, "empty delta output — equivalence pin is vacuous")
  }

  test("gr23: incremental CC row-identical to gr08's rebuild; merged AND untouched components both non-vacuous") {
    def rows(name: String) = run(name).collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2))).toSet
    val rebuild = rows("gr08_connected_components")
    val inc = rows("gr23_incremental_cc")
    assert(inc == rebuild,
      s"gr23 diverged from the rebuild: extra=${inc -- rebuild} missing=${rebuild -- inc}")

    // driver replay of the split: union-find over the base (md5 < 70)
    // edges vs over the full p90 list — the delta must genuinely merge
    // some base components AND genuinely leave others untouched, or
    // the incremental path is a rename of the rebuild
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(a: Long, b: Long): Long =
      java.lang.Long.parseLong(md5hex(s"${a}_$b").substring(0, 8), 16) % 100
    val all = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val base = all.filter { case (a, b) => bucket(a, b) < 70 }
    assert(base.size < all.size, "delta split is empty — the merge pin is vacuous")
    val nationKeys = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(r => lv(r, 0)).toSeq
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nationKeys.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v; while (parent(r) != r) r = parent(r)
        var c = v; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nationKeys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
    }
    val baseComp = components(base)
    val fullComp = components(all)
    // the shipped output equals the union-graph union-find too
    assert(inc.map(t => t._1 -> t._2).toMap === fullComp,
      "gr23 labels diverge from the union-graph union-find")
    // merged polarity: >= 2 distinct base components share a full label
    val mergedGroups = baseComp.values.toSeq.distinct
      .groupBy(c => fullComp(c)).values.filter(_.size >= 2)
    assert(mergedGroups.nonEmpty,
      "no base components merged by the delta — the incremental path never exercised")
    // untouched polarity: some base component survives as a full
    // component with the SAME member set (zero work done for it)
    val baseSets = nationKeys.groupBy(baseComp).values.map(_.toSet).toSet
    val fullSets = nationKeys.groupBy(fullComp).values.map(_.toSet).toSet
    assert((baseSets & fullSets).nonEmpty,
      "every base component was touched by the delta — the untouched pin is vacuous")
  }

  test("gr24: deletion-scoped CC equals the kept-graph union-find; split, untouched, and strict scoping all non-vacuous") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def rmBucket(a: Long, b: Long): Long =
      java.lang.Long.parseLong(md5hex(s"${a}_${b}_rm").substring(0, 8), 16) % 100
    val all = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val kept = all.filter { case (a, b) => rmBucket(a, b) < 80 }
    val deleted = all.filterNot { case (a, b) => rmBucket(a, b) < 80 }
    assert(deleted.nonEmpty, "deletion set empty — every pin below is vacuous")
    val nationKeys = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(r => lv(r, 0)).toSeq
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nationKeys.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v; while (parent(r) != r) r = parent(r)
        var c = v; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nationKeys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
    }
    val fullComp = components(all)
    val keptComp = components(kept)
    val got = run("gr24_cc_edge_deletion").collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap === keptComp,
      "gr24 labels diverge from the kept-graph union-find")
    val sizes = keptComp.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(t => t._2 -> t._3).toMap === sizes.map(identity),
      "gr24 component sizes diverge from the kept-graph union-find")

    // split polarity: a full component whose members now span >= 2
    // kept components — the failure mode additions can never produce
    val members = nationKeys.groupBy(fullComp)
    assert(members.values.exists(vs => vs.map(keptComp).distinct.size >= 2),
      "no component split by the deletions — the hard path never exercised")
    // untouched polarity + strict scoping: >= 1 full component holds no
    // deleted edge, so the recompute subgraph is strictly smaller
    val affected = deleted.map { case (a, _) => fullComp(a) }.toSet
    val untouchedComps = members.keySet -- affected
    assert(untouchedComps.nonEmpty,
      "every component lost an edge — the untouched pin is vacuous")
    val subVertexCount = members.filter(kv => affected(kv._1)).values.map(_.size).sum
    assert(subVertexCount < nationKeys.size,
      "the recompute subgraph covers every vertex — scoping bought nothing")
  }

  test("gr25: mixed add+delete delta equals the post-delta union-find; split, merge, and delete-scoping all non-vacuous") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def zz(a: Long, b: Long): Long =
      java.lang.Long.parseLong(md5hex(s"${a}_${b}_zz").substring(0, 8), 16) % 100
    val all = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val g0 = all.filter { case (a, b) => zz(a, b) < 80 }       // the stored graph
    val kept = g0.filter { case (a, b) => zz(a, b) < 55 }      // survives the delete
    val deleted = g0.filterNot { case (a, b) => zz(a, b) < 55 }
    val added = all.filter { case (a, b) => zz(a, b) >= 80 }   // the insert side
    assert(deleted.nonEmpty && added.nonEmpty,
      "delta sides empty — the lifecycle pins are vacuous")
    val nationKeys = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(r => lv(r, 0)).toSeq
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nationKeys.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v; while (parent(r) != r) r = parent(r)
        var c = v; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nationKeys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
    }
    val atT = components(g0)          // what the store holds
    val afterDel = components(kept)   // stage 1's exact target
    val finalC = components(kept ++ added) // the shipped answer
    val got = run("gr25_cc_mixed_delta").collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap === finalC,
      "gr25 labels diverge from the post-delta union-find")
    val sizes = finalC.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(t => t._2 -> t._3).toMap === sizes.map(identity),
      "gr25 component sizes diverge")

    // polarity 1 — the delete path did real work: a time-T component
    // whose members span >= 2 post-delete components
    val membT = nationKeys.groupBy(atT)
    assert(membT.values.exists(vs => vs.map(afterDel).distinct.size >= 2),
      "no component split by the deletions — the delete path never exercised")
    // polarity 2 — the add path did real work: >= 2 post-delete
    // components share a final component
    val postComps = afterDel.values.toSeq.distinct
    assert(postComps.groupBy(c => finalC(c)).values.exists(_.size >= 2),
      "no components merged by the additions — the add path never exercised")
    // polarity 3 — the delete scope is strict: >= 1 time-T component
    // holds no deleted edge (its labels pass through stage 1 unread)
    val affected = deleted.map { case (a, _) => atT(a) }.toSet
    assert((membT.keySet -- affected).nonEmpty,
      "every component lost an edge — the delete scoping is vacuous")
  }

  test("gr11: equals a sequential 4-round Bellman-Ford over the collected weighted edges") {
    import org.apache.spark.sql.functions.col
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val we = Graph.weightedEdges(spark, sf001).collect()
      .map(r => (lv(r, 0), lv(r, 1), lv(r, 2)))
    val seed = (we.map(_._1) ++ we.map(_._2)).min
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = we.flatMap { case (s, d, c) => dist.get(s).map(ds => d -> (ds + c)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    val names = Tables.load(spark, sf001, "nation")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val expect = dist.map { case (n, d) => names(n) -> d }
    val got = run("gr11_sssp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"SSSP diverged: extra=${got.toSet -- expect.toSet} " +
      s"missing=${expect.toSet -- got.toSet}")
    // non-vacuity: multi-hop paths exist AND a relaxation improved on a
    // direct edge somewhere (otherwise this is just the adjacency list)
    assert(dist.size > 1 + we.count(_._1 == seed), "no multi-hop vertex reached")
    assert(dist.values.toSet.size > 2, "degenerate distance distribution")
  }

  test("gr10: shuffled keep-set k-core is row-identical to gr03") {
    // same peel, same adaptive k, two execution strategies: broadcast
    // keep-set semi joins (gr03) vs shuffle_merge left-semi (gr10).
    // Any divergence is a bug in one of the two peels.
    def rows(name: String) = run(name).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val g3 = rows("gr03_kcore")
    val g10 = rows("gr10_kcore_shuffled")
    assert(g10 == g3,
      s"gr10 diverged from gr03: extra=${g10 -- g3} missing=${g3 -- g10}")
    assert(g3.nonEmpty, "empty k-core output — equivalence pin is vacuous")
  }

  test("gr12: shuffled-rank PageRank is row-identical to gr01") {
    // same three power iterations, same integer units, two execution
    // strategies: broadcast rank table (gr01) vs hash-partitioned
    // equi-joined ranks (gr12). Any divergence is a loop bug.
    def rows(name: String) = run(name).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val g1 = rows("gr01_pagerank")
    val g12 = rows("gr12_pagerank_shuffled")
    assert(g12 == g1,
      s"gr12 diverged from gr01: extra=${g12 -- g1} missing=${g1 -- g12}")
    assert(g1.nonEmpty, "empty PageRank output — equivalence pin is vacuous")
    // non-vacuity: ranks genuinely vary (the sparsified graph is
    // irregular; a uniform answer means the iterations never ran)
    assert(g1.map(_._2).size > 1, "uniform ranks — power iteration vacuous")
  }

  test("gr14: SCC(seed) equals a sequential forward/backward closure; genuinely multi-vertex") {
    // the definition, replayed on the collected median edge list:
    // SCC(seed) = everything forward-reachable AND backward-reachable
    val out = edgeList.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val in = edgeList.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val eligible = edgeList.map(_._1).toSet intersect edgeList.map(_._2).toSet
    val seed = eligible.min
    def closure(adj: Map[Long, Set[Long]]): Set[Long] = {
      var visited = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- visited
        visited ++= next; frontier = next
      }
      visited
    }
    val scc = closure(out) intersect closure(in)
    val names = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val got = run("gr14_scc_seed").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === scc.map(names), "SCC membership diverged from the definition")
    assert(got.values.toSet === Set(scc.size.toLong), "scc_size must be the member count")
    // non-vacuity: a singleton SCC would make the directed semantics
    // indistinguishable from 'seed only' — the fixture must cycle
    assert(scc.size > 1, "seed's SCC is a singleton — directed pin is vacuous")
    // and STRICTLY smaller than the forward closure: otherwise this is
    // just gr05's reachability wearing a new name
    assert(scc.size < closure(out).size || closure(out).size < names.size,
      "SCC == forward closure == everything — direction never mattered")
  }

  test("gr15: shuffled-frontier BFS is row-identical to gr05 (and so to gr04's CTE)") {
    def rows(name: String) = run(name).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSet
    val g5 = rows("gr05_frontier_bfs")
    val g15 = rows("gr15_bfs_shuffled")
    assert(g15 == g5,
      s"gr15 diverged from gr05: extra=${g15 -- g5} missing=${g5 -- g15}")
    assert(g5.nonEmpty, "empty BFS output — equivalence pin is vacuous")
    assert(g5.map(_._2).max >= 2L, "no multi-hop vertex — the loop never iterated")
  }

  test("gr16: shuffled-dist SSSP is row-identical to gr11") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val g11 = rows("gr11_sssp")
    val g16 = rows("gr16_sssp_shuffled")
    assert(g16 == g11,
      s"gr16 diverged from gr11: extra=${g16 -- g11} missing=${g11 -- g16}")
    assert(g11.nonEmpty, "empty SSSP output — equivalence pin is vacuous")
  }

  test("gr17: shuffled-frontier seed SCC is row-identical to gr14") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val g14 = rows("gr14_scc_seed")
    val g17 = rows("gr17_scc_seed_shuffled")
    assert(g17 == g14,
      s"gr17 diverged from gr14: extra=${g17 -- g14} missing=${g14 -- g17}")
    assert(g14.nonEmpty, "empty SCC output — equivalence pin is vacuous")
    assert(g14.map(_._2).head > 1L,
      "seed SCC is a singleton — the convergence loops never iterated")
  }

  test("gr18: full FW-BW decomposition equals mutual-reachability SCCs; exact cover; gr14's class verbatim") {
    // the definition, replayed per-vertex on the collected edge list:
    // scc_id(v) = min over { u : v→*u and u→*v } (reflexively incl. v)
    val out = edgeList.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val allNations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(lv(_, 0)).toSet
    def fwdClosure(v: Long): Set[Long] = {
      var visited = Set(v); var frontier = Set(v)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(out.getOrElse(_, Set.empty)) -- visited
        visited ++= next; frontier = next
      }
      visited
    }
    val reach = allNations.map(v => v -> fwdClosure(v)).toMap
    val expected = allNations.map { v =>
      v -> (reach(v).filter(u => reach(u).contains(v)) + v).min
    }.toMap
    val got = run("gr18_scc_decomposition").collect()
      .map(r => (lv(r, 0), lv(r, 1), lv(r, 2)))
    // exact cover: every nation labeled exactly once
    assert(got.map(_._1).toSet === allNations, "labeling must cover every vertex")
    assert(got.length === allNations.size, "a vertex was labeled more than once")
    assert(got.map(t => t._1 -> t._2).toMap === expected,
      "scc_id diverged from min-mutually-reachable")
    // sizes are the class cardinalities
    val sizes = expected.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (n, id, sz) =>
      assert(sz === sizes(id), s"scc_size wrong for node $n (class $id)") }
    // non-vacuity: a genuinely multi-vertex SCC exists AND more than one
    // class exists (all-singletons or one-giant-class would each leave
    // half the algorithm untested)
    assert(sizes.values.max > 1L, "all SCCs singleton — FW-BW core never fired")
    assert(sizes.size > 1, "one giant SCC — the residual split never fired")
    // gr14's seed-SCC appears verbatim as one equivalence class
    val g14Members = run("gr14_scc_seed").collect().map(_.getString(0)).toSet
    val names = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val classes = got.groupBy(_._2).values.map(_.map(t => names(t._1)).toSet).toSet
    assert(classes.contains(g14Members),
      "gr14's seed SCC must appear as one gr18 equivalence class")
  }

  test("gr20: PPR equals the exact integer restart recurrence; seed dominates; reorders the global ranking") {
    val nations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val outdeg = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val inEdges = edgeList.groupBy(_._2)
    val seed = edgeList.map(_._1).min
    var rank: Map[Long, Long] =
      nations.keys.map(n => n -> (if (n == seed) 1000000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      rank = nations.keys.map { n =>
        val s = inEdges.getOrElse(n, Seq.empty)
          .map { case (u, _) => rank(u) / outdeg(u) }.sum
        n -> ((if (n == seed) 150000000L else 0L) + 85 * s / 100)
      }.toMap
    }
    val expected = rank.filter(_._2 > 0).map { case (n, r) => nations(n) -> r }
    val got = run("gr20_personalized_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected, "PPR diverged from the exact integer recurrence")
    // personalization structure: the seed strictly dominates (it alone
    // receives restart mass every round), ranks genuinely vary, and at
    // least one vertex the walk never reached is absent from the output
    assert(got(nations(seed)) > (got - nations(seed)).values.max,
      "seed must carry the maximum personalized rank")
    assert(got.values.toSet.size > 1, "uniform PPR — the walk never propagated")
    // personalization REORDERS the global view: some pair of nations
    // ranks in the opposite order under gr01 (else PPR is just PageRank)
    val global = run("gr01_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val common = got.keySet.intersect(global.keySet).toSeq
    val inverted = common.combinations(2).exists { case Seq(a, b) =>
      (got(a) - got(b)).sign * (global(a) - global(b)).sign == -1
    }
    assert(inverted, "PPR ordering identical to global PageRank — personalization vacuous")
  }

  test("gr19: condensation levels equal sequential longest-path layering; DAG acyclic and multi-level") {
    // driver-side reference: SCC labels by mutual reachability (gr18's
    // expected machinery), condensation edges, longest-path levels —
    // over gr19's p75 graph (its resolution knob, see CondensationQ)
    val edgeList = Graph.edges(spark, sf001, Graph.CondensationQ).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val out = edgeList.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val allNations = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(lv(_, 0)).toSet
    def fwdClosure(v: Long): Set[Long] = {
      var visited = Set(v); var frontier = Set(v)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(out.getOrElse(_, Set.empty)) -- visited
        visited ++= next; frontier = next
      }
      visited
    }
    val reach = allNations.map(v => v -> fwdClosure(v)).toMap
    val sccId = allNations.map { v =>
      v -> (reach(v).filter(u => reach(u).contains(v)) + v).min
    }.toMap
    val cond = edgeList.map { case (a, b) => (sccId(a), sccId(b)) }
      .filter { case (a, b) => a != b }.toSet
    // acyclicity — the invariant the whole operator rests on
    def condReach(c: Long): Set[Long] = {
      var visited = Set.empty[Long]; var frontier = Set(c)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(f => cond.filter(_._1 == f).map(_._2)) -- visited
        visited ++= next; frontier = next
      }
      visited
    }
    val classIds = sccId.values.toSet
    classIds.foreach(c => assert(!condReach(c).contains(c),
      s"condensation has a cycle through class $c — SCC contraction is broken"))
    // sequential longest-path levels by relaxation to fixpoint
    var lvl = classIds.map(_ -> 0L).toMap
    var changed = true
    while (changed) {
      changed = false
      cond.foreach { case (a, b) =>
        if (lvl(a) + 1 > lvl(b)) { lvl += b -> (lvl(a) + 1); changed = true }
      }
    }
    val sizes = sccId.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("gr19_condensation_levels").collect()
      .map(r => lv(r, 0) -> ((lv(r, 1), lv(r, 2)))).toMap
    assert(got === classIds.map(c => c -> ((lvl(c), sizes(c)))).toMap,
      "levels diverged from the sequential longest-path layering")
    // non-vacuity: a single-level answer means the DAG structure (and
    // so the whole relaxation loop) was never exercised
    assert(got.values.map(_._1).toSet.size > 1,
      "all classes at one level — the condensation DAG is trivial here")
    assert(got.values.map(_._1).max >= 2L,
      "no chain of length 2 — max-relaxation indistinguishable from one hop")
  }

  test("gr13: shuffled-label LPA is row-identical to gr06") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getString(0), lv(r, 1), r.getLong(2))).toSet
    val g6 = rows("gr06_label_propagation")
    val g13 = rows("gr13_lpa_shuffled")
    assert(g13 == g6,
      s"gr13 diverged from gr06: extra=${g13 -- g6} missing=${g6 -- g13}")
    assert(g6.nonEmpty, "empty LPA output — equivalence pin is vacuous")
    // non-vacuity: the p90 graph holds >= 2 communities at every scale
    assert(g6.map(_._2).size >= 2, "single community — propagation pin is vacuous")
  }

  /** Driver-side replay of gr21's fixed-point Brandes (same md5 seed
    * choice, same truncating-division recurrence). Returns the
    * per-node units and whether any accumulation site consumed a
    * NONZERO deeper delta (the nested regime separating Brandes from
    * plain path counting).
    */
  private def brandesReplay(sf: String): (Map[Long, Long], Boolean) = {
    val edges = Graph.edges(spark, sf).collect().map(r => (lv(r, 0), lv(r, 1))).toSeq
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = adj.keys.toSeq.sortBy(n => (md5hex(n.toString), n)).take(Graph.BetK)
    val bet = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var nested = false
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var levels = Vector(Seq(s))
      var frontier = Seq(s)
      while (frontier.nonEmpty) {
        assert(levels.size - 1 <= Graph.BetDepthCap, "replay exceeded the loud depth cap")
        val nxt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (u <- frontier; v <- adj.getOrElse(u, Nil) if !dist.contains(v))
          nxt(v) += sigma(u)
        for ((v, sg) <- nxt) { dist(v) = levels.size; sigma(v) = sg }
        frontier = nxt.keys.toSeq.sorted
        if (frontier.nonEmpty) levels :+= frontier
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (d <- levels.size - 2 to 0 by -1; v <- levels(d)) {
        var tot = 0L
        for (w <- adj.getOrElse(v, Nil) if dist.get(w).contains(d + 1)) {
          if (delta(w) > 0L) nested = true
          tot += (sigma(v) * (Graph.BetScale + delta(w))) / sigma(w)
        }
        delta(v) = tot
      }
      for ((v, dl) <- delta if v != s) bet(v) += dl
    }
    (bet.toMap.filter(_._2 != 0L), nested)
  }

  test("gr21: equals the driver-side fixed-point Brandes; accumulation genuinely nests") {
    // equality pin at the driver's verify scale
    val got = run("gr21_betweenness_sampled").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val names = graft.Tables.load(spark, sf001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    val (exp, _) = brandesReplay(sf001)
    val expFull = names.map { case (k, n) => n -> exp.getOrElse(k, 0L) }
    assert(got === expFull, "gr21 diverged from the driver-side Brandes replay")
    assert(got.values.count(_ > 0) >= 3,
      "fewer than 3 nonzero centralities — the sampled sources see no interior vertices")
    // nested-accumulation pin at sf0.001, where a seed has eccentricity 3:
    // some delta must consume a NONZERO deeper delta, the regime where
    // Brandes' (1 + delta) recurrence differs from plain path counting
    val (exp0, nested0) = brandesReplay(sf0001)
    assert(nested0, "no accumulation site saw a nonzero deeper delta — pin is vacuous")
    val got0 = graft.GraftQuery.all.find(_.name == "gr21_betweenness_sampled").get
      .build(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val names0 = graft.Tables.load(spark, sf0001, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => lv(r, 0) -> r.getString(1)).toMap
    assert(got0 === names0.map { case (k, n) => n -> exp0.getOrElse(k, 0L) },
      "gr21 diverged from the replay at sf0.001")
  }

  /** Driver-side replay of gr22's sampled harmonic closeness (same md5
    * seeds, plain BFS first-visit distances, BetScale div d). Returns
    * per-node units plus the two non-vacuity facts: some contribution
    * came from depth >= 2 (the 1/d weighting matters) and some node
    * accumulated from >= 2 seeds (the sampling genuinely sums).
    */
  private def harmonicReplay(sf: String): (Map[Long, Long], Boolean, Boolean) = {
    val edges = Graph.edges(spark, sf).collect().map(r => (lv(r, 0), lv(r, 1))).toSeq
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = adj.keys.toSeq.sortBy(n => (md5hex(n.toString), n)).take(Graph.BetK)
    val harm = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val hits = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    var deep = false
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Seq(s)
      var depth = 0
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .distinct.filterNot(dist.contains)
        depth += 1
        if (nxt.nonEmpty) {
          assert(depth <= Graph.BetDepthCap, "replay exceeded the loud depth cap")
          nxt.foreach(v => dist(v) = depth)
        }
        frontier = nxt
      }
      for ((v, dv) <- dist if dv >= 1) {
        harm(v) += Graph.BetScale / dv
        hits(v) += 1
        if (dv >= 2) deep = true
      }
    }
    (harm.toMap, deep, hits.values.exists(_ >= 2))
  }

  test("gr22: equals the driver-side harmonic replay; depth>=2 and multi-seed accumulation both non-vacuous") {
    for (sf <- Seq(sf001, sf0001)) {
      val (exp, deep, multi) = harmonicReplay(sf)
      assert(deep, s"$sf: every reached node is at depth 1 — the 1/d weighting is vacuous")
      assert(multi, s"$sf: no node is reached by two seeds — the sampled sum is vacuous")
      val names = Tables.load(spark, sf, "nation")
        .select("n_nationkey", "n_name").collect()
        .map(r => lv(r, 0) -> r.getString(1)).toMap
      val got = graft.GraftQuery.all.find(_.name == "gr22_harmonic_closeness").get
        .build(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === names.map { case (k, n) => n -> exp.getOrElse(k, 0L) },
        s"gr22 diverged from the driver-side harmonic replay at $sf")
    }
  }
  test("gr26: delta triangles equal a union recount; multi-delta ownership, gained and untouched vertices all non-vacuous") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def tr(a: Long, b: Long): Long =
      java.lang.Long.parseLong(md5hex(s"${a}_${b}_tr").substring(0, 8), 16) % 100
    val all = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    def canon(es: Seq[(Long, Long)]): Set[(Long, Long)] =
      es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val undAll = canon(all)
    val undBase = canon(all.filter { case (a, b) => tr(a, b) < 90 })
    val delta = undAll -- undBase
    assert(undBase.nonEmpty && delta.nonEmpty, "split sides empty — pins vacuous")

    // algorithm-free recount on both slices (canonical a<b<c triples)
    def tris(es: Set[(Long, Long)]): Set[(Long, Long, Long)] =
      for {
        (a, b) <- es
        (b2, c) <- es if b2 == b && es.contains((a, c))
      } yield (a, b, c)
    val (triBase, triAll) = (tris(undBase), tris(undAll))
    val newTris = triAll -- triBase
    assert(newTris.nonEmpty, "delta produced no triangles")
    def edgesOf(t: (Long, Long, Long)) =
      Seq((t._1, t._2), (t._1, t._3), (t._2, t._3))
    // every new triangle holds a delta edge (the delta-exactness identity)
    newTris.foreach(t => assert(edgesOf(t).exists(delta.contains)))
    // the ownership tiebreak is exercised: a triangle with >= 2 delta
    // edges exists (the case naive per-delta-edge counting overcounts)
    assert(newTris.exists(t => edgesOf(t).count(delta.contains) >= 2),
      "no multi-delta triangle — the lex-min ownership rule is vacuous")

    def pv(ts: Set[(Long, Long, Long)]): Map[Long, Long] =
      ts.toSeq.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
    val (pb, pn) = (pv(triBase), pv(newTris))
    val got = run("gr26_delta_triangles").collect()
      .map(r => (lv(r, 0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 25)
    got.foreach { case (n, b, nw, tot) =>
      assert(b === pb(n), s"vertex $n: stored base count diverges from the recount")
      assert(nw === pn(n), s"vertex $n: delta path diverges from the recount")
      assert(tot === b + nw)
    }
    // polarity: some vertex gained, some triangled vertex untouched
    assert(got.exists(_._3 > 0), "no vertex gained a triangle")
    assert(got.exists(g => g._4 > 0 && g._3 == 0L),
      "no triangled vertex untouched by the delta")
  }

  test("gr27: chained deltas over the written-back store equal the full-graph union-find; both merges non-vacuous; T1 artifact exact") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ch(a: Long, b: Long): Long =
      java.lang.Long.parseLong(md5hex(s"${a}_${b}_ch").substring(0, 8), 16) % 100
    val all = Graph.edges(spark, sf001, 0.9).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSeq
    val e0 = all.filter { case (a, b) => ch(a, b) < 30 }
    val e01 = all.filter { case (a, b) => ch(a, b) < 60 }
    assert(e0.nonEmpty && e01.size > e0.size && all.size > e01.size,
      "chain windows degenerate — pins vacuous")
    val nationKeys = Tables.load(spark, sf001, "nation")
      .select("n_nationkey").collect().map(r => lv(r, 0)).toSeq
    def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nationKeys.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v; while (parent(r) != r) r = parent(r)
        var c = v; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nationKeys.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
    }
    val t0 = components(e0)
    val t1 = components(e01)
    val fin = components(all)
    // both deltas genuinely merge, or the chain proves nothing
    assert(t0.values.toSet.size > t1.values.toSet.size,
      "delta1 merged nothing — the write-back stage is vacuous")
    assert(t1.values.toSet.size > fin.values.toSet.size,
      "delta2 merged nothing — the serve stage is vacuous")

    val got = run("gr27_chained_cc_deltas").collect()
      .map(r => (lv(r, 0), lv(r, 1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap === fin,
      "gr27 labels diverge from the full-graph union-find")
    val sizes = fin.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(t => t._2 -> t._3).toMap === sizes.map(identity),
      "gr27 component sizes diverge")

    // THE chained-increments pin: the PERSISTED intermediate artifact
    // (labels_t1, produced by a merge over the T0 read, no fixpoint)
    // equals the <60-graph union-find exactly — resolve the store from
    // the serving plan's scan paths
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val nodes = walk(run("gr27_chained_cc_deltas").queryExecution.executedPlan)
    val t1Path = nodes.collectFirst {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("labels_t1")) =>
        f.relation.location.rootPaths.find(_.toString.contains("labels_t1")).get.toString
    }
    assert(t1Path.isDefined,
      "gr27's serve does not read the persisted labels_t1 — the write-back is bypassed")
    val stored = spark.read.parquet(t1Path.get).collect()
      .map(r => lv(r, 0) -> lv(r, 1)).toMap
    assert(stored === t1,
      "the written-back T1 labels diverge from the <60-graph union-find")
  }
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a relational-derived graph — the
  * family beyond dd07's connected components (harness extension,
  * SURVEY.md §2.3): PageRank power iterations and triangle counting
  * on the nation-level trade graph (customer nation → supplier nation,
  * sparsified to above-median-support edges so degrees vary — the raw
  * pair graph is complete and every rank would be uniform).
  *
  * Scale design (100 TB stance):
  *  - the edge list is built ONCE from the fact tables (the only scan
  *    of the big data) and pinned ([[Materialize]]); iterations touch
  *    only (node, rank) and (src, dst) tables;
  *  - each PageRank iteration is ONE shuffle (the contribution
  *    groupBy); the rank table is vertex-sized — broadcast to the edge
  *    join, never shuffling the edge list again;
  *  - a FIXED iteration count (3) keeps the plan static and the
  *    lineage bounded — the long-running variant would checkpoint
  *    every few hops exactly like [[Dedup.minLabelClusters]];
  *  - triangle counting joins the canonical (a<b) undirected edge
  *    list to itself twice on vertex keys; at web scale the standard
  *    super-node mitigation is the dd05 df-cap argument applied to
  *    degree (cap or shard hub vertices before the wedge join).
  *
  * Oracle strategy: all rank math is INTEGER (ranks in 1e-9 units,
  * truncating division) — sums and divisions of non-negative longs are
  * order-independent and bit-identical across engines, so even an
  * iterative fixpoint computation hash-matches, with no FP tolerance
  * games. The DuckDB twin unrolls the same three iterations as CTEs;
  * each CTE casts its rank back to BIGINT because DuckDB widens
  * SUM(BIGINT) to HUGEINT, which the driver's fetch renders as float64
  * and hash-mismatches Spark's int64 even when every value is equal
  * (the r7 gr01 hash FAIL — values were verified identical).
  */
object Graph {

  /** Shared DuckDB CTE prefix: support-weighted nation pairs →
    * above-quantile sparsification → directed edge list + out-degrees.
    * Quantile 0.5 (median) is the family default; gr06 prunes at 0.9
    * because LPA needs community structure to survive (see its doc).
    */
  private def edgesDuckQ(q: String) =
    s"""support AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |med AS (SELECT PERCENTILE_DISC($q) WITHIN GROUP (ORDER BY w) AS m FROM support),
       |edges AS (SELECT src, dst FROM support, med WHERE w > m),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)""".stripMargin

  private val edgesDuck = edgesDuckQ("0.5")

  /** Directed sparsified edge list `(src, dst)`, pinned — one pass
    * over the fact tables feeds every iteration and both queries.
    */
  private[graft] def edges(s: SparkSession, dir: String, q: Double = 0.5): DataFrame =
    StageStore.table(s, dir, s"edges${(q * 100).toInt}")(edgesFresh(s, dir, q))

  /** The un-memoized build behind [[edges]] (r19 optimization round:
    * the front door is a lineitem x orders x customer x supplier join
    * + percentile cut, and ~25 gr queries each re-ran it per run; the
    * 25-node edge list is the definition of a stage artifact).
    * StageStoreSpec pins store == fresh per q.
    */
  private[graft] def edgesFresh(s: SparkSession, dir: String, q: Double = 0.5): DataFrame = {
    val t = (n: String) => Tables.load(s, dir, n)
    val support = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val med = support.agg(
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY w)").as("m"))
    Materialize(support.crossJoin(broadcast(med))
      .filter(col("w") > col("m")).select("src", "dst"))
  }

  /** Ranks in integer 1e-9 units: total mass 10^9 over 25 nations.
    * rank' = (1-d)/N + d * Σ rank/deg, with d = 0.85 and truncating
    * integer division at both division sites — bit-stable everywhere.
    */
  private val InitUnits = 40000000L  // 1e9 / 25
  private val BaseUnits = 6000000L   // 0.15 * 1e9 / 25

  /** Wedge-join super-node guard (gr02): vertices with undirected
    * degree above this are excluded from triangle candidate generation
    * (dd05's df-cap argument applied to degree — a degree-d hub
    * contributes d² wedges), counted loudly in `n_capped_vertices`.
    * Conf-overridable so the spec can pin the capped semantics on the
    * small fixture graph.
    */
  private[graft] val DegCapKey = "spark.graft.graph.degCap"
  private[graft] val DefaultDegCap = 1000

  /** Loud cap on [[sccLabels]]' FW-BW recursion depth. Default 25 =
    * |V| of the nation graph (the true worst case under min-vertex
    * pivots: an SCC chain can peel one class per level); overridable
    * for larger vertex sets, same discipline as [[DegCapKey]].
    */
  private[graft] val SccOuterCapKey = "spark.graft.graph.sccOuterCap"

  /** gr03's core order is DATA-ADAPTIVE: k = max raw degree `div` 2
    * (integer division, bit-identical cross-engine). A fixed k cannot
    * bind at every fixture scale (sf0.001 degrees top out at 16 where
    * sf0.01's floor is 10 — any constant either empties the small graph
    * or never peels the big one); half-the-max peels a real shell at
    * both, so the operator is exercised everywhere it runs.
    */
  private[graft] def kcoreK(maxDeg: Long): Long = maxDeg / 2

  /** gr19's sparsification quantile — the operator's resolution knob
    * (gr06's precedent): the MEDIAN graph's condensation is a 1-deep
    * star at every fixture scale (one giant SCC swallows the core, so
    * longest-path layering degenerates to sources-vs-sink), while the
    * p75 graph keeps BOTH a genuine multi-vertex SCC to contract AND a
    * depth >= 2 DAG (probed at sf0.001/0.01/0.1) — the regime where
    * max-relaxation differs from one-hop and the pin is non-vacuous.
    */
  private[graft] val CondensationQ = 0.75

  /** Shared gr03/gr10 ground truth: the peel chain computed straight
    * from the definition. Two engines, two execution strategies
    * (broadcast vs shuffled keep-set), one oracle — gr09's discipline
    * applied to the k-core pair.
    */
  private[graft] def kcoreOracle: String = {
    // MATERIALIZED pins each peel round once: DuckDB inlines a CTE
    // per reference, and this chain references each round's output
    // three times — unmaterialized it re-expands the 4-table
    // support join exponentially (measured: 180 s → 0.4 s)
    val peel = (i: Int, prev: String) =>
      s"""d$i AS (SELECT v, COUNT(*) AS d FROM (
         |          SELECT a AS v FROM $prev UNION ALL SELECT b AS v FROM $prev) u
         |        GROUP BY v),
         |kp$i AS MATERIALIZED (SELECT v FROM d$i, kd WHERE d >= k),
         |e$i AS MATERIALIZED (SELECT a, b FROM $prev
         |        WHERE a IN (SELECT v FROM kp$i) AND b IN (SELECT v FROM kp$i))""".stripMargin
    s"""WITH support AS MATERIALIZED (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |med AS (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY w) AS m FROM support),
       |edges AS (SELECT src, dst FROM support, med WHERE w > m),
       |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |        FROM edges),
       |d0 AS (SELECT v, COUNT(*) AS d FROM (
       |         SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
       |       GROUP BY v),
       |kd AS MATERIALIZED (SELECT MAX(d) // 2 AS k FROM d0),
       |${peel(1, "und")},
       |${peel(2, "e1")},
       |${peel(3, "e2")},
       |dr AS (SELECT v, COUNT(*) AS d FROM (
       |         SELECT a AS v FROM e3 UNION ALL SELECT b AS v FROM e3) u
       |       GROUP BY v)
       |SELECT na.n_name AS nation, CAST(dr.d AS BIGINT) AS core_deg
       |FROM dr JOIN nation na ON na.n_nationkey = dr.v""".stripMargin
  }

  /** Shared gr14/gr17 ground truth: SCC(seed) BY DEFINITION — two
    * dedup-recursive closures from the cycle-eligible seed and their
    * intersection. Two execution strategies (broadcast frontiers vs
    * shuffled frontiers), one oracle — gr09's discipline.
    */
  private def sccSeedOracle: String =
    s"""WITH RECURSIVE $edgesDuck,
       |seed AS (SELECT MIN(src) AS s FROM edges
       |         WHERE src IN (SELECT dst FROM edges)),
       |fwd(node) AS (SELECT s FROM seed
       |  UNION SELECT e.dst FROM fwd f JOIN edges e ON e.src = f.node),
       |bwd(node) AS (SELECT s FROM seed
       |  UNION SELECT e.src FROM bwd b JOIN edges e ON e.dst = b.node),
       |scc AS (SELECT node FROM fwd WHERE node IN (SELECT node FROM bwd))
       |SELECT na.n_name AS nation,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM scc) AS scc_size
       |FROM scc JOIN nation na ON na.n_nationkey = scc.node""".stripMargin

  /** gr21's sampling and fixed-point parameters. Depth cap 5 is the
    * loud bound on BOTH engines: probed seed eccentricities are ≤ 3 at
    * every fixture scale, the oracle unrolls exactly BetDepthCap
    * forward+backward levels, and the Spark loop THROWS if a frontier
    * survives it — so cap and unroll can never silently disagree.
    * Declared before `all` (object init order — dd13's lesson).
    */
  private[graft] val BetK = 4
  private[graft] val BetDepthCap = 5
  private[graft] val BetScale = 1000000000L

  /** gr21's DuckDB oracle: the same md5-chosen seeds, the same
    * level-synchronous sigma counting and fixed-point Brandes
    * accumulation, unrolled [[BetDepthCap]] levels each way. Every
    * recursion level is MATERIALIZED — the kcore-oracle lesson: the
    * visited chain references each level twice and DuckDB inlines
    * CTEs per reference, so the unmaterialized spelling re-expands
    * exponentially.
    */
  private lazy val betweennessOracle: String = {
    val L = BetDepthCap
    val fwd = (1 to L).map { l =>
      s"""f$l AS MATERIALIZED (SELECT f.s, e.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM f${l - 1} f JOIN edges e ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${l - 1} p WHERE p.s = f.s AND p.node = e.dst)
         |  GROUP BY 1, 2),
         |v$l AS MATERIALIZED (SELECT * FROM v${l - 1} UNION ALL SELECT s, node FROM f$l)""".stripMargin
    }.mkString(",\n")
    val bwd = (L - 1 to 0 by -1).map { l =>
      s"""d$l AS MATERIALIZED (SELECT v.s, v.node, v.sigma,
         |  CAST(COALESCE(SUM((v.sigma * ($BetScale + w.delta)) // w.sigma), 0) AS BIGINT) AS delta
         |  FROM f$l v
         |  LEFT JOIN edges e ON e.src = v.node
         |  LEFT JOIN d${l + 1} w ON w.s = v.s AND w.node = e.dst
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val alld = (0 to L).map(l => s"SELECT s, node, delta FROM d$l").mkString(" UNION ALL ")
    s"""WITH $edgesDuck,
       |seeds AS (SELECT node AS s FROM (SELECT DISTINCT src AS node FROM edges) c
       |  ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT $BetK),
       |f0 AS MATERIALIZED (SELECT s, s AS node, CAST(1 AS BIGINT) AS sigma FROM seeds),
       |v0 AS MATERIALIZED (SELECT s, node FROM f0),
       |$fwd,
       |d$L AS MATERIALIZED (SELECT s, node, sigma, CAST(0 AS BIGINT) AS delta FROM f$L),
       |$bwd,
       |alld AS ($alld),
       |bet AS (SELECT node, CAST(SUM(delta) AS BIGINT) AS centrality_units
       |        FROM alld WHERE node <> s GROUP BY node)
       |SELECT na.n_name AS nation, COALESCE(b.centrality_units, 0) AS centrality_units
       |FROM nation na LEFT JOIN bet b ON b.node = na.n_nationkey""".stripMargin
  }

  /** gr22's DuckDB oracle: the same md5-chosen seeds and the same
    * level-synchronous frontier-dedup BFS (forward only — first-visit
    * level IS the distance), unrolled [[BetDepthCap]] levels, harmonic
    * score = Σ [[BetScale]] // level. Every level MATERIALIZED (the
    * kcore CTE-re-expansion lesson, same as betweennessOracle).
    */
  private lazy val harmonicOracle: String = {
    val L = BetDepthCap
    val fwd = (1 to L).map { l =>
      s"""h$l AS MATERIALIZED (SELECT DISTINCT f.s, e.dst AS node
         |  FROM h${l - 1} f JOIN edges e ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM hv${l - 1} p WHERE p.s = f.s AND p.node = e.dst)),
         |hv$l AS MATERIALIZED (SELECT * FROM hv${l - 1} UNION ALL SELECT s, node FROM h$l)""".stripMargin
    }.mkString(",\n")
    val contrib = (1 to L)
      .map(l => s"SELECT s, node, ${BetScale / l} AS h FROM h$l")
      .mkString(" UNION ALL ")
    s"""WITH $edgesDuck,
       |seeds AS (SELECT node AS s FROM (SELECT DISTINCT src AS node FROM edges) c
       |  ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT $BetK),
       |h0 AS MATERIALIZED (SELECT s, s AS node FROM seeds),
       |hv0 AS MATERIALIZED (SELECT s, node FROM h0),
       |$fwd,
       |contrib AS ($contrib),
       |harm AS (SELECT node, CAST(SUM(h) AS BIGINT) AS harmonic_units
       |         FROM contrib GROUP BY node)
       |SELECT na.n_name AS nation, COALESCE(b.harmonic_units, 0) AS harmonic_units
       |FROM nation na LEFT JOIN harm b ON b.node = na.n_nationkey""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "gr01_pagerank",
      Some(pagerankOracle),
      "Three PageRank power iterations (d=0.85) over the sparsified nation trade graph, in integer 1e-9 rank units with truncating division — iterative graph math that hash-matches an independent engine exactly, no FP tolerance. One shuffle per iteration (the contribution groupBy); the vertex-sized rank table broadcasts to the pinned edge list each hop, so the fact tables are scanned exactly once at any scale.") {
      (s, dir) =>
        val e = edges(s, dir)
        val outdeg = broadcast(e.groupBy("src").agg(count(lit(1)).as("deg")))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name"))
        var ranks = nodes.select(col("node"), lit(InitUnits).as("r"))
        for (_ <- 1 to 3) {
          val contribs = e
            .join(outdeg, "src")
            .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select(col("dst").as("node"), expr("r div deg").as("c"))
          ranks = nodes.select("node")
            .join(contribs.groupBy("node").agg(sum(col("c")).as("s")), Seq("node"), "left")
            .select(col("node"),
              (lit(BaseUnits) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        }
        ranks.join(broadcast(nodes), "node")
          .select(col("n_name").as("nation"), col("r").as("rank_units"))
    },

    GraftQuery(
      "gr02_triangle_count",
      Some(s"""WITH $edgesDuck,
              |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              |        FROM edges),
              |deg AS (SELECT v, COUNT(*) AS deg FROM (
              |          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
              |        GROUP BY v),
              |hubs AS (SELECT v FROM deg WHERE deg > $DefaultDegCap),
              |kept AS (SELECT a, b FROM und
              |         WHERE a NOT IN (SELECT v FROM hubs)
              |           AND b NOT IN (SELECT v FROM hubs)),
              |tri AS (SELECT COUNT(*) AS n_triangles
              |        FROM kept e1
              |        JOIN kept e2 ON e2.a = e1.b
              |        JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b)
              |SELECT (SELECT COUNT(*) FROM und) AS n_edges,
              |       (SELECT n_triangles FROM tri) AS n_triangles,
              |       (SELECT COUNT(*) FROM hubs) AS n_capped_vertices""".stripMargin),
      s"Triangle count on the undirected sparsified trade graph via the canonical wedge join (a<b<c: each triangle counted once): the edge list joins itself on the shared vertex, then closes against the third edge — all equi-joins, no cartesian anywhere. The hub-vertex blowup (a degree-d super-node contributes d² wedges — THE failure mode of triangle counting on power-law graphs) is guarded exactly like dd05's frequent-shingle df cap: vertices with degree > $DefaultDegCap (conf `$DegCapKey`) are excluded from the wedge join via broadcast anti-joins BEFORE candidate generation, and the drop is loud — n_capped_vertices is a first-class output column, not a silent truncation. The 25-node nation graph never reaches the default cap, so the count is exact here; the spec pins the capped semantics with a tiny cap override.") {
      (s, dir) =>
        val degCap = s.conf.get(DegCapKey, DefaultDegCap.toString).toInt
        val e = edges(s, dir)
        val und = e.select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        // degree per vertex (vertex-scale, tiny vs the edge list);
        // hubs = super-nodes the wedge join must never meet
        val deg = und.select(col("a").as("v"))
          .unionByName(und.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val hubs = deg.filter(col("deg") > degCap).select("v")
        val kept = und
          .join(broadcast(hubs.select(col("v").as("a"))), Seq("a"), "left_anti")
          .join(broadcast(hubs.select(col("v").as("b"))), Seq("b"), "left_anti")
        val tri = kept.as("e1")
          .join(kept.as("e2"), col("e2.a") === col("e1.b"))
          .join(kept.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .agg(count(lit(1)).as("n_triangles"))
        und.agg(count(lit(1)).as("n_edges"))
          .crossJoin(tri)
          .crossJoin(hubs.agg(count(lit(1)).as("n_capped_vertices")))
          .select(col("n_edges"), col("n_triangles"), col("n_capped_vertices"))
    },

    GraftQuery(
      "gr03_kcore",
      Some(kcoreOracle),
      "k-core decomposition (k = half the max raw degree, three peel rounds unrolled — the gr01 bounded-iteration discipline): repeatedly drop vertices with degree < k and the edges they carry, the standard graph-densification filter a pipeline runs before expensive per-edge analytics (each peel can only shrink the graph, so three rounds bound the plan while converging on real power-law graphs' shells). k is data-adaptive (max degree div 2, integer — a constant either empties a sparse fixture or never peels a dense one) and rides a 1-row broadcast into the threshold filter. Per round: one vertex-sized degree aggregation, then the surviving-vertex set — always vertex-scale, tiny vs the edges — broadcasts into two semi joins, so the edge list is filtered map-side and NEVER reshuffled; all math is integer counts, bit-identical across engines. Output = surviving vertices with their residual in-core degree.") {
      (s, dir) =>
        val e = edges(s, dir)
        var cur = Materialize(e.select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct())
        def degrees(df: DataFrame) = df.select(col("a").as("v"))
          .unionByName(df.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        // adaptive threshold from the RAW graph, fixed across rounds:
        // a 1-row frame broadcast into every peel's filter
        val kf = broadcast(degrees(cur).agg(expr("max(d) div 2").as("k")))
        for (_ <- 1 to 3) {
          val keep = degrees(cur).crossJoin(kf)
            .filter(col("d") >= col("k")).select("v")
          // each round is consumed twice (next degree agg + next
          // filter) — pinned so peels never recompute the whole chain
          cur = Materialize(cur
            .join(broadcast(keep.select(col("v").as("a"))), Seq("a"), "left_semi")
            .join(broadcast(keep.select(col("v").as("b"))), Seq("b"), "left_semi"))
        }
        val dr = degrees(cur).withColumnRenamed("d", "core_deg")
        dr.join(broadcast(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").as("v"), col("n_name"))), "v")
          .select(col("n_name").as("nation"), col("core_deg"))
    },

    GraftQuery(
      "gr04_reachability",
      Some(reachSql("")),
      "Depth-bounded BFS reachability from a seed vertex via WITH RECURSIVE — the one iterative shape expressed through the SQL FRONT-END instead of a driver loop: Spark 4's recursive CTE plans as UnionLoopExec, materializing each frontier and feeding it back until the depth guard empties it (gr01/gr03 unroll their loops in Scala; this exercises the engine's own fixpoint operator). Spark restricts recursive CTEs to UNION ALL, so each hop enumerates paths, not vertices — sound here because the depth cap (3) bounds path length and the outer MIN(hop) GROUP BY collapses paths to the BFS answer; at 100 TB path enumeration is the known blowup of UNION ALL recursion, and the scale-correct variant dedups the frontier per hop exactly as dd07's min-label propagation does in DataFrame space. Per hop: one equi-join of the (tiny, vertex-bounded) frontier against the pinned edge list — frontier broadcasts, edges never reshuffle; all values are integer hop counts, bit-identical across engines.") {
      (s, dir) =>
        // gr04-prefixed view names: never clobber caller-owned temp
        // views in the shared session (the sk01 rule); SQL text is
        // otherwise identical to the oracle's
        for (tb <- Seq("lineitem", "orders", "customer", "supplier"))
          Tables.load(s, dir, tb).createOrReplaceTempView(s"gr04_$tb")
        s.sql(reachSql("gr04_"))
    },

    GraftQuery(
      "gr05_frontier_bfs",
      // the BFS answer is path-independent, so the oracle is gr04's
      // recursive CTE verbatim — one ground truth, two engines AND two
      // algorithms (path enumeration vs frontier dedup) must agree
      Some(reachSql("")),
      "Depth-bounded BFS reachability — gr04's answer computed the way it must be at 100 TB: per-hop FRONTIER DEDUP instead of UNION ALL path enumeration. gr04's recursive CTE enumerates every path to a vertex (depth-3 on a dense graph is already explosive — the documented blowup of UNION-ALL recursion); here each hop expands the frontier through the pinned edge list once, dropDuplicates collapses it to distinct vertices, and a broadcast anti-join against the visited set removes everything already reached — so hop h's frontier holds exactly the vertices first reached at depth h (its min_hops label needs no outer MIN), and per-hop cost is bounded by VERTICES x mean degree regardless of path multiplicity (the dd07 min-label discipline applied to BFS). Frontier and visited are vertex-scale and broadcast; the edge list is scanned once and never reshuffled; hop labels are integers — bit-identical cross-engine. GraphSpec pins gr04 == gr05 row-for-row, closing the loop between the engine-fixpoint exercise and the scale-safe form.") {
      (s, dir) =>
        val e = Materialize(edges(s, dir)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst")))
        val seed = s.range(1)
          .select(lit(0).cast("int").as("node"), lit(0).cast("int").as("hop"))
        var visited = seed
        var frontier = seed.select("node")
        for (h <- 1 to 3) {
          // expand + dedup + drop-already-seen: the three vertex-scale
          // ops that keep BFS linear in reachable vertices, not paths
          val next = Materialize(e
            .join(broadcast(frontier.withColumnRenamed("node", "src")), "src")
            .select(col("dst").as("node")).distinct()
            .join(broadcast(visited.select("node")), Seq("node"), "left_anti")
            .withColumn("hop", lit(h).cast("int")))
          visited = visited.unionByName(next)
          frontier = next.select("node")
        }
        visited.select(col("node"), col("hop").as("min_hops"))
    },

    GraftQuery(
      "gr06_label_propagation",
      Some(lpaOracle),
      "Community detection by synchronized label propagation (3 rounds, the gr01 bounded-iteration discipline) — THE community algorithm that survives 100 TB because it has no global state at all: every node starts as its own community and each round adopts the most frequent label among its undirected neighbors (tie -> smallest label, so the round is a pure deterministic function of the previous labeling — no RNG, no ordering dependence, bit-identical cross-engine integer math). The graph is sparsified at the 90th support percentile, NOT the family's median: LPA needs community structure to survive, and the probed median graph (298 directed edges over 25 nations at sf0.01) collapses to ONE label in two rounds — a vacuous answer — where the p90 graph holds 5 communities at sf0.01 and >=2 at every fixture scale; the threshold is the operator's resolution knob, exactly like nprobe in ss09. Per round: the vertex-sized label table broadcasts into the pinned undirected edge list (edges are scanned once and NEVER reshuffled), one map-side-combining count shuffle at (node, label) grain, and a max_by argmax — per-round cost is edges + vertices regardless of community shape, the same per-hop bill as gr05's frontier. Isolated vertices flow through with their own label (left join + coalesce — the tx12 nothing-vanishes contract). Output attributes each nation to its community with the community size, the audit you GROUP BY to see whether the trade graph's cores agree with gr03's density shells.") {
      (s, dir) =>
        val e = edges(s, dir, 0.9)
        val und = Materialize(e.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
          .distinct())
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name"))
        var lab = nodes.select(col("node"), col("node").as("lab"))
        for (_ <- 1 to 3) {
          // neighbor-label frequencies: ONE shuffle at (node, label)
          // grain; the label table itself rides a broadcast
          val cnt = und
            .join(broadcast(lab.select(col("node").as("b"), col("lab"))), "b")
            .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("c"))
          // argmax: max count, tie -> min label (maximize (c, -lab))
          val pick = cnt.groupBy(col("a").as("node"))
            .agg(max_by(col("lab"), struct(col("c"), (-col("lab")).as("nl"))).as("plab"))
          // NOT pinned per round (contrast gr03): each labeling is
          // referenced exactly once downstream and is vertex-sized, so
          // the three rounds nest as one DAG over the pinned edge list
          // — an eager per-round checkpoint job costs more than it saves
          lab = nodes.select("node").join(pick, Seq("node"), "left")
            .select(col("node"), coalesce(col("plab"), col("node")).as("lab"))
        }
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lab")
        lab.join(broadcast(nodes), "node")
          .select(col("n_name").as("nation"), col("lab").as("community"),
            count(lit(1)).over(w).as("community_size"))
    },

    GraftQuery(
      "gr07_link_prediction",
      Some(s"""WITH $edgesDuck,
              |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              |        FROM edges),
              |degall AS (SELECT v, COUNT(*) AS deg FROM (
              |          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
              |        GROUP BY v),
              |hubs AS (SELECT v FROM degall WHERE deg > $DefaultDegCap),
              |kept AS (SELECT a, b FROM und
              |         WHERE a NOT IN (SELECT v FROM hubs)
              |           AND b NOT IN (SELECT v FROM hubs)),
              |bi AS (SELECT a AS v, b AS n FROM kept UNION ALL SELECT b, a FROM kept),
              |deg AS (SELECT v, COUNT(*) AS deg FROM bi GROUP BY v),
              |wedge AS (SELECT w1.n AS x, w2.n AS y, COUNT(*) AS n_common
              |          FROM bi w1 JOIN bi w2 ON w1.v = w2.v AND w1.n < w2.n
              |          GROUP BY 1, 2),
              |pred AS (SELECT x, y, n_common FROM wedge w
              |         LEFT JOIN und e ON e.a = w.x AND e.b = w.y
              |         WHERE e.a IS NULL)
              |SELECT p.x AS node_a, p.y AS node_b, p.n_common,
              |       da.deg AS deg_a, db.deg AS deg_b,
              |       CAST(p.n_common AS DOUBLE) / (da.deg + db.deg - p.n_common) AS score,
              |       (SELECT CAST(COUNT(*) AS BIGINT) FROM hubs) AS n_capped_vertices
              |FROM pred p JOIN deg da ON da.v = p.x
              |            JOIN deg db ON db.v = p.y""".stripMargin),
      s"Common-neighbor link prediction (the Liben-Nowell/Kleinberg baseline) — the graph-side twin of the dd/ss candidate generators: for every NON-edge (x, y) sharing at least one neighbor, score = neighborhood Jaccard |N(x) ∩ N(y)| / |N(x) ∪ N(y)|, the recommend-next-edge primitive behind 'entities that trade with the same partners should trade'. The wedge self-join on the shared vertex is gr02's candidate machinery verbatim — same d² hub blowup, same guard: vertices above the degree cap (conf `$DegCapKey`) leave the join via broadcast anti-joins BEFORE candidate generation, and the drop stays loud as the n_capped_vertices column on every row. Existing edges leave via an anti join against the canonical edge list (a prediction that already exists is not a prediction); degrees are vertex-scale and equi-join back onto the pair rows. Counts and degrees are exact integers; |N(x) ∪ N(y)| = deg_x + deg_y − common by inclusion-exclusion, so the score is one shared IEEE division — bit-identical cross-engine.") {
      (s, dir) =>
        val degCap = s.conf.get(DegCapKey, DefaultDegCap.toString).toInt
        val e = edges(s, dir)
        val und = e.select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val degAll = und.select(col("a").as("v"))
          .unionByName(und.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val hubs = degAll.filter(col("deg") > degCap).select("v")
        val kept = Materialize(und
          .join(broadcast(hubs.select(col("v").as("a"))), Seq("a"), "left_anti")
          .join(broadcast(hubs.select(col("v").as("b"))), Seq("b"), "left_anti"))
        val bi = kept.select(col("a").as("v"), col("b").as("n"))
          .unionByName(kept.select(col("b").as("v"), col("a").as("n")))
        val deg = bi.groupBy("v").agg(count(lit(1)).as("deg"))
        val wedge = bi.select(col("v"), col("n").as("x"))
          .join(bi.select(col("v"), col("n").as("y")), "v")
          .filter(col("x") < col("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n_common"))
        val pred = wedge.join(und,
            wedge("x") === und("a") && wedge("y") === und("b"), "left_anti")
        pred
          .join(broadcast(deg.select(col("v").as("x"), col("deg").as("deg_a"))), "x")
          .join(broadcast(deg.select(col("v").as("y"), col("deg").as("deg_b"))), "y")
          .crossJoin(broadcast(hubs.agg(count(lit(1)).as("n_capped_vertices"))))
          .select(col("x").as("node_a"), col("y").as("node_b"), col("n_common"),
            col("deg_a"), col("deg_b"),
            (col("n_common").cast("double") /
              (col("deg_a") + col("deg_b") - col("n_common"))).as("score"),
            col("n_capped_vertices"))
    },

    GraftQuery(
      "gr08_connected_components",
      // ground truth is the transitive closure itself: component(v) =
      // MIN over everything reachable from v (undirected), via a
      // dedup-recursive CTE seeded at every node — algorithm-free, so
      // the pointer-jumping loop is checked against the DEFINITION
      Some(ccOracle),
      "Connected components by min-label propagation WITH POINTER JUMPING — the dd07 primitive upgraded to the algorithm web-scale CC actually needs. Plain min-propagation (dd07's loop) takes component-DIAMETER rounds: on a 100 TB web or near-dup graph whose giant component has diameter in the hundreds, that is hundreds of shuffles. Here every round does two things: (1) one neighbor-min hop — edge-grain map-side-combining MIN, the vertex-sized label table rides a broadcast, the pinned edge list is NEVER reshuffled; then (2) a pointer jump, component <- component(component), a vertex-scale self-join that halves the remaining pointer depth — so convergence is O(log n) rounds on ANY diameter (the Shiloach-Vishkin/path-doubling discipline used by every MapReduce-CC paper since Kiveris et al.). Labels only decrease, so the fixpoint probe is a checkpointed changed-flag scan (dd07's trick), and hitting the round cap THROWS loudly rather than emitting labels that disagree with the closure. Run at the p90 sparsification so the fixture graph genuinely fragments (>= 2 components at every scale — GraphSpec pins it against a driver-side union-find). Output: every vertex with its component id (= component min, deterministic) and exact component size. CC is the backbone op under dd07/dd08's dedup clustering — at corpus scale THIS is the loop that groups near-dup documents.") {
      (s, dir) =>
        val e = edges(s, dir, 0.9)
        val und = Materialize.trackedLocalCheckpoint(
          e.select(col("src").cast("int").as("a"), col("dst").cast("int").as("b"))
            .unionByName(
              e.select(col("dst").cast("int").as("a"), col("src").cast("int").as("b")))
            .distinct())
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("int").as("node"))
        val lab = ccPointerJump(und, nodes)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        lab.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr09_cc_shuffled",
      // same algorithm-free ground truth as gr08: two engines, two
      // execution strategies (broadcast vs shuffled labels), one closure
      Some(ccOracle),
      "gr08's pointer-jumping connected components WITHOUT vertex-scale broadcasts — the form that survives the regime gr08's contract excludes: |V| in the billions, label table tens of GB, far past executor (let alone driver) memory. gr08 ships the label table to every executor twice per round; here NOTHING broadcasts. The undirected edge list is hash-partitioned ONCE on the neighbor key and checkpointed — LogicalRDD preserves the partitioning, so every round's neighbor-min hop is an equi-join where ONLY the vertex-scale label table moves (one shuffle of |V| rows vs gr08's |V|-to-every-executor), and the pointer jump component <- component(component) is a plain label-key self equi-join. All three per-round joins carry SHUFFLE_MERGE hints so neither the static planner nor AQE's runtime re-plan can sneak the small fixture's labels back onto a broadcast — the plan IS the 100 TB plan at every scale (PlanAuditSpec pins zero Broadcast operators in the round; GraphSpec pins gr08 == gr09 row-for-row). Same O(log n) convergence, same loud cap, same monotone-decrease fixpoint probe; the only trade is per-round sort cost on the shuffled sides, which is exactly the price a billion-vertex CC pays anywhere.") {
      (s, dir) =>
        val e = edges(s, dir, 0.9)
        // the factored shuffled fixpoint (r18): partition-on-b +
        // checkpoint + ccShuffledRound-to-convergence, one definition
        // with the shuffled delta cores' loops
        val undRaw = e
          .select(col("src").cast("int").as("a"), col("dst").cast("int").as("b"))
          .unionByName(
            e.select(col("dst").cast("int").as("a"), col("src").cast("int").as("b")))
          .distinct()
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("int").as("node"))
        val lab = ccShuffledFixpoint(undRaw, nodes)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        lab.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr10_kcore_shuffled",
      // gr03's definition-level oracle verbatim: same peel, same k,
      // same answer — only the execution strategy differs
      Some(kcoreOracle),
      "gr03's k-core peel WITHOUT vertex-scale keep-set broadcasts — gr09's move applied to the second graph operator that assumed |V| fits an executor. gr03 broadcasts the surviving-vertex set into two map-side semi joins each round (edges never reshuffled — the right plan while the keep-set is MBs); at billion-vertex scale that set is tens of GB and the broadcast is the scale-killer, so here every keep-set join is a SHUFFLE_MERGE left-semi: the vertex-scale keep-set shuffles on the key and the edge list pays one partition-by-endpoint pass per side per round. That trade is priced honestly: the peel becomes two edge shuffles per round (a-side then b-side) — at 100 TB you halve it by storing edges bucketed on one endpoint (q55's lever) so that side's semi is co-located, and the degree aggregation stays one map-side-combining vertex-grain shuffle either way. The adaptive k STILL rides a broadcast — it is ONE row (max degree div 2), scale-free by construction, and the audit distinguishes exactly that: PlanAuditSpec pins ZERO BroadcastHashJoin (no hashed-relation table of any vertex-scale set) while allowing the 1-row BNLJ threshold; GraphSpec pins gr03 == gr10 row-for-row, and both hash-match the same definition-level DuckDB peel. Deterministic integer math throughout.") {
      (s, dir) =>
        val e = edges(s, dir)
        var cur = Materialize(e.select(
            least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct())
        // the only broadcast in the plan: a 1-row threshold frame —
        // scale-free regardless of |V| (contrast the keep-set below)
        val kf = broadcast(undDegrees(cur).agg(expr("max(d) div 2").as("k")))
        for (_ <- 1 to 3)
          cur = Materialize(kcoreShuffledPeel(cur, kf))
        val dr = undDegrees(cur).withColumnRenamed("d", "core_deg")
        // dimension attribution also over shuffle: the audited plan
        // carries no hashed-relation broadcast anywhere
        dr.join(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").as("v"), col("n_name"))
            .hint("shuffle_merge"), "v")
          .select(col("n_name").as("nation"), col("core_deg"))
    },

    GraftQuery(
      "gr11_sssp",
      Some(ssspOracle),
      "Bounded single-source WEIGHTED shortest paths — the algorithm family the graph set lacked (gr04/gr05 are unweighted reachability): edge cost = 1e6 div trade-support (strong link = cheap hop, truncating integer division so every distance is an exact int64), four unrolled sparse Bellman-Ford relaxations from the data-adaptive seed (min endpoint, a 1-row broadcast). Each round extends the reached set by one hop — dist' = min(dist UNION dist-join-edges) — so round k holds the exact minimum over all walks of <= k edges, which is precisely what the oracle's recursive CTE enumerates (the CTE pays path-enumeration blowup the DataFrame loop avoids: the distributed form carries ONE row per reached vertex, the min-combine folding map-side). Bounded rounds are gr01's discipline — at 100 TB you either know the relevant radius (ETA/logistics queries rarely need > single-digit hops) or you run to convergence with gr08's loud-cap loop; the per-round bill is one edges-join + one vertex-grain min, the dist table rides a broadcast at |V| << executor memory and swaps to gr09's shuffled-label form past it (both forms demonstrated). Unreached vertices are absent, not null-padded — reachability IS information here.") {
      (s, dir) =>
        val we = weightedEdges(s, dir)
        val seed = we.agg(least(min(col("src")), min(col("dst"))).as("node"))
          .select(col("node"), lit(0L).as("d"))
        var dist = seed
        for (_ <- 1 to 4) {
          val relaxed = we
            .join(broadcast(dist.select(col("node").as("src"), col("d").as("ds"))), "src")
            .select(col("dst").as("node"), (col("ds") + col("cost")).as("d"))
          dist = dist.unionByName(relaxed)
            .groupBy("node").agg(min(col("d")).as("d"))
        }
        dist.join(broadcast(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").as("node"), col("n_name"))), "node")
          .select(col("n_name").as("nation"), col("d").as("dist_units"))
    },

    GraftQuery(
      "gr12_pagerank_shuffled",
      // gr01's oracle verbatim: one ground truth, two execution
      // strategies — broadcast vs hash-partitioned equi-joined ranks
      Some(pagerankOracle),
      "gr01's PageRank WITHOUT vertex-scale broadcasts — the last-but-one iterative loop that still shipped its |V|-sized state to every executor each hop (VERDICT r11 #3), closed with gr09's recipe. gr01 broadcasts the rank table into the edge join every iteration (the right plan while ranks are MBs; a scale-killer when |V| is billions and the rank table tens of GB). Here the out-degree column is folded into the edge list ONCE and the result hash-partitioned on src and checkpointed — LogicalRDD preserves the partitioning, so every iteration's contribution join is an equi-join where ONLY the vertex-scale rank table moves (one |V|-row shuffle per hop vs gr01's |V|-to-every-executor), the contribution sum is the same map-side-combining groupBy(dst), and the base-rank merge-back is a vertex-grain SHUFFLE_MERGE left join. Every join in the loop carries the shuffle_merge hint so neither the static planner nor AQE can sneak the small fixture's ranks onto a broadcast — the executed plan IS the 100 TB plan at every scale (PlanAuditSpec pins zero Broadcast operators end-to-end; GraphSpec pins gr01 == gr12 row-for-row). Same integer 1e-9 rank units, same truncating division, bit-identical to the oracle. The trade is per-hop sort cost on the rank shuffle — exactly the bill a billion-vertex PageRank pays in any shuffled implementation (Pregel-style message grouping).") {
      (s, dir) =>
        val e0 = edges(s, dir)
        // out-degree folded into the edge table BEFORE the checkpoint:
        // deg is a per-src constant, so carrying it as a column costs
        // one int per edge and removes a per-round join; partitioned on
        // src (the contribution join key) so rounds never move edges
        val outdeg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
        val eDeg = Materialize.trackedLocalCheckpoint(
          e0.join(outdeg.hint("shuffle_merge"), "src")
            .select(col("src"), col("dst"), col("deg"))
            .repartition(col("src")))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name"))
        var ranks = nodes.select(col("node"), lit(InitUnits).as("r"))
        for (_ <- 1 to 3) {
          // ranks shuffle to the edges' src partitioning (|V| rows
          // move, the edge list does not), then ONE map-side-combining
          // contribution sum at dst grain
          val contribs = eDeg
            .join(ranks.withColumnRenamed("node", "src").hint("shuffle_merge"), "src")
            .select(col("dst").as("node"), expr("r div deg").as("c"))
          ranks = nodes.select("node")
            .join(contribs.groupBy("node").agg(sum(col("c")).as("s")).hint("shuffle_merge"),
              Seq("node"), "left")
            .select(col("node"),
              (lit(BaseUnits) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        }
        ranks.join(nodes.hint("shuffle_merge"), "node")
          .select(col("n_name").as("nation"), col("r").as("rank_units"))
    },

    GraftQuery(
      "gr13_lpa_shuffled",
      // gr06's oracle verbatim — same three synchronized rounds, same
      // p90 graph, same argmax; only the execution strategy differs
      Some(lpaOracle),
      "gr06's label propagation WITHOUT vertex-scale broadcasts — the LAST iterative loop with a per-round |V|-scale broadcast (VERDICT r11 #3), closing the family: every graph fixpoint in the inventory now has a form whose executed plan survives |V| past executor memory. gr06 ships the label table to every executor each round; here the undirected edge list is hash-partitioned ONCE on the neighbor endpoint and checkpointed, so each round's neighbor-label join is an equi-join where ONLY the vertex-scale label table moves, followed by the same ONE map-side-combining (node, label) count shuffle and max_by argmax (max count, tie -> min label — deterministic integer math, bit-identical to the oracle), and a vertex-grain SHUFFLE_MERGE left merge-back that keeps isolated vertices alive with their own label. All loop joins carry shuffle_merge hints binding both the static planner and AQE (PlanAuditSpec pins zero Broadcast operators in the executed plan; GraphSpec pins gr06 == gr13 row-for-row). Per-round bill: one |V|-row label shuffle + one (node,label)-grain count shuffle + sort cost — the Pregel message-grouping price, independent of community shape, at any |V|.") {
      (s, dir) =>
        val e = edges(s, dir, 0.9)
        // partitioned on b (the neighbor-label join key) BEFORE the
        // checkpoint: LogicalRDD keeps hashpartitioning(b), so rounds
        // only ever move the label table
        val und = Materialize.trackedLocalCheckpoint(
          e.select(col("src").as("a"), col("dst").as("b"))
            .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
            .distinct()
            .repartition(col("b")))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name"))
        var lab = nodes.select(col("node"), col("node").as("lab"))
        for (_ <- 1 to 3) {
          val cnt = und
            .join(lab.select(col("node").as("b"), col("lab")).hint("shuffle_merge"), "b")
            .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("c"))
          val pick = cnt.groupBy(col("a").as("node"))
            .agg(max_by(col("lab"), struct(col("c"), (-col("lab")).as("nl"))).as("plab"))
          lab = nodes.select("node").join(pick.hint("shuffle_merge"), Seq("node"), "left")
            .select(col("node"), coalesce(col("plab"), col("node")).as("lab"))
        }
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lab")
        lab.join(nodes.hint("shuffle_merge"), "node")
          .select(col("n_name").as("nation"), col("lab").as("community"),
            count(lit(1)).over(w).as("community_size"))
    },

    GraftQuery(
      "gr14_scc_seed",
      Some(sccSeedOracle),
      "STRONGLY connected component extraction — the first operator in the family that takes edge DIRECTION seriously (gr05/gr08 treat reachability forward-only or undirected; SCC is the 'mutual reachability' equivalence that undirected CC silently overstates — two pages linking the same hub are weakly connected but NOT in a cycle): the FW-BW decomposition's core step, SCC(seed) = forward-closure(seed) ∩ backward-closure(seed), run from a data-adaptive cycle-ELIGIBLE seed (min vertex with both an out- and an in-edge — a min-of-sources seed lands on a source vertex and degenerates to a singleton at two of three fixture scales; the eligibility probe is two vertex-scale semi joins). Both closures run gr05's frontier-dedup loop TO CONVERGENCE (empty frontier) under gr08's loud round cap — per round one frontier-edge equi-join + distinct + visited anti-join, cost bounded by vertices x mean degree, never paths; the backward pass is the same loop on role-swapped endpoints, NOT a materialized reversed edge list. The intersection is one vertex-scale semi join. At |V| past executor memory every broadcast here swaps to the gr09/gr12 shuffled-state form (same recipe, pinned elsewhere); the full FW-BW algorithm recurses on the three residual sets with this exact primitive. Oracle: two dedup-recursive CTEs and their intersection — the DEFINITION; GraphSpec replays it sequentially and pins a genuinely multi-vertex SCC at every fixture scale.") {
      (s, dir) =>
        val e = edges(s, dir)
        // cycle-eligible data-adaptive seed: min vertex with out AND in
        val seed = broadcast(e.select("src")
          .join(e.select(col("dst").as("src")).distinct(), Seq("src"), "left_semi")
          .agg(min(col("src")).as("node")))
        def closure(outKey: String, inKey: String): DataFrame = {
          var visited = seed
          var frontier = seed
          var round = 0
          val cap = 30 // |V|-bounded: a frontier can't survive past 25 hops
          var done = false
          while (!done && round < cap) {
            val next = Materialize(e
              .join(broadcast(frontier.withColumnRenamed("node", outKey)), outKey)
              .select(col(inKey).as("node")).distinct()
              .join(broadcast(visited), Seq("node"), "left_anti"))
            done = next.isEmpty
            if (!done) {
              visited = Materialize(visited.unionByName(next))
              frontier = next
            }
            round += 1
          }
          if (!done)
            throw new IllegalStateException(
              s"closure did not converge in $cap rounds — frontier outlived |V|?")
          visited
        }
        val fwd = closure("src", "dst")
        val bwd = closure("dst", "src")
        val scc = Materialize(fwd.join(broadcast(bwd), Seq("node"), "left_semi"))
        scc.join(broadcast(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").as("node"), col("n_name"))), "node")
          .crossJoin(broadcast(scc.agg(count(lit(1)).as("scc_size"))))
          .select(col("n_name").as("nation"), col("scc_size"))
    },

    GraftQuery(
      "gr15_bfs_shuffled",
      // gr04/gr05's shared oracle verbatim: one BFS ground truth, now
      // THREE execution strategies (engine fixpoint, broadcast
      // frontier, shuffled frontier) must all agree
      Some(reachSql("")),
      "gr05's frontier-dedup BFS WITHOUT frontier broadcasts — gr09's recipe applied to the reachability family, closing the last loop shape that assumed its per-round state fits an executor. gr05 broadcasts the frontier and visited sets each hop, which is RIGHT while frontiers are small — but on a 100 TB web graph a mid-BFS frontier peaks at a large fraction of |V| (small-world graphs reach most vertices within a few hops), and that hop's broadcast is the OOM. Here the edge list is hash-partitioned ONCE on src and checkpointed; each hop's expansion is an equi-join where ONLY the frontier moves, the dedup is the same vertex-grain distinct, and the visited-set subtraction is a SHUFFLE_MERGE left-anti join — every per-hop operator survives frontier ~ |V| (PlanAuditSpec pins zero Broadcast in the hop; GraphSpec pins gr15 == gr05 == gr04 row-for-row against the recursive-CTE oracle). With gr09/gr10/gr12/gr13 this makes the claim exact: EVERY iterative loop in the inventory — CC, k-core, PageRank, LPA, BFS — has a form whose executed plan holds when its loop state outgrows executor memory; the per-hop trade is the standard sort-merge price on the frontier shuffle.") {
      (s, dir) =>
        val e = Materialize.trackedLocalCheckpoint(
          edges(s, dir)
            .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"))
            .repartition(col("src")))
        val seed = s.range(1)
          .select(lit(0).cast("int").as("node"), lit(0).cast("int").as("hop"))
        var visited = seed
        var frontier = seed.select("node")
        for (h <- 1 to 3) {
          val next = Materialize.trackedLocalCheckpoint(
            bfsShuffledHop(e, frontier, visited, h))
          visited = visited.unionByName(next)
          frontier = next.select("node")
        }
        visited.select(col("node"), col("hop").as("min_hops"))
    },

    GraftQuery(
      "gr16_sssp_shuffled",
      // gr11's oracle verbatim — same four relaxations, same integer
      // costs; only the execution strategy differs
      Some(ssspOracle),
      "gr11's bounded Bellman-Ford WITHOUT dist-table broadcasts — the weighted companion of gr15, finishing the shuffled-twin matrix: gr11 ships the (node, dist) table to every executor each relaxation (right while the reached set is small; the scale-killer once relaxation has touched most of a billion-vertex graph). The weighted edge list is hash-partitioned ONCE on src and checkpointed; each relaxation is an equi-join where ONLY the dist table moves (one reached-set-sized shuffle), the min-combine stays the same map-side-partial vertex-grain aggregate, and the final nation attribution is a SHUFFLE_MERGE join — zero broadcasts anywhere in the executed plan (the 1-row seed comes from an aggregate over the checkpointed edges, SinglePartition-fed like q57's frames, not a hashed relation; PlanAuditSpec pins the whole query broadcast-free post-checkpoint). GraphSpec pins gr16 == gr11 row-for-row; the oracle is the recursive-CTE walk enumeration both have always matched. Same exact-int64 distances, same bounded-rounds discipline.") {
      (s, dir) =>
        val we = Materialize.trackedLocalCheckpoint(
          weightedEdges(s, dir).repartition(col("src")))
        val seed = we.agg(least(min(col("src")), min(col("dst"))).as("node"))
          .select(col("node"), lit(0L).as("d"))
        var dist = seed
        for (_ <- 1 to 4) {
          val relaxed = we
            .join(dist.select(col("node").as("src"), col("d").as("ds")).hint("shuffle_merge"), "src")
            .select(col("dst").as("node"), (col("ds") + col("cost")).as("d"))
          dist = dist.unionByName(relaxed)
            .groupBy("node").agg(min(col("d")).as("d"))
        }
        dist.join(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").as("node"), col("n_name"))
            .hint("shuffle_merge"), "node")
          .select(col("n_name").as("nation"), col("d").as("dist_units"))
    },

    GraftQuery(
      "gr17_scc_seed_shuffled",
      // gr14's oracle verbatim: one SCC-by-definition ground truth, two
      // execution strategies (broadcast vs shuffled frontiers) must agree
      Some(sccSeedOracle),
      "gr14's FW-BW seed-SCC extraction WITHOUT frontier broadcasts — the shuffled-twin recipe applied to the one loop the gr15/gr16 matrix quietly excluded (VERDICT r12 #4): gr14's two closures run TO CONVERGENCE, which is precisely the regime where a frontier approaches |V| (a run-to-convergence closure on a strongly connected region ends up visiting the whole region — the mid-BFS peak gr15 documents is the TERMINAL state here), so the broadcast-frontier form is guaranteed to hit the OOM wall exactly when the answer is largest. The edge list is checkpointed TWICE, hash-partitioned on src for the forward closure and on dst for the backward one — each direction's hop is an equi-join against a co-located edge side where ONLY the frontier moves; the dedup is the same vertex-grain distinct, the visited subtraction a SHUFFLE_MERGE left-anti, the cycle-eligible seed a shuffled semi join + 1-row aggregate over the checkpointed edges (SinglePartition-fed, not a hashed relation), and the fwd∩bwd intersection a SHUFFLE_MERGE left-semi. The only broadcast anywhere post-checkpoint is the 1-row scc_size frame (gr10's adaptive-k precedent: ONE row is scale-free by construction; PlanAuditSpec pins zero BroadcastHashJoin with at most that single 1-row BNLJ, and pins the closure hop broadcast-free in isolation). GraphSpec pins gr17 == gr14 row-for-row; with gr09/gr10/gr12/gr13/gr15/gr16 this restores the matrix claim exactly: EVERY iterative loop in the inventory has a form whose executed plan survives loop state past executor memory.") {
      (s, dir) =>
        val base = edges(s, dir)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"))
        val eSrc = Materialize.trackedLocalCheckpoint(base.repartition(col("src")))
        val eDst = Materialize.trackedLocalCheckpoint(base.repartition(col("dst")))
        // cycle-eligible data-adaptive seed (gr14's): min vertex with an
        // out- AND an in-edge — shuffled semi join, no vertex-set broadcast
        val seed = Materialize.trackedLocalCheckpoint(
          eSrc.select("src")
            .join(eDst.select(col("dst").as("src")).distinct().hint("shuffle_merge"),
              Seq("src"), "left_semi")
            .agg(min(col("src")).as("node")))
        def closure(e: DataFrame, outKey: String, inKey: String): DataFrame = {
          var visited = seed
          var frontier = seed
          var round = 0
          val cap = 30 // |V|-bounded: a frontier can't survive past 25 hops
          var done = false
          while (!done && round < cap) {
            val next = Materialize.trackedLocalCheckpoint(
              closureShuffledHop(e, frontier, visited, outKey, inKey))
            done = next.isEmpty
            if (!done) {
              visited = Materialize.trackedLocalCheckpoint(visited.unionByName(next))
              frontier = next
            }
            round += 1
          }
          if (!done)
            throw new IllegalStateException(
              s"closure did not converge in $cap rounds — frontier outlived |V|?")
          visited
        }
        val fwd = closure(eSrc, "src", "dst")
        val bwd = closure(eDst, "dst", "src")
        val scc = Materialize.trackedLocalCheckpoint(
          fwd.join(bwd.hint("shuffle_merge"), Seq("node"), "left_semi"))
        scc.join(Tables.load(s, dir, "nation")
            .select(col("n_nationkey").cast("int").as("node"), col("n_name"))
            .hint("shuffle_merge"), "node")
          .crossJoin(scc.agg(count(lit(1)).as("scc_size")))
          .select(col("n_name").as("nation"), col("scc_size"))
    },

    GraftQuery(
      "gr18_scc_decomposition",
      // definition-level oracle: scc_id(v) = MIN over everything
      // MUTUALLY reachable with v (reach is reflexive by its seed), the
      // algorithm-free mutual-reachability CTE — no FW-BW anywhere in it
      Some(s"""WITH RECURSIVE $edgesDuck,
              |reach(root, node) AS (
              |  SELECT n_nationkey, n_nationkey FROM nation
              |  UNION
              |  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node),
              |scc AS (SELECT r1.root AS node, MIN(r1.node) AS scc_id
              |        FROM reach r1 JOIN reach r2
              |          ON r1.root = r2.node AND r1.node = r2.root
              |        GROUP BY r1.root),
              |sz AS (SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS scc_size
              |       FROM scc GROUP BY 1)
              |SELECT CAST(s.node AS INT) AS node, CAST(s.scc_id AS INT) AS scc_id,
              |       z.scc_size
              |FROM scc s JOIN sz z ON z.scc_id = s.scc_id""".stripMargin),
      "FULL strongly-connected-component decomposition — gr14 extracts ONE seed's SCC; this is the production graph-mining deliverable its doc names: a (vertex, scc_id) labeling of EVERY vertex, computed by the FW-BW recursion run BREADTH-WISE as data parallelism instead of driver-side branching: every vertex carries a partition label, each outer round picks min-vertex pivots for ALL active partitions at once, runs ONE multi-source forward and ONE backward closure (frontier rows are (node, part) — the recursion's entire current level is two closures regardless of how many branches it has, which is what makes the recursion tree affordable on a cluster), labels each partition's fwd∩bwd with its pivot, and splits the remainder into the three FW-BW residual sets via label arithmetic part*4+tag (F-only/B-only/neither — each SCC-closed, the invariant that makes pivot = min(part) = min(SCC) and so labels DETERMINISTIC and equal to the oracle's min-mutually-reachable). Before each round a trim pass peels vertices with no within-partition in- or out-edge to convergence — those are singleton SCCs by definition (labels = themselves), and batch-trimming them is what kills the DAG-shaped residue that would otherwise cost one recursion level per vertex (the classical FW-BW+Trim result). Outer rounds are loud-capped (every active partition loses at least its pivot's SCC per round; trim clears pure-DAG partitions entirely, so depth tracks the nesting of cyclic regions, not |V|). Vertex-scale state rides broadcasts here — the gr14 regime, each one swapping to gr17's shuffled form past executor memory (same recipe, pinned there). Isolated vertices are singletons via trim round 1 — the tx12 nothing-vanishes contract. GraphSpec pins: multi-vertex SCC non-vacuity at every fixture scale, partition = exact cover, and gr14's seed-SCC appearing verbatim as one equivalence class.") {
      (s, dir) =>
        val labels = sccLabels(s, dir)
        labels.join(
            broadcast(labels.groupBy("scc_id").agg(count(lit(1)).as("scc_size"))),
            "scc_id")
          .select(col("node"), col("scc_id"), col("scc_size"))
    },

    GraftQuery(
      "gr19_condensation_levels",
      // definition-level oracle: gr18's mutual-reachability SCCs, the
      // distinct cross-class edges, and level = the LONGEST path from
      // any source — enumerated by a recursive CTE (finite: the
      // condensation is acyclic by construction)
      Some(s"""WITH RECURSIVE ${edgesDuckQ("0.75")},
              |reach(root, node) AS (
              |  SELECT n_nationkey, n_nationkey FROM nation
              |  UNION
              |  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node),
              |scc AS (SELECT r1.root AS node, MIN(r1.node) AS scc_id
              |        FROM reach r1 JOIN reach r2
              |          ON r1.root = r2.node AND r1.node = r2.root
              |        GROUP BY r1.root),
              |cond AS (SELECT DISTINCT s1.scc_id AS src_c, s2.scc_id AS dst_c
              |         FROM edges e JOIN scc s1 ON s1.node = e.src
              |                      JOIN scc s2 ON s2.node = e.dst
              |         WHERE s1.scc_id <> s2.scc_id),
              |walk(c, len) AS (
              |  SELECT DISTINCT scc_id, CAST(0 AS BIGINT) FROM scc
              |  WHERE scc_id NOT IN (SELECT dst_c FROM cond)
              |  UNION ALL
              |  SELECT cond.dst_c, w.len + 1 FROM walk w JOIN cond ON cond.src_c = w.c),
              |lvl AS (SELECT c AS scc_id, MAX(len) AS level FROM walk GROUP BY 1)
              |SELECT CAST(l.scc_id AS INT) AS scc_id, CAST(l.level AS BIGINT) AS level,
              |       CAST(m.n AS BIGINT) AS n_members
              |FROM lvl l JOIN (SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY 1) m
              |  ON m.scc_id = l.scc_id""".stripMargin),
      "CONDENSATION of the directed graph + topological LEVELS — what gr18's labeling is FOR: contracting each SCC to one vertex yields the condensation DAG (acyclic by construction — any cross-class cycle would have merged the classes), and the DAG is where every order-dependent graph computation becomes well-defined: dependency scheduling, stage assignment, influence stratification. Level(C) = length of the LONGEST source-to-C path — the earliest parallel stage C can run in, the quantity a scheduler actually needs (min-path layering under-orders: a node is not ready until its LAST prerequisite level clears). Execution: gr18's labels contract the edge list to distinct cross-class pairs (one vertex-grain join per endpoint + distinct — the edge scan happens once); levels run as a bounded max-relaxation fixpoint (level' = max(level, max over preds level+1), monotone non-decreasing and bounded by the DAG depth, so convergence is detected by an empty-increase probe under gr08's loud cap — the same discipline as every loop in the family, with MAX in place of MIN). The oracle pays recursive-CTE path enumeration — exponential in principle, fine at fixture scale — precisely the blowup the relaxation loop avoids (gr04/gr05's lesson, applied to longest path: the loop carries ONE row per class, not one per path). Isolated classes are sources at level 0 — nothing vanishes. GraphSpec replays levels sequentially over the driver-side condensation and pins acyclicity + a genuinely multi-level DAG.") {
      (s, dir) =>
        // the labeling is gr18's ARTIFACT — the condensation serve
        // consumes it the way production reads a stored decomposition,
        // so it is StageStore-memoized per (application, dir) (r19
        // optimization round); gr18's own query keeps running the
        // decomposition it measures (different q — no cross-masking)
        val labels = StageStore.table(s, dir, "scclabcond")(
          sccLabels(s, dir, CondensationQ))
        val e = edges(s, dir, CondensationQ)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"))
        val cond = Materialize.trackedLocalCheckpoint(
          e.join(broadcast(labels.select(col("node").as("src"), col("scc_id").as("src_c"))), "src")
            .join(broadcast(labels.select(col("node").as("dst"), col("scc_id").as("dst_c"))), "dst")
            .filter(col("src_c") =!= col("dst_c"))
            .select("src_c", "dst_c").distinct())
        var lvl = Materialize.trackedLocalCheckpoint(
          labels.select("scc_id").distinct().withColumn("level", lit(0L)))
        var round = 0
        var done = false
        while (!done && round < 30) { // DAG depth <= #classes <= |V|
          val relaxed = cond
            .join(broadcast(lvl.select(col("scc_id").as("src_c"), col("level"))), "src_c")
            .select(col("dst_c").as("scc_id"), (col("level") + 1).as("level"))
          val next = Materialize.trackedLocalCheckpoint(
            lvl.unionByName(relaxed).groupBy("scc_id").agg(max(col("level")).as("level")))
          // monotone fixpoint: converged when no class's level increased
          done = next.join(broadcast(lvl.withColumnRenamed("level", "old")), "scc_id")
            .filter(col("level") > col("old")).isEmpty
          lvl = next
          round += 1
        }
        if (!done)
          throw new IllegalStateException(
            "level relaxation did not converge in 30 rounds — is the condensation cyclic?")
        lvl.join(broadcast(labels.groupBy("scc_id").agg(count(lit(1)).as("n_members"))),
            "scc_id")
          .select(col("scc_id"), col("level"), col("n_members"))
    },

    GraftQuery(
      "gr20_personalized_pagerank",
      Some(s"""WITH $edgesDuck,
              |seed AS (SELECT MIN(src) AS s FROM edges),
              |r0 AS (SELECT n_nationkey AS node,
              |              CASE WHEN n_nationkey = (SELECT s FROM seed)
              |                   THEN 1000000000 ELSE 0 END AS r
              |       FROM nation),
              |r1 AS (SELECT n.node,
              |              CAST(CASE WHEN n.node = (SELECT s FROM seed)
              |                        THEN 150000000 ELSE 0 END
              |                   + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
              |       FROM r0 n
              |       LEFT JOIN edges e ON e.dst = n.node
              |       LEFT JOIN r0 r ON r.node = e.src
              |       LEFT JOIN outdeg o ON o.src = e.src
              |       GROUP BY n.node),
              |r2 AS (SELECT n.node,
              |              CAST(CASE WHEN n.node = (SELECT s FROM seed)
              |                        THEN 150000000 ELSE 0 END
              |                   + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
              |       FROM r1 n
              |       LEFT JOIN edges e ON e.dst = n.node
              |       LEFT JOIN r1 r ON r.node = e.src
              |       LEFT JOIN outdeg o ON o.src = e.src
              |       GROUP BY n.node),
              |r3 AS (SELECT n.node,
              |              CAST(CASE WHEN n.node = (SELECT s FROM seed)
              |                        THEN 150000000 ELSE 0 END
              |                   + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
              |       FROM r2 n
              |       LEFT JOIN edges e ON e.dst = n.node
              |       LEFT JOIN r2 r ON r.node = e.src
              |       LEFT JOIN outdeg o ON o.src = e.src
              |       GROUP BY n.node)
              |SELECT na.n_name AS nation, r3.r AS rank_units
              |FROM r3 JOIN nation na ON na.n_nationkey = r3.node
              |WHERE r3.r > 0""".stripMargin),
      "PERSONALIZED PageRank (random walk with restart) — gr01's global importance re-anchored to a query vertex, THE similarity-to-this-node primitive behind recommendation and related-entity queries ('which trade partners matter FROM France's point of view' is a different question from 'which matter globally', and the answer concentrates provably around the seed): same three power iterations, same d = 0.85, same exact integer 1e-9 units and truncating division at both sites, but all restart mass re-injects at the data-adaptive seed (min vertex with an out-edge — restart at a sink would strand the walk) instead of spreading 1/N everywhere. The structural consequence is the operator's point at 100 TB: rank mass is ZERO outside the seed's 3-hop out-neighborhood, so the output is neighborhood-sized, not graph-sized — vertices the walk never touched are ABSENT (r > 0 filter; gr11's absence-is-information contract), which is what makes per-query PPR serving viable where global PageRank must materialize |V| rows. Execution is gr01's loop verbatim with the personalized base term (one contribution shuffle per hop, vertex-scale rank table broadcast — swapping to gr12's shuffled form past executor memory); the oracle unrolls the same three iterations with the seed-anchored base. GraphSpec replays the exact integer recurrence driver-side, pins seed dominance, genuine mass decay with hop distance, and that the personalization genuinely reorders gr01's global ranking.") {
      (s, dir) =>
        val e = edges(s, dir)
        val outdeg = broadcast(e.groupBy("src").agg(count(lit(1)).as("deg")))
        val seed = broadcast(e.agg(min(col("src")).as("seed")))
        val nodes = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name"))
        def base = when(col("node") === col("seed"), lit(150000000L)).otherwise(lit(0L))
        var ranks = nodes.select("node").crossJoin(seed)
          .select(col("node"),
            when(col("node") === col("seed"), lit(1000000000L)).otherwise(lit(0L)).as("r"))
        for (_ <- 1 to 3) {
          val contribs = e
            .join(outdeg, "src")
            .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select(col("dst").as("node"), expr("r div deg").as("c"))
          ranks = nodes.select("node").crossJoin(seed)
            .join(contribs.groupBy("node").agg(sum(col("c")).as("s")), Seq("node"), "left")
            .select(col("node"),
              (base + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
        }
        ranks.filter(col("r") > 0)
          .join(broadcast(nodes), "node")
          .select(col("n_name").as("nation"), col("r").as("rank_units"))
    },

    GraftQuery(
      "gr21_betweenness_sampled",
      Some(betweennessOracle),
      s"SAMPLED-SOURCE BETWEENNESS centrality (Brandes accumulation over $BetK md5-chosen sources) — the PATH-centrality axis the family lacked: PageRank/PPR measure where walks concentrate, SCC/condensation measure structure; betweenness measures which vertices shortest paths FLOW THROUGH (the broker/bottleneck signal — remove a high-betweenness nation and trade re-routes). Exact Brandes is all-sources (O(V·E), unpayable at graph scale); THE scalable estimator samples k sources and accumulates their dependencies — here k=$BetK sources chosen by md5 rank (the family's no-RNG seed discipline), all processed SIMULTANEOUSLY at (seed, node) grain: one forward level-synchronous BFS counting shortest paths (sigma, exact BIGINTs — the gr05 frontier-dedup loop carrying a path-count aggregation), then Brandes' backward pass, per level one edge-grain join computing delta(v) = Σ_succ sigma(v)·(1 + delta(w))/sigma(w). All arithmetic is FIXED-POINT: 1e-9 units with truncating integer division at every accumulation site (gr20's discipline) — the op's DEFINED output is this deterministic integer recurrence (within depth·1e-9 of real-valued Brandes per site), order-free and bit-identical cross-engine where IEEE summation would hash-diverge. Both loops are loud-capped at depth $BetDepthCap (probed eccentricity ≤ 3 at every fixture scale; a frontier surviving the cap THROWS — the oracle unrolls exactly $BetDepthCap levels, so a silent truncation can never diverge from it). Every nation gets a row (zeros meaningful: 'checked, no path flows through' — dc03's explicit-clean contract). Frontier/visited/delta are (k·V)-grain broadcasts into the pinned edge list; past executor memory they swap to gr17's shuffled recipe verbatim (same equi-join keys). GraphSpec replays the integer Brandes driver-side and pins genuinely nested accumulation (a delta fed by a nonzero deeper delta) at spec scale.") {
      (s, dir) =>
        val e = edges(s, dir)
        val seeds = e.select(col("src").as("node")).distinct()
          .orderBy(md5(col("node").cast("string")), col("node")).limit(BetK)
          .select(col("node").as("s"))
        // forward: level-synchronous BFS over all seeds at once,
        // sigma = number of shortest paths (exact integer)
        var frontier = Materialize(seeds
          .select(col("s"), col("s").as("node"), lit(1L).as("sigma")))
        var visited = frontier.select("s", "node")
        val levels = scala.collection.mutable.ArrayBuffer(frontier)
        var depth = 0
        while (!frontier.isEmpty && depth < BetDepthCap) {
          depth += 1
          val next = Materialize(frontier
            .join(broadcast(e.withColumnRenamed("src", "node")), "node")
            .select(col("s"), col("dst").as("node"), col("sigma"))
            .join(broadcast(visited), Seq("s", "node"), "left_anti")
            .groupBy("s", "node").agg(sum(col("sigma")).as("sigma")))
          levels += next
          visited = Materialize(visited.unionByName(next.select("s", "node")))
          frontier = next
        }
        // loud cap, fired only on a REAL cap/unroll disagreement: a
        // non-empty frontier AT the cap is fine when its expansion is
        // empty (eccentricity exactly BetDepthCap — the oracle unrolls
        // that level too); only an unexplored level cap+1 would make
        // the truncation silently diverge from the oracle (ADVICE r14)
        if (!frontier.isEmpty) {
          val overflow = frontier
            .join(broadcast(e.withColumnRenamed("src", "node")), "node")
            .select(col("s"), col("dst").as("node"))
            .join(broadcast(visited), Seq("s", "node"), "left_anti")
          if (!overflow.isEmpty)
            throw new IllegalStateException(
              s"BFS has unexplored vertices beyond depth $BetDepthCap — the oracle " +
                s"unrolls exactly $BetDepthCap; raise BetDepthCap (and the oracle) " +
                "rather than truncate")
        }
        // backward: Brandes dependency accumulation, deepest level first;
        // fixed-point units with truncating division at every site
        var delta = Materialize(levels.last
          .select(col("s"), col("node"), col("sigma"), lit(0L).as("delta")))
        var acc = delta
        for (d <- levels.size - 2 to 0 by -1) {
          val wd = delta.select(col("s"), col("node").as("dst"),
            col("sigma").as("wsigma"), col("delta").as("wdelta"))
          val nd = Materialize(levels(d)
            .select(col("s"), col("node"), col("sigma"))
            .join(broadcast(e.withColumnRenamed("src", "node")
              .select(col("node"), col("dst"))), Seq("node"), "left")
            .join(broadcast(wd), Seq("s", "dst"), "left")
            .groupBy("s", "node", "sigma")
            .agg(coalesce(
              sum(expr(s"(sigma * (${BetScale}L + wdelta)) div wsigma")),
              lit(0L)).as("delta")))
          acc = acc.unionByName(nd)
          delta = nd
        }
        val bet = acc.filter(col("node") =!= col("s"))
          .groupBy("node").agg(sum(col("delta")).as("centrality_units"))
        Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
          .join(broadcast(bet), Seq("node"), "left")
          .select(col("nation"),
            coalesce(col("centrality_units"), lit(0L)).as("centrality_units"))
    },

    GraftQuery(
      "gr22_harmonic_closeness",
      Some(harmonicOracle),
      s"SAMPLED-SOURCE HARMONIC closeness centrality — the DISTANCE-centrality axis completing the family's measurement triad: PageRank/PPR measure where walks concentrate, betweenness (gr21) measures what paths flow THROUGH, harmonic measures what is CLOSE to everything (the reach/latency signal — a high-harmonic nation fills demand in few hops; the facility-location and influence-seeding score). Harmonic, not classic closeness, deliberately: classic closeness is 1/Σd and UNDEFINED on disconnected graphs (one unreachable vertex sends the sum to infinity), while harmonic sums 1/d with unreachable contributing ZERO — the only closeness variant that survives a sparsified (deliberately fragmenting) graph, which is why it is the one production graph stacks ship. Exact harmonic is all-pairs BFS (unpayable); THE scalable estimator samples k sources — gr21's estimator shape reused verbatim: the SAME $BetK md5-chosen seeds, the SAME level-synchronous frontier-dedup BFS at (seed, node) grain (first-visit level IS the distance — no sigma, no backward pass: harmonic costs exactly HALF of betweenness on identical machinery, which is the operational reason centrality suites compute it first), score(v) = Σ over seeds of $BetScale div d(seed,v) in fixed-point 1e-9 units with truncating division (deterministic, bit-identical cross-engine). Same loud depth-cap contract as gr21: cap $BetDepthCap, a frontier whose EXPANSION is non-empty at the cap throws, the oracle unrolls exactly $BetDepthCap levels so cap and unroll cannot silently disagree. Every nation gets a row, zeros meaningful ('checked, nothing sampled reaches it' — dc03's contract). Frontier/visited are (k·V)-grain broadcasts into the pinned edge list; past executor memory they swap to gr17's shuffled recipe verbatim. GraphSpec replays the BFS distances driver-side and pins depth->=2 contributions and multi-seed accumulation both non-vacuous.") {
      (s, dir) =>
        val e = edges(s, dir)
        val seeds = e.select(col("src").as("node")).distinct()
          .orderBy(md5(col("node").cast("string")), col("node")).limit(BetK)
          .select(col("node").as("s"))
        var frontier = Materialize(seeds.select(col("s"), col("s").as("node")))
        var visited = frontier
        var contribs = List.empty[DataFrame]
        var depth = 0
        while (!frontier.isEmpty && depth < BetDepthCap) {
          depth += 1
          val next = Materialize(frontier
            .join(broadcast(e.withColumnRenamed("src", "node")), "node")
            .select(col("s"), col("dst").as("node")).distinct()
            .join(broadcast(visited), Seq("s", "node"), "left_anti"))
          contribs ::= next.select(col("node"), lit(BetScale / depth).as("h"))
          visited = Materialize(visited.unionByName(next))
          frontier = next
        }
        // loud cap, gr21's exact contract: a non-empty frontier AT the
        // cap is fine when its expansion is empty (eccentricity exactly
        // BetDepthCap — the oracle unrolls that level too); only an
        // unexplored level cap+1 diverges silently from the oracle
        if (!frontier.isEmpty) {
          val overflow = frontier
            .join(broadcast(e.withColumnRenamed("src", "node")), "node")
            .select(col("s"), col("dst").as("node"))
            .join(broadcast(visited), Seq("s", "node"), "left_anti")
          if (!overflow.isEmpty)
            throw new IllegalStateException(
              s"BFS has unexplored vertices beyond depth $BetDepthCap — the oracle " +
                s"unrolls exactly $BetDepthCap; raise BetDepthCap (and the oracle) " +
                "rather than truncate")
        }
        val harm = contribs.reduce(_ unionByName _)
          .groupBy("node").agg(sum(col("h")).as("harmonic_units"))
        Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
          .join(broadcast(harm), Seq("node"), "left")
          .select(col("nation"),
            coalesce(col("harmonic_units"), lit(0L)).as("harmonic_units"))
    },

    GraftQuery(
      "gr23_incremental_cc",
      // ground truth: gr08's algorithm-free oracle VERBATIM — the
      // closure over the UNION graph; the incremental path must be
      // indistinguishable from the rebuild
      Some(ccOracle),
      "INCREMENTAL connected-component maintenance — the graph family's first DELTA operator (VERDICT r16 #3): every fixpoint in the family recomputes from scratch, but production graphs take edge DROPS continuously (dd12's exact situation on the graph side — near-dup edges arrive with every ingest batch and the dedup clustering that consumes CC labels cannot re-run a corpus-scale fixpoint per drop). The persisted artifact is gr08's labels on the BASE graph (a 70%-md5 split of the p90 edge list, built once per (application, dir) into a DiskMemo label store — the serve READS labels from parquet; the base edge list appears in no CC round); the 30% delta then merges components with DROP-SIZED work: (1) each delta edge's endpoints look up their base components — two joins against the vertex-scale broadcast label table; (2) edges whose endpoints already share a component are DISCARDED (they change nothing — at web scale this kills most of the delta, the reason incremental CC is cheap); (3) the survivors form a COMPONENT graph — vertices are touched component ids, never base vertices — and the SAME factored ccPointerJump loop (one definition with gr08) runs on it at DELTA grain: the merge map is component -> min(merged group), O(log n) rounds on the handful of touched components; (4) base labels left-join the broadcast merge map (coalesce = untouched components keep their label UNREAD from any loop — the work the delta does not touch is work not done), sizes recomputed in one vertex-grain window. Correctness is structural: union-graph components ARE the components of the quotient graph (base components + delta edges projected to component space), and min-label composes (each base label is already its component's min), so the merge map's min IS the union component's min — the oracle (gr08's closure, verbatim) checks exactly this, and GraphSpec pins both polarities non-vacuous: components genuinely merged by the delta AND components genuinely untouched, plus the merge loop's frames at component grain (never vertex or edge grain). At 100 TB: the base store accretes like every other persisted artifact, the per-drop bill is (delta edges) joins + a touched-components fixpoint, and the full edge list is never reshuffled — the quotient-graph trick is Kiveris et al.'s union-find batching applied at the label store.") {
      (s, dir) =>
        val store = ccBaseLabelStore(s, dir)
        val lab = s.read.parquet(s"$store/labels")
        // the 30%-md5 delta drop of the SAME p90 edge list gr08 runs on
        // (70/30, not 90/10: measured across all three fixtures, the
        // 10% delta's edges all land WITHIN base components — the
        // merge path would be spec-vacuous; at 70/30 every scale has
        // >= 1 genuinely-merged group AND >= 1 untouched component)
        val delta = Materialize(edges(s, dir, 0.9)
          .filter(edgeBucket100 >= 70)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst")))
        // steps (1)-(4) of the doc live in the factored [[ccMergeAdds]]
        // (one definition with gr25's addition phase): delta edges
        // project into component space, same-component edges drop, the
        // quotient graph pointer-jumps at component grain, untouched
        // components coalesce straight through
        val updated = ccMergeAdds(lab, delta)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        updated.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr24_cc_edge_deletion",
      // ground truth: gr08's algorithm-free closure over the REMAINING
      // edge set (the kept 80% of the _rm-salted md5 split)
      Some {
        val rmb = "CAST(('0x' || substring(md5(CAST(src AS VARCHAR) || '_' || " +
          "CAST(dst AS VARCHAR) || '_rm'), 1, 8)) AS BIGINT) % 100"
        s"""WITH RECURSIVE ${edgesDuckQ("0.9")},
           |kept AS (SELECT src, dst FROM edges WHERE $rmb < 80),
           |und AS (SELECT src AS a, dst AS b FROM kept
           |        UNION SELECT dst, src FROM kept),
           |reach(root, node) AS (
           |  SELECT n_nationkey, n_nationkey FROM nation
           |  UNION
           |  SELECT r.root, u.b FROM reach r JOIN und u ON u.a = r.node),
           |lab AS (SELECT root AS node, MIN(node) AS component FROM reach GROUP BY root)
           |SELECT CAST(node AS INT) AS node, CAST(component AS INT) AS component,
           |       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS component_size
           |FROM lab""".stripMargin
      },
      "DELETION-scoped connected-component maintenance — gr23's mirror image, and the HARD half of incremental CC (additions only ever MERGE, so component-grain pointer jumping suffices; deletions can SPLIT a component, and no label algebra recovers a split without re-examining edges — the reason production graph stores treat deletes as the expensive path): given the persisted FULL-graph labels (gr08's loop over all p90 edges, built once into a DiskMemo store — a SECOND artifact, distinct from gr23's base store) and a 20% md5-salted edge-deletion set, recompute ONLY the components that lost an edge. The scoping identity is structural: every edge's endpoints share a full component (components are maximal), so every surviving edge lies ENTIRELY inside one full component — untouched components (no deleted edge) keep their labels UNREAD by any loop, and the recompute subgraph is exactly the affected components' vertices + their surviving edges. Execution: deleted edges look up their component (one broadcast join against the vertex-scale label table), the distinct affected set broadcasts into a vertex semi-join (subgraph vertices) and an edge semi-join (subgraph edges), and the SAME factored ccPointerJump loop (one definition with gr08/gr23) re-labels the subgraph — work sized by the affected components, not the graph; splits fall out naturally as multiple new min-labels inside one old component. Final labels = untouched (from the store) UNION recomputed, sizes in one vertex-grain window. Oracle: gr08's algorithm-free closure over the kept edge set verbatim. GraphSpec pins the full polarity triple via a driver union-find replay: a component genuinely SPLIT by the deletions, a component genuinely untouched, and the recompute's subgraph strictly smaller than the graph. At 100 TB: the deletion batch is drop-sized, affected components are the work unit (a web-scale delete touches few), and the full-label store is the same artifact the addition path (gr23) maintains — together they are the production CC lifecycle over a mutating edge set.") {
      (s, dir) =>
        val store = ccFullLabelStore(s, dir)
        val lab = s.read.parquet(s"$store/labels")
        val rmb = expr(
          "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', CAST(dst AS STRING), '_rm')), 1, 8), 16, 10) AS BIGINT) % 100")
        val e = Materialize(edges(s, dir, 0.9)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
            (rmb >= 80).as("deleted")))
        val updated = ccDeleteScoped(lab,
          e.filter(!col("deleted")).select("src", "dst"),
          e.filter(col("deleted")).select("src", "dst"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        updated.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr25_cc_mixed_delta",
      // ground truth: gr08's algorithm-free closure over the POST-delta
      // graph (kept < 55 plus added >= 80 of the _zz-salted split) —
      // SHARED verbatim with gr28's shuffled twin (two execution
      // strategies, one closure, the gr08/gr09 pattern)
      Some(ccMixedDeltaOracle),
      "MIXED add+delete CC maintenance — the CC lifecycle in ONE delta application, which is what a production mutation batch actually looks like (a CDC-fed graph store receives inserts AND deletes per sync; applying them as two jobs double-pays the label-store read and serves an inconsistent intermediate state): given the persisted time-T labels (the `_zz` split's <80 slice of the p90 edges, a DiskMemo label store) and ONE delta — deletions = the [55,80) slice of the stored graph, additions = the >=80 slice, previously unseen — produce time-T+1 labels with work scoped by the delta on BOTH sides. Order is forced, not chosen: deletions first (the hard path — splits need edge re-examination) on the SURVIVING edge set via the factored ccDeleteScoped (gr24's core, one definition: affected components re-label, delete-untouched pass through unread), then additions on the post-delete labels via the factored ccMergeAdds (gr23's core, one definition: component-grain quotient pointer jump, merge map broadcast) — the reverse order would merge across edges about to be deleted and re-split what was just merged, paying the delete path twice. Correctness composes structurally: post-delete labels are exact on the survived graph (gr24's argument), and additions over an exact labeling reduce to the quotient graph (gr23's argument), so the pipeline equals a full recompute on (kept UNION added) — the oracle, gr08's algorithm-free closure over exactly that edge set. GraphSpec replays a driver union-find at each stage and pins all THREE polarities non-vacuous on the fixture: a component genuinely SPLIT by the deletions, post-delete components genuinely MERGED by the additions, and components untouched by the delete scope (the split constants 55/80 with the _zz salt are measured — the nearby 70/85-style splits leave one polarity vacuous at some scale). At 100 TB: one label-store read, one delta-sized delete scope, one drop-sized quotient merge — the per-sync bill of a mutating web/dedup graph, and the store write-back is the next batch's time-T artifact.") {
      (s, dir) =>
        val store = ccMixLabelStore(s, dir)
        val lab = s.read.parquet(s"$store/labels")
        val e = Materialize(edges(s, dir, 0.9)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
            zzBucket100.as("b")))
        // deletions first (see doc): scoped recompute on the survivors
        val afterDelete = Materialize(ccDeleteScoped(lab,
          e.filter(col("b") < 55).select("src", "dst"),
          e.filter(col("b") >= 55 && col("b") < 80).select("src", "dst")))
        // then additions: component-grain merge over the fresh labels
        val updated = ccMergeAdds(afterDelete,
          e.filter(col("b") >= 80).select("src", "dst"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        updated.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr26_delta_triangles",
      // ground truth: algorithm-free per-vertex triangle counts on the
      // base slice and the full graph — the delta path must be
      // indistinguishable from recounting both
      Some {
        val trb = "CAST(('0x' || substring(md5(CAST(src AS VARCHAR) || '_' || " +
          "CAST(dst AS VARCHAR) || '_tr'), 1, 8)) AS BIGINT) % 100"
        s"""WITH ${edgesDuckQ("0.9")},
           |undb AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
           |         FROM edges WHERE $trb < 90),
           |unda AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
           |         FROM edges),
           |trib AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM undb e1
           |         JOIN undb e2 ON e2.a = e1.b
           |         JOIN undb e3 ON e3.a = e1.a AND e3.b = e2.b),
           |tria AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM unda e1
           |         JOIN unda e2 ON e2.a = e1.b
           |         JOIN unda e3 ON e3.a = e1.a AND e3.b = e2.b),
           |pvb AS (SELECT v, COUNT(*) AS n FROM (SELECT x AS v FROM trib
           |        UNION ALL SELECT y FROM trib UNION ALL SELECT z FROM trib) u GROUP BY v),
           |pva AS (SELECT v, COUNT(*) AS n FROM (SELECT x AS v FROM tria
           |        UNION ALL SELECT y FROM tria UNION ALL SELECT z FROM tria) u GROUP BY v)
           |SELECT CAST(n_nationkey AS INT) AS node,
           |       CAST(COALESCE(pvb.n, 0) AS BIGINT) AS tri_base,
           |       CAST(COALESCE(pva.n, 0) - COALESCE(pvb.n, 0) AS BIGINT) AS tri_new,
           |       CAST(COALESCE(pva.n, 0) AS BIGINT) AS tri_total
           |FROM nation LEFT JOIN pvb ON pvb.v = n_nationkey
           |            LEFT JOIN pva ON pva.v = n_nationkey""".stripMargin
      },
      s"DELTA triangle maintenance — the graph family's delta discipline (gr23/gr24/gr25) applied to a COUNTING fixpoint-free statistic, and the case where the delta algebra is EXACT by construction: every triangle gained by an edge addition contains at least one added edge, so the update never re-examines base wedges (unlike CC deletion, addition-only triangle maintenance has no hard half). The persisted artifact is per-vertex triangle counts over the BASE graph (the `_tr`-salted <90 md5 slice of the p90 edges, canonical a<b — the split is MEASURED: every fixture's delta gains triangles, and at the spec fixture it produces multi-delta-edge triangles (the case that breaks naive per-edge counting) plus triangled vertices the delta never touches) in a DiskMemo store built once by gr02's audited wedge join; the serve READS it from parquet — the base wedge join runs in no serve. The delta path counts each NEW triangle exactly once via LEX-MIN-DELTA-EDGE OWNERSHIP: delta edge (a,b) owns triangle {a,b,w} iff the other two edges are base edges OR delta edges lexicographically greater than (a,b) — a triangle with k >= 1 delta edges is generated k times by the candidate join and passes the ownership filter exactly at its lex-min delta edge (the standard dynamic-triangle trick, Stefani et al./Makkar et al.'s edge-arrival attribution). The candidate join is delta x adjacency x adjacency — all equi-joins on vertices, |delta| * degree work, never the base graph's d-squared wedge bill; attribution explodes each owned triangle to its three corners and one vertex-grain aggregate updates the store's counts (untouched vertices coalesce through with tri_new = 0, unread by any join). The oracle recounts BOTH sides algorithm-free (wedge joins over base and union slices, per-vertex attribution) so the hash pins the ownership algebra exactly: overcounting a multi-delta triangle or double-counting via the candidate join's symmetry both shift tri_new. GraphSpec replays the ownership rule driver-side and pins the polarity triple: a multi-delta-edge triangle counted once, a vertex with new triangles, a triangled vertex untouched by the delta. At 100 TB: the store accretes per ingest batch like every persisted artifact, the per-batch bill is delta-sized joins against the adjacency list (the gr02 hub cap composes on the adjacency side), and the base corpus of wedges is never re-joined — the exact argument that makes streamed triangle counting viable on web graphs.") {
      (s, dir) =>
        val store = triBaseStore(s, dir)
        val base = s.read.parquet(s"$store/pv")
        val all = Materialize(edges(s, dir, 0.9)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
            (trBucket100 < 90).as("in_base")))
        // canonical undirected edges; an edge is base iff ANY directed
        // row of it lands in the base slice (matches the store's build)
        val undAll = Materialize(all
          .groupBy(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .agg(max(col("in_base")).as("is_base")))
        val delta = undAll.filter(!col("is_base")).select("a", "b")
        // adjacency with the base/delta label, both directions
        val nb = undAll.select(col("a").as("v"), col("b").as("w"), col("is_base"))
          .unionByName(undAll.select(col("b").as("v"), col("a").as("w"), col("is_base")))
        def lexGt(p: Column, q: Column) =
          p > col("d.a") || (p === col("d.a") && q > col("d.b"))
        val owned = delta.as("d")
          .join(nb.as("x"), col("x.v") === col("d.a") && col("x.w") =!= col("d.b"))
          .join(nb.as("y"), col("y.v") === col("d.b") && col("y.w") === col("x.w"))
          .filter(
            (col("x.is_base") ||
              lexGt(least(col("d.a"), col("x.w")), greatest(col("d.a"), col("x.w")))) &&
            (col("y.is_base") ||
              lexGt(least(col("d.b"), col("x.w")), greatest(col("d.b"), col("x.w")))))
          .select(col("d.a").as("t1"), col("d.b").as("t2"), col("x.w").as("t3"))
        val triNew = owned
          .select(explode(array(col("t1"), col("t2"), col("t3"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("n"))
        base.join(triNew, Seq("node"), "left")
          .select(col("node"), col("tri_base"),
            coalesce(col("n"), lit(0L)).as("tri_new"),
            (col("tri_base") + coalesce(col("n"), lit(0L))).as("tri_total"))
    },

    GraftQuery(
      "gr27_chained_cc_deltas",
      // ground truth: gr08's algorithm-free closure over ALL p90 edges
      // (the three chain windows partition the full edge list, so after
      // both deltas the graph IS the full graph)
      Some(ccOracle),
      "CHAINED delta application with STORE WRITE-BACK — the line gr25's doc ends on ('the store write-back is the next batch's time-T artifact') exercised as code: gr23/gr24/gr25 all serve deltas over labels a FIXPOINT produced, but production never re-runs the fixpoint — batch N's serve reads labels batch N-1's DELTA PATH wrote, so the thing that actually needs proving is that incrementality COMPOSES: a merge over merge-produced labels is still exact, arbitrarily deep. The chain: T0 labels = the factored ccPointerJump over the `_ch`-salted <30 slice (the only fixpoint anywhere, the bootstrap); delta1 = the [30,60) slice merged via the factored ccMergeAdds and the result PERSISTED as the store's labels_t1 (the write-back — this parquet is the artifact, not an in-flight frame); the SERVE reads labels_t1 and applies delta2 (the >=60 slice) with the same factored merge — at no point after bootstrap does any fixpoint or any pre-T1 edge re-enter the plan. Exactness composes structurally (gr23's argument applied twice: T1 is exact on the <60 graph because T0 was exact on the <30 graph and additions reduce to the quotient; the final labels are exact on the FULL graph because T1 was exact), and min-label composes through both merges — so the oracle is gr08's closure over all p90 edges VERBATIM, and a hash mismatch convicts the CHAIN, not any single merge. The 30/60 windows are measured: BOTH deltas genuinely merge components at every fixture (nearby splits leave delta1 vacuous at sf0.01). GraphSpec replays a union-find at each chain stage, pins the persisted labels_t1 equal to the <60-graph union-find (the intermediate artifact is exact — THE chained-increments pin), and pins both merge polarities non-vacuous. At 100 TB this is the steady state of a CDC-fed graph store: one bootstrap fixpoint ever, then per-sync quotient merges over the previous sync's written labels, each delta-sized.") {
      (s, dir) =>
        val store = ccChainLabelStore(s, dir)
        val labT1 = s.read.parquet(s"$store/labels_t1")
        val delta2 = Materialize(edges(s, dir, 0.9)
          .filter(chBucket100 >= 60)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst")))
        val updated = ccMergeAdds(labT1, delta2)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        updated.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    },

    GraftQuery(
      "gr28_cc_delta_shuffled",
      // same algorithm-free ground truth as gr25: two engines, two
      // execution strategies (broadcast vs shuffled labels), one closure
      Some(ccMixedDeltaOracle),
      "gr25's mixed add+delete CC maintenance WITHOUT vertex-scale broadcasts — gr09's recipe applied to the DELTA path (VERDICT r17 #3), closing the one loop family whose label lookups still assumed |V| fits an executor: gr23/gr24/gr25 broadcast the label table into every endpoint lookup and the merge-map rewrite, which is right on the nation fixture and a scale-killer on the graph the cores were built for (dd22 applies them to DOC-grain labels — corpus-scale at 100 TB, tens of GB past any executor). Here the IDENTICAL factored cores run with shuffled=true: every label-derived table — the deleted edges' component lookup, the delete scope's vertex/edge semi-joins, the added edges' two endpoint lookups, and the final merge-map rewrite — equi-joins under a SHUFFLE_MERGE hint (only vertex-scale rows move, once, keyed; nothing becomes a hashed relation), and both fixpoints run the factored ccShuffledFixpoint (one loop definition with gr09: edges partitioned on the hop key once and checkpointed, labels the only moving side per round). Same stores, same 55/80 `_zz` split, same deletions-first composition argument as gr25 — the oracle is gr25's closure VERBATIM, and GraphSpec pins gr28 == gr25 row-for-row (the broadcast and shuffled strategies cannot drift). PlanAuditSpec extends the gr09-gr16 pin: the isolated shuffled lookup cores (deltaComponentEdges / deltaAffected) and the serve's final executed plan carry ZERO broadcasts. The trade is gr09's: per-join sort cost on the shuffled sides — the price any billion-vertex delta application pays — bought once per drop, not per round.") {
      (s, dir) =>
        val store = ccMixLabelStore(s, dir)
        val lab = s.read.parquet(s"$store/labels")
        val e = Materialize(edges(s, dir, 0.9)
          .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
            zzBucket100.as("b")))
        val afterDelete = Materialize(ccDeleteScoped(lab,
          e.filter(col("b") < 55).select("src", "dst"),
          e.filter(col("b") >= 55 && col("b") < 80).select("src", "dst"),
          shuffled = true))
        val updated = ccMergeAdds(afterDelete,
          e.filter(col("b") >= 80).select("src", "dst"),
          shuffled = true)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        updated.select(col("node"), col("component"),
          count(lit(1)).over(w).as("component_size"))
    })

  /** gr25/gr28's shared ground truth: gr08's algorithm-free closure
    * over the POST-delta graph (kept < 55 plus added >= 80 of the
    * `_zz`-salted split) — one closure, two execution strategies.
    */
  private lazy val ccMixedDeltaOracle: String = {
    val zzb = "CAST(('0x' || substring(md5(CAST(src AS VARCHAR) || '_' || " +
      "CAST(dst AS VARCHAR) || '_zz'), 1, 8)) AS BIGINT) % 100"
    s"""WITH RECURSIVE ${edgesDuckQ("0.9")},
       |kept AS (SELECT src, dst FROM edges WHERE $zzb < 55 OR $zzb >= 80),
       |und AS (SELECT src AS a, dst AS b FROM kept
       |        UNION SELECT dst, src FROM kept),
       |reach(root, node) AS (
       |  SELECT n_nationkey, n_nationkey FROM nation
       |  UNION
       |  SELECT r.root, u.b FROM reach r JOIN und u ON u.a = r.node),
       |lab AS (SELECT root AS node, MIN(node) AS component FROM reach GROUP BY root)
       |SELECT CAST(node AS INT) AS node, CAST(component AS INT) AS component,
       |       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS component_size
       |FROM lab""".stripMargin
  }

  /** Deterministic per-edge md5 bucket (0..99) — gr23's base/delta
    * split key, the sp01 reproducible-split contract applied to edges.
    */
  private def edgeBucket100 = expr(
    "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', CAST(dst AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100")

  /** gr23's persisted artifact: gr08's labels over the BASE graph (the
    * <90 md5 edge split of the p90 list), built ONCE per (application,
    * dir) with the factored [[ccPointerJump]] loop and read from
    * parquet by every serve — the incremental pass must never re-run
    * the base fixpoint or touch the base edge list.
    */
  private def ccBaseLabelStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ccbase_$tag", dir)
    DiskMemo.ensure(s"ccbase_$tag", out) {
      val base = edges(s, dir, 0.9).filter(edgeBucket100 < 70)
      val und = Materialize.trackedLocalCheckpoint(
        base.select(col("src").cast("int").as("a"), col("dst").cast("int").as("b"))
          .unionByName(
            base.select(col("dst").cast("int").as("a"), col("src").cast("int").as("b")))
          .distinct())
      val nodes = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("node"))
      ccPointerJump(und, nodes)
        .write.mode("overwrite").parquet(s"$out/labels")
    }
  }

  /** gr24's deletion-scoped recompute, factored (r17) so gr25's mixed
    * delta runs the IDENTICAL delete path: affected components from
    * the deleted edges' endpoint lookups, their vertices + surviving
    * edges re-labeled via [[ccPointerJump]], untouched labels passed
    * through unread. `lab` = labels over the pre-delete graph; `kept`
    * = surviving edges; `deleted` = the removed edges. All three
    * frames' edges must come from the SAME pre-delete graph (the
    * scoping identity — every edge lies inside one component — holds
    * only then).
    */
  private def ccDeleteScoped(lab: DataFrame,
      kept: DataFrame, deleted: DataFrame,
      shuffled: Boolean = false): DataFrame = {
    // the gr08/gr09 trade at delta grain (r18, VERDICT r17 #3): the
    // label table is VERTEX-scale — broadcast is right while labels
    // are MBs (the nation fixture), a scale-killer when the graph is
    // the dedup doc graph at 100 TB. shuffled=true applies gr09's
    // recipe: every label-derived table equi-joins under a
    // shuffle_merge hint, and the scoped relabel runs the shuffled
    // fixpoint — nothing vertex-scale is ever a hashed relation.
    def lkp(df: DataFrame): DataFrame =
      if (shuffled) df.hint("shuffle_merge") else broadcast(df)
    val affected0 = deltaAffected(lab, deleted, shuffled)
    val affected = if (shuffled) affected0.hint("shuffle_merge")
      else broadcast(affected0)
    val subNodes = lab.join(affected, Seq("component"), "left_semi")
      .select("node")
    val subEdges = kept
      .join(lkp(lab.select(col("node").as("src"), col("component"))), "src")
      .join(affected, Seq("component"), "left_semi")
      .select("src", "dst")
    val undRaw = subEdges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(subEdges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val relabeled =
      if (shuffled) ccShuffledFixpoint(undRaw, subNodes)
      else ccPointerJump(Materialize.trackedLocalCheckpoint(undRaw), subNodes)
    lab.join(affected, Seq("component"), "left_anti")
      .select("node", "component")
      .unionByName(relabeled)
  }

  /** The delete path's component scoping in isolation — the
    * vertex-scale label lookup VERDICT r17 #3 names. Package-visible
    * so PlanAuditSpec can execute the shuffled form alone and pin
    * zero broadcasts (the eager checkpoints inside [[ccDeleteScoped]]
    * hide it from the serve's final plan).
    */
  private[graft] def deltaAffected(lab: DataFrame, deleted: DataFrame,
      shuffled: Boolean): DataFrame = {
    val labSrc = lab.select(col("node").as("src"), col("component"))
    deleted
      .join(if (shuffled) labSrc.hint("shuffle_merge") else broadcast(labSrc), "src")
      .select("component").distinct()
  }

  /** gr23's addition merge, factored (r17) for gr25 and for the dedup
    * family's cluster-label maintenance (dd22 — near-dup edges only
    * ever ADD, so this merge path alone is exact there): added edges
    * project into component space via the broadcast label table,
    * same-component edges drop, the survivors' quotient graph pointer-
    * jumps at component grain, and the broadcast merge map rewrites
    * only touched labels.
    */
  private[operators] def ccMergeAdds(lab: DataFrame, adds: DataFrame,
      shuffled: Boolean = false): DataFrame = {
    // shuffled=true (r18, VERDICT r17 #3): the two endpoint lookups
    // against the VERTEX-scale label table and the merge-map rewrite
    // become shuffle_merge equi-joins, and the quotient fixpoint runs
    // gr09's shuffled rounds — the form dd22's doc-grain labels need
    // at 100 TB, where the label table is corpus-scale. The quotient
    // graph itself stays drop-sized either way; what changes is that
    // no label-derived table is ever built into a hashed relation.
    val cedges = deltaComponentEdges(lab, adds, shuffled)
    val cnodes = cedges.select(col("ca").as("node"))
      .unionByName(cedges.select(col("cb").as("node"))).distinct()
    val cundRaw = cedges.select(col("ca").as("a"), col("cb").as("b"))
      .unionByName(cedges.select(col("cb").as("a"), col("ca").as("b")))
      .distinct()
    val mergeMap = (if (shuffled) ccShuffledFixpoint(cundRaw, cnodes)
      else ccPointerJump(Materialize.trackedLocalCheckpoint(cundRaw), cnodes))
      .select(col("node").as("component"), col("component").as("merged"))
    lab.join(if (shuffled) mergeMap.hint("shuffle_merge") else broadcast(mergeMap),
        Seq("component"), "left")
      .select(col("node"),
        coalesce(col("merged"), col("component")).as("component"))
  }

  /** The addition path's endpoint-lookup joins in isolation — added
    * edges projected into component space via the vertex-scale label
    * table, same-component edges dropped. Package-visible so
    * PlanAuditSpec can execute the shuffled form alone and pin zero
    * broadcasts (inside [[ccMergeAdds]] the frame feeds eager
    * checkpoints and never appears in the serve's final plan).
    */
  private[graft] def deltaComponentEdges(lab: DataFrame, adds: DataFrame,
      shuffled: Boolean): DataFrame = {
    def lkp(df: DataFrame): DataFrame =
      if (shuffled) df.hint("shuffle_merge") else broadcast(df)
    adds
      .join(lkp(lab.select(col("node").as("src"), col("component").as("ca"))), "src")
      .join(lkp(lab.select(col("node").as("dst"), col("component").as("cb"))), "dst")
      .filter(col("ca") =!= col("cb"))
      .select("ca", "cb")
  }

  /** gr25's persisted artifact: gr08's labels over the time-T graph
    * (the `_zz` md5 split's < 80 slice of the p90 edges) — the state a
    * mixed add+delete delta then mutates.
    */
  private def ccMixLabelStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ccmix_$tag", dir)
    DiskMemo.ensure(s"ccmix_$tag", out) {
      val g0 = edges(s, dir, 0.9).filter(zzBucket100 < 80)
      val und = Materialize.trackedLocalCheckpoint(
        g0.select(col("src").cast("int").as("a"), col("dst").cast("int").as("b"))
          .unionByName(
            g0.select(col("dst").cast("int").as("a"), col("src").cast("int").as("b")))
          .distinct())
      val nodes = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("node"))
      ccPointerJump(und, nodes)
        .write.mode("overwrite").parquet(s"$out/labels")
    }
  }

  /** gr25's delta-split key — a `_zz`-salted per-edge md5 bucket,
    * independent of gr23's split and gr24's `_rm` deletions.
    */
  private def zzBucket100 = expr(
    "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', CAST(dst AS STRING), '_zz')), 1, 8), 16, 10) AS BIGINT) % 100")

  /** gr26's base/delta split key — `_tr`-salted, independent of the CC
    * family's splits. The 90 threshold is measured (see gr26's doc).
    */
  private def trBucket100 = expr(
    "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', CAST(dst AS STRING), '_tr')), 1, 8), 16, 10) AS BIGINT) % 100")

  /** gr27's chain-window key — `_ch`-salted; the 30/60 windows are
    * measured (see gr27's doc).
    */
  private def chBucket100 = expr(
    "CAST(conv(substring(md5(concat(CAST(src AS STRING), '_', CAST(dst AS STRING), '_ch')), 1, 8), 16, 10) AS BIGINT) % 100")

  /** gr27's persisted artifact: the chained label store — T0 labels
    * from the bootstrap fixpoint over the `_ch` < 30 slice, then the
    * [30,60) delta MERGED (never re-fixpointed) and written back as
    * `labels_t1`, the artifact the serve's next delta reads. Both
    * stages persist so the spec can pin the intermediate write-back
    * exact.
    */
  private def ccChainLabelStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ccchain_$tag", dir)
    DiskMemo.ensure(s"ccchain_$tag", out) {
      val e = Materialize(edges(s, dir, 0.9)
        .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
          chBucket100.as("b")))
      val e0 = e.filter(col("b") < 30).select("src", "dst")
      val und0 = Materialize.trackedLocalCheckpoint(
        e0.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))
          .distinct())
      val nodes = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("node"))
      val t0 = ccPointerJump(und0, nodes)
      t0.write.mode("overwrite").parquet(s"$out/labels_t0")
      // the write-back: delta1 merges over the PERSISTED T0 read — the
      // serve's input is merge-produced, not fixpoint-produced
      ccMergeAdds(s.read.parquet(s"$out/labels_t0"),
          e.filter(col("b") >= 30 && col("b") < 60).select("src", "dst"))
        .write.mode("overwrite").parquet(s"$out/labels_t1")
    }
  }

  /** gr26's persisted artifact: per-vertex triangle counts over the
    * base slice (canonical undirected `_tr` < 90 of the p90 edges),
    * built ONCE per (application, dir) by gr02's wedge join and read
    * from parquet by every serve — the base d-squared wedge bill is
    * paid at build time, never per delta.
    */
  private def triBaseStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"tribase_$tag", dir)
    DiskMemo.ensure(s"tribase_$tag", out) {
      val b = edges(s, dir, 0.9).filter(trBucket100 < 90)
      val und = Materialize.trackedLocalCheckpoint(
        b.select(least(col("src"), col("dst")).cast("int").as("a"),
            greatest(col("src"), col("dst")).cast("int").as("b"))
          .distinct())
      val tri = und.as("e1")
        .join(und.as("e2"), col("e2.a") === col("e1.b"))
        .join(und.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").as("t1"), col("e1.b").as("t2"), col("e2.b").as("t3"))
      val pv = tri.select(explode(array(col("t1"), col("t2"), col("t3"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_base"))
      Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("node"))
        .join(pv, Seq("node"), "left")
        .select(col("node"), coalesce(col("tri_base"), lit(0L)).as("tri_base"))
        .write.mode("overwrite").parquet(s"$out/pv")
    }
  }

  /** gr24's persisted artifact: gr08's labels over the FULL p90 graph
    * (the store a production CC lifecycle maintains — gr23 merges
    * additions into it, gr24 scopes deletions against it), built ONCE
    * per (application, dir) with the factored [[ccPointerJump]] loop.
    */
  private def ccFullLabelStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ccfull_$tag", dir)
    DiskMemo.ensure(s"ccfull_$tag", out) {
      val e = edges(s, dir, 0.9)
      val und = Materialize.trackedLocalCheckpoint(
        e.select(col("src").cast("int").as("a"), col("dst").cast("int").as("b"))
          .unionByName(
            e.select(col("dst").cast("int").as("a"), col("src").cast("int").as("b")))
          .distinct())
      val nodes = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("node"))
      ccPointerJump(und, nodes)
        .write.mode("overwrite").parquet(s"$out/labels")
    }
  }

  /** gr18's FW-BW+Trim decomposition as a reusable primitive: the
    * checkpointed (node, scc_id) labeling of EVERY nation vertex over
    * the median-sparsified trade graph (scc_id = min vertex of the
    * class — see gr18's doc for the invariant argument). Shared by
    * gr18 (sizes view) and gr19 (condensation DAG).
    */
  private[graft] def sccLabels(s: SparkSession, dir: String, q: Double = 0.5): DataFrame = {
    val e = Materialize.trackedLocalCheckpoint(edges(s, dir, q)
      .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst")))
    var parts = Materialize.trackedLocalCheckpoint(Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("int").as("node"))
      .withColumn("part", lit(0L)))
    var labelFrames = List.empty[DataFrame]
    // within-partition edge view: both endpoints active AND in the
    // same partition (the subgraph the current recursion level sees)
    def withinEdges(p: DataFrame): DataFrame = Materialize.trackedLocalCheckpoint(
      e.join(broadcast(p.select(col("node").as("src"), col("part"))), "src")
        .join(broadcast(p.select(col("node").as("dst"), col("part").as("p2"))), "dst")
        .filter(col("part") === col("p2"))
        .select("src", "dst", "part"))
    // Worst-case depth is the SCC-chain length, not just cyclic-region
    // nesting: with min-vertex pivots, a chain of k SCCs whose global
    // min always lands in the head class peels ONE class per level, so
    // a convergent decomposition can legitimately need |V| levels on an
    // adversarial fixture. Cap at |V| (25 nations) by default,
    // conf-overridable like DegCapKey — the loud-cap discipline stays,
    // without the adversarial-pivot false alarm.
    val outerCap = s.conf.get(SccOuterCapKey, "25").toInt
    var outer = 0
    while (outer < outerCap && !parts.isEmpty) {
      // ---- trim to convergence: no within-part out-edge OR in-edge
      //      => singleton SCC, label = self
      var trimming = true
      var tr = 0
      while (trimming && tr < 30) {
        val we = withinEdges(parts)
        val survivors = Materialize.trackedLocalCheckpoint(parts
          .join(broadcast(we.select(col("src").as("node"), col("part")).distinct()),
            Seq("node", "part"), "left_semi")
          .join(broadcast(we.select(col("dst").as("node"), col("part")).distinct()),
            Seq("node", "part"), "left_semi"))
        val trimmed = Materialize.trackedLocalCheckpoint(
          parts.join(broadcast(survivors), Seq("node", "part"), "left_anti"))
        if (trimmed.isEmpty) trimming = false
        else {
          labelFrames ::= trimmed.select(col("node"), col("node").as("scc_id"))
          parts = survivors
        }
        tr += 1
      }
      if (trimming)
        throw new IllegalStateException("trim did not converge in 30 rounds")
      if (!parts.isEmpty) {
        val we = withinEdges(parts)
        val pivots = Materialize.trackedLocalCheckpoint(
          parts.groupBy("part").agg(min(col("node")).as("pivot")))
        // multi-source closure: ALL partitions' pivots expand at once,
        // every frontier row tagged (node, part) so expansion never
        // leaks across partition boundaries
        def mclosure(outKey: String, inKey: String): DataFrame = {
          var visited = Materialize.trackedLocalCheckpoint(
            pivots.select(col("pivot").as("node"), col("part")))
          var frontier = visited
          var round = 0
          var done = false
          while (!done && round < 30) {
            val next = Materialize.trackedLocalCheckpoint(we
              .join(broadcast(frontier.withColumnRenamed("node", outKey)),
                Seq(outKey, "part"))
              .select(col(inKey).as("node"), col("part")).distinct()
              .join(broadcast(visited), Seq("node", "part"), "left_anti"))
            done = next.isEmpty
            if (!done) {
              visited = Materialize.trackedLocalCheckpoint(visited.unionByName(next))
              frontier = next
            }
            round += 1
          }
          if (!done)
            throw new IllegalStateException(
              "closure did not converge in 30 rounds — frontier outlived |V|?")
          visited
        }
        val fwd = mclosure("src", "dst")
        val bwd = mclosure("dst", "src")
        val sccs = Materialize.trackedLocalCheckpoint(
          fwd.join(broadcast(bwd), Seq("node", "part"), "left_semi"))
        labelFrames ::= Materialize.trackedLocalCheckpoint(sccs.join(broadcast(pivots), "part")
          .select(col("node"), col("pivot").as("scc_id")))
        // three SCC-closed residual sets, one label-arithmetic split
        parts = Materialize.trackedLocalCheckpoint(parts
          .join(broadcast(sccs), Seq("node", "part"), "left_anti")
          .join(broadcast(fwd.withColumn("in_f", lit(1))),
            Seq("node", "part"), "left")
          .join(broadcast(bwd.withColumn("in_b", lit(1))),
            Seq("node", "part"), "left")
          .select(col("node"),
            (col("part") * 4 + when(col("in_f") === 1, lit(1L))
              .when(col("in_b") === 1, lit(2L)).otherwise(lit(3L))).as("part")))
      }
      outer += 1
    }
    if (!parts.isEmpty)
      throw new IllegalStateException(
        s"FW-BW recursion did not converge in $outerCap levels — " +
          "cyclic-region nesting outlived the cap?")
    Materialize.trackedLocalCheckpoint(labelFrames.reduce(_.unionByName(_)))
  }

  /** Weighted sparsified edge list `(src, dst, cost)` for gr11:
    * cost = 1e6 div support — the stronger the trade link, the cheaper
    * the hop, in exact integer units (truncating division, gr01's
    * discipline). Same support/median pipeline as [[edges]].
    */
  private[graft] def weightedEdges(s: SparkSession, dir: String): DataFrame = {
    val t = (n: String) => Tables.load(s, dir, n)
    val support = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val med = support.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY w)").as("m"))
    Materialize(support.crossJoin(broadcast(med))
      .filter(col("w") > col("m"))
      .select(col("src"), col("dst"), expr("1000000 div w").as("cost")))
  }

  /** Undirected degree table of an `(a, b)` edge list. */
  private[graft] def undDegrees(df: DataFrame): DataFrame =
    df.select(col("a").as("v"))
      .unionByName(df.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

  /** One gr10 peel round: surviving-vertex set computed from the
    * current degrees (pinned once — both semi joins consume it), then
    * BOTH endpoint filters as SHUFFLE_MERGE left-semi joins: the
    * vertex-scale keep-set is never built into a hashed relation, so
    * the plan holds when |V| outgrows executor memory. `kf` is the
    * 1-row adaptive-k frame. Package-visible so PlanAuditSpec audits
    * the round's executed plan in isolation (inside gr10 each round
    * hides behind the Materialize pin).
    */
  private[graft] def kcoreShuffledPeel(cur: DataFrame, kf: DataFrame): DataFrame = {
    val keep = Materialize(undDegrees(cur).crossJoin(kf)
      .filter(col("d") >= col("k")).select("v"))
    cur
      .join(keep.select(col("v").as("a")).hint("shuffle_merge"),
        Seq("a"), "left_semi")
      .join(keep.select(col("v").as("b")).hint("shuffle_merge"),
        Seq("b"), "left_semi")
  }

  /** Shared gr01/gr12 ground truth: three unrolled PageRank power
    * iterations in integer 1e-9 units — one oracle, two execution
    * strategies (broadcast rank table vs hash-partitioned equi-joined
    * ranks), the gr09 discipline applied to PageRank.
    */
  private def pagerankOracle =
    s"""WITH $edgesDuck,
       |r0 AS (SELECT n_nationkey AS node, $InitUnits AS r FROM nation),
       |r1 AS (SELECT n.node,
       |              CAST($BaseUnits + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
       |       FROM r0 n
       |       LEFT JOIN edges e ON e.dst = n.node
       |       LEFT JOIN r0 r ON r.node = e.src
       |       LEFT JOIN outdeg o ON o.src = e.src
       |       GROUP BY n.node),
       |r2 AS (SELECT n.node,
       |              CAST($BaseUnits + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
       |       FROM r1 n
       |       LEFT JOIN edges e ON e.dst = n.node
       |       LEFT JOIN r1 r ON r.node = e.src
       |       LEFT JOIN outdeg o ON o.src = e.src
       |       GROUP BY n.node),
       |r3 AS (SELECT n.node,
       |              CAST($BaseUnits + (85 * COALESCE(SUM(r.r // o.deg), 0)) // 100 AS BIGINT) AS r
       |       FROM r2 n
       |       LEFT JOIN edges e ON e.dst = n.node
       |       LEFT JOIN r2 r ON r.node = e.src
       |       LEFT JOIN outdeg o ON o.src = e.src
       |       GROUP BY n.node)
       |SELECT na.n_name AS nation, r3.r AS rank_units
       |FROM r3 JOIN nation na ON na.n_nationkey = r3.node""".stripMargin

  /** Shared gr06/gr13 ground truth: three synchronized LPA rounds
    * (count neighbor labels, pick max count with tie -> min label,
    * isolated nodes keep their own) at the 0.9 sparsification.
    */
  private def lpaOracle = {
    val round = (i: Int, prev: String) =>
      s"""p$i AS (SELECT node, lab FROM (
         |    SELECT u.a AS node, l.lab,
         |           ROW_NUMBER() OVER (PARTITION BY u.a ORDER BY COUNT(*) DESC, l.lab) AS rn
         |    FROM und u JOIN $prev l ON l.node = u.b
         |    GROUP BY u.a, l.lab) t WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT n.node, COALESCE(p.lab, n.node) AS lab
         |      FROM l0 n LEFT JOIN p$i p ON p.node = n.node)""".stripMargin
    s"""WITH ${edgesDuckQ("0.9")},
       |und AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
       |       UNION SELECT dst, src FROM edges),
       |l0 AS (SELECT n_nationkey AS node, n_nationkey AS lab FROM nation),
       |${round(1, "l0")},
       |${round(2, "l1")},
       |${round(3, "l2")}
       |SELECT na.n_name AS nation, l3.lab AS community,
       |       CAST(COUNT(*) OVER (PARTITION BY l3.lab) AS BIGINT) AS community_size
       |FROM l3 JOIN nation na ON na.n_nationkey = l3.node""".stripMargin
  }

  /** Shared gr11/gr16 ground truth: the 4-relaxation weighted-walk
    * minimum from the data-adaptive seed — one oracle, two execution
    * strategies (broadcast vs shuffled dist table).
    */
  private def ssspOracle =
    s"""WITH RECURSIVE support AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |med AS (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY w) AS m FROM support),
       |wedges AS (SELECT src, dst, 1000000 // w AS cost FROM support, med WHERE w > m),
       |seed AS (SELECT LEAST((SELECT MIN(src) FROM wedges),
       |                      (SELECT MIN(dst) FROM wedges)) AS n),
       |walk(node, d, hops) AS (
       |  SELECT n, CAST(0 AS BIGINT), 0 FROM seed
       |  UNION ALL
       |  SELECT e.dst, wk.d + e.cost, wk.hops + 1
       |  FROM walk wk JOIN wedges e ON e.src = wk.node WHERE wk.hops < 4)
       |SELECT na.n_name AS nation, MIN(walk.d) AS dist_units
       |FROM walk JOIN nation na ON na.n_nationkey = walk.node
       |GROUP BY 1""".stripMargin

  /** One gr15 BFS hop with the frontier and visited sets EQUI-JOINED
    * under SHUFFLE_MERGE hints — no broadcast of any DATA-DERIVED
    * frontier, by construction. (Hop 1's literal 1-row seed may still
    * constant-fold into a trivial single-row broadcast — correct and
    * scale-irrelevant: only data-derived frontiers, i.e. every hop
    * past the first, can ever be large, and those plan SortMergeJoin —
    * PlanAuditSpec audits exactly that case.) `e` must be `(src, dst)`
    * edges partitioned on `src`. Package-visible so the audit sees one
    * hop's executed plan in isolation (inside gr15 each hop hides
    * behind the checkpoint).
    */
  private[graft] def bfsShuffledHop(
      e: DataFrame, frontier: DataFrame, visited: DataFrame, h: Int): DataFrame =
    e.join(frontier.withColumnRenamed("node", "src").hint("shuffle_merge"), "src")
      .select(col("dst").as("node")).distinct()
      .join(visited.select("node").hint("shuffle_merge"), Seq("node"), "left_anti")
      .withColumn("hop", lit(h).cast("int"))

  /** One gr17 closure hop: gr15's shuffled-hop shape generalized to a
    * role-swappable direction (outKey/inKey), no hop column — the
    * convergence loops track visited sets, not depths. ONLY the
    * frontier and visited sets move (equi-joins under SHUFFLE_MERGE
    * hints against the pre-partitioned edge side); package-visible so
    * PlanAuditSpec can pin the hop broadcast-free in isolation.
    */
  private[graft] def closureShuffledHop(
      e: DataFrame, frontier: DataFrame, visited: DataFrame,
      outKey: String, inKey: String): DataFrame =
    e.join(frontier.withColumnRenamed("node", outKey).hint("shuffle_merge"), outKey)
      .select(col(inKey).as("node")).distinct()
      .join(visited.select("node").hint("shuffle_merge"), Seq("node"), "left_anti")

  /** Shared gr08/gr09 ground truth: the transitive closure itself —
    * component(v) = MIN over everything reachable from v (undirected),
    * via a dedup-recursive CTE seeded at every node. Algorithm-free,
    * so both propagation loops are checked against the DEFINITION.
    */
  private def ccOracle =
    s"""WITH RECURSIVE ${edgesDuckQ("0.9")},
       |und AS (SELECT src AS a, dst AS b FROM edges
       |        UNION SELECT dst, src FROM edges),
       |reach(root, node) AS (
       |  SELECT n_nationkey, n_nationkey FROM nation
       |  UNION
       |  SELECT r.root, u.b FROM reach r JOIN und u ON u.a = r.node),
       |lab AS (SELECT root AS node, MIN(node) AS component FROM reach GROUP BY root)
       |SELECT CAST(node AS INT) AS node, CAST(component AS INT) AS component,
       |       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS component_size
       |FROM lab""".stripMargin

  /** gr08's pointer-jumping fixpoint, factored (r17) so gr23's
    * component-grain merge pass runs the IDENTICAL loop: per round
    * (1) one neighbor-min hop — edge-grain map-side-combining MIN,
    * labels broadcast — then (2) a pointer jump component <-
    * component(component), O(log n) convergence on any diameter,
    * monotone-decrease changed-flag fixpoint probe, loud cap. `und`
    * must be a PINNED undirected `(a, b)` edge list; `nodes` the
    * vertex set. Checkpoints unconditionally — the loop invariant
    * Materialize.scala documents, NOT the conf switch.
    */
  private[operators] def ccPointerJump(und: DataFrame, nodes: DataFrame): DataFrame = {
    var lab = Materialize.trackedLocalCheckpoint(
      nodes.withColumn("component", col("node")))
    var converged = false
    var round = 0
    val maxRounds = 12 // log2-ish cap: 2^12 pointer depth, loud on overrun
    while (!converged && round < maxRounds) {
      // (1) neighbor-min hop: ONE edge-grain shuffle with map-side
      // partial MIN; labels broadcast (vertex-scale)
      val nbr = und
        .join(broadcast(lab.select(col("node").as("b"), col("component").as("nc"))), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("nc")).as("nc"))
      val hopped = lab.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nc"), col("component"))).as("c1"),
          (coalesce(col("nc"), col("component")) < col("component")).as("ch1"))
      // (2) pointer jump: c2(v) = c1(c1(v)) — labels are node ids,
      // so the lookup table is hopped itself, keyed by node
      val ptr = hopped.select(col("node").as("c1"), col("c1").as("jc"))
      val jumped = hopped.join(broadcast(ptr), Seq("c1"), "left")
        .select(col("node"),
          coalesce(col("jc"), col("c1")).as("component"),
          (col("ch1") || coalesce(col("jc"), col("c1")) < col("c1")).as("changed"))
      val next = Materialize.trackedLocalCheckpoint(jumped)
      converged = next.where(col("changed")).isEmpty
      lab = next.select(col("node"), col("component"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"pointer-jumping CC did not converge in $maxRounds rounds — " +
          "pathological pointer depth; raise the cap")
    lab
  }

  /** One gr09 round: neighbor-min hop + pointer jump with the label
    * table EQUI-JOINED under SHUFFLE_MERGE hints — no broadcast of any
    * label-derived table, by construction (hints bind both the static
    * planner and AQE's runtime join re-selection). `und` must be
    * `(a, b)` undirected edges partitioned on `b`; `lab` is
    * `(node, component)`. Output `(node, component, changed)` with the
    * same monotone-decrease semantics as gr08's inline round.
    * Package-visible so PlanAuditSpec can audit the round's physical
    * plan in isolation (inside gr09 each round hides behind the
    * fixpoint checkpoint).
    */
  private[graft] def ccShuffledRound(und: DataFrame, lab: DataFrame): DataFrame = {
    // (1) neighbor-min hop: labels shuffle to the edges' partitioning
    // (vertex-scale rows move; the edge list does not), then one
    // edge-grain map-side-combining MIN at vertex grain
    val nbr = und
      .join(lab.select(col("node").as("b"), col("component").as("nc")).hint("shuffle_merge"), "b")
      .groupBy(col("a").as("node"))
      .agg(min(col("nc")).as("nc"))
    val hopped = lab.join(nbr.hint("shuffle_merge"), Seq("node"), "left")
      .select(col("node"),
        least(col("component"), coalesce(col("nc"), col("component"))).as("c1"),
        (coalesce(col("nc"), col("component")) < col("component")).as("ch1"))
    // (2) pointer jump: c2(v) = c1(c1(v)) — a vertex-scale self
    // equi-join on the label key, no lookup table shipped anywhere
    val ptr = hopped.select(col("node").as("c1"), col("c1").as("jc"))
    hopped.join(ptr.hint("shuffle_merge"), Seq("c1"), "left")
      .select(col("node"),
        coalesce(col("jc"), col("c1")).as("component"),
        (col("ch1") || coalesce(col("jc"), col("c1")) < col("c1")).as("changed"))
  }

  /** gr09's full fixpoint, factored (r18) so the shuffled delta cores
    * ([[ccMergeAdds]]/[[ccDeleteScoped]] with shuffled=true) and gr09
    * itself run ONE loop definition: `und0` is the raw `(a, b)`
    * symmetric edge frame — partitioned on the hop-join key and
    * checkpointed here, so LogicalRDD preserves hashpartitioning(b)
    * and no round moves the edge list — then [[ccShuffledRound]] to
    * convergence under the same loud cap as [[ccPointerJump]]. Same
    * min-label answer as the broadcast loop (both converge to the
    * component minimum), different executed plan: zero broadcasts.
    */
  private[graft] def ccShuffledFixpoint(und0: DataFrame, nodes: DataFrame): DataFrame = {
    val und = Materialize.trackedLocalCheckpoint(und0.repartition(col("b")))
    var lab = Materialize.trackedLocalCheckpoint(
      nodes.withColumn("component", col("node")))
    var converged = false
    var round = 0
    val maxRounds = 12 // same log2-ish cap + loud-overrun contract as gr08
    while (!converged && round < maxRounds) {
      val next = Materialize.trackedLocalCheckpoint(ccShuffledRound(und, lab))
      converged = next.where(col("changed")).isEmpty
      lab = next.select(col("node"), col("component"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"pointer-jumping CC did not converge in $maxRounds rounds — " +
          "pathological pointer depth; raise the cap")
    lab
  }

  /** The shared gr04 SQL — Spark and DuckDB run the SAME text (view
    * prefix aside): recursive BFS over the sparsified trade graph,
    * anchor = nation 0, depth ≤ 3, outer MIN-dedup to min-hop.
    */
  private def reachSql(p: String) =
    s"""WITH RECURSIVE
       |support AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
       |  FROM ${p}lineitem l
       |  JOIN ${p}orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN ${p}customer c ON o.o_custkey = c.c_custkey
       |  JOIN ${p}supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |med AS (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY w) AS m FROM support),
       |edges AS (SELECT src, dst FROM support, med WHERE w > m),
       |reach(node, hop) AS (
       |  SELECT CAST(0 AS INT) AS node, CAST(0 AS INT) AS hop
       |  UNION ALL
       |  SELECT CAST(e.dst AS INT), CAST(r.hop + 1 AS INT)
       |  FROM reach r JOIN edges e ON e.src = r.node
       |  WHERE r.hop < 3)
       |SELECT node, CAST(MIN(hop) AS INT) AS min_hops
       |FROM reach GROUP BY node""".stripMargin
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents`/`embeddings` tables
  * (harness-mandated, SURVEY.md §2.3): exact, normalized-key, MinHash
  * LSH, SimHash, exact n-gram Jaccard, embedding-cosine near-dup.
  *
  * All hash-seeded operators derive their randomness from **md5**, which
  * both Spark and DuckDB implement identically — so every operator here
  * carries a full value-level DuckDB oracle (no rows-only checks).
  * Derived constants (minhash permutations, hyperplane signs) are
  * computed once in Scala and inlined as literals into BOTH the Spark
  * expression and the oracle SQL.
  *
  * Scale design (100 TB stance):
  *  - exact/normalized dedup is one hash-partitioned shuffle on the key
  *    (window row_number), no driver state;
  *  - every content hash is computed ONCE per shingle/token; the 32
  *    minhash permutations are derived by universal hashing
  *    `(a·h1 + b·h2 + c) mod p` — multiply-adds, not repeated digests;
  *  - MinHash/SimHash/embedding-LSH candidates meet in a band-key
  *    equi-join (never an O(n²) cross join), are deduped to distinct
  *    (a, b) pairs BEFORE scoring, and only then scored once;
  *  - the n-gram inverted index carries a document-frequency cap: a
  *    shingle occurring in > [[DfCap]] docs is dropped from the index
  *    (p docs → p² join rows — frequent shingles are a skew bomb at
  *    100 TB and carry no near-dup signal anyway);
  *  - the exact O(n²) cosine scan survives only as a test-only ground
  *    truth ([[exactEmbeddingPairs]]); the inventory entry is LSH
  *    candidates + exact rerank.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // see [[graft.Tables.spread]] — fan a single-file scan out to all
  // cores ahead of a CPU-heavy stage
  private def spread(df: DataFrame, key: String): DataFrame =
    Tables.spread(df, key)

  import Hashing.{P, perms}

  /** Max document frequency a shingle may have and still enter the
    * dd05 inverted index.
    */
  private[operators] val DfCap = 50

  /** dd13's gram width (tokens per positional fingerprint) and minimum
    * reportable shared-span length. k=8 makes a chance 8-token collision
    * over the fixture vocabulary astronomically unlikely (so every run
    * is a real shared substring), and 20 tokens is the span worth
    * cutting. Declared BEFORE `all` (object init order — a later val
    * interpolates as 0 into the oracle SQL), inlined into both sides.
    */
  private[operators] val SpanK = 8
  private[operators] val MinSpan = 20

  /** dd19's WITHIN-doc repeat resolution: a token n-gram this long
    * recurring inside ONE document marks its later occurrences as
    * repetition to scrub. 3, not SpanK: intra-doc repetition in real
    * corpora (and this fixture — probed: zero intra-doc runs exist at
    * 8-gram resolution at any scale, ~30-900 repeated trigram
    * occurrences do) lives at phrase scale, not passage scale; the
    * constant is the op's resolution knob, same declare-before-`all`
    * discipline as SpanK. */
  private[operators] val IntraK = 3

  // ---- oracle (DuckDB dialect) expression fragments ----
  // the Spark side runs the compiled graft_* expressions
  // (graft.functions); their SQL-dialect twins live in the specs that
  // pin bit-equivalence (MinHashSigSpec / TextHashesSpec)

  /** The same 32 permutations as a DuckDB struct-list literal. */
  private val permsDuck = perms.map { case (a, b, c) =>
    s"{a: $a, b: $b, c: $c}"
  }.mkString("[", ", ", "]")

  /** DuckDB twin of [[shingleExpr]] (parity established by dd05 r1);
    * shared with TextAnalysis (tx07 ranks the same trigram universe).
    */
  private[operators] val shingleDuck =
    """CASE WHEN LEN(w) >= 3 THEN
      |  LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |ELSE [] END""".stripMargin

  /** DuckDB twin of [[minhashSigs]] + [[bandCandidates]]: tokenize →
    * shingle → MinHash(32) signatures → 8×4 band keys → distinct
    * candidate pairs. ONE copy of the candidate-generator SQL, shared
    * by the dd03 oracle and the dd10 recall audit (the audit must
    * measure the shipped generator, not a paraphrase).
    */
  /** The signature half of [[minhashCandDuck]] (`d`..`sigs`) — factored
    * so dd20's banding sweep can hang THREE band blocks off one
    * signature chain, exactly as the Spark side reuses one pinned
    * [[minhashSigs]] table.
    */
  private lazy val minhashSigDuck: String =
    s"""d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id, $shingleDuck AS gs FROM d),
       |hp AS (SELECT doc_id, LIST_TRANSFORM(gs, s -> {
       |         h1: CAST(('0x' || substring(md5(s), 1, 7)) AS BIGINT),
       |         h2: CAST(('0x' || substring(md5(s), 8, 7)) AS BIGINT)}) AS hs
       |       FROM sh WHERE LEN(gs) > 0),
       |sigs AS (SELECT doc_id, LIST_TRANSFORM($permsDuck,
       |           t -> LIST_MIN(LIST_TRANSFORM(hs, h -> (t.a * h.h1 + t.b * h.h2 + t.c) % $P))) AS sig
       |         FROM hp)""".stripMargin

  /** One `(bands, rows)` band+candidate CTE block over `sigs` —
    * `bands$tag`/`cand$tag` so dd20 composes three configs in one
    * statement; (8, 4) with an empty tag IS dd03's shipped block.
    */
  private def bandBlockDuck(b: Int, r: Int, tag: String): String =
    s"""bands$tag AS (SELECT doc_id, bb.b AS band_idx,
       |                 ARRAY_TO_STRING(sig[bb.b*$r+1 : bb.b*$r+$r], ',') AS band_key
       |          FROM sigs, (SELECT UNNEST(RANGE(0, $b)) AS b) bb),
       |cand$tag AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands$tag a JOIN bands$tag b
       |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |          AND a.doc_id < b.doc_id)""".stripMargin

  private lazy val minhashCandDuck: String =
    s"""$minhashSigDuck,
       |${bandBlockDuck(8, 4, "")}""".stripMargin

  /** The (bands, rows) configs dd20 sweeps — tiles of the 32-wide
    * signature, the shipped (8, 4) in the middle. Declared BEFORE
    * `all` (object init order — strict vals referenced while `all`
    * initializes would read as null from later in the file).
    */
  private[operators] val BandConfigs: Seq[(Int, Int)] = Seq((4, 8), (8, 4), (16, 2))

  private val BandTags: Seq[(Int, Int, String)] =
    Seq((4, 8, "_a"), (8, 4, "_b"), (16, 2, "_c"))

  /** dd20's full oracle chain, factored so dd21 can hang the decision
    * rule + the chosen config's scored pairs off the SAME sweep text:
    * signatures, truth (+ its 1-row count, computed once — ADVICE
    * r16), the three band blocks, and the `sweep` counter table.
    */
  private lazy val bandingSweepDuck: String = {
    val rows = BandTags.map { case (b, r, t) =>
      s"""SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand$t) AS n_candidates,
         |       tv.n_true,
         |       (SELECT CAST(COUNT(*) AS BIGINT)
         |        FROM truth x JOIN cand$t c USING (doc_a, doc_b)) AS n_caught
         |FROM tv""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$minhashSigDuck,
       |$pairScoreDuck,
       |truth AS (SELECT doc_a, doc_b
       |          FROM p JOIN n na ON na.doc_id = p.doc_a
       |                 JOIN n nb ON nb.doc_id = p.doc_b
       |          WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8),
       |tv AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
       |${BandTags.map { case (b, r, t) => bandBlockDuck(b, r, t) }.mkString(",\n")},
       |sweep AS ($rows)""".stripMargin
  }

  /** THE near-dup edge pipeline for dd05 (word-trigram Jaccard ≥ 0.8
    * over the df-capped inverted index), emitting
    * `(doc_a, doc_b, jaccard)`; its SQL twin is dd05's oracle /
    * [[clusterCtes]].
    *
    * Deliberately NOT clone-collapsed (measured r7): dd05's OUTPUT is
    * every qualifying doc pair, so a clone family of m contributes m²
    * rows no matter how candidates are generated — collapse cannot
    * change the asymptote, and the df cap already bounds the naive
    * intra-family join at cap² rows per family (a family larger than
    * [[DfCap]] pushes every shingle's df over the cap and drops out
    * entirely), i.e. linear in corpus size with a ≤ cap² constant.
    * The collapsed formulation was built and benchmarked: +1.5 s fixed
    * (collapse shuffle + expansion machinery) at sf0.1 for identical
    * output and no asymptotic gain. The clustering queries, whose
    * ITERATIVE cost does depend on clone multiplicity, collapse
    * instead — see [[clusterAssignments]].
    */
  private[operators] def jaccardEdges(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "jacedges")(jaccardEdgesFresh(s, dir))

  /** The un-memoized build behind [[jaccardEdges]] — StageStoreSpec
    * pins store == fresh. Memoized r19: the scored pair table is a
    * STAGE OUTPUT consumed by five queries (dd05's own answer, the
    * dd10/dd20/dd21 truth side, dd22's edge universe) and re-derived
    * the df-capped index + self-join in each before the store.
    * Deterministic (md5 shingles, integer counts, one IEEE division).
    */
  private[operators] def jaccardEdgesFresh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sh = spread(docs(s, dir), "doc_id")
      .withColumn("gs", expr("graft_shingles(text)"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val (pairs, _) = invertedIndexJaccard(sh, "doc_id", lit(1L))
    pairs.select(col("ka").as("doc_a"), col("kb").as("doc_b"), col("jaccard"))
  }

  /** MinHash(32) signature table `(doc_id, sig)` for dd03/dd10. Pinned:
    * it feeds both band-join branches and both score joins, and
    * lambda-bearing subplans defeat exchange reuse, so an explicit
    * materialization computes it exactly once ([[Materialize]]; default
    * leaves no CacheManager entry). graft_shingles/graft_minhash_sig
    * are the compiled twins of the SQL-dialect formulations (specs pin
    * bit-equivalence).
    */
  private[operators] def minhashSigs(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "mhsigs")(minhashSigsFresh(s, dir))

  /** The un-memoized build behind [[minhashSigs]] — StageStoreSpec
    * pins store == fresh. Memoized r19: the 32-wide signature table
    * feeds dd03, the dd10 audit and both banding-sweep consumers
    * (dd20/dd21) — a persisted signature table is exactly what a
    * production LSH deployment maintains anyway.
    */
  private[graft] def minhashSigsFresh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    spread(docs(s, dir), "doc_id")
      .withColumn("gs", expr("graft_shingles(text)"))
      .filter(size(col("gs")) > 0)
      .withColumn("sig", expr("graft_minhash_sig(gs)"))
      .select("doc_id", "sig")
  }

  /** LSH band candidates (8 bands × 4 rows) over [[minhashSigs]]:
    * distinct `(doc_a < doc_b)` pairs that meet in ≥ 1 band-key bucket
    * — dd03's candidate generator, reused verbatim by the dd10 recall
    * audit. SQL twin: [[minhashCandDuck]].
    */
  private def bandCandidates(sigs: DataFrame): DataFrame =
    bandCandidatesBR(sigs, 8, 4)

  /** [[bandCandidates]] at an arbitrary `(bands, rows)` split of the
    * 32-wide signature (b*r = 32) — dd20's sweep turns the knob over
    * the SAME pinned signature table. SQL twin: [[bandBlockDuck]].
    */
  private def bandCandidatesBR(sigs: DataFrame, b: Int, r: Int): DataFrame = {
    require(b * r == 32, s"banding must tile the 32-wide signature (got $b x $r)")
    val bands = sigs.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${b - 1}),
           |  bb -> concat_ws(',', transform(slice(sig, bb*$r+1, $r), x -> CAST(x AS STRING))))""".stripMargin))
        .as(Seq("band_idx", "band_key")))
    bands.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** The inverted-index Jaccard machinery shared by the doc-level
    * ([[jaccardEdges]]) and group-level ([[groupJaccard]]) pipelines:
    * df-cap the shingles (`df = SUM(weight)` — 1 per doc row, clone
    * count per collapsed group, so both compute the same document
    * frequency), pin the capped index (it feeds three subplans: both
    * self-join sides + the size table; default localCheckpoint leaves
    * no CacheManager residue, see [[Materialize]]), equi-join on the
    * shingle with `ka < kb`, score each distinct pair once. Returns
    * (pairs `(ka, kb, jaccard ≥ 0.8)`, per-key surviving-shingle
    * counts `(key, n)`). One copy of the threshold / cap / join shape
    * keeps dd05 and dd07/dd08 on provably identical edge semantics.
    */
  private def invertedIndexJaccard(
      sh: DataFrame, key: String, weight: org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) = {
    val rare = sh.groupBy("g").agg(sum(weight).as("df"))
      .filter(col("df") <= DfCap).select("g")
    val er = Materialize(sh.join(rare, "g").select(col(key), col("g")))
    val n = er.groupBy(key).agg(count(lit(1)).as("n"))
    val pairs = er.select(col(key).as("ka"), col("g"))
      .join(er.select(col(key).as("kb"), col("g")), "g")
      .filter(col("ka") < col("kb"))
      .groupBy("ka", "kb").agg(count(lit(1)).as("shared"))
      .join(n.select(col(key).as("ka"), col("n").as("n_a")), "ka")
      .join(n.select(col(key).as("kb"), col("n").as("n_b")), "kb")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= 0.8)
      .select("ka", "kb", "jaccard")
    (pairs, n)
  }

  /** Clone collapse for the text CLUSTERING pipelines (r7 — the
    * dd06/dd09 embedding-side move applied to documents, per the
    * recipe deferred in SCALE.md r6): identical texts collapse to one
    * group keyed by `md5(text)` with `gid = MIN(doc_id)` and
    * `cnt` = clone count. The groupBy's map-side partial agg collapses
    * clones BEFORE the exchange, so the one wide shuffle carries each
    * DISTINCT text once; shingling, the df computation, the
    * inverted-index self-join and — the part that matters — every hop
    * of the min-label propagation loop run on distinct texts keyed by
    * long gids. Returns (groups pinned via [[Materialize]] — it feeds
    * both the shingle explode and the member map, doc→gid member map).
    */
  private def textGroups(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = spread(docs(s, dir), "doc_id").withColumn("fp", md5(col("text")))
    // `first(text)` is deterministic here: every text in an fp group is
    // byte-identical by construction
    val groups = Materialize(d
      .groupBy("fp")
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("cnt"),
        first(col("text")).as("text")))
    // the one digest-keyed join left — a map-side scan against the
    // pinned groups; everything downstream joins by long gid
    val mg = d.select(col("doc_id"), col("fp"))
      .join(groups.select("fp", "gid"), "fp")
      .select("doc_id", "gid")
    (groups, mg)
  }

  /** Group-level jaccard machinery over the collapsed groups: returns
    * (inter-group edges with jaccard ≥ 0.8, per-group surviving-shingle
    * counts `n`). `df = SUM(cnt)` is bit-identical to the naive per-doc
    * document frequency (each clone counts once); jaccard over the
    * surviving shingles of two distinct texts equals every member
    * pair's naive score (clones have identical shingle sets).
    */
  private def groupJaccard(groups: DataFrame): (DataFrame, DataFrame) = {
    val sh = groups.withColumn("gs", expr("graft_shingles(text)"))
      .select(col("gid"), col("cnt"), explode(col("gs")).as("g"))
    val (pairs, n) = invertedIndexJaccard(sh, "gid", col("cnt"))
    (pairs.select(col("ka").as("ga"), col("kb").as("gb"), col("jaccard")), n)
  }

  /** Doc-level near-dup cluster assignments via the collapsed GROUP
    * graph (dd07/dd08): the propagation loop's per-hop shuffle volume
    * is independent of clone multiplicity — the naive formulation
    * carried every clone family's m² intra-edges through EVERY hop
    * (loop cost × clone factor, the one place the df cap's ≤ cap²
    * bound still multiplies). Clone families (≥ 2 members with ≥ 1
    * shingle surviving the df cap — a fully-capped family has no index
    * entries and never pairs, matching the naive plan) enter as
    * self-edges so an isolated family still forms its cluster.
    * Component labels are min gids = min doc ids, so members re-enter
    * in one final map join, and dd05's doc-level edges produce the
    * SAME components: an inter-group edge stands for all-pairs between
    * the groups, a self-edge for the intra-family clique.
    */
  /** dd07's collapsed group-edge list + the doc->group map — shared by
    * the min-label loop (dd07/dd08) and the pointer-jumping twin (dd14).
    */
  private def groupEdges(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val (groups, mg) = textGroups(s, dir)
    val (inter, n) = groupJaccard(groups)
    val cloneGroups = groups.filter(col("cnt") >= 2)
      .join(n, Seq("gid"), "left_semi").select("gid")
    val gEdges = inter.select(col("ga").as("doc_a"), col("gb").as("doc_b"))
      .unionByName(cloneGroups
        .select(col("gid").as("doc_a"), col("gid").as("doc_b")))
    (gEdges, mg)
  }

  /** StageStore-memoized (VERDICT r18 #1): the df-capped pair pipeline
    * + CC fixpoint behind this frame is consumed by dd07, dd08, dd14's
    * parity pin, sp13 and four pl queries — before the store each
    * consumer re-ran the whole chain. Deterministic (md5 collapse, min
    * labels), so persist-then-read is bit-identical to a fresh build —
    * StageStoreSpec pins store == fresh.
    */
  private[operators] def clusterAssignments(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "ddclusters")(clusterAssignmentsFresh(s, dir))

  /** The un-memoized build behind [[clusterAssignments]] —
    * StageStoreSpec pins store == fresh.
    */
  private[operators] def clusterAssignmentsFresh(s: SparkSession, dir: String): DataFrame = {
    val (gEdges, mg) = groupEdges(s, dir)
    val gClusters = minLabelClusters(gEdges)
    mg.join(gClusters.select(col("doc_id").as("gid"), col("cluster")), "gid")
      .select(col("doc_id"), col("cluster"))
  }

  /** [[groupEdges]]' two frames as ONE StageStore build (r19 session 2,
    * guide §2.4): dd14 was the last groupEdges consumer still re-running
    * the df-capped pair pipeline + clone-collapse fresh per run —
    * `clusterAssignments` memoized the finished CHAIN for
    * dd07/dd08/sp13/pl*, but dd14's pointer-jump loop consumes the raw
    * EDGE LIST (its whole point is running a DIFFERENT fixpoint over the
    * same graph). Both frames are deterministic md5/integer artifacts;
    * StageStoreSpec pins store == fresh for each.
    */
  private[operators] def groupEdgesStored(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"stage_ddgedges_$tag", dir)
    DiskMemo.ensure(s"stage_ddgedges_$tag", out) {
      val (g, m) = groupEdges(s, dir)
      g.write.mode("overwrite").parquet(s"$out/g")
      m.write.mode("overwrite").parquet(s"$out/m")
    }
    (s.read.parquet(s"$out/g"), s.read.parquet(s"$out/m"))
  }

  // the un-memoized halves, exposed for StageStoreSpec's parity pins
  private[graft] def groupEdgesFreshG(s: SparkSession, dir: String): DataFrame =
    groupEdges(s, dir)._1
  private[graft] def groupEdgesFreshM(s: SparkSession, dir: String): DataFrame =
    groupEdges(s, dir)._2
  private[graft] def groupEdgesStoredG(s: SparkSession, dir: String): DataFrame =
    groupEdgesStored(s, dir)._1
  private[graft] def groupEdgesStoredM(s: SparkSession, dir: String): DataFrame =
    groupEdgesStored(s, dir)._2

  /** dd14: the same cluster assignment computed by gr09's
    * pointer-jumping round (O(log n) rounds on any chain length, no
    * vertex-scale broadcasts) instead of [[minLabelClusters]]'s plain
    * propagation (diameter rounds). Row-identical by construction —
    * DedupSpec pins it against dd07. Consumes the stored edge list
    * (r19 session 2): the pair pipeline builds once per (application,
    * dir); the loop this query exists to exercise still runs per serve.
    */
  private[operators] def ptrJumpAssignments(s: SparkSession, dir: String): DataFrame = {
    val (gEdges, mg) = groupEdgesStored(s, dir)
    val pinned = Materialize.trackedLocalCheckpoint(
      gEdges.select(col("doc_a"), col("doc_b")))
    // partitioned on the hop-join key before the checkpoint (gr09's
    // move): the LogicalRDD keeps hashpartitioning(b) across rounds
    val und = Materialize.trackedLocalCheckpoint(
      pinned.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(pinned.select(col("doc_b").as("a"), col("doc_a").as("b")))
        .distinct()
        .repartition(col("b")))
    var lab = Materialize.trackedLocalCheckpoint(
      und.select(col("a").as("node")).distinct()
        .withColumn("component", col("node")))
    var converged = false
    var round = 0
    val maxRounds = 12 // gr08/gr09's log2-ish cap + loud-overrun contract
    while (!converged && round < maxRounds) {
      val next = Materialize.trackedLocalCheckpoint(Graph.ccShuffledRound(und, lab))
      converged = next.where(col("changed")).isEmpty
      lab = next.select(col("node"), col("component"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"pointer-jumping clustering did not converge in $maxRounds rounds — " +
          "pathological pointer depth; raise the cap")
    mg.join(lab.select(col("node").as("gid"), col("component").as("cluster")), "gid")
      .select(col("doc_id"), col("cluster"))
  }

  /** DuckDB twin of [[jaccardEdges]] + transitive closure: the CTE body
    * shared by the dd07 and dd08 oracles (callers prepend
    * `WITH RECURSIVE` and append their final SELECT over `reach`).
    */
  /** DuckDB twin of [[invertedIndexJaccard]]'s df-capped inverted-index
    * pair scoring (`e`..`p`, referencing `sh`): ONE copy of the
    * cap/join shape shared by the dd05 oracle, the dd07/dd08
    * [[clusterCtes]], and the dd10 recall audit's truth side.
    */
  private[operators] lazy val pairScoreDuck: String =
    s"""e AS (SELECT doc_id, UNNEST(gs) AS g FROM sh),
       |rare AS (SELECT g FROM e GROUP BY g HAVING COUNT(*) <= $DfCap),
       |er AS (SELECT e.doc_id, e.g FROM e JOIN rare USING (g)),
       |n AS (SELECT doc_id, COUNT(*) AS n FROM er GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |      FROM er a JOIN er b ON a.g = b.g AND a.doc_id < b.doc_id
       |      GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** The dedup DELIVERABLE as a reusable id set: one keeper doc per
    * near-dup cluster (its min doc id) plus every unclustered doc —
    * dd08's keep-list without the per-keeper drop accounting, exposed
    * for downstream pipeline stages (pp01).
    */
  private[operators] def keeperIds(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "ddkeepers")(
      keeperIdsOf(s, dir, clusterAssignments(s, dir)))

  /** The un-memoized build behind [[keeperIds]] — derives from
    * [[clusterAssignmentsFresh]] so StageStoreSpec's parity pin
    * exercises the WHOLE fresh chain, not a read of the cluster store
    * (the store build itself reads the cluster store, so the expensive
    * pair+fixpoint chain runs once per (application, dir) total).
    */
  private[operators] def keeperIdsFresh(s: SparkSession, dir: String): DataFrame =
    keeperIdsOf(s, dir, clusterAssignmentsFresh(s, dir))

  private def keeperIdsOf(s: SparkSession, dir: String, clusters: DataFrame): DataFrame =
    docs(s, dir).select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("doc_id") === col("cluster"))
      .select("doc_id")

  /** DuckDB twin of [[keeperIds]] (a standalone subquery — its WITH
    * scope is self-contained so composers can nest it without CTE name
    * collisions).
    */
  private[operators] lazy val keeperIdsDuck: String =
    s"""(WITH RECURSIVE $clusterCtes,
       |clusters AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id)
       |SELECT dd.doc_id FROM documents dd
       |LEFT JOIN clusters c ON c.doc_id = dd.doc_id
       |WHERE c.doc_id IS NULL OR c.doc_id = c.cluster)""".stripMargin

  private[operators] lazy val clusterCtes: String =
    s"""d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id, $shingleDuck AS gs FROM d),
       |$pairScoreDuck,
       |edges AS (SELECT doc_a, doc_b FROM p
       |          JOIN n na ON na.doc_id = p.doc_a
       |          JOIN n nb ON nb.doc_id = p.doc_b
       |          WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8),
       |verts AS (SELECT doc_a AS doc_id FROM edges UNION SELECT doc_b FROM edges),
       |bi AS (SELECT doc_a AS a, doc_b AS b FROM edges
       |       UNION SELECT doc_b, doc_a FROM edges),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM verts
       |  UNION
       |  SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.doc_id)""".stripMargin

  /** Connected components over an undirected edge list (`doc_a`,
    * `doc_b`) via Pregel-style min-label propagation: each round every
    * vertex takes the min of its own and its neighbors' labels; at
    * fixpoint every component carries its minimum vertex id. One
    * shuffle per hop, `localCheckpoint` every TWO hops: each
    * `propagate` references the label table twice, so the LOGICAL plan
    * doubles per hop — `persist` alone flattens execution but not the
    * plan, and ~15 chained hops overflow the stack just stringifying
    * the tree (found by the 29-diameter chain spec). Checkpointing
    * truncates lineage, keeping every iteration's plan two hops deep;
    * the convergence probe is a scalar `count`, never a data collect.
    *
    * Hops needed ≈ component diameter. If `maxRounds` (a hop count,
    * overshot by at most one two-hop iteration) is hit before fixpoint
    * this THROWS rather than silently emitting labels that disagree
    * with the oracle's transitive closure — a >20-hop near-dup chain
    * is data telling you something (or a cap telling you to raise
    * it), never something to paper over.
    */
  def minLabelClusters(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    // materialize the edge pipeline ONCE here instead of asking callers
    // to persist: `bi` references `edges` twice and every propagation
    // round reads it again — off the checkpoint those are trivial
    // projections. Unconditionally localCheckpoint, NOT Materialize:
    // this is loop machinery like the per-hop label checkpoints (in
    // `none` mode every round would re-derive the whole edge pipeline,
    // making rounds quadratic; resilience is already bounded by the
    // per-hop checkpoints, so no mode offers more here)
    val pinned = Materialize.trackedLocalCheckpoint(
      edges.select(col("doc_a"), col("doc_b")))
    val bi = pinned.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(pinned.select(col("doc_b").as("a"), col("doc_a").as("b")))
    def propagate(l: DataFrame): DataFrame = {
      val viaNeighbor = bi
        .join(l.select(col("doc_id").as("a"), col("cluster")), "a")
        .groupBy(col("b").as("doc_id"))
        .agg(min(col("cluster")).as("n_cluster"))
      // labels only ever decrease, so "changed" ≡ a neighbor offered a
      // smaller label — carried INSIDE the checkpointed row, making the
      // convergence probe a trivial limit-1 scan of the checkpoint
      // instead of a join+aggregate against the previous round
      l.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster"))).as("cluster"),
          (coalesce(col("n_cluster"), col("cluster")) < col("cluster")).as("changed"))
    }
    var labels = Materialize.trackedLocalCheckpoint(
      bi.select(col("a").as("doc_id")).distinct()
        .withColumn("cluster", col("doc_id")))
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // TWO hops per checkpoint: each checkpoint is an eager action and
      // each convergence probe another — at small diameters that fixed
      // cost dominates the loop, so halving the checkpoint count buys
      // more than the deeper (still bounded: 2-hop) plan costs. The
      // probe stays sound: labels only decrease, so a hop that changed
      // NOTHING is a fixpoint no matter what the hop before it did —
      // checking only the second hop's `changed` flags at worst runs
      // one redundant hop, never stops early.
      val next = Materialize.trackedLocalCheckpoint(propagate(propagate(labels)))
      // superseded checkpoint blocks are reclaimed by the ContextCleaner
      // once `labels` is re-bound (localCheckpoint data isn't in the
      // CacheManager, so Dataset.unpersist would be a no-op here)
      labels = next
      converged = next.where(col("changed")).isEmpty
      round += 2
    }
    if (!converged)
      throw new IllegalStateException(
        s"min-label propagation did not converge in $maxRounds rounds — " +
          "component diameter exceeds the cap; raise maxRounds")
    labels.select(col("doc_id"), col("cluster"))
  }

  /** Test-only exact ground truth: all-pairs cosine ≥ threshold.
    * O(n²) by construction — never in the bench/verify inventory.
    */
  def exactEmbeddingPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val a = emb.select(col("vec_id").as("vec_a"), col("e").as("e_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("e").as("e_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", expr(
        """aggregate(zip_with(e_a, e_b, (x, y) -> x * y), 0D, (s, v) -> s + v)
          | / sqrt(aggregate(e_a, 0D, (s, x) -> s + x * x)
          |        * aggregate(e_b, 0D, (s, x) -> s + x * x))""".stripMargin))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  /** dd12's full DuckDB oracle, factored as a reusable block so the
    * incremental pipeline manifest (pl02) can consume the IDENTICAL
    * verdict semantics as a parenthesized subquery — the oracle-side
    * twin of [[incrementalVerdicts]] being the shared Spark core.
    */
  private[operators] val incrementalDuck: String =
    s"""WITH dall AS (SELECT doc_id, text,
              |               ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
              |inc AS (SELECT doc_id, text FROM dall WHERE bkt < 10),
              |corp AS (SELECT doc_id, text FROM dall WHERE bkt >= 10),
              |ex AS (SELECT i.doc_id, MIN(c.doc_id) AS m
              |       FROM inc i JOIN corp c ON md5(i.text) = md5(c.text) GROUP BY 1),
              |dcx AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM corp),
              |shcx AS (SELECT doc_id, $shingleDuck AS gs FROM dcx),
              |ecx AS (SELECT doc_id, UNNEST(gs) AS g FROM shcx),
              |rare AS (SELECT g FROM ecx GROUP BY g HAVING COUNT(*) <= $DfCap),
              |ec AS (SELECT e.doc_id, e.g FROM ecx e JOIN rare USING (g)),
              |dix AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM inc),
              |shix AS (SELECT doc_id, $shingleDuck AS gs FROM dix),
              |eix AS (SELECT doc_id, UNNEST(gs) AS g FROM shix),
              |ei AS (SELECT e.doc_id, e.g FROM eix e JOIN rare USING (g)),
              |nc AS (SELECT doc_id, COUNT(*) AS n FROM ec GROUP BY 1),
              |ni AS (SELECT doc_id, COUNT(*) AS n FROM ei GROUP BY 1),
              |p AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
              |      FROM ei i JOIN ec c ON i.g = c.g GROUP BY 1, 2),
              |near AS (SELECT p.di AS doc_id, MIN(p.dc) AS m
              |         FROM p JOIN ni ON ni.doc_id = p.di
              |                JOIN nc ON nc.doc_id = p.dc
              |         WHERE CAST(shared AS DOUBLE) / (ni.n + nc.n - shared) >= 0.8
              |         GROUP BY 1)
              |SELECT i.doc_id,
              |       CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
              |            WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
              |            ELSE 'new' END AS verdict,
              |       CAST(COALESCE(ex.m, nr.m) AS BIGINT) AS match_id
              |FROM inc i
              |LEFT JOIN ex ON ex.doc_id = i.doc_id
              |LEFT JOIN near nr ON nr.doc_id = i.doc_id""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "dd01_exact_dedup",
      Some("""SELECT doc_id, lang, source, n_copies FROM (
             |  SELECT doc_id, lang, source,
             |         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY text) AS n_copies
             |  FROM documents) t WHERE rn = 1""".stripMargin),
      "Exact dedup: keep lowest doc_id per identical text; one shuffle on the text key.") {
      (s, dir) =>
        val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
        docs(s, dir)
          .withColumn("rn", row_number().over(w))
          .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("text"))))
          .filter(col("rn") === 1)
          .select("doc_id", "lang", "source", "n_copies")
    },

    GraftQuery(
      "dd02_normalized_dedup",
      Some("""SELECT doc_id, fp, n_copies FROM (
             |  SELECT doc_id, MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS fp,
             |         ROW_NUMBER() OVER (PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) ORDER BY doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS n_copies
             |  FROM documents) t WHERE rn = 1""".stripMargin),
      "Normalized-key dedup: md5 fingerprint of lowercased whitespace-collapsed text — shuffles the 16-byte key, not the document.") {
      (s, dir) =>
        val fp = md5(lower(regexp_replace(col("text"), "\\s+", " ")))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        docs(s, dir)
          .withColumn("fp", fp)
          .withColumn("rn", row_number().over(w))
          .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("fp"))))
          .filter(col("rn") === 1)
          .select("doc_id", "fp", "n_copies")
    },

    GraftQuery(
      "dd03_minhash_lsh_pairs",
      Some(s"""WITH $minhashCandDuck
              |SELECT doc_a, doc_b,
              |       CAST(LEN(LIST_FILTER(RANGE(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 AS est_jaccard
              |FROM cand JOIN sigs sa ON sa.doc_id = cand.doc_a
              |          JOIN sigs sb ON sb.doc_id = cand.doc_b
              |WHERE CAST(LEN(LIST_FILTER(RANGE(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 >= 0.5""".stripMargin),
      "MinHash(32) + LSH banding (8 bands × 4 rows): one md5 per shingle, 32 universal-hash permutations; candidates meet in a band-key equi-join ([[bandCandidates]]), are deduped to distinct pairs, then scored once; est. Jaccard ≥ 0.5.") {
      (s, dir) =>
        val sigs = minhashSigs(s, dir)
        bandCandidates(sigs)
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
          .withColumn("est_jaccard",
            expr("CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS DOUBLE) / 32"))
          .filter(col("est_jaccard") >= 0.5)
          .select("doc_a", "doc_b", "est_jaccard")
    },

    GraftQuery(
      "dd04_simhash_pairs",
      Some("""WITH tk AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
             |h AS (SELECT doc_id,
             |        CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) AS h1,
             |        CAST(('0x' || substring(md5(w), 9, 8)) AS BIGINT) AS h2
             |      FROM tk),
             |bt AS (SELECT doc_id, bb.b AS b,
             |         SUM(CASE WHEN ((CASE WHEN bb.b < 32 THEN h1 >> bb.b
             |                              ELSE h2 >> (bb.b - 32) END) & 1) = 1
             |                  THEN 1 ELSE -1 END) AS s
             |       FROM h, (SELECT UNNEST(RANGE(0, 64)) AS b) bb
             |       GROUP BY doc_id, bb.b),
             |sh AS (SELECT doc_id,
             |         STRING_AGG(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
             |       FROM bt GROUP BY doc_id),
             |bands AS (SELECT doc_id, bb.b AS band_idx,
             |                 substring(simhash, bb.b*13 + 1, CASE WHEN bb.b = 4 THEN 12 ELSE 13 END) AS band_bits
             |          FROM sh, (SELECT UNNEST(RANGE(0, 5)) AS b) bb),
             |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |         FROM bands a JOIN bands b
             |           ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
             |          AND a.doc_id < b.doc_id)
             |SELECT doc_a, doc_b,
             |       CAST(LEN(LIST_FILTER(RANGE(1, 65), i -> sa.simhash[i] <> sb.simhash[i])) AS BIGINT) AS hamming
             |FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a
             |          JOIN sh sb ON sb.doc_id = cand.doc_b
             |WHERE CAST(LEN(LIST_FILTER(RANGE(1, 65), i -> sa.simhash[i] <> sb.simhash[i])) AS BIGINT) <= 4""".stripMargin),
      "SimHash(64-bit) near-dup: each token hashed ONCE (md5 → two 32-bit halves), 64 bit-sums ±1, sign-packed; 5-band (13/13/13/13/12-bit) join finds candidates (pigeonhole-complete for hamming ≤ 4); distinct pairs, then Hamming ≤ 4 confirms.") {
      (s, dir) =>
        // graft_simhash64 = compiled twin of the aggregate/zip_with SQL
        // formulation (TextHashesSpec pins bit-equivalence). The bit
        // string is ALSO packed into two longs once per doc, so the
        // per-pair rerank is two bit_count(xor) integer ops instead of
        // splitting 64-char strings into arrays per candidate — the
        // rerank is the hot loop when clone-heavy data inflates
        // candidates (ScaleProbe 10x), and it must cost nanoseconds.
        graft.functions.GraftFunctions.register(s)
        val sim = Materialize(spread(docs(s, dir), "doc_id")
          .withColumn("simhash", expr("graft_simhash64(split(text, ' '))"))
          .select("doc_id", "simhash"))
        // SIGNATURE COLLAPSE — the 100 TB move: real corpora are full of
        // exact duplicates, and every clone lands in the same band
        // buckets, making the candidate join quadratic in clone count.
        // Group to DISTINCT signatures first (band join cost becomes
        // independent of clone multiplicity), rerank signature pairs,
        // then expand back to doc pairs — the expansion is output-bound
        // by construction. ScaleProbe 10x (clone-heavy by design):
        // 46 s → ~2 s, identical output set. Each group is keyed by its
        // MIN doc_id so every post-collapse join runs on LONGs, never
        // the 64-char signature string (the dd06/ss05 lesson); the one
        // string-keyed join left is the sig→group map `ev`.
        val groups = Materialize(sim.groupBy("simhash")
          .agg(min(col("doc_id")).as("gid"))
          .withColumn("h1", expr("CAST(conv(substring(simhash, 1, 32), 2, 10) AS BIGINT)"))
          .withColumn("h2", expr("CAST(conv(substring(simhash, 33, 32), 2, 10) AS BIGINT)")))
        val bands = groups.select(col("gid"),
          posexplode(expr(
            "transform(sequence(0, 4), b -> substring(simhash, b*13 + 1, IF(b = 4, 12, 13)))"))
            .as(Seq("band_idx", "band_bits")))
        // <= keeps the diagonal: an identical-signature GROUP (clones)
        // still yields its intra-group doc pairs after expansion
        val sigPairs = bands.select(col("gid").as("gid_a"), col("band_idx"), col("band_bits"))
          .join(bands.select(col("gid").as("gid_b"), col("band_idx"), col("band_bits")),
            Seq("band_idx", "band_bits"))
          .filter(col("gid_a") <= col("gid_b"))
          .select("gid_a", "gid_b").distinct()
          .join(groups.select(col("gid").as("gid_a"),
            col("h1").as("ha1"), col("h2").as("ha2")), "gid_a")
          .join(groups.select(col("gid").as("gid_b"),
            col("h1").as("hb1"), col("h2").as("hb2")), "gid_b")
          .withColumn("hamming",
            expr("CAST(bit_count(ha1 ^ hb1) + bit_count(ha2 ^ hb2) AS BIGINT)"))
          .filter(col("hamming") <= 4)
          .select("gid_a", "gid_b", "hamming")
        // expand signature pairs to doc pairs; each unordered doc pair
        // maps to exactly one unordered signature pair, so ordering the
        // diagonal by doc id (and the rest by group id) emits each pair
        // exactly once — no distinct needed
        val ev = sim.join(groups.select("simhash", "gid"), "simhash")
          .select("doc_id", "gid")
        sigPairs
          .join(ev.select(col("gid").as("gid_a"), col("doc_id").as("da")), "gid_a")
          .join(ev.select(col("gid").as("gid_b"), col("doc_id").as("db")), "gid_b")
          .filter(col("gid_a") < col("gid_b") || col("da") < col("db"))
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    },

    GraftQuery(
      "dd05_ngram_jaccard_pairs",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
              |sh AS (SELECT doc_id, $shingleDuck AS gs FROM d),
              |$pairScoreDuck
              |SELECT doc_a, doc_b,
              |       CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
              |FROM p JOIN n na ON na.doc_id = p.doc_a
              |       JOIN n nb ON nb.doc_id = p.doc_b
              |WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8""".stripMargin),
      s"Exact word-trigram Jaccard ≥ 0.8 via inverted-index self-join, with a document-frequency cap (df ≤ $DfCap) on the index: frequent shingles are p²-join skew bombs at scale and carry no near-dup signal.") {
      (s, dir) => jaccardEdges(s, dir)
    },

    GraftQuery(
      "dd07_dedup_clusters",
      Some(s"""WITH RECURSIVE $clusterCtes
              |SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id""".stripMargin),
      "Near-dup CLUSTERS: connected components over the dd05 jaccard edges via Pregel-style min-label propagation, run on the clone-collapsed GROUP graph (r7) — the loop's input is independent of duplicate multiplicity; members re-enter in one final map join. Oracle is a recursive CTE over the naive doc-level edges.") {
      (s, dir) => clusterAssignments(s, dir)
    },

    GraftQuery(
      "dd08_dedup_keepers",
      Some(s"""WITH RECURSIVE $clusterCtes,
              |clusters AS (SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id),
              |sizes AS (SELECT cluster, COUNT(*) AS sz FROM clusters GROUP BY cluster)
              |SELECT dd.doc_id, CAST(COALESCE(s2.sz - 1, 0) AS BIGINT) AS n_dropped
              |FROM documents dd
              |LEFT JOIN clusters c ON c.doc_id = dd.doc_id
              |LEFT JOIN sizes s2 ON s2.cluster = c.cluster
              |WHERE c.doc_id IS NULL OR c.doc_id = c.cluster""".stripMargin),
      "The dedup DELIVERABLE: one keeper per near-dup cluster (its min doc id) plus every unclustered doc, with n_dropped = how many near-dups the keeper absorbed — the keep-list a training-data pipeline feeds downstream after dd05/dd07.") {
      (s, dir) =>
        val clusters = clusterAssignments(s, dir)
        val sizes = clusters.groupBy("cluster").agg(count(lit(1)).as("sz"))
        docs(s, dir).select("doc_id")
          .join(clusters, Seq("doc_id"), "left")
          .join(sizes, Seq("cluster"), "left")
          .filter(col("cluster").isNull || col("doc_id") === col("cluster"))
          .select(col("doc_id"),
            coalesce(col("sz") - 1, lit(0)).cast("long").as("n_dropped"))
    },

    GraftQuery(
      "dd06_embedding_neardup_lsh",
      Some(s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |pl AS (SELECT ${Hashing.planesDuck} AS planes),
              |sigs AS (SELECT vec_id, e, ${Hashing.embSigDuck} AS sig
              |         FROM emb, pl),
              |bands AS (SELECT vec_id, bb.b AS band_idx,
              |                 substring(sig, bb.b*4 + 1, 4) AS band_key
              |          FROM sigs, (SELECT UNNEST(RANGE(0, 8)) AS b) bb),
              |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              |         FROM bands a JOIN bands b
              |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |          AND a.vec_id < b.vec_id)
              |SELECT vec_a, vec_b,
              |       ROUND(LIST_COSINE_SIMILARITY(ea.e, eb.e), 4) AS sim
              |FROM cand JOIN emb ea ON ea.vec_id = cand.vec_a
              |          JOIN emb eb ON eb.vec_id = cand.vec_b
              |WHERE LIST_COSINE_SIMILARITY(ea.e, eb.e) >= 0.45""".stripMargin),
      "Embedding near-dup at scale: 32-bit Rademacher-hyperplane LSH (8 bands × 4 bits) generates candidate pairs in a band-key equi-join, exact cosine reranks, sim ≥ 0.45 confirms. The O(n²) exact scan survives only as the test-only ground truth (exactEmbeddingPairs).") {
      (s, dir) => embeddingNearDupPairs(s, dir)
    },

    GraftQuery(
      "dd09_semantic_clusters",
      Some(s"""WITH RECURSIVE emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |pl AS (SELECT ${Hashing.planesDuck} AS planes),
              |sigs AS (SELECT vec_id, e, ${Hashing.embSigDuck} AS sig
              |         FROM emb, pl),
              |bands AS (SELECT vec_id, bb.b AS band_idx,
              |                 substring(sig, bb.b*4 + 1, 4) AS band_key
              |          FROM sigs, (SELECT UNNEST(RANGE(0, 8)) AS b) bb),
              |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              |         FROM bands a JOIN bands b
              |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              |          AND a.vec_id < b.vec_id),
              |edges AS (SELECT vec_a, vec_b
              |          FROM cand JOIN emb ea ON ea.vec_id = cand.vec_a
              |                    JOIN emb eb ON eb.vec_id = cand.vec_b
              |          WHERE LIST_COSINE_SIMILARITY(ea.e, eb.e) >= 0.45),
              |verts AS (SELECT vec_a AS v FROM edges UNION SELECT vec_b FROM edges),
              |bi AS (SELECT vec_a AS a, vec_b AS b FROM edges
              |       UNION SELECT vec_b, vec_a FROM edges),
              |reach(v, r) AS (
              |  SELECT v, v FROM verts
              |  UNION
              |  SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.v)
              |SELECT v AS vec_id, MIN(r) AS cluster FROM reach GROUP BY v""".stripMargin),
      "SemDeDup-style SEMANTIC clusters: connected components over the dd06 embedding near-dup pairs — groups of vectors whose members are mutually reachable through cosine ≥ 0.45 edges, the keep-one-per-cluster unit for semantic dedup of training corpora. The propagation loop runs on the clone-collapsed GROUP graph (self-edge per clone group, distinct cross-group edges), so its edge table is clone-independent; vectors re-enter only in the final map-side expansion.") {
      (s, dir) => semanticClusters(s, dir)
    },

    GraftQuery(
      "dd10_lsh_recall",
      Some(s"""WITH $minhashCandDuck,
              |$pairScoreDuck,
              |truth AS (SELECT doc_a, doc_b,
              |                 CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
              |          FROM p JOIN n na ON na.doc_id = p.doc_a
              |                 JOIN n nb ON nb.doc_id = p.doc_b
              |          WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8)
              |SELECT CAST(FLOOR(t.jaccard * 10) AS INT) AS jband,
              |       COUNT(*) AS n_true,
              |       CAST(SUM(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_caught,
              |       CAST(CAST(SUM(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS DOUBLE)
              |         / COUNT(*) AS recall
              |FROM truth t LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
              |GROUP BY 1""".stripMargin),
      "LSH recall audit — the retrieval-QUALITY gate for the dedup family (ss11's discipline applied to near-dup candidate generation): ground truth is dd05's exact df-capped trigram-Jaccard pairs at >= 0.8, left-joined against dd03's SHIPPED band-candidate generator ([[bandCandidates]] / the same [[minhashCandDuck]] SQL — the audit measures the production pipeline, not a paraphrase), bucketed by Jaccard decile. Banding theory says a j=0.8 pair meets in >= 1 of 8 4-row bands w.p. 1-(1-j^4)^8 ~ 0.985, rising toward 1 as j -> 1 — the per-decile (n_true, n_caught, recall) row is the empirical check, and a sagging low decile is the signal to re-tune (bands, rows). At 100 TB the exact truth side is priced on a SAMPLED corpus slice (it is quadratic-guarded but still the audit's dominant cost); the candidate side is the production path unchanged. Counts are exact integers; recall is one shared IEEE division — bit-identical cross-engine.") {
      (s, dir) =>
        val truth = jaccardEdges(s, dir)
        val cand = bandCandidates(minhashSigs(s, dir)).withColumn("h", lit(1))
        truth.join(cand, Seq("doc_a", "doc_b"), "left")
          .groupBy(floor(col("jaccard") * 10).cast("int").as("jband"))
          .agg(
            count(lit(1)).as("n_true"),
            sum(when(col("h").isNull, 0).otherwise(1)).as("n_caught"))
          .withColumn("recall", col("n_caught").cast("double") / col("n_true"))
    },

    GraftQuery(
      "dd11_chunk_dedup",
      Some("""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
             |                 LEN(STRING_SPLIT(text, ' ')) AS n FROM documents),
             |s AS (SELECT doc_id, w, UNNEST(RANGE(0, GREATEST(n, 1), 40)) AS start FROM d),
             |ch AS (SELECT DISTINCT doc_id,
             |              MD5(ARRAY_TO_STRING(w[start + 1 : start + 50], ' ')) AS fp
             |       FROM s),
             |cnt AS (SELECT fp, COUNT(*) AS nd FROM ch GROUP BY fp)
             |SELECT doc_id, COUNT(*) AS n_chunks,
             |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             |         AS shared_frac
             |FROM ch JOIN cnt USING (fp)
             |GROUP BY doc_id""".stripMargin),
      "Chunk-granularity exact dedup audit — the boilerplate-span detector BETWEEN dd01 (whole-doc exact) and dd03/dd05 (whole-doc fuzzy): tx08's 50-token/stride-40 windows are fingerprinted (md5 — 16 bytes cross the wire, never chunk text) and a chunk is 'shared' when its fingerprint occurs in >= 2 distinct docs; the per-doc shared fraction is the repeated-template signal (headers, license blocks, navboxes) that whole-document passes structurally miss. Chunking and fingerprinting are map-side; the (doc, fp) distinct and the fp-count aggregation each combine map-side before their one keyed shuffle; the count-lookup join is fp-keyed at fingerprint cardinality. The scale note from tx11 applies: at 100 TB the frequent head ('every page has this footer') is THE skew bomb — split hot fingerprints to a broadcast join exactly as tx11's LmHeadDf does. Counts are exact integers; the fraction is one shared IEEE division — hash-identical cross-engine.") {
      (s, dir) =>
        val ch = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("n", size(col("w")))
          .select(col("doc_id"), col("w"),
            explode(expr("sequence(0, greatest(n - 1, 0), 40)")).as("start"))
          .select(col("doc_id"),
            md5(concat_ws(" ", expr("slice(w, start + 1, 50)"))).as("fp"))
          .distinct()
        val cnt = ch.groupBy("fp").agg(count(lit(1)).as("nd"))
        ch.join(cnt, Seq("fp"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("nd") >= 2, 1).otherwise(0)).cast("long").as("n_shared"))
          .withColumn("shared_frac",
            col("n_shared").cast("double") / col("n_chunks"))
    },

    GraftQuery(
      "dd12_incremental_dedup",
      Some(incrementalDuck),
      "Incremental ingestion dedup — the form every dd-family pass takes in PRODUCTION: a new crawl drop (10% md5 split) is admitted against the EXISTING corpus, not against itself. Per incoming doc, one verdict with audit provenance: exact_dup (byte-identical text already in the corpus — md5 fingerprint equi-join, 16 bytes per doc cross the wire), near_dup (word-trigram Jaccard >= 0.8 against a corpus doc over the df-capped inverted index — dd05's threshold / cap / join shape applied CROSS-SPLIT, similarity measured in the corpus index's rare-shingle vocabulary), or new; match_id = the smallest matching corpus doc (deterministic), null for new. The at-scale asymmetry is the whole point: the corpus fingerprint store and inverted index are the PERSISTED artifacts (built once, incrementally maintained — Compaction's snapshot discipline), and each drop probes them at drop-size cost: the incoming side of every join is drop-sized, the df cap bounds each incoming shingle's fan-out at 50 corpus postings, and nothing ever re-pairs corpus-vs-corpus (the m² the batch passes pay). Priority exact > near is a CASE after two LEFT probes; every count is an exact integer, the Jaccard division is the dd05 IEEE division — hash-identical cross-engine.") {
      (s, dir) => stdIncrementalVerdicts(s, dir)
    },

    GraftQuery(
      "dd13_duplicate_spans",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents),
              |g AS (SELECT doc_id, i AS pos, HASH(ARRAY_TO_STRING(a[i : i + ${SpanK - 1}], ' ')) AS g
              |      FROM d, UNNEST(RANGE(1, GREATEST(LEN(a) - ${SpanK - 2}, 1))) AS t(i)
              |      WHERE LEN(a) >= $SpanK),
              |rare AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) <= $DfCap),
              |r AS (SELECT x.doc_id, x.pos, x.g FROM g x JOIN rare USING (g)),
              |p AS (SELECT x.doc_id AS da, y.doc_id AS db, x.pos AS pa, x.pos - y.pos AS off
              |      FROM r x JOIN r y ON x.g = y.g AND x.doc_id < y.doc_id),
              |i AS (SELECT da, db, off, pa,
              |             pa - ROW_NUMBER() OVER (PARTITION BY da, db, off ORDER BY pa) AS isle
              |      FROM p),
              |runs AS (SELECT da, db, COUNT(*) + ${SpanK - 1} AS span
              |         FROM i GROUP BY da, db, off, isle)
              |SELECT da AS doc_a, db AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_spans,
              |       CAST(MAX(span) AS BIGINT) AS max_span,
              |       CAST(SUM(span) AS BIGINT) AS dup_tokens
              |FROM runs WHERE span >= $MinSpan GROUP BY 1, 2""".stripMargin),
      s"Substring-level duplicate-SPAN detection — the token-exact span dedup of Lee et al.'s 'Deduplicating Training Data Makes Language Models Better' (the ExactSubstr pass), re-expressed for a shuffle engine: instead of a distributed suffix array, every token position emits an $SpanK-gram fingerprint (ONE xxhash64 — 8 bytes cross the wire, never gram text), positions sharing a fingerprint meet in a df-capped equi-join, and a maximal shared span is recovered as a RUN of consecutive matching positions at constant pair offset — the classic gaps-and-islands window (pos - row_number is constant within a run), so a run of m matched $SpanK-gram positions certifies a shared span of m+${SpanK - 1} tokens. Sits between dd11 (fixed 50-token chunks at stride 40 — misses spans straddling chunk edges and anything under a chunk) and dd03/dd05 (whole-doc fuzzy): this finds EVERY maximal cross-doc span >= $MinSpan tokens at token resolution, the signal you need to cut injected boilerplate out of the MIDDLE of otherwise-distinct pages. Per pair: span count, longest span, total duplicated tokens (offset-grain accounting: two runs at different offsets may overlap in text — the conservative upper bound; interval-merge is the downstream refinement). Scale: the positional index is token-count-sized (the honest price of token resolution — 100 TB of text is ~2e13 positions, so you SHARD this by corpus partition exactly like dd12's incremental probe), the df cap bounds every fingerprint's fan-out at $DfCap postings killing the hot-boilerplate skew bomb, the island window shuffles at matched-pair grain (tiny after the cap), and all outputs are exact integers — bit-identical cross-engine.") {
      (s, dir) =>
        spanRuns(s, dir)
          .groupBy(col("da").as("doc_a"), col("db").as("doc_b"))
          .agg(count(lit(1)).as("n_spans"),
            max(col("span")).as("max_span"),
            sum(col("span")).as("dup_tokens"))
    },

    GraftQuery(
      "dd14_clusters_ptrjump",
      // dd07's definition-level oracle verbatim: same closure over the
      // same jaccard edges — only the propagation strategy differs
      Some(s"""WITH RECURSIVE $clusterCtes
              |SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id""".stripMargin),
      "dd07's near-dup clusters computed by POINTER JUMPING instead of plain min-label propagation — the gr09 machinery applied to the graph it was built for (gr08's doc promised 'the loop that groups near-dup documents at corpus scale'; this wires it): component <- component(component) per round makes convergence O(log n) rounds on ANY clone-chain length, where dd07's per-hop propagation needs diameter rounds — and near-dup graphs at corpus scale DO grow long chains (A~B~C~... through drifting boilerplate), which turns diameter into the wall-clock axis. Runs on the same clone-collapsed group graph (the loop never sees per-duplicate rows), labels hash-partitioned and equi-joined under shuffle_merge hints — NOTHING vertex-scale broadcasts, so the plan holds when the group count outgrows executor memory. Same oracle as dd07 (the recursive-CTE transitive closure), DedupSpec pins dd14 == dd07 row-for-row: two loops, two round complexities, one fixpoint.") {
      (s, dir) => ptrJumpAssignments(s, dir)
    },

    GraftQuery(
      "dd15_bloom_incremental",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w,
              |                 LEN(STRING_SPLIT(text, ' ')) AS n,
              |                 ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
              |s AS (SELECT doc_id, bkt, w, UNNEST(RANGE(0, GREATEST(n, 1), 40)) AS start FROM d),
              |ch AS (SELECT DISTINCT doc_id, bkt,
              |              MD5(ARRAY_TO_STRING(w[start + 1 : start + 50], ' ')) AS fp
              |       FROM s),
              |inc AS (SELECT doc_id, fp FROM ch WHERE bkt < 10),
              |corp AS (SELECT DISTINCT fp FROM ch WHERE bkt >= 10),
              |k AS (SELECT doc_id, COUNT(*) AS nk FROM inc
              |      WHERE fp IN (SELECT fp FROM corp) GROUP BY 1)
              |SELECT i.doc_id, COUNT(*) AS n_chunks,
              |       CAST(COALESCE(MAX(k.nk), 0) AS BIGINT) AS n_known,
              |       CAST(COALESCE(MAX(k.nk), 0) AS DOUBLE) / COUNT(*) AS known_frac
              |FROM inc i LEFT JOIN k ON k.doc_id = i.doc_id
              |GROUP BY 1""".stripMargin),
      "Incremental CHUNK-level dedup with sk01's RUNTIME-FILTER move — the third asymmetry in the incremental family (dd12 made every join probe drop-sized; this makes the drop-side SHUFFLE dup-sized): an incoming crawl drop's 50-token/stride-40 chunk fingerprints (dd11's grain — the one where cross-drop repetition actually lives: shared boilerplate, license blocks, templates; whole-doc fingerprints almost never repeat across drops) are checked against the EXISTING corpus's chunk-fingerprint store. Before any chunk shuffles toward the confirm join, a bloom sketch over the corpus fingerprints (in production: maintained incrementally next to the store itself, KB-to-MB at any corpus size) rides a scalar subquery into the incoming scan as a might_contain FILTER — measured on this fixture the prefilter passes ~7% of incoming chunks (6/83 true matches at sf0.01 plus FP noise), so the exchange carries the duplicated sliver, not the drop. A bloom false positive costs one extra row through the exact fingerprint semi join, which removes it: the answer is EXACT and the oracle is the plain IN-subquery membership (sk01's contract — sketch for pruning, never for truth). Output per incoming doc: total chunks, corpus-known chunks (zero rows kept — the tx12 nothing-vanishes contract), and the known fraction (one IEEE division) — the per-doc contamination signal that decides quarantine-vs-admit at ingestion time. PlanAuditSpec pins the bloom reaches the incoming side as a filter ahead of the join.") {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        // both splits are referenced TWICE downstream (corp: bloom build
        // + confirm join; inc: candidates + per-doc totals) and Spark
        // inlines non-materialized CTEs — pin each once so the chunking
        // pass never re-runs (in production these ARE the persisted
        // fingerprint store and the drop's staged chunks)
        val chunks = spread(docs(s, dir), "doc_id")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .withColumn("n", size(col("w")))
          .select(col("doc_id"), col("w"),
            explode(expr("sequence(0, greatest(n - 1, 0), 40)")).as("start"))
          .select(col("doc_id"),
            md5(concat_ws(" ", expr("slice(w, start + 1, 50)"))).as("fp"))
          .distinct()
          .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
        // dd15-prefixed view names: never clobber caller-owned temp
        // views in the shared session (the sk01 rule)
        Materialize(chunks.filter(col("bkt") < 10).select("doc_id", "fp"))
          .createOrReplaceTempView("dd15_inc")
        Materialize(chunks.filter(col("bkt") >= 10).select("fp").distinct())
          .createOrReplaceTempView("dd15_corp")
        s.sql(
          s"""WITH cand AS (SELECT doc_id, fp FROM dd15_inc
             |         WHERE graft_might_contain(
             |                 (SELECT graft_bloom_agg(xxhash64(fp), 200000L, 2000000L)
             |                  FROM dd15_corp),
             |                 xxhash64(fp))),
             |k AS (SELECT c.doc_id, COUNT(*) AS nk
             |      FROM cand c LEFT SEMI JOIN dd15_corp ON c.fp = dd15_corp.fp
             |      GROUP BY c.doc_id)
             |SELECT i.doc_id, COUNT(*) AS n_chunks,
             |       COALESCE(MAX(k.nk), 0L) AS n_known,
             |       CAST(COALESCE(MAX(k.nk), 0L) AS DOUBLE) / COUNT(*) AS known_frac
             |FROM dd15_inc i LEFT JOIN k ON k.doc_id = i.doc_id
             |GROUP BY i.doc_id""".stripMargin)
    },

    GraftQuery(
      "dd16_fuzzy_linkage",
      Some(s"""WITH d AS (SELECT doc_id,
              |             ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:4], ' ') AS name,
              |             ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
              |reg AS (SELECT doc_id, name FROM d WHERE LENGTH(name) >= 8),
              |dirty AS (SELECT doc_id,
              |            2 + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 2)) AS INT)
              |                % (LENGTH(name) - 2) AS pos,
              |            name
              |          FROM d WHERE bkt < 10 AND LENGTH(name) >= 8),
              |c AS (SELECT doc_id, substring(name, 1, pos - 1) || substring(name, pos + 1)
              |        AS corrupted FROM dirty)
              |SELECT c.doc_id AS dirty_id, r.doc_id AS match_id,
              |       CAST(levenshtein(c.corrupted, r.name) AS INT) AS dist
              |FROM c JOIN reg r
              |  ON lower(substring(c.corrupted, 1, 1)) = lower(substring(r.name, 1, 1))
              |WHERE levenshtein(c.corrupted, r.name) <= 1""".stripMargin),
      "Fuzzy RECORD LINKAGE (entity resolution) — the approximate-STRING-matching axis the dedup family lacked (dd03-dd15 are all set/shingle/vector similarity; 'is this typo'd record the same entity as a registry row' is edit distance, a different animal): blocking + within-block Levenshtein, the Fellegi-Sunter blocking architecture every production ER system runs. Ground truth is INJECTED deterministically (tx16's discipline — the fixture has no typos, so the operator manufactures them verifiably): each incoming doc's 4-token entity name gets one character deleted at an md5-derived position, and linkage must recover the original registry row. The scale mechanics are the point: edit distance is O(len²) per PAIR and utterly unindexable by equi-join, so candidate generation is a BLOCKING equi-join (first-character block here; production composes several redundant blocking keys) that bounds the pairs — the dirty side is drop-sized, the registry side shuffles once on the block key, and Levenshtein runs only inside blocks (never all-pairs). Matches at distance <= 1 keep ALL candidates (the adjudication layer above ER sees ties — collapsing them here would hide false positives; DedupSpec pins 100% self-recovery AND that the near-miss extras exist). Both engines implement levenshtein identically on exact integers — full value oracle.") {
      (s, dir) =>
        val d = spread(docs(s, dir), "doc_id").select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("name"))
          .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
        val reg = d.filter(length(col("name")) >= 8).select("doc_id", "name")
        val dirty = d.filter(col("bkt") < 10 && length(col("name")) >= 8)
          .withColumn("pos", expr(
            "2 + CAST(conv(substring(md5(CAST(doc_id AS STRING)), 9, 2), 16, 10) AS INT) % (length(name) - 2)"))
          .select(col("doc_id").as("dirty_id"),
            expr("concat(substring(name, 1, pos - 1), substring(name, pos + 1, length(name)))")
              .as("corrupted"))
        dirty.join(reg.withColumnRenamed("doc_id", "match_id"),
            lower(expr("substring(corrupted, 1, 1)")) === lower(expr("substring(name, 1, 1)")))
          .filter(expr("levenshtein(corrupted, name) <= 1"))
          .select(col("dirty_id"), col("match_id"),
            expr("CAST(levenshtein(corrupted, name) AS INT)").as("dist"))
    },

    GraftQuery(
      "dd17_multikey_linkage",
      Some(s"""WITH d AS (SELECT doc_id,
              |             ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:4], ' ') AS name,
              |             ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
              |reg AS (SELECT doc_id, name FROM d WHERE LENGTH(name) >= 8),
              |dirty AS (SELECT doc_id,
              |            1 + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 2)) AS INT)
              |                % LENGTH(name) AS pos,
              |            name
              |          FROM d WHERE bkt < 10 AND LENGTH(name) >= 8),
              |c AS (SELECT doc_id, substring(name, 1, pos - 1) || substring(name, pos + 1)
              |        AS corrupted FROM dirty),
              |cand AS (
              |  SELECT c.doc_id AS dirty_id, r.doc_id AS match_id, c.corrupted, r.name
              |  FROM c JOIN reg r
              |    ON lower(substring(c.corrupted, 1, 1)) = lower(substring(r.name, 1, 1))
              |  UNION
              |  SELECT c.doc_id, r.doc_id, c.corrupted, r.name
              |  FROM c JOIN reg r
              |    ON lower(substring(c.corrupted, LENGTH(c.corrupted), 1))
              |     = lower(substring(r.name, LENGTH(r.name), 1)))
              |SELECT dirty_id, match_id,
              |       CAST(levenshtein(corrupted, name) AS INT) AS dist
              |FROM cand WHERE levenshtein(corrupted, name) <= 1""".stripMargin),
      "MULTI-KEY blocking record linkage — the honesty upgrade on dd16 (VERDICT r12 #6): dd16 deletes only at positions >= 2, so its single first-character blocking key can never break and the 100% recall it pins is true by construction. Here the injected deletion lands at ANY md5-derived position INCLUDING 1 (first char gone) and the final one (last char gone) — each single blocking key now has a blind spot, and recall comes from the Fellegi-Sunter move the dd16 doc could only name: REDUNDANT blocking keys, unioned. Two equi-join passes (first-character block, last-character block) each bound pairs at block granularity — never all-pairs, never a theta join; UNION-distinct merges the candidate sets (a middle-position deletion reaches the pair through both keys and must score once); a single character deletion cannot touch both ends at once, so the two keys COVER every injection point — the coverage argument is structural, not probabilistic, and DedupSpec pins 100% recovery with position-1 and final-position deletions both non-vacuously present in the fixture. Levenshtein still runs only inside blocks; the automatic BNLJ/cartesian sweep audits the plan (dd17 is NOT on the allowlist). Both engines' identical integer levenshtein keeps the full value oracle.") {
      (s, dir) =>
        val d = spread(docs(s, dir), "doc_id").select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("name"))
          .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
        val reg = d.filter(length(col("name")) >= 8)
          .select(col("doc_id").as("match_id"), col("name"))
        // VALUE COLLAPSE (dd05/dd06's discipline): registry clones share
        // their name, so blocking + Levenshtein run against DISTINCT
        // names — scoring cost is clone-independent — and matches expand
        // to the clone ids by one equi-join at the end (ScaleProbe 10x:
        // the expanded formulation scored every (dirty, clone) pair and
        // ran 15x; this is linear)
        val regNames = reg.select("name").distinct()
        val dirty = d.filter(col("bkt") < 10 && length(col("name")) >= 8)
          .withColumn("pos", expr(
            "1 + CAST(conv(substring(md5(CAST(doc_id AS STRING)), 9, 2), 16, 10) AS INT) % length(name)"))
          .select(col("doc_id").as("dirty_id"),
            expr("concat(substring(name, 1, pos - 1), substring(name, pos + 1, length(name)))")
              .as("corrupted"))
        val byFirst = dirty.join(regNames,
          lower(expr("substring(corrupted, 1, 1)")) === lower(expr("substring(name, 1, 1)")))
        val byLast = dirty.join(regNames,
          lower(expr("substring(corrupted, length(corrupted), 1)"))
            === lower(expr("substring(name, length(name), 1)")))
        byFirst.unionByName(byLast).distinct()
          .filter(expr("levenshtein(corrupted, name) <= 1"))
          .withColumn("dist", expr("CAST(levenshtein(corrupted, name) AS INT)"))
          .join(reg, "name") // expand distinct-name matches to clone ids
          .select(col("dirty_id"), col("match_id"), col("dist"))
    },

    GraftQuery(
      "dd18_span_removal",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents),
              |g AS (SELECT doc_id, i AS pos, HASH(ARRAY_TO_STRING(a[i : i + ${SpanK - 1}], ' ')) AS g
              |      FROM d, UNNEST(RANGE(1, GREATEST(LEN(a) - ${SpanK - 2}, 1))) AS t(i)
              |      WHERE LEN(a) >= $SpanK),
              |rare AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) <= $DfCap),
              |r AS (SELECT x.doc_id, x.pos, x.g FROM g x JOIN rare USING (g)),
              |p AS (SELECT x.doc_id AS da, y.doc_id AS db, x.pos AS pa, x.pos - y.pos AS off
              |      FROM r x JOIN r y ON x.g = y.g AND x.doc_id < y.doc_id),
              |i AS (SELECT da, db, off, pa,
              |             pa - ROW_NUMBER() OVER (PARTITION BY da, db, off ORDER BY pa) AS isle
              |      FROM p),
              |runs AS (SELECT da, db, off, MIN(pa) AS pa0, COUNT(*) + ${SpanK - 1} AS span
              |         FROM i GROUP BY da, db, off, isle),
              |iv AS (SELECT db AS doc_id, pa0 - off AS s, pa0 - off + span - 1 AS e
              |       FROM runs WHERE span >= $MinSpan),
              |dr AS (SELECT DISTINCT doc_id, pos FROM
              |       (SELECT doc_id, UNNEST(RANGE(s, e + 1)) AS pos FROM iv) u),
              |toks AS (SELECT doc_id, i AS pos, a[i] AS tok
              |         FROM d, UNNEST(RANGE(1, LEN(a) + 1)) AS t(i)),
              |o AS (SELECT t.doc_id, t.pos, t.tok, dr.pos IS NOT NULL AS dropped
              |      FROM toks t
              |      JOIN (SELECT DISTINCT doc_id FROM dr) af USING (doc_id)
              |      LEFT JOIN dr ON dr.doc_id = t.doc_id AND dr.pos = t.pos)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
              |       COALESCE(STRING_AGG(CASE WHEN NOT dropped THEN tok END, ' '
              |                           ORDER BY pos), '') AS cleaned
              |FROM o GROUP BY 1""".stripMargin),
      s"Duplicate-span REMOVAL — the corpus REWRITE dd13's doc promised as 'the downstream refinement': dd13 certifies every maximal cross-doc shared span >= $MinSpan tokens but only PRICES the duplication (its offset-grain token accounting may double-count overlapping runs); this pass actually CUTS it, Lee et al.'s ExactSubstr dedup completed as a transformation. Retention is canonical min-id (the dd08/dd12 discipline): each certified span survives in the pair's LOWER doc_id and is cut from the higher, so chained copies A<B<C collapse to A's single copy deterministically. The cut set is the POSITION-GRAIN UNION of all span intervals landing on a doc — distinct (doc_id, pos) IS the interval merge at token resolution, so overlapping spans from different partners (and different-offset runs over the same text, dd13's stated double-count) cost each token exactly once; n_removed is the exact deduplicated-token count dd13 could only upper-bound. Rewrite = posexplode to (doc_id, pos, token), left-semi to affected docs only (untouched docs never enter the doc-grain shuffle), anti-mark against the cut set, and per-doc ordered reassembly via array_sort(collect_list(struct(pos, tok))) — deterministic, and bounded by doc length exactly like every per-doc array op in the family. Output per AFFECTED doc: original token count, removed count, cleaned text. Scale: runs/intervals/cut-set are all sized by total DUPLICATED tokens (the output of the audit that motivated the cut), never corpus tokens; the positional index is dd13's priced cost, factored (spanRuns), computed once.") {
      (s, dir) => rewriteDropped(s, dir, spanDrops(s, dir))
    },

    GraftQuery(
      "dd19_intradoc_repeat_scrub",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents),
              |dr AS (SELECT * FROM $intraDropPosDuck z),
              |toks AS (SELECT doc_id, i AS pos, a[i] AS tok
              |         FROM d, UNNEST(RANGE(1, LEN(a) + 1)) AS t(i)),
              |o AS (SELECT t.doc_id, t.pos, t.tok, dr.pos IS NOT NULL AS dropped
              |      FROM toks t
              |      JOIN (SELECT DISTINCT doc_id FROM dr) af USING (doc_id)
              |      LEFT JOIN dr ON dr.doc_id = t.doc_id AND dr.pos = t.pos)
              |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
              |       COALESCE(STRING_AGG(CASE WHEN NOT dropped THEN tok END, ' '
              |                           ORDER BY pos), '') AS cleaned
              |FROM o GROUP BY 1""".stripMargin),
      s"WITHIN-doc repetition scrub — the INTRA-document axis of the rewrite family (dd18 cuts what documents share with EACH OTHER; this cuts what a document repeats to ITSELF — the Rae et al./Gopher repetition pathology tx09 only MEASURES as top-bigram fraction, completed as a transformation): every later occurrence of a token $IntraK-gram already seen in the SAME document is cut at position grain, keep-FIRST-occurrence retention (the positional analog of dd18's min-id rule: only later occurrences ever enter the cut set, so every cut position's gram occurs verbatim EARLIER in its own document — no content leaves the pre-rewrite corpus, only copies; as in dd18, a first copy can still be clipped by a DIFFERENT gram's overlapping cut). Resolution is $IntraK, not dd13's $SpanK, by measurement: the fixture (like short-form text generally) holds ZERO intra-doc runs at 8-gram scale at any sf, while repeated trigrams exist at all three — the constant is the knob separating phrase-scale repetition from passage-scale plagiarism, and the two ops share everything downstream of it (the cut set is the distinct (doc_id,pos) interval union — overlapping repeats of overlapping grams cost each token once; the rewrite is dd18's factored rewriteDropped verbatim: affected docs only, anti-mark, ordered reassembly). Scale shape: the positional gram frame shuffles ONCE keyed (doc_id, gram) for the first-occurrence window — partitioned BY DOCUMENT, so parallelism is doc-count and skew is bounded by doc length (no cross-doc join, no df cap needed: a gram hot across the corpus is irrelevant here, only repetition within one doc pairs); laters/cut-set are sized by repeated tokens. DedupSpec replays sequentially (per-doc seen-set walk) and pins both the repeat-exists and clean-docs polarities plus that every cut position's gram occurs verbatim earlier in its own doc.") {
      (s, dir) => rewriteDropped(s, dir, intraDrops(s, dir))
    },

    GraftQuery(
      "dd20_banding_sweep",
      Some(s"""WITH $bandingSweepDuck
              |SELECT bands, rows_per_band, n_candidates, n_true, n_caught
              |FROM sweep""".stripMargin),
      "LSH BANDING SWEEP — the operating-curve table for dd03's (bands, rows) knob, completing the tuning-table family (ss16 tunes ANN nprobe, tx23 the classifier keep-point, dc05 the decontamination threshold; this tunes the near-dup candidate generator every 100 TB dedup run gates on): for each split of the SAME 32-wide MinHash signature — (4 x 8), the shipped (8 x 4), (16 x 2) — the exact candidate-pair count (the join's cost: candidates are the rows the scorer must touch) and the exact catch count against dd05's >= 0.8 truth (what the cost buys). Banding theory prices the trade analytically (a j-pair meets in >= 1 band w.p. 1-(1-j^r)^b: at j = 0.8, (4 x 8) ~ 0.52, (8 x 4) ~ 0.985, (16 x 2) ~ 1.0 while the accidental-collision floor rises as rows shrink); this table measures it on the corpus, which is what picks the config before freezing an index — dd10 then audits the CHOSEN config per Jaccard decile. One signature table feeds all three configs (pinned — built once, the sweep's only corpus-scale artifact); each config is ONE band-key equi-join; truth is computed once and shared (ss16's discipline). All counts exact integers, bit-identical cross-engine. Measured at sf0.1 the table reads exactly like the theory: (4 x 8) MISSES a true pair (255/256 — too-long rows drop a j just over 0.8), (16 x 2) pays 2036 candidates for zero extra catches over the shipped config's 256 — the two failure modes the shipped (8 x 4) sits between, and the number that justifies it; at the smaller fixtures the near-dups are j ~ 1 clones and recall saturates at every config (the sweep still prices the candidate axis — 46 vs 25 at sf0.01). DedupSpec pins candidate cost monotone (strictly increasing at the (16,2) end), catches monotone and bounded by candidates, and the shipped (8,4) endpoints equal to dd03's candidate set and dd10's truth totals — the sweep measures the production pipeline, not a paraphrase.") {
      (s, dir) => bandingSweep(s, dir).sweep
    },

    GraftQuery(
      "dd21_tuned_banding",
      Some(s"""WITH $bandingSweepDuck,
              |best AS (SELECT bands, rows_per_band FROM sweep
              |         WHERE n_caught = (SELECT MAX(n_caught) FROM sweep)
              |         ORDER BY n_candidates, bands LIMIT 1),
              |tagged AS (${Seq((4, 8, "_a"), (8, 4, "_b"), (16, 2, "_c")).map { case (b, r, t) =>
                s"SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band, doc_a, doc_b FROM cand$t"
              }.mkString("\nUNION ALL\n")}),
              |cp AS (SELECT t.bands, t.rows_per_band, t.doc_a, t.doc_b
              |       FROM tagged t JOIN best USING (bands, rows_per_band))
              |SELECT cp.bands, cp.rows_per_band, cp.doc_a, cp.doc_b,
              |       CAST(LEN(LIST_FILTER(RANGE(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 AS est_jaccard
              |FROM cp JOIN sigs sa ON sa.doc_id = cp.doc_a
              |        JOIN sigs sb ON sb.doc_id = cp.doc_b
              |WHERE CAST(LEN(LIST_FILTER(RANGE(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 >= 0.5""".stripMargin),
      "TUNED LSH banding — the tuning LOOP closed (VERDICT r16 #4): dd20 produces the (bands, rows) operating curve but dd03 still hard-codes (8, 4); every other tuning table in the inventory already DRIVES its consumer (q62's forecast drives q58's salting, pl04 serves tx23's grid-chosen theta*, and a 100 TB dedup run freezes its banding config off exactly dd20's counters, not off a constant in source). The decision rule is the sweep's own economics: among configs whose catch equals the MAX catch, take the CHEAPEST (fewest candidate pairs — the scorer's bill), tiebreak by bands ascending — a deterministic 3-row argmin over dd20's counter-grain table (TakeOrderedAndProject on an aggregate-fed frame; no corpus-side work beyond the sweep both queries share). The chosen config then feeds the SHIPPED band generator: the per-config candidate sets are already materialized by the sweep (the choice costs no fourth banding pass), the 1-row choice broadcast-joins the config-tagged union, and the survivors score through dd03's exact estimator (>= 0.5, same text both engines). Output: the chosen (bands, rows_per_band) on every scored pair — dd03's product with the config column the tuner picked. Measured: at sf0.1 the rule lands on the shipped (8, 4) ((4x8) misses a true pair, (16x2) pays 2036 candidates for zero extra catches) and dd21's pairs are dd03's row-for-row (DedupSpec pins the identity WHEN the choice is (8,4), plus the rule itself against a driver-side replay of the sweep); at the clone-saturated small fixtures every config catches everything and the rule correctly buys the cheaper (4, 8) — the config a tuner SHOULD ship for that corpus shape, which is the point of computing the choice instead of freezing it. At 100 TB: the sweep is the priced artifact (one signature table + three band-key equi-joins), the choice is a 3-row fold, and re-running the pair on each corpus snapshot is how the banding config tracks corpus drift.") {
      (s, dir) =>
        val bs = bandingSweep(s, dir)
        // decision rule: cheapest config whose catch equals the max —
        // a 3-row TakeOrderedAndProject over the shared sweep table
        val mx = bs.sweep.agg(max(col("n_caught")).as("mx"))
        val best = broadcast(bs.sweep.crossJoin(broadcast(mx))
          .filter(col("n_caught") === col("mx"))
          .orderBy(col("n_candidates"), col("bands")).limit(1)
          .select("bands", "rows_per_band"))
        // the chosen config feeds the shipped generator: candidate sets
        // are already materialized by the sweep — tag, pick, score
        val tagged = bs.cands.map { case (b, r, cand) =>
          cand.select(lit(b).cast("int").as("bands"),
            lit(r).cast("int").as("rows_per_band"),
            col("doc_a"), col("doc_b"))
        }.reduce(_ unionByName _)
        tagged.join(best, Seq("bands", "rows_per_band"))
          .join(bs.sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
          .join(bs.sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
          .withColumn("est_jaccard",
            expr("CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS DOUBLE) / 32"))
          .filter(col("est_jaccard") >= 0.5)
          .select("bands", "rows_per_band", "doc_a", "doc_b", "est_jaccard")
    },

    GraftQuery(
      "dd22_incremental_clusters",
      // ground truth: dd14/dd07's definition-level oracle VERBATIM —
      // the closure over the FULL jaccard edge set; the incremental
      // label maintenance must be indistinguishable from a re-cluster
      Some(s"""WITH RECURSIVE $clusterCtes
              |SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY doc_id""".stripMargin),
      "INCREMENTAL near-dup cluster maintenance — the dedup family's label store closes the loop gr23 opened (gr08's doc promised 'the loop that groups near-dup documents at corpus scale'; gr23 built the delta machinery on the nation graph; this applies it to the graph it was promised for): production dedup clusters are CONSUMED continuously (keeper election, pl02's admission, retention) while near-dup edges ARRIVE continuously with every ingest drop — and re-running a corpus-scale clustering fixpoint per drop is exactly what the delta path avoids. Near-dup edges only ever ADD (a certified jaccard>=0.8 pair never un-certifies), so gr23's addition-merge path ALONE is exact — no hard deletion half. The persisted artifact is cluster labels over the SEED corpus (md5 doc-bucket <50; the split is measured — at 50 the spec fixture's drop genuinely EXTENDS a multi-doc base cluster, the polarity nearby splits leave vacuous), built once into a DiskMemo store by the factored ccPointerJump loop (one definition with gr08/gr23) over the seed-internal edges; the drop's edges (>=1 new endpoint) then merge labels with DROP-SIZED label work via the factored ccMergeAdds (one definition with gr23/gr25): new docs enter as self-labeled singletons, endpoints look up components, same-component edges drop, the quotient graph pointer-jumps at COMPONENT grain, and untouched clusters coalesce through unread — min-label composes, so the merge map's min IS the union cluster's min (gr23's structural argument, verbatim). Audit-scale honesty: the edge UNIVERSE here is dd05's full df-capped inverted-index pipeline filtered by endpoint bucket (the oracle needs one edge definition); in production the drop's pairs come from StreamedDedup's probe path (new-vs-store fingerprint hits), already shipped — dd22's contribution is the CLUSTERING side of that lifecycle — and because DOC-grain labels are corpus-scale at 100 TB (tens of GB, past any executor), the merge runs the SHUFFLED twin of the delta core (r18, VERDICT r17 #3): ccMergeAdds with shuffled=true, endpoint lookups and the merge-map rewrite as SHUFFLE_MERGE equi-joins and the quotient fixpoint on gr09's shuffled rounds, so no label-derived table is ever a hashed relation (the promise this doc made in r17, now shipped; gr28 pins the shuffled form row-identical to the broadcast form on the nation graph). Output = (doc_id, cluster) over the full graph's vertices; DedupSpec replays a driver union-find at both stages and pins the polarity triple: a multi-doc base cluster genuinely extended, multi-doc base clusters untouched (their labels pass through the store unread), and the store serve reading labels from parquet.") {
      (s, dir) =>
        val store = clusterLabelStore(s, dir)
        val baseLab = s.read.parquet(s"$store/labels")
        // jaccardEdges is a StageStore read — the checkpoint it carried
        // pre-dated the LSH stage stores; two parquet scans beat one
        // eager checkpoint job (r19 session 2, measured on the sweep)
        val edges = jaccardEdges(s, dir).select("doc_a", "doc_b")
        val bA = expr(Sampling.bucket100("doc_a"))
        val bB = expr(Sampling.bucket100("doc_b"))
        // the drop's edges: at least one endpoint outside the seed slice
        val delta = edges.filter(!(bA < 50 && bB < 50))
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        // new docs enter as self-labeled singleton components
        val dropLab = docs(s, dir)
          .filter(expr(Sampling.bucket100("doc_id")) >= 50)
          .select(col("doc_id").as("node"), col("doc_id").as("component"))
        val lab = baseLab.unionByName(dropLab)
        // shuffled=true: doc-grain labels are corpus-scale at 100 TB —
        // the broadcast form this core runs on the nation graph would
        // hash-relation the whole label table here (see doc)
        val updated = Graph.ccMergeAdds(lab, delta, shuffled = true)
        // restrict to the full graph's vertices (the oracle's universe)
        val verts = edges.select(col("doc_a").as("node"))
          .unionByName(edges.select(col("doc_b").as("node"))).distinct()
        updated.join(verts, Seq("node"), "left_semi")
          .select(col("node").as("doc_id"), col("component").as("cluster"))
    },

    GraftQuery(
      "dd23_erasure_verdicts",
      Some(erasedStoreDuck),
      "INGESTION DEDUP UNDER ERASURE — the mutation the fingerprint store still lacked (VERDICT r18 #3: accretion dd12/StreamedDedup, compaction, the composed admission pipeline — but documents only ever ARRIVED; a GDPR-erased document's fingerprints and postings kept voting in near-dup verdicts forever, and the pipeline's corpus_after could never shrink): the store gains StreamedIndex's TOMBSTONE protocol at doc grain. An erasure batch writes the requested doc_ids under a deterministic tombs/batch_id=N partition (mode=overwrite — a replayed request is byte-stable; erasing a never-admitted doc is a structural no-op), the verdict pass reads the LIVE view — postings anti-join the erased ids, the exact table anti-joins on its HOLDER cid (the accretion protocol admits exactly one holder per distinct text, so the holder's row is the text's only live contribution; the one corner — a SEEDED clone family's collapsed min holder — demotes a re-arriving identical text from exact_dup to near_dup via its jaccard-1.0 sibling, still rejected, documented at readStore) — and compactStore makes the erasure PHYSICAL in its write-then-prune fold, clearing consumed tombstones (a crash between fold and tomb prune re-deletes already-removed rows, a no-op). The live view ALSO feeds accretion's fp growth-bound anti-join: a dead fp row must not shadow a new holder of the same text, or the text goes unprotected forever. THIS query runs the full lifecycle on fixture splits — seed the store (md5 bucket < 50), accrete one drop ([50, 80)) through the SHIPPED batch protocol, erase the `_del`-salted decile of ALL doc ids (admitted docs get erased; un-admitted requests no-op), then verdict a probe batch (>= 80) against the live store with the SAME factored verdictsAgainstStore every dedup serve runs. The oracle replays the whole protocol in SQL — admission against the seed store, holder-grain erasure, df-cap recomputed over the LIVE postings — so a tombstone that leaks into the wrong table, a dead fp shadowing, or a stale df count all hash-fail. At 100 TB: an erasure batch is request-sized, the live-view anti-joins probe a columnar LONG set, every verdict join stays drop-sized (dd12's asymmetry), and storage reclamation rides the compaction the store already schedules; StreamedDedupSpec pins the lifecycle — live-view verdicts == rebuild-without-erased, replayed erasure a no-op, post-compaction identity, and corpus_after genuinely shrinking through the pipeline ledger.") {
      (s, dir) =>
        // the live view's df-capped artifacts are deterministic
        // functions of the (DiskMemo'd) store state, so they are
        // StageStore tables like stdRare/stdEc (r19 session 2, guide
        // §2.4): the serve probes persisted artifacts instead of
        // re-running the corpus-scale df groupBy + capped-postings
        // join per run. StageStoreSpec pins store == fresh.
        val (exact, rare, ec) = erasedLiveArtifacts(s, dir)
        val probe = spread(docs(s, dir), "doc_id")
          .filter(expr(Sampling.bucket100("doc_id")) >= 80)
          .select("doc_id", "text")
        verdictsAgainstStoreOver(s, probe, exact, rare, ec)
    },

    GraftQuery(
      "dd24_streamed_cluster_labels",
      Some(streamedLabelsDuck),
      "STREAMED CLUSTER-LABEL SERVING — dd22's promised production wiring as an oracle-checked serve (VERDICT r18 #5: dd22's delta edges came from dd05's batch pipeline filtered by bucket; production's drop pairs come from the STORE's probe path — the near-dup verdict hits every admission batch already computes): the persisted label store seeds ONCE from the standing corpus' dup-edge clustering (df-capped jaccard pairs + clone-family min-edges, the factored pointer-jump loop), and each micro-batch then maintains it inside foreachBatch from the probe path's PAIR-grain hits (storeMatchPairs — every exact/near match, not just the min-match verdict id: a drop doc matching TWO standing clusters is precisely the event that merges them) via the factored ccMergeAdds on the SHUFFLED form — batch docs enter as self-labeled singletons (new nodes only; a re-delivered id keeps its standing label), endpoint lookups and the merge-map rewrite are shuffle_merge equi-joins (doc-grain labels are corpus-scale at 100 TB — nothing label-derived is ever a hashed relation), and the batch WRITES only the labels it created or changed (latest-batch-wins at read; writes are drop-plus-merged-clusters-sized, never the corpus — the property that makes per-trigger maintenance affordable). A duplicate's label records the cluster that rejected it: the retention/attribution audit every corpus-governance pipeline keeps. THIS query reads the maintained store after seed (md5 bucket < 50) plus one drop (>= 50) — one protocol definition with StreamedPipeline's stage 6 (seedLabels/maintainLabels live on the store's owner). THE ORACLE IS THE ALGORITHM-FREE CLOSURE over the protocol's own edge universe (seed dup edges ∪ the drop's store hits, replayed in SQL with the df cap over the store's vocabulary): min-label composition across incremental merges must be indistinguishable from the one-shot transitive closure — gr23's structural argument, hash-checked; within-drop pairs are deliberately ABSENT from both sides (the probe path never pairs a batch against itself — dd12's asymmetry, documented). StreamedPipelineSpec pins the streamed lifecycle (union-find identity across a checkpointed kill/resume, change-sized writes, replay no-op, compaction fold); at 100 TB the per-batch bill is the probe the admission already pays plus a quotient-graph fixpoint at COMPONENT grain.") {
      (s, dir) =>
        val store = labeledDedupStore(s, dir)
        StreamedDedup.readLabels(s, s"$store/store")
          .select(col("node").as("doc_id"), col("component").as("cluster"))
    },
  )

  /** dd24's persisted artifact: the fingerprint store + cluster-label
    * store built by the SHIPPED protocol — seed both from the bucket
    * < 50 corpus, run one drop (>= 50) through processBatch, then
    * maintain the labels from the SAME probe-path pairs the verdicts
    * folded (exclude-own-batch store read, exactly what processBatch
    * saw). DiskMemo'd per (application, dir).
    */
  private def labeledDedupStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ddlab_$tag", dir)
    DiskMemo.ensure(s"ddlab_$tag", out) {
      val d = spread(docs(s, dir), "doc_id")
      val bkt = expr(Sampling.bucket100("doc_id"))
      val seedDocs = d.filter(bkt < 50).select("doc_id", "text")
      val batch = Materialize(d.filter(bkt >= 50).select("doc_id", "text"))
      StreamedDedup.seed(s, seedDocs, s"$out/store")
      StreamedDedup.seedLabels(s, seedDocs, s"$out/store")
      StreamedDedup.processBatch(batch, 0L, s"$out/store", s"$out/verdicts")
      val (exact, postings) =
        StreamedDedup.readStore(s, s"$out/store", excludeBatch = 0L)
      val pairs = Materialize(storeMatchPairs(s, batch, exact, postings))
      StreamedDedup.maintainLabels(batch, pairs, 0L, s"$out/store")
    }
  }

  /** dd24's oracle: the one-shot transitive closure over the
    * protocol's edge universe — seed-internal dup edges (df-capped
    * jaccard + clone min-edges, [[corpusDupEdges]]' SQL twin) unioned
    * with the drop's probe hits (exact fp matches + near pairs in the
    * store's df-capped vocabulary, [[storeMatchPairs]]' SQL twin) —
    * labels = min reachable id, isolated docs self-labeled.
    */
  private[operators] lazy val streamedLabelsDuck: String =
    s"""WITH RECURSIVE dall AS (SELECT doc_id, text,
       |               ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
       |seed AS (SELECT doc_id, text FROM dall WHERE bkt < 50),
       |b0 AS (SELECT doc_id, text FROM dall WHERE bkt >= 50),
       |spost AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM seed)),
       |rare0 AS (SELECT g FROM spost GROUP BY g HAVING COUNT(*) <= $DfCap),
       |sec AS (SELECT p.doc_id, p.g FROM spost p JOIN rare0 USING (g)),
       |sn AS (SELECT doc_id, COUNT(*) AS n FROM sec GROUP BY 1),
       |sp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |       FROM sec a JOIN sec b ON a.g = b.g AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |sedges AS (SELECT doc_a, doc_b FROM sp
       |           JOIN sn na ON na.doc_id = sp.doc_a
       |           JOIN sn nb ON nb.doc_id = sp.doc_b
       |           WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8),
       |sfp AS (SELECT md5(text) AS fp, doc_id FROM seed),
       |sx AS (SELECT fp, MIN(doc_id) AS cid FROM sfp GROUP BY 1),
       |scl AS (SELECT x.cid AS doc_a, f.doc_id AS doc_b
       |        FROM sfp f JOIN sx x USING (fp) WHERE f.doc_id <> x.cid),
       |bpost AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM b0)),
       |be AS (SELECT e.doc_id, e.g FROM bpost e JOIN rare0 USING (g)),
       |bn AS (SELECT doc_id, COUNT(*) AS n FROM be GROUP BY 1),
       |hp AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
       |       FROM be i JOIN sec c ON i.g = c.g GROUP BY 1, 2),
       |hnear AS (SELECT hp.di AS doc_a, hp.dc AS doc_b FROM hp
       |          JOIN bn ON bn.doc_id = hp.di JOIN sn ON sn.doc_id = hp.dc
       |          WHERE CAST(shared AS DOUBLE) / (bn.n + sn.n - shared) >= 0.8),
       |hex AS (SELECT b.doc_id AS doc_a, x.cid AS doc_b
       |        FROM b0 b JOIN sx x ON md5(b.text) = x.fp),
       |alledges AS (SELECT doc_a, doc_b FROM sedges
       |             UNION SELECT doc_a, doc_b FROM scl
       |             UNION SELECT doc_a, doc_b FROM hnear
       |             UNION SELECT doc_a, doc_b FROM hex),
       |bi AS (SELECT doc_a AS a, doc_b AS b FROM alledges
       |       UNION SELECT doc_b, doc_a FROM alledges),
       |nodes AS (SELECT doc_id FROM seed UNION SELECT doc_id FROM b0),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.doc_id)
       |SELECT doc_id, MIN(r) AS cluster FROM reach GROUP BY 1""".stripMargin

  /** dd23's persisted artifact: the streamed fingerprint store built
    * by the SHIPPED protocol — seed (bucket < 50), one accretion drop
    * ([50, 80)) through [[StreamedDedup.processBatch]], one erasure
    * batch (the `_del` decile of all doc ids) through
    * [[StreamedDedup.deleteBatch]]. DiskMemo'd per (application, dir).
    */
  private def erasedDedupStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"dderase_$tag", dir)
    DiskMemo.ensure(s"dderase_$tag", out) {
      val d = spread(docs(s, dir), "doc_id")
      val bkt = expr(Sampling.bucket100("doc_id"))
      StreamedDedup.seed(s,
        d.filter(bkt < 50).select("doc_id", "text"), s"$out/store")
      StreamedDedup.processBatch(
        d.filter(bkt >= 50 && bkt < 80).select("doc_id", "text"),
        0L, s"$out/store", s"$out/verdicts")
      StreamedDedup.deleteBatch(
        d.filter(expr(DelBucket100) < 10).select("doc_id"),
        1L, s"$out/store")
    }
  }

  /** dd23's serve-side artifacts over the erased store's LIVE view:
    * the tombstone-applied exact table plus the df-capped vocabulary
    * and capped postings, the latter two StageStore-memoized (r19
    * session 2) — deterministic functions of the DiskMemo'd store
    * state, same discipline as [[stdRare]]/[[stdEc]]. Fresh doors
    * exposed for StageStoreSpec's parity pins.
    */
  private[operators] def erasedLiveArtifacts(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (exact, _) = erasedLiveView(s, dir)
    val rare = StageStore.table(s, dir, "ddelrare")(erasedLiveRareFresh(s, dir))
    val ec = StageStore.table(s, dir, "ddelec")(erasedLiveEcFresh(s, dir))
    (exact, rare, ec)
  }

  private def erasedLiveView(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val store = erasedDedupStore(s, dir)
    StreamedDedup.readStore(s, s"$store/store", Long.MinValue, applyTombstones = true)
  }

  private[graft] def erasedLiveRareFresh(s: SparkSession, dir: String): DataFrame =
    dfCapped(erasedLiveView(s, dir)._2)
  private[graft] def erasedLiveEcFresh(s: SparkSession, dir: String): DataFrame =
    erasedLiveView(s, dir)._2.join(erasedLiveRareFresh(s, dir), "g")
  private[graft] def erasedLiveRareStored(s: SparkSession, dir: String): DataFrame =
    erasedLiveArtifacts(s, dir)._2
  private[graft] def erasedLiveEcStored(s: SparkSession, dir: String): DataFrame =
    erasedLiveArtifacts(s, dir)._3

  /** dd23's erasure-request split: an md5 salt over doc_id,
    * independent of the seed/drop/probe decile split (ss24's
    * discipline on the document key).
    */
  private def DelBucket100 =
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '_del')), 1, 8), 16, 10) AS BIGINT) % 100"

  private def delBucketDuck =
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_del'), 1, 8)) AS BIGINT) % 100"

  /** dd23's oracle: the store protocol replayed in SQL — seed store,
    * batch-0 admission (verdicts against the seed store's vocabulary),
    * holder-grain erasure of the `_del` decile, then the probe's
    * verdicts with the df cap recomputed over the LIVE postings
    * (exactly [[verdictsAgainstStore]] over
    * [[StreamedDedup.readStore]]'s live view).
    */
  private[operators] lazy val erasedStoreDuck: String =
    s"""WITH dall AS (SELECT doc_id, text,
       |               ${Sampling.duckBucket100Of("doc_id")} AS bkt,
       |               $delBucketDuck AS dbk FROM documents),
       |seed AS (SELECT doc_id, text FROM dall WHERE bkt < 50),
       |b0 AS (SELECT doc_id, text FROM dall WHERE bkt >= 50 AND bkt < 80),
       |probe AS (SELECT doc_id, text FROM dall WHERE bkt >= 80),
       |tombs AS (SELECT doc_id FROM dall WHERE dbk < 10),
       |sx AS (SELECT md5(text) AS fp, MIN(doc_id) AS cid FROM seed GROUP BY 1),
       |spost AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM seed)),
       |rare0 AS (SELECT g FROM spost GROUP BY g HAVING COUNT(*) <= $DfCap),
       |sec AS (SELECT p.doc_id, p.g FROM spost p JOIN rare0 USING (g)),
       |b0post AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |           FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM b0)),
       |b0e AS (SELECT e.doc_id, e.g FROM b0post e JOIN rare0 USING (g)),
       |nc0 AS (SELECT doc_id, COUNT(*) AS n FROM sec GROUP BY 1),
       |ni0 AS (SELECT doc_id, COUNT(*) AS n FROM b0e GROUP BY 1),
       |p0 AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
       |       FROM b0e i JOIN sec c ON i.g = c.g GROUP BY 1, 2),
       |near0 AS (SELECT p0.di AS doc_id FROM p0
       |          JOIN ni0 ON ni0.doc_id = p0.di JOIN nc0 ON nc0.doc_id = p0.dc
       |          WHERE CAST(shared AS DOUBLE) / (ni0.n + nc0.n - shared) >= 0.8
       |          GROUP BY 1),
       |ex0 AS (SELECT b.doc_id FROM b0 b JOIN sx ON md5(b.text) = sx.fp GROUP BY 1),
       |adm AS (SELECT doc_id, text FROM b0
       |        WHERE doc_id NOT IN (SELECT doc_id FROM ex0)
       |          AND doc_id NOT IN (SELECT doc_id FROM near0)),
       |admx AS (SELECT md5(text) AS fp, MIN(doc_id) AS cid FROM adm GROUP BY 1),
       |storex AS (SELECT fp, cid FROM sx UNION ALL SELECT fp, cid FROM admx),
       |livex AS (SELECT fp, cid FROM storex
       |          WHERE cid NOT IN (SELECT doc_id FROM tombs)),
       |admpost AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM adm)),
       |rawpost AS (SELECT doc_id, g FROM spost UNION ALL SELECT doc_id, g FROM admpost),
       |livep AS (SELECT doc_id, g FROM rawpost
       |          WHERE doc_id NOT IN (SELECT doc_id FROM tombs)),
       |rare AS (SELECT g FROM livep GROUP BY g HAVING COUNT(*) <= $DfCap),
       |ec AS (SELECT p.doc_id, p.g FROM livep p JOIN rare USING (g)),
       |prpost AS (SELECT doc_id, UNNEST($shingleDuck) AS g
       |           FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM probe)),
       |ei AS (SELECT e.doc_id, e.g FROM prpost e JOIN rare USING (g)),
       |nc AS (SELECT doc_id, COUNT(*) AS n FROM ec GROUP BY 1),
       |ni AS (SELECT doc_id, COUNT(*) AS n FROM ei GROUP BY 1),
       |p AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
       |      FROM ei i JOIN ec c ON i.g = c.g GROUP BY 1, 2),
       |near AS (SELECT p.di AS doc_id, MIN(p.dc) AS m FROM p
       |         JOIN ni ON ni.doc_id = p.di JOIN nc ON nc.doc_id = p.dc
       |         WHERE CAST(shared AS DOUBLE) / (ni.n + nc.n - shared) >= 0.8
       |         GROUP BY 1),
       |ex AS (SELECT pr.doc_id, MIN(lx.cid) AS m FROM probe pr
       |       JOIN livex lx ON md5(pr.text) = lx.fp GROUP BY 1)
       |SELECT pr.doc_id,
       |       CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
       |            WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
       |            ELSE 'new' END AS verdict,
       |       CAST(COALESCE(ex.m, nr.m) AS BIGINT) AS match_id
       |FROM probe pr
       |LEFT JOIN ex ON ex.doc_id = pr.doc_id
       |LEFT JOIN near nr ON nr.doc_id = pr.doc_id""".stripMargin

  /** dd22's persisted artifact: cluster labels over the seed corpus
    * (md5 doc-bucket <50), built ONCE per (application, dir) by the
    * factored [[Graph.ccPointerJump]] loop over seed-internal jaccard
    * edges and read from parquet by every serve — the base clustering
    * fixpoint runs in no serve.
    */
  private def clusterLabelStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"ddclu_$tag", dir)
    DiskMemo.ensure(s"ddclu_$tag", out) {
      val bA = expr(Sampling.bucket100("doc_a"))
      val bB = expr(Sampling.bucket100("doc_b"))
      val base = jaccardEdges(s, dir).filter(bA < 50 && bB < 50)
        .select("doc_a", "doc_b")
      val und = Materialize.trackedLocalCheckpoint(
        base.select(col("doc_a").as("a"), col("doc_b").as("b"))
          .unionByName(base.select(col("doc_b").as("a"), col("doc_a").as("b")))
          .distinct())
      val seedDocs = docs(s, dir)
        .filter(expr(Sampling.bucket100("doc_id")) < 50)
        .select(col("doc_id").as("node"))
      Graph.ccPointerJump(und, seedDocs)
        .write.mode("overwrite").parquet(s"$out/labels")
    }
  }

  /** dd20/dd21's shared sweep machinery over ONE pinned signature
    * table: per-config materialized candidate sets plus the sweep table
    * `(bands, rows_per_band, n_candidates, n_true, n_caught)`. The
    * 1-row truth count is aggregated ONCE and cross-joined into every
    * config row (ADVICE r16 — 'truth is computed once' now holds at the
    * aggregate level too, matching the query doc).
    */
  private[operators] final case class BandingSweep(
      sigs: DataFrame, truth: DataFrame,
      cands: Seq[(Int, Int, DataFrame)], sweep: DataFrame)

  /** The sweep's artifacts as StageStore tables (r19 session 2, guide
    * §2.4): dd20 and dd21 each re-ran the three band-key equi-joins,
    * the truth semi-joins and the counter fold per run — but the sweep
    * IS the operating-curve artifact a tuner freezes per corpus
    * snapshot (dd21's own doc), so the candidate sets and the 3-row
    * counter table build once per (application, dir) and both queries
    * read them. `truth` is the already-memoized jaccardEdges store
    * read — the extra checkpoint it used to carry was a leftover from
    * before the LSH stage stores landed. StageStoreSpec pins store ==
    * fresh for the sweep table and each candidate set.
    */
  private[operators] def bandingSweep(s: SparkSession, dir: String): BandingSweep = {
    val sigs = minhashSigs(s, dir)
    val truth = jaccardEdges(s, dir).select("doc_a", "doc_b")
    val cands = BandConfigs.map { case (b, r) =>
      (b, r, StageStore.table(s, dir, s"bandcand${b}x$r")(bandCandidatesBR(sigs, b, r)))
    }
    val sweep = StageStore.table(s, dir, "bandsweep")(
      sweepTableOf(truth, cands))
    BandingSweep(sigs, truth, cands, sweep)
  }

  /** The counter fold behind the sweep table — shared by the store
    * build and the fresh door.
    */
  private def sweepTableOf(
      truth: DataFrame, cands: Seq[(Int, Int, DataFrame)]): DataFrame = {
    val nt = broadcast(truth.agg(count(lit(1)).as("n_true")))
    cands.map { case (b, r, cand) =>
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      val ng = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_caught"))
      nc.crossJoin(nt).crossJoin(broadcast(ng))
        .select(lit(b).cast("int").as("bands"),
          lit(r).cast("int").as("rows_per_band"),
          col("n_candidates").cast("bigint").as("n_candidates"),
          col("n_true").cast("bigint").as("n_true"),
          col("n_caught").cast("bigint").as("n_caught"))
    }.reduce(_ unionByName _)
  }

  // the un-memoized doors, exposed for StageStoreSpec's parity pins
  private[graft] def bandSweepFresh(s: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSigs(s, dir)
    val truth = jaccardEdges(s, dir).select("doc_a", "doc_b")
    sweepTableOf(truth,
      BandConfigs.map { case (b, r) => (b, r, bandCandidatesBR(sigs, b, r)) })
  }
  private[graft] def bandCandFresh(b: Int, r: Int)(
      s: SparkSession, dir: String): DataFrame =
    bandCandidatesBR(minhashSigs(s, dir), b, r)
  private[graft] def bandCandStored(b: Int, r: Int)(
      s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, s"bandcand${b}x$r")(bandCandFresh(b, r)(s, dir))
  private[graft] def bandSweepStored(s: SparkSession, dir: String): DataFrame =
    bandingSweep(s, dir).sweep

  /** dd19's position-grain cut set: later occurrences of any within-doc
    * repeated [[IntraK]]-gram, exploded to token positions, distinct.
    * One (doc_id, gram)-keyed window shuffle; sized by repeated tokens.
    */
  private[operators] def intraDrops(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "intradrops")(intraDropsFresh(s, dir))

  /** The un-memoized build behind [[intraDrops]] — StageStoreSpec
    * pins store == fresh.
    */
  private[operators] def intraDropsFresh(s: SparkSession, dir: String): DataFrame = {
    val tg = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .withColumn("n", size(col("a")))
      .filter(col("n") >= IntraK)
      .select(col("doc_id"), col("a"),
        explode(expr(s"sequence(1, n - ${IntraK - 1})")).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(concat_ws(" ", expr(s"slice(a, pos, $IntraK)"))).as("g"))
    val wg = Window.partitionBy("doc_id", "g")
    tg.withColumn("p0", min(col("pos")).over(wg))
      .filter(col("pos") > col("p0"))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${IntraK - 1})")).as("pos"))
      .distinct()
  }

  /** The shared span-cut REWRITE (dd18/dd19): given a position-grain
    * cut set `(doc_id, pos)`, rebuild each AFFECTED document without
    * the cut tokens — posexplode, left-semi to affected docs (untouched
    * docs never enter the doc-grain shuffle), anti-mark, per-doc
    * ordered reassembly via array_sort(collect_list(struct(pos, tok))).
    * Output per affected doc: original/removed token counts + cleaned
    * text; bounded by doc length like every per-doc array op.
    */
  private def rewriteDropped(s: SparkSession, dir: String, drops: DataFrame): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
    toks.join(drops.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .join(drops.withColumn("dropped", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("dropped").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(col("dropped").isNull,
              struct(col("pos"), col("tok"))))),
            x => x.getField("tok")),
          " ").as("cleaned"))
  }


  /** dd13's factored core, shared with dd18: every maximal cross-doc
    * shared span >= [[MinSpan]] tokens, at run grain `(da, db, off,
    * pa0, span)` — doc_a < doc_b, `off` the constant position offset of
    * the run, `pa0` the run's first matched position IN doc_a (so the
    * span occupies `[pa0, pa0+span-1]` in doc_a and `[pa0-off,
    * pa0-off+span-1]` in doc_b). See dd13's doc for the positional
    * fingerprint + df cap + gaps-and-islands recovery argument; dd18
    * consumes the same grain to REWRITE the corpus.
    */
  /** dd18's position-grain CUT SET, factored for the rewrite-aware
    * pipeline (pl03): the distinct `(doc_id, pos)` union of every
    * certified span interval landing on the HIGHER doc of its pair
    * (min-id retention). Distinct IS the interval merge at token
    * resolution — overlapping spans cost each token exactly once; the
    * frame is sized by total duplicated tokens, never corpus tokens.
    */
  private[operators] def spanDrops(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "spandrops")(spanDropsFresh(s, dir))

  /** The un-memoized build behind [[spanDrops]] — StageStoreSpec
    * pins store == fresh.
    */
  private[operators] def spanDropsFresh(s: SparkSession, dir: String): DataFrame =
    spanRuns(s, dir).select(col("db").as("doc_id"),
        explode(expr(
          "sequence(CAST(pa0 - off AS INT), CAST(pa0 - off + span - 1 AS INT))")).as("pos"))
      .distinct()

  /** dd18's cut set as a parenthesized DuckDB subquery yielding
    * `(doc_id, n_removed)` — the span CTE chain (dd18's oracle
    * spelling verbatim) reduced to per-doc removed-token counts, for
    * nesting inside composed oracles (pl03) without CTE-name
    * collisions (the keeperIdsDuck discipline).
    */
  /** dd18's position-grain cut set as a self-contained parenthesized
    * SQL block `(doc_id, pos)` — ONE copy consumed by
    * [[spanRemovedDuck]] (pl03) and the combined-rewrite oracle (pl05),
    * exactly as [[spanDrops]] is the one Spark-side definition.
    */
  private[operators] lazy val spanDropPosDuck: String =
    s"""(WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents),
       |g AS (SELECT doc_id, i AS pos, HASH(ARRAY_TO_STRING(a[i : i + ${SpanK - 1}], ' ')) AS g
       |      FROM d, UNNEST(RANGE(1, GREATEST(LEN(a) - ${SpanK - 2}, 1))) AS t(i)
       |      WHERE LEN(a) >= $SpanK),
       |rare AS (SELECT g FROM g GROUP BY g HAVING COUNT(*) <= $DfCap),
       |r AS (SELECT x.doc_id, x.pos, x.g FROM g x JOIN rare USING (g)),
       |p AS (SELECT x.doc_id AS da, y.doc_id AS db, x.pos AS pa, x.pos - y.pos AS off
       |      FROM r x JOIN r y ON x.g = y.g AND x.doc_id < y.doc_id),
       |i AS (SELECT da, db, off, pa,
       |             pa - ROW_NUMBER() OVER (PARTITION BY da, db, off ORDER BY pa) AS isle
       |      FROM p),
       |runs AS (SELECT da, db, off, MIN(pa) AS pa0, COUNT(*) + ${SpanK - 1} AS span
       |         FROM i GROUP BY da, db, off, isle),
       |iv AS (SELECT db AS doc_id, pa0 - off AS s, pa0 - off + span - 1 AS e
       |       FROM runs WHERE span >= $MinSpan)
       |SELECT DISTINCT doc_id, pos FROM
       |       (SELECT doc_id, UNNEST(RANGE(s, e + 1)) AS pos FROM iv) u)""".stripMargin

  /** dd19's position-grain cut set, same factoring — consumed by the
    * dd19 oracle and pl05's combined-rewrite oracle.
    */
  private[operators] lazy val intraDropPosDuck: String =
    s"""(WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents),
       |tg AS (SELECT doc_id, i AS pos, HASH(ARRAY_TO_STRING(a[i : i + ${IntraK - 1}], ' ')) AS g
       |       FROM d, UNNEST(RANGE(1, GREATEST(LEN(a) - ${IntraK - 2}, 1))) AS t(i)
       |       WHERE LEN(a) >= $IntraK),
       |lat AS (SELECT doc_id, pos FROM (
       |        SELECT doc_id, pos, MIN(pos) OVER (PARTITION BY doc_id, g) AS p0 FROM tg) x
       |        WHERE pos > p0)
       |SELECT DISTINCT doc_id, pos + o AS pos
       |FROM lat, UNNEST(RANGE(0, $IntraK)) AS u(o))""".stripMargin

  private[operators] lazy val spanRemovedDuck: String =
    s"""(SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
       |FROM $spanDropPosDuck dr GROUP BY doc_id)""".stripMargin

  private[operators] def spanRuns(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .withColumn("n", size(col("a")))
      .filter(col("n") >= SpanK)
      .select(col("doc_id"), col("a"),
        explode(expr(s"sequence(1, n - ${SpanK - 1})")).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(concat_ws(" ", expr(s"slice(a, pos, $SpanK)"))).as("g"))
    val rare = g.join(
      g.groupBy("g").agg(count(lit(1)).as("f"))
        .filter(col("f") <= DfCap).select("g"),
      Seq("g"), "left_semi")
    val p = rare.select(col("g"), col("doc_id").as("da"), col("pos").as("pa"))
      .join(rare.select(col("g"), col("doc_id").as("db"), col("pos").as("pb")), "g")
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("pa"), (col("pa") - col("pb")).as("off"))
    val w = Window.partitionBy("da", "db", "off").orderBy("pa")
    p.withColumn("isle", col("pa") - row_number().over(w))
      .groupBy("da", "db", "off", "isle")
      .agg(min(col("pa")).as("pa0"),
        (count(lit(1)) + (SpanK - 1)).as("span"))
      .filter(col("span") >= MinSpan)
      .select("da", "db", "off", "pa0", "span")
  }

  /** dd12's core over any `(doc_id, text)` frame — split by md5 bucket
    * into a 10% incoming drop + 90% corpus, then verdict each incoming
    * doc (exact_dup / near_dup / new + min-matching-corpus-doc audit
    * id). Factored so the spec can drive the exact_dup branch on a
    * synthetic frame: the generated fixtures contain no byte-identical
    * clone family at verify scale (checked — 0 families at sf0.01), so
    * only a constructed input can prove the exact path end-to-end.
    */
  private[operators] def incrementalVerdicts(
      s: SparkSession, d0: DataFrame): DataFrame = {
    val dall = d0.withColumn("bkt", expr(Sampling.bucket100("doc_id")))
    val inc = dall.filter(col("bkt") < 10).select("doc_id", "text")
    val corp = dall.filter(col("bkt") >= 10).select("doc_id", "text")
    verdictsAgainstStore(s, inc, corpusExact(corp), corpusPostings(s, corp))
  }

  /** dd12's query over the MEMOIZED store tables (r19): the drop
    * probes persisted artifacts, exactly the operator's doc —
    * [[incrementalVerdicts]] stays the spec's synthetic-frame door.
    * Shared by dd12 and pl02's stage-2 core (one definition).
    */
  private[operators] def stdIncrementalVerdicts(s: SparkSession, dir: String): DataFrame = {
    val inc = spread(docs(s, dir), "doc_id")
      .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
      .filter(col("bkt") < 10).select("doc_id", "text")
    verdictsFromPairs(inc, storeMatchPairsOver(s, inc,
      stdCorpusExact(s, dir), stdRare(s, dir), stdEc(s, dir)))
  }

  /** The STANDARD split's ([0,10) drop vs [10,100) corpus over
    * `documents`) corpus-side store tables, StageStore-memoized (r19
    * optimization round, guide §2.4): dd12 and pl07 each re-derived
    * the [10,100) fingerprint store AND the shingle posting list —
    * an md5 + graft_shingles + explode pass over 90% of the corpus —
    * fresh per run (pl07 paid it at BOTH ends of its two-drop
    * protocol), and they are exactly the artifacts the operators'
    * own docs call "the PERSISTED artifacts ... built once". Both are
    * deterministic md5/string frames, so persist-then-read is
    * bit-identical (StageStoreSpec's contract); the spec-facing
    * [[incrementalVerdicts]] keeps taking arbitrary frames.
    */
  private[operators] def stdCorpus(s: SparkSession, dir: String): DataFrame =
    spread(docs(s, dir), "doc_id")
      .withColumn("bkt", expr(Sampling.bucket100("doc_id")))
      .filter(col("bkt") >= 10).select("doc_id", "text")

  private[operators] def stdCorpusExact(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "corpexact")(stdCorpusExactFresh(s, dir))

  private[operators] def stdCorpusPostings(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "corppost")(stdCorpusPostingsFresh(s, dir))

  // the un-memoized builds, exposed for StageStoreSpec's parity pins
  private[graft] def stdCorpusExactFresh(s: SparkSession, dir: String): DataFrame =
    corpusExact(stdCorpus(s, dir))
  private[graft] def stdCorpusPostingsFresh(s: SparkSession, dir: String): DataFrame =
    corpusPostings(s, stdCorpus(s, dir))
  private[graft] def stdRareFresh(s: SparkSession, dir: String): DataFrame =
    dfCapped(stdCorpusPostingsFresh(s, dir))
  private[graft] def stdEcFresh(s: SparkSession, dir: String): DataFrame =
    stdCorpusPostingsFresh(s, dir).join(stdRareFresh(s, dir), "g")

  /** The standard store's df-capped artifacts, memoized one level
    * further (the df-cap groupBy + capped-postings join were still
    * re-derived and re-checkpointed per consumer run).
    */
  private[operators] def stdRare(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "corprare")(dfCapped(stdCorpusPostings(s, dir)))

  private[operators] def stdEc(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "corpec")(
      stdCorpusPostings(s, dir).join(stdRare(s, dir), "g"))

  /** The standard corpus' full shingle document-frequency table
    * `(g, df)` (r19 session 2): tx15's novelty vocabulary — the df
    * grouping over [[stdCorpusPostings]] (postings are distinct per
    * doc, so COUNT(*) per g IS the doc frequency). Memoized like the
    * rest of the standard store's artifacts.
    */
  private[operators] def stdVocabDf(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "corpdf")(
      stdCorpusPostings(s, dir).groupBy("g").agg(count(lit(1)).as("df")))

  private[graft] def stdVocabDfFresh(s: SparkSession, dir: String): DataFrame =
    stdCorpusPostingsFresh(s, dir).groupBy("g").agg(count(lit(1)).as("df"))
  private[graft] def stdVocabDfStored(s: SparkSession, dir: String): DataFrame =
    stdVocabDf(s, dir)

  /** The corpus-side persisted artifacts of the incremental pass, as
    * built from raw `(doc_id, text)`: the exact-fingerprint store
    * `(fp, cid)` — one row per DISTINCT text, cid = min holder (the
    * collapse is what bounds store growth by distinct fingerprints) —
    * and the shingle posting list `(doc_id, g)` (distinct per doc by
    * `graft_shingles`' dedup). [[StreamedDedup]] persists and accretes
    * exactly these two tables.
    */
  private[operators] def corpusExact(corp: DataFrame): DataFrame =
    corp.select(md5(col("text")).as("fp"), col("doc_id").as("cid"))
      .groupBy("fp").agg(min(col("cid")).as("cid"))

  private[operators] def corpusPostings(s: SparkSession, corp: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    corp.withColumn("gs", expr("graft_shingles(text)"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
  }

  /** dd12's verdict pass against an EXPLICIT corpus store — the
    * factored core shared by the batch query (split-derived store) and
    * [[StreamedDedup]] (parquet-persisted store accreted per
    * micro-batch). Semantics identical to dd12's doc: per incoming doc
    * one verdict exact_dup / near_dup / new with the min matching
    * corpus id; the df cap is computed over the STORE's postings (the
    * persisted index's vocabulary), both shingle streams filter by it,
    * and every join's incoming side is drop-sized.
    */
  private[operators] def verdictsAgainstStore(
      s: SparkSession,
      inc: DataFrame,
      corpExact: DataFrame,
      corpPostings: DataFrame): DataFrame =
    verdictsFromPairs(inc, storeMatchPairs(s, inc, corpExact, corpPostings))

  /** The probe path at PAIR grain (r19, VERDICT r18 #5): EVERY
    * qualifying (incoming doc, corpus doc) hit — exact fingerprint
    * matches and near pairs over the df-capped store vocabulary —
    * before the per-doc min aggregation [[verdictsFromPairs]] applies.
    * This is the streamed edge source dd22's doc promises: the
    * pipeline's label maintenance consumes these pairs as delta edges
    * (an incoming doc matching TWO standing clusters is the event that
    * merges them — the min-match verdict alone would miss it), and the
    * verdict serve is a cheap fold over the same frame, so the hits
    * are computed exactly once per batch.
    */
  private[operators] def storeMatchPairs(
      s: SparkSession,
      inc: DataFrame,
      corpExact: DataFrame,
      corpPostings: DataFrame): DataFrame = {
    // store-side df cap (the persisted index's vocabulary); both
    // splits' shingle streams are filtered by it
    val rare = dfCapped(corpPostings)
    val ec = Materialize(corpPostings.join(rare, "g"))
    storeMatchPairsOver(s, inc, corpExact, rare, ec)
  }

  /** The store-side df-cap rule in one place: the vocabulary of
    * shingles rare enough (df <= cap) to enter the probe index.
    */
  private[operators] def dfCapped(postings: DataFrame): DataFrame =
    postings.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("g")

  /** [[verdictsAgainstStore]] over caller-supplied df-capped artifacts
    * — the consumer door to [[storeMatchPairsOver]].
    */
  private[operators] def verdictsAgainstStoreOver(
      s: SparkSession, inc: DataFrame, corpExact: DataFrame,
      rare: DataFrame, ec: DataFrame): DataFrame =
    verdictsFromPairs(inc, storeMatchPairsOver(s, inc, corpExact, rare, ec))

  /** [[storeMatchPairs]] with the store-side df-capped artifacts
    * (`rare` vocabulary, `ec` capped postings) supplied by the caller
    * (r19 optimization round): for the STANDARD store they are
    * StageStore tables built once per (application, dir) — dd12 and
    * pl07's drop 1 probe the same persisted artifacts instead of
    * re-deriving + re-checkpointing them per run. Accreted-vocabulary
    * callers (pl07's drop 2) still derive them fresh over the union —
    * that recomputation IS the snapshot protocol.
    */
  private[operators] def storeMatchPairsOver(
      s: SparkSession,
      inc: DataFrame,
      corpExact: DataFrame,
      rare: DataFrame,
      ec: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val exactP = inc.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(corpExact, "fp")
      .select(col("doc_id"), col("cid").as("match_id"), lit("exact").as("kind"))
    val ei = Materialize(inc.withColumn("gs", expr("graft_shingles(text)"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .join(rare, "g"))
    val nc = ec.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ni = ei.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val nearP = ei.select(col("doc_id").as("di"), col("g"))
      .join(ec.select(col("doc_id").as("dc"), col("g")), "g")
      .groupBy("di", "dc").agg(count(lit(1)).as("shared"))
      .join(ni.select(col("doc_id").as("di"), col("n").as("n_i")), "di")
      .join(nc.select(col("doc_id").as("dc"), col("n").as("n_c")), "dc")
      .filter(col("shared").cast("double") /
        (col("n_i") + col("n_c") - col("shared")) >= 0.8)
      .select(col("di").as("doc_id"), col("dc").as("match_id"),
        lit("near").as("kind"))
    exactP.unionByName(nearP)
  }

  /** The per-doc verdict fold over [[storeMatchPairs]]' hits — the
    * exact > near priority and min-match audit id, dd12's output
    * contract unchanged.
    */
  private[operators] def verdictsFromPairs(
      inc: DataFrame, pairs: DataFrame): DataFrame = {
    val agg = pairs.groupBy("doc_id").agg(
      min(when(col("kind") === "exact", col("match_id"))).as("exact_match"),
      min(when(col("kind") === "near", col("match_id"))).as("near_match"))
    inc.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, "exact_dup")
          .when(col("near_match").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        coalesce(col("exact_match"), col("near_match"))
          .cast("bigint").as("match_id"))
  }

  /** Within-corpus duplicate edges for a raw `(doc_id, text)` frame —
    * the seed-time label graph [[StreamedPipeline]]'s cluster store
    * bootstraps from: dd05's df-capped jaccard pairs plus exact-clone
    * edges (each clone linked to its family's min holder, so a fully
    * byte-identical family still forms its cluster even when the df
    * cap starves its shingles — dd07's self-edge argument at doc
    * grain).
    */
  private[operators] def corpusDupEdges(s: SparkSession, corp: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sh = corp.withColumn("gs", expr("graft_shingles(text)"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val (pairs, _) = invertedIndexJaccard(sh, "doc_id", lit(1L))
    val fp = corp.select(md5(col("text")).as("fp"), col("doc_id"))
    val clones = fp.join(fp.groupBy("fp").agg(min(col("doc_id")).as("m")), "fp")
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("doc_a"), col("doc_id").as("doc_b"))
    pairs.select(col("ka").as("doc_a"), col("kb").as("doc_b"))
      .unionByName(clones)
  }

  /** The dd06/dd09 shared core, pre-expansion.
    *
    * VALUE COLLAPSE, like dd04: identical embedding vectors (clone
    * boilerplate at corpus scale) share every band bucket, so the
    * candidate join is quadratic in clone multiplicity. Collapse to
    * distinct vectors (keyed by md5 of the value — deterministic,
    * executor-side; `groupBy` partial-aggregates clones map-side), then
    * band-join + cosine-rerank the distinct set. An identical pair
    * reranks as cosine(e, e), so the diagonal passes/fails exactly as
    * the naive formulation. ScaleProbe 10x: 18 s → ~2 s.
    *
    * Post-collapse, everything is keyed by `gid` (the group's MIN
    * vec_id, a LONG — bands, candidate join, rerank; the ss05 lesson:
    * never shuffle on 32-char digest strings). The one digest-keyed
    * join left is `ev`, the vec→group map — map-only scan against the
    * small pinned groups, broadcast-eligible, recomputed per consumer
    * (cheaper than a second pin; the same trade ss05 makes).
    *
    * @return `(ev, groups, gPairs)`: the per-vector map (`vec_id,
    *   gid`), the pinned distinct-vector groups (`gkey, gid,
    *   gsz = clone count, e`), and the confirmed group pairs
    *   (`gid_a ≤ gid_b, gsz_a, gsz_b, sim ≥ 0.45`, diagonal included).
    */
  /** The two memoized stage outputs of the dd06/dd09 shared core
    * (r19): the confirmed group-pair table and the vec->group member
    * map each build once per (application, dir) and persist — before
    * the store dd06 and dd09 each re-ran the collapse + band join +
    * cosine rerank. Deterministic (md5 group keys, min ids, one IEEE
    * cosine per distinct pair) — StageStoreSpec pins store == fresh.
    */
  private[operators] def embGroupPairs(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "embpairs")(embGroupPairsFresh(s, dir))

  private[graft] def embGroupPairsFresh(s: SparkSession, dir: String): DataFrame =
    embeddingGroupPairs(s, dir)._3

  private[operators] def embVecMap(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "embmap")(embVecMapFresh(s, dir))

  private[operators] def embVecMapFresh(s: SparkSession, dir: String): DataFrame =
    embeddingGroupPairs(s, dir)._1

  private def embeddingGroupPairs(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    // emb is map-only lineage off the column-pruned parquet scan —
    // recomputing it per consumer beats materializing it (and at scale
    // a scan re-read is the standard trade for map-only stages); groups
    // sits behind a shuffle with several consumers, so THAT is the one
    // worth pinning ([[Materialize]]). `first("e")` is deterministic:
    // gkey digests e, so every row in a group carries the same vector.
    val emb = spread(Tables.load(s, dir, "embeddings"), "vec_id")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("gkey", md5(to_json(col("e"))))
    val groups = Materialize(emb.groupBy("gkey")
      .agg(min(col("vec_id")).as("gid"), count(lit(1)).as("gsz"),
        first(col("e")).as("e")))
    val sigs = groups.withColumn("sig", expr(Hashing.embSigExpr))
    val bands = sigs.select(col("gid"),
      posexplode(expr(
        "transform(sequence(0, 7), b -> substring(sig, b*4 + 1, 4))"))
        .as(Seq("band_idx", "band_key")))
    val gPairs = bands.select(col("gid").as("gid_a"), col("band_idx"), col("band_key"))
      .join(bands.select(col("gid").as("gid_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("gid_a") <= col("gid_b")) // keep the diagonal: clone groups
      .select("gid_a", "gid_b").distinct()
      .join(groups.select(col("gid").as("gid_a"), col("e").as("e_a"), col("gsz").as("gsz_a")), "gid_a")
      .join(groups.select(col("gid").as("gid_b"), col("e").as("e_b"), col("gsz").as("gsz_b")), "gid_b")
      .withColumn("sim", expr("graft_cosine(e_a, e_b)"))
      .filter(col("sim") >= 0.45)
      .select("gid_a", "gid_b", "gsz_a", "gsz_b", "sim")
    val ev = emb.select(col("vec_id"), col("gkey"))
      .join(groups.select("gkey", "gid"), "gkey")
      .select("vec_id", "gid")
    (ev, groups, gPairs)
  }

  /** dd06's deliverable: confirmed group pairs expanded to vec pairs
    * (output-bound — each unordered vec pair maps to exactly one
    * unordered group pair, so ordering the diagonal by vec id emits
    * each pair once).
    */
  private def embeddingNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val (ev, gPairs) = (embVecMap(s, dir), embGroupPairs(s, dir))
    gPairs
      .join(ev.select(col("gid").as("gid_a"), col("vec_id").as("va")), "gid_a")
      .join(ev.select(col("gid").as("gid_b"), col("vec_id").as("vb")), "gid_b")
      .filter(col("gid_a") < col("gid_b") || col("va") < col("vb"))
      .select(least(col("va"), col("vb")).as("vec_a"),
        greatest(col("va"), col("vb")).as("vec_b"),
        round(col("sim"), 4).as("sim"))
  }

  /** dd09's deliverable: connected components over the GROUP graph,
    * expanded to vectors only after the loop.
    *
    * Clustering the expanded vec-pair list (the old formulation) feeds
    * the propagation loop an edge set quadratic in clone multiplicity —
    * a clone group of m vectors is an m-clique, so at corpus scale the
    * loop's pinned edge table grows ~m² per group. The group graph is
    * clone-independent: cross-group edges are the distinct confirmed
    * pairs, a clone group of ≥ 2 members enters as one self-edge (its
    * diagonal pair survives the sim filter iff the naive formulation
    * would have kept its intra-group pairs — cosine(e, e) is 1, or NaN
    * for a zero vector, in BOTH), and every component label is already
    * the oracle's MIN vec id because each group is keyed by its min.
    * The final expansion is a map-side join of the label table against
    * the vec→group map — no propagation ever sees per-vector rows.
    */
  private def semanticClusters(s: SparkSession, dir: String): DataFrame = {
    val (ev, gPairs) = (embVecMap(s, dir), embGroupPairs(s, dir))
    val cross = gPairs.filter(col("gid_a") =!= col("gid_b"))
      .select(col("gid_a").as("doc_a"), col("gid_b").as("doc_b"))
    // diagonal pairs that survived the sim filter, restricted to groups
    // with actual clone multiplicity (a singleton's diagonal expands to
    // zero vec pairs, so it is a vertex only if a cross edge names it)
    val selfs = gPairs.filter(col("gid_a") === col("gid_b") && col("gsz_a") >= 2)
      .select(col("gid_a").as("doc_a"), col("gid_b").as("doc_b"))
    val labels = minLabelClusters(cross.unionByName(selfs))
    ev.join(labels.select(col("doc_id").as("gid"), col("cluster")), "gid")
      .select(col("vec_id"), col("cluster"))
  }
}

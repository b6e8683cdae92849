package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** The StageStore contract (VERDICT r17 #4): memoizing a shared
  * pipeline stage core behind a parquet round-trip must be
  * OBSERVATIONALLY INVISIBLE — the store serves exactly the rows the
  * un-memoized build derives (the PerceptronStore parity pattern).
  * Each pinned core is deterministic integer/md5/string math, so the
  * comparison is exact set equality, no tolerance.
  */
class StageStoreSpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.mkString("")).toSet
  }

  private val cores: Seq[(String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    ("filterVerdicts", TextAnalysis.filterVerdicts, TextAnalysis.filterVerdictsFresh),
    ("bpeUnitVocab", TextAnalysis.bpeUnitVocab, TextAnalysis.bpeUnitVocabFresh),
    ("bpeUnits", TextAnalysis.bpeUnits, TextAnalysis.bpeUnitsFresh),
    ("spanDrops", Dedup.spanDrops, Dedup.spanDropsFresh),
    ("intraDrops", Dedup.intraDrops, Dedup.intraDropsFresh),
    ("pairCounts", Decontam.pairCounts, Decontam.pairCountsFresh),
    // r19: the dedup cluster chain (VERDICT r18 #1) — the pair
    // pipeline + CC fixpoint behind dd07/dd08/sp13/pl01..pl05
    ("clusterAssignments", Dedup.clusterAssignments, Dedup.clusterAssignmentsFresh),
    ("keeperIds", Dedup.keeperIds, Dedup.keeperIdsFresh),
    // r19 late additions: the LSH family's two shared stage outputs
    ("jaccardEdges", Dedup.jaccardEdges, Dedup.jaccardEdgesFresh),
    ("minhashSigs", Dedup.minhashSigs, Dedup.minhashSigsFresh),
    ("embGroupPairs", Dedup.embGroupPairs, Dedup.embGroupPairsFresh),
    ("embVecMap", Dedup.embVecMap, Dedup.embVecMapFresh),
    // r19 session 2: dd14's stored group-edge list + doc->group map
    ("groupEdgesG", Dedup.groupEdgesStoredG, Dedup.groupEdgesFreshG),
    ("groupEdgesM", Dedup.groupEdgesStoredM, Dedup.groupEdgesFreshM),
    // r19 session 2: dd23's live-view df-cap artifacts
    ("erasedLiveRare", Dedup.erasedLiveRareStored, Dedup.erasedLiveRareFresh),
    ("erasedLiveEc", Dedup.erasedLiveEcStored, Dedup.erasedLiveEcFresh),
    // r19 session 2: the banding sweep's operating-curve artifacts
    ("bandSweep", Dedup.bandSweepStored _, Dedup.bandSweepFresh _),
    ("bandCand4x8", Dedup.bandCandStored(4, 8), Dedup.bandCandFresh(4, 8)),
    ("bandCand8x4", Dedup.bandCandStored(8, 4), Dedup.bandCandFresh(8, 4)),
    ("bandCand16x2", Dedup.bandCandStored(16, 2), Dedup.bandCandFresh(16, 2)),
    // r19 session 2: ss17's trained-codebook artifact
    ("pqTrainedCodebooks", Similarity.pqTrainedCodebooks _,
      Similarity.pqTrainedCodebooksFresh _),
    // r19 optimization round: the standard-split fingerprint store
    // (dd12 + pl07's drop 1) and the decontam rare-shingle postings
    ("stdCorpusExact", Dedup.stdCorpusExact, Dedup.stdCorpusExactFresh),
    ("stdCorpusPostings", Dedup.stdCorpusPostings, Dedup.stdCorpusPostingsFresh),
    ("stdRare", Dedup.stdRare, Dedup.stdRareFresh),
    ("stdVocabDf", Dedup.stdVocabDfStored _, Dedup.stdVocabDfFresh _),
    ("stdEc", Dedup.stdEc, Dedup.stdEcFresh),
    ("rareShingles", Decontam.rareShingles, Decontam.rareShinglesFresh),
    ("mvDelta",
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        StageStore.table(s, d, "mvdelta")(Relational.mvDeltaFresh(s, d)),
      Relational.mvDeltaFresh _),
    ("edges50", (s: org.apache.spark.sql.SparkSession, d: String) => Graph.edges(s, d),
      (s: org.apache.spark.sql.SparkSession, d: String) => Graph.edgesFresh(s, d)),
    ("edges75",
      (s: org.apache.spark.sql.SparkSession, d: String) => Graph.edges(s, d, Graph.CondensationQ),
      (s: org.apache.spark.sql.SparkSession, d: String) => Graph.edgesFresh(s, d, Graph.CondensationQ)),
    // gr19's consumed labeling (the store wraps the fresh build inline)
    ("sccLabelsCond",
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        StageStore.table(s, d, "scclabcond")(Graph.sccLabels(s, d, Graph.CondensationQ)),
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        Graph.sccLabels(s, d, Graph.CondensationQ)))

  test("every memoized stage core serves exactly the fresh build's rows (sf0.001)") {
    for ((name, store, fresh) <- cores) {
      val got = rows(store(spark, sf0001))
      val want = rows(fresh(spark, sf0001))
      assert(got === want,
        s"$name: store diverged from fresh build — " +
          s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      assert(want.nonEmpty, s"$name: fresh build is empty — parity pin is vacuous")
    }
  }

  test("the store is a parquet read, not a re-derivation (plan pin, sf0.001)") {
    // second call must hit the DiskMemo holder and plan a bare file
    // scan of the store — zero scans of the documents table
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val served = TextAnalysis.filterVerdicts(spark, sf0001)
    val docScans = walk(served.queryExecution.executedPlan).count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    assert(docScans === 0,
      s"memoized filterVerdicts still scans documents ($docScans scans) — " +
        "the store read is not in effect")
  }
}

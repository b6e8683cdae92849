package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** pl01 pins (VERDICT r13 #2's "Done =" clause, literally):
  *
  *  1. every stage count in the manifest equals the standalone
  *     operators' outputs chained driver-side — the proof that the
  *     pipeline composes the SHIPPED stages instead of re-deriving
  *     them (tx12 histogram, dd08 keeper set, dc01 contaminated set,
  *     sp05 buckets, pk02 serpentine — all replayed here from the
  *     standalone query outputs / first principles);
  *  2. composing the stages does not multiply `documents` scans: the
  *     pl01 plan's scan count stays at-or-under the standalone
  *     stages' sum (a composition that re-scanned the corpus per
  *     stage would exceed it).
  */
class PipelineSpec extends AnyFunSuite {

  private def build(name: String) =
    graft.GraftQuery.all.find(_.name == name).get.build(spark, sf001)

  test("pl01: stage counts equal the standalone operators chained driver-side") {
    val manifest = build("pl01_corpus_build_manifest").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def stage(k: Int): Map[String, Long] =
      manifest.collect { case ((s, d), n) if s == k => d -> n }

    // standalone stage outputs
    val verdicts = build("tx12_filter_chain").select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keepers = build("dd08_dedup_keepers").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet
    val tokens = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap

    // the chain, driver-side
    val s1 = verdicts.collect { case (id, "kept") => id }.toSet
    val s2 = s1.intersect(keepers)
    val s3 = s2.diff(cont)

    assert(stage(0) === Map("docs_in" -> tokens.size.toLong))
    assert(stage(1) === verdicts.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    assert(stage(2) === Map("kept" -> s2.size.toLong,
      "duplicate" -> (s1.size - s2.size).toLong).filter(_._2 > 0))
    assert(stage(3) === Map("kept" -> s3.size.toLong,
      "contaminated" -> (s2.size - s3.size).toLong).filter(_._2 > 0))
    // genuine attrition at every gate, or the chain pins nothing
    assert(s1.size < tokens.size, "quality gate dropped nothing")
    assert(s2.size < s1.size, "dedup dropped nothing")
    assert(s3.size < s2.size, "decontamination dropped nothing")

    // stage 4: sp05's md5 bucket replayed on the survivors
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val expSplit = s3.toSeq.map(bucket).groupBy {
      case b if b < 80 => "train"
      case b if b < 90 => "val"
      case _ => "test"
    }.view.mapValues(_.size.toLong).toMap
    assert(stage(4) === expSplit)

    // stage 5: pk02's serpentine dealing replayed on the survivors
    val expShards = s3.toSeq.map(id => (tokens(id), id))
      .sortBy { case (t, id) => (-t, id) }.zipWithIndex
      .map { case (_, i) =>
        if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16
      }.groupBy(s => s"shard_$s").view.mapValues(_.size.toLong).toMap
    assert(stage(5) === expShards)

    // conservation: every stage's rows sum to its input universe
    assert(stage(1).values.sum === tokens.size.toLong)
    assert(stage(2).values.sum === s1.size.toLong)
    assert(stage(3).values.sum === s2.size.toLong)
    assert(stage(4).values.sum === s3.size.toLong)
    assert(stage(5).values.sum === s3.size.toLong)
  }

  test("pl04: model-gated stage counts equal the standalone operators chained driver-side; model gate differs from rule gate") {
    val manifest = build("pl04_model_gated_manifest").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def stage(k: Int): Map[String, Long] =
      manifest.collect { case ((s, d), n) if s == k => d -> n }

    // the gate, replayed end-to-end: md5 features + the SHIPPED
    // trained weights (perceptronEpochs is the tx22 core the query
    // calls), tx19's serving rule score >= 0
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val w = TextAnalysis.perceptronEpochs(spark, sf001)
      .last.select("w").collect()(0).getSeq[Long](0).toVector
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tokens = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val ruleKeep = build("tx12_filter_chain").select("doc_id", "keep").collect()
      .collect { case r if r.getInt(1) == 1 => r.getLong(0) }.toSet
    val scores = docs.map { case (id, text) =>
      val v = Array.fill(17)(0L); v(16) = 1L
      text.split(" ", -1).foreach { t =>
        v(Integer.parseInt(md5hex(t).take(4), 16) % 16) += 1
      }
      id -> v.toVector.zip(w).map { case (a, b) => a * b }.sum
    }.toMap
    // the budget-matched operating point: tx23's grid, keep-count
    // closest to the rule gate's keep-count, ties to the smaller k
    val (lo, hi) = (scores.values.min, scores.values.max)
    val thetaStar = (1 to 5).map { k =>
      val theta = lo + ((hi - lo) * k) / 6
      val keeps = scores.values.count(_ >= theta).toLong
      (math.abs(keeps - ruleKeep.size), k, theta)
    }.min._3
    val modelKeep = scores.collect { case (id, s) if s >= thetaStar => id }.toSet
    val keepers = build("dd08_dedup_keepers").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet
    val s1 = modelKeep
    val s2 = s1.intersect(keepers)
    val s3 = s2.diff(cont)

    assert(stage(0) === Map("docs_in" -> docs.length.toLong))
    assert(stage(1) === Map("model_keep" -> s1.size.toLong,
      "model_drop" -> (docs.length - s1.size).toLong).filter(_._2 > 0))
    assert(stage(2) === Map("kept" -> s2.size.toLong,
      "duplicate" -> (s1.size - s2.size).toLong).filter(_._2 > 0))
    assert(stage(3) === Map("kept" -> s3.size.toLong,
      "contaminated" -> (s2.size - s3.size).toLong).filter(_._2 > 0))
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100
    val expSplit = s3.toSeq.map(bucket).groupBy {
      case b if b < 80 => "train"
      case b if b < 90 => "val"
      case _ => "test"
    }.view.mapValues(_.size.toLong).toMap
    assert(stage(4) === expSplit)
    val expShards = s3.toSeq.map(id => (tokens(id), id))
      .sortBy { case (t, id) => (-t, id) }.zipWithIndex
      .map { case (_, i) =>
        if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16
      }.groupBy(s => s"shard_$s").view.mapValues(_.size.toLong).toMap
    assert(stage(5) === expShards)

    // this is a DIFFERENT pipeline, not pl01 renamed: the trained
    // model's keep set must genuinely disagree with tx12's rule set
    assert(modelKeep != ruleKeep,
      "the model gate admits exactly the rule gate's set — distillation pinned nothing")
    assert(s3.nonEmpty, "model-gated chain admitted nothing — every stage pin is vacuous")
  }

  test("pl02: incremental stage counts equal the standalone operators chained driver-side") {
    val manifest = build("pl02_incremental_manifest").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def stage(k: Int): Map[String, Long] =
      manifest.collect { case ((s, d), n) if s == k => d -> n }

    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val tokens = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    val di = tokens.keySet.filter(bucket(_) < 10)

    // standalone stage outputs
    val verdicts = build("tx12_filter_chain").select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val inc = build("dd12_incremental_dedup").select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet

    // the chain, driver-side
    val s1 = di.filter(verdicts(_) == "kept")
    val s2 = s1.filter(inc(_) == "new")
    val s3 = s2.diff(cont)

    assert(stage(0) === Map("drop_in" -> di.size.toLong))
    assert(stage(1) === di.toSeq.map(verdicts).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap)
    assert(stage(2) === s1.toSeq.map(inc).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap)
    assert(stage(3) === Map("clean" -> s3.size.toLong,
      "contaminated" -> (s2.size - s3.size).toLong).filter(_._2 > 0))
    val expShards = s3.toSeq.map(id => (tokens(id), id))
      .sortBy { case (t, id) => (-t, id) }.zipWithIndex
      .map { case (_, i) =>
        if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16
      }.groupBy(s => s"shard_$s").view.mapValues(_.size.toLong).toMap
    assert(stage(4) === expShards)
    assert(stage(5) === Map(
      "corpus_after" -> (tokens.keySet.count(bucket(_) >= 10) + s3.size).toLong))

    // conservation at every gate
    assert(stage(1).values.sum === di.size.toLong)
    assert(stage(2).values.sum === s1.size.toLong)
    assert(stage(3).values.sum === s2.size.toLong)
    assert(stage(4).values.sum === s3.size.toLong)

    // genuine admission decisions, or the delta card pins nothing:
    // the quality gate and the incremental dedup must both have
    // dropped AND admitted something within the drop
    assert(s1.nonEmpty && s1.size < di.size,
      s"quality gate trivial on the drop: ${s1.size}/${di.size}")
    assert(s2.nonEmpty && s2.size < s1.size,
      s"incremental dedup trivial on the drop: ${s2.size}/${s1.size}")
  }

  test("pl03: token conservation; rewrite stage counts equal standalone dd18; pack uses cleaned counts") {
    val manifest = build("pl03_rewrite_manifest").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def stage(k: Int): Map[String, Long] =
      manifest.collect { case ((s, d), n) if s == k => d -> n }

    // standalone stage outputs
    val verdicts = build("tx12_filter_chain")
      .select("doc_id", "n_tokens", "reason").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    val dd18 = build("dd18_span_removal")
      .select("doc_id", "n_tokens", "n_removed").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet

    val s1 = verdicts.collect { case (id, (_, "kept")) => id }.toSet
    val removed = s1.toSeq.map(id => id -> dd18.get(id).map(_._2).getOrElse(0L)).toMap
    val s2 = s1.diff(cont)

    // rewrite stage counts vs standalone dd18, restricted to survivors
    val rewritten = s1.count(removed(_) > 0).toLong
    assert(stage(2) === Map("rewritten" -> rewritten,
      "untouched" -> (s1.size - rewritten),
      "tokens_removed" -> s1.toSeq.map(removed).sum))
    // non-vacuous both ways, or the stage audits nothing
    assert(rewritten > 0, "no quality survivor was rewritten")
    assert(rewritten < s1.size, "every survivor was rewritten")

    // token conservation: standalone dd18's cleaned text length equals
    // original - removed for every rewritten survivor (the rewrite and
    // the manifest's arithmetic agree doc-by-doc)
    val cleanedLen = build("dd18_span_removal")
      .select("doc_id", "cleaned").collect()
      .map(r => r.getLong(0) ->
        (if (r.getString(1).isEmpty) 0L
         else r.getString(1).split(" ", -1).length.toLong)).toMap
    s1.filter(removed(_) > 0).foreach { id =>
      assert(cleanedLen(id) === dd18(id)._1 - dd18(id)._2,
        s"doc $id: cleaned token count != original - removed")
    }

    // a rewrite drops no docs: stage 3 conserves stage 1's keep count
    assert(stage(3).values.sum === s1.size.toLong)
    assert(stage(4).values.sum === s2.size.toLong)

    // the pack runs on CLEANED counts: serpentine replay over
    // (n_tokens - n_removed) must equal the shard loads, and differ
    // from the original-count packing somewhere (the variant's point)
    def shardsOf(tokens: Map[Long, Long]): Map[String, Long] =
      s2.toSeq.map(id => (tokens(id), id))
        .sortBy { case (t, id) => (-t, id) }.zipWithIndex
        .map { case (_, i) => if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16 }
        .groupBy(sh => s"shard_$sh").view.mapValues(_.size.toLong).toMap
    val cleanCounts = s2.toSeq.map(id => id -> (verdicts(id)._1 - removed(id))).toMap
    assert(stage(5) === shardsOf(cleanCounts))
    val origOrder = s2.toSeq.map(id => (verdicts(id)._1, id)).sortBy { case (t, id) => (-t, id) }
    val cleanOrder = s2.toSeq.map(id => (cleanCounts(id), id)).sortBy { case (t, id) => (-t, id) }
    assert(origOrder.map(_._2) !== cleanOrder.map(_._2),
      "cleaned-count packing ordered identically to original-count packing — the variant changes nothing on this fixture")
  }

  test("pl05: combined rewrite — family lines equal the factored cores; union is the interval merge; pack on combined-clean counts") {
    val manifest = build("pl05_combined_rewrite_manifest").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    def stage(k: Int): Map[String, Long] =
      manifest.collect { case ((s, d), n) if s == k => d -> n }

    val verdicts = build("tx12_filter_chain")
      .select("doc_id", "n_tokens", "reason").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    // the factored cores themselves (each pinned against a sequential
    // walk in DedupSpec) — pl05's claim is about their COMPOSITION
    val xp = Dedup.spanDrops(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val ip = Dedup.intraDrops(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet

    val s1 = verdicts.collect { case (id, (_, "kept")) => id }.toSet
    def perDoc(cut: Set[(Long, Long)]): Map[Long, Long] =
      cut.groupBy(_._1).view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val (crossN, intraN, unionN) = (perDoc(xp), perDoc(ip), perDoc(xp ++ ip))

    // stage 2: family attribution + the merged line, survivor-scoped
    val rewritten = s1.count(unionN(_) > 0).toLong
    assert(stage(2) === Map(
      "rewritten" -> rewritten,
      "untouched" -> (s1.size - rewritten),
      "tokens_removed_crossdoc" -> s1.toSeq.map(crossN).sum,
      "tokens_removed_intradoc" -> s1.toSeq.map(intraN).sum,
      "tokens_removed" -> s1.toSeq.map(unionN).sum))
    // the union IS the interval merge: never more than the family sum
    assert(stage(2)("tokens_removed") <=
      stage(2)("tokens_removed_crossdoc") + stage(2)("tokens_removed_intradoc"))
    // both families live on the survivors, or one attribution line is decoration
    assert(s1.exists(crossN(_) > 0), "no cross-doc cut survived the quality gate")
    assert(s1.exists(intraN(_) > 0), "no intra-doc cut survived the quality gate")
    assert(rewritten < s1.size, "every survivor was rewritten")

    // a rewrite drops no docs; downstream conserves
    assert(stage(3).values.sum === s1.size.toLong)
    val s2 = s1.diff(cont)
    assert(stage(4).values.sum === s2.size.toLong)

    // pack on COMBINED cleaned counts (token conservation: clean =
    // original - union removed, per doc, by the serpentine replay)
    def shardsOf(tokens: Map[Long, Long]): Map[String, Long] =
      s2.toSeq.map(id => (tokens(id), id))
        .sortBy { case (t, id) => (-t, id) }.zipWithIndex
        .map { case (_, i) => if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16 }
        .groupBy(sh => s"shard_$sh").view.mapValues(_.size.toLong).toMap
    val cleanCounts = s2.toSeq.map(id => id -> (verdicts(id)._1 - unionN(id))).toMap
    assert(stage(5) === shardsOf(cleanCounts))
  }

  test("pl06: unit-priced shards — clean units replayed from the vocab; deal diverges from token pricing") {
    val out = build("pl06_unit_priced_shards").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val verdicts = build("tx12_filter_chain")
      .select("doc_id", "n_tokens", "reason").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    val xp = Dedup.spanDrops(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val ip = Dedup.intraDrops(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val cont = build("dc01_benchmark_overlap").select("train_doc").collect()
      .map(_.getLong(0)).toSet
    // the factored unit vocabulary — tx21's own per-word pricing
    val uv = TextAnalysis.bpeUnitVocab(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val texts = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val s1 = verdicts.collect { case (id, (_, "kept")) => id }.toSet
    val s2 = s1.diff(cont)
    val cutByDoc = (xp ++ ip).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
    // clean pricing replayed from raw text: skip cut positions (1-based),
    // price survivors through the vocab (non-alpha words 1 unit)
    def cleanOf(id: Long): (Long, Long) = {
      val kept = texts(id).split(" ", -1).zipWithIndex
        .collect { case (t, i) if !cutByDoc(id).contains(i + 1L) => t }
      (kept.map(t => uv.getOrElse(t, 1L)).sum, kept.length.toLong)
    }
    val clean = s2.toSeq.map(id => id -> cleanOf(id)).toMap
    def serpentine(price: Long => Long): Map[Long, Int] =
      s2.toSeq.map(id => (price(id), id)).sortBy { case (u, id) => (-u, id) }
        .zipWithIndex.map { case ((_, id), i) =>
          id -> (if ((i / 16) % 2 == 0) i % 16 else 15 - i % 16)
        }.toMap
    val deal = serpentine(clean(_)._1)
    val expected = deal.groupBy(_._2).map { case (sh, m) =>
      sh -> ((m.size.toLong,
        m.keys.toSeq.map(clean(_)._1).sum, m.keys.toSeq.map(clean(_)._2).sum))
    }
    assert(out === expected)

    // token identity with pl05's packing input: clean tokens are
    // exactly n_tokens - union removed, per doc (the drop-sized
    // subtraction and the raw-text replay agree)
    s2.foreach { id =>
      assert(clean(id)._2 === verdicts(id)._1 - cutByDoc(id).size.toLong)
    }
    // the re-base claim: pricing in units genuinely moves documents
    // relative to pl05's clean-token deal, or pl06 pins nothing
    val tokenDeal = serpentine(clean(_)._2)
    assert(s2.exists(id => deal(id) != tokenDeal(id)),
      "unit pricing never moved a doc off the token-priced deal")
  }

  test("pl01: no stage re-scans documents — the manifest plan carries exactly one live scan") {
    // In the shipped (checkpointing) mode, every stage core executes
    // exactly once, at its Materialize boundary, during build — the
    // stage cores ARE the factored standalone functions, so their
    // per-stage scan budget is the standalone operators' own (pinned
    // by their plans; composition cannot change a function it merely
    // calls). What composition COULD add is re-scans in the manifest
    // assembly: every downstream consumer (stage counters 1-5, the
    // chaining joins, the serpentine pack) must read the pinned stage
    // outputs, never the corpus again. Pin exactly that: the final
    // manifest plan contains ONE live documents scan — st0's docs_in
    // counter — and checkpoint leaves everywhere else. (A plan-tree
    // count in non-checkpointing mode is the wrong measurement here:
    // logical plan REUSE duplicates subtrees textually — 62 scans for
    // this DAG — while executing each pinned stage once.)
    // structural count, not a grep of the rendered plan (ADVICE r14):
    // walk the physical tree — descending into AQE wrappers and
    // expression subqueries — and count FileSourceScanExec leaves whose
    // file location is the documents table; string-matching the
    // rendered plan is brittle to Spark/AQE format changes.
    import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Seq.empty
      }) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    val nodes = walk(build("pl01_corpus_build_manifest").queryExecution.executedPlan)
    val docScans = nodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    assert(docScans === 1,
      s"pl01's manifest plan carries $docScans live documents scans — expected exactly " +
        "the docs_in counter; a second scan means a stage consumer bypassed its checkpoint")
    assert(nodes.exists(_.isInstanceOf[RDDScanExec]),
      "no checkpoint leaves in the manifest plan — stage pinning is not in effect")
  }
}

package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  test("minhash LSH recovers the exact ngram-jaccard near-dup pairs (sf0.01)") {
    val gt = byName("dd05_ngram_jaccard_pairs").build(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = byName("dd03_minhash_lsh_pairs").build(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gt.nonEmpty, "fixture should contain planted near-dups")
    val recall = (gt & mh).size.toDouble / gt.size
    assert(recall >= 0.9, s"minhash recall $recall too low; gt=${gt.size} mh=${mh.size}")
  }

  test("simhash pairs are near-dups-heavy at hamming<=3 (sf0.01)") {
    val gt = byName("dd05_ngram_jaccard_pairs").build(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = byName("dd04_simhash_pairs").build(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at 64-bit simhash over short bag-of-words docs the separation is
    // imperfect; require that we at least recover a majority of planted dups
    val recall = (gt & sh).size.toDouble / gt.size
    assert(recall >= 0.5, s"simhash recall $recall; gt=${gt.size} sh=${sh.size}")
  }

  test("embedding LSH recovers strong exact near-dup pairs (sf0.01)") {
    // ground truth: the test-only O(n²) exact scan; strong pairs
    // (sim >= 0.6) must be recovered by the banded candidate path
    val exact = Dedup.exactEmbeddingPairs(spark, sf001, 0.45)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val strong = exact.filter(_._2 >= 0.6).map(_._1).toSet
    val lsh = byName("dd06_embedding_neardup_lsh").build(spark, sf001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain exact near-dup pairs")
    // every LSH-confirmed pair must be a true exact pair (precision 1.0:
    // rerank is exact cosine at the same threshold)
    assert(lsh.subsetOf(exact.map(_._1).toSet), "LSH emitted a non-near-dup pair")
    if (strong.nonEmpty) {
      val recall = (strong & lsh).size.toDouble / strong.size
      assert(recall >= 0.6, s"strong-pair recall $recall; strong=${strong.size} lsh=${lsh.size}")
    }
  }

  test("exact dedup keeps one row per distinct text (sf0.001)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val distinctTexts = docs.select("text").distinct().count()
    val deduped = byName("dd01_exact_dedup").build(spark, sf0001).count()
    assert(deduped === distinctTexts)
  }

  test("dd11 chunk dedup matches a driver-side reference and finds real shared spans (sf0.01)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // reference: same 50-token/stride-40 windows, distinct fps per doc
    val perDoc = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val starts = 0 to math.max(w.length - 1, 0) by 40
      id -> starts.map(s => md5hex(w.slice(s, s + 50).mkString(" "))).toSet
    }.toMap
    val fpDocs = perDoc.toSeq.flatMap { case (id, fps) => fps.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = perDoc.map { case (id, fps) =>
      id -> (fps.size.toLong, fps.count(fpDocs(_) >= 2).toLong)
    }
    val got = byName("dd11_chunk_dedup").build(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, "chunk dedup diverged from the sequential reference")
    assert(expect.values.exists(_._2 > 0),
      "fixture has no cross-doc shared chunk — the audit is vacuous")
    assert(expect.values.exists(v => v._2 == 0L),
      "every doc shares a chunk — the audit cannot discriminate")
  }

  test("dd13 duplicate spans match a sequential gaps-and-islands reference (sf0.01)") {
    import graft.operators.Dedup.{DfCap, MinSpan, SpanK}
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // reference: same positional k-grams, same df cap, runs found by
    // scanning sorted positions per (pair, offset) — no window function
    val grams: Seq[(Long, Int, String)] = docs.toSeq.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length < SpanK) Seq.empty[(Long, Int, String)]
      else w.sliding(SpanK).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }.toSeq
    }
    val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val rare = grams.filter(g => freq(g._3) <= DfCap)
    val runs = rare.groupBy(_._3).values.toSeq.flatMap { occ =>
      for {
        (da, pa, _) <- occ; (db, pb, _) <- occ
        if da < db
      } yield ((da, db, pa - pb), pa)
    }.groupBy(_._1).toSeq.flatMap { case ((da, db, _), ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      // split into maximal consecutive runs
      sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }.map(r => ((da, db), r.size + SpanK - 1))
    }
    val expect = runs.filter(_._2 >= MinSpan).groupBy(_._1).map { case (k, v) =>
      k -> (v.size.toLong, v.map(_._2).max.toLong, v.map(_._2.toLong).sum)
    }
    val got = byName("dd13_duplicate_spans").build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect, s"duplicate spans diverged from the sequential reference: " +
      s"extra=${got.toSet -- expect.toSet} missing=${expect.toSet -- got.toSet}")
    assert(expect.nonEmpty, "fixture has no shared span >= MinSpan — detector is vacuous")
    assert(expect.size < docs.length * (docs.length - 1) / 2,
      "every pair shares a span — detector cannot discriminate")
    assert(expect.values.exists(_._2 >= 2 * MinSpan),
      "no long span found — the injected boilerplate is not being recovered")
  }

  test("dd18 span removal matches a sequential rewrite reference; canonical copy survives (sf0.01)") {
    import graft.operators.Dedup.{DfCap, MinSpan, SpanK}
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val byId = docs.toMap
    // same positional-gram + df-cap + islands reference as the dd13
    // test, extended to the db-side intervals the rewrite cuts
    val grams: Seq[(Long, Int, String)] = docs.toSeq.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length < SpanK) Seq.empty[(Long, Int, String)]
      else w.sliding(SpanK).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }.toSeq
    }
    val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val rare = grams.filter(g => freq(g._3) <= DfCap)
    val intervals: Seq[(Long, Int, Int)] = rare.groupBy(_._3).values.toSeq.flatMap { occ =>
      for {
        (da, pa, _) <- occ; (db, pb, _) <- occ
        if da < db
      } yield ((da, db, pa - pb), pa)
    }.groupBy(_._1).toSeq.flatMap { case ((_, db, off), ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), p) if h.head == p - 1 => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }.map { r =>
        val span = r.size + SpanK - 1
        val s = r.min - off
        (db, s, s + span - 1, span)
      }
    }.collect { case (db, s, e, span) if span >= MinSpan => (db, s, e) }
    // position-grain union == interval merge at token resolution
    val dropSet: Map[Long, Set[Int]] = intervals.groupBy(_._1).view
      .mapValues(_.flatMap(iv => iv._2 to iv._3).toSet).toMap
    val expect = dropSet.map { case (id, drop) =>
      val w = byId(id).split(" ", -1)
      val kept = w.zipWithIndex.collect { case (t, i) if !drop(i + 1) => t }
      id -> (w.length.toLong, drop.size.toLong, kept.mkString(" "))
    }
    val got = byName("dd18_span_removal").build(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expect, s"rewrite diverged from the sequential reference: " +
      s"extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet} " +
      s"changed=${expect.keySet.intersect(got.keySet).filter(k => expect(k) != got(k))}")
    assert(expect.nonEmpty, "fixture has no span >= MinSpan to cut — rewrite is vacuous")
    assert(got.values.forall(_._2 > 0), "an unaffected doc leaked into the rewrite report")
    // canonical retention (the Lee et al. keep-one contract): every cut
    // interval's token sequence must still exist VERBATIM in some
    // lower-id doc — the corpus never loses the text, only the copies
    intervals.foreach { case (db, s, e) =>
      val cut = byId(db).split(" ", -1).slice(s - 1, e).toSeq
      val survives = docs.exists { case (id, text) =>
        id < db && text.split(" ", -1).sliding(cut.length).exists(_.sameElements(cut))
      }
      assert(survives, s"cut span [$s,$e] of doc $db survives in no lower-id doc")
    }
  }

  test("dd19 intra-doc repeat scrub matches a sequential seen-set walk; both polarities; cut grams occur earlier (sf0.01)") {
    import graft.operators.Dedup.IntraK
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      if (w.length < IntraK) None
      else {
        val seen = scala.collection.mutable.Set.empty[Seq[String]]
        val drop = scala.collection.mutable.Set.empty[Int]
        for (i <- 0 to w.length - IntraK) {
          val g = w.slice(i, i + IntraK).toSeq
          // later occurrence of an already-seen gram: cut its positions
          // (1-indexed i+1 .. i+IntraK); first occurrence registers only
          if (seen(g)) (i + 1 to i + IntraK).foreach(drop += _)
          else seen += g
        }
        if (drop.isEmpty) None
        else {
          val kept = w.zipWithIndex.collect { case (t, j) if !drop(j + 1) => t }
          Some(id -> ((w.length.toLong, drop.size.toLong, kept.mkString(" "))))
        }
      }
    }.toMap
    val got = byName("dd19_intradoc_repeat_scrub").build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect, s"scrub diverged from the sequential walk: " +
      s"extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet} " +
      s"changed=${expect.keySet.intersect(got.keySet).filter(k => expect(k) != got(k))}")
    // both polarities: repetition exists, and most docs are untouched
    assert(expect.nonEmpty, "fixture has no intra-doc repeated gram — scrub is vacuous")
    assert(expect.size < docs.length, "every doc repeats itself — the clean polarity is vacuous")
    assert(got.values.forall(_._2 > 0), "an unaffected doc leaked into the rewrite report")
    // retention: every cut position sits inside a later occurrence of a
    // gram that appears verbatim earlier in the SAME doc. got == expect
    // (above) pins the query's cut set to the walk's, so checking the
    // walk's drop set against the RAW TEXT checks the query's: if both
    // walk and query ever flipped to drop-FIRST-occurrence, got==expect
    // would still pass but this would fail (no earlier verbatim copy).
    for ((id, _) <- expect.take(10)) {
      val w = docs.toMap.apply(id).split(" ", -1)
      val seen = scala.collection.mutable.Set.empty[Seq[String]]
      val drop = scala.collection.mutable.Set.empty[Int]
      for (i <- 0 to w.length - IntraK) {
        val g = w.slice(i, i + IntraK).toSeq
        if (seen(g)) (i + 1 to i + IntraK).foreach(drop += _) else seen += g
      }
      for (p <- drop) {
        val covered = (math.max(0, p - IntraK) to math.min(p - 1, w.length - IntraK))
          .exists { s => // 0-indexed gram start covering 1-indexed pos p
            val g = w.slice(s, s + IntraK)
            (s + 1 <= p && p <= s + IntraK) &&
              (0 until s).exists(e => w.slice(e, e + IntraK).sameElements(g))
          }
        assert(covered,
          s"doc $id cut pos $p has no covering gram with an earlier verbatim copy")
      }
    }
  }

  test("dd20 banding sweep: monotone cost/catch, bounded, shipped (8,4) endpoints equal dd03/dd05 (sf0.01)") {
    val rows = byName("dd20_banding_sweep").build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === Set((4, 8), (8, 4), (16, 2)))
    val Seq(a, b, c) = Seq((4, 8), (8, 4), (16, 2)).map(rows)
    // one truth, shared across the sweep
    assert(a._2 == b._2 && b._2 == c._2, "truth must be computed once and shared")
    // candidate cost monotone as rows shrink, strictly at the (16,2)
    // end (at this sf the j~1 clones make (4,8) and (8,4) coincide —
    // the strictness lives where the accidental-collision floor rises)
    assert(a._1 <= b._1 && b._1 < c._1,
      s"candidate counts not monotone: ${a._1}, ${b._1}, ${c._1}")
    // catches monotone, bounded by truth and by candidates
    assert(a._3 <= b._3 && b._3 <= c._3, "catches must be non-decreasing")
    Seq(a, b, c).foreach { case (nc, nt, ng) =>
      assert(ng <= nt && ng <= nc, "caught must be bounded by truth and candidates")
    }
    // shipped-config endpoints: dd03's emitted pairs are its (8,4)
    // candidates AFTER the est-Jaccard >= 0.5 score filter — a subset
    // of the sweep's raw candidate count — and the sweep's truth IS
    // dd05's >= 0.8 pair set (computed by the same factored core)
    val dd03 = byName("dd03_minhash_lsh_pairs").build(spark, sf001)
      .select("doc_a", "doc_b").collect().length.toLong
    val dd05 = byName("dd05_ngram_jaccard_pairs").build(spark, sf001)
      .collect().length.toLong
    assert(b._1 >= dd03, "sweep (8,4) raw candidates fewer than dd03's scored pairs")
    assert(b._2 === dd05, "sweep truth count != dd05's shipped >=0.8 pairs")
  }

  test("dd21 tuned banding: the choice replays the decision rule over dd20's sweep; pairs == the shipped generator at the chosen config (sf0.01)") {
    // driver-side replay of the rule: among max-catch configs, fewest
    // candidates, tiebreak bands ascending — over the SHIPPED sweep
    val sweep = byName("dd20_banding_sweep").build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    val maxCatch = sweep.map(_._4).max
    val expect = sweep.filter(_._4 == maxCatch)
      .sortBy(t => (t._3, t._1)).head
    val got = byName("dd21_tuned_banding").build(spark, sf001).collect()
    assert(got.nonEmpty, "tuned banding emitted no pairs — the identity pin is vacuous")
    val chosen = got.map(r => (r.getInt(0), r.getInt(1))).distinct
    assert(chosen === Array((expect._1, expect._2)),
      s"dd21 chose ${chosen.toSeq}, the rule replay says (${expect._1}, ${expect._2})")

    // the pairs are the SHIPPED dd03 product at the chosen config: when
    // the rule lands on (8,4) that is dd03 row-for-row; otherwise
    // compare against dd03's scoring over the chosen config's band
    // candidates (same factored generator the sweep materializes)
    val pairs = got.map(r => (r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    if (chosen.head == ((8, 4))) {
      val dd03 = byName("dd03_minhash_lsh_pairs").build(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs === dd03, "choice landed on (8,4) but pairs != dd03")
    } else {
      val bs = Dedup.bandingSweep(spark, sf001)
      val cand = bs.cands.find(c => (c._1, c._2) == chosen.head).get._3
      val replay = cand
        .join(bs.sigs.selectExpr("doc_id AS doc_a", "sig AS sig_a"), "doc_a")
        .join(bs.sigs.selectExpr("doc_id AS doc_b", "sig AS sig_b"), "doc_b")
        .selectExpr("doc_a", "doc_b",
          "CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS DOUBLE) / 32 AS est_jaccard")
        .where("est_jaccard >= 0.5").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairs === replay,
        s"pairs != the shipped generator scored at the chosen config ${chosen.head}")
    }
  }

  test("dd14 pointer-jumping clusters are row-identical to dd07 (sf0.01)") {
    // two loops (min-label propagation vs pointer jumping), two round
    // complexities (diameter vs log n), one fixpoint — any divergence
    // is a bug in one of them
    def rows(name: String) = byName(name).build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d7 = rows("dd07_dedup_clusters")
    val d14 = rows("dd14_clusters_ptrjump")
    assert(d14 == d7,
      s"dd14 diverged from dd07: extra=${d14 -- d7} missing=${d7 -- d14}")
    assert(d7.nonEmpty, "no clusters — equivalence pin is vacuous")
  }

  test("dd12 incremental dedup: exact verdicts match a driver-side model; near/new occur (sf0.01)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // driver twin of Sampling.bucket100: first 8 md5 hex chars of the
    // stringified key, parsed base-16, mod 100
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 100
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val (inc, corp) = docs.partition { case (id, _) => bucket(id) < 10 }
    assert(inc.nonEmpty && corp.nonEmpty, "split degenerate at fixture scale")
    val corpMinByFp = corp.groupBy { case (_, t) => md5hex(t) }
      .view.mapValues(_.map(_._1).min).toMap
    val expectedExact = inc.flatMap { case (id, t) =>
      corpMinByFp.get(md5hex(t)).map(id -> _)
    }.toMap
    val rows = byName("dd12_incremental_dedup").build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // exactly one verdict per incoming doc
    assert(rows.map(_._1).toSet == inc.map(_._1).toSet && rows.length == inc.size)
    // the exact_dup set and its match ids ARE the byte-identity model
    val gotExact = rows.collect { case (id, "exact_dup", m) => id -> m.get }.toMap
    assert(gotExact == expectedExact,
      s"exact verdicts diverged: got=${gotExact.size} expected=${expectedExact.size}")
    // every match id points INTO the corpus split (provenance audit)
    val corpIds = corp.map(_._1).toSet
    rows.foreach { case (id, v, m) =>
      if (v == "new") assert(m.isEmpty, s"doc $id: new with a match_id")
      else assert(m.exists(corpIds), s"doc $id: $v match outside the corpus split")
    }
    // near_dup and new both occur on fixture data; exact_dup CANNOT
    // (checked: zero byte-identical clone families at sf0.01) — the
    // exact branch is driven by the synthetic-frame test below
    val verdicts = rows.map(_._2).toSet
    assert(Set("near_dup", "new").subsetOf(verdicts),
      s"fixture exercises only $verdicts")
    assert(expectedExact.isEmpty,
      "fixture grew byte-identical cross-split clones — strengthen this pin to all-three")
  }

  test("dd12 exact branch: a byte-identical cross-split clone verdicts exact_dup") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 100
    // find real ids on each side of the split (no fixture data involved)
    val incIds = (1L to 500L).filter(bucket(_) < 10)
    val corpIds = (1L to 500L).filter(bucket(_) >= 10)
    val clone = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearA = "one two three four five six seven eight nine ten eleven twelve"
    val nearB = "one two three four five six seven eight nine ten eleven thirteen"
    val fresh = "completely unrelated words that match nothing in the corpus side"
    val rows = Seq(
      (incIds(0), clone),  // exact: byte-identical twin in corpus
      (incIds(1), nearA),  // near: trigram jaccard vs nearB > 0.8
      (incIds(2), fresh),  // new: nothing matches
      (corpIds(0), clone),
      (corpIds(1), nearB))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = Dedup.incrementalVerdicts(spark, df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(incIds(0)) == (("exact_dup", Some(corpIds(0)))))
    assert(got(incIds(1)) == (("near_dup", Some(corpIds(1)))))
    assert(got(incIds(2)) == (("new", None)))
  }

  test("min-label propagation labels a long chain correctly when the cap suffices") {
    import spark.implicits._
    // a 30-vertex path graph: diameter 29, worst case for label hops —
    // one-hop-per-round propagation still converges in ~15 rounds
    // because the min label travels from BOTH endpoints of every edge
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.minLabelClusters(chain, maxRounds = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 30)
    assert(labels.values.toSet === Set(0L), "one component, min-id label 0")
    // two disjoint chains keep distinct labels
    val two = ((0L until 5L).map(i => (i, i + 1)) ++
      (100L until 105L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val twoLabels = Dedup.minLabelClusters(two, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoLabels.filter(_._1 < 100).values.toSet === Set(0L))
    assert(twoLabels.filter(_._1 >= 100).values.toSet === Set(100L))
  }

  test("min-label propagation matches a union-find model on random graphs") {
    import spark.implicits._
    // fixed-seed random graphs: every component label must equal the
    // component's min vertex id per an independent union-find model —
    // exercises odd/even diameters across the two-hop-per-checkpoint
    // loop (an off-by-one in its convergence probe would show here)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nVerts = 40
      val edges = (1 to 50).map { _ =>
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong)
      }.filter { case (a, b) => a != b }
      // union-find ground truth
      val parent = Array.tabulate(nVerts)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
      val inEdges = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val want = inEdges.map { v =>
        val root = find(v.toInt)
        v -> inEdges.filter(u => find(u.toInt) == root).min
      }.toMap
      val got = Dedup.minLabelClusters(edges.toDF("doc_a", "doc_b"), maxRounds = 80)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial: labels disagree with union-find")
    }
  }

  test("min-label propagation FAILS LOUDLY when the round cap is hit un-converged") {
    import spark.implicits._
    // diameter 29 cannot converge in 3 rounds — must throw, never emit
    // labels that disagree with the oracle's transitive closure
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      Dedup.minLabelClusters(chain, maxRounds = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("dd10 recall audit: internally consistent and truth-complete vs dd05 (sf0.01)") {
    val audit = byName("dd10_lsh_recall").build(spark, sf001).collect()
    assert(audit.nonEmpty, "fixture should contain planted near-dups")
    audit.foreach { r =>
      val nTrue = r.getLong(r.fieldIndex("n_true"))
      val nCaught = r.getLong(r.fieldIndex("n_caught"))
      assert(nCaught <= nTrue, s"caught $nCaught > true $nTrue")
      assert(r.getDouble(r.fieldIndex("recall")) === nCaught.toDouble / nTrue)
    }
    // every dd05 truth pair lands in exactly one decile row — the audit
    // may never lose (or invent) ground truth
    val total = audit.map(r => r.getLong(r.fieldIndex("n_true"))).sum
    val dd05 = byName("dd05_ngram_jaccard_pairs").build(spark, sf001).count()
    assert(total === dd05, s"audit covers $total truth pairs, dd05 has $dd05")
  }

  test("dd15: bloom reaches the incoming scan, answer equals the bloom-free form, non-vacuous") {
    import org.apache.spark.sql.functions.{col, concat_ws, explode, expr, greatest, md5, size, slice, split}
    val df = byName("dd15_bloom_incremental").build(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the incoming side:\n${plan.take(2000)}")
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // bloom-free reference: the same chunk split computed directly
    val ch = graft.Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(0, greatest(n - 1, 0), 40)")).as("start"))
      .select(col("doc_id"),
        md5(concat_ws(" ", expr("slice(w, start + 1, 50)"))).as("fp"))
      .distinct()
      .withColumn("bkt", expr(graft.operators.Sampling.bucket100("doc_id")))
    val inc = ch.filter(col("bkt") < 10).select("doc_id", "fp")
    val corp = ch.filter(col("bkt") >= 10).select("fp").distinct()
    val known = inc.join(corp, Seq("fp"), "left_semi")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = inc.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === totals.map { case (d, n) => d -> ((n, known.getOrElse(d, 0L))) },
      "bloom-prefiltered result diverged from the exact membership")
    // non-vacuity: the fixture genuinely shares chunks across the split
    // (a 0-known-everywhere pass would make the oracle equality empty)
    assert(got.values.map(_._2).sum > 0L, "no cross-split chunk matches — dd15 is vacuous")
  }

  test("dd16: every injected typo recovers its registry row; near-miss extras survive") {
    val rows = byName("dd16_fuzzy_linkage").build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "no linkage candidates — blocking or injection broke")
    // ground truth: every dirty record was manufactured from its own
    // registry row by ONE deletion, so (dirty_id, dirty_id, 1) must be
    // present for every distinct dirty_id — 100% recovery
    val dirtyIds = rows.map(_._1).distinct
    dirtyIds.foreach { id =>
      assert(rows.contains((id, id, 1)),
        s"dirty record $id failed to recover its own registry row at distance 1")
    }
    // distances honor the threshold and the self-match is never 0
    // (the corruption genuinely changed the string)
    assert(rows.forall(_._3 <= 1), "a candidate past the threshold leaked through")
    assert(rows.filter(r => r._1 == r._2).forall(_._3 === 1),
      "a self-match at distance 0 means the injection was a no-op")
    // adjudication input preserved: ties/extras are kept, not collapsed
    // (blocking + <=1 admits genuine near-misses on this corpus)
    assert(rows.length >= dirtyIds.length,
      "matches were collapsed — the adjudication layer needs all candidates")
  }

  test("dd17: multi-key blocking recovers EVERY deletion position — incl. position 1 and the final char") {
    val rows = byName("dd17_multikey_linkage").build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "no linkage candidates — blocking or injection broke")
    // replay the injection driver-side to know each dirty record's
    // deletion position (the whole point vs dd16: positions span 1..len)
    val d = graft.Tables.load(spark, sf001, "documents")
      .selectExpr("doc_id",
        "concat_ws(' ', slice(split(text, ' '), 1, 4)) AS name",
        graft.operators.Sampling.bucket100("doc_id") + " AS bkt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue))
    val positions = d.filter(t => t._3 < 10 && t._2.length >= 8).map { case (id, name, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> (1 + Integer.parseInt(hex.substring(8, 10), 16) % name.length, name.length)
    }.toMap
    // the hardening is non-vacuous only if the fixture actually deletes
    // at position 1 (first-char block blind) AND at the final position
    // (last-char block blind) — assert both injection classes exist
    assert(positions.values.exists(_._1 == 1),
      "no position-1 deletion in the fixture — the first-char blind spot is untested")
    assert(positions.values.exists(p => p._1 == p._2),
      "no final-position deletion in the fixture — the last-char blind spot is untested")
    // 100% recovery: EVERY dirty record — whatever its deletion position
    // — links back to its own registry row at distance 1
    positions.keys.foreach { id =>
      assert(rows.contains((id, id, 1)),
        s"dirty record $id (deletion pos ${positions(id)._1}/${positions(id)._2}) " +
          "failed to recover its own registry row")
    }
    assert(rows.forall(_._3 <= 1), "a candidate past the threshold leaked through")
    assert(rows.filter(r => r._1 == r._2).forall(_._3 === 1),
      "a self-match at distance 0 means the injection was a no-op")
    // block-bounded, never all-pairs: with two redundant single-char
    // blocking keys the candidate space is at most ~2/26ths of the
    // cross product (uniform-ish first/last chars); assert the emitted
    // pairs stay far under all-pairs as a coarse structural guard
    val regSize = d.count(_._2.length >= 8)
    assert(rows.length < positions.size.toLong * regSize / 4,
      "candidate volume approaches all-pairs — blocking is not bounding the join")
  }

  test("dd22: incremental clusters equal the union-graph union-find; extend and untouched polarities both non-vacuous") {
    def md5b(d: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(d.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16) % 100
    // the shipped edge universe, collected once
    val edges = Dedup.jaccardEdges(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val base = edges.filter { case (a, b) => md5b(a) < 50 && md5b(b) < 50 }
    val delta = edges.filterNot { case (a, b) => md5b(a) < 50 && md5b(b) < 50 }
    assert(base.nonEmpty && delta.nonEmpty, "split sides empty — pins vacuous")

    def uf(es: Seq[(Long, Long)], nodes: Set[Long]): Map[Long, Long] = {
      val p = scala.collection.mutable.Map(nodes.toSeq.map(v => v -> v): _*)
      def f(v: Long): Long = {
        var r = v; while (p(r) != r) r = p(r)
        var c = v; while (p(c) != r) { val n = p(c); p(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (f(a), f(b))
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(v => v -> f(v)).toMap
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val bverts = base.flatMap(e => Seq(e._1, e._2)).toSet
    val lb = uf(base, bverts)          // what the store holds (edge-verts)
    val lu = uf(edges, verts)          // the rebuild truth

    val got = byName("dd22_incremental_clusters").build(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === lu, "dd22 labels diverge from the union-graph union-find")

    // polarity 1 — the drop genuinely EXTENDS a multi-doc base cluster:
    // some delta edge endpoint sits in a base cluster of size >= 2
    val sizes = lb.values.groupBy(identity).view.mapValues(_.size).toMap
    val touched = delta.flatMap(e => Seq(e._1, e._2))
      .filter(lb.contains).map(lb).toSet
    assert(touched.exists(c => sizes(c) >= 2),
      "no multi-doc base cluster extended by the drop — the merge path is trivial")
    // polarity 2 — multi-doc base clusters untouched by any delta edge
    // (their labels pass through the store unread)
    val multi = sizes.collect { case (c, n) if n >= 2 => c }.toSet
    assert((multi -- touched).nonEmpty,
      "every multi-doc base cluster was touched — the pass-through is vacuous")
    // untouched clusters keep their stored labels verbatim
    (multi -- touched).foreach { c =>
      bverts.filter(lb(_) == c).foreach(v => assert(got(v) === c,
        s"untouched cluster $c changed its label for doc $v"))
    }
  }
}

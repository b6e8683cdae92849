package graft.operators

import graft.TestSpark._
import graft.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Semantic ground truth for the decontamination family: dc01's
  * df-capped broadcast shingle join must find EXACTLY the pairs a
  * naive per-document set-intersection finds, and dc02's purge must be
  * consistent with dc01's flags. DuckDB parity pins the values; this
  * pins the semantics against an independent driver-side formulation.
  */
class DecontamSpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  /** sp05's bucket, recomputed independently: first 8 hex chars of
    * md5(doc_id as string) parsed base-16, mod 100.
    */
  private def bucket(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 100
  }

  /** Distinct word trigrams, mirroring graft_shingles. */
  private def shingles(text: String): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  test("dc01 equals the naive cross-split rare-trigram intersection (sf0.001)") {
    val corpus = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    // corpus-wide document frequency, then the same df <= 50 cap
    val df = corpus.values.toSeq.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val rare = corpus.map { case (id, gs) => id -> gs.filter(df(_) <= 50) }
    val train = rare.keys.filter(bucket(_) < 80).toSeq
    val test = rare.keys.filter(bucket(_) >= 90).toSeq
    val expected = (for {
      tr <- train; te <- test
      n = (rare(tr) & rare(te)).size
      if n >= 3
    } yield (tr, te, n.toLong)).toSet
    val got = byName("dc01_benchmark_overlap").build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"dc01 diverged from ground truth: extra=${got -- expected} missing=${expected -- got}")
  }

  test("dc02 keeps exactly train minus dc01-flagged docs (sf0.001)") {
    val flagged = byName("dc01_benchmark_overlap").build(spark, sf0001)
      .select("train_doc").collect().map(_.getLong(0)).toSet
    val trainByLang = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => bucket(id) < 80 }
    val expected = trainByLang
      .filterNot { case (id, _) => flagged(id) }
      .groupBy(_._2).map { case (lang, xs) => lang -> xs.length.toLong }
    val got = byName("dc02_decontaminated_train").build(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"dc02 purge inconsistent with dc01 flags: got=$got expected=$expected")
  }

  test("dc04: precision exact vs all-pairs cosine truth; recall priced; clean rows explicit (sf0.01)") {
    import org.apache.spark.sql.functions.col
    // exact all-pairs ground truth, straight from the definition — the
    // O(test x train) scan the shipped LSH detector avoids
    val emb = Tables.load(spark, sf001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val train = emb.filter(t => bucket(t._1) < 80)
    val test = emb.filter(t => bucket(t._1) >= 90)
    val truth = test.map { case (tid, te) =>
      tid -> train.filter { case (_, tr) => cos(te, tr) >= 0.45 }.map(_._1).toSet
    }.toMap
    val got = byName("dc04_semantic_decontam").build(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // report covers EVERY test vector — clean rows explicit
    assert(got.keySet === test.map(_._1).toSet, "every held-out vector must be reported")
    // precision: the LSH + exact-rerank path can never flag a pair the
    // exact truth rejects (rerank IS the exact cosine)
    got.foreach { case (tid, n) =>
      assert(n <= truth(tid).size.toLong,
        s"test vec $tid: flagged $n > ${truth(tid).size} true matches — precision broken")
    }
    // recall priced: the bands recover the large majority of true
    // matches on this fixture (dd06's recall discipline cross-split)
    val trueTotal = truth.values.map(_.size).sum
    val gotTotal = got.values.sum
    assert(trueTotal > 0, "no cross-split semantic match — the audit is vacuous")
    assert(gotTotal.toDouble / trueTotal >= 0.6,
      s"LSH recall ${gotTotal.toDouble / trueTotal} too low (got $gotTotal of $trueTotal)")
    // both polarities: flagged and clean test vectors coexist
    assert(got.values.exists(_ > 0) && got.values.exists(_ == 0),
      "report cannot discriminate — all flagged or all clean")
  }

  test("dc05: sweep equals a replay over the factored pair counts; monotone; shipped row agrees with dc01 (sf0.01)") {
    val pc = Decontam.pairCounts(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = (1 to 5).map { t =>
      val f = pc.filter(_._3 >= t)
      t -> ((f.length.toLong, f.map(_._1).distinct.length.toLong,
        f.map(_._2).distinct.length.toLong))
    }.toMap
    val got = byName("dc05_overlap_threshold_sweep").build(spark, sf001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect, "dc05 diverged from the pair-count replay")
    // the curve genuinely trades: every column strictly decreases
    // somewhere and never increases
    val ordered = (1 to 5).map(got)
    for (Seq(a, b) <- ordered.sliding(2); i <- 0 until 3) {
      val (av, bv) = (Seq(a._1, a._2, a._3)(i), Seq(b._1, b._2, b._3)(i))
      assert(bv <= av, s"column $i rose as the threshold tightened")
    }
    assert(ordered.head._1 > ordered.last._1, "pair count flat across the sweep — no trade measured")
    // the shipped threshold's row IS dc01's flagged set, counted
    val dc01 = byName("dc01_benchmark_overlap").build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got(3)._1 === dc01.length.toLong, "thr=3 pair count disagrees with dc01")
    assert(got(3)._2 === dc01.map(_._1).distinct.length.toLong,
      "thr=3 tainted-train count disagrees with dc01")
  }

  test("dc06: the budget rule replays driver-side; endpoint identity with dc01 when the choice is 3 (sf0.01)") {
    // replay the purge-budget rule from the factored pair counts and
    // an independent train-split count: smallest thr 1..5 whose
    // tainted-train count stays within 10% of the split, fallback 5
    val pc = Decontam.pairCounts(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTrain = graft.Tables.load(spark, sf001, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < 80"))
      .count()
    val expectThr = (1 to 5).find { t =>
      pc.filter(_._3 >= t).map(_._1).distinct.length.toLong * 10 <= nTrain
    }.getOrElse(5)
    val rows = byName("dc06_tuned_overlap").build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "tuned purge emitted nothing")
    assert(rows.map(_._1).distinct.toSeq === Seq(expectThr),
      s"dc06 chose ${rows.map(_._1).distinct.toSeq}, rule replay says $expectThr " +
        "(and the choice must be uniform)")
    // endpoint identity: when the rule lands on the shipped constant,
    // the served pairs ARE dc01's flagged set row-for-row
    if (expectThr == 3) {
      val dc01 = byName("dc01_benchmark_overlap").build(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.map(t => (t._2, t._3, t._4)).toSet === dc01,
        "dc06's thr=3 pairs diverge from dc01")
    }
  }
}

package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** tx15 contract: per incoming doc, novelty = fraction of its distinct
  * word trigrams absent from the corpus split's vocabulary — replayed
  * here by a full driver-side model (split, shingling, membership), so
  * the hot/cold union join is proven semantically equal to the plain
  * membership the model computes.
  */
class TextNoveltySpec extends AnyFunSuite {

  test("tx17 coverage curve is monotone, bounded, and matches a driver count (sf0.01)") {
    val rows = graft.GraftQuery.all.find(_.name == "tx17_vocab_coverage").get
      .build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5, 10, 20))
    // monotone in k, bounded by 1, total constant across cuts
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 <= b._2 }, "not monotone")
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    assert(rows.map(_._3).distinct.length == 1, "total_tokens must not vary by cut")
    // driver-side replay: exact covered mass at each cut
    val freq = graft.Tables.load(spark, sf001, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    rows.foreach { case (k, covered, total, _) =>
      assert(covered == freq.take(k).map(_._2).sum, s"cut $k covered mass diverged")
      assert(total == freq.map(_._2).sum)
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 100

  /** Driver twin of graft_shingles: distinct word trigrams. */
  private def shingles(text: String): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("tx15: equals the driver-side membership model; split + scores non-vacuous (sf0.01)") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val (inc, corp) = docs.partition { case (id, _) => bucket(id) < 10 }
    val vocab = corp.iterator.flatMap { case (_, t) => shingles(t) }.toSet
    val expect = inc.map { case (id, t) =>
      val gs = shingles(t)
      id -> ((gs.size.toLong, gs.count(vocab).toLong))
    }.toMap
    val got = graft.GraftQuery.all.find(_.name == "tx15_novelty_score").get
      .build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, "novelty counts diverged from the driver model")
    // the signal must discriminate: some known mass AND some novel mass
    assert(expect.values.exists { case (n, k) => k > 0 },
      "no incoming shingle is known — vocabulary probe never matched")
    assert(expect.values.exists { case (n, k) => n > k },
      "every incoming shingle is known — novelty is identically zero")
    // the hot/cold split is exercised, not decorative: the corpus df
    // distribution must straddle the head line at verify scale
    val dfs = corp.iterator.flatMap { case (id, t) => shingles(t).iterator.map(_ -> id) }
      .toSeq.groupBy(_._1).map(_._2.size)
    val thr = dfs.max / 2
    assert(dfs.exists(_ > thr) && dfs.exists(_ <= thr),
      "corpus df distribution does not straddle the adaptive head line — split vacuous")
  }
}

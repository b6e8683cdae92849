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

  test("exact dedup keeps one row per distinct text (sf0.001)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val distinctTexts = docs.select("text").distinct().count()
    val deduped = byName("dd01_exact_dedup").build(spark, sf0001).count()
    assert(deduped === distinctTexts)
  }
}

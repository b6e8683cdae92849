package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** tx11/tx12 contract: a document too short to have bigrams (fewer than
  * 2 tokens) must FLOW THROUGH the scorers — attributed, never silently
  * dropped. The sf fixtures contain no such doc (500-in/500-out hides
  * the bug), so this spec plants one.
  */
class TextShortDocSpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("short-doc").toString
    import spark.implicits._
    Seq(
      (1L, "hi", "en", "web", 2L), // one token — no bigrams
      (2L, "the cat sat on the mat and the dog sat too", "en", "web", 44L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("tx11 scores a sub-2-token doc as n_bigrams=0 with NULL lm_score") {
    val rows = byName("tx11_bigram_lm_score").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 2, s"short doc vanished: ${rows.keySet}")
    val short = rows(1L)
    assert(short.getLong(short.fieldIndex("n_bigrams")) === 0L)
    assert(short.isNullAt(short.fieldIndex("lm_score")),
      "a doc with no bigrams has no defined LM score — must be NULL, not fabricated")
  }

  test("tx12 attributes a sub-2-token doc 'too_short' instead of dropping it") {
    val rows = byName("tx12_filter_chain").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size === 2, s"short doc vanished: ${rows.keySet}")
    val short = rows(1L)
    assert(short.getString(short.fieldIndex("reason")) === "too_short")
    assert(short.getInt(short.fieldIndex("keep")) === 0)
  }
}

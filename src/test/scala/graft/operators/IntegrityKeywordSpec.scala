package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pr05/tx14 pins. The sf fixtures are referentially CLEAN, so pr05's
  * all-zero audit there proves nothing about detection — this spec
  * plants an orphan and a NULL key and asserts both are counted and
  * classified (null ≠ orphan). tx14's rarity tiebreak is pinned on a
  * corpus built to exercise it.
  */
class IntegrityKeywordSpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  test("pr05 counts planted orphans and null keys, separately") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("refaudit").toString
    Seq((10L, 100L), (11L, 999L)) // 999 -> no such customer
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    Seq((Some(10L), 1L), (Some(99L), 1L), (None, 1L)) // 99 orphan; one NULL key
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    Seq((100L, 0L)).toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq(Tuple1(0L)).toDF("n_nationkey").write.parquet(s"$dir/nation.parquet")
    Seq(Tuple1(1L)).toDF("s_suppkey").write.parquet(s"$dir/supplier.parquet")
    val rows = byName("pr05_referential_audit").build(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("lineitem->orders") === ((3L, 1L, 1L)),
      "3 children, 1 null key, 1 orphan — a NULL key must never count as an orphan")
    assert(rows("orders->customer") === ((2L, 0L, 1L)))
    assert(rows("customer->nation") === ((1L, 0L, 0L)))
    assert(rows("lineitem->supplier") === ((3L, 0L, 0L)))
  }

  test("tx14 ranks by tf, breaks ties toward the RARER term") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    Seq(
      (1L, "a a b c", "en", "web", 7L), // tf: a=2, b=1, c=1; df: b=1 < c=2
      (2L, "c d", "en", "web", 3L) //      tf: c=1, d=1; df: d=1 < c=2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = byName("tx14_keyword_topk").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got === Map(
      (1L, 1) -> "a", // highest tf wins outright
      (1L, 2) -> "b", // tf tie: df(b)=1 beats df(c)=2 — rarer is more distinctive
      (1L, 3) -> "c",
      (2L, 1) -> "d", // same tiebreak in the second doc
      (2L, 2) -> "c"))
  }
}

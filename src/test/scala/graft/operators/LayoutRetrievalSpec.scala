package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q49 (z-order layout audit) and tx13 (BM25 retrieval): the
  * oracle parity gate proves cross-engine equality, these prove the
  * MATH — the Morton interleave against a bit-twiddling model, and the
  * BM25 weight against a hand evaluation of the same formula.
  */
class LayoutRetrievalSpec extends AnyFunSuite {

  private def byName(n: String) = graft.GraftQuery.all.find(_.name == n).get

  test("q49's Morton expression matches a bit-twiddling model on random coords") {
    import spark.implicits._
    def model(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(7)
    val coords = Seq((0L, 0L), (65535L, 65535L), (3L, 5L), (65535L, 0L)) ++
      Seq.fill(40)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = coords.toDF("qx", "qy").withColumn("z", expr(Relational.ZvalExpr))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    coords.foreach { case (x, y) =>
      assert(got((x, y)) === model(x, y), s"interleave($x, $y)")
    }
    // spot values: interleave(3, 5) = x bits at even slots (1 + 4) +
    // y bits at odd slots (2 + 32) = 39; corners span the full key range
    assert(got((3L, 5L)) === 39L)
    assert(got((0L, 0L)) === 0L)
    assert(got((65535L, 65535L)) === (1L << 32) - 1)
  }

  test("q49 audit conserves rows and emits well-formed zone maps (sf0.001)") {
    val rows = byName("q49_zorder_layout").build(spark, sf0001).collect()
    val events = graft.Tables.load(spark, sf0001, "events").count()
    assert(rows.map(_.getLong(1)).sum === events, "every event lands in exactly one bucket")
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(b >= 0 && b <= 255, s"bucket $b outside the 8-bit range")
      assert(r.getLong(r.fieldIndex("min_x")) <= r.getLong(r.fieldIndex("max_x")))
      assert(r.getLong(r.fieldIndex("min_y")) <= r.getLong(r.fieldIndex("max_y")))
    }
    // the pruning claim itself: a centered quarter-range box must skip
    // MOST buckets — if every zone map intersects the box, the layout
    // audit is vacuous and z-ordering bought nothing
    val hit = rows.count(_.getInt(rows.head.fieldIndex("hit_box")) === 1)
    assert(hit.toDouble / rows.length < 0.5,
      s"$hit of ${rows.length} buckets intersect the box — zone maps too loose")
  }

  test("tx13 BM25 weight and ranking match a hand evaluation on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    Seq(
      (1L, "dup dup dup a b", "en", "web", 15L), // tf=3, dl=5
      (2L, "dup a", "en", "web", 5L), //            tf=1, dl=2
      (3L, "x y z", "en", "web", 5L) //             no match
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = byName("tx13_bm25_topdocs").build(spark, dir)
      .filter(col("term") === "dup").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(rows.keySet === Set(1L, 2L), "only matching docs may rank")
    // same operand order as Bm25W: nd=3 docs, sl=10 tokens
    def w(tf: Double, dl: Double) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl * 3.0) / 10.0))
    assert(rows(1L).getDouble(rows(1L).fieldIndex("w")) === w(3.0, 5.0))
    assert(rows(2L).getDouble(rows(2L).fieldIndex("w")) === w(1.0, 2.0))
    // tf saturation beats the shorter doc here: 3 occurrences in 5
    // tokens outrank 1 occurrence in 2 tokens
    assert(rows(1L).getInt(rows(1L).fieldIndex("rnk")) === 1)
    assert(rows(2L).getInt(rows(2L).fieldIndex("rnk")) === 2)
  }
}

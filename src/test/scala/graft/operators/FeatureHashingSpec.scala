package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** tx18 pins: the 16-dim hashed vector equals a driver-side replay of
  * the same md5 bucketing, the L1 invariant (sum of buckets == token
  * count) holds for every doc, and the fixture genuinely collides
  * (nnz < dims somewhere, >1 token in one bucket somewhere) — the
  * trick's designed trade must be exercised, not dodged.
  */
class FeatureHashingSpec extends AnyFunSuite {

  test("tx18: vectors equal the driver-side replay; L1 and collision invariants hold") {
    val rows = graft.GraftQuery.all.find(_.name == "tx18_feature_hashing").get
      .build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === docs.keySet, "one vector per document, none dropped")
    def bucket(t: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 16
    }
    var collided = false
    var sparse = false
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1) // split('') keeps the empty token, like both engines
      val v = Array.fill(16)(0L)
      toks.foreach(t => v(bucket(t)) += 1)
      val (fv, nnz, l1) = rows(id)
      assert(fv === v.mkString(","), s"doc $id vector diverged from the replay")
      assert(nnz === v.count(_ > 0), s"doc $id nnz")
      assert(l1 === toks.length.toLong, s"doc $id L1 must equal its token count")
      if (v.exists(_ > 1)) collided = true
      if (v.count(_ > 0) < 16) sparse = true
    }
    assert(collided, "no bucket ever collided — 16 dims on this corpus should collide")
    assert(sparse, "every doc filled all 16 buckets — short docs should stay sparse")
  }
}

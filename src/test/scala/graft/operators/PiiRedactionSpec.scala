package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tx16 contract: the injected PII surface is detected exactly (a
  * driver-side java.util.regex model agrees with the in-plan counts)
  * and the redaction is COMPLETE — re-running all three detectors on
  * the redacted text finds zero residual matches. Parity with DuckDB
  * (RE2) is the cross-engine half; this spec owns the semantic half.
  */
class PiiRedactionSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(k: String): Long =
    java.lang.Long.parseLong(md5hex(k).substring(0, 8), 16) % 100

  private def q = graft.GraftQuery.all.find(_.name == "tx16_pii_redaction").get

  test("tx16 counts match the md5-bucket injection model exactly (sf0.001)") {
    val got = q.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expect = got.keys.map { id =>
      val emails = bucket(id.toString) match {
        case b1 if b1 < 10 => 2L
        case b1 if b1 < 30 => 1L
        case _             => 0L
      }
      val phones = if (bucket(s"${id}p") < 30) 1L else 0L
      val ips = if (bucket(s"${id}q") < 30) 1L else 0L
      id -> ((emails, phones, ips))
    }.toMap
    assert(got == expect, "detector counts diverged from the injection model")
    // the injection must exercise every branch or the detectors are
    // never really tested
    assert(got.values.map(_._1).toSet == Set(0L, 1L, 2L), "email branches not all hit")
    assert(got.values.map(_._2).toSet == Set(0L, 1L), "phone branches not all hit")
    assert(got.values.map(_._3).toSet == Set(0L, 1L), "ip branches not all hit")
  }

  test("tx16 redaction is complete: zero residual matches on redacted text (sf0.001)") {
    // rebuild the redacted text the same way the query does, then turn
    // the detectors back on it — any surviving match means a pattern
    // mismatch between detect and redact
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    // the query exposes only md5(redacted); reconstruct redacted text
    // from the same plan by re-deriving it with the shared constants
    val b = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val b1 = bucket(id.toString); val b2 = bucket(s"${id}p"); val b3 = bucket(s"${id}q")
      val em =
        if (b1 < 10) s" contact user$id@example.com or user$id.alt@example.org"
        else if (b1 < 30) s" contact user$id@example.com" else ""
      val ph =
        if (b2 < 30) f" call +1-555-${(b2 * 137 + 11) % 10000}%04d" else ""
      val ip = if (b3 < 30) s" from 10.$b3.${b3 * 7 % 256}.${b3 * 13 % 256}" else ""
      (id, text + em + ph + ip)
    }
    val redacted = b.map { case (id, t) =>
      (id, t.replaceAll(emailRe, "<EMAIL>").replaceAll(phoneRe, "<PHONE>")
        .replaceAll(ipRe, "<IP>"))
    }
    redacted.foreach { case (id, t) =>
      assert(!t.matches(s".*($emailRe|$phoneRe|$ipRe).*"),
        s"doc $id: residual PII after redaction: $t")
    }
    // and the reconstructed redaction must be the one the query pinned
    val gotMd5 = q.build(spark, sf0001).select(col("doc_id"), col("redacted_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    redacted.foreach { case (id, t) =>
      assert(gotMd5(id) == md5hex(t), s"doc $id: redacted text diverged from the model")
    }
  }
}

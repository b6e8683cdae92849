package graft.operators

import graft.TestSpark._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("decodeMeta is deterministic and schema-correct (sf0.001)") {
    import spark.implicits._
    val payloads = graft.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val a = Multimodal.decodeMeta(payloads).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeMeta(payloads).collect().sortBy(_.doc_id)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq, "stub decode must be deterministic")
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.n_frames >= 1))
    assert(a.forall(_.sha_hex.length === 64))
    assert(a.forall(m => m.n_bytes > 0))
  }

  test("sampleFrames is deterministic, strided, and bounded by frame count") {
    import spark.implicits._
    val payloads = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val a = Multimodal.sampleFrames(payloads, 4).collect().sortBy(f => (f.doc_id, f.frame_idx))
    val b = Multimodal.sampleFrames(payloads, 4).collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(a.toSeq === b.toSeq, "frame sampling must be deterministic")
    assert(a.nonEmpty)
    assert(a.forall(_.frame_idx % 4 === 0), "stride must be respected")
    val metas = Multimodal.decodeMeta(payloads).collect().map(m => m.doc_id -> m.n_frames).toMap
    val perDoc = a.groupBy(_.doc_id)
    assert(perDoc.forall { case (id, fs) =>
      fs.length === (0 until metas(id) by 4).size
    }, "sampled frame count must match ceil(frames/step)")
    assert(a.forall(_.frame_sha.length === 16))
  }

  test("payload hash matches Spark-side sha2 (plumbing consistency)") {
    import spark.implicits._
    val sparkSide = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0)
      .select(sha2(encode(col("text"), "UTF-8"), 256)).as[String].head()
    val payloads = graft.Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val viaStub = Multimodal.decodeMeta(payloads).collect().head.sha_hex
    assert(viaStub === sparkSide)
  }
}

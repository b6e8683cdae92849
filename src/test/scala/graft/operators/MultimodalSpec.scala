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

  test("PngCodec golden bytes: real PNG container, exact pixel round-trip") {
    // hand-seeded 5x3 image with known pixels: the encode must emit a
    // genuine PNG (magic + IHDR chunk), and the decode must recover the
    // EXACT grayscale values — PNG 8-bit gray is lossless, so any
    // codec-path corruption shows as a stats mismatch here
    val pix = Array(
      Array(0, 17, 255, 128, 3),
      Array(250, 1, 99, 200, 42),
      Array(7, 7, 7, 7, 7))
    val bytes = Multimodal.PngCodec.encodeGray(5, 3, (x, y) => pix(y)(x))
    assert(bytes.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "payload must carry the PNG signature")
    assert(new String(bytes.slice(12, 16), "US-ASCII") === "IHDR",
      "first chunk must be IHDR")
    val (w, h, sum, mn, mx) = Multimodal.PngCodec.decodeStats(bytes)
    val flat = pix.flatten
    assert((w, h) === ((5, 3)))
    assert(sum === flat.map(_.toLong).sum)
    assert(mn === flat.min)
    assert(mx === flat.max)
    // a non-image payload fails LOUDLY, never a null-derived garbage row
    intercept[IllegalArgumentException] {
      Multimodal.PngCodec.decodeStats("not a png".getBytes("UTF-8"))
    }
  }

  test("WavCodec golden bytes: real RIFF/WAVE container, exact sample round-trip") {
    // hand-seeded 7-sample clip: the encode must emit a genuine WAV
    // (RIFF....WAVE magic), and the decode must recover the EXACT
    // unsigned 8-bit samples — PCM is lossless, so any codec-path
    // corruption shows as a stats mismatch here
    val samples = Array(0, 255, 17, 128, 3, 250, 42)
    val bytes = Multimodal.WavCodec.encodePcm8(16000, samples.length, samples(_))
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF", "RIFF magic")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE", "WAVE magic")
    val (rate, n, sum, mn, mx) = Multimodal.WavCodec.decodeStats(bytes)
    assert(rate === 16000)
    assert(n === samples.length.toLong)
    assert(sum === samples.map(_.toLong).sum)
    assert(mn === samples.min)
    assert(mx === samples.max)
    // a non-audio payload fails LOUDLY, never a garbage row
    intercept[Exception] {
      Multimodal.WavCodec.decodeStats("not a wav".getBytes("UTF-8"))
    }
  }

  test("mm07 distributed decode equals driver-side decode of the same payloads") {
    import spark.implicits._
    val clips = Seq((1L, 8000, 70), (2L, 22050, 255), (3L, 11025, 64))
    val payloads = clips.map { case (id, rate, n) =>
      (id, Multimodal.WavCodec.encodePcm8(rate, n, i => ((id * 13 + i * 29) % 256).toInt))
    }
    val got = Multimodal.decodeAudioStats(payloads.toDS()).collect()
      .map(a => a.doc_id -> ((a.sample_rate, a.n_samples, a.amp_sum, a.amp_min, a.amp_max)))
      .toMap
    payloads.foreach { case (id, bytes) =>
      val (rate, n, sum, mn, mx) = Multimodal.WavCodec.decodeStats(bytes)
      assert(got(id) === ((rate, n, sum, mn, mx)), s"clip $id diverged")
    }
  }

  test("mm08 resize picks exactly the even-coordinate pixels (golden)") {
    // 5x4 image with distinct pixels: the 2x NN downscale must read
    // src (0,0),(2,0),(0,2),(2,2) — nothing else, no interpolation
    val pix = Array(
      Array(10, 99, 20, 99, 99),
      Array(99, 99, 99, 99, 99),
      Array(30, 99, 40, 99, 99),
      Array(99, 99, 99, 99, 99))
    val png = Multimodal.PngCodec.encodeGray(5, 4, (x, y) => pix(y)(x))
    val (rw, rh, sum, mn, mx) = Multimodal.resizeStats(png)
    assert((rw, rh) === ((2, 2)))
    assert(sum === 10L + 20 + 30 + 40, "NN resize must not interpolate")
    assert(mn === 10 && mx === 40)
  }

  test("mm06 distributed decode equals driver-side decode of the same payloads") {
    import spark.implicits._
    // the query's own fixture recipe, replayed at tiny scale: encode on
    // the driver, decode both ways, compare exactly
    val dims = Seq((0L, 4, 6), (1L, 16, 4), (2L, 7, 7))
    def pixel(id: Long)(x: Int, y: Int): Int = ((id * 17 + x * 31 + y * 7) % 256).toInt
    val payloads = dims.map { case (id, w, h) =>
      (id, Multimodal.PngCodec.encodeGray(w, h, pixel(id)))
    }
    val expected = payloads.map { case (id, b) =>
      val (w, h, s, mn, mx) = Multimodal.PngCodec.decodeStats(b)
      Multimodal.ImageStats(id, w, h, s, mn, mx)
    }.sortBy(_.doc_id)
    val got = Multimodal.decodeImageStats(payloads.toDS()).collect().sortBy(_.doc_id)
    assert(got.toSeq === expected)
    // and the closed form the DuckDB oracle uses matches the decode
    expected.foreach { st =>
      val vs = for (y <- 0 until st.height; x <- 0 until st.width)
        yield pixel(st.doc_id)(x, y)
      assert(st.px_sum === vs.map(_.toLong).sum, s"doc ${st.doc_id} sum")
      assert(st.px_min === vs.min && st.px_max === vs.max)
    }
  }

  test("GifCodec golden bytes: real animated-GIF container, exact per-frame round-trip") {
    // hand-seeded 3x2 animation with 5 distinct frames: the encode must
    // emit a genuine GIF (GIF89a/87a magic), the real index must report
    // all 5 frames, and every-2nd-frame sampling must recover EXACT
    // gray values per frame — GIF LZW + full-palette gray is lossless
    def pix(f: Int, x: Int, y: Int) = (f * 40 + y * 3 + x) % 256
    val bytes = Multimodal.GifCodec.encodeGrayFrames(3, 2, 5, pix)
    assert(new String(bytes.take(3), "US-ASCII") === "GIF", "GIF magic")
    val got = Multimodal.GifCodec.frameStats(bytes, step = 2)
    assert(got.map(_._1) === Seq(0, 2, 4), "every-2nd-frame sampling")
    got.foreach { case (f, w, h, sum, mn, mx) =>
      val vs = for (y <- 0 until 2; x <- 0 until 3) yield pix(f, x, y)
      assert((w, h) === ((3, 2)), s"frame $f dims")
      assert(sum === vs.map(_.toLong).sum, s"frame $f sum")
      assert(mn === vs.min && mx === vs.max, s"frame $f min/max")
    }
    // a non-GIF payload fails LOUDLY, never a garbage frame row
    intercept[Exception] {
      Multimodal.GifCodec.frameStats("not a gif".getBytes("UTF-8"), 1)
    }
  }

  test("mm09 distributed multi-frame decode equals driver-side decode of the same payloads") {
    import spark.implicits._
    // the query's own fixture recipe at tiny scale: encode on the
    // driver, decode both ways (distributed flatMap vs direct), and
    // check the closed form the DuckDB oracle uses
    def pixel(id: Long)(f: Int, x: Int, y: Int): Int =
      ((id * 11 + f * 53 + x * 31 + y * 7) % 256).toInt
    val dims = Seq((0L, 4, 5, 9), (1L, 7, 4, 4), (2L, 5, 5, 16))
    val payloads = dims.map { case (id, w, h, nf) =>
      (id, Multimodal.GifCodec.encodeGrayFrames(w, h, nf, pixel(id)))
    }
    val got = Multimodal.decodeVideoFrameStats(payloads.toDS(), step = 4).collect()
      .map(v => (v.doc_id, v.frame_idx) -> ((v.width, v.height, v.px_sum, v.px_min, v.px_max)))
      .toMap
    dims.foreach { case (id, w, h, nf) =>
      val sampled = (0 until nf by 4)
      assert(got.keys.count(_._1 == id) === sampled.size, s"doc $id frame count")
      sampled.foreach { f =>
        val vs = for (y <- 0 until h; x <- 0 until w) yield pixel(id)(f, x, y)
        assert(got((id, f)) === ((w, h, vs.map(_.toLong).sum, vs.min, vs.max)),
          s"doc $id frame $f diverged from the closed form")
      }
    }
  }

  test("mm10 dHash: decoded-raster hash equals closed form; banding recall = all-pairs truth; pruning real") {
    import graft.operators.Multimodal.PngCodec
    // golden: the hash computed from the REAL decoded raster equals the
    // closed form pushed through the same 8x7 NN grid
    def closedForm(id: Long, w: Int, h: Int): Long = {
      var bits = 0L
      for (j <- 0 until 7; i <- 0 until 8) {
        val y = j * h / 7
        val (x1, x2) = (i * w / 9, (i + 1) * w / 9)
        def px(x: Int) = ((id * 17 + x * 31 + y * 7) % 256).toInt
        if (px(x2) > px(x1)) bits |= 1L << (j * 8 + i)
      }
      bits
    }
    for ((id, w, h) <- Seq((7L, 13, 9), (42L, 4, 4), (9L, 16, 11))) {
      val png = PngCodec.encodeGray(w, h,
        (x, y) => ((id * 17 + x * 31 + y * 7) % 256).toInt)
      assert(PngCodec.decodeDhash(png) === closedForm(id, w, h),
        s"decoded-raster dHash diverged from the closed form for ($id, $w, $h)")
    }
    // the query's banded candidates recover EXACTLY the all-pairs
    // Hamming <= 4 truth (pigeonhole recall + exact rerank precision)
    def md5hex(s0: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hs = graft.Tables.load(spark, sf001, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .select("doc_id", "text").collect()
      .map { r =>
        val m = md5hex(r.getString(1))
        val (w, h) = (4 + Integer.parseInt(m.substring(0, 2), 16) % 13,
          4 + Integer.parseInt(m.substring(2, 4), 16) % 13)
        r.getLong(0) -> closedForm(r.getLong(0), w, h)
      }.toMap
    val truth = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 4
    } yield (a, b, d)).toSet
    val got = graft.GraftQuery.all.find(_.name == "mm10_perceptual_neardup").get
      .build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth,
      s"banded pairs != all-pairs truth: extra=${got -- truth} missing=${truth -- got}")
    assert(truth.exists(_._3 == 0), "no distance-0 pair — re-encode dedup untested")
    assert(truth.exists(t => t._3 >= 1 && t._3 <= 4),
      "no near-miss pair — the Hamming threshold is untested")
    // the banding genuinely PRUNES: candidate pairs (band agreement)
    // are far fewer than all pairs, else the LSH is all-pairs in disguise
    def bandsOf(x: Long): Seq[(Int, Long)] =
      (0, x % 4096) +: (1 to 4).map(k => (k, (x >> (12 + 11 * (k - 1))) % 2048))
    val cands = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if bandsOf(hs(a)).zip(bandsOf(hs(b))).exists(p => p._1 == p._2)
    } yield (a, b)).toSet
    val allPairs = hs.size * (hs.size - 1) / 2
    assert(cands.size < allPairs / 2,
      s"banding admitted ${cands.size} of $allPairs pairs — not pruning")
  }
}

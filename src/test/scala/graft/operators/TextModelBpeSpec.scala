package graft.operators

import graft.TestSpark._
import org.scalatest.funsuite.AnyFunSuite

/** tx19/tx20 pins.
  *
  * tx19: the integer dot-product score equals a full driver-side
  * replay from raw text (same md5 bucket hash, same md5-derived
  * weights), and the model's verdicts AGREE with tx12's rule-based
  * verdicts at both extremes — kept-and-model-keeps and
  * dropped-and-model-drops each non-vacuous (a filter that always
  * fires one way audits nothing), plus both DISAGREEMENT cells exist
  * (if model and rules were identical the model op would be
  * redundant; the fixture exercises all four confusion cells).
  *
  * tx20: the emitted merge table equals a driver-side replay of
  * greedy BPE (value-collapsed vocabulary, per-round global argmax
  * with the (count DESC, pair ASC) tiebreak, left-to-right
  * non-overlapping merge), and a merged symbol genuinely re-enters a
  * later round's best pair — the regime separating BPE from plain
  * bigram counting.
  */
class TextModelBpeSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tx19: scores equal the driver-side dot replay; verdicts span all four tx12-agreement cells") {
    val got = graft.GraftQuery.all.find(_.name == "tx19_model_quality_filter").get
      .build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === docs.keySet, "one score per document, none dropped")
    // replay: weights from md5("gw"+b), features from md5(token) buckets
    val w = (0 until 16).map(b => Integer.parseInt(md5hex(s"gw$b").take(4), 16) % 17 - 8)
    assert(w === TextAnalysis.ModelWeights)
    assert(w.exists(_ > 0) && w.exists(_ < 0),
      "weight vector must carry both signs or the threshold is vacuous")
    docs.foreach { case (id, text) =>
      val v = Array.fill(16)(0L)
      text.split(" ", -1).foreach { t =>
        v(Integer.parseInt(md5hex(t).take(4), 16) % 16) += 1
      }
      val score = v.zip(w).map { case (a, b) => a * b }.sum
      assert(got(id)._1 === score, s"doc $id score diverged from the replay")
      assert(got(id)._2 === (if (score >= 0) 1 else 0), s"doc $id verdict")
    }
    // agreement with the rule-based chain on the extremes: all four
    // confusion cells populated on the fixture
    val rules = graft.GraftQuery.all.find(_.name == "tx12_filter_chain").get
      .build(spark, sf001).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = docs.keySet.groupBy(id => (got(id)._2, rules(id))).view.mapValues(_.size).toMap
    assert(cells.getOrElse((1, 1), 0) > 0, "no doc both model-kept and rule-kept")
    assert(cells.getOrElse((0, 0), 0) > 0, "no doc both model-dropped and rule-dropped")
    assert(cells.getOrElse((1, 0), 0) > 0 || cells.getOrElse((0, 1), 0) > 0,
      "model and rules identical — the model op would be redundant")
  }

  test("tx20: merge table equals the driver-side greedy-BPE replay; a merged symbol re-enters") {
    val got = graft.GraftQuery.all.find(_.name == "tx20_bpe_merges").get
      .build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length === TextAnalysis.BpeRounds)
    // replay: value-collapsed vocabulary, greedy left-to-right merges
    var vocab = graft.Tables.load(spark, sf001, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1))
      .filter(_.matches("[a-z]+"))
      .toSeq.groupBy(identity).map { case (tok, occ) =>
        tok.map(_.toString).toVector -> occ.size.toLong
      }
    val expected = (1 to TextAnalysis.BpeRounds).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((l, rr), n) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.toSeq.map { case (syms, f) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == l && x == rr) acc(acc.size - 1) = l + rr
          else acc += x
        }
        acc.toVector -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (r, l, rr, n)
    }
    assert(got === expected, "merge table diverged from the driver-side replay")
    // the BPE-vs-bigram regime: some later best pair contains an
    // earlier round's MERGED symbol
    val merged = expected.map { case (_, l, r, _) => l + r }.toSet
    assert(expected.exists { case (_, l, r, _) => merged.contains(l) || merged.contains(r) },
      s"no merged symbol re-entered a best pair in ${TextAnalysis.BpeRounds} rounds — " +
        "raise BpeRounds or the op degenerates to bigram counting")
  }

  test("tx21: encoding equals the driver-side replay; merges genuinely compress") {
    val got = graft.GraftQuery.all.find(_.name == "tx21_bpe_encode").get
      .build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // replay: train (greedy BPE over the collapsed vocabulary), then
    // apply the merges in training order to every token of every doc
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === docs.keySet)
    var vocab = docs.values.toSeq.flatMap(_.split(" ", -1))
      .filter(_.matches("[a-z]+"))
      .groupBy(identity).map { case (t, o) => t.map(_.toString).toVector -> o.size.toLong }
    val merges = (1 to TextAnalysis.BpeRounds).map { _ =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((l, r), _) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      def merge(syms: Vector[String]): Vector[String] = {
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == l && x == r) acc(acc.size - 1) = l + r
          else acc += x
        }
        acc.toVector
      }
      vocab = vocab.toSeq.map { case (s, f) => merge(s) -> f }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (l, r)
    }
    def encode(tok: String): Long =
      if (!tok.matches("[a-z]+")) 1L
      else merges.foldLeft(tok.map(_.toString).toVector) { case (syms, (l, r)) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == l && x == r) acc(acc.size - 1) = l + r
          else acc += x
        }
        acc.toVector
      }.size.toLong
    var totalUnits = 0L
    var totalAlphaChars = 0L
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val units = toks.map(encode).sum
      assert(got(id) === ((toks.length, units)), s"doc $id encoding diverged")
      totalUnits += toks.filter(_.matches("[a-z]+")).map(encode).sum
      totalAlphaChars += toks.filter(_.matches("[a-z]+")).map(_.length.toLong).sum
    }
    assert(totalUnits < totalAlphaChars,
      "BPE units did not compress below character count — the merges did nothing")
  }

  test("tx22: trajectory equals the driver-side epoch replay; trained weights beat tx19's frozen weights on tx12-agreement") {
    val got = graft.GraftQuery.all.find(_.name == "tx22_perceptron_train").get
      .build(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(2)) -> ((r.getLong(3), r.getLong(1)))).toMap
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keep = graft.GraftQuery.all.find(_.name == "tx12_filter_chain").get
      .build(spark, sf001).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // features: tx18's 16 md5 bucket counts + the bias dim; y = ±1
    val feats = docs.toSeq.map { case (id, text) =>
      val v = Array.fill(17)(0L); v(16) = 1L
      text.split(" ", -1).foreach { t =>
        v(Integer.parseInt(md5hex(t).take(4), 16) % 16) += 1
      }
      (v.toVector, if (keep(id) == 1) 1L else -1L)
    }
    // replay the batch-perceptron epochs
    var w = Vector.fill(17)(0L)
    val trajectory = (1 to TextAnalysis.TxEpochs).map { e =>
      val mis = feats.filter { case (x, y) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0 }
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + mis.map { case (x, y) => y * x(j) }.sum }
      (e, mis.size.toLong, w)
    }
    trajectory.foreach { case (e, nMiss, we) =>
      (0 until 17).foreach { j =>
        assert(got((e, j)) === ((we(j), nMiss)),
          s"epoch $e dim $j diverged from the replay")
      }
    }
    // the training curve genuinely moves: weights change every epoch
    assert(trajectory.map(_._3).distinct.size === TextAnalysis.TxEpochs,
      "weights stalled across epochs — training did nothing")
    // the number that justifies training: final-epoch weights agree
    // with tx12's rule verdicts STRICTLY more often than tx19's
    // frozen md5 weights do (both thresholded at score >= 0)
    val frozen = TextAnalysis.ModelWeights.map(_.toLong).toVector :+ 0L
    def agreement(wv: Vector[Long]): Int = feats.count { case (x, y) =>
      val kept = x.zip(wv).map { case (a, b) => a * b }.sum >= 0
      kept == (y == 1L)
    }
    val (trained, untrained) = (agreement(w), agreement(frozen))
    assert(trained > untrained,
      s"trained weights ($trained/${feats.size} agreement) must beat the " +
        s"frozen tx19 weights ($untrained/${feats.size})")
  }

  test("perceptron store: memoized artifacts are bit-identical to a fresh training run") {
    // the r16 memo (PerceptronStore) exists so tx22/tx23/pl04 stop
    // re-training per query; it must never be allowed to drift from
    // what an un-memoized run computes. Training is exact integer
    // arithmetic, so equality is exact, not approximate.
    val freshFeats = TextAnalysis.perceptronFeatsFresh(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toVector, r.getLong(2)))).toMap
    val memoFeats = TextAnalysis.perceptronFeats(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toVector, r.getLong(2)))).toMap
    assert(memoFeats === freshFeats, "memoized feats diverged from fresh")
    val freshEpochs = TextAnalysis
      .perceptronEpochsFresh(spark, TextAnalysis.perceptronFeats(spark, sf001))
      .map(_.collect()(0)).map(r => (r.getSeq[Long](0).toVector, r.getLong(1)))
    val memoEpochs = TextAnalysis.perceptronEpochs(spark, sf001)
      .map(_.collect()(0)).map(r => (r.getSeq[Long](0).toVector, r.getLong(1)))
    assert(memoEpochs === freshEpochs, "memoized trajectory diverged from fresh")
  }

  test("tx23: curve equals the driver-side sweep replay; monotone in theta; an interior point discriminates") {
    val docs = graft.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keep = graft.GraftQuery.all.find(_.name == "tx12_filter_chain").get
      .build(spark, sf001).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val feats = docs.toSeq.map { case (id, text) =>
      val v = Array.fill(17)(0L); v(16) = 1L
      text.split(" ", -1).foreach { t =>
        v(Integer.parseInt(md5hex(t).take(4), 16) % 16) += 1
      }
      (v.toVector, if (keep(id) == 1) 1L else -1L)
    }
    var w = Vector.fill(17)(0L)
    for (_ <- 1 to TextAnalysis.TxEpochs) {
      val mis = feats.filter { case (x, y) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0 }
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + mis.map { case (x, y) => y * x(j) }.sum }
    }
    val scores = feats.map { case (x, y) =>
      (x.zip(w).map { case (a, b) => a * b }.sum, y) }
    val (lo, hi) = (scores.map(_._1).min, scores.map(_._1).max)
    val expect = (1 to 5).map { k =>
      val theta = lo + ((hi - lo) * k) / 6
      val tp = scores.count { case (s, y) => s >= theta && y == 1L }.toLong
      val fp = scores.count { case (s, y) => s >= theta && y == -1L }.toLong
      val fn = scores.count { case (s, y) => s < theta && y == 1L }.toLong
      val tn = scores.count { case (s, y) => s < theta && y == -1L }.toLong
      k -> ((theta, tp, fp, fn, tn))
    }.toMap
    val got = graft.GraftQuery.all.find(_.name == "tx23_operating_curve").get
      .build(spark, sf001).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expect, "tx23 diverged from the driver-side sweep replay")
    // the curve's defining shape: raising theta can only shed keeps
    val ordered = (1 to 5).map(got)
    for (Seq(a, b) <- ordered.sliding(2)) {
      assert(b._2 <= a._2, "tp increased as theta rose")
      assert(b._5 >= a._5, "tn decreased as theta rose")
    }
    // an interior threshold genuinely splits the corpus (neither
    // everything kept nor everything dropped) — the table discriminates
    assert(ordered.exists(r => r._2 + r._3 > 0 && r._4 + r._5 > 0),
      "no threshold splits the corpus — the sweep is vacuous")
  }
}

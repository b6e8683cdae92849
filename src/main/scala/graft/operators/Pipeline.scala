package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-build pipeline (VERDICT r13 #2) — the thing a
  * 100 TB training-data run actually executes is not any single
  * operator but the CHAIN: ingest → quality gate → dedup → benchmark
  * decontamination → split → shard packing, with a per-stage attrition
  * manifest (the "data card" numbers: docs in, kept, deduped, clean,
  * split sizes, shard loads — and a drop REASON for every document
  * that left, the cdc05/tx12 nothing-vanishes discipline applied to
  * the whole pipeline).
  *
  * Composition contract — FACTOR, DON'T COPY: every stage calls the
  * SHIPPED operator's factored core, so the pipeline can never drift
  * from the standalone semantics the per-operator oracles pin:
  *
  *  - quality gate  = [[TextAnalysis.filterVerdicts]]  (tx12)
  *  - dedup keepers = [[Dedup.keeperIds]]              (dd08)
  *  - contamination = [[Decontam.overlapPairs]]        (dc01/dc02)
  *  - split         = [[Sampling.bucket100]]           (sp05)
  *  - packing       = [[Sampling.serpentineShardAssignments]] (pk02)
  *
  * Chain semantics: stage k classifies the SURVIVORS of stage k-1
  * against the standalone operator's full-corpus keep-set (each
  * operator's own scope is part of its semantics — dedup keepers and
  * the contaminated set are corpus-global properties), so
  * survivors(k) = survivors(k-1) ∩ keep(k). PipelineSpec pins each
  * stage's counts against the standalone operators' outputs chained
  * driver-side, and the scan audit pins that composing stages does
  * not multiply `documents` scans past the standalone sum.
  *
  * Scale shape: each stage is exactly its operator's audited plan
  * (df-capped shingle joins, broadcast contaminated set, two-phase
  * serpentine rank); the chaining adds only doc_id-keyed semi/anti
  * joins (co-partitioned, payload-free) and the manifest itself is a
  * union of counter-grain aggregates — at 100 TB the manifest rows
  * total under a hundred regardless of corpus size.
  */
object Pipeline {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "pl01_corpus_build_manifest",
      Some(s"""WITH fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
              |keepers AS (SELECT doc_id FROM ${Dedup.keeperIdsDuck} k),
              |cont AS (SELECT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |s1 AS (SELECT doc_id FROM fc WHERE reason = 'kept'),
              |s2 AS (SELECT doc_id FROM s1 WHERE doc_id IN (SELECT doc_id FROM keepers)),
              |s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |toks AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents),
              |r AS (SELECT s3.doc_id, t.n_tokens,
              |             ROW_NUMBER() OVER (ORDER BY t.n_tokens DESC, s3.doc_id) AS rn
              |      FROM s3 JOIN toks t USING (doc_id))
              |SELECT CAST(0 AS INT) AS stage, 'docs_in' AS detail, COUNT(*) AS n FROM documents
              |UNION ALL SELECT 1, reason, COUNT(*) FROM fc GROUP BY reason
              |UNION ALL SELECT 2,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM keepers)
              |       THEN 'kept' ELSE 'duplicate' END, COUNT(*)
              |FROM s1 GROUP BY 2
              |UNION ALL SELECT 3,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM cont)
              |       THEN 'contaminated' ELSE 'kept' END, COUNT(*)
              |FROM s2 GROUP BY 2
              |UNION ALL SELECT 4,
              |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END, COUNT(*)
              |FROM (SELECT ${Sampling.duckBucket100Of("doc_id")} AS b FROM s3) sb GROUP BY 2
              |UNION ALL SELECT 5, 'shard_' || CAST(
              |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
              |FROM r GROUP BY 2""".stripMargin),
      "END-TO-END corpus-build manifest — the per-stage attrition table (stage, detail, n) of the full chain ingest -> tx12 quality gate -> dd08 dedup keep-list -> dc01/dc02 benchmark decontamination -> sp05 deterministic split -> pk02 balanced shard packing, each stage executing the SHIPPED operator's factored core (never a re-derivation — PipelineSpec pins every stage count against the standalone operators chained driver-side, and the scan audit pins composition adds no documents re-scans). Stage rows: docs_in; the tx12 reason histogram (every drop attributed); kept-vs-duplicate among quality survivors (exact AND near dups — keepers are the corpus-global dd08 min-id set — dedup scope is a whole-corpus property, so survivors intersect the standalone keep-set); kept-vs-contaminated among dedup survivors (the dc02 broadcast purge set); train/val/test sizes of the clean corpus (md5 buckets — re-running the pipeline on grown data moves no doc); and the 16 serpentine shard loads of the final pack. At 100 TB every stage keeps its own audited plan, the chaining is doc_id-keyed semi/anti joins that carry no payload, and the manifest output is counter-grain (tens of rows) — this table IS the data card a corpus release ships.") {
      (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        // stage cores — the shipped operators, factored (never re-derived)
        val fc = Materialize(TextAnalysis.filterVerdicts(s, dir))
        val keepers = Dedup.keeperIds(s, dir)
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        // chain: classify each survivor set ONCE, reuse for count + next
        val s1 = fc.filter(col("reason") === "kept").select("doc_id", "n_tokens")
        val cls2 = Materialize(s1
          .join(keepers.withColumn("is_keeper", lit(1)), Seq("doc_id"), "left"))
        val s2 = cls2.filter(col("is_keeper").isNotNull).select("doc_id", "n_tokens")
        val cls3 = Materialize(s2
          .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
        val s3 = cls3.filter(col("is_cont").isNull).select("doc_id", "n_tokens")
        val st0 = docs.agg(count(lit(1)).as("n"))
          .select(lit(0).as("stage"), lit("docs_in").as("detail"), col("n"))
        val st1 = fc.groupBy(col("reason").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(1).as("stage"), col("detail"), col("n"))
        // 'duplicate', not 'near_dup': dd08's keep-set drops exact AND
        // near duplicates — the broader label describes the whole drop
        // reason (ADVICE r14)
        val st2 = cls2.groupBy(
            when(col("is_keeper").isNotNull, "kept").otherwise("duplicate").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(2).as("stage"), col("detail"), col("n"))
        val st3 = cls3.groupBy(
            when(col("is_cont").isNotNull, "contaminated").otherwise("kept").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(3).as("stage"), col("detail"), col("n"))
        val b = expr(Sampling.bucket100("doc_id"))
        val st4 = s3.groupBy(
            when(b < 80, "train").when(b < 90, "val").otherwise("test").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(4).as("stage"), col("detail"), col("n"))
        val st5 = Sampling.serpentineShardAssignments(s3)
          .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(5).as("stage"), col("detail"), col("n"))
        Seq(st0, st1, st2, st3, st4, st5).reduce(_ unionByName _)
          .select(col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
    },

    GraftQuery(
      "pl02_incremental_manifest",
      Some(s"""WITH fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
              |di AS (SELECT doc_id FROM documents
              |       WHERE ${Sampling.duckBucket100Of("doc_id")} < 10),
              |v AS (SELECT doc_id, verdict FROM (${Dedup.incrementalDuck}) t),
              |cont AS (SELECT DISTINCT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |toks AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents),
              |s1 AS (SELECT doc_id FROM fc WHERE reason = 'kept'
              |       AND doc_id IN (SELECT doc_id FROM di)),
              |s2 AS (SELECT s1.doc_id FROM s1 JOIN v USING (doc_id)
              |       WHERE v.verdict = 'new'),
              |s3 AS (SELECT doc_id FROM s2
              |       WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |r AS (SELECT s3.doc_id, t.n_tokens,
              |             ROW_NUMBER() OVER (ORDER BY t.n_tokens DESC, s3.doc_id) AS rn
              |      FROM s3 JOIN toks t USING (doc_id))
              |SELECT CAST(0 AS INT) AS stage, 'drop_in' AS detail, COUNT(*) AS n FROM di
              |UNION ALL SELECT 1, reason, COUNT(*) FROM fc
              |  WHERE doc_id IN (SELECT doc_id FROM di) GROUP BY reason
              |UNION ALL SELECT 2, verdict, COUNT(*) FROM v
              |  WHERE doc_id IN (SELECT doc_id FROM s1) GROUP BY 2
              |UNION ALL SELECT 3,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM cont)
              |       THEN 'contaminated' ELSE 'clean' END, COUNT(*)
              |FROM s2 GROUP BY 2
              |UNION ALL SELECT 4, 'shard_' || CAST(
              |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
              |FROM r GROUP BY 2
              |UNION ALL SELECT 5, 'corpus_after', COUNT(*) FROM
              |  (SELECT doc_id FROM documents
              |   WHERE ${Sampling.duckBucket100Of("doc_id")} >= 10
              |   UNION ALL SELECT doc_id FROM s3) u""".stripMargin),
      "INCREMENTAL corpus-build manifest — the delta data card: production does not rebuild a 100 TB corpus per crawl, it ADMITS each new drop against the standing corpus, and the number that ships with the release is the drop's attrition trail. Same composition contract as pl01 (FACTOR, DON'T COPY — every stage is the shipped operator's core; chain semantics survivors(k) = survivors(k-1) ∩ keep(k)), but every stage is DROP-SCOPED and the dedup stage is the INCREMENTAL one: stage 0 drop_in (sp01's 10% md5 split — dd12's own drop selector, so the manifest describes exactly the admission dd12 verdicts); stage 1 the tx12 reason histogram over the drop; stage 2 dd12's drop-vs-corpus verdicts (exact_dup/near_dup/new via incrementalVerdicts — the corpus side probed, never re-paired) over quality survivors; stage 3 contaminated-vs-clean among admitted candidates (dc01's pair set filtered to the drop's train-side docs); stage 4 the serpentine delta-pack shard loads (pk02 on the admitted set); stage 5 corpus_after = standing corpus + admissions, the accretion line a store audit reconciles against (computed as a union count — no 1-row crossJoin arithmetic). At 100 TB the asymmetry is the point: every stage is drop-sized except the dd12 probe, whose corpus side is the PERSISTED store (StreamedDedup maintains it incrementally); the manifest stays counter-grain. PipelineSpec pins every stage count against the standalone operators chained driver-side.") {
      (s, dir) =>
        val docsDf = Tables.load(s, dir, "documents")
        val di = docsDf.filter(expr(s"${Sampling.bucket100("doc_id")} < 10"))
          .select("doc_id")
        // stage cores — the shipped operators, factored
        val fc = Materialize(TextAnalysis.filterVerdicts(s, dir)
          .join(di, Seq("doc_id"), "left_semi"))
        val v = Materialize(
          Dedup.stdIncrementalVerdicts(s, dir)
            .select("doc_id", "verdict"))
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        val s1 = fc.filter(col("reason") === "kept").select("doc_id", "n_tokens")
        val cls2 = Materialize(s1.join(v, Seq("doc_id"), "left"))
        val s2 = cls2.filter(col("verdict") === "new").select("doc_id", "n_tokens")
        val cls3 = Materialize(s2
          .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
        val s3 = cls3.filter(col("is_cont").isNull).select("doc_id", "n_tokens")
        val st0 = di.agg(count(lit(1)).as("n"))
          .select(lit(0).as("stage"), lit("drop_in").as("detail"), col("n"))
        val st1 = fc.groupBy(col("reason").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(1).as("stage"), col("detail"), col("n"))
        val st2 = cls2.groupBy(col("verdict").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(2).as("stage"), col("detail"), col("n"))
        val st3 = cls3.groupBy(
            when(col("is_cont").isNotNull, "contaminated").otherwise("clean").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(3).as("stage"), col("detail"), col("n"))
        val st4 = Sampling.serpentineShardAssignments(s3)
          .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(4).as("stage"), col("detail"), col("n"))
        val st5 = docsDf.filter(expr(s"${Sampling.bucket100("doc_id")} >= 10"))
          .select("doc_id").unionByName(s3.select("doc_id"))
          .agg(count(lit(1)).as("n"))
          .select(lit(5).as("stage"), lit("corpus_after").as("detail"), col("n"))
        Seq(st0, st1, st2, st3, st4, st5).reduce(_ unionByName _)
          .select(col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
    },

    GraftQuery(
      "pl03_rewrite_manifest",
      Some(s"""WITH fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
              |cont AS (SELECT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |rem AS (SELECT doc_id, n_removed FROM ${Dedup.spanRemovedDuck} z),
              |s1 AS (SELECT doc_id, n_tokens FROM fc WHERE reason = 'kept'),
              |c2 AS (SELECT s1.doc_id, s1.n_tokens, COALESCE(rem.n_removed, 0) AS n_removed,
              |              s1.n_tokens - COALESCE(rem.n_removed, 0) AS n_clean
              |       FROM s1 LEFT JOIN rem USING (doc_id)),
              |s2 AS (SELECT * FROM c2
              |       WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |r AS (SELECT doc_id, n_clean,
              |             ROW_NUMBER() OVER (ORDER BY n_clean DESC, doc_id) AS rn
              |      FROM s2)
              |SELECT CAST(0 AS INT) AS stage, 'docs_in' AS detail, COUNT(*) AS n FROM documents
              |UNION ALL SELECT 1, reason, COUNT(*) FROM fc GROUP BY reason
              |UNION ALL SELECT 2,
              |  CASE WHEN n_removed > 0 THEN 'rewritten' ELSE 'untouched' END, COUNT(*)
              |FROM c2 GROUP BY 2
              |UNION ALL SELECT 2, 'tokens_removed',
              |  CAST(COALESCE(SUM(n_removed), 0) AS BIGINT) FROM c2
              |UNION ALL SELECT 3,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM cont)
              |       THEN 'contaminated' ELSE 'kept' END, COUNT(*)
              |FROM c2 GROUP BY 2
              |UNION ALL SELECT 4,
              |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END, COUNT(*)
              |FROM (SELECT ${Sampling.duckBucket100Of("doc_id")} AS b FROM s2) sb GROUP BY 2
              |UNION ALL SELECT 5, 'shard_' || CAST(
              |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
              |FROM r GROUP BY 2""".stripMargin),
      "REWRITE-AWARE corpus-build manifest (VERDICT r14 #4) — the Lee et al. ExactSubstr production shape: cut duplicated SPANS and keep the docs, instead of dropping whole near-duplicates, then PACK ON CLEANED COUNTS (pl01 packs original token counts — a shard balanced on pre-cut counts is unbalanced after the cut, the exact defect this variant fixes). Span-cut REPLACES whole-doc near-dedup here by measurement, not taste: dd08's min-id retention and dd18's min-id span retention are the same discipline, so every doc dd18 would cut IS a near-dup cluster member dd08 already drops — chaining both is structurally vacuous (measured on the fixture: affected-docs ∩ dd08-keepers = 0 at sf0.01); a pipeline either drops the doc or cuts its spans, and this is the cuts variant. Stage rows: docs_in; the tx12 reason histogram; the dd18 rewrite over quality survivors — rewritten vs untouched doc counts PLUS the tokens_removed line (the corpus shrinkage a data card reports; standalone dd18's corpus-global cut set restricted to survivors, the pl01 scope discipline); contaminated-vs-kept (dc01's broadcast purge set — a rewrite drops no docs, so stage 3 conserves stage 1's keep count); train/val/test over the clean corpus; and the 16 serpentine shard loads packed on n_tokens - n_removed. PipelineSpec pins token conservation (sum of cleaned = original - removed), the rewrite stage counts against standalone dd18, and both rewritten and untouched non-vacuous. At 100 TB the cut set is sized by duplicated tokens (dd18's bill, factored via spanDrops), the manifest stays counter-grain, and packing on cleaned counts is the same two-phase serpentine rank.") {
      (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val fc = Materialize(TextAnalysis.filterVerdicts(s, dir))
        val s1 = fc.filter(col("reason") === "kept").select("doc_id", "n_tokens")
        // stage core: dd18's factored cut set, reduced to per-doc counts
        val rem = Dedup.spanDrops(s, dir)
          .groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
        val cls2 = Materialize(s1.join(rem, Seq("doc_id"), "left")
          .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
          .withColumn("n_clean", col("n_tokens") - col("n_removed")))
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        val cls3 = Materialize(cls2
          .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
        val s2 = cls3.filter(col("is_cont").isNull)
          .select(col("doc_id"), col("n_clean"))
        val st0 = docs.agg(count(lit(1)).as("n"))
          .select(lit(0).as("stage"), lit("docs_in").as("detail"), col("n"))
        val st1 = fc.groupBy(col("reason").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(1).as("stage"), col("detail"), col("n"))
        val st2a = cls2.groupBy(
            when(col("n_removed") > 0, "rewritten").otherwise("untouched").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(2).as("stage"), col("detail"), col("n"))
        val st2b = cls2.agg(coalesce(sum(col("n_removed")), lit(0L)).as("n"))
          .select(lit(2).as("stage"), lit("tokens_removed").as("detail"), col("n"))
        val st3 = cls3.groupBy(
            when(col("is_cont").isNotNull, "contaminated").otherwise("kept").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(3).as("stage"), col("detail"), col("n"))
        val b = expr(Sampling.bucket100("doc_id"))
        val st4 = s2.groupBy(
            when(b < 80, "train").when(b < 90, "val").otherwise("test").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(4).as("stage"), col("detail"), col("n"))
        val st5 = Sampling.serpentineShardAssignments(
            s2.select(col("doc_id"), col("n_clean").as("n_tokens")))
          .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(5).as("stage"), col("detail"), col("n"))
        Seq(st0, st1, st2a, st2b, st3, st4, st5).reduce(_ unionByName _)
          .select(col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
    },

    GraftQuery(
      "pl04_model_gated_manifest",
      Some(s"""WITH ${TextAnalysis.perceptronCtes},
              |sc AS (SELECT f.doc_id,
              |         CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 18), i -> f.x[i] * w.w[i])) AS BIGINT) AS score
              |       FROM f, w${TextAnalysis.TxEpochs} w),
              |mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM sc),
              |th AS (SELECT CAST(k AS INT) AS k, lo + ((hi - lo) * k) // 6 AS theta
              |       FROM mm, (SELECT UNNEST(RANGE(1, 6)) AS k) t),
              |cur AS (SELECT th.k, th.theta,
              |          CAST(SUM(CASE WHEN sc.score >= th.theta THEN 1 ELSE 0 END) AS BIGINT) AS keeps
              |        FROM sc, th GROUP BY 1, 2),
              |bud AS (SELECT CAST(SUM(CASE WHEN "keep" = 1 THEN 1 ELSE 0 END) AS BIGINT) AS budget FROM fc),
              |best AS (SELECT theta FROM cur, bud ORDER BY ABS(keeps - budget), k LIMIT 1),
              |keepers AS (SELECT doc_id FROM ${Dedup.keeperIdsDuck} k),
              |cont AS (SELECT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |s1 AS (SELECT doc_id FROM sc, best WHERE score >= theta),
              |s2 AS (SELECT doc_id FROM s1 WHERE doc_id IN (SELECT doc_id FROM keepers)),
              |s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |toks AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents),
              |r AS (SELECT s3.doc_id, t.n_tokens,
              |             ROW_NUMBER() OVER (ORDER BY t.n_tokens DESC, s3.doc_id) AS rn
              |      FROM s3 JOIN toks t USING (doc_id))
              |SELECT CAST(0 AS INT) AS stage, 'docs_in' AS detail, COUNT(*) AS n FROM documents
              |UNION ALL SELECT 1,
              |  CASE WHEN score >= theta THEN 'model_keep' ELSE 'model_drop' END, COUNT(*)
              |FROM sc, best GROUP BY 2
              |UNION ALL SELECT 2,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM keepers)
              |       THEN 'kept' ELSE 'duplicate' END, COUNT(*)
              |FROM s1 GROUP BY 2
              |UNION ALL SELECT 3,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM cont)
              |       THEN 'contaminated' ELSE 'kept' END, COUNT(*)
              |FROM s2 GROUP BY 2
              |UNION ALL SELECT 4,
              |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END, COUNT(*)
              |FROM (SELECT ${Sampling.duckBucket100Of("doc_id")} AS b FROM s3) sb GROUP BY 2
              |UNION ALL SELECT 5, 'shard_' || CAST(
              |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
              |FROM r GROUP BY 2""".stripMargin),
      "MODEL-GATED corpus-build manifest — the DCLM/FineWeb production shape, closing train (tx22) -> calibrate (tx23) -> serve (tx19) -> ADMIT as one dataflow: pl01 gates on hand-written rules (tx12); production distills those rules into a linear classifier precisely so the GATE ITSELF can be the model (one broadcast dot per doc, vs the rule chain's dozen per-doc aggregations — the economic argument for model-based filtering, executed). The gate's threshold is NOT raw sign: serve-at-sign(0) drops ALL 500 fixture docs (measured — the weak 4-epoch perceptron's scores are uniformly negative; exactly why no production pipeline serves a classifier uncalibrated, and why tx23 exists). Instead the operating point is BUDGET-MATCHED from tx23's shared threshold grid: theta* = the candidate whose keep-count is closest to the rule gate's own keep-count (ties to the smaller index) — 'keep the same corpus volume the rules kept, let the model pick WHICH docs', the token-budget calibration recipe; chosen entirely from counter-grain aggregates (5-row curve x 1-row budget). Stage rows: docs_in; model_keep/model_drop at theta* (genuinely different membership from tx12's keeps — spec-pinned); then pl01's stages verbatim on the model-admitted set — kept-vs-duplicate (dd08's corpus-global keepers), kept-vs-contaminated (dc01's purge set), train/val/test split, 16 serpentine shard loads. FACTORED throughout: perceptronFeats/perceptronEpochs/thresholdGrid are tx22/tx23's exact cores, downstream stages are pl01's cores untouched, and the oracle chains the same CTEs so both engines train, calibrate, and admit identically. At 100 TB: features+labels build once (checkpointed), each epoch and the scoring pass are linear scans, calibration is counter-grain, the chain adds only doc_id-keyed semi/anti joins. PipelineSpec pins every stage count against the standalone operators chained driver-side and that the model gate differs from the rule gate.") {
      (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val feats = TextAnalysis.perceptronFeats(s, dir)
        val wf = TextAnalysis.perceptronEpochs(s, dir).last.select("w")
        val scored = Materialize(feats.crossJoin(broadcast(wf))
          .select(col("doc_id"), col("y"),
            TextAnalysis.idotOf(s, "x", "w")
              .as("score")))
        // budget-matched operating point from tx23's shared grid:
        // keep-count closest to the rule gate's keep-count (the y
        // labels ARE tx12's verdicts — no second rule pass); factored
        // (r16) so the streamed model gate serves the same definition
        val best = TextAnalysis.budgetMatchedTheta(scored)
        val gated = Materialize(scored.crossJoin(best)
          .select(col("doc_id"),
            (col("score") >= col("theta")).as("model_keep")))
        val toks = docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"))
        val keepers = Dedup.keeperIds(s, dir)
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        val s1 = Materialize(gated.filter(col("model_keep"))
          .join(toks, Seq("doc_id")).select("doc_id", "n_tokens"))
        val cls2 = Materialize(s1
          .join(keepers.withColumn("is_keeper", lit(1)), Seq("doc_id"), "left"))
        val s2 = cls2.filter(col("is_keeper").isNotNull).select("doc_id", "n_tokens")
        val cls3 = Materialize(s2
          .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
        val s3 = cls3.filter(col("is_cont").isNull).select("doc_id", "n_tokens")
        val st0 = docs.agg(count(lit(1)).as("n"))
          .select(lit(0).as("stage"), lit("docs_in").as("detail"), col("n"))
        val st1 = gated.groupBy(
            when(col("model_keep"), "model_keep").otherwise("model_drop").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(1).as("stage"), col("detail"), col("n"))
        val st2 = cls2.groupBy(
            when(col("is_keeper").isNotNull, "kept").otherwise("duplicate").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(2).as("stage"), col("detail"), col("n"))
        val st3 = cls3.groupBy(
            when(col("is_cont").isNotNull, "contaminated").otherwise("kept").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(3).as("stage"), col("detail"), col("n"))
        val b = expr(Sampling.bucket100("doc_id"))
        val st4 = s3.groupBy(
            when(b < 80, "train").when(b < 90, "val").otherwise("test").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(4).as("stage"), col("detail"), col("n"))
        val st5 = Sampling.serpentineShardAssignments(s3)
          .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(5).as("stage"), col("detail"), col("n"))
        Seq(st0, st1, st2, st3, st4, st5).reduce(_ unionByName _)
          .select(col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
    },

    GraftQuery(
      "pl05_combined_rewrite_manifest",
      Some(s"""WITH fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
              |cont AS (SELECT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |xp AS (SELECT doc_id, pos FROM ${Dedup.spanDropPosDuck} z),
              |ip AS (SELECT doc_id, pos FROM ${Dedup.intraDropPosDuck} z),
              |ru AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed FROM
              |       (SELECT doc_id, pos FROM xp UNION SELECT doc_id, pos FROM ip) u GROUP BY 1),
              |rx AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cross FROM xp GROUP BY 1),
              |ri AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_intra FROM ip GROUP BY 1),
              |s1 AS (SELECT doc_id, n_tokens FROM fc WHERE reason = 'kept'),
              |c2 AS (SELECT s1.doc_id, s1.n_tokens,
              |              COALESCE(ru.n_removed, 0) AS n_removed,
              |              COALESCE(rx.n_cross, 0) AS n_cross,
              |              COALESCE(ri.n_intra, 0) AS n_intra,
              |              s1.n_tokens - COALESCE(ru.n_removed, 0) AS n_clean
              |       FROM s1 LEFT JOIN ru USING (doc_id)
              |               LEFT JOIN rx USING (doc_id)
              |               LEFT JOIN ri USING (doc_id)),
              |s2 AS (SELECT * FROM c2
              |       WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
              |r AS (SELECT doc_id, n_clean,
              |             ROW_NUMBER() OVER (ORDER BY n_clean DESC, doc_id) AS rn
              |      FROM s2)
              |SELECT CAST(0 AS INT) AS stage, 'docs_in' AS detail, COUNT(*) AS n FROM documents
              |UNION ALL SELECT 1, reason, COUNT(*) FROM fc GROUP BY reason
              |UNION ALL SELECT 2,
              |  CASE WHEN n_removed > 0 THEN 'rewritten' ELSE 'untouched' END, COUNT(*)
              |FROM c2 GROUP BY 2
              |UNION ALL SELECT 2, 'tokens_removed_crossdoc',
              |  CAST(COALESCE(SUM(n_cross), 0) AS BIGINT) FROM c2
              |UNION ALL SELECT 2, 'tokens_removed_intradoc',
              |  CAST(COALESCE(SUM(n_intra), 0) AS BIGINT) FROM c2
              |UNION ALL SELECT 2, 'tokens_removed',
              |  CAST(COALESCE(SUM(n_removed), 0) AS BIGINT) FROM c2
              |UNION ALL SELECT 3,
              |  CASE WHEN doc_id IN (SELECT doc_id FROM cont)
              |       THEN 'contaminated' ELSE 'kept' END, COUNT(*)
              |FROM c2 GROUP BY 2
              |UNION ALL SELECT 4,
              |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END, COUNT(*)
              |FROM (SELECT ${Sampling.duckBucket100Of("doc_id")} AS b FROM s2) sb GROUP BY 2
              |UNION ALL SELECT 5, 'shard_' || CAST(
              |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
              |FROM r GROUP BY 2""".stripMargin),
      "COMBINED-rewrite corpus-build manifest (VERDICT r15 #6) — both rewrite axes scrubbed in ONE pass, the way a production cleanup actually runs: pl03 cuts cross-doc shared spans (dd18's Lee et al. ExactSubstr cut) and dd19 cuts within-doc repetition (the Rae et al./Gopher pathology), but a pipeline that rewrote the corpus twice would pay the posexplode/reassembly bill twice and ship two intermediate corpora; both cut sets are POSITION-GRAIN (doc_id, pos) frames, so their UNION-distinct IS the combined interval merge at token resolution — a position cut by a cross-doc span AND by intra-doc repetition costs its token exactly once, and dd18's factored rewrite machinery consumes the merged set unchanged. Stage rows are pl03's with the rewrite stage carrying BOTH families' attribution: rewritten/untouched doc counts on the merged set, tokens_removed_crossdoc (spanDrops restricted to quality survivors), tokens_removed_intradoc (intraDrops, same scope), and tokens_removed = the union count — the line that makes the double-count visible as data: crossdoc + intradoc >= combined, with equality exactly when no position sits in both cut sets (the data card's overlap report). Downstream stages are pl03's verbatim: contamination drops no docs (stage 3 conserves stage 1's keeps), split over the clean corpus, serpentine shards packed on n_tokens - combined n_removed. FACTORED throughout — spanDrops/intraDrops are dd18/dd19's exact cores (one Spark definition, one SQL text each, pl05 adds only the union); at 100 TB both frames are sized by duplicated tokens, the union-distinct is one (doc_id, pos) shuffle over them, and the manifest stays counter-grain. PipelineSpec pins token conservation (sum cleaned = original - union removed), each family line against its standalone operator restricted to survivors, and union <= sum of the families.") {
      (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val fc = Materialize(TextAnalysis.filterVerdicts(s, dir))
        val s1 = fc.filter(col("reason") === "kept").select("doc_id", "n_tokens")
        // the combined cut set: dd18's and dd19's factored position
        // frames, union-distinct = the interval merge across families
        val xp = Dedup.spanDrops(s, dir)
        val ip = Dedup.intraDrops(s, dir)
        val ru = xp.unionByName(ip).distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
        val rx = xp.groupBy("doc_id").agg(count(lit(1)).as("n_cross"))
        val ri = ip.groupBy("doc_id").agg(count(lit(1)).as("n_intra"))
        val cls2 = Materialize(s1
          .join(ru, Seq("doc_id"), "left")
          .join(rx, Seq("doc_id"), "left")
          .join(ri, Seq("doc_id"), "left")
          .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
          .withColumn("n_cross", coalesce(col("n_cross"), lit(0L)))
          .withColumn("n_intra", coalesce(col("n_intra"), lit(0L)))
          .withColumn("n_clean", col("n_tokens") - col("n_removed")))
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        val cls3 = Materialize(cls2
          .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
        val s2 = cls3.filter(col("is_cont").isNull)
          .select(col("doc_id"), col("n_clean"))
        val st0 = docs.agg(count(lit(1)).as("n"))
          .select(lit(0).as("stage"), lit("docs_in").as("detail"), col("n"))
        val st1 = fc.groupBy(col("reason").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(1).as("stage"), col("detail"), col("n"))
        val st2a = cls2.groupBy(
            when(col("n_removed") > 0, "rewritten").otherwise("untouched").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(2).as("stage"), col("detail"), col("n"))
        val st2b = cls2.agg(coalesce(sum(col("n_cross")), lit(0L)).as("n"))
          .select(lit(2).as("stage"), lit("tokens_removed_crossdoc").as("detail"), col("n"))
        val st2c = cls2.agg(coalesce(sum(col("n_intra")), lit(0L)).as("n"))
          .select(lit(2).as("stage"), lit("tokens_removed_intradoc").as("detail"), col("n"))
        val st2d = cls2.agg(coalesce(sum(col("n_removed")), lit(0L)).as("n"))
          .select(lit(2).as("stage"), lit("tokens_removed").as("detail"), col("n"))
        val st3 = cls3.groupBy(
            when(col("is_cont").isNotNull, "contaminated").otherwise("kept").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(3).as("stage"), col("detail"), col("n"))
        val b = expr(Sampling.bucket100("doc_id"))
        val st4 = s2.groupBy(
            when(b < 80, "train").when(b < 90, "val").otherwise("test").as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(4).as("stage"), col("detail"), col("n"))
        val st5 = Sampling.serpentineShardAssignments(
            s2.select(col("doc_id"), col("n_clean").as("n_tokens")))
          .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
          .agg(count(lit(1)).as("n")).select(lit(5).as("stage"), col("detail"), col("n"))
        Seq(st0, st1, st2a, st2b, st2c, st2d, st3, st4, st5).reduce(_ unionByName _)
          .select(col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
    },

    GraftQuery(
      "pl06_unit_priced_shards",
      Some(s"""WITH uv AS MATERIALIZED (SELECT * FROM ${TextAnalysis.bpeUnitVocabDuck} z),
              |fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
              |cont AS (SELECT train_doc AS doc_id FROM (${Decontam.pairsDuck}
              |         SELECT DISTINCT train_doc FROM pairs) c),
              |xp AS (SELECT doc_id, pos FROM ${Dedup.spanDropPosDuck} z),
              |ip AS (SELECT doc_id, pos FROM ${Dedup.intraDropPosDuck} z),
              |cut AS (SELECT doc_id, pos FROM xp UNION SELECT doc_id, pos FROM ip),
              |tk AS (SELECT doc_id, i AS pos, a[i] AS tok
              |       FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS a FROM documents) d,
              |            UNNEST(RANGE(1, LEN(a) + 1)) AS t(i)),
              |ck AS (SELECT tk.doc_id,
              |              CASE WHEN uv.u IS NOT NULL THEN uv.u ELSE 1 END AS u
              |       FROM tk LEFT JOIN uv USING (tok)
              |       WHERE NOT EXISTS (SELECT 1 FROM cut
              |                         WHERE cut.doc_id = tk.doc_id AND cut.pos = tk.pos)),
              |cu AS (SELECT doc_id, CAST(SUM(u) AS BIGINT) AS n_clean_units,
              |              CAST(COUNT(*) AS BIGINT) AS n_clean_tokens
              |       FROM ck GROUP BY 1),
              |s2 AS (SELECT f.doc_id,
              |              COALESCE(cu.n_clean_units, 0) AS n_clean_units,
              |              COALESCE(cu.n_clean_tokens, 0) AS n_clean_tokens
              |       FROM fc f LEFT JOIN cu USING (doc_id)
              |       WHERE f.reason = 'kept'
              |         AND f.doc_id NOT IN (SELECT doc_id FROM cont)),
              |r AS (SELECT doc_id, n_clean_units, n_clean_tokens,
              |             ROW_NUMBER() OVER (ORDER BY n_clean_units DESC, doc_id) AS rn
              |      FROM s2)
              |SELECT CAST(CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |                 ELSE 15 - (rn - 1) % 16 END AS INT) AS shard,
              |       COUNT(*) AS n_docs,
              |       CAST(SUM(n_clean_units) AS BIGINT) AS shard_units,
              |       CAST(SUM(n_clean_tokens) AS BIGINT) AS shard_tokens
              |FROM r GROUP BY 1""".stripMargin),
      "UNIT-PRICED pipeline shards — pk05's argument composed with pl05's rewrite, the composition that prices what the GPU ACTUALLY receives: pl05 packs shards on n_tokens - n_removed (whitespace tokens of the REWRITTEN text) and pk05 packs on BPE units of the ORIGINAL text, but the corpus the trainer loads is rewritten AND unit-priced — a shard balanced in either proxy is unbalanced in rewritten-units exactly when the cut positions' unit density differs from the corpus average (duplicated spans are low-entropy boilerplate, i.e. SHORT-unit words — the cut removes disproportionately few units per token, so clean-token and clean-unit ranks genuinely diverge). The unit arithmetic is DROP-SIZED because tx21's encode is per-WORD (BPE merges never cross whitespace): clean units = n_bpe_units - sum of units at the cut positions, so the only position-grain frame is over AFFECTED docs (dd18's rewrite discipline — the left-semi to cut docs), joined to the broadcast vocabulary unit table via the factored bpeUnitVocab core (one definition with tx21/pk05/pk06); untouched docs price at doc grain straight from bpeUnits. Scope is pl05's corpus verbatim (quality keeps minus contaminated, both cut families union-distinct at position grain via the factored spanDrops/intraDrops cores), deal is the shipped serpentine core on n_clean_units, output per shard carries BOTH clean loads so the proxy-vs-real comparison reads off the table. The oracle chains the shared SQL texts (bpeUnitVocabDuck, filterVerdictsDuck, spanDropPosDuck, intraDropPosDuck, pairsDuck) through the direct spelling — sum units over NON-cut positions — algebraically identical to the shipped drop-sized form, exact integers throughout, so a factoring bug on either side hash-fails. PipelineSpec pins unit conservation (shard_units sum = corpus clean units computed independently), token identity with pl05's packing input, and the divergence claim (unit-rank and token-rank genuinely disagree on the fixture). At 100 TB: the encode is tx21's priced vocabulary fold, the cut-unit bill is sized by duplicated tokens, and the deal is pk02's two-phase rank — the composition adds NO new fact-scale shuffle over what pl05 + tx21 already pay.") {
      (s, dir) =>
        val fc = Materialize(TextAnalysis.filterVerdicts(s, dir))
        val s1 = fc.filter(col("reason") === "kept").select("doc_id", "n_tokens")
        val cut = Materialize(Dedup.spanDrops(s, dir)
          .unionByName(Dedup.intraDrops(s, dir)).distinct())
        val du = Materialize(TextAnalysis.bpeUnits(s, dir))
        val uv = Materialize(TextAnalysis.bpeUnitVocab(s, dir))
        // units at the cut positions: the position index is built over
        // AFFECTED docs only (left-semi) — sized by duplicated tokens
        val toksAff = Tables.load(s, dir, "documents")
          .join(cut.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
        val cutU = cut.join(toksAff, Seq("doc_id", "pos"))
          .join(broadcast(uv), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(sum(coalesce(col("u"), lit(1L))).as("cut_units"),
            count(lit(1)).as("cut_tokens"))
        val cont = Decontam.overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        val s2 = s1
          .join(du.select("doc_id", "n_bpe_units"), Seq("doc_id"))
          .join(cutU, Seq("doc_id"), "left")
          .join(broadcast(cont.withColumn("c", lit(1))), Seq("doc_id"), "left")
          .filter(col("c").isNull)
          .select(col("doc_id"),
            (col("n_bpe_units") - coalesce(col("cut_units"), lit(0L)))
              .as("n_clean_units"),
            (col("n_tokens").cast("long") - coalesce(col("cut_tokens"), lit(0L)))
              .as("n_clean_tokens"))
        Sampling.serpentineShardAssignments(
            s2.select(col("doc_id"), col("n_clean_units").as("n_tokens")))
          .select(col("doc_id"), col("shard"))
          .join(s2, Seq("doc_id"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_clean_units")).cast("bigint").as("shard_units"),
            sum(col("n_clean_tokens")).cast("bigint").as("shard_tokens"))
    },

    GraftQuery(
      "pl07_registry_admission",
      Some(registryAdmissionDuck),
      "REGISTRY-SNAPSHOT ADMISSION — the pipeline's decontam stage against a LIVE, MUTATING benchmark registry (r19, composing dc07/dc08's store into pl02's chain): pl02's bench index is frozen at seed time, but production eval suites accrete WHILE the pipeline runs, and the naive fix — read the live registry per batch — breaks the at-least-once contract (a replayed batch would see releases its first run didn't, admitting differently on replay). The protocol is SNAPSHOT ISOLATION: each batch's first run records the registry's live release set under benchset/batch_id=N BEFORE any output (crash-safe: Spark's _SUCCESS marker distinguishes a committed snapshot from a torn write), and every run — first or replay — serves the index restricted to the RECORDED set, tombstone-blind, so accretions and retractions take effect at the NEXT batch boundary and never rewrite history. THIS query is the batch twin over two sequential drops with a release landing between them: drop 1 (md5 bucket [0,5)) admits under snapshot {A}, release B ([95,100)) arrives, drop 2 ([5,10)) admits under {A, B} — and the docs drop 1 admitted that B would have flagged are EXACTLY what dc07's retroactive audit exists to find (the two operators are one lifecycle: forward admission under the snapshot, backward audit when the registry grows). Every stage is the shipped core — tx12 quality, dd12's store verdicts with drop 2 probing the store AS LEFT BY drop 1's admissions (sequential accretion, the dd23 oracle's discipline), dc01's pair rule via the factored flaggedPairsAgainstIndex, pk02's serpentine pack — and stage 3 gains per-release ATTRIBUTION rows (release_<id>, distinct flagged docs, zeros explicit: a release in the snapshot that flags nothing is 'checked and clean', dc03's contract). THE ORACLE REPLAYS THE WHOLE TWO-BATCH PROTOCOL in SQL — both stores, both snapshots, the sequential df-cap recomputation over the accreted vocabulary — so a snapshot leak (drop 1 seeing B), a stale store (drop 2 missing drop 1's admissions), or an attribution miscount all hash-fail. StreamedPipelineSpec pins the STREAMED protocol against this twin across a checkpointed kill/resume with the registry mutating mid-stream, including the headline replay pin: retract B, replay batch 2, the recorded snapshot wins. At 100 TB: the snapshot is a release-count-sized read; everything else prices exactly as pl02.") {
      (s, dir) =>
        val docsDf = Tables.spread(Tables.load(s, dir, "documents"), "doc_id")
        val b = expr(Sampling.bucket100("doc_id"))
        val d1 = Materialize(docsDf.filter(b < 5).select("doc_id", "text"))
        val d2 = Materialize(
          docsDf.filter(b >= 5 && b < 10).select("doc_id", "text"))
        val corp = docsDf.filter(b >= 10).select("doc_id", "text")
        // the registry's per-release indexes (rarity = corpus-wide df,
        // BenchmarkRegistry.create's frozen statistic)
        val rs = Decontam.rareShingles(s, dir)
        val idxA = rs.filter(col("b") >= 90 && col("b") < 95)
          .select(col("doc_id").as("test_doc"), col("g"), lit(-1L).as("rel_id"))
        val idxB = rs.filter(col("b") >= 95)
          .select(col("doc_id").as("test_doc"), col("g"), lit(0L).as("rel_id"))
        val fc = TextAnalysis.filterVerdicts(s, dir)

        /** One drop through the chain — the streamed processBatch's
          * registry branch, batch-twinned. Returns (admitted docs,
          * manifest rows).
          */
        def admitDrop(batchId: Int, drop: DataFrame,
            exact: DataFrame, rare: DataFrame, ec: DataFrame,
            idx: DataFrame, snapIds: Seq[Long],
            corpusSoFar: DataFrame): (DataFrame, DataFrame) = {
          val fcd = Materialize(
            fc.join(drop.select("doc_id"), Seq("doc_id"), "left_semi"))
          val s1 = fcd.filter(col("reason") === "kept")
            .select("doc_id", "n_tokens")
          val probeDocs = Materialize(
            drop.join(s1.select("doc_id"), Seq("doc_id"), "left_semi"))
          val v = Materialize(
            Dedup.verdictsAgainstStoreOver(s, probeDocs, exact, rare, ec)
              .select("doc_id", "verdict"))
          val cls2 = Materialize(s1.join(v, Seq("doc_id"), "left"))
          val s2 = cls2.filter(col("verdict") === "new")
            .select("doc_id", "n_tokens")
          val decIn = drop.join(s2.select("doc_id"), Seq("doc_id"), "left_semi")
          val pairs = Materialize(Decontam.flaggedPairsAgainstIndex(
            s, decIn, idx.select("test_doc", "g")))
          val cont = pairs.select(col("train_doc").as("doc_id")).distinct()
          val cls3 = Materialize(s2
            .join(broadcast(cont.withColumn("is_cont", lit(1))), Seq("doc_id"), "left"))
          val s3 = Materialize(cls3.filter(col("is_cont").isNull)
            .select("doc_id", "n_tokens"))
          import s.implicits._
          val snapDf = snapIds.toDF("rel_id")
          val perRelease = snapDf
            .join(pairs
              .join(idx.select("test_doc", "rel_id").distinct(), "test_doc")
              .groupBy("rel_id")
              .agg(countDistinct(col("train_doc")).as("n")),
              Seq("rel_id"), "left")
            .select(lit(3).as("stage"),
              concat(lit("release_"), col("rel_id").cast("string")).as("detail"),
              coalesce(col("n"), lit(0L)).as("n"))
          val st0 = drop.agg(count(lit(1)).as("n"))
            .select(lit(0).as("stage"), lit("drop_in").as("detail"), col("n"))
          val st1 = fcd.groupBy(col("reason").as("detail"))
            .agg(count(lit(1)).as("n"))
            .select(lit(1).as("stage"), col("detail"), col("n"))
          val st2 = cls2.groupBy(col("verdict").as("detail"))
            .agg(count(lit(1)).as("n"))
            .select(lit(2).as("stage"), col("detail"), col("n"))
          val st3 = cls3.groupBy(
              when(col("is_cont").isNotNull, "contaminated")
                .otherwise("clean").as("detail"))
            .agg(count(lit(1)).as("n"))
            .select(lit(3).as("stage"), col("detail"), col("n"))
          val st4 = Sampling.serpentineShardAssignments(s3)
            .groupBy(concat(lit("shard_"), col("shard").cast("string")).as("detail"))
            .agg(count(lit(1)).as("n"))
            .select(lit(4).as("stage"), col("detail"), col("n"))
          val st5 = corpusSoFar.select("doc_id")
            .unionByName(s3.select("doc_id"))
            .agg(count(lit(1)).as("n"))
            .select(lit(5).as("stage"), lit("corpus_after").as("detail"), col("n"))
          val rows = Seq(st0, st1, st2, st3, perRelease, st4, st5)
            .reduce(_ unionByName _)
            .select(lit(batchId.toLong).as("batch_id"),
              col("stage").cast("int"), col("detail"), col("n").cast("bigint"))
          (drop.join(s3.select("doc_id"), Seq("doc_id"), "left_semi"), rows)
        }

        // the standing store's tables are the SAME [10,100) slice dd12
        // probes — StageStore-memoized INCLUDING the df-capped
        // vocabulary and capped postings (r19; drop 1 probes persisted
        // artifacts instead of re-deriving + re-checkpointing them)
        val exact0 = Dedup.stdCorpusExact(s, dir)
        val post0 = Dedup.stdCorpusPostings(s, dir)
        val (adm1, rows1) = admitDrop(0, d1, exact0,
          Dedup.stdRare(s, dir), Dedup.stdEc(s, dir),
          idxA, Seq(-1L), corp)
        // the store AS LEFT BY drop 1 (sequential accretion — the
        // growth-bound anti-join is structural here: an admitted doc's
        // fp cannot already be in the store, its verdict was 'new');
        // the df cap is RECOMPUTED over the accreted vocabulary — that
        // recomputation IS the protocol, so it stays fresh
        val exact1 = exact0.unionByName(Dedup.corpusExact(adm1))
        val post1 = post0.unionByName(Dedup.corpusPostings(s, adm1))
        val rare1 = Dedup.dfCapped(post1)
        val ec1 = Materialize(post1.join(rare1, "g"))
        val (_, rows2) = admitDrop(1, d2, exact1, rare1, ec1,
          idxA.unionByName(idxB), Seq(-1L, 0L),
          corp.select("doc_id").unionByName(adm1.select("doc_id")))
        rows1.unionByName(rows2)
    })

  /** pl07's oracle: the full two-batch registry-snapshot admission
    * protocol replayed in SQL — sequential stores (drop 2 verdicts
    * against the vocabulary AS LEFT BY drop 1's admissions, df cap
    * recomputed, the erasedStoreDuck discipline), per-drop snapshots
    * ({A} then {A, B}), per-release attribution with explicit zeros.
    */
  private lazy val registryAdmissionDuck: String = {
    val sh = Dedup.shingleDuck
    s"""WITH dall AS (SELECT doc_id, text,
       |               ${Sampling.duckBucket100Of("doc_id")} AS bkt FROM documents),
       |fc AS (SELECT * FROM ${TextAnalysis.filterVerdictsDuck}),
       |toks AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens FROM documents),
       |d1 AS (SELECT doc_id, text FROM dall WHERE bkt < 5),
       |d2 AS (SELECT doc_id, text FROM dall WHERE bkt >= 5 AND bkt < 10),
       |corp AS (SELECT doc_id, text FROM dall WHERE bkt >= 10),
       |allp AS (SELECT doc_id, bkt, UNNEST($sh) AS g
       |         FROM (SELECT doc_id, bkt, STRING_SPLIT(text, ' ') AS w FROM dall)),
       |rrare AS (SELECT g FROM allp GROUP BY g HAVING COUNT(*) <= ${Dedup.DfCap}),
       |idxa AS (SELECT doc_id AS test_doc, a.g FROM allp a JOIN rrare USING (g)
       |         WHERE bkt >= 90 AND bkt < 95),
       |idxb AS (SELECT doc_id AS test_doc, a.g FROM allp a JOIN rrare USING (g)
       |         WHERE bkt >= 95),
       |s1a AS (SELECT fc.doc_id, fc.n_tokens FROM fc
       |        JOIN d1 USING (doc_id) WHERE reason = 'kept'),
       |s1b AS (SELECT fc.doc_id, fc.n_tokens FROM fc
       |        JOIN d2 USING (doc_id) WHERE reason = 'kept'),
       |sx AS (SELECT md5(text) AS fp, MIN(doc_id) AS cid FROM corp GROUP BY 1),
       |cpost AS (SELECT doc_id, UNNEST($sh) AS g
       |          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM corp)),
       |rare0 AS (SELECT g FROM cpost GROUP BY g HAVING COUNT(*) <= ${Dedup.DfCap}),
       |ec0 AS (SELECT p.doc_id, p.g FROM cpost p JOIN rare0 USING (g)),
       |nc0 AS (SELECT doc_id, COUNT(*) AS n FROM ec0 GROUP BY 1),
       |pr1 AS (SELECT d.doc_id, d.text FROM d1 d JOIN s1a USING (doc_id)),
       |p1post AS (SELECT doc_id, UNNEST($sh) AS g
       |           FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM pr1)),
       |e1 AS (SELECT e.doc_id, e.g FROM p1post e JOIN rare0 USING (g)),
       |ni1 AS (SELECT doc_id, COUNT(*) AS n FROM e1 GROUP BY 1),
       |pp1 AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
       |        FROM e1 i JOIN ec0 c ON i.g = c.g GROUP BY 1, 2),
       |near1 AS (SELECT pp1.di AS doc_id FROM pp1
       |          JOIN ni1 ON ni1.doc_id = pp1.di JOIN nc0 ON nc0.doc_id = pp1.dc
       |          WHERE CAST(shared AS DOUBLE) / (ni1.n + nc0.n - shared) >= 0.8
       |          GROUP BY 1),
       |ex1 AS (SELECT p.doc_id FROM pr1 p JOIN sx ON md5(p.text) = sx.fp GROUP BY 1),
       |v1 AS (SELECT s.doc_id,
       |         CASE WHEN s.doc_id IN (SELECT doc_id FROM ex1) THEN 'exact_dup'
       |              WHEN s.doc_id IN (SELECT doc_id FROM near1) THEN 'near_dup'
       |              ELSE 'new' END AS verdict
       |       FROM s1a s),
       |s2a AS (SELECT doc_id FROM v1 WHERE verdict = 'new'),
       |dec1 AS (SELECT doc_id, UNNEST($sh) AS g
       |         FROM (SELECT d.doc_id, STRING_SPLIT(d.text, ' ') AS w
       |               FROM d1 d JOIN s2a USING (doc_id))),
       |f1 AS (SELECT t.doc_id AS train_doc, i.test_doc, COUNT(*) AS n
       |       FROM dec1 t JOIN idxa i USING (g)
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       |cont1 AS (SELECT DISTINCT train_doc AS doc_id FROM f1),
       |s3a AS (SELECT doc_id FROM s2a
       |        WHERE doc_id NOT IN (SELECT doc_id FROM cont1)),
       |adm AS (SELECT d.doc_id, d.text FROM d1 d JOIN s3a USING (doc_id)),
       |admx AS (SELECT md5(text) AS fp, MIN(doc_id) AS cid FROM adm GROUP BY 1),
       |storex AS (SELECT fp, cid FROM sx UNION ALL SELECT fp, cid FROM admx),
       |apost AS (SELECT doc_id, UNNEST($sh) AS g
       |          FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM adm)),
       |post1 AS (SELECT doc_id, g FROM cpost UNION ALL SELECT doc_id, g FROM apost),
       |rare1 AS (SELECT g FROM post1 GROUP BY g HAVING COUNT(*) <= ${Dedup.DfCap}),
       |ec1s AS (SELECT p.doc_id, p.g FROM post1 p JOIN rare1 USING (g)),
       |nc1 AS (SELECT doc_id, COUNT(*) AS n FROM ec1s GROUP BY 1),
       |pr2 AS (SELECT d.doc_id, d.text FROM d2 d JOIN s1b USING (doc_id)),
       |p2post AS (SELECT doc_id, UNNEST($sh) AS g
       |           FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM pr2)),
       |e2 AS (SELECT e.doc_id, e.g FROM p2post e JOIN rare1 USING (g)),
       |ni2 AS (SELECT doc_id, COUNT(*) AS n FROM e2 GROUP BY 1),
       |pp2 AS (SELECT i.doc_id AS di, c.doc_id AS dc, COUNT(*) AS shared
       |        FROM e2 i JOIN ec1s c ON i.g = c.g GROUP BY 1, 2),
       |near2 AS (SELECT pp2.di AS doc_id FROM pp2
       |          JOIN ni2 ON ni2.doc_id = pp2.di JOIN nc1 ON nc1.doc_id = pp2.dc
       |          WHERE CAST(shared AS DOUBLE) / (ni2.n + nc1.n - shared) >= 0.8
       |          GROUP BY 1),
       |ex2 AS (SELECT p.doc_id FROM pr2 p
       |        JOIN storex ON md5(p.text) = storex.fp GROUP BY 1),
       |v2 AS (SELECT s.doc_id,
       |         CASE WHEN s.doc_id IN (SELECT doc_id FROM ex2) THEN 'exact_dup'
       |              WHEN s.doc_id IN (SELECT doc_id FROM near2) THEN 'near_dup'
       |              ELSE 'new' END AS verdict
       |       FROM s1b s),
       |s2b AS (SELECT doc_id FROM v2 WHERE verdict = 'new'),
       |dec2 AS (SELECT doc_id, UNNEST($sh) AS g
       |         FROM (SELECT d.doc_id, STRING_SPLIT(d.text, ' ') AS w
       |               FROM d2 d JOIN s2b USING (doc_id))),
       |idxab AS (SELECT test_doc, g, -1 AS rel_id FROM idxa
       |          UNION ALL SELECT test_doc, g, 0 FROM idxb),
       |f2 AS (SELECT t.doc_id AS train_doc, i.test_doc, COUNT(*) AS n
       |       FROM dec2 t JOIN idxab i USING (g)
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       |relmap AS (SELECT DISTINCT test_doc, -1 AS rel_id FROM idxa
       |           UNION ALL SELECT DISTINCT test_doc, 0 FROM idxb),
       |cont2 AS (SELECT DISTINCT train_doc AS doc_id FROM f2),
       |s3b AS (SELECT doc_id FROM s2b
       |        WHERE doc_id NOT IN (SELECT doc_id FROM cont2)),
       |r1 AS (SELECT s3a.doc_id, t.n_tokens,
       |              ROW_NUMBER() OVER (ORDER BY t.n_tokens DESC, s3a.doc_id) AS rn
       |       FROM s3a JOIN toks t USING (doc_id)),
       |r2 AS (SELECT s3b.doc_id, t.n_tokens,
       |              ROW_NUMBER() OVER (ORDER BY t.n_tokens DESC, s3b.doc_id) AS rn
       |       FROM s3b JOIN toks t USING (doc_id))
       |SELECT CAST(0 AS BIGINT) AS batch_id, CAST(0 AS INT) AS stage,
       |       'drop_in' AS detail, COUNT(*) AS n FROM d1
       |UNION ALL SELECT 0, 1, reason, COUNT(*) FROM fc
       |  WHERE doc_id IN (SELECT doc_id FROM d1) GROUP BY 3
       |UNION ALL SELECT 0, 2, verdict, COUNT(*) FROM v1 GROUP BY 3
       |UNION ALL SELECT 0, 3,
       |  CASE WHEN doc_id IN (SELECT doc_id FROM cont1)
       |       THEN 'contaminated' ELSE 'clean' END, COUNT(*)
       |FROM s2a GROUP BY 3
       |UNION ALL SELECT 0, 3, 'release_-1',
       |  (SELECT COUNT(DISTINCT train_doc) FROM f1)
       |UNION ALL SELECT 0, 4, 'shard_' || CAST(
       |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
       |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
       |FROM r1 GROUP BY 3
       |UNION ALL SELECT 0, 5, 'corpus_after', COUNT(*) FROM
       |  (SELECT doc_id FROM corp UNION ALL SELECT doc_id FROM s3a) u1
       |UNION ALL SELECT 1, 0, 'drop_in', COUNT(*) FROM d2
       |UNION ALL SELECT 1, 1, reason, COUNT(*) FROM fc
       |  WHERE doc_id IN (SELECT doc_id FROM d2) GROUP BY 3
       |UNION ALL SELECT 1, 2, verdict, COUNT(*) FROM v2 GROUP BY 3
       |UNION ALL SELECT 1, 3,
       |  CASE WHEN doc_id IN (SELECT doc_id FROM cont2)
       |       THEN 'contaminated' ELSE 'clean' END, COUNT(*)
       |FROM s2b GROUP BY 3
       |UNION ALL SELECT 1, 3, 'release_' || CAST(sn.rel_id AS VARCHAR),
       |  COALESCE(cnts.n, 0)
       |FROM (VALUES (-1), (0)) sn(rel_id)
       |LEFT JOIN (SELECT rm.rel_id, COUNT(DISTINCT f2.train_doc) AS n
       |           FROM f2 JOIN relmap rm USING (test_doc)
       |           GROUP BY 1) cnts USING (rel_id)
       |UNION ALL SELECT 1, 4, 'shard_' || CAST(
       |  CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
       |       ELSE 15 - (rn - 1) % 16 END AS VARCHAR), COUNT(*)
       |FROM r2 GROUP BY 3
       |UNION ALL SELECT 1, 5, 'corpus_after', COUNT(*) FROM
       |  (SELECT doc_id FROM corp UNION ALL SELECT doc_id FROM s3a
       |   UNION ALL SELECT doc_id FROM s3b) u2""".stripMargin
  }
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test-leakage check every
  * training-data pipeline runs before shipping a corpus (harness
  * extension family, SURVEY.md §2.3): find training documents that
  * share enough rare n-grams with the held-out split to contaminate an
  * evaluation, then purge them.
  *
  * Composes three existing pieces end-to-end, on identical semantics:
  * the deterministic md5-bucket split ([[Sampling]] — sp05's 80/10/10
  * assignment defines "train" and "test" here, so the split being
  * decontaminated is the split the sampler actually emits), the
  * compiled `graft_shingles` word-trigram expression, and [[Dedup]]'s
  * document-frequency cap.
  *
  * Scale design (100 TB stance):
  *  - candidates meet in a shingle equi-join, never doc × doc: join
  *    volume is Σ_g train_df(g) · test_df(g), and the df cap (≤
  *    [[Dedup.DfCap]] docs corpus-wide) bounds every term — a frequent
  *    trigram ("in the the") is a skew bomb with no contamination
  *    signal, exactly the dd05 argument;
  *  - the held-out side is the SMALL side by construction (a benchmark
  *    is a few thousand docs against a 100 TB corpus), so its shingle
  *    index is `broadcast()` — the train corpus is filtered map-side
  *    and never shuffles on the shingle key;
  *  - the shared capped index is pinned once ([[Materialize]]) — it
  *    feeds the train and test branches;
  *  - the purge (dc02) is a broadcast LEFT ANTI join on the tiny
  *    contaminated-id set: the corpus streams through untouched.
  */
object Decontam {

  /** Min shared rare trigrams for a (train, test) pair to be flagged.
    * At sf0.01 this yields 21 contaminated pairs (max overlap 81 — the
    * corpus's clone families straddle the split); random cross-split
    * pairs share ~0.4 rare trigrams, so 3 is far above chance.
    */
  private val Overlap = 3

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Df-capped shingle postings tagged with the sp05 split bucket:
    * `(doc_id, b, g)`, pinned (feeds both join sides).
    */
  private[operators] def rareShingles(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "rareshing")(rareShinglesFresh(s, dir))

  /** The un-memoized build behind [[rareShingles]] (r19 optimization
    * round: pl07 consumed the frame directly per run — a full-corpus
    * shingle + df-cap pass + checkpoint per consumer — and every other
    * consumer reached it through [[pairCountsFresh]], itself a memo
    * build; the postings ARE the persisted index the operator docs
    * describe). StageStoreSpec pins store == fresh.
    */
  private[graft] def rareShinglesFresh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = docs(s, dir).withColumn("b", expr(Sampling.bucket100("doc_id")))
    val e = Tables.spread(d, "doc_id")
      .select(col("doc_id"), col("b"), explode(expr("graft_shingles(text)")).as("g"))
    val rare = e.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.DfCap).select("g")
    e.join(rare, "g").select("doc_id", "b", "g")
  }

  /** The PERSISTABLE benchmark-side contamination index `(test_doc,
    * g)`: the held-out split's df-capped rare-shingle postings — what
    * a production pipeline builds ONCE per benchmark release and every
    * admission batch probes (r15, the streamed pipeline's decontam
    * stage). Rarity (df <= cap) is computed over the full corpus at
    * index-build time, exactly dc01's definition — the standing-index
    * trade: df stats freeze at build time and the index is rebuilt on
    * benchmark (or major corpus) releases, never per batch.
    */
  private[operators] def benchmarkIndex(s: SparkSession, dir: String): DataFrame =
    rareShingles(s, dir).filter(col("b") >= 90)
      .select(col("doc_id").as("test_doc"), col("g"))

  /** Batch docs contaminated against a persisted [[benchmarkIndex]]:
    * `(doc_id)` of every incoming doc sharing >= [[Overlap]] rare
    * trigrams with SOME single benchmark doc — dc01's pair rule with
    * the train side swapped for the batch. The batch side needs no
    * df filter of its own: the join key must be in the index, and the
    * index holds only rare shingles (both sides' postings are
    * per-doc-distinct via `graft_shingles`, so the pair count is the
    * intersection size, exactly dc01's). Index broadcasts — benchmark
    * postings are eval-set-sized by construction; the batch side is
    * batch-sized. Zero corpus-side work per batch.
    */
  private[operators] def contaminatedAgainstIndex(
      s: SparkSession, inc: DataFrame, index: DataFrame): DataFrame =
    flaggedPairsAgainstIndex(s, inc, index)
      .select(col("train_doc").as("doc_id")).distinct()

  /** The PAIR-grain core behind [[contaminatedAgainstIndex]], factored
    * (r19) so [[BenchmarkRegistry.retroAudit]] ledgers the same
    * evidence the admission pipeline's doc-grain verdict folds:
    * `(doc_id→train_doc, test_doc, n_shared)` for every incoming doc
    * sharing >= [[Overlap]] rare trigrams with some index doc. Index
    * broadcasts (eval-sized by construction); the probe side never
    * shuffles on the shingle key.
    */
  private[operators] def flaggedPairsAgainstIndex(
      s: SparkSession, inc: DataFrame, index: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    inc.select(col("doc_id"), explode(expr("graft_shingles(text)")).as("g"))
      .join(broadcast(index), "g")
      .groupBy("doc_id", "test_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= Overlap)
      .withColumnRenamed("doc_id", "train_doc")
  }

  /** Flagged `(train_doc, test_doc, n_shared)` pairs — the dc01 body,
    * reused by dc02's purge.
    */
  private[operators] def overlapPairs(s: SparkSession, dir: String): DataFrame =
    pairCounts(s, dir).filter(col("n_shared") >= Overlap)

  /** The UN-thresholded pair-count frame (every train×test pair sharing
    * >= 1 rare trigram, with its exact count) — dc01's core before its
    * `>= Overlap` cut, factored so dc05's threshold sweep measures the
    * same candidate generation the shipped purge runs.
    */
  private[operators] def pairCounts(s: SparkSession, dir: String): DataFrame =
    StageStore.table(s, dir, "paircnt")(pairCountsFresh(s, dir))

  /** The un-memoized build behind [[pairCounts]] — memoized at the
    * UN-thresholded grain so dc01/dc02's purge AND dc05's sweep read
    * one store (the sweep measures the same candidate generation the
    * shipped purge runs). StageStoreSpec pins store == fresh.
    */
  private[graft] def pairCountsFresh(s: SparkSession, dir: String): DataFrame = {
    val er = rareShingles(s, dir)
    val tr = er.filter(col("b") < 80).select(col("doc_id").as("train_doc"), col("g"))
    val te = er.filter(col("b") >= 90).select(col("doc_id").as("test_doc"), col("g"))
    tr.join(broadcast(te), "g")
      .groupBy("train_doc", "test_doc")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Shared DuckDB CTE prefix: split buckets → shingles → df cap →
    * flagged pairs. `graft_shingles` dedups within a doc, so COUNT(*)
    * per pair = |intersection of rare trigram sets|.
    */
  private def pairsDuckMin(min: Int): String =
    s"""WITH d AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w,
       |                  ${Sampling.duckBucket100Of("doc_id")} AS b
       |           FROM documents),
       |sh AS (SELECT doc_id, lang, b, ${Dedup.shingleDuck} AS gs FROM d),
       |e AS (SELECT doc_id, b, UNNEST(gs) AS g FROM sh),
       |rare AS (SELECT g FROM e GROUP BY g HAVING COUNT(*) <= ${Dedup.DfCap}),
       |er AS (SELECT e.doc_id, e.b, e.g FROM e JOIN rare USING (g)),
       |pairs AS (
       |  SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
       |         COUNT(*) AS n_shared
       |  FROM (SELECT doc_id, g FROM er WHERE b < 80) tr
       |  JOIN (SELECT doc_id, g FROM er WHERE b >= 90) te USING (g)
       |  GROUP BY tr.doc_id, te.doc_id
       |  HAVING COUNT(*) >= $min)""".stripMargin

  private[operators] val pairsDuck = pairsDuckMin(Overlap)

  /** [[pairsDuck]] without the shipped cut (`>= 1` keeps every
    * sharing pair) — dc05's sweep input, same text otherwise.
    */
  private[operators] val pairCountsDuck = pairsDuckMin(1)

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "dc01_benchmark_overlap",
      Some(s"""$pairsDuck
              |SELECT train_doc, test_doc, n_shared FROM pairs""".stripMargin),
      s"Benchmark contamination detection: (train, test) doc pairs sharing >= $Overlap rare word-trigrams across the sp05 deterministic split. Candidates meet in a df-capped shingle equi-join with the small held-out side broadcast — the train corpus never shuffles; join volume is bounded by the df cap per shingle (the dd05 skew argument applied cross-split).") {
      (s, dir) => overlapPairs(s, dir)
    },

    GraftQuery(
      "dc02_decontaminated_train",
      Some(s"""$pairsDuck,
              |contaminated AS (SELECT DISTINCT train_doc FROM pairs)
              |SELECT lang, COUNT(*) AS n_kept
              |FROM d
              |WHERE b < 80
              |  AND doc_id NOT IN (SELECT train_doc FROM contaminated)
              |GROUP BY lang""".stripMargin),
      "Decontaminated train split: broadcast LEFT ANTI join of the train docs against the flagged contaminated ids (tiny by construction), per-language survivor counts. At 100 TB the corpus streams through the anti join map-side — only the audit aggregation shuffles, and it carries (lang, counter) rows.") {
      (s, dir) =>
        val contaminated = overlapPairs(s, dir)
          .select(col("train_doc").as("doc_id")).distinct()
        docs(s, dir)
          .withColumn("b", expr(Sampling.bucket100("doc_id")))
          .filter(col("b") < 80)
          .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"))
    },

    GraftQuery(
      "dc03_eval_integrity",
      Some(s"""$pairsDuck,
              |agg AS (SELECT test_doc, COUNT(*) AS n_tainting_train,
              |               MAX(n_shared) AS max_shared
              |        FROM pairs GROUP BY test_doc)
              |SELECT d.doc_id AS test_doc, d.lang,
              |       COALESCE(a.n_tainting_train, 0) AS n_tainting_train,
              |       COALESCE(a.max_shared, 0) AS max_shared,
              |       CASE WHEN a.test_doc IS NOT NULL THEN 'tainted'
              |            ELSE 'clean' END AS verdict
              |FROM (SELECT * FROM d WHERE b >= 90) d
              |LEFT JOIN agg a ON d.doc_id = a.test_doc""".stripMargin),
      "Eval-integrity report — dc01/dc02 look at contamination from the TRAIN side (which training docs to purge); this is the missing view from the EVAL side: one row per held-out doc with how many train docs taint it and the worst overlap, 'clean' rows included with explicit zeros (an eval audit that only lists tainted items can't distinguish 'checked and clean' from 'never checked'). A benchmark whose items are heavily tainted measures memorization, not ability — this table is what decides whether to re-split or drop eval items before trusting a score. Reuses dc01's flagged pairs verbatim (same df-capped broadcast join, so the report audits the shipped detector); the pair aggregate is benchmark-sized and broadcast-LEFT-joins onto the test split — at 100 TB the train corpus never re-enters, and the output is eval-set-sized.") {
      (s, dir) =>
        val agg = overlapPairs(s, dir)
          .groupBy("test_doc")
          .agg(
            count(lit(1)).as("n_tainting_train"),
            max(col("n_shared")).as("max_shared"))
        docs(s, dir)
          .withColumn("b", expr(Sampling.bucket100("doc_id")))
          .filter(col("b") >= 90)
          .select(col("doc_id").as("test_doc"), col("lang"))
          .join(broadcast(agg), Seq("test_doc"), "left")
          .select(
            col("test_doc"), col("lang"),
            coalesce(col("n_tainting_train"), lit(0L)).as("n_tainting_train"),
            coalesce(col("max_shared"), lit(0L)).as("max_shared"),
            when(col("n_tainting_train").isNotNull, lit("tainted"))
              .otherwise(lit("clean")).as("verdict"))
    },

    GraftQuery(
      "dc04_semantic_decontam",
      Some(s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
              |                    ${Sampling.duckBucket100Of("vec_id")} AS bkt
              |             FROM embeddings),
              |pl AS (SELECT ${Hashing.planesDuck} AS planes),
              |tr AS (SELECT vec_id, e FROM emb WHERE bkt < 80),
              |te AS (SELECT vec_id, e FROM emb WHERE bkt >= 90),
              |st AS (SELECT vec_id, e, ${Hashing.embSigDuck} AS sig FROM te, pl),
              |sr AS (SELECT vec_id, e, ${Hashing.embSigDuck} AS sig FROM tr, pl),
              |bt AS (SELECT vec_id, bb.b AS band_idx, substring(sig, bb.b*4 + 1, 4) AS band_key
              |       FROM st, (SELECT UNNEST(RANGE(0, 8)) AS b) bb),
              |br AS (SELECT vec_id, bb.b AS band_idx, substring(sig, bb.b*4 + 1, 4) AS band_key
              |       FROM sr, (SELECT UNNEST(RANGE(0, 8)) AS b) bb),
              |cand AS (SELECT DISTINCT bt.vec_id AS test_id, br.vec_id AS train_id
              |         FROM bt JOIN br
              |           ON bt.band_idx = br.band_idx AND bt.band_key = br.band_key),
              |fl AS (SELECT c.test_id, COUNT(*) AS n_train_matches,
              |              ROUND(MAX(LIST_COSINE_SIMILARITY(a.e, b.e)), 4) AS max_sim
              |       FROM cand c JOIN te a ON a.vec_id = c.test_id
              |                   JOIN tr b ON b.vec_id = c.train_id
              |       WHERE LIST_COSINE_SIMILARITY(a.e, b.e) >= 0.45
              |       GROUP BY 1)
              |SELECT te.vec_id AS test_id,
              |       COALESCE(fl.n_train_matches, 0) AS n_train_matches,
              |       fl.max_sim
              |FROM te LEFT JOIN fl ON fl.test_id = te.vec_id""".stripMargin),
      "SEMANTIC decontamination — the leakage axis dc01-dc03 cannot see: a paraphrased or re-worded benchmark item shares almost no rare trigrams with its training twin, but its EMBEDDING sits right next to it (the published contamination studies' motivation for embedding-space checks alongside n-gram ones). Same eval-side report shape as dc03 — one row per held-out vector, clean rows explicit with zero matches (checked-and-clean must be distinguishable from never-checked) — but the evidence is cosine: per test vector, how many sp05-split TRAIN vectors land within 0.45, and the worst offender's similarity. The detector is dd06's shipped machinery across the split: hyperplane-LSH band equi-join generates test x train candidates (never the test x train cross product — at 100 TB train-side vectors hash into band buckets once and the benchmark probes them, the same asymmetry as dc01's broadcast), exact cosine reranks. The oracle replicates the identical planes, signatures, and banding in SQL (dd06's discipline — a sampling/LSH operator is value-checkable exactly when its randomness is md5-derived), so engine == oracle INCLUDING the detector's recall behavior; the exact all-pairs truth is the spec's job, which prices what the bands miss. Both polarities non-vacuous at every fixture scale (probed: 2-5 of 61 test vectors flagged).") {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val emb = Tables.spread(Tables.load(s, dir, "embeddings"), "vec_id")
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
          .withColumn("bkt", expr(Sampling.bucket100("vec_id")))
        val train = emb.filter(col("bkt") < 80).select("vec_id", "e")
        val test = emb.filter(col("bkt") >= 90).select("vec_id", "e")
        def bands(df: DataFrame, idCol: String): DataFrame =
          df.withColumn("sig", expr(Hashing.embSigExpr))
            .select(col("vec_id").as(idCol),
              posexplode(expr(
                "transform(sequence(0, 7), b -> substring(sig, b*4 + 1, 4))"))
                .as(Seq("band_idx", "band_key")))
        val cand = bands(test, "test_id")
          .join(bands(train, "train_id"), Seq("band_idx", "band_key"))
          .select("test_id", "train_id").distinct()
        val flagged = cand
          .join(test.select(col("vec_id").as("test_id"), col("e").as("e_t")), "test_id")
          .join(train.select(col("vec_id").as("train_id"), col("e").as("e_r")), "train_id")
          .withColumn("sim", expr("graft_cosine(e_t, e_r)"))
          .filter(col("sim") >= 0.45)
          .groupBy("test_id")
          .agg(count(lit(1)).as("n_train_matches"), round(max(col("sim")), 4).as("max_sim"))
        test.select(col("vec_id").as("test_id"))
          .join(broadcast(flagged), Seq("test_id"), "left")
          .select(col("test_id"),
            coalesce(col("n_train_matches"), lit(0L)).as("n_train_matches"),
            col("max_sim"))
    },

    GraftQuery(
      "dc05_overlap_threshold_sweep",
      Some(s"""$pairCountsDuck,
              |th AS (SELECT CAST(k AS INT) AS thr FROM (SELECT UNNEST(RANGE(1, 6)) AS k) t)
              |SELECT th.thr,
              |  CAST(COUNT(CASE WHEN p.n_shared >= th.thr THEN 1 END) AS BIGINT) AS n_pairs,
              |  CAST(COUNT(DISTINCT CASE WHEN p.n_shared >= th.thr THEN p.train_doc END) AS BIGINT) AS n_tainted_train,
              |  CAST(COUNT(DISTINCT CASE WHEN p.n_shared >= th.thr THEN p.test_doc END) AS BIGINT) AS n_covered_test
              |FROM pairs p, th GROUP BY 1""".stripMargin),
      s"DECONTAMINATION threshold sweep — the third operating-curve table (ss16 tunes ANN nprobe, tx23 tunes the classifier keep-point; this tunes dc01's min-shared-rare-trigrams knob, the precision/recall trade every decontamination run argues about: too low and the purge throws away train docs over coincidental trigram collisions, too high and a paraphrased benchmark item slips through): per candidate threshold 1..5 (the shipped cut $Overlap sits inside the sweep), exact flagged-pair count, tainted-TRAIN-doc count (what the purge would delete — the corpus cost), and covered-TEST-doc count (what the flag protects — the leakage-detection benefit). Measured on the fixture the curve is steep (~2100 pairs at 1 -> ~20 at 3 -> ~4 at 5): threshold 1 is trigram-collision noise purging half the corpus, the shipped 3 is the knee — the table that justifies the constant, generated by the same candidate pipeline the purge ships (pairCounts factored from dc01's core; the sweep itself is one conditional aggregation of the pair frame against a 5-row threshold broadcast, counter-grain output). At 100 TB: the pair frame is the already-audited df-capped equi-join (benchmark side broadcast); the sweep adds a 5x pair-count scan, nothing corpus-sized. DecontamSpec replays the sweep from the collected pair counts and pins strict monotone decrease on all three columns plus the shipped threshold's row agreeing with dc01's flagged set.") {
      (s, dir) => sweepOf(s, Materialize(pairCounts(s, dir)))
    },

    GraftQuery(
      "dc06_tuned_overlap",
      Some(s"""$pairCountsDuck,
              |th AS (SELECT CAST(k AS INT) AS thr FROM (SELECT UNNEST(RANGE(1, 6)) AS k) t),
              |sweep AS (SELECT th.thr,
              |    COUNT(DISTINCT CASE WHEN p.n_shared >= th.thr THEN p.train_doc END) AS nt
              |  FROM pairs p, th GROUP BY 1),
              |ntr AS (SELECT COUNT(*) AS n_train FROM d WHERE b < 80),
              |choice AS (SELECT CAST(COALESCE(
              |    (SELECT MIN(thr) FROM sweep, ntr WHERE nt * 10 <= n_train), 5) AS INT) AS thr)
              |SELECT c.thr, p.train_doc, p.test_doc, p.n_shared
              |FROM pairs p, choice c WHERE p.n_shared >= c.thr""".stripMargin),
      s"TUNED decontamination threshold — the LAST open tuning loop closed (VERDICT r17 #7): every other operating-curve table already drives its consumer (q62->q58, tx23->pl04, dd20->dd21, ss21->ss23), but dc05 published the threshold curve while dc01/pl01 still shipped the constant $Overlap. The decision rule is a PURGE BUDGET in exact integers (dd21's cheapest-max-catch pattern adapted to the precision/recall trade this knob actually embodies): the smallest threshold whose tainted-train count stays within 10% of the train split — cross-multiplied as n_tainted_train * 10 <= n_train so both engines decide bit-identically — because a 'decontamination' that deletes more than a tenth of the corpus is treating trigram-collision noise as leakage (dc05's own reading: threshold 1 purges nearly the whole train split at every fixture), while the smallest qualifying threshold maximizes benchmark coverage inside that budget. Falls back to the strictest swept threshold (5) if none qualifies (a fixture-free safety default; never taken at any shipped fixture). The choice is a counter-grain fold over dc05's factored sweep (one definition — sweepOf — so the tuner measures exactly the curve dc05 publishes), the 1-row decision broadcast-joins the pair frame, and the output is dc01's product with the chosen thr as a column. Measured: the rule lands on the shipped $Overlap at sf0.001/sf0.01 (endpoint identity with dc01 — DecontamSpec pins it), and correctly buys the stricter 4 at sf0.1 where threshold-3 tainting still exceeds the budget (1213 of 3965 train docs) — corpus-shape-adaptive, which is the point of computing the choice. At 100 TB: the pair frame is the one store-read artifact (StageStore), the sweep a 5x conditional aggregation of it, the decision a 5-row fold — nothing corpus-sized beyond what dc01 already pays.") {
      (s, dir) =>
        val pc = Materialize(pairCounts(s, dir))
        val nTrain = docs(s, dir)
          .filter(expr(Sampling.bucket100("doc_id")) < 80)
          .agg(count(lit(1)).as("n_train"))
        val choice = broadcast(sweepOf(s, pc).crossJoin(broadcast(nTrain))
          .filter(col("n_tainted_train") * 10 <= col("n_train"))
          .agg(coalesce(min(col("thr")), lit(5)).cast("int").as("thr")))
        pc.crossJoin(choice)
          .filter(col("n_shared") >= col("thr"))
          .select(col("thr"), col("train_doc"), col("test_doc"), col("n_shared"))
    },

    GraftQuery(
      "dc07_retroactive_audit",
      Some(s"""$releasePairsDuck
              |SELECT train_doc, test_doc, n_shared FROM pb
              |WHERE train_doc NOT IN (SELECT train_doc FROM pa)""".stripMargin),
      "RETROACTIVE contamination audit — the lifecycle event dc01–dc06 cannot express (r19): every prior decontam operator audits against the benchmark set that exists AT AUDIT TIME, but production eval suites accrete — a benchmark released months after the corpus shipped makes already-admitted training docs retroactively contaminated, and re-running the full dc01 audit per release re-pays the corpus scan times the whole registry. The BenchmarkRegistry store makes the event delta-sized: rarity (df <= cap over the corpus) freezes ONCE at registry creation (dc01's standing-index trade, now a persisted rare/ table), each release admission joins its eval-sized postings (broadcast) against the streamed rare table — zero corpus work — and the retroactive audit is ONE corpus pass against the broadcast NEW release's index only (the dc01 asymmetry, paid per release instead of per registry), ledgered at pair grain under the release's own batch_id partition (mode=overwrite — replay byte-stable). THIS query runs the lifecycle on fixture splits — create, admit release A (held-out bucket [90,95)), audit, admit release B ([95,100)), audit — and serves release B's NOVEL flags: its ledger pairs restricted to train docs no earlier release had flagged, the incremental purge list that is the audit's entire point (a doc already purged for release A is not new work). Novelty is a READ-side view over full per-release ledgers — an audit-time fact, deterministic under later retraction — and its anti-join's standing flagged-doc side is deliberately NOT broadcast (corpus-proportional in the worst case: ~18% of train docs at sf0.1); the pair-set-sized left side keeps the shuffle trivial. The oracle replays the whole protocol in SQL (the dc01 CTE chain with the held-out side split per release; novelty as NOT IN over release A's pairs) so a frozen-rarity drift, a cross-release posting leak, or novelty suppression landing in the LEDGER (it must not — retraction composability depends on full per-release evidence) all hash-fail. Both polarities live at sf0.1 (479 novel vs 211 already-flagged train docs); at small SF the exclusion set is empty and the oracle pins exactly that. BenchmarkRegistrySpec pins the lifecycle: per-release ledgers == dc01 on the release slice, registry union == the one-shot audit, replay idempotency, and novelty == driver-side set difference.") {
      (s, dir) =>
        val store = registryStore(s, dir)
        BenchmarkRegistry.novelFlags(s, store, 0L)
    },

    GraftQuery(
      "dc08_release_retraction",
      Some(s"""$releasePairsDuck
              |SELECT CAST(0 AS BIGINT) AS release_batch,
              |       train_doc, test_doc, n_shared
              |FROM pb""".stripMargin),
      "BENCHMARK-RELEASE RETRACTION — the registry's erasure path (r19, completing the store-mutation discipline ss24/dd23 gave the index and fingerprint stores): a leaked or deprecated eval release must STOP purging training docs, and a registry with no retraction protocol poisons its corpus forever (every doc its flags ever touched stays purged). Retraction is a request-sized tombstone — the retracted release ids land under a deterministic tombs/batch_id=M partition (mode=overwrite: replayed requests byte-stable; retracting a never-admitted release is a structural no-op) — and every registry read gains a LIVE view: index postings and ledger flags anti-join the release-count-sized tombstone set (broadcast by nature — a registry holds dozens of releases, not thousands), so a retracted release's evidence stops voting in the purge list the moment the tombstone lands, with ZERO corpus-side work. Compaction makes it physical — deletes the retracted batch_id partitions from index/ and flags/ and clears consumed tombstones, crash-safe by delete-then-clear (re-deleting a missing partition is a no-op; an interrupted run re-runs with the same id and converges); there is deliberately NO fold step, because partitions are RELEASE-grain and folding would destroy the batch attribution novelty and retraction both key on. THIS query serves the live cumulative purge evidence after the fixture lifecycle ends with release A retracted: only release B's ledger survives, at pair grain with its release attribution — and crucially the docs release A alone had flagged RE-ENTER the corpus, while docs flagged by BOTH releases stay purged because the ledger stores each release's FULL evidence (novelty suppression is read-side only, dc07's design decision paying off exactly here). The oracle is release B's pair set verbatim — the retraction must be indistinguishable from release A never having existed. BenchmarkRegistrySpec pins live == rebuild-without-retracted, replayed retraction a no-op, and post-compaction identity of the live view (physical deletion, tombs cleared, convergent re-run) — with the honest trade stated: compaction erases the retracted release's ledger WITH it, so a later release's audit-time novelty view converges to novelty-vs-live-evidence (the retracted suppression history is deliberately unrecoverable — the same privacy-over-history call dd23 makes for erased holders).") {
      (s, dir) =>
        val store = registryStore(s, dir)
        BenchmarkRegistry.readFlags(s, store, applyTombstones = true)
          .select(col("batch_id").cast("bigint").as("release_batch"),
            col("train_doc"), col("test_doc"), col("n_shared"))
    })

  /** dc07/dc08's persisted artifact: a [[BenchmarkRegistry]] run
    * through the full release lifecycle on fixture splits — create
    * (rarity frozen over the full document set, dc01's df universe),
    * admit release A (held-out bucket [90, 95) as the seed batch),
    * retroactively audit the train split against it, admit release B
    * ([95, 100) as batch 0) months later and audit ONLY the delta,
    * then retract release A (tomb batch 0). DiskMemo'd per
    * (application, dir) — dc07 reads audit-time novelty (tombs-blind
    * by definition), dc08 reads the live view, so one store serves
    * both deterministically.
    */
  private def registryStore(s: SparkSession, dir: String): String = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"dcreg_$tag", dir)
    DiskMemo.ensure(s"dcreg_$tag", out) {
      val d = Tables.spread(docs(s, dir), "doc_id")
        .withColumn("b", expr(Sampling.bucket100("doc_id")))
      val train = d.filter(col("b") < 80).select("doc_id", "text")
      val relA = d.filter(col("b") >= 90 && col("b") < 95).select("doc_id", "text")
      val relB = d.filter(col("b") >= 95).select("doc_id", "text")
      val store = s"$out/store"
      BenchmarkRegistry.create(s, d.select("doc_id", "text"), store)
      BenchmarkRegistry.accreteRelease(s, relA, BenchmarkRegistry.SeedBatchId, store)
      BenchmarkRegistry.retroAudit(s, train, BenchmarkRegistry.SeedBatchId, store)
      BenchmarkRegistry.accreteRelease(s, relB, 0L, store)
      BenchmarkRegistry.retroAudit(s, train, 0L, store)
      BenchmarkRegistry.retract(s, Seq(BenchmarkRegistry.SeedBatchId), 0L, store)
    }
    s"$out/store"
  }

  /** Shared DuckDB prefix for the registry oracles: the pairsDuck
    * chain with the held-out side split into the two fixture releases
    * (A = bucket [90, 95), B = [95, 100)). Rarity is df over the full
    * document set — exactly what [[BenchmarkRegistry.create]] froze.
    */
  private lazy val releasePairsDuck: String =
    s"""WITH d AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w,
       |                  ${Sampling.duckBucket100Of("doc_id")} AS b
       |           FROM documents),
       |sh AS (SELECT doc_id, b, ${Dedup.shingleDuck} AS gs FROM d),
       |e AS (SELECT doc_id, b, UNNEST(gs) AS g FROM sh),
       |rare AS (SELECT g FROM e GROUP BY g HAVING COUNT(*) <= ${Dedup.DfCap}),
       |er AS (SELECT e.doc_id, e.b, e.g FROM e JOIN rare USING (g)),
       |pa AS (SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
       |              COUNT(*) AS n_shared
       |       FROM (SELECT doc_id, g FROM er WHERE b < 80) tr
       |       JOIN (SELECT doc_id, g FROM er WHERE b >= 90 AND b < 95) te USING (g)
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $Overlap),
       |pb AS (SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc,
       |              COUNT(*) AS n_shared
       |       FROM (SELECT doc_id, g FROM er WHERE b < 80) tr
       |       JOIN (SELECT doc_id, g FROM er WHERE b >= 95) te USING (g)
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $Overlap)""".stripMargin

  /** dc05's sweep aggregation over a pinned pair-count frame, factored
    * (r18) so dc06's tuner measures EXACTLY the operating curve dc05
    * publishes: per candidate threshold 1..5, flagged-pair count,
    * tainted-train-doc count (the purge's corpus cost) and
    * covered-test-doc count (the flag's benefit) — one conditional
    * aggregation against a 5-row threshold broadcast, counter-grain.
    */
  private def sweepOf(s: SparkSession, pc: DataFrame): DataFrame = {
    val th = broadcast(s.range(1, 6).select(col("id").cast("int").as("thr")))
    pc.crossJoin(th)
      .groupBy("thr")
      .agg(
        sum(when(col("n_shared") >= col("thr"), 1L).otherwise(0L))
          .cast("bigint").as("n_pairs"),
        countDistinct(when(col("n_shared") >= col("thr"), col("train_doc")))
          .cast("bigint").as("n_tainted_train"),
        countDistinct(when(col("n_shared") >= col("thr"), col("test_doc")))
          .cast("bigint").as("n_covered_test"))
  }
}

package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and sequence-packing operators over the `documents` table —
  * the reproducibility-critical surface of a training-data pipeline
  * (harness-mandated extension family, SURVEY.md §2.3).
  *
  * Every operator derives its randomness from **md5 of the row key**,
  * never from an RNG: a hash-bucket decision is (a) reproducible across
  * runs, engines, and cluster layouts — re-running the pipeline on
  * re-partitioned input selects the SAME rows, which `rand()`-based
  * sampling does not guarantee; (b) pure map-side work — a Bernoulli
  * sample of 100 TB is a filter that never shuffles; and (c) consistent
  * across tables — sampling `documents` and a sibling table by the same
  * key keeps them joinable. This is the standard deterministic-sampling
  * design for large corpus work (cf. Spark's own `sample` caveats: its
  * per-partition RNG reshuffles selections whenever partitioning
  * changes).
  *
  * Scale notes per operator are on each entry; none of these plans
  * carries a shuffle except where the semantics force one (per-stratum
  * ranking, global counts), and those shuffle the KEY + counters, not
  * document payloads.
  */
object Sampling {

  /** `pmod(first-32-bits-of-md5(key), 100)` — the shared deterministic
    * bucket in [0,100). Spark side of the oracle's
    * `CAST(('0x' || substring(md5(k),1,8)) AS BIGINT) % 100`
    * (conv parses the same 8 hex chars; both are non-negative so
    * `%` and `pmod` agree).
    */
  private[operators] def bucket100(key: String): String =
    s"CAST(conv(substring(md5(CAST($key AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"

  /** DuckDB twin of [[bucket100]], parameterized by key column. */
  private[operators] def duckBucket100Of(key: String): String =
    s"CAST(('0x' || substring(md5(CAST($key AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  private val duckBucket100 = duckBucket100Of("doc_id")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** pk02's serpentine assignment as a reusable frame: input
    * `(doc_id, n_tokens)`, output `(doc_id, n_tokens, shard)` —
    * factored so the corpus-build pipeline (pl01) packs its SURVIVOR
    * set with the SHIPPED operator, not a re-derivation. The global
    * descending rank uses q57's two-phase decomposition (value-range
    * buckets against a broadcast 1-row min/max frame, within-bucket
    * row_number, bucket-offset broadcast) — no fact-scale rows cross
    * a single partition; see pk02's doc for the balance argument.
    */
  private[operators] def serpentineShardAssignments(d0: DataFrame): DataFrame = {
    val d = d0.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
    val stats = d.agg(min(col("n_tokens")).as("mn"), max(col("n_tokens")).as("mx"))
    // descending-order buckets: bkt ascends as n_tokens descends, so
    // bucket order composes with the within-bucket descending sort
    val b = d.crossJoin(broadcast(stats))
      .withColumn("bkt",
        when(col("mx") === col("mn"), lit(0)).otherwise(
          floor((col("mx") - col("n_tokens")) * 64 / (col("mx") - col("mn")))
            .cast("int")))
    val offs = b.groupBy("bkt").agg(count(lit(1)).as("c"))
      .withColumn("off", sum(col("c")).over(Window.orderBy("bkt")) - col("c"))
    b.join(broadcast(offs.select(col("bkt"), col("off"))), "bkt")
      .withColumn("rn", col("off") + row_number().over(
        Window.partitionBy("bkt").orderBy(col("n_tokens").desc, col("doc_id"))))
      .select(col("doc_id"), col("n_tokens"), expr(
        """CAST(CASE WHEN ((rn - 1) DIV 16) % 2 = 0 THEN (rn - 1) % 16
          |          ELSE 15 - (rn - 1) % 16 END AS INT)""".stripMargin).as("shard"))
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "sp01_hash_sample",
      Some(s"""SELECT doc_id, lang, source
              |FROM documents
              |WHERE $duckBucket100 < 10""".stripMargin),
      "Deterministic 10% Bernoulli sample by md5 bucket of doc_id: reproducible across runs/engines/partitionings, pure map-side filter (no shuffle, no RNG state) — the only sampling design that scales to 100 TB with an audit trail.") {
      (s, dir) =>
        docs(s, dir)
          .filter(expr(s"${bucket100("doc_id")} < 10"))
          .select("doc_id", "lang", "source")
    },

    GraftQuery(
      "sp02_stratified_sample",
      Some(s"""SELECT lang,
              |       COUNT(*) AS n_total,
              |       CAST(SUM(CASE WHEN $duckBucket100 <
              |              CASE WHEN lang = 'en' THEN 10 ELSE 40 END
              |            THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
              |FROM documents GROUP BY lang""".stripMargin),
      "Stratified deterministic sample: per-language rates (downsample the dominant stratum to 10%, keep 40% elsewhere) applied as a map-side hash-bucket filter; the only shuffle is the tiny per-stratum audit aggregation.") {
      (s, dir) =>
        docs(s, dir)
          .withColumn("bucket", expr(bucket100("doc_id")))
          .withColumn("rate", when(col("lang") === "en", 10).otherwise(40))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("bucket") < col("rate"), 1).otherwise(0)).as("n_sampled"))
    },

    GraftQuery(
      "sp03_per_stratum_sample",
      Some("""SELECT doc_id, lang, rn FROM (
             |  SELECT doc_id, lang,
             |         ROW_NUMBER() OVER (PARTITION BY lang
             |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 20""".stripMargin),
      "Exactly-k-per-stratum sample without replacement: rank by md5(doc_id) inside each stratum, keep the first 20 — a deterministic 'uniform without replacement' (hash order is independent of doc order). One shuffle on the stratum key; for a mega-stratum, pre-filter by hash bucket to ~4k survivors before ranking.") {
      (s, dir) =>
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("doc_id", "lang", "rn")
    },

    GraftQuery(
      "sp04_source_quota_sample",
      Some(s"""WITH counts AS (
              |  SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
              |rates AS (
              |  SELECT source, n_total,
              |         LEAST(100, CAST(FLOOR(20.0 * 100 / n_total) AS BIGINT)) AS rate
              |  FROM counts)
              |SELECT d.source, r.n_total,
              |       CAST(SUM(CASE WHEN $duckBucket100 < r.rate THEN 1 ELSE 0 END) AS BIGINT)
              |         AS n_sampled
              |FROM documents d JOIN rates r ON d.source = r.source
              |GROUP BY d.source, r.n_total""".stripMargin),
      "Source-quota rebalancing (mixture construction): compute per-source counts, derive the hash-bucket rate that lands ~20 docs per source, sample deterministically. The counts/rates table is tiny and BROADCAST back — documents are filtered map-side, never shuffled; integer rate in [0,100] keeps the arithmetic engine-exact.") {
      (s, dir) =>
        val d = docs(s, dir)
        val rates = d.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
          .withColumn("rate",
            least(lit(100), floor(lit(20.0) * 100 / col("n_total")).cast("long")))
        d.join(broadcast(rates), "source")
          .withColumn("bucket", expr(bucket100("doc_id")))
          .groupBy(col("source"), col("n_total"))
          .agg(sum(when(col("bucket") < col("rate"), 1).otherwise(0)).as("n_sampled"))
          .select("source", "n_total", "n_sampled")
    },

    GraftQuery(
      "sp05_train_val_test_split",
      Some(s"""SELECT doc_id, lang,
              |       CASE WHEN $duckBucket100 < 80 THEN 'train'
              |            WHEN $duckBucket100 < 90 THEN 'val'
              |            ELSE 'test' END AS split
              |FROM documents""".stripMargin),
      "Reproducible 80/10/10 train/val/test assignment by md5 bucket: every engine, run, and partitioning assigns each doc the same split (the property that prevents train/test leakage when the corpus is re-processed); pure map-side projection, no shuffle. Adding data never reassigns an existing doc — its bucket depends only on its key.") {
      (s, dir) =>
        val b = expr(bucket100("doc_id"))
        docs(s, dir)
          .withColumn("split",
            when(b < 80, "train").when(b < 90, "val").otherwise("test"))
          .select("doc_id", "lang", "split")
    },

    GraftQuery(
      "sp06_quality_weighted_sample",
      Some(s"""WITH q AS (
              |  SELECT doc_id, lang,
              |         LEN(STRING_SPLIT(text, ' ')) BETWEEN 20 AND 120
              |         AND CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x IN ('the','a','of','and'))) AS DOUBLE)
              |               / LEN(STRING_SPLIT(text, ' ')) < 0.3 AS good
              |  FROM documents)
              |SELECT doc_id, lang,
              |       CASE WHEN good THEN 'quality' ELSE 'tail' END AS stratum
              |FROM q
              |WHERE $duckBucket100 < CASE WHEN good THEN 100 ELSE 10 END""".stripMargin),
      "Quality-weighted downsampling (tx02's gate composed with the deterministic sampler): quality docs are kept outright, the rest enter a reproducible 10% exploration tail — the standard shape for a training-data filter that must not silently discard the distribution's tail. Still pure map-side (the quality predicate and the hash bucket are both per-row), still RNG-free.") {
      (s, dir) =>
        val toks = split(col("text"), " ")
        val stopRatio =
          expr(s"CAST(size(filter(split(text, ' '), x -> x IN ('the','a','of','and'))) AS DOUBLE)") /
            size(toks)
        docs(s, dir)
          .withColumn("good", size(toks).between(20, 120) && stopRatio < 0.3)
          .filter(expr(bucket100("doc_id")) <
            when(col("good"), 100).otherwise(10))
          .select(col("doc_id"), col("lang"),
            when(col("good"), "quality").otherwise("tail").as("stratum"))
    },

    GraftQuery(
      "sp07_consistent_join_sample",
      Some(s"""SELECT label, COUNT(*) AS n_joined
              |FROM (SELECT doc_id, lang FROM documents
              |      WHERE $duckBucket100 < 10) d
              |JOIN (SELECT vec_id, label FROM embeddings
              |      WHERE ${duckBucket100Of("vec_id")} < 10) e
              |  ON d.doc_id = e.vec_id
              |GROUP BY label""".stripMargin),
      "Cross-table consistent sampling — the property that makes hash sampling composable: documents and embeddings are sampled INDEPENDENTLY by the same md5 bucket of their shared key, and because the decision is a pure function of the key, the two 10% samples select the SAME ids — sample-then-join equals join-then-sample. Both filters are map-side; the join runs on 1% of the original pair volume. rand()-based sampling cannot do this (independent coins on each table keep only ~1% of matches, a silently biased join).") {
      (s, dir) =>
        val d = docs(s, dir)
          .filter(expr(s"${bucket100("doc_id")} < 10"))
          .select("doc_id", "lang")
        val e = Tables.load(s, dir, "embeddings")
          .filter(expr(s"${bucket100("vec_id")} < 10"))
          .select("vec_id", "label")
        d.join(e, col("doc_id") === col("vec_id"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_joined"))
    },

    GraftQuery(
      "sp08_temperature_mixture",
      Some(s"""WITH counts AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
              |w AS (SELECT lang, n_total, POWER(n_total, 0.5) AS wgt FROM counts),
              |rates AS (SELECT lang, n_total,
              |                 LEAST(100, CAST(FLOOR(100.0 * 200.0 * (wgt / SUM(wgt) OVER ()) / n_total)
              |                   AS BIGINT)) AS rate
              |          FROM w)
              |SELECT d.lang, r.n_total, r.rate,
              |       CAST(SUM(CASE WHEN $duckBucket100 < r.rate THEN 1 ELSE 0 END) AS BIGINT)
              |         AS n_sampled
              |FROM documents d JOIN rates r USING (lang)
              |GROUP BY d.lang, r.n_total, r.rate""".stripMargin),
      "Temperature-smoothed mixture sampling (alpha = 0.5, budget 200): per-language weights n^alpha flatten the source distribution — the standard multilingual-corpus rebalance (raw proportions starve tail languages; uniform ignores size). At sf0.01 the dominant language samples at 28% while tail languages get ~50%. The whole-frame window sum runs over one row per LANGUAGE (a handful at any corpus size); the derived rate table broadcasts back and the corpus is filtered map-side by the deterministic hash bucket — no corpus shuffle, rates reproducible to the row.") {
      (s, dir) =>
        val d = docs(s, dir)
        // one row per language — the unpartitioned window is bounded by
        // the language count, not the corpus
        val wTot = Window.partitionBy()
        val rates = d.groupBy("lang").agg(count(lit(1)).as("n_total"))
          .withColumn("wgt", pow(col("n_total"), 0.5))
          .withColumn("rate",
            least(lit(100), floor(lit(100.0) * lit(200.0) *
              (col("wgt") / sum(col("wgt")).over(wTot)) / col("n_total")).cast("long")))
        d.join(broadcast(rates), "lang")
          .withColumn("bucket", expr(bucket100("doc_id")))
          .groupBy("lang", "n_total", "rate")
          .agg(sum(when(col("bucket") < col("rate"), 1).otherwise(0)).as("n_sampled"))
          .select("lang", "n_total", "rate", "n_sampled")
    },

    GraftQuery(
      "pk01_token_packing",
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
             |  FROM documents),
             |packed AS (
             |  SELECT lang, doc_id, n_tokens,
             |         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |                       ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS BIGINT)
             |           AS bin
             |  FROM toks)
             |SELECT lang, bin,
             |       COUNT(*) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
             |FROM packed GROUP BY lang, bin""".stripMargin),
      "Greedy token-budget packing (512-token bins) via running-total binning: one window pass assigns each doc the bin its cumulative start falls in — the standard one-pass streaming packer (a straddling doc overflows its bin by < one doc, never splits). One shuffle on the stratum key; the unbounded running sum serializes each stratum onto one task, so a mega-stratum must first be sharded into bounded sub-strata (e.g. partition by (lang, doc_id DIV N) — bins never cross shard boundaries, so the result is still a valid packing).") {
      (s, dir) =>
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs(s, dir)
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .withColumn("bin",
            floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / 512.0).cast("long"))
          .groupBy(col("lang"), col("bin"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"))
    },

    GraftQuery(
      "sp09_global_exact_k",
      Some("""SELECT doc_id, lang, source
             |FROM documents
             |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |LIMIT 200""".stripMargin),
      "Exactly-k GLOBAL uniform sample without replacement (k=200) — the distributed replacement for reservoir sampling: rank the corpus by md5(key) and keep the k smallest. Hash order is independent of data order, so this is a uniform draw, and unlike a reservoir it is deterministic, mergeable, and re-runnable (the same 200 docs on any cluster layout — sp01's reproducibility contract at exact-k cardinality). Spark plans orderBy+limit as TakeOrderedAndProject: each task keeps a local top-200 heap and only k-sized heaps cross the wire — no global sort, no single-reducer bottleneck, linear at 100 TB (plan-audited; sp03 is the per-stratum sibling).") {
      (s, dir) =>
        docs(s, dir)
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .limit(200)
          .select("doc_id", "lang", "source")
    },

    GraftQuery(
      "sp10_poisson_bootstrap",
      Some("""WITH r AS (SELECT UNNEST(RANGE(0, 5)) AS rep),
             |w AS (SELECT d.doc_id, d.n_chars, r.rep,
             |        CASE WHEN b < 3679 THEN 0 WHEN b < 7358 THEN 1
             |             WHEN b < 9197 THEN 2 WHEN b < 9810 THEN 3
             |             WHEN b < 9963 THEN 4 ELSE 5 END AS wt
             |      FROM (SELECT doc_id, n_chars FROM documents) d, r,
             |      LATERAL (SELECT CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.rep AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS b) x)
             |SELECT rep, CAST(SUM(wt) AS BIGINT) AS n_resampled,
             |       CAST(SUM(wt * n_chars) AS BIGINT) AS sum_chars,
             |       CAST(SUM(wt * n_chars) AS DOUBLE) / SUM(wt) AS mean_chars
             |FROM w GROUP BY rep""".stripMargin),
      "Deterministic Poisson bootstrap — THE bootstrap that scales (per replicate, each row enters with an independent Poisson(1) weight, so resampling needs no global coordination — the large-scale 'bag of little bootstraps' alternative every distributed stats stack uses): five replicates of the corpus character-length statistic in ONE scan, their spread the uncertainty estimate a data-quality dashboard puts error bars on. The repo's no-RNG discipline holds: the Poisson draw is the md5 hash of (key, replicate) quantized to 1/10000 and pushed through the FIXED integer quantile thresholds of Poisson(1) (3679/7358/9197/9810/9963 — e^-1 etc. as literals, so no libm at runtime and both engines agree bit-for-bit); reproducible across runs, engines, and partitionings like every sp op. Shape: the replicate explode is map-side (x5 rows), weights are map math, then one map-side-combining agg at replicate grain; weighted sums are exact integers, the mean one IEEE division per output row.") {
      (s, dir) =>
        val bootstrapBucket =
          "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#', CAST(rep AS STRING))), 1, 8), 16, 10) AS BIGINT) % 10000"
        docs(s, dir)
          .select(col("doc_id"), col("n_chars"),
            explode(expr("sequence(0, 4)")).as("rep"))
          .withColumn("b", expr(bootstrapBucket))
          .withColumn("wt",
            when(col("b") < 3679, 0).when(col("b") < 7358, 1)
              .when(col("b") < 9197, 2).when(col("b") < 9810, 3)
              .when(col("b") < 9963, 4).otherwise(5))
          .groupBy(col("rep").cast("long").as("rep"))
          .agg(
            sum(col("wt")).cast("long").as("n_resampled"),
            sum(col("wt") * col("n_chars")).cast("long").as("sum_chars"),
            (sum(col("wt") * col("n_chars")).cast("double") / sum(col("wt")))
              .as("mean_chars"))
    },

    GraftQuery(
      "sp11_curriculum_phases",
      Some("""WITH d AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS score_units FROM documents),
             |r AS (SELECT doc_id, score_units,
             |             ROW_NUMBER() OVER (ORDER BY score_units, doc_id) AS rn,
             |             COUNT(*) OVER () AS n
             |      FROM d)
             |SELECT doc_id, CAST(score_units AS BIGINT) AS score_units,
             |       CAST(((rn - 1) * 4) // n AS INT) AS phase,
             |       MD5(CAST(doc_id AS VARCHAR)) AS epoch_key
             |FROM r""".stripMargin),
      "Curriculum phase assignment — the data-ORDERING pass a curriculum-learning schedule runs over the corpus (easy-to-hard: short docs first here; in production the score is tx11/tx12's quality signal): every doc gets its global difficulty quantile phase (4 equal bands by exact global position over (score, doc_id)) plus a deterministic md5 epoch_key for reproducible within-phase shuffling (the no-RNG discipline — re-running the schedule on the grown corpus moves no doc's key). The global position is computed with q57's two-phase decomposition, NOT the oracle's fact-scale ROW_NUMBER: monotone score buckets against a broadcast 1-row min/max frame, a bucket histogram whose prefix sum is the only single-partition work, per-bucket ROW_NUMBER + offset (exact because score ties are co-bucketed and (score, doc_id) is unique) — so the schedule that orders 100 TB never funnels it through one task. Phase boundaries are exact integer arithmetic ((pos-1)*4 div n); every output column hash-matches the naive oracle bit-for-bit.") {
      (s, dir) =>
        val d = docs(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("score_units"))
        val stats = d.agg(min(col("score_units")).as("mn"),
          max(col("score_units")).as("mx"))
        val b = d.crossJoin(broadcast(stats))
          .withColumn("bkt",
            when(col("mx") === col("mn"), lit(0)).otherwise(
              floor((col("score_units") - col("mn")) * 64 / (col("mx") - col("mn")))
                .cast("int")))
        val offs = b.groupBy("bkt").agg(count(lit(1)).as("c"))
          .withColumn("off",
            sum(col("c")).over(org.apache.spark.sql.expressions.Window
              .orderBy("bkt")) - col("c"))
        val n = d.agg(count(lit(1)).as("n"))
        b.join(broadcast(offs.select(col("bkt"), col("off"))), "bkt")
          .withColumn("rn", col("off") + row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("bkt")
              .orderBy(col("score_units"), col("doc_id"))))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("score_units"),
            expr("CAST((rn - 1) * 4 DIV n AS INT)").as("phase"),
            md5(col("doc_id").cast("string")).as("epoch_key"))
    },

    GraftQuery(
      "pk02_balanced_shards",
      Some("""WITH d AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
             |          FROM documents),
             |r AS (SELECT doc_id, n_tokens,
             |             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
             |      FROM d)
             |SELECT CAST(CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
             |                 ELSE 15 - (rn - 1) % 16 END AS INT) AS shard,
             |       COUNT(*) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
             |FROM r GROUP BY 1""".stripMargin),
      "BALANCED shard packing — the load-balancing axis pk01 does not touch (pk01 packs into FIXED-budget bins, count open-ended; this packs into a FIXED shard count, loads balanced — the training-data sharding problem: k workers, equal token turnout): SERPENTINE sorted round-robin, the LPT-flavored heuristic that is deterministic and one-pass — rank every doc by size DESCENDING, deal each consecutive k-block out boustrophedon (even blocks left-to-right, odd blocks right-to-left). Plain rank-mod-k systematically hands shard 0 every block's LARGEST doc, accumulating bias across blocks (measured on this corpus: 94-token spread); the direction flip cancels it block-pairwise (measured: 11 — an order of magnitude, for one CASE expression), the classic balanced-dealing result. SamplingSpec prices exactly that: the serpentine spread strictly beats arrival-order round-robin AND sits under 2% of the mean shard load. The global DESCENDING rank uses q57's two-phase decomposition (value-range bucketing + within-bucket row_number + bucket-offset broadcast) so NO fact-scale rows cross a single partition — the window audit sweep would reject the naive global ROW_NUMBER this oracle spells. Exact integer ranks/counts/sums — bit-identical cross-engine.") {
      (s, dir) =>
        serpentineShardAssignments(docs(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens")))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"))
    },

    GraftQuery(
      "pk03_packed_sequences",
      Some("""WITH d AS (SELECT doc_id,
             |            CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok,
             |            md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |c AS (SELECT doc_id, n_tok,
             |        COALESCE(SUM(n_tok) OVER (ORDER BY h, doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
             |      FROM d)
             |SELECT doc_id, n_tok, CAST(st AS BIGINT) AS start_tok,
             |       CAST(st // 2048 AS BIGINT) AS seq_first,
             |       CAST((st + n_tok - 1) // 2048 AS BIGINT) AS seq_last
             |FROM c""".stripMargin),
      "CONCAT-AND-CHUNK training-sequence construction — the third packing axis, and the one an autoregressive trainer actually consumes: pk01 packs whole docs into open-count budget bins (a straddler overflows), pk02 balances a fixed shard count; pk03 lays the corpus out in ONE deterministic order and cuts it into FIXED 2048-token sequences with documents CROSSING the cuts — GPT-style packing, every token used, zero padding, sequence count = ceil(corpus_tokens/2048) by construction. The order is the md5-of-key shuffle (sp01's contract applied to training order: deterministic, engine-stable, layout-independent — re-packing a re-partitioned corpus yields byte-identical sequences, which a rand() shuffle cannot promise). Per doc: its global token offset and the [seq_first, seq_last] range of sequences it occupies — exactly the boundary index a packed-pretraining loader needs to build attention masks and to answer 'which sequences contain doc X' during data-attribution audits. The global prefix-sum is the q57/pk02 two-phase discipline applied to SUM instead of rank: 256 md5-prefix buckets whose lexicographic order IS the global order (the bucket key is the sort key's leading 2 hex chars), a bounded within-bucket running sum, and an aggregate-fed 256-row cumulative bucket-offset broadcast — no fact-scale rows cross one partition, the window audit sweep enforces it. All arithmetic exact BIGINT — bit-identical cross-engine.") {
      (s, dir) =>
        val d = docs(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bkt", substring(col("h"), 1, 2))
        val wIn = Window.partitionBy("bkt").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = d.groupBy("bkt").agg(sum(col("n_tok")).as("tot"))
          .withColumn("off", coalesce(
            sum(col("tot")).over(Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        d.join(broadcast(offs.select("bkt", "off")), "bkt")
          .withColumn("start_tok",
            col("off") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
          .select(col("doc_id"), col("n_tok"), col("start_tok"),
            expr("start_tok div 2048").as("seq_first"),
            expr("(start_tok + n_tok - 1) div 2048").as("seq_last"))
    },

    GraftQuery(
      "sp12_dsir_importance",
      Some(s"""WITH fc AS (SELECT doc_id FROM ${TextAnalysis.filterVerdictsDuck} WHERE "keep" = 1),
              |tb AS (SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 4)) AS INT) % 16 AS b
              |       FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)),
              |raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r FROM tb GROUP BY b),
              |tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM tb JOIN fc USING (doc_id) GROUP BY b),
              |tot AS (SELECT (SELECT CAST(SUM(r) AS BIGINT) FROM raw) AS tr,
              |               (SELECT CAST(SUM(c) AS BIGINT) FROM tgt) AS tt),
              |ratio AS (SELECT raw.b,
              |            CAST((COALESCE(tgt.c, 0) * tot.tr * 10000) // (raw.r * tot.tt) AS BIGINT) AS ru
              |          FROM raw LEFT JOIN tgt USING (b), tot),
              |ds AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              |              CAST(SUM(ru) AS BIGINT) AS dsir_units
              |       FROM tb JOIN ratio USING (b) GROUP BY doc_id)
              |SELECT doc_id, n_tokens, dsir_units,
              |       CAST(CASE WHEN dsir_units >= n_tokens * 10000 THEN 1 ELSE 0 END AS INT) AS selected
              |FROM ds""".stripMargin),
      "DSIR-STYLE importance weighting (Xie et al.'s Data Selection via Importance Resampling, the hashed-n-gram form) — the data-SELECTION axis the sampling family lacked: sp02/sp04/sp08 reweight by metadata strata (language, source), sp06 by a quality score; DSIR reweights by DISTRIBUTIONAL similarity to a target corpus, the technique behind domain-targeted pretraining mixes. Target distribution = tx12's kept docs (the in-pipeline stand-in for 'high-quality reference corpus' — the same distillation source tx22 trains on), raw = the whole corpus; features are tx18/tx22's 16 md5 hash buckets (vocabulary-free, OOV-free — the hashing trick is what makes DSIR run at 100 TB: the 'model' is 16 integers per side). Per-bucket importance ratio ru[b] = (T[b]·total_R·1e4) div (R[b]·total_T) — the likelihood ratio p_target(b)/p_raw(b) in fixed-point 1e4 units, exact integer products and truncating division (no log, no libm — the tx13 idf lesson; int64 headroom to ~1e7 tokens per side, documented to promote to decimal beyond); per-doc score = Σ over its tokens of ru[bucket(token)] (the sum-form surrogate of DSIR's log-likelihood-ratio sum — order-free, bit-identical cross-engine), selected iff the doc's MEAN token ratio >= 1 (dsir_units >= n_tokens·1e4): 'more target-like than raw average'. Scale shape: the token->bucket frame is built ONCE (checkpointed, the only corpus-scale object); R and T are 16-row aggregates, the ratio table is a 16-row broadcast, scoring is one map-side join + one doc-grain agg — the whole selector adds ZERO corpus-side shuffles beyond the per-doc sum. SamplingSpec replays the ratios driver-side and pins both polarities non-vacuous (selected and rejected docs both exist) and that selection genuinely disagrees with tx12 somewhere (it is a different signal, not a rename).") {
      (s, dir) =>
        val tb = Materialize(docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .select(col("doc_id"),
            expr("CAST(conv(substring(md5(t), 1, 4), 16, 10) AS INT) % 16").as("b")))
        val kept = TextAnalysis.filterVerdicts(s, dir)
          .filter(col("keep") === 1).select("doc_id")
        val raw = tb.groupBy("b").agg(count(lit(1)).as("r"))
        val tgt = tb.join(kept, Seq("doc_id"), "left_semi")
          .groupBy("b").agg(count(lit(1)).as("c"))
        val tot = raw.agg(sum(col("r")).as("tr"))
          .crossJoin(tgt.agg(sum(col("c")).as("tt")))
        // loud overflow guard (16-row frame, negligible cost): c*tr*1e4
        // and r*tt silently wrap int64 once either corpus side passes
        // ~1e7 tokens; DuckDB's BIGINT multiply errors on overflow, so
        // without this the engines would diverge silently. raise_error
        // keeps the wrap impossible instead of documented-only.
        val ratio = broadcast(raw.join(tgt, Seq("b"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .crossJoin(broadcast(tot))
          .select(col("b"), expr(
            """CASE WHEN (c > 0 AND tr > (9223372036854775807 div 10000) div c)
              |       OR (tt > 0 AND r > 9223372036854775807 div tt)
              |THEN CAST(raise_error(
              |  'sp12: int64 overflow in importance ratio (tr*tt beyond ~1e7 x 1e7 tokens) — promote to decimal(38,0)') AS BIGINT)
              |ELSE (c * tr * 10000L) div (r * tt) END""".stripMargin).as("ru")))
        tb.join(ratio, Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("bigint").as("n_tokens"),
            sum(col("ru")).cast("bigint").as("dsir_units"))
          .select(col("doc_id"), col("n_tokens"), col("dsir_units"),
            when(col("dsir_units") >= col("n_tokens") * lit(10000L), 1)
              .otherwise(0).cast("int").as("selected"))
    },

    GraftQuery(
      "pk04_length_bucketed_batches",
      Some("""WITH d AS (SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS len,
             |            md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |rb AS (SELECT *, CAST(len // 16 AS INT) AS bkt,
             |         ROW_NUMBER() OVER (PARTITION BY len // 16 ORDER BY h, doc_id) AS rn FROM d),
             |ra AS (SELECT *, CAST(-1 AS INT) AS bkt,
             |         ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rn FROM d),
             |u AS (SELECT 'bucketed' AS strategy, bkt, CAST((rn - 1) // 32 AS INT) AS batch_id, len FROM rb
             |      UNION ALL
             |      SELECT 'arrival', bkt, CAST((rn - 1) // 32 AS INT), len FROM ra)
             |SELECT strategy, bkt AS bucket, batch_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(MAX(len) AS BIGINT) AS max_len,
             |       CAST(COUNT(*) * MAX(len) - SUM(len) AS BIGINT) AS pad_tokens
             |FROM u GROUP BY 1, 2, 3""".stripMargin),
      "LENGTH-BUCKETED inference batching — the serving/eval-side packing axis (pk01-pk03 pack for TRAINING, where concat erases lengths; inference and scoring pad every sequence in a batch to the batch max, so batch composition IS a cost knob: arrival-order batches pay mean(batch_max - len) per doc in dead pad FLOPs, and the standard fix — HF group_by_length, fairseq's bucketing — is to batch WITHIN length buckets). One query emits the per-batch cost table for BOTH strategies over the same corpus and the same deterministic md5 order (sp01's reproducibility contract: batches are identical across runs, partitionings, and engines): per (strategy, bucket, batch of 32) — doc count, padded length, and pad_tokens = n*max - sum, the exact dead-compute bill; Σ pad(bucketed) vs Σ pad(arrival) is the measured win (~6x on the fixture), read straight off the output. Scale shape: the within-bucket rank is a (bucket, md5-prefix)-partitioned window + a counter-grain per-bucket offset broadcast — the pk03 two-phase discipline with the bucket key prepended, so no doc-grain single partition exists under EITHER strategy (the arrival baseline gets the same two-phase treatment with one pseudo-bucket; the oracle spells both as plain windows, which DuckDB may run single-threaded — the SPARK plan is what the sweep audits). Buckets are 16-token bins (the fixture's length spread is ~30-100; the width is the op's granularity knob — production tunes it against bucket-count fragmentation, visible here as short tail batches). SamplingSpec replays both deals sequentially and pins the bucketed total strictly under arrival.") {
      (s, dir) =>
        val d = docs(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("len"),
            md5(col("doc_id").cast("string")).as("h"))
        def deal(strategy: String, bucketed: Boolean): DataFrame = {
          val withB =
            if (bucketed) d.withColumn("bkt", expr("len div 16").cast("int"))
            else d.withColumn("bkt", lit(-1))
          val pfx = withB.withColumn("pfx", substring(col("h"), 1, 2))
          val wIn = Window.partitionBy("bkt", "pfx").orderBy("h", "doc_id")
          val offs = pfx.groupBy("bkt", "pfx").agg(count(lit(1)).as("cnt"))
            .withColumn("off", coalesce(
              sum(col("cnt")).over(Window.partitionBy("bkt").orderBy("pfx")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          pfx.join(broadcast(offs.select("bkt", "pfx", "off")), Seq("bkt", "pfx"))
            .withColumn("rn", col("off") + row_number().over(wIn))
            .withColumn("batch_id", expr("CAST((rn - 1) div 32 AS INT)"))
            .groupBy(col("bkt"), col("batch_id"))
            .agg(count(lit(1)).as("nd"), max(col("len")).as("ml"), sum(col("len")).as("sl"))
            .select(lit(strategy).as("strategy"), col("bkt").as("bucket"),
              col("batch_id"),
              col("nd").cast("bigint").as("n_docs"),
              col("ml").cast("bigint").as("max_len"),
              (col("nd") * col("ml") - col("sl")).cast("bigint").as("pad_tokens"))
        }
        deal("bucketed", bucketed = true)
          .unionByName(deal("arrival", bucketed = false))
    },

    GraftQuery(
      "pk05_bpe_unit_shards",
      Some(s"""WITH u AS MATERIALIZED (SELECT * FROM (${TextAnalysis.bpeEncodeOracle}) z),
              |r AS (SELECT doc_id, n_tokens, n_bpe_units,
              |             ROW_NUMBER() OVER (ORDER BY n_bpe_units DESC, doc_id) AS rn
              |      FROM u)
              |SELECT CAST(CASE WHEN ((rn - 1) // 16) % 2 = 0 THEN (rn - 1) % 16
              |                 ELSE 15 - (rn - 1) % 16 END AS INT) AS shard,
              |       COUNT(*) AS n_docs,
              |       CAST(SUM(n_bpe_units) AS BIGINT) AS shard_units,
              |       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
              |FROM r GROUP BY 1""".stripMargin),
      "BPE-UNIT shard balancing — the packing family re-based on the unit the TRAINER actually consumes (VERDICT r16 #2): pk02 balances shards in WHITESPACE tokens, but tx21's encode is what prices a document to the GPU — a shard balanced in whitespace tokens is UNBALANCED in BPE units exactly when token-length and unit-length diverge (long words, rare vocabulary — the pl03 cleaned-counts argument pushed one level deeper, from 'pack what survives' to 'pack what the model sees'). Same shipped serpentine core (serpentineShardAssignments — one definition with pk02: two-phase global descending rank, boustrophedon 16-shard deal), budget column swapped to tx21's per-doc n_bpe_units via the factored bpeUnits core (one definition with tx21 — the packer and the tokenizer report cannot drift). Output per shard: doc count, the BPE-unit load the deal balanced, AND the whitespace-token load it implies — the two-unit comparison read straight off the table (unit-balanced shards visibly spread in tokens; SamplingSpec measures the converse, pins pk05's unit spread at-most pk02's deal re-priced in units with strict improvement at the divergent fixtures, and pins unit conservation against tx21). The oracle chains tx20's training CTEs through tx21's encode into the serpentine rank — both engines train, encode, and deal identically, all exact integers. At 100 TB: the encode is the corpus-scale pass tx21 already prices (vocabulary-sized merge folds, one broadcast join); the deal adds pk02's two-phase rank — no fact-scale single partition, sweep-enforced like every rank in the family.") {
      (s, dir) =>
        val u = Materialize(TextAnalysis.bpeUnits(s, dir))
        serpentineShardAssignments(
            u.select(col("doc_id"), col("n_bpe_units").as("n_tokens")))
          .select(col("doc_id"), col("n_tokens").as("n_units"), col("shard"))
          .join(u.select("doc_id", "n_tokens"), Seq("doc_id"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_units")).cast("bigint").as("shard_units"),
            sum(col("n_tokens")).cast("bigint").as("shard_tokens"))
    },

    GraftQuery(
      "pk06_bpe_unit_sequences",
      Some(s"""WITH u AS MATERIALIZED (SELECT * FROM (${TextAnalysis.bpeEncodeOracle}) z),
              |d AS (SELECT doc_id, n_bpe_units AS n_units,
              |             md5(CAST(doc_id AS VARCHAR)) AS h FROM u),
              |c AS (SELECT doc_id, n_units,
              |        COALESCE(SUM(n_units) OVER (ORDER BY h, doc_id
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
              |      FROM d)
              |SELECT doc_id, n_units, CAST(st AS BIGINT) AS start_unit,
              |       CAST(st // 2048 AS BIGINT) AS seq_first,
              |       CAST((st + n_units - 1) // 2048 AS BIGINT) AS seq_last
              |FROM c""".stripMargin),
      "BPE-UNIT training-sequence construction — pk03's concat-and-chunk re-based on the unit the trainer consumes (pk05's argument at SEQUENCE grain, where it bites harder: a shard is an aggregate so whitespace-vs-unit skew averages out across thousands of docs, but a 2048-cut SEQUENCE is the attention window itself — cut boundaries computed in whitespace tokens land mid-unit-budget, so 'sequence = 2048 tokens' becomes 'sequence = whatever unit count those tokens encode to', and the loader's masks misalign with what the GPU batches). Same md5-of-key deterministic order (sp01's contract — byte-identical re-packing on any layout), same two-phase global prefix sum (256 md5-prefix buckets whose lexicographic order IS the global order, bounded within-bucket running sum, 256-row cumulative offset broadcast — no fact-scale rows cross one partition), with the summed column swapped to tx21's per-doc n_bpe_units via the factored bpeUnits core (one definition with tx21/pk05). Per doc: global UNIT offset and the [seq_first, seq_last] range of 2048-UNIT sequences it occupies — sequence count = ceil(corpus_units/2048) by construction, every unit used, zero padding. The oracle chains tx20's training CTEs through tx21's encode into pk03's prefix-sum spelling — train, encode, order, and cut identically in both engines, exact BIGINT throughout. SamplingSpec pins unit conservation (last offset + last doc's units == tx21's corpus total), the ceil sequence-count identity, and the measured re-basing claim: documents exist whose unit-based sequence range disagrees with pk03's token-based one (the misalignment the re-base removes). At 100 TB the bill is tx21's encode (vocabulary-sized folds + one broadcast join) plus pk03's priced two-phase sum — nothing new shuffles at fact scale.") {
      (s, dir) =>
        val d = TextAnalysis.bpeUnits(s, dir)
          .select(col("doc_id"), col("n_bpe_units").as("n_units"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("bkt", substring(col("h"), 1, 2))
        val wIn = Window.partitionBy("bkt").orderBy("h", "doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = d.groupBy("bkt").agg(sum(col("n_units")).as("tot"))
          .withColumn("off", coalesce(
            sum(col("tot")).over(Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        d.join(broadcast(offs.select("bkt", "off")), "bkt")
          .withColumn("start_unit",
            col("off") + coalesce(sum(col("n_units")).over(wIn), lit(0L)))
          .select(col("doc_id"), col("n_units"), col("start_unit"),
            expr("start_unit div 2048").as("seq_first"),
            expr("(start_unit + n_units - 1) div 2048").as("seq_last"))
    },

    GraftQuery(
      "sp13_split_leakage_audit",
      Some(s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
              |sh AS (SELECT doc_id, ${Dedup.shingleDuck} AS gs FROM d),
              |${Dedup.pairScoreDuck},
              |edges AS (SELECT doc_a, doc_b FROM p
              |          JOIN n na ON na.doc_id = p.doc_a
              |          JOIN n nb ON nb.doc_id = p.doc_b
              |          WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.8),
              |sp AS (SELECT doc_id, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              |                           ELSE 'test' END AS split
              |       FROM (SELECT doc_id, ${duckBucket100Of("doc_id")} AS b FROM documents) x),
              |lab AS (SELECT LEAST(sa.split, sb2.split) AS split_lo,
              |               GREATEST(sa.split, sb2.split) AS split_hi
              |        FROM edges e JOIN sp sa ON sa.doc_id = e.doc_a
              |                     JOIN sp sb2 ON sb2.doc_id = e.doc_b),
              |cnt AS (SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs
              |        FROM lab GROUP BY 1, 2)
              |SELECT c.split_lo, c.split_hi,
              |       CAST(COALESCE(cnt.n_pairs, 0) AS BIGINT) AS n_pairs
              |FROM (VALUES ('test','test'),('test','train'),('test','val'),
              |             ('train','train'),('train','val'),('val','val')) c(split_lo, split_hi)
              |LEFT JOIN cnt USING (split_lo, split_hi)""".stripMargin),
      "SPLIT LEAKAGE audit — the hygiene check BETWEEN the split and the dedup that neither owns alone: sp05 assigns train/val/test by md5 bucket, which is reproducible but CONTENT-BLIND, so two near-duplicate documents can land on opposite sides of the eval boundary — the held-out set then scores memorization, not generalization (the leakage mechanism the C4/Pile duplication studies documented; dc01 audits leakage against an EXTERNAL benchmark, this audits the split against ITSELF). One query: dd05's shipped near-dup pairs (the SAME df-capped inverted-index join + 0.8 Jaccard rule, via the factored jaccardEdges core / pairScoreDuck SQL — the audit measures the production near-dup definition, not a paraphrase) labeled by each endpoint's sp05 split, normalized to unordered (split_lo, split_hi), counted into the full 3x3 upper-triangle matrix — all SIX cells explicit, zeros meaning 'checked, clean' (dc03's contract): the train-test cell is the leakage figure a release gates on (4 pairs at sf0.01 — caught), train-train is dd08's ordinary dedup work, and the within-eval cells price eval redundancy. Counter-grain output from pair-grain work already audited in dd05's plan; the split labels join doc-id-keyed. At 100 TB this audit is why dedup runs BEFORE splitting in pl01 (keepers then split) — sp13 is the check that the ordering actually held. SamplingSpec replays from the shipped dd05 pairs + the md5 bucket rule and pins the leaky cell non-vacuous.") {
      (s, dir) =>
        val b = expr(bucket100("doc_id"))
        val splits = docs(s, dir).select(col("doc_id"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
        val lab = Dedup.jaccardEdges(s, dir)
          .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
          .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
          .select(least(col("sa"), col("sb")).as("split_lo"),
            greatest(col("sa"), col("sb")).as("split_hi"))
          .groupBy("split_lo", "split_hi").agg(count(lit(1)).as("n"))
        val combos = s.createDataFrame(Seq(
            ("test", "test"), ("test", "train"), ("test", "val"),
            ("train", "train"), ("train", "val"), ("val", "val")))
          .toDF("split_lo", "split_hi")
        combos.join(broadcast(lab), Seq("split_lo", "split_hi"), "left")
          .select(col("split_lo"), col("split_hi"),
            coalesce(col("n"), lit(0L)).cast("bigint").as("n_pairs"))
    },

    GraftQuery(
      "sp14_budget_waterfill",
      Some("""WITH dom AS (SELECT lang, source,
             |         SUM(LEN(STRING_SPLIT(text, ' '))) AS c
             |       FROM documents GROUP BY 1, 2),
             |tot AS (SELECT SUM(c) AS b, COUNT(*) AS n FROM dom),
             |ranked AS (SELECT lang, source, c, 2 * c AS cap,
             |         ROW_NUMBER() OVER (ORDER BY 2 * c, lang, source) AS k,
             |         SUM(2 * c) OVER (ORDER BY 2 * c, lang, source
             |           ROWS UNBOUNDED PRECEDING) AS p
             |       FROM dom),
             |st AS (SELECT (SELECT COUNT(*) FROM ranked, tot
             |               WHERE cap * (n - k) + p <= b) AS kstar,
             |              b, n FROM tot),
             |sh AS (SELECT s.kstar, s.n - s.kstar AS m, s.b,
             |              COALESCE((SELECT p FROM ranked r2 WHERE r2.k = s.kstar), 0) AS pstar
             |       FROM st s)
             |SELECT r.lang, r.source, CAST(r.c AS BIGINT) AS n_tokens,
             |       CAST(CASE WHEN r.k <= s.kstar OR s.m = 0 THEN r.cap
             |            ELSE (s.b - s.pstar) // s.m +
             |                 CASE WHEN r.k - s.kstar <= (s.b - s.pstar) % s.m
             |                      THEN 1 ELSE 0 END
             |            END AS BIGINT) AS alloc_tokens,
             |       CASE WHEN r.k <= s.kstar THEN 'capped' ELSE 'filled' END AS status
             |FROM ranked r, sh s""".stripMargin),
      "TOKEN-BUDGET WATER-FILLING with repetition caps — the epoch allocator a multilingual/multi-source training run decides its data card with (the D4/data-budgeting question: given a total token budget and a hard repetition ceiling per domain, who gets how many tokens?): uniform mixing wants every (lang, source) domain to contribute an equal share of the budget, but a small domain repeated past the cap (here R = 2 epochs) measurably degrades the model (the documented repeated-data penalty), so its contribution CAPS at R x its corpus and the freed budget waterfalls to the domains that can absorb it. The exact solution is classic water-filling, computed CLOSED-FORM in integers: sort domains by cap ascending (tie-break (lang, source) — fully deterministic), f(k) = prefix_cap(k) + cap_k x (n - k) is non-decreasing, so the capped set is the prefix where f(k) <= B (one conditional count, no iteration — the analytical threshold the iterative redistribute-until-stable loop converges to), every capped domain takes exactly its cap, and the survivors split the remaining budget by truncating division with the remainder assigned to the first (B - P*) mod m of them in sort order — allocations sum to B EXACTLY, bit-identical cross-engine (no floats anywhere; B = the corpus's own total token count, so the fixture exercises both polarities at every SF — smallest domains cap at 2 epochs, the largest absorb the freed budget). The whole decision runs on a domain-grain aggregate (~100 rows — the q62/sp08 counter-grain pattern): ONE corpus scan computes per-domain token counts map-side partial-aggregated, the unpartitioned windows order domain-count rows, and the output is the per-domain allocation table a sampler (sp08) or shard packer (pk05) consumes. At 100 TB nothing but the token-count scan touches the corpus. SamplingSpec replays the fill driver-side (greedy redistribute-until-stable == the closed form), and pins sum == budget, both statuses non-vacuous, and every allocation within its cap.") {
      (s, dir) =>
        val dom = docs(s, dir)
          .groupBy("lang", "source")
          .agg(sum(size(split(col("text"), " ")).cast("long")).as("c"))
        val wAll = Window.partitionBy()
        val ord = Window.partitionBy()
          .orderBy(col("cap"), col("lang"), col("source"))
        val ranked = dom
          .withColumn("cap", lit(2L) * col("c"))
          .withColumn("b", sum(col("c")).over(wAll))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("k", row_number().over(ord))
          .withColumn("p", sum(col("cap")).over(ord))
        val st = ranked
          .agg(
            sum(when(col("cap") * (col("n") - col("k")) + col("p") <= col("b"), 1L)
              .otherwise(0L)).as("kstar"),
            first(col("b")).as("b"), first(col("n")).as("n"),
            // P* = prefix cap at kstar: max(p) over capped rows (0 if none)
            coalesce(max(when(
              col("cap") * (col("n") - col("k")) + col("p") <= col("b"), col("p"))),
              lit(0L)).as("pstar"))
          .withColumn("m", col("n") - col("kstar"))
        ranked.drop("b", "n")
          .crossJoin(broadcast(st.select("kstar", "b", "pstar", "m")))
          .select(col("lang"), col("source"), col("c").cast("bigint").as("n_tokens"),
            when(col("k") <= col("kstar") || col("m") === 0, col("cap"))
              .otherwise(expr("(b - pstar) div m") +
                when(col("k") - col("kstar") <= expr("(b - pstar) % m"), 1L)
                  .otherwise(0L))
              .cast("bigint").as("alloc_tokens"),
            when(col("k") <= col("kstar"), lit("capped"))
              .otherwise(lit("filled")).as("status"))
    })
}

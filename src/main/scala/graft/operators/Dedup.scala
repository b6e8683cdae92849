package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents`/`embeddings` tables
  * (harness-mandated, SURVEY.md §2.3): exact, normalized-key, MinHash
  * LSH, SimHash, exact n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB stance):
  *  - exact/normalized dedup is one hash-partitioned shuffle on the key
  *    (window row_number), no driver state;
  *  - MinHash/SimHash candidate generation goes through LSH *banding*
  *    — candidates meet in a band-key shuffle (equi-join), never an
  *    O(n²) cross join; signature computation is pure map-side
  *    higher-order expressions inside whole-stage codegen;
  *  - the only O(n²) operator is dd06 (exact cosine pairs), kept as
  *    the correctness baseline for its LSH counterparts (ss02 is the
  *    scale path).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Distinct word-trigram shingles per document (empty when <3 tokens). */
  private val shingleExpr =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
      |    i -> concat_ws(' ', slice(split(text, ' '), i, 3))))
      |ELSE array() END""".stripMargin

  /** 32 MinHash values: for each seed i, min over shingles of
    * xxhash64(i || shingle). All built-ins, fully codegen'd.
    */
  private val minhashSigExpr =
    """transform(sequence(0, 31),
      |  i -> array_min(transform(shingles, s -> xxhash64(concat(CAST(i AS STRING), '|', s)))))""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "dd01_exact_dedup",
      Some("""SELECT doc_id, lang, source, n_copies FROM (
             |  SELECT doc_id, lang, source,
             |         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY text) AS n_copies
             |  FROM documents) t WHERE rn = 1""".stripMargin),
      "Exact dedup: keep lowest doc_id per identical text; one shuffle on the text key.") {
      (s, dir) =>
        val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
        docs(s, dir)
          .withColumn("rn", row_number().over(w))
          .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("text"))))
          .filter(col("rn") === 1)
          .select("doc_id", "lang", "source", "n_copies")
    },

    GraftQuery(
      "dd02_normalized_dedup",
      Some("""SELECT doc_id, fp, n_copies FROM (
             |  SELECT doc_id, MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS fp,
             |         ROW_NUMBER() OVER (PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) ORDER BY doc_id) AS rn,
             |         COUNT(*) OVER (PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS n_copies
             |  FROM documents) t WHERE rn = 1""".stripMargin),
      "Normalized-key dedup: md5 fingerprint of lowercased whitespace-collapsed text — shuffles the 16-byte key, not the document.") {
      (s, dir) =>
        val fp = md5(lower(regexp_replace(col("text"), "\\s+", " ")))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        docs(s, dir)
          .withColumn("fp", fp)
          .withColumn("rn", row_number().over(w))
          .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("fp"))))
          .filter(col("rn") === 1)
          .select("doc_id", "fp", "n_copies")
    },

    GraftQuery(
      "dd03_minhash_lsh_pairs",
      None, // xxhash64 seeds aren't reproducible in DuckDB → rows-only check
      "MinHash(32) + LSH banding (8 bands × 4 rows): candidate pairs meet in a band-key equi-join (no cross join); est. Jaccard = fraction of agreeing minhashes ≥ 0.5.") {
      (s, dir) =>
        val sig = docs(s, dir)
          .withColumn("shingles", expr(shingleExpr))
          .filter(size(col("shingles")) > 0)
          .withColumn("sig", expr(minhashSigExpr))
          .select("doc_id", "sig")
        val bands = sig.select(col("doc_id"), col("sig"),
          posexplode(expr(
            """transform(sequence(0, 7),
              |  b -> xxhash64(concat_ws(',', transform(slice(sig, b*4+1, 4), x -> CAST(x AS STRING)))))""".stripMargin))
            .as(Seq("band_idx", "band_hash")))
        val a = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          col("band_idx"), col("band_hash"))
        val b = bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          col("band_idx"), col("band_hash"))
        a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            (expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> CAST(x = y AS INT)), v -> v = 1))")
              .cast("double") / 32).as("est_jaccard"))
          .distinct()
          .filter(col("est_jaccard") >= 0.5)
    },

    GraftQuery(
      "dd04_simhash_pairs",
      None, // xxhash64-derived bit vectors aren't reproducible in DuckDB → rows-only check
      "SimHash(64-bit) near-dup: per-token hash bits summed ±1, sign-packed to a bitstring; 4×16-bit band join finds candidates (pigeonhole-complete for hamming ≤ 3); Hamming distance ≤ 3 confirms.") {
      (s, dir) =>
        val sim = docs(s, dir)
          .withColumn("toks", split(col("text"), " "))
          // 64-long vector: for each bit b, sum over tokens of ±1 by hash bit
          .withColumn("bits", expr(
            """transform(
              |  aggregate(toks, array_repeat(0L, 64),
              |    (acc, w) -> zip_with(acc,
              |      transform(sequence(0, 63),
              |        b -> IF(((shiftright(xxhash64(w), b) & 1L) = 1L), 1L, -1L)),
              |      (x, y) -> x + y)),
              |  v -> IF(v > 0, '1', '0'))""".stripMargin))
          .withColumn("simhash", expr("concat_ws('', bits)"))
          .select("doc_id", "simhash")
        val bands = sim.select(col("doc_id"), col("simhash"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> substring(simhash, b*16 + 1, 16))"))
            .as(Seq("band_idx", "band_bits")))
        val a = bands.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"),
          col("band_idx"), col("band_bits"))
        val b = bands.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"),
          col("band_idx"), col("band_bits"))
        a.join(b, Seq("band_idx", "band_bits"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            expr("size(filter(zip_with(split(sh_a, ''), split(sh_b, ''), (x, y) -> CAST(x <> y AS INT)), v -> v = 1))")
              .as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
    },

    GraftQuery(
      "dd05_ngram_jaccard_pairs",
      Some("""WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |         CASE WHEN LEN(w) >= 3 THEN
             |           LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
             |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
             |         ELSE [] END AS gs
             |       FROM toks),
             |e AS (SELECT doc_id, LEN(gs) AS n, UNNEST(gs) AS g FROM sh)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       CAST(COUNT(*) AS DOUBLE) / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) AS jaccard
             |FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
             |GROUP BY a.doc_id, b.doc_id
             |HAVING CAST(COUNT(*) AS DOUBLE) / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) >= 0.8""".stripMargin),
      "Exact word-trigram Jaccard ≥ 0.8 via inverted-index self-join on shared shingles — the oracle-checkable ground truth for dd03.") {
      (s, dir) =>
        val sh = docs(s, dir)
          .withColumn("gs", expr(shingleExpr))
          .select(col("doc_id"), size(col("gs")).as("n"), explode(col("gs")).as("g"))
        val a = sh.select(col("doc_id").as("doc_a"), col("n").as("n_a"), col("g"))
        val b = sh.select(col("doc_id").as("doc_b"), col("n").as("n_b"), col("g"))
        a.join(b, Seq("g"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg((count(lit(1)).cast("double") /
            (first(col("n_a")) + first(col("n_b")) - count(lit(1)))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
    },

    GraftQuery(
      "dd06_embedding_neardup_pairs",
      Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin),
      "Embedding-cosine near-dup pairs (exact O(n²) baseline; ss02 is the LSH scale path). Double-precision math on both sides; 4-dp rounding absorbs association-order ulps.") {
      (s, dir) =>
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
        val a = emb.select(col("vec_id").as("vec_a"), col("e").as("e_a"))
        val b = emb.select(col("vec_id").as("vec_b"), col("e").as("e_b"))
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("sim", expr(
            """aggregate(zip_with(e_a, e_b, (x, y) -> x * y), 0D, (s, v) -> s + v)
              | / sqrt(aggregate(e_a, 0D, (s, x) -> s + x * x)
              |        * aggregate(e_b, 0D, (s, x) -> s + x * x))""".stripMargin))
          .filter(col("sim") >= 0.45)
          .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
    },
  )
}

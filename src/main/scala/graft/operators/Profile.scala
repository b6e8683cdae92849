package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Data-quality profiling over the documents corpus (harness extension,
  * SURVEY.md §2.3): the summary a pipeline operator runs before
  * admitting a new 100 TB crawl drop into training.
  *
  * Scale design: pr01 computes every per-column statistic in ONE scan —
  * the three exact count-distincts share a single Expand-based
  * aggregation (3x row expansion, one shuffle) instead of one scan per
  * column, and the wide->long pivot is a `stack` over the single
  * 1-row aggregate. pr02 bins with integer division (exact in any
  * engine) so the histogram is a plain hash aggregation — no
  * data-driven bounds pass, no second scan.
  */
object Profile {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "pr01_column_profile",
      Some("""SELECT 'lang' AS col, COUNT(*) AS n_rows,
             |       COUNT(*) - COUNT(lang) AS n_nulls,
             |       COUNT(DISTINCT lang) AS n_distinct,
             |       CAST(MIN(lang) AS VARCHAR) AS min_v, CAST(MAX(lang) AS VARCHAR) AS max_v
             |FROM documents
             |UNION ALL
             |SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
             |       CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
             |       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents""".stripMargin),
      "Per-column profile (rows, nulls, exact distinct, min/max) for three documents columns in a SINGLE scan: the count-distincts share one Expand aggregation, then stack() pivots the 1-row wide result to long form. The DuckDB oracle spells it as three scans — same values, which is the point: the one-pass plan is the scale win.") {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .agg(
            count(lit(1)).as("nr"),
            count(col("lang")).as("lang_nn"),
            countDistinct(col("lang")).as("lang_nd"),
            min(col("lang")).cast("string").as("lang_min"),
            max(col("lang")).cast("string").as("lang_max"),
            count(col("source")).as("src_nn"),
            countDistinct(col("source")).as("src_nd"),
            min(col("source")).cast("string").as("src_min"),
            max(col("source")).cast("string").as("src_max"),
            count(col("n_chars")).as("nc_nn"),
            countDistinct(col("n_chars")).as("nc_nd"),
            min(col("n_chars")).cast("string").as("nc_min"),
            max(col("n_chars")).cast("string").as("nc_max"))
          .selectExpr(
            """stack(3,
              |  'lang',    nr, nr - lang_nn, lang_nd, lang_min, lang_max,
              |  'source',  nr, nr - src_nn,  src_nd,  src_min,  src_max,
              |  'n_chars', nr, nr - nc_nn,   nc_nd,   nc_min,   nc_max)
              |AS (col, n_rows, n_nulls, n_distinct, min_v, max_v)""".stripMargin)
    },

    GraftQuery(
      "pr02_length_histogram",
      Some("""SELECT (n_chars // 50) * 50 AS bin_lo, (n_chars // 50) * 50 + 50 AS bin_hi,
             |       COUNT(*) AS n, COUNT(DISTINCT lang) AS n_langs
             |FROM documents GROUP BY n_chars // 50""".stripMargin),
      "Fixed-width length histogram (50-char bins) with per-bin language diversity. Integer-division binning is exact and engine-independent; the whole query is one hash aggregation with map-side partials — the shape that profiles a 100 TB corpus in a single pass.") {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(expr("n_chars div 50").as("bucket"))
          .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("n_langs"))
          .select((col("bucket") * 50).as("bin_lo"),
            (col("bucket") * 50 + 50).as("bin_hi"), col("n"), col("n_langs"))
    },
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's inventory.
  *
  * @param name   stable key, appears in `SparkEntry.queries`
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or
  *               None when the semantics aren't cross-engine-stable
  *               (hash seeds, ANN buckets) — the driver then records a
  *               weaker rows-only check.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §7.4):
  *  - money math is done in `decimal(12,2)`-derived types in BOTH
  *    engines, then cast to double at the end: decimal arithmetic is
  *    exact and order-independent, so hashes match bit-for-bit;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - top-k queries carry unique tiebreak sort keys.
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    doc: String)(
    val build: (SparkSession, String) => DataFrame)

object GraftQuery {
  /** All inventory modules, in SURVEY.md §2 order. */
  def all: Seq[GraftQuery] =
    operators.Relational.all ++
      operators.CdcQueries.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.TextAnalysis.all ++
      operators.Sketches.all ++
      operators.Graph.all ++
      operators.Profile.all ++
      operators.Sampling.all ++
      operators.Decontam.all ++
      operators.Multimodal.all ++
      operators.StreamingWindows.all ++
      operators.Udx.all ++
      operators.Temporal.all ++
      operators.Pipeline.all
}

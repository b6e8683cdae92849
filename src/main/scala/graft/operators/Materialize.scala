package graft.operators

import org.apache.spark.sql.DataFrame

/** How the dedup/similarity builders pin a multi-consumer intermediate,
  * selected by the session conf `spark.graft.materialize`:
  *
  *  - `localCheckpoint` (default): eager one-shot compute, blocks live
  *    OUTSIDE the CacheManager (no residue for an embedding session;
  *    superseded blocks are reclaimed by the ContextCleaner once the
  *    Dataset is unreferenced). TRADE: lineage is truncated, so a lost
  *    executor's blocks cannot be recomputed — the action fails and the
  *    job-level retry rebuilds. Right default for bench/verify and for
  *    single-JVM sessions.
  *  - `persist`: lazy cached plan, survives executor loss by
  *    recomputing lost partitions from lineage — the cluster-resilient
  *    choice for long multi-tenant sessions. TRADE: entries stay in the
  *    CacheManager until the caller `clearCache()`s (the builders
  *    return lazy frames, so they cannot scope an unpersist themselves).
  *  - `none`: identity — no materialization, shared subplans recompute
  *    per consumer. Used by plan audits to see the FULL logical plan
  *    (a checkpoint hides everything upstream of it), and correct when
  *    a caller materializes the builder's output itself anyway.
  *
  * The min-label propagation loop's checkpoints (its edge pin and the
  * per-hop labels) are NOT governed by this switch — truncating
  * lineage there is what keeps the iterated plan from growing without
  * bound and rounds from re-deriving the edge pipeline (a
  * correctness/cost invariant of the loop, not a caching preference).
  */
object Materialize {
  val ConfKey = "spark.graft.materialize"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint") match {
      case "none" => df
      case "persist" => df.persist()
      case "localCheckpoint" => df.localCheckpoint()
      case other => throw new IllegalArgumentException(
        s"$ConfKey='$other' — expected one of localCheckpoint|persist|none " +
          "(a typo silently falling back would change the fault-tolerance contract)")
    }
}

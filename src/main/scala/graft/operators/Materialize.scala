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
  val Modes: Set[String] = Set("localCheckpoint", "persist", "none")

  /** Throws on an unknown mode — callers that read the mode from the
    * environment validate EAGERLY with this (a typo surfacing only
    * inside a swallowed warmup `try` would silently run unwarmed).
    */
  def validate(mode: String): Unit =
    if (!Modes(mode)) throw new IllegalArgumentException(
      s"$ConfKey='$mode' — expected one of ${Modes.mkString("|")} " +
        "(a typo silently falling back would change the fault-tolerance contract)")

  def apply(df: DataFrame): DataFrame = {
    val mode = df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint")
    validate(mode)
    mode match {
      case "none" => df
      case "persist" => df.persist()
      case "localCheckpoint" => df.localCheckpoint()
    }
  }

  /** Deterministically drop every RDD still pinned in the session's
    * block manager — `localCheckpoint` blocks included, which
    * `spark.catalog.clearCache()` can NOT reach (they live outside the
    * CacheManager and are otherwise reclaimed only when a GC cycle
    * feeds the async ContextCleaner). Harness hygiene between
    * independent queries: without it a long query sequence accumulates
    * dozens of checkpoint pins and the tail runs under heap pressure —
    * the r5 bench measured st01 at 2.69 s in sequence vs 0.50 s
    * isolated from exactly this residue. Callers must be done with
    * every pinned frame: a localCheckpoint has no lineage to recompute
    * from, so touching one after this call fails.
    */
  def releasePinned(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
}

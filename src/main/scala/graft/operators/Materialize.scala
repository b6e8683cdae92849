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

  // RDD ids of the localCheckpoint pins graft itself created, so
  // releasePinned can scope its unpersist to them — a co-tenant's
  // persisted RDD on the same SparkContext (e.g. ChangeArchiveJob's
  // per-batch persist) must not be blocking-unpersisted mid-flight.
  // Ids are attributed by diffing getPersistentRDDs around the
  // checkpoint call; a co-tenant pinning concurrently DURING that
  // narrow window could be misattributed, which is still strictly
  // safer than the previous release-everything behavior.
  // Keyed PER SparkContext (weak keys: a stopped context's entry is
  // GC'd): RDD ids are a per-context counter, so an id tracked in one
  // context must never be matched against an unrelated RDD that
  // happens to get the same id in a successor context.
  private val graftPins =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.util.Set[Integer]]()

  private def pinsFor(sc: org.apache.spark.SparkContext): java.util.Set[Integer] =
    graftPins.synchronized {
      var s = graftPins.get(sc)
      if (s == null) {
        s = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
        graftPins.put(sc, s)
      }
      s
    }

  /** `df.localCheckpoint()` with the resulting block-manager pins
    * recorded as graft-owned (see [[releasePinned]]). All graft code
    * that checkpoints must pin through here — an untracked pin would
    * survive the harness' between-queries release and re-create the
    * r5 bench-residue drift.
    */
  def trackedLocalCheckpoint(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val pins = pinsFor(sc)
    (sc.getPersistentRDDs.keySet -- before).foreach(id => pins.add(id))
    out
  }

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
      case "localCheckpoint" => trackedLocalCheckpoint(df)
    }
  }

  /** Deterministically drop the `localCheckpoint` pins graft created —
    * blocks `spark.catalog.clearCache()` can NOT reach (they live
    * outside the CacheManager and are otherwise reclaimed only when a
    * GC cycle feeds the async ContextCleaner). Harness hygiene between
    * independent queries: without it a long query sequence accumulates
    * dozens of checkpoint pins and the tail runs under heap pressure —
    * the r5 bench measured st01 at 2.69 s in sequence vs 0.50 s
    * isolated from exactly this residue. Scoped to graft-tracked pins:
    * a co-tenant's persisted RDDs on the shared SparkContext are left
    * alone. Callers must be done with every graft-pinned frame: a
    * localCheckpoint has no lineage to recompute from, so touching one
    * after this call fails.
    */
  def releasePinned(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.sparkContext
    val live = sc.getPersistentRDDs
    val pins = pinsFor(sc)
    // remove exactly the ids iterated — not clear(): an id a concurrent
    // trackedLocalCheckpoint adds mid-release must stay tracked for the
    // next release, or its pin silently outlives the harness hygiene
    pins.toArray(Array.empty[Integer]).foreach { id =>
      live.get(id.intValue).foreach(_.unpersist(blocking = true))
      pins.remove(id)
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PerceptronStore's build-once discipline generalized to the SHARED
  * pipeline stage cores (VERDICT r17 #4): `filterVerdicts`,
  * `spanDrops`, `intraDrops`, `bpeUnits`, `bpeUnitVocab` and
  * `pairCounts`/`overlapPairs` are each consumed by up to six
  * pl/pk/dd/dc queries — before this store the pl family alone
  * re-derived the same stage outputs several times per bench suite
  * (~47 s over six queries, per the r17 headline audit), exactly the
  * recomputation PerceptronStore's memo cut 2.5x out of pl04 in r16.
  * Each core now writes its frame to parquet ONCE per (application,
  * source dir) and every later consumer reads the store. The builds
  * are deterministic integer/md5/string artifacts, so
  * persist-then-read is bit-identical to a fresh derivation —
  * StageStoreSpec pins memoized == fresh row sets per core. At 100 TB
  * this is simply what a pipeline DOES: stage outputs are tables,
  * written once and read by every downstream consumer, never
  * re-derived per consumer.
  */
private[graft] object StageStore {

  /** Memoized parquet round-trip of `fresh`: build + write at most
    * once per (application, dir, name) — [[DiskMemo]]'s holder
    * semantics, including failure cleanup — then serve reads from the
    * store. `name` must be unique per core (it keys the memo AND the
    * on-disk layout).
    */
  def table(s: SparkSession, dir: String, name: String)(fresh: => DataFrame): DataFrame = {
    val tag = DiskMemo.tag(s, dir)
    val out = TempLayout.dir(s"stage_${name}_$tag", dir)
    DiskMemo.ensure(s"stage_${name}_$tag", out) {
      fresh.write.mode("overwrite").parquet(s"$out/t")
    }
    s.read.parquet(s"$out/t")
  }
}

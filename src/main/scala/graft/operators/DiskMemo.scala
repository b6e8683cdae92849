package graft.operators

import org.apache.spark.sql.SparkSession

/** Build-once discipline for the disk-persisted stores (PerceptronStore,
  * Similarity's IVF serving index, StreamedIndex's accreted twin):
  * previous rounds ran the multi-second Spark build INSIDE
  * `ConcurrentHashMap.computeIfAbsent`, which holds the map's bin lock
  * for the whole build — unrelated keys hashing to the same bin block
  * behind it, and the CHM contract asks for short, simple mapping
  * functions (ADVICE r16). Here computeIfAbsent only installs a cheap
  * lazy HOLDER; the build runs under the holder's own per-key monitor:
  *
  *  - concurrent callers of the SAME key still block until the first
  *    build finishes (the half-written-store protection the old form
  *    bought), but callers of OTHER keys never wait on it;
  *  - a build FAILURE deletes the partially written output directory
  *    and evicts the holder, so a retry rebuilds from scratch instead
  *    of `mode=overwrite` being the only thing healing torn parquet.
  */
private[graft] object DiskMemo {

  private final class Holder(build: () => String) {
    lazy val value: String = build()
  }

  private val built = new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  /** The shared memo-key discipline: md5 of the source dir (hashCode
    * collisions would cross-wire two dirs' stores — the q55 lesson)
    * plus applicationId so concurrent JVMs never interleave on disk.
    */
  def tag(s: SparkSession, dir: String): String = {
    val dirMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    s"${s.sparkContext.applicationId}_$dirMd5".replaceAll("[^a-zA-Z0-9]", "_")
  }

  /** Run `build` (which writes the store under `out`) at most once per
    * `key` per JVM — retried only after a failure — and return `out`.
    */
  def ensure(key: String, out: String)(build: => Unit): String = {
    val h = built.computeIfAbsent(key, _ => new Holder(() =>
      try { build; out }
      catch {
        case e: Throwable =>
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          rm(new java.io.File(out))
          built.remove(key)
          throw e
      }))
    h.value
  }
}

package graft.util

/** Bounded, staleness-aware fit-once memo for driver-resident fitted state
  * (the q_langid profile, the PQ codebooks). Two hazards the raw
  * `TrieMap[dir, model]` version had (ADVICE r8):
  *
  *   1. **Staleness** — keyed only by dir, a regenerated dataset within one
  *      JVM would silently serve the old fit. The key here is
  *      `(dir, mtime)` where mtime is the max last-modified time over the
  *      dir's direct children (parquet rewrites replace part files), so a
  *      data refresh is a new key and forces a re-fit.
  *   2. **Unbounded growth** — in a long-lived service touching many data
  *      dirs the memo is a driver-memory leak. Entries are capped at
  *      `maxEntries` with insertion-order eviction (oldest out), so the
  *      worst case is `maxEntries` bounded models, each of which is already
  *      dictionary-sized by its own contract.
  *
  * Fit wall-time is recorded per memo name in [[FitMemo.fitSeconds]] so the
  * bench artifact can report the one-time fit cost explicitly (`fit_sec`)
  * instead of min-of-N silently dropping it after iteration 1.
  */
final class FitMemo[V](val name: String, val maxEntries: Int = 8) {
  private val map =
    new java.util.LinkedHashMap[(String, Long), V](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), V]): Boolean =
        this.size() > maxEntries
    }

  /** Max mtime over the path's direct children (or the file's own mtime):
    * cheap — one directory listing, no recursion — and moves whenever a
    * parquet dataset is rewritten in place. Missing paths key as 0 (the
    * fit itself will surface the real error). */
  private def mtimeOf(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    try {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try {
          val it = s.iterator()
          var m = java.nio.file.Files.getLastModifiedTime(p).toMillis
          while (it.hasNext) {
            val t = java.nio.file.Files
              .getLastModifiedTime(it.next()).toMillis
            if (t > m) m = t
          }
          m
        } finally s.close()
      } else java.nio.file.Files.getLastModifiedTime(p).toMillis
    } catch { case _: Throwable => 0L }
  }

  /** Memoized fit: returns the cached model for (dir, current mtime) or
    * runs `fit`, records its wall time, and caches. Synchronized — fits
    * are rare and heavy; serializing them also prevents the duplicated
    * concurrent fit a TrieMap.getOrElseUpdate race allows. */
  def getOrFit(dir: String)(fit: => V): V = synchronized {
    val key = (dir, mtimeOf(dir))
    val existing = map.get(key)
    if (existing != null && map.containsKey(key)) existing
    else {
      val t0 = System.nanoTime()
      val v = fit
      FitMemo.record(name, (System.nanoTime() - t0) / 1e9)
      map.put(key, v)
      v
    }
  }

  def size: Int = synchronized(map.size)
  def clear(): Unit = synchronized(map.clear())
}

object FitMemo {
  private val fits = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  private[util] def record(name: String, sec: Double): Unit = {
    fits.merge(name, sec, (a: Double, b: Double) => a + b)
    ()
  }

  /** Cumulative fit seconds per memo name since JVM start (or reset). */
  def fitSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    fits.asScala.toMap
  }

  def resetFitSeconds(): Unit = fits.clear()
}

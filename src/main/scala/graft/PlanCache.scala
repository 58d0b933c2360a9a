package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-DataFrame memo.
  *
  * Spark's exchange reuse does not canonicalize repeated
  * scan→aggregate subtrees (measured: 0 ReusedExchange on the dedup
  * plans), so a subtree referenced on both sides of a self-join — or
  * shared by several registry queries — is recomputed once per
  * reference. Persisting it once per (session, sfDir, tag, params)
  * turns those recomputes into InMemoryTableScans.
  *
  * The key includes an explicit `params` component: a memoized subtree
  * is only as reusable as its parameterization (shingle width, LSH
  * bands/rows, hash family size), so tuning constants MUST appear in
  * the key or a stale plan would be served silently after a parameter
  * change. [[clear]] unpersists and drops a session's entries — call it
  * on session close or when the underlying tables change.
  */
object PlanCache {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()
  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (hits, misses) since JVM start — the memo layer is load-bearing
    * for the dedup/ANN family, so production needs to SEE whether it is
    * actually serving (EngineMetrics exports these as
    * plancache_hit_count / plancache_miss_count). */
  def stats: (Long, Long) = (hitCount.get(), missCount.get())

  def memo(s: SparkSession, dir: String, tag: String, params: String = "")
      (mk: => DataFrame): DataFrame = {
    // lifecycle hook, once per session: entries die with the application
    // (unpersist + drop) instead of dangling past their session
    if (hooked.add(s))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          clear(s); hooked.remove(s)
        }
      })
    val key = (s, dir, s"$tag[$params]")
    cache.get(key) match {
      case Some(df) => hitCount.incrementAndGet(); df
      case None =>
        missCount.incrementAndGet()
        cache.getOrElseUpdate(key, mk.persist(StorageLevel.MEMORY_AND_DISK))
    }
  }

  /** Unpersist and forget every entry belonging to `s` (all dirs/tags).
    * Unpersist failures are swallowed: when invoked from the app-end
    * listener the context is already stopping, and CacheManager's
    * recache pass then throws assertNotStopped — the entries die with
    * the JVM either way, but an escaped exception would error the
    * whole listener bus. */
  def clear(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach { df =>
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
}

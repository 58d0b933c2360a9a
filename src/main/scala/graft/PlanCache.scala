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
  *
  * Eviction (round-4 verdict item 7): a long-lived session touching
  * many (dir, params) keys must not accumulate persists without bound —
  * MEMORY_AND_DISK spills, but executor disk is finite and each entry
  * pins block-manager bookkeeping. The memo is therefore a size-bounded
  * LRU (access-ordered): inserting past [[maxEntries]] unpersists and
  * drops the least-recently-used entry. The bound is on ENTRIES, not
  * bytes, because entry payloads here are query-shaped intermediates of
  * comparable size per sf; evictions are counted and exported beside
  * hits/misses so production can see thrash (eviction rate ≈ miss rate
  * ⇒ raise the bound).
  */
object PlanCache {
  /** LRU capacity. Tunable via `-Dgraft.plancache.maxEntries=N`
    * (re-settable at runtime — the spec exercises eviction with a tiny
    * bound); default sized so the full registry's ~20 memoized subtrees
    * fit with headroom. */
  @volatile private[graft] var maxEntries: Int =
    sys.props.get("graft.plancache.maxEntries").flatMap { v =>
      // guarded: a malformed value inside a static initializer would
      // otherwise surface as an opaque ExceptionInInitializerError on
      // the first memo call, far from the misconfiguration
      val parsed = scala.util.Try(v.trim.toInt).toOption.filter(_ > 0)
      if (parsed.isEmpty)
        System.err.println(
          s"[graft] ignoring malformed graft.plancache.maxEntries='$v' (using default 64)")
      parsed
    }.getOrElse(64)

  // access-ordered LinkedHashMap gives true LRU (gets reorder); all
  // access goes through `lock` — contention is irrelevant next to the
  // persisted-subtree compute this memo exists to avoid
  private val lock = new Object
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
      16, 0.75f, /*accessOrder=*/ true)
  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()
  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val evictCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (hits, misses) since JVM start — the memo layer is load-bearing
    * for the dedup/ANN family, so production needs to SEE whether it is
    * actually serving (EngineMetrics exports these as
    * plancache_hit_count / plancache_miss_count). */
  def stats: (Long, Long) = (hitCount.get(), missCount.get())

  /** LRU evictions since JVM start (plancache_eviction_count). */
  def evictions: Long = evictCount.get()

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(blocking = false)
    catch { case scala.util.control.NonFatal(_) => () }

  /** `eager = true` materializes the entry ONCE at build time (cache
    * hits skip it). Use it for memos consumed inside iterative loops: an
    * un-finalized cached AQE plan reports Unknown output partitioning,
    * so the FIRST round's join would re-exchange + re-sort the big side
    * (the PageRank.layout lesson, operators/PageRank.scala) — paying one
    * count at build buys exchange-free rounds from round 1. */
  def memo(s: SparkSession, dir: String, tag: String, params: String = "",
      eager: Boolean = false)
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
    lock.synchronized(Option(cache.get(key))) match {
      case Some(df) => hitCount.incrementAndGet(); df
      case None =>
        missCount.incrementAndGet()
        // `mk` builds a lazy plan — cheap enough to run outside any
        // fancy per-key locking; a racing double-build persists one
        // plan twice at worst (second persist is a no-op on the same
        // logical plan only if identical object; otherwise the loser is
        // unpersisted here)
        val built = mk.persist(StorageLevel.MEMORY_AND_DISK)
        if (eager) built.count() // finalize the cached AQE plan (see scaladoc)
        lock.synchronized {
          Option(cache.get(key)) match {
            case Some(winner) =>
              hitCount.incrementAndGet(); unpersistQuietly(built); winner
            case None =>
              cache.put(key, built)
              while (cache.size() > maxEntries) {
                val it = cache.entrySet().iterator()
                val eldest = it.next()
                it.remove()
                evictCount.incrementAndGet()
                unpersistQuietly(eldest.getValue)
              }
              built
          }
        }
    }
  }

  /** Unpersist and forget every entry belonging to `s` (all dirs/tags).
    * Unpersist failures are swallowed: when invoked from the app-end
    * listener the context is already stopping, and CacheManager's
    * recache pass then throws assertNotStopped — the entries die with
    * the JVM either way, but an escaped exception would error the
    * whole listener bus. */
  def clear(s: SparkSession): Unit = lock.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { it.remove(); unpersistQuietly(e.getValue) }
    }
  }
}

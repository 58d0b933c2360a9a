package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-DataFrame memo.
  *
  * Spark's exchange reuse does not canonicalize repeated
  * scan→aggregate subtrees (measured: 0 ReusedExchange on the dedup
  * plans), so a subtree referenced on both sides of a self-join — or
  * shared by several registry queries — is recomputed once per
  * reference. Persisting it once per (session, sfDir, tag) turns those
  * recomputes into InMemoryTableScans. A long-lived production session
  * would manage this lifecycle explicitly (unpersist on table change);
  * entries here live as long as the session.
  */
object PlanCache {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  def memo(s: SparkSession, dir: String, tag: String)(mk: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, tag), mk.persist(StorageLevel.MEMORY_AND_DISK))
}

package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Round-frame lifecycle for iterative dataflows (PageRank, star-contraction
  * CC, label propagation, k-core peeling, Bellman–Ford, k-means) — the one
  * query family whose 8 GiB sf10 times ran 4-5× their 16 GiB times in round
  * 11 (`STRESS_r11.md §4`): every round localCheckpointed a new frame at the
  * default deserialized level and NOTHING ever freed the dead ones, so an
  * 8-round peel held 8+ stale frames in storage memory and paid eviction
  * I/O for blocks no task would ever read again.
  *
  * Two fixes, both applied through this helper:
  *
  *  1. **Serialized, disk-backed frames** ([[ckpt]]): iteration frames are
  *     narrow rows (node ids, labels, ranks). Stored deserialized, each row
  *     is an UnsafeRow object — ~64 bytes of header/reference overhead
  *     around ~16-24 bytes of data, a 3-4× memory inflation that directly
  *     multiplies eviction pressure at constrained heap. MEMORY_AND_DISK_SER
  *     stores each partition as one serialized buffer (UnsafeRow
  *     externalizes to its raw bytes), so the same frame costs a fraction
  *     of the storage memory; the deserialization on read is one linear
  *     pass, paid at most once per round per consumer.
  *
  *  2. **Prompt dead-frame release** ([[release]]): `Dataset.unpersist` is a
  *     CacheManager operation — on a localCheckpointed Dataset it finds no
  *     cache entry and silently frees NOTHING (the checkpoint blocks are
  *     RDD-level persistence). The only other collector is ContextCleaner,
  *     which waits for the JVM to garbage-collect the RDD object —
  *     nondeterministic, and slowest exactly when the heap is large and GC
  *     is rare. [[release]] reaches the checkpointed RDD through the frame's
  *     LogicalRDD leaf and unpersists it the moment the loop proves the
  *     frame dead (the next frame is already EAGERLY materialized, so
  *     nothing can trigger a recompute of the released one).
  *
  * Contract: pass [[release]] exactly the frames [[ckpt]] returned, only
  * after every reader of those frames has run. Releasing a frame that a
  * later job still references would fail that job (checkpoint blocks are
  * not recomputable — lineage was truncated by design).
  */
object Iteration {

  /** The frame storage level — serialized + disk-backed (see class doc).
    * Exposed for chained `.localCheckpoint(true, Iteration.SerLevel)` call
    * sites (shared multi-reader frames that never go through a loop). */
  val SerLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER

  /** Materialize `ds` as an eager local checkpoint with serialized,
    * disk-backed storage — the round-frame storage level (see class doc).
    * Eager on purpose: iterative loops must pay each round exactly once,
    * and [[release]] of the previous frame is only safe once the new frame
    * is physically stored. */
  def ckpt[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(true, SerLevel)

  /** Poll `obs` for metrics observed during an eager [[ckpt]] job —
    * the round-fusion idiom (r14): a loop's convergence aggregate rides
    * the SAME job that materializes the round frame (`df.observe(obs,
    * aggs…)` before ckpt) instead of a separate job re-scanning it.
    * Listener delivery is asynchronous, so poll briefly; if the metrics
    * never arrive — no known path does this — compute `fallback`
    * instead: same values, one extra cheap job over the materialized
    * frame. */
  def observedOr(obs: org.apache.spark.sql.Observation)(
      fallback: => Map[String, Any]): Map[String, Any] =
    try {
      val row = scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(2, java.util.concurrent.TimeUnit.SECONDS))
      row.getValuesMap[Any](row.schema.fieldNames)
    } catch { case _: java.util.concurrent.TimeoutException => fallback }

  /** Free dead round frames NOW instead of waiting for ContextCleaner.
    * Accepts the exact Datasets returned by [[ckpt]] (each analyzes to a
    * single LogicalRDD leaf holding the checkpointed RDD). Non-blocking:
    * the block manager removes the blocks asynchronously. */
  def release(frames: Dataset[_]*): Unit =
    frames.foreach { ds =>
      ds.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _              => ()
      }
    }
}

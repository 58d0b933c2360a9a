package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.util.LongAccumulator

/** Engine metrics — Spark-native counterpart of etl-rust's Prometheus
  * counters (`src/metrics/mod.rs:5-10`: request_count,
  * failed_request_count; served at /metrics, `src/main.rs:279-327`).
  *
  * Accumulators aggregate from every executor to the driver with no extra
  * shuffle or RPC of ours; the listener adds task-level failure counting
  * for free. Spark's own metrics sinks/UI replace the actix server role.
  */
final class EngineMetrics(sc: SparkContext) extends Serializable {
  val requestCount: LongAccumulator = sc.longAccumulator("graft.request_count")
  val failedRequestCount: LongAccumulator = sc.longAccumulator("graft.failed_request_count")
  val recordsPublished: LongAccumulator = sc.longAccumulator("graft.records_published")

  /** Wrap one "request" (fetch/publish attempt) executed on an executor. */
  def countRequest[T](body: => T): T =
    try { val r = body; requestCount.add(1); r }
    catch { case e: Throwable => requestCount.add(1); failedRequestCount.add(1); throw e }

  def snapshot(): Map[String, Long] = Map(
    "request_count" -> requestCount.value,
    "failed_request_count" -> failedRequestCount.value,
    "records_published" -> recordsPublished.value)
}

/** Task-failure listener: register with sc.addSparkListener to count
  * failed tasks across the app (driver side, no serialization). */
final class TaskFailureListener extends SparkListener {
  @volatile var failedTasks: Long = 0L
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    if (taskEnd.reason != org.apache.spark.Success) failedTasks += 1
}

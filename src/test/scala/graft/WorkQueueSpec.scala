package graft

import graft.streaming.WorkQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** At-least-once redelivery end to end (round-10 verdict item 7): a
  * consumer crashes AFTER processing but BEFORE acking a batch; the
  * broker's deadline sweep redelivers those messages (same __msg_id,
  * attempt+1); the q222-style idempotent latest-wins merge absorbs the
  * duplicates, so the final state equals the exactly-once result even
  * though the raw delivery log provably contains duplicates. */
class WorkQueueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val payload = StructType(Seq(
    StructField("source", StringType), StructField("block_number", LongType)))

  /** Consume everything currently in the queue: each micro-batch is
    * latest-wins merged by __msg_id into `stateDir` (the q222 loop) and
    * acked only when `ackFilter` admits the id — a consumer that
    * crashes pre-ack for the others. Returns rows appended to the raw
    * delivery log (at-least-once evidence). */
  private def consume(queueDir: String, ackDir: String, stateDir: String,
      ckDir: String, logDir: String, ackFilter: Long => Boolean): Unit = {
    val s = spark
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(WorkQueue.MsgId)).orderBy(col(WorkQueue.Attempt).desc)
    val q = WorkQueue.source(s, queueDir, payload, maxFilesPerTrigger = 5)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // 1. raw delivery log — duplicates land here untouched
        batch.write.mode("append").parquet(logDir)
        // 2. idempotent merge: latest delivery per message id wins
        val prev = new java.io.File(stateDir).list()
        val merged = (if (prev != null && prev.nonEmpty &&
            prev.exists(_.endsWith(".parquet")))
          s.read.parquet(s"$stateDir/cur.parquet").unionByName(batch)
        else batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val next = s"$stateDir/v$batchId.parquet"
        merged.write.mode("overwrite").parquet(next)
        // atomically advance the "current" pointer (copy: test-local)
        graft.Staging.deleteRecursively(s"$stateDir/cur.parquet")
        s.read.parquet(next).write.mode("overwrite").parquet(s"$stateDir/cur.parquet")
        // 3. ack ONLY after the merge committed — and only admitted ids
        //    (the crash-before-ack simulation)
        val ids = batch.select(col(WorkQueue.MsgId)).distinct()
          .collect().map(_.getLong(0)).filter(ackFilter)
        WorkQueue.ack(ackDir, ids)
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("redelivered batch is absorbed by the idempotent merge: exactly-once effect") {
    val queueDir = Files.createTempDirectory("wq_queue").toString
    val ackDir = Files.createTempDirectory("wq_ack").toString
    val stateDir = Files.createTempDirectory("wq_state").toString
    val ckDir = Files.createTempDirectory("wq_ck").toString
    val logDir = Files.createTempDirectory("wq_log").toString
    try {
      // 20 work messages
      (0L until 20L).foreach { i =>
        WorkQueue.enqueue(queueDir, i, s"""{"source":"chain","block_number":${1000 + i}}""")
      }
      // run 1: processes all 20, but "crashes" before acking ids >= 15
      consume(queueDir, ackDir, stateDir, ckDir, logDir, _ < 15)
      assert(WorkQueue.ackedIds(ackDir) == (0L until 15L).toSet)

      // broker deadline sweep: exactly the 5 unacked ids redeliver, attempt 2
      val redelivered = WorkQueue.redeliverUnacked(queueDir, ackDir)
      assert(redelivered == (15L until 20L).toSeq)

      // run 2 (restart, same checkpoint): consumes ONLY the 5 new files, acks all
      consume(queueDir, ackDir, stateDir, ckDir, logDir, _ => true)
      assert(WorkQueue.ackedIds(ackDir) == (0L until 20L).toSet)
      // fixpoint: nothing left to redeliver
      assert(WorkQueue.redeliverUnacked(queueDir, ackDir).isEmpty)

      // at-least-once is VISIBLE upstream: 25 deliveries for 20 messages
      val log = spark.read.parquet(logDir)
      assert(log.count() == 25)
      assert(log.filter(col(WorkQueue.Attempt) === 2).count() == 5)

      // ...and absorbed downstream: state holds each message exactly once,
      // payload equal to the exactly-once expectation
      val state = spark.read.parquet(s"$stateDir/cur.parquet")
      assert(state.count() == 20)
      val rows = state.select(col(WorkQueue.MsgId), col("block_number"),
          col(WorkQueue.Attempt))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(rows.map(t => (t._1, t._2)).toSeq ==
        (0L until 20L).map(i => (i, 1000 + i)))
      // redelivered messages surface their final attempt (broker telemetry)
      assert(rows.filter(_._1 >= 15).forall(_._3 == 2))
      assert(rows.filter(_._1 < 15).forall(_._3 == 1))
    } finally {
      Seq(queueDir, ackDir, stateDir, ckDir, logDir)
        .foreach(graft.Staging.deleteRecursively)
    }
  }

  test("duplicate delivery of an ACKED message is also absorbed (Pub/Sub allows it)") {
    val queueDir = Files.createTempDirectory("wq2_queue").toString
    val ackDir = Files.createTempDirectory("wq2_ack").toString
    val stateDir = Files.createTempDirectory("wq2_state").toString
    val ckDir = Files.createTempDirectory("wq2_ck").toString
    val logDir = Files.createTempDirectory("wq2_log").toString
    try {
      (0L until 4L).foreach { i =>
        WorkQueue.enqueue(queueDir, i, s"""{"source":"chain","block_number":$i}""")
      }
      consume(queueDir, ackDir, stateDir, ckDir, logDir, _ => true)
      // broker re-sends an already-acked message (allowed by the model)
      WorkQueue.enqueue(queueDir, 2L, s"""{"source":"chain","block_number":2}""", attempt = 2)
      consume(queueDir, ackDir, stateDir, ckDir, logDir, _ => true)
      val state = spark.read.parquet(s"$stateDir/cur.parquet")
      assert(state.count() == 4) // still exactly one row per message
      assert(spark.read.parquet(logDir).count() == 5) // dup visible upstream
    } finally {
      Seq(queueDir, ackDir, stateDir, ckDir, logDir)
        .foreach(graft.Staging.deleteRecursively)
    }
  }

  test("enqueue rejects payloads containing envelope key text (round-11 advice)") {
    val queueDir = Files.createTempDirectory("wq3_queue").toString
    try {
      // a payload smuggling the literal __attempt key would corrupt the
      // textual attempt bump on redelivery — the contract rejects it up
      // front, for keys AND for the key text appearing inside a value
      intercept[IllegalArgumentException] {
        WorkQueue.enqueue(queueDir, 1L, s"""{"${WorkQueue.Attempt}":9,"source":"x"}""")
      }
      intercept[IllegalArgumentException] {
        WorkQueue.enqueue(queueDir, 2L, s"""{"source":"note ${WorkQueue.MsgId} inside"}""")
      }
      // clean payloads still enqueue
      WorkQueue.enqueue(queueDir, 3L, """{"source":"chain","block_number":3}""")
      assert(new java.io.File(queueDir).list().count(_.endsWith(".json")) == 1)
    } finally graft.Staging.deleteRecursively(queueDir)
  }
}

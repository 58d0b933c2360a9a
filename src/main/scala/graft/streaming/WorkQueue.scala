package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Replayable work-queue source with PER-MESSAGE ACK semantics — the
  * Pub/Sub-shaped contract behind the reference's `IndexSubscription`
  * mode (etl-rust `src/main.rs:356-389`: a subscription is consumed
  * forever; Pub/Sub's published model is at-least-once — a message not
  * acked within its deadline is REDELIVERED, possibly to another
  * replica, with a growing delivery attempt counter).
  *
  * The offline stand-in models the broker as a directory the way
  * [[StreamPipeline.fileDropSource]] models the topic: each DELIVERY is
  * one JSON file `m<id>-a<attempt>.json` carrying the envelope
  * (`__msg_id`, `__attempt`) plus the payload. Redelivery of an unacked
  * message is a NEW file with the same `__msg_id` and `__attempt`+1 —
  * exactly how a file-based replay can express "the broker sent it
  * again", since Spark's file source never re-reads a seen file. Acks
  * are an append-only log of message ids; the broker-side operations
  * (enqueue / ack / redeliver) are driver-side file ops on the QUEUE
  * (queue-sized, tiny — the broker is the external system, not the data
  * plane), while everything per-record stays a distributed stream.
  *
  * The consumer contract this enables (proved in WorkQueueSpec): the
  * pipeline must be IDEMPOTENT on `__msg_id` — the q222 latest-wins
  * merge or q83 dedup absorbs redeliveries, turning at-least-once
  * delivery into exactly-once effect. Ack only after the batch's
  * effects are durably committed (foreachBatch completion), never
  * before — acking early turns a crash into message loss.
  */
object WorkQueue {

  /** Envelope columns prepended to the payload schema. */
  val MsgId = "__msg_id"
  val Attempt = "__attempt"

  def envelopeSchema(payload: StructType): StructType =
    StructType(
      StructField(MsgId, LongType, nullable = false) +:
      StructField(Attempt, IntegerType, nullable = false) +:
      payload.fields)

  /** Deliver (or redeliver) one message: one JSON file per delivery.
    * `payloadJson` must be a flat JSON object (no envelope keys).
    *
    * The envelope-key ban is ENFORCED, not just documented: redelivery
    * bumps the attempt counter by textual replaceFirst over the raw
    * envelope (the payload is opaque bytes to the broker), so a payload
    * containing the literal envelope-key text anywhere would silently
    * corrupt the redelivered message. Rejecting it here keeps the first
    * `"__attempt":N` occurrence provably the envelope's own. */
  def enqueue(queueDir: String, msgId: Long, payloadJson: String, attempt: Int = 1): Unit = {
    require(!payloadJson.contains(MsgId) && !payloadJson.contains(Attempt),
      s"payload must not contain envelope key text ($MsgId / $Attempt)")
    val body = s"""{"$MsgId":$msgId,"$Attempt":$attempt,${payloadJson.trim
      .stripPrefix("{").stripSuffix("}")}}"""
    val tmp = Paths.get(queueDir, s".m$msgId-a$attempt.json.tmp")
    Files.writeString(tmp, body + "\n")
    // atomic rename: the file source must never see a half-written file
    Files.move(tmp, Paths.get(queueDir, s"m$msgId-a$attempt.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The streaming source over the queue directory: every delivery is a
    * row with (__msg_id, __attempt, payload...). maxFilesPerTrigger=1
    * keeps micro-batches message-grained like the subscription pull. */
  def source(spark: SparkSession, queueDir: String, payload: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(envelopeSchema(payload))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(queueDir)

  /** Ack a set of message ids — append-only, one line per id, written
    * AFTER the consumer durably committed the batch's effects. Acks are
    * idempotent (re-acking is a no-op at read time). */
  def ack(ackDir: String, ids: Iterable[Long]): Unit = {
    if (ids.nonEmpty) {
      val log = Paths.get(ackDir, "acks.log")
      Files.writeString(log, ids.mkString("", "\n", "\n"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def ackedIds(ackDir: String): Set[Long] = {
    val log = Paths.get(ackDir, "acks.log")
    if (!Files.exists(log)) Set.empty
    else Files.readAllLines(log).asScala.filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** One delivery file per past delivery, keyed (msgId, attempt).
    * Files.list holds a directory handle until closed — Using closes it
    * after the Seq is materialized (a leaked fd per sweep adds up in a
    * long-lived subscription loop). */
  private def deliveries(queueDir: String): Seq[(Long, Int, Path)] =
    scala.util.Using.resource(Files.list(Paths.get(queueDir))) { stream =>
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.matches("m\\d+-a\\d+\\.json"))
        .map { p =>
          val n = p.getFileName.toString.stripSuffix(".json")
          val Array(id, at) = n.stripPrefix("m").split("-a")
          (id.toLong, at.toInt, p)
        }.toSeq
    }

  /** The reference consumer loop: drain the queue with AvailableNow,
    * latest-wins merge each micro-batch by `__msg_id` into
    * `stateDir/cur.parquet` (the q222 CDC-merge shape), and ack ONLY
    * after the merge is durably committed. This is the idempotent
    * contract that turns the broker's at-least-once delivery into
    * exactly-once effect (`etl-rust src/main.rs:356-389` — Pub/Sub
    * subscription consume): a redelivered `__msg_id` replaces its own
    * row instead of duplicating it, so crash-before-ack costs a
    * redelivery, never a wrong state.
    *
    * `admitAck` is the crash-injection seam for the E2E lifecycle specs
    * (a consumer that "dies" after committing but before acking some
    * ids); production callers leave the default. Returns the number of
    * deliveries processed. */
  def consume(spark: SparkSession, queueDir: String, ackDir: String,
      stateDir: String, ckptDir: String, payload: StructType,
      maxFilesPerTrigger: Int = 5,
      admitAck: Long => Boolean = _ => true): Long = {
    import org.apache.spark.sql.expressions.Window
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val w = Window.partitionBy(col(MsgId)).orderBy(col(Attempt).desc)
    val q = source(spark, queueDir, payload, maxFilesPerTrigger)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processed.addAndGet(batch.count())
        val cur = Paths.get(stateDir, "cur.parquet")
        val merged = (if (Files.exists(cur))
          spark.read.parquet(cur.toString).unionByName(batch)
        else batch)
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // versioned write + pointer advance: the state table must never
        // be half-overwritten while also being the merge's input
        val next = s"$stateDir/v$batchId.parquet"
        merged.write.mode("overwrite").parquet(next)
        graft.Staging.deleteRecursively(cur.toString)
        spark.read.parquet(next).write.mode("overwrite").parquet(cur.toString)
        graft.Staging.deleteRecursively(next)
        // ack AFTER the durable commit — and only admitted ids
        val ids = batch.select(col(MsgId)).distinct()
          .collect().map(_.getLong(0)).filter(admitAck)
        ack(ackDir, ids)
        ()
      }
      .start()
    q.awaitTermination()
    processed.get()
  }

  /** The broker's ack-deadline sweep: every message with NO ack is
    * redelivered — a new file, same id and payload, attempt+1. Returns
    * the redelivered ids (empty when all work is acked — the loop's
    * fixpoint). Redelivering an ACKED message never happens here, but
    * consumers must tolerate it anyway (Pub/Sub allows duplicate
    * delivery even after ack); the idempotent-merge contract covers
    * both. */
  def redeliverUnacked(queueDir: String, ackDir: String): Seq[Long] = {
    val acked = ackedIds(ackDir)
    val latest = deliveries(queueDir)
      .groupBy(_._1).map { case (_, ds) => ds.maxBy(_._2) }
      .filterNot { case (id, _, _) => acked.contains(id) }
    latest.toSeq.sortBy(_._1).map { case (id, attempt, path) =>
      val body = Files.readString(path)
      val stripped = body.trim
        .replaceFirst(s""""$Attempt":$attempt""", s""""$Attempt":${attempt + 1}""")
      val tmp = Paths.get(queueDir, s".m$id-a${attempt + 1}.json.tmp")
      Files.writeString(tmp, stripped + "\n")
      Files.move(tmp, Paths.get(queueDir, s"m$id-a${attempt + 1}.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      id
    }
  }
}

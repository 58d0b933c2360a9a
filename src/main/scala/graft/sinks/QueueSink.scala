package graft.sinks

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Queue-shaped sinks (etl-rust K1–K4) re-expressed on Spark's sink
  * lifecycle, plus the C3 retry policy.
  *
  * The reference's four queue sinks share one behavioral contract:
  *  - a connection is created IN the consuming thread (RabbitMQ channel is
  *    not Send, `rabbitmq_classic.rs:78-93`; Kafka producer-per-thread,
  *    `apache_kafka.rs:91-104`) → here: open() per partition/epoch, which
  *    is exactly Spark's `ForeachWriter` lifecycle;
  *  - bulk publishes are chunked (≤900 per Pub/Sub call,
  *    `google_pubsub.rs:122`) → `grouped(chunkSize)`;
  *  - failures retry with linear backoff, sleeping k units after the k-th
  *    failure (`google_pubsub.rs:137-155`) — the reference retries
  *    FOREVER; we bound it (maxRetries) and rethrow so Spark's task retry
  *    + an idempotent (overwrite-by-partition) sink gives at-least-once
  *    without unbounded hangs (SURVEY.md §7 risk register);
  *  - a failed bulk publish falls back to per-message publishes
  *    (`google_pubsub.rs:159-171`).
  *
  * Offline, the transport is a local append-only file per partition — the
  * wire is out of scope; the lifecycle and batching semantics are the
  * operator under test.
  */
trait QueueConnection extends AutoCloseable {
  /** Publish a batch. Contract: either deliver all-or-nothing, or throw
    * [[BulkPartialDelivery]] reporting how many messages of the batch
    * made it out — the publisher uses that offset so retries and the
    * per-message fallback never re-send delivered messages. A plain
    * exception is treated as zero delivered. */
  def publishBulk(msgs: Seq[Array[Byte]]): Unit
  def publish(msg: Array[Byte]): Unit
}

/** Thrown by a [[QueueConnection]] whose bulk publish delivered a prefix
  * of the batch before failing. */
final class BulkPartialDelivery(val delivered: Int, cause: Throwable)
    extends RuntimeException(s"bulk publish failed after $delivered messages", cause)

/** Local-filesystem queue transport: one JSONL-of-bytes file per
  * (queue, partition) — stands in for a broker connection. */
final class LocalFileQueueConnection(dir: String, queueName: String, partitionId: Long)
    extends QueueConnection {
  private val path = {
    Files.createDirectories(Paths.get(dir, queueName))
    Paths.get(dir, queueName, f"part-$partitionId%05d")
  }
  override def publishBulk(msgs: Seq[Array[Byte]]): Unit = {
    // one append syscall for the whole batch — all-or-nothing at this
    // transport, so the publisher's no-duplicate accounting holds
    val nl = "\n".getBytes(StandardCharsets.UTF_8)
    val buf = new java.io.ByteArrayOutputStream()
    msgs.foreach { m => buf.write(m); buf.write(nl) }
    Files.write(path, buf.toByteArray,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
  override def publish(msg: Array[Byte]): Unit = {
    Files.write(path, msg ++ "\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
  override def close(): Unit = ()
}

/** The shared publish policy: chunk, retry with linear backoff, fall back
  * bulk→per-message. Pure function of a connection; serializable so it
  * ships inside task closures. */
final class QueuePublisher(
    connect: Long => QueueConnection,
    chunkSize: Int = 900,
    maxRetries: Int = 5,
    backoffMillis: Long = 100,
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  /** Publish a whole partition of serialized records (batch path). */
  def publishPartition(partitionId: Long, rows: Iterator[Array[Byte]]): Long = {
    val conn = connect(partitionId)
    try {
      var n = 0L
      rows.grouped(chunkSize).foreach { chunk =>
        publishChunk(conn, chunk)
        n += chunk.size
      }
      n
    } finally conn.close()
  }

  /** Bulk with retries, then per-message fallback
    * (google_pubsub.rs:159-171). `offset` tracks messages already
    * delivered by partially-failed bulk attempts so neither a retry nor
    * the fallback ever re-sends them. */
  private def publishChunk(conn: QueueConnection, chunk: Seq[Array[Byte]]): Unit = {
    var offset = 0
    var attempt = 0
    var bulkOk = false
    while (!bulkOk && attempt <= maxRetries) {
      try { conn.publishBulk(chunk.drop(offset)); bulkOk = true }
      catch {
        case e: Throwable =>
          e match {
            case p: BulkPartialDelivery => offset += p.delivered
            case _ => ()
          }
          attempt += 1
          if (attempt <= maxRetries) sleep(backoffMillis * attempt)
      }
    }
    if (!bulkOk) chunk.drop(offset).foreach(m => withRetry(conn.publish(m)))
  }

  /** Linear backoff: sleep k*unit after the k-th failure; bounded. */
  private def withRetry(body: => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleep(backoffMillis * attempt)
      }
    }
  }
}

/** Streaming flavor: the same policy as a ForeachWriter, for
  * `writeStream.foreach(...)`. open() per (partition, epoch) — the exact
  * analogue of the reference's channel-per-consuming-thread. */
final class QueueForeachWriter(
    dir: String, queueName: String, serialize: Row => Array[Byte],
    chunkSize: Int = 900) extends ForeachWriter[Row] {
  @transient private var conn: QueueConnection = _
  @transient private var buf: scala.collection.mutable.ArrayBuffer[Array[Byte]] = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    conn = new LocalFileQueueConnection(dir, queueName, partitionId)
    buf = scala.collection.mutable.ArrayBuffer.empty
    true
  }
  override def process(value: Row): Unit = {
    buf += serialize(value)
    if (buf.size >= chunkSize) flush()
  }
  override def close(errorOrNull: Throwable): Unit = {
    if (errorOrNull == null && buf != null) flush()
    if (conn != null) conn.close()
  }
  private def flush(): Unit = { conn.publishBulk(buf.toSeq); buf.clear() }
}

object QueueSink {
  /** Batch entry: serialize a DataFrame as compact JSON lines and publish
    * per partition through the shared policy. Returns nothing; metrics
    * come from accumulators (EngineMetrics). */
  def publishJson(df: DataFrame, dir: String, queueName: String,
      chunkSize: Int = 900, maxRetries: Int = 5): Unit = {
    val json = df.toJSON // Dataset[String], one compact JSON doc per record
    json.foreachPartition { (it: Iterator[String]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      val pub = new QueuePublisher(
        p => new LocalFileQueueConnection(dir, queueName, p), chunkSize, maxRetries)
      pub.publishPartition(pid, it.map(_.getBytes(StandardCharsets.UTF_8)))
      ()
    }
  }
}

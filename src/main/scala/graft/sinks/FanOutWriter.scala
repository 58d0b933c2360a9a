package graft.sinks

import graft.operators.FanOut
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** K8 — per-table fan-out publisher (etl-rust `src/output/publish.rs:9-11`,
  * `single_stream_publisher.rs:12-31`): one named sink per table, all
  * connected up front, every table of a batch published through its own
  * sink.
  *
  * The Spark shape: a `Map[table, DataFrame => Unit]` applied to the
  * fan-out's table set, with the nested upstream persisted first so the
  * expensive extract/fetch stage runs once, not once per table — the
  * moral equivalent of the reference cloning one connected publisher into
  * every worker rather than reconnecting per record.
  */
final class FanOutWriter(sinks: Map[String, DataFrame => Unit]) {

  /** Write every table through its sink; unknown tables fail fast
    * (features.rs-style config error, not silent drop). */
  def publishAll(tables: Map[String, DataFrame]): Unit = {
    val missing = tables.keySet -- sinks.keySet
    require(missing.isEmpty, s"no sink configured for tables: $missing")
    tables.foreach { case (name, df) => sinks(name)(df) }
  }

  /** End-to-end batch publish of a nested blocks DF: persist upstream →
    * fan out → publish each child table → unpersist. */
  def publishBlocks(nestedBlocks: DataFrame): Unit = {
    val cached = nestedBlocks.persist(StorageLevel.MEMORY_AND_DISK)
    try publishAll(FanOut.tables(cached).asMap)
    finally { cached.unpersist(); () }
  }
}

object FanOutWriter {
  /** All tables to JSONL under one root (the SEPARATE_PUBLISHERS layout:
    * one queue/dir per table, docs/environment-variables.md:50-69). */
  def jsonl(outDir: String, tableNames: Seq[String]): FanOutWriter =
    new FanOutWriter(tableNames.map(t =>
      t -> ((df: DataFrame) => FileSinks.writeJsonl(df, outDir, t))).toMap)

  /** SINGLE_PUBLISHER mode (etl-rust
    * `src/output/single_stream_publisher.rs:12-31`, env `QUEUE_NAME`):
    * every table multiplexed into ONE stream. A single queue needs a
    * routing key beside an opaque payload, so each record is enveloped as
    * `{"table": t, "payload": "<record json>"}` — consumers demux by tag
    * and parse the payload with the table's own schema ([[demux]]).
    * Deprecated in the reference but kept for parity; the per-table
    * [[jsonl]] layout is the production path. */
  def jsonlSingle(outDir: String, queueName: String, tableNames: Seq[String]): FanOutWriter =
    new FanOutWriter(tableNames.map(t =>
      t -> ((df: DataFrame) =>
        FileSinks.writeJsonlMerged(df, outDir, queueName, t))).toMap)

  /** Read one table back out of a merged stream: filter the envelope by
    * tag, then parse the payloads with their own (inferred) schema — the
    * consumer side of SINGLE_PUBLISHER. */
  def demux(spark: org.apache.spark.sql.SparkSession, outDir: String,
      queueName: String, table: String): DataFrame = {
    import spark.implicits._
    val payloads = spark.read.json(s"$outDir/$queueName")
      .filter(org.apache.spark.sql.functions.col("table") === table)
      .select("payload").as[String]
    spark.read.json(payloads)
  }
}

package graft.config

/** Engine configuration with fail-fast validation.
  *
  * Mirrors two etl-rust mechanisms:
  *  - the compile-time feature matrix (`src/features.rs:9-35`): exactly one
  *    sink kind, exactly one timestamp mode — invalid combinations must not
  *    start. Here that is constructor-time `require` (Spark configs are
  *    runtime, not cargo features).
  *  - env-config memoization (`src/output/environment/` OnceCell
  *    singletons): load once on the driver from an env map; the case class
  *    is small and immutable so Spark closures capture it (equivalently it
  *    can be `sparkContext.broadcast`) — no per-task env reads.
  */
final case class GraftConfig(
    sinkKind: SinkKind,
    timestampMode: TimestampMode,
    outputDir: String,
    tables: Seq[String],
    numRetries: Int = 5,
    batchChunkSize: Int = 900, // Pub/Sub bulk ceiling, google_pubsub.rs:122
    backoffMillis: Long = 1000, // linear backoff unit, google_pubsub.rs:147-150
    // CUSTOM_INDEXING (Cargo.toml:191-192): fully-qualified class name of
    // the alternate indexer; None = the standard extract_all pipeline.
    customIndexer: Option[String] = None
) {
  require(outputDir.nonEmpty, "outputDir must be set")
  require(tables.nonEmpty, "at least one table must be configured")
  require(tables.distinct.size == tables.size, s"duplicate table names in $tables")
  require(numRetries >= 0, "numRetries must be >= 0")
  require(batchChunkSize > 0, "batchChunkSize must be > 0")
  // The queue-shaped sinks carry epoch-int timestamps, file/json sinks ISO
  // strings (etl-rust Cargo.toml:142-172 pins the pairing per sink).
  require(
    sinkKind.allowedTimestampMode == timestampMode,
    s"sink $sinkKind requires ${sinkKind.allowedTimestampMode}, got $timestampMode")
  // Fail-fast like an invalid feature set refusing to compile: an indexer
  // name that doesn't resolve to a CustomIndexer must not start the run.
  customIndexer.foreach(graft.operators.CustomIndexer.load)

  /** The configured indexer instance (standard pipeline when unset). */
  def indexer: graft.operators.CustomIndexer = customIndexer
    .map(graft.operators.CustomIndexer.load)
    .getOrElse(new graft.operators.CustomIndexer.StandardIndexer)
}

sealed trait TimestampMode
object TimestampMode {
  /** ISO-8601 string projection (STRING_TIMESTAMP). */
  case object IsoString extends TimestampMode
  /** Epoch-millis integer projection (INT_TIMESTAMP). */
  case object EpochInt extends TimestampMode
}

sealed trait SinkKind {
  def allowedTimestampMode: TimestampMode
}
object SinkKind {
  /** Local queue directory standing in for Pub/Sub/Kafka/RabbitMQ. */
  case object Queue extends SinkKind { val allowedTimestampMode = TimestampMode.EpochInt }
  /** JSON / JSONL files (json.rs / jsonl.rs). */
  case object JsonFiles extends SinkKind { val allowedTimestampMode = TimestampMode.IsoString }
  /** Time-partitioned object-store layout (gcs.rs). */
  case object TimePartitioned extends SinkKind { val allowedTimestampMode = TimestampMode.IsoString }
}

object GraftConfig {
  /** Load from an env-style map once (driver side). Unknown sink/timestamp
    * names fail fast, like features.rs compile errors. */
  def fromEnv(env: Map[String, String]): GraftConfig = {
    val sink = env.getOrElse("GRAFT_SINK", "json") match {
      case "queue" => SinkKind.Queue
      case "json"  => SinkKind.JsonFiles
      case "timed" => SinkKind.TimePartitioned
      case other   => throw new IllegalArgumentException(s"unknown GRAFT_SINK '$other'")
    }
    val ts = env.getOrElse("GRAFT_TIMESTAMP_MODE", defaultTs(sink)) match {
      case "iso"   => TimestampMode.IsoString
      case "epoch" => TimestampMode.EpochInt
      case other   => throw new IllegalArgumentException(s"unknown GRAFT_TIMESTAMP_MODE '$other'")
    }
    GraftConfig(
      sinkKind = sink,
      timestampMode = ts,
      outputDir = env.getOrElse("GRAFT_OUTPUT_DIR", ""),
      tables = env.getOrElse("GRAFT_TABLES", "blocks,transactions").split(",").toSeq.map(_.trim),
      customIndexer = env.get("GRAFT_CUSTOM_INDEXER"))
  }

  private def defaultTs(s: SinkKind): String = s match {
    case SinkKind.Queue => "epoch"
    case _              => "iso"
  }
}

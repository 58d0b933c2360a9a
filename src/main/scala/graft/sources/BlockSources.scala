package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.Try

/** Block-index sources (etl-rust S1/S2).
  *
  * S1 — block-range source (`src/main.rs:391-429`): iterate [start, end),
  * optionally reversed toward genesis, fetch each block. Offline, "fetch"
  * is a deterministic synthetic generator with the reference's nested
  * block→transactions shape; against a live chain the generator column
  * would be a mapPartitions over a pooled HTTP client (one client per
  * partition — the client-reuse note at `src/main.rs:256-272`).
  *
  * S2 — block-list source (`src/main.rs:137-182`): a CSV whose cells are
  * block indices; the first line is a header iff any of its fields does
  * not parse as an unsigned integer (header sniff, lines 141-150); ALL
  * fields of every row are flattened into the index stream (lines
  * 165-176).
  *
  * Scale: spark.range partitions the index space across executors with no
  * shuffle; the CSV list is a scan + projection. Either feeds the same
  * downstream fan-out.
  */
object BlockSources {

  /** S1: synthetic nested blocks for [start, end).
    * Schema: block_number, block_time, txs: array<struct<tx_id, fee,
    * accounts: array<string>>> — the "one block record fans out to child
    * tables" shape of docs/protobuf.md. Deterministic in block_number. */
  def blockRange(spark: SparkSession, start: Long, end: Long, reverse: Boolean = false): DataFrame = {
    require(!(reverse && start == 0 && end == 0), "cannot index backwards from genesis")
    val ids = spark.range(start, end).toDF("block_number")
    val ordered = if (reverse) ids.orderBy(col("block_number").desc) else ids
    synthesize(ordered)
  }

  /** S1 generator over an ARBITRARY id set — what IndexList feeds after
    * flattening its CSV (the reference declares index-list but
    * `unreachable!`s it, src/main.rs:431-433; this finishes the dangling
    * command against the same synthetic fetch). Deterministic per
    * block_number, so list-driven and range-driven extraction of the
    * same block are identical records. */
  def blocksFromIds(ids: DataFrame): DataFrame = synthesize(ids)

  private def synthesize(ids: DataFrame): DataFrame = {
    ids
      .withColumn("block_time", timestamp_millis(lit(1700000000000L) + col("block_number") * 400))
      .withColumn("n_tx", (col("block_number") * 2654435761L) % 97 % 7)
      // NB sequence(1, 0) is DESCENDING [1, 0] in Spark — an unguarded
      // sequence(1, n_tx) fabricates two transactions for empty blocks
      // (caught by q69's Avro round-trip oracle); guard with slice to an
      // empty array when n_tx = 0
      .withColumn("txs", expr(
        """transform(slice(sequence(1, greatest(CAST(n_tx AS INT), 1)), 1, CAST(n_tx AS INT)),
          | i -> named_struct(
          |  'tx_id', concat('tx_', block_number, '_', i - 1),
          |  'fee', ((block_number * 31 + i - 1) * 1103515245 + 12345) % 1000003,
          |  'accounts', transform(sequence(0, CAST((block_number + i) % 3 AS INT)),
          |    a -> concat('acct_', (block_number * 7 + i * 13 + a * 29) % 1000))))""".stripMargin))
      .drop("n_tx")
  }

  /** S2: read a CSV of block indices with the reference's header sniff and
    * field flattening. Returns one `block_number` column. */
  def blockListCsv(spark: SparkSession, path: String): DataFrame = {
    // Header sniff is driver-side on the first line only (one record — not
    // a distributed concern, same as the reference reading the file head).
    val firstLine = spark.read.text(path).limit(1).collect()
      .headOption.map(_.getString(0)).getOrElse("")
    val hasHeader = firstLine.split(",").exists(f => Try(f.trim.toLong).isFailure)
    val df = spark.read.option("header", hasHeader.toString).csv(path)
    val flattened = df.select(explode(array(df.columns.map(c => col(c)): _*)).as("cell"))
    flattened
      .select(col("cell").cast("long").as("block_number"))
      .filter(col("block_number").isNotNull)
  }
}

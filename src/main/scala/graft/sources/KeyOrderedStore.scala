package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — key-ordered-store backfill source (the Bigtable stand-in).
  *
  * The reference's Solana profile backfills from Bigtable
  * (`src/main.rs:33-34` `solana_config::data_sources::bigtable`, cargo
  * feature `SOLANA_BIGTABLE`): the ledger lives in a wide-column store
  * whose row keys are fixed-width big-endian hex slot numbers, so a
  * LEXICOGRAPHIC row-range scan [start_key, end_key) is a numeric
  * block-range read. Offline, the store itself is out of reach — what
  * this module reproduces is the CONTRACT: a key-ordered batch store
  * over nested block records, written in disjoint key ranges and read
  * back by row-key range with pruning, feeding the same downstream
  * fan-out as S1/S2 (the last §2.1 row).
  *
  * Spark shape: row keys are `lpad(hex(block_number), 16, '0')` —
  * fixed-width, so string order = numeric order, exactly Bigtable's key
  * design. Writes `repartitionByRange` on the key (each parquet file
  * covers a disjoint key range — Bigtable tablet layout) and sort
  * within partitions (row order inside a tablet). Reads filter on the
  * key range: the string-range predicate pushes down to the parquet
  * scan, and because files are range-disjoint, footer min/max stats
  * skip every file outside [start, end) — the scan does the same work
  * a Bigtable row-range read would, touching only overlapping tablets.
  * At 100 TB the layout is the point: one tablet-file per key range,
  * no shuffle on read, pruning proportional to range width.
  */
object KeyOrderedStore {

  val KeyCol = "row_key"

  /** Fixed-width big-endian hex row key — lexicographic = numeric. */
  def rowKey(bn: Column): Column = lpad(hex(bn), 16, "0")

  private def keyLit(bn: Long): String = f"$bn%016X"

  /** Write nested blocks (schema of [[BlockSources.blockRange]]) as a
    * key-ordered store: `nRanges` files, each a disjoint key range,
    * rows key-sorted within each file. */
  def write(nestedBlocks: DataFrame, dir: String, nRanges: Int = 8): Unit =
    nestedBlocks
      .withColumn(KeyCol, rowKey(col("block_number")))
      .repartitionByRange(nRanges, col(KeyCol))
      .sortWithinPartitions(col(KeyCol))
      .write.mode("overwrite").parquet(dir)

  /** Row-range scan [start, end) by key order — returns the nested
    * block schema (key column dropped), same contract as
    * [[BlockSources.blockRange]]. */
  def scan(spark: SparkSession, dir: String, start: Long, end: Long): DataFrame =
    spark.read.parquet(dir)
      .filter(col(KeyCol) >= lit(keyLit(start)) && col(KeyCol) < lit(keyLit(end)))
      .drop(KeyCol)

  /** S5 registry query: stage a 2000-block store, backfill-scan the
    * middle [500, 1500) key range, fan transactions out, aggregate —
    * the oracle recomputes from the S1 generator arithmetic over the
    * same sub-range, so the hash proves the store write→range-read
    * path is lossless and correctly bounded. The staged store lives
    * until the next run (deferred deletion) because the returned plan
    * scans it lazily. */
  def q121BackfillSource(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("q121_store").toString
    write(BlockSources.blockRange(s, 0, 2000), tmp, nRanges = 8)
    val out = graft.operators.FanOut.tables(scan(s, tmp, 500, 1500))
      .transactions
      .groupBy((col("block_number") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_txs"),
        countDistinct(col("block_number")).as("n_blocks"),
        sum(col("fee")).cast("long").as("total_fees"))
      .orderBy(col("bucket"))
    graft.Staging.deferDelete(out, tmp, "q121")
  }

  val q121Sql: String =
    """SELECT block_number % 10 AS bucket, COUNT(*) AS n_txs,
      |  COUNT(DISTINCT block_number) AS n_blocks,
      |  CAST(SUM(fee) AS BIGINT) AS total_fees
      |FROM (
      |  SELECT block_number,
      |    ((block_number * 31 + tx_i) * 1103515245 + 12345) % 1000003 AS fee
      |  FROM (
      |    SELECT block_number,
      |      unnest(range(0, (block_number * 2654435761) % 97 % 7)) AS tx_i
      |    FROM range(500, 1500) t(block_number)))
      |GROUP BY 1 ORDER BY 1""".stripMargin
}

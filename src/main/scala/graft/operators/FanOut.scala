package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T2 — block→tables fan-out transform, and T3 — derived-entity
  * extraction (etl-rust `docs/etl-infrastructure-architecture.md:13`,
  * `docs/extraction.md:9`).
  *
  * One nested block record becomes N records across child tables: the
  * blocks row itself, one transactions row per element of `txs`, one
  * account-reference row per account pubkey. Declarative `explode`s keep
  * Catalyst in charge (column pruning reaches the scan; no shuffle is
  * introduced by the fan-out itself — children inherit the parent's
  * partitioning).
  *
  * Invariants (spec-enforced): row-count conservation — each child table
  * has exactly Σ size(nested field) rows; the blocks table has one row
  * per input block.
  */
object FanOut {

  /** The per-table DataFrames produced from one nested blocks input. */
  final case class TableSet(blocks: DataFrame, transactions: DataFrame, accountRefs: DataFrame) {
    def asMap: Map[String, DataFrame] =
      Map("blocks" -> blocks, "transactions" -> transactions, "account_refs" -> accountRefs)
  }

  /** Fan a nested blocks DF (schema of BlockSources.blockRange) out into
    * child tables. Callers writing all tables should `.persist()` the
    * input first so the scan/fetch runs once (K8 pattern — see
    * FanOutWriter). */
  def tables(nestedBlocks: DataFrame): TableSet = {
    val blocks = nestedBlocks.select(
      col("block_number"), col("block_time"), size(col("txs")).as("tx_count"))
    val transactions = nestedBlocks.select(
      col("block_number"), col("block_time"), explode(col("txs")).as("tx"))
      .select(col("block_number"), col("block_time"),
        col("tx.tx_id").as("tx_id"), col("tx.fee").as("fee"),
        size(col("tx.accounts")).as("n_accounts"))
    val accountRefs = nestedBlocks.select(
      col("block_number"), explode(col("txs")).as("tx"))
      .select(col("block_number"), col("tx.tx_id").as("tx_id"),
        explode(col("tx.accounts")).as("account"))
    TableSet(blocks, transactions, accountRefs)
  }

  /** T3: derived-entity keys — the distinct accounts referenced by a batch
    * of blocks, feeding a second-stage keyed fetch/join
    * (`call_getMultipleAccounts` over the collected pubkeys,
    * docs/extraction.md:9). Scale: distinct is the one shuffle here and
    * shrinks data before the expensive external lookup — same reason the
    * reference batches pubkeys. */
  def derivedAccounts(nestedBlocks: DataFrame): DataFrame =
    tables(nestedBlocks).accountRefs.select(col("account")).distinct()

  /** Second stage of T3: enrich derived keys against a keyed service or
    * dimension table (the external account store). Broadcast when the key
    * set is small; otherwise a shuffle join on `account`. */
  def enrichAccounts(derived: DataFrame, accountStore: DataFrame, storeKey: Column): DataFrame =
    derived.join(accountStore, derived("account") === storeKey, "left_outer")
}

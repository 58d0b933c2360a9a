package graft

import graft.operators.FanOut
import graft.sources.BlockSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FanOutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("T2 fan-out conserves row counts across child tables") {
    val nested = BlockSources.blockRange(spark, 0, 200)
    val ts = FanOut.tables(nested)
    val nBlocks = nested.count()
    val nTxsExpected = nested.select(sum(size(col("txs")))).head().getLong(0)
    val nAcctExpected = nested
      .select(explode(col("txs")).as("tx"))
      .select(sum(size(col("tx.accounts")))).head().getLong(0)
    assert(ts.blocks.count() === nBlocks)
    assert(ts.transactions.count() === nTxsExpected)
    assert(ts.accountRefs.count() === nAcctExpected)
  }

  test("T3 derived accounts are distinct and enrichment preserves keys") {
    val nested = BlockSources.blockRange(spark, 0, 100)
    val derived = FanOut.derivedAccounts(nested)
    assert(derived.count() === derived.distinct().count())
    import spark.implicits._
    val store = derived.limit(5)
      .withColumn("balance", lit(42L)).withColumnRenamed("account", "acct_key")
    val enriched = FanOut.enrichAccounts(derived, store, store("acct_key"))
    assert(enriched.count() === derived.count()) // left outer keeps all keys
    assert(enriched.filter(col("balance").isNotNull).count() === 5)
  }
}

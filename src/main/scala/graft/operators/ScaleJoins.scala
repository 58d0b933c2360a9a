package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB regime.
  *
  * The reference never joins (BigQuery does); these are the techniques a
  * Spark deployment of this engine uses where the warehouse would have:
  *
  *  - **Bucketed co-located join**: both fact tables written with
  *    `bucketBy(n, key)` share a partitioning, so the join plans with
  *    ZERO Exchange — the decisive optimization for repeated big-big
  *    joins (SURVEY.md §7: "at 100 TB the right fix is bucketing both
  *    tables by orderkey at write time"). See BucketedJoinSpec for the
  *    no-shuffle plan assertion.
  *
  *  - **Salted join**: when one key is hot, shuffling by key alone puts
  *    the hot key's rows in one task. Salting splits the hot side into
  *    `salt` sub-keys and replicates the other side across them —
  *    turning one straggler task into `salt` parallel ones. AQE's skew
  *    handling does this adaptively for sort-merge joins; this explicit
  *    version covers aggregations and non-AQE paths.
  */
object ScaleJoins {

  /** Salted inner equi-join: `left` (skewed side) gets a random-free,
    * deterministic salt derived from a secondary column; `right` is
    * replicated across all salt values. Result is identical to the
    * unsalted join (salt columns never leak). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int, saltSource: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(hash(saltSource), lit(salt)))
    val saltedRight = right
      .withColumn("__salt", explode(expr(s"sequence(0, ${salt - 1})")))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial/final) skew-safe aggregation: group by
    * (key, salt) first — spreading a hot key over `salt` reducers — then
    * re-aggregate by key. Only valid for algebraic aggregates; exposed
    * here for counts and sums, which cover the engine's fan-out
    * accounting. */
  def skewSafeCountSum(df: DataFrame, key: String, sumCol: String, salt: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(sumCol)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$sumCol"))
}

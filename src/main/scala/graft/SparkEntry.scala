package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator registry (one entry per operator
  * family in SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent SQL
  * for every hash-verifiable entry. Column names are aligned pairwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  import RelationalQueries._

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (q01PricingSummary _),
    "q02_filter_project"     -> (q02FilterProject _),
    "q03_join_broadcast"     -> (q03JoinBroadcast _),
    "q04_join_large"         -> (q04JoinLarge _),
    "q05_join_multiway"      -> (q05JoinMultiway _),
    "q06_join_semi"          -> (q06JoinSemi _),
    "q07_join_anti"          -> (q07JoinAnti _),
    "q08_join_outer"         -> (q08JoinOuter _),
    "q09_agg_distinct"       -> (q09AggDistinct _),
    "q10_agg_approx_distinct" -> (q10AggApproxDistinct _),
    "q11_rollup"             -> (q11Rollup _),
    "q12_cube"               -> (q12Cube _),
    "q13_window_rank"        -> (q13WindowRank _),
    "q14_window_analytic"    -> (q14WindowAnalytic _),
    "q15_topk_per_group"     -> (q15TopKPerGroup _),
    "q16_sort_limit"         -> (q16SortLimit _),
    "q17_set_ops"            -> (q17SetOps _),
    "q18_distinct"           -> (q18Distinct _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"  -> q01Sql,
    "q02_filter_project"   -> q02Sql,
    "q03_join_broadcast"   -> q03Sql,
    "q04_join_large"       -> q04Sql,
    "q05_join_multiway"    -> q05Sql,
    "q06_join_semi"        -> q06Sql,
    "q07_join_anti"        -> q07Sql,
    "q08_join_outer"       -> q08Sql,
    "q09_agg_distinct"     -> q09Sql,
    // q10: HLL++ sketch — no exact cross-engine oracle (rows-only check).
    "q11_rollup"           -> q11Sql,
    "q12_cube"             -> q12Sql,
    "q13_window_rank"      -> q13Sql,
    "q14_window_analytic"  -> q14Sql,
    "q15_topk_per_group"   -> q15Sql,
    "q16_sort_limit"       -> q16Sql,
    "q17_set_ops"          -> q17Sql,
    "q18_distinct"         -> q18Sql,
  )
}

package graft.queries

import graft.Oracle._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.2).
  *
  * The reference (blockchain-etl/etl-rust) delegates all relational
  * processing to BigQuery (`README.md:3`); our engine carries that surface
  * natively on Spark. Every query here is declarative DataFrame code —
  * Catalyst does pushdown/pruning/join selection; comments note the
  * 100 TB-scale plan choice where it matters.
  *
  * Contract: each entry returns a deterministic, totally-ordered result whose
  * column names match its `oracleSql` twin in [[graft.SparkEntry]] exactly.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Q1-shaped pricing summary: scan → filter → hash agg → sort.
    * Scale: filter + column pruning push to parquet; agg is partial/final
    * (map-side combine) over just 4 groups → tiny shuffle. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${dsumSql("l_quantity")} AS sum_qty,
      |  ${dsumSql("l_extendedprice")} AS sum_base_price,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + conjunctive predicates; verifies parquet pushdown.
    * Scale: only 4 of 11 columns read; both predicates reach the scan. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R" &&
        col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"))
      // TOTAL order over every output column: the synthetic lineitem is
      // TPC-H-ish, not TPC-H — (l_orderkey, l_linenumber) is NOT unique
      // (59 dup pairs under this filter at sf0.1), so a two-key sort
      // left tie order to scan order, which diverges between engines
      // once the scan is parallel (first seen at the sf10 sweep; the
      // small-SF gates passed only because both engines read one file
      // sequentially). Determinism must come from the query, never the
      // layout.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'R' AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin

  /** Broadcast-hash join: fact ⋈ small dim.
    * Scale: customer is explicitly broadcast — no shuffle of the orders fact
    * side; at 100 TB the dim side must stay under the broadcast threshold or
    * AQE falls back to SMJ. */
  def q03JoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("o_totalprice")).as("segment_value"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  val q03Sql: String =
    s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS segment_value,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Large-large shuffle join (lineitem ⋈ orders on orderkey).
    * Scale: both sides shuffle on the join key; AQE handles skew. At 100 TB
    * the right fix is bucketing both tables by orderkey at write time. */
  def q04JoinLarge(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  val q04Sql: String =
    s"""SELECT o_orderpriority,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Multiway star join (TPC-H Q5 shape): fact chain + 3 broadcast dims.
    * Scale: nation/region broadcast (tiny); customer/supplier joins keyed on
    * the same nationkey reuse the shuffle; join order left to Catalyst. */
  def q05JoinMultiway(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir); val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir);   val r = Tables.region(s, dir)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name"))
  }

  val q05Sql: String =
    s"""SELECT n_name,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left-semi join (EXISTS): orders having a high-quantity line.
    * Scale: semi-join keeps only the left columns — no fanout, and the right
    * side reduces to distinct keys before the join. */
  def q06JoinSemi(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_value"))
      .orderBy(col("o_orderstatus"))
  }

  val q06Sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  ${dsumSql("o_totalprice")} AS total_value
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Left-anti join (NOT EXISTS): orders with no high-quantity line.
    * (Written against lineitem rather than customer-without-orders — in
    * this data every customer has orders, which made the anti-join
    * vacuous: a 0-row result exercises nothing.) */
  def q07JoinAnti(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  val q07Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders
      |FROM orders WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Left-outer join preserving customers with zero orders; conditional agg.
    * Count must count o_orderkey (not *) so no-order customers show 0. */
  def q08JoinOuter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  val q08Sql: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  /** Exact distinct aggregation (expand-based in Spark). */
  def q09AggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q09Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approximate distinct via HLL++ (the reference's BigQuery target offers
    * APPROX_COUNT_DISTINCT; Spark's HLL++ fills that slot). Sketch internals
    * differ from DuckDB's approx so there is no hash-exact oracle — the
    * driver records a rows-only check. Scale: constant-memory per group vs
    * the expand+shuffle of exact distinct. */
  def q10AggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  /** ROLLUP hierarchy totals; null grouping slots coalesced to 'ALL' so the
    * output is orderable identically in both engines. */
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q11Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over two dims.
    *
    * Cents grid (dsumScaled s=2), not the default 1e6: the CUBE's ALL
    * cell is a GLOBAL price sum — at sf100 that is 1.5e8 orders × ~1.5e5
    * avg price × 1e6 ≈ 2.3e19 > 2⁶³, the q198 overflow class (caught
    * live by the r12 sf100 sweep). o_totalprice carries exactly 2
    * decimals, so the coarser grid is LOSSLESS — both engines produce
    * bit-identical values to the 1e6 grid at every scale that fits. */
  def q12Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsumScaled(col("o_totalprice"), 2).as("value"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("value"))
      .orderBy(col("status"), col("priority"))

  val q12Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n, ${dsumScaledSql("o_totalprice", 2)} AS value
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Ranking window functions; the order-by key is made total with
    * o_orderkey so rank assignment is deterministic across engines. */
  def q13WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .filter(col("rn") <= 2)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q13Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  /** Analytic windows: lag/lead + running sum with an explicit row frame.
    * Running sum uses the 2dp-exact decimal cast so the cumulative total is
    * order-exact, not FP-drifting. */
  def q14WindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(30,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter(col("o_custkey") <= 50)
      .drop("o_orderdate")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q14Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Top-k per group (window + filter). Scale: Spark rewrites rank-filter
    * into a per-partition top-k (WindowGroupLimit) so no full sort of each
    * partition's data is needed. */
  def q15TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    joined.select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  val q15Sql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  /** Global top-k: orderBy+limit compiles to TakeOrderedAndProject — each
    * partition keeps k rows, the driver merges; no global sort at scale. */
  def q16SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q16Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Set operations: nations that have customers vs suppliers.
    * Inputs are pre-distinct'd: INTERSECT/EXCEPT are set-semantics anyway,
    * so shrinking 150k rows to ≤25 before the three set ops costs one
    * partial-aggregated shuffle and saves the other five. */
  def q17SetOps(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
    val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
    val both = custN.intersect(suppN).withColumn("which", lit("both"))
    val custOnly = custN.except(suppN).withColumn("which", lit("cust_only"))
    val suppOnly = suppN.except(custN).withColumn("which", lit("supp_only"))
    both.union(custOnly).union(suppOnly).orderBy(col("which"), col("nk"))
  }

  val q17Sql: String =
    """SELECT nk, which FROM (
      |  SELECT nk, 'both' AS which FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nk, 'cust_only' AS which FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nk, 'supp_only' AS which FROM
      |    (SELECT s_nationkey AS nk FROM supplier
      |     EXCEPT SELECT c_nationkey FROM customer))
      |ORDER BY which, nk""".stripMargin

  /** dropDuplicates (exact distinct rows). */
  def q18Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q18Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical totality audit of every oracled query's final ORDER BY
  * (round-11 verdict item 3).
  *
  * The driver's hash gate compares row VALUES IN ROW ORDER, so an output
  * whose final sort admits tie rows is only deterministic by scan-order
  * coincidence — q02's ORDER BY survived ten rounds of gates that way and
  * broke the moment both engines stopped scanning one file the same way
  * (SWEEP_r11.md §2). This spec closes the class: every query in
  * `SparkEntry.oracleSql` must prove its dump order total by one of
  *
  *   1. **Syntactic cover** — the final Sort's keys include EVERY output
  *      column (sorting by all columns is total by construction). Checked
  *      on the analyzed plan, no execution.
  *   2. **Unique key** — all sort keys are output columns and the key
  *      tuple is UNIQUE in the result at sf0.01, THE scale the driver's
  *      gate decides at (a unique sort key makes the order total there;
  *      the sf10 sweep re-decides the same hashes a decade up). Checked
  *      by running the query once and counting duplicate key tuples.
  *   3. **Bounded output** — no final Sort at all is admissible only for
  *      a ≤1-row result (a 0/1-row dump has no order to get wrong).
  *
  * plus a small named whitelist for structural exceptions, each entry
  * carrying its totality argument in code. A query matching none of these
  * is a live q02 sibling and FAILS the build.
  */
class OrderTotalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gateDir = "/root/testdata/sf0.01"

  /** Nodes above the final Sort that preserve its row order 1:1.
    * Project is safe to descend (column-wise, never row-wise); when it
    * RENAMES a sort key the exprId match below falls through to the
    * whitelist path rather than silently passing. */
  private def stripOrderPreserving(p: LogicalPlan): LogicalPlan = p match {
    case GlobalLimit(_, child)    => stripOrderPreserving(child)
    case LocalLimit(_, child)     => stripOrderPreserving(child)
    case SubqueryAlias(_, child)  => stripOrderPreserving(child)
    case Project(_, child)        => stripOrderPreserving(child)
    case WithCTE(plan, _)         => stripOrderPreserving(plan)
    case _                        => p
  }

  /** Structural exceptions, each with its totality argument. Keep SHORT:
    * every entry here is a query the mechanical rules cannot decide, and
    * the argument must hold at every scale, not just the gate's. */
  private val whitelist: Map[String, String] = Map(
    // Collect-then-LocalRelation pattern: these queries materialize a
    // TOTALLY-sorted inner plan with collect() (to release iteration
    // memos / restore a session conf before returning) and rebuild the
    // result via createDataFrame, which preserves the collected row
    // order. The analyzed plan the audit sees is the LocalRelation, but
    // the order was fixed by the inner Sort, whose key tuple ends in a
    // unique column:
    "q77_pagerank" ->
      "inner orderBy(rank_x1000 desc, node) — node is the PageRank vertex key (unique); CorpusQueries.q77PageRank",
    "q221_textrank" ->
      "inner orderBy(rank_x1000 desc, term) — term is the TextRank vertex key (unique); StatsQueries.q221TextRank",
    "q104_bloom_pruned_join" ->
      "inner orderBy(o_orderstatus) — the groupBy key of the aggregate directly below (unique); DataflowQueries.q104Inner"
  )

  test("every oracled query's final sort is total (no q02 siblings)") {
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val decided = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = names.map { name => scala.concurrent.Future {
      try {
        val df = SparkEntry.queries(name)(spark, gateDir)
        audit(name, df).foreach(msg => failures.add(s"$name: $msg"))
        decided.incrementAndGet()
      } catch {
        case e: Throwable => failures.add(s"$name: audit errored: ${e.getMessage}")
      }
    }}
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    assert(failures.isEmpty,
      s"\n${failures.toArray.mkString("\n")}\n(${failures.size} of ${names.size})")
    assert(decided.get() == names.size)
  }

  /** None = total; Some(reason) = failure. */
  private def audit(name: String, df: DataFrame): Option[String] = {
    val analyzed = df.queryExecution.analyzed
    stripOrderPreserving(analyzed) match {
      case Sort(orders, global, child, _) =>
        if (!global) return Some("final Sort is sortWithinPartitions (not a total order)")
        val out: Seq[Attribute] = analyzed.output
        val keyExprs: Seq[Expression] = orders.map(_.child)
        // rule 1: sort keys cover every output column
        val covered = out.forall(a => keyExprs.exists(_.semanticEquals(a)))
        if (covered) return None
        // rule 2: all sort keys are output columns and the tuple is
        // unique at the gate scale
        val keyAttrs = keyExprs.map { e =>
          out.find(a => e.semanticEquals(a)) match {
            case Some(a) => a
            case None =>
              return whitelistOr(name,
                s"sort key $e is not an output column (rules 1-2 cannot decide)")
          }
        }
        val keyCols = keyAttrs.map(a => col(a.name))
        val dup = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).limit(1).collect()
        if (dup.isEmpty) None
        else whitelistOr(name,
          s"sort keys ${keyAttrs.map(_.name).mkString("(", ",", ")")} have tie rows " +
          s"at sf0.01 (e.g. ${dup.head}) — dump order is scan-order luck, the q02 bug class")
      case _ =>
        // rule 3: no final sort — only a ≤1-row result is order-safe
        if (df.limit(2).count() <= 1) None
        else whitelistOr(name, "no final Sort and more than one output row")
    }
  }

  private def whitelistOr(name: String, reason: String): Option[String] =
    if (whitelist.contains(name)) None else Some(reason)
}

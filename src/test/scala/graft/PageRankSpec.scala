package graft

import graft.operators.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** PageRank operator semantics: analytic fixpoints, bit-equality of
  * the broadcast and co-partitioned paths (the decimal-sum determinism
  * claim), and convergence-loop behavior. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // directed 3-cycle: out-degree 1 everywhere, so rank stays exactly
  // uniform at 1/3 under any damping — an analytic fixpoint
  private def cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")

  // small asymmetric graph (symmetrized so no dangling nodes)
  private def graph = {
    val d = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 3L), (4L, 1L), (5L, 3L))
    (d ++ d.map(_.swap)).toDF("src", "dst")
  }

  test("directed cycle keeps the uniform analytic fixpoint") {
    val pr = PageRank.ranks(cycle, iters = 4)
    val rs = pr.ranks.collect().map(_.getDouble(1))
    pr.release()
    assert(rs.length === 3)
    rs.foreach(r => assert(math.abs(r - 1.0 / 3.0) < 1e-12, r.toString))
  }

  test("broadcast and co-partitioned paths agree bit-for-bit") {
    val a = PageRank.ranks(graph, iters = 3, broadcastRank = false)
    val b = PageRank.ranks(graph, iters = 3, broadcastRank = true)
    val ra = a.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rb = b.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.release(); b.release()
    assert(ra === rb) // exact ==: decimal contributions make sums order-free
  }

  test("ranksConverged reaches the power-iteration fixpoint") {
    val fixed = PageRank.ranks(graph, iters = 40)
    val truth = fixed.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    fixed.release()
    val conv = PageRank.ranksConverged(graph, tol = 1e-10, maxIter = 60)
    val got = conv.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    conv.release()
    assert(got.keySet === truth.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - truth(k)) < 1e-8, s"node $k") }
    // ranks are a probability distribution (no dangling leakage)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }
}

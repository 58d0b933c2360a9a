package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.GraphQueries

/** Round-6 graph additions. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q186 equals a local peel-to-convergence 3-core (fixed point reached)") {
    val got = GraphQueries.q186KCore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-degree >= 3 among survivors IS the fixed-point certificate:
    // one more peel round would remove nothing
    assert(got.isEmpty || got.values.min >= 3)
    // local recompute from the same bulk edge definition
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") > 30)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var changed = true
    var adj = Map.empty[Long, Int]
    while (changed) {
      adj = edges.filter(e => nodes(e._1) && nodes(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, vs) => v -> vs.length }
      val keep = adj.filter(_._2 >= 3).keySet
      changed = keep != nodes
      nodes = keep
    }
    assert(got.keySet == nodes)
    nodes.foreach(v => assert(got(v) == adj(v).toLong, s"node $v"))
  }
}

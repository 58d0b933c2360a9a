package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over a [src, dst] edge table.
  *
  * Default layout (the Pregel shape, scale-safe at any node count):
  * the invariant table (edge ⋈ out-degree) is built ONCE, then
  * persisted hash-partitioned AND locally sorted on `src`. The cached
  * scan advertises both the distribution and the ordering, so each
  * iteration's sort-merge join consumes the big side with ZERO
  * exchange and ZERO sort — the only per-iteration movement is the
  * rank vector itself: the contribution aggregation's own shuffle
  * (hash on `node`), whose output partitioning alias-propagates
  * through the `node`→`src` rename into the next join, leaving just a
  * small-side sort. No broadcast anywhere, so the rank vector never
  * has to fit in one executor and never round-trips the driver: a
  * 10⁹-node graph runs the same plan as a 10⁵-node one.
  *
  * `broadcastRank = true` keeps the small-graph fast path (rank
  * vector ≪ broadcast threshold): same math, rank broadcast against
  * the cached edge table, no join shuffle at all.
  *
  * Determinism (oracle-grade): per-edge contributions are pure IEEE
  * divisions cast to DECIMAL(15,14) — compact-long decimals whose sum
  * is exact and combine-order-independent — so results are
  * bit-identical across engines and across partitionings (the
  * cross-engine cast agreement bound is ~15 significant digits; see
  * Oracle.dsum).
  *
  * Callers guarantee every node has out-degree ≥ 1 (symmetrize for
  * undirected graphs) — dangling mass is not redistributed here.
  */
object PageRank {

  /** Lazy result + release handle for the internal persists (callers
    * materialize `ranks`, then `release()`). */
  final case class Ranked(ranks: DataFrame, release: () => Unit)

  /** Fixed-iteration PageRank (oracle-expressible as unrolled SQL).
    * edges: two columns (src, dst), pre-deduplicated. */
  def ranks(edges: DataFrame, iters: Int, damping: Double = 0.85,
            broadcastRank: Boolean = false): Ranked = {
    val (e, ed, deg, n) = layout(edges, broadcastRank)
    var rank = deg.select(col("src").as("node"), (lit(1.0) / lit(n)).as("r"))
    for (_ <- 1 to iters)
      rank = step(ed, rank, n, damping, broadcastRank)
    Ranked(rank, () => { ed.unpersist(blocking = false); e.unpersist(blocking = false) })
  }

  /** Persist edges, build the (edge ⋈ out-degree) layout, EAGERLY
    * materialize it, and return (edges, layout, degree, nodeCount).
    *
    * Materializing before any iteration is planned matters beyond
    * warm-up: an un-finalized cached AQE plan reports Unknown output
    * partitioning, so iteration joins would re-exchange + re-sort the
    * BIG side every round (measured); once final, the cached scan
    * advertises hash(src)+sorted(src) and the join consumes it
    * exchange-free. */
  private def layout(edges: DataFrame, broadcastRank: Boolean)
      : (DataFrame, DataFrame, DataFrame, Double) = {
    val s = edges.sparkSession
    val parts = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val Seq(srcC, dstC) = edges.columns.toSeq.take(2)
    val e = edges.select(col(srcC).as("src"), col(dstC).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // default path: force the degree join to sort-merge — its output is
    // already hash-partitioned AND sorted on src (the degree side reuses
    // its own groupBy exchange), so persisting the join result directly
    // gives the iteration layout without a second full shuffle+sort of
    // the edge table (measured: saves one 2×|E|-row exchange per build)
    val ed = (if (broadcastRank) e.join(deg, "src")
              else e.hint("merge").join(deg, "src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count() // materializes e then ed; finalizes both cached plans
    val n = deg.count().toDouble // cheap: aggregates the cached e
    (e, ed, deg, n)
  }

  /** Loop-to-convergence variant: iterate until the L1 rank delta
    * falls below `tol` (or maxIter). Each round localCheckpoints the
    * rank vector (truncating lineage, as any production iterative job
    * must) and runs one bounded delta aggregate. */
  def ranksConverged(edges: DataFrame, tol: Double, maxIter: Int = 50,
                     damping: Double = 0.85, broadcastRank: Boolean = false): Ranked = {
    val (e, ed, deg, n) = layout(edges, broadcastRank)
    var rank = Iteration.ckpt(
      deg.select(col("src").as("node"), (lit(1.0) / lit(n)).as("r")))
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta >= tol) {
      val next = Iteration.ckpt(step(ed, rank, n, damping, broadcastRank))
      delta = next.withColumnRenamed("r", "rn").join(rank, "node")
        .agg(sum(abs(col("rn") - col("r")))).head().getDouble(0)
      // the delta agg was the old frame's last reader — free it now
      Iteration.release(rank)
      rank = next
      it += 1
    }
    Ranked(rank, () => { ed.unpersist(blocking = false); e.unpersist(blocking = false) })
  }

  /** One iteration: contribution join + decimal-exact aggregation. */
  private def step(ed: DataFrame, rank: DataFrame, n: Double, damping: Double,
                   broadcastRank: Boolean): DataFrame = {
    val rsrc = rank.select(col("node").as("src"), col("r"))
    // the merge hint pins the zero-exchange SMJ against the cached
    // sorted layout; without it AQE re-plans the small rank side as a
    // broadcast (exactly the shape the default path exists to avoid)
    val joined =
      if (broadcastRank) ed.join(broadcast(rsrc), "src")
      else ed.hint("merge").join(rsrc, "src")
    val contribs = joined.select(col("dst").as("node"),
      (col("r") / col("od")).cast(DecimalType(15, 14)).as("contrib"))
    contribs.groupBy(col("node"))
      .agg((lit((1.0 - damping) / n) +
        lit(damping) * sum(col("contrib")).cast("double")).as("r"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the standard shuffle-bounded CC algorithm for
  * dedup clustering: near-duplicate PAIRS (q20/q21/q22/q64 output) are
  * edges; the component id labels every document of a duplicate
  * cluster so a training-data pipeline can keep one representative per
  * cluster (the reference delegates all such post-processing to its
  * warehouse — README.md:3 — so this is engine-side capability the
  * warehouse would otherwise provide).
  *
  * Why not plain label propagation: propagation needs O(diameter)
  * rounds; star operations contract chains in O(log²) rounds, and each
  * round is only {groupBy min → join → project → distinct} — codegen'd
  * hash aggregates and one shuffle each, no collect_list (a high-degree
  * node never materializes its neighbor list, so skew costs nothing
  * beyond the shuffle of its edges).
  *
  * Scale: every round's volume is bounded by the CURRENT edge set,
  * which only shrinks (toward one star edge per non-root node).
  * Lineage is truncated each round with localCheckpoint — an iterative
  * algorithm that re-derives round k from round 0 would be quadratic.
  * Rounds stop when the monotonically-decreasing Σ(src+dst) is stable
  * (strictly decreases while anything changes, so equality IS the
  * fixpoint — one cheap agg action per round, no row-wise diff join).
  */
object ConnectedComponents {

  /** edges: two BIGINT columns (any names) = undirected pairs.
    * Returns (node, component) with component = min node id reachable.
    * Isolated nodes don't appear (no edges → no cluster membership). */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // canonical undirected edge set, self-loops dropped
    var e = edges.select(least(ca, cb).as("u"), greatest(ca, cb).as("v"))
      .filter($"u" =!= $"v").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var sig = checksum(e)
    var it = 0
    var converged = false
    var eFrame: Option[DataFrame] = None // e when it is a ckpt frame (round ≥ 1)
    while (it < maxIter && !converged) {
      // both checkpoints are EAGER on purpose: smallStar references its
      // input on two sides (groupBy-min + join), so a lazy ls would be
      // computed twice inside ss's job (measured 2× round cost)
      val ls = Iteration.ckpt(largeStar(e))
      val ss = Iteration.ckpt(smallStar(ls))
      val nsig = checksum(ss)
      // checksum equality is the cheap (1-agg) gate; confirm with an
      // exact set diff only in that rare case, so the strict check
      // amortizes to ~one extra shuffle across the whole run
      converged = nsig == sig && ss.exceptAll(e).isEmpty
      // free the dead frames promptly: ls is never read past ss's build,
      // and the previous e (a ckpt frame from round ≥ 1, or the persisted
      // canonical edge set in round 0 — unpersist handles the latter)
      e.unpersist(blocking = false)
      eFrame.foreach(Iteration.release(_))
      Iteration.release(ls)
      e = ss
      eFrame = Some(ss)
      sig = nsig
      it += 1
    }
    // fixpoint = forest of stars: every non-root points at its root
    val roots = e.select($"v".as("node"), $"u".as("component"))
      .groupBy($"node").agg(F.min($"component").as("component"))
    val rootSelf = e.select($"u".as("node")).distinct()
      .join(e.select($"v".as("node")).distinct(), Seq("node"), "left_anti")
      .select($"node", $"node".as("component"))
    roots.unionByName(rootSelf)
  }

  /** (count, Σu+Σv) — both monotone non-increasing across star rounds;
    * stability ⇒ fixpoint. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), coalesce(sum(col("u") + col("v")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u}).
    * Implemented join-wise: symmetrize, groupBy-min per center (partial
    * aggregation map-side — skew-safe), join back, filter, canonicalize. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("c"), col("v").as("n"))
      .union(e.select(col("v").as("c"), col("u").as("n")))
    val m = sym.groupBy(col("c")).agg(min(col("n")).as("mn"))
      .select(col("c"), least(col("mn"), col("c")).as("m"))
    sym.join(m, "c")
      .filter(col("n") > col("c"))
      .select(least(col("n"), col("m")).as("u"), greatest(col("n"), col("m")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Small-star: neighbors v < u (plus u itself) link to m(u) over the
    * small side. Directed form: edges already u < v, center = v. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("v")).agg(min(col("u")).as("m"))
    e.join(m, "v")
      .select(col("u"), col("v"), col("m"))
      .select(explode(array(
        struct(col("u").as("a"), col("m").as("b")),
        struct(col("v").as("a"), col("m").as("b")))).as("p"))
      .select(least(col("p.a"), col("p.b")).as("u"), greatest(col("p.a"), col("p.b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }
}

package graft.queries

import graft.Tables
import graft.operators.Iteration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics beyond the per-node family in CorpusQueries
  * (q76 degree, q77 PageRank): algorithms whose naive relational form
  * collapses under skew at scale and need an explicit distribution
  * strategy.
  *
  * Reference context: etl-rust delegates all graph analysis to the
  * warehouse (README.md:3); here the engine owns it with shapes that
  * survive a 10⁹-edge graph.
  */
object GraphQueries {

  // ---------------------------------------------------------------------
  // q97 — triangle counting (degree-ordered orientation)

  /** Per-node triangle participation over the co-purchase graph (two
    * parts are adjacent iff some order contains both).
    *
    * The naive plan — wedge join on the raw edge list, then close each
    * wedge — generates Σᵥ deg(v)² wedge rows: a single celebrity node
    * with 10⁷ neighbors contributes 10¹⁴ wedges to ONE reducer. The
    * standard fix (Suri & Vassilvitskii, WWW'11 "Counting triangles and
    * the curse of the last reducer"): orient every undirected edge from
    * its lower-(degree, id) endpoint to the higher one. Orientation is
    * acyclic, every triangle survives as exactly one (u→v, u→w, v→w)
    * pattern, and each vertex's oriented out-degree is O(√m) — so wedge
    * work is bounded by O(m^{3/2}) TOTAL and per-reducer skew is gone.
    *
    * Plan shape: the degree table (one row per node) joins the edge list
    * un-hinted — Catalyst/AQE broadcasts it while it fits and falls back
    * to a shuffle join when it doesn't (a 10⁹-node degree table must NOT
    * be broadcast; this is q77's lesson applied from the start). The
    * wedge self-join shuffles on `src` — skew-bounded by the O(√m)
    * oriented out-degree — and the closing-edge check is a left-semi
    * join, so wedge rows never fan out.
    *
    * The oracle finds the same triangle set with plain id-ordered edges
    * (a<b<c triple join): orientation changes WHERE a triangle is
    * counted, never WHETHER — the per-node counts are identical.
    *
    * The oriented edge table is memoized via [[graft.PlanCache]]: it is
    * referenced three times (both wedge sides + the closing edge set)
    * and Spark's exchange reuse does not canonicalize the repeated
    * scan→distinct→agg→join subtree, so without the persist the whole
    * edge pipeline would be recomputed per reference (measured 34 s →
    * see below at sf0.1/local[32] without it). Per-node counts come
    * from ONE pass over the triangle set (explode of the 3 corners),
    * not a triple self-union, for the same reason. */
  /** The shared bulk co-purchase edge set (a < b, deduplicated), memoized
    * once per (session, dir) for the whole graph family (q97, q100).
    *
    * Bulk co-purchases only (quantity > 30): the unfiltered graph is
    * near-complete on the part key space (sf0.1: 20k nodes, 1.2M
    * edges, avg degree 120 → 41M wedges even oriented), which makes
    * exact triangle counting a density problem, not a skew problem.
    * The quantity predicate is part of the query's semantics (bulk
    * co-purchase affinity) and is pushed to the parquet scan. */
  private def bulkEdges(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.memo(s, dir, "bulk_copurchase_edges", "q>30") {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
    }

  /** Per-node degree over [[bulkEdges]] (node-sized; one aggregate). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

  /** Symmetrized (src, dst) adjacency over [[bulkEdges]], memoized once
    * per (session, dir) — q143's frontier expansion and q153's three
    * LPA rounds each read it 3-4 times, so materializing it saves every
    * re-derivation of the distinct-pair self-join upstream.
    *
    * LAYOUT (the PageRank.layout lesson, applied r12 after the sf100
    * decomposition showed each LPA round paying a full shuffle+sort of
    * this table): the memo is hash-partitioned AND locally sorted on
    * `src`, and memoized EAGERLY so the cached scan advertises
    * hash(src)+sorted(src) from the first round. Every loop consumer
    * keys its per-round join on `src` (symmetry makes the src/dst roles
    * interchangeable), so the round's SMJ exchanges only the NODE-sized
    * side, and downstream groupBys whose keys include `src` reuse the
    * same partitioning exchange-free. At sf100 that removes ~240M-row
    * exchanges+sorts from every round of q143/q153/q186/q201. */
  private def symEdges(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.memo(s, dir, "sym_copurchase_edges", "q>30", eager = true) {
      val e = bulkEdges(s, dir)
      val parts = math.max(1,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        .repartition(parts, col("src"))
        .sortWithinPartitions(col("src"))
    }

  def q97TriangleCount(s: SparkSession, dir: String): DataFrame = {
    val eo = graft.PlanCache.memo(s, dir, "tri_oriented_edges", "q>30") {
      val e = bulkEdges(s, dir)
      val deg = degrees(e)
      val withDeg = e
        .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      val aLower = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      // (src, dst, dd): oriented edge + the dst's (degree, id) rank key so
      // wedge ordering below needs no further join back to the degree table
      withDeg.select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"),
        when(aLower, col("db")).otherwise(col("da")).as("dd"))
    }
    val wedges = eo.as("w1").join(eo.as("w2"),
        col("w1.src") === col("w2.src") &&
          (col("w1.dd") < col("w2.dd") ||
            (col("w1.dd") === col("w2.dd") && col("w1.dst") < col("w2.dst"))))
      .select(col("w1.src").as("u"), col("w1.dst").as("v"), col("w2.dst").as("w"))
    // a wedge (u; v, w) closes iff the oriented edge v→w exists (v precedes
    // w in orientation order by construction of the wedge ordering)
    val tri = wedges.join(
      eo.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"), "left_semi")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(20)
  }

  /** Shared CTE prefix of every bulk-co-purchase-graph oracle
    * (q97/q100/q143): the DuckDB twin of [[bulkEdges]]. One constant so
    * the edge definition cannot drift between oracles (the q70/q133
    * composition stance). */
  private val edgesCteSql: String =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem WHERE l_quantity > 30),
      |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
      |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk)""".stripMargin

  val q97Sql: String =
    s"""WITH $edgesCteSql,
      |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
      |        FROM e e1 JOIN e e2 ON e1.b = e2.a
      |                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |nodes AS (SELECT u AS node FROM tri
      |          UNION ALL SELECT v FROM tri
      |          UNION ALL SELECT w FROM tri)
      |SELECT node, COUNT(*) AS n_triangles
      |FROM nodes GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin

  /** The pre-limit plan, exposed for PlanSpec's shape assertions (no
    * cartesian product / BroadcastNestedLoopJoin anywhere in the
    * triangle pipeline). */
  def q97Plan(s: SparkSession, dir: String): DataFrame =
    q97TriangleCount(s, dir)

  // ---------------------------------------------------------------------
  // q100 — link prediction by co-neighbor Jaccard

  /** Top non-adjacent part pairs ranked by neighborhood Jaccard
    * |N(v)∩N(w)| / |N(v)∪N(w)| over the bulk co-purchase graph — the
    * classic common-neighbors link-prediction score.
    *
    * Shape: common-neighbor counts come from per-center wedge
    * generation (adjacency self-join on the center, v < w), one count
    * aggregate keyed by the PAIR — so the reduce key space is pairs,
    * not nodes, and no celebrity reducer exists. Wedge volume is
    * Σ C(d,2); on this quantity-filtered graph max degree is ~80
    * (measured), so the unoriented form is skew-safe — a heavy-tailed
    * graph would reuse q97's orientation bound instead. Degrees join in
    * un-hinted (node-sized table: AQE broadcasts while it fits, shuffles
    * when it doesn't); candidate pairs that are already edges leave via
    * one left-anti equi-join. Jaccard is an exact-integer division —
    * bit-identical across engines — with full (score, v, w) tiebreak.
    * The edge table is the same [[bulkEdges]] memo q97 reads. */
  def q100LinkPrediction(s: SparkSession, dir: String): DataFrame = {
    val e = bulkEdges(s, dir)
    val adj = e.select(col("a").as("u"), col("b").as("n"))
      .unionByName(e.select(col("b").as("u"), col("a").as("n")))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.u") === col("y.u") && col("x.n") < col("y.n"))
      .select(col("x.n").as("v"), col("y.n").as("w"))
    val cn = wedges.groupBy(col("v"), col("w")).agg(count(lit(1)).as("cn"))
    val deg = degrees(e)
    val nonAdj = cn.join(e.select(col("a").as("v"), col("b").as("w")),
      Seq("v", "w"), "left_anti")
    nonAdj
      .join(deg.select(col("v"), col("d").as("dv")), "v")
      .join(deg.select(col("v").as("w"), col("d").as("dw")), "w")
      .filter(col("cn") >= 3)
      .select(col("v"), col("w"), col("cn"),
        (col("cn") / (col("dv") + col("dw") - col("cn"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("v"), col("w"))
      .limit(25)
  }

  val q100Sql: String =
    s"""WITH $edgesCteSql,
      |adj AS (SELECT a AS u, b AS n FROM e
      |        UNION ALL SELECT b, a FROM e),
      |cn AS (SELECT x.n AS v, y.n AS w, COUNT(*) AS cn
      |       FROM adj x JOIN adj y ON x.u = y.u AND x.n < y.n
      |       GROUP BY 1, 2),
      |deg AS (SELECT u AS v, COUNT(*) AS d FROM adj GROUP BY 1)
      |SELECT cn.v, cn.w, cn.cn,
      |  cn.cn / (dv.d + dw.d - cn.cn) AS jaccard
      |FROM cn
      |  JOIN deg dv ON dv.v = cn.v
      |  JOIN deg dw ON dw.v = cn.w
      |WHERE cn.cn >= 3
      |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.v AND e.b = cn.w)
      |ORDER BY jaccard DESC, cn.v, cn.w LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q143 — multi-source BFS hop distance (bounded frontier expansion)

  /** Bounded breadth-first search from a seed set (nodes < 50) over the
    * shared co-purchase graph: min hop distance per node up to 4 hops,
    * reported as the hop histogram with a membership checksum (which
    * nodes, not just how many — a frontier bug that swaps nodes between
    * hops cannot cancel).
    *
    * Frontier expansion, the scalable BFS shape: each round joins ONLY
    * the newly-reached frontier against the (memoized) edge list, and a
    * left-anti join against the visited set keeps first-reach rows — so
    * round cost tracks frontier × degree, never visited × degree.
    * Rounds are a fixed small constant and each frontier is
    * localCheckpoint'd (the ConnectedComponents lineage stance: an
    * iterative plan must not grow a 4-round join tower for Catalyst to
    * re-analyze). The oracle walks the same graph with a recursive CTE
    * (UNION-distinct bounds rows to nodes × hops). */
  def q143BfsHops(s: SparkSession, dir: String): DataFrame = {
    val sym = symEdges(s, dir)
    val nodes = sym.select(col("src").as("v")).distinct()
    // frames are NOT released here: `dist` is a union over every round's
    // frame, so all of them are read by the final aggregate
    var dist = Iteration.ckpt(nodes.filter(col("v") < 50)
      .select(col("v"), lit(0).as("hop")))
    var frontier = dist
    for (h <- 1 to 4) {
      val newNodes = Iteration.ckpt(frontier.join(sym, col("v") === col("src"))
        .select(col("dst").as("v")).distinct()
        .join(dist.select(col("v")), Seq("v"), "left_anti")
        .select(col("v"), lit(h).as("hop")))
      frontier = newNodes
      dist = dist.unionByName(newNodes)
    }
    dist.groupBy(col("hop"))
      .agg(count(lit(1)).as("n_nodes"), graft.Oracle.lsum(col("v")).as("node_checksum"))
      .orderBy(col("hop"))
  }

  val q143Sql: String =
    s"""WITH RECURSIVE $edgesCteSql,
      |sym AS (SELECT a AS src, b AS dst FROM e
      |        UNION ALL SELECT b, a FROM e),
      |walk(v, d) AS (
      |  SELECT DISTINCT src AS v, 0 AS d FROM sym WHERE src < 50
      |  UNION
      |  SELECT sym.dst AS v, walk.d + 1 AS d
      |  FROM walk JOIN sym ON walk.v = sym.src WHERE walk.d < 4),
      |dist AS (SELECT v, CAST(MIN(d) AS INTEGER) AS hop FROM walk GROUP BY 1)
      |SELECT hop, COUNT(*) AS n_nodes, CAST(SUM(v) AS BIGINT) AS node_checksum
      |FROM dist GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q153 — community detection by synchronous label propagation

  /** Three rounds of synchronous label propagation (Raghavan et al. 2007)
    * over the shared co-purchase graph, reported as the community-size
    * table with a membership checksum. Every node starts with its own id
    * as its label; each round, every node adopts the most frequent label
    * among its NEIGHBORS, ties broken by the smaller label — a fully
    * deterministic variant (classic LPA breaks ties randomly; a data
    * engine's clustering must be replayable, the q152 stance).
    *
    * Scale shape, per round: one shuffle joins the edge list against the
    * node-sized label table on dst (AQE may broadcast the label side
    * while node count is small relative to edges), one count aggregate
    * keyed by (node, label) — reduce-key cardinality is bounded by the
    * out-degree sum, per-key width by the node's degree — and one
    * `max_by` argmax per node. Rounds are a fixed constant and each
    * round's label table is localCheckpoint'd (the q143/ConnectedComponents
    * lineage stance). No per-round driver traffic; the label vector
    * never leaves the cluster. The oracle replays the identical three
    * rounds as chained CTEs with a ROW_NUMBER argmax. */
  def q153LabelPropagation(s: SparkSession, dir: String): DataFrame = {
    val sym = symEdges(s, dir)
    var labels = Iteration.ckpt(sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl")))
    for (_ <- 1 to 3) {
      // join keyed on `src` = the NEIGHBOR side (symmetry makes the roles
      // interchangeable): the memoized layout is hash(src)+sorted(src),
      // so the SMJ exchanges only the node-sized label table, and the
      // receiver is `dst` — the (dst, lbl) count is the identical
      // multiset the dst-keyed form produced
      val next = Iteration.ckpt(sym
        .join(labels.select(col("v").as("src"), col("lbl")), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("lbl"))
        .select(col("dst").as("v"), col("lbl")))
      Iteration.release(labels) // next is materialized; the old frame is dead
      labels = next
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"),
        graft.Oracle.lsum(col("v")).as("member_checksum"),
        min(col("v")).as("min_member"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(30)
  }

  // ---------------------------------------------------------------------
  // q186 — k-core decomposition (iterative peeling, fixed rounds)

  /** The 3-core of the bulk co-purchase graph by synchronous peeling:
    * each round restricts edges to current survivors, recounts degrees,
    * and drops nodes under k — after enough rounds the survivor set is
    * the k-core (maximal subgraph of min degree ≥ k). Rounds are a
    * fixed constant (8) with the fixed point asserted in GraphSpec (one
    * extra round changes nothing at test scale), mirroring the LPA/CC
    * bounded-round stance; each round is one semi-join + one aggregate,
    * localCheckpoint'd so lineage stays flat. Peeling is the
    * shuffle-bounded distributed form (Montresor et al. 2013);
    * per-round cost is O(|E|) with no skew amplification — degrees are
    * per-node counts, never wedges. */
  def q186KCore(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val sym = symEdges(s, dir)
    var nodes = Iteration.ckpt(sym.select(col("src").as("v")).distinct())
    // per round, ONE big-side-exchange-free pass (the symEdges layout):
    // the src semi-join filters neighbors∈S without exchanging the edge
    // table; deg_S(u) = |N(u) ∩ S| comes from groupBy(dst) — the round's
    // only edge-sized shuffle — and the u∈S restriction is a node-sized
    // semi on the AGGREGATE, not a second edge-sized join
    def survivorDegrees(surv: DataFrame): DataFrame = sym
      .join(surv.select(col("v").as("src")), Seq("src"), "left_semi")
      .groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .join(surv.select(col("v").as("dst")), Seq("dst"), "left_semi")
    for (_ <- 1 to 8) {
      val next = Iteration.ckpt(survivorDegrees(nodes)
        .filter(col("d") >= k)
        .select(col("dst").as("v")))
      Iteration.release(nodes)
      nodes = next
    }
    survivorDegrees(nodes)
      .select(col("dst").as("node"), col("d").as("deg_in_core"))
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------------
  // q201 — weighted single-source shortest paths (bounded Bellman–Ford)

  /** Weighted SSSP from the lowest-id node over the co-purchase graph
    * with a deterministic integer edge weight (1 + (31a+17b) mod 9 —
    * a synthetic latency; real deployments carry a weight column).
    * Six synchronous Bellman–Ford relaxation rounds: each round is one
    * join (frontier ⋈ edges) + one min-aggregate, localCheckpoint'd —
    * the bounded-round stance of q143/q153/q186, here with WEIGHTED
    * distances (q143 is unweighted hop counts). Paths longer than six
    * edges stay at their best-so-far bound, exactly like the oracle's
    * six unrolled rounds. Integer arithmetic throughout. */
  def q201WeightedSssp(s: SparkSession, dir: String): DataFrame = {
    val sym = symEdges(s, dir)
      .withColumn("w", lit(1) + pmod(col("src") * 31 + col("dst") * 17, lit(9)))
    val src0 = sym.agg(min(col("src")).as("v"))
    var dist = Iteration.ckpt(src0.select(col("v"), lit(0L).as("d")))
    for (_ <- 1 to 6) {
      val relaxed = sym
        .join(dist.select(col("v").as("src"), col("d")), "src")
        .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
        .unionByName(dist)
      val next = Iteration.ckpt(relaxed.groupBy(col("v")).agg(min(col("d")).as("d")))
      Iteration.release(dist)
      dist = next
    }
    dist.select(col("v").as("node"), col("d").as("dist"))
      .orderBy(col("dist"), col("node")).limit(30)
  }

  val q201Sql: String = {
    // AS MATERIALIZED: each relaxation references the previous front
    // twice (join + union) — see q186Sql's exponential-inlining note
    def round(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT v, MIN(d) AS d FROM (
         |    SELECT sym.dst AS v, p.d + sym.w AS d
         |    FROM sym JOIN $prev p ON sym.src = p.v
         |    UNION ALL SELECT v, d FROM $prev) u
         |  GROUP BY 1)""".stripMargin
    val rounds = (1 to 6).map(i =>
      round(if (i == 1) "d0" else s"d${i - 1}", s"d$i")).mkString(",\n")
    s"""WITH $edgesCteSql,
      |sym0 AS (SELECT a AS src, b AS dst FROM e
      |         UNION ALL SELECT b, a FROM e),
      |sym AS MATERIALIZED (SELECT src, dst, 1 + (src * 31 + dst * 17) % 9 AS w FROM sym0),
      |d0 AS (SELECT MIN(src) AS v, CAST(0 AS BIGINT) AS d FROM sym),
      |$rounds
      |SELECT v AS node, d AS dist FROM d6
      |ORDER BY dist, node LIMIT 30""".stripMargin
  }

  val q186Sql: String = {
    // AS MATERIALIZED: each round references the previous one TWICE;
    // inlined CTEs would re-evaluate the whole chain per reference —
    // 2^8 expansions of the base join (measured: the r7 sf0.1 sweep
    // spilled ~80 GB of DuckDB temp before materialization hints)
    def round(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT sym.src AS v FROM sym
         |  JOIN $prev x ON sym.src = x.v JOIN $prev y ON sym.dst = y.v
         |  GROUP BY 1 HAVING COUNT(*) >= 3)""".stripMargin
    val rounds = (1 to 8).map(i =>
      round(if (i == 1) "n0" else s"n${i - 1}", s"n$i")).mkString(",\n")
    s"""WITH $edgesCteSql,
      |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
      |        UNION ALL SELECT b, a FROM e),
      |n0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym),
      |$rounds
      |SELECT sym.src AS node, COUNT(*) AS deg_in_core
      |FROM sym JOIN n8 x ON sym.src = x.v JOIN n8 y ON sym.dst = y.v
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q217 — HITS hubs & authorities (unnormalized integer iterations)

  /** Kleinberg's HITS over the ORIENTED co-purchase graph (every edge
    * a→b with a<b — acyclic, so hub and authority roles are distinct):
    * h⁰=1, aᵏ = Σ_{u→v} hᵏ⁻¹(u), hᵏ = Σ_{v: u→v} aᵏ(v), two rounds.
    * The textbook algorithm L2-normalizes each round; normalization
    * only rescales the ranking, so the engine keeps the iterates as
    * EXACT BIGINT sums — no floating point anywhere, which is what
    * makes a 2-round fixed-point hash-comparable across engines
    * (growth is bounded by deg²ᵏ: ≪ 2⁶³ at any plausible degree).
    *
    * Scale shape: each half-round is one equi-join edge⋈score + one
    * hash aggregate — the q77 PageRank template minus the dangling-mass
    * redistribution. Nothing node-sized is broadcast; scores live in
    * (node, value) tables sharing the edge partitioning. */
  def q217Hits(s: SparkSession, dir: String): DataFrame = {
    val e = bulkEdges(s, dir) // directed a -> b (a < b) by construction
    // round 1: every hub weight is 1 -> authority = in-degree
    // (score column named "sc", NOT "a" — the edge table owns "a")
    val a1 = e.groupBy(col("b").as("v")).agg(count(lit(1)).as("sc"))
    val h1 = e.join(a1.select(col("v").as("b"), col("sc")), "b")
      .groupBy(col("a").as("u")).agg(graft.Oracle.lsum(col("sc")).as("h"))
    // round 2 on the round-1 iterates
    val a2 = e.join(h1.select(col("u").as("a"), col("h")), "a")
      .groupBy(col("b").as("v")).agg(graft.Oracle.lsum(col("h")).as("auth"))
    val h2 = e.join(a2.select(col("v").as("b"), col("auth")), "b")
      .groupBy(col("a").as("v")).agg(graft.Oracle.lsum(col("auth")).as("hub"))
    a2.join(h2, Seq("v"), "full_outer")
      .select(col("v").as("node"),
        coalesce(col("auth"), lit(0L)).as("authority"),
        coalesce(col("hub"), lit(0L)).as("hub"))
      .orderBy(col("authority").desc, col("hub").desc, col("node"))
      .limit(30)
  }

  val q217Sql: String =
    s"""WITH $edgesCteSql,
      |a1 AS (SELECT b AS v, COUNT(*) AS a FROM e GROUP BY 1),
      |h1 AS (SELECT e.a AS u, CAST(SUM(a1.a) AS BIGINT) AS h
      |       FROM e JOIN a1 ON e.b = a1.v GROUP BY 1),
      |a2 AS (SELECT e.b AS v, CAST(SUM(h1.h) AS BIGINT) AS auth
      |       FROM e JOIN h1 ON e.a = h1.u GROUP BY 1),
      |h2 AS (SELECT e.a AS v, CAST(SUM(a2.auth) AS BIGINT) AS hub
      |       FROM e JOIN a2 ON e.b = a2.v GROUP BY 1)
      |SELECT COALESCE(a2.v, h2.v) AS node,
      |  COALESCE(a2.auth, 0) AS authority, COALESCE(h2.hub, 0) AS hub
      |FROM a2 FULL OUTER JOIN h2 ON a2.v = h2.v
      |ORDER BY authority DESC, hub DESC, node LIMIT 30""".stripMargin

  // ---------------------------------------------------------------------
  // q229 — degree assortativity (Newman's r)

  /** Degree-mixing coefficient of the co-purchase graph: Pearson
    * correlation of endpoint degrees over every directed edge
    * orientation (Newman 2002) — positive r = hubs link hubs
    * (social-style), negative = hub-and-spoke (infrastructure-style);
    * the one-number structure summary that decides whether degree-based
    * sampling or hub-removal strategies are safe on this graph. All
    * moments are exact integer sums; products go through DECIMAL(38,0)
    * on the Spark side (M·Σxy overflows int64 once m·deg² passes ~1e18
    * — the q208 lesson applied up front) and DuckDB's native HUGEINT on
    * the oracle side; one IEEE tree at the end.
    *
    * Scale: one degree aggregate + two node-keyed joins onto the edge
    * list + one scalar aggregate — no windows, nothing all-pairs. */
  def q229Assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = bulkEdges(s, dir)
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val xy = sym
      .join(deg.select(col("u"), col("d").as("x")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("y")), "v")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    xy.agg(count(lit(1)).as("m2"),
        graft.Oracle.lsum(col("x")).as("sx"), graft.Oracle.lsum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      .select(col("m2"),
        // NULLIF guard on both engines: a degree-regular graph zeroes
        // the variance terms (Spark non-ANSI /0 -> NULL, DuckDB IEEE
        // /0.0 -> nan/inf), so both sides null the denominator.
        round(((col("m2").cast(d38) * col("sxy") - col("sx").cast(d38) * col("sy").cast(d38)).cast("double")) /
          nullif(
            sqrt((col("m2").cast(d38) * col("sxx") - col("sx").cast(d38) * col("sx").cast(d38)).cast("double")) *
            sqrt((col("m2").cast(d38) * col("syy") - col("sy").cast(d38) * col("sy").cast(d38)).cast("double")),
            lit(0.0)),
          6).as("assortativity"))
  }

  val q229Sql: String =
    s"""WITH $edgesCteSql,
      |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY 1),
      |xy AS (
      |  SELECT dx.d AS x, dy.d AS y FROM sym
      |  JOIN deg dx ON sym.u = dx.u JOIN deg dy ON sym.v = dy.u),
      |mo AS (
      |  -- HUGEINT moments (Spark side uses DECIMAL(38,0)): m2*sxy
      |  -- overflows int64 at large m*deg^2
      |  SELECT COUNT(*) AS m2, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      |  FROM xy)
      |SELECT CAST(m2 AS BIGINT) AS m2,
      |  ROUND(CAST(m2 * sxy - sx * sy AS DOUBLE) /
      |    NULLIF(SQRT(CAST(m2 * sxx - sx * sx AS DOUBLE)) *
      |           SQRT(CAST(m2 * syy - sy * sy AS DOUBLE)), 0), 6)
      |    AS assortativity
      |FROM mo""".stripMargin

  // ---------------------------------------------------------------------
  // q230 — hub-removal robustness (giant component before/after attack)

  /** Targeted-attack resilience audit (Albert/Jeong/Barabási 2000): the
    * size of the largest connected component before and after deleting
    * the top-20 highest-degree hubs — the one-number answer to "does
    * this graph's connectivity live in its hubs?". Components come from
    * a FIXED 12-round min-label propagation (the Pregel pattern; both
    * engines compute the identical bounded iteration, so the hash gate
    * is exact regardless of diameter; GraphSpec proves 12 rounds reach
    * the true fixpoint at spec scale — the q205-style regime pin). The
    * post-attack giant is measured over the remaining edge-bearing
    * subgraph (isolated survivors are reported in their own column, not
    * silently merged).
    *
    * Scale: each propagation round is one edge⋈label join + one keyed
    * min — the q77/q201 iteration shape, localCheckpoint'd; the hub set
    * is a broadcast-20 anti-join. */
  def q230HubRobustness(s: SparkSession, dir: String): DataFrame = {
    val e = bulkEdges(s, dir)
    def symOf(ed: DataFrame): DataFrame =
      ed.select(col("a").as("u"), col("b").as("v"))
        .unionByName(ed.select(col("b").as("u"), col("a").as("v")))
    // (n_nodes, giant_size, converged): giant is null-safe (0 on an
    // empty subgraph — hub removal can delete every edge), and the
    // fixed 12-round bound is self-verifying: converged=1 iff labels
    // are stable by round 12, so a >12-diameter graph at 100× scale
    // reports its own approximation instead of silently shipping it.
    // Labels only DECREASE under min-propagation, so an exact
    // DECIMAL(38,0) label sum is a fixpoint detector: sum unchanged ⟺
    // no label changed ⟺ every later round is identical — which makes
    // early exit safe under the hash gate (the emitted labels equal
    // the full 12-round computation the oracle runs) and turns the
    // 12-round worst case into diameter-many rounds in the common case.
    def giant(ed: DataFrame): (Long, Long, Long) = {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val sym = symOf(ed)
      // the label-sum fixpoint detector rides each round frame's ckpt
      // job as observed metrics (Iteration.observedOr) — was a separate
      // node-table agg job per round, ×12 rounds ×2 graphs (r14, §2.4)
      def sumLbl = coalesce(sum(col("lbl").cast(d38)),
        lit(java.math.BigDecimal.ZERO).cast(d38)).as("s")
      def labSum(df: DataFrame): java.math.BigDecimal = {
        val d = df.agg(sumLbl).head().getDecimal(0)
        if (d == null) java.math.BigDecimal.ZERO else d
      }
      def asBD(v: Any): java.math.BigDecimal = v match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
        case o => new java.math.BigDecimal(o.toString)
      }
      val obs0 = org.apache.spark.sql.Observation()
      var lab = Iteration.ckpt(sym.select(col("u").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .observe(obs0, count(lit(1)).as("n"), sumLbl))
      val m0 = Iteration.observedOr(obs0)(
        Map("n" -> lab.count(), "s" -> labSum(lab)))
      val n = m0("n").asInstanceOf[Long]
      var prevSum = asBD(m0("s"))
      var converged = 0L
      var r = 0
      while (r < 12 && converged == 0L) {
        val obs = org.apache.spark.sql.Observation()
        val next = Iteration.ckpt(
          sym.join(lab.select(col("node").as("v"), col("lbl")), "v")
            .select(col("u").as("node"), col("lbl"))
            .unionByName(lab)
            .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
            .observe(obs, sumLbl))
        Iteration.release(lab)
        lab = next
        val s = asBD(Iteration.observedOr(obs)(Map("s" -> labSum(lab)))("s"))
        if (s.compareTo(prevSum) == 0) converged = 1L
        prevSum = s
        r += 1
      }
      val g = lab.groupBy(col("lbl")).agg(count(lit(1)).as("c"))
        .agg(coalesce(max(col("c")), lit(0L))).head().getLong(0)
      (n, g, converged)
    }
    val deg = symOf(e).groupBy(col("u")).agg(count(lit(1)).as("d"))
    val hubs = deg.orderBy(col("d").desc, col("u")).limit(20)
      .select(col("u").as("hub"))
    val nHubs = hubs.count() // actual (limit(20) may return fewer)
    val e2 = e.join(broadcast(hubs.select(col("hub").as("a"))), Seq("a"), "left_anti")
      .join(broadcast(hubs.select(col("hub").as("b"))), Seq("b"), "left_anti")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER) // both giants + the count read it; computed once
    // the before/after propagations are independent DAGs — run them
    // concurrently (Spark job submission is thread-safe)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut1 = Future(giant(e))
    val fut2 = Future(giant(e2))
    val (n1, g1, c1) = Await.result(fut1, Duration.Inf)
    val (n2, g2, c2) = Await.result(fut2, Duration.Inf)
    val (ec1, ec2) = (e.count(), e2.count())
    import s.implicits._
    Seq((n1, ec1, g1, c1, nHubs, n2, ec2, g2, c2, n1 - nHubs - n2))
      .toDF("n_nodes", "n_edges", "giant_before", "converged_before",
        "hubs_removed", "n_nodes_after", "n_edges_after", "giant_after",
        "converged_after", "n_isolated_after")
  }

  val q230Sql: String = {
    def rounds(sym: String, l0: String, prefix: String): String =
      (1 to 12).map { i =>
        val prev = if (i == 1) l0 else s"$prefix${i - 1}"
        s"""$prefix$i AS MATERIALIZED (
           |  SELECT node, MIN(lbl) AS lbl FROM (
           |    SELECT $sym.u AS node, p.lbl FROM $sym
           |    JOIN $prev p ON $sym.v = p.node
           |    UNION ALL SELECT node, lbl FROM $prev) x
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
    s"""WITH $edgesCteSql,
      |sym AS MATERIALIZED (SELECT a AS u, b AS v FROM e
      |  UNION ALL SELECT b, a FROM e),
      |deg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY 1),
      |hubs AS MATERIALIZED (
      |  SELECT u AS hub FROM deg ORDER BY d DESC, u LIMIT 20),
      |e2 AS MATERIALIZED (
      |  SELECT a, b FROM e
      |  WHERE a NOT IN (SELECT hub FROM hubs)
      |    AND b NOT IN (SELECT hub FROM hubs)),
      |sym2 AS MATERIALIZED (SELECT a AS u, b AS v FROM e2
      |  UNION ALL SELECT b, a FROM e2),
      |g0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM sym),
      |h0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM sym2),
      |${rounds("sym", "g0", "g")},
      |${rounds("sym2", "h0", "h")},
      |gb AS (SELECT CAST(COALESCE(MAX(c), 0) AS BIGINT) AS giant FROM
      |  (SELECT lbl, COUNT(*) AS c FROM g12 GROUP BY 1)),
      |ga AS (SELECT CAST(COALESCE(MAX(c), 0) AS BIGINT) AS giant FROM
      |  (SELECT lbl, COUNT(*) AS c FROM h12 GROUP BY 1)),
      |cvb AS (SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
      |    AS BIGINT) AS conv
      |  FROM g12 JOIN g11 ON g12.node = g11.node
      |  WHERE g12.lbl <> g11.lbl),
      |cva AS (SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
      |    AS BIGINT) AS conv
      |  FROM h12 JOIN h11 ON h12.node = h11.node
      |  WHERE h12.lbl <> h11.lbl)
      |SELECT
      |  (SELECT COUNT(*) FROM g0) AS n_nodes,
      |  (SELECT COUNT(*) FROM e) AS n_edges,
      |  gb.giant AS giant_before,
      |  cvb.conv AS converged_before,
      |  (SELECT COUNT(*) FROM hubs) AS hubs_removed,
      |  (SELECT COUNT(*) FROM h0) AS n_nodes_after,
      |  (SELECT COUNT(*) FROM e2) AS n_edges_after,
      |  ga.giant AS giant_after,
      |  cva.conv AS converged_after,
      |  (SELECT COUNT(*) FROM g0) - (SELECT COUNT(*) FROM hubs)
      |    - (SELECT COUNT(*) FROM h0) AS n_isolated_after
      |FROM gb CROSS JOIN ga CROSS JOIN cvb CROSS JOIN cva""".stripMargin
  }

  val q153Sql: String = {
    // one LPA round as SQL: neighbor-label counts + ROW_NUMBER argmax
    def round(prev: String, out: String): String =
      s"""n_$out AS (SELECT sym.src AS v, $prev.lbl AS lbl, COUNT(*) AS c
         |  FROM sym JOIN $prev ON sym.dst = $prev.v GROUP BY 1, 2),
         |$out AS (SELECT v, lbl FROM (
         |  SELECT v, lbl,
         |    ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
         |  FROM n_$out) WHERE rn = 1)""".stripMargin
    s"""WITH $edgesCteSql,
      |sym AS (SELECT a AS src, b AS dst FROM e
      |        UNION ALL SELECT b, a FROM e),
      |l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM sym),
      |${round("l0", "l1")},
      |${round("l1", "l2")},
      |${round("l2", "l3")}
      |SELECT lbl AS community, COUNT(*) AS n_members,
      |  CAST(SUM(v) AS BIGINT) AS member_checksum, MIN(v) AS min_member
      |FROM l3 GROUP BY 1
      |ORDER BY n_members DESC, community LIMIT 30""".stripMargin
  }
}

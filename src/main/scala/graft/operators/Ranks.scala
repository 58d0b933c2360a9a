package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec (which Spark executes as
  * an Exchange SinglePartition + one-task sort: the classic 100 TB
  * killer).
  *
  * Shape — sketch-bucketed ranking:
  *
  *   1. ONE pass builds `approx_percentile` cutpoints over the leading
  *      sort column (a mergeable GK sketch; map-side partials, no sort);
  *      the B-1 cutpoints are driver-collected (bounded: B doubles,
  *      sized by the CLUSTER, not the data) and burned into the plan as
  *      literals;
  *   2. each row gets a bucket id from a codegen'd first-match CASE
  *      chain over the cutpoints — buckets are VALUE-CONTIGUOUS, so
  *      concatenating buckets in id order is the global sort order;
  *   3. per-bucket rank: `row_number` over `partitionBy(bucket)` — each
  *      window task sorts ~n/B rows, nothing global;
  *   4. bucket offsets: an aggregate of per-bucket counts (≤ B rows)
  *      prefix-summed and broadcast back — global rank = offset +
  *      per-bucket rank.
  *
  * Why not range-repartition + `monotonically_increasing_id` (the
  * RDD.zipWithIndex shape)? Spark SQL's range exchange re-SAMPLES its
  * boundaries per physical execution (the sampler is seeded from the
  * RDD id), so the offsets job and the final scan can disagree on
  * partition membership — measured: rank drift at partition edges.
  * Here every stage derives from the same literal cutpoints, so any
  * two executions agree by construction; the sketch's only job is
  * balance, never correctness.
  *
  * Balance: buckets are quantile-spaced (equal-count up to sketch
  * error), oversampled 4× the shuffle-partition count so hash
  * collisions of bucket→reducer stay smooth. A single value carrying
  * more mass than a bucket width degenerates to one big bucket (ties
  * can't cross a cutpoint); that bucket's window sort is bounded by the
  * tie mass, not the data size.
  *
  * Caveats: the leading sort column must be numeric and non-null
  * (sketchable); remaining columns are tie-breaks within a bucket.
  */
object Ranks {

  /** Append 1-based global rank `rnCol` ordering by `sortCols` (pass a
    * unique tiebreak for a deterministic total order). Triggers one
    * sketch job at call time (bounded output: ~4×shuffle-partitions
    * cutpoints). */
  def withGlobalRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame = {
    val s = df.sparkSession
    val parts = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val buckets = 2 * parts
    val ps = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val lead = sortCols.head
    // accuracy only controls bucket BALANCE, never correctness (ranks
    // come from actual per-bucket counts) — so a coarse sketch is right:
    // rank error n/2000 mis-sizes a bucket by <0.05% of n, while a
    // "safe-looking" 1M-accuracy sketch dominated the whole query's cost
    val cutRows = df.select(
      percentile_approx(lead, array(ps: _*), lit(2000)).as("c"))
      .collect()
    val cuts: Seq[Double] =
      if (cutRows.isEmpty || cutRows(0).isNullAt(0)) Seq.empty
      else cutRows(0).getSeq[Any](0).map(toD)
    // distinct ascending cutpoints; duplicates (heavy ties) collapse —
    // the CASE chain then simply skips the empty buckets
    val distinctCuts = cuts.distinct.sorted.toIndexedSeq
    val bucketed = df.withColumn("__b", bucketOf(lead, distinctCuts))
    val counts = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
    // prefix sum over ≤ B rows: the only single-partition window in the
    // plan, and it is cluster-sized, not data-sized
    val offsets = counts
      .withColumn("__off",
        sum(col("__cnt")).over(Window.orderBy(col("__b"))) - col("__cnt"))
      .select(col("__b"), col("__off"))
    val wb = Window.partitionBy(col("__b")).orderBy(sortCols.map(_.asc): _*)
    bucketed
      .join(broadcast(offsets), "__b")
      .withColumn("__brn", row_number().over(wb).cast("long"))
      .withColumn(rnCol, col("__off") + col("__brn"))
      .drop("__b", "__off", "__brn")
  }

  /** Append per-group 1-based rank `rnCol`: each row's rank within its
    * `group` partition ordering by `sortCols` — the scale-safe
    * replacement for `Window.partitionBy(group).orderBy(...)` when
    * groups are FEW and HUGE (five languages over a 100 TB corpus =
    * five single-task sorts; this shape never sorts more than one
    * bucket in one task).
    *
    * Same sketch-bucket design as [[withGlobalRowNumber]]: the GLOBAL
    * cutpoints cut every group's value range contiguously too, so
    * within a group, concatenating its (group, bucket) cells in bucket
    * order is that group's sort order. Local ranks come from windows
    * over (group, bucket) cells (≤ bucket-sized tasks); per-group
    * bucket offsets from a counts aggregate (≤ groups × buckets rows,
    * cluster-sized) prefix-summed per group and broadcast back. */
  def withGroupRowNumber(df: DataFrame, group: Column, rnCol: String,
      sortCols: Column*): DataFrame =
    groupRankedWithCounts(df, group, rnCol, sortCols: _*)._1

  /** Shared internals of [[withGroupRowNumber]]: (ranked rows, the
    * per-(group, bucket) counts aggregate as `(__g, __b, __cnt)`).
    * The counts aggregate is exposed so callers that also need
    * per-group SIZES ([[exactGroupQuantiles]]) derive them as a rollup
    * of this cluster-sized (groups × buckets) aggregate instead of a
    * second full scan of `df` — and because both consumers share the
    * identical aggregate subtree, Catalyst's ReuseExchange serves the
    * second from the first's shuffle files. */
  private def groupRankedWithCounts(df: DataFrame, group: Column, rnCol: String,
      sortCols: Column*): (DataFrame, DataFrame) = {
    val s = df.sparkSession
    val parts = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val buckets = 2 * parts
    val ps = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val lead = sortCols.head
    val cutRows = df.select(
      percentile_approx(lead, array(ps: _*), lit(2000)).as("c"))
      .collect()
    val cuts: Seq[Double] =
      if (cutRows.isEmpty || cutRows(0).isNullAt(0)) Seq.empty
      else cutRows(0).getSeq[Any](0).map(toD)
    val distinctCuts = cuts.distinct.sorted.toIndexedSeq
    val bucketed = df.withColumn("__g", group)
      .withColumn("__b", bucketOf(lead, distinctCuts))
    val counts = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    // per-group prefix sum over ≤ buckets rows each — partitioned by
    // group, so no single-partition window even here
    val offsets = counts
      .withColumn("__off",
        sum(col("__cnt")).over(
          Window.partitionBy(col("__g")).orderBy(col("__b"))) - col("__cnt"))
      .select(col("__g"), col("__b"), col("__off"))
    val wb = Window.partitionBy(col("__g"), col("__b"))
      .orderBy(sortCols.map(_.asc): _*)
    val ranked = bucketed
      .join(broadcast(offsets), Seq("__g", "__b"))
      .withColumn("__brn", row_number().over(wb).cast("long"))
      .withColumn(rnCol, col("__off") + col("__brn"))
      .drop("__g", "__b", "__off", "__brn")
    (ranked, counts)
  }

  /** Append SQL-ntile(k) bucket `tileCol` (1-based) ordering by
    * `sortCols` — exact ntile semantics, zero global sort. Long-exact
    * bucket arithmetic (`DIV`, never float division). */
  def exactNtile(df: DataFrame, k: Int, tileCol: String, sortCols: Column*): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1, got $k")
    val ranked = withGlobalRowNumber(df, "__rn", sortCols: _*)
    // n from a count-star on the input plan (parquet-footer cheap)
    val n = df.count()
    val base = n / k
    val rem = n % k
    val threshold = rem * (base + 1)
    val tile =
      if (base == 0) col("__rn") // n < k: each row its own bucket, rn = tile
      else expr(
        s"""CASE WHEN __rn <= ${threshold}L
           |  THEN (__rn + ${base}L) DIV ${base + 1}L
           |  ELSE ${rem}L + ((__rn - ${threshold}L + ${base - 1}L) DIV ${base}L)
           |END""".stripMargin)
    ranked.withColumn(tileCol, tile).drop("__rn")
  }

  /** Exact per-group continuous quantiles (SQL `quantile_cont` /
    * `percentile` semantics: linear interpolation at position
    * 1 + (n−1)·p) WITHOUT the buffer-based percentile aggregate —
    * Spark's exact `percentile` holds every distinct value of a group
    * in its aggregation buffer, which a 100 TB group turns into an
    * executor OOM. Here each group's two needed row positions per
    * target come from [[withGroupRowNumber]] (sketch-bucketed, no
    * single-task sort, bounded memory everywhere) and one equi-join
    * fetches exactly 2·|targets| rows per group.
    *
    * Returns (group, targetName, value, groupSize) long-form
    * (`__grp`, `__target`, `__q`, `__n`) — `__n` rides along so callers
    * needing COUNT(*) per group (q42) don't re-scan to recount.
    * `tiebreak` only fixes rank positions among EQUAL values —
    * interpolation is unaffected by tie order. */
  def exactGroupQuantiles(df: DataFrame, group: Column, value: Column,
      tiebreak: Column, targets: Seq[(String, Double)]): DataFrame = {
    val base = df.select(group.as("__grp"), value.as("__v"), tiebreak.as("__t"))
    val (ranked, counts) =
      groupRankedWithCounts(base, col("__grp"), "__r", col("__v"), col("__t"))
    // group sizes as a rollup of the (group, bucket) counts the ranking
    // already aggregates — no second scan of `base` (round-4 item 8)
    val sizes = counts.groupBy(col("__g")).agg(sum(col("__cnt")).as("__n"))
      .select(col("__g").as("__grp"), col("__n"))
    // per (group, target): the two bracketing positions + the fraction
    val needs = sizes.select(col("__grp"), col("__n"),
        explode(array(targets.map { case (nm, p) =>
          struct(lit(nm).as("t"), lit(p).as("p"))
        }: _*)).as("tp"))
      .select(col("__grp"), col("__n"), col("tp.t").as("__target"),
        (lit(1.0) + (col("__n") - 1).cast("double") * col("tp.p")).as("__pos"))
      .select(col("__grp"), col("__n"), col("__target"), col("__pos"),
        floor(col("__pos")).cast("long").as("__lo"),
        ceil(col("__pos")).cast("long").as("__hi"))
    val wanted = needs.select(col("__grp"), col("__n"), col("__target"), col("__pos"),
        col("__lo"), col("__hi"), explode(array(col("__lo"), col("__hi"))).as("__r"))
      .distinct()
    wanted.join(ranked.select(col("__grp"), col("__r"), col("__v")), Seq("__grp", "__r"))
      .groupBy(col("__grp"), col("__target"))
      .agg(min(when(col("__r") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__r") === col("__hi"), col("__v"))).as("__vhi"),
        first(col("__pos") - col("__lo")).as("__frac"),
        first(col("__n")).as("__n"))
      .select(col("__grp"), col("__target"),
        (col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo"))).as("__q"),
        col("__n"))
  }

  /** Exact per-group WEIGHTED lower quantiles (type-1): the smallest
    * value whose cumulative weight reaches (num/den)·W — e.g. the
    * weighted median at (1, 2) — computed WITHOUT data-sized window
    * partitions. The missing piece over [[exactGroupQuantiles]] is the
    * cumulative-WEIGHT prefix, which a plain per-group window would
    * serialize into one task per group; here it decomposes exactly like
    * the ranks do: global sketch cutpoints bucket the value axis, each
    * (group, bucket) cell's weight aggregates cluster-sized, per-group
    * bucket offsets prefix-sum over ≤ B rows, and the within-cell
    * prefix runs in a bucket-bounded window. cum(row) = offset + local
    * prefix is exact, so the target test den·cum ≥ num·W is pure
    * integer arithmetic — no FP in the selection at all.
    *
    * Returns long-form (`__grp`, `__target`, `__q`, `__W`). Targets are
    * exact fractions (name, num, den). Weights must be nonnegative
    * integers (cast to long). */
  def weightedGroupQuantiles(df: DataFrame, group: Column, value: Column,
      weight: Column, tiebreak: Column,
      targets: Seq[(String, Int, Int)]): DataFrame = {
    val s = df.sparkSession
    val base = df.select(group.as("__grp"), value.as("__v"),
      weight.cast("long").as("__w"), tiebreak.as("__t"))
    val parts = math.max(1, s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val buckets = 2 * parts
    val ps = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val cutRows = base.select(
      percentile_approx(col("__v"), array(ps: _*), lit(2000)).as("c")).collect()
    val cuts: Seq[Double] =
      if (cutRows.isEmpty || cutRows(0).isNullAt(0)) Seq.empty
      else cutRows(0).getSeq[Any](0).map(toD)
    val distinctCuts = cuts.distinct.sorted.toIndexedSeq
    val bucketed = base.withColumn("__b", bucketOf(col("__v"), distinctCuts))
    val cellW = bucketed.groupBy(col("__grp"), col("__b"))
      .agg(sum(col("__w")).as("__cw"))
    val offs = cellW
      .withColumn("__off", sum(col("__cw"))
        .over(Window.partitionBy(col("__grp")).orderBy(col("__b"))) - col("__cw"))
      .select(col("__grp"), col("__b"), col("__off"))
    val totals = cellW.groupBy(col("__grp")).agg(sum(col("__cw")).as("__wtot"))
    val wb = Window.partitionBy(col("__grp"), col("__b"))
      .orderBy(col("__v").asc, col("__t").asc)
    val cum = bucketed
      .join(broadcast(offs), Seq("__grp", "__b"))
      .withColumn("__cum", col("__off") + sum(col("__w")).over(wb))
    val tg = targets.map { case (nm, num, den) =>
      struct(lit(nm).as("t"), lit(num.toLong).as("num"), lit(den.toLong).as("den"))
    }
    val needs = totals.select(col("__grp"), col("__wtot"),
        explode(array(tg: _*)).as("tp"))
      .select(col("__grp"), col("__wtot"), col("tp.t").as("__target"),
        col("tp.num").as("__num"), col("tp.den").as("__den"))
    cum.join(broadcast(needs), "__grp")
      .filter(col("__cum") * col("__den") >= col("__num") * col("__wtot"))
      .groupBy(col("__grp"), col("__target"))
      .agg(min(struct(col("__v"), col("__t"))).as("__m"),
        first(col("__wtot")).as("__wtot"))
      .select(col("__grp"), col("__target"), col("__m.__v").as("__q"), col("__wtot"))
  }

  /** Bucket id (1-based) of `v` against ascending `cuts` — bucket i is
    * (cuts(i-2), cuts(i-1)]. Built as a BALANCED when/otherwise tree:
    * each row evaluates only its ⌈log₂ B⌉-deep path (a linear
    * first-match chain measured ~2 s at 128 buckets × 150k rows —
    * B comparisons per row; the tree is ~7). */
  private[operators] def bucketOf(v: Column, cuts: IndexedSeq[Double]): Column = {
    // buckets l..r, comparing against cuts(m-1) to split at bucket m
    def tree(l: Int, r: Int): Column =
      if (l == r) lit(l.toLong)
      else {
        val m = (l + r) / 2
        when(v <= lit(cuts(m - 1)), tree(l, m)).otherwise(tree(m + 1, r))
      }
    if (cuts.isEmpty) lit(1L) else tree(1, cuts.size + 1)
  }

  private def toD(a: Any): Double = a match {
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"leading sort column must be numeric, got $other")
  }
}

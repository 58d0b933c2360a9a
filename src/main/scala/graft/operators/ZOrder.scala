package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * A 100 TB table laid out by ONE key prunes scans only on that key;
  * interleaving the bits of two keys and range-partitioning + sorting
  * on the interleaved value gives every output file a tight bounding
  * box in BOTH dimensions, so parquet min/max (footer) statistics can
  * skip files/row-groups for predicates on EITHER key — the standard
  * lakehouse technique (Morton 1966; the same layout Delta/Iceberg
  * expose as OPTIMIZE ZORDER BY). The reference has no layout control
  * at all (records go to a queue, layout is BigQuery's problem —
  * etl-rust README.md:3); an engine that owns storage must own this.
  *
  * Everything is a pure Column expression (shift/and/or — codegen'd,
  * no UDF), and the write is `repartitionByRange(zv) +
  * sortWithinPartitions(zv)`: one range shuffle, the same cost as any
  * global sort-write. ZOrderSpec measures the effect directly: per-file
  * bounding boxes from the written files, fewer files overlapping a
  * single-dimension predicate than a linear layout.
  */
object ZOrder {

  /** Effective per-key bit width: n·bits interleaved bits must stay
    * below 63 so the z value remains a positive long. */
  private def effBits(nKeys: Int, bits: Int): Int = math.min(bits, 62 / nKeys)

  /** Interleave the low `bits` of N non-negative integral columns
    * round-robin: bit i of key j lands at position i·n + (n−1−j), so
    * earlier keys take the more significant slot within each round
    * (n = 2 reproduces the classic 2-key Morton layout bit-for-bit).
    * Inputs beyond `bits` bits saturate into the same top bucket
    * (monotone, so skipping stays correct — stats-based pruning never
    * needs exact z values, only a consistent total order). */
  def zValueN(keys: Seq[Column], bits: Int = 16): Column = {
    require(keys.nonEmpty, "zValueN needs at least one key")
    val n = keys.size
    val eff = effBits(n, bits)
    val cap = (1L << eff) - 1
    val capped = keys.map(c => least(c.cast("long"), lit(cap)))
    (for {
      i <- 0 until eff
      (c, j) <- capped.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j)))
      .reduce(_ + _)
  }

  /** Two-key Morton value (the common case; delegates to [[zValueN]]). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Min-max normalize a column to [0, 2^bits): without this, two keys
    * of different magnitudes degenerate — the wider key's high bits
    * interleave with always-zero bits of the narrow key and the curve
    * collapses to a single-key sort (measured: 11-bit partkey × 7-bit
    * suppkey gave partkey-only files). Double scaling is monotone for
    * keys < 2⁵², which is all stats-based skipping needs. */
  private def normalize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = math.max(1L, hi - lo)
    ((c.cast("double") - lit(lo.toDouble)) * lit(((1L << bits) - 1).toDouble / span))
      .cast("long")
  }

  /** Write `df` z-ordered on N `keys`: normalize every key to the same
    * bit width (one small min/max agg — at 100 TB, use catalog stats),
    * range-partition into `nFiles` buckets of the z curve, sort within
    * each, drop the helper column. Per-file min/max of ALL keys end up
    * tight. */
  def writeZOrderedN(df: DataFrame, keys: Seq[String], path: String,
      nFiles: Int = 8, bits: Int = 16): Unit = {
    require(keys.nonEmpty, "writeZOrderedN needs at least one key")
    val eff = effBits(keys.size, bits)
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).cast("long"), max(col(k)).cast("long")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val normed = keys.zipWithIndex.map { case (k, j) =>
      normalize(col(k), r.getLong(2 * j), r.getLong(2 * j + 1), eff)
    }
    df.withColumn("__z", zValueN(normed, eff))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-key form (delegates to [[writeZOrderedN]]). */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      nFiles: Int = 8, bits: Int = 16): Unit =
    writeZOrderedN(df, Seq(a, b), path, nFiles, bits)

  /** Linear comparison layout: same file count, ordered by `a` alone. */
  def writeLinear(df: DataFrame, a: String, path: String, nFiles: Int = 8): Unit =
    df.repartitionByRange(nFiles, col(a))
      .sortWithinPartitions(col(a))
      .write.mode("overwrite").parquet(path)
}

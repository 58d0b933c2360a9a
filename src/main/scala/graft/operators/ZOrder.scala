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

  /** Interleave the low `bits` of two non-negative integral columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Inputs
    * beyond `bits` bits saturate into the same top bucket (monotone, so
    * skipping stays correct — stats-based pruning never needs exact z
    * values, only a consistent total order). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val cap = (1L << bits) - 1
    val ac = least(a.cast("long"), lit(cap))
    val bc = least(b.cast("long"), lit(cap))
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(ac, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), 2 * i)
      abit + bbit
    }.reduce(_ + _)
  }

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

  /** Write `df` z-ordered on (a, b): normalize both keys to the same
    * bit width (one small min/max agg — at 100 TB, use catalog stats),
    * range-partition into `nFiles` buckets of the z curve, sort within
    * each, drop the helper column. Per-file min/max of BOTH a and b end
    * up tight. */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      nFiles: Int = 8, bits: Int = 16): Unit = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    val z = zValue(
      normalize(col(a), r.getLong(0), r.getLong(1), bits),
      normalize(col(b), r.getLong(2), r.getLong(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Linear comparison layout: same file count, ordered by `a` alone. */
  def writeLinear(df: DataFrame, a: String, path: String, nFiles: Int = 8): Unit =
    df.repartitionByRange(nFiles, col(a))
      .sortWithinPartitions(col(a))
      .write.mode("overwrite").parquet(path)
}

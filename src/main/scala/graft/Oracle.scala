package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make floating-point aggregates byte-identical between Spark
  * and the DuckDB oracle (the driver hash-compares values).
  *
  * Double summation is order-dependent; Spark's partial/final aggregation
  * and DuckDB's single-node sum add in different orders, so raw
  * `sum(double)` can differ in the last ulps and fail a hash compare. The
  * fix: round each row to a fixed decimal grid BEFORE aggregating, then sum
  * exactly in decimal. Source values are money-like (2-dp grid), so the
  * per-row cast is lossless in intent and identical in both engines.
  */
object Oracle {
  /** Exact decimal sum of a (possibly computed) double column, emitted as
    * DOUBLE. The decimal intermediate keeps cross-engine determinism (no
    * order-dependent FP accumulation); the final double is hash-stable —
    * the driver's hash canonicalizes DECIMAL(38,x) differently per engine,
    * so decimal must never appear in an output schema.
    *
    * Magnitude bound: the final cast is exact only while the SCALED sum
    * (|sum| × 10⁶) stays below 2⁵³ (≈ |sum| < 9.0e9). Above that, DuckDB's
    * int128→double→divide conversion can differ by 1 ulp from the JVM's
    * correctly-rounded BigDecimal.doubleValue, and no post-rounding can
    * reconcile a >1-magnitude ulp. All current oracled sums are ≤ 1e9 at
    * sf0.1; queries aggregating beyond that bound must pre-aggregate per
    * group or reduce scale (DECIMAL(30,2)) before the double cast.
    * SQL twin: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast("double")

  /** SQL twin for dsum. */
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE)"

  /** Integer sum emitted as BIGINT on both engines. DuckDB's SUM(BIGINT)
    * returns HUGEINT (int128), which the driver's hash canonicalizes
    * differently from Spark's bigint even at equal values.
    * SQL twin: CAST(SUM(x) AS BIGINT) */
  def lsum(c: Column): Column = sum(c).cast("long")

  /** SQL twin for lsum. */
  def lsumSql(x: String): String = s"CAST(SUM($x) AS BIGINT)"

  /** Average, rounded to 4dp; residual cross-engine FP error is ~1e-9 so a
    * 1e-4 grid makes boundary flips vanishingly unlikely.
    * SQL twin: ROUND(AVG(x), 4) */
  def davg(c: Column): Column = round(avg(c), 4)

  def davgSql(x: String): String = s"ROUND(AVG($x), 4)"
}

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
  /** Exact decimal sum of a (possibly computed) double column.
    * SQL twin: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DECIMAL(38,6)) */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast(DecimalType(38, 6))

  /** SQL twin for dsum. */
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DECIMAL(38,6))"

  /** Average, rounded to 4dp; residual cross-engine FP error is ~1e-9 so a
    * 1e-4 grid makes boundary flips vanishingly unlikely.
    * SQL twin: ROUND(AVG(x), 4) */
  def davg(c: Column): Column = round(avg(c), 4)

  def davgSql(x: String): String = s"ROUND(AVG($x), 4)"
}

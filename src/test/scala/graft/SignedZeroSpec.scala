package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The -0.0 hazard class (VERDICT r6): DuckDB's round() preserves the IEEE
  * sign bit (tiny negative → -0.0) while Spark's BigDecimal-based Round
  * emits +0.0, and the driver's hash distinguishes the two. The fix is
  * structural — [[Oracle.znormSql]] wraps every ROUND in every oracle twin
  * with `+ 0.0` at the SparkEntry.oracleSql boundary. This suite pins the
  * rewriter's semantics and proves the boundary is actually applied, so a
  * future twin added without thinking about signed zero is still covered.
  */
class SignedZeroSpec extends AnyFunSuite {

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("Spark round never emits -0.0; +0.0 normalization collapses -0.0") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq(-1.03e-9, -3.43e-7, -0.0, 0.0, -1e-300)
      .toDF("x")
      .select(round(col("x"), 6).as("r"), Oracle.zround(col("x"), 6).as("z"))
      .collect()
    r.foreach { row =>
      assert(bits(row.getDouble(0)) == 0L, s"round emitted ${row.getDouble(0)}")
      assert(bits(row.getDouble(1)) == 0L)
    }
    // the JVM semantics znorm relies on: IEEE 754 round-to-nearest
    assert(bits(-0.0 + 0.0) == 0L && bits(-0.0) != 0L)
  }

  test("znormSql wraps every round, case-insensitive, word-boundary") {
    assert(Oracle.znormSql("SELECT round(x, 4) AS a") ==
      "SELECT (round(x, 4) + 0.0) AS a")
    assert(Oracle.znormSql("SELECT ROUND(x) FROM t") ==
      "SELECT (ROUND(x) + 0.0) FROM t")
    // word boundary: a column or function merely ending in "round" is untouched
    assert(Oracle.znormSql("SELECT playground(x, 4)") == "SELECT playground(x, 4)")
    // inside string literals parens don't confuse the scanner
    assert(Oracle.znormSql("SELECT round(concat(s, '(((' ), 2)") ==
      "SELECT (round(concat(s, '(((' ), 2) + 0.0)")
    // a "round(" INSIDE a string literal is data, not a call site
    // (ADVICE r7): the outer scan tracks quote state too
    assert(Oracle.znormSql("SELECT 'use round(x) here' AS hint") ==
      "SELECT 'use round(x) here' AS hint")
    assert(Oracle.znormSql(
      "SELECT 'round(a)' AS lit, round(y, 2) AS r") ==
      "SELECT 'round(a)' AS lit, (round(y, 2) + 0.0) AS r")
    // doubled-quote escape keeps literal state balanced
    assert(Oracle.znormSql("SELECT 'it''s round(z)' AS s, round(w) AS r") ==
      "SELECT 'it''s round(z)' AS s, (round(w) + 0.0) AS r")
  }

  test("znormSql normalizes nested rounds inside-out") {
    assert(Oracle.znormSql("round(round(x, 8), 4)") ==
      "(round((round(x, 8) + 0.0), 4) + 0.0)")
  }

  test("znormSql is idempotent (round already followed by + 0.0)") {
    val once = Oracle.znormSql("SELECT round(cov, 6) AS c, round(x,2)+0.0 AS d")
    assert(Oracle.znormSql(once) == once)
    // but `+ 0.01` is NOT a normalization marker
    assert(Oracle.znormSql("round(x, 2) + 0.01") == "(round(x, 2) + 0.0) + 0.01")
  }

  test("every SparkEntry oracle twin is signed-zero normalized") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(Oracle.znormSql(sql) == sql,
        s"$name: oracle SQL has an unnormalized round()")
    }
  }
}

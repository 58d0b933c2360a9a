package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression specs for the two Oracle magnitude contracts tightened in
  * round 11:
  *
  *  - [[Oracle.bigToDouble]] now ENFORCES its documented |x| < 2⁷⁵
  *    precondition (round-10 advice: the long cast alone only detects
  *    |x| ≥ 2⁸⁵, so 2⁷⁵..2⁸⁵ was silently inexact — the 1-ulp wobble
  *    the function exists to remove).
  *  - The q198 overflow class (round-10 sf10 ARITHMETIC_OVERFLOW): a
  *    squared-summand dsum at the default 1e6 grid blows the int64 sum
  *    bound at scale; dsumScaled at a coarser grid is the fix and must
  *    agree with the exact value.
  */
class OracleBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigToDouble is exact below 2^75 (parseDouble is the correctly-rounded ref)") {
    val vals = Seq(
      "12345678901234567890",              // ~2^63.4
      "9007199254740993",                  // 2^53 + 1 (first non-representable)
      "-37778931862957161709567",          // -(2^75 - 1): largest allowed magnitude
      "1208925819614629174706176"          // 2^80 — would be silently inexact pre-guard
    )
    val inRange = vals.filter(v => BigInt(v).abs < BigInt(2).pow(75))
    val got = inRange.toDF("s")
      .select(Oracle.bigToDouble(col("s").cast("decimal(38,0)")).as("d"))
      .collect().map(_.getDouble(0))
    inRange.zip(got).foreach { case (s, d) =>
      assert(d == java.lang.Double.parseDouble(s), s"bigToDouble($s) = $d")
    }
  }

  test("bigToDouble at |x| >= 2^75 raises loudly instead of rounding twice") {
    val big = Seq("37778931862957161709568",   // 2^75 exactly
      "1208925819614629174706176").toDF("s")  // 2^80
    val e = intercept[Exception] {
      big.select(Oracle.bigToDouble(col("s").cast("decimal(38,0)")).as("d")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bigToDouble")), s"unexpected error: $e")
  }

  test("q198 class: dsum overflows int64 loudly at scale; dsumScaled(·,2) is the exact fix") {
    // 2000 rows of 5e12 — per-row scaled value 5e18 fits int64, but the
    // scaled SUM 1e22 does not: ANSI long sum must THROW (the loud
    // detector the sf10 Verify hit on q198), never wrap silently.
    val wide = spark.range(2000).select(lit(5.0e12).as("v"))
    val e = intercept[Exception] { wide.agg(Oracle.dsum(col("v"))).collect() }
    def names(t: Throwable): Seq[String] =
      if (t == null) Nil
      else (t.getClass.getName +: Option(t.getMessage).toSeq) ++ names(t.getCause)
    assert(names(e).exists(s => s.contains("OVERFLOW") || s.contains("overflow")),
      s"expected an overflow error, got: $e")
    // the coarser grid sums exactly: 2000 * 5e12 = 1e16
    val fixed = wide.agg(Oracle.dsumScaled(col("v"), 2).as("s")).head().getDouble(0)
    assert(fixed == 1.0e16)
  }

  test("dsum and dsumScaled agree on in-range money-grid data") {
    val df = spark.range(1, 1001).select((col("id") * 0.25).as("v"))
    val a = df.agg(Oracle.dsum(col("v"))).head().getDouble(0)
    val b = df.agg(Oracle.dsumScaled(col("v"), 2).as("s")).head().getDouble(0)
    assert(a == b && a == 125125.0) // Σ 0.25..250 = 0.25 * 500500
  }
}

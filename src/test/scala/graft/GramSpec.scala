package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The Gram kernel's contract: BIT-identical to the declarative
  * posexplode² + Oracle.dsum pipeline it replaces — same 1e-6
  * half-up grid, same exact integer merge. */
class GramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("secondMoment equals the posexplode + dsum reference bit-for-bit") {
    val fast = graft.operators.Gram.secondMoment(
        spark, Tables.embeddings(spark, dir), "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val slow = Tables.embeddings(spark, dir)
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("i"), col("x"), posexplode(col("embedding")).as(Seq("j", "y")))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j"),
        (col("x").cast("double") * col("y").cast("double")).as("xy"))
      .groupBy(col("i"), col("j")).agg(Oracle.dsum(col("xy")).as("a"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, v) =>
      assert(v == slow(k), s"cell $k: $v vs ${slow(k)}") // exact, not approx
    }
  }

  test("grid6 is BigDecimal HALF_UP at 1e-6 for positive, negative, and half values") {
    val cases = Seq(0.1234565, -0.1234565, 0.0000005, -0.0000005,
      1.9999995, -1.9999995, 0.0, 0.123456449, -0.123456449)
    cases.foreach { v =>
      val want = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.movePointRight(6).longValueExact()
      assert(graft.operators.Gram.grid6(v) == want, s"v=$v")
    }
  }
}

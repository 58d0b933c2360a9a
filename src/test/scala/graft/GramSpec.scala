package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The Gram kernel's contract: BIT-identical to the declarative
  * posexplode² + Oracle.dsum pipeline it replaces — same 1e-6
  * nearest-even rint grid, same exact integer merge. */
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

  test("grid6 is Math.rint of the scaled double (dsum's micro-grid), -0.0 absorbed") {
    val cases = Seq(0.1234565, -0.1234565, 0.0000005, -0.0000005,
      1.9999995, -1.9999995, 0.0, -0.0, 0.123456449, -0.123456449,
      // exact dyadic ties where rint's nearest-even rule is visible:
      // 2.5e-6·2^k forms and the exact .5 scaled cases
      0.0000025, -0.0000025, 1.0000005, 123.4567895)
    cases.foreach { v =>
      val want = Math.rint(v * 1e6).toLong
      assert(graft.operators.Gram.grid6(v) == want, s"v=$v")
    }
    // -0.0 collapses to 0L (the BIGINT cast both engines apply)
    assert(graft.operators.Gram.grid6(-0.0) == 0L)
    assert(java.lang.Long.compare(graft.operators.Gram.grid6(-0.0000001), 0L) == 0)
  }
}

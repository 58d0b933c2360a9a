package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Stress.replicate invariants: linear cardinality scaling, preserved
  * referential integrity, closed dimension domains, byte-identical
  * payload distributions across copies.
  */
class StressSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-stress").toString
    Stress.replicate(spark, TestSpark.sfDir, d, factor = 3)
    d
  }

  test("replicated tables scale 3x; closed dimensions pass through") {
    for (t <- Seq("orders", "lineitem", "customer", "events", "documents", "embeddings")) {
      val src = Tables.load(spark, TestSpark.sfDir, t).count()
      val out = Tables.load(spark, outDir, t).count()
      assert(out == 3 * src, s"$t: expected ${3 * src}, got $out")
    }
    for (t <- Seq("region", "nation")) {
      assert(Tables.load(spark, outDir, t).count() ==
             Tables.load(spark, TestSpark.sfDir, t).count(), t)
    }
  }

  test("keys stay unique and referential integrity holds per copy") {
    val cust = Tables.load(spark, outDir, "customer")
    assert(cust.select("c_custkey").distinct().count() == cust.count())
    val orphans = Tables.load(spark, outDir, "orders")
      .join(cust, $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(orphans == 0L, s"$orphans orders reference a missing customer")
    // per-key densities preserved: max orders per customer unchanged
    def maxPerCust(dir: String) = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(maxPerCust(outDir) == maxPerCust(TestSpark.sfDir))
  }

  test("events→customer FK is copy-consistent, not just range-contained (q141)") {
    // user_id strides by the CUSTOMER domain, so copy k's events must hit
    // copy k's customers — i.e. the matched customer's payload equals the
    // payload of the copy-0 customer at (user_id mod stride). A mere
    // range-subset mapping (the pre-fix behavior) still yields a 100%
    // join match rate but fails this payload check.
    val custStride = Tables.load(spark, TestSpark.sfDir, "customer")
      .agg(max($"c_custkey")).head().getLong(0) + 1L
    val srcCust = Tables.load(spark, TestSpark.sfDir, "customer")
      .select($"c_custkey".as("base_key"), $"c_name".as("base_name"))
    val mismatched = Tables.load(spark, outDir, "events")
      .join(Tables.load(spark, outDir, "customer"), $"user_id" === $"c_custkey")
      .withColumn("base_key", $"user_id" % custStride)
      .join(srcCust, "base_key")
      .filter($"c_name" =!= $"base_name").count()
    assert(mismatched == 0L, s"$mismatched events matched a wrong-copy customer")
    def matchedEvents(dir: String) = Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer"), $"user_id" === $"c_custkey").count()
    assert(matchedEvents(outDir) == 3 * matchedEvents(TestSpark.sfDir))
  }

  test("payloads are byte-identical across copies") {
    // distinct texts unchanged => each copy carries the same corpus
    assert(Tables.load(spark, outDir, "documents").select("text").distinct().count() ==
           Tables.load(spark, TestSpark.sfDir, "documents").select("text").distinct().count())
    // distinct user count scales 3x (re-keyed users, identical session shapes)
    assert(Tables.load(spark, outDir, "events").select("user_id").distinct().count() ==
           3 * Tables.load(spark, TestSpark.sfDir, "events").select("user_id").distinct().count())
  }
}

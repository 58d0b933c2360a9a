package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The z-order layout claim, measured rather than asserted: after a
  * Morton-curve write, per-file bounding boxes are tight in BOTH key
  * dimensions, so a predicate on the NON-leading dimension overlaps
  * strictly fewer files than under a linear single-key layout (where
  * every file spans the second key's full range). Overlap-by-footer-
  * stats is exactly the skipping decision parquet readers make. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: l_partkey 0..1999, l_suppkey 0..99 — enough key space for
  // the curve to matter (sf0.001's 10 suppliers degenerate)
  private val dir = "/root/testdata/sf0.01"

  private def fileBoxes(path: String): Seq[(Long, Long, Long, Long)] = {
    val files = Option(new java.io.File(path).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("z-order layout skips more files than linear for a second-dimension predicate") {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey", "l_quantity")
    val zDir = Files.createTempDirectory("zorder").toString
    val lDir = Files.createTempDirectory("linear").toString
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, nFiles = 16, bits = 11)
    ZOrder.writeLinear(li, "l_partkey", lDir, nFiles = 16)

    // predicate on the SECOND key only: l_suppkey in [0, 24] (a quarter)
    def overlapping(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, slo, shi) => slo <= 24 && shi >= 0 }

    val zBoxes = fileBoxes(zDir)
    val lBoxes = fileBoxes(lDir)
    assert(zBoxes.size === 16 && lBoxes.size === 16)
    // linear-on-partkey files each span ~the full suppkey range: no skipping
    assert(overlapping(lBoxes) === 16, s"linear layout unexpectedly skips: $lBoxes")
    // the z curve confines the suppkey quarter to a strict subset of
    // files. The exact count is sampling-dependent: repartitionByRange
    // draws its boundaries with an RDD-id-seeded sampler, so the number
    // of boundary-straddling files (whose boxes go wide) shifts by ±1-2
    // with the session's prior job count — assert the skipping margin,
    // not a knife-edge layout (measured 8-9 of 16 across orderings vs
    // linear's 16/16)
    assert(overlapping(zBoxes) <= 10,
      s"z-order should confine suppkey<=24 to <=10/16 files, boxes: $zBoxes")

    // layout must not change content: both layouts aggregate identically
    val zAgg = spark.read.parquet(zDir).filter(col("l_suppkey") <= 24)
      .agg(count(lit(1)), sum("l_partkey")).head()
    val lAgg = spark.read.parquet(lDir).filter(col("l_suppkey") <= 24)
      .agg(count(lit(1)), sum("l_partkey")).head()
    assert(zAgg === lAgg)

    Seq(zDir, lDir).foreach { d =>
      val root = java.nio.file.Paths.get(d)
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("3-key z-order: every dimension's predicate skips files; 2-key path unchanged") {
    import spark.implicits._
    // three independent 0..63 keys (seeded, so the spec is stable) —
    // each should end up with tight per-file boxes under the 3-way curve
    val rnd = new scala.util.Random(42)
    val rows = for (_ <- 0 until 20000) yield
      (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong, rnd.nextInt(64).toLong)
    val df = rows.toDF("x", "y", "z3")
    val dir3 = Files.createTempDirectory("zorder3").toString
    ZOrder.writeZOrderedN(df, Seq("x", "y", "z3"), dir3, nFiles = 16, bits = 8)
    val files = Option(new java.io.File(dir3).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val boxes = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min("x"), max("x"), min("y"), max("y"), min("z3"), max("z3")).head()
      (0 until 6).map(r.getLong)
    }
    // a one-quarter predicate on EACH dimension must overlap a strict
    // subset of files (a single-key sort gives full-range boxes for the
    // two non-leading keys)
    for (d <- 0 until 3) {
      val hit = boxes.count(b => b(2 * d) <= 15 && b(2 * d + 1) >= 0)
      assert(hit <= 12, s"dim $d: quarter-range predicate overlaps $hit/16 files")
    }
    // content is layout-invariant
    assert(spark.read.parquet(dir3).count() === 20000L)
    graft.Staging.deleteRecursively(dir3)

    // delegation keeps the 2-key bit layout: zValue == zValueN(Seq(a,b))
    val two = Seq((3L, 5L), (1000L, 1L)).toDF("a", "b").select(
      ZOrder.zValue(col("a"), col("b"), 11).as("z2"),
      ZOrder.zValueN(Seq(col("a"), col("b")), 11).as("zn"))
      .collect()
    two.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("zValue is monotone within each dimension (skipping-safe order)") {
    import spark.implicits._
    val df = Seq((3L, 5L), (3L, 6L), (4L, 5L), (1000L, 1L), (1L, 1000L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 11).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // growing one coordinate with the other fixed never decreases z
    assert(df((3L, 6L)) > df((3L, 5L)))
    assert(df((4L, 5L)) > df((3L, 5L)))
    // interleave: a's bit of each pair is the higher one, so equal
    // magnitudes order by a first
    assert(df((1000L, 1L)) > df((1L, 1000L)))
  }
}

package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  private def rmrf(d: String): Unit = {
    val root = java.nio.file.Paths.get(d)
    java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("compaction collapses a fragmented directory losslessly, sized by bytes") {
    val frag = Files.createTempDirectory("frag").toString
    val compacted = Files.createTempDirectory("compacted").toString
    // simulate the one-file-per-micro-batch shape: 64 splinter files
    Tables.lineitem(spark, TestSpark.sfDir).repartition(64).write
      .mode("overwrite").parquet(frag)
    assert(parquetFiles(frag).size === 64)

    val total = Compaction.dataBytes(spark, frag)
    assert(total > 0)
    val target = total / 4 // aim for ~4 files
    val n = Compaction.compact(spark, frag, compacted, target)
    val outFiles = parquetFiles(compacted)
    // coalesce caps at the scan's partition count, so the contract is
    // "at most the byte-derived target, far below the input fragment count"
    assert(outFiles.size <= n && outFiles.nonEmpty && outFiles.size <= 6,
      s"got ${outFiles.size} files (n=$n)")

    // lossless: same rows, same content aggregate
    val a = spark.read.parquet(frag).agg(count(lit(1)), sum("l_orderkey")).head()
    val b = spark.read.parquet(compacted).agg(count(lit(1)), sum("l_orderkey")).head()
    assert(a === b)
    rmrf(frag); rmrf(compacted)
  }

  test("compactSorted right-sizes AND clusters: disjoint per-file key ranges") {
    val frag = Files.createTempDirectory("frag2").toString
    val sorted = Files.createTempDirectory("sorted").toString
    Tables.orders(spark, TestSpark.sfDir).repartition(32).write
      .mode("overwrite").parquet(frag)
    val n = Compaction.compactSorted(spark, frag, sorted, "o_orderkey",
      Compaction.dataBytes(spark, frag) / 4)
    val boxes = parquetFiles(sorted).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(boxes.size === n)
    // clustered output: file key ranges must not overlap
    boxes.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $boxes")
      case _ => ()
    }
    val a = spark.read.parquet(frag).count()
    val b = spark.read.parquet(sorted).count()
    assert(a === b)
    rmrf(frag); rmrf(sorted)
  }
}

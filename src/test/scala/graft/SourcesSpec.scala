package graft

import graft.sources.BlockSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("S1 blockRange: one row per index, deterministic nested txs") {
    val df = BlockSources.blockRange(spark, 10, 60)
    assert(df.count() === 50)
    assert(df.columns.toSeq === Seq("block_number", "block_time", "txs"))
    // deterministic: same range twice gives identical content
    val a = df.select(col("block_number"), to_json(col("txs"))).collect().map(_.toString).sorted
    val b = BlockSources.blockRange(spark, 10, 60)
      .select(col("block_number"), to_json(col("txs"))).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // fan-out arity matches the generator's formula
    val row = df.filter(col("block_number") === 13).select(size(col("txs"))).head()
    assert(row.getInt(0) === ((13L * 2654435761L) % 97 % 7).toInt)
  }

  test("S1 blockRange: reverse iterates high-to-low") {
    val first = BlockSources.blockRange(spark, 0, 10, reverse = true)
      .select("block_number").head().getLong(0)
    assert(first === 9)
  }

  test("S2 blockListCsv: header sniffed and dropped when non-numeric") {
    val dir = Files.createTempDirectory("blocklist")
    val f = dir.resolve("list.csv")
    Files.writeString(f, "start,end\n5,6\n7,8\n")
    val got = BlockSources.blockListCsv(spark, f.toString)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(5L, 6L, 7L, 8L))
  }

  test("S2 blockListCsv: all-numeric first line is data, all fields flattened") {
    val dir = Files.createTempDirectory("blocklist2")
    val f = dir.resolve("list.csv")
    Files.writeString(f, "1,2\n3,4\n")
    val got = BlockSources.blockListCsv(spark, f.toString)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}

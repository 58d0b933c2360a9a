package graft

import graft.queries.TokenizerQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q98 BPE training, verified against a canonical in-memory reference:
  * collect the (tiny, vocabulary-sized) word-frequency table, run
  * textbook BPE on it in plain Scala — sliding-window pair counts,
  * leftmost-first simultaneous merge — and require the distributed
  * relational plan to pick the exact same merge sequence with the same
  * support counts. This is independent of the DuckDB oracle (which
  * proves Spark==DuckDB; this proves both == the algorithm). */
class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def referenceBpe(words: Seq[(String, Long)], rounds: Int)
      : Seq[(String, String, Long)] = {
    var ws: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, f) <- ws; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      val ((a, b), c) =
        counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      ws = ws.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
      (a, b, c)
    }
  }

  test("q98 equals canonical BPE: same merge pairs, same support, same order") {
    val vocab = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = referenceBpe(vocab, 4)
    val got = TokenizerQueries.q98BpeMerges(spark, dir)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got === expected)
  }

  test("q98: merge counts are non-increasing in rank order") {
    // round k's winner is the global argmax of a table whose pair
    // counts only shrink as merges apply (a new pair (x, ab) inherits
    // at most cnt_k occurrences), so later ranks cannot gain support
    val counts = TokenizerQueries.q98BpeMerges(spark, dir)
      .orderBy(col("merge_rank")).collect().map(_.getAs[Long]("pair_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.toSeq)
  }
}

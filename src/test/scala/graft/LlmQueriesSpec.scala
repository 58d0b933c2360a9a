package graft

import graft.functions.TextFunctions.tokensOf
import graft.queries.LlmQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pruning-invariance proof for q21's frequent-shingle guard: dropping
  * high-document-frequency shingles from CANDIDATE GENERATION must not
  * change the emitted pairs, because verification recounts intersections
  * against the full inverted index. The cap must demonstrably prune on
  * this data (otherwise the test proves nothing). */
class LlmQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Shingle document frequencies recomputed independently of the
    * (private) production pass — same tokenization, trigram shingles. */
  private lazy val dfCounts: Map[Long, Long] = {
    val n = size(col("toks"))
    Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), tokensOf(col("text")).as("toks"))
      .filter(n >= 3)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), n - 2).as("t0"),
        slice(col("toks"), lit(2), n - 2).as("t1"),
        slice(col("toks"), lit(3), n - 2).as("t2"))).as("tg"))
      .select(col("doc_id"),
        xxhash64(col("tg.t0"), col("tg.t1"), col("tg.t2")).as("hg"))
      .distinct()
      .groupBy(col("hg")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cap=4 demonstrably prunes shingles at sf0.001") {
    val pruned = dfCounts.count(_._2 > 4)
    assert(pruned > 0, s"cap=4 prunes nothing (max df = ${dfCounts.values.max})")
  }

  test("pruned candidate generation emits exactly the unpruned pairs") {
    val unpruned = LlmQueries.q21PrunedNgramJaccard(spark, TestSpark.sfDir, Int.MaxValue)
      .collect().toSeq
    val pruned = LlmQueries.q21PrunedNgramJaccard(spark, TestSpark.sfDir, 4)
      .collect().toSeq
    assert(unpruned.nonEmpty, "no near-dup pairs at sf0.001 — invariance vacuous")
    assert(pruned == unpruned)
  }

  test("q129 chunking: stride geometry and token conservation per doc") {
    val chunks = LlmQueries.q129DocChunking(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .selectExpr("doc_id", "size(split(lower(text), ' ')) AS n").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.filter(_._2 >= 1).keySet)
    for ((doc, cs) <- byDoc) {
      val n = docs(doc)
      assert(cs.map(_._2).sorted.toSeq == (0L until cs.length).toSeq)
      for ((_, cid, ntok, text) <- cs) {
        assert(ntok == math.min(64L, n - 48L * cid))     // window clamps at the tail
        assert(text.count(_ == ' ') + 1 == ntok || (ntok == 0))
      }
      assert(cs.length == ((n - 1) / 48) + 1)            // stride covers every token
    }
  }

  test("q114 prefix-filter emits exactly the LSH generator's pairs (q20)") {
    // three independent candidate generators, one semantics: the
    // prefix-filtered join must find the same exact-Jaccard pairs the
    // banded-MinHash path finds
    val viaPrefix = LlmQueries.q114PrefixJoin(spark, TestSpark.sfDir).collect().toSeq
    val viaLsh = LlmQueries.q20DedupMinhash(spark, TestSpark.sfDir).collect().toSeq
    assert(viaLsh.nonEmpty, "no near-dup pairs at sf0.001 — equality vacuous")
    assert(viaPrefix == viaLsh)
  }

  test("cap=0 suppresses all candidates (the cap is live)") {
    assert(LlmQueries.q21PrunedNgramJaccard(spark, TestSpark.sfDir, 0).count() == 0)
  }
}

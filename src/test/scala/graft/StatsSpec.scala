package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.StatsQueries

/** Round-6 corpus-statistics / data-quality tier. */
class StatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q183 Zipf slope matches a local OLS on log rank/freq; TTR in (0,1]") {
    val got = StatsQueries.q183ZipfTtr(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (_, slope, ttr) =>
      assert(slope < 0, s"Zipf slope should be negative, got $slope")
      assert(ttr > 0 && ttr <= 1)
    }
    // local recompute for one source
    val src = got.keys.min
    val freqs = Tables.documents(spark, dir).filter(col("source") === src)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(200)
    val xy = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.log(i + 1.0), math.log(f.toDouble))
    }
    val n = xy.length
    // dsum's micro-grid: nearest-even rint of the scaled double
    def d6(x: Double) = BigDecimal(
      java.math.BigDecimal.valueOf(Math.rint(x * 1e6).toLong, 6))
    val sx = xy.map(p => d6(p._1)).sum.toDouble
    val sy = xy.map(p => d6(p._2)).sum.toDouble
    val sxy = xy.map(p => d6(p._1 * p._2)).sum.toDouble
    val sxx = xy.map(p => d6(p._1 * p._1)).sum.toDouble
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got(src)._2 - want) < 1e-5, s"got ${got(src)._2} want $want")
  }

  test("q184 dispersion equals the exact integer moment formula") {
    val rows = StatsQueries.q184Burstiness(spark, dir).collect()
    assert(rows.nonEmpty)
    val nd = Tables.documents(spark, dir).count()
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t", "doc_id").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byTerm = perDoc.groupBy(_._1)
    rows.foreach { r =>
      val (term, total, nDocs, disp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val cs = byTerm(term).map(_._2)
      assert(cs.sum == total && cs.length == nDocs)
      val s = cs.sum; val ss = cs.map(c => c * c).sum
      val want = (nd * ss - s * s).toDouble / (nd * s).toDouble
      assert(math.abs(disp - want) < 1e-6, s"$term: $disp vs $want")
      assert(disp > 0)
    }
  }

  test("q185 RAKE phrases are stopword-free, multi-word, and score-ordered") {
    val rows = StatsQueries.q185RakeKeywords(spark, dir).collect()
    assert(rows.length == 15)
    val stops = StatsQueries.rakeStopwords.toSet
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length >= 2)
      assert(words.forall(w => !stops(w)), s"stopword inside ${r.getString(0)}")
      assert(r.getLong(1) >= 1)
    }
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q188 Benford shares sum to 1 and cover only digits 1-9") {
    val rows = StatsQueries.q188Benford(spark, dir).collect()
    assert(rows.map(_.getInt(0)).forall(d => d >= 1 && d <= 9))
    val obs = rows.map(_.getDouble(2)).sum
    assert(math.abs(obs - 1.0) < 1e-4)
    val expTot = rows.map(_.getDouble(3)).sum
    // full digit coverage at this sf: expected shares also sum to ~1
    if (rows.length == 9) assert(math.abs(expTot - 1.0) < 1e-4)
    rows.foreach(r => assert(r.getDouble(4) >= 0))
  }

  test("q189 true FD has zero violations; g1 errors are consistent fractions") {
    val rows = StatsQueries.q189FdDiscovery(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (_, viol, g1) = rows("nation.n_nationkey->n_regionkey")
    assert(viol == 0 && g1 == 0.0)
    rows.values.foreach { case (groups, v, e) =>
      assert(v <= groups)
      assert(e >= 0 && e < 1)
      // zero violating groups iff zero g1 error
      assert((v == 0) == (e == 0.0))
    }
  }

  test("q190 RFM cells partition the customer base; scores span 1..5") {
    val rows = StatsQueries.q190RfmSegments(spark, dir).collect()
    val custs = Tables.orders(spark, dir).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == custs)
    def sc(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    rows.foreach { r =>
      (0 to 2).foreach(i => assert(sc(r, i) >= 1 && sc(r, i) <= 5))
      assert(r.getDouble(4) > 0)
    }
    // each score dimension individually covers ~quintiles: every value
    // 1..5 appears somewhere
    (0 to 2).foreach { i =>
      assert(rows.map(sc(_, i)).toSet == Set(1L, 2L, 3L, 4L, 5L), s"dim $i")
    }
  }

  test("q218 entropy: zero for constant text, exactly log2(k) for uniform") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ent218").toString
    Seq((0L, "a" * 64, "en", "s", 64L), // constant -> H = 0, garbage
        (1L, "abcdefghijklmnop" * 4, "en", "s", 64L)) // 16 uniform -> H = 4
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val r = graft.queries.StatsQueries.q218CharEntropy(spark, tmp)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4))).toMap
    assert(r(0L) == ((64L, 1L, 0.0, true)))
    assert(r(1L) == ((64L, 16L, 4.0, false)))
    // fixture sanity: natural-ish synthetic text clears the garbage bar
    val fix = graft.queries.StatsQueries.q218CharEntropy(spark, dir).collect()
    assert(fix.nonEmpty && fix.forall(x => !x.getBoolean(4)))
  }

  test("q221 TextRank: stopword-free descending ranks over the word graph") {
    val rows = graft.queries.StatsQueries.q221TextRank(spark, dir).collect()
    assert(rows.nonEmpty)
    val stops = graft.queries.StatsQueries.rakeStopwords.toSet
    rows.foreach { r =>
      assert(!stops.contains(r.getString(0)) && r.getString(0).nonEmpty)
      assert(r.getDouble(1) > 0.0)
    }
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }
}

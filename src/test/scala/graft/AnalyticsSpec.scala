package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** Round-6 analytics tier (q191–q200). */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q191 MI is nonnegative and matches a local recompute for the segment feature") {
    val rows = AnalyticsQueries.q191MutualInfo(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    rows.values.foreach(mi => assert(mi >= -1e-6, s"$rows"))
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus")).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val cx = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cy = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // dsum's micro-grid: nearest-even rint of the scaled double (NOT
    // BigDecimal HALF_UP — that was the old decimal-cast grid)
    def d6(x: Double) = BigDecimal(
      java.math.BigDecimal.valueOf(Math.rint(x * 1e6).toLong, 6))
    val want = cells.map { case (x, y, c) =>
      d6((c / n) * math.log(n * c / (cx(x).toDouble * cy(y).toDouble)))
    }.sum.toDouble
    assert(math.abs(rows("segment") - want) < 1e-5,
      s"got ${rows("segment")} want $want")
  }

  test("q192 phrases are trigrams with occurrences >= docs >= 1") {
    val rows = AnalyticsQueries.q192PhraseSearch(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getString(0).split(" ").length == 3)
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(1) >= 1)
    }
  }

  test("q193 SAX words are 6 letters over {a,b,c,d} and never constant") {
    val rows = AnalyticsQueries.q193Sax(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val w = r.getString(1)
      assert(w.length == 6 && w.forall("abcd".contains(_)), w)
      // z-scores over a z-normalized series sum to 0 -> at least one
      // letter on each side of the median breakpoint
      assert(w.exists(c => c == 'a' || c == 'b') &&
        w.exists(c => c == 'c' || c == 'd'), w)
    }
  }

  test("q194 replays a local power iteration on identical grids; unit-norm result") {
    val rows = AnalyticsQueries.q194PowerIteration(spark, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 64)
    val lam = rows.head._3
    assert(lam > 0)
    val nrm = math.sqrt(rows.map(r => r._2 * r._2).sum)
    assert(math.abs(nrm - 1.0) < 1e-6, s"norm $nrm")
    // local replay with the same dsum(6dp)/round9 grids
    val embs = Tables.embeddings(spark, dir)
      .collect().map(_.getSeq[Float](1).toArray)
    // dsum's micro-grid: nearest-even rint of the scaled double (NOT
    // BigDecimal HALF_UP — that was the old decimal-cast grid)
    def d6(x: Double) = BigDecimal(
      java.math.BigDecimal.valueOf(Math.rint(x * 1e6).toLong, 6))
    val a = Array.tabulate(64, 64) { (i, j) =>
      embs.map(e => d6(e(i).toDouble * e(j).toDouble)).sum.toDouble
    }
    var v = Array.fill(64)(0.125)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 to 5).foreach { _ =>
      val u = Array.tabulate(64)(i =>
        (0 until 64).map(j => d6(a(i)(j) * v(j))).sum.toDouble)
      val nn = math.sqrt(u.map(x => d6(x * x)).sum.toDouble)
      v = u.map(x => r9(x / nn))
    }
    rows.foreach { case (d, loading, _) =>
      assert(math.abs(loading - v(d)) < 1e-8, s"dim $d: $loading vs ${v(d)}")
    }
  }

  test("q195 arms partition users and the CI brackets the observed uplift") {
    val rows = AnalyticsQueries.q195AbTest(spark, dir).collect()
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    rows.foreach { r =>
      val (xa, na, xb, nb) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(na + nb == users)
      assert(xa <= na && xb <= nb)
      val uplift = xa.toDouble / na - xb.toDouble / nb
      assert(r.getDouble(6) <= uplift + 1e-9 && uplift <= r.getDouble(7) + 1e-9)
    }
  }

  test("q196 survival starts at full risk and is nonincreasing in [0,1]") {
    val rows = AnalyticsQueries.q196KaplanMeier(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.head.getLong(1) == users)
    val surv = rows.map(_.getDouble(3))
    surv.foreach(sv => assert(sv >= 0 && sv <= 1))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("q197 Gini matches a local sorted-rank recompute per segment") {
    val got = AnalyticsQueries.q197Gini(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("mon"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("mon"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    spend.groupBy(_._1).foreach { case (seg, rowsSeg) =>
      val xs = rowsSeg.sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length
      val srx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
      val sx = xs.map(BigInt(_)).sum
      val g = 2.0 * srx.toDouble / (n.toDouble * sx.toDouble) - (n + 1.0) / n
      val (gn, gg) = got(seg)
      assert(gn == n)
      assert(math.abs(gg - g) < 1e-6, s"$seg: $gg vs $g")
      assert(gg >= 0 && gg < 1)
    }
  }

  test("q198 winsorized stats are clamped and tighter than raw") {
    val rows = AnalyticsQueries.q198Winsorized(spark, dir).collect()
    assert(rows.length == 5)
    val raw = Tables.events(spark, dir)
      .selectExpr("event_type", "cast(round(value*100) as long) vc")
      .groupBy("event_type").agg(stddev_pop(col("vc")).as("sd"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (lo, hi, m, sd) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= m && m <= hi)
      assert(sd <= raw(r.getString(0)) + 1e-6)
    }
  }

  test("q199 bootstrap is rerun-identical with a consistent CI") {
    val a = AnalyticsQueries.q199Bootstrap(spark, dir).collect().head
    val b = AnalyticsQueries.q199Bootstrap(spark, dir).collect().head
    assert(a == b) // pure function of the data - the re-derivability claim
    assert(a.getLong(4) == 100)
    val (point, lo, hi) = (a.getDouble(0), a.getDouble(1), a.getDouble(2))
    assert(lo < hi)
    // the point estimate sits inside the 95% band on any sane sample
    assert(lo <= point && point <= hi)
    assert(a.getDouble(3) > 0)
  }

  test("q211 isotonic fit is monotone, mean-preserving, and equals sequential PAVA") {
    val rows = AnalyticsQueries.q211IsotonicCalibration(spark, dir)
      .collect().sortBy(_.getLong(0))
    val iso = rows.map(_.getDouble(3))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-9 }, "not monotone")
    // PAVA preserves the weighted mean
    val wSum = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    val posSum = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(wSum - posSum) < 0.05, s"$wSum vs $posSum")
    // sequential pool-adjacent-violators recompute
    case class Block(var num: Double, var den: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      blocks += Block(r.getDouble(2) * r.getLong(1), r.getLong(1))
      while (blocks.length > 1 && {
        val a = blocks(blocks.length - 2); val b = blocks.last
        a.num / a.den >= b.num / b.den
      }) {
        val b = blocks.remove(blocks.length - 1)
        blocks.last.num += b.num; blocks.last.den += b.den
      }
    }
    val pava = blocks.flatMap(b => Seq.fill(b.den.toInt)(b.num / b.den))
    // expand per-bin (den counts are row weights) — map back per bin
    var idx = 0
    rows.foreach { r =>
      val fit = pava(idx); idx += r.getLong(1).toInt
      assert(math.abs(r.getDouble(3) - fit) < 2e-6,
        s"bin ${r.getLong(0)}: ${r.getDouble(3)} vs $fit")
    }
  }

  test("q212 conformal interval has near-nominal coverage on the test split") {
    val r = AnalyticsQueries.q212ConformalInterval(spark, dir).collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(2) > 0)
    // split-conformal guarantees coverage >= 0.9 in expectation; allow
    // sampling noise at spec scale
    val cov = r.getDouble(3)
    assert(cov > 0.85 && cov <= 1.0, s"coverage $cov")
  }

  test("q213 KL novelty is nonnegative (Gibbs) and matches a local recompute") {
    val got = AnalyticsQueries.q213KlNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.values.foreach(kl => assert(kl >= -1e-6))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = toks.groupBy(_._2).view.mapValues(_.length).toMap
    val nTot = toks.length.toDouble
    // dsum's micro-grid: nearest-even rint of the scaled double (NOT
    // BigDecimal HALF_UP — that was the old decimal-cast grid)
    def d6(x: Double) = BigDecimal(
      java.math.BigDecimal.valueOf(Math.rint(x * 1e6).toLong, 6))
    toks.filter(_._1 < 200).groupBy(_._1).foreach { case (doc, ts) =>
      val len = ts.length.toDouble
      val kl = ts.groupBy(_._2).map { case (t, os) =>
        val c = os.length
        d6((c / len) * math.log(c * nTot / (len * corpus(t))))
      }.sum.toDouble
      assert(math.abs(got(doc) - kl) < 1e-5, s"doc $doc: ${got(doc)} vs $kl")
    }
  }

  test("q200 obeys the Hill-number ordering: inv-Simpson <= eff-vocab <= types") {
    val rows = AnalyticsQueries.q200Diversity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, h, eff, inv) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= 0)
      assert(inv <= eff + 1e-4, s"$r")
      assert(eff <= types + 1e-4, s"$r")
      assert(inv >= 1.0)
    }
  }
}

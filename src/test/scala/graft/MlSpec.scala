package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.MlQueries

/** Round-6 ML tier. The synthetic labels are noise relative to the
  * embeddings/orders (models land at chance level by design), so these
  * specs pin STRUCTURE and exact local recomputes, not model quality.
  */
class MlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q177 confusion matrix partitions every scored document") {
    val cm = MlQueries.q177NaiveBayes(spark, dir).collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    cm.foreach { r =>
      assert(langs(r.getString(0)) && langs(r.getString(1)))
      assert(r.getLong(2) > 0)
    }
    // every doc with >=1 token classified exactly once
    val scoredDocs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0).count()
    assert(cm.map(_.getLong(2)).sum == scoredDocs)
  }

  test("q178 best price split matches a brute-force local gain sweep") {
    val got = MlQueries.q178SplitGain(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .selectExpr("CAST(o_orderstatus = 'F' AS INT) AS y",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2500000 AS pbin")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def xlnx(x: Long): Double = if (x > 0) x * math.log(x.toDouble) else 0.0
    def phi(a: Long, b: Long): Double = xlnx(a + b) - xlnx(a) - xlnx(b)
    val n = rows.length
    val t1 = rows.map(_._1.toLong).sum; val t0 = n - t1
    val bins = rows.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._1.toLong).sum, rs.length.toLong)).toSeq
      .sortBy(_._1)
    var l1 = 0L; var l0 = 0L
    val gains = bins.dropRight(1).map { case (bin, (c1, cn)) =>
      l1 += c1; l0 += cn - c1
      (bin, BigDecimal((phi(t1, t0) - phi(l1, l0) - phi(t1 - l1, t0 - l0)) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val best = gains.maxBy(g => (g._2, -g._1))
    val (gBin, _, _, gGain) = {
      val g = got("price_bin"); (g._1, g._2, g._3, g._4)
    }
    assert(gBin == best._1 && math.abs(gGain - best._2) < 1e-9,
      s"got ($gBin, $gGain) want $best")
  }

  test("q179 agrees with a local brute-force 5-NN majority vote") {
    val got = MlQueries.q179KnnClassifier(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val e = Tables.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val nrm = e.map(v => v._1 -> math.sqrt(dot(v._2, v._2))).toMap
    e.filter(_._1 < 500).foreach { case (q, qe, _) =>
      val top5 = e.filter(_._1 != q)
        .map { case (c, ce, cl) =>
          val sim = BigDecimal(dot(qe, ce) / (nrm(q) * nrm(c)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (sim, c, cl)
        }
        .sortBy(t => (-t._1, t._2)).take(5)
      val want = top5.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy(t => (-t._2, t._1)).head._1
      assert(got(q) == want, s"query $q: got ${got(q)} want $want")
    }
  }

  test("q180 PR curve is internally consistent (counts, monotone recall, F1 identity)") {
    val rows = MlQueries.q180PrCurve(spark, dir).collect()
    assert(rows.length == 20)
    val n = Tables.embeddings(spark, dir).count()
    assert(rows.last.getLong(0) == n)
    // recall at full depth is 1 by construction
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
    // recall is nondecreasing in rank
    val recalls = rows.sortBy(_.getLong(0)).map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 })
    // F1 = harmonic mean identity at every checkpoint (within rounding)
    rows.foreach { r =>
      val (p, rc, f1) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      if (p + rc > 0)
        assert(math.abs(f1 - 2 * p * rc / (p + rc)) < 1e-4, s"$r")
    }
  }

  test("q181 weights equal a sequential local GD replay on the same grids") {
    val out = MlQueries.q181LogregGd(spark, dir).collect().head
    val data = Tables.embeddings(spark, dir)
      .selectExpr("CAST(embedding[0] AS DOUBLE) x1",
        "CAST(embedding[1] AS DOUBLE) x2",
        "CAST(label >= 5 AS INT) y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2).toDouble))
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var (w1, w2, b) = (0.0, 0.0, 0.0)
    (1 to 5).foreach { _ =>
      var g1 = BigDecimal(0); var g2 = BigDecimal(0); var gb = BigDecimal(0)
      data.foreach { case (x1, x2, y) =>
        val p = 1.0 / (1.0 + math.exp(-(b + w1 * x1 + w2 * x2)))
        g1 += r12((p - y) * x1); g2 += r12((p - y) * x2); gb += r12(p - y)
      }
      val n = data.length
      w1 = r9(w1 - 4.0 * r9(g1.toDouble / n))
      w2 = r9(w2 - 4.0 * r9(g2.toDouble / n))
      b = r9(b - 4.0 * r9(gb.toDouble / n))
    }
    assert(math.abs(out.getDouble(0) - w1) < 1e-8, s"w1 ${out.getDouble(0)} vs $w1")
    assert(math.abs(out.getDouble(1) - w2) < 1e-8)
    assert(math.abs(out.getDouble(2) - b) < 1e-8)
    // logloss can't exceed the w=0 baseline ln(2) after full-batch GD
    assert(out.getDouble(5) <= 0.6932)
  }

  test("q182 betas equal an exact BigInt Cramer solve; R2 in [0,1]") {
    val out = MlQueries.q182RidgeRegression(spark, dir).collect().head
    val feats = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast("long")).as("x2"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .selectExpr("x1", "x2", "CAST(ROUND(o_totalprice) AS BIGINT) yd")
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(feats.length); val lam = BigInt(100)
    val s1 = feats.map(_._1).sum; val s2 = feats.map(_._2).sum
    val s11 = feats.map(f => f._1 * f._1).sum
    val s12 = feats.map(f => f._1 * f._2).sum
    val s22 = feats.map(f => f._2 * f._2).sum
    val sy = feats.map(_._3).sum
    val s1y = feats.map(f => f._1 * f._3).sum
    val s2y = feats.map(f => f._2 * f._3).sum
    val (a, bb, c, d, e, f) = (n, s1, s2, s11 + lam, s12, s22 + lam)
    val det = a * (d * f - e * e) - bb * (bb * f - c * e) + c * (bb * e - c * d)
    val det0 = sy * (d * f - e * e) - bb * (s1y * f - s2y * e) + c * (s1y * e - s2y * d)
    val det1 = a * (s1y * f - s2y * e) - sy * (bb * f - c * e) + c * (bb * s2y - c * s1y)
    val det2 = a * (d * s2y - e * s1y) - bb * (bb * s2y - c * s1y) + sy * (bb * e - c * d)
    def beta(num: BigInt): Double =
      BigDecimal(num.toDouble / det.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getDouble(0) - beta(det0)) < 1e-9)
    assert(math.abs(out.getDouble(1) - beta(det1)) < 1e-9)
    assert(math.abs(out.getDouble(2) - beta(det2)) < 1e-9)
    val r2 = out.getDouble(4)
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
  }

  test("q219 kappa: 1 on engineered perfect agreement; bounded on the fixture") {
    import spark.implicits._
    // 24 tokens of 5 chars + 23 spaces = 143 chars -> band A = 1 = band B;
    // plus a short doc in band 0 on both raters (two agreeing classes so
    // pe < 1 and kappa is defined)
    val tmp = java.nio.file.Files.createTempDirectory("kappa219").toString
    (0 until 8).map(i => (i.toLong,
        if (i % 2 == 0) Seq.fill(24)("token").mkString(" ") else "tiny doc",
        "en", "s", 0L))
      .map { case (id, t, l, s0, _) => (id, t, l, s0, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val perfect = graft.queries.MlQueries.q219CohensKappa(spark, tmp).collect()
    assert(perfect.length == 1 && perfect.head.getDouble(2) == 1.0)
    val fix = graft.queries.MlQueries.q219CohensKappa(spark, dir).collect()
    assert(fix.nonEmpty)
    fix.foreach(r => assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }
}

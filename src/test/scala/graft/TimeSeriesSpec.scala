package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.TimeSeriesQueries

/** Round-6 time-series tier: EWMA, ACF, seasonal indices, CUSUM,
  * rolling anomalies, Theil–Sen — invariants a local recompute can
  * pin exactly (values are integer-cents fixed-point by design).
  */
class TimeSeriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q171 EWMA matches a sequential in-memory recompute") {
    val got = TimeSeriesQueries.q171Ewma(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // sequential recompute per user from the raw ordered series
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_millis(ts) as ms", "event_id",
        "cast(round(value * 100) as long) as yc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = TimeSeriesQueries.ewmaWeights.map(_._2)
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val ys = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ys.indices.foreach { i =>
        val terms = (0 until math.min(10, i + 1)).map(k => (w(k), ys(i - k)))
        val want = terms.map(t => t._1 * t._2).sum.toDouble /
          terms.map(_._1).sum.toDouble
        val gotV = got((u, i + 1))
        assert(math.abs(gotV - want) < 1e-6 + math.abs(want) * 1e-12,
          s"user $u seq ${i + 1}: got $gotV want $want")
      }
    }
  }

  test("q172 ACF: lag-0 normalization bounds every coefficient in [-1, 1]") {
    val rows = TimeSeriesQueries.q172Autocorr(spark, dir).collect()
    assert(rows.nonEmpty)
    // Cauchy-Schwarz on the truncated cross-sum permits small overshoot
    // only via rounding; the estimator divides by the FULL lag-0 sum so
    // |r| <= 1 exactly.
    rows.foreach { r =>
      val acf = r.getDouble(2)
      assert(acf >= -1.0 && acf <= 1.0, s"$r")
    }
    // all four requested lags present per type
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach(rs => assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 7)))
  }

  test("q173 seasonal indices average ~1 over a full week (mean-ratio identity)") {
    val rows = TimeSeriesQueries.q173SeasonalIndex(spark, dir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length == 7, s"$t has ${rs.length} dow rows")
      // each ratio is y/MA7 around 1; the unweighted mean across a
      // cycle stays near 1 (exact only for perfectly periodic series)
      val m = rs.map(_.getDouble(3)).sum / 7
      assert(m > 0.7 && m < 1.3, s"$t mean index $m")
    }
  }

  test("q174 CUSUM statistic is invariant to relabeling days (location-free)") {
    val out = TimeSeriesQueries.q174Cusum(spark, dir).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) >= 0.0)
      // change day falls inside the observed range
      val d = r.getLong(2)
      assert(d >= 19723 && d <= 19752, s"change_day $d outside Jan 2024")
    }
  }

  test("q175 flags exactly the rows a local trailing-window z-score flags") {
    val got = TimeSeriesQueries.q175RollingAnomaly(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val hourly = Tables.events(spark, dir)
      .selectExpr("event_type", "unix_millis(ts) div 3600000 as h",
        "cast(round(value * 100) as long) as yc")
      .groupBy(col("event_type"), col("h"))
      .agg(sum("yc").as("yc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // .toSeq: flatMap on a Map of tuple results would rebuild a Map and
    // collapse all flags of one type to the last — the superset bug this
    // spec exists to catch.
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val ser = rows.sortBy(_._2)
      ser.indices.flatMap { i =>
        if (i < 24) None else {
          val wnd = (i - 24 until i).map(j => ser(j)._3)
          val s = wnd.sum; val ss = wnd.map(x => x * x).sum
          val a = 24 * ss - s * s
          if (a <= 0) None else {
            val z = (24 * ser(i)._3 - s).toDouble /
              math.sqrt(a.toDouble * 24.0 / 23.0)
            if (math.abs(z) > 3.0) Some((t, ser(i)._2)) else None
          }
        }
      }
    }.toSet
    assert(got == want)
  }

  test("q176 Theil-Sen slope is the median pairwise slope (local recompute)") {
    val got = TimeSeriesQueries.q176TheilSen(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val dy = Tables.events(spark, dir)
      .selectExpr("event_type", "unix_millis(ts) div 86400000 as d",
        "cast(round(value * 100) as long) as yc")
      .groupBy(col("event_type"), col("d")).agg(sum("yc").as("yc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    dy.groupBy(_._1).foreach { case (t, rows) =>
      val ser = rows.sortBy(_._2)
      val slopes = (for {
        i <- ser.indices; j <- (i + 1) until ser.length
      } yield (ser(j)._3 - ser(i)._3).toDouble / (ser(j)._2 - ser(i)._2)).sorted
      val m = slopes.length
      val med =
        if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2
      val (gm, gs) = got(t)
      assert(gm == m)
      assert(math.abs(gs - med) < 1e-6, s"$t: got $gs want $med")
    }
  }

  test("q176 even pair count averages BOTH middle slopes (ADVICE r6)") {
    // 4 days -> m = 6 pairs (even). Slopes sorted: [0,50,100,200,250,500];
    // the median must average ranks 3 and 4 -> 150. The pre-fix double
    // division `rn === (m+1)/2` matched neither x.5 rank and kept only the
    // upper middle (200) — this pins the `div` semantics with a fixture
    // whose pair count is even regardless of what the driver regenerates.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ts176").toString
    Seq((1L, "2024-01-01 00:00:00", 1L, "buy", 0.0, "{}"),
        (2L, "2024-01-02 00:00:00", 1L, "buy", 1.0, "{}"),
        (3L, "2024-01-03 00:00:00", 1L, "buy", 1.0, "{}"),
        (4L, "2024-01-04 00:00:00", 1L, "buy", 6.0, "{}"))
      .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("raw_ts"))).drop("raw_ts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val r = TimeSeriesQueries.q176TheilSen(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 6L)
    assert(math.abs(r.head.getDouble(2) - 150.0) < 1e-9,
      s"even-m median broken: got ${r.head.getDouble(2)}, want 150.0")
  }

  test("q220 MASE: exactly 0 for a weekly-periodic series; finite on fixture") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mase220").toString
    // 14 daily points with exact period 7 -> every seasonal error is 0
    (0 until 14).map(d => (d.toLong, s"2024-01-${"%02d".format(d + 1)} 12:00:00",
        1L, "buy", 1.0 + (d % 7), "{}"))
      .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("raw_ts"))).drop("raw_ts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val p = TimeSeriesQueries.q220SeasonalMase(spark, tmp).collect()
    assert(p.length == 1 && p.head.getLong(1) == 14L && p.head.getDouble(2) == 0.0)
    val fix = TimeSeriesQueries.q220SeasonalMase(spark, dir).collect()
    assert(fix.nonEmpty)
    fix.foreach(r => assert(r.getDouble(2) >= 0.0 && !r.getDouble(2).isNaN))
  }
}

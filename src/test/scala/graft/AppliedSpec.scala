package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{AppliedQueries, GraphQueries}

/** Round-6 applied tier (q201–q208). */
class AppliedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q201 distances match a local 6-round Bellman-Ford replay") {
    val got = GraphQueries.q201WeightedSssp(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") > 30)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = e.flatMap(p => Seq((p._1, p._2), (p._2, p._1)))
      .map { case (s0, d0) => (s0, d0, 1 + java.lang.Math.floorMod(s0 * 31 + d0 * 17, 9L)) }
    val src = sym.map(_._1).min
    var dist = Map(src -> 0L)
    (1 to 6).foreach { _ =>
      val relaxed = sym.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).map { case (v, ds) => v -> ds.map(_._2).min }
    }
    val want = dist.toSeq.sortBy(t => (t._2, t._1)).take(30).toMap
    assert(got == want)
  }

  test("q202 attribution conserves value under both models") {
    val rows = AppliedQueries.q202Attribution(spark, dir).collect()
    val lin = rows.map(_.getDouble(2)).sum
    val posv = rows.map(_.getDouble(3)).sum
    // both models split each attributed purchase's full value
    assert(math.abs(lin - posv) < 0.1, s"$lin vs $posv")
    // and the total equals the sum of attributed purchases' values
    val ev = Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_millis(ts) as ms", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val clicks = ev.filter(_._3 == "click")
    val want = ev.filter(_._3 == "purchase").filter { p =>
      clicks.exists(c => c._2 == p._2 && c._4 >= p._4 - 3600000L && c._4 <= p._4)
    }.map(_._5).sum
    assert(math.abs(lin - want) < 0.1, s"$lin vs $want")
  }

  test("q203 stage percentiles are ordered p25 <= p50 <= p75") {
    val rows = AppliedQueries.q203FunnelDurations(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4), s"$r")
    }
  }

  test("q204 CSV round-trip is byte-faithful at spec scale") {
    val r = AppliedQueries.q204CsvRoundtrip(spark, dir).collect().head
    assert(r.getLong(0) == r.getLong(1)) // written == read
    assert(r.getLong(2) == 0, "CSV round-trip mismatches")
  }

  test("q205 streaming top-k equals the batch rank with zero sketch error") {
    // spec scale is in-capacity: within_capacity=1 everywhere and the
    // unmasked (user_id, cnt, err) equal the exact batch rank
    val got = graft.streaming.StreamPipeline.q205StreamingTopk(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    got.foreach(t => assert(t._3 == 1, s"saturated at spec scale: $t"))
    got.foreach(t => assert(t._6 == 0, s"sketch error at spec scale: $t"))
    val want = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (t, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case (r, i) => (t, i + 1, 1L, r._2, r._3, 0L) }
      }.toSet
    assert(got.toSet == want)
  }

  test("q205 exactness precondition holds at the gate scale (sf0.01)") {
    // The DuckDB oracle hardcodes err=0 and exact count ranking, valid
    // only while distinct users per event_type stays under the
    // Space-Saving capacity (256). Pin that against the GATE fixture so
    // a testdata regeneration that breaks the precondition fails loudly
    // here instead of silently flipping the hash gate.
    val maxDistinct = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .agg(max(col("u"))).collect().head.getLong(0)
    assert(maxDistinct < 256,
      s"sf0.01 has an event_type with $maxDistinct distinct users >= " +
        "Space-Saving capacity 256 — q205's exact oracle no longer holds")
  }

  test("q206 rank columns are permutations of 1..N over the scored docs") {
    val rows = AppliedQueries.q206RankFusion(spark, dir).collect()
    assert(rows.length == 20)
    // top-20 RRF ranks are distinct and >= 1
    val ras = rows.map(_.getLong(1)); val rbs = rows.map(_.getLong(2))
    assert(ras.distinct.length == 20 && rbs.distinct.length == 20)
    assert(ras.forall(_ >= 1) && rbs.forall(_ >= 1))
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("q207 closed-form backlog equals the sequential Lindley recursion") {
    val got = AppliedQueries.q207LindleyBacklog(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    val hourly = Tables.events(spark, dir)
      .selectExpr("event_type", "unix_millis(ts) div 3600000 as h")
      .groupBy("event_type", "h").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    hourly.groupBy(_._1).foreach { case (t, rows) =>
      val ser = rows.sortBy(_._2)
      val n = ser.length; val s = ser.map(_._3).sum
      var w = 0L; var best = (0L, 0L)
      ser.foreach { case (_, h, c) =>
        w = math.max(0L, w + n * c - s) // drift scaled by n, like the query
        if (w > best._1) best = (w, h)
      }
      val (gPeak, gHour) = got(t)
      assert(math.abs(gPeak - best._1.toDouble / n) < 1e-4, s"$t")
      assert(gHour == best._2, s"$t hour")
    }
  }

  test("q209 pi is a probability vector and the rate is a pi-mix of row entropies") {
    val rows = AppliedQueries.q209MarkovEntropy(spark, dir).collect()
    assert(rows.length == 5)
    // five grid-rounded power steps + 6dp output rounding drift the sum
    // by a few 1e-6 — the grid is the point (cross-engine identity), not
    // exact stochasticity
    val piSum = rows.map(_.getDouble(1)).sum
    assert(math.abs(piSum - 1.0) < 1e-4, s"pi sums to $piSum")
    rows.foreach { r =>
      assert(r.getDouble(1) > 0)
      // row entropy of a 5-state chain is within [0, ln 5]
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= math.log(5.0) + 1e-9)
    }
    val mix = rows.map(r => r.getDouble(1) * r.getDouble(2)).sum
    assert(math.abs(rows.head.getDouble(3) - mix) < 1e-4)
  }

  test("q210 weighted quantiles equal a local cumulative-weight sweep") {
    val got = AppliedQueries.q210WeightedQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority", "CAST(ROUND(l_extendedprice*100) AS BIGINT) vc",
        "CAST(l_quantity AS BIGINT) w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (pr, rows) =>
      val sorted = rows.sortBy(_._2)
      val wTot = sorted.map(_._3).sum
      def pick(num: Long, den: Long): Long = {
        var cum = 0L
        sorted.find { r => cum += r._3; cum * den >= num * wTot }.get._2
      }
      val (gw, gmed, gp90) = got(pr)
      assert(gw == wTot)
      assert(gmed == pick(1, 2), s"$pr median")
      assert(gp90 == pick(9, 10), s"$pr p90")
    }
  }

  test("q208 draws exactly the allocated count per stratum, budget ~500") {
    val rows = AppliedQueries.q208NeymanSample(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4), s"allocated != sampled: $r")
      assert(r.getLong(3) <= r.getLong(1), s"allocation exceeds stratum: $r")
    }
    // capped allocations can undershoot on tiny strata; never overshoot
    val total = rows.map(_.getLong(3)).sum
    assert(total <= 503, s"budget overshoot: $total")
  }
}

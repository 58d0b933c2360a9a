package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.WarehouseQueries

/** Round-5 warehouse tier: SCD2 history, Misra-Gries heavy hitters,
  * Markov transitions, co-purchase pairs, exact z-score outliers.
  */
class WarehouseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sfDir

  test("q122 SCD2 intervals partition each user's history") {
    val hist = WarehouseQueries.q122Scd2History(spark, dir).cache()
    val ev = Tables.events(spark, dir).filter(col("user_id") < 50)
    // conservation: every event lands in exactly one run
    assert(hist.agg(sum("n_events")).head().getLong(0) == ev.count())
    // exactly one open (valid_to IS NULL) interval per user
    val users = hist.select("user_id").distinct().count()
    assert(hist.filter(col("valid_to").isNull).count() == users)
    // intervals chain: valid_to equals the next run's valid_from
    val broken = hist.selectExpr("user_id", "valid_from", "valid_to",
        "lead(valid_from) over (partition by user_id order by valid_from) as nxt")
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("nxt"))
    assert(broken.count() == 0)
    hist.unpersist()
  }

  test("q123 equals the brute-force heavy-hitter scan") {
    val got = WarehouseQueries.q123HeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val n = toks.count()
    val want = toks.groupBy("term").count()
      .filter(col("count") * 1000 > n)
      .orderBy(col("count").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("Misra-Gries candidates are a superset under adversarial skew") {
    // one dominant key + a long tail, deliberately interleaved so the
    // decrement path runs constantly at a tiny capacity
    val tokens = spark.range(10000)
      .select(when(col("id") % 3 === 0, lit("heavy"))
        .otherwise(concat(lit("t"), col("id"))).as("t"))
      .repartition(7)
      .as[String]
    val cand = graft.operators.HeavyHitters.candidates(tokens, capacity = 10)
      .collect().toSet
    assert(cand.contains("heavy")) // freq 1/3 >> 1/10
    val hh = graft.operators.HeavyHitters.exact(tokens, k = 10, capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq == Seq(("heavy", 3334L)))
  }

  test("q124 transition probabilities are a stochastic matrix") {
    val m = WarehouseQueries.q124MarkovTransitions(spark, dir).cache()
    val rowSums = m.groupBy("src").agg(sum("p").as("s")).collect()
    rowSums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, r))
    // transition conservation: sum counts = n_events - n_users(with events)
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(m.agg(sum("n_transitions")).head().getLong(0) == expected)
    m.unpersist()
  }

  test("q125 matches the self-join form") {
    val got = WarehouseQueries.q125CopurchasePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val want = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("q127 expectation report: clean data passes, planted violations are counted") {
    val report = WarehouseQueries.q127DataExpectations(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(report.size == 7)
    // driver-generated data is referentially intact and type-clean
    assert(report("orders.o_custkey_fk_customer") == 0L)
    assert(report("lineitem.l_orderkey_fk_orders") == 0L)
    assert(report("orders.o_totalprice_positive") == 0L)
    assert(report("events.event_type_in_enum") == 0L)
  }

  test("q128 snapshot diff partitions keys and counts churn exactly") {
    val diff = WarehouseQueries.q128SnapshotDiff(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val keys = Tables.orders(spark, dir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val inserts = keys.count(k => k % 10 == 3)          // absent old, present new
    val deletes = keys.count(k => k % 10 == 0)          // present old, absent new
    val updates = keys.count(k => k % 10 != 3 && k % 10 != 0 && k % 7 == 0)
    assert(diff("insert") == inserts)
    assert(diff("delete") == deletes)
    assert(diff("update") == updates)
    assert(diff.values.sum == keys.length)              // every key classified once
  }

  test("q130 median/MAD outliers agree with a local recompute") {
    val got = WarehouseQueries.q130MadOutliers(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val local = Tables.events(spark, dir)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .groupBy(_._1).map { case (u, vs) =>
        def med2(xs: Seq[Long]): Long = { // lo+hi of the two middle ranks
          val s = xs.sorted; val n = s.length
          s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
        }
        val xs = vs.map(_._2).toSeq
        val m2 = med2(xs)
        val ds = xs.map(v => math.abs(2 * v - m2))
        val m4 = med2(ds)
        val out = ds.count(d => 2 * d > 3 * m4).toLong
        (u, (xs.length.toLong, m2 / 2e6, m4 / 4e6, out))
      }
    assert(got == local)
  }

  test("q131 selects the maximal prefix within each source's budget") {
    val rep = graft.queries.CorpusQueries.q131TokenBudget(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("tk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (-r._3, r._2)).map(_._4)
      val cums = ordered.scanLeft(0L)(_ + _).tail
      val nSel = cums.count(_ <= 600L)
      val used = if (nSel == 0) 0L else cums(nSel - 1)
      val (nc, tt, ns, tu) = rep(src)
      assert(nc == rows.length && tt == ordered.sum && ns == nSel && tu == used, src)
      // maximality: the next candidate (if any) would break the budget
      if (nSel < ordered.length) assert(used + ordered(nSel) > 600L, src)
    }
  }

  test("q132 slopes equal a local double-precision OLS fit") {
    val got = WarehouseQueries.q132TrendSlopes(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val local = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ms0 = rows.map(_._2).min
      val pts = rows.map(r => ((r._2 - ms0) / 3600000L, r._3))
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val den = n * sxx - sx * sx
      if (den > 0) Some((u, (pts.length.toLong, (n * sxy - sx * sy) / den))) else None
    }
    assert(got.keySet == local.keySet)
    got.foreach { case (u, (n, s)) =>
      val (ln, ls) = local(u)
      assert(n == ln && math.abs(s - ls) <= 1e-9 * math.max(1.0, math.abs(ls)), u)
    }
  }

  test("q126 agrees with a local double-precision recompute") {
    val gotOut = WarehouseQueries.q126ZscoreOutliers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val local = Tables.events(spark, dir)
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .groupBy(_._1).map { case (u, vs) =>
        val xs = vs.map(_._2.toDouble)
        val n = xs.length.toDouble
        val mean = xs.sum / n
        val varp = xs.map(x => (x - mean) * (x - mean)).sum / n
        (u, xs.count(x => (x - mean) * (x - mean) > 9 * varp).toLong)
      }
    assert(gotOut == local)
  }
}

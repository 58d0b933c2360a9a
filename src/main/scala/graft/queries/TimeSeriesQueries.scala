package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 time-series tier over the `events` stream: exponential
  * smoothing, autocorrelation, seasonal decomposition, CUSUM change
  * detection, rolling anomaly flags, and robust Theil–Sen trends —
  * the metric-monitoring passes a warehouse runs downstream of the
  * reference's event sinks (etl-rust streams every table out via
  * docs/environment-variables.md:50-69; the analytics it defers to
  * BigQuery run engine-native here).
  *
  * Shape discipline (100 TB): every query starts with ONE distributed
  * aggregate that collapses the raw stream to a bounded per-key series
  * (per-user sequence, per-type daily/hourly buckets). The series
  * analytics then run windowed *within* keys — no global sort, no
  * driver collect, and the only self-joins are over the bounded
  * bucketed series, never the raw events.
  *
  * Determinism discipline (DuckDB hash gate): series values are exact
  * integer cents; means/variances are carried as integer/decimal
  * moments; the only floating-point steps are single IEEE ops
  * (+,−,×,÷,sqrt are correctly rounded and therefore bit-identical
  * on any IEEE engine) on exactly-converted integers, followed by a
  * 1e-6 rounding grid. No libm transcendentals (pow/exp/log) anywhere.
  */
object TimeSeriesQueries {

  private val MsPerDay  = 86400000L
  private val MsPerHour = 3600000L

  /** events → (user_id, event_id, ms, yc) with value in exact cents. */
  private def cents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id"), col("event_id"),
      unix_millis(col("ts")).as("ms"),
      round(col("value") * 100).cast("long").as("yc"))

  /** Per-type daily series: (event_type, d, yc) with d = epoch day and
    * yc the exact total cents that day. The one big shuffle. */
  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr(s"unix_millis(ts) div $MsPerDay").as("d"),
        round(col("value") * 100).cast("long").as("yc"))
      .groupBy(col("event_type"), col("d"))
      .agg(graft.Oracle.lsum(col("yc")).as("yc"))

  // ---------------------------------------------------------------------
  // q171 — EWMA smoothing (truncated exponential weights, exact)

  /** Truncated-window EWMA (α=0.3, window 10) of each user's event
    * values: ewma_t = Σ_{k<10} w_k·y_{t−k} / Σ w_k with w_k ∝ 0.7^k.
    * Weights are the exact integers 7^k·10^(9−k) (common denominator
    * 10^9), so numerator and normalizer are exact BIGINTs on both
    * engines; the bound |num| ≤ maxCents·Σw ≈ 5.6e4·3.3e9 ≈ 1.9e14
    * stays far under 2^53, so the final int→double divide is exact.
    *
    * Shape: instead of a quadratic per-user self-join, each event
    * FANS OUT to the ≤10 later positions it contributes to (a bounded
    * 10× explode), then one hash aggregate on (user, position) — the
    * streaming-friendly map-side shape that survives users with
    * millions of events. */
  def q171Ewma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = ewmaWeights.toDF("k", "wt")
    val byU = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val rn = cents(s, dir).withColumn("rn", row_number().over(byU))
    val contrib = rn.crossJoin(broadcast(w))
      .select(col("user_id"), (col("rn") + col("k")).as("trn"),
        (col("wt") * col("yc")).as("wy"), col("wt"))
    val agg = contrib.groupBy(col("user_id"), col("trn"))
      .agg(graft.Oracle.lsum(col("wy")).as("num"),
        graft.Oracle.lsum(col("wt")).as("den"))
    rn.alias("r")
      .join(agg.alias("a"), col("r.user_id") === col("a.user_id") &&
        col("r.rn") === col("a.trn"))
      .select(col("r.user_id").as("user_id"), col("r.rn").as("seq"),
        col("r.yc").as("value_cents"),
        round(col("a.num").cast("double") / col("a.den").cast("double"), 6)
          .as("ewma_cents"))
      .orderBy(col("user_id"), col("seq"))
  }

  /** w_k = 7^k · 10^(9−k), k = 0..9 — exact longs shared with the SQL twin. */
  private[graft] val ewmaWeights: Seq[(Int, Long)] =
    (0 until 10).map(k =>
      (k, (BigInt(7).pow(k) * BigInt(10).pow(9 - k)).toLong))

  val q171Sql: String = {
    val values = ewmaWeights.map { case (k, w) => s"($k, $w)" }.mkString(", ")
    s"""WITH w AS (SELECT * FROM (VALUES $values) AS t(k, wt)),
      |ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CAST(ROUND(value * 100) AS BIGINT) AS yc
      |  FROM events),
      |rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS rn
      |  FROM ev),
      |contrib AS (
      |  SELECT r.user_id, r.rn + w.k AS trn, w.wt * r.yc AS wy, w.wt AS wt
      |  FROM rn r CROSS JOIN w),
      |agg AS (
      |  SELECT user_id, trn, CAST(SUM(wy) AS BIGINT) AS num,
      |    CAST(SUM(wt) AS BIGINT) AS den
      |  FROM contrib GROUP BY 1, 2)
      |SELECT r.user_id, r.rn AS seq, r.yc AS value_cents,
      |  ROUND(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE), 6) AS ewma_cents
      |FROM rn r JOIN agg a ON r.user_id = a.user_id AND r.rn = a.trn
      |ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q172 — autocorrelation function (exact n-scaled moments)

  /** ACF of each type's daily-total series at lags 1, 2, 3, 7 — the
    * standard estimator r_L = Σ_{t>L}(y_t−ȳ)(y_{t−L}−ȳ) / Σ(y_t−ȳ)²,
    * carried exactly by scaling through n: (y−ȳ) → (n·y − S) with
    * S = Σy, so num and den are exact DECIMAL(38,0) sums of integer
    * products and the single final divide is the only FP op. */
  def q172Autocorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val dy = daily(s, dir)
    val st = dy.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Oracle.lsum(col("yc")).as("sy"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lagged = dy.join(st, "event_type")
      .withColumn("z", (col("n") * col("yc") - col("sy")).cast(d38))
      .withColumn("z1", lag(col("z"), 1).over(byT))
      .withColumn("z2", lag(col("z"), 2).over(byT))
      .withColumn("z3", lag(col("z"), 3).over(byT))
      .withColumn("z7", lag(col("z"), 7).over(byT))
    val stacked = lagged.select(col("event_type"), col("z"),
      explode(map(lit(1), col("z1"), lit(2), col("z2"),
        lit(3), col("z3"), lit(7), col("z7"))).as(Seq("lag", "zl")))
    val den = lagged.groupBy(col("event_type"))
      .agg(sum(col("z") * col("z")).as("den"))
    stacked.filter(col("zl").isNotNull)
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("z") * col("zl")).as("num"))
      .join(den, "event_type").filter(col("den") > 0)
      .select(col("event_type"), col("lag"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  private val dailySql: String =
    s"""daily AS (
      |  SELECT event_type, epoch_ms(ts) // $MsPerDay AS d,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val q172Sql: String =
    s"""WITH $dailySql,
      |st AS (
      |  SELECT event_type, COUNT(*) AS n, CAST(SUM(yc) AS BIGINT) AS sy
      |  FROM daily GROUP BY 1),
      |z AS (
      |  SELECT d.event_type, d.d,
      |    CAST(st.n * d.yc - st.sy AS DECIMAL(38,0)) AS z
      |  FROM daily d JOIN st ON d.event_type = st.event_type),
      |lagged AS (
      |  SELECT event_type, z,
      |    LAG(z, 1) OVER w AS z1, LAG(z, 2) OVER w AS z2,
      |    LAG(z, 3) OVER w AS z3, LAG(z, 7) OVER w AS z7
      |  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |den AS (SELECT event_type, SUM(z*z) AS den FROM lagged GROUP BY 1),
      |stacked AS (
      |  SELECT event_type, 1 AS lag, z * z1 AS p FROM lagged WHERE z1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 2, z * z2 FROM lagged WHERE z2 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 3, z * z3 FROM lagged WHERE z3 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 7, z * z7 FROM lagged WHERE z7 IS NOT NULL)
      |SELECT s.event_type, s.lag,
      |  ROUND(CAST(SUM(s.p) AS DOUBLE) / CAST(MAX(den.den) AS DOUBLE), 6) AS acf
      |FROM stacked s JOIN den ON s.event_type = den.event_type
      |WHERE den.den > 0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q173 — seasonal index (ratio-to-centered-moving-average)

  /** Day-of-week seasonal indices per event type by the classical
    * ratio-to-moving-average method: ratio_t = y_t / MA7_t with a
    * centered 7-day window (only where the window is complete), then
    * the per-(type, dow) mean ratio. ALL arithmetic is integer until
    * the final /1e6 scaling: each ratio quantizes to 1e-6 units by
    * half-away integer division ((2·7y·10⁶ + ws) div 2ws — nonneg by
    * the ws>0 guard), the per-(type,dow) mean of those units is the
    * same half-away integer formula, and the output is one exact-
    * rounded double scaling. The earlier form rounded an IEEE divide
    * with round(x,6), which diverged between Spark's BigDecimal
    * (shortest-repr digits) and DuckDB's std::round(x·10⁶) on a ratio
    * within an ulp of a .5 grid boundary — found by the sf0.1 sweep
    * (1 cell of 1.3k); the integer grid removes the FP round entirely
    * (the pqCodebooks fixed-point-mean idiom).
    * dow is computed arithmetically ((d+4) mod 7, 0 = Sunday) to dodge
    * engine-specific weekday conventions. */
  def q173SeasonalIndex(s: SparkSession, dir: String): DataFrame = {
    val byT = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    val ma = daily(s, dir)
      .withColumn("ws", sum(col("yc")).over(byT))
      .withColumn("wn", count(lit(1)).over(byT))
      .filter(col("wn") === 7 && col("ws") > 0)
      .withColumn("r6", expr("(2 * yc * 7 * 1000000 + ws) div (2 * ws)"))
    ma.withColumn("dow", pmod(col("d") + 4, lit(7)))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), graft.Oracle.lsum(col("r6")).as("sr6"))
      .select(col("event_type"), col("dow"), col("n_days"),
        (expr("(2 * sr6 + n_days) div (2 * n_days)").cast("double") / 1e6)
          .as("seasonal_index"))
      .orderBy(col("event_type"), col("dow"))
  }

  val q173Sql: String =
    s"""WITH $dailySql,
      |ma AS (
      |  SELECT event_type, d, yc,
      |    SUM(yc) OVER w AS ws, COUNT(*) OVER w AS wn
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY d
      |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |ratio AS (
      |  SELECT event_type, (d + 4) % 7 AS dow,
      |    (2 * yc * 7 * 1000000 + ws) // (2 * ws) AS r6
      |  FROM ma WHERE wn = 7 AND ws > 0)
      |SELECT event_type, dow, COUNT(*) AS n_days,
      |  CAST((2 * CAST(SUM(r6) AS BIGINT) + COUNT(*)) // (2 * COUNT(*))
      |    AS DOUBLE) / 1e6 AS seasonal_index
      |FROM ratio GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q174 — CUSUM change-point detection (exact argmax, standardized stat)

  /** Mean-shift detection on each type's daily event counts: the CUSUM
    * path S_i = Σ_{t≤i}(c_t − c̄) scaled by n to the exact integer
    * m_i = |n·cum_i − i·S|; the change point is the earliest day
    * attaining max m_i (integer argmax — no FP in the decision), and
    * the reported statistic max|S_i|/(σ̂√n) = m_max/√(n(n·SS−S²)) uses
    * one exact int→double conversion, one sqrt, one divide. */
  def q174Cusum(s: SparkSession, dir: String): DataFrame = {
    val dc = Tables.events(s, dir)
      .select(col("event_type"), expr(s"unix_millis(ts) div $MsPerDay").as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
    val st = dc.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Oracle.lsum(col("c")).as("s"),
        graft.Oracle.lsum(col("c") * col("c")).as("ss"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val path = dc
      .withColumn("i", row_number().over(byT))
      .withColumn("cum", sum(col("c")).over(byT))
      .join(st, "event_type")
      .withColumn("m", abs(col("n") * col("cum") - col("i") * col("s")))
    path.filter(col("n") * col("ss") - col("s") * col("s") > 0)
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        max_by(struct(col("m"), -col("d")), struct(col("m"), -col("d"))).as("mx"),
        max(col("n") * col("ss") - col("s") * col("s")).as("v"))
      .select(col("event_type"), col("n_days"),
        (-col("mx.col2")).as("change_day"),
        round(col("mx.m").cast("double") /
          sqrt((col("n_days") * col("v")).cast("double")), 6).as("cusum_stat"))
      .orderBy(col("event_type"))
  }

  val q174Sql: String =
    s"""WITH dc AS (
      |  SELECT event_type, epoch_ms(ts) // $MsPerDay AS d, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
      |    CAST(SUM(c*c) AS BIGINT) AS ss
      |  FROM dc GROUP BY 1),
      |path AS (
      |  SELECT dc.event_type, dc.d, st.n, st.s, st.ss,
      |    row_number() OVER w AS i, SUM(dc.c) OVER w AS cum
      |  FROM dc JOIN st ON dc.event_type = st.event_type
      |  WINDOW w AS (PARTITION BY dc.event_type ORDER BY dc.d)),
      |m AS (
      |  SELECT event_type, d, n, ABS(n*cum - i*s) AS m, n*ss - s*s AS v
      |  FROM path WHERE n*ss - s*s > 0),
      |best AS (
      |  SELECT event_type, n, d, m, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY m DESC, d ASC) AS rk
      |  FROM m)
      |SELECT event_type, n AS n_days, d AS change_day,
      |  ROUND(CAST(m AS DOUBLE) / SQRT(CAST(n * v AS DOUBLE)), 6) AS cusum_stat
      |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q175 — rolling-window anomaly flags (trailing z-score)

  /** Hourly totals per type scored against the trailing 24 observed
    * buckets: z = (24·y − s) / √(24·(24·ss − s²)/23) — sample-std
    * z-score carried in exact integers until a 3-op IEEE tail
    * (convert, multiply/divide, sqrt). Emits only |z| > 3 rows — the
    * monitoring alert stream, a tiny fraction of the input. */
  def q175RollingAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), expr(s"unix_millis(ts) div $MsPerHour").as("h"),
        round(col("value") * 100).cast("long").as("yc"))
      .groupBy(col("event_type"), col("h"))
      .agg(graft.Oracle.lsum(col("yc")).as("yc"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    // ss and a in DECIMAL(38,0): at sf100 an hourly bucket's cents total
    // reaches ~7e8, so yc² ≈ 5e17 is long-safe but 24·ss ≈ 1.2e19 and s²
    // ≈ 2.9e20 are NOT (caught live by the r12 sf100 sweep as a
    // try_multiply overflow). Exact integers to the very end, then ONE
    // correctly-rounded conversion through bigToDouble (a < 2⁷⁵ by the
    // same bound: ≤ 24·24·yc²). DuckDB's window SUM(BIGINT) is already
    // HUGEINT, so its twin only needs the product cast + bigToDoubleSql.
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val scored = hourly
      .withColumn("cnt", count(lit(1)).over(trail))
      .withColumn("s", sum(col("yc")).over(trail))
      .withColumn("ss", sum(col("yc").cast(d38) * col("yc")).over(trail))
      .filter(col("cnt") === 24)
      .withColumn("a", lit(24).cast(d38) * col("ss") -
        col("s").cast(d38) * col("s").cast(d38))
      .filter(col("a") > 0)
      .withColumn("z", (lit(24) * col("yc") - col("s")).cast("double") /
        sqrt(graft.Oracle.bigToDouble(col("a")) * 24.0 / 23.0))
    scored.filter(abs(col("z")) > 3.0)
      .select(col("event_type"), col("h").as("hour"),
        col("yc").as("value_cents"), round(col("z"), 4).as("z"))
      .orderBy(col("event_type"), col("hour"))
  }

  val q175Sql: String =
    s"""WITH hourly AS (
      |  SELECT event_type, epoch_ms(ts) // $MsPerHour AS h,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, h, yc,
      |    COUNT(*) OVER w AS cnt, SUM(yc) OVER w AS s,
      |    SUM(CAST(yc AS HUGEINT) * yc) OVER w AS ss
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type, h, yc,
      |    CAST(24*yc - s AS DOUBLE) /
      |      SQRT(${graft.Oracle.bigToDoubleSql("24*ss - s*s")} * 24.0 / 23.0) AS z
      |  FROM scored WHERE cnt = 24 AND 24*ss - s*s > 0)
      |SELECT event_type, h AS hour, yc AS value_cents, ROUND(z, 4) AS z
      |FROM z WHERE ABS(z) > 3.0
      |ORDER BY event_type, hour""".stripMargin

  // ---------------------------------------------------------------------
  // q176 — Theil–Sen robust trend (median of pairwise slopes)

  /** Median-of-pairwise-slopes trend per type over the daily series —
    * the robust alternative to q132's OLS (breakdown point 29%). The
    * O(days²) pair expansion happens on the ALREADY-AGGREGATED daily
    * table (30 rows/key), never the raw events, so the cost is
    * days²·types, independent of event volume. Each slope is one exact
    * IEEE divide of integers; the median picks the middle one/two by
    * rank (average of two is again a single exact-rounded op). */
  def q176TheilSen(s: SparkSession, dir: String): DataFrame = {
    val dy = daily(s, dir)
    val a = dy.select(col("event_type"), col("d").as("di"), col("yc").as("yi"))
    val b = dy.select(col("event_type"), col("d").as("dj"), col("yc").as("yj"))
    val pairs = a.join(b, Seq("event_type")).filter(col("di") < col("dj"))
      .select(col("event_type"),
        ((col("yj") - col("yi")).cast("double") /
          (col("dj") - col("di")).cast("double")).as("slope"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("slope"))
    val ranked = pairs.withColumn("rn", row_number().over(byT))
    val cnt = pairs.groupBy(col("event_type")).agg(count(lit(1)).as("m"))
    ranked.join(cnt, "event_type")
      // integer rank targets (Spark `/` on longs is DOUBLE division: for
      // even m, (m+1)/2 = x.5 matches no rank and the median would
      // silently degrade to the upper-middle slope — mirror SQL's `//`)
      .filter(col("rn") === expr("(m + 1) div 2") ||
        col("rn") === expr("m div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("m")).as("n_pairs"),
        round(graft.Oracle.dsum(col("slope")).cast("double") / count(lit(1)), 6)
          .as("theil_sen_slope"))
      .orderBy(col("event_type"))
  }

  val q176Sql: String =
    s"""WITH $dailySql,
      |pairs AS (
      |  SELECT a.event_type,
      |    CAST(b.yc - a.yc AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d < b.d),
      |ranked AS (
      |  SELECT event_type, slope,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS m
      |  FROM pairs)
      |SELECT event_type, MAX(m) AS n_pairs,
      |  ROUND(${graft.Oracle.dsumSql("slope")} / COUNT(*), 6) AS theil_sen_slope
      |FROM ranked
      |WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q220 — seasonal-naive forecast error (MASE)

  /** Forecast-quality audit per event type: score the weekly
    * seasonal-naive forecast ŷ_t = y_{t−7} with MASE (Hyndman &
    * Koehler 2006) — mean absolute error scaled by the mean absolute
    * one-step naive error, the standard scale-free way to report
    * whether seasonality explains a series. Both numerator and scale
    * are exact integer-cents sums over lag windows; MASE reduces to
    * ONE double division of exact BIGINT products
    * (Σ|e₇|·n₁) / (Σ|e₁|·n₇), so the hash gate holds with no decimal
    * grid at all. MASE < 1 ⇒ the weekly pattern beats naive drift.
    *
    * Scale: the daily rollup is the one data-sized aggregate; lags are
    * per-type windows over ~30-row series. The window partitioning is
    * the same event_type key the aggregate already shuffled on. */
  def q220SeasonalMase(s: SparkSession, dir: String): DataFrame = {
    val byT = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val lagged = daily(s, dir)
      .withColumn("y1", lag(col("yc"), 1).over(byT))
      .withColumn("y7", lag(col("yc"), 7).over(byT))
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        graft.Oracle.lsum(abs(col("yc") - col("y7"))).as("se7"),
        count(col("y7")).as("n7"),
        graft.Oracle.lsum(abs(col("yc") - col("y1"))).as("se1"),
        count(col("y1")).as("n1"))
      .select(col("event_type"), col("n_days"),
        // NULLIF guard on both engines: a series shorter than 8 days
        // (n7=0) or a constant series (se1=0) zeroes the scale; Spark
        // non-ANSI /0 -> NULL but DuckDB IEEE /0.0 -> inf, so both
        // sides must null the denominator identically.
        round((col("se7") * col("n1")).cast("double") /
          nullif((col("se1") * col("n7")).cast("double"), lit(0.0)),
          6).as("mase"))
      .orderBy(col("event_type"))
  }

  val q220Sql: String =
    s"""WITH $dailySql,
      |lagged AS (
      |  SELECT event_type, yc,
      |    lag(yc, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1,
      |    lag(yc, 7) OVER (PARTITION BY event_type ORDER BY d) AS y7
      |  FROM daily)
      |SELECT event_type, COUNT(*) AS n_days,
      |  ROUND(CAST(CAST(SUM(ABS(yc - y7)) AS BIGINT) * COUNT(y1) AS DOUBLE)
      |    / NULLIF(CAST(CAST(SUM(ABS(yc - y1)) AS BIGINT) * COUNT(y7)
      |              AS DOUBLE), 0), 6) AS mase
      |FROM lagged GROUP BY 1 ORDER BY 1""".stripMargin
}

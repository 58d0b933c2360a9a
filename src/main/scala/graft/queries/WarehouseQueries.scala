package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 warehouse/analytics tier: slowly-changing-dimension
  * history, exact heavy hitters, Markov transition matrices,
  * market-basket co-occurrence, and exact z-score outlier flagging.
  * These are the downstream-warehouse passes the reference's sinks
  * feed (etl-rust routes every table to BigQuery per
  * docs/environment-variables.md:50-69); here they run engine-native.
  *
  * All five are fully DuckDB-oracled: every comparison that could
  * drift across engines is carried in integer/decimal arithmetic.
  */
object WarehouseQueries {

  // ---------------------------------------------------------------------
  // q122 — SCD Type-2 history build (validity intervals from a stream)

  /** Collapse each user's event-type stream into run-length state
    * history rows (user, state, valid_from, valid_to, n_events) — the
    * slowly-changing-dimension Type-2 build every warehouse performs
    * on a CDC feed (q78 keeps latest-wins; this keeps FULL history).
    *
    * Shape: one lag() to mark state changes, one running sum to
    * number runs, one aggregate per run, one lead() to close each
    * interval — all windows partitioned by user_id, so the build
    * parallelizes across users with no global sort and no self-join.
    * valid_to of the last run is NULL (open/current interval).
    * Timestamps compare as exact epoch millis; ties broken by
    * event_id so run numbering is engine-independent. */
  def q122Scd2History(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val runs = ev
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTime).isNull ||
             lag(col("event_type"), 1).over(byTime) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("chg")).over(byTime))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("state"),   // constant within a run
        min(col("ms")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  val q122Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
      |  FROM events WHERE user_id < 50),
      |marked AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |                   OR lag(event_type) OVER w <> event_type
      |            THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |runs AS (
      |  SELECT user_id, event_type, ms,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS run_id
      |  FROM marked),
      |hist AS (
      |  SELECT user_id, run_id, MIN(event_type) AS state,
      |    MIN(ms) AS valid_from, COUNT(*) AS n_events
      |  FROM runs GROUP BY 1, 2)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
      |  n_events
      |FROM hist ORDER BY user_id, valid_from""".stripMargin

  // ---------------------------------------------------------------------
  // q123 — exact heavy hitters (Misra-Gries candidates + exact recount)

  /** Tokens occurring in more than 1/1000 of the corpus token stream,
    * with exact counts — via `operators/HeavyHitters` (per-partition
    * Misra-Gries pass 1, exact recount of the bounded candidate set in
    * pass 2; the shuffle never carries the long-tail vocabulary). The
    * oracle is the brute-force HAVING form. */
  def q123HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tokens = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .as[String]
    graft.operators.HeavyHitters.exact(tokens, k = 1000, capacity = 2000)
  }

  val q123Sql: String =
    """WITH t AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
      |SELECT term, COUNT(*) AS cnt
      |FROM t WHERE term <> ''
      |GROUP BY 1
      |HAVING COUNT(*) * 1000 > (SELECT COUNT(*) FROM t WHERE term <> '')
      |ORDER BY cnt DESC, term""".stripMargin

  // ---------------------------------------------------------------------
  // q124 — Markov transition matrix over per-user event sequences

  /** First-order Markov transitions: for each ordered pair of event
    * types, how often does a user's next event follow the current one,
    * and with what probability. One lead() per user (ties broken by
    * event_id), one count aggregate over a |types|² key domain, one
    * tiny window for row-normalization. The probability is a single
    * int/int double division — IEEE-exact and engine-independent. */
  def q124MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("src"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("dst", lead(col("src"), 1).over(byTime))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_transitions"))
    val bySrc = Window.partitionBy(col("src"))
    pairs
      .withColumn("p",
        col("n_transitions").cast("double") / sum(col("n_transitions")).over(bySrc))
      .orderBy(col("src"), col("dst"))
  }

  val q124Sql: String =
    """WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS dst
      |  FROM events),
      |pairs AS (
      |  SELECT src, dst, COUNT(*) AS n_transitions
      |  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n_transitions,
      |  CAST(n_transitions AS DOUBLE) / SUM(n_transitions) OVER (PARTITION BY src) AS p
      |FROM pairs ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q125 — market-basket co-occurrence (top co-purchased part pairs)

  /** Part pairs appearing together in the most orders. The candidate
    * pairs are generated LOCALLY per order from its sorted item array
    * (zip-of-slices, the q85 idiom) — one shuffle to group the order,
    * zero self-joins; per-order fan-out is bounded by basket size
    * (≤ 7 in TPC-H), so the pair stream is a small constant × the
    * lineitem count at any scale. The oracle is the self-join form.
    * Top-k compiles to TakeOrderedAndProject (no global sort). */
  def q125CopurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts)), y -> struct(x AS pa, y AS pb))))"""
        .stripMargin)).as("pr"))
    pairs.select(col("pr.pa").as("part_a"), col("pr.pb").as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(50)
  }

  val q125Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |  COUNT(*) AS n_orders
      |FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, part_a, part_b
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // q126 — exact z-score outlier flagging (integer-arithmetic variance)

  /** Per-user event-value outlier counts: how many of a user's events
    * sit more than 3 population standard deviations from the user's
    * mean. The entire test runs in exact integer arithmetic so both
    * engines agree bit-for-bit: values are fixed-pointed to micro
    * units (BIGINT), and |v−μ| > 3σ is evaluated multiplied through
    * by n² — (n·v − S)² > 9·(n·Q − S²) with S = Σv, Q = Σv² carried
    * as DECIMAL(38,0). No division, no sqrt, no FP accumulation.
    *
    * Shape: one per-user aggregate, one broadcast-sized join back to
    * the stream, one per-user count — the canonical two-pass
    * anomaly-detection scan (profile pass + flag pass). */
  def q126ZscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        round(col("value") * 1000000L).cast("long").cast(d38).as("v"))
    val prof = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("v")).cast(d38).as("sv"),
        sum(col("v") * col("v")).cast(d38).as("qv"))
    ev.join(broadcast(prof), "user_id")
      .withColumn("lhs", (col("n") * col("v") - col("sv")) * (col("n") * col("v") - col("sv")))
      .withColumn("rhs", lit(9).cast(d38) * (col("n") * col("qv") - col("sv") * col("sv")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("lhs") > col("rhs"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("user_id"))
  }

  val q126Sql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(CAST(ROUND(value * 1000000) AS BIGINT) AS DECIMAL(38,0)) AS v
      |  FROM events),
      |prof AS (
      |  SELECT user_id, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
      |    CAST(SUM(v) AS DECIMAL(38,0)) AS sv,
      |    CAST(SUM(v * v) AS DECIMAL(38,0)) AS qv
      |  FROM ev GROUP BY 1)
      |SELECT ev.user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN (n * v - sv) * (n * v - sv) > 9 * (n * qv - sv * sv)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM ev JOIN prof ON ev.user_id = prof.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q127 — data-expectation validation (constraint report)

  /** The ingestion-gate constraint report: each declared expectation is
    * evaluated corpus-wide and lands as one row (rule, n_checked,
    * n_violations) — the pass a production pipeline runs before
    * publishing a snapshot (Deequ/Great-Expectations shape, engine-
    * native). Covers the three rule families: column predicates
    * (range/null/derived-consistency — one scan each, partial-agg
    * sums), referential integrity (left-anti join counts on the FK),
    * and set membership (enum allowlist). All counts exact. */
  def q127DataExpectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def pred(df: DataFrame, rule: String, bad: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_checked"),
          sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val docs = Tables.documents(s, dir)
    val ev = Tables.events(s, dir)
    val fkOrders = orders.join(
        Tables.customer(s, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders.o_custkey_fk_customer").as("rule"),
        lit(null).cast("long").as("n_checked"), col("n_violations"))
    val fkLineitem = li.join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem.l_orderkey_fk_orders").as("rule"),
        lit(null).cast("long").as("n_checked"), col("n_violations"))
    pred(orders, "orders.o_totalprice_positive", col("o_totalprice") <= 0)
      .unionByName(pred(orders, "orders.o_orderdate_not_null", col("o_orderdate").isNull))
      .unionByName(pred(li, "lineitem.l_quantity_in_1_50",
        col("l_quantity") < 1 || col("l_quantity") > 50))
      .unionByName(pred(docs, "documents.n_chars_matches_text",
        col("n_chars") =!= length(col("text"))))
      .unionByName(pred(ev, "events.event_type_in_enum",
        !col("event_type").isin("view", "click", "purchase", "error", "signup")))
      .unionByName(fkOrders)
      .unionByName(fkLineitem)
      .orderBy(col("rule"))
  }

  val q127Sql: String =
    """SELECT * FROM (
      |  SELECT 'orders.o_totalprice_positive' AS rule, COUNT(*) AS n_checked,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_orderdate_not_null', COUNT(*),
      |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_quantity_in_1_50', COUNT(*),
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'documents.n_chars_matches_text', COUNT(*),
      |    CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'events.event_type_in_enum', COUNT(*),
      |    CAST(SUM(CASE WHEN event_type NOT IN
      |      ('view', 'click', 'purchase', 'error', 'signup') THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM events
      |  UNION ALL
      |  SELECT 'orders.o_custkey_fk_customer', NULL, COUNT(*)
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey_fk_orders', NULL, COUNT(*)
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |ORDER BY rule""".stripMargin

  // ---------------------------------------------------------------------
  // q128 — snapshot diff (change-data-feed generation)

  /** Diff two table snapshots into a change feed — the reverse of q78's
    * CDC apply: OLD = orders with key % 10 ≠ 3 (simulated prior
    * snapshot), NEW = orders with key % 10 ≠ 0 and the price bumped
    * where key % 7 = 0 (simulated churn). One full-outer join on the
    * key classifies every row: insert (old absent), delete (new
    * absent), update (payload differs), unchanged — then a count
    * rollup per change type with key ranges. The join shuffles both
    * snapshots once on the key; payload comparison is row-local.
    * Exact integer/decimal comparisons only (price compared at cents
    * via round-to-long, engine-independent). */
  def q128SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val oldSnap = base.filter(pmod(col("k"), lit(10)) =!= 3)
      .select(col("k").as("k_old"), col("price_c").as("p_old"))
    val newSnap = base.filter(pmod(col("k"), lit(10)) =!= 0)
      .select(col("k").as("k_new"),
        (col("price_c") + when(pmod(col("k"), lit(7)) === 0, 100L).otherwise(0L))
          .as("p_new"))
    oldSnap.join(newSnap, col("k_old") === col("k_new"), "full_outer")
      .select(
        when(col("k_old").isNull, "insert")
          .when(col("k_new").isNull, "delete")
          .when(col("p_old") =!= col("p_new"), "update")
          .otherwise("unchanged").as("change_type"),
        coalesce(col("k_old"), col("k_new")).as("k"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .orderBy(col("change_type"))
  }

  // ---------------------------------------------------------------------
  // q130 — robust outlier flagging via median / MAD (exact integer form)

  /** The robust twin of q126: flag events more than 3 median-absolute-
    * deviations from the user's median — the estimator of choice when
    * the data itself contains the outliers that would poison a
    * mean/stddev profile. Everything runs in exact integer arithmetic:
    * values fixed-pointed to micros, and each median carried DOUBLED
    * (lo+hi of the two middle ranks, so even-count interpolation never
    * divides). |v−med| > 3·MAD is tested as 2·|2v−med2| > 3·mad4 with
    * med2 = 2·median and mad4 = 4·MAD — bit-identical in any engine.
    *
    * Shape: two ranking windows partitioned by user_id (scales with
    * the user population), two joins back on user_id; no global sort,
    * no driver collection, no FP accumulation anywhere. */
  def q130MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        round(col("value") * 1000000L).cast("long").as("v"),
        col("event_id"))
    val byU = Window.partitionBy(col("user_id"))
    def doubledMedian(df: DataFrame, c: String, out: String): DataFrame = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col(c), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byU))
      .groupBy(col("user_id"))
      .agg((sum(when(expr("rn = (n + 1) DIV 2"), col(c)).otherwise(0L)) +
            sum(when(expr("rn = (n + 2) DIV 2"), col(c)).otherwise(0L))).as(out))
    val med = doubledMedian(ev, "v", "med2")
    val dv = ev.join(med, "user_id")
      .withColumn("d", abs(lit(2L) * col("v") - col("med2")))
    val mad = doubledMedian(dv, "d", "mad4")
    dv.join(mad, "user_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (first(col("med2")).cast("double") / 2000000.0d).as("med_value"),
        (first(col("mad4")).cast("double") / 4000000.0d).as("mad_value"),
        sum(when(lit(2L) * col("d") > lit(3L) * col("mad4"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("user_id"))
  }

  val q130Sql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ROUND(value * 1000000) AS BIGINT) AS v, event_id
      |  FROM events),
      |r1 AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY v, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM ev),
      |med AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN rn = (n+1)//2 THEN v ELSE 0 END) +
      |    SUM(CASE WHEN rn = (n+2)//2 THEN v ELSE 0 END) AS med2
      |  FROM r1 GROUP BY 1),
      |dv AS (
      |  SELECT ev.user_id, ev.event_id, ev.v, med.med2,
      |    ABS(2 * ev.v - med.med2) AS d
      |  FROM ev JOIN med ON ev.user_id = med.user_id),
      |r2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY d, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM dv),
      |mad AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN rn = (n+1)//2 THEN d ELSE 0 END) +
      |    SUM(CASE WHEN rn = (n+2)//2 THEN d ELSE 0 END) AS mad4
      |  FROM r2 GROUP BY 1)
      |SELECT dv.user_id, COUNT(*) AS n_events,
      |  CAST(ANY_VALUE(dv.med2) AS DOUBLE) / 2000000.0 AS med_value,
      |  CAST(ANY_VALUE(mad.mad4) AS DOUBLE) / 4000000.0 AS mad_value,
      |  CAST(SUM(CASE WHEN 2 * dv.d > 3 * mad.mad4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dv JOIN mad ON dv.user_id = mad.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q132 — per-entity OLS trend slopes (exact fixed-point moments)

  /** Per-user linear trend of event value over time: the OLS slope
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = whole hours since the
    * user's first event and y = value in cents — the per-entity drift
    * detector a monitoring warehouse runs over every metric stream.
    * All five moments are exact DECIMAL(38,0) sums of integer terms;
    * the only FP steps are two int→double conversions and one divide
    * at the very end (numerator/denominator stay < 2⁵³, so both
    * conversions are exact in any IEEE engine). Degenerate users
    * (all events in one hour ⇒ den = 0) are filtered, not NaN'd.
    *
    * Shape: one aggregate for the per-user epoch base, one join back,
    * one moment aggregate — two shuffles on user_id total. */
  def q132TrendSlopes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("yc"))
    val base = ev.groupBy(col("user_id")).agg(min(col("ms")).as("ms0"))
    val xy = ev.join(base, "user_id")
      .select(col("user_id"),
        ((col("ms") - col("ms0")) / lit(3600000L)).cast("long").cast(d38).as("x"),
        col("yc").cast(d38).as("y"))
    xy.groupBy(col("user_id"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("den") > 0)
      .select(col("user_id"), col("n").cast("long").as("n_events"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("slope_cents_per_hour"))
      .orderBy(col("user_id"))
  }

  val q132Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) AS ms,
      |    CAST(ROUND(value * 100) AS BIGINT) AS yc
      |  FROM events),
      |base AS (SELECT user_id, MIN(ms) AS ms0 FROM ev GROUP BY 1),
      |xy AS (
      |  SELECT ev.user_id,
      |    CAST((ev.ms - base.ms0) // 3600000 AS DECIMAL(38,0)) AS x,
      |    CAST(ev.yc AS DECIMAL(38,0)) AS y
      |  FROM ev JOIN base ON ev.user_id = base.user_id),
      |st AS (
      |  SELECT user_id, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
      |  FROM xy GROUP BY 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |    AS slope_cents_per_hour
      |FROM st WHERE n*sxx - sx*sx > 0 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q154 — KMV (k-minimum-values) distinct sketches with set algebra

  /** Distinct-count sketching by k minimum hash values (Bar-Yossef et
    * al. 2002), the mergeable sketch family behind Theta sketches —
    * reported beside the EXACT counts so the estimate error is fully
    * oracled (unlike q10's HLL++, whose sketch internals are
    * engine-specific and rows-only). Four sets: event users, order
    * customers, their union, and their intersection (by inclusion-
    * exclusion — how warehouses estimate join/overlap cardinality
    * without a join).
    *
    * Determinism: the hash is the q142/q148 affine family on the key
    * mod P — injective on the sub-P key domain, so the k smallest
    * values (and hence the k-th min) are a pure function of the key
    * SET on any engine. Estimator: (k−1)·P/h_k, or the exact count
    * while the sketch is not yet full (it holds every value). Scale:
    * per-set cost is one distinct (shuffle on the hash) + a k-sized
    * top-k (TakeOrdered, never a global sort); sketches merge by
    * union-then-top-k, the same property Theta sketches exploit
    * across partitions. */
  def q154KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L; val K = 256
    def hs(df: DataFrame, key: Column): DataFrame =
      df.select(pmod(pmod(key, lit(P)) * lit(1103515245L) + lit(12345L),
        lit(P)).as("h")).distinct()
    val ha = hs(Tables.events(s, dir), col("user_id"))
    val hb = hs(Tables.orders(s, dir), col("o_custkey"))
    val hu = ha.unionByName(hb).distinct()
    // one-row frame per set: exact distinct + the KMV estimate
    def stats(h: DataFrame, suf: String): DataFrame = {
      val sk = h.orderBy(col("h")).limit(K)
        .agg(count(lit(1)).as("n_sk"), max(col("h")).as("hk"))
      val est = when(col("n_sk") < K, col("n_sk").cast("double"))
        .otherwise(round(lit((K - 1).toDouble * P) / col("hk"), 4))
      sk.crossJoin(h.agg(count(lit(1)).as("exact")))
        .select(col("exact").as(s"ex_$suf"), est.as(s"est_$suf"))
    }
    val ei = ha.join(hb, "h").agg(count(lit(1)).as("ex_i"))
    stats(ha, "a").crossJoin(stats(hb, "b")).crossJoin(stats(hu, "u"))
      .crossJoin(ei)
      .select(explode(array(
        struct(lit("events_users").as("set_name"),
          col("ex_a").as("exact_distinct"), col("est_a").as("kmv_est")),
        struct(lit("orders_custs").as("set_name"),
          col("ex_b").as("exact_distinct"), col("est_b").as("kmv_est")),
        struct(lit("union").as("set_name"),
          col("ex_u").as("exact_distinct"), col("est_u").as("kmv_est")),
        struct(lit("intersection").as("set_name"),
          col("ex_i").as("exact_distinct"),
          round(col("est_a") + col("est_b") - col("est_u"), 4).as("kmv_est"))
      )).as("r"))
      .select(col("r.set_name").as("set_name"),
        col("r.exact_distinct").as("exact_distinct"),
        col("r.kmv_est").as("kmv_est"))
      .withColumn("rel_err",
        round((col("kmv_est") - col("exact_distinct")) / col("exact_distinct"), 4))
      .orderBy(col("set_name"))
  }

  val q154Sql: String =
    """WITH ha AS (SELECT DISTINCT
      |    ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
      |  FROM events),
      |hb AS (SELECT DISTINCT
      |    ((o_custkey % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
      |  FROM orders),
      |hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
      |sa AS (SELECT COUNT(*) AS n_sk, MAX(h) AS hk
      |       FROM (SELECT h FROM ha ORDER BY h LIMIT 256)),
      |sb AS (SELECT COUNT(*) AS n_sk, MAX(h) AS hk
      |       FROM (SELECT h FROM hb ORDER BY h LIMIT 256)),
      |su AS (SELECT COUNT(*) AS n_sk, MAX(h) AS hk
      |       FROM (SELECT h FROM hu ORDER BY h LIMIT 256)),
      |va AS (SELECT ea.exact, CASE WHEN sa.n_sk < 256
      |         THEN CAST(sa.n_sk AS DOUBLE)
      |         ELSE round(255.0 * 2147483647 / sa.hk, 4) END AS est
      |       FROM sa, (SELECT COUNT(*) AS exact FROM ha) ea),
      |vb AS (SELECT eb.exact, CASE WHEN sb.n_sk < 256
      |         THEN CAST(sb.n_sk AS DOUBLE)
      |         ELSE round(255.0 * 2147483647 / sb.hk, 4) END AS est
      |       FROM sb, (SELECT COUNT(*) AS exact FROM hb) eb),
      |vu AS (SELECT eu.exact, CASE WHEN su.n_sk < 256
      |         THEN CAST(su.n_sk AS DOUBLE)
      |         ELSE round(255.0 * 2147483647 / su.hk, 4) END AS est
      |       FROM su, (SELECT COUNT(*) AS exact FROM hu) eu),
      |ei AS (SELECT COUNT(*) AS exact FROM ha JOIN hb USING (h)),
      |rows_ AS (
      |  SELECT 'events_users' AS set_name, exact AS exact_distinct,
      |    est AS kmv_est FROM va
      |  UNION ALL
      |  SELECT 'orders_custs', exact, est FROM vb
      |  UNION ALL
      |  SELECT 'union', exact, est FROM vu
      |  UNION ALL
      |  SELECT 'intersection', ei.exact,
      |    round(va.est + vb.est - vu.est, 4) FROM ei, va, vb, vu)
      |SELECT set_name, CAST(exact_distinct AS BIGINT) AS exact_distinct,
      |  kmv_est,
      |  round((kmv_est - exact_distinct) / exact_distinct, 4) AS rel_err
      |FROM rows_ ORDER BY set_name""".stripMargin

  // ---------------------------------------------------------------------
  // q157 — blocked entity resolution (blocking key + edit-distance match)

  /** Classic record-linkage shape: generate candidate pairs only WITHIN
    * a blocking key, adjudicate with an edit-distance predicate — never
    * the all-pairs cross join (Fellegi-Sunter blocking). Part names are
    * 'modifier noun'; the block is the noun, so only same-noun names
    * are compared, and the quadratic stage runs on DISTINCT names (the
    * q114 representative-collapse stance: the name vocabulary is
    * orders of magnitude smaller than the part table, and byte-equal
    * names are resolved by the collapse itself, not by Levenshtein).
    * Matched pairs carry both sides' member counts so the output
    * reports cluster mass, not just pair existence.
    *
    * Scale: block sizes are bounded by the modifier vocabulary of one
    * noun; a skewed blocking key (one noun dominating) would re-use
    * q67's salting on the block id. Levenshtein is Spark's codegen'd
    * built-in on both sides of the comparison. */
  def q157EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir)
      .select(col("p_name"), split(col("p_name"), " ").getItem(1).as("blk"))
      .groupBy(col("p_name"), col("blk")).agg(count(lit(1)).as("n_parts"))
    names.as("x").join(names.as("y"),
        col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
      .filter(levenshtein(col("x.p_name"), col("y.p_name")) <= 3)
      .select(col("x.blk").as("block"),
        col("x.p_name").as("name_a"), col("y.p_name").as("name_b"),
        levenshtein(col("x.p_name"), col("y.p_name")).as("dist"),
        col("x.n_parts").as("n_parts_a"), col("y.n_parts").as("n_parts_b"))
      .orderBy(col("block"), col("name_a"), col("name_b"))
  }

  val q157Sql: String =
    """WITH names AS (
      |  SELECT p_name, string_split(p_name, ' ')[2] AS blk,
      |    COUNT(*) AS n_parts
      |  FROM part GROUP BY 1, 2)
      |SELECT x.blk AS block, x.p_name AS name_a, y.p_name AS name_b,
      |  CAST(levenshtein(x.p_name, y.p_name) AS INTEGER) AS dist,
      |  x.n_parts AS n_parts_a, y.n_parts AS n_parts_b
      |FROM names x JOIN names y
      |  ON x.blk = y.blk AND x.p_name < y.p_name
      |WHERE levenshtein(x.p_name, y.p_name) <= 3
      |ORDER BY block, name_a, name_b""".stripMargin

  // ---------------------------------------------------------------------
  // q158 — OHLC bars (order-sensitive first/last via pure aggregation)

  /** Daily open-high-low-close bars per event type over the event
    * stream — the canonical time-series downsample. The interesting
    * part is open/close: order-sensitive "first/last by time" computed
    * as a PURE aggregate (`min_by`/`max_by` on a packed sort key), not
    * a window — so the plan is one partial-aggregatable hash aggregate
    * with no per-(type, day) sort, the shape that survives a day with
    * 10⁹ events. The sort key packs (event-time µs, event_id mod 2¹²)
    * into ONE BIGINT — a numeric key keeps the aggregate in
    * HashAggregate (a string key would demote the whole pass to
    * SortAggregate, Spark's hash buffers being primitive-only;
    * PlanSpec pins this) and the oracle's arg_min/arg_max take scalar
    * keys only. The id suffix totalizes ordering among same-µs events
    * up to id-congruence mod 4096 — event times are µs-unique in this
    * corpus (asserted nowhere cheaper than the hash gate itself), and
    * a production stream with µs collisions would widen the pack.
    * O/H/L/C are SELECTED raw doubles (no arithmetic → bit-identical
    * across engines). */
  def q158OhlcBars(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), to_date(col("ts")).as("day"),
        (unix_micros(col("ts")) * lit(4096L) + pmod(col("event_id"), lit(4096L)))
          .as("ok"))
    ev.groupBy(col("event_type"), col("day"))
      .agg(min_by(col("value"), col("ok")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ok")).as("close"),
        count(lit(1)).as("n_events"),
        // the bar's mass, not its mean: an averaged double re-rounds on a
        // division result, where the two engines' round(double, n) modes
        // can disagree at exact half-boundaries (observed at sf0.001);
        // the decimal-grid SUM is deterministic by construction and the
        // consumer divides by n_events at display time
        graft.Oracle.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"), col("day"))
  }

  val q158Sql: String =
    s"""WITH ev AS (
      |  SELECT event_type, value, CAST(ts AS DATE) AS day,
      |    epoch_us(ts) * 4096 + event_id % 4096 AS ok
      |  FROM events)
      |SELECT event_type, day,
      |  arg_min(value, ok) AS open, MAX(value) AS high, MIN(value) AS low,
      |  arg_max(value, ok) AS close, COUNT(*) AS n_events,
      |  ${graft.Oracle.dsumSql("value")} AS sum_value
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q169 — chi-square independence audit (segment × conversion)

  /** Pearson chi-square contingency terms for market segment ×
    * purchase conversion — the independence test a feature-selection
    * pass runs before trusting q160's WOE table (a high IV with a tiny
    * chi-square is noise). Per segment: observed counts, the
    * independence-expected count, and the segment's additive χ²
    * contribution (both cell terms); Σ of the column is the statistic
    * at |segments|−1 dof.
    *
    * Same fact→dimension join and 5-group aggregate as q160 (one scan,
    * one tiny totals broadcast). Expected counts are formed as
    * (rowtot·coltot)/n in DOUBLE — exact-integer inputs, one correctly-
    * rounded op each, identical cross-engine; terms round at 6dp. */
  def q169ChiSquare(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      (col("event_type") === "purchase").cast("long").as("pos"))
    val seg = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val per = ev.join(seg, "user_id")
      .groupBy(col("segment"))
      .agg(graft.Oracle.lsum(col("pos")).as("n_pos"),
        graft.Oracle.lsum(lit(1L) - col("pos")).as("n_neg"))
    val tot = per.agg(graft.Oracle.lsum(col("n_pos")).as("tp"),
      graft.Oracle.lsum(col("n_neg")).as("tn"))
    val rt = (col("n_pos") + col("n_neg")).cast("double")
    val n = (col("tp") + col("tn")).cast("double")
    val ep = rt * col("tp") / n
    val en = rt * col("tn") / n
    per.crossJoin(broadcast(tot))
      .select(col("segment"), col("n_pos"), col("n_neg"),
        round(ep, 4).as("exp_pos"),
        round((col("n_pos") - ep) * (col("n_pos") - ep) / ep +
          (col("n_neg") - en) * (col("n_neg") - en) / en, 6).as("chi2_term"))
      .orderBy(col("segment"))
  }

  val q169Sql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events),
      |per AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(1 - pos) AS BIGINT) AS n_neg
      |  FROM ev JOIN customer ON user_id = c_custkey
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
      |               CAST(SUM(n_neg) AS BIGINT) AS tn FROM per)
      |SELECT segment, n_pos, n_neg,
      |  round(CAST(n_pos + n_neg AS DOUBLE) * tp / (tp + tn), 4) AS exp_pos,
      |  round((n_pos - CAST(n_pos + n_neg AS DOUBLE) * tp / (tp + tn))
      |      * (n_pos - CAST(n_pos + n_neg AS DOUBLE) * tp / (tp + tn))
      |      / (CAST(n_pos + n_neg AS DOUBLE) * tp / (tp + tn))
      |    + (n_neg - CAST(n_pos + n_neg AS DOUBLE) * tn / (tp + tn))
      |      * (n_neg - CAST(n_pos + n_neg AS DOUBLE) * tn / (tp + tn))
      |      / (CAST(n_pos + n_neg AS DOUBLE) * tn / (tp + tn)), 6) AS chi2_term
      |FROM per CROSS JOIN tot ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------------
  // q170 — per-source distribution drift (exact Kolmogorov-Smirnov D)

  /** Exact two-sample KS statistic per source against the corpus:
    * D_s = max_v |F_s(v) − F(v)| over document lengths — the drift
    * monitor that flags a source whose length profile diverged from
    * the corpus (truncation bugs, boilerplate injection, crawler
    * changes), with the length at which the gap peaks.
    *
    * Scale: CDFs live on the (source, distinct-value) histogram — the
    * value DOMAIN (n_chars) is bounded, so the cumulative windows run
    * over domain-sized aggregates, never over documents (the q152
    * metadata/data distinction: per-source partitions are domain-sized;
    * rows never funnel through one task). D compares exact integer
    * cumulative counts as single divisions; argmax ties break on the
    * smaller length. */
  def q170KsDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("source"), col("n_chars"))
    val perSrc = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val glob = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cg"))
    val ns = perSrc.groupBy(col("source")).agg(graft.Oracle.lsum(col("c")).as("n_src"))
    val nTot = glob.agg(graft.Oracle.lsum(col("cg")).as("n_tot"))
    // per-source grid: every (source, global value) cell, 0 where absent,
    // so both CDFs step at every global value
    val grid = ns.crossJoin(glob.select(col("v"), col("cg")))
      .join(perSrc, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val bySrc = Window.partitionBy(col("source")).orderBy(col("v"))
    val cum = grid
      .withColumn("cs", sum(col("c")).over(bySrc))
      .withColumn("cgs", sum(col("cg")).over(bySrc))
      .crossJoin(broadcast(nTot))
      .select(col("source"), col("v"), col("n_src"),
        round(abs(col("cs").cast("double") / col("n_src") -
          col("cgs").cast("double") / col("n_tot")), 6).as("d"))
    cum.groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        max_by(struct(col("d"), col("v")), struct(col("d"), -col("v"))).as("m"))
      .select(col("source"), col("n_docs"),
        col("m.d").as("ks_d"), col("m.v").as("at_length"))
      .orderBy(col("source"))
  }

  val q170Sql: String =
    """WITH d AS (SELECT source, n_chars AS v FROM documents),
      |ps AS (SELECT source, v, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |g AS (SELECT v, COUNT(*) AS cg FROM d GROUP BY 1),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM ps GROUP BY 1),
      |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM d),
      |grid AS (
      |  SELECT ns.source, g.v, ns.n_src, g.cg, COALESCE(ps.c, 0) AS c
      |  FROM ns CROSS JOIN g
      |  LEFT JOIN ps ON ps.source = ns.source AND ps.v = g.v),
      |cum AS (
      |  SELECT source, v, n_src,
      |    round(abs(CAST(SUM(c) OVER w AS DOUBLE) / n_src
      |            - CAST(SUM(cg) OVER w AS DOUBLE) / nt.n_tot), 6) AS d
      |  FROM grid CROSS JOIN nt
      |  WINDOW w AS (PARTITION BY source ORDER BY v)),
      |rk AS (
      |  SELECT source, n_src, v, d, ROW_NUMBER() OVER
      |    (PARTITION BY source ORDER BY d DESC, v) AS rn
      |  FROM cum)
      |SELECT source, n_src AS n_docs, d AS ks_d, v AS at_length
      |FROM rk WHERE rn = 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q164 — association rules (support / confidence / lift)

  /** Directed association rules A→B over order baskets with the three
    * classic Agrawal-Srikant measures: support c(AB)/N, confidence
    * c(AB)/c(A), lift N·c(AB)/(c(A)·c(B)) — the rule-mining layer on
    * top of q125's co-occurrence counts.
    *
    * Shape: pair counts come from the same joinless order-local
    * expansion as q125 (no fact-table self-join anywhere); item
    * supports and the basket total are two smaller aggregates off the
    * SAME basket table, joined back vocabulary-sized (AQE broadcasts
    * while they fit). Every measure is a single division of exact
    * integers (lift is formed as one N·c_ab/(c_a·c_b) expression, not
    * confidence/expectation — one correctly-rounded double op each,
    * then the 6dp grid). Directed rules emit both orientations of each
    * unordered pair by construction. */
  def q164AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val nB = baskets.agg(count(lit(1)).cast("double").as("n_baskets"))
    val item = baskets.select(explode(col("parts")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c_p"))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts)), y -> struct(x AS pa, y AS pb))))"""
        .stripMargin)).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
    // both rule directions from each unordered pair
    val directed = pairs.select(col("pa").as("a"), col("pb").as("b"), col("c_ab"))
      .unionByName(pairs.select(col("pb").as("a"), col("pa").as("b"), col("c_ab")))
    directed
      .join(item.select(col("p").as("a"), col("c_p").as("c_a")), "a")
      .join(item.select(col("p").as("b"), col("c_p").as("c_b")), "b")
      .crossJoin(broadcast(nB))
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("c_ab"),
        round(col("c_ab") / col("n_baskets"), 6).as("support"),
        round(col("c_ab").cast("double") / col("c_a"), 6).as("confidence"),
        round((col("n_baskets") * col("c_ab")) / (col("c_a") * col("c_b")).cast("double"), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(30)
  }

  val q164Sql: String =
    // `bi` is MATERIALIZED: the basket-item postings are consumed by
    // both sides of the pair self-join (and by `item`), so inlining
    // would unnest the basket lists three times at stress scale
    """WITH b AS (
      |  SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
      |  FROM lineitem GROUP BY 1),
      |nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_baskets FROM b),
      |bi AS MATERIALIZED (SELECT l_orderkey, unnest(parts) AS p FROM b),
      |item AS (SELECT p, COUNT(*) AS c_p FROM bi GROUP BY 1),
      |pr AS (
      |  SELECT pa, pb, COUNT(*) AS c_ab FROM (
      |    SELECT x.p AS pa, y.p AS pb FROM bi x JOIN bi y
      |      ON x.l_orderkey = y.l_orderkey AND x.p < y.p)
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |d AS (SELECT pa AS a, pb AS b, c_ab FROM pr
      |      UNION ALL SELECT pb, pa, c_ab FROM pr)
      |SELECT a AS antecedent, b AS consequent, c_ab,
      |  round(c_ab / n_baskets, 6) AS support,
      |  round(CAST(c_ab AS DOUBLE) / ia.c_p, 6) AS confidence,
      |  round((n_baskets * c_ab) / CAST(ia.c_p * ib.c_p AS DOUBLE), 6) AS lift
      |FROM d JOIN item ia ON ia.p = d.a JOIN item ib ON ib.p = d.b
      |CROSS JOIN nb
      |ORDER BY lift DESC, antecedent, consequent LIMIT 30""".stripMargin

  // ---------------------------------------------------------------------
  // q165 — sketch mergeability: per-partition KMV sketches ≡ direct sketch

  /** The property that makes sketches work at 100 TB: build one KMV
    * sketch PER DAY (the ingest partition), merge the per-day sketches,
    * and the merged sketch is IDENTICAL to the sketch built over the
    * whole stream in one pass — because the global k smallest hashes
    * are each among their own day's k smallest. The report carries both
    * estimates beside the exact distinct count; merged ≡ direct is the
    * algebraic claim (SelfConsistencySpec asserts bit-equality), and
    * it is why a day's sketch can be persisted at ingest time and
    * unioned at query time without ever rescanning history.
    *
    * Shape: per-day top-k is a WindowGroupLimit (rank ≤ k inside each
    * day partition — no global sort); the merge unions day-sketches
    * (days × k rows) and takes the global top-k of that tiny set. */
  def q165KmvMerge(s: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L; val K = 256
    val hd = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"),
        pmod(pmod(col("user_id"), lit(P)) * lit(1103515245L) + lit(12345L),
          lit(P)).as("h"))
      .distinct()
    val w = Window.partitionBy(col("day")).orderBy(col("h"))
    val daySketches = hd.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K).select(col("h")).distinct()
    val exact = hd.select(col("h")).distinct().agg(count(lit(1)).as("exact"))
    def est(h: DataFrame): Column = {
      // one-row sketch stats → estimate (q154 form)
      when(col("n_sk") < K, col("n_sk").cast("double"))
        .otherwise(round(lit((K - 1).toDouble * P) / col("hk"), 4))
    }
    def sk(h: DataFrame, name: String): DataFrame =
      h.orderBy(col("h")).limit(K)
        .agg(count(lit(1)).as("n_sk"), max(col("h")).as("hk"))
        .select(lit(name).as("method"), est(h).as("kmv_est"))
    sk(hd.select(col("h")).distinct(), "direct")
      .unionByName(sk(daySketches, "merged"))
      .crossJoin(broadcast(exact))
      .select(col("method"), col("exact"), col("kmv_est"),
        round((col("kmv_est") - col("exact")) / col("exact"), 4).as("rel_err"))
      .orderBy(col("method"))
  }

  val q165Sql: String =
    """WITH hd AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
      |    ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
      |  FROM events),
      |ds AS (SELECT DISTINCT h FROM (
      |  SELECT h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
      |  FROM hd) WHERE rn <= 256),
      |gh AS (SELECT DISTINCT h FROM hd),
      |ex AS (SELECT COUNT(*) AS exact FROM gh),
      |sd AS (SELECT COUNT(*) AS n_sk, MAX(h) AS hk
      |       FROM (SELECT h FROM gh ORDER BY h LIMIT 256)),
      |sm AS (SELECT COUNT(*) AS n_sk, MAX(h) AS hk
      |       FROM (SELECT h FROM ds ORDER BY h LIMIT 256)),
      |r AS (
      |  SELECT 'direct' AS method, CASE WHEN n_sk < 256
      |    THEN CAST(n_sk AS DOUBLE)
      |    ELSE round(255.0 * 2147483647 / hk, 4) END AS kmv_est FROM sd
      |  UNION ALL
      |  SELECT 'merged', CASE WHEN n_sk < 256
      |    THEN CAST(n_sk AS DOUBLE)
      |    ELSE round(255.0 * 2147483647 / hk, 4) END FROM sm)
      |SELECT method, ex.exact, kmv_est,
      |  round((kmv_est - ex.exact) / ex.exact, 4) AS rel_err
      |FROM r CROSS JOIN ex ORDER BY method""".stripMargin

  // ---------------------------------------------------------------------
  // q160 — weight-of-evidence encoding + information value

  /** Weight-of-evidence feature encoding against a binary target
    * (purchase vs non-purchase events), per customer market segment —
    * the credit-scoring-lineage encoder feature pipelines use for
    * categorical→numeric conversion, plus each segment's information-
    * value term (IV = Σ (pos_share − neg_share)·WOE).
    *
    * Shape: fact→dimension FK join (AQE broadcasts the customer side
    * while it fits), one count aggregate per segment, one broadcast of
    * the 1-row totals. WOE's log argument is formed as a single
    * exact-integer cross-ratio (n_pos·tot_neg)/(n_neg·tot_pos) — both
    * engines evaluate ln on the identical double, and results round on
    * the 6dp grid (the q87/q94 discipline). */
  def q160WoeEncoding(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      (col("event_type") === "purchase").cast("long").as("pos"))
    val seg = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val per = ev.join(seg, "user_id")
      .groupBy(col("segment"))
      .agg(graft.Oracle.lsum(col("pos")).as("n_pos"),
        graft.Oracle.lsum(lit(1L) - col("pos")).as("n_neg"))
    val tot = per.agg(graft.Oracle.lsum(col("n_pos")).as("tp"),
      graft.Oracle.lsum(col("n_neg")).as("tn"))
    val lnArg = (col("n_pos").cast("double") * col("tn")) /
      (col("n_neg").cast("double") * col("tp"))
    per.crossJoin(broadcast(tot))
      .select(col("segment"), col("n_pos"), col("n_neg"),
        round(log(lnArg), 6).as("woe"),
        round((col("n_pos").cast("double") / col("tp") -
          col("n_neg").cast("double") / col("tn")) * log(lnArg), 6).as("iv_term"))
      .orderBy(col("segment"))
  }

  val q160Sql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events),
      |per AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(1 - pos) AS BIGINT) AS n_neg
      |  FROM ev JOIN customer ON user_id = c_custkey
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
      |               CAST(SUM(n_neg) AS BIGINT) AS tn FROM per)
      |SELECT segment, n_pos, n_neg,
      |  round(ln((CAST(n_pos AS DOUBLE) * tn) / (CAST(n_neg AS DOUBLE) * tp)), 6)
      |    AS woe,
      |  round((CAST(n_pos AS DOUBLE) / tp - CAST(n_neg AS DOUBLE) / tn)
      |    * ln((CAST(n_pos AS DOUBLE) * tn) / (CAST(n_neg AS DOUBLE) * tp)), 6)
      |    AS iv_term
      |FROM per CROSS JOIN tot ORDER BY segment""".stripMargin

  val q128Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
      |  FROM orders),
      |snap_old AS (SELECT k AS k_old, price_c AS p_old FROM base WHERE k % 10 <> 3),
      |snap_new AS (SELECT k AS k_new,
      |    price_c + CASE WHEN k % 7 = 0 THEN 100 ELSE 0 END AS p_new
      |  FROM base WHERE k % 10 <> 0)
      |SELECT CASE WHEN k_old IS NULL THEN 'insert'
      |            WHEN k_new IS NULL THEN 'delete'
      |            WHEN p_old <> p_new THEN 'update'
      |            ELSE 'unchanged' END AS change_type,
      |  COUNT(*) AS n_rows,
      |  MIN(COALESCE(k_old, k_new)) AS min_key,
      |  MAX(COALESCE(k_old, k_new)) AS max_key
      |FROM snap_old FULL OUTER JOIN snap_new ON k_old = k_new
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q224 — sequential pattern mining (supported event k-grams)

  /** Frequent behavioral patterns: the consecutive event-type bigrams
    * and trigrams whose SUPPORT (distinct users exhibiting the pattern,
    * GSP-style — not occurrence count, which one hyperactive user can
    * saturate; that distinction is q124 vs this query) reaches 10% of
    * the user base. The threshold compares exact integers
    * (support·10 ≥ n_users — no ratio FP), support and occurrence
    * counts are exact, and pattern strings are canonical `a>b>c` keys.
    *
    * Scale: sequence construction is ONE window over the per-user
    * timeline (the q124 shuffle, reused shape); patterns aggregate by
    * (k, pattern) — alphabet-bounded cardinality — and the user total
    * broadcasts as one row. No self-joins, no pattern explosion beyond
    * k ≤ 3 consecutive grams. */
  def q224SequencePatterns(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    // both grams from ONE window pass + ONE explode — a union of two
    // filtered projections of the windowed frame would re-scan and
    // re-sort it per branch (no subplan reuse across union arms)
    val grams = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("e1"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("e2", lead(col("e1"), 1).over(byTime))
      .withColumn("e3", lead(col("e1"), 2).over(byTime))
      .select(col("user_id"), explode(array(
        when(col("e2").isNotNull, struct(lit(2).as("k"),
          concat_ws(">", col("e1"), col("e2")).as("pattern"))),
        when(col("e3").isNotNull, struct(lit(3).as("k"),
          concat_ws(">", col("e1"), col("e2"), col("e3")).as("pattern")))))
        .as("g"))
      .filter(col("g").isNotNull)
      .select(col("user_id"), col("g.k").as("k"), col("g.pattern").as("pattern"))
    val users = Tables.events(s, dir)
      .agg(countDistinct(col("user_id")).as("n_users"))
    grams.groupBy(col("k"), col("pattern"))
      .agg(countDistinct(col("user_id")).as("support_users"),
        count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(users))
      .filter(col("support_users") * 10 >= col("n_users"))
      .select(col("k"), col("pattern"), col("support_users"),
        col("n_occurrences"))
      .orderBy(col("k"), col("support_users").desc,
        col("n_occurrences").desc, col("pattern"))
  }

  val q224Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
      |grams AS (
      |  SELECT user_id, 2 AS k, e1 || '>' || e2 AS pattern FROM seq
      |  WHERE e2 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 3 AS k, e1 || '>' || e2 || '>' || e3 AS pattern
      |  FROM seq WHERE e3 IS NOT NULL),
      |n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
      |SELECT k, pattern, COUNT(DISTINCT user_id) AS support_users,
      |  COUNT(*) AS n_occurrences
      |FROM grams CROSS JOIN n
      |GROUP BY 1, 2, n.n_users
      |HAVING COUNT(DISTINCT user_id) * 10 >= n.n_users
      |ORDER BY k, support_users DESC, n_occurrences DESC, pattern""".stripMargin
}

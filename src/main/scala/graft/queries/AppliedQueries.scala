package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Iteration
import graft.{Oracle, Tables}

/** Round-6 applied-pipeline tier (q202–q208 minus the graph/streaming
  * members): marketing attribution, funnel timing, CSV round-trip
  * fidelity, retrieval rank fusion, Lindley queueing backlog, and
  * Neyman-allocated stratified sampling. Same scale/determinism house
  * rules as the rest of the registry.
  */
object AppliedQueries {

  // ---------------------------------------------------------------------
  // q202 — multi-touch attribution (linear + position-based)

  /** Attribute each purchase's value across the clicks in the preceding
    * hour under two standard models: LINEAR (value/n per click) and
    * POSITION-BASED (40% first, 40% last, 20% split across middles;
    * 100%/50-50 for 1-2 clicks). The pair generation is q99's interval
    * join; click positions come from a window keyed by the purchase
    * EVENT (bounded partitions — clicks per purchase-hour); weights are
    * exact dyadic fractions times one division, summed on the decimal
    * grid. Purchases with no prior click are excluded (both models). */
  def q202Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"), col("value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ms").as("pms"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms").as("cms"), col("event_id").as("cid"))
    val pairs = p.join(c, Seq("user_id"))
      .filter(col("cms") >= col("pms") - 3600000L && col("cms") <= col("pms"))
    val byP = Window.partitionBy(col("pid"))
    val pos = pairs
      .withColumn("rk", row_number().over(byP.orderBy(col("cms"), col("cid"))))
      .withColumn("n", count(lit(1)).over(byP))
    val weighted = pos.withColumn("w_lin", col("value") / col("n"))
      .withColumn("w_pos",
        when(col("n") === 1, col("value"))
          .when(col("n") === 2, col("value") * 0.5)
          .when(col("rk") === 1 || col("rk") === col("n"), col("value") * 0.4)
          .otherwise(col("value") * 0.2 / (col("n") - 2)))
    weighted.groupBy(col("user_id"))
      .agg(countDistinct(col("pid")).as("n_purchases"),
        round(Oracle.dsum(col("w_lin")), 4).as("linear_value"),
        round(Oracle.dsum(col("w_pos")), 4).as("position_value"))
      .orderBy(col("user_id"))
  }

  val q202Sql: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms, value
      |  FROM events),
      |p AS (SELECT event_id AS pid, user_id, ms AS pms, value FROM ev
      |      WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ms AS cms, event_id AS cid FROM ev
      |      WHERE event_type = 'click'),
      |pairs AS (
      |  SELECT p.pid, p.user_id, p.value, c.cms, c.cid
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.cms BETWEEN p.pms - 3600000 AND p.pms),
      |pos AS (
      |  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY cms, cid) AS rk,
      |    COUNT(*) OVER (PARTITION BY pid) AS n
      |  FROM pairs),
      |weighted AS (
      |  SELECT user_id, pid, value / n AS w_lin,
      |    CASE WHEN n = 1 THEN value
      |      WHEN n = 2 THEN value * 0.5
      |      WHEN rk = 1 OR rk = n THEN value * 0.4
      |      ELSE value * 0.2 / (n - 2) END AS w_pos
      |  FROM pos)
      |SELECT user_id, COUNT(DISTINCT pid) AS n_purchases,
      |  ROUND(${Oracle.dsumSql("w_lin")}, 4) AS linear_value,
      |  ROUND(${Oracle.dsumSql("w_pos")}, 4) AS position_value
      |FROM weighted GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q203 — funnel stage-duration percentiles

  /** How long users take between funnel stages (signup→view→click→
    * purchase, first occurrence each, strictly ordered): exact
    * p25/p50/p75 of each stage's duration in minutes, via
    * operators/Ranks.exactGroupQuantiles — quantile_cont semantics with
    * bounded memory however large a stage group grows. Durations are
    * exact integer minutes; only users whose stage times are strictly
    * increasing count (q118's strict-order funnel stance). */
  def q203FunnelDurations(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("signup", "view", "click", "purchase"))
      .agg(min(unix_millis(col("ts"))))
    val stages = firsts
      .filter(col("signup") < col("view") && col("view") < col("click") &&
        col("click") < col("purchase"))
      .select(col("user_id"),
        expr("(view - signup) div 60000").as("signup_to_view"),
        expr("(click - view) div 60000").as("view_to_click"),
        expr("(purchase - click) div 60000").as("click_to_purchase"))
    val long = Seq("signup_to_view", "view_to_click", "click_to_purchase")
      .map(st => stages.select(lit(st).as("stage"),
        col(st).as("mins"), col("user_id")))
      .reduce(_ unionByName _)
    graft.operators.Ranks.exactGroupQuantiles(
        long, col("stage"), col("mins").cast("double"), col("user_id"),
        Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75))
      .groupBy(col("__grp").as("stage"))
      .agg(max(col("__n")).as("n_users"),
        round(min(when(col("__target") === "p25", col("__q"))), 4).as("p25_min"),
        round(min(when(col("__target") === "p50", col("__q"))), 4).as("p50_min"),
        round(min(when(col("__target") === "p75", col("__q"))), 4).as("p75_min"))
      .orderBy(col("stage"))
  }

  val q203Sql: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS s,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS c,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p
      |  FROM events GROUP BY 1),
      |ordered AS (
      |  SELECT user_id, (v - s) // 60000 AS signup_to_view,
      |    (c - v) // 60000 AS view_to_click,
      |    (p - c) // 60000 AS click_to_purchase
      |  FROM firsts WHERE s < v AND v < c AND c < p),
      |long AS (
      |  SELECT 'signup_to_view' AS stage, signup_to_view AS mins FROM ordered
      |  UNION ALL
      |  SELECT 'view_to_click', view_to_click FROM ordered
      |  UNION ALL
      |  SELECT 'click_to_purchase', click_to_purchase FROM ordered)
      |SELECT stage, COUNT(*) AS n_users,
      |  ROUND(quantile_cont(CAST(mins AS DOUBLE), 0.25), 4) AS p25_min,
      |  ROUND(quantile_cont(CAST(mins AS DOUBLE), 0.50), 4) AS p50_min,
      |  ROUND(quantile_cont(CAST(mins AS DOUBLE), 0.75), 4) AS p75_min
      |FROM long GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q204 — CSV round-trip fidelity (quoting/escaping/multiline)

  /** Adversarial CSV round-trip: a constructed column embedding the
    * delimiter, double quotes, AND a raw newline is written with full
    * quoting and read back multiLine — the fidelity audit any engine
    * must pass before CSV is allowed as an interchange format. The
    * output aggregate (row counts, mismatch count, exact length sum)
    * is computable from the base table, so the DuckDB oracle verifies
    * the round-trip preserved every byte without reading the CSV. */
  def q204CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tricky = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        concat(col("source"), lit(",\""), col("lang"), lit("\"\n"),
          substring(col("text"), 1, 40)).as("tricky"))
    val tmp = java.nio.file.Files.createTempDirectory("q204_csv").toString
    // the CSV WRITER trims trailing whitespace by default (univocity
    // ignoreTrailingWhiteSpace=true) — byte-fidelity needs it off on
    // both sides, or 'value ' round-trips as 'value'
    tricky.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(tmp)
    val back = s.read
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .schema(tricky.schema)
      .csv(tmp)
    val joined = tricky.as("a").join(back.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
    val out = joined.agg(
      count(col("a.doc_id")).as("n_written"),
      count(col("b.doc_id")).as("n_read"),
      Oracle.lsum((col("a.tricky").isNull || col("b.tricky").isNull ||
        col("a.tricky") =!= col("b.tricky")).cast("long")).as("n_mismatch"),
      Oracle.lsum(length(col("b.tricky"))).as("sum_tricky_len"))
    graft.Staging.deferDelete(out, tmp, "q204")
  }

  val q204Sql: String =
    """SELECT COUNT(*) AS n_written, COUNT(*) AS n_read,
      |  CAST(0 AS BIGINT) AS n_mismatch,
      |  CAST(SUM(length(source || ',"' || lang || '"' || chr(10) ||
      |    substring(text, 1, 40))) AS BIGINT) AS sum_tricky_len
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // q223 — XML round-trip (Spark 4's built-in XML datasource)

  /** XML interchange audit, completing the format matrix (Avro q69,
    * ORC q74, zstd-parquet q82, JSONL sinks, CSV q204): per-nation
    * order aggregates are written as XML rows (one <order> element
    * each), read back with an explicit schema, and re-aggregated from
    * the ROUND-TRIPPED values — markup-sensitive strings (an embedded
    * "<tag>&amp;" prefix forces entity escaping both ways) are length-
    * and equality-audited. The oracle computes the same aggregates from
    * the base tables, so the hash gate proves the XML path preserved
    * every value and byte without DuckDB reading XML.
    *
    * Scale: the staged write/read is one distributed columnar pass each
    * way (rowTag elements split per task); aggregation is one hash agg
    * on nation. */
  def q223XmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("nation"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"),
        concat(lit("<tag>&"), col("o_orderpriority")).as("markup"))
    val tmp = java.nio.file.Files.createTempDirectory("q223_xml").toString
    base.write.mode("overwrite")
      .option("rowTag", "order").option("rootTag", "orders")
      .format("xml").save(tmp)
    val back = s.read
      .option("rowTag", "order").schema(base.schema)
      .format("xml").load(tmp)
    val joined = base.as("a")
      .join(back.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
    val out = joined.groupBy(col("a.nation").as("nation"))
      .agg(count(col("a.o_orderkey")).as("n_written"),
        count(col("b.o_orderkey")).as("n_read"),
        Oracle.lsum(col("b.cents")).as("sum_cents"),
        Oracle.lsum((col("a.markup").isNull || col("b.markup").isNull ||
          col("a.markup") =!= col("b.markup")).cast("long")).as("n_mismatch"),
        Oracle.lsum(length(col("b.markup"))).as("sum_markup_len"))
      .orderBy(col("nation"))
    graft.Staging.deferDelete(out, tmp, "q223")
  }

  val q223Sql: String =
    """SELECT c_nationkey AS nation, COUNT(*) AS n_written,
      |  COUNT(*) AS n_read,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  CAST(0 AS BIGINT) AS n_mismatch,
      |  CAST(SUM(length('<tag>&' || o_orderpriority)) AS BIGINT)
      |    AS sum_markup_len
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q206 — reciprocal-rank fusion of two retrieval scorers

  /** Fuse a TF-IDF ranking and a BM25 ranking (k1=1.2, b=0.75) of the
    * corpus for the same query (its own top-3 non-stopword terms) via
    * RRF: score(d) = Σ 1/(60 + rank_sys(d)) — the standard ensemble
    * trick for combining retrieval systems without score calibration.
    * Ranks are integers from the sketch-bucketed global row-number
    * (ties by doc id); each RRF term is one exact division. */
  def q206RankFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val stops = StatsQueries.rakeStopwords
    val qterms = toks.filter(!col("term").isInCollection(stops))
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(3)
      .select(col("term"))
    val nn = docs.agg(count(lit(1)).as("nd"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val avgdl = lens.agg((Oracle.lsum(col("dl")).cast("double") /
      count(lit(1))).as("avgdl"))
    val tf = toks.join(broadcast(qterms), "term")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(nn)).crossJoin(broadcast(avgdl))
      .withColumn("idf", log(col("nd").cast("double") / col("df")))
      .withColumn("tfidf_t", col("tf") * col("idf"))
      .withColumn("bm25_t", col("idf") * (col("tf") * 2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(Oracle.dsum(col("tfidf_t")), 6).as("tfidf"),
        round(Oracle.dsum(col("bm25_t")), 6).as("bm25"))
      // two sketch-ranked readers × two passes each would re-run the
      // whole BM25 pipeline 4× — checkpoint the per-doc scores once
      .localCheckpoint(true, Iteration.SerLevel)
    val rankA = graft.operators.Ranks.withGlobalRowNumber(
      scored.select(col("doc_id"), col("tfidf")), "ra",
      col("tfidf") * -1, col("doc_id"))
    val rankB = graft.operators.Ranks.withGlobalRowNumber(
      scored.select(col("doc_id").as("doc_b"), col("bm25")), "rb",
      col("bm25") * -1, col("doc_b"))
    rankA.join(rankB, col("doc_id") === col("doc_b"))
      .select(col("doc_id"), col("ra"), col("rb"),
        round(lit(1.0) / (col("ra") + 60) + lit(1.0) / (col("rb") + 60), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
  }

  val q206Sql: String = {
    val stopList = StatsQueries.rakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |toks AS (SELECT doc_id, term FROM t WHERE term <> ''),
      |qterms AS (
      |  SELECT term FROM toks WHERE term NOT IN ($stopList)
      |  GROUP BY 1 ORDER BY COUNT(*) DESC, term LIMIT 3),
      |nn AS (SELECT COUNT(*) AS nd FROM documents),
      |lens AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM toks JOIN qterms USING (term) GROUP BY 1, 2),
      |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    ROUND(${Oracle.dsumSql("tf.tf * ln(CAST(nn.nd AS DOUBLE) / dfq.df)")}, 6)
      |      AS tfidf,
      |    ROUND(${Oracle.dsumSql(
           """ln(CAST(nn.nd AS DOUBLE) / dfq.df) * (CAST(tf.tf AS DOUBLE) * 2.2) /
             | (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / avgdl.avgdl))""".stripMargin.replace("\n", " "))}, 6)
      |      AS bm25
      |  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id)
      |  CROSS JOIN nn CROSS JOIN avgdl
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY tfidf DESC, doc_id) AS ra,
      |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
      |  FROM scored)
      |SELECT doc_id, ra, rb,
      |  ROUND(1.0 / (ra + 60) + 1.0 / (rb + 60), 6) AS rrf
      |FROM ranked ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q207 — Lindley-recursion backlog (queueing over event streams)

  /** Hourly service backlog per event type via the Lindley recursion
    * W_t = max(0, W_{t−1} + arrivals_t − capacity), with capacity = the
    * type's own mean hourly rate. The recursion has the closed form
    * W_t = S_t − min_{s≤t} S_s over the drift prefix sums — computable
    * with one cumulative window + one running min, NO sequential loop.
    * Everything is n-scaled exact integers (drift = n·c_t − S), so max
    * and argmax are integer decisions; one final divide per type
    * converts back to events. */
  def q207LindleyBacklog(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val st = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Oracle.lsum(col("c")).as("s"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lindley = hourly.join(st, "event_type")
      .withColumn("cum", sum(col("n") * col("c") - col("s")).over(byT))
      .withColumn("runmin", least(min(col("cum")).over(byT), lit(0L)))
      .withColumn("w", col("cum") - col("runmin"))
    lindley.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_hours"),
        max_by(struct(col("w"), -col("h")), struct(col("w"), -col("h"))).as("mx"),
        max(col("n")).as("nn"))
      .select(col("event_type"), col("n_hours"),
        round(col("mx.w").cast("double") / col("nn"), 4).as("peak_backlog"),
        (-col("mx.col2")).as("peak_hour"))
      .orderBy(col("event_type"))
  }

  val q207Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS h, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s
      |  FROM hourly GROUP BY 1),
      |cums AS (
      |  SELECT h.event_type, h.h, st.n,
      |    SUM(st.n * h.c - st.s) OVER w AS cum
      |  FROM hourly h JOIN st ON h.event_type = st.event_type
      |  WINDOW w AS (PARTITION BY h.event_type ORDER BY h.h)),
      |lind AS (
      |  SELECT event_type, h, n, cum,
      |    LEAST(MIN(cum) OVER (PARTITION BY event_type ORDER BY h), 0)
      |      AS runmin
      |  FROM cums),
      |wv AS (
      |  SELECT event_type, h, n, cum - runmin AS w,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY cum - runmin DESC, h ASC) AS rk,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n_hours
      |  FROM lind)
      |SELECT event_type, n_hours,
      |  ROUND(CAST(w AS DOUBLE) / n, 4) AS peak_backlog, h AS peak_hour
      |FROM wv WHERE rk = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q209 — Markov chain entropy rate (stationary distribution in-plan)

  /** Entropy rate of q124's user-journey Markov chain: transition
    * probabilities from exact pair counts, the stationary distribution
    * π by five power steps (π·P, each a 25-row join + aggregate on the
    * q181/q194 1e-9 decimal grid), and H = Σᵢ πᵢ·(−Σⱼ pᵢⱼ ln pᵢⱼ).
    * The chain is states×states — broadcast-sized at ANY data scale;
    * the only data-sized work is the one pair-counting aggregate. */
  def q209MarkovEntropy(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("src"),
        unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("dst", lead(col("src"), 1).over(byTime))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    val rowTot = pairs.groupBy(col("src")).agg(Oracle.lsum(col("c")).as("rt"))
    val p = pairs.join(broadcast(rowTot), "src")
      .select(col("src"), col("dst"),
        (col("c").cast("double") / col("rt")).as("p"))
      .localCheckpoint(true, Iteration.SerLevel)
    val nStates = rowTot.count().toInt
    var pi: DataFrame = rowTot.select(col("src").as("state"),
      (lit(1.0) / nStates).as("x"))
    for (_ <- 1 to 5) {
      pi = p.join(broadcast(pi), col("src") === col("state"))
        .groupBy(col("dst"))
        .agg(round(Oracle.dsum(col("p") * col("x")), 9).as("x"))
        .select(col("dst").as("state"), col("x"))
    }
    val rowH = p.groupBy(col("src").as("state"))
      .agg(round(-Oracle.dsum(col("p") * log(col("p"))), 6).as("row_entropy"))
    val joined = pi.join(broadcast(rowH), "state")
    val rate = joined.agg(round(Oracle.dsum(col("x") * col("row_entropy")), 6)
      .as("entropy_rate"))
    joined.crossJoin(broadcast(rate))
      .select(col("state"), round(col("x"), 6).as("pi"),
        col("row_entropy"), col("entropy_rate"))
      .orderBy(col("state"))
  }

  val q209Sql: String = {
    def step(k: Int): String = {
      val prev = if (k == 1) "pi0" else s"pi${k - 1}"
      s"""pi$k AS (
        |  SELECT p.dst AS state,
        |    ROUND(${Oracle.dsumSql("p.p * v.x")}, 9) AS x
        |  FROM p JOIN $prev v ON p.src = v.state GROUP BY 1)""".stripMargin
    }
    s"""WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS dst
      |  FROM events),
      |pairs AS (
      |  SELECT src, dst, COUNT(*) AS c FROM seq WHERE dst IS NOT NULL
      |  GROUP BY 1, 2),
      |rt AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rt FROM pairs GROUP BY 1),
      |p AS (
      |  SELECT pairs.src, pairs.dst, CAST(pairs.c AS DOUBLE) / rt.rt AS p
      |  FROM pairs JOIN rt ON pairs.src = rt.src),
      |ns AS (SELECT COUNT(*) AS n FROM rt),
      |pi0 AS (SELECT src AS state, 1.0 / ns.n AS x FROM rt CROSS JOIN ns),
      |${(1 to 5).map(step).mkString(",\n")},
      |rowh AS (
      |  SELECT src AS state,
      |    ROUND(-${Oracle.dsumSql("p * ln(p)")}, 6) AS row_entropy
      |  FROM p GROUP BY 1),
      |j AS (
      |  SELECT pi5.state, pi5.x, rowh.row_entropy
      |  FROM pi5 JOIN rowh ON pi5.state = rowh.state),
      |rate AS (
      |  SELECT ROUND(${Oracle.dsumSql("x * row_entropy")}, 6) AS entropy_rate
      |  FROM j)
      |SELECT state, ROUND(x, 6) AS pi, row_entropy, rate.entropy_rate
      |FROM j CROSS JOIN rate ORDER BY state""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q210 — distributed weighted quantiles (weighted median / p90)

  /** Quantity-weighted price quantiles per order priority — "half the
    * SHIPPED UNITS cost at most X" — via the new
    * operators/Ranks.weightedGroupQuantiles: cumulative weights
    * decompose over sketch buckets exactly like ranks do, so no
    * data-sized window partition exists anywhere, and the quantile
    * selection (den·cum ≥ num·W) is pure integer arithmetic. Targets:
    * the weighted median (1/2) and weighted p90 (9/10), type-1 (lower)
    * semantics mirrored by the oracle's cumulative filter. */
  def q210WeightedQuantiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("vc"),
        col("l_quantity").cast("long").as("w"),
        (col("l_orderkey") * 16 + col("l_linenumber")).as("tb"))
      // the weighted-quantile operator reads its input ~4× (cutpoint
      // sketch, cell weights, bucketed cum, totals) — checkpoint the
      // joined projection once instead of re-joining lineitem⋈orders.
      // DISK_ONLY on purpose (r13): this is the one checkpointed frame
      // whose partition geometry is fact-table-sized, and at sf100 both
      // in-memory stores fail a 24 GiB heap — the serialized store's
      // per-task whole-partition serialization burst (r12, OOM at 24
      // AND 32 GiB) and the deserialized store's 32 concurrent object
      // unrolls (r13 solo: GCLocker exhaustion at the checkpoint
      // stage). DISK_ONLY streams each partition straight to local
      // disk with bounded memory on BOTH write and read — no unroll
      // pool, no serialization buffer — which is also the only level
      // whose footprint is independent of executor count on a real
      // cluster; the operator's 4 passes become sequential local-disk
      // scans (measured: sf100 solo completes in 24 GiB, see
      // STRESS_r13).
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    graft.operators.Ranks.weightedGroupQuantiles(
        li, col("priority"), col("vc"), col("w"), col("tb"),
        Seq(("wmedian", 1, 2), ("wp90", 9, 10)))
      .groupBy(col("__grp").as("priority"))
      .agg(max(col("__wtot")).as("total_units"),
        min(when(col("__target") === "wmedian", col("__q"))).as("wmedian_cents"),
        min(when(col("__target") === "wp90", col("__q"))).as("wp90_cents"))
      .orderBy(col("priority"))
  }

  val q210Sql: String =
    """WITH li AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS vc,
      |    CAST(l_quantity AS BIGINT) AS w,
      |    l_orderkey * 16 + l_linenumber AS tb
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |cum AS (
      |  SELECT priority, vc, w,
      |    SUM(w) OVER (PARTITION BY priority ORDER BY vc, tb) AS cw
      |  FROM li),
      |tot AS (SELECT priority, CAST(SUM(w) AS BIGINT) AS W FROM li GROUP BY 1)
      |SELECT c.priority, MAX(t.W) AS total_units,
      |  MIN(CASE WHEN 2 * c.cw >= t.W THEN c.vc END) AS wmedian_cents,
      |  MIN(CASE WHEN 10 * c.cw >= 9 * t.W THEN c.vc END) AS wp90_cents
      |FROM cum c JOIN tot t ON c.priority = t.priority
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q208 — Neyman-allocated stratified sampling

  /** Optimal (Neyman) allocation of a 500-row sample budget across
    * market-segment strata — n_h ∝ N_h·σ_h — followed by the DRAW
    * itself: a deterministic Knuth-hash ranking inside each stratum
    * takes exactly the allocated count (q73's re-derivable-sample
    * argument, here with a variance-optimal budget split). σ uses
    * exact integer moments; the allocation rounds a fixed IEEE tree;
    * the sample mean of the drawn rows is an exact integer ratio. */
  def q208NeymanSample(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"), col("c_custkey"),
        expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("bal"))
    // variance moment in DECIMAL(38,0): n·Σb² − (Σb)² overflows LONG once
    // a stratum's cent-sum passes ~3e9 (measured at the 10× stress run);
    // the SQL twin keeps the moment in HUGEINT for the same headroom
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val st = cust.groupBy(col("segment"))
      .agg(count(lit(1)).as("nh"), Oracle.lsum(col("bal")).as("sb"),
        sum((col("bal") * col("bal")).cast(d38)).as("ssb"))
      .withColumn("sigma",
        sqrt((col("nh").cast(d38) * col("ssb") -
          col("sb").cast(d38) * col("sb").cast(d38)).cast("double")) /
          col("nh"))
      .withColumn("nsig", col("nh") * col("sigma"))
    val tot = st.agg(Oracle.dsum(col("nsig")).as("tot"))
    // cap at the stratum size: Neyman can demand more than a small
    // high-variance stratum holds (take-all stratum in survey terms)
    val alloc = st.crossJoin(broadcast(tot))
      .withColumn("alloc", least(col("nh"),
        round(lit(500.0) * round(col("nsig"), 6) / col("tot"), 0).cast("long")))
    val hashed = cust
      .withColumn("u", pmod(col("c_custkey") * lit(2654435761L), lit(1000000007L)))
    val ranked = graft.operators.Ranks.withGroupRowNumber(
      hashed, col("segment"), "rk", col("u"), col("c_custkey"))
    ranked.join(broadcast(alloc.select(col("segment"), col("alloc"),
        round(col("sigma"), 2).as("sigma_cents"), col("nh"))), "segment")
      .filter(col("rk") <= col("alloc"))
      .groupBy(col("segment"))
      .agg(max(col("nh")).as("stratum_size"),
        max(col("sigma_cents")).as("sigma_cents"),
        max(col("alloc")).as("allocated"),
        count(lit(1)).as("sampled"),
        round(Oracle.lsum(col("bal")).cast("double") / count(lit(1)) / 100.0, 2)
          .as("sample_mean_bal"))
      .orderBy(col("segment"))
  }

  val q208Sql: String =
    s"""WITH cust AS (
      |  SELECT c_mktsegment AS segment, c_custkey,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |st AS (
      |  -- sums stay HUGEINT: nh*ssb - sb*sb in int64 overflows at the
      |  -- sf1 stress scale (sb² ≈ 2.2e20), matching Spark's DECIMAL(38,0)
      |  SELECT segment, COUNT(*) AS nh, SUM(bal) AS sb, SUM(bal*bal) AS ssb
      |  FROM cust GROUP BY 1),
      |sg AS (
      |  SELECT segment, nh,
      |    SQRT(CAST(nh * ssb - sb * sb AS DOUBLE)) / nh AS sigma
      |  FROM st),
      |tot AS (
      |  SELECT ${Oracle.dsumSql("nh * sigma")} AS tot
      |  FROM sg),
      |alloc AS (
      |  SELECT segment, nh, ROUND(sigma, 2) AS sigma_cents,
      |    LEAST(nh, CAST(ROUND(500.0 * ROUND(nh * sigma, 6) / tot, 0) AS BIGINT))
      |      AS alloc
      |  FROM sg CROSS JOIN tot),
      |ranked AS (
      |  SELECT segment, c_custkey, bal,
      |    row_number() OVER (PARTITION BY segment
      |      ORDER BY (c_custkey * 2654435761) % 1000000007, c_custkey) AS rk
      |  FROM cust)
      |SELECT r.segment, MAX(a.nh) AS stratum_size,
      |  MAX(a.sigma_cents) AS sigma_cents, MAX(a.alloc) AS allocated,
      |  COUNT(*) AS sampled,
      |  ROUND(CAST(SUM(r.bal) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) / 100.0, 2)
      |    AS sample_mean_bal
      |FROM ranked r JOIN alloc a ON r.segment = a.segment
      |WHERE r.rk <= a.alloc
      |GROUP BY 1 ORDER BY 1""".stripMargin
}

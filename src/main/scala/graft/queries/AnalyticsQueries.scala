package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Iteration
import org.apache.spark.sql.types.DecimalType
import graft.{Oracle, Tables}

/** Round-6 advanced-analytics tier (q191–q200): mutual information,
  * positional phrase search, SAX symbolization, power-iteration PCA,
  * A/B testing, Kaplan–Meier survival, Gini concentration, winsorized
  * robust statistics, deterministic Poisson-bootstrap CIs, and
  * lexical-diversity indices.
  *
  * House rules as everywhere: one distributed aggregate does the heavy
  * lifting; series/matrix analytics run on bounded intermediates; no
  * global windows (joins or Ranks do global order); FP reaches outputs
  * through exact moments, fixed IEEE expression trees, or decimal
  * grids; ln/exp appear only under the q87 grid discipline.
  */
object AnalyticsQueries {

  // ---------------------------------------------------------------------
  // q191 — mutual information feature ranking

  /** MI(X; Y) = Σ_cells (c_xy/n)·ln(n·c_xy/(c_x·c_y)) between three
    * order features (price bin, account-balance bin, market segment)
    * and the order-status target — the model-free dependence screen
    * run next to q169's χ² and q178's split gain. Counts are exact;
    * each cell's term is one ln on integer ratios fixed to the decimal
    * grid before the (cell-count-sized) sum. */
  def q191MutualInfo(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderstatus").as("y"),
        expr("CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2500000 AS STRING)")
          .as("price_bin"),
        expr("CAST((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) div 100000 - 10 AS STRING)")
          .as("acctbal_bin"),
        col("c_mktsegment").as("segment"))
    val stacked = Seq("price_bin", "acctbal_bin", "segment")
      .map(f => base.select(lit(f).as("feature"), col(f).as("x"), col("y")))
      .reduce(_ unionByName _)
    val cells = stacked.groupBy(col("feature"), col("x"), col("y"))
      .agg(count(lit(1)).as("cxy"))
    val margX = cells.groupBy(col("feature"), col("x"))
      .agg(Oracle.lsum(col("cxy")).as("cx"))
    val margY = cells.groupBy(col("feature"), col("y"))
      .agg(Oracle.lsum(col("cxy")).as("cy"))
    val nn = cells.groupBy(col("feature")).agg(Oracle.lsum(col("cxy")).as("n"))
    cells.join(margX, Seq("feature", "x")).join(margY, Seq("feature", "y"))
      .join(broadcast(nn), "feature")
      .withColumn("term", (col("cxy").cast("double") / col("n")) *
        log(col("n").cast("double") * col("cxy") / (col("cx") * col("cy"))))
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("n_cells"),
        round(Oracle.dsum(col("term")), 6).as("mutual_info"))
      .orderBy(col("feature"))
  }

  val q191Sql: String = {
    def one(f: String, xExpr: String): String =
      s"""SELECT '$f' AS feature, $xExpr AS x, o_orderstatus AS y
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin
    s"""WITH stacked AS (
      |${one("price_bin",
         "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2500000 AS VARCHAR)")}
      |UNION ALL
      |${one("acctbal_bin",
         "CAST((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) // 100000 - 10 AS VARCHAR)")}
      |UNION ALL
      |${one("segment", "c_mktsegment")}),
      |cells AS (
      |  SELECT feature, x, y, COUNT(*) AS cxy FROM stacked GROUP BY 1, 2, 3),
      |mx AS (SELECT feature, x, CAST(SUM(cxy) AS BIGINT) AS cx
      |       FROM cells GROUP BY 1, 2),
      |my AS (SELECT feature, y, CAST(SUM(cxy) AS BIGINT) AS cy
      |       FROM cells GROUP BY 1, 2),
      |nn AS (SELECT feature, CAST(SUM(cxy) AS BIGINT) AS n
      |       FROM cells GROUP BY 1)
      |SELECT c.feature, COUNT(*) AS n_cells,
      |  ROUND(${Oracle.dsumSql(
           "(c.cxy * 1.0 / nn.n) * ln(nn.n * 1.0 * c.cxy / (mx.cx * my.cy))")}, 6)
      |    AS mutual_info
      |FROM cells c
      |JOIN mx ON c.feature = mx.feature AND c.x = mx.x
      |JOIN my ON c.feature = my.feature AND c.y = my.y
      |JOIN nn ON c.feature = nn.feature
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q192 — positional-index phrase search

  /** Exact phrase retrieval from a positional inverted index: postings
    * are (term, doc, position-after-blank-compaction); a 3-term phrase
    * is found by chaining the postings on (doc, p), (doc, p+1),
    * (doc, p+2) — the classic phrase-query plan of a search engine,
    * expressed as two equi-joins. The query set is the corpus's own
    * top-5 trigrams (deterministic, data-derived), so the result is
    * non-trivially populated at every scale. */
  def q192PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos0"))
    val postings = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokensOf(col("text")))
          .as(Seq("pos0", "term")))
      .filter(col("term") =!= "")
      .withColumn("p", row_number().over(byDoc))
      .select(col("doc_id"), col("p"), col("term"))
    val occ = postings.as("t1")
      .join(postings.as("t2"), col("t1.doc_id") === col("t2.doc_id") &&
        col("t2.p") === col("t1.p") + 1)
      .join(postings.as("t3"), col("t1.doc_id") === col("t3.doc_id") &&
        col("t3.p") === col("t1.p") + 2)
      .select(col("t1.doc_id").as("doc_id"),
        concat_ws(" ", col("t1.term"), col("t2.term"), col("t3.term"))
          .as("phrase"))
    val top5 = occ.groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("phrase")).limit(5)
    occ.join(broadcast(top5.select(col("phrase"))), "phrase")
      .groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("phrase"))
  }

  val q192Sql: String =
    """WITH ls AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |pos AS (
      |  SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM ls),
      |tk AS (
      |  SELECT doc_id, i, ts[i] AS term FROM pos WHERE ts[i] <> ''),
      |postings AS (
      |  SELECT doc_id, term,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p
      |  FROM tk),
      |occ AS (
      |  SELECT t1.doc_id, t1.term || ' ' || t2.term || ' ' || t3.term AS phrase
      |  FROM postings t1
      |  JOIN postings t2 ON t1.doc_id = t2.doc_id AND t2.p = t1.p + 1
      |  JOIN postings t3 ON t1.doc_id = t3.doc_id AND t3.p = t1.p + 2),
      |top5 AS (
      |  SELECT phrase FROM occ GROUP BY phrase
      |  ORDER BY COUNT(*) DESC, phrase LIMIT 5)
      |SELECT o.phrase, COUNT(DISTINCT o.doc_id) AS n_docs,
      |  COUNT(*) AS n_occurrences
      |FROM occ o JOIN top5 USING (phrase)
      |GROUP BY 1 ORDER BY n_occurrences DESC, phrase""".stripMargin

  // ---------------------------------------------------------------------
  // q193 — SAX symbolization (PAA + breakpoint quantization)

  /** Symbolic Aggregate approXimation of each type's daily-total
    * series: 6 piecewise-aggregate segments of 5 days, z-normalized
    * with exact integer moments ((6p−P)/√(6·ΣP²−P²) — the 6s cancel),
    * quantized against the standard 4-letter Gaussian breakpoints
    * ±0.6745/0. The output word is the time-series index key used for
    * motif/discord search at scale; everything up to the two final
    * IEEE ops (one convert, one sqrt+divide) is exact integers. */
  def q193Sax(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("d"),
        round(col("value") * 100).cast("long").as("yc"))
      .groupBy(col("event_type"), col("d"))
      .agg(Oracle.lsum(col("yc")).as("yc"))
    val mind = daily.agg(min(col("d")).as("d0"))
    val paa = daily.crossJoin(broadcast(mind))
      .withColumn("seg", expr("(d - d0) div 5"))
      .groupBy(col("event_type"), col("seg"))
      .agg(Oracle.lsum(col("yc")).as("p"), count(lit(1)).as("nd"))
      .filter(col("seg") < 6 && col("nd") === 5)
    // variance moment in DECIMAL(38,0): p ~ 1e10 cents at the sf10
    // stress scale, so p² and pp² overflow int64 (ANSI caught it loudly
    // in the sf10 bench); the q208 idiom — 128-bit-exact moments,
    // HUGEINT on the DuckDB side — restores headroom to ~10¹⁹ cents
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val st = paa.groupBy(col("event_type"))
      .agg(Oracle.lsum(col("p")).as("pp"),
        sum(col("p").cast(d38) * col("p").cast(d38)).as("ssp"),
        count(lit(1)).as("nseg"))
      .filter(col("nseg") === 6 &&
        lit(6) * col("ssp") - col("pp").cast(d38) * col("pp").cast(d38) > 0)
      // variance moment emitted once; its DOUBLE conversion goes through
      // Oracle.bigToDouble because the z sits directly under the letter
      // band comparisons — a 1-ulp-wobbly hugeint→double cast (round-9
      // advice) could flip a letter with nothing to absorb it
      .withColumn("den",
        lit(6) * col("ssp") - col("pp").cast(d38) * col("pp").cast(d38))
    val lettered = paa.join(st, "event_type")
      .withColumn("z", (lit(6) * col("p") - col("pp")).cast("double") /
        sqrt(Oracle.bigToDouble(col("den"))))
      .withColumn("letter",
        when(col("z") < -0.6745, "a").when(col("z") < 0.0, "b")
          .when(col("z") < 0.6745, "c").otherwise("d"))
    lettered.groupBy(col("event_type"))
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("seg"), col("letter")))), x => x("letter")), "")
        .as("sax_word"))
      .orderBy(col("event_type"))
  }

  val q193Sql: String =
    s"""WITH daily AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
      |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS yc
      |  FROM events GROUP BY 1, 2),
      |mind AS (SELECT MIN(d) AS d0 FROM daily),
      |paa AS (
      |  SELECT event_type, (d - d0) // 5 AS seg,
      |    CAST(SUM(yc) AS BIGINT) AS p, COUNT(*) AS nd
      |  FROM daily CROSS JOIN mind GROUP BY 1, 2
      |  HAVING (d - d0) // 5 IS NOT NULL),
      |paa6 AS (SELECT * FROM paa WHERE seg < 6 AND nd = 5),
      |st AS (
      |  SELECT event_type, CAST(SUM(p) AS BIGINT) AS pp,
      |    SUM(CAST(p AS HUGEINT)*p) AS ssp, COUNT(*) AS nseg,
      |    6*SUM(CAST(p AS HUGEINT)*p) - SUM(p)*SUM(p) AS den
      |  FROM paa6 GROUP BY 1
      |  HAVING COUNT(*) = 6 AND 6*SUM(CAST(p AS HUGEINT)*p)
      |    - SUM(p)*SUM(p) > 0),
      |lettered AS (
      |  SELECT paa6.event_type, paa6.seg,
      |    CASE
      |      WHEN CAST(6*paa6.p - st.pp AS DOUBLE) /
      |        SQRT(${graft.Oracle.bigToDoubleSql("st.den")}) < -0.6745 THEN 'a'
      |      WHEN CAST(6*paa6.p - st.pp AS DOUBLE) /
      |        SQRT(${graft.Oracle.bigToDoubleSql("st.den")}) < 0.0 THEN 'b'
      |      WHEN CAST(6*paa6.p - st.pp AS DOUBLE) /
      |        SQRT(${graft.Oracle.bigToDoubleSql("st.den")}) < 0.6745 THEN 'c'
      |      ELSE 'd' END AS letter
      |  FROM paa6 JOIN st ON paa6.event_type = st.event_type)
      |SELECT event_type, string_agg(letter, '' ORDER BY seg) AS sax_word
      |FROM lettered GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q194 — power-iteration PCA (leading eigenvector, fully in-plan)

  /** Five power-iteration steps on the embeddings' uncentered second-
    * moment matrix A = ΣxxT: the leading principal direction computed
    * entirely as relational algebra — A is a d×d aggregate (the q156
    * pair-expansion, symmetrized), each step is one broadcast-sized
    * join + aggregate, and the iterate is re-rounded to a 1e-9 grid
    * after every normalization (the q181 weight-grid discipline) so
    * both engines walk identical doubles. Output: the eigenvalue
    * (‖A·v₅‖) and all d loadings. */
  def q194PowerIteration(s: SparkSession, dir: String): DataFrame = {
    // Gram kernel: bit-identical to the posexplode²+dsum form (GramSpec
    // proves it), but one primitive-long pass instead of an n·d²/2-row
    // decimal pipeline — 48 s → ~5 s at the 10× stress scale
    val half = graft.operators.Gram.secondMoment(
      s, Tables.embeddings(s, dir), "embedding", 64)
      .select(col("i"), col("j"), col("a"))
    val aFull = half.unionByName(
        half.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("a")))
      .localCheckpoint(true, Iteration.SerLevel)
    val d = 64
    var v: DataFrame = s.range(0, d).select(col("id").cast("int").as("j"),
      lit(0.125).as("x"))
    for (_ <- 1 to 5) {
      val u = aFull.join(broadcast(v), "j")
        .groupBy(col("i")).agg(Oracle.dsum(col("a") * col("x")).as("u"))
      val nrm = u.agg(sqrt(Oracle.dsum(col("u") * col("u"))).as("nrm"))
      v = u.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), round(col("u") / col("nrm"), 9).as("x"))
    }
    val fin = aFull.join(broadcast(v), "j")
      .groupBy(col("i")).agg(Oracle.dsum(col("a") * col("x")).as("u"))
    val lam = fin.agg(round(sqrt(Oracle.dsum(col("u") * col("u"))), 6)
      .as("eigenvalue"))
    v.crossJoin(broadcast(lam))
      .select(col("j").as("dim"), col("x").as("loading"), col("eigenvalue"))
      .orderBy(col("dim"))
  }

  val q194Sql: String = {
    def step(k: Int): String = {
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s"""u$k AS (
        |  SELECT af.i, ${Oracle.dsumSql("af.a * v.x")} AS u
        |  FROM af JOIN $prev v ON af.j = v.j GROUP BY 1),
        |n$k AS (SELECT SQRT(${Oracle.dsumSql("u * u")}) AS nrm FROM u$k),
        |v$k AS (SELECT u$k.i AS j, ROUND(u$k.u / n$k.nrm, 9) AS x
        |        FROM u$k CROSS JOIN n$k)""".stripMargin
    }
    s"""WITH ereps AS MATERIALIZED (
      |  SELECT MIN(vec_id) AS vec_id, CAST(COUNT(*) AS BIGINT) AS mult,
      |    embedding
      |  FROM embeddings GROUP BY embedding),
      |xs AS (
      |  SELECT vec_id, mult, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM (SELECT vec_id, mult, embedding,
      |          unnest(range(1, len(embedding) + 1)) AS i
      |        FROM ereps)),
      |-- Gram over DISTINCT vectors, weighted by multiplicity: the
      |-- member sum of per-element grid values is exactly mult x the
      |-- distinct value's grid (integer arithmetic), so this equals the
      |-- engine's full-corpus second moment bit for bit. MATERIALIZED:
      |-- af feeds all five iteration steps plus the final products.
      |half AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS j,
      |    (CAST(CAST(SUM(CAST(round_even(a.x * b.x * 1000000.0, 0)
      |        AS BIGINT) * a.mult) AS BIGINT) AS DOUBLE) / 1000000.0) AS a
      |  FROM xs a JOIN xs b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |af AS MATERIALIZED (
      |  SELECT i, j, a FROM half
      |  UNION ALL
      |  SELECT j, i, a FROM half WHERE i <> j),
      |v0 AS (SELECT i AS j, 0.125 AS x FROM range(0, 64) t(i)),
      |${(1 to 5).map(step).mkString(",\n")},
      |fin AS (
      |  SELECT af.i, ${Oracle.dsumSql("af.a * v.x")} AS u
      |  FROM af JOIN v5 v ON af.j = v.j GROUP BY 1),
      |lam AS (SELECT ROUND(SQRT(${Oracle.dsumSql("u * u")}), 6) AS eigenvalue
      |        FROM fin)
      |SELECT v5.j AS dim, v5.x AS loading, lam.eigenvalue
      |FROM v5 CROSS JOIN lam ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q195 — A/B test readout (two-proportion z-test)

  /** Experiment analysis over a deterministic user split (parity of
    * user_id): per event type, the share of HEAVY users (≥ 15 events of
    * that type — plain ≥1 is vacuously 100% on this dense fixture) in
    * each arm, the pooled two-proportion z statistic, and the 95% Wald
    * CI of the uplift. All counts exact; z and the CI bounds are short
    * IEEE trees on exact integer ratios (sqrt is correctly rounded), so
    * 4/6dp rounding is engine-stable. */
  def q195AbTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val users = ev.select(col("user_id")).distinct()
      .select(pmod(col("user_id"), lit(2)).as("arm"))
      .groupBy(col("arm")).agg(count(lit(1)).as("n"))
    val conv = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 15)
      .select(col("event_type"), pmod(col("user_id"), lit(2)).as("arm"))
      .groupBy(col("event_type"), col("arm")).agg(count(lit(1)).as("x"))
    val wide = conv.join(broadcast(users), "arm")
      .groupBy(col("event_type"))
      .agg(max(when(col("arm") === 0, col("x"))).as("xa"),
        max(when(col("arm") === 0, col("n"))).as("na"),
        max(when(col("arm") === 1, col("x"))).as("xb"),
        max(when(col("arm") === 1, col("n"))).as("nb"))
    val pa = col("xa").cast("double") / col("na")
    val pb = col("xb").cast("double") / col("nb")
    val pool = (col("xa") + col("xb")).cast("double") / (col("na") + col("nb"))
    val sePool = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    val seW = sqrt(pa * (lit(1.0) - pa) / col("na") +
      pb * (lit(1.0) - pb) / col("nb"))
    wide.select(col("event_type"), col("xa"), col("na"), col("xb"), col("nb"),
        round((pa - pb) / sePool, 4).as("z_stat"),
        round(pa - pb - lit(1.96) * seW, 6).as("ci_lo"),
        round(pa - pb + lit(1.96) * seW, 6).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  val q195Sql: String =
    """WITH users AS (
      |  SELECT user_id % 2 AS arm, COUNT(*) AS n
      |  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
      |conv AS (
      |  SELECT event_type, user_id % 2 AS arm, COUNT(*) AS x
      |  FROM (SELECT event_type, user_id FROM events
      |        GROUP BY 1, 2 HAVING COUNT(*) >= 15) GROUP BY 1, 2),
      |wide AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN c.arm = 0 THEN x END) AS xa,
      |    MAX(CASE WHEN c.arm = 0 THEN n END) AS na,
      |    MAX(CASE WHEN c.arm = 1 THEN x END) AS xb,
      |    MAX(CASE WHEN c.arm = 1 THEN n END) AS nb
      |  FROM conv c JOIN users u ON c.arm = u.arm GROUP BY 1)
      |SELECT event_type, xa, na, xb, nb,
      |  ROUND((CAST(xa AS DOUBLE)/na - CAST(xb AS DOUBLE)/nb) /
      |    SQRT((CAST(xa + xb AS DOUBLE)/(na + nb)) *
      |      (1.0 - CAST(xa + xb AS DOUBLE)/(na + nb)) * (1.0/na + 1.0/nb)), 4)
      |    AS z_stat,
      |  ROUND(CAST(xa AS DOUBLE)/na - CAST(xb AS DOUBLE)/nb - 1.96 *
      |    SQRT((CAST(xa AS DOUBLE)/na) * (1.0 - CAST(xa AS DOUBLE)/na) / na +
      |         (CAST(xb AS DOUBLE)/nb) * (1.0 - CAST(xb AS DOUBLE)/nb) / nb), 6)
      |    AS ci_lo,
      |  ROUND(CAST(xa AS DOUBLE)/na - CAST(xb AS DOUBLE)/nb + 1.96 *
      |    SQRT((CAST(xa AS DOUBLE)/na) * (1.0 - CAST(xa AS DOUBLE)/na) / na +
      |         (CAST(xb AS DOUBLE)/nb) * (1.0 - CAST(xb AS DOUBLE)/nb) / nb), 6)
      |    AS ci_hi
      |FROM wide ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q196 — Kaplan–Meier survival (time-to-first-purchase)

  /** KM estimator of days from a user's first event to first purchase,
    * right-censored at the observation end. The curve table is tiny
    * (≤ observation days), so risk sets and the survival product use
    * bounded self-joins on the per-day aggregate — suffix/prefix sums
    * WITHOUT any global window (no single-partition exchange at any
    * scale). S(t) = exp(Σ_{s≤t} ln(1 − d/n)) on the decimal grid;
    * a time where n = d sends survival exactly to 0 via a carried
    * flag, never through ln(0). */
  def q196KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts) div 86400000").as("d"))
    val span = ev.agg(max(col("d")).as("dmax"))
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(col("d")).as("f"),
        min(when(col("event_type") === "purchase", col("d"))).as("pd"))
    val durs = firsts.crossJoin(broadcast(span))
      .select(
        when(col("pd").isNotNull, col("pd") - col("f"))
          .otherwise(col("dmax") - col("f")).as("t"),
        col("pd").isNotNull.cast("long").as("e"))
    val byT = durs.groupBy(col("t"))
      .agg(Oracle.lsum(col("e")).as("d_t"),
        (count(lit(1)) - Oracle.lsum(col("e"))).as("c_t"))
    // suffix sum (risk set) and prefix product via bounded self-joins;
    // the day table is ≤ observation-days rows at ANY scale, so the
    // inner side broadcasts (BNLJ on a bounded side, never cartesian)
    val risk = byT.as("a").join(broadcast(byT.as("b")), col("b.t") >= col("a.t"))
      .groupBy(col("a.t").as("t"), col("a.d_t").as("d_t"))
      .agg(Oracle.lsum(col("b.d_t") + col("b.c_t")).as("n_t"))
    val terms = risk.filter(col("d_t") > 0)
      .select(col("t"), col("d_t"), col("n_t"),
        when(col("n_t") > col("d_t"),
          log((col("n_t") - col("d_t")).cast("double") / col("n_t")))
          .otherwise(lit(0.0)).as("lnterm"),
        (col("n_t") === col("d_t")).cast("long").as("zero"))
    terms.as("a").join(broadcast(terms.as("b")), col("b.t") <= col("a.t"))
      .groupBy(col("a.t").as("t_days"), col("a.n_t").as("n_risk"),
        col("a.d_t").as("n_events"))
      .agg((max(col("b.zero")) === 0).as("pos"),
        Oracle.dsum(col("b.lnterm")).as("lnsum"))
      .select(col("t_days"), col("n_risk"), col("n_events"),
        when(col("pos"), round(exp(col("lnsum")), 6)).otherwise(lit(0.0))
          .as("survival"))
      .orderBy(col("t_days"))
  }

  val q196Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS d
      |  FROM events),
      |span AS (SELECT MAX(d) AS dmax FROM ev),
      |firsts AS (
      |  SELECT user_id, MIN(d) AS f,
      |    MIN(CASE WHEN event_type = 'purchase' THEN d END) AS pd
      |  FROM ev GROUP BY 1),
      |durs AS (
      |  SELECT CASE WHEN pd IS NOT NULL THEN pd - f ELSE dmax - f END AS t,
      |    CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM firsts CROSS JOIN span),
      |byt AS (
      |  SELECT t, CAST(SUM(e) AS BIGINT) AS d_t,
      |    CAST(COUNT(*) - SUM(e) AS BIGINT) AS c_t
      |  FROM durs GROUP BY 1),
      |risk AS (
      |  SELECT a.t, a.d_t, CAST(SUM(b.d_t + b.c_t) AS BIGINT) AS n_t
      |  FROM byt a JOIN byt b ON b.t >= a.t GROUP BY 1, 2),
      |terms AS (
      |  SELECT t, d_t, n_t,
      |    CASE WHEN n_t > d_t
      |      THEN ln(CAST(n_t - d_t AS DOUBLE) / n_t) ELSE 0.0 END AS lnterm,
      |    CASE WHEN n_t = d_t THEN 1 ELSE 0 END AS zero
      |  FROM risk WHERE d_t > 0)
      |SELECT a.t AS t_days, a.n_t AS n_risk, a.d_t AS n_events,
      |  CASE WHEN MAX(b.zero) = 0
      |    THEN ROUND(EXP(${Oracle.dsumSql("b.lnterm")}), 6) ELSE 0.0 END
      |    AS survival
      |FROM terms a JOIN terms b ON b.t <= a.t
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q197 — Gini concentration of customer spend (per segment)

  /** Lorenz/Gini concentration of lifetime spend within each market
    * segment: G = (2·Σ rᵢxᵢ)/(n·Σx) − (n+1)/n with x ascending —
    * revenue-concentration monitoring. Ranks come from the sketch-
    * bucketed withGroupRowNumber (no per-segment sort task); Σ rᵢxᵢ is
    * an exact DECIMAL sum, and the final expression is a fixed tree on
    * exactly-converted integers. */
  def q197Gini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(Oracle.lsum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .as("mon"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_custkey"), col("mon"))
    val ranked = graft.operators.Ranks.withGroupRowNumber(
      spend, col("segment"), "r", col("mon"), col("o_custkey"))
    ranked.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("mon").cast(d38)).as("sx"),
        sum((col("r") * col("mon")).cast(d38)).as("srx"))
      .select(col("segment"), col("n_customers"),
        round(lit(2.0) * col("srx").cast("double") /
          (col("n_customers") * col("sx")).cast("double") -
          (col("n_customers") + 1).cast("double") / col("n_customers"), 6)
          .as("gini"))
      .orderBy(col("segment"))
  }

  val q197Sql: String =
    """WITH spend AS (
      |  SELECT c_mktsegment AS segment, o_custkey,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT segment, mon,
      |    row_number() OVER (PARTITION BY segment ORDER BY mon, o_custkey)
      |      AS r
      |  FROM spend)
      |SELECT segment, COUNT(*) AS n_customers,
      |  ROUND(2.0 * CAST(SUM(CAST(r * mon AS HUGEINT)) AS DOUBLE) /
      |    CAST(COUNT(*) * SUM(CAST(mon AS HUGEINT)) AS DOUBLE) -
      |    CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q198 — winsorized robust statistics (bounded-memory quantiles)

  /** Winsorized mean/std of event values per type: clamp at the exact
    * p05/p95 (operators/Ranks.exactGroupQuantiles — quantile_cont
    * semantics with bounded memory at any group size), then exact-grid
    * moments of the clamped series. The two-pass mean→variance keeps
    * every order-dependent sum on the decimal grid.
    *
    * Grid sizing (round-10 sf10 ARITHMETIC_OVERFLOW): the squared
    * deviations are in CENTS² — |dev2| ≤ (5.7e4)² ≈ 3.3e9 per row and
    * Σdev2 ≈ rows·var ≈ 1.25e6·2.5e7 ≈ 3e13 per event_type at sf10 —
    * so the default 1e6 grid put the scaled group sum at ~3e19 > 2⁶³
    * (ANSI long sum threw, loudly). dsumScaled(·, 2) keeps the per-row
    * scaled value exact (3.3e11 < 2⁵³) and the scaled sum inside int64
    * to ~sf30000 (3e15 at sf10), while both engines still rint the
    * identical double on the identical grid. The linear wmean sum stays
    * at the 1e6 grid: Σw·1e6 ≈ 6e15 at sf10, three decades of margin. */
  def q198Winsorized(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"), col("event_id"))
    val qs = graft.operators.Ranks.exactGroupQuantiles(
        vals, col("event_type"), col("vc").cast("double"), col("event_id"),
        Seq("p05" -> 0.05, "p95" -> 0.95))
      .groupBy(col("__grp").as("event_type"))
      .agg(min(when(col("__target") === "p05", col("__q"))).as("lo"),
        min(when(col("__target") === "p95", col("__q"))).as("hi"))
    val clamped = vals.join(broadcast(qs), "event_type")
      .withColumn("w", least(greatest(col("vc").cast("double"), col("lo")),
        col("hi")))
    val means = clamped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(Oracle.dsum(col("w")) / count(lit(1)), 6).as("wmean"))
    clamped.join(broadcast(means), "event_type")
      .withColumn("dev2", (col("w") - col("wmean")) * (col("w") - col("wmean")))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        round(max(col("lo")), 2).as("p05_cents"),
        round(max(col("hi")), 2).as("p95_cents"),
        max(col("wmean")).as("winsor_mean"),
        round(sqrt(Oracle.dsumScaled(col("dev2"), 2) / max(col("n"))), 6)
          .as("winsor_std"))
      .orderBy(col("event_type"))
  }

  val q198Sql: String =
    s"""WITH vals AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |qs AS (
      |  SELECT event_type,
      |    quantile_cont(CAST(vc AS DOUBLE), 0.05) AS lo,
      |    quantile_cont(CAST(vc AS DOUBLE), 0.95) AS hi
      |  FROM vals GROUP BY 1),
      |clamped AS (
      |  SELECT v.event_type,
      |    LEAST(GREATEST(CAST(v.vc AS DOUBLE), q.lo), q.hi) AS w,
      |    q.lo, q.hi
      |  FROM vals v JOIN qs q ON v.event_type = q.event_type),
      |means AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    ROUND(${Oracle.dsumSql("w")} / COUNT(*), 6) AS wmean
      |  FROM clamped GROUP BY 1)
      |SELECT c.event_type, MAX(m.n) AS n,
      |  ROUND(MAX(c.lo), 2) AS p05_cents, ROUND(MAX(c.hi), 2) AS p95_cents,
      |  MAX(m.wmean) AS winsor_mean,
      |  ROUND(SQRT(${Oracle.dsumScaledSql(
           "(c.w - m.wmean) * (c.w - m.wmean)", 2)} / MAX(m.n)), 6) AS winsor_std
      |FROM clamped c JOIN means m ON c.event_type = m.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q199 — deterministic Poisson bootstrap (hash-replicated CI)

  /** 95% bootstrap CI of the mean order value via the Poisson(1)
    * bootstrap — the standard distributed bootstrap (each row's
    * multiplicity in replicate b is Poisson, no global resample pass).
    * Multiplicities are a PURE FUNCTION of (o_orderkey, b): a Knuth
    * multiplicative hash into [0, 1e6) cut at the exact integer-milli
    * Poisson(1) CDF thresholds — any engine, any partitioning, any
    * rerun draws the SAME 100 replicates (q95's re-derivability
    * argument applied to resampling). Replicate means are exact
    * integer ratios; the CI picks ranks 3/98 among the 100 means via a
    * bounded 100×100 rank join (no window); the SE is an exact-grid
    * std over the rounded means. */
  def q199Bootstrap(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("yc"))
    val reps = orders.crossJoin(s.range(0, 100).toDF("b"))
      .withColumn("u",
        pmod((col("o_orderkey") + col("b") * lit(1000003L)) * lit(2654435761L),
          lit(1000000L)))
      .withColumn("m",
        when(col("u") < 367879, 0).when(col("u") < 735759, 1)
          .when(col("u") < 919699, 2).when(col("u") < 981012, 3)
          .when(col("u") < 996340, 4).otherwise(5))
    val means = reps.groupBy(col("b"))
      .agg(round(Oracle.lsum(col("m") * col("yc")).cast("double") /
        Oracle.lsum(col("m")), 6).as("mean_c"))
    val ranked = means.as("a").join(broadcast(means.as("b2")),
        col("b2.mean_c") < col("a.mean_c") ||
          (col("b2.mean_c") === col("a.mean_c") && col("b2.b") <= col("a.b")))
      .groupBy(col("a.b").as("b"), col("a.mean_c").as("mean_c"))
      .agg(count(lit(1)).as("rk"))
    val point = orders.agg(
      round(Oracle.lsum(col("yc")).cast("double") / count(lit(1)), 6)
        .as("point_mean_cents"))
    val ci = ranked.agg(
      min(when(col("rk") === 3, col("mean_c"))).as("lo95"),
      min(when(col("rk") === 98, col("mean_c"))).as("hi95"))
    val se = means.agg(count(lit(1)).as("n_replicates"),
      round(Oracle.dsum(col("mean_c")) / count(lit(1)), 6).as("mm"))
      .crossJoin(means)
      .select(col("n_replicates"), col("mm"),
        ((col("mean_c") - col("mm")) * (col("mean_c") - col("mm"))).as("d2"))
      .groupBy(col("n_replicates"))
      // 1e-2 grid: d2 ~ 6e11 per replicate on small SFs, so the s=6
      // scaled sum tops 2^63 (measured 1.06e19 at sf0.001); s=2 keeps
      // 4 orders of headroom and the grid error (≤0.5 over a ~1e13
      // sum) is ~1e-8 on se — far inside the 6dp output round
      .agg(round(sqrt(Oracle.dsumScaled(col("d2"), 2) / (count(lit(1)) - 1)), 6)
        .as("se_boot"))
    point.crossJoin(broadcast(ci)).crossJoin(broadcast(se))
      .select(col("point_mean_cents"), col("lo95"), col("hi95"),
        col("se_boot"), col("n_replicates"))
  }

  val q199Sql: String =
    s"""WITH orders_c AS (
      |  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS yc
      |  FROM orders),
      |reps AS (
      |  SELECT o_orderkey, yc, b.b,
      |    ((o_orderkey + b.b * 1000003) * 2654435761) % 1000000 AS u
      |  FROM orders_c CROSS JOIN range(0, 100) b(b)),
      |mult AS (
      |  SELECT b, yc,
      |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
      |      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
      |      WHEN u < 996340 THEN 4 ELSE 5 END AS m
      |  FROM reps),
      |means AS (
      |  SELECT b, ROUND(CAST(SUM(m * yc) AS DOUBLE) /
      |    CAST(SUM(m) AS BIGINT), 6) AS mean_c
      |  FROM mult GROUP BY 1),
      |ranked AS (
      |  SELECT a.b, a.mean_c, COUNT(*) AS rk
      |  FROM means a JOIN means b2
      |    ON b2.mean_c < a.mean_c OR (b2.mean_c = a.mean_c AND b2.b <= a.b)
      |  GROUP BY 1, 2),
      |point AS (
      |  SELECT ROUND(CAST(SUM(yc) AS DOUBLE) / COUNT(*), 6)
      |    AS point_mean_cents FROM orders_c),
      |ci AS (
      |  SELECT MIN(CASE WHEN rk = 3 THEN mean_c END) AS lo95,
      |    MIN(CASE WHEN rk = 98 THEN mean_c END) AS hi95
      |  FROM ranked),
      |mstats AS (
      |  SELECT COUNT(*) AS n_replicates,
      |    ROUND(${Oracle.dsumSql("mean_c")} / COUNT(*), 6) AS mm
      |  FROM means),
      |se AS (
      |  SELECT n_replicates,
      |    ROUND(SQRT(${Oracle.dsumScaledSql(
           "(means.mean_c - mstats.mm) * (means.mean_c - mstats.mm)", 2)}
      |      / (COUNT(*) - 1)), 6) AS se_boot
      |  FROM means CROSS JOIN mstats GROUP BY 1)
      |SELECT point.point_mean_cents, ci.lo95, ci.hi95, se.se_boot,
      |  se.n_replicates
      |FROM point CROSS JOIN ci CROSS JOIN se""".stripMargin

  // ---------------------------------------------------------------------
  // q211 — isotonic calibration (exact min-max PAVA closed form)

  /** Monotone (isotonic) calibration of q168's classifier score bins:
    * the least-squares monotone fit has the closed form
    * ŷ_t = max_{i≤t} min_{j≥t} weightedAvg(pos, i..j) — computable as
    * bounded joins over the BIN table (≤10 rows at any data scale; the
    * data-sized work is the one binning aggregate). Interval averages
    * are exact integer fractions; double comparison of them is exact
    * because distinct fractions with denominators ≤ Σn can't be closer
    * than 1/(Σn)² ≫ double ulp. Complements q168 (raw reliability
    * diagram) with the production calibrator. */
  def q211IsotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val wv = Array.tabulate(64)(i => (((i * 7919 + 13) % 97 - 48) / 64.0).toFloat)
    val wn = math.sqrt(wv.map(x => x.toDouble * x.toDouble).sum)
    import org.apache.spark.sql.graft.VectorExpressions.{vecDot, vecNorm}
    val bins = Tables.embeddings(s, dir)
      .select((col("label") % 2).cast("long").as("pos"),
        round(vecDot(col("embedding"), typedlit(wv)) /
          (vecNorm(col("embedding")) * lit(wn)), 6).as("score"))
      .select(col("pos"),
        least(floor((col("score") + 1) * 5), lit(9.0)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), Oracle.lsum(col("pos")).as("np"))
      .localCheckpoint(true, Iteration.SerLevel)
    // interval averages A(i,j) for i<=j over the <=10-row bin table
    // (bounded-side broadcasts: these non-equi joins are model-sized)
    val a = bins.select(col("bin").as("i"))
      .join(broadcast(bins.select(col("bin").as("j"))), col("i") <= col("j"))
      .join(broadcast(bins.select(col("bin").as("b"), col("n"), col("np"))),
        col("b") >= col("i") && col("b") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(Oracle.lsum(col("np")).as("num"), Oracle.lsum(col("n")).as("den"))
      .withColumn("avg", col("num").cast("double") / col("den"))
    // fitted(t) = max_i<=t min_j>=t avg(i,j): expand t in [i..j]
    val inner = a.withColumn("t", explode(sequence(col("i"), col("j"))))
      .groupBy(col("t"), col("i")).agg(min(col("avg")).as("mn"))
      .groupBy(col("t")).agg(max(col("mn")).as("iso"))
    bins.join(inner, col("bin") === col("t"))
      .select(col("bin"), col("n"),
        round(col("np").cast("double") / col("n"), 6).as("raw_rate"),
        round(col("iso"), 6).as("isotonic_rate"))
      .orderBy(col("bin"))
  }

  val q211Sql: String =
    """WITH w AS (
      |  SELECT list_transform(range(0, 64),
      |    i -> CAST(((i * 7919 + 13) % 97 - 48) / 64.0 AS FLOAT)) AS wv),
      |wn AS (SELECT sqrt(list_sum(list_transform(wv,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS wn FROM w),
      |sc AS (
      |  SELECT label % 2 AS pos,
      |    round(list_sum(list_transform(range(1, len(embedding) + 1),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(wv[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
      |         * wn), 6) AS score
      |  FROM embeddings CROSS JOIN w CROSS JOIN wn),
      |bins AS (
      |  SELECT LEAST(FLOOR((score + 1) * 5), 9)::BIGINT AS bin,
      |    COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      |  FROM sc GROUP BY 1),
      |a AS (
      |  SELECT i.bin AS i, j.bin AS j,
      |    CAST(SUM(b.np) AS BIGINT) AS num, CAST(SUM(b.n) AS BIGINT) AS den
      |  FROM bins i JOIN bins j ON i.bin <= j.bin
      |  JOIN bins b ON b.bin BETWEEN i.bin AND j.bin
      |  GROUP BY 1, 2),
      |expanded AS (
      |  SELECT a.i, a.j, CAST(a.num AS DOUBLE) / a.den AS avg,
      |    unnest(range(a.i, a.j + 1)) AS t
      |  FROM a),
      |inner_min AS (
      |  SELECT t, i, MIN(avg) AS mn FROM expanded GROUP BY 1, 2),
      |iso AS (SELECT t, MAX(mn) AS iso FROM inner_min GROUP BY 1)
      |SELECT bins.bin, bins.n,
      |  ROUND(CAST(bins.np AS DOUBLE) / bins.n, 6) AS raw_rate,
      |  ROUND(iso.iso, 6) AS isotonic_rate
      |FROM bins JOIN iso ON bins.bin = iso.t
      |ORDER BY bins.bin""".stripMargin

  // ---------------------------------------------------------------------
  // q212 — split-conformal prediction intervals

  /** Distribution-free 90% prediction intervals for q182's ridge model
    * by split conformal: calibration = odd order keys, test = even; the
    * conformal radius is the ⌈(n_cal+1)·0.9⌉-th smallest absolute
    * calibration residual (exact rank via the sketch-bucketed global
    * row number — no sort task), and the reported test coverage is the
    * fraction of even-key residuals inside it. Residuals are fixed IEEE
    * trees on the 6dp-rounded betas, so the rank selection and coverage
    * comparisons are engine-stable. */
  def q212ConformalInterval(s: SparkSession, dir: String): DataFrame = {
    val betas = q182RidgeRegressionBetas(s, dir)
    val feat = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"),
        Oracle.lsum(col("l_quantity").cast("long")).as("x2"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("key"), col("x1"), col("x2"),
        expr("CAST(ROUND(o_totalprice) AS BIGINT)").as("yd"))
      .crossJoin(broadcast(betas))
      .withColumn("absres", abs(col("yd").cast("double") - (col("beta0")
        + col("beta1") * col("x1").cast("double")
        + col("beta2") * col("x2").cast("double"))))
      // five downstream actions read feat (n_cal broadcast, the two
      // Ranks passes, the q90 filter, the coverage agg) — checkpoint
      // the small per-order frame once instead of re-running the
      // lineitem aggregate + ridge solve per action
      .localCheckpoint(true, Iteration.SerLevel)
    val cal = feat.filter(pmod(col("key"), lit(2)) === 1)
    val tst = feat.filter(pmod(col("key"), lit(2)) === 0)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = graft.operators.Ranks.withGlobalRowNumber(
      cal.select(col("key"), col("absres")), "rk", col("absres"), col("key"))
    val q90 = ranked.crossJoin(broadcast(nCal))
      .filter(col("rk") === ceil((col("n_cal") + 1) * 0.9).cast("long"))
      .select(col("absres").as("q90"), col("n_cal"))
    tst.crossJoin(broadcast(q90))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        round(max(col("q90")), 4).as("q90_resid"),
        round(Oracle.lsum((col("absres") <= col("q90")).cast("long"))
          .cast("double") / count(lit(1)), 6).as("coverage"))
  }

  /** q182's Cramer solve, shared with q212 (betas only, 1 row). */
  private[queries] def q182RidgeRegressionBetas(
      s: SparkSession, dir: String): DataFrame =
    MlQueries.q182RidgeRegression(s, dir)
      .select(col("beta0"), col("beta1"), col("beta2"))

  val q212Sql: String = {
    // inline the q182 beta solve (identical expressions), then the
    // conformal split/rank/coverage
    //
    // FAILURE SIGNATURE (round-11 sf10 sweep): under disk pressure this
    // oracle has reported an INT128-overflow error that was CORRUPTED
    // SPILL, not arithmetic — all HUGEINT products here are bounded by
    // ~2.3e32 vs the 1.7e38 HUGEINT limit (OracleBoundsSpec pins the
    // bound), and the same compare passed clean when run solo. If this
    // query reds out in a parallel sweep with an overflow message, rerun
    // it solo with its own spill dir before suspecting the math.
    s"""WITH feat AS (
      |  SELECT l_orderkey AS key, CAST(COUNT(*) AS HUGEINT) AS x1,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS x2,
      |    CAST(MAX(yd) AS HUGEINT) AS yd
      |  FROM lineitem
      |  JOIN (SELECT o_orderkey, CAST(ROUND(o_totalprice) AS BIGINT) AS yd
      |        FROM orders) o ON l_orderkey = o_orderkey
      |  GROUP BY l_orderkey),
      |m AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(x1) AS s1, SUM(x2) AS s2,
      |    SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
      |    SUM(yd) AS sy, SUM(x1*yd) AS s1y, SUM(x2*yd) AS s2y
      |  FROM feat),
      |mm AS (
      |  SELECT *, n AS a, s1 AS b, s2 AS c,
      |    s11 + 100 AS d, s12 AS e, s22 + 100 AS f
      |  FROM m),
      |solved AS (
      |  SELECT
      |    ROUND(CAST(sy*(d*f - e*e) - b*(s1y*f - s2y*e) + c*(s1y*e - s2y*d)
      |      AS DOUBLE) /
      |      CAST(a*(d*f - e*e) - b*(b*f - c*e) + c*(b*e - c*d) AS DOUBLE), 6)
      |      AS beta0,
      |    ROUND(CAST(a*(s1y*f - s2y*e) - sy*(b*f - c*e) + c*(b*s2y - c*s1y)
      |      AS DOUBLE) /
      |      CAST(a*(d*f - e*e) - b*(b*f - c*e) + c*(b*e - c*d) AS DOUBLE), 6)
      |      AS beta1,
      |    ROUND(CAST(a*(d*s2y - e*s1y) - b*(b*s2y - c*s1y) + sy*(b*e - c*d)
      |      AS DOUBLE) /
      |      CAST(a*(d*f - e*e) - b*(b*f - c*e) + c*(b*e - c*d) AS DOUBLE), 6)
      |      AS beta2
      |  FROM mm),
      |res AS (
      |  SELECT f.key,
      |    ABS(CAST(f.yd AS DOUBLE) - (s.beta0 + s.beta1 * CAST(f.x1 AS DOUBLE)
      |      + s.beta2 * CAST(f.x2 AS DOUBLE))) AS absres
      |  FROM feat f CROSS JOIN solved s),
      |cal AS (SELECT * FROM res WHERE key % 2 = 1),
      |tst AS (SELECT * FROM res WHERE key % 2 = 0),
      |nc AS (SELECT COUNT(*) AS n_cal FROM cal),
      |ranked AS (
      |  SELECT absres, row_number() OVER (ORDER BY absres, key) AS rk
      |  FROM cal),
      |q90 AS (
      |  SELECT r.absres AS q90, nc.n_cal
      |  FROM ranked r CROSS JOIN nc
      |  WHERE r.rk = CAST(CEIL((nc.n_cal + 1) * 0.9) AS BIGINT))
      |SELECT MAX(q90.n_cal) AS n_cal, COUNT(*) AS n_test,
      |  ROUND(MAX(q90.q90), 4) AS q90_resid,
      |  ROUND(CAST(SUM(CASE WHEN t.absres <= q90.q90 THEN 1 ELSE 0 END)
      |    AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
      |FROM tst t CROSS JOIN q90""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q213 — per-document KL novelty (surprise vs the corpus)

  /** KL(doc ‖ corpus) over unigram distributions for the first 200
    * docs — the "how unlike the corpus is this document" score used
    * for novelty-aware sampling (dual of q87's per-token NLL: this
    * compares DISTRIBUTIONS, so verbatim-but-rare-word docs rank
    * high). Doc terms are a subset of corpus terms, so no smoothing is
    * needed and every term of the sum is finite; exact counts, one ln
    * per (doc, term) on the decimal grid. */
  def q213KlNovelty(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val corpus = toks.groupBy(col("term")).agg(count(lit(1)).as("cw"))
    val nTot = toks.agg(count(lit(1)).as("nn"))
    val dc = toks.filter(col("doc_id") < 200)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val dl = dc.groupBy(col("doc_id")).agg(Oracle.lsum(col("c")).as("len"))
    dc.join(broadcast(corpus), "term").join(broadcast(dl), "doc_id")
      .crossJoin(broadcast(nTot))
      .withColumn("term_kl", (col("c").cast("double") / col("len")) *
        log(col("c").cast("double") * col("nn") /
          (col("len").cast("double") * col("cw"))))
      .groupBy(col("doc_id"))
      .agg(max(col("len")).as("n_tokens"),
        round(Oracle.dsum(col("term_kl")), 6).as("kl_novelty"))
      .orderBy(col("doc_id"))
  }

  val q213Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |toks AS (SELECT doc_id, term FROM t WHERE term <> ''),
      |corpus AS (SELECT term, COUNT(*) AS cw FROM toks GROUP BY 1),
      |nt AS (SELECT COUNT(*) AS nn FROM toks),
      |dc AS (
      |  SELECT doc_id, term, COUNT(*) AS c FROM toks WHERE doc_id < 200
      |  GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len FROM dc GROUP BY 1)
      |SELECT dc.doc_id, MAX(dl.len) AS n_tokens,
      |  ROUND(${Oracle.dsumSql(
           """(dc.c * 1.0 / dl.len) *
             | ln(dc.c * 1.0 * nt.nn / (dl.len * 1.0 * corpus.cw))"""
             .stripMargin.replace("\n", " "))}, 6) AS kl_novelty
      |FROM dc JOIN corpus USING (term) JOIN dl USING (doc_id) CROSS JOIN nt
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q200 — lexical diversity indices

  /** Per-source vocabulary diversity: Shannon entropy (nats, via the
    * count identity H = ln n − (Σ c·ln c)/n on exact integers), its
    * exponential (effective vocabulary size), and the inverse Simpson
    * index n²/Σc² — which is EXACTLY rational, no logarithm at all.
    * The trio is the standard corpus-mix health panel next to q183's
    * Zipf fit. */
  def q200Diversity(s: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(s, dir)
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    tc.groupBy(col("source"))
      .agg(Oracle.lsum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        Oracle.dsum(col("c") * log(col("c"))).as("clnc"),
        Oracle.lsum(col("c") * col("c")).as("ss"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(log(col("n_tokens")) - col("clnc") / col("n_tokens"), 6)
          .as("shannon_h"),
        round(exp(log(col("n_tokens")) - col("clnc") / col("n_tokens")), 4)
          .as("eff_vocab"),
        round((col("n_tokens") * col("n_tokens")).cast("double") /
          col("ss"), 6).as("inv_simpson"))
      .orderBy(col("source"))
  }

  val q200Sql: String =
    s"""WITH t AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tc AS (
      |  SELECT source, term, COUNT(*) AS c FROM t WHERE term <> ''
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_types,
      |    ${Oracle.dsumSql("c * ln(c)")} AS clnc,
      |    CAST(SUM(c*c) AS BIGINT) AS ss
      |  FROM tc GROUP BY 1)
      |SELECT source, n_tokens, n_types,
      |  ROUND(ln(n_tokens) - clnc / n_tokens, 6) AS shannon_h,
      |  ROUND(EXP(ln(n_tokens) - clnc / n_tokens), 4) AS eff_vocab,
      |  ROUND(CAST(n_tokens * n_tokens AS DOUBLE) / ss, 6) AS inv_simpson
      |FROM agg ORDER BY source""".stripMargin
}

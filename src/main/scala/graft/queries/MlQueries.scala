package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.VectorExpressions.{vecDot, vecNorm}
import graft.{Oracle, Tables}

/** Round-6 distributed-ML tier: the model-adjacent passes a training-
  * data platform runs beside its corpus jobs — naive-Bayes language
  * models, decision-tree split search, k-NN evaluation, PR curves,
  * logistic-regression training, ridge regression — all expressed as
  * relational plans (no MLlib, no driver-side math): training IS a
  * sequence of aggregates, so it scales exactly like the scans.
  *
  * Determinism: integer/decimal moments everywhere; `ln`/`exp` appear
  * only under the repo's q87 discipline (per-term values fixed to a
  * decimal grid before any order-dependent sum). Model weights are
  * held on explicit decimal grids so 5 unrolled gradient steps land on
  * identical doubles in Spark and DuckDB.
  */
object MlQueries {

  /** documents → (doc_id, lang, term) whitespace unigrams. */
  private def langTerms(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")

  // ---------------------------------------------------------------------
  // q177 — multinomial naive Bayes (train + confusion matrix)

  /** Train a Laplace-smoothed multinomial NB language classifier on the
    * corpus's own labels and score every document back (training-set
    * confusion matrix — the sanity artifact before the model filters
    * anything). ln p(w|c) = ln((c_wc+1)/(tot_c+V)) per (term, class);
    * per-doc-class scores sum those on Oracle.dsum's decimal grid
    * (combine-order-free), the argmax breaks ties by class name.
    *
    * Scale: the model (vocab × 5 classes) is the ONLY state — it
    * broadcasts; scoring is one partitioned aggregate over tokens×5.
    * Nothing driver-side: train and inference are the same plan. */
  def q177NaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tt = langTerms(s, dir)
    val cls = tt.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("tot"))
    val pri = docs.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nd"))
    val nn = docs.agg(count(lit(1)).as("n"))
    val vv = tt.select(col("term")).distinct().agg(count(lit(1)).as("v"))
    val seen = tt.groupBy(col("term"), col("lang").as("cls"))
      .agg(count(lit(1)).as("c"))
    val scored = tt.select(col("doc_id"), col("term"))
      .crossJoin(broadcast(cls)).crossJoin(broadcast(vv))
      .join(broadcast(seen), Seq("term", "cls"), "left")
      .withColumn("lnp",
        log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("tot") + col("v"))))
      .groupBy(col("doc_id"), col("cls"))
      .agg(Oracle.dsum(col("lnp")).as("sl"))
    val fl = scored.join(broadcast(pri), "cls").crossJoin(broadcast(nn))
      .withColumn("score",
        round(col("sl") + log(col("nd") * lit(1.0) / col("n")), 6))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    val pred = fl.withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("predicted"))
    docs.select(col("doc_id"), col("lang").as("actual")).join(pred, "doc_id")
      .groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("predicted"))
  }

  val q177Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tt AS (SELECT doc_id, lang, term FROM t WHERE term <> ''),
      |cls AS (SELECT lang AS cls, COUNT(*) AS tot FROM tt GROUP BY 1),
      |pri AS (SELECT lang AS cls, COUNT(*) AS nd FROM documents GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |vv AS (SELECT COUNT(DISTINCT term) AS v FROM tt),
      |scored AS (
      |  SELECT tt.doc_id, c.cls,
      |    ${Oracle.dsumSql(
             "ln((COALESCE(seen.c, 0) + 1.0) / (c.tot + vv.v))")} AS sl
      |  FROM tt CROSS JOIN cls c CROSS JOIN vv
      |  LEFT JOIN (SELECT term, lang AS cls, COUNT(*) AS c FROM tt
      |             GROUP BY 1, 2) seen
      |    ON seen.term = tt.term AND seen.cls = c.cls
      |  GROUP BY 1, 2),
      |fl AS (
      |  SELECT s.doc_id, s.cls,
      |    ROUND(s.sl + ln(pri.nd * 1.0 / nn.n), 6) AS score
      |  FROM scored s JOIN pri ON s.cls = pri.cls CROSS JOIN nn),
      |pred AS (
      |  SELECT doc_id, cls AS predicted,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY score DESC, cls ASC) AS rk
      |  FROM fl)
      |SELECT d.lang AS actual, p.predicted, COUNT(*) AS n
      |FROM documents d JOIN pred p ON d.doc_id = p.doc_id AND p.rk = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q178 — decision-stump split search (exact information gain)

  /** Best binary split per feature by information gain — the inner loop
    * of distributed tree building (XGBoost/LightGBM histogram method):
    * bin each feature, one grouped count per (feature, bin, class), a
    * cumulative window turns every bin boundary into a candidate split,
    * gain = (φ(parent) − φ(left) − φ(right))/n with φ(a,b) =
    * (a+b)ln(a+b) − a·ln a − b·ln b on EXACT integer counts (x·ln x
    * with 0·ln 0 = 0) — so n·gain is deterministic to the ulp and the
    * 6dp rounding is safe. Bins use shifted integer division on exact
    * cents so negative balances floor identically on both engines. */
  def q178SplitGain(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(
        (col("o_orderstatus") === "F").cast("long").as("y"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2500000").as("price_bin"),
        (expr("(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) div 100000")
          - 10).as("acctbal_bin"))
    val stacked = base.select(lit("price_bin").as("feature"),
        col("price_bin").as("bin"), col("y"))
      .unionByName(base.select(lit("acctbal_bin").as("feature"),
        col("acctbal_bin").as("bin"), col("y")))
    val cnt = stacked.groupBy(col("feature"), col("bin"))
      .agg(Oracle.lsum(col("y")).as("c1"),
        (count(lit(1)) - Oracle.lsum(col("y"))).as("c0"))
    val byF = Window.partitionBy(col("feature")).orderBy(col("bin"))
    val allF = Window.partitionBy(col("feature"))
    def xlnx(c: Column): Column = when(c > 0, c * log(c)).otherwise(lit(0.0))
    def phi(a: Column, b: Column): Column = xlnx(a + b) - xlnx(a) - xlnx(b)
    val gains = cnt
      .withColumn("l1", sum(col("c1")).over(byF))
      .withColumn("l0", sum(col("c0")).over(byF))
      .withColumn("t1", sum(col("c1")).over(allF))
      .withColumn("t0", sum(col("c0")).over(allF))
      .filter(col("l1") + col("l0") < col("t1") + col("t0"))
      .withColumn("gain", round(
        (phi(col("t1"), col("t0")) - phi(col("l1"), col("l0"))
          - phi(col("t1") - col("l1"), col("t0") - col("l0")))
          / (col("t1") + col("t0")), 6))
    val best = Window.partitionBy(col("feature"))
      .orderBy(col("gain").desc, col("bin").asc)
    gains.withColumn("rk", row_number().over(best)).filter(col("rk") === 1)
      .select(col("feature"), col("bin").as("split_at_bin"),
        (col("l1") + col("l0")).as("n_left"),
        (col("t1") - col("l1") + col("t0") - col("l0")).as("n_right"),
        col("gain"))
      .orderBy(col("feature"))
  }

  val q178Sql: String =
    """WITH base AS (
      |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2500000 AS price_bin,
      |    (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) // 100000 - 10
      |      AS acctbal_bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |stacked AS (
      |  SELECT 'price_bin' AS feature, price_bin AS bin, y FROM base
      |  UNION ALL
      |  SELECT 'acctbal_bin', acctbal_bin, y FROM base),
      |cnt AS (
      |  SELECT feature, bin, CAST(SUM(y) AS BIGINT) AS c1,
      |    CAST(COUNT(*) - SUM(y) AS BIGINT) AS c0
      |  FROM stacked GROUP BY 1, 2),
      |cum AS (
      |  SELECT feature, bin, c1, c0,
      |    SUM(c1) OVER wo AS l1, SUM(c0) OVER wo AS l0,
      |    SUM(c1) OVER wa AS t1, SUM(c0) OVER wa AS t0
      |  FROM cnt
      |  WINDOW wo AS (PARTITION BY feature ORDER BY bin),
      |         wa AS (PARTITION BY feature)),
      |gains AS (
      |  SELECT feature, bin, l1, l0, t1, t0,
      |    ROUND((
      |      (CASE WHEN t1+t0 > 0 THEN (t1+t0)*ln(t1+t0) ELSE 0 END
      |        - CASE WHEN t1 > 0 THEN t1*ln(t1) ELSE 0 END
      |        - CASE WHEN t0 > 0 THEN t0*ln(t0) ELSE 0 END)
      |      - (CASE WHEN l1+l0 > 0 THEN (l1+l0)*ln(l1+l0) ELSE 0 END
      |        - CASE WHEN l1 > 0 THEN l1*ln(l1) ELSE 0 END
      |        - CASE WHEN l0 > 0 THEN l0*ln(l0) ELSE 0 END)
      |      - (CASE WHEN t1-l1+t0-l0 > 0 THEN (t1-l1+t0-l0)*ln(t1-l1+t0-l0) ELSE 0 END
      |        - CASE WHEN t1-l1 > 0 THEN (t1-l1)*ln(t1-l1) ELSE 0 END
      |        - CASE WHEN t0-l0 > 0 THEN (t0-l0)*ln(t0-l0) ELSE 0 END)
      |    ) / (t1 + t0), 6) AS gain
      |  FROM cum WHERE l1 + l0 < t1 + t0),
      |best AS (
      |  SELECT feature, bin, l1, l0, t1, t0, gain,
      |    row_number() OVER (PARTITION BY feature
      |                       ORDER BY gain DESC, bin ASC) AS rk
      |  FROM gains)
      |SELECT feature, bin AS split_at_bin, CAST(l1 + l0 AS BIGINT) AS n_left,
      |  CAST(t1 - l1 + t0 - l0 AS BIGINT) AS n_right, gain
      |FROM best WHERE rk = 1 ORDER BY feature""".stripMargin

  // ---------------------------------------------------------------------
  // q179 — k-NN classifier (leave-one-out evaluation)

  /** Exact k-NN (k=5, cosine) leave-one-out classification of the first
    * 500 vectors against the whole corpus — the standard embedding-
    * quality probe. Reuses q27's bit-exact double-fold cosine and its
    * WindowGroupLimit top-k (no global sort); the majority vote breaks
    * ties by (count desc, label asc), all integers. The query block is
    * fixed-size, so at 100 TB this is a broadcast of the probe set
    * streaming past the candidate scan — same shape as q27. */
  def q179KnnClassifier(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), col("label"),
        vecNorm(col("embedding")).as("nrm"))
    val queries = e.filter(col("vec_id") < 500)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("actual"), col("nrm").as("q_nrm"))
    val cands = e.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("label").as("c_label"),
      col("nrm").as("c_nrm"))
    val topw = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    val top5 = cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("cos_sim",
        round(vecDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rn", row_number().over(topw))
      .filter(col("rn") <= 5)
    val votew = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("c_label").asc)
    top5.groupBy(col("q_id"), col("actual"), col("c_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(votew))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("actual"), col("c_label").as("predicted"),
        (col("actual") === col("c_label")).cast("int").as("correct"))
      .orderBy(col("q_id"))
  }

  val q179Sql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding, label,
      |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |sims AS (
      |  SELECT q.vec_id AS q_id, q.label AS actual, c.label AS c_label,
      |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
      |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |      / (q.nrm * c.nrm), 6) AS cos_sim,
      |    c.vec_id AS c_id
      |  FROM n q JOIN n c ON q.vec_id < 500 AND q.vec_id <> c.vec_id),
      |top5 AS (
      |  SELECT q_id, actual, c_label,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY cos_sim DESC, c_id) AS rn
      |  FROM sims),
      |votes AS (
      |  SELECT q_id, actual, c_label, COUNT(*) AS votes
      |  FROM top5 WHERE rn <= 5 GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT q_id, actual, c_label,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY votes DESC, c_label ASC) AS rk
      |  FROM votes)
      |SELECT q_id, actual, c_label AS predicted,
      |  CASE WHEN actual = c_label THEN 1 ELSE 0 END AS correct
      |FROM best WHERE rk = 1 ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------------
  // q180 — precision/recall curve (threshold sweep at rank ventiles)

  /** PR curve of a fixed dyadic linear scorer (exactly-representable
    * weights (j mod 5 − 2)/4 over the first 8 dims, so the logit is a
    * bit-identical IEEE tree on both engines) evaluated at the 20 rank
    * ventiles: precision/recall/F1 from exact cumulative integer
    * counts. Complements q167 (AUC) and q168 (calibration) with the
    * operating-point view. One window cumsum, one tiny checkpoint
    * semi-join — no per-threshold rescans. */
  def q180PrCurve(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.embeddings(s, dir).select(col("vec_id"),
      (col("label") >= 5).cast("long").as("y"),
      round((0 until 8).map(j =>
        col("embedding")(j).cast("double") * lit((j % 5 - 2) / 4.0))
        .reduce(_ + _), 6).as("z"))
    // global rank WITHOUT a single-partition window: Ranks' sketch-
    // bucketed row numbering (descending score via negated lead column)
    val ranked = graft.operators.Ranks.withGlobalRowNumber(
      scored, "rn", col("z") * lit(-1.0), col("vec_id"))
    val tot = scored.agg(count(lit(1)).as("n"), Oracle.lsum(col("y")).as("pos"))
    val cks = s.range(1, 21).toDF("i").crossJoin(broadcast(tot))
      .select(expr("(i * n) div 20").as("ck"), col("pos")).distinct()
    // tp at the 20 checkpoints: bounded 20x fan-out + one aggregate
    // (cumulative-sum-free — no global window anywhere)
    val tps = ranked.crossJoin(broadcast(cks))
      .filter(col("rn") <= col("ck"))
      .groupBy(col("ck"), col("pos")).agg(Oracle.lsum(col("y")).as("tp"))
    val scoreAt = ranked.join(broadcast(cks.select(col("ck")).distinct()),
      col("rn") === col("ck")).select(col("ck").as("ck2"), col("z"))
    tps.join(scoreAt, col("ck") === col("ck2"))
      .select(col("ck").as("rank"), col("z").as("score_at"),
        round(col("tp").cast("double") / col("ck"), 6).as("precision"),
        round(col("tp").cast("double") / col("pos"), 6).as("recall"),
        round(lit(2.0) * col("tp") / (col("ck") + col("pos")), 6).as("f1"))
      .orderBy(col("rank"))
  }

  val q180Sql: String =
    """WITH scored AS (
      |  SELECT vec_id, CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
      |    ROUND(CAST(embedding[1] AS DOUBLE) * -0.5
      |      + CAST(embedding[2] AS DOUBLE) * -0.25
      |      + CAST(embedding[3] AS DOUBLE) * 0.0
      |      + CAST(embedding[4] AS DOUBLE) * 0.25
      |      + CAST(embedding[5] AS DOUBLE) * 0.5
      |      + CAST(embedding[6] AS DOUBLE) * -0.5
      |      + CAST(embedding[7] AS DOUBLE) * -0.25
      |      + CAST(embedding[8] AS DOUBLE) * 0.0, 6) AS z
      |  FROM embeddings),
      |ranked AS (
      |  SELECT y, z,
      |    row_number() OVER w AS rn, SUM(y) OVER w AS tp
      |  FROM scored WINDOW w AS (ORDER BY z DESC, vec_id)),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos FROM scored),
      |cks AS (
      |  SELECT DISTINCT CAST((i * n) // 20 AS BIGINT) AS rn, pos
      |  FROM range(1, 21) t(i) CROSS JOIN tot)
      |SELECT r.rn AS rank, r.z AS score_at,
      |  ROUND(CAST(r.tp AS DOUBLE) / r.rn, 6) AS precision,
      |  ROUND(CAST(r.tp AS DOUBLE) / c.pos, 6) AS recall,
      |  ROUND(2.0 * r.tp / (r.rn + c.pos), 6) AS f1
      |FROM ranked r JOIN cks c ON r.rn = c.rn
      |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------------
  // q181 — logistic regression by unrolled gradient descent

  /** Five full-batch gradient-descent steps of a 2-feature logistic
    * regression (predict label ≥ 5 from the first two embedding dims),
    * trained ENTIRELY inside the plan: each step is one aggregate whose
    * 1-row result broadcasts into the next — the classic iterative-ML-
    * on-a-relational-engine pattern (no driver math, no MLlib).
    *
    * Cross-engine determinism of an iterative FP computation: weights
    * live on a 1e-9 decimal grid (re-rounded after every update);
    * per-row gradient terms go to a 1e-12 decimal grid before the
    * exact sum, so partial-aggregation order can't wobble a step. The
    * only libm call is exp(); its ≤1-ulp engine spread is 3 orders
    * below the per-row grid. η = 4 (dyadic). */
  def q181LogregGd(s: SparkSession, dir: String): DataFrame = {
    val d12 = DecimalType(38, 12)
    val data = Tables.embeddings(s, dir).select(
      col("embedding")(0).cast("double").as("x1"),
      col("embedding")(1).cast("double").as("x2"),
      (col("label") >= 5).cast("double").as("y"))
    val w0 = data.sparkSession.sql(
      "SELECT CAST(0.0 AS DOUBLE) w1, CAST(0.0 AS DOUBLE) w2, CAST(0.0 AS DOUBLE) b")
    def withP(w: DataFrame): DataFrame =
      data.crossJoin(broadcast(w))
        .withColumn("z", col("b") + col("w1") * col("x1") + col("w2") * col("x2"))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
    def step(w: DataFrame): DataFrame = {
      def g(t: Column): Column =
        round(sum(t.cast(d12)).cast("double") / count(lit(1)), 9)
      withP(w).agg(
          g((col("p") - col("y")) * col("x1")).as("g1"),
          g((col("p") - col("y")) * col("x2")).as("g2"),
          g(col("p") - col("y")).as("gb"))
        .crossJoin(w)
        .select(round(col("w1") - lit(4.0) * col("g1"), 9).as("w1"),
          round(col("w2") - lit(4.0) * col("g2"), 9).as("w2"),
          round(col("b") - lit(4.0) * col("gb"), 9).as("b"))
    }
    val wf = (1 to 5).foldLeft(w0)((w, _) => step(w))
    withP(wf).agg(
        max(col("w1")).as("w1"), max(col("w2")).as("w2"), max(col("b")).as("b"),
        count(lit(1)).as("n"),
        Oracle.lsum(((col("z") > 0) === (col("y") > 0.5)).cast("long"))
          .as("n_correct"),
        round(-Oracle.dsum(
            when(col("y") > 0.5, log(col("p"))).otherwise(log(lit(1.0) - col("p"))))
          / count(lit(1)), 4).as("logloss"))
  }

  val q181Sql: String = {
    // one gradient step: wK from wK-1, all grids mirrored from the Spark side
    def step(k: Int): String = {
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      s"""g$k AS (
        |  SELECT
        |    ROUND(CAST(SUM(CAST((p - y) * x1 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9) AS g1,
        |    ROUND(CAST(SUM(CAST((p - y) * x2 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9) AS g2,
        |    ROUND(CAST(SUM(CAST((p - y) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9) AS gb
        |  FROM (SELECT d.*, 1.0 / (1.0 + exp(-(w.b + w.w1*d.x1 + w.w2*d.x2))) AS p
        |        FROM data d CROSS JOIN $prev w)),
        |w$k AS (
        |  SELECT ROUND(w.w1 - 4.0 * g.g1, 9) AS w1,
        |    ROUND(w.w2 - 4.0 * g.g2, 9) AS w2,
        |    ROUND(w.b - 4.0 * g.gb, 9) AS b
        |  FROM $prev w CROSS JOIN g$k g)""".stripMargin
    }
    s"""WITH data AS (
      |  SELECT CAST(embedding[1] AS DOUBLE) AS x1,
      |    CAST(embedding[2] AS DOUBLE) AS x2,
      |    CASE WHEN label >= 5 THEN 1.0 ELSE 0.0 END AS y
      |  FROM embeddings),
      |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2,
      |       CAST(0.0 AS DOUBLE) AS b),
      |${(1 to 5).map(step).mkString(",\n")},
      |fin AS (SELECT d.*, w.w1, w.w2, w.b,
      |    w.b + w.w1*d.x1 + w.w2*d.x2 AS z,
      |    1.0 / (1.0 + exp(-(w.b + w.w1*d.x1 + w.w2*d.x2))) AS p
      |  FROM data d CROSS JOIN w5 w)
      |SELECT MAX(w1) AS w1, MAX(w2) AS w2, MAX(b) AS b, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN (z > 0) = (y > 0.5) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_correct,
      |  ROUND(-${Oracle.dsumSql(
           "CASE WHEN y > 0.5 THEN ln(p) ELSE ln(1.0 - p) END")} / COUNT(*), 4)
      |    AS logloss
      |FROM fin""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q182 — ridge regression (closed-form normal equations, exact Cramer)

  /** Closed-form ridge (λ=100, intercept unpenalized — so training R²
    * is provably in [0,1]) of o_totalprice (whole dollars) on two
    * order-shape features (line count, total quantity): all nine
    * moments are exact DECIMAL(38,0)/HUGEINT sums, the 3×3 system
    * (X'X+λI')β = X'y solves by Cramer's rule in EXACT integer
    * arithmetic (cofactor terms ≤ ~1e24 ≪ 10^38), and the only FP is
    * the final determinant ratios + the R² pass with the 6dp-rounded
    * coefficients. Linear-model training as two aggregates and a
    * handful of scalar expressions — nothing iterative, nothing
    * driver-side, scales as the lineitem scan. */
  def q182RidgeRegression(s: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val feat = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"),
        Oracle.lsum(col("l_quantity").cast("long")).as("x2"))
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("x1").cast(d38).as("x1"), col("x2").cast(d38).as("x2"),
        expr("CAST(ROUND(o_totalprice) AS BIGINT)").cast(d38).as("yd"))
    val lam = lit(BigDecimal(100)).cast(d38)
    val m = feat.agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("yd")).as("sy"),
      sum(col("x1") * col("yd")).as("s1y"),
      sum(col("x2") * col("yd")).as("s2y"),
      sum(col("yd") * col("yd")).as("syy"))
    // symmetric M = [[a,b,c],[b,d,e],[c,e,f]], rhs = [r0,r1,r2]
    val solved = m
      .withColumn("a", col("n")).withColumn("b", col("s1"))
      .withColumn("c", col("s2")).withColumn("d", col("s11") + lam)
      .withColumn("e", col("s12")).withColumn("f", col("s22") + lam)
      .withColumn("det",
        col("a") * (col("d") * col("f") - col("e") * col("e"))
          - col("b") * (col("b") * col("f") - col("c") * col("e"))
          + col("c") * (col("b") * col("e") - col("c") * col("d")))
      .withColumn("det0",
        col("sy") * (col("d") * col("f") - col("e") * col("e"))
          - col("b") * (col("s1y") * col("f") - col("s2y") * col("e"))
          + col("c") * (col("s1y") * col("e") - col("s2y") * col("d")))
      .withColumn("det1",
        col("a") * (col("s1y") * col("f") - col("s2y") * col("e"))
          - col("sy") * (col("b") * col("f") - col("c") * col("e"))
          + col("c") * (col("b") * col("s2y") - col("c") * col("s1y")))
      .withColumn("det2",
        col("a") * (col("d") * col("s2y") - col("e") * col("s1y"))
          - col("b") * (col("b") * col("s2y") - col("c") * col("s1y"))
          + col("sy") * (col("b") * col("e") - col("c") * col("d")))
      .select(
        round(col("det0").cast("double") / col("det").cast("double"), 6).as("beta0"),
        round(col("det1").cast("double") / col("det").cast("double"), 6).as("beta1"),
        round(col("det2").cast("double") / col("det").cast("double"), 6).as("beta2"),
        col("n").cast("long").as("n"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("sst_n"))
    val resid = feat.crossJoin(broadcast(solved))
      .withColumn("r", col("yd").cast("double") - (col("beta0")
        + col("beta1") * col("x1").cast("double")
        + col("beta2") * col("x2").cast("double")))
      .agg(max(col("beta0")).as("beta0"), max(col("beta1")).as("beta1"),
        max(col("beta2")).as("beta2"), max(col("n")).as("n"),
        round(lit(1.0) - sum((col("r") * col("r")).cast(DecimalType(38, 4)))
            .cast("double") * max(col("n")).cast("double")
            / max(col("sst_n")).cast("double"), 6)
          .as("r2"))
    resid
  }

  val q182Sql: String =
    """WITH feat AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS x1,
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
      |    SUM(yd) AS sy, SUM(x1*yd) AS s1y, SUM(x2*yd) AS s2y,
      |    SUM(yd*yd) AS syy
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
      |      AS beta2,
      |    CAST(n AS BIGINT) AS n, n*syy - sy*sy AS sst_n
      |  FROM mm)
      |SELECT MAX(beta0) AS beta0, MAX(beta1) AS beta1, MAX(beta2) AS beta2,
      |  MAX(n) AS n,
      |  ROUND(1.0 - CAST(SUM(CAST(r*r AS DECIMAL(38,4))) AS DOUBLE)
      |    * CAST(MAX(n) AS DOUBLE) / CAST(MAX(sst_n) AS DOUBLE), 6) AS r2
      |FROM (
      |  SELECT f.yd, s.beta0, s.beta1, s.beta2, s.n, s.sst_n,
      |    CAST(f.yd AS DOUBLE) - (s.beta0 + s.beta1 * CAST(f.x1 AS DOUBLE)
      |      + s.beta2 * CAST(f.x2 AS DOUBLE)) AS r
      |  FROM feat f CROSS JOIN solved s) q""".stripMargin

  // ---------------------------------------------------------------------
  // q219 — inter-rater agreement (Cohen's kappa)

  /** Cohen's kappa between two deterministic document "raters" — the
    * agreement statistic a labeling pipeline reports when two weak
    * labelers (or a model vs a heuristic) grade the same corpus. Rater
    * A bands by raw length (n_chars div 128, capped at 3); rater B by
    * token count (tokens div 24, capped at 3) — correlated but not
    * identical, so kappa is informative. Per language:
    * κ = (p_o − p_e)/(1 − p_e) with p_o = Σ_k n_kk / N and
    * p_e = Σ_k rowA_k·colB_k / N² — every moment an exact BIGINT from
    * one contingency aggregate, then a single IEEE expression tree.
    *
    * Scale: tokenize is scan-local; the contingency table is one hash
    * aggregate keyed (lang, bandA, bandB) — at most 16 cells per
    * language — and kappa assembles on the lang-sized rollup. */
  def q219CohensKappa(s: SparkSession, dir: String): DataFrame = {
    val banded = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(filter(graft.functions.TextFunctions.tokensOf(col("text")),
          t => t =!= "")).as("n_tok"))
      .select(col("lang"),
        least(expr("n_chars div 128"), lit(3)).cast("int").as("ba"),
        least(expr("n_tok div 24"), lit(3)).cast("int").as("bb"))
    val cells = banded.groupBy(col("lang"), col("ba"), col("bb"))
      .agg(count(lit(1)).as("c"))
    val moments = cells.groupBy(col("lang"))
      .agg(Oracle.lsum(col("c")).as("n"),
        Oracle.lsum(when(col("ba") === col("bb"), col("c")).otherwise(0L))
          .as("agree"))
    val margins = cells.groupBy(col("lang"), col("ba"))
      .agg(Oracle.lsum(col("c")).as("ra"))
      .join(cells.groupBy(col("lang"), col("bb"))
        .agg(Oracle.lsum(col("c")).as("cb"))
        .withColumnRenamed("bb", "ba"), Seq("lang", "ba"), "full_outer")
      .groupBy(col("lang"))
      .agg(Oracle.lsum(coalesce(col("ra"), lit(0L)) * coalesce(col("cb"), lit(0L)))
        .as("pe_num"))
    moments.join(margins, "lang")
      .select(col("lang"), col("n").as("n_docs"),
        round((col("agree").cast("double") / col("n") -
          col("pe_num").cast("double") / (col("n") * col("n"))) /
          (lit(1.0) - col("pe_num").cast("double") / (col("n") * col("n"))),
          4).as("kappa"))
      .orderBy(col("lang"))
  }

  val q219Sql: String =
    """WITH banded AS (
      |  SELECT lang, LEAST(n_chars // 128, 3) AS ba,
      |    LEAST(len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
      |      // 24, 3) AS bb
      |  FROM documents),
      |cells AS (
      |  SELECT lang, ba, bb, COUNT(*) AS c FROM banded GROUP BY 1, 2, 3),
      |moments AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN ba = bb THEN c ELSE 0 END) AS BIGINT) AS agree
      |  FROM cells GROUP BY 1),
      |ra AS (SELECT lang, ba, CAST(SUM(c) AS BIGINT) AS ra
      |       FROM cells GROUP BY 1, 2),
      |cb AS (SELECT lang, bb AS ba, CAST(SUM(c) AS BIGINT) AS cb
      |       FROM cells GROUP BY 1, 2),
      |margins AS (
      |  SELECT COALESCE(ra.lang, cb.lang) AS lang,
      |    CAST(SUM(COALESCE(ra.ra, 0) * COALESCE(cb.cb, 0)) AS BIGINT) AS pe_num
      |  FROM ra FULL OUTER JOIN cb ON ra.lang = cb.lang AND ra.ba = cb.ba
      |  GROUP BY 1)
      |SELECT m.lang, m.n AS n_docs,
      |  ROUND((CAST(agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / (n * n))
      |    / (1.0 - CAST(pe_num AS DOUBLE) / (n * n)), 4) AS kappa
      |FROM moments m JOIN margins USING (lang)
      |ORDER BY m.lang""".stripMargin
}

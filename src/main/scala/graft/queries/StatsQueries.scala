package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Iteration
import graft.{Oracle, Tables}

/** Round-6 corpus-statistics + data-quality tier: vocabulary-law fits
  * (Zipf slope, type-token ratio), term burstiness, RAKE keyword
  * extraction, Benford first-digit audit, functional-dependency
  * discovery, and RFM segmentation — the profiling passes a corpus/
  * warehouse platform runs to characterize data before training on it.
  *
  * Same scale + determinism discipline as the rest of the registry:
  * heavy work is hash aggregation over tokens/rows; per-key analytics
  * run on vocabulary-sized intermediates (broadcast/window-per-key);
  * every FP value reaches the output through exact integer moments, a
  * single IEEE expression tree, or Oracle.dsum's decimal grid.
  */
object StatsQueries {

  private def docTerms(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("term"))
      .filter(col("term") =!= "")

  // ---------------------------------------------------------------------
  // q183 — Zipf slope + type-token ratio per source

  /** Vocabulary-law profile per source: the Zipf exponent (OLS slope of
    * ln freq on ln rank over the top 200 ranks) and the type-token
    * ratio. Natural corpora sit near slope −1; a source that deviates
    * hard is boilerplate or spam — a standard corpus-mix diagnostic.
    * Ranks come from a per-source window over the AGGREGATED vocab
    * table (vocabulary-sized partitions, never raw tokens); the five
    * OLS moments go through Oracle.dsum so the ≤1-ulp engine spread of
    * ln() can't reorder-wobble the sums. */
  def q183ZipfTtr(s: SparkSession, dir: String): DataFrame = {
    val tt = docTerms(Tables.documents(s, dir))
    val vocab = tt.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("freq"))
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("term").asc)
    val top = vocab.withColumn("rank", row_number().over(bySrc))
      .filter(col("rank") <= 200)
      .withColumn("x", log(col("rank")))
      .withColumn("y", log(col("freq")))
    val mom = top.groupBy(col("source")).agg(
      count(lit(1)).as("n_ranks"),
      Oracle.dsum(col("x")).as("sx"), Oracle.dsum(col("y")).as("sy"),
      Oracle.dsum(col("x") * col("y")).as("sxy"),
      Oracle.dsum(col("x") * col("x")).as("sxx"))
    val ttr = tt.groupBy(col("source"))
      .agg(countDistinct(col("term")).as("types"), count(lit(1)).as("toks"))
    mom.join(ttr, "source")
      .select(col("source"), col("n_ranks"),
        round((col("n_ranks") * col("sxy") - col("sx") * col("sy")) /
          (col("n_ranks") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"),
        round(col("types").cast("double") / col("toks"), 6).as("ttr"))
      .orderBy(col("source"))
  }

  val q183Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tt AS (SELECT doc_id, source, term FROM t WHERE term <> ''),
      |vocab AS (
      |  SELECT source, term, COUNT(*) AS freq FROM tt GROUP BY 1, 2),
      |top AS (
      |  SELECT source, ln(row_number() OVER (PARTITION BY source
      |      ORDER BY freq DESC, term ASC)) AS x,
      |    ln(freq) AS y,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY freq DESC, term ASC) AS rank
      |  FROM vocab QUALIFY rank <= 200),
      |mom AS (
      |  SELECT source, COUNT(*) AS n_ranks,
      |    ${Oracle.dsumSql("x")} AS sx, ${Oracle.dsumSql("y")} AS sy,
      |    ${Oracle.dsumSql("x * y")} AS sxy, ${Oracle.dsumSql("x * x")} AS sxx
      |  FROM top GROUP BY 1),
      |ttr AS (
      |  SELECT source, COUNT(DISTINCT term) AS types, COUNT(*) AS toks
      |  FROM tt GROUP BY 1)
      |SELECT m.source, m.n_ranks,
      |  ROUND((m.n_ranks * m.sxy - m.sx * m.sy) /
      |    (m.n_ranks * m.sxx - m.sx * m.sx), 6) AS zipf_slope,
      |  ROUND(CAST(t.types AS DOUBLE) / t.toks, 6) AS ttr
      |FROM mom m JOIN ttr t ON m.source = t.source
      |ORDER BY m.source""".stripMargin

  // ---------------------------------------------------------------------
  // q184 — term burstiness (variance-to-mean dispersion index)

  /** Dispersion index D = var/mean of per-document counts (zeros
    * included) for the 100 most frequent terms. D ≈ 1 is Poisson
    * (function words); D ≫ 1 is bursty (topical terms concentrate in
    * few documents) — the Church/Gale burstiness diagnostic, used to
    * pick content words for dedup shingles and index pruning.
    * D = (N·ΣΣc² − S²)/(N·S) is EXACT in integers: zeros contribute
    * nothing to the sums, so the all-docs variance needs only the
    * present-doc counts plus the corpus doc count N. */
  def q184Burstiness(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nn = docs.agg(count(lit(1)).as("nd"))
    val tc = docTerms(docs).groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val perTerm = tc.groupBy(col("term"))
      .agg(Oracle.lsum(col("c")).as("s"),
        Oracle.lsum(col("c") * col("c")).as("ss"),
        count(lit(1)).as("k"))
    perTerm.orderBy(col("s").desc, col("term")).limit(100)
      .crossJoin(broadcast(nn))
      .select(col("term"), col("s").as("total"), col("k").as("n_docs"),
        round((col("nd") * col("ss") - col("s") * col("s")).cast("double") /
          (col("nd") * col("s")).cast("double"), 6).as("dispersion"))
      .orderBy(col("total").desc, col("term"))
  }

  val q184Sql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
      |nn AS (SELECT COUNT(*) AS nd FROM documents),
      |tc AS (SELECT term, doc_id, COUNT(*) AS c FROM tt GROUP BY 1, 2),
      |pt AS (
      |  SELECT term, CAST(SUM(c) AS BIGINT) AS s,
      |    CAST(SUM(c*c) AS BIGINT) AS ss, COUNT(*) AS k
      |  FROM tc GROUP BY 1
      |  ORDER BY s DESC, term LIMIT 100)
      |SELECT term, s AS total, k AS n_docs,
      |  ROUND(CAST(nd * ss - s * s AS DOUBLE) / CAST(nd * s AS DOUBLE), 6)
      |    AS dispersion
      |FROM pt CROSS JOIN nn
      |ORDER BY total DESC, term""".stripMargin

  // ---------------------------------------------------------------------
  // q185 — RAKE keyword extraction

  /** Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
    * phrases are maximal stopword-free token runs; each word scores
    * deg(w)/freq(w) over the candidate set (deg = Σ length of phrases
    * containing w), a phrase scores the sum of its word scores; top 15
    * multi-word phrases corpus-wide. Run segmentation is a per-doc
    * window (stopword-prefix-count run ids); word scores are exact
    * integer ratios; the phrase-score sum goes through the decimal
    * grid. Output is a TakeOrdered top-15 — no global sort. */
  def q185RakeKeywords(s: SparkSession, dir: String): DataFrame = {
    val stops = rakeStopwords
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokensOf(col("text")))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("stop", col("term").isInCollection(stops).cast("int"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = toks.withColumn("run", sum(col("stop")).over(byDoc))
      .filter(col("stop") === 0)
    val phrases = runs.groupBy(col("doc_id"), col("run"))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("pos"), col("term")))), x => x("term")), " ")
          .as("phrase"),
        count(lit(1)).as("len"))
      .filter(col("len") >= 2)
    val words = phrases.select(col("phrase"), col("len"),
      explode(split(col("phrase"), " ")).as("term"))
    val wscore = words.groupBy(col("term"))
      .agg((Oracle.lsum(col("len")).cast("double") / count(lit(1)))
        .as("score"))
    words.join(broadcast(wscore), "term")
      .groupBy(col("phrase"))
      .agg((count(lit(1)) / max(col("len"))).cast("long").as("n_occurrences"),
        round(Oracle.dsum(col("score")) / (count(lit(1)) / max(col("len"))), 6)
          .as("rake_score"))
      .orderBy(col("rake_score").desc, col("phrase"))
      .limit(15)
  }

  /** Fixed stopword list shared with the SQL twin (order irrelevant). */
  private[graft] val rakeStopwords: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "an", "be", "this", "are",
    "or", "from", "not", "but", "have", "has", "had", "we", "you", "they")

  val q185Sql: String = {
    val stopList = rakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH ls AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |pos AS (
      |  SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos FROM ls),
      |toks AS (
      |  SELECT doc_id, pos, ts[pos] AS term,
      |    CASE WHEN ts[pos] IN ($stopList) THEN 1 ELSE 0 END AS stop
      |  FROM pos WHERE ts[pos] <> ''),
      |runs AS (
      |  SELECT doc_id, term, pos,
      |    SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS run
      |  FROM toks QUALIFY stop = 0),
      |phrases AS (
      |  SELECT doc_id, run, string_agg(term, ' ' ORDER BY pos) AS phrase,
      |    COUNT(*) AS len
      |  FROM runs GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |words AS (
      |  SELECT phrase, len, unnest(string_split(phrase, ' ')) AS term
      |  FROM phrases),
      |wscore AS (
      |  SELECT term, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS score
      |  FROM words GROUP BY 1)
      |SELECT w.phrase, COUNT(*) // MAX(w.len) AS n_occurrences,
      |  ROUND(${Oracle.dsumSql("ws.score")} / (COUNT(*) // MAX(w.len)), 6)
      |    AS rake_score
      |FROM words w JOIN wscore ws ON w.term = ws.term
      |GROUP BY w.phrase
      |ORDER BY rake_score DESC, w.phrase LIMIT 15""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q188 — Benford first-digit audit

  /** First-significant-digit distribution of order totals against
    * Benford's law — the classic synthetic-data / fraud smell test.
    * The digit comes from the decimal STRING of exact cents (no
    * logarithm touches data); expected shares ln(1+1/d)/ln(10) are
    * constants fixed to the 1e-6 grid before the χ² terms, so the only
    * per-row work is one substring — scan-parallel. */
  def q188Benford(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(s, dir)
      .select(substring(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(Oracle.lsum(col("n_obs")).as("n"))
    digits.crossJoin(broadcast(tot))
      .withColumn("exp_share", round(log(lit(1.0) + lit(1.0) / col("digit"))
        / log(lit(10.0)), 6))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n"), 6).as("obs_share"),
        col("exp_share"),
        round(pow(col("n_obs") - col("n") * col("exp_share"), 2) /
          (col("n") * col("exp_share")), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  val q188Sql: String =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders),
      |cnt AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cnt),
      |ex AS (
      |  SELECT digit, n_obs, n,
      |    ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS exp_share
      |  FROM cnt CROSS JOIN tot)
      |SELECT digit, n_obs,
      |  ROUND(CAST(n_obs AS DOUBLE) / n, 6) AS obs_share, exp_share,
      |  ROUND(POWER(n_obs - n * exp_share, 2) / (n * exp_share), 6)
      |    AS chi2_term
      |FROM ex ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------------
  // q189 — functional-dependency discovery (approximate-FD audit)

  /** g1-error audit of candidate functional dependencies A→B: for each
    * candidate, the fraction of rows that would have to change for the
    * FD to hold exactly (1 − Σ_groups majority-class count / N), plus
    * the violating-group count — TANE/FDep's quality measure run as
    * three aggregates per candidate. Everything is exact integer
    * counting; candidates span true FDs (nation→region), near-FDs and
    * non-FDs, so the output exercises the full error range. */
  def q189FdDiscovery(s: SparkSession, dir: String): DataFrame = {
    def audit(df: DataFrame, name: String, lhs: Column, rhs: Column): DataFrame = {
      val groups = df.select(lhs.as("l"), rhs.as("r"))
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
        .groupBy(col("l"))
        .agg(max(col("c")).as("maj"), Oracle.lsum(col("c")).as("tot"),
          count(lit(1)).as("nrhs"))
      groups.agg(
        lit(name).as("fd"),
        count(lit(1)).as("n_groups"),
        Oracle.lsum((col("nrhs") > 1).cast("long")).as("n_violating"),
        round(lit(1.0) - Oracle.lsum(col("maj")).cast("double") /
          Oracle.lsum(col("tot")), 6).as("g1_error"))
    }
    val nation = Tables.nation(s, dir)
    val customer = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    audit(nation, "nation.n_nationkey->n_regionkey",
        col("n_nationkey"), col("n_regionkey"))
      .unionByName(audit(customer, "customer.c_nationkey->c_mktsegment",
        col("c_nationkey"), col("c_mktsegment")))
      .unionByName(audit(orders, "orders.o_custkey->o_orderpriority",
        col("o_custkey"), col("o_orderpriority")))
      .unionByName(audit(lineitem, "lineitem.l_orderkey->l_returnflag",
        col("l_orderkey"), col("l_returnflag")))
      .unionByName(audit(lineitem, "lineitem.l_partkey->l_suppkey",
        col("l_partkey"), col("l_suppkey")))
      .orderBy(col("fd"))
  }

  val q189Sql: String = {
    def audit(name: String, table: String, lhs: String, rhs: String): String =
      s"""SELECT '$name' AS fd, COUNT(*) AS n_groups,
        |  CAST(SUM(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  ROUND(1.0 - CAST(SUM(maj) AS DOUBLE) / CAST(SUM(tot) AS BIGINT), 6)
        |    AS g1_error
        |FROM (
        |  SELECT l, MAX(c) AS maj, CAST(SUM(c) AS BIGINT) AS tot,
        |    COUNT(*) AS nrhs
        |  FROM (SELECT $lhs AS l, $rhs AS r, COUNT(*) AS c
        |        FROM $table GROUP BY 1, 2) g
        |  GROUP BY l) gg""".stripMargin
    Seq(
      audit("nation.n_nationkey->n_regionkey", "nation",
        "n_nationkey", "n_regionkey"),
      audit("customer.c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment"),
      audit("orders.o_custkey->o_orderpriority", "orders",
        "o_custkey", "o_orderpriority"),
      audit("lineitem.l_orderkey->l_returnflag", "lineitem",
        "l_orderkey", "l_returnflag"),
      audit("lineitem.l_partkey->l_suppkey", "lineitem",
        "l_partkey", "l_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  // ---------------------------------------------------------------------
  // q190 — RFM segmentation (exact quintiles, no global window)

  /** Classic recency/frequency/monetary customer scoring: three exact
    * quintile assignments via operators/Ranks.exactNtile (the sketch-
    * bucketed NTILE — q80 proved cross-engine parity with SQL NTILE),
    * aggregated into segment cells. Recency counts days back from the
    * dataset's last order date; scores follow the RFM convention where
    * 5 is best (most recent / most frequent / highest spend). */
  def q190RfmSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Ranks
    val base = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(expr(
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")).as("lastd"),
        count(lit(1)).as("freq"),
        Oracle.lsum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
          .as("mon"))
    val maxd = base.agg(max(col("lastd")).as("maxd"))
    // localCheckpoint: three exactNtile passes each re-read this frame
    // several times (sketch + count + ranked plan); materializing the
    // customer-sized base once cuts ~9 recomputes of the orders scan
    val rfm0 = base.crossJoin(broadcast(maxd))
      .withColumn("recency", col("maxd") - col("lastd"))
      .localCheckpoint(true, Iteration.SerLevel)
    // checkpoint between the chained ntiles too: each exactNtile reads
    // its input 3× (cutpoint sketch, count, ranked plan), so an
    // unbroken r1→r2→r3 chain re-evaluates the earlier tile windows
    // multiplicatively
    val r1 = Ranks.exactNtile(rfm0, 5, "r_tile", col("recency"), col("o_custkey"))
      .localCheckpoint(true, Iteration.SerLevel)
    val r2 = Ranks.exactNtile(r1, 5, "f_score", col("freq"), col("o_custkey"))
      .localCheckpoint(true, Iteration.SerLevel)
    val r3 = Ranks.exactNtile(r2, 5, "m_score", col("mon"), col("o_custkey"))
    r3.withColumn("r_score", lit(6) - col("r_tile"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"), Oracle.lsum(col("mon")).as("ms"))
      // avg monetary to 2dp in exact integer cents: half-up integer
      // division (2a+n) div (2n), then ONE /100 scaling — the q173
      // fixed-point idiom; the double ROUND chain boundary-flipped vs
      // DuckDB's decimal division at sf0.001 (cents/n within an ulp of
      // a .005 grid point)
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("n_customers"),
        (expr("(ms * 2 + n_customers) div (2 * n_customers)")
          .cast("double") / 100.0).as("avg_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q190Sql: String =
    """WITH base AS (
      |  SELECT o_custkey,
      |    MAX(epoch_ms(o_orderdate) // 86400000) AS lastd,
      |    COUNT(*) AS freq,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
      |  FROM orders GROUP BY 1),
      |maxd AS (SELECT MAX(lastd) AS maxd FROM base),
      |rfm AS (
      |  SELECT o_custkey, freq, mon, maxd - lastd AS recency
      |  FROM base CROSS JOIN maxd),
      |scored AS (
      |  SELECT o_custkey, mon,
      |    6 - NTILE(5) OVER (ORDER BY recency, o_custkey) AS r_score,
      |    NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_score,
      |    NTILE(5) OVER (ORDER BY mon, o_custkey) AS m_score
      |  FROM rfm)
      |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
      |  CAST((CAST(SUM(mon) AS BIGINT) * 2 + COUNT(*)) // (2 * COUNT(*))
      |    AS DOUBLE) / 100.0 AS avg_monetary
      |FROM scored GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // q218 — character-entropy garbage filter

  /** Per-document character-distribution Shannon entropy — the cheap
    * first-line garbage detector every crawl pipeline runs (binary
    * blobs, base64 runs, and repeated-char padding all crater H while
    * looking fine to token-level filters). H = log2-entropy over the
    * character histogram, computed as ln(n) − (Σ c·ln c)/n, all from
    * exact integer counts: each c·ln(c) is one IEEE tree on an integer,
    * summed on Oracle.dsum's decimal grid, so the hash survives
    * combine-order differences. Flag threshold 3.5 bits ≈ natural-text
    * floor (English runs ~4.0-4.3).
    *
    * Scale: explode(chars) is scan-local; the histogram is one hash
    * aggregate keyed (doc_id, char) — alphabet-bounded per doc — and
    * the per-doc rollup is a second, doc-sized aggregate. No joins, no
    * windows, no driver state. */
  def q218CharEntropy(s: SparkSession, dir: String): DataFrame = {
    val chars = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1) // guard trailing-empty split artifacts
    val hist = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    hist.groupBy(col("doc_id"))
      .agg(Oracle.lsum(col("c")).as("n"),
        count(lit(1)).as("distinct_chars"),
        Oracle.dsum(col("c").cast("double") * log(col("c").cast("double")))
          .as("s"))
      .select(col("doc_id"), col("n").as("n_chars_counted"), col("distinct_chars"),
        round((log(col("n").cast("double")) - col("s") / col("n")) / log(lit(2.0)),
          4).as("entropy_bits"))
      .withColumn("is_garbage", col("entropy_bits") < 3.5)
      .orderBy(col("doc_id"))
  }

  val q218Sql: String =
    s"""WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |hist AS (
      |  SELECT doc_id, ch, COUNT(*) AS c FROM chars
      |  WHERE length(ch) = 1 GROUP BY 1, 2),
      |ent AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |    COUNT(*) AS distinct_chars,
      |    ${Oracle.dsumSql("CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))")} AS s
      |  FROM hist GROUP BY 1)
      |SELECT doc_id, n AS n_chars_counted, distinct_chars,
      |  ROUND((ln(CAST(n AS DOUBLE)) - s / n) / ln(2.0), 4) AS entropy_bits,
      |  ROUND((ln(CAST(n AS DOUBLE)) - s / n) / ln(2.0), 4) < 3.5 AS is_garbage
      |FROM ent ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q221 — TextRank keyword extraction

  /** TextRank (Mihalcea & Tarau 2004): PageRank over the word-adjacency
    * graph — the graph-centrality counterpart to q185's RAKE scoring,
    * and the standard unsupervised keyworder when degree heuristics
    * aren't enough. Graph: stopword-filtered token sequences, an
    * undirected edge between CONSECUTIVE surviving tokens (window 2 on
    * the filtered sequence), deduplicated corpus-wide; ranks from the
    * shared [[graft.operators.PageRank]] operator (3 iterations,
    * d=0.85, DECIMAL(15,14) contribution grid — the same
    * combine-order-exact iteration q77 proved; the oracle unrolls it
    * over the word graph).
    *
    * Scale: pair extraction is scan-local (one transform over each
    * doc's token list — no window, no join); the edge set is
    * vocabulary², bounded far below corpus size; iterations inherit
    * PageRank's zero-exchange layout. */
  def q221TextRank(s: SparkSession, dir: String): DataFrame = {
    val stops = rakeStopwords
    val lst = Tables.documents(s, dir)
      .select(filter(graft.functions.TextFunctions.tokensOf(col("text")),
        t => t =!= "" && !t.isInCollection(stops)).as("lst"))
      .filter(size(col("lst")) >= 2)
    val und = lst
      .select(explode(expr(
        """transform(sequence(1, size(lst) - 1),
          |  i -> struct(element_at(lst, i) AS x, element_at(lst, i + 1) AS y))"""
          .stripMargin)).as("p"))
      .select(least(col("p.x"), col("p.y")).as("a"),
        greatest(col("p.x"), col("p.y")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val pr = graft.operators.PageRank.ranks(edges, iters = 3)
    val out = pr.ranks
      .select(col("node").as("term"), round(col("r") * lit(1000.0), 9).as("rank_x1000"))
      .orderBy(col("rank_x1000").desc, col("term"))
      .limit(30)
    val schema = out.schema
    val rows = java.util.Arrays.asList(out.collect(): _*)
    pr.release()
    s.createDataFrame(rows, schema)
  }

  val q221Sql: String = {
    val stopList = rakeStopwords.map(w => s"'$w'").mkString(", ")
    val d = "CAST(0.85 AS DOUBLE)"
    def iter(prev: String, next: String) =
      s"""$next AS (
        |  SELECT e.dst AS node,
        |    (CAST(1 AS DOUBLE) - $d) / n.n + $d * CAST(SUM(
        |      CAST($prev.r / deg.od AS DECIMAL(15,14))) AS DOUBLE) AS r
        |  FROM e JOIN $prev ON e.src = $prev.node
        |    JOIN deg ON e.src = deg.src CROSS JOIN n
        |  GROUP BY e.dst, n.n)""".stripMargin
    s"""WITH ls AS (
      |  SELECT list_filter(string_split(lower(text), ' '),
      |    t -> t <> '' AND t NOT IN ($stopList)) AS lst
      |  FROM documents),
      |und AS (
      |  SELECT DISTINCT LEAST(lst[i], lst[i+1]) AS a,
      |    GREATEST(lst[i], lst[i+1]) AS b
      |  FROM ls CROSS JOIN unnest(range(1, len(lst))) AS t(i)
      |  WHERE len(lst) >= 2 AND lst[i] <> lst[i+1]),
      |e AS (SELECT a AS src, b AS dst FROM und
      |  UNION ALL SELECT b AS src, a AS dst FROM und),
      |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
      |r0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / n.n AS r
      |       FROM deg CROSS JOIN n),
      |${iter("r0", "r1")},
      |${iter("r1", "r2")},
      |${iter("r2", "r3")}
      |SELECT node AS term, round(r * CAST(1000 AS DOUBLE), 9) AS rank_x1000
      |FROM r3 ORDER BY rank_x1000 DESC, term LIMIT 30""".stripMargin
  }
}

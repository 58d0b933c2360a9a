package graft.queries

import graft.Oracle._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The typed Dataset[T] surface (SURVEY §1.4: "Dataset[T] with case
  * classes where per-record logic is nontrivial") and cross-engine-exact
  * statistical moments.
  */
object TypedQueries {

  /** Typed order record — mirrors the reference's prost-generated structs
    * (fixed compile-time schema, docs/protobuf.md). */
  final case class OrderRec(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderpriority: String)

  /** Typed pipeline: as[OrderRec] → typed filter/map (arbitrary JVM
    * logic, encoder-backed) → back to the relational surface for the
    * aggregate. The relational groupBy at the end (not groupByKey) keeps
    * partial aggregation — typed groupByKey would serialize whole objects
    * through the shuffle.
    * Note the typed filter/map become DeserializeToObject barriers —
    * acceptable where per-record logic genuinely needs the JVM; pure
    * column arithmetic should stay in Columns (the rest of this engine). */
  def q51TypedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .as[OrderRec]
      .filter((o: OrderRec) => o.o_orderstatus != "P" && o.o_totalprice > 1000.0)
      .map((o: OrderRec) => (o.o_orderpriority, BigDecimal(o.o_totalprice)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .toDF("priority", "price")
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast(DecimalType(30, 2))).cast("double").as("total"))
      .orderBy(col("priority"))
  }

  val q51Sql: String =
    """SELECT o_orderpriority AS priority, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(30,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderstatus <> 'P' AND o_totalprice > 1000.0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Text normalization for dedup: lowercase, strip non-alnum, collapse
    * whitespace — the canonicalization stage ahead of exact dedup in a
    * corpus pipeline. Output: distinct normalized forms per language. */
  def q52Normalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("norm")).as("n_distinct_norm"),
        min(length(col("norm"))).as("min_len"), max(length(col("norm"))).as("max_len"))
      .orderBy(col("lang"))

  val q52Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |    ' +', ' ', 'g'))) AS n_distinct_norm,
      |  MIN(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |    ' +', ' ', 'g')))) AS min_len,
      |  MAX(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |    ' +', ' ', 'g')))) AS max_len
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Document quality scoring (the corpus-filter heuristic): integer
    * points for token-count band, type-token ratio, punctuation density
    * and stopword presence; banded low/mid/high. All-integer scoring —
    * no FP boundary risk — so the band assignment is oracle-exact. */
  def q55QualityBands(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("n_uniq", size(array_distinct(col("toks"))))
      .withColumn("n_punct", regexp_count(col("text"), lit("[^a-z0-9 ]")))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))"))
      .withColumn("score",
        when(col("n_tok").between(20, 1000), 2).otherwise(0) +
        when(col("n_uniq") * 4 > col("n_tok"), 1).otherwise(0) +
        when(col("n_punct") * 10 < col("n_tok"), 1).otherwise(0) +
        when(col("n_stop") > 0, 1).otherwise(0))
      .withColumn("band",
        when(col("score") >= 4, "high").when(col("score") >= 2, "mid").otherwise("low"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .orderBy(col("lang"), col("band"))

  val q55Sql: String =
    """SELECT lang, band, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens FROM (
      |  SELECT lang, n_tok,
      |    CASE WHEN score >= 4 THEN 'high' WHEN score >= 2 THEN 'mid' ELSE 'low' END AS band
      |  FROM (
      |    SELECT lang, n_tok,
      |      (CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 2 ELSE 0 END +
      |       CASE WHEN n_uniq * 4 > n_tok THEN 1 ELSE 0 END +
      |       CASE WHEN n_punct * 10 < n_tok THEN 1 ELSE 0 END +
      |       CASE WHEN n_stop > 0 THEN 1 ELSE 0 END) AS score
      |    FROM (
      |      SELECT lang,
      |        len(string_split(lower(text), ' ')) AS n_tok,
      |        len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
      |        len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
      |        len(list_filter(string_split(lower(text), ' '),
      |          t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS n_stop
      |      FROM documents)))
      |GROUP BY lang, band ORDER BY lang, band""".stripMargin

  /** Statistical moments derived from EXACT decimal sums (Σx, Σx², Σxy). Variance is
    * rounded to 2dp, not 4: at magnitude ~2e10 a 4dp grid demands 15
    * significant digits — the closed-form double arithmetic (catastrophic
    * cancellation of Σx² against (Σx)²/n) agrees across engines only to
    * ~14; 2dp leaves 50× margin.
    * variance/stddev/correlation computed in closed form from values both
    * engines agree on bit-for-bit — immune to the accumulation-order FP
    * drift that makes native stddev/corr non-oracle-able across engines.
    * Scale: the decimal sums are ordinary partial aggregates (one
    * shuffle); the closed-form division happens on 5 group rows. */
  def q53Moments(s: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice")
    val y = col("o_custkey").cast("double")
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(x.cast(DecimalType(30, 6))).as("sx"),
        sum((x * x).cast(DecimalType(30, 6))).as("sxx"),
        sum(y.cast(DecimalType(30, 6))).as("sy"),
        sum((y * y).cast(DecimalType(30, 6))).as("syy"),
        sum((x * y).cast(DecimalType(30, 6))).as("sxy"))
      .select(col("o_orderpriority"), col("n"),
        round((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n"))
          / (col("n") - 1), 2).as("var_price"),
        round((col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n")) /
          sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")) *
               (col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / col("n"))), 6)
          .as("corr_price_cust"))
      .orderBy(col("o_orderpriority"))
  }

  val q53Sql: String =
    """SELECT o_orderpriority, n,
      |  round((sxx - sx * sx / n) / (n - 1), 2) AS var_price,
      |  round((sxy - sx * sy / n) /
      |    sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_price_cust
      |FROM (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(CAST(o_custkey AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(o_custkey AS DOUBLE) * CAST(o_custkey AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(o_totalprice * CAST(o_custkey AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxy
      |  FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q105 — one-pass dataset profiler (Deequ-style column profiles)

  /** Long-form column profile of the orders table: per column, row/null
    * counts, EXACT distinct cardinality, min/max, and the modal value
    * with its frequency — the data-quality profile every ingestion
    * pipeline computes before training-data admission.
    *
    * Shape: all four columns' count/distinct/min/max profile in ONE
    * aggregate call — Catalyst compiles the multiple count(DISTINCT)s
    * into a single Expand-based aggregation (one shuffle for the whole
    * width-profile, not one per column; at 100 TB the expand factor
    * costs memory bandwidth, never extra scans). The modal value needs
    * a per-column value rollup (vocabulary-sized aggregates,
    * map-side-combinable) with a deterministic (count desc, value)
    * tiebreak. Values stringify through DECIMAL(14,2) for doubles so
    * both engines print identical text. */
  def q105DatasetProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")
    def asStr(c: String) =
      if (c == "o_totalprice") col(c).cast(DecimalType(14, 2)).cast("string")
      else col(c).cast("string")
    val profile = o.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(asStr(c)).as(s"mn_$c"),
        max(asStr(c)).as(s"mx_$c"))
      }: _*)
    val perCol = cols.map { c =>
      // nulls are excluded from the modal-value candidates: they are
      // already reported via n_nulls, and engines disagree on NULL
      // placement in ORDER BY tiebreaks (Spark sorts NULL first asc,
      // DuckDB defaults NULLS LAST) — a null group tied at top
      // frequency would pick different modes (round-4 advisory)
      val top = o.filter(col(c).isNotNull)
        .groupBy(asStr(c).as("v")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("v")).limit(1)
        .select(col("v").as("top_val"), col("cnt").as("top_n"))
      profile.crossJoin(top).select(
        lit(c).as("column_name"), col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val"),
        col("top_val"), col("top_n"))
    }
    perCol.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  val q105Sql: String = {
    def one(c: String, castExpr: String) =
      s"""SELECT '$c' AS column_name, (SELECT COUNT(*) FROM orders) AS n_rows,
         |  (SELECT COUNT(*) - COUNT($c) FROM orders) AS n_nulls,
         |  (SELECT COUNT(DISTINCT $c) FROM orders) AS n_distinct,
         |  (SELECT MIN($castExpr) FROM orders) AS min_val,
         |  (SELECT MAX($castExpr) FROM orders) AS max_val,
         |  t.top_val, t.top_n
         |FROM (SELECT $castExpr AS top_val, COUNT(*) AS top_n FROM orders
         |      WHERE $c IS NOT NULL
         |      GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 1) t""".stripMargin
    def castOf(c: String) =
      if (c == "o_totalprice") s"CAST(CAST($c AS DECIMAL(14,2)) AS VARCHAR)"
      else s"CAST($c AS VARCHAR)"
    Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")
      .map(c => one(c, castOf(c)))
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", ") ORDER BY column_name")
  }
}

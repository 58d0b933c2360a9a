package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus curation tier (round 8): URL canonicalization,
  * registered-domain rollups, per-domain quality/dedup aggregation, and
  * mirror-variant collapse — the CommonCrawl-style curation axis a
  * large-scale LLM-data pipeline runs before almost anything else
  * (domain-level filtering/blocklisting is the first pass of public web
  * pipelines; the reference has no counterpart — its keys are block
  * indices — so this is engine-native surface like the rest of the
  * north-star tier).
  *
  * The documents table carries no URL column, so each query decorates
  * it with a DETERMINISTIC synthetic URL derived from doc_id (the q29
  * generator idiom: portable arithmetic both engines replay). The part
  * under test is the ENGINE pipeline — real `parse_url` extraction,
  * string canonicalization rules, and suffix-list domain rollup over
  * the raw messy strings — while the DuckDB oracle constructs the
  * expected canonical form arithmetically from doc_id, so any engine
  * canonicalization bug hash-fails.
  *
  * Canonicalization rules (the standard crawl-frontier set): lowercase
  * scheme+host, strip a leading `www.`, drop default ports (keep
  * non-default), strip trailing slashes (root stays `/`), drop the
  * fragment, drop tracking params (`utm_*`, `ref`), sort surviving
  * query params.
  *
  * Scale: everything is one projection over documents followed by one
  * grouped aggregate on the domain key — no joins, no windows, no
  * all-pairs anywhere; at 100 TB the domain rollup is a single
  * map-side-combinable shuffle on a low-cardinality key.
  */
object WebCurationQueries {

  /** Deterministic messy raw URL per doc_id: mixed-case scheme/host,
    * www/blog subdomains, default and non-default ports, trailing
    * slashes, tracking params, fragments — every rule in the
    * canonicalizer is exercised by some residue class. */
  private[graft] val rawUrlExpr: String =
    """concat(
      |  CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END, '://',
      |  CASE CAST(doc_id % 4 AS INT) WHEN 1 THEN 'www.' WHEN 2 THEN 'blog.'
      |    WHEN 3 THEN 'WWW.' ELSE '' END,
      |  'site', CAST(doc_id % 23 AS STRING), '.',
      |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |    WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END,
      |  CASE WHEN doc_id % 13 = 0 THEN ':8080'
      |       WHEN doc_id % 7 = 0 THEN
      |         CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END
      |       ELSE '' END,
      |  '/p/', CAST(doc_id % 50 AS STRING),
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      |  CASE CAST(doc_id % 3 AS INT)
      |    WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 20 AS STRING))
      |    WHEN 1 THEN concat('?id=', CAST(doc_id % 20 AS STRING),
      |                       '&utm_campaign=m&ref=rss')
      |    ELSE '' END,
      |  CASE WHEN doc_id % 5 = 0 THEN '#section2' ELSE '' END)""".stripMargin

  private def docsWithUrl(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).withColumn("raw_url", expr(rawUrlExpr))

  /** Canonical host: lowercase, leading `www.` stripped. Real URL
    * parsing — the engine side never sees the generator arithmetic.
    * `try_parse_url`, not `parse_url`: a crawl frontier ALWAYS contains
    * garbage URLs, and Spark 4's parse_url throws on them — garbage
    * must canonicalize to NULL, never kill the job. */
  def canonicalHost(u: Column): Column =
    regexp_replace(lower(try_parse_url(u, lit("HOST"))), "^www\\.", "")

  /** Full URL canonicalization from the raw string (rules above). All
    * pure built-in Column functions — whole-stage codegen end to end;
    * unparseable input yields NULL (concat propagates the null host). */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val host = canonicalHost(u)
    val port = regexp_extract(try_parse_url(u, lit("AUTHORITY")), ":([0-9]+)$", 1)
    val portC = when(port === "", "")
      .when(scheme === "http" && port === "80", "")
      .when(scheme === "https" && port === "443", "")
      .otherwise(concat(lit(":"), port))
    val pathStripped = regexp_replace(try_parse_url(u, lit("PATH")), "/+$", "")
    // bare-host URLs have a NULL/empty path — canonical root is '/'
    val pathC = when(pathStripped.isNull || pathStripped === "", "/")
      .otherwise(pathStripped)
    val q = try_parse_url(u, lit("QUERY"))
    val qKeep = array_join(array_sort(filter(split(q, "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=")))), "&")
    val qC = when(q.isNull || qKeep === "", "").otherwise(concat(lit("?"), qKeep))
    concat(scheme, lit("://"), host, portC, pathC, qC)
  }

  /** Minimal embedded public-suffix list for registrable-domain (eTLD+1)
    * rollup; a deployment swaps in the full Public Suffix List. */
  private val twoLevelSuffixes =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp")

  /** Registered domain (eTLD+1) of a canonical host: last two labels,
    * or three when the last two are a listed public suffix — so
    * `blog.site3.co.uk` and `site3.co.uk` roll up together. */
  def registeredDomain(host: Column): Column = {
    // try_element_at: a single-label host (localhost, intranet names)
    // has no -2/-3 element — concat_ws skips the nulls
    val parts = split(host, "\\.")
    val last2 = concat_ws(".",
      try_element_at(parts, lit(-2)), try_element_at(parts, lit(-1)))
    when(last2.isInCollection(twoLevelSuffixes) && size(parts) >= 3,
      concat_ws(".", try_element_at(parts, lit(-3)), last2)).otherwise(last2)
  }

  /** DuckDB CTE: the EXPECTED canonical form per doc, constructed
    * arithmetically from doc_id (never by string-fixing the raw URL, so
    * the oracle is independent of the engine's parser). */
  private[graft] val urlCteSql: String =
    """urls AS (
      |  SELECT doc_id, text, n_chars,
      |    (CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |    (CASE WHEN doc_id % 4 = 2 THEN 'blog.' ELSE '' END) ||
      |    'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
      |    (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END) ||
      |    (CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END) ||
      |    '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
      |    (CASE WHEN doc_id % 3 IN (0, 1)
      |      THEN '?id=' || CAST(doc_id % 20 AS VARCHAR) ELSE '' END)
      |      AS canonical_url,
      |    (CASE WHEN doc_id % 4 = 2 THEN 'blog.' ELSE '' END) ||
      |    'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
      |    (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END) AS host,
      |    'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
      |    (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |      WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END)
      |      AS registered_domain
      |  FROM documents)""".stripMargin

  // ---------------------------------------------------------------------
  // q232 — URL canonicalization

  /** Canonicalize every raw crawl URL with the real parser pipeline;
    * the oracle reconstructs the expected canonical arithmetically, so
    * every rule (case, www, ports, slashes, fragments, tracking params,
    * param sort) is hash-checked per row. */
  def q232UrlCanonicalize(s: SparkSession, dir: String): DataFrame =
    docsWithUrl(s, dir)
      .select(col("doc_id"), canonicalUrl(col("raw_url")).as("canonical_url"))
      .orderBy(col("doc_id"))

  val q232Sql: String =
    s"""WITH $urlCteSql
      |SELECT doc_id, canonical_url FROM urls ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q233 — registered-domain rollup

  /** Roll the corpus up to registrable domains (eTLD+1 via the embedded
    * suffix list): doc counts, distinct sub-hosts, distinct canonical
    * URLs, character volume, and each domain's share of the corpus —
    * the per-domain inventory a curation pass starts from. Subdomain
    * hosts (blog.site3.co.uk) roll into their registrable domain. */
  def q233DomainRollup(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithUrl(s, dir)
      .select(col("doc_id"), col("n_chars"),
        canonicalUrl(col("raw_url")).as("canonical_url"),
        canonicalHost(col("raw_url")).as("host"))
      .withColumn("registered_domain", registeredDomain(col("host")))
    // ONE scan + one domain-keyed shuffle; the corpus total comes from
    // an unpartitioned window over the POST-AGGREGATION frame, whose
    // cardinality is bounded by the registrable-domain space (≤ 115
    // here, never data-sized) — the Ranks-style documented bounded
    // exception, not a data-sized global window
    d.groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("canonical_url")).as("n_urls"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .select(col("registered_domain"), col("n_docs"), col("n_hosts"),
        col("n_urls"), col("total_chars"),
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()), 6)
          .as("doc_share"))
      .orderBy(col("registered_domain"))
  }

  val q233Sql: String =
    s"""WITH $urlCteSql
      |SELECT registered_domain, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT host) AS n_hosts,
      |  COUNT(DISTINCT canonical_url) AS n_urls,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) /
      |    (SELECT COUNT(*) FROM urls), 6) AS doc_share
      |FROM urls GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q234 — per-domain quality / dedup aggregation

  /** The domain-level curation scorecard: exact-duplicate rate (md5 of
    * the text), mean token count, and the fraction of docs passing a
    * Gopher-style repetition gate — aggregated per registered domain.
    * This is the table a pipeline thresholds to produce a domain
    * blocklist. Per-doc features use array ops (no per-token shuffle);
    * the quality gate compares exact integers (5·distinct ≥ 2·n_toks,
    * i.e. dup_tok_frac ≤ 0.6) so no FP boundary can flip it. */
  def q234DomainQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = expr("filter(split(lower(text), ' '), x -> x <> '')")
    val d = docsWithUrl(s, dir)
      .select(col("doc_id"), col("text"),
        canonicalHost(col("raw_url")).as("host"))
      .withColumn("registered_domain", registeredDomain(col("host")))
      .withColumn("n_toks", size(toks).cast("long"))
      .withColumn("n_dist", size(array_distinct(toks)).cast("long"))
      .withColumn("pass",
        (col("n_toks") >= 20 && col("n_dist") * 5 >= col("n_toks") * 2)
          .cast("long"))
    d.groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique_texts"),
        sum(col("n_toks")).cast("long").as("sum_toks"),
        sum(col("pass")).cast("long").as("n_pass"))
      .select(col("registered_domain"), col("n_docs"), col("n_unique_texts"),
        round(lit(1d) - col("n_unique_texts").cast("double") / col("n_docs"), 6)
          .as("dup_frac"),
        round(col("sum_toks").cast("double") / col("n_docs"), 6)
          .as("mean_toks"),
        round(col("n_pass").cast("double") / col("n_docs"), 6).as("pass_frac"))
      .orderBy(col("registered_domain"))
  }

  val q234Sql: String =
    s"""WITH $urlCteSql,
      |feat AS (
      |  SELECT registered_domain, text,
      |    CAST(len(list_filter(string_split(lower(text), ' '),
      |      x -> x <> '')) AS BIGINT) AS n_toks,
      |    CAST(len(list_distinct(list_filter(string_split(lower(text), ' '),
      |      x -> x <> ''))) AS BIGINT) AS n_dist
      |  FROM urls)
      |SELECT registered_domain, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_unique_texts,
      |  ROUND(1 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
      |    AS dup_frac,
      |  ROUND(CAST(CAST(SUM(n_toks) AS BIGINT) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_toks,
      |  ROUND(CAST(CAST(SUM(CASE WHEN n_toks >= 20 AND n_dist * 5 >= n_toks * 2
      |    THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*), 6) AS pass_frac
      |FROM feat GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q235 — mirror-variant collapse (canonicalization as URL-level dedup)

  /** Crawl frontiers see the same page under many syntactic spellings.
    * Each doc's URL is expanded into three raw variants (original;
    * lowercase scheme + `WwW.` prefix + extra trailing slash, fragment
    * dropped; uppercase scheme + explicit default port + appended
    * `utm_m` tracking param + different fragment), every one of which
    * must canonicalize to the SAME canonical URL. The engine explodes
    * the variants and groups by its canonicalizer's output; the oracle
    * computes distinct canonical URLs arithmetically — if any variant
    * fails to collapse, n_canonical diverges and the hash gate fails. */
  def q235VariantCollapse(s: SparkSession, dir: String): DataFrame = {
    val base = docsWithUrl(s, dir).withColumn("v2", expr(
      """concat(
        |  CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END, '://WwW.',
        |  CASE WHEN doc_id % 4 = 2 THEN 'blog.' ELSE '' END,
        |  'site', CAST(doc_id % 23 AS STRING), '.',
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |    WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END,
        |  CASE WHEN doc_id % 13 = 0 THEN ':8080'
        |       WHEN doc_id % 7 = 0 THEN
        |         CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END
        |       ELSE '' END,
        |  '/p/', CAST(doc_id % 50 AS STRING), '/',
        |  CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 20 AS STRING))
        |    WHEN 1 THEN concat('?id=', CAST(doc_id % 20 AS STRING),
        |                       '&utm_campaign=m&ref=rss')
        |    ELSE '' END)""".stripMargin))
      .withColumn("v3", expr(
        """concat(
          |  CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'HTTPS' END, '://',
          |  CASE CAST(doc_id % 4 AS INT) WHEN 1 THEN 'www.' WHEN 2 THEN 'blog.'
          |    WHEN 3 THEN 'WWW.' ELSE '' END,
          |  'site', CAST(doc_id % 23 AS STRING), '.',
          |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org'
          |    WHEN 2 THEN 'net' WHEN 3 THEN 'co.uk' ELSE 'com.au' END,
          |  CASE WHEN doc_id % 13 = 0 THEN ':8080'
          |       WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END,
          |  '/p/', CAST(doc_id % 50 AS STRING),
          |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
          |  CASE CAST(doc_id % 3 AS INT)
          |    WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 20 AS STRING),
          |                       '&utm_m=1')
          |    WHEN 1 THEN concat('?id=', CAST(doc_id % 20 AS STRING),
          |                       '&utm_campaign=m&ref=rss&utm_m=1')
          |    ELSE '?utm_m=1' END,
          |  '#alt')""".stripMargin))
    base
      .select(col("doc_id"),
        explode(array(col("raw_url"), col("v2"), col("v3"))).as("u"))
      .select(canonicalUrl(col("u")).as("canonical_url"))
      .withColumn("registered_domain",
        registeredDomain(regexp_extract(col("canonical_url"),
          "^[a-z]+://([^:/?]+)", 1)))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("canonical_url")).as("n_canonical"))
      .select(col("registered_domain"), col("n_raw"), col("n_canonical"),
        round(col("n_raw").cast("double") / col("n_canonical"), 6)
          .as("collapse_ratio"))
      .orderBy(col("registered_domain"))
  }

  val q235Sql: String =
    s"""WITH $urlCteSql
      |SELECT registered_domain, 3 * COUNT(*) AS n_raw,
      |  COUNT(DISTINCT canonical_url) AS n_canonical,
      |  ROUND(CAST(3 * COUNT(*) AS DOUBLE) /
      |    COUNT(DISTINCT canonical_url), 6) AS collapse_ratio
      |FROM urls GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q236 — cross-domain near-duplicate audit (mirror detection)

  /** Classify every near-duplicate pair by whether its two docs live on
    * the SAME registered domain (site boilerplate — a template problem)
    * or DIFFERENT domains (mirrors/syndication — a crawl-frontier
    * problem): the split that decides whether dedup budget goes into
    * per-site template stripping or cross-site canonical-source
    * selection. Near-dup pairs come from the engine's scale-safe
    * MinHash-LSH path (memoized with q50/q70); domains come through the
    * REAL parse_url canonicalizer. The oracle recomputes pairs with the
    * exact postings-join Jaccard and domains arithmetically.
    *
    * Scale: the pair set is tiny relative to the corpus; attaching
    * domains is two keyed joins (broadcast-able pair side), never a
    * pair expansion. */
  def q236CrossDomainDups(s: SparkSession, dir: String): DataFrame = {
    val dom = docsWithUrl(s, dir)
      .select(col("doc_id"),
        registeredDomain(canonicalHost(col("raw_url"))).as("dom"))
    val pairs = LlmQueries.q20DedupMinhash(s, dir)
    pairs
      .join(dom.select(col("doc_id").as("doc_a"), col("dom").as("dom_a")), "doc_a")
      .join(dom.select(col("doc_id").as("doc_b"), col("dom").as("dom_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("dom_a"), col("dom_b"),
        (col("dom_a") =!= col("dom_b")).as("cross_domain"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q236Sql: String =
    s"""WITH ${LlmQueries.jaccardPairsCteSql},
      |$urlCteSql,
      |pairs AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8)
      |SELECT p.doc_a, p.doc_b, p.jaccard,
      |  da.registered_domain AS dom_a, db.registered_domain AS dom_b,
      |  da.registered_domain <> db.registered_domain AS cross_domain
      |FROM pairs p JOIN urls da ON p.doc_a = da.doc_id
      |             JOIN urls db ON p.doc_b = db.doc_id
      |ORDER BY p.doc_a, p.doc_b""".stripMargin
}

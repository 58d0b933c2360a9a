package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer TRAINING — the iterative half of the tokenization story
  * (q81 applies a fixed regex tokenizer; here the engine learns BPE
  * merges from the corpus itself, the Sennrich et al. 2016 algorithm
  * every modern LLM tokenizer descends from).
  *
  * Reference context: etl-rust ships no text processing at all — this
  * tier exists because a 100 TB training-data engine needs it.
  */
object TokenizerQueries {

  private val Merges = 4

  // ---------------------------------------------------------------------
  // q98 — BPE merge training (iterative relational pair-merge)

  /** Learn the first 4 BPE merges over the document corpus and emit the
    * merge table: (merge_rank, lhs, rhs, merged, pair_count).
    *
    * Relational formulation, one round = three shapes:
    *   1. pair counts — zip-of-slices bigrams over the spaced symbol
    *      string (same codegen'd shape as q85's collocations), weighted
    *      by word frequency: ONE hash aggregate with map-side partials
    *      over a vocabulary-sized table.
    *   2. argmax — orderBy(count desc, pair asc) LIMIT 1: deterministic
    *      single-row result, broadcast into the rewrite.
    *   3. merge application — `replace(s, ' a b ', ' ab ')` on the
    *      spaced string: both Spark and DuckDB scan left-to-right over
    *      non-overlapping matches, which IS the greedy simultaneous
    *      merge BPE specifies (verified on the ' a a a ' overlap case:
    *      both produce ' aa a '). Scan-local projection, no shuffle.
    *
    * Scale: every aggregate runs over the word-frequency table (vocab-
    * sized, shrinks relative to corpus as corpus grows — Heaps' law),
    * NOT over the corpus; the corpus is read once to build it. Each
    * round's rewritten vocabulary is memoized via [[graft.PlanCache]]
    * so round k+1's pair count and rewrite both read a persisted
    * InMemoryTableScan instead of re-deriving k rounds of lineage (the
    * branch factor would otherwise be 2^k). The per-round argmax result
    * is one row — it rides a broadcast cross join, never the driver.
    *
    * The DuckDB oracle unrolls the same 4 rounds as CTEs, so the green
    * hash row proves the iterative relational plan computes the exact
    * Sennrich merge sequence. */
  def q98BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val (rounds, _) = merges(s, dir)
    rounds.zipWithIndex.map { case (m, i) =>
      m.select(lit(i + 1).as("merge_rank"), col("a").as("lhs"),
        col("b").as("rhs"), concat(col("a"), col("b")).as("merged"),
        col("cnt").as("pair_count"))
    }.reduce(_ unionByName _).orderBy(col("merge_rank"))
  }

  /** The per-round argmax tables m_1..m_4 (each one row: a, b, cnt),
    * plus the post-merge vocabulary (spaced strings after all rounds). */
  private def merges(s: SparkSession, dir: String): (Seq[DataFrame], DataFrame) = {
    var w = graft.PlanCache.memo(s, dir, "bpe_words", s"r0") {
      // word-frequency table with each word as a spaced symbol string:
      // "hello" -> " h e l l o " (the surrounding spaces make every
      // symbol boundary explicit for the pair needle)
      Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokensOf(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(concat(lit(" "),
          regexp_replace(col("w"), "(.)", "$1 ")).as("s"), col("freq"))
    }
    val ms = (1 to Merges).map { k =>
      val m = topPair(w)
      w = graft.PlanCache.memo(s, dir, "bpe_words", s"r$k") {
        w.crossJoin(broadcast(m)).select(
          replace_(col("s"),
            concat(lit(" "), col("a"), lit(" "), col("b"), lit(" ")),
            concat(lit(" "), col("a"), col("b"), lit(" "))).as("s"),
          col("freq"))
      }
      m
    }
    (ms, w)
  }

  /** Frequency-weighted symbol-pair counts → deterministic argmax. */
  private def topPair(w: DataFrame): DataFrame = {
    val cs = split(trim(col("s")), " ")
    val n = size(cs)
    w.select(explode(arrays_zip(
        slice(cs, lit(1), n - 1).as("a"),
        slice(cs, lit(2), n - 1).as("b"))).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1)
  }

  /** Literal (non-regex) replace — `replace` has no Scala functions_
    * binding in every 3.x; route through the SQL function for cross-
    * version safety. */
  private def replace_(src: Column, search: Column, repl: Column): Column =
    call_function("replace", src, search, repl)

  // ---------------------------------------------------------------------
  // q116 — BPE tokenizer APPLICATION (encode the corpus with q98's merges)

  /** Apply the 4 learned merges to the whole corpus and emit the top 20
    * resulting subword tokens by frequency — the encode half of the
    * tokenizer lifecycle (q98 trains, this applies; together they are
    * the train→encode loop every tokenizer ships).
    *
    * Shape: the per-round argmax tables (one row each) cross-join into
    * the word-frequency table as broadcasts and the merge rewrites are
    * the same scan-local `replace` chain training used — application
    * touches the vocabulary table only, then one explode + count over
    * the final spaced strings. Frequencies weight by word occurrence,
    * so the counts are corpus-level token frequencies. */
  def q116BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val (_, w) = merges(s, dir) // every round memoized; shared with q98
    w.select(explode(split(trim(col("s")), " ")).as("token"), col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  val q116Sql: String = {
    def pairs(wk: String, pk: String) =
      s"""$pk AS (SELECT p[1] AS a, p[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_zip(cs[1:len(cs)-1], cs[2:len(cs)])) AS p, freq
         |        FROM (SELECT string_split(trim(s), ' ') AS cs, freq FROM $wk))
         |  GROUP BY 1, 2)""".stripMargin
    def argmax(pk: String, mk: String) =
      s"$mk AS (SELECT a, b, cnt FROM $pk ORDER BY cnt DESC, a, b LIMIT 1)"
    def rewrite(wk: String, mk: String, wn: String) =
      s"""$wn AS (SELECT replace(s, ' '||m.a||' '||m.b||' ', ' '||m.a||m.b||' ') AS s,
         |  freq FROM $wk, $mk m)""".stripMargin
    val rounds = (1 to Merges).map { k =>
      Seq(pairs(s"w${k - 1}", s"p$k"), argmax(s"p$k", s"m$k"),
        rewrite(s"w${k - 1}", s"m$k", s"w$k")).mkString(",\n")
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s,
       |    COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |$rounds
       |SELECT token, CAST(SUM(freq) AS BIGINT) AS n FROM (
       |  SELECT unnest(string_split(trim(s), ' ')) AS token, freq FROM w$Merges)
       |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin
  }

  val q98Sql: String = {
    def pairs(wk: String, pk: String) =
      s"""$pk AS (SELECT p[1] AS a, p[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_zip(cs[1:len(cs)-1], cs[2:len(cs)])) AS p, freq
         |        FROM (SELECT string_split(trim(s), ' ') AS cs, freq FROM $wk))
         |  GROUP BY 1, 2)""".stripMargin
    def argmax(pk: String, mk: String) =
      s"$mk AS (SELECT a, b, cnt FROM $pk ORDER BY cnt DESC, a, b LIMIT 1)"
    def rewrite(wk: String, mk: String, wn: String) =
      s"""$wn AS (SELECT replace(s, ' '||m.a||' '||m.b||' ', ' '||m.a||m.b||' ') AS s,
         |  freq FROM $wk, $mk m)""".stripMargin
    val rounds = (1 to Merges).map { k =>
      val base = Seq(pairs(s"w${k - 1}", s"p$k"), argmax(s"p$k", s"m$k"))
      (if (k < Merges) base :+ rewrite(s"w${k - 1}", s"m$k", s"w$k") else base)
        .mkString(",\n")
    }.mkString(",\n")
    val out = (1 to Merges).map { k =>
      s"SELECT $k AS merge_rank, a AS lhs, b AS rhs, a||b AS merged, cnt AS pair_count FROM m$k"
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       |  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s,
       |    COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |$rounds
       |SELECT * FROM ($out) ORDER BY merge_rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q137 — per-language tokenizer fertility / corpus economics

  /** The mixture-design dashboard for a multilingual corpus: per
    * language, document and token volume, vocabulary size (types),
    * characters per token (the whitespace-fertility proxy every
    * tokenizer evaluation starts from — zh's high chars/token here is
    * exactly the signal that whitespace tokenization under-segments
    * it), and type-token ratio on a 1e-6 grid. Ratios divide two
    * exact BIGINTs, so both engines divide identical operands —
    * there is no accumulated-FP path (q71's determinism argument).
    *
    * Shape: one (lang, term) hash aggregate with map-side partials —
    * vocabulary-sized, the natural shuffle key for a 100 TB corpus —
    * folded to one row per language; doc counts ride the same scan as
    * a separate tiny aggregate joined back. Output is
    * language-cardinality-sized. */
  def q137TokenFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val terms = graft.functions.TextFunctions.langTerms(docs)
    val byLang = terms.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(length(col("term")).cast("long") * col("c")).cast("long")
          .as("n_token_chars"))
    val nd = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    nd.join(byLang, "lang")
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_types"),
        round(col("n_token_chars").cast("double") / col("n_tokens"), 6)
          .as("chars_per_token"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"))
      .orderBy(col("lang"))
  }

  val q137Sql: String =
    """WITH t AS (
      |  SELECT lang, term, COUNT(*) AS c FROM (
      |    SELECT lang, unnest(string_split(lower(text), ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1, 2),
      |bl AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_types,
      |    CAST(SUM(len(term) * c) AS BIGINT) AS n_token_chars
      |  FROM t GROUP BY 1),
      |nd AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT lang, n_docs, n_tokens, n_types,
      |  round(CAST(n_token_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token,
      |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio
      |FROM nd JOIN bl USING (lang) ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q159 — vocabulary coverage / OOV-rate curve

  /** The coverage curve a tokenizer designer reads before fixing a
    * vocabulary size: for candidate sizes V ∈ {100, 500, 1k, 2k, 5k},
    * what fraction of all token OCCURRENCES the top-V types cover, and
    * the resulting OOV rate. (The inverse question of q131's
    * token-budget selection; Zipf makes the curve concave and this
    * query materializes exactly where it flattens.)
    *
    * Shape: one scan to type counts (vocabulary-sized), a global
    * frequency rank from `Ranks.withGlobalRowNumber` (sketch-bucketed
    * — no single-partition sort even when the vocabulary is huge; ties
    * broken (count desc, term asc)), then one explode of the constant
    * V-list with rank ≤ V → a 5-group aggregate. Rank-explode volume
    * is Σ V ≈ 8.6k rows regardless of corpus size. */
  def q159VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(100, 500, 1000, 2000, 5000)
    val counts = Tables.documents(s, dir)
      .select(explode(graft.functions.TextFunctions.tokensOf(col("text")))
        .as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(graft.Oracle.lsum(col("c")).as("n_total"),
      count(lit(1)).as("n_types"))
    val ranked = graft.operators.Ranks.withGlobalRowNumber(
      counts, "rk", -col("c"), col("term"))
    ranked
      .select(col("c"), col("rk"),
        explode(lit(sizes.map(_.toLong).toArray)).as("vocab_size"))
      .filter(col("rk") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(graft.Oracle.lsum(col("c")).as("covered_occurrences"),
        count(lit(1)).as("n_types_used"))
      .crossJoin(broadcast(tot))
      .select(col("vocab_size"), col("n_types_used"),
        col("covered_occurrences"),
        round(col("covered_occurrences").cast("double") / col("n_total"), 6)
          .as("coverage"),
        round((col("n_total") - col("covered_occurrences")).cast("double") /
          col("n_total"), 6).as("oov_rate"))
      .orderBy(col("vocab_size"))
  }

  val q159Sql: String =
    """WITH t AS (
      |  SELECT term, COUNT(*) AS c FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS term
      |    FROM documents)
      |  WHERE term <> '' GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total, COUNT(*) AS n_types
      |        FROM t),
      |r AS (SELECT term, c,
      |        ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk FROM t),
      |v(vocab_size) AS (VALUES (100), (500), (1000), (2000), (5000))
      |SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
      |  COUNT(*) AS n_types_used,
      |  CAST(SUM(c) AS BIGINT) AS covered_occurrences,
      |  round(CAST(SUM(c) AS DOUBLE) / MAX(n_total), 6) AS coverage,
      |  round(CAST(MAX(n_total) - SUM(c) AS DOUBLE) / MAX(n_total), 6)
      |    AS oov_rate
      |FROM r JOIN v ON r.rk <= v.vocab_size CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/vector primitives for the LLM-data-pipeline operators.
  *
  * All of these are pure `org.apache.spark.sql.functions` / SQL-lambda
  * compositions — no UDFs — so every one stays inside whole-stage codegen
  * and is distributable as-is. Where an oracle exists, the math is written
  * as an explicit sequential fold so DuckDB can reproduce it bit-for-bit
  * (notably cosine: DuckDB's native `list_cosine_similarity` accumulates in
  * float32 and does NOT match a double fold).
  *
  * Reference context: etl-rust has no text/vector ops (it delegates all
  * analytics to BigQuery, README.md:3); these are the north-star additions
  * from BASELINE.json.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. Mirror: DuckDB `string_split(lower(x),' ')`. */
  def tokensOf(c: Column): Column = split(lower(c), " ")

  /** Distinct word 3-gram shingles of a token array column named `toksCol`.
    * Mirror SQL (DuckDB): list_distinct(list_transform(range(1, len(t)-1),
    * i -> t[i]||' '||t[i+1]||' '||t[i+2])).
    * Guarded for <3 tokens (Spark `sequence(1,0)` would descend, not stop). */
  def shingles3(toksCol: String): Column =
    when(size(col(toksCol)) >= 3,
      expr(s"""array_distinct(transform(sequence(1, size($toksCol) - 2),
              |  i -> concat(element_at($toksCol, i), ' ',
              |              element_at($toksCol, i + 1), ' ',
              |              element_at($toksCol, i + 2))))""".stripMargin))
      .otherwise(expr("CAST(array() AS array<string>)"))

  /** MinHash signature: k 64-bit min-hashes of a shingle-set column.
    * Hash family: xxhash64(seed_i, shingle) — xxhash64 over (int, string)
    * is a keyed hash, one independent function per seed. Engine-internal
    * (Spark's xxhash64 is not reproducible in DuckDB) — callers verify the
    * LSH *output* (exact-Jaccard-confirmed pairs) against a brute-force
    * oracle instead of the signatures. */
  def minhashSignature(shinglesCol: String, k: Int): Column =
    expr(s"""transform(sequence(0, ${k - 1}),
            |  i -> array_min(transform($shinglesCol, s -> xxhash64(i, s))))""".stripMargin)

  /** LSH band keys from a minhash signature: b bands of r rows; band j's
    * key = murmur3 hash of signature slice [j*r, j*r+r). A pair agreeing on
    * any band becomes a candidate. */
  def lshBands(sigCol: String, b: Int, r: Int): Column =
    expr(s"""transform(sequence(0, ${b - 1}),
            |  j -> named_struct('band', j, 'key', hash(slice($sigCol, j * $r + 1, $r))))""".stripMargin)

  /** 64-bit SimHash of a token-array column: bit i of the result is the
    * sign of sum over tokens of (bit i of xxhash64(token) ? +1 : -1).
    * Pure shift/mask arithmetic — codegen-friendly, no UDF. */
  def simhash64(toksCol: String): Column =
    expr(s"""aggregate(sequence(0, 63), 0L, (acc, i) ->
            |  acc + IF(aggregate($toksCol, 0L,
            |        (s, t) -> s + IF((xxhash64(t) >> i) % 2 != 0, 1L, -1L)) >= 0L,
            |      shiftleft(1L, i), 0L))""".stripMargin)

  /** Cross-engine token value for the rolling-hash fingerprint. Built only
    * from length/ascii/substring so DuckDB computes the identical number.
    * ascii('') = 0 in both engines (verified), so 1-char tokens are safe. */
  def tokvalSql(t: String): String =
    s"""(length($t) * 1000003L + ascii($t) * 1009L +
       | ascii(substring($t, length($t), 1)) * 31L + ascii(substring($t, 2, 1)))""".stripMargin

  /** Position-weighted rolling-hash document fingerprint over a token
    * array: sum_i (i+1) * tokval(t_i) mod 1e9+7. DuckDB mirror:
    * list_sum(list_transform(range(1, len+1), i -> i * tokval(t[i]))) % p. */
  def fingerprint(toksCol: String): Column =
    expr(s"""aggregate(transform($toksCol, (t, i) ->
            |    (CAST(i AS BIGINT) + 1L) * ${tokvalSql("t")}),
            |  0L, (a, b) -> a + b) % 1000000007L""".stripMargin)

  /** Sequential-fold dot product of two float-array columns in DOUBLE.
    * This exact formulation (cast each element, left fold in array order)
    * is what the DuckDB oracle mirrors with list_sum(list_transform(...)).
    * Scale note: O(d) per pair, stays in codegen; norms should be
    * precomputed per row BEFORE any join (see VectorQueries). */
  def dotDouble(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) ->
            |  CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)""".stripMargin)

  /** L2 norm of a float-array column, double fold, same mirroring rules. */
  def normDouble(a: String): Column =
    sqrt(expr(s"""aggregate($a, 0D, (acc, x) ->
                 |  acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin))
}

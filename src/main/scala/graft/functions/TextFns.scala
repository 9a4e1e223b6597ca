package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-deterministic text/hash primitives.
  *
  * Every hash here is defined purely in terms of md5 hex digits + integer
  * arithmetic so the DuckDB oracle can compute the exact same value
  * (`('0x' || substr(md5(t),1,15))::BIGINT`), keeping even the MinHash /
  * SimHash / fingerprint pipelines hash-checkable end-to-end.
  */
object TextFns {

  /** Mersenne prime 2^31-1 — modulus for 31-bit token hashes; keeps every
    * product in the permutation family `(a*h+b) mod p` inside a Long. */
  val P31 = 2147483647L

  /** Whitespace tokenization (documents.text is space-separated tokens). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set, deterministic order not required (set semantics). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** 60-bit token hash: first 15 hex chars of md5 (oracle-replicable). */
  def h60(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast(LongType)

  /** 31-bit token hash for permutation families / fingerprints. */
  def h31(tok: Column): Column = h60(tok) % P31

  /** Same hash as a SQL fragment for the DuckDB oracle. */
  def h60Sql(tokExpr: String): String =
    s"(('0x' || substr(md5($tokExpr), 1, 15))::BIGINT)"
  def h31Sql(tokExpr: String): String = s"(${h60Sql(tokExpr)} % $P31)"

  /** Order-sensitive document fingerprint: Σ position·h31(token) mod p over
    * the token sequence (1-based positions). The modulus is applied at
    * EVERY fold step (mod distributes over addition), keeping the Long
    * accumulator < 2^31 for documents of ANY length — a raw running sum
    * would silently wrap past 2^63 around ~90k tokens while the DuckDB
    * oracle (HUGEINT sum) would not, breaking cross-engine bit-equality.
    * The per-step form is mathematically identical to `sum(...) % p`, so
    * the oracle keeps its plain-sum spelling. Order-independent in
    * execution while staying sensitive to token order in the document.
    * `tokensCol` names an array<string> column. */
  /** Positional word k-grams: every column of `df` plus `(posCol,
    * gramCol)` — 1-based position and the space-joined k-gram. The ONE
    * shingling spelling the batch operators share, expressed in
    * codegen'd built-ins as a two-step (explode the position range, THEN
    * build each gram per exploded row): no intermediate all-grams array
    * per doc, and no interpreted eval — the CodegenFallback `ngrams_gen`
    * generator measured 1.6× slower in shingle-heavy paths (x38), so the
    * generator remains the SQL/LATERAL-VIEW surface (x89) while this is
    * the DataFrame hot path. Same semantics as ngrams_gen (size<k docs
    * emit nothing; concat_ws skips null tokens) — the equivalence is
    * law-tested in NGramsGenSpec. */
  def explodeShingles(df: org.apache.spark.sql.DataFrame, tsCol: String, k: Int,
                      posCol: String = "__pos", gramCol: String = "__gram")
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    df.filter(size(col(tsCol)) >= k)
      .withColumn(posCol, explode(expr(s"sequence(1, size($tsCol) - ${k - 1})")))
      // k direct lookups, no per-row slice allocation
      .withColumn(gramCol, concat_ws(" ",
        (0 until k).map(j => expr(s"element_at($tsCol, $posCol + $j)")): _*))
  }

  def fingerprintExpr(tokensCol: String): Column = expr(
    s"aggregate(zip_with($tokensCol, sequence(1, size($tokensCol)), " +
      s"(t, i) -> (i * (cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint) % $P31)) % $P31), " +
      s"cast(0 as bigint), (acc, v) -> (acc + v) % $P31)")
}

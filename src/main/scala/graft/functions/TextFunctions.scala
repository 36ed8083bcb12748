package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators, all built from
  * codegen'd `org.apache.spark.sql.functions` / SQL lambda expressions —
  * no UDFs, so tokenization/hashing stays inside whole-stage codegen and
  * is portable to any cluster without shipping closures.
  *
  * Hashing is md5-based (not xxhash64) on purpose: md5 is bit-identical
  * in every engine (the DuckDB oracles replay the same math), and the
  * hex-string min/compare semantics are collation-free.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens of trimmed text. */
  def words(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Positional word-bigram SQL fragment over a words-array column —
    * THE bigram definition (space-joined adjacent tokens) every bigram
    * consumer shares (LM score, KN smoothing, DSIR buckets, phrase
    * scan, repetition stats), so "what a bigram is" cannot drift
    * between graded queries. Callers must guard `size(wordsCol) >= 2`:
    * `sequence(1, 0)` is the DESCENDING [1, 0] in Spark, not empty. */
  def bigramsExpr(wordsCol: String = "__w"): String =
    s"""transform(sequence(1, size($wordsCol) - 1),
       |  i -> concat(element_at($wordsCol, i), ' ', element_at($wordsCol, i + 1)))""".stripMargin

  /** Distinct word n-gram shingles (default 3) over a words-array column
    * named `wordsCol` — the standard unit for near-dup detection; empty
    * array for texts shorter than n words. (Guarded because Spark's
    * `sequence(1, 0)` yields a DESCENDING [1,0], unlike DuckDB's empty
    * `generate_series`.) */
  def shingles(wordsCol: String, n: Int = 3): Column = {
    val parts = (0 until n).map(k => s"element_at($wordsCol, i + $k)").mkString(", ")
    expr(
      s"""CASE WHEN size($wordsCol) >= $n THEN
         |  array_distinct(transform(sequence(1, size($wordsCol) - ${n - 1}),
         |    i -> concat_ws(' ', $parts)))
         |ELSE array() END""".stripMargin)
  }

  /** Count of tokens in the array column named `wordsCol` that appear in
    * `set` — the native codegen'd [[graft.plans.CountInSet]] (hash-set
    * membership per token; the `size(filter(... IN ...))` HOF it
    * replaces was interpreted AND scanned the IN-list per element). */
  def countIn(wordsCol: String, set: Seq[String]): Column =
    graft.plans.CountInSet(col(wordsCol), set)

  /** Canonical-form fingerprint: md5 of lower-cased, whitespace-collapsed,
    * trimmed text — exact-dup detection robust to spacing/case noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** A token's 32-bit hash as a non-negative Long (first 8 md5 hex chars). */
  def hash32(token: Column): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long")
}

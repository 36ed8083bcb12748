package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text analysis for training-data curation: token counting, quality
  * scoring, language identification, document fingerprinting. All pure
  * column expressions over the text column — one narrow map stage, no
  * shuffle, fully codegen'd; at 100 TB this runs at scan speed.
  */
object TextAnalysis {

  /** Stopwords for the quality score (ratio of function words — a classic
    * fluency signal). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Order = tie-break precedence. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))

  /** BPE-ish pre-tokenizer regex (GPT-2 style, simplified to avoid
    * lookahead so Java regex and RE2 agree): contraction suffixes, then
    * space-prefixed letter runs, digit runs, punctuation runs. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"

  /** Token & character counts: whitespace tokens and BPE-ish regex
    * tokens (an upper-bound proxy for LLM token budgets). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(TextFunctions.words(col(textCol))).as("n_tokens"),
      regexp_count(col(textCol), lit(BpeTokenPattern)).as("n_tokens_bpe"),
      length(col(textCol)).as("n_chars"))

  /** Quality metrics: punctuation / alphabetic / stopword ratios and mean
    * word length, each rounded for engine-portable comparison.
    * `passthrough` columns ride along so a curation pipeline can filter
    * on the ratios without joining back to the source (one scan, no
    * shuffle). */
  def quality(df: DataFrame, idCol: String, textCol: String,
              passthrough: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val metrics = Seq(
      round(length(regexp_replace(t, "[^.!?,;:]", "")).cast("double") /
        length(t), 4).as("punct_ratio"),
      round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
        length(t), 4).as("alpha_ratio"),
      round(TextFunctions.countIn("__w", Stopwords).cast("double") /
        size(col("__w")), 4).as("stopword_ratio"),
      round(length(regexp_replace(t, "\\s+", "")).cast("double") /
        size(col("__w")), 4).as("mean_word_len"))
    df.withColumn("__w", TextFunctions.words(t))
      .select(col(idCol) +: passthrough.map(col) ++: metrics: _*)
  }

  /** Language ID: count marker-word hits per language, argmax with the
    * declaration order of [[LangMarkers]] as tie-break. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withScores = LangMarkers.foldLeft(
      df.withColumn("__w", TextFunctions.words(col(textCol)))) {
      case (acc, (lang, markers)) =>
        acc.withColumn(s"__s_$lang", TextFunctions.countIn("__w", markers))
    }
    val langs = LangMarkers.map(_._1)
    // argmax with earlier-language precedence on ties
    val pred = langs.zipWithIndex.init.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val later = langs.drop(i + 1)
        val isMax = later.map(o => col(s"__s_$lang") >= col(s"__s_$o")).reduce(_ && _)
        when(isMax, lang).otherwise(elseCol)
    }
    val outCols = col(idCol) +: pred.as("pred_lang") +:
      langs.map(l => col(s"__s_$l").as(s"score_$l"))
    withScores.select(outCols: _*)
  }

  /** Repetition quality signals (the Gopher/C4-style filters that
    * catch boilerplate and degenerate generations):
    *   - `distinct_word_ratio`  |distinct words| / |words|
    *   - `top_word_ratio`       occurrences of the most frequent word / |words|
    *   - `dup_bigram_ratio`     1 − |distinct bigrams| / |bigrams|
    * All pure per-document array math — no explode, no shuffle; the
    * most-frequent-word count is the native codegen'd
    * [[graft.plans.TopElementCount]] (one O(n) hash-count pass per doc —
    * an interpreted HOF fold or an explode + re-aggregation would pay
    * CodegenFallback or a shuffle for the same number). */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // sequence(1, n-1) would go DESCENDING for n=1 (sequence infers a
    // negative step) — guard bigrams behind n >= 2.
    val bigrams =
      """transform(sequence(1, size(__w) - 1),
        |  i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))""".stripMargin
    df.withColumn("__w", TextFunctions.words(col(textCol)))
      .select(col(idCol),
        size(col("__w")).as("n_words"),
        round(size(array_distinct(col("__w"))).cast("double") /
          size(col("__w")), 4).as("distinct_word_ratio"),
        round(graft.plans.TopElementCount(col("__w")).cast("double") /
          size(col("__w")), 4).as("top_word_ratio"),
        when(size(col("__w")) >= 2,
          round(lit(1.0) - size(array_distinct(expr(bigrams))).cast("double") /
            (size(col("__w")) - 1), 4))
          .as("dup_bigram_ratio"))
  }

  /** Canonical md5 fingerprint per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fingerprint"))

  /** Winnowed ROLLING-HASH fingerprints (MOSS winnowing, via the native
    * [[graft.plans.WinnowedHashes]] expression): one row per (doc,
    * selected gram-hash). Unlike the whole-doc md5 above, these are
    * shift-robust — any shared passage of ≥ window+gram-1 words between
    * two documents shares at least one fingerprint, so an equi-join on
    * `fp` finds partial-overlap candidates at scan+shuffle cost. */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
      .select(col(idCol), explode(graft.plans.WinnowedHashes(col("__w"))).as("fp"))
}

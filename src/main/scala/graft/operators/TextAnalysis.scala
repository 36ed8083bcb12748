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
    // Per-row regex/array kernels over an unsplittable scan: spread
    // first so they run on every core (guide §2.5; no-op at scale).
    Spread.forCompute(df).withColumn("__w", TextFunctions.words(t))
      .select(col(idCol) +: passthrough.map(col) ++: metrics: _*)
  }

  /** The Gopher rule battery's function-word probe set (Rae et al. 2021,
    * arXiv:2112.11446 Table A1 — "contains at least 2 of ..."). */
  val GopherStopwords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule-based quality filter (Rae et al. 2021,
    * arXiv:2112.11446 Table A1) — the documented heuristic battery every
    * production pretraining pipeline runs before model-based scoring,
    * distinct from [[quality]]'s continuous ratios: each document gets
    * the individual rule measurements AND the combined pass verdict.
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [3, 10]; '#'/'…' symbol-to-word ratio ≤ 0.1; ≤ 90% of lines
    * bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of words
    * contain an alphabetic character; ≥ 2 hits from the function-word
    * probe set. All pure column expressions (array lambdas + regex
    * counting) — one scan, no shuffle, codegen'd; ratios round-4 so the
    * verdict is engine-portable bit-for-bit. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val w = col("__w")
    val lines = col("__l")
    def charCount(ch: String): Column =
      (length(t) - length(regexp_replace(t, ch, ""))).cast("long")
    Spread.forCompute(df).withColumn("__w", TextFunctions.words(t))
      .withColumn("__l", split(t, "\n"))
      .select(col(idCol),
        size(w).cast("long").as("n_words"),
        round(aggregate(w, lit(0L), (a, x) => a + length(x)).cast("double") /
          size(w), 4).as("mean_word_len"),
        round((charCount("#") + charCount("…")).cast("double") /
          size(w), 4).as("symbol_ratio"),
        round(size(filter(lines, x =>
            substring(ltrim(x), 1, 1).isin("-", "*", "•"))).cast("double") /
          size(lines), 4).as("bullet_ratio"),
        round(size(filter(lines, x =>
            rtrim(x).endsWith("..."))).cast("double") /
          size(lines), 4).as("ellipsis_ratio"),
        round(size(filter(w, x => x.rlike("[a-z]"))).cast("double") /
          size(w), 4).as("alpha_word_ratio"),
        TextFunctions.countIn("__w", GopherStopwords).cast("long").as("stop_hits"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_word_ratio") >= 0.8 &&
          col("stop_hits") >= 2L)
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
    val bigrams = TextFunctions.bigramsExpr()
    Spread.forCompute(df).withColumn("__w", TextFunctions.words(col(textCol)))
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

  /** PII patterns for [[redactPii]]. Kept to syntax Java regex and RE2
    * evaluate identically (no lookahead/backreferences): URLs first
    * (they may embed '@' or digit runs), then emails, then phone-like
    * digit runs. */
  val UrlPattern: String = "https?://[^\\s]+"
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9][0-9() .-]{6,}[0-9]"

  /** PII redaction: replace URLs / email addresses / phone-like digit
    * runs with typed placeholder tokens, and count each category. Pure
    * projection (three regexp passes per doc), no shuffle — scan-speed
    * scrubbing before text enters a training corpus. Counts are taken on
    * the raw text BEFORE any replacement so categories don't mask each
    * other. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlPattern, "<URL>"),
          EmailPattern, "<EMAIL>"),
        PhonePattern, "<NUM>")
    Spread.forCompute(df).select(col(idCol),
      regexp_count(t, lit(UrlPattern)).as("n_urls"),
      regexp_count(t, lit(EmailPattern)).as("n_emails"),
      regexp_count(t, lit(PhonePattern)).as("n_phones"),
      redacted.as("redacted"))
  }

  /** Per-document top-k terms by TF-IDF (idf = ln((N+1)/(df+1)),
    * smoothed). Shape: explode → (doc, word) counts with map-side
    * combine → word-level document frequencies (an aggregation of the
    * ALREADY-reduced tf table, not a second corpus pass) → broadcast the
    * 1-row corpus size → per-doc top-k via window rank. The word join
    * key is the shuffle axis; nothing ever materializes the full
    * doc×word matrix beyond the tf table the corpus itself bounds. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // No spread here (r14): the tokenize+explode kernel is cheaper than
    // the exchange that would feed it — the driver measured text_tfidf
    // 0.82 s (r12, no spread) → 1.55 s (r13, spread). The groupBy right
    // below already parallelizes everything downstream of the scan.
    val words = df.select(col(idCol).as("doc"),
      explode(TextFunctions.words(col(textCol))).as("word"))
    val tf = words.groupBy(col("doc"), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("doc")).orderBy(col("score").desc, col("word"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
      .select(col("doc"), col("word"), col("tf"), col("df"),
        round(col("score"), 4).as("tfidf"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
      .drop("score")
  }

  /** Okapi BM25 retrieval: score every document against a fixed bag of
    * query terms, return the top-k. idf is the robust
    * `ln((N - df + 0.5)/(df + 0.5) + 1)` variant; per-term scores are
    * quantized to micro-units and summed as BIGINTs so the per-doc total
    * is identical in ANY aggregation order (the PQ-ADC determinism
    * trick — a plain double sum over matched terms would be
    * partition-order-dependent).
    *
    * Shape at scale: one corpus pass for doc lengths, the tf table is
    * PRE-FILTERED to the query terms (isin on a literal list — predicate
    * pushdown-able), df comes from the already-reduced tf table, corpus
    * stats ride a broadcast 1-row cross join, and the final top-k is a
    * WindowGroupLimit rank. Nothing materializes doc×vocabulary. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "bm25Search needs at least one query term")
    val words = df.select(col(idCol).as("doc"),
      explode(TextFunctions.words(col(textCol))).as("word"))
    val dl = words.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    // exact integer corpus stats: avgdl = sum_dl / n_docs is a double
    // division of exact longs, deterministic cross-engine
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = words.filter(col("word").isin(terms: _*))
      .groupBy(col("doc"), col("word")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfq, "word").join(dl, "doc")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("s",
        (col("idf") * (col("tf") * lit(k1 + 1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("s_micro", round(col("s") * lit(1e6)).cast("long"))
    val agg = scored.groupBy(col("doc"))
      .agg(sum(col("s_micro")).as("sum_micro"), count(lit(1)).as("n_terms"))
      .select(col("doc"), round(col("sum_micro") / lit(1e6), 4).as("bm25"),
        col("n_terms"))
    val w = Window.orderBy(col("bm25").desc, col("doc"))
    agg.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** EXACT corpus heavy hitters (words with frequency ≥ 1/supportDenom
    * of all words) in two bounded passes:
    *   1. a merged Misra–Gries sketch (capacity counters per partition,
    *      one ≤capacity map through the shuffle) yields a candidate set
    *      guaranteed to contain every true heavy hitter, because the
    *      sketch undercounts by at most n/(capacity+1) < n/supportDenom;
    *   2. an exact recount of the candidates only (broadcast semi-join —
    *      ≤capacity keys — then count), filtered by the exact integer
    *      support test n_occurrences * supportDenom ≥ total.
    * The output is EXACT — sketch error only ever widens the candidate
    * set — while no stage ever shuffles or buffers the full term
    * universe, unlike a groupBy-HAVING formulation whose aggregation
    * state is O(|vocabulary|). */
  def heavyHitters(df: DataFrame, idCol: String, textCol: String,
                   supportDenom: Int = 200, capacity: Int = 400): DataFrame = {
    require(capacity >= supportDenom,
      s"capacity ($capacity) must be >= supportDenom ($supportDenom) for the " +
        "no-false-negative guarantee (undercount n/(capacity+1) < support n/supportDenom)")
    // No spread (r14): the Misra-Gries partial aggregate collapses each
    // partition to ≤capacity counters map-side, so the kernel is
    // shuffle-light already; the driver measured the spread exchange as
    // a net loss (text_heavy_hitters 1.4× slower r12 → r13).
    val words = df.select(explode(TextFunctions.words(col(textCol))).as("word"))
    val mg = udaf(new graft.functions.MisraGries(capacity))
    val candidates = words.agg(mg(col("word")).as("c"))
      .select(explode(col("c")).as("word"))
    val total = words.agg(count(lit(1)).as("total"))
    words.join(broadcast(candidates), "word")
      .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .filter(col("n_occurrences") * supportDenom >= col("total"))
      .select(col("word"), col("n_occurrences"), col("total"))
  }

  /** Split each document into overlapping fixed-size token windows —
    * the context-length chunking step that precedes sequence packing in
    * an LLM data pipeline. Chunk k covers words
    * [k·(chunkSize−overlap), k·(chunkSize−overlap)+chunkSize); trailing
    * windows that add no new tokens beyond the previous chunk are
    * dropped. Pure array math + posexplode: one narrow stage, output
    * rows ≈ n_tokens/(chunkSize−overlap) per doc, no shuffle. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
      .select(col(idCol),
        posexplode(expr(
          s"""transform(
             |  filter(sequence(0, size(__w) - 1, $step),
             |         s -> s = 0 OR s + $overlap < size(__w)),
             |  s -> array_join(slice(__w, s + 1, $chunkSize), ' '))""".stripMargin))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens", size(TextFunctions.words(col("chunk_text"))))
  }

  /** Cross-document boilerplate detection (the C4-style filter: text
    * fragments repeated verbatim across many documents — nav bars,
    * license headers, templated footers — are boilerplate, not
    * content). A word 3-gram occurring in ≥ `minDocs` DISTINCT
    * documents is flagged; each document reports how much of its
    * distinct-shingle set is boilerplate.
    *
    * Shape: one scan → native 48-bit shingle projection
    * ([[graft.plans.ShingleHashes]], distinct per doc) → explode →
    * document-frequency aggregation on the 8-byte hash key → join back
    * → per-doc rollup. Both shuffles key on the shingle hash / doc id;
    * state is bounded by the distinct-shingle universe (corpus-sized,
    * never corpus²). The df table is exactly the one the n-gram
    * Jaccard df-cap builds — at 100 TB the two ops share the pass. */
  def boilerplateShingles(df: DataFrame, idCol: String, textCol: String,
                          minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val sh = df
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("__w"))
      .select(col("doc"), explode(graft.plans.ShingleHashes(col("__w"))).as("key"))
    // per-doc distinct by construction → count(*) = document frequency
    val dfreq = sh.groupBy(col("key")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, "key")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("n_boilerplate"),
        round(sum(when(col("df") >= minDocs, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("boilerplate_ratio"))
  }

  /** Exact duplicated-PASSAGE detection (the substring-level dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL '22 — reformulated from suffix arrays to a
    * distributed join): a position in a document is "duplicated" when
    * its word 3-gram also appears in at least `minDocs − 1` OTHER
    * documents; consecutive duplicated positions merge into runs, so
    * `max_run + width − 1` words is the longest verbatim passage shared
    * with another document — the span a surgical dedup would cut
    * (where whole-doc near-dup would keep the doc and miss the quoted
    * block).
    *
    * Shape: positional shingle hashes ([[graft.plans.ShingleHashes]]
    * document-order variant) → posexplode → distinct-doc frequency on
    * the hash → semi-join marks duplicated positions → run detection
    * via the islands trick (pos − row_number() per doc is constant
    * within a consecutive run) → per-doc rollup. Window state is one
    * doc's duplicated positions (bounded by doc length); every shuffle
    * keys on the 8-byte hash or the doc id. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // No spread (r14): both subtrees aggregate/join immediately after
    // the gram kernel, so the exchange moved the full text payload to
    // win a kernel that costs less than the shuffle (driver: text_dup_spans
    // 1.57 s r12 → 2.41 s r13; 8 cores beat 32 — over-parallelized).
    val d0 = df.select(col(idCol), col(textCol))
    val pos = d0
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("__w"))
      .select(col("doc"),
        posexplode(graft.plans.ShingleHashes.positional(col("__w")))
          .as(Seq("pos", "key")))
    val dupKeys = pos.groupBy(col("key"))
      .agg(countDistinct(col("doc")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("key"))
    val runs = pos.join(dupKeys, Seq("key"), "left_semi")
      .withColumn("grp",
        col("pos") - row_number().over(
          Window.partitionBy(col("doc")).orderBy(col("pos"))))
      .groupBy(col("doc"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("doc"))
      .agg(sum(col("run_len")).as("n_dup_positions"),
        max(col("run_len")).as("max_run"))
    // totals come straight from the word count (n − width + 1 positions)
    // — a pure projection, not a third explode+hash pass over the corpus
    val totals = d0
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("doc"), (size(col("__w")) - 2).cast("long").as("n_positions"))
    totals
      .join(runs, Seq("doc"), "left_outer")
      .select(col("doc"), col("n_positions"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        round(coalesce(col("n_dup_positions"), lit(0L)).cast("double") /
          col("n_positions"), 4).as("dup_ratio"))
  }

  /** Surgical duplicated-span REMOVAL — the output side of
    * [[duplicatedSpans]] (what Lee et al.'s dedup actually emits): every
    * word covered by a cross-document duplicated 3-gram is cut, the
    * rest of the document survives in order. Whole-doc near-dup keeps
    * or drops documents; this cuts the quoted/boilerplate passage and
    * keeps the unique remainder.
    *
    * Shape: duplicated positions (same semi-join as [[duplicatedSpans]])
    * → explode to covered word ordinals → anti-join against the
    * positional word table → ordered reassembly per doc
    * (sort_array ∘ collect_list, the q_string_agg pattern — state is one
    * doc's words). Documents with no duplicated spans pass through
    * verbatim (modulo whitespace canonicalization). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"),
        TextFunctions.words(col(textCol)).as("__w"))
    val pos = toks
      .select(col("doc"),
        posexplode(graft.plans.ShingleHashes.positional(col("__w")))
          .as(Seq("pos", "key")))
    val dupKeys = pos.groupBy(col("key"))
      .agg(countDistinct(col("doc")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("key"))
    val covered = pos.join(dupKeys, Seq("key"), "left_semi")
      .select(col("doc"), explode(expr("sequence(pos, pos + 2)")).as("wi"))
      .distinct()
    val words = toks.select(col("doc"),
      posexplode(col("__w")).as(Seq("wi", "word")))
    words.join(covered, Seq("doc", "wi"), "left_anti")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept_words"),
        md5(array_join(expr("transform(sort_array(collect_list(struct(wi, word))), s -> s.word)"),
          " ")).as("cleaned_md5"))
  }

  /** T5-style span corruption — the denoising-objective prep step of a
    * text-to-text training pipeline (Raffel et al. 2020 §3.1.4): mask
    * deterministic word spans, replace each with a numbered sentinel in
    * the input, and emit the sentinel-delimited masked spans as the
    * target. Spans start at word index `offset` and every `period`
    * words after (length `spanLen`), so sentinel ids have the CLOSED
    * FORM `(wi - offset) div period` — no window pass, no running
    * count: the whole op is one posexplode + one per-doc ordered
    * reassembly (the removeDuplicatedSpans ObjectHashAggregate
    * discipline, state bounded by one document). Output carries md5 of
    * both reassembled texts + mask counts, so any tokenization,
    * numbering, or ordering defect flips the hash.
    *
    * Scale shape at 100 TB: one explode, zero joins, one shuffle on
    * doc — embarrassingly parallel corpus-wide. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  period: Int = 7, offset: Int = 3,
                  spanLen: Int = 2): DataFrame = {
    require(spanLen >= 1 && offset >= 0 && offset + spanLen <= period,
      s"need 1 <= spanLen and offset + spanLen <= period; " +
        s"got period=$period offset=$offset spanLen=$spanLen")
    val words = df.select(col(idCol).as("doc"),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("wi", "word")))
    val tagged = words
      .withColumn("masked", col("wi") >= offset &&
        pmod(col("wi") - offset, lit(period)) < spanLen)
      .withColumn("phase", pmod(col("wi") - offset, lit(period)))
      .withColumn("sid", expr(s"(wi - $offset) div $period"))
    val sentinel = concat(lit("<extra_id_"), col("sid"), lit(">"))
    val tok = tagged.select(col("doc"), col("wi"), col("masked"),
      when(!col("masked"), col("word"))
        .when(col("phase") === 0, sentinel).as("in_tok"),
      when(col("masked") && col("phase") === 0,
          concat(sentinel, lit(" "), col("word")))
        .when(col("masked"), col("word")).as("tgt_tok"))
    // array_join skips the NULL (dropped) tokens; struct sort is by wi
    tok.groupBy(col("doc")).agg(
      count(lit(1)).as("n_words"),
      sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
      md5(array_join(expr(
        "transform(sort_array(collect_list(struct(wi, in_tok))), s -> s.in_tok)"),
        " ")).as("input_md5"),
      md5(array_join(expr(
        "transform(sort_array(collect_list(struct(wi, tgt_tok))), s -> s.tgt_tok)"),
        " ")).as("target_md5"))
  }

  /** Inverted-index (postings) construction — the materialized
    * retrieval artifact behind [[bm25Search]]: one row per index term
    * with its document frequency and the first `maxPostings` doc ids.
    *
    * Scale shape: per-doc term dedup happens via `array_distinct`
    * BEFORE the explode (no corpus-wide distinct exchange), and the
    * posting sample uses the bounded [[graft.functions.TopKLongs]]
    * buffer over NEGATED ids (min-k through a max-k aggregator), so
    * per-term aggregation state is O(maxPostings) even for
    * stopword-grade terms — never a collect_list of a hot term's full
    * postings. df counts documents (the IR convention), not
    * occurrences. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 20, minDf: Long = 2): DataFrame = {
    val minK = udaf(new graft.functions.TopKLongs(maxPostings))
    df.select(col(idCol).as("doc"),
        explode(array_distinct(TextFunctions.words(col(textCol)))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"), minK(-col("doc")).as("__neg"))
      .filter(col("df") >= minDf)
      .select(col("word"), col("df"),
        posexplode(expr("transform(__neg, x -> -x)")).as(Seq("rank", "doc")))
  }

  /** fastText-style hashed linear classifier INFERENCE — the quality-
    * filter serving shape of GPT-3/LLaMA-era pipelines (train a linear
    * model offline on curated-vs-crawl labels, then score every
    * document): each token hashes into one of `numBuckets` feature
    * buckets, the model is a weight per bucket, and a document's logit
    * is the sum of its tokens' bucket weights.
    *
    * Serving shape at 100 TB: tokens → bucket id (codegen'd md5
    * arithmetic) → BROADCAST join against the weight table (the model
    * is numBuckets rows — broadcastable at any corpus size) → one
    * partial-aggregable groupBy(doc). Weights are integer micro-units,
    * so the logit is an exact associative BIGINT sum and the verdict
    * (`logit > 0`) is engine-portable; only the per-token normalized
    * `score` divides, as a final deterministic double. The weights here
    * are a hash-derived stand-in (no training corpus labels in the
    * fixtures) — a real model swaps in its trained table, same plan. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
                        numBuckets: Int = 64): DataFrame = {
    val weights = df.sparkSession.range(numBuckets)
      .select(col("id").as("bucket"),
        (pmod(col("id") * lit(2654435761L), lit(1000001L)) - lit(500000L))
          .as("wt_micro"))
    Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("__w"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__w")), 1, 12), 16, 10).cast("long"),
          lit(numBuckets.toLong)).as("bucket"))
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt_micro")).as("logit_micro"))
      // Exact integer mean-logit in micro-units: round(micro/n/1e6, 6)
      // can land EXACTLY on a half-digit boundary (micro/n terminating
      // in .5), where Spark's BigDecimal HALF_UP and DuckDB's float
      // round() disagree — caught by the dual-SF exact gate at sf0.1.
      // Floor division sidesteps the rounding kernel entirely; the
      // pmod subtraction makes the numerator divisible, so truncating
      // `div` equals floor for negative logits too (mirroring DuckDB's
      // flooring `//`).
      .withColumn("score",
        expr("(logit_micro - pmod(logit_micro, n_tokens)) div n_tokens") / 1e6)
      .withColumn("keep", col("logit_micro") > 0)
  }

  /** HTML → text extraction (the WET-file step of a crawl pipeline):
    * drop <script>/<style> blocks and comments wholesale, strip every
    * remaining tag, decode the common entities, collapse whitespace.
    * Entirely codegen'd string built-ins — this runs once per crawled
    * page, so it must stay inside whole-stage codegen; every pattern is
    * backreference-free so the identical regexes run under both
    * java.util.regex and RE2 engines. `&amp;` decodes LAST, so
    * double-escaped text (`&amp;lt;`) yields the literal entity the
    * author wrote, not a tag fragment — the standard single-pass
    * decode order. */
  def stripHtml(html: Column): Column = {
    val noScript  = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle   = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags    = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded   = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** C4-style corpus-level LINE deduplication (Raffel et al. 2020,
    * arXiv:1910.10683 §2.2 "we discarded all but one of any three-
    * sentence span occurring more than once", simplified to the
    * line-granularity rule every big crawl pipeline runs): any line
    * whose normalized form (lower ∘ trim) occurs more than
    * `maxOccurrences` times ACROSS THE CORPUS is removed from every
    * document, and each document is reassembled from its surviving
    * lines in original order.
    *
    * Shape: split → posexplode to (doc, line_no, line); global counts
    * are one partial-aggregable groupBy on the normalized line (the
    * shuffle carries one row per distinct line per input partition);
    * the verdict joins back on that key; reassembly is ONE groupBy(doc)
    * whose state is a single document's lines (sort_array ∘
    * collect_list, the [[removeDuplicatedSpans]] pattern). Documents
    * whose every line is removed survive with empty text — dropping
    * short/empty docs is a separate quality gate, not this operator's
    * job. Output: (idCol, text_dedup, n_kept, n_removed). */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                delim: String = "\n", maxOccurrences: Int = 1): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1, got $maxOccurrences")
    val lines = Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("line_no", "line")))
      .withColumn("__key", lower(trim(col("line"))))
    val counts = lines.groupBy(col("__key"))
      .agg(count(lit(1)).as("__cnt"))
    lines.join(counts, "__key")
      .withColumn("__keep", col("__cnt") <= maxOccurrences)
      .groupBy(col(idCol))
      .agg(
        array_join(expr(
          "transform(sort_array(collect_list(CASE WHEN __keep THEN struct(line_no, line) END)), s -> s.line)"),
          delim).as("text_dedup"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** Corpus-trained bigram language-model fluency score — the KenLM-
    * style perplexity filter of CCNet/RedPajama, self-trained: score a
    * document by the mean negative log conditional probability of its
    * bigrams under the corpus's own counts,
    * avg_neg_logp = mean over positions of ln(c(w1) / c(w1 w2)).
    * Degenerate/bot text scores near 0 (its bigrams are its own bulk);
    * incoherent word salad scores high (every bigram is rare given its
    * head word).
    *
    * Shape: one bigram explode feeds BOTH count tables (corpus bigram
    * counts, and head-word counts aggregated FROM the bigram table —
    * never a second corpus pass); per-position scores come from
    * re-joining the doc bigrams to the two count tables on the bigram /
    * head-word keys. Each ln is rounded to integer e4 units before the
    * per-doc sum, so the aggregation is exact integer math — a double
    * sum would be summation-order-dependent across engines (the
    * pipeline_mixture rule).
    *
    * State is bounded by the distinct-bigram universe (the corpus's own
    * vocabulary table — the "model" IS a DataFrame, shuffled on its
    * key, never collected). */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigramsExpr = TextFunctions.bigramsExpr()
    // 64-bit HASH join keys (r14, guide §2.3 "shuffle keys instead of
    // payloads"): the exploded bigram table is the biggest intermediate
    // and it crosses three exchanges (bigram counts, head counts, the
    // score join-back). Hashing the bigram and its head word to
    // xxhash64 longs right after the explode makes every exchange carry
    // (doc, 2×long) instead of the bigram STRING — at 100 TB the
    // difference between shuffling the corpus's token stream twice and
    // shuffling 24 bytes/row. c(w1) aggregates directly from the bigram
    // ROWS by head hash (count of occurrences whose head is w1 — same
    // number as the old sum of c_bg per head), so no string ever
    // survives past the explode projection.
    val bg = Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col("doc"), explode(expr(bigramsExpr)).as("bg"))
      .select(col("doc"), xxhash64(col("bg")).as("bgh"),
        xxhash64(substring_index(col("bg"), " ", 1)).as("w1h"))
    val bgCounts = bg.groupBy(col("bgh")).agg(count(lit(1)).as("c_bg"))
    // head-word counts straight from the bigram rows: c(w1) = number of
    // bigram occurrences headed by w1 (≡ the old Σ c_bg per head)
    val headCounts = bg.groupBy(col("w1h")).agg(count(lit(1)).as("c_head"))
    bg.join(bgCounts, "bgh")
      .join(headCounts, "w1h")
      .withColumn("nats_e4", expr(
        "cast(round(ln(cast(c_head as double) / cast(c_bg as double)) * 10000) as bigint)"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nats_e4")) / (count(lit(1)) * 10000.0), 4)
          .as("avg_neg_logp"))
  }

  /** One row per (doc, URL host occurrence): every `https?://host/...`
    * match in the text yields its host. Scan-speed regex projection +
    * explode; the host becomes the aggregation/join key for domain-level
    * curation (blocklists, per-domain quality, crawl frequency caps). */
  def urlHosts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
      explode(regexp_extract_all(col(textCol),
        lit("https?://([^/\\s]+)"), lit(1))).as("host"))

  /** Per-domain corpus statistics after blocklist filtering — the
    * web-curation roll-up (how much of the corpus comes from each
    * domain, with banned domains dropped before anything aggregates).
    * The blocklist is a broadcast anti-join (never a shuffle of the
    * corpus side); domain cardinality bounds the aggregation state. */
  def domainStats(df: DataFrame, idCol: String, textCol: String,
                  blocklist: Seq[String]): DataFrame = {
    val hosts = urlHosts(df, idCol, textCol)
    val banned = broadcast(
      df.sparkSession.createDataset(blocklist)(
        org.apache.spark.sql.Encoders.STRING).toDF("host"))
    hosts.join(banned, Seq("host"), "left_anti")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc")).as("n_docs"))
  }

  /** BPE tokenizer TRAINER: learn `numMerges` byte-pair merges from the
    * corpus, the standard subword recipe (Sennrich et al. 2016, as used
    * by GPT-2/RoBERTa-class tokenizers). Scale shape: the corpus is
    * scanned ONCE to build the word-TYPE frequency table (vocabulary —
    * ~√corpus, bounded by the language, not the data volume); every
    * merge round then runs one pair-count aggregation over that vocab
    * table only. Rounds are inherently sequential (merge k's pair
    * statistics depend on merges 1..k-1 — this is the algorithm, not an
    * implementation limit), so the driver collects exactly ONE (pair,
    * freq) row per round; per-round vocab states are localCheckpointed
    * to cut the iterative lineage, same discipline as
    * [[Dedup.connectedComponentsWithRounds]].
    *
    * Ties (equal pair frequency) break lexicographically, so the learned
    * merge table is deterministic for a given corpus.
    *
    * Delta-maintained pair counts were BUILT AND MEASURED (round 11)
    * and rejected on evidence: because the per-round aggregation is
    * over word TYPES (not the corpus), updating the pair table from
    * only the merge-affected types — whether as per-round materialized
    * deltas or as a lazy union chain cut every k rounds — costs MORE
    * than this full type-table re-aggregation at every tested scale
    * (10-sentence graded corpus: 1.1 s → 2.1–3.4 s; 2.5 M-word corpus,
    * 20 merges: 4.3–5.0 s → 4.8–7.9 s): the savings on the ~6-structs-
    * per-type explode never repay the extra per-round jobs, the pair-
    * table re-shuffle, and the deferred-checkpoint bookkeeping. A
    * delta structure only wins with per-pair→word inverted indexes and
    * thousands of merges (the in-memory tokenizer-trainer design),
    * which is a different algorithm, not a tuning of this one.
    *
    * NOT oracle-graded in the SQL sense — the per-round
    * argmax-then-resegment loop is not expressible as one SQL query
    * (same standing as [[Similarity.kmeans]]); the graded
    * text_bpe_train row hashes the learned merge table against
    * literals from an independent sequential reference trainer, and
    * TextAnalysisSpec differential-tests it besides.
    *
    * Returns (rank, left, right, merged, freq) — feed `.merges` into
    * [[bpeEncode]] / [[graft.plans.BpeEncode]]. */
  def bpeTrain(df: DataFrame, textCol: String,
               numMerges: Int, minFreq: Long = 2): Seq[(Int, String, String, String, Long)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    val sc = spark.sparkContext
    // Each round localCheckpoints a NEW vocab state; without explicit
    // cleanup the executor storage of every prior round accumulates
    // (real tokenizers run 10k+ merges). The checkpointed RDD isn't
    // reachable through the public Dataset API, so track it by diffing
    // sc.getPersistentRDDs around the checkpoint call and unpersist the
    // previous round's blocks once the new state is materialized.
    var prevCheckpointIds = Set.empty[Int]
    def checkpointed(next: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val cp = next.localCheckpoint() // eager: materialized on return
      val mine = sc.getPersistentRDDs.keySet.toSet.diff(before)
      prevCheckpointIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevCheckpointIds = mine
      cp
    }
    // corpus scan -> word-type table (word, cnt), chars as symbols
    var vocab = checkpointed(df.select(TextFunctions.words(col(textCol)).as("__w"))
      .select(explode(col("__w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), split(col("word"), "").as("sym")))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = vocab
        .select(col("cnt"), explode(expr(
          "transform(slice(sym, 1, size(sym) - 1), (x, i) -> struct(x AS l, sym[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("freq") < minFreq) exhausted = true
      else {
        val (l, r, freq) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"),
          top(0).getAs[Long]("freq"))
        out += ((rank, l, r, l + r, freq))
        // apply the merge to every word type: leftmost non-overlapping
        // fold (acc ends with l and current is r -> replace tail with lr)
        val lLit = lit(l); val rLit = lit(r); val lrLit = lit(l + r)
        vocab = checkpointed(vocab.select(col("cnt"),
            aggregate(col("sym"), array().cast("array<string>"), (acc, x) =>
              when(size(acc) > 0 &&
                   element_at(acc, -1) === lLit && x === rLit,
                concat(slice(acc, lit(1), size(acc) - 1), array(lrLit)))
                .otherwise(concat(acc, array(x)))).as("sym")))
        rank += 1
      }
    }
    // the merge table is driver-side; the final vocab state is not
    // returned, so free its blocks too
    prevCheckpointIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    out.toSeq
  }

  /** BPE-encode the corpus with a fixed merge list (from [[bpeTrain]]):
    * one codegen'd projection via [[graft.plans.BpeEncode]] — the
    * tokenize-everything pass. Output (id, tokens, n_tokens). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame =
    Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        graft.plans.BpeEncode(TextFunctions.words(col(textCol)), merges).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))

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
    // No spread (r14): the winnow projection is codegen'd and cheap —
    // the driver measured text_fingerprint 1.4× slower with the
    // exchange (r12 → r13); consumers aggregate right after.
    df.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
      .select(col(idCol), explode(graft.plans.WinnowedHashes(col("__w"))).as("fp"))

  /** PMI-scored bigram collocations — the phrase-mining pass that finds
    * word pairs co-occurring far above chance. Adjacent pairs come from
    * ONE pass over the words array (no positional self-join); bigram and
    * unigram counts are both partial-aggregable HashAggregates shuffled
    * on their word keys, and the two unigram joins attach only AFTER the
    * min-count filter has cut the bigram table to the interesting tail.
    * The size ≥ 2 guard dodges Spark's descending sequence(1, 0). */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5, topK: Int = 30): DataFrame = {
    val d0 = df.select(col(textCol))
    val bg = d0
      .select(TextFunctions.words(col(textCol)).as("l"))
      .select(explode(expr(
        """CASE WHEN size(l) >= 2 THEN
          |  transform(sequence(1, size(l) - 1),
          |    k -> struct(element_at(l, k) AS w1, element_at(l, k + 1) AS w2))
          |ELSE array() END""".stripMargin)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val uni = d0
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cw"))
    val totals = bg.agg(count(lit(1)).as("nb"))
      .crossJoin(uni.agg(sum(col("cw")).as("nu")))
    val nb = col("nb").cast("double"); val nu = col("nu").cast("double")
    bgc
      .join(uni.withColumnRenamed("word", "w1").withColumnRenamed("cw", "cx"), "w1")
      .join(uni.withColumnRenamed("word", "w2").withColumnRenamed("cw", "cy"), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("cxy"), col("cx"), col("cy"),
        round(log2((col("cxy").cast("double") / nb) /
          ((col("cx").cast("double") / nu) * (col("cy").cast("double") / nu))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** RAKE keyphrase extraction: candidate phrases are maximal stopword-
    * free word runs (gaps-and-islands over word positions: island id =
    * pos − row_number, one window per doc partition — the sessionize
    * shuffle shape); word degree/frequency scores aggregate over phrase
    * members (shuffle on word), and the per-phrase score sums EXACT
    * integer micro-units ((deg·10⁶) div freq) so no double-sum order
    * can perturb the ranking. */
  def rakeKeyphrases(df: DataFrame, idCol: String, textCol: String,
                     topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pw = Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__doc"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w")))
      .filter(!col("w").isin(Stopwords: _*) && col("w") =!= "")
    val isl = pw.withColumn("rn", row_number().over(
        Window.partitionBy(col("__doc")).orderBy(col("pos"))))
      .withColumn("grp", col("pos") - col("rn"))
    val phrases = isl.groupBy(col("__doc"), col("grp"))
      .agg(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"))
        .as("phrase"),
        count(lit(1)).as("plen"))
    val members = phrases
      .select(col("__doc"), col("grp"), col("phrase"), col("plen"),
        explode(split(col("phrase"), " ")).as("w"))
    val wstats = members.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("smicro", expr("(deg * 1000000) div freq"))
    val perOcc = members.join(wstats.select("w", "smicro"), "w")
      .groupBy(col("__doc"), col("grp"), col("phrase"))
      .agg(sum(col("smicro")).as("score_micro"))
    perOcc.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("score_micro")).as("score_micro"))
      .withColumn("score", col("score_micro") / 1e6)
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(topK)
  }

  /** Readability scoring (Flesch reading ease + Flesch–Kincaid grade)
    * with a vowel-group syllable heuristic. Pure per-row codegen
    * projections — the sentence split, word array, and syllable fold
    * never leave the row, so the operator runs at scan speed with zero
    * shuffle at any scale. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Spread.forCompute(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextFunctions.words(col(textCol)).as("l"),
        expr(s"size(filter(split($textCol, '[.!?]+'), x -> trim(x) != ''))").as("ns0"))
      .select(col(idCol),
        size(col("l")).cast("long").as("n_words"),
        greatest(col("ns0"), lit(1)).cast("long").as("n_sentences"),
        expr("""aggregate(l, cast(0 as bigint), (acc, w) ->
          acc + greatest(cast(1 as bigint),
            cast(size(regexp_extract_all(w, '[aeiouy]+', 0)) as bigint)))""")
          .as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")), 4)
          .as("flesch_ease"),
        round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
          lit(15.59), 4).as("fk_grade"))
}

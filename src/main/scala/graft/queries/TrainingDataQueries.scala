package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.sources.Tables

/** Graded queries for the LLM-training-data operators (dedup, similarity
  * search, text analysis, multimodal) over the `documents` / `embeddings`
  * fixtures. Where the operator's math is engine-portable (md5 hashing,
  * exact counting, sequential double folds) a DuckDB oracle replays it
  * exactly; `ann_lsh` and `multimodal_features` are not SQL-expressible
  * and take the driver's rows-only check.
  *
  * Thresholds are calibrated to the fixtures: the generator plants
  * near-dup documents at shingle-Jaccard ≥ 0.9 (everything else ≈ 0) and
  * embedding pairs reach cosine ≈ 0.5 within a label.
  */
object TrainingDataQueries {

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  // DuckDB fragments mirrored by the Spark operators.
  private val wordsSql = "string_split_regex(lower(trim(text)), '\\s+')"
  private val shingleCte =
    s"""w AS (SELECT doc_id, $wordsSql AS l FROM documents),
       |sh AS (SELECT doc_id,
       |         unnest(list_distinct(list_transform(generate_series(1, len(l) - 2),
       |           i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS shingle
       |       FROM w)""".stripMargin
  // Embedding CTE with the norm precomputed once per vector — mirrors the
  // Spark side, which norms each side before the pairwise join.
  private val embCte =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |       FROM embeddings)""".stripMargin
  private def cos(a: String, b: String) =
    s"list_inner_product($a.v, $b.v) / ($a.nrm * $b.nrm)"

  // Programmatically built SimHash SQL (32 sum columns + bit recombine),
  // guaranteed in sync with Dedup.simhash.
  private val simhashVotes = (0 until 32).map(j =>
    s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n         ")
  private val simhashBits = (0 until 32).map(j =>
    s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
  private val simhashCte =
    s"""t AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |hh AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM t),
       |v AS (SELECT doc_id,
       |         $simhashVotes
       |       FROM hh GROUP BY doc_id),
       |sim AS (SELECT doc_id, $simhashBits AS simhash FROM v)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", Seq("text"))
        .orderBy("doc_id")),

    "dedup_fingerprint" -> ((s, dir) =>
      Dedup.byFingerprint(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          numHashes = 16, numBands = 4, minEstimate = 0.5)
        .orderBy("doc_a", "doc_b")),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.shingleJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          minJaccard = 0.8)
        .orderBy("doc_a", "doc_b")),

    "text_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 4)
        .orderBy("doc_a", "doc_b")),

    "dedup_embedding" -> ((s, dir) =>
      Similarity.embeddingNearDupPairs(Tables.embeddings(s, dir), "label", 0.4)
        .orderBy("id_a", "id_b")),

    "ann_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 10)
        .orderBy("q_id", "rank")
    }),

    // Approximate ANN — not SQL-expressible (rows-only check); recall vs
    // brute force is asserted in ScalaTest instead.
    "ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 10)
        .orderBy("q_id", "rank")
    }),

    // IVF approximate ANN — rows-only (centroid choice is engine-side);
    // recall vs brute force asserted in ScalaTest.
    "ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 10,
          numCells = 16, nProbe = 6)
        .orderBy("q_id", "rank")
    }),

    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Deterministic hash-bucket sampling: membership is a pure function
    // of the key, reproducible across runs/partitionings/engines.
    "data_sample" -> ((s, dir) =>
      Sampling.sample(Tables.documents(s, dir), "doc_id", permille = 100)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    "data_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.events(s, dir), "event_id", "event_type",
          Map("click" -> 100, "error" -> 500, "purchase" -> 1000))
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")),

    // Train/val/test split assignment — leak-proof by construction.
    "data_split_assign" -> ((s, dir) =>
      Sampling.splitAssign(Tables.documents(s, dir), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))),

    "multimodal_meta" -> ((s, dir) =>
      Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text")
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .orderBy("media_id")),

    // Binary decode + feature extraction (stubbed decoder) — rows-only.
    "multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
          Multimodal.attachBinary(Tables.documents(s, dir), "doc_id", "text"))
        .toDF()
        .orderBy("media_id")))

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      "SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",

    "dedup_fingerprint" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS doc_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, seed,
         |          min(((2 * seed + 1) * h0 + (1000003 * seed + 12345)) % 2305843009213693951) AS minh
         |        FROM (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h0 FROM sh) s
         |        CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) seeds
         |        GROUP BY doc_id, seed),
         |bands AS (SELECT doc_id, seed // 4 AS band,
         |            md5(string_agg(minh::VARCHAR, ',' ORDER BY seed)) AS band_key
         |          FROM sig GROUP BY doc_id, seed // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.band_key = y.band_key
         |          AND x.doc_id < y.doc_id),
         |est AS (SELECT doc_a, doc_b,
         |          round(avg(CASE WHEN a.minh = b.minh THEN 1.0 ELSE 0.0 END), 4) AS est_jaccard
         |        FROM cand
         |        JOIN sig a ON a.doc_id = doc_a
         |        JOIN sig b ON b.doc_id = doc_b AND a.seed = b.seed
         |        GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |j AS (SELECT doc_a, doc_b,
         |        round(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
         |      FROM c JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b)
         |SELECT * FROM j WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    "text_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $simhashCte,
         |bytes AS (SELECT doc_id, simhash, j, (simhash >> (j * 8)) % 256 AS byte
         |          FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.simhash AS sha, y.simhash AS shb
         |         FROM bytes x JOIN bytes y
         |           ON x.j = y.j AND x.byte = y.byte AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(sha, shb)) AS hamming
         |FROM cand WHERE bit_count(xor(sha, shb)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $embCte,
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        round(${cos("a", "b")}, 6) AS cos_sim
         |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT * FROM p WHERE cos_sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "ann_bruteforce" ->
      s"""WITH $embCte,
         |q AS (SELECT * FROM e WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |         round(${cos("q", "c")}, 6) AS cos_sim
         |       FROM q JOIN e c ON c.vec_id <> q.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |                ORDER BY cos_sim DESC, c_id) AS rank FROM sc)
         |SELECT q_id, c_id, cos_sim, rank FROM r WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    "text_tokens" -> {
      // SQL string literal: double the quotes; backslashes pass through
      val bpe = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
      s"""SELECT doc_id, len($wordsSql) AS n_tokens,
         |       len(regexp_extract_all(text, '$bpe')) AS n_tokens_bpe,
         |       length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_quality" ->
      s"""SELECT doc_id,
         |  round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0 / length(text), 4) AS punct_ratio,
         |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 4) AS alpha_ratio,
         |  round(len(list_filter($wordsSql, w -> w IN ($stopList))) * 1.0 / len($wordsSql), 4) AS stopword_ratio,
         |  round(length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / len($wordsSql), 4) AS mean_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" -> {
      val scoreCols = TextAnalysis.LangMarkers.map { case (lang, markers) =>
        val in = markers.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(l, w -> w IN ($in))) AS score_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val pred = langs.zipWithIndex.init.foldRight(s"'${langs.last}'") {
        case ((lang, i), elseSql) =>
          val conds = langs.drop(i + 1).map(o => s"score_$lang >= score_$o").mkString(" AND ")
          s"CASE WHEN $conds THEN '$lang' ELSE $elseSql END"
      }
      s"""WITH w AS (SELECT doc_id, $wordsSql AS l FROM documents),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |FROM w)
         |SELECT doc_id, $pred AS pred_lang,
         |       score_en, score_es, score_fr, score_de
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "text_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "data_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 < 100
        |ORDER BY doc_id""".stripMargin,

    "data_stratified_sample" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % 1000 <
        |      CASE event_type WHEN 'click' THEN 100 WHEN 'error' THEN 500
        |                      WHEN 'purchase' THEN 1000 ELSE 0 END
        |ORDER BY event_id""".stripMargin,

    "data_split_assign" ->
      """WITH b AS (SELECT doc_id,
        |             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS bk
        |           FROM documents)
        |SELECT CASE WHEN bk < 800 THEN 'train'
        |            WHEN bk < 900 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n, min(doc_id) AS min_id
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       ('0x' || substr(md5(text), 1, 4))::BIGINT % 640 AS width,
        |       ('0x' || substr(md5(text), 5, 4))::BIGINT % 480 AS height
        |FROM documents ORDER BY media_id""".stripMargin)
}

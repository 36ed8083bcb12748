package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every operator is a pure shuffle-on-key dataflow — no
  * driver-side loops, no pairwise O(N²) over the corpus. The MinHash path
  * is the canonical 100 TB recipe: shingle → per-(doc,seed) partial-min
  * (map-side combine collapses the shingle explosion before the shuffle)
  * → band keys → equi-join on band key, so only documents that collide in
  * a band are ever paired. Hashes are md5 (engine-portable, used by the
  * DuckDB oracles) — swap `TextFunctions.hash32` for `xxhash64` when
  * oracle parity is not needed and speed matters.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per identical key. Equivalent to
    * `dropDuplicates` but with a deterministic survivor, which a graded /
    * reproducible pipeline needs. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))

  /** Exact dedup robust to case/whitespace noise: group by the canonical
    * md5 fingerprint instead of the raw text. */
  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Universal-hash family for MinHash: h_s(x) = (a_s·h0(x) + b_s) mod
    * M61, with h0 = first 48 md5 bits of the shingle. One md5 per
    * shingle — the per-seed hashes are integer arithmetic, so the
    * dominant cost at scale (cryptographic hashing of the shingle
    * explosion) is paid once, not `numHashes` times. M61 keeps every
    * intermediate < 2^62 (no signed-64 overflow in either engine). */
  val MinhashPrime = 2305843009213693951L // 2^61 - 1

  /** MinHash signatures: one row per (doc, seed) with the min universal
    * hash over the doc's word-3-gram shingles. Numeric — not hex-string —
    * signatures matter at scale: `min(BIGINT)` is a mutable-buffer
    * HashAggregate with map-side partial combine, whereas `min(STRING)`
    * forces SortAggregate (a sort of the whole shingle×seed explosion
    * before every aggregation). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("w"))
      .select(col("doc"), explode(TextFunctions.shingles("w")).as("shingle"))
    sh.withColumn("h0",
        expr("cast(conv(substr(md5(shingle), 1, 12), 16, 10) as bigint)"))
      .select(col("doc"), col("h0"),
        explode(expr(s"sequence(0, ${numHashes - 1})")).as("seed"))
      .select(col("doc"), col("seed"),
        expr(s"((2 * seed + 1) * h0 + (1000003 * seed + 12345)) % $MinhashPrime").as("h"))
      .groupBy(col("doc"), col("seed"))
      .agg(min(col("h")).as("minh"))
  }

  /** LSH banding: group each doc's signature into `numBands` bands and
    * hash each band's (seed-ordered) minhash slice into one band key. */
  def minhashBands(sig: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    sig.withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy(col("doc"), col("band"))
      .agg(md5(concat_ws(",",
        expr("transform(array_sort(collect_list(struct(seed, minh))), x -> cast(x.minh as string))")))
        .as("band_key"))
  }

  /** Near-duplicate pairs by MinHash LSH: candidates = docs sharing any
    * band key; estimate = fraction of matching signature positions; keep
    * pairs with estimate ≥ `minEstimate`. Output (doc_a, doc_b,
    * est_jaccard) with doc_a < doc_b. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, numBands: Int = 4,
                   minEstimate: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes).cache()
    val bands = minhashBands(sig, numHashes, numBands)
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
    val sa = sig.select(col("doc").as("doc_a"), col("seed"), col("minh").as("ha"))
    val sb = sig.select(col("doc").as("doc_b"), col("seed"), col("minh").as("hb"))
    cand.join(sa, "doc_a").join(sb, Seq("doc_b", "seed"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(avg(when(col("ha") === col("hb"), 1.0).otherwise(0.0)), 4)
        .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstimate)
  }

  /** Exact n-gram (shingle) Jaccard near-dup pairs: join docs on shared
    * shingles (only overlapping docs ever meet — no cross product), count
    * the intersection, Jaccard = |∩| / (|A|+|B|-|∩|). */
  def shingleJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          minJaccard: Double = 0.8): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), TextFunctions.words(col(textCol)).as("w"))
      .select(col("doc"), explode(TextFunctions.shingles("w")).as("shingle"))
      .cache()
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val common = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("c") / (col("na") + col("nb") - col("c")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 32-bit SimHash per document: each token hashes to 32 bits; each bit
    * position votes ±1 across tokens; the sign of the vote is the output
    * bit. Computed as 32 independent partial-aggregable SUM columns — no
    * per-bit row explosion, so the shuffle stays one row per doc. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"), explode(TextFunctions.words(col(textCol))).as("w"))
      .withColumn("h", TextFunctions.hash32(col("w")))
    val votes = (0 until 32).map { j =>
      sum(when(expr(s"(h div ${1L << j}) % 2") === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val bits = (0 until 32).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy(col("doc"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc"), bits.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32 bits into 4 bytes, join docs
    * sharing any byte (LSH for Hamming distance), keep pairs with
    * Hamming(simhash) ≤ `maxHamming`. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 4): DataFrame = {
    val sh = simhash(df, idCol, textCol).cache()
    val bytes = sh.select(col("doc"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("byte", expr("shiftright(simhash, j * 8) % 256"))
    val cand = bytes.alias("x").join(bytes.alias("y"),
        col("x.j") === col("y.j") && col("x.byte") === col("y.byte") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        col("x.simhash").as("sha"), col("y.simhash").as("shb"))
      .distinct()
    cand.withColumn("hamming", expr("bit_count(sha ^ shb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & dataset splitting for training-data curation.
  *
  * `df.sample()` is seed-dependent on partitioning and not reproducible
  * across cluster layouts; these operators derive membership from a hash
  * of a stable key instead, so a row's sample/split assignment is a pure
  * function of its identity — re-runs, repartitions, and engine changes
  * (the DuckDB oracle replays the same md5 math) all agree. Everything is
  * a narrow codegen'd projection + filter: runs at scan speed, no shuffle.
  */
object Sampling {

  /** Uniform hash bucket in [0, 1000) from a stable key column (by name). */
  def bucket1000(keyCol: String): Column =
    expr(s"pmod(cast(conv(substr(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint), 1000)")

  /** Uniform hash bucket in [0, n) — taken directly from the md5 prefix
    * (NOT `bucket1000 % n`, which caps distinct buckets at 1000 and
    * skews sizes whenever n does not divide 1000). */
  def hashBucket(keyCol: String, n: Int): Column = {
    require(n > 0, s"bucket count must be positive, got $n")
    expr(s"pmod(cast(conv(substr(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint), $n)")
  }

  /** Hamilton (largest-remainder) apportionment of an integer `budget`
    * across strata: each stratum gets ⌊budget·weight/Σweight⌋ plus one
    * leftover slot if its remainder ranks among the largest (ties to
    * the smaller key). THE proportional-integer-allocation rule (floor
    * alone under-allocates, naive rounding over-allocates) — used for
    * sampling budgets, crawl quotas, shard counts. Exactness: quota
    * base/remainder are exact decimal(38,0) products with single floor
    * divisions (budget·weight ≈ 1e4·1e14 at 100 TB — past BIGINT, fine
    * in decimal). Shape: input is an already-aggregated |strata|-row
    * frame; the total broadcasts back and the remainder-rank window
    * runs over those |strata| rows only — bounded by the stratum
    * universe, never the corpus.
    *
    * Input: (`keyCol`, `weightCol`) one row per stratum, weights > 0.
    * Output: (keyCol, weight, base, rem, alloc) with Σalloc = budget
    * (when budget ≤ Σweight slots are distinguishable; budget larger
    * than the stratum count per remainder rule still conserves). */
  def hamiltonAllocation(weights: DataFrame, budget: Long,
                         keyCol: String = "source",
                         weightCol: String = "weight"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val dec = "decimal(38,0)"
    // The "weights > 0" contract, ENFORCED (the q_pr_curve weave): a
    // zero/negative/NULL stratum weight would surface as a NULL quota
    // (Spark's non-ANSI x div 0) or a silent negative allocation —
    // divergent from the DuckDB oracle, which raises on division by
    // zero. assert_true returns NULL on success and treats a NULL
    // condition as failed (so NULL weights are loud too); the
    // `w + coalesce(assert, 0)` form keeps the check inside a live
    // column that pruning cannot drop.
    val base = weights.select(col(keyCol),
      (col(weightCol) + coalesce(
        assert_true(col(weightCol) > 0,
          lit("hamiltonAllocation: every stratum weight must be > 0 " +
            "(zero, negative, or NULL weights make the largest-remainder " +
            "quota undefined) - filter or repair the strata first"))
          .cast("long"),
        lit(0L))).as("weight"))
    val tot = base.agg(sum(col("weight")).as("v"))
    val quota = base.crossJoin(broadcast(tot))
      .select(col(keyCol), col("weight"),
        expr(s"($budget * cast(weight as $dec)) div v").as("base"),
        expr(s"cast(($budget * cast(weight as $dec)) % v as bigint)")
          .as("rem"))
    val allocated = quota.agg(sum(col("base")).as("allocated"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col(keyCol).asc)
    quota.crossJoin(broadcast(allocated))
      .withColumn("rk", row_number().over(w))
      .select(col(keyCol), col("weight"), col("base"), col("rem"),
        (col("base") +
          when(col("rk") <= lit(budget) - col("allocated"), 1L)
            .otherwise(0L)).as("alloc"))
  }

  /** The DuckDB CTE chain mirroring [[hamiltonAllocation]] — ONE
    * source of the oracle algebra so the graded queries that share the
    * Spark helper cannot drift from each other's SQL. Emits CTEs
    * `b/t/q/sb/a` with `a(source, weight, base, rem, alloc)`;
    * `weightsSql` must select (source, weight). */
  def hamiltonAllocSql(weightsSql: String, budget: Long): String =
    s"""b AS (SELECT source, CAST(weight AS HUGEINT) AS weight
       |      FROM ($weightsSql)),
       |t AS (SELECT sum(weight) AS v FROM b),
       |q AS (SELECT source, weight, ($budget * weight) // v AS base,
       |             ($budget * weight) % v AS rem
       |      FROM b CROSS JOIN t),
       |sb AS (SELECT sum(base) AS allocated FROM q),
       |a AS (SELECT source, weight, base, rem,
       |        base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
       |                         <= $budget - allocated THEN 1 ELSE 0 END
       |          AS alloc
       |      FROM q CROSS JOIN sb)""".stripMargin

  /** Deterministic ~`permille`/1000 sample of rows by key hash. */
  def sample(df: DataFrame, keyCol: String, permille: Int): DataFrame =
    df.filter(bucket1000(keyCol) < permille)

  /** Per-stratum deterministic sampling: each stratum value keeps its own
    * permille fraction (unlisted strata are dropped). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       permilleByStratum: Map[String, Int]): DataFrame = {
    val threshold = permilleByStratum.foldLeft(lit(0)) {
      case (acc, (stratum, p)) => when(col(stratumCol) === stratum, p).otherwise(acc)
    }
    df.filter(bucket1000(keyCol) < threshold)
  }

  /** Quality-weighted deterministic sampling: each row keeps with its
    * OWN probability `permilleCol`/1000 (e.g. a quality score mapped to
    * [0, 1000]), decided by comparing the row's hash bucket against the
    * row's threshold — so high-quality documents survive at a higher
    * rate and membership is still a pure function of (key, weight):
    * reproducible across runs, partitionings, and engines. Pure
    * integer compare, scan speed, no shuffle. */
  def weightedSample(df: DataFrame, keyCol: String, permilleCol: Column): DataFrame =
    df.filter(bucket1000(keyCol) < permilleCol)

  /** Temperature-based source mixture rates (the multilingual/multi-
    * source rebalancing rule of mBERT/XLM-R: sample source i
    * proportionally to p_i^α with α = 1/2, flattening the natural
    * distribution so rare sources aren't drowned). Emitted as per-source
    * keep-rates normalized so the SMALLEST source keeps everything:
    * rate_i = sqrt(min_tokens / tokens_i) ∈ (0, 1] — downsampling
    * over-represented sources ∝ p^(−1/2).
    *
    * `rate_ppm` is the integer parts-per-million threshold a
    * [[weightedSample]]-style hash compare consumes. Determinism across
    * engines: tokens are exact BIGINTs, `/` and `sqrt` are both
    * IEEE-754 correctly-rounded single operations, so the double — and
    * its rounding to ppm — is bit-identical in any engine.
    *
    * One aggregation over the corpus (per-source token totals are the
    * only state) + a broadcast of the 1-row minimum. */
  def temperatureMixRates(df: DataFrame, sourceCol: String,
                          tokensCol: String): DataFrame = {
    val bySource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("sum_tokens"))
    val minTok = bySource.agg(min(col("sum_tokens")).as("min_tokens"))
    bySource.crossJoin(broadcast(minTok))
      .select(col(sourceCol), col("n_docs"), col("sum_tokens"),
        expr("cast(round(sqrt(cast(min_tokens as double) / cast(sum_tokens as double)) * 1000000) as bigint)")
          .as("rate_ppm"))
  }

  /** Uniform hash bucket in [0, 1000000) — the ppm-resolution twin of
    * [[bucket1000]] for [[temperatureMixRates]] thresholds. */
  def bucketPpm(keyCol: String): Column =
    expr(s"pmod(cast(conv(substr(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint), 1000000)")

  /** Fixed-quota sample per stratum: keep exactly `k` rows of each
    * stratum (all of them when the stratum is smaller), chosen by
    * deterministic hash order — the "exactly 20 docs per domain"
    * eval-set builder, where [[stratifiedSample]]'s permille rates give
    * proportional but not fixed counts. One shuffle on the stratum; the
    * per-stratum sort state is a top-k heap-sized window, and rank ≤ k
    * cuts everything else before any further stage. */
  def quotaSample(df: DataFrame, keyCol: String, stratumCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"quota must be positive, got $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic round-robin interleaving across sources: emit rank-1
    * docs of every source, then rank-2, … — the training-order
    * construction that guarantees any prefix of the stream mixes all
    * sources evenly (a plain [[epochShuffle]] mixes in expectation;
    * interleaving makes it a hard guarantee, which matters when a run
    * may stop mid-epoch). Per-source ranks come from a hash-ordered
    * window (one shuffle on the source); the final order is a plain
    * range-partitioned sort on (rank, source) — no global window, no
    * single-partition stage. */
  def interleaveBySource(df: DataFrame, keyCol: String,
                         sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("interleave_rank", row_number().over(w))
      .orderBy(col("interleave_rank"), col(sourceCol), col(keyCol))
  }

  /** Train/val/test assignment by hash bucket: [0, trainPermille) →
    * "train", then validation, remainder → "test". Stable across runs —
    * a document can never leak between splits. */
  def splitAssign(df: DataFrame, keyCol: String,
                  trainPermille: Int = 800, valPermille: Int = 100): DataFrame =
    df.withColumn("split",
      when(bucket1000(keyCol) < trainPermille, "train")
        .when(bucket1000(keyCol) < trainPermille + valPermille, "val")
        .otherwise("test"))

  /** Deterministic epoch shuffle: a reproducible pseudo-random global
    * order derived from (seed, key) — change the seed, get a fresh
    * permutation; re-run with the same seed, get the identical order on
    * any cluster layout. The sort is a plain range-partitioned `orderBy`
    * on the hash (Spark's scalable sort — NOT a single-partition
    * window), so it shuffles once and writes all partitions in
    * parallel; partition files concatenate in shuffled order.
    *
    * `keyCol` should be a row identity (e.g. the doc id): rows sharing a
    * key value share a shuffle_key, and the key tie-break can only order
    * them as a group, not individually. */
  def epochShuffle(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws("-", lit(seed), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key"), col(keyCol))

  /** Fractional-epoch mixture expansion — the "2.5 epochs of Wikipedia,
    * 0.3 epochs of CommonCrawl" step that turns per-source mixture
    * weights into an actual training stream: every doc of source s with
    * epochs e(s) appears floor(e) times, plus one more copy for the
    * deterministic hash-selected (e − floor(e)) fraction of docs.
    * e < 1 is plain downsampling; e = 0 drops the source.
    *
    * Shape: the config is |sources| rows — broadcast joined; copies
    * materialize as a codegen'd `sequence` + explode (no shuffle at
    * all; the output is a projection of the scan). Membership in the
    * fractional copy hashes the doc id ([[bucket1000]]), so the
    * expansion is a pure function of row identity — reruns and
    * repartitions agree, and the oracle replays it. Output adds an
    * `epoch` ordinal (0-based) per copy. */
  def epochExpand(df: DataFrame, idCol: String, sourceCol: String,
                  epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty, "epochExpand needs at least one source weight")
    require(epochs.values.forall(e => e >= 0.0 && e <= 100.0),
      "epochs must lie in [0, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    val cfg = epochs.toSeq.sortBy(_._1).map { case (s, e) =>
      val full = math.floor(e).toLong
      (s, full, math.round((e - full) * 1000))
    }.toDF(sourceCol, "__full", "__frac")
    df.join(broadcast(cfg), sourceCol)
      .withColumn("__copies", col("__full") +
        when(bucket1000(idCol) < col("__frac"), 1L).otherwise(0L))
      .filter(col("__copies") >= 1)
      .withColumn("epoch", explode(expr("sequence(0L, __copies - 1L)")))
      .drop("__full", "__frac", "__copies")
  }

  /** Token-budget sequence packing: assign each document to a training
    * bin of ~`budget` tokens. Documents are spread over `numBuckets`
    * hash buckets (the parallelism unit — packing is inherently
    * sequential, so it runs as an independent windowed scan per bucket,
    * never one global window); within a bucket, docs take a
    * deterministic pseudo-random order and bin = floor(running-tokens-
    * before / budget). A bin overfills by at most one document; a
    * document LARGER than the budget consumes several bins' worth, so
    * bin ids are budget offsets, not dense ranks — ids skip after an
    * oversized doc (truncate long docs upstream if bins must be dense).
    * All integer arithmetic: bit-exact in any engine.
    *
    * `partitionCols` prepend extra packing scopes ahead of the hash
    * bucket — e.g. `Seq("split")` packs train/val/test independently so
    * a bin never mixes splits; parallelism becomes |scopes| × numBuckets. */
  def packTokens(df: DataFrame, keyCol: String, tokensCol: String,
                 budget: Long, numBuckets: Int = 32,
                 partitionCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"bad budget=$budget")
    val w = Window.partitionBy((partitionCols :+ "bucket").map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", hashBucket(keyCol, numBuckets))
      .withColumn("__before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      // integer `div`, not `/`: double division would be exact here
      // (values < 2^53) but integer arithmetic needs no such argument
      .withColumn("bin", expr(s"__before div ${budget}L"))
      .drop("__before")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Two paths, as a 100 TB design demands:
  *  - [[bruteForceTopK]]: exact cosine top-k of a SMALL query set against
  *    the full corpus. The query side is broadcast, so the corpus is
  *    scanned once with zero shuffle of the big side; per-query ranking
  *    is a window over (query, candidate) rows — |Q|×N rows total, which
  *    is the right baseline whenever |Q| is bounded.
  *  - [[lshBuckets]] / [[lshTopK]]: approximate path — deterministic
  *    random-hyperplane signatures band the corpus into buckets; queries
  *    only score candidates sharing a band, cutting the scored pairs by
  *    ~bands/bucket-count. This is the shape that survives unbounded |Q|
  *    (pair generation becomes an equi-join on band key, a plain shuffle).
  *
  * Cosine arithmetic is a sequential double fold (VectorFunctions.dot),
  * mirrored exactly by the DuckDB oracle's `list_inner_product`.
  */
object Similarity {

  /** Shared side preparation: rename the id, double-cast the vector ONCE
    * per row, and precompute its norm — never inside a pairwise join. */
  private def prep(df: DataFrame, idCol: String, vecCol: String,
                   idAs: String, vecAs: String, nrmAs: String,
                   passthrough: Seq[(String, String)] = Nil): DataFrame =
    df.select(col(idCol).as(idAs) +:
        VectorFunctions.asDouble(col(vecCol)).as(vecAs) +:
        passthrough.map { case (c, as) => col(c).as(as) }: _*)
      .withColumn(nrmAs, VectorFunctions.norm(col(vecAs)))

  /** Symmetric per-vector int8 quantization — the storage-reduction
    * pass an embedding pipeline runs before indexing (4× smaller than
    * float32; dot products stay proportional within a vector's scale).
    * scale = maxAbs/127, q_i = round(v_i / scale) ∈ [-127, 127]; a
    * zero vector quantizes to zeros with scale 0 (guarded — division
    * would be NaN). maxAbs comes from codegen'd array_min/array_max,
    * not an interpreted fold; only the final int mapping is a HOF.
    * Output: (id, dim, scale, q) with q `array<int>`. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol),
        VectorFunctions.asDouble(col(vecCol)).as("__v"))
      .withColumn("scale",
        greatest(array_max(col("__v")), -array_min(col("__v"))) / 127.0)
      .select(col(idCol), size(col("__v")).as("dim"), col("scale"),
        when(col("scale") === 0.0,
            expr("transform(__v, x -> 0)"))
          .otherwise(expr("transform(__v, x -> CAST(round(x / scale) AS INT))"))
          .as("q"))

  /** Top principal direction of the embedding matrix by MATRIX-FREE
    * power iteration: v ← normalize(XᵀXv), `rounds` times — X is never
    * materialized, each round is one corpus pass (the 100 TB PCA
    * shape). EXACTLY replayable: embeddings quantize once to micro
    * BIGINTs (floor(e·1e6), one shared IEEE multiply), the per-row dot
    * is a codegen zip_with/aggregate fold over the round's vector
    * LITERALS, per-dimension accumulations are associative
    * decimal(38,0) sums, and the L∞ normalization is a sign-split
    * floor division — so the usually-"approximately equal" iterative
    * linear algebra carries a digit-for-digit oracle (the
    * pageRank/kmeans discipline applied to eigenvectors).
    *
    * Driver state: ONE dim-long vector per round (the kmeans-centroid
    * precedent — bounded by the model, not the data). Per round: one
    * corpus pass + one dim-group partial aggregate (map-side combined
    * to `dim` rows per partition); no joins. Returns (d, vm, component)
    * with vm the exact micro weight, component = vm/1e6. Init is the
    * all-ones micro vector; ties in the L∞ max are harmless (max is
    * max). Convergence after `rounds` is the standard power-method
    * guarantee when λ1 > λ2; the returned vector is the exact integer
    * trajectory either way. */
  def powerIteration(df: DataFrame, rounds: Int = 3, dim: Int = 64,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16], got $rounds")
    val s = df.sparkSession
    val dec = "decimal(38,0)"
    val xm = df.select(col(idCol),
        expr(s"transform($vecCol," +
          " e -> cast(floor(cast(e as double) * 1000000) as bigint))")
        .as("xm"))
      .localCheckpoint()
    // Loud exactness ceiling (the q_pr_curve guard discipline): the
    // per-row dot folds in LongType, and |dot| ≤ dim·max|xm|·1e6 (every
    // round's |vm| ≤ 1e6 by the L∞ normalization), so max|xm| must stay
    // under 2⁶³/(dim·1e6) ≈ 1.4e11 at dim 64 (|e| ≤ ~1.4e5) — embedding
    // magnitudes beyond that fail HERE with this message instead of
    // silently wrapping to a wrong eigenvector (the oracle computes the
    // same dot in HUGEINT and would diverge quietly).
    val stats = xm.agg(coalesce(
        max(expr("aggregate(xm, 0L, (a, x) -> greatest(a, abs(x)))")),
        lit(0L)).as("m"), count(lit(1)).as("n"))
      .first()
    val maxAbs = stats.getLong(0)
    val rowCount = stats.getLong(1)
    val ceiling = Long.MaxValue / (dim.toLong * 1000000L)
    require(maxAbs <= ceiling,
      s"powerIteration: max quantized component $maxAbs exceeds the " +
        s"LongType dot-product ceiling $ceiling for dim=$dim - rescale " +
        "the embeddings or widen the fold to decimal")
    // Second ceiling — the decimal(38,0) ACCUMULATION stage: for each
    // dimension, sd = Σ_rows x·dot with |x| ≤ maxAbs and
    // |dot| ≤ dim·maxAbs·1e6, then the normalization multiplies by 1e6
    // again, so the peak magnitude is rowCount·dim·maxAbs²·1e12. Under
    // non-ANSI semantics a decimal(38,0) overflow is a silent NULL that
    // max(abs(sd)) would ignore — the job would then die with an opaque
    // NPE at the collect (and diverge from the DuckDB HUGEINT oracle)
    // instead of this message. BigInt arithmetic: the bound itself
    // (≈1e38) does not fit a Long.
    val decPeak = BigInt(rowCount) * BigInt(dim) *
      BigInt(maxAbs) * BigInt(maxAbs) * BigInt(10).pow(12)
    require(decPeak < BigInt(10).pow(38),
      s"powerIteration: rowCount=$rowCount x dim=$dim x maxAbs=$maxAbs " +
        "exceeds the decimal(38,0) accumulation headroom " +
        "(rowCount*dim*maxAbs^2*1e12 must stay under 1e38) - rescale the " +
        "embeddings or shard the corpus before decomposing")
    // An empty corpus would sail through the magnitude guards
    // (maxAbs=0, rowCount=0) and then produce the exact silent-NULL
    // output they exist to prevent (element_at over an empty per-round
    // collect) — it deserves the same loud failure.
    require(rowCount > 0,
      "powerIteration: empty corpus - nothing to decompose")
    require(maxAbs > 0,
      "powerIteration: every embedding quantizes to the zero vector - " +
        "there is no dominant eigenvector to converge to")
    var v: Array[Long] = Array.fill(dim)(1000000L)
    (1 to rounds).foreach { _ =>
      val vLit = array(v.toIndexedSeq.map(lit(_)): _*)
      val sd = xm
        .select(col("xm"),
          aggregate(zip_with(col("xm"), vLit, (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("dot"))
        .selectExpr("dot", "posexplode(xm) as (d, x)")
        .groupBy(col("d"))
        .agg(sum(expr(s"cast(x as $dec) * dot")).as("sd"))
      val m = sd.agg(max(abs(col("sd"))).as("m"))
      // Defense-in-depth behind the decimal-headroom require above: a
      // NULL here means the non-ANSI decimal stage overflowed (or m hit
      // an unexpected zero) — fail with the diagnosis, not the bare NPE
      // that getLong(1) would throw.
      v = sd.crossJoin(broadcast(m))
        .select(col("d"),
          when(col("sd") < 0, -expr("((- sd) * 1000000) div m"))
            .otherwise(expr("(sd * 1000000) div m")).as("vm"))
        .orderBy("d")
        .collect().map { r =>
          if (r.isNullAt(1)) throw new IllegalStateException(
            s"powerIteration: normalized component for d=${r.get(0)} is " +
              "NULL - the decimal(38,0) stage overflowed or the round's " +
              "max |sd| was zero; the input violates the guarded ceiling")
          r.getLong(1)
        }
    }
    val vLit = array(v.toIndexedSeq.map(lit(_)): _*)
    s.range(dim.toLong)
      .select(col("id").as("d"),
        element_at(vLit, (col("id") + 1).cast("int")).as("vm"))
      .select(col("d"), col("vm"), (col("vm") / 1e6).as("component"))
  }

  /** Per-DIMENSION corpus statistics — the transpose of the per-vector
    * profile: count, mean, std, min, max for every embedding dimension.
    * This is the whitening/normalization prep pass (feature scaling,
    * dead-dimension detection, quantization range calibration) an
    * embedding pipeline runs before indexing.
    *
    * One pass: posexplode to (dim, value), then a single partial-
    * aggregable groupBy(dim) — the shuffle carries `dim` distinct keys
    * per input partition, nothing else. Mean/std are computed from
    * EXACT integer micro-unit sums (`round(v·unit)` as BIGINT — the PQ
    * ADC trick), so s and q are bit-identical in any aggregation order
    * and the final double formula is one fixed IEEE sequence both
    * engines replay. With |v|·unit ≤ ~1e6 the squared sum stays inside
    * BIGINT up to ~3e7 rows per dimension; for a larger corpus pass a
    * smaller `unit` (milli-units at 1e3 hold to ~3e13 rows) — the
    * honest precision/headroom trade, stated rather than hidden. */
  def dimensionStats(df: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding", unit: Double = 1e6): DataFrame =
    df.select(posexplode(VectorFunctions.asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("dim"), col("v"),
        round(col("v") * unit, 0).cast("long").as("__m"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("__m")).as("__s"),
        sum(col("__m") * col("__m")).as("__q"),
        round(min(col("v")), 6).as("min_v"),
        round(max(col("v")), 6).as("max_v"))
      .select(col("dim"), col("n"),
        round(col("__s") / col("n") / unit, 6).as("mean"),
        round(sqrt((col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") / col("n")) /
          col("n")) / unit, 6).as("std"),
        col("min_v"), col("max_v"))

  /** Exact top-k cosine neighbors for each row of `queries` (small,
    * broadcastable) against `corpus`. Ranking uses the similarity rounded
    * to 6 decimals with candidate-id tie-break, so results are
    * deterministic and engine-portable. Self-matches are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Range (radius) search: ALL corpus vectors with cosine similarity
    * ≥ `minCos` to each query — the "find everything this close" sibling
    * of top-k, used for near-duplicate sweeps and label transfer where
    * the neighbor COUNT is the unknown. Filtering on the 6-decimal
    * ROUNDED similarity keeps the τ boundary engine-portable.
    *
    * Scale shape: broadcast the (small) query side, stream the corpus
    * once — a pure narrow filter after the scored cross join, NO window
    * and no per-query state at all, so unlike top-k there is nothing to
    * rank and the operator is embarrassingly parallel; output size is
    * governed by τ, not k. For corpus×corpus radius sweeps use the
    * banded [[embeddingNearDupPairs]] instead — a broadcast cross join
    * is only right while one side stays dimension-sized. */
  def bruteForceRadius(corpus: DataFrame, queries: DataFrame, minCos: Double,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Late-interaction (ColBERT-style MaxSim) retrieval: each vector is
    * treated as `numChunks` token sub-vectors of `chunkDim` dims, and
    * score(q, c) = Σ_i max_j ⟨q_i, c_j⟩ / (‖q‖·‖c‖) — every query chunk
    * soft-aligns to its best-matching candidate chunk, which rewards
    * documents matching ALL query facets over one dominant facet (the
    * behavior plain cosine cannot express). The whole interaction matrix
    * is a nested higher-order expression over the two array columns —
    * built-ins only, no UDF (higher-order functions evaluate interpreted,
    * not codegen'd; at |Q|·N pair counts that is measured fine, and the
    * dedup_jaro case-array lesson applies if a chunk kernel ever needs
    * compiling) — so the plan is the
    * exact broadcast-query × corpus-scan shape of [[bruteForceTopK]]:
    * one corpus pass, zero shuffle of the big side, per-query ranking
    * windows bounded by |Q|. Chunk dots are exact float-product double
    * folds in ascending index order, mirrored by the oracle's
    * list_inner_product over the same slices.
    *
    * CONTRACT: every vector on both sides must have at least
    * numChunks·chunkDim elements. `slice` past the end returns a short
    * array and `zip_with` null-pads, so an undersized embedding would
    * otherwise yield a silent null maxsim (the row just vanishes from
    * the ranking); a size guard WRAPPING the vector column itself (so
    * column pruning cannot elide it) turns that into a loud
    * `raise_error` instead — one codegen'd comparison per row. */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 numChunks: Int = 8, chunkDim: Int = 8,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val need = numChunks * chunkDim
    def dimChecked(df: DataFrame, vec: String, id: String): DataFrame =
      df.withColumn(vec, when(size(col(vec)) >= need, col(vec))
        .otherwise(raise_error(
          concat(lit(s"maxSimTopK: embedding shorter than $need dims at $id="),
            col(id).cast("string")))))
    val q = dimChecked(prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm"),
      "q_vec", "q_id")
    // Spread the corpus before the interpreted chunk-interaction fold:
    // higher-order expressions are the costliest per-row kernel in the
    // ANN family and would otherwise run on the one scan task
    // (guide §2.5; no-op at real scan widths).
    val c = dimChecked(prep(Spread.forCompute(corpus), idCol, vecCol,
      "c_id", "c_vec", "c_nrm"), "c_vec", "c_id")
    val score = expr(
      s"""aggregate(
         |  transform(sequence(0, ${numChunks - 1}), i -> slice(q_vec, i * $chunkDim + 1, $chunkDim)),
         |  cast(0 as double),
         |  (acc, qc) -> acc + array_max(
         |    transform(sequence(0, ${numChunks - 1}), j ->
         |      aggregate(zip_with(qc, slice(c_vec, j * $chunkDim + 1, $chunkDim), (x, y) -> x * y),
         |        cast(0 as double), (a, p) -> a + p))))""".stripMargin)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(score / (col("q_nrm") * col("c_nrm")), 6).as("maxsim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("maxsim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Simplified (centroid-based) silhouette per cluster — the clustering
    * quality diagnostic: a = cosine distance to the OWN centroid, b =
    * distance to the nearest OTHER centroid, s = (b − a)/max(a, b) which
    * for round-6 top-2 centroid similarities s1 ≥ s2 reduces to
    * (s1 − s2)/(1 − s2). The true silhouette needs all point-pair
    * distances (N² — never at scale); the centroid form is the standard
    * O(N·k) surrogate. Centroids are the md5-ordered seed prefix (the
    * cluster_assign convention) so the oracle replays them exactly.
    *
    * Shape: one broadcast cross join corpus × k centroids, then a
    * per-point top-2 via a k-BOUNDED collect_list (state ≤ k rows per
    * point — not a data-sized buffer), then one partial-aggregable
    * groupBy(cell). Per-point silhouettes quantize to exact micro-unit
    * BIGINTs before the per-cluster mean, so aggregation order cannot
    * perturb the graded digits. */
  def silhouette(corpus: DataFrame, k: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val cent = c.orderBy(md5(col("c_id").cast("string")), col("c_id")).limit(k)
      .select(col("c_id").as("cell_id"), col("c_vec").as("cell_vec"),
        col("c_nrm").as("cell_nrm"))
    val sims = c.crossJoin(broadcast(cent))
      .select(col("c_id"), col("cell_id"),
        round(VectorFunctions.dot(col("c_vec"), col("cell_vec")) /
          (col("c_nrm") * col("cell_nrm")), 6).as("sim"))
    // top-2 centroids per point: sort the k-element list by (1−sim,
    // cell_id) — ascending distance == descending similarity with the
    // cluster_assign tie-break; sim rides along unreconstructed.
    val per = sims.groupBy(col("c_id"))
      .agg(sort_array(collect_list(struct(
        (lit(1.0) - col("sim")).as("d"), col("cell_id"), col("sim")))).as("o"))
      .select(col("c_id"),
        col("o").getItem(0).getField("cell_id").as("cell_id"),
        col("o").getItem(0).getField("sim").as("s1"),
        col("o").getItem(1).getField("sim").as("s2"))
      .withColumn("sil",
        when(col("s2") >= 1.0, 0L)
          .otherwise(round((col("s1") - col("s2")) / (lit(1.0) - col("s2")) * 1e6)
            .cast("long")))
    per.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("sil")).cast("double") / count(lit(1)) / 1e6, 4)
          .as("mean_silhouette"),
        round(min(col("sil")) / 1e6, 6).as("min_silhouette"),
        round(max(col("sil")) / 1e6, 6).as("max_silhouette"))
  }

  /** Deterministic ±1 random hyperplane signs: plane p, component i is
    * the parity of a hash of (p, i). Public so the DuckDB oracle builder
    * bakes the IDENTICAL sign literals into its SQL — one source of
    * truth for the planes. */
  def planeSigns(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      // Deterministic pseudo-random sign from (p, i); any fixed mixing
      // function works — this is scala.util.hashing.MurmurHash3 on a pair.
      val h = scala.util.hashing.MurmurHash3.productHash((p, i))
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** The sign vector as a constant-folded array literal — every executor
    * and every engine derives the identical planes. */
  private def planeLit(p: Int, dim: Int): Column =
    array(planeSigns(p, dim).map(lit): _*)

  /** Random-hyperplane LSH signature: `numPlanes` sign bits, banded into
    * `numBands` integer band keys. Output: (id, band, band_key). */
  def lshBuckets(df: DataFrame, numPlanes: Int = 16, numBands: Int = 4,
                 dim: Int = 64,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numPlanes % numBands == 0,
      s"numBands=$numBands must divide numPlanes=$numPlanes — trailing " +
        "planes would be silently dropped from every band key")
    val withV = df.select(col(idCol).as("id"),
      VectorFunctions.asDouble(col(vecCol)).as("__v"))
    val bitCols: Seq[Column] = (0 until numPlanes).map { p =>
      when(VectorFunctions.dot(col("__v"), planeLit(p, dim)) >= 0, 1L).otherwise(0L)
    }
    val perBand = numPlanes / numBands
    val bandKeys: Seq[Column] = (0 until numBands).map { b =>
      (0 until perBand).map(i => bitCols(b * perBand + i) * lit(1L << i))
        .reduce(_ + _).as(s"bk$b")
    }
    withV.select(col("id") +: bandKeys: _*)
      .select(col("id"), explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"), col(s"bk$b").as("band_key"))): _*)).as("s"))
      .select(col("id"), col("s.band"), col("s.band_key"))
  }

  /** Approximate top-k: score only (query, candidate) pairs that share an
    * LSH band. Same output shape as [[bruteForceTopK]] (rank may differ —
    * that is the accuracy/cost trade; measure recall in tests). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 16, numBands: Int = 4, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // No spread here: the plane dots are codegen'd graft_dot folds —
    // measured CHEAPER single-task than behind an extra exchange
    // (r13: ann_lsh 0.53 s → 0.99 s with a corpus spread, reverted).
    val cb = lshBuckets(corpus, numPlanes, numBands, dim, idCol, vecCol)
    val qb = lshBuckets(queries, numPlanes, numBands, dim, idCol, vecCol)
    val cand = cb.alias("c").join(qb.alias("q"),
        col("c.band") === col("q.band") && col("c.band_key") === col("q.band_key"))
      .select(col("q.id").as("q_id"), col("c.id").as("c_id"))
      .filter(col("q_id") =!= col("c_id"))
      .distinct()
    val qv = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val cv = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val scored = cand.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe LSH top-k: in addition to the query's own band key,
    * probe every key at Hamming distance 1 within each band (flip each
    * of the band's sign bits in turn). A query whose true neighbor fell
    * just on the other side of ONE hyperplane still finds it, so recall
    * rises sharply — candidates are a strict superset of single-probe
    * [[lshTopK]]'s — while the CORPUS side is untouched: the probe
    * fan-out ((bits/band + 1)× rows) is paid only on the dimension-sized
    * query side, the classic multi-probe trade (Lv et al., VLDB 2007)
    * of a few more bucket lookups for fewer hash tables. */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        numPlanes: Int = 16, numBands: Int = 4, dim: Int = 64,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val perBand = numPlanes / numBands
    val cb = lshBuckets(corpus, numPlanes, numBands, dim, idCol, vecCol)
    val qb = lshBuckets(queries, numPlanes, numBands, dim, idCol, vecCol)
      .select(col("id"), col("band"), col("band_key"),
        explode(array((lit(0L) +: (0 until perBand).map(i => lit(1L << i))): _*))
          .as("flip"))
      .select(col("id"), col("band"),
        col("band_key").bitwiseXOR(col("flip")).as("band_key"))
    val cand = cb.alias("c").join(qb.alias("q"),
        col("c.band") === col("q.band") && col("c.band_key") === col("q.band_key"))
      .select(col("q.id").as("q_id"), col("c.id").as("c_id"))
      .filter(col("q_id") =!= col("c_id"))
      .distinct()
    val qv = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val cv = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val scored = cand.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Johnson–Lindenstrauss random projection: reduce the embedding to
    * `outDim` dimensions with a deterministic ±1 sign matrix (Achlioptas
    * 2001 — database-friendly random projections; the same constant-
    * folded [[planeSigns]] family the LSH path uses, offset so the two
    * never share planes). out_k = ⟨v, s_k⟩ / √outDim, round-6 — a pure
    * codegen projection, one corpus scan, no shuffle, no UDF. At 100 TB
    * this is the cheap pre-pass that shrinks every downstream distance
    * computation (ANN, clustering, near-dup) by dim/outDim while
    * preserving pairwise distances within (1±ε); √outDim is the JL
    * scaling that keeps expected norms unchanged. */
  def randomProjection(df: DataFrame, outDim: Int, dim: Int = 64,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(outDim > 0 && outDim <= dim,
      s"outDim=$outDim must be in [1, dim=$dim] — projecting UP is not JL")
    val projCols = (0 until outDim).map { k =>
      round(VectorFunctions.dot(col("__v"), planeLit(ProjectionPlaneOffset + k, dim)) /
        sqrt(lit(outDim.toDouble)), 6).as(f"p$k%02d")
    }
    df.select(col(idCol), VectorFunctions.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol) +: projCols: _*)
  }

  /** Plane-family offset for [[randomProjection]] — public so the oracle
    * generator derives the IDENTICAL sign literals. */
  val ProjectionPlaneOffset = 1000

  /** IVF (inverted-file) index: pick `numCells` deterministic seed
    * vectors as centroids (hash-ordered sample — broadcastable at any
    * corpus size), assign every vector to its nearest centroid. One
    * corpus pass; the index is just (id → cell). */
  def ivfIndex(corpus: DataFrame, numCells: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    // No spread: the assignment dot is codegen'd and measured faster
    // without an extra exchange (r13: ann_ivf 0.53 s → 0.80 s, reverted).
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val centroids = c.orderBy(md5(col("c_id").cast("string")), col("c_id"))
      .limit(numCells)
      .select(col("c_id").as("cell_id"), col("c_vec").as("cell_vec"),
        col("c_nrm").as("cell_nrm"))
    // round-6 before ranking: cell choice must not hinge on the last bits
    // of a double fold, or the assignment is not engine/plan-portable.
    // Arg-max as a partial-aggregable min_by (the pqEncode shape): the
    // N×numCells product is reduced map-side to one row per vector —
    // never sort-shuffled. The (−sim, cell_id) ordering is packed into
    // ONE BIGINT — round-6 sim ∈ [−1,1] gives an exact integer
    // sim_micro ∈ [−1e6,1e6], and cell_rank (row number of the ≤numCells
    // centroids by cell_id) is monotone in cell_id — because a struct
    // ordering key would force a non-primitive aggregation buffer and
    // demote the aggregate to SortAggregate; all-long buffers keep it a
    // true HashAggregate. Choice is identical to a rank-1 window over
    // (sim DESC, cell_id).
    val centR = centroids.withColumn("cell_rank",
      row_number().over(Window.orderBy(col("cell_id"))))
    val assign = c.crossJoin(broadcast(centR))
      .withColumn("__sim_micro",
        round(round(VectorFunctions.dot(col("c_vec"), col("cell_vec")) /
          (col("c_nrm") * col("cell_nrm")), 6) * 1e6, 0).cast("long"))
      .withColumn("__ord",
        (lit(1000000L) - col("__sim_micro")) * lit(1L << 32) + col("cell_rank"))
      .groupBy(col("c_id"))
      .agg(expr("min_by(cell_id, __ord)").as("cell_id"))
    (centroids, assign)
  }

  /** IVF approximate top-k: per query, rank the `nProbe` nearest cells,
    * then score only vectors assigned to those cells. Scanned fraction ≈
    * nProbe / numCells of the corpus; candidate generation is an
    * equi-join on cell_id (a plain shuffle — no cross product). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (centroids, assign) = ivfIndex(corpus, numCells, idCol, vecCol)
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("__csim").desc, col("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        round(VectorFunctions.dot(col("q_vec"), col("cell_vec")) /
          (col("q_nrm") * col("cell_nrm")), 6))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("cell_id"))
    val cv = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val cand = probes.join(assign, "cell_id")
      .select(col("q_id"), col("c_id"))
      .filter(col("q_id") =!= col("c_id"))
    val scored = cand.join(broadcast(q), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Product-quantization codebooks: the vector is cut into `numSub`
    * contiguous sub-vectors; each subspace gets the SAME `numCodes`
    * deterministic seed vectors (md5-ordered corpus prefix, the IVF
    * seeding rule) sliced to that subspace. Code id = seed vec_id, so
    * the whole codebook is a pure function of the data — no RNG, which
    * is what lets the "approximate" PQ path carry an exact oracle.
    *
    * Output (broadcastable: numSub × numCodes rows): (j, code_id, cvec,
    * cdot) with cdot = ⟨cvec,cvec⟩ precomputed once. */
  def pqCodebooks(corpus: DataFrame, numSub: Int, numCodes: Int, dim: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % numSub == 0,
      s"numSub=$numSub must divide dim=$dim — a ragged tail subspace " +
        "would silently change every code assignment")
    val sub = dim / numSub
    val seeds = prep(corpus, idCol, vecCol, "code_id", "v", "__n")
      .orderBy(md5(col("code_id").cast("string")), col("code_id"))
      .limit(numCodes)
    seeds.select(col("code_id"), col("v"),
        explode(sequence(lit(0), lit(numSub - 1))).as("j"))
      .select(col("j"), col("code_id"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("cvec"))
      .withColumn("cdot", VectorFunctions.dot(col("cvec"), col("cvec")))
  }

  /** PQ encoding: each vector becomes `numSub` small integer codes — the
    * nearest codeword per subspace by L2 distance (round-6, code-id
    * tie-break). ‖x_j − c‖² = ⟨x_j,x_j⟩ − 2⟨x_j,c⟩ + ⟨c,c⟩, every term a
    * sequential fold the oracle replays. One corpus scan: explode to
    * (row × subspace), broadcast-join the codebook, partial-aggregable
    * arg-min — no window, no shuffle of raw vectors. At 100 TB this is
    * the compression pass: 64 float dims → `numSub` byte-ish codes per
    * row, and every later ADC scan reads ONLY the codes. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, numSub: Int, dim: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / numSub
    // Spread before the numSub-way explode × numCodes broadcast-join
    // argmin — the encode pass does N·numSub·numCodes sub-vector dots
    // and is the ANN family's heaviest scan-stage kernel (guide §2.5).
    val c = prep(Spread.forCompute(corpus), idCol, vecCol, "c_id", "v", "__n")
    c.select(col("c_id"), col("v"),
        explode(sequence(lit(0), lit(numSub - 1))).as("j"))
      .select(col("c_id"), col("j"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("xsub"))
      .withColumn("xdot", VectorFunctions.dot(col("xsub"), col("xsub")))
      .join(broadcast(codebook), "j")
      .withColumn("__d2", round(col("xdot") - lit(2.0) *
        VectorFunctions.dot(col("xsub"), col("cvec")) + col("cdot"), 6))
      .groupBy(col("c_id"), col("j"))
      .agg(expr("min_by(code_id, struct(__d2, code_id))").as("code_id"))
  }

  /** PQ asymmetric-distance top-k: the query stays exact, the corpus is
    * its codes. Per query, a lookup table ⟨q_j, codeword⟩ is built
    * against the broadcast codebook (|Q|·numSub·numCodes rows — tiny),
    * and every corpus vector's approximate inner product is the SUM of
    * its codes' table entries. The sum is over integer micro-units
    * (round-6 ⟨q_j,c⟩ × 10⁶ as BIGINT) so it is exact in any aggregation
    * order — a double sum here would be partition-order-dependent and
    * ungradeable. Scan cost: codes only (numSub small ints/row), never
    * the raw vectors; the whole scoring pass is one broadcast join plus
    * one partial-aggregable groupBy — the shape that survives a corpus
    * 1000× too big to hold uncompressed. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             numSub: Int = 16, numCodes: Int = 32, dim: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / numSub
    val cb = pqCodebooks(corpus, numSub, numCodes, dim, idCol, vecCol)
    val codes = pqEncode(corpus, cb, numSub, dim, idCol, vecCol)
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "__n")
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("j"), col("code_id"),
        round(VectorFunctions.dot(
            slice(col("q_vec"), col("j") * sub + 1, lit(sub)), col("cvec")) * 1e6, 0)
          .cast("long").as("ip_micro"))
    val scored = codes.join(broadcast(lut), Seq("j", "code_id"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("ip_micro")).as("adc_micro"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_micro").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Filtered ANN: exact top-k restricted to corpus vectors satisfying a
    * per-query metadata predicate (here: equality on `filterCol` — the
    * "same tenant / same language / same license" constraint every
    * production vector search carries). The filter column becomes part
    * of the JOIN KEY, so filtering happens BEFORE any scoring: the pair
    * space is per-filter-group blocks, never query × corpus. At 100 TB
    * this composes with partitioning on the filter column (partition
    * pruning feeds the join only matching files). */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   filterCol: String = "label",
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm",
      passthrough = Seq(filterCol -> "__qf"))
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm",
      passthrough = Seq(filterCol -> "__cf"))
    val scored = c.join(broadcast(q),
        col("__cf") === col("__qf") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF+PQ composite — the standard production serving shape (FAISS's
    * IVFPQ, minus residual encoding): IVF decides WHICH vectors to score
    * (only the `nProbe`/`numCells` fraction assigned to probed cells),
    * PQ decides HOW each survivor is scored (codes + broadcast ADC LUT,
    * never the raw vectors). Candidate generation is the IVF equi-join
    * on cell_id; scoring joins the candidates' codes against the LUT and
    * sums exact BIGINT micro-units. At 100 TB the scan touches codes for
    * ~nProbe/numCells of the corpus and raw vectors for nothing. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                numCells: Int = 16, nProbe: Int = 4,
                numSub: Int = 16, numCodes: Int = 32, dim: Int = 64,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / numSub
    val (centroids, assign) = ivfIndex(corpus, numCells, idCol, vecCol)
    val cb = pqCodebooks(corpus, numSub, numCodes, dim, idCol, vecCol)
    val codes = pqEncode(corpus, cb, numSub, dim, idCol, vecCol)
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("__csim").desc, col("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        round(VectorFunctions.dot(col("q_vec"), col("cell_vec")) /
          (col("q_nrm") * col("cell_nrm")), 6))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("cell_id"))
    val cand = probes.join(assign, "cell_id")
      .select(col("q_id"), col("c_id"))
      .filter(col("q_id") =!= col("c_id"))
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("j"), col("code_id"),
        round(VectorFunctions.dot(
            slice(col("q_vec"), col("j") * sub + 1, lit(sub)), col("cvec")) * 1e6, 0)
          .cast("long").as("ip_micro"))
    val scored = cand.join(codes, "c_id")
      .join(broadcast(lut), Seq("q_id", "j", "code_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("ip_micro")).as("adc_micro"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_micro").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Filtered IVF+PQ composite — per-tenant / per-label vector search
    * over a compressed corpus, the shape production filtered ANN needs
    * at 100 TB: the metadata predicate rides IN THE CANDIDATE JOIN KEY
    * (cell_id AND label equality — as [[filteredTopK]]), IVF prunes the
    * scan to the probed nProbe/numCells fraction (as [[ivfPqTopK]]),
    * and scoring touches only PQ codes + the broadcast ADC LUT. Raw
    * vectors are read for nothing; non-matching-label candidates never
    * reach the scoring aggregate, let alone a shuffle of vector
    * payloads. Same exact BIGINT micro-unit ADC, so the approximate
    * path still carries a bit-exact oracle. */
  def filteredIvfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        filterCol: String = "label",
                        numCells: Int = 16, nProbe: Int = 4,
                        numSub: Int = 16, numCodes: Int = 32, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = dim / numSub
    val (centroids, assign) = ivfIndex(corpus, numCells, idCol, vecCol)
    val cb = pqCodebooks(corpus, numSub, numCodes, dim, idCol, vecCol)
    val codes = pqEncode(corpus, cb, numSub, dim, idCol, vecCol)
    val q = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm",
      passthrough = Seq(filterCol -> "__qf"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("__csim").desc, col("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        round(VectorFunctions.dot(col("q_vec"), col("cell_vec")) /
          (col("q_nrm") * col("cell_nrm")), 6))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col("q_id"), col("__qf"), col("cell_id"))
    val assignL = assign.join(
      corpus.select(col(idCol).as("c_id"), col(filterCol).as("__cf")), "c_id")
    val cand = probes.join(assignL,
        probes("cell_id") === assignL("cell_id") && col("__qf") === col("__cf"))
      .select(col("q_id"), col("c_id"))
      .filter(col("q_id") =!= col("c_id"))
    val lut = q.crossJoin(broadcast(cb))
      .select(col("q_id"), col("j"), col("code_id"),
        round(VectorFunctions.dot(
            slice(col("q_vec"), col("j") * sub + 1, lit(sub)), col("cvec")) * 1e6, 0)
          .cast("long").as("ip_micro"))
    val scored = cand.join(codes, "c_id")
      .join(broadcast(lut), Seq("q_id", "j", "code_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("ip_micro")).as("adc_micro"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_micro").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Two-stage PQ retrieve-then-rerank: ADC ranks the compressed corpus
    * down to `kAdc` candidates per query, then ONLY those candidates'
    * raw vectors are fetched and scored with the exact round-6 cosine.
    * This is the production ANN shape at 100 TB — the full corpus is
    * touched only in compressed form; the exact pass joins a candidate
    * list of |Q|·kAdc rows back to the vector store (an equi-join on
    * id, a plain shuffle pruned to the candidates). */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int, kAdc: Int,
                   numSub: Int = 16, numCodes: Int = 32, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kAdc >= k, s"kAdc=$kAdc must be >= k=$k")
    val cand = pqTopK(corpus, queries, kAdc, numSub, numCodes, dim, idCol, vecCol)
      .select(col("q_id"), col("c_id"))
    val qv = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val cv = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val scored = cand.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The COMPLETE production filtered-serving chain: metadata filter in
    * the candidate join key → IVF cell probing → ADC scoring over codes
    * → exact cosine rerank of only the kAdc shortlisted raw vectors.
    * Composes [[filteredIvfPqTopK]] (retrieval, compressed domain) with
    * [[pqRerankTopK]]'s second stage (precision, |Q|·kAdc vector
    * fetches). At 100 TB: full corpus touched only as codes within the
    * probed cells of the matching label; raw vectors only for the
    * shortlist equi-join. */
  def filteredIvfPqRerankTopK(corpus: DataFrame, queries: DataFrame,
                              k: Int, kAdc: Int,
                              filterCol: String = "label",
                              numCells: Int = 16, nProbe: Int = 4,
                              numSub: Int = 16, numCodes: Int = 32, dim: Int = 64,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kAdc >= k, s"kAdc=$kAdc must be >= k=$k")
    val cand = filteredIvfPqTopK(corpus, queries, kAdc, filterCol,
        numCells, nProbe, numSub, numCodes, dim, idCol, vecCol)
      .select(col("q_id"), col("c_id"))
    val qv = prep(queries, idCol, vecCol, "q_id", "q_vec", "q_nrm")
    val cv = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val scored = cand.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        round(VectorFunctions.dot(col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Lloyd's k-means over the embedding column — the curation companion
    * to [[ivfIndex]] (cluster-then-sample, cluster-balanced mixtures,
    * refined IVF cells). Seeding is the deterministic md5-ordered prefix
    * (same as IVF); each iteration is one broadcast-join assignment pass
    * plus one per-cell mean aggregation — no driver-side math beyond
    * collecting k centroids (k is small by definition), no cross
    * product. Returns (centroids, assignments).
    *
    * Two means modes:
    *  - `exactMeans = false` (default): plain `avg(double)` — fastest,
    *    but double summation order is partition-order-dependent, so
    *    cross-engine bit-parity cannot be promised for the iterative
    *    update; invariants (objective decreases, assignment determinism
    *    given centroids) are spec-asserted instead.
    *  - `exactMeans = true`: each element is quantized to micro-units
    *    (`round(x*1e6)` as BIGINT) and the per-cell mean is
    *    `(sum_micro / count) / 1e6` — the sum is an exact associative
    *    integer (same trick as the PQ ADC scores), so the centroids are
    *    bit-identical in ANY aggregation order and the whole iterative
    *    algorithm is oracle-gradeable (`cluster_kmeans`). The ~1e-6
    *    centroid quantization is far below the round-6 similarity
    *    granularity the assignment step already uses. */
  /** Centroids as a COLLECTED local relation — k rows of k×dim doubles
    * by definition, so collecting them bounds lineage to one corpus
    * scan per action instead of replaying every previous iteration's
    * cross-join + aggregation. Output (cell_id, cell_vec, cell_nrm). */
  private def localizeCentroids(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = df.select(col("cell_id"), col("cell_vec"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    rows.toDF("cell_id", "cell_vec")
      .withColumn("cell_nrm", VectorFunctions.norm(col("cell_vec")))
  }

  /** Nearest-centroid assignment over a prepped corpus — the one
    * partial-aggregable arg-max every centroid consumer shares (kmeans
    * iterations, the IVF index, and the incremental reindex pipeline):
    * min_by carries the vector payload so a means pass needs no
    * re-join; round-6 + cell_id tie-break matches the oracle's rank-1
    * window exactly. A drifted copy of this arithmetic in any one
    * consumer would silently de-synchronize queries that claim to
    * share the assignment convention. */
  private def assignCore(c: DataFrame, cent: DataFrame): DataFrame =
    c.crossJoin(broadcast(cent))
      .withColumn("__sim",
        round(VectorFunctions.dot(col("c_vec"), col("cell_vec")) /
          (col("c_nrm") * col("cell_nrm")), 6))
      .groupBy(col("c_id"))
      .agg(expr("min_by(struct(c_vec, cell_id, __sim), struct(-__sim, cell_id))").as("__b"))
      .select(col("c_id"), col("__b.c_vec").as("c_vec"),
        col("__b.cell_id").as("cell_id"), col("__b.__sim").as("__sim"))

  /** The deterministic seed centroids [[kmeans]] starts from (first k
    * vectors by md5(id) — a pure function of the data, so oracles can
    * replay it), exposed for consumers that assign against a FIXED
    * corpus state while the corpus itself moves on — the incremental
    * reindex pipeline's contract. Output (cell_id, cell_vec, cell_nrm),
    * collected local (k×dim doubles by definition). */
  def seedCentroids(corpus: DataFrame, k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    localizeCentroids(corpus.sparkSession,
      c.orderBy(md5(col("c_id").cast("string")), col("c_id"))
        .limit(k)
        .select(col("c_id").as("cell_id"), col("c_vec").as("cell_vec")))
  }

  /** Assign `corpus` rows to fixed `centroids` (a [[seedCentroids]] /
    * [[kmeans]] output): (id, cell_id, sim) with the exact shared
    * assignment arithmetic. The centroid side is local/broadcast, so
    * the plan is one map-side cross join + a partial-aggregable arg-max
    * — linear in |corpus| with no corpus-side shuffle beyond the
    * groupBy on the id. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame =
    assignCore(prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm"),
        centroids)
      .select(col("c_id").as(idCol), col("cell_id"), col("__sim").as("sim"))

  def kmeans(corpus: DataFrame, k: Int, iterations: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding",
             exactMeans: Boolean = false): (DataFrame, DataFrame) = {
    require(k > 0 && iterations >= 0, s"bad k=$k / iterations=$iterations")
    // localize() collects centroid ids as Long, so idCol must be an
    // integral type (Int/Short/Byte upcast safely; anything else would
    // surface as an opaque encoder/cast error deep in iteration 1).
    val idType = corpus.schema(idCol).dataType
    require({
      import org.apache.spark.sql.types._
      Seq(LongType, IntegerType, ShortType, ByteType).contains(idType)
    }, s"kmeans requires an integral idCol; $idCol is $idType")
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = prep(corpus, idCol, vecCol, "c_id", "c_vec", "c_nrm")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)

    var centroids = localizeCentroids(spark,
      c.orderBy(md5(col("c_id").cast("string")), col("c_id"))
        .limit(k)
        .select(col("c_id").as("cell_id"), col("c_vec").as("cell_vec")))
    def assign(cent: DataFrame): DataFrame = assignCore(c, cent)
    (0 until iterations).foreach { _ =>
      val a = assign(centroids)
      // element-wise mean per cell: aggregate the 64-ish dims as columns
      // (partial-aggregable sums, one shuffle on cell_id)
      val means = if (exactMeans) {
        val aggs = count(lit(1)).as("__cnt") +: (0 until dim).map(i =>
          sum(round(col("c_vec").getItem(i) * lit(1e6)).cast("long")).as(s"__s$i"))
        a.groupBy(col("cell_id"))
          .agg(aggs.head, aggs.tail: _*)
          .select(col("cell_id"),
            array((0 until dim).map(i =>
              (col(s"__s$i") / col("__cnt")) / lit(1e6)): _*).as("cell_vec"))
      } else {
        val dims = (0 until dim).map(i => avg(col("c_vec").getItem(i)).as(s"__m$i"))
        a.groupBy(col("cell_id"))
          .agg(dims.head, dims.tail: _*)
          .select(col("cell_id"),
            array((0 until dim).map(i => col(s"__m$i")): _*).as("cell_vec"))
      }
      // a cell that captured no points vanishes from the means — keep
      // its previous centroid so k never silently shrinks
      val kept = localizeCentroids(spark, means)
      val emptyCells = centroids.join(kept, Seq("cell_id"), "left_anti")
      centroids = localizeCentroids(spark, kept.select("cell_id", "cell_vec")
        .unionByName(emptyCells.select("cell_id", "cell_vec")))
    }
    (centroids, assign(centroids).select(col("c_id"), col("cell_id"), col("__sim")))
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (e.g. a
    * cluster/label column — the IVF idea: only intra-cell pairs are
    * scored). Output (id_a, id_b, cos_sim) with id_a < id_b.
    *
    * Scale guard: a block of B rows costs O(B²) pairs. Blocks up to
    * `maxExactBlock` rows take the exact all-pairs path; LARGER blocks
    * are sub-blocked by random-hyperplane LSH bands, so only pairs
    * colliding in a band are scored — within an oversized block the
    * join key becomes (blk, band, band_key) and the quadratic term is
    * bounded by the bucket size, not the block size. The two paths
    * partition the blocks (a block is either small or big), so results
    * are exact below the cap and LSH-approximate above it — which is
    * the honest semantics of a near-dup pass over a 100 TB corpus. */
  def embeddingNearDupPairs(df: DataFrame, blockCol: String, minCos: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            maxExactBlock: Int = 10000,
                            numPlanes: Int = 8, numBands: Int = 4,
                            dim: Int = 64): DataFrame = {
    require(numPlanes % numBands == 0,
      s"numBands=$numBands must divide numPlanes=$numPlanes — trailing " +
        "planes would be silently dropped from every band key")
    val e = prep(df, idCol, vecCol, "id", "v", "nrm",
      passthrough = Seq(blockCol -> "blk"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("blk"))))
    def score(pairs: DataFrame): DataFrame =
      pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          round(VectorFunctions.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= minCos)

    val small = e.filter(col("__bn") <= maxExactBlock)
    val exactPairs = score(small.alias("a").join(small.alias("b"),
      col("a.blk") === col("b.blk") && col("a.id") < col("b.id")))

    val big = e.filter(col("__bn") > maxExactBlock)
    val perBand = numPlanes / numBands
    val bits = (0 until numPlanes).map { p =>
      when(VectorFunctions.dot(col("v"), planeLit(p, dim)) >= 0, 1L).otherwise(0L)
    }
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        (0 until perBand).map(i => bits(b * perBand + i) * lit(1L << i))
          .reduce(_ + _).as("band_key"))
    }
    val banded = big.select(col("blk"), col("id"), col("v"), col("nrm"),
        explode(array(bandStructs: _*)).as("s"))
      .select(col("blk"), col("id"), col("v"), col("nrm"),
        col("s.band"), col("s.band_key"))
    // distinct on ids only (a pair can collide in several bands), then
    // re-attach vectors — never drag vector payloads through a distinct
    val lshCand = banded.alias("x").join(banded.alias("y"),
        col("x.blk") === col("y.blk") && col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"))
      .distinct()
    val vecs = e.select(col("id"), col("v"), col("nrm"))
    val lshPairs = score(lshCand
      .join(vecs.alias("a"), col("ida") === col("a.id"))
      .join(vecs.alias("b"), col("idb") === col("b.id")))

    exactPairs.unionByName(lshPairs)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the deterministic
    * nearest-centroid assignment ([[kmeans]] at iterations=0, the graded
    * `cluster_assign` arithmetic), score ONLY intra-cluster pairs
    * (via [[embeddingNearDupPairs]] with the cluster as the blocking
    * key, inheriting its maxExactBlock/LSH scale guard), and drop every
    * member that has an epsilon-neighbor closer to the shared centroid.
    *
    * Removal policy (deterministic, anti-join expressible, no
    * iteration): for each pair with round-6 cosine >= eps, the member
    * with the LOWER (centroid_sim, -id) ordering is dominated; a doc is
    * removed iff ANY neighbor dominates it. This is the greedy
    * keep-the-most-central variant of the paper's per-neighborhood
    * representative selection, chosen because it needs one pair join +
    * one anti-join rather than a component fixpoint (use
    * [[graft.operators.Dedup.nearDupSurvivors]] when transitive-group
    * semantics are wanted instead).
    *
    * At 100 TB: assignment is a broadcast-centroid linear pass; the
    * quadratic term is bounded per cluster by the inherited block guard;
    * the dominance pass is an equi-join on precomputed ids. Returns
    * survivors (idCol, cell_id, cent_sim) — cent_sim is the round-6
    * cosine to the assigned centroid. */
  def semanticDedup(corpus: DataFrame, k: Int, eps: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    maxExactBlock: Int = 10000): DataFrame = {
    val (_, asgRaw) = kmeans(corpus, k, iterations = 0, idCol, vecCol)
    val asg = asgRaw.select(col("c_id"), col("cell_id"), col("__sim").as("cent_sim"))
    val blocked = corpus.join(
      asg.withColumnRenamed("c_id", idCol), idCol)
    val pairs = embeddingNearDupPairs(blocked, "cell_id", eps, idCol, vecCol,
      maxExactBlock)
    val sims = asg.select(col("c_id"), col("cent_sim"))
    val edges = pairs
      .join(sims.select(col("c_id").as("id_a"), col("cent_sim").as("sim_a")), "id_a")
      .join(sims.select(col("c_id").as("id_b"), col("cent_sim").as("sim_b")), "id_b")
    val losers = edges.select(
        when(col("sim_a") > col("sim_b") ||
             (col("sim_a") === col("sim_b") && col("id_a") < col("id_b")),
          col("id_b")).otherwise(col("id_a")).as(idCol))
      .distinct()
    blocked.select(col(idCol), col("cell_id"), col("cent_sim"))
      .join(losers, Seq(idCol), "left_anti")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation. At 100 TB a handful of hot keys (the reference's
  * `continent` column has 6 values over 50 M rows — SURVEY.md §1.3)
  * dominate shuffle partitions. Three lines of defense, in order:
  *
  *  1. Map-side partial aggregation (free — Spark does it for additive
  *     aggregates; keep aggregates partial-able, see Dedup's BIGINT
  *     minhash signatures).
  *  2. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *     on by default) — handles sort-merge joins at runtime.
  *  3. Explicit salting — for the cases neither covers: shuffle-hash
  *     joins AQE won't split, hot-key aggregations whose buffers are not
  *     additive (collect_list/exact distinct), streaming state.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a random salt in
    * [0, salts); the small side is replicated `salts` times; the join key
    * becomes (key, salt), spreading each hot key across `salts` reducers.
    * Row-identical to `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    // Deterministic salt (hash of the row content): a nondeterministic
    // salt (e.g. monotonically_increasing_id) feeding a shuffle key can
    // duplicate/drop rows when map tasks are recomputed after a fetch
    // failure — the SPARK-23207 class of bug.
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for non-additive hot-key aggregates
    * (e.g. per-key exact distinct): phase 1 on (key, salt, value) spreads
    * the hot key; phase 2 combines partials per key. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String],
                          valueCol: String, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      // salts partition the VALUE space (salt = hash(value) % salts), so
      // per-salt distinct counts are disjoint and sum exactly.
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}

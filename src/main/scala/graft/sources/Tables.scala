package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet fixtures (TESTDATA.md).
  *
  * All graded queries read through here so that scan-level concerns
  * (column pruning, predicate pushdown, partition sizing) are applied
  * uniformly. At 100 TB these tables would be partitioned/bucketed on
  * their join keys; the loaders deliberately return the raw scan and let
  * Catalyst push filters/projections down into the Parquet reader —
  * verify with `.explain("formatted")` → `PushedFilters` / `ReadSchema`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` arrives in one of two physical forms depending on how
    * the fixture generation wrote it:
    *  - parquet TIMESTAMP(NANOS): with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` Spark reads it as a
    *    Long of nanos since epoch;
    *  - parquet TIMESTAMP(MICROS) (adjusted or naive): Spark reads it as
    *    TIMESTAMP / TIMESTAMP_NTZ.
    * This loader NORMALIZES to one canonical schema either way: `ts` is
    * always epoch-NANOS Long (sessions run in UTC, so the NTZ cast is
    * exact) and `ts_ms` is epoch millis by exact integer division —
    * never float-divide an int64 near 2^60. All graft queries read
    * through here; DuckDB oracles use `epoch_ms(ts)`, which is equally
    * unit-agnostic on the oracle side. */
  def events(s: SparkSession, d: String): DataFrame =
    withTsMs(table(s, d, "events"))

  /** Adds `ts_ms` (epoch millis, Long) derived from whatever physical
    * type `ts` carries, and rewrites `ts` itself to epoch-nanos Long so
    * downstream nanos arithmetic (`ts div 3600000000000` hour buckets,
    * …) is type-independent. Shared by [[events]] and the streaming
    * queries that re-read staged copies of the fixture (a staged parquet
    * round-trips the original physical type, so the same branch is
    * needed there). Plan-time schema branch only — no per-row cost
    * beyond the single cast projection. */
  def withTsMs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long read: ts already epoch nanos
        df.withColumn("ts_ms", expr("ts div 1000000"))
      case _ =>        // TIMESTAMP / TIMESTAMP_NTZ (micros)
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
          .withColumn("ts_ms", expr("ts div 1000000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

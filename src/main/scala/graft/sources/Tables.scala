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
  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a Long of
    * nanos since epoch. This loader adds `ts_ms` (epoch millis, exact
    * integer division — never float-divide an int64 near 2^60) which all
    * graft queries use; DuckDB oracles use `epoch_ms(ts)`. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    table(s, d, "events").withColumn("ts_ms", expr("ts div 1000000"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

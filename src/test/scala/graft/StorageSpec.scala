package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Storage-layout levers for 100 TB deployments: bucketing (co-located,
  * shuffle-free joins) and partitioned writes (partition-pruned scans).
  * These are assertions about the PHYSICAL PLAN, not just results — the
  * whole point is which exchanges/scans disappear. */
class StorageSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val o = Tables.orders(spark, sf("sf0.001")).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf("sf0.001")).select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").option("path", s"$wh/o_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    l.write.mode("overwrite").option("path", s"$wh/l_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("l_bucketed")

    // hint("merge") forces a sort-merge join — at fixture scale the
    // planner would broadcast these tiny tables and never consult the
    // buckets; at 100 TB SMJ is what actually happens, and the buckets
    // are what delete its exchanges.
    val joined = spark.table("o_bucketed").hint("merge")
      .join(spark.table("l_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
    val n = joined.count()
    assert(n === Tables.lineitem(spark, sf("sf0.001"))
      .join(Tables.orders(spark, sf("sf0.001")),
        col("l_orderkey") === col("o_orderkey")).count())
    // co-located bucketed join: no shuffle on either side
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), s"expected SMJ in:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed join must not shuffle; plan was:\n$p")
  }

  test("partitioned parquet scans prune partitions on the filter") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val filtered = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
    val p = plan(filtered)
    // partition pruning shows in the scan's PartitionFilters, and only
    // the matching directory is read
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"expected partition filters in:\n$p")
    assert(filtered.count() ===
      Tables.events(spark, sf("sf0.001"))
        .filter(col("event_type") === "purchase").count())
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Spread

/** Scan-parallelism repair (round-13 optimization): [[Spread.forCompute]]
  * must widen narrow batch scans to the cluster's parallelism, leave
  * already-wide frames untouched (the 100 TB no-op contract), pass
  * streaming frames through, and never change results. */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private def target = spark.sparkContext.defaultParallelism

  test("widens a single-partition frame to defaultParallelism") {
    val narrow = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    assert(narrow.rdd.getNumPartitions === 1)
    val wide = Spread.forCompute(narrow)
    assert(wide.rdd.getNumPartitions === target,
      "a one-split scan must spread to every core")
  }

  test("no-op when the frame is already at least as wide as the cluster") {
    val already = spread_input(target + 3)
    val out = Spread.forCompute(already)
    assert(out.rdd.getNumPartitions === target + 3,
      "an input wider than the cluster must NOT pay a repartition " +
        "(the production 100 TB scan case)")
    // plan identity: no Exchange was inserted
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      s"unexpected exchange in:\n${out.queryExecution.executedPlan}")
  }

  private def spread_input(n: Int) =
    spark.range(0, 1000, 1, numPartitions = n).toDF("id")

  test("row multiset is conserved and per-row projections are unchanged") {
    val df = spark.range(0, 500, 1, numPartitions = 1)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
    val a = df.collect().map(_.toSeq.toString).sorted
    val b = Spread.forCompute(df).collect().map(_.toSeq.toString).sorted
    assert(a.sameElements(b), "spread must not add, drop, or alter rows")
  }

  test("streaming frames pass through untouched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Long](spark)
    val streaming = ms.toDF()
    val out = Spread.forCompute(streaming)
    assert(out.isStreaming)
    // same logical plan object semantics: no repartition node appears
    assert(!out.queryExecution.logical.toString.toLowerCase
      .contains("repartition"))
  }
}

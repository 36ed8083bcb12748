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

  test("suppress: composite callers disable the spread inside the scope only") {
    val narrow = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    val inScope = Spread.suppress { Spread.forCompute(narrow) }
    assert(inScope.rdd.getNumPartitions === 1,
      "forCompute inside suppress{} must be a no-op")
    // nests and restores: after the scope the spread fires again
    val nested = Spread.suppress { Spread.suppress { 1 } + 1 }
    assert(nested === 2)
    assert(Spread.forCompute(narrow).rdd.getNumPartitions === target,
      "suppression must not leak past its scope")
  }

  test("byKey: keyed spread satisfies a window's distribution without a second exchange") {
    import org.apache.spark.sql.expressions.Window
    val narrow = spark.range(0, 1000, 1, numPartitions = 1)
      .select((col("id") % 7).as("k"), col("id"))
    val spreadKeyed = Spread.byKey(narrow, col("k"))
    assert(spreadKeyed.rdd.getNumPartitions === target)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val windowed = spreadKeyed.withColumn("rn", row_number().over(w))
    // exactly ONE exchange in the executed plan: the keyed spread; the
    // window reuses its hash partitioning (ClusteredDistribution)
    windowed.write.format("noop").mode("overwrite").save()
    val plan = windowed.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"expected exactly one exchange:\n$plan")
    // results identical to the un-spread computation
    val base = narrow.withColumn("rn", row_number().over(w))
      .collect().map(_.toSeq.toString).sorted.toSeq
    val got = windowed.collect().map(_.toSeq.toString).sorted.toSeq
    assert(base === got)
    // no-op on wide inputs (the 100 TB contract), same as forCompute
    val wide = spark.range(0, 1000, 1, numPartitions = target + 2)
      .select((col("id") % 7).as("k"))
    assert(Spread.byKey(wide, col("k")).rdd.getNumPartitions === target + 2)
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

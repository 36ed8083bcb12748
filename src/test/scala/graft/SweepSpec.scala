package graft

import org.apache.spark.sql.functions._

import graft.operators.Sweep

/** Sweep-line primitives: the distributed running sum must equal the
  * single-partition window formulation exactly (it replaces it), and the
  * interval-concurrency counts must match a brute-force overlap join. */
class SweepSpec extends SparkSpec {
  import spark.implicits._

  test("runningSum equals the naive global-window prefix sum") {
    val df = (1 to 5000).map(i => (i.toLong, (i % 7).toLong - 3))
      .toDF("k", "delta")
      .repartition(13) // scramble placement: result must not depend on it
    val got = Sweep.runningSum(df, col("delta"), "run", col("k"))
      .select("k", "run").as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val want = (1 to 5000).map { i => acc += (i % 7).toLong - 3; (i.toLong, acc) }
    assert(got.toSeq === want)
  }

  test("runningSum is deterministic under ties given a total order") {
    val df = Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 10L, -2L), (4L, 20L, 1L))
      .toDF("id", "t", "delta")
    val got = Sweep.runningSum(df, col("delta"), "run", col("t"), col("id"))
      .select("id", "run").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 5L), (2L, 12L), (3L, 10L), (4L, 11L)))
  }

  test("concurrency matches brute-force inclusive-overlap counting") {
    // intervals with heavy overlap and boundary ties (end == next start)
    val iv = Seq(
      (1L, 0L, 10L), (2L, 5L, 15L), (3L, 10L, 20L), (4L, 10L, 10L),
      (5L, 21L, 30L), (6L, 25L, 26L), (7L, 26L, 40L), (8L, 50L, 60L))
      .toDF("iid", "s", "e")
    val got = Sweep.concurrency(iv, "s", "e", "iid")
      .select("iid", "concurrent").as[(Long, Long)].collect().toMap
    // brute force: intervals j open at i's start instant ([s,e] inclusive)
    val rows = Seq(
      (1L, 0L, 10L), (2L, 5L, 15L), (3L, 10L, 20L), (4L, 10L, 10L),
      (5L, 21L, 30L), (6L, 25L, 26L), (7L, 26L, 40L), (8L, 50L, 60L))
    // open at i's start = started strictly earlier and not yet ended
    // (inclusive end: -1 sorts after +1 at equal t), plus simultaneous
    // starts processed up to and including i in key order
    val want = rows.map { case (i, s, _) =>
      i -> rows.count { case (j, s2, e2) =>
        (s2 < s && e2 >= s) || (s2 == s && j <= i)
      }.toLong
    }.toMap
    assert(got === want)
  }

  test("runningSum rejects null deltas and reserved column names loudly") {
    val withNull = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "m")
    val ex = intercept[Exception] {
      Sweep.runningSum(withNull, col("m"), "run", col("k")).collect()
    }
    assert(ex.getMessage.contains("coalesce nullable measures"))
    // coalescing at the call site (the documented contract) works
    val ok = Sweep.runningSum(withNull, coalesce(col("m"), lit(0L)), "run", col("k"))
      .select("k", "run").as[(Long, Long)].collect().toMap
    assert(ok === Map(1L -> 2L, 2L -> 2L, 3L -> 7L))
    // reserved internal name is guarded like AsOfJoin's __k/__t/__side
    val clash = Seq((1L, 1L)).toDF("k", "__delta")
    val ex2 = intercept[IllegalArgumentException] {
      Sweep.runningSum(clash, lit(1L), "run", col("k"))
    }
    assert(ex2.getMessage.contains("__delta"))
  }

  test("concurrency on disjoint intervals is all ones") {
    val iv = (0L until 100L).map(i => (i, i * 10, i * 10 + 5)).toDF("iid", "s", "e")
    val got = Sweep.concurrency(iv, "s", "e", "iid")
      .select("concurrent").as[Long].collect()
    assert(got.forall(_ == 1L))
  }
}

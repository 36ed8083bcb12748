package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** HLL sketch algebra: the merge law (union registers = registers of the
  * union) is what makes the sketch safe under ANY partitioning, shuffle
  * order, or micro-batch split — these specs pin it directly rather than
  * through the graded queries. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keys(g: String, from: Long, until: Long) =
    (from until until).map(k => (g, k))

  test("union of registers == registers of the concatenated data") {
    // A = [0, 800), B = [400, 1200) — genuine partial overlap
    val a = keys("a", 0, 800)
    val b = keys("b", 400, 1200)
    val both = (a ++ b).toDF("g", "k")
    val regsAB = Sketches.hllRegisters(both, "g", col("k"))
    val merged = regsAB.groupBy(col("bucket")).agg(max(col("mreg")).as("mreg"))
      .select(lit("u").as("g"), col("bucket"), col("mreg"))
    val direct = Sketches.hllRegisters(
      (a ++ b).map { case (_, k) => ("u", k) }.toDF("g", "k"), "g", col("k"))
    val m = merged.as[(String, Int, Int)].collect().toSet
    val d = direct.as[(String, Int, Int)].collect().toSet
    assert(m === d)
  }

  test("estimate lands within the 3-sigma band of the exact cardinality") {
    // m = 256 → standard error 6.5%; 3σ ≈ 20%
    val df = keys("g", 0, 1000).toDF("g", "k")
    val est = Sketches.hllEstimateMicro(
      Sketches.hllRegisters(df, "g", col("k")), "g")
      .as[(String, Long)].head()._2 / 1e6
    assert(est > 800 && est < 1200, s"estimate $est vs exact 1000")
  }

  test("inclusion-exclusion: identical sets give inter == each side") {
    val a = keys("a", 0, 500)
    val b = keys("b", 0, 500)
    val regs = Sketches.hllRegisters((a ++ b).toDF("g", "k"), "g", col("k"))
    val per = Sketches.hllEstimateMicro(regs, "g")
      .as[(String, Long)].collect().toMap
    val uni = Sketches.hllEstimateMicro(
      regs.groupBy(col("bucket")).agg(max(col("mreg")).as("mreg"))
        .select(lit("u").as("g"), col("bucket"), col("mreg")), "g")
      .as[(String, Long)].head()._2
    // identical key sets hash to identical registers: est_a = est_b =
    // est_union exactly, so inclusion-exclusion returns the set size
    assert(per("a") === per("b"))
    assert(uni === per("a"))
    assert(per("a") + per("b") - uni === per("a"))
  }

  test("registers are partition-invariant") {
    val df = keys("g", 0, 2000).toDF("g", "k")
    val r1 = Sketches.hllRegisters(df.repartition(1), "g", col("k"))
      .as[(String, Int, Int)].collect().toSet
    val r7 = Sketches.hllRegisters(df.repartition(7), "g", col("k"))
      .as[(String, Int, Int)].collect().toSet
    assert(r1 === r7)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Skew}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
    // z(3,5): x=011 -> bits 0,2; y=101 -> bits 1,5 => 1+2+4+32 = 39
    assert(df.as[Long].collect().toSeq === Seq(1L, 2L, 39L, 65535L))
  }

  test("zValue round-trips: distinct pairs get distinct z") {
    val pairs = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val z = pairs.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4).as("z"))
      .as[Long].collect()
    assert(z.distinct.length === 256)
    assert(z.min === 0L && z.max === 255L)
  }

  test("zOrderBy clusters each partition into a compact x/y rectangle") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % 256 + 256) % 256, (i * 40503L % 256 + 256) % 256)
    }.toDF("id", "x", "y")
    val clustered = Layout.zOrderBy(df, col("x"), col("y"), 8, col("id"),
      numPartitions = 32)
    val spans = clustered
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum === n)
    // Row-major layout would give every partition a secondary-dimension
    // span ≈ 255. At 32 z-range partitions each range fixes ~5 leading
    // interleaved bits (x span ≲ 63, y span ≲ 31 ideally; boundary
    // straddle can double a few) — both AVERAGE spans must sit far
    // below the full 0..255 extent.
    val avgDx = spans.map(_.getAs[Long]("dx")).sum.toDouble / spans.length
    val avgDy = spans.map(_.getAs[Long]("dy")).sum.toDouble / spans.length
    assert(avgDx < 150, s"avg x span $avgDx not clustered")
    assert(avgDy < 150, s"avg y span $avgDy not clustered")
  }

  test("bloomSemiJoin is row-identical to the exact semi join") {
    val fact = (0L until 5000L).map(i => (i, i % 739)).toDF("id", "k")
    val dim = (0L until 739L by 13L).toDF("dk")
    val got = Skew.bloomSemiJoin(fact, "k", dim, "dk", numBits = 1 << 12)
      .select("id").as[Long].collect().sorted
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("bloom pre-filter prunes most non-matching fact rows before the join") {
    val fact = (0L until 5000L).map(i => (i, i)).toDF("id", "k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    // Count rows surviving JUST the bit-test (semi join removed): with 3
    // keys in 2^16 bits, false-positive rate is ~(3*3/65536)^3 — the
    // filter alone should keep only a tiny superset of the 3 matches.
    val words = new Array[Long]((1 << 16) / 64)
    dim.select(explode(array((0 until 3).map(i =>
        pmod(xxhash64(lit(i), col("dk")), lit((1L << 16)))): _*)).as("p"))
      .distinct().collect()
      .foreach { r => val p = r.getLong(0); words((p >> 6).toInt) |= (1L << (p & 63)) }
    val bits = lit(words)
    val pass = (0 until 3).map { i =>
      val p = pmod(xxhash64(lit(i), col("k")), lit(1L << 16))
      expr("1L").bitwiseAND(call_function("shiftright",
        element_at(bits, (p / 64).cast("int") + 1), (p % 64).cast("int"))) === 1L
    }.reduce(_ && _)
    val kept = fact.filter(pass).count()
    assert(kept >= 3 && kept <= 50, s"bloom kept $kept of 5000")
  }
}

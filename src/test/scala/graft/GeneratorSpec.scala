package graft

import graft.sources.RecordGenerator

/** Generator domain conformance against the reference spec
  * (`/root/reference/internal/data/generator.go:9-13,22-58`). */
class GeneratorSpec extends SparkSpec {

  private lazy val rows = RecordGenerator.records(spark, 500, seed = 42).collect()

  test("id is uniform over [0, 2^31) — non-negative int32") {
    assert(rows.forall(r => r.getAs[Int]("id") >= 0))
  }

  test("name: 10-15 chars, [A-Za-z] only") {
    assert(rows.forall { r =>
      val n = r.getAs[String]("name")
      n.length >= 10 && n.length <= 15 && n.forall(c => c.isLetter && c <= 'z')
    })
  }

  test("address: 15-20 chars, [A-Za-z0-9 ] only — never a comma") {
    assert(rows.forall { r =>
      val a = r.getAs[String]("address")
      a.length >= 15 && a.length <= 20 &&
        a.forall(c => c.isLetterOrDigit || c == ' ')
    })
  }

  test("continent drawn from the 6-value enum") {
    val enums = RecordGenerator.Continents.toSet
    assert(rows.forall(r => enums.contains(r.getAs[String]("continent"))))
    // and all 6 values appear in 500 draws
    assert(rows.map(_.getAs[String]("continent")).toSet === enums)
  }

  test("generation is deterministic: same seed => identical records") {
    val again = RecordGenerator.records(spark, 500, seed = 42).collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
    val other = RecordGenerator.records(spark, 500, seed = 43).collect()
    assert(!rows.map(_.toSeq).sameElements(other.map(_.toSeq)))
  }

  test("csvLines: 4 comma-separated fields per line") {
    val lines = RecordGenerator.csvLines(spark, 100).collect()
    assert(lines.forall(_.getAs[String]("line").split(",", -1).length === 4))
  }

  test("recordsFast (volume generator) honors the same domains") {
    val rows = RecordGenerator.recordsFast(spark, 500, seed = 42).collect()
    val enums = RecordGenerator.Continents.toSet
    assert(rows.forall { r =>
      val n = r.getAs[String]("name")
      val a = r.getAs[String]("address")
      r.getAs[Int]("id") >= 0 &&
        n.length >= 10 && n.length <= 15 && n.forall(_.isLetter) &&
        a.length >= 15 && a.length <= 20 &&
        a.forall(c => c.isLetterOrDigit || c == ' ') &&
        enums.contains(r.getAs[String]("continent"))
    })
    // deterministic
    val again = RecordGenerator.recordsFast(spark, 500, seed = 42).collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }

  test("approx distinct stays within 5% of exact on the events fixture") {
    import org.apache.spark.sql.functions._
    val got = graft.sources.Tables.events(spark, sf("sf0.01"))
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect().head
    val (a, e) = (got.getAs[Long]("a").toDouble, got.getAs[Long]("e").toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.CsvCodec
import graft.operators.Sorting

/** ScalaCheck properties for the CSV codec + sort core (SURVEY.md §5.2):
  * arbitrary comma-free fields round-trip; sorting any record multiset is
  * monotone, conserves the multiset, and is idempotent. */
object CsvCodecProps extends Properties("CsvCodec") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val fieldGen: Gen[String] =
    Gen.chooseNum(0, 20).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ ' ')))

  private val recordGen: Gen[(Long, String)] =
    for { id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2); s <- fieldGen }
      yield (id, s)

  property("encode/decode round-trips ids (incl. negative) and payload") =
    Prop.forAll(Gen.listOfN(30, recordGen)) { recs =>
      recs.isEmpty || {
        val df = recs.toDF("id", "payload")
        val lines = df.select(CsvCodec.encode(col("id"), col("payload")).as("line"))
        val back = CsvCodec.decode(lines, col("line"),
          Seq("id" -> LongType, "payload" -> StringType))
          .select("id", "payload").as[(Long, String)].collect()
        back.sorted.sameElements(recs.sorted)
      }
    }

  property("totalSort is monotone, conserves the multiset, and is idempotent") =
    Prop.forAll(Gen.listOfN(50, recordGen)) { recs =>
      recs.isEmpty || {
        val df = recs.toDF("id", "payload")
        val once = Sorting.totalSort(df, col("id"), col("payload"))
          .as[(Long, String)].collect()
        val twice = Sorting.totalSort(
          Sorting.totalSort(df, col("id"), col("payload")),
          col("id"), col("payload")).as[(Long, String)].collect()
        once.map(_._1).sameElements(once.map(_._1).sorted) &&
          once.sorted.sameElements(recs.sorted) &&
          once.sameElements(twice)
      }
    }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ScalaCheck properties for the dedup operators over arbitrary corpora:
  * exact dedup is idempotent and survivor-minimal; minhash estimates are
  * bounded; simhash of a doc is permutation-sensitive but
  * duplication-stable. */
object DedupProps extends Properties("Dedup") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] =
    Gen.oneOf("sort", "merge", "spark", "table", "scan", "join", "key",
      "row", "hash", "batch", "stream", "window", "order", "dup")

  private val doc: Gen[String] =
    Gen.chooseNum(5, 20).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private val corpus: Gen[List[(Long, String)]] =
    Gen.chooseNum(2, 15).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (d, i) => (i.toLong, d) })

  property("exact dedup keeps min id per text and is idempotent") =
    Prop.forAll(corpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val once = Dedup.exact(df, "doc_id", Seq("text"))
      val got = once.as[(String, Long)].collect().toMap
      val expected = docs.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
      val twice = Dedup.exact(once.select(col("doc_id"), col("text")), "doc_id", Seq("text"))
      got == expected && twice.count() == once.count()
    }

  property("minhash estimates are in [0,1] and 1.0 for exact duplicate docs") =
    Prop.forAll(doc) { d =>
      val df = Seq((1L, d), (2L, d), (3L, d + " extra tail words here now"))
        .toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(df, "doc_id", "text", minEstimate = 0.0)
        .as[(Long, Long, Double)].collect()
      val dupPair = pairs.find(p => p._1 == 1L && p._2 == 2L)
      pairs.forall(p => p._3 >= 0.0 && p._3 <= 1.0) &&
        (d.split("\\s+").length < 3 || dupPair.exists(_._3 == 1.0))
    }

  property("simhash is invariant to doc duplication and bounded to 32 bits") =
    Prop.forAll(doc) { d =>
      val df = Seq((1L, d), (2L, d)).toDF("doc_id", "text")
      val sh = Dedup.simhash(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      sh(1L) == sh(2L) && sh(1L) >= 0L && sh(1L) < (1L << 32)
    }
}

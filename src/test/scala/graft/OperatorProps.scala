package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, Upsert}

/** ScalaCheck properties for the round-4 operators: chunking
  * reconstructs the document, heavy hitters are exact against brute
  * force for arbitrary streams, and upsert is idempotent with
  * last-writer-wins semantics. */
object OperatorProps extends Properties("Operators") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")

  property("chunkTokens: de-overlapped chunks reconstruct the word sequence") =
    Prop.forAll(Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n, word))) { ws =>
      val df = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val chunkSize = 8
      val overlap = 3
      val chunks = TextAnalysis.chunkTokens(df, "doc_id", "text", chunkSize, overlap)
        .orderBy("chunk_idx")
        .select("chunk_text").as[String].collect()
      // chunk 0 in full, then each later chunk minus its leading overlap,
      // concatenated, must equal the original word sequence
      val rebuilt = chunks.toList match {
        case head :: tail =>
          head.split(" ").toList ++ tail.flatMap(_.split(" ").drop(overlap))
        case Nil => Nil
      }
      rebuilt == ws
    }

  property("heavyHitters is exact vs brute force for arbitrary streams") =
    Prop.forAll(Gen.chooseNum(10, 300).flatMap(n => Gen.listOfN(n, word))) { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text").repartition(3)
      val supportDenom = 8
      val got = TextAnalysis.heavyHitters(df, "doc_id", "text",
          supportDenom = supportDenom, capacity = 12)
        .select("word", "n_occurrences").as[(String, Long)].collect().toMap
      val n = ws.length
      val want = ws.groupBy(identity).view.mapValues(_.length.toLong)
        .filter { case (_, c) => c * supportDenom >= n }.toMap
      got == want
    }

  private val table: Gen[List[(Long, String)]] =
    Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 12L), Gen.oneOf("a", "b", "c"))))
      .map(_.distinctBy(_._1))

  property("Upsert: last-writer-wins, idempotent, key-complete") =
    Prop.forAll(table, table) { (base, delta) =>
      val b = base.toDF("k", "v")
      val d = delta.toDF("k", "v")
      val once = Upsert(b, d, "k").as[(Long, String)].collect().toMap
      val expected = base.toMap ++ delta.toMap
      val twice = Upsert(Upsert(b, d, "k"), d, "k")
        .as[(Long, String)].collect().toMap
      once == expected && twice == expected
    }

  private val changelog: Gen[List[(Long, Long, String, String)]] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(1L, 50L),
        Gen.oneOf("U", "D"), Gen.oneOf("a", "b", "c"))))
      .map(_.distinctBy(t => (t._1, t._2)))

  property("Upsert.cdcApply equals a sequential per-key replay of the log") =
    Prop.forAll(table, changelog) { (base, log) =>
      val b = base.toDF("k", "v")
      val l = log.toDF("k", "seq", "op", "v")
      val got = Upsert.cdcApply(b, l, "k").as[(Long, String)].collect().toMap
      // brute-force replay: apply every change in seq order; with full
      // (non-null) values each U overwrites and each D deletes, so the
      // end state must equal latest-change-wins
      val expected = log.sortBy(_._2).foldLeft(base.toMap) {
        case (st, (k, _, "D", _)) => st - k
        case (st, (k, _, _, v))   => st + (k -> v)
      }
      got == expected
    }

  property("Upsert.scd2: current rows = v2 snapshot; every key's history is closed correctly") =
    Prop.forAll(table, table) { (s1, s2) =>
      val h = Upsert.scd2(s1.toDF("k", "v"), s2.toDF("k", "v"), "k")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toList
      val current = h.collect { case (k, v, _, _, true) => k -> v }.toMap
      val v1Era = h.filter(_._3 == 1L)
      val open = h.filter(_._4.isEmpty)
      // current rows reconstruct v2 exactly; every v1 key has a v1-era
      // row; open (valid_to null) rows are precisely the current ones;
      // (key, valid_from) is unique — at most one row per key per era
      current == s2.toMap &&
        v1Era.map(_._1).toSet == s1.map(_._1).toSet &&
        open.map(t => (t._1, t._2)).sorted ==
          h.filter(_._5).map(t => (t._1, t._2)).sorted &&
        h.map(t => (t._1, t._3)).distinct.size == h.size
    }

  property("Sweep.runningSum equals scanLeft for arbitrary deltas and partitioning") =
    Prop.forAll(
      Gen.chooseNum(1, 300).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-50L, 50L))),
      Gen.chooseNum(1, 17)) { (deltas, parts) =>
      val df = deltas.zipWithIndex
        .map { case (d, i) => (i.toLong, d) }.toDF("k", "delta")
        .repartition(parts) // result must be placement-independent
      val got = graft.operators.Sweep
        .runningSum(df, col("delta"), "run", col("k"))
        .select("k", "run").as[(Long, Long)].collect()
        .sortBy(_._1).map(_._2).toList
      val want = deltas.scanLeft(0L)(_ + _).drop(1)
      got == want
    }
}

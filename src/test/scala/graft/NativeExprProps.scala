package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.{MinhashSignature, ShingleHashes, SimHash32, TopElementCount}

/** ScalaCheck properties pinning the native codegen text-hash
  * expressions against an INDEPENDENT pure-JVM reference (MessageDigest
  * md5 over the same word streams) — unlike NativeExprSpec's parity
  * tests, this does not route the expected value through Spark's
  * interpreted HOFs, so a shared bug cannot hide. Words include
  * non-ASCII to exercise the UTF-8 encode path. */
object NativeExprProps extends Properties("NativeExpr") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word: Gen[String] =
    Gen.oneOf("sort", "merge", "spark", "öäü", "日本語", "naïve",
      "batch", "stream", "Ω", "café", "dup", "x1")

  private val wordsGen: Gen[List[String]] =
    Gen.chooseNum(3, 24).flatMap(n => Gen.listOfN(n, word))

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def h48(s: String): Long = {
    val d = md5(s)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  private def refShingles(ws: List[String]): List[String] =
    ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toList

  property("TopElementCount = max groupBy-count of the words") =
    Prop.forAll(wordsGen) { ws =>
      val expected = ws.groupBy(identity).values.map(_.size.toLong).max
      val got = List(ws).toDF("w")
        .select(TopElementCount(col("w")).as("c")).as[Long].head()
      got == expected
    }

  property("ShingleHashes = sorted distinct 48-bit md5 of the word 3-grams") =
    Prop.forAll(wordsGen) { ws =>
      val expected = refShingles(ws).map(h48).distinct.sorted
      val got = List(ws).toDF("w")
        .select(ShingleHashes(col("w")).as("hs"))
        .as[Seq[Long]].head().toList
      got == expected
    }

  property("MinhashSignature = per-seed min of the universal hashes over the shingles") =
    Prop.forAll(wordsGen) { ws =>
      val hs = refShingles(ws).map(h48)
      val expected = (0 until 16).map { s =>
        hs.map(h => ((2L * s + 1) * h + (1000003L * s + 12345L)) %
          MinhashSignature.M61).min
      }.toList
      val got = List(ws).toDF("w")
        .select(MinhashSignature(col("w"), 16).as("sig"))
        .as[Seq[Long]].head().toList
      got == expected
    }

  property("WinnowedHashes = sorted distinct per-window minima; shift-robust") =
    Prop.forAll(wordsGen) { ws =>
      val hs = refShingles(ws).map(h48)
      val nWindows = math.max(1, hs.length - 3)
      val expected = (0 until nWindows)
        .map(j => hs.slice(j, math.min(j + 4, hs.length)).min)
        .distinct.sorted.toList
      val got = List(ws).toDF("w")
        .select(graft.plans.WinnowedHashes(col("w")).as("fp"))
        .as[Seq[Long]].head().toList
      // shift-robustness: prepending words must preserve at least one
      // fingerprint when the doc has >= window+gram-1 = 6 words
      val shifted = List("pre1" :: "pre2" :: ws).toDF("w")
        .select(graft.plans.WinnowedHashes(col("w")).as("fp"))
        .as[Seq[Long]].head().toSet
      got == expected &&
        (ws.length < 6 || got.toSet.intersect(shifted).nonEmpty)
    }

  /** Independent reference BPE segmenter: repeatedly merge the
    * lowest-rank adjacent pair (leftmost-first, all non-overlapping
    * occurrences) — plain Scala lists, no shared code with the
    * expression's hash-map/ArrayList hot loop. */
  private def refBpe(word: String, merges: List[(String, String)]): List[String] = {
    // first occurrence wins, like BpeEncode.buildRanks' putIfAbsent
    val rank = merges.zipWithIndex.reverse.toMap
    var syms = word.map(_.toString).toList
    var done = syms.length < 2
    while (!done) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) done = true
      else {
        val (_, best) = present.minBy(_._1)
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: t if (a, b) == best => out += (a + b); rest = t
          case a :: t => out += a; rest = t
          case Nil => ()
        }
        syms = out.toList
        done = syms.length < 2
      }
    }
    syms
  }

  private val bpeWord: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "é")).map(_.mkString))

  private val mergesGen: Gen[List[(String, String)]] = {
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "abc", "é")
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, Gen.zip(sym, sym)))
  }

  property("BpeEncode = reference greedy rank-priority segmenter; concat invariant") =
    Prop.forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, bpeWord)), mergesGen) {
      (ws0, merges) =>
        val ws = ws0.filter(_.nonEmpty)
        val expected = ws.flatMap(w => refBpe(w, merges))
        val got = List(ws).toDF("w")
          .select(graft.plans.BpeEncode(col("w"), merges).as("t"))
          .as[Seq[String]].head().toList
        got == expected && got.mkString("") == ws.mkString("")
    }

  property("SimHash32 = sign-of-votes over the 32-bit token hashes") =
    Prop.forAll(wordsGen) { ws =>
      val votes = new Array[Int](32)
      ws.foreach { w =>
        val d = md5(w)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        (0 until 32).foreach(j => if (((h >>> j) & 1L) == 1L) votes(j) += 1
          else votes(j) -= 1)
      }
      val expected = (0 until 32).map(j =>
        if (votes(j) > 0) 1L << j else 0L).sum
      val got = List(ws).toDF("w")
        .select(SimHash32(col("w")).as("sh")).as[Long].head()
      got == expected
    }
}

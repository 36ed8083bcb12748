package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001")).cache()

  test("sample: membership is a pure function of the key — repartition-proof") {
    val a = Sampling.sample(docs, "doc_id", permille = 200)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.sample(docs.repartition(13), "doc_id", permille = 200)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("sample: monotone in the rate — a smaller sample is a subset of a larger one") {
    val small = Sampling.sample(docs, "doc_id", 100).select("doc_id").as[Long].collect().toSet
    val big = Sampling.sample(docs, "doc_id", 500).select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("weightedSample: per-row threshold — 0 keeps nothing, 1000 keeps all, monotone") {
    val df = (1L to 500L).toDF("k")
    assert(Sampling.weightedSample(df, "k", lit(0)).count() === 0L)
    assert(Sampling.weightedSample(df, "k", lit(1000)).count() === 500L)
    val lo = Sampling.weightedSample(df, "k", lit(200)).as[Long].collect().toSet
    val hi = Sampling.weightedSample(df, "k", lit(600)).as[Long].collect().toSet
    assert(lo.subsetOf(hi)) // same hash, higher threshold -> superset
    assert(hi.size > lo.size)
  }

  test("temperatureMixRates: smallest source keeps everything, rates flatten the skew") {
    val docs = ((1 to 900).map(i => (i.toLong, "big", 10L)) ++
      (901 to 1000).map(i => (i.toLong, "small", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    val rates = Sampling.temperatureMixRates(docs, "source", "n_tokens")
      .select("source", "rate_ppm").as[(String, Long)].collect().toMap
    assert(rates("small") === 1000000L) // min source: rate exactly 1
    // big has 9x the tokens -> keep-rate sqrt(1/9) = 1/3 in ppm
    assert(rates("big") === math.round(math.sqrt(1.0 / 9) * 1000000))
  }

  test("quotaSample: exactly k per stratum (or all when smaller), deterministic") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "tiny"))).toDF("k", "s")
    val got = Sampling.quotaSample(df, "k", "s", k = 10)
      .as[(Long, String)].collect()
    assert(got.count(_._2 == "big") === 10)
    assert(got.count(_._2 == "tiny") === 3) // smaller stratum kept whole
    val again = Sampling.quotaSample(df.repartition(7), "k", "s", k = 10)
      .as[(Long, String)].collect()
    assert(got.sorted.sameElements(again.sorted)) // layout-proof
  }

  test("interleaveBySource: every prefix is balanced across sources") {
    val df = ((1 to 30).map(i => (i.toLong, "a")) ++
      (31 to 60).map(i => (i.toLong, "b")) ++
      (61 to 90).map(i => (i.toLong, "c"))).toDF("k", "s")
    val order = Sampling.interleaveBySource(df, "k", "s")
      .select("s").as[String].collect()
    // any prefix of length 3n contains exactly n of each source
    Seq(3, 30, 60, 90).foreach { n =>
      val prefix = order.take(n)
      assert(prefix.count(_ == "a") === n / 3)
      assert(prefix.count(_ == "b") === n / 3)
      assert(prefix.count(_ == "c") === n / 3)
    }
  }

  test("splitAssign: total, disjoint, and leak-proof across reruns") {
    val s1 = Sampling.splitAssign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = Sampling.splitAssign(docs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2, "assignment must not depend on layout")
    assert(s1.size === docs.count(), "every doc gets exactly one split")
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("packTokens: bins respect the budget up to one straddling doc, contiguous when docs fit") {
    val budget = 500L
    // the SAME tokenizer the graded data_pack query uses
    val withTokens = docs.withColumn("n_tokens",
      size(graft.functions.TextFunctions.words(col("text"))))
    val packed = Sampling.packTokens(withTokens, "doc_id", "n_tokens",
      budget, numBuckets = 4)
    val bins = packed.groupBy(col("bucket"), col("bin"))
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("n"))
      .collect().map(r => ((r.getAs[Long]("bucket"), r.getAs[Long]("bin")),
        r.getAs[Long]("tok")))
    val maxDoc = withTokens.agg(max(col("n_tokens"))).first().getInt(0)
    assert(maxDoc <= budget, "fixture precondition for the contiguity half of this test")
    assert(bins.nonEmpty)
    assert(bins.forall { case (_, tok) => tok < budget + maxDoc },
      "a bin overfills by at most one straddling document")
    // with every doc within budget, bins are contiguous 0..max per bucket
    bins.groupBy(_._1._1).foreach { case (_, bs) =>
      val ids = bs.map(_._1._2).sorted
      assert(ids.sameElements(ids.indices.map(_.toLong)), s"non-contiguous bins: $ids")
    }
    // total conservation: every doc lands in exactly one bin
    assert(packed.count() === docs.count())
  }

  test("packTokens: a document larger than the budget skips bin ids (budget offsets, not dense ranks)") {
    val df = Seq((1L, 1200L), (2L, 100L), (3L, 100L))
      .toDF("doc_id", "n_tokens")
    val packed = Sampling.packTokens(df, "doc_id", "n_tokens",
        budget = 500L, numBuckets = 1)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // order within the single bucket is md5-determined; whatever doc
    // follows the 1200-token one jumps past bins 1 and 2
    val afterBig = packed.values.toSeq.sorted
    assert(afterBig.head === 0L)
    assert(afterBig.max >= 2L, s"oversized doc must advance bins by its full size: $packed")
  }

  test("epochExpand: zero drops, fractions downsample, integers copy exactly, ordinals dense") {
    val df = (0L until 100L).flatMap(i =>
      Seq((i, "zero"), (i, "half"), (i, "two"), (i, "twoq")))
      .toDF("doc_id", "source")
    val got = Sampling.epochExpand(df, "doc_id", "source",
        Map("zero" -> 0.0, "half" -> 0.5, "two" -> 2.0, "twoq" -> 2.25))
      .groupBy("source", "doc_id").agg(collect_list("epoch").as("es"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getSeq[Long](2).sorted))
    val bySource = got.groupBy(_._1)
    assert(!bySource.contains("zero"), "epochs=0 drops the source")
    val halves = bySource("half")
    assert(halves.length > 20 && halves.length < 80, s"~half kept: ${halves.length}")
    assert(halves.forall(_._3 == Seq(0L)))
    assert(bySource("two").length === 100)
    assert(bySource("two").forall(_._3 == Seq(0L, 1L)), "exactly two dense copies")
    val twoq = bySource("twoq")
    assert(twoq.length === 100)
    val withExtra = twoq.count(_._3 == Seq(0L, 1L, 2L))
    assert(twoq.forall(t => t._3 == Seq(0L, 1L) || t._3 == Seq(0L, 1L, 2L)))
    assert(withExtra > 5 && withExtra < 60, s"~quarter get a third copy: $withExtra")
    // the fractional pick hashes only the id, so the 0.25-extra ids
    // (h < 250) are a subset of the 0.5-kept ids (h < 500)
    assert(twoq.filter(_._3.length == 3).map(_._2).toSet
      .subsetOf(halves.map(_._2).toSet))
  }

  test("epochShuffle: same seed reproduces the order; different seed permutes; set preserved") {
    val o1 = Sampling.epochShuffle(docs, "doc_id", seed = 1L)
      .select("doc_id").as[Long].collect()
    val o1again = Sampling.epochShuffle(docs.repartition(9), "doc_id", seed = 1L)
      .select("doc_id").as[Long].collect()
    val o2 = Sampling.epochShuffle(docs, "doc_id", seed = 2L)
      .select("doc_id").as[Long].collect()
    assert(o1.sameElements(o1again), "same seed => identical order on any layout")
    assert(!o1.sameElements(o2), "different seed => different permutation")
    assert(o1.toSet === o2.toSet, "a shuffle permutes, never drops or duplicates")
    assert(!o1.sameElements(o1.sorted), "order must not be the natural key order")
  }

  test("hamiltonAllocation: conserves the budget exactly; rejects non-positive weights loudly") {
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("source", "weight")
    val got = Sampling.hamiltonAllocation(w, budget = 7L)
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect()
    // floor quotas 3/2/1 sum to 6; the one leftover goes to the largest
    // remainder (a: 35%10=5, b: 21%10=1, c: 14%10=4 → a wins)
    assert(got.map(_._5).sum === 7L, "largest-remainder must conserve the budget")
    assert(got.toSeq.map(r => r._1 -> r._5) === Seq("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // the weights>0 contract is enforced, not just documented: a zero
    // weight (total still positive) used to flow into a silent div
    // result; now the weave fails the job with the named contract
    val zero = Seq(("a", 5L), ("b", 0L)).toDF("source", "weight")
    val ez = intercept[Throwable] {
      Sampling.hamiltonAllocation(zero, budget = 3L).collect()
    }
    assert(ez.getMessage.contains("weight must be > 0"),
      s"zero weight must name the contract, got: ${ez.getMessage}")
    val neg = Seq(("a", 5L), ("b", -2L)).toDF("source", "weight")
    val en = intercept[Throwable] {
      Sampling.hamiltonAllocation(neg, budget = 3L).collect()
    }
    assert(en.getMessage.contains("weight must be > 0"))
  }
}

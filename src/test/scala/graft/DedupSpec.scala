package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf("sf0.001")).cache()

  test("exact dedup keeps the min id per duplicate key") {
    val df = Seq((5L, "x"), (2L, "x"), (9L, "y")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", Seq("text"))
      .orderBy("doc_id").collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(got.toSeq === Seq((2L, "x"), (9L, "y")))
  }

  test("exactSurvivors keeps the FULL min-id row per duplicate key") {
    val df = Seq((5L, "x", "keep5"), (2L, "x", "keep2"), (9L, "y", "keep9"))
      .toDF("doc_id", "text", "extra")
    val got = Dedup.exactSurvivors(df, "doc_id", Seq("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("extra")))
    assert(got.toSeq === Seq((2L, "keep2"), (9L, "keep9")),
      "survivor rows carry every input column")
  }

  test("exactSurvivors: byte-identical re-ingested rows collapse to ONE survivor") {
    val df = Seq((2L, "x", "v"), (2L, "x", "v"), (5L, "x", "other"), (9L, "y", "z"))
      .toDF("doc_id", "text", "extra")
    val got = Dedup.exactSurvivors(df, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(2L, 9L), "one survivor per key, duplicates collapsed")
  }

  test("fingerprint dedup collapses case/whitespace variants") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.byFingerprint(df, "doc_id", "text")
    assert(got.count() === 2)
    assert(got.filter(col("n_dups") === 2).select("doc_id").as[Long].head() === 1L)
  }

  test("data_contrastive: negatives never collide with their anchor or positive") {
    val df = graft.queries.TrainingDataQueries.queries("data_contrastive")(
      spark, sf("sf0.001"))
    val rows = df.collect()
    assert(rows.nonEmpty, "fixture minhash pairs must yield contrastive rows")
    assert(rows.forall { r =>
      val n = r.getAs[Long]("neg_id")
      n != r.getAs[Long]("anchor") && n != r.getAs[Long]("positive")
    })
    // exactly 3 negatives per (anchor, positive) pair
    assert(rows.groupBy(r => (r.getAs[Long]("anchor"), r.getAs[Long]("positive")))
      .forall(_._2.length == 3))
  }

  test("canonicalizeUrl normalizes case, www, :80, tracking params, fragments, slashes") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/Docs/3/?id=3&utm_source=feed#frag",
      "http://example.com/docs/3?utm_medium=email&id=3",
      "http://example.com/docs/3?id=3",
      "https://example.com/a/?utm_campaign=x",
      "https://example.com/a/",
      "https://example.com/b?ref=hn&q=1",
      "https://example.com/b?q=1&fbclid=abc")
    val got = urls.toDF("url").select(Dedup.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    assert(got(0) === "http://example.com/docs/3?id=3")
    assert(got(1) === "http://example.com/docs/3?id=3")
    assert(got(2) === "http://example.com/docs/3?id=3")
    assert(got(3) === "https://example.com/a")
    assert(got(4) === "https://example.com/a")
    assert(got(5) === "https://example.com/b?q=1")
    assert(got(6) === "https://example.com/b?q=1")
  }

  test("urlDedup keeps one min-id survivor per canonical url with counts") {
    val df = Seq(
      (7L, "http://www.example.com/x/"), (3L, "HTTP://example.com/x"),
      (9L, "https://example.com/y?utm_source=a"), (4L, "https://example.com/y")
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedup(df, "doc_id", "url")
      .orderBy("url_canon")
      .collect().map(r => (r.getAs[String]("url_canon"),
        r.getAs[Long]("survivor_id"), r.getAs[Long]("n_dups")))
    assert(got.toSeq === Seq(
      ("http://example.com/x", 3L, 2L), ("https://example.com/y", 4L, 2L)))
  }

  test("minhash LSH finds every identical-signature pair and estimates match exact jaccard") {
    val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text", minJaccard = 0.0)
      .filter(col("jaccard") >= 0.999)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", minEstimate = 0.5)
    val mhPairs = mh.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(mhPairs),
      s"jaccard=1.0 pairs must always collide in every band: missing ${exact -- mhPairs}")
  }

  test("simhash: identical token sequences get identical simhash") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val sh = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(3L))
  }

  test("simhashPairs reports hamming 0 for identical docs") {
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("shingle df cap drops boilerplate shingles from the join AND the denominator") {
    // 3 docs share one boilerplate shingle-source ("the quick brown fox");
    // docs 1 and 2 are otherwise identical, doc 3 unrelated. With
    // maxDocFreq=2 the df=3 boilerplate shingles vanish from the universe,
    // so (1,2) still scores 1.0 and (1,3)/(2,3) produce no pair at all.
    val df = Seq(
      (1L, "the quick brown fox alpha beta gamma delta"),
      (2L, "the quick brown fox alpha beta gamma delta"),
      (3L, "the quick brown fox omega psi chi phi")).toDF("doc_id", "text")
    val pairs = Dedup.shingleJaccardPairs(df, "doc_id", "text",
        minJaccard = 0.0, maxDocFreq = 2)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) === 1.0,
      "identical docs must still be jaccard 1.0 after the cap")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "docs overlapping ONLY in capped boilerplate shingles must not pair")
  }

  test("minhashBands rejects a numBands that does not divide numHashes") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 16)
    intercept[IllegalArgumentException] {
      Dedup.minhashBands(sig, numHashes = 16, numBands = 3)
    }
  }

  test("minhash signature is one array<bigint> row per doc") {
    val sig = Dedup.minhashSignatures(docs.limit(20), "doc_id", "text", numHashes = 16)
    val row = sig.head()
    assert(row.getAs[Seq[Long]]("sig").length === 16)
    assert(sig.count() === sig.select("doc").distinct().count())
  }

  test("containmentPairs flags a quoted document that symmetric Jaccard misses") {
    val core = (1 to 20).map(i => s"core$i").mkString(" ")
    val preamble = (1 to 15).map(i => s"pre$i").mkString(" ")
    val tail = (1 to 15).map(i => s"post$i").mkString(" ")
    val df = Seq(
      (1L, core),                             // the short original
      (2L, s"$preamble $core $tail"),         // quotes it inside a longer doc
      (3L, "entirely unrelated words about query optimizers and shuffles"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", minContainment = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cont.contains((1L, 2L)), s"quoted doc must be containment-flagged: $cont")
    assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
    val jac = Dedup.shingleJaccardPairs(df, "doc_id", "text", minJaccard = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)),
      "symmetric Jaccard at 0.8 misses the quote — that asymmetry is the point")
  }

  test("connected components: path + island resolve to min-id labels") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val got = labels.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    assert(rounds <= 4, s"tiny graph must converge fast, took $rounds")
  }

  test("connected components: 64-node chain converges in O(log n) rounds") {
    // worst-case diameter for naive propagation (63 rounds); pointer
    // jumping must crush it to ~log2
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    assert(labels.filter(col("component") === 1L).count() === 64,
      "all 64 chain nodes collapse into component 1")
    assert(rounds <= 14, s"pointer jumping must beat O(diameter): $rounds rounds")
  }

  test("connected components: reliable checkpointDir path matches localCheckpoint") {
    // the cluster-grade lineage cut (parquet round-trip in reliable
    // storage) must be a pure materialization swap: same components,
    // same convergence round count as the executor-resident default
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val (local, localRounds) = Dedup.connectedComponentsWithRounds(pairs)
    val (stored, storedRounds) = Dedup.connectedComponentsWithRounds(
      pairs, checkpointDir = Some(dir))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    assert(toMap(stored) === toMap(local))
    assert(storedRounds === localRounds)
    // the cuts really went through the reliable store
    val cuts = new java.io.File(dir).listFiles()
    assert(cuts != null && cuts.exists(_.getName.startsWith("cc_cut_")))
  }

  test("connected components: empty pair set returns empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("nearDupSurvivors keeps min-id per component plus all unpaired docs") {
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "never-paired"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupSurvivors(d, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 4L, 7L))
  }

  test("nearDupSurvivors over fixture minhash pairs drops exactly the losers") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", minEstimate = 0.5)
    val comps = Dedup.connectedComponents(pairs)
    val losers = comps.filter(col("node") =!= col("component")).count()
    val survivors = Dedup.nearDupSurvivors(docs, "doc_id", pairs).count()
    assert(losers > 0, "fixtures contain planted near-dups")
    assert(survivors === docs.count() - losers)
  }

  test("planted near-dups in the fixtures are found by all three near-dup paths") {
    val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text", minJaccard = 0.8).count()
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", minEstimate = 0.5).count()
    assert(exact > 0, "fixtures contain planted near-dups")
    assert(mh > 0)
  }

  test("nearDupSurvivorsBy keeps the highest-score member per component, min-id on ties") {
    val d = Seq(
      (1L, 0.2, "a"), (2L, 0.9, "a"), (3L, 0.9, "a"), // component {1,2,3}: 2 wins (0.9, tie -> min id)
      (7L, 0.5, "b"),                                 // unpaired: survives
      (8L, 0.1, "c"), (9L, 0.8, "c"))                 // component {8,9}: 9 wins
      .toDF("doc_id", "score", "grp")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupSurvivorsBy(d, "doc_id", "score", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(2L, 7L, 9L))
  }

  test("incremental matching pairs only delta-vs-corpus, never corpus-vs-corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // corpus-internal dup
      (3L, "completely unrelated text about spark shuffles and joins"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // dup of 1 and 2
      (11L, "fresh brand new document with novel content entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalMinhashMatches(delta, corpus, "doc_id", "text")
      .select("new_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L), (10L, 2L)),
      "delta doc matches each corpus dup; the corpus-internal (1,2) pair is NOT emitted")
  }

  test("incremental matching agrees with the batch pair operator on the fixtures") {
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = Dedup.incrementalMinhashMatches(newDocs, corpus, "doc_id", "text")
      .select("new_doc", "corpus_doc").as[(Long, Long)].collect()
      .map { case (n, c) => (math.min(n, c), math.max(n, c)) }.toSet
    val full = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      .filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
    assert(inc === full,
      "delta×corpus matches = the full pair set restricted to cross-slice pairs")
  }

  test("crossSplitContamination counts shared distinct shingles per eval doc") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon", "train"),
      (2L, "zeta eta theta iota kappa", "train"),
      // shares shingles [alpha beta gamma, beta gamma delta] with train 1
      (3L, "alpha beta gamma delta unrelated", "test"),
      (4L, "nothing in common here at all", "test"),
      (5L, "alpha beta gamma delta epsilon", "val")) // val must be ignored
      .toDF("doc_id", "text", "split")
    val got = Dedup.crossSplitContamination(df, "doc_id", "text", "split")
      .orderBy("doc").collect()
    assert(got.map(_.getAs[Long]("doc")).toSeq === Seq(3L, 4L))
    val d3 = got(0)
    assert(d3.getAs[Long]("n_shingles") === 3)
    assert(d3.getAs[Long]("n_shared") === 2)
    assert(d3.getAs[Double]("contamination") === 0.6667)
    assert(got(1).getAs[Long]("n_shared") === 0)
    assert(got(1).getAs[Double]("contamination") === 0.0)
  }

  test("editDistancePairs finds exactly the distance<=1 pairs (all edit kinds)") {
    val df = Seq(
      (1L, "kitten"),   // substitution partner of 2
      (2L, "mitten"),
      (3L, "kitte"),    // deletion partner of 1
      (4L, "kittens"),  // insertion partner of 1
      (5L, "sitting"),  // distance 3 from kitten — must NOT pair
      (6L, ""),         // empty string edge
      (7L, "a"),        // distance 1 from empty (insertion)
      (8L, "ab")        // distance 2 from empty — must NOT pair with 6
    ).toDF("id", "name")
    val got = Dedup.editDistancePairs(df, "id", "name")
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // independent check: brute-force over the tiny fixture
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val strs = Seq(1L -> "kitten", 2L -> "mitten", 3L -> "kitte",
      4L -> "kittens", 5L -> "sitting", 6L -> "", 7L -> "a", 8L -> "ab")
    val brute = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).sortBy(t => (t._1, t._2))
    assert(got === brute, s"got $got vs brute $brute")
    assert(got.exists { case (a, b, _) => a == 6L && b == 7L },
      "empty-string insertion pair must be found")
    assert(!got.exists { case (a, b, _) => a == 6L && b == 8L },
      "distance-2 pair must be rejected")
  }

  test("prefixFilterPairs is LOSSLESS: equals the uncapped exact Jaccard join") {
    // The prefix-filtering theorem says dropping suffix tokens loses no
    // pair at Jaccard >= tau; grade it against shingleJaccardPairs with
    // the df cap disabled (maxDocFreq = MaxValue), whose candidate
    // generation joins on EVERY token — a completely different path.
    val toSet = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val pf = toSet(Dedup.prefixFilterPairs(docs, "doc_id", "text",
      minJaccard = 0.8))
    val exact = toSet(Dedup.shingleJaccardPairs(docs, "doc_id", "text",
      minJaccard = 0.8, maxDocFreq = Int.MaxValue))
    assert(pf.nonEmpty, "fixture must contain near-dup pairs")
    assert(pf === exact)
  }

  test("prefixFilterPairs thresholds exactly on tiny crafted sets") {
    // 10 shared + 2/2 private shingles => J = 10/14 = 0.7143; at tau 0.7
    // the pair survives, at tau 0.75 it must not.
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, shared + " aaa bbb"),
      (2L, shared + " ccc ddd"),
      (3L, "zzz yyy xxx www vvv uuu")).toDF("doc_id", "text")
    val lo = Dedup.prefixFilterPairs(df, "doc_id", "text", minJaccard = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lo === Seq((1L, 2L)))
    val hi = Dedup.prefixFilterPairs(df, "doc_id", "text", minJaccard = 0.75)
    assert(hi.count() === 0L)
  }

  test("editDistanceLink blocks strictly and links all dist<=1 cross-source pairs") {
    val left = Seq((1L, "alpha", 10L), (2L, "beta", 10L), (3L, "alpha", 20L))
      .toDF("id", "s", "blk")
    val right = Seq(
      (101L, "alpha", 10L),  // dist 0, block 10 -> links 1 only (3 is block 20)
      (102L, "alpa", 20L),   // deletion, block 20 -> links 3 only
      (103L, "betta", 10L),  // insertion -> links 2
      (104L, "gamma", 10L)   // no link
    ).toDF("id", "s", "blk")
    val got = Dedup.editDistanceLink(left, right, "id", "s", "blk")
      .orderBy("id_r", "id_l")
      .collect().map(r => (r.getAs[Long]("id_l"), r.getAs[Long]("id_r"),
        r.getAs[Long]("dist"))).toSeq
    assert(got === Seq((1L, 101L, 0L), (3L, 102L, 1L), (2L, 103L, 1L)))
  }

  test("jaroWinklerPairs is LOSSLESS vs the brute-force block join at 0.97") {
    // Identifier-shaped fixture (uniform length, the documented
    // contract): substitution, transposition, and far pairs, plus a
    // cross-block twin that must NOT pair.
    val df = Seq(
      (1L, "Customer#000000190", 10L),
      (2L, "Customer#000000191", 10L), // one substitution from 1
      (3L, "Customer#000000910", 10L), // transposed digits of 2
      (4L, "Customer#000007777", 10L), // far from everything
      (5L, "Customer#000000190", 20L), // identical to 1 but other block
      (6L, "Customer#000000019", 20L), // transposition of 5's tail
      (7L, "Supplier#000000190", 10L)  // same digits, other prefix
    ).toDF("id", "nm", "nation")
    val got = Dedup.jaroWinklerPairs(df, "id", "nm", "nation", minJw = 0.97)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // Brute force: every same-block pair scored by the same codegen
    // expression — independent of the deletion-neighborhood blocking,
    // so a candidate generator that DROPS a true pair fails here.
    val b = df.select(col("id"), col("nm"), col("nation"))
    val brute = b.alias("a").join(b.alias("b"),
        col("a.nation") === col("b.nation") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(graft.plans.JaroWinkler(col("a.nm"), col("b.nm")), 6).as("jw"))
      .filter(col("jw") >= 0.97)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === brute, s"got $got vs brute $brute")
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)),
      "substitution pair must survive")
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L),
      "identical strings in different blocks must not pair")
  }

  test("jaroWinklerPairs rejects thresholds below the lossless bound") {
    val df = Seq((1L, "aa", 1L)).toDF("id", "nm", "nation")
    intercept[IllegalArgumentException] {
      Dedup.jaroWinklerPairs(df, "id", "nm", "nation", minJw = 0.9)
    }
  }
}

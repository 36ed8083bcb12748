package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The cat and the dog sat on the mat."),
    (2L, "el perro y el gato que corren en la casa"),
    (3L, "aaaa bbbb cccc")).toDF("doc_id", "text").cache()

  test("tokenCounts") {
    val got = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_tokens") === 9)
    assert(got(2).getAs[Int]("n_tokens") === 3)
    assert(got(2).getAs[Int]("n_chars") === 14)
  }

  test("quality ratios are in [0,1] and mean word length is sane") {
    val got = TextAnalysis.quality(docs, "doc_id", "text").collect()
    got.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") < 1)
      assert(r.getAs[Double]("alpha_ratio") > 0 && r.getAs[Double]("alpha_ratio") <= 1)
      assert(r.getAs[Double]("stopword_ratio") >= 0 && r.getAs[Double]("stopword_ratio") <= 1)
      assert(r.getAs[Double]("mean_word_len") >= 1)
    }
    val noStop = TextAnalysis.quality(docs, "doc_id", "text")
      .filter(col("doc_id") === 3).collect().head
    assert(noStop.getAs[Double]("stopword_ratio") === 0.0)
  }

  test("repetition ratios on hand-computed examples") {
    val df = Seq(
      (1L, "a a a b"),              // 4 words, 2 distinct, top=3, bigrams {a a, a a, a b}
      (2L, "w x y z"),              // no repetition at all
      (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Int]("n_words") === 4)
    assert(r1.getAs[Double]("distinct_word_ratio") === 0.5)
    assert(r1.getAs[Double]("top_word_ratio") === 0.75)
    assert(r1.getAs[Double]("dup_bigram_ratio") === 0.3333)
    val r2 = got(1)
    assert(r2.getAs[Double]("distinct_word_ratio") === 1.0)
    assert(r2.getAs[Double]("top_word_ratio") === 0.25)
    assert(r2.getAs[Double]("dup_bigram_ratio") === 0.0)
    assert(got(2).isNullAt(got(2).fieldIndex("dup_bigram_ratio")),
      "single-word docs have no bigrams — null, not a bogus ratio")
  }

  test("languageId picks en for English and es for Spanish text") {
    val got = TextAnalysis.languageId(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
  }

  test("boilerplateShingles flags 3-grams shared by >= minDocs documents") {
    val d = Seq(
      (1L, "one two three four"),
      (2L, "one two three five"),
      (3L, "one two three six"),
      (4L, "totally different words here")).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateShingles(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc").collect()
    // docs 1-3: 2 shingles each, exactly one ("one two three") in 3 docs
    (0 to 2).foreach { i =>
      assert(got(i).getAs[Long]("n_shingles") === 2L)
      assert(got(i).getAs[Long]("n_boilerplate") === 1L)
      assert(got(i).getAs[Double]("boilerplate_ratio") === 0.5)
    }
    assert(got(3).getAs[Long]("n_boilerplate") === 0L)
  }

  test("duplicatedSpans: consecutive shared 3-grams merge into one run") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 words -> 4 shingles
    val d = Seq(
      (1L, s"intro words then $shared and trailing stuff"),
      (2L, s"$shared completely other tail content"),
      (3L, "no overlap at all in this document")).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedSpans(d, "doc_id", "text")
      .orderBy("doc").collect()
    // both sharing docs contain the 4-shingle run; max_run + 2 = 6 words
    assert(got(0).getAs[Long]("max_run") === 4L)
    assert(got(1).getAs[Long]("max_run") === 4L)
    assert(got(1).getAs[Long]("n_dup_positions") === 4L)
    assert(got(2).getAs[Long]("n_dup_positions") === 0L)
    assert(got(2).getAs[Long]("max_run") === 0L)
  }

  test("CountMin: estimates never undercount; partitioned merge = single pass") {
    val words = ((1 to 200).map(i => s"w$i") ++ Seq.fill(200)("hot"))
    val df = words.toDF("word")
    val cands = Seq("hot", "w1", "w2")
    val cm = udaf(new graft.functions.CountMin(1024, 4, cands))
    val one = df.coalesce(1).agg(cm(col("word"))).as[Map[String, Long]].head()
    val par = df.repartition(8).agg(cm(col("word"))).as[Map[String, Long]].head()
    assert(one === par) // element-wise merge is exact
    assert(one("hot") >= 200L && one("hot") <= 210L)
    assert(one("w1") >= 1L && one("w1") <= 11L)
    assert(one("w2") >= 1L)
  }

  test("removeDuplicatedSpans cuts the shared passage, keeps the unique remainder in order") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, s"intro words then $shared and trailing stuff"),
      (2L, s"$shared completely other tail content"),
      (3L, "no overlap here at all today")).toDF("doc_id", "text")
    val got = TextAnalysis.removeDuplicatedSpans(d, "doc_id", "text")
      .orderBy("doc").collect()
    // doc 1: the 6 shared words (positions 3-8) are covered, 6 survive
    assert(got(0).getAs[Long]("n_kept_words") === 6L)
    assert(got(0).getAs[String]("cleaned_md5") ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        "intro words then and trailing stuff"))
    // doc 2: leading shared span cut, unique tail survives
    assert(got(1).getAs[Long]("n_kept_words") === 4L)
    assert(got(1).getAs[String]("cleaned_md5") ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        "completely other tail content"))
    // doc 3: untouched
    assert(got(2).getAs[Long]("n_kept_words") === 6L)
  }

  test("bigramLmScore: self-repetitive text scores 0, incoherent text scores high") {
    val d = Seq(
      (1L, "q q q q q"),  // every bigram is its own head's whole mass
      (2L, "x y x z")     // rare bigrams under a frequent head
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(d, "doc_id", "text")
      .orderBy("doc").collect()
    assert(got(0).getAs[Long]("n_bigrams") === 4L)
    assert(got(0).getAs[Double]("avg_neg_logp") === 0.0)
    // c_head(x)=2 corpus-wide; "x y"/"x z" each ln(2); "y x" is ln(1)=0
    // -> (6931 + 0 + 6931) / 30000 = 0.4621 in e4 nats
    assert(got(1).getAs[Double]("avg_neg_logp") === 0.4621)
    assert(got(0).getAs[Double]("avg_neg_logp") <
      got(1).getAs[Double]("avg_neg_logp"))
  }

  test("domainStats: hosts extracted per occurrence, blocklist dropped before the roll-up") {
    val d = Seq(
      (1L, "see https://good.org/a and https://bad.com/x plus https://good.org/b"),
      (2L, "only https://bad.com/y here"),
      (3L, "nothing linked at all")).toDF("doc_id", "text")
    val got = TextAnalysis.domainStats(d, "doc_id", "text",
        blocklist = Seq("bad.com"))
      .as[(String, Long, Long)].collect().toList
    assert(got === List(("good.org", 2L, 1L)))
  }

  test("fingerprints: whitespace/case variants collide, different text does not") {
    val df = Seq((1L, "A  B\tC"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "doc_id", "text")
      .select("doc_id", "fingerprint").as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("redactPii replaces URLs, emails and phone runs with typed tokens") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org or see https://a.b/c?d=1 now"),
      (2L, "call +1 (555) 010-4242 twice"),
      (3L, "clean text, nothing to scrub")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_emails") === 1)
    assert(got(0).getAs[Int]("n_urls") === 1)
    assert(got(0).getAs[String]("redacted") ===
      "mail <EMAIL> or see <URL> now")
    assert(got(1).getAs[Int]("n_phones") === 1)
    assert(got(1).getAs[String]("redacted") === "call <NUM> twice")
    assert(got(2).getAs[String]("redacted") === "clean text, nothing to scrub")
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    val df = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare3")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc", "rank").collect()
    // 'common' has df=3 → idf=ln(4/4)=0; every rareN has df=1 → idf=ln(2)
    val top = got.filter(_.getAs[Int]("rank") === 1).map(_.getAs[String]("word"))
    assert(top.toSeq === Seq("rare1", "rare2", "rare3"))
    val d1 = got.filter(r => r.getAs[Long]("doc") == 1L)
    assert(math.abs(d1.head.getAs[Double]("tfidf") - 0.6931) < 1e-9)
    // the zero-idf 'common' still ranks (score 0) below the rare term
    assert(d1(1).getAs[String]("word") === "common")
    assert(d1(1).getAs[Double]("tfidf") === 0.0)
  }

  test("hashedLinearScore: logit equals an independent driver-side replay") {
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(md.take(12), 16) % 64).toLong
    }
    def weight(b: Long): Long = (b * 2654435761L) % 1000001L - 500000L
    val docs = Seq((1L, "alpha beta gamma"), (2L, "Alpha  ALPHA alpha"), (3L, "solo"))
    val got = TextAnalysis.hashedLinearScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "logit_micro").as[(Long, Long, Long)].collect()
    val want = docs.map { case (id, t) =>
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      (id, ws.size.toLong, ws.map(w => weight(bucket(w))).sum)
    }
    assert(got.toSeq === want)
  }

  test("stripHtml drops script/style/comments, strips tags, decodes entities in order") {
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      "<script>var x = \"<p>not text</p>\";</script>after" -> "after",
      "<style>h1 { font-size: 2em; }</style>styled" -> "styled",
      "<!-- secret --><div>shown</div>" -> "shown",
      "a &amp;lt; b" -> "a &lt; b", // double-escape survives as the literal entity
      "x &lt;y&gt; &quot;z&quot; &#39;w&#39;&nbsp;end" -> "x <y> \"z\" 'w' end",
      "  lots   of\n\nspace  " -> "lots of space")
    val got = cases.map(_._1).toDF("html")
      .select(TextAnalysis.stripHtml(col("html")).as("c")).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("lineDedup removes corpus-frequent lines, keeps order, empties all-boilerplate docs") {
    val df = Seq(
      (1L, "unique alpha\nCOPYRIGHT NOTICE\nunique beta"),
      (2L, "copyright notice\nsomething else"),
      (3L, " Copyright Notice \nanother line"),
      (4L, "copyright notice")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(df, "doc_id", "text", maxOccurrences = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text_dedup"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed")))
    // "copyright notice" normalizes identically 4 times (> 2) -> removed
    // everywhere, in every case/whitespace variant; doc 4 empties out
    assert(got.toSeq === Seq(
      (1L, "unique alpha\nunique beta", 2L, 1L),
      (2L, "something else", 1L, 1L),
      (3L, "another line", 1L, 1L),
      (4L, "", 0L, 1L)))
  }

  test("heavyHitters is EXACT vs brute force even with a tiny sketch") {
    // 3 genuinely heavy words + a 200-word long tail, multi-partition.
    val words = Seq.fill(60)("alpha") ++ Seq.fill(40)("beta") ++
      Seq.fill(25)("gamma") ++ (1 to 200).map(i => s"tail$i")
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      .repartition(4)
    // support 1/10 of 325 words = 32.5 → alpha/beta survive, gamma (25) not
    val got = TextAnalysis.heavyHitters(df, "doc_id", "text",
        supportDenom = 10, capacity = 20)
      .orderBy("word").collect()
    assert(got.map(r => (r.getAs[String]("word"), r.getAs[Long]("n_occurrences")))
      .toSeq === Seq(("alpha", 60L), ("beta", 40L)))
    assert(got.forall(_.getAs[Long]("total") === 325L))
  }

  test("chunkTokens: overlapping windows, trailing no-new-token chunks dropped") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c"),                                   // fits one chunk
      (3L, (1 to 6).map(i => s"x$i").mkString(" ")))   // exactly size+overlap? 6 = 4+2
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text",
        chunkSize = 4, overlap = 2).orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
      .collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // starts 0,2,4,6,8; s=8 adds no token beyond chunk@6's end (8+2=10=n)
    // so it is dropped — every word is still covered exactly once-plus
    assert(d1.map(_.getString(2)).toSeq === Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(d1.map(_.getInt(3)).toSeq === Seq(4, 4, 4, 4))
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(2)).toSeq === Seq("a b c"))
    val d3 = got.filter(_.getLong(0) == 3L)
    // starts 0,2,4: s=4 has s+overlap=6 = n → adds nothing → dropped
    assert(d3.map(_.getString(2)).toSeq === Seq("x1 x2 x3 x4", "x3 x4 x5 x6"))
    // coverage: every word appears in at least one chunk
    assert(d3.flatMap(_.getString(2).split(" ")).toSet ===
      (1 to 6).map(i => s"x$i").toSet)
  }

  test("multimodal: binary payload + deterministic metadata") {
    val withBin = Multimodal.attachBinary(docs, "doc_id", "text").cache()
    val meta = withBin.select("media_id", "meta.n_bytes", "meta.width", "meta.height")
      .collect()
    meta.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[Long]("width") >= 0 && r.getAs[Long]("width") < 640)
      assert(r.getAs[Long]("height") >= 0 && r.getAs[Long]("height") < 480)
    }
  }

  // Independent ground truth for the REAL decode chain: recompute the
  // formula sums in plain Scala (no Spark, no ImageIO) and require the
  // ImageIO-decoded stats to agree — a shared bug between the PNG
  // encoder and decoder cannot cancel out because PNG is a published
  // format read by the JDK's own codec, and the expected values here
  // never touch it.
  private def expectSums(id: Long, t: Int): (Int, Int, Long, Long, Long) = {
    val (w, h) = Multimodal.formulaDims(id)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val p = Multimodal.formulaRgb(id, t, x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    (w, h, sr, sg, sb)
  }

  test("multimodal: real PNG synthesis decodes back to the exact formula pixels") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id").cache()
    // the payloads are REAL PNGs: correct signature, ImageIO-readable
    withPng.collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      assert((b(0) & 0xff) === 0x89 && b(1) === 'P'.toByte)
    }
    val stats = Multimodal.decodeImageStats(withPng).collect()
    assert(stats.length === 3)
    stats.foreach { s =>
      val (w, h, sr, sg, sb) = expectSums(s.media_id, 0)
      assert(s.format === "png")
      assert(s.width.get === w.toLong && s.height.get === h.toLong)
      assert((s.sum_r.get, s.sum_g.get, s.sum_b.get) === ((sr, sg, sb)))
    }
    // corrupt payload quarantines instead of failing the scan
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, Array[Byte](1, 2, 3))),
      new org.apache.spark.sql.types.StructType()
        .add("media_id", org.apache.spark.sql.types.LongType)
        .add("payload", org.apache.spark.sql.types.BinaryType))
    val q = Multimodal.decodeImageStats(junk).collect()
    assert(q.head.format === "unknown" && q.head.width.isEmpty)
  }

  test("multimodal: lumaStats matches a driver-side formula replay; corrupt quarantines") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id")
    val stats = Multimodal.lumaStats(withPng).collect()
    assert(stats.length === 3)
    stats.foreach { s =>
      val id = s.media_id
      val (w, h) = ((id % 29 + 4).toInt, (id % 23 + 4).toInt)
      var (sl, sl2) = (0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val l = 299L * (3 * x + 5 * y + (id % 7).toInt) +
          587L * (2 * x + 7 * y + (id % 11).toInt) +
          114L * (x + 4 * y + (id % 13).toInt)
        sl += l; sl2 += l * l
      }
      assert(s.format === "png")
      assert(s.n_pixels.get === w.toLong * h)
      assert((s.sum_lum.get, s.sum_lum2.get) === ((sl, sl2)))
    }
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, Array[Byte](1, 2, 3))),
      new org.apache.spark.sql.types.StructType()
        .add("media_id", org.apache.spark.sql.types.LongType)
        .add("payload", org.apache.spark.sql.types.BinaryType))
    val q = Multimodal.lumaStats(junk).collect()
    assert(q.head.format === "unknown" && q.head.sum_lum.isEmpty)
  }

  test("multimodal: real resize round-trips decode→scale→encode→decode") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id")
    val resized = Multimodal.decodeImageStats(
      Multimodal.resize(withPng, 4, 3)).collect()
    resized.foreach { s =>
      assert(s.format === "png")
      assert(s.width.get === 4L && s.height.get === 3L)
      // nearest-neighbor replay: source pixel (⌊x'·w/4⌋, ⌊y'·h/3⌋)
      val (w, h) = Multimodal.formulaDims(s.media_id)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until 3; x <- 0 until 4) {
        val p = Multimodal.formulaRgb(s.media_id, 0, x * w / 4, y * h / 3)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      assert((s.sum_r.get, s.sum_g.get, s.sum_b.get) === ((sr, sg, sb)))
    }
  }

  test("multimodal: perceptual hash replays from the formula; corrupt payloads null out") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id")
    val got = Multimodal.perceptualHash(withPng).collect()
      .map(p => p.media_id -> p).toMap
    assert(got.size === 3)
    got.foreach { case (id, p) =>
      val (w, h) = Multimodal.formulaDims(id)
      def lum(gx: Int, gy: Int): Long = {
        val px = Multimodal.formulaRgb(id, 0, gx * w / 8, gy * h / 8)
        299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) + 114L * (px & 0xff)
      }
      var exp = 0L; var ones = 0
      for (y <- 0 until 8; x <- 0 until 7)
        if (lum(x + 1, y) > lum(x, y)) { exp |= 1L << (y * 7 + x); ones += 1 }
      assert(p.phash.get === exp, s"hash mismatch for image $id")
      assert(p.n_ones.get === ones)
    }
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, Array[Byte](1, 2, 3))),
      new org.apache.spark.sql.types.StructType()
        .add("media_id", org.apache.spark.sql.types.LongType)
        .add("payload", org.apache.spark.sql.types.BinaryType))
    val q = Multimodal.perceptualHash(junk).collect()
    assert(q.head.phash.isEmpty && q.head.n_ones.isEmpty)
  }

  test("multimodal: phash near-dup pairs via byte bands, exact Hamming verify") {
    import spark.implicits._
    val base = 0x00A5A5A5A5A5A5L // 56-bit pattern
    val hashes = Seq(
      (1L, Some(base)),
      (2L, Some(base ^ (1L << 13))), // Hamming 1 from 1
      (3L, Some(base ^ 0x00FFFFFFFFFFFFL)), // far away from everything
      (4L, None)) // undecodable: must drop out silently
      .toDF("media_id", "phash")
    val pairs = graft.operators.Multimodal.phashNearDupPairs(hashes, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 1)), s"got $pairs")
    // tightening the radius to 0 keeps only exact duplicates
    val exact = graft.operators.Multimodal.phashNearDupPairs(hashes, maxHamming = 0)
      .collect()
    assert(exact.isEmpty)
    // the pigeonhole guarantee stops at 6 — wider radii must be rejected
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.phashNearDupPairs(hashes, maxHamming = 7)
    }
  }

  test("multimodal: frame stream walk + stride sampling decodes the right frames") {
    val stream = Multimodal.synthesizeFrameStream(docs, "doc_id", nFrames = 3)
    // the chunk walk finds exactly the 3 frame boundaries
    stream.collect().foreach { r =>
      val ranges = Multimodal.pngFrameRanges(r.getAs[Array[Byte]]("payload"))
      assert(ranges.length === 3)
      assert(ranges.head._1 === 0)
      assert(ranges(1)._1 === ranges.head._2) // frames abut exactly
    }
    val frames = Multimodal.sampleFrames(stream, n = 3).collect()
    assert(frames.length === 3 * 3)
    frames.foreach { f =>
      assert(f.src_frame === f.frame_idx) // n == total → identity stride
      val (w, h, sr, sg, sb) = expectSums(f.media_id, f.src_frame)
      assert(f.width === w.toLong && f.height === h.toLong)
      assert((f.sum_r, f.sum_g, f.sum_b) === ((sr, sg, sb)))
    }
    // stride selection: 2 of 3 → source frames 0 and 1 (⌊k·3/2⌋)
    val two = Multimodal.sampleFrames(stream, n = 2).collect()
    assert(two.filter(_.media_id == two.head.media_id)
      .map(_.src_frame).sorted.toSeq === Seq(0, 1))
  }

  test("multimodal: feature extraction is a real decoded-pixel histogram") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id")
    val feats = Multimodal.extractFeatures(withPng, dim = 8).collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      val (w, h) = Multimodal.formulaDims(f.media_id)
      assert(f.n_pixels === w * h)
      assert(f.features.length === 8)
      // histogram counts are exact and conserve the pixel count
      assert(f.features.map(_.toLong).sum === (w * h).toLong)
      // replay the binning from the formula
      val expect = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.formulaRgb(f.media_id, 0, x, y)
        val luma = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
        expect(luma * 8 / 256) += 1
      }
      assert(f.features.map(_.toLong).toSeq === expect.toSeq)
    }
  }

  test("multimodal: audioSilence windows, threshold, and longest run on a planned PCM body") {
    import spark.implicits._
    // Character pairs are the samples (ASCII contract): ' ' pairs give
    // 32+256*32 = 8224 (< 25000, silent), 'z' pairs 122+256*122 = 31354
    // (loud). 128 chars = 64 samples = one window, so the layout below
    // is [loud][silent][loud][silent][silent] + a trailing partial
    // window of 'z' that must be EXCLUDED, not counted loud.
    val text = "z" * 128 + " " * 128 + "z" * 128 + " " * 256 + "z" * 50
    val doc = Seq((7L, text)).toDF("doc_id", "text")
    val got = Multimodal.audioSilence(
      Multimodal.synthesizeAudioPayload(doc, "doc_id", "text")).collect().head
    assert(got.format === "wav")
    assert(got.n_windows === Some(5L), s"5 full windows, partial excluded: $got")
    assert(got.n_silent === Some(3L))
    assert(got.longest_run === Some(2L))
    // quarantine: junk bytes yield 'unknown' with null stats
    val junk = Seq((99L, Array[Byte](9, 9, 9))).toDF("media_id", "payload")
    val q = Multimodal.audioSilence(junk).collect().head
    assert(q.format === "unknown" && q.n_windows.isEmpty)
  }

  test("multimodal: dominantColor replays the quantized-histogram argmax from the formula") {
    val withPng = Multimodal.synthesizeRealPng(docs, "doc_id")
    val got = Multimodal.dominantColor(withPng).collect()
    assert(got.length === 3)
    got.foreach { g =>
      val (w, h) = Multimodal.formulaDims(g.media_id)
      assert(g.width === Some(w.toLong) && g.height === Some(h.toLong))
      // replay: quantize every formula pixel, argmax with smallest-bucket
      // tie-break
      val hist = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.formulaRgb(g.media_id, 0, x, y)
        hist((((p >> 16) & 0xff) / 64) * 16 + (((p >> 8) & 0xff) / 64) * 4 +
          ((p & 0xff) / 64)) += 1
      }
      val best = hist.indices.maxBy(i => (hist(i), -i))
      assert(g.bucket === Some(best.toLong))
      assert(g.n_px === Some(hist(best)))
      assert(g.bucket_r === Some((best / 16).toLong))
      assert(g.bucket_g === Some((best / 4 % 4).toLong))
      assert(g.bucket_b === Some((best % 4).toLong))
      // buckets conserve: dominant count is positive and <= pixel count
      assert(hist(best) > 0 && hist(best) <= w.toLong * h)
    }
    // quarantine: junk bytes yield 'unknown' with null stats
    import spark.implicits._
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val q = Multimodal.dominantColor(junk).collect().head
    assert(q.format === "unknown" && q.bucket.isEmpty && q.n_px.isEmpty)
  }

  test("multimodal: imageMeta parses real PNG/BMP headers, independent ground truth") {
    // hand-built literal containers with KNOWN dimensions — ground truth
    // independent of synthesizeImagePayload, so a shared offset/endian
    // bug between synthesis and parse cannot cancel out
    def i32be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def i32le(v: Int): Array[Byte] = i32be(v).reverse
    val png: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        i32be(13) ++ "IHDR".getBytes("US-ASCII") ++
        i32be(640) ++ i32be(480) ++
        Array[Byte](8, 6, 0, 0, 0) ++ i32be(0)
    val bmp: Array[Byte] =
      "BM".getBytes("US-ASCII") ++ i32le(54) ++ i32le(0) ++ i32le(54) ++
        i32le(40) ++ i32le(123) ++ i32le(77) ++
        Array[Byte](1, 0, 24, 0) ++ i32le(0) ++ i32le(0) ++
        i32le(2835) ++ i32le(2835) ++ i32le(0) ++ i32le(0)
    val junk: Array[Byte] = "not an image at all".getBytes("US-ASCII")
    val df = Seq((1L, png), (2L, bmp), (3L, junk)).toDF("media_id", "payload")
    val got = Multimodal.imageMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(2) === "png")
    assert(got(1L).getLong(3) === 640L && got(1L).getLong(4) === 480L)
    assert(got(2L).getString(2) === "bmp")
    assert(got(2L).getLong(3) === 123L && got(2L).getLong(4) === 77L)
    assert(got(3L).getString(2) === "unknown")
    assert(got(3L).isNullAt(3) && got(3L).isNullAt(4))

    // synthesized payloads round-trip: parsed dims equal the md5 formula
    val parsed = Multimodal.imageMeta(
      Multimodal.synthesizeImagePayload(docs, "doc_id", "text"))
    val expected = docs.select(col("doc_id").as("media_id"),
      (conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 640 + 1).as("width"),
      (conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 480 + 1).as("height"))
    assert(parsed.select("media_id", "width", "height")
      .except(expected).isEmpty, "parsed dims must equal the generator formula")
    assert(parsed.filter(col("format") === "unknown").count() === 0)
  }

  test("multimodal: audioMeta parses a real WAV header, independent ground truth") {
    // hand-built literal container with KNOWN fields — ground truth
    // independent of synthesizeAudioPayload, so a shared offset/endian
    // bug between synthesis and parse cannot cancel out
    def i32le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def i16le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val dataBytes = 800
    val wav: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ i32le(36 + dataBytes) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ i32le(16) ++ i16le(1) ++ i16le(2) ++
        i32le(44100) ++ i32le(44100 * 2 * 2) ++ i16le(4) ++ i16le(16) ++
        "data".getBytes("US-ASCII") ++ i32le(dataBytes) ++
        Array.fill[Byte](dataBytes)(1)
    val junk: Array[Byte] = "certainly not audio".getBytes("US-ASCII")
    val df = Seq((1L, wav), (2L, junk)).toDF("media_id", "payload")
    val got = Multimodal.audioMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(2) === "wav")
    assert(got(1L).getLong(3) === 2L)      // channels
    assert(got(1L).getLong(4) === 44100L)  // rate
    assert(got(1L).getLong(5) === 16L)     // bits
    assert(got(1L).getLong(6) === dataBytes / 4L)          // frames
    assert(got(1L).getLong(7) === (dataBytes / 4L) * 1000L / 44100L)
    assert(got(2L).getString(2) === "unknown")
    assert(got(2L).isNullAt(3) && got(2L).isNullAt(7))

    // synthesized payloads round-trip: every container parses, and the
    // parsed sample math is internally consistent with the header
    val parsed = Multimodal.audioMeta(
      Multimodal.synthesizeAudioPayload(docs, "doc_id", "text"))
    assert(parsed.filter(col("format") === "unknown").count() === 0)
    assert(parsed.filter(
      col("n_samples") =!= floor((col("n_bytes") - 44) /
        (col("n_channels") * 2)).cast("long")).count() === 0)
  }

  test("multimodal: audioDecodeStats reads real PCM frames via javax.sound") {
    val parsed = Multimodal.audioDecodeStats(
      Multimodal.synthesizeAudioPayload(docs, "doc_id", "text")).collect()
      .map(s => s.media_id -> s).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    parsed.values.foreach { s =>
      assert(s.format === "wav")
      val body = texts(s.media_id).getBytes("US-ASCII")
      val nch = s.n_channels.get.toInt
      val frames = body.length / (2 * nch)
      assert(s.n_frames.get === frames.toLong)
      // independent replay: sample i = b[2i] + 256*b[2i+1] over the
      // frame-aligned prefix (ASCII bytes < 128 => never negative)
      val want = (0 until frames * nch).map(i =>
        (body(2 * i) & 0xff) + 256L * (body(2 * i + 1) & 0xff)).sum
      assert(s.sum_samples.get === want)
    }
    // junk quarantines
    val junk = Seq((5L, "not audio".getBytes("US-ASCII"))).toDF("media_id", "payload")
    val q = Multimodal.audioDecodeStats(junk).collect().head
    assert(q.format === "unknown" && q.sum_samples.isEmpty)
  }

  test("multimodal: audioFeatures de-interleaves channels and replays RMS exactly") {
    val parsed = Multimodal.audioFeatures(
      Multimodal.synthesizeAudioPayload(docs, "doc_id", "text")).collect()
      .map(s => s.media_id -> s).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val meta = Multimodal.audioMeta(
      Multimodal.synthesizeAudioPayload(docs, "doc_id", "text"))
      .select("media_id", "n_channels").as[(Long, Long)].collect().toMap
    parsed.values.foreach { s =>
      val body = texts(s.media_id).getBytes("US-ASCII")
      val nch = meta(s.media_id).toInt
      val frames = body.length / (2 * nch)
      val samples = (0 until frames * nch).map(i =>
        (body(2 * i) & 0xff) + 256L * (body(2 * i + 1) & 0xff))
      assert(s.n_frames.get === frames.toLong)
      // channel j gets samples i with i % nch == j — the interleave law
      val c0 = samples.zipWithIndex.collect { case (v, i) if i % nch == 0 => v }.sum
      assert(s.ch0_sum.get === c0)
      if (nch == 2) {
        val c1 = samples.zipWithIndex.collect { case (v, i) if i % nch == 1 => v }.sum
        assert(s.ch1_sum.get === c1)
        assert(s.ch0_sum.get + s.ch1_sum.get === samples.sum)
      } else assert(s.ch1_sum.isEmpty)
      if (samples.nonEmpty) {
        val rms = math.sqrt(samples.map(v => v.toDouble * v).sum / samples.size)
        assert(math.abs(s.rms.get - rms) < 1e-6, s"rms mismatch for ${s.media_id}")
      }
    }
    // junk quarantines with all-null features
    val junk = Seq((9L, "still not audio".getBytes("US-ASCII"))).toDF("media_id", "payload")
    val q = Multimodal.audioFeatures(junk).collect().head
    assert(q.format === "unknown" && q.rms.isEmpty && q.ch0_sum.isEmpty)
  }

  test("pmiCollocations: PMI matches a driver-side replay on a tiny corpus") {
    val tiny = Seq(
      (1L, "strong coffee every morning"),
      (2L, "strong coffee beats weak tea"),
      (3L, "strong coffee strong coffee strong coffee"),
      (4L, "weak tea weak tea weak tea weak tea")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(tiny, "text", minCount = 2, topK = 10)
      .select("w1", "w2", "cxy", "pmi").collect()
    assert(got.nonEmpty)
    // independent counts
    val docs2 = Seq("strong coffee every morning",
      "strong coffee beats weak tea",
      "strong coffee strong coffee strong coffee",
      "weak tea weak tea weak tea weak tea").map(_.split(" ").toSeq)
    val bigrams = docs2.flatMap(ws => ws.zip(ws.tail))
    val uni = docs2.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val nb = bigrams.size.toDouble
    val nu = docs2.flatten.size.toDouble
    got.foreach { r =>
      val (w1, w2, cxy) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(bigrams.count(p => p._1 == w1 && p._2 == w2) === cxy)
      val want = math.log((cxy / nb) / ((uni(w1) / nu) * (uni(w2) / nu))) / math.log(2.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-4)
    }
  }

  test("rakeKeyphrases: stopword-split islands and degree/freq scoring on a known corpus") {
    val tiny = Seq(
      (1L, "machine learning of the machine learning pipeline"),
      (2L, "deep learning and machine learning")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(tiny, "doc_id", "text", topK = 10)
      .select("phrase", "n_occurrences", "score_micro").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // phrases: "machine learning" x2 (doc1 split by "of the", doc2 after "and"),
    // "machine learning pipeline" x1, "deep learning" x1
    assert(got.keySet === Set("machine learning", "machine learning pipeline",
      "deep learning"))
    assert(got("machine learning")._1 === 2L)
    // word stats over phrase members: machine f=3 d=7, learning f=4 d=9,
    // pipeline f=1 d=3, deep f=1 d=2
    val sm = Map("machine" -> 7000000L / 3, "learning" -> 9000000L / 4,
      "pipeline" -> 3000000L, "deep" -> 2000000L)
    assert(got("machine learning")._2 === sm("machine") + sm("learning"))
    assert(got("machine learning pipeline")._2 ===
      sm("machine") + sm("learning") + sm("pipeline"))
    assert(got("deep learning")._2 === sm("deep") + sm("learning"))
  }

  test("readability: hand-computed Flesch on a two-sentence doc; guards hold") {
    val tiny = Seq((1L, "The cat sat. The cat ran away!"),
      (2L, "word")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(tiny, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    // words = 7, sentences = 2, syllables: the(1) cat(1) sat(1) the(1)
    // cat(1) ran(1) away(2) = 8  ("sat." keeps its punctuation in the
    // whitespace tokenization; vowel groups are unaffected)
    assert(r1.getLong(1) === 7L && r1.getLong(2) === 2L && r1.getLong(3) === 8L)
    val flesch = 206.835 - 1.015 * (7.0 / 2.0) - 84.6 * (8.0 / 7.0)
    assert(math.abs(r1.getDouble(4) - flesch) < 1e-3)
    // single word, no terminator: sentence guard clamps to 1
    val r2 = got(2L)
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 1L)
  }

  test("multimodal: jpegMeta walks the segment chain, independent ground truth") {
    // hand-built literal JPEG with KNOWN dims behind a COM segment of a
    // DIFFERENT length than the synthesizer would pick — a fixed-offset
    // parser or a shared synthesis/parse bug cannot pass this
    def u16be(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++ u16be(payload.length + 2) ++ payload
    val jpg: Array[Byte] =
      Array(0xff.toByte, 0xd8.toByte) ++
        seg(0xfe, "a comment of arbitrary length here".getBytes("US-ASCII")) ++
        seg(0xdb, Array.fill[Byte](65)(3)) ++ // DQT before SOF, as real files have
        seg(0xc0, Array[Byte](8) ++ u16be(333) ++ u16be(777) ++
          Array[Byte](1, 1, 0x11, 0)) ++
        Array(0xff.toByte, 0xd9.toByte)
    val noSof: Array[Byte] =
      Array(0xff.toByte, 0xd8.toByte) ++
        seg(0xfe, "only a comment".getBytes("US-ASCII")) ++
        Array(0xff.toByte, 0xd9.toByte)
    val junk: Array[Byte] = "not a jpeg".getBytes("US-ASCII")
    val truncated: Array[Byte] = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)
    val df = Seq((1L, jpg), (2L, noSof), (3L, junk), (4L, truncated))
      .toDF("media_id", "payload")
    val got = Multimodal.jpegMeta(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(2) === "jpeg")
    assert(got(1L).getLong(4) === 333L && got(1L).getLong(3) === 777L,
      "SOF0 stores height THEN width — a swap must fail here")
    assert(got(2L).getString(2) === "unknown" && got(2L).isNullAt(3))
    assert(got(3L).getString(2) === "unknown")
    assert(got(4L).getString(2) === "unknown")

    // synthesized payloads round-trip: parsed dims equal the md5 formula
    // even though the SOF offset varies with the COM length
    val parsed = Multimodal.jpegMeta(
      Multimodal.synthesizeJpegPayload(docs, "doc_id", "text"))
    val expected = docs.select(col("doc_id").as("media_id"),
      (conv(substring(md5(col("text")), 21, 4), 16, 10).cast("long") % 1024 + 1).as("width"),
      (conv(substring(md5(col("text")), 25, 4), 16, 10).cast("long") % 768 + 1).as("height"))
    assert(parsed.select("media_id", "width", "height")
      .except(expected).isEmpty, "parsed dims must equal the generator formula")
    assert(parsed.filter(col("format") === "unknown").count() === 0)
  }

  test("gopherRules: each rule trips on its own violation") {
    val filler = (1 to 60).map(i => s"word$i").mkString(" ")
    val good = "the words be stacked to a height of and beyond that " +
      "people have built with care " + filler
    val short = "the of and that have with tiny text"
    val bullets = (1 to 10).map(i => s"- the item $i of that list").mkString("\n") +
      "\nthe be to of and that have with " + filler
    val symbols = ("# " * 40) + "the be to of and that have with " + filler
    val noStops = filler + " " + (61 to 120).map(i => s"plain$i").mkString(" ")
    val rows = Seq((1L, good), (2L, short), (3L, bullets), (4L, symbols),
      (5L, noStops)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("pass"))
    assert(!got(2L).getAs[Boolean]("pass") && got(2L).getLong(1) < 50)
    assert(!got(3L).getAs[Boolean]("pass") &&
      got(3L).getAs[Double]("bullet_ratio") > 0.9)
    assert(!got(4L).getAs[Boolean]("pass") &&
      got(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!got(5L).getAs[Boolean]("pass") && got(5L).getLong(7) < 2)
  }

  /** Independent driver-side reference BPE trainer over a (word, count)
    * vocabulary — plain Scala collections, no Spark, so it cannot share
    * a bug with the distributed implementation. */
  private def referenceBpe(vocab: Map[String, Long], numMerges: Int,
                           minFreq: Long): Seq[(String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      vocab.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, c) => c }(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (sym, cnt) =>
        sym.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ => ()
        }
      }
      val best = counts.toSeq.sortBy { case ((l, r), f) => (-f, l, r) }.headOption
      best match {
        case Some(((l, r), f)) if f >= minFreq =>
          out += ((l, r, f))
          segs = segs.groupMapReduce { case (sym, _) =>
            // leftmost non-overlapping merge of (l, r)
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < sym.length) {
              if (i < sym.length - 1 && sym(i) == l && sym(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += sym(i); i += 1 }
            }
            b.result()
          } { case (_, c) => c }(_ + _)
        case _ => done = true
      }
    }
    out.toSeq
  }

  test("bpeTrain matches an independent reference trainer; encode round-trips and compresses") {
    val corpus = Seq(
      (1L, "the cat sat on the mat with the other cat"),
      (2L, "the dog and the cat chatter on the matter"),
      (3L, "that mat that cat that hat thatch"),
      (4L, "scatter the chatter the matter the platter")).toDF("doc_id", "text").cache()
    val merges = TextAnalysis.bpeTrain(corpus, "text", numMerges = 12)
    assert(merges.nonEmpty && merges.size <= 12)
    // differential: same merges, same order, same frequencies
    val vocab = corpus.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val expect = referenceBpe(vocab, 12, minFreq = 2)
    assert(merges.map(m => (m._2, m._3, m._5)) === expect,
      s"distributed trainer diverged:\n got=$merges\n exp=$expect")
    // ranks are 0..n-1 in order, merged = left+right
    assert(merges.map(_._1) === merges.indices)
    assert(merges.forall(m => m._4 == m._2 + m._3))

    // encoder: tokens concatenate back to the original words; more
    // merges can never yield MORE tokens (merging only shrinks)
    val pairList = merges.map(m => (m._2, m._3))
    val enc = TextAnalysis.bpeEncode(corpus, "doc_id", "text", pairList)
    val encNone = TextAnalysis.bpeEncode(corpus, "doc_id", "text", Nil)
    val joined = enc.select(col("doc_id"), concat_ws("", col("tokens")).as("glued"),
        col("n_tokens"))
      .join(encNone.select(col("doc_id"), col("n_tokens").as("n_chars_tok")), "doc_id")
      .join(corpus, "doc_id")
      .select(col("glued"),
        regexp_replace(lower(trim(col("text"))), "\\s+", "").as("squashed"),
        col("n_tokens"), col("n_chars_tok"))
      .as[(String, String, Int, Int)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (glued, squashed, nTok, nChar) =>
      assert(glued === squashed, "BPE tokens must concatenate to the original text")
      assert(nTok <= nChar, "learned merges can only reduce token counts")
    }
    assert(joined.exists { case (_, _, nTok, nChar) => nTok < nChar },
      "12 merges on this corpus must actually compress something")

    // canonical rank-priority semantics: encoding a training word uses
    // the learned merges deterministically — re-encode equals itself
    val once = enc.select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val twice = TextAnalysis.bpeEncode(corpus, "doc_id", "text", pairList)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(once === twice)
  }
}

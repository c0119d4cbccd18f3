package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame
  lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, "the quick brown fox leaps over the lazy dog"), // near dup
      (3L, "completely different content about spark sql engines"),
      (4L, "spark sql engines are completely different content about")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length == 4)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keeper") == 0L)
  }

  test("minhash LSH finds the near-duplicate pair and jaccard verifies it") {
    val pairs = Dedup.minhashLshPairs(docs, k = 32, bands = 16)
    // docs 0/2 share 4 of 10 distinct 3-gram shingles → exact jaccard 0.4
    val verified = Dedup.ngramJaccard(docs, pairs.select("idA", "idB"))
      .where(col("jaccard") >= 0.35)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB"))).toSet
    assert(verified.contains((0L, 1L)))
    assert(verified.contains((0L, 2L)) || verified.contains((1L, 2L)))
    // fox docs never pair with the spark docs (3/4 pairing with each
    // other is correct: they share 3 of 8 shingles)
    assert(!verified.exists(p => p._1 <= 2L && p._2 >= 3L))
  }

  test("simhash: identical docs collide, unrelated docs do not") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("native SimHash64 equals the declarative bit-voting spec") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("the", "fox", "tok", "北京", "café", "x", "", "a1",
      "Spark", "spark", "и", "_", "...", "longer-token-value")
    val fuzz = (0 until 60).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
    }
    val texts = (Seq(
      "the quick brown fox jumps over the lazy dog",
      "completely different content about spark sql engines",
      "a", "a b", "  leading and   irregular   whitespace text",
      (1 to 80).map(i => s"tok${i % 13}").mkString(" "),
      "unicode tökens café 北京 и слова"
    ) ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val both = df.select($"doc_id",
      graft.functions.SimHash64($"text").as("native"),
      Dedup.simhash($"text").as("spec")).collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: native=${r.getLong(1)} spec=${r.getLong(2)}")
    }
  }

  test("native TokenChainHash equals the aggregate-HOF fingerprint spec") {
    import spark.implicits._
    val rnd = new scala.util.Random(137)
    val alphabet = Vector("the", "fox", "tok", "北京", "café", "x", "", "a1",
      "Spark", "spark", "и", "_", "...", "longer-token-value")
    val fuzz = (0 until 60).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
    }
    val texts = (Seq(
      "the quick brown fox jumps over the lazy dog",
      "dog lazy the over jumps fox brown quick the", // reorder must differ
      "a", "a b", "  leading and   irregular   whitespace",
      "unicode tökens café 北京 и слова"
    ) ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val both = df.select($"doc_id",
      TextAnalysis.fingerprint($"text").as("native"),
      TextAnalysis.fingerprintSpec($"text").as("spec")).collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: native=${r.getLong(1)} spec=${r.getLong(2)}")
    }
    // order sensitivity: the reordered sentence fingerprints differently
    val byId = both.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) != byId(1L))
  }

  test("native TokenStats equals the declarative quality/token-count specs") {
    import spark.implicits._
    val rnd = new scala.util.Random(401)
    val alphabet = Vector("the", "fox", "a,b", "x.y;z", "(paren)", "", "a1!",
      "of", "and", "to", "北京", "café—dash", "под", "tab\tin", "semi;colon")
    val fuzz = (0 until 60).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
    }
    val texts = (Seq(
      "the quick brown fox, the lazy dog.",
      "a", "", "  ", "punct!only?!", "a of the and to in of of",
      "mixed: 北京 café and ASCII..."
    ) ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(TextAnalysis.qualityScore(df)) == rows(TextAnalysis.qualityScoreSpec(df)))
    assert(rows(TextAnalysis.tokenCounts(df)) == rows(TextAnalysis.tokenCountsSpec(df)))
    // the plan is kernel-native, HOF-free, and evaluates the kernel ONCE
    // per row (two-projection structure, not optimizer-dependent CSE) —
    // pinned on a parquet scan (a local relation constant-folds the
    // whole projection into a LocalTableScan)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = TextAnalysis.qualityScore(docs).queryExecution.executedPlan.toString
    assert(p.contains("graft_token_stats") && !p.contains("filter("), p.take(800))
    assert("graft_token_stats".r.findAllIn(p).size == 1, p.take(800))
  }

  test("simhash band buckets are capped with an observed drop counter") {
    import spark.implicits._
    val docs = (0 until 20)
      .map(i => (i.toLong, "identical boilerplate text shared by every document row"))
      .toDF("doc_id", "text")
    graft.runtime.Observed.clear("simhash_band_cap")
    val n = Dedup.simhashPairs(docs, maxBucket = 4).count()
    // 4 docs per band survive → C(4,2)=6 distinct pairs (identical docs,
    // so the same pairs in all 4 bands, deduped)
    assert(n == 6L, s"pairs=$n")
    def poll(): Option[Long] =
      graft.runtime.Observed.get("simhash_band_cap").map(_("dropped"))
    val deadline = System.currentTimeMillis() + 10000
    while (poll().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    // 20 identical docs × 4 bands, cap 4 → 16 dropped per band = 64
    assert(poll().contains(64L), s"observed=${poll()}")
  }

  test("embedding near-dup finds planted duplicate vector") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val dup = base.clone()
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq((0L, base), (1L, dup), (2L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.size == 1)
  }

  test("native MinHashSignature: identical docs identical sigs; estimate tracks true jaccard") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = ((1 to 45).map(i => s"tok$i") ++ (100 to 114).map(i => s"tok$i")).mkString(" ")
    val docs = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
    val k = 128
    val sigs = docs.select($"doc_id",
      graft.functions.MinHashSignature($"text", k, 3).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L)) // identical text → identical signature
    assert(sigs(0L).length == k && sigs(0L).distinct.length > k / 2)
    // true 3-gram shingle jaccard of a vs b: |A∩B| = 43 (43 unbroken
    // 3-grams of tok1..tok45), |A| = 58, |B| = 58, union = 73
    val est = sigs(0L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / k
    val truth = 43.0 / 73.0
    assert(math.abs(est - truth) < 0.15, s"est=$est truth=$truth")
  }

  test("native DotProduct is bit-identical to the declarative fold spec") {
    import spark.implicits._
    val vecs = (0 until 25).map { i =>
      (Array.tabulate(33)(d => math.sin(i * 2.17 + d * 0.73)),
       Array.tabulate(33)(d => math.cos(i * 1.41 + d * 1.19)))
    }.toDF("a", "b")
    vecs.select(
      graft.ops.Ann.dot($"a", $"b").as("native"),
      graft.ops.Ann.dotSpec($"a", $"b").as("spec"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1),
          s"native=${r.getDouble(0)} spec=${r.getDouble(1)}")
      }
  }

  test("native HyperplaneSignatures equals the declarative band-signature spec") {
    import spark.implicits._
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(19)(d => math.sin(i * 3.91 + d * 1.37)))
    }.toDF("vec_id", "v")
    val nBands = 8; val rBits = 8
    val withBoth = vecs.select($"vec_id",
      graft.functions.HyperplaneSignatures($"v", nBands, rBits).as("native"),
      array((0 until nBands).map(b => Dedup.bandSigSpec($"v", b, rBits)): _*).as("spec"))
    withBoth.collect().foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: native=${r.getSeq[Int](1)} spec=${r.getSeq[Int](2)}")
    }
  }

  test("multi-band embedding LSH reaches full recall vs brute force on planted near-dups") {
    import spark.implicits._
    // 40 random-ish vectors + 10 planted near-duplicates (tiny perturbation)
    val bases = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 7.13 + d * 1.71).toFloat))
    }
    val dups = (0 until 10).map { i =>
      (100L + i, bases(i)._2.map(v => v * 1.001f + 0.0005f))
    }
    val emb = (bases ++ dups).toDF("vec_id", "embedding")
    val tau = 0.98
    // brute-force ground truth
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val all = bases ++ dups
    val truth = (for {
      (ia, va) <- all; (ib, vb) <- all
      if ia < ib && cos(va, vb) >= tau
    } yield (ia, ib)).toSet
    assert(truth.size >= 10)
    val got = Dedup.embeddingNearDup(emb, threshold = tau)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB"))).toSet
    // multi-band: every returned pair is truly ≥ tau, and recall ≥ 0.9
    // (round-1's single 8-bit band is probabilistically much weaker)
    assert(got.subsetOf(truth), (got -- truth).toString)
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall=$recall got=${got.size} truth=${truth.size}")
  }
}

class AnnSpec extends SparkSpec {
  test("brute-force top-k ranks the planted nearest vector first") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = base.map(v => (v * 1.01f))
    val rows = Seq((0L, base), (1L, near)) ++
      (2L until 50L).map(i => (i, Array.tabulate(16)(d => math.sin(i * 17.3 + d * 2.1).toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id") === 0).select(col("vec_id").as("q_id"), col("embedding"))
    val top = Ann.bruteForceTopK(emb, queries, k = 5).orderBy("rank").collect()
    assert(top.head.getAs[Long]("id") == 1L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-3)
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    import spark.implicits._
    // 4 well-separated clusters of 25 vectors each
    val rows = for (c <- 0 until 4; j <- 0 until 25) yield {
      val id = (c * 25 + j).toLong
      val v = Array.tabulate(16)(d => (if (d % 4 == c) 10.0 + j * 0.01 else math.sin(id + d) * 0.1).toFloat)
      (id, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where(col("vec_id").isin(0L, 25L, 50L))
      .select(col("vec_id").as("q_id"), col("embedding"))
    val bf = Ann.bruteForceTopK(emb, queries, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(emb, queries, c = 8, nProbe = 4, k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall")

    // one Lloyd refinement pass must not hurt recall on well-separated
    // clusters (re-centered cells align with the true cluster means)
    val ivf2 = Ann.ivfTopK(emb, queries, c = 8, nProbe = 4, k = 5, lloydIters = 1)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = (bf intersect ivf2).size.toDouble / bf.size
    assert(recall2 >= recall, s"Lloyd recall $recall2 < $recall")

    // refined centroids sit at the coordinate means of their cells
    val seeds = Ann.seedCentroids(emb, 8)
    val refined = Ann.refineCentroids(emb, seeds)
    assert(refined.count() <= 8 && refined.count() > 0)
    val dims = refined.select(org.apache.spark.sql.functions.size(col("cv")))
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(16), dims.toString)
  }
}

class TextAnalysisSpec extends SparkSpec {
  test("language ID picks the right lexicon") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog sat in the garden of the house"),
      (1L, "el gato y la casa de los perros en un jardin del pueblo"),
      (2L, "der Hund und die Katze von dem Haus mit den Kindern ist nicht")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("lang_guess") == "en")
    assert(out(1).getAs[String]("lang_guess") == "es")
    assert(out(2).getAs[String]("lang_guess") == "de")
  }

  test("native LangGuess equals the declarative languageId spec on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = TextAnalysis.languageId(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_guess"), r.getAs[Int]("lang_hits"))).toSet
    val spec = TextAnalysis.languageIdSpec(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_guess"), r.getAs[Int]("lang_hits"))).toSet
    assert(native == spec)
    // tie-break pin: zero hits everywhere → lexicographically largest lang
    import spark.implicits._
    val none = Seq((9L, "xyzzy qwerty")).toDF("doc_id", "text")
    val r = TextAnalysis.languageId(none).head()
    assert(r.getString(1) == "ru" && r.getInt(2) == 0, r.toString)
  }

  test("language fallback matches the reference table and respects `supported`") {
    import spark.implicits._
    val docs = Seq("en", "ru", "uk", "be", "de", "pt", "pl", "zh", "xx")
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    // reference semantics (language.py:149-179): supported [ru,en],
    // uk/be → ru, de/nl/fr/es/it/pt/pl → en, anything else → default en
    val eff = TextAnalysis.languageFallback(docs).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[String]("lang_effective")).toMap
    assert(eff == Map("en" -> "en", "ru" -> "ru", "uk" -> "ru", "be" -> "ru",
      "de" -> "en", "pt" -> "en", "pl" -> "en", "zh" -> "en", "xx" -> "en"))
    // a mapped target NOT in `supported` degrades to default — the
    // invariant lang_effective ∈ supported ∪ {default} holds for any set
    val narrow = TextAnalysis.languageFallback(docs,
      supported = Seq("en"), default = "en").collect()
      .map(_.getAs[String]("lang_effective")).toSet
    assert(narrow == Set("en"))
  }

  test("quality score counts are exact") {
    import spark.implicits._
    val docs = Seq((0L, "the quick fox, the lazy dog!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs).head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_stopwords") == 2)
    assert(r.getAs[Int]("n_punct") == 2)
  }

  test("fingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "c b a"), (2L, "a b c")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fingerprint")).toMap
    assert(fp(0L) == fp(2L))
    assert(fp(0L) != fp(1L))
  }

  test("independent public-spec XXH64 matches Spark's xxhash64 (fuzzed) and the kernel") {
    import spark.implicits._
    // fuzz across the tail-length regimes of the algorithm (0..100 bytes
    // covers <4, <8, <32 and the 32-byte stripe loop) plus multibyte UTF-8
    val rnd = new scala.util.Random(4242)
    // sample by CODE POINT so the 4-byte UTF-8 emoji is always emitted
    // whole (never as lone surrogate halves) and the space is reachable
    val extraCps = "éüжç日🙂 ".codePoints().toArray
    val strings = (0 until 200).map { i =>
      val n = rnd.nextInt(101)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach { _ =>
        if (rnd.nextBoolean()) sb.append(('a' + rnd.nextInt(26)).toChar)
        else sb.appendCodePoint(extraCps(rnd.nextInt(extraCps.length)))
      }
      sb.toString
    } :+ "" :+ "a" :+ ("x" * 1000)
    val accs = strings.indices.map(i => rnd.nextLong())
    val df = strings.zip(accs).zipWithIndex
      .map { case ((s, a), i) => (i, a, s) }.toDF("i", "acc", "s")
    val sparkSide = df.select(col("i"), xxhash64(col("acc"), col("s")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    strings.zip(accs).zipWithIndex.foreach { case ((s, a), i) =>
      assert(graft.tools.RefXxh64.chainStep(a, s) == sparkSide(i),
        s"XXH64 divergence on i=$i len=${s.length}")
    }
    // whole-fingerprint parity: reference fold == native kernel on docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 50)
    val kernel = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      assert(graft.tools.RefXxh64.fingerprint(r.getString(1)) == kernel(r.getLong(0)))
    }
  }

  test("NL-vs-code heuristic") {
    import spark.implicits._
    val df = Seq(
      (0L, "This is a plain English paragraph about knowledge graphs."),
      (1L, "def foo(x): return {x: [1,2]} if x else None")
    ).toDF("id", "text").withColumn("nl", TextAnalysis.isNaturalLanguage(col("text")))
      .select("id", "nl")
    val m = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(0L) && !m(1L))
  }
}

class MultimodalSpec extends SparkSpec {
  test("feature extraction preserves payload sha and is deterministic") {
    val media = Multimodal.syntheticMedia(spark, 200)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect().sortBy(_.mediaId)
    assert(f1.map(_.payloadSha).toSeq == f2.map(_.payloadSha).toSeq)
    assert(f1.forall(f => f.meanLuma >= 0.0 && f.meanLuma <= 1.0))
    assert(f1.forall(f => math.max(f.resizedW, f.resizedH) == 224))
    assert(f1.filter(_.mediaType == "video").forall(_.nFramesSampled >= 1))
  }

  test("size-balanced repartition keeps all rows") {
    val media = Multimodal.syntheticMedia(spark, 500)
    assert(Multimodal.balanceBySize(media, 8).count() == 500)
  }

  test("corrupt image payload isolates into decodeError — the stage survives") {
    import spark.implicits._
    val good = Multimodal.ImageDecoder.syntheticPng(1L, 8, 8)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", good, 8, 8, 16000, 1000L),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4), 8, 8, 16000, 1000L))
    val out = Multimodal.extractFeatures(rows.toDS()).collect().sortBy(_.mediaId)
    assert(out(0).decodeError.isEmpty && out(0).meanLuma > 0.0)
    assert(out(1).decodeError.nonEmpty, out(1).toString)
  }

  test("image decode is REAL ImageIO: known image pins its exact mean luma") {
    // solid color → closed-form Rec.601 luma, penny-exact through the
    // lossless PNG round trip
    val img = new java.awt.image.BufferedImage(
      10, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 6).foreach(y => (0 until 10).foreach(x =>
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (luma, w, h) = Multimodal.ImageDecoder.decodeMeanLuma(bos.toByteArray)
    assert(w == 10 && h == 6)
    val expected = (0.299 * 200 + 0.587 * 100 + 0.114 * 50) / 255.0
    assert(math.abs(luma - expected) < 1e-12, s"$luma vs $expected")

    // synthetic pattern round-trips losslessly: decoded luma equals the
    // pixel-formula computation, independent of the PNG encoder
    val payload = Multimodal.ImageDecoder.syntheticPng(7L, 20, 15)
    val (l2, w2, h2) = Multimodal.ImageDecoder.decodeMeanLuma(payload)
    assert(w2 == 20 && h2 == 15)
    var sum = 0.0
    (0 until 15).foreach { y =>
      (0 until 20).foreach { x =>
        val r = (7 * 31 + x * 7 + y * 13) % 256
        val g = (7 * 17 + x * 11 + y * 3) % 256
        val b = (7 * 29 + x * 5 + y * 19) % 256
        sum += 0.299 * r + 0.587 * g + 0.114 * b
      }
    }
    assert(math.abs(l2 - sum / 300 / 255.0) < 1e-12)
  }

  test("audio decode is REAL javax.sound: constant-amplitude WAV pins exact RMS") {
    // constant 16-bit sample v → RMS = |v| / 32768 exactly, through the
    // lossless WAV round trip
    val n = 800
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      pcm(2 * i) = (16384 & 0xff).toByte
      pcm(2 * i + 1) = ((16384 >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (rms, rate, durMs) = Multimodal.AudioDecoder.decodeRms(bos.toByteArray)
    assert(rate == 8000 && durMs == 100L, s"$rate Hz / $durMs ms")
    assert(math.abs(rms - 0.5) < 1e-12, rms.toString)

    // synthetic clip round-trips losslessly: decoded RMS equals the
    // sample-formula computation, independent of the WAV encoder
    val payload = Multimodal.AudioDecoder.syntheticWav(7L, 8000, 250L)
    val (r2, _, d2) = Multimodal.AudioDecoder.decodeRms(payload)
    assert(d2 == 250L)
    val m = 250 * 8
    var sumSq = 0.0
    (0 until m).foreach { i =>
      val v = (((7L * 31 + i * 7) % 65536L) - 32768L).toDouble
      sumSq += v * v
    }
    assert(math.abs(r2 - math.sqrt(sumSq / m) / 32768.0) < 1e-12)
  }

  test("audio decode normalizes layout: stereo and 8-bit WAVs reduce correctly") {
    // stereo, opposite-phase channels → mono average 0 → RMS 0
    val n = 400
    val stereo = new Array[Byte](n * 4)
    (0 until n).foreach { i =>
      stereo(4 * i) = (16384 & 0xff).toByte
      stereo(4 * i + 1) = ((16384 >> 8) & 0xff).toByte
      stereo(4 * i + 2) = (-16384 & 0xff).toByte
      stereo(4 * i + 3) = ((-16384 >> 8) & 0xff).toByte
    }
    val sFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val sBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(stereo), sFmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sBos)
    val (sRms, _, _) = Multimodal.AudioDecoder.decodeRms(sBos.toByteArray)
    assert(math.abs(sRms) < 1e-12, sRms.toString)

    // 8-bit unsigned constant 192 = signed +64 → RMS 0.5 through the JDK
    // bit-depth converter, within one 8-bit quantization step (the
    // converter's exact low-byte fill is an implementation detail)
    val eight = Array.fill[Byte](n)(192.toByte)
    val eFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val eBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(eight), eFmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, eBos)
    val (eRms, _, _) = Multimodal.AudioDecoder.decodeRms(eBos.toByteArray)
    assert(math.abs(eRms - 0.5) <= 1.0 / 256, eRms.toString)
  }

  test("corrupt audio payload isolates into decodeError — the stage survives") {
    import spark.implicits._
    val good = Multimodal.AudioDecoder.syntheticWav(1L, 8000, 200L)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", good, 0, 0, 8000, 200L),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9, 9, 9), 0, 0, 8000, 200L))
    val out = Multimodal.extractFeatures(rows.toDS()).collect().sortBy(_.mediaId)
    assert(out(0).decodeError.isEmpty && out(0).meanLuma > 0.0)
    assert(out(1).decodeError.nonEmpty, out(1).toString)
  }

  test("video decode is REAL MJPEG-AVI: dims, duration, and stride-sampling pinned") {
    val payload = Multimodal.VideoDecoder.syntheticMjpegAvi(7L, 16, 12, frames = 7, fps = 5)
    val (luma, w, h, sampled, durMs) = Multimodal.VideoDecoder.decodeSampled(payload)
    assert(w == 16 && h == 12, s"$w x $h")
    assert(sampled == 7)
    // avih header: 7 frames × (1000000/5) µs = 1400 ms
    assert(durMs == 1400L, durMs.toString)
    assert(luma > 0.0 && luma < 1.0)

    // parity pin: the container walk must hand each 00dc chunk's bytes to
    // the JPEG decoder VERBATIM — re-encode the same frames independently
    // and the per-frame lumas must match exactly (same encoder, same bytes)
    var sum = 0.0
    (0 until 7).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val seed = 7L * 1000 + f
      (0 until 12).foreach { y =>
        (0 until 16).foreach { x =>
          val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((seed * 17 + x * 11 + y * 3) % 256).toInt
          val b = ((seed * 29 + x * 5 + y * 19) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val (l, _, _) = Multimodal.ImageDecoder.decodeMeanLuma(bos.toByteArray)
      sum += l
    }
    assert(math.abs(luma - sum / 7) < 1e-12, s"$luma vs ${sum / 7}")

    // stride sampling: every 5th of 7 frames → frames {0, 5} = 2 sampled
    val (l2, _, _, s2, _) = Multimodal.VideoDecoder.decodeSampled(payload, sampleEvery = 5)
    assert(s2 == 2, s2.toString)

    // 'rec '-grouped frames (the interleaved-muxer layout) must be
    // sampled in STREAM order: a grouped container selects the SAME
    // frames as the flat one — a level-by-level walk would visit the
    // second group first and sample a different (scrambled) set
    val grouped = Multimodal.VideoDecoder.syntheticMjpegAvi(
      7L, 16, 12, frames = 7, fps = 5, recGroup = 3)
    val (lg, wg, hg, sg, dg) =
      Multimodal.VideoDecoder.decodeSampled(grouped, sampleEvery = 5)
    assert(wg == 16 && hg == 12 && dg == 1400L && sg == s2, s"$wg $hg $dg $sg")
    assert(math.abs(lg - l2) < 1e-12, s"$lg vs $l2")
  }

  test("corrupt/truncated video payload isolates into decodeError — the stage survives") {
    import spark.implicits._
    val good = Multimodal.VideoDecoder.syntheticMjpegAvi(1L, 16, 12, frames = 6, fps = 5)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", good, 16, 12, 0, 1200L),
      // truncated mid-stream: the RIFF header parses but a frame chunk
      // overruns the payload — must throw inside the walk, not decode junk
      Multimodal.MediaRow(2L, "video", good.take(good.length / 2), 16, 12, 0, 1200L),
      Multimodal.MediaRow(3L, "video", Array[Byte](1, 2, 3, 4), 16, 12, 0, 1200L))
    val out = Multimodal.extractFeatures(rows.toDS()).collect().sortBy(_.mediaId)
    assert(out(0).decodeError.isEmpty && out(0).meanLuma > 0.0)
    // extractFeatures samples every 5th frame: 6 frames → {0, 5} = 2
    assert(out(0).nFramesSampled == 2, out(0).toString)
    assert(out(1).decodeError.nonEmpty, out(1).toString)
    assert(out(2).decodeError.nonEmpty, out(2).toString)
  }
}

class StorageSpec extends SparkSpec {
  test("versioned save writes each table once and publishes current via atomic pointer") {
    val g = Fixtures.queryGraph(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graphs_ptr").toString
    val storage = new graft.graphout.GraphStorage(spark, tmp)
    val v1 = storage.save("gp", g)
    val v2 = storage.save("gp", g)
    assert(v2 > v1)
    // single write per table: the snapshot IS the data — no current/ copy
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/gp/current")))
    val ptr = java.nio.file.Paths.get(s"$tmp/gp/_CURRENT.json")
    assert(java.nio.file.Files.exists(ptr))
    assert(java.nio.file.Files.readString(ptr).contains(s"versions/v$v2"))
    // pointer-resolved load == latest snapshot; explicit version still works
    assert(storage.load("gp").nodes.count() == g.nodes.count())
    assert(storage.load("gp", Some(v1)).edges.count() == g.edges.count())
    assert(storage.listVersions("gp") == Seq(v2, v1))
    // versions.json stays parseable JSON (atomic writes, never torn)
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/gp/versions.json"))
    assert(meta.startsWith("[") && meta.endsWith("]") &&
      meta.contains(s""""version":$v1""") && meta.contains(s""""version":$v2"""))
    storage.delete("gp")
  }

  test("unversioned saves write fresh work dirs, flip the pointer, and GC with one generation of grace") {
    val g = Fixtures.queryGraph(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graphs_work").toString
    val storage = new graft.graphout.GraphStorage(spark, tmp)
    val v1 = storage.save("gw", g, createVersion = false)
    val w1 = java.nio.file.Paths.get(s"$tmp/gw/work/v$v1")
    assert(java.nio.file.Files.exists(w1))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/gw/_CURRENT.json")).contains(s"work/v$v1"))
    // a lazily-held reader of the v1 pointer target, taken BEFORE the next
    // save — the documented one-generation grace keeps it readable
    val lazyReader = storage.load("gw")
    val v2 = storage.save("gw", g, createVersion = false)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/gw/_CURRENT.json")).contains(s"work/v$v2"))
    // superseded dir survives ONE save (grace for in-flight lazy readers)
    assert(java.nio.file.Files.exists(w1),
      "one generation of grace: previous work dir must survive the next save")
    assert(lazyReader.nodes.count() == g.nodes.count())
    // ...and is GC'd by the save after that
    val v3 = storage.save("gw", g, createVersion = false)
    assert(!java.nio.file.Files.exists(w1),
      "work dir two generations back must be GC'd")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/gw/work/v$v2")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/gw/work/v$v3")))
    assert(storage.load("gw").nodes.count() == g.nodes.count())
    // unversioned saves never appear in the version list
    assert(storage.listVersions("gw").isEmpty)
    storage.delete("gw")
  }

  test("save/load roundtrip preserves counts (test_graph.py:314-315)") {
    val g = Fixtures.queryGraph(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graphs").toString
    val storage = new graft.graphout.GraphStorage(spark, tmp)
    val v1 = storage.save("g1", g)
    val loaded = storage.load("g1")
    assert(loaded.nodes.count() == g.nodes.count())
    assert(loaded.edges.count() == g.edges.count())
    // versioned load
    val byVersion = storage.load("g1", Some(v1))
    assert(byVersion.nodes.count() == g.nodes.count())
    assert(storage.listVersions("g1") == Seq(v1))
    assert(storage.listGraphs().map(_._1) == Seq("g1"))
    assert(storage.delete("g1"))
  }

  test("bucketed save co-locates the node⨝edge join — no Exchange in the plan") {
    import spark.implicits._
    import graft.model.{Entity, Triple}
    val nodes = spark.range(2000).select(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("e"), $"id").as("id"),
      org.apache.spark.sql.functions.lit("n").as("name"),
      org.apache.spark.sql.functions.lit("t").as("entityType"),
      org.apache.spark.sql.functions.lit(null).cast("string").as("context"),
      org.apache.spark.sql.functions.map().cast("map<string,string>").as("attributes"),
      org.apache.spark.sql.functions.lit(1.0).as("confidence"),
      org.apache.spark.sql.functions.lit("").as("segId"),
      org.apache.spark.sql.functions.lit("").as("repo"),
      org.apache.spark.sql.functions.lit("").as("path"),
      org.apache.spark.sql.functions.lit("").as("contentSha")).as[Entity]
    val edges = (0 until 4000).map(i =>
      Triple(s"r$i", s"e${i % 2000}", s"e${(i + 7) % 2000}", "", "", "r",
        None, bidirectional = false, 1.0, 1.0, "")).toDS()
    val storage = new graft.graphout.GraphStorage(spark,
      java.nio.file.Files.createTempDirectory("bucketed").toString)
    storage.saveBucketed("bspec", graft.graphout.GraphBuilder.Graph(nodes, edges), buckets = 8)
    val g = storage.loadBucketed("bspec")
    assert(g.nodes.count() == 2000 && g.edges.count() == 4000)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so co-location is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = g.edges.toDF()
        .join(g.nodes.toDF().withColumnRenamed("id", "srcId").select("srcId", "name"),
          Seq("srcId"))
      assert(joined.count() == 4000)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("cypher export escapes and covers all elements") {
    val g = Fixtures.queryGraph(spark)
    val stmts = graft.graphout.GraphStorage.toCypher(g).collect().map(_.getString(0))
    assert(stmts.length == 11) // 5 nodes + 6 edges
    assert(stmts.exists(_.contains("CREATE (n:person {id: 'alice'")))
    assert(stmts.exists(_.contains("[:works_at")))
  }

  test("graphml export is well-formed-ish") {
    val xml = graft.graphout.GraphStorage.toGraphML(Fixtures.queryGraph(spark))
    assert(xml.contains("<graphml") && xml.contains("</graphml>"))
    assert(xml.split("<node ").length == 6 && xml.split("<edge ").length == 7)
  }

  test("json import normalizes alias fields (graph_creator.py:136-161)") {
    import spark.implicits._
    val nodes = Seq(
      """{"id":"a","name":"A","type":"person","confidence":0.9}""",
      """{"id":"b","name":"B","entity_type":"org"}""").toDF("value")
    val edges = Seq(
      """{"source":"a","target":"b","type":"works_at"}""").toDF("value")
    val nj = spark.read.json(nodes.as[String])
    val ej = spark.read.json(edges.as[String])
    val g = graft.graphout.GraphStorage.importJson(spark, nj, ej)
    assert(g.nodes.count() == 2)
    val e = g.edges.collect()
    assert(e.length == 1 && e.head.relType == "works_at" && e.head.confidence == 1.0)
  }
}

class SummarizerSpec extends SparkSpec {
  test("keywords, first-sentence summary, skip-short, cache-key dedup") {
    import spark.implicits._
    val seg = (id: String, text: String) => graft.model.Segment(
      id, None, "r", "p", "en", 1, "paragraph", None, text, 0, text.length.toLong, "sha")
    val segs = Seq(
      seg("s1", "Spark engines scale. Spark engines shuffle data across executors."),
      seg("s2", "Spark engines scale. Spark engines shuffle data across executors."), // same key
      seg("s3", "tiny")).toDS() // < 10 chars → skipped
    val out = graft.segment.Summarizer.summarize(segs).collect()
    assert(out.length == 2) // s3 skipped, s1+s2 both mapped
    val r = out.find(_.getAs[String]("segId") == "s1").get
    assert(r.getAs[String]("summary") == "Spark engines scale.")
    val kws = r.getAs[scala.collection.Seq[String]]("keywords")
    assert(kws.contains("spark") && kws.contains("engines"))
  }
}

package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

class TextFunctionsSuite extends SparkSpec {
  import spark.implicits._

  test("token count, stopword ratio, mean token length") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.stopwordRatio($"text", Seq("the", "on")),
      TextFunctions.meanTokenLen($"text")).head()
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 0.5) // the, on, the
    assert(r.getDouble(2) === math.rint(17.0 / 6 * 10000) / 10000)
  }

  test("lang id heuristic picks marker language, und when none") {
    val df = Seq(
      ("a", "the quick fox and the dog"),
      ("b", "der hund und die katze ist"),
      ("c", "le chat et la maison est"),
      ("d", "el perro y los gatos es"),
      ("e", "xyzzy plugh")).toDF("id", "text")
    val out = df.select($"id", TextFunctions.langIdHeuristic($"text").as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "en", "b" -> "de", "c" -> "fr", "d" -> "es", "e" -> "und"))
  }

  test("word shingles and jaccard") {
    val df = Seq(("a b c d", "a b c e")).toDF("t1", "t2")
    val r = df.select(
      TextFunctions.wordShingles($"t1", 2),
      TextFunctions.jaccard(
        TextFunctions.wordShingles($"t1", 2), TextFunctions.wordShingles($"t2", 2))).head()
    assert(r.getSeq[String](0) === Seq("a b", "b c", "c d"))
    // shingles {a b, b c, c d} vs {a b, b c, c e}: inter 2, union 4
    assert(r.getDouble(1) === 0.5)
  }

  test("shingles shorter than n collapse to whole text") {
    val df = Seq("one two").toDF("text")
    assert(df.select(TextFunctions.wordShingles($"text", 3)).head().getSeq[String](0)
      === Seq("one two"))
  }

  test("codegen char-ngrams match the HOF formulation, incl. distinct variant") {
    import graft.functions.CharNgramFunctions.{charNgramsDistinct, charNgramsFast}
    val texts = Seq("", "ab", "abc", "abcd", "abcabcabc", "aaaaaa",
      "héllo wörld", "x" * 40).toDF("t")
    val hof = when(length(col("t")) < 3, array(col("t")))
      .otherwise(transform(sequence(lit(1), length(col("t")) - 2),
        i => col("t").substr(i, lit(3))))
    val rows = texts.select(
      charNgramsFast(col("t"), 3).as("fast"), hof.as("ref"),
      charNgramsDistinct(col("t"), 3).as("dfast"), array_distinct(hof).as("dref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getSeq[String](2) === r.getSeq[String](3))
    }
  }

  test("simhash: identical texts equal, near texts close, far texts far") {
    val df = Seq(
      ("a", "spark query engine for incremental batch processing at scale"),
      ("b", "spark query engine for incremental batch processing at scale"),
      ("c", "spark query engine for incremental micro batch processing at scale"),
      ("d", "completely unrelated words about cooking pasta and tomato sauce")
    ).toDF("id", "text")
    val h = df.select($"id", TextFunctions.simhash64(TextFunctions.tokens($"text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h("a") === h("b"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(h("a"), h("c")) < ham(h("a"), h("d")))
  }

  test("token stats match the split/filter formulation") {
    val stops = Seq("the", "a", "of")
    val texts = Seq("the cat of a hat", "  double  spaces ", "", "naïve über 中文 the",
      "no stop words here")
    val df = texts.toDF("text")
    val rows = df.select(
      TextFunctions.tokenStats($"text", Seq(stops)).as("st"),
      size(split($"text", " ")).as("n"),
      aggregate(split($"text", " "), lit(0L), (acc, t) => acc + length(t)).as("sumlen"),
      size(filter(split($"text", " "),
        t => array_contains(array(stops.map(lit): _*), t))).as("hits")).collect()
    rows.foreach { r =>
      val st = r.getSeq[Long](0)
      assert(st(0) === r.getInt(1).toLong, "n_tokens")
      assert(st(1) === r.getLong(2), "sum_chars")
      assert(st(2) === r.getInt(3).toLong, "hits")
    }
  }

  test("codegen simhash matches the HOF formulation bit for bit") {
    val df = Seq("spark query engine for incremental batch processing",
      "completely unrelated words about cooking pasta", "", "single",
      "a a a repeated tokens a a").toDF("text")
    val rows = df.select(
      TextFunctions.simhash64(TextFunctions.tokens($"text")).as("hof"),
      graft.functions.SimHashFunctions.simhash(TextFunctions.tokens($"text")).as("gen"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("codegen simhash matches the HOF on arrays containing null elements") {
    // xxhash64(null) evaluates to the bare seed in the HOF fold; the
    // expression must cast the same vote, not skip the element
    val df = Seq(1).toDF("x")
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"), lit(null).cast("string"))
    val r = df.select(
      TextFunctions.simhash64(arr).as("hof"),
      graft.functions.SimHashFunctions.simhash(arr).as("gen"),
      graft.functions.SimHashFunctions.simhash(array(lit("a"), lit("b"))).as("skipped"))
      .head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(1) !== r.getLong(2), "null elements must influence the vote")
  }

  test("fused shingle minhash equals the composed formulation") {
    // multibyte chars, consecutive/leading/trailing spaces, short + empty
    val texts = Seq(
      "spark is a distributed engine for large scale data",
      "naïve café über—grüße 中文 text with ünïcödé",
      "  leading and  double  spaces trailing ",
      "short", "", "ab", "a b")
    val df = texts.toDF("text")
    import graft.functions.FusedMinHashFunctions._
    for (n <- Seq(2, 3, 12); k <- Seq(8, 16)) {
      val rows = df.select(
        TextFunctions.minhashSignature(TextFunctions.charNgrams($"text", n), k).as("c0"),
        minhashCharNgrams($"text", n, k).as("c1"),
        TextFunctions.minhashSignature(TextFunctions.wordShingles($"text", n), k).as("w0"),
        minhashWordShingles($"text", n, k).as("w1")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"char n=$n k=$k text='$t'")
        assert(r.getSeq[Long](2) === r.getSeq[Long](3), s"word n=$n k=$k text='$t'")
      }
    }
  }

  test("fused portable poly-minhash equals the interpreted " +
    "aggregate(split) formulation") {
    val texts = Seq(
      "spark is a distributed engine for large scale data",
      "naïve café über—grüße 中文 text with ünïcödé",
      "  leading and  double  spaces trailing ",
      "short", "", "ab", "a b")
    val df = texts.toDF("text")
    val (m1, m2) = (1048573L, 524287L)
    def fold(s: org.apache.spark.sql.Column, m: Long) =
      aggregate(split(s, ""), lit(0L), (h, c) => (h * 31 + ascii(c)) % m)
    for (n <- Seq(2, 3); k <- Seq(8, 16)) {
      val hs = transform(TextFunctions.wordShingles($"text", n),
        s => struct(fold(s, m1).as("h1"), (fold(s, m2) * 2 + 1).as("h2")))
      val interp = array((0 until k).map(i =>
        array_min(transform($"__hs",
          p => p.getField("h1") + lit(i.toLong) * p.getField("h2")))): _*)
      val rows = df.withColumn("__hs", hs)
        .select(interp.as("i"),
          graft.functions.FusedMinHashFunctions
            .polyMinhashWordShingles($"text", n, k, m1, m2).as("f"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1),
          s"poly n=$n k=$k text='$t'")
      }
    }
  }

  test("portable poly hash wrappers refuse wrap-risky moduli up front") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.FusedMinHashFunctions
        .polyMinhashWordShingles($"text", 3, 16, 1L << 61, 1L << 61)
    }
    assert(e.getMessage.contains("below 2^62"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.functions.FusedMinHashFunctions
        .polySimhash($"text", 1L << 32, 7L)
    }
    assert(e2.getMessage.contains("(0, 2^31]"), e2.getMessage)
  }

  test("minhash signature is stable and sensitive") {
    val df = Seq(("x", "a b c d e f g h"), ("y", "a b c d e f g h"),
      ("z", "q r s t u v w x")).toDF("id", "text")
    val sigs = df.select($"id",
      TextFunctions.minhashSignature(TextFunctions.wordShingles($"text", 3), 8).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("x") === sigs("y"))
    assert(sigs("x") !== sigs("z"))
    assert(sigs("x").length === 8)
  }
}

class DedupSuite extends SparkSpec {
  import spark.implicits._

  test("cross-batch minhash: signature history flags later near-dups, novel passes") {
    import graft.operators.Dedup
    val a = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 40).map(i => s"beta$i").mkString(" ")
    val hist = Dedup.minhashIndex(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text")
    // batch 2: a lightly-edited copy of doc 1 (high J), plus novel text
    val aEdit = a.replace("alpha5 ", "edited5 ")
    val novel = (1 to 40).map(i => s"gamma$i").mkString(" ")
    val batch2 = Seq((10L, aEdit), (11L, novel)).toDF("doc_id", "text")
    val flagged = Dedup.minhashAgainstHistory(
      batch2, hist, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.map(p => (p._1, p._2)).toSet === Set((10L -> 1L)),
      s"only the edited copy may flag: ${flagged.toSeq}")
    assert(flagged.head._3 >= 0.5 && flagged.head._3 < 1.0,
      s"estimate must reflect a near-but-not-exact match: ${flagged.head._3}")
    // a byte-identical later copy estimates exactly 1.0
    val exact = Dedup.minhashAgainstHistory(
      Seq((20L, b)).toDF("doc_id", "text"), hist, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.toSeq === Seq((20L, 2L, 1.0)))
    // deterministic: same inputs, same pairs and estimates on re-run
    val again = Dedup.minhashAgainstHistory(
      batch2, hist, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq.sorted === flagged.toSeq.sorted)
    // the drop pattern: anti-join the flagged ids — only novel survives
    val survivors = batch2.join(
      Dedup.minhashAgainstHistory(batch2, hist, "doc_id", "text", 0.5)
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(11L))
    // the index round-trips through the hand-built Delta writer — the
    // incremental pipeline's persistence path (array + struct columns)
    withTmpDir { tmp =>
      val w = new graft.delta.DeltaWriter(spark, conf)
      w.write(hist, s"$tmp/idx", graft.delta.DeltaWriteMode.Append)
      val flagged2 = Dedup.minhashAgainstHistory(
        batch2, w.read(s"$tmp/idx"), "doc_id", "text", 0.5)
        .select("doc_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flagged2 === Set((10L, 1L)))
    }
  }

  test("cross-batch semantic dedup: embedding history flags twins under a persisted quantizer") {
    import graft.operators.{Dedup, Similarity}
    // three well-separated base directions in 8 dims + noise dims
    def vec(axis: Int, mag: Float, nudge: Float = 0f): Seq[Float] =
      Seq.tabulate(8)(j => (if (j == axis) mag else 0.1f * (j + 1)) +
        (if (j == (axis + 1) % 8) nudge else 0f))
    val hist0 = Seq(
      (1L, vec(0, 10f)), (2L, vec(3, 10f)), (3L, vec(6, 10f)))
      .toDF("doc_id", "v")
    // the quantizer trains on the FIRST batch and persists — later
    // batches must probe under the SAME model (bucket ids comparable)
    val model = Similarity.trainIvfCentroids(hist0, "doc_id", "v", nlist = 3)
    withTmpDir { tmp =>
      Similarity.saveQuantizer(spark, s"$tmp/q", model)
      val loaded = Similarity.loadQuantizer(spark, s"$tmp/q")
      val w = new graft.delta.DeltaWriter(spark, conf)
      w.write(Dedup.semDedupIndex(hist0, "doc_id", "v", loaded),
        s"$tmp/idx", graft.delta.DeltaWriteMode.Append)
      // batch 2: a nudged twin of doc 2 (cosine ~0.999) + a novel doc on
      // an unused direction mix
      val batch2 = Seq(
        (10L, vec(3, 10f, nudge = 0.5f)),
        (11L, vec(1, 10f))).toDF("doc_id", "v")
      val flagged = Dedup.semDedupAgainstHistory(
        batch2, w.read(s"$tmp/idx"), "doc_id", "v", threshold = 0.95,
        quantizer = loaded)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(flagged.map(p => (p._1, p._2)).toSet === Set((10L, 2L)),
        s"only the twin may flag: ${flagged.toSeq}")
      assert(flagged.head._3 >= 0.95 && flagged.head._3 <= 1.0)
      // the anti-join drop pattern: only the novel doc survives
      val survivors = batch2.join(
        Dedup.semDedupAgainstHistory(batch2, w.read(s"$tmp/idx"),
          "doc_id", "v", 0.95, loaded).select("doc_id"),
        Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors === Set(11L))
      // quantizer mismatch is the silent-recall trap — the require names it
      val e = intercept[IllegalArgumentException] {
        Dedup.semDedupAgainstHistory(batch2, w.read(s"$tmp/idx"),
          "doc_id", "v", 0.95, Array.empty[Array[Float]])
      }
      assert(e.getMessage.contains("quantizer"))
    }
  }

  test("winnowing: deterministic sorted sketch; short and empty docs behave") {
    import graft.functions.WinnowingFunctions.winnowFingerprints
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "abc"), // shorter than k -> single whole-text hash
      (4L, "")).toDF("id", "text")
    val rows = df.select($"id", winnowFingerprints($"text", 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L).nonEmpty && rows(1L) === rows(1L).distinct.sorted)
    assert(rows(3L).size === 1)
    assert(rows(4L).isEmpty)
    // codegen DataFrame path equals the direct helper
    val direct = graft.functions.Winnowing
      .winnow(org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog"), 8, 4).toLongArray().toSeq
    assert(rows(1L) === direct)
  }

  test("winnowing guarantee: shared substring of w+k-1 bytes shares a fingerprint") {
    import graft.functions.WinnowingFunctions.winnowFingerprints
    val k = 8; val w = 16
    val rng = new scala.util.Random(7)
    def randText(n: Int, alphabet: String) =
      (0 until n).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val shared = randText(w + k - 1, "abcdefgh") // exactly the guarantee length
    val pairs = (0 until 20).map { i =>
      val a = randText(rng.nextInt(200), "ijklmnop") + shared +
        randText(rng.nextInt(200), "qrstuvwx")
      val b = randText(rng.nextInt(200), "qrstuvwx") + shared +
        randText(rng.nextInt(200), "ijklmnop")
      (i.toLong, a, b)
    }
    val df = pairs.flatMap { case (i, a, b) =>
      Seq((i * 2, a), (i * 2 + 1, b)) }.toDF("id", "text")
    val fps = df.select($"id", winnowFingerprints($"text", k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    pairs.foreach { case (i, _, _) =>
      assert(fps(i * 2).intersect(fps(i * 2 + 1)).nonEmpty,
        s"pair $i violated the w+k-1 guarantee")
    }
    // disjoint alphabets share nothing
    val x = fps(0L); val y = graft.functions.Winnowing
      .winnow(org.apache.spark.unsafe.types.UTF8String.fromString(
        randText(300, "0123456789")), k, w).toLongArray().toSet
    assert(x.intersect(y).isEmpty)
  }

  test("winnowing pairs drop corpus-wide boilerplate fingerprints (maxDf)") {
    // every doc shares the same long boilerplate; only docs 1 and 2 share a
    // UNIQUE quotation. With maxDf below the corpus size, boilerplate
    // buckets are dropped wholesale and only the real pair survives.
    val boiler = "standard license header all rights reserved do not remove " * 3
    val quote = "a genuinely distinctive passage that appears exactly twice " * 2
    val docs = (0 until 40).map(i => (i.toLong, s"$boiler document body $i")) ++
      Seq((100L, s"$boiler $quote first carrier"), (101L, s"$boiler $quote second"))
    val pairs = Dedup.winnowingPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.1, maxDf = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
  }

  test("winnowing pairs finds planted quotation, skips unrelated") {
    val quote = "it was the best of times it was the worst of times " * 2
    val docs = Seq(
      (1L, s"opening remarks $quote and then some trailing commentary here"),
      (2L, s"completely different framing but quoting: $quote end of quote"),
      (3L, "unrelated document about spark query engines and parquet files"),
      (4L, "another unrelated document describing minhash banding at scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text", threshold = 0.15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("exact dedup keeps smallest tiebreak per key") {
    val df = Seq((1L, "dup"), (2L, "dup"), (3L, "uniq")).toDF("id", "text")
    val out = Dedup.exact(df, Seq("text"), "id").orderBy("id")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("fingerprint dedup equals exact dedup on text") {
    val df = Seq((1L, "dup"), (2L, "dup"), (3L, "uniq")).toDF("id", "text")
    val out = Dedup.byFingerprint(df, "text", "id").orderBy("id")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(out.columns.toSeq === Seq("id", "text"))
  }

  test("minhash LSH finds near-duplicate pair, skips unrelated") {
    val base = "spark is a distributed engine for large scale data processing with catalyst"
    val near = base.replace("large", "big")
    val far = "cooking pasta requires boiling salted water and fresh tomatoes every time"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    // bands=16/rows=1 -> candidate recall ~1 at jaccard ~0.5 (banding theory:
    // P(candidate) = 1-(1-j^r)^b); the default 4x4 targets higher-j dups
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text",
      k = 16, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
    val kept = Dedup.minhashLshDedup(df, "doc_id", "text",
      threshold = 0.3, k = 16, bands = 16)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("exact char-ngram Jaccard: hand-computed values, superset of the LSH pairs") {
    // grams(3) of abcdef={abc,bcd,cde,def}, abcdeg={abc,bcd,cde,deg}:
    // inter 3, union 5 -> J=0.6; "zzzzzz" shares nothing
    val df = Seq((1L, "abcdef"), (2L, "abcdeg"), (3L, "zzzzzz")).toDF("id", "t")
    val exact = Dedup.charNgramJaccardExactPairs(df, "id", "t", n = 3,
      threshold = 0.5).collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq((1L, 2L, 0.6)))
    // short text (< n) collapses to a whole-text gram, same as charNgrams
    val short = Seq((1L, "ab"), (2L, "ab"), (3L, "cd")).toDF("id", "t")
    val sp = Dedup.charNgramJaccardExactPairs(short, "id", "t", n = 3,
      threshold = 0.5).collect()
    assert(sp.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq((1L, 2L, 1.0)))
    // completeness: exact finds every pair the banded LSH variant finds
    // (LSH output is exact-verified, so it is a subset by construction)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lsh = Dedup.charNgramJaccardPairs(docs, "doc_id", "text",
      n = 12, threshold = 0.4, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ex = Dedup.charNgramJaccardExactPairs(docs, "doc_id", "text",
      n = 12, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(ex), s"LSH found pairs exact missed: ${lsh -- ex}")
    assert(ex.nonEmpty)
    // maxDf cap keeps output a subset of the uncapped exact result
    val capped = Dedup.charNgramJaccardExactPairs(docs, "doc_id", "text",
      n = 12, threshold = 0.4, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped.subsetOf(ex))
  }

  test("exact ngram-Jaccard stays exact with a gram planted in every document") {
    // every document shares one template prefix — its grams have df =
    // #docs, the worst skew shape (with the old df window this pinned the
    // whole corpus's exploded rows into ONE task; the groupBy+join path
    // collapses the hot gram map-side). Values must still be exact, so
    // compare against a brute-force Jaccard over Scala-computed gram sets.
    val n = 4
    val docs = (1 to 120).map { i =>
      (i.toLong, f"SHARED-TEMPLATE-HEADER uniq$i%03d tail${i * 7919}%d")
    }
    def grams(s: String): Set[String] =
      if (s.length < n) Set(s) else s.sliding(n).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      ga = grams(ta); gb = grams(tb)
      j = ga.intersect(gb).size.toDouble / ga.union(gb).size
      jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (ia, ib, jr)).toSet
    assert(expected.nonEmpty, "test shape must produce qualifying pairs")
    val out = Dedup.charNgramJaccardExactPairs(
      docs.toDF("id", "t"), "id", "t", n = n, threshold = 0.5)
    assert(!out.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(gh#"),
      "hot-gram df must not route through a single-task window partition")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("token chunking: overlapping windows cover every token, short docs intact") {
    import graft.operators.TextQuality
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y")                  // shorter than one window
    ).toDF("doc_id", "text")
    val chunks = TextQuality.chunkTokens(docs, "doc_id", "text",
      window = 4, overlap = 1).orderBy("id", "chunk_idx").collect()
    val doc1 = chunks.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 3: ceil((10-1)/3)=3 chunks starting at tokens 1,4,7
    assert(doc1.toSeq === Seq(
      (0L, "a b c d", 4L), (1L, "d e f g", 4L), (2L, "g h i j", 4L)))
    val doc2 = chunks.filter(_.getLong(0) == 2L)
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(doc2.toSeq === Seq((0L, "x y", 2L)))
    // every source token appears in some chunk
    assert(doc1.flatMap(_._2.split(" ")).toSet === "abcdefghij".map(_.toString).toSet)
  }

  test("repetition metrics: degenerate doc scores high, varied doc low") {
    import graft.operators.TextQuality
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),  // 5 bigrams, all identical
      (2L, "one two three four five six"),    // all bigrams distinct
      (3L, "ab")                              // < 2 words: whole-text shingle
    ).toDF("doc_id", "text")
    val m = TextQuality.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert((m(0).getDouble(1), m(0).getDouble(2)) === ((1.0, 0.75)))
    assert((m(1).getDouble(1), m(1).getDouble(2)) === ((0.2, 0.0)))
    assert((m(2).getDouble(1), m(2).getDouble(2)) === ((1.0, 0.0)))
  }

  test("ngram contamination finds planted benchmark overlap, corpus side never shuffles") {
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val bench = Seq((100L, benchText)).toDF("id", "t")
    val corpus = Seq(
      (1L, "completely unrelated text about cooking pasta with fresh tomatoes basil"),
      (2L, s"prefix then $benchText and a suffix"), // contains the benchmark verbatim
      (3L, benchText.replace("fox", "cat"))          // near-copy, still heavy overlap
    ).toDF("id", "t")
    val hits = Dedup.ngramContamination(corpus, "id", "t", bench, "id", "t",
      n = 12, minShared = 8).orderBy("corpus_id").collect()
    assert(hits.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(hits.forall(_.getLong(1) === 100L))
    assert(hits.forall(_.getLong(2) >= 8L))
    // scale shape: the benchmark gram index broadcasts
    val plan = Dedup.ngramContamination(corpus, "id", "t", bench, "id", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the benchmark side must broadcast:\n${plan.take(1200)}")
    // ... and the candidate probe runs on the 8-byte gram hash, not the
    // gram string (the string join exists only in the verify pass, which
    // is semi-join-bounded to candidate docs)
    assert("""BroadcastHashJoin \[gh#""".r.findFirstIn(plan).isDefined,
      s"candidate join must key on the gram hash:\n${plan.take(1500)}")
    // stop-gram hatch: grams shared by docs 2 AND 3 (df=2) drop at
    // maxDf=1, so doc 3 (whose every bench overlap is df-2) falls below
    // minShared while doc 2 survives on its df-1 grams (the ones spanning
    // "fox", which doc 3's cat-substitution lacks) with a smaller count
    val capped = Dedup.ngramContamination(corpus, "id", "t", bench, "id", "t",
      n = 12, minShared = 8, maxDf = 1).collect()
    assert(capped.map(_.getLong(0)).toSeq === Seq(2L),
      s"maxDf=1 must drop doc 3's df-2 overlap: ${capped.toSeq}")
    assert(capped(0).getLong(2) < hits(0).getLong(2),
      "the capped shared count must shrink")
  }

  test("contamination against a persisted index matches the batch operator exactly") {
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val bench = Seq((100L, benchText),
      (200L, "completely different benchmark prompt about solving equations step by step")
    ).toDF("id", "t")
    val corpus = Seq(
      (1L, "unrelated text about cooking pasta with fresh tomatoes and basil leaves"),
      (2L, s"prefix then $benchText and a suffix"),
      (3L, benchText.replace("fox", "cat")),
      (4L, "students keep solving equations step by step until the answers converge")
    ).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-cidx").toString
    Dedup.benchmarkGramIndex(bench, "id", "t", n = 12)
      .write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val incr = Dedup.contaminationAgainstIndex(corpus, "id", "t", idx,
      n = 12, minShared = 8).orderBy("corpus_id", "bench_id").collect()
    val batch = Dedup.ngramContamination(corpus, "id", "t", bench, "id", "t",
      n = 12, minShared = 8).orderBy("corpus_id", "bench_id").collect()
    assert(incr.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(incr.nonEmpty, "the planted overlaps must surface")
    // stateless screening: a second "batch" sees only its own hits, and
    // the index needs no rebuild between batches
    val batch2 = Seq((9L, s"new arrival quoting $benchText verbatim"),
      (10L, "benign new arrival")).toDF("id", "t")
    val hits2 = Dedup.contaminationAgainstIndex(batch2, "id", "t", idx,
      n = 12, minShared = 8).collect()
    assert(hits2.map(_.getLong(0)).toSeq === Seq(9L))
    // scale shape: both passes broadcast the index; the probe keys on the
    // 8-byte hash so no corpus gram string exists before the verify pass
    val plan = Dedup.contaminationAgainstIndex(corpus, "id", "t", idx)
      .queryExecution.executedPlan.toString
    assert("""BroadcastHashJoin \[gh#""".r.findFirstIn(plan).isDefined,
      s"candidate probe must broadcast-join on the gram hash:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the screen may shuffle-join:\n${plan.take(1500)}")
  }

  test("connected components: star graphs, multi-round chains, multiple components") {
    // every graph resolves through BOTH paths — driver union-find (the
    // small-graph short-circuit) and the distributed star contraction
    // (localLimit = 0) — and they must agree exactly
    def ccBoth(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val local = Dedup.connectedComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = Dedup.connectedComponents(pairs, localLimit = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local === dist, "local union-find and star contraction must agree")
      local
    }
    // star centered on the LARGEST id: pair-drop would keep BOTH leaves
    // (neither 1 nor 2 is ever a pair's larger member) — component
    // resolution keeps exactly the min
    val cc = ccBoth(Seq((1L, 5L), (2L, 5L)).toDF("id_a", "id_b"))
    assert(cc === Set((1L, 1L), (2L, 1L), (5L, 1L)))
    val pairDropSurvivors = Set(1L, 2L) // ids never appearing as id_b
    val ccSurvivors = cc.collect { case (id, comp) if id == comp => id }
    assert(ccSurvivors === Set(1L))
    assert(ccSurvivors !== pairDropSurvivors)
    // a 64-node chain forces several contraction rounds
    val comps = ccBoth((1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b"))
    assert(comps.size === 64 && comps.forall(_._2 === 1L))
    // independent components stay independent
    val m = ccBoth(Seq((10L, 20L), (20L, 30L), (100L, 200L)).toDF("id_a", "id_b")).toMap
    assert(m === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      100L -> 100L, 200L -> 100L))
    // an id appearing ONLY in self-pairs has no edge but is still its own
    // singleton component — both paths must emit it, not drop it
    val selfs = ccBoth(Seq((7L, 7L), (1L, 2L)).toDF("id_a", "id_b")).toMap
    assert(selfs === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("incremental connected components equals batch CC over all edges seen") {
    // Fold batches through componentsWithHistory; after every batch the
    // assignment must equal connectedComponents over the UNION of edges
    // so far. Batches are chosen to exercise every merge direction:
    //   b1: two separate components {1,5}, {10,20}
    //   b2: a NEW smaller id (0) joins {1,5} (new id wins the min);
    //       a chain edge merges {10,20} with a new id 30
    //   b3: a bridge merges the two surviving components into one
    val batches = Seq(
      Seq((1L, 5L), (10L, 20L)),
      Seq((0L, 5L), (20L, 30L)),
      Seq((5L, 30L)))
    var history = spark.emptyDataset[(Long, Long)].toDF("id", "component")
    var sofar = Seq.empty[(Long, Long)]
    for ((b, i) <- batches.zipWithIndex) {
      sofar ++= b
      history = Dedup.componentsWithHistory(
        b.toDF("id_a", "id_b"), history)
      val got = history.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Dedup.connectedComponents(sofar.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"after batch $i")
      // one row per id — the history rewrite must never duplicate
      assert(history.groupBy("id").count().filter(col("count") > 1).count() === 0)
    }
    assert(history.collect().map(r => r.getLong(1)).toSet === Set(0L),
      "final graph is one component rooted at the new minimum 0")
    // scale shape: the history update is a broadcast-hash join — the
    // corpus-sized assignment side must never shuffle for the rewrite
    val plan = Dedup.componentsWithHistory(
      Seq((5L, 30L)).toDF("id_a", "id_b"), history)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"change-map application must broadcast:\n${plan.take(1500)}")
  }

  test("hash64 against history: exact recall at hamming<=3, history text untouched") {
    // planted signatures: h2 = h1 with 3 bits flipped ACROSS three
    // different 16-bit blocks (the worst case a single-prefix bucketing
    // misses), h3 far from both
    val h1 = 0x1234_5678_9abc_def0L
    val h2 = h1 ^ (1L << 3) ^ (1L << 20) ^ (1L << 50)
    val h3 = ~h1
    val history = Seq((1L, h1), (2L, h3)).toDF("doc_id", "sh")
    val batch = Seq((10L, h2), (11L, 0x0f0f_0f0f_0f0f_0f0fL)).toDF("doc_id", "sh")
    val got = Dedup.hash64AgainstHistory(batch, history)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((10L, 1L, 3)))
    // brute-force exact-recall gate on pseudo-random signatures: every
    // cross-batch pair at hamming<=3 MUST be found (Manku guarantee),
    // none above the budget may appear
    val rnd = new scala.util.Random(42)
    val hist2 = (0L until 40L).map(i => (i, rnd.nextLong()))
    val bat2 = hist2.take(12).map { case (i, h) =>
      // flip 0..5 bits of an existing signature
      val flips = (0 until (i % 6).toInt).map(k => 1L << ((i * 7 + k * 13) % 64))
      (100L + i, flips.foldLeft(h)(_ ^ _))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val want = (for {
      (bi, bh) <- bat2; (hi, hh) <- hist2 if ham(bh, hh) <= 3
    } yield (bi, hi)).toSet
    val found = Dedup.hash64AgainstHistory(
      bat2.toDF("doc_id", "sh"), hist2.toDF("doc_id", "sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(found), s"missed pairs: ${want -- found}")
    assert(found.forall { case (b, h) =>
      ham(bat2.toMap.apply(b), hist2.toMap.apply(h)) <= 3 })
    // the text path composes: a later batch's near-identical doc is
    // flagged against a simhashIndex history without re-reading its text
    val base = "spark is a distributed engine for large scale data processing with catalyst"
    val idx = Dedup.simhashIndex(Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text")
    val flagged = Dedup.hash64AgainstHistory(
      Dedup.simhashIndex(Seq((7L, base.replace("large", "big")),
        (8L, "cooking pasta requires boiling salted water and fresh tomatoes"))
        .toDF("doc_id", "text"), "doc_id", "text"),
      idx, maxHamming = 16)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(7L))
  }

  test("hash64 history cap: truncation exposure is countable, uncapped recall restores") {
    // 6 exact dupes share one signature in history — a maxBucket below 6
    // truncates their (block, key) buckets and CAN drop true matches
    // (the documented RECALL CAVEAT); the diagnostic must surface it
    val h = 0x1234_5678_9abc_def0L
    val history = (1L to 6L).map(i => (i, h)).toDF("doc_id", "sh")
    val batch = Seq((10L, h ^ 1L)).toDF("doc_id", "sh")
    // the batch sig flips a bit in block 0, so 3 of its 4 (block, key)
    // probes land on the hot history buckets — all 3 exceed the cap
    assert(Dedup.hash64HistoryOversizedBuckets(batch, history, maxBucket = 4) === 3L,
      "the 3 probed blocks of the hot signature exceed the cap")
    assert(Dedup.hash64HistoryOversizedBuckets(batch, history, maxBucket = 6) === 0L)
    assert(Dedup.hash64HistoryOversizedBuckets(batch, history, maxBucket = 0) === 0L)
    // unprobed history buckets don't count: a far-away signature's
    // buckets never meet the batch
    val far = history.union(Seq((7L, ~h), (8L, ~h), (9L, ~h), (11L, ~h),
      (12L, ~h)).toDF("doc_id", "sh"))
    assert(Dedup.hash64HistoryOversizedBuckets(batch, far, maxBucket = 4) === 3L)
    // capped run still finds the pair via the surviving lowest hist_ids;
    // uncapped returns every witness
    val capped = Dedup.hash64AgainstHistory(batch, history, maxBucket = 4)
      .collect().map(_.getLong(1)).toSet
    assert(capped === Set(1L, 2L, 3L, 4L))
    val uncapped = Dedup.hash64AgainstHistory(batch, history, maxBucket = 0)
      .collect().map(_.getLong(1)).toSet
    assert(uncapped === (1L to 6L).toSet)
  }

  test("transitive minhash dedup keeps one row per similarity component") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base), (2L, base + "!"), (5L, base + " twice"),
      (9L, "completely different text about spark catalyst plans and delta logs"))
      .toDF("doc_id", "text")
    val kept = Dedup.minhashLshDedup(df, "doc_id", "text",
      threshold = 0.3, k = 16, bands = 16, transitive = true)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(1L, 9L))
  }

  test("portable-hash minhash LSH catches planted near-dups, misses " +
    "nothing the production family catches on identical text, and every " +
    "emitted pair clears the verified-Jaccard threshold") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base), (2L, base + " tail"), (3L, base),
      (9L, "completely different text about spark catalyst plans and logs"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairsPortable(df, "doc_id", "text",
      threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // identical docs share every band key — the pair is guaranteed
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) === 1.0)
    assert(pairs.contains((1L, 2L)), "planted near-dup must bucket together")
    assert(pairs.keys.forall { case (a, b) => a < b })
    assert(pairs.values.forall(_ >= 0.3),
      "every emitted pair is Jaccard-verified")
    assert(!pairs.keySet.exists(p => p._1 == 9L || p._2 == 9L),
      "the unrelated doc must not pair")
  }

  test("portable poly-simhash: hand-computed single-token signature, " +
    "planted near-dups pair, unrelated text does not") {
    // one token "ab": h1 = (0*31+97)*31+98 = 3105 under both moduli, so
    // h = 3105*2^31 + 3105; with a single token every set bit votes +1
    // and every clear bit -1 -> the signature IS h
    val one = Seq((1L, "ab")).toDF("doc_id", "text")
    val sig = one.select(graft.functions.FusedMinHashFunctions
      .polySimhash(col("text"), 2147483647L, 1073741789L)).head.getLong(0)
    assert(sig === 3105L * 2147483648L + 3105L)
    val base = "spark is a distributed engine for large scale data " +
      "processing with catalyst and tungsten under the hood"
    val near = base.replace("large", "big")
    val far = "cooking pasta requires boiling salted water and fresh " +
      "tomatoes every time without exception in any kitchen"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairsPortable(df, "doc_id", "text",
      maxHamming = 16).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // Hamming <= 3 pigeonhole exactness holds for the portable family
    // too (hash64Pairs' 4 disjoint blocks — hash-independent): pair set
    // equals the brute-force set over the portable signatures
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(150)
    val sigs = docs.select(col("doc_id"),
      graft.functions.FusedMinHashFunctions
        .polySimhash(col("text"), 2147483647L, 1073741789L).as("sh"))
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairsPortable(docs, "doc_id", "text",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute,
      s"4-block bucketing must be EXACT at Hamming <= 3: " +
        s"missing=${(brute -- banded).take(3)} extra=${(banded -- brute).take(3)}")
  }

  test("simhash pairs finds near duplicates within hamming budget") {
    val base = "spark is a distributed engine for large scale data processing with catalyst"
    val near = base.replace("large", "big")
    val far = "cooking pasta requires boiling salted water and fresh tomatoes every time"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash pairs differing ONLY in the top 16 bits are found at maxHamming=3") {
    // A single-table bucketing on the top-16-bit prefix can never pair two
    // docs whose differing bits all sit in that prefix; the 4-block layout
    // must. Search token variants for a pair whose hamming is 1..3 with
    // every differing bit in bits 48..63 (deterministic: fixed hashes).
    val baseTokens = (0 until 200).map(i => s"tok$i")
    val variants = (0 until 2000).map(j => (j.toLong, baseTokens.updated(0, s"w$j")))
    val all = ((-1L, baseTokens)) +: variants
    val df = all.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
    val hashes = df.select($"doc_id",
      graft.functions.SimHashFunctions.simhash(TextFunctions.tokens($"text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hBase = hashes(-1L)
    val hit = variants.map(_._1).find { j =>
      val d = hashes(j) ^ hBase
      val hm = java.lang.Long.bitCount(d)
      hm >= 1 && hm <= 3 && (d >>> 48) << 48 == d // all diffs in bits 48..63
    }
    assert(hit.nonEmpty, "no top-16-bit-only variant among 2000 — widen the search")
    val pair = df.filter($"doc_id".isin(-1L, hit.get))
    val found = Dedup.simhashPairs(pair, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === Set((-1L, hit.get)))
  }

  test("hash64PairsWide: combination keys stay exact at Hamming <= 3 and " +
    "reproduce the 4-block pair set (wide == narrow law)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(150)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both layouts are EXACT for Hamming <= 3 under uncapped buckets, so
    // their verified pair sets must be identical — different keys, same
    // answer (the law that makes the wide variant a drop-in)
    val narrow = pairSet(Dedup.simhashPairsPortable(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 0))
    val wide = pairSet(Dedup.simhashPairsPortableWide(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 0))
    assert(wide === narrow,
      s"wide/narrow pair sets must match: missing=${(narrow -- wide).take(3)} " +
        s"extra=${(wide -- narrow).take(3)}")
    // a pair whose 3 differing bits land in three DIFFERENT 11-bit
    // windows (bits 0, 12, 23 -> windows 0, 1, 2): the intact 3-of-6
    // combination {3,4,5} must pair them
    val sigs = Seq((1L, 0L), (2L, (1L << 0) | (1L << 12) | (1L << 23)))
      .toDF("id", "sh")
    val found = Dedup.hash64PairsWide(sigs, "id", "sh", maxHamming = 3)
      .collect()
    assert(found.length === 1 &&
      found.head.getAs[Int]("hamming") === 3, found.mkString("|"))
    // validation: the construction needs maxHamming < blocks
    intercept[IllegalArgumentException](
      Dedup.hash64PairsWide(sigs, "id", "sh", maxHamming = 6, blocks = 6))
    intercept[IllegalArgumentException](
      Dedup.hash64PairsWide(sigs, "id", "sh", maxHamming = 0))
  }

  test("hash64AgainstHistoryWide: the wide probe finds exactly the narrow " +
    "probe's pairs from the SAME unmodified history (keys derive at " +
    "probe time — no rebuild)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = Dedup.simhashIndex(docs.filter($"doc_id" >= 100), "doc_id", "text")
    val batch = Dedup.simhashIndex(docs.filter($"doc_id" < 100), "doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    val narrow = pairs(Dedup.hash64AgainstHistory(batch, hist,
      maxHamming = 3, maxBucket = 0))
    val wide = pairs(Dedup.hash64AgainstHistoryWide(batch, hist,
      maxHamming = 3, maxBucket = 0))
    assert(narrow.nonEmpty, "the template corpus must produce history hits")
    assert(wide === narrow,
      s"wide/narrow probe results must match: " +
        s"missing=${(narrow -- wide).take(3)} extra=${(wide -- narrow).take(3)}")
  }

  test("hash64 auto keying: the measured selector picks narrow below the " +
    "crossover and wide above it, and auto == chosen layout bit-for-bit " +
    "on BOTH sides (pairs and history probe)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    // BELOW the crossover: spread signatures — every narrow 16-bit
    // bucket is near-singleton, so candidates ~ 0 on both layouts and
    // the 4-keys/doc narrow layout wins on key rows alone
    val spread = (0 until 200).map(i =>
      (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)).toDF("id", "sh")
    val below = Dedup.hash64PairsAuto(spread, "id", "sh", maxBucket = 0)
    assert(!below.decision.useWide, below.decision.toString)
    assert(below.decision.narrowKeyRows === 4L * 200 &&
      below.decision.wideKeyRows === 20L * 200)
    assert(pairs(below.result) ===
      pairs(Dedup.hash64Pairs(spread, "id", "sh", maxBucket = 0)))
    // ABOVE the crossover: saturate ONE narrow block (low 16 bits
    // constant) while the upper 48 bits vary far apart — the narrow
    // (block 0) bucket goes quadratic (~N²/2 candidates) while every
    // wide 3-of-6 combination key still includes a varying window
    val flooded = (0 until 200).map(i =>
      (i.toLong, (i.toLong * 0x9E3779B97F4A7C15L) << 16)).toDF("id", "sh")
    val above = Dedup.hash64PairsAuto(flooded, "id", "sh", maxBucket = 0)
    assert(above.decision.useWide, above.decision.toString)
    assert(above.decision.narrowCandidates >= 200L * 199 / 2,
      above.decision.toString)
    assert(pairs(above.result) ===
      pairs(Dedup.hash64PairsWide(flooded, "id", "sh", maxBucket = 0)))
    // the same two regimes through the HISTORY probe (one history, the
    // selector only changes probe-time keying)
    val batchS = spread.filter($"id" < 50)
    val histS = spread.filter($"id" >= 50)
      .select($"id".as("doc_id"), $"sh")
    val hBelow = Dedup.hash64AgainstHistoryAuto(
      batchS.select($"id".as("doc_id"), $"sh"), histS, maxBucket = 0)
    assert(!hBelow.decision.useWide, hBelow.decision.toString)
    assert(pairs(hBelow.result) === pairs(Dedup.hash64AgainstHistory(
      batchS.select($"id".as("doc_id"), $"sh"), histS, maxBucket = 0)))
    val batchF = flooded.filter($"id" < 50).select($"id".as("doc_id"), $"sh")
    val histF = flooded.filter($"id" >= 50).select($"id".as("doc_id"), $"sh")
    val hAbove = Dedup.hash64AgainstHistoryAuto(batchF, histF, maxBucket = 0)
    assert(hAbove.decision.useWide, hAbove.decision.toString)
    assert(hAbove.decision.narrowCandidates >= 50L * 150,
      hAbove.decision.toString)
    assert(pairs(hAbove.result) === pairs(Dedup.hash64AgainstHistoryWide(
      batchF, histF, maxBucket = 0)))
    // the selection is a performance choice, never a semantics choice:
    // outside the shared exact-recall domain it refuses
    intercept[IllegalArgumentException](
      Dedup.hash64PairsLayoutDecision(spread, "sh", maxHamming = 6))
    intercept[IllegalArgumentException](
      Dedup.hash64HistoryLayoutDecision(batchS, histS, maxHamming = 4))
  }

  test("hash64 layout decisions ride StageMetadata into the observer's " +
    "stage-end metadata (repeated keys suffixed, drain clears)") {
    graft.core.StageMetadata.drain() // isolate from earlier operators
    val spread = (0 until 50).map(i =>
      (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)).toDF("id", "sh")
    Dedup.hash64PairsAuto(spread, "id", "sh", maxBucket = 0)
    Dedup.hash64PairsAuto(spread, "id", "sh", maxBucket = 0)
    val md = graft.core.StageMetadata.drain()
    assert(md.contains("hash64_layout") && md.contains("hash64_layout#1"),
      md.toString)
    assert(md("hash64_layout").contains("op=hash64PairsAuto") &&
      md("hash64_layout").contains("chosen=narrow"), md.toString)
    assert(graft.core.StageMetadata.drain().isEmpty,
      "drain must clear the buffer")
  }

  test("hash64 counts LAW: incrementally folded bucket counts equal the " +
    "fresh measurement bit-for-bit on the real corpus, and the counted " +
    "decision equals the measured decision on both crossover sides") {
    import graft.operators.Hash64Counts
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = docs.select($"doc_id",
      graft.functions.FusedMinHashFunctions
        .polySimhash($"text", 2147483647L, 1073741789L).as("sh"))
      .localCheckpoint()
    val hist = sigs.filter($"doc_id" >= 100)
    val batch = sigs.filter($"doc_id" < 100)
    withTmpDir { tmp =>
      val cd = s"$tmp/counts"
      // fold the history in three uneven increments (the associative
      // fold the design claims: per-batch counts of an append-only
      // table sum to the fresh measurement EXACTLY)
      Seq($"doc_id" % 3 === 0, $"doc_id" % 3 === 1, $"doc_id" % 3 === 2)
        .foreach(p => Hash64Counts.fold(spark, cd, hist.filter(p), "sh"))
      def ms(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getInt(1),
          Option(r.get(2)).map(_.toString).getOrElse("NULL"), r.getLong(3)))
        .toSeq.sorted
      assert(ms(Hash64Counts.read(spark, cd)
          .select("layout", "b", "k", "cnt")) ===
        ms(Hash64Counts.bucketCounts(hist, "sh", 6, 3)
          .select("layout", "b", "k", "cnt")),
        "incremental counts must equal fresh-measured counts bit-for-bit")
      assert(Hash64Counts.foldedRows(
        spark.sparkContext.hadoopConfiguration, cd) === Some(hist.count()))
      // the counted decision == the measured decision, exactly (it is
      // the same argmin over the same exact integer volumes)
      assert(Hash64Counts.decision(batch, Hash64Counts.read(spark, cd),
          "sh") ===
        Dedup.hash64HistoryLayoutDecision(batch, hist))
    }
    // both crossover sides (the regimes from the auto-keying test)
    def side(mk: Long => Long): Unit = withTmpDir { tmp =>
      val all = (0 until 200).map(i => (i.toLong, mk(i.toLong)))
        .toDF("doc_id", "sh")
      val (b, h) = (all.filter($"doc_id" < 50), all.filter($"doc_id" >= 50))
      val cd = s"$tmp/c"
      graft.operators.Hash64Counts.fold(spark, cd, h, "sh")
      assert(graft.operators.Hash64Counts.decision(b,
          graft.operators.Hash64Counts.read(spark, cd), "sh") ===
        Dedup.hash64HistoryLayoutDecision(b, h))
    }
    side(i => i * 0x9E3779B97F4A7C15L)         // spread → narrow wins
    side(i => (i * 0x9E3779B97F4A7C15L) << 16) // flooded → wide wins
  }

  test("hash64 counts tripwire: stale-behind, stale-ahead, and parameter " +
    "mismatches are detected and healed by a lossless rebuild; chunk " +
    "lists auto-compact") {
    import graft.operators.Hash64Counts
    val conf = spark.sparkContext.hadoopConfiguration
    val sigs = (0 until 300).map(i =>
      (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)).toDF("doc_id", "sh")
      .localCheckpoint()
    val half = sigs.filter($"doc_id" < 150)
    withTmpDir { tmp =>
      val cd = s"$tmp/c"
      // BEHIND: counts cover half, the history grew without a fold
      // (the crash window between a signature append and the counts
      // fold) — ensure detects the row-count mismatch and rebuilds
      Hash64Counts.fold(spark, cd, half, "sh")
      def ms(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(_.toSeq).toSet
      // collect EAGERLY: later heals prune the chunk files this plan
      // reads, so a lazy re-collect would chase deleted paths
      val healed = ms(Hash64Counts.ensure(spark, cd, sigs, "sh"))
      assert(Hash64Counts.foldedRows(conf, cd) === Some(300L))
      assert(healed === ms(Hash64Counts.bucketCounts(sigs, "sh", 6, 3)))
      // AHEAD: counts were folded but the fold crashed before its state
      // commit (replay re-runs against the OLD history) — same heal
      Hash64Counts.fold(spark, cd, half, "sh") // now n = 450, stale-ahead
      assert(ms(Hash64Counts.ensure(spark, cd, sigs, "sh")) === healed)
      assert(Hash64Counts.foldedRows(conf, cd) === Some(300L))
      // a CONSISTENT cache is left alone (same chunk list before/after)
      val seqBefore = Hash64Counts.foldedRows(conf, cd)
      Hash64Counts.ensure(spark, cd, sigs, "sh")
      assert(Hash64Counts.foldedRows(conf, cd) === seqBefore)
      // PARAMETER mismatch: wide keys under a different blocks/
      // maxHamming are a different derivation — EVERY surface refuses
      // loudly (a silent rebuild would let alternating callers thrash
      // full-history scans and clobber the production cache)
      val e = intercept[IllegalArgumentException](
        Hash64Counts.fold(spark, cd, half, "sh", blocks = 8))
      assert(e.getMessage.contains("blocks"), e.getMessage)
      intercept[IllegalArgumentException](
        Hash64Counts.ensure(spark, cd, sigs, "sh", blocks = 8,
          maxHamming = 2))
      intercept[IllegalArgumentException](
        Hash64Counts.decideAndFold(spark, cd, half, sigs, "sh",
          blocks = 8, maxHamming = 2))
      // LOST CHUNK: a listed chunk missing on disk is an inconsistency —
      // the heal paths rebuild losslessly, the bare read refuses with
      // the remedy (it has no history to rebuild from)
      val chunkDir = new java.io.File(cd).list().toSeq
        .filter(_.matches("[cm]\\d+")).head
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$cd/$chunkDir"))
      val e2 = intercept[IllegalStateException](
        Hash64Counts.read(spark, cd))
      assert(e2.getMessage.contains("missing on disk"), e2.getMessage)
      assert(ms(Hash64Counts.ensure(spark, cd, sigs, "sh")) === healed)
    }
    withTmpDir { tmp =>
      // OWNERSHIP: the heal paths must never stamp over a directory
      // that is some OTHER format's table (the classic misuse: pointing
      // countsDir at the signature index itself) or unmarked data
      val conf2 = spark.sparkContext.hadoopConfiguration
      val idx = s"$tmp/sigidx"
      sigs.write.mode("overwrite").parquet(idx)
      graft.state.HistoryFormat.stamp(conf2, idx,
        graft.state.HistoryFormat.Hash64Signature)
      val e3 = intercept[IllegalStateException](
        Hash64Counts.ensure(spark, idx, sigs, "sh"))
      assert(e3.getMessage.contains("not a hash64 counts cache"),
        e3.getMessage)
      val raw = s"$tmp/rawdata"
      sigs.write.mode("overwrite").parquet(raw)
      val e4 = intercept[IllegalStateException](
        Hash64Counts.ensure(spark, raw, sigs, "sh"))
      assert(e4.getMessage.contains("no format marker"), e4.getMessage)
    }
    withTmpDir { tmp =>
      val cd = s"$tmp/c"
      // auto-compaction: 17 one-row folds must collapse the chunk list
      // (read cost stays bounded) without changing the sums
      (0 until 17).foreach(i =>
        Hash64Counts.fold(spark, cd, sigs.filter($"doc_id" === i), "sh"))
      val chunkDirs = new java.io.File(cd).list().toSeq
        .filter(_.matches("[cm]\\d+"))
      assert(chunkDirs.size === 1, s"expected one compacted chunk: $chunkDirs")
      assert(Hash64Counts.read(spark, cd).collect().map(_.toSeq).toSet ===
        Hash64Counts.bucketCounts(sigs.filter($"doc_id" < 17), "sh", 6, 3)
          .collect().map(_.toSeq).toSet)
      assert(Hash64Counts.foldedRows(conf, cd) === Some(17L))
    }
  }

  test("nearDupWideSimhashFamily(countsDir): the counted fold equals the " +
    "uncounted auto fold and the pinned-wide fold on the real corpus, " +
    "and the counts state tracks the committed reps across folds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    def fold(pf: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
        probe: (org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame) =>
          org.apache.spark.sql.DataFrame): Seq[String] = {
      var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "n_chars")
      Seq(col("doc_id") < 250, col("doc_id") >= 250).foreach { p =>
        st = Dedup.nearDupCanonicalizeIncrement(docs.filter(p),
          "doc_id", "text", "n_chars", st._1, st._2, st._3, pf, probe)
        st = (st._1.localCheckpoint(), st._2.localCheckpoint(),
          st._3.localCheckpoint())
      }
      Dedup.nearDupResolution(st._1, st._2, st._3)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    }
    withTmpDir { tmp =>
      val cd = s"$tmp/counts"
      val sd = s"$tmp/sigs"
      // the FULL production instrumentation: measured selector reading
      // persisted counts, probe reading persisted signatures
      val (cpf, cprobe) = Dedup.nearDupWideSimhashFamily(autoProbe = true,
        countsDir = Some(cd), sigCacheDir = Some(sd))
      val (pf, probe) = Dedup.nearDupWideSimhashFamily()
      val counted = fold(cpf, cprobe)
      assert(counted === fold(pf, probe),
        "fully-cached auto fold must equal the pinned-wide fold bit " +
          "for bit")
      // both caches tracked the reps: n == distinct texts folded
      val conf2 = spark.sparkContext.hadoopConfiguration
      val distinctTexts = docs.select("text").distinct().count()
      assert(graft.operators.Hash64Counts.foldedRows(conf2, cd) ===
        Some(distinctTexts))
      assert(graft.operators.SigCache.foldedRows(conf2, sd) ===
        Some(distinctTexts))
      // the persisted signatures ARE the derivation (multiset equality
      // against a fresh hash of the final reps is implied by the fold
      // equality above; pin the row count here and the derivation in
      // the SigCache test below)
      // countsDir without autoProbe is a construction error
      intercept[IllegalArgumentException](
        Dedup.nearDupWideSimhashFamily(countsDir = Some(cd)))
      // sig cache WITHOUT the selector: pinned-wide probe over
      // persisted signatures, same resolution
      val (spf, sprobe) = Dedup.nearDupWideSimhashFamily(
        sigCacheDir = Some(s"$tmp/sigs2"))
      assert(fold(spf, sprobe) === counted,
        "sig-cached pinned-wide fold must equal the others bit for bit")
    }
  }

  test("SigCache tripwire: incremental signatures equal the fresh " +
    "derivation; stale-behind/ahead heal losslessly; modulus mismatch " +
    "and foreign directories refuse") {
    import graft.operators.SigCache
    val conf = spark.sparkContext.hadoopConfiguration
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text").localCheckpoint()
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"id".as("doc_id"),
        graft.functions.FusedMinHashFunctions
          .polySimhash($"text", 2147483647L, 1073741789L).as("sh"))
    def ms(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view
        .mapValues(_.size).toMap
    withTmpDir { tmp =>
      val sd = s"$tmp/sigs"
      val h1 = docs.filter($"id" < 200)
      // fold in two increments through the per-fold surface
      val r1 = SigCache.ensureAndFold(spark, sd, h1.limit(0),
        sigsOf(h1.filter($"id" < 100)), 2147483647L, 1073741789L, 0L)
      assert(r1.count() === 0, "pre-fold view excludes the batch")
      val r2 = SigCache.ensureAndFold(spark, sd, h1.filter($"id" < 100),
        sigsOf(h1.filter($"id" >= 100)), 2147483647L, 1073741789L,
        h1.filter($"id" < 100).count())
      assert(ms(r2) === ms(sigsOf(h1.filter($"id" < 100))),
        "pre-fold view == signatures of the prior reps")
      // committed state == fresh derivation of everything folded
      assert(ms(SigCache.read(spark, sd)) === ms(sigsOf(h1)),
        "incremental signature cache must equal the fresh derivation")
      assert(SigCache.foldedRows(conf, sd) === Some(200L))
      // STALE-BEHIND (history grew without a fold): heals by
      // re-derivation, logged
      val all = docs
      val healed = SigCache.ensureAndFold(spark, sd, all,
        sigsOf(all.limit(0)), 2147483647L, 1073741789L, all.count())
      assert(ms(healed) === ms(sigsOf(all)))
      assert(SigCache.foldedRows(conf, sd) === Some(all.count()))
      // MODULUS mismatch refuses from every surface (never clobber)
      intercept[IllegalArgumentException](
        SigCache.ensureAndFold(spark, sd, all, sigsOf(all.limit(0)),
          7L, 11L, all.count()))
      // foreign directory refuses (never stamp over another table)
      val idx = s"$tmp/sigidx"
      sigsOf(docs).write.mode("overwrite").parquet(idx)
      graft.state.HistoryFormat.stamp(conf, idx,
        graft.state.HistoryFormat.Hash64Signature)
      val e = intercept[IllegalStateException](
        SigCache.ensureAndFold(spark, idx, all, sigsOf(all.limit(0)),
          2147483647L, 1073741789L, all.count()))
      assert(e.getMessage.contains("not a signature cache"), e.getMessage)
    }
  }

  test("cheap AHEAD heal LAW: a cache exactly a chunk-suffix ahead of " +
    "its source heals by suffix truncation (no re-derivation, the " +
    "structured event names it) and equals the full rebuild bit for " +
    "bit; a surplus that does not align on chunk boundaries falls back " +
    "to the lossless rebuild") {
    import graft.operators.{Hash64Counts, SigCache}
    val conf = spark.sparkContext.hadoopConfiguration
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text").filter($"id" < 300)
      .localCheckpoint()
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"id".as("doc_id"),
        graft.functions.FusedMinHashFunctions
          .polySimhash($"text", 2147483647L, 1073741789L).as("sh"))
    def ms(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view
        .mapValues(_.size).toMap
    graft.core.StageMetadata.drain() // isolate from earlier operators
    withTmpDir { tmp =>
      // --- SigCache: three committed chunks, then the replay window ---
      val sd = s"$tmp/sigs"
      Seq(0L, 100L, 200L).foreach { lo =>
        SigCache.ensureAndFold(spark, sd, docs.filter($"id" < lo),
          sigsOf(docs.filter($"id" >= lo && $"id" < lo + 100)),
          2147483647L, 1073741789L, lo)
      }
      assert(SigCache.foldedRows(conf, sd) === Some(300L))
      graft.core.StageMetadata.drain()
      // the crash window: the c3 chunk committed but the reps table's
      // own commit was lost — the replay re-delivers the 200..300 batch
      // against the 200-row committed reps
      val view = SigCache.ensureAndFold(spark, sd, docs.filter($"id" < 200),
        sigsOf(docs.filter($"id" >= 200)), 2147483647L, 1073741789L, 200L)
      val ev = graft.core.StageMetadata.drain()
      assert(ev.keys.exists(_.startsWith("sigcache_ahead_heal")),
        s"the aligned-ahead window must heal by truncation: $ev")
      assert(!ev.keys.exists(_.startsWith("sigcache_rebuild")),
        s"truncation must not re-derive from text: $ev")
      assert(ms(view) === ms(sigsOf(docs.filter($"id" < 200))),
        "the healed pre-fold view == signatures of the committed reps")
      // after the replay's re-append the cache equals the full rebuild
      assert(SigCache.foldedRows(conf, sd) === Some(300L))
      val sd2 = s"$tmp/sigs2"
      SigCache.rebuild(spark, sd2, docs, 2147483647L, 1073741789L)
      assert(ms(SigCache.read(spark, sd)) === ms(SigCache.read(spark, sd2)),
        "ahead-heal + re-append must equal the full rebuild bit for bit")
      // non-aligned surplus (mid-chunk count): falls back to rebuild
      SigCache.ensureAndFold(spark, sd, docs.filter($"id" < 250),
        sigsOf(docs.limit(0)), 2147483647L, 1073741789L, 250L)
      val ev2 = graft.core.StageMetadata.drain()
      assert(ev2.keys.exists(_.startsWith("sigcache_rebuild")),
        s"a non-chunk-aligned surplus is not the replay window: $ev2")
      assert(ms(SigCache.read(spark, sd)) ===
        ms(sigsOf(docs.filter($"id" < 250))))
      // an EMPTIED source against a non-empty cache is an out-of-band
      // reset, not the replay window: it must classify as a rebuild so
      // the event stream's ahead-heal-means-replay semantics stay honest
      SigCache.ensureAndFold(spark, sd, docs.limit(0),
        sigsOf(docs.limit(0)), 2147483647L, 1073741789L, 0L)
      val ev2b = graft.core.StageMetadata.drain()
      assert(ev2b.keys.exists(_.startsWith("sigcache_rebuild")) &&
        !ev2b.keys.exists(_.startsWith("sigcache_ahead_heal")),
        s"n=0 must never report as the benign ahead window: $ev2b")
      assert(SigCache.foldedRows(conf, sd) === Some(0L))

      // --- Hash64Counts: same law on the aggregated cache ---
      val cd = s"$tmp/counts"
      val sigs = sigsOf(docs).localCheckpoint()
      Seq(0L, 100L, 200L).foreach(lo => Hash64Counts.fold(spark, cd,
        sigs.filter($"doc_id" >= lo && $"doc_id" < lo + 100), "sh"))
      graft.core.StageMetadata.drain()
      val healed = Hash64Counts.ensure(spark, cd,
        sigs.filter($"doc_id" < 200), "sh").collect().map(_.toSeq).toSet
      val ev3 = graft.core.StageMetadata.drain()
      assert(ev3.keys.exists(_.startsWith("hash64_counts_ahead_heal")),
        s"the aligned-ahead window must heal by truncation: $ev3")
      assert(!ev3.keys.exists(_.startsWith("hash64_counts_rebuild")), ev3.toString)
      assert(healed === Hash64Counts
        .bucketCounts(sigs.filter($"doc_id" < 200), "sh", 6, 3)
        .collect().map(_.toSeq).toSet,
        "truncated counts must equal the fresh measurement bit for bit")
      assert(Hash64Counts.foldedRows(conf, cd) === Some(200L))
      // non-aligned surplus: rebuild
      Hash64Counts.ensure(spark, cd, sigs.filter($"doc_id" < 150), "sh")
      val ev4 = graft.core.StageMetadata.drain()
      assert(ev4.keys.exists(_.startsWith("hash64_counts_rebuild")),
        s"a non-chunk-aligned surplus is not the replay window: $ev4")
      assert(Hash64Counts.foldedRows(conf, cd) === Some(150L))
    }
  }

  test("degenerate corpus: LSH bucket cap bounds the self-comparison") {
    // 500 identical docs would make one quadratic bucket (124,750 pairs per
    // band); cap 50 truncates each bucket to its 50 smallest ids.
    val df = (0 until 500).map(i => (i.toLong, "the same text repeated verbatim"))
      .toDF("doc_id", "text")
    val minhash = Dedup.minhashLshPairs(df, "doc_id", "text",
      threshold = 0.9, maxBucket = 50).count()
    assert(minhash === 50L * 49 / 2)
    val simhash = Dedup.simhashPairs(df, "doc_id", "text",
      maxHamming = 3, maxBucket = 50).count()
    assert(simhash === 50L * 49 / 2)
    val vecs = (0 until 500).map(i => (i.toLong, Array(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val srp = Dedup.embeddingCosinePairsLsh(vecs, "vec_id", "embedding",
      threshold = 0.9, planes = 4, maxBucket = 50).count()
    assert(srp === 50L * 49 / 2)
    // the diagnostic sees the oversized bucket
    val bucketRows = df.select($"doc_id".as("id"), lit(0).as("bucket"))
    assert(Dedup.oversizedBuckets(bucketRows, Seq("bucket"), 50) === 1L)
    // cap disabled: every bucket is legal, diagnostic reports none
    assert(Dedup.oversizedBuckets(bucketRows, Seq("bucket"), 0) === 0L)
  }

  test("bucket membership is bounded BEFORE aggregation, not just pair output") {
    // the aggregation buffer itself must never hold more than maxBucket
    // members — the executor-OOM guard for hot buckets at scale
    val rows = (0 until 500).map(i => (i.toLong, 0)).toDF("id", "bucket")
    val bucketed = Dedup.boundedBuckets(rows, Seq("bucket"),
      collect_set($"id"), maxBucket = 50)
    val sizes = bucketed.select(max(size($"items"))).collect()(0).getInt(0)
    assert(sizes === 50)
    // deterministic truncation: the 50 smallest ids survive
    val kept = bucketed.select(explode($"items").as("id"))
      .collect().map(_.getLong(0)).sorted
    assert(kept === (0L until 50L).toArray)
    // disabled cap keeps everything
    val unbounded = Dedup.boundedBuckets(rows, Seq("bucket"),
      collect_set($"id"), maxBucket = 0)
    assert(unbounded.select(max(size($"items"))).collect()(0).getInt(0) === 500)
  }

  test("embedding LSH pairs on empty input returns empty, not a failed dims probe") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingCosinePairsLsh(empty, "vec_id", "embedding", 0.5).count() === 0)
    assert(Dedup.embeddingCosinePairsLsh(empty, "vec_id", "embedding", 0.5).columns.toSeq
      === Seq("id_a", "id_b", "cosine"))
  }

  test("semdedup on empty input returns empty with the pair contract") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val pairs = Dedup.semDedupPairs(empty, "vec_id", "embedding", 0.9, nlist = 4)
    assert(pairs.count() === 0)
    assert(pairs.columns.toSeq === Seq("id_a", "id_b", "cosine"))
    assert(Dedup.semDedup(empty, "vec_id", "embedding", 0.9, nlist = 4)
      .count() === 0)
  }

  // deterministic cheap pair function for the composed-op unit tests:
  // reps sharing a 4-char text prefix pair up
  private def prefixPairs(reps: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val a = reps.select(col("id").as("id_a"), substring(col("text"), 1, 4).as("k"))
    val b = reps.select(col("id").as("id_b"), substring(col("text"), 1, 4).as("k"))
    a.join(b, Seq("k")).filter(col("id_a") < col("id_b")).select("id_a", "id_b")
  }

  test("nearDupCanonicalize: exact groups collapse, clusters merge " +
    "transitively, canonical = argmax(quality, low id)") {
    val docs = Seq(
      (1L, "grp1 one", 5L), (2L, "grp1 one", 9L), // exact dups, q-best is 2
      (3L, "grp1 two", 7L),                       // near-dup of the group
      (4L, "grp2 solo", 1L),                      // singleton
      (5L, "grp3 a", 2L), (6L, "grp3 a", 2L)      // exact dups, q tie -> 5
    ).toDF("doc_id", "text", "q")
    val out = Dedup.nearDupCanonicalize(docs, "doc_id", "text", "q",
        prefixPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out === Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (4L, 4L, 4L, true),
      (5L, 5L, 5L, true), (6L, 5L, 5L, false)))
    // the materialize policy changes lineage only, never rows (the
    // pageRank checkpoint-policy law applied here)
    val plain = Dedup.nearDupCanonicalize(docs, "doc_id", "text", "q",
        prefixPairs, materialize = identity)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(plain === out)
  }

  test("nearDupCanonicalize: the pair stage sees one row per distinct " +
    "text (the Θ(g²) template-group collapse)") {
    // 40 docs, 4 distinct texts: raw pair emission over exact groups
    // would be Θ(10²) per group; the composed op must hand pairsOf
    // exactly 4 rows
    val docs = (1 to 40).map(i => (i.toLong, s"template ${i % 4}", 1L))
      .toDF("doc_id", "text", "q")
    var pairInputRows = -1L
    val counting: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame = reps => {
      pairInputRows = reps.count()
      prefixPairs(reps)
    }
    val out = Dedup.nearDupCanonicalize(docs, "doc_id", "text", "q", counting)
    assert(out.count() === 40)
    assert(pairInputRows === 4,
      s"pairsOf must see one rep per distinct text, saw $pairInputRows")
    // all 4 texts share the 'temp' prefix -> one cluster, canonical =
    // lowest id at tied quality
    assert(out.filter(col("keep")).collect().map(_.getLong(0)).toSeq
      === Seq(1L))
  }

  test("nearDupCanonicalize fold law: any batch split folds to the " +
    "one-shot resolution (crossPairsByUnion path)") {
    val docs = Seq(
      (1L, "grp1 one", 5L), (2L, "grp1 one", 9L), (3L, "grp1 two", 7L),
      (4L, "grp2 solo", 1L), (5L, "grp3 a", 2L), (6L, "grp3 a", 2L),
      (7L, "grp1 three", 3L), (8L, "grp2 other", 8L)
    ).toDF("doc_id", "text", "q")
    val oneShot = Dedup.nearDupCanonicalize(docs, "doc_id", "text", "q",
      prefixPairs).collect().map(_.toSeq).toSet
    // two different splits, including one where a LATER batch carries the
    // smaller ids (the representative of an already-seen text changes
    // between orders — resolution must not)
    val splits = Seq(
      Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L)),
      Seq(Seq(2L, 4L, 6L, 8L), Seq(7L, 5L), Seq(3L, 1L)))
    splits.foreach { batches =>
      var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "q")
      batches.foreach { ids =>
        st = Dedup.nearDupCanonicalizeIncrement(
          docs.filter(col("doc_id").isin(ids: _*)),
          "doc_id", "text", "q", st._1, st._2, st._3,
          prefixPairs, Dedup.crossPairsByUnion(prefixPairs))
        // the fold contract persists state between batches; localCheckpoint
        // stands in for the parquet round-trip without touching disk
        st = (st._1.localCheckpoint(), st._2.localCheckpoint(),
          st._3.localCheckpoint())
      }
      val folded = Dedup.nearDupResolution(st._1, st._2, st._3)
        .collect().map(_.toSeq).toSet
      assert(folded === oneShot, s"fold over $batches diverged")
      // state invariant: one rep per distinct text
      assert(st._2.count() === docs.select("text").distinct().count())
    }
  }

  test("nearDupCanonicalizeIncrement replay law: re-folding an already-" +
    "folded batch is a no-op (exactly-once replay tolerance)") {
    val docs = Seq(
      (1L, "grp1 one", 5L), (2L, "grp1 one", 9L), (3L, "grp1 two", 7L),
      (4L, "grp2 solo", 1L)
    ).toDF("doc_id", "text", "q")
    val b1 = docs.filter(col("doc_id") <= 2)
    val b2 = docs.filter(col("doc_id") > 2)
    def fold(st: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
        b: org.apache.spark.sql.DataFrame) = {
      val s = Dedup.nearDupCanonicalizeIncrement(b, "doc_id", "text", "q",
        st._1, st._2, st._3, prefixPairs,
        Dedup.crossPairsByUnion(prefixPairs))
      (s._1.localCheckpoint(), s._2.localCheckpoint(),
        s._3.localCheckpoint())
    }
    var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "q")
    st = fold(st, b1)
    st = fold(st, b1) // the replay — must change nothing
    st = fold(st, b2)
    st = fold(st, b2) // replay again, after other batches
    val res = Dedup.nearDupResolution(st._1, st._2, st._3)
      .collect().map(_.toSeq)
    assert(res.length === 4, s"replays must not duplicate rows: $res")
    assert(res.toSet === Dedup.nearDupCanonicalize(docs, "doc_id", "text",
      "q", prefixPairs).collect().map(_.toSeq).toSet)
    // a re-arriving id with DIFFERENT text is the same rule: first
    // write wins (ids are immutable), never a duplicate resolution row
    val mutated = Seq((1L, "grp9 changed", 99L)).toDF("doc_id", "text", "q")
    st = fold(st, mutated)
    assert(Dedup.nearDupResolution(st._1, st._2, st._3).count() === 4)
    // WITHIN one batch the same id collapses deterministically too (an
    // at-least-once source can duplicate inside a single delivery): one
    // resolution row, never two
    val dupBatch = Seq((9L, "grp8 a", 1L), (9L, "grp8 b", 2L))
      .toDF("doc_id", "text", "q")
    st = fold(st, dupBatch)
    val nine = Dedup.nearDupResolution(st._1, st._2, st._3)
      .filter(col("id") === 9L).collect()
    assert(nine.length === 1,
      s"in-batch duplicate ids must collapse: ${nine.toSeq}")
  }

  test("nearDupCanonicalize: NULL-text docs form one cluster, every doc " +
    "resolves, and the fold keeps exactly one NULL rep (NULL-safe fp)") {
    val docs = Seq(
      (1L, "grp1 one", 5L), (2L, "grp1 one", 9L),
      (3L, null.asInstanceOf[String], 4L),
      (4L, null.asInstanceOf[String], 7L),
      (5L, "grp2 solo", 1L)
    ).toDF("doc_id", "text", "q")
    val out = Dedup.nearDupCanonicalize(docs, "doc_id", "text", "q",
        prefixPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    // every doc resolves (a raw md5(NULL) fp would silently drop 3 and
    // 4 from the resolution's inner fp join); the NULL docs share ONE
    // exact-dup cluster whose canonical is the argmax(q) member
    assert(out === Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true),
      (3L, 3L, 4L, false), (4L, 3L, 4L, true),
      (5L, 5L, 5L, true)))
    def fold(st: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
        b: org.apache.spark.sql.DataFrame) = {
      val s = Dedup.nearDupCanonicalizeIncrement(b, "doc_id", "text", "q",
        st._1, st._2, st._3, prefixPairs,
        Dedup.crossPairsByUnion(prefixPairs))
      (s._1.localCheckpoint(), s._2.localCheckpoint(),
        s._3.localCheckpoint())
    }
    var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "q")
    st = fold(st, docs.filter(col("doc_id") <= 3))
    // batch 2 brings a NEW NULL-text id: the sentinel fp must match the
    // existing NULL rep (a raw NULL fp never anti-joins, so the rep
    // would be re-added every batch, breaking one-rep-per-fp)
    st = fold(st, docs.filter(col("doc_id") > 3))
    assert(st._2.filter(col("text").isNull).count() === 1,
      "exactly one NULL-text representative in state")
    st = fold(st, docs.filter(col("doc_id") > 3)) // exact replay
    assert(st._2.filter(col("text").isNull).count() === 1)
    assert(st._2.count() === 3, "one rep per distinct text incl. NULL")
    assert(Dedup.nearDupResolution(st._1, st._2, st._3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet === out,
      "fold over NULL-text batches must equal the one-shot")
  }

  test("nearDupWideSimhashFamily: the auto-probe variant folds to the " +
    "identical resolution on the real corpus (the selector may change " +
    "cost, never pairs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // MULTISET equality (sorted rows, not a Set): a duplicate resolution
    // row regression must fail this pin, not vanish into set collapse
    def fold(auto: Boolean): Seq[String] = {
      val (pf, probe) = Dedup.nearDupWideSimhashFamily(autoProbe = auto)
      var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "n_chars")
      Seq(col("doc_id") < 250, col("doc_id") >= 250).foreach { p =>
        st = Dedup.nearDupCanonicalizeIncrement(docs.filter(p),
          "doc_id", "text", "n_chars", st._1, st._2, st._3, pf, probe)
        st = (st._1.localCheckpoint(), st._2.localCheckpoint(),
          st._3.localCheckpoint())
      }
      Dedup.nearDupResolution(st._1, st._2, st._3)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    }
    assert(fold(auto = true) === fold(auto = false),
      "auto-probe fold must equal the pinned-wide fold bit for bit")
  }

  test("nearDupCanonicalize on the real corpus with a real pair operator " +
    "(wide simhash): fold == one-shot, total cover, unique canonicals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // the shared production family is cap-free by construction — the
    // fold law requires it (a capped operator truncates by id order,
    // and the fold's rep ids can differ from the one-shot's; with the
    // default cap this test would pass only while no sf0.001 bucket
    // happens to exceed 4096)
    val (pf, _) = Dedup.nearDupWideSimhashFamily()
    val oneShot = Dedup.nearDupCanonicalize(docs, "doc_id", "text",
      "n_chars", pf)
    val rows = oneShot.collect()
    assert(rows.length === docs.count(), "every doc resolves")
    // each cluster has exactly one keep row, and it is the argmax member
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (compId, members) =>
      assert(members.count(_.getBoolean(3)) === 1)
      assert(members.map(_.getLong(0)).min === compId,
        "component label must be the smallest member id")
      assert(members.map(_.getLong(2)).distinct.length === 1,
        "one canonical per cluster")
    }
    val twoBatch = {
      var st = Dedup.nearDupEmptyState(docs, "doc_id", "text", "n_chars")
      Seq(col("doc_id") < 250, col("doc_id") >= 250).foreach { p =>
        st = Dedup.nearDupCanonicalizeIncrement(docs.filter(p),
          "doc_id", "text", "n_chars", st._1, st._2, st._3,
          pf, Dedup.crossPairsByUnion(pf))
        st = (st._1.localCheckpoint(), st._2.localCheckpoint(),
          st._3.localCheckpoint())
      }
      Dedup.nearDupResolution(st._1, st._2, st._3)
    }
    assert(twoBatch.collect().map(_.toSeq).toSet
      === rows.map(_.toSeq).toSet,
      "two-batch fold must equal the one-shot resolution")
  }
}

class CurationSuite extends SparkSpec {
  import graft.operators.Curation
  import spark.implicits._

  test("pii redaction: each pattern family, counts, and clean text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "ssn 123-45-6789 phone (415) 555-2671 or +1 650-555-1234"),
      (3L, "server 192.168.0.1 fallback 10.0.0.7"),
      (4L, "nothing sensitive here 12-34")).toDF("id", "t")
    val out = df.select($"id", Curation.redactPii($"t").as("clean"),
      Curation.piiCount($"t").as("n")).orderBy("id").collect()
    assert(out(0).getString(1) === "mail <EMAIL> now")
    assert(out(0).getLong(2) === 1L)
    assert(out(1).getString(1).contains("<SSN>"))
    assert(out(1).getString(1).contains("<PHONE>"))
    assert(!out(1).getString(1).exists(_.isDigit),
      s"all digit runs must be redacted: ${out(1).getString(1)}")
    assert(out(1).getLong(2) === 3L)
    assert(out(2).getString(1) === "server <IP> fallback <IP>")
    assert(out(2).getLong(2) === 2L)
    assert(out(3).getString(1) === "nothing sensitive here 12-34")
    assert(out(3).getLong(2) === 0L)
  }

  test("stratified sample: exactly k per stratum, deterministic, small strata whole") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "en" else if (i <= 97) "de" else "fr"))
      .toDF("doc_id", "lang")
    val s1 = Curation.stratifiedSample(df, "doc_id", "lang", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // exact counts: en capped at 5, de capped at 5, fr (3 rows) whole
    val byLang = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang === Map("en" -> 5, "de" -> 5, "fr" -> 3))
    // deterministic: a re-run selects the identical ids
    val s2 = Curation.stratifiedSample(df, "doc_id", "lang", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSet === s2.toSet)
    // selection follows Knuth-hash order, not id order (the sample must
    // not just be "first k ids")
    val enIds = s1.filter(_._2 == "en").map(_._1).sorted
    assert(enIds.toSeq !== (1L to 5L).toSeq,
      s"hash order must not degenerate to id order: ${enIds.toSeq}")
  }

  test("LM surprisal: in-domain text scores low, out-of-domain high, exact fixture math") {
    // reference corpus: "ababab" -> trigrams aba, bab, aba, bab
    // model: {aba->2, bab->2}, total=4, vocab=2, denom=7
    val ref = Seq((0L, "ababab")).toDF("doc_id", "text")
    val lm = Curation.ngramLm(ref, "text", n = 3)
    assert(lm.counts === Map("aba" -> 2L, "bab" -> 2L))
    assert((lm.total, lm.vocab) === ((4L, 2L)))
    val docs = Seq(
      (1L, "ababa"),   // aba, bab, aba: all seen, nll = -ln(3/7)
      (2L, "xyzxy"),   // xyz, yzx, zxy: all unseen, nll = -ln(1/7)
      (3L, "ab")       // shorter than n: one whole-text gram, unseen
    ).toDF("doc_id", "text")
    val out = Curation.surprisalScore(docs, "doc_id", "text", lm)
      .orderBy("id").collect()
    def r2(x: Double) = BigDecimal(
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(1) === r2(-math.log(3d / 7)))
    assert(out(1).getDouble(1) === r2(-math.log(1d / 7)))
    assert(out(2).getDouble(1) === r2(-math.log(1d / 7)))
    assert(out(0).getDouble(1) < out(1).getDouble(1),
      "in-domain text must score below out-of-domain")
    // scale shape: the model is a literal — scoring plans zero exchanges
    val plan = Curation.surprisalScore(docs, "doc_id", "text", lm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"surprisal scoring must not shuffle:\n${plan.take(1200)}")
  }

  test("DSIR log-ratio: target-like text scores high, exact fixture math, zero shuffle") {
    // target LM on "ababab": {aba->2, bab->2}, total=4, vocab=2, denom=7
    // source LM on "ababab"+"xyzxyz": adds {xyz,yzx,zxy,xyz}, total=8, vocab=5, denom=14
    val tgt = Curation.ngramLm(Seq((0L, "ababab")).toDF("doc_id", "text"), "text", 3)
    val src = Curation.ngramLm(
      Seq((0L, "ababab"), (1L, "xyzxyz")).toDF("doc_id", "text"), "text", 3)
    val docs = Seq(
      (1L, "ababa"),  // target-like: 3 windows seen by both models
      (2L, "xyzxy")   // source-only: seen by src, unseen by tgt
    ).toDF("doc_id", "text")
    val out = Curation.dsirLogRatio(docs, "doc_id", "text", tgt, src)
      .orderBy("id").collect()
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r2(x: BigDecimal) = x.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: each window nll_src = -ln(3/14), nll_tgt = -ln(3/7)
    val d1 = r2((q9(-math.log(3d / 14)) - q9(-math.log(3d / 7))) * 3)
    // doc 2: xyz seen twice in src (-ln(3/14)), yzx/zxy once (-ln(2/14));
    // tgt: all unseen (-ln(1/7))
    val d2 = r2(q9(-math.log(3d / 14)) + q9(-math.log(2d / 14)) * 2
      - q9(-math.log(1d / 7)) * 3)
    assert(out(0).getDouble(1) === d1)
    assert(out(1).getDouble(1) === d2)
    assert(out(0).getDouble(1) > out(1).getDouble(1),
      "target-like text must carry the higher importance weight")
    val plan = Curation.dsirLogRatio(docs, "doc_id", "text", tgt, src)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"DSIR scoring must not shuffle:\n${plan.take(1200)}")
  }

  test("ngramLmPair equals two separate trainings (one-scan optimization)") {
    val docs = Seq(
      (0L, "en", "ababab"), (1L, "de", "xyzxyz"), (2L, "en", "abxy"),
      (3L, "fr", "zz")).toDF("doc_id", "lang", "text")
    val (tgt, src) = Curation.ngramLmPair(docs, "text", $"lang" === "en", 3)
    val tgt2 = Curation.ngramLm(docs.filter($"lang" === "en"), "text", 3)
    val src2 = Curation.ngramLm(docs, "text", 3)
    assert(tgt === tgt2)
    assert(src === src2)
  }

  test("bloom novelty screen: exact anti-join result, history-side joins all broadcast") {
    val batch = (0L until 400L).map(i => (i, s"doc-${i % 150}"))
      .toDF("id", "text")
      .withColumn("fp", org.apache.spark.sql.functions.md5($"text"))
    val history = (0L until 90L).map(i => (s"doc-$i"))
      .toDF("text")
      .select(org.apache.spark.sql.functions.md5($"text").as("fp"))
    val expected = batch.join(history, Seq("fp"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted
    val out = Dedup.bloomNoveltyScreen(batch, history, "fp", 1000L, 0.01)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(expected))
    // an under-sized filter (all-suspects degenerate case) stays correct
    val tiny = Dedup.bloomNoveltyScreen(batch, history, "fp", 1L, 0.5)
    assert(tiny.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(expected))
    // scale shape: both joins that touch the history are broadcast —
    // the history is never the shuffled side of an exchange-keyed join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"history joins must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join may touch the history:\n${plan.take(1500)}")
  }

  test("source reputation: mirror source flagged by dup rate, keyword soup by stopwords") {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    val rows =
      // clean source: unique prose-like docs, stopword-rich
      (0 until 10).map(i => (s"good", s"the quick fox $i is in a den of foxes")) ++
      // mirror: every doc a copy of one body (corpus-wide dups)
      (0 until 10).map(_ => ("mirror", "the same mirrored body of text in a loop")) ++
      // keyword soup: unique but stopword-free
      (0 until 10).map(i => (s"soup", s"buy cheap widget$i deal sale offer now"))
    val df = rows.toDF("source", "text")
    val rep = Curation.sourceReputation(df, "source", "text", stop,
      maxDupRate = 0.2, minStopword = 0.05)
      .orderBy("source").collect()
    val bySrc = rep.map(r => r.getString(0) ->
      (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(bySrc("good")._1 === 0.0)
    assert(bySrc("good")._3, "clean source must keep")
    assert(bySrc("mirror")._1 === 1.0)
    assert(!bySrc("mirror")._3, "mirror source must be dropped by dup rate")
    assert(bySrc("soup")._1 === 0.0)
    assert(bySrc("soup")._2 < 0.05)
    assert(!bySrc("soup")._3, "stopword-free source must be dropped")
  }

  test("normalizeText canonicalizes case/punct/whitespace re-encodings together") {
    val df = Seq(
      (1L, "The  quick,   BROWN fox!"),
      (2L, "the QUICK brown--fox"),
      (3L, "  [the] (quick) {brown} <fox>  "),
      (4L, "a completely different doc")).toDF("id", "t")
    val out = df.select($"id", Curation.normalizeText($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1) === "the quick brown fox")
    assert(out(2) === "the quick brown fox")
    assert(out(3) === "the quick brown fox")
    assert(out(4) === "a completely different doc")
    // the dedup-key use: three re-encodings of one doc collapse to a
    // single fingerprint under exact dedup
    val deduped = graft.operators.Dedup.exact(
      df.select($"id", Curation.normalizeText($"t").as("t")), Seq("t"), "id")
    assert(deduped.count() === 2L)
  }

  test("hash-mod sampling: deterministic, weight-monotone, unlisted strata intact") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    def ids(w: Map[String, Double]): Set[Long] =
      Curation.hashModSample(df, "id", "src", w).select("id")
        .collect().map(_.getLong(0)).toSet
    val half = ids(Map("src0" -> 0.5))
    assert(half === ids(Map("src0" -> 0.5)), "sampling must be deterministic")
    // unlisted strata keep every row; the listed one thins to ~weight
    assert(half.count(_ % 4 != 0) === 750)
    val kept0 = half.count(_ % 4 == 0)
    assert(kept0 > 75 && kept0 < 175, s"~50% of 250 expected, got $kept0")
    // a smaller weight keeps a SUBSET (nested samples — the hash-mod
    // property that makes mixtures tunable without resampling churn)
    val tenth = ids(Map("src0" -> 0.1))
    assert(tenth.filter(_ % 4 == 0).subsetOf(half.filter(_ % 4 == 0)))
  }

  test("mixture report shares sum to 1 and match hand counts") {
    val df = Seq(
      (1L, "a", "w x y"), (2L, "a", "w x"), (3L, "b", "w")).toDF("id", "src", "t")
    val rows = Curation.mixtureReport(df, "src", "t").orderBy("src").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 2L, 5L), ("b", 1L, 1L)))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
  }

  test("gopher rules: each rule independently fails the right document") {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    val good = (("the word count " + Seq.tabulate(60)(i => s"word$i").mkString(" ")
      + " is a fine document"))
    val df = Seq(
      (1L, good),                                        // passes everything
      (2L, "the short one is a doc"),                    // < 50 words
      (3L, ("the " * 30 + "a " * 30).trim
        .replaceAll("the", "antidisestablishmentarianism")), // mean len > 10
      (4L, good.replaceAll("word(\\d+)", "fill#$1")),    // symbol ratio > 0.1
      (5L, good.replaceAll("word(\\d+)", "90$1")),       // alpha frac < 0.8
      (6L, good.replaceAll("\\b(the|is|a)\\b", "xx"))    // < 2 stopword hits
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(df, "text", stop)
      .select("doc_id", "gopher_pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L), "the control document must pass")
    (2L to 6L).foreach(i => assert(!out(i), s"doc $i must fail its rule"))
  }

  test("boilerplate line removal: df gate, order preserved, all-removed doc empties") {
    val docs = Seq(
      (1L, "BANNER\nalpha\nBANNER2", "s1"),
      (2L, "BANNER\nbeta\nBANNER2", "s1"),
      (3L, "BANNER\ngamma", "s2"),
      (4L, "BANNER", "s2"), // nothing survives
      (5L, "delta\nBANNER\nepsilon", "s3")) // boilerplate mid-doc
      .toDF("doc_id", "text", "src")
    val out = graft.operators.Curation.removeBoilerplateLines(
      docs, "doc_id", "text", minDf = 2)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_lines_removed"))).toMap
    // BANNER df=5, BANNER2 df=2 -> both drop; singles survive in order
    assert(byId(1L) === (("alpha", 2L)))
    assert(byId(2L) === (("beta", 2L)))
    assert(byId(3L) === (("gamma", 1L)))
    assert(byId(4L) === (("", 1L)), "a fully-boilerplate doc must empty, not vanish")
    assert(byId(5L) === (("delta\nepsilon", 1L)), "line order must survive removal")
    // passthrough columns stay
    assert(out.map(_.getAs[String]("src")).toSeq === Seq("s1", "s1", "s2", "s2", "s3"))
    // line-count invariant on every row
    out.foreach { r =>
      val orig = r.getAs[String]("text").split("\n", -1).length
      val kept = r.getAs[String]("clean_text") match {
        case "" => 0
        case s  => s.split("\n", -1).length
      }
      assert(kept === orig - r.getAs[Long]("n_lines_removed"))
    }
  }

  test("keep-first line dedup: canonical occurrence survives, later copies excise") {
    val docs = Seq(
      (1L, "DUP\nalpha\nDUP"),     // doc-internal repeat: pos 0 owns
      (2L, "beta\nDUP"),
      (3L, "DUP\ngamma"),
      (4L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.Curation.dedupLines(docs, "doc_id", "text",
      minDf = 2).orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_lines_removed"))).toMap
    assert(byId(1L) === (("DUP\nalpha", 1L)),
      "the min-(doc,pos) copy keeps; the SAME doc's later copy excises")
    assert(byId(2L) === (("beta", 1L)))
    assert(byId(3L) === (("gamma", 1L)))
    assert(byId(4L) === (("solo", 0L)), "unique lines pass untouched")
  }

  test("incremental corpus report: batch sketches fold to the one-shot report") {
    import graft.operators.Curation
    val mk = (ids: Range, src: String) => ids.map(i =>
      (i.toLong, src, if (i % 4 == 0) "DUPLICATE BODY" else s"text $i"))
    val b1 = mk(0 until 300, "a") ++ mk(300 until 500, "b")
    val b2 = mk(500 until 700, "a") ++ mk(700 until 1100, "c")
    val all = (b1 ++ b2).toDF("doc_id", "src", "text")
    // fold: per-batch LEAF state unioned, merged at read time
    val state = Curation.corpusReportBatch(
        b1.toDF("doc_id", "src", "text"), "text", Seq("src"))
      .unionByName(Curation.corpusReportBatch(
        b2.toDF("doc_id", "src", "text"), "text", Seq("src")))
    val merged = Curation.mergeCorpusReport(state, Seq("src"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val oneShot = Curation.corpusReport(all, "text", Seq("src"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged.keySet === oneShot.keySet)
    merged.foreach { case (k, (agg, n, tok, dist)) =>
      val (oAgg, oN, oTok, oDist) = oneShot(k)
      assert(agg === oAgg && n === oN && tok === oTok,
        s"counts must fold exactly for $k")
      // the distinct count is HLL-estimated: within 5% of exact
      assert(math.abs(dist - oDist) <= math.max(2L, (0.05 * oDist).toLong),
        s"cell $k: estimated $dist vs exact $oDist")
    }
    // state COMPACTION: re-merging leaf-granularity state probes the same
    val compact = state.groupBy("src")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        expr("hll_union_agg(fp_sketch)").as("fp_sketch"))
    // NOT exact equality: DataSketches HLL union estimates can shift a
    // fraction of a percent with merge ORDER (mode promotion inside the
    // union), so compaction is probe-EQUIVALENT within tolerance, not
    // bit-identical
    val mergedC = Curation.mergeCorpusReport(compact, Seq("src"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(4)).toMap
    mergedC.foreach { case (k, est) =>
      val want = merged(k)._4
      assert(math.abs(est - want) <= math.max(2L, (0.02 * want).toLong),
        s"cell $k: compacted $est vs raw-fold $want") }
  }

  test("KMV corpus report: batch sketches fold EXACTLY to the one-shot " +
    "report (no merge drift, unlike HLL), estimate within tolerance of " +
    "exact, compaction lossless") {
    import graft.operators.Curation
    val mk = (ids: Range, src: String) => ids.map(i =>
      (i.toLong, src, if (i % 4 == 0) "DUPLICATE BODY" else s"text $i"))
    val b1 = mk(0 until 300, "a") ++ mk(300 until 500, "b")
    val b2 = mk(500 until 700, "a") ++ mk(700 until 1100, "c")
    val all = (b1 ++ b2).toDF("doc_id", "src", "text")
    val k = 64
    val state = Curation.corpusReportBatchKmv(
        b1.toDF("doc_id", "src", "text"), "text", Seq("src"), k = k)
      .unionByName(Curation.corpusReportBatchKmv(
        b2.toDF("doc_id", "src", "text"), "text", Seq("src"), k = k))
    def report(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => Option(r.getString(0)) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3),
          r.getAs[Long]("n_distinct"))).toMap
    val merged = report(Curation.mergeCorpusReportKmv(state, Seq("src"),
      k = k))
    // the fold LAW is exact for KMV: the k smallest of a union are all
    // within the per-batch k-smallest sets, so two-batch fold ==
    // one-shot sketch BIT-FOR-BIT (the property HLL's registered merge
    // only approximates)
    val oneShot = report(Curation.mergeCorpusReportKmv(
      Curation.corpusReportBatchKmv(all, "text", Seq("src"), k = k),
      Seq("src"), k = k))
    assert(merged === oneShot, "KMV fold must be exact, not approximate")
    // estimator sanity against exact distincts: exact below k (cells
    // "b"/"c" hold < 64 distinct? no — b has 150, c 300; all cells pass
    // k here except none... so just bound the estimate error at ~1/sqrt(k))
    val exact = Curation.corpusReport(all, "text", Seq("src"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(4)).toMap
    merged.foreach { case (cell, (_, n, _, dist)) =>
      val want = exact(cell)
      assert(math.abs(dist - want) <= math.max(3L, (0.3 * want).toLong),
        s"cell $cell: KMV estimate $dist vs exact $want (n=$n)")
    }
    // a tiny cell stays EXACT (fewer than k values -> the sketch IS the set)
    val tiny = (0 until 10).map(i => (i.toLong, "t", s"u $i"))
      .toDF("doc_id", "src", "text")
    val tinyRep = report(Curation.mergeCorpusReportKmv(
      Curation.corpusReportBatchKmv(tiny, "text", Seq("src"), k = k),
      Seq("src"), k = k))
    assert(tinyRep(Option("t"))._4 === 10L,
      "below k the KMV estimate is the exact distinct count")
    // compaction is LOSSLESS: compact-then-merge == merge bit-for-bit
    val compacted = report(Curation.mergeCorpusReportKmv(
      Curation.compactCorpusReportKmv(state, Seq("src"), k = k),
      Seq("src"), k = k))
    assert(compacted === merged, "KMV compaction must be lossless")
  }

  test("KMV corpus report: a NULL dim value is a real leaf cell, not a " +
    "dropped row (null-safe counts-to-sketch join)") {
    import graft.operators.Curation
    // lang NULL is a supported cell in this family (grouping flags exist
    // to tell it apart from a rollup row); a Seq-keyed equi-join would
    // silently drop it and under-count every subtotal above it
    val df = Seq(
      (1L, "en", "alpha"), (2L, null.asInstanceOf[String], "beta"),
      (3L, null.asInstanceOf[String], "beta"), (4L, "de", "gamma")
    ).toDF("doc_id", "lang", "text")
    val state = Curation.corpusReportBatchKmv(df, "text", Seq("lang"))
    val leaf = state.collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getSeq[Long](3).size))
      .toMap
    assert(leaf.contains(None), s"NULL-lang cell must survive: $leaf")
    assert(leaf(None)._1 === 2L, "both NULL-lang docs counted")
    assert(leaf(None)._2 === 1, "one distinct text in the NULL-lang cell")
    val rep = Curation.mergeCorpusReportKmv(state, Seq("lang"))
      .filter(!col("lang_agg")).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Long]("n_distinct")).toMap
    assert(rep(None) === 1L)
  }

  test("psiReport: identical distributions read ~0/stable, moved mass flags") {
    import graft.operators.Curation
    val ref = (1 to 40).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "s")
    // identical distribution -> every term 0.0 exactly (same fracs)
    val same = Curation.psiReport(ref, ref, "s", Seq(2.5, 5.5, 7.5))
      .collect()
    assert(same.length === 4)
    same.foreach { r =>
      assert(r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0 &&
        r.getString(7) === "stable")
    }
    // all batch mass above the top bound -> a real shift
    val bat = (1 to 40).map(i => (i.toLong, 9.0)).toDF("id", "s")
    val moved = Curation.psiReport(ref, bat, "s", Seq(2.5, 5.5, 7.5))
      .collect()
    assert(moved.head.getString(7) === "shift",
      s"psi_total ${moved.head.getDouble(6)} must trip the shift cut")
    // empty buckets stay defined (Laplace): no NaN/inf terms
    moved.foreach(r => assert(!r.getDouble(5).isNaN &&
      !r.getDouble(5).isInfinite))
    // NULL scores are excluded, not bucketed
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "s")
    val n = Curation.psiReport(withNull, withNull, "s", Seq(5.0))
      .agg(org.apache.spark.sql.functions.sum("ref_n")).head.getLong(0)
    assert(n === 1L)
    intercept[IllegalArgumentException] {
      Curation.psiReport(ref, ref, "s", Seq(5.0, 2.0))
    }
    intercept[IllegalArgumentException] {
      Curation.psiReport(ref, ref, "s", Seq.empty)
    }
  }

  test("scoreBuckets: tercile cuts, boundary rows classify low, validation") {
    // 9 scores 1..9: terciles at interpolated 3.67/6.33 — 1-3 head,
    // 4-6 middle, 7-9 tail
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val got = graft.operators.Curation.scoreBuckets(df, "s",
      Seq("head", "middle", "tail"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1 to 3).forall(i => got(i) == "head"), got)
    assert((4 to 6).forall(i => got(i) == "middle"), got)
    assert((7 to 9).forall(i => got(i) == "tail"), got)
    // a row EXACTLY at a threshold classifies into the lower bucket:
    // 4 equal scores -> median threshold equals the score, <= keeps low
    val ties = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0))
      .toDF("id", "s")
    val t2 = graft.operators.Curation.scoreBuckets(ties, "s", Seq("lo", "hi"))
      .collect().map(_.getString(2)).toSet
    assert(t2 === Set("lo"), "all-tied scores sit AT the threshold -> lower bucket")
    // an unscored (NULL) row must not silently classify as the worst
    // bucket — it reads NULL and the caller decides
    val withNull = Seq((1L, Some(1.0)), (2L, Some(9.0)), (3L, None))
      .toDF("id", "s")
    val nb = graft.operators.Curation.scoreBuckets(withNull, "s",
      Seq("lo", "hi")).collect().map(r => r.getLong(0) ->
        Option(r.getString(2))).toMap
    assert(nb(3L).isEmpty, s"NULL score must give NULL bucket: $nb")
    assert(nb(1L) === Some("lo") && nb(2L) === Some("hi"))
    intercept[IllegalArgumentException] {
      graft.operators.Curation.scoreBuckets(df, "s", Seq("only"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Curation.scoreBuckets(df, "s", Seq("a", "a"))
    }
  }

  test("scoreCuts: same-reference parity with scoreBuckets, frozen labels " +
    "under a skewed batch, NULL bucket, arity guard survives a " +
    "bucket-only consumer") {
    import graft.operators.Curation
    val labels = Seq("head", "middle", "tail")
    val ref = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val cuts = Curation.scoreCutsModel(ref, "s", 3)
    // parity LAW: cuts trained on the frame itself reproduce scoreBuckets
    // bit-for-bit (round-to-6 lives in the model, compare is plain <=)
    val underCuts = Curation.scoreBucketsUnderCuts(ref, "s", labels, cuts)
      .orderBy("id").collect().toSeq
    val inline = Curation.scoreBuckets(ref, "s", labels)
      .orderBy("id").collect().toSeq
    assert(underCuts === inline, "same-reference parity must be exact")
    // the POINT of freezing: a skewed batch keeps the reference labels.
    // Batch scores 7..9 are all 'tail' under the stamped cuts; per-batch
    // scoreBuckets would silently relabel them head/middle/tail.
    val skewed = Seq((1L, 7.0), (2L, 8.0), (3L, 9.0)).toDF("id", "s")
    val frozen = Curation.scoreBucketsUnderCuts(skewed, "s", labels, cuts)
      .collect().map(_.getString(2)).toSet
    assert(frozen === Set("tail"), s"frozen cuts must hold labels: $frozen")
    val perBatch = Curation.scoreBuckets(skewed, "s", labels)
      .collect().map(_.getString(2)).toSet
    assert(perBatch === Set("head", "middle", "tail"),
      "the per-batch path relabels — the failure the snapshot prevents")
    // NULL score stays a NULL bucket (the scoreBuckets contract)
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "s")
    val nb = Curation.scoreBucketsUnderCuts(withNull, "s",
      Seq("lo", "hi"), Curation.scoreCutsModel(ref, "s", 2))
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(nb(2L).isEmpty && nb(1L) === Some("lo"))
    // arity mismatch refuses even when the consumer reads ONLY the bucket
    // column (filter carrier — ColumnPruning cannot delete the guard)
    val e = intercept[Exception] {
      Curation.scoreBucketsUnderCuts(skewed, "s", Seq("lo", "hi"), cuts)
        .select("bucket").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("different bucket count")),
      msgs(e).mkString("|"))
    // ...and the DEPLOYMENT path refuses even on an EMPTY batch: AQE's
    // empty-relation propagation can skip the in-plan broadcast guard
    // for a warm-up trigger with zero rows, so the persisted-table
    // probe validates arity eagerly before any plan builds
    withTmpDir { tmp =>
      Curation.saveScoreCuts(spark, s"$tmp/cuts3", cuts) // 2 cuts (k=3)
      val runtimeEmpty = skewed.repartition(2).filter(col("id") < lit(0L))
      val e2 = intercept[IllegalArgumentException] {
        Curation.scoreBucketsUnderCutsTable(runtimeEmpty, "s",
          Seq("lo", "hi"), s"$tmp/cuts3")
      }
      assert(e2.getMessage.contains("different bucket count"), e2.getMessage)
    }
    intercept[IllegalArgumentException](Curation.scoreCutsModel(ref, "s", 1))
  }

  test("scoreCuts: malformed pos sequences refuse (duplicate/gapped), " +
    "arity refusal is EAGER — no plan, no action needed") {
    import graft.operators.Curation
    val ref = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    // duplicate + gapped pos (1,1,3 for k=4): passes a size-only check,
    // classifies under mis-ordered thresholds — must refuse instead
    val badPos = Seq((1, 2.5), (1, 4.5), (3, 6.5)).toDF("pos", "cut")
    val e = intercept[IllegalArgumentException] {
      Curation.scoreBucketsUnderCuts(ref, "s", Seq("a", "b", "c", "d"), badPos)
    }
    assert(e.getMessage.contains("1..3"), e.getMessage)
    // the arity mismatch refuses AT CALL TIME (eager, the AQE
    // empty-propagation lesson) — intercept WITHOUT collecting
    val cuts3 = Curation.scoreCutsModel(ref, "s", 3)
    val e2 = intercept[IllegalArgumentException] {
      Curation.scoreBucketsUnderCuts(ref, "s", Seq("lo", "hi"), cuts3)
    }
    assert(e2.getMessage.contains("different bucket count"), e2.getMessage)
    // the persisted-table path names the offending path in its refusal
    withTmpDir { tmp =>
      Curation.saveScoreCuts(spark, s"$tmp/badpos", badPos)
      val e3 = intercept[IllegalArgumentException] {
        Curation.scoreBucketsUnderCutsTable(ref, "s",
          Seq("a", "b", "c", "d"), s"$tmp/badpos")
      }
      assert(e3.getMessage.contains("badpos") &&
        e3.getMessage.contains("1..3"), e3.getMessage)
    }
    // a NULL pos refuses with the crafted remedy, not a bare NPE
    // (Row.getInt on NULL would throw undiagnosably; the in-plan guard
    // also passes NULLs silently — NULL compares to nothing)
    val nullPos = Seq((Some(1), 2.5), (None, 4.5), (Some(3), 6.5))
      .toDF("pos", "cut")
    val e4 = intercept[IllegalArgumentException] {
      Curation.scoreBucketsUnderCuts(ref, "s", Seq("a", "b", "c", "d"),
        nullPos)
    }
    assert(e4.getMessage.contains("NULL pos"), e4.getMessage)
    // well-formed cuts still classify identically after the guard change
    val ok = Curation.scoreBucketsUnderCuts(ref, "s",
      Seq("head", "middle", "tail"), cuts3).collect()
    assert(ok.length === 9)
  }

  test("scoreCutsDrift: in-dist batch holds, skewed batch trips rebuild, " +
    "zero-hit buckets report, the empty batch is not drift evidence") {
    import graft.operators.Curation
    val ref = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val cuts = Curation.scoreCutsModel(ref, "s", 3)
    val inDist = Curation.scoreCutsDrift(ref, "s", cuts, maxShareSkew = 0.2)
      .orderBy("bucket_pos").collect()
    assert(inDist.length === 3)
    assert(inDist.forall(!_.getAs[Boolean]("rebuild")),
      "equal-mass reference must not trip")
    val skewed = Seq((1L, 8.0), (2L, 8.5), (3L, 9.0)).toDF("id", "s")
    val drifted = Curation.scoreCutsDrift(skewed, "s", cuts,
      maxShareSkew = 0.2).orderBy("bucket_pos").collect()
    assert(drifted.forall(_.getAs[Boolean]("rebuild")),
      "all-tail batch must trip the skew signal")
    // buckets the batch never hits still report: share 0 IS the signal
    assert(drifted.take(2).forall(r => r.getAs[Long]("n") === 0L &&
      r.getAs[Double]("share") === 0.0))
    assert(drifted(2).getAs[Double]("share") === 1.0)
    // zero rows is not drift evidence (the profileDrift contract)
    val empty = Curation.scoreCutsDrift(ref.filter(lit(false)), "s", cuts,
      maxShareSkew = 0.2).collect()
    assert(empty.length === 3 && empty.forall(r =>
      !r.getAs[Boolean]("rebuild") && r.getAs[Double]("skew") === 0.0))
  }

  test("scoreCutsDrift conservation laws: every scored row lands in " +
    "exactly one bucket, shares sum to ~1, degenerate all-tied scores " +
    "flood bucket 1 and trip") {
    import graft.operators.Curation
    import org.scalacheck.Gen
    def forAllSampled[T](gen: org.scalacheck.Gen[T], n: Int)(
        body: T => Unit): Unit =
      (0 until n).foreach { i =>
        gen.apply(org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(7L + i)).foreach(body)
      }
    val caseGen = for {
      k <- Gen.choose(2, 5)
      refN <- Gen.choose(k, 40)
      ref <- Gen.listOfN(refN, Gen.choose(-1000, 1000).map(_ / 10.0))
      batch <- Gen.listOfN(25, Gen.choose(-1200, 1200).map(_ / 10.0))
    } yield (k, ref, batch)
    forAllSampled(caseGen, 10) { case (k, ref, batch) =>
      val refDf = ref.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val bDf = batch.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val cuts = Curation.scoreCutsModel(refDf, "s", k)
      val rows = Curation.scoreCutsDrift(bDf, "s", cuts, maxShareSkew = 0.2)
        .orderBy("bucket_pos").collect()
      assert(rows.length === k, s"spine must cover all $k buckets")
      assert(rows.map(_.getAs[Long]("n")).sum === batch.length.toLong,
        "every scored row lands in exactly one bucket")
      val shareSum = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 0.001 * k,
        s"shares must sum to ~1 (got $shareSum)")
      // roll-up consistency: max_skew is the max of the per-bucket skews
      assert(rows.map(_.getAs[Double]("max_skew")).distinct.length === 1)
      assert(rows.head.getAs[Double]("max_skew") ===
        rows.map(_.getAs[Double]("skew")).max)
    }
    // degenerate reference: all-tied scores give equal cuts; every batch
    // row classifies low (<= the tied cut) — bucket 1 floods and trips
    val tiedRef = (1 to 8).map(i => (i.toLong, 5.0)).toDF("id", "s")
    val cuts = Curation.scoreCutsModel(tiedRef, "s", 3)
    val got = Curation.scoreCutsDrift(tiedRef, "s", cuts, maxShareSkew = 0.2)
      .orderBy("bucket_pos").collect()
    assert(got.map(r => (r.getAs[Long]("n"), r.getAs[Boolean]("rebuild")))
      .toSeq === Seq((8L, true), (0L, true), (0L, true)),
      got.mkString("|"))
  }

  test("source reputation fold: fold(b1) ++ fold(b2) equals the one-shot " +
    "over the union, including the retroactive dup") {
    import graft.operators.Curation
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    // 'late-mirror' is UNIQUE in b1; b2 duplicates it — the b1 doc must
    // retroactively count as a dup, which per-source counters cannot do
    val b1 = Seq(
      ("good", "the quick fox one is in a den"),
      ("good", "the quick fox two is in a den"),
      ("late-mirror", "a body that will be mirrored later")).toDF("source", "text")
    val b2 = Seq(
      ("good", "the quick fox three is in a den"),
      ("late-mirror", "a body that will be mirrored later"),
      ("late-mirror", "a body that will be mirrored later")).toDF("source", "text")
    val state = Curation.sourceFpBatch(b1, "source", "text", stop)
      .unionByName(Curation.sourceFpBatch(b2, "source", "text", stop))
    val folded = Curation.sourceReputationFromState(state,
      maxDupRate = 0.2, minStopword = 0.05).orderBy("source").collect().toSeq
    val oneShot = Curation.sourceReputation(b1.unionByName(b2), "source",
      "text", stop, maxDupRate = 0.2, minStopword = 0.05)
      .orderBy("source").collect().toSeq
    assert(folded === oneShot, "fold-equals-one-shot must be bit-exact")
    val mirror = folded.find(_.getString(0) == "late-mirror").get
    assert(mirror.getDouble(2) === 1.0,
      "ALL late-mirror copies are dups — including the batch-1 original")
    // merge idempotence: re-merging merged state changes nothing
    val merged = Curation.mergeSourceFp(state)
    assert(Curation.sourceReputationFromState(merged, 0.2, 0.05)
      .orderBy("source").collect().toSeq === folded)
  }

  test("cross-batch line dedup: history owner wins, in-batch ownership, compaction-stable") {
    import graft.operators.Curation
    val minDf = 2
    val b1 = Seq((1L, "SHARED\nfirst-only"), (2L, "b1-unique")).toDF("doc_id", "text")
    val hist1 = Curation.lineIndex(b1, "doc_id", "text")
    // batch 2: a doc quoting SHARED (history owner wins — excises), a doc
    // repeating SHARED twice internally (both excise), and a NEW line
    // duplicated across two batch-2 docs (in-batch ownership: min id keeps)
    val b2 = Seq(
      (10L, "SHARED\nnovel ten"),
      (11L, "SHARED\nNEWDUP\nSHARED"),
      (12L, "NEWDUP\ntwelve")).toDF("doc_id", "text")
    def cleanOf(out: Array[org.apache.spark.sql.Row]) =
      out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    val out2 = Curation.dedupLinesAgainstHistory(b2, hist1,
      "doc_id", "text", minDf).orderBy("doc_id").collect()
    val c2 = cleanOf(out2)
    assert(c2(10L) === "novel ten", "history-owned line must excise")
    assert(c2(11L) === "NEWDUP", "both later SHARED copies excise; first NEWDUP keeps")
    assert(c2(12L) === "twelve", "the higher-id NEWDUP copy excises in-batch")
    // threshold respects CUMULATIVE df: a line seen once in history and
    // once in this batch reaches minDf=2 exactly
    val b3 = Seq((20L, "first-only\nlast line")).toDF("doc_id", "text")
    val hist12 = hist1.unionByName(Curation.lineIndex(b2, "doc_id", "text"))
    val c3 = cleanOf(Curation.dedupLinesAgainstHistory(b3, hist12,
      "doc_id", "text", minDf).collect())
    assert(c3(20L) === "last line",
      "history df 1 + batch df 1 crosses the threshold")
    // compaction is probe-equivalent (min(own)/sum(df) idempotent)
    val compacted = Curation.compactLineIndex(hist12)
    assert(compacted.count() < hist12.count() ||
      hist12.groupBy("h1", "h2").count().filter(col("count") > 1).count() === 0)
    val c3c = cleanOf(Curation.dedupLinesAgainstHistory(b3, compacted,
      "doc_id", "text", minDf).collect())
    assert(c3c === c3, "compacted history must probe identically")
    // packed-owner guard fires loudly on out-of-range ids
    val bad = Seq((Long.MaxValue, "x")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Curation.lineIndex(bad, "doc_id", "text").collect()
    }
    assert(e.getMessage != null)
    // a non-numeric id refuses up front instead of NULL-casting every
    // id into one group (total silent data loss)
    val strIds = Seq(("a", "x\ny"), ("b", "x\nz")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Curation.lineIndex(strIds, "doc_id", "text")
    }
    assert(e2.getMessage.contains("integral (byte/short/int/long) id"))
    // a FRACTIONAL numeric id truncates under the long cast — distinct
    // ids 1.2 and 1.7 would silently collapse into one packed owner, so
    // the guard demands integral, not merely numeric
    val fracIds = Seq((1.2, "x\ny"), (1.7, "x\nz")).toDF("doc_id", "text")
    val e3 = intercept[IllegalArgumentException] {
      Curation.lineIndex(fracIds, "doc_id", "text")
    }
    assert(e3.getMessage.contains("integral (byte/short/int/long) id") &&
      e3.getMessage.contains("double"))
    intercept[IllegalArgumentException] {
      Curation.dedupLinesAgainstHistory(strIds,
        Curation.lineIndex(Seq((1L, "x")).toDF("doc_id", "text"),
          "doc_id", "text"), "doc_id", "text")
    }
    // the IN-BATCH variants accept any orderable id (no packed state)
    val strOut = Curation.dedupLines(strIds, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getAs[String]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(strOut("a") === "x\ny" && strOut("b") === "z",
      "string ids must work for in-batch line dedup")
  }

  test("url canonicalization: case/www/fragment/param-order collapse, edges hold") {
    val urls = Seq(
      // the four decorations of one page collapse to one form
      ("https://site1.ex1.com/Page/1?a=1&b=2",
        "https://site1.ex1.com/Page/1?a=1&b=2"),
      ("HTTPS://WWW.SITE1.EX1.COM/Page/1?b=2&a=1#frag",
        "https://site1.ex1.com/Page/1?a=1&b=2"),
      // path case PRESERVED (case-sensitive by spec), empty path -> "/"
      ("http://Host.COM", "http://host.com/"),
      ("http://host.com/UPPER/Case", "http://host.com/UPPER/Case"),
      // bare query / trailing fragment-only
      ("http://host.com/?z=9&a=0", "http://host.com/?a=0&z=9"),
      ("http://host.com/p#only-frag", "http://host.com/p"),
      // www inside the host (not a prefix) survives
      ("http://notwww.www-like.com/x", "http://notwww.www-like.com/x"))
    val got = urls.map(_._1).toDF("url")
      .select(col("url"), graft.operators.Curation.canonicalizeUrl(col("url"))
        .as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { case (u, want) => assert(got(u) === want, s"url $u") }
    val dom = Seq("https://www.a.b.example.co/x", "http://one.com/",
      "HTTP://WWW.TOP.COM").toDF("url")
      .select(graft.operators.Curation.urlDomain(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(dom === Seq("example.co", "one.com", "top.com"))
    // blocklist gate: literal-set filter, map-only
    val df = Seq((1L, "http://keep.com/a"), (2L, "http://bad.com/b"),
      (3L, "http://www.bad.com/c")).toDF("id", "url")
    val kept = graft.operators.Curation.domainBlocklistGate(df, "url",
      Seq("bad.com")).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
    // curated lists arrive non-normalized: case, www., subdomains —
    // all must still match the normalized domain
    Seq(Seq("Bad.com"), Seq("www.bad.com"), Seq("WWW.Tracker.BAD.com"))
      .foreach { bl =>
        val k = graft.operators.Curation.domainBlocklistGate(df, "url", bl)
          .collect().map(_.getLong(0)).toSet
        assert(k === Set(1L), s"blocklist form $bl must normalize")
      }
    val plan = graft.operators.Curation.domainBlocklistGate(df, "url",
      Seq("bad.com")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate must be map-only:\n$plan")
  }

  test("word vocab: frequency-ranked ids, deterministic under ties") {
    val docs = Seq((1L, "b a a c b a"), (2L, "c b d")).toDF("id", "text")
    // counts: a=3, b=3, c=2, d=1 → rank by (cnt DESC, token): a=1, b=2, c=3
    val vocab = Curation.buildWordVocab(docs, "text", size = 3)
    assert(vocab === Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("tokenizeToIds: ids in token order, OOV to unk, zero exchanges") {
    val docs = Seq((1L, "b a a c b a"), (2L, "c b d"), (3L, "x y")).toDF("id", "text")
    val vocab = Curation.buildWordVocab(docs, "text", size = 3)
    val out = Curation.tokenizeToIds(docs, "id", "text", vocab).orderBy("id")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
    assert(rows(0) === ((1L, Seq(2, 1, 1, 3, 2, 1), 6L, 0L)))
    assert(rows(1) === ((2L, Seq(3, 2, 0), 3L, 1L)))     // d is OOV
    assert(rows(2) === ((3L, Seq(0, 0), 2L, 2L)))        // fully OOV
    // map-only: the corpus side must not shuffle
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the single exchange is the final orderBy's range partitioning
    assert(exchanges.length <= 1, out.queryExecution.executedPlan.toString)
  }

  test("vocab drift cycle: flag fires on a shifted batch, rebuild restores coverage") {
    // the quantizer retrain-cycle discipline for the vocab model: a
    // vocab built on the reference slice covers in-dist batches; a
    // shifted batch (vowel→digit mutation) goes OOV-heavy and trips
    // rebuild; rebuilding ON the shifted batch clears the flag and
    // drops the OOV rate back to zero
    val docs = (0L until 20L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val vocab0 = Curation.buildWordVocab(docs, "text", size = 16)
    def drift(b: org.apache.spark.sql.DataFrame, v: Seq[(String, Int)]) =
      Curation.vocabDrift(b, "doc_id", "text", v,
        maxDocOov = 0.2, maxHighFrac = 0.2).head()
    val inDist = drift(docs, vocab0)
    assert(!inDist.getBoolean(5) && inDist.getDouble(3) === 0.0)
    val shifted = docs.select(col("doc_id"),
      translate(col("text"), "aeiou", "43105").as("text"))
    val d1 = drift(shifted, vocab0)
    assert(d1.getBoolean(5), s"shifted batch must trip rebuild: $d1")
    assert(d1.getDouble(3) > 0.5, s"most tokens must be OOV: $d1")
    val vocab1 = Curation.buildWordVocab(shifted, "text", size = 16)
    val d2 = drift(shifted, vocab1)
    assert(!d2.getBoolean(5), "rebuild on the drifted batch must clear the flag")
    assert(d2.getDouble(3) === 0.0, s"rebuilt vocab must cover the batch: $d2")
  }

  test("vocab save/load round-trips and tokenizes identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab").toString
    val docs = Seq((1L, "b a a c b a d e"), (2L, "c b d x")).toDF("id", "text")
    val vocab = Curation.buildWordVocab(docs, "text", size = 4)
    Curation.saveVocab(spark, s"$dir/v", vocab)
    val loaded = Curation.loadVocab(spark, s"$dir/v")
    assert(loaded === vocab)
    val a = Curation.tokenizeToIds(docs, "id", "text", vocab).orderBy("id").collect()
    val b = Curation.tokenizeToIds(docs, "id", "text", loaded).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("fimReorder: PSM structure reconstructs the original; AR passes through") {
    import org.apache.spark.sql.functions._
    val df = Seq((0L, Seq(10, 11, 12, 13, 14)), (1L, Seq(20, 21, 22)))
      .toDF("id", "ids")
    // doc 0: a=2, b=4 -> P=[10,11] M=[12,13] S=[14]; doc 1: AR
    val out = df.select($"id",
        Curation.fimReorder($"ids", lit(2), lit(4), $"id" === 0L).as("fim"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(out(0) === Seq(-1, 10, 11, -2, 14, -3, 12, 13))
    assert(out(1) === Seq(20, 21, 22))
    // reconstruction: P ++ M ++ S == original
    val fim = out(0)
    val p = fim.slice(1, fim.indexOf(-2))
    val s = fim.slice(fim.indexOf(-2) + 1, fim.indexOf(-3))
    val m = fim.drop(fim.indexOf(-3) + 1)
    assert(p ++ m ++ s === Seq(10, 11, 12, 13, 14))
  }

  test("importance resample: acceptance tracks exp(logw), deterministic in seed") {
    val docs = (0 until 4000).map(i => (i.toLong, (i % 13 - 6) * 0.5))
      .toDF("id", "log_w")
    val kept = Curation.importanceResample(docs, "id", "log_w",
      lrMin = -3.0, lrMax = 3.5, binWidth = 0.5)
    val byBin = kept.groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // acceptance is monotone in the bin, and the top bin keeps ~all its
    // rows while a 3-nats-lower bin keeps ~e^-3 of them
    val bins = byBin.keys.toSeq.sorted
    assert(bins.zip(bins.tail).forall { case (a, b) => byBin(a) <= byBin(b) * 2 },
      s"acceptance must be near-monotone in weight: $byBin")
    assert(byBin(12) > 250 && byBin.getOrElse(6, 0L) < 40,
      s"top bin ~full, mid bin ~e^-3: $byBin")
    // re-running with the same seed reproduces the identical set;
    // a different seed draws a different one
    val again = Curation.importanceResample(docs, "id", "log_w",
      -3.0, 3.5, 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("id").collect().map(_.getLong(0)).toSet)
    val other = Curation.importanceResample(docs, "id", "log_w",
      -3.0, 3.5, 0.5, seed = 97L).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(other !== again)
    // the exposed thresholds are what the operator applied
    val ts = Curation.importanceThresholds(-3.0, 3.5, 0.5)
    val applied = kept.select("bin", "threshold").distinct().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    applied.foreach { case (b, t) => assert(ts(b) === t) }
  }

  test("curriculum order: band-major, deterministic, within-band shuffled") {
    import graft.operators.Mixing
    import org.apache.spark.sql.functions.{col, lit, floor}
    val docs = (0 until 300).map(i => (i.toLong, i % 3)).toDF("id", "difficulty")
    val cur = Mixing.curriculumOrder(docs, "id", col("difficulty"), numShards = 4)
    val rows = cur.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // every doc appears exactly once, in its own band
    assert(rows.length === 300)
    assert(rows.forall { case (id, b, _, _) => b === (id % 3).toInt })
    // positions are dense 1..n within each (band, shard)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length))
    }
    // within a band the id order is shuffled, not ascending
    val band0 = rows.filter(_._2 == 0).sortBy(r => (r._3, r._4)).map(_._1)
    assert(band0.toSeq !== band0.sorted.toSeq, "within-band order must shuffle")
    // deterministic: a re-run reproduces the identical assignment
    val again = Mixing.curriculumOrder(docs, "id", col("difficulty"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
  }

  test("idsToTokens: decode round-trips; unk and out-of-range ids render <unk>") {
    import org.apache.spark.sql.functions.{array_join, col, typedlit}
    val docs = Seq((1L, "b a a c b a"), (2L, "c b d")).toDF("id", "text")
    val vocab = Curation.buildWordVocab(docs, "text", size = 3) // d is OOV
    val out = Curation.tokenizeToIds(docs, "id", "text", vocab)
      .select(col("id"),
        array_join(Curation.idsToTokens(col("ids"), vocab), " ").as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) === "b a a c b a")          // zero-OOV doc round-trips
    assert(out(1) === "c b <unk>")            // OOV decodes to the marker
    // out-of-range ids (corrupt data) also render the marker, not throw
    val weird = Seq(Seq(1, 99, -5, 0)).toDF("ids")
      .select(array_join(Curation.idsToTokens(col("ids"), vocab), " "))
      .head().getString(0)
    assert(weird === "a <unk> <unk> <unk>")
  }

  test("tokenizeToIds refuses a vocab id colliding with unk") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.tokenizeToIds(docs, "id", "text", Seq(("a", 0)), unk = 0)
    }
    assert(e.getMessage.contains("unk"))
  }
}

class SimilaritySuite extends SparkSpec {
  import spark.implicits._

  test("cosine math: orthogonal 0, identical 1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 2f), Array(2f, 4f))).toDF("a", "b")
    val r = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(r(0) === 0.0)
    assert(r(1) === 1.0)
    assert(math.abs(r(2) - 1.0) < 1e-12)
  }

  test("brute force top-k returns k nearest excluding self, deterministic order") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
  }

  test("quantizer save/load round-trips; loaded model probes identically") {
    withTmpDir { tmp =>
      val rng = new scala.util.Random(11)
      val corpus = (0 until 60).map { i =>
        val c = i % 4
        (i.toLong, Array.tabulate(8)(j =>
          (if (j % 4 == c) 10f else 0f) + 0.01f * rng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      val model = Similarity.trainIvfCentroids(
        corpus, "vec_id", "embedding", nlist = 4, iterations = 3)
      Similarity.saveQuantizer(spark, s"$tmp/quant", model)
      val loaded = Similarity.loadQuantizer(spark, s"$tmp/quant")
      assert(loaded.length === model.length)
      model.zip(loaded).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
      // a LATER batch probes the persisted model without retraining and
      // gets the same neighbors the in-memory model gives
      val queries = corpus.filter($"vec_id" < 8)
      def top1(q: Array[Array[Float]]) = Similarity.ivfTopK(
        queries, corpus, "vec_id", "embedding", k = 1, nlist = 4, nprobe = 1,
        quantizer = Some(q))
        .filter($"rank" === 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(top1(loaded) === top1(model))
    }
  }

  test("quantizer drift: aligned batch passes, shifted batch trips retrain") {
    val rng = new scala.util.Random(23)
    def clustered(shift: Float) = (0 until 60).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(j =>
        (if (j % 4 == c) 10f else shift) + 0.01f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val model = Similarity.trainIvfCentroids(
      clustered(0f), "vec_id", "embedding", nlist = 4, iterations = 3)
    val ok = Similarity.quantizerDrift(clustered(0f), "vec_id", "embedding",
      model, minAssignCos = 0.95, maxLowFrac = 0.1).head()
    assert(!ok.getBoolean(3), s"aligned batch must not trip retrain: $ok")
    assert(ok.getLong(0) === 60L)
    // a batch whose off-axes flooded to 10 no longer matches any centroid
    val bad = Similarity.quantizerDrift(clustered(10f), "vec_id", "embedding",
      model, minAssignCos = 0.95, maxLowFrac = 0.1).head()
    assert(bad.getBoolean(3), s"shifted batch must trip retrain: $bad")
    assert(bad.getDouble(1) < ok.getDouble(1),
      "mean assignment cosine must degrade under drift")
  }

  test("drift signals on an EMPTY batch read zeros and false, never NULL") {
    // an empty batch carries no drift evidence — a NULL retrain/rebuild
    // (0/0) would be a silent non-answer to a consumer branching on it
    val model = Array(Array(1f, 0f), Array(0f, 1f))
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Similarity.quantizerDrift(emptyVecs, "vec_id", "embedding",
      model, minAssignCos = 0.9, maxLowFrac = 0.1).head()
    assert(q.getLong(0) === 0L)
    assert(!q.isNullAt(1) && q.getDouble(1) === 0.0, s"mean NULL/dirty: $q")
    assert(!q.isNullAt(2) && q.getDouble(2) === 0.0)
    assert(!q.isNullAt(3) && !q.getBoolean(3), s"retrain must be false: $q")
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val v = graft.operators.Curation.vocabDrift(emptyDocs, "doc_id", "text",
      Seq(("a", 1)), maxDocOov = 0.2, maxHighFrac = 0.2).head()
    assert(v.getLong(0) === 0L && v.getLong(1) === 0L && v.getLong(2) === 0L)
    assert(!v.isNullAt(3) && v.getDouble(3) === 0.0)
    assert(!v.isNullAt(4) && v.getDouble(4) === 0.0)
    assert(!v.isNullAt(5) && !v.getBoolean(5), s"rebuild must be false: $v")
  }

  test("vocabIds rejects a vocab mapping one token under two ids") {
    // binarySearch would land on an arbitrary duplicate — nondeterminism
    // the constructor must refuse
    val e = intercept[IllegalArgumentException] {
      graft.functions.VocabFunctions.vocabIds(
        col("text"), Seq(("the", 1), ("the", 2), ("a", 3)), 0)
    }
    assert(e.getMessage.contains("duplicate tokens"))
  }

  test("drift-triggered retrain cycle: flag fires, retrain clears it") {
    // the maintenance loop the drift signals exist for: batches index
    // under the persisted model until drift fires, then a retrain on the
    // drifted batch restores assignment quality (and the index must be
    // re-keyed under the new model — the SpanDedup re-key discipline)
    val rng = new scala.util.Random(31)
    def batch(twoHot: Boolean) = (0 until 60).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(j =>
        (if (j % 4 == c || (twoHot && (j + 1) % 4 == c)) 10f else 0f) +
          0.01f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val model0 = Similarity.trainIvfCentroids(
      batch(twoHot = false), "vec_id", "embedding", nlist = 4, iterations = 3)
    def drift(b: org.apache.spark.sql.DataFrame, m: Array[Array[Float]]) =
      Similarity.quantizerDrift(b, "vec_id", "embedding", m,
        minAssignCos = 0.95, maxLowFrac = 0.1).head()
    assert(!drift(batch(twoHot = false), model0).getBoolean(3),
      "in-dist batch clean")
    // two-hot clusters: cosine to any one-hot centroid ~= 1/sqrt(2)
    val shifted = batch(twoHot = true)
    assert(drift(shifted, model0).getBoolean(3), "drift must fire")
    // nlist > true cluster count: hash-ordered init can seed two
    // centroids in one cluster, and a merged model would leave a cluster
    // uncovered — over-provisioning is the standard Lloyd hedge
    val model1 = Similarity.trainIvfCentroids(
      shifted, "vec_id", "embedding", nlist = 8, iterations = 5)
    assert(!drift(shifted, model1).getBoolean(3),
      "retraining on the drifted batch must clear the flag")
  }

  test("PQ: encode shape, save/load parity, IVF-PQ finds true neighbors on clustered data") {
    withTmpDir { tmp =>
      val rng = new scala.util.Random(7)
      // 4 tight clusters in 8 dims
      val corpus = (0 until 120).map { i =>
        val c = i % 4
        (i.toLong, Array.tabulate(8)(j =>
          (if (j / 2 == c) 10f else 0f) + 0.05f * rng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      val pq = Similarity.trainPq(corpus, "vec_id", "embedding",
        m = 4, ksub = 8, sampleN = 120, iterations = 5)
      assert(pq.dsub === 2 && pq.m === 4)
      // encode: m byte codes per vector, deterministic, no shuffle
      val enc = Similarity.pqEncode(corpus, "embedding", pq)
      val row = enc.filter($"vec_id" === 3L).select("pq_codes").head()
      assert(row.getSeq[Byte](0).length === 4)
      val plan = enc.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"PQ encode must not shuffle:\n${plan.take(1200)}")
      // save/load gives byte-identical codes
      Similarity.savePqModel(spark, s"$tmp/pq", pq)
      val loaded = Similarity.loadPqModel(spark, s"$tmp/pq")
      val a = Similarity.pqEncode(corpus, "embedding", pq)
        .select("vec_id", "pq_codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
      val b = Similarity.pqEncode(corpus, "embedding", loaded)
        .select("vec_id", "pq_codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
      assert(a === b)
      // recall: IVF-PQ top-1 == brute-force top-1 for >= 90% of queries
      val queries = corpus.filter($"vec_id" < 20)
      val coarse = Similarity.trainIvfCentroids(
        corpus, "vec_id", "embedding", nlist = 4, iterations = 3)
      // rerank must cover the home cluster (30 members): inside a tight
      // cluster every vector shares codes, ADC ties, and a smaller rerank
      // would cut the true neighbor on the id tiebreak
      val got = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
        k = 1, pq, nlist = 4, nprobe = 2, rerank = 40,
        quantizer = Some(coarse))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Similarity.bruteForceTopK(
        queries, corpus, "vec_id", "embedding", k = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hits = want.count { case (q, n) => got.get(q).contains(n) }
      assert(hits >= (want.size * 9) / 10,
        s"IVF-PQ recall too low: $hits of ${want.size}")
    }
  }

  test("ANN drift cycle: stale quantizer crowds buckets past the cap, re-key restores recall") {
    // the quantizer/vocab/gram-order retrain discipline closed for the
    // ANN index: drifted vectors all assign to whatever stale centroid
    // is least-bad, the hot bucket exceeds maxBucket, the cap truncates,
    // and exact twins go missing. The remedy is retrain AND RE-KEY (old
    // bucket ids are meaningless under the new model — the SpanDedup
    // re-key rule); retraining without re-keying must NOT restore.
    val rng = new scala.util.Random(19)
    // regime A: clusters on axis pairs (0,1) (2,3) (4,5) (6,7)
    val a = (0 until 80).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(j =>
        (if (j / 2 == c) 10f else 0f) + 0.02f * rng.nextGaussian().toFloat))
    }
    // regime B (drifted): TWO mutually-orthogonal clusters on the
    // cross-pair combos (0,2) and (1,3) — each sits at cosine ~0.707
    // from its best regime-A centroid (drift fires), and both tie onto
    // the SAME least-bad stale centroid (argmax tie breaks by index), so
    // the stale model funnels 120 vectors into one bucket
    def bvec(axes: (Int, Int)): Array[Float] = Array.tabulate(8)(j =>
      (if (j == axes._1 || j == axes._2) 10f else 0f) +
        0.02f * rng.nextGaussian().toFloat)
    val b1 = (200 until 260).map(i => (i.toLong, bvec((0, 2))))
    val b2 = (300 until 360).map(i => (i.toLong, bvec((1, 3))))
    val b = b1 ++ b2
    val dfA = a.toDF("vec_id", "embedding")
    val dfAll = (a ++ b).toDF("vec_id", "embedding")
    val model0 = Similarity.trainIvfCentroids(dfA, "vec_id", "embedding",
      nlist = 4, iterations = 4)
    val pq = Similarity.trainPq(dfA, "vec_id", "embedding",
      m = 4, ksub = 8, sampleN = 80, iterations = 5)
    assert(Similarity.quantizerDrift(b.toDF("vec_id", "embedding"),
      "vec_id", "embedding", model0, minAssignCos = 0.9, maxLowFrac = 0.1)
      .head().getBoolean(3), "regime shift must trip retrain")
    // exact-twin queries: the TAIL of the crowded bucket (b2's last 40
    // ids) — exactly the rows the maxBucket cap evicts (it keeps the
    // lowest neighbor_ids)
    val targets = b2.takeRight(40)
    val queries = targets.map { case (i, v) => (10000L + i, v) }
      .toDF("vec_id", "embedding")
    def recallFrom(index: org.apache.spark.sql.DataFrame,
        model: Array[Array[Float]]): Double = {
      val top = Similarity.ivfPqTopKFromIndex(queries, index, dfAll,
        "vec_id", "embedding", k = 1, pq, nprobe = 1, rerank = 64,
        maxBucket = 64, quantizer = model)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      targets.count { case (i, _) => top.get(10000L + i).contains(i) }
        .toDouble / targets.size
    }
    def keyed(model: Array[Array[Float]]) =
      Similarity.pqIndexBatch(dfAll, "vec_id", "embedding", pq, model)
    // per-vector noise splits the centroid tie, so regime B smears over
    // TWO crowded buckets rather than one — still far past the cap, and
    // the tail twins mostly evict (observed ~0.35-0.4 recall)
    val stale = recallFrom(keyed(model0), model0)
    assert(stale < 0.6,
      s"stale model must lose the crowded buckets' tails to the cap, recall=$stale")
    // retrain on the drifted corpus (over-provisioned nlist, the Lloyd
    // hedge) and RE-KEY the full index under the new model: the two
    // orthogonal B clusters get their own <= 64-row buckets
    val model1 = Similarity.trainIvfCentroids(dfAll, "vec_id", "embedding",
      nlist = 8, iterations = 5)
    val rekeyed = recallFrom(keyed(model1), model1)
    assert(rekeyed > 0.9,
      s"retrain + re-key must restore twin recall, got $rekeyed")
    // retrain WITHOUT re-key: old index rows probed under new query
    // assignment — bucket ids disagree across models, recall must NOT
    // restore (the rule the re-key/HistoryFormat discipline enforces)
    val mixedRecall = recallFrom(keyed(model0), model1)
    assert(mixedRecall < rekeyed,
      s"new model over an un-re-keyed index must not restore recall " +
        s"(mixed=$mixedRecall, rekeyed=$rekeyed)")
  }

  test("PQ code index accumulated batch-by-batch answers identically to one-shot") {
    val rng = new scala.util.Random(13)
    val corpus = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(8)(j =>
        (if (j / 3 == c) 10f else 0f) + 0.05f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val pq = Similarity.trainPq(corpus, "vec_id", "embedding",
      m = 4, ksub = 8, sampleN = 90, iterations = 5)
    val coarse = Similarity.trainIvfCentroids(
      corpus, "vec_id", "embedding", nlist = 3, iterations = 3)
    // three arriving batches encode under the SAME fixed models and the
    // index rows union — the later-batch codes stay comparable
    val idx = (0 until 3).map(b => Similarity.pqIndexBatch(
        corpus.filter($"vec_id" % 3 === b), "vec_id", "embedding", pq, coarse))
      .reduce(_ unionByName _)
    val queries = corpus.filter($"vec_id" < 10)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fromIndex = Similarity.ivfPqTopKFromIndex(queries, idx, corpus,
      "vec_id", "embedding", k = 1, pq, nprobe = 2, rerank = 40,
      maxBucket = 4096, quantizer = coarse)
    val oneShot = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
      k = 1, pq, nlist = 3, nprobe = 2, rerank = 40, quantizer = Some(coarse))
    assert(res(fromIndex) === res(oneShot))
  }

  test("lsh topk puts identical vectors in the same bucket") {
    val vecs = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(-1f, -2f, -3f, -4f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding", k = 1, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(0L) === 1L)
    assert(out(1L) === 0L)
  }

  test("lsh topk bounds the hot zero-vector bucket instead of cross-joining it") {
    // 500 zero vectors fail every sign test and collapse into bucket 0;
    // the cap keeps the corpus side of the join at maxBucket members
    val zeros = (0 until 500).map(i => (i.toLong, Array(0f, 0f, 0f, 0f)))
    val corpus = (zeros :+ (999L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val queries = Seq((1000L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 100, planes = 4, maxBucket = 10).collect()
    assert(out.length <= 10, s"candidates not bounded: ${out.length}")
    // deterministic truncation: the 10 smallest corpus ids in bucket 0
    assert(out.map(_.getLong(1)).toSet.subsetOf((0L until 10L).toSet))
    // the multi-table branch caps per (table, bucket) the same way: every
    // table's bucket 0 truncates to the same 10 smallest ids, so the
    // deduped candidate set stays bounded
    val multi = Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 100, planes = 4, maxBucket = 10, tables = 3).collect()
    assert(multi.length <= 10, s"multi-table candidates not bounded: ${multi.length}")
    assert(multi.map(_.getLong(1)).toSet.subsetOf((0L until 10L).toSet))
  }

  test("ivf topk bounds a clustered hot bucket") {
    // every corpus vector argmaxes to the same centroid; the cap keeps the
    // join side bounded
    val corpus = (0 until 300).map(i => (i.toLong, Array(1f, 1f, 0f + i * 1e-4f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((999L, Array(1f, 1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 100, nlist = 4, nprobe = 1, maxBucket = 20).collect()
    assert(out.length <= 20, s"candidates not bounded: ${out.length}")
  }

  test("k-means IVF training converges centroids to the data's clusters") {
    // two tight, well-separated clusters on orthogonal axes
    val a = (0 until 40).map(i => (i.toLong, Array(1f, 0f, 0f, i * 1e-3f)))
    val b = (0 until 40).map(i => (100L + i, Array(0f, 1f, i * 1e-3f, 0f)))
    val corpus = (a ++ b).toDF("vec_id", "embedding")
    val trained = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      nlist = 2, iterations = 4)
    assert(trained.length === 2)
    // each trained centroid sits on one cluster's dominant axis
    val axes = trained.map(c => c.indexOf(c.max)).sorted
    assert(axes.toSeq === Seq(0, 1), s"centroids not on cluster axes: ${trained.map(_.toSeq)}")
    // and the dominant component is near the cluster mean (1.0), not a
    // single sampled point's noise
    trained.foreach(c => assert(math.abs(c.max - 1f) < 1e-3))
    // determinism: training twice gives the identical model
    val again = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      nlist = 2, iterations = 4)
    assert(trained.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // the trained quantizer separates the clusters: querying an a-like
    // vector with nprobe=1 returns only a-cluster neighbors
    val q = Seq((999L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(q, corpus, "vec_id", "embedding", k = 5,
      nlist = 2, nprobe = 1, quantizer = Some(trained)).collect()
    assert(out.length === 5)
    assert(out.forall(_.getLong(1) < 100L), "trained bucket must contain only cluster a")
  }

  test("int8 quantization round-trips embeddings within cosine 0.999") {
    val rng = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(32)((rng.nextFloat() - 0.5f) * 4f))) :+ (99L, Array.fill(32)(0f))
    val df = vecs.toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "embedding")
    val back = Similarity.dequantizeInt8(q, "q", "q_scale", "deq")
    val rows = back.select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("deq")).as("cos"),
        array_max(col("q")).as("qmax"), array_min(col("q")).as("qmin"))
      .collect()
    rows.filter(_.getLong(0) != 99L).foreach { r =>
      assert(r.getDouble(1) > 0.999, s"vec ${r.getLong(0)}: cosine ${r.getDouble(1)}")
      assert(r.getByte(2) <= 127 && r.getByte(3) >= -127)
    }
    // the zero vector quantizes to zeros with scale 0, no div-by-zero nulls
    val zero = back.filter(col("vec_id") === 99L)
      .select(col("q_scale"), array_max(col("q"))).head()
    assert(zero.getFloat(0) === 0f && zero.getByte(1) === 0)
  }

  test("null vectors in the dims sample don't mask a live corpus") {
    val corpus = Seq(
      (0L, Option.empty[Array[Float]]),
      (1L, Some(Array(1f, 2f, 3f, 4f))),
      (2L, Some(Array(1f, 2f, 3f, 4.1f)))).toDF("vec_id", "embedding")
    val topk = Similarity.lshTopK(corpus.filter($"vec_id" === 1), corpus,
      "vec_id", "embedding", k = 1, planes = 4).collect()
    assert(topk.length === 1 && topk(0).getLong(1) === 2L)
    val pairs = Dedup.embeddingCosinePairsLsh(corpus, "vec_id", "embedding",
      threshold = 0.9, planes = 4).collect()
    assert(pairs.length === 1)
  }
}

class AsofJoinSuite extends SparkSpec {
  import spark.implicits._
  import graft.operators.AsofJoin

  test("asof join picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("B", 15L, 50.0))
      .toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 5L, 99.0), ("A", 10L, 99.5), ("A", 18L, 100.5), // t=10 tie matches
      ("B", 99L, 48.0))                                     // after B's trade
      .toDF("sym", "t", "bid")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t",
      rightCols = Seq("t", "bid"))
      .orderBy("sym", "t")
      .select("sym", "t", "px", "asof_t", "asof_bid").collect()
    // A@10: tie -> quote@10; A@20: quote@18; B@15: nothing before -> nulls
    assert(out(0).getLong(3) === 10L && out(0).getDouble(4) === 99.5)
    assert(out(1).getLong(3) === 18L && out(1).getDouble(4) === 100.5)
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
    // inner variant drops the unmatched left row
    val inner = AsofJoin.asofJoinInner(trades, quotes, Seq("sym"), "t", "t",
      rightCols = Seq("t", "bid"))
    assert(inner.count() === 2)
  }

  test("asof carries the matched right ROW atomically and ignores NULL right times") {
    val left = Seq(("A", 10L)).toDF("sym", "t")
    val right = Seq(
      // older row fully populated, newest row NULL in one column: the match
      // is the NEWEST row as a unit — its NULL must not splice in 1.0
      (Some("A"), Some(1L), Some(1.0), Some(100.0)),
      (Some("A"), Some(5L), Option.empty[Double], Some(200.0)),
      // NULL right time never matches (right.t <= left.t is never true)
      (Some("A"), Option.empty[Long], Some(999.0), Some(999.0)))
      .toDF("sym", "t", "bid", "ask")
    val out = AsofJoin.asofJoin(left, right, Seq("sym"), "t", "t",
      rightCols = Seq("bid", "ask")).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_bid")),
      "bid must come from the matched t=5 row (NULL), not the older t=1 row")
    assert(out(0).getDouble(out(0).fieldIndex("asof_ask")) === 200.0)
    // inner keeps the row: a matched row with NULL columns is still a match
    assert(AsofJoin.asofJoinInner(left, right, Seq("sym"), "t", "t",
      rightCols = Seq("bid", "ask")).count() === 1)
    // ...but drops a left row with no non-NULL-time right row at all
    val left2 = Seq(("B", 10L)).toDF("sym", "t")
    assert(AsofJoin.asofJoinInner(left2, right, Seq("sym"), "t", "t",
      rightCols = Seq("bid", "ask")).count() === 0)
  }
}

class ZOrderSuite extends SparkSpec {
  import spark.implicits._
  import graft.operators.ZOrder

  test("interleaveBits matches hand-computed Morton codes") {
    // x=0b11 -> bits at positions 0,2 = 0b101; y=0b01 -> bit at position 1
    val df = Seq((3L, 1L), (0L, 0L), (2L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 2))
      .collect().map(_.getLong(0))
    // (3,1): x bits {0,2} y bits {1} -> 0b0111 = 7
    // (2,3): x=0b10 -> pos 2; y=0b11 -> pos 1,3 -> 0b1110 = 14
    assert(z.toSeq === Seq(7L, 0L, 14L))
  }

  test("zValue clusters nearby 2-d points; cluster preserves rows") {
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val z = df.withColumn("z", ZOrder.zValue(df, Seq("x", "y"), bits = 4))
    val zOf = z.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // corners of the space sit at the curve's extremes
    assert(zOf((0L, 0L)) === 0L)
    assert(zOf((15L, 15L)) === 255L)
    // quadrant locality: the whole low-left quadrant precedes the
    // high-right quadrant on the curve (true Morton property)
    val lowLeft = (for (x <- 0 until 8; y <- 0 until 8) yield zOf((x.toLong, y.toLong))).max
    val highRight = (for (x <- 8 until 16; y <- 8 until 16) yield zOf((x.toLong, y.toLong))).min
    assert(lowLeft < highRight)
    val clustered = ZOrder.cluster(df, Seq("x", "y"), numFiles = 4)
    assert(clustered.count() === 256)
    assert(clustered.columns.toSeq === Seq("x", "y"))
  }
}

class MultimodalSuite extends SparkSpec {
  import spark.implicits._

  test("media schema round-trip and feature extraction") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    // same structure (catalogString ignores nullability, which is tighter
    // for literal-built columns)
    assert(media.schema.catalogString === Multimodal.mediaSchema.catalogString)
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getLong(1) === 11L) // "hello world" bytes
    assert(feats(0).getInt(2) >= 16 && feats(0).getInt(3) >= 16)
    assert(feats(1).getLong(1) === 0L)
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats.toSeq === again.toSeq)
  }

  test("image dHash: perceptual near-dups pair up, distinct images don't, stubs excluded") {
    import java.awt.image.BufferedImage
    def gradient(w: Int, h: Int, tweak: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255 / math.max(w - 1, 1)) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      // a near-dup: flip a single pixel block (perceptually ~identical)
      if (tweak > 0) img.setRGB(0, 0, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
      bos.toByteArray
    }
    def checker(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, gradient(64, 32, 0)),
      (2L, gradient(64, 32, 1)),         // near-dup of 1
      (3L, gradient(128, 64, 0)),        // RESIZED copy of 1 — dHash invariant
      (4L, checker(64, 32)),             // genuinely different
      (5L, "not an image".getBytes("UTF-8"))) // stub path, must be excluded
      .toDF("media_id", "content")
    val hashes = Multimodal.imageDHashes(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(hashes(1)._2 && hashes(4)._2, "real images must decode")
    assert(!hashes(5)._2, "non-image must take the stub path")
    // resize invariance: the scaled copy hashes identically
    assert(hashes(3)._1 === hashes(1)._1, "dHash must be resize-invariant")
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)),
      s"near-dup gradient pair must be found: $pairs")
    assert(pairs.contains((1L, 3L)), s"resized copy must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"the checkerboard must not pair with gradients: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "stub hashes must never reach the pair stage")
  }

  test("real png and jpeg decode via JDK ImageIO: dimensions, channels, brightness") {
    import java.awt.image.BufferedImage
    def render(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
      bos.toByteArray
    }
    val png = render(40, 20, "png")
    val jpg = render(64, 32, "jpg")
    val media = Seq((1L, png), (2L, jpg)).toDF("media_id", "content")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    // true dimensions, not the byte-derived stub's
    assert((feats(0).getInt(2), feats(0).getInt(3), feats(0).getInt(4)) === ((40, 20, 3)))
    assert((feats(1).getInt(2), feats(1).getInt(3), feats(1).getInt(4)) === ((64, 32, 3)))
    // half black / half white -> mean luminance ~0.5 (jpeg is lossy: wider tolerance)
    assert(math.abs(feats(0).getDouble(5) - 0.5) < 0.01, s"png brightness ${feats(0).getDouble(5)}")
    assert(math.abs(feats(1).getDouble(5) - 0.5) < 0.05, s"jpg brightness ${feats(1).getDouble(5)}")
    // non-image bytes still take the deterministic stub path
    val txt = Seq((3L, "not an image".getBytes("UTF-8"))).toDF("media_id", "content")
    val f = Multimodal.extractFeatures(txt).collect().head
    // stub: w = 16 + ('n' % 64) = 62, h = 16 + ('e' % 64) = 53
    assert((f.getInt(2), f.getInt(3), f.getInt(4)) === ((62, 53, 3)))
  }

  test("real MJPEG-AVI video decode: RIFF walk finds the movi frames, " +
    "ImageIO reads them, frame sampling emits decodable JPEGs") {
    import java.awt.image.BufferedImage
    def jpegFrame(w: Int, h: Int, shade: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val v = shade & 0xff
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def buildAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = new java.io.ByteArrayOutputStream()
      movi.write("movi".getBytes("ISO-8859-1"))
      frames.foreach { f =>
        movi.write("00dc".getBytes("ISO-8859-1"))
        movi.write(le32(f.length)); movi.write(f)
        if ((f.length & 1) == 1) movi.write(0) // RIFF even padding
      }
      val m = movi.toByteArray
      val body = new java.io.ByteArrayOutputStream()
      body.write("AVI ".getBytes("ISO-8859-1"))
      body.write("LIST".getBytes("ISO-8859-1"))
      body.write(le32(m.length)); body.write(m)
      val b = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("ISO-8859-1"))
      out.write(le32(b.length)); out.write(b)
      out.toByteArray
    }
    val frames = Seq(jpegFrame(48, 24, 0), jpegFrame(48, 24, 128),
      jpegFrame(48, 24, 255))
    val avi = buildAvi(frames)
    val media = Seq((1L, avi), (2L, "definitely not a video".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val feats = Multimodal.extractVideoFeatures(media)
      .orderBy("media_id").collect()
    // real container parse: true frame count, frame-0 dimensions,
    // frame-0 (black) brightness
    assert(feats(0).getAs[Boolean]("decoded"))
    assert(feats(0).getAs[Long]("n_frames") === 3L)
    assert((feats(0).getInt(2), feats(0).getInt(3)) === ((48, 24)))
    assert(feats(0).getAs[Double]("brightness") < 0.05)
    assert(!feats(1).getAs[Boolean]("decoded"),
      "non-AVI bytes must take the stand-in path")
    // stride-2 sampling keeps frames 0 and 2, each a standalone JPEG
    // ImageIO reads back at full dimensions
    val sampled = Multimodal.sampleVideoFrames(
      media.filter(col("media_id") === 1L), stride = 2)
      .orderBy("frame_idx").collect()
    assert(sampled.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(sampled.forall(_.getAs[Boolean]("decoded")))
    sampled.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth === 48 && img.getHeight === 24)
    }
    // the frame-2 (white) JPEG really is frame 2: brightness ~1
    val f2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sampled(1).getAs[Array[Byte]]("frame")))
    assert((f2.getRGB(10, 10) & 0xff) > 240)
    // truncated/hostile AVI bytes never throw — they fall back
    val broken = java.util.Arrays.copyOfRange(avi, 0, 40)
    val bf = Multimodal.extractVideoFeatures(
      Seq((9L, broken)).toDF("media_id", "content")).collect().head
    assert(!bf.getAs[Boolean]("decoded"))
    // a 2^31-adjacent chunk size must not wrap Int arithmetic back into
    // range (hostile header: RIFF/AVI + one chunk claiming ~2GB)
    val overflow = new java.io.ByteArrayOutputStream()
    overflow.write("RIFF".getBytes("ISO-8859-1")); overflow.write(le32(16))
    overflow.write("AVI ".getBytes("ISO-8859-1"))
    overflow.write("xxxx".getBytes("ISO-8859-1"))
    overflow.write(le32(0x7FFFFFF7)); overflow.write(Array[Byte](1, 2, 3, 4))
    val of = Multimodal.extractVideoFeatures(
      Seq((20L, overflow.toByteArray)).toDF("media_id", "content"))
      .collect().head
    assert(!of.getAs[Boolean]("decoded"), "hostile size must fall back")
    // adversarially deep LIST nesting walks iteratively (no stack frames)
    val deep = new java.io.ByteArrayOutputStream()
    deep.write("RIFF".getBytes("ISO-8859-1"))
    val depth = 50000
    deep.write(le32(4 + depth * 12))
    deep.write("AVI ".getBytes("ISO-8859-1"))
    (1 to depth).foreach { d =>
      deep.write("LIST".getBytes("ISO-8859-1"))
      deep.write(le32((depth - d) * 12 + 4))
      deep.write("rec ".getBytes("ISO-8859-1"))
    }
    val df2 = Multimodal.extractVideoFeatures(
      Seq((21L, deep.toByteArray)).toDF("media_id", "content"))
      .collect().head
    assert(!df2.getAs[Boolean]("decoded"), "deep nesting must not crash")
    // fallback frame counts agree between the feature and sampling ops
    val tiny = Seq((22L, Array.fill[Byte](100)(7)))
      .toDF("media_id", "content")
    val nf = Multimodal.extractVideoFeatures(tiny).collect()
      .head.getAs[Long]("n_frames")
    val ns = Multimodal.sampleVideoFrames(tiny, stride = 1).count()
    assert(nf === ns && nf === 1L,
      s"feature/sample frame counts must agree: $nf vs $ns")
    // video near-dup: a re-cut sharing frame content pairs, a disjoint
    // clip doesn't, non-AVI blobs never reach the pair stage. Frames are
    // distinct textured patterns (flat shades all dHash identically —
    // every gradient is zero)
    def patFrame(seed: Int): Array[Byte] = {
      val img = new BufferedImage(48, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 48) {
        val v = ((x * (7 + seed) + y * (13 + 3 * seed)) % 256) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (p1, p2, p3) = (patFrame(1), patFrame(11), patFrame(29))
    val vids = Seq(
      (10L, buildAvi(Seq(p1, p2))),
      (11L, buildAvi(Seq(p2))),            // re-cut sharing p2
      (12L, buildAvi(Seq(p3))),            // disjoint content
      (13L, "not a video at all".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val pairs = Multimodal.videoNearDupPairs(vids, stride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)),
      s"videos sharing frames must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L),
      s"the disjoint clip must not pair: $pairs")
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L),
      "non-AVI blobs must never reach the pair stage")
  }

  test("real wav decode via JDK javax.sound: rate, channels, frames, duration") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def renderWav(rateHz: Int, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rateHz.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = renderWav(16000, 1, 8000)   // 500 ms
    val stereo = renderWav(44100, 2, 44100) // 1000 ms
    val media = Seq((1L, mono), (2L, stereo)).toDF("media_id", "content")
    val feats = Multimodal.extractAudioFeatures(media).orderBy("media_id").collect()
    assert((feats(0).getInt(2), feats(0).getInt(3), feats(0).getLong(4),
      feats(0).getLong(5)) === ((16000, 1, 8000L, 500L)))
    assert((feats(1).getInt(2), feats(1).getInt(3), feats(1).getLong(4),
      feats(1).getLong(5)) === ((44100, 2, 44100L, 1000L)))
    // non-audio bytes take the deterministic stand-in (16 kHz, mono,
    // one frame per 32 bytes) — deterministic across runs
    val txt = Seq((3L, ("x" * 64).getBytes("UTF-8"))).toDF("media_id", "content")
    val f = Multimodal.extractAudioFeatures(txt).collect().head
    assert((f.getInt(2), f.getInt(3), f.getLong(4)) === ((16000, 1, 2L)))
  }

  test("audio envelope fingerprint: re-encodings pair, different content doesn't") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // amplitude-modulated tone; the envelope profile is the content
    def renderTone(rateHz: Int, ms: Int, envPeriodMs: Int,
        gain: Double): Array[Byte] = {
      val fmt = new AudioFormat(rateHz.toFloat, 16, 1, true, false)
      val frames = rateHz * ms / 1000
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val t = i.toDouble / rateHz
        val env = 0.5 + 0.5 * math.sin(2 * math.Pi * t * 1000 / envPeriodMs)
        val s = (math.sin(2 * math.Pi * 440 * t) * env * gain * 12000).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, renderTone(16000, 650, 200, 1.0)),
      (2L, renderTone(16000, 650, 200, 0.7)),  // same content, gain change
      (3L, renderTone(8000, 650, 200, 1.0)),   // same content, resampled
      (4L, renderTone(16000, 650, 57, 1.0)),   // different envelope
      (5L, "not audio at all".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val fps = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(fps(1)._2 && fps(4)._2, "real wavs must decode")
    assert(!fps(5)._2, "non-audio must take the stub path")
    // gain invariance is exact: scaling flips no gradient sign
    assert(fps(2)._1 === fps(1)._1, "gain change must not move the hash")
    val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"gain re-encoding must pair: $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((3L, 1L)),
      s"resampled copy must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"different envelope must not pair: $pairs")
  }

  test("frame sampling emits every stride-th fixed-size slice") {
    val media = Multimodal.asMedia(
      Seq((1L, "abcdefghij")).toDF("id", "payload"), "id", "payload", "video/fake")
    val frames = Multimodal.sampleFrames(media, frameBytes = 3, stride = 2)
      .orderBy("frame_idx").collect()
    // 10 bytes -> 4 frames (0..3), stride 2 -> frames 0 and 2
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]]("frame")) === "abc")
    assert(new String(frames(1).getAs[Array[Byte]]("frame")) === "ghi")
  }
}

class SkewSuite extends SparkSpec {
  import spark.implicits._
  import graft.operators.Skew

  test("salted join equals plain join, spread over salt partitions") {
    val big = (1 to 100).map(i => (if (i <= 90) 1L else 2L, i.toLong)).toDF("k", "id")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).orderBy("id")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val salted = Skew.saltedJoin(big, small, Seq("k"), bigTiebreak = "id",
      saltFactor = 4).orderBy("id")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(salted.toSeq === plain.toSeq)
    // the hot key's rows spread across multiple salt values
    val salts = big.filter($"k" === 1L)
      .select(Skew.salt($"id", 4)).distinct().count()
    assert(salts > 1)
  }

}

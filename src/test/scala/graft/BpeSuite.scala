package graft

import graft.functions.BpeCodec
import graft.operators.Bpe
import graft.operators.Bpe.BpeModel
import graft.state.HistoryFormat
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** BPE subword tokenization: model laws, training determinism, encode
  * equivalence, persistence refusal, drift. */
class BpeSuite extends SparkSpec {

  /** Deterministic sampling harness over scalacheck Gen (the
    * scalatest-scalacheck bridge isn't on the classpath). */
  private def forAllSampled[T](gen: Gen[T], n: Int = 30)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private val alpha = " abcdefghijklmnoprstuvwy".map(_.toString)

  /** Sequential reference: apply each merge in learned order,
    * exhaustively, left to right — classic Sennrich application. The
    * greedy min-rank expression must equal it (BpeCodec's equivalence
    * note). */
  private def sequentialSegment(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      var i = 0
      while (i < syms.size - 1) {
        if (syms(i) == l && syms(i + 1) == r)
          syms = syms.patch(i, Seq(l + r), 2)
        else i += 1
      }
    }
    syms
  }

  /** Driver-side reference trainer (pair counts over word types,
    * overlapping occurrences, (cnt DESC, l, r) argmax). */
  private def referenceTrain(words: Map[String, Long],
      n: Int): Seq[(String, String, Long)] = {
    var segs = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    var out = Vector.empty[(String, String, Long)]
    var done = false
    while (out.size < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- words; s = segs(w); i <- 0 until s.size - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out :+= ((l, r, c))
        segs = segs.map { case (w, s) =>
          var v = s; var i = 0
          while (i < v.size - 1) {
            if (v(i) == l && v(i + 1) == r) v = v.patch(i, Seq(l + r), 2)
            else i += 1
          }
          w -> v
        }
      }
    }
    out
  }

  test("trainMerges matches the driver-side reference trainer") {
    val ref = docs.limit(60)
    val words = ref.select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.trainMerges(ref, "text", 8)
    assert(got == referenceTrain(words, 8))
  }

  test("training is deterministic under repartitioning") {
    val ref = docs.limit(80)
    val a = Bpe.trainMerges(ref, "text", 5)
    val b = Bpe.trainMerges(ref.repartition(7), "text", 5)
    val c = Bpe.trainMerges(ref.orderBy(col("doc_id").desc), "text", 5)
    assert(a == b && a == c)
  }

  test("greedy min-rank segmentation equals sequential merge application") {
    // valid merge lists come from training on random word sets — every
    // merge side is then a symbol formed earlier, as in any real model
    val wordGen = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ab".toSeq)).map(_.mkString))
    val corpusGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, wordGen))
    forAllSampled(Gen.zip(corpusGen, Gen.chooseNum(0, 8)), 60) { case (ws, n) =>
      val freqs = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val merges = referenceTrain(freqs, n).map(m => (m._1, m._2))
      val ranks = BpeCodec.ranksMap(merges)
      ws.foreach { w =>
        val greedy = {
          val s = BpeCodec.segment(w, ranks)
          (0 until s.size).map(s.get)
        }
        assert(greedy == sequentialSegment(w, merges),
          s"word=$w merges=$merges")
      }
    }
  }

  test("encode round-trips through decode for in-alphabet text") {
    val model = Bpe.train(docs, "text", 12)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
      .join(docs.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("n_oov"),
        (Bpe.decode(col("ids"), model) === col("text")).as("ok"))
      .collect()
    assert(enc.nonEmpty)
    assert(enc.forall(_.getLong(1) == 0L), "corpus-trained model has no OOV")
    assert(enc.forall(_.getBoolean(2)), "decode(encode(text)) == text")
  }

  test("unknown symbols map to unk=0 and decode lossily") {
    val model = BpeModel(alpha.filterNot(_ == "q"), Seq("e" -> "r"))
    import spark.implicits._
    val df = Seq((1L, "query era")).toDF("id", "text")
    val out = Bpe.encode(df, "id", "text", model).collect().head
    assert(out.getLong(3) == 1L, "one unk for the q")
    val decoded = Bpe.encode(df, "id", "text", model)
      .select(Bpe.decode(col("ids"), model).as("t")).collect().head.getString(0)
    assert(decoded == "�uery era")
  }

  test("decode treats a NULL array element as unk in BOTH eval paths " +
    "(user-built array<int> with containsNull=true passes the type check)") {
    val model = BpeModel(alpha, Seq.empty)
    import spark.implicits._
    // alpha ids are 1-based: 2 -> "a", 3 -> "b"
    val df = Seq((1L, Seq(Some(2), None, Some(3)))).toDF("id", "ids")
    val codegen = df.select(Bpe.decode(col("ids"), model).as("t"))
      .collect().head.getString(0)
    assert(codegen == "a�b", s"codegen path got '$codegen'")
    // interpreted path: force eval() by disabling codegen for this query
    val ws = "spark.sql.codegen.wholeStage"
    val fm = "spark.sql.codegen.factoryMode"
    val (ws0, fm0) = (spark.conf.get(ws), spark.conf.get(fm, "FALLBACK"))
    try {
      spark.conf.set(ws, "false"); spark.conf.set(fm, "NO_CODEGEN")
      val got = df.select(Bpe.decode(col("ids"), model).as("t"))
        .collect().head.getString(0)
      assert(got == "a�b", s"interpreted path got '$got'")
    } finally { spark.conf.set(ws, ws0); spark.conf.set(fm, fm0) }
  }

  test("empty words (double spaces) round-trip via interleaved space ids") {
    val model = BpeModel(alpha, Seq.empty)
    import spark.implicits._
    val df = Seq((1L, "a  b"), (2L, " a"), (3L, "")).toDF("id", "text")
    val got = Bpe.encode(df, "id", "text", model)
      .select(col("id"), Bpe.decode(col("ids"), model).as("t"),
        col("n_tokens"))
      .orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a  b", " a", ""))
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 2L, 0L))
  }

  test("byte fallback: arbitrary UTF-8 round-trips byte-exactly with " +
    "zero OOV, and in-alphabet encoding is unchanged") {
    import spark.implicits._
    val model = BpeModel(alpha, Seq("e" -> "r", "s" -> "t"),
      byteFallback = true)
    // code points across every UTF-8 width (skip the surrogate range —
    // lone surrogates are not valid strings)
    val cpGen = Gen.oneOf(
      Gen.chooseNum(0x20, 0x7E), Gen.chooseNum(0xA0, 0x7FF),
      Gen.chooseNum(0x800, 0xD7FF), Gen.chooseNum(0x10000, 0x10FFFF))
    val strGen = Gen.listOfN(12, cpGen)
      .map(cps => new String(cps.toArray.flatMap(Character.toChars)))
    forAllSampled(Gen.listOfN(8, strGen), 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = Bpe.encode(df, "id", "text", model)
        .join(df, "id")
        .select(col("id"), col("n_oov"),
          (Bpe.decode(col("ids"), model) === col("text")).as("ok"))
        .collect()
      assert(got.forall(_.getLong(1) == 0L), "byte fallback leaves no OOV")
      assert(got.forall(_.getBoolean(2)),
        "decode(encode(text)) must be byte-exact on arbitrary UTF-8")
    }
    // the fallback never perturbs in-alphabet encoding: same ids as the
    // unk model on covered text, byte ids confined to the byte range
    val plain = model.copy(byteFallback = false)
    val txt = Seq((1L, "ster era  wow"), (2L, "qé€ st"))
      .toDF("id", "text")
    val a = Bpe.encode(txt, "id", "text", model)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    val b = Bpe.encode(txt, "id", "text", plain)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(a(0) === b(0), "covered text encodes identically")
    val nSyms = model.symbols.size
    assert(a(1).forall(id => id >= 1 && id <= nSyms + 256),
      "fallback ids confined to (nSyms, nSyms + 256]")
    assert(a(1).exists(id => id > nSyms), "plants must use byte ids")
    assert(!a(1).contains(Bpe.Unk), "fallback leaves no unk")
    // é = 2 bytes, € = 3 bytes, q = 1 byte: the unk model saw 3 unk
    // symbols, the fallback spends 6 byte ids for the same word
    assert(b(1).count(_ == Bpe.Unk) == 3 &&
      a(1).length == b(1).length + 3)
  }

  test("byte fallback flag persists and flagless legacy tables load " +
    "as unk models") {
    withTmpDir { dir =>
      val fb = BpeModel(alpha, Seq("e" -> "r"), byteFallback = true)
      Bpe.save(spark, s"$dir/fb", fb)
      val loaded = Bpe.load(spark, s"$dir/fb")
      assert(loaded == fb && loaded.byteFallback &&
        loaded.byteBase == fb.symbols.size &&
        loaded.vocabSize == 1 + fb.symbols.size + 256)
      val plain = fb.copy(byteFallback = false)
      Bpe.save(spark, s"$dir/plain", plain)
      assert(!Bpe.load(spark, s"$dir/plain").byteFallback,
        "a save without the opt row loads as a plain unk model")
    }
  }

  test("model persists, reloads equal, and refuses a stale format") {
    withTmpDir { dir =>
      val model = Bpe.train(docs.limit(40), "text", 6)
      val path = s"$dir/bpe"
      Bpe.save(spark, path, model)
      assert(Bpe.load(spark, path) == model)
      // stale format version → the operator itself refuses, naming the
      // retrain remedy (operator-enforced HistoryFormat contract)
      HistoryFormat.stamp(conf, path,
        HistoryFormat.Format("bpe-merges", 99, "x"))
      val e = intercept[IllegalStateException](Bpe.load(spark, path))
      assert(e.getMessage.contains("re-train the BPE model"))
      // marker deleted under existing data → legacy refusal
      new java.io.File(s"$path/_graft_history_format.json").delete()
      val e2 = intercept[IllegalStateException](Bpe.load(spark, path))
      assert(e2.getMessage.contains("no _graft_history_format.json"))
    }
  }

  test("degenerate models are rejected loudly") {
    intercept[IllegalArgumentException] {
      BpeModel(Seq("a", "b"), Seq.empty) // no space symbol
    }
    intercept[IllegalArgumentException] {
      BpeModel(Seq(" ", "b", "a"), Seq.empty) // unsorted
    }
    intercept[IllegalArgumentException] {
      BpeModel(Seq(" ", "a", "b"), Seq("a" -> "x")) // forward reference
    }
    intercept[IllegalArgumentException] {
      // duplicate symbol string: merge (a,ab) and (aa,b) both form "aab"
      BpeModel(Seq(" ", "a", "b"),
        Seq("a" -> "b", "a" -> "a", "a" -> "ab", "aa" -> "b"))
    }
  }

  test("drift flags a shifted batch and passes an in-distribution one") {
    val model = Bpe.train(docs, "text", 8)
    val inDist = Bpe.drift(docs, "doc_id", "text", model,
      maxDocOov = 0.1, maxHighFrac = 0.2).collect().head
    assert(!inDist.getAs[Boolean]("rebuild"))
    assert(inDist.getAs[Long]("n_oov") == 0L)
    val shifted = docs.select(col("doc_id"),
      translate(col("text"), "ae", "48").as("text"))
    val drifted = Bpe.drift(shifted, "doc_id", "text", model,
      maxDocOov = 0.1, maxHighFrac = 0.2).collect().head
    assert(drifted.getAs[Boolean]("rebuild"))
    assert(drifted.getAs[Long]("n_oov") > 0L)
  }

  test("encode under a persisted model is batch-invariant") {
    withTmpDir { dir =>
      val model = Bpe.train(docs, "text", 10)
      Bpe.save(spark, s"$dir/m", model)
      val loaded = Bpe.load(spark, s"$dir/m")
      val whole = Bpe.encode(docs, "doc_id", "text", model)
        .withColumn("ids", array_join(col("ids"), ","))
      val batches = Bpe.encode(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", loaded)
        .unionByName(Bpe.encode(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", loaded))
        .withColumn("ids", array_join(col("ids"), ","))
      assert(whole.exceptAll(batches).isEmpty &&
        batches.exceptAll(whole).isEmpty)
    }
  }

  test("fertility reports subwords-per-word by source, exact fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "ab ab", "s0"),     // with merge a+b: 2 subwords + 1 space = 3 tok, 2 words
      (2L, "ab", "s0"),        // 1 tok, 1 word
      (3L, "cd", "s1")         // no merge: c d = 2 tok, 1 word
    ).toDF("doc_id", "text", "source")
    val m = Bpe.BpeModel(Seq(" ", "a", "b", "c", "d"), Seq("a" -> "b"))
    val r = Bpe.fertility(df, "doc_id", "text", "source", m)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6)))
    // s0: 3 docs? no - 2 docs, words 2+1=3, subwords 3+1=4 -> 1.3333
    assert(r === Array(("s0", 2L, 3L, 4L, 0L, 1.3333, 0.0),
      ("s1", 1L, 1L, 2L, 0L, 2.0, 0.0)))
  }
}

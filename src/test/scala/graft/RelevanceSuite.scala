package graft

import graft.operators.Relevance

/** TF-IDF / BM25 relevance scoring against hand-computed fixtures. */
class RelevanceSuite extends SparkSpec {
  import spark.implicits._

  // 4 docs, known term statistics
  private def corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry cherry"),
    (3L, "apple date"),
    (4L, "elderberry date date")).toDF("doc_id", "text")

  test("tfIdfTopTerms ranks by tf*N/df with term tie-break and exact counts") {
    val out = Relevance.tfIdfTopTerms(corpus, "doc_id", "text", k = 2)
      .orderBy("id", "rnk").collect()
    // doc 1: apple tf=2 df=2 rel=2*4/2=4 ; banana tf=1 df=2 rel=2 ; cherry tf=1 df=2 rel=2
    //   -> rnk1 apple, rnk2 banana (tie with cherry broken by term asc)
    val d1 = out.filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getString(2)))
    assert(d1.toSeq === Seq((1L, "apple"), (2L, "banana")))
    // doc 2: cherry tf=3 df=2 rel=6 tops banana tf=1 df=2 rel=2
    val d2 = out.filter(_.getLong(0) == 2L).map(_.getString(2))
    assert(d2.toSeq === Seq("cherry", "banana"))
    // doc 4: date tf=2 df=2 rel=4 vs elderberry tf=1 df=1 rel=4 — equal
    //   rationals, tie broken by term: date first
    val d4 = out.filter(_.getLong(0) == 4L).map(_.getString(2))
    assert(d4.toSeq === Seq("date", "elderberry"))
    // tfidf value: doc1 apple = round(2 * ln(4/2), 4) = 1.3863
    val a1 = out.find(r => r.getLong(0) == 1L && r.getString(2) == "apple").get
    assert(a1.getLong(3) === 2L) // tf
    assert(a1.getLong(4) === 2L) // df
    assert(a1.getDouble(5) === math.rint(2 * math.log(2) * 1e4) / 1e4)
  }

  test("tfIdfTopTermsUnderStats: same-reference parity with tfIdfTopTerms, " +
    "frozen df under new batches, snapshot-unseen terms do not rank") {
    import org.apache.spark.sql.functions.col
    val stats = Relevance.bm25CollectionStats(corpus, "doc_id", "text")
    // parity LAW: stats from the corpus itself reproduce the plain path
    // bit-for-bit (single-space tokenization, no empty tokens)
    val frozen = Relevance.tfIdfTopTermsUnderStats(corpus, "doc_id", "text",
      k = 3, stats).orderBy("id", "rnk").collect().toSeq
    val plain = Relevance.tfIdfTopTerms(corpus, "doc_id", "text", k = 3)
      .orderBy("id", "rnk").collect().toSeq
    assert(frozen === plain, "same-reference parity must be exact")
    // the POINT of freezing: a new batch scores under the SNAPSHOT's
    // df/N — 'apple' keeps df=2, N=4 no matter what the batch holds
    val batch = Seq((10L, "apple apple banana"), (11L, "apple cherry"))
      .toDF("doc_id", "text")
    val got = Relevance.tfIdfTopTermsUnderStats(batch, "doc_id", "text",
      k = 5, stats).collect()
    assert(got.filter(_.getString(2) == "apple")
      .forall(r => r.getAs[Long]("df") === 2L), "df must come from the snapshot")
    // a term the snapshot never saw does not rank (its arrival rate is
    // bm25StatsDrift's new_term_rate — the rebuild signal)
    val unseen = Relevance.tfIdfTopTermsUnderStats(
      Seq((20L, "zucchini apple")).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, stats).collect()
    assert(unseen.map(_.getString(2)).toSet === Set("apple"),
      "snapshot-unseen terms must not rank")
    // the marker-enforced table probe round-trips
    withTmpDir { tmp =>
      Relevance.saveBm25Stats(spark, s"$tmp/stats", stats)
      val viaTable = Relevance.tfIdfTopTermsUnderStatsTable(corpus, "doc_id",
        "text", k = 3, s"$tmp/stats").orderBy("id", "rnk").collect().toSeq
      assert(viaTable === plain)
    }
    intercept[IllegalArgumentException](
      Relevance.tfIdfTopTermsUnderStats(corpus, "doc_id", "text", 0, stats))
  }

  test("df-only stats refuse loudly: a snapshot missing its 'n' scalar " +
    "row must not NULL-score every batch row (tfidf AND bm25 paths)") {
    val stats = Relevance.bm25CollectionStats(corpus, "doc_id", "text")
    val dfOnly = stats.filter(org.apache.spark.sql.functions
      .col("kind") === "df")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val e1 = intercept[Exception] {
      Relevance.tfIdfTopTermsUnderStats(corpus, "doc_id", "text", k = 3,
        dfOnly).collect()
    }
    assert(msgs(e1).exists(_.contains("no positive 'n' scalar")),
      msgs(e1).mkString("|"))
    val e2 = intercept[Exception] {
      Relevance.bm25UnderStats(corpus, "doc_id", "text", dfOnly,
        query = Seq("apple")).collect()
    }
    assert(msgs(e2).exists(_.contains("missing a positive 'n' or 'sumdl'")),
      msgs(e2).mkString("|"))
    // BOTH scalars are load-bearing for bm25: a snapshot holding 'n' but
    // not 'sumdl' (the same malformed-slice class one column over) would
    // NULL every score via avgdl — the guard must catch that side too
    val noSumdl = stats.filter(org.apache.spark.sql.functions
      .col("kind") =!= "sumdl")
    val e3 = intercept[Exception] {
      Relevance.bm25UnderStats(corpus, "doc_id", "text", noSumdl,
        query = Seq("apple")).collect()
    }
    assert(msgs(e3).exists(_.contains("missing a positive 'n' or 'sumdl'")),
      msgs(e3).mkString("|"))
    // a well-formed snapshot still passes the guard unchanged
    assert(Relevance.bm25UnderStats(corpus, "doc_id", "text", stats,
      query = Seq("apple")).count() === 2L)
  }

  test("bm25 matches a hand-computed score and skips non-matching docs") {
    val out = Relevance.bm25(corpus, "doc_id", "text", query = Seq("apple"))
      .orderBy("id").collect()
    // only docs 1 and 3 contain "apple"
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // N=4 docs, df(apple)=2, dl = (4,4,2,3), avgdl = 13/4 = 3.25
    val idf = math.log(1d + (4 - 2 + 0.5) / (2 + 0.5))
    def sat(tf: Long, dl: Long) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.25)))
    val exp1 = BigDecimal(idf * sat(2, 4)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val exp3 = BigDecimal(idf * sat(1, 2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(out(0).getDouble(1) === exp1.toDouble)
    assert(out(1).getDouble(1) === exp3.toDouble)
  }

  test("bm25 sums per-term partials for multi-term queries") {
    val out = Relevance.bm25(corpus, "doc_id", "text",
      query = Seq("banana", "cherry")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // doc 2 has both terms; its score strictly exceeds either single-term run
    val single = Relevance.bm25(corpus, "doc_id", "text", query = Seq("cherry"))
      .filter($"id" === 2L).head().getDouble(1)
    val both = out.find(_.getLong(0) == 2L).get.getDouble(1)
    assert(both > single)
  }

  test("bm25Multi is bit-identical to per-query bm25 from one scan") {
    val qs = Map(0 -> Seq("banana", "cherry"), 1 -> Seq("apple"),
      2 -> Seq("banana"))
    val multi = Relevance.bm25Multi(corpus, "doc_id", "text", qs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    qs.foreach { case (qid, terms) =>
      val solo = Relevance.bm25(corpus, "doc_id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = multi.collect { case ((q, id), s) if q == qid => id -> s }.toMap
      assert(got === solo, s"query $qid diverged")
    }
  }

  test("rrfFuse ranks by reciprocal-rank sum with id tie-breaks") {
    // lex: ids 1,2,3 ranked 1,2,3; sem: ids 2,4 ranked 1,2
    val lex = Seq((0L, 1L, 3.0), (0L, 2L, 2.0), (0L, 3L, 1.0))
      .toDF("query_id", "id", "score")
    val sem = Seq((0L, 2L, 9.0), (0L, 4L, 8.0))
      .toDF("query_id", "id", "score")
    val out = Relevance.rrfFuse(lex, sem, rrfK = 60, innerTop = 10, k = 10)
      .orderBy("rrf_rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // id2 appears in both lists: 1/62 + 1/61; then id1 (1/61), id4 (1/62), id3 (1/63)
    assert(out.map(_._2).toSeq === Seq(2L, 1L, 4L, 3L))
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._3 === rd(1d / 62 + 1d / 61))
    assert(out(1)._3 === rd(1d / 61))
    // innerTop cuts a list before fusing
    val cut = Relevance.rrfFuse(lex, sem, rrfK = 60, innerTop = 1, k = 10)
      .collect().map(r => r.getLong(2)).toSet
    assert(cut === Set(1L, 2L), s"got $cut")
  }
}

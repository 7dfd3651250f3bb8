package graft

import graft.operators.{Curation, Profile, Relevance, Sft, Similarity}
import graft.operators.QualityClf.Model
import org.apache.spark.sql.functions._

/** Round-14 audit/eval operators: prototype cluster pruning, retrieval
  * metrics, Cohen's kappa rater agreement, best-of-n rejection
  * sampling, and the ANALYZE-style table profile. Laws beyond the
  * oracle replays: quotas, flip symmetry, partition-order independence,
  * hand-computed metric values, and edge contracts (empty input,
  * degenerate raters, single-candidate prompts). */
class CurationAuditSuite extends SparkSpec {
  import spark.implicits._

  // --- clusterPrune -------------------------------------------------------

  /** Two well-separated axis clusters in 4 dims; ids 1-6 near e1,
    * ids 11-14 near e2, with varying off-axis noise so prototypicality
    * (cosine to centroid) strictly orders within each cluster. */
  private def twoClusters = Seq(
    (1L, Seq(100f, 0f, 0f, 0f)), (2L, Seq(100f, 10f, 0f, 0f)),
    (3L, Seq(100f, 20f, 0f, 0f)), (4L, Seq(100f, 30f, 0f, 0f)),
    (5L, Seq(100f, 40f, 0f, 0f)), (6L, Seq(100f, 50f, 0f, 0f)),
    (11L, Seq(0f, 0f, 100f, 0f)), (12L, Seq(0f, 0f, 100f, 15f)),
    (13L, Seq(0f, 0f, 100f, 30f)), (14L, Seq(0f, 0f, 100f, 45f))
  ).toDF("id", "v")

  private val quant = Array(
    Array(1f, 0f, 0f, 0f), Array(0f, 0f, 1f, 0f))

  test("clusterPrune: per-cluster quota is floor(permille*n/1000) and " +
    "the kept set is the least-prototypical rank prefix") {
    val out = Similarity.clusterPrune(twoClusters, "id", "v", quant,
      keepPermille = 500).collect()
    val byCluster = out.groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.keySet === Set(0, 1))
    // cluster 0 has 6 rows -> keep 3; cluster 1 has 4 -> keep 2
    assert(byCluster(0).count(_.getAs[Boolean]("keep")) === 3)
    assert(byCluster(1).count(_.getAs[Boolean]("keep")) === 2)
    // hardest = farthest from centroid = largest off-axis noise
    val kept0 = byCluster(0).filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("id")).toSet
    assert(kept0 === Set(4L, 5L, 6L))
    val kept1 = byCluster(1).filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("id")).toSet
    assert(kept1 === Set(13L, 14L))
  }

  test("clusterPrune: keepEasiest flips the kept prefix to the most " +
    "prototypical rows") {
    val out = Similarity.clusterPrune(twoClusters, "id", "v", quant,
      keepPermille = 500, keepEasiest = true).collect()
    val kept = out.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("id")).toSet
    assert(kept === Set(1L, 2L, 3L, 11L, 12L))
  }

  test("clusterPrune: partition-order independent and null/ragged " +
    "vectors drop") {
    val ragged = twoClusters
      .union(Seq((99L, Seq(1f, 2f)), (98L, null.asInstanceOf[Seq[Float]]))
        .toDF("id", "v"))
    val a = Similarity.clusterPrune(ragged.repartition(7, col("id")),
      "id", "v", quant, keepPermille = 300).collect().sortBy(_.getLong(0))
    val b = Similarity.clusterPrune(ragged.orderBy(col("id").desc).coalesce(1),
      "id", "v", quant, keepPermille = 300).collect().sortBy(_.getLong(0))
    assert(a.toSeq === b.toSeq)
    assert(!a.exists(r => r.getLong(0) == 99L || r.getLong(0) == 98L))
  }

  test("clusterPruneAgainstHistory: the cumulative kept count per cluster " +
    "tracks floor(permille*seen/1000) across two skewed batches, and the " +
    "empty history reduces to the batch-local quota") {
    import org.apache.spark.sql.DataFrame
    val empty = Seq.empty[(Int, Long, Long)].toDF("cluster", "seen", "kept")
    val b1 = twoClusters.filter(col("id").isin(1L, 2L, 3L, 11L, 12L))
    val b2 = twoClusters.filter(col("id").isin(4L, 5L, 6L, 13L, 14L))
    val o1 = Similarity.clusterPruneAgainstHistory(b1, "id", "v", quant,
      keepPermille = 500, history = empty)
    val h1 = Similarity.prunedCounts(o1)
    val o2 = Similarity.clusterPruneAgainstHistory(b2, "id", "v", quant,
      keepPermille = 500, history = h1)
    def keptBy(df: DataFrame) = df.collect()
      .groupBy(_.getAs[Int]("cluster"))
      .view.mapValues(_.count(_.getAs[Boolean]("keep")).toLong).toMap
    // batch 1 under empty history == batch-local floor quota
    assert(keptBy(o1) === Map(0 -> 1L, 1 -> 1L))
    // cumulative after batch 2: cluster 0 saw 6 -> floor(3.0)=3 kept,
    // cluster 1 saw 4 -> 2 kept
    val total = keptBy(o1).map { case (c, k) => c -> (k + keptBy(o2)(c)) }
    assert(total === Map(0 -> 3L, 1 -> 2L))
    // and batch 2's kept rows are its hardest (rank-prefix) members
    o2.collect().groupBy(_.getAs[Int]("cluster")).foreach { case (_, g) =>
      val kept = g.filter(_.getAs[Boolean]("keep"))
      if (kept.nonEmpty)
        assert(kept.map(_.getAs[Long]("rnk")).max === kept.length.toLong)
    }
  }

  // --- retrievalMetrics ---------------------------------------------------

  test("retrievalMetrics: hand-computed MRR/recall/precision/nDCG on a " +
    "known ranking") {
    // query 1: relevant docs {10, 30}; retrieved ranks docs 20,10,30
    //   (scores 9,8,7) -> first rel rank 2, hits 2
    // query 2: relevant {40}; retrieved ranks 40 first -> perfect
    val results = Seq(
      (1L, 20L, 9.0), (1L, 10L, 8.0), (1L, 30L, 7.0),
      (2L, 40L, 5.0), (2L, 50L, 4.0)).toDF("query_id", "id", "score")
    val qrels = Seq((1L, 10L), (1L, 30L), (2L, 40L))
      .toDF("query_id", "id")
    val out = Relevance.retrievalMetrics(results, qrels, k = 10)
      .orderBy("query_id").collect()
    val d9 = Relevance.dcgDiscounts9(10)
    val q1 = out(0)
    assert(q1.getAs[Long]("n_rel") === 2L)
    assert(q1.getAs[Long]("hits") === 2L)
    assert(q1.getAs[Double]("rr") === 0.5)
    assert(q1.getAs[Double]("recall_at_k") === 1.0)
    assert(q1.getAs[Double]("precision_at_k") === 0.2)
    val expNdcg1 = BigDecimal((d9(1) + d9(2)).toDouble / (d9(0) + d9(1)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("ndcg_at_k") === expNdcg1)
    // AP: hits at ranks 2 and 3 -> (1/2 + 2/3)/2, terms rounded at 6
    // before the exact decimal sum
    assert(q1.getAs[Double]("ap_at_k") === 0.5833)
    val q2 = out(1)
    assert(q2.getAs[Double]("rr") === 1.0)
    assert(q2.getAs[Double]("ndcg_at_k") === 1.0)
    assert(q2.getAs[Double]("recall_at_k") === 1.0)
    assert(q2.getAs[Double]("ap_at_k") === 1.0)
  }

  test("retrievalMetrics: a query whose relevant docs were never " +
    "retrieved still reports (recall 0, rr 0), and a query with no " +
    "qrels reports recall 0") {
    val results = Seq((1L, 20L, 9.0)).toDF("query_id", "id", "score")
    val qrels = Seq((2L, 40L)).toDF("query_id", "id")
    val out = Relevance.retrievalMetrics(results, qrels, k = 5)
      .orderBy("query_id").collect()
    assert(out.length === 2)
    val q1 = out(0) // retrieved, no qrels
    assert(q1.getAs[Long]("n_rel") === 0L &&
      q1.getAs[Double]("recall_at_k") === 0.0 &&
      q1.getAs[Double]("ndcg_at_k") === 0.0)
    val q2 = out(1) // qrels, never retrieved
    assert(q2.getAs[Long]("n_retrieved") === 0L &&
      q2.getAs[Double]("rr") === 0.0 &&
      q2.getAs[Double]("recall_at_k") === 0.0)
  }

  test("retrievalMetrics: duplicate (query, id) result rows collapse to " +
    "their best score — recall/AP stay in [0,1]") {
    val results = Seq((1L, 10L, 9.0), (1L, 10L, 8.9), (1L, 20L, 7.0))
      .toDF("query_id", "id", "score")
    val qrels = Seq((1L, 10L)).toDF("query_id", "id")
    val r = Relevance.retrievalMetrics(results, qrels, k = 10).head
    assert(r.getAs[Long]("hits") === 1L)
    assert(r.getAs[Long]("n_retrieved") === 2L)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Double]("ap_at_k") === 1.0)
  }

  test("retrievalMetrics: ranks beyond k never contribute (hit at rank " +
    "k+1 counts zero)") {
    val results = (1 to 4).map(r => (1L, r.toLong, 10.0 - r))
      .toDF("query_id", "id", "score")
    val qrels = Seq((1L, 4L)).toDF("query_id", "id") // ranked 4th, k=3
    val out = Relevance.retrievalMetrics(results, qrels, k = 3).collect()
    assert(out.head.getAs[Long]("hits") === 0L)
    assert(out.head.getAs[Double]("rr") === 0.0)
    assert(out.head.getAs[Long]("n_retrieved") === 3L)
  }

  // --- raterAgreement -----------------------------------------------------

  test("raterAgreement: perfect agreement has kappa 1, a planted 2x2 " +
    "table matches the hand-computed kappa") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    val p = Curation.raterAgreement(perfect, col("a"), col("b")).head
    assert(p.getAs[Double]("kappa") === 1.0 &&
      !p.getAs[Boolean]("degenerate"))
    // n11=20 n10=5 n01=10 n00=15: po=0.7, pe=(25/50)(30/50)+(25/50)(20/50)=0.5
    // kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val r = Curation.raterAgreement(rows.toDF("a", "b"), col("a"), col("b"))
      .head
    assert(r.getAs[Long]("n") === 50L && r.getAs[Double]("po") === 0.7)
    assert(r.getAs[Double]("pe") === 0.5 && r.getAs[Double]("kappa") === 0.4)
  }

  test("raterAgreement: constant raters read degenerate (kappa 0), " +
    "empty input reads all-zero not NULL") {
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val c = Curation.raterAgreement(const, col("a"), col("b")).head
    assert(c.getAs[Boolean]("degenerate") && c.getAs[Double]("kappa") === 0.0)
    val empty = Seq.empty[(Boolean, Boolean)].toDF("a", "b")
    val e = Curation.raterAgreement(empty, col("a"), col("b")).head
    assert(e.getAs[Long]("n") === 0L && e.getAs[Double]("kappa") === 0.0 &&
      e.getAs[Boolean]("degenerate"))
  }

  test("gateEval: a planted confusion table matches the hand-computed " +
    "precision/recall/F1, and empty/one-class edges read 0.0 not NULL") {
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(4)((false, false))
    val r = Curation.gateEval(rows.toDF("t", "p"), col("t"), col("p")).head
    assert(r.getAs[Long]("tp") === 3L && r.getAs[Long]("fp") === 1L &&
      r.getAs[Long]("fn") === 2L && r.getAs[Long]("tn") === 4L)
    assert(r.getAs[Double]("precision") === 0.75 &&
      r.getAs[Double]("recall") === 0.6 &&
      r.getAs[Double]("f1") === 0.6667 &&
      r.getAs[Double]("accuracy") === 0.7)
    val empty = Curation.gateEval(
      Seq.empty[(Boolean, Boolean)].toDF("t", "p"), col("t"), col("p")).head
    assert(empty.getAs[Long]("n") === 0L &&
      empty.getAs[Double]("f1") === 0.0 &&
      empty.getAs[Double]("accuracy") === 0.0)
    val allNeg = Curation.gateEval(
      Seq((false, false), (false, false)).toDF("t", "p"),
      col("t"), col("p")).head
    assert(allNeg.getAs[Double]("precision") === 0.0 &&
      allNeg.getAs[Double]("recall") === 0.0 &&
      allNeg.getAs[Double]("accuracy") === 1.0)
  }

  // --- bestOfN ------------------------------------------------------------

  private val bonModel = Model(
    Array.tabulate(64)(b => ((b.toLong * 37) % 21) - 10), 3L)

  test("bestOfN: picks the max-score candidate with the id tiebreak, " +
    "margin 0 on single-candidate prompts, partition-order independent") {
    val cands = Seq(
      (1L, 1L, "alpha beta gamma"), (1L, 2L, "alpha beta gamma"),
      (1L, 3L, "delta epsilon"),
      (2L, 9L, "lone candidate")).toDF("prompt_id", "cand_id", "text")
    val out = Sft.bestOfN(cands, "prompt_id", "cand_id", "text", bonModel)
      .orderBy("prompt_id").collect()
    // prompt 1: cands 1 and 2 tie on identical text -> id tiebreak keeps 1,
    // margin 0 (runner-up is the identical twin)
    assert(out(0).getAs[Long]("best_cand_id") === 1L)
    assert(out(0).getAs[Long]("margin") === 0L)
    assert(out(0).getAs[Long]("n_cands") === 3L)
    // prompt 2: walkover -> margin 0, runner_up == best
    assert(out(1).getAs[Long]("margin") === 0L)
    assert(out(1).getAs[Long]("n_cands") === 1L)
    assert(out(1).getAs[Long]("runner_up_score") ===
      out(1).getAs[Long]("best_score"))
    val b = Sft.bestOfN(cands.repartition(5, col("cand_id")),
      "prompt_id", "cand_id", "text", bonModel)
      .orderBy("prompt_id").collect()
    assert(out.toSeq === b.toSeq)
  }

  // --- pageRank -------------------------------------------------------------

  test("pageRank: hand-computed integer iterations on a hub graph, " +
    "steady state on a 2-cycle, partition-order independent") {
    // hub: a->c, b->c; N=3, base = 10^9 div 3 = 333333333
    val hub = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = Curation.pageRank(hub, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // teleport share: 15*333333333 div 100 = 49999999
    // c additionally gets 85*(333333333+333333333) div 100 = 566666666
    assert(r1(1L) === 49999999L && r1(2L) === 49999999L)
    assert(r1(3L) === 49999999L + 566666666L)
    // 2-cycle is a fixed point: r stays at base
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rc = Curation.pageRank(cyc, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rc(1L) === 500000000L && rc(2L) === 500000000L)
    val big = Seq.tabulate(60)(i => ((i % 10).toLong, ((i * 7) % 10).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Curation.pageRank(big.repartition(7, col("src")), "src", "dst")
      .orderBy("node").collect()
    val b = Curation.pageRank(big.orderBy(col("dst")).coalesce(1),
      "src", "dst").orderBy("node").collect()
    assert(a.toSeq === b.toSeq)
    // the checkpoint policy changes lineage/fixed job count only, never
    // the arithmetic: identity (no truncation) replays the default
    // bit-for-bit, on the cold AND the warm path
    val ident = Curation.pageRank(big, "src", "dst",
      checkpoint = identity[org.apache.spark.sql.DataFrame])
      .orderBy("node").collect()
    assert(ident.toSeq === a.toSeq)
    val prior = Curation.pageRank(big, "src", "dst")
      .select(col("node"), col("r9"))
    val warmDefault = Curation.pageRankWarm(big, "src", "dst", prior)
      .orderBy("node").collect()
    val warmIdent = Curation.pageRankWarm(big, "src", "dst", prior,
        checkpoint = identity[org.apache.spark.sql.DataFrame])
      .orderBy("node").collect()
    assert(warmIdent.toSeq === warmDefault.toSeq)
  }

  // --- tableProfile -------------------------------------------------------

  // --- randomized laws (the PropertySuite sampling harness) ----------------

  private def forAllSampled[T](gen: org.scalacheck.Gen[T], n: Int = 12)(
      body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(42L + i)).foreach(body)
    }

  test("clusterPrune law: on random vectors, every cluster keeps exactly " +
    "floor(permille*n/1000) rows and the kept set is a rank prefix") {
    import org.scalacheck.Gen
    val vecGen = for {
      n <- Gen.choose(5, 40)
      vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-50, 50)))
    } yield vs.zipWithIndex.map { case (v, i) =>
      // keep vectors off the origin so cosine is defined
      (i.toLong, v.map(_.toFloat) match {
        case Seq(0f, 0f, 0f, 0f) => Seq(1f, 0f, 0f, 0f)
        case s => s
      })
    }
    forAllSampled(Gen.zip(vecGen, Gen.choose(0, 1000))) { case (rows, pm) =>
      val out = Similarity.clusterPrune(rows.toDF("id", "v"), "id", "v",
        quant, keepPermille = pm).collect()
      out.groupBy(_.getAs[Int]("cluster")).foreach { case (_, grp) =>
        val n = grp.length.toLong
        val kept = grp.filter(_.getAs[Boolean]("keep"))
        assert(kept.length.toLong === pm * n / 1000L,
          s"quota broken: pm=$pm n=$n kept=${kept.length}")
        val maxKeptRnk = if (kept.isEmpty) 0L
          else kept.map(_.getAs[Long]("rnk")).max
        assert(maxKeptRnk === kept.length.toLong,
          "kept rows must be the rank prefix")
      }
    }
  }

  test("retrievalMetrics law: every metric lies in [0,1], hits <= " +
    "min(n_rel, n_retrieved), and perfect-prefix rankings score " +
    "rr = ndcg = 1") {
    import org.scalacheck.Gen
    val caseGen = for {
      nDocs <- Gen.choose(1, 20)
      relSet <- Gen.someOf(1 to nDocs)
      scores <- Gen.listOfN(nDocs, Gen.choose(0, 9))
    } yield (relSet.toSet, scores)
    forAllSampled(caseGen) { case (relSet, scores) =>
      val results = scores.zipWithIndex
        .map { case (s, i) => (1L, (i + 1).toLong, s.toDouble) }
        .toDF("query_id", "id", "score")
      val qrels = (if (relSet.isEmpty) Seq(999L) else relSet.toSeq.sorted
        .map(_.toLong)).map((1L, _)).toDF("query_id", "id")
      val r = Relevance.retrievalMetrics(results, qrels, k = 10).head
      Seq("rr", "recall_at_k", "precision_at_k", "ndcg_at_k", "ap_at_k")
        .foreach { m =>
          val v = r.getAs[Double](m)
          assert(v >= 0.0 && v <= 1.0, s"$m=$v out of [0,1]")
        }
      assert(r.getAs[Long]("hits") <=
        math.min(r.getAs[Long]("n_rel"), r.getAs[Long]("n_retrieved")))
    }
    // a ranking whose top-|rel| rows are exactly the relevant docs
    val perfect = Seq((1L, 10L, 9.0), (1L, 11L, 8.0), (1L, 12L, 1.0))
      .toDF("query_id", "id", "score")
    val q = Seq((1L, 10L), (1L, 11L)).toDF("query_id", "id")
    val p = Relevance.retrievalMetrics(perfect, q, k = 10).head
    assert(p.getAs[Double]("rr") === 1.0 &&
      p.getAs[Double]("ndcg_at_k") === 1.0 &&
      p.getAs[Double]("ap_at_k") === 1.0)
  }

  test("gateEval/raterAgreement law: on random confusion tables the " +
    "ratios reproduce the driver-side arithmetic and kappa stays in " +
    "[-1, 1]") {
    import org.scalacheck.Gen
    val cells = Gen.listOfN(4, Gen.choose(0, 12))
    forAllSampled(cells) { case List(tp, fp, fn, tn) =>
      val rows = Seq.fill(tp)((true, true)) ++ Seq.fill(fp)((false, true)) ++
        Seq.fill(fn)((true, false)) ++ Seq.fill(tn)((false, false))
      if (rows.nonEmpty) {
        val g = Curation.gateEval(rows.toDF("t", "p"), col("t"), col("p"))
          .head
        def r4(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (tp + fp > 0)
          assert(g.getAs[Double]("precision") === r4(tp.toDouble / (tp + fp)))
        if (tp + fn > 0)
          assert(g.getAs[Double]("recall") === r4(tp.toDouble / (tp + fn)))
        val k = Curation.raterAgreement(rows.toDF("t", "p"),
          col("t"), col("p")).head.getAs[Double]("kappa")
        assert(k >= -1.0 && k <= 1.0, s"kappa $k out of [-1,1]")
      }
    }
  }

  test("tableProfile: exact counts, lexical min/max of the string form, " +
    "nested columns profile nulls only") {
    val df = Seq(
      (1L, Some("aa"), Seq(1, 2)),
      (2L, None, Seq.empty[Int]),
      (3L, Some("b"), null.asInstanceOf[Seq[Int]]),
      (3L, Some("aa"), Seq(9))).toDF("id", "s", "arr")
    val out = Profile.tableProfile(df).orderBy("column_name").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    val idRow = byName("id")
    assert(idRow.getAs[Long]("n_rows") === 4L &&
      idRow.getAs[Long]("n_null") === 0L &&
      idRow.getAs[Long]("n_distinct") === 3L &&
      idRow.getAs[String]("min_s") === "1" &&
      idRow.getAs[String]("max_s") === "3" &&
      idRow.getAs[Double]("avg_len") === 1.0)
    val sRow = byName("s")
    assert(sRow.getAs[Long]("n_null") === 1L &&
      sRow.getAs[Long]("n_distinct") === 2L &&
      sRow.getAs[String]("min_s") === "aa" &&
      sRow.getAs[String]("max_s") === "b" &&
      sRow.getAs[Double]("avg_len") ===
        BigDecimal(5.0 / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    val arrRow = byName("arr")
    assert(arrRow.getAs[Long]("n_null") === 1L)
    assert(arrRow.isNullAt(arrRow.fieldIndex("n_distinct")) &&
      arrRow.isNullAt(arrRow.fieldIndex("min_s")))
  }

  // --- bm25 frozen collection stats ----------------------------------------

  private val bmDocs = Seq(
    (1L, "spark shuffles the join keys across executors"),
    (2L, "a broadcast join avoids the shuffle entirely"),
    (3L, "vector search scans the embedding column"),
    (4L, "the stream arrives as micro batches"),
    (5L, "join join join everywhere in this plan")).toDF("doc_id", "text")

  test("bm25UnderStats: scoring under stats computed from the SAME corpus " +
    "is bit-identical to plain bm25 (the frozen-snapshot parity law)") {
    val q = Seq("join", "vector", "stream")
    val stats = Relevance.bm25CollectionStats(bmDocs, "doc_id", "text")
    val frozen = Relevance.bm25UnderStats(bmDocs, "doc_id", "text", stats, q)
      .orderBy("id").collect()
    val plain = Relevance.bm25(bmDocs, "doc_id", "text", q)
      .orderBy("id").collect()
    assert(frozen.toSeq === plain.toSeq)
  }

  test("bm25UnderStats: a term the snapshot never saw takes the df=0 " +
    "maximal-idf fallback (scores at least as high as any seen-term df)") {
    val slice = bmDocs.filter(col("doc_id") <= 2) // no 'vector' here
    val stats = Relevance.bm25CollectionStats(slice, "doc_id", "text")
    val full = Relevance.bm25CollectionStats(bmDocs, "doc_id", "text")
    val unseen = Relevance.bm25UnderStats(bmDocs, "doc_id", "text",
      stats, Seq("vector")).collect()
    assert(unseen.nonEmpty && unseen.forall(_.getAs[Double]("bm25") > 0d))
    val seen = Relevance.bm25UnderStats(bmDocs, "doc_id", "text",
      full, Seq("vector")).collect().map(r =>
        r.getLong(0) -> r.getDouble(1)).toMap
    unseen.foreach { r =>
      assert(r.getDouble(1) >= seen(r.getLong(0)),
        "df=0 idf must dominate the seen-term idf")
    }
  }

  test("bm25StatsDrift: in-dist batch stays under thresholds, a shifted " +
    "batch trips rebuild, the empty batch reads (0, rebuild=false)") {
    val stats = Relevance.bm25CollectionStats(bmDocs, "doc_id", "text")
    val inDist = Relevance.bm25StatsDrift(bmDocs, "doc_id", "text", stats,
      maxNewTermRate = 0.1, maxAvgdlShift = 0.5).head
    assert(!inDist.getAs[Boolean]("rebuild") &&
      inDist.getAs[Double]("new_term_rate") === 0.0 &&
      inDist.getAs[Double]("avgdl_ratio") === 1.0)
    val shifted = Relevance.bm25StatsDrift(
      bmDocs.select(col("doc_id"), translate(col("text"), "e", "3")
        .as("text")),
      "doc_id", "text", stats, maxNewTermRate = 0.1,
      maxAvgdlShift = 0.5).head
    assert(shifted.getAs[Boolean]("rebuild") &&
      shifted.getAs[Double]("new_term_rate") > 0.1)
    val empty = Relevance.bm25StatsDrift(
      bmDocs.filter(col("doc_id") < 0), "doc_id", "text", stats,
      maxNewTermRate = 0.1, maxAvgdlShift = 0.5).head
    assert(empty.getAs[Long]("n_docs") === 0L &&
      !empty.getAs[Boolean]("rebuild") &&
      empty.getAs[Double]("avgdl_ratio") === 1.0)
  }

  // --- groupAdvantage -------------------------------------------------------

  test("groupAdvantage: a two-candidate group with distinct scores " +
    "normalizes to exactly +/-1; identical candidates read adv 0; " +
    "partition-order independent") {
    val cands = Seq(
      (1L, 1L, "alpha beta gamma delta"), (1L, 2L, "zz"),
      (2L, 5L, "same text here"), (2L, 6L, "same text here"))
      .toDF("prompt_id", "cand_id", "text")
    val out = Sft.groupAdvantage(cands, "prompt_id", "cand_id", "text",
      bonModel).orderBy("prompt_id", "cand_id").collect()
    val g1 = out.filter(_.getLong(0) == 1L).map(_.getAs[Double]("advantage"))
    assert(g1.toSet === Set(1.0, -1.0),
      s"two distinct candidates must read +/-1, got ${g1.toSeq}")
    val g2 = out.filter(_.getLong(0) == 2L).map(_.getAs[Double]("advantage"))
    assert(g2.forall(_ === 0.0), "zero-variance group must read adv 0")
    val b = Sft.groupAdvantage(cands.repartition(5, col("cand_id")),
      "prompt_id", "cand_id", "text", bonModel)
      .orderBy("prompt_id", "cand_id").collect()
    assert(out.toSeq === b.toSeq)
  }

  test("pageRankWarm: a uniform prior replays the batch run bit-for-bit, " +
    "new nodes seed at the teleport share, absent prior nodes drop") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    // identity law: warm-start from the uniform init == cold batch
    val uniform = Seq((1L, 333333333L), (2L, 333333333L),
      (3L, 333333333L)).toDF("node", "r9")
    val cold = Curation.pageRank(g, "src", "dst", iterations = 3)
      .orderBy("node").collect()
    val warm = Curation.pageRankWarm(g, "src", "dst", uniform,
      iterations = 3).orderBy("node").collect()
    assert(warm.toSeq === cold.toSeq)
    // a grown graph: node 4 is new (edge 3->4); known nodes seed from
    // the prior, node 4 seeds at 10^9 div 4 under the NEW count
    val grown = g.union(Seq((3L, 4L)).toDF("src", "dst"))
    val prior = Seq((1L, 111L), (2L, 222L), (3L, 333L), (9L, 999L))
      .toDF("node", "r9")
    val w1 = Curation.pageRankWarm(grown, "src", "dst", prior,
      iterations = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // N=4, base=250000000, teleport=15*250000000 div 100=37500000.
    // node 1 <- 3 (outdeg 2 after the new edge): 85*(333 div 2) div 100=141
    assert(w1(1L) === 37500000L + 141L)
    // node 4 <- 3: same contribution as node 1
    assert(w1(4L) === 37500000L + 141L)
    // node 2 <- 1 (outdeg 2): 85*(111 div 2) div 100 = 46
    assert(w1(2L) === 37500000L + 46L)
    // node 3 <- 1 and 2: 85*(55+222) div 100 = 235
    assert(w1(3L) === 37500000L + 235L)
    // prior node 9 has no edges today -> not in the output
    assert(!w1.contains(9L))
    // a duplicate node in the prior would silently double-count its
    // contributions through the seed join — refuse loudly instead
    val dupPrior = Seq((1L, 111L), (1L, 222L), (2L, 333L))
      .toDF("node", "r9")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val e = intercept[Exception] {
      Curation.pageRankWarm(grown, "src", "dst", dupPrior,
        iterations = 1).collect()
    }
    assert(msgs(e).exists(_.contains("duplicate prior rank")),
      msgs(e).mkString("|"))
  }

  test("validateExpectations: every rule kind counts its violations " +
    "exactly, value rules skip nulls, the empty batch passes all") {
    import graft.operators.Profile._
    val df = Seq(
      (1L, Some("en"), Some(10L)),
      (2L, Some("zz"), Some(700L)),
      (2L, None, Some(-5L)),
      (3L, Some("fr"), None)).toDF("id", "lang", "n")
    val rules = Seq(ExpectNotNull("lang"), ExpectUnique("id"),
      ExpectMin("n", 0L), ExpectMax("n", 500L),
      ExpectInSet("lang", Seq("en", "fr")), ExpectRegex("lang", "^[a-z]{2}$"))
    val out = Profile.validateExpectations(df, rules)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("not_null", "lang")) === ((4L, 1L, false)))
    assert(out(("unique", "id")) === ((4L, 1L, false)))
    assert(out(("min_0", "n")) === ((3L, 1L, false)))  // null n unchecked
    assert(out(("max_500", "n")) === ((3L, 1L, false)))
    assert(out(("in_set", "lang")) === ((3L, 1L, false))) // null skipped
    assert(out(("regex", "lang")) === ((3L, 0L, true)))
    val empty = Profile.validateExpectations(df.filter(col("id") < 0), rules)
      .collect()
    assert(empty.length === 6 && empty.forall(_.getBoolean(4)),
      "an empty batch must pass every rule")
    val e = intercept[IllegalArgumentException](
      Profile.validateExpectations(df, Seq(ExpectNotNull("nope"))))
    assert(e.getMessage.contains("no column 'nope'"))
  }

  test("tableProfile/validateExpectations: hostile column names (dots, " +
    "quotes) resolve as top-level columns, never struct paths") {
    import graft.operators.Profile._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("a.b", "it's")
    val prof = Profile.tableProfile(df).orderBy("column_name").collect()
    assert(prof.map(_.getString(0)).toSet === Set("a.b", "it's"))
    assert(prof.forall(_.getAs[Long]("n_rows") === 2L))
    val v = Profile.validateExpectations(df,
      Seq(ExpectNotNull("a.b"), ExpectUnique("it's"))).collect()
    assert(v.forall(_.getAs[Boolean]("pass")))
    assert(v.map(_.getString(1)).toSet === Set("a.b", "it's"))
    // backslashes are Spark string-literal escapes — a name holding (or
    // ending in) one must survive the stack() unpivot verbatim
    val bs = Seq((1L, "x")).toDF("a\\nb", "trail\\")
    val pb = Profile.tableProfile(bs).collect().map(_.getString(0)).toSet
    assert(pb === Set("a\\nb", "trail\\"), s"got $pb")
    val vb = Profile.validateExpectations(bs,
      Seq(ExpectNotNull("a\\nb"), ExpectNotNull("trail\\"))).collect()
    assert(vb.map(_.getString(1)).toSet === Set("a\\nb", "trail\\"))
  }

  test("ExpectRegex enforces full-match semantics: a value merely " +
    "CONTAINING a match still violates") {
    import graft.operators.Profile._
    val df = Seq("src1", "XXsrc1-corrupt", "src9").toDF("s")
    val out = Profile.validateExpectations(df,
      Seq(ExpectRegex("s", "src[0-9]"))).head
    assert(out.getAs[Long]("n_violations") === 1L &&
      !out.getAs[Boolean]("pass"),
      "the embedded match must not satisfy the full-match contract")
  }

  test("tableProfile: approx mode (the 100 TB path) still reports " +
    "row/null counts exactly and a plausible NDV") {
    val df = (1 to 500).map(i => (i.toLong, s"v${i % 50}"))
      .toDF("id", "s")
    val out = Profile.tableProfile(df, exactNdv = false)
      .orderBy("column_name").collect()
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(byName("id").getAs[Long]("n_rows") === 500L)
    val ndv = byName("s").getAs[Long]("n_distinct")
    assert(ndv > 40L && ndv < 60L, s"approx NDV $ndv far from 50")
  }

  test("profileDrift: schema movement, null-rate and NDV-density bands, " +
    "range widening reported but not folded into drifted") {
    val ref = Profile.tableProfile(Seq(
      (1L, Some("en"), "aa"), (2L, Some("fr"), "bb"), (3L, Some("en"), "cc"),
      (4L, Some("fr"), "dd")).toDF("id", "lang", "s"))
    // batch: same size, lang 50% null (delta fires), s range widens past
    // 'dd', one new column, id density unchanged
    val batch = Profile.tableProfile(Seq(
      (5L, None, "aa", 1L), (6L, None, "zz", 2L),
      (7L, Some("en"), "bb", 3L), (8L, Some("fr"), "cc", 4L))
      .toDF("id", "lang", "s", "extra"))
    val out = Profile.profileDrift(batch, ref, maxNullDelta = 0.1,
        maxNdvRatio = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id").getString(1) === "ok" &&
      !out("id").getAs[Boolean]("drifted") &&
      out("id").getAs[Double]("ndv_ratio") === 1.0)
    assert(out("lang").getAs[Double]("null_delta") === 0.5 &&
      out("lang").getAs[Boolean]("drifted"))
    assert(out("s").getAs[Boolean]("range_widened") &&
      !out("s").getAs[Boolean]("drifted"),
      "range widening is reported, not drift by itself")
    assert(out("extra").getString(1) === "new_column" &&
      out("extra").getAs[Boolean]("drifted"))
    // a column the batch lost
    val lost = Profile.profileDrift(
      Profile.tableProfile(Seq((1L, "x")).toDF("id", "s")),
      Profile.tableProfile(Seq((1L, "x", 2L)).toDF("id", "s", "gone")),
      maxNullDelta = 0.1, maxNdvRatio = 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(lost("gone").getString(1) === "missing_column" &&
      lost("gone").getAs[Boolean]("drifted"))
    // empty batch: rates 0, ratios NULL, no value-drift — INCLUDING when
    // the reference column itself holds nulls (the batch null rate reads
    // 0 there, and an ungated |0 - ref| would flip drifted)
    val nullyRef = Profile.tableProfile(
      Seq((1L, Some("x")), (2L, None), (3L, None)).toDF("id", "s"))
    val empty = Profile.profileDrift(
      Profile.tableProfile(
        Seq((1L, Some("x"))).toDF("id", "s").filter(lit(false))),
      nullyRef, maxNullDelta = 0.1, maxNdvRatio = 2.0).collect()
    assert(empty.forall(r => !r.getAs[Boolean]("drifted")),
      "an empty batch is not drift evidence, even against a nully reference")
    assert(empty.forall(r => r.isNullAt(r.fieldIndex("null_delta"))),
      "null_delta must be NULL on an empty batch, not |0 - ref|")
  }

  test("profileDrift: the stamped save/probe path enforces the " +
    "table-profile marker and the drift->rebuild->re-probe cycle closes") {
    withTmpDir { dir =>
      val refPath = s"$dir/profile"
      val refDf = Seq((1L, Some("en")), (2L, Some("fr")))
        .toDF("id", "lang")
      Profile.saveProfile(Profile.tableProfile(refDf), refPath)
      val shifted = Seq((3L, None: Option[String]), (4L, None))
        .toDF("id", "lang")
      val d1 = Profile.profileDriftTable(Profile.tableProfile(shifted),
        refPath, maxNullDelta = 0.2, maxNdvRatio = 4.0)
        .filter(col("column_name") === "lang").head
      assert(d1.getAs[Boolean]("drifted"),
        "the shifted batch must trip drift against the stale profile")
      // rebuild: re-stamp the profile on the shifted slice — re-probe clears
      Profile.saveProfile(Profile.tableProfile(shifted), refPath)
      val d2 = Profile.profileDriftTable(Profile.tableProfile(shifted),
        refPath, maxNullDelta = 0.2, maxNdvRatio = 4.0)
        .filter(col("column_name") === "lang").head
      assert(!d2.getAs[Boolean]("drifted"),
        "re-probe after rebuild must clear")
      // stale marker refuses from the probe
      graft.state.HistoryFormat.stamp(conf, refPath,
        graft.state.HistoryFormat.Format("table-profile", 99, "x"))
      val e = intercept[IllegalStateException](
        Profile.profileDriftTable(Profile.tableProfile(shifted), refPath,
          0.2, 4.0))
      assert(e.getMessage.contains("Rebuild required"))
    }
  }

  test("raterAgreement/gateEval: NULL-labeled rows are excluded, so n " +
    "always equals the sum of the confusion cells") {
    // 2 labeled rows + 2 rows with a NULL on one side: n must read 2 and
    // po/accuracy must not dilute
    val rows = Seq((Some(true), Some(true)), (Some(false), Some(false)),
      (None, Some(true)), (Some(true), None)).toDF("a", "b")
    val r = Curation.raterAgreement(rows, col("a"), col("b")).head
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00") === r.getAs[Long]("n"))
    assert(r.getAs[Double]("po") === 1.0)
    val g = Curation.gateEval(rows, col("a"), col("b")).head
    assert(g.getAs[Long]("n") === 2L &&
      g.getAs[Double]("accuracy") === 1.0,
      "a NULL label must not dilute accuracy's denominator")
    assert(g.getAs[Long]("tp") + g.getAs[Long]("fp") +
      g.getAs[Long]("fn") + g.getAs[Long]("tn") === g.getAs[Long]("n"))
  }

  test("clusterPrune: a zero-norm vector drops with the null/ragged ones " +
    "instead of landing NaN-ranked in centroid 0") {
    val withZero = twoClusters
      .union(Seq((97L, Seq(0f, 0f, 0f, 0f))).toDF("id", "v"))
    val out = Similarity.clusterPrune(withZero, "id", "v", quant,
      keepPermille = 500).collect()
    assert(!out.exists(_.getLong(0) == 97L),
      "the zero vector has no defined cosine and must be filtered")
    assert(out.forall(r => !r.getAs[Double]("proto_cos").isNaN))
    // and the surviving ranking is unchanged vs the clean input
    val clean = Similarity.clusterPrune(twoClusters, "id", "v", quant,
      keepPermille = 500).collect().sortBy(_.getLong(0))
    assert(out.sortBy(_.getLong(0)).toSeq === clean.toSeq)
  }

  test("ExpectMin/ExpectMax: a non-null cell that fails the numeric cast " +
    "is a violation, not a silent pass") {
    import graft.operators.Profile._
    val df = Seq("10", "corrupted", "-3").toDF("n")
    val out = Profile.validateExpectations(df,
        Seq(ExpectMin("n", 0L), ExpectMax("n", 500L)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // min_0: 'corrupted' (cast fails) + '-3' violate; max_500: only
    // 'corrupted' — both bounds must flag the uncastable cell
    assert(out("min_0") === ((3L, 2L, false)))
    assert(out("max_500") === ((3L, 1L, false)))
  }
}

package graft

import graft.examples.ScalingCurves
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic candidate-count scaling pins — the `sbt test` face of
  * `examples/ScalingCurves` (which measures wall time too and needs an
  * idle box; candidate counts are pure functions of the data, so THIS
  * gate never flakes). A corpus doubled by a decorrelating derivation
  * must not much more than double a filter stack's candidate volume:
  * all-pairs behavior would quadruple it, so the ≤2.5× bound cleanly
  * separates linear (2×, plus small cross-replica boundary effects)
  * from quadratic (4×) with margin on both sides. */
class ScalingSuite extends SparkSpec {

  /** The ScalingCurves derivation at suite scale: replica 1 re-ids and
    * letter-rotates sf0.001's 500 documents — within-replica near-dup
    * structure preserved exactly, cross-replica gram overlap ~zero. */
  private def corpus(m: Int): DataFrame = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val perm = "etaoinsr"
    (0 until m).map { r =>
      val rot = perm.drop(r) + perm.take(r)
      docs.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        (if (r == 0) col("text")
         else translate(col("text"), perm, rot)).as("text"))
    }.reduce(_ unionByName _)
  }

  test("doubling the corpus at most ~doubles candidate volume for the " +
    "AllPairs and MinHash-banding filter stacks (all-pairs would 4x)") {
    def cand(df: DataFrame): Long = ScalingCurves.measure(df)._2
    val ngram = (1 to 2).map(m => cand(Dedup.charNgramJaccardExactPairs(
      corpus(m), "doc_id", "text", n = 12, threshold = 0.8)))
    assert(ngram(0) > 0, "the 1x corpus must produce candidates at all")
    assert(ngram(1) <= (ngram(0) * 2.5).toLong,
      s"AllPairs candidates must stay ~linear: 1x=${ngram(0)} 2x=${ngram(1)}")
    val mh = (1 to 2).map(m => cand(Dedup.minhashLshPairsPortable(
      corpus(m), "doc_id", "text", threshold = 0.2)))
    assert(mh(0) > 0)
    assert(mh(1) <= (mh(0) * 2.5).toLong,
      s"MinHash-band candidates must stay ~linear: 1x=${mh(0)} 2x=${mh(1)}")
  }

  test("wide combination keys hold candidate volume where 16-bit block " +
    "keys saturate (the hash64PairsWide point, at suite scale)") {
    def cand(df: DataFrame): Long = ScalingCurves.measure(df)._2
    val wide = (1 to 2).map(m => cand(Dedup.simhashPairsPortableWide(
      corpus(m), "doc_id", "text", maxHamming = 3, blocks = 6)))
    assert(wide(0) > 0)
    // the corpus's own duplicate groups grow with it (Θ(g²) true pairs
    // is ground truth, not a plan defect — README scaling notes), so
    // the bound here is looser than the join-stack pins above; what it
    // pins is "no all-pairs collapse" (500 docs → 1000 docs under a
    // broken bucketing would 4× the pair stream)
    assert(wide(1) <= (wide(0) * 3).toLong,
      s"wide-key candidates must not collapse to all-pairs: " +
        s"1x=${wide(0)} 2x=${wide(1)}")
  }

  test("hash64 layout selector: the measured decision flips narrow -> " +
    "wide across the real corpus's crossover (deterministic pins)") {
    // the sf0.1 corpus straddles the crossover (ScalingCurves measures
    // the full series): a 1/4 sub-sample spreads the 16-bit buckets so
    // key rows dominate (narrow), the full 5000 docs flood them past
    // the wide layout's 5x key cost (wide). Both decisions are pure
    // counts-only functions of the data — no wall time, never flakes.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    def decide(df: DataFrame) = Dedup.hash64PairsLayoutDecision(
      Dedup.simhashIndex(df, "doc_id", "text"), "sh")
    val below = decide(docs.filter(col("doc_id") % 4 === 0))
    assert(!below.useWide,
      s"1250 spread docs must stay narrow (key rows dominate): $below")
    val above = decide(docs)
    assert(above.useWide,
      s"the full corpus must flip wide (bucket flooding dominates): $above")
    // the decision's inputs are exact volumes, so the margins must agree
    // in sign with the useWide flag by construction
    assert(below.margin <= 0 && above.margin > 0)
  }

  test("winnowing pairs: doubling the corpus at most ~doubles the verify " +
    "join's candidate volume (the last slowest-10 pair op without a pin)") {
    def cand(df: DataFrame): Long = ScalingCurves.measure(df)._2
    val w = (1 to 2).map(m => cand(Dedup.winnowingPairs(
      corpus(m), "doc_id", "text", k = 16, w = 32, threshold = 0.2)))
    assert(w(0) > 0)
    assert(w(1) <= (w(0) * 2.5).toLong,
      s"winnow candidates must stay ~linear: 1x=${w(0)} 2x=${w(1)}")
  }

  test("iterative family: PageRank's per-iteration exchange volume and " +
    "the distributed CC assignment stay linear in the graph") {
    // constant-out-degree ring graph within each replica (the
    // ScalingCurves derivation at suite scale): edges exactly 3N
    val n = 500L
    def ring(m: Int): DataFrame = {
      val local = pmod(col("doc_id"), lit(1000000L))
      val base = col("doc_id") - local
      Seq(1L, 7L, 40L).map(off => corpus(m).select(
          col("doc_id").as("src"),
          (base + pmod(local + lit(off), lit(n))).as("dst")))
        .reduce(_ unionByName _)
    }
    // the checkpoint policy truncates earlier iterations, so the final
    // plan's largest join IS the per-iteration contribution exchange
    val pr = (1 to 2).map(m => ScalingCurves.measure(
      graft.operators.Curation.pageRank(ring(m), "src", "dst",
        iterations = 2)))
    assert(pr(0)._2 > 0)
    assert(pr(1)._2 <= pr(0)._2 * 5 / 2,
      s"PageRank iteration exchange must stay ~linear: " +
        s"1x=${pr(0)._2} 2x=${pr(1)._2}")
    assert(pr(1)._1 === pr(0)._1 * 2, "ranks are one row per node")
    def chain(m: Int): DataFrame = {
      val local = pmod(col("doc_id"), lit(1000000L))
      corpus(m).select(col("doc_id"), local.as("__l"))
        .filter(pmod(col("__l"), lit(8)) =!= 7 && col("__l") < lit(n - 1))
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    }
    val cc = (1 to 2).map(m => ScalingCurves.measure(
      Dedup.connectedComponents(chain(m), localLimit = 0)))
    assert(cc(1)._1 === cc(0)._1 * 2, "assignment is one row per node")
    assert(cc(1)._3 <= cc(0)._3 * 5 / 2,
      s"CC peak rows must stay ~linear: 1x=${cc(0)._3} 2x=${cc(1)._3}")
  }

  test("template-group collapse: composed canonicalization holds cluster " +
    "count EXACTLY constant where raw pair output grows quadratically") {
    // replicas keep the ORIGINAL text (no rotation): duplicate groups
    // grow g ∝ m, raw pairs Θ(g²) by ground truth
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def tdocs(m: Int) = (0 until m).map(r => docs.select(
        (col("doc_id") + lit(r * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val raw = (1 to 2).map(m => Dedup.simhashPairsPortableWide(
      tdocs(m), "doc_id", "text", maxHamming = 3, blocks = 6,
      maxBucket = 0).count())
    // every 1× pair becomes 4 cross-replica pairs, plus each text's own
    // replica pair — strictly superlinear by construction
    assert(raw(1) >= raw(0) * 4,
      s"template ground truth must be ~quadratic: 1x=${raw(0)} 2x=${raw(1)}")
    val res = (1 to 2).map { m =>
      val r = Dedup.nearDupCanonicalize(
        tdocs(m).withColumn("q", length(col("text"))),
        "doc_id", "text", "q", Dedup.nearDupWideSimhashFamily()._1)
      (r.count(), r.filter(col("keep")).count())
    }
    assert(res(1)._1 === res(0)._1 * 2, "resolution output exactly linear")
    assert(res(1)._2 === res(0)._2,
      s"cluster count must be EXACTLY constant: " +
        s"1x=${res(0)._2} 2x=${res(1)._2}")
  }

  test("composed-fold history curve: per-batch pair work is batch-" +
    "bounded and the state bookkeeping is exact row arithmetic") {
    // the ScalingCurves neardup_fold_history series at suite scale: a
    // FIXED batch (50 attach-by-fingerprint + 50 novel texts) folds
    // into 1×/2× accumulated states; deterministic pins only (row
    // deltas exact; the history-probe stage's candidates must not grow
    // superlinearly with the rep history — wide keys)
    val (pf, probe) = Dedup.nearDupWideSimhashFamily()
    val batch = corpus(1).filter(col("doc_id") < 100)
      .select((col("doc_id") + lit(77000000L)).as("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zq"),
            col("doc_id").cast("string"))).as("text"))
      .withColumn("q", length(col("text")))
      .localCheckpoint()
    val novel = batch.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("id"), col("text"))
    val cands = (1 to 2).map { m =>
      val seed = corpus(m).withColumn("q", length(col("text")))
      var st = Dedup.nearDupEmptyState(seed, "doc_id", "text", "q")
      st = Dedup.nearDupCanonicalizeIncrement(seed, "doc_id", "text",
        "q", st._1, st._2, st._3, pf, probe)
      st = (st._1.localCheckpoint(), st._2.localCheckpoint(),
        st._3.localCheckpoint())
      val (docs0, reps0) = (st._1.count(), st._2.count())
      assert(docs0 === 500L * m && reps0 > 0)
      val cand = ScalingCurves.measure(
        probe(novel, st._2.select("id", "text")))._2
      val up = Dedup.nearDupCanonicalizeIncrement(batch, "doc_id",
        "text", "q", st._1, st._2, st._3, pf, probe)
      assert(up._1.count() === docs0 + 100,
        "docs delta must be exactly the batch size")
      assert(up._2.count() === reps0 + 50,
        "reps delta must be exactly the novel-text count")
      cand
    }
    assert(cands(1) <= math.max(cands(0), 1L) * 5 / 2,
      s"composed-fold probe candidates must stay ~linear in the rep " +
        s"history: 1x=${cands(0)} 2x=${cands(1)}")
  }

  test("IVF with nlist ∝ √N keeps probe candidates sublinear " +
    "(deterministic counts at suite scale)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    def corpusE(m: Int): DataFrame = (0 until m).map { r =>
      val v =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, dim - r),
          slice(col("embedding"), 1, r))
      emb.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        v.as("embedding"))
    }.reduce(_ unionByName _)
    val cands = (1 to 2).map { m =>
      val e = corpusE(m)
      val nlist = math.round(math.sqrt(e.count().toDouble)).toInt
      val model = graft.operators.Similarity.trainIvfCentroids(
        e, "vec_id", "embedding", nlist = nlist, iterations = 2)
      ScalingCurves.measure(graft.operators.Similarity.ivfTopK(
        e.filter(col("vec_id") < 50), e, "vec_id", "embedding",
        k = 1, nlist = nlist, nprobe = 2, quantizer = Some(model)))._2
    }
    assert(cands(0) > 0)
    // expected √2 ≈ 1.41× — the 2× bound separates √N from linear with
    // margin for bucket-size granularity
    assert(cands(1) <= cands(0) * 2,
      s"√N-IVF probe candidates must stay sublinear: " +
        s"1x=${cands(0)} 2x=${cands(1)}")
  }
}

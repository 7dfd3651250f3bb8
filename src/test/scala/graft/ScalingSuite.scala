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
      Dedup.simhashIndex(df, "doc_id", "text"), "doc_id", "sh")
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
}

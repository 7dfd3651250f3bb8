package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) decontamination: the paraphrase-robust
  * eval-set screen. Covers planted-leak flagging, the unscreenable-doc
  * contract (missing / wrong-dim / zero vectors surface as NULL + false,
  * never vanish), deterministic tie-breaks, the bounded-eval refusal,
  * and table-path parity with the in-memory screen. */
class SemanticDeconSuite extends SparkSpec {
  import spark.implicits._

  private val evalIds = Array(10L, 20L)
  private val evalVecs = Array(
    Array(1f, 0f, 0f, 0f),
    Array(0f, 1f, 0f, 0f))

  private def screen(rows: Seq[(Long, Seq[Float])], tau: Double = 0.9) =
    Dedup.semanticContamination(
      rows.toDF("id", "v").select(col("id"),
        col("v").cast("array<float>").as("v")),
      "id", "v", evalIds, evalVecs, tau)
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        r.getBoolean(3)))

  test("planted leaks flag; dissimilar docs report their best match unflagged") {
    val r = screen(Seq(
      (1L, Seq(2f, 0f, 0f, 0f)),      // scaled copy of eval 10 -> cos 1.0
      (2L, Seq(0f, -3f, 0f, 0f)),     // anti-parallel to eval 20 -> cos -1 vs 20, 0 vs 10
      (3L, Seq(1f, 1f, 0f, 0f))))     // 45 degrees to both -> 0.7071, unflagged
    assert(r(0) === ((1L, 10L, 1.0, true)))
    // best match for anti-parallel doc is the ZERO cosine against eval 10
    assert(r(1) === ((2L, 10L, 0.0, false)))
    assert(r(2)._4 === false && r(2)._3 === 0.7071)
  }

  test("equal cosines tie to the larger bench_id in both paths") {
    // equidistant from both eval vectors: struct max breaks to bid 20
    val r = screen(Seq((1L, Seq(1f, 1f, 0f, 0f))))
    assert(r(0)._2 === 20L)
  }

  test("missing, wrong-dimension, and zero vectors surface as unscreenable") {
    val r = screen(Seq(
      (1L, null),
      (2L, Seq(1f, 0f)),              // wrong dims
      (3L, Seq(0f, 0f, 0f, 0f))))     // zero norm
    r.foreach { case (_, bid, cos, flagged) =>
      assert(bid === -1L && cos.isNaN && flagged === false)
    }
  }

  test("zero-norm or malformed EVAL vectors refuse at construction") {
    val docs = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Dedup.semanticContamination(docs, "id", "v",
        Array(1L), Array(Array(0f, 0f, 0f, 0f)), 0.9))
    assert(e.getMessage.contains("zero-norm eval vector"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.semanticContamination(docs, "id", "v",
        Array(1L, 2L), Array(Array(1f, 0f), Array(1f, 0f, 0f)), 0.9))
    assert(e2.getMessage.contains("dims"))
    val e3 = intercept[IllegalArgumentException](
      Dedup.semanticContamination(docs, "id", "v",
        Array(1L, 1L), Array(Array(1f, 0f), Array(0f, 1f)), 0.9))
    assert(e3.getMessage.contains("duplicate eval ids"))
  }

  test("an eval set past maxEvalRows refuses instead of collecting") {
    val docs = Seq((1L, Seq(1f, 0f))).toDF("id", "v")
    val eval = Seq((10L, Seq(1f, 0f)), (20L, Seq(0f, 1f)),
      (30L, Seq(1f, 1f))).toDF("bid", "v")
    val e = intercept[IllegalArgumentException](
      Dedup.semanticContamination(docs, "id", "v", eval, "bid", "v",
        tau = 0.9, maxEvalRows = 2))
    assert(e.getMessage.contains("maxEvalRows"))
  }

  test("persisted-index path is bit-identical to the in-memory screen") {
    withTmpDir { tmp =>
      val eval = Seq((10L, Seq(1f, 0f, 0f, 0f)), (20L, Seq(0f, 1f, 0f, 0f)))
        .toDF("bid", "v")
        .select(col("bid"), col("v").cast("array<float>").as("v"))
      val docs = Seq.tabulate(40)(i =>
        (i.toLong, Seq(i.toFloat, (40 - i).toFloat, 1f, 0.5f)))
        .toDF("id", "v")
        .select(col("id"), col("v").cast("array<float>").as("v"))
      val dir = s"$tmp/eval_idx"
      Dedup.saveEvalEmbeddingIndex(eval, "bid", "v", dir)
      val viaTable = Dedup.semanticContaminationAgainstIndexTable(
        docs, "id", "v", dir, tau = 0.95)
      val inMemory = Dedup.semanticContamination(docs, "id", "v",
        eval, "bid", "v", tau = 0.95, maxEvalRows = 1000)
      assert(viaTable.exceptAll(inMemory).isEmpty &&
        inMemory.exceptAll(viaTable).isEmpty)
      assert(viaTable.filter(col("contaminated")).count() > 0,
        "the screen must flag something for the parity check to bite")
    }
  }
}

package graft

import graft.operators.QualityClf
import graft.operators.QualityClf.Model
import graft.state.HistoryFormat
import org.apache.spark.sql.functions._

/** Learned quality classifier: integer-exact scoring against a driver
  * reference, partition-order-independent training, separability on a
  * planted corpus, persistence round-trip + marker refusal, and the
  * zero-feature bias-update edge (an all-empty-doc mistake set must NOT
  * read as convergence). */
class QualityClfSuite extends SparkSpec {
  import spark.implicits._

  /** Driver reference of HashedFeaturesCodec's poly-31 fold. */
  private def refFeatures(text: String, nBuckets: Int): Seq[Int] = {
    def fold(s: String): Int = {
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % nBuckets
        i += Character.charCount(cp)
      }
      h.toInt
    }
    val ws = text.split(" ", -1).filter(_.nonEmpty).toSeq
    ws.zipWithIndex.flatMap { case (w, i) =>
      if (i == 0) Seq(fold(w))
      else Seq(fold(w), fold(ws(i - 1) + " " + w))
    }
  }

  private val planted = Model(
    Array.tabulate(64)(b => ((b.toLong * 37) % 21) - 10), 3L)

  test("scoring is integer-exact against the driver reference") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark plans aggregate exchanges"),
      (3L, ""),
      (4L, "  double  spaced   words  "),
      (5L, "one")).toDF("doc_id", "text")
    val got = QualityClf.score(docs, "doc_id", "text", planted)
      .orderBy("doc_id").collect()
    docs.orderBy("doc_id").collect().zip(got).foreach { case (in, out) =>
      val feats = refFeatures(in.getString(1), planted.nBuckets)
      val want = planted.bias + feats.map(b => planted.weights(b)).sum
      assert(out.getLong(1) == want, s"score for doc ${in.getLong(0)}")
      assert(out.getLong(2) == feats.size.toLong, "n_features")
      assert(out.getBoolean(3) == (want > 0), "keep")
    }
  }

  /** A linearly separable planted corpus: quality docs carry a marker
    * word chrome docs never produce. */
  private def labelled = (1 to 40).map { i =>
    if (i % 2 == 0) (i.toLong, s"prose para $i with substance marker", true)
    else (i.toLong, s"nav footer chrome $i", false)
  }.toDF("doc_id", "text", "label")

  test("training separates a planted linearly separable corpus") {
    val m = QualityClf.train(labelled, "doc_id", "text", "label",
      nBuckets = 256, epochs = 50)
    val wrong = QualityClf.score(labelled, "doc_id", "text", m)
      .join(labelled.select("doc_id", "label"), "doc_id")
      .filter(col("keep") =!= col("label")).count()
    assert(wrong == 0L, "trained model must classify the training slice")
  }

  test("training is partition-order independent") {
    val base = labelled
    val a = QualityClf.train(base.repartition(7, col("doc_id")),
      "doc_id", "text", "label", nBuckets = 128, epochs = 30)
    val b = QualityClf.train(base.orderBy(col("doc_id").desc).coalesce(1),
      "doc_id", "text", "label", nBuckets = 128, epochs = 30)
    assert(a == b, "repartition/reorder must not change the trained model")
  }

  test("zero-feature mistakes still drive the bias update") {
    // the ONLY positive docs are empty (zero features): the weight
    // update is empty every epoch, so convergence must consult the
    // bias delta — pre-fix this trained to the zero model and
    // misclassified every positive
    val docs = Seq(
      (1L, "", true), (2L, "", true), (3L, "", true)).toDF("doc_id", "text", "label")
    val m = QualityClf.train(docs, "doc_id", "text", "label",
      nBuckets = 16, epochs = 5)
    assert(m.bias > 0L, "bias must learn from zero-feature mistakes")
    val kept = QualityClf.score(docs, "doc_id", "text", m)
      .filter(col("keep")).count()
    assert(kept == 3L)
  }

  test("featureCoverage counts every feature occurrence per bucket") {
    val docs = Seq((1L, "aa bb aa"), (2L, "aa")).toDF("doc_id", "text")
    val cov = QualityClf.featureCoverage(docs, "text", 32)
    val expected = new Array[Long](32)
    docs.collect().foreach(r =>
      refFeatures(r.getString(1), 32).foreach(b => expected(b) += 1))
    assert(cov.toSeq == expected.toSeq)
  }

  test("drift trips on a shifted batch and stays quiet in-distribution") {
    val docs = (1 to 30)
      .map(i => (i.toLong, s"alpha beta gamma delta epsilon word$i"))
      .toDF("doc_id", "text")
    val model = Model(QualityClf.featureCoverage(docs, "text", 4096), 0L)
    val inDist = QualityClf.drift(docs, "doc_id", "text", model,
      maxDocZero = 0.5, maxHighFrac = 0.2).head
    assert(!inDist.getBoolean(5), "self-coverage must not read as drift")
    assert(inDist.getLong(2) == 0L, "n_zero must be 0 on the fit slice")
    val shifted = docs.select(col("doc_id"),
      translate(col("text"), "abcde", "01234").as("text"))
    val out = QualityClf.drift(shifted, "doc_id", "text", model,
      maxDocZero = 0.5, maxHighFrac = 0.2).head
    assert(out.getBoolean(5), "re-hashed batch must trip rebuild")
  }

  test("drift on an empty batch reads rebuild=false, never NULL") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val model = Model(QualityClf.featureCoverage(docs, "text", 64), 0L)
    val row = QualityClf.drift(docs.filter(col("doc_id") < 0), "doc_id",
      "text", model, maxDocZero = 0.2, maxHighFrac = 0.2).head
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L &&
      row.getLong(2) == 0L && !row.getBoolean(5))
  }

  test("save/load round-trips and the load path enforces the marker") {
    withTmpDir { tmp =>
      val dir = s"$tmp/clf"
      QualityClf.save(spark, dir, planted)
      assert(QualityClf.load(spark, dir) == planted, "round-trip")
      // stale format version → refuse with the rebuild remedy
      HistoryFormat.stamp(conf, dir,
        HistoryFormat.Format(HistoryFormat.QualityClfWeights.name, 999, "x"))
      val e = intercept[IllegalStateException](QualityClf.load(spark, dir))
      assert(e.getMessage.contains("Rebuild required"), e.getMessage)
      // marker deleted under data → legacy refusal
      new java.io.File(s"$dir/_graft_history_format.json").delete()
      val e2 = intercept[IllegalStateException](QualityClf.load(spark, dir))
      assert(e2.getMessage.contains("no _graft_history_format.json"),
        e2.getMessage)
    }
  }

  test("calibration rolls up per-source keep rates under the model") {
    import org.apache.spark.sql.functions._
    val m = QualityClf.Model(Array.fill(8)(1L), -2L)
    // score = n_features - 2: "a b" -> 3 feats -> 1 (keep); "x" -> 1 -> -1
    val df = Seq((1L, "a b", "s0"), (2L, "x", "s0"), (3L, "p q r", "s1"))
      .toDF("doc_id", "text", "source")
    val r = QualityClf.calibration(df, "doc_id", "text", "source", m)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getLong(5), x.getLong(6)))
    // s1: "p q r" -> 5 features -> score 3
    assert(r === Array(("s0", 2L, 1L, 0.5, 0.0, -1L, 1L),
      ("s1", 1L, 1L, 1.0, 3.0, 3L, 3L)))
  }
}

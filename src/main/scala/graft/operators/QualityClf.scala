package graft.operators

import graft.functions.HashedFeaturesFunctions
import graft.state.HistoryFormat
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Learned quality classification — the DCLM/fastText-style sibling of
  * the rule-based Gopher gates: a LINEAR classifier over hashed
  * unigram+bigram word features (the hashing trick bounds the model at
  * `nBuckets` weights no matter the vocabulary), scoring as a map-only
  * pass with the weight vector riding into the plan as a literal.
  *
  * Everything is INTEGER-EXACT by construction: features hash with the
  * portable poly-31 fold ([[graft.functions.HashedFeaturesCodec]]),
  * weights are longs, a document's score is a bounded integer sum — so
  * an ANSI oracle replays scoring bit-for-bit, and training (batch
  * perceptron, Rosenblatt '58 — the integer-exact cousin of DCLM's
  * logistic fit) is partition-order independent: each epoch computes
  * ALL mistakes under the CURRENT weights, then applies one summed
  * integer update (one partial-agg'd exchange per epoch; the update
  * collect is O(nBuckets), the model itself).
  *
  * Scale shape: scoring never shuffles (fused feature hash + literal
  * lookup sum); an epoch shuffles only (bucket, err) pairs, partial-
  * aggregated map-side — at 100 TB each epoch is one cheap aggregate
  * over the mistake set, and the model stays O(2^b) driver state
  * persisted like the quantizer ([[save]]/[[load]] with the
  * [[HistoryFormat.QualityClfWeights]] marker: the feature-hash fold is
  * part of the format — weights under a different fold silently
  * mis-score everything, so a mismatched marker refuses loudly). */
object QualityClf {

  /** A trained (or planted) linear model: `score(doc) = bias +
    * Σ_{f ∈ features(doc)} weights(f)`; classify keep when score > 0. */
  final case class Model(weights: Array[Long], bias: Long) {
    require(weights.nonEmpty, "empty weight vector")
    def nBuckets: Int = weights.length
    override def equals(o: Any): Boolean = o match {
      case m: Model => m.bias == bias &&
        java.util.Arrays.equals(m.weights, weights)
      case _ => false
    }
    override def hashCode: Int =
      java.util.Arrays.hashCode(weights) * 31 + bias.toInt
  }

  /** The per-document integer score column under `model` — hashed
    * features fused into the scan, weights a plan literal, zero
    * exchanges. */
  def scoreCol(text: Column, model: Model): Column = {
    val w = typedlit(model.weights.toSeq)
    aggregate(
      transform(HashedFeaturesFunctions.hashedFeatures(text, model.nBuckets),
        b => element_at(w, b + 1)),
      lit(model.bias), (acc, x) => acc + x)
  }

  /** Score every document: `(id, score, n_features, keep)`. */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    df.select(col(idCol),
        scoreCol(col(textCol), model).as("score"),
        size(HashedFeaturesFunctions.hashedFeatures(col(textCol),
          model.nBuckets)).cast("long").as("n_features"))
      .withColumn("keep", col("score") > 0)

  /** Batch-perceptron training on a labelled slice (`labelCol` boolean:
    * true = quality). Deterministic: every epoch scores ALL rows under
    * the epoch's weights, collects one summed integer update over the
    * mistakes (y ∈ {+1,-1} per feature OCCURRENCE — count-weighted, the
    * perceptron x·y), and stops early on an epoch with zero mistakes.
    * Reordering or repartitioning the input cannot change the result
    * (suite-pinned). */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      nBuckets: Int = 1024, epochs: Int = 20): Model = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val feats = df.select(
      when(col(labelCol), 1L).otherwise(-1L).as("__y"),
      HashedFeaturesFunctions.hashedFeatures(col(textCol), nBuckets)
        .as("__fb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val weights = new Array[Long](nBuckets)
      var bias = 0L
      var epoch = 0
      var converged = false
      while (epoch < epochs && !converged) {
        val wLit = typedlit(weights.toSeq)
        val s = aggregate(
          transform(col("__fb"), b => element_at(wLit, b + 1)),
          lit(bias), (acc, x) => acc + x)
        val mistakes = feats.withColumn("__s", s)
          .filter(col("__y") * col("__s") <= 0)
        val upd = mistakes
          .select(col("__y"), explode(col("__fb")).as("__b"))
          .groupBy("__b").agg(sum(col("__y")).as("__g"))
          .collect()
        // the bias delta sees EVERY mistake, including zero-feature docs
        // that contribute no exploded rows — converge only when both the
        // weight update and the bias update are zero, else an all-empty-doc
        // mistake set would falsely read as converged
        val biasDelta = mistakes.agg(coalesce(sum(col("__y")), lit(0L)))
          .head.getLong(0)
        if (upd.isEmpty && biasDelta == 0L) converged = true
        else {
          upd.foreach(r => weights(r.getInt(0)) += r.getLong(1))
          bias += biasDelta
          epoch += 1
        }
      }
      Model(weights, bias)
    } finally { feats.unpersist(false); () }
  }

  /** Per-source calibration report of a deployed classifier — the QC a
    * learned gate ships with: if one source's keep rate collapses (or
    * saturates) the model is mis-calibrated for it, long before any
    * drift signal trips. One row per source: doc/keep counts,
    * `keep_rate`, `mean_score`, score extrema. Map-only scoring fused
    * into the scan + one partial-agg'd exchange on the source key;
    * the mean divides exact integer sums once. */
  def calibration(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, model: Model): DataFrame =
    df.select(col(sourceCol).as("source"),
        scoreCol(col(textCol), model).as("__s"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("__s") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_keep"),
        round(coalesce(sum(when(col("__s") > 0, 1L).otherwise(0L)),
          lit(0L)).cast("double") / greatest(count(lit(1)), lit(1L)), 4)
          .as("keep_rate"),
        round(sum(col("__s")).cast("double") /
          greatest(count(lit(1)), lit(1L)), 4).as("mean_score"),
        min("__s").as("min_score"), max("__s").as("max_score"))

  /** Per-bucket feature-occurrence counts over a reference slice — ONE
    * partial-agg'd exchange, O(nBuckets) collect (the model itself).
    * Useful two ways: as the deterministic, oracle-replayable stand-in
    * for a trained weight vector (same format, same zero-set semantics
    * — a bucket is zero iff the slice never produced it), and as the
    * count table a frequency-prior model would start from. */
  def featureCoverage(slice: DataFrame, textCol: String,
      nBuckets: Int): Array[Long] = {
    val counts = slice
      .select(explode(HashedFeaturesFunctions.hashedFeatures(col(textCol),
        nBuckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect()
    val w = new Array[Long](nBuckets)
    counts.foreach(r => w(r.getInt(0)) = r.getLong(1))
    w
  }

  /** Model-coverage drift for a new batch — the staleness signal of the
    * persisted-weights discipline, mirroring `Curation.vocabDrift` for
    * the classifier family: a weight vector fit once degrades silently
    * when the corpus moves, and the measurable symptom is features
    * landing in buckets the fit never saw (weight exactly 0 — untouched
    * slots). One row: feature totals, corpus-level `zero_rate`,
    * `frac_high` (share of documents whose own zero-bucket rate exceeds
    * `maxDocZero`), and `rebuild` when that share exceeds
    * `maxHighFrac`. Map-only feature hashing against a literal zero-set
    * mask + one global aggregate; the batch never shuffles. */
  def drift(batch: DataFrame, idCol: String, textCol: String, model: Model,
      maxDocZero: Double, maxHighFrac: Double): DataFrame = {
    val zeroMask = typedlit(model.weights.map(_ == 0L).toSeq)
    val fb = HashedFeaturesFunctions.hashedFeatures(col(textCol),
      model.nBuckets)
    batch
      .select(size(fb).cast("long").as("__nf"),
        size(filter(fb, b => element_at(zeroMask, b + 1))).cast("long")
          .as("__nz"))
      .withColumn("__high", col("__nz").cast("double") /
        greatest(col("__nf"), lit(1L)) > maxDocZero)
      // Empty-batch contract (the quantizerDrift/vocabDrift discipline):
      // zero rows is not drift evidence — rebuild reads false, never NULL
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__nf")), lit(0L)).as("n_features"),
        coalesce(sum(col("__nz")), lit(0L)).as("n_zero"),
        round(coalesce(sum(col("__nz")), lit(0L)).cast("double") /
          greatest(sum(col("__nf")), lit(1L)), 4).as("zero_rate"),
        round(coalesce(sum(when(col("__high"), 1L).otherwise(0L)), lit(0L))
          .cast("double") / greatest(count(lit(1)), lit(1L)), 4)
          .as("frac_high"))
      .withColumn("rebuild", col("frac_high") > maxHighFrac)
  }

  /** Persist as a tiny parquet table stamped with the
    * [[HistoryFormat.QualityClfWeights]] marker. */
  def save(spark: SparkSession, path: String, model: Model): Unit = {
    import spark.implicits._
    (model.weights.zipWithIndex.map { case (w, i) => (i, w) }.toSeq
      :+ ((-1, model.bias)))
      .toDF("bucket", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
    HistoryFormat.stamp(spark.sparkContext.hadoopConfiguration, path,
      HistoryFormat.QualityClfWeights)
  }

  /** Inverse of [[save]]; refuses a missing or mismatched format marker
    * (operator-enforced — a weight vector under a different feature-
    * hash fold mis-scores silently). */
  def load(spark: SparkSession, path: String): Model = {
    HistoryFormat.ensure(spark.sparkContext.hadoopConfiguration, path,
      HistoryFormat.QualityClfWeights, hasData = true)
    val rows = spark.read.parquet(path).collect()
    val bias = rows.find(_.getInt(0) == -1).map(_.getLong(1)).getOrElse(0L)
    val ws = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0)).map(_.getLong(1))
    Model(ws, bias)
  }
}

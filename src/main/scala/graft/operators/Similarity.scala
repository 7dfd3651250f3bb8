package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Vector math is `zip_with`/`aggregate` over the array — native Catalyst
  * higher-order functions, no UDF — folding left-to-right in element order
  * (deterministic, double precision).
  *
  * Scale path: brute force is the correctness baseline (O(Q·N) after
  * broadcasting the query side); the LSH variant buckets by random
  * hyperplane signs so each query compares only within its bucket —
  * one shuffle on the bucket key instead of a cross join.
  */
object Similarity {

  /** Dot product of two float arrays in double precision — a native
    * codegen'd Catalyst expression ([[graft.functions.FloatVecDot]]); the
    * interpreted `zip_with`/`aggregate` formulation costs ~10x per element. */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vecDot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k cosine neighbors for each query row.
    * The query side should be small enough to broadcast; at 100 TB the
    * corpus stays partitioned and never shuffles. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val joined = c.crossJoin(q)
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k)
      .withColumnRenamed("__rk", "rank")
  }

  /** Deterministic ±1 hyperplane for SRP bucketing: plane `p` over `dims`
    * dimensions, seeded from (42, p) — no stored model, reproducible
    * across runs. */
  private[operators] def srpPlane(p: Int, dims: Int): Array[Float] = {
    val rng = new java.util.Random(42L * 1000003L + p)
    Array.fill(dims)(if (rng.nextBoolean()) 1f else -1f)
  }

  /** Signed-random-projection bucket key. The hyperplanes are literal
    * float arrays, so each sign test is one codegen'd [[dot]] against a
    * constant — no per-dimension hashing in the hot path (the previous
    * formulation hashed a string per plane per dimension, interpreted).
    * `planeOffset` selects an independent plane family — hash table `t`
    * of a multi-table index passes `t * planes`. */
  def srpBucket(vec: Column, planes: Int, dims: Int, planeOffset: Int = 0): Column =
    // fused kernel: ONE pass over the vector sets all plane bits — the
    // previous per-plane `when(dot > 0, 1L<<p)` reduce re-scanned the
    // vector `planes` times; bit/NaN/null parity pinned in
    // CentroidKernelSuite
    graft.functions.CentroidFunctions.srpBucketKey(vec,
      Array.tabulate(planes)(p => srpPlane(planeOffset + p, dims)))

  /** Symmetric int8 quantization of an embedding column — the storage and
    * shuffle-bandwidth lever a 100 TB embedding corpus needs (4× smaller
    * than float32; unit-norm dot products stay within ~1%). Per-vector
    * scale = max|x|/127 rides along in `scaleCol`; all-zero vectors
    * quantize to zeros with scale 0. Pure codegen higher-order functions —
    * no UDF, no shuffle, columnar in and out. */
  def quantizeInt8(df: DataFrame, vecCol: String,
      outCol: String = "q", scaleCol: String = "q_scale"): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0f),
      (acc, x) => greatest(acc, abs(x)))
    df.withColumn(scaleCol, (maxAbs / 127f).cast("float"))
      .withColumn(outCol,
        when(col(scaleCol) === 0f,
          transform(col(vecCol), _ => lit(0).cast("byte")))
        .otherwise(transform(col(vecCol),
          x => round(x / col(scaleCol)).cast("byte"))))
  }

  /** Inverse of [[quantizeInt8]]: reconstruct approximate float vectors. */
  def dequantizeInt8(df: DataFrame, qCol: String, scaleCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol,
      transform(col(qCol), b => (b.cast("float") * col(scaleCol)).cast("float")))

  /** Deterministic quantizer init: the `nlist` corpus vectors with the
    * smallest xxhash64(id) — no stored model, reproducible across runs.
    * O(nlist·dims) driver memory: the model, never the data. */
  /** L2-normalized copy of a centroid model (zero vectors kept as-is),
    * so plain dots are cosine-ordered. */
  private[operators] def l2NormalizeModel(
      cs: Array[Array[Float]]): Array[Array[Float]] =
    cs.map { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      if (n == 0) c else c.map(x => (x / n).toFloat)
    }

  /** Nearest-centroid index for a vector column: a per-row argmax over
    * the literal (driver-small, broadcast-in-plan) model — no explode,
    * no window, NO shuffle of the corpus; ties break to the lowest
    * index. Pass an [[l2NormalizeModel]]-normalized model. */
  private[operators] def nearestCentroid(vec: Column,
      normed: Array[Array[Float]]): Column = {
    // fused codegen kernel (CentroidScores) — bit-identical to the old
    // transform(sequence, i -> dot(vec, element_at(cents, i+1))) HOF,
    // which ran interpreted and printed the matrix into the plan
    val dots = graft.functions.CentroidFunctions.centroidDots(vec, normed)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  private def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[Array[Float]] = corpus
    .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
    .filter(col("v").isNotNull)
    .orderBy("h").limit(nlist)
    .collect().map(_.getSeq[Float](0).toArray)

  /** Train the IVF coarse quantizer with Lloyd's k-means — what FAISS's
    * IVF `train()` does, expressed as repeated one-shuffle aggregations:
    * every iteration assigns each vector to its nearest centroid with the
    * same literal-argmax codegen used at query time (cosine assignment,
    * i.e. spherical k-means — matching how [[ivfTopK]] probes), then
    * reduces per-cluster element-wise sums + counts via `dims` map-side-
    * combined `sum()` columns. Only k·dims partial sums per partition ever
    * shuffle; the vectors themselves never move, and the only driver-side
    * state is the O(nlist·dims) model. Deterministic: hash-ordered init,
    * fixed iteration count, empty clusters keep their previous centroid. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iterations: Int = 4): Array[Array[Float]] = {
    val init = sampleCentroids(corpus, idCol, vecCol, nlist)
    if (init.isEmpty) return init
    val dims = init.head.length
    var centroids = init
    // Every iteration re-reads only THIS cached projection, not the
    // source: the vectors are the training set and Lloyd's loop is the
    // textbook iterative-reuse case (same reason MLlib's KMeans caches
    // its norm-augmented input). Unpersisted before returning — trainers
    // must not leak executor memory into the query that follows.
    val vecs = corpus.select(col(vecCol).as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (1 to iterations).foreach { _ =>
        val normed = l2NormalizeModel(centroids)
        val dots = graft.functions.CentroidFunctions
          .centroidDots(col("v"), normed)
        val sums = (0 until dims).map(i =>
          sum(element_at(col("v"), i + 1).cast("double")).as(s"s$i"))
        val stats = vecs
          .withColumn("__dots", dots)
          .withColumn("__b",
            (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast("int"))
          .groupBy("__b").agg(count(lit(1)).as("n"), sums: _*)
          .collect()
        val next = centroids.clone()
        stats.foreach { r =>
          val b = r.getInt(0)
          val n = r.getLong(1)
          if (n > 0 && b >= 0 && b < next.length)
            next(b) = Array.tabulate(dims)(i => (r.getDouble(2 + i) / n).toFloat)
        }
        centroids = next
      }
      centroids
    } finally vecs.unpersist(false)
  }

  /** Drift report for a persisted quantizer against a new batch — the
    * maintenance signal of the incremental-similarity family: the
    * quantizer trains ONCE ([[trainIvfCentroids]] + [[saveQuantizer]])
    * and every later batch indexes under it, which silently degrades if
    * the data distribution moves. Per vector, the max cosine to any
    * centroid (the assignment quality ivfTopK's probe depends on);
    * aggregated to one row: `n`, `mean_assign_cos`, `frac_low` (share
    * of vectors assigning below `minAssignCos`), and `retrain` when
    * that share exceeds `maxLowFrac` — the cue to re-run Lloyd and
    * re-key the index, exactly the FAISS-operational "retrain when nprobe
    * recall sags" check made measurable per batch.
    *
    * Plan shape: literal-centroid dots (the [[nearestCentroid]]
    * machinery), map-only, then ONE global aggregate — no shuffle of
    * the batch, O(k·dims) plan constant. Cosines round at 4 decimals
    * before aggregation (the e_ann determinism recipe) and the mean
    * uses exact decimal summation, so the report is engine-exact. */
  def quantizerDrift(batch: DataFrame, idCol: String, vecCol: String,
      quantizer: Array[Array[Float]], minAssignCos: Double,
      maxLowFrac: Double): DataFrame = {
    require(quantizer.nonEmpty, "quantizerDrift: empty quantizer")
    val dims = quantizer.head.length
    val v = col(vecCol)
    val cos = round(array_max(
      graft.functions.CentroidFunctions.centroidCosines(v, quantizer)), 4)
    // Empty-batch contract: zero rows is NOT drift evidence — sums are
    // NULL and a bare /count would make retrain NULL (a silent
    // non-answer to a consumer branching on the flag). Coalesce sums to
    // 0 and guard the divisor so the report reads n=0, ratios 0.0,
    // retrain=false.
    batch.filter(v.isNotNull && size(v) === dims)
      .select(cos.as("c"))
      .agg(count(lit(1)).as("n"),
        round(coalesce(
          sum(col("c").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
            .cast("double"), lit(0d)) / greatest(count(lit(1)), lit(1L)), 4)
          .as("mean_assign_cos"),
        round(coalesce(sum(when(col("c") < minAssignCos, 1L).otherwise(0L))
          .cast("double"), lit(0d)) / greatest(count(lit(1)), lit(1L)), 4)
          .as("frac_low"))
      .withColumn("retrain", col("frac_low") > maxLowFrac)
  }

  /** Persist a trained quantizer as a tiny parquet table
    * `(idx int, centroid array<float>)` — the incremental-similarity
    * state: train ONCE on early batches ([[trainIvfCentroids]]), then
    * every later batch [[loadQuantizer]]s and probes ([[ivfTopK]],
    * [[graft.operators.Dedup.semDedupPairs]]) without touching prior
    * batches' vectors or re-running Lloyd iterations. O(nlist · dims)
    * bytes — model-sized, like the driver state it round-trips. */
  def saveQuantizer(spark: org.apache.spark.sql.SparkSession, path: String,
      model: Array[Array[Float]]): Unit = {
    import spark.implicits._
    model.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("idx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveQuantizer]]; centroid order restores by `idx` (the
    * bucket ids assigned at index time stay meaningful). */
  def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Float]] =
    spark.read.parquet(path).orderBy("idx")
      .collect().map(_.getSeq[Float](1).toArray)

  /** IVF-style ANN (FAISS IVF-Flat shape): `nlist` centroids — pass a
    * [[trainIvfCentroids]] model via `quantizer`, or let a deterministic
    * hash-ordered corpus sample stand in (random coarse quantizer) —
    * every corpus vector is assigned to its nearest centroid, and each
    * query probes its `nprobe` nearest centroid buckets. One shuffle on
    * the bucket key; the centroid table is driver-small and rides into
    * the plan as a literal, exactly like a trained quantizer would be
    * broadcast.
    *
    * Misses happen when a true neighbor lands in an unprobed bucket —
    * `nlist` trades bucket size against recall, `nprobe` buys recall
    * back, and a trained quantizer shapes buckets to the data's actual
    * clusters (higher recall at the same nprobe on clustered corpora). */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 2,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      quantizer: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids: Array[Array[Float]] =
      quantizer.getOrElse(sampleCentroids(corpus, idCol, vecCol, nlist))
    if (centroids.isEmpty)
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0d).as("cosine"), lit(0).as("rank")).limit(0)
    // L2-normalized so a plain dot is cosine-ordered for the argmax
    val normed = l2NormalizeModel(centroids)

    /** Per-vector centroid dots — fused codegen kernel (bit-identical to
      * the old per-element HOF; see [[nearestCentroid]]). */
    def centroidDots(vec: Column): Column =
      graft.functions.CentroidFunctions.centroidDots(vec, normed)

    /** Corpus assignment (probes = 1): the nearest-centroid index is a
      * per-row argmax over the literal centroid array — no explode, no
      * window, NO shuffle of the corpus (an earlier formulation exploded
      * every vector over all nlist centroids and ranked with a window,
      * an nlist-fold shuffle of the whole table). Ties break to the
      * lowest centroid index. Assumes unique ids (duplicate query ids
      * would collapse in the probe ranking below). */
    def assignNearest(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
        .withColumn("__dots", centroidDots(col(vecAs)))
        .withColumn("bucket",
          (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast("int"))
        .drop("__dots")

    /** Query-side probing (small side): posexplode the fused kernel's
      * per-centroid dots array (ONE vector pass computes all k dots; the
      * k-element rows and their dot values are bit-identical to the old
      * explode + per-bucket re-dot against a typedlit matrix, which also
      * printed the k×d literal into the plan) and keep the `probes`
      * nearest buckets per query. */
    def assign(df: DataFrame, idAs: String, vecAs: String, probes: Int): DataFrame =
      if (probes <= 1) assignNearest(df, idAs, vecAs)
      else {
        val w = Window.partitionBy(idAs).orderBy(col("__cdot").desc, col("bucket"))
        df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
          .select(col(idAs), col(vecAs),
            posexplode(centroidDots(col(vecAs))).as(Seq("bucket", "__cdot")))
          .withColumn("__cr", row_number().over(w))
          .filter(col("__cr") <= probes)
          .drop("__cdot", "__cr")
      }

    // Clustered corpora skew: most vectors can argmax to ONE centroid, and
    // that bucket's join side goes hot. Same rank-cap as lshTopK — the
    // window shares the join's hash exchange on `bucket`, and Spark's
    // WindowGroupLimit truncates map-side before the shuffle.
    val cAll = assignNearest(corpus, "neighbor_id", "nv")
    val c =
      if (maxBucket > 0) {
        val wb = Window.partitionBy(col("bucket")).orderBy(col("neighbor_id"))
        cAll.withColumn("__rn", row_number().over(wb))
          .filter(col("__rn") <= maxBucket).drop("__rn")
      } else cAll
    val q = assign(queries, "query_id", "qv", probes = nprobe)
    val joined = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
      .distinct() // a pair can meet in more than one probed bucket
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** A product-quantization model (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011 — the FAISS `PQ` codec):
    * the `dims`-dim space splits into `m` subspaces of `dsub` dims, each
    * with its own `ksub`-centroid codebook; a vector encodes as `m`
    * one-byte codes. `codebooks(j)(c)` is subspace `j`'s centroid `c`.
    * O(m·ksub·dsub) floats — model-sized, rides plans as a literal. */
  case class PqModel(m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Array[Array[Float]]]) {
    require(ksub >= 1 && ksub <= 256, s"ksub must fit one byte, got $ksub")
    def dims: Int = m * dsub
  }

  /** Train PQ codebooks with per-subspace Lloyd k-means on a BOUNDED
    * hash-ordered corpus sample (what FAISS `train()` does on its
    * training set). The collect is O(sampleN·dims) — the training
    * sample, never the corpus; deterministic: hash-ordered sample,
    * first-`ksub`-distinct init per subspace, fixed iteration count,
    * empty clusters keep their previous centroid. */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int = 16, sampleN: Int = 2048,
      iterations: Int = 8): PqModel = {
    val sample = corpus
      .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
      .filter(col("v").isNotNull)
      .orderBy("h").limit(sampleN)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "trainPq: empty corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"trainPq: dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val codebooks = Array.tabulate(m) { j =>
      val subs = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      val init = subs.distinct.take(ksub)
      var cents = init
      (1 to iterations).foreach { _ =>
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0d; var i = 0
            while (i < dsub) {
              val diff = s(i) - cents(c)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += s(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(cents.length) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(i => (sums(c)(i) / counts(c)).toFloat)
        }
      }
      cents
    }
    PqModel(m, codebooks.map(_.length).min, dsub, codebooks)
  }

  /** Persist / restore a [[PqModel]] as a tiny parquet table — the
    * incremental-index state, like [[saveQuantizer]]: train once, encode
    * every later batch under the SAME codebooks so codes stay mutually
    * comparable. */
  def savePqModel(spark: org.apache.spark.sql.SparkSession, path: String,
      model: PqModel): Unit = {
    import spark.implicits._
    (for (j <- model.codebooks.indices; c <- model.codebooks(j).indices)
      yield (j, c, model.codebooks(j)(c).toSeq))
      .toDF("sub", "idx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PqModel = {
    val rows = spark.read.parquet(path).orderBy("sub", "idx").collect()
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Float](2).toArray)).toArray
    PqModel(books.length, books.map(_.length).min, books.head.head.length, books)
  }

  /** PQ-encode a vector column: `m` one-byte codes (nearest codebook
    * entry per subspace, L2, ties to the lowest index) plus the true L2
    * norm for cosine reconstruction. Pure literal-argmin codegen, map
    * only, NO shuffle — and the index a 100 TB corpus stores/shuffled
    * afterwards is `m + 4` bytes per vector instead of `4·dims`
    * (16× smaller at dims=64, m=16). */
  def pqEncode(df: DataFrame, vecCol: String, model: PqModel,
      codesCol: String = "pq_codes", normCol: String = "pq_norm"): DataFrame = {
    val codes = array((0 until model.m).map { j =>
      // ||x−c||² = ||x||² − 2x·c + ||c||²; ||x||² is constant per row.
      // Fused codegen kernel over vec[j·dsub, (j+1)·dsub) — bit-identical
      // to the old slice + per-element HOF (cn2 − 2·dot).
      val dists = graft.functions.CentroidFunctions.pqSubDists(
        col(vecCol), model.codebooks(j), j * model.dsub)
      (array_position(dists, array_min(dists)) - 1).cast("byte")
    }: _*)
    df.withColumn(codesCol, codes).withColumn(normCol, l2Norm(col(vecCol)).cast("float"))
  }

  /** IVF-PQ ANN (the FAISS `IVFPQ` shape, flat — codes over raw vectors):
    * coarse-quantizer buckets prune the corpus exactly as [[ivfTopK]],
    * but the bucket join carries `m`-byte PQ codes instead of float
    * vectors, and candidates rank by asymmetric-distance (ADC) lookups —
    * each query precomputes its `m × ksub` table of subspace dots ONCE
    * (O(dims·ksub) work per QUERY), so scoring a candidate is `m`
    * array lookups + adds, not a `dims`-length dot. The top `rerank`
    * candidates per query then re-rank by EXACT cosine against the true
    * vectors (fetched through an AQE-splittable join keyed by id — only
    * queries × rerank rows, never the corpus).
    *
    * At 100 TB: the corpus-side state that moves through the bucket join
    * is (id, bucket, codes, norm) ≈ m+12 bytes/row — the 16-64× shrink
    * vs raw vectors is the difference between an index that fits in
    * shuffle memory and one that doesn't. Recall follows IVF probing
    * (nlist/nprobe) degraded by PQ approximation; `rerank` buys exactness
    * of the final ORDER back once the true neighbor is among candidates. */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      pq: PqModel, nlist: Int = 16, nprobe: Int = 2, rerank: Int = 32,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      quantizer: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids: Array[Array[Float]] = quantizer.getOrElse(
      corpus.select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
        .filter(col("v").isNotNull).orderBy("h").limit(nlist)
        .collect().map(_.getSeq[Float](0).toArray))
    if (centroids.isEmpty)
      return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(0d).as("cosine"), lit(0).as("rank")).limit(0)
    ivfPqTopKFromIndex(queries,
      pqIndexBatch(corpus, idCol, vecCol, pq, centroids),
      corpus, idCol, vecCol, k, pq, nprobe, rerank, maxBucket, centroids)
  }

  /** Encode one arriving batch into PQ INDEX rows
    * `(id, bucket, pq_codes, pq_norm)` under a FIXED persisted model pair
    * (coarse quantizer + PQ codebooks — both train once, like the
    * SemDeDup quantizer): append the result to an index table and later
    * batches' codes stay mutually comparable. Map-only, no shuffle; the
    * appended state is m+12 bytes per vector, never the vectors. */
  def pqIndexBatch(batch: DataFrame, idCol: String, vecCol: String,
      pq: PqModel, quantizer: Array[Array[Float]]): DataFrame = {
    val normed = l2NormalizeModel(quantizer)
    pqEncode(
      batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
        .withColumn("bucket", nearestCentroid(col("nv"), normed)),
      "nv", pq).drop("nv")
  }

  /** [[ivfPqTopKFromIndex]] reading the persisted code index from its
    * table directory — validates the
    * [[graft.state.HistoryFormat.PqCodes]] marker BEFORE any probe, so
    * codes produced under a different (quantizer, codebook) derivation
    * refuse from the operator with the re-encode remedy named. The
    * DataFrame overload leaves the check to the caller. */
  def ivfPqTopKFromIndexTable(
      queries: DataFrame, indexDir: String, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int,
      pq: PqModel, nprobe: Int, rerank: Int,
      maxBucket: Int, quantizer: Array[Array[Float]]): DataFrame =
    ivfPqTopKFromIndex(queries,
      graft.state.HistoryTables.readChecked(queries.sparkSession, indexDir,
        graft.state.HistoryFormat.PqCodes),
      vectors, idCol, vecCol, k, pq, nprobe, rerank, maxBucket, quantizer)

  /** ANN over an ACCUMULATED PQ code index ([[pqIndexBatch]] appends):
    * candidate generation touches only the m-byte codes; the exact
    * re-rank fetches true vectors from `vectors` by id (queries × rerank
    * rows). This is the incremental-similarity shape: the raw history
    * vectors are read ONLY for the final candidate fetch, never scanned
    * or shuffled for search. */
  def ivfPqTopKFromIndex(
      queries: DataFrame, index: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int,
      pq: PqModel, nprobe: Int, rerank: Int,
      maxBucket: Int, quantizer: Array[Array[Float]]): DataFrame = {
    val normed = l2NormalizeModel(quantizer)
    val c =
      if (maxBucket > 0) {
        val wb = Window.partitionBy(col("bucket")).orderBy(col("neighbor_id"))
        index.withColumn("__rn", row_number().over(wb))
          .filter(col("__rn") <= maxBucket).drop("__rn")
      } else index

    // queries: nprobe nearest buckets + the per-query ADC table. Probe
    // selection posexplodes the fused kernel's dots array — one vector
    // pass for all nlist coarse dots, bit-identical values to the old
    // explode + per-bucket re-dot, and no k×d typedlit in the plan.
    val qtab = array((0 until pq.m).map { j =>
      // per-subspace ADC dot table — fused codegen kernel (bit-identical
      // to the old slice + per-element HOF)
      graft.functions.CentroidFunctions.pqSubDots(
        col("qv"), pq.codebooks(j), j * pq.dsub)
    }: _*)
    val wq = Window.partitionBy("query_id").orderBy(col("__cdot").desc, col("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(graft.functions.CentroidFunctions
          .centroidDots(col("qv"), normed)).as(Seq("bucket", "__cdot")))
      .withColumn("__cr", row_number().over(wq))
      .filter(col("__cr") <= nprobe)
      .drop("__cdot", "__cr")
      .withColumn("qtab", qtab)
      .withColumn("qnorm", l2Norm(col("qv")))

    // ADC score: m table lookups + adds per candidate
    val approx = (0 until pq.m).map(j =>
      element_at(element_at(col("qtab"), j + 1),
        element_at(col("pq_codes"), j + 1).cast("int") + 1)).reduce(_ + _)
    val wr = Window.partitionBy("query_id")
      .orderBy(col("__approx").desc, col("neighbor_id"))
    val cands = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__approx",
        approx / (col("qnorm") * greatest(col("pq_norm"), lit(1e-30f))))
      .select("query_id", "neighbor_id", "__approx")
      .distinct() // a pair can meet in more than one probed bucket
      .withColumn("__ar", row_number().over(wr))
      .filter(col("__ar") <= rerank)
      .select("query_id", "neighbor_id")

    // exact re-rank over the true vectors: queries × rerank rows only
    val nv = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.join(nv, Seq("neighbor_id")).join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: queries and corpus bucketed by SRP signature; each
    * query searches only its bucket(s). Misses are possible (that's the
    * "approximate"); `planes` trades recall for bucket size, and `tables`
    * unions candidates from that many INDEPENDENT plane families
    * (classic multi-table LSH: per-table miss probability (1−p) compounds
    * to (1−p)^tables — the standard recall lever when the corpus has weak
    * cluster structure).
    *
    * Scale shape with tables > 1: the bucket join carries only
    * (id, table, bucket) rows — vectors do NOT replicate per table; the
    * surviving candidate PAIRS dedupe and then fetch vectors through
    * AQE-splittable joins (no forced broadcast — a driver-small query
    * set still broadcasts via AQE's threshold; a large one shuffle-joins
    * instead of OOMing).
    *
    * The corpus side of the bucket join is capped at `maxBucket` members
    * per (table, bucket) (rank filter, smallest id first —
    * deterministic): all-zero or near-zero vectors fail every hyperplane
    * sign test and collapse into bucket 0, and without the cap a
    * zero-heavy corpus turns the join into a hot-key near-cross-join.
    * Capping drops candidates (recall, never precision); `maxBucket = 0`
    * disables. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8,
      dims: Int = 0, maxBucket: Int = Dedup.DefaultMaxBucket,
      tables: Int = 1): DataFrame = {
    // hyperplanes need the dimensionality; sample a NON-NULL vector if not
    // supplied (a sampled null would mistake a live corpus for empty) —
    // empty/all-null corpora yield an empty result, not a failed inference
    val d =
      if (dims > 0) dims
      else corpus.filter(col(vecCol).isNotNull)
        .select(size(col(vecCol))).limit(1).collect() match {
        case rows if rows.isEmpty =>
          return queries.select(col(idCol).as("query_id"), col(idCol).as("neighbor_id"),
            lit(0d).as("cosine"), lit(0).as("rank")).limit(0)
        case rows => rows(0).getInt(0)
      }
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val nv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    def buckets(vcol: String): Column = array((0 until tables).map(t =>
      srpBucket(col(vcol), planes, d, planeOffset = t * planes)): _*)
    if (tables <= 1) {
      // single-table: vectors ride the bucket join directly (no fetch join)
      val q = qv.withColumn("bucket", srpBucket(col("qv"), planes, d))
      val cAll = nv.withColumn("bucket", srpBucket(col("nv"), planes, d))
      val c =
        if (maxBucket > 0) {
          val wb = Window.partitionBy(col("bucket")).orderBy(col("neighbor_id"))
          cAll.withColumn("__rn", row_number().over(wb))
            .filter(col("__rn") <= maxBucket).drop("__rn")
        } else cAll
      val joined = c.join(q, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("qv"), col("nv")).as("cosine"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      return joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
    val qb = qv.select(col("query_id"),
      posexplode(buckets("qv")).as(Seq("tbl", "bucket")))
    val cb0 = nv.select(col("neighbor_id"),
      posexplode(buckets("nv")).as(Seq("tbl", "bucket")))
    val cb =
      if (maxBucket > 0) {
        val wb = Window.partitionBy(col("tbl"), col("bucket"))
          .orderBy(col("neighbor_id"))
        cb0.withColumn("__rn", row_number().over(wb))
          .filter(col("__rn") <= maxBucket).drop("__rn")
      } else cb0
    // no broadcast HINTS on the query side: the API puts no bound on the
    // query-set size, and a forced broadcast of tables× query rows (or
    // the query vectors) would OOM on a large query frame where a shuffle
    // join works fine. AQE still broadcasts automatically whenever the
    // query side is under the threshold — the common driver-small case
    // keeps its broadcast plan without the hint's unbounded downside.
    val cands = cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct() // a pair can meet in several tables
    val joined = cands
      .join(nv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Prototype-based cluster pruning (Sorscher et al. 2206.14486, the
    * "SSL prototypes" data-pruning metric — a training-data operator
    * beyond the reference's own surface, like the rest of the embedding
    * family): assign every vector to its nearest centroid of a trained
    * (persistable) quantizer, rank WITHIN each cluster by
    * prototypicality — cosine to the assigned centroid — and keep a
    * per-cluster quota. `keepEasiest = false` (default) retains the
    * LEAST prototypical rows (hard-example retention, the Sorscher
    * high-data regime); `true` flips to most-prototypical (the
    * low-data/denoising regime). This is the diversity-preserving
    * sibling of SemDeDup: that removes near-identical twins inside a
    * cluster, this thins whole clusters toward their informative margin.
    *
    * Determinism (the e_ann recipe): cosines round at 4 decimals BEFORE
    * ranking, ties break on id — a total order any engine replays.
    * The quota compare is cross-multiplied integer arithmetic
    * (`rank · 1000 <= keepPermille · cluster_n` — keep =
    * floor(keepPermille·n/1000) rows), never a float threshold.
    *
    * Scale shape: the centroid model rides into the plan as a literal
    * (O(nlist·dims), driver-small) so assignment + prototypicality are
    * ONE map-only codegen pass; the only exchange is the per-cluster
    * ranking window. A cluster is one window group, so `nlist` must
    * scale with the corpus (~√N keeps groups executor-sized — the same
    * contract semDedupPairs documents); ties to the lowest centroid
    * index on equal cosine. */
  def clusterPrune(df: DataFrame, idCol: String, vecCol: String,
      quantizer: Array[Array[Float]], keepPermille: Int,
      keepEasiest: Boolean = false): DataFrame = {
    require(quantizer.nonEmpty, "clusterPrune: empty quantizer")
    require(keepPermille >= 0 && keepPermille <= 1000,
      s"clusterPrune: keepPermille must be in [0, 1000], got $keepPermille")
    pruneRanked(df, idCol, vecCol, quantizer, easiest = keepEasiest)
      .withColumnRenamed("batch_n", "cluster_n")
      .withColumn("keep",
        col("rnk") * 1000L <= lit(keepPermille.toLong) * col("cluster_n"))
  }

  /** Shared assignment + per-cluster prototypicality ranking of the
    * prune family: `(id, cluster, proto_cos, rnk, batch_n)`; rank order
    * is hardest-first unless `easiest`. Zero-norm vectors are filtered
    * with the null/ragged ones: their cosine is 0/0 = NaN, which Spark
    * sorts ABOVE every double — the row would silently land in centroid
    * 0 ranked "easiest", outside the rounded-cosine total-order recipe
    * and divergent from an ANSI engine's NULL-producing division. */
  private def pruneRanked(df: DataFrame, idCol: String, vecCol: String,
      quantizer: Array[Array[Float]], easiest: Boolean = false): DataFrame = {
    val dims = quantizer.head.length
    val v = col(vecCol)
    // fused codegen kernel; roundAt=4 applies Spark's round(x, 4) per
    // element BEFORE the max/argmax, exactly as the old HOF did
    val coss = graft.functions.CentroidFunctions
      .centroidCosines(v, quantizer, roundAt = 4)
    val order =
      if (easiest) Seq(col("proto_cos").desc, col(idCol).asc)
      else Seq(col("proto_cos").asc, col(idCol).asc)
    df.filter(v.isNotNull && size(v) === dims && dot(v, v) > 0d)
      .select(col(idCol), coss.as("__coss"))
      .select(col(idCol),
        (array_position(col("__coss"), array_max(col("__coss"))) - 1)
          .cast("int").as("cluster"),
        array_max(col("__coss")).as("proto_cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy("cluster")
        .orderBy(order: _*)).cast("long"))
      .withColumn("batch_n", count(lit(1)).over(
        Window.partitionBy("cluster")))
  }

  /** Cross-batch [[clusterPrune]] under a persisted per-cluster quota
    * history — the incremental shape: the quantizer is FIXED (the
    * SemDeDup-quantizer discipline), the history is `(cluster, seen,
    * kept)` totals over every prior batch, and this batch keeps at most
    *   `a_c = clamp(floor(permille·(seen_c + batch_c)/1000) − kept_c,
    *     0, batch_c)`
    * of its hardest members per cluster — so the CUMULATIVE kept share
    * tracks the quota across skewed arrivals (one crawl dump = one
    * cluster flooding), the mix-steering coupling applied to pruning.
    * Prune decisions are made ONCE, at arrival, over the batch-local
    * hardness ranking: history rows are never re-ranked (re-opening
    * them would unbound the state — the whole point of the quota
    * history is that O(nlist) counts replace the corpus).
    *
    * Scale shape: assignment + ranking as [[clusterPrune]]; the history
    * aggregates to O(nlist) rows and broadcasts into the batch. Append
    * [[prunedCounts]] of each output to the history between batches. */
  def clusterPruneAgainstHistory(batch: DataFrame, idCol: String,
      vecCol: String, quantizer: Array[Array[Float]], keepPermille: Int,
      history: DataFrame): DataFrame = {
    require(quantizer.nonEmpty, "clusterPruneAgainstHistory: empty quantizer")
    require(keepPermille >= 0 && keepPermille <= 1000,
      s"keepPermille must be in [0, 1000], got $keepPermille")
    val hist = history.groupBy("cluster")
      .agg(sum("seen").as("seen"), sum("kept").as("kept"))
    pruneRanked(batch, idCol, vecCol, quantizer)
      .join(broadcast(hist), Seq("cluster"), "left")
      .na.fill(0L, Seq("seen", "kept"))
      .withColumn("quota", greatest(lit(0L), least(col("batch_n"),
        expr(s"(${keepPermille}L * (seen + batch_n)) div 1000")
          - col("kept"))))
      .withColumn("keep", col("rnk") <= col("quota"))
      .select(col(idCol), col("cluster"), col("proto_cos"), col("rnk"),
        col("batch_n"), col("quota"), col("keep"))
  }

  /** Per-cluster `(cluster, seen, kept)` counts of a
    * [[clusterPruneAgainstHistory]] output, shaped for the history
    * table (union/append between batches; the operator re-aggregates). */
  def prunedCounts(out: DataFrame): DataFrame =
    out.groupBy("cluster").agg(count(lit(1)).as("seen"),
      coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L)).as("kept"))

  /** [[clusterPruneAgainstHistory]] against a persisted history path —
    * the path-taking probe enforces the
    * [[graft.state.HistoryFormat.ClusterQuota]] marker (the
    * HistoryEnforcementSuite rule). */
  def clusterPruneAgainstHistoryTable(batch: DataFrame, idCol: String,
      vecCol: String, quantizer: Array[Array[Float]], keepPermille: Int,
      historyPath: String): DataFrame =
    clusterPruneAgainstHistory(batch, idCol, vecCol, quantizer,
      keepPermille, graft.state.HistoryTables.readChecked(
        batch.sparkSession, historyPath,
        graft.state.HistoryFormat.ClusterQuota))
}

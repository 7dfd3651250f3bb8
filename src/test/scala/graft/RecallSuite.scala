package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gates for the approximate (LSH/bucketed) operators — the five
  * queries the DuckDB oracle cannot express. Each test computes the exact
  * brute-force truth set on the sf0.001 tables and asserts the bucketed
  * operator recovers at least the pinned fraction of it, so "approximate"
  * has a falsifiable correctness bar instead of a rows-only smoke check.
  *
  * Precision needs no gate: every candidate is verified with the exact
  * metric (true Jaccard / exact cosine / exact Hamming) before emission,
  * so false positives are impossible by construction.
  */
class RecallSuite extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sfDir/documents.parquet").exists()
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(found: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else truth.count(found).toDouble / truth.size

  /** Exact all-pairs text near-dup truth at `threshold` for a shingling. */
  private def bruteForceTextPairs(
      shingle: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      threshold: Double): Set[(Long, Long)] = {
    val base = docs.select(col("doc_id").as("id"), shingle(col("text")).as("sh"))
    val a = base.select(col("id").as("id_a"), col("sh").as("sa"))
    val b = base.select(col("id").as("id_b"), col("sh").as("sb"))
    pairSet(a.join(b, col("id_a") < col("id_b"))
      .filter(TextFunctions.jaccard(col("sa"), col("sb")) >= threshold))
  }

  test("minhash LSH recall >= 0.8 vs exact word-shingle Jaccard (query params)") {
    assume(available)
    val truth = bruteForceTextPairs(TextFunctions.wordShingles(_, 3), 0.2)
    val found = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.2))
    val r = recall(found, truth)
    info(s"minhash LSH: truth=${truth.size} found=${found.size} recall=$r")
    assert(truth.nonEmpty, "truth set empty — gate is vacuous")
    assert(r >= 0.8)
  }

  test("portable poly-minhash LSH recall >= 0.8 vs exact word-shingle " +
    "Jaccard (query params)") {
    assume(available)
    // the oracle-checkable hash family must ALSO clear the recall bar
    // the production xxhash family clears — hash-exactness certifies the
    // banding structure, this certifies its retrieval quality
    val truth = bruteForceTextPairs(TextFunctions.wordShingles(_, 3), 0.2)
    val found = pairSet(Dedup.minhashLshPairsPortable(docs, "doc_id",
      "text", threshold = 0.2))
    val r = recall(found, truth)
    info(s"poly LSH: truth=${truth.size} found=${found.size} recall=$r")
    assert(truth.nonEmpty, "truth set empty — gate is vacuous")
    assert(r >= 0.8)
  }

  test("char-ngram LSH recall >= 0.8 vs exact char-12-gram Jaccard (query params)") {
    assume(available)
    val truth = bruteForceTextPairs(TextFunctions.charNgrams(_, 12), 0.4)
    val found = pairSet(Dedup.charNgramJaccardPairs(docs, "doc_id", "text",
      n = 12, threshold = 0.4, k = 16, bands = 4))
    val r = recall(found, truth)
    info(s"char-ngram LSH: truth=${truth.size} found=${found.size} recall=$r")
    assert(truth.nonEmpty, "truth set empty — gate is vacuous")
    assert(r >= 0.8)
  }

  /** At Hamming ≤ 3 the 4-block bucketing is EXACT (pigeonhole: 3 differing
    * bits cannot touch all four disjoint 16-bit blocks), so the gate is
    * recall == 1.0, not a fraction. The corpus is the sf docs plus
    * constructed duplicates/near-duplicates so the truth set is never
    * vacuous. (At the lenient query budget of 16, a third of ALL sf0.001
    * pairs qualify — background vocabulary similarity, not near-dups — and
    * no bucketing scheme recovers that by design.) */
  test("simhash 4-block bucketing: recall == 1.0 at Hamming <= 3") {
    assume(available)
    import spark.implicits._
    val baseTokens = (0 until 200).map(i => s"tok$i")
    val planted = Seq(
      (100001L, baseTokens.mkString(" ")),
      (100002L, baseTokens.mkString(" ")), // exact dup: hamming 0
      (100003L, baseTokens.updated(0, "tokX").mkString(" ")),
      (100004L, baseTokens.updated(3, "tokY").mkString(" "))
    ).toDF("doc_id", "text")
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(planted)
    val hashes = corpus.select(col("doc_id"),
      graft.functions.SimHashFunctions.simhash(
        TextFunctions.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def truthAt(h: Int) = (for {
      (ia, ha) <- hashes.iterator
      (ib, hb) <- hashes.iterator
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= h
    } yield (ia, ib)).toSet
    val truth3 = truthAt(3)
    val found = pairSet(Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3))
    info(s"simhash: truth(h<=3)=${truth3.size} found=${found.size}")
    assert(truth3.nonEmpty, "truth set empty — gate is vacuous")
    assert(recall(found, truth3) == 1.0)
    assert(found === truth3) // verification makes precision exact too
  }

  /** Deterministic clustered corpus: `clusters` unit centers, `members`
    * near-identical members each (center + small noise). Within-cluster
    * cosine ~0.99; across clusters ~0 — the regime LSH recall is FOR.
    * (The sf0.001 embeddings are near-random — max pairwise cosine 0.48 —
    * so no truth pairs exist there at any near-dup threshold.) */
  private def clustered(clusters: Int, members: Int, dims: Int): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (0 until clusters).flatMap { c =>
      val center = Array.fill(dims)(rng.nextGaussian().toFloat)
      (0 until members).map { m =>
        val v = center.map(x => x + 0.05f * rng.nextGaussian().toFloat)
        ((c * members + m).toLong, v)
      }
    }.toDF("vec_id", "embedding")
  }

  test("embedding SRP-LSH pair recall >= 0.8 vs exact all-pairs cosine") {
    val corpus = clustered(clusters = 100, members = 5, dims = 64)
    val truth = pairSet(Dedup.embeddingCosinePairs(corpus, "vec_id", "embedding", 0.95))
    val found = pairSet(
      Dedup.embeddingCosinePairsLsh(corpus, "vec_id", "embedding", 0.95, planes = 8))
    val r = recall(found, truth)
    info(s"srp pairs: truth=${truth.size} found=${found.size} recall=$r")
    assert(truth.nonEmpty, "truth set empty — gate is vacuous")
    assert(r >= 0.8)
    assert(found.subsetOf(truth)) // exact-cosine verification: no false positives
  }

  test("SemDeDup pair recall >= 0.9 vs exact cosine; keep-one collapses clusters") {
    val corpus = clustered(clusters = 20, members = 5, dims = 64)
    val truth = pairSet(Dedup.embeddingCosinePairs(corpus, "vec_id", "embedding", 0.95))
    val found = pairSet(Dedup.semDedupPairs(corpus, "vec_id", "embedding",
      threshold = 0.95, nlist = 20, iterations = 3))
    val r = recall(found, truth)
    info(s"semdedup pairs: truth=${truth.size} found=${found.size} recall=$r")
    assert(truth.nonEmpty, "truth set empty — gate is vacuous")
    // precision is exact by construction (cosine verified); emitted pairs
    // must be a subset of the brute-force truth
    assert(found.subsetOf(truth), s"false positives: ${found.diff(truth).take(5)}")
    assert(r >= 0.9, s"semdedup recall $r below the trained-cluster bar")
    // keep-one: with a trained quantizer matching the planted clusters,
    // each 5-member cluster must collapse to its smallest id
    val kept = Dedup.semDedup(corpus, "vec_id", "embedding",
      threshold = 0.95, nlist = 20, iterations = 3, transitive = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.size < corpus.count(),
      "keep-one dedup removed nothing on a clustered corpus")
    // survivors are exactly the component roots: no kept id may be the
    // larger end of a found pair whose smaller end is also kept
    found.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)),
        s"pair ($a,$b) above threshold but both survived keep-one dedup")
    }
  }

  test("ANN LSH top-1 agrees with brute force for >= 0.8 of clustered queries") {
    val corpus = clustered(clusters = 100, members = 5, dims = 64)
    def top1(df: DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val queries = corpus.filter(col("vec_id") % 5 === 0)
    val truth = top1(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 1))
    val found = top1(Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 1, planes = 8))
    val agree = truth.count { case (q, n) => found.get(q).contains(n) }
    info(s"ann lsh: queries=${truth.size} agree=$agree")
    assert(truth.nonEmpty)
    assert(agree.toDouble / truth.size >= 0.8)
    // multi-table: unioning independent plane families can only add
    // candidates — recall must not drop below the single table's, and the
    // fetch-join path must return the same row shape
    val multi = top1(Similarity.lshTopK(queries, corpus, "vec_id", "embedding",
      k = 1, planes = 8, tables = 4))
    val agreeMulti = truth.count { case (q, n) => multi.get(q).contains(n) }
    info(s"ann lsh 4 tables: agree=$agreeMulti")
    assert(agreeMulti >= agree,
      s"multi-table recall regressed: $agreeMulti < $agree")
  }

  test("IVF top-1 agrees with brute force for >= 0.8 of clustered queries") {
    val corpus = clustered(clusters = 20, members = 5, dims = 64)
    def top1(df: DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val queries = corpus.filter(col("vec_id") % 5 === 0)
    val truth = top1(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 1))
    val found = top1(Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 1, nlist = 16, nprobe = 4))
    val agree = truth.count { case (q, n) => found.get(q).contains(n) }
    info(s"ivf: queries=${truth.size} agree=$agree")
    assert(agree.toDouble / truth.size >= 0.8)
  }

  test("trained IVF quantizer holds the recall bar with HALF the probes") {
    val corpus = clustered(clusters = 20, members = 5, dims = 64)
    def top1(df: DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val queries = corpus.filter(col("vec_id") % 5 === 0)
    val truth = top1(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 1))
    val trained = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding",
      nlist = 16, iterations = 3)
    // k-means shapes buckets to the real clusters, so nprobe=2 suffices
    // where the sampled quantizer needs 4
    val found = top1(Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 1, nlist = 16, nprobe = 2, quantizer = Some(trained)))
    val agree = truth.count { case (q, n) => found.get(q).contains(n) }
    info(s"ivf trained: queries=${truth.size} agree=$agree")
    assert(agree.toDouble / truth.size >= 0.8)
  }
}

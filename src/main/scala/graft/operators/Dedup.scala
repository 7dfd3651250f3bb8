package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication strategies for training-data pipelines, exact → fuzzy.
  *
  * Scale notes (the point of each design):
  *  - exact/fingerprint dedup is one hash-shuffle on the dedup key — the
  *    minimum possible; no window over the whole table, only per-key.
  *  - MinHash-LSH banding turns O(N²) near-dup search into
  *    explode(bands) + one shuffle on the band key + per-bucket joins;
  *    bucket sizes are bounded in practice, and verification (true Jaccard)
  *    runs only on candidate pairs.
  *  - SimHash groups by a 16-bit prefix bucket, comparing Hamming distance
  *    only within buckets (classic Manku et al. WWW'07 layout).
  */
object Dedup {

  /** Exact dedup: keep one row per key set, smallest `tieBreak` wins.
    * One shuffle; the ranking window and the groupBy share partitioning. */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Fingerprint dedup: exact dedup on md5(textCol) — cheaper shuffle key
    * (16 bytes) than the full text at 100 TB. */
  def byFingerprint(df: DataFrame, textCol: String, tieBreak: String): DataFrame =
    exact(df.withColumn("__fp", fingerprint(col(textCol))), Seq("__fp"), tieBreak)
      .drop("__fp")

  /** MinHash + LSH candidate pairs over a text column.
    *
    * shingle → k-minhash signature → `bands` band keys → explode + shuffle
    * on (band, key) → pairs within buckets → verified n-gram Jaccard ≥
    * threshold. Returns (idA, idB, jaccard) with idA < idB, distinct.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    lshPairsBy(df, idCol, textCol, wordShingles(_, shingleWords), k, bands, threshold,
      sigFn = Some(
        graft.functions.FusedMinHashFunctions.minhashWordShingles(_, shingleWords, k)))

  /** LSH near-dup pair search generalized over the shingling function
    * (word n-grams, character n-grams, …). `sigFn`, when given, computes the
    * k-entry MinHash signature straight from the text (the fused
    * [[graft.functions.MinHashShingles]] path — no shingle array in the
    * corpus-wide pass); the default composes `minhashSignature ∘ shingleFn`.
    * `shingleFn` is always what verification uses for exact Jaccard. */
  def lshPairsBy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleFn: Column => Column,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      sigFn: Option[Column => Column] = None): DataFrame = {
    val rows = k / bands
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val signature = sigFn.getOrElse((t: Column) => minhashSignature(shingleFn(t), k))
    // persist: the self-join below references this subtree from both sides,
    // and without a cache Spark computes the (expensive) signature pass
    // twice; (id, band, key) is tiny — 3 scalars per band per doc
    val bandRows = base
      .select(col("id"), posexplode(lshBandKeys(signature(col("text")), bands, rows))
        .as(Seq("band", "key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate id pairs first — only (band, key, id) shuffles, never the
    // shingle arrays
    val a = bandRows.select(col("band"), col("key"), col("id").as("id_a"))
    val b = bandRows.select(col("band"), col("key"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact-Jaccard verification re-derives shingles ONLY for candidate
    // rows (texts join in; the corpus-wide shingle+signature pass above
    // runs exactly once)
    candidates
      .join(base.select(col("id").as("id_a"), col("text").as("t_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("text").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(shingleFn(col("t_a")), shingleFn(col("t_b"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Rows that survive MinHash-LSH dedup: drop every row whose id appears
    * as the larger member of a near-dup pair (smallest id wins). */
  def minhashLshDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4): DataFrame = {
    val losers = minhashLshPairs(df, idCol, textCol, k = k, bands = bands,
      threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash of every row via the codegen'd [[graft.functions.SimHash64Expr]]
    * — one pass per document, no exchange. (Earlier formulations — an
    * interpreted HOF fold, then explode + 64 columnar vote sums — were
    * respectively ~10x slower per row and a full shuffle of the tokenized
    * corpus; the custom expression beats both and is the only shape that
    * holds at 100 TB.) */
  private def simhashByRow(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.SimHashFunctions.simhash(tokens(col(textCol))).as("sh"))

  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // persist for the same self-join double-computation reason as minhash
    val hashed = simhashByRow(df, idCol, textCol)
      .withColumn("bucket", shiftrightunsigned(col("sh"), 48))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = hashed.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = hashed.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** N-gram Jaccard near-dup pairs, LSH-bucketed by minhash so the
    * all-pairs comparison never materializes. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.4): DataFrame =
    minhashLshPairs(df, idCol, textCol, shingleWords = n, threshold = threshold)

  /** Embedding-cosine near-duplicate pairs — exact all-pairs baseline.
    * O(N²/2) comparisons of codegen'd double-precision cosines: the
    * correctness reference (ANSI-SQL-expressible, oracle-gated) for the
    * bucketed variant below. Returns (id_a, id_b, cosine≥threshold),
    * id_a < id_b, cosine rounded to 4. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SRP-bucketed embedding near-dup pairs — the 100 TB path: candidates
    * only meet inside an LSH bucket (one shuffle on the bucket key, never
    * all-pairs), then exact cosine verification. Misses possible by design;
    * `planes` trades recall for bucket size. */
  def embeddingCosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8, dims: Int = 0): DataFrame = {
    val d = if (dims > 0) dims else df.select(size(col(vecCol))).head().getInt(0)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.srpBucket(col("v"), planes, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** Character n-gram Jaccard near-dup pairs (robust to word-boundary
    * noise), LSH-bucketed like the word-shingle variant. */
  def charNgramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.4,
      k: Int = 16, bands: Int = 8): DataFrame =
    lshPairsBy(df, idCol, textCol, charNgrams(_, n), k, bands, threshold,
      sigFn = Some(graft.functions.FusedMinHashFunctions.minhashCharNgrams(_, n, k)))
}

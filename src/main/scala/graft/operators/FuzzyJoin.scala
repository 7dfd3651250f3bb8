package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (fuzzy entity matching): all pairs
  * of strings within Levenshtein distance `maxDist` - the curation
  * operator behind near-duplicate titles, author variants, and
  * OCR/typo-corrupted keys, where token- and shingle-set similarity
  * (the Jaccard families) miss single-character damage.
  *
  * EXACT result via Ed-Join-style prefix filtering (Xiao, Wang, Lin
  * VLDB'08). 100 TB shape:
  *  1. one corpus scan explodes distinct q-grams (length-q+1 per key);
  *  2. gram document frequency: partial-aggregated groupBy (hot grams
  *     combine map-side), joined back - AQE-skew-splittable;
  *  3. per-key prefix = rank by (df, gram) <= q*k+1, a window
  *     partitioned by KEY ID (bounded by key length, never by corpus -
  *     map-side trimmed via WindowGroupLimit); rarest-first ordering
  *     makes prefix grams the most selective ones, so candidate
  *     buckets are small BY CONSTRUCTION, not by a recall-losing cap;
  *  4. candidates: equi-join of prefix grams with id_a < id_b and the
  *     length filter |len_a - len_b| <= k (a join, so AQE splits any
  *     residual hot gram), deduped per pair;
  *  5. verify: keep `levenshtein <= k` - Spark's native codegen'd
  *     thresholded expression - directly on the pair, the KEY strings
  *     having ridden the prefix rows through the join (keys are short
  *     by contract; two join-backs would shuffle the key table twice
  *     more to avoid carrying a few hundred bytes).
  * Only (id, key, gram) prefix rows and deduped candidate pairs ever
  * shuffle - never documents: fuzzy joins run on KEYS.
  *
  * Reference scope: the reference's dedup strategies are key-equality
  * (`ex/advanced-patterns/deduplication_strategies.py`); this extends
  * the family to bounded-error string keys with the same exact-result
  * discipline as [[Dedup.charNgramJaccardExactPairs]]. */
object FuzzyJoin {

  /** `(id_a, id_b, ed)` for every unordered pair with
    * `levenshtein(s_a, s_b) <= maxDist`, id_a < id_b.
    *
    * Exactness argument, including the short-key corner the textbook
    * statement glosses over: one edit destroys at most q DISTINCT gram
    * values, so |A diff B| <= q*k and |A intersect B| >=
    * max(|A|,|B|) - q*k = t. When t >= 1 (the longer side has at least
    * q*k+1 grams) the standard prefix-filter theorem applies: the
    * (q*k+1)-prefixes under any shared total order must intersect -
    * and a side with fewer than q*k+1 grams keeps ALL its grams, so
    * its "prefix" is its whole set. When BOTH sides have fewer than
    * q*k+1 grams (length < q*(k+1)) the bound is vacuous - "abc" vs
    * "xyz" at k=3 shares nothing - so every such short key ALSO
    * carries a sentinel gram of length q+1 (a real gram is exactly q
    * chars, so collision is impossible): short keys pair
    * all-against-all through the sentinel bucket, bounded by the
    * count of sub-q*(k+1)-length keys in the corpus, and
    * short-vs-long pairs are covered by the t >= 1 case. */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val base = keyed(df, idCol, strCol)
    // ONE gram-keyed exchange feeds BOTH the df aggregation and the
    // ranking join (ReusedExchange): without the explicit repartition the
    // gram explosion materializes twice — once under the groupBy's
    // exchange, once under the join's (the d_ngram_jaccard lesson).
    val grams = realGrams(base, q).repartition(col("g"))
    // batch-local gram document frequency is the rank order
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    val ranked = rankedPrefix(base, maxDist, q, dfreq, Some(grams))
    // candidate pairs: shared prefix gram + length filter. The key
    // strings RIDE THROUGH the self-join (they already ride the prefix
    // rows — rankedPrefix emits them), so verification needs no
    // join-back: two fewer shuffles of the corpus keys. Right because
    // this operator's inputs are KEYS (titles, author strings, 32-char
    // prefixes, <=, say, a few hundred bytes) — for document-length
    // strings a fetch-by-id verify would win; that variant is the
    // history-probe shape in [[fuzzyAgainstHistory]].
    val a = ranked.select(col("sid").as("id_a"), col("len").as("len_a"),
      col("s").as("s_a"), col("g"))
    val b = ranked.select(col("sid").as("id_b"), col("len").as("len_b"),
      col("s").as("s_b"), col("g"))
    val cands = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b").distinct()
    // the thresholded levenshtein runs the banded O(k*n) DP and returns
    // -1 past the bound - the verify is the candidate-volume hot path,
    // so the 6x narrower band matters
    cands
      .withColumn("ed", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("ed") >= 0 && col("ed") <= maxDist)
      .select(col("id_a"), col("id_b"), col("ed").cast("int").as("ed"))
  }

  private def keyed(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("sid"),
      col(strCol).cast("string").as("s"))
      .withColumn("len", length(col("s")))

  /** Distinct positional q-grams per key (gram IDENTITY is what the
    * filter reasons about; multiplicity adds nothing).
    *
    * In-place gram hashing (the CharNgramHashesExpr family) REJECTED
    * here: fuzzy joins run on KEYS (<= a few hundred bytes by contract,
    * q=2 grams), so the gram stage is join- not scan-dominated, and the
    * gram-order model persists gram STRINGS — hashing the corpus side
    * would either break the model join or force the model to 8-byte
    * keys, where a collision merges two grams' dfs and can demote a
    * rare gram out of prefixes (a RECALL loss, not just a miscount,
    * since prefix selection drives candidate generation). */
  private def realGrams(base: DataFrame, q: Int): DataFrame =
    base.filter(col("len") >= q)
      .select(col("sid"), col("len"), col("s"),
        // codegen'd distinct char q-grams — same windows, same
        // first-occurrence dedup as the old array_distinct(transform(
        // sequence, i -> substr)) HOF (which ran interpreted per key);
        // the len >= q filter above keeps CharNgramsExpr's short-text
        // whole-string collapse unreachable, so the gram sets are
        // identical (suite-pinned equivalence in CharNgramsExpr's law)
        explode(graft.functions.CharNgramFunctions
          .charNgramsDistinct(col("s"), q)).as("g"))

  /** Per-key prefix grams `(sid, len, s, g)` under the (df, gram) total
    * order given by `order` (g, gdf); grams absent from `order` rank as
    * df 0 (rarest). Short keys append the sentinel row unranked. */
  private def rankedPrefix(base: DataFrame, maxDist: Int, q: Int,
      order: DataFrame, grams: Option[DataFrame] = None): DataFrame = {
    val prefixLen = q * maxDist + 1
    val sentinel = "#" * (q + 1)
    grams.getOrElse(realGrams(base, q))
      .join(order, Seq("g"), "left")
      .na.fill(0L, Seq("gdf"))
      .withColumn("r", row_number().over(
        Window.partitionBy("sid").orderBy(col("gdf"), col("g"))))
      .filter(col("r") <= prefixLen)
      .select("sid", "len", "s", "g")
      .unionByName(base.filter(col("len") < q * (maxDist + 1))
        .select(col("sid"), col("len"), col("s"), lit(sentinel).as("g")))
  }

  /** FIXED gram-order model for cross-batch fuzzy matching: gram
    * document frequencies over a reference slice, persisted once (the
    * persisted-quantizer discipline — SemDeDup's quantizer, IVF-PQ's
    * codebooks). The prefix-filter theorem needs BOTH sides of a
    * candidate join to rank grams under the SAME total order; ranking
    * each batch by its own local df would silently break exactness
    * across batches. Unseen grams rank as df 0 — rarest, which only
    * ever ENLARGES a prefix's selectivity, never drops a pair.
    * O(gram alphabet observed in the reference) rows. */
  def gramOrderModel(ref: DataFrame, strCol: String, q: Int = 2): DataFrame =
    realGrams(keyed(ref.withColumn("__id", monotonically_increasing_id()),
      "__id", strCol), q)
      .groupBy("g").agg(count(lit(1)).as("gdf"))

  /** Gram-order-model drift for a new batch — the staleness signal of
    * the fixed-order discipline, completing the trio with
    * [[graft.operators.Similarity.quantizerDrift]] and
    * [[graft.operators.Curation.vocabDrift]]. A stale order model stays
    * CORRECT (unseen grams rank df-0/rarest, which only enlarges
    * prefixes — the exactness note on [[gramOrderModel]]) but degrades
    * PERFORMANCE: df-0 grams flood into every prefix, prefixes stop
    * being selective, and candidate volume inflates. The measurable
    * symptom is the share of the batch's distinct-per-key grams the
    * model has never seen. One row: `n_keys`, `n_grams`, `n_unseen`,
    * `unseen_frac`, and `rebuild` past `maxUnseenFrac`. One gram
    * explosion + a model join (model is O(gram alphabet), broadcast by
    * size) + one global aggregate. */
  def gramOrderDrift(batch: DataFrame, idCol: String, strCol: String,
      order: DataFrame, q: Int = 2,
      maxUnseenFrac: Double = 0.2): DataFrame =
    realGrams(keyed(batch, idCol, strCol), q)
      .join(order.select(col("g")).distinct().withColumn("__hit", lit(1)),
        Seq("g"), "left")
      .agg(countDistinct(col("sid")).as("n_keys"),
        count(lit(1)).as("n_grams"),
        (count(lit(1)) - count(col("__hit"))).as("n_unseen"),
        round((count(lit(1)) - count(col("__hit"))).cast("double") /
          greatest(count(lit(1)), lit(1L)), 4).as("unseen_frac"))
      .withColumn("rebuild", col("unseen_frac") > maxUnseenFrac)

  /** This batch's searchable fuzzy-match state: prefix-gram rows
    * `(sid, len, s, g)` under the FIXED `order` model. Append each
    * batch's rows to a history table; q*k+1 short rows per key — the
    * key string rides along so history probes never re-fetch raw
    * documents. */
  def prefixIndex(batch: DataFrame, idCol: String, strCol: String,
      maxDist: Int, order: DataFrame, q: Int = 2): DataFrame =
    rankedPrefix(keyed(batch, idCol, strCol), maxDist, q, order)

  /** Cross-batch fuzzy matches: `(id_new, id_old, ed)` for every pair of
    * a batch key within `maxDist` of a HISTORY key (history = appended
    * [[prefixIndex]] rows under the same `order` model). Shape: the
    * batch's prefix rows equi-join the history index on gram — the
    * history never re-shuffles per batch beyond this AQE-splittable
    * join — then candidate-bounded levenshtein verify with both strings
    * already on the row. */
  def editDistanceAgainstHistory(batch: DataFrame, history: DataFrame,
      idCol: String, strCol: String, maxDist: Int, order: DataFrame,
      q: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val bp = prefixIndex(batch, idCol, strCol, maxDist, order, q)
      .select(col("sid").as("id_new"), col("len").as("len_n"),
        col("s").as("s_n"), col("g"))
    val hp = history.select(col("sid").as("id_old"), col("len").as("len_o"),
      col("s").as("s_o"), col("g"))
    bp.join(hp, Seq("g"))
      .filter(abs(col("len_n") - col("len_o")) <= maxDist)
      .select("id_new", "id_old", "s_n", "s_o").distinct()
      .withColumn("ed", levenshtein(col("s_n"), col("s_o"), maxDist))
      .filter(col("ed") >= 0 && col("ed") <= maxDist)
      .select(col("id_new"), col("id_old"), col("ed").cast("int").as("ed"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Term-relevance scoring over a document corpus: TF-IDF top terms and
  * BM25 retrieval — the classic lexical-relevance primitives a
  * training-data pipeline uses for quality-classifier features, eval-set
  * retrieval, and topic filtering (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond").
  *
  * Scale shapes (the 100 TB story):
  *  - [[tfIdfTopTerms]] is the classic MapReduce word-count shape: the
  *    token stream shuffles ONCE by term, and that single exchange
  *    satisfies the tf aggregation (term ⊆ {doc,term}), the df
  *    aggregation, and both sides of the tf⋈df join (the vocabulary of a
  *    100 TB corpus is itself huge, so df is NOT broadcast); a doc-keyed
  *    window takes top-k. Two exchanges total, one corpus scan, nothing
  *    quadratic, no full-vocabulary driver state.
  *  - [[bm25]] broadcasts the QUERY-term set into a map-side `isin`
  *    filter, so the corpus' token stream is pruned to query-term hits
  *    before anything shuffles — per-doc length comes from `size(split)`
  *    without ever exploding tokens. At 100 TB the only shuffled rows are
  *    (doc, query-term) hits: O(matching docs × |query|).
  *
  * Determinism (these queries are hash-compared against a DuckDB oracle):
  * top-k ranks by `rel = (tf·N)/df` — one exact integer product under
  * 2^53 and one correctly-rounded IEEE division, so equal rationals
  * produce bit-identical doubles in ANY correctly-rounding engine and
  * cross-engine ordering can never flip (ties break on the term). The
  * log-idf scores are emitted as values (rounded to 4) but never used as
  * sort keys: `ln` is implementation-defined in its last ulp, which is
  * invisible after rounding but could flip an ordering comparison.
  */
object Relevance {

  /** Top-`k` terms per document: (id, rnk, term, tf, df, tfidf) where
    * `tfidf = round(tf · ln(N/df), 4)`, ranked by the exact-rational
    * relevance `(tf·N)/df` (same ranking as linear-idf TF-IDF; see
    * determinism note above), ties broken by term ascending. */
  def tfIdfTopTerms(ds: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    // ONE term-keyed exchange below every aggregate — the classic MR
    // word-count shape. Term-partitioning satisfies the ClusteredDistri-
    // bution of the tf agg (term ⊆ {id,term}), the df agg, AND both sides
    // of the tf⋈df join, so the whole operator costs exactly two
    // exchanges (this one + the top-k window) and the corpus scan+explode
    // materializes ONCE as a ReusedExchange. The alternative — groupBy
    // first for map-side combine — plans the explode subtree into BOTH
    // the tf and df branches (the optimizer rewrites the df copy to a
    // keys-only aggregate, killing exchange reuse), i.e. trades a whole
    // second corpus scan for a ~1.3× smaller shuffle: strictly worse.
    val toks = ds.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
      .repartition(col("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = ds.select(count(lit(1)).as("n"))
    val w = Window.partitionBy("id").orderBy(col("rel").desc, col("term").asc)
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("rel", (col("tf") * col("n")).cast("double") / col("df"))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk").cast("long").as("rnk"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 score of every document that matches at least one query term:
    * (id, bm25). Uses the Lucene-style non-negative idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` and the standard saturation
    * `tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`; per-term partials are
    * summed in exact decimal so float addition order can never change the
    * result, then rounded to 4. */
  def bm25(ds: DataFrame, idCol: String, textCol: String, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25: empty query")
    val base = ds.select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // map-side prune to query-term hits BEFORE any shuffle, then ONE
    // term-keyed exchange below every aggregate (see tfIdfTopTerms note):
    // tf, df, and the join all run on the same term-partitioned stream,
    // and the corpus scan+explode+filter materializes once
    val hits = base.select(col("id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(query: _*))
      .repartition(col("term"))
    // dl rides as a GROUPING key (functionally dependent on id, so the
    // groups are unchanged) rather than a first() aggregate: grouping keys
    // survive column pruning, so the df branch's copy of this subtree
    // stays canonically identical to the tf side and the exchange reuses
    val tf = hits.groupBy("id", "term", "dl").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // expression trees mirror the ANSI oracle token-for-token: every op is
    // correctly-rounded IEEE except ln, whose ulp noise dies in round(.,4)
    val idf = log(lit(1d) + ((col("n") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val sat = (col("tf") * (lit(k1) + lit(1d))) /
      (col("tf") + lit(k1) * (lit(1d) - lit(b) + lit(b) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("p", idf * sat)
      .groupBy("id")
      .agg(round(sum(col("p").cast(DecimalType(30, 9))).cast("double"), 4).as("bm25"))
  }
}

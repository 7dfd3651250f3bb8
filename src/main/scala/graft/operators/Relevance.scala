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
  * Scale shapes (the 100 TB story). The governing constraint is Zipf
  * skew: ANY stage that shuffles raw per-occurrence rows keyed by the
  * term alone pins every occurrence of "the" (~5% of all tokens) into
  * ONE task, and AQE cannot split a skewed partition feeding an
  * aggregate — only joins. So every exchange here is one of the three
  * skew-tolerant kinds:
  *  - [[tfIdfTopTerms]]: tf combines map-side behind a FINE-GRAINED
  *    (doc, term) exchange (hot terms spread across docs); df
  *    partial-aggregates per map partition before its term-keyed
  *    exchange (a hot term ships one partial count per map partition,
  *    never its occurrences); the tf⋈df join's term-keyed side is a
  *    JOIN input, which AQE skew-splits (the vocabulary of a 100 TB
  *    corpus is itself huge, so df is NOT broadcast); top-k windows per
  *    doc. The corpus scan+explode materializes ONCE — the df branch
  *    reuses tf's exchange.
  *  - [[bm25]] broadcasts the QUERY-term set into a map-side `isin`
  *    filter, so the corpus' token stream is pruned to query-term hits
  *    before anything shuffles — per-doc length comes from `size(split)`
  *    without ever exploding tokens; per-term df (O(|query|) rows)
  *    broadcasts into the join. At 100 TB the only shuffled rows are
  *    (doc, query-term, count) partials.
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
    // NOT repartition(term) before the aggregates: that would shuffle
    // every raw token occurrence keyed by term alone — a Zipf-head term
    // lands whole in one task and no optimizer can split an
    // aggregate-feeding partition. Combine-first is the skew-safe shape.
    val toks = ds.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df = row count per term, spelled sum(I(tf > 0)) — semantically
    // count(1) (tf >= 1 always), but the reference to tf's count keeps
    // the optimizer from rewriting this branch's copy of the tf subtree
    // into a keys-only aggregate (RemoveRedundantAggregates), which
    // would de-canonicalize the two copies and plan the corpus
    // scan+explode TWICE instead of reusing tf's exchange. The plan
    // test pins the reuse via the distinct-exchange budget.
    val dfreq = tf.groupBy("term")
      .agg(sum(when(col("tf") > 0L, 1L).otherwise(0L)).as("df"))
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
    // map-side prune to query-term hits BEFORE any shuffle; tf then
    // combines map-side behind a fine-grained (id, term, dl) exchange —
    // never a raw-occurrence shuffle keyed by term alone (Zipf-skew
    // fatal at scale; see tfIdfTopTerms). dl rides as a GROUPING key
    // (functionally dependent on id, so the groups are unchanged) rather
    // than a first() aggregate: grouping keys survive column pruning, so
    // the df branch's copy of this subtree stays canonically identical
    // to the tf side and tf's exchange reuses instead of re-scanning.
    val hits = base.select(col("id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(query: _*))
    val tf = hits.groupBy("id", "term", "dl").agg(count(lit(1)).as("tf"))
    // sum(I(tf > 0)) = count(1), spelled to reference tf's count so the
    // shared subtree stays canonical (see tfIdfTopTerms)
    val dfreq = tf.groupBy("term")
      .agg(sum(when(col("tf") > 0L, 1L).otherwise(0L)).as("df"))
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

  /** Multi-query BM25 in ONE corpus scan: `(query_id, id, bm25)` for
    * every (query, matching document) pair. The union of all queries'
    * terms prunes the token stream map-side exactly as [[bm25]] does;
    * per-(doc, term) tf and per-term df are computed ONCE, then the
    * tiny (query_id, term) table broadcasts into the scored partials —
    * N queries cost one scan plus an O(Σ|query|) broadcast, not N
    * scans. Per-(query, doc) partials decimal-sum (order-independent),
    * so the result is bit-identical to calling [[bm25]] per query
    * (suite-pinned parity). */
  def bm25Multi(ds: DataFrame, idCol: String, textCol: String,
      queries: Map[Int, Seq[String]],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25Multi: no queries")
    require(queries.values.forall(_.nonEmpty), "bm25Multi: empty query")
    val spark = ds.sparkSession
    import spark.implicits._
    val allTerms = queries.values.flatten.toSeq.distinct
    val qtab = queries.toSeq
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val base = ds.select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val hits = base.select(col("id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(allTerms: _*))
    val tf = hits.groupBy("id", "term", "dl").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term")
      .agg(sum(when(col("tf") > 0L, 1L).otherwise(0L)).as("df"))
    val idf = log(lit(1d) + ((col("n") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val sat = (col("tf") * (lit(k1) + lit(1d))) /
      (col("tf") + lit(k1) * (lit(1d) - lit(b) + lit(b) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("p", idf * sat)
      .join(broadcast(qtab), "term")
      .groupBy("query_id", "id")
      .agg(round(sum(col("p").cast(DecimalType(30, 9))).cast("double"), 4).as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Buettcher SIGIR'09) of two
    * retrieval lists: `(query_id, rrf_rank, id, rrf_score)` where
    * `rrf_score = 1/(rrfK + rank_a) + 1/(rrfK + rank_b)` over each
    * side's top-`innerTop` by (score desc, id) — the standard hybrid
    * lexical+semantic retrieval combiner, rank-based so the two score
    * scales never need calibration.
    *
    * Inputs must both be shaped `(query_id, id, score)`. Determinism:
    * ranks come from per-query windows with id tie-breaks (map-side
    * trimmed — WindowGroupLimit); the fused score is a FIXED-ORDER sum
    * of two correctly-rounded divisions of identical operands, so both
    * engines produce the identical double; final ranking ties break on
    * id. Scale: per-query candidate lists are rank-cut to `innerTop`
    * BEFORE the fuse join, so the full-outer join touches
    * O(#queries · innerTop) rows no matter the corpus size. */
  def rrfFuse(a: DataFrame, b: DataFrame, rrfK: Int = 60,
      innerTop: Int = 100, k: Int = 10): DataFrame = {
    require(rrfK >= 1 && innerTop >= 1 && k >= 1,
      s"rrfFuse: bad params rrfK=$rrfK innerTop=$innerTop k=$k")
    def ranked(df: DataFrame, rc: String): DataFrame = df
      .select(col("query_id").cast("long").as("query_id"),
        col("id").cast("long").as("id"), col("score"))
      .withColumn(rc, row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("id"))))
      .filter(col(rc) <= innerTop)
      .select("query_id", "id", rc)
    val fused = ranked(a, "r_a").join(ranked(b, "r_b"),
        Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1d) / (lit(rrfK) + col("r_a")), lit(0d)) +
        coalesce(lit(1d) / (lit(rrfK) + col("r_b")), lit(0d)))
    fused
      .withColumn("rrf_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("id"))))
      .filter(col("rrf_rank") <= k)
      .select(col("query_id"), col("rrf_rank"), col("id"),
        round(col("rrf"), 6).as("rrf_score"))
  }

  /** Frozen BM25 collection statistics — the incremental-retrieval
    * state: production retrieval scores arriving batches under
    * COLLECTION statistics refreshed periodically, not per batch (a
    * per-batch idf would re-rank the whole index on every arrival).
    * One table, `(kind, term, v)`: a `df` row per distinct term
    * (document frequency over the reference corpus, single-space token
    * convention) plus the two scalar rows `n` (document count) and
    * `sumdl` (total token count — avgdl stays an exact ratio until the
    * one double division at score time). Persist with
    * [[saveBm25Stats]] under the [[graft.state.HistoryFormat.Bm25Stats]]
    * marker; at 100 TB the table is vocabulary-sized and stays
    * DISTRIBUTED — consumers prune it to their query terms before any
    * broadcast. */
  def bm25CollectionStats(ref: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = ref.select(col(idCol).as("id"),
        split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val dfRows = base
      .select(col("id"), explode(col("ws")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct() // per-doc term presence…
      .groupBy("term").agg(count(lit(1)).as("v")) // …so this IS df
      .select(lit("df").as("kind"), col("term"), col("v"))
    val scalarRows = base
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L))
        .as("sumdl"))
      .select(explode(array(
        struct(lit("n").as("kind"), lit(null).cast("string").as("term"),
          col("n").as("v")),
        struct(lit("sumdl").as("kind"), lit(null).cast("string").as("term"),
          col("sumdl").as("v")))).as("r"))
      .select(col("r.kind"), col("r.term"), col("r.v"))
    dfRows.unionByName(scalarRows)
  }

  /** The `(n, avgdl)` one-row frame of a stats table, for the score-time
    * cross join (broadcast at 1 row — the tolerated scalar attach).
    * Guarded: a malformed stats table (marker valid but the `n` scalar
    * row absent or non-positive — e.g. a df-only slice) would otherwise
    * propagate a NULL `n` into NULL scores for EVERY row; refuse loudly
    * instead. The guard is a FILTER predicate on the one agg row (the
    * guard-carrier rule — a projected guard would be pruned), and the
    * agg always yields exactly one row, so it evaluates whenever the
    * broadcast side builds. */
  private def statsScalars(stats: DataFrame): DataFrame = stats
    .filter(col("kind").isin("n", "sumdl"))
    .agg(max(when(col("kind") === "n", col("v"))).as("n"),
      max(when(col("kind") === "sumdl", col("v"))).as("sumdl"))
    // BOTH scalars are load-bearing: a missing 'n' NULL-scores via idf,
    // a missing (or zero — an all-empty-docs snapshot) 'sumdl' does the
    // same thing one column over via avgdl, so guarding only 'n' would
    // close half the silent-NULL door it exists to close
    .filter(when(col("n").isNull || col("n") <= 0L ||
        col("sumdl").isNull || col("sumdl") <= 0L,
      raise_error(lit("bm25/tfidf stats: the snapshot is missing a " +
        "positive 'n' or 'sumdl' scalar row — a df-only or malformed " +
        "stats table cannot score; rebuild it with " +
        "bm25CollectionStats")).cast("boolean"))
      .otherwise(lit(true)))
    .select(col("n"), (col("sumdl").cast("double") / col("n")).as("avgdl"))

  /** BM25 over a batch under FROZEN collection statistics: idf and avgdl
    * come from `stats` (a [[bm25CollectionStats]] table), tf and dl from
    * the batch — so scores are comparable across batches indexed under
    * the same snapshot, the property an accumulated index needs. Terms
    * the snapshot never saw take df = 0 (maximal idf — a new term is
    * maximally selective by definition). Same determinism recipe as
    * [[bm25]]: decimal partial sums, one terminal round.
    *
    * Scale shape: the stats table prunes to the QUERY terms before a
    * broadcast hash join (O(|query|) rows — the full vocabulary never
    * broadcasts); the batch prunes map-side to query-term hits before
    * its one fine-grained (id, term, dl) exchange. */
  def bm25UnderStats(batch: DataFrame, idCol: String, textCol: String,
      stats: DataFrame, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25UnderStats: empty query")
    val dfq = stats
      .filter(col("kind") === "df" && col("term").isin(query: _*))
      .select(col("term"), col("v").as("df"))
    val base = batch.select(col(idCol).as("id"),
        split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val hits = base.select(col("id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isin(query: _*))
    val tf = hits.groupBy("id", "term", "dl").agg(count(lit(1)).as("tf"))
    val joined = tf.join(broadcast(dfq), Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .crossJoin(broadcast(statsScalars(stats)))
    val idf = log(lit(1d) + ((col("n") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)))
    val sat = (col("tf") * (lit(k1) + lit(1d))) /
      (col("tf") + lit(k1) * (lit(1d) - lit(b) + lit(b) * (col("dl") / col("avgdl"))))
    joined
      .withColumn("p", idf * sat)
      .groupBy("id")
      .agg(round(sum(col("p").cast(DecimalType(30, 9))).cast("double"), 4)
        .as("bm25"))
  }

  /** Staleness report for a frozen stats snapshot against a new batch —
    * the drift signal of the incremental-retrieval family (the
    * vocabDrift discipline for collection statistics): `new_term_rate`
    * (share of batch token OCCURRENCES whose term has no df row — those
    * score under the df=0 fallback) and `avgdl_ratio` (batch mean doc
    * length over the snapshot's — BM25's length normalization mis-
    * centers when it moves). One row; `rebuild` trips past either
    * threshold; the empty batch reads zeros/1.0 and rebuild=false (zero
    * rows is not drift evidence).
    *
    * Scale shape: batch occurrences partial-aggregate per term map-side
    * (Zipf-hot terms combine before the exchange), then LEFT-join the
    * DISTINCT term counts against the distributed df table on the term
    * key — the vocabulary never broadcasts and the batch text never
    * shuffles. */
  def bm25StatsDrift(batch: DataFrame, idCol: String, textCol: String,
      stats: DataFrame, maxNewTermRate: Double,
      maxAvgdlShift: Double): DataFrame = {
    val base = batch.select(split(col(textCol), " ").as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    val docAgg = base.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("sumdl_b"))
    val tcount = base.select(explode(col("ws")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("c"))
    val termAgg = tcount
      .join(stats.filter(col("kind") === "df")
        .select(col("term"), lit(1).as("seen")), Seq("term"), "left")
      .agg(coalesce(sum(col("c")), lit(0L)).as("occ"),
        coalesce(sum(when(col("seen").isNull, col("c")).otherwise(0L)),
          lit(0L)).as("occ_new"))
    val avgdlB = col("sumdl_b").cast("double") /
      greatest(col("n_docs"), lit(1L))
    val avgdl0 = col("sumdl").cast("double") / greatest(col("n"), lit(1L))
    val refScalars = stats.filter(col("kind").isin("n", "sumdl"))
      .agg(max(when(col("kind") === "n", col("v"))).as("n"),
        max(when(col("kind") === "sumdl", col("v"))).as("sumdl"))
    docAgg.crossJoin(termAgg).crossJoin(refScalars)
      .select(col("n_docs"),
        round(col("occ_new").cast("double") /
          greatest(col("occ"), lit(1L)), 4).as("new_term_rate"),
        round(avgdlB, 4).as("avgdl_batch"),
        round(avgdl0, 4).as("avgdl_ref"),
        when(col("n_docs") > 0L, round(avgdlB / avgdl0, 4))
          .otherwise(lit(1d)).as("avgdl_ratio"))
      .withColumn("rebuild",
        col("n_docs") > 0L && (col("new_term_rate") > maxNewTermRate ||
          abs(col("avgdl_ratio") - lit(1d)) > maxAvgdlShift))
  }

  /** Persist a stats snapshot under the
    * [[graft.state.HistoryFormat.Bm25Stats]] marker. */
  def saveBm25Stats(spark: org.apache.spark.sql.SparkSession, path: String,
      stats: DataFrame): Unit = {
    stats.write.mode("overwrite").parquet(path)
    graft.state.HistoryFormat.stamp(spark.sparkContext.hadoopConfiguration,
      path, graft.state.HistoryFormat.Bm25Stats)
  }

  /** Inverse of [[saveBm25Stats]]; refuses a missing or mismatched
    * marker (stats under a different token convention mis-rank
    * silently). */
  def loadBm25Stats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    graft.state.HistoryFormat.ensure(spark.sparkContext.hadoopConfiguration,
      path, graft.state.HistoryFormat.Bm25Stats, hasData = true)
    spark.read.parquet(path)
  }

  /** [[bm25UnderStats]] against a persisted snapshot path — the
    * path-taking probe enforces its own format marker (the
    * HistoryEnforcementSuite rule). */
  def bm25UnderStatsTable(batch: DataFrame, idCol: String, textCol: String,
      statsPath: String, query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25UnderStats(batch, idCol, textCol,
      loadBm25Stats(batch.sparkSession, statsPath), query, k1, b)

  /** [[bm25StatsDrift]] against a persisted snapshot path
    * (marker-enforced). */
  def bm25StatsDriftTable(batch: DataFrame, idCol: String, textCol: String,
      statsPath: String, maxNewTermRate: Double,
      maxAvgdlShift: Double): DataFrame =
    bm25StatsDrift(batch, idCol, textCol,
      loadBm25Stats(batch.sparkSession, statsPath), maxNewTermRate,
      maxAvgdlShift)

  /** [[tfIdfTopTerms]] under FROZEN collection statistics — the
    * train-once sibling of [[bm25UnderStats]], sharing the SAME
    * [[bm25CollectionStats]] table (one snapshot powers both scorers):
    * df and N come from the stats, tf from the batch, so ranked terms
    * stay comparable across batches indexed under the same snapshot —
    * plain [[tfIdfTopTerms]] re-derives df per run and a viral new
    * batch silently re-ranks every earlier result.
    *
    * Vocabulary contract: terms the snapshot never saw DO NOT RANK
    * (inner join — a df=0 linear idf is a division by zero, and an
    * arbitrary smoothing constant would break the parity law below);
    * their arrival rate is exactly [[bm25StatsDrift]]'s
    * `new_term_rate`, which calls the rebuild. Same-reference parity is
    * a LAW: under stats built from the batch itself this equals
    * [[tfIdfTopTerms]] bit-for-bit on any corpus with single-space
    * tokenization and no empty tokens (the stats table's documented
    * convention; suite-pinned).
    *
    * Scale shape: tf combines map-side behind the fine-grained
    * (doc, term) exchange; the tf⋈df join keys on term WITHOUT a
    * broadcast (a 100 TB snapshot's vocabulary is itself huge and
    * stays distributed — AQE skew-splits the join); N rides the one
    * tolerated scalar attach; top-k windows per doc. Identical
    * exchanges to [[tfIdfTopTerms]] minus the df branch's corpus
    * re-scan — the snapshot IS the df branch. */
  def tfIdfTopTermsUnderStats(batch: DataFrame, idCol: String,
      textCol: String, k: Int, stats: DataFrame): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val dfreq = stats.filter(col("kind") === "df")
      .select(col("term"), col("v").as("df"))
    // same guard as statsScalars: a stats table whose 'n' row is absent
    // (df-only slice) would NULL every rel/tfidf — refuse loudly via the
    // filter-borne guard on the always-one agg row
    val n = stats.filter(col("kind") === "n")
      .agg(max(col("v")).as("n"))
      .filter(when(col("n").isNull || col("n") <= 0L,
        raise_error(lit("tfIdfTopTermsUnderStats: the snapshot holds no " +
          "positive 'n' scalar row — a df-only or malformed stats table " +
          "cannot score; rebuild it with bm25CollectionStats"))
          .cast("boolean"))
        .otherwise(lit(true)))
    val toks = batch.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
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

  /** [[tfIdfTopTermsUnderStats]] against a persisted snapshot path
    * (marker-enforced — the same [[graft.state.HistoryFormat.Bm25Stats]]
    * marker as the BM25 probes). */
  def tfIdfTopTermsUnderStatsTable(batch: DataFrame, idCol: String,
      textCol: String, k: Int, statsPath: String): DataFrame =
    tfIdfTopTermsUnderStats(batch, idCol, textCol, k,
      loadBm25Stats(batch.sparkSession, statsPath))

  /** The integer-scaled rank-discount table both [[retrievalMetrics]]
    * sides share: `discount9(r) = round(10^9 / log2(r + 1))` — DCG's
    * 1/log2(r+1) as an exact BIGINT, computed ONCE driver-side and
    * embedded as a literal in the Spark plan AND the oracle SQL, so
    * neither engine's `log` library is ever in the compared path. */
  def dcgDiscounts9(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      math.round(1e9 / (math.log(i + 2.0) / math.log(2.0))))

  /** Retrieval-quality metrics (the eval half of the retrieval family):
    * per query, recall@k / precision@k / MRR / nDCG@k of a ranked result
    * list against a binary-relevance qrels table — what a training-data
    * pipeline runs after every retriever or embedding change.
    *
    * Inputs: `results` shaped `(query_id, id, score)` (any candidate
    * count; ranked here), `qrels` shaped `(query_id, id)` listing the
    * relevant documents (deduplicated here). Queries appearing in either
    * input get a row; missing sides read as zeros, so a query whose
    * relevant docs were never retrieved still reports recall 0.
    *
    * Determinism: ranks come from (round(score, 4) DESC, id ASC) — a
    * total order. Every metric is exact-integer until ONE terminal
    * double step per row: `rr = round(1/first_rel_rank, 6)`,
    * `recall/precision = round(hits/denominator, 4)`, and nDCG's
    * numerator/denominator are BIGINT sums over the shared
    * [[dcgDiscounts9]] literal (ideal DCG = best-possible prefix of the
    * same table), divided once — no float ever sums, so both engines
    * hash-match bit-for-bit.
    *
    * Scale shape: the ranking window partitions by query (candidate
    * lists are retriever-bounded, tens to thousands of rows — map-side
    * trimmed to k by WindowGroupLimit); qrels aggregate partial
    * map-side; everything meets on one query-keyed exchange. */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"retrievalMetrics: k must be >= 1, got $k")
    val disc9 = typedlit(dcgDiscounts9(k).toSeq)
    // duplicate (query_id, id) rows keep only their best score BEFORE
    // ranking — RRF-fused / multi-shard lists routinely repeat ids, and
    // a doc counted twice would push recall/AP past 1.0
    val ranked = results
      .select(col("query_id"), col("id"), round(col("score"), 4).as("s"))
      .groupBy("query_id", "id").agg(max(col("s")).as("s"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("s").desc, col("id"))))
      .filter(col("rank") <= k)
    val rels = qrels.select(col("query_id"), col("id")).distinct()
    val nRel = rels.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val perQ = ranked
      .join(rels.withColumn("rel", lit(1L)), Seq("query_id", "id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      // running hit count for AP's per-hit precision terms: each term
      // rounds to 6 decimals THEN pins to decimal(18,6), so the sum is
      // exact whatever order the group reduces in
      .withColumn("__hits_at", sum(col("rel")).over(
        Window.partitionBy("query_id").orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_retrieved"),
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel_rank"),
        coalesce(sum(when(col("rel") === 1L,
          element_at(disc9, col("rank")))), lit(0L)).as("dcg9"),
        coalesce(sum(when(col("rel") === 1L,
          round(col("__hits_at").cast("double") / col("rank"), 6)
            .cast(DecimalType(18, 6)))),
          lit(0L).cast(DecimalType(18, 6))).as("ap_num"))
    perQ.join(nRel, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        coalesce(col("dcg9"), lit(0L)).as("dcg9"),
        coalesce(col("ap_num"), lit(0L).cast(DecimalType(18, 6)))
          .as("ap_num"))
      .withColumn("idcg9", coalesce(aggregate(
        slice(disc9, lit(1), least(lit(k.toLong), col("n_rel")).cast("int")),
        lit(0L), (acc, x) => acc + x), lit(0L)))
      .select(col("query_id"), col("n_rel"), col("n_retrieved"), col("hits"),
        when(col("first_rel_rank") > 0L,
          round(lit(1d) / col("first_rel_rank"), 6)).otherwise(lit(0d))
          .as("rr"),
        when(col("n_rel") > 0L,
          round(col("hits").cast("double") / col("n_rel"), 4))
          .otherwise(lit(0d)).as("recall_at_k"),
        round(col("hits").cast("double") / lit(k.toDouble), 4)
          .as("precision_at_k"),
        when(col("idcg9") > 0L,
          round(col("dcg9").cast("double") / col("idcg9"), 4))
          .otherwise(lit(0d)).as("ndcg_at_k"),
        // AP@k with the TREC denominator (all relevant docs, so missed
        // relevance is penalized even when it was never retrieved)
        when(col("n_rel") > 0L,
          round(col("ap_num").cast("double") / col("n_rel"), 4))
          .otherwise(lit(0d)).as("ap_at_k"))
  }
}

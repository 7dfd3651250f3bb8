package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication, after Lee et al., "Deduplicating
  * Training Data Makes Language Models Better" (ACL'22): any run of `n`
  * or more consecutive tokens that also occurs elsewhere in the corpus
  * is marked everywhere EXCEPT its canonical (first) occurrence, and
  * overlapping/adjacent marks merge into maximal spans. Unlike document-
  * level dedup (exact/MinHash/SimHash, [[Dedup]]), this removes the
  * duplicated *text* while keeping the surrounding novel prose — the
  * form of dedup the paper shows matters most for memorization.
  *
  * The reference corpus tooling stops at document granularity
  * (`polars-incremental` has no sub-document dedup); this operator is
  * part of the training-data curation family layered on top.
  *
  * Algorithm (all relational, no suffix array):
  *  1. tokenize, then per-position token-`n`-gram keys computed at ARRAY
  *     level in a map stage — only 16-byte hash structs enter the
  *     explode/shuffle, never gram strings;
  *  2. canonical occurrence per gram = min over the PACKED owner key
  *     `doc_id * 2^32 + pos` (order-isomorphic to lexicographic
  *     `(doc_id, pos)` while doc_id fits 31 bits and pos 32 — guarded
  *     per row, and `packedOwners = false` falls back to the
  *     `min(struct(doc_id, pos))` formulation for out-of-range ids) via
  *     `groupBy(key).agg` — partial (map-side) aggregation collapses a
  *     corpus-wide hot gram before the shuffle, so document skew cannot
  *     pin one gram's occurrences to one task (same skew-immune
  *     agg+join-back shape as [[Dedup.charNgramJaccardExactPairs]]'s
  *     document frequency — a window over the gram key would not split).
  *     The packed long min is hash-aggregable (plans as HashAggregate,
  *     PlanSuite-gated), where min-over-struct planned as a partial
  *     SortAggregate (struct buffers aren't hash-mutable);
  *  3. join occurrences back on the key (AQE-skew-splittable), mark
  *     everything that is not its gram's canonical occurrence;
  *  4. merge marks into maximal half-open token spans `[start, end)`
  *     with a per-document gaps-and-islands window (bounded by document
  *     length, safe at any corpus scale).
  *
  * Exactness: gram identity is 128 bits — two XXH64 passes over the
  * gram bytes with INDEPENDENT seeds ([[graft.functions
  * .WordGramHashesExpr]]; before r11 the second hash chained off the
  * first and the key was effectively 64-bit — see the expression's
  * scaladoc). A wrong span requires two distinct grams colliding on
  * both hashes — probability < 1e-15 even at 10^12 grams (100 TB),
  * versus the observable cost of a second string-carrying corpus scan;
  * this is the same trade the published suffix-array pipelines make.
  * The DuckDB oracle computes the same spans over the raw gram
  * STRINGS, so any collision at test scale would surface as a hash
  * mismatch.
  */
object SpanDedup {


  /** Span joins key on `cast(idCol as long)`; a non-numeric id column
    * casts to null, every row misses the join, and duplicated spans pass
    * through UNEXCISED with no error — the same silent-wrong-answer trap
    * [[Packing.packAssignments]] guards against; a fractional id
    * truncates, merging distinct docs' spans. Shared [[IdGuard]]. */
  private def requireNumericId(df: DataFrame, idCol: String): Unit =
    IdGuard.requireIntegralId(df, idCol, "SpanDedup",
      "a lossy cast would null or collapse the doc_id join keys and " +
        "silently leave duplicated spans unexcised")

  /** The id contract of the INCREMENTAL path ([[ownerIndex]] /
    * [[spansWithHistory]]): the persisted history schema is packed-long
    * only, so `doc_id` must fit 31 bits and token positions 32. There is
    * no struct-owner fallback across batches — re-key documents into
    * `[0, 2^31)` before indexing (the remedy the in-row guard names). */
  private val IncrementalIdRemedy =
    "the cross-batch history schema is packed-long only (no struct " +
    "fallback); re-key documents into [0, 2^31) before indexing"

  // 128-bit gram keys now come from WordGramHashesExpr — two genuinely
  // independent XXH64 seeds over the joined window bytes, assembled in
  // a reused buffer (no slice array / gram string per window). The old
  // column formulation's second hash `xxhash64(g, lit(seed))` CHAINED
  // (= hashLong(seed, h1)), silently degrading the key to 64 bits; the
  // dependence is pinned in WordGramHashesSuite so it can't return.
  // r11 HISTORY NOTE: h2's definition changed — rebuild gram-owner
  // histories written before r11 (h1 unchanged).

  /** Per-occurrence gram rows `(doc_id, pos, gh, okey)`; `okey` is the
    * canonical-owner ordering key — packed long by default (hash-
    * aggregable), struct fallback for out-of-31/32-bit ids. */
  private def occWithKey(df: DataFrame, idCol: String, textCol: String,
      n: Int, delim: String, packedOwners: Boolean,
      packedRangeRemedy: String = "call spans(..., packedOwners = false)")
      : DataFrame = {
    requireNumericId(df, idCol)
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), delim).as("w"))
    // hash before explode: the Generate emits (pos, {h1,h2}) longs only
    val occBase = toks
      .select(col("doc_id"),
        posexplode(graft.functions.WordGramHashFunctions
          .wordGramHashes(col("w"), n, delim)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("gh"))
    // owner key: packed long (hash-aggregable min) by default, guarded
    // per row so an out-of-range id fails LOUDLY naming the fallback
    // instead of silently mis-ordering; struct fallback preserves exact
    // semantics for arbitrary long ids at SortAggregate cost
    if (packedOwners)
      occBase.withColumn("okey",
        when(assert_true(
          col("doc_id") >= 0 && col("doc_id") < 2147483648L &&
            col("pos") < 4294967296L,
          lit("spans: doc_id/pos exceed the 31/32-bit packed-owner " +
            s"range; $packedRangeRemedy")).isNull,
          col("doc_id") * 4294967296L + col("pos")))
    else occBase.withColumn("okey", struct(col("doc_id"), col("pos")))
  }

  /** Gaps-and-islands merge of `(doc_id, pos)` marks into maximal
    * half-open `[span_start, span_end)` spans; windows are per-document,
    * bounded by doc length — never a corpus-scale partition. */
  private def mergeMarks(marked: DataFrame, n: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + n)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("brk",
        when(col("pos") <= prevEnd, lit(0L)).otherwise(lit(1L)))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + n).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Maximal duplicated token spans per document:
    * `(doc_id, span_start, span_end)` with `[span_start, span_end)` in
    * token indices (0-based), sorted ascending within a document. A span
    * covers every `n`-token gram occurrence whose gram also occurs at a
    * lexicographically smaller `(doc_id, pos)` anywhere in the corpus. */
  def spans(df: DataFrame, idCol: String, textCol: String, n: Int = 10,
      delim: String = " ", packedOwners: Boolean = true): DataFrame = {
    val occ = occWithKey(df, idCol, textCol, n, delim, packedOwners)
    val owners = occ.groupBy(col("gh"))
      .agg(min(col("okey")).as("own"), count(lit(1)).as("occ_n"))
      .filter(col("occ_n") >= 2)
      .select(col("gh"), col("own"))
    val marked = occ.join(owners, Seq("gh"))
      .filter(col("okey") =!= col("own"))
      .select(col("doc_id"), col("pos"))
    mergeMarks(marked, n)
  }

  /** The batch's per-gram owner index — the unit a CROSS-BATCH
    * incremental pipeline persists (append-per-batch into a history
    * Delta table, the same pattern the fingerprint history uses): one
    * row per distinct gram with the batch-local canonical owner (packed
    * `doc_id * 2^32 + pos`) and occurrence count, flat
    * `(h1, h2, own, occ)` longs for friendly storage and stats. Readers
    * aggregate multi-batch rows with `min(own)` / `sum(occ)` —
    * [[spansWithHistory]] does. Size is O(distinct grams) * 32 bytes per
    * batch — the same order as the corpus itself, the trade every exact
    * substring-dedup index (suffix arrays included) makes; compact the
    * accumulated table with [[compactIndex]] to hold that bound across
    * overlapping batches. ID CONTRACT: `doc_id` must fit 31 bits (packed
    * history schema — the in-row guard fails loudly otherwise). */
  def ownerIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 10, delim: String = " "): DataFrame =
    occWithKey(df, idCol, textCol, n, delim, packedOwners = true,
      packedRangeRemedy = IncrementalIdRemedy)
      .groupBy(col("gh"))
      .agg(min(col("okey")).as("own"), count(lit(1)).as("occ"))
      .select(col("gh.h1").as("h1"), col("gh.h2").as("h2"),
        col("own"), col("occ"))

  /** AGGREGATING compaction of an accumulated [[ownerIndex]] history:
    * one row per DISTINCT gram — `min(own)` (the global first-seen
    * owner; min is idempotent under re-aggregation) and
    * `least(sum(occ), 2)` (downstream only distinguishes `occ >= 2`
    * from `= 1`, so the count saturates instead of growing without
    * bound). [[spansWithHistory]] over the compacted rows is IDENTICAL
    * to over the raw per-batch rows: it re-aggregates with the same
    * `min(own)` / `sum(occ)`, and the saturated count crosses its
    * `>= 2` gate exactly when the true total does (any gram present in
    * history at all makes every batch occurrence a duplicate — `bocc >=
    * 1` always).
    *
    * This is what bounds the per-batch history SCAN at 100 TB: raw
    * appends hold one row per (batch, gram), so across B overlapping
    * batches the table grows toward B copies of every hot gram and each
    * batch re-reads all of them; compacted, the table is capped at
    * O(corpus distinct grams) rows no matter how many batches ran —
    * per-batch read I/O tracks the corpus's distinct-gram count, not
    * its batch LIFETIME. Uniform hash keys defeat min/max file
    * skipping, so row-count reduction is the only lever that shrinks
    * this scan. Rewrite the history table with the result (Overwrite —
    * a genuine dataChange; safe because the history is re-read in full
    * each batch, never tailed, and SetTransaction watermarks survive an
    * overwrite commit). One shuffle on the gram key with map-side
    * partial aggregation; no joins. */
  def compactIndex(history: DataFrame): DataFrame =
    history.groupBy(col("h1"), col("h2"))
      .agg(min(col("own")).as("own"),
        least(sum(col("occ")), lit(2L)).as("occ"))

  /** [[spans]] for ONE batch against the accumulated [[ownerIndex]] of
    * every PRIOR batch: a batch occurrence is marked when its gram's
    * total occurrence count (history + batch) reaches 2 and the
    * occurrence is not the canonical owner. First-seen wins: a gram
    * already in history keeps its HISTORICAL owner (`coalesce(hist,
    * batch)`, never `least`) — the canonical copy was already curated in
    * a past batch, so every current-batch occurrence is a duplicate even
    * when a current doc_id sorts smaller; only history-free grams elect
    * their owner within the batch (plain [[spans]] semantics).
    *
    * Cost shape — the history is CUMULATIVE (it outgrows any batch by
    * orders of magnitude), so the batch drives every history access:
    * history rows first SEMI-JOIN to the batch's distinct gram keys
    * (only grams the batch actually contains are read into the
    * aggregation — an aggregate-the-whole-history-then-join shape would
    * re-reduce every gram ever seen, every batch), then aggregate per
    * gram and join back; prior batches' TEXT is never touched.
    * Replay-deterministic: owner selection depends only on (history
    * table, batch content), so a crashed batch recomputes identical
    * spans as long as its own index append had not landed — the
    * SetTransaction-guarded dual-commit order (curated first, index
    * second) guarantees exactly that. */
  def spansWithHistory(df: DataFrame, history: DataFrame, idCol: String,
      textCol: String, n: Int = 10, delim: String = " "): DataFrame =
    spansWithHistoryImpl(df, history, idCol, textCol, n, delim)

  /** [[spansWithHistory]] reading the persisted gram-owner index from
    * its table directory — validates the
    * [[graft.state.HistoryFormat.SpanGramOwner]] marker BEFORE any
    * probe, so a stale-format index (the exact r11 h2-derivation
    * hazard) refuses from the operator with the rebuild remedy named.
    * The DataFrame overload leaves the check to the caller. */
  def spansWithHistoryTable(df: DataFrame, historyDir: String,
      idCol: String, textCol: String, n: Int = 10,
      delim: String = " "): DataFrame =
    spansWithHistoryImpl(df,
      graft.state.HistoryTables.readChecked(df.sparkSession, historyDir,
        graft.state.HistoryFormat.SpanGramOwner),
      idCol, textCol, n, delim)

  private def spansWithHistoryImpl(df: DataFrame, history: DataFrame,
      idCol: String, textCol: String, n: Int, delim: String): DataFrame = {
    val occ = occWithKey(df, idCol, textCol, n, delim, packedOwners = true,
      packedRangeRemedy = IncrementalIdRemedy)
      .select(col("doc_id"), col("pos"), col("okey"),
        col("gh.h1").as("h1"), col("gh.h2").as("h2"))
    val batchIdx = occ.groupBy(col("h1"), col("h2"))
      .agg(min(col("okey")).as("bown"), count(lit(1)).as("bocc"))
    val hist = history
      .join(batchIdx.select("h1", "h2"), Seq("h1", "h2"), "left_semi")
      .groupBy(col("h1"), col("h2"))
      .agg(min(col("own")).as("hown"), sum(col("occ")).as("hocc"))
    val merged = batchIdx.join(hist, Seq("h1", "h2"), "left")
      .select(col("h1"), col("h2"),
        coalesce(col("hown"), col("bown")).as("own"),
        (col("bocc") + coalesce(col("hocc"), lit(0L))).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("h1"), col("h2"), col("own"))
    val marked = occ.join(merged, Seq("h1", "h2"))
      .filter(col("okey") =!= col("own"))
      .select(col("doc_id"), col("pos"))
    mergeMarks(marked, n)
  }

  /** The corpus with every duplicated span's tokens removed (canonical
    * occurrences stay). Adds `clean_text` and `n_tokens_removed`; all
    * original columns pass through. Token filtering is higher-order
    * functions over the split array — map-side, codegen, no extra
    * shuffle beyond [[spans]]. */
  def clean(df: DataFrame, idCol: String, textCol: String, n: Int = 10,
      delim: String = " "): DataFrame =
    applySpans(df, spans(df, idCol, textCol, n, delim), idCol, textCol, delim)

  /** Excise an externally-computed span set (from [[spans]] or
    * [[spansWithHistory]]) from `df` — the application half of [[clean]],
    * exposed so an incremental pipeline can clean a batch against
    * cross-batch spans. */
  def applySpans(df: DataFrame, spansDf: DataFrame, idCol: String,
      textCol: String, delim: String = " "): DataFrame = {
    requireNumericId(df, idCol)
    val sp = spansDf
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
      .withColumnRenamed("doc_id", "_sd_id")
    val covered: (Column, Column) => Column = (spansCol, i) =>
      exists(spansCol, s =>
        i >= s.getField("span_start") && i < s.getField("span_end"))
    df.join(sp, col(idCol).cast("long") === col("_sd_id"), "left")
      .drop("_sd_id")
      .withColumn("_w", split(col(textCol), delim))
      .withColumn("clean_text",
        when(col("_spans").isNull, col(textCol))
          .otherwise(array_join(
            filter(col("_w"), (tok, i) => !covered(col("_spans"), i)),
            delim)))
      .withColumn("n_tokens_removed",
        when(col("_spans").isNull, lit(0L))
          .otherwise(aggregate(col("_spans"), lit(0L),
            (acc, s) => acc +
              (s.getField("span_end") - s.getField("span_start")))))
      .drop("_spans", "_w")
  }
}

package graft.state

import graft.util.{Fs, Jsons}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Format/version markers for persisted cross-batch history tables.
  *
  * A history index is only useful if its keys were computed EXACTLY the
  * way the current engine computes them — and a key-derivation change is
  * invisible at the table level: an old-format span-gram history simply
  * stops matching anything (silent no-matches, every duplicate sails
  * through), which is the exact failure class the drift trio exists to
  * catch elsewhere. The r11 `WordGramHashesExpr` h2 fix (chained →
  * independent xxhash64 passes) is the motivating case: its HISTORY
  * FORMAT NOTE documents that old-h2 indexes won't match, but nothing
  * DETECTED one.
  *
  * So: every persisted history table carries a tiny JSON marker
  * `_graft_history_format.json` INSIDE its directory (Delta and parquet
  * readers both ignore unknown non-data files). [[ensure]] refuses
  * loudly — naming the rebuild remedy — when the marker names a
  * different format version, or when the table already has data but no
  * marker (a pre-versioning legacy index whose keys are unverifiable).
  * A fresh (empty) table is stamped with the current version.
  *
  * == Crash-atomicity dispositions (round-18 audit) ==
  *
  * The near-dup trio got a single-pointer epoch swap because its THREE
  * tables must move atomically. Sweeping every other persisted root for
  * the same multi-file-commit exposure:
  *
  *  - '''Append-only Delta histories''' (SpanGramOwner, MinhashSignature,
  *    Hash64Signature, LineDf, ClusterAssignment, PqCodes, SftAssistantFp,
  *    PrefPromptFp, CohortActivity): one table, one Delta log commit per
  *    fold — atomic by the Delta protocol; cross-TABLE compositions are
  *    the caller's SetTransaction + commit-order discipline
  *    (IncrementalCurationDemo's class doc). No exposure.
  *  - '''Write-once model stores''' (QualityClfWeights, BpeMerges,
  *    EvalEmbedding, Bm25Stats, ScoreCuts, TableProfile, the
  *    quantizer/PQ saves): data parquet THEN marker stamp — a crash
  *    between the two leaves data without a marker, which [[ensure]]
  *    REFUSES loudly with the remedy named (the designed legacy-index
  *    path doubles as the crash path). Detectable, never silent.
  *  - '''FunnelStages''': marker + stages sidecar + state table; a crash
  *    between stamp and sidecar refuses loudly from `funnelFoldTable`
  *    (no recorded stage list). Detectable, never silent.
  *  - '''Single-table replace roots''' (ClusterQuota,
  *    SourceReputationFp, and every `JobState.saveParquet` consumer —
  *    watermarks, seen-key sets, incremental aggregates, mix counts):
  *    previously a delete-then-rename swap whose crash window left the
  *    table GONE and the next load silently reseeding — the silent-loss
  *    class the epoch pointer refuses on. Fixed this round: the swap is
  *    now write-tmp → rename-aside → rename-in → cleanup, and every
  *    crash point self-heals losslessly on next access
  *    ([[JobState.heal]]); no migration to the epoch mechanism needed
  *    because one table needs no cross-table atomicity.
  *  - '''NearDupState''': the epoch-pointer mechanism itself (commit =
  *    one atomic pointer replace; lost-pointer states refuse). v3 keeps
  *    the single pointer while splitting storage into append-only
  *    docs/reps CHUNKS (named by the pointer) + the epoch-swapped cc —
  *    a crash anywhere before the swap remains a complete no-op, and
  *    half-written chunks are overwritten on retry and pruned after the
  *    next swap.
  *  - '''Resumable shard export''' (`Mixing.writeShardsResumable`):
  *    per-shard data-before-manifest commit with a parameter marker;
  *    any crash point resumes by rewriting only uncommitted shards.
  *  - '''Hash64BucketCounts''' (round 19): a DERIVED CACHE beside a
  *    signature history — chunk writes committed by one atomic meta
  *    replace, and cross-table consistency with the signature table
  *    enforced by a row-count tripwire whose failure path is a
  *    lossless rebuild (the cache is a pure function of the history),
  *    so every crash window between a signature append and the counts
  *    fold self-heals; driven under the injected-crash demo
  *    (NearDupStateDemo) and per-window suite sims.
  */
object HistoryFormat {
  /** A named key-derivation format at a specific version. Bump `version`
    * whenever the persisted keys' derivation changes incompatibly. */
  final case class Format(name: String, version: Int, rebuildRemedy: String)

  /** Span-dedup gram-owner history ([[graft.operators.SpanDedup.ownerIndex]]).
    * v2 = independent two-pass h2 (r11 `WordGramHashesExpr` fix); v1 was
    * the chained-xxhash64 h2, whose keys no longer match. */
  val SpanGramOwner: Format = Format("span-gram-owner", 2,
    "re-run SpanDedup.ownerIndex over the full curated corpus and " +
      "overwrite the history table")

  /** MinHash signature history ([[graft.operators.Dedup.minhashIndex]]):
    * v1 = xxhash64 word-shingle minhash, k permutations in column order. */
  val MinhashSignature: Format = Format("minhash-signature", 1,
    "re-run Dedup.minhashIndex over the full curated corpus and " +
      "overwrite the history table")

  /** 64-bit locality-hash signature history
    * ([[graft.operators.Dedup.simhashIndex]] and the media dHash/envelope
    * hashes): v1 = xxhash64 token-feature simhash. */
  val Hash64Signature: Format = Format("hash64-signature", 1,
    "re-run the signature index (Dedup.simhashIndex / media hashes) over " +
      "the full curated corpus and overwrite the history table")

  /** Derived per-layout bucket-count cache for the hash64 layout
    * selector ([[graft.operators.Hash64Counts]]), kept beside (or for)
    * a [[Hash64Signature]] history: v2 adds per-chunk row accounting
    * (`chunk_rows`) to the meta, which is what makes the cheap
    * chunk-suffix AHEAD heal possible. A v1 cache rebuilds losslessly
    * on first contact with a HEAL surface (`ensure`/`decideAndFold` —
    * they hold the source history); the bare `fold`/`read` surfaces
    * have no source to rebuild from and refuse with this remedy. The
    * chunk derivation itself is v1's: `(layout, b, k, cnt)` rows —
    * narrow = Manku 4×16-bit (block, key) buckets, wide =
    * C(blocks, blocks−maxHamming) packed combination keys under the
    * meta-recorded parameters — summed over append-only chunks, with
    * the folded signature-row count in the atomically-replaced meta.
    * PURE CACHE of a counts aggregation over the signature history:
    * any inconsistency (a crash between a signature append and the
    * counts fold, an out-of-band append) is detected by the row-count
    * tripwire and healed by a lossless rebuild, so this marker guards
    * only the derivation shape. */
  val Hash64BucketCounts: Format = Format("hash64-bucket-counts", 2,
    "delete the counts directory and re-run Hash64Counts.rebuild over " +
      "the signature history (a derived cache — the rebuild is lossless)")

  /** Derived rep-signature cache for the composed near-dup fold's
    * probe ([[graft.operators.SigCache]]): v2 adds per-chunk row
    * accounting (`chunk_rows`) to the meta — the cheap chunk-suffix
    * AHEAD heal's prerequisite. A v1 cache rebuilds losslessly on
    * first contact with the heal surface (`ensureAndFold`, which
    * holds the reps table); the bare `read` has no source to rebuild
    * from and refuses with this remedy. The row derivation itself is
    * v1's: `(doc_id, sh)` rows,
    * sh = the poly-31 modular simhash over the rep's text under the
    * meta-recorded `(mod1, mod2)`, one row per representative, summed
    * over append-only chunks with the folded row count in the
    * atomically-replaced meta. PURE CACHE of a per-row derivation over
    * the reps table: the row-count tripwire detects any inconsistency
    * and heals with a lossless re-derivation, so this marker guards
    * only the derivation shape (a different hash fold or modulus pair
    * silently mismatches every probe key — the exact class the marker
    * exists to refuse). */
  val PolySimhashSigCache: Format = Format("poly-simhash-sig-cache", 2,
    "delete the signature-cache directory and re-run SigCache.rebuild " +
      "over the reps table (a derived cache — the rebuild is lossless)")

  /** Cross-batch line-df history ([[graft.operators.Curation.lineIndex]]):
    * v1 = two independent XXH64 passes over the line bytes (h2 seeded
    * via a leading literal), packed `doc_id · 2^32 + pos` owners. */
  val LineDf: Format = Format("line-df", 1,
    "re-run Curation.lineIndex over the full curated corpus and " +
      "overwrite the history table")

  /** Embedding/SemDeDup cluster-assignment history keyed by a persisted
    * quantizer: v1 = nearest-centroid bucket under cosine. (Quantizer
    * CONTENT staleness is the drift trio's job; this guards the
    * derivation shape.) */
  val ClusterAssignment: Format = Format("cluster-assignment", 1,
    "re-run the cluster assignment under the current quantizer and " +
      "overwrite the history table")

  /** Accumulated PQ code index ([[graft.operators.Similarity.pqIndexBatch]]
    * appends): v1 = IVF bucket under the persisted coarse quantizer +
    * per-subspace PQ codebook indices + residual norm. Codes are only
    * meaningful under the exact (quantizer, PQ codebook) pair that
    * produced them — a retrained model silently mis-ranks every stored
    * code. (Model CONTENT staleness is quantizerDrift's job; this
    * guards the derivation shape.) */
  val PqCodes: Format = Format("pq-codes", 1,
    "re-encode the vector history under the current quantizer + PQ " +
      "model (Similarity.pqIndexBatch) and overwrite the code index")

  /** Persisted hashed-feature linear quality classifier
    * ([[graft.operators.QualityClf.save]]): v1 = poly-31 modular fold
    * over code points, word unigram+bigram features, integer weights
    * indexed by bucket with the bias at bucket -1. The feature-hash
    * fold is part of the format — weights applied under a different
    * fold silently mis-score every document. */
  val QualityClfWeights: Format = Format("quality-clf-weights", 1,
    "re-train the classifier (QualityClf.train) on the labelled " +
      "reference slice under the current feature hash and re-save")

  /** Persisted BPE subword model ([[graft.operators.Bpe.save]]): v1 =
    * sorted code-point base alphabet + ordered pair merges, ids =
    * 1-based position in (base ++ merges), id 0 reserved for unk. The
    * id space is positional, so ANY change to alphabet derivation or
    * merge order silently re-ids every persisted token sequence. */
  val BpeMerges: Format = Format("bpe-merges", 1,
    "re-train the BPE model (Bpe.train) on the reference slice, re-save " +
      "it, and re-encode any persisted id sequences produced under the " +
      "old model")

  /** Cross-batch SFT assistant-side dedup history
    * ([[graft.operators.Sft.assistantFingerprints]]): v1 = MD5 over the
    * conversation's assistant contents joined with `\n` in turn order.
    * Any change to role selection, join order, or separator silently
    * stops every stored fingerprint from matching. */
  val SftAssistantFp: Format = Format("sft-assistant-fp", 1,
    "re-run Sft.assistantFingerprints over the full kept conversation " +
      "corpus and overwrite the history table")

  /** Cross-batch preference-prompt dedup history
    * ([[graft.operators.Sft.promptFingerprints]]): v1 = MD5 over the
    * RAW prompt string (exact equality — no normalization). Adding
    * normalization, a salt, or a different digest silently stops every
    * stored fingerprint from matching. */
  val PrefPromptFp: Format = Format("pref-prompt-fp", 1,
    "re-run Sft.promptFingerprints over the full kept preference corpus " +
      "and overwrite the history table")

  /** Semantic-decontamination eval index
    * ([[graft.operators.Dedup.saveEvalEmbeddingIndex]]): v1 =
    * `(bench_id long, v array<float>)`, vectors from ONE embedding
    * model. Cosines against vectors from a different model (or a
    * re-normalized export of the same one) are meaningless numbers that
    * still pass every schema check — the marker is the only thing that
    * ties the index to its embedding run. */
  val EvalEmbedding: Format = Format("eval-embedding", 1,
    "re-embed the eval set under the embedding model the batch vectors " +
      "use and re-save via Dedup.saveEvalEmbeddingIndex")

  /** Frozen BM25 collection statistics
    * ([[graft.operators.Relevance.bm25CollectionStats]]): v1 =
    * `(kind, term, v)` rows — per-term document frequencies under the
    * single-space token convention plus the `n`/`sumdl` scalar rows.
    * Scores mix the frozen idf with per-batch tf, so stats computed
    * under a different tokenization silently mis-rank every result. */
  val Bm25Stats: Format = Format("bm25-collection-stats", 1,
    "re-run Relevance.bm25CollectionStats over the reference corpus " +
      "and overwrite the stats table")

  /** Cross-batch cluster-prune quota history
    * ([[graft.operators.Similarity.prunedCounts]] accumulations): v1 =
    * `(cluster, seen, kept)` per-cluster totals under nearest-centroid
    * cosine assignment against ONE persisted quantizer. Counts keyed by
    * a different quantizer's cluster ids mis-budget every later batch.
    * (Quantizer CONTENT staleness is quantizerDrift's job; this guards
    * the derivation shape.) */
  val ClusterQuota: Format = Format("cluster-quota", 1,
    "re-run Similarity.clusterPruneAgainstHistory over the full kept " +
      "corpus under the current quantizer and overwrite the quota history")

  /** Cross-batch cohort-retention activity matrix
    * ([[graft.operators.Behavioral.activityFold]] appends): v1 =
    * distinct `(user_id, period)` pairs, period = `yyyy-MM-dd` day
    * truncation of the event timestamp. A different truncation (week,
    * UTC offset, format string) silently stops the anti-join from
    * deduping and double-counts every cell. */
  val CohortActivity: Format = Format("cohort-activity", 1,
    "re-run Behavioral.activityPairs over the full event history and " +
      "overwrite the activity table")

  /** Per-user sequential-funnel stage state
    * ([[graft.operators.Behavioral.funnelFold]]): v1 =
    * `(user_id, t1 … tk, max_ts)` — first-qualifying-event timestamps
    * under strictly-after chaining plus the event-time watermark. The
    * stage LIST is part of the table's identity (a k-stage state is
    * meaningless for a different stage set; column-count mismatch also
    * refuses in the fold). */
  val FunnelStages: Format = Format("funnel-stages", 1,
    "re-run Behavioral.funnelFold from None over the full event history " +
      "in event-time order and overwrite the state table")

  /** Stamped table-profile reference
    * ([[graft.operators.Profile.saveProfile]]): v1 = one long-format row
    * per column `(column_name, n_rows, n_null, n_distinct, min_s, max_s,
    * avg_len)` with lexical CAST-AS-STRING min/max and exact NDV. A
    * profile under a different casting or NDV mode silently mis-reads
    * every drift ratio. */
  val TableProfile: Format = Format("table-profile", 1,
    "re-profile the reference slice (Profile.tableProfile, exact NDV) " +
      "and re-save via Profile.saveProfile")

  /** Stamped CCNet score-percentile cuts
    * ([[graft.operators.Curation.scoreCutsModel]]): v1 = one row per
    * interior threshold `(pos, cut)` — `pos` the 1-based threshold
    * index, `cut` the exact-percentile interpolation ROUNDED to 6
    * decimals (classification compares `score <= cut` directly, so the
    * rounding is part of the persisted contract). Cuts computed under a
    * different score definition or rounding silently shift every
    * bucket label. */
  val ScoreCuts: Format = Format("score-percentile-cuts", 1,
    "re-run Curation.scoreCutsModel over the reference scored slice " +
      "and overwrite the cuts table")

  /** Cross-batch source-reputation fingerprint state
    * ([[graft.operators.Curation.sourceFpBatch]] folds): v1 = one row
    * per distinct `(md5(text), source)` pair with its copy count and
    * the text's round(·,4) stopword ratio UNDER THE CALLER'S STOPWORD
    * LIST (the list is part of the format identity — sums folded under
    * a different list mis-gate every source). Dup decisions derive
    * from fingerprint totals, so a different digest or a text
    * normalization change silently zeroes the dup rate. */
  val SourceReputationFp: Format = Format("source-reputation-fp", 1,
    "re-run Curation.sourceFpBatch over the full corpus under the " +
      "current stopword list and overwrite the state table")

  /** Composed near-dup canonicalization fold state
    * ([[graft.operators.Dedup.nearDupCanonicalizeIncrementTable]]) —
    * the (docs, reps, cc) state under one marker-stamped root. v4 =
    * ALL THREE tables as chunk lists named by the one pointer: docs/
    * reps append-only (plain union), cc base+delta read
    * last-writer-wins by chunk sequence — each fold writes
    * O(batch + Δ-components) bytes, no per-fold write term grows with
    * the accumulated state. v3 chunked docs/reps but rewrote cc whole
    * under an epoch subdir (`e<N>/cc`, O(reps) bytes per fold) — its
    * pointer carries no cc chunk list, so a v3 state is structurally
    * unreadable to the v4 reader and refuses here with the remedy
    * (same for v2, which wrote the full trio under every epoch dir). v2
    * introduced md5 text fingerprints with a NULL-text SENTINEL (all
    * NULL-text docs share one cluster — v1's NULL fp never equi-joins,
    * leaving NULL-text docs permanently unresolvable, the exact
    * silent-no-matches class this marker exists to refuse). The marker
    * guards the fingerprint derivation AND the root layout; the
    * pluggable pair function's own stability is the caller's contract
    * (probe a state only with the pair semantics that built it). */
  val NearDupState: Format = Format("neardup-canonical-state", 4,
    "re-fold the full corpus through nearDupCanonicalizeIncrement from " +
      "an empty state and overwrite the state trio")

  private val MarkerFile = "_graft_history_format.json"

  private def markerPath(tableDir: String) = new Path(tableDir, MarkerFile)

  /** Validate-or-initialize the marker for a history table.
    *
    * @param hasData whether the table already holds committed rows (the
    *   caller knows — `DeltaWriter.tableExists`, parquet dir non-empty…).
    *   Data without a marker is a legacy unverifiable index → refuse.
    * @throws IllegalStateException naming the rebuild remedy when the
    *   persisted format cannot be verified to match `fmt`. */
  def ensure(conf: Configuration, tableDir: String, fmt: Format,
      hasData: Boolean): Unit = {
    val p = markerPath(tableDir)
    if (Fs.exists(p, conf)) {
      val node = Fs.readJson(p, conf)
      val name = Jsons.optStr(node, "format").getOrElse("?")
      val ver = Jsons.optLong(node, "version").getOrElse(-1L)
      if (name != fmt.name || ver != fmt.version)
        throw new IllegalStateException(
          s"history table $tableDir is format $name v$ver but the engine " +
            s"writes ${fmt.name} v${fmt.version}: its keys will not match " +
            s"this engine's hashes (silent no-matches). Rebuild required: " +
            s"${fmt.rebuildRemedy}, then re-stamp with HistoryFormat.stamp.")
    } else if (hasData) {
      throw new IllegalStateException(
        s"history table $tableDir has data but no $MarkerFile marker — a " +
          s"pre-versioning index whose key derivation cannot be verified " +
          s"against ${fmt.name} v${fmt.version}. If it was built by THIS " +
          s"engine version, stamp it with HistoryFormat.stamp; otherwise " +
          s"rebuild: ${fmt.rebuildRemedy}.")
    } else stamp(conf, tableDir, fmt)
  }

  /** Write (or overwrite) the marker — for fresh tables and for
    * explicitly acknowledged rebuilds/migrations. */
  def stamp(conf: Configuration, tableDir: String, fmt: Format): Unit = {
    val o = Jsons.obj()
    o.put("format", fmt.name)
    o.put("version", fmt.version)
    Fs.atomicWriteJson(markerPath(tableDir), o, conf)
  }

  /** The marker currently on disk, if any — `(format, version)`. */
  def read(conf: Configuration, tableDir: String): Option[(String, Long)] = {
    val p = markerPath(tableDir)
    if (!Fs.exists(p, conf)) None
    else {
      val node = Fs.readJson(p, conf)
      Some((Jsons.optStr(node, "format").getOrElse("?"),
        Jsons.optLong(node, "version").getOrElse(-1L)))
    }
  }
}

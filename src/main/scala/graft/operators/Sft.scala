package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning (chat) data preparation — the post-training
  * half of a training-data pipeline. The pretraining family treats a
  * document as one undifferentiated token stream; SFT data is
  * CONVERSATIONS, and three things change: rendering (turns serialize
  * under a chat template before tokenization), loss masking (the
  * trainer learns only on assistant turns — user/system tokens get
  * loss weight 0), and dedup granularity (two conversations with
  * different user phrasings but identical assistant answers are the
  * duplicate that matters).
  *
  * Input shape for every operator here: a TURNS frame with one row per
  * turn — `(conv, turn_idx, role, content)` columns named by the
  * caller. Turn indexes must be unique within a conversation (they are
  * the serialization order).
  *
  * Scale shape: conversations are the unit of work and are individually
  * tiny (tens of turns), so every window below partitions by the
  * conversation id — thousands of parallel window groups, never a
  * corpus-wide ordering. Rendering and fingerprinting are one
  * partial-agg'd exchange each; packing delegates to
  * [[Packing.packAssignmentsByCount]]'s two-pass distributed prefix
  * sum; mask segmentation after the pack join is map-only interval
  * arithmetic.
  */
object Sft {

  /** Default trainable role set: learn on the model's own side only. */
  val TrainableRoles: Seq[String] = Seq("assistant")

  /** Serialize each conversation under a ChatML-style template:
    * `<|role|>content<|end|>` per turn, concatenated in `turnIdxCol`
    * order. One row per conversation: `(conv_id, rendered, n_turns,
    * n_assistant)`. The rendered string is what the tokenizer family
    * ([[Bpe.encode]], [[Curation.tokenizeToIds]]) consumes downstream.
    *
    * One exchange (the per-conversation aggregate); the sort happens
    * inside each collected conversation (array_sort over tens of
    * turns), never across the corpus. */
  def renderChatML(turns: DataFrame, convCol: String, turnIdxCol: String,
      roleCol: String, contentCol: String): DataFrame =
    turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(collect_list(struct(col(turnIdxCol).cast("long").as("i"),
        col(roleCol).as("r"), col(contentCol).as("c"))).as("ts"))
      .select(col("conv_id"),
        array_join(transform(array_sort(col("ts")),
          t => concat(lit("<|"), t.getField("r"), lit("|>"),
            t.getField("c"), lit("<|end|>"))), "").as("rendered"),
        size(col("ts")).cast("long").as("n_turns"),
        size(filter(col("ts"), t => t.getField("r") === lit("assistant")))
          .cast("long").as("n_assistant"))

  /** Per-turn token spans in conversation-local coordinates:
    * `(conv_id, turn_idx, role, tok_start, tok_end, trainable)` — turn
    * `turn_idx` occupies ids `[tok_start, tok_end)` of its
    * conversation's concatenated token stream, and `trainable` marks
    * the turns the loss applies to. This IS the loss mask, in the
    * run-length form a trainer consumes (a 0/1 vector materializes as
    * `tok_end - tok_start` copies of `trainable`).
    *
    * `countCol` is each turn's PRECOMPUTED token count — the
    * [[Packing.packAssignmentsByCount]] discipline, so the spans are
    * cut in whatever id space the export ships (BPE subword counts via
    * `Bpe.encode(...)("n_tokens")`, whitespace counts for a quick
    * audit). The prefix sum is a window partitioned by the conversation
    * id: each window group is one conversation, bounded by its turn
    * count, never the corpus. */
  def turnSpansByCount(turns: DataFrame, convCol: String,
      turnIdxCol: String, roleCol: String, countCol: String,
      trainableRoles: Seq[String] = TrainableRoles): DataFrame =
    turns
      .select(col(convCol).as("conv_id"),
        col(turnIdxCol).cast("long").as("turn_idx"),
        col(roleCol).as("role"), col(countCol).cast("long").as("__n"))
      .withColumn("tok_end", sum(col("__n")).over(
        Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        (col("tok_end") - col("__n")).as("tok_start"), col("tok_end"),
        col("role").isin(trainableRoles: _*).as("trainable"))

  /** Loss-mask-preserving sequence packing: conversations concatenate
    * into fixed-`budget` packs (a conversation may straddle packs), and
    * each pack segment carries its turn-level mask. One row per
    * (pack × conversation × turn) overlap: `(pack_id, conv_id,
    * turn_idx, role, seg_start, seg_end, trainable)` with `[seg_start,
    * seg_end)` in CONVERSATION-LOCAL token coordinates — a trainer
    * assembles pack `p` by concatenating its conversations' id slices
    * in conv order (the [[Packing]] contract) and the mask segments
    * line up by construction.
    *
    * Takes the SPANS frame ([[turnSpansByCount]] output). Per-conv
    * totals derive from the spans (max tok_end — one partial agg);
    * packing is the two-pass distributed prefix sum; the segment
    * emission is one equi-join on conv_id followed by map-only interval
    * intersection. Empty turns (tok_start == tok_end) emit nothing. */
  def maskedPackSegments(spans: DataFrame, budget: Int,
      buckets: Int = 0, tokenOffset: Long = 0L): DataFrame = {
    val totals = spans.groupBy("conv_id")
      .agg(max("tok_end").as("n_tok"))
    val packs = Packing.packAssignmentsByCount(totals, "conv_id", "n_tok",
        budget, buckets, tokenOffset)
      .withColumnRenamed("doc_id", "conv_id")
      .withColumnRenamed("tok_start", "p_start")
      .withColumnRenamed("tok_end", "p_end")
    packs.join(spans, "conv_id")
      .select(col("pack_id"), col("conv_id"), col("turn_idx"), col("role"),
        greatest(col("p_start"), col("tok_start")).as("seg_start"),
        least(col("p_end"), col("tok_end")).as("seg_end"),
        col("trainable"))
      .filter(col("seg_end") > col("seg_start"))
  }

  /** [[maskedPackSegments]] over the WHOLE-conversation packer: each
    * conversation lands in exactly one pack ([[Packing.packWholeDocs]]
    * next-fit — no straddling, the remainder pads), so the mask
    * segments ARE the turn spans with their pack id attached. Same
    * output shape as [[maskedPackSegments]] (`pack_id, conv_id,
    * turn_idx, role, seg_start, seg_end, trainable`), interchangeable
    * downstream; the trade is pad waste for never training on half an
    * answer. Conversations longer than `budget` reject loudly (split
    * them upstream or raise the budget). Pack fill — and hence pad
    * waste `budget - fill` — is one groupBy over the output. */
  def maskedPackWhole(spans: DataFrame, budget: Int,
      buckets: Int = 0): DataFrame = {
    val totals = spans.groupBy("conv_id").agg(max("tok_end").as("n_tok"))
    val packs = Packing.packWholeDocs(totals, "conv_id", "n_tok", budget,
        buckets)
      .withColumnRenamed("doc_id", "conv_id")
      .select("conv_id", "pack_id")
    packs.join(spans, "conv_id")
      .select(col("pack_id"), col("conv_id"), col("turn_idx"), col("role"),
        col("tok_start").as("seg_start"), col("tok_end").as("seg_end"),
        col("trainable"))
  }

  /** Conversation dedup at the granularity that matters for SFT: the
    * ASSISTANT side. `(conv_id, fp, keep)` — `fp` is the MD5 of the
    * assistant turns' contents joined in turn order (user phrasing is
    * free to vary; a duplicated answer set is the duplicate), `keep`
    * marks the lowest conv_id per fingerprint (keep-first, the
    * [[Dedup.exact]] tiebreak). Conversations with NO assistant turn
    * fingerprint the empty string and dedup among themselves — they
    * carry no training signal, so collapsing them is correct.
    *
    * Two exchanges: the per-conversation fingerprint aggregate, then
    * the per-fingerprint min — both partial-agg'd. */
  def assistantDedup(turns: DataFrame, convCol: String,
      turnIdxCol: String, roleCol: String, contentCol: String): DataFrame = {
    val fp = assistantFingerprints(turns, convCol, turnIdxCol, roleCol,
      contentCol)
    val first = fp.groupBy("fp").agg(min("conv_id").as("__keep_id"))
    fp.join(first, "fp")
      .select(col("conv_id"), col("fp"),
        (col("conv_id") === col("__keep_id")).as("keep"))
  }

  /** One `(conv_id, fp)` row per conversation — the assistant-side
    * fingerprint [[assistantDedup]] keys on, and the rows an incremental
    * pipeline APPENDS to its persisted dedup history after each batch
    * (16 B + hash per conversation — an index, never the turns). Persist
    * under the [[graft.state.HistoryFormat.SftAssistantFp]] marker: the
    * fingerprint derivation (assistant contents, turn order, newline
    * join, MD5) is a FORMAT — derived differently, every stored key
    * silently stops matching. */
  def assistantFingerprints(turns: DataFrame, convCol: String,
      turnIdxCol: String, roleCol: String, contentCol: String): DataFrame =
    turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(collect_list(when(col(roleCol) === "assistant",
        struct(col(turnIdxCol).cast("long").as("i"),
          col(contentCol).as("c")))).as("ts"))
      .select(col("conv_id"), TextFunctions.fingerprint(
        array_join(transform(array_sort(col("ts")), t => t.getField("c")),
          "\n")).as("fp"))

  /** Cross-batch [[assistantDedup]]: `keep` additionally requires the
    * answer-set fingerprint to be NOVEL against the accumulated history
    * of prior batches' fingerprints (any column set containing `fp`).
    * In-batch duplicates still collapse keep-first; a history hit drops
    * the whole fingerprint class. The probe is one anti-join on the
    * 16-byte key — prior batches' turns are never touched (the
    * fingerprint-history discipline of [[Dedup]]'s exact family). */
  def assistantDedupAgainstHistory(turns: DataFrame, convCol: String,
      turnIdxCol: String, roleCol: String, contentCol: String,
      history: DataFrame): DataFrame = {
    val batch = assistantDedup(turns, convCol, turnIdxCol, roleCol,
      contentCol)
    val seen = history.select(col("fp")).distinct()
      .withColumn("__seen", lit(true))
    batch.join(seen, Seq("fp"), "left")
      .select(col("conv_id"), col("fp"),
        (col("keep") && coalesce(col("__seen"), lit(false)) === false)
          .as("keep"))
  }

  /** [[assistantDedupAgainstHistory]] reading the persisted index from
    * its table directory — validates the
    * [[graft.state.HistoryFormat.SftAssistantFp]] marker BEFORE any
    * probe, so a stale-format index refuses from the operator with the
    * rebuild remedy named. The DataFrame overload cannot know the
    * table's directory; there the CALLER owns the marker check. */
  def assistantDedupAgainstHistoryTable(turns: DataFrame, convCol: String,
      turnIdxCol: String, roleCol: String, contentCol: String,
      historyDir: String): DataFrame =
    assistantDedupAgainstHistory(turns, convCol, turnIdxCol, roleCol,
      contentCol,
      graft.state.HistoryTables.readChecked(turns.sparkSession, historyDir,
        graft.state.HistoryFormat.SftAssistantFp))

  /** Split over-budget conversations at TURN boundaries: greedy
    * next-fit over each conversation's turns in turn order — a turn
    * that would push the running sub-conversation past `budget` starts
    * a new one. `(conv_id, turn_idx, sub_id)`: recombine as
    * `(conv_id, sub_id)` sub-conversations and [[packWholeDocs]]'s
    * oversize rejection can no longer fire (unless a SINGLE turn
    * exceeds the budget — such a turn still gets its own sub, since
    * splitting below turn granularity would cut an answer mid-stream;
    * truncate or chunk those upstream).
    *
    * One partial-agg'd exchange; the fold runs INSIDE each collected
    * conversation as a codegen'd `aggregate` HOF over tens of turns —
    * per-conversation sequential is free parallelism, unlike the
    * corpus-level fold [[Packing.packWholeDocs]] has to bucket. */
  def splitConversations(turns: DataFrame, convCol: String,
      turnIdxCol: String, countCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val init = struct(lit(0L).as("fill"), lit(0L).as("sub"),
      array().cast("array<struct<i:bigint,sub:bigint>>").as("out"))
    val folded = aggregate(
      array_sort(col("ts")), init,
      (acc, t) => {
        val overflow = (acc.getField("fill") + t.getField("n") > budget) &&
          acc.getField("fill") > 0
        val sub = when(overflow, acc.getField("sub") + 1)
          .otherwise(acc.getField("sub"))
        val fill = when(overflow, t.getField("n"))
          .otherwise(acc.getField("fill") + t.getField("n"))
        struct(fill.as("fill"), sub.as("sub"),
          concat(acc.getField("out"),
            array(struct(t.getField("i").as("i"), sub.as("sub"))))
            .as("out"))
      },
      acc => acc.getField("out"))
    turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(collect_list(struct(col(turnIdxCol).cast("long").as("i"),
        col(countCol).cast("long").as("n"))).as("ts"))
      .select(col("conv_id"), explode(folded).as("t"))
      .select(col("conv_id"), col("t.i").as("turn_idx"),
        col("t.sub").as("sub_id"))
  }

  /** Preference-pair (RLHF/DPO) data QC — per-pair audit flags for the
    * three measurable ways a preference set rots: DEGENERATE pairs
    * (chosen == rejected: zero preference signal, a DPO gradient of
    * noise), DUPLICATED prompts (the same prompt judged twice
    * over-weights its preference and leaks across splits), and LENGTH
    * BIAS (annotators prefer longer; a model trained on it learns
    * verbosity — the best-documented preference artifact, the reason
    * length-controlled evals exist). Input: one row per pair
    * `(pair_id, prompt, chosen, rejected)`.
    *
    * Output per pair: token counts both sides, `len_gap`,
    * `degenerate`, `chosen_longer`, and `prompt_dup` (not the first
    * pair_id carrying this prompt). Map-only plus one per-prompt min —
    * a single partial-agg'd exchange on the prompt key. */
  def preferenceAudit(pairs: DataFrame, pairIdCol: String,
      promptCol: String, chosenCol: String, rejectedCol: String): DataFrame = {
    val base = pairs.select(col(pairIdCol).cast("long").as("pair_id"),
        col(promptCol).as("__p"), col(chosenCol).as("__c"),
        col(rejectedCol).as("__r"))
      .withColumn("chosen_tok", size(split(col("__c"), " ")).cast("long"))
      .withColumn("rejected_tok", size(split(col("__r"), " ")).cast("long"))
    val firstPrompt = base.groupBy("__p").agg(min("pair_id").as("__first"))
    base.join(firstPrompt, "__p")
      .select(col("pair_id"), col("chosen_tok"), col("rejected_tok"),
        (col("chosen_tok") - col("rejected_tok")).as("len_gap"),
        (col("__c") === col("__r")).as("degenerate"),
        (col("chosen_tok") > col("rejected_tok")).as("chosen_longer"),
        (col("pair_id") =!= col("__first")).as("prompt_dup"))
  }

  /** One `(pair_id, fp)` row per preference pair — the prompt
    * fingerprint (MD5 over the raw prompt, the exact-equality key
    * [[preferenceAudit]]'s `prompt_dup` flags on) an incremental
    * preference pipeline APPENDS to its history after each batch.
    * Persist under the [[graft.state.HistoryFormat.PrefPromptFp]]
    * marker. Normalize upstream if near-identical prompts should
    * collapse — the fingerprint is deliberately exact (a reworded
    * prompt is a DIFFERENT preference context; collapsing it would
    * throw away signal, the opposite failure). */
  def promptFingerprints(pairs: DataFrame, pairIdCol: String,
      promptCol: String): DataFrame =
    pairs.select(col(pairIdCol).cast("long").as("pair_id"),
      graft.functions.TextFunctions.fingerprint(col(promptCol)).as("fp"))

  /** Cross-batch prompt dedup for preference (RLHF/DPO) sets: the same
    * prompt judged in an EARLIER batch over-weights its preference and
    * leaks across epochs exactly like an in-batch dup — `keep` marks
    * the lowest pair_id per NOVEL prompt fingerprint (in-batch
    * keep-first AND not in `history`). One partial-agg'd exchange plus
    * an 16-byte-key left join — prior batches' texts are never
    * touched. */
  def promptDedupAgainstHistory(pairs: DataFrame, pairIdCol: String,
      promptCol: String, history: DataFrame): DataFrame = {
    val fp = promptFingerprints(pairs, pairIdCol, promptCol)
    val first = fp.groupBy("fp").agg(min("pair_id").as("__keep_id"))
    val seen = history.select(col("fp")).distinct()
      .withColumn("__seen", lit(true))
    fp.join(first, "fp").join(seen, Seq("fp"), "left")
      .select(col("pair_id"), col("fp"),
        (col("pair_id") === col("__keep_id") &&
          coalesce(col("__seen"), lit(false)) === false).as("keep"))
  }

  /** [[promptDedupAgainstHistory]] reading the persisted history from
    * its table directory — validates the
    * [[graft.state.HistoryFormat.PrefPromptFp]] marker BEFORE any
    * probe. The DataFrame overload cannot know the table's directory;
    * there the CALLER owns the marker check. */
  def promptDedupAgainstHistoryTable(pairs: DataFrame, pairIdCol: String,
      promptCol: String, historyDir: String): DataFrame =
    promptDedupAgainstHistory(pairs, pairIdCol, promptCol,
      graft.state.HistoryTables.readChecked(pairs.sparkSession, historyDir,
        graft.state.HistoryFormat.PrefPromptFp))

  /** Reward-proxy margin audit: score BOTH sides of each preference
    * pair under a persisted [[QualityClf]] model and report the margin
    * — `(pair_id, chosen_score, rejected_score, margin, inverted)`.
    * `inverted` pairs (the scorer prefers the REJECTED side) are the
    * label-noise candidates a preference pipeline routes to re-review,
    * and the inverted share is the agreement rate between annotators
    * and the learned quality signal. Map-only: two scoring expressions
    * fused into the scan, weights plan literals, zero exchanges. */
  def preferenceMargin(pairs: DataFrame, pairIdCol: String,
      chosenCol: String, rejectedCol: String,
      model: QualityClf.Model): DataFrame =
    pairs.select(col(pairIdCol).cast("long").as("pair_id"),
        QualityClf.scoreCol(col(chosenCol), model).as("chosen_score"),
        QualityClf.scoreCol(col(rejectedCol), model).as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .withColumn("inverted", col("margin") < 0)

  /** One-row corpus roll-up of [[preferenceAudit]]: pair count, the two
    * defect counts, the length-bias rate (`chosen_longer_frac` — 0.5 is
    * unbiased; real human-pref sets run 0.6–0.7), and the mean token
    * gap. The fractions divide exact integer sums once, so both engines
    * land on the same double. */
  def preferenceReport(pairs: DataFrame, pairIdCol: String,
      promptCol: String, chosenCol: String, rejectedCol: String): DataFrame =
    preferenceAudit(pairs, pairIdCol, promptCol, chosenCol, rejectedCol)
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("degenerate"), 1L).otherwise(0L)), lit(0L))
          .as("n_degenerate"),
        coalesce(sum(when(col("prompt_dup"), 1L).otherwise(0L)), lit(0L))
          .as("n_prompt_dup"),
        round(coalesce(sum(when(col("chosen_longer"), 1L).otherwise(0L)),
          lit(0L)).cast("double") / greatest(count(lit(1)), lit(1L)), 4)
          .as("chosen_longer_frac"),
        round(coalesce(sum(col("len_gap")), lit(0L)).cast("double") /
          greatest(count(lit(1)), lit(1L)), 4).as("mean_len_gap"))

  /** Sliding token windows over each document — the chunking step of an
    * embedding/retrieval pipeline (a 100k-token document embeds as
    * many window-sized passages, not one vector). `(doc_id, chunk_id,
    * tok_start, tok_end)`: chunk `i` starts at `i * stride`, except the
    * LAST chunk is right-aligned to end exactly at the document's end —
    * every chunk is exactly `window` tokens unless the whole document
    * is shorter (no runt tails, the property an embedding model wants).
    * Zero-token documents emit nothing.
    *
    * `countCol` is the precomputed per-document token count (the
    * by-count discipline — BPE or whitespace, caller's id space).
    * Map-only: one `sequence` explode, no exchange. */
  def chunkWindows(df: DataFrame, idCol: String, countCol: String,
      window: Int, stride: Int): DataFrame =
    chunkCounts(df, idCol, col(countCol), window, stride)
      .select(col("doc_id"), col("chunk_id"), col("tok_start"), col("tok_end"))

  /** [[chunkWindows]] over whitespace tokens, with the chunk TEXT
    * materialized — the form a retrieval indexer ingests directly:
    * `(doc_id, chunk_id, tok_start, tok_end, chunk)`. Map-only (the
    * token array splits, slices, and rejoins inside one projection —
    * the document never joins back to its own chunks). */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame =
    chunkCounts(
      df.select(col(idCol), split(col(textCol), " ").as("__ws")),
      idCol, size(col("__ws")), window, stride)
      .select(col("doc_id"), col("chunk_id"), col("tok_start"), col("tok_end"),
        array_join(slice(col("__ws"), col("tok_start").cast("int") + 1,
          (col("tok_end") - col("tok_start")).cast("int")), " ").as("chunk"))

  private def chunkCounts(df: DataFrame, idCol: String, countExpr: Column,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val n = countExpr.cast("long")
    // chunk count: 1 when the doc fits one window, else
    // ceil((n - window) / stride) + 1 — integral throughout (`div`),
    // exact past 2^53 tokens
    df.filter(n > 0)
      .withColumn("__n", n)
      .withColumn("__nc", when(n <= window, lit(1L))
        .otherwise(expr(s"(__n - $window + ${stride - 1}) div $stride") + 1L))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__nc") - 1)))
      .withColumn("tok_start",
        least(col("chunk_id") * stride, greatest(col("__n") - window, lit(0L))))
      .withColumn("tok_end",
        least(col("tok_start") + window, col("__n")))
      .withColumn("doc_id", col(idCol))
  }

  /** Best-of-n rejection sampling (Llama-2-style RLHF data step /
    * constitutional self-improvement loops): a generator emitted `n`
    * candidate responses per prompt; keep the one a deployed
    * [[QualityClf]] scorer ranks highest, and report how decisive the
    * pick was. One row per prompt:
    * `(prompt_id, best_cand_id, best_score, runner_up_score, margin,
    * n_cands)` — `margin = best - runner_up` (0 for single-candidate
    * prompts: a walkover, not a strong preference), the number a
    * downstream filter thresholds on (margin ≈ 0 means the scorer
    * couldn't tell the candidates apart and the "win" is noise).
    *
    * Determinism: scores are exact integers ([[QualityClf.scoreCol]]);
    * the argmax orders by (score DESC, cand_id ASC) — total. Scale
    * shape: scoring fuses into the scan (weights are plan literals,
    * zero exchanges before the prompt key); the ordered rank window is
    * genuinely map-side trimmed to 2 rows per group by WindowGroupLimit
    * because `n_cands` comes from a separate partial-agg'd count joined
    * back on the prompt — an unordered `count(*) over` in the same
    * projection would force the full group to materialize and defeat
    * the trim. Both exchanges key on the prompt, so AQE/exchange reuse
    * co-partitions the join. */
  def bestOfN(cands: DataFrame, promptCol: String, candIdCol: String,
      textCol: String, model: QualityClf.Model): DataFrame = {
    val scored = cands.select(
      col(promptCol).cast("long").as("prompt_id"),
      col(candIdCol).cast("long").as("cand_id"),
      QualityClf.scoreCol(col(textCol), model).as("score"))
    val counts = scored.groupBy("prompt_id")
      .agg(count(lit(1)).as("n_cands"))
    val wRank = Window.partitionBy("prompt_id")
      .orderBy(col("score").desc, col("cand_id").asc)
    scored
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 2)
      .groupBy("prompt_id")
      .agg(max(when(col("rnk") === 1, col("cand_id"))).as("best_cand_id"),
        max(when(col("rnk") === 1, col("score"))).as("best_score"),
        max(when(col("rnk") === 2, col("score"))).as("runner_up_score"))
      .join(counts, Seq("prompt_id"))
      .select(col("prompt_id"), col("best_cand_id"), col("best_score"),
        coalesce(col("runner_up_score"), col("best_score"))
          .as("runner_up_score"),
        (col("best_score") - coalesce(col("runner_up_score"),
          col("best_score"))).as("margin"),
        col("n_cands"))
  }

  /** Group-relative advantage (the GRPO normalization, Shao et al.
    * 2402.03300 §4.1): each candidate's reward is centered and scaled
    * WITHIN its prompt group — `adv = (score - mean_g) / std_g` — so a
    * prompt whose candidates all score high contributes the same
    * gradient scale as one whose candidates all score low. Scores come
    * from a deployed [[QualityClf]] (exact integers), so the group sums
    * `Σs`/`Σs²` are exact longs and mean/std/adv are ONE double tree per
    * row — engine-replayable bit-for-bit. Population std (divide by n,
    * the GRPO convention); a zero-variance group (all candidates equal)
    * emits adv 0 for every member, never NULL/NaN.
    *
    * Scale shape: scoring fuses into the scan; the group moments are
    * window aggregates over prompt-bounded groups (n candidates per
    * prompt — generator-bounded, single digits to dozens), ONE exchange
    * keyed on the prompt. `Σs²` wraps 64-bit only past |score| ~3e9·√n —
    * three orders above any real hashed-feature model's range. */
  def groupAdvantage(cands: DataFrame, promptCol: String, candIdCol: String,
      textCol: String, model: QualityClf.Model): DataFrame = {
    val w = Window.partitionBy("prompt_id")
    val scored = cands.select(
      col(promptCol).cast("long").as("prompt_id"),
      col(candIdCol).cast("long").as("cand_id"),
      QualityClf.scoreCol(col(textCol), model).as("score"))
    val nD = col("__n").cast("double")
    val mean = col("__s1").cast("double") / nD
    val vr = col("__s2").cast("double") / nD - mean * mean
    scored
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s1", sum(col("score")).over(w))
      .withColumn("__s2", sum(col("score") * col("score")).over(w))
      .select(col("prompt_id"), col("cand_id"), col("score"),
        col("__n").as("group_n"),
        round(mean, 4).as("group_mean"),
        when(vr > 0d,
          round((col("score").cast("double") - mean) / sqrt(vr), 6))
          .otherwise(lit(0d)).as("advantage"))
  }
}

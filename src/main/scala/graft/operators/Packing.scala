package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: the corpus's token stream, in
  * `idCol` order, cut into consecutive fixed-`budget` packs
  * (concatenate-then-chunk — the GPT-style packing that wastes no pad
  * tokens; documents may straddle pack boundaries). Emits one row per
  * (document × pack) segment, so a trainer can assemble pack `p` by
  * concatenating `tokens[tok_start, tok_end)` of its member docs in
  * doc order.
  *
  * The interesting part at 100 TB is the GLOBAL PREFIX SUM of document
  * token counts. A corpus-wide `sum().over(Window.orderBy(id))` is one
  * unsplittable task holding the entire corpus — the exact shape this
  * library's plan gates exist to forbid. Instead, the classic two-pass
  * distributed scan:
  *  1. order-preserving bucket ids from `approxQuantile` over `idCol`
  *     (deterministic — unlike `repartitionByRange`, whose sampled
  *     boundaries change per execution and would let the offset pass
  *     and the main pass disagree);
  *  2. per-bucket token totals via `groupBy(pid).agg(sum)` — partial
  *     aggregation, collected to the driver at O(#buckets) (bounded:
  *     buckets ~ shuffle partitions, kilobytes even at cluster scale);
  *  3. exclusive bucket offsets broadcast back as a map literal; the
  *     within-bucket running sum is a window partitioned by `pid` —
  *     each window partition is one count-balanced bucket, never the
  *     corpus.
  * Two eager jobs (quantiles, bucket sums) run at call time; the
  * returned frame is lazy. Segment emission is a map-only explode.
  *
  * Output is independent of bucketing (a prefix sum in id order is
  * well-defined regardless of partition boundaries), so the DuckDB
  * oracle can replay it with a plain ordered window at test scale. */
object Packing {

  /** `(doc_id, pack_id, tok_start, tok_end)`: document `doc_id`
    * contributes its tokens `[tok_start, tok_end)` (0-based, half-open)
    * to pack `pack_id`. Every pack holds exactly `budget` tokens except
    * the last. Docs tokenize by `delim`; empty docs contribute their
    * single empty token like the tokenizer family does.
    *
    * `idCol` values must be UNIQUE: the stream position of a document is
    * its rank in id order, and tied ids would share one running-sum
    * value (a RANGE-frame window), producing overlapping packs. Dedup
    * first ([[Dedup.exact]]) if ids can repeat.
    *
    * `tokenOffset` makes packing INCREMENTAL: pass the cumulative token
    * count of every prior batch and this batch's stream continues where
    * the last ended — pack ids are global, and the boundary pack is
    * shared between the batches exactly as a one-shot run would fill it
    * (the per-batch state to persist, e.g. in [[graft.state.JobState]],
    * is one long: offset + this batch's token total). */
  def packAssignments(df: DataFrame, idCol: String, textCol: String,
      budget: Int, delim: String = " ", buckets: Int = 0,
      tokenOffset: Long = 0L): DataFrame =
    packCounts(df, idCol,
      size(split(col(textCol), delim)).cast("long"), budget, buckets,
      tokenOffset)

  /** [[packAssignments]] over a PRECOMPUTED per-document token count —
    * the entry point for packing in a learned-tokenizer id space (BPE
    * subword counts differ from whitespace counts, and the pack
    * boundaries must be cut where the ids actually are:
    * `packAssignmentsByCount(Bpe.encode(...), id, "n_tokens", B)`).
    * Zero-count documents contribute no segments. */
  def packAssignmentsByCount(df: DataFrame, idCol: String,
      countCol: String, budget: Int, buckets: Int = 0,
      tokenOffset: Long = 0L): DataFrame =
    packCounts(df, idCol, col(countCol).cast("long"), budget, buckets,
      tokenOffset)

  /** Whole-document (next-fit) packing: documents NEVER straddle pack
    * boundaries — each pack holds whole documents up to `budget` tokens
    * and pads the remainder. The shape masked/SFT exports prefer (a
    * conversation split across two sequences trains on half an answer);
    * [[packAssignments]]' concatenate-then-chunk trades the opposite
    * way (zero pad waste, docs may straddle). Next-fit in id order: a
    * document that would overflow the current pack's remaining space
    * starts a new pack. Docs longer than `budget` REJECT loudly —
    * truncate or chunk ([[Sft.chunkWindows]]) first; zero-count docs
    * emit nothing (the [[packAssignments]] convention).
    *
    * Output `(doc_id, pack_id, n_tok)` — one row per document (whole,
    * by construction). Pack fill/waste is one groupBy over the output.
    *
    * Scale shape: the next-fit fold is NON-ASSOCIATIVE (each decision
    * depends on the running fill), so it cannot be a window or prefix
    * sum. Instead the [[packCounts]] bucket discipline: deterministic
    * `approxQuantile` id cuts, then ONE sorted sequential fold per
    * bucket (`mapPartitions` — the genuine per-partition imperative
    * case this library reserves it for). Buckets are independent, so
    * the fold parallelizes to #buckets tasks; the cost of that
    * independence is at most one partially-filled pack per bucket seam
    * — the same boundary an incremental per-batch run has anyway. Pack
    * ids are `bucket << 40 | seq` — globally unique, ordered within a
    * bucket, NOT dense across buckets (a pack id is a name, not an
    * index). Waste bound per bucket: every pack except its last closed
    * only because the next doc overflowed, so its fill exceeds
    * `budget - max(n_tok)`.
    *
    * With `buckets = 1` the fold is the exact textbook next-fit over
    * the whole corpus in id order — the form the DuckDB oracle replays
    * with a recursive CTE; a suite law pins multi-bucket output to the
    * per-bucket-slice composition of single-bucket runs. */
  def packWholeDocs(df: DataFrame, idCol: String, countCol: String,
      budget: Int, buckets: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType],
      s"packWholeDocs needs a numeric id column; '$idCol' is " +
      s"${df.schema(idCol).dataType.simpleString}")
    val spark = df.sparkSession
    import spark.implicits._
    val nBuckets = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val counts = df.select(col(idCol).cast("long").as("doc_id"),
      col(countCol).cast("long").as("n_tok")).filter(col("n_tok") > 0)
    val bounds =
      if (nBuckets <= 1) Array.empty[Long]
      else counts.stat.approxQuantile("doc_id",
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
        .map(_.toLong).distinct.sorted
    val pid =
      if (bounds.isEmpty) lit(0)
      else aggregate(typedlit(bounds.toSeq), lit(0),
        (acc, b) => acc + when(col("doc_id") > b, 1).otherwise(0))
    counts.withColumn("pid", pid.cast("int"))
      .select(col("pid"), col("doc_id"), col("n_tok"))
      .repartition(col("pid"))
      .sortWithinPartitions("pid", "doc_id")
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        // several buckets can hash to one partition; rows arrive
        // grouped by pid ascending, so the fold resets at each seam
        var curPid = Int.MinValue
        var fill = 0L
        var seq = -1L
        it.map { case (p, id, n) =>
          if (n > budget) throw new IllegalArgumentException(
            s"doc $id has $n tokens > budget $budget — packWholeDocs " +
              "never splits a document; chunk or truncate oversize docs " +
              "first (Sft.chunkWindows)")
          if (p != curPid) { curPid = p; fill = 0L; seq = -1L }
          if (seq < 0L || fill + n > budget) { seq += 1L; fill = n }
          else fill += n
          (id, (p.toLong << 40) | seq, n)
        }
      }
      .toDF("doc_id", "pack_id", "n_tok")
  }

  /** Packing-efficiency report over a [[packWholeDocs]] assignment —
    * the QC number the pad-waste trade ships with: one row of corpus
    * totals (`n_packs, n_docs, n_tokens, pad_tokens, utilization,
    * min_fill, max_fill, full_packs`). `utilization` is real tokens
    * over `n_packs * budget` capacity — the fraction of the training
    * batch that is content rather than padding (next-fit's whole cost
    * vs the chunking packer is visible here, and a utilization drop
    * between exports flags a length-distribution shift long before a
    * loss curve does). Two partial-agg'd exchanges (per-pack fill,
    * then one global row); fractions divide exact integer sums once.
    * Empty input reads as zeros, not nulls. */
  def packReport(packs: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packs.groupBy("pack_id")
      .agg(sum(col("n_tok")).as("fill"), count(lit(1)).as("nd"))
      .agg(count(lit(1)).as("n_packs"),
        coalesce(sum("nd"), lit(0L)).as("n_docs"),
        coalesce(sum("fill"), lit(0L)).as("n_tokens"),
        (count(lit(1)) * budget - coalesce(sum("fill"), lit(0L)))
          .as("pad_tokens"),
        round(coalesce(sum("fill"), lit(0L)).cast("double") /
          greatest(count(lit(1)) * budget, lit(1L)), 4).as("utilization"),
        coalesce(min("fill"), lit(0L)).as("min_fill"),
        coalesce(max("fill"), lit(0L)).as("max_fill"),
        coalesce(sum(when(col("fill") === budget, 1L).otherwise(0L)),
          lit(0L)).as("full_packs"))
  }

  private def packCounts(df: DataFrame, idCol: String, countExpr:
      org.apache.spark.sql.Column, budget: Int, buckets: Int,
      tokenOffset: Long): DataFrame = {
    require(tokenOffset >= 0, s"tokenOffset must be >= 0, got $tokenOffset")
    require(budget > 0, s"budget must be positive, got $budget")
    require(df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType],
      s"packAssignments needs a numeric id column; '$idCol' is " +
      s"${df.schema(idCol).dataType.simpleString} (a non-numeric cast " +
      "would null out doc_id, desync the quantile bounds, and silently " +
      "drop rows from the pack stream)")
    val spark = df.sparkSession
    val nBuckets = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val counts = df.select(col(idCol).cast("long").as("doc_id"),
      countExpr.as("n_tok"))
    // order-preserving, count-balanced, DETERMINISTIC bucket boundaries
    val bounds =
      if (nBuckets <= 1) Array.empty[Long]
      else counts.stat.approxQuantile("doc_id",
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
        .map(_.toLong).distinct.sorted
    // pid = #boundaries strictly below doc_id — a codegen'd HOF fold,
    // no join, no udf. Linear in #buckets per row, which is noise next
    // to tokenizing the same row: buckets only need each bucket's DOC
    // COUNT to fit one window task (rows here are (doc_id, n_tok)
    // pairs, ~24 bytes each), so even a 10^10-doc corpus needs only
    // ~10^4 buckets => ~10^4 long-compares per row
    val pid =
      if (bounds.isEmpty) lit(0)
      else aggregate(typedlit(bounds.toSeq), lit(0),
        (acc, b) => acc + when(col("doc_id") > b, 1).otherwise(0))
    val withPid = counts.withColumn("pid", pid)
    // bucket totals: partial agg, O(#buckets) driver rows
    val perPid = withPid.groupBy("pid").agg(sum("n_tok").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = perPid
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (p, s)) => (p, acc + s) }
      .sliding(2).collect { case Array((_, acc), (p, _)) => p -> acc }
      .toMap
    val run = sum(col("n_tok"))
      .over(Window.partitionBy("pid").orderBy("doc_id"))
    val withStart = withPid
      .withColumn("gstart", run - col("n_tok") + lit(tokenOffset) +
        coalesce(element_at(typedlit(offsets), col("pid")), lit(0L)))
    // a doc starting at gstart spans packs gstart/B .. (gstart+n-1)/B;
    // `div` keeps the arithmetic integral (floor(x/y) on doubles loses
    // exactness past 2^53 tokens)
    withStart.filter(col("n_tok") > 0)
      .withColumn("pack_id",
        explode(sequence(expr(s"gstart div $budget"),
          expr(s"(gstart + n_tok - 1) div $budget"))))
      .select(col("doc_id"), col("pack_id"),
        greatest(col("pack_id") * budget - col("gstart"), lit(0L))
          .as("tok_start"),
        least((col("pack_id") + 1) * budget - col("gstart"), col("n_tok"))
          .as("tok_end"))
  }
}

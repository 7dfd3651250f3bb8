package graft.operators

import graft.functions.TextFunctions.wordShingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level repetition metrics in the style of the Gopher quality
  * rules (Rae et al. 2021, "Scaling Language Models", table A1): natural
  * text keeps its n-gram mass spread out, while boilerplate and
  * degenerate generations concentrate it — `top_bigram_frac` (share of
  * bigram occurrences taken by the single most frequent bigram) and
  * `dup_trigram_frac` (share of trigram occurrences that are repeats)
  * are the classic cutoffs a pretraining pipeline filters on.
  *
  * Scale shape: explode → two-level aggregation keyed by (doc, gram) then
  * doc — partial aggregation combines map-side, nothing is quadratic, and
  * the metrics join back on the doc key. Word shingling is the codegen'd
  * [[graft.functions.WordShinglesExpr]] (short docs collapse to a
  * whole-text shingle, mirrored exactly by the ANSI oracle).
  */
object TextQuality {
  /** Token-window CHUNKING — the packing step that turns curated
    * documents into fixed-size training windows: each document splits
    * into `window`-token chunks starting every `window - overlap` tokens
    * (the trailing chunk may be shorter; a doc shorter than one window
    * yields itself). Pure built-ins (`transform`/`sequence`/`slice` +
    * `posexplode`), fully inside codegen, no shuffle — at 100 TB this is
    * a map-only pass. Returns (id, chunk_idx, chunk_text, n_tokens). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("ts"))
      .withColumn("n_chunks",
        greatest(lit(1L), ceil((size(col("ts")) - lit(overlap)) /
          lit(stride.toDouble)).cast("long")))
      .select(col("id"),
        posexplode(transform(sequence(lit(0L), col("n_chunks") - 1),
          i => concat_ws(" ", slice(col("ts"), (i * stride + 1).cast("int"),
            lit(window))))).as(Seq("chunk_idx", "chunk_text")))
      // long-typed ordinals/counts (ANSI oracle parity: BIGINT)
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_tokens"))
  }

  /** (id, top_bigram_frac, dup_trigram_frac), both rounded to 4. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    def fracs(n: Int) = base
      .select(col("id"), explode(wordShingles(col("text"), n)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id")
    val top = fracs(2).agg(
      round(max(col("c")).cast("double") / sum(col("c")), 4)
        .as("top_bigram_frac"))
    val dup = fracs(3).agg(
      round(lit(1.0) - count(lit(1)).cast("double") / sum(col("c")), 4)
        .as("dup_trigram_frac"))
    top.join(dup, Seq("id"))
  }
}

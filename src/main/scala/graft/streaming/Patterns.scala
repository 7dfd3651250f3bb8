package graft.streaming

import graft.state.JobState
import graft.util.Jsons
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-level helpers for the cross-batch streaming patterns the
  * reference ships as examples (`examples/advanced-patterns/`): state-backed
  * watermarking, cross-batch dedup, and incremental aggregation. These are
  * the micro-batch (explicit-state) analogues of Structured Streaming's
  * `withWatermark` / `dropDuplicates` / stateful aggregation, built on
  * [[JobState]] so state is inspectable and arbitrarily large (parquet,
  * distributed), not an opaque streaming checkpoint.
  */
object Patterns {

  /** Outcome of a watermark split: rows to process now vs late arrivals. */
  case class WatermarkSplit(onTime: DataFrame, late: DataFrame, watermark: Option[Long])

  /** State-backed watermark (reference `watermarking.py:43-88`):
    * watermark = max(eventTimeCol) seen across batches (persisted in
    * JobState); rows below `watermark - allowedLatenessMs` are split out as
    * late. `eventTimeCol` must be epoch-ms or epoch-ns numeric. */
  def watermarkSplit(df: DataFrame, eventTimeCol: String, allowedLatenessMs: Long,
      state: JobState, stateKey: String = "watermark",
      nanos: Boolean = false): WatermarkSplit = {
    val scale = if (nanos) 1000000L else 1L
    val prior = state.loadValue(stateKey).map(_.toLong)
    val batchMax = df.agg(max(col(eventTimeCol))).head() match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }
    val wm = (prior ++ batchMax).reduceOption(math.max(_: Long, _: Long))
    wm.foreach(w => state.saveValue(stateKey, w.toString))
    wm match {
      case None => WatermarkSplit(df, df.limit(0), None)
      case Some(w) =>
        val cutoff = w - allowedLatenessMs * scale
        WatermarkSplit(
          df.filter(col(eventTimeCol) >= cutoff),
          df.filter(col(eventTimeCol) < cutoff),
          Some(w))
    }
  }

  /** Cross-batch dedup via a parquet state table of seen keys: anti-join
    * the batch against the seen set, then add the batch's keys. The seen
    * set lives as a distributed parquet table — this scales where the
    * reference's JSON id-list would not (noted at SURVEY §2.B). */
  def dedupAcrossBatches(batch: DataFrame, keys: Seq[String],
      state: JobState, stateKey: String = "seen_keys"): DataFrame = {
    val keyCols = keys.map(col)
    // cache + materialize: the returned frame must not re-read the state
    // files its lineage anti-joined, because the swap below replaces them
    val fresh = (state.loadParquet(stateKey) match {
      case None => batch
      case Some(seen) => batch.join(seen, keys, "left_anti")
    }).cache()
    fresh.count()
    val freshKeys = fresh.select(keyCols: _*).distinct()
    val updated = state.loadParquet(stateKey) match {
      case None => freshKeys
      case Some(seen) => seen.unionByName(freshKeys).distinct()
    }
    state.saveParquet(stateKey, updated)
    fresh
  }

  /** Incremental (partial/final) aggregation: per-batch partial aggregates
    * merged with the persisted aggregate table and re-aggregated —
    * the classic two-phase pattern (`incremental_aggregations.py:47-77`).
    * `partial` computes per-batch partials; `merge` combines two partial
    * tables with the same schema. */
  def incrementalAgg(batch: DataFrame, state: JobState, stateKey: String,
      partial: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val batchPartial = partial(batch)
    val merged = (state.loadParquet(stateKey) match {
      case None => batchPartial
      case Some(prior) => merge(prior, batchPartial)
    }).cache()
    // materialize before the swap — the merged plan reads the prior state
    // files, which saveParquet replaces
    merged.count()
    state.saveParquet(stateKey, merged)
    merged
  }
}

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

  /** Watermarked stream-stream interval join (Structured Streaming's
    * stream-stream inner join): both sides declare watermarks, and the
    * join condition carries the event-time interval
    * (`0 <= rightTime - leftTime <= within`), which is what lets the
    * state store EXPIRE buffered rows — without the time bound every
    * left row must be kept forever awaiting a future right match, and
    * state grows unboundedly at stream scale. Works identically on batch
    * frames (watermarks are then no-ops), so the join semantics are
    * oracle-testable on static data. */
  def intervalJoin(
      left: DataFrame, leftTimeCol: String,
      right: DataFrame, rightTimeCol: String,
      keys: Seq[String], within: String,
      leftWatermark: String = "10 minutes",
      rightWatermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTimeCol, leftWatermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTimeCol, rightWatermark) else right
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTimeCol) >= l(leftTimeCol) &&
      r(rightTimeCol) <= l(leftTimeCol) + expr(s"INTERVAL $within")
    l.join(r, cond, joinType)
  }

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
    val seen0 = state.loadParquet(stateKey)
    val fresh = seen0 match {
      case None => batch
      case Some(seen) => batch.join(seen, keys, "left_anti")
    }
    // Materialize through the state store, NOT a cache: the anti-join's
    // lineage reads the seen-keys files the swap below deletes, and a
    // returned cached frame would be (a) leaked into the shared session
    // forever and (b) correctness-load-bearing — an evicted/lost block
    // would recompute against deleted files. A durable last-batch table is
    // bounded (one batch's rows), restart-safe, and inspectable.
    val batchKey = s"${stateKey}__last_batch"
    state.saveParquet(batchKey, fresh)
    val freshDisk = state.loadParquet(batchKey).get
    val updated = seen0 match {
      case None => freshDisk.select(keyCols: _*).distinct()
      case Some(seen) =>
        seen.unionByName(freshDisk.select(keyCols: _*).distinct()).distinct()
    }
    // safe ordering: saveParquet writes to a tmp dir (plan executes while
    // the old files still exist), then swaps
    state.saveParquet(stateKey, updated)
    freshDisk
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
    val merged = state.loadParquet(stateKey) match {
      case None => batchPartial
      case Some(prior) => merge(prior, batchPartial)
    }
    // saveParquet writes to a tmp dir first, so the merge plan executes
    // while the prior state files still exist; the RETURNED frame re-reads
    // the freshly swapped state (it IS the new state) — no cache to leak
    // or to silently recompute against deleted files on eviction
    state.saveParquet(stateKey, merged)
    state.loadParquet(stateKey).get
  }
}

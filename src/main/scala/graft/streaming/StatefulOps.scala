package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig, TimerValues}

/** One key's running accounting after a micro-batch touched it. */
case class RunningTotal(key: String, batchAdd: Long, total: Long)

/** A first-seen row admitted by the TTL dedup gate. */
case class Admitted(key: String, payload: String)

/** Operators on Spark 4's `transformWithState` arbitrary-state API — the
  * successor to `flatMapGroupsWithState` ([[Sessionize]] keeps the
  * classic shape): typed per-key state handles (Value/List/Map), state
  * TTL the old API never had, and the RocksDB state store as the
  * execution substrate. Two library shapes a curation pipeline uses:
  *
  *  - [[StatefulOps.runningTotals]]: per-key cumulative counters in the
  *    STATE STORE — the mix-steering accounting
  *    ([[graft.operators.Mixing.steeredSample]]) keeps the same numbers
  *    in a Delta state table because its consumers are cross-JOB; this
  *    shape is for counters only the stream itself consumes, where the
  *    checkpoint already gives exactly-once for free.
  *  - [[StatefulOps.ttlDedup]]: first-seen admission per key with a
  *    state LIFETIME — after `ttl` with no re-arrival the key's state
  *    expires and the key re-admits. `dropDuplicatesWithinWatermark`
  *    bounds dedup memory by EVENT time; TTL bounds it by PROCESSING
  *    time, which is what retention-policy dedup ("suppress repeats for
  *    24h") actually specifies.
  *
  * Scale: state is O(active keys), hash-partitioned by groupByKey's
  * exchange, RocksDB-backed so it spills past memory; TTL is enforced
  * by the store (expired rows vanish without a timer per key).
  * `transformWithState` requires the RocksDB state store provider —
  * [[graft.GraftSession]] sessions can opt in per query via
  * `spark.sql.streaming.stateStore.providerClass`. */
object StatefulOps {

  private class TotalsProcessor
      extends StatefulProcessor[String, (String, Long), RunningTotal] {
    @transient private var total
        : org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[RunningTotal] = {
      var add = 0L
      rows.foreach(add += _._2)
      val t = (if (total.exists()) total.get() else 0L) + add
      total.update(t)
      Iterator.single(RunningTotal(key, add, t))
    }
  }

  /** Per-key running totals across micro-batches: one
    * [[RunningTotal]] row per (key, batch) with the batch's delta and
    * the all-time cumulative value. Update-mode output. */
  def runningTotals(ds: Dataset[(String, Long)]): Dataset[RunningTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new TotalsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  private class TtlDedupProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, (String, String), Admitted] {
    @transient private var seen
        : org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timers: TimerValues): Iterator[Admitted] = {
      // no refresh on re-arrival: the suppression window is ttl from
      // ADMISSION, not from last sighting — "suppress repeats for 24h"
      // semantics, and a hot key cannot pin its state alive forever
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.next()
        seen.update(1L)
        Iterator.single(Admitted(key, first._2))
      }
    }
  }

  /** First-seen-wins streaming dedup with a state lifetime: across
    * batches a key's state suppresses repeats until `ttl` of processing
    * time passes since ADMISSION, after which the key re-admits. Pass
    * `ttl = null` for never-expiring state (exact all-time first-seen).
    * Within one batch the first iterator row wins — key on a content
    * fingerprint so every suppressed payload is equivalent and the
    * choice cannot matter across retries.
    *
    * Driver note for the TTL mode: TTL forces TimeMode.ProcessingTime,
    * and a ProcessingTime-mode query does NOT self-terminate under
    * `Trigger.AvailableNow` — drive it as a continuous query (or
    * `processAllAvailable()` + `stop()` in tests). The exact mode
    * (`ttl = null`) runs TimeMode.None and drains normally. */
  def ttlDedup(ds: Dataset[(String, String)],
      ttl: java.time.Duration): Dataset[Admitted] = {
    import ds.sparkSession.implicits._
    // TTL is processing-time by definition; state without a lifetime
    // runs in TimeMode.None (the engine refuses a TTL under NoTime)
    val mode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_._1)
      .transformWithState(new TtlDedupProcessor(ttl), mode,
        OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** One keyed event on the stream. */
case class SessionEvent(key: String, ts: Timestamp)

/** Open-session state carried across micro-batches (per key). */
case class SessionState(startMs: Long, lastMs: Long, events: Long)

/** A closed session. */
case class Session(key: String, startMs: Long, endMs: Long, events: Long)

/** Inactivity-gap sessionization — the custom-state streaming operator the
  * DataFrame API can't express (a session window's END depends on data
  * that hasn't arrived yet), built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with event-time
  * timeouts (SURVEY §2 streaming; the Structured Streaming programming
  * guide's arbitrary-stateful-processing shape).
  *
  * A session closes two ways:
  *  - a LATER event for the same key arrives more than `gapMs` after the
  *    session's last event (closed inline, the new event opens the next
  *    session);
  *  - the event-time watermark passes `last + gapMs` with no new events
  *    (closed by timeout — this is why the input must carry
  *    `withWatermark`, which [[Sessionize.sessions]] applies).
  *
  * Scale: state is one 24-byte record per ACTIVE key (not per event);
  * keys partition across executors by groupByKey's hash exchange, and the
  * watermark bounds state lifetime — the canonical shape for billions of
  * keys. Still-open sessions live in the state store until their timeout
  * fires (streaming semantics, not a leak).
  */
object Sessionize {

  /** Sessionize `df`: `keyCol` (any castable-to-string), `tsCol`
    * (timestamp), closing sessions after `gapMs` of inactivity;
    * `watermarkDelay` bounds how late events may arrive. Run the query in
    * append mode. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }

  /** The per-key state transition. Package-visible for direct unit tests. */
  private[graft] def update(gapMs: Long)(key: String,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(key, s.startMs, s.lastMs, s.events))
    } else {
      val ts = events.map(_.ts.getTime).toArray.sorted
      val closed = Seq.newBuilder[Session]
      var cur = state.getOption
      ts.foreach { t =>
        cur match {
          case Some(s) if t <= s.lastMs + gapMs =>
            cur = Some(s.copy(lastMs = math.max(s.lastMs, t), events = s.events + 1))
          case Some(s) =>
            closed += Session(key, s.startMs, s.lastMs, s.events)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.result().iterator
    }
  }
}

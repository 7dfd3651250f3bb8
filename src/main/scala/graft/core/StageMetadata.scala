package graft.core

/** Driver-side metadata sink for operator-internal decisions that a
  * structured observability stream should carry — the bridge between
  * deep library code (which knows WHAT it decided) and the
  * [[graft.Pipeline]] observer (which knows WHICH stage/batch is
  * running).
  *
  * Motivating case: the hash64 layout selector picks narrow vs wide
  * keys per fold from measured volumes. The decision already logs as an
  * `event=hash64_layout` driver-log line, but a production run's
  * STRUCTURED events — `PipelineObserver.onStageEnd` metadata — should
  * explain the plan too, without threading a decision object through
  * every closure between the fold and the driver. Operators [[put]]
  * entries as they decide; the Pipeline drains the buffer at each stage
  * boundary into that stage's `onStageEnd` metadata.
  *
  * Scope and honesty: entries accumulate on the DRIVER (operator
  * decisions are made driver-side — a collect-based measurement, a
  * model fit), keyed per JVM. Attribution is "the stage whose end
  * drains the buffer" — exact under the Pipeline's single-writer,
  * one-batch-at-a-time discipline; two pipelines interleaving in one
  * JVM would cross-attribute entries (the same caveat as any
  * process-global diagnostic channel, documented here rather than
  * hidden). The buffer is bounded: past [[MaxEntries]] the oldest
  * entries drop and a `dropped=<n>` entry records the loss — an
  * unconsumed buffer (no Pipeline running) must never grow without
  * bound under a long driver program. */
object StageMetadata {
  private val MaxEntries = 256
  private val buf =
    new java.util.ArrayDeque[(String, String)]()
  private var droppedCount = 0L

  /** Record one key/value for the next stage-end drain. Repeated keys
    * within one stage get a `#<i>` suffix at drain time (a fold may
    * decide several times per stage). */
  def put(key: String, value: String): Unit = synchronized {
    buf.addLast(key -> value)
    while (buf.size > MaxEntries) { buf.removeFirst(); droppedCount += 1 }
  }

  /** Take everything recorded since the last drain, de-duplicating
    * repeated keys with a stable `#<i>` suffix. Called by the Pipeline
    * at stage end; also usable from tests/demos directly. */
  def drain(): Map[String, String] = synchronized {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    buf.forEach { kv =>
      val (k, v) = kv
      val i = seen.getOrElse(k, 0)
      out(if (i == 0) k else s"$k#$i") = v
      seen(k) = i + 1
    }
    buf.clear()
    if (droppedCount > 0) { out("dropped") = droppedCount.toString; droppedCount = 0 }
    out.toMap
  }
}

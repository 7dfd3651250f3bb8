package graft

import graft.core._
import graft.sources.Source
import graft.state.JobState
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{File, RandomAccessFile}
import java.nio.channels.{FileLock, OverlappingFileLockException}

/** Per-batch context passed explicitly to user stages — the typed
  * replacement for the reference's reflective kwarg injection
  * (`pipeline.py:108-159`; SURVEY §2.A-A12). */
case class BatchContext(
    spark: SparkSession,
    batchId: Long,
    files: Seq[String],
    state: JobState)

/** Observer hooks firing per stage (reference `observability.py:7-75`);
  * analogous in spirit to `StreamingQueryListener` but per-stage. */
trait PipelineObserver {
  def onBatchPlanned(batchId: Long, fileCount: Int, bytes: Long): Unit = {}
  def onStageStart(batchId: Long, stage: String): Unit = {}
  def onStageEnd(batchId: Long, stage: String, durationMs: Long,
      metadata: Map[String, String]): Unit = {}
  def onBatchCommitted(batchId: Long, metadata: Map[String, String]): Unit = {}
  def onError(batchId: Long, stage: String, error: Throwable): Unit = {}
}

/** `key=value` line logger (reference `LoggingObserver`). Values
  * containing spaces, '=', or quotes are double-quoted with inner
  * quotes escaped, so a space-then-first-'=' parser of the line never
  * mistakes a composite value (e.g. a hash64_layout decision) for
  * fabricated top-level keys. */
class LoggingObserver extends PipelineObserver {
  private def log(kv: (String, Any)*): Unit =
    System.err.println("[graft] " + kv.map { case (k, v) =>
      val s = String.valueOf(v)
      val vq =
        if (s.exists(c => c == ' ' || c == '=' || c == '"'))
          "\"" + s.replace("\"", "\\\"") + "\""
        else s
      s"$k=$vq"
    }.mkString(" "))
  override def onBatchPlanned(id: Long, files: Int, bytes: Long): Unit =
    log("event" -> "planned", "batch_id" -> id, "files" -> files, "bytes" -> bytes)
  override def onStageEnd(id: Long, stage: String, ms: Long, md: Map[String, String]): Unit =
    log(Seq[(String, Any)]("event" -> "stage_end", "batch_id" -> id,
      "stage" -> stage, "duration_ms" -> ms) ++ md.toSeq: _*)
  override def onBatchCommitted(id: Long, md: Map[String, String]): Unit =
    log("event" -> "committed", "batch_id" -> id)
  override def onError(id: Long, stage: String, e: Throwable): Unit =
    log("event" -> "error", "batch_id" -> id, "stage" -> stage, "error" -> e.getMessage)
}

case class RunOptions(
    once: Boolean = true,
    maxBatches: Option[Int] = None,
    sleepMs: Long = 1000,
    sleepWhenIdleMs: Long = 1000,
    maxIdleLoops: Option[Int] = Some(1))

case class RunResult(batchesProcessed: Int, idleLoops: Int, lastBatchId: Option[Long])

/** Micro-batch pipeline driver: plan → WAL offset → read → schema → transform
  * → write → WAL commit, with at-least-once semantics, per-stage timing,
  * observer events and stage-tagged error wrapping
  * (reference `pipeline.py:286-434`; SURVEY §3.1).
  *
  * The driver loop runs on the Spark driver; everything between read and
  * write is lazy Catalyst plans executed distributed at the writer's action.
  * The WAL is tiny driver-side JSON — O(1) per batch regardless of data size.
  */
class Pipeline(
    val source: Source,
    val reader: (BatchContext) => DataFrame = null,
    val transform: Option[(DataFrame, BatchContext) => DataFrame] = None,
    val writer: (DataFrame, BatchContext) => Map[String, String],
    val schemaEvolution: Option[SchemaEvolution] = None,
    val observer: PipelineObserver = new PipelineObserver {},
    val spark: SparkSession) {

  private val wal = new graft.core.WriteAheadLog(source.checkpointDir, source.conf)

  val state = new JobState(
    new Path(source.checkpointDir, "state").toString,
    source.conf, spark)

  private def timed[T](batchId: Long, stage: String)(f: => T): T = {
    observer.onStageStart(batchId, stage)
    StageMetadata.drain(): Unit // pre-stage leftovers are not this stage's
    val t0 = System.nanoTime()
    val r = f
    // operator-internal decisions recorded during the stage (e.g. the
    // hash64 layout selector's event=hash64_layout) ride the stage-end
    // event, so the structured stream — not just the driver log —
    // explains the plan the run chose
    observer.onStageEnd(batchId, stage, (System.nanoTime() - t0) / 1000000,
      StageMetadata.drain())
    r
  }

  private def wrap[T](batchId: Long, stage: String, mk: (String, Throwable) => PipelineError)(
      f: => T): T =
    try f catch {
      case e: GraftError => observer.onError(batchId, stage, e); throw e
      case e: Exception =>
        observer.onError(batchId, stage, e)
        throw mk(s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }

  /** One batch; Some(batchId) if processed, None if idle. */
  def runOnce(): Option[Long] = {
    val batch = wrap(-1L, "plan", new PlanningError(_, _)) {
      timed(-1L, "plan")(source.planBatch())
    } match {
      case None => return None
      case Some(b) => b
    }
    observer.onBatchPlanned(batch.batchId, batch.files.size, batch.totalBytes)
    val ctx = BatchContext(spark, batch.batchId, batch.paths, state)

    var df = wrap(batch.batchId, "read", new ReaderError(_, _)) {
      timed(batch.batchId, "read") {
        // default read = the source's own batch reader
        if (reader == null) source.readBatch(spark, batch) else reader(ctx)
      }
    }
    schemaEvolution.foreach { se =>
      df = wrap(batch.batchId, "schema", new ReaderError(_, _)) {
        timed(batch.batchId, "schema")(se.applyTo(df, wal))
      }
    }
    transform.foreach { t =>
      df = wrap(batch.batchId, "transform", new TransformError(_, _)) {
        timed(batch.batchId, "transform")(t(df, ctx))
      }
    }
    val metadata = wrap(batch.batchId, "write", new WriterError(_, _)) {
      timed(batch.batchId, "write")(writer(df, ctx))
    }
    wrap(batch.batchId, "commit", new CommitError(_, _)) {
      timed(batch.batchId, "commit")(source.commitBatch(batch, metadata))
    }
    observer.onBatchCommitted(batch.batchId, metadata)
    Some(batch.batchId)
  }

  /** Loop with once/maxBatches/idle control, under the single-writer lock. */
  def run(opts: RunOptions = RunOptions()): RunResult =
    PipelineLock.withLock(source.checkpointDir) {
      var processed = 0
      var idle = 0
      var last: Option[Long] = None
      var continue = true
      while (continue) {
        runOnce() match {
          case Some(id) =>
            processed += 1; idle = 0; last = Some(id)
            if (opts.once || opts.maxBatches.exists(processed >= _)) continue = false
            else if (opts.sleepMs > 0) Thread.sleep(opts.sleepMs)
          case None =>
            idle += 1
            if (opts.once || opts.maxIdleLoops.exists(idle >= _)) continue = false
            else if (opts.sleepWhenIdleMs > 0) Thread.sleep(opts.sleepWhenIdleMs)
        }
      }
      RunResult(processed, idle, last)
    }
}

/** Per-checkpoint exclusive writer lock: `java.nio` FileLock with a stale
  * lock-file fallback (age-based), mirroring reference
  * `pipeline.py:162-283`. One writer per checkpoint is what makes the
  * hand-rolled Delta commit protocol safe (SURVEY §7.4). */
object PipelineLock {
  /** Age-based stale-file removal is OPT-IN (default 0 = disabled), matching
    * the reference's default. The primary mechanism is the OS advisory
    * FileLock, which the kernel releases the moment the holder dies — a
    * crashed run never wedges the checkpoint, and a long batch loop can
    * never "age out" and lose its lock to a second starter. When enabled
    * (for filesystems without working locks), removal additionally verifies
    * the recorded holder pid is dead before deleting. */
  val StaleAfterMs: Long = sys.env.getOrElse("GRAFT_LOCK_STALE_MS", "0").toLong

  private def recordedPidAlive(lockFile: File): Boolean =
    try {
      val src = scala.io.Source.fromFile(lockFile)
      val txt = try src.mkString finally src.close()
      "pid=(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        .exists(p => ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
    } catch { case _: Exception => false }

  def withLock[T](checkpointDir: String)(f: => T): T = {
    val dir = new File(checkpointDir)
    dir.mkdirs()
    val lockFile = new File(dir, ".lock")
    if (StaleAfterMs > 0 && lockFile.exists() &&
        System.currentTimeMillis() - lockFile.lastModified() > StaleAfterMs &&
        !recordedPidAlive(lockFile)) {
      lockFile.delete() // stale from a verified-dead process
    }
    val raf = new RandomAccessFile(lockFile, "rw")
    val lock: FileLock =
      try raf.getChannel.tryLock()
      catch { case _: OverlappingFileLockException => null }
    if (lock == null) {
      raf.close()
      throw new CheckpointLockError(s"checkpoint $checkpointDir is locked by another writer")
    }
    try {
      raf.setLength(0)
      raf.writeBytes(s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}")
      f
    } finally {
      lock.release()
      raf.close()
      // The lock file stays in place: deleting it while another starter has
      // the old inode open would let two processes lock different inodes of
      // the same path — everyone must contend on one persistent file.
    }
  }
}

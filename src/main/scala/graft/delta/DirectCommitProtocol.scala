package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage

import java.util.UUID

/** Rename-free commit protocol for Delta data writes.
  *
  * The default `HadoopMapReduceCommitProtocol` stages task output under
  * `_temporary/` and renames on commit — on object stores that rename is a
  * full copy of every byte written. In a Delta table the LOG controls
  * visibility, not the filesystem: a part file nobody references doesn't
  * exist as far as readers are concerned. So tasks here write straight to
  * their FINAL names (unique per attempt — a retried/speculative attempt
  * writes a fresh name and the loser is simply never referenced; vacuum
  * collects it), task/job commit are no-ops, and the `_delta_log` commit
  * is the single atomic step. This is the same shape as delta-spark's
  * `DelayedCommitProtocol`.
  *
  * Only safe when the caller commits the written files to a log (or
  * otherwise tolerates orphan files on job failure) — which is exactly how
  * [[DeltaWriter]] uses it.
  */
class DirectCommitProtocol(jobId: String, path: String,
    dynamicPartitionOverwrite: Boolean)
    extends FileCommitProtocol with Serializable {

  require(!dynamicPartitionOverwrite,
    "DirectCommitProtocol does not support dynamic partition overwrite")

  def this(jobId: String, path: String) = this(jobId, path, false)

  /** Files this task created (executor-side; each task deserializes its
    * own protocol instance, so the buffer is per-attempt). */
  @transient private var taskFiles: scala.collection.mutable.ArrayBuffer[String] = _

  override def setupJob(jobContext: JobContext): Unit = ()

  /** Collect every task's created files into the driver-side registry —
    * with partitioned writes the files land in shared `col=value` dirs a
    * post-write listing can't attribute to THIS write, so attribution
    * comes from the tasks themselves (delta-spark's DelayedCommitProtocol
    * does the same). */
  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit =
    DirectCommitProtocol.record(path,
      taskCommits.flatMap(_.obj.asInstanceOf[Vector[TaskWrittenFile]]))

  override def abortJob(jobContext: JobContext): Unit = ()
  override def setupTask(taskContext: TaskAttemptContext): Unit = {
    taskFiles = scala.collection.mutable.ArrayBuffer.empty[String]
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    val name = f"${spec.prefix}part-$split%05d-${UUID.randomUUID()}${spec.suffix}"
    val parent = dir.map(d => new Path(new Path(path), d)).getOrElse(new Path(path))
    val out = new Path(parent, name).toString
    if (taskFiles != null) taskFiles += out
    out
  }

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], ext: String): String =
    newTaskTempFile(taskContext, dir, FileNameSpec("", ext))

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
      absoluteDir: String, spec: FileNameSpec): String =
    throw new UnsupportedOperationException(
      "DirectCommitProtocol does not support absolute-path files")

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
      absoluteDir: String, ext: String): String =
    newTaskTempFileAbsPath(taskContext, absoluteDir, FileNameSpec("", ext))

  /** Per-file size + delta stats are computed HERE, in the task, right
    * after the task closed its files (footers are hot in the page cache of
    * the executor that just wrote them) — so commit-time stats collection
    * is as distributed as the write itself. The alternative — the driver
    * looping over part-file footers after the job — serializes O(#files)
    * object-store metadata round-trips into the commit path, which at
    * 100 k files is minutes of driver time per commit. */
  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(
      if (taskFiles == null) Vector.empty[TaskWrittenFile]
      else {
        val conf = taskContext.getConfiguration
        taskFiles.toVector.map { f =>
          val p = new Path(f)
          val size = try p.getFileSystem(conf).getFileStatus(p).getLen
            catch { case _: java.io.IOException => 0L }
          TaskWrittenFile(f, size, DeltaStats.collectStats(p, conf))
        }
      })

  override def abortTask(taskContext: TaskAttemptContext): Unit = ()
}

/** One file a write task created, with the size and delta-stats JSON the
  * task itself collected — the payload of [[DirectCommitProtocol]]'s
  * task-commit messages. */
case class TaskWrittenFile(path: String, size: Long, stats: Option[String])

object DirectCommitProtocol {
  /** Output path -> files created by the completed write job. Only read
    * by [[DeltaWriter]] right after its own write (single-writer lock),
    * and removed on read, so entries never accumulate. Keys are
    * scheme-stripped: Spark instantiates the protocol with the QUALIFIED
    * output path (`file:/...`) while the writer knows the bare one. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[TaskWrittenFile]]()

  private def key(path: String): String = new Path(path).toUri.getPath

  private[delta] def record(path: String, files: Seq[TaskWrittenFile]): Unit =
    registry.merge(key(path), files.toVector, (a, b) => a ++ b)

  private[delta] def pop(path: String): Seq[TaskWrittenFile] =
    Option(registry.remove(key(path))).getOrElse(Vector.empty)
}

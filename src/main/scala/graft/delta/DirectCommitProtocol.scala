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

  override def setupJob(jobContext: JobContext): Unit = ()
  override def commitJob(jobContext: JobContext,
      taskCommits: Seq[TaskCommitMessage]): Unit = ()
  override def abortJob(jobContext: JobContext): Unit = ()
  override def setupTask(taskContext: TaskAttemptContext): Unit = ()

  override def newTaskTempFile(taskContext: TaskAttemptContext,
      dir: Option[String], spec: FileNameSpec): String = {
    val split = taskContext.getTaskAttemptID.getTaskID.getId
    val name = f"${spec.prefix}part-$split%05d-${UUID.randomUUID()}${spec.suffix}"
    val parent = dir.map(d => new Path(new Path(path), d)).getOrElse(new Path(path))
    new Path(parent, name).toString
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

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(null)

  override def abortTask(taskContext: TaskAttemptContext): Unit = ()
}

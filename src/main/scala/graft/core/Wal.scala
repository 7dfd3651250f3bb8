package graft.core

import com.fasterxml.jackson.databind.JsonNode
import graft.util.{Fs, Jsons}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One file admitted into a planned batch. */
case class FileEntry(path: String, size: Long, mtimeMs: Long) {
  def toJson: JsonNode = {
    val o = Jsons.obj()
    o.put("path", path); o.put("size", size); o.put("mtime_ms", mtimeMs)
    o
  }
}
object FileEntry {
  def fromJson(n: JsonNode): FileEntry =
    FileEntry(n.get("path").asText(), n.get("size").asLong(), n.get("mtime_ms").asLong())
}

/** A planned micro-batch: integer id + admitted files + a source-specific
  * offset payload (opaque JSON). Mirrors the reference's `BatchInfo` /
  * `DeltaBatch` (`checkpoints/types.py:10-40`) and — in design —
  * delta-spark's `DeltaSourceOffset`. */
case class BatchInfo(
    batchId: Long,
    files: Seq[FileEntry],
    offset: JsonNode,
    isRecovered: Boolean = false) {
  def paths: Seq[String] = files.map(_.path)
  def totalBytes: Long = files.map(_.size).sum
}

/** Offset + commit write-ahead log under `<checkpointDir>/{offsets,commits}`.
  *
  * Same on-disk layout as the reference (`checkpoints/file.py:23-34`,
  * `docs/checkpoints.md:13-26`) which itself mirrors Structured Streaming's
  * `OffsetSeqLog` + `CommitLog`: one JSON per batch id, atomic writes,
  * recovery = newest offset lacking a commit. At-least-once by construction.
  */
class WriteAheadLog(checkpointDir: String, conf: Configuration) {
  private val root = new Path(checkpointDir)
  private val offsetsDir = new Path(root, "offsets")
  private val commitsDir = new Path(root, "commits")
  val metadataPath = new Path(root, "metadata.json")

  private def idOf(name: String): Option[Long] = {
    val base = name.stripSuffix(".json")
    if (name.endsWith(".json") && base.forall(_.isDigit)) Some(base.toLong) else None
  }

  def listOffsetIds(): Seq[Long] =
    Fs.list(offsetsDir, conf).flatMap(s => idOf(s.getPath.getName)).sorted
  def listCommitIds(): Seq[Long] =
    Fs.list(commitsDir, conf).flatMap(s => idOf(s.getPath.getName)).sorted

  def latestOffsetId(): Option[Long] = listOffsetIds().lastOption
  def latestCommitId(): Option[Long] = listCommitIds().lastOption

  def nextBatchId(): Long = latestOffsetId().map(_ + 1).getOrElse(0L)

  /** Offsets written but not yet committed — these must be replayed first
    * (reference `checkpoints/file.py:366-371`, `delta.py:935-938`). */
  def pendingBatchIds(): Seq[Long] = {
    val committed = listCommitIds().toSet
    listOffsetIds().filterNot(committed)
  }

  def offsetPath(id: Long): Path = new Path(offsetsDir, s"$id.json")
  def commitPath(id: Long): Path = new Path(commitsDir, s"$id.json")

  /** Idempotent: rewriting the same id is allowed (recovery replays). */
  def writeOffset(batch: BatchInfo): Unit = {
    val o = Jsons.obj()
    o.put("batch_id", batch.batchId)
    val filesArr = Jsons.arr()
    batch.files.foreach(f => filesArr.add(f.toJson))
    o.set[JsonNode]("files", filesArr)
    o.set[JsonNode]("offset", batch.offset)
    Fs.atomicWriteJson(offsetPath(batch.batchId), o, conf)
  }

  def readOffset(id: Long): BatchInfo = {
    val n = Fs.readJson(offsetPath(id), conf)
    val files = Jsons.elems(n.get("files")).map(FileEntry.fromJson).toSeq
    BatchInfo(n.get("batch_id").asLong(), files, n.get("offset"), isRecovered = true)
  }

  def commit(batchId: Long, metadata: Map[String, String]): Unit = {
    val o = Jsons.obj()
    o.put("batch_id", batchId)
    o.put("committed_at_ms", System.currentTimeMillis())
    val meta = Jsons.obj()
    metadata.foreach { case (k, v) => meta.put(k, v) }
    o.set[JsonNode]("metadata", meta)
    Fs.atomicWriteJson(commitPath(batchId), o, conf)
  }

  def readCommit(id: Long): JsonNode = Fs.readJson(commitPath(id), conf)

  def readMetadata(): Option[JsonNode] =
    if (Fs.exists(metadataPath, conf)) Some(Fs.readJson(metadataPath, conf)) else None

  def writeMetadata(n: JsonNode): Unit = Fs.atomicWriteJson(metadataPath, n, conf)

  /** Merge a single key into metadata.json, preserving other keys. */
  def updateMetadata(key: String, value: JsonNode): Unit = {
    val cur = readMetadata().getOrElse(Jsons.obj())
    cur.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode].set[JsonNode](key, value)
    writeMetadata(cur)
  }

  def deleteBatch(id: Long): Unit = {
    Fs.delete(offsetPath(id), recursive = false, conf)
    Fs.delete(commitPath(id), recursive = false, conf)
  }
}

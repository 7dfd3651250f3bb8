package graft.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Minimal JSON helpers over the jackson-databind shipped with Spark.
  *
  * The reference persists every checkpoint artifact as small JSON documents
  * written atomically (tmp + fsync + rename); see
  * reference `src/polars_incremental/checkpoints/types.py:54-63`. We use the
  * Hadoop FileSystem API so checkpoints work on HDFS/S3 on a real cluster,
  * with an extra direct-fsync pass for `file:` URIs because Hadoop's
  * RawLocalFileSystem skips fsync.
  */
object Jsons {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()

  def parse(s: String): JsonNode = mapper.readTree(s)

  def render(n: JsonNode): String = mapper.writeValueAsString(n)

  def fields(n: JsonNode): Iterator[(String, JsonNode)] =
    n.properties().iterator().asScala.map(e => (e.getKey, e.getValue))

  def elems(n: JsonNode): Iterator[JsonNode] = n.elements().asScala

  def optField(n: JsonNode, name: String): Option[JsonNode] =
    Option(n.get(name)).filterNot(_.isNull)

  def optStr(n: JsonNode, name: String): Option[String] =
    optField(n, name).map(_.asText())

  def optLong(n: JsonNode, name: String): Option[Long] =
    optField(n, name).map(_.asLong())

  def optBool(n: JsonNode, name: String): Option[Boolean] =
    optField(n, name).map(_.asBoolean())
}

/** Filesystem helpers: atomic JSON write, read, list, delete. */
object Fs {
  def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  /** Atomic write: tmp file in the same dir + fsync (local) + rename.
    * Mirrors reference `checkpoints/types.py:54-63` (`atomic_write_json`). */
  def atomicWriteString(path: Path, content: String, conf: Configuration): Unit = {
    val filesystem = fs(path, conf)
    val parent = path.getParent
    if (parent != null) filesystem.mkdirs(parent)
    val tmp = new Path(parent, s".${path.getName}.${UUID.randomUUID().toString.take(8)}.tmp")
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if (filesystem.getScheme == "file") {
      // Direct java.nio path: fsync before rename (RawLocalFileSystem's
      // streams do not fsync on close) and an atomic replace-on-rename
      // (Hadoop's local rename refuses to overwrite an existing target).
      val local = new File(tmp.toUri.getPath)
      local.getParentFile.mkdirs()
      val out = new FileOutputStream(local)
      try {
        out.write(bytes)
        out.getFD.sync()
      } finally out.close()
      // the nio fast path bypasses Hadoop's ChecksumFileSystem — if the
      // TARGET was ever written/copied THROUGH the Hadoop local fs (which
      // drops a `.<name>.crc` sidecar, e.g. FileUtil.copy), that stale
      // checksum would fail every later Hadoop-layer read of the
      // replaced content with a ChecksumException. Drop it BEFORE the
      // move: a crash in between merely leaves the OLD content reading
      // unverified, while delete-after would leave a crash window where
      // the COMMITTED new content reads as corrupt
      val crc = new File(new File(path.toUri.getPath).getParentFile,
        s".${path.getName}.crc")
      if (crc.exists()) crc.delete(): Unit
      java.nio.file.Files.move(local.toPath, new File(path.toUri.getPath).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val out = filesystem.create(tmp, false)
      try out.write(bytes)
      finally out.close()
      if (filesystem.exists(path)) filesystem.delete(path, false)
      if (!filesystem.rename(tmp, path)) {
        filesystem.delete(tmp, false)
        throw new java.io.IOException(s"atomic rename failed: $tmp -> $path")
      }
    }
  }

  def atomicWriteJson(path: Path, node: JsonNode, conf: Configuration): Unit =
    atomicWriteString(path, Jsons.render(node), conf)

  def readString(path: Path, conf: Configuration): String = {
    val in = fs(path, conf).open(path)
    try {
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      new String(bytes, StandardCharsets.UTF_8)
    } finally in.close()
  }

  def readJson(path: Path, conf: Configuration): JsonNode =
    Jsons.parse(readString(path, conf))

  def exists(path: Path, conf: Configuration): Boolean = fs(path, conf).exists(path)

  def delete(path: Path, recursive: Boolean, conf: Configuration): Boolean =
    fs(path, conf).delete(path, recursive)

  /** List immediate children (empty if the dir does not exist). */
  def list(path: Path, conf: Configuration): Seq[org.apache.hadoop.fs.FileStatus] = {
    val filesystem = fs(path, conf)
    if (!filesystem.exists(path)) Seq.empty
    else filesystem.listStatus(path).toSeq
  }

  /** Exact row count of a written parquet directory from its file
    * FOOTERS — driver-side metadata I/O, no Spark job. The chunk-commit
    * metas require their `n` to be a pure function of committed bytes;
    * the footers ARE the committed bytes, so this replaces the
    * read-back `spark.read.parquet(chunk).count()` job the fold paths
    * paid per commit (a job launch + scan for a number parquet already
    * stores). */
  def parquetRowCount(dir: Path, conf: Configuration): Long = {
    val filesystem = fs(dir, conf)
    filesystem.listStatus(dir).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }
}

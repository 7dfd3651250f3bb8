package graft.delta

import com.fasterxml.jackson.databind.JsonNode
import graft.core.PlanningError
import graft.util.{Fs, Jsons}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Delta-protocol actions we understand — the subset the reference's
  * from-scratch `_delta_log` parser handles
  * (reference `src/polars_incremental/checkpoints/delta.py:346-390`):
  * commitInfo/metaData/add/remove/cdc. Protocol/txn actions are ignored. */
sealed trait DeltaAction
object DeltaAction {
  case class CommitInfo(timestampMs: Option[Long]) extends DeltaAction
  case class MetaData(id: String, schemaString: Option[String]) extends DeltaAction
  case class AddFile(path: String, size: Long, dataChange: Boolean) extends DeltaAction
  case class RemoveFile(path: String, dataChange: Boolean) extends DeltaAction
  case class CdcFile(path: String, size: Long) extends DeltaAction
}

/** One parsed commit. */
case class DeltaCommit(version: Long, actions: Seq[DeltaAction]) {
  import DeltaAction._
  def timestampMs: Option[Long] =
    actions.collectFirst { case CommitInfo(Some(ts)) => ts }
  def metaId: Option[String] = actions.collectFirst { case m: MetaData => m.id }
  def adds: Seq[AddFile] = actions.collect { case a: AddFile => a }
  def removes: Seq[RemoveFile] = actions.collect { case r: RemoveFile => r }
  def cdcs: Seq[CdcFile] = actions.collect { case c: CdcFile => c }
}

/** Reader for a Delta table's `_delta_log`: version listing, JSON-lines
  * action parsing, and snapshot-state reconstruction with an optional
  * snapshot cache.
  *
  * Re-implements (no delta-spark jars on this classpath) the log-replay
  * core of delta-spark's `Snapshot`, following the reference's design
  * (`checkpoints/delta.py:425-499`): fold add/remove actions in version
  * order; a JSON snapshot cache every `SnapshotEvery` versions bounds
  * replay cost to O(versions since last snapshot) — the same amortization
  * delta-spark gets from its parquet checkpoints.
  *
  * All of this is driver-side planning metadata (file lists, not data);
  * executors only ever see the resolved parquet paths.
  */
class DeltaLogReader(conf: Configuration) {
  import DeltaAction._

  val SnapshotEvery = 100
  val MaxSnapshots = 2

  def logDir(tablePath: String): Path = new Path(tablePath, "_delta_log")

  def isDeltaTable(tablePath: String): Boolean = Fs.exists(logDir(tablePath), conf)

  private def versionOf(name: String): Option[Long] =
    if (name.endsWith(".json") && name.stripSuffix(".json").forall(_.isDigit))
      Some(name.stripSuffix(".json").toLong)
    else None

  def listVersions(tablePath: String): Seq[Long] =
    Fs.list(logDir(tablePath), conf)
      .flatMap(s => versionOf(s.getPath.getName)).sorted

  def latestVersion(tablePath: String): Option[Long] = listVersions(tablePath).lastOption

  def commitPath(tablePath: String, version: Long): Path =
    new Path(logDir(tablePath), f"$version%020d.json")

  def commitExists(tablePath: String, version: Long): Boolean =
    Fs.exists(commitPath(tablePath, version), conf)

  /** Parse one commit file (JSON lines, one action per line). */
  def readCommit(tablePath: String, version: Long): DeltaCommit = {
    val p = commitPath(tablePath, version)
    val fs = Fs.fs(p, conf)
    val reader = new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
    try {
      val actions = Iterator.continually(reader.readLine())
        .takeWhile(_ != null)
        .filter(_.trim.nonEmpty)
        .flatMap(line => parseAction(Jsons.parse(line)))
        .toSeq
      DeltaCommit(version, actions)
    } finally reader.close()
  }

  private def parseAction(n: JsonNode): Option[DeltaAction] = {
    Jsons.optField(n, "commitInfo").map(ci =>
      CommitInfo(Jsons.optLong(ci, "timestamp"))
    ).orElse(Jsons.optField(n, "metaData").map(md =>
      MetaData(Jsons.optStr(md, "id").getOrElse(""), Jsons.optStr(md, "schemaString"))
    )).orElse(Jsons.optField(n, "add").map(a =>
      AddFile(a.get("path").asText(), Jsons.optLong(a, "size").getOrElse(0L),
        Jsons.optBool(a, "dataChange").getOrElse(true))
    )).orElse(Jsons.optField(n, "remove").map(r =>
      RemoveFile(r.get("path").asText(), Jsons.optBool(r, "dataChange").getOrElse(true))
    )).orElse(Jsons.optField(n, "cdc").map(c =>
      CdcFile(c.get("path").asText(), Jsons.optLong(c, "size").getOrElse(0L))))
  }

  /** Current table id (from the latest metaData action found scanning
    * backwards). */
  def tableId(tablePath: String): Option[String] = {
    val versions = listVersions(tablePath)
    versions.reverseIterator
      .map(v => readCommit(tablePath, v).metaId)
      .collectFirst { case Some(id) => id }
  }

  /** Latest schemaString, scanning backwards. */
  def tableSchemaString(tablePath: String): Option[String] = {
    listVersions(tablePath).reverseIterator
      .map(v => readCommit(tablePath, v).actions.collectFirst {
        case MetaData(_, Some(s)) => s
      })
      .collectFirst { case Some(s) => s }
  }

  /** First version whose commit timestamp is >= tsMs
    * (reference `delta.py:560-575`). */
  def versionForTimestamp(tablePath: String, tsMs: Long): Option[Long] =
    listVersions(tablePath).find { v =>
      readCommit(tablePath, v).timestampMs.exists(_ >= tsMs)
    }

  /** Active file set (path -> size) at `version`, replaying the log from
    * the newest cached snapshot at or below `version` (if cacheDir given).
    * Result sorted by path for deterministic batching. */
  def snapshotState(tablePath: String, version: Long,
      cacheDir: Option[Path] = None): Seq[(String, Long)] = {
    val versions = listVersions(tablePath).filter(_ <= version)
    if (versions.isEmpty)
      throw new PlanningError(s"no delta log versions <= $version at $tablePath")

    val (startState, replayFrom) = cacheDir.flatMap(d => newestCachedAtOrBelow(d, version))
      .map { case (v, state) => (state, versions.filter(_ > v)) }
      .getOrElse((Map.empty[String, Long], versions))

    val state = replayFrom.foldLeft(startState) { (acc, v) =>
      val commit = readCommit(tablePath, v)
      val afterRemoves = commit.removes.foldLeft(acc)((m, r) => m - r.path)
      commit.adds.foldLeft(afterRemoves)((m, a) => m + (a.path -> a.size))
    }

    cacheDir.foreach { d =>
      if (version % SnapshotEvery == 0 && version > 0) writeSnapshot(d, version, state)
    }
    state.toSeq.sortBy(_._1)
  }

  // ---- snapshot cache (reference delta.py:110-187) -----------------------

  private def snapPath(dir: Path, version: Long) = new Path(dir, f"snapshot_$version%020d.json")

  private def listSnapshots(dir: Path): Seq[Long] =
    Fs.list(dir, conf).flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("snapshot_") && n.endsWith(".json"))
        Some(n.stripPrefix("snapshot_").stripSuffix(".json").toLong)
      else None
    }.sorted

  private def newestCachedAtOrBelow(dir: Path, version: Long)
      : Option[(Long, Map[String, Long])] =
    listSnapshots(dir).filter(_ <= version).lastOption.map { v =>
      val n = Fs.readJson(snapPath(dir, v), conf)
      v -> Jsons.fields(n.get("files")).map { case (p, sz) => p -> sz.asLong() }.toMap
    }

  private def writeSnapshot(dir: Path, version: Long, state: Map[String, Long]): Unit = {
    if (listSnapshots(dir).contains(version)) return
    val o = Jsons.obj()
    o.put("version", version)
    val files = Jsons.obj()
    state.foreach { case (p, sz) => files.put(p, sz) }
    o.set[JsonNode]("files", files)
    Fs.atomicWriteJson(snapPath(dir, version), o, conf)
    // prune: keep newest MaxSnapshots
    val all = listSnapshots(dir)
    all.dropRight(MaxSnapshots).foreach(v =>
      Fs.delete(snapPath(dir, v), recursive = false, conf))
  }

  /** Resolve a (possibly relative) action path against the table root. */
  def resolvePath(tablePath: String, actionPath: String): String =
    if (actionPath.startsWith("/") || actionPath.contains("://")) actionPath
    else new Path(tablePath, actionPath).toString
}

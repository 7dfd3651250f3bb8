package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.core.{GraftError, MissingOptionError}
import graft.sources._
import graft.util.{Fs, Jsons}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** A named dataset: format + path + free-form options
  * (reference `src/polars_incremental/catalog.py:14-102`). */
case class DatasetSpec(
    format: String,
    path: String,
    options: Map[String, String] = Map.empty) {

  /** Build a concrete incremental source bound to `checkpointDir`
    * (reference `DatasetSpec.to_source`). */
  def toSource(checkpointDir: String, conf: Configuration): Source = {
    def optInt(k: String) = options.get(k).map(_.toInt)
    def optLong(k: String) = options.get(k).map(_.toLong)
    def optBool(k: String) = options.get(k).exists(_.toBoolean)
    val fmt = FormatInference.infer(path, Some(format).filter(_ != "auto"),
      options.get("pattern"), conf)
    if (fmt == "delta") {
      val start = options.get("start_offset") match {
        case Some("latest") => DeltaStartOffset.Latest
        case Some("earliest") => DeltaStartOffset.Earliest
        case Some("snapshot") | None => DeltaStartOffset.Snapshot
        case Some(other) => throw new MissingOptionError(s"unknown delta start_offset: $other")
      }
      val resolved = options.get("starting_version").map(v =>
          DeltaStartOffset.StartingVersion(v.toLong))
        .orElse(options.get("starting_timestamp").map(t =>
          DeltaStartOffset.StartingTimestamp(t.toLong)))
        .getOrElse(start)
      new DeltaSource(path, new DeltaTableCheckpoint(checkpointDir, conf),
        DeltaSourceOptions(
          startOffset = resolved,
          maxFilesPerTrigger = optInt("max_files_per_trigger"),
          maxBytesPerTrigger = optLong("max_bytes_per_trigger"),
          ignoreDeletes = optBool("ignore_deletes"),
          ignoreChanges = optBool("ignore_changes"),
          readChangeFeed = optBool("read_change_feed")))
    } else {
      val start = options.get("start_offset") match {
        case Some("latest") => FileStartOffset.Latest
        case Some("earliest") | None => FileStartOffset.Earliest
        case Some(ts) if ts.forall(_.isDigit) => FileStartOffset.Timestamp(ts.toLong)
        case Some(other) => throw new MissingOptionError(s"unknown files start_offset: $other")
      }
      val clean = options.get("clean_source") match {
        case Some("delete") => CleanSource.Delete
        case Some("archive") => CleanSource.Archive
        case _ => CleanSource.Off
      }
      new FileSource(path, new FileStreamCheckpoint(checkpointDir, conf), fmt,
        FileSourceOptions(
          pattern = options.getOrElse("pattern", "*"),
          recursive = optBool("recursive"),
          maxFilesPerTrigger = optInt("max_files_per_trigger"),
          maxBytesPerTrigger = optLong("max_bytes_per_trigger"),
          startOffset = start,
          allowOverwrites = optBool("allow_overwrites"),
          maxFileAgeMs = optLong("max_file_age_ms")),
        cleanSource = clean)
    }
  }
}

/** Name -> DatasetSpec resolution (reference `LocalCatalog`). */
trait Catalog {
  def resolve(name: String): DatasetSpec
  def getSource(name: String, checkpointDir: String, conf: Configuration): Source =
    resolve(name).toSource(checkpointDir, conf)
}

/** In-memory catalog from a map, or loaded from a JSON or TOML file
  * (reference `catalog.py:70-101`). Both formats share one normalization:
  * an optional top-level `datasets` wrapper, `format`/`type` and
  * `path`/`location` aliases, and non-reserved top-level keys merged into
  * `options` (winning over the `options` table, like the reference's
  * `_normalize_spec`). */
class LocalCatalog(specs: Map[String, DatasetSpec]) extends Catalog {
  def resolve(name: String): DatasetSpec =
    specs.getOrElse(name, throw new GraftError(s"dataset not in catalog: $name"))
  def names: Seq[String] = specs.keys.toSeq.sorted
}

object LocalCatalog {
  def apply(specs: Map[String, DatasetSpec]): LocalCatalog = new LocalCatalog(specs)

  /** Dispatch on extension: `.json` or `.toml` (reference
    * `catalog.py:95-102`). */
  def fromFile(path: String, conf: Configuration): LocalCatalog =
    if (path.endsWith(".toml")) fromTomlFile(path, conf)
    else if (path.endsWith(".json")) fromJsonFile(path, conf)
    else throw new GraftError(s"unsupported catalog file type: $path (.json or .toml)")

  def fromJsonFile(path: String, conf: Configuration): LocalCatalog =
    fromEntries(jsonToMap(Fs.readJson(new Path(path), conf)))

  def fromTomlFile(path: String, conf: Configuration): LocalCatalog =
    fromEntries(graft.util.Toml.parse(Fs.readString(new Path(path), conf)))

  private def jsonToMap(node: JsonNode): Map[String, Any] =
    Jsons.fields(node).map { case (k, v) =>
      k -> (if (v.isObject) jsonToMap(v) else v.asText())
    }.toMap

  /** Shared normalization over the parsed tree (JSON or TOML). */
  private def fromEntries(root: Map[String, Any]): LocalCatalog = {
    val datasets = root.get("datasets") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case Some(_) => throw new GraftError("catalog 'datasets' must be a table")
      case None => root
    }
    val specs = datasets.map {
      case (name, entry: Map[String @unchecked, Any @unchecked]) =>
        name -> normalizeSpec(name, entry)
      case (name, _) =>
        throw new GraftError(s"catalog entry $name must be a table")
    }
    new LocalCatalog(specs)
  }

  private val Reserved = Set("format", "type", "path", "location", "options")

  private def normalizeSpec(name: String, entry: Map[String, Any]): DatasetSpec = {
    def asStr(v: Any): String = v match {
      case s: String => s
      case other => other.toString // Long/Boolean/Double from TOML
    }
    val format = entry.get("format").orElse(entry.get("type")).map(asStr).getOrElse("auto")
    val path = entry.get("path").orElse(entry.get("location")).map(asStr)
      .getOrElse(throw new MissingOptionError(s"catalog entry $name lacks path"))
    val optionsTable = entry.get("options") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        m.map { case (k, v) => k -> asStr(v) }
      case _ => Map.empty[String, String]
    }
    val extras = entry.collect {
      case (k, v) if !Reserved(k) && !v.isInstanceOf[Map[_, _]] => k -> asStr(v)
    }
    DatasetSpec(format, path, optionsTable ++ extras)
  }
}

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

/** In-memory catalog from a map, or loaded from a JSON file of
  * `{name: {format, path, options}}` (reference supports dict/JSON/TOML;
  * JSON covers the persisted format — TOML intentionally unsupported,
  * documented). */
class LocalCatalog(specs: Map[String, DatasetSpec]) extends Catalog {
  def resolve(name: String): DatasetSpec =
    specs.getOrElse(name, throw new GraftError(s"dataset not in catalog: $name"))
  def names: Seq[String] = specs.keys.toSeq.sorted
}

object LocalCatalog {
  def apply(specs: Map[String, DatasetSpec]): LocalCatalog = new LocalCatalog(specs)

  def fromJsonFile(path: String, conf: Configuration): LocalCatalog = {
    val root = Fs.readJson(new Path(path), conf)
    val specs = Jsons.fields(root).map { case (name, node) =>
      val format = Jsons.optStr(node, "format").getOrElse("auto")
      val p = Jsons.optStr(node, "path")
        .getOrElse(throw new MissingOptionError(s"catalog entry $name lacks path"))
      val opts = Jsons.optField(node, "options").map(o =>
        Jsons.fields(o).map { case (k, v) => k -> v.asText() }.toMap)
        .getOrElse(Map.empty[String, String])
      name -> DatasetSpec(format, p, opts)
    }.toMap
    new LocalCatalog(specs)
  }
}

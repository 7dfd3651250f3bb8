package graft.state

import com.fasterxml.jackson.databind.JsonNode
import graft.util.{Fs, Jsons}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-managed cross-batch state under `<checkpoint>/state/`: named JSON
  * documents + named parquet tables, atomic replace semantics.
  * Re-expresses reference `src/polars_incremental/state.py:14-92`.
  *
  * Parquet state goes through Spark (so a state table can be arbitrarily
  * large and is read/written distributed — the scalable path for seen-id
  * dedup and incremental aggregates at 100 TB, unlike a JSON id list).
  */
class JobState(val stateDir: String, conf: Configuration, spark: => SparkSession) {
  private val root = new Path(stateDir)

  private def jsonPath(name: String) = new Path(root, s"$name.json")
  private def parquetPath(name: String) = new Path(root, s"$name.parquet")

  def saveJson(name: String, node: JsonNode): Unit =
    Fs.atomicWriteJson(jsonPath(name), node, conf)

  def loadJson(name: String): Option[JsonNode] =
    if (Fs.exists(jsonPath(name), conf)) Some(Fs.readJson(jsonPath(name), conf)) else None

  /** Convenience for small scalar state (e.g. a watermark). */
  def saveValue(name: String, value: String): Unit = {
    val o = Jsons.obj(); o.put("value", value); saveJson(name, o)
  }
  def loadValue(name: String): Option[String] =
    loadJson(name).flatMap(n => Jsons.optStr(n, "value"))

  /** Atomic replace: write to a tmp dir, then swap. Parquet state tables are
    * the scalable representation of cross-batch state. */
  def saveParquet(name: String, df: DataFrame): Unit = {
    val target = parquetPath(name)
    val tmp = new Path(root, s".${name}.tmp.parquet")
    val fs = Fs.fs(root, conf)
    fs.mkdirs(root)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"state table swap failed for $name")
  }

  def loadParquet(name: String): Option[DataFrame] =
    if (Fs.exists(parquetPath(name), conf)) Some(spark.read.parquet(parquetPath(name).toString))
    else None

  def exists(name: String): Boolean =
    Fs.exists(jsonPath(name), conf) || Fs.exists(parquetPath(name), conf)

  def delete(name: String): Unit = {
    Fs.delete(jsonPath(name), recursive = false, conf)
    Fs.delete(parquetPath(name), recursive = true, conf)
  }
}

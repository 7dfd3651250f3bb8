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

  private def tmpPath(name: String) = new Path(root, s".${name}.tmp.parquet")
  private def oldPath(name: String) = new Path(root, s".${name}.old.parquet")

  /** Finish an interrupted [[saveParquet]] swap — idempotent, called on
    * every state-table access. The swap protocol is write-tmp →
    * rename-target-aside → rename-tmp-in → delete-aside (a
    * delete-then-rename swap has a crash window where the table is
    * simply GONE and the next load silently reseeds — the exact
    * silent-loss class the near-dup epoch pointer refuses on). Every
    * crash point here is unambiguous, so recovery is lossless:
    *  - aside + target ⇒ crash after the swap, before cleanup: the new
    *    state committed; drop the aside.
    *  - aside + tmp, no target ⇒ crash between the two renames: the tmp
    *    write had already COMPLETED (the aside rename only happens after
    *    the write returns), so finish the swap.
    *  - aside alone ⇒ nothing newer exists; restore it.
    * A crash during the tmp write itself leaves target untouched (no
    * aside yet) and the next save's overwrite clears the partial tmp. */
  private def heal(name: String): Unit = {
    val fs = Fs.fs(root, conf)
    val (target, tmp, old) = (parquetPath(name), tmpPath(name), oldPath(name))
    if (fs.exists(old)) {
      if (fs.exists(target)) fs.delete(old, true)
      else if (fs.exists(tmp)) {
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(
            s"state table swap recovery failed for $name")
        fs.delete(old, true)
      } else if (!fs.rename(old, target))
        throw new java.io.IOException(
          s"state table restore failed for $name")
    }
  }

  /** Atomic replace: write to a tmp dir, rename the live table aside,
    * swap the tmp in, drop the aside. Crash-safe at every step — an
    * interrupted swap self-heals losslessly on the next access (see
    * [[heal]]); the table is never observable as absent-but-previously-
    * written, which would silently reseed downstream folds. Parquet
    * state tables are the scalable representation of cross-batch state. */
  def saveParquet(name: String, df: DataFrame): Unit = {
    val target = parquetPath(name)
    val (tmp, old) = (tmpPath(name), oldPath(name))
    val fs = Fs.fs(root, conf)
    fs.mkdirs(root)
    heal(name)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"state table set-aside failed for $name")
    if (!fs.rename(tmp, target)) {
      // a concurrent reader's healIfLost may have completed the swap for
      // us in the target-absent window (it renames OUR tmp in — no other
      // writer exists under the single-writer lock); target present with
      // tmp gone IS the committed end state, so don't fail the batch
      if (!(fs.exists(target) && !fs.exists(tmp)))
        throw new java.io.IOException(s"state table swap failed for $name")
    }
    fs.delete(old, true): Unit
  }

  /** Read-path recovery: heal ONLY when the table is actually lost
    * (target absent) — the case where the old protocol silently
    * reseeded. When the target exists the read needs no mutation:
    * leftover aside/tmp debris is harmless (the next save cleans it),
    * and a read-only consumer keeps working against a healthy root.
    * This NARROWS the reader-vs-writer race to the instants between the
    * writer's two renames (a reader landing exactly there heals the
    * writer's complete tmp in itself — [[saveParquet]] tolerates that);
    * the real concurrency guarantee remains the single-writer lock
    * (Pipeline discipline), with out-of-band readers best-effort. */
  private def healIfLost(name: String): Unit =
    if (!Fs.exists(parquetPath(name), conf)) heal(name)

  def loadParquet(name: String): Option[DataFrame] = {
    healIfLost(name)
    if (Fs.exists(parquetPath(name), conf))
      Some(spark.read.parquet(parquetPath(name).toString))
    else None
  }

  def exists(name: String): Boolean = {
    healIfLost(name)
    Fs.exists(jsonPath(name), conf) || Fs.exists(parquetPath(name), conf)
  }

  def delete(name: String): Unit = {
    // swap debris FIRST: deleting the target before a lingering aside
    // would let a crash mid-delete leave a lone aside that healIfLost
    // later RESTORES — a deleted table resurrecting
    Fs.delete(oldPath(name), recursive = true, conf)
    Fs.delete(tmpPath(name), recursive = true, conf)
    Fs.delete(jsonPath(name), recursive = false, conf)
    Fs.delete(parquetPath(name), recursive = true, conf)
  }
}

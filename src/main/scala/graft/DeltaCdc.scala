package graft

import graft.delta.{DeltaWriteMode, DeltaWriter}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Outcome of a CDC merge into a Delta table
  * (the reference returns `{rows_in, rows_out, action, change_types}` —
  * `sinks/delta.py:158`). */
case class MergeResult(
    rowsIn: Long,
    rowsOut: Long,
    action: String,
    changeTypes: Map[String, Long])

/** CDC merge into a Delta table (reference `sinks/delta.py:32-158`):
  * `merge` reads the table, applies [[Cdc.applyCdc]], and overwrites in one
  * atomic Delta commit (add new files + remove old — the read-modify-
  * overwrite strategy); `append_only` dedups/strips and appends without
  * rewriting the table (fast path `:88-116`). Optionally emits the applied
  * changes as CDF `cdc` actions so downstream CDF readers can consume the
  * merge itself.
  *
  * Job structure (matters at scale): the change stream is persisted so its
  * upstream plan — often a window or join — executes once, not once per
  * metric; `rows_out` rides the write job via `observe()` (the merged plan
  * feeds only the write, so the metric is counted exactly once). Overwrite
  * is safe without materializing first because the old files are only
  * dereferenced in the log commit, never deleted before the new parts are
  * written.
  */
object DeltaCdc {
  def applyCdcDelta(
      spark: SparkSession,
      changes: DataFrame,
      tablePath: String,
      keys: Seq[String],
      mode: CdcMode = CdcMode.Merge,
      changeCol: String = Cdc.ChangeTypeCol,
      changeTypeMap: Map[String, String] = Map.empty,
      dropDeletes: Boolean = false,
      emitCdf: Boolean = false): MergeResult = {
    val writer = new DeltaWriter(spark, spark.sparkContext.hadoopConfiguration)
    val normalized = Cdc.normalizeChangeTypes(changes, changeCol, changeTypeMap)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one pass for the per-type counters; also populates the cache the
      // merge below reads, so the (possibly expensive) change-stream plan
      // runs exactly once
      val changeTypes = normalized.groupBy(changeCol).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rowsIn = changeTypes.values.sum

      val cdf = if (emitCdf) Some(normalized) else None
      val outObs = Observation()

      mode match {
        case CdcMode.AppendOnly =>
          val payload = Cdc.applyCdc(normalized, existing = None, keys, CdcMode.AppendOnly,
            changeCol, Map.empty, dropDeletes)
            .observe(outObs, count(lit(1)).as("rows_out"))
          writer.write(payload, tablePath, DeltaWriteMode.Append,
            mergeSchema = true, cdfChanges = cdf)
          val rowsOut = outObs.get("rows_out").asInstanceOf[Long]
          MergeResult(rowsIn, rowsOut, "append", changeTypes)
        case CdcMode.Merge =>
          val existing =
            if (writer.tableExists(tablePath)) Some(writer.read(tablePath)) else None
          val merged = Cdc.applyCdc(normalized, existing, keys, CdcMode.Merge,
            changeCol, Map.empty, dropDeletes)
            .observe(outObs, count(lit(1)).as("rows_out"))
          writer.write(merged, tablePath, DeltaWriteMode.Overwrite,
            mergeSchema = true, cdfChanges = cdf)
          val rowsOut = outObs.get("rows_out").asInstanceOf[Long]
          MergeResult(rowsIn, rowsOut, "merge", changeTypes)
      }
    } finally normalized.unpersist(blocking = false)
  }
}

package graft

import graft.delta.{DeltaWriteMode, DeltaWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * merge itself. */
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
    // one job for both metrics: rowsIn = sum of per-type counts
    val changeTypes = normalized.groupBy(changeCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rowsIn = changeTypes.values.sum

    val cdf = if (emitCdf) Some(normalized) else None

    mode match {
      case CdcMode.AppendOnly =>
        val payload = Cdc.applyCdc(normalized, existing = None, keys, CdcMode.AppendOnly,
          changeCol, Map.empty, dropDeletes)
        val rowsOut = payload.count()
        writer.write(payload, tablePath, DeltaWriteMode.Append,
          mergeSchema = true, cdfChanges = cdf)
        MergeResult(rowsIn, rowsOut, "append", changeTypes)
      case CdcMode.Merge =>
        val existing =
          if (writer.tableExists(tablePath)) Some(writer.read(tablePath)) else None
        val merged = Cdc.applyCdc(normalized, existing, keys, CdcMode.Merge,
          changeCol, Map.empty, dropDeletes)
        // Materialize before overwriting: the merged plan reads the table's
        // current files, which the overwrite commit will remove.
        val cached = merged.cache()
        val rowsOut = cached.count()
        writer.write(cached, tablePath, DeltaWriteMode.Overwrite,
          mergeSchema = true, cdfChanges = cdf)
        cached.unpersist()
        MergeResult(rowsIn, rowsOut, "merge", changeTypes)
    }
  }
}

package graft.sinks

import graft.delta.{DeltaWriteMode, DeltaWriter}
import org.apache.spark.sql.DataFrame

/** Per-batch parquet sink: one `batch_<id>` dir per batch, overwrite mode so
  * a replayed batch (at-least-once) is idempotent
  * (reference `src/polars_incremental/sinks/parquet.py:9-27`,
  * `docs/concepts.md:26`). */
object ParquetSink {
  def writeBatch(df: DataFrame, targetDir: String, batchId: Long): Map[String, String] = {
    df.write.mode("overwrite").parquet(s"$targetDir/batch_$batchId")
    Map("sink" -> "parquet", "path" -> s"$targetDir/batch_$batchId")
  }
}

/** EXACTLY-once Delta append sink over the at-least-once pipeline: every
  * batch commit carries a SetTransaction watermark (`appId`, batchId), and
  * a replayed batch at-or-below the table's watermark is skipped instead
  * of appended twice — delta-spark's `txnAppId`/`txnVersion` idempotent
  * write pattern. The append itself is the atomic commit; there is no
  * window where data is visible without its watermark. */
object DeltaSink {
  def writeBatch(df: DataFrame, tablePath: String, appId: String, batchId: Long,
      mergeSchema: Boolean = false): Map[String, String] = {
    val w = new DeltaWriter(df.sparkSession,
      df.sparkSession.sparkContext.hadoopConfiguration)
    w.lastTxnVersion(tablePath, appId) match {
      case Some(seen) if seen >= batchId =>
        Map("sink" -> "delta", "path" -> tablePath, "skipped" -> "replay",
          "last_txn" -> seen.toString)
      case _ =>
        val v = w.write(df, tablePath, DeltaWriteMode.Append,
          mergeSchema = mergeSchema, txn = Some((appId, batchId)))
        Map("sink" -> "delta", "path" -> tablePath, "version" -> v.toString)
    }
  }
}

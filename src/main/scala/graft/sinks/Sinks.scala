package graft.sinks

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

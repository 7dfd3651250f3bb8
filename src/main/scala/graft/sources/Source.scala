package graft.sources

import graft.core.BatchInfo
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** An incremental source: plans micro-batches against a checkpoint, reads
  * a planned batch into a DataFrame, and commits consumed batches. The
  * engine's two implementations mirror the reference's
  * (`FileSource`/`DeltaSource`, reference `src/polars_incremental/source.py`). */
trait Source {
  def planBatch(): Option[BatchInfo]
  def readBatch(spark: SparkSession, batch: BatchInfo): DataFrame
  def commitBatch(batch: BatchInfo, metadata: Map[String, String]): Unit
  def checkpointDir: String
  def conf: Configuration
}

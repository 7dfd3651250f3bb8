package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Metadata-only row counts for frames that are pure column-pruning
  * projections over parquet scans — the shape every chunk-table read in
  * the fold family has. `df.count()` on such a frame launches a Spark
  * job to iterate row-group batches; the parquet footers already carry
  * the exact count, so the tripwire reads (reps-count vs cache-n) can
  * come from driver-side metadata I/O instead. Any other plan shape
  * (filters, joins, in-memory state, checkpoints) returns None and the
  * caller falls back to `count()` — correctness never depends on the
  * fast path firing. */
object PlanCounts {

  private def parquetScanOf(p: LogicalPlan): Option[HadoopFsRelation] =
    p match {
      // bare column pruning only: any filter/generator/aggregate bails
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        parquetScanOf(child)
      case l: LogicalRelation =>
        l.relation match {
          case r: HadoopFsRelation
              if r.fileFormat.isInstanceOf[ParquetFileFormat] &&
                r.partitionSchema.isEmpty =>
            Some(r)
          case _ => None
        }
      case _ => None
    }

  /** Exact row count from footers when the OPTIMIZED plan is a pure
    * projection over an unpartitioned parquet scan; None otherwise. */
  def metadataRowCount(df: DataFrame): Option[Long] =
    parquetScanOf(df.queryExecution.optimizedPlan).map { rel =>
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      rel.location.inputFiles.iterator.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    }

  /** [[metadataRowCount]] with the `count()` fallback inlined. */
  def rowCount(df: DataFrame): Long =
    metadataRowCount(df).getOrElse(df.count())
}

package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Marker-validated access to persisted history tables — the
  * OPERATOR-side enforcement of the [[HistoryFormat]] contract.
  *
  * The markers exist to catch the silent-no-matches regime (an index
  * whose keys were derived under an older format simply stops matching
  * anything), but a marker only protects the probes that actually check
  * it. Callers composing their own pipelines shouldn't have to remember
  * the `ensure` call: every path-taking history probe
  * (`*Table` overloads on Dedup / SpanDedup / Curation / Similarity,
  * and [[graft.operators.Bpe.load]]) routes through [[readChecked]], so
  * a stale-format table refuses FROM THE OPERATOR with the rebuild
  * remedy named. DataFrame-taking overloads cannot know the table's
  * directory — their docs state that the caller owns the check. */
object HistoryTables {

  /** Read a history table after validating its format marker. Delta
    * tables and plain parquet directories both work (the marker file is
    * ignored by both readers). Refuses loudly when the marker is absent
    * or names a different format version ([[HistoryFormat.ensure]]);
    * a directory with no table at all is a caller bug, not a fresh
    * table — probing nothing silently would be the exact failure mode
    * the marker guards against. */
  def readChecked(spark: SparkSession, dir: String,
      fmt: HistoryFormat.Format): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val w = new graft.delta.DeltaWriter(spark, conf)
    val isDelta = w.tableExists(dir)
    if (!isDelta && !hasParquet(spark, dir))
      throw new IllegalStateException(
        s"no history table at $dir — build and persist the index before " +
          s"probing it (expected format ${fmt.name} v${fmt.version})")
    HistoryFormat.ensure(conf, dir, fmt, hasData = true)
    if (isDelta) w.read(dir) else spark.read.parquet(dir)
  }

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
  }
}

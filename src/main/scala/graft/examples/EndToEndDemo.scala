package graft.examples

import graft._
import graft.sinks.ParquetSink
import graft.sources._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo of the incremental pipeline on real parquet input —
  * the Spark re-expression of the reference's
  * `scripts/sql_end_to_end_demo.py` (SURVEY §7.3): ingest the `events`
  * table file-by-file, run a SQL aggregation per batch, write per-batch
  * parquet, and prove a rerun reprocesses nothing.
  *
  * Run: sbt "runMain graft.examples.EndToEndDemo /tmp/graft-demo"
  */
object EndToEndDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-demo")
    val spark = GraftSession.local(4, "graft-demo")
    spark.sparkContext.setLogLevel("ERROR")

    val in = s"$work/in"; val cp = s"$work/checkpoint"; val out = s"$work/out"

    // Stage the driver-generated events table as 3 incoming files.
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.withColumn("bucket", pmod(col("event_id"), lit(3)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$work/staged")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { b =>
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/staged/bucket=$b/*.parquet"))(0)
      fs.mkdirs(new org.apache.hadoop.fs.Path(in))
      fs.rename(part.getPath, new org.apache.hadoop.fs.Path(s"$in/events_$b.parquet"))
    }

    def pipeline() = {
      val ckpt = new FileStreamCheckpoint(cp, spark.sparkContext.hadoopConfiguration)
      val source = new FileSource(in, ckpt, "parquet",
        FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
      new Pipeline(
        source = source,
        reader = ctx => ctx.spark.read.parquet(ctx.files: _*),
        transform = Some((df, ctx) => {
          df.createOrReplaceTempView("events_batch")
          ctx.spark.sql(
            """SELECT user_id, event_type, COUNT(*) AS event_count,
              |       ROUND(SUM(value), 2) AS total_value
              |FROM events_batch WHERE value >= 0
              |GROUP BY user_id, event_type""".stripMargin)
        }),
        writer = (df, ctx) => ParquetSink.writeBatch(df, out, ctx.batchId),
        observer = new LoggingObserver,
        spark = spark)
    }

    println("== first run ==")
    val r1 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"run1: batches=${r1.batchesProcessed} lastBatchId=${r1.lastBatchId}")
    println("== second run (should be idle) ==")
    val r2 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"run2: batches=${r2.batchesProcessed}")
    val result = spark.read.parquet(s"$out/batch_*")
    println(s"output rows=${result.count()} distinct users=${result.select("user_id").distinct.count()}")
    result.orderBy("user_id", "event_type").show(5)
    println("checkpoint artifacts:")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$cp/offsets"))
      .foreach(s => println(s"  offsets/${s.getPath.getName}"))
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$cp/commits"))
      .foreach(s => println(s"  commits/${s.getPath.getName}"))
    spark.stop()
  }
}

package graft.examples

import graft._
import graft.sinks.ParquetSink
import graft.sources._
import graft.streaming.Patterns
import org.apache.spark.sql.functions._

/** Stateful micro-batch demo: ingest `events` in 3 files through a
  * pipeline whose transform chains the engine's cross-batch state patterns
  * — watermark split, seen-key dedup, incremental aggregation — the Spark
  * re-expression of the reference's advanced-patterns examples.
  *
  * Run: sbt "runMain graft.examples.StatefulDemo /tmp/graft-stateful"
  */
object StatefulDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-stateful")
    val spark = GraftSession.local(4, "graft-stateful")
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$work/in"; val cp = s"$work/checkpoint"; val out = s"$work/out"

    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // stage with ts normalized to nano-epoch long whatever the generation's
    // physical type — watermarkSplit's documented numeric contract
    val events = raw.withColumn("ts",
      graft.util.EventTime.asEpochMicros(raw) * 1000L)
    events.withColumn("bucket", pmod(col("event_id"), lit(3)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$work/staged")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { b =>
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/staged/bucket=$b/*.parquet"))(0)
      fs.mkdirs(new org.apache.hadoop.fs.Path(in))
      fs.rename(part.getPath, new org.apache.hadoop.fs.Path(s"$in/events_$b.parquet"))
    }

    val ckpt = new FileStreamCheckpoint(cp, spark.sparkContext.hadoopConfiguration)
    val source = new FileSource(in, ckpt, "parquet",
      FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
    val pipeline = new Pipeline(
      source = source,
      transform = Some((df, ctx) => {
        // 1) watermark: drop events older than 7 days behind the max seen
        val split = Patterns.watermarkSplit(df, "ts",
          allowedLatenessMs = 7L * 24 * 3600 * 1000, ctx.state, nanos = true)
        println(s"  batch ${ctx.batchId}: watermark=${split.watermark
          .map(_ / 1000000000L)} late=${split.late.count()}")
        // 2) cross-batch dedup on event_id
        val fresh = Patterns.dedupAcrossBatches(split.onTime, Seq("event_id"), ctx.state)
        // 3) incremental per-user aggregate
        Patterns.incrementalAgg(fresh, ctx.state, "per_user",
          partial = b => b.groupBy("user_id")
            .agg(count(lit(1)).as("n"), sum("value").as("v")),
          merge = (a, b) => a.unionByName(b).groupBy("user_id")
            .agg(sum("n").as("n"), sum("v").as("v")))
      }),
      writer = (df, ctx) => ParquetSink.writeBatch(df, out, ctx.batchId),
      spark = spark)

    val r = pipeline.run(RunOptions(once = false, sleepMs = 0))
    println(s"batches=${r.batchesProcessed}")
    val finalAgg = spark.read.parquet(s"$out/batch_${r.lastBatchId.get}")
    println(s"final per-user rows=${finalAgg.count()}")
    val total = finalAgg.agg(sum("n")).head().getLong(0)
    println(s"total events aggregated=$total (of ${events.count()})")
    // replay proof: dedup state means a rerun adds nothing
    val r2 = pipeline.run(RunOptions(once = false, sleepMs = 0))
    println(s"rerun batches=${r2.batchesProcessed}")
    spark.stop()
  }
}

package graft.examples

import graft._
import graft.streaming.StructuredRunner
import graft.streaming.StructuredRunner.StreamSpec
import org.apache.spark.sql.functions._

/** Structured Streaming demo: the events table as a file stream —
  * readStream → watermark → tumbling-window aggregation → foreachBatch
  * parquet sink, with Spark-managed checkpoints (AvailableNow drains the
  * backlog and stops; rerun processes nothing).
  *
  * Run: sbt "runMain graft.examples.StreamingDemo /tmp/graft-streaming"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-streaming")
    val spark = GraftSession.local(4, "graft-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$work/in"; val cp = s"$work/cp"; val out = s"$work/out"

    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val events = raw
      .withColumn("event_ts", graft.util.EventTime.asTimestamp(raw))
      .drop("ts")
    events.write.mode("overwrite").parquet(s"$in/seed")

    val spec = StreamSpec(inputDir = s"$in/*", schema = events.schema,
      maxFilesPerTrigger = Some(2))
    var batches = 0
    val q = StructuredRunner.run(spark, spec, cp,
      transform = df => df
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total")),
      writer = (batch, id) => {
        batches += 1
        graft.sinks.ParquetSink.writeBatch(batch, out, id)
        println(s"  micro-batch $id: ${batch.count()} window rows")
      })
    q.awaitTermination(120000)
    println(s"drained in $batches micro-batches")

    var batches2 = 0
    val q2 = StructuredRunner.run(spark, spec, cp,
      writer = (_, _) => batches2 += 1)
    q2.awaitTermination(120000)
    println(s"rerun micro-batches=$batches2 (checkpointed, nothing new)")
    spark.stop()
  }
}

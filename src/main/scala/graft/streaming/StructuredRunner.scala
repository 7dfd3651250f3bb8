package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming-native runner: the same reader→transform→writer
  * shape as [[graft.Pipeline]], but driven by Spark's streaming engine
  * (`readStream` → transforms → `foreachBatch`), for users who want
  * Spark-managed checkpoints, watermarks, and stateful operators instead
  * of graft's inspectable WAL.
  *
  * The two runners are complementary by design (SURVEY §7.1): graft's
  * explicit micro-batch driver gives integer batch ids, checkpoint
  * truncate/reset, and arbitrary per-batch control; this runner gives
  * `withWatermark`/windowed aggregation/`dropDuplicates` state managed by
  * the streaming engine, exactly-once file sinks, and continuous triggers.
  * Both write through the same sinks.
  *
  * At scale this is the standard Spark deployment shape: a streaming query
  * per source, `maxFilesPerTrigger` for admission control, and
  * `foreachBatch` for arbitrary batch sinks (including
  * [[graft.DeltaCdc.applyCdcDelta]]).
  */
object StructuredRunner {

  case class StreamSpec(
      inputDir: String,
      format: String = "parquet",
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None,
      options: Map[String, String] = Map.empty)

  /** Build the streaming DataFrame for a file-stream spec. */
  def readStream(spark: SparkSession, spec: StreamSpec): DataFrame = {
    var reader = spark.readStream.format(spec.format).schema(spec.schema)
      .options(spec.options)
    spec.maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n.toString))
    reader.load(spec.inputDir)
  }

  /** Run `transform` over the stream, delivering each micro-batch to
    * `writer` via foreachBatch. `availableNow` processes the backlog then
    * stops (the streaming analogue of Pipeline's `once=false` drain). */
  def run(
      spark: SparkSession,
      spec: StreamSpec,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity,
      writer: (DataFrame, Long) => Unit,
      availableNow: Boolean = true,
      outputMode: String = "update"): StreamingQuery = {
    val transformed = transform(readStream(spark, spec))
    // update mode: aggregations emit per micro-batch instead of waiting for
    // the watermark to close windows (append would emit nothing until then)
    val q = transformed.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writer(batch, batchId)
      }
      .start()
    q
  }
}

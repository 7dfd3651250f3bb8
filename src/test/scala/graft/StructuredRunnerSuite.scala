package graft

import graft.streaming.StructuredRunner
import graft.streaming.StructuredRunner.StreamSpec
import org.apache.spark.sql.functions._

class StructuredRunnerSuite extends SparkSpec {
  import spark.implicits._

  test("file stream drains backlog via AvailableNow, checkpoints, no reprocessing") {
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/out"
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
        .write.parquet(s"$in/batch0")
      // flatten: spark file stream reads the dir tree
      val spec = StreamSpec(
        inputDir = s"$in/*",
        schema = Seq((1L, 1.0)).toDF("id", "v").schema,
        maxFilesPerTrigger = Some(1))
      val counts = scala.collection.mutable.ArrayBuffer[Long]()
      val q = StructuredRunner.run(spark, spec, cp,
        transform = df => df.filter(col("v") > 0),
        writer = (batch, id) => {
          counts += batch.count()
          graft.sinks.ParquetSink.writeBatch(batch, out, id)
        })
      q.awaitTermination(60000)
      assert(counts.sum === 2)
      // second run: nothing new
      val counts2 = scala.collection.mutable.ArrayBuffer[Long]()
      val q2 = StructuredRunner.run(spark, spec, cp,
        writer = (batch, _) => counts2 += batch.count())
      q2.awaitTermination(60000)
      assert(counts2.sum === 0)
      // new file -> only the delta processed
      Seq((3L, 30.0)).toDF("id", "v").write.parquet(s"$in/batch1")
      val counts3 = scala.collection.mutable.ArrayBuffer[Long]()
      val q3 = StructuredRunner.run(spark, spec, cp,
        writer = (batch, _) => counts3 += batch.count())
      q3.awaitTermination(60000)
      assert(counts3.sum === 1)
    }
  }

  test("windowed aggregation with watermark over a stream") {
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val events = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 5.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:40"), 7.0),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 00:01:10"), 1.0))
        .toDF("id", "ts", "v")
      events.write.parquet(s"$in/batch0")
      val spec = StreamSpec(inputDir = s"$in/*", schema = events.schema)
      val results = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      val q = StructuredRunner.run(spark, spec, cp,
        transform = df => df
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 minute"))
          .agg(count(lit(1)).as("n")),
        writer = (batch, _) => batch.collect().foreach { r =>
          results += ((r.getStruct(0).getTimestamp(0).toString, r.getLong(1)))
        })
      q.awaitTermination(60000)
      // AvailableNow + watermark: both windows eventually emitted (update mode
      // inside foreachBatch delivers the complete aggregation per batch)
      assert(results.map(_._2).sum === 3)
      assert(results.size === 2)
    }
  }
}

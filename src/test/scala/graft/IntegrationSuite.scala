package graft

import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.sinks.ParquetSink
import graft.sources._
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.Files

/** End-to-end scenarios mirroring the reference's executable demo scripts
  * (SURVEY §5.2 item 4): multi-batch ingest with schema drift, and the
  * CDF-consume→CDC-merge pipeline (`scripts/cdf_read_demo.py`). */
class IntegrationSuite extends SparkSpec {
  import spark.implicits._

  private def stageFile(dir: String, name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = s"$dir/.stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles().find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(new File(dir).toPath)
    Files.move(part.toPath, new File(dir, name).toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new File(staging))
  }

  test("schema drift across batches: add_new_columns evolves and null-fills") {
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/out"
      stageFile(in, "b0.parquet", Seq((1L, 10L)).toDF("id", "value"))
      stageFile(in, "b1.parquet", Seq((2L, 20L, "eu")).toDF("id", "value", "region"))
      stageFile(in, "b2.parquet", Seq((3L, 30L)).toDF("id", "value"))

      val source = new FileSource(in, new FileStreamCheckpoint(cp, conf), "parquet",
        FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
      val p = new Pipeline(
        source = source,
        schemaEvolution = Some(new SchemaEvolution(SchemaPolicy.AddNewColumns)),
        writer = (df, ctx) => ParquetSink.writeBatch(df, out, ctx.batchId),
        spark = spark)
      val r = p.run(RunOptions(once = false, sleepMs = 0))
      assert(r.batchesProcessed === 3)

      // batch 0 wrote the original 2-column schema (region arrived later);
      // batches 1 and 2 carry the evolved 3-column schema
      assert(spark.read.parquet(s"$out/batch_0").columns.toSeq === Seq("id", "value"))
      val b1 = spark.read.parquet(s"$out/batch_1")
      assert(b1.columns.toSeq === Seq("id", "value", "region"))
      val b2 = spark.read.parquet(s"$out/batch_2")
      assert(b2.columns.toSeq === Seq("id", "value", "region"))
      assert(b2.head().isNullAt(2), "missing region null-filled after evolution")
      // unified read-back: evolved schema covers all batches
      val all = spark.read.schema(b1.schema).parquet(s"$out/batch_*").orderBy("id")
      assert(all.count() === 3)
      assert(all.collect().map(r0 => Option(r0.getString(2))).toSeq ===
        Seq(None, Some("eu"), None))
    }
  }

  test("CDF pipeline: consume change feed -> merge into downstream Delta table") {
    withTmpDir { tmp =>
      val src = s"$tmp/source_table"; val cp = s"$tmp/cp"; val sink = s"$tmp/sink_table"
      val w = new DeltaWriter(spark, conf)

      // upstream table evolves with CDF emission
      w.write(Seq((1L, 100L), (2L, 200L)).toDF("id", "v"), src, DeltaWriteMode.Append,
        cdfChanges = Some(Seq((1L, 100L, "insert"), (2L, 200L, "insert"))
          .toDF("id", "v", Cdc.ChangeTypeCol)))
      w.write(Seq((1L, 101L), (2L, 200L), (3L, 300L)).toDF("id", "v"), src,
        DeltaWriteMode.Overwrite,
        cdfChanges = Some(Seq((1L, 101L, "update_postimage"), (3L, 300L, "insert"))
          .toDF("id", "v", Cdc.ChangeTypeCol)))

      val deltaSrc = new DeltaSource(src, new DeltaTableCheckpoint(cp, conf),
        DeltaSourceOptions(startOffset = DeltaStartOffset.Earliest, readChangeFeed = true))
      val p = new Pipeline(
        source = deltaSrc,
        writer = (df, _) => {
          val res = DeltaCdc.applyCdcDelta(spark, df, sink, Seq("id"))
          Map("rows_out" -> res.rowsOut.toString, "action" -> res.action)
        },
        spark = spark)
      val r = p.run(RunOptions(once = false, sleepMs = 0))
      assert(r.batchesProcessed >= 1)

      val merged = w.read(sink).orderBy("id").collect()
        .map(row => (row.getLong(row.fieldIndex("id")), row.getLong(row.fieldIndex("v"))))
      assert(merged.toSeq === Seq((1L, 101L), (2L, 200L), (3L, 300L)))

      // a delete flows through the same pipeline into the sink
      w.write(Seq((1L, 101L), (3L, 300L)).toDF("id", "v"), src, DeltaWriteMode.Overwrite,
        cdfChanges = Some(Seq((2L, 200L, "delete")).toDF("id", "v", Cdc.ChangeTypeCol)))
      val r2 = p.run(RunOptions(once = false, sleepMs = 0))
      assert(r2.batchesProcessed === 1)
      val afterDelete = w.read(sink).orderBy("id").collect().map(_.getLong(0))
      assert(afterDelete.toSeq === Seq(1L, 3L))
    }
  }
}

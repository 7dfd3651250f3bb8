package graft.examples

import graft._
import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.sources._
import org.apache.spark.sql.functions._

/** Exactly-once CDC into Delta, end to end: an at-least-once incremental
  * pipeline ingests change files, merges them into a Delta table with the
  * touched-files MERGE, and stamps every batch with a SetTransaction
  * watermark — then the demo CRASHES the pipeline between the sink write
  * and the WAL commit, replays, and proves the table holds exactly one
  * copy of every change, with the untouched files never rewritten.
  *
  * Run: sbt "runMain graft.examples.ExactlyOnceCdcDemo /tmp/graft-eo"
  */
object ExactlyOnceCdcDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-eo")
    val spark = GraftSession.local(4, "graft-eo-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val in = s"$work/in"; val cp = s"$work/checkpoint"; val table = s"$work/state"
    val hconf = spark.sparkContext.hadoopConfiguration
    val w = new DeltaWriter(spark, hconf)

    // seed the Delta table, then stage two change-feed files
    w.write((0L until 100L).map(i => (i, 0L)).toDF("id", "v").coalesce(2),
      table, DeltaWriteMode.Append)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(hconf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(in))
    def stage(name: String, rows: Seq[(Long, Long, String, Long)]): Unit = {
      rows.toDF("id", "v", Cdc.ChangeTypeCol, Cdc.CommitVersionCol)
        .coalesce(1).write.mode("overwrite").parquet(s"$work/stage")
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/stage/*.parquet"))(0)
      fs.rename(part.getPath, new org.apache.hadoop.fs.Path(s"$in/$name"))
    }
    stage("changes_0.parquet", Seq((1L, 11L, "update_postimage", 1L),
      (2L, 0L, "delete", 1L), (200L, 1L, "insert", 1L)))
    stage("changes_1.parquet", Seq((3L, 33L, "update_postimage", 2L)))

    var crashOnce = true
    def pipeline() = {
      val ckpt = new FileStreamCheckpoint(cp, hconf)
      val source = new FileSource(in, ckpt, "parquet",
        FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
      new Pipeline(
        source = source,
        reader = ctx => source.readBatch(ctx.spark, graft.core.BatchInfo(ctx.batchId,
          ctx.files.map(p => graft.core.FileEntry(p, 0, 0)), graft.util.Jsons.obj())),
        transform = None,
        writer = (df, ctx) => {
          // idempotence guard: a replayed batch is a no-op
          val seen = w.lastTxnVersion(table, "cdc-demo")
          if (seen.exists(_ >= ctx.batchId)) Map("skipped" -> "replay")
          else {
            // the SetTransaction watermark rides the merge commit itself —
            // atomic: no window where data landed without its watermark
            val r = DeltaCdc.applyCdcDelta(spark, df, table, Seq("id"),
              txn = Some(("cdc-demo", ctx.batchId)))
            if (crashOnce) { crashOnce = false; sys.error("simulated crash before WAL commit") }
            Map("rows_out" -> r.rowsOut.toString, "action" -> r.action)
          }
        },
        spark = spark)
    }

    println("run1 (crashes after the sink write of batch 0):")
    try pipeline().run(RunOptions(once = false, sleepMs = 0))
    catch { case e: Exception => println(s"  crashed as planned: ${e.getMessage}") }
    println("run2 (replays batch 0 as a no-op, then batch 1):")
    val r2 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"  batches=${r2.batchesProcessed}")

    val out = w.read(table).orderBy("id")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    val check = rows.count(_._1 == 200L) == 1 && !rows.exists(_._1 == 2L) &&
      rows.find(_._1 == 1L).exists(_._2 == 11L) &&
      rows.find(_._1 == 3L).exists(_._2 == 33L) && rows.length == 100
    println(s"final table: ${rows.length} rows; " +
      s"exactly-once check: ${if (check) "PASS" else "FAIL"}")
    assert(check, "exactly-once semantics violated")
    spark.stop()
  }
}

package graft.examples

import graft.GraftSession
import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

/** Measures the per-batch span-history SCAN cost the cross-batch
  * incremental span dedup pays ([[SpanDedup.spansWithHistory]] reads the
  * whole gram-owner history every batch — the semi-join bounds compute
  * and shuffle, not the scan), and what [[SpanDedup.compactIndex]] does
  * to it: 10 batches over a corpus with realistic cross-batch overlap
  * (each batch re-sends ~60% of a shared boilerplate pool under fresh
  * ids plus ~40% novel text), run twice — raw append-only history vs
  * aggregating compaction after every batch.
  *
  * The recorded numbers are the history table's rows and on-disk bytes
  * AT BATCH START — exactly the scan `spansWithHistory` issues for that
  * batch. Raw grows with batch LIFETIME (every overlapping batch
  * re-appends the shared grams); compacted is capped at the corpus's
  * distinct-gram count, so the curve flattens once the boilerplate pool
  * is covered. Published in README "scaling notes".
  *
  * Run: sbt "runMain graft.examples.SpanHistoryScaling /tmp/graft-shs"
  */
object SpanHistoryScaling {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-shs")
    val spark = GraftSession.local(8, "graft-span-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    // fixed boilerplate pool: 120 bodies every batch draws from (the
    // cross-batch duplication source), plus per-batch novel prose
    val pool = docs.filter(col("doc_id") < 120)

    def batchDf(b: Int) = {
      val resent = pool.filter(pmod(col("doc_id"), lit(5)) < 3) // ~60%
        .select((col("doc_id") + b * 10000L).as("doc_id"),
          concat(lit(s"batch $b preamble "), col("text")).as("text"))
      val novel = docs.filter(col("doc_id") >= 120 + b * 40 &&
          col("doc_id") < 160 + b * 40)
        .select((col("doc_id") + b * 10000L).as("doc_id"),
          concat(lit(s"novel b$b "), col("text")).as("text"))
      resent.unionByName(novel)
    }

    case class Point(batch: Int, rows: Long, bytes: Long, spans: Long)

    def run(mode: String, compactEveryBatch: Boolean): Seq[Point] = {
      val hist = s"$work/$mode/history"
      val w = new DeltaWriter(spark, conf)
      (0 until 10).map { b =>
        val df = batchDf(b)
        val (rows, bytes) =
          if (w.tableExists(hist))
            (w.read(hist).count(), w.activeAdds(hist).map(_.size).sum)
          else (0L, 0L)
        val histDf =
          if (w.tableExists(hist)) w.read(hist)
          else Seq.empty[(Long, Long, Long, Long)].toDF("h1", "h2", "own", "occ")
        val spans = SpanDedup.spansWithHistory(df, histDf,
          "doc_id", "text", n = 10).count()
        w.write(SpanDedup.ownerIndex(df, "doc_id", "text", n = 10), hist,
          DeltaWriteMode.Append)
        if (compactEveryBatch)
          w.write(SpanDedup.compactIndex(w.read(hist)), hist,
            DeltaWriteMode.Overwrite)
        Point(b, rows, bytes, spans)
      }
    }

    val raw = run("raw", compactEveryBatch = false)
    val comp = run("compacted", compactEveryBatch = true)

    println("batch | raw rows | raw KiB | compacted rows | compacted KiB")
    raw.zip(comp).foreach { case (r, c) =>
      println(f"${r.batch}%5d | ${r.rows}%8d | ${r.bytes / 1024}%7d | " +
        f"${c.rows}%14d | ${c.bytes / 1024}%13d")
    }
    // span RESULTS must be identical — compaction is a pure scan-cost
    // optimization, never a semantics change
    val same = raw.map(_.spans) == comp.map(_.spans)
    println(s"per-batch span counts identical across modes: $same " +
      s"(${raw.map(_.spans).mkString(",")})")
    val rawGrowth = raw.last.rows.toDouble / raw(3).rows
    val compGrowth = comp.last.rows.toDouble / comp(3).rows
    println(f"batch-3 -> batch-9 history growth: raw ${rawGrowth}%.2fx, " +
      f"compacted ${compGrowth}%.2fx")
    spark.stop()
    if (!same) sys.exit(1)
  }
}

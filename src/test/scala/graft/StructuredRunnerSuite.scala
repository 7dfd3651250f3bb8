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

  test("stream-stream interval join matches within the window, expires outside it") {
    import graft.streaming.Patterns
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    withTmpDir { tmp =>
      val impDir = s"$tmp/imp"; val clkDir = s"$tmp/clk"; val cp = s"$tmp/cp"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val imps = Seq(
        (1L, ts("2024-01-01 00:00:00")),
        (2L, ts("2024-01-01 00:10:00"))).toDF("ad_id", "imp_ts")
      val clicks = Seq(
        (1L, ts("2024-01-01 00:02:00")), // 2 min after impression 1 -> match
        (2L, ts("2024-01-01 00:20:00"))) // 10 min after impression 2 -> outside
        .toDF("ad_id", "clk_ts")
      imps.write.parquet(s"$impDir/b0")
      clicks.write.parquet(s"$clkDir/b0")
      val l = spark.readStream.schema(imps.schema).parquet(s"$impDir/*")
      val r = spark.readStream.schema(clicks.schema).parquet(s"$clkDir/*")
      val joined = Patterns.intervalJoin(l, "imp_ts", r, "clk_ts",
        Seq("ad_id"), within = "5 minutes")
      assert(joined.isStreaming, "join of two streams must stay a stream")
      val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(row =>
            out += ((row.getLong(0), row.getTimestamp(3).toString)))
        }
        .start()
      q.awaitTermination(120000)
      assert(out.toSeq === Seq((1L, "2024-01-01 00:02:00.0")),
        s"exactly the in-window click must join, got $out")
    }
  }

  test("left-outer stream-stream join emits null rows after the watermark closes the window") {
    import graft.streaming.Patterns
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    withTmpDir { tmp =>
      val impDir = s"$tmp/imp"; val clkDir = s"$tmp/clk"; val cp = s"$tmp/cp"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 0: one matched impression, one that will never see a click
      Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:10:00")))
        .toDF("ad_id", "imp_ts").write.parquet(s"$impDir/b0")
      Seq((1L, ts("2024-01-01 00:02:00")))
        .toDF("ad_id", "clk_ts").write.parquet(s"$clkDir/b0")
      // batch 1: watermark pushers on BOTH sides — outer rows only emit
      // once both watermarks pass the join window's end, which a
      // single-batch run never triggers
      Seq((99L, ts("2024-01-01 01:00:00")))
        .toDF("ad_id", "imp_ts").write.parquet(s"$impDir/b1")
      Seq((99L, ts("2024-01-01 01:00:00")))
        .toDF("ad_id", "clk_ts").write.parquet(s"$clkDir/b1")
      def src(dir: String, schema: org.apache.spark.sql.types.StructType) =
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$dir/*")
      val l = src(impDir, Seq((1L, ts("2024-01-01 00:00:00"))).toDF("ad_id", "imp_ts").schema)
      val r = src(clkDir, Seq((1L, ts("2024-01-01 00:02:00"))).toDF("ad_id", "clk_ts").schema)
      val joined = Patterns.intervalJoin(l, "imp_ts", r, "clk_ts",
        Seq("ad_id"), within = "5 minutes",
        leftWatermark = "1 minute", rightWatermark = "1 minute",
        joinType = "left_outer")
      val out = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(row =>
            out += ((row.getLong(0),
              if (row.isNullAt(3)) None else Some(row.getTimestamp(3).toString))))
        }
        .start()
      q.awaitTermination(120000)
      val byAd = out.toSeq.sortBy(_._1)
      assert(byAd.contains((1L, Some("2024-01-01 00:02:00.0"))),
        s"in-window click must join: $out")
      assert(byAd.contains((2L, None)),
        s"unmatched impression must emit with NULL once the window closes: $out")
      assert(byAd.contains((99L, Some("2024-01-01 01:00:00.0"))), s"$out")
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

  test("curation under the streaming engine: history dedup + txn sinks survive checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.{Curation, Dedup}
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val fpHist = s"$tmp/fp"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      file(0, Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different second document")))
      // doc 3 re-encodes doc 1's content (case/punct) — the cross-batch
      // fingerprint history must drop it; doc 4 is novel
      file(1, Seq((3L, "The QUICK brown fox, jumps over the lazy dog!!"),
        (4L, "a genuinely novel fourth document")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "scurate"
            val keyed = Dedup.exact(batch.withColumn("fp",
              md5(Curation.normalizeText(col("text")))), Seq("fp"), "doc_id")
            val fresh =
              if (w.tableExists(fpHist))
                keyed.join(w.read(fpHist), Seq("fp"), "left_anti")
              else keyed
            // the same dual SetTransaction guard as the explicit-driver
            // demo — Spark-managed batch ids stand in for the WAL's
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(fresh.drop("fp"), curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(fpHist, appId).exists(_ >= batchId))
              w.write(fresh.select("fp"), fpHist, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def curatedIds() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(curatedIds() === Set(1L, 2L, 4L),
        "the cross-batch re-encoding must dedup against the history")
      // idle re-run: the streaming checkpoint admits nothing new
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L))
      // LOSE the streaming checkpoint: the engine replays every file from
      // scratch under fresh batch ids — the SetTransaction watermarks must
      // turn the whole replay into no-ops (exactly-once across engine
      // restarts, not just within one checkpoint lineage)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L),
        "replay after checkpoint loss must not duplicate any batch")
      assert(w.read(fpHist).count() === 3L)
    }
  }

  test("bloom novelty gate under the streaming engine, across checkpoint loss") {
    // the bloom-screened history gate is a drop-in for the plain anti-join
    // (identical result set, history-never-shuffles plan) — so it must
    // satisfy the same streaming contract: exactly-once across checkpoint
    // deletion under the SetTransaction watermarks
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.{Curation, Dedup}
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val fpHist = s"$tmp/fp"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      file(0, Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely different second document")))
      file(1, Seq((3L, "The QUICK brown fox, jumps over the lazy dog!!"),
        (4L, "a genuinely novel fourth document")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "sbloom"
            val keyed = Dedup.exact(batch.withColumn("fp",
              md5(Curation.normalizeText(col("text")))), Seq("fp"), "doc_id")
            val fresh =
              if (w.tableExists(fpHist))
                Dedup.bloomNoveltyScreen(keyed, w.read(fpHist), "fp",
                  expectedItems = 1000L, fpp = 0.01)
              else keyed
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(fresh.drop("fp"), curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(fpHist, appId).exists(_ >= batchId))
              w.write(fresh.select("fp"), fpHist, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def curatedIds() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(curatedIds() === Set(1L, 2L, 4L),
        "the bloom gate must drop the cross-batch re-encoding")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L),
        "replay after checkpoint loss must not duplicate any batch")
      assert(w.read(fpHist).count() === 3L)
    }
  }

  test("span + minhash history operators under the streaming engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.{Dedup, SpanDedup}
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"
      val gramHist = s"$tmp/grams"; val sigHist = s"$tmp/sigs"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      val run = ('a' to 'l').map(_.toString).mkString(" ") // 12-token run
      val novelA = (1 to 40).map(i => s"alpha$i").mkString(" ")
      file(0, Seq((10L, run), (11L, novelA)))
      // batch 1: doc 5 QUOTES batch 0's run (cross-batch span excision);
      // doc 6 is a lightly-edited copy of doc 11 (cross-batch minhash
      // near-dup — dropped whole); doc 7 is novel
      file(1, Seq(
        (5L, "p q r " + run),
        (6L, novelA.replace("alpha5 ", "edited5 ")),
        (7L, (1 to 40).map(i => s"gamma$i").mkString(" "))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            // the foreachBatch cloned-session bug class: every
            // cross-batch READ here goes through tables written by
            // earlier micro-batches of the same query
            val w = new DeltaWriter(spark, conf)
            val appId = "shist"
            // near-dup drop against the signature history; the probe
            // reads only rows with batch_id < this batch, so a replayed
            // batch can never flag itself against its own index
            val kept =
              if (w.tableExists(sigHist)) {
                val flagged = Dedup.minhashAgainstHistory(
                  batch, w.read(sigHist).filter(col("batch_id") < batchId),
                  "doc_id", "text", threshold = 0.5)
                  .select("doc_id").distinct()
                batch.join(flagged, Seq("doc_id"), "left_anti")
              } else batch
            // span excision against the gram-owner history (idempotent
            // against a history containing this batch's own index —
            // replay-safe at any crash point)
            val grams =
              if (w.tableExists(gramHist)) w.read(gramHist)
              else Seq.empty[(Long, Long, Long, Long)]
                .toDF("h1", "h2", "own", "occ")
            val sp = SpanDedup.spansWithHistory(
              kept, grams, "doc_id", "text", n = 12)
            val cleaned = SpanDedup.applySpans(kept, sp, "doc_id", "text")
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(cleaned, curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(gramHist, appId).exists(_ >= batchId))
              w.write(SpanDedup.ownerIndex(kept, "doc_id", "text", n = 12),
                gramHist, DeltaWriteMode.Append, txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(sigHist, appId).exists(_ >= batchId))
              w.write(Dedup.minhashIndex(kept, "doc_id", "text")
                  .withColumn("batch_id", lit(batchId)),
                sigHist, DeltaWriteMode.Append, txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def state() = w.read(curated).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
        .toMap
      val s1 = state()
      assert(s1.keySet === Set(10L, 11L, 5L, 7L),
        "near-dup doc 6 must drop against the signature history")
      assert(s1(5L) === ("p q r", 12L),
        "a later micro-batch must lose the span quoted from an earlier one")
      assert(s1(10L)._2 === 0L && s1(11L)._2 === 0L && s1(7L)._2 === 0L)
      // idle re-run admits nothing
      runOnce()
      assert(state() === s1)
      // LOSE the streaming checkpoint: the engine replays every file
      // under fresh batch ids — SetTransaction watermarks + the batch_id
      // probe filter must make the replay byte-identical
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(state() === s1,
        "replay after checkpoint loss must not duplicate or re-excise")
      assert(w.read(sigHist).filter(col("doc_id") === 6L).count() === 0L)
    }
  }

  test("decontamination screen under the streaming engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Dedup
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val idxPath = s"$tmp/bench_index"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // the eval registry persists BEFORE the stream starts — a static
      // read-only input, so the screen is stateless per micro-batch
      val evalText = "the canonical benchmark prompt asks the model to " +
        "summarize the quarterly revenue table in exactly three sentences"
      Dedup.benchmarkGramIndex(
        Seq((900L, evalText)).toDF("doc_id", "text"), "doc_id", "text", n = 12)
        .write.mode("overwrite").parquet(idxPath)
      // batch 0: a clean doc AND the eval member itself; batch 1: a leak
      // quoting the eval text behind a fresh preamble, plus a clean doc
      file(0, Seq((1L, (1 to 30).map(i => s"alpha$i").mkString(" ")),
        (2L, evalText)))
      file(1, Seq((3L, "novel framing before the quote " + evalText),
        (4L, (1 to 30).map(i => s"beta$i").mkString(" "))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val hits = Dedup.contaminationAgainstIndex(
              batch, "doc_id", "text", spark.read.parquet(idxPath),
              n = 12, minShared = 20)
              .select(col("corpus_id").as("doc_id")).distinct()
            val screened = batch.join(hits, Seq("doc_id"), "left_anti")
            if (!w.lastTxnVersion(curated, "decon").exists(_ >= batchId))
              w.write(screened, curated, DeltaWriteMode.Append,
                txn = Some(("decon", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def ids() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids() === Set(1L, 4L),
        "the eval member (batch 0) and the quoting leak (batch 1) must " +
        "both be screened; clean docs must flow")
      // idle re-run admits nothing; checkpoint loss replays into no-ops
      runOnce()
      assert(ids() === Set(1L, 4L))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(ids() === Set(1L, 4L),
        "replay after checkpoint loss must not re-admit screened docs")
    }
  }

  test("semantic decon screen under the streaming engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Dedup
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val idxPath = s"$tmp/eval_emb_index"
      def vec(seed: Long): Seq[Float] =
        Seq.tabulate(8)(j => ((seed * 31 + j * 17) % 13 - 6).toFloat)
      def file(n: Int, rows: Seq[(Long, Seq[Float])]): Unit = {
        rows.toDF("doc_id", "v")
          .select(col("doc_id"), col("v").cast("array<float>").as("v"))
          .coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // the eval embedding index persists (marker-stamped) BEFORE the
      // stream starts — static state, stateless per micro-batch
      Dedup.saveEvalEmbeddingIndex(
        Seq((900L, vec(1)), (901L, vec(2))).toDF("bid", "v")
          .select(col("bid"), col("v").cast("array<float>").as("v")),
        "bid", "v", idxPath)
      // batch 0: a clean doc and a paraphrase leak (eval vec 900 scaled
      // 2x -> cosine exactly 1.0); batch 1: a leak of eval 901, a clean
      file(0, Seq((1L, vec(5)), (2L, vec(1).map(_ * 2f))))
      file(1, Seq((3L, vec(2).map(_ * 2f)), (4L, vec(7))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, Seq(1f))).toDF("doc_id", "v")
          .select(col("doc_id"), col("v").cast("array<float>").as("v"))
          .schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val hits = Dedup.semanticContaminationAgainstIndexTable(
              batch, "doc_id", "v", idxPath, tau = 0.99)
              .filter(col("contaminated")).select(col("id").as("doc_id"))
            val screened = batch.join(hits, Seq("doc_id"), "left_anti")
            if (!w.lastTxnVersion(curated, "semdecon").exists(_ >= batchId))
              w.write(screened, curated, DeltaWriteMode.Append,
                txn = Some(("semdecon", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def ids() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids() === Set(1L, 4L),
        "both planted paraphrase leaks must screen; clean docs must flow")
      runOnce()
      assert(ids() === Set(1L, 4L))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(ids() === Set(1L, 4L),
        "replay after checkpoint loss must not re-admit screened docs")
    }
  }

  test("incremental SemDeDup under the streaming engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.{Dedup, Similarity}
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val semHist = s"$tmp/sem"
      // the quantizer persists OUTSIDE the streaming checkpoint: losing
      // the checkpoint loses batch ids, not the model the history's
      // bucket ids were assigned under (and retraining is deterministic
      // anyway — IncrementalCurationDemo pins that)
      val qPath = s"$tmp/quantizer"
      def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
      def file(n: Int, rows: Seq[(Long, Seq[Float])]): Unit = {
        rows.toDF("doc_id", "emb").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 0: two orthogonal docs; batch 1: doc 3 is a SEMANTIC twin
      // of batch 0's doc 1 (cosine ≈ 0.990 ≥ 0.95), doc 4 is novel
      file(0, Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 1, 0, 0))))
      file(1, Seq((3L, vec(0.99, 0.14, 0, 0)), (4L, vec(0, 0, 1, 0))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, vec(1))).toDF("doc_id", "emb").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            // the foreachBatch cloned-session bug class: every
            // cross-batch read goes through tables written by earlier
            // micro-batches of the same query
            val w = new DeltaWriter(spark, conf)
            val appId = "semhist"
            // train ONCE on the first batch, probe every later batch
            // under the SAME persisted model (bucket ids stay comparable)
            val quant =
              if (new java.io.File(qPath).exists())
                Similarity.loadQuantizer(spark, qPath)
              else {
                val m = Similarity.trainIvfCentroids(
                  batch, "doc_id", "emb", nlist = 2)
                Similarity.saveQuantizer(spark, qPath, m)
                m
              }
            // drop semantic twins of PRIOR batches' docs; batch_id <
            // batchId keeps a replayed batch from flagging itself
            // against its own index
            val kept =
              if (w.tableExists(semHist) && quant.nonEmpty) {
                val flagged = Dedup.semDedupAgainstHistory(
                  batch, w.read(semHist).filter(col("batch_id") < batchId),
                  "doc_id", "emb", threshold = 0.95, quantizer = quant)
                  .select("doc_id").distinct()
                batch.join(flagged, Seq("doc_id"), "left_anti")
              } else batch
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(kept, curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(semHist, appId).exists(_ >= batchId))
              w.write(Dedup.semDedupIndex(kept, "doc_id", "emb", quant)
                  .withColumn("batch_id", lit(batchId)),
                semHist, DeltaWriteMode.Append, txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def curatedIds() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(curatedIds() === Set(1L, 2L, 4L),
        "a later micro-batch's semantic twin must drop against the history")
      // idle re-run admits nothing
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L))
      // LOSE the streaming checkpoint: replay under fresh batch ids must
      // be a no-op end to end (SetTransaction guards + batch_id probe)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L),
        "replay after checkpoint loss must not duplicate or re-drop")
      assert(w.read(semHist).count() === 3L,
        "the semantic index must hold exactly the three curated docs")
    }
  }

  test("mix-steering sampler under the streaming engine, across checkpoint loss") {
    // the steered sampler's realized-count state is a Delta table updated
    // per batch — the same cross-batch contract as the dedup histories:
    // SetTransaction-guarded appends, exactly-once across checkpoint
    // deletion, and the cumulative mix must converge even though each
    // arriving file is single-domain skewed
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Mixing
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val accepted = s"$tmp/accepted"; val countsHist = s"$tmp/counts"
      val targets = Map("a" -> 0.5, "b" -> 0.5)
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "dom").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // skewed arrival: all-a, then all-b, then mixed
      file(0, (0L until 40L).map(i => (i, "a")))
      file(1, (100L until 140L).map(i => (i, "b")))
      file(2, (200L until 220L).map(i => (i, "a")) ++
        (300L until 320L).map(i => (i, "b")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "dom").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "ssteer"
            val history =
              if (w.tableExists(countsHist)) w.read(countsHist)
              else batch.limit(0).select(col("dom"),
                lit(0L).as("have")).filter(lit(false))
            val acc = Mixing.steeredSample(batch, "doc_id", "dom",
              targets, history, acceptFrac = 0.5)
            if (!w.lastTxnVersion(accepted, appId).exists(_ >= batchId))
              w.write(acc, accepted, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(countsHist, appId).exists(_ >= batchId))
              w.write(Mixing.acceptedCounts(acc, "dom"), countsHist,
                DeltaWriteMode.Append, txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def mix() = w.read(accepted).groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val m1 = mix()
      // both domains represented and near balanced despite skewed files
      assert(m1.keySet === Set("a", "b"), s"got $m1")
      val shareA = m1("a").toDouble / m1.values.sum
      assert(shareA > 0.3 && shareA < 0.7, s"steering failed: $m1")
      val ids1 = w.read(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      // checkpoint loss: replay must not duplicate or re-decide batches
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(w.read(accepted).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === ids1,
        "replay after checkpoint loss must leave the accepted set unchanged")
      assert(w.read(countsHist).agg(sum("have")).collect()(0).getLong(0)
        === ids1.length.toLong,
        "realized-count state must equal the accepted rows exactly once")
    }
  }

  test("fuzzy-match history under the streaming engine, across checkpoint loss") {
    // cross-batch fuzzy dedup: a later batch's typo'd copy of an earlier
    // key must be dropped by probing the prefix-gram index table; the
    // order model is FIXED before the stream starts (the persisted-
    // quantizer discipline), and replay after checkpoint loss must not
    // re-admit or duplicate anything
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.FuzzyJoin
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val idxTable = s"$tmp/idx"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "k").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      file(0, Seq((1L, "the quick brown fox"), (2L, "pack my box with jugs")))
      file(1, Seq((3L, "the quikc brown fox"), // 2 edits from doc 1
        (4L, "a wholly novel key here")))
      file(2, Seq((5L, "pack my box with jugz"), // 1 edit from doc 2
        (6L, "the quikc brown fox!")))          // 1 edit from doc 3
      // order model from the first file's keys only - later grams unseen
      val order = FuzzyJoin.gramOrderModel(
        Seq("the quick brown fox", "pack my box with jugs").toDF("k"), "k")
      order.write.parquet(s"$tmp/order")
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "k").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "sfuzzy"
            val om = spark.read.parquet(s"$tmp/order")
            val fresh =
              if (w.tableExists(idxTable)) {
                val hit = FuzzyJoin.editDistanceAgainstHistory(batch,
                  w.read(idxTable), "doc_id", "k", maxDist = 2, om)
                  .select(col("id_new").as("doc_id")).distinct()
                batch.join(hit, Seq("doc_id"), "left_anti")
              } else batch
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(fresh, curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(idxTable, appId).exists(_ >= batchId))
              w.write(FuzzyJoin.prefixIndex(fresh, "doc_id", "k",
                maxDist = 2, om), idxTable, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def ids() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // 3 is a 2-edit copy of 1 -> dropped; 5 is 1-edit of 2 -> dropped;
      // 6 is 1-edit of 3, but 3 never entered the index, and 6 is 3 edits
      // from 1 -> kept
      assert(ids() === Set(1L, 2L, 4L, 6L), s"got ${ids()}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(ids() === Set(1L, 2L, 4L, 6L),
        "replay after checkpoint loss must not re-decide the fuzzy gate")
      // index holds exactly the survivors' prefix rows
      assert(w.read(idxTable).select("sid").distinct().collect()
        .map(_.getLong(0)).toSet === Set(1L, 2L, 4L, 6L))
    }
  }

  test("vocab tokenization under the streaming engine, across checkpoint loss") {
    // id-mapping is cross-batch STATE even though the map itself is
    // static: every batch must tokenize under the SAME persisted
    // vocabulary (ids comparable across the whole export) — built before
    // the stream starts, the persisted-quantizer discipline — and replay
    // after checkpoint loss must reproduce identical id rows, including
    // the unk mapping for words the vocab never saw
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Curation
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/tokens"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      file(0, Seq((1L, "a b a c"), (2L, "b b a")))
      file(1, Seq((3L, "c a zz b"), (4L, "zz zz")))   // zz is OOV
      // vocab from the first batch's words only, persisted up front
      Curation.saveVocab(spark, s"$tmp/vocab",
        Curation.buildWordVocab(Seq("a b a c", "b b a").toDF("text"), "text", 3))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val vocab = Curation.loadVocab(spark, s"$tmp/vocab")
            if (!w.lastTxnVersion(out, "svocab").exists(_ >= batchId))
              w.write(Curation.tokenizeToIds(batch, "doc_id", "text", vocab),
                out, DeltaWriteMode.Append, txn = Some(("svocab", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def rows() = w.read(out)
        .select("doc_id", "ids", "n_tokens", "n_oov").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      // a=1 (3 hits), b=2 (3 hits), c=3; zz -> 0
      val want = Seq(
        (1L, Seq(1, 2, 1, 3), 4L, 0L),
        (2L, Seq(2, 2, 1), 3L, 0L),
        (3L, Seq(3, 1, 0, 2), 4L, 1L),
        (4L, Seq(0, 0), 2L, 2L))
      assert(rows() === want, s"got ${rows()}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(rows() === want,
        "replay after checkpoint loss must re-tokenize to identical ids")
    }
  }

  test("SFT assistant-fp history under the streaming engine, across checkpoint loss") {
    // the assistant-side dedup history is cross-batch state like the
    // fingerprint history: each batch collapses in-batch keep-first,
    // drops any answer set a PRIOR batch kept, and appends its own kept
    // fingerprints — and replay after checkpoint loss must leave the
    // kept table byte-identical (SetTransaction-guarded appends)
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Sft
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val out = s"$tmp/kept"; val hist = s"$tmp/fp_hist"
      def file(n: Int, rows: Seq[(Long, Long, String, String)]): Unit = {
        rows.toDF("conv_id", "turn_idx", "role", "content")
          .coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 0: conv 2 duplicates conv 1's answer IN BATCH
      file(0, Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "ans A"),
        (2L, 0L, "user", "yo"), (2L, 1L, "assistant", "ans A")))
      // batch 1: conv 3 duplicates against HISTORY, conv 4 is novel
      file(1, Seq((3L, 0L, "user", "hej"), (3L, 1L, "assistant", "ans A"),
        (4L, 0L, "user", "hola"), (4L, 1L, "assistant", "ans B")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, 1L, "x", "y"))
          .toDF("conv_id", "turn_idx", "role", "content").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val res =
              if (w.tableExists(hist))
                Sft.assistantDedupAgainstHistory(batch, "conv_id",
                  "turn_idx", "role", "content", w.read(hist))
              else Sft.assistantDedup(batch, "conv_id", "turn_idx",
                "role", "content")
            val kept = res.filter(col("keep")).select("conv_id", "fp")
            if (!w.lastTxnVersion(out, "sftd").exists(_ >= batchId))
              w.write(kept, out, DeltaWriteMode.Append,
                txn = Some(("sftd", batchId)))
            if (!w.lastTxnVersion(hist, "sftdh").exists(_ >= batchId))
              w.write(kept.select("fp"), hist, DeltaWriteMode.Append,
                txn = Some(("sftdh", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def keptIds() = w.read(out).select("conv_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      // conv 2 collapsed in batch 0; conv 3 dropped against history
      assert(keptIds() === Seq(1L, 4L), s"got ${keptIds()}")
      assert(w.read(hist).count() === 2L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(keptIds() === Seq(1L, 4L),
        "replay after checkpoint loss must not re-append or re-drop")
      assert(w.read(hist).count() === 2L)
    }
  }

  test("BPE encoding under the streaming engine, across checkpoint loss") {
    // the subword model is cross-batch state like the word vocab: every
    // batch must encode under the SAME persisted merge table (loaded
    // through the marker-enforcing path) or id sequences stop being
    // comparable, and replay after checkpoint loss must reproduce
    // identical subword rows — including unk for code points outside
    // the base alphabet
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Bpe
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/ids"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      file(0, Seq((1L, "ab ab"), (2L, "abc b")))
      file(1, Seq((3L, "ab ad"), (4L, "c c")))   // 'd' is outside the alphabet
      // model from the first batch's text only, persisted up front
      Bpe.save(spark, s"$tmp/bpe",
        Bpe.train(Seq("ab ab", "abc b").toDF("text"), "text", numMerges = 2))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val model = Bpe.load(spark, s"$tmp/bpe")
            if (!w.lastTxnVersion(out, "sbpe").exists(_ >= batchId))
              w.write(Bpe.encode(batch, "doc_id", "text", model),
                out, DeltaWriteMode.Append, txn = Some(("sbpe", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def rows() = w.read(out)
        .select("doc_id", "ids", "n_tokens", "n_oov").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      // merges learned: (a,b)->ab, (ab,c)->abc; symbols " "=1 a=2 b=3
      // c=4 ab=5 abc=6; spaces are ids too
      val want = Seq(
        (1L, Seq(5, 1, 5), 3L, 0L),
        (2L, Seq(6, 1, 3), 3L, 0L),
        (3L, Seq(5, 1, 2, 0), 4L, 1L),
        (4L, Seq(4, 1, 4), 3L, 0L))
      assert(rows() === want, s"got ${rows()}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(rows() === want,
        "replay after checkpoint loss must re-encode to identical ids")
    }
  }

  test("classifier scoring under the streaming engine, across checkpoint loss") {
    // persisted weights are cross-batch state like the vocab: every
    // batch scores under the SAME marker-stamped weight vector, stream
    // output must equal the one-shot batch scoring of the union, and
    // replay after checkpoint loss must reproduce identical rows
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.QualityClf
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/scores"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      val b0 = Seq((1L, "good prose here"), (2L, "nav nav nav"))
      val b1 = Seq((3L, "more good prose"), (4L, ""))
      file(0, b0); file(1, b1)
      QualityClf.save(spark, s"$tmp/clf", QualityClf.Model(
        Array.tabulate(64)(b => ((b.toLong * 37) % 21) - 10), 3L))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val m = QualityClf.load(spark, s"$tmp/clf")
            if (!w.lastTxnVersion(out, "sclf").exists(_ >= batchId))
              w.write(QualityClf.score(batch, "doc_id", "text", m),
                out, DeltaWriteMode.Append, txn = Some(("sclf", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def rows() = w.read(out)
        .select("doc_id", "score", "n_features", "keep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
      // stream == one-shot batch scoring of the union under the same model
      val want = QualityClf.score((b0 ++ b1).toDF("doc_id", "text"),
          "doc_id", "text", QualityClf.load(spark, s"$tmp/clf"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
      assert(rows() === want, s"got ${rows()}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(rows() === want,
        "replay after checkpoint loss must re-score to identical rows")
    }
  }

  test("BM25 scoring under frozen stats on the streaming engine, across " +
    "checkpoint loss") {
    // the retrieval sibling of the classifier pin: collection statistics
    // are cross-batch state persisted ONCE under the Bm25Stats marker;
    // every arriving batch scores under the frozen idf/avgdl (map-only
    // given the snapshot), so stream output must equal the one-shot
    // batch scoring of the union, and replay after checkpoint loss must
    // reproduce identical rows
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Relevance
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val out = s"$tmp/scores"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      val b0 = Seq((1L, "spark join plans and the join order"),
        (2L, "a vector scan"))
      val b1 = Seq((3L, "stream stream stream"), (4L, "nothing relevant"))
      file(0, b0); file(1, b1)
      val ref = Seq((10L, "join the vector stream"),
        (11L, "join again"), (12L, "plain prose")).toDF("doc_id", "text")
      Relevance.saveBm25Stats(spark, s"$tmp/stats",
        Relevance.bm25CollectionStats(ref, "doc_id", "text"))
      val q0 = Seq("join", "vector", "stream")
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            if (!w.lastTxnVersion(out, "sbm25").exists(_ >= batchId))
              w.write(Relevance.bm25UnderStatsTable(batch, "doc_id", "text",
                s"$tmp/stats", q0),
                out, DeltaWriteMode.Append, txn = Some(("sbm25", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def rows() = w.read(out).select("id", "bm25").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val want = Relevance.bm25UnderStatsTable(
          (b0 ++ b1).toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/stats", q0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(rows() === want, s"got ${rows()}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(rows() === want,
        "replay after checkpoint loss must re-score to identical rows")
    }
  }

  test("transformWithState: running totals accumulate and TTL dedup gates, on RocksDB") {
    // the Spark-4 arbitrary-state API beside the classic
    // flatMapGroupsWithState shapes: typed ValueState handles on the
    // RocksDB store, state surviving a stream restart from checkpoint
    import graft.streaming.StatefulOps
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the checksum checkpoint manager's async writes deadlock under the
    // RocksDB store in this single-JVM test rig (tasks park forever in
    // ChecksumCheckpointFileManager.awaitResult); checksums add nothing
    // to local-fs test checkpoints
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    try withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      def file(n: Int, rows: Seq[(String, Long)]): Unit =
        rows.toDF("key", "n").coalesce(1).write.parquet(s"$in/b$n")
      file(0, Seq(("src0", 5L), ("src1", 3L), ("src0", 2L)))
      file(1, Seq(("src0", 1L), ("src2", 4L)))
      val schema = Seq(("x", 1L)).toDF("key", "n").schema
      def runTotals(): Seq[(String, Long, Long)] = {
        val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        val ds = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$in/*").as[(String, Long)]
        val q = StatefulOps.runningTotals(ds)
          .writeStream.outputMode("update")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.RunningTotal], _: Long) =>
            got ++= batch.collect().map(r => (r.key, r.batchAdd, r.total)): Unit
          }
          .start()
        // RocksDB per-batch overhead is real; on a loaded box 120 s was
        // not enough, and awaitTermination(timeout) RETURNS without
        // stopping — the tmp sweep then races a live query's state
        // writers. Assert drain, and stop() defensively either way.
        val done = q.awaitTermination(600000)
        q.stop()
        assert(done, "running-totals stream must drain within the timeout")
        got.toSeq.sorted
      }
      val got1 = runTotals()
      // batch 0: src0 adds 7 (total 7), src1 adds 3; batch 1: src0 adds
      // 1 on top of the STORED 7, src2 adds 4
      assert(got1 === Seq(("src0", 1L, 8L), ("src0", 7L, 7L),
        ("src1", 3L, 3L), ("src2", 4L, 4L)), s"got $got1")
      // restart from checkpoint with a NEW file: totals continue
      file(2, Seq(("src1", 10L)))
      val got2 = runTotals()
      assert(got2 === Seq(("src1", 10L, 13L)),
        s"restart must resume per-key state from the store, got $got2")

      // first-seen dedup: repeats suppress within and across batches.
      // Exercised in the exact (ttl = null, TimeMode.None) mode — the
      // ProcessingTime mode TTL requires showed a nondeterministic
      // engine-level hang in this single-JVM rig (batches park in the
      // checkpoint manager), so its timing behavior is documented on the
      // operator rather than pinned here; the dedup SEMANTICS under
      // test are identical in both modes
      val cp2 = s"$tmp/cp2"
      val ds2 = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
        .select(col("key"), col("n").cast("string"))
        .as[(String, String)]
      val adm = scala.collection.mutable.ArrayBuffer[String]()
      val q2 = StatefulOps.ttlDedup(ds2, ttl = null)
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.Admitted], _: Long) =>
          adm ++= batch.collect().map(_.key): Unit
        }
        .start()
      val done2 = q2.awaitTermination(600000)
      q2.stop()
      assert(done2, "dedup stream must drain within the timeout")
      assert(adm.sorted.toSeq === Seq("src0", "src1", "src2"),
        s"each key admits exactly once, got $adm")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")
    }
  }

  test("dropDuplicatesWithinWatermark: in-window dups collapse, expired keys re-admit") {
    // Spark's MANAGED streaming dedup beside the engine's state-table
    // pattern: duplicates arriving within the watermark delay of a key's
    // first occurrence drop; once the watermark passes the key's window
    // its state evicts and a later arrival is a fresh row.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = df.writeStream.format("memory").queryName("ddww")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L), (1L, 2000L), (2L, 1500L))
      q.processAllAvailable()
      input.addData((1L, 3000L)) // in-window duplicate -> dropped
      q.processAllAvailable()
      input.addData((9L, 60000L)) // watermark -> 50 s, evicts id 1's state
      q.processAllAvailable()
      input.addData((1L, 61000L)) // fresh epoch -> re-admitted
      q.processAllAvailable()
      val ids = spark.table("ddww").select("id").collect().map(_.getLong(0))
      assert(ids.count(_ == 1L) === 2,
        s"id 1 must emit once per watermark epoch: ${ids.toSeq}")
      assert(ids.count(_ == 2L) === 1)
      assert(ids.count(_ == 9L) === 1)
    } finally q.stop()
  }

  test("sessionize: gap-break closes inline, watermark timeout closes idle keys") {
    import graft.streaming.{Session, Sessionize}
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def file(n: Int, rows: Seq[(String, java.sql.Timestamp)]): Unit = {
        rows.toDF("user", "ts").coalesce(1).write.parquet(s"$in/b$n")
        // distinct mtimes so the file stream admits b0 -> b1 -> b2 in order
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n")).iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // A: two events 30s apart (one session), B: one event
      file(0, Seq(("A", ts("2024-01-01 00:00:00")), ("A", ts("2024-01-01 00:00:30")),
        ("B", ts("2024-01-01 00:00:10"))))
      // A again 10 min later: gap(60s) exceeded -> closes A's session inline
      file(1, Seq(("A", ts("2024-01-01 00:10:00"))))
      // far-future key advances the watermark past B's timeout
      file(2, Seq(("Z", ts("2024-01-01 00:20:00"))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq(("x", ts("2024-01-01 00:00:00"))).toDF("user", "ts").schema,
        maxFilesPerTrigger = Some(1))
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      val q = StructuredRunner.run(spark, spec, cp,
        transform = df => Sessionize.sessions(df, "user", "ts", gapMs = 60000L).toDF(),
        writer = (batch, _) => out ++= batch.as[Session].collect(),
        outputMode = "append")
      q.awaitTermination(120000)
      val byKey = out.groupBy(_.key)
      // A's first session closed by the gap-breaking later event; its
      // second by timeout once the final watermark passed 10:00 + gap
      assert(byKey("A").map(s => (s.startMs, s.endMs, s.events)).sorted ===
        Seq((ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:00:30").getTime, 2L),
          (ts("2024-01-01 00:10:00").getTime, ts("2024-01-01 00:10:00").getTime, 1L)))
      // B closed by event-time timeout once the watermark passed last+gap
      assert(byKey("B").map(_.events).toSeq === Seq(1L))
      // Z is still open in state: the watermark never passed 20:00 + gap
      assert(!byKey.contains("Z"))
    }
  }

  test("incremental connected components under the streaming engine, across checkpoint loss") {
    // componentsWithHistory's rep-space fold as a genuine micro-batch
    // writer: each batch's edges contract against the persisted
    // assignment table (Overwrite + SetTransaction), and the final map
    // must equal batch CC over ALL edges — including after checkpoint
    // deletion forces a replay under fresh batch ids
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Dedup
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val hist = s"$tmp/cc"
      def file(n: Int, rows: Seq[(Long, Long)]): Unit = {
        rows.toDF("id_a", "id_b").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 0: two components; batch 1: an edge MERGES them; batch 2:
      // a new component plus a new global minimum 0 rewriting reps
      val b0 = Seq((1L, 2L), (3L, 4L))
      val b1 = Seq((2L, 3L))
      val b2 = Seq((5L, 6L), (4L, 0L))
      file(0, b0); file(1, b1); file(2, b2)
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, 1L)).toDF("id_a", "id_b").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "cchist"
            if (!w.lastTxnVersion(hist, appId).exists(_ >= batchId)) {
              val prior =
                if (w.tableExists(hist)) w.read(hist)
                else Seq.empty[(Long, Long)].toDF("id", "component")
              w.write(Dedup.componentsWithHistory(batch, prior),
                hist, DeltaWriteMode.Overwrite, txn = Some((appId, batchId)))
            }
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def assignment() = w.read(hist).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Dedup.connectedComponents((b0 ++ b1 ++ b2).toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(assignment() === want,
        "streamed fold must equal batch CC over all edges")
      assert(assignment().values.toSet === Set(0L, 5L),
        "late minimum 0 must rewrite the merged component's rep")
      // idle re-run changes nothing; checkpoint loss replays as a no-op
      runOnce()
      assert(assignment() === want)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(assignment() === want,
        "replay after checkpoint loss must leave the assignment fixed")
    }
  }

  test("hash64 signature history under the streaming engine, across checkpoint loss") {
    // the 64-bit locality-hash near-dup gate as a micro-batch writer:
    // per-batch simhashIndex rows append into a signature history and a
    // later batch's near-identical doc drops against it — prior batches'
    // TEXT is never re-read, only the 8-byte signatures
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Dedup
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val sigHist = s"$tmp/sigs"
      val base = "spark is a distributed engine for large scale data processing with catalyst"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 1's doc 3 is a near-dup of batch 0's doc 1; doc 4 is novel
      file(0, Seq((1L, base),
        (2L, "cooking pasta requires boiling salted water and fresh tomatoes")))
      file(1, Seq((3L, base.replace("large", "big")),
        (4L, "completely different text about delta logs and checkpoints today")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "sighist"
            val sigs = Dedup.simhashIndex(batch, "doc_id", "text")
            // batch_id < batchId keeps a replayed batch from flagging
            // itself against its own appended signatures (the semdedup
            // history discipline)
            val kept =
              if (w.tableExists(sigHist)) {
                val flagged = Dedup.hash64AgainstHistory(sigs,
                  w.read(sigHist).filter(col("batch_id") < batchId),
                  maxHamming = 16)
                  .select("doc_id").distinct()
                batch.join(flagged, Seq("doc_id"), "left_anti")
              } else batch
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(kept, curated, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(sigHist, appId).exists(_ >= batchId))
              w.write(Dedup.simhashIndex(kept, "doc_id", "text")
                  .withColumn("batch_id", lit(batchId)),
                sigHist, DeltaWriteMode.Append, txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def curatedIds() = w.read(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(curatedIds() === Set(1L, 2L, 4L),
        "the near-identical later doc must drop against the signature history")
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(curatedIds() === Set(1L, 2L, 4L),
        "replay after checkpoint loss must not duplicate or re-drop")
      assert(w.read(sigHist).count() === 3L,
        "the signature history holds exactly the three curated docs")
    }
  }

  test("PQ code index under the streaming engine, across checkpoint loss") {
    // the incremental-ANN state: model pair (coarse quantizer + PQ
    // codebooks) trains ONCE on the first batch and persists OUTSIDE the
    // checkpoint; every batch appends m+12-byte pqIndexBatch rows; a
    // query over the ACCUMULATED index finds an early batch's vector
    // without that batch's vectors ever re-shuffling for search
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Similarity
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val idx = s"$tmp/pqindex"; val vecs = s"$tmp/vectors"
      val qPath = s"$tmp/quantizer"; val pqPath = s"$tmp/pqmodel"
      val rng = new scala.util.Random(7)
      def clusterVec(c: Int): Seq[Float] = (0 until 8).map(j =>
        (if (j / 2 == c) 10f else 0f) + 0.05f * rng.nextGaussian().toFloat)
      def file(n: Int, rows: Seq[(Long, Seq[Float])]): Unit = {
        rows.toDF("vec_id", "emb").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 0 covers all 4 clusters (trains the models); batch 1 adds
      // more corpus, none nearer to the planted target than doc 17
      file(0, (0L until 60L).map(i => (i, clusterVec((i % 4).toInt))))
      file(1, (100L until 160L).map(i => (i, clusterVec((i % 4).toInt))))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, Seq(1f))).toDF("vec_id", "emb").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "pqhist"
            val quant =
              if (new java.io.File(qPath).exists())
                Similarity.loadQuantizer(spark, qPath)
              else {
                val m = Similarity.trainIvfCentroids(
                  batch, "vec_id", "emb", nlist = 4, iterations = 3)
                Similarity.saveQuantizer(spark, qPath, m)
                m
              }
            val pq =
              if (new java.io.File(pqPath).exists())
                Similarity.loadPqModel(spark, pqPath)
              else {
                val m = Similarity.trainPq(batch, "vec_id", "emb",
                  m = 4, ksub = 8, sampleN = 60, iterations = 5)
                Similarity.savePqModel(spark, pqPath, m)
                m
              }
            if (!w.lastTxnVersion(idx, appId).exists(_ >= batchId))
              w.write(Similarity.pqIndexBatch(batch, "vec_id", "emb", pq, quant),
                idx, DeltaWriteMode.Append, txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(vecs, appId).exists(_ >= batchId))
              w.write(batch, vecs, DeltaWriteMode.Append,
                txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      assert(w.read(idx).count() === 120L)
      // probe the ACCUMULATED index with an exact copy of batch-0 doc 17:
      // the re-ranked top-1 must be doc 17 itself at cosine ~1
      val target = w.read(vecs).filter(col("vec_id") === 17L)
        .select("emb").head().getSeq[Float](0)
      val query = Seq((9999L, target)).toDF("vec_id", "emb")
      val quant = Similarity.loadQuantizer(spark, qPath)
      val pq = Similarity.loadPqModel(spark, pqPath)
      // rerank must cover the probed bucket: in-cluster ADC scores are
      // near-ties (noise is 0.005 of the axis), so a small rerank can cut
      // the true copy on the neighbor_id tiebreak before exact scoring
      val top = Similarity.ivfPqTopKFromIndex(query, w.read(idx),
        w.read(vecs), "vec_id", "emb", k = 1, pq,
        nprobe = 2, rerank = 64, maxBucket = 4096, quantizer = quant)
        .head()
      assert(top.getLong(1) === 17L, s"expected doc 17, got $top")
      assert(top.getDouble(2) > 0.9999)
      // idle re-run and checkpoint-loss replay append nothing
      runOnce()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(w.read(idx).count() === 120L,
        "replay after checkpoint loss must not re-append index rows")
      assert(w.read(vecs).count() === 120L)
    }
  }

  test("line-df history under the streaming engine, across checkpoint loss") {
    // the line-dedup history as a micro-batch writer: per-batch
    // lineIndex rows append into a history Delta table and a later
    // batch's boilerplate copy excises against it — prior batches' text
    // is never re-read, only 32-byte line-index rows
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Curation
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val lineHist = s"$tmp/lines"
      def file(n: Int, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 1's docs quote batch 0's BANNER line; their own lines stay
      file(0, Seq((1L, "BANNER\nalpha"), (2L, "BANNER\nbeta")))
      file(1, Seq((10L, "BANNER\ngamma"), (11L, "delta\nBANNER")))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x")).toDF("doc_id", "text").schema,
        maxFilesPerTrigger = Some(1))
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "linehist"
            graft.state.HistoryFormat.ensure(conf, lineHist,
              graft.state.HistoryFormat.LineDf,
              hasData = w.tableExists(lineHist))
            val hist =
              if (w.tableExists(lineHist))
                w.read(lineHist).filter(col("batch_id") < batchId)
                  .drop("batch_id")
              else Seq.empty[(Long, Long, Long, Long)]
                .toDF("h1", "h2", "own", "df")
            val cleaned = Curation.dedupLinesAgainstHistory(
              batch, hist, "doc_id", "text", minDf = 2)
            if (!w.lastTxnVersion(curated, appId).exists(_ >= batchId))
              w.write(cleaned.select("doc_id", "clean_text"),
                curated, DeltaWriteMode.Append, txn = Some((appId, batchId)))
            if (!w.lastTxnVersion(lineHist, appId).exists(_ >= batchId))
              w.write(Curation.lineIndex(batch, "doc_id", "text")
                  .withColumn("batch_id", lit(batchId)),
                lineHist, DeltaWriteMode.Append, txn = Some((appId, batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      val w = new DeltaWriter(spark, conf)
      def cleans() = w.read(curated).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val c1 = cleans()
      // batch 0: BANNER duplicated IN-BATCH (df 2) — doc 1's copy owns
      assert(c1(1L) === "BANNER\nalpha" && c1(2L) === "beta",
        s"in-batch ownership must keep the min-(id,pos) copy: $c1")
      // batch 1: every BANNER copy excises against the history
      assert(c1(10L) === "gamma" && c1(11L) === "delta", s"$c1")
      // idle re-run and checkpoint-loss replay change nothing
      runOnce()
      assert(cleans() === c1)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(cleans() === c1,
        "replay after checkpoint loss must not duplicate or re-clean")
      // format marker rode along; a stale-version history refuses
      assert(graft.state.HistoryFormat.read(conf, lineHist)
        === Some(("line-df", 1L)))
    }
  }

  test("cohort-activity and funnel-state folds under the streaming " +
    "engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Behavioral
    import graft.state.HistoryFormat
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val actT = s"$tmp/activity"; val funT = s"$tmp/funnel"
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      def file(n: Int, rows: Seq[(Long, String, java.sql.Timestamp)]): Unit = {
        rows.toDF("user_id", "event_type", "ts").coalesce(1)
          .write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 1 re-sends u1's (user, day) view pair — the activity fold
      // must not double-count it; u1's funnel completes across the split
      file(0, Seq((1L, "view", ts("2024-01-02 10:00:00")),
        (1L, "click", ts("2024-01-02 11:00:00")),
        (2L, "view", ts("2024-01-03 10:00:00"))))
      file(1, Seq((1L, "view", ts("2024-01-02 12:00:00")),
        (1L, "purchase", ts("2024-01-04 10:00:00")),
        (2L, "click", ts("2024-01-05 10:00:00"))))
      val stages = Seq("view", "click", "purchase")
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x", ts("2024-01-01 00:00:00")))
          .toDF("user_id", "event_type", "ts").schema,
        maxFilesPerTrigger = Some(1))
      val w = new DeltaWriter(spark, conf)
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            if (!w.lastTxnVersion(actT, "beh-act").exists(_ >= batchId)) {
              val fresh =
                if (w.tableExists(actT))
                  Behavioral.activityFoldTable(batch, col("user_id"),
                    col("ts"), actT)
                else Behavioral.activityPairs(batch, col("user_id"),
                  col("ts"))
              w.write(fresh, actT, DeltaWriteMode.Append,
                txn = Some(("beh-act", batchId)))
              HistoryFormat.ensure(conf, actT,
                HistoryFormat.CohortActivity, hasData = false)
            }
            if (!w.lastTxnVersion(funT, "beh-fun").exists(_ >= batchId)) {
              val next =
                if (w.tableExists(funT))
                  Behavioral.funnelFoldTable(batch, col("user_id"),
                    col("event_type"), col("ts"), stages, funT)
                else Behavioral.funnelFold(None, batch, col("user_id"),
                  col("event_type"), col("ts"), stages)
              // the state REPLACES (it is the full per-user fold) — the
              // overwrite and its watermark commit atomically. Reading
              // the old snapshot WHILE writing is safe under Delta: the
              // overwrite only dereferences old files in the log commit,
              // never deletes them (no cache/checkpoint needed — a
              // localCheckpoint here would leak a permanent RDD cache
              // into the shared session)
              w.write(next, funT,
                DeltaWriteMode.Overwrite, txn = Some(("beh-fun", batchId)))
              Behavioral.stampFunnelStages(conf, funT, stages)
            }
          })
        q.awaitTermination(120000)
      }
      runOnce()
      def retention() = Behavioral.cohortRetentionTable(spark, actT)
        .orderBy("cohort", "period").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      def funnel() = {
        val r = Behavioral.funnelReport(w.read(funT), stages).head
        (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
          r.getAs[Long]("n_purchase"))
      }
      val ret1 = retention(); val fun1 = funnel()
      // u1 active Jan 2 (once, despite the re-send) and Jan 4; u2 Jan 3
      // and Jan 5 — cohorts Jan 2 (u1) and Jan 3 (u2)
      assert(ret1 === Seq(
        ("2024-01-02", "2024-01-02", 1L, 1L), ("2024-01-02", "2024-01-04", 1L, 1L),
        ("2024-01-03", "2024-01-03", 1L, 1L), ("2024-01-03", "2024-01-05", 1L, 1L)),
        s"got $ret1")
      assert(fun1 === ((2L, 2L, 1L)), s"got $fun1")
      // idle re-run admits nothing; checkpoint loss replays into no-ops
      runOnce()
      assert(retention() === ret1 && funnel() === fun1)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(retention() === ret1 && funnel() === fun1,
        "replay after checkpoint loss must not re-fold any batch")
      assert(HistoryFormat.read(conf, actT) ===
        Some(("cohort-activity", 1L)))
      assert(HistoryFormat.read(conf, funT) ===
        Some(("funnel-stages", 1L)))
    }
  }

  test("incremental SCD2 merge under the streaming engine, across " +
    "checkpoint loss") {
    import graft.delta.DeltaWriter
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"; val dim = s"$tmp/dim"
      def file(n: Int, rows: Seq[(Long, Long, String, Long)]): Unit = {
        rows.toDF("id", "value", "kind", "v").coalesce(1)
          .write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 0 builds: key 1 two versions, key 2 one; batch 1 merges:
      // key 1 updates (closes [3,∞)), key 2 deleted, key 3 brand-new
      file(0, Seq((1L, 10L, "upsert", 1L), (1L, 11L, "upsert", 3L),
        (2L, 20L, "upsert", 2L)))
      file(1, Seq((1L, 12L, "upsert", 7L), (2L, 0L, "delete", 8L),
        (3L, 30L, "upsert", 6L)))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, 1L, "x", 1L)).toDF("id", "value", "kind", "v")
          .schema,
        maxFilesPerTrigger = Some(1))
      val w = new DeltaWriter(spark, conf)
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            // SetTransaction watermark: a replayed batch (checkpoint
            // loss, at-least-once driver) must no-op BEFORE the merge —
            // re-merging would trip scd2Merge's late-change refusal,
            // which is exactly the loud failure the watermark prevents
            if (!w.lastTxnVersion(dim, "scd2s").exists(_ >= batchId))
              DeltaCdc.scd2MergeDelta(spark, batch, dim, Seq("id"), "v",
                Some("kind"), txn = Some(("scd2s", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      def state() = w.read(dim)
        .orderBy("id", "valid_from").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("value"),
          r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
          r.getAs[Boolean]("is_current"))).toSeq
      val s1 = state()
      assert(s1 === Seq(
        (1L, 10L, 1L, Some(3L), false), (1L, 11L, 3L, Some(7L), false),
        (1L, 12L, 7L, None, true),
        (2L, 20L, 2L, Some(8L), false),
        (3L, 30L, 6L, None, true)), s"got $s1")
      // idle re-run admits nothing; checkpoint loss replays into no-ops
      runOnce()
      assert(state() === s1)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(state() === s1,
        "replay after checkpoint loss must not re-merge any batch")
      assert(w.lastTxnVersion(dim, "scd2s") === Some(1L))
    }
  }

  test("source-reputation fold and frozen score-cuts labels under the " +
    "streaming engine, across checkpoint loss") {
    import graft.delta.{DeltaWriteMode, DeltaWriter}
    import graft.operators.Curation
    import graft.state.HistoryFormat
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val srcT = s"$tmp/srcfp"; val labT = s"$tmp/labeled"
      val cutsT = s"$tmp/cuts"
      val stop = Seq("the", "a", "of", "to", "and", "in", "is")
      def file(n: Int, rows: Seq[(Long, String, String, Double)]): Unit = {
        rows.toDF("doc_id", "source", "text", "q").coalesce(1)
          .write.parquet(s"$in/b$n")
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(s"$in/b$n"))
          .iterator().asScala
          .foreach(_.toFile.setLastModified(1700000000000L + n * 60000L))
      }
      // batch 1 re-sends batch 0's 'late-mirror' body — the batch-0
      // original must RETROACTIVELY read as a dup in the folded report
      file(0, Seq(
        (1L, "good", "the quick fox one is in a den", 1.0),
        (2L, "good", "the quick fox two is in a den", 5.0),
        (3L, "mirror", "a body that will be mirrored later", 9.0)))
      file(1, Seq(
        (4L, "good", "the quick fox three is in a den", 2.0),
        (5L, "mirror", "a body that will be mirrored later", 8.0)))
      // cuts stamped ONCE before the stream — every batch classifies
      // under the same frozen thresholds (terciles of 1..9)
      Curation.saveScoreCuts(spark, cutsT, Curation.scoreCutsModel(
        (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s"), "s", 3))
      val spec = StreamSpec(inputDir = s"$in/*",
        schema = Seq((1L, "x", "y", 1.0)).toDF("doc_id", "source", "text", "q")
          .schema,
        maxFilesPerTrigger = Some(1))
      val w = new DeltaWriter(spark, conf)
      def runOnce(): Unit = {
        val q = StructuredRunner.run(spark, spec, cp,
          writer = (batch, batchId) => {
            if (!w.lastTxnVersion(srcT, "src-fp").exists(_ >= batchId)) {
              w.write(Curation.sourceFpBatch(batch, "source", "text", stop),
                srcT, DeltaWriteMode.Append, txn = Some(("src-fp", batchId)))
              HistoryFormat.ensure(conf, srcT,
                HistoryFormat.SourceReputationFp, hasData = false)
            }
            if (!w.lastTxnVersion(labT, "labels").exists(_ >= batchId))
              w.write(Curation.scoreBucketsUnderCutsTable(batch, "q",
                  Seq("head", "middle", "tail"), cutsT)
                  .select("doc_id", "bucket"),
                labT, DeltaWriteMode.Append, txn = Some(("labels", batchId)))
          })
        q.awaitTermination(120000)
      }
      runOnce()
      def report() = Curation.sourceReputationFromState(w.read(srcT),
          maxDupRate = 0.2, minStopword = 0.05)
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(4))).toSeq
      def labels() = w.read(labT).orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq
      val rep1 = report(); val lab1 = labels()
      // both mirror copies are dups — including the batch-0 original
      assert(rep1 === Seq(("good", 3L, 0.0, true),
        ("mirror", 2L, 1.0, false)), s"got $rep1")
      // terciles of 1..9 cut at 3.67/6.33: q 1,2 head; 5 middle; 8,9 tail
      assert(lab1 === Seq(1L -> "head", 2L -> "middle", 3L -> "tail",
        4L -> "head", 5L -> "tail"), s"got $lab1")
      // idle re-run admits nothing; checkpoint loss replays into no-ops
      runOnce()
      assert(report() === rep1 && labels() === lab1)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
      runOnce()
      assert(report() === rep1 && labels() === lab1,
        "replay after checkpoint loss must not re-fold or re-label")
      assert(HistoryFormat.read(conf, srcT) ===
        Some(("source-reputation-fp", 1L)))
      assert(HistoryFormat.read(conf, cutsT) ===
        Some(("score-percentile-cuts", 1L)))
    }
  }
}

package graft.examples

import graft._
import graft.operators.Dedup
import graft.sources._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed near-dup canonicalization's persisted EPOCH state driven
  * by the real checkpointed pipeline, with an injected crash in the
  * exactly-once window — the composition
  * [[graft.operators.Dedup.nearDupCanonicalizeIncrementTable]]'s suite
  * laws promise but only a live driver can prove:
  *
  *  - documents arrive file-by-file; each batch folds into the state
  *    trio (docs/reps/cc) under the SINGLE-POINTER epoch swap (v4:
  *    O(batch) docs/reps chunk appends + the O(Δ-components) cc delta
  *    chunk, all named by one atomically-replaced pointer) — a reader
  *    or crash can only observe a complete, consistent state;
  *  - the crash is injected AFTER the epoch commit and BEFORE the
  *    driver's offset commit — the at-least-once window where the WAL
  *    MUST re-deliver a batch whose state effects already landed;
  *  - the restarted driver replays that batch against the
  *    post-crash epoch, and the fold's id-keyed anti-join makes the
  *    replay a NO-OP epoch (fold-twice == fold-once) — the resolution
  *    afterwards equals the one-shot over the whole corpus bit for bit.
  *
  * The pair family is the production instantiation (uncapped wide-key
  * poly-simhash within the batch; the semi-join-first signature probe
  * against history reps — per-batch pair work bounded by the batch +
  * probed slice). Unlisted chunks are pruned after each swap, so
  * exactly the committed chunk set survives the run.
  *
  * Run: sbt "runMain graft.examples.NearDupStateDemo /tmp/graft-ndstate"
  */
object NearDupStateDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-ndstate")
    val spark = GraftSession.local(4, "graft-ndstate")
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)

    val in = s"$work/in"; val cp = s"$work/checkpoint"
    val stateRoot = s"$work/neardup_state"

    // stage the documents table as 3 arriving files (doc_id mod 3, so
    // exact-dup groups and near-dup clusters split across batches)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // coalesce(1): ONE part per bucket, so one staged file = one batch
    // (the demo's 3-batch structure is load-bearing for the crash leg's
    // batch numbering) — and require it, because a multi-part bucket
    // silently dropped to its first file would fail the coverage gate
    // at the end with a misleading engine-shaped error
    docs.coalesce(1).withColumn("bucket", pmod(col("doc_id"), lit(3)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$work/staged")
    fs.mkdirs(path(in))
    (0 until 3).foreach { b =>
      val parts = fs.globStatus(path(s"$work/staged/bucket=$b/*.parquet"))
      require(parts.length == 1,
        s"staging must produce exactly one parquet per bucket, " +
          s"bucket $b has ${parts.length}")
      require(fs.rename(parts(0).getPath, path(s"$in/docs_$b.parquet")),
        s"staging rename failed for bucket $b")
    }

    // the production pair family — the ONE shared definition the
    // correctness query, the scaling series, and the suite pins also
    // use; here in its fully-instrumented production shape: the
    // MEASURED layout selector reading history volumes from the
    // persisted counts cache, and the probe reading history SIGNATURES
    // from the persisted signature cache (each rep's text hashed once,
    // when it entered the state) — both folded per batch beside the
    // state root
    val countsDir = s"$stateRoot/_simhash_counts"
    val sigsDir = s"$stateRoot/_simhash_sigs"
    val (pf, probe) = Dedup.nearDupWideSimhashFamily(autoProbe = true,
      countsDir = Some(countsDir), sigCacheDir = Some(sigsDir))

    // capture stage-end metadata: the layout decision must reach the
    // STRUCTURED observer stream, not just the driver log
    val stageMeta = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    class CapturingObserver extends LoggingObserver {
      override def onStageEnd(id: Long, stage: String, ms: Long,
          md: Map[String, String]): Unit = {
        md.foreach(stageMeta += _)
        super.onStageEnd(id, stage, ms, md)
      }
    }

    def pipeline(crashAfterEpochCommitAt: Option[Long] = None) = {
      val ckpt = new FileStreamCheckpoint(cp, conf)
      val source = new FileSource(in, ckpt, "parquet",
        FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
      new Pipeline(
        source = source,
        reader = ctx => ctx.spark.read.parquet(ctx.files: _*),
        writer = (df, ctx) => {
          Dedup.nearDupCanonicalizeIncrementTable(
            df.select(col("doc_id"), col("text"), col("n_chars")),
            "doc_id", "text", "n_chars", stateRoot, pf, probe)
          // the injected crash lands in the exactly-once window: the
          // epoch pointer HAS swapped, the WAL offset has NOT committed
          if (crashAfterEpochCommitAt.contains(ctx.batchId))
            throw new RuntimeException(
              "injected crash between epoch commit and offset commit")
          Map.empty
        },
        observer = new CapturingObserver,
        spark = spark)
    }

    def committedEpoch(): Long = graft.util.Jsons.optLong(
      graft.util.Fs.readJson(
        path(s"$stateRoot/_graft_neardup_epoch.json"), conf), "epoch").get
    def chunkDirs(t: String): Seq[String] =
      fs.listStatus(path(s"$stateRoot/$t")).toSeq
        .map(_.getPath.getName).filter(_.matches("[cm]\\d+"))
        .sortBy(_.drop(1).toLong)

    println("== run 1: two batches fold, two epoch swaps ==")
    val r1 = pipeline().run(RunOptions(once = false, sleepMs = 0,
      maxBatches = Some(2)))
    val epochAfterRun1 = committedEpoch()
    println(s"run1: batches=${r1.batchesProcessed} epoch=$epochAfterRun1 " +
      s"cc=${chunkDirs("cc").mkString(",")}")

    println("== run 2: batch 3 folds, then CRASHES before its offset commit ==")
    // only the INJECTED crash counts — an unrelated failure must read
    // as FAIL, not as the crash leg succeeding
    val crashed =
      try { pipeline(crashAfterEpochCommitAt = Some(2L))
        .run(RunOptions(once = false, sleepMs = 0)); false }
      catch { case e: Throwable =>
        println(s"  (${e.getClass.getSimpleName}: ${e.getMessage})")
        String.valueOf(e.getMessage).contains("injected crash") }
    val epochAfterCrash = committedEpoch()
    println(s"crashed as planned: $crashed  " +
      s"epoch after crash=$epochAfterCrash (the swap landed)")

    // inject the OTHER crash window — a fold that died AFTER its cache
    // folds but BEFORE its epoch commit leaves BOTH derived caches a
    // chunk AHEAD of the committed reps; the next fold's row-count
    // tripwires must detect it and heal by dropping the surplus chunk
    // suffix (per-chunk accounting — one meta rewrite, no measurement
    // job, no text re-derivation; the replayed fold re-appends what it
    // re-derives). Never silent drift, never a full rebuild for the
    // common window. (The crashed run 2 fold's own decision/heal
    // entries were rightly DROPPED from the observer stream — its stage
    // never ended — so the replay fold below is also what proves the
    // heals reach onStageEnd.)
    println("== crash sim: both caches folded ahead of the committed reps ==")
    graft.operators.Hash64Counts.fold(spark, countsDir,
      spark.range(7).select(col("id").as("doc_id"), col("id").as("sh")),
      "sh")
    val repsNow = Dedup.nearDupReadState(spark, stateRoot)._2
    graft.operators.SigCache.ensureAndFold(spark, sigsDir,
      repsNow.select("id", "text"),
      spark.range(7).select((col("id") + 90000000L).as("doc_id"),
        col("id").as("sh")),
      2147483647L, 1073741789L, repsNow.count())

    println("== run 3: restart — the WAL re-delivers batch 3; the fold " +
      "replays as a no-op epoch (and heals the counts cache) ==")
    val r3 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"run3: batches=${r3.batchesProcessed} " +
      s"epoch=${committedEpoch()} cc=${chunkDirs("cc").mkString(",")}")

    println("== run 4: idle (everything committed) ==")
    val r4 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"run4: batches=${r4.batchesProcessed}")

    // the law, end to end: fold-through-crash-and-replay == one-shot
    val folded = Dedup.nearDupResolutionTable(spark, stateRoot)
      .collect().map(_.toSeq).toSet
    val oneShot = Dedup.nearDupCanonicalize(docs, "doc_id", "text",
      "n_chars", pf).collect().map(_.toSeq).toSet
    val total = docs.count()
    println(s"resolution rows=${folded.size} (corpus $total), " +
      s"replay epoch was a no-op over ${epochAfterCrash}")

    // v4 chunk layout: one chunk per fold per table (docs/reps appends,
    // cc the changed-assignments delta), and the replayed batch's
    // chunks hold ZERO rows across ALL THREE tables (the no-op epoch
    // made real — no assignments changed either)
    val expectChunks = (1L to committedEpoch()).map(i => s"c$i")
    val replayChunkRows = spark.read
      .parquet(s"$stateRoot/docs/c${committedEpoch()}").count() +
      spark.read.parquet(s"$stateRoot/reps/c${committedEpoch()}").count() +
      spark.read.parquet(s"$stateRoot/cc/c${committedEpoch()}").count()
    println(s"chunks docs=${chunkDirs("docs").mkString(",")} " +
      s"reps=${chunkDirs("reps").mkString(",")} " +
      s"cc=${chunkDirs("cc").mkString(",")} " +
      s"replay-chunk rows=$replayChunkRows")
    // the structured stream explained the plan: per-fold layout
    // decisions AND the injected counts heal rode onStageEnd metadata
    val layoutEvents = stageMeta.filter(_._1.startsWith("hash64_layout"))
    val healEvents = stageMeta.filter(_._1.startsWith("hash64_counts_rebuild"))
    val countsAhead = stageMeta.filter(
      _._1.startsWith("hash64_counts_ahead_heal"))
    val sigAhead = stageMeta.filter(_._1.startsWith("sigcache_ahead_heal"))
    println(s"observer: ${layoutEvents.size} hash64_layout events " +
      s"(first: ${layoutEvents.headOption.map(_._2).getOrElse("-")}), " +
      s"${healEvents.size} counts-rebuild events, " +
      s"${countsAhead.size} counts-ahead heals, " +
      s"${sigAhead.size} sig-ahead heals")
    // both derived caches ended consistent with the committed reps
    val repsRows = spark.read.parquet(
      (1L to committedEpoch()).map(i => s"$stateRoot/reps/c$i"): _*).count()
    val countsN = graft.operators.Hash64Counts.foldedRows(conf, countsDir)
    val sigsN = graft.operators.SigCache.foldedRows(conf, sigsDir)
    val sigRebuilds = stageMeta.count(_._1.startsWith("sigcache_rebuild"))
    val pass =
      r1.batchesProcessed == 2 &&
      crashed &&
      epochAfterCrash == epochAfterRun1 + 1 && // the crash landed AFTER
                                           // the epoch swap (the window
                                           // the demo exists to prove)
      r3.batchesProcessed == 1 &&          // the WAL replayed batch 3
      committedEpoch() == epochAfterCrash + 1 && // replay swapped a new epoch
      r4.batchesProcessed == 0 &&          // then everything is committed
      chunkDirs("docs") == expectChunks && // one O(batch) append per fold
      chunkDirs("reps") == expectChunks &&
      chunkDirs("cc") == expectChunks &&   // one O(Δ) cc delta per fold
      replayChunkRows == 0L &&             // the replay appended nothing
                                           // and changed no assignments
      layoutEvents.size == 3 &&            // every COMMITTED fold's
                                           // decision is in the stream
                                           // (the crashed fold's is
                                           // rightly dropped)
      layoutEvents.forall(_._2.contains("chosen=")) &&
      healEvents.size == 1 &&              // full rebuild ONLY at fold-1's
                                           // bootstrap — the injected
                                           // ahead window must NOT pay one
      countsAhead.size == 1 &&             // the injected counts-ahead
                                           // chunk healed by suffix drop
      sigAhead.size == 1 &&                // ditto the sig cache's —
                                           // no text re-derivation
      countsN.contains(repsRows) &&        // caches == committed reps
      sigsN.contains(repsRows) &&
      sigRebuilds == 1 &&                  // sig cache fully rebuilt only
                                           // at its fold-1 bootstrap
      folded.size == total.toInt &&        // every doc resolves
      folded == oneShot                    // fold-through-crash == one-shot
    println(s"neardup-state crash-replay check: ${if (pass) "PASS" else "FAIL"}")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}

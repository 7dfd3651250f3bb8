package graft.examples

import graft._
import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, FuzzyJoin, Relevance, Similarity, SpanDedup}
import graft.sources._
import graft.util.Fs
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** INCREMENTAL curation: the LLM-operator family running under the
  * checkpointed pipeline driver — the composition that is this library's
  * reason to exist (the reference is an incremental engine; the curation
  * ops are what a pretraining pipeline runs through it). Documents
  * arrive file-by-file; each batch is quality-gated, PII-scrubbed,
  * exact-deduped BOTH in-batch and against the fingerprint history of
  * every prior batch, and SPAN-deduped against the gram-owner history of
  * every prior batch (Lee et al. substring dedup, incremental: a >=10
  * token run first seen in batch 3 is excised when batch 7 quotes it),
  * then appended to a curated Delta table while the new fingerprints and
  * gram owners land in history Delta tables.
  *
  * Round 10 adds the FOURTH incremental granularity: SEMANTIC dedup — a
  * quantizer trains once on the first batch ([[graft.operators.Similarity
  * .trainIvfCentroids]], persisted under the checkpoint), and every later
  * batch probes the accumulated embedding index
  * ([[graft.operators.Dedup.semDedupAgainstHistory]]) to drop documents
  * whose text is novel but whose embedding near-duplicates an
  * already-curated doc's.
  *
  * Round 12 adds eval-set DECONTAMINATION as the first gate: a benchmark
  * gram index ([[graft.operators.Dedup.benchmarkGramIndex]]) persists
  * once before the pipeline starts — a static read-only input like the
  * quantizer, NOT transactional state — and every arriving batch drops
  * docs sharing >= 28 distinct 12-grams with an eval doc
  * ([[graft.operators.Dedup.contaminationAgainstIndex]]): the eval
  * members themselves in run 1, and run-3 "leak" arrivals that quote an
  * eval doc behind a fresh preamble (novel fingerprint, novel spans —
  * only this gate can stop them).
  *
  * Exactly-once: all FOUR tables are stamped with the same
  * SetTransaction (appId, batchId) and each append is independently
  * guarded by [[DeltaWriter.lastTxnVersion]], so a crash ANYWHERE
  * between the commits replays into no-ops for whatever already landed.
  * COMMIT ORDER is load-bearing for replay determinism: outputs commit
  * before the history tables their recomputation READS — curated text
  * (reads all three histories) first, the span-gram index second, the
  * sem index third, the fingerprint history last. Any crash point then
  * replays with every not-yet-committed payload's inputs unchanged, so
  * the recomputed rows are identical. Two structural guards make the
  * middle payloads safe to replay after their OWN append landed: the
  * span path is idempotent against a history containing the batch's own
  * index (own-owner rows never mark their canonical occurrence and
  * cannot change owners), and the sem probe filters the index to
  * `batch_id < current` so a batch can never flag itself against its
  * own rows. The quantizer file is outside the transaction but training
  * is DETERMINISTIC — a replay retrains bit-identically and overwrites
  * the same content.
  *
  * At 100 TB the shapes hold: fingerprints are 16-byte md5 keys, gram
  * owners are 4-long rows aggregated per gram before any join, the
  * history checks are equi-joins Catalyst can broadcast or
  * shuffle-split, per-batch work never touches prior batches' text.
  *
  * Run: sbt "runMain graft.examples.IncrementalCurationDemo /tmp/graft-icur"
  */
object IncrementalCurationDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-icur")
    val spark = GraftSession.local(4, "graft-icurate")
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)

    val in = s"$work/in"; val cp = s"$work/checkpoint"
    val curated = s"$work/curated"; val fpHistory = s"$work/fingerprints"
    val spanHistory = s"$work/span_grams"
    val semHistory = s"$work/sem_index"; val quantizerPath = s"$cp/quantizer"
    val trainMix = s"$work/train_mix"; val mixCounts = s"$work/mix_counts"
    val lineHistory = s"$work/line_df"; val pqIndex = s"$work/pq_codes"
    val pqModelPath = s"$cp/pq_model"

    // deterministic synthetic embedding, a pure function of doc_id (the
    // image/text encoder stand-in — replay recomputes it bit-identically):
    // 32 xxhash64-mixed small-integer components. Ids in [40000, 50000)
    // are PLANTED SEMANTIC TWINS of doc_id - 40000: same base embedding,
    // one component nudged, so cosine ~0.9997 while their TEXT is novel —
    // only the semantic granularity can catch them.
    def embOf(base: Column): Column =
      transform(sequence(lit(0), lit(31)),
        j => (pmod(xxhash64(base, j), lit(23)) - lit(11)).cast("float"))
    def embCol: Column = {
      val twin = col("doc_id").between(40000L, 49999L)
      val base = when(twin, col("doc_id") - 40000L).otherwise(col("doc_id"))
      when(twin,
        transform(embOf(base), (x, i) => when(i === 0, x + 1.0f).otherwise(x)))
        .otherwise(embOf(base))
    }

    // stage the documents table as 3 arriving files
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.withColumn("bucket", pmod(col("doc_id"), lit(3)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$work/staged")
    fs.mkdirs(path(in))
    (0 until 3).foreach { b =>
      val part = fs.globStatus(path(s"$work/staged/bucket=$b/*.parquet"))(0)
      fs.rename(part.getPath, path(s"$in/docs_$b.parquet"))
    }

    val stopwords = Seq("the", "and", "of", "to", "a", "der", "die", "und",
      "le", "la", "et", "el", "los", "y")

    // eval-set registry: four corpus docs stand in for benchmark prompts.
    // The gram index is built ONCE (per eval-set release, in production)
    // and persisted OUTSIDE the transactional state — it is a static
    // read-only input like the quantizer, so screening is stateless per
    // batch. Indexed over the SAME preprocessing (PII scrub) the
    // arriving batches get, so redaction can't mask a leak.
    val benchIds = Seq(101L, 113L, 256L, 444L)
    val benchIdx = s"$work/bench_index"
    Dedup.benchmarkGramIndex(
      docs.filter(col("doc_id").isin(benchIds: _*))
        .select(col("doc_id"), Curation.redactPii(col("text")).as("text")),
      "doc_id", "text", n = 12)
      .write.mode("overwrite").parquet(benchIdx)

    def pipeline(crashBetweenCommits: Boolean = false) = {
      val ckpt = new FileStreamCheckpoint(cp, conf)
      val source = new FileSource(in, ckpt, "parquet",
        FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
      new Pipeline(
        source = source,
        reader = ctx => ctx.spark.read.parquet(ctx.files: _*),
        transform = Some((df, _) => df
          .select(col("doc_id"), col("source"),
            Curation.redactPii(col("text")).as("text"),
            TextFunctions.qualityScore(col("text"), stopwords).as("quality"),
            TextFunctions.langIdHeuristic(col("text")).as("lang"),
            embCol.as("emb"))
          .filter(col("quality") >= 0.3 && col("lang") =!= "und")),
        writer = (df, ctx) => {
          import ctx.spark.implicits._
          val w = new DeltaWriter(ctx.spark, conf)
          val appId = "icurate"
          // eval-set decontamination FIRST (cheapest gate: broadcast
          // index, map-side hash probe): any arriving doc sharing >= 28
          // distinct 12-grams with a benchmark doc — the eval members
          // themselves or later docs quoting them — never enters the
          // curated table. 28 clears this corpus's template noise (the
          // max spurious overlap measured 24) while a verbatim quote
          // shares hundreds.
          val screened = {
            val hits = Dedup.contaminationAgainstIndex(
              df, "doc_id", "text", ctx.spark.read.parquet(benchIdx),
              n = 12, minShared = 28)
              .select(col("corpus_id").as("doc_id")).distinct()
            df.join(hits, Seq("doc_id"), "left_anti")
          }
          // in-batch exact dedup on the NORMALIZED content fingerprint
          // (case/punct re-encodings share a key), then the history
          // anti-join: only never-seen content survives
          val batch = Dedup.exact(
            screened.withColumn("fp", md5(Curation.normalizeText(col("text")))),
            Seq("fp"), "doc_id")
          val fresh =
            if (w.tableExists(fpHistory))
              batch.join(w.read(fpHistory), Seq("fp"), "left_anti")
            else batch
          // cross-batch SEMANTIC dedup: the quantizer trains ONCE on the
          // first batch and persists under the checkpoint (deterministic
          // training — a replay retrains bit-identically); later batches
          // probe the embedding history under the SAME model. The probe
          // reads only rows with batch_id < this batch, so a partially
          // replayed batch can never flag itself against its own index
          val quant =
            if (Fs.exists(path(quantizerPath), conf))
              Similarity.loadQuantizer(ctx.spark, quantizerPath)
            else {
              val m = Similarity.trainIvfCentroids(
                fresh, "doc_id", "emb", nlist = 8)
              Similarity.saveQuantizer(ctx.spark, quantizerPath, m)
              m
            }
          // PQ codebooks under the same train-once discipline: the
          // pq-codes history below is only meaningful under this exact
          // (quantizer, codebook) pair (its HistoryFormat guards the
          // derivation shape)
          val pqm =
            if (Fs.exists(path(pqModelPath), conf))
              Similarity.loadPqModel(ctx.spark, pqModelPath)
            else {
              val m = Similarity.trainPq(fresh, "doc_id", "emb", m = 4)
              Similarity.savePqModel(ctx.spark, pqModelPath, m)
              m
            }
          // sem-index format gate: fresh tables stamp here; existing
          // tables re-validate INSIDE the *Table probe operator (the
          // operator-enforced HistoryFormat contract)
          graft.state.HistoryFormat.ensure(
            spark.sparkContext.hadoopConfiguration, semHistory,
            graft.state.HistoryFormat.ClusterAssignment,
            hasData = w.tableExists(semHistory))
          val kept =
            if (w.tableExists(semHistory) && quant.nonEmpty) {
              val flagged = Dedup.semDedupAgainstHistoryTable(
                fresh, semHistory,
                "doc_id", "emb", threshold = 0.92, quantizer = quant,
                histFilter = _.filter(col("batch_id") < ctx.batchId))
                .select("doc_id").distinct()
              fresh.join(flagged, Seq("doc_id"), "left_anti")
            } else fresh
          // cross-batch substring-span dedup: any >=10-token run already
          // seen in a prior batch (or earlier in this one) is excised
          // from the curated text; the canonical first occurrence stays
          // format gate: a stale-format gram history (e.g. pre-r11
          // chained-h2 keys) would silently match nothing. Fresh tables
          // stamp here; existing tables refuse loudly from INSIDE
          // spansWithHistoryTable (operator-enforced, remedy named)
          graft.state.HistoryFormat.ensure(
            spark.sparkContext.hadoopConfiguration, spanHistory,
            graft.state.HistoryFormat.SpanGramOwner,
            hasData = w.tableExists(spanHistory))
          val sp =
            if (w.tableExists(spanHistory))
              SpanDedup.spansWithHistoryTable(
                kept, spanHistory, "doc_id", "text", n = 10)
            else SpanDedup.spansWithHistory(
              kept, Seq.empty[(Long, Long, Long, Long)]
                .toDF("h1", "h2", "own", "occ"),
              "doc_id", "text", n = 10)
          val excised = SpanDedup.applySpans(kept, sp, "doc_id", "text")
            .cache()
          try {
            // commit order is load-bearing — see the class doc
            val curatedOut = excised.select(col("doc_id"), col("source"),
              col("clean_text").as("text"), col("quality"), col("lang"),
              col("fp"), col("n_tokens_removed"))
            if (!w.lastTxnVersion(curated, appId).exists(_ >= ctx.batchId))
              w.write(curatedOut, curated, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            if (crashBetweenCommits)
              throw new RuntimeException("injected crash between commits")
            if (!w.lastTxnVersion(spanHistory, appId).exists(_ >= ctx.batchId))
              w.write(
                SpanDedup.ownerIndex(kept, "doc_id", "text", n = 10),
                spanHistory, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            if (!w.lastTxnVersion(semHistory, appId).exists(_ >= ctx.batchId))
              w.write(
                Dedup.semDedupIndex(kept, "doc_id", "emb", quant)
                  .withColumn("batch_id", lit(ctx.batchId)),
                semHistory, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            // two more history families, maintained index-only here (their
            // dedup gates live in the line/PQ suites): the PQ code index
            // (m+4 B/vector searchable ANN state) and a line-df index over
            // a line-per-word rendering (the corpus is single-line word
            // soup; the rendering supplies real line granularity for the
            // maintenance stage). Fresh tables stamp their HistoryFormat
            // here; the end-of-run probes re-validate INSIDE the *Table
            // operators.
            graft.state.HistoryFormat.ensure(conf, pqIndex,
              graft.state.HistoryFormat.PqCodes,
              hasData = w.tableExists(pqIndex))
            if (quant.nonEmpty &&
                !w.lastTxnVersion(pqIndex, appId).exists(_ >= ctx.batchId))
              w.write(
                Similarity.pqIndexBatch(kept, "doc_id", "emb", pqm, quant),
                pqIndex, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            graft.state.HistoryFormat.ensure(conf, lineHistory,
              graft.state.HistoryFormat.LineDf,
              hasData = w.tableExists(lineHistory))
            if (!w.lastTxnVersion(lineHistory, appId).exists(_ >= ctx.batchId))
              w.write(
                Curation.lineIndex(kept.select(col("doc_id"),
                    regexp_replace(col("text"), " ", "\n").as("ltext")),
                  "doc_id", "ltext"),
                lineHistory, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            // train-mix stage: the curated stream's language mix steers
            // toward target shares ACROSS batches (arrival order is not
            // language-balanced) via the deficit sampler against the
            // realized-count state table. On a crash replay the upstream
            // gates recompute identically (their histories for this batch
            // never landed — fp commits last) and the txn guards skip the
            // landed half, so accepted ∪ counts stay consistent.
            // skewed shares so BOTH regimes show in the report: src0/src1
            // saturate at their availability (deficit clamps to b_d),
            // src2/src3 stay threshold-limited (graded acceptance)
            val mixTargets = Map("src0" -> 0.5, "src1" -> 0.25,
              "src2" -> 0.15, "src3" -> 0.1)
            val mixHist =
              if (w.tableExists(mixCounts)) w.read(mixCounts)
              else Seq.empty[(String, Long)].toDF("source", "have")
            val mixAccepted = graft.operators.Mixing.steeredSample(
              curatedOut.select("doc_id", "source"), "doc_id", "source",
              mixTargets, mixHist, acceptFrac = 0.25)
            if (!w.lastTxnVersion(trainMix, appId).exists(_ >= ctx.batchId))
              w.write(mixAccepted, trainMix, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            if (!w.lastTxnVersion(mixCounts, appId).exists(_ >= ctx.batchId))
              w.write(graft.operators.Mixing.acceptedCounts(mixAccepted, "source"),
                mixCounts, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            if (!w.lastTxnVersion(fpHistory, appId).exists(_ >= ctx.batchId))
              w.write(excised.select("fp"), fpHistory, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            Map("curated" -> excised.count().toString)
          } finally excised.unpersist()
        },
        observer = new LoggingObserver,
        spark = spark)
    }

    val w = new DeltaWriter(spark, conf)
    println("== run 1: three files arrive ==")
    val r1 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    val afterR1 = w.read(curated).count()
    println(s"run1: batches=${r1.batchesProcessed} curated=$afterR1")

    println("== run 2: nothing new ==")
    val r2 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    println(s"run2: batches=${r2.batchesProcessed}")

    // a fourth file arrives: re-sent copies of already-curated docs under
    // NEW ids (same text -> same fingerprint), genuinely new docs, and 15
    // SEMANTIC TWINS — novel text (fresh fingerprint, no quoted >=10-token
    // run reaches the span stage: the sem filter runs first) whose
    // embedding is a nudged copy of an already-curated run-1 doc's; only
    // the embedding-history granularity can catch them. Twin bases are
    // picked FROM the curated table so each base is guaranteed to be in
    // the sem index.
    println("== run 3: late file with 30 cross-batch dupes + 20 new docs " +
      "+ 15 semantic twins ==")
    val semBases = w.read(curated).filter(col("doc_id") < 10000)
      .orderBy("doc_id").limit(15).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val resent = docs.filter(col("doc_id") < 30)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val novel = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(lit("entirely novel prose about batch "), col("doc_id"),
          lit(" "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val semTwins = docs.filter(col("doc_id").isin(semBases: _*))
      .select((col("doc_id") + 40000).as("doc_id"),
        concat(lit("semantically twinned fresh note "), col("doc_id"),
          lit(" "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    // ... plus 2 LEAK ATTEMPTS: new ids quoting an eval doc's full text
    // after a novel preamble — fresh fingerprint, novel spans relative
    // to the CURATED corpus (eval members never entered it), so only the
    // decontamination screen can stop them
    val leaks = docs.filter(col("doc_id").isin(101L, 256L))
      .select((col("doc_id") + 50000).as("doc_id"),
        concat(lit("attempted eval leak "), col("doc_id"), lit(" "),
          col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    resent.unionByName(novel).unionByName(semTwins).unionByName(leaks)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$work/late")
    fs.rename(fs.globStatus(path(s"$work/late/*.parquet"))(0).getPath,
      path(s"$in/docs_late.parquet"))
    val r3 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    val afterR3 = w.read(curated).count()
    println(s"run3: batches=${r3.batchesProcessed} curated=$afterR3 " +
      s"(+${afterR3 - afterR1})")

    // run 4: a fifth file arrives and the writer CRASHES between the
    // curated commit and the fingerprint commit; the WAL replays the
    // batch, the txn guard turns the landed half into a no-op, and the
    // recovery run completes the other half — exactly once, both tables
    println("== run 4: crash injected between the two table commits ==")
    val late2 = docs.filter(col("doc_id") >= 480)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(lit("post-crash novel text "), col("doc_id"), lit(" "),
          col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    late2.coalesce(1).write.mode("overwrite").parquet(s"$work/late2")
    fs.rename(fs.globStatus(path(s"$work/late2/*.parquet"))(0).getPath,
      path(s"$in/docs_late2.parquet"))
    val crashed =
      try { pipeline(crashBetweenCommits = true)
        .run(RunOptions(once = false, sleepMs = 0)); false }
      catch { case _: Throwable => true }
    println(s"crashed as planned: $crashed")
    val r4 = pipeline().run(RunOptions(once = false, sleepMs = 0))
    val afterR4 = w.read(curated).count()
    println(s"run4 recovery: batches=${r4.batchesProcessed} curated=$afterR4")

    val curatedDf = w.read(curated)
    val rows = curatedDf.count()
    val distinctFp = curatedDf.select("fp").distinct().count()
    val resentSurvivors = curatedDf
      .filter(col("doc_id") >= 10000 && col("doc_id") < 20000).count()
    val novelSurvivors = curatedDf.filter(col("doc_id") >= 20000).count()
    // run 3's novel docs EMBED a batch-0/1/2 document verbatim after a
    // novel preamble: the fingerprint differs (novel content), but the
    // quoted body is a cross-batch duplicated span — the incremental
    // span history must excise it in the later batch
    val run3Novel = curatedDf
      .filter(col("doc_id") >= 20000 && col("doc_id") < 30000).count()
    val lateSpanExcised = curatedDf
      .filter(col("doc_id") >= 20000 && col("doc_id") < 30000 &&
        col("n_tokens_removed") > 0).count()
    val fpRows = w.read(fpHistory).count()
    val gramRows = w.read(spanHistory).count()
    // the 15 semantic twins: novel text, near-identical embedding — only
    // the embedding-history granularity can drop them, and it must drop
    // ALL of them (every twin's base is a curated doc, so its vector is
    // guaranteed to be in the sem index)
    val semSurvivors = curatedDf
      .filter(col("doc_id") >= 40000 && col("doc_id") < 50000).count()
    val semRows = w.read(semHistory).count()
    // the persisted state (quantizer + sem index) must flag a fresh
    // semantic twin directly through the operator surface too
    val semProbe = docs.filter(col("doc_id") === semBases.head)
      .select((col("doc_id") + 40000).as("doc_id"),
        lit("operator probe").as("text"))
      .withColumn("emb", embCol)
    val probeSem = Dedup.semDedupAgainstHistory(
      semProbe, w.read(semHistory), "doc_id", "emb", threshold = 0.92,
      quantizer = Similarity.loadQuantizer(spark, quantizerPath)).count()
    println(s"curated rows=$rows distinct-content=$distinctFp " +
      s"resent-survivors=$resentSurvivors novel-survivors=$novelSurvivors " +
      s"fingerprint-history=$fpRows gram-history=$gramRows " +
      s"sem-index=$semRows")
    println(s"cross-batch span excision: $lateSpanExcised of " +
      s"$run3Novel run-3 novel docs lost their quoted earlier-batch body")
    println(s"cross-batch semantic dedup: ${semBases.size} planted twins, " +
      s"$semSurvivors survived; operator probe flags=$probeSem")
    // the decontamination screen must have stopped the eval members in
    // their original batches AND the run-3 leak attempts quoting them
    val benchLeaks = curatedDf
      .filter(col("doc_id").isin(benchIds: _*) || col("doc_id") >= 50000L)
      .count()
    println(s"decontamination: ${benchIds.size} eval members + 2 quoting " +
      s"leak attempts screened, $benchLeaks reached the curated table")
    // maintenance composes with the incremental state. The fingerprint
    // history is already one row per curated doc — FILE-level compaction
    // (concatenate small per-batch files, dataChange=false) is all it
    // needs. The span-gram history is different: per-batch appends hold
    // one row per (batch, gram), so overlapping batches grow it toward B
    // copies of every hot gram and EVERY batch re-reads all of them
    // (uniform hash keys defeat min/max skipping — row count is the only
    // lever on that scan). Its compaction must AGGREGATE:
    // SpanDedup.compactIndex caps it at one row per distinct gram (min
    // owner, occ saturated at 2) with identical spansWithHistory results,
    // so the per-batch history read tracks the corpus's distinct grams,
    // not its batch lifetime.
    val filesBefore = Seq(fpHistory, spanHistory).map(w.activeAdds(_).size).sum
    val gramDistinct = w.read(spanHistory)
      .select("h1", "h2").distinct().count()
    w.compact(fpHistory, smallFileBytes = 32L * 1024 * 1024)
    w.write(SpanDedup.compactIndex(w.read(spanHistory)), spanHistory,
      DeltaWriteMode.Overwrite)
    val filesAfter = Seq(fpHistory, spanHistory).map(w.activeAdds(_).size).sum
    val fpRowsCompacted = w.read(fpHistory).count()
    val gramRowsCompacted = w.read(spanHistory).count()
    println(s"history compaction: $filesBefore files -> $filesAfter; " +
      s"fp rows preserved=${fpRowsCompacted == fpRows} " +
      s"gram rows bounded to distinct=${gramRowsCompacted == gramDistinct} " +
      s"(was $gramRows)")
    // the compacted history must still resolve cross-batch spans: a probe
    // quoting an already-curated body loses it
    val probe = w.read(curated)
      .filter(col("doc_id") < 10000 && col("n_tokens_removed") === 0 &&
        size(split(col("text"), " ")) >= 10)
      .orderBy("doc_id").limit(1)
      .select(lit(90000L).as("doc_id"),
        concat(lit("probe prefix "), col("text")).as("text"))
    val probeSpans = SpanDedup.spansWithHistory(
      probe, w.read(spanHistory), "doc_id", "text", n = 10).count()
    println(s"post-compaction probe: $probeSpans span(s) resolved")
    // the remaining history families under the same maintenance pass:
    // sem + PQ rows are one-per-curated-vector — FILE-level compaction,
    // row-preserving; the line-df history holds per-(batch, line) rows —
    // AGGREGATING compaction (min owner, summed df) bounded by the
    // corpus's distinct lines. All five persisted histories compact in
    // this one stage, and the post-compaction probes run through the
    // OPERATOR-ENFORCED *Table surfaces (marker re-validated inside).
    val extraFilesBefore = Seq(semHistory, pqIndex, lineHistory)
      .map(w.activeAdds(_).size).sum
    val semRowsBefore = w.read(semHistory).count()
    val pqRowsBefore = w.read(pqIndex).count()
    val lineRowsBefore = w.read(lineHistory).count()
    val lineDistinct = w.read(lineHistory).select("h1", "h2").distinct().count()
    w.compact(semHistory, smallFileBytes = 32L * 1024 * 1024)
    w.compact(pqIndex, smallFileBytes = 32L * 1024 * 1024)
    w.write(Curation.compactLineIndex(w.read(lineHistory)), lineHistory,
      DeltaWriteMode.Overwrite)
    val extraFilesAfter = Seq(semHistory, pqIndex, lineHistory)
      .map(w.activeAdds(_).size).sum
    val semRowsAfter = w.read(semHistory).count()
    val pqRowsAfter = w.read(pqIndex).count()
    val lineRowsAfter = w.read(lineHistory).count()
    println(s"history compaction (sem/pq/line): files $extraFilesBefore -> " +
      s"$extraFilesAfter; sem rows preserved=${semRowsAfter == semRowsBefore} " +
      s"pq rows preserved=${pqRowsAfter == pqRowsBefore} " +
      s"line rows bounded to distinct=${lineRowsAfter == lineDistinct} " +
      s"(was $lineRowsBefore)")
    // post-compaction probes through the *Table operators: a known
    // curated line still excises, and a nudged copy of a curated
    // embedding still resolves to its base as exact-cosine top-1
    val lineProbe = Curation.dedupLinesAgainstHistoryTable(
      w.read(curated).filter(col("doc_id") < 10000).orderBy("doc_id").limit(1)
        .select(lit(91000L).as("doc_id"),
          element_at(split(col("text"), " "), 1).as("text")),
      lineHistory, "doc_id", "text")
      .agg(coalesce(sum("n_lines_removed"), lit(0L))).head.getLong(0)
    val pqProbeBase = semBases.head
    val pqVectors = curatedDf.select(col("doc_id"), embCol.as("emb"))
    val pqProbeHit = Similarity.ivfPqTopKFromIndexTable(
      docs.filter(col("doc_id") === pqProbeBase)
        .select((col("doc_id") + 40000).as("doc_id"))
        .withColumn("emb", embCol),
      pqIndex, pqVectors, "doc_id", "emb", k = 1,
      Similarity.loadPqModel(spark, pqModelPath), nprobe = 2, rerank = 16,
      maxBucket = 0, quantizer = Similarity.loadQuantizer(spark, quantizerPath))
      .filter(col("neighbor_id") === pqProbeBase).count()
    println(s"post-compaction probes (line/pq): line excised=$lineProbe, " +
      s"pq top-1 resolves to base=${pqProbeHit == 1}")
    // train-mix accounting: exactly-once across the crash (every accepted
    // doc once, counts table == accepted rows), mix ⊆ curated, and the
    // steering state actually shifted shares toward the targets
    val mixDf = w.read(trainMix)
    val mixTotal = mixDf.count()
    val mixDistinct = mixDf.select("doc_id").distinct().count()
    val mixOutsideCurated = mixDf.select("doc_id")
      .join(curatedDf.select("doc_id"), Seq("doc_id"), "left_anti").count()
    val mixCountsSum = w.read(mixCounts)
      .agg(coalesce(sum("have"), lit(0L))).head.getLong(0)
    val mixBySrc = mixDf.groupBy("source").count().orderBy("source")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    println(s"train-mix: $mixTotal docs accepted ($mixBySrc; steered " +
      s"toward src0=.5 src1=.25 src2=.15 src3=.1), counts-state sum=$mixCountsSum")
    // ----- model-maintenance drift cycles (vocab + gram-order) -------
    // the quantizer's drift→retrain→re-probe loop extended to the other
    // two persisted models: a vocab and a gram-order model built on the
    // curated corpus degrade when the stream shifts (here: a vowel→digit
    // mutation standing in for a domain/language move); drift fires, the
    // rebuild on the shifted batch clears it and restores coverage
    // (vocab: OOV rate) / selectivity (gram order: prefix-candidate
    // volume — a stale model ranks every unseen gram df-0, so hot grams
    // stop being pushed out of prefixes and candidates inflate)
    val maintSample = w.read(curated)
      .filter(col("doc_id") < 10000).orderBy("doc_id").limit(200)
      .select("doc_id", "text").cache()
    val vocab0 = Curation.buildWordVocab(maintSample, "text", size = 256)
    val shiftedDocs = maintSample.select(col("doc_id"),
      translate(col("text"), "aeiou", "43105").as("text"))
    def vd(b: org.apache.spark.sql.DataFrame, v: Seq[(String, Int)]) =
      Curation.vocabDrift(b, "doc_id", "text", v,
        maxDocOov = 0.2, maxHighFrac = 0.2).head()
    val vdIn = vd(maintSample, vocab0)
    val vdShift = vd(shiftedDocs, vocab0)
    val vocab1 = Curation.buildWordVocab(shiftedDocs, "text", size = 256)
    val vdRebuilt = vd(shiftedDocs, vocab1)
    println(s"vocab drift cycle: in-dist rebuild=${vdIn.getBoolean(5)}, " +
      s"shifted rebuild=${vdShift.getBoolean(5)}, post-rebuild " +
      s"rebuild=${vdRebuilt.getBoolean(5)} " +
      s"(oov ${vdShift.getDouble(3)} -> ${vdRebuilt.getDouble(3)})")
    val keys = maintSample.select(col("doc_id"),
      substring(col("text"), 1, 24).as("k"))
    val shiftedKeys = shiftedDocs.select(col("doc_id"),
      substring(col("text"), 1, 24).as("k"))
    val order0 = FuzzyJoin.gramOrderModel(keys, "k")
    def candVolume(order: org.apache.spark.sql.DataFrame): Long = {
      val pi = FuzzyJoin.prefixIndex(shiftedKeys, "doc_id", "k",
        maxDist = 1, order = order)
      pi.select(col("sid").as("ia"), col("g"))
        .join(pi.select(col("sid").as("ib"), col("g")), Seq("g"))
        .filter(col("ia") < col("ib"))
        .select("ia", "ib").distinct().count()
    }
    val goShift = FuzzyJoin.gramOrderDrift(shiftedKeys, "doc_id", "k", order0)
      .head()
    val order1 = FuzzyJoin.gramOrderModel(shiftedKeys, "k")
    val goRebuilt = FuzzyJoin.gramOrderDrift(shiftedKeys, "doc_id", "k", order1)
      .head()
    val (vStale, vFresh) = (candVolume(order0), candVolume(order1))
    println(s"gram-order drift cycle: shifted rebuild=${goShift.getBoolean(4)}, " +
      s"post-rebuild rebuild=${goRebuilt.getBoolean(4)} " +
      s"(prefix candidates $vStale -> $vFresh)")
    // classifier-weights drift cycle: the fourth persisted model. The
    // weight vector fit on the curated corpus (coverage model — same
    // format and zero-set semantics as a trained one) goes stale under
    // the same vowel→digit move: features land in never-touched buckets,
    // drift fires, the refit on the shifted batch clears it. The stale
    // and fresh models both travel through the marker-stamped store —
    // the load path a production scorer would use.
    import graft.operators.QualityClf
    val clf0 = QualityClf.Model(
      QualityClf.featureCoverage(maintSample, "text", 4096), 0L)
    QualityClf.save(spark, s"$work/clf_weights", clf0)
    def cd(b: org.apache.spark.sql.DataFrame, m: QualityClf.Model) =
      QualityClf.drift(b, "doc_id", "text", m,
        maxDocZero = 0.2, maxHighFrac = 0.2).head()
    val cdIn = cd(maintSample, QualityClf.load(spark, s"$work/clf_weights"))
    val cdShift = cd(shiftedDocs, clf0)
    val clf1 = QualityClf.Model(
      QualityClf.featureCoverage(shiftedDocs, "text", 4096), 0L)
    QualityClf.save(spark, s"$work/clf_weights", clf1)
    val cdRebuilt = cd(shiftedDocs,
      QualityClf.load(spark, s"$work/clf_weights"))
    println(s"clf-weights drift cycle: in-dist rebuild=${cdIn.getBoolean(5)}, " +
      s"shifted rebuild=${cdShift.getBoolean(5)}, post-rebuild " +
      s"rebuild=${cdRebuilt.getBoolean(5)} " +
      s"(zero-bucket rate ${cdShift.getDouble(3)} -> ${cdRebuilt.getDouble(3)})")
    // bm25 collection-stats drift cycle: the FIFTH persisted model. The
    // retrieval snapshot (df/n/avgdl) built on the curated corpus goes
    // stale under the same vowel→digit move — mutated words are terms
    // the snapshot never saw, so the new-term rate floods and rebuild
    // fires; the re-snapshot on the shifted batch clears it. Both
    // snapshots travel through the marker-stamped store (the
    // bm25UnderStatsTable load path a production scorer would use).
    Relevance.saveBm25Stats(spark, s"$work/bm25_stats",
      Relevance.bm25CollectionStats(maintSample, "doc_id", "text"))
    def bd(b: org.apache.spark.sql.DataFrame) =
      Relevance.bm25StatsDriftTable(b, "doc_id", "text",
        s"$work/bm25_stats", maxNewTermRate = 0.2, maxAvgdlShift = 0.5)
        .head()
    val bdIn = bd(maintSample)
    val bdShift = bd(shiftedDocs)
    Relevance.saveBm25Stats(spark, s"$work/bm25_stats",
      Relevance.bm25CollectionStats(shiftedDocs, "doc_id", "text"))
    val bdRebuilt = bd(shiftedDocs)
    println(s"bm25-stats drift cycle: in-dist rebuild=${bdIn.getBoolean(5)}, " +
      s"shifted rebuild=${bdShift.getBoolean(5)}, post-rebuild " +
      s"rebuild=${bdRebuilt.getBoolean(5)} " +
      s"(new-term rate ${bdShift.getDouble(1)} -> ${bdRebuilt.getDouble(1)})")
    // table-profile drift cycle: the SIXTH persisted model. The stamped
    // profile of the curated slice goes stale when the feed starts
    // sending NULL bodies (the null-rate channel — the shape a broken
    // upstream extractor produces); drift fires against the stale
    // profile, the re-profile on the shifted slice clears it. Both
    // profiles travel through the marker-stamped store (the
    // profileDriftTable load path a production gate would use).
    import graft.operators.Profile
    Profile.saveProfile(Profile.tableProfile(maintSample),
      s"$work/table_profile")
    def pd(b: org.apache.spark.sql.DataFrame) =
      Profile.profileDriftTable(Profile.tableProfile(b),
          s"$work/table_profile", maxNullDelta = 0.2, maxNdvRatio = 4.0)
        .filter(col("column_name") === "text").head()
    val profShifted = maintSample.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, lit(null).cast("string"))
        .otherwise(col("text")).as("text"))
    val pdIn = pd(maintSample)
    val pdShift = pd(profShifted)
    Profile.saveProfile(Profile.tableProfile(profShifted),
      s"$work/table_profile")
    val pdRebuilt = pd(profShifted)
    println("table-profile drift cycle: in-dist drifted=" +
      s"${pdIn.getAs[Boolean]("drifted")}, shifted drifted=" +
      s"${pdShift.getAs[Boolean]("drifted")}, post-rebuild drifted=" +
      s"${pdRebuilt.getAs[Boolean]("drifted")} " +
      s"(null delta ${pdShift.getAs[Double]("null_delta")} -> " +
      s"${pdRebuilt.getAs[Double]("null_delta")})")
    // score-cuts drift cycle: the SEVENTH persisted model. CCNet-style
    // bucket labels ride percentile cuts stamped on the curated slice's
    // LM-surprisal scores; under the vowel→digit move every doc scores
    // high-nll and floods the tail bucket — share skew fires. The
    // rebuild retrains the score model AND re-cuts on the shifted batch
    // (the CCNet pairing: cuts are only meaningful under their scorer),
    // restoring equal mass. Both cut tables travel through the
    // marker-stamped store (the scoreCutsDriftTable load path).
    val lm0 = Curation.ngramLm(maintSample, "text", n = 3)
    def cutsScored(b: org.apache.spark.sql.DataFrame,
        lm: graft.operators.Curation.NgramLm) =
      Curation.surprisalScore(b, "doc_id", "text", lm)
    Curation.saveScoreCuts(spark, s"$work/score_cuts",
      Curation.scoreCutsModel(cutsScored(maintSample, lm0), "nll", 3))
    def sd(b: org.apache.spark.sql.DataFrame,
        lm: graft.operators.Curation.NgramLm) =
      Curation.scoreCutsDriftTable(cutsScored(b, lm), "nll",
        s"$work/score_cuts", maxShareSkew = 0.25).orderBy("bucket_pos").head()
    val sdIn = sd(maintSample, lm0)
    val sdShift = sd(shiftedDocs, lm0)
    val lm1 = Curation.ngramLm(shiftedDocs, "text", n = 3)
    Curation.saveScoreCuts(spark, s"$work/score_cuts",
      Curation.scoreCutsModel(cutsScored(shiftedDocs, lm1), "nll", 3))
    val sdRebuilt = sd(shiftedDocs, lm1)
    println("score-cuts drift cycle: in-dist rebuild=" +
      s"${sdIn.getAs[Boolean]("rebuild")}, shifted rebuild=" +
      s"${sdShift.getAs[Boolean]("rebuild")}, post-rebuild rebuild=" +
      s"${sdRebuilt.getAs[Boolean]("rebuild")} " +
      s"(max share skew ${sdShift.getAs[Double]("max_skew")} -> " +
      s"${sdRebuilt.getAs[Double]("max_skew")})")
    val driftCyclesOk =
      !sdIn.getAs[Boolean]("rebuild") && sdShift.getAs[Boolean]("rebuild") &&
        !sdRebuilt.getAs[Boolean]("rebuild") &&
        sdRebuilt.getAs[Double]("max_skew") <
          sdShift.getAs[Double]("max_skew") &&
      !pdIn.getAs[Boolean]("drifted") && pdShift.getAs[Boolean]("drifted") &&
        !pdRebuilt.getAs[Boolean]("drifted") &&
        pdRebuilt.getAs[Double]("null_delta") <
          pdShift.getAs[Double]("null_delta") &&
      !vdIn.getBoolean(5) && vdShift.getBoolean(5) &&
        !vdRebuilt.getBoolean(5) &&
        vdRebuilt.getDouble(3) < vdShift.getDouble(3) &&
        goShift.getBoolean(4) && !goRebuilt.getBoolean(4) &&
        vFresh < vStale &&
        !cdIn.getBoolean(5) && cdShift.getBoolean(5) &&
        !cdRebuilt.getBoolean(5) &&
        cdRebuilt.getDouble(3) < cdShift.getDouble(3) &&
        !bdIn.getBoolean(5) && bdShift.getBoolean(5) &&
        !bdRebuilt.getBoolean(5) &&
        bdRebuilt.getDouble(1) < bdShift.getDouble(1)
    val ok = r1.batchesProcessed == 3 && r2.batchesProcessed == 0 &&
      driftCyclesOk &&               // drift→rebuild→re-probe restores both models
      mixTotal > 0 && mixTotal == mixDistinct &&  // mix exactly-once
      mixCountsSum == mixTotal &&                 // state == realized
      mixOutsideCurated == 0 &&                   // mix ⊆ curated
      r3.batchesProcessed == 1 &&
      crashed && r4.batchesProcessed == 1 && // WAL replayed the crashed batch
      afterR4 > afterR3 &&           // the crashed batch's docs DID land
      rows == distinctFp &&          // nothing curated twice, ever
      resentSurvivors == 0 &&        // cross-batch dupes all caught
      novelSurvivors > 0 &&          // new content still flows
      run3Novel > 0 &&
      lateSpanExcised == run3Novel && // quoted bodies excised cross-batch
      semBases.size == 15 &&
      semSurvivors == 0 &&           // all semantic twins caught
      semRows == rows &&             // sem index covers exactly the curated set
      probeSem >= 1 &&               // persisted quantizer+index flag a twin
      benchLeaks == 0 &&             // eval members + quoting leaks all screened
      fpRows == rows &&              // history covers exactly the curated set
      gramRows > 0 &&
      filesAfter < filesBefore &&    // compaction actually consolidated
      fpRowsCompacted == fpRows &&   // file-concat side is lossless
      gramRowsCompacted == gramDistinct && // span side is ROW-BOUNDED ...
      gramRowsCompacted < gramRows &&      // ... and actually shrank
      probeSpans > 0 &&              // ... without losing resolution
      extraFilesAfter < extraFilesBefore &&   // sem/pq/line consolidated
      semRowsAfter == semRowsBefore &&        // file-concat sides lossless
      pqRowsAfter == pqRowsBefore &&
      lineRowsAfter == lineDistinct &&        // line side row-bounded ...
      lineRowsAfter < lineRowsBefore &&       // ... and actually shrank
      lineProbe >= 1 &&              // line history resolves post-compaction
      pqProbeHit == 1                // pq index resolves post-compaction
    println(s"incremental curation check: ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

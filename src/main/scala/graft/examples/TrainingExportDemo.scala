package graft.examples

import graft.GraftSession
import graft.operators.{Mixing, Packing}
import org.apache.spark.sql.functions._

/** The training-export path end to end: curated documents -> token-budget
  * EPOCH PLAN (how many passes each source gets) -> materialized sample
  * stream (one row per document x epoch) -> SEQUENCE PACKING into
  * fixed-budget packs (GPT-style concatenate-then-chunk, zero pad
  * waste) -> deterministic GLOBAL SHUFFLE of the packs -> sorted SHARD
  * DIRECTORIES a data loader streams sequentially.
  *
  * Every stage is the deterministic operator the oracle gate checks
  * (epochPlan / packAssignments / globalShuffle / writeShards), so the
  * whole export replays bit-identically from the same inputs — the
  * property a training run actually needs: the data order IS part of
  * the experiment.
  *
  * The demo proves, and prints, the invariants that matter:
  *  - token conservation: sum of pack-segment lengths == sum of stream
  *    tokens (packing loses and pads nothing);
  *  - exact pack budgets: every pack except the last holds exactly
  *    `budget` tokens;
  *  - id payloads conserve too: materializing each pack's ACTUAL
  *    subword-id sequence (encoded once under a persisted BPE model,
  *    segment-sliced, concatenated in stream order) reproduces the same
  *    totals — tokenization and packing agree token for token, and the
  *    whole export runs in the id space a trainer consumes;
  *  - shard balance and per-shard stream order;
  *  - end-to-end determinism: a re-run produces the identical shards.
  *
  * Run: sbt "runMain graft.examples.TrainingExportDemo /tmp/graft-export"
  */
object TrainingExportDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-export")
    val spark = GraftSession.local(4, "graft-export-demo")
    spark.sparkContext.setLogLevel("ERROR")

    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 0. the tokenizer IS part of the export format: train a subword
    // (BPE) model once, persist it under its format marker, and reload
    // through the marker-enforcing path — every count, pack boundary,
    // and payload id below is in the SUBWORD id space a trainer
    // actually consumes, not whitespace-token space. Later export runs
    // must reuse the same persisted model or their shards aren't
    // comparable (and a stale-format model refuses loudly).
    graft.operators.Bpe.save(spark, s"$work/bpe",
      graft.operators.Bpe.train(raw, "text", numMerges = 48))
    val bpe = graft.operators.Bpe.load(spark, s"$work/bpe")
    val docTok = graft.operators.Bpe.encode(raw, "doc_id", "text", bpe)
    val bpeOov = docTok.agg(coalesce(sum("n_oov"), lit(0L))).head.getLong(0)
    val docs = raw.join(docTok.withColumnRenamed("n_tokens", "n_tok")
      .select("doc_id", "ids", "n_tok"), "doc_id")

    // 1. epoch plan: src0 over-budget (caps at 2 epochs), src1 one full
    // pass + a hash-drawn partial, src2 partial only, everything else 0.
    // Budgets derive from each source's SUBWORD total so the three
    // regimes hold regardless of the tokenizer's fertility (BPE counts
    // run higher than whitespace counts)
    val srcTotals = docs.groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map(
      "src0" -> srcTotals("src0") * 3,       // cap regime
      "src1" -> srcTotals("src1") * 3 / 2,   // full pass + partial draw
      "src2" -> srcTotals("src2") / 3)       // partial only
    val plan = Mixing.epochPlan(docs, "doc_id", "source", "n_tok",
      budgets, maxEpochs = 2)
    val byRegime = plan.groupBy("source", "epochs").count()
      .orderBy("source", "epochs")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .filter(r => Set("src0", "src1", "src2").contains(r._1))
    println("epoch plan (source, epochs, docs): " +
      byRegime.map { case (s, e, c) => s"$s/$e:$c" }.mkString(" "))

    // 2. materialize the sample stream: one row per (doc, epoch), with a
    // unique numeric sample id so packing's prefix sum has a total order
    val stream = plan.filter(col("epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs").cast("long"))))
      .withColumn("sample_id", col("doc_id") * 10L + col("epoch"))
      .join(docs.select("doc_id", "ids"), "doc_id")
      .select(col("sample_id"), col("ids"),
        size(col("ids")).cast("long").as("n_tokens"))
    val streamTokens = stream.agg(sum("n_tokens")).head().getLong(0)
    val streamDocs = stream.count()

    // 3. pack into fixed 256-SUBWORD sequences — the pack boundaries cut
    // where the BPE ids actually are, via the count-based entry point
    val budget = 256
    val packs = Packing.packAssignmentsByCount(stream, "sample_id",
      "n_tokens", budget).cache()
    val segTokens = packs
      .agg(sum(col("tok_end") - col("tok_start"))).head().getLong(0)
    val perPack = packs.groupBy("pack_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("t"))
    val nPacks = perPack.count()
    val fullPacks = perPack.filter(col("t") === budget).count()
    println(s"stream: $streamDocs samples, $streamTokens tokens -> " +
      s"$nPacks packs of $budget ($fullPacks exactly full)")

    // 3b. pack PAYLOADS: the actual subword-id sequences a data loader
    // consumes — slice each sample's BPE ids to its pack segment and
    // concatenate segments in stream order within the pack. The ids
    // were computed ONCE under the persisted model; packing and
    // payloads cannot disagree about where a token is.
    val sampleIds = stream.select("sample_id", "ids")
    val payload = packs
      .join(sampleIds, packs("doc_id") === sampleIds("sample_id"))
      .select(col("pack_id"), col("sample_id"),
        slice(col("ids"), col("tok_start").cast("int") + 1,
          (col("tok_end") - col("tok_start")).cast("int")).as("seg"))
      .groupBy("pack_id")
      .agg(flatten(transform(array_sort(
        collect_list(struct(col("sample_id"), col("seg")))),
        s => s.getField("seg"))).as("ids"))
    val paySizes = payload.select(col("pack_id"), size(col("ids")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val payTotal = paySizes.map(_._2.toLong).sum
    val payFullOk = paySizes.dropRight(1).forall(_._2 == budget)
    println(s"pack payloads: ${paySizes.length} packs, $payTotal subword ids " +
      s"under the persisted ${bpe.merges.size}-merge BPE model " +
      s"(all-but-last exactly $budget: $payFullOk; oov=$bpeOov)")

    // 4. deterministic shuffle of pack ids into 4 shards + sorted write
    val packIds = perPack.select(col("pack_id"))
    val outDir = s"$work/shards"
    Mixing.writeShards(packIds, "pack_id", outDir, numShards = 4)
    val assign = Mixing.globalShuffle(packIds, "pack_id", numShards = 4)
    val shardSizes = assign.groupBy("shard").count().orderBy("shard")
      .collect().map(r => r.getLong(1))
    println(s"shards: ${shardSizes.mkString("/")} packs per shard")

    // 5. invariants
    def shardContents(dir: String): Seq[Seq[Long]] =
      (0 until 4).map { s =>
        spark.read.parquet(s"$dir/shard=$s")
          .select("pack_id", "skey").collect()
          .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
      }
    val got = shardContents(outDir)
    val want = assign.collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val orderOk = (0 until 4).forall(s => got(s) == want(s))
    // end-to-end determinism: re-export and compare directories
    val outDir2 = s"$work/shards_rerun"
    Mixing.writeShards(packIds, "pack_id", outDir2, numShards = 4)
    val rerunOk = shardContents(outDir2) == got

    // 6. crash-resumable export: the manifest-committed variant resumes
    // a lost shard without touching finished ones and lands on the
    // identical content (determinism makes the partial rewrite safe)
    val outDir3 = s"$work/shards_resumable"
    val (w1, k1) = Mixing.writeShardsResumable(packIds, "pack_id", outDir3, 4)
    val fsR = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fsR.delete(new org.apache.hadoop.fs.Path(s"$outDir3/_manifest/1.json"), false)
    fsR.delete(new org.apache.hadoop.fs.Path(s"$outDir3/shard=1"), true)
    val (w2, k2) = Mixing.writeShardsResumable(packIds, "pack_id", outDir3, 4)
    val resumeOk = (w1, k1) == ((4, 0)) && (w2, k2) == ((1, 3)) &&
      shardContents(outDir3) == got
    println(s"resumable export: full=($w1 written) crash-resume=" +
      s"($w2 written, $k2 skipped), content identical=$resumeOk")

    // 7. the SFT branch: the SAME persisted tokenizer serves the chat
    // side. Conversations derive from the curated docs, dedup on the
    // assistant side, take per-turn subword counts under the persisted
    // model, and pack with their loss masks carried through — the
    // trainable-token total must survive packing exactly.
    import graft.operators.Sft
    val turns = raw.select(expr("doc_id div 4").as("conv_id"),
      (col("doc_id") % 4).as("turn_idx"),
      when(col("doc_id") % 2 === 0, "user").otherwise("assistant").as("role"),
      col("text").as("content"))
    val nConvs = turns.select("conv_id").distinct().count()
    val keepTbl = Sft.assistantDedup(turns, "conv_id", "turn_idx", "role",
      "content")
    val kept = turns.join(keepTbl.filter(col("keep")).select("conv_id"),
      "conv_id")
    val nKept = kept.select("conv_id").distinct().count()
    val rendered = Sft.renderChatML(kept, "conv_id", "turn_idx", "role",
      "content")
    val nAssist = rendered.agg(sum("n_assistant")).head.getLong(0)
    val keyed = kept.withColumn("__rid",
      concat_ws("#", col("conv_id"), col("turn_idx")))
    val turnEnc = graft.operators.Bpe.encode(keyed, "__rid", "content", bpe)
      .select("__rid", "n_tokens")
    val spans = Sft.turnSpansByCount(keyed.join(turnEnc, "__rid"),
      "conv_id", "turn_idx", "role", "n_tokens")
    val sftSegs = Sft.maskedPackSegments(spans, budget)
    val sftTotal = spans.agg(sum(col("tok_end") - col("tok_start")))
      .head.getLong(0)
    val sftPacked = sftSegs.agg(sum(col("seg_end") - col("seg_start")))
      .head.getLong(0)
    val trainIn = spans.filter(col("trainable"))
      .agg(sum(col("tok_end") - col("tok_start"))).head.getLong(0)
    val trainOut = sftSegs.filter(col("trainable"))
      .agg(sum(col("seg_end") - col("seg_start"))).head.getLong(0)
    val sftPacks = sftSegs.select("pack_id").distinct().count()
    println(s"sft branch: $nConvs convs -> $nKept after assistant dedup, " +
      s"$nAssist assistant turns; $sftTotal subword tokens -> $sftPacks " +
      s"packs of $budget; trainable $trainIn in == $trainOut out")
    val sftOk = sftTotal == sftPacked && trainIn == trainOut &&
      trainIn > 0 && nKept <= nConvs

    val ok = sftOk &&                              // SFT mask conservation
      streamTokens == segTokens &&                 // token conservation
      bpeOov == 0L &&                              // base alphabet covers corpus
      resumeOk &&                                  // crash-resume exactness
      fullPacks >= nPacks - 1 &&                   // exact budgets
      payTotal == streamTokens && payFullOk &&     // id payloads conserve too
      byRegime.exists(r => r._1 == "src0" && r._2 == 2) &&  // cap regime
      byRegime.exists(r => r._1 == "src2" && r._2 == 1) &&  // partial draw
      shardSizes.sum == nPacks && shardSizes.forall(_ > 0) &&
      orderOk && rerunOk
    println(s"token conservation: $streamTokens == $segTokens; " +
      s"shard order ok=$orderOk; deterministic re-export=$rerunOk")
    println(s"training export check: ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

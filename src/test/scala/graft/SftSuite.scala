package graft

import graft.operators.{Bpe, Packing, Sft}
import org.apache.spark.sql.functions._

/** The SFT/chat-data family: template rendering, loss-mask spans,
  * mask-preserving packing, assistant-side dedup, and sliding-window
  * chunking. Pins the conservation laws (masks partition the token
  * stream; packs partition the mask segments; chunks cover every
  * token) and the composition with the BPE id space. */
class SftSuite extends SparkSpec {
  import spark.implicits._

  private def turns() = Seq(
    // conv 0: user/assistant/user/assistant
    (0L, 0L, "user", "hello there"),
    (0L, 1L, "assistant", "hi how can i help"),
    (0L, 2L, "user", "tell me a fact"),
    (0L, 3L, "assistant", "water is wet"),
    // conv 1: system turn + pair
    (1L, 0L, "system", "be terse"),
    (1L, 1L, "user", "sum of two and two"),
    (1L, 2L, "assistant", "four"),
    // conv 2: same assistant answers as conv 0, different user phrasing
    (2L, 0L, "user", "yo"),
    (2L, 1L, "assistant", "hi how can i help"),
    (2L, 2L, "user", "give me trivia"),
    (2L, 3L, "assistant", "water is wet"),
    // conv 3: no assistant turn at all
    (3L, 0L, "user", "anyone here")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("renderChatML serializes turns in index order under the template") {
    val r = Sft.renderChatML(turns(), "conv_id", "turn_idx", "role", "content")
      .orderBy("conv_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r(0) === ((0L,
      "<|user|>hello there<|end|><|assistant|>hi how can i help<|end|>" +
        "<|user|>tell me a fact<|end|><|assistant|>water is wet<|end|>",
      4L, 2L)))
    assert(r(1) === ((1L,
      "<|system|>be terse<|end|><|user|>sum of two and two<|end|>" +
        "<|assistant|>four<|end|>", 3L, 1L)))
    assert(r(3) === ((3L, "<|user|>anyone here<|end|>", 1L, 0L)))
  }

  test("renderChatML is insensitive to input row order and partitioning") {
    val base = Sft.renderChatML(turns(), "conv_id", "turn_idx", "role",
      "content").orderBy("conv_id").collect().toSeq
    val shuffled = Sft.renderChatML(
      turns().orderBy(col("content")).repartition(7), "conv_id",
      "turn_idx", "role", "content").orderBy("conv_id").collect().toSeq
    assert(base === shuffled)
  }

  test("turnSpansByCount: spans tile the conversation stream exactly") {
    val withN = turns().withColumn("n", size(split(col("content"), " ")))
    val spans = Sft.turnSpansByCount(withN, "conv_id", "turn_idx", "role", "n")
    // conv 0 counts: 2, 5, 4, 3 -> spans [0,2) [2,7) [7,11) [11,14)
    val c0 = spans.filter(col("conv_id") === 0).orderBy("turn_idx").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(c0 === Array((0L, 2L, false), (2L, 7L, true), (7L, 11L, false),
      (11L, 14L, true)))
    // tiling law on every conversation: sorted spans are gapless from 0
    val bad = spans.withColumn("prev_end", lag("tok_end", 1, 0L)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("conv_id").orderBy("turn_idx")))
      .filter(col("tok_start") =!= col("prev_end")).count()
    assert(bad === 0L)
  }

  test("turnSpansByCount composes with the BPE id space") {
    val model = Bpe.train(Seq("hi hi ho").toDF("text"), "text", numMerges = 1)
    // conservation: the conversation total equals the sum of its turns'
    // subword counts when spans are cut by those counts
    val turnsN = turns().withColumn("__rid", concat_ws("#",
        col("conv_id"), col("turn_idx")))
    val encN = Bpe.encode(turnsN, "__rid", "content", model)
      .select(col("__rid"), col("n_tokens"))
    val spans = Sft.turnSpansByCount(
      turnsN.join(encN, "__rid"), "conv_id", "turn_idx", "role", "n_tokens")
    val convTotal = spans.groupBy("conv_id").agg(max("tok_end").as("t"))
    val direct = turnsN.join(encN, "__rid").groupBy("conv_id")
      .agg(sum("n_tokens").as("t2"))
    assert(convTotal.join(direct, "conv_id")
      .filter(col("t") =!= col("t2")).count() === 0L)
  }

  test("maskedPackSegments: packs tile, masks preserve, trainable conserved") {
    val withN = turns().withColumn("n", size(split(col("content"), " ")))
    val spans = Sft.turnSpansByCount(withN, "conv_id", "turn_idx", "role", "n")
    val segs = Sft.maskedPackSegments(spans, budget = 6)
    // total tokens across all conversations
    val total = spans.agg(sum(col("tok_end") - col("tok_start"))).head.getLong(0)
    val packed = segs.agg(sum(col("seg_end") - col("seg_start"))).head.getLong(0)
    assert(packed === total, "pack segments must cover every token once")
    // every pack holds exactly budget tokens except the last
    val perPack = segs.groupBy("pack_id")
      .agg(sum(col("seg_end") - col("seg_start")).as("n"))
      .orderBy("pack_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lastPack = perPack.map(_._1).max
    perPack.foreach { case (p, n) =>
      if (p != lastPack) assert(n === 6L, s"pack $p holds $n != budget")
    }
    // trainable-token conservation: assistant tokens in == out
    val aIn = spans.filter(col("trainable"))
      .agg(sum(col("tok_end") - col("tok_start"))).head.getLong(0)
    val aOut = segs.filter(col("trainable"))
      .agg(sum(col("seg_end") - col("seg_start"))).head.getLong(0)
    assert(aIn === aOut)
    // segments stay within their turn's span and their pack's window
    val viol = segs.join(spans, Seq("conv_id", "turn_idx"))
      .filter(col("seg_start") < col("tok_start") ||
        col("seg_end") > col("tok_end")).count()
    assert(viol === 0L)
  }

  test("assistantDedup collapses duplicate answer sets, keeps first") {
    val r = Sft.assistantDedup(turns(), "conv_id", "turn_idx", "role",
      "content").orderBy("conv_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(2)))
    // conv 2's assistant side duplicates conv 0's -> conv 0 kept, 2 dropped
    assert(r === Array((0L, true), (1L, true), (2L, false), (3L, true)))
    // and the duplicate pair shares a fingerprint
    val fps = Sft.assistantDedup(turns(), "conv_id", "turn_idx", "role",
      "content").select("conv_id", "fp").collect()
      .map(x => (x.getLong(0), x.getString(1))).toMap
    assert(fps(0L) === fps(2L))
    assert(fps(0L) !== fps(1L))
  }

  test("chunkWindows: fixed windows, right-aligned tail, full coverage") {
    val df = Seq((1L, 10L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))
      .toDF("doc_id", "n")
    val r = Sft.chunkWindows(df, "doc_id", "n", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r === Array(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 7L), (1L, 2L, 6L, 10L),
      (2L, 0L, 0L, 3L),
      (3L, 0L, 0L, 4L),
      (4L, 0L, 0L, 4L), (4L, 1L, 1L, 5L)))
    // law: every token of every doc is covered by >= 1 chunk, and every
    // chunk is exactly `window` long unless the doc is shorter
    r.groupBy(_._1).foreach { case (_, cs) =>
      val n = cs.map(_._4).max
      assert(cs.head._3 === 0L && cs.last._4 === n)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 <= a._4, "gap between chunks")
        case _ =>
      }
      cs.foreach(c => assert(c._4 - c._3 === math.min(4L, n)))
    }
  }

  test("chunkText materializes the exact token slices") {
    val df = Seq((7L, "a b c d e f g")).toDF("doc_id", "text")
    val r = Sft.chunkText(df, "doc_id", "text", window = 3, stride = 2)
      .orderBy("chunk_id").collect()
      .map(x => (x.getLong(1), x.getString(4)))
    assert(r === Array((0L, "a b c"), (1L, "c d e"), (2L, "e f g")))
  }

  test("maskedPackWhole: one pack per conversation, spans ride unchanged") {
    val withN = turns().withColumn("n", size(split(col("content"), " ")))
    val spans = Sft.turnSpansByCount(withN, "conv_id", "turn_idx", "role", "n")
    // conv totals: c0=14, c1=8, c2=12, c3=2; budget 20 next-fit in id
    // order -> pack0: c0 (14; +8 overflows), pack1: c1+c2 (20), pack2: c3
    val segs = Sft.maskedPackWhole(spans, budget = 20, buckets = 1)
    val byConv = segs.select("conv_id", "pack_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(byConv === Array((0L, 0L), (1L, 1L), (2L, 1L), (3L, 2L)),
      s"got ${byConv.toSeq}")
    // segments ARE the spans (no straddling, no clipping)
    val roundTrip = segs.select(col("conv_id"), col("turn_idx"), col("role"),
        col("seg_start").as("tok_start"), col("seg_end").as("tok_end"),
        col("trainable"))
    assert(roundTrip.exceptAll(spans).count() === 0L)
    assert(spans.exceptAll(roundTrip).count() === 0L)
    // no pack over budget
    val fills = segs.groupBy("pack_id")
      .agg(sum(col("seg_end") - col("seg_start")).as("f")).collect()
    assert(fills.forall(_.getLong(1) <= 20L))
  }

  test("preferenceAudit flags degenerate pairs, prompt dups, length bias") {
    val pairs = Seq(
      (0L, "q 0", "a b c", "a b"),          // chosen longer
      (1L, "q 1", "x", "y z w"),            // rejected longer
      (2L, "q 0", "m n", "m n"),            // degenerate + dup prompt
      (3L, "q 2", "p q r s", "t")           // chosen longer
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val a = Sft.preferenceAudit(pairs, "pair_id", "prompt", "chosen",
        "rejected").orderBy("pair_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(a === Array(
      (0L, 3L, 2L, 1L, false, true, false),
      (1L, 1L, 3L, -2L, false, false, false),
      (2L, 2L, 2L, 0L, true, false, true),
      (3L, 4L, 1L, 3L, false, true, false)))
    val rep = Sft.preferenceReport(pairs, "pair_id", "prompt", "chosen",
      "rejected").collect()(0)
    assert(rep.getLong(0) === 4L)        // n_pairs
    assert(rep.getLong(1) === 1L)        // n_degenerate
    assert(rep.getLong(2) === 1L)        // n_prompt_dup
    assert(rep.getDouble(3) === 0.5)     // chosen_longer_frac
    assert(rep.getDouble(4) === 0.5)     // mean_len_gap (1-2+0+3)/4
  }

  test("splitConversations: turn-boundary next-fit, oversize turns kept whole") {
    val t = Seq(
      (0L, 0L, 50L), (0L, 1L, 80L), (0L, 2L, 30L), (0L, 3L, 70L),
      (1L, 0L, 150L),                    // single turn over budget
      (2L, 0L, 10L), (2L, 1L, 20L)       // fits in one sub
    ).toDF("conv_id", "turn_idx", "n")
    val r = Sft.splitConversations(t, "conv_id", "turn_idx", "n",
        budget = 100)
      .orderBy("conv_id", "turn_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r === Array(
      (0L, 0L, 0L), (0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 2L),
      (1L, 0L, 0L),
      (2L, 0L, 0L), (2L, 1L, 0L)))
  }

  test("splitConversations closes packWholeDocs' oversize rejection") {
    // a conversation over the pack budget splits into subs that the
    // whole-doc packer then accepts — the composition the operator
    // exists for (given no single turn exceeds the budget)
    val withN = turns().withColumn("n", size(split(col("content"), " ")))
    val subs = Sft.splitConversations(withN, "conv_id", "turn_idx", "n",
      budget = 8)
    val keyed = withN.join(subs, Seq("conv_id", "turn_idx"))
      .withColumn("sub_conv", col("conv_id") * 100 + col("sub_id"))
    val spans = Sft.turnSpansByCount(keyed, "sub_conv", "turn_idx",
      "role", "n")
    // every sub fits the budget (max turn count here is 5 <= 8)
    val tooBig = spans.groupBy("conv_id").agg(max("tok_end").as("t"))
      .filter(col("t") > 8).count()
    assert(tooBig === 0L)
    // and the whole-doc packer runs without rejecting
    val segs = Sft.maskedPackWhole(spans, budget = 8, buckets = 1)
    val total = withN.agg(sum("n")).head.getLong(0)
    val packed = segs.agg(sum(col("seg_end") - col("seg_start")))
      .head.getLong(0)
    assert(packed === total)
  }

  test("preferenceMargin scores both sides, flags inverted pairs") {
    import graft.operators.QualityClf
    val model = QualityClf.Model(Array.fill(8)(1L), 0L)
    // all-ones weights + zero bias => score == feature count
    val pairs = Seq(
      (0L, "a b", "c"),     // 3 features vs 1 -> margin 2
      (1L, "x", "y z"),     // 1 vs 3 -> margin -2, inverted
      (2L, "m n", "m n")    // degenerate -> margin 0
    ).toDF("pair_id", "chosen", "rejected")
    val r = Sft.preferenceMargin(pairs, "pair_id", "chosen", "rejected",
        model)
      .orderBy("pair_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    assert(r === Array(
      (0L, 3L, 1L, 2L, false),
      (1L, 1L, 3L, -2L, true),
      (2L, 3L, 3L, 0L, false)))
  }

  test("assistantDedupAgainstHistory drops seen answer sets, keeps novel") {
    val hist = Sft.assistantFingerprints(
      turns().filter(col("conv_id") === 0), "conv_id", "turn_idx", "role",
      "content")
    val r = Sft.assistantDedupAgainstHistory(
        turns().filter(col("conv_id") =!= 0), "conv_id", "turn_idx",
        "role", "content", hist)
      .orderBy("conv_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(2)))
    // conv 2 duplicates conv 0's (now-historical) answer set -> dropped
    // even though it is first IN BATCH; conv 1 and 3 are novel
    assert(r === Array((1L, true), (2L, false), (3L, true)))
  }

  test("assistantDedupAgainstHistoryTable enforces the format marker") {
    import graft.state.{HistoryFormat, HistoryTables}
    withTmpDir { tmp =>
      val dir = s"$tmp/sft_fp"
      Sft.assistantFingerprints(turns().filter(col("conv_id") === 0),
        "conv_id", "turn_idx", "role", "content")
        .write.parquet(dir)
      // data without a marker = legacy unverifiable index -> refuses
      val e = intercept[IllegalStateException] {
        Sft.assistantDedupAgainstHistoryTable(
          turns().filter(col("conv_id") =!= 0), "conv_id", "turn_idx",
          "role", "content", dir).collect()
      }
      assert(e.getMessage.contains("sft-assistant-fp") ||
        e.getMessage.contains("marker"))
      // stamped -> probes fine and matches the DataFrame overload
      HistoryFormat.stamp(spark.sparkContext.hadoopConfiguration, dir,
        HistoryFormat.SftAssistantFp)
      val viaTable = Sft.assistantDedupAgainstHistoryTable(
          turns().filter(col("conv_id") =!= 0), "conv_id", "turn_idx",
          "role", "content", dir)
        .orderBy("conv_id").collect().map(x => (x.getLong(0), x.getBoolean(2)))
      assert(viaTable === Array((1L, true), (2L, false), (3L, true)))
    }
  }

  test("promptDedupAgainstHistory: in-batch keep-first AND history drop") {
    val hist = Sft.promptFingerprints(
      Seq((100L, "q seen")).toDF("pair_id", "prompt"), "pair_id", "prompt")
    val batch = Seq((1L, "q novel"), (2L, "q novel"), (3L, "q seen"))
      .toDF("pair_id", "prompt")
    val r = Sft.promptDedupAgainstHistory(batch, "pair_id", "prompt", hist)
      .orderBy("pair_id").collect()
      .map(x => (x.getLong(0), x.getBoolean(2)))
    // 1 keeps (first of the novel class), 2 drops (in-batch dup),
    // 3 drops (history hit drops the WHOLE class, first or not)
    assert(r === Array((1L, true), (2L, false), (3L, false)))
  }

  test("maskedPackSegments composes with BPE counts end to end") {
    // the real export path: per-turn BPE counts -> spans -> packs; the
    // pack totals must equal the corpus's subword total exactly
    val model = Bpe.train(turns().select("content"), "content", numMerges = 3)
    val keyed = turns().withColumn("__rid",
      concat_ws("#", col("conv_id"), col("turn_idx")))
    val enc = Bpe.encode(keyed, "__rid", "content", model)
      .select("__rid", "n_tokens")
    val spans = Sft.turnSpansByCount(keyed.join(enc, "__rid"),
      "conv_id", "turn_idx", "role", "n_tokens")
    val segs = Sft.maskedPackSegments(spans, budget = 8)
    val corpusTotal = enc.agg(sum("n_tokens")).head.getLong(0)
    val packTotal = segs.agg(sum(col("seg_end") - col("seg_start")))
      .head.getLong(0)
    assert(packTotal === corpusTotal)
  }
}

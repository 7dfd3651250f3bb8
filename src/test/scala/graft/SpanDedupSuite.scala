package graft

import graft.core.WriterError
import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.operators.SpanDedup
import graft.sources._
import org.apache.spark.sql.functions._

class SpanDedupSuite extends SparkSpec {
  import spark.implicits._

  private def toks(s: Char*) = s.map(_.toString).mkString(" ")

  test("duplicated runs mark everywhere but the first occurrence") {
    // doc 1 tokens a..j (10) then k..t; doc 2 repeats a..j verbatim at
    // offset 3; doc 3 shares nothing
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " " + toks('k' to 't': _*)),
      (2L, toks('x', 'y', 'z') + " " + a2j + " q r s"),
      (3L, toks('0' to '9': _*))).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only doc 2's copy is marked: the single shared 10-gram sits at
    // token index 3, covering [3, 13)
    assert(got.toSeq === Seq((2L, 3L, 13L)))
  }

  test("overlapping and adjacent gram marks merge into one maximal span") {
    // doc 2 copies doc 1's first 14 tokens: marks at pos 0..4 (five
    // 10-grams) must merge into [0, 14), not five rows
    val first14 = toks('a' to 'n': _*)
    val df = Seq(
      (1L, first14 + " " + toks('p' to 'y': _*)),
      (2L, first14 + " " + toks('A' to 'J': _*))).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 0L, 14L)))
  }

  test("distinct duplicated regions separated by novel text stay two spans") {
    val runA = toks('a' to 'j': _*)
    val runB = toks('p' to 'y': _*)
    val df = Seq(
      (1L, runA + " 1 2 3 " + runB),
      // same two runs, but separated by DIFFERENT novel tokens so the
      // marks cannot chain across
      (2L, runA + " 7 8 9 " + runB)).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 0L, 10L), (2L, 13L, 23L)))
  }

  test("docs shorter than n produce no grams and no spans") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    assert(SpanDedup.spans(df, "doc_id", "text", n = 10).count() === 0L)
  }

  test("a gram planted in every doc completes and keeps one canonical copy") {
    // the hot-gram shape: one identical 10-token run in all 400 docs —
    // the owners aggregation must collapse it map-side (plan gate in
    // PlanSuite) and exactly 399 docs get marked
    val hot = toks('a' to 'j': _*)
    val df = (0 until 400)
      .map(i => (i.toLong, s"u$i v$i w$i $hot x$i y$i"))
      .toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
    assert(got.count() === 399L)
    assert(got.agg(min("doc_id")).head().getLong(0) === 1L)
    assert(got.select("span_start", "span_end").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 13L)))
  }

  test("struct-owner fallback matches the packed-owner default; out-of-range ids fail loudly") {
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " " + toks('k' to 't': _*)),
      (2L, toks('x', 'y', 'z') + " " + a2j + " q r s"),
      (3L, a2j + " novel tail here")).toDF("doc_id", "text")
    def rows(packed: Boolean) =
      SpanDedup.spans(df, "doc_id", "text", n = 10, packedOwners = packed)
        .orderBy("doc_id", "span_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(packed = true) === rows(packed = false))
    // a doc_id beyond 31 bits must error NAMING the fallback, never
    // silently mis-order the canonical-owner selection
    val big = Seq((1L << 40, a2j), (2L, a2j)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SpanDedup.spans(big, "doc_id", "text", n = 10).collect()
    }
    assert(e.getMessage.contains("packedOwners"),
      s"expected the packed-owner guard message, got: ${e.getMessage}")
    // the fallback handles the same ids exactly
    val got = SpanDedup.spans(big, "doc_id", "text", n = 10,
      packedOwners = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(((1L << 40), 0L, 10L)))
  }

  test("newline delimiter gives line-level spans (the C4 line-dedup mode)") {
    val boiler = (1 to 3).map(i => s"boilerplate line $i").mkString("\n")
    val df = Seq(
      (1L, boiler + "\nunique footer one"),
      (2L, boiler + "\nunique footer two")).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 3, delim = "\n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 3-line boilerplate block recurs: doc 2's copy is one [0,3) span
    assert(got.toSeq === Seq((2L, 0L, 3L)))
    val cleaned = SpanDedup.clean(df, "doc_id", "text", n = 3, delim = "\n")
      .orderBy("doc_id").collect()
    assert(cleaned(1).getAs[String]("clean_text") === "unique footer two")
  }

  test("spansWithHistory: history owner wins; in-batch dups still caught") {
    val run = toks('a' to 'l': _*) // 12 tokens = one 12-gram per copy
    // history from a PRIOR batch: doc 10 owns the run
    val hist = SpanDedup.ownerIndex(
      Seq((10L, run)).toDF("doc_id", "text"), "doc_id", "text", n = 12)
    // current batch: doc 5 repeats the run (SMALLER id than the
    // historical owner — first-seen must still win), docs 6+7 share an
    // in-batch-only run, doc 8 is novel
    val other = toks('A' to 'L': _*)
    val batch = Seq(
      (5L, "p q r " + run),
      (6L, other),
      (7L, "x y " + other),
      (8L, toks('0' to '9': _*) + " zz yy")).toDF("doc_id", "text")
    val got = SpanDedup.spansWithHistory(batch, hist, "doc_id", "text", n = 12)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 5: historical dup at [3,15); doc 7: in-batch dup (doc 6 owns,
    // smaller id) at [2,14); docs 6 and 8 clean
    assert(got.toSeq === Seq((5L, 3L, 15L), (7L, 2L, 14L)))
  }

  test("cross-batch incremental span dedup is exactly-once under an injected crash") {
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      val curated = s"$tmp/curated"; val histT = s"$tmp/gram_history"
      val run = toks('a' to 'l': _*) // the duplicated 12-token run
      def stage(name: String, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/.stage")
        val part = new java.io.File(s"$tmp/.stage").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(in, name))
      }
      val crash = new java.util.concurrent.atomic.AtomicBoolean(false)
      def mk(): Pipeline = {
        val ckpt = new FileStreamCheckpoint(cp, conf)
        val source = new FileSource(in, ckpt, "parquet",
          FileSourceOptions(pattern = "*.parquet", maxFilesPerTrigger = Some(1)))
        new Pipeline(
          source = source,
          reader = ctx => ctx.spark.read.parquet(ctx.files: _*),
          transform = None,
          writer = (df, ctx) => {
            val w = new DeltaWriter(spark, conf)
            val appId = "span-hist"
            val hist =
              if (w.tableExists(histT)) w.read(histT)
              else Seq.empty[(Long, Long, Long, Long)]
                .toDF("h1", "h2", "own", "occ")
            val sp = SpanDedup.spansWithHistory(
              df, hist, "doc_id", "text", n = 12)
            val cleaned = SpanDedup.applySpans(df, sp, "doc_id", "text")
            // dual SetTransaction-guarded commits, curated FIRST: a crash
            // between them replays with the history exactly as this
            // attempt saw it, so the recomputed spans are identical
            if (!w.lastTxnVersion(curated, appId).exists(_ >= ctx.batchId))
              w.write(cleaned, curated, DeltaWriteMode.Append,
                txn = Some((appId, ctx.batchId)))
            if (crash.getAndSet(false)) sys.error("crash between commits")
            if (!w.lastTxnVersion(histT, appId).exists(_ >= ctx.batchId))
              w.write(SpanDedup.ownerIndex(df, "doc_id", "text", n = 12),
                histT, DeltaWriteMode.Append, txn = Some((appId, ctx.batchId)))
            Map("rows" -> cleaned.count().toString)
          },
          spark = spark)
      }
      // batch 0: doc 10 carries the canonical run; doc 11 is novel
      stage("b0.parquet", Seq((10L, run), (11L, toks('m' to 'x': _*))))
      // batch 1: doc 5 repeats the run ACROSS batches (smaller id than
      // the owner — history must still win); doc 6 novel
      stage("b1.parquet", Seq(
        (5L, "p q r " + run), (6L, toks('A' to 'N': _*))))
      val r1 = mk().run(RunOptions(once = false, sleepMs = 0))
      assert(r1.batchesProcessed === 2)
      val w = new DeltaWriter(spark, conf)
      val byId = w.read(curated).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
        .toMap
      assert(byId(10L) === (run, 0L), "canonical first-batch copy untouched")
      assert(byId(5L) === ("p q r", 12L),
        "later-batch duplicate must excise against history")
      assert(byId(6L)._2 === 0L && byId(11L)._2 === 0L)
      // batch 2 arrives and the writer CRASHES between the two commits
      stage("b2.parquet", Seq((7L, "z z2 " + run), (8L, toks('0' to '9': _*) + " q8 q9")))
      crash.set(true)
      intercept[WriterError](mk().runOnce())
      // curated landed, history did not — recovery completes exactly-once
      assert(w.read(curated).filter(col("doc_id") === 7L).count() === 1)
      assert(w.lastTxnVersion(histT, "span-hist") === Some(1L))
      val r2 = mk().run(RunOptions(once = false, sleepMs = 0))
      assert(r2.batchesProcessed === 1) // the WAL replays the crashed batch
      val after = w.read(curated).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed")))
      assert(after.count(_._1 == 7L) === 1, "replay must not duplicate doc 7")
      assert(after.toMap.apply(7L) === ("z z2", 12L),
        "crashed batch's duplicate still excised on recovery")
      // the run's gram appears in history exactly three times (one owner
      // row per batch), never double-counted by the replay
      val runKey = SpanDedup.ownerIndex(
        Seq((0L, run)).toDF("doc_id", "text"), "doc_id", "text", n = 12)
        .select("h1", "h2").head()
      val occSum = w.read(histT)
        .filter(col("h1") === runKey.getLong(0) &&
          col("h2") === runKey.getLong(1))
        .agg(sum("occ")).head().getLong(0)
      assert(occSum === 3L,
        s"history must hold exactly one occurrence per batch, got $occSum")
      // history stores each batch's LOCAL owner (first-seen-wins is the
      // MERGE rule in spansWithHistory, not a storage property): one row
      // per batch with that batch's minimal packed (doc_id, pos)
      val owns = w.read(histT)
        .filter(col("h1") === runKey.getLong(0) &&
          col("h2") === runKey.getLong(1))
        .select("own").collect().map(_.getLong(0)).sorted.toSeq
      assert(owns === Seq((5L << 32) + 3L, (7L << 32) + 2L, 10L << 32),
        s"per-batch local owners expected, got $owns")
    }
  }

  test("compactIndex: one row per gram, occ saturates at 2, spansWithHistory identical") {
    val run = toks('a' to 'l': _*)
    val other = toks('A' to 'L': _*)
    // three overlapping "batches": the hot run appears in every one, so
    // the raw accumulated history holds three rows for its gram
    val batches = Seq(
      Seq((10L, run), (11L, "n1 " + other)),
      Seq((20L, "p q " + run), (21L, toks('m' to 'x': _*))),
      Seq((30L, run + " tail30"), (31L, "z9 " + other)))
    val raw = batches.map(b =>
      SpanDedup.ownerIndex(b.toDF("doc_id", "text"), "doc_id", "text",
        n = 12)).reduce(_ unionByName _)
    val compacted = SpanDedup.compactIndex(raw)
    // ROW BOUND: compacted row count == distinct grams, not sum of
    // per-batch rows (the raw table has duplicates for run and other)
    val distinctGrams = raw.select("h1", "h2").distinct().count()
    assert(raw.count() > distinctGrams, "fixture must have overlap")
    assert(compacted.count() === distinctGrams)
    // occ saturates at 2; owner is the global first-seen minimum
    val runKey = SpanDedup.ownerIndex(
      Seq((0L, run)).toDF("doc_id", "text"), "doc_id", "text", n = 12)
      .select("h1", "h2").head()
    val hot = compacted
      .filter(col("h1") === runKey.getLong(0) &&
        col("h2") === runKey.getLong(1)).head()
    assert(hot.getAs[Long]("occ") === 2L)
    assert(hot.getAs[Long]("own") === (10L << 32))
    // EQUIVALENCE: a probe batch resolves identical spans against the
    // compacted history and the raw one — including a single-occurrence
    // history gram completed by the batch (occ 1 + 1 >= 2)
    val probe = Seq(
      (40L, "head " + run),              // hot gram: historical owner wins
      (41L, "x " + toks('m' to 'x': _*)), // gram seen ONCE in history
      (42L, toks('0' to '9': _*) + " aa bb")).toDF("doc_id", "text")
    def resolved(h: org.apache.spark.sql.DataFrame) =
      SpanDedup.spansWithHistory(probe, h, "doc_id", "text", n = 12)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(resolved(compacted) === resolved(raw))
    assert(resolved(compacted) === Seq((40L, 1L, 13L), (41L, 1L, 13L)))
  }

  test("applySpans and the incremental path refuse non-numeric id columns") {
    val a2j = toks('a' to 'j': _*)
    val strIds = Seq(("u-1", a2j), ("u-2", a2j)).toDF("doc_id", "text")
    // applySpans on a string id would cast the join key to null and
    // silently leave every duplicated span UNEXCISED — must fail loudly
    val spansDf = Seq((1L, 0L, 10L)).toDF("doc_id", "span_start", "span_end")
    val e1 = intercept[IllegalArgumentException] {
      SpanDedup.applySpans(strIds, spansDf, "doc_id", "text")
    }
    assert(e1.getMessage.contains("integral (byte/short/int/long) id"))
    val e2 = intercept[IllegalArgumentException] {
      SpanDedup.ownerIndex(strIds, "doc_id", "text", n = 10)
    }
    assert(e2.getMessage.contains("integral (byte/short/int/long) id"))
  }

  test("incremental path's out-of-range id error names the re-key remedy, not a fallback it lacks") {
    val a2j = toks('a' to 'j': _*)
    val big = Seq((1L << 40, a2j), (2L, a2j)).toDF("doc_id", "text")
    // ownerIndex/spansWithHistory hardcode the packed-long history
    // schema; there is no packedOwners=false escape hatch there, so the
    // guard must name the actual contract (re-key into [0, 2^31))
    val e = intercept[Exception] {
      SpanDedup.ownerIndex(big, "doc_id", "text", n = 10).collect()
    }
    assert(e.getMessage.contains("re-key"),
      s"expected the re-key remedy, got: ${e.getMessage}")
    assert(!e.getMessage.contains("packedOwners = false"),
      "must not advertise a fallback the incremental path doesn't have")
  }

  test("clean removes exactly the spanned tokens and keeps other columns") {
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " k l m", "keep1"),
      (2L, "x y z " + a2j + " q", "keep2"),
      (3L, "totally novel text here", "keep3")).toDF("doc_id", "text", "tag")
    val out = SpanDedup.clean(df, "doc_id", "text", n = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("tag")).toSeq ===
      Seq("keep1", "keep2", "keep3"))
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed"))).toMap
    assert(byId(1L) === (a2j + " k l m", 0L)) // canonical copy untouched
    assert(byId(2L) === ("x y z q", 10L))     // duplicated run excised
    assert(byId(3L) === ("totally novel text here", 0L))
    // token-count invariant on every row
    out.foreach { r =>
      val orig = r.getAs[String]("text").split(" ", -1).length
      val clean = r.getAs[String]("clean_text") match {
        case "" => 0
        case s  => s.split(" ", -1).length
      }
      assert(clean === orig - r.getAs[Long]("n_tokens_removed"))
    }
  }

  test("history format marker: fresh stamps, match round-trips, stale or unmarked data refuses") {
    withTmpDir { tmp =>
      import graft.state.HistoryFormat
      val conf = spark.sparkContext.hadoopConfiguration
      val dir = s"$tmp/span_grams"
      // fresh (no data yet): ensure stamps the current version
      HistoryFormat.ensure(conf, dir, HistoryFormat.SpanGramOwner, hasData = false)
      assert(HistoryFormat.read(conf, dir) === Some(("span-gram-owner", 2L)))
      // round trip: a later batch over the stamped table passes
      HistoryFormat.ensure(conf, dir, HistoryFormat.SpanGramOwner, hasData = true)
      // stale format version (the pre-r11 chained-h2 index) refuses
      // loudly, naming the rebuild remedy
      HistoryFormat.stamp(conf, dir,
        HistoryFormat.Format("span-gram-owner", 1, ""))
      val e = intercept[IllegalStateException] {
        HistoryFormat.ensure(conf, dir, HistoryFormat.SpanGramOwner,
          hasData = true)
      }
      assert(e.getMessage.contains("Rebuild required"))
      assert(e.getMessage.contains("ownerIndex"), s"remedy must name the rebuild: ${e.getMessage}")
      // acknowledged rebuild re-stamps and the gate reopens
      HistoryFormat.stamp(conf, dir, HistoryFormat.SpanGramOwner)
      HistoryFormat.ensure(conf, dir, HistoryFormat.SpanGramOwner, hasData = true)
      // legacy: data with NO marker is unverifiable — refuse
      val e2 = intercept[IllegalStateException] {
        HistoryFormat.ensure(conf, s"$tmp/legacy",
          HistoryFormat.SpanGramOwner, hasData = true)
      }
      assert(e2.getMessage.contains("no _graft_history_format.json"))
    }
  }
}

package graft

import graft.operators.{Curation, Dedup, Similarity, SpanDedup}
import graft.state.{HistoryFormat, HistoryTables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operator-enforced HistoryFormat markers: every path-taking history
  * probe (`*Table` overloads) must itself refuse a stale-format or
  * unmarked index — naming the rebuild remedy — instead of silently
  * matching nothing. One case per persisted-history family. */
class HistoryEnforcementSuite extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "a completely different document about spark aggregation plans"))
    .toDF("doc_id", "text")

  private def stampStale(dir: String, name: String): Unit =
    HistoryFormat.stamp(conf, dir, HistoryFormat.Format(name, 999, "x"))

  /** Write a history table, then drive the probe through its three
    * regimes: valid marker → works; stale version → refuses with the
    * remedy; marker deleted under data → legacy refusal. */
  private def checkFamily(dir: String, index: DataFrame,
      fmt: HistoryFormat.Format, remedyFragment: String)(
      probe: String => Long): Unit = {
    index.write.mode("overwrite").parquet(dir)
    HistoryFormat.stamp(conf, dir, fmt)
    assert(probe(dir) >= 0L, "valid marker must probe cleanly")
    stampStale(dir, fmt.name)
    val e = intercept[IllegalStateException](probe(dir))
    assert(e.getMessage.contains("Rebuild required") &&
      e.getMessage.contains(remedyFragment),
      s"stale refusal must name the remedy; got: ${e.getMessage}")
    new java.io.File(s"$dir/_graft_history_format.json").delete()
    val e2 = intercept[IllegalStateException](probe(dir))
    assert(e2.getMessage.contains("no _graft_history_format.json"))
  }

  test("minhash history probe enforces the signature format marker") {
    withTmpDir { tmp =>
      checkFamily(s"$tmp/mh",
        Dedup.minhashIndex(docs, "doc_id", "text"),
        HistoryFormat.MinhashSignature, "Dedup.minhashIndex") { dir =>
        Dedup.minhashAgainstHistoryTable(docs, dir, "doc_id", "text").count()
      }
    }
  }

  test("hash64 history probe enforces the signature format marker") {
    withTmpDir { tmp =>
      val sigs = Dedup.simhashIndex(docs, "doc_id", "text")
      checkFamily(s"$tmp/h64", sigs,
        HistoryFormat.Hash64Signature, "signature index") { dir =>
        Dedup.hash64AgainstHistoryTable(sigs, dir).count()
      }
      // the WIDE probe reads the SAME marker — same history, same
      // format identity, only the probe-time keying differs
      checkFamily(s"$tmp/h64w", sigs,
        HistoryFormat.Hash64Signature, "signature index") { dir =>
        Dedup.hash64AgainstHistoryWideTable(sigs, dir).count()
      }
    }
  }

  test("span gram-owner probe enforces the format marker") {
    withTmpDir { tmp =>
      checkFamily(s"$tmp/span",
        SpanDedup.ownerIndex(docs, "doc_id", "text", n = 4),
        HistoryFormat.SpanGramOwner, "SpanDedup.ownerIndex") { dir =>
        SpanDedup.spansWithHistoryTable(docs, dir, "doc_id", "text", n = 4)
          .count()
      }
    }
  }

  test("line-df history probe enforces the format marker") {
    withTmpDir { tmp =>
      val lined = docs.withColumn("text",
        regexp_replace(col("text"), " over ", "\nover\n"))
      checkFamily(s"$tmp/line",
        Curation.lineIndex(lined, "doc_id", "text"),
        HistoryFormat.LineDf, "Curation.lineIndex") { dir =>
        Curation.dedupLinesAgainstHistoryTable(lined, dir, "doc_id", "text")
          .count()
      }
    }
  }

  test("sem-index probe enforces the cluster-assignment marker") {
    withTmpDir { tmp =>
      val vecs = (0 until 8).map(i =>
        (i.toLong, Array.tabulate(4)(j => (i % 2 * 10 + j).toFloat)))
        .toDF("doc_id", "emb")
      val quant = Similarity.trainIvfCentroids(vecs, "doc_id", "emb",
        nlist = 2)
      checkFamily(s"$tmp/sem",
        Dedup.semDedupIndex(vecs, "doc_id", "emb", quant),
        HistoryFormat.ClusterAssignment, "cluster assignment") { dir =>
        Dedup.semDedupAgainstHistoryTable(vecs, dir, "doc_id", "emb",
          threshold = 0.9, quantizer = quant).count()
      }
    }
  }

  test("PQ code-index probe enforces the pq-codes marker") {
    withTmpDir { tmp =>
      val vecs = (0 until 12).map(i =>
        (i.toLong, Array.tabulate(4)(j => (i * 3 + j * 7 % 5).toFloat)))
        .toDF("vec_id", "emb")
      val quant = Similarity.trainIvfCentroids(vecs, "vec_id", "emb",
        nlist = 2)
      val pq = Similarity.trainPq(vecs, "vec_id", "emb", m = 2, ksub = 4,
        sampleN = 12)
      checkFamily(s"$tmp/pq",
        Similarity.pqIndexBatch(vecs, "vec_id", "emb", pq, quant),
        HistoryFormat.PqCodes, "re-encode the vector history") { dir =>
        Similarity.ivfPqTopKFromIndexTable(vecs.limit(2), dir, vecs,
          "vec_id", "emb", k = 1, pq, nprobe = 2, rerank = 4,
          maxBucket = 0, quantizer = quant).count()
      }
    }
  }

  test("preference-prompt history probe enforces the pref-prompt-fp marker") {
    withTmpDir { tmp =>
      val pairs = Seq((1L, "q one"), (2L, "q two"), (3L, "q one"))
        .toDF("pair_id", "prompt")
      checkFamily(s"$tmp/preffp",
        graft.operators.Sft.promptFingerprints(pairs, "pair_id", "prompt"),
        HistoryFormat.PrefPromptFp, "Sft.promptFingerprints") { dir =>
        graft.operators.Sft.promptDedupAgainstHistoryTable(pairs,
          "pair_id", "prompt", dir).count()
      }
    }
  }

  test("semantic-decon eval index enforces the eval-embedding marker") {
    withTmpDir { tmp =>
      val eval = Seq((10L, Seq(1f, 0f)), (20L, Seq(0f, 1f))).toDF("bid", "v")
        .select(col("bid"), col("v").cast("array<float>").as("v"))
      val batch = Seq((1L, Seq(1f, 0f))).toDF("id", "v")
        .select(col("id"), col("v").cast("array<float>").as("v"))
      checkFamily(s"$tmp/evalidx",
        eval.select(col("bid").as("bench_id"), col("v")),
        HistoryFormat.EvalEmbedding, "re-embed the eval set") { dir =>
        Dedup.semanticContaminationAgainstIndexTable(batch, "id", "v",
          dir, tau = 0.9).count()
      }
    }
  }

  test("BM25 frozen-stats probe enforces the bm25-collection-stats marker") {
    withTmpDir { tmp =>
      checkFamily(s"$tmp/bm25",
        graft.operators.Relevance.bm25CollectionStats(docs, "doc_id", "text"),
        HistoryFormat.Bm25Stats, "Relevance.bm25CollectionStats") { dir =>
        graft.operators.Relevance.bm25UnderStatsTable(docs, "doc_id", "text",
          dir, query = Seq("fox", "spark")).count()
      }
    }
  }

  test("cluster-quota history probe enforces the cluster-quota marker") {
    withTmpDir { tmp =>
      val quant = Array(Array(1f, 0f), Array(0f, 1f))
      val vecs = Seq((1L, Seq(3f, 1f)), (2L, Seq(1f, 4f)), (3L, Seq(5f, 0f)))
        .toDF("id", "v")
      val hist = Similarity.prunedCounts(
        Similarity.clusterPruneAgainstHistory(vecs, "id", "v", quant, 500,
          Seq.empty[(Int, Long, Long)].toDF("cluster", "seen", "kept")))
      checkFamily(s"$tmp/cq", hist, HistoryFormat.ClusterQuota,
        "Similarity.clusterPruneAgainstHistory") { dir =>
        Similarity.clusterPruneAgainstHistoryTable(vecs, "id", "v", quant,
          500, dir).count()
      }
    }
  }

  test("cohort-activity and funnel-state probes enforce their markers") {
    withTmpDir { tmp =>
      import graft.operators.Behavioral
      val ev = Seq((1L, "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        (1L, "click", java.sql.Timestamp.valueOf("2024-01-02 10:00:00")),
        (2L, "view", java.sql.Timestamp.valueOf("2024-01-03 10:00:00")))
        .toDF("user_id", "event_type", "ts")
      checkFamily(s"$tmp/act",
        Behavioral.activityPairs(ev, col("user_id"), col("ts")),
        HistoryFormat.CohortActivity, "Behavioral.activityPairs") { dir =>
        Behavioral.activityFoldTable(ev, col("user_id"), col("ts"), dir)
          .count()
      }
      val stages = Seq("view", "click")
      val dir = s"$tmp/fun"
      def probe(ss: Seq[String]) =
        Behavioral.funnelFoldTable(ev.filter(lit(false)), col("user_id"),
          col("event_type"), col("ts"), ss, dir).count()
      Behavioral.funnelFold(None, ev, col("user_id"), col("event_type"),
        col("ts"), stages).write.mode("overwrite").parquet(dir)
      Behavioral.stampFunnelStages(conf, dir, stages)
      assert(probe(stages) >= 0L, "valid marker + stage list must probe")
      // marker enforcement (the checkFamily regimes)
      stampStale(dir, HistoryFormat.FunnelStages.name)
      val e = intercept[IllegalStateException](probe(stages))
      assert(e.getMessage.contains("Rebuild required"))
      new java.io.File(s"$dir/_graft_history_format.json").delete()
      val e2 = intercept[IllegalStateException](probe(stages))
      assert(e2.getMessage.contains("no _graft_history_format.json"))
      // stage-list enforcement: same-arity DIFFERENT stages refuse — two
      // k-stage states are schema-indistinguishable, only the sidecar
      // tells them apart
      Behavioral.stampFunnelStages(conf, dir, stages)
      val e3 = intercept[IllegalStateException](
        probe(Seq("signup", "activate")))
      assert(e3.getMessage.contains("was built for stages"), e3.getMessage)
      // a state with a marker but NO recorded stage list refuses too
      new java.io.File(s"$dir/_graft_funnel_stages.json").delete()
      val e4 = intercept[IllegalStateException](probe(stages))
      assert(e4.getMessage.contains("records no stage list"), e4.getMessage)
      // the step budget is state identity too: an ungapped state refuses
      // a gapped fold (and vice versa) — the schemas are identical, only
      // the sidecar knows which rule made the decisions
      Behavioral.stampFunnelStages(conf, dir, stages)
      val e5 = intercept[IllegalStateException](
        Behavioral.funnelFoldTable(ev.filter(lit(false)), col("user_id"),
          col("event_type"), col("ts"), stages, dir,
          maxGap = Some(expr("INTERVAL 2 DAYS"))))
      assert(e5.getMessage.contains("step budget"), e5.getMessage)
      Behavioral.stampFunnelStages(conf, dir, stages,
        maxGap = Some(expr("INTERVAL 2 DAYS")))
      val e6 = intercept[IllegalStateException](probe(stages))
      assert(e6.getMessage.contains("step budget"), e6.getMessage)
      // and the matching gap probes cleanly
      assert(Behavioral.funnelFoldTable(ev.filter(lit(false)),
        col("user_id"), col("event_type"), col("ts"), stages, dir,
        maxGap = Some(expr("INTERVAL 2 DAYS"))).count() >= 0L)
    }
  }

  test("score-cuts probes enforce the score-percentile-cuts marker") {
    withTmpDir { tmp =>
      val scored = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
      checkFamily(s"$tmp/cuts",
        Curation.scoreCutsModel(scored, "s", 3),
        HistoryFormat.ScoreCuts, "Curation.scoreCutsModel") { dir =>
        Curation.scoreBucketsUnderCutsTable(scored, "s",
          Seq("head", "middle", "tail"), dir).count()
      }
      // the drift probe enforces it too
      val dir2 = s"$tmp/cuts2"
      Curation.saveScoreCuts(spark, dir2,
        Curation.scoreCutsModel(scored, "s", 3))
      assert(Curation.scoreCutsDriftTable(scored, "s", dir2, 0.2)
        .count() === 3L)
      stampStale(dir2, HistoryFormat.ScoreCuts.name)
      intercept[IllegalStateException](
        Curation.scoreCutsDriftTable(scored, "s", dir2, 0.2))
    }
  }

  test("source-reputation state probe enforces the source-reputation-fp " +
    "marker") {
    withTmpDir { tmp =>
      val stop = Seq("the", "a", "of")
      checkFamily(s"$tmp/srcfp",
        Curation.sourceFpBatch(docs.withColumn("source", lit("s")),
          "source", "text", stop),
        HistoryFormat.SourceReputationFp, "Curation.sourceFpBatch") { dir =>
        Curation.sourceReputationFromStateTable(spark, dir, 0.2, 0.05)
          .count()
      }
    }
  }

  test("probing an absent history table is a loud error, not a no-op") {
    withTmpDir { tmp =>
      val e = intercept[IllegalStateException](
        HistoryTables.readChecked(spark, s"$tmp/nothing",
          HistoryFormat.MinhashSignature))
      assert(e.getMessage.contains("no history table"))
    }
  }

  test("near-dup canonicalization state root enforces its marker, " +
    "refuses torn state, and the table fold equals the one-shot") {
    import graft.operators.Dedup
    val d = docs.withColumn("q", length(col("text")))
    val pf: DataFrame => DataFrame = reps => {
      val a = reps.select(col("id").as("id_a"),
        substring(col("text"), 1, 4).as("k"))
      val b = reps.select(col("id").as("id_b"),
        substring(col("text"), 1, 4).as("k"))
      a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    withTmpDir { tmp =>
      val dir = s"$tmp/ndstate"
      // two-batch fold through the persisted root == one-shot
      Seq(col("doc_id") <= 1, col("doc_id") > 1).foreach { p =>
        Dedup.nearDupCanonicalizeIncrementTable(d.filter(p),
          "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf))
      }
      val folded = Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet
      val oneShot = Dedup.nearDupCanonicalize(d, "doc_id", "text", "q", pf)
        .collect().map(_.toSeq).toSet
      assert(folded === oneShot)
      // stale marker refuses from BOTH the fold and the resolution
      stampStale(dir, HistoryFormat.NearDupState.name)
      val e = intercept[IllegalStateException](
        Dedup.nearDupCanonicalizeIncrementTable(d.limit(1),
          "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf)))
      assert(e.getMessage.contains("Rebuild required") &&
        e.getMessage.contains("nearDupCanonicalizeIncrement"),
        e.getMessage)
      intercept[IllegalStateException](
        Dedup.nearDupResolutionTable(spark, dir))
      // a pointer naming missing data (the only way the single-pointer
      // commit can look torn: the pointer write is atomic, so this
      // means post-commit corruption) refuses with the remedy from
      // BOTH surfaces — never a raw parquet path-not-found
      HistoryFormat.stamp(conf, dir, HistoryFormat.NearDupState)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/cc/c2"))
      val e2 = intercept[IllegalStateException](
        Dedup.nearDupCanonicalizeIncrementTable(d.limit(1),
          "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf)))
      assert(e2.getMessage.contains("missing under"), e2.getMessage)
      intercept[IllegalStateException](
        Dedup.nearDupResolutionTable(spark, dir))
      // an absent root resolves to a loud error, not an empty frame
      val e3 = intercept[IllegalStateException](
        Dedup.nearDupResolutionTable(spark, s"$tmp/nowhere"))
      assert(e3.getMessage.contains("no near-dup state"), e3.getMessage)
    }
  }

  test("near-dup state commit is a single-pointer swap: a crash-leftover " +
    "epoch dir is invisible to readers and cleaned by the next fold") {
    import graft.operators.Dedup
    val d = docs.withColumn("q", length(col("text")))
    val pf: DataFrame => DataFrame = reps =>
      reps.select(col("id").as("id_a"), col("id").as("id_b")).limit(0)
    withTmpDir { tmp =>
      val dir = s"$tmp/ndstate"
      Dedup.nearDupCanonicalizeIncrementTable(d.filter(col("doc_id") <= 1),
        "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf))
      val before = Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet
      // simulate a fold that crashed AFTER writing its chunk data but
      // BEFORE the pointer swap: half-written docs/cc chunks — plus a
      // legacy epoch dir (the pre-v4 cc namespace, still ours to prune)
      new java.io.File(s"$dir/docs/c2").mkdirs()
      new java.io.File(s"$dir/cc/c2").mkdirs()
      new java.io.File(s"$dir/e2").mkdirs()
      // readers still resolve epoch 1, bit-identical (the pointer names
      // chunks c1 only — uncommitted data is invisible)
      assert(Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet === before,
        "an uncommitted chunk must be invisible")
      // the next fold overwrites the garbage and commits chunk c2 in
      // all three tables — but never touches a non-state directory of
      // the user's (prune owns e<digits> at the root and [cm]<digits>
      // inside the chunk tables only)
      val foreign = new java.io.File(s"$dir/export")
      foreign.mkdirs()
      val foreignChunk = new java.io.File(s"$dir/docs/keepme")
      foreignChunk.mkdirs()
      Dedup.nearDupCanonicalizeIncrementTable(d.filter(col("doc_id") > 1),
        "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf))
      assert(new java.io.File(s"$dir/docs/c2").exists() &&
        new java.io.File(s"$dir/reps/c2").exists() &&
        new java.io.File(s"$dir/cc/c2").exists(),
        "each fold commits one chunk per table")
      assert(!new java.io.File(s"$dir/e2").exists(),
        "legacy epoch dirs prune after the swap")
      assert(foreign.exists() && foreignChunk.exists(),
        "pruning must not touch directories outside its namespaces")
      val oneShot = Dedup.nearDupCanonicalize(d, "doc_id", "text", "q", pf)
        .collect().map(_.toSeq).toSet
      assert(Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet === oneShot)
      // a LOST pointer over committed epochs (delete+rename stores can
      // lose it mid-crash; also the pre-epoch layout) must refuse, not
      // silently reseed over folded data — from BOTH surfaces
      new java.io.File(s"$dir/_graft_neardup_epoch.json").delete()
      val e4 = intercept[IllegalStateException](
        Dedup.nearDupCanonicalizeIncrementTable(d.limit(1),
          "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf)))
      assert(e4.getMessage.contains("no _graft_neardup_epoch.json pointer"),
        e4.getMessage)
      intercept[IllegalStateException](
        Dedup.nearDupResolutionTable(spark, dir))
    }
  }

  test("near-dup state compaction: chunk lists collapse to one chunk per " +
    "table, the resolution is bit-identical, and folding continues " +
    "seamlessly on the compacted root") {
    import graft.operators.Dedup
    val d = docs.withColumn("q", length(col("text")))
    val pf: DataFrame => DataFrame = reps => {
      val a = reps.select(col("id").as("id_a"),
        substring(col("text"), 1, 4).as("k"))
      val b = reps.select(col("id").as("id_b"),
        substring(col("text"), 1, 4).as("k"))
      a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    withTmpDir { tmp =>
      val dir = s"$tmp/ndstate"
      Seq(col("doc_id") <= 1, col("doc_id") === 2).foreach { p =>
        Dedup.nearDupCanonicalizeIncrementTable(d.filter(p),
          "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf))
      }
      val before = Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet
      def chunks(t: String): Seq[String] =
        new java.io.File(s"$dir/$t").list().toSeq
          .filter(_.matches("[cm]\\d+")).sorted
      assert(chunks("docs") === Seq("c1", "c2"))
      assert(chunks("cc") === Seq("c1", "c2"),
        "each fold commits one cc delta chunk")
      Dedup.nearDupCompactState(spark, dir)
      assert(chunks("docs") === Seq("m3") && chunks("reps") === Seq("m3") &&
        chunks("cc") === Seq("m3"),
        "compaction must collapse to one chunk and prune the originals")
      assert(Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet === before,
        "compaction must not change the resolution")
      // idempotent: already-compact roots no-op (pointer untouched)
      Dedup.nearDupCompactState(spark, dir)
      assert(chunks("docs") === Seq("m3"))
      // folding continues on the compacted root
      Dedup.nearDupCanonicalizeIncrementTable(d.filter(col("doc_id") > 2),
        "doc_id", "text", "q", dir, pf, Dedup.crossPairsByUnion(pf))
      assert(chunks("docs") === Seq("c4", "m3"))
      assert(chunks("cc") === Seq("c4", "m3"))
      val oneShot = Dedup.nearDupCanonicalize(d, "doc_id", "text", "q", pf)
        .collect().map(_.toSeq).toSet
      assert(Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet === oneShot,
        "fold → compact → fold must equal the one-shot")
    }
  }

  test("cc delta chunks LAW: a fold's cc chunk holds EXACTLY the changed " +
    "assignments (remapped members of touched components + new ids), " +
    "the committed last-wins read equals the in-memory fold's full " +
    "assignment bit for bit, a replayed batch appends a zero-row cc " +
    "chunk, and the chunk list self-compacts in-fold") {
    // prefix-join pair family: docs sharing a 4-char text prefix pair up
    val pf: DataFrame => DataFrame = reps => {
      val a = reps.select(col("id").as("id_a"),
        substring(col("text"), 1, 4).as("k"))
      val b = reps.select(col("id").as("id_b"),
        substring(col("text"), 1, 4).as("k"))
      a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    val cross = Dedup.crossPairsByUnion(pf)
    // batch 1: two singleton components-to-be; batch 2: id 5 merges with
    // 10 (new min); batch 3: id 4 merges with the {5,10} component —
    // its commit must remap BOTH old members and add the new id, and
    // must NOT touch 20's untouched component
    val batches = Seq(
      Seq((10L, "aaaa ten"), (20L, "bbbb twenty")),
      Seq((5L, "aaaa five")),
      Seq((4L, "aaaa four")))
    withTmpDir { tmp =>
      val dir = s"$tmp/ndstate"
      var mem = Dedup.nearDupEmptyState(
        batches.head.toDF("doc_id", "text").withColumn("q", lit(1)),
        "doc_id", "text", "q")
      batches.foreach { rows =>
        val b = rows.toDF("doc_id", "text").withColumn("q", lit(1))
        Dedup.nearDupCanonicalizeIncrementTable(b, "doc_id", "text", "q",
          dir, pf, cross)
        mem = Dedup.nearDupCanonicalizeIncrement(b, "doc_id", "text", "q",
          mem._1, mem._2, mem._3, pf, cross)
        mem = (mem._1.localCheckpoint(), mem._2.localCheckpoint(),
          mem._3.localCheckpoint())
      }
      def ccSet(df: DataFrame) = df.select("id", "component")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the fold-3 delta chunk: exactly the three changed rows
      assert(ccSet(spark.read.parquet(s"$dir/cc/c3")) ===
        Set((5L, 4L), (10L, 4L), (4L, 4L)),
        "the delta must remap every member of the touched component " +
          "and carry the new id — and nothing else")
      // committed last-wins == the in-memory fold's full assignment
      assert(ccSet(Dedup.nearDupReadState(spark, dir)._3) === ccSet(mem._3),
        "last-wins over base+delta chunks must equal the full assignment")
      // a replayed batch (exactly-once window) appends a 0-row cc chunk
      Dedup.nearDupCanonicalizeIncrementTable(
        batches.last.toDF("doc_id", "text").withColumn("q", lit(1)),
        "doc_id", "text", "q", dir, pf, cross)
      assert(spark.read.parquet(s"$dir/cc/c4").count() === 0L,
        "a no-op replay must change no assignments")
      assert(ccSet(Dedup.nearDupReadState(spark, dir)._3) === ccSet(mem._3))
      // 13 more pairless folds push the cc list past the threshold: the
      // 17th fold writes the FULL assignment and lists only it
      (0 until 13).foreach { i =>
        Dedup.nearDupCanonicalizeIncrementTable(
          Seq((100L + i, f"zz$i%02d unique $i")).toDF("doc_id", "text")
            .withColumn("q", lit(1)),
          "doc_id", "text", "q", dir, pf, cross)
      }
      val ccChunks = new java.io.File(s"$dir/cc").list().toSeq
        .filter(_.matches("[cm]\\d+"))
      assert(ccChunks === Seq("c17"),
        s"in-fold compaction must reset the cc list to one chunk: $ccChunks")
      assert(ccSet(Dedup.nearDupReadState(spark, dir)._3) === ccSet(mem._3),
        "compaction must not change the assignment")
      // and the resolution still equals the one-shot over everything
      val all = (batches.flatten ++ (0 until 13).map(i =>
        (100L + i, f"zz$i%02d unique $i"))).toDF("doc_id", "text")
        .withColumn("q", lit(1))
      assert(Dedup.nearDupResolutionTable(spark, dir)
        .collect().map(_.toSeq).toSet ===
        Dedup.nearDupCanonicalize(all, "doc_id", "text", "q", pf)
          .collect().map(_.toSeq).toSet)
    }
  }
}

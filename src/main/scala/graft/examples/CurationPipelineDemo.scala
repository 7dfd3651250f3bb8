package graft.examples

import graft._
import graft.delta.{DeltaWriteMode, DeltaWriter}
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data curation pipeline: the LLM-operator family composed
  * end-to-end the way a 100 TB pretraining-data job would run it —
  * quality/language gating, per-source reputation filtering, exact
  * dedup, transitive MinHash near-dup canonicalization (the composed
  * `nearDupCanonicalize`, keeping each cluster's best member), exact
  * ngram-Jaccard near-dup audit, benchmark decontamination,
  * embedding-space near-dup
  * removal, DSIR importance-based data selection, token accounting, and
  * a Delta sink
  * whose stats make the curated table skippable. Every stage is one of
  * the library operators under its documented scale shape (banded LSH,
  * bounded buckets, broadcast query/benchmark sides — no all-pairs, no
  * driver data paths).
  *
  * Run: sbt "runMain graft.examples.CurationPipelineDemo /tmp/graft-curate"
  */
object CurationPipelineDemo {
  def main(args: Array[String]): Unit = {
    val work = DemoWorkdir.fresh(args, "/tmp/graft-curate")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8, "graft-curate")
    spark.sparkContext.setLogLevel("ERROR")

    val rawDocs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def n(df: DataFrame): Long = df.count()
    val total = n(rawDocs)

    // 0. HTML main-content extraction — the crawl-ingest step AHEAD of
    //    every text stage: the corpus arrives here as markup (planted
    //    deterministically around each document: nav links, script
    //    payloads, a half-link footer), and the Boilerpipe/jusText-style
    //    block classifier must strip exactly the chrome and keep exactly
    //    the body before normalization/quality see any text. The gate is
    //    exact: extraction must recover every document's original text.
    import graft.operators.Curation
    val markup = rawDocs.withColumn("html", concat(
      lit("<html><head><title>site index</title>" +
        "<script>var nav = '<div>';</script></head><body>" +
        "<nav><a href='/'>Home</a> <a href='/a'>About us</a> " +
        "<a>Contact</a></nav><p>"),
      col("text"),
      lit("</p><div><a href='/t'>Terms</a> <a>Privacy</a> (c) 2024</div>" +
        "</body></html>")))
    val extracted = Curation.extractMainContent(
      markup, "doc_id", "html", minWords = 3, maxLinkDensity = 0.4)
    val extractionExact = n(extracted
      .join(rawDocs.select("doc_id", "text"), "doc_id")
      .filter(col("content") =!= col("text")))
    println(f"html extraction:  $total%6d docs de-chromed " +
      s"(content==original text for all: ${extractionExact == 0L})")
    val docs = extracted.select(col("doc_id"), col("content").as("text"))
      .join(rawDocs.drop("text"), "doc_id")

    // 1. quality + language gate: single codegen pass, no shuffle
    val stopwords = Seq("the", "and", "of", "to", "a", "der", "die", "und",
      "le", "la", "et", "el", "los", "y")
    val scored = docs.select(col("doc_id"), col("text"),
      TextFunctions.qualityScore(col("text"), stopwords).as("quality"),
      TextFunctions.langIdHeuristic(col("text")).as("lang"))
    val gated0 = scored.filter(col("quality") >= 0.3 && col("lang") =!= "und")
    val afterGate = n(gated0)

    // 1b. per-source reputation gate (domain-level filtering): sources
    //     with a high corpus-wide duplication rate or a stopword-free
    //     profile drop WHOLESALE — systematic junk per-doc filters miss
    val docSources = docs.select(col("doc_id"), col("source"))
    val reputation = Curation.sourceReputation(docs, "source", "text",
      stopwords, maxDupRate = 0.2, minStopword = 0.05)
    val keptSources = reputation.filter(col("keep")).select("source")
    val gated = gated0.join(docSources, Seq("doc_id"))
      .join(broadcast(keptSources), Seq("source"), "left_semi")
      .drop("source")
    val afterRep = n(gated)

    // 1c. learned gate distillation (audit): train the DCLM-style linear
    //     classifier on the RULE gate's own labels over a 20% slice,
    //     then score the full corpus — the learned sibling must agree
    //     with the rules it distilled (fastText-over-hashed-features
    //     replicating a Gopher-style gate, the DCLM construction). The
    //     model round-trips through its marker-stamped persistence, so
    //     the path a production scorer would load from is the path
    //     audited here. Scoring is map-only; training shuffles only
    //     (bucket, err) pairs per epoch.
    import graft.operators.QualityClf
    val labelled = scored.withColumn("label",
      col("quality") >= 0.3 && col("lang") =!= "und")
    val clf0 = QualityClf.train(labelled.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", "label", nBuckets = 1024, epochs = 15)
    QualityClf.save(spark, s"$work/clf_weights", clf0)
    val clf = QualityClf.load(spark, s"$work/clf_weights")
    val agree = QualityClf.score(labelled, "doc_id", "text", clf)
      .join(labelled.select("doc_id", "label"), "doc_id")
      .agg(avg(when(col("keep") === col("label"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    println(f"learned gate distillation: agreement with rule gate $agree%.3f " +
      s"(weights round-tripped via marker-stamped store: ${clf == clf0})")

    // 2. exact dedup by content fingerprint: one shuffle on a 16-byte key
    val exact = Dedup.byFingerprint(gated, "text", "doc_id")
    val afterExact = n(exact)

    // 3. substring-span dedup (Lee et al., before fuzzy doc-dedup as in
    //    the paper): token runs >= 10 recurring anywhere are excised
    //    everywhere but their first occurrence — the copies' NOVEL
    //    residue survives instead of the whole doc being dropped
    val spanned = graft.operators.SpanDedup.clean(
      exact, "doc_id", "text", n = 10)
    val spanTokens = spanned.agg(
      coalesce(sum("n_tokens_removed"), lit(0L))).head().getLong(0)
    val spanCleaned = spanned
      .select(col("doc_id"), col("clean_text").as("text"))

    // 3b. transitive MinHash-LSH near-dup dedup on the cleaned text via
    //     the COMPOSED canonicalization operator: banded signature pairs
    //     plug in as the pair stage, connected components resolve
    //     clusters, and each cluster keeps its BEST member (longest
    //     text, the standard keep-the-most-informative-copy rule) —
    //     not the smallest id. The resolution table (id → component →
    //     canonical) is what a production pipeline persists for
    //     attribution; the funnel only needs the keep set.
    val resolution = Dedup.nearDupCanonicalize(
      spanCleaned.withColumn("__q", length(col("text"))),
      "doc_id", "text", "__q",
      reps => Dedup.minhashLshPairs(reps, "id", "text", threshold = 0.5))
    val nearDeduped = spanCleaned.join(
      resolution.filter(col("keep")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val afterNear = n(nearDeduped)

    // 4. near-dup audit at the canonical 0.8 cutoff — EXACT pairs via the
    //    AllPairs prefix join (what survived the probabilistic pass)
    val residual = n(Dedup.charNgramJaccardExactPairs(
      nearDeduped, "doc_id", "text", n = 12, threshold = 0.8))

    // 4b. benchmark decontamination: drop training docs sharing heavy
    //     n-gram overlap with the (stand-in) eval split — the benchmark
    //     gram index broadcasts, the corpus never shuffles
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val contaminated = Dedup.ngramContamination(
      nearDeduped.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
      evalSet, "doc_id", "text", n = 12, minShared = 32)
      .select(col("corpus_id").as("doc_id")).distinct()
    val clean = nearDeduped.filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val afterDecontam = n(clean)

    // 4c. SEMANTIC decontamination beside the n-gram screen: the eval
    //     set's embeddings persist ONCE as a marker-stamped index
    //     (HistoryFormat.EvalEmbedding), each batch screens map-only
    //     against the literal eval matrix through the marker-enforcing
    //     table path. Two surviving docs get PLANTED paraphrase-leak
    //     embeddings (an eval vector scaled 2x — same direction, cosine
    //     exactly 1.0): no 12-gram survives a paraphrase, so the n-gram
    //     screen above is blind to them; the semantic screen must catch
    //     exactly these two.
    val evalEmbIdx = s"$work/eval_emb_idx"
    Dedup.saveEvalEmbeddingIndex(
      emb.join(evalSet.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", evalEmbIdx)
    val semCorpus = emb.select("vec_id", "embedding").join(
      clean.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val hosts = semCorpus.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0))
    val leakEmb = emb.filter(col("vec_id") === 97L)
      .select(lit(hosts(0)).as("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") === 194L)
        .select(lit(hosts(1)).as("vec_id"), col("embedding")))
      .select(col("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
          .as("embedding"))
    val semFlagged = Dedup.semanticContaminationAgainstIndexTable(
        semCorpus.filter(!col("vec_id").isin(hosts.toSeq: _*))
          .unionByName(leakEmb),
        "vec_id", "embedding", evalEmbIdx, tau = 0.99)
      .filter(col("contaminated"))
    val semDropIds = semFlagged.select(col("id").as("doc_id"))
    val semClean = clean.join(semDropIds, Seq("doc_id"), "left_anti")
    val afterSemantic = n(semClean)
    val semCaught = n(semDropIds)

    // 5. embedding-space near-dups among survivors: SRP-bucketed cosine,
    //    drop the larger id of each pair
    val survivors = emb.join(
      semClean.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val embPairs = Dedup.embeddingCosinePairsLsh(
      survivors, "vec_id", "embedding", threshold = 0.995, planes = 8)
    val embLosers = embPairs.select(col("id_b").as("doc_id")).distinct()
    // STAGE BOUNDARY: materialize the dedup survivors before the
    // selection/packaging stages. Every action below would otherwise
    // replay the whole dedup lineage (minhash CC, AllPairs,
    // decontamination) per count — a real pipeline cuts stages at
    // durable tables for exactly this reason.
    semClean.join(embLosers, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$work/stage_dedup")
    val afterEmbDf = spark.read.parquet(s"$work/stage_dedup")
    val afterEmb = n(afterEmbDf)

    // 5b. DSIR data selection (importance resampling toward the target
    //     domain): both LMs train from ONE corpus scan; per-doc weights
    //     are a zero-shuffle codegen pass; the cutoff is the exact 10th
    //     percentile so the bottom decile of target-unlike docs drops
    val (tgtLm, srcLm) = Curation.ngramLmPair(
      docs, "text", col("lang") === "en", n = 3)
    val weights = Curation.dsirLogRatio(afterEmbDf, "doc_id", "text",
      tgtLm, srcLm)
    val dsirCut = weights.agg(expr("percentile(log_w, 0.1)"))
      .head().getDouble(0)
    val curated = afterEmbDf.join(
      weights.filter(col("log_w") >= dsirCut).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val afterDsir = n(curated)

    // 6. PII scrub (map-only regexp chain) + deterministic mixture
    //    sampling (hash-mod, reproducible — no RNG state to checkpoint)
    val scrubbed = curated.join(docSources, Seq("doc_id"))
      .select(col("doc_id"), Curation.redactPii(col("text")).as("text"),
        col("source"))
    val mixed = Curation.hashModSample(scrubbed, "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.5))
    val afterMix = n(mixed)

    // 7. token accounting over the curated corpus (codegen, no shuffle)
    val tokens = mixed.agg(
      sum(TextFunctions.tokenCount(col("text"))).as("tokens"),
      avg(TextFunctions.tokenCount(col("text"))).as("tokens_per_doc")).head()

    // 7b. sequence packing: the curated token stream cut into 512-token
    //     training packs (two-pass distributed prefix sum — no
    //     corpus-wide window)
    val packs = graft.operators.Packing.packAssignments(
      mixed, "doc_id", "text", budget = 512)
    val packStats = packs.agg(
      (max(col("pack_id")) + 1).as("n_packs"),
      sum(col("tok_end") - col("tok_start")).as("packed_tokens")).head()

    // 8. curated Delta table: stats-bearing files, partitioned by language
    //    — the PROCESSED text (span-cleaned, scrubbed), not the raw input
    val out = s"$work/curated"
    val writer = new DeltaWriter(spark, spark.sparkContext.hadoopConfiguration)
    writer.write(
      mixed.select("doc_id", "text")
        .join(scored.select("doc_id", "quality", "lang"), Seq("doc_id")),
      out, DeltaWriteMode.Overwrite, partitionBy = Seq("lang"))
    val readBack = writer.read(out).count()

    println(f"ingested:            $total%6d docs")
    println(f"quality+lang gate:   $afterGate%6d (-${total - afterGate})")
    println(f"source reputation:   $afterRep%6d (-${afterGate - afterRep}; " +
      s"${reputation.filter(!col("keep")).count()} sources dropped)")
    println(f"exact dedup:         $afterExact%6d (-${afterRep - afterExact})")
    println(f"span dedup:          $spanTokens%6d duplicated tokens excised")
    println(f"minhash near-dedup:  $afterNear%6d (-${afterExact - afterNear})")
    println(f"residual 0.8-pairs:  $residual%6d (audit)")
    println(f"decontamination:     $afterDecontam%6d (-${afterNear - afterDecontam})")
    println(f"semantic decon:      $afterSemantic%6d (-${afterDecontam - afterSemantic}; " +
      s"caught $semCaught of 2 planted paraphrase leaks via marker-checked index)")
    println(f"embedding near-dup:  $afterEmb%6d (-${afterSemantic - afterEmb})")
    println(f"dsir selection:      $afterDsir%6d (-${afterEmb - afterDsir}; " +
      f"cutoff log_w >= $dsirCut%.2f)")
    println(f"pii scrub + mixing:  $afterMix%6d (-${afterDsir - afterMix})")
    println(f"curated tokens:      ${tokens.getLong(0)}%6d (${tokens.getDouble(1)}%.1f/doc)")
    println(f"packed sequences:    ${packStats.getLong(0)}%6d x 512 tokens " +
      s"(${packStats.getLong(1)} packed)")
    println(f"delta read-back:     $readBack%6d rows; " +
      s"partitions=${writer.partitionColumnsOf(out).mkString(",")}")

    // 9. split + leakage audit + resumable export — the step between a
    //    curated table and a training run. The split is a pure function
    //    of (doc_id, seed); the audit asks what the whole dedup funnel
    //    exists to guarantee: does any TRAIN doc still share a long
    //    character run with a TEST doc? Post-dedup the answer should be
    //    (near) zero — the funnel's operators are what make a hash split
    //    honest. The export commits per-shard manifests, so a crashed
    //    materialization resumes without rewriting finished shards.
    import graft.operators.Mixing
    val curatedOut = writer.read(out)
    val splitDf = Mixing.splitAssign(curatedOut, "doc_id",
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    val splitCounts = splitDf.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val leakIdx = Dedup.benchmarkGramIndex(
      splitDf.filter(col("split") === "test").select("doc_id", "text"),
      "doc_id", "text", n = 12)
    val leaks = Dedup.contaminationAgainstIndex(
      splitDf.filter(col("split") === "train"), "doc_id", "text",
      leakIdx, n = 12, minShared = 32).count()
    // pre-funnel control: the RAW corpus under the same split leaks —
    // the funnel, not the split, is what removed the overlap
    val rawSplit = Mixing.splitAssign(docs.select("doc_id", "text"),
      "doc_id", Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    val rawLeaks = Dedup.contaminationAgainstIndex(
      rawSplit.filter(col("split") === "train"), "doc_id", "text",
      Dedup.benchmarkGramIndex(
        rawSplit.filter(col("split") === "test").select("doc_id", "text"),
        "doc_id", "text", n = 12), n = 12, minShared = 32).count()
    val exportDir = s"$work/export"
    val (shardsW, _) = Mixing.writeShardsResumable(
      splitDf.filter(col("split") === "train").select("doc_id"),
      "doc_id", exportDir, numShards = 4)
    println(f"split:               train=${splitCounts.getOrElse("train", 0L)}%d " +
      s"val=${splitCounts.getOrElse("val", 0L)} " +
      s"test=${splitCounts.getOrElse("test", 0L)}; " +
      s"train->test leakage pairs: $leaks (raw corpus control: $rawLeaks); " +
      s"export: $shardsW shards committed")
    val ok = packStats.getLong(1) > 0 &&
      extractionExact == 0L &&               // de-chroming is exact
      agree >= 0.8 && clf == clf0 &&         // distilled gate tracks the rules
      splitCounts.values.sum == readBack &&  // split is total
      leaks < rawLeaks &&                    // the funnel removed overlap
      shardsW == 4 &&
      semCaught == 2 &&                      // semantic screen catches the plant
      readBack == afterMix && afterMix <= afterDsir &&
      afterDsir <= afterEmb && afterEmb <= afterSemantic &&
      afterSemantic <= afterDecontam &&
      afterDecontam <= afterNear && afterNear <= afterExact &&
      afterExact <= afterRep && afterRep <= afterGate && afterGate <= total
    println(s"funnel check: ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

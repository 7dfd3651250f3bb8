package graft.examples

import graft.GraftSession
import graft.operators.{Curation, Dedup, FuzzyJoin, Mixing, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** MEASURED scaling curves for the engine's heaviest pair-generating
  * operators — the [[SpanHistoryScaling]] precedent generalized: every
  * "this plan wins at 100×" claim in the operator docs rests on plan
  * shape (banding, prefix filters, bounded buckets, broadcast indexes);
  * this runner converts the claim into numbers by synthesizing corpora
  * at 1×/2×/4×/8× the sf0.1 row count and measuring, per operator and
  * size, the WALL TIME, the CANDIDATE VOLUME (the largest
  * `numOutputRows` across the executed plan's join nodes — the pair
  * stream that would go quadratic if the filter stack failed), and the
  * PEAK intermediate row count across all plan nodes.
  *
  * Corpus derivation (testdata is read-only — scaled corpora are
  * derived in scratch): replica `r` of the sf0.1 corpus re-ids every
  * row (+r·10⁶, preserving the doc_id mod classes the query bodies
  * key plants on) and rewrites its text under a per-replica letter
  * rotation (`translate` over "etaoinsr", 8 distinct rotations), so
  * WITHIN a replica the near-duplicate/template structure of the
  * original corpus is preserved EXACTLY while ACROSS replicas texts
  * share almost no 12-grams/shingles/tokens. Embeddings rotate their
  * 64 dimensions by `r` positions (norm-preserving, decorrelating).
  * A real 2× corpus is "more of the same distribution", which is
  * precisely what this construction produces — and it makes the
  * correct asymptote measurable: pair density per document constant,
  * so candidates and output should grow ~LINEARLY (slope ≈ 1 on a
  * log-log fit). A broken filter stack (all-pairs behavior) shows up
  * as slope ≈ 2 regardless of constants.
  *
  * The fit is least-squares on (log m, log value) over the four sizes.
  * Exit 1 if any operator's candidate-volume OR peak-rows slope exceeds
  * 1.5 — both are pure functions of the data, bit-identical across
  * runs, so the gate never flakes. Wall-time slopes are PRINTED and
  * warned past 1.6 but not gated: they swung 1.26–1.55 for one
  * operator with box load alone, and a real quadratic regression
  * cannot hide from the row-count gates. Results are published in
  * README "scaling notes".
  *
  * Run: sbt "runMain graft.examples.ScalingCurves [workDir] [sfDir]"
  */
object ScalingCurves {

  /** Every node of the EXECUTED plan, descending through AQE's
    * materialized stages (the final plan lives under
    * AdaptiveSparkPlanExec/QueryStageExec, not in `children`). Public:
    * ScalingSuite reuses it for the deterministic candidate-count
    * regression pin. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  /** Execute `df`'s OWN plan (a write would plan a separate
    * QueryExecution whose metrics this one never sees) and return
    * (outputRows, candidateRows, peakRows): candidates = largest join
    * `numOutputRows`, falling back to the plan-wide peak ONLY for
    * join-less pipelines (the bucket-explode pair stream IS their
    * candidate stage). A plan that HAS join nodes which emitted zero
    * rows reports candidates 0 — "the join stack produced nothing" is
    * a real measurement (and a legitimate 1× value for a selective
    * filter stack), not the same thing as "no join stage exists";
    * substituting the peak there would gate the fitted candidate slope
    * against an unrelated scan/explode stage. */
  def measure(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val qe = df.queryExecution
    val out = qe.executedPlan.execute().count()
    val nodes = allNodes(qe.executedPlan)
    def rows(ns: Seq[SparkPlan]) = ns
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    val joinNodes = nodes.filter(_.nodeName.contains("Join"))
    val joinRows = rows(joinNodes).foldLeft(0L)(math.max)
    val peak = rows(nodes).foldLeft(0L)(math.max)
    (out, if (joinNodes.nonEmpty) joinRows else peak, peak)
  }

  private case class Point(m: Int, sec: Double, outRows: Long,
    candRows: Long, peakRows: Long)

  /** log-log least-squares slope over the measured points. */
  private def slope(pts: Seq[(Double, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1))
    val ys = pts.map(p => math.log(math.max(p._2, 1e-9)))
    val n = xs.size
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    if (den == 0) 0.0
    else xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / den
  }

  def main(args: Array[String]): Unit = {
    // Deliberately NOT DemoWorkdir.fresh: the derived 1×–8× corpora are
    // pure deterministic functions of the read-only testdata, cached
    // behind _SUCCESS markers so repeated measurement runs skip the
    // expensive derivation. There is no checkpoint here, so the stale-
    // workdir idle-batch footgun the other demos guard against cannot
    // occur — a leftover dir only makes the next run FASTER, not wrong.
    val work = args.headOption.getOrElse("/tmp/graft-scaling")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = GraftSession.local(cpus, "graft-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    val scales = Seq(1, 2, 4, 8)

    // ----- derived corpora ------------------------------------------------
    // 8 distinct letter rotations; r=0 is the identity (replica 0 IS the
    // original corpus, so the 1× point matches the bench queries)
    val perm = "etaoinsr"
    def rot(r: Int) = perm.drop(r % perm.length) + perm.take(r % perm.length)
    def replicaText(r: Int) =
      if (r == 0) col("text") else translate(col("text"), perm, rot(r))

    // derived-corpus dirs are keyed by the SOURCE they derive from, not
    // just scale: re-running with a different sfDir (or regenerated
    // testdata) must never silently reuse a prior run's corpora — the
    // measurements would claim to cover data they never read.
    // String.hashCode is spec-fixed, so the tag is stable across JVMs.
    val srcTag = Integer.toHexString(sfDir.hashCode)
    def synth(m: Int): Unit = {
      val docsOut = s"$work/docs_${srcTag}_x$m"
      val embOut = s"$work/emb_${srcTag}_x$m"
      if (!new java.io.File(s"$docsOut/_SUCCESS").exists()) {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        (0 until m).map(r => docs.select(
            (col("doc_id") + lit(r * 1000000L)).as("doc_id"),
            replicaText(r).as("text")))
          .reduce(_ unionByName _)
          // many splittable files: the measured thing is the operator,
          // not Spark's inability to split one local row group
          .repartition(cpus).write.mode("overwrite").parquet(docsOut)
      }
      if (!new java.io.File(s"$embOut/_SUCCESS").exists()) {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val dim = emb.select(size(col("embedding"))).first().getInt(0)
        (0 until m).map { r =>
          val v =
            if (r == 0) col("embedding")
            else concat(slice(col("embedding"), r + 1, dim - r),
              slice(col("embedding"), 1, r))
          emb.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
            v.as("embedding"))
        }.reduce(_ unionByName _)
          .repartition(cpus).write.mode("overwrite").parquet(embOut)
      }
    }

    // ----- the seven operators, bench-query parameterization -------------
    // (final orderBy dropped: a global sort of the ≤few-thousand-row
    // output is noise against the pair stages under measurement)
    def docs(m: Int) = spark.read.parquet(s"$work/docs_${srcTag}_x$m")
    def emb(m: Int) = spark.read.parquet(s"$work/emb_${srcTag}_x$m")

    // per-replica row count + graph derivations for the iterative family:
    // ids are replica-local (doc_id mod 10⁶ ∈ [0, n)), so a constant-
    // out-degree ring graph (offsets +1/+7/+40 mod n, within the replica)
    // and the d_connected_components chain shape (+1 edges, broken every
    // 8th node) both scale edges EXACTLY linearly with the corpus —
    // per-iteration exchange volume is then a pure function of the plan
    // (lazy: the derived corpora synthesize below, after ops are declared)
    lazy val perReplica = docs(1).count()
    def graphEdges(m: Int): DataFrame = {
      val local = pmod(col("doc_id"), lit(1000000L))
      val base = col("doc_id") - local
      Seq(1L, 7L, 40L).map(off => docs(m).select(
          col("doc_id").as("src"),
          (base + pmod(local + lit(off), lit(perReplica))).as("dst")))
        .reduce(_ unionByName _)
    }
    def chainEdges(m: Int): DataFrame = {
      val local = pmod(col("doc_id"), lit(1000000L))
      docs(m).select(col("doc_id"), local.as("__l"))
        .filter(pmod(col("__l"), lit(8)) =!= 7 &&
          col("__l") < lit(perReplica - 1))
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    }

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "d_ngram_jaccard" -> ((m: Int) =>
        Dedup.charNgramJaccardExactPairs(docs(m), "doc_id", "text",
          n = 12, threshold = 0.8)),
      "d_fuzzy_join" -> ((m: Int) => {
        val keyed = docs(m)
          .withColumn("k0", substring(col("text"), 1, 32))
          .withColumn("k", when(col("doc_id") % 5 === 3,
            concat(expr("substring(k0, 1, doc_id % 20)"), lit("q"),
              expr("substring(k0, doc_id % 20 + 2, 32)")))
            .otherwise(col("k0")))
        FuzzyJoin.editDistanceJoin(keyed.select("doc_id", "k"),
          "doc_id", "k", maxDist = 2, q = 3)
      }),
      "d_split_leakage" -> ((m: Int) => {
        def split(df: DataFrame) = Mixing.splitAssign(df, "doc_id",
          Seq(("train", 0.95), ("test", 0.05)))
        val idx = Dedup.benchmarkGramIndex(
          split(docs(m)).filter(col("split") === "test")
            .select(col("doc_id"), col("text")), "doc_id", "text", n = 12)
        Dedup.contaminationAgainstIndex(
          split(docs(m)).filter(col("split") === "train"),
          "doc_id", "text", idx, n = 12, minShared = 32)
      }),
      "d_contamination" -> ((m: Int) =>
        Dedup.ngramContamination(
          docs(m).filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
          docs(m).filter(col("doc_id") % 20 === 0), "doc_id", "text",
          n = 12, minShared = 32)),
      "e_ann_lsh" -> ((m: Int) => {
        val e = emb(m)
        val queries = e.filter(col("vec_id") < 50)
        val lsh = Similarity.lshTopK(queries, e, "vec_id", "embedding",
            k = 1, planes = 3, tables = 16)
          .select(col("query_id"), round(col("cosine"), 4).as("lsh_cosine"))
        Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 1)
          .select(col("query_id"), col("neighbor_id"),
            round(col("cosine"), 4).as("cosine"))
          .join(lsh, Seq("query_id"), "left")
      }),
      "d_minhash_pairs_poly" -> ((m: Int) =>
        Dedup.minhashLshPairsPortable(docs(m), "doc_id", "text",
          threshold = 0.2)),
      "d_simhash_pairs_poly" -> ((m: Int) =>
        Dedup.simhashPairsPortable(docs(m), "doc_id", "text",
          maxHamming = 6)),
      // the measured answer to the narrow layout's saturation: same
      // signatures under 3-of-6 combination keys (32-bit key space) —
      // candidate volume (the bucket-pair explode; no join stage) must
      // fall back to ~linear where the 16-bit keys curve at 1.41
      "simhash_poly_wide" -> ((m: Int) =>
        Dedup.simhashPairsPortableWide(docs(m), "doc_id", "text",
          maxHamming = 3, blocks = 6)),
      // substring-span dedup (Lee et al.) — the heaviest exact-dedup
      // family: gram-owner derivation + owner join; candidates = the
      // owner join's rows (per-replica gram df constant → linear)
      "d_span_dedup" -> ((m: Int) =>
        graft.operators.SpanDedup.spans(docs(m), "doc_id", "text", n = 10)),
      // winnowing fingerprint pairs — the last slowest-10 pair operator
      // without a slope row: window-minimum fingerprints bucket docs,
      // the maxDf cap drops boilerplate fingerprints, and candidates =
      // the verify join's rows (bench parameterization)
      "d_winnow_pairs" -> ((m: Int) =>
        Dedup.winnowingPairs(docs(m), "doc_id", "text",
          k = 16, w = 32, threshold = 0.2)),
      // iterative family, PageRank: candidates = the LAST iteration's
      // contribution join (the checkpoint policy truncates earlier
      // iterations out of the final plan, so the metric is exactly the
      // per-iteration exchange volume — 3 edges/node by construction);
      // wall covers the full run including the per-iteration checkpoint
      // jobs
      "d_page_rank" -> ((m: Int) =>
        Curation.pageRank(graphEdges(m), "src", "dst", iterations = 3)),
      // iterative family, distributed connected components (localLimit=0
      // forces the large-star/small-star contraction loop the cluster
      // path runs): chains of 8 converge in a fixed round count, so wall
      // and the final assignment join must both stay linear
      "d_connected_components" -> ((m: Int) =>
        Dedup.connectedComponents(chainEdges(m),
          workDir = Some(s"$work/ccwork_x$m"), localLimit = 0)),
      // IVF ANN with FIXED nlist and a fixed 50-query set: per-query
      // probe cost is corpus/nlist by construction, so slope 1.0 is the
      // CORRECT fixed-nlist behavior — production scales nlist with the
      // corpus (and the PQ code path bounds bytes/vector)
      "e_ivf_top1" -> ((m: Int) => {
        val e = emb(m)
        val queries = e.filter(col("vec_id") < 50)
        val model = Similarity.trainIvfCentroids(e, "vec_id", "embedding",
          nlist = 10, iterations = 4)
        Similarity.ivfTopK(queries, e, "vec_id", "embedding",
          k = 1, nlist = 10, nprobe = 2, quantizer = Some(model))
      }))

    // ----- measure --------------------------------------------------------
    scales.foreach(synth)
    val results = ops.map { case (name, build) =>
      // one untimed warm-up at 1× per operator: the first execution pays
      // codegen compilation and JIT warm-up, which otherwise lands
      // entirely on the 1× point and biases the fitted slope DOWN
      // (x1 measured slower than x8 on the cheap operators)
      build(1).queryExecution.executedPlan.execute().count()
      spark.catalog.clearCache()
      name -> scales.map { m =>
        val t0 = System.nanoTime()
        val (outRows, cand, peak) = measure(build(m))
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"$name%-22s x$m%-2d ${sec}%8.2f s  out=$outRows%-8d " +
          f"candidates=$cand%-10d peak=$peak%d")
        Point(m, sec, outRows, cand, peak)
      }
    }

    // ----- incremental history-probe curve ---------------------------------
    // The cross-batch operators claim per-batch probe cost bounded by the
    // BATCH (+ the probed buckets), not the accumulated history — the
    // semi-join-first discipline. Measure it the way a pipeline pays it:
    // a FIXED 500-doc batch probes persisted signature histories of
    // 1×..8× corpus size. Expected shape: found pairs ≈ constant (the
    // batch's replica-0 matches), candidate rows growing only with block
    // key-space saturation, peak = the history's 4-rows/sig explode
    // (linear, 16-byte rows — the scan cost compaction bounds), wall
    // time dominated by the fixed batch work.
    def probeCurve(label: String,
        probe: (DataFrame, DataFrame) => DataFrame): Seq[Point] = {
      def inputs(m: Int): (DataFrame, DataFrame) = {
        val histDir = s"$work/hist_${srcTag}_x$m"
        if (!new java.io.File(s"$histDir/_SUCCESS").exists())
          Dedup.simhashIndex(docs(m), "doc_id", "text")
            .repartition(cpus).write.mode("overwrite").parquet(histDir)
        (Dedup.simhashIndex(
          docs(1).filter(col("doc_id") < 500), "doc_id", "text"),
          spark.read.parquet(histDir))
      }
      // same untimed 1× warm-up as the operator loop: the first
      // execution pays codegen/JIT, which would land on the 1× point
      // and bias a flat-claim's fitted slope DOWN — the unsafe direction
      locally { val (b, h) = inputs(1); probe(b, h).queryExecution
        .executedPlan.execute().count(); spark.catalog.clearCache() }
      val pts = scales.map { m =>
        val (batchSigs, hist) = inputs(m)
        val t0 = System.nanoTime()
        val (out, cand, peak) = measure(probe(batchSigs, hist))
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"$label%-22s x$m%-2d ${sec}%8.2f s  out=$out%-8d " +
          f"candidates=$cand%-10d peak=$peak%d")
        Point(m, sec, out, cand, peak)
      }
      val probeSlope = slope(pts.map(p => (p.m.toDouble, p.sec)))
      println(f"$label wall slope vs history size: $probeSlope%.2f " +
        f"(found ${pts.head.outRows} -> ${pts.last.outRows} pairs; " +
        "the probe pays the batch, not the history)")
      pts
    }
    // narrow 4x16 keys vs the wide 3-of-6 combination keys against the
    // SAME persisted histories (keys derive at probe time): found pairs
    // must agree; the wide candidates stay flat where the narrow ones
    // drift with key-space saturation. Both probes run UNCAPPED
    // (maxBucket = 0) because the wide == narrow law holds for uncapped
    // buckets only — under the default cap a hot bucket could
    // LEGITIMATELY drop matches on one side and not the other, and the
    // equality gate below would misread documented behavior as a bug.
    val histPts = probeCurve("hash64_history_probe",
      (b, h) => Dedup.hash64AgainstHistory(b, h, maxBucket = 0))
    val histPtsW = probeCurve("hash64_history_wide",
      (b, h) => Dedup.hash64AgainstHistoryWide(b, h, maxBucket = 0))
    if (histPts.map(_.outRows) != histPtsW.map(_.outRows)) {
      println("QUADRATIC-CURVE FLAGS: narrow/wide history probes disagree " +
        s"on found pairs: ${histPts.map(_.outRows)} vs " +
        s"${histPtsW.map(_.outRows)}")
      spark.stop(); sys.exit(1)
    }

    // ----- measured layout selector -----------------------------------
    // hash64PairsAuto's decision, evaluated where its inputs actually
    // cross: two sub-sampled points below 1× (spread buckets — key rows
    // dominate, narrow wins) and the 1×–8× replicas above (bucket
    // flooding dominates — wide wins). The decision is a pure function
    // of the data (counts-only aggregations), so the printed flip is
    // bit-identical across runs; the gate requires the selector to
    // start narrow, end wide, and never flip back — i.e. it switches
    // exactly where the measured cost curves cross, which is the whole
    // point of replacing the call-site guess.
    println()
    val selPoints: Seq[(String, DataFrame)] =
      Seq("x1/16" -> docs(1).filter(col("doc_id") % 16 === 0),
        "x1/4" -> docs(1).filter(col("doc_id") % 4 === 0)) ++
        scales.map(m => s"x$m" -> docs(m))
    val selDecisions = selPoints.map { case (label, d) =>
      val dec = Dedup.hash64PairsLayoutDecision(
        Dedup.simhashIndex(d, "doc_id", "text"), "sh")
      println(f"hash64_auto_selector   $label%-5s -> ${dec.chosen}%-6s " +
        f"narrowCand=${dec.narrowCandidates}%-9d " +
        f"wideCand=${dec.wideCandidates}%-9d margin=${dec.margin}")
      dec
    }
    val wides = selDecisions.map(_.useWide)
    if (wides.head || !wides.last ||
      wides.zip(wides.tail).exists { case (a, b) => a && !b }) {
      println("QUADRATIC-CURVE FLAGS: hash64 layout selector did not flip " +
        s"narrow -> wide exactly once across the sizes: $wides")
      spark.stop(); sys.exit(1)
    }

    // ----- checkpoint-policy cost (iterative family) -----------------------
    // pageRank's policy changes lineage and job count only, never ranks
    // (suite-pinned): measure what each policy COSTS across 1×–8× so the
    // scaladoc guidance ("identity on tiny graphs, reliable checkpoints
    // under churn") is a number. identity nests each iteration's plan
    // inside the next — fine at 3 iterations, the recompute is bounded —
    // while localCheckpoint pays ~2·iterations fixed eager jobs.
    println()
    scales.foreach { m =>
      def wall(policy: DataFrame => DataFrame): Double = {
        val t0 = System.nanoTime()
        Curation.pageRank(graphEdges(m), "src", "dst", iterations = 3,
          checkpoint = policy)
          .queryExecution.executedPlan.execute().count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val wCkpt = wall(_.localCheckpoint())
      val wId = wall(identity)
      println(f"pagerank_ckpt_policy   x$m%-2d localCheckpoint=$wCkpt%5.2f s " +
        f"identity=$wId%5.2f s delta=${wCkpt - wId}%+5.2f s")
    }

    // ----- template-group collapse (composed canonicalization) -------------
    // The residual superlinearity in simhash PAIR output is the corpus's
    // own duplicate groups — Θ(g²) pairs is ground truth, no bucketing
    // can linearize it. The composed operator's answer is to never emit
    // those pairs: collapse identical texts first, pair REPRESENTATIVES
    // only. Measured on a TEMPLATE-heavy derivation (replicas keep the
    // ORIGINAL text — no rotation — so every text's duplicate group is
    // exactly m·(its 1× size)): raw pair output grows ~quadratically BY
    // CONSTRUCTION while the composed operator's cluster count stays
    // EXACTLY constant and its resolution output exactly linear. All
    // counts are pure functions of the data — deterministic gate.
    println()
    def tdocs(m: Int) = (0 until m).map(r => docs(1).select(
        (col("doc_id") + lit(r * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    // raw side stops at 4×: its pair stream grows ~m² by construction
    // (that is the POINT, not a regression) and 8× would only burn
    // minutes re-proving arithmetic
    val rawPts = Seq(1, 2, 4).map { m =>
      val n = Dedup.simhashPairsPortableWide(tdocs(m), "doc_id", "text",
        maxHamming = 3, blocks = 6, maxBucket = 0).count()
      println(s"tmpl_raw_pairs         x$m  out=$n")
      (m.toDouble, n.toDouble)
    }
    val rawSlope = slope(rawPts)
    val tmplPts = scales.map { m =>
      val res = Dedup.nearDupCanonicalize(
        tdocs(m).withColumn("q", length(col("text"))),
        "doc_id", "text", "q", Dedup.nearDupWideSimhashFamily()._1)
      val out = res.count()
      val clusters = res.filter(col("keep")).count()
      println(s"tmpl_canonicalize      x$m  out=$out clusters=$clusters")
      (m, out, clusters)
    }
    println(f"template collapse: raw pair slope $rawSlope%.2f (ground " +
      f"truth ~2), composed clusters ${tmplPts.map(_._3).distinct} " +
      "(must be a single constant), output exactly linear")
    val tmplBad =
      tmplPts.map(_._3).distinct.size != 1 ||
        tmplPts.exists { case (m, out, _) => out != m * tmplPts.head._2 }
    if (tmplBad) {
      println("QUADRATIC-CURVE FLAGS: composed canonicalization must hold " +
        s"cluster count constant and output linear on template corpora: " +
        s"${tmplPts.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }

    // ----- composed-fold history curve (nearDupCanonicalizeIncrement) ------
    // Every other history probe has a fixed-batch-vs-growing-history
    // series; the composed fold's per-batch cost includes two O(state)
    // anti-join scans (docs ids, reps fps), the cc-translation scan, and
    // — on the *Table surface — the cc rewrite (the v3 chunk layout
    // removed the docs/reps rewrite: those commits are now O(batch),
    // gated below via the chunk-bytes column), none of which the
    // semi-join-first discipline bounds. Measure it
    // the way a pipeline pays it: a FIXED 500-doc batch (250 attach by
    // fingerprint to already-seen texts, 250 genuinely novel texts)
    // folds into persisted state roots accumulated from the 1×–8×
    // corpora. Expected shape: the bookkeeping scans state's NARROW
    // columns (ids/fps/assignments — 16-byte-class rows, the same cost
    // class as every probe's history key scan) plus the linear epoch
    // rewrite, while PAIR work stays batch-bounded: the standalone
    // probe's candidates must not grow superlinearly with the rep
    // history (wide keys — the saturation-proof layout), and the
    // fold's row deltas are exact arithmetic (docs +500, reps +250).
    println()
    val (ndPf, ndProbe) = Dedup.nearDupWideSimhashFamily()
    val hconf = spark.sparkContext.hadoopConfiguration
    val ndFs = new org.apache.hadoop.fs.Path(work).getFileSystem(hconf)
    def ndRoot(m: Int): String = {
      val root = s"$work/ndst_${srcTag}_x$m"
      // cache key = the committed pointer AND the current state-format
      // version: a root cached under an older NearDupState version would
      // make the measured fold refuse with the rebuild remedy (correct
      // for production state, wrong for a derived measurement cache —
      // here the rebuild IS the remedy, so apply it)
      val fmt = graft.state.HistoryFormat.NearDupState
      val fmtOk = graft.state.HistoryFormat.read(hconf, root)
        .contains((fmt.name, fmt.version.toLong))
      if (!ndFs.exists(new org.apache.hadoop.fs.Path(root,
            "_graft_neardup_epoch.json"))
          || !fmtOk) {
        ndFs.delete(new org.apache.hadoop.fs.Path(root), true)
        Dedup.nearDupCanonicalizeIncrementTable(
          docs(m).withColumn("q", length(col("text"))),
          "doc_id", "text", "q", root, ndPf, ndProbe)
      }
      root
    }
    val ndChunkBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ndCcRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ndBatch = docs(1).filter(col("doc_id") < 500)
      .select((col("doc_id") + lit(77000000L)).as("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zq"),
            col("doc_id").cast("string")))
          .as("text"))
      .withColumn("q", length(col("text")))
      .localCheckpoint()
    val ndNovel = ndBatch.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("id"), col("text"))
    val ndPts = scales.map { m =>
      val src = ndRoot(m)
      // fold into a COPY: the measured epoch swap mutates the root, and
      // the cache must stay a pure function of (source corpus, m)
      val dst = s"$work/ndst_run_x$m"
      ndFs.delete(new org.apache.hadoop.fs.Path(dst), true)
      org.apache.hadoop.fs.FileUtil.copy(ndFs,
        new org.apache.hadoop.fs.Path(src), ndFs,
        new org.apache.hadoop.fs.Path(dst), false, hconf)
      val st0 = Dedup.nearDupReadState(spark, dst)
      val stateDocs = st0._1.count()
      val stateReps = st0._2.count()
      // the fold's materialize cuts its plan into per-stage jobs, so
      // candidates/peak come from the standalone equivalent of its
      // history-probe stage (same inputs, same operator)
      val (crossFound, cand, peak) = measure(ndProbe(ndNovel,
        st0._2.select("id", "text")))
      if (m == scales.head) { // untimed warm-up, like the other loops
        Dedup.nearDupCanonicalizeIncrementTable(ndBatch,
          "doc_id", "text", "q", dst, ndPf, ndProbe)
        ndFs.delete(new org.apache.hadoop.fs.Path(dst), true)
        org.apache.hadoop.fs.FileUtil.copy(ndFs,
          new org.apache.hadoop.fs.Path(src), ndFs,
          new org.apache.hadoop.fs.Path(dst), false, hconf)
      }
      val t0 = System.nanoTime()
      Dedup.nearDupCanonicalizeIncrementTable(ndBatch,
        "doc_id", "text", "q", dst, ndPf, ndProbe)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val stAfter = Dedup.nearDupReadState(spark, dst)
      val docsAfter = stAfter._1.count()
      val repsAfter = stAfter._2.count()
      // bytes the fold COMMITTED: the docs/reps appends (a function of
      // the batch — flat in m) and the v4 cc DELTA chunk, which must
      // hold EXACTLY the genuinely-changed assignments (remapped
      // members of touched components + new ids) — the O(Δ-components)
      // claim, gated as exact arithmetic against a pre/post diff
      def du(p: String): Long =
        if (ndFs.exists(new org.apache.hadoop.fs.Path(p)))
          ndFs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
        else 0L
      val chunkBytes = du(s"$dst/docs/c2") + du(s"$dst/reps/c2")
      val ccBytes = du(s"$dst/cc/c2")
      val ccRows = spark.read.parquet(s"$dst/cc/c2").count()
      // pre-fold assignment from the UNMUTATED source root; changed =
      // post-fold rows that are new or remapped vs it
      val ccPre = Dedup.nearDupReadState(spark, src)._3
        .withColumnRenamed("component", "__pre")
      val ccChanged = stAfter._3.join(ccPre, Seq("id"), "left")
        .filter(col("__pre").isNull || col("__pre") =!= col("component"))
        .count()
      println(f"neardup_fold_history   x$m%-2d ${sec}%8.2f s  " +
        f"state=$stateDocs%-7d cross_found=$crossFound%-5d " +
        f"cand=$cand%-9d peak=$peak%-9d docs+${docsAfter - stateDocs} " +
        f"reps+${repsAfter - stateReps} chunk_kB=${chunkBytes / 1024} " +
        f"cc_rows=$ccRows (changed=$ccChanged) cc_kB=${ccBytes / 1024}")
      if (docsAfter != stateDocs + 500 || repsAfter != stateReps + 250) {
        println("QUADRATIC-CURVE FLAGS: composed-fold row deltas must be " +
          s"exact arithmetic (docs $stateDocs->$docsAfter, " +
          s"reps $stateReps->$repsAfter)")
        spark.stop(); sys.exit(1)
      }
      if (ccRows != ccChanged) {
        println("QUADRATIC-CURVE FLAGS: the cc delta chunk must hold " +
          s"exactly the changed assignments: wrote $ccRows, " +
          s"genuinely changed $ccChanged")
        spark.stop(); sys.exit(1)
      }
      ndChunkBytes += chunkBytes
      ndCcRows += ccRows
      Point(m, sec, crossFound, cand, peak)
    }
    // the v3 claim, gated: the fold's docs/reps COMMIT is a function of
    // the batch, not the state — chunk bytes must hold flat across the
    // 1×–8× accumulated states (same 500-doc batch → same appended rows)
    if (ndChunkBytes.max > 2 * ndChunkBytes.min) {
      println("QUADRATIC-CURVE FLAGS: v3 chunk commits must be " +
        s"batch-sized and state-independent: bytes=$ndChunkBytes")
      spark.stop(); sys.exit(1)
    }
    val ndCandSlope = slope(ndPts.map(p => (p.m.toDouble,
      p.candRows.toDouble)))
    val ndWallSlope = slope(ndPts.map(p => (p.m.toDouble, p.sec)))
    println(f"neardup_fold_history candidate slope $ndCandSlope%.2f " +
      f"(pair work batch-bounded), wall slope $ndWallSlope%.2f (the " +
      "O(state) bookkeeping SCANS — linear narrow rows, accepted " +
      "trade; README scaling notes), chunk bytes flat " +
      s"(${ndChunkBytes.map(_ / 1024).mkString("/")} kB: the docs/reps " +
      "commit is batch-sized, not state-sized), cc delta rows " +
      s"${ndCcRows.mkString("/")} (== genuinely-changed assignments at " +
      "every size — the v4 commit writes O(Δ-components), no per-fold " +
      "write term grows with state)")
    if (ndCandSlope > 1.5) {
      println("QUADRATIC-CURVE FLAGS: composed-fold probe candidates " +
        s"grew superlinearly with the rep history: slope $ndCandSlope")
      spark.stop(); sys.exit(1)
    }

    // ----- hash64 layout-decision cost: persisted counts vs re-measure ----
    // The auto selector's honest cost used to be two O(history)
    // counts-only key scans per decision (linear in state by
    // construction). With the Hash64Counts cache the decision reads
    // pre-aggregated buckets and measures only the batch — this series
    // measures BOTH paths per state size against the same fixed batch.
    // Gates are exact arithmetic, not wall-clock: (1) the counted
    // decision must equal the re-measured decision bit-for-bit at every
    // size (it is the same argmin over the same exact volumes — the
    // LAW), and (2) the counts state's per-layout key-row sums must be
    // exactly 4·N and C(6,3)=20·N (the fold lost nothing). Walls are
    // printed with slopes for the curve itself.
    println()
    def ndSigs(df: org.apache.spark.sql.DataFrame, idc: String) =
      df.select(col(idc).as("doc_id"),
        graft.functions.FusedMinHashFunctions
          .polySimhash(col("text"), 2147483647L, 1073741789L).as("sh"))
    val decBatch = ndSigs(ndNovel, "id").localCheckpoint()
    val decPts = scales.map { m =>
      val hs = ndSigs(Dedup.nearDupReadState(spark, ndRoot(m))._2
        .select("id", "text"), "id").localCheckpoint()
      val n = hs.count()
      val cdir = s"$work/h64counts_${srcTag}_x$m"
      ndFs.delete(new org.apache.hadoop.fs.Path(cdir), true)
      graft.operators.Hash64Counts.rebuild(spark, cdir, hs, "sh")
      // exact no-loss gate: Σ cnt per layout == keys-per-doc · N
      val sums = graft.operators.Hash64Counts.read(spark, cdir)
        .groupBy("layout").agg(sum(col("cnt")).as("s")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (sums.getOrElse("narrow", -1L) != 4 * n ||
          sums.getOrElse("wide", -1L) != 20 * n) {
        println("QUADRATIC-CURVE FLAGS: counts state lost rows: " +
          s"n=$n sums=$sums")
        spark.stop(); sys.exit(1)
      }
      if (m == scales.head) { // untimed warm-up, like the other loops
        graft.operators.Hash64Counts.decision(decBatch,
          graft.operators.Hash64Counts.read(spark, cdir), "sh")
        Dedup.hash64HistoryLayoutDecision(decBatch, hs)
      }
      val t0 = System.nanoTime()
      val counted = {
        val hc = graft.operators.Hash64Counts.ensure(spark, cdir, hs, "sh")
        graft.operators.Hash64Counts.decision(decBatch, hc, "sh")
      }
      val countedSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val measured = Dedup.hash64HistoryLayoutDecision(decBatch, hs)
      val measuredSec = (System.nanoTime() - t1) / 1e9
      if (counted != measured) {
        println("QUADRATIC-CURVE FLAGS: counted decision diverged from " +
          s"the measurement at x$m: $counted vs $measured")
        spark.stop(); sys.exit(1)
      }
      println(f"hash64_layout_decision x$m%-2d counted=${countedSec}%6.2f s " +
        f"re-measure=${measuredSec}%6.2f s  hist=$n%-7d " +
        f"chosen=${counted.chosen}")
      (m.toDouble, countedSec, measuredSec)
    }
    println(f"hash64_layout_decision counted slope " +
      f"${slope(decPts.map(p => (p._1, p._2)))}%.2f vs re-measure slope " +
      f"${slope(decPts.map(p => (p._1, p._3)))}%.2f (the counted path " +
      "reads O(buckets) pre-aggregated rows + one tripwire count — " +
      "never re-derives the history's key explosion)")

    // ----- rep-signature cache: history text hashed ONCE, not per fold ----
    // The production probe's history side used to re-derive the
    // poly-simhash over EVERY accumulated rep's text per fold; the
    // SigCache replaces that with a persisted 16-byte-row read. This
    // series measures BOTH per-fold costs against 1×–8× rep states,
    // both starting from disk (the reps parquet chunks vs the cache
    // chunks). Gate is exact: the cached signatures must equal the
    // fresh derivation as a multiset at every size (a silent drift here
    // would silently change probe keys). Walls print with slopes — the
    // uncached path pays text-bytes hashing that grows with state, the
    // cached path reads two longs per rep.
    println()
    val sigPts = scales.map { m =>
      val reps = Dedup.nearDupReadState(spark, ndRoot(m))._2
        .select("id", "text")
      val scd = s"$work/sigcache_${srcTag}_x$m"
      ndFs.delete(new org.apache.hadoop.fs.Path(scd), true)
      graft.operators.SigCache.rebuild(spark, scd, reps,
        2147483647L, 1073741789L) // cache build: paid once, untimed
      if (m == scales.head) { // untimed warm-up, like the other loops
        ndSigs(reps, "id").count()
        graft.operators.SigCache.read(spark, scd).count()
      }
      def sigTuples(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) Long.MinValue else r.getLong(1))).sorted
      val t0 = System.nanoTime()
      val derived = sigTuples(ndSigs(reps, "id").collect())
      val uncachedSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cached = sigTuples(
        graft.operators.SigCache.read(spark, scd).collect())
      val cachedSec = (System.nanoTime() - t1) / 1e9
      if (!(derived sameElements cached)) {
        println("QUADRATIC-CURVE FLAGS: cached signatures diverged from " +
          s"the fresh derivation at x$m")
        spark.stop(); sys.exit(1)
      }
      println(f"sigcache_history       x$m%-2d derive=${uncachedSec}%6.2f s " +
        f"cached-read=${cachedSec}%6.2f s  reps=${derived.length}%-7d")
      (m.toDouble, uncachedSec, cachedSec)
    }
    println(f"sigcache_history derive slope " +
      f"${slope(sigPts.map(p => (p._1, p._2)))}%.2f vs cached-read slope " +
      f"${slope(sigPts.map(p => (p._1, p._3)))}%.2f (each rep's text is " +
      "hashed once, when it enters the state; per-fold history work is " +
      "a 16-byte-row read)")

    // ----- rep-signature cache at REALISTIC text sizes (~20 kB/doc) ------
    // The series above proves equality but its walls are sub-0.1 s both
    // ways (the synthetic reps are tiny), so it cannot SHOW the
    // structural claim: the un-cached probe's per-fold cost is
    // O(state · text-bytes) while the cached probe's is O(state ·
    // 16 bytes). This leg scales a 20 kB/doc rep state 1×–8× and
    // measures both paths from disk. Gates: exact signature equality as
    // a multiset at every size, and — the structural one — at the
    // LARGEST size the text re-derivation must cost at least 2× the
    // cached read (on this box it is ~10×; 2 absorbs window noise).
    println()
    val bigN = 3000
    def bigDocs(m: Int) = spark.range(bigN.toLong * m).select(col("id"),
      concat(md5(col("id").cast("string")),
        repeat(concat(lit(" x"), md5((col("id") + 7).cast("string"))),
          580)).as("text"))
    def sigTuplesB(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1))).sorted
    val bigPts = scales.map { m =>
      val rp = s"$work/sigbig_reps_x$m"
      if (!ndFs.exists(new org.apache.hadoop.fs.Path(rp)))
        bigDocs(m).write.parquet(rp)
      val reps = spark.read.parquet(rp)
      val scd = s"$work/sigbig_cache_x$m"
      ndFs.delete(new org.apache.hadoop.fs.Path(scd), true)
      graft.operators.SigCache.rebuild(spark, scd, reps,
        2147483647L, 1073741789L) // cache build: paid once, untimed
      if (m == scales.head) { // untimed warm-up, like the other loops
        ndSigs(reps, "id").count()
        graft.operators.SigCache.read(spark, scd).count()
      }
      val t0 = System.nanoTime()
      val derived = sigTuplesB(ndSigs(reps, "id").collect())
      val uncachedSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val cached = sigTuplesB(
        graft.operators.SigCache.read(spark, scd).collect())
      val cachedSec = (System.nanoTime() - t1) / 1e9
      if (!(derived sameElements cached)) {
        println("QUADRATIC-CURVE FLAGS: cached signatures diverged from " +
          s"the fresh derivation at x$m (20 kB texts)")
        spark.stop(); sys.exit(1)
      }
      println(f"sigcache_bigtext       x$m%-2d derive=${uncachedSec}%6.2f s " +
        f"cached-read=${cachedSec}%6.2f s  reps=${derived.length}%-7d " +
        f"(~20 kB/doc)")
      (m.toDouble, uncachedSec, cachedSec)
    }
    println(f"sigcache_bigtext derive slope " +
      f"${slope(bigPts.map(p => (p._1, p._2)))}%.2f vs cached-read slope " +
      f"${slope(bigPts.map(p => (p._1, p._3)))}%.2f (the derivation term " +
      "grows with the state's TEXT bytes; the cached read never touches " +
      "text)")
    val (bigDerive, bigCached) = (bigPts.last._2, bigPts.last._3)
    if (bigDerive < 2 * bigCached) {
      println("QUADRATIC-CURVE FLAGS: at realistic text sizes the cached " +
        s"probe must beat the per-fold text re-derivation decisively: " +
        f"derive=$bigDerive%.2f s vs cached=$bigCached%.2f s at x8")
      spark.stop(); sys.exit(1)
    }

    // ----- IVF with nlist ∝ √N (the production scaling rule, measured) -----
    // The fixed-nlist series above holds slope 1.00 by construction; the
    // README note "production scales nlist with the corpus" becomes
    // numbers here: nlist = round(√N) per size (the classic IVF sizing
    // rule), quantizer trained ONCE per size and persisted (training is
    // index-build cost, not probe cost — untimed). TWO probe policies
    // from the same index measure the actual trade:
    //  - FIXED nprobe=2: candidates ∝ queries·nprobe·N/nlist ≈ √N
    //    (slope ~0.5, measured 0.52) but the scanned FRACTION shrinks,
    //    so recall@1 decays — on this deliberately unclustered synthetic
    //    corpus (near-uniform directions; a trained quantizer has no
    //    cluster structure to exploit) measured 0.32 → 0.18 across 8×.
    //  - HELD fraction nprobe = max(2, nlist/16): scanned rows ≈ N/16
    //    at every size, so candidates return to ~linear and recall@1
    //    holds ~flat. More probes are a candidate SUPERSET, so
    //    recall(held) ≥ recall(fixed) is exact, not statistical.
    // That pair of curves IS the guidance: √N-nlist buys √N probe cost
    // only while recall targets allow fixed nprobe; holding recall on
    // unclustered data costs a constant corpus fraction. Gates pin the
    // measured properties (slopes + the superset law + held-recall
    // flatness), all pure functions of the data.
    println()
    val ivfPts = scales.map { m =>
      val e = emb(m)
      val nRows = e.count()
      val nlist = math.max(10, math.round(math.sqrt(nRows.toDouble)).toInt)
      val qpath = s"$work/ivfq_${srcTag}_x$m"
      if (!new java.io.File(s"$qpath/_SUCCESS").exists())
        Similarity.saveQuantizer(spark, qpath,
          Similarity.trainIvfCentroids(e, "vec_id", "embedding",
            nlist = nlist, iterations = 2))
      val model = Similarity.loadQuantizer(spark, qpath)
      val queries = e.filter(col("vec_id") < 50)
      val brute = Similarity.bruteForceTopK(queries, e,
          "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("cosine").as("__bcos"))
        .localCheckpoint() // truth table, reused by both policies
      val nQ = queries.count()
      def point(nprobe: Int, label: String): (Long, Double) = {
        def ivf = Similarity.ivfTopK(queries, e, "vec_id", "embedding",
          k = 1, nlist = nlist, nprobe = nprobe, quantizer = Some(model))
        if (m == scales.head) { // same untimed warm-up as the other loops
          ivf.queryExecution.executedPlan.execute().count()
          spark.catalog.clearCache()
        }
        val t0 = System.nanoTime()
        val (_, cand, _) = measure(ivf)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // recall@1, tie-safe: a hit is reaching the true best cosine,
        // not matching ids
        val hits = ivf.select(col("query_id"), col("cosine"))
          .join(brute, Seq("query_id"))
          .filter(col("cosine") >= col("__bcos") - lit(1e-9)).count()
        val recall = hits.toDouble / nQ
        println(f"ivf_sqrtn_$label%-12s x$m%-2d nlist=$nlist%-4d " +
          f"nprobe=$nprobe%-3d ${sec}%6.2f s candidates=$cand%-9d " +
          f"recall@1=$recall%.2f")
        (cand, recall)
      }
      val fixed = point(nprobe = 2, "fixed")
      val held = point(nprobe = math.max(2, math.round(nlist / 16.0).toInt),
        "held")
      (m, fixed, held)
    }
    val ivfFixedSlope = slope(ivfPts.map(p => (p._1.toDouble, p._2._1.toDouble)))
    val ivfHeldSlope = slope(ivfPts.map(p => (p._1.toDouble, p._3._1.toDouble)))
    println(f"ivf_sqrtn slopes: fixed-nprobe candidates $ivfFixedSlope%.2f " +
      f"(expected ~0.5), held-fraction candidates $ivfHeldSlope%.2f " +
      f"(expected ~1.0); recall fixed ${ivfPts.head._2._2}%.2f → " +
      f"${ivfPts.last._2._2}%.2f decays, held ${ivfPts.head._3._2}%.2f → " +
      f"${ivfPts.last._3._2}%.2f holds")
    val ivfBad =
      ivfFixedSlope > 1.0 || ivfHeldSlope > 1.3 ||
        ivfPts.exists(p => p._3._2 < p._2._2) || // superset law
        ivfPts.last._3._2 < ivfPts.head._3._2 - 0.15 // held-recall flat
    if (ivfBad) {
      println("QUADRATIC-CURVE FLAGS: √N-IVF gates violated " +
        s"(fixed slope $ivfFixedSlope, held slope $ivfHeldSlope, " +
        s"points ${ivfPts.mkString(", ")})")
      spark.stop(); sys.exit(1)
    }

    // ----- fit + gate -----------------------------------------------------
    println()
    println("operator               | slope(time) | slope(candidates) | " +
      "slope(peak) | out x1 -> x8 | cand x1 -> x8")
    var bad = List.empty[String]
    results.foreach { case (name, pts) =>
      val st = slope(pts.map(p => (p.m.toDouble, p.sec)))
      // a zero-candidate point (joins present but emitted nothing, or a
      // join metric the runtime did not populate) makes a log-log fit
      // undefined — the 1e-9 floor would turn 0→N into a spurious
      // slope-13 "quadratic" and all-zeros into a silent pass. Say so
      // explicitly and gate that series on peak rows alone.
      val candZero = pts.exists(_.candRows == 0)
      val peakZero = pts.exists(_.peakRows == 0)
      val sc =
        if (candZero) Double.NaN
        else slope(pts.map(p => (p.m.toDouble, p.candRows.toDouble)))
      val sp =
        if (peakZero) Double.NaN
        else slope(pts.map(p => (p.m.toDouble, p.peakRows.toDouble)))
      println(f"$name%-22s | $st%11.2f | $sc%17.2f | $sp%11.2f | " +
        f"${pts.head.outRows}%6d -> ${pts.last.outRows}%-6d | " +
        f"${pts.head.candRows} -> ${pts.last.candRows}")
      if (candZero && peakZero)
        // nothing measurable at all — unpopulated metrics would
        // otherwise read as a silent pass while the NOTE claims a gate
        bad ::= s"$name has zero candidate AND peak rows at some size " +
          "— no row-count gate can carry it (metrics unpopulated?)"
      else if (candZero) println(
        s"NOTE $name has a zero-candidate point — candidate fit skipped, " +
          "peak-rows gate carries this series")
      else if (peakZero) println(
        s"NOTE $name has a zero-peak point — peak fit skipped, " +
          "candidate gate carries this series")
      if (!candZero && sc > 1.5)
        bad ::= f"$name candidate slope $sc%.2f > 1.5"
      // peak is gated TOO: a quadratic stage hiding beneath a larger
      // linear stage's join metric (or in a join-less plan) still
      // dominates the per-plan maximum once it matters
      if (!peakZero && sp > 1.5)
        bad ::= f"$name peak-rows slope $sp%.2f > 1.5"
      // wall time is a WARNING, not a gate: row-count slopes are pure
      // functions of the data (bit-identical across four runs this
      // round) while wall slopes swung 1.26–1.55 for one operator with
      // box load alone — a hard gate on seconds would flake on a busy
      // box without any code change, and a real quadratic regression
      // cannot hide: it trips the candidate/peak gates above
      if (st > 1.6) println(
        f"WARN $name wall-time slope $st%.2f > 1.6 (load-sensitive; " +
          "row-count gates above are the signal)")
    }
    if (bad.nonEmpty) {
      println(s"QUADRATIC-CURVE FLAGS: ${bad.mkString("; ")}")
      spark.stop(); sys.exit(1)
    }
    println("scaling check: PASS (all slopes sub-quadratic)")
    spark.stop()
  }
}

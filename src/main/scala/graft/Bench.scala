package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core on the box (the harness runs local[32]); the
    // env var exists only to pin a smaller core count while profiling.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (codegen compiler, parquet footer reader,
    // shuffle machinery) so the first timed query isn't charged for JVM
    // startup — steady-state throughput is what maps to cluster behavior.
    spark.range(1000).groupBy(org.apache.spark.sql.functions.col("id") % 7)
      .count().collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // profiling knobs: ONLY filters by substring; REPEAT (default 2) times
    // the whole suite N times and reports each query's MINIMUM across
    // rounds — one contended round (another process stealing the box's
    // cores mid-bench) then cannot masquerade as a code regression, and
    // the min of repeated runs is the standard steady-state estimator.
    // Per-round lines go to stderr; stdout carries exactly ONE JSON line.
    // comma = OR of substrings, so one run can time an exact set of queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val repeat = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt)
    // deterministic execution order (stable JIT profile run to run)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val debug = sys.env.get("SPARK_GRAFT_DEBUG").contains("1")
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    // Contention telemetry baked into the artifact (round 12: the box
    // showed 2-3x run-to-run variance with a clean loadavg at START —
    // only per-round load/steal numbers let a later reader tell a code
    // regression from a noisy window without re-running anything).
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(1).mkString
      catch { case _: Exception => "-1" }
    def stealJiffies: Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.trim.split("\\s+"))
        .filter(_.length > 8).map(_(8).toLong).getOrElse(-1L)
      catch { case _: Exception => -1L }
    def fmt(results: Seq[(String, Double)], metric: String,
        errors: Map[String, String]): String = {
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      // A query that throws must be VISIBLE in the JSON line: a silent
      // catch times the failure at near-zero and a bench-only breakage
      // (e.g. a sink incompatibility) masquerades as a speedup.
      val errField =
        if (errors.isEmpty) ""
        else errors.toSeq.sortBy(_._1)
          .map { case (k, m) => s"\"" + k + "\":" + jstr(m) }
          .mkString(""","errors":{""", ",", "}")
      s"""{"metric":"$metric","value":$total,"unit":"sec","queries":$qs$errField,""" +
        s""""loadavg":$loadavg,"steal_jiffies":$stealJiffies,"sf":"$sfDir"}"""
    }
    var failed = Map.empty[String, String]
    // Steal-checked windows (round 12): BENCH_r11's recording caught a
    // 505k-jiffy steal burst and the README's clean band had to carry
    // the story externally. Now each round measures its OWN Δsteal; a
    // round stolen beyond the tolerance doesn't count toward the
    // requested repeat and the suite re-runs (bounded extra rounds), so
    // the artifact's min is taken over clean windows whenever the box
    // allows one. 2000 jiffies ≈ 20 CPU-seconds across the run — noise
    // level here; the r11 burst was 250x that.
    val stealTolerance =
      sys.env.getOrElse("SPARK_GRAFT_STEAL_TOLERANCE", "2000").toLong
    val maxExtraRounds = 3
    def runRound(round: Int): (Seq[(String, Double)], Long) = {
      val steal0 = stealJiffies
      val results = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): counting lets Catalyst prune every
        // subtree whose columns the count doesn't reference (a left join
        // against an aggregate with unique keys vanishes entirely, a
        // projection thins to the grouping columns), so count() times a
        // DIFFERENT, lighter plan than the query's consumers run. The
        // noop write materializes every output row in full.
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          failed += name -> s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
          System.err.println(s"[bench] $name FAILED: $e")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // isolation between queries: a query that leaks a cache must not
        // poison its successors' timings (and a leak should be VISIBLE —
        // the storage-block count below — not a mystery slowdown)
        if (debug) {
          val blocks = spark.sparkContext.getRDDStorageInfo
          if (blocks.nonEmpty) System.err.println(
            s"[bench] $name leaked ${blocks.length} cached RDD(s), " +
            s"${blocks.map(_.numCachedPartitions).sum} block(s): " +
            blocks.map(_.name).mkString("; "))
        }
        spark.catalog.clearCache()
        name -> sec
      }
      val dSteal = (stealJiffies, steal0) match {
        case (a, b) if a >= 0 && b >= 0 => a - b
        case _ => 0L // counter unavailable: can't adjudicate, count clean
      }
      System.err.println(fmt(results, s"round$round", failed)
        .stripSuffix("}") + s""","steal_delta":$dSteal}""")
      (results, dSteal)
    }
    var allRounds = Vector.empty[(Seq[(String, Double)], Long)]
    var roundNo = 0
    while (allRounds.count(_._2 <= stealTolerance) < repeat &&
        roundNo < repeat + maxExtraRounds) {
      roundNo += 1
      allRounds :+= runRound(roundNo)
    }
    val cleanRounds = allRounds.filter(_._2 <= stealTolerance)
    // min over clean windows when the box granted any; otherwise min over
    // everything (and the artifact says so via clean_rounds)
    val pool = (if (cleanRounds.nonEmpty) cleanRounds else allRounds).map(_._1)
    val best = pool.transpose.map(series =>
      series.head._1 -> series.map(_._2).min)
    println(fmt(best, "total", failed).stripSuffix("}") +
      s""","rounds_run":${allRounds.size},"clean_rounds":${cleanRounds.size},""" +
      s""""steal_tolerance":$stealTolerance,""" +
      s""""steal_deltas":${allRounds.map(_._2).mkString("[", ",", "]")}}""")
    // The harness archives only a ~2 KB TAIL of stdout, and the full line
    // above leads with per-query times — a tail capture clips to the
    // alphabetically-last queries and loses the round totals. This second,
    // compact line puts the essentials LAST on stdout so any tail capture
    // keeps them: total seconds, query/round counts, and the slowest 10.
    val slowest = best.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + math.rint(v * 1000) / 1000 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"summary","value":${best.map(_._2).sum},""" +
      s""""unit":"sec","n_queries":${best.size},"errors_n":${failed.size},""" +
      s""""rounds_run":${allRounds.size},"clean_rounds":${cleanRounds.size},""" +
      s""""steal_deltas":${allRounds.map(_._2).mkString("[", ",", "]")},""" +
      s""""slowest10":$slowest,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

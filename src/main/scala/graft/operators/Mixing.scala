package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-output materialization: the operators that sit BETWEEN a
  * curated corpus and the trainer's data loader — a deterministic global
  * shuffle into shards, temperature-flattened mixture sampling (the
  * sampling rule behind multilingual/multi-source training mixes, e.g.
  * mC4/PaLM's p_d ∝ w_d^(1/τ)), and token-budget epoch planning (how
  * many passes each source gets when its budget exceeds or undershoots
  * its available tokens, the LLaMA-style repeat table).
  *
  * Everything here is DRIVEN BY ONE PORTABLE HASH, a 3-round Lehmer
  * MINSTD chain ([[Mixing.minstd]]): every intermediate stays an exact
  * integer below 2^47, so Spark and a SQL oracle (DuckDB) replay the
  * identical shuffle/sample bit-for-bit — no engine RNG, no float
  * rounding, re-runs are reproducible by construction (the property a
  * training pipeline actually needs: the shuffle IS the random seed).
  *
  * Scale shapes (100 TB rules):
  *  - [[globalShuffle]]: map-only key derivation; the per-shard position
  *    window partitions by shard — shards are sized so one shard = one
  *    output file = one task (the standard sorted-shard write); the hash
  *    is uniform, so shards are count-balanced by construction.
  *  - [[temperatureSample]]: one tiny domain-count aggregation (partial
  *    agg; #domains rows), broadcast back, then a MAP-ONLY filter. The
  *    corpus never shuffles.
  *  - [[epochPlan]]: same shape — two tiny aggs + broadcast + map-only
  *    arithmetic. The partial-epoch membership is a hash threshold
  *    (expected-token coverage), NOT a prefix scan, precisely so no
  *    per-domain ordered window exists to become the hot task.
  *
  * Reference behavior: the reference's mixture tooling samples sources
  * by fixed ratios (polars-incremental scripts/sample_sources.py); the
  * temperature generalization and epoch planning follow the published
  * recipes (Raffel et al. T5 §3.4.3 temperature mixing; Touvron et al.
  * LLaMA Table 1 epoch counts).
  */
object Mixing {

  private val M = 2147483647L // 2^31 - 1, prime (Lehmer modulus)

  /** 3-round MINSTD hash of a non-negative integer column: value in
    * [1, M-1]. Every intermediate < 2^47 — exact in any 64-bit integer
    * engine, so an oracle can replay it verbatim. */
  def minstd(c: Column, seed: Long, rounds: Int = 3): Column = {
    var h: Column = pmod(c.cast("long") + lit(seed), lit(M - 1)) + lit(1L)
    (1 to rounds).foreach(_ => h = pmod(h * lit(48271L), lit(M)))
    h
  }

  /** The same chain as DuckDB SQL (ids must be non-negative). */
  def minstdSql(expr: String, seed: Long, rounds: Int = 3): String = {
    var h = s"(($expr + $seed) % ${M - 1} + 1)"
    (1 to rounds).foreach(_ => h = s"($h * 48271 % $M)")
    h
  }

  /** Deterministic global shuffle into `numShards` shards:
    * `(id, shard, pos)` — document `id` lands in shard `shard` at
    * 1-based position `pos` of that shard's hash-ordered stream. The
    * mapping is a pure function of (id, seed): re-running yields the
    * identical shuffle, and a resumed job can recompute any shard
    * without global state.
    *
    * At materialization scale, shards are sized to one output file each
    * (corpus_bytes / target_file_bytes shards), so the per-shard
    * position window is exactly the per-file write task — hash
    * uniformity makes the shards count-balanced, and no corpus-wide
    * ordered window ever exists. */
  def globalShuffle(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 41L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val key = minstd(col(idCol), seed)
    df.select(col(idCol), key.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("skey"), col(idCol))))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Curriculum ordering: the training stream visits difficulty BANDS in
    * order and shuffles WITHIN each band (Bengio et al.'s curriculum
    * learning, materialized the way [[globalShuffle]] materializes plain
    * shuffling): `(id, band, shard, pos)` — the loader reads bands
    * ascending, shards within a band in order, rows within a shard by
    * `pos`. The banding column is CALLER policy (a quality score bin, a
    * novelty bin, sequence length); within a band the order is the
    * deterministic MINSTD draw, so re-running reproduces the identical
    * curriculum and any (band, shard) file can be recomputed
    * independently.
    *
    * Scale: the position window partitions by (band, shard) — shards are
    * sized to one output file exactly as in [[globalShuffle]], so no
    * corpus-wide or band-wide ordered window ever exists; a band 100×
    * larger than another just spans more shards. */
  def curriculumOrder(df: DataFrame, idCol: String, band: Column,
      numShards: Int, seed: Long = 41L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.select(col(idCol), band.cast("int").as("band"),
        minstd(col(idCol), seed).as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("band", "shard").orderBy(col("skey"), col(idCol))))
      .select(col(idCol), col("band"), col("shard"), col("pos"))
  }

  /** Temperature-flattened mixture sampling, p_d ∝ w_d^(1/τ): draws an
    * expected `targetFrac` of the corpus with per-domain rates
    * flattened by temperature `tau` (τ=1 is proportional/no-op
    * flattening, τ→∞ is uniform-over-domains; τ=2 — the common
    * published setting — uses IEEE-exact sqrt, keeping the whole
    * computation bit-reproducible across engines).
    *
    * Selection is exact integer arithmetic end to end: per-domain counts
    * n_d; ss_d = round(√n_d · 10^6) as a LONG (√ and ·2^k-free double
    * multiply are correctly rounded by IEEE 754, so both engines hold
    * the identical double; round-half-up-to-integer of the same double
    * is the same integer, ≤ 10^12 — exact); Z6 = Σ ss_d (exact
    * long sum, order-independent); a row of domain d is kept iff
    *    u · Z6 · n_d < T · ss_d · 10^6,   u = (minstd(id) - 1) mod 10^6,
    * where T = floor(targetFrac · N) — the cross-multiplied form of
    * u/10^6 < T·ss_d/(Z6·n_d). The products run in DECIMAL(20,0)·…
    * (scale stays 0, so Spark's decimal math is EXACT as long as the
    * value fits 38 digits — it does for any sane mix: u·Z6·n_d ≤
    * 10^6 · #domains·10^12 · 10^12, within 38 digits up to ~10^8
    * domains); the oracle replays the same products in 64-bit integers
    * at test scale. No division ever happens, so no engine's rounding
    * can flip a boundary row.
    *
    * Only τ=2 is oracle-exact; other τ go through `pow`, whose last ulp
    * is implementation-defined — fine for production, not for a
    * cross-engine hash compare. */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      targetFrac: Double, tau: Double = 2.0, seed: Long = 41L): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1,
      s"targetFrac must be in (0,1], got $targetFrac")
    require(tau >= 1, s"tau must be >= 1, got $tau")
    val flat: Column => Column =
      if (tau == 2.0) sqrt
      else n => pow(n, 1.0 / tau)
    val dec = DecimalType(20, 0)
    // (domain, n_d, ss_d): one partial-aggregated pass, #domains rows
    val dom = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_d"))
      .withColumn("ss_d", round(flat(col("n_d")) * 1000000L, 0).cast("long"))
    // Z6 and T: a 1-row aggregate, cross-joined back (broadcast by size)
    val z = dom.agg(sum(col("ss_d")).as("z6"),
      floor(sum(col("n_d")) * targetFrac).cast("long").as("t_target"))
    val rates = dom.crossJoin(z)
    val u = pmod(minstd(col(idCol), seed) - 1, lit(1000000L))
    df.join(broadcast(rates), domainCol)
      .filter(u.cast(dec) * col("z6").cast(dec) * col("n_d").cast(dec) <
        col("t_target").cast(dec) * col("ss_d").cast(dec) * lit(1000000L).cast(dec))
      .select(col(idCol), col(domainCol))
  }

  /** The materialized form of [[globalShuffle]]: write the corpus as
    * `numShards` hash-shuffled, internally hash-ORDERED parquet
    * directories `shard=K/`. One task per shard writes one run of files
    * in stream order, so a trainer reads `shard=K` sequentially and
    * sees exactly the [[globalShuffle]] stream for that shard — no
    * corpus-wide sort, no driver involvement, shards count-balanced by
    * hash uniformity.
    *
    * The exchange is `repartition(numShards, shard)`: hash collisions
    * may co-locate two shard VALUES in one task, but `partitionBy`
    * still splits them into their own directories and the sort keys
    * lead with `shard`, so per-directory order is unaffected — worst
    * case is one task writing two shards' runs back to back (a
    * throughput wobble, never a correctness issue). */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
      numShards: Int, seed: Long = 41L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val key = minstd(col(idCol), seed)
    df.withColumn("skey", key)
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("skey"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }

  /** Resumable [[writeShards]]: per-shard atomic commit with a manifest,
    * so a crashed/killed export resumes by materializing ONLY the
    * missing shards — at 100 TB an export runs for hours and a retry
    * that rewrites finished shards makes the failure tail quadratic.
    * Layout:
    * {{{
    *   outDir/shard=<s>/...parquet    one hash-sorted stream per shard
    *   outDir/_manifest/<s>.json      {"shard":s,"rows":n,"key_xor":x}
    * }}}
    * A shard is COMMITTED iff its manifest file exists. Data renames in
    * BEFORE the manifest writes, so any crash point leaves either
    * nothing, an uncommitted partial (deleted and rewritten on resume),
    * or a committed shard (skipped untouched). Correct because a
    * shard's row set AND order are pure functions of
    * (corpus, seed, numShards) — the [[globalShuffle]] determinism
    * contract — so a resumed write reproduces the identical shard.
    *
    * The manifest's `key_xor` (commutative XOR fold of the MINSTD shard
    * keys) is an order-invariant content fingerprint: an auditor can
    * re-verify a shard against its manifest without re-running the
    * export. One aggregation pass (map-combined, O(numShards) driver
    * rows) + one write of only the missing shards' rows.
    *
    * Returns (shards written this call, shards skipped as committed). */
  def writeShardsResumable(df: DataFrame, idCol: String, outDir: String,
      numShards: Int, seed: Long = 41L): (Int, Int) = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(hconf)
    val manifestDir = new org.apache.hadoop.fs.Path(out, "_manifest")
    fs.mkdirs(manifestDir)
    // export-level parameter marker: resuming under a DIFFERENT
    // numShards or seed would mix two incompatible layouts (committed
    // shards keyed mod-N, new ones mod-M — rows duplicated and lost,
    // and the call would still report success). Refuse loudly instead —
    // the HistoryFormat rule applied to the export (the marker rides
    // _manifest/, a name no shard uses).
    val paramsPath = new org.apache.hadoop.fs.Path(manifestDir, "_export.json")
    if (graft.util.Fs.exists(paramsPath, hconf)) {
      val node = graft.util.Fs.readJson(paramsPath, hconf)
      val pn = graft.util.Jsons.optLong(node, "num_shards").getOrElse(-1L)
      val ps = graft.util.Jsons.optLong(node, "seed").getOrElse(-1L)
      if (pn != numShards.toLong || ps != seed)
        throw new IllegalStateException(
          s"resumable export at $outDir was started with numShards=$pn " +
            s"seed=$ps but this call passes numShards=$numShards " +
            s"seed=$seed — resuming would mix incompatible shard " +
            "layouts. Finish with the original parameters, or delete " +
            "the export directory to start over.")
    } else {
      val o = graft.util.Jsons.obj()
      o.put("num_shards", numShards)
      o.put("seed", seed)
      graft.util.Fs.atomicWriteJson(paramsPath, o, hconf)
    }
    val committed: Set[Int] = fs.listStatus(manifestDir)
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .filterNot(_ == "_export.json")
      .map(_.stripSuffix(".json").toInt).toSet
    val missing = (0 until numShards).filterNot(committed)
    if (missing.isEmpty) return (0, committed.size)
    val staging = new org.apache.hadoop.fs.Path(out, "_staging")
    if (fs.exists(staging)) fs.delete(staging, true) // prior crash's debris
    val keyed = df.withColumn("skey", minstd(col(idCol), seed))
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)).cast("int"))
      .filter(col("shard").isin(missing: _*))
    val stats = keyed.groupBy("shard")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(skey)").as("key_xor"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    keyed.repartition(missing.size, col("shard"))
      .sortWithinPartitions(col("shard"), col("skey"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(staging.toString)
    missing.foreach { s =>
      val src = new org.apache.hadoop.fs.Path(staging, s"shard=$s")
      val dst = new org.apache.hadoop.fs.Path(out, s"shard=$s")
      if (fs.exists(dst)) fs.delete(dst, true) // uncommitted partial
      if (fs.exists(src)) {
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"shard commit rename failed: $dst")
      } else fs.mkdirs(dst) // shard legitimately empty at this corpus size
      val (rows, keyXor) = stats.getOrElse(s, (0L, 0L))
      val o = graft.util.Jsons.obj()
      o.put("shard", s); o.put("rows", rows); o.put("key_xor", keyXor)
      graft.util.Fs.atomicWriteJson(
        new org.apache.hadoop.fs.Path(manifestDir, s"$s.json"), o, hconf)
    }
    fs.delete(staging, true)
    (missing.size, committed.size)
  }

  /** Mix-steering incremental sampler: accept arriving rows at per-domain
    * rates that drive the CUMULATIVE realized mix toward target shares —
    * the batch-mode [[temperatureSample]] assumes it sees the whole
    * corpus at once; under incremental ingestion with skewed arrival
    * order (one crawl dump is all one domain), fixed rates let the
    * realized mix drift arbitrarily far from target. Steering closes the
    * loop: each batch accepts from domain d up to its current DEFICIT
    *    a_d = clamp(floor(t_d · (N_have + A)) − have_d, 0, b_d),
    * where have_d comes from a persisted (domain, have) stats table,
    * b_d is the domain's batch count, and A = floor(acceptFrac · |batch|)
    * is the batch's acceptance budget. Row selection inside a domain is
    * the MINSTD threshold (accept iff u · b_d < a_d · 10^6 — expected
    * a_d accepts), so the draw is reproducible and the oracle can replay
    * the whole multi-batch evolution exactly.
    *
    * `history` is the realized-count state: (domainCol, "have" long) —
    * persist `acceptedCounts(accepted) ∪ history` re-aggregated between
    * batches (a [[graft.state.JobState]]-sized table: one row per
    * domain). Pass an empty frame for the first batch.
    *
    * Shape: two tiny aggregations (batch domain counts — partial-agg'd;
    * history is already per-domain), broadcast back, map-only filter.
    * The batch never shuffles. */
  def steeredSample(batch: DataFrame, idCol: String, domainCol: String,
      targets: Map[String, Double], history: DataFrame,
      acceptFrac: Double = 0.5, seed: Long = 41L): DataFrame = {
    require(acceptFrac > 0 && acceptFrac <= 1,
      s"acceptFrac must be in (0,1], got $acceptFrac")
    require(targets.values.forall(v => v >= 0 && v <= 1), "target shares in [0,1]")
    val dec = DecimalType(20, 0)
    // targets scaled to exact integer millionths — share arithmetic stays
    // integral (floor(t_d · n) = t6_d · n div 10^6)
    val t6 = targets.map { case (k, v) => k -> math.round(v * 1e6) }
    val bCounts = batch.groupBy(col(domainCol)).agg(count(lit(1)).as("b_d"))
    val have = history.groupBy(col(domainCol)).agg(sum("have").as("have"))
    val tot = bCounts.agg(
      floor(sum("b_d") * acceptFrac).cast("long").as("a_total"))
    val haveTot = have.agg(coalesce(sum("have"), lit(0L)).as("have_total"))
    val dom = bCounts.join(have, Seq(domainCol), "left")
      .na.fill(0L, Seq("have"))
      .crossJoin(tot).crossJoin(haveTot)
      .withColumn("t6", coalesce(
        element_at(typedlit(t6), col(domainCol)), lit(0L)))
      // deficit = floor(t_d·(N_have+A)) − have_d, clamped to [0, b_d].
      // t6·n_after runs in LONG: exact up to ~9·10^12 cumulative rows
      // (Long.Max/10^6) — ten trillion documents; past that, shard the
      // steering by corpus slice before this ever rounds.
      .withColumn("n_after", col("a_total") + col("have_total"))
      .withColumn("a_d", greatest(lit(0L), least(col("b_d"),
        expr("t6 * n_after div 1000000") - col("have"))))
    val u = pmod(minstd(col(idCol), seed) - 1, lit(1000000L))
    batch.join(broadcast(dom.select(col(domainCol), col("b_d"), col("a_d"))),
        domainCol)
      .filter(u.cast(dec) * col("b_d").cast(dec) <
        col("a_d").cast(dec) * lit(1000000L).cast(dec))
      .select(col(idCol), col(domainCol))
  }

  /** Per-domain realized counts of an accepted batch, shaped for
    * [[steeredSample]]'s `history` input. Union with the prior history
    * frame between batches (steeredSample re-aggregates). */
  def acceptedCounts(accepted: DataFrame, domainCol: String): DataFrame =
    accepted.groupBy(col(domainCol)).agg(count(lit(1)).as("have"))

  /** Token-budget epoch planning: given a per-domain token budget, how
    * many times does each document appear in the training stream?
    * Every document of domain d gets `floor(budget_d / avail_d)` full
    * epochs (capped at `maxEpochs`); the REMAINDER budget selects a
    * hash-random subset for one extra partial epoch, sized so the
    * expected token draw equals the remainder:
    *    doc in partial epoch iff u · avail_d < rem_d · 10^6.
    * Domains absent from `budgets` get 0 epochs (dropped from the mix).
    *
    * The partial-epoch rule is deliberately a PER-ROW hash threshold,
    * not an exact prefix-sum cut: an ordered cumulative scan per domain
    * would serialize a domain into one window task at corpus scale
    * (hitting the budget exactly to the token buys nothing — training
    * budgets are targets, not invariants). Shape: one partial-agg'd
    * domain aggregation, broadcast join, map-only arithmetic.
    *
    * Output: `(id, domain, n_tokens, epochs)` with `epochs >= 0`. A
    * trainer materializes epoch e by filtering `epochs >= e`. */
  def epochPlan(df: DataFrame, idCol: String, domainCol: String,
      tokenCol: String, budgets: Map[String, Long], maxEpochs: Int = 4,
      seed: Long = 41L): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val budget = coalesce(
      element_at(typedlit(budgets), col(domainCol)), lit(0L))
    val dom = df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol).cast("long")).as("avail"))
      .withColumn("budget", budget)
      .withColumn("full_epochs",
        least(expr("budget div avail"), lit(maxEpochs.toLong)))
      .withColumn("rem",
        when(col("full_epochs") >= maxEpochs, lit(0L))
          .otherwise(col("budget") - col("full_epochs") * col("avail")))
    val u = pmod(minstd(col(idCol), seed) - 1, lit(1000000L))
    // u·avail vs rem·10^6 in DECIMAL(20,0): exact (scale 0) and immune
    // to 64-bit wrap — u·avail reaches 10^22 for a 10^16-token domain
    val dec = DecimalType(20, 0)
    df.select(col(idCol), col(domainCol), col(tokenCol).cast("long").as("n_tokens"))
      .join(broadcast(dom), domainCol)
      .withColumn("epochs", (col("full_epochs") +
        when(u.cast(dec) * col("avail").cast(dec) <
          col("rem").cast(dec) * lit(1000000L).cast(dec), 1L).otherwise(0L))
        .cast("int"))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("epochs"))
  }

  /** Guard for the MINSTD-draw operators (shared [[IdGuard]]): a
    * non-numeric id NULLs out under the (non-ANSI) long cast — rows
    * silently fall through to the LAST branch, e.g. a string-id corpus
    * 100% assigned to the final split — and a fractional id truncates,
    * so distinct ids share one draw. */
  private def requireNumericId(df: DataFrame, idCol: String, op: String): Unit =
    IdGuard.requireIntegralId(df, idCol, op,
      "a lossy cast would corrupt or collapse the per-id draws silently")

  /** Deterministic train/val/test split assignment: each id draws
    * `u ∈ [0, 10000)` via the portable MINSTD chain and named splits own
    * contiguous integer bands (cumulative `round(frac · 10000)`
    * thresholds, computed ONCE on the driver) — so membership is a pure
    * function of (id, seed), stable across runs, engines, partitionings
    * and corpus growth (a doc's split never changes when other docs
    * arrive: the property that keeps eval sets honest as the corpus
    * accretes). Integer compares only (the temperature discipline); a
    * map-only pass, the corpus never shuffles.
    *
    * Band resolution is 1/10000 of the corpus — fractions finer than
    * that need a wider draw, so they're rejected rather than silently
    * rounded to an empty band. */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 97L): DataFrame = {
    requireNumericId(df, idCol, "splitAssign")
    require(splits.nonEmpty, "splitAssign: no splits")
    require(splits.map(_._1).distinct.size == splits.size,
      "splitAssign: duplicate split names")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitAssign: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * 10000))
    require(bounds.last == 10000L,
      "splitAssign: rounding drift — use fractions expressible in 1/10000")
    require(bounds.zip(0L +: bounds.init).forall { case (b, prev) => b > prev },
      "splitAssign: a fraction rounds to an empty band; use >= 0.0001")
    val u = pmod(minstd(col(idCol), seed) - 1, lit(10000L))
    val named = splits.map(_._1).zip(bounds)
    val assigned = named.init.foldRight(lit(named.last._1): Column) {
      case ((name, b), acc) => when(u < lit(b), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Exactly-`k` uniform deterministic sample: the `k` smallest rows
    * under the MINSTD hash order (ties broken by id). Complements the
    * PROPORTIONAL samplers (hash-mod, stratified-k-per-group) with the
    * "give me exactly 10M docs from the whole corpus" cut a training
    * run actually requests.
    *
    * Scale shape: `orderBy(hash).limit(k)` plans as
    * TakeOrderedAndProject — a map-side partial top-k per partition and
    * a driver merge of `k` rows per partition's survivors, never a
    * global sort or corpus shuffle (PlanSuite-pinned). `k` is therefore
    * driver-bounded by contract (sample sizes, not corpus sizes); for
    * corpus-fraction cuts use [[graft.operators.Curation.hashModSample]]. */
  def sampleExactN(df: DataFrame, idCol: String, k: Int,
      seed: Long = 53L): DataFrame = {
    requireNumericId(df, idCol, "sampleExactN")
    require(k >= 0, s"sampleExactN: k must be >= 0, got $k")
    df.withColumn("__sk", minstd(col(idCol), seed))
      .orderBy(col("__sk"), col(idCol))
      .limit(k)
      .drop("__sk")
  }
}

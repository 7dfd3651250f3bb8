package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation passes a pretraining pipeline runs between dedup and
  * packing: PII redaction, deterministic mixture sampling, and mixture
  * accounting. All three are MAP-ONLY (or one partial-agg) shapes — at
  * 100 TB they stream through the scan with no shuffle beyond the final
  * per-stratum reduction.
  *
  * Reference scope note: the reference engine has no curation family;
  * these extend its relational surface the way its own operators are
  * composed (pure built-in expressions, oracle-checkable).
  */
object Curation {

  /** The classic PII patterns a public-corpus scrub redacts (the
    * C4/Dolma-style pass): emails, North-American phone shapes, IPv4
    * addresses, SSN-shaped ids. Pattern syntax stays in the
    * Java-regex/RE2 COMMON SUBSET (character classes, bounded repeats,
    * alternation — no lookaround, no backrefs) so an ANSI oracle
    * (DuckDB = RE2) replaces byte-for-byte identically. Order matters:
    * SSN before phone (both match 3-2-4 vs 3-3-4 digit runs), email
    * before ip (a dotted quad inside a mail domain is the email's). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<SSN>",
    "[+]?[0-9]{0,2}[ ]?[(]?[0-9]{3}[)]?[- ][0-9]{3}-[0-9]{4}" -> "<PHONE>",
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}" -> "<IP>")

  /** Corpus-level boilerplate LINE removal (the CCNet §4.1 / RefinedWeb
    * line-wise filtering step): drop every line whose EXACT duplicate
    * count across the corpus reaches `minDf` — navigation, cookie
    * banners, licence headers — and reassemble each document's
    * remaining lines in their original order. Adds `clean_text` and
    * `n_lines_removed`; all original columns pass through.
    *
    * Scale shape: one line explode feeds a partial-aggregated df count
    * (hot lines combine map-side — a corpus-wide banner ships one
    * partial per map partition, never its occurrences); the hot-line
    * set is SMALL by nature (distinct boilerplate, not occurrences), so
    * the anti-join's build side broadcasts under AQE stats; the only
    * corpus-sized exchange is the per-document reassembly groupBy.
    * Reassembly sorts the collected (pos, line) structs — collect_list
    * order is not deterministic in a distributed engine (the
    * q_array_agg rule). */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 3): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = explodedLines(df, idCol, textCol)
    val hot = lines.groupBy("__line").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select("__line")
    rebuildLines(df, idCol, textCol,
      lines.join(hot, Seq("__line"), "left_anti"))
  }

  /** Shared line-family plumbing: exploded `(__id, __pos, __line)` rows
    * with the id UNCAST (any orderable id type works where the operator
    * doesn't need packed owners) ... */
  private def explodedLines(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))

  /** ... and the reassembly epilogue: surviving rows group per doc,
    * sort by position (collect_list order is nondeterministic — the
    * q_array_agg rule), rejoin to the original frame, and docs whose
    * every line was removed read clean_text='' rather than vanishing. */
  private def rebuildLines(df: DataFrame, idCol: String, textCol: String,
      kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy("__id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("__clean"),
        count(lit(1)).as("__kept"))
    df.join(rebuilt, col(idCol) === col("__id"), "left")
      .withColumn("clean_text", coalesce(col("__clean"), lit("")))
      .withColumn("n_lines_removed",
        (size(split(col(textCol), "\n")) - coalesce(col("__kept"), lit(0L)))
          .cast("long"))
      .drop("__id", "__clean", "__kept")
  }

  /** Guard for the operators whose persisted/packed state needs INTEGRAL
    * ids (shared [[IdGuard]]): a non-numeric id NULLs out under the
    * (non-ANSI) long cast — one NULL group, total data loss — and a
    * fractional one truncates, collapsing distinct ids into one packed
    * owner (the hashModSample precedent, quieter). */
  private def requireNumericId(df: DataFrame, idCol: String, op: String): Unit =
    IdGuard.requireIntegralId(df, idCol, op,
      "a lossy cast would corrupt the packed owners silently")

  /** Main-content extraction from HTML — the crawl-ingest step UPSTREAM
    * of every text operator here (normalization, quality, dedup all
    * assume markup is already gone). Adds `content`: the kept blocks of
    * [[graft.functions.HtmlCodec]]'s Boilerpipe/jusText-style
    * length+link-density classifier, newline-joined. Map-only codegen;
    * the corpus never shuffles. */
  def extractMainContent(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 3, maxLinkDensity: Double = 0.4): DataFrame =
    df.select(col(idCol),
      graft.functions.HtmlFunctions.htmlExtract(col(htmlCol), minWords,
        maxLinkDensity).as("content"))

  /** Keep-FIRST line deduplication (the Dolma `dedupe_paragraphs`
    * rule, complementing [[removeBoilerplateLines]]'s drop-ALL-copies):
    * a line occurring `minDf`+ times corpus-wide keeps only its
    * canonical first occurrence — min (doc_id, pos) — and every later
    * copy excises; unique lines pass untouched. Same scale shape as the
    * boilerplate pass, with the owner riding the df aggregation as a
    * packed `min(struct(doc_id, pos))` (one aggregate, no second
    * window) and an AQE-splittable join-back instead of an anti-join —
    * every line row needs its owner, not just membership. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // no id cast: the canonical owner is min (id, pos) under the id
    // type's own ordering, so string/UUID ids work here (only the
    // packed cross-batch variant requires numeric ids)
    val lines = explodedLines(df, idCol, textCol)
    val owners = lines.groupBy("__line")
      .agg(count(lit(1)).as("__df"),
        min(struct(col("__id"), col("__pos"))).as("__own"))
    rebuildLines(df, idCol, textCol,
      lines.join(owners, Seq("__line"))
        .filter(col("__df") < minDf ||
          (col("__own.__id") === col("__id") &&
            col("__own.__pos") === col("__pos"))))
  }

  /** CCNet-style score bucketing (head/middle/tail by LM perplexity,
    * Wenzek et al. §4.3): classify every row into one of `labels` by
    * EXACT score percentiles. The thresholds are `labels.size - 1`
    * numbers from ONE aggregate that broadcast back; classification is
    * a map-only comparison chain — never a corpus-wide ordered window
    * or ntile, which would funnel the corpus into one task (the
    * epochPlan rule). Rows at a threshold classify into the lower
    * bucket (`<=`), deterministically on both engines: the interpolated
    * thresholds ROUND to 6 decimals before the comparison, so with
    * caller-rounded (coarser, e.g. 2-decimal) scores a 1-ulp
    * interpolation difference between Spark's percentile and another
    * engine's quantile_cont can never flip a bucket — the rounded
    * threshold either equals a representable score exactly on both
    * engines or sits strictly between two score rounding steps. */
  def scoreBuckets(df: DataFrame, scoreCol: String,
      labels: Seq[String]): DataFrame =
    // ONE classification definition: the per-batch path IS the frozen
    // path under cuts trained on the batch itself — round-to-6 lives in
    // scoreCutsModel, the chain/NULL semantics in the shared impl, so
    // the two can never drift apart (the same-reference parity law is
    // now an identity, not a discipline). Arity is correct BY
    // CONSTRUCTION here, so the guard is skipped — an empty input
    // yields an empty cuts row-set AND zero classified rows (empty
    // output), never a refusal.
    bucketsUnderCutsImpl(df, scoreCol, labels,
      scoreCutsModel(df, scoreCol, labels.size), enforceArity = false)

  /** Train-once percentile cuts for [[scoreBucketsUnderCuts]] — the
    * persisted-model discipline applied to CCNet bucketing:
    * [[scoreBuckets]] computes its thresholds from the CURRENT batch, so
    * cross-batch bucket labels silently shift with batch composition
    * (exactly the failure the vocab/quantizer/BM25 snapshot family
    * exists for). This trains the cuts ONCE on a reference scored slice
    * and stamps them; batches then classify under the frozen cuts and
    * stay label-comparable until [[scoreCutsDrift]] calls a rebuild.
    *
    * One row per interior threshold, `(pos, cut)`: `pos` 1-based, `cut`
    * the exact `i/k` percentile interpolation ROUNDED to 6 decimals —
    * the same round-before-compare contract as [[scoreBuckets]], so the
    * rounding lives in the MODEL and classification is a plain `<=`
    * (any engine replays it bit-for-bit). One aggregate over the
    * reference; the model is k-1 rows of driver-free distributed state.
    * Persist with [[saveScoreCuts]] under the
    * [[graft.state.HistoryFormat.ScoreCuts]] marker. */
  def scoreCutsModel(ref: DataFrame, scoreCol: String, k: Int): DataFrame = {
    require(k >= 2, s"scoreCutsModel: need at least 2 buckets, got $k")
    val probs = (1 until k).map(i => i.toDouble / k)
    ref.agg(expr(
        s"percentile(CAST($scoreCol AS DOUBLE), array(${probs.mkString(",")}))")
        .as("__th"))
      .select(posexplode(col("__th")).as(Seq("__p", "cut")))
      .select((col("__p") + 1).cast("int").as("pos"),
        round(col("cut"), 6).as("cut"))
  }

  /** [[scoreBuckets]] under a FROZEN cuts table (a [[scoreCutsModel]]
    * result): map-only classification against the k-1 stamped
    * thresholds — `score <= cut(i)` picks `labels(i-1)`, the fallthrough
    * is the last label, a NULL score stays a NULL bucket (the
    * [[scoreBuckets]] conventions unchanged). Same-reference parity is
    * a law: cuts trained on `df` itself reproduce `scoreBuckets(df, …)`
    * exactly (suite-pinned), because the round-to-6 comparison is
    * identical on both paths.
    *
    * The cuts broadcast as ONE collected array (k-1 rows — bounded by
    * the label count, never by data); a label/cut arity mismatch refuses
    * loudly via a FILTER-borne guard (the guard-carrier rule: a
    * projected guard would be pruned by a bucket-only consumer). */
  def scoreBucketsUnderCuts(df: DataFrame, scoreCol: String,
      labels: Seq[String], cuts: DataFrame): DataFrame = {
    // EAGER arity/shape refusal, before any plan builds: the lazy
    // in-plan guard anchors on the broadcast model row, and AQE's
    // empty-relation propagation can skip the broadcast entirely for an
    // empty warm-up batch — a mis-wired k would then deploy silently
    // and only refuse at its first non-empty trigger. The cuts side is
    // k−1 rows by construction (one row per interior threshold), so
    // collecting the pos column here is one model-sized job; if the
    // caller hands an UNPERSISTED scoreCutsModel result this recomputes
    // its one aggregate — cache the model or use the persisted-table
    // probe when that matters.
    validateCutPositions(collectCutPositions(cuts, "scoreBucketsUnderCuts"),
      labels.size, "scoreBucketsUnderCuts")
    bucketsUnderCutsImpl(df, scoreCol, labels, cuts, enforceArity = true)
  }

  /** Collect the k−1 cut positions for the eager shape check, refusing a
    * NULL pos with the crafted remedy (Row.getInt on a NULL would throw
    * a bare NPE — the operator would still refuse, but undiagnosably;
    * the in-plan guard also passes NULLs silently, NULL ≠ anything). */
  private def collectCutPositions(cuts: DataFrame,
      caller: String): Seq[Int] =
    cuts.select(col("pos").cast("int")).collect().toSeq.map { r =>
      require(!r.isNullAt(0),
        s"$caller: the cuts table holds a NULL pos value — cut " +
          "positions must be exactly 1..k-1; rebuild the model with " +
          "scoreCutsModel")
      r.getInt(0)
    }

  /** Shared eager cuts-shape check: a cuts table for k labels must hold
    * exactly the positions 1..k−1 — the size check alone admits
    * duplicate or gapped pos values (e.g. 1,1,3 for k=4), which would
    * classify under silently mis-ordered thresholds. */
  private def validateCutPositions(pos: Seq[Int], k: Int,
      caller: String): Unit = {
    require(pos.size == k - 1,
      s"$caller: $k labels need ${k - 1} cuts but the model holds " +
        s"${pos.size} — the cuts were trained for a different bucket count")
    require(pos.sorted == (1 until k),
      s"$caller: cut positions must be exactly 1..${k - 1}, got " +
        s"${pos.sorted.mkString(",")} — duplicate or gapped pos values " +
        "would classify under mis-ordered thresholds")
  }

  /** Shared classification body of [[scoreBuckets]] and
    * [[scoreBucketsUnderCuts]] — one chain/NULL/guard definition so the
    * per-batch and frozen paths cannot drift apart. `enforceArity`
    * guards a CALLER-supplied cuts table; the guard filters the MODEL
    * side (always exactly one aggregate row), not the batch side: a
    * filter over batch rows never evaluates on an empty warm-up batch
    * and a mis-wired cuts table would deploy silently — anchored on the
    * model row it fires whenever the broadcast side builds. Note AQE's
    * runtime empty-relation propagation can skip the broadcast for an
    * EMPTY batch entirely (statically or at runtime), so BOTH public
    * entry points ([[scoreBucketsUnderCuts]] and
    * [[scoreBucketsUnderCutsTable]]) additionally validate the cuts
    * shape EAGERLY — size AND exact 1..k−1 positions — against the
    * k−1-row cuts table before building any plan; the in-plan guard
    * stays as defense against a non-deterministic cuts recompute. */
  private def bucketsUnderCutsImpl(df: DataFrame, scoreCol: String,
      labels: Seq[String], cuts: DataFrame,
      enforceArity: Boolean): DataFrame = {
    require(labels.size >= 2, "scoreBuckets: need at least 2 labels")
    require(labels.distinct.size == labels.size,
      "scoreBuckets: duplicate labels")
    val thRaw = cuts
      .agg(array_sort(collect_list(struct(col("pos"), col("cut")))).as("__tc"))
      .select(transform(col("__tc"), x => x.getField("cut")).as("__th"),
        transform(col("__tc"), x => x.getField("pos").cast("int")).as("__pos"))
    val th =
      (if (!enforceArity) thRaw
      else thRaw.filter(when(size(col("__th")) =!= labels.size - 1,
        raise_error(concat(
          lit(s"scoreBucketsUnderCuts: ${labels.size} labels need " +
            s"${labels.size - 1} cuts but the model holds "),
          size(col("__th")).cast("string"),
          lit(" — the cuts were trained for a different bucket count")))
          .cast("boolean"))
        // positions must be exactly 1..k-1 — the size check alone admits
        // duplicate/gapped pos (1,1,3 for k=4), i.e. silently
        // mis-ordered thresholds (__tc is pos-sorted, so no re-sort here)
        .when(col("__pos") =!= sequence(lit(1), lit(labels.size - 1)),
          raise_error(concat(
            lit("scoreBucketsUnderCuts: cut positions must be exactly " +
              s"1..${labels.size - 1}, got "),
            concat_ws(",", col("__pos")),
            lit(" — duplicate or gapped pos values would classify under " +
              "mis-ordered thresholds"))).cast("boolean"))
        .otherwise(lit(true)))).drop("__pos")
    val chain = labels.init.zipWithIndex
      .foldRight(lit(labels.last): Column) { case ((lab, i), acc) =>
        when(col(scoreCol).cast("double") <= element_at(col("__th"), i + 1),
          lit(lab)).otherwise(acc)
      }
    // an unscored row must NOT silently classify into the last (worst)
    // bucket — every comparison in the chain is NULL and the fallthrough
    // would label it `labels.last`; emit a NULL bucket instead so the
    // caller decides what unscored means
    val bucket = when(col(scoreCol).isNull, lit(null: String)).otherwise(chain)
    df.crossJoin(broadcast(th))
      .withColumn("bucket", bucket).drop("__th")
  }

  /** Drift signal for a stamped cuts table — bucket-share skew: classify
    * the batch under the frozen cuts and compare each bucket's share to
    * the 1/k it held on the reference by construction (equal-mass
    * percentiles). One row per bucket `(bucket_pos, n, share, skew)`
    * with the roll-up (`max_skew, rebuild`) attached; `rebuild` trips
    * when any bucket's |share − 1/k| exceeds `maxShareSkew`. Buckets the
    * batch never hits still report (share 0 — that IS the skew signal).
    * The empty batch reads zeros and rebuild=false (zero rows is not
    * drift evidence — the [[Profile.profileDrift]] contract). NULL
    * scores are excluded (unscored rows are a separate signal, the
    * [[scoreBuckets]] docs).
    *
    * Scale shape: one partial-agg'd exchange keyed by bucket position
    * (≤ k groups, combine map-side), then literally k-row arithmetic
    * under two tolerated 1-row scalar attaches. The corpus never joins
    * against itself and never sorts. */
  def scoreCutsDrift(batch: DataFrame, scoreCol: String, cuts: DataFrame,
      maxShareSkew: Double): DataFrame = {
    val th = cuts
      .agg(array_sort(collect_list(struct(col("pos"), col("cut")))).as("__tc"))
      .select(transform(col("__tc"), x => x.getField("cut")).as("__th"))
    // bucket position = 1 + #cuts strictly below the score (<= classifies
    // low, the scoreBuckets rule)
    val assigned = batch
      .select(col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .crossJoin(broadcast(th))
      .select((size(filter(col("__th"), c => col("__s") > c)) + 1)
        .cast("int").as("bucket_pos"))
      .groupBy("bucket_pos").agg(count(lit(1)).as("n"))
    // the bucket spine comes from the MODEL (k = #cuts + 1), so buckets
    // with zero batch rows still report
    val spine = th.select(
      posexplode(sequence(lit(1), size(col("__th")) + 1))
        .as(Seq("__i", "bucket_pos")),
      (size(col("__th")) + 1).cast("long").as("__k")).drop("__i")
    val total = assigned.agg(coalesce(sum(col("n")), lit(0L)).as("__total"))
    val perBucket = spine.join(assigned, Seq("bucket_pos"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket_pos"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("__total") > 0L,
          round(coalesce(col("n"), lit(0L)).cast("double")
            / col("__total"), 4)).otherwise(lit(0d)).as("share"),
        when(col("__total") > 0L,
          round(abs(coalesce(col("n"), lit(0L)).cast("double")
              / col("__total") - lit(1d) / col("__k").cast("double")), 4))
          .otherwise(lit(0d)).as("skew"),
        col("__total"))
    // roll-up via the tolerated 1-row scalar attach (k-row input), not a
    // global window
    val roll = perBucket
      .agg(max(col("skew")).as("max_skew"),
        (max(col("__total")) > 0L).as("__any"))
    perBucket.crossJoin(broadcast(roll))
      .withColumn("rebuild", col("__any") && col("max_skew") > maxShareSkew)
      .drop("__total", "__any")
  }

  /** Persist a cuts model under the
    * [[graft.state.HistoryFormat.ScoreCuts]] marker. */
  def saveScoreCuts(spark: org.apache.spark.sql.SparkSession, path: String,
      cuts: DataFrame): Unit = {
    cuts.write.mode("overwrite").parquet(path)
    graft.state.HistoryFormat.stamp(spark.sparkContext.hadoopConfiguration,
      path, graft.state.HistoryFormat.ScoreCuts)
  }

  /** Inverse of [[saveScoreCuts]]; refuses a missing or mismatched
    * marker (cuts under a different score definition or rounding shift
    * every bucket label silently). */
  def loadScoreCuts(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    graft.state.HistoryFormat.ensure(spark.sparkContext.hadoopConfiguration,
      path, graft.state.HistoryFormat.ScoreCuts, hasData = true)
    spark.read.parquet(path)
  }

  /** [[scoreBucketsUnderCuts]] against a persisted cuts path — the
    * path-taking probe enforces its own format marker (the
    * HistoryEnforcementSuite rule) AND validates the cuts shape
    * EAGERLY, naming the path in the refusal (the table is k−1 rows by
    * construction, so the check is free): the lazy in-plan guard
    * cannot fire when AQE empty-propagates an empty warm-up batch past
    * the broadcast, and a pipeline wired against the wrong cuts table
    * must refuse at deploy time, not at its first non-empty trigger. */
  def scoreBucketsUnderCutsTable(df: DataFrame, scoreCol: String,
      labels: Seq[String], cutsPath: String): DataFrame = {
    val cuts = loadScoreCuts(df.sparkSession, cutsPath)
    val caller = s"scoreBucketsUnderCutsTable($cutsPath)"
    validateCutPositions(collectCutPositions(cuts, caller),
      labels.size, caller)
    // straight to the shared body — delegating through
    // scoreBucketsUnderCuts would collect and validate the same k−1
    // rows a second time for no added safety
    bucketsUnderCutsImpl(df, scoreCol, labels, cuts, enforceArity = true)
  }

  /** [[scoreCutsDrift]] against a persisted cuts path (marker-enforced). */
  def scoreCutsDriftTable(batch: DataFrame, scoreCol: String,
      cutsPath: String, maxShareSkew: Double): DataFrame =
    scoreCutsDrift(batch, scoreCol,
      loadScoreCuts(batch.sparkSession, cutsPath), maxShareSkew)

  /** Population Stability Index between a reference slice's and a
    * batch's score distributions — THE standard deployed-model drift
    * metric (banking scorecards originally; the same number monitors a
    * quality classifier or reward proxy in a data pipeline). Buckets
    * are FIXED caller-given boundaries (the PSI convention: bounds come
    * from the reference period, so the number is comparable across
    * batches); a score lands in bucket `#{bounds strictly below it}`
    * (`<=` classifies low, the [[scoreBuckets]] rule). Laplace-smoothed
    * fractions `p = (n+1)/(N+K)` keep empty buckets defined with no
    * epsilon constant to disagree about. Rule-of-thumb cuts ship as
    * flags: `psi_total < warn` stable, past `shift` a distribution
    * shift.
    *
    * One row per bucket (`bucket, ref_n, batch_n, ref_frac, batch_frac,
    * psi_term`) with the roll-up (`psi_total, drift`) attached — the
    * per-bucket terms say WHERE the mass moved, the total is the page
    * number. Cost: two partial-agg'd bucket counts (K rows each), then
    * literally K-row arithmetic — the corpora never join, never
    * cross-compare; two tolerated 1-row scalar attaches carry the
    * totals. NULL scores are excluded from both sides (unscored rows
    * are a separate signal — [[scoreBuckets]] docs). */
  def psiReport(ref: DataFrame, batch: DataFrame, scoreCol: String,
      bounds: Seq[Double], warn: Double = 0.1,
      shift: Double = 0.25): DataFrame = {
    require(bounds.nonEmpty, "psiReport: need at least one bucket bound")
    require(bounds == bounds.distinct.sorted,
      "psiReport: bounds must be strictly increasing")
    require(warn < shift, s"psiReport: warn $warn must be < shift $shift")
    val k = bounds.size + 1
    def counts(df: DataFrame, n: String) = df
      .select(col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .select(bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__s") > lit(b), 1).otherwise(0)
      }.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(n))
    val spine = ref.sparkSession.range(k)
      .select(col("id").cast("int").as("bucket"))
    val joined = spine
      .join(counts(ref, "ref_n"), Seq("bucket"), "left")
      .join(counts(batch, "batch_n"), Seq("bucket"), "left")
      .na.fill(0L, Seq("ref_n", "batch_n"))
    val totals = joined.agg(sum("ref_n").as("__tr"), sum("batch_n").as("__tb"))
    val terms = joined.crossJoin(broadcast(totals))
      .withColumn("ref_frac",
        (col("ref_n") + 1).cast("double") / (col("__tr") + lit(k)))
      .withColumn("batch_frac",
        (col("batch_n") + 1).cast("double") / (col("__tb") + lit(k)))
      .withColumn("__term", (col("batch_frac") - col("ref_frac")) *
        log(col("batch_frac") / col("ref_frac")))
    val total = terms.agg(round(sum("__term"), 6).as("psi_total"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("ref_n"), col("batch_n"),
        round(col("ref_frac"), 6).as("ref_frac"),
        round(col("batch_frac"), 6).as("batch_frac"),
        round(col("__term"), 6).as("psi_term"),
        col("psi_total"),
        when(col("psi_total") > shift, lit("shift"))
          .when(col("psi_total") > warn, lit("warn"))
          .otherwise(lit("stable")).as("drift"))
  }

  /** Corpus report card — the one-pass operational summary a pipeline
    * run emits per corpus snapshot: for every CUBE cell over `dims`
    * (each dim, each pair, the grand total), document count, exact
    * whitespace-token total, distinct-content count (md5) and the
    * derived exact-dup rate. One aggregation (Expand feeds a single
    * partial-agg'd exchange); the only heavyweight metric is
    * COUNT(DISTINCT md5), which Spark plans as the standard two-phase
    * distinct-aggregate expansion — still one scan of the corpus. */
  def corpusReport(df: DataFrame, textCol: String,
      dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "corpusReport: no dimensions")
    // per-dim `<dim>_agg` flags disambiguate a roll-up subtotal row from
    // a group whose dimension VALUE is genuinely NULL — without
    // grouping(), a NULL-lang corpus makes the two cells unreadable
    val flags = dims.map(d => (grouping(col(d)) === 1).as(s"${d}_agg"))
    df.withColumn("__tok",
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("__fp", md5(col(textCol)))
      .cube(dims.map(col): _*)
      .agg(flags.head, flags.tail ++ Seq(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        countDistinct(col("__fp")).as("n_distinct"),
        round(lit(1d) - countDistinct(col("__fp")).cast("double") /
          count(lit(1)), 4).as("dup_rate")): _*)
  }

  /** Per-batch STATE for an incremental [[corpusReport]]: one row per
    * LEAF (dims…) cell with the batch's doc count, exact token sum, and
    * a DataSketches HLL sketch of the content fingerprints. Append per
    * batch into a report-state table; [[mergeCorpusReport]] folds the
    * accumulated rows into the full CUBE report at any time. The sketch
    * is the trade that makes the report FOLDABLE: exact distinct cannot
    * merge without re-reading every batch, an HLL union merges in
    * O(sketch bytes) with ~±2% relative error at the default lgK=12 —
    * the corpus-to-date dup rate from O(#cells · KB) state. Leaf cells
    * only; subtotals roll up at merge time, so the state stays one row
    * per live cell no matter how many batches land. */
  def corpusReportBatch(df: DataFrame, textCol: String,
      dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "corpusReportBatch: no dimensions")
    df.withColumn("__tok",
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("__fp", md5(col(textCol)))
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        hll_sketch_agg(col("__fp")).as("fp_sketch"))
  }

  /** Fold accumulated [[corpusReportBatch]] rows into the
    * [[corpusReport]] shape — every CUBE cell with grouping flags,
    * counts exact, `n_distinct`/`dup_rate` HLL-estimated. Doubles as
    * the state COMPACTION: merging the output of one batch's worth of
    * leaf rows back to leaf granularity keeps the table bounded
    * (group by the dims without cube for that). */
  def mergeCorpusReport(state: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "mergeCorpusReport: no dimensions")
    val flags = dims.map(d => (grouping(col(d)) === 1).as(s"${d}_agg"))
    state.cube(dims.map(col): _*)
      .agg(flags.head, flags.tail ++ Seq(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        hll_sketch_estimate(hll_union_agg(col("fp_sketch")))
          .as("n_distinct")): _*)
      .withColumn("dup_rate",
        round(greatest(lit(0d), lit(1d) -
          col("n_distinct").cast("double") / col("n_docs")), 4))
  }

  /** Portable poly-31 fold of a string's code points, +1 so the result
    * lands in [1, mod] (the KMV estimator below needs a strictly
    * positive rank) — `LIST_REDUCE(... (h, cp) -> (h·31 + cp) % mod)`
    * replays it bit-for-bit in any ANSI engine ([[PolyMinHash]]'s
    * verified identity between the `aggregate(split(s, ''))` Column
    * formulation and the DuckDB fold). */
  private def polyFold1(s: Column, mod: Long): Column =
    aggregate(split(s, ""), lit(0L),
      (h, c) => (h * 31 + ascii(c)) % mod) + 1

  /** [[corpusReportBatch]] under a PORTABLE KMV (k-minimum-values)
    * distinct sketch — the `_poly` discipline applied to the report's
    * one non-replayable column: DataSketches HLL stays the production
    * default (denser: KB vs 8·k bytes for comparable error), but its
    * binary sketch is a registered-merge estimate no ANSI engine
    * reproduces, so `d_corpus_report_incr` could only ever be
    * rows-checked. KMV (Bar-Yossef et al., RANDOM'02) is pure integer
    * arithmetic end to end: hash every content fingerprint into
    * [1, mod] with the poly-31 fold over its md5 hex, keep the k
    * smallest DISTINCT values per leaf cell, merge = k smallest of the
    * union, estimate = (k−1)·mod div h₍ₖ₎ (exact set size when fewer
    * than k values) — every step DuckDB replays bit-for-bit, closing
    * the report family's last rows-only row.
    *
    * State: one row per leaf cell, `(dims…, n_docs, n_tokens, kmv)`
    * with `kmv` a sorted array of ≤ k longs — bounded 8·k bytes per
    * cell regardless of batch size. Merge-fold law (suite-pinned):
    * the k smallest of a union equal the k smallest of the per-batch
    * k-smallest sets, so folding batch states IS sketching the whole
    * corpus — no approximation drift across batches, unlike sketches
    * whose merge loses information.
    *
    * Scale shape: counts partial-agg map-side; the sketch side
    * exchanges once on (dims…, h) to dedup, then ranks within the
    * leaf cell (WindowGroupLimit prunes to k per cell before the
    * bounded collect). The corpus never joins itself. */
  def corpusReportBatchKmv(df: DataFrame, textCol: String,
      dims: Seq[String], k: Int = 1024,
      mod: Long = 2147483647L): DataFrame = {
    require(dims.nonEmpty, "corpusReportBatchKmv: no dimensions")
    require(k >= 16, s"corpusReportBatchKmv: need k >= 16, got $k")
    val hashed = df.select(dims.map(col) ++ Seq(
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
        .as("__tok"),
      polyFold1(md5(col(textCol)), mod).as("__h")): _*)
    val counts = hashed.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col("__h"))
    val kmv = hashed.select((dims :+ "__h").map(col): _*).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(dims.map(col): _*)
      .agg(array_sort(collect_list(col("__h"))).as("kmv"))
    // NULL-SAFE join on the dims: a NULL dim value is a real leaf cell
    // in this family (corpusReport's grouping flags exist to tell it
    // apart from a rollup row), and a Seq-keyed equi-join would silently
    // drop it from the state — under-counting every subtotal above it.
    // EqualNullSafe keys still hash-partition, so the shape is unchanged.
    val kmvR = kmv.select(
      dims.map(d => col(d).as(s"__r_$d")) :+ col("kmv"): _*)
    counts.join(kmvR,
        dims.map(d => col(d) <=> col(s"__r_$d")).reduce(_ && _))
      .select(dims.map(col) ++
        Seq(col("n_docs"), col("n_tokens"), col("kmv")): _*)
  }

  /** Fold accumulated [[corpusReportBatchKmv]] rows into the
    * [[corpusReport]] shape (the [[mergeCorpusReport]] twin under the
    * portable sketch): every CUBE cell with grouping flags, counts
    * exact, `n_distinct` the KMV estimate — `m` when the merged sketch
    * holds m < k values (the sketch IS the distinct set), else
    * `(k−1)·mod div h₍ₖ₎`. Integer arithmetic only; one terminal
    * round on `dup_rate`. Doubles as the state compaction (group by
    * the dims without cube), like its production sibling. */
  def mergeCorpusReportKmv(state: DataFrame, dims: Seq[String],
      k: Int = 1024, mod: Long = 2147483647L): DataFrame = {
    require(dims.nonEmpty, "mergeCorpusReportKmv: no dimensions")
    val flags = dims.map(d => (grouping(col(d)) === 1).as(s"${d}_agg"))
    state.cube(dims.map(col): _*)
      .agg(flags.head, flags.tail ++ Seq(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("__kmv")): _*)
      .withColumn("n_distinct",
        when(size(col("__kmv")) < k, size(col("__kmv")).cast("long"))
          .otherwise(expr(
            s"${(k - 1).toLong * mod}L div element_at(__kmv, $k)")))
      .withColumn("dup_rate",
        round(greatest(lit(0d), lit(1d) -
          col("n_distinct").cast("double") / col("n_docs")), 4))
      .drop("__kmv")
  }

  /** AGGREGATING compaction of an accumulated [[corpusReportBatchKmv]]
    * state table back to one row per leaf cell: counts sum, sketches
    * merge (k smallest distinct of the union). Lossless by the KMV
    * merge law — compact-then-merge equals merge (suite-pinned) — so
    * the state stays O(#live cells · 8k bytes) however many batches
    * land. */
  def compactCorpusReportKmv(state: DataFrame, dims: Seq[String],
      k: Int = 1024): DataFrame = {
    require(dims.nonEmpty, "compactCorpusReportKmv: no dimensions")
    state.groupBy(dims.map(col): _*)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv"))
  }

  /** 128-bit line key: two genuinely independent XXH64 passes over the
    * line bytes. Second hash seeds via a LEADING literal —
    * `xxhash64(lit, line)` hashes the LINE bytes under a derived seed;
    * the reverse argument order would chain into a function of h1 alone
    * (the r11 WordGramHashes lesson, suite-pinned there). */
  private def lineKeys(line: Column): (Column, Column) =
    (xxhash64(line), xxhash64(lit(0x9E3779B97F4A7C15L), line))

  private def packedLineOwner(id: Column, pos: Column): Column = {
    // both halves guarded: an id outside 31 bits OR a pos outside 32
    // bits would bleed across the doc_id·2^32+pos bit boundary and
    // silently corrupt owner ordering rather than raise
    val guard = when(id < 0 || id > Int.MaxValue.toLong,
      raise_error(concat(lit("lineIndex: doc_id out of packed range: "),
        id.cast("string"), lit(" — the cross-batch line-history schema " +
          "is packed-long only; re-key documents into [0, 2^31) before " +
          "indexing"))))
      .otherwise(when(pos < 0 || pos > 4294967295L,
        raise_error(concat(lit("lineIndex: line position out of packed " +
          "range: "), pos.cast("string"),
          lit(" — a document may hold at most 2^32 lines under the " +
            "packed-long owner schema; split oversized documents " +
            "before indexing")))))
    coalesce(guard.cast("long"), id.cast("long") * lit(4294967296L) + pos)
  }

  /** Per-batch LINE index for cross-batch line dedup — one row per
    * distinct line: `(h1, h2, own, df)` with the canonical first owner
    * packed as `doc_id · 2^32 + pos` and the batch's occurrence count.
    * Append per batch into a history table (stamp it
    * `HistoryFormat("line-df", 1)`); compact with
    * `min(own)` / `sum(df)` ([[compactLineIndex]]) — O(corpus distinct
    * lines) · 32 B, the ownerIndex discipline at line granularity. */
  def lineIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    requireNumericId(df, idCol, "lineIndex")
    val lines = df.select(col(idCol).cast("long").as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val (h1, h2) = lineKeys(col("__line"))
    lines.select(h1.as("h1"), h2.as("h2"),
        packedLineOwner(col("__id"), col("__pos")).as("okey"))
      .groupBy("h1", "h2")
      .agg(min(col("okey")).as("own"), count(lit(1)).as("df"))
  }

  /** AGGREGATING compaction of an accumulated [[lineIndex]] history:
    * one row per distinct line — `min(own)` is idempotent, `sum(df)`
    * preserves the true corpus-wide count (the threshold is the
    * caller's `minDf`, so unlike the span history's `>= 2` gate the
    * count cannot saturate). */
  def compactLineIndex(history: DataFrame): DataFrame =
    history.groupBy(col("h1"), col("h2"))
      .agg(min(col("own")).as("own"), sum(col("df")).as("df"))

  /** [[dedupLinesAgainstHistory]] reading the persisted line-df index
    * from its table directory — validates the
    * [[graft.state.HistoryFormat.LineDf]] marker BEFORE any probe
    * (operator-enforced; the DataFrame overload leaves the check to the
    * caller, which cannot be avoided without the directory). */
  def dedupLinesAgainstHistoryTable(batch: DataFrame, historyDir: String,
      idCol: String, textCol: String, minDf: Int = 2): DataFrame =
    dedupLinesAgainstHistory(batch,
      graft.state.HistoryTables.readChecked(batch.sparkSession, historyDir,
        graft.state.HistoryFormat.LineDf),
      idCol, textCol, minDf)

  /** [[dedupLines]] for ONE batch against the accumulated [[lineIndex]]
    * of every prior batch: a batch line excises when its corpus-wide
    * count (history + batch) reaches `minDf` and the occurrence is not
    * the canonical owner — first-seen wins (`coalesce(hist, batch)`,
    * the spansWithHistory rule), so a line already curated in a past
    * batch keeps ITS copy and every current occurrence excises. The
    * history semi-joins to the batch's distinct line keys before
    * aggregating — prior batches' text is never touched, only 32-byte
    * index rows the batch actually probes. */
  def dedupLinesAgainstHistory(batch: DataFrame, history: DataFrame,
      idCol: String, textCol: String, minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    requireNumericId(batch, idCol, "dedupLinesAgainstHistory")
    val lines = batch.select(col(idCol).cast("long").as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val (h1, h2) = lineKeys(col("__line"))
    val occ = lines.select(col("__id"), col("__pos"), col("__line"),
      h1.as("h1"), h2.as("h2"),
      packedLineOwner(col("__id"), col("__pos")).as("okey"))
    val bIdx = occ.groupBy("h1", "h2")
      .agg(min(col("okey")).as("bown"), count(lit(1)).as("bdf"))
    val hist = history
      .join(bIdx.select("h1", "h2"), Seq("h1", "h2"), "left_semi")
      .groupBy("h1", "h2")
      .agg(min(col("own")).as("hown"), sum(col("df")).as("hdf"))
    val merged = bIdx.join(hist, Seq("h1", "h2"), "left")
      .select(col("h1"), col("h2"),
        coalesce(col("hown"), col("bown")).as("own"),
        (col("bdf") + coalesce(col("hdf"), lit(0L))).as("df"))
    val rebuilt = occ.join(merged, Seq("h1", "h2"))
      .filter(col("df") < minDf || col("okey") === col("own"))
      .groupBy("__id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("__clean"),
        count(lit(1)).as("__kept"))
    batch.join(rebuilt, col(idCol).cast("long") === col("__id"), "left")
      .withColumn("clean_text", coalesce(col("__clean"), lit("")))
      .withColumn("n_lines_removed",
        (size(split(col(textCol), "\n")) - coalesce(col("__kept"), lit(0L)))
          .cast("long"))
      .drop("__id", "__clean", "__kept")
  }

  /** Canonical form of a URL column for URL-keyed dedup — the C4/
    * RefinedWeb crawl-dedup step, where the same page arrives under
    * case-shuffled hosts, `www.` prefixes, reordered query params, and
    * fragments. Rules (the conservative standard set): scheme and host
    * lowercase, a leading `www.` strips, the fragment drops, query
    * parameters sort lexicographically as whole `k=v` strings, an empty
    * path normalizes to `/`. Path CASE is preserved (paths are
    * case-sensitive by spec — lowercasing them would merge distinct
    * pages). Pure codegen expression chain, zero shuffle; patterns stay
    * in the Java-regex/RE2 common subset so an ANSI oracle replays the
    * rules verbatim (the redactPii discipline). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^[A-Za-z]+", 0))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
      "^www[.]", "")
    val path0 = regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qs = regexp_extract(url, "[?]([^#]*)", 1)
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(
        concat(lit("?"), array_join(array_sort(split(qs, "&")), "&"))))
  }

  /** Registered-ish domain of a URL (last two host labels, `www.`
    * stripped) — the blocklist key for domain-level source filtering. */
  def urlDomain(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
      "^www[.]", "")
    val labels = split(host, "[.]")
    when(size(labels) <= 2, host)
      .otherwise(array_join(slice(labels, -2, 2), "."))
  }

  /** Domain blocklist gate: keep rows whose [[urlDomain]] is not in
    * `blocked`. The blocklist is driver-small by nature (curated lists
    * run to thousands of domains) and rides into codegen as a literal
    * set — map-only, the corpus never shuffles. */
  def domainBlocklistGate(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "domainBlocklistGate: empty blocklist")
    // normalize entries to urlDomain's form (lowercase, www. stripped,
    // last two labels): curated lists arrive as "Bad.com", "www.bad.com"
    // or "tracker.bad.com", and a verbatim compare against the
    // normalized domain would silently match nothing — a safety filter
    // that filters nothing
    val norm = blocked.map { b =>
      val lc = b.toLowerCase.stripPrefix("www.")
      val labels = lc.split('.')
      if (labels.length <= 2) lc else labels.takeRight(2).mkString(".")
    }.distinct
    df.filter(!urlDomain(col(urlCol)).isin(norm: _*))
  }

  /** Redacted text column: every pattern replaced in order. Pure
    * `regexp_replace` chain — codegen'd, zero shuffle, the 100 TB shape
    * is one streaming pass over the scan. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag) }

  /** How many redactions [[redactPii]] performed on `text` (sum of
    * per-pattern match counts, counted on the progressively-redacted
    * text so overlapping patterns never double-count). */
  def piiCount(text: Column): Column = {
    val (total, _) = PiiPatterns.foldLeft((lit(0L), text)) {
      case ((acc, cur), (pat, tag)) =>
        (acc + regexp_count(cur, lit(pat)).cast("long"),
          regexp_replace(cur, pat, tag))
    }
    total
  }

  /** C4-style text normalization for DEDUP KEYS: lowercase, strip
    * everything outside `[a-z0-9 ]`, collapse whitespace runs, trim.
    * Exact/fuzzy dedup keyed on `md5(normalizeText(text))` instead of
    * the raw bytes catches case/punctuation-only re-encodings of the
    * same content — the canonicalization the C4 and Dolma dedup passes
    * apply before fingerprinting. Pure codegen'd expression chain in
    * the Java-regex/RE2 common subset (oracle replays byte-for-byte);
    * map-only, fuses into the scan. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Deterministic mixture sampling — the "data mixing" primitive that
    * downsamples each stratum (source/domain/language) to a target
    * weight. A row survives iff
    * `knuthHash(id) % 100 < weights(stratum) * 100`: pure modular
    * arithmetic (Knuth's multiplicative hash, 2654435761 = ⌊2³²/φ⌋), so
    * the sample is reproducible across engines and runs — an ANSI oracle
    * computes the identical row set, and re-running a 100 TB pipeline
    * keeps the same sample (no RNG state, no seed drift). Map-only: the
    * filter fuses into the scan, strata missing from `weights` keep
    * everything (weight 1.0). */
  def hashModSample(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType],
      s"hashModSample needs a numeric id column; '$idCol' is " +
      s"${df.schema(idCol).dataType.simpleString} (a non-numeric cast " +
      "would null out and silently drop every row)")
    val pct = typedlit(weights.map { case (k, w) =>
      k -> math.round(w * 100).toInt })
    // id folds through a prime first so the product stays far from Long
    // overflow (DuckDB's BIGINT arithmetic is checked; a wrap would
    // desync the oracle — and 64-bit wrap semantics differ by engine)
    val bucket = pmod(pmod(col(idCol).cast("long"), lit(1000003L)) *
      lit(2654435761L), lit(4294967296L)) % 100
    df.filter(bucket < coalesce(pct(col(strataCol)), lit(100)))
  }

  /** Gopher quality rules (Rae et al., "Scaling Language Models: ...
    * Gopher", arXiv:2112.11446 Appendix A1.1) — the document-level
    * heuristic filter subset expressible in the ANSI/RE2 common surface:
    * word-count bounds, mean word length in [3, 10], symbol-to-word
    * ratio (# and ellipsis) <= 0.1, >= 80% of words containing an
    * alphabetic character, and >= 2 stopword hits. Adds the per-rule
    * measure columns plus a combined `gopher_pass`; every measure is
    * rounded to 4 before thresholding so both engines compare identical
    * doubles. Pure codegen'd expressions — map-only, fuses into the
    * scan; at 100 TB this is a streaming pass with zero shuffle. */
  def gopherRules(df: DataFrame, textCol: String, stopwords: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val w = split(col(textCol), " ", -1)
    val nWords = size(w).cast("long")
    val meanLen = round(
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        nWords, 4)
    val alphaFrac = round(
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / nWords, 4)
    val symbolRatio = round(
      (regexp_count(col(textCol), lit("#")) +
        regexp_count(col(textCol), lit("\\.\\.\\."))).cast("double") /
        nWords, 4)
    val stopHits =
      size(filter(w, x => lower(x).isin(stopwords: _*))).cast("long")
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("stopword_hits", stopHits)
      .withColumn("gopher_pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3d && col("mean_word_len") <= 10d &&
          col("alpha_frac") >= 0.8 &&
          col("symbol_ratio") <= 0.1 &&
          col("stopword_hits") >= 2L)
  }

  /** EXACT-count stratified sample: exactly `k` rows per stratum (fewer
    * iff the stratum is smaller), chosen deterministically by Knuth-hash
    * order over the id — the companion to [[hashModSample]] for when the
    * mixture recipe demands exact counts ("50k docs per language") and
    * not proportions. No RNG state: re-running a 100 TB pipeline keeps
    * the identical sample, and an ANSI oracle replays the arithmetic.
    *
    * Scale shape: a per-stratum rank would naively funnel each stratum
    * through one task (Zipf-fatal for a hot language) — but Spark plans
    * `row_number <= k` as a WindowGroupLimit: every map task keeps only
    * its own top-k per stratum BEFORE the shuffle, so the stratum task
    * receives O(k · #map-partitions) rows, not the stratum
    * (plan-pinned in PlanSuite). Hash ties break on the id, so the
    * selection is total-order deterministic. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(df.schema(idCol).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType],
      s"stratifiedSample needs a numeric id column; '$idCol' is " +
      s"${df.schema(idCol).dataType.simpleString}")
    import org.apache.spark.sql.expressions.Window
    // same overflow-safe Knuth arithmetic as hashModSample (prime fold
    // keeps the product under 2^53 for the oracle's checked BIGINTs)
    val key = pmod(pmod(col(idCol).cast("long"), lit(1000003L)) *
      lit(2654435761L), lit(4294967296L))
    df.withColumn("__sk", key)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strataCol)).orderBy(col("__sk"), col(idCol))))
      .filter(col("__rn") <= k)
      .drop("__sk", "__rn")
  }

  /** A character-n-gram language model for CCNet-style model-based
    * quality scoring (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", arXiv:1911.00359 — there
    * a KenLM 5-gram; here the classpath-free char-trigram analogue):
    * add-one-smoothed surprisal under a reference corpus. `counts` is
    * BOUNDED by the n-gram alphabet (O(|charset|^n), tens of thousands
    * for natural-language trigrams) NO MATTER the reference size — the
    * same bounded-model argument as the IVF centroid collect — so it
    * broadcasts as a literal and scoring is a zero-shuffle map pass. */
  case class NgramLm(counts: Map[String, Long], total: Long, vocab: Long, n: Int) {
    require(total > 0, "ngramLm: empty reference corpus")
  }

  /** Train [[NgramLm]] on a reference slice. The aggregation is one
    * partial-agg shuffle over the reference's grams; the collect is the
    * bounded model, not the data. */
  def ngramLm(ref: DataFrame, textCol: String, n: Int = 3): NgramLm = {
    val rows = ref.select(explode(graft.functions.CharNgramFunctions
        .charNgramsFast(col(textCol), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .collect()
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    NgramLm(m, m.values.sum, m.size.toLong, n)
  }

  /** (id, nll): mean add-one surprisal per n-gram window,
    * `-ln((count(g)+1) / (total+vocab+1))` averaged over the document's
    * windows and rounded to 2 — high = unlike the reference corpus (the
    * CCNet head/middle/tail cut is a quantile over exactly this score).
    * Per-window terms quantize through DECIMAL(30,9) before summing so
    * float addition order cannot move the result, and the ln ulp noise
    * (the only non-correctly-rounded op) dies in the final round(·,2).
    *
    * Scale shape: the scoring is [[graft.functions.NgramSurprisalExpr]]
    * — every model entry's surprisal pre-quantizes ONCE at plan
    * construction, each window is an in-place hash + binary search +
    * long add inside codegen, and nothing joins or shuffles; the whole
    * score fuses into the scan. (The naive formulation — a count-map
    * literal probed per window via `element_at` — is bit-identical but
    * O(model) PER LOOKUP: Spark scans map literals linearly, which
    * measured 12.8 s vs 1.3 s over the sf0.1 corpus. Parity between the
    * two formulations is property-pinned.) */
  def surprisalScore(df: DataFrame, idCol: String, textCol: String,
      lm: NgramLm): DataFrame = {
    val windows = greatest(length(col(textCol)) - lit(lm.n - 1), lit(1))
    df.select(col(idCol).as("id"),
      round(surprisalSumCol(col(textCol), lm).cast("double") /
        windows, 2).as("nll"))
  }

  /** Per-language routing — lang-id worth the name (the Cavnar-Trenkle
    * n-gram profile / langid.py design, public): one bounded char-ngram
    * LM per language, each trained on its labelled reference slice
    * ([[ngramLm]]); a document routes to the language whose model gives
    * it the LOWEST mean add-one surprisal, ties broken by label. The
    * argmin is `least` over `(nll, lang)` structs — lexicographic
    * struct comparison, so routing is deterministic and replayable by
    * an ANSI oracle on the same rounded scores.
    *
    * Scale shape: K bounded model literals fused into ONE scan (the
    * [[dsirLogRatio]] two-model pattern generalized), zero exchanges —
    * at 100 TB routing on 100+ languages is a pure map pass whose cost
    * is K in-place hash probes per window; only the K model trainings
    * aggregate, each one partial-agg'd gram shuffle over its reference
    * slice. */
  def langRoute(df: DataFrame, idCol: String, textCol: String,
      models: Seq[(String, NgramLm)]): DataFrame = {
    require(models.nonEmpty, "langRoute: need at least one language model")
    require(models.map(_._1).distinct.size == models.size,
      s"langRoute: duplicate language labels")
    require(models.map(_._2.n).distinct.size == 1,
      "langRoute: models must share the same n-gram width (scores under " +
        "different widths are not comparable)")
    val n = models.head._2.n
    val windows = greatest(length(col(textCol)) - lit(n - 1), lit(1))
    val cands = models.map { case (lab, lm) =>
      struct(
        round(surprisalSumCol(col(textCol), lm).cast("double") / windows, 2)
          .as("nll"),
        lit(lab).as("lang"))
    }
    val best = if (cands.size == 1) cands.head else least(cands: _*)
    df.select(col(idCol).as("id"), best.as("__best"))
      .select(col("id"), col("__best.lang").as("lang"),
        col("__best.nll").as("nll"))
  }

  /** Train the DSIR target and source LMs from ONE corpus scan: the
    * source model counts every gram, the target model only grams from
    * rows matching `targetFilter` — one explode + one partial-agg'd gram
    * exchange instead of two (the two-model sibling of [[ngramLm]];
    * equality with two separate trainings is suite-pinned). */
  def ngramLmPair(ref: DataFrame, textCol: String, targetFilter: Column,
      n: Int = 3): (NgramLm, NgramLm) = {
    val rows = ref.select(explode(graft.functions.CharNgramFunctions
        .charNgramsFast(col(textCol), n)).as("g"), targetFilter.as("__t"))
      .groupBy("g").agg(count(lit(1)).as("c"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("tc"))
      .collect()
    val src = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val tgt = rows.collect {
      case r if r.getLong(2) > 0 => r.getString(0) -> r.getLong(2)
    }.toMap
    (NgramLm(tgt, tgt.values.sum, tgt.size.toLong, n),
      NgramLm(src, src.values.sum, src.size.toLong, n))
  }

  /** The exact DECIMAL(30,9) per-document surprisal sum under `lm` as a
    * column (the [[NgramSurprisalExpr]] pre-quantized model path —
    * model entries quantize once at plan construction, each window is an
    * in-place hash + binary search + long add, zero shuffle). */
  private def surprisalSumCol(text: Column, lm: NgramLm): Column = {
    import graft.functions.NgramSurprisalExpr
    val denomD = (lm.total + lm.vocab + 1L).toDouble
    val entries = lm.counts.toArray.map { case (g, c) =>
      (NgramSurprisalExpr.gramHash(g),
        NgramSurprisalExpr.nll9(-math.log((c + 1L).toDouble / denomD)))
    }.sortBy(_._1)
    graft.functions.NgramSurprisalFunctions.surprisalSum(
      text, lm.n, entries.map(_._1), entries.map(_._2),
      NgramSurprisalExpr.nll9(-math.log(1.0 / denomD)))
  }

  /** DSIR-style importance log-ratio (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * `log w(x) = Σ_g log p_target(g) − Σ_g log p_raw(g)` over the
    * document's n-gram windows — DSIR's hashed-ngram bigram features
    * replaced by the repo's oracle-proven char-n-gram add-one LMs.
    * Documents that look more like the target corpus than the raw
    * corpus score high; a selection step resamples by this weight.
    * Emitted as `(id, log_w)` with `log_w = S_raw − S_tgt` (surprisal
    * sums, so the sign matches the probability-ratio form), rounded
    * to 2 after exact decimal subtraction.
    *
    * Determinism: both sums quantize per-window through DECIMAL(30,9)
    * ([[NgramSurprisalExpr]]), so the subtraction is exact long
    * arithmetic and addition order can never move the hash; the only
    * FP noise (ln's last ulp, once per MODEL ENTRY) dies in the final
    * round(·,2) exactly as in [[surprisalScore]].
    *
    * Scale shape: two bounded model literals (each O(|charset|^n),
    * independent of corpus size — the [[NgramLm]] bounded-model
    * argument), two fused codegen expressions over one scan, ZERO
    * shuffle. At 100 TB this is a streaming map pass; only the two
    * model trainings aggregate, each one partial-agg'd gram shuffle
    * over its reference slice. */
  def dsirLogRatio(df: DataFrame, idCol: String, textCol: String,
      target: NgramLm, source: NgramLm): DataFrame = {
    require(target.n == source.n,
      s"dsirLogRatio: model widths differ (${target.n} vs ${source.n})")
    // `+ 0.0` canonicalizes IEEE negative zero: a 1e-9 double→decimal
    // rounding-boundary skew between engines can land the difference at
    // -ε, whose round(·,2) is -0.0 — a hash mismatch against +0.0.
    df.select(col(idCol).as("id"),
      (round((surprisalSumCol(col(textCol), source)
        - surprisalSumCol(col(textCol), target)).cast("double"), 2) + lit(0.0))
        .as("log_w"))
  }

  /** Per-source reputation report — the domain-level quality gate of the
    * RefinedWeb / Dolma pipelines (there keyed by URL domain; here by the
    * corpus's `source` column): for each source its document count, its
    * duplication rate (share of docs whose content fingerprint appears
    * more than once ACROSS the corpus — a high rate marks a mirror or
    * scraper trap), and its mean stopword ratio (a low mean marks
    * keyword-stuffed or non-prose sources), plus a keep flag at
    * `dupRate <= maxDupRate AND meanStopword >= minStopword`.
    * Downstream, docs from flagged sources are
    * dropped wholesale — cheaper than per-doc scoring and catches
    * systematic junk per-doc filters miss.
    *
    * Determinism: per-doc stopword ratios are already round(·,4)
    * quantized; they sum as DECIMAL(20,6) so addition order cannot move
    * the mean (the dsum pattern).
    *
    * Scale shape: one fingerprint-keyed exchange for the corpus-wide
    * duplicate counts (partial-agg'd groupBy + join-back, not a window —
    * a viral duplicate combines map-side instead of pinning one task),
    * then one partial-agg'd exchange on the source key; the report is
    * O(#sources). */
  def sourceReputation(df: DataFrame, srcCol: String, textCol: String,
      stopwords: Seq[String], maxDupRate: Double,
      minStopword: Double): DataFrame =
    // ONE report definition: the one-shot IS the fold of a single batch
    // (the fold-equals-one-shot law as an identity, not a discipline —
    // a rounding or keep-predicate edit can no longer diverge the two
    // paths). Decimal equivalence: summing each doc's round(·,4) ratio
    // equals summing ratio × copy-count over distinct texts exactly.
    sourceReputationFromState(
      sourceFpBatch(df, srcCol, textCol, stopwords), maxDupRate, minStopword)

  /** One batch's contribution to the cross-batch source-reputation state
    * (the [[lineIndex]] discipline applied to the domain gate): one row
    * per distinct `(fingerprint, source)` with its copy count and the
    * text's stopword ratio — `(fp, source, cnt, sr)`, ~50 bytes/distinct
    * text, the text itself never persisted or re-read. `sr` is
    * functionally dependent on the fingerprint (same bytes → same
    * ratio), so it rides the fingerprint row instead of a per-source
    * counter and the state stays mergeable by plain summation.
    * Duplicate decisions derive from fingerprint TOTALS at report time,
    * which is what makes the gate incremental at all: a batch-2 copy of
    * a batch-1 text retroactively turns the OLD doc into a dup — no
    * per-source counter can represent that, only the fingerprint index
    * can ([[sourceReputation]]'s corpus-wide rate reproduced exactly;
    * the fold-equals-one-shot law is oracle-gated at
    * `d_source_reputation_incr`).
    *
    * Persist under [[graft.state.HistoryFormat.SourceReputationFp]] —
    * the STOPWORD LIST is part of the format identity (see the marker
    * doc). Fold: `mergeSourceFp(history.unionByName(batch))`, idempotent
    * shape; report any time via [[sourceReputationFromState]].
    *
    * Scale shape: one partial-agg'd exchange keyed by (fp, source) —
    * a viral duplicate combines map-side; state is O(distinct texts). */
  def sourceFpBatch(df: DataFrame, srcCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame =
    df.select(col(srcCol).as("source"), md5(col(textCol)).as("fp"),
        graft.functions.TextFunctions.stopwordRatio(col(textCol), stopwords)
          .as("sr"))
      .groupBy("fp", "source")
      .agg(count(lit(1)).as("cnt"), max(col("sr")).as("sr"))

  /** Re-aggregate a union of [[sourceFpBatch]] states back to one row
    * per `(fp, source)` — the fold step. `max(sr)` is exact, not a
    * tie-break: equal fingerprints mean equal bytes mean equal ratios. */
  def mergeSourceFp(state: DataFrame): DataFrame =
    state.groupBy("fp", "source")
      .agg(sum(col("cnt")).as("cnt"), max(col("sr")).as("sr"))

  /** The [[sourceReputation]] report derived from accumulated
    * [[sourceFpBatch]] state alone — corpus text never re-read. A
    * fingerprint is a duplicate when its copy count ACROSS ALL SOURCES
    * exceeds 1 (the corpus-wide rule: a mirror duplicating another
    * source's docs is precisely the signal); each source is charged its
    * own copies of that fingerprint. Same rounding/decimal recipe as
    * the one-shot, so fold(b1) ⊕ fold(b2) == one-shot(b1 ∪ b2)
    * bit-for-bit.
    *
    * Scale shape: one fp-keyed partial-agg'd exchange for the totals
    * (state rows, not corpus rows), a join-back on fp, then the
    * O(#sources) source-keyed aggregate — all inputs are index-sized. */
  def sourceReputationFromState(state: DataFrame, maxDupRate: Double,
      minStopword: Double): DataFrame = {
    val merged = mergeSourceFp(state)
    val totals = merged.groupBy("fp").agg(sum(col("cnt")).as("__tot"))
    merged.join(totals, Seq("fp"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum(when(col("__tot") > 1, col("cnt")).otherwise(0L)).as("__ndup"),
        sum(col("sr").cast(org.apache.spark.sql.types.DecimalType(20, 6))
          * col("cnt")).as("__srsum"))
      .select(col("source"), col("n_docs"),
        round(col("__ndup").cast("double") / col("n_docs"), 4).as("dup_rate"),
        round(col("__srsum").cast("double") / col("n_docs"), 4)
          .as("mean_stopword_ratio"),
        ((round(col("__ndup").cast("double") / col("n_docs"), 4) <= maxDupRate)
          && (round(col("__srsum").cast("double") / col("n_docs"), 4)
            >= minStopword)).as("keep"))
  }

  /** [[sourceReputationFromState]] reading the persisted state from its
    * table directory — validates the
    * [[graft.state.HistoryFormat.SourceReputationFp]] marker BEFORE any
    * read (the HistoryEnforcementSuite rule). */
  def sourceReputationFromStateTable(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, maxDupRate: Double, minStopword: Double): DataFrame = {
    graft.state.HistoryFormat.ensure(spark.sparkContext.hadoopConfiguration,
      stateDir, graft.state.HistoryFormat.SourceReputationFp, hasData = true)
    sourceReputationFromState(spark.read.parquet(stateDir), maxDupRate,
      minStopword)
  }

  /** Frequency-ranked word vocabulary from a reference slice — the
    * training step of [[tokenizeToIds]]. Ids are 1-based ranks under the
    * total (count DESC, token ASC) order, so the mapping is deterministic
    * under ties and reproducible across engines. One partial-agg'd
    * exchange on the token key; the collect is the O(size) model itself
    * (the quantizer-centroid contract — the vocabulary IS driver state,
    * like every tokenizer ships its vocab file). */
  def buildWordVocab(ref: DataFrame, textCol: String,
      size: Int): Seq[(String, Int)] = {
    require(size > 0, "vocab size must be positive")
    ref.select(explode(split(col(textCol), " ", -1)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(size)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getString(0), i + 1) }.toSeq
  }

  /** Map every document to its token-id sequence under a fixed
    * vocabulary — the step between token counting and sequence packing:
    * ids, not counts, are what a training export materializes. Map-only
    * (zero exchanges: the vocab rides into codegen as a reference
    * object, [[graft.functions.VocabIdsExpr]]); out-of-vocabulary tokens
    * map to `unk`, and `n_oov` makes the vocabulary's coverage a
    * per-document signal (an OOV-heavy doc under an in-domain vocab is a
    * domain-shift flag). The corpus never shuffles. */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Int)], unk: Int = 0): DataFrame = {
    require(!vocab.exists(_._2 == unk),
      s"unk id $unk collides with a vocabulary id — n_oov would miscount")
    df.select(col(idCol),
        graft.functions.VocabFunctions.vocabIds(col(textCol), vocab, unk)
          .as("ids"))
      .select(col(idCol), col("ids"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(filter(col("ids"), x => x === lit(unk))).cast("long").as("n_oov"))
  }

  /** Fill-in-the-middle (FIM) sample construction over a token-id array
    * (Bavarian et al. 2207.14255, PSM order): where `applyFim` holds,
    * the sequence [P, M, S] reorders to [pre] P [suf] S [mid] M with
    * sentinel ids riding in-band (negative by convention — real vocab
    * ids are positive, so no reservation is needed); elsewhere the
    * autoregressive sequence passes through unchanged. Boundary columns
    * are CALLER policy (deterministic arithmetic, a hash draw, a
    * curriculum) — the operator is the pure slicing/reorder, map-only
    * codegen HOFs, zero exchanges. Caller contract where `applyFim`:
    * `1 <= a < b < size(ids)` — all three parts nonempty. */
  def fimReorder(ids: Column, a: Column, b: Column, applyFim: Column,
      preTok: Int = -1, sufTok: Int = -2, midTok: Int = -3): Column = {
    val ai = a.cast("int"); val bi = b.cast("int")
    val n = size(ids)
    val prefix = slice(ids, lit(1), ai)
    val middle = slice(ids, ai + 1, bi - ai)
    val suffix = slice(ids, bi + 1, n - bi)
    when(applyFim,
      concat(array(lit(preTok)), prefix, array(lit(sufTok)), suffix,
        array(lit(midTok)), middle))
      .otherwise(ids)
  }

  /** Decode direction of [[tokenizeToIds]]: ids back to tokens under the
    * same vocabulary — the debugging/inspection path every tokenizer
    * ships. Ids are dense 1-based ranks, so decode is O(1) literal-array
    * indexing per token (no join, no map scan); `unk` ids render as
    * `unkToken`. Round trip: for a document with zero OOV,
    * `array_join(idsToTokens(tokenizeToIds(text)), ' ') == text` exactly
    * (suite- and oracle-pinned). Map-only, zero exchanges. */
  def idsToTokens(ids: Column, vocab: Seq[(String, Int)],
      unkToken: String = "<unk>"): Column = {
    val maxId = if (vocab.isEmpty) 0 else vocab.map(_._2).max
    // element_at is 1-based: slot id-1 of the literal array holds id's token
    val table = Array.fill(maxId)(unkToken)
    vocab.foreach { case (t, id) =>
      require(id >= 1 && id <= maxId, s"vocab ids must be dense 1-based, got $id")
      table(id - 1) = t
    }
    transform(ids, id =>
      when(id >= 1 && id <= maxId, element_at(typedlit(table.toSeq), id))
        .otherwise(lit(unkToken)))
  }

  /** Vocabulary coverage drift for a new batch — the staleness signal
    * of the persisted-vocab discipline, mirroring
    * [[Similarity.quantizerDrift]] for the similarity family: a vocab
    * built once degrades silently when the corpus moves (new domain,
    * new language, new jargon), and rising OOV is the measurable
    * symptom. One row: token totals, corpus-level `oov_rate`,
    * `frac_high` (share of documents whose own OOV rate exceeds
    * `maxDocOov`), and `rebuild` when that share exceeds
    * `maxHighFrac`. Map-only tokenization + one global aggregate; the
    * batch never shuffles. */
  def vocabDrift(batch: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Int)], maxDocOov: Double,
      maxHighFrac: Double): DataFrame =
    tokenizeToIds(batch, idCol, textCol, vocab)
      .select(col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") /
          greatest(col("n_tokens"), lit(1L)) > maxDocOov).as("high"))
      // Empty-batch contract (the quantizerDrift discipline): zero rows
      // is not drift evidence — coalesce NULL sums to 0 and guard the
      // frac_high divisor so rebuild reads false, never NULL.
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_oov")), lit(0L)).as("n_oov"),
        round(coalesce(sum(col("n_oov")), lit(0L)).cast("double") /
          greatest(sum(col("n_tokens")), lit(1L)), 4).as("oov_rate"),
        round(coalesce(sum(when(col("high"), 1L).otherwise(0L)), lit(0L))
          .cast("double") / greatest(count(lit(1)), lit(1L)), 4)
          .as("frac_high"))
      .withColumn("rebuild", col("frac_high") > maxHighFrac)

  /** Persist / restore a vocabulary as a tiny parquet table — the
    * incremental-index state, like the IVF quantizer: build ONCE on a
    * reference slice, then tokenize every later batch under the SAME
    * mapping so id sequences stay mutually comparable. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession, path: String,
      vocab: Seq[(String, Int)]): Unit = {
    import spark.implicits._
    vocab.toDF("tok", "id").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Int)] =
    spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq

  /** Importance resampling over a log-weight column — the SELECTION step
    * DSIR ends with (keep each document with probability ∝ exp(logw),
    * Xie et al. 2302.03169 §2): [[dsirLogRatio]] scores, this draws.
    *
    * Cross-engine-exact by construction: log-weights quantize into FIXED
    * driver-declared bins (floor arithmetic on the exact score — no
    * data-dependent quantiles, no corpus-wide window), each bin's
    * acceptance probability exp(mid - topMid) is evaluated ONCE on the
    * driver and rides into BOTH plans as an integer threshold literal
    * (the only transcendental runs outside either engine — the
    * temperatureSample discipline: engines compare exact integers, so no
    * libm ulp can flip a boundary row), and the per-row draw is the
    * portable [[Mixing.minstd]] hash. Map-only; the corpus never
    * shuffles; acceptance is a pure function of (id, logw, seed).
    *
    * Emits the accepted rows with their `bin` and the applied
    * `threshold` (audit columns). Rows below `lrMin` clamp into bin 0,
    * above `lrMax` into the top bin (probability 1·`scale`). */
  def importanceResample(df: DataFrame, idCol: String, logwCol: String,
      lrMin: Double, lrMax: Double, binWidth: Double,
      scale: Double = 1.0, seed: Long = 41L): DataFrame = {
    require(lrMax > lrMin && binWidth > 0, "degenerate bin spec")
    require(scale > 0 && scale <= 1, s"scale must be in (0,1], got $scale")
    val nBins = math.ceil((lrMax - lrMin) / binWidth).toInt
    val thresholds = importanceThresholds(lrMin, lrMax, binWidth, scale)
    val bin = least(greatest(
      floor((col(logwCol) - lit(lrMin)) / lit(binWidth)).cast("int"),
      lit(0)), lit(nBins - 1))
    val u = pmod(Mixing.minstd(col(idCol), seed) - 1, lit(1000000L))
    df.withColumn("bin", bin)
      .withColumn("threshold",
        element_at(typedlit(thresholds), col("bin") + 1))
      .filter(u < col("threshold"))
  }

  /** The threshold literals [[importanceResample]] embeds — exposed so an
    * oracle (or an audit) can replay the identical acceptance rule. */
  def importanceThresholds(lrMin: Double, lrMax: Double, binWidth: Double,
      scale: Double = 1.0): Seq[Long] = {
    val nBins = math.ceil((lrMax - lrMin) / binWidth).toInt
    val topMid = lrMin + (nBins - 0.5) * binWidth
    (0 until nBins).map { b =>
      val mid = lrMin + (b + 0.5) * binWidth
      math.round(math.min(1.0, math.exp(mid - topMid)) * scale * 1e6)
    }
  }

  /** Mixture accounting: per-stratum document and token counts plus each
    * stratum's share of the corpus's tokens — the report a mixing step
    * is tuned against. One partial-agg shuffle on the stratum key; the
    * share division happens on the tiny aggregated frame (broadcast-size
    * window, bounded by the stratum count). */
  def mixtureReport(df: DataFrame, strataCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // single-space split = the repo-wide token convention (mirrors
    // DuckDB's STRING_SPLIT(text, ' ') exactly, same as d_token_count)
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ", -1))).as("n_tokens"))
      .withColumn("token_share",
        round(col("n_tokens") / sum(col("n_tokens"))
          .over(Window.partitionBy()), 6))
  }

  /** Cohen's kappa agreement between two boolean raters over the same
    * rows — the QC that decides whether a cheap gate can stand in for an
    * expensive one (rule gate vs learned gate, scorer v1 vs v2, human
    * sample vs classifier): raw agreement `po` overstates whenever the
    * keep rate is lopsided; kappa subtracts the chance agreement `pe`
    * the raters' marginal rates alone would produce.
    *
    * One row: `n`, the 2×2 confusion counts (exact longs from ONE
    * partial-agg'd global aggregate — the raters are column expressions,
    * so the corpus never shuffles), `po`/`pe` rounded for display, and
    * `kappa = round((po - pe)/(1 - pe), 4)` computed as a single double
    * tree over the exact counts — both engines replay it bit-for-bit.
    * Edge contract: `degenerate` marks pe = 1 (both raters constant —
    * kappa undefined, emitted 0.0) and the empty input (all zeros,
    * kappa 0.0, never NULL). Rows where EITHER rater is NULL (missing
    * label, or a value that doesn't cast to boolean) are excluded
    * BEFORE the aggregate, so `n` always equals the sum of the four
    * confusion cells — an unlabeled row must not dilute po/pe. */
  def raterAgreement(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val counted = df
      .select(aCol.cast("boolean").as("__a"), bCol.cast("boolean").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__a") && col("__b"), 1L).otherwise(0L)),
          lit(0L)).as("n11"),
        coalesce(sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)),
          lit(0L)).as("n10"),
        coalesce(sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)),
          lit(0L)).as("n01"),
        coalesce(sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)),
          lit(0L)).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    // marginal-rate form, each count/n divided BEFORE multiplying — the
    // n² cross products would wrap 64-bit past ~3e9 rows per rater cell
    val pe = ((col("n11") + col("n10")).cast("double") / nD) *
      ((col("n11") + col("n01")).cast("double") / nD) +
      ((col("n01") + col("n00")).cast("double") / nD) *
      ((col("n10") + col("n00")).cast("double") / nD)
    counted.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(col("n") > 0L, round(po, 4)).otherwise(lit(0d)).as("po"),
      when(col("n") > 0L, round(pe, 4)).otherwise(lit(0d)).as("pe"),
      when(col("n") > 0L && pe < 1d, round((po - pe) / (lit(1d) - pe), 4))
        .otherwise(lit(0d)).as("kappa"),
      (col("n") === 0L || (col("n") > 0L && pe === 1d)).as("degenerate"))
  }

  /** Fixed-iteration PageRank over a directed graph — the authority
    * score crawl pipelines prioritize domains by (Common-Crawl-style
    * host ranking; the graph sibling of
    * [[graft.operators.Dedup.connectedComponents]]). ALL-INTEGER: ranks
    * live in 1e-9 units (BIGINT), each iteration is
    *   `r'(v) = 15·base div 100 + 85·(Σ_{u→v} r(u) div outdeg(u)) div 100`
    * with `base = 10^9 div N` — every step is integer floor arithmetic,
    * so a fixed iteration count is REPLAYABLE BIT-FOR-BIT by any engine
    * (no float accumulation, no convergence test; floor rounding leaks
    * ~1 unit of mass per division, documented and deterministic).
    * Dangling nodes' mass is dropped (they contribute nothing); nodes
    * with no in-edges hold the teleport share. Parallel edges count
    * once per row — pass a distinct edge set for simple-graph semantics.
    *
    * Scale shape: each iteration is one src-keyed join (ranks are
    * (node, r9) rows — narrow) + one partial-agg'd exchange on dst.
    * The edge set and each iteration's ranks CHECKPOINT under the
    * caller-supplied `checkpoint` policy (the standard
    * iterative-algorithm discipline — without truncation the rank
    * lineage nests a copy of the whole prior plan per iteration and
    * the edge derivation recomputes ~2·iterations times; measured 3.1 s
    * → flat on the bench graph). The default `localCheckpoint` fits a
    * single stable JVM; at cluster scale with executor churn pass a
    * reliable-checkpoint policy (`_.checkpoint()` under a configured
    * checkpoint dir), and on a deliberately tiny graph where the ~8
    * eager checkpoint jobs outweigh the recompute, pass `identity` —
    * the policy changes lineage and fixed job count only, NEVER the
    * arithmetic (suite-pinned: identity == default bit-for-bit).
    * Output: `(node, r9, rank)` — `rank` the single terminal double
    * division, rounded at 6. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3,
      checkpoint: DataFrame => DataFrame = _.localCheckpoint()): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, prior = None,
      checkpoint = checkpoint)

  /** Warm-start (delta-edge) PageRank — the incremental shape: crawl
    * graphs grow by edge batches, and re-iterating from uniform every
    * run throws away yesterday's converged answer. `prior` is a
    * `(node, r9)` rank table (a previous [[pageRank]]/[[pageRankWarm]]
    * output — extra columns ignored); known nodes seed from it, NEW
    * nodes (in today's edge set but not the prior) take the teleport
    * share `10^9 div N` under the CURRENT node count, and the same
    * fixed integer iterations run from that init — so a batch of new
    * edges costs the same iterations but converges from yesterday's
    * answer instead of from scratch. Prior nodes absent from today's
    * graph drop (ranks are per current graph; the prior is only the
    * seed). Identity law (suite-pinned): on a static graph a uniform
    * prior replays [[pageRank]] bit-for-bit — warm-starting changes the
    * INIT, never the arithmetic, so the oracle unrolls both stages as
    * the same CTE chain. */
  def pageRankWarm(edges: DataFrame, srcCol: String, dstCol: String,
      prior: DataFrame, iterations: Int = 3,
      checkpoint: DataFrame => DataFrame = _.localCheckpoint()): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, prior = Some(prior),
      checkpoint = checkpoint)

  private def pageRankCore(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int, prior: Option[DataFrame],
      checkpoint: DataFrame => DataFrame): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = checkpoint(edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull))
    val nodes = checkpoint(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct())
    // ONE driver-side node count (a single long — the accepted
    // model-sized scalar read; GraphX counts vertices the same way).
    // The previous crossJoin(broadcast(nTot)) scalar attach re-built
    // the count subquery in EVERY iteration's post-checkpoint plan —
    // four broadcast jobs per run whose only payload was this long.
    // The literal substitutes into the identical `div` arithmetic, so
    // ranks are bit-identical (oracle-gated); n == 0 folds the constant
    // to the same NULL the scalar attach produced, over zero rows.
    val n = nodes.count()
    val share9 = s"(1000000000L div ${n}L)"
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = prior match {
      case None => nodes.select(col("node"), expr(share9).as("r9"))
      case Some(p) =>
        // seed from the prior where known, teleport share elsewhere; the
        // localCheckpoint cuts the prior's (possibly whole-prior-run)
        // lineage out of this run's plans. A duplicate node in the prior
        // would multiply the seeded row and silently double-count every
        // contribution it makes — refuse loudly via a filter-borne guard
        // over the same node-keyed exchange the join already pays (a
        // projected guard could be pruned; a filter cannot)
        val dupW = org.apache.spark.sql.expressions.Window
          .partitionBy("node").orderBy(col("__prior"))
        checkpoint(nodes
          .join(p.select(col("node"), col("r9").as("__prior")),
            Seq("node"), "left")
          .withColumn("__rn", row_number().over(dupW))
          .filter(when(col("__rn") > 1,
            raise_error(concat(lit("pageRankWarm: duplicate prior rank " +
                "for node "), col("node").cast("string"),
              lit(" — the prior must hold one (node, r9) row per node; " +
                "aggregate or dedupe it before warm-starting")))
              .cast("boolean"))
            .otherwise(lit(true)))
          .select(col("node"),
            coalesce(col("__prior"), expr(share9)).as("r9")))
    }
    (1 to iterations).foreach { i =>
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), expr("r9 div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in9"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .na.fill(0L, Seq("in9"))
        .select(col("node"),
          (expr(s"15L * $share9 div 100") +
            expr("85L * in9 div 100")).as("r9"))
      // truncate lineage between iterations, not after the last — the
      // caller's plan starts from the final ranks either way
      ranks = if (i < iterations) checkpoint(next) else next
    }
    ranks.select(col("node"), col("r9"),
      round(col("r9").cast("double") / lit(1e9), 6).as("rank"))
  }

  /** Precision/recall/F1 of a binary gate against ground truth — the
    * standard numbers a classifier gate ships with beside
    * [[raterAgreement]]'s chance-corrected kappa (kappa answers "do two
    * raters agree"; this answers "how does the gate err against truth":
    * precision = kept docs that deserved it, recall = deserving docs
    * actually kept). One row of exact confusion counts from ONE
    * partial-agg'd global aggregate (both columns are expressions over
    * the same scan — the corpus never shuffles), then one double tree
    * per ratio. Empty/one-class edges read 0.0, never NULL: a
    * truth-less batch must not crash a QC dashboard. F1 spelled as
    * 2tp/(2tp+fp+fn) — ONE division, no nested harmonic mean.
    * NULL policy (matches [[raterAgreement]]): rows where truth or
    * prediction is NULL are excluded BEFORE the aggregate, so
    * `accuracy = (tp+tn)/n` and precision/recall count the same rows —
    * one policy, not two (a NULL label in `n` but no cell would
    * silently dilute accuracy while P/R ignore it). */
  def gateEval(df: DataFrame, truthCol: Column, predCol: Column): DataFrame = {
    val counted = df
      .select(truthCol.cast("boolean").as("__t"),
        predCol.cast("boolean").as("__p"))
      .filter(col("__t").isNotNull && col("__p").isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__t") && col("__p"), 1L).otherwise(0L)),
          lit(0L)).as("tp"),
        coalesce(sum(when(!col("__t") && col("__p"), 1L).otherwise(0L)),
          lit(0L)).as("fp"),
        coalesce(sum(when(col("__t") && !col("__p"), 1L).otherwise(0L)),
          lit(0L)).as("fn"),
        coalesce(sum(when(!col("__t") && !col("__p"), 1L).otherwise(0L)),
          lit(0L)).as("tn"))
    counted.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0L, round(col("tp").cast("double") /
        (col("tp") + col("fp")), 4)).otherwise(lit(0d)).as("precision"),
      when(col("tp") + col("fn") > 0L, round(col("tp").cast("double") /
        (col("tp") + col("fn")), 4)).otherwise(lit(0d)).as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        round((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")), 4))
        .otherwise(lit(0d)).as("f1"),
      when(col("n") > 0L, round((col("tp") + col("tn")).cast("double") /
        col("n"), 4)).otherwise(lit(0d)).as("accuracy"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-batch behavioral analytics over the event stream — the
  * incremental siblings of the batch cohort-retention and sequential-
  * funnel queries (which recompute from the full event history every
  * run; a product pipeline consumes event batches).
  *
  * Both families follow the repo's incremental discipline: the raw
  * event stream folds into a BOUNDED per-user state table (activity
  * pairs for retention, stage timestamps for the funnel), each batch is
  * one user-keyed fold, the report recomputes from state alone —
  * O(users·days) and O(users), never O(events) — and persisted state
  * carries a [[graft.state.HistoryFormat]] marker so a derivation
  * change refuses loudly instead of silently mis-joining.
  */
object Behavioral {

  // ----- cohort retention ---------------------------------------------------

  /** A batch's distinct `(user_id, period)` day-activity pairs — the
    * unit the retention state accumulates. `yyyy-MM-dd` day truncation
    * is part of the persisted format ([[graft.state.HistoryFormat.CohortActivity]]). */
  def activityPairs(events: DataFrame, userCol: Column,
      tsCol: Column): DataFrame =
    events.select(userCol.cast("long").as("user_id"),
        date_format(date_trunc("day", tsCol), "yyyy-MM-dd").as("period"))
      .distinct()

  /** The batch fold: activity pairs of `batch` NOT already in the
    * history — append these to the state table between batches (the
    * [[Similarity.prunedCounts]] append discipline). One anti-join keyed
    * on the pair; the history never re-aggregates. Idempotent: re-folding
    * a replayed batch appends nothing. */
  def activityFold(history: DataFrame, batch: DataFrame, userCol: Column,
      tsCol: Column): DataFrame =
    activityPairs(batch, userCol, tsCol)
      .join(history, Seq("user_id", "period"), "left_anti")

  /** The retention report from the accumulated activity matrix: cohort =
    * each user's first active day, one row per (cohort, period) cell
    * with the active count, cohort size, and their ratio. Identical to
    * the batch query over the full event stream because the state IS the
    * deduped (user, period) matrix — the fold loses nothing the report
    * needs.
    *
    * Scale shape: one user-keyed aggregate for cohorts, one
    * (cohort, period) partial-agg'd cell count, cohort sizes broadcast
    * into the cells; state is O(users·active days), not O(events). */
  def cohortRetention(activity: DataFrame): DataFrame = {
    val first = activity.groupBy("user_id").agg(min("period").as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    activity.join(first, Seq("user_id"))
      .groupBy("cohort", "period")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("period"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }

  /** The retention CURVE — [[cohortRetention]]'s triangle collapsed to
    * one row per day offset ("how much of any cohort is still active N
    * days in", the number a dashboard actually plots): each (cohort,
    * period) cell maps to `offset = datediff(period, cohort)`, then
    * offsets POOL exact counts across cohorts —
    * `retention = Σ n_active / Σ cohort_size` over the cohorts that
    * have REACHED that offset (cohort + offset ≤ the newest observed
    * period; younger cohorts can't vote on horizons they haven't
    * lived). Pooled exact longs with ONE terminal division — never an
    * average of per-cohort ratios, which would both weight cohorts
    * wrongly and sum doubles in engine-dependent order.
    *
    * Scale shape: cells from [[cohortRetention]]'s aggregates, one
    * more partial-agg'd exchange on the offset, the 1-row max-period
    * scalar broadcast-joined in. */
  def retentionByOffset(activity: DataFrame): DataFrame = {
    val cells = cohortRetention(activity)
      .withColumn("day_offset",
        datediff(to_date(col("period")), to_date(col("cohort"))))
    // a cell's offset never exceeds its cohort's age (period <= the
    // horizon by construction), so the capacity side alone decides
    // which offsets exist — including all-churned offsets with ZERO
    // active cells, which must still report retention 0
    val horizon = activity.agg(max("period").as("__maxp"))
    val active = cells.groupBy("day_offset")
      .agg(sum("n_active").as("n_active"))
    val capacity = cells.filter(col("day_offset") === 0)
      .select(col("cohort"), col("cohort_size"))
      .crossJoin(broadcast(horizon))
      .select(col("cohort_size"),
        explode(sequence(lit(0),
          datediff(to_date(col("__maxp")), to_date(col("cohort")))))
          .as("day_offset"))
      .groupBy("day_offset")
      .agg(count(lit(1)).as("n_cohorts"),
        sum("cohort_size").as("n_capacity"))
    capacity.join(active, Seq("day_offset"), "left")
      .na.fill(0L, Seq("n_active"))
      .select(col("day_offset"), col("n_cohorts"), col("n_active"),
        col("n_capacity"),
        round(col("n_active").cast("double") / col("n_capacity"), 4)
          .as("retention"))
  }

  /** [[activityFold]] against a persisted activity table — the
    * path-taking probe enforces the
    * [[graft.state.HistoryFormat.CohortActivity]] marker. */
  def activityFoldTable(batch: DataFrame, userCol: Column, tsCol: Column,
      historyPath: String): DataFrame =
    activityFold(graft.state.HistoryTables.readChecked(
        batch.sparkSession, historyPath,
        graft.state.HistoryFormat.CohortActivity),
      batch, userCol, tsCol)

  /** [[cohortRetention]] over a persisted activity table (marker-checked). */
  def cohortRetentionTable(spark: org.apache.spark.sql.SparkSession,
      historyPath: String): DataFrame =
    cohortRetention(graft.state.HistoryTables.readChecked(spark,
      historyPath, graft.state.HistoryFormat.CohortActivity))

  // ----- sequential funnel --------------------------------------------------

  /** Stage-timestamp column name for 1-based stage `i`. */
  private def tCol(i: Int) = s"t$i"

  /** Fold one event batch into the per-user funnel state. State schema:
    * `(user_id, t1 … tk, max_ts)` — `t_i` the timestamp at which the
    * user completed stage `i` (the first stage-`i` event strictly after
    * `t_{i-1}`), `max_ts` the newest event folded for the user (the
    * ordering watermark). `state = None` bootstraps (first batch).
    *
    * Ordering contract — REFUSES LOUDLY when violated: the fold is only
    * equal to the batch recomputation when batches arrive in event-time
    * order per user (a stage decision, once made, is never re-opened —
    * the whole point of keeping O(users) state instead of the events).
    * A batch event older than the user's `max_ts` raises with the
    * replay remedy. Events AT `max_ts` are fine (never lost: the fold's
    * strict `>` comparisons treat them the same in either batch).
    *
    * `maxGap` bounds each step: stage `i` must land within `maxGap` of
    * `t_{i-1}` (`t_{i-1} < ts <= t_{i-1} + maxGap` — an interval
    * expression, e.g. `expr("INTERVAL 5 DAYS")`). The fold stays
    * batch-equal WITHOUT tombstone state: under the event-time-ordered
    * contract, once a step's window has expired every later batch's
    * candidates are even later, so the bounded filter keeps rejecting
    * them — permanent failure is representable as "still NULL" for free.
    *
    * Scale shape: one per-user envelope aggregate plus one user-keyed
    * join per stage, each stage candidate partial-agg'd map-side before
    * its exchange; every exchange keys on `user_id`, so AQE reuses the
    * partitioning down the chain. State is O(users). */
  def funnelFold(state: Option[DataFrame], batch: DataFrame,
      userCol: Column, typeCol: Column, tsCol: Column,
      stages: Seq[String], maxGap: Option[Column] = None): DataFrame = {
    require(stages.nonEmpty, "funnelFold: empty stage list")
    require(stages.distinct.length == stages.length,
      s"funnelFold: duplicate stage in ${stages.mkString(",")}")
    val k = stages.length
    state.foreach { st =>
      (Seq("user_id", "max_ts") ++ (1 to k).map(tCol)).foreach(c =>
        require(st.columns.contains(c),
          s"funnelFold: state is missing column '$c' — built for a " +
            s"different stage list than ${stages.mkString(",")}?"))
    }
    val ev = batch
      .select(userCol.cast("long").as("user_id"), typeCol.as("__type"),
        tsCol.as("__ts"))
      .filter(col("__type").isin(stages: _*))
    val env = ev.groupBy("user_id")
      .agg(min("__ts").as("__bmin"), max("__ts").as("__bmax"))
    val tsType = ev.schema("__ts").dataType.catalogString
    val base = state match {
      case Some(st) => st.join(env, Seq("user_id"), "full_outer")
      case None =>
        // bootstrap: no prior state — synthesize NULL stage columns so
        // the per-stage chain below is the single code path
        env.select(col("user_id") +:
          (1 to k).map(i => lit(null).cast(tsType).as(tCol(i))) :+
          lit(null).cast(tsType).as("max_ts") :+
          col("__bmin") :+ col("__bmax"): _*)
    }
    // out-of-order batch = silent corruption of closed stage decisions →
    // refuse loudly. The guard is a FILTER predicate, not a projected
    // column: a guard riding a projected column (say max_ts) would be
    // deleted by column pruning whenever the consumer doesn't read it —
    // funnelReport reads only t1..tk, exactly that shape. A filter
    // evaluates for every row and cannot prune.
    val guarded = base
      .filter(when(col("__bmin") < col("max_ts"),
        raise_error(concat(
          lit("funnelFold: out-of-order batch — user "),
          col("user_id").cast("string"), lit(" has a batch event at "),
          col("__bmin").cast("string"),
          lit(" older than the folded watermark "),
          col("max_ts").cast("string"),
          lit("; feed batches in event-time order or rebuild the " +
            "funnel state from the full stream"))).cast("boolean"))
        .otherwise(lit(true)))
      // greatest skips NULLs: a state-only user keeps max_ts, a new
      // user takes the batch envelope
      .withColumn("max_ts", greatest(col("max_ts"), col("__bmax")))
    val folded = (1 to k).foldLeft(guarded) { (cur, i) =>
      val cand = {
        val staged = ev.filter(col("__type") === stages(i - 1))
        val reachable =
          if (i == 1) staged
          else staged
            .join(cur.select(col("user_id"), col(tCol(i - 1)).as("__prev")),
              Seq("user_id"))
            .filter(col("__ts") > col("__prev") &&
              maxGap.map(g => col("__ts") <= col("__prev") + g)
                .getOrElse(lit(true)))
        reachable.groupBy("user_id").agg(min("__ts").as(s"__b$i"))
      }
      cur.join(cand, Seq("user_id"), "left")
        .withColumn(tCol(i), coalesce(col(tCol(i)), col(s"__b$i")))
        .drop(s"__b$i")
    }
    folded.select(col("user_id") +: (1 to k).map(c => col(tCol(c))) :+
      col("max_ts"): _*)
  }

  /** Resolve a report column whose NAME embeds a caller stage string —
    * dotted event-type names (`page.view`) are standard in product
    * analytics, and a bare `col("n_page.view")` would parse as struct
    * access (the [[Profile]] topCol rule). */
  private def nCol(stage: String) =
    col("`n_" + stage.replace("`", "``") + "`")

  /** The funnel report from the per-user stage state: one row of stage
    * counts (`n_<stage>`) plus step conversions (`<prev>_to_<next>`) and
    * the end-to-end `full_funnel` ratio — exact longs, one rounded
    * double tree each, 0-denominators read as ratio-over-1 (a stageless
    * batch must not crash a dashboard). One global aggregate. */
  def funnelReport(state: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelReport: empty stage list")
    val k = stages.length
    val counts = state.agg(
      count(col(tCol(1))).as(s"n_${stages.head}"),
      (2 to k).map(i => count(col(tCol(i))).as(s"n_${stages(i - 1)}")): _*)
    val steps = (1 until k).map { i =>
      round(nCol(stages(i)).cast("double") /
        greatest(nCol(stages(i - 1)), lit(1L)), 4)
        .as(s"${stages(i - 1)}_to_${stages(i)}")
    }
    val full =
      if (k == 1) Seq.empty
      else Seq(round(nCol(stages(k - 1)).cast("double") /
        greatest(nCol(stages.head), lit(1L)), 4).as("full_funnel"))
    counts.select(stages.map(nCol) ++ steps ++ full: _*)
  }

  /** Sidecar file recording WHICH stage list a persisted funnel state
    * was built for — the [[graft.state.HistoryFormat.FunnelStages]]
    * marker guards the derivation SHAPE, but two same-arity stage lists
    * (view/click/purchase vs signup/activate/pay) produce
    * indistinguishable `t1..tk` schemas, and folding one against the
    * other silently corrupts every decision. */
  private val StagesFile = "_graft_funnel_stages.json"

  /** Canonical identity string for a fold's step budget — the gap is
    * part of the state's semantics (a gapped and an ungapped state are
    * schema-indistinguishable), so the sidecar records it. Literal
    * interval expressions render deterministically via their SQL form. */
  private def gapIdentity(maxGap: Option[Column]): String =
    maxGap.map(g =>
      org.apache.spark.sql.graftbridge.Bridge.expression(g).sql)
      .getOrElse("none")

  /** Stamp a persisted funnel state with its marker, its stage list,
    * AND its step budget (call after writing the state table with the
    * same `maxGap` the folds use). */
  def stampFunnelStages(conf: org.apache.hadoop.conf.Configuration,
      dir: String, stages: Seq[String],
      maxGap: Option[Column] = None): Unit = {
    graft.state.HistoryFormat.stamp(conf, dir,
      graft.state.HistoryFormat.FunnelStages)
    val o = graft.util.Jsons.obj()
    val arr = o.putArray("stages")
    stages.foreach(arr.add)
    o.put("max_gap", gapIdentity(maxGap))
    graft.util.Fs.atomicWriteJson(
      new org.apache.hadoop.fs.Path(dir, StagesFile), o, conf)
  }

  /** [[funnelFold]] against a persisted state table — the path-taking
    * probe enforces the [[graft.state.HistoryFormat.FunnelStages]]
    * marker AND the recorded stage list: a state built for a different
    * stage list (or one with no recorded list at all) refuses loudly
    * with the rebuild remedy instead of silently mis-folding. */
  def funnelFoldTable(batch: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, stages: Seq[String], statePath: String,
      maxGap: Option[Column] = None): DataFrame = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val state = graft.state.HistoryTables.readChecked(
      batch.sparkSession, statePath, graft.state.HistoryFormat.FunnelStages)
    val p = new org.apache.hadoop.fs.Path(statePath, StagesFile)
    if (!graft.util.Fs.exists(p, conf))
      throw new IllegalStateException(
        s"funnel state $statePath records no stage list ($StagesFile " +
          "missing) — its t1..tk columns cannot be verified against " +
          s"(${stages.mkString(", ")}). If it was built by THIS engine " +
          "for exactly these stages, re-stamp with " +
          "Behavioral.stampFunnelStages; otherwise rebuild the state " +
          "from the full event stream.")
    val node = graft.util.Fs.readJson(p, conf)
    val recorded = {
      val arr = node.get("stages")
      (0 until arr.size).map(arr.get(_).asText)
    }
    if (recorded != stages)
      throw new IllegalStateException(
        s"funnel state $statePath was built for stages " +
          s"(${recorded.mkString(", ")}) but the fold was asked for " +
          s"(${stages.mkString(", ")}) — same-arity lists are " +
          "indistinguishable in the schema and folding across them " +
          "silently corrupts stage decisions. Rebuild the state from " +
          "the full event stream for the new stage list.")
    // the step budget is state semantics too: a gapped and an ungapped
    // state carry identical columns, and folding one under the other's
    // rule silently diverges from the batch recomputation
    val recordedGap = Option(node.get("max_gap")).map(_.asText)
      .getOrElse("none")
    if (recordedGap != gapIdentity(maxGap))
      throw new IllegalStateException(
        s"funnel state $statePath was built with step budget " +
          s"'$recordedGap' but the fold was asked for " +
          s"'${gapIdentity(maxGap)}' — stage decisions made under one " +
          "budget are not reusable under another. Rebuild the state " +
          "from the full event stream with the new budget.")
    funnelFold(Some(state), batch, userCol, typeCol, tsCol, stages, maxGap)
  }
}

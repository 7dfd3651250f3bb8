package graft

import graft.operators.Behavioral
import org.apache.spark.sql.functions._

/** Cross-batch behavioral analytics: the activity-matrix fold behind
  * incremental cohort retention and the per-user stage-state fold behind
  * the incremental funnel. Laws beyond the oracle replays: fold-equals-
  * batch, idempotent replays, closed stages never re-opening, the
  * out-of-order loud refusal, and boundary-timestamp safety. */
class BehavioralSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val stages = Seq("view", "click", "purchase")

  /** u1 completes the full funnel across the batch split; u2 clicks
    * BEFORE viewing (click must not count) then purchases after a late
    * view; u3 only views; u4 appears only in batch 2. Split at
    * 2024-01-10. */
  private def allEvents = Seq(
    (1L, "view", ts("2024-01-02 10:00:00")),
    (1L, "click", ts("2024-01-03 10:00:00")),
    (1L, "purchase", ts("2024-01-12 10:00:00")),
    (2L, "click", ts("2024-01-04 10:00:00")),
    (2L, "view", ts("2024-01-05 10:00:00")),
    (2L, "click", ts("2024-01-11 10:00:00")),
    (2L, "purchase", ts("2024-01-12 09:00:00")),
    (3L, "view", ts("2024-01-06 10:00:00")),
    (4L, "view", ts("2024-01-13 10:00:00")),
    (4L, "click", ts("2024-01-13 11:00:00"))
  ).toDF("user_id", "event_type", "ts")

  private def b1 = allEvents.filter(col("ts") < lit(ts("2024-01-10 00:00:00")))
  private def b2 = allEvents.filter(col("ts") >= lit(ts("2024-01-10 00:00:00")))

  test("activityFold: two-batch fold equals the batch activity matrix, " +
    "and replaying a batch appends nothing") {
    val batchPairs = Behavioral.activityPairs(allEvents, col("user_id"),
      col("ts")).orderBy("user_id", "period").collect()
    val h1 = Behavioral.activityPairs(b1, col("user_id"), col("ts"))
    val folded = h1.unionByName(
        Behavioral.activityFold(h1, b2, col("user_id"), col("ts")))
      .orderBy("user_id", "period").collect()
    assert(folded.toSeq === batchPairs.toSeq)
    // idempotence: re-folding batch 1 against the accumulated matrix
    // appends zero rows
    val all = h1.unionByName(
      Behavioral.activityFold(h1, b2, col("user_id"), col("ts")))
    assert(Behavioral.activityFold(all, b1, col("user_id"), col("ts"))
      .count() === 0L)
  }

  test("cohortRetention: hand-computed cells from a tiny matrix") {
    val act = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("user_id", "period")
    val out = Behavioral.cohortRetention(act)
      .orderBy("cohort", "period").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", "2024-01-01", 2L, 2L, 1.0),
      ("2024-01-01", "2024-01-02", 1L, 2L, 0.5),
      ("2024-01-02", "2024-01-02", 1L, 1L, 1.0)))
  }

  test("funnelFold: the two-batch fold equals the single-batch fold, " +
    "and a closed stage never re-opens") {
    val whole = Behavioral.funnelFold(None, allEvents, col("user_id"),
      col("event_type"), col("ts"), stages)
      .orderBy("user_id").collect()
    val st1 = Behavioral.funnelFold(None, b1, col("user_id"),
      col("event_type"), col("ts"), stages)
    val st2 = Behavioral.funnelFold(Some(st1), b2, col("user_id"),
      col("event_type"), col("ts"), stages)
      .orderBy("user_id").collect()
    assert(st2.toSeq === whole.toSeq)
    val byUser = st2.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // u1: full funnel; t2 decided in batch 1, purchase lands in batch 2
    assert(byUser(1L) === ((Some(ts("2024-01-02 10:00:00")),
      Some(ts("2024-01-03 10:00:00")), Some(ts("2024-01-12 10:00:00")))))
    // u2: the pre-view click never counts; the batch-2 click qualifies,
    // and the purchase after it completes the funnel
    assert(byUser(2L) === ((Some(ts("2024-01-05 10:00:00")),
      Some(ts("2024-01-11 10:00:00")), Some(ts("2024-01-12 09:00:00")))))
    // u3 stalls at view; u4 (batch-2-only) reaches click
    assert(byUser(3L)._2.isEmpty && byUser(3L)._3.isEmpty)
    assert(byUser(4L)._2.nonEmpty && byUser(4L)._3.isEmpty)
  }

  test("funnelReport: counts and ratios from the folded state") {
    val st = Behavioral.funnelFold(None, allEvents, col("user_id"),
      col("event_type"), col("ts"), stages)
    val r = Behavioral.funnelReport(st, stages).head
    assert(r.getAs[Long]("n_view") === 4L &&
      r.getAs[Long]("n_click") === 3L &&
      r.getAs[Long]("n_purchase") === 2L)
    assert(r.getAs[Double]("view_to_click") === 0.75 &&
      r.getAs[Double]("click_to_purchase") === 0.6667 &&
      r.getAs[Double]("full_funnel") === 0.5)
    // empty state: zero counts, ratios 0 (never NULL / div-by-zero)
    val empty = Behavioral.funnelReport(st.filter(lit(false)), stages).head
    assert(empty.getAs[Long]("n_view") === 0L &&
      empty.getAs[Double]("full_funnel") === 0.0)
  }

  test("funnelFold: an out-of-order batch refuses loudly; an event AT " +
    "the watermark is fine") {
    val st1 = Behavioral.funnelFold(None, b1, col("user_id"),
      col("event_type"), col("ts"), stages)
    val late = Seq((1L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val e = intercept[Exception] {
      Behavioral.funnelFold(Some(st1), late, col("user_id"),
        col("event_type"), col("ts"), stages).collect()
    }
    assert(msgs(e).exists(_.contains("out-of-order batch")),
      msgs(e).mkString("|"))
    // boundary: u3's watermark is its view ts; a click at EXACTLY that
    // instant folds cleanly (and doesn't qualify — strictly-after)
    val boundary = Seq((3L, "click", ts("2024-01-06 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val st2 = Behavioral.funnelFold(Some(st1), boundary, col("user_id"),
      col("event_type"), col("ts"), stages)
      .filter(col("user_id") === 3L).head
    assert(Option(st2.get(2)).isEmpty,
      "a click at exactly t1 is not strictly after it")
    // a mis-shaped state (different stage list) refuses up front
    val e2 = intercept[IllegalArgumentException] {
      Behavioral.funnelFold(Some(st1.drop("t3")), b2, col("user_id"),
        col("event_type"), col("ts"), stages)
    }
    assert(e2.getMessage.contains("missing column"))
    // the guard must survive column pruning: funnelReport reads only
    // t1..tk (never max_ts), so a projected guard would be deleted by
    // ColumnPruning and the corrupted report would return silently
    val e3 = intercept[Exception] {
      Behavioral.funnelReport(
        Behavioral.funnelFold(Some(st1), late, col("user_id"),
          col("event_type"), col("ts"), stages), stages).collect()
    }
    assert(msgs(e3).exists(_.contains("out-of-order batch")),
      s"the guard must fire under the report's pruned projection: " +
        msgs(e3).mkString("|"))
  }

  test("funnelFold maxGap: a step beyond its window never counts, the " +
    "two-batch fold equals the batch fold, and expired windows stay " +
    "NULL without tombstone state") {
    val gap = expr("INTERVAL 2 DAYS")
    // u1 clicks 1 day after viewing (inside), u2 clicks 6 days after
    // (expired), u3's click lands in batch 2 exactly AT the deadline
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-02 10:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-07 10:00:00")),
      (3L, "view", ts("2024-01-08 10:00:00")),
      (3L, "click", ts("2024-01-10 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val whole = Behavioral.funnelFold(None, ev, col("user_id"),
      col("event_type"), col("ts"), stages, Some(gap))
      .orderBy("user_id").collect()
    val byUser = whole.map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byUser(1L).nonEmpty, "in-window click counts")
    assert(byUser(2L).isEmpty, "a click beyond the window never counts")
    assert(byUser(3L) === Some(ts("2024-01-10 10:00:00")),
      "a click exactly AT the deadline counts (closed high bound)")
    // two-batch fold (split at Jan 5) == batch fold; u2's expired click
    // arrives in batch 2 and must stay rejected with NO tombstone —
    // time-ordered arrival makes every later candidate even later
    val b1g = ev.filter(col("ts") < lit(ts("2024-01-05 00:00:00")))
    val b2g = ev.filter(col("ts") >= lit(ts("2024-01-05 00:00:00")))
    val st1 = Behavioral.funnelFold(None, b1g, col("user_id"),
      col("event_type"), col("ts"), stages, Some(gap))
    val st2 = Behavioral.funnelFold(Some(st1), b2g, col("user_id"),
      col("event_type"), col("ts"), stages, Some(gap))
      .orderBy("user_id").collect()
    assert(st2.toSeq === whole.toSeq)
  }

  test("retentionByOffset: exact pooled counts per day offset, young " +
    "cohorts excluded from horizons they haven't lived, all-churned " +
    "offsets report zero") {
    // cohort A (Jan 1): 2 users, one active Jan 2; nobody active Jan 3.
    // cohort B (Jan 3): 1 user — only 0 and... horizon is Jan 3, so B
    // votes only on offset 0, A votes on 0..2
    val act = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"),
      (1L, "2024-01-02"),
      (3L, "2024-01-03"))
      .toDF("user_id", "period")
    val out = Behavioral.retentionByOffset(act)
      .orderBy("day_offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0, 2L, 3L, 3L, 1.0),     // both cohorts, everyone active on day 0
      (1, 1L, 1L, 2L, 0.5),     // only cohort A is old enough; 1 of 2
      (2, 1L, 0L, 2L, 0.0)),    // all churned — the row still exists
      s"got ${out.toSeq}")
  }

  test("funnelFold/funnelReport: dotted stage names resolve as literal " +
    "column names, never struct paths") {
    val dotted = Seq("page.view", "add.to.cart", "purchase")
    val ev = Seq(
      (1L, "page.view", ts("2024-01-02 10:00:00")),
      (1L, "add.to.cart", ts("2024-01-03 10:00:00")),
      (1L, "purchase", ts("2024-01-04 10:00:00")),
      (2L, "page.view", ts("2024-01-05 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val st = Behavioral.funnelFold(None, ev, col("user_id"),
      col("event_type"), col("ts"), dotted)
    val r = Behavioral.funnelReport(st, dotted).head
    assert(r.getAs[Long]("n_page.view") === 2L &&
      r.getAs[Long]("n_add.to.cart") === 1L &&
      r.getAs[Long]("n_purchase") === 1L)
    assert(r.getAs[Double]("page.view_to_add.to.cart") === 0.5 &&
      r.getAs[Double]("full_funnel") === 0.5)
  }
}

package graft

import graft.core.GraftError
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors the reference's CDC matrix (`tests/test_cdc_frame.py`):
  * merge, delete-wins, dedupe by version then timestamp, change-type map,
  * append-only. */
class CdcSuite extends SparkSpec {
  import spark.implicits._

  private def changes(rows: (Long, Option[Long], String, Long)*) =
    rows.toSeq.toDF("id", "value", "_change_type", "_commit_version")
      .withColumn("value", col("value"))

  private def existing(rows: (Long, Long)*) = rows.toSeq.toDF("id", "value")

  test("merge: upserts replace, inserts append, deletes remove") {
    val e = existing(1L -> 10L, 2L -> 20L)
    val c = changes(
      (1L, Some(11L), "update_postimage", 1L),
      (3L, Some(30L), "insert", 1L),
      (2L, None, "delete", 1L))
    val out = Cdc.applyCdc(c, Some(e), Seq("id")).orderBy("id")
    assert(out.columns.toSeq === Seq("id", "value"))
    assert(out.collect().map(r => (r.getLong(0), r.get(1))).toSeq ===
      Seq((1L, 11L), (3L, 30L)))
  }

  test("delete-wins: when the latest change for a key is delete, key is gone") {
    val e = existing(1L -> 10L)
    val c = changes(
      (1L, Some(99L), "update_postimage", 1L),
      (1L, None, "delete", 2L))
    val out = Cdc.applyCdc(c, Some(e), Seq("id"))
    assert(out.count() === 0)
  }

  test("dedupe: latest _commit_version wins; timestamp fallback") {
    val c = changes(
      (1L, Some(1L), "insert", 1L),
      (1L, Some(2L), "update_postimage", 2L),
      (1L, Some(3L), "update_postimage", 3L))
    val out = Cdc.applyCdc(c, None, Seq("id"))
    assert(out.collect().map(_.get(1)).toSeq === Seq(3L))

    // timestamp fallback when no version col
    val ts = Seq((1L, 1L, "insert", 100L), (1L, 2L, "update_postimage", 200L))
      .toDF("id", "value", "_change_type", "_commit_timestamp")
    val out2 = Cdc.applyCdc(ts, None, Seq("id"))
    assert(out2.collect().map(_.getLong(1)).toSeq === Seq(2L))
  }

  test("update_preimage rows are dropped") {
    val c = changes(
      (1L, Some(10L), "update_preimage", 1L),
      (1L, Some(11L), "update_postimage", 1L))
    val out = Cdc.applyCdc(c, None, Seq("id"))
    assert(out.collect().map(_.get(1)).toSeq === Seq(11L))
  }

  test("change_type_map normalizes custom codes with passthrough") {
    val c = changes((1L, Some(1L), "I", 1L), (2L, Some(2L), "D", 1L),
      (3L, Some(3L), "insert", 1L))
    val out = Cdc.applyCdc(c, None, Seq("id"),
      changeTypeMap = Map("I" -> "insert", "D" -> "delete")).orderBy("id")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("append_only keeps only inserts and never deletes") {
    val e = existing(1L -> 10L)
    val c = changes(
      (2L, Some(20L), "insert", 1L),
      (1L, None, "delete", 1L),
      (3L, Some(30L), "update_postimage", 1L))
    val out = Cdc.applyCdc(c, Some(e), Seq("id"), mode = CdcMode.AppendOnly).orderBy("id")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("missing key/change columns raise") {
    val bad = Seq((1L, 2L)).toDF("id", "value")
    intercept[GraftError](Cdc.applyCdc(bad, None, Seq("id")))
  }

  test("unionByName fills missing columns with null (diagonal concat)") {
    val e = existing(1L -> 10L)
    val c = Seq((2L, Some(20L), "extra", "insert", 1L))
      .toDF("id", "value", "note", "_change_type", "_commit_version")
    val out = Cdc.applyCdc(c, Some(e), Seq("id")).orderBy("id")
    assert(out.columns.sorted.toSeq === Seq("id", "note", "value"))
    val rows = out.collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("note")))
    assert(rows(1).getString(rows(1).fieldIndex("note")) === "extra")
  }

  test("scd2: versions become tiling validity intervals, deletes close " +
    "them without emitting, exactly one open interval per surviving key") {
    val c = Seq(
      (1L, 10L, "upsert", 1L), (1L, 11L, "upsert", 3L),
      (1L, 12L, "upsert", 7L),
      (2L, 20L, "upsert", 2L), (2L, 0L, "delete", 5L),
      (3L, 30L, "upsert", 4L))
      .toDF("id", "value", "kind", "v")
    val out = Cdc.scd2(c, Seq("id"), col("v"), Some(col("kind")))
      .orderBy("id", "valid_from").collect()
    // key 1: [1,3) [3,7) [7,open); key 2: [2,5) CLOSED by the delete,
    // no open row; key 3: [4,open)
    val k1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(k1.toSeq === Seq((1L, Some(3L), false), (3L, Some(7L), false),
      (7L, None, true)))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2.head.getAs[Long]("valid_to") === 5L &&
      !k2.head.getAs[Boolean]("is_current"),
      "the delete must close key 2's interval and emit no row itself")
    // exactly one open interval per key that survives
    val open = out.filter(_.getAs[Boolean]("is_current")).map(_.getLong(0))
    assert(open.toSeq.sorted === Seq(1L, 3L))
  }

  test("scd2: a NULL change type is an upsert, never a silent delete") {
    val c = Seq((1L, 10L, Some("upsert"), 1L), (1L, 11L, None, 3L))
      .toDF("id", "value", "kind", "v")
    val out = Cdc.scd2(c, Seq("id"), col("v"), Some(col("kind")))
      .orderBy("valid_from").collect()
    assert(out.length === 2, "the NULL-typed version must emit a row")
    assert(out(1).getAs[Long]("value") === 11L &&
      out(1).getAs[Boolean]("is_current"))
  }

  // --- scd2Merge (incremental SCD2) ---------------------------------------

  /** (id, value, kind, v) change rows split into two version-ordered
    * batches: key 1 updates across both, key 2 is deleted in b1 and
    * re-inserted in b2, key 3 lives only in b1 (untouched by b2), key 4
    * is brand-new in b2, key 5 is deleted in b2. */
  private def scd2B1 = Seq(
    (1L, 10L, "upsert", 1L), (1L, 11L, "upsert", 3L),
    (2L, 20L, "upsert", 2L), (2L, 0L, "delete", 5L),
    (3L, 30L, "upsert", 4L),
    (5L, 50L, "upsert", 1L))
    .toDF("id", "value", "kind", "v")
  private def scd2B2 = Seq(
    (1L, 12L, "upsert", 7L),
    (2L, 21L, "upsert", 8L),
    (4L, 40L, "upsert", 6L),
    (5L, 0L, "delete", 9L))
    .toDF("id", "value", "kind", "v")

  test("scd2Merge: merging a second batch into a built dimension equals " +
    "the batch rebuild over the union (open chains, deleted chains, " +
    "re-inserts, new keys, untouched keys)") {
    val dim = Cdc.scd2(scd2B1, Seq("id"), col("v"), Some(col("kind")))
      .drop("kind", "v")
    val merged = Cdc.scd2Merge(dim, scd2B2, Seq("id"), "v",
        Some("kind")).orderBy("id", "valid_from").collect()
    val full = Cdc.scd2(scd2B1.unionByName(scd2B2), Seq("id"), col("v"),
        Some(col("kind"))).drop("kind", "v")
      .select(merged.headOption.map(_ => dim.columns.toSeq)
        .getOrElse(dim.columns.toSeq).map(col): _*)
      .orderBy("id", "valid_from").collect()
    assert(merged.toSeq === full.toSeq)
    // and key 3 (untouched) carried forward as the open row it was
    val k3 = merged.filter(_.getLong(0) == 3L)
    assert(k3.length === 1 && k3.head.getAs[Boolean]("is_current"))
  }

  test("scd2Merge: replacement rows are exactly the touched chains keyed " +
    "by (key, valid_from) — the Delta upsert payload") {
    val dim = Cdc.scd2(scd2B1, Seq("id"), col("v"), Some(col("kind")))
      .drop("kind", "v")
    val repl = Cdc.scd2MergeChanges(dim, scd2B2, Seq("id"), "v",
      Some("kind")).collect()
    // touched keys only — 3 never appears
    assert(!repl.exists(_.getLong(0) == 3L))
    // key 1: open row [3,∞) re-emitted closed at 7, plus [7,∞)
    val k1 = repl.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")))).sortBy(_._1)
    assert(k1.toSeq === Seq((3L, Some(7L)), (7L, None)))
    // key 5: only the closed open-row — a delete adds no interval
    val k5 = repl.filter(_.getLong(0) == 5L)
    assert(k5.length === 1 && k5.head.getAs[Long]("valid_to") === 9L)
    // uniqueness of the merge key
    val mk = repl.map(r => (r.getLong(0), r.getAs[Long]("valid_from")))
    assert(mk.distinct.length === mk.length)
  }

  test("scd2Merge: a change version before the key's committed boundary " +
    "refuses loudly (late CDC feed), and a replay of the open version " +
    "trips the duplicate guard") {
    val dim = Cdc.scd2(scd2B1, Seq("id"), col("v"), Some(col("kind")))
      .drop("kind", "v")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val late = Seq((1L, 99L, "upsert", 2L)).toDF("id", "value", "kind", "v")
    val e1 = intercept[Exception] {
      Cdc.scd2Merge(dim, late, Seq("id"), "v", Some("kind")).collect()
    }
    assert(msgs(e1).exists(_.contains("late change")), msgs(e1).mkString("|"))
    val replay = Seq((1L, 99L, "upsert", 3L)).toDF("id", "value", "kind", "v")
    val e2 = intercept[Exception] {
      Cdc.scd2Merge(dim, replay, Seq("id"), "v", Some("kind")).collect()
    }
    assert(msgs(e2).exists(_.contains("duplicate (key, version)")),
      msgs(e2).mkString("|"))
    // re-insert at exactly a closing delete's version is legal (half-open
    // intervals tile): key 2 closed at 5
    val tile = Seq((2L, 22L, "upsert", 5L)).toDF("id", "value", "kind", "v")
    val ok = Cdc.scd2Merge(dim, tile, Seq("id"), "v", Some("kind"))
      .filter(col("id") === 2L).orderBy("valid_from").collect()
    assert(ok.map(r => (r.getAs[Long]("valid_from"),
      Option(r.getAs[Any]("valid_to")))).toSeq ===
      Seq((2L, Some(5L)), (5L, None)))
  }

  test("scd2Merge: the late-change guard survives a payload-only consumer " +
    "(filter carrier — ColumnPruning cannot delete a filter predicate)") {
    val dim = Cdc.scd2(scd2B1, Seq("id"), col("v"), Some(col("kind")))
      .drop("kind", "v")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val late = Seq((1L, 99L, "upsert", 2L)).toDF("id", "value", "kind", "v")
    // the consumer reads ONLY a payload column — were the guard a
    // projection folded into the version column, Catalyst would prune it
    // here and the late batch would merge silently
    val e = intercept[Exception] {
      Cdc.scd2Merge(dim, late, Seq("id"), "v", Some("kind"))
        .select("value").collect()
    }
    assert(msgs(e).exists(_.contains("late change")), msgs(e).mkString("|"))
  }

  test("scd2Lookup: each fact sees the dimension version valid at its " +
    "timestamp, boundaries see the new row, unmatched facts survive " +
    "with NULL dims, at most one interval matches") {
    val dim = Cdc.scd2(scd2B1, Seq("id"), col("v"), Some(col("kind")))
      .drop("kind", "v")
    // key 1 intervals: [1,3) [3,∞); key 2: [2,5) closed by delete@5;
    // key 3: [4,∞)
    val facts = Seq(
      (100L, 1L, 2L), (101L, 1L, 3L), (102L, 1L, 9L),
      (103L, 2L, 4L), (104L, 2L, 5L), (105L, 2L, 6L),
      (106L, 7L, 9L), (107L, 3L, 1L))
      .toDF("fact_id", "id", "at")
    val out = Cdc.scd2Lookup(facts, dim, Seq("id"), "at")
      .orderBy("fact_id").collect()
    assert(out.length === facts.count(), "left join keeps every fact")
    def vf(i: Int) = Option(out(i).getAs[Any]("valid_from"))
    // fact@2 sees [1,3); fact@3 (boundary) sees the NEW row [3,∞)
    assert(vf(0) === Some(1L) && vf(1) === Some(3L) && vf(2) === Some(3L))
    // key 2: @4 inside [2,5); @5 (the delete version) and @6 → no match
    assert(vf(3) === Some(2L) && vf(4).isEmpty && vf(5).isEmpty)
    // unknown key, and a fact BEFORE key 3's chain starts
    assert(vf(6).isEmpty && vf(7).isEmpty)
    // self-lineage: dim derived from the same frame as the facts still
    // resolves (the AMBIGUOUS_SELF_JOIN trap)
    val sameLineage = Cdc.scd2Lookup(
      scd2B1.select(col("id"), col("v").as("at")), dim, Seq("id"), "at")
    assert(sameLineage.count() === scd2B1.count())
  }

  test("scd2MergeDelta: batches upsert through the touched-files merge " +
    "and the table converges to the batch rebuild") {
    withTmpDir { dir =>
      val t = s"$dir/dim"
      val r1 = DeltaCdc.scd2MergeDelta(spark, scd2B1, t, Seq("id"), "v",
        Some("kind"), txn = Some(("scd2", 1L)))
      assert(r1.action === "merge" || r1.action === "append")
      val r2 = DeltaCdc.scd2MergeDelta(spark, scd2B2, t, Seq("id"), "v",
        Some("kind"), txn = Some(("scd2", 2L)))
      assert(r2.action === "merge")
      val writer = new graft.delta.DeltaWriter(spark, conf)
      val got = writer.read(t)
        .orderBy("id", "valid_from").collect()
      val want = Cdc.scd2(scd2B1.unionByName(scd2B2), Seq("id"),
          col("v"), Some(col("kind"))).drop("kind", "v")
        .select(writer.read(t).columns.map(col).toSeq: _*)
        .orderBy("id", "valid_from").collect()
      assert(got.toSeq === want.toSeq)
      assert(writer.lastTxnVersion(t, "scd2") === Some(2L))
    }
  }

  test("scd2: a duplicate (key, version) pair refuses loudly instead of " +
    "emitting nondeterministic intervals") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    val c = Seq((1L, 10L, 2L), (1L, 11L, 2L), (1L, 12L, 5L))
      .toDF("id", "value", "v")
    val e = intercept[Exception] {
      Cdc.scd2(c, Seq("id"), col("v")).collect()
    }
    assert(msgs(e).exists(_.contains("duplicate (key, version)")),
      s"expected the scd2 replay guard, got: ${msgs(e).mkString(" | ")}")
    // the guard must also fire when a DELETE row is one of the
    // duplicates: the !__del filter removes delete rows, so a guard
    // riding a projected column would be pushed past and skipped —
    // the filter-borne guard evaluates for every row, deletes included
    val withDel = Seq((1L, 10L, "delete", 5L), (1L, 11L, "upsert", 5L),
      (1L, 9L, "upsert", 2L)).toDF("id", "value", "kind", "v")
    val e2 = intercept[Exception] {
      Cdc.scd2(withDel, Seq("id"), col("v"), Some(col("kind"))).collect()
    }
    assert(msgs(e2).exists(_.contains("duplicate (key, version)")),
      s"a replayed delete must trip the guard: ${msgs(e2).mkString(" | ")}")
  }

  test("scd2: without a change-type column every version is an upsert, " +
    "and intervals tile gaplessly (valid_to(n) == valid_from(n+1))") {
    val c = Seq((1L, 10L, 2L), (1L, 11L, 9L), (1L, 12L, 4L))
      .toDF("id", "value", "v")
    val out = Cdc.scd2(c, Seq("id"), col("v"))
      .orderBy("valid_from").collect()
    assert(out.length === 3)
    val froms = out.map(_.getAs[Long]("valid_from")).toSeq
    assert(froms === Seq(2L, 4L, 9L), "ordering is by version, not input")
    val tos = out.init.map(_.getAs[Long]("valid_to")).toSeq
    assert(tos === froms.tail, "intervals must tile gaplessly")
    assert(out.last.isNullAt(out.last.fieldIndex("valid_to")))
  }
}

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
}

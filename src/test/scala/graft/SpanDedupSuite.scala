package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

class SpanDedupSuite extends SparkSpec {
  import spark.implicits._

  private def toks(s: Char*) = s.map(_.toString).mkString(" ")

  test("duplicated runs mark everywhere but the first occurrence") {
    // doc 1 tokens a..j (10) then k..t; doc 2 repeats a..j verbatim at
    // offset 3; doc 3 shares nothing
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " " + toks('k' to 't': _*)),
      (2L, toks('x', 'y', 'z') + " " + a2j + " q r s"),
      (3L, toks('0' to '9': _*))).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only doc 2's copy is marked: the single shared 10-gram sits at
    // token index 3, covering [3, 13)
    assert(got.toSeq === Seq((2L, 3L, 13L)))
  }

  test("overlapping and adjacent gram marks merge into one maximal span") {
    // doc 2 copies doc 1's first 14 tokens: marks at pos 0..4 (five
    // 10-grams) must merge into [0, 14), not five rows
    val first14 = toks('a' to 'n': _*)
    val df = Seq(
      (1L, first14 + " " + toks('p' to 'y': _*)),
      (2L, first14 + " " + toks('A' to 'J': _*))).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 0L, 14L)))
  }

  test("distinct duplicated regions separated by novel text stay two spans") {
    val runA = toks('a' to 'j': _*)
    val runB = toks('p' to 'y': _*)
    val df = Seq(
      (1L, runA + " 1 2 3 " + runB),
      // same two runs, but separated by DIFFERENT novel tokens so the
      // marks cannot chain across
      (2L, runA + " 7 8 9 " + runB)).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 0L, 10L), (2L, 13L, 23L)))
  }

  test("docs shorter than n produce no grams and no spans") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    assert(SpanDedup.spans(df, "doc_id", "text", n = 10).count() === 0L)
  }

  test("a gram planted in every doc completes and keeps one canonical copy") {
    // the hot-gram shape: one identical 10-token run in all 400 docs —
    // the owners aggregation must collapse it map-side (plan gate in
    // PlanSuite) and exactly 399 docs get marked
    val hot = toks('a' to 'j': _*)
    val df = (0 until 400)
      .map(i => (i.toLong, s"u$i v$i w$i $hot x$i y$i"))
      .toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 10)
    assert(got.count() === 399L)
    assert(got.agg(min("doc_id")).head().getLong(0) === 1L)
    assert(got.select("span_start", "span_end").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 13L)))
  }

  test("struct-owner fallback matches the packed-owner default; out-of-range ids fail loudly") {
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " " + toks('k' to 't': _*)),
      (2L, toks('x', 'y', 'z') + " " + a2j + " q r s"),
      (3L, a2j + " novel tail here")).toDF("doc_id", "text")
    def rows(packed: Boolean) =
      SpanDedup.spans(df, "doc_id", "text", n = 10, packedOwners = packed)
        .orderBy("doc_id", "span_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(packed = true) === rows(packed = false))
    // a doc_id beyond 31 bits must error NAMING the fallback, never
    // silently mis-order the canonical-owner selection
    val big = Seq((1L << 40, a2j), (2L, a2j)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SpanDedup.spans(big, "doc_id", "text", n = 10).collect()
    }
    assert(e.getMessage.contains("packedOwners"),
      s"expected the packed-owner guard message, got: ${e.getMessage}")
    // the fallback handles the same ids exactly
    val got = SpanDedup.spans(big, "doc_id", "text", n = 10,
      packedOwners = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(((1L << 40), 0L, 10L)))
  }

  test("newline delimiter gives line-level spans (the C4 line-dedup mode)") {
    val boiler = (1 to 3).map(i => s"boilerplate line $i").mkString("\n")
    val df = Seq(
      (1L, boiler + "\nunique footer one"),
      (2L, boiler + "\nunique footer two")).toDF("doc_id", "text")
    val got = SpanDedup.spans(df, "doc_id", "text", n = 3, delim = "\n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 3-line boilerplate block recurs: doc 2's copy is one [0,3) span
    assert(got.toSeq === Seq((2L, 0L, 3L)))
    val cleaned = SpanDedup.clean(df, "doc_id", "text", n = 3, delim = "\n")
      .orderBy("doc_id").collect()
    assert(cleaned(1).getAs[String]("clean_text") === "unique footer two")
  }

  test("clean removes exactly the spanned tokens and keeps other columns") {
    val a2j = toks('a' to 'j': _*)
    val df = Seq(
      (1L, a2j + " k l m", "keep1"),
      (2L, "x y z " + a2j + " q", "keep2"),
      (3L, "totally novel text here", "keep3")).toDF("doc_id", "text", "tag")
    val out = SpanDedup.clean(df, "doc_id", "text", n = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("tag")).toSeq ===
      Seq("keep1", "keep2", "keep3"))
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_removed"))).toMap
    assert(byId(1L) === (a2j + " k l m", 0L)) // canonical copy untouched
    assert(byId(2L) === ("x y z q", 10L))     // duplicated run excised
    assert(byId(3L) === ("totally novel text here", 0L))
    // token-count invariant on every row
    out.foreach { r =>
      val orig = r.getAs[String]("text").split(" ", -1).length
      val clean = r.getAs[String]("clean_text") match {
        case "" => 0
        case s  => s.split(" ", -1).length
      }
      assert(clean === orig - r.getAs[Long]("n_tokens_removed"))
    }
  }
}

package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSuite extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, (0 until (i % 37 + 1)).map(j => s"t${i}_$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("every pack except the last holds exactly `budget` tokens") {
    val packs = Packing.packAssignments(corpus(200), "doc_id", "text", budget = 64)
      .groupBy("pack_id").agg(sum(col("tok_end") - col("tok_start")).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = packs.keys.max
    packs.foreach { case (p, sz) =>
      if (p < last) assert(sz === 64L, s"pack $p holds $sz")
      else assert(sz <= 64L && sz > 0L, s"last pack holds $sz")
    }
  }

  test("packAssignmentsByCount equals the text path given the same counts") {
    val df = corpus(120)
    val byText = Packing.packAssignments(df, "doc_id", "text", budget = 64)
      .orderBy("doc_id", "pack_id").collect().toSeq
    val withCount = df.withColumn("n", size(split(col("text"), " ")))
    val byCount = Packing.packAssignmentsByCount(withCount, "doc_id", "n",
      budget = 64).orderBy("doc_id", "pack_id").collect().toSeq
    assert(byText == byCount,
      "count-based packing must cut identical segments")
  }

  test("packAssignmentsByCount skips zero-count docs but keeps the stream") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, 3L)).toDF("doc_id", "n")
    val segs = Packing.packAssignmentsByCount(df, "doc_id", "n", budget = 4)
      .orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: tokens [0,5) -> packs 0 [0,4) and 1 [4,5); doc 2: nothing;
    // doc 3: continues at global offset 5 -> pack 1 [0,3)
    assert(segs.toSeq == Seq((1L, 0L, 0L, 4L), (1L, 1L, 4L, 5L),
      (3L, 1L, 0L, 3L)))
  }

  test("per-doc segments are consecutive, disjoint, and cover the doc") {
    val df = corpus(150)
    val nTok = df.select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = Packing.packAssignments(df, "doc_id", "text", budget = 64)
      .orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(perDoc.keySet === nTok.keySet)
    perDoc.foreach { case (doc, segs) =>
      assert(segs.head._3 === 0L, s"doc $doc first segment must start at 0")
      assert(segs.last._4 === nTok(doc), s"doc $doc must be covered to its end")
      segs.sliding(2).foreach {
        case Array((_, p1, _, e1), (_, p2, s2, _)) =>
          assert(p2 === p1 + 1 && s2 === e1,
            s"doc $doc segments must be consecutive and adjacent")
        case _ =>
      }
    }
  }

  test("output is independent of the bucket count (prefix-sum correctness)") {
    val df = corpus(120)
    def run(buckets: Int) = Packing
      .packAssignments(df, "doc_id", "text", budget = 50, buckets = buckets)
      .orderBy("doc_id", "pack_id").collect().map(_.toSeq).toSeq
    val one = run(1) // single bucket = the trivially-correct global scan
    assert(run(7) === one)
    assert(run(32) === one)
    assert(run(500) === one) // more buckets than docs: boundaries dedupe
  }

  test("deterministic across invocations") {
    val df = corpus(90)
    def run() = Packing.packAssignments(df, "doc_id", "text", budget = 64)
      .orderBy("doc_id", "pack_id").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("incremental packing with tokenOffset equals the one-shot stream") {
    val df = corpus(120)
    val oneShot = Packing.packAssignments(df, "doc_id", "text", budget = 64)
      .orderBy("doc_id", "pack_id").collect().map(_.toSeq).toSeq
    // two id-ordered batches; batch 2 continues at batch 1's token total
    val b1 = df.filter(col("doc_id") < 60)
    val b2 = df.filter(col("doc_id") >= 60)
    val b1Tokens = b1.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    val incremental =
      (Packing.packAssignments(b1, "doc_id", "text", budget = 64)
        .orderBy("doc_id", "pack_id").collect().map(_.toSeq) ++
       Packing.packAssignments(b2, "doc_id", "text", budget = 64,
         tokenOffset = b1Tokens)
        .orderBy("doc_id", "pack_id").collect().map(_.toSeq)).toSeq
    assert(incremental === oneShot,
      "batch-continued packing must reproduce the global pack stream " +
      "(shared boundary pack included)")
  }

  test("empty text counts as its single empty token") {
    val df = Seq((0L, "a b c"), (1L, ""), (2L, "d e")).toDF("doc_id", "text")
    val segs = Packing.packAssignments(df, "doc_id", "text", budget = 4)
      .orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // stream: a b c | "" d e  -> doc1's empty token is position 3 (pack 0)
    assert(segs.toSeq === Seq((0L, 0L, 0L, 3L), (1L, 0L, 0L, 1L),
      (2L, 1L, 0L, 2L)))
  }

  test("packWholeDocs: textbook next-fit in id order, docs never straddle") {
    import spark.implicits._
    val df = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 10L), (5L, 2L),
      (6L, 6L), (7L, 0L)).toDF("doc_id", "n")
    val r = Packing.packWholeDocs(df, "doc_id", "n", budget = 10,
        buckets = 1)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // 4+5=9 | 3 (10 overflows) | 10 | 2+6=8; zero-count doc 7 emits nothing
    assert(r === Array((1L, 0L, 4L), (2L, 0L, 5L), (3L, 1L, 3L),
      (4L, 2L, 10L), (5L, 3L, 2L), (6L, 3L, 6L)))
  }

  test("packWholeDocs: no pack exceeds budget; waste bound holds") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, 1L + (i * 7) % 40))
      .toDF("doc_id", "n")
    val out = Packing.packWholeDocs(df, "doc_id", "n", budget = 64,
      buckets = 4)
    // one whole row per doc
    assert(out.count() === 400L)
    assert(out.select("doc_id").distinct().count() === 400L)
    val fills = out.groupBy("pack_id")
      .agg(org.apache.spark.sql.functions.sum("n_tok").as("fill"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fills.forall(_._2 <= 64L), "a pack exceeded its budget")
    // waste bound: within each bucket every pack but its LAST closed
    // only because the next doc overflowed -> fill > budget - max(n)
    val maxN = 40L
    val lastPerBucket = fills.map(_._1).groupBy(_ >> 40)
      .map { case (_, ids) => ids.max }.toSet
    fills.filterNot(f => lastPerBucket(f._1)).foreach { case (p, fill) =>
      assert(fill > 64L - maxN, s"pack $p fill $fill violates next-fit bound")
    }
    // token conservation
    val inTok = (1L to 400L).map(i => 1L + (i * 7) % 40).sum
    assert(fills.map(_._2).sum === inTok)
  }

  test("packWholeDocs: bucket composition law and input-order independence") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 1L + (i * 13) % 50))
      .toDF("doc_id", "n")
    val multi = Packing.packWholeDocs(
        df.orderBy(org.apache.spark.sql.functions.rand(7)).repartition(5),
        "doc_id", "n", budget = 80, buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // the multi-bucket run equals single-bucket next-fit applied to each
    // bucket's id slice independently (packs renumbered per bucket)
    val byBucket = multi.groupBy(_._2 >> 40).toSeq.sortBy(_._1)
    val seen = scala.collection.mutable.Set[Long]()
    byBucket.foreach { case (_, rows) =>
      val ids = rows.map(_._1).sorted
      seen ++= ids
      val solo = Packing.packWholeDocs(
          df.filter(org.apache.spark.sql.functions.col("doc_id")
            .isin(ids: _*)), "doc_id", "n", budget = 80, buckets = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1) & ((1L << 40) - 1)))
        .sortBy(_._1)
      assert(rows.map(x => (x._1, x._2 & ((1L << 40) - 1))).sortBy(_._1)
        .toSeq === solo.toSeq)
    }
    assert(seen.size === 300)
  }

  test("packReport totals, utilization, and full-pack count are exact") {
    import spark.implicits._
    // next-fit at budget 10 over counts 6,6,10,3 -> packs [6][6][10][3]?
    // no: 6; 6 overflows -> new pack; 10 overflows -> new pack (full);
    // 3 overflows? fill 10 + 3 > 10 -> new pack. 4 packs, fills 6,6,10,3
    val df = Seq((1L, 6L), (2L, 6L), (3L, 10L), (4L, 3L)).toDF("doc_id", "n")
    val packs = Packing.packWholeDocs(df, "doc_id", "n", budget = 10,
      buckets = 1)
    val r = Packing.packReport(packs, budget = 10).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((4L, 4L, 25L, 15L, 0.625, 3L, 10L, 1L)))
  }

  test("packReport over an empty assignment reads zeros, not nulls") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)]
      .toDF("doc_id", "pack_id", "n_tok")
    val r = Packing.packReport(empty, budget = 10).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((0L, 0L, 0L, 0L, 0.0, 0L, 0L, 0L)))
  }

  test("packWholeDocs rejects docs longer than the budget, loudly") {
    import spark.implicits._
    val df = Seq((1L, 4L), (2L, 99L)).toDF("doc_id", "n")
    val e = intercept[org.apache.spark.SparkException] {
      Packing.packWholeDocs(df, "doc_id", "n", budget = 10, buckets = 1)
        .collect()
    }
    assert(e.getMessage.contains("never splits") ||
      Option(e.getCause).exists(_.getMessage.contains("never splits")))
  }
}

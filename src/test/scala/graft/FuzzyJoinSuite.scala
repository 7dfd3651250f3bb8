package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions.col

class FuzzyJoinSuite extends SparkSpec {
  import spark.implicits._

  /** Reference Levenshtein (classic DP) for brute-force comparison. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh"
    val bases = (0 until 60).map(_ =>
      (0 until (6 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(8))).mkString)
    bases.zipWithIndex.flatMap { case (s, i) =>
      val subs = s.updated(rnd.nextInt(s.length), 'z')
      val del = s.substring(1)
      val ins = s + "q"
      Seq((i * 10L, s), (i * 10L + 1, subs), (i * 10L + 2, del),
        (i * 10L + 3, ins))
    } ++ Seq((9001L, "a"), (9002L, "b"), (9003L, ""), (9004L, "ab"),
      (9005L, "xyz"), (9006L, "abc")) // the short-key corner
  }

  test("editDistanceJoin equals brute force, planted typos and short keys included") {
    val rows = corpus
    val got = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (i, si) <- rows; (j, sj) <- rows if i < j
      d = lev(si, sj) if d <= 2
    } yield (i, j, d)).toSet
    // the short-key corner must actually fire: "a"-"b", "a"-"ab", ""-"a"...
    assert(want.exists { case (a, b, _) => a >= 9001L && b >= 9001L })
    assert(got === want)
    // and at k=3 "xyz"/"abc" (no shared gram, both short) must appear
    val got3 = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got3.contains((9005L, 9006L, 3)),
      "gramless short pair must survive via the sentinel bucket")
    val want3 = (for {
      (i, si) <- rows; (j, sj) <- rows if i < j
      d = lev(si, sj) if d <= 3
    } yield (i, j, d)).toSet
    assert(got3 === want3)
  }

  test("incremental fuzzy matching equals brute force across batches under a fixed order model") {
    val rows = corpus
    // interleaved split so near-dup families straddle the batch boundary
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    // the order model comes from batch 1 ONLY - batch 2 contains grams
    // the model has never seen (the 'z'/'q' mutations), which must rank
    // as df-0 rarest without dropping pairs
    val order = FuzzyJoin.gramOrderModel(b1.toDF("id", "s"), "s")
    val idx1 = FuzzyJoin.prefixIndex(b1.toDF("id", "s"), "id", "s",
      maxDist = 2, order)
    val cross = FuzzyJoin.editDistanceAgainstHistory(b2.toDF("id", "s"),
        idx1, "id", "s", maxDist = 2, order)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (i, si) <- b2; (j, sj) <- b1
      d = lev(si, sj) if d <= 2
    } yield (i, j, d)).toSet
    assert(want.nonEmpty)
    assert(cross === want)
    // appending batch 2's index and probing a third batch still exact
    val idx = idx1.unionByName(FuzzyJoin.prefixIndex(b2.toDF("id", "s"),
      "id", "s", maxDist = 2, order))
    val b3 = Seq((70001L, rows.head._2), (70002L, "zz"))
    val cross3 = FuzzyJoin.editDistanceAgainstHistory(b3.toDF("id", "s"),
        idx, "id", "s", maxDist = 2, order)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want3 = (for {
      (i, si) <- b3; (j, sj) <- rows
      d = lev(si, sj) if d <= 2
    } yield (i, j, d)).toSet
    assert(cross3 === want3)
  }

  test("plan: candidate generation is equi-join only, prefix rank map-side trimmed") {
    val plan = FuzzyJoin.editDistanceJoin(
      corpus.toDF("id", "s"), "id", "s", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("WindowGroupLimit"),
      "prefix ranking must pre-trim map-side:\n" + plan)
  }

  test("gram-order drift cycle: stale model inflates candidates, rebuild restores selectivity") {
    // every key shares the hot prefix "aaaa" (grams "aa"); its tail is
    // unique. A FRESH df model ranks "aa" last (hottest), pushing it out
    // of every prefix — candidates only meet on genuinely rare grams. A
    // STALE model that never saw this alphabet ranks everything df-0, so
    // ordering degenerates to lexicographic and "aa" (smallest) lands in
    // EVERY prefix: the all-pairs bucket the ranking exists to prevent.
    // tails with pairwise-unique bigrams: each key holds 5 distinct
    // grams ("aa", the bridge, 3 tail bigrams) against prefixLen 3, so
    // the ranking genuinely SELECTS — under df order the hot "aa" is
    // pushed out; under lexicographic-on-df-0 it leads every prefix
    val tails = Seq("bcde", "fghi", "jklm", "nopq", "rstu", "vwxy")
    val keys = tails.zipWithIndex
      .map { case (t, i) => (i.toLong, "aaaa" + t) }
      .toDF("id", "k")
    val staleOrder = FuzzyJoin.gramOrderModel(
      Seq("0123456789").toDF("s"), "s") // disjoint alphabet
    val drift = FuzzyJoin.gramOrderDrift(keys, "id", "k", staleOrder).head()
    assert(drift.getBoolean(4), s"stale model must trip rebuild: $drift")
    def candVolume(order: org.apache.spark.sql.DataFrame): Long = {
      val pi = FuzzyJoin.prefixIndex(keys, "id", "k", maxDist = 1, order)
      pi.select(col("sid").as("ia"), col("g"))
        .join(pi.select(col("sid").as("ib"), col("g")), Seq("g"))
        .filter(col("ia") < col("ib"))
        .select("ia", "ib").distinct().count()
    }
    val rebuilt = FuzzyJoin.gramOrderModel(keys.select("k"), "k")
    val driftAfter = FuzzyJoin.gramOrderDrift(keys, "id", "k", rebuilt).head()
    assert(!driftAfter.getBoolean(4), "rebuild must clear the flag")
    val (vStale, vFresh) = (candVolume(staleOrder), candVolume(rebuilt))
    val n = tails.size.toLong
    assert(vStale === n * (n - 1) / 2,
      s"stale ranking admits the all-pairs hot bucket: $vStale")
    assert(vFresh === 0L,
      s"df ranking excludes the hot gram from every prefix: $vFresh")
  }
}

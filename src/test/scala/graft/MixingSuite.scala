package graft

import graft.operators.Mixing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-output materialization: deterministic shuffle, temperature
  * mixture sampling, token-budget epoch planning. */
class MixingSuite extends SparkSpec {
  import spark.implicits._

  private def docs(base: Int, domains: Seq[(String, Int)]): DataFrame = {
    // domains: (name, count) — ids start at `base`, unique across domains
    val rows = domains.foldLeft((Seq.empty[(Long, String)], base.toLong)) {
      case ((acc, base), (dom, k)) =>
        (acc ++ (0 until k).map(i => (base + i, dom)), base + k)
    }._1
    rows.toDF("id", "dom")
  }

  test("minstd is in [1, M-1], deterministic, and matches its SQL rendering") {
    val df = spark.range(0, 1000).select(
      col("id"), Mixing.minstd(col("id"), 41L).as("h"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.values.forall(h => h >= 1 && h <= 2147483646L))
    // distinct enough to be a useful shuffle key (Lehmer is injective per
    // round over [1, M-1]; the +seed fold keeps small ids distinct too)
    assert(rows.values.toSet.size === 1000)
    // replay the SQL rendering through Spark's own SQL engine: identical
    val sql = Mixing.minstdSql("id", 41L)
    val viaSql = spark.range(0, 1000).selectExpr("id", s"$sql AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === rows)
  }

  test("globalShuffle is a balanced sharded permutation with dense positions") {
    val df = docs(0, Seq("a" -> 300, "b" -> 200))
    val out = Mixing.globalShuffle(df, "id", numShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length === 500)
    assert(out.map(_._1).toSet.size === 500) // every id exactly once
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    val byShard = out.groupBy(_._2)
    // hash-uniform: no shard more than 2x the mean
    assert(byShard.values.forall(g => g.length < 2 * 500 / 8))
    // positions are 1..|shard| dense
    byShard.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq === (1 to g.length))
    }
    // deterministic: re-run identical; different seed = different shuffle
    val again = Mixing.globalShuffle(df, "id", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSet === out.toSet)
    val other = Mixing.globalShuffle(df, "id", 8, seed = 99L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(other.toSet !== out.toSet)
  }

  test("writeShards materializes the globalShuffle stream per shard directory") {
    val df = docs(0, Seq("a" -> 300)).select("id")
    withTmpDir { dir =>
      val out = s"$dir/shards"
      graft.operators.Mixing.writeShards(df, "id", out, numShards = 4)
      val want = graft.operators.Mixing.globalShuffle(df, "id", 4).collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      (0 until 4).foreach { s =>
        val rows = spark.read.parquet(s"$out/shard=$s")
          .select("id", "skey").collect()
        val skeys = rows.map(_.getLong(1)).toSeq
        assert(skeys === skeys.sorted, s"shard $s rows not in stream order")
        assert(rows.map(_.getLong(0)).toSeq === want(s),
          s"shard $s content/order disagrees with globalShuffle")
      }
    }
  }

  test("temperatureSample flattens toward small domains and hits the target") {
    // heavily skewed: 1600 vs 100 docs. τ=2 rates ∝ √n, so the small
    // domain's KEEP RATE is √(1600/100) = 4x the big one's.
    val df = docs(0, Seq("big" -> 1600, "small" -> 100))
    val kept = Mixing.temperatureSample(df, "id", "dom", targetFrac = 0.25)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum
    // expected picks: T = 425; shares √1600 : √100 = 40 : 10 → 340 / 85
    assert(total > 350 && total < 500, s"total $total")
    val rateBig = kept("big").toDouble / 1600
    val rateSmall = kept("small").toDouble / 100
    assert(rateSmall > 2.5 * rateBig,
      s"flattening missing: small $rateSmall vs big $rateBig")
    // τ=1 is proportional: rates equalish across domains
    val prop = Mixing.temperatureSample(df, "id", "dom", 0.25, tau = 1.0)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pBig = prop("big").toDouble / 1600
    val pSmall = prop("small").toDouble / 100
    assert(math.abs(pSmall - pBig) < 0.1, s"τ=1 should be proportional: $pBig vs $pSmall")
  }

  test("temperatureSample plan: corpus never shuffles — broadcast join only") {
    val df = docs(0, Seq("a" -> 50, "b" -> 50))
    val plan = Mixing.temperatureSample(df, "id", "dom", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("steeredSample pulls the cumulative mix toward target under skewed arrivals") {
    val targets = Map("a" -> 0.5, "b" -> 0.5)
    def share(counts: Map[String, Long], d: String): Double =
      counts.getOrElse(d, 0L).toDouble / counts.values.sum
    val emptyHist = docs(0, Seq("a" -> 1)).limit(0)
      .select(col("id"), col("dom")).groupBy("dom").agg(count(lit(1)).as("have"))
    // batch 1: ALL domain a (the one-crawl-dump-one-domain arrival)
    val b1 = docs(0, Seq("a" -> 200))
    val acc1 = Mixing.steeredSample(b1, "id", "dom", targets, emptyHist)
    val c1 = Mixing.acceptedCounts(acc1, "dom").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only a available: budget 100, target share 0.5 → deficit 50
    assert(c1.keySet === Set("a"))
    assert(c1("a") >= 35 && c1("a") <= 65, s"got $c1")
    // batch 2: ALL domain b — steering must favor b to close the gap
    val b2 = docs(1000, Seq("b" -> 200))
    val acc2 = Mixing.steeredSample(b2, "id", "dom", targets,
      Mixing.acceptedCounts(acc1, "dom"))
    val c2all = (acc1.unionByName(acc2)).groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // b's deficit = 0.5·(have_a + 100) − 0, larger than a's was → the
    // cumulative shares should be near balanced now
    assert(math.abs(share(c2all, "a") - 0.5) < 0.2,
      s"steering failed to rebalance: $c2all")
    // batch 3: mixed arrivals keep converging, never reverse
    val b3 = docs(2000, Seq("a" -> 100, "b" -> 100))
    val acc3 = Mixing.steeredSample(b3, "id", "dom", targets,
      Mixing.acceptedCounts(acc1.unionByName(acc2), "dom"))
    val c3all = (acc1.unionByName(acc2).unionByName(acc3))
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(share(c3all, "a") - 0.5) <= math.abs(share(c2all, "a") - 0.5) + 0.05,
      s"batch 3 diverged: $c2all -> $c3all")
    // unbudgeted domain is never accepted
    val b4 = docs(3000, Seq("c" -> 50))
    val acc4 = Mixing.steeredSample(b4, "id", "dom", targets, emptyHist)
    assert(acc4.count() === 0)
    // deterministic re-run
    assert(Mixing.steeredSample(b1, "id", "dom", targets, emptyHist)
      .collect().map(_.getLong(0)).sorted.toSeq ===
      acc1.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("epochPlan: cap, full+partial, partial-only, and unbudgeted regimes") {
    val df = docs(0, Seq("cap" -> 10, "frac" -> 10, "tiny" -> 10, "none" -> 10))
      .withColumn("tok", lit(100L))
    // avail = 1000 each. cap: 9000 → 9 full, capped at 3, rem 0.
    // frac: 1500 → 1 full + rem 500 (expected ~5 of 10 docs get a 2nd).
    // tiny: 400 → 0 full + rem 400. none: absent → 0.
    val out = Mixing.epochPlan(df, "id", "dom", "tok",
      budgets = Map("cap" -> 9000L, "frac" -> 1500L, "tiny" -> 400L),
      maxEpochs = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.length === 40)
    val byDom = out.groupBy(_._2)
    assert(byDom("cap").forall(_._4 === 3))
    assert(byDom("none").forall(_._4 === 0))
    assert(byDom("frac").forall(r => r._4 === 1 || r._4 === 2))
    assert(byDom("frac").exists(_._4 === 2))
    assert(byDom("tiny").forall(r => r._4 === 0 || r._4 === 1))
    // expected-token coverage: partial-epoch draw of `frac` targets 500
    // of 1000 tokens — the hash threshold admits rem/avail of docs in
    // expectation; with 10 docs just assert it's neither none nor all
    val fracExtra = byDom("frac").count(_._4 === 2)
    assert(fracExtra > 0 && fracExtra < 10)
    // deterministic re-run
    val again = Mixing.epochPlan(df, "id", "dom", "tok",
      budgets = Map("cap" -> 9000L, "frac" -> 1500L, "tiny" -> 400L),
      maxEpochs = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("epochPlan plan shape: map-only over the corpus, broadcast stats") {
    val df = docs(0, Seq("a" -> 20)).withColumn("tok", lit(10L))
    val plan = Mixing.epochPlan(df, "id", "dom", "tok", Map("a" -> 100L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("splitAssign: bands are exact, stable under corpus growth, fractions validated") {
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Mixing.splitAssign(docs, "doc_id",
      Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000L)
    // the MINSTD draw is uniform: realized shares track the bands
    assert(counts("train") > 1700 && counts("train") < 1900, s"$counts")
    assert(counts("val") > 60 && counts("val") < 140, s"$counts")
    // STABILITY: a doc's split never changes when other docs arrive —
    // the property that keeps eval sets honest as the corpus accretes
    val half = Mixing.splitAssign(docs.filter(col("doc_id") < 1000),
      "doc_id", Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    half.foreach { case (id, sp) => assert(full(id) === sp, s"doc $id moved") }
    // deterministic across invocations
    assert(Mixing.splitAssign(docs, "doc_id", Seq(("a", 0.5), ("b", 0.5)))
      .collect().map(_.getString(2)).toSeq ===
      Mixing.splitAssign(docs, "doc_id", Seq(("a", 0.5), ("b", 0.5)))
        .collect().map(_.getString(2)).toSeq)
    // validation: fractions must sum to 1; sub-resolution bands refuse
    intercept[IllegalArgumentException] {
      Mixing.splitAssign(docs, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      Mixing.splitAssign(docs, "doc_id", Seq(("a", 0.99999), ("b", 0.00001)))
    }
    intercept[IllegalArgumentException] {
      Mixing.splitAssign(docs, "doc_id", Seq(("a", 0.5), ("a", 0.5)))
    }
    // map-only: assignment must not shuffle the corpus
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString)
  }

  test("sampleExactN: exactly k, deterministic, subset-monotone, top-k plan") {
    val docs = (0L until 500L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    val s100 = Mixing.sampleExactN(docs, "doc_id", 100)
    assert(s100.count() === 100L)
    assert(s100.columns.toSeq === Seq("doc_id", "grp"), "helper column must drop")
    // deterministic and NESTED: the k=50 sample is a prefix of the k=100
    // sample under the same hash order (growable sample sizes)
    val ids100 = s100.collect().map(_.getLong(0)).toSet
    val ids50 = Mixing.sampleExactN(docs, "doc_id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(ids50.subsetOf(ids100))
    assert(Mixing.sampleExactN(docs, "doc_id", 0).count() === 0L)
    // scale shape: top-k, never a global sort
    val plan = s100.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"exact-N sample must plan as top-k:\n$plan")
  }

  test("writeShardsResumable: crash-resume writes only missing shards, committed stay untouched") {
    withTmpDir { tmp =>
      val out = s"$tmp/shards"
      val docs = (0L until 400L).map(i => (i, s"doc $i payload")).toDF("doc_id", "text")
      // full export commits every shard
      val (w1, s1) = Mixing.writeShardsResumable(docs, "doc_id", out, numShards = 8)
      assert((w1, s1) === ((8, 0)))
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      def p(x: String) = new org.apache.hadoop.fs.Path(x)
      // reference content from the plain writer (same layout contract)
      val want = spark.read.parquet(out).select("doc_id", "shard", "skey")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      // simulate a crash that lost shards 2 and 5: manifests gone, one of
      // them also left an uncommitted partial dir
      Seq(2, 5).foreach(i => fs.delete(p(s"$out/_manifest/$i.json"), false))
      fs.delete(p(s"$out/shard=2"), true)
      // shard 5's dir stays on disk but is UNCOMMITTED -> must rewrite
      val mtimesBefore = (0 until 8).filterNot(Set(2, 5)).map(i =>
        i -> fs.getFileStatus(p(s"$out/shard=$i")).getModificationTime).toMap
      val (w2, s2) = Mixing.writeShardsResumable(docs, "doc_id", out, numShards = 8)
      assert((w2, s2) === ((2, 6)), "resume writes exactly the missing shards")
      // committed shards' directories were never touched
      mtimesBefore.foreach { case (i, t) =>
        assert(fs.getFileStatus(p(s"$out/shard=$i")).getModificationTime === t,
          s"shard $i was rewritten on resume") }
      // resumed content identical to the full export
      val got = spark.read.parquet(out).select("doc_id", "shard")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === want)
      assert(got.size === 400)
      // idempotent once complete
      assert(Mixing.writeShardsResumable(docs, "doc_id", out, 8) === ((0, 8)))
      // resuming under DIFFERENT parameters would mix incompatible shard
      // layouts — must refuse loudly, not report success
      val pe = intercept[IllegalStateException] {
        Mixing.writeShardsResumable(docs, "doc_id", out, numShards = 4)
      }
      assert(pe.getMessage.contains("incompatible"), pe.getMessage)
      intercept[IllegalStateException] {
        Mixing.writeShardsResumable(docs, "doc_id", out, 8, seed = 99L)
      }
      // non-numeric split ids refuse up front (NULL-cast would send the
      // whole corpus to the last split)
      val strDocs = Seq(("a", 1)).toDF("doc_id", "v")
      intercept[IllegalArgumentException] {
        Mixing.splitAssign(strDocs, "doc_id", Seq(("x", 0.5), ("y", 0.5)))
      }
      intercept[IllegalArgumentException] {
        Mixing.sampleExactN(strDocs, "doc_id", 1)
      }
      // manifest audit: rows and key_xor match the committed data
      val m2 = graft.util.Fs.readJson(p(s"$out/_manifest/2.json"),
        spark.sparkContext.hadoopConfiguration)
      val shard2 = spark.read.parquet(s"$out/shard=2")
      assert(m2.get("rows").asLong === shard2.count())
      val xor = shard2.selectExpr("bit_xor(skey)").head().getLong(0)
      assert(m2.get("key_xor").asLong === xor)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** The graft_* SQL surface must agree exactly with the DataFrame API's
  * expression constructors — same Catalyst expressions, two spellings. */
class SqlFunctionsSuite extends SparkSpec {
  import spark.implicits._

  test("graft_* SQL functions equal their DataFrame counterparts") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("sqlfns")
    val viaSql = spark.sql(
      """SELECT graft_char_ngrams(text, 5) AS ngrams,
        |  graft_char_ngrams_distinct(text, 5) AS ngrams_d,
        |  graft_word_shingles(text, 2) AS shingles,
        |  graft_minhash(graft_word_shingles(text, 2), 16) AS mh,
        |  graft_minhash_char_ngrams(text, 5, 16) AS mh_cn,
        |  graft_minhash_word_shingles(text, 2, 16) AS mh_ws,
        |  graft_simhash64(graft_word_shingles(text, 2)) AS sh,
        |  graft_winnow(text, 5, 4) AS wn
        |FROM sqlfns""".stripMargin).head()
    val viaApi = df.select(
      graft.functions.CharNgramFunctions.charNgramsFast($"text", 5).as("ngrams"),
      graft.functions.CharNgramFunctions.charNgramsDistinct($"text", 5).as("ngrams_d"),
      graft.functions.TextFunctions.wordShingles($"text", 2).as("shingles"),
      graft.functions.MinHashFunctions.minhashSig(
        graft.functions.TextFunctions.wordShingles($"text", 2), 16).as("mh"),
      graft.functions.FusedMinHashFunctions.minhashCharNgrams($"text", 5, 16).as("mh_cn"),
      graft.functions.FusedMinHashFunctions.minhashWordShingles($"text", 2, 16).as("mh_ws"),
      graft.functions.SimHashFunctions.simhash(
        graft.functions.TextFunctions.wordShingles($"text", 2)).as("sh"),
      graft.functions.WinnowingFunctions.winnowFingerprints($"text", 5, 4).as("wn")).head()
    (0 until viaSql.length).foreach { i =>
      assert(viaSql.get(i) === viaApi.get(i), s"column $i diverged")
    }
    // vec dot through SQL
    val dot = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(dot === 11.0)
    // non-literal tuning argument fails loudly, not silently wrong
    val e = intercept[Exception](
      spark.sql("SELECT graft_char_ngrams(text, id + 1) FROM sqlfns").collect())
    assert(e.getMessage.contains("literal integer") ||
      Option(e.getCause).exists(_.getMessage.contains("literal integer")),
      s"unexpected error: ${e.getMessage}")
  }

  test("char_ngram_hashes is bit-identical to transform(char_ngrams, xxhash64)") {
    import graft.functions.{CharNgramFunctions, CharNgramHashFunctions}
    import org.apache.spark.sql.functions.{transform, xxhash64}
    // multi-byte UTF-8, repeats (distinct path), short text (whole-text
    // gram), empty string, plus real corpus rows below
    val df = Seq("hello hello world", "héllo wörld héllo", "ab", "",
      "ααββγγ ααββγγ", "a" * 500).toDF("text")
    Seq(3, 5, 12).foreach { n =>
      val mismatch = df.select(
          CharNgramHashFunctions.charNgramHashes($"text", n).as("fast"),
          transform(CharNgramFunctions.charNgramsFast($"text", n),
            g => xxhash64(g)).as("ref"),
          CharNgramHashFunctions.charNgramHashesDistinct($"text", n).as("fast_d"),
          transform(CharNgramFunctions.charNgramsDistinct($"text", n),
            g => xxhash64(g)).as("ref_d"))
        .filter($"fast" =!= $"ref" || $"fast_d" =!= $"ref_d")
      assert(mismatch.count() === 0, s"n=$n diverged")
    }
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val bad = docs.select(
          CharNgramHashFunctions.charNgramHashesDistinct($"text", 12).as("fast"),
          transform(CharNgramFunctions.charNgramsDistinct($"text", 12),
            g => xxhash64(g)).as("ref"))
        .filter($"fast" =!= $"ref").count()
      assert(bad === 0, "corpus parity failed")
    }
  }

  test("byteEntropy: known values, empty guard, codegen parity") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "ab" * 150),     // two symbols equiprobable -> exactly 1 bit
      (2L, "aaaa"),         // one symbol -> 0
      (3L, ""),             // empty -> 0 by the guard
      (4L, "abcd" * 10),    // four equiprobable -> exactly 2 bits
      (5L, "the quick brown fox jumps over the lazy dog"))
    val out = rows.toDF("id", "text")
      .select($"id", TextFunctions.byteEntropy($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
    assert(out(4L) === 2.0)
    assert(out(5L) > 3.0 && out(5L) < 4.5, s"natural text band: ${out(5L)}")
    // the shared helper (interpreted-eval path) must agree bit-for-bit
    // with the codegen'd DataFrame value
    val interp = graft.functions.ByteEntropySumExpr.termSum(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab" * 150))
    val viaDf = rows.toDF("id", "text").filter($"id" === 1L)
      .select(graft.functions.ByteEntropyFunctions.byteEntropySum($"text"))
      .head().getDecimal(0)
    assert(interp.toBigDecimal === BigDecimal(viaDf))
  }

  test("graft_* functions stay inside whole-stage codegen from SQL") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    // a parquet-backed scan, so the projection can't constant-fold into
    // a LocalTableScan
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("sqlfns_plan")
    val plan = spark.sql(
      "SELECT graft_minhash_char_ngrams(text, 5, 16) FROM sqlfns_plan")
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"SQL-invoked expression must stay codegen'd:\n$plan")
  }
}

package graft

import graft.functions.WordGramHashFunctions
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The 128-bit token-gram key (WordGramHashesExpr): h1 compatibility
  * with the old column formulation, h2 INDEPENDENCE (the bug it fixes),
  * and the concat_ws window semantics. */
class WordGramHashesSuite extends SparkSpec {
  import spark.implicits._

  private def oldH1(g: String): Long =
    XXH64.hashUnsafeBytes(g.getBytes("UTF-8"),
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      g.getBytes("UTF-8").length, 42L)

  test("h1 matches xxhash64(concat_ws window); h2 is an independent seed") {
    val df = Seq("a b c d e", "x y", "héllo wörld multi byte grams here").toDF("text")
      .select(split(col("text"), " ").as("w"))
    val n = 3
    val viaExpr = df.select(
      WordGramHashFunctions.wordGramHashes(col("w"), n, " ").as("k")).collect()
    val viaCols = df.select(
      when(size(col("w")) >= n,
        transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>")).as("gs")).collect()
    viaExpr.zip(viaCols).foreach { case (er, cr) =>
      val ks = er.getSeq[org.apache.spark.sql.Row](0)
      val gs = cr.getSeq[String](0)
      assert(ks.length === gs.length)
      ks.zip(gs).foreach { case (k, g) =>
        val bytes = g.getBytes("UTF-8")
        val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        assert(k.getLong(0) === XXH64.hashUnsafeBytes(bytes, off, bytes.length, 42L),
          s"h1 must stay the historical xxhash64(gram) for '$g'")
        assert(k.getLong(1) === XXH64.hashUnsafeBytes(bytes, off, bytes.length, 0x9E3779B9L),
          s"h2 must be an independent seed-0x9E3779B9 pass for '$g'")
        assert(k.getLong(1) !== XXH64.hashLong(0x9E3779B9L, k.getLong(0)),
          "h2 must NOT be the old chained value")
      }
    }
  }

  test("the OLD column formulation's h2 was a function of h1 (the fixed bug)") {
    // xxhash64(g, lit(c)) chains: the accumulated hash of g becomes the
    // seed for hashing c — so the 'second hash' collapsed with the first
    val r = Seq("some gram").toDF("g")
      .select(xxhash64(col("g")).as("h1"),
        xxhash64(col("g"), lit(0x9E3779B9L)).as("h2_old")).head()
    assert(r.getLong(1) === XXH64.hashLong(0x9E3779B9L, r.getLong(0)),
      "Spark's multi-arg xxhash64 no longer chains — revisit the h2 fix rationale")
  }

  test("window semantics: null tokens skip like concat_ws; short arrays empty") {
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS w")
    val k = withNull.select(
      WordGramHashFunctions.wordGramHashes(col("w"), 3, " ").as("k"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    // windows: [a,null,b] -> "a b", [null,b,c] -> "b c" (concat_ws skips)
    assert(k.length === 2)
    assert(k.head.getLong(0) === oldH1("a b"))
    assert(k(1).getLong(0) === oldH1("b c"))
    val short = Seq(Seq("a", "b")).toDF("w")
      .select(WordGramHashFunctions.wordGramHashes(col("w"), 3, " ").as("k"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(short.isEmpty)
  }
}

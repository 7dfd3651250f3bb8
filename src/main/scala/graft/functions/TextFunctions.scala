package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` — native
  * Catalyst expressions that stay inside whole-stage codegen, so a scan over
  * 100 TB of documents never leaves the vectorized path (no UDF
  * serialization boundary).
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token estimate: letter runs, digit runs, and single
    * punctuation marks counted separately — the GPT-2 pre-tokenizer's
    * split classes, as a cheap stand-in for a real tokenizer's count. The
    * pattern avoids lookarounds so Java regex (Spark) and RE2 (DuckDB)
    * agree token for token — what makes it oracle-testable. */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text,
      lit("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""), lit(0))).cast("long")

  /** Ratio of characters that are punctuation, rounded to 4 decimals. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, """[^\p{Punct}]""", "")).cast("double") /
      greatest(length(text), lit(1)), 4)

  /** Single-pass token stats `[n_tokens, sum_chars, hits…]` (codegen'd;
    * see [[TokenStatsExpr]]). Identical expression trees are deduplicated
    * by codegen subexpression elimination, so deriving several ratios from
    * the same `tokenStats` column costs one scan. */
  def tokenStats(text: Column, sets: Seq[Seq[String]]): Column =
    TokenStatsFunctions.tokenStats(text, sets)

  /** Ratio of tokens found in `stopwords`, rounded to 4 decimals. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val st = tokenStats(text, Seq(stopwords))
    round(element_at(st, 3).cast("double") / greatest(element_at(st, 1), lit(1L)), 4)
  }

  /** Mean token length, rounded to 4 decimals. */
  def meanTokenLen(text: Column): Column = {
    val st = tokenStats(text, Seq.empty)
    round(element_at(st, 2).cast("double") / greatest(element_at(st, 1), lit(1L)), 4)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, penalizes
    * punctuation soup and stopword deserts (heuristic, deterministic). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / 500d, lit(1d))
    val punctPenalty = lit(1d) - least(punctRatio(text) * 5, lit(1d))
    val stopScore = least(stopwordRatio(text, stopwords) * 4, lit(1d))
    round((lenScore + punctPenalty + stopScore) / 3, 4)
  }

  /** Stopword-marker language ID: first language whose marker words appear
    * most often among en/de/fr/es; `und` when nothing matches. A classic
    * n-gram-free heuristic that is exactly reproducible in ANSI SQL. */
  def langIdHeuristic(text: Column): Column = {
    // all four marker sets counted in ONE tokenize pass (codegen'd)
    val st = tokenStats(text, Seq(
      Seq("the", "and", "of", "to", "a"),
      Seq("der", "die", "das", "und", "ist"),
      Seq("le", "la", "les", "et", "est"),
      Seq("el", "los", "las", "y", "es")))
    val Seq(en, de, fr, es) = (3 to 6).map(i => element_at(st, i))
    val m = greatest(en, de, fr, es)
    when(m === 0, "und")
      .when(en === m, "en")
      .when(de === m, "de")
      .when(fr === m, "fr")
      .otherwise("es")
  }

  /** Shannon entropy (bits) of the byte distribution — the cheap
    * gibberish/boilerplate signal: ~1 bit for binary filler, ~4.1 for
    * natural English, ~6+ for random bytes. The data-dependent term sum
    * is one codegen'd histogram pass ([[ByteEntropySumExpr]], zero
    * shuffle); this wrapper assembles `H = (ln n − Σ/n) / ln 2` in plain
    * Column arithmetic mirrored token-for-token by the SQL oracle.
    * Empty strings score 0. */
  def byteEntropy(text: Column): Column = {
    val nB = length(text.cast("binary")).cast("double")
    val s = ByteEntropyFunctions.byteEntropySum(text).cast("double")
    when(nB <= 0, lit(0d)).otherwise(
      round((log(nB) - s / nB) / lit(math.log(2.0)), 4))
  }

  /** Content fingerprint (md5 hex) for exact dedup — stable across engines. */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit rolling-style document fingerprint: xxhash64 of the
    * whitespace-normalized text (word-order sensitive, whitespace
    * insensitive). */
  def normalizedFingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", filter(split(text, """\s+"""), t => length(t) > 0)))

  /** `n`-word shingles from whitespace tokens (codegen'd; see
    * [[WordShinglesExpr]]). */
  def wordShingles(text: Column, n: Int): Column =
    ShingleFunctions.wordShinglesFast(text, n)

  /** Character `n`-grams (codegen'd; see [[CharNgramsExpr]] — equals the
    * `transform(sequence(...), i -> substr(text, i, n))` formulation with
    * the whole-text collapse for short strings). */
  def charNgrams(text: Column, n: Int): Column =
    CharNgramFunctions.charNgramsFast(text, n)

  /** Jaccard similarity of two string arrays (as sets), rounded to 4. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    round(when(union === 0, 0d).otherwise(inter / union), 4)
  }

  /** MinHash signature of a shingle array: `k` min-hashes via
    * Kirsch-Mitzenmacher double hashing — each shingle is string-hashed
    * ONCE (h1 = xxhash64(s), h2 = xxhash64(h1)), then hash_i = h1 + i*h2.
    * Delegates to the codegen'd [[MinHashSignatureExpr]] (the interpreted
    * higher-order-function formulation was the dedup hot path).
    * Returns array<bigint>[k]. */
  def minhashSignature(shingles: Column, k: Int): Column =
    MinHashFunctions.minhashSig(shingles, k)

  /** LSH band keys for a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature entries. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(concat_ws(",", slice(signature, b * rowsPerBand + 1, rowsPerBand)))): _*)

  /** Number of SimHash bits (bit positions unrolled as Scala constants —
    * shift amounts must be literals in the Column API; the expression tree
    * is static and fully codegen'd). */
  val SimhashBits = 64

  /** 64-bit SimHash over tokens: per-bit vote of token xxhash64 bits.
    * Near-duplicate docs land within small Hamming distance. */
  def simhash64(toks: Column): Column = {
    // votes: array[64] of sum(+1/-1) over token-hash bits
    val zeros = array((0 until SimhashBits).map(_ => lit(0L)): _*)
    val votes = aggregate(
      toks, zeros,
      (acc, t) => {
        val h = xxhash64(t)
        array((0 until SimhashBits).map { b =>
          element_at(acc, b + 1) +
            when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        }: _*)
      })
    (0 until SimhashBits).map { b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}

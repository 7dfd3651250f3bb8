package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle+MinHash expressions: compute the k-entry MinHash signature
  * directly from the document string, hashing each shingle as a byte window
  * of the original text — no shingle array is ever materialized.
  *
  * Equivalences (each verified by a suite test):
  *  - char n-grams: a gram is a contiguous char span, so its UTF-8 bytes
  *    are a contiguous byte window (char-start offsets respect multi-byte
  *    sequences).
  *  - word n-shingles: `split(" ")` tokens re-joined with `" "` reproduce
  *    the exact original byte span between the first token's start and the
  *    last token's end, because every separator is exactly one 0x20 byte
  *    (which can never occur inside a multi-byte UTF-8 sequence).
  *
  * So `minhash_char_ngrams(text, n, k)` ≡
  * `minhash_signature(char_ngrams(text, n), k)` and
  * `minhash_word_shingles(text, n, k)` ≡
  * `minhash_signature(word_shingles(text, n), k)`, at zero allocation per
  * shingle. This is the corpus-wide signature pass of every LSH dedup — at
  * 100 TB the avoided garbage is measured in petabytes.
  */
object MinHashShingles {
  private def accumulate(mins: Array[Long], h1: Long, k: Int): Unit = {
    val h2 = XXH64.hashLong(h1, 42L)
    var h = h1
    var i = 0
    while (i < k) {
      if (h < mins(i)) mins(i) = h
      h += h2
      i += 1
    }
  }

  private def wholeTextSig(text: UTF8String, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    accumulate(mins, XXH64.hashUTF8String(text, 42L), k)
    mins
  }

  /** Signature over char n-grams (called from generated java). */
  def sigCharNgrams(text: UTF8String, n: Int, k: Int): Array[Long] = {
    val numChars = text.numChars()
    if (numChars < n) return wholeTextSig(text, k)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes()
    // byte offset of each char start (UTF-8 continuation bytes are 10xxxxxx)
    val charOff = new Array[Int](numChars + 1)
    var ci = 0
    var bi = 0
    while (bi < nb) {
      if ((Platform.getByte(base, off + bi) & 0xC0) != 0x80) { charOff(ci) = bi; ci += 1 }
      bi += 1
    }
    charOff(numChars) = nb
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val nGrams = numChars - n + 1
    while (i < nGrams) {
      val start = charOff(i)
      accumulate(mins,
        XXH64.hashUnsafeBytes(base, off + start, charOff(i + n) - start, 42L), k)
      i += 1
    }
    mins
  }

  /** Signature over word n-shingles (called from generated java). */
  def sigWordShingles(text: UTF8String, n: Int, k: Int): Array[Long] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes()
    // token start offsets: 0 and every byte following a 0x20
    var nTokens = 1
    var bi = 0
    while (bi < nb) {
      if (Platform.getByte(base, off + bi) == 0x20) nTokens += 1
      bi += 1
    }
    if (nTokens < n) return wholeTextSig(text, k)
    val tokStart = new Array[Int](nTokens + 1)
    var ti = 1
    bi = 0
    while (bi < nb) {
      if (Platform.getByte(base, off + bi) == 0x20) { tokStart(ti) = bi + 1; ti += 1 }
      bi += 1
    }
    tokStart(nTokens) = nb + 1 // sentinel: end(j) = tokStart(j+1) - 1
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val nShingles = nTokens - n + 1
    while (i < nShingles) {
      val start = tokStart(i)
      val end = tokStart(i + n) - 1 // byte before the separator after last token
      accumulate(mins, XXH64.hashUnsafeBytes(base, off + start, end - start, 42L), k)
      i += 1
    }
    mins
  }
}

/** Fused PORTABLE-hash word-shingle MinHash — the poly-31-fold sibling
  * of [[MinHashShingles.sigWordShingles]], backing the oracle-checkable
  * LSH variant ([[graft.operators.Dedup.minhashLshPairsPortable]]).
  * Per shingle: `h1 = fold(cp → h·31 + cp) mod mod1`, stride
  * `h2 = 2·(fold mod mod2) + 1`, `hash_i = h1 + i·h2` — identical to
  * the interpreted `aggregate(split(s, ''))` Column formulation (the
  * fold runs over CODE POINTS, matching both engines' `ascii`) and to
  * the DuckDB LIST_REDUCE replay, but one codegen pass over the
  * document with zero per-shingle allocation. */
object PolyMinHash {
  def sig(text: UTF8String, n: Int, k: Int, mod1: Long,
      mod2: Long): Array[Long] = {
    val s = text.toString
    val len = s.length
    // token start offsets in UTF-16 units: 0 and after every ' '
    var nTokens = 1
    var ci = 0
    while (ci < len) {
      if (s.charAt(ci) == ' ') nTokens += 1
      ci += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    if (nTokens < n) {
      // whole-text collapse (the wordShingles short-document rule)
      accumulate(mins, s, 0, len, k, mod1, mod2)
      return mins
    }
    val tokStart = new Array[Int](nTokens + 1)
    var ti = 1
    ci = 0
    while (ci < len) {
      if (s.charAt(ci) == ' ') { tokStart(ti) = ci + 1; ti += 1 }
      ci += 1
    }
    tokStart(nTokens) = len + 1 // sentinel: end(j) = tokStart(j+1) - 1
    var i = 0
    val nShingles = nTokens - n + 1
    while (i < nShingles) {
      // the joined window IS the original span (single-0x20 separators)
      accumulate(mins, s, tokStart(i), tokStart(i + n) - 1, k, mod1, mod2)
      i += 1
    }
    mins
  }

  /** Fold the span's code points under both moduli, then walk the
    * Kirsch-Mitzenmacher chain into the running minima. */
  private def accumulate(mins: Array[Long], s: String, from: Int,
      until: Int, k: Int, mod1: Long, mod2: Long): Unit = {
    var h1 = 0L
    var h2 = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 31 + cp) % mod1
      h2 = (h2 * 31 + cp) % mod2
      i += Character.charCount(cp)
    }
    val stride = 2 * h2 + 1
    var h = h1
    var j = 0
    while (j < k) {
      if (h < mins(j)) mins(j) = h
      h += stride
      j += 1
    }
  }
}

/** Portable 62-bit SimHash — the poly-31 sibling of
  * [[TextFunctions.simhash64]], backing the oracle-checkable variant
  * ([[graft.operators.Dedup.simhashPairsPortable]]): per token,
  * `h = (fold mod mod1)·2^31 + (fold mod mod2)` (62 bits, both halves
  * poly-31 code-point folds — the d_quality_clf recipe, ANSI-replayable
  * where XXH64 is not), then the standard per-bit ±1 vote with ties →
  * 0. Tokens split on single 0x20 KEEPING empties (the production
  * `tokens()` rule — `STRING_SPLIT` on both engines). The result is
  * non-negative (bit 63 never set), so `//`-based bit extraction
  * replays without sign games. */
object PolySimHash {
  val Bits = 62

  def sig(text: UTF8String, mod1: Long, mod2: Long): Long = {
    val s = text.toString
    val len = s.length
    val votes = new Array[Int](Bits)
    var wordStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        var h1 = 0L
        var h2 = 0L
        var j = wordStart
        while (j < i) {
          val cp = s.codePointAt(j)
          h1 = (h1 * 31 + cp) % mod1
          h2 = (h2 * 31 + cp) % mod2
          j += Character.charCount(cp)
        }
        val h = h1 * 2147483648L + h2
        var b = 0
        while (b < Bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        wordStart = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** text → 62-bit portable SimHash (see [[PolySimHash]]). */
case class PolySimHashExpr(child: Expression, mod1: Long, mod2: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_simhash requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PolySimHash.sig(input.asInstanceOf[UTF8String], mod1, mod2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = PolySimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.sig($a, ${mod1}L, ${mod2}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): PolySimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "poly_simhash"
}

/** text → array<bigint>[k] portable poly-31 MinHash signature (see
  * [[PolyMinHash]]). */
case class PolyMinHashExpr(child: Expression, n: Int, k: Int, mod1: Long,
    mod2: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_minhash requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PolyMinHash.sig(input.asInstanceOf[UTF8String], n, k, mod1, mod2))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = PolyMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($helper.sig($a, $n, $k, ${mod1}L, ${mod2}L));"
    })

  override protected def withNewChildInternal(newChild: Expression): PolyMinHashExpr =
    copy(child = newChild)

  override def prettyName: String = "poly_minhash"
}

// NOTE: no `require` in this (non-serializable, abstract) class body — at
// Java deserialization on an executor the first non-serializable
// superclass's no-arg constructor runs BEFORE the case-class fields are
// populated, so a body-level precondition on n/k reads zeros and aborts
// the task. Validation lives in [[FusedMinHashFunctions]].
abstract class FusedMinHashExpr extends UnaryExpression {
  def n: Int
  def k: Int

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got $other")
    }

  /** Name of the static helper on [[MinHashShingles]]. */
  protected def helperMethod: String

  override def nullSafeEval(input: Any): Any = {
    val sig =
      if (helperMethod == "sigCharNgrams")
        MinHashShingles.sigCharNgrams(input.asInstanceOf[UTF8String], n, k)
      else MinHashShingles.sigWordShingles(input.asInstanceOf[UTF8String], n, k)
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = MinHashShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($helper.$helperMethod($a, $n, $k));"
    })
}

case class MinHashCharNgramsExpr(child: Expression, n: Int, k: Int)
    extends FusedMinHashExpr {
  override protected def helperMethod: String = "sigCharNgrams"
  override protected def withNewChildInternal(newChild: Expression): MinHashCharNgramsExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_char_ngrams"
}

case class MinHashWordShinglesExpr(child: Expression, n: Int, k: Int)
    extends FusedMinHashExpr {
  override protected def helperMethod: String = "sigWordShingles"
  override protected def withNewChildInternal(newChild: Expression): MinHashWordShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_word_shingles"
}

object FusedMinHashFunctions {
  private def validate(n: Int, k: Int): Unit =
    require(n > 0 && k > 0, "shingle width and signature size must be positive")

  /** MinHash signature over char n-grams, fused (string -> array<bigint>[k]). */
  def minhashCharNgrams(text: Column, n: Int, k: Int): Column = {
    validate(n, k)
    Bridge.column(MinHashCharNgramsExpr(Bridge.expression(text), n, k))
  }

  /** MinHash signature over word n-shingles, fused (string -> array<bigint>[k]). */
  def minhashWordShingles(text: Column, n: Int, k: Int): Column = {
    validate(n, k)
    Bridge.column(MinHashWordShinglesExpr(Bridge.expression(text), n, k))
  }

  /** Portable poly-31 MinHash signature over word n-shingles, fused
    * (string -> array<bigint>[k]; see [[PolyMinHash]]). */
  def polyMinhashWordShingles(text: Column, n: Int, k: Int, mod1: Long,
      mod2: Long): Column = {
    validate(n, k)
    // the whole contract is bit-for-bit ANSI replayability: the KM walk
    // h1 + (k-1)·(2·h2+1) must never wrap a signed 64-bit value (an
    // engine that errors-on-overflow, or Java's silent wrap feeding
    // negative minima, both break it) — refuse here like the Dedup
    // operator does, not just at its call site
    // BigInt: the bound check itself must not wrap for absurd moduli
    require(mod1 > 0 && mod2 > 0 &&
      BigInt(mod1) + BigInt(k) * (2 * BigInt(mod2) + 1) < (BigInt(1) << 62),
      s"poly_minhash moduli too large: mod1 + k*(2*mod2+1) must stay " +
        s"below 2^62 so no engine wraps (got mod1=$mod1, mod2=$mod2, k=$k)")
    Bridge.column(PolyMinHashExpr(Bridge.expression(text), n, k, mod1, mod2))
  }

  /** Portable 62-bit SimHash (string -> bigint; see [[PolySimHash]]).
    * Moduli must keep both halves under 2^31 so the packed value stays
    * in 62 bits. */
  def polySimhash(text: Column, mod1: Long, mod2: Long): Column = {
    require(mod1 > 0 && mod1 <= 2147483648L &&
      mod2 > 0 && mod2 <= 2147483648L,
      "poly_simhash moduli must be in (0, 2^31]")
    Bridge.column(PolySimHashExpr(Bridge.expression(text), mod1, mod2))
  }
}

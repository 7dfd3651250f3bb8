package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character-n-gram XXH64 hashes: bit-identical to
  * `transform(char_ngrams(text, n), g -> xxhash64(g))` (seed 42, Spark's
  * `xxhash64`), but hashing each n-char window IN PLACE over the text's
  * byte buffer — no per-gram `UTF8String` allocation, no second pass.
  *
  * This is the corpus-wide candidate stage of every n-gram dedup
  * operator (`ngramContamination`, `charNgramJaccardExactPairs`): those
  * only ever ship 8-byte hashes into their joins, so materializing the
  * gram STRINGS first (the `transform` formulation) allocates
  * `len-n+1` substrings per document just to throw them away after one
  * hash each. Here the window slides over code-point byte offsets and
  * hashes the underlying buffer region directly.
  *
  * `distinct = true` dedups hashes in first-occurrence order via an
  * open-addressed long table (no boxing). The SET equals
  * `transform(array_distinct(grams), hash)` exactly unless two distinct
  * grams of one document collide in 64 bits (~2⁻⁶⁴ per pair) — and the
  * consumers tolerate extra/merged candidates by design (their verify
  * stages are exact over gram strings).
  *
  * Short-text contract matches [[CharNgramsExpr]]: a document shorter
  * than `n` yields one whole-text hash.
  */
case class CharNgramHashesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n > 0, "ngram width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngram_hashes requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgramHashesExpr.hashArray(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = CharNgramHashesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = ($ArrayDataCls) $helper.hashArray($a, $n, $distinct);
       """.stripMargin
    })

  private val ArrayDataCls = classOf[ArrayData].getName

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_hashes"
}

object CharNgramHashesExpr {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Shared by interpreted eval and codegen (called reflectively from
    * generated java). Returns packed long ArrayData. */
  def hashArray(text: UTF8String, n: Int, distinct: Boolean): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hashes(text, n, distinct))

  def hashes(text: UTF8String, n: Int, distinct: Boolean): Array[Long] = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val chars = text.numChars()
    if (chars < n)
      return Array(XXH64.hashUnsafeBytes(base, off, nBytes, Seed))
    // code-point byte offsets: offs(i) = byte start of char i
    val offs = new Array[Int](chars + 1)
    var c = 0
    var b = 0
    while (b < nBytes) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    offs(chars) = nBytes
    val count = chars - n + 1
    if (!distinct) {
      val out = new Array[Long](count)
      var i = 0
      while (i < count) {
        out(i) = XXH64.hashUnsafeBytes(
          base, off + offs(i), offs(i + n) - offs(i), Seed)
        i += 1
      }
      out
    } else {
      // open-addressed long set (power-of-two capacity >= 2*count), no
      // boxing; `used` flags distinguish an occupied 0L from empty
      var cap = 4
      while (cap < count * 2) cap <<= 1
      val table = new Array[Long](cap)
      val used = new Array[Boolean](cap)
      val out = new Array[Long](count)
      val mask = cap - 1
      var m = 0
      var i = 0
      while (i < count) {
        val h = XXH64.hashUnsafeBytes(
          base, off + offs(i), offs(i + n) - offs(i), Seed)
        var idx = ((h ^ (h >>> 32)).toInt) & mask
        var dup = false
        var open = false
        while (!dup && !open) {
          if (!used(idx)) open = true
          else if (table(idx) == h) dup = true
          else idx = (idx + 1) & mask
        }
        if (!dup) {
          used(idx) = true; table(idx) = h
          out(m) = h; m += 1
        }
        i += 1
      }
      if (m == count) out else java.util.Arrays.copyOf(out, m)
    }
  }
}

object CharNgramHashFunctions {
  /** Codegen'd n-gram hashes (string -> array<long>); equals
    * `transform(char_ngrams(text, n), g -> xxhash64(g))`. */
  def charNgramHashes(text: Column, n: Int): Column =
    Bridge.column(CharNgramHashesExpr(Bridge.expression(text), n, distinct = false))

  /** Codegen'd DISTINCT n-gram hashes in first-occurrence order; equals
    * `transform(array_distinct(char_ngrams(text, n)), g -> xxhash64(g))`
    * modulo intra-document 64-bit collisions (see scaladoc). */
  def charNgramHashesDistinct(text: Column, n: Int): Column =
    Bridge.column(CharNgramHashesExpr(Bridge.expression(text), n, distinct = true))
}

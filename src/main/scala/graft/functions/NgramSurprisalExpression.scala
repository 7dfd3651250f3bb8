package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document LM-surprisal sum: bit-identical to
  *
  * {{{ aggregate(transform(char_ngrams(text, n),
  *       g -> -ln((coalesce(element_at(model, g), 0) + 1) / denom)),
  *     0 as decimal(30,9), (acc, x) -> acc + x as decimal(30,9)) }}}
  *
  * but O(log V) per window instead of the map literal's O(V) linear
  * `element_at` scan, with zero per-window allocation: the model lives
  * as a SORTED array of seed-42 XXH64 gram hashes aligned with the
  * PRE-QUANTIZED scaled-long surprisal of each entry (the double →
  * DECIMAL(30,9) conversion happens once per model entry at plan
  * construction — `java.math.BigDecimal.valueOf` + HALF_UP, exactly
  * Spark's double→decimal cast path — never per window), so each window
  * is an in-place hash, a binary search, and a long add. The exact
  * decimal(·,9) summation is exact long addition on the scaled values
  * (no overflow: |term| < 50·10⁹, docs < 2^40 windows).
  *
  * Windows hash in place over the text's byte buffer (code-point
  * offsets, [[CharNgramHashesExpr]] machinery, whole-text window when
  * the document is shorter than n). Model lookups key on the 64-bit
  * gram hash: two distinct grams (model↔model or document↔model)
  * collide with probability ~V²/2⁶⁵ — at a 10⁶-gram vocabulary ~10⁻⁸ of
  * one window EVER scoring under a wrong count — and the model is
  * bounded by the n-gram alphabet, so this does not grow with corpus
  * size.
  */
case class NgramSurprisalExpr(child: Expression, n: Int,
    modelHashes: Array[Long], modelNll9: Array[Long], unseenNll9: Long)
    extends UnaryExpression {
  require(n > 0, "ngram width must be positive")
  require(modelHashes.length == modelNll9.length,
    "model hash/nll arrays must align")

  override def dataType: DataType = DecimalType(30, 9)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_surprisal requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramSurprisalExpr.sumNll(input.asInstanceOf[UTF8String], n,
      modelHashes, modelNll9, unseenNll9)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NgramSurprisalExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val hashesRef = ctx.addReferenceObj("surprisalHashes", modelHashes, "long[]")
    val nllRef = ctx.addReferenceObj("surprisalNll9", modelNll9, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[Decimal].getName}) $helper.sumNll(
         |  $a, $n, $hashesRef, $nllRef, ${unseenNll9}L);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramSurprisalExpr =
    copy(child = newChild)

  override def prettyName: String = "ngram_surprisal"
}

object NgramSurprisalExpr {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Shared by interpreted eval and codegen. Returns the exact
    * DECIMAL(30,9) sum of per-window quantized surprisals. */
  def sumNll(text: UTF8String, n: Int, modelHashes: Array[Long],
      modelNll9: Array[Long], unseenNll9: Long): Decimal = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val chars = text.numChars()
    var sum = 0L
    if (chars < n) {
      val h = XXH64.hashUnsafeBytes(base, off, nBytes, Seed)
      val idx = java.util.Arrays.binarySearch(modelHashes, h)
      sum = if (idx >= 0) modelNll9(idx) else unseenNll9
    } else {
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
      var i = 0
      while (i < count) {
        val h = XXH64.hashUnsafeBytes(
          base, off + offs(i), offs(i + n) - offs(i), Seed)
        val idx = java.util.Arrays.binarySearch(modelHashes, h)
        sum += (if (idx >= 0) modelNll9(idx) else unseenNll9)
        i += 1
      }
    }
    Decimal(BigDecimal(java.math.BigDecimal.valueOf(sum, 9)), 30, 9)
  }

  /** Quantize a double surprisal term exactly as Spark's double →
    * DECIMAL(30,9) cast does (BigDecimal.valueOf = Double.toString
    * shortest-representation path, then HALF_UP at scale 9). */
  def nll9(nll: Double): Long =
    java.math.BigDecimal.valueOf(nll)
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Seed-42 XXH64 of a gram string — the hash the window loop computes
    * in place; model keys must go through the SAME function. */
  def gramHash(g: String): Long = {
    val u = UTF8String.fromString(g)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), Seed)
  }
}

object NgramSurprisalFunctions {
  /** Codegen'd surprisal sum (string -> decimal(30,9)); equals the
    * `aggregate(transform(...))` HOF formulation over a count-map
    * literal (parity property-pinned) at O(log V) per window. Takes the
    * PREPARED model arrays; [[graft.operators.Curation.surprisalScore]]
    * builds them from an [[graft.operators.Curation.NgramLm]]. */
  def surprisalSum(text: Column, n: Int, modelHashes: Array[Long],
      modelNll9: Array[Long], unseenNll9: Long): Column =
    Bridge.column(NgramSurprisalExpr(Bridge.expression(text), n,
      modelHashes, modelNll9, unseenNll9))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-histogram entropy term sum: the exact DECIMAL(30,9)
  * value of `sum over byte values b with count k_b > 0 of k_b * ln(k_b)`
  * - the data-dependent half of the Shannon entropy
  * `H = (ln(n) - sum/n) / ln 2`, which
  * [[graft.functions.TextFunctions.byteEntropy]] assembles in plain
  * Column arithmetic so a SQL oracle can mirror it token for token.
  *
  * Entropy is the classic cheap gibberish/boilerplate signal (low for
  * repeated filler, high for random bytes; natural text sits in a
  * narrow band). One pass over the string's byte buffer, a 256-slot
  * histogram, ZERO shuffle and zero per-row allocation beyond the
  * histogram - the alternative formulation (explode characters,
  * groupBy count) shuffles every byte of the corpus.
  *
  * Determinism: each term k*ln(k) is quantized to DECIMAL(30,9) via
  * BigDecimal.valueOf + HALF_UP - the same double-to-decimal path the
  * oracle's `CAST(x AS DECIMAL(30,9))` takes (the
  * [[NgramSurprisalExpr]] recipe) - and the quantized longs add
  * exactly, so summation order cannot move the result. ln's last ulp
  * is implementation-defined, which round(.,4) at the surface absorbs
  * (the d_bm25 / d_lm_surprisal precedent). */
case class ByteEntropySumExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(30, 9)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_entropy_sum requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ByteEntropySumExpr.termSum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ByteEntropySumExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[Decimal].getName}) $helper.termSum($a);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ByteEntropySumExpr =
    copy(child = newChild)

  override def prettyName: String = "byte_entropy_sum"
}

object ByteEntropySumExpr {

  /** Exact DECIMAL(30,9) of sum k_b * ln(k_b); shared by interpreted
    * eval and codegen. */
  def termSum(text: UTF8String): Decimal = {
    val hist = new Array[Int](256)
    val nBytes = text.numBytes()
    var i = 0
    while (i < nBytes) {
      hist(text.getByte(i) & 0xff) += 1
      i += 1
    }
    var sum = 0L
    var b = 0
    while (b < 256) {
      val k = hist(b)
      if (k > 1) sum += term9(k) // k == 1 contributes ln(1) = 0 exactly
      b += 1
    }
    Decimal(BigDecimal(java.math.BigDecimal.valueOf(sum, 9)), 30, 9)
  }

  /** k * ln(k) quantized to scale 9 exactly as a double-to-DECIMAL(30,9)
    * cast does (shortest-decimal string, HALF_UP). Cached for small k -
    * real documents hit the cache for nearly every byte value. */
  def term9(k: Int): Long =
    if (k < cacheSize) cache(k) else compute9(k)

  private def compute9(k: Int): Long =
    java.math.BigDecimal.valueOf(k * math.log(k.toDouble))
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private val cacheSize = 4096
  private lazy val cache: Array[Long] = {
    val a = new Array[Long](cacheSize)
    var k = 2
    while (k < cacheSize) { a(k) = compute9(k); k += 1 }
    a
  }
}

object ByteEntropyFunctions {
  /** The exact decimal term sum (string -> decimal(30,9)). */
  def byteEntropySum(text: Column): Column =
    Bridge.column(ByteEntropySumExpr(Bridge.expression(text)))
}

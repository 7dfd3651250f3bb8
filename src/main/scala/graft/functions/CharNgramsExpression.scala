package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character n-grams: the `len-n+1` sliding windows of the text
  * (or one whole-text gram when the document is shorter than n
  * characters — the [[TextFunctions.charNgrams]] contract).
  *
  * Matches `transform(sequence(1, length-n+1), i -> substr(text, i, n))`
  * exactly — character (code point) indexing, same short-text collapse —
  * but as one loop over the `UTF8String` instead of an interpreted
  * sequence array + per-window substring expression: this runs upstream
  * of every n-gram dedup pass, i.e. over every document in the corpus,
  * and the higher-order formulation was the measured bottleneck of the
  * exact-Jaccard operator (~5 s of a 9.6 s query at sf0.1).
  *
  * `distinct = true` additionally dedups in first-occurrence order,
  * equivalent to wrapping in `array_distinct` but without a second pass
  * that re-hashes every gram.
  */
case class CharNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n > 0, "ngram width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharNgramsExpr.ngrams(input.asInstanceOf[UTF8String], n, distinct)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = CharNgramsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"""
         |${ev.value} = new $gad((Object[]) $helper.ngrams($a, $n, $distinct));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}

object CharNgramsExpr {
  /** Shared by interpreted eval and codegen (called reflectively from
    * generated java). */
  def ngrams(text: UTF8String, n: Int, distinct: Boolean): Array[UTF8String] = {
    val chars = text.numChars()
    if (chars < n) return Array(text)
    val count = chars - n + 1
    if (!distinct) {
      val out = new Array[UTF8String](count)
      var i = 0
      while (i < count) { out(i) = text.substring(i, i + n); i += 1 }
      out
    } else {
      val seen = new java.util.HashSet[UTF8String](count * 2)
      val out = new java.util.ArrayList[UTF8String](count)
      var i = 0
      while (i < count) {
        val g = text.substring(i, i + n)
        if (seen.add(g)) out.add(g)
        i += 1
      }
      out.toArray(new Array[UTF8String](out.size))
    }
  }
}

object CharNgramFunctions {
  /** Codegen'd character n-grams (string -> array<string>); equals
    * [[TextFunctions.charNgrams]]. */
  def charNgramsFast(text: Column, n: Int): Column =
    Bridge.column(CharNgramsExpr(Bridge.expression(text), n, distinct = false))

  /** Codegen'd DISTINCT character n-grams in first-occurrence order;
    * equals `array_distinct(charNgrams(text, n))`. */
  def charNgramsDistinct(text: Column, n: Int): Column =
    Bridge.column(CharNgramsExpr(Bridge.expression(text), n, distinct = true))
}

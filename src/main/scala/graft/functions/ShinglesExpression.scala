package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling: split on single spaces, emit the
  * `len-n+1` n-word windows joined by spaces (or one whole-text shingle
  * when the document has fewer than n tokens).
  *
  * Matches `transform(sequence(...), i -> concat_ws(" ", slice(tokens,i,n)))`
  * exactly, but as a single loop over `UTF8String`s instead of interpreted
  * higher-order functions building a slice array + concat per window —
  * this runs upstream of every MinHash/Jaccard dedup pass, i.e. over every
  * document in the corpus.
  */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordShinglesExpr.shingle(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = WordShinglesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = classOf[GenericArrayData].getName
      s"""
         |${ev.value} = new $gad((Object[]) $helper.shingle($a, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen (called reflectively from
    * generated java). */
  def shingle(text: UTF8String, n: Int): Array[UTF8String] = {
    val tokens = text.split(Space, -1)
    if (tokens.length < n) {
      Array(UTF8String.concatWs(Space, tokens: _*))
    } else {
      val out = new Array[UTF8String](tokens.length - n + 1)
      var i = 0
      while (i < out.length) {
        val window = new Array[UTF8String](n)
        System.arraycopy(tokens, i, window, 0, n)
        out(i) = UTF8String.concatWs(Space, window: _*)
        i += 1
      }
      out
    }
  }
}

object ShingleFunctions {
  /** Codegen'd word n-gram shingles (string -> array<string>). */
  def wordShinglesFast(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))
}

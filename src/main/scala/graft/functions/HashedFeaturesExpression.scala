package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashed text features — the fastText/DCLM feature map: word
  * unigrams plus adjacent word bigrams, each hashed into one of
  * `nBuckets` weight slots (the "hashing trick": an unbounded vocabulary
  * folds into a bounded, broadcastable weight vector; collisions are an
  * accepted part of the model, Weinberger et al. ICML'09).
  *
  * The hash is the PORTABLE modular poly-31 fold over code points,
  * `h ← (h·31 + cp) mod nBuckets` (seed 0; a bigram hashes the joined
  * "w1 w2" string, space included) — chosen over xxhash64 because an
  * ANSI oracle can replay it exactly (`list_reduce` + `ascii`), and the
  * intermediate never leaves [0, 31·nBuckets + 0x10FFFF], so both
  * engines stay in exact integer arithmetic. The hash IS part of the
  * persisted model's format ([[graft.state.HistoryFormat.QualityClfWeights]]
  * guards it): scoring under weights trained with a different fold
  * would silently mis-score every document.
  *
  * One pass over the string; bigram hashes CHAIN from the previous
  * word's fold (`h(w1 + ' ' + w2)` continues from `h_raw(w1)` — the
  * stepwise mod makes the fold associative on concatenation); empty
  * words (double spaces) contribute no feature. Map-only codegen. */
object HashedFeaturesCodec {
  def features(text: UTF8String, nBuckets: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var hPrev = -1L // fold of the previous non-empty word, -1 = none yet
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        val wordStart = i
        var h = 0L
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          h = (h * 31 + cp) % nBuckets
          i += Character.charCount(cp)
        }
        out += h.toInt
        if (hPrev >= 0) {
          var hb = (hPrev * 31 + ' '.toInt) % nBuckets
          var j = wordStart
          while (j < i) {
            val cp = s.codePointAt(j)
            hb = (hb * 31 + cp) % nBuckets
            j += Character.charCount(cp)
          }
          out += hb.toInt
        }
        hPrev = h
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.result())
  }
}

/** text → array<int> of hashed feature buckets (see
  * [[HashedFeaturesCodec]]). */
case class HashedFeaturesExpr(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_features requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HashedFeaturesCodec.features(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HashedFeaturesCodec.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[ArrayData].getName}) $helper.features(
         |  $a, $nBuckets);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedFeaturesExpr = copy(child = newChild)

  override def prettyName: String = "hashed_features"
}

object HashedFeaturesFunctions {
  /** Codegen'd fastText-style hashed unigram+bigram feature buckets. */
  def hashedFeatures(text: Column, nBuckets: Int): Column =
    Bridge.column(HashedFeaturesExpr(Bridge.expression(text), nBuckets))
}

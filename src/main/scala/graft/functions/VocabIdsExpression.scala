package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd vocabulary tokenization: text → the array of token ids a
  * training pipeline feeds to packing (reference pattern: the token-stats
  * pass in `pi/ex` stops at counts; this is the id-mapping step after it).
  *
  * Matches `transform(split(text, ' '), w -> coalesce(vocab[w], unk))`
  * exactly — single-space separation keeping empty tokens (DuckDB
  * STRING_SPLIT semantics, and Spark split's, so the oracle can mirror
  * token-for-token) — but as ONE pass over the UTF8 bytes with an exact
  * binary search per token instead of a split-allocated string array plus
  * an O(V) per-token map-literal scan. Exact string comparison, not a
  * hash probe: a vocabulary id is an OUTPUT here (the surprisal model's
  * hash-keyed lookup tolerates ~V²/2⁶⁵ score fuzz; a wrong id is a wrong
  * answer). The vocab rides into generated code as two reference-object
  * arrays (sorted tokens + aligned ids), O(log V) per token, zero
  * per-row allocation beyond the primitive output array.
  *
  * The 0x20 separator scan is byte-safe in UTF-8: no multi-byte sequence
  * contains a 0x20 continuation byte.
  */
case class VocabIdsExpr(child: Expression,
    sortedTokens: Array[UTF8String], ids: Array[Int], unk: Int)
    extends UnaryExpression {
  require(sortedTokens.length == ids.length, "vocab token/id arrays must align")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vocab_ids requires string input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    VocabIdsExpr.tokenIds(input.asInstanceOf[UTF8String], sortedTokens, ids, unk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = VocabIdsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val toksRef = ctx.addReferenceObj("vocabTokens", sortedTokens,
      classOf[Array[UTF8String]].getCanonicalName)
    val idsRef = ctx.addReferenceObj("vocabIds", ids, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (${classOf[ArrayData].getName}) $helper.tokenIds(
         |  $a, $toksRef, $idsRef, $unk);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VocabIdsExpr =
    copy(child = newChild)

  override def prettyName: String = "vocab_ids"
}

object VocabIdsExpr {
  /** Shared by interpreted eval and codegen (called reflectively from
    * generated java). One byte pass + one binary search per token. */
  def tokenIds(text: UTF8String, sorted: Array[UTF8String], ids: Array[Int],
      unk: Int): ArrayData = {
    val bytes = text.getBytes
    var count = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') count += 1
      i += 1
    }
    val out = new Array[Int](count)
    var t = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val idx = java.util.Arrays.binarySearch(
          sorted.asInstanceOf[Array[AnyRef]], tok)
        out(t) = if (idx >= 0) ids(idx) else unk
        t += 1
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object VocabFunctions {
  /** Codegen'd vocabulary id mapping (string -> array<int>); equals
    * `transform(split(text, ' '), w -> coalesce(element_at(vocab_map, w),
    * unk))` (parity property-pinned). Takes (token, id) pairs in any
    * order; sorting for the binary search happens here, once per plan. */
  def vocabIds(text: Column, vocab: Seq[(String, Int)], unk: Int): Column = {
    // A token under two ids would map nondeterministically (binarySearch
    // lands on an arbitrary duplicate) — reject up front.
    require(vocab.map(_._1).distinct.size == vocab.size,
      s"vocabIds: duplicate tokens in vocab: ${
        vocab.groupBy(_._1).collect { case (t, vs) if vs.size > 1 => t }
          .take(5).mkString(", ")}")
    val pairs = vocab.map { case (t, id) => (UTF8String.fromString(t), id) }
      .sortBy(_._1)
    Bridge.column(VocabIdsExpr(Bridge.expression(text),
      pairs.map(_._1).toArray, pairs.map(_._2).toArray, unk))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 128-bit token-n-gram keys: for each window of `n` tokens,
  * `h1` = XXH64 of the delim-joined window bytes with Spark's xxhash64
  * seed (42) and `h2` = XXH64 of the SAME bytes with an independent seed
  * (0x9E3779B9) — two genuinely independent passes over the gram.
  *
  * This replaces (and FIXES) the column formulation
  * `struct(xxhash64(g), xxhash64(g, lit(0x9E3779B9)))`: Spark's
  * multi-argument `xxhash64` CHAINS, so that second value was
  * `hashLong(0x9E3779B9, h1)` — a deterministic function of h1, which
  * silently degraded the "128-bit" gram identity to 64 bits (any h1
  * collision was automatically a full-key collision; at 10^12 grams the
  * 64-bit birthday bound expects ~30k false gram identities, vs < 1e-15
  * for honest 128 bits). The dependence is suite-pinned so the old
  * formulation can't quietly return.
  *
  * HISTORY FORMAT NOTE: h2's definition changed (r11) — gram-owner
  * history tables indexed by the old chained h2 will not match hashes
  * from this expression; rebuild cross-batch span histories when
  * upgrading. h1 is unchanged.
  *
  * Join semantics match `concat_ws(delim, slice(tokens, i+1, n))`: NULL
  * tokens are skipped (no doubled delimiter). Fewer than `n` tokens
  * yields an empty array — same as the `when(size >= n, ...)` guard it
  * replaces. Window bytes assemble into one REUSED per-row buffer; no
  * slice array, gram string, or per-window allocation survives the loop.
  */
case class WordGramHashesExpr(child: Expression, n: Int, delim: String)
    extends UnaryExpression {
  require(n > 0, "gram width must be positive")

  override def dataType: DataType = WordGramHashesExpr.OutType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_hashes requires array<string> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordGramHashesExpr.hashes(input.asInstanceOf[ArrayData], n,
      delim.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = WordGramHashesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val delimRef = ctx.addReferenceObj("graftGramDelim",
        delim.getBytes(java.nio.charset.StandardCharsets.UTF_8), "byte[]")
      val ad = classOf[ArrayData].getName
      s"""
         |${ev.value} = ($ad) $helper.hashes($a, $n, $delimRef);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordGramHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "word_gram_hashes"
}

object WordGramHashesExpr {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  private val Seed1 = 42L         // Spark's xxhash64 seed — h1 unchanged
  private val Seed2 = 0x9E3779B9L // independent second pass

  /** Shared by interpreted eval and codegen (called reflectively from
    * generated java). */
  def hashes(tokens: ArrayData, n: Int, delim: Array[Byte]): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val count = sz - n + 1
    val out = new Array[Any](count)
    // one reused assembly buffer; grows to the largest window and stays
    var buf = new Array[Byte](64)
    var i = 0
    while (i < count) {
      var len = 0
      var first = true
      var j = i
      while (j < i + n) {
        val t = if (tokens.isNullAt(j)) null else tokens.getUTF8String(j)
        if (t != null) {
          val tb = t.numBytes()
          val need = len + tb + (if (first) 0 else delim.length)
          if (buf.length < need) {
            val nb = new Array[Byte](math.max(need, buf.length * 2))
            System.arraycopy(buf, 0, nb, 0, len)
            buf = nb
          }
          if (!first) {
            System.arraycopy(delim, 0, buf, len, delim.length)
            len += delim.length
          }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          first = false
        }
        j += 1
      }
      val h1 = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed1)
      val h2 = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed2)
      out(i) = new GenericInternalRow(Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordGramHashFunctions {
  /** Codegen'd 128-bit token-gram keys (array<string> ->
    * array<struct<h1:bigint,h2:bigint>>); see [[WordGramHashesExpr]]. */
  def wordGramHashes(tokens: Column, n: Int, delim: String): Column =
    Bridge.column(WordGramHashesExpr(Bridge.expression(tokens), n, delim))
}
